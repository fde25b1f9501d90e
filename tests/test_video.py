"""MP4 container walk: writer↔parser round trips (independent
implementations), box-layout variants, and decode totality."""

import base64
import random

import pytest

from docling_ray.stages.video_codec import (
    VideoError,
    extract_video_unit,
    parse_mp4,
)
from docling_ray.synth import build_video_doc, duration_to_mp4


def test_parse_mp4_layout_variants():
    for v1 in (False, True):
        for large in (False, True):
            data = duration_to_mp4(83_456, 1280, 720,
                                   mvhd_v1=v1, largesize_moov=large)
            meta = parse_mp4(data)
            assert meta["duration_ms"] == 83_456, (v1, large)
            assert meta["tracks"][0] == {"width": 1280, "height": 720}
            assert meta["brand"] == "isom"


def test_keyframe_schedule_and_cap():
    spans = extract_video_unit(base64.b64encode(
        duration_to_mp4(20_000, 320, 240)).decode())[0]
    assert spans[0] == ("video_meta", "20000ms 320x240",
                        "mp4://20000/320x240")
    assert [s[1] for s in spans[1:]] == ["0", "5000", "10000",
                                         "15000", "20000"]
    long = extract_video_unit(base64.b64encode(
        duration_to_mp4(10_000_000, 320, 240)).decode())[0]
    assert len(long) == 1 + 64  # frame cap


def test_generator_roundtrip_many_seeds():
    rng = random.Random(3)
    for i in range(200):
        b64, exp, _status = build_video_doc(rng, f"v-{i}")
        assert extract_video_unit(b64)[0] == exp, i


def test_decode_is_total():
    rng = random.Random(9)
    data = bytearray(duration_to_mp4(60_000, 640, 480))
    for _ in range(200):
        mut = bytearray(data)
        for _k in range(rng.randrange(1, 6)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        spans, _pno, _score, err = extract_video_unit(
            base64.b64encode(bytes(mut)).decode())
        assert err is None or isinstance(err, str)  # never raises
    with pytest.raises(VideoError):
        parse_mp4(b"not an mp4 at all....")
    with pytest.raises(VideoError):
        parse_mp4(duration_to_mp4(1, 1, 1)[:20])  # moov cut off


def test_video_kind_flows_through_pipeline(ray_session):
    import ray

    from docling_ray.pipelines.extract import extract_corpus
    from docling_ray.synth import make_corpus

    inp, exp = make_corpus(600, seed=901)
    kinds = {s["kind"] for row in inp.to_pylist() for s in row["spans"]}
    assert "video" in kinds
    out = extract_corpus(ray.data.from_arrow(inp)).to_pandas()
    got = {r.doc_id: [(s["kind"], s["text"], s["media_ref"])
                      for s in r.spans]
           for r in out.itertuples(index=False)}
    for row in exp.to_pylist():
        want = [(s["kind"], s["text"], s["media_ref"])
                for s in row["spans"]]
        assert got[row["doc_id"]] == want
