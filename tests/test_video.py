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


def test_mp4_pcm_demux_literal():
    """twos/sowt, stereo downmix, stsz table, multi-chunk stco."""
    import base64
    import random

    import numpy as np

    from docling_ray.stages.video_codec import (decode_mp4_pcm,
                                                extract_video_unit,
                                                parse_mp4)
    from docling_ray.synth import duration_to_mp4

    samples = np.array([1000, -1000, 2000, -2000, 50, -50, 0, 25],
                       np.int16)
    for fmt in ("twos", "sowt"):
        for channels in (1, 2):
            for stsz_table in (False, True):
                data = duration_to_mp4(
                    5_000, 640, 480,
                    audio=(samples, 8000, fmt, channels, 3, stsz_table))
                meta = parse_mp4(data)
                assert "audio" in meta
                got, rate = decode_mp4_pcm(data, meta["audio"])
                assert rate == 8000
                assert got.tolist() == samples.tolist()


def test_mp4_audio_vad_spans():
    import random

    import numpy as np

    from docling_ray.stages.audio_codec import FRAME_MS, VOICE_PEAK
    from docling_ray.stages.video_codec import extract_video_unit
    from docling_ray.synth import duration_to_mp4
    import base64

    rate = 8000
    spf = rate * FRAME_MS // 1000
    # 2 voice frames, 2 silence, 1 voice
    sig = np.concatenate([
        np.full(2 * spf, 8192, np.int16),
        np.zeros(2 * spf, np.int16),
        np.full(spf, 8192, np.int16),
    ])
    data = duration_to_mp4(1_000, 320, 240,
                           audio=(sig, rate, "sowt", 1, 2, False))
    spans, _, conf, err = extract_video_unit(
        base64.b64encode(data).decode("ascii"))
    assert err is None
    seg_texts = [t for k, t, _ in spans if k == "audio_segment"]
    assert seg_texts == ["0-40", "80-100"]
    assert any(k == "audio_meta" and t == "8000hz 100ms"
               for k, t, _ in spans)
