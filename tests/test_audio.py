"""WAV PCM decode + VAD segmentation: writer↔decoder round trips
(independent implementations), edge frames, and decode totality."""

import base64
import random

import numpy as np
import pytest

from docling_ray.stages.audio_codec import (
    AudioError,
    decode_wav,
    extract_audio_unit,
    vad_segments,
)
from docling_ray.synth import build_audio_doc, pcm_to_wav


def test_decode_wav_bit_depths_and_channels():
    samples = np.array([0, 2560, -2560, 16384, -16384, 256], np.int16)
    for bits in (16, 8):
        for ch in (1, 2):
            got, rate = decode_wav(pcm_to_wav(samples, 8000,
                                              bits=bits, channels=ch))
            assert rate == 8000
            assert np.array_equal(got, samples), (bits, ch)


def test_vad_edges():
    rate = 8000
    spf = rate * 20 // 1000  # 160 samples/frame
    silence = np.zeros(spf * 3, np.int16)
    assert vad_segments(silence, rate) == []
    voice = np.full(spf * 3, 8192, np.int16)
    assert vad_segments(voice, rate) == [(0, 60)]
    # trailing partial frame of voice clamps to true duration
    part = np.full(spf * 2 + 40, 8192, np.int16)
    dur = len(part) * 1000 // rate
    assert vad_segments(part, rate) == [(0, dur)]
    # sub-threshold hum is silence
    hum = np.full(spf * 2, 1024, np.int16)
    assert vad_segments(hum, rate) == []
    # exact threshold is voice
    edge = np.full(spf, 1311, np.int16)
    assert vad_segments(edge, rate) == [(0, 20)]


def test_generator_roundtrip_many_seeds():
    rng = random.Random(3)
    for i in range(300):
        b64, exp, _status = build_audio_doc(rng, f"au-{i}")
        assert extract_audio_unit(b64)[0] == exp, i


def test_decode_is_total():
    rng = random.Random(9)
    samples = np.full(800, 8192, np.int16)
    data = bytearray(pcm_to_wav(samples, 8000))
    for _ in range(200):
        mut = bytearray(data)
        for _k in range(rng.randrange(1, 6)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        spans, _pno, _score, err = extract_audio_unit(
            base64.b64encode(bytes(mut)).decode())
        assert err is None or isinstance(err, str)  # never raises
    with pytest.raises(AudioError):
        decode_wav(b"RIFFxxxxNOPE")
    spans, _, _, err = extract_audio_unit("@@not-b64@@")
    assert spans == [] and "base64" in err


def test_audio_kind_flows_through_pipeline(ray_session):
    import ray

    from docling_ray.pipelines.extract import extract_corpus
    from docling_ray.synth import make_corpus

    inp, exp = make_corpus(400, seed=777)
    kinds = {s["kind"] for row in inp.to_pylist() for s in row["spans"]}
    assert "audio" in kinds
    out = extract_corpus(ray.data.from_arrow(inp)).to_pandas()
    got = {r.doc_id: [(s["kind"], s["text"], s["media_ref"])
                      for s in r.spans]
           for r in out.itertuples(index=False)}
    for row in exp.to_pylist():
        want = [(s["kind"], s["text"], s["media_ref"])
                for s in row["spans"]]
        assert got[row["doc_id"]] == want
