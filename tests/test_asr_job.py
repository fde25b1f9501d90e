"""ASR stage plumbing, keyframe sampling, and the submittable job script."""

import json
import subprocess
import sys

import pyarrow as pa
import pytest

from docling_ray.stages.asr import (
    AsrStage,
    resolve_transcriber,
    sample_keyframes,
    segments_to_spans,
)


def test_asr_registry_and_determinism():
    with pytest.raises(NotImplementedError):
        resolve_transcriber("whisper")
    eng = resolve_transcriber("auto")
    a = eng.transcribe("audio://x", 60_000)
    b = eng.transcribe("audio://x", 60_000)
    assert a == b and len(a) >= 2
    assert a[0]["start_ms"] == 0 and a[-1]["end_ms"] == 60_000


def test_asr_stage_batch_and_spans():
    batch = pa.table({
        "doc_id": pa.array(["d1"]),
        "media_ref": pa.array(["audio://d1/0"]),
        "duration_ms": pa.array([30_000]),
    })
    segs = AsrStage(engine="fake")(batch).to_pylist()
    assert all(s["doc_id"] == "d1" for s in segs)
    spans = segments_to_spans(segs)
    assert spans[0][0] == "text" and spans[0][2].startswith("ts://0-")
    # speaker prefix appears on turn changes only
    prefixed = [s for s in spans if ":" in s[1].split(" ")[0]]
    assert prefixed


def test_keyframe_sampling():
    assert sample_keyframes(0) == []
    ts = sample_keyframes(20_000, interval_ms=5_000)
    assert ts == [0, 5_000, 10_000, 15_000, 20_000]
    capped = sample_keyframes(10_000_000, interval_ms=5_000, max_frames=64)
    assert len(capped) == 64 and capped[-1] <= 10_000_000


def test_extract_job_script(ray_session, tmp_path):
    import ray

    from docling_ray.synth import make_corpus

    inp, _ = make_corpus(20, seed=8, heavy_tail=False)
    corpus = str(tmp_path / "corpus")
    ray.data.from_arrow(inp).write_parquet(corpus)
    out_dir = str(tmp_path / "out")
    # the job owns its session → run in a subprocess (fresh interpreter)
    res = subprocess.run(
        [sys.executable, "jobs/extract_job.py", "--input", corpus,
         "--output", out_dir, "--mode", "fast", "--num-shards", "2",
         "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["n_docs"] == 20 and summary["n_shards"] == 2
