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


def test_resumable_one_pass_shard_layout(ray_session, tmp_path):
    """The fixed read shape: a resumable run builds ONE hash-partitioned
    copy (hive shard= dirs) and each shard job reads only its own
    fragments; resume reuses both the manifest and the sharded copy; a
    pre-sharded input skips the prepass entirely."""
    import os

    import ray

    from docling_ray.pipelines.checkpoint import (
        completed_shards,
        ensure_sharded,
        run_resumable,
    )
    from docling_ray.synth import make_corpus

    inp, exp = make_corpus(24, seed=9, heavy_tail=False)
    corpus = str(tmp_path / "corpus")
    ray.data.from_arrow(inp).write_parquet(corpus)
    out_dir = str(tmp_path / "out")

    recs = run_resumable(corpus, out_dir, num_shards=3, mode="fast")
    assert len(recs) == 3 and sum(r["n_docs"] for r in recs) == 24
    # one-pass sharded copy exists with one hive dir per shard + marker
    sharded = os.path.join(out_dir, "_sharded")
    assert os.path.exists(os.path.join(sharded, "_SUCCESS"))
    assert sorted(os.listdir(sharded)) == ["_SUCCESS", "shard=0",
                                           "shard=1", "shard=2"]
    assert completed_shards(out_dir) == {0, 1, 2}
    # every input doc lands in exactly one output part
    import pandas as pd

    got = pd.concat([
        ray.data.read_parquet(os.path.join(out_dir, f"part={i:04d}"))
        .to_pandas() for i in range(3)
    ])
    assert sorted(got.doc_id) == sorted(r["doc_id"] for r in inp.to_pylist())

    # resume: nothing recomputed (wall records identical objects)
    recs2 = run_resumable(corpus, out_dir, num_shards=3, mode="fast")
    assert [r["wall_sec"] for r in recs2] == [r["wall_sec"] for r in recs]

    # a corpus already stored hash-partitioned skips the prepass
    out2 = str(tmp_path / "out2")
    os.makedirs(out2)
    dirs = ensure_sharded(sharded, out2, 3)
    assert dirs == [os.path.join(sharded, f"shard={i}") for i in range(3)]
    assert not os.path.exists(os.path.join(out2, "_sharded"))


def test_publish_dir_self_heals_stale_destination(tmp_path):
    import os

    from docling_ray.functions.fsutil import publish_dir

    # a crashed builder left a marker-less destination behind
    stale = tmp_path / "cache"
    stale.mkdir()
    (stale / "junk.parquet").write_text("corrupt")
    fresh = tmp_path / "cache.tmp-1"
    fresh.mkdir()
    (fresh / "data.parquet").write_text("good")
    publish_dir(str(fresh), str(stale))
    assert os.path.exists(stale / "_SUCCESS")
    assert os.path.exists(stale / "data.parquet")
    assert not os.path.exists(stale / "junk.parquet")
    # and with a marked (complete) destination the newcomer is discarded
    fresh2 = tmp_path / "cache.tmp-2"
    fresh2.mkdir()
    (fresh2 / "other.parquet").write_text("later")
    publish_dir(str(fresh2), str(stale))
    assert os.path.exists(stale / "data.parquet")
    assert not os.path.exists(stale / "other.parquet")
    assert not fresh2.exists()
