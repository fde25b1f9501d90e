"""Speaker diarization tests (reference utils/speaker_diarization.py:
clustering, speaker-count estimation, window merge, overlap assignment —
the encoder is the stubbed part, everything else is real logic)."""

import numpy as np
import pyarrow as pa

from docling_ray.stages.diarize import (
    SpeakerDiarizer,
    agglomerative_labels,
    assign_speakers,
    diarize_embeddings,
    estimate_num_speakers,
)


def _three_clusters(n_per=10, dim=16, seed=0):
    rng = np.random.RandomState(seed)
    protos = rng.standard_normal((3, dim)) * 3
    emb = np.concatenate([protos[i] + rng.standard_normal((n_per, dim)) * 0.1
                          for i in range(3)])
    return emb


def test_agglomerative_recovers_clusters():
    emb = _three_clusters()
    labels = agglomerative_labels(emb, 3)
    # each ground-truth block maps to exactly one label
    blocks = [set(labels[i * 10:(i + 1) * 10].tolist()) for i in range(3)]
    assert all(len(b) == 1 for b in blocks)
    assert len(set().union(*blocks)) == 3


def test_estimate_num_speakers():
    assert estimate_num_speakers(_three_clusters()) == 3


def test_diarize_merges_windows_and_extends_last():
    emb = np.array([[1.0, 0.0]] * 4 + [[0.0, 1.0]] * 4 + [[1.0, 0.0]] * 2)
    ts = np.arange(10) * 0.5
    segs = diarize_embeddings(emb, ts, total_duration=6.0, num_speakers=2)
    assert len(segs) == 3
    (s1, e1, a), (s2, e2, b), (s3, e3, c) = segs
    assert a == c and a != b  # A B A turn structure
    assert (s1, e1) == (0.0, 2.0)
    assert (s2, e2) == (2.0, 4.0)
    assert (s3, e3) == (4.0, 6.0)  # last segment extends to audio end


def test_assign_speakers_max_overlap():
    segs = [(0.0, 5.0, "SPEAKER_00"), (5.0, 10.0, "SPEAKER_01")]
    transcript = [
        {"start": 1.0, "end": 2.0, "text": "a"},
        {"start": 4.0, "end": 7.0, "text": "b"},   # 1s vs 2s → speaker 01
        {"start": 20.0, "end": 21.0, "text": "c"},  # no overlap
    ]
    out = assign_speakers(transcript, segs)
    assert out[0]["speaker"] == "SPEAKER_00"
    assert out[1]["speaker"] == "SPEAKER_01"
    assert "speaker" not in out[2]


def test_diarizer_stage(ray_session):
    import ray

    rows = pa.table({
        "doc_id": pa.array(["d1", "d2"]),
        "media_ref": pa.array(["audio://d1/1", "audio://d2/1"]),
        "duration": pa.array([10.0, 7.5], pa.float64()),
    })
    out = (ray.data.from_arrow(rows)
           .map_batches(SpeakerDiarizer, batch_size=8, concurrency=1,
                        batch_format="pyarrow")
           .to_pandas())
    assert set(out["doc_id"]) == {"d1", "d2"}
    assert set(out["speaker"]) <= {"SPEAKER_00", "SPEAKER_01"}
    d1 = out[out.doc_id == "d1"].sort_values("seg_idx")
    assert d1["end"].iloc[-1] == 10.0  # extends to audio end
    assert (d1["start"].values[1:] == d1["end"].values[:-1]).all()
    # determinism
    out2 = SpeakerDiarizer()(rows).to_pandas()
    assert out2["speaker"].tolist() == out.sort_values(
        ["doc_id", "seg_idx"])["speaker"].tolist()
