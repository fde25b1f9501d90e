"""Speaker diarization: embedding clustering + transcript assignment.

Rebuild of the reference's ``docling/utils/speaker_diarization.py``:
the voice ENCODER there is a neural model (resemblyzer) and is stubbed
here exactly like the other media engines (deterministic fake embeddings
from the audio ref); everything downstream of the encoder is pure logic
and rebuilt for real:

  * agglomerative clustering of window embeddings (average-linkage cosine,
    plain numpy — the sklearn AgglomerativeClustering stand-in);
  * speaker-count estimation by silhouette score over candidate counts
    (reference ``_estimate_num_speakers``, :45-68);
  * merging consecutive same-speaker windows into contiguous
    ``(start, end, speaker)`` segments (:166-189);
  * max-time-overlap assignment of speakers onto transcript segments
    (reference ``assign_speakers``, :195-230).

Ray shape: :class:`SpeakerDiarizer` is a callable-class actor-pool stage
over audio media rows (encoder "loaded" once per actor).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MIN_SPEAKERS = 2
_MAX_SPEAKERS = 8
_WINDOW_STEP = 0.5  # seconds between embedding windows


def _cosine_dist(a: np.ndarray, b: np.ndarray) -> float:
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 1.0
    return 1.0 - float(a @ b) / (na * nb)


def agglomerative_labels(embeddings: np.ndarray, n_clusters: int) -> np.ndarray:
    """Average-linkage agglomerative clustering on cosine distance.
    Deterministic: ties merge the lexicographically first pair."""
    n = len(embeddings)
    clusters: dict[int, list[int]] = {i: [i] for i in range(n)}
    # precompute pairwise distances
    unit = embeddings / np.maximum(
        np.linalg.norm(embeddings, axis=1, keepdims=True), 1e-12)
    dist = 1.0 - unit @ unit.T
    while len(clusters) > n_clusters:
        keys = sorted(clusters)
        best = None
        for i_pos, ka in enumerate(keys):
            for kb in keys[i_pos + 1:]:
                d = float(np.mean(dist[np.ix_(clusters[ka], clusters[kb])]))
                if best is None or d < best[0]:
                    best = (d, ka, kb)
        _, ka, kb = best
        clusters[ka].extend(clusters[kb])
        del clusters[kb]
    labels = np.empty(n, dtype=np.int64)
    for new_id, key in enumerate(sorted(clusters)):
        labels[clusters[key]] = new_id
    return labels


def _silhouette(embeddings: np.ndarray, labels: np.ndarray) -> float:
    unit = embeddings / np.maximum(
        np.linalg.norm(embeddings, axis=1, keepdims=True), 1e-12)
    dist = 1.0 - unit @ unit.T
    scores = []
    for i in range(len(embeddings)):
        same = labels == labels[i]
        same[i] = False
        a = float(dist[i, same].mean()) if same.any() else 0.0
        b = min((float(dist[i, labels == lab].mean())
                 for lab in set(labels) if lab != labels[i]), default=0.0)
        denom = max(a, b)
        scores.append((b - a) / denom if denom > 0 else 0.0)
    return float(np.mean(scores))


def estimate_num_speakers(embeddings: np.ndarray) -> int:
    """Speaker count with the best silhouette score (reference :45-68)."""
    best_n, best_score = _MIN_SPEAKERS, -1.0
    for n in range(_MIN_SPEAKERS, min(_MAX_SPEAKERS + 1, len(embeddings))):
        labels = agglomerative_labels(embeddings, n)
        if len(set(labels.tolist())) < 2:
            continue
        score = _silhouette(embeddings, labels)
        if score > best_score:
            best_score = score
            best_n = n
    return best_n


def diarize_embeddings(
    embeddings: np.ndarray,
    timestamps: np.ndarray,
    total_duration: float,
    num_speakers: int | None = None,
) -> list[tuple[float, float, str]]:
    """Window embeddings + start times → merged (start, end, speaker)
    segments; the last segment extends to the end of the audio
    (reference :166-189)."""
    if len(embeddings) == 0:
        return []
    n = num_speakers if num_speakers is not None else \
        estimate_num_speakers(embeddings)
    n = max(1, min(n, len(embeddings)))
    labels = (agglomerative_labels(embeddings, n) if n > 1
              else np.zeros(len(embeddings), dtype=np.int64))
    speaker_ids = [f"SPEAKER_{i:02d}" for i in range(n)]
    segments: list[tuple[float, float, str]] = []
    cur_spk = speaker_ids[labels[0]]
    cur_start = float(timestamps[0])
    cur_end = float(timestamps[0]) + _WINDOW_STEP
    for ts, lab in zip(timestamps[1:], labels[1:]):
        spk = speaker_ids[lab]
        if spk == cur_spk:
            cur_end = float(ts) + _WINDOW_STEP
        else:
            segments.append((cur_start, cur_end, cur_spk))
            cur_spk, cur_start = spk, float(ts)
            cur_end = float(ts) + _WINDOW_STEP
    segments.append((cur_start, float(total_duration), cur_spk))
    return segments


def assign_speakers(
    transcript: list[dict],
    segments: list[tuple[float, float, str]],
) -> list[dict]:
    """Per transcript item, the diarized segment with maximum time overlap
    wins (reference :195-230). Items without overlap keep speaker=None."""
    if not segments:
        return transcript
    for item in transcript:
        start = float(item.get("start") or 0.0)
        end = float(item.get("end") or start)
        best_spk, best_ov = None, 0.0
        for (s, e, spk) in segments:
            ov = max(0.0, min(end, e) - max(start, s))
            if ov > best_ov:
                best_ov, best_spk = ov, spk
        if best_spk:
            item["speaker"] = best_spk
    return transcript


def fake_voice_embeddings(media_ref: str, duration: float,
                          dim: int = 32) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic stand-in for the voice encoder (no audio stack in this
    environment): windows every _WINDOW_STEP seconds; the embedding flips
    between two hash-seeded speaker prototypes so the clustering path is
    exercised end-to-end."""
    from docling_ray.functions.hashing import stable_hash64

    n = max(1, int(duration / _WINDOW_STEP))
    rng = np.random.RandomState(stable_hash64(media_ref) & 0x7FFFFFFF)
    protos = rng.standard_normal((2, dim))
    ts = np.arange(n) * _WINDOW_STEP
    # alternate speakers in ~5-window turns
    which = (np.arange(n) // 5) % 2
    emb = protos[which] + rng.standard_normal((n, dim)) * 0.05
    return emb, ts


class SpeakerDiarizer:
    """Actor-pool stage over audio media rows (doc_id, media_ref,
    duration): emits (doc_id, media_ref, seg_idx, start, end, speaker)."""

    def __init__(self, num_speakers: int | None = 2):
        self.num_speakers = num_speakers  # "model load" happens here

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, refs, idxs, starts, ends, spks = [], [], [], [], [], []
        for did, ref, dur in zip(batch["doc_id"].to_pylist(),
                                 batch["media_ref"].to_pylist(),
                                 batch["duration"].to_pylist()):
            emb, ts = fake_voice_embeddings(ref or "", float(dur or 0.0))
            for j, (s, e, spk) in enumerate(diarize_embeddings(
                    emb, ts, float(dur or 0.0), self.num_speakers)):
                doc_ids.append(did)
                refs.append(ref)
                idxs.append(j)
                starts.append(round(s, 3))
                ends.append(round(e, 3))
                spks.append(spk)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.string()),
            "media_ref": pa.array(refs, pa.string()),
            "seg_idx": pa.array(idxs, pa.int32()),
            "start": pa.array(starts, pa.float64()),
            "end": pa.array(ends, pa.float64()),
            "speaker": pa.array(spks, pa.string()),
        })
