"""Multimodal column stages: decode / feature-extract over opaque binary
media with typed metadata.

The real decoders (PIL/ffmpeg) are not in this container, so the decode
kernel is STUBBED — ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decode (seeded by the
media_ref hash) stands in. Everything around the stub is real and tested:
the Arrow schema for media rows, the actor-pool ``map_batches`` signature
(model "loaded" once per actor in ``__init__``), small-batch sizing for
wide binary rows, and the output layout.

Mirrors the reference's enrichment pattern (SURVEY.md §2.4): explode
picture spans to media rows → actor-pool stage → rejoin by doc_id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("payload", pa.binary()),      # opaque encoded bytes (may be empty)
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)

FEATURE_DIM = 32


def decode_image(payload: bytes, fake: bool = False, seed: int = 0) -> np.ndarray:
    """Decode encoded image bytes to an HxWx3 array. STUB: no imaging libs in
    this environment — set ``fake=True`` for a deterministic stand-in."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library not present in this "
            "environment; pass fake=True for the deterministic test decode"
        )
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    return rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)


class MediaFeatureExtractor:
    """Actor-pool stage: ``map_batches(MediaFeatureExtractor, concurrency=N,
    batch_size=small, num_cpus=1)``. The "model" is constructed once per
    actor; per batch it decodes (stub) and emits a feature vector + basic
    stats per media row."""

    def __init__(self, fake_decode: bool = True):
        self.fake = fake_decode
        rng = np.random.RandomState(1234)
        self.proj = rng.standard_normal((192, FEATURE_DIM))  # fixed "model"

    def __call__(self, batch: pa.Table) -> pa.Table:
        from docling_ray.functions.hashing import stable_hash64

        refs = batch["media_ref"].to_pylist()
        feats = np.empty((len(refs), FEATURE_DIM), dtype=np.float64)
        means = np.empty(len(refs), dtype=np.float64)
        for i, ref in enumerate(refs):
            img = decode_image(b"", fake=self.fake, seed=stable_hash64(ref or ""))
            flat = img.reshape(-1).astype(np.float64)
            feats[i] = flat @ self.proj
            means[i] = flat.mean()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_ref": batch["media_ref"],
                "feature": pa.array(list(feats), type=pa.list_(pa.float64())),
                "pixel_mean": pa.array(np.round(means, 6)),
            }
        )


def picture_spans_to_media_rows(batch: pa.Table) -> pa.Table:
    """Extraction output rows → exploded media rows (one per picture span)."""
    out_doc, out_ref = [], []
    for did, spans in zip(batch["doc_id"].to_pylist(), batch["spans"].to_pylist()):
        for s in spans or []:
            if s["kind"] == "picture" and s["media_ref"]:
                out_doc.append(did)
                out_ref.append(s["media_ref"])
    return pa.table(
        {
            "doc_id": pa.array(out_doc, type=pa.string()),
            "media_ref": pa.array(out_ref, type=pa.string()),
            "payload": pa.array([b""] * len(out_doc), type=pa.binary()),
            "mime": pa.array(["image/unknown"] * len(out_doc)),
            "width": pa.array([0] * len(out_doc), type=pa.int32()),
            "height": pa.array([0] * len(out_doc), type=pa.int32()),
        }
    )
