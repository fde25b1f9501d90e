"""ASR / video stages: audio transcription and keyframe sampling.

Shape parity with the reference's ``AsrPipeline``
(``docling/pipeline/asr_pipeline.py:30`` + ``asr_transcriber.py``) and
``VideoPipeline`` (``docling/pipeline/video_pipeline.py:108`` +
``docling/utils/video_frame_sampling.py``). The AUDIO FRONT END is real:
``stages/audio_codec.py`` decodes WAV PCM from scratch and runs
energy-based voice-activity segmentation (the ``audio`` corpus kind).
No ASR model or ffmpeg exists in this container, so for transcription:

  * the transcriber registry mirrors ``ocr.py`` — real engines raise
    ``NotImplementedError`` at construction; the deterministic ``fake``
    engine emits seeded timed segments so the actor-pool plumbing, the
    timed-segment schema and the speaker-turn grouping are real and tested;
  * keyframe sampling is implemented for real (pure arithmetic): uniform
    interval sampling with a frame cap, the reference's strategy.
"""

from __future__ import annotations

import json

import pyarrow as pa

from docling_ray.functions.hashing import stable_hash64

SEGMENT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("start_ms", pa.int64()),
        ("end_ms", pa.int64()),
        ("speaker", pa.string()),
        ("text", pa.string()),
    ]
)


class _FakeTranscriber:
    """Deterministic stand-in: segments seeded by the media ref/payload."""

    def transcribe(self, media_ref: str, duration_ms: int) -> list[dict]:
        h = stable_hash64(media_ref)
        n_seg = 2 + h % 4
        seg_len = max(1, duration_ms // n_seg)
        out = []
        for i in range(n_seg):
            out.append({
                "start_ms": i * seg_len,
                "end_ms": min((i + 1) * seg_len, duration_ms),
                "speaker": f"SPEAKER_{(h >> (8 * i)) % 2}",
                "text": f"segment {i} of {media_ref}",
            })
        return out


def _unavailable(name: str):
    class _Missing:
        def __init__(self):
            raise NotImplementedError(
                f"ASR engine {name!r} requires a model/library not present "
                "in this environment"
            )

    return _Missing


ASR_ENGINES = {
    "fake": _FakeTranscriber,
    "whisper": _unavailable("whisper"),
    "whisperx": _unavailable("whisperx"),
}


def resolve_transcriber(kind: str = "auto"):
    if kind == "auto":
        for cls in ASR_ENGINES.values():
            try:
                return cls()
            except NotImplementedError:
                continue
        raise NotImplementedError("no ASR engine available")
    return ASR_ENGINES[kind]()


class AsrStage:
    """Actor-pool stage over media rows ``(doc_id, media_ref, duration_ms)``
    → timed transcript segments (model loaded once per actor)."""

    def __init__(self, engine: str = "auto"):
        self.engine = resolve_transcriber(engine)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        durations = (
            batch["duration_ms"].to_pylist()
            if "duration_ms" in batch.column_names
            else [60_000] * batch.num_rows
        )
        for did, ref, dur in zip(batch["doc_id"].to_pylist(),
                                 batch["media_ref"].to_pylist(), durations):
            for seg in self.engine.transcribe(ref or "", int(dur or 0)):
                rows.append({"doc_id": did, **seg})
        return pa.Table.from_pylist(rows, schema=SEGMENT_SCHEMA)


def segments_to_spans(segments: list[dict]) -> list[tuple[str, str, str]]:
    """Timed segments → text spans with speaker prefixes and a timing
    media_ref (the ASR document assembly, asr_pipeline.py)."""
    spans = []
    prev_speaker = None
    for seg in segments:
        text = seg["text"]
        if seg.get("speaker") and seg["speaker"] != prev_speaker:
            text = f"{seg['speaker']}: {text}"
            prev_speaker = seg["speaker"]
        spans.append(("text", text, f"ts://{seg['start_ms']}-{seg['end_ms']}"))
    return spans


def sample_keyframes(
    duration_ms: int, interval_ms: int = 5_000, max_frames: int = 64
) -> list[int]:
    """Uniform keyframe timestamps (video_frame_sampling.py semantics):
    one frame per interval, stretched when the cap would be exceeded."""
    if duration_ms <= 0:
        return []
    n = duration_ms // interval_ms + 1
    if n > max_frames:
        interval_ms = duration_ms // (max_frames - 1) if max_frames > 1 else duration_ms
        n = max_frames
    return [min(i * interval_ms, duration_ms) for i in range(int(n))]


# ---------------------------------------------------------------------------
# VLM page-conversion stub (SURVEY.md §2.5): page payload → doctags → spans.
# Real VLM engines are model-dependent and absent here; the fake engine
# "generates" doctags deterministically from the page's own cells so the
# actor-pool shape, the doctags parse path and the page-concat assembly are
# real and tested (vlm_convert_model.py:66 + vlm_pipeline.py:446 analogue).
# ---------------------------------------------------------------------------


class _FakeVlm:
    def generate_doctags(self, page_payload: str) -> str:
        from docling_ray.stages.pdf_layout import extract_pdf_unit

        spans, _page_no, _score, _err = extract_pdf_unit(page_payload)
        from docling_ray.stages.export import spans_to_doctags

        return spans_to_doctags(
            [{"kind": k, "text": t, "media_ref": m} for k, t, m in spans]
        )


VLM_ENGINES = {
    "fake": _FakeVlm,
    "granite_docling": _unavailable("granite_docling"),
    "smoldocling": _unavailable("smoldocling"),
}


def resolve_vlm(kind: str = "auto"):
    if kind == "auto":
        for cls in VLM_ENGINES.values():
            try:
                return cls()
            except NotImplementedError:
                continue
        raise NotImplementedError("no VLM engine available")
    return VLM_ENGINES[kind]()


class VlmConvertStage:
    """Actor-pool stage: rows (doc_id, payload) → (doc_id, page_no, doctags,
    spans). GPU-shaped in production (num_gpus in map_batches); CPU fake here."""

    def __init__(self, engine: str = "auto"):
        self.engine = resolve_vlm(engine)

    def __call__(self, batch: "pa.Table") -> "pa.Table":
        import json as _json

        from docling_ray import schema as S
        from docling_ray.stages.export import parse_doctags

        out = []
        for did, payload in zip(batch["doc_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            dt = self.engine.generate_doctags(payload)
            spans = parse_doctags(dt)
            try:
                page_no = int(_json.loads(payload).get("page_no", 0))
            except Exception:
                page_no = -1
            out.append({
                "doc_id": did, "page_no": page_no, "doctags": dt,
                "spans": S.spans_to_arrow(spans),
            })
        return pa.Table.from_pylist(out)
