"""MP4 (ISO BMFF) container parsing + keyframe scheduling.

The reference's VideoPipeline (``docling/pipeline/video_pipeline.py:108``)
opens videos through ffmpeg and samples keyframes
(``docling/utils/video_frame_sampling.py``). No codec stack exists in
this container, so frame DECODE stays out of scope — but the container
walk (the part that yields duration, track geometry and the sampling
schedule) is plain box arithmetic, rebuilt here from the public
ISO/IEC 14496-12 layouts:

- :func:`parse_mp4` — top-level box walk (ftyp brand, moov recursion),
  ``mvhd`` version 0/1 (timescale + duration) and ``tkhd`` version 0/1
  (16.16 fixed-point width/height; a track with nonzero dims is video).
- :func:`extract_video_unit` — one ``video`` input span (base64 MP4) →
  a ``video_meta`` span plus one ``video_frame`` span per uniform
  keyframe timestamp (``stages/asr.sample_keyframes`` — the reference's
  interval-with-cap strategy), each carrying
  ``mp4://duration_ms/WxH``. Malformed payloads raise
  :class:`VideoError` → status=failure rows, never exceptions.
"""

from __future__ import annotations

import struct


class VideoError(ValueError):
    """Malformed or unsupported video payload."""


_CONTAINERS = {b"moov", b"trak", b"mdia"}


def _walk_boxes(data: bytes, start: int, end: int, out: dict,
                depth: int = 0) -> None:
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack(">I", data[i: i + 4])
        btype = data[i + 4: i + 8]
        body_off = i + 8
        if size == 1:  # 64-bit largesize
            if i + 16 > end:
                raise VideoError("mp4 largesize truncated")
            (size,) = struct.unpack(">Q", data[i + 8: i + 16])
            body_off = i + 16
        elif size == 0:  # to end of enclosing box
            size = end - i
        if size < 8 or i + size > end:
            raise VideoError(f"mp4 box {btype!r} overruns container")
        body = data[body_off: i + size]
        if btype == b"ftyp":
            out.setdefault("brand", body[:4].decode("latin-1"))
        elif btype == b"mvhd":
            ver = body[0]
            if ver == 1:
                ts, dur = struct.unpack(">IQ", body[20:32])
            else:
                ts, dur = struct.unpack(">II", body[12:20])
            if ts <= 0:
                raise VideoError("mp4 mvhd bad timescale")
            out["duration_ms"] = dur * 1000 // ts
        elif btype == b"tkhd":
            ver = body[0]
            off = 88 if ver == 1 else 76
            if len(body) >= off + 8:
                w_fx, h_fx = struct.unpack(">II",
                                           body[off: off + 8])
                w, h = w_fx >> 16, h_fx >> 16
                if w and h:
                    out.setdefault("tracks", []).append(
                        {"width": w, "height": h})
        elif btype in _CONTAINERS and depth < 8:
            _walk_boxes(data, body_off, i + size, out, depth + 1)
        i += size


def parse_mp4(data: bytes) -> dict:
    """MP4 bytes → {brand, duration_ms, tracks:[{width,height}]}."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise VideoError("not an MP4 (no ftyp)")
    out: dict = {}
    _walk_boxes(data, 0, len(data), out)
    if "duration_ms" not in out:
        raise VideoError("mp4 missing moov/mvhd")
    return out


def extract_video_unit(
    payload_b64: str,
) -> tuple[list[tuple[str, str, str]], int, float, str | None]:
    """One ``video`` input span → video_meta + video_frame spans."""
    import base64
    import binascii

    from docling_ray.stages.asr import sample_keyframes

    try:
        data = base64.b64decode(payload_b64, validate=True)
    except (binascii.Error, ValueError) as e:
        return [], -1, 0.0, f"video base64 decode error: {e}"
    try:
        meta = parse_mp4(data)
    except (VideoError, struct.error, IndexError, OverflowError) as e:
        return [], -1, 0.0, f"video decode error: {e}"
    dur = int(meta["duration_ms"])
    tracks = meta.get("tracks") or [{"width": 0, "height": 0}]
    w, h = tracks[0]["width"], tracks[0]["height"]
    ref = f"mp4://{dur}/{w}x{h}"
    spans = [("video_meta", f"{dur}ms {w}x{h}", ref)]
    for ts in sample_keyframes(dur):
        spans.append(("video_frame", str(ts), ref))
    return spans, -1, 1.0, None
