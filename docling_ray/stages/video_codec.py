"""MP4 (ISO BMFF) container parsing + keyframe scheduling + PCM audio
track demux.

The reference's VideoPipeline (``docling/pipeline/video_pipeline.py:108``)
opens videos through ffmpeg, samples keyframes
(``docling/utils/video_frame_sampling.py``) and extracts the audio
track into the ASR path. No codec stack exists in this container, so
frame DECODE stays out of scope — but the container walk (duration,
track geometry, sampling schedule) and the raw-PCM audio demux (the
``twos``/``sowt`` uncompressed sample entries of ISO/IEC 14496-12 +
QuickTime) are plain box/sample-table arithmetic, rebuilt here from the
public layouts:

- :func:`parse_mp4` — top-level box walk (ftyp brand, moov recursion),
  ``mvhd`` version 0/1 (timescale + duration), per-track recursion
  (``trak``/``mdia``/``minf``/``stbl``): ``tkhd`` v0/v1 16.16
  width/height (nonzero dims = video track), ``hdlr`` handler type,
  ``mdhd`` media timescale, and the sound sample tables ``stsd``
  (SoundSampleEntry: format/channels/bits/rate), ``stsz`` (constant or
  per-sample sizes), ``stsc`` (chunk→samples runs), ``stco``/``co64``
  (chunk offsets).
- :func:`decode_mp4_pcm` — sample-table walk → interleaved PCM frames
  gathered chunk by chunk → mono int16 samples (multi-channel averaged
  exactly like ``audio_codec.decode_wav``).
- :func:`extract_video_unit` — one ``video`` input span (base64 MP4) →
  a ``video_meta`` span plus one ``video_frame`` span per uniform
  keyframe timestamp (``stages/asr.sample_keyframes`` — the reference's
  interval-with-cap strategy), each carrying ``mp4://duration_ms/WxH``;
  when a raw-PCM audio track is present, its demuxed samples run the
  SAME energy-VAD path as WAV docs (``audio_codec.vad_segments``) and
  emit ``audio_meta`` + ``audio_segment`` spans carrying
  ``mp4pcm://rate/n_samples/fp`` (fingerprint of the decoded mono
  samples — equality proves the demux, the ``wavpcm://`` convention).
  Malformed payloads raise :class:`VideoError` → status=failure rows,
  never exceptions.
"""

from __future__ import annotations

import struct

import numpy as np


class VideoError(ValueError):
    """Malformed or unsupported video payload."""


_CONTAINERS = {b"moov", b"mdia", b"minf", b"stbl"}
_PCM_FORMATS = {b"twos": ">i2", b"sowt": "<i2"}


def _walk_boxes(data: bytes, start: int, end: int, out: dict,
                depth: int = 0, trak: dict | None = None) -> None:
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
        elif btype == b"trak" and depth < 8:
            tr: dict = {}
            out.setdefault("traks", []).append(tr)
            _walk_boxes(data, body_off, i + size, out, depth + 1, tr)
        elif btype == b"tkhd" and trak is not None:
            ver = body[0]
            off = 88 if ver == 1 else 76
            if len(body) >= off + 8:
                w_fx, h_fx = struct.unpack(">II",
                                           body[off: off + 8])
                trak["width"], trak["height"] = w_fx >> 16, h_fx >> 16
        elif btype == b"hdlr" and trak is not None:
            if len(body) >= 12:
                trak["handler"] = body[8:12]
        elif btype == b"mdhd" and trak is not None:
            ver = body[0]
            ts_off = 20 if ver == 1 else 12
            if len(body) >= ts_off + 4:
                (trak["timescale"],) = struct.unpack(
                    ">I", body[ts_off: ts_off + 4])
        elif btype == b"stsd" and trak is not None:
            # first sample entry: size(4) format(4) + SoundSampleEntry
            # layout (6 reserved + 2 dref idx, ver/rev/vendor 8,
            # channels(2) samplesize(2) cid/packet 4, rate 16.16)
            if len(body) >= 8 + 36:
                e = body[8:]
                trak["format"] = e[4:8]
                trak["channels"], trak["bits"] = struct.unpack(
                    ">HH", e[24:28])
                (rate_fx,) = struct.unpack(">I", e[32:36])
                trak["rate"] = rate_fx >> 16
        elif btype == b"stsz" and trak is not None:
            const, count = struct.unpack(">II", body[4:12])
            if const:
                trak["sample_sizes"] = (const, int(count))
            else:
                trak["sample_sizes"] = np.frombuffer(
                    body[12: 12 + 4 * count], ">u4").astype(np.int64)
        elif btype == b"stsc" and trak is not None:
            (n_ent,) = struct.unpack(">I", body[4:8])
            ent = np.frombuffer(body[8: 8 + 12 * n_ent], ">u4") \
                .reshape(-1, 3).astype(np.int64)
            trak["stsc"] = ent  # (first_chunk, samples_per_chunk, id)
        elif btype in (b"stco", b"co64") and trak is not None:
            (n_ent,) = struct.unpack(">I", body[4:8])
            dt, w = (">u4", 4) if btype == b"stco" else (">u8", 8)
            trak["chunk_offsets"] = np.frombuffer(
                body[8: 8 + w * n_ent], dt).astype(np.int64)
        elif btype in _CONTAINERS and depth < 8:
            _walk_boxes(data, body_off, i + size, out, depth + 1, trak)
        i += size


def parse_mp4(data: bytes) -> dict:
    """MP4 bytes → {brand, duration_ms, tracks:[{width,height}],
    audio: per-track sample-table dict for the first raw-PCM sound
    track (or absent)}."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise VideoError("not an MP4 (no ftyp)")
    out: dict = {}
    _walk_boxes(data, 0, len(data), out)
    if "duration_ms" not in out:
        raise VideoError("mp4 missing moov/mvhd")
    for tr in out.get("traks", ()):
        if tr.get("width") and tr.get("height"):
            out.setdefault("tracks", []).append(
                {"width": tr["width"], "height": tr["height"]})
        if (tr.get("handler") == b"soun"
                and tr.get("format") in _PCM_FORMATS
                and "audio" not in out):
            out["audio"] = tr
    return out


def decode_mp4_pcm(data: bytes, tr: dict) -> tuple[np.ndarray, int]:
    """Raw-PCM sound track → (mono int16 samples, rate). Gathers the
    interleaved PCM frames chunk by chunk (stsc runs → per-chunk
    sample counts, stco absolute offsets, stsz sizes), then downmixes
    exactly like ``audio_codec.decode_wav``."""
    fmt = _PCM_FORMATS[tr["format"]]
    channels = int(tr.get("channels") or 1)
    bits = int(tr.get("bits") or 16)
    rate = int(tr.get("rate") or tr.get("timescale") or 0)
    if bits != 16 or channels < 1 or channels > 8 \
            or rate < 1000 or rate > 192_000:
        raise VideoError("mp4 pcm unsupported parameters")
    offsets = tr.get("chunk_offsets")
    stsc = tr.get("stsc")
    sizes = tr.get("sample_sizes")
    if offsets is None or stsc is None or sizes is None \
            or not len(offsets) or not len(stsc):
        raise VideoError("mp4 pcm missing sample tables")
    n_chunks = len(offsets)
    # expand stsc runs → samples per chunk
    spc = np.empty(n_chunks, np.int64)
    for k in range(len(stsc)):
        first = int(stsc[k, 0]) - 1
        last = int(stsc[k + 1, 0]) - 1 if k + 1 < len(stsc) else n_chunks
        if first < 0 or first >= n_chunks or last > n_chunks:
            raise VideoError("mp4 stsc run out of range")
        spc[first:last] = stsc[k, 1]
    if isinstance(sizes, tuple):
        const, count = sizes
        sizes = np.full(count, const, np.int64)
    if spc.sum() != len(sizes):
        raise VideoError("mp4 stsc/stsz disagree")
    parts: list[bytes] = []
    si = 0
    for ci in range(n_chunks):
        off = int(offsets[ci])
        k = int(spc[ci])
        nbytes = int(sizes[si: si + k].sum())
        if off < 0 or off + nbytes > len(data):
            raise VideoError("mp4 chunk overruns file")
        parts.append(data[off: off + nbytes])
        si += k
    pcm = b"".join(parts)
    usable = len(pcm) - len(pcm) % (2 * channels)
    samples = np.frombuffer(pcm[:usable], dtype=fmt).astype(np.int32)
    if channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1)
        samples = np.rint(samples).astype(np.int32)
    return samples.astype(np.int16), rate


def extract_video_unit(
    payload_b64: str,
) -> tuple[list[tuple[str, str, str]], int, float, str | None]:
    """One ``video`` input span → video_meta + video_frame spans, plus
    audio_meta + audio_segment spans when a raw-PCM track demuxes."""
    import base64
    import binascii

    from docling_ray.functions.hashing import stable_hash64
    from docling_ray.stages.asr import sample_keyframes
    from docling_ray.stages.audio_codec import vad_segments

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
    if "audio" in meta:
        try:
            samples, rate = decode_mp4_pcm(data, meta["audio"])
        except (VideoError, struct.error, IndexError,
                OverflowError) as e:
            return [], -1, 0.0, f"video audio demux error: {e}"
        fp = stable_hash64(samples.tobytes()) & 0xFFFFFFFFFFFFFFFF
        aref = f"mp4pcm://{rate}/{len(samples)}/{fp:016x}"
        a_dur = len(samples) * 1000 // rate
        spans.append(("audio_meta", f"{rate}hz {a_dur}ms", aref))
        for s, e in vad_segments(samples, rate):
            spans.append(("audio_segment", f"{s}-{e}", aref))
    return spans, -1, 1.0, None
