"""WAV PCM decode + energy-based voice-activity segmentation.

The reference's ASR pipeline (``docling/pipeline/asr_pipeline.py:30``)
hands whole audio files to whisper-class models; no ASR model or ffmpeg
exists in this container (the transcriber registry in ``stages/asr.py``
stays env-stubbed), but the AUDIO FRONT END — container decode and
speech/silence segmentation, the part every ASR pipeline runs before
any model — is plain signal processing and is rebuilt here from
scratch, same playbook as the raster decoders:

- :func:`decode_wav` — RIFF/WAVE parse (chunk walk, ``fmt `` + ``data``),
  PCM 8-bit unsigned / 16-bit signed, mono or multi-channel (channels
  average to mono in int32 then round — exact for duplicated channels).
- :func:`vad_segments` — fixed 20 ms frames, a frame is VOICE when its
  peak |sample| clears an absolute int16 threshold; maximal voice runs
  become (start_ms, end_ms) segments. Deterministic and hand-computable,
  so the synth generator writes amplitude-planned signals and derives
  the expected segments from its PLAN, never from this detector.
- :func:`extract_audio_unit` — one ``audio`` input span (base64 WAV) →
  an ``audio_meta`` span plus one ``audio_segment`` span per voice run,
  each carrying ``wavpcm://rate/n_samples/fp`` (a fingerprint of the
  decoded mono int16 samples — equality proves the decode, the
  imgpx:// convention). Malformed payloads raise :class:`AudioError`,
  which the extract path turns into status=failure rows.
"""

from __future__ import annotations

import struct

import numpy as np

from docling_ray.functions.hashing import stable_hash64

FRAME_MS = 20
VOICE_PEAK = 1311  # |int16| threshold ≈ 0.04 full scale


class AudioError(ValueError):
    """Malformed or unsupported audio payload."""


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (mono int16 samples, sample_rate)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise AudioError("not a WAV")
    i = 12
    fmt = None
    pcm = None
    n = len(data)
    while i + 8 <= n:
        cid = data[i: i + 4]
        (size,) = struct.unpack("<I", data[i + 4: i + 8])
        body = data[i + 8: i + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise AudioError("WAV fmt chunk truncated")
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if audio_fmt != 1:
                raise AudioError(
                    f"WAV codec {audio_fmt} not supported (PCM only)")
            if bits not in (8, 16):
                raise AudioError(f"WAV {bits}-bit not supported")
            if channels < 1 or channels > 8 or rate < 1000 \
                    or rate > 192_000:
                raise AudioError("WAV bad fmt parameters")
            fmt = (channels, rate, bits)
        elif cid == b"data":
            pcm = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise AudioError("WAV missing fmt/data chunk")
    channels, rate, bits = fmt
    if bits == 16:
        usable = len(pcm) - len(pcm) % (2 * channels)
        samples = np.frombuffer(pcm[:usable], dtype="<i2") \
            .astype(np.int32)
    else:
        usable = len(pcm) - len(pcm) % channels
        samples = (np.frombuffer(pcm[:usable], np.uint8)
                   .astype(np.int32) - 128) << 8
    if channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1)
        samples = np.rint(samples).astype(np.int32)
    return samples.astype(np.int16), rate


def vad_segments(samples: np.ndarray, rate: int,
                 frame_ms: int = FRAME_MS,
                 peak: int = VOICE_PEAK) -> list[tuple[int, int]]:
    """Maximal voice runs as (start_ms, end_ms): a frame is VOICE when
    max |sample| >= peak; a trailing partial frame counts as a frame;
    end_ms clamps to the true duration."""
    spf = max(1, rate * frame_ms // 1000)
    n = len(samples)
    if n == 0:
        return []
    n_frames = (n + spf - 1) // spf
    padded = np.zeros(n_frames * spf, np.int32)
    padded[:n] = np.abs(samples.astype(np.int32))
    peaks = padded.reshape(n_frames, spf).max(axis=1)
    voice = peaks >= peak
    duration_ms = n * 1000 // rate
    out: list[tuple[int, int]] = []
    start = None
    for f in range(n_frames + 1):
        on = f < n_frames and voice[f]
        if on and start is None:
            start = f
        elif not on and start is not None:
            out.append((start * frame_ms,
                        min(f * frame_ms, duration_ms)))
            start = None
    return out


def extract_audio_unit(
    payload_b64: str,
) -> tuple[list[tuple[str, str, str]], int, float, str | None]:
    """One ``audio`` input span → audio_meta + audio_segment spans."""
    import base64
    import binascii

    try:
        data = base64.b64decode(payload_b64, validate=True)
    except (binascii.Error, ValueError) as e:
        return [], -1, 0.0, f"audio base64 decode error: {e}"
    try:
        samples, rate = decode_wav(data)
    except (AudioError, struct.error, IndexError, OverflowError) as e:
        return [], -1, 0.0, f"audio decode error: {e}"
    fp = stable_hash64(samples.tobytes()) & 0xFFFFFFFFFFFFFFFF
    ref = f"wavpcm://{rate}/{len(samples)}/{fp:016x}"
    duration_ms = len(samples) * 1000 // rate
    spans = [("audio_meta", f"{rate}hz {duration_ms}ms", ref)]
    for s, e in vad_segments(samples, rate):
        spans.append(("audio_segment", f"{s}-{e}", ref))
    return spans, -1, 1.0, None
