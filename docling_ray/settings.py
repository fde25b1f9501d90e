"""Engine settings: per-format options table + environment overrides.

The reference exposes two configuration surfaces (SURVEY.md §2.9): a
per-format options dict handed to the converter
(``DocumentConverter(format_options={InputFormat.X: FormatOption(...)})``)
and process-wide settings with environment overrides
(``docling/datamodel/settings.py:57-61``, ``DOCLING_`` prefix). This is
the Ray-native equivalent:

  * :data:`DEFAULT_FORMAT_OPTIONS` — one options dict per input-span
    kind; extractors consult :func:`options_for` lazily, so a pipeline
    can call :func:`configure` once on the driver and ship the overrides
    to workers via the batch-fn closure.
  * Environment overrides use the ``DOCLING_RAY_`` prefix with
    ``<KIND>__<OPTION>`` keys, e.g.
    ``DOCLING_RAY_HTML__LINK_DENSITY_MAX=0.5`` or
    ``DOCLING_RAY_EBCDIC__CODEPAGE=cp500`` — read once per process at
    first use (same late-binding the reference's pydantic settings do).

Values are plain scalars (str/int/float/bool) so the whole table is
msgpack/pickle-friendly for actor shipping.
"""

from __future__ import annotations

import os
from typing import Any

_ENV_PREFIX = "DOCLING_RAY_"

DEFAULT_FORMAT_OPTIONS: dict[str, dict[str, Any]] = {
    "html": {
        "infer_furniture": True,
        "strip_boilerplate": True,
        "link_density_max": 0.65,
        "min_links": 3,
    },
    "ebcdic": {
        "codepage": "cp037",
        "record_len": 80,
    },
    "pdf": {
        # pages scoring below this parse quality are dropped
        "min_parse_score": 0.5,
        # candidate decryption passwords for the standard security
        # handler, tried (after the empty password) as user then owner
        # password — comma-separated string here / in the env, or a
        # list via configure("pdf", passwords=[...])
        "passwords": "",
    },
    "extract": {
        # the skew router's byte-size threshold (pipelines/extract.py)
        "big_threshold": 1 << 20,
        "batch_size": 32,
        # per-document wall-clock budget in seconds, 0 = off: once
        # exceeded, remaining units are skipped as timeout errors and the
        # doc surfaces as partial_success — reference document_timeout
        # semantics (standard_pdf_pipeline.py:886-963: close intake,
        # mark missing pages TIMEOUT, ConversionStatus.PARTIAL_SUCCESS)
        "document_timeout": 0.0,
        # document limits, 0 = off — reference DocumentLimits
        # (settings.py:23-26): an over-limit doc becomes one failure row
        # at intake, before any extraction or explosion work
        "max_file_size": 0,
        "max_num_pages": 0,
        # per-doc kernel timing column (reference TimeRecorder,
        # docling/utils/profiling.py): when on, output rows carry
        # extract_ms — the skew-diagnosis signal for 100 TB runs
        "profile": False,
    },
    "detect": {
        # treat empty-kind spans as auto-sniffed (stages/assemble.py)
        "auto_sniff": True,
    },
    "image": {
        # decoded-pixel ceiling per frame (stages/image_codec.py)
        "max_pixels": 64_000_000,
    },
    "chunker": {
        # hybrid-chunker token budget (stages/chunker.py)
        "max_tokens": 64,
        "merge_peers": True,
    },
}

_resolved: dict[str, dict[str, Any]] | None = None
_overrides: dict[str, dict[str, Any]] = {}


def _coerce(value: str, like: Any) -> Any:
    if isinstance(like, bool):
        return value.strip().lower() in ("1", "true", "yes", "on")
    if isinstance(like, int):
        return int(value)
    if isinstance(like, float):
        return float(value)
    return value


def _resolve() -> dict[str, dict[str, Any]]:
    global _resolved
    if _resolved is None:
        table = {k: dict(v) for k, v in DEFAULT_FORMAT_OPTIONS.items()}
        for env_key, raw in os.environ.items():
            if not env_key.startswith(_ENV_PREFIX) or "__" not in env_key:
                continue
            kind, opt = env_key[len(_ENV_PREFIX):].split("__", 1)
            kind, opt = kind.lower(), opt.lower()
            if kind in table and opt in table[kind]:
                table[kind][opt] = _coerce(raw, table[kind][opt])
        for kind, opts in _overrides.items():
            table.setdefault(kind, {}).update(opts)
        _resolved = table
    return _resolved


def configure(kind: str, **options: Any) -> None:
    """Programmatic per-format override (wins over env); takes effect for
    subsequent :func:`options_for` calls in this process."""
    global _resolved
    _overrides.setdefault(kind, {}).update(options)
    _resolved = None


def reset() -> None:
    """Drop programmatic overrides and re-read the environment (tests)."""
    global _resolved
    _overrides.clear()
    _resolved = None


def snapshot() -> dict[str, dict[str, Any]]:
    """The programmatic overrides as a plain picklable dict — captured on
    the DRIVER at pipeline-build time and shipped to workers through the
    batch-fn closure (``configure()`` mutates this process only; Ray
    worker processes never see a driver-side call unless the pipeline
    ships the snapshot)."""
    return {k: dict(v) for k, v in _overrides.items()}


def ensure(snap: dict[str, dict[str, Any]] | None) -> None:
    """Worker-side: adopt a driver snapshot. Idempotent and cheap (a dict
    compare per batch); re-resolution only happens when the snapshot
    actually differs from this process's overrides."""
    global _resolved
    if snap is None or snap == _overrides:
        return
    _overrides.clear()
    _overrides.update({k: dict(v) for k, v in snap.items()})
    _resolved = None


def options_for(kind: str) -> dict[str, Any]:
    """The resolved options dict for a format kind (defaults ∪ env ∪
    configure())."""
    return dict(_resolve().get(kind, {}))
