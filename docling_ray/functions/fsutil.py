"""Atomic directory publish with a ``_SUCCESS`` marker.

Shared by every derived-artifact cache (stored corpus, expected tables,
bench corpus, checkpoint shard dirs): build into a per-process temp dir,
mark, rename into place. Concurrent builders race benignly — exactly one
rename wins, losers discard their temp dir. A stale *marker-less*
destination (a crashed builder's debris) is removed and the rename
retried once, so the cache self-heals instead of rebuilding forever
against a corrupt dir.
"""

from __future__ import annotations

import os
import shutil


def publish_dir(tmp: str, dest: str, marker_name: str = "_SUCCESS") -> None:
    """Atomically move the fully-built ``tmp`` dir to ``dest``.

    The marker file is written into ``tmp`` first, so ``dest`` is only
    ever visible in a complete state. If ``dest`` already exists WITH a
    marker, another builder won — ``tmp`` is discarded. If it exists
    without one, it is crash debris: remove it and retry once.
    """
    with open(os.path.join(tmp, marker_name), "w") as f:
        f.write("ok")
    try:
        os.rename(tmp, dest)
        return
    except OSError:
        pass
    if not os.path.exists(os.path.join(dest, marker_name)):
        shutil.rmtree(dest, ignore_errors=True)
        try:
            os.rename(tmp, dest)
            return
        except OSError:
            pass
    shutil.rmtree(tmp, ignore_errors=True)


def ensure_threadsafe_fs_imports() -> None:
    """Pre-resolve Ray Data's lazy fsspec-HTTP import before driver
    threads run concurrent streaming executions.

    Ray's path resolution probes ``fsspec.implementations.http`` on every
    read/write (``ray/data/datasource/path_util.py``), catching only
    ModuleNotFoundError. In an env without aiohttp the module fails
    MID-import; two driver threads probing simultaneously can observe the
    partially-initialized module and get a plain ImportError ("cannot
    import name 'HTTPFileSystem'") that escapes Ray's catch and kills the
    shard job. Import it once here — and if it cannot import, install a
    minimal stub so every later probe succeeds deterministically (the
    stub class matches no real filesystem instance; HTTP URLs are never
    used by this engine).
    """
    try:
        import fsspec.implementations.http  # noqa: F401
    except Exception:
        import sys
        import types

        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # isinstance() target only
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules.setdefault("fsspec.implementations.http", mod)
