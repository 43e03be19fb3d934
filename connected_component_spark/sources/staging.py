"""Shared mtime-keyed staging-directory cache.

One implementation of the protocol three call sites previously each
carried (streamq replays, z-order rewrite, compaction round-trip —
review r7): a staging dir under the system tempdir keyed by
md5(source path | source mtime | extra tokens), with a ``_READY``
sentinel marking a completed build.  A changed fixture (mtime) or a
changed staging layout (version token in ``extra``) gets a fresh dir;
repeated runs reuse the files; a half-built dir (no sentinel) is
wiped and rebuilt.  Spark's file listing ignores ``_``-prefixed
files, so the sentinel never enters a read.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

__all__ = ["staged_dir", "mark_ready"]

_SENTINEL = "_READY"


def staged_dir(kind: str, src_file: str, *extra: str) -> tuple[str, bool]:
    """Return (path, needs_build) for a staging dir derived from
    ``src_file``.  ``kind`` namespaces the cache (one subtree per
    consumer); ``extra`` tokens version the staging layout."""
    key = hashlib.md5(
        "|".join(
            [src_file, str(os.stat(src_file).st_mtime_ns), *extra]
        ).encode()
    ).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), kind, key)
    if os.path.exists(os.path.join(path, _SENTINEL)):
        return path, False
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    return path, True


def mark_ready(path: str) -> None:
    """Stamp a completed build; until this runs the dir is treated as
    half-built and rebuilt on the next request."""
    with open(os.path.join(path, _SENTINEL), "w") as fh:
        fh.write("ok")
