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

Concurrency (advice r7): two processes hitting the same unready key
(e.g. pytest and bench.py) previously both got ``needs_build=True``
and could rmtree each other's half-built dir.  ``staged_dir`` now
takes an ``O_CREAT|O_EXCL`` lockfile for the build→``mark_ready``
window: the loser waits for the winner's sentinel (or steals a lock
whose recorded pid is dead — a crashed builder must not wedge the
cache) and returns ``needs_build=False`` once the dir is ready.
Single-process behavior is unchanged.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import time

__all__ = ["staged_dir", "mark_ready"]

_SENTINEL = "_READY"
_LOCK_WAIT_S = 600.0


def _lock_path(path: str) -> str:
    return path + ".lock"


def _try_lock(lock: str) -> bool:
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return False
    with os.fdopen(fd, "w") as fh:
        fh.write(str(os.getpid()))
    return True


def _lock_stale(lock: str) -> bool:
    """True when the lockfile's recorded pid no longer exists (same
    host — the cache lives in the local tempdir, so pid liveness is a
    valid staleness test) OR is this very process: staged_dir calls
    are sequential within a process, so an own-pid lock means a prior
    build attempt here raised before mark_ready — reclaim rather than
    deadlock our own retry."""
    try:
        with open(lock) as fh:
            pid = int(fh.read().strip() or "0")
    except (OSError, ValueError):
        # unreadable/empty lock: mid-write by a live holder — not stale
        return False
    if pid <= 0:
        return False
    if pid == os.getpid():
        return True
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return True
    except PermissionError:
        return False
    return False


def staged_dir(kind: str, src_file: str, *extra: str) -> tuple[str, bool]:
    """Return (path, needs_build) for a staging dir derived from
    ``src_file``.  ``kind`` namespaces the cache (one subtree per
    consumer); ``extra`` tokens version the staging layout.

    When ``needs_build`` is True the caller holds the build lock and
    MUST call :func:`mark_ready` (which releases it); concurrent
    callers for the same key block until then and get the built dir.
    """
    key = hashlib.md5(
        "|".join(
            [src_file, str(os.stat(src_file).st_mtime_ns), *extra]
        ).encode()
    ).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), kind, key)
    if os.path.exists(os.path.join(path, _SENTINEL)):
        return path, False
    os.makedirs(os.path.dirname(path), exist_ok=True)
    lock = _lock_path(path)
    deadline = time.monotonic() + _LOCK_WAIT_S
    while not _try_lock(lock):
        if os.path.exists(os.path.join(path, _SENTINEL)):
            return path, False  # another process finished the build
        if _lock_stale(lock):
            try:
                os.unlink(lock)  # crashed builder; steal (unlink races
            except FileNotFoundError:  # with other waiters — first wins)
                pass
            continue
        if time.monotonic() > deadline:
            raise TimeoutError(
                f"staging build lock held >{_LOCK_WAIT_S:.0f}s: {lock}"
            )
        time.sleep(0.1)
    # lock held: re-check ready (the previous holder may have finished
    # between our sentinel check and the acquire), else wipe half-built
    if os.path.exists(os.path.join(path, _SENTINEL)):
        os.unlink(lock)
        return path, False
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    return path, True


def mark_ready(path: str) -> None:
    """Stamp a completed build and release the build lock; until this
    runs the dir is treated as half-built and rebuilt on the next
    request."""
    with open(os.path.join(path, _SENTINEL), "w") as fh:
        fh.write("ok")
    try:
        os.unlink(_lock_path(path))
    except FileNotFoundError:
        pass
