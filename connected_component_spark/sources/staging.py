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

Concurrency (advice r7, hardened review r8, steal serialized
advice r9, atomic lock creation advice r11): two processes hitting
the same unready key previously both got ``needs_build=True`` and
could rmtree each other's half-built dir.  The build→ready window is
now guarded by a lockfile hard-linked into place ALREADY CONTAINING
its owner's ``pid:thread`` (temp-file + ``os.link`` — no observable
empty-lock state, so a live builder can never be misclassified as a
SIGKILL corpse however slowly it runs):

* a loser waits for the winner's sentinel, or steals a lock whose
  recorded pid is DEAD (a crashed builder must not wedge the cache);
* steals are SERIALIZED through a per-key advisory ``flock`` on a
  stable guard file (advice r9): the staleness re-check and the
  unlink happen under the guard, so two waiters can never both act
  on the same stale observation — previously waiter 1 could unlink
  and re-create the lock (becoming the live builder) and waiter 2's
  pending unlink would remove waiter 1's FRESH lock, re-opening the
  mutual-rmtree window the lock exists to close.  The guard file is
  content-free and never unlinked; the kernel drops the flock when
  its holder dies, so a crashed stealer cannot wedge the guard;
* a lock recorded by THIS pid is stolen only when no build in this
  process is actually in flight for it (``_IN_FLIGHT`` bookkeeping) —
  so a sibling THREAD's live build is never stolen, while a build
  that raised without releasing is reclaimed instead of deadlocking
  its own process (review r8);
* :func:`ensure_staged` is the preferred API: it runs the build
  callback and RELEASES the lock on failure, so a raising builder
  never wedges other processes for the timeout window.  The raw
  ``staged_dir``/``mark_ready`` pair stays for callers that need the
  two-call shape, with the weaker failure contract that implies.
"""

from __future__ import annotations

import fcntl
import hashlib
import os
import shutil
import tempfile
import threading
import time
import weakref
from collections.abc import Callable

__all__ = ["staged_dir", "mark_ready", "ensure_staged"]

_SENTINEL = "_READY"
_LOCK_WAIT_S = 600.0
#: an EMPTY lockfile is never produced by this module any more (locks
#: are hard-linked into place already containing their owner, advice
#: r11) — the shape can only be a pre-r11 corpse or foreign garbage,
#: and one older than this grace window is classified stale so it
#: cannot wedge the key forever (advice r10).
_EMPTY_LOCK_GRACE_S = 5.0

#: lock path → (owning thread ident, weakref to the owning Thread)
#: for builds in flight in THIS process, guarded by _BOOK — the
#: thread-level complement of the pid recorded in the lockfile.  The
#: weakref (not the raw ident) decides liveness: thread idents are
#: recycled, so "ident appears in threading.enumerate()" can match an
#: unrelated live thread and keep a dead builder's lock un-stealable
#: forever (advice r11).
_BOOK = threading.Lock()
_IN_FLIGHT: dict[str, tuple[int, weakref.ref]] = {}


def _lock_path(path: str) -> str:
    return path + ".lock"


def _holder_alive(entry: tuple[int, weakref.ref] | None) -> bool:
    """True iff a registry entry's owning Thread object is still
    alive.  A collected or exited Thread is dead even when its ident
    was recycled by an unrelated live thread (advice r11)."""
    if entry is None:
        return False
    thread = entry[1]()
    return thread is not None and thread.is_alive()


def _try_lock(lock: str) -> bool:
    # The owner id is written to a temp file and hard-linked into the
    # lock path, so the lock is created ATOMICALLY already containing
    # its owner (advice r11): no process can ever observe an empty
    # lockfile from a live builder, which closes the cross-process
    # steal window the previous O_EXCL-create-then-write shape left
    # open (a LIVE builder CPU-starved >grace between the create and
    # the pid write could be classified stale and lose its lock).
    # Link + registry insert run under _BOOK, and every _IN_FLIGHT
    # reader takes _BOOK, so a sibling thread can never observe
    # own-pid-lock-exists without its registration (advice r9).
    # Registering cannot clobber a live sibling's entry: link success
    # proves no one else holds this lock path.
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(lock) or ".", prefix=".lock_tmp_"
    )
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write(f"{os.getpid()}:{threading.get_ident()}")
        with _BOOK:
            try:
                os.link(tmp, lock)
            except FileExistsError:
                return False
            _IN_FLIGHT[lock] = (
                threading.get_ident(),
                weakref.ref(threading.current_thread()),
            )
        return True
    finally:
        os.unlink(tmp)


def _lock_owner(lock: str) -> tuple[int, int | None] | None:
    """(pid, thread_ident|None) recorded in the lockfile, or None when
    the file is unreadable/empty/mid-write.  Accepts the bare-pid
    format older tests plant."""
    try:
        with open(lock) as fh:
            content = fh.read().strip()
    except OSError:
        return None
    if not content:
        return None
    head, _, tail = content.partition(":")
    try:
        pid = int(head)
    except ValueError:
        return None
    if pid <= 0:
        return None
    ident = None
    if tail:
        try:
            ident = int(tail)
        except ValueError:
            ident = None
    return pid, ident


def _release_lock(lock: str) -> None:
    """Release THIS thread's lock.  Runs under the same per-key guard
    flock as _steal_if_stale, and deletes the lockfile (and registry
    entry) only when it still records this (pid, thread) — a release
    racing a steal must not remove the NEW holder's fresh lock or its
    registration (review r9: _release_lock preempted between its
    registry pop and unlink could erase a sibling stealer's live
    build, re-opening the mutual-rmtree window)."""
    guard = lock + ".guard"
    fd = os.open(guard, os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        me = (os.getpid(), threading.get_ident())
        # the registry pop is branch-independent: only OUR entry is
        # ever removed, whether the lockfile is still ours or was
        # stolen (review r9 — the ours/stolen distinction governs
        # ONLY the unlink, where the race lives)
        with _BOOK:
            entry = _IN_FLIGHT.get(lock)
            if entry is not None and entry[0] == me[1]:
                _IN_FLIGHT.pop(lock, None)
        owner = _lock_owner(lock)
        if owner is not None and (
            owner == me or (owner[0] == me[0] and owner[1] is None)
        ):
            # ours (bare-pid form: legacy/test-planted, same process —
            # the pre-r9 release semantics apply)
            try:
                os.unlink(lock)
            except FileNotFoundError:
                pass
    finally:
        os.close(fd)


def _lock_stale(lock: str) -> bool:
    """True when the lockfile's holder cannot finish the build.

    Foreign pid: stale iff the pid no longer exists (same host — the
    cache lives in the local tempdir, so pid liveness is a valid
    staleness test).  Own pid: consult the thread-level registry —
    stale when no build is registered (a hard edge skipped release),
    when THIS thread owns it (calls are sequential within a thread,
    so the prior build here must have raised through the raw two-call
    API without releasing — reclaim instead of deadlocking our own
    retry), or when the owning thread has exited.  A sibling thread's
    LIVE build is never stolen (review r8)."""
    owner = _lock_owner(lock)
    if owner is None:
        # Unreadable/empty lock: _try_lock hard-links locks into place
        # already containing their owner (advice r11), so this shape
        # is a pre-r11 corpse or foreign garbage — never a live
        # builder of this module version.  Still consult the
        # same-process registry first (a test or embedder may plant
        # the shape around a registered build), then age-bound the
        # classification so an orphaned empty lock cannot wedge the
        # key for every process until TimeoutError (advice r10).
        with _BOOK:
            entry = _IN_FLIGHT.get(lock)
        if entry is not None:
            if entry[0] == threading.get_ident():
                # our own sequential-thread residue: reclaim, same as
                # the non-empty own-thread branch below
                return True
            if _holder_alive(entry):
                return False
        try:
            age = time.time() - os.stat(lock).st_mtime
        except OSError:
            return False  # vanished: the holder released — just retry
        return age > _EMPTY_LOCK_GRACE_S
    pid = owner[0]
    if pid == os.getpid():
        with _BOOK:
            entry = _IN_FLIGHT.get(lock)
        if entry is None or entry[0] == threading.get_ident():
            return True
        # The weakref (not the recorded ident) decides liveness: a
        # dead builder whose ident was recycled by an unrelated live
        # thread must still classify stale (advice r11).
        return not _holder_alive(entry)
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return True
    except PermissionError:
        return False
    return False


def _steal_if_stale(lock: str) -> bool:
    """Examine-and-unlink a stale lock ATOMICALLY w.r.t. other
    stealers (advice r9).  The flock on the stable ``.guard`` sidecar
    serializes the whole staleness-check → unlink sequence: a waiter
    that re-creates the lock after winning a steal can no longer have
    its FRESH lock removed by a second stealer acting on the same
    stale observation, because the second stealer re-checks staleness
    under the guard and sees the new live holder.  Returns True when
    this caller removed a stale lock (the caller should immediately
    retry the acquire)."""
    guard = lock + ".guard"
    fd = os.open(guard, os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        if not _lock_stale(lock):
            return False
        try:
            os.unlink(lock)
        except FileNotFoundError:
            pass  # holder released between check and unlink — fine
        return True
    finally:
        os.close(fd)  # drops the flock; guard file persists (stable)


#: .lock_tmp_* files older than this are corpses of a builder that
#: died between mkstemp and the finally-unlink — far above any live
#: _try_lock's sub-millisecond tmp lifetime
_TMP_REAP_AGE_S = 600.0


def _reap_lock_tmp(namespace_dir: str) -> None:
    """Best-effort sweep of orphaned ``.lock_tmp_*`` files (a builder
    SIGKILLed inside :func:`_try_lock` leaves its temp file behind;
    nothing else ever removes it — review r11).  Age-bounded so a
    live builder's in-flight temp is never touched; every error is
    swallowed (reaping is hygiene, never correctness)."""
    try:
        now = time.time()
        for name in os.listdir(namespace_dir):
            if not name.startswith(".lock_tmp_"):
                continue
            p = os.path.join(namespace_dir, name)
            try:
                if now - os.stat(p).st_mtime > _TMP_REAP_AGE_S:
                    os.unlink(p)
            except OSError:
                pass
    except OSError:
        pass


def staged_dir(kind: str, src_file: str, *extra: str) -> tuple[str, bool]:
    """Return (path, needs_build) for a staging dir derived from
    ``src_file``.  ``kind`` namespaces the cache (one subtree per
    consumer); ``extra`` tokens version the staging layout.

    When ``needs_build`` is True the caller holds the build lock and
    MUST call :func:`mark_ready` (which releases it); concurrent
    callers for the same key block until then and get the built dir.
    A caller whose build may raise should use :func:`ensure_staged`
    instead — with the raw pair, a failure leaves the lock held until
    this process either retries the same key or exits.
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
    _reap_lock_tmp(os.path.dirname(path))
    lock = _lock_path(path)
    deadline = time.monotonic() + _LOCK_WAIT_S
    while not _try_lock(lock):
        if os.path.exists(os.path.join(path, _SENTINEL)):
            return path, False  # another process finished the build
        if _steal_if_stale(lock):
            continue
        if time.monotonic() > deadline:
            raise TimeoutError(
                f"staging build lock held >{_LOCK_WAIT_S:.0f}s: {lock}"
            )
        time.sleep(0.1)
    # lock held: re-check ready (the previous holder may have finished
    # between our sentinel check and the acquire), else wipe half-built
    if os.path.exists(os.path.join(path, _SENTINEL)):
        _release_lock(lock)
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
    _release_lock(_lock_path(path))


def ensure_staged(
    kind: str, src_file: str, *extra: str, build: Callable[[str], None]
) -> str:
    """Build-or-reuse in one call: returns the ready staging dir,
    invoking ``build(path)`` only when this caller wins the build.
    On build failure the lock is RELEASED immediately (the half-built
    dir, without its sentinel, is wiped by the next acquirer), so a
    raising builder never wedges concurrent processes for the
    timeout window — the failure contract the raw two-call API can't
    offer (review r8)."""
    path, needs_build = staged_dir(kind, src_file, *extra)
    if needs_build:
        try:
            build(path)
        except BaseException:
            _release_lock(_lock_path(path))
            raise
        mark_ready(path)
    return path
