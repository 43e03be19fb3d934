"""sources/staging.py: mtime-keyed cache + the r8 build lock
(advice r7: two processes hitting the same unready key must not
rmtree each other's half-built dir)."""

from __future__ import annotations

import os
import subprocess
import threading
import time

import pytest

from connected_component_spark.sources.staging import (
    _lock_path,
    mark_ready,
    staged_dir,
)


def _touch_src(tmp_path):
    src = tmp_path / "src.txt"
    src.write_text("fixture")
    return str(src)


def test_build_then_reuse(tmp_path):
    src = _touch_src(tmp_path)
    path, needs = staged_dir("ccs_test_stage", src, "v1")
    assert needs
    (open(os.path.join(path, "data"), "w")).write("x")
    mark_ready(path)
    assert not os.path.exists(_lock_path(path))
    path2, needs2 = staged_dir("ccs_test_stage", src, "v1")
    assert path2 == path and not needs2
    assert os.path.exists(os.path.join(path, "data"))


def test_half_built_dir_is_wiped_and_lock_reclaimed_same_pid(tmp_path):
    src = _touch_src(tmp_path)
    path, needs = staged_dir("ccs_test_half", src, "v1")
    assert needs
    open(os.path.join(path, "partial"), "w").write("x")
    # no mark_ready: simulates a build that raised — the lock is still
    # held by THIS pid and must be reclaimed, the partial dir wiped
    path2, needs2 = staged_dir("ccs_test_half", src, "v1")
    assert path2 == path and needs2
    assert not os.path.exists(os.path.join(path, "partial"))
    mark_ready(path)


def test_dead_holder_lock_is_stolen(tmp_path):
    src = _touch_src(tmp_path)
    path, needs = staged_dir("ccs_test_dead", src, "v1")
    assert needs
    mark_ready(path)
    os.remove(os.path.join(path, "_READY"))
    # plant a lock owned by a real-but-exited pid
    proc = subprocess.Popen(["sleep", "0"])
    proc.wait()
    with open(_lock_path(path), "w") as fh:
        fh.write(str(proc.pid))
    path2, needs2 = staged_dir("ccs_test_dead", src, "v1")
    assert path2 == path and needs2
    mark_ready(path)


def test_waiter_blocks_until_live_holder_finishes(tmp_path):
    src = _touch_src(tmp_path)
    path, needs = staged_dir("ccs_test_wait", src, "v1")
    assert needs
    mark_ready(path)
    os.remove(os.path.join(path, "_READY"))
    # lock held by pid 1 (alive forever, kill(1,0) → PermissionError →
    # not stale): the waiter must poll, then pick up the sentinel the
    # "holder" writes and return needs_build=False
    with open(_lock_path(path), "w") as fh:
        fh.write("1")

    def finish():
        time.sleep(0.4)
        with open(os.path.join(path, "_READY"), "w") as fh:
            fh.write("ok")

    t = threading.Thread(target=finish)
    t.start()
    t0 = time.monotonic()
    path2, needs2 = staged_dir("ccs_test_wait", src, "v1")
    t.join()
    assert path2 == path and not needs2
    assert time.monotonic() - t0 >= 0.3
    os.unlink(_lock_path(path))


def test_sibling_thread_live_build_not_stolen(tmp_path):
    """review r8: a LIVE build on another thread of this process must
    not be stolen (the old own-pid reclaim let thread B rmtree thread
    A's in-progress build); the sibling waits and picks up the
    sentinel instead."""
    src = _touch_src(tmp_path)
    results = {}

    def builder():
        path, needs = staged_dir("ccs_test_thread", src, "v1")
        results["builder"] = needs
        time.sleep(0.6)  # simulate a slow build
        open(os.path.join(path, "data"), "w").write("x")
        mark_ready(path)

    t = threading.Thread(target=builder)
    t.start()
    time.sleep(0.2)  # let the builder take the lock
    t0 = time.monotonic()
    path2, needs2 = staged_dir("ccs_test_thread", src, "v1")
    waited = time.monotonic() - t0
    t.join()
    assert results["builder"] is True
    assert needs2 is False  # waited for the sibling, never stole
    assert waited >= 0.3
    assert os.path.exists(os.path.join(path2, "data"))


def test_ensure_staged_releases_lock_on_build_failure(tmp_path):
    """review r8: a raising builder must release the lock immediately
    so other processes don't block for the timeout window; the next
    call rebuilds from scratch."""
    from connected_component_spark.sources.staging import ensure_staged

    src = _touch_src(tmp_path)
    calls = []

    def bad_build(path):
        calls.append("bad")
        open(os.path.join(path, "partial"), "w").write("x")
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        ensure_staged("ccs_test_ensure", src, "v1", build=bad_build)

    def good_build(path):
        calls.append("good")
        assert not os.path.exists(os.path.join(path, "partial"))  # wiped
        open(os.path.join(path, "data"), "w").write("y")

    path = ensure_staged("ccs_test_ensure", src, "v1", build=good_build)
    assert calls == ["bad", "good"]
    assert not os.path.exists(_lock_path(path))
    assert os.path.exists(os.path.join(path, "_READY"))
    # subsequent call reuses without building
    path2 = ensure_staged(
        "ccs_test_ensure", src, "v1",
        build=lambda p: calls.append("never"),
    )
    assert path2 == path and calls == ["bad", "good"]


def test_stale_steal_is_serialized_under_guard(tmp_path):
    """advice r9: the staleness re-check and the unlink happen under a
    per-key flock guard — after one stealer removes a stale lock and a
    new LIVE builder (a sibling thread here) re-creates it, a second
    stealer acting on the same stale observation must re-check under
    the guard, see the fresh live holder, and NOT unlink it (the old
    unguarded unlink could remove the fresh lock, letting two builders
    rmtree each other's dir)."""
    from connected_component_spark.sources.staging import (
        _release_lock,
        _steal_if_stale,
        _try_lock,
    )

    src = _touch_src(tmp_path)
    from connected_component_spark.sources.staging import _BOOK, _IN_FLIGHT

    path, needs = staged_dir("ccs_test_steal", src, "v1")
    assert needs
    mark_ready(path)
    os.remove(os.path.join(path, "_READY"))
    lock = _lock_path(path)
    # plant a stale lock: a real-but-exited pid
    proc = subprocess.Popen(["sleep", "0"])
    proc.wait()
    with open(lock, "w") as fh:
        fh.write(str(proc.pid))
    # stealer 1 removes the dead holder's lock under the guard
    assert _steal_if_stale(lock) is True
    assert not os.path.exists(lock)
    # a sibling thread becomes the fresh LIVE builder
    got_lock = threading.Event()
    done = threading.Event()
    acquired = {}

    def builder():
        acquired["ok"] = _try_lock(lock)
        got_lock.set()
        done.wait(5)

    t = threading.Thread(target=builder)
    t.start()
    assert got_lock.wait(5)
    assert acquired["ok"] is True
    try:
        # stealer 2 (acting on the SAME stale observation) re-checks
        # under the guard: own pid + live sibling owner -> not stale,
        # fresh lock survives
        assert _steal_if_stale(lock) is False
        assert os.path.exists(lock)
    finally:
        done.set()
        t.join()
        # harness cleanup: the lock records the (exited) sibling
        # thread, so a cross-thread _release_lock deliberately leaves
        # it (review r9) — remove the residue directly.  Suppress a
        # missing file so a REGRESSION (the steal wrongly unlinking)
        # surfaces as the assertion above, not as cleanup noise.
        import contextlib

        with contextlib.suppress(FileNotFoundError):
            os.unlink(lock)
        with _BOOK:
            _IN_FLIGHT.pop(lock, None)


def test_try_lock_registers_owner_before_pid_is_visible(tmp_path):
    """advice r9/r11: the lock is hard-linked into place already
    containing its owner and the registry insert shares the same
    _BOOK critical section, so a sibling thread can never observe
    own-pid-with-no-owner for a live build and steal it; a planted
    FRESH empty lockfile (foreign garbage) is still classified
    mid-write, never stale."""
    from connected_component_spark.sources.staging import (
        _IN_FLIGHT,
        _lock_stale,
        _release_lock,
        _try_lock,
    )

    lock = str(tmp_path / "probe.lock")
    # the mid-write state: created, pid not yet written
    open(lock, "w").close()
    assert _lock_stale(lock) is False
    os.unlink(lock)
    assert _try_lock(lock) is True
    try:
        assert lock in _IN_FLIGHT  # registered by the time pid is readable
        with open(lock) as fh:
            pid, _, ident = fh.read().partition(":")
        assert int(pid) == os.getpid()
        assert int(ident) == threading.get_ident()
    finally:
        _release_lock(lock)
    assert not os.path.exists(lock)


def test_release_does_not_remove_stolen_fresh_lock(tmp_path):
    """review r9: a release racing a steal must not delete the new
    holder's fresh lock — _release_lock verifies under the guard that
    the lockfile still records THIS (pid, thread) before unlinking,
    and leaves a sibling's registry entry untouched."""
    from connected_component_spark.sources.staging import (
        _IN_FLIGHT,
        _release_lock,
        _try_lock,
    )

    lock = str(tmp_path / "steal_race.lock")
    # a sibling thread holds the fresh lock (post-steal state)
    got = threading.Event()
    done = threading.Event()

    def builder():
        _try_lock(lock)
        got.set()
        done.wait(5)

    t = threading.Thread(target=builder)
    t.start()
    assert got.wait(5)
    try:
        # the raced releaser (this thread) runs its pending release:
        # the lock records the SIBLING's thread ident, so neither the
        # file nor the sibling's registration may be removed
        _release_lock(lock)
        assert os.path.exists(lock)
        assert _IN_FLIGHT.get(lock)[0] == t.ident
    finally:
        done.set()
        t.join()
    # the true owner thread has exited; the file still records a
    # foreign thread, so a release from here still leaves it — remove
    # the residue directly as the test harness
    from connected_component_spark.sources.staging import _BOOK

    _release_lock(lock)
    assert os.path.exists(lock)
    os.unlink(lock)
    with _BOOK:
        _IN_FLIGHT.pop(lock, None)


def test_empty_lockfile_aged_past_grace_is_stolen(tmp_path):
    """advice r10: a builder SIGKILLed between the O_EXCL create and
    the pid write leaves an EMPTY lockfile.  Fresh, that shape is a
    live holder mid-write (not stale); past the grace window it must
    classify stale and be stolen, or the key wedges every process
    until TimeoutError forever."""
    from connected_component_spark.sources.staging import (
        _EMPTY_LOCK_GRACE_S,
        _lock_stale,
    )

    src = _touch_src(tmp_path)
    path, needs = staged_dir("ccs_test_empty_lock", src, "v1")
    assert needs
    mark_ready(path)
    os.remove(os.path.join(path, "_READY"))
    lock = _lock_path(path)
    open(lock, "w").close()  # empty: the SIGKILL-mid-write corpse shape
    assert not _lock_stale(lock)  # fresh: could be a live mid-write
    old = time.time() - (_EMPTY_LOCK_GRACE_S + 2.0)
    os.utime(lock, (old, old))
    assert _lock_stale(lock)
    # end-to-end: a new acquirer steals the corpse and wins the build
    path2, needs2 = staged_dir("ccs_test_empty_lock", src, "v1")
    assert path2 == path and needs2
    mark_ready(path)


def test_empty_lockfile_of_live_sibling_thread_never_stolen(tmp_path):
    """review r10: the age heuristic must not steal a LIVE builder —
    _try_lock registers _IN_FLIGHT before writing the pid, so an
    empty lock registered to a live sibling thread is a mid-write in
    this process no matter how old (a CPU-starved holder is not a
    corpse)."""
    from connected_component_spark.sources.staging import (
        _BOOK,
        _EMPTY_LOCK_GRACE_S,
        _IN_FLIGHT,
        _lock_stale,
    )

    src = _touch_src(tmp_path)
    path, needs = staged_dir("ccs_test_empty_live", src, "v1")
    assert needs
    mark_ready(path)
    os.remove(os.path.join(path, "_READY"))
    lock = _lock_path(path)
    open(lock, "w").close()
    old = time.time() - (_EMPTY_LOCK_GRACE_S + 2.0)
    os.utime(lock, (old, old))

    import weakref

    hold = threading.Event()

    def sibling():
        with _BOOK:
            _IN_FLIGHT[lock] = (
                threading.get_ident(),
                weakref.ref(threading.current_thread()),
            )
        hold.wait(10)

    t = threading.Thread(target=sibling)
    t.start()
    try:
        while _IN_FLIGHT.get(lock) is None:
            time.sleep(0.01)
        assert not _lock_stale(lock)  # live sibling: never stale
    finally:
        hold.set()
        t.join()
    with _BOOK:
        _IN_FLIGHT.pop(lock, None)
    assert _lock_stale(lock)  # unregistered again: the aged corpse path
    os.unlink(lock)


def test_lock_created_atomically_with_owner(tmp_path):
    """advice r11: the lockfile is hard-linked into place already
    containing pid:thread — there is no observable empty state from a
    live builder, so the SIGKILL-corpse grace heuristic can never
    misclassify a CPU-starved live builder cross-process."""
    from connected_component_spark.sources.staging import (
        _BOOK,
        _IN_FLIGHT,
        _release_lock,
        _try_lock,
    )

    lock = str(tmp_path / "atomic.lock")
    assert _try_lock(lock) is True
    try:
        with open(lock) as fh:
            content = fh.read()
        assert content == f"{os.getpid()}:{threading.get_ident()}"
        # no temp residue next to the lock
        leftovers = [
            f for f in os.listdir(tmp_path) if f.startswith(".lock_tmp_")
        ]
        assert leftovers == []
        # a second acquirer loses and leaves the registry untouched
        assert _try_lock(lock) is False
        with _BOOK:
            assert _IN_FLIGHT[lock][0] == threading.get_ident()
    finally:
        _release_lock(lock)
    assert not os.path.exists(lock)


def test_dead_thread_with_recycled_ident_is_stale(tmp_path):
    """advice r11: _IN_FLIGHT liveness is decided by a weakref to the
    owning Thread, not by its ident appearing in threading.enumerate()
    — a dead builder whose ident was recycled by an unrelated live
    thread must still classify stale, or in-process waiters wedge
    until TimeoutError."""
    import weakref

    from connected_component_spark.sources.staging import (
        _BOOK,
        _IN_FLIGHT,
        _lock_stale,
    )

    lock = str(tmp_path / "recycled.lock")
    # a builder thread that has exited
    dead = threading.Thread(target=lambda: None)
    dead.start()
    dead.join()
    # an unrelated live thread whose ident we pretend was recycled
    hold = threading.Event()
    live = threading.Thread(target=lambda: hold.wait(10))
    live.start()
    try:
        with open(lock, "w") as fh:
            fh.write(f"{os.getpid()}:{live.ident}")
        with _BOOK:
            # registry records the dead builder under the live
            # thread's (recycled) ident — the old ident-set check
            # would call this live forever
            _IN_FLIGHT[lock] = (live.ident, weakref.ref(dead))
        assert _lock_stale(lock) is True
    finally:
        hold.set()
        live.join()
        with _BOOK:
            _IN_FLIGHT.pop(lock, None)
        os.unlink(lock)
