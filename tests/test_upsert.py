"""MERGE/upsert (sources/upsert.py): update-matched, insert-new,
delete-tombstoned, atomicity of the swap, and loud duplicate-key
rejection — checked against a plain-Python dict fold of the same
change stream."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from connected_component_spark.sources.upsert import merge_upsert, read_snapshot

SCHEMA = "id long, val string, n long"


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(path)


def test_merge_update_insert_delete(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _write(spark, path, [(1, "a", 10), (2, "b", 20), (3, "c", 30)])

    changes = spark.createDataFrame(
        [(2, "B2", 21, False), (4, "d", 40, False), (3, None, 0, True)],
        SCHEMA + ", _deleted boolean",
    )
    merge_upsert(read_snapshot(spark, path), changes, "id", path, delete_col="_deleted")

    got = {r["id"]: (r["val"], r["n"]) for r in read_snapshot(spark, path).collect()}
    assert got == {1: ("a", 10), 2: ("B2", 21), 4: ("d", 40)}


def test_merge_is_idempotent_per_batch(spark, tmp_path):
    """Re-applying the same change batch to the merged result is a
    no-op (last-writer-wins makes the fold idempotent)."""
    path = str(tmp_path / "tbl")
    _write(spark, path, [(1, "a", 1), (2, "b", 2)])
    changes = spark.createDataFrame([(2, "b9", 9), (5, "e", 5)], SCHEMA)
    for _ in range(2):
        merge_upsert(read_snapshot(spark, path), changes, "id", path)
    got = {r["id"]: (r["val"], r["n"]) for r in read_snapshot(spark, path).collect()}
    assert got == {1: ("a", 1), 2: ("b9", 9), 5: ("e", 5)}


def test_merge_random_fold_matches_dict(spark, tmp_path):
    """Differential: N random change batches folded by merge_upsert
    equal the same batches folded into a Python dict."""
    import random

    rng = random.Random(4711)
    path = str(tmp_path / "tbl")
    state = {i: (f"v{i}", i) for i in range(20)}
    _write(spark, path, [(k, v[0], v[1]) for k, v in state.items()])

    for batch in range(4):
        seen = set()
        rows = []
        for _ in range(8):
            k = rng.randrange(30)
            if k in seen:
                continue
            seen.add(k)
            if rng.random() < 0.25:
                rows.append((k, None, 0, True))
                state.pop(k, None)
            else:
                v = (f"b{batch}k{k}", rng.randrange(1000))
                rows.append((k, v[0], v[1], False))
                state[k] = v
        changes = spark.createDataFrame(rows, SCHEMA + ", _deleted boolean")
        merge_upsert(
            read_snapshot(spark, path), changes, "id", path, delete_col="_deleted"
        )

    got = {r["id"]: (r["val"], r["n"]) for r in read_snapshot(spark, path).collect()}
    assert got == state


def test_merge_rejects_duplicate_change_keys(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _write(spark, path, [(1, "a", 1)])
    dup = spark.createDataFrame([(7, "x", 1), (7, "y", 2)], SCHEMA)
    with pytest.raises(ValueError, match="duplicate key"):
        merge_upsert(read_snapshot(spark, path), dup, "id", path)
    # table untouched by the rejected merge
    assert read_snapshot(spark, path).count() == 1


def test_merge_rejects_schema_drift(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _write(spark, path, [(1, "a", 1)])
    bad = spark.createDataFrame([(2, "b")], "id long, val string")
    with pytest.raises(ValueError, match="change schema"):
        merge_upsert(read_snapshot(spark, path), bad, "id", path)
    assert os.path.exists(path)


def test_merge_rejects_null_key(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _write(spark, path, [(1, "a", 1)])
    withnull = spark.createDataFrame([(None, "x", 1)], SCHEMA)
    with pytest.raises(ValueError, match="NULL key"):
        merge_upsert(read_snapshot(spark, path), withnull, "id", path)
    assert read_snapshot(spark, path).count() == 1


def test_crash_between_renames_recovers(spark, tmp_path, monkeypatch):
    """Failure injection (r4 verdict #7): a hard kill between the two
    swap renames leaves the committed version only under __old;
    recover_table must restore it and discard the uncommitted temp,
    and the recovered table must read as the PRE-merge version."""
    import connected_component_spark.sources.upsert as up

    path = str(tmp_path / "tbl")
    _write(spark, path, [(1, "a", 10), (2, "b", 20)])
    changes = spark.createDataFrame([(2, "B2", 21), (3, "c", 30)], SCHEMA)

    real_rename = os.rename
    calls = {"n": 0}

    def dying_rename(src, dst):
        calls["n"] += 1
        if calls["n"] == 1:
            real_rename(src, dst)  # path -> __old succeeds
            raise KeyboardInterrupt("simulated hard kill mid-swap")
        real_rename(src, dst)

    monkeypatch.setattr(up.os, "rename", dying_rename)
    # KeyboardInterrupt after the first rename models the kill: the
    # library's cleanup discards the temp, leaving the committed
    # version only under its __old name — exactly the hard-crash
    # state the docstring describes
    with pytest.raises(KeyboardInterrupt):
        merge_upsert(read_snapshot(spark, path), changes, "id", path)
    monkeypatch.undo()

    assert not os.path.exists(path)  # the crash state
    assert up.recover_table(path) == "rolled-back"
    got = {r["id"]: (r["val"], r["n"]) for r in read_snapshot(spark, path).collect()}
    assert got == {1: ("a", 10), 2: ("b", 20)}  # pre-merge version intact
    # all swap debris gone
    assert not [p for p in os.listdir(tmp_path) if "__old_" in p or "__tmp_" in p]
    # second recovery is a no-op "ok"
    assert up.recover_table(path) == "ok"


def test_failed_second_rename_rolls_back_inline(spark, tmp_path, monkeypatch):
    """A FAILED (not killed) second rename triggers the in-function
    rollback: the original version stays readable at path."""
    import connected_component_spark.sources.upsert as up

    path = str(tmp_path / "tbl")
    _write(spark, path, [(1, "a", 10)])
    changes = spark.createDataFrame([(1, "A", 11)], SCHEMA)

    real_rename = os.rename
    calls = {"n": 0}

    def failing_rename(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:  # tmp -> path fails
            raise OSError("simulated rename failure")
        real_rename(src, dst)

    monkeypatch.setattr(up.os, "rename", failing_rename)
    with pytest.raises(OSError, match="simulated"):
        merge_upsert(read_snapshot(spark, path), changes, "id", path)
    monkeypatch.undo()

    got = {r["id"]: (r["val"], r["n"]) for r in read_snapshot(spark, path).collect()}
    assert got == {1: ("a", 10)}


def test_recovery_with_multiple_olds_picks_newest(spark, tmp_path, monkeypatch):
    """Two __old siblings are reachable (a committed merge whose final
    cleanup failed leaves one; a later crashed swap adds another).
    recover_table must restore the NEWEST committed version — ranked
    by the _commit_seq marker — because the uuid suffixes carry no
    order, and lexicographic choice could resurrect the older version
    and delete the newer one (ADVICE r5)."""
    import time

    import connected_component_spark.sources.upsert as up

    path = str(tmp_path / "tbl")
    _write(spark, path, [(1, "a", 10)])

    # merge 1 commits, but its final cleanup "fails": simulate by
    # blocking rmtree so the old version survives as __old debris
    monkeypatch.setattr(
        up.shutil, "rmtree", lambda *a, **k: None
    )
    merge_upsert(
        read_snapshot(spark, path),
        spark.createDataFrame([(1, "A1", 11)], SCHEMA),
        "id",
        path,
    )
    monkeypatch.undo()
    olds = [p for p in os.listdir(tmp_path) if "__old_" in p]
    assert len(olds) == 1  # merge 1's stranded debris (v0 contents)

    # directory mtimes must differ for the ordering to be observable
    time.sleep(0.05)

    # merge 2 commits, then a crash between the renames of merge 3
    # leaves the v2 table only under a second __old name
    merge_upsert(
        read_snapshot(spark, path),
        spark.createDataFrame([(1, "A2", 12)], SCHEMA),
        "id",
        path,
    )
    time.sleep(0.05)
    real_rename = os.rename
    calls = {"n": 0}

    def dying_rename(src, dst):
        calls["n"] += 1
        if calls["n"] == 1:
            real_rename(src, dst)
            raise KeyboardInterrupt("simulated hard kill mid-swap")
        real_rename(src, dst)

    monkeypatch.setattr(up.os, "rename", dying_rename)
    with pytest.raises(KeyboardInterrupt):
        merge_upsert(
            read_snapshot(spark, path),
            spark.createDataFrame([(1, "A3", 13)], SCHEMA),
            "id",
            path,
        )
    monkeypatch.undo()

    assert not os.path.exists(path)
    assert len([p for p in os.listdir(tmp_path) if "__old_" in p]) == 2
    assert up.recover_table(path) == "rolled-back"
    got = {r["id"]: (r["val"], r["n"]) for r in read_snapshot(spark, path).collect()}
    assert got == {1: ("A2", 12)}  # the NEWER committed version, not v0
    assert not [p for p in os.listdir(tmp_path) if "__old_" in p or "__tmp_" in p]


def test_recovery_ignores_inflated_dir_mtime(spark, tmp_path, monkeypatch):
    """ADVICE r6 regression: an interrupted post-commit rmtree deletes
    child entries of the STALE __old, which bumps that directory's
    mtime past the newest committed version's (whose dir mtime is its
    earlier write time).  A newest-by-dir-mtime recovery would rename
    the half-deleted older version over path and rmtree the newest
    committed data — silent data loss.  Ranking by _commit_seq must
    pick the newest committed version regardless of dir mtimes."""
    import glob
    import time

    import connected_component_spark.sources.upsert as up

    path = str(tmp_path / "tbl")
    _write(spark, path, [(1, "a", 10)])

    # two committed merges whose cleanups "fail", stranding v0
    # (markerless) and v1 (seq=1) as __old debris
    monkeypatch.setattr(up.shutil, "rmtree", lambda *a, **k: None)
    for val, n in [("A1", 11), ("A2", 12)]:
        merge_upsert(
            read_snapshot(spark, path),
            spark.createDataFrame([(1, val, n)], SCHEMA),
            "id",
            path,
        )
        time.sleep(0.05)
    monkeypatch.undo()

    # crash mid-swap of merge 3: the newest committed version (v2,
    # seq=2) survives only under a third __old name
    real_rename = os.rename
    calls = {"n": 0}

    def dying_rename(src, dst):
        calls["n"] += 1
        if calls["n"] == 1:
            real_rename(src, dst)
            raise KeyboardInterrupt("simulated hard kill mid-swap")
        real_rename(src, dst)

    monkeypatch.setattr(up.os, "rename", dying_rename)
    with pytest.raises(KeyboardInterrupt):
        merge_upsert(
            read_snapshot(spark, path),
            spark.createDataFrame([(1, "A3", 13)], SCHEMA),
            "id",
            path,
        )
    monkeypatch.undo()
    assert not os.path.exists(path)
    olds = sorted(glob.glob(f"{path}__old_*"))
    assert len(olds) == 3

    # reproduce the interrupted-cleanup effect on the STALE v1 sibling:
    # delete one of its data files (rmtree got partway), which bumps
    # the stale DIR's mtime past every other version's
    stale = next(p for p in olds if up._read_seq(p) == 1)
    victim = glob.glob(os.path.join(stale, "*.parquet"))[0]
    os.remove(victim)
    newest_commit = max(olds, key=up._version_rank)
    future = time.time_ns() + 10_000_000_000
    os.utime(stale, ns=(future, future))  # make the inversion explicit
    assert os.stat(stale).st_mtime_ns > max(
        os.stat(p).st_mtime_ns for p in olds if p != stale
    )
    # dir-mtime ranking would now resurrect the half-deleted v1...
    assert max(olds, key=lambda p: os.stat(p).st_mtime_ns) == stale
    # ...but _commit_seq ranking still names v2
    assert newest_commit != stale and up._read_seq(newest_commit) == 2

    assert up.recover_table(path) == "rolled-back"
    got = {r["id"]: (r["val"], r["n"]) for r in read_snapshot(spark, path).collect()}
    assert got == {1: ("A2", 12)}  # newest committed version, intact
    assert not [p for p in os.listdir(tmp_path) if "__old_" in p or "__tmp_" in p]


def test_committed_merge_survives_cleanup_failure(spark, tmp_path, monkeypatch):
    """The post-commit rmtree of the __old version is best-effort: a
    cleanup failure must not raise (the merge IS committed) and the
    table must read as the merged version (ADVICE r5)."""
    import connected_component_spark.sources.upsert as up

    path = str(tmp_path / "tbl")
    _write(spark, path, [(1, "a", 10)])

    real_rmtree = up.shutil.rmtree

    def failing_rmtree(p, *a, **k):
        if "__old_" in str(p) and not k.get("ignore_errors"):
            raise OSError("simulated cleanup failure")
        return real_rmtree(p, *a, **k)

    monkeypatch.setattr(up.shutil, "rmtree", failing_rmtree)
    merge_upsert(  # must not raise
        read_snapshot(spark, path),
        spark.createDataFrame([(1, "A", 11)], SCHEMA),
        "id",
        path,
    )
    monkeypatch.undo()
    got = {r["id"]: (r["val"], r["n"]) for r in read_snapshot(spark, path).collect()}
    assert got == {1: ("A", 11)}
