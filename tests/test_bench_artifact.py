"""bench.py per-query artifact target selection (VERDICT r14 #1).

Two consecutive rounds lost the driver's round-over-round per-query
comparison (PERF n_common=0) because an existing inferred-name
``BENCH_LOCAL_r{N}.json`` made the write silently skip.  The fix
falls back to a suffixed sibling on collision; these tests pin that
contract without importing Spark (the selector is pure filesystem
logic).
"""

from __future__ import annotations

import importlib.util
import os

_BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")
_spec = importlib.util.spec_from_file_location("bench_mod", _BENCH)
bench_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench_mod)

select = bench_mod._select_local_target


def _touch(d, name):
    with open(os.path.join(d, name), "w") as f:
        f.write("{}")


def test_env_pinned_round_refreshes_own_artifact(tmp_path):
    d = str(tmp_path)
    _touch(d, "BENCH_LOCAL_r07.json")
    n, target = select(d, "7", 32)
    assert n == 7
    # pinned rounds are an intentional request: same name, even if it exists
    assert target == os.path.join(d, "BENCH_LOCAL_r07.json")


def test_inferred_round_is_max_bench_plus_one(tmp_path):
    d = str(tmp_path)
    _touch(d, "BENCH_r03.json")
    _touch(d, "BENCH_r14.json")
    n, target = select(d, None, 32)
    assert n == 15
    assert target == os.path.join(d, "BENCH_LOCAL_r15.json")


def test_collision_falls_back_to_core_suffix_not_skip(tmp_path):
    """The r13/r14 failure mode: inferred name exists -> the medians
    must land in a suffixed sibling, never be dropped."""
    d = str(tmp_path)
    _touch(d, "BENCH_r14.json")
    _touch(d, "BENCH_LOCAL_r15.json")
    n, target = select(d, None, 32)
    assert n == 15
    assert target == os.path.join(d, "BENCH_LOCAL_r15_32c.json")


def test_double_collision_counts_up(tmp_path):
    d = str(tmp_path)
    _touch(d, "BENCH_r14.json")
    _touch(d, "BENCH_LOCAL_r15.json")
    _touch(d, "BENCH_LOCAL_r15_8c.json")
    n, target = select(d, None, 8)
    assert target == os.path.join(d, "BENCH_LOCAL_r15_8c_2.json")


def test_inferred_never_overwrites(tmp_path):
    """Exhausted fallbacks yield None (no write) rather than clobber."""
    d = str(tmp_path)
    _touch(d, "BENCH_r14.json")
    _touch(d, "BENCH_LOCAL_r15.json")
    _touch(d, "BENCH_LOCAL_r15_32c.json")
    for k in range(2, 10):
        _touch(d, f"BENCH_LOCAL_r15_32c_{k}.json")
    n, target = select(d, None, 32)
    assert target is None


def test_malformed_env_round_falls_back_to_inference(tmp_path):
    d = str(tmp_path)
    _touch(d, "BENCH_r09.json")
    n, target = select(d, "ninety", 32)
    assert n == 10
    assert target == os.path.join(d, "BENCH_LOCAL_r10.json")
