"""fuzzy_join: blocked candidates refine to the exact edit-distance
pair set (differential vs the unblocked naive join, restricted to
pairs the blocking recalls), multi-key dedup, and plan shape (the
block join is an equi-join, never a nested loop)."""

from __future__ import annotations

import random
import string

import pytest
from pyspark.sql import functions as F

from connected_component_spark.operators.fuzzy import fuzzy_join, fuzzy_self_pairs
from connected_component_spark.plans.inspect import summarize_plan

_WORDS = ["bolt", "gear", "ring", "widget", "gizmo", "cog"]
_ADJ = ["red", "blue", "big", "small", "hot", "cold", "old", "new"]


def _names(seed: int, n: int) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        name = f"{rng.choice(_ADJ)} {rng.choice(_WORDS)}"
        if rng.random() < 0.3:  # corrupt one char for near-misses
            i = rng.randrange(len(name))
            name = name[:i] + rng.choice(string.ascii_lowercase) + name[i + 1 :]
        out.append(name)
    return out


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.mark.parametrize("max_distance", [0, 1, 2])
def test_fuzzy_self_pairs_match_naive_within_block(spark, max_distance):
    names = sorted(set(_names(11, 120)))
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {
        (r.value_a, r.value_b, r.match_distance)
        for r in fuzzy_self_pairs(df, "name", max_distance).collect()
    }
    # expectation: exactly the pairs sharing the default block (first
    # token, lowered) within the distance — precision AND recall of
    # the blocked plan, verified against a local reference distance
    want = set()
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            if a.split()[0].lower() != b.split()[0].lower():
                continue
            d = _lev(a, b)
            if d <= max_distance:
                want.add((a, b, d))
    assert got == want


def test_fuzzy_join_two_sided_and_collision_guard(spark):
    left = spark.createDataFrame([(1, "red bolt"), (2, "blu gear")], "lid long, lname string")
    right = spark.createDataFrame(
        [(10, "red bolt"), (11, "red boltt"), (12, "blue gear"), (13, "red gear")],
        "rid long, rname string",
    )
    got = {
        (r.lid, r.rid, r.match_distance)
        for r in fuzzy_join(left, right, "lname", "rname", 1).collect()
    }
    # 'blu gear' vs 'blue gear'/'red gear' disagree on the first token
    # -> never candidates (blocking recall boundary, by design)
    assert got == {(1, 10, 0), (1, 11, 1)}
    with pytest.raises(ValueError, match="collision"):
        fuzzy_join(left, right.withColumnRenamed("rname", "lname"), "lname", "lname", 1)


def test_fuzzy_join_multi_key_no_duplicates(spark):
    # both keys (first token, last token) match for every near pair ->
    # without first-shared-key dedup each pair would appear twice
    df = spark.createDataFrame(
        [("red bolt",), ("red boltt",), ("red bolts",), ("blue gear",)],
        "name string",
    )
    keys = [
        lambda c: F.lower(F.split(c, r"\s+").getItem(0)),
        lambda c: F.lower(F.element_at(F.split(c, r"\s+"), -1)),
    ]
    rows = fuzzy_self_pairs(df, "name", 2, block_keys=keys).collect()
    pairs = [(r.value_a, r.value_b) for r in rows]
    assert len(pairs) == len(set(pairs)), "multi-key blocking duplicated a pair"
    assert set(pairs) == {
        ("red bolt", "red boltt"),
        ("red bolt", "red bolts"),
        ("red bolts", "red boltt"),
    }


def test_fuzzy_join_plan_is_equi_join(spark):
    df = spark.createDataFrame([(n,) for n in _names(3, 60)], "name string")
    plan = summarize_plan(fuzzy_self_pairs(df, "name", 2))
    assert plan.cartesian_products == 0
    assert plan.broadcast_nested_loop_joins == 0
    assert plan.joins > 0
