"""LLM-ops + graph queries vs their DuckDB oracles (driver t2 replica)."""

from __future__ import annotations

import pytest

from connected_component_spark.queries import graph, llmops, streamq
from tests.oracle_utils import compare, duck_connection

ALL = {**llmops.QUERIES, **graph.QUERIES, **streamq.QUERIES}
ORACLES = {**llmops.ORACLES, **graph.ORACLES, **streamq.ORACLES}


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ALL))
def test_llmops_oracle(spark, sf_dir, con, name):
    df = ALL[name](spark, sf_dir)
    ok, msg = compare(df, con, ORACLES[name])
    assert ok, f"{name}: {msg}"


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql).issubset(set(qs))
    assert len(qs) >= 30


def test_entry_staleness_rotation():
    """Registry order = verification priority (r4 verdict #4): queries
    with no green driver row anywhere come first, then queries changed
    this round, then everything else stalest-first — so under the
    driver's 50-row budget each round's rows are exactly the stalest/
    changed queries."""
    import __spark_entry__ as e

    qs = list(e.queries())
    green = e._green_rounds()
    idx = {q: i for i, q in enumerate(qs)}
    never = [q for q in qs if green.get(q, 0) == 0]
    changed = [q for q in qs if q in e._CHANGED_THIS_ROUND and green.get(q, 0) > 0]
    rest = [q for q in qs if green.get(q, 0) > 0 and q not in e._CHANGED_THIS_ROUND]
    for n in never:
        assert all(idx[n] < idx[c] for c in changed)
        assert all(idx[n] < idx[r] for r in rest)
    for c in changed:
        assert all(idx[c] < idx[r] for r in rest)
    lasts = [green[q] for q in rest]
    assert lasts == sorted(lasts), "stable queries not ordered stalest-first"
    # the artifacts the rotation reads exist and parse
    assert green, "no CORRECTNESS_r*.json artifacts found"
