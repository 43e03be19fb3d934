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
