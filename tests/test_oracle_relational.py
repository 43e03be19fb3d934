"""Every relational query must hash-match its DuckDB oracle — this is
the local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from connected_component_spark.queries import relational
from tests.oracle_utils import compare, duck_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_oracle(spark, sf_dir, con, name):
    df = relational.QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, con, relational.ORACLES[name])
    assert ok, f"{name}: {msg}"
