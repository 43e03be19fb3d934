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
    if name not in relational.ORACLES:
        # sketch queries are engine-specific by construction — assert
        # the approximation bound instead of a hash match
        rows = df.collect()
        assert rows, f"{name}: empty result"
        for r in rows:
            assert abs(r.approx_users - r.exact_users) <= max(
                0.1 * r.exact_users, 2
            ), f"{name}: approx off by >10%: {r}"
        return
    ok, msg = compare(df, con, relational.ORACLES[name])
    assert ok, f"{name}: {msg}"
