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


def test_scd2_versions_are_contiguous(spark, sf_dir):
    """SCD2 invariants on the sf0.001 fixture: per customer, versions
    start at 1 and are dense; valid_to of version k equals valid_from
    of version k+1; adjacent versions never share a status."""
    from connected_component_spark.queries.relational import (
        q_scd2_customer_status,
    )

    rows = q_scd2_customer_status(spark, sf_dir).collect()
    by_cust: dict = {}
    for r in rows:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    assert by_cust
    for hist in by_cust.values():
        hist.sort(key=lambda r: r["version"])
        assert [r["version"] for r in hist] == list(range(1, len(hist) + 1))
        for a, b in zip(hist, hist[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["status"] != b["status"]
        assert hist[-1]["valid_to"] is None


def test_gapfill_covers_full_span_with_zeros(spark, sf_dir):
    """Gap-fill invariants at sf0.001: per user the day sequence is
    dense from first to last active day; zero-filled days really had
    no events; active-day counts are positive."""
    from connected_component_spark.queries.relational import q_gapfill_daily
    import datetime

    rows = q_gapfill_daily(spark, sf_dir).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    one_day = datetime.timedelta(days=1)
    for days in by_user.values():
        days.sort(key=lambda r: r["day"])
        for a, b in zip(days, days[1:]):
            assert b["day"] - a["day"] == one_day  # dense calendar
        assert days[0]["n_events"] > 0  # span starts at first activity
        assert days[-1]["n_events"] > 0  # and ends at the last
        for r in days:
            assert (r["n_events"] == 0) == (r["n_types"] == 0)


def test_histogram_buckets_partition_the_table(spark, sf_dir):
    """Histogram invariants: bucket counts sum to the table row count,
    the axis is dense, and bounds are width-consistent."""
    from connected_component_spark.queries.relational import q_histogram

    rows = sorted(
        q_histogram(spark, sf_dir).collect(), key=lambda r: r["bucket"]
    )
    li_n = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert sum(r["n_rows"] for r in rows) == li_n
    buckets = [r["bucket"] for r in rows]
    assert buckets == list(range(buckets[0], buckets[-1] + 1))
    for r in rows:
        assert r["hi"] - r["lo"] == 5.0


def test_cumulative_users_monotone_and_bounded(spark, sf_dir):
    """Cumulative distinct users: monotone nondecreasing, ends at the
    total distinct user count, never below the day's active count."""
    from connected_component_spark.queries.relational import q_cumulative_users
    from pyspark.sql import functions as F

    rows = sorted(
        q_cumulative_users(spark, sf_dir).collect(), key=lambda r: r["day"]
    )
    total = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert rows[-1]["cumulative_users"] == total
    prev = 0
    for r in rows:
        assert r["cumulative_users"] >= prev
        # everyone active on day d has been seen by day d
        assert r["cumulative_users"] >= r["active_users"]
        prev = r["cumulative_users"]
    assert sum(r["new_users"] for r in rows) == total


def test_session_windows_agree_with_lag_formulation(spark, sf_dir):
    """The native session_window operator and the lag+cumsum custom
    formulation must carve identical sessions (same per-user session
    count and event totals) — boundary semantics aside, no fixture
    event pair sits at exactly the 1800 s gap."""
    from pyspark.sql import functions as F

    from connected_component_spark.queries.relational import (
        q_session_windows,
        q_sessionization,
    )

    native = q_session_windows(spark, sf_dir)
    custom = q_sessionization(spark, sf_dir)
    n_native = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in native.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
        .collect()
    }
    n_custom = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in custom.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
        .collect()
    }
    assert n_native == n_custom


def test_scd2_random_differential(spark):
    """Seeded random order histories vs a pure-Python islands fold —
    the gaps-and-islands SQL must produce exactly the dict-folded
    version history for arbitrary status sequences and tied dates."""
    import datetime
    import random

    from connected_component_spark.queries.relational import (
        q_scd2_customer_status,
    )

    rng = random.Random(1337)
    rows = []
    okey = 0
    for cust in range(8):
        for _ in range(rng.randrange(1, 15)):
            okey += 1
            day = datetime.datetime(2024, 1, 1) + datetime.timedelta(
                days=rng.randrange(0, 6)  # force plenty of date ties
            )
            rows.append(
                (okey, cust, rng.choice("FOP"), 1.0, day, "1-URGENT")
            )
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        orders.write.parquet(f"{d}/orders.parquet")
        got = {
            (r["o_custkey"], r["version"]): (
                r["status"],
                r["valid_from"],
                r["valid_to"],
                r["n_orders"],
            )
            for r in q_scd2_customer_status(spark, d).collect()
        }

    # python reference: sort by (date, orderkey), fold islands
    expected = {}
    by_cust: dict = {}
    for okey, cust, status, _p, day, _pr in rows:
        by_cust.setdefault(cust, []).append((day.date(), okey, status))
    for cust, hist in by_cust.items():
        hist.sort()
        islands = []
        for day, _okey, status in hist:
            if not islands or islands[-1][0] != status:
                islands.append([status, day, None, 1])
            else:
                islands[-1][3] += 1
        for k, isl in enumerate(islands):
            nxt = islands[k + 1][1] if k + 1 < len(islands) else None
            expected[(cust, k + 1)] = (isl[0], isl[1], nxt, isl[3])
    assert got == expected
