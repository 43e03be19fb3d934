"""Bucketed co-located join: assert the shuffle actually disappears
from the physical plan (the 100 TB join strategy, SURVEY.md §2.3
partitioning row)."""

from __future__ import annotations

from pyspark.sql import functions as F

from connected_component_spark.plans.inspect import summarize_plan
from connected_component_spark.sources.bucketing import (
    bucketed_join_ready,
    write_bucketed_table,
)


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "o_orderkey")
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed_table(
        li, "li_bucketed", "o_orderkey", 8, path=str(tmp_path / "li")
    )
    write_bucketed_table(
        orders, "ord_bucketed", "o_orderkey", 8, path=str(tmp_path / "ord")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join_ready(spark, "li_bucketed", "ord_bucketed")
        s = summarize_plan(joined)
        assert s.sort_merge_joins == 1
        assert s.exchanges == 0, "bucketed join must not shuffle"
        # and it still computes the right thing
        n = joined.count()
        expected = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .join(
                spark.read.parquet(f"{sf_dir}/orders.parquet"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert n == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS ord_bucketed")
