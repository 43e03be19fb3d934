"""Partition pruning: a filter on the partition column must become a
PartitionFilter (directory-level pruning), not a data filter — the
difference between scanning one day and scanning 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from connected_component_spark.plans.inspect import summarize_plan
from connected_component_spark.sources.tables import load_table


def test_partitioned_write_prunes_directories(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    path = str(tmp_path / "events_by_day")
    ev.write.partitionBy("day").mode("overwrite").parquet(path)

    back = spark.read.parquet(path)
    one_day = back.where(F.col("day") == "2024-01-03").select("event_id", "value")
    s = summarize_plan(one_day)
    pf = " ".join(s.partition_filters)
    assert "day" in pf and "2024-01-03" in pf, f"no partition filter: {pf!r}"
    # the pruned read returns exactly the day's rows
    expected = ev.where(F.date_format("ts", "yyyy-MM-dd") == "2024-01-03").count()
    assert one_day.count() == expected > 0
