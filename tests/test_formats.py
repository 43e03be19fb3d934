"""CSV/JSON interchange: lossless round-trips with explicit schemas."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from connected_component_spark.sources.formats import (
    read_csv,
    read_json,
    read_orc,
    write_csv,
    write_json,
    write_orc,
)
from connected_component_spark.sources.tables import load_table

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_events_round_trip(spark, sf_dir, tmp_path, fmt):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / f"events_{fmt}")
    if fmt == "csv":
        write_csv(ev, path)
        back = read_csv(spark, path, EVENTS_DDL)
    elif fmt == "orc":
        write_orc(ev, path)
        back = read_orc(spark, path)
    else:
        write_json(ev, path)
        back = read_json(spark, path, EVENTS_DDL)
    assert back.schema == ev.select(*back.columns).schema
    assert _rows(back) == _rows(ev)


def test_csv_null_vs_empty_string(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "x")], "id long, s string"
    )
    path = str(tmp_path / "nulls")
    write_csv(df, path)
    back = read_csv(spark, path, "id long, s string")
    got = {r.id: r.s for r in back.collect()}
    assert got == {1: None, 2: "", 3: "x"}


def test_partitioned_json_write_prunes(spark, sf_dir, tmp_path):
    from connected_component_spark.plans.inspect import summarize_plan

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    path = str(tmp_path / "by_day")
    write_json(ev, path, partition_by="day")
    back = read_json(
        spark, path, EVENTS_DDL + ", day string"
    ).where(F.col("day") == "2024-01-03")
    s = summarize_plan(back)
    pf = " ".join(s.partition_filters)
    assert "day" in pf and "2024-01-03" in pf, f"no partition filter: {pf!r}"


def test_schema_is_mandatory(spark):
    with pytest.raises(ValueError, match="explicit schema"):
        read_csv(spark, "/tmp/x", "")
    with pytest.raises(ValueError, match="explicit schema"):
        read_json(spark, "/tmp/x", "")
