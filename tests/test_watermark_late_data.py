"""Watermark semantics: append-mode windowed aggregation finalizes a
window once the watermark passes its end, and events arriving later
than the watermark are DROPPED — the late-data contract that bounds
streaming state at scale."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F


def _write_file(spark, rows, path, mtime):
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    tmp = path + "_tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
    os.replace(os.path.join(tmp, part), path)
    import shutil

    shutil.rmtree(tmp)
    os.utime(path, (mtime, mtime))


def test_late_event_dropped_after_watermark(spark, tmp_path):
    import datetime as dt

    t = lambda s: dt.datetime.fromisoformat(f"2024-01-01 {s}")  # noqa: E731
    staged = str(tmp_path / "stream")
    os.makedirs(staged)
    now = time.time()
    # batch 0: two rows in window 00:00
    _write_file(
        spark,
        [(1, t("00:10:00"), 1.0), (2, t("00:20:00"), 1.0)],
        os.path.join(staged, "000.parquet"),
        now,
    )
    # batch 1: 03:30 advances the (1h) watermark to 02:30, past
    # window 00:00's end
    _write_file(
        spark, [(3, t("03:30:00"), 1.0)], os.path.join(staged, "001.parquet"), now + 10
    )
    # batch 2: filler — Spark's late-record filter applies the
    # watermark with one micro-batch of lag, so the drop is only
    # guaranteed for data arriving ≥2 batches after the advance
    _write_file(
        spark, [(6, t("03:40:00"), 1.0)], os.path.join(staged, "002.parquet"), now + 20
    )
    # batch 3: a LATE row for window 00:00 (must be dropped) + fresh
    _write_file(
        spark,
        [(4, t("00:40:00"), 1.0), (5, t("04:30:00"), 1.0)],
        os.path.join(staged, "003.parquet"),
        now + 30,
    )

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(staged)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.date_format("w.start", "HH:mm").alias("win"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_data_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {(r.win, r.n) for r in spark.table("late_data_test").collect()}
    # window 00:00 finalized with the on-time rows only; the late
    # event_id=4 was dropped; trailing windows (03:00+) never finalize
    assert rows == {("00:00", 2)}, rows
