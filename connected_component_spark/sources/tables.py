"""Fixture-table loaders.

One place that knows the physical quirks of the test tables so the
query surface stays clean.  Currently: ``events.ts`` is written as
parquet TIMESTAMP(NANOS), which Spark's vectorized reader refuses;
with ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as a long
that we convert to a microsecond timestamp (all queries aggregate at
second-or-coarser granularity, so the truncation is lossless for
every declared query and matches the DuckDB oracle's view).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["load_table", "table_row_count", "TABLE_NAMES"]

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _ensure_runtime_confs(spark: SparkSession) -> None:
    """Apply the runtime-settable confs every query's correctness
    depends on — queries may be invoked on a driver-provided session
    that never went through session.get_spark / __spark_entry__.entry
    (UTC keeps timestamp formatting oracle-identical)."""
    for k, v in [
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
    ]:
        try:
            spark.conf.set(k, v)
        except Exception:
            pass


def table_row_count(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Exact row count of a fixture table from the parquet footer —
    no Spark job for the single-file fixture layout; falls back to a
    (column-pruned, metadata-served) Spark count for directories."""
    import os

    src = os.path.join(os.path.abspath(sf_dir), f"{name}.parquet")
    if os.path.isfile(src):
        import pyarrow.parquet as pq

        return pq.ParquetFile(src).metadata.num_rows
    return load_table(spark, sf_dir, name).count()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_runtime_confs(spark)
    if name == "events":
        # runtime-settable; required for TIMESTAMP(NANOS) parquet and
        # harmless if the session already has it
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # The fixture generator has shipped ts as TIMESTAMP(NANOS)
        # (arrives long under nanosAsLong), TIMESTAMP(MICROS)
        # isAdjustedToUTC=false (arrives TIMESTAMP_NTZ), and plain
        # TIMESTAMP across rounds.  Normalize every variant to
        # session-tz TIMESTAMP so downstream casts (ts -> long epoch
        # seconds etc.) behave identically; session tz is pinned UTC
        # above, so NTZ -> LTZ is value-preserving.
        dt = df.schema["ts"].dataType
        if isinstance(dt, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(dt, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
