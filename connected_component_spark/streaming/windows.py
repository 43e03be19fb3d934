"""Structured Streaming surface: file-source event streams with
watermarked windowed aggregation.

The reference processes static graph snapshots only (SURVEY.md §2.3:
streaming absent); this module is the engine extension for
stream-shaped inputs (the ``events`` table).  Everything is the
stock Structured Streaming stack — ``readStream`` file source,
event-time ``window`` + ``withWatermark`` for late data, memory sink
for bounded verification runs — so the same code runs continuous
triggers on a real cluster.

Scale notes (100 TB): the windowed aggregate is a streaming
hash-aggregate with state keyed by (window, event_type) — state size
is bounded by the watermark horizon, not the stream length; file
listing is incremental (``maxFilesPerTrigger``); the memory sink is
only for tests/verification — production sinks are
``writeStream.format('parquet'/'kafka')`` on the same plan.
"""

from __future__ import annotations

import hashlib
import itertools
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connected_component_spark.queries.parity import dsum

__all__ = [
    "EVENTS_RAW_SCHEMA",
    "stream_events",
    "windowed_event_counts",
    "run_stream_to_memory",
]

#: events.parquet physical schema under ``nanosAsLong`` (ts arrives
#: as int64 nanoseconds; see sources/tables.py for the batch twin)
EVENTS_RAW_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def _ts_is_nanos(src: str) -> bool:
    """True when events.parquet stores ts as TIMESTAMP(NANOS) (which
    Spark can only read via ``nanosAsLong`` → int64).  The fixture
    generator has shipped both NANOS and MICROS variants across
    rounds; ``readStream`` needs an explicit schema, so the physical
    type must be sniffed from the footer (no Spark job) — assuming
    either variant silently corrupts event time by 1000×."""
    import pyarrow.parquet as pq

    t = pq.ParquetFile(src).schema_arrow.field("ts").type
    return getattr(t, "unit", None) == "ns"

_memory_names = (f"ccs_stream_{i}" for i in itertools.count())


def stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming read of the events table (file source).

    Same physical quirk handling as the batch loader: TIMESTAMP(NANOS)
    parquet arrives as long via ``nanosAsLong`` and is truncated to a
    microsecond timestamp.
    """
    from connected_component_spark.sources.tables import _ensure_runtime_confs

    _ensure_runtime_confs(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = os.path.join(os.path.abspath(sf_dir), "events.parquet")
    nanos = _ts_is_nanos(src)
    schema = EVENTS_RAW_SCHEMA if nanos else EVENTS_RAW_SCHEMA.replace(
        "ts long", "ts timestamp"
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    # the file source only accepts directories; fixtures are single
    # files, so stage a symlink dir (no data copy).  Keyed by a hash
    # of the full sf_dir path, and the link is re-created when it
    # points elsewhere — a stale link from a prior run (same basename,
    # different parent; moved testdata) must not silently stream the
    # wrong data.
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    staged = os.path.join(tempfile.gettempdir(), "ccs_stream_src", key + "_events")
    os.makedirs(staged, exist_ok=True)
    link = os.path.join(staged, "events.parquet")
    if os.path.islink(link):
        if os.readlink(link) != src:
            os.remove(link)
            os.symlink(src, link)
    else:
        # a regular file/dir squatting on the link path would make
        # os.symlink raise — clear any non-symlink occupant first
        if os.path.lexists(link):
            shutil.rmtree(link) if os.path.isdir(link) else os.remove(link)
        os.symlink(src, link)
    df = reader.parquet(staged)
    if nanos:
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling-window counts per event_type.

    Watermark bounds streaming state (windows older than
    ``max(event time) - watermark`` are finalized and dropped); with
    a bounded input and complete output mode the result equals the
    batch GROUP BY, which is the oracle contract.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # decimal sum: partial-aggregation order cannot move the
            # result (raw double sums are the one non-order-stable op;
            # see queries/parity.py)
            dsum("value").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_memory(
    df: DataFrame, output_mode: str = "complete"
) -> DataFrame:
    """Run a (bounded) streaming DataFrame to completion with the
    available-now trigger into a memory sink; return the result as a
    batch DataFrame."""
    name = next(_memory_names)
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)
