"""Interchange sources/sinks: CSV, JSON-lines, and ORC.

Parquet is the engine's native format; the others exist for ingest
and export interchange.  Rules that keep them scale-safe:

* **Text formats (CSV/JSON) require explicit schemas.**  Inference
  reads the data twice (a full extra 100 TB scan) and silently
  changes types when the data drifts; the text readers refuse to
  read without a schema.  ORC carries a typed schema in its own
  footer, so its ``schema`` argument is an optional assertion, not a
  parse recipe.
* **Timestamps round-trip through an explicit pattern** (ISO-8601
  with microseconds), so a parquet → csv → parquet loop is lossless
  at the engine's timestamp resolution.  ORC stores typed
  timestamps natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "read_csv",
    "read_json",
    "write_csv",
    "write_json",
    "read_orc",
    "write_orc",
    "TS_FORMAT",
]

#: ISO-8601 with microseconds: lossless for TIMESTAMP(MICROS) columns
TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

_CSV_OPTS = {
    "header": "true",
    "timestampFormat": TS_FORMAT,
    # empty string vs NULL must be distinguishable or string columns
    # round-trip lossily
    "nullValue": "\\N",
    "escape": '"',
}

_JSON_OPTS = {"timestampFormat": TS_FORMAT}


def read_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """CSV with a required explicit schema (DDL string)."""
    if not schema:
        raise ValueError("read_csv requires an explicit schema — inference "
                         "costs a full extra scan and drifts with the data")
    return spark.read.options(**_CSV_OPTS).schema(schema).csv(path)


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines with a required explicit schema (DDL string)."""
    if not schema:
        raise ValueError("read_json requires an explicit schema — inference "
                         "costs a full extra scan and drifts with the data")
    return spark.read.options(**_JSON_OPTS).schema(schema).json(path)


def write_csv(df: DataFrame, path: str, partition_by: str | None = None) -> None:
    w = df.write.options(**_CSV_OPTS).mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.csv(path)


def write_json(df: DataFrame, path: str, partition_by: str | None = None) -> None:
    w = df.write.options(**_JSON_OPTS).mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.json(path)


def read_orc(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """ORC source (columnar interchange with other Hive-ecosystem
    engines).  Unlike the text formats, ORC carries its own typed
    schema in the file footer, so ``schema`` is optional and, when
    given, acts as an assertion + projection rather than a parse
    recipe — footer stats and column pruning work as with parquet."""
    r = spark.read
    if schema:
        r = r.schema(schema)
    return r.orc(path)


def write_orc(df: DataFrame, path: str, partition_by: str | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.orc(path)
