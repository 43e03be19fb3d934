"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Query registries live next to their implementations:
``connected_component_spark/queries/{relational,llmops,graph}.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _ensure_session_confs(spark: SparkSession) -> None:
    """Apply runtime-settable engine confs to a driver-provided
    session (events.parquet needs nanosAsLong, which is static —
    sources/tables.py falls back gracefully if unset)."""
    for k, v in [
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ]:
        try:
            spark.conf.set(k, v)
        except Exception:
            pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: minhash-LSH near-dup
    clustering of documents with the alternating-star CC kernel as
    the clustering backbone (the reference's algorithm driving an
    LLM-data-pipeline operator)."""
    _ensure_session_confs(spark)
    from connected_component_spark.queries.llmops import dedup_minhash_clusters

    return dedup_minhash_clusters(spark, "/root/testdata/sf0.001")


# Registry order = verification priority: the reference-kernel CC
# queries and the streaming surface run right after the relational
# set so a time-budgeted correctness run records them early (the r1
# run truncated before the tail of the registry).
_MODULE_ORDER = ("relational", "graph", "streamq", "llmops")


def _modules():
    from connected_component_spark.queries import graph, llmops, relational, streamq

    order = {
        "relational": relational,
        "graph": graph,
        "streamq": streamq,
        "llmops": llmops,
    }
    return [order[name] for name in _MODULE_ORDER]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return out
