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
        # guard against Spark's 200-partition default on a driver
        # session: 32 matches the locally-tested config (wide enough
        # for Python-heavy stages, no 200-task overhead at sf0.01).
        # Partition count never affects declared results; iterative
        # operators re-size further via plans/tuning.py.
        ("spark.sql.shuffle.partitions", "32"),
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


# Registry order = verification priority.  The driver's correctness
# run is time-budgeted (r1 and r2 both truncated at 50 rows), so
# queries that have never been driver-verified or whose code changed
# this round are rotated to the FRONT; long-stable queries absorb any
# truncation.
_PRIORITY = (
    # -- the 12 queries that have never had a driver CORRECTNESS row in
    # any round (r3 verdict task 1) — these MUST make the 50-row budget
    # this round so every declared query has a hard-signal green row ---
    "q_asof_orders",
    "q_interval_spikes",
    "q18_large_volume",
    "q21_late_suppliers",
    "q22_idle_balance",
    "stream_dedup",
    "text_vocabulary",
    "pipeline_corpus_curation",
    "pipeline_split_decontamination",
    "pipeline_source_mixture",
    "pipeline_sequence_packing",
    "ann_recall_report",
    # -- changed this round (must be re-verified) ---------------------
    "ann_lsh_topk",             # corpus-sized LSH planes (r3 verdict task 2)
    "ann_similarity_clusters",  # corpus-sized LSH planes
    "dedup_embedding_clusters", # corpus-sized LSH planes
    "ann_ivf_topk",             # k-means coarse quantizer (r3 verdict task 7)
    "stream_session_windows",   # files-per-trigger from staged file count (ADVICE)
    "text_token_rarity",        # broadcast hint gated on vocab size (ADVICE)
    # -- new this round -----------------------------------------------
    "ann_ivf_kmeans_topk",      # trained spherical-k-means IVF codebook
    "text_source_divergence",   # per-source KL mixture diagnostic
    "pipeline_doc_chunks",      # overlapping-window doc chunking
    "pipeline_semantic_dedup",  # SemDeDup: kmeans partition + in-cluster dedup
)

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


def _ordered(registries: list[dict]) -> dict:
    merged: dict = {}
    for reg in registries:
        merged.update(reg)
    out = {name: merged[name] for name in _PRIORITY if name in merged}
    out.update(merged)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered([mod.QUERIES for mod in _modules()])


def oracle_sql() -> dict[str, str]:
    return _ordered([mod.ORACLES for mod in _modules()])
