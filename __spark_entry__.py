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
    # -- r2-absent queries first (VERDICT task 2: these must get driver
    # rows this round; multimodal_frames has never had one) ----------
    "multimodal_frames",        # never driver-verified (r1+r2 truncation)
    "multimodal_features",      # changed r2, no driver row since
    "ann_similarity_clusters",  # re-routed through LSH this round
    "dedup_embedding_clusters", # re-routed through LSH this round
    "ann_cosine_topk",          # bounded query batch this round
    "ann_lsh_topk",             # absent from r2 run
    "ann_ivf_topk",             # absent from r2 run
    "multimodal_metadata",      # absent from r2 run
    "multimodal_resize",        # absent from r2 run
    "q_approx_profile",         # oracle added this round (was no_oracle)
    "q_approx_quantiles",       # new this round (quantile sketch contract)
    "q_scd2_customer_status",   # new this round (SCD2 effective-dated dim)
    "q_copurchase_pairs",       # new this round (market-basket co-occurrence)
    "ann_radius_search",        # new this round (fixed-threshold retrieval)
    "text_token_rarity",        # new this round (corpus-frequency scoring)
    "graph_link_prediction",    # new this round (common-neighbor scoring)
    "q_gapfill_daily",          # new this round (time-series densification)
    "q_histogram",              # new this round (equi-width histogram)
    "q_cumulative_users",       # new this round (cumulative distinct via first-seen)
    "q_session_windows",        # new this round (native session_window operator)
    "stream_session_windows",   # new this round (native streaming session windows)
    "pipeline_weighted_mixture",  # new this round (per-stratum mixture rates)
    "graph_khop_sql",           # new this round (native recursive CTE, SQL entry path)
    # -- new-this-round queries, hardest/least-TPC-H-like first ------
    "q_funnel",                 # new this round (time-constrained funnel)
    "q_cohort_retention",       # new this round (weekly cohort triangle)
    "q_fuzzy_part_match",       # new this round (blocked fuzzy join)
    "text_distinctive_terms",   # new this round (TF-IDF keyword extraction)
    "dedup_substring",          # new this round (exact-substring dup profile)
    "q_profile_lineitem",       # new this round (ANALYZE-style profiling)
    "q02_min_cost_supplier",    # new this round (TPC-H Q2 correlated min)
    "q11_important_stock",      # new this round (TPC-H Q11 scalar-threshold HAVING)
    "q16_supplier_relationship",  # new this round (TPC-H Q16 distinct-count + NOT IN)
    "q20_excess_suppliers",     # new this round (TPC-H Q20 nested semi-joins)
    "text_repetition",          # new this round (Gopher repetition filters)
    "text_boilerplate",         # new this round (C4 cross-doc boilerplate)
    "graph_shortest_paths",     # new this round (landmark BFS)
    "graph_kcore",              # new this round (k-core peeling)
    "graph_label_propagation",  # new this round (deterministic LPA communities)
    "embedding_kmeans",         # new this round (distributed Lloyd k-means)
    "stream_event_pairs_outer", # new this round (watermarked outer join)
    "q_session_overlap",        # new this round (interval-overlap join)
    "stream_static_enrich",     # new this round (stream-static dim join)
    "q_window_time_range",      # new this round (event-time RANGE frame)
    "graph_triangles",          # new this round (degree-ordered triangle census)
    "graph_pagerank",           # new this round (fixed-iteration PageRank)
    "q08_market_share",         # new this round (TPC-H Q8 conditional ratio)
    "q09_product_profit",       # new this round (TPC-H Q9 profit, modeled cost)
    "q13_order_distribution",   # new this round (TPC-H Q13 outer-join dist)
    "q15_top_supplier",         # new this round (TPC-H Q15 argmax view)
    "q17_small_qty_revenue",    # new this round (TPC-H Q17 correlated avg)
    "q18_large_volume",         # new this round (TPC-H Q18 HAVING join-back)
    "q21_late_suppliers",       # new this round (TPC-H Q21 exists/not-exists)
    "q22_idle_balance",         # new this round (TPC-H Q22 anti join + scalar)
    "q_asof_orders",            # new this round (distributed as-of join)
    "pipeline_corpus_curation", # new this round (end-to-end curation)
    "q_interval_spikes",        # new this round (bin-bucketed range join)
    "pipeline_split_decontamination",  # new this round (hash split + leakage)
    "stream_dedup",             # new this round (exactly-once stream dedup)
    "pipeline_source_mixture",  # new this round (stratified source caps)
    "pipeline_sequence_packing",  # new this round (distributed prefix-sum pack)
    "text_vocabulary",          # new this round (top-n vocab aggregate)
    "ann_recall_report",        # new this round (hash-checked ANN recall)
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
