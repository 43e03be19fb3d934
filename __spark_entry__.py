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
# run is time-budgeted (~50 rows per round), so the registry is
# ordered by STALENESS computed from the committed CORRECTNESS_r*.json
# artifacts (r4 verdict task 4 — no hand-maintained priority tuple):
#   1. never driver-verified (no green row in any round) — includes
#      every query new this round,
#   2. changed this round (listed below, must re-earn a row),
#   3. everything else, oldest-last-verified-round first,
# with registry order as the deterministic tie-break.  Under the
# 50-row budget every query re-earns a hard-signal row within ~2-3
# rounds.

#: queries whose code path changed this round — re-verify first.
#: Maintained per round alongside the change itself.  (Round 6: no
#: existing query's result-affecting path changed — the round's new
#: queries rank first automatically as never-driver-verified.)
_CHANGED_THIS_ROUND = (
    # r12 (prior round's list: the 6 durable/staged-path movers of
    # r11, all re-earned green).  This round's result-preserving
    # execution-path changes, re-earn per convention:
    # — the durable IVF index moved to single-evaluation repartitioned
    #   folds + one basePath-discovery state scan + lazy re-reads:
    "ann_ivf_incremental_topk",
    "ann_ivf_restart_topk",
    "stream_ann_ingest",
    # — the batch ANN serving family gained probe-pruned storage
    #   (ivf_topk: broadcast LeftSemi on the probed-cell set ahead of
    #   the candidate join; ivfpq_topk: the probe x storage cell join
    #   does the pruning; the durable index keeps a collected list as
    #   a directory-pruning PartitionFilter):
    "ann_ivf_topk",
    "ann_ivf_kmeans_topk",
    "ann_ivfpq_topk",
    "ann_ivfpq_trained_topk",
    "ann_ivfpq_trained_recall",
    "ann_ivfpq_rerank_topk",
    "ann_recall_report",
    # — BM25 scoring refactored through the shared index core plus the
    #   bounded-batch guard (values identical, plan/probe changed):
    "text_bm25_topk",
    "pipeline_hard_negatives",
)


def _green_rounds() -> dict[str, int]:
    """name -> latest round with a green driver CORRECTNESS row
    (err=null and every recorded *_match flag true)."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.abspath(__file__))
    out: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except Exception:
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict) or row.get("err") is not None:
                continue
            flags = [v for k, v in row.items() if k.endswith("_match")]
            # Only affirmatively-true flags count: a null/None flag
            # (e.g. a skipped hash check) must not earn a verified
            # round and deprioritize the query out of the 50-row
            # budget (ADVICE r5).
            if flags and all(v is True for v in flags):
                out[name] = max(out.get(name, 0), rnd)
    return out


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
    verified = _green_rounds()
    registry_pos = {name: i for i, name in enumerate(merged)}

    def staleness(name: str):
        last = verified.get(name, 0)
        if last == 0:
            tier = 0  # never driver-verified
        elif name in _CHANGED_THIS_ROUND:
            tier = 1  # changed this round
        else:
            tier = 2  # stable: stalest first
        return (tier, last, registry_pos[name])

    return {name: merged[name] for name in sorted(merged, key=staleness)}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered([mod.QUERIES for mod in _modules()])


def oracle_sql() -> dict[str, str]:
    return _ordered([mod.ORACLES for mod in _modules()])
