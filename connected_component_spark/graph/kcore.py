"""k-core decomposition (iterative peeling) as a DataFrame dataflow.

The k-core of a graph is its maximal subgraph in which every node
has degree ≥ k.  Peeling computes it by repeatedly dropping nodes of
degree < k and re-inducing the edge set — a monotone fixpoint, so
the result is deterministic and, once stable, further rounds are
no-ops (which is what lets the Spark early-exit loop agree exactly
with a fixed-round unrolled SQL oracle).

Execution shape mirrors `graph/cc.py`: driver-side loop, per-round
`localCheckpoint` keeps lineage constant, one scalar edge-count
action per round decides convergence.  Each round is a degree
aggregate plus two semi joins on the edge keys — all equi-joins, so
at 100 TB the cost per round is two shuffles of the *surviving* edge
set, which shrinks monotonically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["k_core"]


def k_core(
    edges: DataFrame,
    k: int,
    max_rounds: int = 20,
    checkpoint: bool = True,
) -> DataFrame:
    """(node, degree) for every node of the k-core, with its degree
    inside the core.

    ``edges`` (src, dst) is symmetrized and de-duplicated; self-loops
    are dropped.  ``max_rounds`` caps peeling (the fixpoint is reached
    when a round removes nothing); with the cap hit before the
    fixpoint the result equals exactly ``max_rounds`` peeling rounds —
    the same operational semantics as an unrolled SQL oracle.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cur = (
        edges.select("src", "dst")
        .unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    if checkpoint:
        # lazy: the count below is the one action and materializes the
        # checkpoint blocks with it (the CC kernel's one-action-per-
        # round discipline, r14 — eager+count was two jobs)
        cur = cur.localCheckpoint(eager=False)
    n_cur = cur.count()
    from connected_component_spark.plans.tuning import shrunk_shuffle

    with shrunk_shuffle(edges.sparkSession, n_cur):
        for _ in range(max_rounds):
            if n_cur == 0:
                break
            keep = (
                cur.groupBy("src")
                .agg(F.count(F.lit(1)).alias("_deg"))
                .where(F.col("_deg") >= k)
                .select("src")
            )
            nxt = cur.join(keep, "src", "left_semi").join(
                keep.select(F.col("src").alias("dst")), "dst", "left_semi"
            )
            if checkpoint:
                # lazy + count = one job per round (see above)
                nxt = nxt.localCheckpoint(eager=False)
            n_nxt = nxt.count()
            if n_nxt == n_cur:
                break
            cur, n_cur = nxt, n_nxt
    return cur.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
