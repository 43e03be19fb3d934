"""Fixed-iteration PageRank as an iterative DataFrame dataflow.

Same execution shape as the CC kernel (`graph/cc.py`): the loop
lives driver-side, each iteration is one join + one hash aggregate,
and the rank DataFrame is `localCheckpoint`-ed every round so plan/
lineage depth stays constant no matter the iteration count — the
reference's own iterate-until-done discipline
(`/root/reference/src/main/scala/com/kwartile/lib/cc/
ConnectedComponent.scala:230-258`) applied to a different vertex
program.

Cross-engine determinism: a parallel double sum is order-dependent
in the last ulp, so per-destination contribution sums are done in
DECIMAL(38,18) (exact, associative) and cast back to double — the
same parity rule as queries/parity.py:dsum.  Every other operation
(division by out-degree, damping arithmetic) is a scalar double op
with a bit-identical result in any engine.

Dangling nodes: the symmetric-edge contract (callers pass an
undirected graph, both directions present) means every node has
out-degree ≥ 1, so no dangling-mass redistribution term is needed;
`pagerank` asserts the contract by construction (it symmetrizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    checkpoint: bool = True,
) -> DataFrame:
    """Rank the nodes of an undirected graph: (node, rank) after
    `iterations` synchronous PageRank rounds at the given damping.

    `edges` (src, dst) is symmetrized and de-duplicated internally;
    self-loops are dropped.  Isolated nodes (no surviving edge) do
    not participate.  Ranks are unnormalized PageRank probabilities
    (they sum to 1 across participating nodes).
    """
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    und = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .unionAll(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            ).where(F.col("src") != F.col("dst"))
        )
        .distinct()
    )
    out = und.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # (src, dst, outdeg) is reused by every iteration — checkpoint it
    # once so the scan/dedup work isn't re-run per round
    linked = und.join(out, "src")
    if checkpoint:
        linked = linked.localCheckpoint(eager=True)
    n = linked.select("src").distinct().count()
    if n == 0:
        return und.select(
            F.col("src").alias("node"), F.lit(0.0).alias("rank")
        )

    base = (1.0 - damping) / n
    rank = linked.select("src").distinct().select(
        F.col("src").alias("node"), F.lit(1.0 / n).alias("rank")
    )
    for _ in range(iterations):
        contrib = (
            linked.join(rank, linked.src == rank.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg"))
                .cast("decimal(38,18)")
                .alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").cast("double").alias("in_sum"))
        )
        rank = contrib.select(
            "node", (F.lit(base) + F.lit(damping) * F.col("in_sum")).alias("rank")
        )
        if checkpoint:
            rank = rank.localCheckpoint(eager=False)
    return rank
