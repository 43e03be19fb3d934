"""Synchronous label propagation (community detection) as an
iterative DataFrame dataflow.

Same driver-side loop discipline as the CC kernel (`graph/cc.py`)
and `graph/pagerank.py`: each round is one equi-join + one hash
aggregate + one per-node top-1 window, `localCheckpoint`-ed so the
plan depth stays constant.  Unlike the CC kernel (which converges to
min-reachable-id), LPA converges to *majority* neighbourhoods — the
community-detection counterpart the reference kernel cannot express
(ConnectedComponent.scala computes components, not communities).

Determinism: classic LPA breaks frequency ties randomly, which is
useless for an oracle-checked engine.  Here ties break by SMALLEST
label, updates are fully synchronous, and the round count is fixed —
the result is a pure function of the edge set, reproducible in ANSI
SQL by unrolling rounds (queries/graph.py:GRAPH_LABEL_PROP_SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["label_propagation"]


def label_propagation(
    edges: DataFrame, iterations: int = 3, checkpoint: bool = True
) -> DataFrame:
    """(node, label) after ``iterations`` synchronous LPA rounds over
    the undirected graph of ``edges`` (src, dst).

    Each node starts labelled with its own id; every round it adopts
    the most frequent label among its neighbours (ties → smallest
    label).  Self-loops are dropped; isolated nodes do not
    participate (symmetrized edges give every participating node a
    neighbour).

    Scale shape: per round one shuffle for the neighbour-label join,
    one for the (node, label) count, one for the per-node top-1
    window — all keyed on node ids, so AQE handles hub skew; no
    all-pairs stage and no driver-side state beyond the loop counter.
    """
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    sym = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .unionAll(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            ).where(F.col("src") != F.col("dst"))
        )
        .distinct()
    )
    if checkpoint:
        sym = sym.localCheckpoint(eager=True)
    labels = sym.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    w = Window.partitionBy("node").orderBy(
        F.col("c").desc(), F.col("label").asc()
    )
    for _ in range(iterations):
        nb = sym.join(
            labels.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "label")
        counted = nb.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("c")
        )
        labels = (
            counted.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("node", "label")
        )
        if checkpoint:
            labels = labels.localCheckpoint(eager=False)
    return labels
