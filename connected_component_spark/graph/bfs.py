"""Multi-source unweighted BFS (landmark shortest paths) as an
iterative DataFrame dataflow.

Same driver-loop discipline as the CC kernel (`graph/cc.py`) and
`graph/pagerank.py`: each round is one frontier-expansion join plus
one anti join against the visited set, the accumulated distance
table is `localCheckpoint`-ed per round so lineage depth stays
constant, and the only driver-side action is the one frontier-size
scalar that decides termination (the reference's iterate-until-done
shape, `ConnectedComponent.scala:230-258`, applied to a third vertex
program).

Scale shape: per round the frontier join shuffles |frontier| ×
avg-degree candidate rows on the node key and the anti join prunes
them against visited — the standard Pregel BFS; no step ever
materializes more than one frontier expansion, so a 1000-executor
run is bounded by the widest BFS level, not the graph size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["shortest_paths"]


def shortest_paths(
    edges: DataFrame,
    landmarks: DataFrame,
    max_depth: int = 20,
    checkpoint: bool = True,
) -> DataFrame:
    """(node, landmark, distance) for every node reachable from each
    landmark within ``max_depth`` unweighted hops.

    ``edges`` (src, dst) is symmetrized and de-duplicated internally;
    self-loops are dropped.  ``landmarks`` is a one-column DataFrame
    of node ids (its first column is used); every landmark appears in
    the result at distance 0 even when isolated.  Distances are
    first-visit BFS levels, i.e. exact shortest path lengths.
    """
    if max_depth < 0:
        raise ValueError(f"max_depth must be >= 0, got {max_depth}")
    sym = (
        edges.select("src", "dst")
        .unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    if checkpoint:
        sym = sym.localCheckpoint(eager=True)
    lm_col = landmarks.columns[0]
    frontier = landmarks.select(
        F.col(lm_col).alias("node"),
        F.col(lm_col).alias("landmark"),
        F.lit(0).cast("long").alias("distance"),
    ).distinct()
    dists = frontier
    from connected_component_spark.plans.tuning import shrunk_shuffle

    with shrunk_shuffle(edges.sparkSession, sym.count()):
        for depth in range(1, max_depth + 1):
            nxt = (
                frontier.join(sym, frontier.node == sym.src)
                .select(F.col("dst").alias("node"), "landmark")
                .distinct()
                .join(dists, ["node", "landmark"], "left_anti")
                .withColumn("distance", F.lit(depth).cast("long"))
            )
            if checkpoint:
                nxt = nxt.localCheckpoint(eager=True)
            if nxt.isEmpty():
                break
            dists = dists.unionAll(nxt)
            if checkpoint:
                dists = dists.localCheckpoint(eager=True)
            frontier = nxt
    return dists
