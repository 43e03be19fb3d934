"""Common-neighbor link prediction over an undirected edge list.

The classic "people you may know" scorer: for every non-adjacent
node pair, count shared neighbors; high counts predict future edges.
Exact common-neighbor scoring is inherently a wedge enumeration —
every shared neighbor contributes one wedge, so a hub of degree d
centers d·(d-1)/2 candidate pairs.  The scale control is the same
one production systems use: a **degree cap** that excludes
ultra-hubs as wedge centers (a node connected to everyone predicts
nothing anyway).  The cap is part of the operator's declared
semantics — the SQL oracle applies the identical cap, so results
stay engine-exact rather than depending on an engine-side sampling
heuristic.

Plan shape: degrees (one agg) → capped adjacency → self-join on the
wedge center → pair count (one agg) → anti join against existing
edges → top-k.  All equi-joins and hash aggregates; within the cap,
per-center work is bounded by cap², and AQE splits any residual
reducer skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from connected_component_spark.graph.triangles import undirected_edges

__all__ = ["common_neighbor_candidates"]


def common_neighbor_candidates(
    edges: DataFrame,
    top_k: int = 20,
    max_center_degree: int = 50,
) -> DataFrame:
    """Top ``top_k`` non-adjacent pairs by common-neighbor count.

    (node_a, node_b, common_neighbors) with node_a < node_b, ordered
    by (common_neighbors desc, node_a, node_b) — the deterministic
    tie-break makes the LIMIT reproducible across engines.  Wedge
    centers with degree > ``max_center_degree`` are excluded (hub
    guard, see module docstring).
    """
    und = undirected_edges(edges)
    sym = und.select(F.col("u").alias("b"), F.col("v").alias("n")).union(
        und.select(F.col("v").alias("b"), F.col("u").alias("n"))
    )
    deg = sym.groupBy("b").agg(F.count(F.lit(1)).alias("deg"))
    capped = sym.join(
        deg.where(F.col("deg") <= max_center_degree).select("b"), "b"
    )
    wedges = (
        capped.select(F.col("b"), F.col("n").alias("node_a"))
        .join(
            capped.select(F.col("b"), F.col("n").alias("node_b")),
            "b",
        )
        .where(F.col("node_a") < F.col("node_b"))
    )
    scored = wedges.groupBy("node_a", "node_b").agg(
        F.count(F.lit(1)).cast("long").alias("common_neighbors")
    )
    non_adjacent = scored.join(
        und.select(F.col("u").alias("node_a"), F.col("v").alias("node_b")),
        ["node_a", "node_b"],
        "left_anti",
    )
    return non_adjacent.orderBy(
        F.col("common_neighbors").desc(), "node_a", "node_b"
    ).limit(top_k)
