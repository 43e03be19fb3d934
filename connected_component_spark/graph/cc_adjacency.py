"""Second, independent CC implementation: adjacency-list stars.

The reference ships TWO connected-components implementations and
differences them — the alternating-star kernel and a GraphX Pregel
run over the same input (reference CCGraphXDriver.scala:31-33,84-86).
PySpark has no GraphX binding (SURVEY.md §7.4), so this module fills
the differential role with a formulation that is structurally the
*literal* port of the reference's grouping strategy: neighbors are
collected into per-node adjacency arrays (``collect_set``, the
DataFrame twin of the reference's ``aggregateByKey(HashSet)``,
ConnectedComponent.scala:65-69,139-141), the group minimum is
``array_min``, and the star emissions are ``explode`` over a
higher-order ``filter`` — exactly the per-group flow of
ConnectedComponent.scala:147-159 (large star) and :75-86 (small
star).

It therefore shares NO physical strategy with the production kernel
(graph/cc.py: join-based stars, scalar min aggregation, min-map
join-back): different shuffle payloads (arrays vs scalars), different
operators (hash-agg-with-collect vs join), different emission code.
Matching full assignment tables on multi-million-node generated
graphs is strong evidence neither implementation shares a bug — the
role the GraphX differential plays in the reference.

This path deliberately keeps the reference's degree-skew hazard (a
hub's whole neighborhood in one array, the hazard its comments warn
about at ConnectedComponent.scala:62-63,135-136), which is why the
join-based kernel stays the production default; this one is a test
oracle and a compat surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from connected_component_spark.graph.cc import (
    CCResult,
    _canonical_edges,
    _set_fingerprint,
)

__all__ = [
    "large_star_adjacency",
    "small_star_adjacency",
    "connected_components_adjacency",
]


def large_star_adjacency(edges: DataFrame) -> DataFrame:
    """Large-Star via per-node adjacency arrays
    (reference ConnectedComponent.scala:114-176, grouping at :139-141).

    Per node ``v`` with collected neighbors ``N``: ``m = min(v ∪ N)``;
    emit ``(n, m)`` for every ``n ∈ v ∪ N`` with ``n >= v``
    (:147-159) — the ``n = v`` member contributes the ``(v, m)`` row.
    """
    und = edges.where(F.col("src") != F.col("dst"))
    directed = (
        und.union(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .union(edges.where(F.col("src") == F.col("dst")))
    )
    grouped = directed.groupBy("src").agg(F.collect_set("dst").alias("nbrs"))
    with_min = grouped.select(
        "src",
        "nbrs",
        F.least(F.col("src"), F.array_min("nbrs")).alias("m"),
    )
    from_neighbors = with_min.select(
        F.explode(
            F.filter(F.col("nbrs"), lambda n: n >= F.col("src"))
        ).alias("src"),
        F.col("m").alias("dst"),
    )
    from_self = with_min.select("src", F.col("m").alias("dst"))
    return from_neighbors.union(from_self)


def small_star_adjacency(edges: DataFrame) -> DataFrame:
    """Small-Star via per-node adjacency arrays
    (reference ConnectedComponent.scala:42-107, grouping at :65-69).

    Orient (larger, smaller) (:49-55); per group ``v`` with neighbors
    ``N`` (all ``<= v`` after orientation): ``m = min(v ∪ N)``; emit
    ``(n, m)`` for ``n ∈ N`` with ``n != m`` plus the ``(v, m)`` row
    (:75-86), deduplicated.
    """
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"),
        F.least("src", "dst").alias("dst"),
    )
    grouped = oriented.groupBy("src").agg(F.collect_set("dst").alias("nbrs"))
    with_min = grouped.select(
        "src",
        "nbrs",
        F.least(F.col("src"), F.array_min("nbrs")).alias("m"),
    )
    from_neighbors = with_min.select(
        F.explode(
            F.filter(F.col("nbrs"), lambda n: n != F.col("m"))
        ).alias("src"),
        F.col("m").alias("dst"),
    )
    from_self = with_min.select("src", F.col("m").alias("dst"))
    return from_neighbors.union(from_self).distinct()


def connected_components_adjacency(
    edges: DataFrame, max_iterations: int = 20
) -> CCResult:
    """Alternating-star fixpoint over the adjacency-array stars.

    Independent twin of graph/cc.py:connected_components — same
    contract (deduplicated ``(node, component)``, component = member
    minimum), disjoint physical strategy.  Convergence is the
    stable-set fingerprint (count + order-insensitive checksum), one
    action per round, per-round ``localCheckpoint`` for lineage
    truncation.
    """
    pairs = _canonical_edges(edges).distinct().localCheckpoint()
    converged = False
    iterations = 0
    prev_fp: tuple[int, int] | None = None
    for iterations in range(1, max_iterations + 1):
        pairs = small_star_adjacency(large_star_adjacency(pairs)).localCheckpoint(
            eager=False
        )
        # shared with the join-based kernel so the convergence rule
        # can never drift between the two differential twins
        fp = _set_fingerprint(pairs)
        if fp == prev_fp:
            converged = True
            break
        prev_fp = fp
    assignments = (
        pairs.groupBy(F.col("src").alias("node"))
        .agg(F.min("dst").alias("component"))
    )
    return CCResult(
        assignments=assignments, converged=converged, iterations=iterations
    )
