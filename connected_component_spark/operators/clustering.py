"""Distributed Lloyd k-means over an embedding column — the semantic
clustering backbone (SemDeDup-style pipelines group a corpus by
embedding cluster before near-dup pruning).

Scale shape: centroids are k tiny rows held driver-side between
rounds (the same bounded driver state as the CC kernel's convergence
counts) and enter the plan as literal arrays, so an assignment pass
is map-side O(n·k) with NO shuffle and NO join of the corpus; the
update pass posexplodes assigned vectors into (cluster, dim) partial
sums — map-side combine reduces the shuffle to k·dim rows per task.
That is the textbook distributed Lloyd iteration: per round, one
corpus scan plus a tiny aggregate exchange, independent of how many
executors hold the data.

Cross-engine determinism (the whole point of making this an
oracle-checked operator, not a fit-and-hope one):

* vectors are cast to double up front; squared-distance is a
  left-fold in element order (functions/vectors.py:dot discipline),
  bit-identical to DuckDB's ``list_sum(list_transform(...))``;
* centroid literals are rendered in 17-significant-digit scientific
  notation, which Java's double parser round-trips exactly — the
  injected constants are bit-identical to the computed means;
* argmin ties break on centroid id via a (dist, cid) struct
  array_min;
* centroid means go through DECIMAL(38,18) sums (associative,
  order-free) divided by the member count — the parity rule of
  queries/parity.py:dsum / graph/pagerank.py;
* initial centroids are the ``k`` vectors with the smallest ids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_assign"]


def _vec_literal(vals: list[float]) -> Column:
    # one expression string per vector (the LSH literal lesson:
    # element-wise F.lit costs a py4j call per element); %.17e keeps
    # the double bit pattern through the SQL parser
    return F.expr("array(" + ",".join("%.17e" % v for v in vals) + ")")


def _sq_dist(v: Column, cv: Column) -> Column:
    return F.aggregate(
        F.zip_with(v, cv, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _best(cents: list[tuple[int, list[float]]]) -> Column:
    """(dist, cid) of the nearest centroid — pure map-side expression
    over literal centroid arrays, ties to the lower cid."""
    return F.array_min(
        F.array(
            *[
                F.struct(
                    _sq_dist(F.col("v"), _vec_literal(cv)).alias("dist"),
                    F.lit(int(cid)).alias("cid"),
                )
                for cid, cv in cents
            ]
        )
    )


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, sq_dist) after ``iterations`` Lloyd rounds.

    ``cluster`` is the seed point's id (stable, engine-independent).
    ``sq_dist`` is the squared Euclidean distance to the final
    centroid of the assigned cluster (raw double — round for
    display).  Empty clusters drop out of later rounds, exactly as
    in the unrolled SQL oracle.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    pts = emb.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    # k bounded rows to the driver — the per-round scalar state of the
    # fixpoint loop, not a data collect (same budget as convergence
    # counts in graph/cc.py)
    cents: list[tuple[int, list[float]]] = [
        (r.id, list(r.v)) for r in pts.orderBy("id").limit(k).collect()
    ]
    if not cents:
        # empty corpus: stable empty schema instead of the analysis
        # error _best([]) would raise on a void array_min
        return pts.select(
            "id",
            F.lit(None).cast("long").alias("cluster"),
            F.lit(None).cast("double").alias("sq_dist"),
        )

    for _ in range(iterations):
        if not cents:
            break
        assigned = pts.select(
            "id", "v", _best(cents)["cid"].alias("cluster")
        )
        means = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(38,18)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("mean")
            )
        )
        new_cents = (
            means.groupBy(F.col("cluster").alias("cid"))
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mean"))),
                    lambda s: s["mean"],
                ).alias("cv")
            )
            .collect()
        )
        cents = sorted((r.cid, list(r.cv)) for r in new_cents)
    best = _best(cents)
    return pts.select(
        "id",
        best["cid"].alias("cluster"),
        best["dist"].alias("sq_dist"),
    )
