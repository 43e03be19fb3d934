"""Distributed Lloyd k-means over an embedding column — the semantic
clustering backbone (SemDeDup-style pipelines group a corpus by
embedding cluster before near-dup pruning).

Scale shape: centroids are k rows broadcast to every executor, so an
assignment pass is map-side O(n·k) with NO shuffle of the corpus;
the update pass is one hash aggregate on (cluster, dim) — (k·dim)
groups — followed by a k-row regroup.  That is the textbook
distributed Lloyd iteration: per round, one corpus scan + one tiny
shuffle, independent of how many executors hold the data.

Cross-engine determinism (the whole point of making this an
oracle-checked operator, not a fit-and-hope one):

* vectors are cast to double up front; squared-distance is a
  left-fold in element order (functions/vectors.py:dot discipline),
  bit-identical to DuckDB's ``list_sum(list_transform(...))``;
* argmin ties break on centroid id via a (dist, cid) struct min;
* centroid means go through DECIMAL(38,18) sums (associative,
  order-free) divided by the member count — the parity rule of
  queries/parity.py:dsum / graph/pagerank.py;
* initial centroids are the ``k`` vectors with the smallest ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_assign"]


def _sq_dist(v, cv):
    return F.aggregate(
        F.zip_with(v, cv, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
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
    centroids = (
        pts.orderBy("id")
        .limit(k)
        .select(F.col("id").alias("cid"), F.col("v").alias("cv"))
    )

    def assign(cents: DataFrame) -> DataFrame:
        scored = pts.crossJoin(F.broadcast(cents)).select(
            "id",
            "v",
            F.struct(
                _sq_dist(F.col("v"), F.col("cv")).alias("dist"),
                F.col("cid").alias("cid"),
            ).alias("_sc"),
        )
        best = scored.groupBy("id", "v").agg(F.min("_sc").alias("_best"))
        return best.select(
            "id",
            "v",
            F.col("_best.cid").alias("cluster"),
            F.col("_best.dist").alias("sq_dist"),
        )

    for _ in range(iterations):
        assigned = assign(centroids)
        by_dim = assigned.select(
            "cluster", F.posexplode("v").alias("pos", "val")
        )
        means = (
            by_dim.groupBy("cluster", "pos")
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(38,18)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("mean")
            )
        )
        centroids = (
            means.groupBy(F.col("cluster").alias("cid"))
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mean"))),
                    lambda s: s["mean"],
                ).alias("cv")
            )
        )
        # k rows: materialize so each round's lineage stays flat
        centroids = centroids.localCheckpoint(eager=True)
    return assign(centroids).select("id", "cluster", "sq_dist")
