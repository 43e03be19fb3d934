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

__all__ = ["kmeans_assign", "kmeans_centroids"]


def _best(cents: list[tuple[int, list[float]]], vec: str = "v") -> Column:
    """(dist, cid) of the nearest centroid — pure map-side expression
    over literal centroid arrays, ties to the lower cid.  ``vec``
    names the array<double> column scored against the codebook
    (default ``v``; PQ scores one subvector column per subspace).

    Built as ONE SQL text string (one JVM parse instead of thousands
    of py4j Column calls; %.17e literals round-trip the double bit
    patterns), and — the part that matters at large k — shaped so the
    GENERATED CODE size is independent of k: the codebook enters the
    plan as one nested array<array<double>> LITERAL looped by a
    single higher-order ``transform``, instead of k unrolled
    per-centroid expressions whose codegen/janino cost grows with the
    codebook (an unrolled k=200 argmin costs seconds to compile per
    plan; data-as-literal compiles once at any k).  Arithmetic per
    centroid is the identical zip_with/fold, so assignments are
    bit-identical to the unrolled form and the unchanged oracle.
    """
    cvs = ",".join(
        "array(" + ",".join("%.17e" % x for x in cv) + ")" for _, cv in cents
    )
    cids = ",".join(f"{int(cid)}L" for cid, _ in cents)
    return F.expr(
        f"array_min(transform(array({cvs}), (cv, i) -> "
        f"named_struct('dist', aggregate(zip_with({vec}, cv, "
        "(a, b) -> (a - b) * (a - b)), cast(0.0 as double), "
        "(acc, x) -> acc + x), "
        f"'cid', element_at(array({cids}), i + 1))))"
    )


def _normalized(vals: list[float]) -> list[float]:
    """Unit-normalize with a left-fold sum of squares — the exact
    float-op order of ``sqrt(list_sum(list_transform(cv, y->y*y)))``
    in the DuckDB oracle chain, so normalized centroid components are
    bit-identical across engines.  ``math.sqrt`` specifically:
    IEEE-754 sqrt is correctly rounded in every engine, while
    ``s ** 0.5`` goes through libm pow and differs in the last ulp
    for ~1 in 1000 inputs — enough to flip an argmin/rounding
    boundary once per a few hundred centroid builds."""
    import math

    s = 0.0
    for y in vals:
        s += y * y
    n = math.sqrt(s)
    if n == 0.0:
        return vals
    return [y / n for y in vals]


def _lloyd_centroids(
    pts: DataFrame,
    k: int,
    iterations: int,
    seeds: DataFrame | None = None,
    normalize: bool = False,
) -> list[tuple[int, list[float]]]:
    """Run ``iterations`` Lloyd rounds over ``pts (id, v)``; returns
    the final ``(cid, centroid_vector)`` list (cid = seed point id).

    ``seeds`` overrides the default k-smallest-id seeding with an
    explicit ``(id, v)`` seed set.  ``normalize=True`` unit-normalizes
    every centroid after each mean update (spherical k-means): over a
    unit-norm corpus the Euclidean argmin to unit centroids IS the
    cosine argmax, so the trained cells follow direction, the metric
    cosine retrieval actually uses.

    k bounded rows to the driver per round — the per-round scalar
    state of the fixpoint loop, not a data collect (same budget as
    convergence counts in graph/cc.py).
    """
    from connected_component_spark.plans.tuning import shrunk_shuffle

    seed_src = pts if seeds is None else seeds
    cents: list[tuple[int, list[float]]] = [
        (r.id, list(r.v)) for r in seed_src.orderBy("id").limit(k).collect()
    ]
    if normalize:
        cents = [(cid, _normalized(cv)) for cid, cv in cents]
    # the per-round update aggregate has k·dim groups — right-size the
    # exchange to that, not the session width (shrink-only; at cluster
    # scale the session width wins and the shrink never triggers)
    n_groups = (len(cents) or 1) * (len(cents[0][1]) if cents else 1)
    with shrunk_shuffle(pts.sparkSession, n_groups):
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
            if normalize:
                cents = [(cid, _normalized(cv)) for cid, cv in cents]
    return cents


def kmeans_centroids(
    emb: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seeds: DataFrame | None = None,
    normalize: bool = False,
) -> list[tuple[int, list[float]]]:
    """Final Lloyd centroids as ``[(cid, vector), ...]`` — the learned
    coarse-quantizer codebook (e.g. for IVF cell partitioning,
    operators/similarity.py:ivf_topk).  Deterministic and
    engine-reproducible: same seeding/update rules as
    :func:`kmeans_assign`, so the unrolled SQL oracle chain produces
    bit-identical centroid vectors.  ``seeds``/``normalize``: see
    :func:`_lloyd_centroids` (spherical variant for cosine
    retrieval)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    pts = emb.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    seed_pts = (
        None
        if seeds is None
        else seeds.select(
            F.col(id_col).alias("id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        )
    )
    return _lloyd_centroids(pts, k, iterations, seeds=seed_pts, normalize=normalize)


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
    cents = _lloyd_centroids(pts, k, iterations)
    if not cents:
        # empty corpus: stable empty schema instead of the analysis
        # error _best([]) would raise on a void array_min
        return pts.select(
            "id",
            F.lit(None).cast("long").alias("cluster"),
            F.lit(None).cast("double").alias("sq_dist"),
        )
    best = _best(cents)
    return pts.select(
        "id",
        best["cid"].alias("cluster"),
        best["dist"].alias("sq_dist"),
    )
