"""The learned coarse quantizer in its intended regime (verdict r10
#3): the fixture embeddings are isotropic (nothing to learn), so the
honest recall record couldn't show training winning.  On a clustered
mixture-of-Gaussians corpus (operators/embedgen.py — deterministic,
generated cluster-side) the trained spherical-k-means cells must beat
the stride-landmark baseline at equal cell count, at BOTH corpus
sizes, for the exact-IVF index, the IVFPQ index, and the full
production chain (IVFPQ shortlist + exact rerank); exact-IVF recall
must be monotone in nprobe.  Everything is a pure function of the
seed, so these are exact reproducible comparisons, not statistics.

Measured record (dim=24, 10 clusters, sigma=0.2, 16 cells, PQ m=6
k=64, nprobe=2): n=1280 → IVF@1 0.835 trained vs 0.571 stride, IVFPQ
0.435 vs 0.376, chain 0.847 vs 0.676; n=3200 → IVF@1 0.800 vs 0.653,
IVFPQ 0.336 vs 0.308, chain 0.724 vs 0.641 (SURVEY §6.6).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from connected_component_spark.operators.clustering import kmeans_centroids
from connected_component_spark.operators.embedgen import (
    gaussian_mixture_embeddings,
    mixture_centers,
)
from connected_component_spark.operators.quantize import (
    ivfpq_topk,
    pq_codebooks,
)
from connected_component_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    rerank_exact,
)

_DIM, _CLUSTERS, _SIGMA, _SEED, _CELLS = 24, 10, 0.2, 7, 16


def _recall(df, truth) -> float:
    got: dict = {}
    for r in df.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    k = len(next(iter(truth.values())))
    return sum(len(got.get(q, set()) & t) for q, t in truth.items()) / (
        len(truth) * k
    )


def _setup(spark, n):
    corpus = (
        gaussian_mixture_embeddings(
            spark, n, dim=_DIM, n_clusters=_CLUSTERS, sigma=_SIGMA, seed=_SEED
        )
        .select("vec_id", "embedding")
        .localCheckpoint(eager=True)
    )
    stride = n // _CELLS
    # out-of-codebook query batch (the serving path): never a stride
    # landmark, so neither index gets the query∈codebook artifact
    q = corpus.where(
        (F.col("vec_id") % 37 == 5) & (F.col("vec_id") % stride != 0)
    )
    truth: dict = {}
    for r in cosine_topk(q, corpus, k=5).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    # equal cell count, same starting points: trained = the stride
    # landmarks refined by spherical Lloyd rounds, so the comparison
    # isolates TRAINING, not cell budget
    cents = kmeans_centroids(
        corpus,
        k=_CELLS,
        iterations=2,
        seeds=corpus.where(F.col("vec_id") % stride == 0),
        normalize=True,
    )
    trained = spark.createDataFrame(
        [(int(c), [float(x) for x in v]) for c, v in cents],
        "vec_id long, embedding array<double>",
    )
    return corpus, stride, q, truth, trained


def test_mixture_generator_is_deterministic_and_clustered(spark):
    df = gaussian_mixture_embeddings(
        spark, 300, dim=16, n_clusters=5, sigma=0.1, seed=3
    )
    again = gaussian_mixture_embeddings(
        spark, 300, dim=16, n_clusters=5, sigma=0.1, seed=3
    )
    a = sorted(map(tuple, df.select("vec_id", F.col("embedding")[0]).collect()))
    b = sorted(
        map(tuple, again.select("vec_id", F.col("embedding")[0]).collect())
    )
    assert a == b
    # centers are unit vectors; within-cluster cosine far above
    # across-cluster (the structure the coarse quantizer learns)
    cs = mixture_centers(5, 16, seed=3)
    for c in cs:
        assert abs(sum(x * x for x in c) - 1.0) < 1e-12
    from connected_component_spark.functions.vectors import cosine

    x, y = df.alias("x"), df.alias("y")
    stats = {
        r.same: r.mc
        for r in x.join(y, F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            (F.col("x.cluster") == F.col("y.cluster")).alias("same"),
            cosine(F.col("x.embedding"), F.col("y.embedding")).alias("cos"),
        )
        .groupBy("same")
        .agg(F.avg("cos").alias("mc"))
        .collect()
    }
    assert stats[True] > 0.8 and abs(stats[False]) < 0.2
    with pytest.raises(ValueError, match="n_clusters"):
        mixture_centers(0, 16)
    with pytest.raises(ValueError, match="sigma"):
        gaussian_mixture_embeddings(spark, 10, sigma=-1.0)


@pytest.mark.parametrize("n", [1280, 3200])
def test_trained_cells_beat_stride_on_clustered_corpus(spark, n):
    """The claim IVF training exists for, pinned where it applies:
    with cluster structure and an equal cell budget, trained cells
    beat stride landmarks for exact-IVF (every nprobe), for IVFPQ,
    and for the production IVFPQ+rerank chain — and exact-IVF recall
    is monotone in nprobe for both quantizers (candidate sets grow
    by superset, scoring is exact)."""
    corpus, stride, q, truth, trained = _setup(spark, n)

    r_tr, r_st = {}, {}
    for p in (1, 2, 4):
        r_tr[p] = _recall(
            ivf_topk(q, corpus, k=5, centroids=trained, nprobe=p), truth
        )
        r_st[p] = _recall(
            ivf_topk(q, corpus, k=5, centroid_stride=stride, nprobe=p), truth
        )
    # trained wins at every probe width — by a wide margin at nprobe=1
    # (the latency-critical configuration)
    assert r_tr[1] >= r_st[1] + 0.10
    for p in (2, 4):
        assert r_tr[p] >= r_st[p]
    # nprobe monotonicity for both quantizers
    assert r_tr[1] <= r_tr[2] <= r_tr[4]
    assert r_st[1] <= r_st[2] <= r_st[4]
    # the trained index at nprobe=2 is near-exact on clustered data
    assert r_tr[2] >= 0.95

    books = pq_codebooks(corpus, dim=_DIM, m=6, k=64, iterations=1)
    pq_tr = ivfpq_topk(q, corpus, books, k=5, centroids=trained, nprobe=2)
    pq_st = ivfpq_topk(q, corpus, books, k=5, centroid_stride=stride, nprobe=2)
    assert _recall(pq_tr, truth) >= _recall(pq_st, truth)

    # production chain: widened IVFPQ shortlist + exact-cosine rerank
    chain_tr = rerank_exact(
        ivfpq_topk(q, corpus, books, k=25, centroids=trained, nprobe=2)
        .select("query_id", "neighbor_id"),
        corpus,
        k=5,
    )
    chain_st = rerank_exact(
        ivfpq_topk(q, corpus, books, k=25, centroid_stride=stride, nprobe=2)
        .select("query_id", "neighbor_id"),
        corpus,
        k=5,
    )
    assert _recall(chain_tr, truth) >= _recall(chain_st, truth) + 0.05


def test_precomputed_storage_and_codes_are_result_identical(spark):
    """r15 shared-subtree params: handing ivf_topk / pq_topk /
    ivfpq_topk their precomputed ``storage`` / ``codes`` frames (the
    exact expressions the operators would build themselves, as
    ann_recall_report does behind lazy localCheckpoints) must be a
    PHYSICAL-only change — row-identical output on every operator."""
    from connected_component_spark.operators.quantize import (
        pq_encode,
        pq_topk,
    )
    from connected_component_spark.operators.similarity import (
        ivf_cell_assignments,
    )

    corpus, stride, q, _truth, _trained = _setup(spark, 400)
    strided = corpus.where(F.col("vec_id") % stride == 0)
    storage = ivf_cell_assignments(corpus, strided).localCheckpoint(
        eager=False
    )
    books = pq_codebooks(corpus, dim=_DIM, m=6, k=64, iterations=1)
    codes = pq_encode(corpus, books).localCheckpoint(eager=False)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    assert rows(
        ivf_topk(q, corpus, k=5, centroids=strided, storage=storage)
    ) == rows(ivf_topk(q, corpus, k=5, centroid_stride=stride))
    assert rows(pq_topk(q, corpus, books, k=5, codes=codes)) == rows(
        pq_topk(q, corpus, books, k=5)
    )
    assert rows(
        ivfpq_topk(
            q,
            corpus,
            books,
            k=5,
            centroids=strided,
            nprobe=1,
            storage=storage,
            codes=codes,
        )
    ) == rows(
        ivfpq_topk(q, corpus, books, k=5, centroid_stride=stride, nprobe=1)
    )
