"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the scale path is a
random-hyperplane-LSH bucketed variant that turns the O(n·m) cross
join into a bucket-key equi-join (AQE-skew-handled).  All vector
math is Catalyst higher-order functions (functions/vectors.py) —
JVM-side, no Python in the hot path.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from connected_component_spark.queries.parity import roundd
from connected_component_spark.functions.vectors import as_double, cosine, dot, l2_norm
from connected_component_spark.graph.cc import components_with_isolates

__all__ = [
    "auto_planes",
    "cosine_topk",
    "cosine_radius_search",
    "block_cosine_topk",
    "cosine_threshold_pairs",
    "lsh_threshold_pairs",
    "embedding_dedup_clusters",
    "semantic_dedup",
    "lsh_bucketed_topk",
    "ivf_cell_assignments",
    "ivf_topk",
    "rerank_exact",
    "knn_edges",
    "similarity_clusters",
]


def _normed(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return emb.select(F.col(id_col), as_double(vec_col).alias(vec_col))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k: (query_id, neighbor_id, cos).

    Cross join queries × corpus; the similarity is rounded *before*
    ranking so rank order is reproducible across engines, with
    neighbor id as the deterministic tie-break.  Self-matches are
    excluded.  The scale contract is that ``queries`` is a *bounded
    batch* (a serving/rerank request set, not the corpus): the query
    side is broadcast explicitly, so the corpus is never shuffled and
    total work is O(|q|·m) — linear in corpus size.  For corpus ×
    corpus workloads use :func:`lsh_bucketed_topk` /
    :func:`knn_edges` instead.
    """
    # norms are precomputed per vector (O(n)) instead of per pair
    # (O(n·m)); dot/(qn*cn) is the same expression tree as the inline
    # cosine, so results stay bit-identical with the oracle
    q = _normed(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(F.col(vec_col)).alias("qn"),
    )
    c = _normed(corpus, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        l2_norm(F.col(vec_col)).alias("cn"),
    )
    scored = (
        F.broadcast(q).crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            roundd(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
                round_to,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rank").cast("long").alias("rank"))
    )


def cosine_radius_search(
    queries: DataFrame,
    corpus: DataFrame,
    radius: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact cosine radius search: every (query_id, neighbor_id, cos)
    with rounded cos ≥ ``radius`` — the fixed-threshold sibling of
    :func:`cosine_topk` (retrieval "give me everything at least this
    similar", no ranking).  Same scale contract: ``queries`` is a
    bounded batch, broadcast against a corpus that is only scanned —
    O(|q|·m) work, linear in corpus size, no corpus shuffle."""
    q = _normed(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(F.col(vec_col)).alias("qn"),
    )
    c = _normed(corpus, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        l2_norm(F.col(vec_col)).alias("cn"),
    )
    return (
        F.broadcast(q).crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            roundd(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
                round_to,
            ).alias("cos"),
        )
        .where(F.col("cos") >= F.lit(radius))
    )


#: dimensions covered by the precomputed sign table; vectors longer
#: than this fall back to computing signs inside the expression
_SIGN_DIM = 512

#: auto_planes defaults — shared verbatim by the DuckDB oracle twins
#: (queries/llmops.py), which gate plane p on the SQL predicate
#: ``count(*) > AUTO_TARGET_BUCKET_ROWS * 2^p`` so both engines derive
#: the identical plane count from the same corpus cardinality.
AUTO_PLANES_FLOOR = 4
AUTO_PLANES_CAP = 16
AUTO_TARGET_BUCKET_ROWS = 128


def auto_planes(
    n_rows: int,
    target_bucket_rows: int = AUTO_TARGET_BUCKET_ROWS,
    floor: int = AUTO_PLANES_FLOOR,
    cap: int = AUTO_PLANES_CAP,
) -> int:
    """Size the hyperplane count to the corpus so expected bucket
    occupancy stays ~``target_bucket_rows`` as the corpus grows.

    A fixed plane count is the one quadratic hazard of bucketed LSH:
    bucket occupancy is O(n / 2^planes), so the within-bucket join is
    O(n² / 2^planes) — fine at one scale, a scale-killer at 100×.
    Growing ``planes`` with ⌈log2(n / target)⌉ keeps per-bucket work
    constant; the reference's own skew warnings
    (ConnectedComponent.scala:62-63,135-136) are the same concern for
    its shuffle partitioning.

    Exact-integer contract (the oracle depends on it): plane p ≥ floor
    is active iff ``n_rows > target_bucket_rows * 2**p`` — no float
    log2, so an engine evaluating that predicate in SQL agrees with
    this loop bit-for-bit at every boundary.  ``cap`` bounds plan size
    (2^cap buckets is plenty before re-sharding strategy changes).
    """
    planes = floor
    while planes < cap and n_rows > target_bucket_rows * (2 ** planes):
        planes += 1
    return planes


def _resolve_planes(
    planes: int | None, corpus: DataFrame, corpus_count: int | None
) -> int:
    """planes=None → derive from the corpus cardinality (one cheap
    column-pruned count unless the caller supplies ``corpus_count``,
    e.g. from a parquet footer).

    Laziness contract (documented on every caller): when BOTH
    ``planes`` and ``corpus_count`` are None, the count runs EAGERLY
    at DataFrame-construction time, and the derived plane count is
    frozen then — if the corpus DataFrame is later recomputed with
    more rows, buckets keep the old sizing.  Library callers that
    need full laziness pass an explicit ``planes`` (or a known
    ``corpus_count``)."""
    if planes is not None:
        return planes
    n = corpus_count if corpus_count is not None else corpus.count()
    return auto_planes(n)


@lru_cache(maxsize=None)
def _plane_signs(seed: int, dim: int = _SIGN_DIM) -> tuple[float, ...]:
    """±1 hyperplane components for one plane, precomputed at
    plan-build time from the same portable md5 family the engines
    evaluate at run time (functions/hashing.py:hash64):
    ``sign(i) = +1 iff hash64(f"{seed}\\x1f{i}") is odd``.

    The hash is data-independent — it depends only on (seed, dim
    index) — so folding it to literals changes the physical plan (no
    per-row/per-element md5) but not a single bucket value; DuckDB
    oracles keep evaluating the md5 form and agree bit-for-bit.
    """
    signs = []
    for i in range(dim):
        h = int(hashlib.md5(f"{seed}\x1f{i}".encode()).hexdigest()[:15], 16)
        signs.append(1.0 if h & 1 else -1.0)
    return tuple(signs)


@lru_cache(maxsize=None)
def _plane_signs_sql(seed: int, dim: int = _SIGN_DIM) -> str:
    """SQL text for one plane's sign array.  A single ``F.expr`` over
    this string creates the whole array Literal in one JVM round trip;
    ``F.lit(list)`` expands to one py4j ``lit`` call per element —
    ~0.6 s of driver time per 512-wide literal, ×16 literals per
    4-table query plan before this was folded to text."""
    return (
        "array(" + ",".join(f"{s:.1f}D" for s in _plane_signs(seed, dim)) + ")"
    )


def _hyperplane_bucket(
    vec_col, planes: int, seed_base: int = 7, dim: int | None = None
):
    """Sign-of-projection LSH: bucket id from ``planes`` pseudo-random
    hyperplanes.  The hyperplane components are derived per dimension
    from the portable hash family, so bucketing is deterministic and
    engine-independent (no stored model).

    Components are baked into the plan as literal arrays (they depend
    only on the seed, not the data) covering dims ≤ ``dim``
    (default ``_SIGN_DIM``); wider vectors fail loudly at run time
    (``raise_error``) instead of silently hashing into a wrong
    bucket.  Signs are derived per dimension, so any ``dim`` wide
    enough for the data yields identical buckets — callers that know
    their embedding width should pass it: a 64-wide literal parses,
    codegens, and evaluates ~3x faster per plan than the 512-wide
    default (measured ~2 s plan + 0.5 s exec per bucket build).
    """
    width = _SIGN_DIM if dim is None else dim

    def proj_bit(p: int):
        signs = F.expr(_plane_signs_sql(seed_base + p, width))
        terms = F.aggregate(
            F.zip_with(
                vec_col,
                F.slice(signs, 1, F.size(vec_col)),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        guarded = F.when(F.size(vec_col) <= width, terms).otherwise(
            F.raise_error(
                F.lit(
                    f"hyperplane LSH sign table covers dim <= {width}; "
                    "pass a wider dim= for wider embeddings"
                )
            )
        )
        return F.when(guarded > 0, F.lit(2 ** p)).otherwise(F.lit(0))

    bucket = None
    for p in range(planes):
        bucket = proj_bit(p) if bucket is None else bucket + proj_bit(p)
    return bucket.cast("long")


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    planes: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    corpus_count: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k: candidates restricted to the same
    random-hyperplane bucket, then exact cosine + window top-k.
    Recall < 1.0 by construction; the scale win is replacing the
    cross join with an equi-join on the bucket key.

    ``planes=None`` (default) sizes the bucket count to the corpus via
    :func:`auto_planes`, so expected bucket occupancy — and with it
    the within-bucket join cost — stays constant as the corpus grows
    instead of degrading O(n²/2^planes) at a fixed plane count.
    NOTE: with ``planes=None`` and no ``corpus_count``, the corpus is
    counted EAGERLY at construction time and the plane count frozen
    (see :func:`_resolve_planes`); pass ``planes`` explicitly for a
    fully lazy plan."""
    planes = _resolve_planes(planes, corpus, corpus_count)
    q = _normed(queries, id_col, vec_col)
    c = _normed(corpus, id_col, vec_col)
    qb = q.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(F.col(vec_col)).alias("qn"),
        _hyperplane_bucket(F.col(vec_col), planes, dim=dim).alias("bucket"),
    )
    cb = c.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        l2_norm(F.col(vec_col)).alias("cn"),
        _hyperplane_bucket(F.col(vec_col), planes, dim=dim).alias("bucket"),
    )
    scored = (
        qb.join(cb, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            roundd(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rank").cast("long").alias("rank"))
    )


def block_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_blocks: int = 8,
    corpus_blocks: int = 16,
    round_to: int = 6,
) -> DataFrame:
    """Exact cosine top-k via blocked matrix multiplication.

    Same result contract as :func:`cosine_topk`, different physical
    strategy: vectors are grouped into hash blocks; block pairs cross
    join (``query_blocks × corpus_blocks`` rows instead of n·m) and a
    vectorized Arrow/numpy ``mapInPandas`` computes the block GEMM +
    per-block top-k; a final window merges block partials.  This is
    the 100 TB shape — per-task memory is bounded by block size, the
    shuffle moves only ``q·blocks·k`` partials, and the GEMM runs at
    BLAS speed instead of per-pair array folds.  Block counts are
    knobs: size them so a block is a few thousand vectors.
    """
    import numpy as np
    import pandas as pd

    q = queries.select(F.col(id_col).alias("qid"), as_double(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("cid"), as_double(vec_col).alias("cv"))
    qb = (
        q.withColumn("qblk", F.pmod(F.xxhash64("qid"), F.lit(query_blocks)))
        .groupBy("qblk")
        .agg(F.collect_list(F.struct("qid", "qv")).alias("qitems"))
    )
    cb = (
        c.withColumn("cblk", F.pmod(F.xxhash64("cid"), F.lit(corpus_blocks)))
        .groupBy("cblk")
        .agg(F.collect_list(F.struct("cid", "cv")).alias("citems"))
    )
    pairs = qb.crossJoin(cb)

    topk = k

    def gemm(batches):
        for pdf in batches:
            out_q, out_c, out_s = [], [], []
            for qitems, citems in zip(pdf["qitems"], pdf["citems"]):
                qids = np.fromiter((x["qid"] for x in qitems), dtype=np.int64)
                cids = np.fromiter((x["cid"] for x in citems), dtype=np.int64)
                qm = np.array([x["qv"] for x in qitems], dtype=np.float64)
                cm = np.array([x["cv"] for x in citems], dtype=np.float64)
                qn = np.sqrt((qm * qm).sum(axis=1))
                cn = np.sqrt((cm * cm).sum(axis=1))
                cos = (qm @ cm.T) / np.outer(qn, cn)
                # self-matches dropped globally by the caller filter.
                # Tie safety: the block partial must not drop any
                # candidate that could still win under the global
                # (rounded cos desc, id asc) order.  Two raw values
                # rounding to the same 6-dec cos differ by < 1e-6, so
                # keeping everything within 1e-6 of the (k+1)-th
                # largest raw value preserves every potential tie at
                # the cut (incl. duplicate vectors split across
                # blocks) for the global window to resolve.
                take = min(topk + 1, cos.shape[1])
                kth = -np.partition(-cos, take - 1, axis=1)[:, take - 1]
                ii, jj = np.nonzero(cos >= kth[:, None] - 1e-6)
                out_q.append(qids[ii])
                out_c.append(cids[jj])
                out_s.append(cos[ii, jj])
            if out_q:
                yield pd.DataFrame(
                    {
                        "qid": np.concatenate(out_q),
                        "cid": np.concatenate(out_c),
                        "cos_raw": np.concatenate(out_s),
                    }
                )
            else:
                yield pd.DataFrame(
                    {
                        "qid": pd.Series(dtype="int64"),
                        "cid": pd.Series(dtype="int64"),
                        "cos_raw": pd.Series(dtype="float64"),
                    }
                )

    partials = pairs.mapInPandas(gemm, schema="qid long, cid long, cos_raw double")
    scored = (
        partials.where(F.col("qid") != F.col("cid"))
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("neighbor_id"),
            roundd(F.col("cos_raw"), round_to).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cos", F.col("rank").cast("long").alias("rank")
        )
    )


def cosine_threshold_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    blocks: int = 8,
) -> DataFrame:
    """All (a, b) pairs with cosine ≥ threshold, a < b — the edge set
    of an embedding near-dup graph.

    Physical strategy: blocked GEMM over hash blocks of vectors
    (``blocks·(blocks+1)/2`` block pairs instead of an n² row cross
    join); each block pair is one numpy float64 matmul, the loose
    numpy pre-filter keeps only near-threshold pairs, and the exact
    rounded threshold test runs in Catalyst so the result is
    engine-reproducible.  The shuffle carries only surviving pairs.
    At 100 TB, LSH bucketing replaces the all-block-pairs cross
    (same verify tail).
    """
    import numpy as np
    import pandas as pd

    v = emb.select(F.col(id_col).alias("vid"), as_double(vec_col).alias("vv"))
    blocked = (
        v.withColumn("blk", F.pmod(F.xxhash64("vid"), F.lit(blocks)))
        .groupBy("blk")
        .agg(F.collect_list(F.struct("vid", "vv")).alias("items"))
    )
    pairs = (
        blocked.alias("l")
        .crossJoin(blocked.alias("r"))
        .where(F.col("l.blk") <= F.col("r.blk"))
        .select(
            (F.col("l.blk") == F.col("r.blk")).alias("same_blk"),
            F.col("l.items").alias("litems"),
            F.col("r.items").alias("ritems"),
        )
    )
    tau = threshold - 1e-6

    def gemm(batches):
        for pdf in batches:
            out_a, out_b, out_c = [], [], []
            for same_blk, litems, ritems in zip(
                pdf["same_blk"], pdf["litems"], pdf["ritems"]
            ):
                la = np.fromiter((x["vid"] for x in litems), dtype=np.int64)
                ra = np.fromiter((x["vid"] for x in ritems), dtype=np.int64)
                X = np.array([x["vv"] for x in litems], dtype=np.float64)
                Y = np.array([x["vv"] for x in ritems], dtype=np.float64)
                xn = np.sqrt((X * X).sum(axis=1))
                yn = np.sqrt((Y * Y).sum(axis=1))
                cos = (X @ Y.T) / np.outer(xn, yn)
                if same_blk:
                    keep = (cos >= tau) & (la[:, None] < ra[None, :])
                else:
                    keep = cos >= tau
                ii, jj = np.nonzero(keep)
                aa, bb = la[ii], ra[jj]
                out_a.extend(np.minimum(aa, bb))
                out_b.extend(np.maximum(aa, bb))
                out_c.extend(cos[ii, jj])
            yield pd.DataFrame(
                {
                    "a": pd.Series(out_a, dtype="int64"),
                    "b": pd.Series(out_b, dtype="int64"),
                    "cos_raw": pd.Series(out_c, dtype="float64"),
                }
            )

    raw = pairs.mapInPandas(gemm, schema="a long, b long, cos_raw double")
    return (
        raw.select("a", "b", roundd(F.col("cos_raw"), round_to).alias("cos"))
        .where(F.col("cos") >= F.lit(threshold))
    )


def lsh_threshold_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    planes: int | None = None,
    tables: int = 4,
    seed_stride: int = 100,
    dim: int | None = None,
    corpus_count: int | None = None,
) -> DataFrame:
    """Cosine-threshold pairs with LSH-pruned candidate generation —
    the 100 TB shape for near-dup edge building.

    Same output contract as :func:`cosine_threshold_pairs` restricted
    to LSH-recalled candidates: (a, b, cos) with a < b and rounded
    cos ≥ threshold.  Candidates come from ``tables`` independent
    random-hyperplane tables (a pair is a candidate when it collides
    in *any* table); each table is a bucket-key equi-join, so the
    physical plan is ``tables`` shuffled equi-joins over ~n·E[bucket]
    rows instead of any all-pairs product — the same
    candidates→exact-verify architecture as the minhash pipeline
    (operators/dedup.py), with the rounded Catalyst cosine as the
    verify step so results stay engine-reproducible.  Recall is the
    standard OR-of-AND LSH curve: raise ``tables`` (or lower
    ``planes``) for more recall, both without changing the plan
    shape.  Buckets are derived from the portable hash family — no
    stored model, deterministic across engines.  ``planes=None``
    sizes buckets to the corpus via :func:`auto_planes`; with no
    ``corpus_count`` that count runs EAGERLY at construction time and
    the plane count is frozen (see :func:`_resolve_planes`).
    """
    planes = _resolve_planes(planes, emb, corpus_count)
    v = _normed(emb, id_col, vec_col).select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vv"),
        l2_norm(F.col(vec_col)).alias("vn"),
    )
    # one scan computes every table's bucket; candidates are id pairs
    # only (vectors re-join for the verify), so the bucket join never
    # carries vector payloads
    buckets = v.select(
        "vid",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tab"),
                        _hyperplane_bucket(
                            F.col("vv"),
                            planes,
                            seed_base=7 + seed_stride * t,
                            dim=dim,
                        ).alias("bucket"),
                    )
                    for t in range(tables)
                ]
            )
        ).alias("tb"),
    ).select("vid", F.col("tb.tab").alias("tab"), F.col("tb.bucket").alias("bucket"))
    l, r = buckets.alias("l"), buckets.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.tab") == F.col("r.tab"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.vid") < F.col("r.vid")),
        )
        .select(F.col("l.vid").alias("a"), F.col("r.vid").alias("b"))
        .distinct()
    )
    va = v.select(F.col("vid").alias("a"), F.col("vv").alias("av"), F.col("vn").alias("an"))
    vb = v.select(F.col("vid").alias("b"), F.col("vv").alias("bv"), F.col("vn").alias("bn"))
    return (
        cand.join(va, "a")
        .join(vb, "b")
        .select(
            "a",
            "b",
            roundd(
                dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")),
                round_to,
            ).alias("cos"),
        )
        .where(F.col("cos") >= F.lit(threshold))
    )


def embedding_dedup_clusters(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int | None = None,
    tables: int = 4,
    max_iterations: int = 20,
    dim: int | None = None,
    corpus_count: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dedup: LSH-candidate threshold pairs
    become edges; the CC kernel clusters the paired subgraph only;
    isolated vectors are attached as singleton clusters by one anti
    join (graph/cc.py:components_with_isolates).

    The edge set is :func:`lsh_threshold_pairs` — bucketed candidate
    generation, not all-pairs — so the whole pipeline is shuffle-
    bounded equi-joins + the CC kernel at any corpus size.  CC
    transitivity absorbs per-pair LSH recall loss inside dup groups
    (one recalled edge merges the group).  ``planes=None`` with no
    ``corpus_count`` counts the corpus eagerly at construction time
    (see :func:`_resolve_planes`).
    """
    pairs = lsh_threshold_pairs(
        emb,
        threshold,
        id_col,
        vec_col,
        planes=planes,
        tables=tables,
        dim=dim,
        corpus_count=corpus_count,
    )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    return components_with_isolates(
        edges, emb, id_col, max_iterations=max_iterations
    ).select(F.col("node").alias(id_col), F.col("component").alias("cluster"))


def ivf_cell_assignments(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """Assign each vector its ``nprobe`` nearest centroid cells (by
    rounded cosine, centroid id as tie-break): (id, cell, probe_rank)
    with probe_rank 1..nprobe.

    The coarse-quantizer step of an IVF index; ``nprobe=1`` is the
    storage assignment (each vector lives in exactly one cell),
    ``nprobe>1`` is the query-side recall knob — probing neighboring
    cells widens the candidate set without changing the plan shape.
    Centroids here are a deterministic subset of the corpus rather
    than k-means output — the partition/probe plumbing is identical
    and the assignment stays engine-reproducible for the oracle
    contract.
    """
    v = _normed(emb, id_col, vec_col).select(
        F.col(id_col),
        F.col(vec_col).alias("vv"),
        l2_norm(F.col(vec_col)).alias("vn"),
    )
    c = _normed(centroids, id_col, vec_col).select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cv"),
        l2_norm(F.col(vec_col)).alias("cn"),
    )
    scored = v.crossJoin(F.broadcast(c)).select(
        id_col,
        "cid",
        roundd(
            dot(F.col("vv"), F.col("cv")) / (F.col("vn") * F.col("cn")), 6
        ).alias("cs"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("cs").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= nprobe)
        .select(
            id_col,
            F.col("cid").alias("cell"),
            F.col("rn").cast("long").alias("probe_rank"),
        )
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    centroid_stride: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
    centroids: DataFrame | None = None,
    storage: DataFrame | None = None,
) -> DataFrame:
    """Approximate cosine top-k via IVF partitioning: corpus vectors
    live in their nearest centroid cell; each query probes its
    ``nprobe`` nearest cells and ranks the candidates by exact cosine.

    Scale shape: the coarse assignment is a broadcast cross join
    against ~√n centroids (not n²); the probe is an equi-join on the
    cell key whose left side carries ``nprobe`` rows per query.
    Recall < 1 by construction, like any IVF index, and rises with
    ``nprobe`` at the same plan shape — the standard recall/latency
    dial.

    ``centroids`` (a ``(id_col, vec_col)`` DataFrame) overrides the
    default strided corpus subset — pass a LEARNED codebook (e.g.
    operators/clustering.py:kmeans_centroids, the standard IVF
    training step) for cells that follow the data distribution
    instead of id order; recall at equal nprobe improves because
    near-duplicate regions share a cell by construction.

    Query cells are derived by scoring the QUERY vectors against the
    broadcast centroids directly (one bounded-batch
    :func:`ivf_cell_assignments` call on ``queries``), never by
    joining corpus-derived assignments — so out-of-corpus query
    vectors (the serving path: queries usually are NOT index members)
    are scored like any other instead of silently vanishing from the
    result.  For in-corpus queries the assignment expression is
    identical, so results are unchanged.

    **Deterministic-queries precondition** (advice r12): this operator
    is lazy by contract (the plan gate sweeps it unexecuted), so the
    probed-cell semi-join below and the query-side probe join are two
    independent evaluations of the same ``ivf_cell_assignments(
    queries, ...)`` subtree.  ``queries`` must therefore be
    deterministic under re-evaluation (a table read, a deterministic
    projection — every declared caller); a non-deterministic batch
    (e.g. a ``rand()``-sampled one) could prune cells the query join
    later probes and silently drop candidates.  Serving paths that
    hold non-deterministic batches freeze them first — the durable
    index (streaming/annindex.py:topk) collects the probe once, the
    BM25 serve localCheckpoints the raw batch.

    ``storage`` (r15, physical only): a precomputed
    ``ivf_cell_assignments(corpus, centroids, id_col, vec_col, 1)``
    frame.  Callers running SEVERAL IVF legs over the same (corpus,
    centroids) — e.g. a recall report with an IVF and an IVFPQ leg —
    compute the storage assignment once (typically behind a lazy
    ``localCheckpoint``) instead of re-running the corpus × centroids
    cross join + per-vector window per leg.  The caller asserts the
    frame equals that exact expression; results are unchanged by
    construction.
    """
    if centroids is None:
        centroids = corpus.where(F.col(id_col) % centroid_stride == 0)
    # storage assignment: one corpus-x-centroids pass at width 1;
    # probe assignment: an independent bounded-batch pass over the
    # query vectors (O(|q|·k), broadcast centroids — queries need not
    # exist in the corpus)
    if storage is None:
        storage = ivf_cell_assignments(corpus, centroids, id_col, vec_col, 1)
    # probe-pruned serving (r12, the incremental index's serve shape
    # applied to the batch operator): the storage assignment is
    # SEMI-JOINED against the bounded probed-cell set ahead of the
    # candidate join, so unprobed cells' vectors never reach the
    # norm/dot work or the cell-join shuffle.  In-plan (a broadcast
    # semi-join — the probe side is |queries| × nprobe) rather than a
    # collected IN-list: this operator is LAZY by contract (the plan
    # gate sweeps it unexecuted), and the r12 bench measured the
    # collect variant costing ~1-3 s per call on the nprobe-sweeping
    # report queries.  The durable index (streaming/annindex.py) keeps
    # the collect — there the list becomes a PartitionFilter that
    # skips inverted-list DIRECTORIES, which no in-plan join can do.
    # Purely physical either way: a candidate outside the probed cells
    # could never join on the cell key.
    probe = ivf_cell_assignments(
        queries, centroids, id_col, vec_col, max(1, nprobe)
    )
    storage = storage.join(
        F.broadcast(probe.select("cell").distinct()), "cell", "semi"
    )
    q = _normed(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(F.col(vec_col)).alias("qn"),
    ).join(
        probe.select(F.col(id_col).alias("query_id"), "cell"), "query_id"
    )
    # norms are computed ABOVE the cell-pruned join (same order as the
    # incremental index's serve): vectors in unprobed cells are dropped
    # by the join before any per-vector arithmetic
    cand = (
        _normed(corpus, id_col, vec_col)
        .select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        )
        .join(
            storage.select(F.col(id_col).alias("neighbor_id"), "cell"),
            "neighbor_id",
        )
        .select(
            "neighbor_id", "cv", l2_norm(F.col("cv")).alias("cn"), "cell"
        )
    )
    scored = (
        q.join(cand, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            roundd(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cos", F.col("rank").cast("long").alias("rank")
        )
    )


def knn_edges(
    emb: DataFrame,
    k: int = 3,
    min_cosine: float = 0.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    planes: int | None = None,
    dim: int | None = None,
    corpus_count: int | None = None,
) -> DataFrame:
    """k-NN similarity graph edges: top-k neighbors per vector with
    cosine ≥ min_cosine, as (src, dst) pairs.

    ``method='lsh'`` (default, the 100 TB shape) restricts neighbor
    candidates to the vector's random-hyperplane bucket — a bucket-key
    equi-join, no all-pairs product anywhere in the plan.  The graph
    is the standard approximate k-NN graph every large-scale pipeline
    builds; ``planes=None`` sizes buckets to the corpus
    (:func:`auto_planes`) so occupancy stays bounded as n grows —
    note the construction-time eager count when no ``corpus_count``
    is given (:func:`_resolve_planes`).
    ``method='exact'`` keeps the blocked-GEMM exact path for corpora
    small enough to afford corpus × corpus work.
    """
    if method == "lsh":
        top = lsh_bucketed_topk(
            emb,
            emb,
            k=k,
            planes=planes,
            id_col=id_col,
            vec_col=vec_col,
            dim=dim,
            corpus_count=corpus_count,
        )
    elif method == "exact":
        top = block_cosine_topk(emb, emb, k=k, id_col=id_col, vec_col=vec_col)
    else:
        raise ValueError(f"unknown knn_edges method: {method!r}")
    return top.where(F.col("cos") >= F.lit(min_cosine)).select(
        F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
    )


def similarity_clusters(
    emb: DataFrame,
    k: int = 3,
    min_cosine: float = 0.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    planes: int | None = None,
    max_iterations: int = 20,
    dim: int | None = None,
    corpus_count: int | None = None,
) -> DataFrame:
    """Similarity clusters = connected components of the (approximate)
    k-NN graph (CC kernel as clustering backbone).  Every vector
    appears in the output.

    The k-NN edges come from LSH-bucketed candidates by default (see
    :func:`knn_edges`), so no stage of the pipeline does all-pairs
    work; vectors touching no k-NN edge are attached as singletons
    by one anti join (graph/cc.py:components_with_isolates).
    ``planes=None`` with no ``corpus_count`` counts the corpus eagerly
    at construction time (see :func:`_resolve_planes`)."""
    edges = knn_edges(
        emb,
        k,
        min_cosine,
        id_col,
        vec_col,
        method,
        planes,
        dim=dim,
        corpus_count=corpus_count,
    )
    return components_with_isolates(
        edges, emb, id_col, max_iterations=max_iterations
    ).select(F.col("node").alias(id_col), F.col("component").alias("cluster"))


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.4,
    k: int | None = None,
    lloyd_iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iterations: int = 20,
    corpus_count: int | None = None,
    max_cluster_rows: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: k-means groups the
    corpus into semantic clusters, near-duplicate pairs are detected
    ONLY within a cluster (exact rounded cosine >= threshold), CC
    merges them into dup groups, and the minimum id of each group is
    the kept representative.  Output: (id, sem_cluster, dup_group,
    keep) with keep = 1 for the representative.

    This is the architecture of Abbas et al., "SemDeDup" (2023): the
    coarse semantic partition is what makes within-group pairwise
    comparison tractable — the pair join is an equi-join on the
    cluster key.  With k ~ sqrt(n) (the default, derived from the
    corpus count) and roughly balanced clusters, within-cluster pair
    work is ~O(n^1.5); but k-means gives NO balance guarantee — a
    corpus whose semantic mass concentrates in one region can put a
    constant fraction of n into one cluster and degrade that join
    toward O(n^2).  ``max_cluster_rows`` is the valve for that skew
    (the SemDeDup paper's own move — it dedups within bounded chunks
    of each cluster): rows of an oversized cluster are deterministically
    hash-sub-split so EXPECTED join-group size stays at the cap (md5
    spread; a group can exceed it only by hash imbalance), trading
    recall of cross-sub-split pairs (partially absorbed by CC
    transitivity) for per-group work bounded in expectation.  Complementary to
    :func:`embedding_dedup_clusters` (LSH candidate generation over
    the whole corpus): LSH recalls near-dups across cluster
    boundaries, SemDeDup bounds work by semantic locality.

    Deterministic end to end (Lloyd seeding/updates, the rounded
    cosine, and the md5 sub-split are all engine-exact), so the whole
    pipeline is oracle-checkable.
    """
    import math

    from connected_component_spark.operators.clustering import kmeans_assign

    if k is None:
        n = corpus_count if corpus_count is not None else emb.count()
        # floor of IEEE double sqrt, NOT isqrt: the SQL oracle twin
        # derives k as floor(sqrt(count(*))) and double sqrt can
        # round up across perfect-square boundaries for n > 2^52 —
        # both sides must use the identical float op to agree at
        # every n (queries/llmops.py:_IVF_KM_K_SQL)
        k = max(1, int(math.floor(math.sqrt(n))))
    # materialize the (id, cluster) assignment once: it is joined into
    # BOTH sides of the pair self-join and into the final output, and
    # without the checkpoint each occurrence re-evaluates the k-literal
    # argmin expression (and re-plans its large tree) independently
    assign = (
        kmeans_assign(
            emb, k=k, iterations=lloyd_iterations, id_col=id_col, vec_col=vec_col
        )
        .select(F.col("id").alias("vid"), F.col("cluster").alias("sem_cluster"))
        .localCheckpoint(eager=True)
    )
    if max_cluster_rows is not None:
        from connected_component_spark.functions.hashing import hash64

        sizes = assign.groupBy("sem_cluster").agg(
            F.count(F.lit(1)).alias("_csz")
        )
        splits = F.greatest(
            F.lit(1),
            F.expr(f"cast(ceil(_csz / {float(max_cluster_rows)}) as bigint)"),
        )
        assign = (
            assign.join(sizes, "sem_cluster")
            .select(
                "vid",
                "sem_cluster",
                F.pmod(hash64(F.col("vid").cast("string")), splits).alias("_sub"),
            )
        )
    else:
        assign = assign.select("vid", "sem_cluster", F.lit(0).alias("_sub"))
    v = (
        _normed(emb, id_col, vec_col)
        .select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("vv"),
            l2_norm(F.col(vec_col)).alias("vn"),
        )
        .join(assign, "vid")
    )
    a = v.select(
        F.col("vid").alias("a"),
        F.col("sem_cluster").alias("ca"),
        F.col("_sub").alias("sa"),
        F.col("vv").alias("av"),
        F.col("vn").alias("an"),
    )
    b = v.select(
        F.col("vid").alias("b"),
        F.col("sem_cluster").alias("cb"),
        F.col("_sub").alias("sb"),
        F.col("vv").alias("bv"),
        F.col("vn").alias("bn"),
    )
    pairs = (
        a.join(
            b,
            (F.col("ca") == F.col("cb"))
            & (F.col("sa") == F.col("sb"))
            & (F.col("a") < F.col("b")),
        )
        .select(
            "a",
            "b",
            roundd(
                dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")), 6
            ).alias("cos"),
        )
        .where(F.col("cos") >= F.lit(threshold))
    )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    groups = components_with_isolates(
        edges, emb, id_col, max_iterations=max_iterations
    )
    return (
        groups.select(F.col("node").alias("vid"), F.col("component").alias("dup_group"))
        .join(assign, "vid")
        .select(
            F.col("vid").alias(id_col),
            "sem_cluster",
            "dup_group",
            (F.col("vid") == F.col("dup_group")).cast("long").alias("keep"),
        )
    )


def rerank_exact(
    cand: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    queries: DataFrame | None = None,
) -> DataFrame:
    """Exact-cosine re-rank of a bounded candidate set — the FAISS
    "refine" tail every production ANN deployment runs after the
    compressed index: ``cand`` is (query_id, neighbor_id) pairs from
    an ANN stage (IVFPQ at a widened k), and the top-``k`` of each
    query's candidates by EXACT cosine is returned as
    (query_id, neighbor_id, cos, rank).  The compressed index buys
    recall cheaply; the refine step buys ranking precision on the
    shortlist without ever scanning raw vectors corpus-wide.

    Scale shape: raw vectors join ONLY for the candidate rows — the
    bounded cand set is broadcast into one corpus scan to pick up
    neighbor vectors, and the (still bounded) result is broadcast
    into a second scan for query vectors; two broadcast hash joins,
    zero corpus shuffle, O(|cand|) window work.  Cosine is rounded
    BEFORE ranking (neighbor id tie-break), the cosine_topk
    reproducibility contract, so the re-ranked order is
    engine-exact.

    Id-resolution contract (advice r11): both joins are INNER, so a
    cand row whose neighbor_id is absent from ``corpus`` or whose
    query_id is absent from the query-vector side contributes
    nothing — candidates are expected to COME FROM an ANN stage over
    the same corpus, where both always resolve.  Callers re-ranking
    an EXTERNAL query batch (query vectors not stored in the corpus)
    must pass it as ``queries`` (same id/vec column names); leaving
    ``queries=None`` reads query vectors from ``corpus`` and silently
    drops out-of-corpus query ids."""
    c = _normed(corpus, id_col, vec_col)
    q = c if queries is None else _normed(queries, id_col, vec_col)
    ns = c.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        l2_norm(F.col(vec_col)).alias("cn"),
    )
    qs = q.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(F.col(vec_col)).alias("qn"),
    )
    with_n = ns.join(
        F.broadcast(cand.select("query_id", "neighbor_id")), "neighbor_id"
    )
    scored = qs.join(F.broadcast(with_n), "query_id").select(
        "query_id",
        "neighbor_id",
        roundd(
            dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
            round_to,
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )
