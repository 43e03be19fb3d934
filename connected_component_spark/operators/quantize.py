"""Embedding quantization operators.

Symmetric scalar quantization (the int8 SQ scheme ANN stores use to
cut vector memory 4×): per-vector scale = max|x| / (2^(bits-1) - 1),
codes = round-half-up(x / scale), dequant = code * scale.

Scale notes (100 TB): map-only — pure Catalyst higher-order
functions over the embedding array, whole-stage codegen, zero
shuffle, zero Python.  Every arithmetic step is a single
correctly-rounded IEEE op chain in array order, so results are
engine-exact and oracle-checkable (the same discipline as the
similarity operators' dot products).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from connected_component_spark.queries.parity import roundd

__all__ = [
    "scalar_quantize",
    "quantization_report",
    "l2_normalize",
    "pq_codebooks",
    "pq_encode",
    "pq_topk",
    "ivfpq_topk",
]


def _as_double(v):
    return F.transform(v, lambda x: x.cast("double"))


def scalar_quantize(
    emb: DataFrame, col: str = "embedding", bits: int = 8
) -> DataFrame:
    """Add (codes array<long>, scale double) to each row: symmetric
    per-vector scalar quantization at ``bits`` bits.  An all-zero
    vector quantizes to all-zero codes with scale 0.

    codes[i] = floor(x[i]/scale + 0.5) — round-half-up, chosen over
    banker's rounding because floor(+0.5) is the one rounding rule
    every SQL engine computes bit-identically.
    """
    levels = float(2 ** (bits - 1) - 1)
    v = _as_double(F.col(col))
    max_abs = F.array_max(F.transform(v, F.abs))
    scale = max_abs / F.lit(levels)
    codes = F.when(
        max_abs == F.lit(0.0),
        F.transform(v, lambda x: F.lit(0).cast("long")),
    ).otherwise(
        F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)))
    )
    return emb.withColumn("codes", codes).withColumn("scale", scale)


def quantization_report(
    emb: DataFrame, col: str = "embedding", bits: int = 8
) -> DataFrame:
    """Per-vector reconstruction-quality report for ``bits``-bit
    symmetric scalar quantization: (vec_id, scale, max_abs_err,
    cos_recon) where max_abs_err = max_i |x_i - code_i*scale| and
    cos_recon = cosine(original, dequantized) — the number an ANN
    operator needs to decide whether SQ-compressed vectors can serve
    its recall target.  Zero vectors report cos_recon = 1.0 by
    convention (reconstruction is exact)."""
    # rename the working scale: the output aliases a ROUNDED column as
    # "scale", and Spark's lateral-column-alias resolution would bind
    # any later F.col("scale") in the same select list to that rounded
    # alias — silently dequantizing with the rounded scale (caught by
    # the oracle gate as a last-digit err divergence).
    q = scalar_quantize(emb, col, bits).withColumnRenamed("scale", "_sq_scale")
    v = _as_double(F.col(col))
    deq = F.transform(
        F.col("codes"), lambda c: c.cast("double") * F.col("_sq_scale")
    )
    diff = F.zip_with(v, deq, lambda x, y: F.abs(x - y))
    dot = F.aggregate(
        F.zip_with(v, deq, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n1 = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    n2 = F.sqrt(
        F.aggregate(
            F.transform(deq, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    return q.select(
        "vec_id",
        roundd(F.col("_sq_scale"), 9).alias("scale"),
        roundd(F.array_max(diff), 6).alias("max_abs_err"),
        F.when(F.col("_sq_scale") == F.lit(0.0), F.lit(1.0))
        .otherwise(roundd(dot / (n1 * n2), 6))
        .alias("cos_recon"),
    )


def l2_normalize(
    emb: DataFrame, col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, norm, unit): L2 norm and unit-normalized vector per row —
    the transform a cosine-similarity store applies at ingest so
    serving can use plain dot products.

    Map-only, pure Catalyst higher-order functions, zero shuffle.
    Exactness: the squared norm is a LEFT FOLD in array order
    (``F.aggregate`` with acc + x*x), sqrt and the per-element
    division are single correctly-rounded IEEE ops — so an oracle
    replaying the same fold order reproduces every double bit-for-bit
    (same discipline as :func:`quantization_report`).  A zero vector
    passes through unchanged with norm 0 (division would yield NaN).
    """
    v = _as_double(F.col(col))
    sq = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    norm = F.sqrt(sq)
    unit = F.when(norm == F.lit(0.0), v).otherwise(
        F.transform(v, lambda x: x / norm)
    )
    return emb.select(
        F.col(id_col), norm.alias("norm"), unit.alias("unit")
    )


def pq_codebooks(
    emb: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[tuple[int, list[float]]]]]:
    """Product-quantization codebooks (Jégou/Douze/Schmid, TPAMI
    2011): split each ``dim``-d vector into ``m`` contiguous
    subvectors and train an independent ``k``-centroid Lloyd codebook
    per subspace.  Memory per vector drops from dim doubles to m
    small codes — the compression step that lets a 100 TB vector
    store keep its index in RAM.

    Returns ``[(sub, [(cid, centroid), ...]), ...]`` — m codebooks of
    k centroids each, every centroid ``dim/m`` wide.  Training is the
    already-verified distributed Lloyd of operators/clustering.py
    (decimal-exact means, smallest-id seeding), run once per
    subspace; all driver state is m·k tiny centroid rows."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    from connected_component_spark.operators.clustering import (
        kmeans_centroids,
    )

    d0 = dim // m
    books = []
    for s in range(m):
        sub = emb.select(
            F.col(id_col),
            F.slice(F.col(vec_col), s * d0 + 1, d0).alias(vec_col),
        )
        books.append(
            (s, kmeans_centroids(sub, k=k, iterations=iterations,
                                 id_col=id_col, vec_col=vec_col))
        )
    return books


def _validate_books(
    books: list[tuple[int, list[tuple[int, list[float]]]]],
) -> int:
    """Driver-side codebook-geometry check shared by the PQ
    entrypoints: at least one codebook, every codebook non-empty,
    every centroid in every subspace the same width.  Returns that
    width d0.  A codebook trained at one m and served at another
    would otherwise slice subvectors at the wrong stride and encode
    garbage silently (advice r10)."""
    if not books:
        raise ValueError("PQ needs at least one codebook")
    # subspace indices must be exactly 0..m-1 in order: pq_encode
    # slices at s*d0+1 while the in-plan width guard enforces
    # len(books)*d0, so a gap or duplicate in s would read past the
    # vector end (NULL-padded garbage codes) or emit duplicate
    # code_{s} columns — with no error (review r10)
    if [s for s, _ in books] != list(range(len(books))):
        raise ValueError(
            "PQ codebook subspace indices must be contiguous 0..m-1, "
            f"got {[s for s, _ in books]}"
        )
    d0: int | None = None
    for s, cents in books:
        if not cents:
            raise ValueError(f"PQ codebook {s} has no centroids")
        for cid, cv in cents:
            if d0 is None:
                d0 = len(cv)
            if len(cv) != d0:
                raise ValueError(
                    f"PQ codebook geometry mismatch: subspace {s} "
                    f"centroid {cid} is {len(cv)} wide, expected {d0} "
                    "— all codebooks must share one subspace width"
                )
    if not d0:
        raise ValueError("PQ codebook centroids must be non-empty vectors")
    return d0


def pq_encode(
    emb: DataFrame,
    books: list[tuple[int, list[tuple[int, list[float]]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, code_0 .. code_{m-1}): nearest-centroid code per subspace
    — one map-side pass, codebooks as literal arrays (the
    clustering._best argmin, ties to the lower cid), zero shuffle,
    zero join.  Codes are the centroid *ids*, stable across engines."""
    from connected_component_spark.operators.clustering import _best

    d0 = _validate_books(books)
    # in-plan length guard against the SECOND half of the geometry
    # contract — m·d0 must equal the actual vector width, else the
    # subspace slices silently read the wrong stride (or truncate).
    # A WHERE, not a projected column, so Catalyst cannot prune the
    # check out of the plan (same discipline as the incremental-dedup
    # id-order guard); one integer compare per row, codegen-side.
    m_d = len(books) * d0
    guarded = emb.where(
        F.when(
            F.size(F.col(vec_col)) != F.lit(m_d),
            F.raise_error(
                F.concat(
                    F.lit("pq_encode: vector length "),
                    F.size(F.col(vec_col)).cast("string"),
                    F.lit(f" != m*d0 = {m_d} — codebooks do not match"
                          " this corpus' dimensionality"),
                )
            ),
        ).otherwise(F.lit(True))
    )
    out = guarded.select(
        F.col(id_col),
        *[
            F.slice(
                F.transform(F.col(vec_col), lambda x: x.cast("double")),
                s * d0 + 1,
                d0,
            ).alias(f"_sv{s}")
            for s, _ in books
        ],
    )
    return out.select(
        F.col(id_col),
        *[
            _best(cents, vec=f"_sv{s}")["cid"].alias(f"code_{s}")
            for s, cents in books
        ],
    )


def pq_topk(
    queries: DataFrame,
    emb: DataFrame,
    books: list[tuple[int, list[tuple[int, list[float]]]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: per query, the
    k nearest corpus vectors by the PQ approximation
    ``sum_s d(q_sub_s, centroid[code_s])`` — the flat-PQ scan every
    PQ index serves from (compose with IVF cells to prune the scan;
    this operator is the in-cell scorer).

    (query_id, neighbor_id, adc, rank); self-matches excluded; ties
    break on neighbor_id.  Exactness: per-subspace distances are the
    left-fold zip_with chain, the m-term total is summed in FIXED
    subspace order (((d0+d1)+d2)+d3 — never a commutative aggregate
    over doubles), so every adc double is engine-exact.

    Scale shape: corpus encodes map-side; each per-(query, subspace,
    code) distance table is Q·k rows and BROADCAST; the scan is one
    pass over the codes with m broadcast hash joins and a per-query
    top-k window — no corpus self-join, no global sort.

    ``codes`` (r15, physical only): a precomputed
    ``pq_encode(emb, books, id_col, vec_col)`` frame — callers running
    several PQ legs over the same (corpus, books) encode once (see
    ivf_topk's ``storage`` contract); results unchanged by
    construction."""
    if not books:
        raise ValueError("pq_topk needs at least one codebook")
    if codes is None:
        codes = pq_encode(emb, books, id_col=id_col, vec_col=vec_col)
    cand = codes.withColumnRenamed(id_col, "neighbor_id").crossJoin(
        F.broadcast(queries.select(F.col(id_col).alias("query_id")))
    )
    return _adc_rank(cand, queries, books, k, id_col, vec_col)


def ivfpq_topk(
    queries: DataFrame,
    emb: DataFrame,
    books: list[tuple[int, list[tuple[int, list[float]]]]],
    k: int = 5,
    centroid_stride: int = 25,
    nprobe: int = 1,
    centroids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    storage: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """IVF + PQ — the standard large-scale ANN index architecture
    (FAISS's IVFPQ): coarse IVF cells prune the scan to ~n/√n
    candidates per probe, PQ codes + ADC tables score the survivors
    without touching raw vectors.  Same output contract as
    :func:`pq_topk`; recall follows the cell pruning (a true neighbor
    outside the probed cells is unreachable — the IVF dial), adc
    values for reachable pairs are IDENTICAL to the flat scan's, so
    the composition is oracle-checkable end-to-end.

    Scale shape on top of pq_topk: one broadcast coarse-assignment
    pass for the corpus, one bounded pass for the queries, and the
    candidate generation becomes an equi-join on the cell key instead
    of a cross join — the 100 TB serving plan (raw vectors appear
    ONLY in the bounded query-side distance tables).

    ``storage``/``codes`` (r15, physical only): precomputed
    ``ivf_cell_assignments(emb, centroids, id_col, vec_col, 1)`` /
    ``pq_encode(emb, books, id_col, vec_col)`` frames — callers
    running several IVF/PQ legs over the same corpus compute each
    once (see ivf_topk's ``storage`` contract); results unchanged by
    construction."""
    from connected_component_spark.operators.similarity import (
        ivf_cell_assignments,
    )

    if not books:
        raise ValueError("ivfpq_topk needs at least one codebook")
    # validate, don't clamp: every sibling parameter here raises on
    # nonsense, and a silent max(1, nprobe) would hand a caller
    # passing nprobe=0 single-probe results with no signal (advice r10)
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    if centroids is None:
        centroids = emb.where(F.col(id_col) % centroid_stride == 0)
    if storage is None:
        storage = ivf_cell_assignments(emb, centroids, id_col, vec_col, 1)
    # probe-pruned serving: here the prune IS the ``pairs`` inner join
    # below — probe ⋈ storage on the cell key drops every
    # unprobed-cell row before the PQ codes are joined in, so the
    # expensive per-candidate ADC work only ever sees probed cells.
    # No extra semi-join: storage's only consumer is that join, so a
    # pre-filter would prune nothing it doesn't already prune
    # (review r12 — an earlier draft paid a redundant probe
    # evaluation + broadcast for exactly zero extra pruning).
    probe = ivf_cell_assignments(
        queries, centroids, id_col, vec_col, nprobe
    )
    pairs = (
        probe.select(F.col(id_col).alias("query_id"), "cell")
        .join(
            storage.select(F.col(id_col).alias("neighbor_id"), "cell"),
            "cell",
        )
        .select("query_id", "neighbor_id")
    )
    if codes is None:
        codes = pq_encode(emb, books, id_col=id_col, vec_col=vec_col)
    cand = pairs.join(
        codes.withColumnRenamed(id_col, "neighbor_id"), "neighbor_id"
    )
    return _adc_rank(cand, queries, books, k, id_col, vec_col)


def _adc_rank(
    cand: DataFrame,
    queries: DataFrame,
    books: list[tuple[int, list[tuple[int, list[float]]]]],
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared ADC scorer: ``cand`` is (query_id, neighbor_id,
    code_0..code_{m-1}); joins the m broadcast per-(query, code)
    distance tables and ranks by the fixed-order subspace sum."""
    from pyspark.sql import Window

    from connected_component_spark.functions.vectors import fold_sq_dist

    d0 = _validate_books(books)
    # the corpus side is width-guarded in pq_encode; guard the QUERY
    # side too — an off-width query batch would slice empty
    # subvectors, fold to NULL adc, and Spark's NULLS-FIRST ascending
    # window would rank the garbage 1..k silently (review r10)
    m_d = len(books) * d0
    queries = queries.where(
        F.when(
            F.size(F.col(vec_col)) != F.lit(m_d),
            F.raise_error(
                F.concat(
                    F.lit("pq serving: query vector length "),
                    F.size(F.col(vec_col)).cast("string"),
                    F.lit(f" != m*d0 = {m_d} — codebooks do not match"
                          " the query batch's dimensionality"),
                )
            ),
        ).otherwise(F.lit(True))
    )
    spark = queries.sparkSession
    for s, cents in books:
        cent_df = spark.createDataFrame(
            [(int(cid), [float(x) for x in cv]) for cid, cv in cents],
            f"_cid{s} long, _cv{s} array<double>",
        )
        qsub = queries.select(
            F.col(id_col).alias("query_id"),
            F.slice(
                F.transform(F.col(vec_col), lambda x: x.cast("double")),
                s * d0 + 1,
                d0,
            ).alias("_qv"),
        )
        dtab = qsub.crossJoin(F.broadcast(cent_df)).select(
            "query_id",
            F.col(f"_cid{s}"),
            fold_sq_dist(F.col("_qv"), F.col(f"_cv{s}")).alias(f"_d{s}"),
        )
        cand = cand.join(
            F.broadcast(dtab),
            (cand["query_id"] == dtab["query_id"])
            & (cand[f"code_{s}"] == dtab[f"_cid{s}"]),
        ).drop(dtab["query_id"]).drop(f"_cid{s}")
    adc = None
    for s, _ in books:
        d = F.col(f"_d{s}")
        adc = d if adc is None else adc + d
    scored = cand.where(F.col("query_id") != F.col("neighbor_id")).select(
        "query_id", "neighbor_id", adc.alias("adc")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )
