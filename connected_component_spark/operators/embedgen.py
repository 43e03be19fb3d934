"""Deterministic cluster-side embedding-corpus generator.

The vector sibling of ``graph/generator.py:distributed_clique_chains``
(generator-as-oracle): the fixture embeddings are isotropic on the
unit sphere, so a LEARNED coarse quantizer has no structure to learn
and the honest recall record (SURVEY §6.5) cannot show the trained
index winning.  This generator produces a mixture-of-Gaussians corpus
— the regime every real embedding corpus lives in and the one IVF
training exists for — so tests can pin ``trained recall >= stride
recall`` and nprobe monotonicity where the claim actually applies
(verdict r10 #3).

Everything is a pure function of (seed, vec_id, component index):
cluster centers derive from SHA-256 driver-side (n_clusters·dim
doubles — a codebook-sized table, broadcast), per-point noise derives
from ``xxhash64`` Box-Muller ENTIRELY inside JVM expressions — the
generation is one embarrassingly-parallel projection over
``spark.range(n)`` with no shuffle, no Python rows, and no RNG state,
so any fraction of a 100 TB corpus regenerates independently on any
executor.
"""

from __future__ import annotations

import hashlib
import math
import struct

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "mixture_centers",
    "gaussian_mixture_embeddings",
    "hashed_bow_embeddings",
]

#: 52-bit mantissa mask — hash bits → uniform doubles without float
#: precision loss
_MASK = (1 << 52) - 1
_SCALE = float(1 << 52)


def _sha_unit(tag: bytes, dim: int) -> list[float]:
    """A deterministic unit vector: dim standard normals via
    Box-Muller over SHA-256 counter-mode uniforms, L2-normalized."""
    vals: list[float] = []
    ctr = 0
    while len(vals) < dim:
        h = hashlib.sha256(tag + ctr.to_bytes(4, "big")).digest()
        a, b = struct.unpack(">QQ", h[:16])
        u1 = ((a & _MASK) + 1) / (_SCALE + 1.0)  # (0, 1]
        u2 = (b & _MASK) / _SCALE  # [0, 1)
        r = math.sqrt(-2.0 * math.log(u1))
        vals.append(r * math.cos(2.0 * math.pi * u2))
        if len(vals) < dim:
            vals.append(r * math.sin(2.0 * math.pi * u2))
        ctr += 1
    norm = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / norm for v in vals]


def mixture_centers(
    n_clusters: int, dim: int, seed: int = 7
) -> list[list[float]]:
    """``n_clusters`` deterministic unit-vector cluster centers.  In
    moderate dimension random unit vectors are near-orthogonal, so the
    mixture components are well separated by construction."""
    if n_clusters < 1:
        raise ValueError(f"n_clusters must be >= 1, got {n_clusters}")
    if dim < 2:
        raise ValueError(f"dim must be >= 2, got {dim}")
    return [
        _sha_unit(f"ccs-mog-{seed}-{c}".encode(), dim)
        for c in range(n_clusters)
    ]


def _std_normal(seed: int, j: Column, salt: int) -> Column:
    """A standard normal as a pure JVM expression of
    (seed, vec_id, j, salt): Box-Muller over two xxhash64 uniforms."""
    h1 = F.xxhash64(F.lit(seed), F.col("vec_id"), j, F.lit(2 * salt))
    h2 = F.xxhash64(F.lit(seed), F.col("vec_id"), j, F.lit(2 * salt + 1))
    u1 = (h1.bitwiseAND(F.lit(_MASK)) + F.lit(1)).cast("double") / F.lit(
        _SCALE + 1.0
    )  # (0, 1] — log never sees 0
    u2 = h2.bitwiseAND(F.lit(_MASK)).cast("double") / F.lit(_SCALE)
    return F.sqrt(F.lit(-2.0) * F.log(u1)) * F.cos(
        F.lit(2.0 * math.pi) * u2
    )


def gaussian_mixture_embeddings(
    spark: SparkSession,
    n: int,
    dim: int = 32,
    n_clusters: int = 16,
    sigma: float = 0.15,
    seed: int = 7,
) -> DataFrame:
    """(vec_id, cluster, embedding): ``n`` vectors drawn from a
    mixture of ``n_clusters`` spherical Gaussians (stddev ``sigma``
    per component) around deterministic unit centers; cluster
    membership is HASH-derived from vec_id (not modular), so id-based
    subsets — stride landmarks, id-range batches — sample clusters
    like a real corpus instead of aliasing against them.

    Scale shape: ``spark.range(n)`` → one broadcast join against the
    codebook-sized center table → a single whole-stage-codegen
    projection (xxhash64 + log/cos/sqrt per component).  No shuffle,
    no Python evaluation, no driver-side rows beyond the centers.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if sigma < 0:
        raise ValueError(f"sigma must be >= 0, got {sigma}")
    centers = mixture_centers(n_clusters, dim, seed)
    cent_df = spark.createDataFrame(
        [(c, centers[c]) for c in range(n_clusters)],
        "cluster int, center array<double>",
    )
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.pmod(
            F.xxhash64(F.lit(seed), F.col("id"), F.lit(-1)),
            F.lit(n_clusters),
        )
        .cast("int")
        .alias("cluster"),
    )
    return base.join(F.broadcast(cent_df), "cluster").select(
        "vec_id",
        "cluster",
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: F.element_at("center", (j + F.lit(1)).cast("int"))
            + F.lit(float(sigma)) * _std_normal(seed, j, 1),
        ).alias("embedding"),
    )


def hashed_bow_embeddings(
    docs: DataFrame, dim: int = 32
) -> DataFrame:
    """(doc_id, embedding array<double>): deterministic feature-hashed
    bag-of-words projection (Weinberger et al., "Feature Hashing for
    Large Scale Multitask Learning", ICML 2009) of each document's
    token bag — the TEXT-CORRELATED embedding fixture the retrieval/
    ANN evaluation rows need (verdict r12 #5: the parquet fixture
    embeddings are isotropic and text-independent, so semantic-leg
    recall honestly measured ~0 against lexical ground truth).

    ``embedding[j] = Σ_tokens sign(t) · count(t)`` over tokens with
    ``bucket(t) = j``, where bucket and sign derive from the portable
    md5 hash family (functions/hashing.py:hash64) — so a DuckDB
    oracle reproduces the vectors bit-exactly, and cosine over them
    (integer-valued doubles, one IEEE division rounded at 6) is
    engine-exact.  Vectors are intentionally NOT normalized: cosine
    is scale-invariant and integer components keep both engines
    exact.  Documents whose text yields no tokens are EXCLUDED (a
    zero vector has no direction; the fixture corpus has none).

    Scale shape: tokenize → explode → two hash-keyed aggregations
    (map-side partial combine) → one width-``dim`` array projection.
    No shuffle wider than (doc_id, bucket), no Python, no driver
    state — any slice of a 100 TB corpus projects independently.
    """
    if dim < 2:
        raise ValueError(f"dim must be >= 2, got {dim}")
    from connected_component_spark.functions.hashing import hash64
    from connected_component_spark.operators.text import tokens

    toks = docs.select(
        F.col("doc_id"), F.explode(tokens("text")).alias("token")
    )
    feat = (
        toks.select(
            "doc_id",
            F.pmod(hash64(F.col("token")), F.lit(dim)).alias("bucket"),
            F.when(
                F.pmod(
                    hash64(F.concat(F.lit("s#"), F.col("token"))), F.lit(2)
                )
                == 0,
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .alias("sign"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sign").alias("v"))
    )
    per_doc = feat.groupBy("doc_id").agg(
        F.map_from_arrays(
            F.collect_list("bucket"), F.collect_list("v")
        ).alias("m")
    )
    return per_doc.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: F.coalesce(
                F.element_at("m", j.cast("long")), F.lit(0)
            ).cast("double"),
        ).alias("embedding"),
    )
