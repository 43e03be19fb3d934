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

__all__ = ["scalar_quantize", "quantization_report", "l2_normalize"]


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
