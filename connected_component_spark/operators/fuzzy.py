"""Blocked fuzzy-match (edit-distance) join for record linkage.

A naive fuzzy join — ``ON levenshtein(a, b) <= d`` — has no equi key,
so Spark executes it as a broadcast-nested-loop / cartesian product:
O(n·m) string comparisons, the classic record-linkage scale cliff.
The standard fix (every production linkage system: Dedupe, Splink,
JedAI) is *blocking*: derive one or more deterministic blocking keys
from each string (first token, phonetic code, length band, …),
equi-join on the block, and refine candidates with the exact distance
predicate.  The physical plan is one shuffled equi-join whose cost is
bounded by the block-size distribution, not the corpus product; a
skewed block is just a skewed join key, which AQE splits.

Recall is governed by the blocking function: a pair that disagrees on
every blocking key is never compared (precision is always exact — the
refine predicate is the true edit distance).  Multiple blocking keys
union their candidate sets, with a first-matching-key rule so the
pair set stays duplicate-free without a distinct over it (same
technique as operators/rangejoin.py:overlap_join).

All comparisons are Catalyst built-ins (``levenshtein`` is JVM-side,
whole-stage-codegen'd); no Python in the path.

Reference scope note: the reference engine has no string-similarity
operator; this is training-data-pipeline surface (near-duplicate
titles, entity resolution across sources).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fuzzy_join", "fuzzy_self_pairs"]

_BLOCK = "__fz_block"
_KIDX = "__fz_kidx"


def _blocked(
    df: DataFrame, col: str, block_keys: Sequence[Callable[[Column], Column]]
) -> DataFrame:
    """Explode each row into (row, block_key_value, key_index) — one
    output row per blocking function.  Null/empty block values are
    dropped (they would otherwise form one giant junk block)."""
    keys = F.array(
        *[
            F.struct(
                fn(F.col(col)).cast("string").alias("b"),
                F.lit(i).alias("i"),
            )
            for i, fn in enumerate(block_keys)
        ]
    )
    return (
        df.select("*", F.explode(keys).alias("__fz_k"))
        .select("*", F.col("__fz_k.b").alias(_BLOCK), F.col("__fz_k.i").alias(_KIDX))
        .drop("__fz_k")
        .where(F.col(_BLOCK).isNotNull() & (F.col(_BLOCK) != ""))
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int,
    block_keys: Sequence[Callable[[Column], Column]] | None = None,
) -> DataFrame:
    """Inner join of ``left`` and ``right`` on
    ``levenshtein(left_col, right_col) <= max_distance``, restricted
    to pairs sharing at least one blocking key.

    ``block_keys`` maps a string Column to a blocking-key Column
    (default: first whitespace token, lowercased).  A candidate pair
    sharing several keys is emitted once — for its lowest shared key
    index — so the result is duplicate-free by construction.

    Output: all left columns + all right columns (names must not
    collide) + ``match_distance`` (long).
    """
    if max_distance < 0:
        raise ValueError("fuzzy_join max_distance must be >= 0")
    collisions = set(left.columns) & set(right.columns)
    if collisions:
        raise ValueError(
            f"fuzzy_join column collision: {sorted(collisions)}; rename first"
        )
    if block_keys is None:
        block_keys = [lambda c: F.lower(F.split(c, r"\s+").getItem(0))]

    lb = _blocked(left, left_col, block_keys)
    rb = (
        _blocked(right, right_col, block_keys)
        .withColumnRenamed(_BLOCK, _BLOCK + "_r")
        .withColumnRenamed(_KIDX, _KIDX + "_r")
    )
    dist = F.levenshtein(F.col(left_col), F.col(right_col))
    pairs = lb.join(
        rb,
        (F.col(_BLOCK) == F.col(_BLOCK + "_r"))
        & (F.col(_KIDX) == F.col(_KIDX + "_r")),
    ).where(dist <= max_distance)
    # first-shared-key dedup: keep the pair only in its lowest shared
    # key index — an aggregation-free guarantee that multi-key blocking
    # never duplicates a pair.  A shared key at index i is "lowest"
    # iff no smaller index j also matches; with the small fixed key
    # count this is a conjunction of levenshtein-free equality checks
    # on precomputed key columns, evaluated per candidate row.
    if len(block_keys) > 1:
        no_earlier = F.lit(True)
        for j in range(len(block_keys) - 1):
            lk = block_keys[j](F.col(left_col)).cast("string")
            rk = block_keys[j](F.col(right_col)).cast("string")
            earlier_match = (
                (F.col(_KIDX) > j)
                & lk.isNotNull()
                & (lk != "")
                & (lk == rk)
            )
            no_earlier = no_earlier & ~earlier_match
        pairs = pairs.where(no_earlier)
    return pairs.select(
        *left.columns, *right.columns, dist.cast("long").alias("match_distance")
    )


def fuzzy_self_pairs(
    df: DataFrame,
    col: str,
    max_distance: int,
    block_keys: Sequence[Callable[[Column], Column]] | None = None,
) -> DataFrame:
    """Unordered within-corpus near-match pairs: distinct values of
    ``col`` fuzzy-joined against themselves with ``value_a < value_b``
    canonicalization (each unordered pair once, no self-pairs).

    Output: (value_a, value_b, match_distance)."""
    names = df.select(F.col(col).alias("value_a")).where(
        F.col("value_a").isNotNull()
    ).distinct()
    out = fuzzy_join(
        names,
        names.select(F.col("value_a").alias("value_b")),
        "value_a",
        "value_b",
        max_distance,
        block_keys=block_keys,
    )
    return out.where(F.col("value_a") < F.col("value_b"))
