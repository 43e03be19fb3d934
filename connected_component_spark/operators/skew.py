"""Skew mitigation: salted joins and two-stage aggregation.

AQE's skew-join splitting (on by default in session.py) handles most
runtime skew; these explicit operators cover the cases AQE cannot —
a broadcast-ineligible join against a table with a handful of
pathological hot keys, and aggregations whose per-group state is
itself large (collect_list/collect_set), where one reducer owns the
hot group no matter how AQE splits input partitions.

Both transforms are semantics-preserving rewrites (tests assert
equality with the unsalted plan); the salt is a deterministic hash,
not a random number, so runs are reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["with_salt", "salted_join", "salted_collect_set"]

#: join types for which salting the LEFT side + replicating the right
#: is a semantics-preserving rewrite.  Right/full outer are NOT: the
#: replicated right copies that find no left partner would each emit a
#: null-extended row (``salts``× duplication of right-unmatched rows).
_SALT_SAFE_JOINS = {
    "inner",
    "left",
    "leftouter",
    "semi",
    "leftsemi",
    "anti",
    "leftanti",
}


def with_salt(df: DataFrame, cols: list[str] | None, salts: int) -> DataFrame:
    """Add a deterministic ``_salt`` in [0, salts) derived from a
    hash of ``cols`` (all columns when None) — reproducible, unlike
    rand()-based salting."""
    basis = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(*basis), F.lit(salts)).cast("int")
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salts: int = 8,
    how: str = "inner",
    salt_basis: list[str] | None = None,
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are spread over
    ``salts`` reducers: the skewed side gets a hash salt, the other
    side is replicated once per salt value, and the join key becomes
    (key, salt).  Row-identical to ``skewed.join(other, on, how)``.

    Cost model: replicates ``other`` ``salts``× (use only when
    ``other`` is small-ish but above the broadcast threshold, the
    classic AQE-resistant middle ground).

    Only left-preserving join types are accepted (see
    ``_SALT_SAFE_JOINS``); right/full outer would silently duplicate
    right-unmatched rows ``salts``× and raise instead.
    """
    if how.lower().replace("_", "") not in _SALT_SAFE_JOINS:
        raise ValueError(
            f"salted_join does not support how={how!r}: salting the left "
            "side and replicating the right is only semantics-preserving "
            "for inner/left/left_semi/left_anti joins"
        )
    left = with_salt(skewed, salt_basis, salts)
    right = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return left.join(right, [on, "_salt"], how).drop("_salt")


def salted_collect_set(
    df: DataFrame, key: str, value: str, salts: int = 8
) -> DataFrame:
    """collect_set per key, skew-safe: partial sets per (key, salt)
    then a flatten-merge per key — the hot group's state is built on
    ``salts`` reducers instead of one.

    Returns (key, values array) with the array sorted for
    deterministic comparison.
    """
    partial = (
        with_salt(df, [value], salts)
        .groupBy(key, "_salt")
        .agg(F.collect_set(value).alias("_vals"))
    )
    return (
        partial.groupBy(key)
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("_vals")))
            ).alias("values")
        )
    )
