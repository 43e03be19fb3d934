"""Portable deterministic hashing.

``xxhash64`` is the fast JVM-side hash for internal use (shuffle
checksums, salting), but it is Spark-specific.  Operators whose
*results* depend on hash values (minhash, simhash, fingerprints)
use an md5-derived 60-bit hash instead: md5 is bit-identical in
every engine, so the same query can be verified against a DuckDB
oracle (and re-run on any other stack) hash-for-hash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "hash64",
    "hash64_sql",
    "seeded_hash64",
    "seeded_hash64_sql",
    "affine_hash",
    "affine_hash_sql",
    "M31",
]

#: Mersenne prime 2^31-1: modulus of the affine hash family
M31 = 2_147_483_647

#: Knuth multiplicative constant, reduced per seed
_A0 = 2_654_435_761
_B0 = 40_503


def _affine_consts(seed: int) -> tuple[int, int]:
    a = (_A0 * (seed + 1)) % M31
    b = (_B0 * (seed + 7)) % M31
    return a, b


def hash64(col: Column | str) -> Column:
    """Deterministic 60-bit non-negative hash of a string column.

    First 15 hex digits of md5, parsed as an integer — identical in
    DuckDB as ``('0x' || substr(md5(x),1,15))::BIGINT``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash64_sql(expr: str) -> str:
    """DuckDB SQL twin of :func:`hash64`."""
    return f"('0x' || substr(md5({expr}),1,15))::BIGINT"


def seeded_hash64(col: Column | str, seed: int) -> Column:
    """Family of independent hash functions h_seed(x) for minhash."""
    c = F.col(col) if isinstance(col, str) else col
    return hash64(F.concat(F.lit(f"{seed}\x1f"), c))


def seeded_hash64_sql(expr: str, seed: int) -> str:
    """DuckDB SQL twin of :func:`seeded_hash64`."""
    return hash64_sql(f"'{seed}' || chr(31) || {expr}")


def affine_hash(base: Column, seed: int) -> Column:
    """Cheap seeded hash family over an already-hashed base value:
    ``h_seed(x) = ((base % M31) * a_seed + b_seed) % M31``.

    One md5 per input (the ``base``), then pure integer arithmetic
    per seed — 16-hash minhash costs 1 md5 instead of 16.  All
    intermediates fit in int64: (M31-1)² + M31 < 2^63.
    """
    a, b = _affine_consts(seed)
    return ((base % F.lit(M31)) * F.lit(a) + F.lit(b)) % F.lit(M31)


def affine_hash_sql(base_expr: str, seed: int) -> str:
    """DuckDB SQL twin of :func:`affine_hash`."""
    a, b = _affine_consts(seed)
    return f"((({base_expr}) % {M31}) * {a} + {b}) % {M31}"
