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

__all__ = ["hash64", "hash64_sql", "seeded_hash64", "seeded_hash64_sql"]


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
