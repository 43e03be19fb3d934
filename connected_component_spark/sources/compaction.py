"""Small-files compaction for parquet datasets.

Streaming sinks, per-trigger writes, and over-parallel jobs leave
datasets as thousands of KB-scale files; at scan time every file
costs a task launch + footer read + object-store request, so the
"small files problem" quietly multiplies scan latency.  Compaction
rewrites a dataset into files near a target size with identical
contents — pure layout maintenance.

The file count comes from the dataset's actual on-disk bytes (driver
filesystem listing — the same metadata pass any table format keeps),
then one ``repartition(n)`` rewrite.  Round-robin repartition gives
uniformly-sized output files; pass ``order_by`` to instead
range-sort the rewrite so min/max footer stats become selective
(the poor man's Z-order for one key).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["compact_parquet", "dataset_file_stats"]

_TARGET_BYTES_DEFAULT = 128 * 1024 * 1024


def dataset_file_stats(path: str) -> tuple[int, int]:
    """(file count, total bytes) of a parquet dataset directory."""
    n = total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = _TARGET_BYTES_DEFAULT,
    order_by: str | None = None,
) -> int:
    """Rewrite the parquet dataset at ``src`` into ``dst`` with files
    near ``target_file_bytes``; returns the output file count.
    ``dst`` must differ from ``src`` (write-then-swap is the caller's
    transaction; overwriting in place would destroy the source on
    failure)."""
    if os.path.abspath(src) == os.path.abspath(dst):
        raise ValueError("compact_parquet: dst must differ from src "
                         "(write-then-swap, never in-place)")
    if target_file_bytes <= 0:
        raise ValueError("compact_parquet: target_file_bytes must be positive")
    _n, total = dataset_file_stats(src)
    n_out = max(1, -(-total // target_file_bytes))
    df: DataFrame = spark.read.parquet(src)
    if order_by is not None:
        df = df.repartitionByRange(n_out, order_by).sortWithinPartitions(order_by)
    else:
        df = df.repartition(n_out)
    df.write.mode("overwrite").parquet(dst)
    out_n, _ = dataset_file_stats(dst)
    return out_n
