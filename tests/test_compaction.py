"""Compaction: many tiny files -> few right-sized files, identical
contents, and sorted rewrites get selective footer stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from connected_component_spark.sources.compaction import (
    compact_parquet,
    dataset_file_stats,
)
from connected_component_spark.sources.tables import load_table


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def test_compaction_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "fragmented")
    ev.repartition(64).write.parquet(src)  # the small-files problem
    n_src, total = dataset_file_stats(src)
    assert n_src == 64

    dst = str(tmp_path / "compacted")
    n_out = compact_parquet(spark, src, dst, target_file_bytes=total)
    assert n_out < n_src and n_out <= 2
    assert _rows(spark.read.parquet(dst)) == _rows(ev)


def test_compaction_sorted_rewrite_clusters_stats(spark, sf_dir, tmp_path):
    """order_by rewrite: per-file event_id ranges must not overlap,
    so a point-lookup scan can skip all but one file on footer stats."""
    import pyarrow.parquet as pq
    import os

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "frag")
    ev.repartition(16).write.parquet(src)
    dst = str(tmp_path / "sorted")
    _, total = dataset_file_stats(src)
    n_out = compact_parquet(
        spark, src, dst, target_file_bytes=max(total // 4, 1), order_by="event_id"
    )
    assert n_out >= 2
    ranges = []
    for root, _d, files in os.walk(dst):
        for f in files:
            if f.endswith(".parquet"):
                md = pq.ParquetFile(os.path.join(root, f))
                t = md.read(columns=["event_id"])["event_id"].to_pylist()
                ranges.append((min(t), max(t)))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo, f"overlapping file ranges: {ranges}"
    assert _rows(spark.read.parquet(dst)) == _rows(ev)


def test_compaction_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="in-place"):
        compact_parquet(spark, str(tmp_path), str(tmp_path))
    with pytest.raises(ValueError, match="positive"):
        compact_parquet(spark, str(tmp_path / "a"), str(tmp_path / "b"), 0)
