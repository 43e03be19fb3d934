"""Z-order layout: per-file footer ranges must be narrow on EVERY
z-ordered dimension — the data-skipping property a single-column sort
cannot give."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from connected_component_spark.sources.tables import load_table
from connected_component_spark.sources.zorder import write_zordered, zorder_value


def _file_ranges(path: str, col: str) -> list[tuple[float, float]]:
    out = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(
            md.row_group(g).column(idx).statistics.min
            for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(idx).statistics.max
            for g in range(md.num_row_groups)
        )
        out.append((float(lo), float(hi)))
    return out


def _mean_norm_range(path: str, col: str) -> float:
    ranges = _file_ranges(path, col)
    glo = min(r[0] for r in ranges)
    ghi = max(r[1] for r in ranges)
    width = (ghi - glo) or 1.0
    return sum((hi - lo) / width for lo, hi in ranges) / len(ranges)


def test_bucket_rank_is_quantile_index(spark):
    df = spark.range(1, 101).select(F.col("id").cast("double").alias("x"))
    _, z = zorder_value(df, ["x"], bits=2)  # 4 buckets
    got = df.withColumn("z", z).groupBy("z").count().orderBy("z").collect()
    # 4 roughly equal quantile buckets, z equals the bucket rank
    assert [r.z for r in got] == [0, 1, 2, 3]
    assert all(15 <= r["count"] <= 35 for r in got)


def test_zorder_interleave_bit_positions(spark):
    # anti-correlated x/y over 1..8: the x=8 row has rank(x)=3
    # (binary 11) and rank(y)=0 (y=1 sits below every quantile cut),
    # so z = 10 10 = 10 with x owning the high slot of each pair
    df = spark.createDataFrame(
        [(float(i), float(9 - i)) for i in range(1, 9)], "x double, y double"
    )
    _, z = zorder_value(df, ["x", "y"], bits=2)
    top = df.withColumn("z", z).orderBy(F.desc("x")).limit(1).collect()[0]
    assert top.z == 0b1010


def test_zorder_rejects_too_many_bits(spark):
    df = spark.range(10).select(F.col("id").cast("double").alias("x"))
    import pytest

    with pytest.raises(ValueError):
        zorder_value(df, ["x"] * 8, bits=8)
    with pytest.raises(ValueError):
        zorder_value(df, [], bits=8)


def test_zordered_layout_prunes_on_both_dims(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("user_id", "value", "event_id")

    zpath = str(tmp_path / "zorder")
    write_zordered(ev, zpath, ["user_id", "value"], n_files=8)

    # naive comparison layout: range-sorted on user_id only
    npath = str(tmp_path / "naive")
    (
        ev.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(npath)
    )

    # same data survives the rewrite
    assert (
        spark.read.parquet(zpath).count()
        == spark.read.parquet(npath).count()
        == ev.count()
    )

    # the naive layout clusters user_id perfectly but leaves value
    # ranges at ~full width; the z-order layout must be selective on
    # BOTH dimensions
    z_user = _mean_norm_range(zpath, "user_id")
    z_val = _mean_norm_range(zpath, "value")
    n_val = _mean_norm_range(npath, "value")
    assert z_user <= 0.6, f"z-order user_id ranges too wide: {z_user:.3f}"
    assert z_val <= 0.6, f"z-order value ranges too wide: {z_val:.3f}"
    # the single-column sort leaves the second dimension materially
    # less clustered than the z-order layout does
    assert z_val < n_val - 0.15, f"z={z_val:.3f} vs naive={n_val:.3f}"


def test_explicit_bounds_skip_quantile_job_and_are_deterministic(spark):
    """bounds= supplies explicit cut points: the quantile job is
    skipped for covered columns and the z-value is a pure function of
    the row — the determinism contract the declared maintenance
    queries rely on."""
    df = spark.range(64).select(
        F.col("id").alias("a"), (63 - F.col("id")).alias("b")
    )
    cuts = [float(i * 8) for i in range(1, 8)]  # 7 cuts -> 8 buckets (bits=3)
    _, z1 = zorder_value(df, ["a", "b"], bits=3, bounds={"a": cuts, "b": cuts})
    _, z2 = zorder_value(df, ["a", "b"], bits=3, bounds={"a": cuts, "b": cuts})
    r1 = [r["z"] for r in df.withColumn("z", z1).orderBy("a").collect()]
    r2 = [r["z"] for r in df.withColumn("z", z2).orderBy("a").collect()]
    assert r1 == r2
    # hand-check one row: a=0 -> rank 0; b=63 -> rank 7 (all cuts <= 63)
    # bits=3, k=2: a owns the high slot of each pair -> z = interleave(0, 7)
    z_row0 = r1[0]
    expect = sum(((7 >> bit) & 1) << (bit * 2) for bit in range(3))
    assert z_row0 == expect

    # unknown column in bounds fails loudly
    import pytest

    with pytest.raises(ValueError, match="non-z-order columns"):
        zorder_value(df, ["a"], bits=3, bounds={"nope": cuts})


def test_partial_bounds_mix_with_sampled_quantiles(spark):
    """Columns without explicit bounds still get approxQuantile cut
    points; the two sources coexist in one z-value."""
    df = spark.range(100).select(
        F.col("id").alias("a"), (F.col("id") * 3 % 100).alias("b")
    )
    cuts = [25.0, 50.0, 75.0]
    _, z = zorder_value(df, ["a", "b"], bits=2, bounds={"a": cuts})
    vals = df.withColumn("z", z).select("z").distinct().count()
    assert vals > 1  # both dimensions contribute
