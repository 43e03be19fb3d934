"""Distributed prefix sum / sequence packing: differential vs the
single-window formulation + the no-single-partition plan contract."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from connected_component_spark.operators.packing import (
    concat_pack,
    exclusive_prefix_sum,
)


def _docs(spark, n=500, seed=11):
    rng = random.Random(seed)
    rows = [(i, rng.randint(1, 400)) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_prefix_sum_matches_global_window(spark):
    docs = _docs(spark)
    got = {
        r.doc_id: r.prefix
        for r in exclusive_prefix_sum(docs, "n_tokens", "doc_id").collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r.doc_id: r.p
        for r in docs.withColumn(
            "p", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        ).collect()
    }
    assert got == want


def test_prefix_sum_no_single_partition_exchange(spark):
    """The point of the two-pass formulation: no global-order window,
    so no Exchange SinglePartition anywhere in the plan."""
    docs = _docs(spark)
    plan = (
        exclusive_prefix_sum(docs, "n_tokens", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan, plan


def test_concat_pack_invariants(spark):
    docs = _docs(spark, n=300)
    ctx = 512
    rows = sorted(
        concat_pack(docs, "n_tokens", "doc_id", ctx).collect(),
        key=lambda r: r.doc_id,
    )
    # placement = running prefix: recompute sequentially and compare
    acc = 0
    for r in rows:
        assert r.seq_id == acc // ctx and r.seq_offset == acc % ctx, r
        acc += r.n_tokens
    # seq_ids are dense from 0
    assert rows[0].seq_id == 0
    assert max(r.seq_id for r in rows) == (acc - rows[-1].n_tokens) // ctx
