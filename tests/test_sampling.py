"""Deterministic sampling/splitting: reproducibility, coverage,
growth-stability, and the map-side (no-shuffle) plan contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from connected_component_spark.operators.sampling import (
    hash_sample,
    hash_split,
    stratified_topn,
)

SPLITS = [("train", 0.8), ("valid", 0.1), ("test", 0.1)]


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 5000).withColumnRenamed("id", "k").cache()


def test_hash_sample_fraction_and_determinism(spark, ids):
    got = hash_sample(ids, 0.2, "k", seed=1)
    n = got.count()
    assert abs(n - 1000) < 150  # ~3 sigma for Bernoulli(0.2, 5000)
    again = {r.k for r in hash_sample(ids, 0.2, "k", seed=1).collect()}
    assert {r.k for r in got.collect()} == again
    other_seed = {r.k for r in hash_sample(ids, 0.2, "k", seed=2).collect()}
    assert again != other_seed  # seeds give different membership


def test_hash_sample_is_nested(spark, ids):
    """fraction f1 < f2 ⇒ sample(f1) ⊆ sample(f2) at the same seed —
    the property that lets a pipeline scale a sample up without
    resampling from scratch."""
    small = {r.k for r in hash_sample(ids, 0.1, "k", seed=3).collect()}
    big = {r.k for r in hash_sample(ids, 0.3, "k", seed=3).collect()}
    assert small <= big


def test_hash_split_partition_properties(spark, ids):
    rows = hash_split(ids, "k", SPLITS, seed=42).collect()
    by_split = {}
    for r in rows:
        by_split.setdefault(r.split, set()).add(r.k)
    assert set(by_split) == {"train", "valid", "test"}
    assert len(rows) == 5000  # exhaustive
    assert sum(len(v) for v in by_split.values()) == 5000  # exclusive
    assert abs(len(by_split["train"]) - 4000) < 200
    # growth stability: splitting a superset never moves existing keys
    more = spark.range(0, 10000).withColumnRenamed("id", "k")
    bigger = {r.k: r.split for r in hash_split(more, "k", SPLITS, seed=42).collect()}
    for r in rows:
        assert bigger[r.k] == r.split


def test_hash_split_validation(spark, ids):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(ids, "k", [("a", 0.5), ("b", 0.4)])
    with pytest.raises(ValueError, match="already exists"):
        hash_split(ids.withColumn("split", F.lit("x")), "k", SPLITS)
    with pytest.raises(ValueError, match="fraction"):
        hash_sample(ids, 1.5, "k")


def test_sampling_is_map_side(spark, ids):
    """The 100 TB contract: membership is a scan-side predicate —
    no Exchange in either plan."""
    for df in (hash_sample(ids, 0.2, "k"), hash_split(ids, "k", SPLITS)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_stratified_topn_exact(spark):
    df = spark.createDataFrame(
        [(g, i, float((i * 7) % 13)) for g in range(3) for i in range(20)],
        "g long, i long, score double",
    )
    got = stratified_topn(df, "g", 5, "score", tie_break="i")
    rows = got.collect()
    assert len(rows) == 15
    for g in range(3):
        want = sorted(
            [(float((i * 7) % 13), i) for i in range(20)],
            key=lambda t: (-t[0], t[1]),
        )[:5]
        have = sorted(
            [(r.score, r.i) for r in rows if r.g == g],
            key=lambda t: (-t[0], t[1]),
        )
        assert have == want


def test_weighted_mixture_rates_and_determinism(spark):
    from connected_component_spark.operators.sampling import (
        weighted_mixture_sample,
    )

    rows = [(i, "en" if i % 2 == 0 else "zh") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = weighted_mixture_sample(
        df, rates={"en": 1.0, "zh": 0.25}, stratum_col="lang", key_col="doc_id"
    )
    got = {(r["doc_id"], r["lang"]) for r in out.collect()}
    # rate-1.0 stratum is kept wholesale
    assert sum(1 for _, l in got if l == "en") == 200
    # rate-0.25 stratum is roughly a quarter (hash sample, not exact)
    n_zh = sum(1 for _, l in got if l == "zh")
    assert 20 <= n_zh <= 80
    # strata without a rate default to dropped
    df2 = df.withColumn("lang", df.lang.substr(1, 2))
    out2 = weighted_mixture_sample(
        df2, rates={"en": 1.0}, stratum_col="lang", key_col="doc_id"
    )
    assert {l for _, l in ((r["doc_id"], r["lang"]) for r in out2.collect())} == {"en"}
    # same inputs => identical membership on a rerun
    again = {
        (r["doc_id"], r["lang"])
        for r in weighted_mixture_sample(
            df, rates={"en": 1.0, "zh": 0.25}, stratum_col="lang", key_col="doc_id"
        ).collect()
    }
    assert again == got


def test_cluster_safe_split_leakage_property(spark, sf_dir):
    """The eval-contamination guard (r8): splitting by CLUSTER hash
    means (a) every cluster lands wholly in one split, and (b) zero
    verified near-dup pairs cross a split boundary — the pairs the
    id-keyed split's decontamination audit exists to catch."""
    from pyspark.sql import functions as F

    from connected_component_spark.operators import dedup as dd
    from connected_component_spark.operators.sampling import (
        cluster_safe_split,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clusters = dd.minhash_dedup_clusters(docs, 16, 4, threshold=0.5)
    split = cluster_safe_split(
        clusters, [("train", 0.8), ("valid", 0.1), ("test", 0.1)], seed=42
    )
    # (a) one split per cluster
    spans = (
        split.groupBy("cluster")
        .agg(F.countDistinct("split").alias("n"))
        .where("n > 1")
        .count()
    )
    assert spans == 0
    # (b) no verified near-dup pair straddles a boundary
    sigs = dd.minhash_signatures(docs, 16)
    pairs = dd.jaccard_pairs(docs, dd.lsh_candidate_pairs(sigs, 4, 4)).where(
        "jaccard >= 0.5"
    )
    sa = split.select(F.col("doc_id").alias("a"), F.col("split").alias("sa"))
    sb = split.select(F.col("doc_id").alias("b"), F.col("split").alias("sb"))
    crossing = (
        pairs.join(sa, "a").join(sb, "b").where("sa <> sb").count()
    )
    assert crossing == 0
    # sanity: all three splits materialize and train dominates
    counts = {r["split"]: r["n"] for r in
              split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "valid", "test"}
    assert counts["train"] > counts["valid"] and counts["train"] > counts["test"]


def test_shuffled_shards_permutation_properties(spark, sf_dir):
    """r8 export shuffle: total permutation (every row exactly one
    (shard, pos); positions 1..n_k contiguous per shard), determinism
    across runs, independence across seeds, and the plan shape — the
    window is PARTITIONED by shard (one hash shuffle, never a global
    single-partition sort)."""
    from pyspark.sql import functions as F

    from connected_component_spark.operators.sampling import (
        shuffled_shards,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    n = docs.count()
    out = shuffled_shards(docs, n_shards=8, key_col="doc_id", seed=3)
    rows = out.collect()
    assert len(rows) == n
    per_shard = {}
    for r in rows:
        per_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(per_shard) <= set(range(8))
    for positions in per_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # deterministic: identical assignment on a re-run
    again = {(r["doc_id"], r["shard"], r["pos"]) for r in
             shuffled_shards(docs, 8, "doc_id", seed=3).collect()}
    assert again == {(r["doc_id"], r["shard"], r["pos"]) for r in rows}
    # a fresh seed reshuffles (epoch semantics): most docs move
    other = {r["doc_id"]: (r["shard"], r["pos"]) for r in
             shuffled_shards(docs, 8, "doc_id", seed=4).collect()}
    same = sum(1 for r in rows if other[r["doc_id"]] == (r["shard"], r["pos"]))
    assert same < n * 0.2
    # not pathologically skewed: every shard gets something at n=500
    assert len(per_shard) == 8
    # plan: the sort is partitioned — no SinglePartition exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    import pytest

    with pytest.raises(ValueError, match="n_shards"):
        shuffled_shards(docs, 0, "doc_id")


def test_temperature_sample_flattens_the_head(spark, sf_dir):
    """r8 α=0.5 temperature rebalance: smaller strata keep a HIGHER
    fraction than larger ones (the flattening that stops big domains
    drowning small ones), the total lands near the N/2 target, the
    thresholds are pure integers, and the predicate is scan-side
    (CASE on the stratum column — no join, no extra shuffle)."""
    from connected_component_spark.operators.sampling import (
        SPLIT_DENOM,
        temperature_sample,
        temperature_thresholds,
    )

    # a SKEWED synthetic corpus: the fixture's 20 sources are all the
    # same size, which made every threshold equal and the monotonicity
    # assertion vacuous (review r8) — plain proportional sampling
    # would have passed.  Sizes 400/90/10 make flattening observable.
    rows = [(i, f"doc {i} text", "big") for i in range(400)]
    rows += [(400 + i, f"doc b{i}", "mid") for i in range(90)]
    rows += [(490 + i, f"doc s{i}", "small") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    thr = temperature_thresholds(docs, "source", 1, 2)
    counts = {"big": 400, "mid": 90, "small": 10}
    assert set(thr) == set(counts)
    assert all(isinstance(t, int) and 0 <= t <= SPLIT_DENOM for t in thr.values())
    # flattening: keep-rate STRICTLY decreases as stratum size grows —
    # proportional sampling (equal thresholds) must fail this
    assert thr["small"] > thr["mid"] > thr["big"], thr
    # the tiny stratum's raw rate exceeds 1 and is capped at DENOM
    # (kept whole — exactly what temperature sampling is FOR)
    assert thr["small"] == SPLIT_DENOM, thr
    # α=0.5 exactly on the uncapped pair: rate ∝ sqrt(n)/n ⇒
    # mid/big keep-rate ratio = sqrt(400/90) ≈ 2.11 (floors aside)
    assert 1.95 <= thr["mid"] / thr["big"] <= 2.25, thr
    # target: expected kept = sum(n_i * thr_i / DENOM) tracks N/2 —
    # within 10% here (the capped stratum's surplus is NOT
    # redistributed, so capping loses a little mass vs the target);
    # the realized hash sample sits within ±25% of the expectation
    n_total = sum(counts.values())
    kept = temperature_sample(docs, "source", "doc_id", 1, 2, seed=5).count()
    expected = sum(counts[s] * thr[s] / SPLIT_DENOM for s in counts)
    assert abs(expected - n_total / 2) <= 0.10 * n_total, expected
    assert 0.75 * expected <= kept <= 1.25 * expected
    # determinism
    again = temperature_sample(docs, "source", "doc_id", 1, 2, seed=5).count()
    assert again == kept
    # plan: no join (the threshold table folded into a CASE)
    plan = (
        temperature_sample(docs, "source", "doc_id", 1, 2, seed=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan


def test_temperature_sample_null_stratum_gets_computed_threshold(spark):
    """advice r9: a NULL stratum's threshold folds into an isNull()
    CASE branch — previously the equality never matched, so NULL rows
    silently got the default (0 → dropped) while the reported table
    claimed the computed value."""
    from connected_component_spark.operators.sampling import (
        _bucket,
        temperature_sample,
        temperature_thresholds,
        threshold_case,
    )

    rows = [(i, "doc", "a") for i in range(60)]
    rows += [(100 + i, "doc", None) for i in range(60)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    thr = temperature_thresholds(docs, "source", 1, 2)
    assert None in thr and thr[None] > 0
    # the reported threshold for NULL rows is the computed one
    reported = (
        docs.withColumn("t", threshold_case(thr, "source"))
        .where(F.col("source").isNull())
        .select("t")
        .distinct()
        .collect()
    )
    assert [r.t for r in reported] == [thr[None]]
    # and the filter actually applies it: kept NULL rows == the rows
    # whose hash bucket clears thr[None] (nonzero by construction)
    kept = temperature_sample(
        docs, "source", "doc_id", seed=5, thresholds=thr
    )
    null_kept = kept.where(F.col("source").isNull()).count()
    expected = (
        docs.where(F.col("source").isNull())
        .where(_bucket("doc_id", 5) < F.lit(thr[None]))
        .count()
    )
    assert null_kept == expected > 0


def test_shuffled_shards_sql_rejects_bad_shard_count():
    """advice r9: the SQL twin fails as loudly as the DataFrame API
    instead of binding a modulo-by-zero query."""
    from connected_component_spark.operators.sampling import (
        shuffled_shards_sql,
    )

    for bad in (0, -3):
        with pytest.raises(ValueError, match="n_shards"):
            shuffled_shards_sql("doc_id", bad)
