"""Deterministic sampling and dataset splitting.

Training pipelines need samples and train/valid/test splits that are
(a) reproducible across runs and engines — re-running the pipeline
tomorrow, or auditing it in another system, must yield the SAME
membership — and (b) stable under data growth: adding new rows never
reshuffles old rows between splits.  Random `df.sample` gives
neither.  The standard answer is content hashing: a row's bucket is
a pure function of its key, via the portable md5-derived hash64
(functions/hashing.py), so every operator here has an exact DuckDB
SQL twin and membership is auditable by hash.

All expressions are Catalyst built-ins; map-side only (no shuffle) —
sampling 100 TB is a scan, as it should be.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from connected_component_spark.functions.hashing import (
    seeded_hash64,
    seeded_hash64_sql,
)

__all__ = [
    "SPLIT_DENOM",
    "hash_sample",
    "hash_split",
    "hash_split_case_sql",
    "weighted_mixture_sample",
    "split_bucket_sql",
    "stratified_topn",
    "cluster_safe_split",
    "shuffled_shards",
    "shuffled_shards_sql",
    "temperature_thresholds",
    "temperature_sample",
    "threshold_case",
    "token_budget_selection",
]

#: bucket resolution: fractions are exact multiples of 1/SPLIT_DENOM
SPLIT_DENOM = 1_000_000


def _bucket(key_col: str, seed: int) -> Column:
    return seeded_hash64(F.col(key_col).cast("string"), seed) % F.lit(SPLIT_DENOM)


def split_bucket_sql(key_expr: str, seed: int) -> str:
    """DuckDB twin of the bucket expression both operators assign
    membership from."""
    return f"({seeded_hash64_sql(f'CAST({key_expr} AS VARCHAR)', seed)}) % {SPLIT_DENOM}"


def hash_sample(
    df: DataFrame, fraction: float, key_col: str, seed: int = 0
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose key bucket
    falls below ``fraction * SPLIT_DENOM``.  Same key ⇒ same verdict,
    every run, every engine; disjoint seeds give independent samples.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"hash_sample fraction must be in [0, 1], got {fraction}")
    # round, not truncate: int(0.7 * 1e6) == 699999 from float error,
    # silently shaving the documented boundary by one bucket
    return df.where(_bucket(key_col, seed) < round(fraction * SPLIT_DENOM))


def weighted_mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    key_col: str,
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the mixture-weights knob
    of corpus assembly: each source/language/domain is downsampled at
    its own rate (e.g. web 10%, books 100%) by the same portable hash
    bucket as :func:`hash_sample`, so membership is a pure function of
    the key, stable under reruns, appends, and engine changes.  Strata
    absent from ``rates`` fall back to ``default_rate`` (0 = dropped).

    Scale shape: one scan with a scan-side predicate — the rate table
    folds into a CASE expression on the stratum column, so there is no
    join, no shuffle, and the filter sits directly on the source.
    """
    for name, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {name!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    threshold = None
    for name, r in rates.items():
        cond = F.col(stratum_col) == F.lit(name)
        val = F.lit(round(r * SPLIT_DENOM))
        threshold = (
            F.when(cond, val) if threshold is None else threshold.when(cond, val)
        )
    default = F.lit(round(default_rate * SPLIT_DENOM))
    threshold = default if threshold is None else threshold.otherwise(default)
    return df.where(_bucket(key_col, seed) < threshold)


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: list[tuple[str, float]],
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a split label by hash bucket: cumulative
    weight ranges over ``[0, SPLIT_DENOM)``.  Exhaustive and mutually
    exclusive by construction; weights must sum to 1.  Membership is
    per-key, so duplicate keys land in the same split (no leakage by
    row duplication) and appending new data never moves old keys.
    """
    total = sum(w for _, w in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"hash_split weights must sum to 1, got {total}")
    if out_col in df.columns:
        raise ValueError(f"hash_split output column {out_col!r} already exists")
    b = _bucket(key_col, seed)
    expr = None
    cum = 0.0
    for name, w in splits[:-1]:
        cum += w
        cond = b < round(cum * SPLIT_DENOM)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def cluster_safe_split(
    assignments: DataFrame,
    splits: list[tuple[str, float]],
    cluster_col: str = "cluster",
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/valid/test split: :func:`hash_split` keyed
    on the near-dup CLUSTER id instead of the document id, so every
    cluster lands wholly in one split — the eval-contamination guard
    (a val/test document can never have a near-duplicate in train,
    because its near-duplicates are BY DEFINITION in its cluster).

    ``assignments`` is the (id, cluster) table a clustering pass
    produces (minhash_dedup_clusters, embedding near-dup CC,
    semantic_dedup) — the reference's CC algorithm is exactly what
    makes this split sound: transitive closure means A≈B≈C all share
    one cluster even when A and C aren't directly similar, so no
    near-dup chain can straddle a split boundary.

    Scale shape: the split label is a map-side CASE over a hash of
    the cluster column — zero additional shuffle on top of the
    clustering pass.

    Stability caveat (review r8): within ONE clustering, membership
    is a pure function of the cluster id.  Re-clustering after
    appends can MERGE clusters (a new document bridging two old
    ones), and the merged component takes the minimum id — re-keying
    every member of the higher-id cluster.  The leakage guarantee
    still holds at every point in time (a cluster always moves AS A
    WHOLE), but a merged cluster may land in a different split than
    its parts did before the merge; pipelines that must pin old docs
    to old splits should freeze the clustering snapshot they split
    on."""
    return hash_split(
        assignments, cluster_col, splits, seed=seed, out_col=out_col
    )


def shuffled_shards(
    df: DataFrame,
    n_shards: int,
    key_col: str,
    seed: int = 0,
) -> DataFrame:
    """Deterministic global shuffle into training shards: every row
    gets (shard, pos) from a hash of its key — the export step that
    turns a curated corpus into trainer-ready shards whose within-
    and across-shard order is pseudo-random yet exactly reproducible
    (re-running the export, or auditing it in another engine, yields
    the SAME permutation; a fresh ``seed`` gives an independent
    epoch-style reshuffle).

    Scale shape: ONE hash-partition shuffle on the shard id + a
    per-shard sort (the window is partitioned — never a global
    single-partition sort); at 100 TB each shard sorts independently
    on its executors.  Ties between equal hashes break by key, so the
    permutation is total and engine-independent."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    # withColumn would silently OVERWRITE pre-existing output columns
    # (e.g. re-exporting an already-sharded frame), and the SQL twin
    # would emit duplicates — refuse loudly instead (review r8)
    for c in ("_h", "shard", "pos"):
        if c in df.columns:
            raise ValueError(
                f"shuffled_shards output column {c!r} already exists on "
                "the input — drop or rename it first"
            )
    from pyspark.sql import Window

    h = seeded_hash64(F.col(key_col).cast("string"), seed)
    with_shard = df.withColumn("_h", h).withColumn(
        "shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("_h", key_col)
    return (
        with_shard.withColumn(
            # long, not int: a 100 TB shard can hold >2^31 rows
            "pos", F.row_number().over(w).cast("long")
        )
        .drop("_h")
    )


def shuffled_shards_sql(
    key_expr: str, n_shards: int, seed: int = 0, source: str = "documents"
) -> str:
    """DuckDB twin of :func:`shuffled_shards` (pmod semantics: the
    md5-derived hash64 is non-negative, so plain ``%`` agrees).

    Same guards as the DataFrame side (advice r9): ``n_shards < 1``
    raises here instead of binding a modulo-by-zero query, and the
    ``SELECT *`` means a ``source`` already carrying ``_h``/``shard``/
    ``pos`` columns would emit silent duplicates — callers must feed a
    source without the reserved names, exactly as :func:`shuffled_shards`
    enforces on its input DataFrame (checked there because only the
    DataFrame side can see the schema; the SQL twin states the
    contract)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = seeded_hash64_sql(f"CAST({key_expr} AS VARCHAR)", seed)
    return f"""
SELECT * EXCLUDE (_h),
       CAST(row_number() OVER (PARTITION BY shard ORDER BY _h, {key_expr})
            AS BIGINT) AS pos
FROM (
  SELECT *, {h} AS _h, CAST(({h}) % {n_shards} AS INTEGER) AS shard
  FROM {source}
)
"""


def temperature_thresholds(
    df: DataFrame,
    stratum_col: str,
    target_num: int = 1,
    target_den: int = 2,
) -> dict[str | None, int]:
    """Per-stratum keep thresholds for TEMPERATURE sampling at
    α = 0.5 — the standard multilingual/domain rebalancing: stratum i
    is drawn with probability ∝ n_i^α, flattening the head so small
    languages/domains aren't drowned out, sized to a target corpus of
    T = N·target_num/target_den rows.

    α is fixed at 0.5 because sqrt is the one power that is exactly
    portable (single correctly-rounded IEEE op in Python, Spark and
    DuckDB; pow() is not correctly rounded).  Everything after the
    sqrt is INTEGER arithmetic: w9 = floor(sqrt(n)·1e9), threshold =
    min(DENOM, T·w9·DENOM // (W9·n)) — computed in Python bigints
    here, replayable in HUGEINT by the oracle, with no float
    comparison anywhere near a keep/drop boundary.

    Driver cost: one collect of the #strata-row count table (the
    k-centroids class of bounded collect)."""
    import math

    if target_num < 0 or target_den <= 0:
        raise ValueError(
            f"target fraction must be >= 0, got {target_num}/{target_den}"
        )
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n")).collect()
    n_by = {r[stratum_col]: int(r["n"]) for r in counts}
    total = sum(n_by.values())
    target = (total * target_num) // target_den
    w9 = {s: math.floor(math.sqrt(n) * 1e9) for s, n in n_by.items()}
    w9_total = sum(w9.values())
    return {
        s: min(
            SPLIT_DENOM,
            (target * w9[s] * SPLIT_DENOM) // (w9_total * n),
        )
        for s, n in n_by.items()
    }


def threshold_case(
    thr: dict[str | None, int], stratum_col: str, default_threshold: int = 0
) -> Column:
    """Fold a stratum → integer-threshold table into a scan-side CASE
    expression (shared by :func:`temperature_sample` and the declared
    report query, so the reported threshold is definitionally the one
    the predicate filters on).

    A ``None`` key (``temperature_thresholds`` emits one when the
    corpus has NULL strata — GROUP BY keeps the NULL group) folds into
    an ``isNull()`` branch rather than an equality that never matches
    (advice r9): previously NULL-stratum rows silently got
    ``default_threshold`` while the threshold table claimed the
    computed value."""
    expr = None
    for name, t in thr.items():
        cond = (
            F.col(stratum_col).isNull()
            if name is None
            else F.col(stratum_col) == F.lit(name)
        )
        expr = (
            F.when(cond, F.lit(t)) if expr is None else expr.when(cond, F.lit(t))
        )
    default = F.lit(default_threshold)
    return default if expr is None else expr.otherwise(default)


def temperature_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    target_num: int = 1,
    target_den: int = 2,
    seed: int = 0,
    thresholds: dict[str | None, int] | None = None,
    default_threshold: int = 0,
) -> DataFrame:
    """Apply :func:`temperature_thresholds` as a scan-side predicate:
    keep rows whose hash bucket falls under their stratum's integer
    threshold.  Like weighted_mixture_sample the rate table folds into
    a CASE on the stratum column — no join, no shuffle, membership a
    pure function of the key.

    ``default_threshold`` (in [0, SPLIT_DENOM]) governs strata absent
    from a caller-supplied ``thresholds`` table (a NULL stratum is
    NOT "absent" when the table carries a ``None`` key — it folds
    into an ``isNull()`` branch, advice r9): the default 0 drops
    unknown strata, SPLIT_DENOM keeps them whole — pick explicitly
    when replaying stale thresholds against a corpus that may have
    grown new
    sources (review r8)."""
    thr = (
        thresholds
        if thresholds is not None
        else temperature_thresholds(df, stratum_col, target_num, target_den)
    )
    expr = threshold_case(thr, stratum_col, default_threshold)
    return df.where(_bucket(key_col, seed) < expr)


def hash_split_case_sql(key_expr: str, splits: list[tuple[str, float]], seed: int = 0) -> str:
    """DuckDB CASE twin of :func:`hash_split`'s label expression."""
    b = split_bucket_sql(key_expr, seed)
    whens = []
    cum = 0.0
    for name, w in splits[:-1]:
        cum += w
        whens.append(f"WHEN {b} < {round(cum * SPLIT_DENOM)} THEN '{name}'")
    return "CASE " + " ".join(whens) + f" ELSE '{splits[-1][0]}' END"


def stratified_topn(
    df: DataFrame,
    strata: str | list[str],
    n: int,
    order_col: str,
    descending: bool = True,
    tie_break: str | None = None,
    keep_rank: str | None = None,
) -> DataFrame:
    """Exact-n-per-stratum deterministic sample: the top ``n`` rows of
    each stratum by ``order_col`` (ties broken by ``tie_break``, which
    must be unique within a stratum for a deterministic result).
    One shuffle on the strata keys — the balanced-subset primitive
    (per-language caps, per-source caps) of corpus assembly.
    ``keep_rank`` exposes the within-stratum rank as a long column of
    that name, so callers that need it don't recompute the window."""
    from pyspark.sql import Window

    keys = [strata] if isinstance(strata, str) else list(strata)
    order = [F.col(order_col).desc() if descending else F.col(order_col).asc()]
    if tie_break:
        order.append(F.col(tie_break).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    out = df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= n)
    if keep_rank:
        return out.withColumn(keep_rank, F.col("__rn").cast("long")).drop("__rn")
    return out.drop("__rn")


def token_budget_selection(
    df: DataFrame,
    size_col: str,
    order_exprs: list,
    budget: int,
    cum_col: str = "cum_tokens",
    selected_col: str = "selected",
) -> DataFrame:
    """Greedy prefix selection under a global size budget — the data
    -selection primitive of budgeted pretraining ("take the best
    documents until the token budget is spent"): rows are ranked by
    ``order_exprs`` (a total order — supply a unique tie-break), the
    running inclusive sum of ``size_col`` is computed, and a row is
    selected iff its inclusive cumulative size fits within ``budget``.

    Prefix semantics (the row that overflows the budget and everything
    after it is excluded), NOT knapsack backfill: the selected set is
    a deterministic pure function of the ranking, reproducible and
    auditable in any engine — the property a training-data freeze
    needs.

    Scale shape: the ranking is a range partition (never a global
    single-partition sort) and the running sum is the two-pass
    distributed prefix sum of operators/packing.py — per-partition
    window cumsum plus an O(#partitions) broadcast of partition
    offsets.  At 100 TB this is one range shuffle.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    # the output select is ``*df.columns + cum_col + selected_col`` —
    # an input already carrying one of those names (or the internal
    # prefix column) would yield duplicate / silently clobbered
    # columns downstream; refuse loudly, same contract as
    # :func:`shuffled_shards` (review r9 / advice r10)
    out_cols = (cum_col, selected_col, "__tb_excl")
    if len(set(out_cols)) != len(out_cols):
        raise ValueError(
            "token_budget_selection output columns must be distinct, "
            f"got cum_col={cum_col!r} selected_col={selected_col!r}"
        )
    for c in out_cols:
        if c in df.columns:
            raise ValueError(
                f"token_budget_selection output column {c!r} already "
                "exists on the input — drop or rename it first"
            )
    from connected_component_spark.operators.packing import (
        exclusive_prefix_sum_ordered,
    )

    with_prefix = exclusive_prefix_sum_ordered(
        df, size_col, order_exprs, out_col="__tb_excl"
    )
    inclusive = (F.col("__tb_excl") + F.col(size_col)).cast("long")
    return with_prefix.select(
        *df.columns,
        inclusive.alias(cum_col),
        (inclusive <= F.lit(budget)).alias(selected_col),
    )
