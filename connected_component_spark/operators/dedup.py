"""Deduplication operators for LLM-data pipelines.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard near-dedup.  The
clustering step of every near-dedup pipeline is the engine's CC
kernel (candidate pairs = edges → connected components = dup
clusters), exactly the architecture the reference kernel was built
for (SURVEY.md §7.1 M3).

Scale notes (100 TB):

* Shingling/minhashing is a linear scan — pure Catalyst expressions,
  whole-stage codegen, no Python.
* LSH banding turns the O(n²) pair problem into a groupBy on band
  buckets; the per-bucket pair expansion is a self-join on the
  bucket key, so AQE's skew-join splitting handles hot buckets
  (e.g. boilerplate documents).  AQE splits a hot bucket's TASKS but
  cannot shrink its m²/2 pair OUTPUT — for corpora where one bucket
  holds millions of near-identical pages, ``banded_pairs``'s opt-in
  ``max_bucket_size`` valve chains oversized buckets (O(m) pairs,
  connectivity preserved for CC clustering) instead of crossing them.
* Hashes are the portable md5-based family (functions/hashing.py),
  so results are engine-independent and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from connected_component_spark.functions.hashing import affine_hash, hash64
from connected_component_spark.queries.parity import roundd
from connected_component_spark.graph.cc import components_with_isolates
from connected_component_spark.operators.text import tokens

__all__ = [
    "exact_dedup",
    "word_shingles",
    "char_ngrams",
    "minhash_signatures",
    "minhash_from_shingles",
    "banded_buckets",
    "banded_pairs",
    "lsh_candidate_pairs",
    "jaccard_pairs",
    "jaccard_pairs_from_sets",
    "incremental_candidate_pairs",
    "incremental_dedup",
    "classify_batch_matches",
    "ngram_jaccard_pairs",
    "ngram_dedup_clusters",
    "minhash_dedup_clusters",
    "simhash",
    "simhash_near_pairs",
    "substring_dup_stats",
    "winnow_fingerprints",
    "winnow_pairs",
    "winnow_dedup_clusters",
    "winnow_decontaminate",
    "retention_decisions",
]


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup via content hash: one row per distinct text with
    the canonical (minimum) doc_id and the duplicate count."""
    return (
        docs.select(hash64(F.col("text")).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def word_shingles(text_col, k: int = 3):
    """Distinct word k-shingles of a text column (array<string>).

    Sliding window over the whitespace tokens; documents shorter
    than ``k`` tokens contribute their full token string as one
    shingle so they still participate.
    """
    t = tokens(text_col)
    n = F.size(t)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(t, i, k))
        )
    )


def char_ngrams(text_col, n: int = 3):
    """Distinct character n-grams of a text column (array<string>).

    Texts shorter than ``n`` chars contribute the whole text as one
    gram so every document participates in the similarity join.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(c, i, n)))


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    n: int = 3,
    strategy: str = "auto",
    unit: str = "char",
) -> DataFrame:
    """Exact n-gram Jaccard similarity join: every
    (a, b, jaccard) with jaccard ≥ threshold, a < b.

    ``unit="char"`` shingles by character n-grams (tiny vocabulary —
    ~|alphabet|^n — so ``auto`` picks the bitmap strategy);
    ``unit="word"`` shingles by word k-shingles (vocabulary grows
    with the corpus, the regime prefix filtering is built for, so
    ``auto`` routes to prefix naturally).

    Two physical strategies, chosen by vocabulary size when
    ``strategy="auto"`` (one cheap count-distinct action):

    * ``"prefix"`` — prefix filtering (Chaudhuri et al.), the
      standard set-similarity-join pruning for LARGE vocabularies:
      rank each doc's grams by ascending global document frequency
      and join only on the first ``⌊(1-τ)·|g|⌋ + 1`` (rarest) grams;
      any pair with Jaccard ≥ τ must collide inside these prefixes.
      Candidates verified exactly with ``array_intersect``.
    * ``"bitmap"`` — dense dictionary-GEMM for SMALL vocabularies
      (≤ ``_BITMAP_MAX_VOCAB`` distinct grams), where prefix
      filtering degenerates (every pair shares a 'rare' gram): encode
      each doc as a 0/1 vector over the gram dictionary; intersection
      counts for a block pair of docs are one numpy matmul; Jaccard
      derived from exact integer counts so results are
      engine-identical.  Per-task memory is bounded by block size;
      the shuffle carries only gid lists and surviving pairs.
    """
    # gram extraction (substring explosion) is the most expensive
    # narrow pass — materialize it ONCE and derive dictionary,
    # postings, and verify sets from the checkpoint.  (At cluster
    # scale this would be persist(MEMORY_AND_DISK) + unpersist.)
    if unit == "word":
        gram_expr = word_shingles(F.col("text"), n)
    elif unit == "char":
        gram_expr = char_ngrams(F.col("text"), n)
    else:
        raise ValueError(f"unit must be 'char' or 'word', got {unit!r}")
    grams = docs.select("doc_id", gram_expr.alias("g")).localCheckpoint(
        eager=True
    )
    vocab = None
    if strategy == "auto":
        vocab = (
            grams.select(F.explode("g").alias("gram")).agg(F.countDistinct("gram"))
        ).first()[0]
        strategy = "bitmap" if vocab <= _BITMAP_MAX_VOCAB else "prefix"
    if strategy == "bitmap":
        return _ngram_jaccard_bitmap(grams, threshold, vocab=vocab)
    return _ngram_jaccard_prefix(grams, threshold)


_BITMAP_MAX_VOCAB = 4096


def _ngram_jaccard_prefix(grams: DataFrame, threshold: float) -> DataFrame:
    from pyspark.sql import Window

    sets = grams.select("doc_id", "g", F.size("g").alias("sz"))
    posting = grams.select("doc_id", F.explode("g").alias("gram"))
    df_counts = posting.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))

    # rank each doc's grams rarest-first; keep the Jaccard prefix

    w = Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("gram").asc())
    # the prefix table appears on BOTH sides of the candidate
    # self-join; without a checkpoint each side re-runs the df-count
    # aggregate + rank window + size join (measured 3-4x the whole
    # query's cost at 500 docs).  Same persist-at-cluster-scale note
    # as the grams checkpoint above.
    prefix = (
        posting.join(df_counts, "gram")
        .withColumn("rn", F.row_number().over(w))
        .join(sets.select("doc_id", "sz"), "doc_id")
        .where(
            F.col("rn")
            <= F.floor((1.0 - F.lit(threshold)) * F.col("sz")).cast("int") + 1
        )
        .select("doc_id", "gram")
        .localCheckpoint(eager=False)
    )
    cand = (
        prefix.alias("l")
        .join(
            prefix.alias("r"),
            (F.col("l.gram") == F.col("r.gram"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )
    # verify: set sizes ride as precomputed ints (not re-derived from
    # the shuffled arrays), and the intersection COUNT row
    # (a, b, sz_a, sz_b, ni — ids and ints only, arrays dropped) is
    # materialized once: array_intersect over string arrays is the
    # expensive expression here, and without the barrier the
    # filter-through-project collapse evaluates it twice (measured 2x
    # the whole verify cost); the checkpoint also keeps the final
    # jaccard+threshold stage free to re-optimize
    ni = F.size(F.array_intersect("g_a", "g_b"))
    counted = (
        cand.join(
            sets.select(
                F.col("doc_id").alias("a"),
                F.col("g").alias("g_a"),
                F.col("sz").alias("sz_a"),
            ),
            "a",
        )
        .join(
            sets.select(
                F.col("doc_id").alias("b"),
                F.col("g").alias("g_b"),
                F.col("sz").alias("sz_b"),
            ),
            "b",
        )
        .select("a", "b", "sz_a", "sz_b", ni.alias("ni"))
        .localCheckpoint(eager=False)
    )
    return (
        counted.select(
            "a",
            "b",
            roundd(
                F.col("ni") / (F.col("sz_a") + F.col("sz_b") - F.col("ni")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= F.lit(threshold))
    )


def _ngram_jaccard_bitmap(
    grams: DataFrame,
    threshold: float,
    doc_blocks: int = 8,
    vocab: int | None = None,
) -> DataFrame:
    """Dense dictionary-GEMM set-similarity join (see
    :func:`ngram_jaccard_pairs`).  Exact: intersection sizes are
    integer counts out of a float32 matmul (exact below 2^24), and
    the Jaccard division + rounding happen in Catalyst with the same
    expression the oracle uses."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    posting = grams.select("doc_id", F.explode("g").alias("gram"))
    # global gram dictionary; single-partition window is fine — the
    # bitmap strategy is only chosen when the vocabulary is tiny
    dic = (
        posting.select("gram")
        .distinct()
        .select(
            "gram",
            (F.row_number().over(Window.orderBy("gram")) - 1).alias("gid"),
        )
    )
    if vocab is None:
        vocab = dic.count()
    gids = (
        posting.join(F.broadcast(dic), "gram")
        .groupBy("doc_id")
        .agg(F.collect_list("gid").alias("gids"))
    )
    # materialize the block rows ONCE: the self-crossJoin below would
    # otherwise execute the whole posting->dic->gids chain twice
    blocks = (
        gids.withColumn("blk", F.pmod(F.xxhash64("doc_id"), F.lit(doc_blocks)))
        .groupBy("blk")
        .agg(F.collect_list(F.struct("doc_id", "gids")).alias("items"))
        .localCheckpoint(eager=False)
    )
    n_pairs = doc_blocks * (doc_blocks + 1) // 2
    pairs = (
        blocks.alias("l")
        .crossJoin(blocks.alias("r"))
        .where(F.col("l.blk") <= F.col("r.blk"))
        .select(
            (F.col("l.blk") == F.col("r.blk")).alias("same_blk"),
            F.col("l.items").alias("litems"),
            F.col("r.items").alias("ritems"),
        )
        # one block pair per task — the checkpointed block table is a
        # single partition, so without this every GEMM runs serially
        # in one Python worker
        .repartition(n_pairs)
    )
    # loose numpy pre-filter; the exact rounded filter runs in Catalyst
    tau = threshold - 1e-6

    def gemm(batches):
        for pdf in batches:
            out_a, out_b, out_c, out_sa, out_sb = [], [], [], [], []
            for same_blk, litems, ritems in zip(
                pdf["same_blk"], pdf["litems"], pdf["ritems"]
            ):
                la = np.fromiter((x["doc_id"] for x in litems), dtype=np.int64)
                ra = np.fromiter((x["doc_id"] for x in ritems), dtype=np.int64)
                X = np.zeros((len(la), vocab), dtype=np.float32)
                Y = np.zeros((len(ra), vocab), dtype=np.float32)
                for i, x in enumerate(litems):
                    X[i, np.asarray(x["gids"], dtype=np.int64)] = 1.0
                for j, y in enumerate(ritems):
                    Y[j, np.asarray(y["gids"], dtype=np.int64)] = 1.0
                C = X @ Y.T
                sa = X.sum(axis=1)
                sb = Y.sum(axis=1)
                jac = C / (sa[:, None] + sb[None, :] - C)
                if same_blk:
                    # each unordered pair appears as (x,y) and (y,x);
                    # the id-order filter keeps exactly one
                    keep = (jac >= tau) & (la[:, None] < ra[None, :])
                else:
                    # distinct blocks meet exactly once — keep every
                    # cross pair, canonicalize ids below
                    keep = jac >= tau
                ii, jj = np.nonzero(keep)
                aa, bb = la[ii], ra[jj]
                lo = np.minimum(aa, bb)
                hi = np.maximum(aa, bb)
                out_a.extend(lo)
                out_b.extend(hi)
                out_c.extend(C[ii, jj].astype(np.int64))
                out_sa.extend(sa[ii].astype(np.int64))
                out_sb.extend(sb[jj].astype(np.int64))
            yield pd.DataFrame(
                {
                    "a": pd.Series(out_a, dtype="int64"),
                    "b": pd.Series(out_b, dtype="int64"),
                    "n_common": pd.Series(out_c, dtype="int64"),
                    "sz_a": pd.Series(out_sa, dtype="int64"),
                    "sz_b": pd.Series(out_sb, dtype="int64"),
                }
            )

    raw = pairs.mapInPandas(
        gemm, schema="a long, b long, n_common long, sz_a long, sz_b long"
    )
    # sz_a/sz_b follow the (litems, ritems) orientation, but Jaccard
    # is symmetric in them, so canonicalized (a, b) stays exact
    return (
        raw.select(
            "a",
            "b",
            roundd(
                F.col("n_common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= F.lit(threshold))
    )


def ngram_dedup_clusters(
    docs: DataFrame, n: int = 3, threshold: float = 0.5, max_iterations: int = 20
) -> DataFrame:
    """n-gram-Jaccard near-dedup: pairs ≥ threshold become edges; the
    CC kernel clusters the paired subgraph only, and docs touching
    no pair are attached as singletons by one anti join
    (graph/cc.py:components_with_isolates) — the kernel never
    iterates over the unpaired majority of the corpus."""
    edges = ngram_jaccard_pairs(docs, threshold, n).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    return components_with_isolates(
        edges, docs, "doc_id", max_iterations=max_iterations
    ).select(F.col("node").alias("doc_id"), F.col("component").alias("cluster"))


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 16, shingle_k: int = 3
) -> DataFrame:
    """(doc_id, sig array<long>) MinHash signature per document.

    sig[i] = min over shingles of h_i(shingle), where h_i is the
    affine family over ONE md5 base hash per shingle (16 hashes cost
    1 md5 + integer arithmetic — md5 dominates otherwise).  Computed
    by explode → groupBy(doc) with ``num_hashes`` min() aggregates —
    one shuffle, map-side partial aggregation, no arrays on the wire.
    """
    # NOT routed through minhash_from_shingles: the fused
    # explode(word_shingles(text)) projection measures ~1.8x faster
    # than project-array-then-explode on the batch path (r13 bench
    # regression, reverted) — the two-step form exists only for
    # streaming folds that hold a MATERIALIZED shingle leaf
    sh = docs.select(
        "doc_id",
        F.explode(word_shingles(F.col("text"), shingle_k)).alias("shingle"),
    ).select("doc_id", hash64(F.col("shingle")).alias("base"))
    return _minhash_aggs(sh, num_hashes)


def minhash_from_shingles(
    shingled: DataFrame, num_hashes: int = 16
) -> DataFrame:
    """:func:`minhash_signatures` over an ALREADY-SHINGLED
    ``(doc_id, sh array<string>)`` table — the streaming fold's entry
    point (streaming/dedup.py materializes the shingle table once per
    micro-batch and derives signatures, bands, and classification from
    that single leaf; r13).  Batch callers holding raw text must use
    :func:`minhash_signatures` (see the perf note there)."""
    sh = shingled.select(
        "doc_id", F.explode("sh").alias("shingle")
    ).select("doc_id", hash64(F.col("shingle")).alias("base"))
    return _minhash_aggs(sh, num_hashes)


def _minhash_aggs(sh: DataFrame, num_hashes: int) -> DataFrame:
    """Shared signature aggregation over exploded (doc_id, base)."""
    aggs = [
        F.min(affine_hash(F.col("base"), i)).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    per_doc = sh.groupBy("doc_id").agg(*aggs)
    return per_doc.select(
        "doc_id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")
    )


def banded_buckets(
    signatures: DataFrame, bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """(doc_id, band, bucket) LSH band-bucket table: docs agreeing on
    all rows of any band share that band's bucket hash."""
    return signatures.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        hash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", b * rows_per_band + r + 1)
                                    .cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: pairs are generated
    by a self-join on (band, bucket_hash).  Returns distinct (a, b)
    with a < b.  ``max_bucket_size``: see :func:`banded_pairs`."""
    return banded_pairs(
        banded_buckets(signatures, bands, rows_per_band),
        max_bucket_size=max_bucket_size,
    )


def banded_pairs(
    banded: DataFrame, max_bucket_size: int | None = None
) -> DataFrame:
    """Distinct (a, b), a < b, from a (doc_id, band, bucket) band
    table — the self-join half of :func:`lsh_candidate_pairs`, split
    out so callers holding a materialized band table (streaming
    state) don't recompute signatures.

    ``max_bucket_size`` is the hot-bucket valve for boilerplate-heavy
    corpora: a bucket of m members normally contributes m·(m-1)/2
    pairs, so ONE mega-bucket (millions of near-identical template
    pages landing in the same band hash) turns the self-join
    quadratic — the classic 100 TB LSH failure.  Buckets larger than
    the cap are CHAINED instead of crossed: members sorted by doc_id
    are linked consecutively (a→b→c), m-1 pairs, which preserves the
    bucket's CONNECTIVITY for CC-based clustering (every member still
    reaches every other through the chain when verification accepts
    the links) at O(m) cost.  Tradeoff, stated plainly: downstream
    Jaccard verification sees only chain pairs for capped buckets, so
    a cluster can split where consecutive members fail the threshold
    but some non-adjacent pair would have passed — acceptable for
    near-identical mega-buckets (links are near-certain to verify),
    wrong for pair-ENUMERATION semantics; hence opt-in, default None
    (exact all-pairs, current behavior)."""
    if max_bucket_size is not None and max_bucket_size < 2:
        raise ValueError("max_bucket_size must be >= 2 (or None)")
    left, right = banded.alias("l"), banded.alias("r")
    if max_bucket_size is None:
        return (
            left.join(
                right,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bucket") == F.col("r.bucket"))
                & (F.col("l.doc_id") < F.col("r.doc_id")),
            )
            .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
            .distinct()
        )
    # the capped branch references the band table from four plan
    # positions (sizes agg, both sides of the small self-join, big) —
    # lazily materialize it once or the upstream minhash/banding tree
    # re-evaluates per reference (review r7; the same discipline as
    # the candidate checkpoint in incremental_dedup)
    banded = banded.localCheckpoint(eager=False)
    # bucket sizes via a window count over the checkpointed band table
    # (r15) instead of the previous groupBy + join-back: the window's
    # one (band, bucket) exchange then SATISFIES the downstream
    # distribution requirements — the small-branch self-join and the
    # chain window both cluster on (band, bucket), so they plan with
    # zero additional Exchanges, where the agg+join shape re-shuffled
    # the band table for the join and again for the self-join.  Row
    # values are identical (_bsz is the same per-bucket count).
    sizes_w = Window.partitionBy("band", "bucket")
    with_size = banded.withColumn("_bsz", F.count(F.lit(1)).over(sizes_w))
    small = with_size.where(F.col("_bsz") <= max_bucket_size).drop("_bsz")
    big = with_size.where(F.col("_bsz") > max_bucket_size).drop("_bsz")
    ls, rs = small.alias("l"), small.alias("r")
    small_pairs = (
        ls.join(
            rs,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
    )
    # chain the oversized buckets: one window sort per (band, bucket),
    # linear pairs, no quadratic product anywhere
    w = Window.partitionBy("band", "bucket").orderBy("doc_id")
    chain_pairs = (
        big.withColumn("_prev", F.lag("doc_id").over(w))
        .where(F.col("_prev").isNotNull())
        .select(F.col("_prev").alias("a"), F.col("doc_id").alias("b"))
    )
    return small_pairs.unionByName(chain_pairs).distinct()


def jaccard_pairs(
    docs: DataFrame, pairs: DataFrame, shingle_k: int = 3
) -> DataFrame:
    """Exact Jaccard similarity for given (a, b) pairs: |∩| / |∪| of
    the word-shingle sets, via two joins against the per-doc shingle
    sets (array intersect/union — no re-explode)."""
    sets = docs.select(
        F.col("doc_id"), word_shingles(F.col("text"), shingle_k).alias("sh")
    )
    return jaccard_pairs_from_sets(sets, pairs)


def jaccard_pairs_from_sets(sets: DataFrame, pairs: DataFrame) -> DataFrame:
    """As :func:`jaccard_pairs`, but over a pre-materialized
    (doc_id, sh) shingle-set table — the form a stateful/streaming
    caller keeps as its running state so shingling is never
    recomputed for already-seen documents."""
    # two-step select: the intersection size is computed ONCE and the
    # jaccard derived from the scalar in a second projection — a
    # single select naming array_intersect twice lets Catalyst's
    # project collapse evaluate the expensive set intersection twice
    # per row (same trap documented at the ngram verify stage above)
    return (
        pairs.join(sets.withColumnRenamed("doc_id", "a").withColumnRenamed("sh", "sh_a"), "a")
        .join(sets.withColumnRenamed("doc_id", "b").withColumnRenamed("sh", "sh_b"), "b")
        .select(
            "a",
            "b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("_ni"),
            (F.size("sh_a") + F.size("sh_b")).alias("_nt"),
        )
        .select(
            "a",
            "b",
            roundd(
                F.col("_ni") / (F.col("_nt") - F.col("_ni")), 6
            ).alias("jaccard"),
        )
    )


def minhash_dedup_clusters(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_iterations: int = 20,
) -> DataFrame:
    """Full near-dedup pipeline: minhash → LSH candidates → exact
    Jaccard verify ≥ threshold → **connected components** over the
    verified pairs → (doc_id, cluster) where cluster = min doc_id.

    Docs with no near-dup partner form singleton clusters, attached
    by anti join after the kernel runs on the paired subgraph only
    (graph/cc.py:components_with_isolates).
    """
    rows = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes, shingle_k)
    cand = lsh_candidate_pairs(sigs, bands, rows)
    verified = jaccard_pairs(docs, cand, shingle_k).where(
        F.col("jaccard") >= F.lit(threshold)
    )
    edges = verified.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    return components_with_isolates(
        edges, docs, "doc_id", max_iterations=max_iterations
    ).select(F.col("node").alias("doc_id"), F.col("component").alias("cluster"))


def incremental_candidate_pairs(
    corpus: DataFrame,
    batch: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Candidate (a, b) pairs of :func:`incremental_dedup` BEFORE
    exact-Jaccard verification: corpus×batch pairs from the broadcast
    band join plus batch×batch pairs from the batch-only self-join.
    Exposed so the scale tests can measure the candidate set directly
    (the operator's 100 TB contract is that this count scales with
    the BATCH and stays flat as the corpus grows — a measured curve,
    not just a plan property)."""
    rows = num_hashes // bands
    sig_c = minhash_signatures(corpus, num_hashes, shingle_k)
    sig_b = minhash_signatures(batch, num_hashes, shingle_k)
    banded_c = banded_buckets(sig_c, bands, rows)
    banded_b = banded_buckets(sig_b, bands, rows)
    cross = (
        banded_c.join(
            F.broadcast(banded_b.withColumnRenamed("doc_id", "b_id")),
            ["band", "bucket"],
        )
        .select(F.col("doc_id").alias("a"), F.col("b_id").alias("b"))
        .distinct()
    )
    intra = lsh_candidate_pairs(sig_b, bands, rows)
    return cross.unionByName(intra)


def incremental_dedup(
    corpus: DataFrame,
    batch: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Continuous-ingestion near-dedup: classify each INCOMING batch
    document against an EXISTING (already-deduped) corpus without
    re-pairing the corpus against itself.

    Returns one row per batch doc: (doc_id, status, canonical_doc_id)
    with status ∈ {'dup_of_corpus', 'dup_in_batch', 'novel'} —
    corpus matches win over batch matches, canonical = the minimum
    matching doc_id (own id when novel).  Requires every corpus
    doc_id < every batch doc_id (ingestion order); ENFORCED by a
    lazy in-plan guard (max corpus id vs min batch id) that raises at
    first action on violation — the guard's extra corpus pass reads
    the doc_id column only (column-pruned), a small fraction of the
    doc_id+text scan the minhash step already pays.

    Scale shape (the point of the operator): the corpus×corpus pair
    space is NEVER touched.  The batch's band table is broadcast into
    the corpus band scan — the 100 TB corpus is read once, map-side,
    with zero corpus shuffle — and the batch×batch self-join runs on
    the (small) batch only.  Exact-Jaccard verification then runs on
    candidate pairs alone, per the candidates→verify discipline the
    reference applies to its pair space
    (ConnectedComponent.scala:62-63,135-136).
    """
    cand_plan = incremental_candidate_pairs(
        corpus, batch, num_hashes, bands, shingle_k
    )
    # LAZY checkpoint: the candidate set feeds both the id semi-filter
    # and the verification join below — without it the corpus minhash
    # pipeline would execute once per reference.  Lazy (not eager)
    # keeps the operator free of build-time Spark jobs for library
    # callers; the first action materializes it once.
    cand = cand_plan.localCheckpoint(eager=False)
    # verify only candidate docs: semi-filter before shingling, so the
    # exact-Jaccard step costs O(candidates) — without this the corpus
    # would be re-shingled wholesale just to verify a handful of pairs
    cand_ids = F.broadcast(
        cand.select(F.col("a").alias("doc_id"))
        .unionByName(cand.select(F.col("b").alias("doc_id")))
        .distinct()
    )
    docs_needed = corpus.unionByName(batch).join(cand_ids, "doc_id", "left_semi")
    verified = jaccard_pairs(docs_needed, cand, shingle_k).where(
        F.col("jaccard") >= F.lit(threshold)
    )
    out = classify_batch_matches(verified, batch.select("doc_id"))
    # Lazy precondition guard: classification orients pairs by a < b,
    # so a corpus id >= a batch id would silently mislabel canonical
    # ids.  The guard is a 1-row bounds aggregate whose FILTER raises
    # on violation — a filter, not a projected column, so dropping the
    # guard column below cannot prune the check out of the plan; an
    # empty corpus or batch yields NULL bounds and passes (vacuously
    # ordered).  No build-time job: evaluated at the caller's first
    # action, like the rest of the operator.
    guard = (
        corpus.agg(F.max("doc_id").alias("_max_corpus_id"))
        .crossJoin(batch.agg(F.min("doc_id").alias("_min_batch_id")))
        .where(
            F.when(
                F.col("_max_corpus_id") >= F.col("_min_batch_id"),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "incremental_dedup: corpus/batch ids out of "
                            "ingestion order — max corpus doc_id "
                        ),
                        F.col("_max_corpus_id").cast("string"),
                        F.lit(" >= min batch doc_id "),
                        F.col("_min_batch_id").cast("string"),
                        F.lit(
                            "; every corpus doc_id must precede every "
                            "batch doc_id"
                        ),
                    )
                ),
            ).otherwise(F.lit(True))
        )
        .select(F.lit(1).alias("_id_order_guard"))
    )
    return out.crossJoin(F.broadcast(guard)).drop("_id_order_guard")


def classify_batch_matches(
    verified: DataFrame, batch_ids: DataFrame
) -> DataFrame:
    """Classification tail shared by batch and streaming incremental
    dedup: given verified (a, b, …) match pairs (a < b, every b a
    batch doc) and the batch id set, emit one row per batch doc
    (doc_id, status, canonical_doc_id).

    Corpus ids all precede batch ids, so a < b puts the corpus
    partner (when any) on the a side; batch-batch pairs orient the
    earlier batch doc as a.  Partner origin is ONE broadcast left
    join (a ∈ batch?) feeding ONE conditional-min aggregation — the
    r12 shape ran a separate anti/semi + groupBy per origin plus a
    second result join, three avoidable exchanges on every streaming
    fold (r13; duplicate ``verified`` pairs are absorbed by the min
    aggregation either way)."""
    flagged = verified.join(
        F.broadcast(
            batch_ids.select(
                F.col("doc_id").alias("a"), F.lit(1).alias("_in_batch")
            )
        ),
        "a",
        "left",
    )
    matches = flagged.groupBy("b").agg(
        F.min(F.when(F.col("_in_batch").isNull(), F.col("a"))).alias(
            "corpus_canon"
        ),
        F.min(F.when(F.col("_in_batch").isNotNull(), F.col("a"))).alias(
            "batch_canon"
        ),
    )
    return (
        batch_ids.join(
            matches.withColumnRenamed("b", "doc_id"), "doc_id", "left"
        )
        .select(
            "doc_id",
            F.when(F.col("corpus_canon").isNotNull(), F.lit("dup_of_corpus"))
            .when(F.col("batch_canon").isNotNull(), F.lit("dup_in_batch"))
            .otherwise(F.lit("novel"))
            .alias("status"),
            F.coalesce("corpus_canon", "batch_canon", "doc_id").alias(
                "canonical_doc_id"
            ),
        )
    )


def simhash_near_pairs(
    docs: DataFrame, bits: int = 16, max_hamming: int = 3, bands: int = 4
) -> DataFrame:
    """SimHash near-dup pairs: (a, b, hamming) with Hamming distance
    ≤ ``max_hamming``, a < b.

    Banded join, not a cross join: split the ``bits``-bit fingerprint
    into ``bands`` equal bands — by pigeonhole any pair within
    Hamming ``bands - 1`` agrees exactly on ≥1 band — then verify
    with ``bit_count(a XOR b)``.  Requires
    ``max_hamming <= bands - 1`` for exactness; the band key join is
    the LSH-for-Hamming-space construction, AQE-skew-safe at scale.
    """
    if max_hamming > bands - 1:
        raise ValueError("exactness needs max_hamming <= bands - 1")
    band_width = bits // bands
    fp = simhash(docs, bits)
    banded = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * band_width)
                        .bitwiseAND(F.lit((1 << band_width) - 1))
                        .alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.key")
    left, right = banded.alias("l"), banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("a"),
            F.col("r.doc_id").alias("b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= F.lit(max_hamming))
        .distinct()
    )


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """SimHash fingerprint: for each bit position, majority vote of
    the per-token hash bits (+1/−1), weighted by token frequency.
    Small default width (16) keeps the per-doc aggregate cheap;
    near-dup candidates are docs within small Hamming distance."""
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    h = hash64(F.col("token"))
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    per_doc = tok.groupBy("doc_id").agg(*bit_aggs)
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"b{b}") > 0, F.lit(2 ** b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return per_doc.select("doc_id", fp.cast("long").alias("simhash"))


def substring_dup_stats(docs: DataFrame, width: int = 32) -> DataFrame:
    """Exact-substring duplication profile (the "Deduplicating
    Training Data Makes Language Models Better" suffix-overlap shape,
    at fixed window granularity): for every document, how many of its
    ``width``-char sliding windows also occur verbatim in ANOTHER
    document.

    (doc_id, n_windows, n_dup_windows, dup_ppm) for every doc;
    ``dup_ppm = n_dup_windows * 1_000_000 div n_windows`` (0 when the
    doc is shorter than ``width``).

    Scale shape: windows are emitted as portable 60-bit hashes
    (functions/hashing.hash64) so the cross-doc occurrence check is a
    groupBy on an 8-byte key, never a shuffle of raw text spans; the
    per-window doc-count joins back to the window stream on the same
    hash key (one shuffle reused).  Window count per doc is O(len), so
    total work is O(corpus chars) — a stride parameter would trade
    recall for cost at extreme scale, but at width=32/stride=1 the
    explode is ~len rows per doc, the same order as the tokenizing
    operators in this module.
    """
    win = F.expr(
        "CASE WHEN length(text) >= {w} THEN "
        "transform(sequence(1, length(text) - {w} + 1), "
        "i -> substring(text, i, {w})) "
        "ELSE array() END".format(w=width)
    )
    wins = docs.select(
        "doc_id", F.explode(win).alias("_w")
    ).select("doc_id", hash64(F.col("_w")).alias("wh"))
    # A window is shared iff >= 2 distinct docs contain it, i.e. the
    # min and max doc_id over its hash partition differ.  One window
    # spec instead of groupBy + join-back: the window stream is
    # shuffled ONCE on wh (vs once for the agg and again for the
    # join), and no per-hash doc-count table is materialized.
    by_wh = Window.partitionBy("wh")
    marked = wins.select(
        "doc_id",
        (
            F.min("doc_id").over(by_wh) != F.max("doc_id").over(by_wh)
        ).alias("_shared"),
    )
    per_doc = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        F.sum(F.when(F.col("_shared"), 1).otherwise(0))
        .cast("long")
        .alias("n_dup_windows"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0))
            .cast("long")
            .alias("n_dup_windows"),
            F.coalesce(
                F.expr("n_dup_windows * 1000000 div n_windows"), F.lit(0)
            )
            .cast("long")
            .alias("dup_ppm"),
        )
    )


def winnow_fingerprints(
    docs: DataFrame, k: int = 4, window: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 — the MOSS local fingerprinting scheme): hash every
    word ``k``-gram, slide a ``window``-wide window over the hash
    stream, and keep the MINIMUM hash of each window.  The distinct
    kept hashes are the document's fingerprint set — any shared
    substring of at least ``window + k - 1`` words is GUARANTEED to
    contribute at least one common fingerprint between two documents
    (the winnowing guarantee), while the expected density of kept
    hashes is only 2/(window+1) of the gram stream.

    This is the LOCAL fingerprinting family, complementary to minhash
    (global set-similarity): winnowing detects shared *passages*
    (plagiarism, quote reuse, partial copies) that whole-document
    Jaccard dilutes away.

    (doc_id, fp) distinct rows.  Scale shape: tokenize + posexplode
    once, one hash-partitioned window per doc for the k-gram ``lead``
    composition and one for the sliding min — both partitioned by
    doc_id (document-bounded, never a global sort), then a distinct.
    All hashing is the portable md5 family, so fingerprints are
    engine-independent.
    """
    if k < 1 or window < 1:
        raise ValueError(f"k and window must be >= 1, got k={k} w={window}")
    from connected_component_spark.operators.text import (
        _exploded_ngrams_with_pos,
        _posexploded_words,
    )

    grams = _exploded_ngrams_with_pos(_posexploded_words(docs), k)
    gh = grams.select(
        "doc_id", F.col("_pos").alias("pos"), hash64(F.col("_gram")).alias("gh")
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    return (
        gh.select(
            "doc_id",
            F.min("gh").over(w).alias("fp"),
            F.count(F.lit(1)).over(w).alias("_full"),
        )
        # only FULL windows select a fingerprint (the final window-1
        # positions start partial windows already covered by earlier
        # full ones)
        .where(F.col("_full") == window)
        .select("doc_id", "fp")
        .distinct()
    )


def _df_capped(fp: DataFrame, max_df: int | None) -> DataFrame:
    """Drop fingerprints present in more than ``max_df`` documents —
    the posting-list df-cap shared by winnow_pairs and
    winnow_decontaminate (one definition so a future cap-semantics
    change cannot drift between the two)."""
    if max_df is None:
        return fp
    by_fp = Window.partitionBy("fp")
    return (
        fp.withColumn("_df", F.count(F.lit(1)).over(by_fp))
        .where(F.col("_df") <= max_df)
        .drop("_df")
    )


def winnow_pairs(
    docs: DataFrame,
    k: int = 4,
    window: int = 4,
    min_shared: int = 2,
    max_df: int | None = 64,
) -> DataFrame:
    """Passage-overlap candidate pairs via shared winnowing
    fingerprints: (doc_a, doc_b, n_shared) for pairs sharing at least
    ``min_shared`` fingerprints.

    ``max_df`` drops fingerprints present in more than that many
    documents before pairing — the posting-list df-cap every inverted
    -index joiner needs at 100 TB: a boilerplate passage shared by m
    documents would otherwise emit m²/2 pairs from one fingerprint
    (the same quadratic ``banded_pairs`` caps with max_bucket_size).
    The join is a plain equi-join on the 8-byte fingerprint, so AQE
    skew-split handles residual hot keys under the cap.
    """
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    fp = _df_capped(winnow_fingerprints(docs, k=k, window=window), max_df)
    # both sides of the self-join reference fp: without the lazy
    # checkpoint the whole tokenize→window→distinct tree evaluates
    # twice (the repo's documented double-evaluation trap)
    fp = fp.localCheckpoint(eager=False)
    left = fp.withColumnRenamed("doc_id", "doc_a")
    right = fp.withColumnRenamed("doc_id", "doc_b")
    return (
        left.join(right, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def winnow_dedup_clusters(
    docs: DataFrame,
    k: int = 4,
    window: int = 4,
    min_shared: int = 2,
    max_df: int | None = 64,
    max_iterations: int = 20,
) -> DataFrame:
    """Passage-overlap clusters: :func:`winnow_pairs` edges → the CC
    kernel over the paired subgraph (unpaired docs attach as
    singletons via one anti join, same shape as
    :func:`ngram_dedup_clusters`) — transitive passage reuse (A
    quotes B, B quotes C) lands A, B, C in one cluster even when A
    and C share nothing directly."""
    edges = winnow_pairs(
        docs, k=k, window=window, min_shared=min_shared, max_df=max_df
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    return components_with_isolates(
        edges, docs, "doc_id", max_iterations=max_iterations
    ).select(F.col("node").alias("doc_id"), F.col("component").alias("cluster"))


def winnow_decontaminate(
    docs: DataFrame,
    eval_col: str,
    k: int = 4,
    window: int = 4,
    min_shared: int = 2,
    max_df: int | None = 64,
) -> DataFrame:
    """Passage-level eval decontamination (the n-gram overlap scrub
    pretraining corpora run against their benchmark suites): flag
    every TRAIN document sharing at least ``min_shared`` winnowed
    fingerprints with any EVAL document (``eval_col`` is a boolean
    column on ``docs``; NULL flags coalesce to train so unknown docs
    are checked, never skipped).  Catches partial quotes and embedded
    benchmark passages that whole-document near-dup splits dilute
    away.

    Sensitivity contract (review r9): the winnowing guarantee — any
    verbatim overlap of ≥ window+k−1 words yields at least one shared
    fingerprint — bounds misses ONLY at ``min_shared=1`` with
    ``max_df=None``.  The defaults trade that bound for precision:
    ``min_shared=2`` needs a second shared fingerprint (≈ a longer or
    second overlap), and a fingerprint quoted by more than ``max_df``
    documents is dropped even when the overlap is real.  Run with
    ``min_shared=1, max_df=None`` when the scrub must be exhaustive
    and a manual review of the (larger) flag list is acceptable.

    (doc_id, n_eval_matches, max_shared, contaminated) for every
    train doc.  ``min_shared=2`` rejects single-fingerprint chance
    collisions (one shared rare 4-gram) while keeping real passage
    reuse; ``max_df`` drops corpus-wide boilerplate fingerprints
    before matching so shared templates don't flag everything.

    Scale shape: one winnowing pass over the full corpus, the df-cap
    window, then an equi-join of the (small) eval fingerprint side
    against the train side on the 8-byte fingerprint — at 100 TB the
    eval suite is tiny, so the join broadcasts."""
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    fp = _df_capped(winnow_fingerprints(docs, k=k, window=window), max_df)
    # NULL eval flags coalesce to TRAIN (review r9): a doc of unknown
    # provenance cannot be part of an explicit eval suite, and
    # treating it as train means it still gets CHECKED — the old
    # three-valued ~NULL filters silently dropped it from the train
    # side, the eval side, AND the report.
    flags = docs.select(
        "doc_id",
        F.coalesce(F.col(eval_col).cast("boolean"), F.lit(False)).alias(
            "_ev"
        ),
    )
    fp = fp.join(flags, "doc_id").localCheckpoint(eager=False)
    tr = fp.where(~F.col("_ev")).select("doc_id", "fp")
    ev = fp.where(F.col("_ev")).select(
        F.col("doc_id").alias("_eval_id"), "fp"
    )
    pairs = (
        tr.join(ev, "fp")
        .groupBy("doc_id", "_eval_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= min_shared)
    )
    per_doc = pairs.groupBy("doc_id").agg(
        F.countDistinct("_eval_id").cast("long").alias("n_eval_matches"),
        F.max("_n").cast("long").alias("max_shared"),
    )
    return (
        flags.where(~F.col("_ev"))
        .select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_eval_matches", F.lit(0)).cast("long").alias(
                "n_eval_matches"
            ),
            F.coalesce("max_shared", F.lit(0)).cast("long").alias(
                "max_shared"
            ),
            (F.coalesce("n_eval_matches", F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


def retention_decisions(
    clusters: DataFrame,
    docs: DataFrame,
    quality_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware dedup retention — the consolidation step after
    clustering (CCNet / RefinedWeb style): within each duplicate
    cluster keep exactly ONE representative, the member with the
    highest ``quality_col`` (ties to the smallest id), and point
    every dropped member at it.

    ``clusters`` is (id, cluster) — any *_dedup_clusters output;
    ``docs`` supplies the quality column.  Returns one row per doc:
    (id, cluster, keep boolean, canonical_<id> long).  Singleton
    clusters keep their only member, so ``sum(keep)`` is the number
    of clusters and the kept set is a deterministic pure function of
    (clustering, quality) — reproducible across engines when the
    quality is integer-exact (char counts, token counts; NOT a float
    score unless snap-rounded first).

    Scale shape: one equi-join on the id (quality ride-along), then
    ONE hash shuffle on cluster with a per-cluster window — the
    canonical member comes from ``first_value`` over the full
    partition frame, so there is no second shuffle and no join-back.
    Cluster sizes are dedup-cluster sizes (bounded by the upstream
    pair valves), so the per-cluster sort never sees a corpus-scale
    partition."""
    q = clusters.join(docs.select(id_col, quality_col), id_col)
    order = [F.col(quality_col).desc(), F.col(id_col).asc()]
    w_full = (
        Window.partitionBy("cluster")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    canonical = F.first(F.col(id_col)).over(w_full)
    return q.select(
        F.col(id_col),
        "cluster",
        (F.col(id_col) == canonical).alias("keep"),
        canonical.alias(f"canonical_{id_col}"),
    )
