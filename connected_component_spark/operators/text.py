"""Text-analysis operators for LLM-data pipelines.

All pure Catalyst expressions (split / filter / transform /
aggregate) — no Python UDFs, so they run JVM-side at 100 TB and are
bit-reproducible against a SQL oracle.  Operates on the
``documents`` table shape (doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from connected_component_spark.functions.hashing import hash64
from connected_component_spark.queries.parity import roundd

__all__ = [
    "tokens",
    "token_stats",
    "vocabulary",
    "bpe_piece_stats",
    "quality_score",
    "filter_funnel",
    "token_rarity",
    "language_id",
    "fingerprint",
    "distinctive_terms",
    "repetition_stats",
    "boilerplate_ngrams",
    "source_divergence",
    "lm_score",
    "bm25_topk",
    "bm25_scores",
    "bm25_hard_negatives",
    "textrank_keywords",
    "chunk_documents",
    "redact_pii",
    "STOPWORDS",
    "PII_PATTERNS",
]

#: BPE-ish pre-tokenizer pattern (GPT-2-style, simplified to the
#: regex subset Spark (Java) and DuckDB (RE2) agree on): runs of
#: letters, runs of digits, or single non-alnum-non-space chars
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: PII patterns, deliberately restricted to the Java-regex ∩ RE2
#: subset (character classes, bounded quantifiers, \b — no
#: lookaround, no backreferences, no ambiguous alternation), so the
#: scrubbed text is bit-identical under Spark and the DuckDB oracle.
#: (label, pattern, replacement); applied in declared order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3,4}[-.][0-9]{4}\b", "<PHONE>"),
)

#: Tiny per-language stopword lists for the n-gram/stopword
#: language-ID heuristic.  Deliberately small and hard-coded: the
#: heuristic must be reproducible in ANSI SQL for the oracle.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization with empty tokens removed."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != F.lit(""))


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_uniq_tokens, avg_token_len, n_chars_obs)."""
    t = tokens("text")
    return docs.select(
        "doc_id",
        F.size(t).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_uniq_tokens"),
        roundd(
            F.aggregate(t, F.lit(0.0), lambda acc, x: acc + F.length(x))
            / F.greatest(F.size(t), F.lit(1)),
            4,
        ).alias("avg_token_len"),
        F.length("text").cast("long").alias("n_chars_obs"),
    )


def vocabulary(docs: DataFrame, top_n: int = 100) -> DataFrame:
    """Corpus vocabulary: the ``top_n`` tokens by total term frequency
    (ties broken by token), with document frequency.  (token,
    term_freq, doc_freq, rank).

    The word-count-at-scale shape: explode → partial+final hash agg
    (map-side combine absorbs the per-doc repetition before the
    shuffle), then ``orderBy().limit(n)`` which Spark executes as
    per-partition TakeOrdered + merge — never a single-partition sort
    of the full vocabulary; only the ``top_n`` survivors enter the
    rank window."""
    from pyspark.sql import Window

    t = tokens("text")
    exploded = docs.select("doc_id", F.explode(t).alias("token"))
    counts = exploded.groupBy("token").agg(
        F.count(F.lit(1)).alias("term_freq"),
        F.countDistinct("doc_id").alias("doc_freq"),
    )
    top = counts.orderBy(
        F.col("term_freq").desc(), F.col("token").asc()
    ).limit(top_n)
    w = Window.orderBy(F.col("term_freq").desc(), F.col("token").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def bpe_piece_stats(docs: DataFrame) -> DataFrame:
    """Token counting with a BPE-ish pre-tokenizer regex: the
    pre-training-cost estimator shape (pieces ≈ proxy for LLM token
    count).  (doc_id, n_pieces, n_alpha, n_num, n_punct)."""
    pieces = F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0)
    is_alpha = lambda p: p.rlike("^[A-Za-z]+$")  # noqa: E731
    is_num = lambda p: p.rlike("^[0-9]+$")  # noqa: E731
    return docs.select(
        "doc_id",
        F.size(pieces).cast("long").alias("n_pieces"),
        F.size(F.filter(pieces, is_alpha)).cast("long").alias("n_alpha"),
        F.size(F.filter(pieces, is_num)).cast("long").alias("n_num"),
        (
            F.size(pieces)
            - F.size(F.filter(pieces, is_alpha))
            - F.size(F.filter(pieces, is_num))
        ).cast("long").alias("n_punct"),
    )


def token_rarity(docs: DataFrame) -> DataFrame:
    """Corpus-frequency rarity profile per document: how common are a
    doc's tokens in the whole corpus?  (doc_id, n_tokens, sum_tf,
    min_tf, rare_ppm) where tf is the corpus-wide term frequency of a
    token, min_tf the rarest token the doc contains, and
    ``rare_ppm = 10^6 · min_tf · n_docs / corpus_tokens`` — exact
    integer arithmetic end to end, so the contract is engine-exact
    (no float log-prob whose last ulp differs across libm builds).

    The plan is the corpus-statistics-join-back shape every LM-data
    scorer uses: one word-count aggregate over the corpus joined back
    onto the exploded token stream, one per-doc aggregate.  The tf
    join carries NO broadcast hint: vocabulary grows with the corpus
    (Heaps' law), so at 100 TB the term-frequency table is itself
    large — AQE picks broadcast when the vocab is small and falls
    back to a shuffled hash join when it is not.
    """
    ex = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    tf = ex.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    total = ex.agg(
        F.count(F.lit(1)).alias("corpus_tokens"),
        F.count_distinct("doc_id").alias("n_docs"),
    )
    return (
        ex.join(tf, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("tf").cast("long").alias("sum_tf"),
            F.min("tf").cast("long").alias("min_tf"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "n_tokens",
            "sum_tf",
            "min_tf",
            F.expr("1000000 * min_tf * n_docs div corpus_tokens")
            .cast("long")
            .alias("rare_ppm"),
        )
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic doc-quality features: length, lexical diversity,
    stopword ratio.  Mirrors the usual pre-training quality filters
    (length bounds + stopword density), kept fully declarative."""
    t = tokens("text")
    en = list(STOPWORDS["en"])
    n_tok = F.size(t)
    n_stop = F.size(F.filter(t, lambda x: x.isin(en)))
    uniq_ratio = F.size(F.array_distinct(t)) / F.greatest(n_tok, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1))
    return docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        roundd(uniq_ratio, 4).alias("uniq_ratio"),
        roundd(stop_ratio, 4).alias("stop_ratio"),
        roundd(
            (F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.5
             + uniq_ratio * 0.3
             + F.least(stop_ratio * F.lit(10.0), F.lit(1.0)) * 0.2),
            4,
        ).alias("quality"),
    )


def filter_funnel(df: DataFrame, stages) -> DataFrame:
    """Yield report for an ORDERED chain of quality filters — the
    per-stage observability a production cleaning pipeline publishes
    (how many documents each rule costs, applied cumulatively).

    ``stages`` is a list of (name, boolean Column); returns one row
    per stage: (stage_idx, stage, entering, surviving, dropped)
    where entering = survivors of all earlier stages.

    Scale shape: ONE full aggregation pass regardless of stage count
    (each stage is a map-side conditional sum over the cumulative
    conjunction — no per-stage scans, no shuffle beyond the final
    single-group agg), then a constant-size explode to rows.  The
    input is scanned once at 100 TB no matter how many rules the
    pipeline stacks."""
    aggs = [F.count(F.lit(1)).alias("s_in")]
    cum = None
    for i, (_, cond) in enumerate(stages):
        cum = cond if cum is None else (cum & cond)
        aggs.append(F.sum(cum.cast("long")).alias(f"s_{i}"))
    counts = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("stage_idx"),
                F.lit(name).alias("stage"),
                F.col("s_in" if i == 0 else f"s_{i - 1}").alias("entering"),
                F.col(f"s_{i}").alias("surviving"),
                (
                    F.col("s_in" if i == 0 else f"s_{i - 1}")
                    - F.col(f"s_{i}")
                ).alias("dropped"),
            )
            for i, (name, _) in enumerate(stages)
        ]
    )
    return counts.select(F.explode(rows).alias("r")).select("r.*")


def language_id(docs: DataFrame) -> DataFrame:
    """Stopword-overlap language ID: score each language's stopword
    list against the token set, predict the argmax (ties broken by
    language code order, 'und' = undetermined when all scores are 0).
    """
    t = tokens("text")

    def _score(words: tuple[str, ...]):
        wl = list(words)
        return F.size(F.filter(t, lambda x: x.isin(wl)))

    scores = {lang: _score(words) for lang, words in STOPWORDS.items()}
    # argmax with deterministic tie-break on language code
    structs = F.array(
        *[
            F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
            for lang in sorted(STOPWORDS)
        ]
    )
    best = F.array_max(structs)
    return docs.select(
        "doc_id",
        "lang",
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias(
            "pred_lang"
        ),
        best["score"].cast("long").alias("pred_score"),
    )


def _widen_if_narrow(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition a narrow input up to the session's parallelism.

    An explode multiplies row count ~50× here, so the MAP side of the
    downstream aggregate inherits the scan's partition count; a small
    single-file fixture yields 1-2 input splits and the whole explode
    +combine runs on 2 cores.  At scale the scan already has many
    splits and this is a no-op — the check reads the planned partition
    count, no job."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target, *[F.col(k) for k in keys])
    return df


def _exploded_ngrams_with_pos(words: DataFrame, n: int) -> DataFrame:
    """(doc_id, _pos, _gram) word n-grams from a (doc_id, _pos, _gram)
    posexploded words frame, built with window ``lead`` instead of a
    per-element array lambda: Catalyst higher-order functions
    (transform/aggregate) evaluate INTERPRETED, and measured ~50k
    grams/s; posexplode + lead stays on native codegen paths at ~10×
    that, for one hash-partitioned sort window on the doc key.
    ``_pos`` is the gram's start-word position (consumers that need
    stream order — winnowing — use it; set consumers drop it)."""
    from pyspark.sql import Window

    win = Window.partitionBy("doc_id").orderBy("_pos")
    parts = [F.col("_gram")] + [
        F.lead("_gram", j).over(win) for j in range(1, n)
    ]
    return (
        words.select(
            "doc_id",
            "_pos",
            F.when(parts[-1].isNotNull(), F.concat_ws(" ", *parts)).alias(
                "_ng"
            ),
        )
        .where(F.col("_ng").isNotNull())
        .select("doc_id", "_pos", F.col("_ng").alias("_gram"))
    )


def _exploded_ngrams(words: DataFrame, n: int) -> DataFrame:
    """(doc_id, _gram) word n-grams — see _exploded_ngrams_with_pos."""
    return _exploded_ngrams_with_pos(words, n).select("doc_id", "_gram")


def _posexploded_words(docs: DataFrame) -> DataFrame:
    return _widen_if_narrow(
        docs.select("doc_id", tokens("text").alias("_w")), "doc_id"
    ).select("doc_id", F.posexplode("_w").alias("_pos", "_gram"))


def repetition_stats(docs: DataFrame, n: int = 2) -> DataFrame:
    """Gopher-style within-document repetition features: duplicate and
    top-fraction rates for words and word ``n``-grams.

    (doc_id, n_words, dup_word_frac, top_word_frac, n_ngrams,
    dup_ngram_frac, top_ngram_frac) — the filters pre-training
    pipelines threshold on to drop looping/boilerplate-heavy docs.

    Scale shape: the corpus is tokenized and posexploded ONCE; one
    lead window forms the gram next to its word, and each row fans
    out into its word entry plus (when complete) its gram entry via
    a single struct-array explode — no union arms recomputing the
    tokenize subtree.  Then a (doc, kind, gram) count and ONE
    conditional re-aggregate per doc — two aggregate shuffles total,
    map-side combine absorbs within-doc repetition, and no per-doc
    quadratic lambda (a 1M-word doc costs O(len), not O(len²)).
    Docs with no words survive with zeroed features via the join
    back to the id spine.
    """
    from pyspark.sql import Window

    words = _posexploded_words(docs)
    win = Window.partitionBy("doc_id").orderBy("_pos")
    parts = [F.col("_gram")] + [
        F.lead("_gram", j).over(win) for j in range(1, n)
    ]
    wg = words.select(
        "doc_id",
        F.col("_gram").alias("_word"),
        F.when(parts[-1].isNotNull(), F.concat_ws(" ", *parts)).alias("_ng"),
    )
    pair = F.struct(F.lit("w").alias("_kind"), F.col("_word").alias("_gram"))
    both = F.array(
        pair,
        F.struct(F.lit("g").alias("_kind"), F.col("_ng").alias("_gram")),
    )
    ex = wg.select(
        "doc_id",
        F.explode(
            F.when(F.col("_ng").isNotNull(), both).otherwise(F.array(pair))
        ).alias("_e"),
    ).select("doc_id", F.col("_e._kind").alias("_kind"), F.col("_e._gram").alias("_gram"))
    counts = ex.groupBy("doc_id", "_kind", "_gram").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    is_w = F.col("_kind") == "w"
    is_g = F.col("_kind") == "g"
    per_doc = counts.groupBy("doc_id").agg(
        F.sum(F.when(is_w, F.col("_cnt"))).alias("_wt"),
        F.count(F.when(is_w, F.lit(1))).alias("_wd"),
        F.max(F.when(is_w, F.col("_cnt"))).alias("_wm"),
        F.sum(F.when(is_g, F.col("_cnt"))).alias("_gt"),
        F.count(F.when(is_g, F.lit(1))).alias("_gd"),
        F.max(F.when(is_g, F.col("_cnt"))).alias("_gm"),
    )
    out = docs.select("doc_id").join(per_doc, "doc_id", "left")
    wt = F.coalesce(F.col("_wt"), F.lit(0))
    gt = F.coalesce(F.col("_gt"), F.lit(0))
    return out.select(
        "doc_id",
        wt.cast("long").alias("n_words"),
        roundd(
            (wt - F.coalesce(F.col("_wd"), F.lit(0)))
            / F.greatest(wt, F.lit(1)),
            4,
        ).alias("dup_word_frac"),
        roundd(
            F.coalesce(F.col("_wm"), F.lit(0)) / F.greatest(wt, F.lit(1)), 4
        ).alias("top_word_frac"),
        gt.cast("long").alias("n_ngrams"),
        roundd(
            (gt - F.coalesce(F.col("_gd"), F.lit(0)))
            / F.greatest(gt, F.lit(1)),
            4,
        ).alias("dup_ngram_frac"),
        roundd(
            F.coalesce(F.col("_gm"), F.lit(0)) / F.greatest(gt, F.lit(1)), 4
        ).alias("top_ngram_frac"),
    )


def boilerplate_ngrams(
    docs: DataFrame, n: int = 5, min_doc_freq: int = 2, top: int = 100
) -> DataFrame:
    """Cross-document repeated-span detector (the C4 "remove any
    boilerplate line seen in ≥K pages" shape at n-gram granularity):
    word ``n``-grams appearing in at least ``min_doc_freq`` distinct
    docs, ranked by document frequency.

    (ngram, doc_freq, total_freq, rank).  Scale shape: explode →
    single (gram) hash agg with map-side combine → TakeOrdered top —
    word-count over grams; the full gram universe is never sorted or
    collected."""
    from pyspark.sql import Window

    ex = _exploded_ngrams(_posexploded_words(docs), n).select(
        "doc_id", F.col("_gram").alias("ngram")
    )
    # pre-aggregate per (doc, gram) first: a countDistinct straight on
    # the exploded rows would expand to a two-phase distinct shuffle of
    # every gram INSTANCE; the per-doc count collapses within-doc
    # repetition map-side, so only distinct (doc, gram) pairs shuffle
    per_doc = ex.groupBy("doc_id", "ngram").agg(
        F.count(F.lit(1)).alias("_in_doc")
    )
    counts = per_doc.groupBy("ngram").agg(
        F.count(F.lit(1)).cast("long").alias("doc_freq"),
        F.sum("_in_doc").cast("long").alias("total_freq"),
    )
    hit = counts.where(F.col("doc_freq") >= min_doc_freq)
    topd = hit.orderBy(
        F.col("doc_freq").desc(), F.col("ngram").asc()
    ).limit(top)
    w = Window.orderBy(F.col("doc_freq").desc(), F.col("ngram").asc())
    return topd.withColumn("rank", F.row_number().over(w).cast("long"))


def distinctive_terms(docs: DataFrame, top_k: int = 3) -> DataFrame:
    """TF-IDF-style keyword extraction: the ``top_k`` most distinctive
    tokens per document, scored by an exact rational tf/df surrogate
    (``score_ppm = tf * 1_000_000 div df``) instead of a float
    ``tf·log(N/df)`` so the ranking is bit-identical in any engine —
    log() last-ulp divergence across libm implementations would break
    exact oracle parity without changing any ranking that matters.

    (doc_id, token, tf, df, score_ppm, rank); rank by
    (score_ppm desc, tf desc, token asc) per doc.

    Scale shape: explode → (doc, token) hash agg (map-side combine
    absorbs within-doc repetition) → token-level df agg over the
    already-distinct pairs → equi-join tf×df on token → per-doc top-k
    window.  No global sort, no driver collection; the df side is a
    token-cardinality aggregate, naturally tiny relative to the corpus.
    """
    from pyspark.sql import Window

    ex = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    tf = ex.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    # tf rows are already distinct (doc, token) pairs, so df is a plain
    # count — no second distinct shuffle
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    scored = tf.join(df_, "token").withColumn(
        "score_ppm", F.expr("tf * 1000000 div df").cast("long")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_ppm").desc(), F.col("tf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_k)
        .select("doc_id", "token", "tf", "df", "score_ppm", "rank")
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Order-insensitive document fingerprint: portable hash of the
    sorted distinct token set — a cheap canonical-content id that
    survives token reordering (bag-of-words identity)."""
    t = tokens("text")
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(t)))
    return docs.select(
        "doc_id",
        hash64(F.col("text")).alias("text_hash"),
        hash64(canon).alias("bow_fingerprint"),
    )


def source_divergence(docs: DataFrame) -> DataFrame:
    """Per-source domain-shift diagnostic: KL(p_source || p_corpus)
    over unigram distributions — (source, n_tokens, n_types, kl).

    The mixture-monitoring number a training pipeline tracks per data
    source: how far a source's token distribution sits from the
    corpus blend (0 = indistinguishable; rising KL flags drift or a
    mis-weighted source).  Word-count shapes only: one (source,
    token) aggregate, one source aggregate, one token aggregate, a
    join-back, and a per-source sum — every stage partial-aggregates
    map-side and shuffles word-count-sized rows, never documents.

    Cross-engine determinism: probabilities are integer-ratio double
    divisions (identical in both engines), the log is the one libm
    call — its ≤1-ulp divergence is absorbed by snap-rounding each
    term at 9 decimals (term magnitudes ~1e-3, boundaries 1e10 ulps
    away); rounded terms are summed as exact DECIMAL(38,18), so
    partial-aggregation order cannot move the sum.
    """
    tok = docs.select("source", F.explode(tokens("text")).alias("token"))
    st = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c_st"))
    s_tot = tok.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    t_tot = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c_t"))
    corpus = tok.agg(F.count(F.lit(1)).alias("n_corpus"))
    p_s = F.col("c_st").cast("double") / F.col("n_s").cast("double")
    p_c = F.col("c_t").cast("double") / F.col("n_corpus").cast("double")
    term = roundd(p_s * F.log(p_s / p_c), 9)
    return (
        st.join(s_tot, "source")
        .join(t_tot, "token")
        .crossJoin(F.broadcast(corpus))
        .groupBy("source")
        .agg(
            F.first("n_s").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            roundd(
                F.sum(term.cast("decimal(38,18)")).cast("double"), 6
            ).alias("kl"),
        )
    )


def lm_score(docs: DataFrame) -> DataFrame:
    """CCNet-style per-document unigram LM quality score:
    (doc_id, n_tokens, nll) where nll is the mean negative natural
    log-probability of the doc's tokens under the CORPUS unigram
    distribution (lower = more typical of the corpus; high nll flags
    rare-token noise, the CCNet/Gopher perplexity-filter signal with
    the corpus itself as the LM — no external model artifact).

    Word-count shapes only: one (doc, token) aggregate, one token
    aggregate, one corpus total, a token-keyed join-back (word-count-
    sized rows, AQE broadcasts the vocabulary side when it fits), and
    a per-doc sum — documents themselves are never shuffled.

    Cross-engine determinism (the source_divergence recipe):
    p_t = c_t / n_corpus is an integer-ratio double division
    (identical in both engines); ln is the one libm call, its ≤1-ulp
    divergence absorbed by snap-rounding each token's -log(p) at 9
    decimals; per-doc contributions multiply the rounded term by the
    exact integer occurrence count and sum as DECIMAL(38,18), so
    partial-aggregation order cannot move the total.
    """
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    dt = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c_dt"))
    t_tot = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c_t"))
    corpus = tok.agg(F.count(F.lit(1)).alias("n_corpus"))
    neg_logp = roundd(
        -F.log(F.col("c_t").cast("double") / F.col("n_corpus").cast("double")), 9
    )
    # decimal widths chosen so the product stays exact in BOTH
    # engines without hitting the 38-digit cap: c_dt < 10^10
    # (decimal(10,0)), rounded -log(p) < 10^3 at scale 9
    # (decimal(12,9)) → product ≤ 23 digits, sums exact
    per_doc = (
        dt.join(t_tot, "token")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(
            F.sum("c_dt").cast("long").alias("n_tokens"),
            F.sum(
                F.col("c_dt").cast("decimal(10,0)") * neg_logp.cast("decimal(12,9)")
            ).alias("_nll_sum"),
        )
    )
    # empty docs (no tokens) never appear in tok; attach them with
    # nll 0.0 so the output covers every input document
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.when(
                F.col("n_tokens").isNull() | (F.col("n_tokens") == 0), F.lit(0.0)
            )
            .otherwise(
                roundd(
                    F.col("_nll_sum").cast("double")
                    / F.col("n_tokens").cast("double"),
                    6,
                )
            )
            .alias("nll"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    max_df: int | None = None,
    max_queries: int | None = 10_000,
    materialize: bool = False,
) -> DataFrame:
    """Okapi-BM25 ranked retrieval: for each query in ``queries``
    (query_id, query_text), the ``k`` highest-scoring documents —
    (query_id, doc_id, score, rank).  The classic lexical-retrieval
    scorer (Robertson & Zaragoza 2009), the standard first-stage
    ranker in retrieval/decontamination pipelines.

    Query terms are deduplicated (qtf = 1 contract); a query term
    absent from the corpus contributes nothing.  Documents with no
    tokens never enter the corpus statistics, matching lm_score.

    Scale shape — an inverted-index probe, never a corpus scan per
    query: term frequencies are one word-count aggregate; the tiny
    query-term table is BROADCAST into it, so only the query terms'
    posting lists survive to the scoring joins (df table and corpus
    stats are single-row-or-term-count broadcasts; the dl join-back
    carries candidate rows only).  ``max_df`` is the posting-list
    valve: a query term matching more than that many documents
    (stopword-grade) is dropped from scoring, bounding per-term
    fan-out the way winnow_pairs' df-cap does — a production ranker
    would add impact-ordered pruning (WAND) on top, which changes
    nothing about this plan's joins.  The final top-k window
    partitions by query_id (#queries partitions over candidate
    rows only).

    Cross-engine determinism (the lm_score recipe): idf and the tf
    normalization are integer-ratio double arithmetic plus one libm
    ``ln`` whose ≤1-ulp divergence is absorbed by snap-rounding each
    term's contribution at 9 decimals; contributions sum as exact
    DECIMAL so partial-aggregation order cannot move the total, and
    the final score is rounded at 6.  Ranking orders by the ROUNDED
    score with doc_id as the deterministic tie-break.

    ``materialize``: see :func:`bm25_scores` (single-tokenize-pass
    pin; corpus-scale fault-tolerance caveat there).
    """
    from pyspark.sql import Window

    scores = bm25_scores(
        docs,
        queries,
        k1=k1,
        b=b,
        max_df=max_df,
        max_queries=max_queries,
        materialize=materialize,
    )
    return bm25_rank_topk(scores, k)


def bm25_rank_topk(scores: DataFrame, k: int) -> DataFrame:
    """The shared ranking tail — per-query top-k over (query_id,
    doc_id, score) with the rounded score ordering and doc_id
    tie-break, single-sourced for the batch and incremental-index
    serving paths."""
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return scores.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).where(F.col("rank") <= F.lit(k))


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    max_df: int | None = None,
    max_queries: int | None = 10_000,
    materialize: bool = False,
) -> DataFrame:
    """The un-ranked BM25 scorer behind :func:`bm25_topk`:
    (query_id, doc_id, score) for every document matching at least
    one surviving query term — exposed separately so consumers that
    must filter candidates BEFORE ranking (e.g. hard-negative mining,
    which excludes the anchor's own near-dup cluster) rank the
    surviving set instead of losing excluded slots from a pre-cut
    top-k.  Semantics, plan shape, and cross-engine float discipline
    exactly as documented on bm25_topk.

    BOUNDED-QUERY-BATCH CONTRACT (advice r11): the query-term table is
    BROADCAST into the posting lists (that is what makes this an
    inverted-index probe instead of a corpus scan per query), so
    ``queries`` must be a bounded serving batch, never a corpus-scale
    table — "mine negatives for every doc" must chunk its anchors.
    ``max_queries`` enforces it (early-exit limit probe, raises above
    the bound; ``None`` disables for callers that have already sized
    the batch).

    ``materialize=True`` (opt-in, physical only — values unchanged)
    localCheckpoints the exploded token stream, so the tf/dl/stats
    index aggregates read ONE tokenize pass instead of re-running the
    corpus scan + explode three times (r14: AQE stage reuse does not
    dedupe these subtrees — measured on the declared retrieval
    queries).  Default off: the durable-index path
    (streaming/bm25.py) and callers needing a fully lazy plan keep
    the composable shape.

    CLUSTER-SCALE CAVEAT (r15): unlike the rank-list checkpoints in
    the query layer (O(k) rows at any scale), this pins a
    CORPUS-SIZED frame — the exploded token stream is larger than the
    input text.  ``localCheckpoint`` stores blocks on executor local
    storage with NO fault tolerance and truncates lineage, so losing
    one executor (spot kill, dynamic-allocation scale-in) fails the
    query instead of recomputing the lost partitions.  The trade (one
    materialization vs 3 corpus-scan recomputes) is still usually
    right, but at 100 TB prefer either replicated/recoverable storage
    for the pin — ``persist(StorageLevel.DISK_ONLY)`` keeps lineage
    so lost blocks recompute — or a reliable ``checkpoint()`` dir;
    this flag deliberately stays the cheap local form because the
    declared queries run it on a single-host bench."""
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    if materialize:
        tok = tok.localCheckpoint(eager=False)
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = tok.agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_corpus"),
    )
    return bm25_scores_from_index(
        tf, dl, stats, queries, k1=k1, b=b, max_df=max_df,
        max_queries=max_queries,
    )


def bm25_idf_col(df_col, n_docs_col):
    """The BM25 idf expression, single-sourced (r13 review: the
    MaxScore serve re-implemented this chain inline — any drift would
    silently break its pruned-equals-unpruned exactness claim).
    Inputs may be columns or literals; the expression tree must stay
    byte-identical to the SQL oracle's."""
    return F.log(
        F.lit(1.0) + (n_docs_col - df_col + F.lit(0.5)) / (df_col + F.lit(0.5))
    )


def bm25_norm_col(tf_col, dl_col, n_docs_col, n_corpus_dbl_col, k1, b):
    """The BM25 tf-saturation/length-normalization expression,
    single-sourced like :func:`bm25_idf_col`.  ``dl * n_docs`` stays
    exact in int64 (doc length × doc count) and the single double
    division keeps the tree identical to the SQL oracle's;
    ``n_corpus_dbl_col`` must already be double-typed."""
    return (tf_col * F.lit(k1 + 1.0)) / (
        tf_col
        + F.lit(k1)
        * (
            F.lit(1.0 - b)
            + F.lit(b) * (dl_col * n_docs_col) / n_corpus_dbl_col
        )
    )


def bm25_scores_from_index(
    tf: DataFrame,
    dl: DataFrame,
    stats: DataFrame,
    queries: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    max_df: int | None = None,
    max_queries: int | None = 10_000,
) -> DataFrame:
    """The BM25 scoring chain over a PREBUILT inverted index —
    ``tf (doc_id, token, tf)``, ``dl (doc_id, dl)``, ``stats`` one row
    ``(n_docs, n_corpus)`` — single-sourced for :func:`bm25_scores`
    (which builds the index from the corpus per call) and the
    continuously-ingested index (streaming/bm25.py, which serves it
    from durable state), so the float discipline cannot drift between
    the batch and incremental paths.  Semantics and contracts exactly
    as documented on bm25_scores/bm25_topk."""
    if max_queries is not None:
        # limit(n+1) short-circuits the scan: one cheap bounded job,
        # not a count of a possibly corpus-scale table
        if queries.limit(max_queries + 1).count() > max_queries:
            raise ValueError(
                f"bm25_scores: query batch exceeds max_queries="
                f"{max_queries} — the query-term table is broadcast, "
                "so corpus-scale query sets must be chunked (or pass "
                "max_queries=None after sizing the batch yourself)"
            )
    qterms = queries.select(
        "query_id",
        F.explode(F.array_distinct(tokens("query_text"))).alias("token"),
    )
    qtok = qterms.select("token").distinct()
    ptf = tf.join(F.broadcast(qtok), "token")
    dft = ptf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    if max_df is not None:
        dft = dft.where(F.col("df") <= F.lit(max_df))
    idf = bm25_idf_col(F.col("df"), F.col("n_docs"))
    norm = bm25_norm_col(
        F.col("tf"),
        F.col("dl"),
        F.col("n_docs"),
        F.col("n_corpus").cast("double"),
        k1,
        b,
    )
    surv = ptf.join(F.broadcast(dft), "token")
    if max_df is not None:
        # candidate-bounded dl (verdict r11): with max_df capping every
        # posting list, the surviving candidate set is ≤ |qterms|·max_df
        # rows — reduce the corpus-wide doc-length table to candidate
        # doc_ids (broadcast semi-join: dl streams, no shuffle) and
        # BROADCAST the reduced result into the scoring join, removing
        # the corpus-sized dl shuffle entirely.  Without max_df the
        # candidate set is unbounded and the shuffle join stands.
        cand_ids = surv.select("doc_id").distinct()
        dl = F.broadcast(dl.join(F.broadcast(cand_ids), "doc_id"))
    contrib = (
        surv.join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qterms), "token")
        .select(
            "query_id",
            "doc_id",
            roundd(idf * norm, 9).cast("decimal(12,9)").alias("c"),
        )
    )
    return contrib.groupBy("query_id", "doc_id").agg(
        roundd(F.sum("c").cast("double"), 6).alias("score")
    )


def tfidf_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    max_queries: int | None = 10_000,
    materialize: bool = False,
) -> DataFrame:
    """Vector-space TF-IDF cosine retrieval: for each query
    (query_id, query_text), the ``k`` documents with the highest
    cosine between the query's and document's tf-idf vectors —
    (query_id, doc_id, score, rank).  The classic second lexical
    scorer next to Okapi BM25 (Salton's vector space model); their
    disagreement is exactly what rank fusion exploits
    (:func:`rrf_fuse`).

    Weights: ``w_d(t) = tf · idf``, ``w_q(t) = idf`` (deduplicated
    query terms, qtf = 1), ``idf = ln(1 + n_docs/df)``.  A query term
    absent from the corpus has no idf and contributes to neither the
    dot product nor the query norm (zero-weight by convention).  Only
    documents sharing ≥ 1 query term are returned.

    Scale shape — the same inverted-index probe as bm25_scores: the
    dot product needs only q∩d terms (broadcast query-term pruning of
    one word-count aggregate); the document norms are a second
    word-count-shaped aggregate over the full index (every doc's norm
    spans its whole vocabulary — an index-build cost, computed without
    ever materializing dense vectors); query norms are bounded.

    Cross-engine determinism (the BM25 recipe): every per-term product
    is snap-rounded at 9 and summed as exact DECIMAL(20,9) (wider than
    BM25's 12,9 — tf·idf² products are not bounded by k1+1), norms
    take one sqrt of the exact sum, and the final cosine is rounded at
    6 before ranking with doc_id tie-break.

    ``materialize``: see :func:`tfidf_scores` (single-tokenize-pass
    pin; corpus-scale fault-tolerance caveat there).
    """
    scores = tfidf_scores(
        docs, queries, max_queries=max_queries, materialize=materialize
    )
    return bm25_rank_topk(scores, k)


def tfidf_scores(
    docs: DataFrame,
    queries: DataFrame,
    max_queries: int | None = 10_000,
    materialize: bool = False,
) -> DataFrame:
    """The un-ranked TF-IDF cosine scorer behind :func:`tfidf_topk`
    (same split as bm25_scores/bm25_topk): (query_id, doc_id, score)
    for every document sharing at least one corpus-present query
    term.  Bounded-query-batch contract as bm25_scores.

    ``materialize=True`` (opt-in, physical only — values unchanged)
    localCheckpoints the exploded token stream and the (doc, token,
    tf) index it feeds: ``tf`` is referenced by the df table, the
    candidate-id set, the doc norms, and the posting-list probe —
    four re-executions of the tokenize subtree per call otherwise
    (r14, measured; AQE stage reuse does not dedupe them).  Both
    pinned frames are CORPUS-SIZED; the cluster-scale fault-tolerance
    caveat on :func:`bm25_scores` applies verbatim (localCheckpoint
    blocks are unrecoverable on executor loss — prefer
    ``persist(DISK_ONLY)``/reliable checkpoint when pinning
    corpus-scale frames on a real cluster)."""
    if max_queries is not None:
        if queries.limit(max_queries + 1).count() > max_queries:
            raise ValueError(
                f"tfidf_scores: query batch exceeds max_queries="
                f"{max_queries} — the query-term table is broadcast, "
                "so corpus-scale query sets must be chunked (or pass "
                "max_queries=None after sizing the batch yourself)"
            )
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    if materialize:
        tok = tok.localCheckpoint(eager=False)
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    if materialize:
        tf = tf.localCheckpoint(eager=False)
    # tf rows are distinct (doc, token) pairs: df is a plain count
    dft = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = tok.agg(F.countDistinct("doc_id").alias("n_docs"))
    idf = F.log(
        F.lit(1.0) + F.col("n_docs").cast("double") / F.col("df")
    )
    qterms = queries.select(
        "query_id",
        F.explode(F.array_distinct(tokens("query_text"))).alias("token"),
    )
    # corpus-present query terms with their idf (absent terms are
    # zero-weight: excluded from dot AND query norm).  The BOUNDED
    # query-term side is what broadcasts — dft is full-vocabulary,
    # corpus-unbounded, and must never ship to the driver (review r12)
    qw = (
        dft.join(F.broadcast(qterms), "token")
        .crossJoin(F.broadcast(n_docs))
        .select("query_id", "token", idf.alias("qidf"))
    )
    # document norms span the FULL vocabulary of each doc (snap-rounded
    # squares, exact decimal sum, one sqrt — never a dense vector), but
    # only CANDIDATE docs (sharing ≥1 query term) survive the final
    # inner join, so the norm aggregate is restricted to them first —
    # candidate-sized instead of corpus-sized work per serving call
    # (review r12; no broadcast hint: the candidate set is unbounded
    # for stopword-grade query terms, AQE picks the strategy)
    cand_ids = (
        tf.join(F.broadcast(qw.select("token").distinct()), "token")
        .select("doc_id")
        .distinct()
    )
    wd2 = roundd((F.col("tf") * idf) * (F.col("tf") * idf), 9)
    dnorm = (
        tf.join(cand_ids, "doc_id")
        .join(dft, "token")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.sqrt(
                F.sum(wd2.cast("decimal(20,9)")).cast("double")
            ).alias("dnorm")
        )
    )
    qnorm = qw.groupBy("query_id").agg(
        F.sqrt(
            F.sum(
                roundd(F.col("qidf") * F.col("qidf"), 9).cast("decimal(20,9)")
            ).cast("double")
        ).alias("qnorm")
    )
    # dot product over q∩d terms only: broadcast query-term pruning of
    # the posting lists, the bm25 probe shape.  The doc-side weight's
    # idf is the SAME idf the query side carries (one value per term),
    # so the per-term product is qidf · (tf · qidf)
    ptf = tf.join(F.broadcast(qw), "token")
    dots = (
        ptf.select(
            "query_id",
            "doc_id",
            roundd(F.col("qidf") * (F.col("tf") * F.col("qidf")), 9)
            .cast("decimal(20,9)")
            .alias("p"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("p").cast("double").alias("dot"))
    )
    return (
        dots.join(dnorm, "doc_id")
        .join(F.broadcast(qnorm), "query_id")
        .select(
            "query_id",
            "doc_id",
            roundd(
                F.col("dot") / (F.col("dnorm") * F.col("qnorm")), 6
            ).alias("score"),
        )
    )


def rrf_fuse(
    rankings: list[DataFrame], k: int = 10, c: int = 60
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR
    2009): fuse per-query rankings from multiple retrievers into one
    — ``rrf(q, d) = Σ_r 1/(c + rank_r(q, d))`` over the rankings that
    returned the document.  The standard hybrid-retrieval combiner
    (lexical + semantic, BM25 + TF-IDF, …): rank-based, so scorers
    with incomparable score scales fuse without calibration.

    Each input is a (query_id, doc_id, rank) DataFrame (extra columns
    ignored); returns (query_id, doc_id, rrf, rank) with the fused
    top-``k`` per query.  Exactness: each 1/(c+rank) is one
    correctly-rounded IEEE division snap-rounded at 9, summed as exact
    DECIMAL, final score rounded at 6; ties break on doc_id.

    Scale shape: a union of the (bounded, per-query top-N) input
    rankings, one hash aggregation keyed (query_id, doc_id), one
    per-query top-k window — candidate-sized, never corpus-sized.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if c < 0:
        raise ValueError(f"rrf c must be >= 0, got {c}")
    parts = [
        r.select("query_id", "doc_id", F.col("rank").cast("long").alias("rank"))
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    contrib = roundd(
        F.lit(1.0) / (F.lit(c).cast("double") + F.col("rank")), 9
    ).cast("decimal(12,9)")
    scores = (
        u.select("query_id", "doc_id", contrib.alias("p"))
        .groupBy("query_id", "doc_id")
        .agg(roundd(F.sum("p").cast("double"), 6).alias("score"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= F.lit(k))
        .select(
            "query_id", "doc_id", F.col("score").alias("rrf"), "rank"
        )
    )


def retrieval_eval_report(
    rankings: dict[str, DataFrame], truth: DataFrame, k: int = 10
) -> DataFrame:
    """Retrieval-quality report: for each named retriever's per-query
    top-k ranking (query_id, doc_id, rank), recall@k and MRR against a
    shared ground-truth list — (retriever, n_queries, recall_at_k,
    mrr), one row per retriever, ordered by name.  The evaluation
    harness every retrieval stack runs before swapping a first-stage
    ranker (the ann_knn_label_report / ann_recall_report discipline
    applied to lexical retrievers: honest numbers, engine-exact).

    ``truth``: (query_id, doc_id) relevant pairs (e.g. a semantic
    exact-cosine top-k).  recall@k = Σ hits / Σ truth-list sizes over
    the queries the retriever RAN (its distinct query_ids); a query
    with no hits contributes 0 to MRR.  Exactness: per-query
    reciprocal ranks are snap-rounded at 9 and summed as exact
    DECIMAL; both final ratios are one IEEE division rounded at 6.

    Scale shape: each input is a bounded per-query top-k list; the
    evaluation is equi-joins on (query_id, doc_id) plus two-level
    aggregation — candidate-sized throughout."""
    if not rankings:
        raise ValueError("retrieval_eval_report needs at least one ranking")
    spark = truth.sparkSession
    t = truth.select("query_id", "doc_id")
    reports = []
    for name in sorted(rankings):
        r = rankings[name].select("query_id", "doc_id", "rank").where(
            F.col("rank") <= F.lit(k)
        )
        qids = r.select("query_id").distinct()
        tq = t.join(qids, "query_id")
        hits = r.join(t, ["query_id", "doc_id"])
        per_q = (
            qids.join(
                hits.groupBy("query_id").agg(
                    F.count(F.lit(1)).alias("n_hits"),
                    F.min("rank").alias("first_rank"),
                ),
                "query_id",
                "left",
            )
            .select(
                "query_id",
                F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                F.when(
                    F.col("first_rank").isNotNull(),
                    roundd(
                        F.lit(1.0) / F.col("first_rank").cast("double"), 9
                    ),
                )
                .otherwise(F.lit(0.0))
                .alias("rr"),
            )
        )
        truth_sizes = tq.groupBy().agg(F.count(F.lit(1)).alias("n_truth"))
        agg = per_q.groupBy().agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.sum("n_hits").alias("sum_hits"),
            F.sum(F.col("rr").cast("decimal(12,9)")).alias("sum_rr"),
        )
        # a retriever whose ranking is empty after the rank<=k cut has
        # zero queries and zero truth coverage: report honest zeros,
        # never NULL/NaN ratios
        reports.append(
            agg.crossJoin(truth_sizes).select(
                F.lit(name).alias("retriever"),
                F.col("n_queries").cast("long").alias("n_queries"),
                F.when(
                    F.col("n_truth") > 0,
                    roundd(
                        F.coalesce(F.col("sum_hits"), F.lit(0)).cast(
                            "double"
                        )
                        / F.col("n_truth"),
                        6,
                    ),
                )
                .otherwise(F.lit(0.0))
                .alias("recall_at_k"),
                F.when(
                    F.col("n_queries") > 0,
                    roundd(
                        F.coalesce(
                            F.col("sum_rr"), F.lit(0).cast("decimal(12,9)")
                        ).cast("double")
                        / F.col("n_queries"),
                        6,
                    ),
                )
                .otherwise(F.lit(0.0))
                .alias("mrr"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def bm25_hard_negatives(
    docs: DataFrame,
    anchors: DataFrame,
    clusters: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    max_df: int | None = None,
    max_queries: int | None = 10_000,
    materialize: bool = False,
) -> DataFrame:
    """Hard-negative mining for contrastive retrieval training (the
    DPR/Contriever recipe: BM25-top lexical matches that are NOT
    positives): for each anchor document, score the corpus with the
    anchor's own text as the BM25 query, EXCLUDE the anchor itself
    and every member of the anchor's near-dup cluster (those are
    positives, not negatives), and keep the ``k`` hardest survivors.
    (query_id, doc_id, score, rank).

    ``anchors``: (query_id, query_text) — typically a doc_id-keyed
    projection of the corpus.  ``clusters``: (doc_id, cluster) — the
    near-dup cluster table (minhash_dedup_clusters output; a
    production pipeline reuses its staged snapshot).

    Scale shape: bm25_scores' inverted-index probe, then two
    cluster-table LEFT joins (query side is anchor-count bounded and
    broadcast; candidate side joins on doc_id), a different-cluster
    filter, and the per-anchor top-k window over surviving candidates
    only.  Exclusion happens BEFORE ranking, so excluded positives
    never consume top-k slots.  A doc absent from ``clusters`` is its
    own singleton cluster (the cluster-id-is-min-member convention) —
    it stays a valid negative instead of being silently dropped by an
    inner join (review r11).

    BOUNDED-ANCHOR CONTRACT (advice r11): the anchor-derived term
    table and cluster lookup are BROADCAST, so ``anchors`` must be a
    bounded batch — "mine negatives for every doc" must chunk.
    ``max_queries`` (enforced in bm25_scores, which sees the anchor
    batch first) raises above the bound; ``None`` disables it.

    ``materialize``: see :func:`bm25_scores` (single-tokenize-pass
    pin; corpus-scale fault-tolerance caveat there)."""
    from pyspark.sql import Window

    scores = bm25_scores(
        docs,
        anchors,
        k1=k1,
        b=b,
        max_df=max_df,
        max_queries=max_queries,
        materialize=materialize,
    )
    # restrict the query-side cluster lookup to the bounded anchor id
    # set BEFORE broadcasting — broadcasting the full corpus-sized
    # cluster table would not survive 100 TB
    aid = anchors.select(F.col("query_id").alias("doc_id"))
    qc = (
        clusters.join(F.broadcast(aid), "doc_id")
        .select(
            F.col("doc_id").alias("query_id"),
            F.col("cluster").alias("q_cluster"),
        )
    )
    dc = clusters.select("doc_id", F.col("cluster").alias("d_cluster"))
    kept = (
        scores.join(F.broadcast(qc), "query_id", "left")
        .join(dc, "doc_id", "left")
        .where(
            (F.col("query_id") != F.col("doc_id"))
            & (
                F.coalesce(F.col("q_cluster"), F.col("query_id"))
                != F.coalesce(F.col("d_cluster"), F.col("doc_id"))
            )
        )
        .select("query_id", "doc_id", "score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return kept.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).where(F.col("rank") <= F.lit(k))


def textrank_keywords(
    docs: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    top_k: int = 20,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004,
    unweighted-adjacency variant): build the corpus-wide word
    co-occurrence graph (an undirected edge per distinct ordered-
    adjacent token pair) and rank words with the SAME fixed-iteration
    decimal-exact PageRank the graph family uses
    (graph/pagerank.py) — the reference's iterate-until-done
    discipline driving a text operator.  (token, rank, pos): the
    ``top_k`` highest-ranked words, ties to the lexicographically
    smaller token.

    Scale shape: bigram extraction is a map-side array op; the edge
    list and each PageRank round are word-count-sized joins/aggs over
    the VOCABULARY graph (tokens, not documents — corpus text is
    scanned once); top-k is orderBy().limit (per-partition
    TakeOrdered), with the rank window only over the survivors."""
    from pyspark.sql import Window

    from connected_component_spark.graph.pagerank import pagerank

    bi = (
        docs.select(tokens("text").alias("t"))
        .select(
            F.explode(
                F.expr(
                    "zip_with(slice(t, 1, greatest(size(t) - 1, 0)),"
                    " slice(t, 2, greatest(size(t) - 1, 0)),"
                    " (a, b) -> named_struct('src', a, 'dst', b))"
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
    )
    pr = pagerank(bi, iterations=iterations, damping=damping)
    ranked = pr.select(
        F.col("node").alias("token"), roundd(F.col("rank"), 6).alias("rank")
    )
    top = ranked.orderBy(F.col("rank").desc(), F.col("token").asc()).limit(
        top_k
    )
    w = Window.orderBy(F.col("rank").desc(), F.col("token").asc())
    return top.withColumn("pos", F.row_number().over(w).cast("long"))


def chunk_documents(
    docs: DataFrame, max_tokens: int = 64, overlap: int = 8
) -> DataFrame:
    """Split over-long documents into overlapping token windows:
    (doc_id, chunk_idx, chunk_text, n_tokens) — the context-assembly
    complement of operators/packing.py:concat_pack (packing joins
    short docs up to the context length; chunking cuts long ones
    down, with ``overlap`` tokens of continuity between consecutive
    windows, the standard RAG/pre-training chunking rule).

    Pure Catalyst 1→N row expansion: sequence + explode + slice —
    no shuffle at all; chunking a 100 TB corpus is one map-side scan.
    Chunk count per doc is exact integer arithmetic
    (``max(1, ceil((n - overlap) / (max_tokens - overlap)))``), so
    the oracle agrees at every boundary; every doc emits at least one
    (possibly empty) chunk so the output covers the corpus.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"need 0 <= overlap < max_tokens, got {overlap}/{max_tokens}"
        )
    stride = max_tokens - overlap
    # NULL text = empty doc (one empty chunk), NOT a phantom
    # max_tokens-sized chunk: size(NULL) is NULL and greatest/least
    # SKIP nulls rather than propagate them, so without the coalesce a
    # NULL doc would emit n_tokens=max_tokens with a null/'' text
    t = tokens(F.coalesce(F.col("text"), F.lit("")))
    base = docs.select("doc_id", t.alias("t"), F.size(t).alias("n"))
    n_chunks = F.expr(
        f"greatest(1, (n - {overlap} + {stride} - 1) div {stride})"
    )
    idx = base.select(
        "doc_id",
        "t",
        "n",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = idx["chunk_idx"] * stride + 1
    length = F.least(F.lit(max_tokens), F.col("n") - start + 1)
    return idx.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.concat_ws(" ", F.slice("t", start, length)).alias("chunk_text"),
        F.least(
            F.lit(max_tokens), F.col("n") - F.col("chunk_idx") * stride
        ).cast("long").alias("n_tokens"),
    )


def redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
) -> DataFrame:
    """Scrub PII from a text column — the safety pass every training
    corpus runs before anything is tokenized.  For each (label,
    pattern, replacement): a ``n_<label>`` count of matches on the
    ORIGINAL text (each label counted independently, so overlapping
    patterns both report), then the replacements applied in declared
    order to produce the scrubbed text — with custom pattern sets
    whose matches can nest, an earlier pattern consumes text later
    ones would otherwise re-redact, so order is part of the contract.
    (The defaults are near-disjoint by design: the email pattern
    requires an alphabetic TLD, so a raw-IP mail host is scrubbed by
    the ipv4 rule, not double-counted.)

    Map-side only, pure Catalyst regexp_count/regexp_replace — at
    100 TB this is one scan.  Patterns must stay in the Java ∩ RE2
    regex subset (see PII_PATTERNS) for oracle parity."""
    out = docs
    for label, pat, _rep in patterns:
        out = out.withColumn(
            f"n_{label}",
            F.regexp_count(F.col(text_col), F.lit(pat)).cast("long"),
        )
    scrub = F.col(text_col)
    for _label, pat, rep in patterns:
        scrub = F.regexp_replace(scrub, pat, rep)
    return out.withColumn(text_col, scrub)
