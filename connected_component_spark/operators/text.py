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
    "bpe_piece_stats",
    "quality_score",
    "language_id",
    "fingerprint",
    "STOPWORDS",
]

#: BPE-ish pre-tokenizer pattern (GPT-2-style, simplified to the
#: regex subset Spark (Java) and DuckDB (RE2) agree on): runs of
#: letters, runs of digits, or single non-alnum-non-space chars
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

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
