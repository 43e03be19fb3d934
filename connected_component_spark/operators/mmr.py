"""Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
SIGIR 1998): greedy diversification of a retrieval candidate list —
each step selects the candidate maximizing

    mmr(d) = λ · rel(d) − (1 − λ) · max_{s ∈ selected} sim(d, s)

so the output top-k trades pure relevance against redundancy with the
already-selected set.  The standard last stage of a retrieval stack
(after BM25/ANN/RRF produce candidates), and the piece that turns
near-duplicate-heavy candidate lists into useful context windows.

Spark shape: MMR is inherently sequential in k (each pick changes the
next step's penalty), so the loop runs driver-side over k bounded
rounds — but each round is pure DataFrame algebra over the
CANDIDATE-sized state (per-query candidate lists are bounded by the
serving contract, e.g. a top-20), never the corpus: one
remaining×selected pairwise-similarity join per round, one max
aggregation, one per-query argmax window.  All vectors ride attached
to the candidate rows from a single entry-time join; the corpus is
never re-scanned.

Exactness (the house float discipline): pairwise similarity is the
rounded-at-6 cosine chain; ``λ·rel`` and ``(1−λ)·maxsim`` are single
correctly-rounded IEEE multiplies of snap-rounded inputs with λ
literals embedded identically in the SQL oracle, and their difference
is one IEEE subtract — every mmr double is engine-exact, ranked with
doc_id tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from connected_component_spark.functions.vectors import as_double, dot, l2_norm
from connected_component_spark.queries.parity import roundd

__all__ = ["mmr_rerank"]


def mmr_rerank(
    candidates: DataFrame,
    emb: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Diversify per-query candidate lists: (query_id, doc_id, mmr,
    step) with step 1..k — step 1 is the pure-relevance argmax (the
    selected set is empty, no penalty), later steps apply the
    max-similarity penalty against everything already selected.

    ``candidates``: (query_id, doc_id, score) — score is the
    relevance the first stage produced (rounded at 6 by every scorer
    in this repo).  ``emb``: (id_col, vec_col) vectors for the
    candidate doc_ids (an inner join attaches them; a candidate
    without a vector is dropped — it cannot be penalty-scored).
    Queries with fewer than k candidates emit what they have.

    BOUNDED-CANDIDATE CONTRACT: per-query candidate lists are a
    first-stage top-N (bounded), and each of the k driver-side rounds
    joins remaining×selected per query — O(N·k) rows per query per
    round.  Corpus-scale candidate lists must be cut to a top-N
    first."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not (0.0 <= lam <= 1.0):
        raise ValueError(f"lambda must be in [0, 1], got {lam}")
    cand = (
        candidates.select("query_id", "doc_id", "score")
        .join(
            emb.select(
                F.col(id_col).alias("doc_id"), F.col(vec_col).alias("v")
            ),
            "doc_id",
        )
        .select("query_id", "doc_id", "score", as_double("v").alias("v"))
        .select("query_id", "doc_id", "score", "v", l2_norm(F.col("v")).alias("vn"))
        .localCheckpoint(eager=True)
    )
    pick_w = Window.partitionBy("query_id").orderBy(
        F.col("mmr").desc(), F.col("doc_id").asc()
    )
    # step 1: empty selected set — max over ∅ is 0, so mmr = λ·rel
    # (selection order equals the pure-relevance argmax; the reported
    # value keeps the formula convention)
    selected = (
        cand.select(
            "query_id",
            "doc_id",
            (F.lit(lam) * F.col("score")).alias("mmr"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("mmr").desc(), F.col("doc_id").asc()
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select(
            "query_id", "doc_id", "mmr", F.lit(1).cast("long").alias("step")
        )
        .localCheckpoint(eager=True)
    )
    for step in range(2, k + 1):
        remaining = cand.join(
            selected.select("query_id", "doc_id"), ["query_id", "doc_id"],
            "left_anti",
        )
        # the selected picks' vectors, re-read from the candidate leaf
        sel_v = (
            selected.select("query_id", F.col("doc_id").alias("s_id"))
            .join(
                cand.select(
                    "query_id",
                    F.col("doc_id").alias("s_id"),
                    F.col("v").alias("sv"),
                    F.col("vn").alias("svn"),
                ),
                ["query_id", "s_id"],
            )
        )
        penalty = (
            remaining.join(sel_v, "query_id")
            .select(
                "query_id",
                "doc_id",
                roundd(
                    dot(F.col("v"), F.col("sv"))
                    / (F.col("vn") * F.col("svn")),
                    6,
                ).alias("sim"),
            )
            .groupBy("query_id", "doc_id")
            .agg(F.max("sim").alias("maxsim"))
        )
        scored = remaining.join(penalty, ["query_id", "doc_id"]).select(
            "query_id",
            "doc_id",
            (
                F.lit(lam) * F.col("score")
                - F.lit(1.0 - lam) * F.col("maxsim")
            ).alias("mmr"),
        )
        pick = (
            scored.withColumn("rn", F.row_number().over(pick_w))
            .where(F.col("rn") == 1)
            .select(
                "query_id",
                "doc_id",
                "mmr",
                F.lit(step).cast("long").alias("step"),
            )
        )
        selected = selected.unionByName(pick).localCheckpoint(eager=True)
    return selected.select("query_id", "doc_id", "mmr", "step")
