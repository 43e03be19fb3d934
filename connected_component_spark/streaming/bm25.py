"""Continuously-ingested BM25 index: lexical retrieval as durable state.

The fifth incremental operator on the ParquetStateStore contract
(dedup, winnow, CC, the IVF ANN index — and now the inverted text
index): a production search system does not re-tokenize its corpus
per query — documents ARRIVE, are tokenized and counted once, and are
retrievable immediately.  Per-document term frequencies and document
length are pure per-document functions, and the corpus statistics
(df, n_docs, n_corpus) are associative aggregates of the accumulated
state, so the incrementally-built index serves results IDENTICAL to
batch ``operators/text.py:bm25_topk`` over the same corpus — which is
this operator's oracle contract, exactly the claim pattern of the
incremental IVF index (streaming/annindex.py).

State tables:

* ``tf`` (doc_id, token, tf, tbucket) — the inverted index,
  hive-partitioned by ``tbucket = pmod(xxhash64(token), n_buckets)``:
  each batch dir holds per-bucket posting-list subdirs, so a serve
  restricted to the query terms' buckets skips whole directories
  (the same probe-list partition pruning the IVF index's ``cell=``
  layout gets — ``PartitionFilters`` in the executed plan).
* ``dl`` (doc_id, dl) — per-document token counts (flat layout; the
  corpus stats n_docs/n_corpus are count/sum over it at serve time).
* ``tstat`` (token, df, max_tf, min_dl, tbucket) — per-posting-list
  IMPACT BOUNDS in the same bucketed layout (r13, verdict r12 #7):
  df, the list's maximum term frequency, and its minimum document
  length are associative per-batch aggregates whose union re-
  aggregates to the corpus values, and BM25's per-term contribution
  is increasing in tf and decreasing in dl — so
  ``idf(df) · norm(max_tf, min_dl)`` is a valid upper bound on any
  posting's contribution, the quantity MaxScore/WAND-style serving
  prunes with (:meth:`IncrementalBM25.topk_pruned`).

Scale shape: per-batch work is one tokenize + two word-count-shaped
aggregations over the bounded micro-batch, landed concurrently
(``store.write_many``); the 100 TB corpus is tokenized exactly once,
on arrival.  Serving probes only the buckets the bounded query batch
hashes to; scoring is the single-sourced
``bm25_scores_from_index`` chain, so the float discipline cannot
drift from the batch operator's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connected_component_spark.operators.text import (
    bm25_rank_topk,
    bm25_scores_from_index,
    tokens,
)
from connected_component_spark.streaming.store import (
    CONSOLIDATE_EVERY,
    LazyBindings,
    MemEpochGuard,
    ParquetStateStore,
    run_state_stream,
)

__all__ = ["IncrementalBM25", "run_doc_index_stream"]

#: patchable module alias of the shared cadence (store.py)
_CONSOLIDATE_EVERY = CONSOLIDATE_EVERY


class IncrementalBM25(LazyBindings):
    """Mutable inverted-index state folded over (doc_id, text)
    micro-batches.  With ``state_dir`` the posting lists and document
    lengths are parquet-backed and crash-durable; resume with
    :meth:`load`.  Batch doc_ids must be previously unseen (appends,
    not upserts — the batch contract of the sibling operators; an
    upserted doc would double-count its term frequencies)."""

    def __init__(
        self, n_buckets: int = 16, state_dir: str | None = None
    ) -> None:
        if n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
        self.n_buckets = n_buckets
        # tf: (doc_id, token, tf, tbucket); dl: (doc_id, dl);
        # tstat: (token, df, max_tf, min_dl, tbucket)
        self._init_bindings(("tf", "dl", "tstat"))
        #: serve telemetry of the last :meth:`topk_pruned` call —
        #: {"queries", "essential_pairs", "skipped_pairs"}; the
        #: pruning-evidence record the declared row/test pins
        self.last_prune_stats: dict | None = None
        self._spark: SparkSession | None = None
        self.batches_seen = 0
        self._mem_guard = MemEpochGuard()
        self._store: ParquetStateStore | None = None
        if state_dir is not None:
            store = ParquetStateStore(state_dir)
            if store.manifest() is not None:
                raise ValueError(
                    f"{state_dir} already holds committed state — resume "
                    "it with IncrementalBM25.load(spark, state_dir)"
                )
            self._store = store

    @property
    def tf(self) -> DataFrame | None:
        """The committed posting lists.  On the durable path the
        parquet read is LAZY (the annindex r12 pattern, shared
        LazyBindings contract since r14): folds only mark the view
        stale; the one basePath-discovery scan happens on first
        access after the fold."""
        return self._binding("tf")

    @property
    def dl(self) -> DataFrame | None:
        """The committed doc-length table (lazy like :attr:`tf`)."""
        return self._binding("dl")

    @property
    def tstat(self) -> DataFrame | None:
        """The committed per-token impact bounds (lazy like
        :attr:`tf`); None on a pre-r13 state dir that never stored
        them."""
        return self._binding("tstat")

    def _read_binding(self, table: str) -> DataFrame | None:
        """One committed-view read; ``tbucket`` restored to int —
        hive-partition value inference types it from the dir names."""
        spark = self._spark or SparkSession.getActiveSession()
        df = self._store.read(spark, table, self.batches_seen)
        if df is None or table == "dl":
            return df
        return df.withColumn("tbucket", F.col("tbucket").cast("int"))

    def _params(self) -> dict:
        return {"n_buckets": self.n_buckets}

    @classmethod
    def load(cls, spark: SparkSession, state_dir: str) -> IncrementalBM25:
        """Resume a durable index: posting lists and doc lengths bind
        to the committed parquet — retrievable immediately, nothing
        re-tokenized."""
        store = ParquetStateStore(state_dir)
        m = store.manifest()
        if m is None:
            raise ValueError(f"no committed state manifest under {state_dir}")
        self = cls(n_buckets=m["params"]["n_buckets"])
        self._store = store
        self._spark = spark
        self.batches_seen = m["batches"]
        # retrievable immediately; the parquet bind happens on first
        # .tf/.dl access (lazy)
        self._mark_stale()
        return self

    def _bucket(self, token_col) -> F.Column:
        return F.pmod(F.xxhash64(token_col), F.lit(self.n_buckets)).cast(
            "int"
        )

    def update(
        self,
        batch_docs: DataFrame,
        epoch_id: int | None = None,
        epoch_lineage: str | None = None,
    ) -> None:
        """Tokenize one batch of (doc_id, text) documents and append
        its term frequencies and doc lengths.  Replay guard: the
        shared lineage-scoped epoch high-water mark."""
        if self._store is not None:
            if self._store.should_skip_epoch(epoch_id, epoch_lineage):
                return
        elif self._mem_guard.should_skip(epoch_id, epoch_lineage):
            return
        tf_b = (
            batch_docs.select(
                "doc_id", F.explode(tokens("text")).alias("token")
            )
            .groupBy("doc_id", "token")
            .agg(F.count(F.lit(1)).alias("tf"))
            .withColumn("tbucket", self._bucket(F.col("token")))
        )
        n = self.batches_seen
        if self._store is not None:
            spark = self._spark = batch_docs.sparkSession
            # the eager localCheckpoint is the batch's SINGLE source
            # evaluation (r13 recipe, r13-verdict #2 shape): doc
            # lengths are the per-doc sum of term frequencies and the
            # impact bounds are per-token aggregates over dl-annotated
            # postings, so both derive from the one materialized leaf
            # — a non-deterministic source cannot land mutually
            # inconsistent tables.  tf + dl + tstat then land in ONE
            # concurrent write_many wave (three cheap scans of the
            # in-memory leaf), replacing r13's serialized tf-write →
            # dir-walk → read-back → dl/tstat wave, which doubled the
            # per-fold cost paying for the bounds.  The (doc_id,
            # token, tf, tbucket) rows are narrow — the fat-array
            # caveat that steered the IVF fold to write+read-back does
            # not apply.  The tbucket repartition happens BEFORE the
            # checkpoint, so the tf write is a shuffle-free scan-out
            # of the leaf that is already clustered for the dynamic-
            # partition layout (annindex r12: a single-task write
            # serializes one file create per bucket).
            width = min(
                self.n_buckets, spark.sparkContext.defaultParallelism
            )
            tf_b = tf_b.repartition(width, "tbucket").localCheckpoint(
                eager=True
            )
            tables = ["dl"]
            try:
                if not tf_b.isEmpty():
                    dl_b = tf_b.groupBy("doc_id").agg(
                        F.sum("tf").alias("dl")
                    )
                    tstat_b = self._tstat_of(tf_b)
                    self._store.write_many(
                        [
                            ("tf", n, tf_b, ("tbucket",)),
                            ("dl", n, dl_b),
                            (
                                "tstat",
                                n,
                                tstat_b.repartition(width, "tbucket"),
                                ("tbucket",),
                            ),
                        ]
                    )
                    tables += ["tf", "tstat"]
                else:
                    # an empty micro-batch never writes the partitioned
                    # dirs at all (a zero-row hive-partitioned write
                    # lands a _SUCCESS-only dir no reader can bind a
                    # schema to); the flat dl write keeps its schema
                    # and ledgers harmlessly.
                    self._store.write(
                        "dl",
                        n,
                        spark.createDataFrame([], "doc_id long, dl long"),
                    )
            finally:
                tf_b.unpersist()
            self._store.commit(
                n,
                self._params(),
                epoch_id,
                tables=tuple(tables),
                epoch_lineage=epoch_lineage,
                partitioning={"tf": ("tbucket",), "tstat": ("tbucket",)},
            )
            self.batches_seen = n + 1
            if self.batches_seen % _CONSOLIDATE_EVERY == 0:
                self._store.compact(spark)
            # re-read LAZILY on next .tf/.dl access — a fold-only
            # stream never pays the read
            self._mark_stale()
            return
        # in-session: the checkpointed tf leaf is the single source
        # evaluation; dl/tstat accumulate as plans over the leaves
        tf_b = tf_b.localCheckpoint(eager=True)
        if not tf_b.isEmpty():
            dl_b = tf_b.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
            tstat_b = self._tstat_of(tf_b)
            self._extend_binding("tf", tf_b)
            self._extend_binding("dl", dl_b)
            self._extend_binding("tstat", tstat_b)
        self.batches_seen = n + 1
        if self.batches_seen % _CONSOLIDATE_EVERY == 0 and self.tf is not None:
            self._set_binding("tf", self.tf.localCheckpoint(eager=True))
            self._set_binding("dl", self.dl.localCheckpoint(eager=True))
            self._set_binding(
                "tstat", self.tstat.localCheckpoint(eager=True)
            )
        # mark ONLY after the fold's actions succeeded (review r11)
        self._mem_guard.mark(epoch_id, epoch_lineage)

    @staticmethod
    def _tstat_of(tf_b: DataFrame) -> DataFrame:
        """Per-token impact bounds of ONE batch: df (list length),
        max term frequency, min document length — associative, so the
        accumulated table re-aggregates to the corpus bounds.  The
        doc length rides in as a window sum (one doc_id shuffle)
        instead of a groupBy + join-back (two), shaving a shuffle off
        the fold's slowest write (r14; values identical — dl is the
        per-doc sum of tf either way)."""
        from pyspark.sql import Window

        return (
            tf_b.withColumn(
                "dl", F.sum("tf").over(Window.partitionBy("doc_id"))
            )
            .groupBy("token", "tbucket")
            .agg(
                F.count(F.lit(1)).alias("df"),
                F.max("tf").alias("max_tf"),
                F.min("dl").alias("min_dl"),
            )
        )

    def topk(
        self,
        queries: DataFrame,
        k: int = 10,
        k1: float = 1.2,
        b: float = 0.75,
        max_df: int | None = None,
        max_queries: int | None = 10_000,
    ) -> DataFrame:
        """(query_id, doc_id, score, rank) — output contract identical
        to ``bm25_topk`` over the accumulated corpus (same scoring
        chain, same rounding, same tie-break), so the incremental
        index must serve the batch operator's exact results.

        The bounded query batch's distinct terms are hashed to their
        buckets and the bucket list pushed as a static filter on the
        posting-list scan — on the durable layout the unprobed
        ``tbucket=`` dirs are skipped at the directory level
        (PartitionFilters), the lexical twin of the IVF index's
        probed-cell pruning."""
        if self.tf is None:
            raise ValueError("empty index: no batch has been folded")
        # the QUERY BATCH ITSELF is checkpointed once (bounded by the
        # serving contract), so the bucket collect, the max_queries
        # probe, and the scoring chain's tokenization all read one
        # materialized leaf — a non-deterministic queries DataFrame
        # cannot probe buckets the filter never kept (review r12: the
        # r11 annindex lesson applied to the raw batch, not just a
        # derived projection)
        queries = queries.localCheckpoint(eager=True)
        buckets = [
            r["b"]
            for r in queries.select(
                F.explode(F.array_distinct(tokens("query_text"))).alias(
                    "token"
                )
            )
            .select(self._bucket(F.col("token")).alias("b"))
            .distinct()
            .collect()
        ]
        tf = self.tf.where(F.col("tbucket").isin(buckets)).drop("tbucket")
        stats = self.dl.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").alias("n_corpus"),
        )
        scores = bm25_scores_from_index(
            tf,
            self.dl,
            stats,
            queries,
            k1=k1,
            b=b,
            max_df=max_df,
            max_queries=max_queries,
        )
        return bm25_rank_topk(scores, k)

    #: rounding guard for the MaxScore prune decision: pruning is
    #: decided on driver-float upper bounds while scores live in the
    #: snap-round-9 / DECIMAL-sum / round-6 discipline, so a term set
    #: is only declared non-essential when its bound sits this far
    #: BELOW the threshold — conservatively exact, never aggressive
    _PRUNE_EPS = 1e-5

    def topk_pruned(
        self,
        queries: DataFrame,
        k: int = 10,
        k1: float = 1.2,
        b: float = 0.75,
        max_queries: int | None = 10_000,
    ) -> DataFrame:
        """MaxScore-pruned serving (Turtle & Flood 1995; the
        block-max/WAND family's term-at-a-time member) — output
        contract IDENTICAL to :meth:`topk` / batch ``bm25_topk``
        (r12 verdict #7).  Per query:

        1. Upper-bound each query term's possible contribution from
           the STORED per-list bounds: ``ub(t) = idf(df_t) ·
           norm(max_tf_t, min_dl_t)`` (norm is increasing in tf,
           decreasing in dl, so the bound is valid for every posting).
        2. Threshold ``θ`` = the k-th best SINGLE-TERM score over the
           highest-ub term's posting list — a realized partial score,
           hence a lower bound on the true k-th best full score.
        3. Terms whose ascending-ub prefix sum stays below
           ``θ − _PRUNE_EPS`` are NON-ESSENTIAL: a document matching
           only those terms scores strictly below θ and can neither
           enter nor tie into the top-k (ties break on doc_id, so
           strictness matters).  Candidates are generated from the
           ESSENTIAL lists only — the skipped lists' buckets never
           reach the candidate scan (PartitionFilters beyond the
           ``max_df`` valve) — then candidates are scored EXACTLY
           against all query terms.

        Results are exact by construction; with a degenerate θ (fewer
        than k postings under the top term) nothing is pruned and the
        serve degrades to the unpruned plan.  ``last_prune_stats``
        records the split.  The per-term df used for idf comes from
        the stored tstat sums — identical integers to the probed
        ``dft`` aggregate, so the float chain cannot drift.

        Exactness additionally leans on the class's append-not-upsert
        doc_id contract (advice r13): θ takes the k-th best partial by
        row_number over (doc_id, token) posting rows, which equals the
        k-th best PER-DOC partial only because doc_ids are unique
        across batches.  An upserted doc would not merely double-count
        its score (as :meth:`topk` would) — it would inflate θ past
        the true k-th bound and prune genuinely essential lists."""
        import math

        from connected_component_spark.operators.text import roundd

        if self.tf is None:
            raise ValueError("empty index: no batch has been folded")
        if self.tstat is None:
            raise ValueError(
                "index lacks the tstat impact-bound table (pre-r13 "
                "state layout) — rebuild the index or serve via topk()"
            )
        if self._store is not None:
            # the bounds are only valid if EVERY committed tf batch
            # also wrote tstat — a pre-r13 state dir resumed and
            # extended under this code would otherwise carry a
            # partially-covered tstat whose df/max_tf/min_dl understate
            # the corpus and prune genuinely essential lists (r13
            # review)
            m = self._store.manifest() or {}
            t = m.get("tables") or {}
            gens = m.get("gens") or {}
            if not set(t.get("tf", [])) <= set(t.get("tstat", [])) or (
                gens.get("tf") is not None and gens.get("tstat") is None
            ):
                raise ValueError(
                    "tstat impact bounds do not cover every committed "
                    "tf batch (state dir predates the r13 layout) — "
                    "rebuild the index or serve via topk()"
                )
        spark = queries.sparkSession
        queries = queries.localCheckpoint(eager=True)
        if max_queries is not None:
            if queries.limit(max_queries + 1).count() > max_queries:
                raise ValueError(
                    f"topk_pruned: query batch exceeds max_queries="
                    f"{max_queries} — the query-term table is collected "
                    "and broadcast, so corpus-scale query sets must be "
                    "chunked (or pass max_queries=None after sizing the "
                    "batch yourself)"
                )
        qterms = queries.select(
            "query_id",
            F.explode(F.array_distinct(tokens("query_text"))).alias("token"),
        )
        # ONE bounded collect: (query_id, token, bucket) rows
        qt_rows = qterms.withColumn(
            "b", self._bucket(F.col("token"))
        ).collect()
        if not qt_rows:
            return bm25_rank_topk(
                spark.createDataFrame(
                    [], "query_id long, doc_id long, score double"
                ),
                k,
            )
        buckets = sorted({r["b"] for r in qt_rows})
        all_tokens = sorted({r["token"] for r in qt_rows})
        # per-token corpus bounds from the stored table (bounded:
        # ≤ |distinct query terms| rows after the aggregate)
        ts = (
            self.tstat.where(F.col("tbucket").isin(buckets))
            .where(F.col("token").isin(all_tokens))
            .groupBy("token")
            .agg(
                F.sum("df").alias("df"),
                F.max("max_tf").alias("max_tf"),
                F.min("min_dl").alias("min_dl"),
            )
            .collect()
        )
        srow = self.dl.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").alias("n_corpus"),
        ).first()
        n_docs, n_corpus = int(srow["n_docs"]), int(srow["n_corpus"])
        stat = {r["token"]: r for r in ts}

        def idf(df: int) -> float:
            return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

        def ub(t: str) -> float:
            s = stat[t]
            mtf, mdl = int(s["max_tf"]), int(s["min_dl"])
            nm = (mtf * (k1 + 1.0)) / (
                mtf + k1 * ((1.0 - b) + b * (mdl * n_docs) / float(n_corpus))
            )
            return idf(int(s["df"])) * nm + 1e-9  # pad: snap-round slack

        per_q: dict = {}
        for r in qt_rows:
            if r["token"] in stat:  # unindexed terms contribute nothing
                per_q.setdefault(r["query_id"], []).append(r["token"])
        # θ per query: k-th best single-term partial score over the
        # top-ub term's postings — one bounded job over the pruned scan
        tstar = {q: max(toks, key=lambda t: (ub(t), t)) for q, toks in per_q.items()}
        theta = {q: 0.0 for q in per_q}
        if tstar:
            pair_df = spark.createDataFrame(
                sorted(tstar.items()), "query_id long, token string"
            )
            df_lit = spark.createDataFrame(
                [(t, int(stat[t]["df"])) for t in sorted(set(tstar.values()))],
                "token string, df long",
            )
            star_buckets = sorted(
                {
                    r["b"]
                    for r in qt_rows
                    # a query whose terms are ALL unindexed has no
                    # tstar entry — it simply gets no rows, like topk()
                    if r["token"] == tstar.get(r["query_id"])
                }
            )
            tf_star = self.tf.where(
                F.col("tbucket").isin(star_buckets)
            ).where(F.col("token").isin(sorted(set(tstar.values()))))
            from connected_component_spark.operators.text import (
                bm25_idf_col,
                bm25_norm_col,
            )

            star = tf_star.join(F.broadcast(pair_df), "token")
            # candidate-bounded dl (advice r13): the θ job's doc set
            # is bounded by the probed top-ub posting lists, so reduce
            # the corpus-wide doc-length table to those doc_ids
            # (broadcast semi-join — dl streams, no shuffle) and
            # broadcast the reduced result, mirroring
            # bm25_scores_from_index's max_df branch.
            dl_star = F.broadcast(
                self.dl.join(
                    F.broadcast(star.select("doc_id").distinct()), "doc_id"
                )
            )
            partial = (
                star.join(dl_star, "doc_id")
                .join(F.broadcast(df_lit), "token")
                .select(
                    "query_id",
                    "doc_id",
                    roundd(
                        bm25_idf_col(F.col("df"), F.lit(n_docs))
                        * bm25_norm_col(
                            F.col("tf"),
                            F.col("dl"),
                            F.lit(n_docs),
                            F.lit(float(n_corpus)),
                            k1,
                            b,
                        ),
                        9,
                    )
                    .cast("decimal(12,9)")
                    .alias("c"),
                )
                .select(
                    "query_id",
                    "doc_id",
                    roundd(F.col("c").cast("double"), 6).alias("s"),
                )
            )
            from pyspark.sql import Window

            w = Window.partitionBy("query_id").orderBy(
                F.col("s").desc(), F.col("doc_id").asc()
            )
            kth = (
                partial.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == k)
                .select("query_id", "s")
                .collect()
            )
            theta.update({r["query_id"]: float(r["s"]) for r in kth})

        essential: list[tuple] = []
        skipped = 0
        for q, toks in per_q.items():
            toks = sorted(toks, key=lambda t: (ub(t), t))
            cum = 0.0
            for i, t in enumerate(toks):
                cum += ub(t)
                if cum >= theta[q] - self._PRUNE_EPS:
                    essential.extend((q, t) for t in toks[i:])
                    skipped += i
                    break
            else:  # unreachable (θ ≤ ub(t*) ≤ Σ ubs); defensive: no prune
                essential.extend((q, t) for t in toks)
        self.last_prune_stats = {
            "queries": len(per_q),
            "essential_pairs": len(essential),
            "skipped_pairs": skipped,
        }

        ess_df = spark.createDataFrame(
            sorted(essential), "query_id long, token string"
        )
        ess_tokens = sorted({t for _, t in essential})
        ess_set = set(essential)  # hoisted: O(pairs), not O(pairs²)
        ess_buckets = sorted(
            {
                r["b"]
                for r in qt_rows
                if (r["query_id"], r["token"]) in ess_set
            }
        )
        # candidate generation touches ONLY the essential lists: the
        # token filter prunes rows and the bucket filter prunes whole
        # tbucket= directories the essential terms never hash to
        cand = (
            self.tf.where(F.col("tbucket").isin(ess_buckets))
            .where(F.col("token").isin(ess_tokens))
            .join(F.broadcast(ess_df), "token")
            .select("query_id", "doc_id")
            .distinct()
        )
        # exact full scoring of the candidates against ALL query terms
        qt_df = spark.createDataFrame(
            sorted({(r["query_id"], r["token"]) for r in qt_rows if r["token"] in stat}),
            "query_id long, token string",
        )
        df_all = spark.createDataFrame(
            [(t, int(stat[t]["df"])) for t in sorted(stat)],
            "token string, df long",
        )
        needed = cand.join(F.broadcast(qt_df), "query_id")
        tf_probed = self.tf.where(F.col("tbucket").isin(buckets)).where(
            F.col("token").isin(sorted(stat))
        )
        from connected_component_spark.operators.text import (
            bm25_idf_col,
            bm25_norm_col,
        )

        idf_col = bm25_idf_col(F.col("df"), F.lit(n_docs))
        norm_col = bm25_norm_col(
            F.col("tf"),
            F.col("dl"),
            F.lit(n_docs),
            F.lit(float(n_corpus)),
            k1,
            b,
        )
        # candidate-bounded dl for the exact scoring join too (advice
        # r13): candidates are bounded by the essential posting lists,
        # so dl shrinks to the candidate doc_ids and broadcasts
        # instead of shuffling corpus-wide.
        dl_cand = F.broadcast(
            self.dl.join(
                F.broadcast(cand.select("doc_id").distinct()), "doc_id"
            )
        )
        contrib = (
            needed.join(tf_probed, ["doc_id", "token"])
            .join(dl_cand, "doc_id")
            .join(F.broadcast(df_all), "token")
            .select(
                "query_id",
                "doc_id",
                roundd(idf_col * norm_col, 9)
                .cast("decimal(12,9)")
                .alias("c"),
            )
        )
        scores = contrib.groupBy("query_id", "doc_id").agg(
            roundd(F.sum("c").cast("double"), 6).alias("score")
        )
        return bm25_rank_topk(scores, k)


def run_doc_index_stream(
    doc_stream: DataFrame,
    state: IncrementalBM25,
    checkpoint_dir: str | None = None,
) -> IncrementalBM25:
    """Drive an IncrementalBM25 from a streaming DataFrame of
    (doc_id, text) rows via ``foreachBatch`` with the available-now
    trigger — the shared ingestion harness (store.run_state_stream).
    With ``checkpoint_dir`` (and a durable ``state``), a restarted
    stream replays only uncommitted epochs and the lineage-scoped
    epoch guard makes indexing exactly-once."""
    return run_state_stream(
        doc_stream,
        state,
        prepare=lambda df: df.select("doc_id", "text"),
        checkpoint_dir=checkpoint_dir,
    )
