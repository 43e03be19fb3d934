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
    MemEpochGuard,
    ParquetStateStore,
    run_state_stream,
)

__all__ = ["IncrementalBM25", "run_doc_index_stream"]

#: patchable module alias of the shared cadence (store.py)
_CONSOLIDATE_EVERY = CONSOLIDATE_EVERY


class IncrementalBM25:
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
        self._tf: DataFrame | None = None  # (doc_id, token, tf, tbucket)
        self._dl: DataFrame | None = None  # (doc_id, dl)
        self._state_stale = False  # durable path: re-read on next access
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
        parquet read is LAZY (the annindex r12 pattern): folds only
        mark the view stale; the one basePath-discovery scan happens
        on first access after the fold."""
        self._refresh()
        return self._tf

    @property
    def dl(self) -> DataFrame | None:
        """The committed doc-length table (lazy like :attr:`tf`)."""
        self._refresh()
        return self._dl

    def _refresh(self) -> None:
        if self._state_stale:
            spark = self._spark or SparkSession.getActiveSession()
            self._tf = self._read_tf(spark)
            self._dl = self._store.read(spark, "dl", self.batches_seen)
            self._state_stale = False

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
        self._state_stale = True
        return self

    def _read_tf(self, spark: SparkSession) -> DataFrame | None:
        """The committed posting lists with ``tbucket`` restored to
        int — hive-partition value inference types it from the dir
        names."""
        df = self._store.read(spark, "tf", self.batches_seen)
        if df is None:
            return None
        return df.withColumn("tbucket", F.col("tbucket").cast("int"))

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
        tok = batch_docs.select(
            "doc_id", F.explode(tokens("text")).alias("token")
        )
        tf_b = (
            tok.groupBy("doc_id", "token")
            .agg(F.count(F.lit(1)).alias("tf"))
            .withColumn("tbucket", self._bucket(F.col("token")))
        )
        dl_b = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
        n = self.batches_seen
        if self._store is not None:
            spark = self._spark = batch_docs.sparkSession
            # independent projections of one tokenize, landed
            # concurrently; the tf batch dir IS the bucketed
            # posting-list layout.  The repartition spreads the
            # dynamic-partition write across tasks (the annindex r12
            # lesson: a single-task write serializes one file create
            # per bucket).
            width = min(
                self.n_buckets, spark.sparkContext.defaultParallelism
            )
            self._store.write_many(
                [
                    ("tf", n, tf_b.repartition(width, "tbucket"), ("tbucket",)),
                    ("dl", n, dl_b),
                ]
            )
            # an empty micro-batch must not LEDGER the partitioned tf
            # dir (a zero-row hive-partitioned write lands a
            # _SUCCESS-only dir no reader can bind a schema to); the
            # flat dl write keeps its schema and ledgers harmlessly.
            # Emptiness derives from the write that already happened.
            tables = ["dl"]
            if self._store.batch_has_data("tf", n):
                tables.append("tf")
            else:
                self._store.discard_batch("tf", n)
            self._store.commit(
                n,
                self._params(),
                epoch_id,
                tables=tuple(tables),
                epoch_lineage=epoch_lineage,
                partitioning={"tf": ("tbucket",)},
            )
            self.batches_seen = n + 1
            if self.batches_seen % _CONSOLIDATE_EVERY == 0:
                self._store.compact(spark)
            # re-read LAZILY on next .tf/.dl access — a fold-only
            # stream never pays the read
            self._state_stale = True
            return
        # in-session: checkpointed leaves accumulate as unions
        tf_b = tf_b.localCheckpoint(eager=True)
        dl_b = dl_b.localCheckpoint(eager=True)
        if not tf_b.isEmpty():
            self._tf = tf_b if self._tf is None else self._tf.unionByName(tf_b)
            self._dl = dl_b if self._dl is None else self._dl.unionByName(dl_b)
        self.batches_seen = n + 1
        if self.batches_seen % _CONSOLIDATE_EVERY == 0 and self._tf is not None:
            self._tf = self._tf.localCheckpoint(eager=True)
            self._dl = self._dl.localCheckpoint(eager=True)
        # mark ONLY after the fold's actions succeeded (review r11)
        self._mem_guard.mark(epoch_id, epoch_lineage)

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
