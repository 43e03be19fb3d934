"""Incremental passage-level dedup over a document stream.

The winnowing sibling of ``streaming/dedup.py:IncrementalDedup`` —
continuous ingestion is where passage-level contamination actually
arrives in a training pipeline: maintain the running corpus as a
(doc_id, fp) winnowing-fingerprint state and fold each micro-batch in
via ``foreachBatch``.  Each arriving doc is classified as
dup_of_corpus (shares >= min_shared fingerprints with a doc from an
EARLIER batch), dup_in_batch, or novel; the batch's fingerprints then
join the state.

Fingerprints are a per-document pure function (operators/dedup.py:
winnow_fingerprints), so the incremental shared-fingerprint count
between any two docs equals the whole-corpus batch computation's —
the stream's classification is exactly the global winnow-pair oracle
with batch boundaries applied, the same contract IncrementalDedup
holds for minhash.

Scale notes: per-batch work is O(batch + matched postings) — the
batch's fingerprint table is BROADCAST into one scan of the state
(the 100 TB corpus is fingerprinted exactly once, on arrival, and
never re-tokenized), and the batch×batch self-join runs on the batch
only.  ``max_state_df`` is the posting-list valve: a fingerprint
whose accumulated posting list exceeds it (corpus-wide boilerplate)
is skipped at match time, bounding the per-batch join fan-out the
way ``winnow_pairs``'s df-cap bounds the batch operator.  The valve
consults state as of each batch, so it is deliberately OFF (None) in
the oracle-checked query — a time-dependent cap has no engine-
independent global replay.

Durability (verdict r10 #1): pass ``state_dir`` and the fingerprint
state + classifications live as per-batch parquet appends committed
through :class:`~connected_component_spark.streaming.store.
ParquetStateStore`'s atomic manifest — a session restart resumes via
:meth:`IncrementalWinnow.load` with every committed batch intact, and
a batch that crashed mid-fold is re-folded exactly-once (its partial
writes are overwritten, the manifest never saw them).  Without
``state_dir`` the state is held in-session (DataFrame unions +
``localCheckpoint`` consolidation) — fine for a bounded backlog
replay, lost on restart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from connected_component_spark.operators.dedup import (
    classify_batch_matches,
    winnow_fingerprints,
)
from connected_component_spark.streaming.store import (
    CONSOLIDATE_EVERY,
    LazyBindings,
    MemEpochGuard,
    ParquetStateStore,
)

__all__ = ["IncrementalWinnow", "run_winnow_stream"]

#: patchable module alias of the shared cadence (store.py): collapse
#: the in-session union trees / compact the durable appends every
#: this-many batches
_CONSOLIDATE_EVERY = CONSOLIDATE_EVERY


class IncrementalWinnow(LazyBindings):
    """Mutable running passage-dedup state folded over document
    micro-batches.  The FIRST batch seeds the corpus and emits no
    classifications; every later batch appends one row per batch doc
    (doc_id, status, canonical_doc_id) to ``results``.  Batch doc_ids
    must all exceed every previously-seen doc_id (ingestion order),
    the same contract as IncrementalDedup.

    With ``state_dir`` set, state and results are parquet-backed and
    crash-durable (module docstring); the dir must be FRESH — resume
    an existing one with :meth:`load`.  ``epoch_id`` passed to
    :meth:`update` (the ``foreachBatch`` batch id) makes a replayed
    already-committed epoch a no-op, so a Structured-Streaming
    restart from a checkpointLocation folds each batch exactly once.
    """

    def __init__(
        self,
        k: int = 4,
        window: int = 4,
        min_shared: int = 2,
        max_state_df: int | None = None,
        state_dir: str | None = None,
    ) -> None:
        if min_shared < 1:
            raise ValueError(f"min_shared must be >= 1, got {min_shared}")
        if max_state_df is not None and max_state_df < 1:
            raise ValueError(
                f"max_state_df must be >= 1 or None, got {max_state_df}"
            )
        self.k = k
        self.window = window
        self.min_shared = min_shared
        self.max_state_df = max_state_df
        # fp: (doc_id, fp); results: (doc_id, status, canonical).
        # Durable path: committed state is re-read LAZILY on property
        # access (the IVF fold recipe r13, shared LazyBindings
        # contract since r14) — folds only mark views stale; between
        # compactions the fp binding is extended incrementally.
        self._init_bindings(("fp", "results"))
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
                    "it with IncrementalWinnow.load(spark, state_dir)"
                )
            self._store = store

    def _params(self) -> dict:
        return {
            "k": self.k,
            "window": self.window,
            "min_shared": self.min_shared,
            "max_state_df": self.max_state_df,
        }

    def _read_binding(self, table: str) -> DataFrame | None:
        """One committed-view read, deferred to first access after
        load()/compaction/fold."""
        store, spark = self._store, self._spark
        assert store is not None and spark is not None
        return store.read(spark, table, self.batches_seen)

    @property
    def fp_state(self) -> DataFrame | None:
        return self._binding("fp")

    @fp_state.setter
    def fp_state(self, df: DataFrame | None) -> None:
        self._set_binding("fp", df)

    @property
    def results(self) -> DataFrame | None:
        return self._binding("results")

    @results.setter
    def results(self, df: DataFrame | None) -> None:
        self._set_binding("results", df)

    @classmethod
    def load(cls, spark: SparkSession, state_dir: str) -> IncrementalWinnow:
        """Resume a durable state dir: operator params come from the
        committed manifest, and ``fp_state``/``results`` bind to the
        committed parquet — the restarted stream continues exactly
        where the last COMMITTED batch left off."""
        store = ParquetStateStore(state_dir)
        m = store.manifest()
        if m is None:
            raise ValueError(f"no committed state manifest under {state_dir}")
        p = m["params"]
        self = cls(
            k=p["k"],
            window=p["window"],
            min_shared=p["min_shared"],
            max_state_df=p["max_state_df"],
        )
        self._store = store
        self._spark = spark
        self.batches_seen = m["batches"]
        # servable immediately; the parquet binds happen on first
        # state access (lazy, the IVF load recipe)
        self._mark_stale()
        return self

    def _batch_classification(
        self, st: DataFrame, fp_b: DataFrame, ids_b: DataFrame
    ) -> DataFrame:
        """Classify one batch against accumulated state ``st`` — the
        shared core of the in-session and durable paths."""
        if self.max_state_df is not None:
            by_fp = Window.partitionBy("fp")
            st = (
                st.withColumn("_df", F.count(F.lit(1)).over(by_fp))
                .where(F.col("_df") <= self.max_state_df)
                .drop("_df")
            )
        cross = (
            st.join(
                F.broadcast(fp_b.withColumnRenamed("doc_id", "b_id")),
                "fp",
            )
            .groupBy(F.col("doc_id").alias("a"), F.col("b_id").alias("b"))
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .where(F.col("n_shared") >= self.min_shared)
            .select("a", "b")
        )
        # intra-batch pairs from the batch fingerprint table (a
        # checkpointed leaf in-session; a deterministic plan over the
        # checkpointed raw batch on the durable path — the SOURCE is
        # never re-read either way); a < b orients the earlier batch
        # doc as the canonical candidate
        left = fp_b.withColumnRenamed("doc_id", "a")
        right = fp_b.withColumnRenamed("doc_id", "b")
        intra = (
            left.join(right, "fp")
            .where(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .where(F.col("n_shared") >= self.min_shared)
            .select("a", "b")
        )
        return classify_batch_matches(cross.unionByName(intra), ids_b)

    def update(
        self,
        batch_docs: DataFrame,
        epoch_id: int | None = None,
        epoch_lineage: str | None = None,
    ) -> None:
        """Fold one batch of (doc_id, text) documents into the state.
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
        fp_b = winnow_fingerprints(
            batch_docs, k=self.k, window=self.window
        ).localCheckpoint(eager=True)
        # per-doc id leaf from the batch, CHECKPOINTED: the accumulated
        # results union is evaluated after the stream ends, and a plan
        # still referencing the raw micro-batch DataFrame would re-read
        # source data the batch contract no longer guarantees exists
        # (the streaming/dedup.py ADVICE-r6 lesson).  A doc too short
        # to emit any fingerprint still gets its row (classified novel).
        ids_b = batch_docs.select("doc_id").localCheckpoint(eager=True)

        if self.fp_state is not None:
            out = self._batch_classification(self.fp_state, fp_b, ids_b)
            # bounded-depth plan over checkpointed leaves only (fp_b /
            # ids_b / the state union) — no extra checkpoint needed
            self.results = (
                out if self.results is None else self.results.unionByName(out)
            )

        self.fp_state = (
            fp_b
            if self.fp_state is None
            else self.fp_state.unionByName(fp_b)
        )
        self.batches_seen += 1
        if self.batches_seen % _CONSOLIDATE_EVERY == 0:
            self.fp_state = self.fp_state.localCheckpoint(eager=True)
            if self.results is not None:
                self.results = self.results.localCheckpoint(eager=True)
        # mark ONLY after the fold's actions succeeded — marking first
        # would classify a failed fold's retry as a replay (review r11)
        self._mem_guard.mark(epoch_id, epoch_lineage)

    def _update_durable(
        self,
        batch_docs: DataFrame,
        epoch_id: int | None,
        epoch_lineage: str | None,
    ) -> None:
        """One fold on the parquet-backed path: land the batch's
        fingerprints, classify against COMMITTED state, land the
        classifications, then commit the manifest — a crash anywhere
        before the commit leaves the committed view untouched and the
        re-folded batch overwrites its own partial writes."""
        store = self._store
        assert store is not None
        if store.should_skip_epoch(epoch_id, epoch_lineage):
            return  # replayed, already committed: exactly-once
        spark = batch_docs.sparkSession
        self._spark = spark
        n = self.batches_seen
        # the IVF fold recipe (r13): the raw bounded micro-batch is
        # evaluated EXACTLY ONCE into a checkpoint leaf — the
        # fingerprint table and the classification's batch ids derive
        # from the same materialized rows (previously the ids re-read
        # the raw batch, so a non-deterministic source could classify
        # ids the fp table never saw).  The fingerprint table itself
        # is checkpointed too: winnowing is a windowed (shuffling)
        # computation, and the classification plan consumes it three
        # times — one evaluation, then leaf reads.  The fold's writes
        # land in ONE concurrent write_many wave, and the committed
        # view is re-read lazily / extended incrementally.
        batch = batch_docs.select("doc_id", "text").localCheckpoint(
            eager=True
        )
        fp_b = winnow_fingerprints(
            batch, k=self.k, window=self.window
        ).localCheckpoint(eager=True)
        writes: list[tuple] = [("fp", n, fp_b)]
        tables = ["fp"]
        if n > 0:
            # self.fp_state is bound to the COMMITTED read (batches
            # 0..n-1) — exactly the earlier-batch corpus
            out = self._batch_classification(
                self.fp_state, fp_b, batch.select("doc_id")
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
        # Compaction rewrites/deletes dirs: rebuild bindings lazily.
        if self.batches_seen % _CONSOLIDATE_EVERY == 0:
            store.compact(spark)
            self._mark_stale()
            return
        # between compactions the committed dirs are immutable:
        # extend the fp binding with ONE leaf read instead of
        # re-listing the whole table per fold
        if self._binding_current("fp"):
            self._extend_binding("fp", store.read_batch(spark, "fp", n))
        self._mark_stale("results")


def run_winnow_stream(
    doc_stream: DataFrame,
    state: IncrementalWinnow | None = None,
    checkpoint_dir: str | None = None,
) -> IncrementalWinnow:
    """Drive an IncrementalWinnow from a streaming DataFrame of
    (doc_id, text) rows via ``foreachBatch`` with the available-now
    trigger (processes the backlog as micro-batches, then stops).
    With ``checkpoint_dir`` (and a durable ``state``), a restarted
    stream replays only from the last uncommitted epoch and the
    epoch-id skip makes the fold exactly-once end to end."""
    from connected_component_spark.streaming.store import run_state_stream

    return run_state_stream(
        doc_stream,
        state or IncrementalWinnow(),
        prepare=lambda df: df.select("doc_id", "text"),
        checkpoint_dir=checkpoint_dir,
    )
