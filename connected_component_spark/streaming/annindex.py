"""Continuously-ingested IVF index: ANN serving as durable state.

The fourth incremental operator on the ParquetStateStore contract
(dedup, winnow, CC — and now the ANN index): a production retrieval
system does not rebuild its index per corpus snapshot — vectors
ARRIVE, are assigned once to the FIXED trained coarse cells, and are
servable immediately (FAISS's ``add`` after ``train``).  With a fixed
codebook the cell of a vector is a pure function of the vector, so
the incrementally-built index serves results IDENTICAL to batch
``operators/similarity.py:ivf_topk`` over the same corpus and
codebook — which is this operator's oracle contract, exactly the
claim pattern of ``stream_winnow_restart``.

State tables: ``index`` (vec_id, embedding, cell — the natural IVF
layout: stored vector and its inverted-list key in ONE row, so each
fold lands one table write and serving is one scan with parquet
column pruning giving the narrow reads; this replaced the original
two-table cells/vecs layout, whose per-fold second write and
serve-time join bought nothing).  The codebook itself rides as table
``codebook`` so :meth:`load` restores a servable index with no
side-channel.  Scale shape: per-batch work is one bounded batch ×
broadcast-codebook assignment; serving probes ``nprobe`` cells per
query via equi-join on the cell key — the corpus is never
re-assigned at query time (unlike the batch operator, which
recomputes the storage assignment per call).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from connected_component_spark.functions.vectors import dot, l2_norm
from connected_component_spark.operators.similarity import (
    _normed,
    ivf_cell_assignments,
    roundd,
)
from connected_component_spark.streaming.store import (
    CONSOLIDATE_EVERY,
    LazyBindings,
    MemEpochGuard,
    ParquetStateStore,
    run_state_stream,
)

__all__ = ["IncrementalIVF", "run_vec_stream"]

#: patchable module alias of the shared cadence (store.py)
_CONSOLIDATE_EVERY = CONSOLIDATE_EVERY


class IncrementalIVF(LazyBindings):
    """Mutable IVF index folded over embedding micro-batches against a
    FIXED coarse codebook (``centroids``: a (id_col, vec_col)
    DataFrame, e.g. ``operators/clustering.py:kmeans_centroids``
    output).  With ``state_dir`` the inverted lists, stored vectors,
    and codebook are parquet-backed and crash-durable; resume with
    :meth:`load`.  Batch vec_ids must be previously unseen (appends,
    not upserts — the batch contract of the sibling operators)."""

    def __init__(
        self,
        centroids: DataFrame | None = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        state_dir: str | None = None,
    ) -> None:
        if centroids is None:
            # resume is only ever via load(), which constructs with the
            # stored codebook - a fresh state_dir cannot stand in for
            # centroids (review r11)
            raise ValueError(
                "IncrementalIVF needs centroids (resume an existing "
                "state dir with IncrementalIVF.load(spark, state_dir))"
            )
        self.id_col = id_col
        self.vec_col = vec_col
        self.codebook = centroids
        self._dim: int | None = None
        self._ncells_cached: int | None = None
        self._init_bindings(("index",))  # (id, vec, cell)
        self.batches_seen = 0
        self._mem_guard = MemEpochGuard()
        self._store: ParquetStateStore | None = None
        if state_dir is not None:
            store = ParquetStateStore(state_dir)
            if store.manifest() is not None:
                raise ValueError(
                    f"{state_dir} already holds committed state — resume "
                    "it with IncrementalIVF.load(spark, state_dir)"
                )
            self._store = store

    @property
    def index(self) -> DataFrame | None:
        """The committed (id, vec, cell) index.  On the durable path
        the parquet read is LAZY (r12, shared LazyBindings contract
        since r14): folds only mark the view stale, and the one
        basePath-discovery scan happens on first access after the
        fold — per-fold re-reads used to cost one file-listing +
        schema job each, growing with state size."""
        return self._binding("index")

    @index.setter
    def index(self, df: DataFrame | None) -> None:
        self._set_binding("index", df)

    def _params(self) -> dict:
        return {"id_col": self.id_col, "vec_col": self.vec_col}

    def _codebook_dim(self) -> int:
        """Codebook vector width, resolved once (one bounded row from
        the codebook-sized table)."""
        if self._dim is None:
            row = self.codebook.select(
                F.size(F.col(self.vec_col)).alias("d")
            ).first()
            self._dim = int(row["d"])
        return self._dim

    def _ncells(self) -> int:
        """Codebook cell count, resolved once — sizes the durable
        fold's write parallelism (one count over the bounded
        codebook-sized table)."""
        if self._ncells_cached is None:
            self._ncells_cached = max(1, self.codebook.count())
        return self._ncells_cached

    @classmethod
    def load(cls, spark: SparkSession, state_dir: str) -> IncrementalIVF:
        """Resume a durable index: codebook, inverted lists, and
        stored vectors bind to the committed parquet — servable
        immediately, no retraining or reassignment."""
        import os

        store = ParquetStateStore(state_dir)
        m = store.manifest()
        if m is None:
            raise ValueError(f"no committed state manifest under {state_dir}")
        # the retired two-table cells/vecs layout: detectable via the
        # ledger, or — for a pre-ledger manifest — via its directories
        # still sitting under state_dir (advice r11: without the dir
        # probe such a store would fail later with a misleading
        # missing-codebook / empty-index error).  Checked FIRST so the
        # rebuild message wins over any downstream read failure.
        ledger = m.get("tables") or {}
        if "cells" in ledger or (
            not ledger
            and any(
                os.path.isdir(os.path.join(state_dir, d))
                for d in ("cells", "vecs")
            )
        ):
            raise ValueError(
                f"{state_dir} holds the retired two-table cells/vecs "
                "layout — rebuild the index (the single-table `index` "
                "layout replaced it)"
            )
        p = m["params"]
        codebook = store.read(spark, "codebook", m["batches"])
        if codebook is None:
            raise ValueError(f"no committed codebook under {state_dir}")
        self = cls(
            centroids=codebook, id_col=p["id_col"], vec_col=p["vec_col"]
        )
        self._store = store
        self.batches_seen = m["batches"]
        # servable immediately; the actual parquet bind happens on
        # first .index access (lazy, r12)
        self._mark_stale()
        return self

    def _read_binding(self, table: str) -> DataFrame | None:
        """The committed index with ``cell`` restored to long —
        hive-partition value inference types small ids as int."""
        df = self._store.read(
            self.codebook.sparkSession, table, self.batches_seen
        )
        if df is None:
            return None
        return df.withColumn("cell", F.col("cell").cast("long"))

    def update(
        self,
        batch_vecs: DataFrame,
        epoch_id: int | None = None,
        epoch_lineage: str | None = None,
    ) -> None:
        """Assign one batch of (id, vector) rows to the fixed cells
        and append them to the index.  Replay guard: the shared
        lineage-scoped epoch high-water mark."""
        if self._store is not None:
            if self._store.should_skip_epoch(epoch_id, epoch_lineage):
                return
        elif self._mem_guard.should_skip(epoch_id, epoch_lineage):
            return
        batch = batch_vecs.select(self.id_col, self.vec_col)
        # in-plan width guard (the r10 PQ guard-symmetry lesson): an
        # off-width vector would zip_with a PREFIX of the centroid and
        # silently land in a garbage cell — raise instead, as a filter
        # Catalyst cannot prune
        dim = self._codebook_dim()
        batch = batch.where(
            F.when(
                # isNull first: size(NULL) is NULL, which would fall
                # through to otherwise(True) and store a NULL vector
                # in a garbage cell (review r11)
                F.col(self.vec_col).isNull()
                | (F.size(F.col(self.vec_col)) != F.lit(dim)),
                F.raise_error(
                    F.concat(
                        F.lit("IncrementalIVF: vector length "),
                        F.coalesce(
                            F.size(F.col(self.vec_col)).cast("string"),
                            F.lit("NULL"),
                        ),
                        F.lit(
                            f" != codebook dim {dim} — the batch does not"
                            " match the index's vector space"
                        ),
                    )
                ),
            ).otherwise(F.lit(True))
        )
        asg = ivf_cell_assignments(
            batch, self.codebook, self.id_col, self.vec_col, 1
        ).select(self.id_col, "cell")
        # one (id, vec, cell) row per batch vector — the join is
        # batch×batch on the id key (AQE broadcasts the bounded
        # assignment side), and it buys a single-table index layout:
        # one write per fold, one scan at serve
        indexed = batch.join(asg, self.id_col)
        n = self.batches_seen
        if self._store is not None:
            spark = batch_vecs.sparkSession
            # the (guarded) batch plan is evaluated EXACTLY ONCE per
            # fold — by the write itself (r12; this subsumes the r11
            # checkpoint-before-probe hardening: with a single
            # evaluation, a non-deterministic DataFrame handed to a
            # direct update() call cannot store inconsistent rows).
            # The repartition on the cell key spreads the dynamic-
            # partition write across tasks, each landing only the
            # cell= dirs it holds — a single-task write serializes one
            # file create per cell (~1 s/fold at fixture scale, and
            # the wrong shape for a large micro-batch anyway).
            width = min(self._ncells(), spark.sparkContext.defaultParallelism)
            writes = [
                ("index", n, indexed.repartition(width, "cell"), ("cell",))
            ]
            if n == 0:
                # the codebook is part of the index — a load() must
                # restore a servable state with no side-channel; it is
                # independent of the batch table, landed concurrently
                # (store.write_many)
                writes.append(("codebook", 0, self.codebook))
            self._store.write_many(writes)
            # an EMPTY micro-batch (a trigger that fired with no new
            # data) must not be LEDGERED for the index table: a hive-
            # partitioned write of zero rows lands a _SUCCESS-only dir
            # with no schema-bearing file, and a committed ledger entry
            # pointing at it would make every later read fail forever
            # (review r11).  Emptiness is derived from the write that
            # already happened (one dir walk, no second evaluation);
            # the commit below still runs so the epoch mark advances.
            tables = []
            if self._store.batch_has_data("index", n):
                tables.append("index")
            else:
                self._store.discard_batch("index", n)
            if n == 0:
                tables.append("codebook")
            self._store.commit(
                n,
                self._params(),
                epoch_id,
                tables=tuple(tables),
                epoch_lineage=epoch_lineage,
                partitioning={"index": ("cell",)},
            )
            self.batches_seen = n + 1
            if self.batches_seen % _CONSOLIDATE_EVERY == 0:
                self._store.compact(spark)
            # the committed view is re-read LAZILY on next .index
            # access (r12) — a fold-only stream never pays the read
            self._mark_stale()
            if n == 0:
                self.codebook = self._store.read(spark, "codebook", 1)
            return
        # in-session: the eager checkpoint is required anyway, and
        # isEmpty on the materialized leaf is a metadata check — no
        # extra evaluation of the batch plan
        indexed = indexed.localCheckpoint(eager=True)
        if not indexed.isEmpty():
            self._extend_binding("index", indexed)
        self.batches_seen = n + 1
        if self.batches_seen % _CONSOLIDATE_EVERY == 0 and self.index is not None:
            self.index = self.index.localCheckpoint(eager=True)
        # mark ONLY after the fold's actions succeeded - marking first
        # would classify a failed fold's retry (incl. one stopped by
        # the width guard) as a replay (review r11)
        self._mem_guard.mark(epoch_id, epoch_lineage)

    def topk(
        self, queries: DataFrame, k: int = 5, nprobe: int = 1
    ) -> DataFrame:
        """(query_id, neighbor_id, cos, rank): probe each query's
        ``nprobe`` nearest cells and rank the STORED candidates by
        exact rounded cosine — output contract identical to
        ``ivf_topk`` (rounding before ranking, neighbor-id tie-break,
        self-matches excluded), so the incremental index must serve
        the batch operator's exact results over the same corpus and
        codebook."""
        if self.index is None:
            raise ValueError("empty index: no batch has been folded")
        # the probe assignment is BOUNDED (|queries| × nprobe, and
        # queries are a bounded batch by the serving contract) — the
        # one collect a real IVF serve does.  COLLECTED once and
        # rebuilt as a literal relation (r12; replaces the r11
        # checkpoint+distinct pair — one job cheaper and stronger: the
        # partition filter and the probe join read the same frozen
        # rows, so a non-deterministic `queries` can never probe
        # different cells at join time than the filter kept).  The
        # probed list is a static filter, so the durable layout's
        # cell=N partition dirs are pruned at the scan (plan shows
        # PartitionFilters), not post-filtered after reading the
        # whole index.
        probe_src = ivf_cell_assignments(
            queries, self.codebook, self.id_col, self.vec_col, max(1, nprobe)
        ).select(self.id_col, "cell")
        probe_rows = probe_src.collect()
        probed = sorted({r["cell"] for r in probe_rows})
        # rebuild with the probe's OWN schema, not a hardcoded one —
        # the id column's type follows the caller's id_col contract
        # (review r12)
        probe = queries.sparkSession.createDataFrame(
            probe_rows, probe_src.schema
        )
        index = self.index.where(F.col("cell").isin(probed))
        q = _normed(queries, self.id_col, self.vec_col).select(
            F.col(self.id_col).alias("query_id"),
            F.col(self.vec_col).alias("qv"),
            l2_norm(F.col(self.vec_col)).alias("qn"),
        ).join(
            probe.select(F.col(self.id_col).alias("query_id"), "cell"),
            "query_id",
        )
        # single-table layout: the candidate side is ONE scan of the
        # index (vector, norm, cell all from the same row; the
        # as_double projection is _normed's, inlined to keep `cell`)
        from connected_component_spark.functions.vectors import as_double

        cand = index.select(
            F.col(self.id_col).alias("neighbor_id"),
            as_double(self.vec_col).alias("cv"),
            "cell",
        ).select(
            "neighbor_id", "cv", l2_norm(F.col("cv")).alias("cn"), "cell"
        )
        scored = (
            q.join(cand, "cell")
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id",
                "neighbor_id",
                roundd(
                    dot(F.col("qv"), F.col("cv"))
                    / (F.col("qn") * F.col("cn")),
                    6,
                ).alias("cos"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(
                "query_id",
                "neighbor_id",
                "cos",
                F.col("rank").cast("long").alias("rank"),
            )
        )


def run_vec_stream(
    vec_stream: DataFrame,
    state: IncrementalIVF,
    checkpoint_dir: str | None = None,
) -> IncrementalIVF:
    """Drive an IncrementalIVF from a streaming DataFrame of
    (id, vector) rows via ``foreachBatch`` with the available-now
    trigger — the same ingestion harness the dedup/winnow operators
    use (streaming/dedup.py:run_doc_stream), applied to the ANN
    index: vectors arrive as micro-batches, each fold assigns them to
    the fixed cells and appends durably, and the index is servable
    between triggers.  With ``checkpoint_dir`` (and a durable
    ``state``), a restarted stream replays only uncommitted epochs
    and the lineage-scoped epoch skip makes ingestion exactly-once."""

    return run_state_stream(
        vec_stream,
        state,
        prepare=lambda df: df.select(state.id_col, state.vec_col),
        checkpoint_dir=checkpoint_dir,
    )
