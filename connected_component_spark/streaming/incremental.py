"""Incremental connected components over an edge stream.

The reference computes CC on static snapshots
(``ConnectedComponent.scala:266-279``); this is the streaming
extension: maintain a running ``(node, component)`` assignment and
fold each micro-batch of new edges in via ``foreachBatch``.

Correctness invariant: the prior assignment, re-expressed as star
edges ``(node → component)``, preserves exactly the connectivity of
all previously-seen edges.  So CC over
``new_batch_edges ∪ prior_star_edges`` equals CC over the full edge
history — each micro-batch runs the alternating-star kernel on an
input whose size is O(new edges + distinct nodes), never the full
history.  That is the same compression the alternating algorithm
itself applies between rounds, lifted to the stream boundary.

Scale notes: per-batch work is bounded by batch size + node count;
``localCheckpoint`` cuts lineage across batches (the batch-loop twin
of the per-round checkpoint in graph/cc.py).

Durability (r11, the dedup/winnow contract extended to CC): pass
``state_dir`` and the assignment lives as a per-batch parquet
SNAPSHOT behind :class:`~connected_component_spark.streaming.store.
ParquetStateStore`'s atomic manifest — unlike the dedup operators'
append tables, CC state is REPLACED each batch, so ``load()`` binds
to the LATEST committed snapshot and a crashed mid-fold batch simply
re-folds over it.  The lineage-scoped epoch guard gives exactly-once
folds under at-least-once ``foreachBatch`` replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connected_component_spark.graph.cc import connected_components
from connected_component_spark.streaming.store import (
    MemEpochGuard,
    ParquetStateStore,
)

__all__ = ["IncrementalCC", "run_edge_stream"]


class IncrementalCC:
    """Mutable running-CC state folded over edge micro-batches.

    With ``state_dir`` set, the assignment is parquet-backed and
    crash-durable (module docstring); the dir must be FRESH — resume
    an existing one with :meth:`load`."""

    def __init__(
        self, max_iterations: int = 20, state_dir: str | None = None
    ) -> None:
        self.max_iterations = max_iterations
        self.assignments: DataFrame | None = None
        self.batches_seen = 0
        #: number of batches that actually ran the alternating-star
        #: kernel (vs. the no-connectivity-change fast paths)
        self.cc_runs = 0
        # in-session replay guard (the durable manifest's
        # last_epoch/epoch_lineage contract, held in memory)
        self._mem_guard = MemEpochGuard()
        self._store: ParquetStateStore | None = None
        if state_dir is not None:
            store = ParquetStateStore(state_dir)
            if store.manifest() is not None:
                raise ValueError(
                    f"{state_dir} already holds committed state — resume "
                    "it with IncrementalCC.load(spark, state_dir)"
                )
            self._store = store

    def _params(self) -> dict:
        return {
            "max_iterations": self.max_iterations,
            # diagnostics ride in the manifest so a resumed operator
            # reports honest totals
            "cc_runs": self.cc_runs,
        }

    @classmethod
    def load(cls, spark: SparkSession, state_dir: str) -> IncrementalCC:
        """Resume a durable state dir: the assignment binds to the
        LATEST committed snapshot and the fold counters continue from
        the manifest."""
        store = ParquetStateStore(state_dir)
        m = store.manifest()
        if m is None:
            raise ValueError(f"no committed state manifest under {state_dir}")
        p = m["params"]
        self = cls(max_iterations=p["max_iterations"])
        self._store = store
        self.batches_seen = m["batches"]
        self.cc_runs = p.get("cc_runs", 0)
        last = store.last_batch("assign")
        if last is not None:
            self.assignments = store.read_batch(spark, "assign", last)
        return self

    def _persist(self, df: DataFrame, batch_idx: int) -> DataFrame:
        """Materialize the new assignment: a parquet snapshot on the
        durable path (read back as the live handle), localCheckpoint
        in-session."""
        if self._store is None:
            return df.localCheckpoint(eager=True)
        self._store.write("assign", batch_idx, df)
        return self._store.read_batch(df.sparkSession, "assign", batch_idx)

    def _commit(self, batch_idx: int, epoch_id, epoch_lineage, wrote: bool):
        if self._store is not None:
            # snapshot semantics ride IN the commit (review r11 - no
            # second manifest write per fold): the ledger keeps only
            # this batch's assign dir and superseded snapshots are
            # dropped after the swap, so disk stays O(nodes)
            self._store.commit(
                batch_idx,
                self._params(),
                epoch_id,
                tables=("assign",) if wrote else (),
                epoch_lineage=epoch_lineage,
                snapshot_tables=("assign",),
            )

    def update(
        self,
        edge_batch: DataFrame,
        epoch_id: int | None = None,
        epoch_lineage: str | None = None,
    ) -> DataFrame:
        """Fold one batch of (src, dst) edges into the state; returns
        the updated (node, component) assignment.

        Fast paths: batch edges are first relabelled through the prior
        assignment.  An edge whose endpoints already share a component
        cannot change anything; an unseen node appearing only as a
        self-loop is a new singleton.  The alternating-star kernel
        runs only when some edge actually crosses components (or
        touches an unseen node non-trivially) — on a mature stream
        most micro-batches repeat known connectivity, so the steady
        state is one cheap relabel join per batch, not a kernel run
        per batch.  This is the production shape: kernel work scales
        with *connectivity novelty*, not with stream volume.

        ``epoch_id``/``epoch_lineage``: the replay guard shared with
        the dedup operators — an epoch at or below the high-water mark
        of the SAME lineage is a skipped replay (durable: manifest;
        in-session: in-memory mark).
        """
        if self._store is not None:
            if self._store.should_skip_epoch(epoch_id, epoch_lineage):
                return self.assignments
        elif self._mem_guard.should_skip(epoch_id, epoch_lineage):
            return self.assignments
        n = self.batches_seen
        if self.assignments is None:
            merged = edge_batch
        else:
            e = edge_batch.select("src", "dst")
            a_src = self.assignments.select(
                F.col("node").alias("src"), F.col("component").alias("__sc")
            )
            a_dst = self.assignments.select(
                F.col("node").alias("dst"), F.col("component").alias("__dc")
            )
            labelled = e.join(a_src, "src", "left").join(a_dst, "dst", "left")
            # a non-self edge forces the kernel iff an endpoint is
            # unseen or its endpoints sit in different components;
            # a self-loop of an unseen node is just a new singleton
            novel = (F.col("src") != F.col("dst")) & (
                F.col("__sc").isNull()
                | F.col("__dc").isNull()
                | (F.col("__sc") != F.col("__dc"))
            )
            counts = labelled.agg(
                F.sum(F.when(novel, 1).otherwise(0)).alias("novel_cross"),
                F.sum(
                    F.when(
                        (F.col("src") == F.col("dst")) & F.col("__sc").isNull(), 1
                    ).otherwise(0)
                ).alias("new_selfloops"),
            ).first()
            novel_cross = counts["novel_cross"] or 0
            new_selfloops = counts["new_selfloops"] or 0
            if novel_cross == 0:
                wrote = False
                if new_selfloops > 0:
                    # unseen nodes appear only as self-loops: append
                    # singletons (component = own id, the kernel's
                    # convention for isolated nodes)
                    singles = (
                        labelled.where(
                            (F.col("src") == F.col("dst"))
                            & F.col("__sc").isNull()
                        )
                        .select(
                            F.col("src").alias("node"),
                            F.col("src").alias("component"),
                        )
                        .distinct()
                    )
                    self.assignments = self._persist(
                        self.assignments.union(singles), n
                    )
                    wrote = True
                self._commit(n, epoch_id, epoch_lineage, wrote)
                self.batches_seen = n + 1
                # mark ONLY after the fold succeeded - marking first
                # would classify a failed fold's retry as a replay
                # (review r11); the durable path's mark is the commit
                self._mem_guard.mark(epoch_id, epoch_lineage)
                return self.assignments
            prior = self.assignments.select(
                F.col("node").alias("src"), F.col("component").alias("dst")
            )
            merged = e.union(prior)
        result = connected_components(merged, max_iterations=self.max_iterations)
        self.cc_runs += 1
        self.assignments = self._persist(result.assignments, n)
        self._commit(n, epoch_id, epoch_lineage, wrote=True)
        self.batches_seen = n + 1
        self._mem_guard.mark(epoch_id, epoch_lineage)
        return self.assignments


def run_edge_stream(
    edge_stream: DataFrame,
    state: IncrementalCC | None = None,
    derive_edges=None,
    checkpoint_dir: str | None = None,
) -> IncrementalCC:
    """Drive an IncrementalCC from a streaming DataFrame via
    ``foreachBatch`` with the available-now trigger (processes the
    backlog as micro-batches, then stops).

    ``derive_edges``: optional per-batch transform mapping the raw
    batch rows to (src, dst) edges — runs in batch context, so window
    functions etc. are available.  With ``checkpoint_dir`` (and a
    durable ``state``), a restarted stream replays only from the last
    uncommitted epoch and the lineage-scoped epoch guard makes the
    fold exactly-once end to end.
    """
    from connected_component_spark.streaming.store import run_state_stream

    return run_state_stream(
        edge_stream,
        state or IncrementalCC(),
        prepare=derive_edges,
        checkpoint_dir=checkpoint_dir,
    )
