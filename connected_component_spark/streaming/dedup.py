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
stream-boundary twin of the per-round checkpoint in graph/cc.py); on
a real cluster the two state tables would live as checkpointed
parquet/Delta keyed by band-bucket, appended per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from connected_component_spark.operators.dedup import (
    banded_buckets,
    banded_pairs,
    classify_batch_matches,
    jaccard_pairs_from_sets,
    minhash_signatures,
    word_shingles,
)

__all__ = ["IncrementalDedup", "run_doc_stream"]

#: consolidate the per-batch union trees into one materialized leaf
#: every this-many batches (keeps plan-analysis cost flat on a
#: long-running stream; between consolidations unions stay free)
_CONSOLIDATE_EVERY = 16


class IncrementalDedup:
    """Mutable running near-dedup state folded over document
    micro-batches.  The FIRST batch seeds the corpus and emits no
    classifications (there is nothing prior to compare against);
    every later batch appends its rows to ``results``."""

    def __init__(
        self,
        num_hashes: int = 16,
        bands: int = 4,
        shingle_k: int = 3,
        threshold: float = 0.5,
    ) -> None:
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows_per_band = num_hashes // bands
        self.shingle_k = shingle_k
        self.threshold = threshold
        self.band_state: DataFrame | None = None  # (doc_id, band, bucket)
        self.set_state: DataFrame | None = None  # (doc_id, sh)
        self.results: DataFrame | None = None  # (doc_id, status, canonical)
        self.batches_seen = 0

    def update(self, batch_docs: DataFrame) -> None:
        """Fold one batch of (doc_id, text) documents into the state.
        Batch doc_ids must all exceed every previously-seen doc_id
        (ingestion order), the same contract as the batch operator."""
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
            cross = (
                self.band_state.join(
                    F.broadcast(banded_b.withColumnRenamed("doc_id", "b_id")),
                    ["band", "bucket"],
                )
                .select(F.col("doc_id").alias("a"), F.col("b_id").alias("b"))
                .distinct()
            )
            # intra-batch candidates from the MATERIALIZED band table
            # (not lsh_candidate_pairs — that would recompute the
            # batch signatures from scratch)
            intra = banded_pairs(banded_b)
            verified = jaccard_pairs_from_sets(
                self.set_state.unionByName(sh_b), cross.unionByName(intra)
            ).where(F.col("jaccard") >= F.lit(self.threshold))
            # batch ids come from the CHECKPOINTED sh_b leaf (one row
            # per doc), never from batch_docs: the accumulated results
            # union is evaluated after the stream ends, and a plan that
            # still referenced the raw micro-batch DataFrame would
            # re-read source data the batch contract no longer
            # guarantees exists (ADVICE r6) — with staged parquet it
            # happens to work; with a cleaned-up or non-replayable
            # source it would be wrong
            out = classify_batch_matches(verified, sh_b.select("doc_id"))
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


def run_doc_stream(
    doc_stream: DataFrame, state: IncrementalDedup | None = None
) -> IncrementalDedup:
    """Drive an IncrementalDedup from a streaming DataFrame of
    (doc_id, text) rows via ``foreachBatch`` with the available-now
    trigger (processes the backlog as micro-batches, then stops)."""
    state = state or IncrementalDedup()

    def _fold(batch_df: DataFrame, _batch_id: int) -> None:
        state.update(batch_df.select("doc_id", "text"))

    q = (
        doc_stream.writeStream.foreachBatch(_fold)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return state
