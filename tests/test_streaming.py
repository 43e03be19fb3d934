"""Streaming-path unit tests: incremental-CC state folding and the
windowed stream aggregate (oracle parity for the registered queries
is covered by test_oracle_llmops.py via queries/streamq.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from connected_component_spark.graph.cc import connected_components
from connected_component_spark.streaming.incremental import IncrementalCC


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_incremental_cc_matches_batch(spark):
    batches = [
        [(1, 2), (3, 4)],
        [(2, 3), (5, 5)],          # merges {1,2} and {3,4}; singleton 5
        [(6, 7), (7, 8), (5, 8)],  # new chain, then attach 5 to it
    ]
    state = IncrementalCC()
    for b in batches:
        state.update(_edges(spark, b))
    assert state.batches_seen == 3

    all_edges = _edges(spark, [p for b in batches for p in b])
    batch_result = connected_components(all_edges)

    inc = {
        (r.node, r.component) for r in state.assignments.collect()
    }
    full = {
        (r.node, r.component) for r in batch_result.assignments.collect()
    }
    assert inc == full
    # cross-batch merge actually happened: 1..4 one component
    comp = dict(inc)
    assert comp[1] == comp[2] == comp[3] == comp[4] == 1
    assert comp[5] == comp[6] == comp[7] == comp[8] == 5


def test_incremental_cc_order_invariance(spark):
    batches = [[(10, 20)], [(30, 40)], [(20, 30)]]
    fwd, rev = IncrementalCC(), IncrementalCC()
    for b in batches:
        fwd.update(_edges(spark, b))
    for b in reversed(batches):
        rev.update(_edges(spark, b))
    assert {
        (r.node, r.component) for r in fwd.assignments.collect()
    } == {(r.node, r.component) for r in rev.assignments.collect()}


def test_windowed_counts_is_streaming_plan(spark, sf_dir):
    from connected_component_spark.streaming.windows import (
        stream_events,
        windowed_event_counts,
    )

    ev = stream_events(spark, sf_dir)
    assert ev.isStreaming
    agg = windowed_event_counts(ev)
    assert agg.isStreaming
    assert [f.name for f in agg.schema.fields] == [
        "window_start", "event_type", "n_events", "sum_value",
    ]
