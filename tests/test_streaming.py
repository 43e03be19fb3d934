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


def test_incremental_cc_novelty_fast_paths(spark):
    """The kernel must run only when a batch changes connectivity:
    redundant edges and unseen-singleton self-loops take the cheap
    paths, and the final assignment still matches batch CC."""
    state = IncrementalCC()
    state.update(_edges(spark, [(1, 2), (2, 3)]))
    assert state.cc_runs == 1
    # redundant batch: both edges inside the existing component
    state.update(_edges(spark, [(1, 3), (2, 2)]))
    assert state.cc_runs == 1  # kernel skipped
    # unseen node, self-loop only: singleton appended, kernel skipped
    state.update(_edges(spark, [(9, 9), (1, 2)]))
    assert state.cc_runs == 1
    # unseen node attached by a real edge: kernel must run
    state.update(_edges(spark, [(9, 3)]))
    assert state.cc_runs == 2

    all_edges = _edges(spark, [(1, 2), (2, 3), (1, 3), (2, 2), (9, 9), (9, 3)])
    full = {
        (r.node, r.component)
        for r in connected_components(all_edges).assignments.collect()
    }
    assert {(r.node, r.component) for r in state.assignments.collect()} == full


def test_checkpoint_restart_exactly_once(spark, sf_dir, tmp_path):
    """Kill a streaming query mid-backlog and restart it from its
    checkpoint into a parquet sink: the sink must hold every input row
    exactly once — the recovery contract a production pipeline relies
    on (file-sink manifest + source offsets in the checkpoint)."""
    import os
    import time as _time

    from connected_component_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    staged = str(tmp_path / "staged")
    ev.repartitionByRange(4, "event_id").write.parquet(staged)
    now = _time.time()
    for i, p in enumerate(sorted(os.listdir(staged))):
        if p.endswith(".parquet"):
            os.utime(os.path.join(staged, p), (now + i, now + i))

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def start(trigger_available_now):
        s = (
            spark.readStream.schema("event_id long, ts timestamp, user_id long")
            .option("maxFilesPerTrigger", "1")
            .parquet(staged)
        )
        w = s.writeStream.format("parquet").option("path", out).option(
            "checkpointLocation", ck
        )
        if trigger_available_now:
            w = w.trigger(availableNow=True)
        return w.start()

    q = start(trigger_available_now=False)
    # let it commit at least one batch, then kill it mid-backlog
    deadline = _time.time() + 60
    while _time.time() < deadline:
        p = q.lastProgress
        if p and p["batchId"] >= 1:
            break
        _time.sleep(0.2)
    q.stop()
    q.awaitTermination()

    q2 = start(trigger_available_now=True)
    q2.awaitTermination()

    back = spark.read.parquet(out)
    assert back.count() == ev.count()  # nothing lost, nothing doubled
    assert back.select("event_id").distinct().count() == ev.count()


def test_stream_dedup_survives_redelivery(spark, sf_dir):
    """Every staged file is delivered twice across micro-batches; the
    keyed dedup state must reduce that to exactly the batch DISTINCT
    (no duplicate leaks, no dropped originals)."""
    from connected_component_spark.queries.streamq import stream_dedup
    from connected_component_spark.sources.tables import load_table

    got = stream_dedup(spark, sf_dir)
    rows = got.collect()
    ids = [r.event_id for r in rows]
    assert len(ids) == len(set(ids)), "duplicate event_ids leaked"
    n_batch = load_table(spark, sf_dir, "events").count()
    assert len(ids) == n_batch


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


def test_sessionization_shuffled_replay(spark, sf_dir):
    """Oracle parity must hold when the staged slice files are
    replayed in REVERSED event-time order (r2 VERDICT item 6): the
    stateful fold buffers events and finalizes a session only when it
    is provably closed, so data-file delivery order is irrelevant —
    only the flush sentinel file must come last."""
    import os
    import tempfile
    import time

    from connected_component_spark.queries.relational import q_sessionization
    from connected_component_spark.sources.tables import load_table
    from connected_component_spark.streaming.state import (
        FLUSH_EVENT_ID,
        sessionize_stream,
    )
    from connected_component_spark.streaming.windows import run_stream_to_memory

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    hi = ev.agg(F.max("ts")).first()[0]
    staged = tempfile.mkdtemp(prefix="ccs_shuffled_sessions_")
    slices = 4
    tmp = os.path.join(staged, "_tmp")
    ev.repartitionByRange(slices, F.to_date("ts")).write.mode("overwrite").parquet(tmp)
    parts = sorted(
        p for p in os.listdir(tmp)
        if p.startswith("part-") and p.endswith(".parquet")
    )
    # adversarial delivery: ascending mtimes assigned to files in
    # REVERSE event-time order (the file source replays oldest-mtime
    # first, so day ranges arrive newest-days-first)
    now = time.time()
    for rank, src in enumerate(reversed(parts)):
        dst = os.path.join(staged, f"{rank:03d}.parquet")
        os.replace(os.path.join(tmp, src), dst)
        os.utime(dst, (now + 10 * rank, now + 10 * rank))

    flush = ev.select("user_id").distinct().select(
        F.lit(FLUSH_EVENT_ID).cast("long").alias("event_id"),
        (F.lit(hi) + F.expr("INTERVAL 2 DAYS")).alias("ts"),
        "user_id",
        F.lit(0.0).alias("value"),
    )
    ftmp = os.path.join(staged, "_tmp_flush")
    flush.coalesce(1).write.mode("overwrite").parquet(ftmp)
    fsrc = next(
        p for p in os.listdir(ftmp)
        if p.startswith("part-") and p.endswith(".parquet")
    )
    fdst = os.path.join(staged, f"{len(parts):03d}_flush.parquet")
    os.replace(os.path.join(ftmp, fsrc), fdst)
    os.utime(fdst, (now + 10 * len(parts), now + 10 * len(parts)))

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(staged)
    )
    result = run_stream_to_memory(
        sessionize_stream(stream, gap_s=1800), output_mode="append"
    )
    expected = q_sessionization(spark, sf_dir)
    assert result.count() == expected.count()
    assert result.exceptAll(expected).count() == 0
    assert expected.exceptAll(result).count() == 0


def test_native_session_windows_stream_matches_batch(spark, sf_dir):
    """The streaming session_window pipeline (watermark-closed append
    emission over the staged replay) must produce exactly the batch
    session_window result — execution-mode differential."""
    from connected_component_spark.queries.relational import q_session_windows
    from connected_component_spark.queries.streamq import stream_session_windows

    batch = {tuple(r) for r in q_session_windows(spark, sf_dir).collect()}
    streamed = {
        tuple(r) for r in stream_session_windows(spark, sf_dir).collect()
    }
    assert streamed == batch


def test_rocksdb_state_store_same_results(spark, sf_dir):
    """The 100 TB state contract (r4 verdict #6): the stateful
    streaming queries must produce IDENTICAL results under the
    RocksDB state store provider (disk-backed, bounded heap) as under
    Spark's default in-memory HDFS-backed provider.  Exercises both a
    built-in stateful op (dropDuplicatesWithinWatermark) and the
    native session_window aggregate."""
    from connected_component_spark.queries.streamq import (
        stream_dedup,
        stream_session_windows,
    )
    from connected_component_spark.session import ROCKSDB_STATE_STORE_PROVIDER

    key = "spark.sql.streaming.stateStore.providerClass"

    def run_both(q):
        base = {tuple(r) for r in q(spark, sf_dir).collect()}
        old = spark.conf.get(key, None)
        spark.conf.set(key, ROCKSDB_STATE_STORE_PROVIDER)
        try:
            assert spark.conf.get(key) == ROCKSDB_STATE_STORE_PROVIDER
            rocks = {tuple(r) for r in q(spark, sf_dir).collect()}
        finally:
            if old:
                spark.conf.set(key, old)
            else:
                spark.conf.unset(key)
        assert base, f"{q.__name__}: empty result voids the comparison"
        assert rocks == base, f"{q.__name__}: providers disagree"

    run_both(stream_dedup)
    run_both(stream_session_windows)
