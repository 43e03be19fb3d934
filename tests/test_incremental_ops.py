"""Round-6 operator tests: incremental (corpus-vs-batch) dedup,
int8 scalar quantization, and the filter-funnel yield report."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from connected_component_spark.operators.dedup import incremental_dedup
from connected_component_spark.operators.quantize import (
    quantization_report,
    scalar_quantize,
)
from connected_component_spark.operators.text import filter_funnel


# ---- incremental dedup ----------------------------------------------------

_BASE = "the quick brown fox jumps over the lazy dog again and again today"
_OTHER = "entirely different content about databases and distributed systems"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_dedup_classifies_three_ways(spark):
    corpus = _docs(spark, [(1, _BASE), (2, _OTHER)])
    batch = _docs(
        spark,
        [
            (10, _BASE + " extra"),          # near-dup of corpus doc 1
            (11, _OTHER + " suffix word"),   # near-dup of corpus doc 2
            (12, "totally novel text about astronomy stars planets moons and comets tonight"),
            (13, "totally novel text about astronomy stars planets moons and comets tonight ok"),
        ],
    )
    rows = {
        r["doc_id"]: (r["status"], r["canonical_doc_id"])
        for r in incremental_dedup(corpus, batch, threshold=0.4).collect()
    }
    assert rows[10] == ("dup_of_corpus", 1)
    assert rows[11] == ("dup_of_corpus", 2)
    # 12 and 13 match each other only: earlier batch id is canonical
    assert rows[12] == ("dup_in_batch", 12) or rows[12] == ("novel", 12)
    assert rows[13][0] == "dup_in_batch"
    assert rows[13][1] == 12


def test_incremental_dedup_corpus_priority_and_novel(spark):
    """A batch doc matching BOTH a corpus doc and an earlier batch doc
    reports dup_of_corpus with the corpus canonical."""
    corpus = _docs(spark, [(1, _BASE)])
    batch = _docs(
        spark,
        [(10, _BASE + " x"), (11, _BASE + " y"), (12, _OTHER)],
    )
    rows = {
        r["doc_id"]: (r["status"], r["canonical_doc_id"])
        for r in incremental_dedup(corpus, batch, threshold=0.4).collect()
    }
    assert rows[10] == ("dup_of_corpus", 1)
    assert rows[11] == ("dup_of_corpus", 1)
    assert rows[12] == ("novel", 12)


def test_incremental_dedup_rejects_out_of_order_ids(spark):
    """ADVICE r6: the 'every corpus doc_id < every batch doc_id'
    precondition is ENFORCED, not just documented — a violating
    caller gets a loud in-plan failure at first action instead of
    silently wrong canonical ids (classification orients pairs a < b,
    so an out-of-order corpus id would be misread as a batch doc)."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    corpus = _docs(spark, [(1, _BASE), (50, _OTHER)])  # 50 >= batch min
    batch = _docs(spark, [(10, _BASE + " x")])
    out = incremental_dedup(corpus, batch, threshold=0.4)  # lazy: no raise yet
    with pytest.raises(SparkRuntimeException, match="ingestion order"):
        out.collect()
    # boundary: max corpus id == min batch id is also a violation
    with pytest.raises(SparkRuntimeException, match="ingestion order"):
        incremental_dedup(
            _docs(spark, [(10, _BASE)]), _docs(spark, [(10, _BASE)])
        ).collect()


def test_incremental_dedup_broadcasts_batch_side(spark):
    """The corpus band table must join the batch via broadcast — the
    corpus side is never shuffled (the operator's 100 TB contract)."""
    corpus = _docs(spark, [(i, f"{_BASE} {i}") for i in range(20)])
    batch = _docs(spark, [(100, _BASE + " q")])
    plan = (
        incremental_dedup(corpus, batch)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# ---- scalar quantization --------------------------------------------------

def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_scalar_quantize_codes_bounded_and_exact_recon_bound(spark):
    df = _emb(
        spark,
        [
            (1, [0.5, -1.0, 0.25, 0.0]),
            (2, [3.0, 2.0, -3.0, 1.5]),
        ],
    )
    rows = {r["vec_id"]: r for r in scalar_quantize(df).collect()}
    for r in rows.values():
        assert all(-127 <= c <= 127 for c in r["codes"])
        # reconstruction error bounded by scale/2 per element
        for x, c in zip(r["embedding"], r["codes"]):
            assert abs(x - c * r["scale"]) <= r["scale"] / 2 + 1e-12
    # max element maps to ±127 exactly
    assert max(abs(c) for c in rows[2]["codes"]) == 127


def test_scalar_quantize_zero_vector(spark):
    df = _emb(spark, [(1, [0.0, 0.0, 0.0])])
    r = scalar_quantize(df).collect()[0]
    assert r["scale"] == 0.0 and list(r["codes"]) == [0, 0, 0]
    rep = quantization_report(df).collect()[0]
    assert rep["cos_recon"] == 1.0 and rep["max_abs_err"] == 0.0


def test_quantization_report_uses_unrounded_scale(spark):
    """Regression for the lateral-column-alias capture: the output
    aliases a ROUNDED 'scale'; the dequantization inside the same
    select must keep using the unrounded scale.  With this vector the
    two choices round max_abs_err to different 6th decimals."""
    df = _emb(spark, [(37, [0.17885982990264893, 0.3415775597095489494] + [0.0] * 6)])
    r = quantization_report(df).collect()[0]
    s = max(abs(x) for x in [0.17885982990264893, 0.3415775597095489494]) / 127.0
    expected = max(
        abs(x - math.floor(x / s + 0.5) * s)
        for x in [0.17885982990264893, 0.3415775597095489494, 0.0]
    )
    # snap-round at 6 like the operator does
    from decimal import ROUND_HALF_UP, Decimal

    exp6 = float(
        Decimal(expected).quantize(Decimal("1e-9"), ROUND_HALF_UP).quantize(
            Decimal("1e-6"), ROUND_HALF_UP
        )
    )
    assert r["max_abs_err"] == pytest.approx(exp6, abs=0)


def test_quantization_is_map_only(spark):
    """Zero shuffles: the plan must contain no Exchange."""
    df = _emb(spark, [(1, [0.5, -1.0]), (2, [2.0, 1.0])])
    plan = (
        quantization_report(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# ---- filter funnel --------------------------------------------------------

def test_filter_funnel_cumulative_counts(spark):
    df = spark.createDataFrame(
        [(i, i % 2 == 0, i % 3 == 0) for i in range(12)],
        "id long, even boolean, div3 boolean",
    )
    rows = {
        r["stage"]: r
        for r in filter_funnel(
            df, [("even", F.col("even")), ("div3", F.col("div3"))]
        ).collect()
    }
    assert rows["even"]["entering"] == 12
    assert rows["even"]["surviving"] == 6
    assert rows["even"]["dropped"] == 6
    assert rows["div3"]["entering"] == 6
    assert rows["div3"]["surviving"] == 2  # 0 and 6
    assert rows["div3"]["dropped"] == 4
    # stage ordering is preserved
    idx = {r["stage"]: r["stage_idx"] for r in rows.values()}
    assert idx == {"even": 0, "div3": 1}


def test_filter_funnel_single_aggregation_pass(spark):
    """One scan regardless of stage count: exactly one aggregate over
    the input, no join/union of per-stage subplans."""
    df = spark.createDataFrame([(i,) for i in range(5)], "id long")
    plan = (
        filter_funnel(
            df,
            [(f"s{k}", F.col("id") >= k) for k in range(6)],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan ") <= 1 and "Union" not in plan


# ---- streaming incremental dedup -----------------------------------------

def test_streaming_incremental_dedup_folds_batches(spark):
    """Direct multi-batch fold: batch 0 seeds (no output); later
    batches classify against everything seen before, matching the
    batch operator's semantics per batch."""
    from connected_component_spark.streaming.dedup import IncrementalDedup

    state = IncrementalDedup(threshold=0.4)
    state.update(_docs(spark, [(1, _BASE), (2, _OTHER)]))
    assert state.results is None and state.batches_seen == 1
    state.update(_docs(spark, [(10, _BASE + " x"), (11, "fresh unrelated news about sports teams winning championships this year")]))
    state.update(_docs(spark, [(20, _OTHER + " y"), (21, _BASE + " z"), (22, "fresh unrelated news about sports teams winning championships this year ok")]))
    rows = {
        r["doc_id"]: (r["status"], r["canonical_doc_id"])
        for r in state.results.collect()
    }
    assert rows[10] == ("dup_of_corpus", 1)
    assert rows[11][0] == "novel"
    assert rows[20] == ("dup_of_corpus", 2)
    # 21 matches corpus doc 1 AND prior-batch doc 10 — both are
    # "corpus" (earlier batches) at batch 3; canonical is the min
    assert rows[21] == ("dup_of_corpus", 1)
    assert rows[22] == ("dup_of_corpus", 11)


def test_streaming_incremental_dedup_matches_batch_operator(spark):
    """Folding batches one at a time must agree with calling the
    batch operator with corpus = all earlier batches, per batch."""
    from connected_component_spark.operators.dedup import incremental_dedup
    from connected_component_spark.streaming.dedup import IncrementalDedup

    batches = [
        [(1, _BASE), (2, _OTHER)],
        [(10, _BASE + " x"), (11, _OTHER + " q")],
        [(20, _BASE + " y"), (21, "completely new topic entirely about gardening tomatoes peppers and herbs")],
    ]
    state = IncrementalDedup(threshold=0.4)
    for b in batches:
        state.update(_docs(spark, b))
    streamed = sorted(map(tuple, state.results.collect()))

    expected = []
    for t in range(1, len(batches)):
        corpus = _docs(spark, [r for b in batches[:t] for r in b])
        out = incremental_dedup(corpus, _docs(spark, batches[t]), threshold=0.4)
        expected.extend(map(tuple, out.collect()))
    assert streamed == sorted(expected)


def test_streaming_results_survive_source_cleanup(spark, tmp_path):
    """ADVICE r6 regression: the accumulated results plan must depend
    only on checkpointed leaves, never on the per-batch input
    DataFrame — foreachBatch guarantees a micro-batch's data only for
    the duration of that batch, so the post-stream collect must still
    work after the batch source is DELETED (a non-replayable source
    behaves exactly like this)."""
    import shutil

    from connected_component_spark.streaming.dedup import IncrementalDedup

    state = IncrementalDedup(threshold=0.4)
    batches = [
        [(1, _BASE), (2, _OTHER)],
        [(10, _BASE + " x")],
        [(20, _OTHER + " y"), (21, _BASE + " z")],
    ]
    for i, rows in enumerate(batches):
        p = str(tmp_path / f"batch{i}")
        _docs(spark, rows).write.parquet(p)
        state.update(spark.read.parquet(p).select("doc_id", "text"))
        shutil.rmtree(p)  # the batch contract: data gone after the fold

    got = {
        r["doc_id"]: (r["status"], r["canonical_doc_id"])
        for r in state.results.collect()  # must not re-read batch dirs
    }
    assert got[10] == ("dup_of_corpus", 1)
    assert got[20] == ("dup_of_corpus", 2)
    assert got[21] == ("dup_of_corpus", 1)


def test_streaming_incremental_dedup_consolidation(spark):
    """Past the consolidation threshold the state collapses to one
    materialized leaf and classifications stay correct."""
    import connected_component_spark.streaming.dedup as sd

    orig = sd._CONSOLIDATE_EVERY
    sd._CONSOLIDATE_EVERY = 3
    try:
        state = sd.IncrementalDedup(threshold=0.4)
        state.update(_docs(spark, [(1, _BASE)]))
        state.update(_docs(spark, [(10, _BASE + " x")]))
        state.update(_docs(spark, [(20, _OTHER)]))      # consolidates here
        state.update(_docs(spark, [(30, _OTHER + " y"), (31, _BASE + " w")]))
        rows = {
            r["doc_id"]: (r["status"], r["canonical_doc_id"])
            for r in state.results.collect()
        }
        assert rows[10] == ("dup_of_corpus", 1)
        assert rows[20][0] == "novel"
        assert rows[30] == ("dup_of_corpus", 20)
        assert rows[31] == ("dup_of_corpus", 1)
    finally:
        sd._CONSOLIDATE_EVERY = orig


# ---- l2 normalization -----------------------------------------------------

def test_l2_normalize_known_and_zero_vectors(spark):
    from connected_component_spark.operators.quantize import l2_normalize

    emb = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [2.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in l2_normalize(emb).collect()}
    assert rows[1]["norm"] == 5.0 and rows[1]["unit"] == [0.6, 0.8]
    # zero vector: passes through, no NaN
    assert rows[2]["norm"] == 0.0 and rows[2]["unit"] == [0.0, 0.0]
    assert rows[3]["unit"] == [1.0, 0.0, 0.0]


def test_l2_normalize_unit_norm_property(spark):
    import math

    from connected_component_spark.operators.quantize import l2_normalize

    emb = spark.createDataFrame(
        [(i, [float(i + j * 7 % 13) + 0.25 for j in range(8)]) for i in range(1, 30)],
        "vec_id long, embedding array<double>",
    )
    out = l2_normalize(emb).collect()
    for r in out:
        n = math.sqrt(sum(x * x for x in r["unit"]))
        assert abs(n - 1.0) < 1e-12, (r["vec_id"], n)


_P1 = "alpha bravo charlie delta echo foxtrot golf"
_P2 = "hotel india juliet kilo lima mike november"


def test_streaming_incremental_winnow_classifies_three_ways(spark):
    """IncrementalWinnow (r10): batch 0 seeds silently; a later doc
    quoting an earlier batch's passage is dup_of_corpus, one quoting
    a same-batch earlier doc is dup_in_batch, a passage-free doc is
    novel — with canonical = min matching doc_id."""
    from connected_component_spark.streaming.winnow import IncrementalWinnow

    state = IncrementalWinnow(k=4, window=4, min_shared=1)
    state.update(
        _docs(
            spark,
            [
                (1, "one two three four five " + _P1 + " six seven"),
                (2, "red green blue yellow cyan magenta white black grey"),
            ],
        )
    )
    assert state.results is None and state.batches_seen == 1
    state.update(
        _docs(
            spark,
            [
                (10, "aa bb cc dd " + _P1 + " ee ff gg hh"),  # quotes corpus 1
                (11, "pp qq rr ss " + _P2 + " tt uu vv ww"),  # fresh passage
                (12, "xx yy zz " + _P2 + " mm nn oo kk ll"),  # quotes 11, same batch
                (13, "totally unrelated words nothing shared anywhere at all here"),
            ],
        )
    )
    rows = {
        r["doc_id"]: (r["status"], r["canonical_doc_id"])
        for r in state.results.collect()
    }
    assert rows[10] == ("dup_of_corpus", 1)
    assert rows[11][0] == "novel"
    assert rows[12] == ("dup_in_batch", 11)
    assert rows[13][0] == "novel"
    # batch 3: passage from batch-2 doc is now corpus
    state.update(_docs(spark, [(20, "jj " + _P2 + " final words here ok")]))
    rows = {
        r["doc_id"]: (r["status"], r["canonical_doc_id"])
        for r in state.results.collect()
    }
    assert rows[20] == ("dup_of_corpus", 11)


def test_streaming_incremental_winnow_matches_global_pairs(spark):
    """The stream's classification equals the GLOBAL winnow-pair
    computation with batch boundaries applied (fingerprints are a
    pure per-doc function) — the exact contract the declared
    stream_winnow_dedup oracle checks at sf0.01."""
    from connected_component_spark.operators.dedup import winnow_pairs
    from connected_component_spark.streaming.winnow import IncrementalWinnow

    batches = [
        [(1, "one two three four five " + _P1 + " six seven")],
        [(10, "aa bb cc dd " + _P1 + " ee ff gg hh"),
         (11, "pp qq rr ss " + _P2 + " tt uu vv ww")],
        [(20, "xx yy zz " + _P2 + " mm nn oo kk ll"),
         (21, "jj kk " + _P1 + " more words trail here ok")],
    ]
    state = IncrementalWinnow(k=4, window=4, min_shared=1)
    for b in batches:
        state.update(_docs(spark, b))
    streamed = {
        r["doc_id"]: (r["status"], r["canonical_doc_id"])
        for r in state.results.collect()
    }
    all_docs = [r for b in batches for r in b]
    pairs = winnow_pairs(
        _docs(spark, all_docs), k=4, window=4, min_shared=1, max_df=None
    ).collect()
    batch_of = {d: i for i, b in enumerate(batches) for d, _ in b}
    expected = {}
    for d, _ in all_docs:
        if batch_of[d] == 0:
            continue
        corpus = [
            p.doc_a for p in pairs
            if p.doc_b == d and batch_of[p.doc_a] < batch_of[d]
        ]
        batch = [
            p.doc_a for p in pairs
            if p.doc_b == d and batch_of[p.doc_a] == batch_of[d]
        ]
        if corpus:
            expected[d] = ("dup_of_corpus", min(corpus))
        elif batch:
            expected[d] = ("dup_in_batch", min(batch))
        else:
            expected[d] = ("novel", d)
    assert streamed == expected


def test_streaming_incremental_winnow_state_df_valve(spark):
    """max_state_df: a fingerprint whose accumulated posting list
    exceeds the valve is skipped at match time — boilerplate shared
    by many corpus docs stops generating candidates (the posting-list
    quadratic guard), while rare passages still match."""
    from connected_component_spark.streaming.winnow import IncrementalWinnow

    boiler = [
        (i, f"lead{i} unique{i} words{i} here{i} " + _P1 + f" tail{i} t{i}")
        for i in range(1, 5)
    ]
    state = IncrementalWinnow(k=4, window=4, min_shared=1, max_state_df=2)
    state.update(_docs(spark, boiler))
    # every fp of _P1 now has df=4 > 2 in state: a new quoting doc
    # must NOT match through the valved fingerprints
    state.update(_docs(spark, [(10, "zz yy xx ww " + _P1 + " vv uu tt ss")]))
    rows = {r["doc_id"]: r["status"] for r in state.results.collect()}
    assert rows[10] == "novel"
    with __import__("pytest").raises(ValueError):
        IncrementalWinnow(min_shared=0)
    with __import__("pytest").raises(ValueError):
        IncrementalWinnow(max_state_df=0)
