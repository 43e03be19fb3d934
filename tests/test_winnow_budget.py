"""r9 operators: winnowing fingerprints (local passage-overlap dedup)
and token-budget corpus selection (two-pass prefix-sum ranking)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from connected_component_spark.operators.dedup import (
    winnow_fingerprints,
    winnow_pairs,
)
from connected_component_spark.operators.sampling import (
    token_budget_selection,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_winnowing_guarantee_shared_passage(spark):
    """The winnowing guarantee (Schleimer et al. §2): any shared word
    run of length >= window + k - 1 contributes at least one common
    fingerprint — two otherwise-disjoint documents sharing a 7-word
    passage (k=4, w=4) must pair at min_shared=1."""
    passage = "alpha bravo charlie delta echo foxtrot golf"
    a = "one two three four five " + passage + " six seven eight nine"
    b = "red green blue yellow " + passage + " purple orange pink teal"
    c = "completely different words with no overlap at all here okay"
    docs = _docs(spark, [(1, a), (2, b), (3, c)])
    pairs = winnow_pairs(docs, k=4, window=4, min_shared=1).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert (1, 2) in got
    assert all(3 not in p for p in got)


def test_winnowing_density_and_determinism(spark):
    """Fingerprint count per doc is far below the gram count (the
    2/(w+1) expected density is the point of winnowing) and the set
    is identical across runs."""
    words = [f"w{(i * 7919) % 101}" for i in range(300)]
    docs = _docs(spark, [(1, " ".join(words))])
    fp = winnow_fingerprints(docs, k=4, window=8)
    n = fp.count()
    n_grams = 300 - 3
    # expectation ~2/(w+1) = 0.22; allow generous slack both ways
    assert 0 < n < 0.6 * n_grams
    again = {r.fp for r in winnow_fingerprints(docs, k=4, window=8).collect()}
    assert {r.fp for r in fp.collect()} == again


def test_winnow_short_doc_yields_no_fingerprints(spark):
    """Docs with fewer than window full k-grams have no full window —
    no fingerprints, no crash."""
    docs = _docs(spark, [(1, "just three words"), (2, "a b c d e f g h")])
    fp = winnow_fingerprints(docs, k=4, window=4)
    per = {r.doc_id for r in fp.collect()}
    assert 1 not in per  # 3 words < k: zero grams
    assert 2 in per  # 8 words = 5 grams >= window: full windows exist


def test_winnow_max_df_caps_boilerplate(spark):
    """A passage shared by MANY docs is dropped by the df-cap before
    pairing — the posting-list quadratic guard."""
    boiler = " ".join(f"b{i}" for i in range(10))
    rows = [(i, f"unique{i} lead words here " + boiler) for i in range(12)]
    docs = _docs(spark, rows)
    capped = winnow_pairs(docs, k=4, window=4, min_shared=1, max_df=4)
    uncapped = winnow_pairs(docs, k=4, window=4, min_shared=1, max_df=None)
    # every boilerplate fingerprint has df=12 > 4: all pairs vanish
    assert capped.count() == 0
    assert uncapped.count() == 12 * 11 // 2


def test_winnow_rejects_bad_params(spark):
    docs = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        winnow_fingerprints(docs, k=0)
    with pytest.raises(ValueError):
        winnow_pairs(docs, min_shared=0)


def test_token_budget_prefix_semantics(spark):
    """Selection equals the Python greedy prefix: rank by (score
    desc, id), accumulate sizes, keep while cum <= budget — the row
    that overflows and everything after is excluded even if a later
    smaller row would fit (prefix, not knapsack)."""
    rows = [
        (1, 10, 0.9),
        (2, 50, 0.8),
        (3, 10, 0.7),  # cum 70 > 65: excluded
        (4, 1, 0.6),   # would fit (61) but prefix semantics exclude it
        (5, 99, 0.5),
    ]
    df = spark.createDataFrame(rows, "id long, n long, score double")
    out = token_budget_selection(
        df, "n", [F.col("score").desc(), F.col("id").asc()], budget=65
    )
    got = {r.id: (r.cum_tokens, r.selected) for r in out.collect()}
    assert got == {
        1: (10, True),
        2: (60, True),
        3: (70, False),
        4: (71, False),
        5: (170, False),
    }


def test_token_budget_ties_and_edges(spark):
    """Equal scores break by id; budget=0 selects nothing; a row
    landing exactly on the budget is selected (<=)."""
    rows = [(1, 30, 0.5), (2, 30, 0.5), (3, 30, 0.5)]
    df = spark.createDataFrame(rows, "id long, n long, score double")
    order = [F.col("score").desc(), F.col("id").asc()]
    exact = token_budget_selection(df, "n", order, budget=60)
    got = {r.id: r.selected for r in exact.collect()}
    assert got == {1: True, 2: True, 3: False}
    nothing = token_budget_selection(df, "n", order, budget=0)
    assert all(not r.selected for r in nothing.collect())
    with pytest.raises(ValueError):
        token_budget_selection(df, "n", order, budget=-1)


def test_token_budget_plan_has_no_global_sort(spark):
    """The ranking must be the two-pass prefix sum — a naive global
    Window.orderBy would show a SinglePartition exchange."""
    df = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 97).alias("n"), F.rand(7).alias("score")
    )
    out = token_budget_selection(
        df, "n", [F.col("score").desc(), F.col("id").asc()], budget=1000
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_pq_roundtrip_and_recall(spark, sf_dir):
    """PQ codes reconstruct geometry well enough that ADC top-k
    overlaps the exact top-k (recall sanity), codes are valid
    codebook ids, and results are deterministic."""
    from connected_component_spark.operators.quantize import (
        pq_codebooks,
        pq_encode,
        pq_topk,
    )
    from connected_component_spark.sources.tables import load_table
    from connected_component_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_codebooks(emb, dim=64, m=4, k=8, iterations=1)
    assert [s for s, _ in books] == [0, 1, 2, 3]
    assert all(len(c) == 8 and len(c[0][1]) == 16 for _, c in books)
    codes = pq_encode(emb, books)
    assert codes.columns == ["vec_id", "code_0", "code_1", "code_2", "code_3"]
    valid = {s: {cid for cid, _ in cents} for s, cents in books}
    for r in codes.limit(50).collect():
        for s in range(4):
            assert r[f"code_{s}"] in valid[s]
    q = emb.where(F.col("vec_id") % 50 == 0)
    top = pq_topk(q, emb, books, k=5)
    rows = top.collect()
    assert all(r.query_id != r.neighbor_id for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
    assert all(sorted(x)[0][0] == 1 and len(x) == 5 for x in per_q.values())
    # recall sanity vs exact cosine top-5: the fixture embeddings are
    # ISOTROPIC on the unit sphere (SURVEY — no cluster structure to
    # learn), the worst case for coarse m=4/k=8 PQ, so absolute recall
    # is low by construction; the check is that ADC still beats the
    # random baseline (5/n ≈ 1%) severalfold, i.e. the codes carry
    # real geometry (measured: 6% here, deterministic)
    exact = cosine_topk(q, emb, k=5).select("query_id", "neighbor_id")
    n_exact = exact.count()
    hits = top.select("query_id", "neighbor_id").intersect(exact).count()
    n_corpus = emb.count()
    random_exp = n_exact * 5 / max(n_corpus - 1, 1)
    assert hits >= max(2, 3 * random_exp)
    again = {(r.query_id, r.neighbor_id, r.rank) for r in pq_topk(q, emb, books, k=5).collect()}
    assert {(r.query_id, r.neighbor_id, r.rank) for r in rows} == again


def test_pq_rejects_bad_params(spark, sf_dir):
    from connected_component_spark.operators.quantize import (
        pq_codebooks,
        pq_encode,
        pq_topk,
    )
    from connected_component_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="divisible"):
        pq_codebooks(emb, dim=64, m=5)
    with pytest.raises(ValueError):
        pq_encode(emb, [])
    with pytest.raises(ValueError):
        pq_topk(emb, emb, [])


def test_winnow_clusters_transitive(spark):
    """A quotes B, B quotes C (disjoint passages): all three share
    one cluster through the CC kernel even though A and C overlap
    nothing; isolated docs are singletons."""
    from connected_component_spark.operators.dedup import (
        winnow_dedup_clusters,
    )

    p1 = "alpha bravo charlie delta echo foxtrot golf"
    p2 = "hotel india juliet kilo lima mike november"
    rows = [
        (1, "one two three four five " + p1 + " xx yy zz ww"),
        (2, p1 + " mid words bridging here " + p2),
        (3, "aa bb cc dd ee " + p2 + " ff gg hh ii"),
        (4, "totally unrelated content words nothing shared at all okay"),
    ]
    docs = _docs(spark, rows)
    out = {
        r.doc_id: r.cluster
        for r in winnow_dedup_clusters(
            docs, k=4, window=4, min_shared=1
        ).collect()
    }
    assert out[1] == out[2] == out[3] == 1
    assert out[4] == 4


def test_ivfpq_matches_flat_pq_on_reachable_pairs(spark, sf_dir):
    """IVFPQ's adc for any (query, neighbor) it returns equals the
    flat PQ scan's adc for the same pair (the cells only PRUNE —
    scoring is identical), and every IVFPQ result lies in the query's
    probed cell."""
    from connected_component_spark.operators.quantize import (
        ivfpq_topk,
        pq_codebooks,
        pq_topk,
    )
    from connected_component_spark.operators.similarity import (
        ivf_cell_assignments,
    )
    from connected_component_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_codebooks(emb, dim=64, m=4, k=8, iterations=1)
    q = emb.where(F.col("vec_id") % 50 == 0)
    flat = {
        (r.query_id, r.neighbor_id): r.adc
        for r in pq_topk(q, emb, books, k=1000).collect()
    }
    ivfpq = ivfpq_topk(q, emb, books, k=5, centroid_stride=10).collect()
    assert ivfpq  # the probe set returns something
    for r in ivfpq:
        assert flat[(r.query_id, r.neighbor_id)] == r.adc
    cells = {
        r.vec_id: r.cell
        for r in ivf_cell_assignments(
            emb, emb.where(F.col("vec_id") % 10 == 0)
        ).collect()
    }
    for r in ivfpq:
        assert cells[r.query_id] == cells[r.neighbor_id]


def test_winnow_decontaminate_flags_embedded_passages(spark):
    """A train doc quoting part of an eval doc is flagged even though
    whole-document similarity is tiny; min_shared=2 rejects a
    single-fingerprint chance collision; clean docs report zeros."""
    from connected_component_spark.operators.dedup import (
        winnow_decontaminate,
    )

    passage = "alpha bravo charlie delta echo foxtrot golf hotel india"
    rows = [
        # eval doc containing the benchmark passage
        (7, "eval preamble words here " + passage + " eval tail words", True),
        # train doc quoting the passage inside unrelated content
        (1, "one two three four five " + passage + " six seven eight", False),
        # clean train doc
        (2, "totally unrelated content words nothing shared at all here", False),
        # another eval doc, unshared
        (57, "second eval document with its own distinct content words", True),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, is_eval boolean"
    )
    out = {
        r.doc_id: (r.n_eval_matches, r.max_shared, r.contaminated)
        for r in winnow_decontaminate(
            docs, "is_eval", k=4, window=4, min_shared=2
        ).collect()
    }
    assert set(out) == {1, 2}  # eval docs never appear in the report
    n1, m1, c1 = out[1]
    assert c1 and n1 == 1 and m1 >= 2
    assert out[2] == (0, 0, False)


def test_winnow_decontaminate_null_flag_is_train(spark):
    """review r9: a NULL eval flag coalesces to TRAIN — the doc is
    checked and appears in the report, never silently dropped from
    both sides."""
    from connected_component_spark.operators.dedup import (
        winnow_decontaminate,
    )

    passage = "alpha bravo charlie delta echo foxtrot golf hotel india"
    rows = [
        (7, "eval preamble words here " + passage + " eval tail", True),
        # unknown provenance, quoting the eval passage
        (1, "one two three four five " + passage + " six seven", None),
        (2, "clean unknown provenance document nothing shared here at all", None),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, is_eval boolean"
    )
    out = {
        r.doc_id: r.contaminated
        for r in winnow_decontaminate(
            docs, "is_eval", k=4, window=4, min_shared=2
        ).collect()
    }
    assert out == {1: True, 2: False}


def test_token_budget_reserved_column_guard(spark):
    """advice r10: an input already carrying an output column name
    (default or custom) or the internal prefix column must raise —
    the select would otherwise emit duplicate names that break
    downstream by-name access silently (the shuffled_shards
    contract)."""
    order = [F.col("id").asc()]
    base = spark.range(3).select(F.col("id"), F.lit(5).alias("n"))
    for clash, kw in [
        ("cum_tokens", {}),
        ("selected", {}),
        ("__tb_excl", {}),
        ("my_cum", {"cum_col": "my_cum"}),
        ("keep", {"selected_col": "keep"}),
    ]:
        df = base.withColumn(clash, F.lit(1))
        with pytest.raises(ValueError, match="already"):
            token_budget_selection(df, "n", order, budget=10, **kw)
    # identical custom output names must also refuse (review r10)
    with pytest.raises(ValueError, match="distinct"):
        token_budget_selection(
            base, "n", order, budget=10, cum_col="x", selected_col="x"
        )
    # the guard must not reject a clean frame with custom names
    ok = token_budget_selection(
        base, "n", order, budget=10, cum_col="ct", selected_col="sel"
    )
    assert {r.id: r.sel for r in ok.collect()} == {0: True, 1: True, 2: False}


def test_pq_codebook_geometry_validation(spark, sf_dir):
    """advice r10 / verdict r9 #3: a codebook set with mixed subspace
    widths, an empty subspace, or a width whose m*d0 does not match
    the corpus dimensionality must raise instead of silently
    mis-encoding."""
    from connected_component_spark.operators.quantize import (
        ivfpq_topk,
        pq_encode,
    )
    from connected_component_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    # mixed widths across subspaces
    bad_mixed = [
        (0, [(0, [0.0, 0.0]), (1, [1.0, 1.0])]),
        (1, [(0, [0.0, 0.0, 0.0])]),
    ]
    with pytest.raises(ValueError, match="geometry"):
        pq_encode(emb, bad_mixed)
    # empty subspace codebook
    with pytest.raises(ValueError, match="no centroids"):
        pq_encode(emb, [(0, [])])
    # geometry self-consistent but m*d0 != actual vector width: the
    # in-plan guard fires at action time
    dim = len(emb.select("embedding").first()[0])
    bad_dim = [(0, [(0, [0.0] * (dim // 2))])]
    with pytest.raises(Exception, match="pq_encode"):
        pq_encode(emb, bad_dim).collect()
    # nprobe is validated, not clamped (advice r10)
    ok_books = [(0, [(0, [0.0] * dim)])]
    with pytest.raises(ValueError, match="nprobe"):
        ivfpq_topk(emb.limit(1), emb, ok_books, nprobe=0)
    # subspace indices must be contiguous 0..m-1 (review r10)
    half = [(0, [(0, [0.0] * (dim // 2))]), (2, [(0, [0.0] * (dim // 2))])]
    with pytest.raises(ValueError, match="contiguous"):
        pq_encode(emb, half)
    # the QUERY side is width-guarded too (review r10): off-width
    # queries must raise at action time, not rank NULL-adc garbage
    from connected_component_spark.operators.quantize import pq_topk as _pqt

    bad_q = emb.select(
        "vec_id", F.slice("embedding", 1, dim // 2).alias("embedding")
    ).limit(2)
    good_books = [
        (s, [(0, [0.0] * (dim // 2)), (1, [1.0] * (dim // 2))])
        for s in range(2)
    ]
    with pytest.raises(Exception, match="query vector length"):
        _pqt(bad_q, emb, good_books, k=2).collect()


def test_ivfpq_trained_multiprobe_widens_candidates(spark, sf_dir):
    """The production configuration (verdict r9 #2): trained coarse
    cells + nprobe>=2.  Multi-probe candidate sets must contain the
    single-probe sets per query (monotone widening), and every
    returned adc must still equal the flat PQ scan's for the same
    pair — probing changes REACH, never scoring."""
    from connected_component_spark.operators.quantize import (
        ivfpq_topk,
        pq_codebooks,
        pq_topk,
    )
    from connected_component_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_codebooks(emb, dim=64, m=4, k=8, iterations=1)
    from connected_component_spark.queries.llmops import (
        _ivf_kmeans_centroids,
    )

    cents = _ivf_kmeans_centroids(spark, sf_dir)
    q = emb.where(F.col("vec_id") % 50 == 0)
    kw = dict(k=1000, centroids=cents)
    one = ivfpq_topk(q, emb, books, nprobe=1, **kw).collect()
    two = ivfpq_topk(q, emb, books, nprobe=2, **kw).collect()
    set1 = {(r.query_id, r.neighbor_id) for r in one}
    set2 = {(r.query_id, r.neighbor_id) for r in two}
    assert set1 <= set2 and len(set2) > len(set1)
    flat = {
        (r.query_id, r.neighbor_id): r.adc
        for r in pq_topk(q, emb, books, k=1000).collect()
    }
    for r in two:
        assert flat[(r.query_id, r.neighbor_id)] == r.adc


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_VOCAB = [f"w{i}" for i in range(30)]
_pad = st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=15)
_passage = st.lists(st.sampled_from(_VOCAB), min_size=7, max_size=12)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pad_a=_pad, pad_b=_pad, passage=_passage)
def test_winnowing_guarantee_property(spark, pad_a, pad_b, passage):
    """Property form of the winnowing guarantee (Schleimer et al.
    §2): for ANY surrounding context drawn from a small (collision-
    prone, adversarial) vocabulary, two documents sharing a verbatim
    run of >= window + k - 1 words MUST pair at min_shared=1 with the
    df-cap off.  k=4, window=4 -> 7-word shared runs."""
    docs = _docs(
        spark,
        [
            (1, " ".join(pad_a + passage)),
            (2, " ".join(passage + pad_b)),
        ],
    )
    pairs = {
        (r.doc_a, r.doc_b)
        for r in winnow_pairs(
            docs, k=4, window=4, min_shared=1, max_df=None
        ).collect()
    }
    assert (1, 2) in pairs


def test_retention_decisions_keeps_best_per_cluster(spark):
    """retention_decisions (r10): exactly one keep per cluster — the
    highest-quality member, ties to the smallest id — with every
    dropped member pointing at it; singletons keep themselves."""
    from connected_component_spark.operators.dedup import (
        retention_decisions,
    )

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
        "doc_id long, cluster long",
    )
    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 7), (5, 9), (6, 9)],
        "doc_id long, n_chars long",
    )
    out = {
        r.doc_id: (r.keep, r.canonical_doc_id)
        for r in retention_decisions(clusters, docs).collect()
    }
    # cluster 1: 2 and 3 tie at 30 chars -> 2 wins (lower id)
    assert out == {
        1: (False, 2),
        2: (True, 2),
        3: (False, 2),
        4: (True, 4),
        5: (True, 5),
        6: (False, 5),
    }


def test_rerank_exact_improves_or_matches_adc_ranking(spark, sf_dir):
    """rerank_exact (r10): the refine tail returns exactly the top-k
    BY EXACT COSINE of the candidate shortlist — for every query, the
    re-ranked set equals brute-force cosine restricted to the
    candidates, and recall vs the true exact top-k is >= the raw ADC
    head's (refine can only fix ranking inside the shortlist)."""
    from connected_component_spark.operators.quantize import (
        ivfpq_topk,
        pq_codebooks,
    )
    from connected_component_spark.operators.similarity import (
        cosine_topk,
        rerank_exact,
    )
    from connected_component_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_codebooks(emb, dim=64, m=4, k=8, iterations=1)
    q = emb.where(F.col("vec_id") % 50 == 0)
    cand = ivfpq_topk(q, emb, books, k=25, centroid_stride=10).select(
        "query_id", "neighbor_id"
    )
    refined = rerank_exact(cand, emb, k=5).collect()
    cand_set = {(r.query_id, r.neighbor_id) for r in cand.collect()}
    exact = {
        (r.query_id, r.neighbor_id): r.cos
        for r in cosine_topk(q, emb, k=1000).collect()
    }
    # per query: refined == top-5 by exact cos among that query's cands
    by_q = {}
    for qq, nn in cand_set:
        by_q.setdefault(qq, []).append(nn)
    for qq, nns in by_q.items():
        want = sorted(nns, key=lambda n: (-exact[(qq, n)], n))[:5]
        got = sorted(
            (r for r in refined if r.query_id == qq), key=lambda r: r.rank
        )
        assert [r.neighbor_id for r in got] == want
        # and the cos values are the exact ones
        for r in got:
            assert exact[(qq, r.neighbor_id)] == r.cos


def test_rerank_exact_external_query_batch(spark):
    """advice r11: a caller re-ranking an EXTERNAL query batch (query
    vectors not stored in the corpus) passes it via ``queries=`` and
    every candidate resolves; with the default corpus-member contract
    the same out-of-corpus query ids drop silently (documented)."""
    from connected_component_spark.operators.similarity import rerank_exact

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.8, 0.6]),
            (3, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    ext = spark.createDataFrame(
        [(100, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    cand = spark.createDataFrame(
        [(100, 1), (100, 2), (100, 3)], "query_id long, neighbor_id long"
    )
    got = rerank_exact(cand, corpus, k=2, queries=ext).collect()
    assert [(r.query_id, r.neighbor_id, r.rank) for r in got] == [
        (100, 1, 1),
        (100, 2, 2),
    ]
    assert got[0].cos == 1.0
    # default contract: out-of-corpus query ids contribute nothing
    assert rerank_exact(cand, corpus, k=2).count() == 0
