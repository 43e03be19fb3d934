"""Unit tests for dedup / similarity / text / multimodal operators
on hand-built inputs with known answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from connected_component_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_dedup_clusters,
    minhash_signatures,
    simhash,
    word_shingles,
)
from connected_component_spark.operators.multimodal import (
    decode_metadata,
    with_binary_payload,
)
import pytest

from connected_component_spark.operators.dedup import ngram_dedup_clusters
from connected_component_spark.operators.similarity import (
    block_cosine_topk,
    cosine_topk,
    cosine_threshold_pairs,
    lsh_bucketed_topk,
    lsh_threshold_pairs,
    similarity_clusters,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_exact_dedup_groups_identical_texts(spark):
    docs = _docs(spark, ["a b c", "a b c", "x y z"])
    rows = exact_dedup(docs).collect()
    by_canon = {r["canonical_doc_id"]: r["n_dups"] for r in rows}
    assert by_canon == {0: 2, 2: 1}


def test_word_shingles_window(spark):
    df = spark.createDataFrame([("a b c d",)], "text string").select(
        word_shingles(F.col("text"), 3).alias("sh")
    )
    assert sorted(df.first()["sh"]) == ["a b c", "b c d"]


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([("a b",)], "text string").select(
        word_shingles(F.col("text"), 3).alias("sh")
    )
    assert df.first()["sh"] == ["a b"]


def test_minhash_identical_docs_same_signature(spark):
    docs = _docs(spark, ["w1 w2 w3 w4 w5", "w1 w2 w3 w4 w5", "q r s t u"])
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs, 8).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[2]


def test_minhash_cluster_pipeline_finds_near_dups(spark):
    base = " ".join(f"tok{i}" for i in range(40))
    near = " ".join(f"tok{i}" for i in range(39)) + " changed"
    other = " ".join(f"zz{i}" for i in range(40))
    docs = _docs(spark, [base, near, other])
    clusters = {
        r["doc_id"]: r["cluster"]
        for r in minhash_dedup_clusters(docs, threshold=0.5).collect()
    }
    assert clusters[0] == clusters[1] == 0
    assert clusters[2] == 2


def test_jaccard_exact_value(spark):
    docs = _docs(spark, ["a b c d", "b c d e"])
    pairs = spark.createDataFrame([(0, 1)], "a long, b long")
    # shingles: {abc,bcd} vs {bcd,cde} → |∩|=1 |∪|=3
    j = jaccard_pairs(docs, pairs).first()["jaccard"]
    assert abs(j - 1 / 3) < 1e-6


def test_simhash_identical_docs_match(spark):
    docs = _docs(spark, ["a b c", "a b c", "completely different words"])
    fp = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )


def test_cosine_topk_orders_by_similarity(spark):
    emb = _emb(spark, [[1, 0], [0.9, 0.1], [0, 1]])
    queries = emb.where(F.col("vec_id") == 0)
    rows = cosine_topk(queries, emb, k=2).collect()
    assert [r["neighbor_id"] for r in rows] == [1, 2]
    assert rows[0]["cos"] > 0.99


def test_lsh_topk_subset_of_exact(spark):
    emb = _emb(spark, [[1, 0], [0.99, 0.14], [-1, 0.1], [0.98, 0.2]])
    approx = lsh_bucketed_topk(emb, emb, k=3).collect()
    # approximate results must still be true cosines (spot check one)
    for r in approx:
        assert -1.0 <= r["cos"] <= 1.0


def test_similarity_clusters_cover_all_vectors(spark):
    emb = _emb(spark, [[1, 0], [0.9, 0.1], [0, 1], [-1, 0]])
    rows = similarity_clusters(emb, k=1, min_cosine=0.95).collect()
    assert {r["vec_id"] for r in rows} == {0, 1, 2, 3}


def test_block_topk_ties_match_exact_topk(spark):
    """ADVICE r2 #1 regression: ≥k+2 duplicate vectors (all cosines
    tie at 1.0) scattered across blocks — the block partial must not
    drop a lower-id tied neighbor before the global (cos desc, id
    asc) window resolves the tie."""
    dups = [[1.0, 0.0]] * 8  # ids 0..7, all identical
    rest = [[0.0, 1.0], [0.7, 0.7]]  # ids 8, 9
    emb = _emb(spark, dups + rest)
    exact = sorted(map(tuple, cosine_topk(emb, emb, k=2).collect()))
    blocked = sorted(
        map(
            tuple,
            block_cosine_topk(
                emb, emb, k=2, query_blocks=3, corpus_blocks=4
            ).collect(),
        )
    )
    assert blocked == exact


def test_ivf_nprobe_recall_monotone(spark, sf_dir):
    """nprobe is the recall dial: every nprobe=1 hit is present at
    nprobe=2 with the same cosine, recall vs exact top-k never drops,
    and probing every cell recovers the exact result."""
    from connected_component_spark.operators.similarity import ivf_topk
    from connected_component_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(queries, emb, k=3).collect()
    }

    def hits(nprobe):
        return {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(
                queries, emb, k=3, centroid_stride=10, nprobe=nprobe
            ).collect()
        }

    n_centroids = emb.where(F.col("vec_id") % 10 == 0).count()
    r1, r2, rall = hits(1), hits(2), hits(n_centroids)
    assert len(r1 & exact) <= len(r2 & exact) <= len(rall & exact)
    assert rall == exact  # probing every cell = brute force


def test_ivf_topk_out_of_corpus_queries(spark):
    """r4 verdict #3: query vectors NOT present in the corpus (the
    serving path) must be scored against the broadcast centroids, not
    silently dropped by a join against corpus assignments.  Every
    query gets k results; with every cell probed the result equals
    brute force against the corpus."""
    import numpy as np

    from connected_component_spark.operators.similarity import ivf_topk

    rng = np.random.default_rng(11)
    corpus = _emb(spark, [list(rng.standard_normal(6)) for _ in range(40)])
    # disjoint id space AND vectors never seen in the corpus
    qvecs = [list(rng.standard_normal(6)) for _ in range(5)]
    queries = spark.createDataFrame(
        [(1000 + i, [float(x) for x in v], 0) for i, v in enumerate(qvecs)],
        "vec_id long, embedding array<float>, label int",
    )
    got = ivf_topk(queries, corpus, k=3, centroid_stride=8, nprobe=1).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r.query_id, []).append(r.neighbor_id)
    assert set(per_q) == {1000, 1001, 1002, 1003, 1004}
    assert all(len(v) == 3 for v in per_q.values())
    # probing every cell = brute force, even for foreign queries
    n_cells = 5  # ids 0,8,16,24,32 at stride 8
    allprobe = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(
            queries, corpus, k=3, centroid_stride=8, nprobe=n_cells
        ).collect()
    }
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(queries, corpus, k=3).collect()
    }
    assert allprobe == exact


def test_lsh_threshold_pairs_verified_subset(spark):
    """LSH-pruned pairs must be a subset of the exact threshold pairs
    with identical cosine values (candidates may miss — recall < 1 —
    but the verify step must never pass a wrong value or pair)."""
    emb = _emb(
        spark,
        [[1, 0], [0.99, 0.14], [0.97, 0.24], [0, 1], [0.1, 0.99], [-1, 0.2]],
    )
    exact = {
        (r["a"], r["b"]): r["cos"]
        for r in cosine_threshold_pairs(emb, 0.9).collect()
    }
    pruned = {
        (r["a"], r["b"]): r["cos"]
        for r in lsh_threshold_pairs(emb, 0.9, planes=2, tables=3).collect()
    }
    assert set(pruned) <= set(exact)
    for k, v in pruned.items():
        assert v == exact[k]
    assert len(pruned) > 0  # near-identical vectors collide somewhere


def test_lsh_wide_vector_fails_loudly(spark):
    """Vectors wider than the baked sign table must raise at run time
    (raise_error guard), never silently hash into a wrong bucket."""
    import connected_component_spark.operators.similarity as sim

    wide = _emb(spark, [[0.5] * (sim._SIGN_DIM + 1)])
    with pytest.raises(Exception, match="sign table covers dim"):
        lsh_bucketed_topk(wide, wide, k=1).collect()


def test_cluster_ops_raise_on_iteration_cap(spark):
    """VERDICT r2 #7: a capped CC run must fail loudly instead of
    silently shipping partially-merged clusters."""
    emb = _emb(spark, [[1, 0], [0.9, 0.1], [0, 1], [-1, 0]])
    with pytest.raises(RuntimeError, match="iteration cap"):
        similarity_clusters(emb, k=1, min_cosine=0.95, max_iterations=1)
    docs = _docs(spark, ["a b c d e", "a b c d f", "x y z w v"])
    with pytest.raises(RuntimeError, match="iteration cap"):
        ngram_dedup_clusters(docs, threshold=0.5, max_iterations=1)


def test_multimodal_plumbing_deterministic(spark):
    docs = _docs(spark, ["hello world", "abc"])
    out = {r["doc_id"]: r for r in decode_metadata(with_binary_payload(docs)).collect()}
    assert out[0]["n_bytes"] == 11
    assert out[1]["n_bytes"] == 3
    assert out[0]["width"] == 11 % 640 + 1
    assert out[0]["fmt"] in ("rgb", "rgba", "gray")


# ---------------------------------------------------------------------------
# kmeans_assign (operators/clustering.py)
# ---------------------------------------------------------------------------

def test_kmeans_separates_two_obvious_blobs(spark):
    from connected_component_spark.operators.clustering import kmeans_assign

    # ids 0,1 seed the two centroids; points sit in two far-apart
    # blobs, so 2 Lloyd rounds must land every point with its blob
    rows = [
        (0, [0.0, 0.0]), (2, [0.5, 0.0]), (4, [0.0, 0.5]),
        (1, [10.0, 10.0]), (3, [10.5, 10.0]), (5, [10.0, 10.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.id: r.cluster for r in kmeans_assign(df, k=2, iterations=2).collect()}
    assert got == {0: 0, 2: 0, 4: 0, 1: 1, 3: 1, 5: 1}


def test_kmeans_zero_iterations_assigns_to_seeds(spark):
    from connected_component_spark.operators.clustering import kmeans_assign

    rows = [(0, [0.0]), (1, [10.0]), (2, [1.0]), (3, [9.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.id: r.cluster for r in kmeans_assign(df, k=2, iterations=0).collect()}
    assert got == {0: 0, 1: 1, 2: 0, 3: 1}


def test_kmeans_tie_breaks_on_lower_centroid_id(spark):
    from connected_component_spark.operators.clustering import kmeans_assign

    # point 2 is exactly equidistant from both seeds: lower cid wins
    rows = [(0, [0.0]), (1, [2.0]), (2, [1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.id: r.cluster for r in kmeans_assign(df, k=2, iterations=0).collect()}
    assert got[2] == 0


def test_kmeans_rejects_bad_params(spark):
    import pytest as _pytest

    from connected_component_spark.operators.clustering import kmeans_assign

    df = spark.createDataFrame([(0, [0.0])], "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError):
        kmeans_assign(df, k=0)
    with _pytest.raises(ValueError):
        kmeans_assign(df, iterations=-1)


def test_kmeans_empty_input_returns_empty(spark):
    from connected_component_spark.operators.clustering import kmeans_assign

    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = kmeans_assign(df, k=3, iterations=2)
    assert out.columns == ["id", "cluster", "sq_dist"]
    assert out.count() == 0


def test_distinctive_terms_ranks_rare_terms_first(spark):
    from connected_component_spark.operators.text import distinctive_terms

    docs = _docs(
        spark,
        [
            "apple apple banana common",
            "cherry common common",
            "banana common",
        ],
    )
    out = {
        (r.doc_id, r.rank): (r.token, r.tf, r.df, r.score_ppm)
        for r in distinctive_terms(docs, top_k=2).collect()
    }
    # doc 0: apple tf=2 df=1 -> 2_000_000 beats banana (1M/2=500k)
    assert out[(0, 1)] == ("apple", 2, 1, 2_000_000)
    assert out[(0, 2)] == ("banana", 1, 2, 500_000)
    # doc 1: cherry unique (1M) beats common (tf=2, df=3 -> 666_666)
    assert out[(1, 1)] == ("cherry", 1, 1, 1_000_000)
    assert out[(1, 2)] == ("common", 2, 3, 666_666)
    # doc 2: banana (500k) vs common (1M/3=333_333)
    assert out[(2, 1)] == ("banana", 1, 2, 500_000)
    assert out[(2, 2)] == ("common", 1, 3, 333_333)


def test_substring_dup_stats_finds_shared_spans(spark):
    from connected_component_spark.operators.dedup import substring_dup_stats

    shared = "X" * 40  # 9 windows of width 32, all duplicated
    docs = _docs(
        spark,
        [
            shared + " unique tail zero one two three",
            "different head text here " + shared,
            "totally unrelated document body that is long enough to window",
            "short",  # below width -> 0 windows
        ],
    )
    rows = {r.doc_id: r for r in substring_dup_stats(docs, width=32).collect()}
    assert rows[3].n_windows == 0 and rows[3].dup_ppm == 0
    for d in (0, 1):
        assert rows[d].n_dup_windows == 9
        assert 0 < rows[d].dup_ppm < 1_000_000
    assert rows[2].n_dup_windows == 0 and rows[2].dup_ppm == 0
    # window count is len - width + 1
    texts = {
        0: shared + " unique tail zero one two three",
        1: "different head text here " + shared,
        2: "totally unrelated document body that is long enough to window",
    }
    for d, t in texts.items():
        assert rows[d].n_windows == len(t) - 31


def test_cosine_radius_search_known_answers(spark):
    from connected_component_spark.operators.similarity import cosine_radius_search

    emb = _emb(spark, [[1, 0], [0.8, 0.6], [0, 1], [-1, 0]])
    q = emb.where(F.col("vec_id") == 0)
    got = {
        (r["neighbor_id"], r["cos"])
        for r in cosine_radius_search(q, emb, radius=0.5).collect()
    }
    # cos(v0, v1) = 0.8, cos(v0, v2) = 0, cos(v0, v3) = -1
    assert got == {(1, 0.8)}
    # radius below 0 admits the orthogonal vector too
    got2 = {
        r["neighbor_id"]
        for r in cosine_radius_search(q, emb, radius=0.0).collect()
    }
    assert got2 == {1, 2}


def test_token_rarity_exact_integers(spark):
    from connected_component_spark.operators.text import token_rarity

    docs = _docs(spark, ["a a b", "a c", "c c"])
    # corpus tf: a=3, b=1, c=3; corpus_tokens=7, n_docs=3
    rows = {r["doc_id"]: r for r in token_rarity(docs).collect()}
    assert rows[0]["n_tokens"] == 3
    assert rows[0]["sum_tf"] == 3 + 3 + 1
    assert rows[0]["min_tf"] == 1
    assert rows[0]["rare_ppm"] == 1_000_000 * 1 * 3 // 7
    assert rows[1]["sum_tf"] == 3 + 3 and rows[1]["min_tf"] == 3
    assert rows[2]["n_tokens"] == 2 and rows[2]["min_tf"] == 3


def test_substring_dup_stats_random_differential(spark):
    """Seeded random corpora vs a naive Python window counter — the
    window-partition rewrite (min!=max doc_id over wh) must agree
    with brute force on every doc, including duplicate windows within
    one doc and docs shorter than the window."""
    import random

    from connected_component_spark.operators.dedup import substring_dup_stats

    rng = random.Random(90210)
    w = 8
    for _ in range(3):
        texts = []
        for _i in range(12):
            n = rng.randrange(0, 30)
            texts.append("".join(rng.choice("abc") for _ in range(n)))
        # force cross-doc sharing: clone one doc's text
        if len(texts) > 2 and len(texts[0]) >= w:
            texts[1] = texts[0]
        docs = _docs(spark, texts)

        windows = {
            i: [t[j : j + w] for j in range(len(t) - w + 1)]
            if len(t) >= w
            else []
            for i, t in enumerate(texts)
        }
        owners: dict = {}
        for i, ws in windows.items():
            for x in set(ws):
                owners.setdefault(x, set()).add(i)
        expected = {}
        for i, ws in windows.items():
            dup = sum(1 for x in ws if len(owners[x]) >= 2)
            expected[i] = (len(ws), dup)

        got = {
            r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
            for r in substring_dup_stats(docs, width=w).collect()
        }
        assert got == expected


# --------------------------------------------------------------------------
# corpus-sized LSH bucketing (auto_planes)
# --------------------------------------------------------------------------


def test_auto_planes_exact_integer_rule():
    """Plane p >= floor activates iff n > target * 2^p — the exact
    rule the DuckDB oracle twin evaluates as a scalar-subquery gate,
    so boundaries must match bit-for-bit (no float log2)."""
    from connected_component_spark.operators.similarity import (
        AUTO_PLANES_CAP,
        AUTO_PLANES_FLOOR,
        AUTO_TARGET_BUCKET_ROWS,
        auto_planes,
    )

    t, f = AUTO_TARGET_BUCKET_ROWS, AUTO_PLANES_FLOOR
    assert auto_planes(0) == f
    assert auto_planes(1) == f
    # boundary: exactly target * 2^floor rows stays at the floor,
    # one more row adds a plane
    assert auto_planes(t * 2 ** f) == f
    assert auto_planes(t * 2 ** f + 1) == f + 1
    assert auto_planes(10 ** 15) == AUTO_PLANES_CAP
    ns = [10, 500, 2049, 5000, 50_000, 10 ** 7, 10 ** 10]
    ps = [auto_planes(n) for n in ns]
    assert ps == sorted(ps)  # monotone in corpus size
    # sf0.01 fixture (500 vectors) stays at the floor: existing
    # driver-green hashes are unchanged by auto-sizing
    assert auto_planes(500) == f


def test_auto_planes_bounds_bucket_occupancy_at_10x(spark):
    """r3 verdict task 2: on a corpus 10x the sf0.01 fixture, derived
    planes must keep mean bucket occupancy near the target where the
    old fixed floor planes would blow past it."""
    import numpy as np

    from connected_component_spark.operators.similarity import (
        AUTO_PLANES_FLOOR,
        AUTO_TARGET_BUCKET_ROWS,
        _hyperplane_bucket,
        auto_planes,
    )

    n, d = 5000, 16  # 10x the sf0.01 embeddings table
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((n, d))
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    planes = auto_planes(n)
    assert planes > AUTO_PLANES_FLOOR  # the adaptive path is exercised

    def occupancy(p):
        rows = (
            emb.select(
                _hyperplane_bucket(F.col("embedding"), p, dim=d).alias("b")
            )
            .groupBy("b")
            .count()
            .collect()
        )
        sizes = [r["count"] for r in rows]
        return sum(sizes) / len(sizes), max(sizes)

    mean_auto, max_auto = occupancy(planes)
    mean_fixed, _ = occupancy(AUTO_PLANES_FLOOR)
    assert mean_auto <= 2 * AUTO_TARGET_BUCKET_ROWS
    assert max_auto <= 6 * AUTO_TARGET_BUCKET_ROWS
    # the fixed floor planes would already violate the occupancy
    # target at this scale — the hazard auto-sizing removes
    assert mean_fixed > 2 * AUTO_TARGET_BUCKET_ROWS


def test_lsh_auto_planes_cross_engine_at_10x(spark, tmp_path):
    """Spark auto-planes bucketing vs the DuckDB scalar-subquery-gated
    twin on a 10x corpus: identical top-k at a plane count ABOVE the
    floor (the sf0.01 driver run only exercises the floor)."""
    import duckdb
    import numpy as np
    import pandas as pd

    from connected_component_spark.operators.similarity import (
        AUTO_PLANES_FLOOR,
        auto_planes,
    )
    from connected_component_spark.queries.llmops import (
        _DOT,
        _bucket_expr_sql,
        _norm_sql,
    )
    from connected_component_spark.queries.parity import roundd_sql

    n, d = 5000, 16
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((n, d))
    assert auto_planes(n) > AUTO_PLANES_FLOOR
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype="int64"),
            "embedding": [[float(x) for x in v] for v in vecs],
        }
    )
    path = str(tmp_path / "embeddings.parquet")
    pdf.to_parquet(path)

    emb = spark.read.parquet(path)
    queries = emb.where(F.col("vec_id") % 500 == 0)
    got = {
        (r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
        for r in lsh_bucketed_topk(queries, emb, k=3, dim=d).collect()
    }

    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{path}'")
    cos = roundd_sql(
        _DOT.format(a="qv", b="cv")
        + f" / ({_norm_sql('qv')} * {_norm_sql('cv')})",
        6,
    )
    oracle = con.sql(
        f"""
        WITH q AS (
          SELECT vec_id AS query_id, embedding AS qv,
                 {_bucket_expr_sql('embedding')} AS bucket
          FROM embeddings WHERE vec_id % 500 = 0
        ),
        c AS (
          SELECT vec_id AS neighbor_id, embedding AS cv,
                 {_bucket_expr_sql('embedding')} AS bucket
          FROM embeddings
        ),
        scored AS (
          SELECT query_id, neighbor_id, {cos} AS cos
          FROM q JOIN c USING (bucket)
          WHERE query_id <> neighbor_id
        ),
        ranked AS (
          SELECT query_id, neighbor_id, cos,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id ASC) AS rank
          FROM scored
        )
        SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 3
        """
    ).fetchall()
    assert got == {tuple(r) for r in oracle}
    assert len(got) > 0


def test_chunk_documents_boundaries(spark):
    """Empty doc -> one empty chunk; exactly max_tokens -> one chunk;
    max_tokens+1 -> two chunks whose second starts overlap tokens
    before the first's end (continuity)."""
    from connected_component_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, ""),
            (2, " ".join(f"t{i}" for i in range(24))),
            (3, " ".join(f"t{i}" for i in range(25))),
            (4, "a"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(docs, max_tokens=24, overlap=4).collect()
    }
    assert rows[(1, 0)] == (0, "")
    assert rows[(2, 0)][0] == 24 and (2, 1) not in rows
    assert rows[(3, 0)][0] == 24
    # second chunk: starts at token index 20 (overlap=4 before 24)
    assert rows[(3, 1)] == (5, "t20 t21 t22 t23 t24")
    assert rows[(4, 0)] == (1, "a")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, max_tokens=8, overlap=8)


def test_chunk_documents_null_text(spark):
    """NULL text = empty doc: one empty chunk with n_tokens=0, never a
    phantom max_tokens-sized chunk (greatest/least SKIP nulls, so the
    unguarded arithmetic would emit n_tokens=max_tokens)."""
    from connected_component_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, None), (2, "a b")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: (r["chunk_idx"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(docs, max_tokens=8, overlap=2).collect()
    }
    assert rows[1] == (0, 0, "")
    assert rows[2] == (0, 2, "a b")


def test_semantic_dedup_valve_cross_engine_when_splitting(spark, tmp_path):
    """The DECLARED SemDeDup path with the valve actually BITING:
    a skewed corpus (90% of vectors share one dominant direction)
    overloads one k-means cell past the cap, so the md5 hash-sub-split
    runs with splits > 1 in both engines — the fixture corpus never
    exercises that regime (its clusters stay under the cap).  Full
    row-for-row equality with the DuckDB oracle, plus the bounded
    join-group-size property the valve exists for."""
    import hashlib
    import math

    import duckdb
    import numpy as np
    import pandas as pd

    from connected_component_spark.queries.llmops import (
        PIPELINE_SEMANTIC_DEDUP_SQL,
        _semdedup_cap,
        pipeline_semantic_dedup,
    )

    n, d = 2000, 8
    rng = np.random.default_rng(23)
    base = rng.standard_normal(d)
    vecs = np.vstack(
        [
            base + rng.standard_normal((int(n * 0.9), d)) * 0.05,
            rng.standard_normal((n - int(n * 0.9), d)),
        ]
    )
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype="int64"),
            "embedding": [[float(x) for x in v] for v in vecs],
        }
    )
    path = str(tmp_path / "embeddings.parquet")
    pdf.to_parquet(path)

    rows = pipeline_semantic_dedup(spark, str(tmp_path)).collect()
    got = sorted((r.vec_id, r.sem_cluster, r.dup_group, r.keep) for r in rows)

    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{path}'")
    want = sorted(tuple(r) for r in con.sql(PIPELINE_SEMANTIC_DEDUP_SQL).fetchall())
    assert got == want
    assert len(got) == n

    # the valve must actually have split: the dominant cell holds far
    # more rows than the cap, and the replicated (cluster, sub) groups
    # all stay bounded (md5 spread — 2x slack for hash imbalance)
    cap = _semdedup_cap(n)
    csz: dict = {}
    for _, c, _, _ in got:
        csz[c] = csz.get(c, 0) + 1
    assert max(csz.values()) > cap, "fixture not skewed enough to split"
    groups: dict = {}
    for vid, c, _, _ in got:
        splits = max(1, math.ceil(csz[c] / float(cap)))
        sub = int(hashlib.md5(str(vid).encode()).hexdigest()[:15], 16) % splits
        groups[(c, sub)] = groups.get((c, sub), 0) + 1
    assert max(groups.values()) <= 2 * cap


def test_semantic_dedup_cluster_cap_bounds_groups(spark):
    """max_cluster_rows hash-sub-splits oversized semantic clusters:
    every vector still appears exactly once in the output, kept reps
    are group minima, and the capped run finds a subset of the
    uncapped run's merges (sub-splitting only removes pairs)."""
    import numpy as np

    from connected_component_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(3)
    # one dominant direction: most vectors land in one k-means cluster
    base = rng.standard_normal(8)
    vecs = [
        list(base + rng.standard_normal(8) * 0.05) for _ in range(40)
    ] + [list(rng.standard_normal(8)) for _ in range(10)]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    full = {
        r["vec_id"]: r["dup_group"]
        for r in semantic_dedup(emb, threshold=0.9, k=4).collect()
    }
    capped_rows = semantic_dedup(
        emb, threshold=0.9, k=4, max_cluster_rows=10
    ).collect()
    capped = {r["vec_id"]: r["dup_group"] for r in capped_rows}
    assert set(capped) == set(range(50))  # full coverage, once each
    assert sum(r["keep"] for r in capped_rows) == len(
        {r["dup_group"] for r in capped_rows}
    )
    # capped merges are a refinement: two ids merged under the cap
    # must also be merged without it
    for i in range(50):
        for j in range(50):
            if capped[i] == capped[j]:
                assert full[i] == full[j]


def test_lm_score_hand_computed(spark):
    """Uniform 2-token corpus: every token has p=0.5, so every
    non-empty doc's mean NLL is exactly round(-ln(0.5), 9) and empty
    docs report (0, 0.0)."""
    import math

    from connected_component_spark.operators.text import lm_score

    docs = _docs(spark, ["a a b", "b", ""])
    rows = {r["doc_id"]: (r["n_tokens"], r["nll"]) for r in lm_score(docs).collect()}
    want_nll = round(round(-math.log(0.5), 9), 6)
    assert rows[0] == (3, want_nll)
    assert rows[1] == (1, want_nll)
    assert rows[2] == (0, 0.0)


def test_lm_score_ranks_rare_tokens_higher(spark):
    """A doc of corpus-rare tokens must score a higher NLL than a doc
    of corpus-common tokens (the filter's entire point)."""
    from connected_component_spark.operators.text import lm_score

    docs = _docs(
        spark,
        ["the the the the", "the the the the", "zq xv wk jt"],
    )
    rows = {r["doc_id"]: r["nll"] for r in lm_score(docs).collect()}
    assert rows[2] > rows[0] == rows[1]


def test_redact_pii_hand_computed(spark):
    """r8 PII scrub: planted items are counted independently on the
    original text and removed in declared order (the email's host is
    consumed by <EMAIL> before the ipv4 pattern could double-redact
    it); clean text passes through byte-identical."""
    from connected_component_spark.operators.text import redact_pii

    rows = [
        (1, "write to alice.smith+x@corp.example.org today"),
        (2, "server 192.168.1.254 answered"),
        (3, "call 555-010-1234 or 555-0100-4321"),
        (4, "email bob@10.0.0.1 raw-ip host"),
        (5, "no pii here at all"),
        (6, "ask carol@host.example.net or 10.1.2.3 now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}

    assert got[1]["n_email"] == 1 and got[1]["text"] == "write to <EMAIL> today"
    assert got[2]["n_ipv4"] == 1 and got[2]["text"] == "server <IP> answered"
    assert got[3]["n_phone"] == 2
    assert got[3]["text"] == "call <PHONE> or <PHONE>"
    # raw-IP mail host: the email pattern requires an alphabetic TLD
    # (anti-false-positive), so only the ipv4 redaction fires — the
    # address is still scrubbed, just labeled as an IP
    assert got[4]["n_email"] == 0 and got[4]["n_ipv4"] == 1
    assert got[4]["text"] == "email bob@<IP> raw-ip host"
    assert got[5]["text"] == "no pii here at all"
    assert (
        got[5]["n_email"] == got[5]["n_ipv4"] == got[5]["n_phone"] == 0
    )
    # multiple labels in one doc redact independently
    assert got[6]["n_email"] == 1 and got[6]["n_ipv4"] == 1
    assert got[6]["text"] == "ask <EMAIL> or <IP> now"


def test_bm25_ranks_rare_term_doc_first(spark):
    """A document containing the query's rare discriminative term must
    outrank ones matching only common terms; an absent-from-corpus
    query term contributes nothing; the max_df valve drops
    stopword-grade terms from scoring."""
    from connected_component_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "the fast table scan runs the table"),
            (2, "the slow merge join"),
            (3, "the rareword appears here"),
            (4, "the fast join and the fast scan"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(1, "rareword the"), (2, "fast zzz")],
        "query_id long, query_text string",
    )
    got = bm25_topk(docs, q, k=4).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    # collect() order is not contractual — sort by rank first
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rank"])
    # q1: doc 3 holds the rare term; "the" is in every doc (idf near
    # zero) so doc 3 must rank first
    assert by_q[1][0]["doc_id"] == 3 and by_q[1][0]["rank"] == 1
    # q2: "zzz" is absent from the corpus -> only "fast" scores; docs
    # 1 and 4 are the only candidates
    assert {r["doc_id"] for r in by_q[2]} == {1, 4}
    # ranks are dense from 1 and scores non-increasing
    for rows in by_q.values():
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
    # valve: with max_df=1 the everywhere-term "the" is dropped, so
    # query 1 matches doc 3 only
    valved = bm25_topk(docs, q, k=4, max_df=1).collect()
    q1 = [r for r in valved if r["query_id"] == 1]
    assert [r["doc_id"] for r in q1] == [3]


def test_textrank_hub_word_ranks_first(spark):
    """A word adjacent to many distinct words (graph hub) must
    out-rank words that only ever co-occur with one neighbor."""
    from connected_component_spark.operators.text import textrank_keywords

    docs = spark.createDataFrame(
        [
            (1, "core alpha"),
            (2, "core beta"),
            (3, "core gamma"),
            (4, "core delta"),
            (5, "leaf leaf2"),
        ],
        "doc_id long, text string",
    )
    got = textrank_keywords(docs, top_k=10).collect()
    got.sort(key=lambda r: r["pos"])
    assert got[0]["token"] == "core" and got[0]["pos"] == 1
    assert [r["pos"] for r in got] == list(range(1, len(got) + 1))
    # every graph participant appears exactly once
    assert len({r["token"] for r in got}) == len(got) == 7


def test_bm25_hard_negatives_excludes_own_cluster(spark):
    """The anchor itself and every member of its near-dup cluster are
    positives and must never appear among its hard negatives; ranking
    happens AFTER exclusion so excluded docs don't consume slots."""
    from connected_component_spark.operators.text import bm25_hard_negatives

    docs = spark.createDataFrame(
        [
            (1, "spark query engine fast"),
            (2, "spark query engine fast extra"),  # near-dup of 1
            (3, "spark query slow"),
            (4, "unrelated words entirely different"),
        ],
        "doc_id long, text string",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 4)], "doc_id long, cluster long"
    )
    anchors = docs.where(F.col("doc_id") == 1).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    got = bm25_hard_negatives(docs, anchors, clusters, k=3).collect()
    ids = {r["doc_id"] for r in got}
    assert 1 not in ids and 2 not in ids  # self + cluster-mate excluded
    assert 3 in ids  # the hard negative: lexically close, different cluster
    got.sort(key=lambda r: r["rank"])
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))
    assert got[0]["doc_id"] == 3  # shares the most terms -> hardest


def test_bm25_matches_pure_python_reference(spark):
    """Independent differential (the pagerank-vs-numpy pattern): the
    distributed BM25 must match a from-scratch pure-Python Okapi
    implementation on seeded random corpora to 1e-6 — catching any
    formula/plumbing error the DuckDB oracle (built from the same
    reading of the formula) could share."""
    import math
    import random

    from connected_component_spark.operators.text import bm25_topk

    k1, b = 1.2, 0.75
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    docs_py = {
        i: [rng.choice(vocab) for _ in range(rng.randint(3, 40))]
        for i in range(60)
    }
    queries_py = {1: ["w0", "w3", "w7"], 2: ["w11", "w29"], 3: ["w5"]}

    # -- reference implementation, straight from the paper ----------
    n_docs = len(docs_py)
    avgdl = sum(len(t) for t in docs_py.values()) / n_docs
    df = {}
    for toks in docs_py.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1

    def score(q_terms, toks):
        s = 0.0
        for t in set(q_terms):
            if t not in df or t not in toks:
                continue
            tf = toks.count(t)
            idf = math.log(1 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * len(toks) / avgdl)
            )
        return s

    expected = {}
    for qid, terms in queries_py.items():
        scored = [
            (d, score(terms, toks))
            for d, toks in docs_py.items()
            if any(t in toks for t in terms)
        ]
        scored.sort(key=lambda x: (-x[1], x[0]))
        expected[qid] = scored[:5]

    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs_py.items()],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(qid, " ".join(t)) for qid, t in queries_py.items()],
        "query_id long, query_text string",
    )
    got = {}
    for r in bm25_topk(docs, q, k1=k1, b=b, k=5).collect():
        got.setdefault(r["query_id"], []).append(r)
    for qid, rows in got.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["doc_id"] for r in rows] == [d for d, _ in expected[qid]]
        for r, (_, s) in zip(rows, expected[qid]):
            assert abs(r["score"] - s) <= 1e-6, (qid, r["doc_id"], r["score"], s)
    assert set(got) == set(expected)


def test_textrank_matches_pure_python_reference(spark):
    """Independent differential for the TextRank composition: build
    the bigram co-occurrence graph and run synchronous PageRank from
    scratch in pure Python on a seeded random corpus — the operator's
    ranking and ranks must match (1e-6), isolating the graph
    construction the pagerank-vs-numpy test doesn't cover."""
    import random

    from connected_component_spark.operators.text import textrank_keywords

    rng = random.Random(13)
    vocab = [f"t{i}" for i in range(12)]
    docs_py = [
        [rng.choice(vocab) for _ in range(rng.randint(2, 15))]
        for _ in range(25)
    ]

    edges = set()
    for toks in docs_py:
        for a, bb in zip(toks, toks[1:]):
            if a != bb:
                edges.add((a, bb))
                edges.add((bb, a))
    nodes = sorted({u for u, _ in edges})
    out = {u: sum(1 for e in edges if e[0] == u) for u in nodes}
    n = len(nodes)
    d = 0.85
    rank = {u: 1.0 / n for u in nodes}
    for _ in range(5):
        nxt = {}
        for u in nodes:
            s = sum(rank[v] / out[v] for v, w in edges if w == u)
            nxt[u] = (1.0 - d) / n + d * s
        rank = nxt
    want = sorted(
        ((round(r, 6), t) for t, r in rank.items()),
        key=lambda x: (-x[0], x[1]),
    )[:10]

    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs_py)],
        "doc_id long, text string",
    )
    got = textrank_keywords(docs, top_k=10).collect()
    got.sort(key=lambda r: r["pos"])
    assert [r["token"] for r in got] == [t for _, t in want]
    for r, (rr, _) in zip(got, want):
        assert abs(r["rank"] - rr) <= 1e-6


def test_knn_label_vote_matches_numpy_reference(spark):
    """Independent differential for the k-NN label evaluation: numpy
    cosine top-k + a hand-rolled majority vote (ties to the smallest
    label) on a seeded random corpus must reproduce the query's
    prediction and correctness rows exactly."""
    import numpy as np

    from connected_component_spark.queries.llmops import _KNN_K

    rng = np.random.default_rng(23)
    n, dim = 120, 8
    vecs = rng.standard_normal((n, dim))
    labels = rng.integers(0, 4, size=n)
    emb = spark.createDataFrame(
        [
            (i, [float(x) for x in vecs[i]], int(labels[i]))
            for i in range(n)
        ],
        "vec_id long, embedding array<float>, label int",
    )
    # mirror the declared query's shape on this corpus: queries are
    # the vec_id % 50 == 0, < 500 subset, k=5 neighbors, self excluded
    from connected_component_spark.operators.similarity import cosine_topk
    from pyspark.sql import Window, functions as F

    queries = emb.where((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 500))
    topk = cosine_topk(queries, emb, k=_KNN_K)
    votes = (
        topk.join(
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("n_label"),
            ),
            "neighbor_id",
        )
        .groupBy("query_id", "n_label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    pick = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("n_label").asc()
    )
    got = {
        r["query_id"]: r["n_label"]
        for r in votes.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .collect()
    }

    # numpy reference: float32-rounded vectors like the stored column
    v32 = vecs.astype(np.float32).astype(np.float64)
    norms = np.linalg.norm(v32, axis=1)
    for qid in range(0, n, 50):
        cos = (v32 @ v32[qid]) / (norms * norms[qid])
        cos = np.round(cos, 6)  # the operator ranks rounded cosines
        order = sorted(
            (i for i in range(n) if i != qid),
            key=lambda i: (-cos[i], i),
        )[:_KNN_K]
        counts = {}
        for i in order:
            counts[int(labels[i])] = counts.get(int(labels[i]), 0) + 1
        pred = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        assert got[qid] == pred, (qid, got[qid], pred)


def test_bm25_edge_cases_empty_and_absent(spark):
    """Edge pins: an empty query batch yields an empty result (not an
    error); a query whose every term is absent from the corpus yields
    no rows for that query while other queries are unaffected; an
    empty-text query contributes nothing."""
    from connected_component_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta delta")],
        "doc_id long, text string",
    )
    empty_q = spark.createDataFrame([], "query_id long, query_text string")
    assert bm25_topk(docs, empty_q, k=3).count() == 0

    q = spark.createDataFrame(
        [(1, "zzz qqq"), (2, "beta"), (3, "")],
        "query_id long, query_text string",
    )
    got = bm25_topk(docs, q, k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r["doc_id"])
    assert 1 not in by_q and 3 not in by_q
    assert sorted(by_q[2]) == [1, 2]


def test_batch_ivf_serving_is_probe_pruned(spark, sf_dir):
    """r12: the batch IVF family semi-joins the storage assignment
    against the bounded probed-cell set ahead of the corpus join —
    the executed plan carries a LeftSemi on the cell key, so unprobed
    cells' vectors/codes never reach the candidate work (in-plan and
    lazy; the durable index keeps the collected PartitionFilter
    variant for directory-level pruning)."""
    import re

    from connected_component_spark.operators.quantize import (
        ivfpq_topk,
        pq_codebooks,
    )
    from connected_component_spark.operators.similarity import ivf_topk
    from connected_component_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") % 200 == 0)

    out = ivf_topk(q, emb, k=3, centroid_stride=50, nprobe=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"\[(cell|cid)#\d+L?\], LeftSemi", plan), plan[:3000]
    assert out.count() > 0

    books = pq_codebooks(emb, dim=64, m=2, k=4, iterations=1)
    # ivfpq: the prune IS the probe x storage inner join on the cell
    # key (storage has no other consumer, so a semi-join would prune
    # nothing extra — review r12); assert the cell equi-join is in the
    # executed plan ahead of the ADC work
    out2 = ivfpq_topk(q, emb, books, k=3, centroid_stride=50, nprobe=1)
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"\[(cell|cid)#\d+L?\], Inner", plan2), plan2[:3000]
    assert out2.count() > 0


def test_bm25_bounded_query_batch_guard(spark):
    """advice r11: the query-term table is broadcast, so bm25 raises on
    a query batch above max_queries instead of silently building an
    unbroadcastable table; None disables; the valve applies to
    hard-negative mining's anchors too."""
    import pytest

    from connected_component_spark.operators.text import (
        bm25_hard_negatives,
        bm25_scores,
        bm25_topk,
    )

    docs = spark.createDataFrame(
        [(i, f"word{i} shared") for i in range(8)], "doc_id long, text string"
    )
    q = docs.select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    clusters = docs.select("doc_id", F.col("doc_id").alias("cluster"))
    with pytest.raises(ValueError, match="max_queries"):
        bm25_scores(docs, q, max_queries=3)
    with pytest.raises(ValueError, match="max_queries"):
        bm25_topk(docs, q, max_queries=3)
    with pytest.raises(ValueError, match="max_queries"):
        bm25_hard_negatives(docs, q, clusters, max_queries=3)
    # at or under the bound (and with None) the batch scores normally
    assert bm25_scores(docs, q, max_queries=8).count() > 0
    assert bm25_scores(docs, q, max_queries=None).count() > 0


def test_bm25_max_df_broadcasts_candidate_dl(spark):
    """verdict r11: with max_df bounding the candidate set, the
    doc-length table is reduced to candidate doc_ids and BROADCAST
    into the scoring join — no corpus-wide dl shuffle — and scores are
    identical to the unreduced plan's."""
    from connected_component_spark.operators.text import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha delta"),
            (3, "epsilon zeta eta theta"),
            (4, "beta iota"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(1, "alpha beta")], "query_id long, query_text string"
    )
    capped = bm25_scores(docs, q, max_df=3)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    # the dl aggregate feeds a broadcast exchange, not a shuffle join
    assert "dl" in plan
    got = sorted(map(tuple, capped.collect()))
    want = sorted(map(tuple, bm25_scores(docs, q).collect()))
    assert got == want


def test_tfidf_matches_pure_python_reference(spark):
    """Independent differential (the bm25 pattern): the distributed
    TF-IDF cosine retrieval must match a from-scratch pure-Python
    vector-space implementation on a seeded random corpus to 1e-6 —
    ranking exactly, scores numerically."""
    import math
    import random

    from connected_component_spark.operators.text import tfidf_topk

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(25)]
    docs_py = {
        i: [rng.choice(vocab) for _ in range(rng.randint(3, 30))]
        for i in range(50)
    }
    queries_py = {1: ["w0", "w3"], 2: ["w11", "w24", "zzz"], 3: ["w5"]}

    n_docs = len(docs_py)
    df = {}
    for toks in docs_py.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1

    def idf(t):
        return math.log(1.0 + n_docs / df[t])

    dnorm = {
        d: math.sqrt(
            sum((toks.count(t) * idf(t)) ** 2 for t in set(toks))
        )
        for d, toks in docs_py.items()
    }
    expected = {}
    for qid, terms in queries_py.items():
        present = [t for t in set(terms) if t in df]
        qn = math.sqrt(sum(idf(t) ** 2 for t in present))
        scored = []
        for d, toks in docs_py.items():
            dot = sum(
                idf(t) * (toks.count(t) * idf(t))
                for t in present
                if t in toks
            )
            if dot > 0:
                scored.append((d, dot / (dnorm[d] * qn)))
        scored.sort(key=lambda x: (-x[1], x[0]))
        expected[qid] = scored[:5]

    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs_py.items()],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(qid, " ".join(t)) for qid, t in queries_py.items()],
        "query_id long, query_text string",
    )
    got = {}
    for r in tfidf_topk(docs, q, k=5).collect():
        got.setdefault(r["query_id"], []).append(r)
    assert set(got) == set(expected)
    for qid, rows in got.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["doc_id"] for r in rows] == [d for d, _ in expected[qid]]
        for r, (_, s) in zip(rows, expected[qid]):
            assert abs(r["score"] - s) <= 1e-6, (qid, r["doc_id"])


def test_rrf_fuse_known_answer_and_guards(spark):
    """RRF on hand-built rankings: a doc ranked #2 by BOTH retrievers
    must out-fuse docs ranked #1 by only one (1/62+1/62 > 1/61 + 0);
    docs present in one list still fuse; guards raise."""
    import pytest

    from connected_component_spark.operators.text import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 30, 2), (1, 20, 3)],
        "query_id long, doc_id long, rank long",
    )
    b = spark.createDataFrame(
        [(1, 40, 1), (1, 30, 2), (1, 10, 3)],
        "query_id long, doc_id long, rank long",
    )
    rows = {r["doc_id"]: r for r in rrf_fuse([a, b], k=4).collect()}
    # doc 30: 1/62 + 1/62 ≈ .032258; docs 10: 1/61+1/63 ≈ .032262 — 10
    # actually wins; verify the full expected ordering numerically
    def rrf(*ranks):
        from decimal import ROUND_HALF_UP, Decimal

        tot = sum(
            Decimal(repr(1.0 / (60 + r))).quantize(
                Decimal("1e-9"), ROUND_HALF_UP
            )
            for r in ranks
        )
        return float(Decimal(tot).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    assert rows[10]["rrf"] == rrf(1, 3)
    assert rows[30]["rrf"] == rrf(2, 2)
    assert rows[40]["rrf"] == rrf(1)
    assert rows[20]["rrf"] == rrf(3)
    order = sorted(rows.values(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in order] == sorted(
        rows, key=lambda d: (-rows[d]["rrf"], d)
    )
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="c must be"):
        rrf_fuse([a], c=-1)


def test_mmr_matches_pure_python_reference(spark):
    """Independent differential for MMR re-ranking: a from-scratch
    greedy loop (numpy cosines with the Decimal snap-round, λ·rel −
    (1−λ)·maxsim, doc_id tie-break) must match the distributed
    operator's picks, steps, and mmr values exactly."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    from connected_component_spark.operators.mmr import mmr_rerank

    def r6(x):
        d = Decimal(repr(float(x))).quantize(Decimal("1e-9"), ROUND_HALF_UP)
        return float(d.quantize(Decimal("1e-6"), ROUND_HALF_UP))

    rng = np.random.default_rng(31)
    vecs = {i: rng.standard_normal(8) for i in range(30)}
    lam = 0.7

    def cos(a, b):
        da = 0.0
        for x, y in zip(vecs[a], vecs[b]):
            da += float(x) * float(y)
        import math

        na = math.sqrt(sum(float(x) * float(x) for x in vecs[a]))
        nb = math.sqrt(sum(float(x) * float(x) for x in vecs[b]))
        return r6(da / (na * nb))

    # two queries, 8 candidates each, rel = cosine to the query vector
    cands = {q: [d for d in range(10, 18)] for q in (0, 1)}
    rel = {(q, d): cos(q, d) for q in cands for d in cands[q]}

    expected = []
    for q, ds in cands.items():
        sel = []
        rem = list(ds)
        for step in range(1, 5):
            if step == 1:
                scored = [(lam * rel[(q, d)], d) for d in rem]
            else:
                scored = [
                    (
                        lam * rel[(q, d)]
                        - (1.0 - lam) * max(cos(d, s) for s in sel),
                        d,
                    )
                    for d in rem
                ]
            scored.sort(key=lambda t: (-t[0], t[1]))
            mmr, d = scored[0]
            expected.append((q, d, mmr, step))
            sel.append(d)
            rem.remove(d)

    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    cdf = spark.createDataFrame(
        [(q, d, rel[(q, d)]) for q in cands for d in cands[q]],
        "query_id long, doc_id long, score double",
    )
    got = sorted(
        (r["query_id"], r["doc_id"], r["mmr"], r["step"])
        for r in mmr_rerank(cdf, emb, k=4, lam=lam).collect()
    )
    assert got == sorted(expected)


def test_mmr_guards_and_short_lists(spark):
    """k/λ guards raise; a query with fewer candidates than k emits
    what it has; candidates without vectors are dropped."""
    from connected_component_spark.operators.mmr import mmr_rerank

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    cand = spark.createDataFrame(
        [(9, 1, 0.9), (9, 2, 0.8), (9, 3, 0.7)],
        "query_id long, doc_id long, score double",
    )
    out = mmr_rerank(cand, emb, k=5, lam=0.5).collect()
    # doc 3 has no vector -> dropped; only 2 candidates emitted
    assert sorted((r["doc_id"], r["step"]) for r in out) == [(1, 1), (2, 2)]
    with pytest.raises(ValueError, match="k must be"):
        mmr_rerank(cand, emb, k=0)
    with pytest.raises(ValueError, match="lambda"):
        mmr_rerank(cand, emb, lam=1.5)


def test_retrieval_eval_report_known_answers(spark):
    """Hand-computed recall@k/MRR: retriever A hits truth at ranks
    2 and 3 for q1 (rr=1/2) and misses entirely for q2 (rr=0);
    retriever B hits rank 1 everywhere.  Guards raise on empty input."""
    from decimal import ROUND_HALF_UP, Decimal

    from connected_component_spark.operators.text import (
        retrieval_eval_report,
    )

    truth = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21)], "query_id long, doc_id long"
    )
    a = spark.createDataFrame(
        [(1, 99, 1), (1, 10, 2), (1, 11, 3), (2, 98, 1), (2, 97, 2)],
        "query_id long, doc_id long, rank long",
    )
    b = spark.createDataFrame(
        [(1, 10, 1), (2, 20, 1)], "query_id long, doc_id long, rank long"
    )
    rows = {
        r["retriever"]: r
        for r in retrieval_eval_report({"a": a, "b": b}, truth, k=3).collect()
    }
    # A: hits = 2 of 4 truth rows -> recall .5; rr = (1/2 + 0)/2 = .25
    assert rows["a"]["n_queries"] == 2
    assert rows["a"]["recall_at_k"] == 0.5
    assert rows["a"]["mrr"] == 0.25
    # B: 1 hit per query of 2 truth rows each -> recall .5; mrr 1.0
    assert rows["b"]["recall_at_k"] == 0.5 and rows["b"]["mrr"] == 1.0
    # rank > k rows are cut before evaluation
    c = spark.createDataFrame(
        [(1, 10, 4)], "query_id long, doc_id long, rank long"
    )
    rc = retrieval_eval_report({"c": c}, truth, k=3).collect()[0]
    assert rc["recall_at_k"] == 0.0 and rc["mrr"] == 0.0
    import pytest

    with pytest.raises(ValueError, match="at least one"):
        retrieval_eval_report({}, truth)
    # float discipline sanity: rr snap-round matches Decimal recipe
    d = Decimal(repr(1.0 / 3)).quantize(Decimal("1e-9"), ROUND_HALF_UP)
    assert float(d) == 0.333333333


def test_hashed_bow_embeddings_match_pure_python(spark):
    """r13 (verdict r12 #5): the feature-hashed bag-of-words
    projection must match an independent pure-Python construction of
    the same md5 bucket/sign family — bit-exact integer-valued
    doubles — and exclude token-less documents."""
    import hashlib

    from connected_component_spark.operators.embedgen import (
        hashed_bow_embeddings,
    )

    dim = 8
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat"),
        (3, "completely different words here"),
        (4, "   "),  # no tokens: excluded
        (5, "the the the"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: list(r["embedding"])
        for r in hashed_bow_embeddings(df, dim).collect()
    }

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    want = {}
    for doc_id, text in rows:
        toks = [t for t in text.split() if t]
        if not toks:
            continue
        vec = [0.0] * dim
        for t in toks:
            vec[h64(t) % dim] += 1.0 if h64("s#" + t) % 2 == 0 else -1.0
        want[doc_id] = vec
    assert got == want
    assert 4 not in got
    # deterministic across evaluations
    again = {
        r["doc_id"]: list(r["embedding"])
        for r in hashed_bow_embeddings(df, dim).collect()
    }
    assert again == got

    # guard
    import pytest

    with pytest.raises(ValueError, match="dim"):
        hashed_bow_embeddings(df, 1)
