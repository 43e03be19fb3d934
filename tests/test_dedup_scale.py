"""Dedup-path scale evidence: on a corpus 10× the sf0.1 fixture with
PLANTED near-duplicates, the minhash-LSH banding must generate a
near-linear candidate set (the property that makes the path viable at
100 TB — a quadratic candidate set is the failure mode banding
exists to prevent) while still recalling the planted pairs.

The corpus is generated cluster-side (mapInPandas over spark.range,
per-doc seeded RNG — the generator-as-oracle pattern of
reference CliquesGenerator.scala:47-81 applied to documents): doc ids
``i ≡ 1 (mod 10)`` are a one-word perturbation of doc ``i-1``, so the
expected near-dup pair set is known by construction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from connected_component_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
)

def _planted_docs(spark, n_docs: int):
    # fully self-contained closure: executors cannot import the test
    # module, so the generator must not reference module globals
    def gen(batches):
        import random as _random

        import pandas as pd

        vocab = [f"w{i:03d}" for i in range(500)]
        doc_words = 40

        def words_for(doc_id):
            rng = _random.Random(7919 * doc_id + 13)
            return [rng.choice(vocab) for _ in range(doc_words)]

        for pdf in batches:
            ids, texts = [], []
            for i in pdf["id"]:
                i = int(i)
                if i % 10 == 1:
                    words = list(words_for(i - 1))
                    pos = _random.Random(104729 * i).randrange(doc_words)
                    words[pos] = "zz_perturbed"
                else:
                    words = words_for(i)
                ids.append(i)
                texts.append(" ".join(words))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return spark.range(n_docs).mapInPandas(gen, schema="doc_id long, text string")


def _wide_vocab_docs(spark, n_docs: int, doc_chars: int = 60):
    """Docs of random [a-z0-9] chars: distinct char-3-gram vocabulary
    grows toward 36^3 = 46,656 >> _BITMAP_MAX_VOCAB, so
    ``strategy="auto"`` must route to the prefix-filter branch.  Doc
    ids ``i ≡ 1 (mod 10)`` perturb only the last 3 chars of doc
    ``i-1`` (≤ 5 changed trigrams of ~58 → Jaccard ≳ 0.84), so the
    planted near-dup pairs are known by construction."""

    def gen(batches):
        import random as _random

        import pandas as pd

        alpha = "abcdefghijklmnopqrstuvwxyz0123456789"

        def chars_for(doc_id):
            rng = _random.Random(6007 * doc_id + 3)
            return [rng.choice(alpha) for _ in range(doc_chars)]

        for pdf in batches:
            ids, texts = [], []
            for i in pdf["id"]:
                i = int(i)
                if i % 10 == 1:
                    cs = chars_for(i - 1)
                    cs[-3:] = ["z", "z", "9"]
                else:
                    cs = chars_for(i)
                ids.append(i)
                texts.append("".join(cs))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return spark.range(n_docs).mapInPandas(gen, schema="doc_id long, text string")


def test_ngram_prefix_strategy_equals_bitmap(spark, sf_dir):
    """r4 verdict #1: the prefix-filter branch (the advertised
    large-vocabulary 100 TB path, operators/dedup.py:_ngram_jaccard_prefix)
    must produce the EXACT same pair set and Jaccard values as the
    bitmap-GEMM branch — both are exact algorithms, so forced-strategy
    runs on the same corpus are interchangeable."""
    from connected_component_spark.operators.dedup import ngram_jaccard_pairs
    from connected_component_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    via_prefix = sorted(
        map(tuple, ngram_jaccard_pairs(docs, 0.7, strategy="prefix").collect())
    )
    via_bitmap = sorted(
        map(tuple, ngram_jaccard_pairs(docs, 0.7, strategy="bitmap").collect())
    )
    assert via_prefix == via_bitmap
    assert len(via_prefix) > 0  # the fixture contains near-dup docs


def test_ngram_auto_routes_to_prefix_above_vocab_cap(spark):
    """A corpus whose distinct-trigram vocabulary exceeds
    _BITMAP_MAX_VOCAB must take the prefix branch under
    ``strategy="auto"`` and still find exactly the planted near-dup
    pairs (prefix filtering is lossless: any pair with Jaccard ≥ τ
    shares a gram inside the rarest-first prefixes)."""
    from connected_component_spark.operators.dedup import (
        _BITMAP_MAX_VOCAB,
        char_ngrams,
        ngram_jaccard_pairs,
    )

    n_docs = 2_000
    docs = _wide_vocab_docs(spark, n_docs).localCheckpoint(eager=True)
    vocab = (
        docs.select(F.explode(char_ngrams(F.col("text"), 3)).alias("g"))
        .agg(F.countDistinct("g"))
        .first()[0]
    )
    assert vocab > _BITMAP_MAX_VOCAB, f"fixture vocab {vocab} too small"

    pairs = {
        (r["a"], r["b"])
        for r in ngram_jaccard_pairs(docs, 0.7, strategy="auto").collect()
    }
    planted = {(i - 1, i) for i in range(n_docs) if i % 10 == 1}
    # exact join: every planted pair (Jaccard ≳ 0.84) is found, and
    # nothing outside the planted set clears τ=0.7 on random strings
    assert planted <= pairs
    assert pairs == planted, f"{len(pairs - planted)} unexpected pairs"


def test_lsh_candidates_linear_with_planted_dups(spark):
    n_docs = 20_000  # 10x the sf0.1 documents table
    docs = _planted_docs(spark, n_docs).localCheckpoint(eager=True)
    sigs = minhash_signatures(docs, num_hashes=16, shingle_k=3)
    cand = lsh_candidate_pairs(sigs, bands=4, rows_per_band=4)
    cand_rows = cand.count()

    # near-linear candidate set: a tiny fraction of the n^2/2 cross
    # product (the quadratic bound is ~2e8 pairs here)
    assert cand_rows < 5 * n_docs, f"{cand_rows} candidates is superlinear"

    # recall of the planted pairs: a 1-of-40-word perturbation keeps
    # shingle Jaccard ~0.85, so 4x4 banding recalls the large majority
    planted = n_docs // 10
    hits = (
        cand.where(
            (F.col("b") == F.col("a") + 1) & (F.col("b") % 10 == 1)
        ).count()
    )
    assert hits >= 0.8 * planted, f"recall {hits}/{planted}"


def test_wordgram_auto_routes_to_prefix_and_matches_bitmap(spark, sf_dir):
    """unit="word" (r5 verdict #4): word-shingle vocabulary on the
    real documents fixture exceeds the bitmap cap, so strategy="auto"
    must route to the prefix branch NATURALLY (its intended regime) —
    and since both strategies are exact, the forced-bitmap run over
    the same word shingles must agree pair-for-pair."""
    from connected_component_spark.operators.dedup import (
        _BITMAP_MAX_VOCAB,
        ngram_jaccard_pairs,
        word_shingles,
    )
    from connected_component_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    vocab = (
        docs.select(F.explode(word_shingles(F.col("text"), 3)).alias("g"))
        .agg(F.countDistinct("g"))
        .first()[0]
    )
    assert vocab > _BITMAP_MAX_VOCAB, f"fixture word vocab {vocab} too small"

    via_auto = sorted(
        map(
            tuple,
            ngram_jaccard_pairs(docs, 0.7, strategy="auto", unit="word").collect(),
        )
    )
    via_bitmap = sorted(
        map(
            tuple,
            ngram_jaccard_pairs(
                docs, 0.7, strategy="bitmap", unit="word"
            ).collect(),
        )
    )
    assert via_auto == via_bitmap
    assert len(via_auto) > 0  # the fixture contains near-dup docs


def test_ngram_rejects_unknown_unit(spark, sf_dir):
    import pytest

    from connected_component_spark.operators.dedup import ngram_jaccard_pairs
    from connected_component_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="unit"):
        ngram_jaccard_pairs(docs, 0.7, unit="sentence")


def test_incremental_dedup_scales_with_batch_not_corpus(spark):
    """The incremental (ingestion) path at 10x-fixture corpus scale:
    a 20k-doc corpus vs a 500-doc batch where every 5th batch doc is
    a one-word perturbation of a corpus doc.  The cross candidate set
    must scale with the BATCH (never the corpus pair space), the
    planted corpus dups must be recalled, and fresh docs must come
    out novel."""
    from connected_component_spark.operators.dedup import incremental_dedup

    n_corpus, n_batch = 20_000, 500
    corpus = (
        _planted_docs(spark, n_corpus)
        .where(F.col("doc_id") % 10 != 1)  # pre-deduped corpus
        .localCheckpoint(eager=True)
    )

    def gen_batch(batches):
        import random as _random

        import pandas as pd

        vocab = [f"w{i:03d}" for i in range(500)]

        def words_for(doc_id):
            rng = _random.Random(7919 * doc_id + 13)
            return [rng.choice(vocab) for _ in range(40)]

        for pdf in batches:
            ids, texts = [], []
            for i in pdf["id"]:
                i = int(i)
                doc_id = 1_000_000 + i
                if i % 5 == 0:
                    # perturb corpus doc 2*i (never ≡1 mod 10 → present)
                    words = list(words_for(2 * i))
                    words[3] = "qq_batchdup"
                else:
                    rng = _random.Random(424243 * i + 7)
                    words = [rng.choice(vocab) for _ in range(40)]
                ids.append(doc_id)
                texts.append(" ".join(words))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    batch = (
        spark.range(n_batch)
        .mapInPandas(gen_batch, schema="doc_id long, text string")
        .localCheckpoint(eager=True)
    )
    out = incremental_dedup(corpus, batch, threshold=0.5).localCheckpoint(
        eager=True
    )
    assert out.count() == n_batch
    dup_rows = out.where(F.col("status") == "dup_of_corpus")
    planted = n_batch // 5
    recalled = dup_rows.where(
        F.col("canonical_doc_id") == 2 * (F.col("doc_id") - 1_000_000)
    ).count()
    assert recalled >= 0.8 * planted, f"recall {recalled}/{planted}"
    # fresh batch docs (seeded from a disjoint RNG stream) are novel
    novel = out.where(F.col("status") == "novel").count()
    assert novel >= 0.9 * (n_batch - planted)


def test_incremental_candidates_flat_as_corpus_doubles(spark):
    """r6 brief #6: the 'corpus never re-paired' claim as a MEASURED
    curve, not just a plan property.  The SAME batch is classified
    against a corpus and against that corpus doubled; the candidate
    set (corpus×batch band hits + batch×batch self-join) must stay
    essentially flat — candidates ∝ batch, not corpus.  Doubling the
    corpus can only add chance band collisions, so a small tolerance
    is allowed; a corpus-proportional candidate set (~2×) fails."""
    from connected_component_spark.operators.dedup import (
        incremental_candidate_pairs,
    )

    n_small, n_batch = 4_000, 200
    corpus_small = (
        _planted_docs(spark, n_small)
        .where(F.col("doc_id") % 10 != 1)
        .localCheckpoint(eager=True)
    )
    corpus_big = (
        _planted_docs(spark, 2 * n_small)
        .where(F.col("doc_id") % 10 != 1)
        .localCheckpoint(eager=True)
    )

    def gen_batch(batches):
        import random as _random

        import pandas as pd

        vocab = [f"w{i:03d}" for i in range(500)]

        def words_for(doc_id):
            rng = _random.Random(7919 * doc_id + 13)
            return [rng.choice(vocab) for _ in range(40)]

        for pdf in batches:
            ids, texts = [], []
            for i in pdf["id"]:
                i = int(i)
                doc_id = 1_000_000 + i
                if i % 5 == 0:
                    # perturb corpus doc 2*i — present in BOTH corpora
                    # (2*i < 4000 for i < 200 and never ≡1 mod 10)
                    words = list(words_for(2 * i))
                    words[3] = "qq_batchdup"
                else:
                    rng = _random.Random(424243 * i + 7)
                    words = [rng.choice(vocab) for _ in range(40)]
                ids.append(doc_id)
                texts.append(" ".join(words))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    batch = (
        spark.range(n_batch)
        .mapInPandas(gen_batch, schema="doc_id long, text string")
        .localCheckpoint(eager=True)
    )

    n_cand_small = incremental_candidate_pairs(corpus_small, batch).count()
    n_cand_big = incremental_candidate_pairs(corpus_big, batch).count()

    # the planted corpus dups guarantee a non-trivial candidate set
    # (LSH recall at 16 hashes / 4 bands is ~80-90% for a one-word
    # perturbation, same expectation as the recall test above)
    assert n_cand_small >= 0.6 * (n_batch // 5)
    # flat curve: doubling the corpus must NOT double the candidates —
    # allow 1.5× for chance band collisions from the new corpus half
    assert n_cand_big <= 1.5 * n_cand_small, (n_cand_small, n_cand_big)
    # and the candidate space is nowhere near corpus-sized
    assert n_cand_big < 20 * n_batch, n_cand_big


def test_hot_bucket_valve_chains_oversized_buckets(spark):
    """The max_bucket_size valve: a mega-bucket of m near-identical
    docs contributes m-1 chain pairs instead of m(m-1)/2, small
    buckets keep exact all-pairs, and CC clustering over the chained
    candidates still recovers the full dup cluster."""
    from connected_component_spark.graph.cc import components_with_isolates
    from connected_component_spark.operators.dedup import (
        banded_buckets,
        banded_pairs,
        jaccard_pairs,
        minhash_signatures,
    )

    m = 200
    # one mega-cluster of identical docs + a pair of distinct near-dups
    rows = [(i, "identical boilerplate page content repeated everywhere") for i in range(m)]
    rows += [(1000, "a genuinely different document about oceans and tides"),
             (1001, "a genuinely different document about oceans and tides !!")]
    docs = spark.createDataFrame(rows, "doc_id long, text string").localCheckpoint()
    banded = banded_buckets(minhash_signatures(docs, 16, 3), 4, 4).localCheckpoint()

    exact = banded_pairs(banded)
    capped = banded_pairs(banded, max_bucket_size=16)
    n_exact, n_capped = exact.count(), capped.count()
    assert n_exact >= m * (m - 1) // 2          # quadratic without the valve
    assert n_capped <= 4 * m + 10, n_capped     # ~linear with it (≤1 chain/band)
    # the small bucket (the ocean pair) still produces its exact pair
    assert capped.where("a = 1000 and b = 1001").count() == 1

    # connectivity: CC over verified chain pairs recovers ONE cluster
    verified = jaccard_pairs(docs, capped, 3).where("jaccard >= 0.5")
    comp = components_with_isolates(
        verified.selectExpr("a as src", "b as dst"), docs, "doc_id"
    )
    clusters = comp.groupBy("component").count().collect()
    sizes = sorted(r["count"] for r in clusters)
    assert sizes == [2, m]  # mega-cluster intact + the ocean pair

    import pytest

    with pytest.raises(ValueError, match="max_bucket_size"):
        banded_pairs(banded, max_bucket_size=1)


def test_declared_capped_band_pairs_exercises_chain_branch(spark, sf_dir):
    """The r8 declared query (dedup_capped_band_pairs) must actually
    route its planted boilerplate mega-bucket through the chain
    branch: at sf0.001 the 100 template docs (doc_id % 5 == 0) yield
    exactly 99 consecutive-by-5 chain pairs at jaccard 1.0 — linear,
    not the 4,950 a crossed bucket would emit — while organic
    small-bucket pairs keep exact all-pairs semantics."""
    from connected_component_spark.queries.llmops import (
        dedup_capped_band_pairs,
    )

    rows = dedup_capped_band_pairs(spark, sf_dir).collect()
    chain = [
        r for r in rows
        if r.a % 5 == 0 and r.b % 5 == 0 and r.jaccard == 1.0
    ]
    assert len(chain) == 99, len(chain)
    assert all(r.b - r.a == 5 for r in chain)
    # nowhere near the quadratic count of an uncapped mega-bucket
    assert len(rows) < 1000, len(rows)


def test_winnow_df_cap_keeps_pairs_linear_at_scale(spark):
    """r9 scale regime for the winnowing posting-list join: 20k docs
    all sharing one boilerplate passage would emit ~2·10⁸ pairs from
    the shared fingerprints — the df-cap drops corpus-wide
    fingerprints BEFORE pairing, so only the 50 planted unique-passage
    pairs survive, and candidate volume is O(planted), not O(n²)."""
    from pyspark.sql import functions as F

    from connected_component_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_pairs,
    )

    n = 20_000
    boiler = " ".join(f"common{i}" for i in range(10))
    base = spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("head"), F.col("id").cast("string"),
            F.lit(" uniq"), (F.col("id") * 7919).cast("string"),
            F.lit(" mid"), (F.col("id") * 104729).cast("string"),
            F.lit(" " + boiler),
        ).alias("text"),
    )
    # 50 planted pairs: docs (j, j+100000) share a j-specific passage
    planted = spark.range(0, 50).select(
        F.explode(
            F.array(F.col("id"), F.col("id") + F.lit(100_000))
        ).alias("doc_id"),
        F.concat(
            F.lit("pref"), F.col("id").cast("string"),
            F.lit(" shared passage alpha"), F.col("id").cast("string"),
            F.lit(" beta"), F.col("id").cast("string"),
            F.lit(" gamma"), F.col("id").cast("string"),
            F.lit(" delta epsilon zeta eta"),
        ).alias("text"),
    )
    # planted rows REPLACE their base ids (doc_id < 50 dropped from base)
    docs = base.where(F.col("doc_id") >= 50).unionByName(planted).localCheckpoint()
    pairs = winnow_pairs(docs, k=4, window=4, min_shared=1, max_df=64)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert got == {(j, j + 100_000) for j in range(50)}
    # the boilerplate fingerprints really were corpus-wide (df ≈ 20k):
    # prove the cap did the work, not luck — at least one fingerprint
    # exceeds the cap by orders of magnitude
    fp = winnow_fingerprints(docs, k=4, window=4)
    max_df = (
        fp.groupBy("fp").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_df > 10_000
