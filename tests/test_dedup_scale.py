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
