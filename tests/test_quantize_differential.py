"""Pure-Python differentials for the quantization chain (verdict r11
#7): PQ encode, ADC top-k, the trained-IVF coarse assignment, and the
IVFPQ composition are each re-implemented from scratch (seeded numpy
data, Python-loop left folds replicating the engine's documented
fold order) and must match the distributed operators — independence
the shared-reading DuckDB oracles cannot provide, the same pattern as
the r11 BM25/TextRank/kNN differentials.

Float discipline: every engine-side distance is a LEFT FOLD of
correctly-rounded IEEE doubles in array order (functions/vectors.py),
so the Python references fold in plain loops — identical doubles, not
approximations; adc comparisons are at 0 or 1e-9, never loose.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pytest
from pyspark.sql import functions as F

from connected_component_spark.operators.quantize import (
    ivfpq_topk,
    pq_encode,
    pq_topk,
)
from connected_component_spark.operators.similarity import (
    ivf_cell_assignments,
)

_M, _K, _D0 = 3, 5, 4
_DIM = _M * _D0


def _roundd_py(x: float, n: int) -> float:
    """queries/parity.roundd replicated: double -> decimal(38,9)
    (HALF_UP at 9, via the shortest decimal repr like BigDecimal
    .valueOf) -> round HALF_UP at n -> double."""
    d = Decimal(repr(float(x))).quantize(Decimal(1).scaleb(-9), ROUND_HALF_UP)
    return float(d.quantize(Decimal(1).scaleb(-n), ROUND_HALF_UP))


def _fold_sq_dist(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += (float(x) - float(y)) * (float(x) - float(y))
    return acc


def _books(rng):
    """Seeded hand-built codebooks — m subspaces x k centroids of
    width d0, cids deliberately non-contiguous to exercise the
    id-as-code contract."""
    return [
        (
            s,
            [
                (10 * s + j, [float(v) for v in rng.standard_normal(_D0)])
                for j in range(_K)
            ],
        )
        for s in range(_M)
    ]


def _encode_py(vec, books):
    codes = []
    for s, cents in books:
        sub = [float(x) for x in vec[s * _D0 : (s + 1) * _D0]]
        best = min((_fold_sq_dist(sub, cv), cid) for cid, cv in cents)
        codes.append(best[1])
    return codes


@pytest.fixture(scope="module")
def qdata(spark):
    rng = np.random.default_rng(23)
    books = _books(rng)
    vecs = {i: [float(v) for v in rng.standard_normal(_DIM)] for i in range(40)}
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    return books, vecs, emb


def test_pq_encode_matches_pure_python(spark, qdata):
    books, vecs, emb = qdata
    got = {
        r["vec_id"]: [r[f"code_{s}"] for s in range(_M)]
        for r in pq_encode(emb, books).collect()
    }
    assert got == {i: _encode_py(v, books) for i, v in vecs.items()}


def test_pq_adc_topk_matches_pure_python(spark, qdata):
    books, vecs, emb = qdata
    queries = emb.where(F.col("vec_id") % 10 == 0)
    got: dict = {}
    for r in pq_topk(queries, emb, books, k=5).collect():
        got.setdefault(r["query_id"], []).append(r)
    cents = {s: dict(cs) for s, cs in books}
    codes_py = {i: _encode_py(v, books) for i, v in vecs.items()}
    for qid in [i for i in vecs if i % 10 == 0]:
        qv = vecs[qid]
        scored = []
        for nid, codes in codes_py.items():
            if nid == qid:
                continue
            # fixed subspace order: ((d0+d1)+d2) — never a commutative
            # reduction, matching _adc_rank's fold
            adc = 0.0
            for s in range(_M):
                sub = qv[s * _D0 : (s + 1) * _D0]
                adc = adc + _fold_sq_dist(sub, cents[s][codes[s]])
            scored.append((adc, nid))
        scored.sort()
        rows = sorted(got[qid], key=lambda r: r["rank"])
        assert [r["neighbor_id"] for r in rows] == [n for _, n in scored[:5]]
        for r, (adc, _) in zip(rows, scored[:5]):
            assert r["adc"] == pytest.approx(adc, abs=1e-9)


def test_trained_ivf_assignment_matches_pure_python(spark, qdata):
    """The coarse-quantizer step with a LEARNED codebook: rounded-at-6
    cosine argmax with centroid-id tie-break, nprobe widening — the
    assignment both the batch and incremental IVF indexes store by."""
    books, vecs, emb = qdata
    # any (id, vec) table works as a codebook; reuse subspace-0 cids
    # with full-width seeded vectors as "trained" centroids
    rng = np.random.default_rng(5)
    cents = {
        100 + j: [float(v) for v in rng.standard_normal(_DIM)]
        for j in range(6)
    }
    cdf = spark.createDataFrame(
        [(cid, cv) for cid, cv in cents.items()],
        "vec_id long, embedding array<double>",
    )

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    def norm(a):
        acc = 0.0
        for x in a:
            acc += float(x) * float(x)
        import math

        return math.sqrt(acc)

    for nprobe in (1, 2):
        got: dict = {}
        for r in ivf_cell_assignments(emb, cdf, nprobe=nprobe).collect():
            got.setdefault(r["vec_id"], []).append(
                (r["probe_rank"], r["cell"])
            )
        for vid, v in vecs.items():
            ranked = sorted(
                (
                    (-_roundd_py(dot(v, cv) / (norm(v) * norm(cv)), 6), cid)
                    for cid, cv in cents.items()
                )
            )
            want = [(i + 1, cid) for i, (_, cid) in enumerate(ranked[:nprobe])]
            assert sorted(got[vid]) == want, (vid, nprobe)


def test_ivfpq_composition_matches_pure_python(spark, qdata):
    """End-to-end IVFPQ: Python reference composes the coarse
    assignment, probe, cell-filtered candidates, PQ codes, and ADC
    ranking from scratch; the operator must match ranks and adc."""
    books, vecs, emb = qdata
    rng = np.random.default_rng(9)
    cents = {
        200 + j: [float(v) for v in rng.standard_normal(_DIM)]
        for j in range(4)
    }
    cdf = spark.createDataFrame(
        [(cid, cv) for cid, cv in cents.items()],
        "vec_id long, embedding array<double>",
    )
    queries = emb.where(F.col("vec_id") % 10 == 3)
    got: dict = {}
    for r in ivfpq_topk(queries, emb, books, k=4, centroids=cdf, nprobe=2).collect():
        got.setdefault(r["query_id"], []).append(r)

    import math

    def cos6(a, b):
        da = 0.0
        for x, y in zip(a, b):
            da += float(x) * float(y)
        na = 0.0
        for x in a:
            na += float(x) * float(x)
        nb = 0.0
        for y in b:
            nb += float(y) * float(y)
        return _roundd_py(da / (math.sqrt(na) * math.sqrt(nb)), 6)

    def cells_of(v, nprobe):
        ranked = sorted(((-cos6(v, cv), cid) for cid, cv in cents.items()))
        return [cid for _, cid in ranked[:nprobe]]

    storage = {i: cells_of(v, 1)[0] for i, v in vecs.items()}
    codes_py = {i: _encode_py(v, books) for i, v in vecs.items()}
    cbooks = {s: dict(cs) for s, cs in books}
    for qid in [i for i in vecs if i % 10 == 3]:
        qv = vecs[qid]
        probed = set(cells_of(qv, 2))
        scored = []
        for nid, v in vecs.items():
            if nid == qid or storage[nid] not in probed:
                continue
            adc = 0.0
            for s in range(_M):
                adc = adc + _fold_sq_dist(
                    qv[s * _D0 : (s + 1) * _D0], cbooks[s][codes_py[nid][s]]
                )
            scored.append((adc, nid))
        scored.sort()
        rows = sorted(got.get(qid, []), key=lambda r: r["rank"])
        assert [r["neighbor_id"] for r in rows] == [
            n for _, n in scored[:4]
        ], qid
        for r, (adc, _) in zip(rows, scored[:4]):
            assert r["adc"] == pytest.approx(adc, abs=1e-9)
