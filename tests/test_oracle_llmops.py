"""LLM-ops + graph queries vs their DuckDB oracles (driver t2 replica)."""

from __future__ import annotations

import pytest

from connected_component_spark.queries import graph, llmops, streamq
from tests.oracle_utils import compare, duck_connection

ALL = {**llmops.QUERIES, **graph.QUERIES, **streamq.QUERIES}
ORACLES = {**llmops.ORACLES, **graph.ORACLES, **streamq.ORACLES}


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ALL))
def test_llmops_oracle(spark, sf_dir, con, name):
    df = ALL[name](spark, sf_dir)
    ok, msg = compare(df, con, ORACLES[name])
    assert ok, f"{name}: {msg}"


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql).issubset(set(qs))
    assert len(qs) >= 30


def test_entry_staleness_rotation():
    """Registry order = verification priority (r4 verdict #4, r13
    verdict #1): queries with no green driver row anywhere come first,
    then a strict interleave of changed-this-round and stalest-first
    stable queries — so under the driver's 50-row budget each round's
    rows cover the changed set AND the stale tail."""
    import __spark_entry__ as e

    qs = list(e.queries())
    green = e._green_rounds()
    idx = {q: i for i, q in enumerate(qs)}
    never = [q for q in qs if green.get(q, 0) == 0]
    changed = [q for q in qs if q in e._CHANGED_THIS_ROUND and green.get(q, 0) > 0]
    rest = [q for q in qs if green.get(q, 0) > 0 and q not in e._CHANGED_THIS_ROUND]
    for n in never:
        assert all(idx[n] < idx[c] for c in changed)
        assert all(idx[n] < idx[r] for r in rest)
    # each bucket internally stalest-first
    for bucket in (changed, rest):
        lasts = [green[q] for q in sorted(bucket, key=idx.get)]
        assert lasts == sorted(lasts), "bucket not ordered stalest-first"
    # interleave bound: the i-th stalest stable query sits within
    # never + (i+1)*(interleave+1) positions, so a wide changed set
    # can never push the stale tail out of a fixed window.
    step = e._CHANGED_INTERLEAVE + 1
    for i, q in enumerate(sorted(rest, key=idx.get)):
        assert idx[q] <= len(never) + (i + 1) * step - 1, (
            f"stable query {q} starved to position {idx[q]}"
        )
    # the artifacts the rotation reads exist and parse
    assert green, "no CORRECTNESS_r*.json artifacts found"


def test_priority_order_interleave_unit():
    """r13 verdict #1 'done' criterion: a changed set of 60 plus two
    four-round-stale queries must land the stale pair inside the
    driver's 50-row window."""
    import __spark_entry__ as e

    changed = [f"chg_{i:02d}" for i in range(60)]
    stale = ["stale_a", "stale_b"]
    fresh = [f"ok_{i:02d}" for i in range(30)]
    names = changed + stale + fresh
    verified = {n: 12 for n in changed}
    verified.update({n: 9 for n in stale})
    verified.update({n: 13 for n in fresh})
    order = e._priority_order(names, verified, frozenset(changed))
    assert sorted(order) == sorted(names)
    window = order[:50]
    assert set(stale) <= set(window), f"stale pair starved: {window}"
    # stalest-first inside the stable bucket: both r9 rows precede
    # every r13 row.
    pos = {n: i for i, n in enumerate(order)}
    assert max(pos[s] for s in stale) < min(pos[f] for f in fresh)
    # never-verified still leads everything
    order2 = e._priority_order(
        ["new_q"] + names, verified, frozenset(changed)
    )
    assert order2[0] == "new_q"


def test_staleness_window_bounded():
    """Freshness guarantee of the rotation, regression-proofed (r5
    verdict #7): every ONCE-VERIFIED query's latest green driver row
    is at most 3 rounds old — OR, when the committed artifacts lag a
    round behind (the driver writes CORRECTNESS_r{N} only after the
    build round closes), the stale query must be SCHEDULED inside the
    upcoming driver window, i.e. the rotation has already repaired the
    starvation and the next artifact clears it.  This checks the
    CAUSE (is the stale tail scheduled?) instead of the lagged
    symptom: the r13 starvation — stale queries displaced OUT of the
    window by a wide changed set — still fails here, one round
    EARLIER than the artifact-only check caught it.  (Queries added
    after the last committed artifact have no row yet — they sit at
    the FRONT of the rotation and earn one next round, so they are
    exempt here.)"""
    import glob
    import os
    import re

    import __spark_entry__ as e

    root = os.path.dirname(os.path.abspath(e.__file__))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    assert rounds, "no CORRECTNESS_r*.json artifacts found"
    current = max(rounds)
    green = e._green_rounds()
    # the driver's per-round verification budget (~50 rows/round,
    # BASELINE.md) — the window the rotation must land stale rows in
    window = set(list(e.queries())[:50])
    stale = {
        q: last
        for q, last in green.items()
        if current - last > 3 and q not in window
    }
    assert not stale, (
        f"queries with last green driver row >3 rounds old AND not "
        f"scheduled in the upcoming 50-row driver window "
        f"(current={current}): {stale}"
    )


def test_pii_oracle_sql_escapes_single_quotes(monkeypatch):
    """advice r9: a PII pattern/replacement containing a single quote
    must be doubled into the DuckDB SQL literal — previously it broke
    (or silently altered) the oracle while the Spark side kept
    working.  Runs the generated SQL end-to-end on a quote-bearing
    pattern to prove it stays parseable AND correct."""
    import duckdb

    import connected_component_spark.operators.text as tx
    from connected_component_spark.queries.llmops import _pii_redaction_sql

    monkeypatch.setattr(
        tx, "PII_PATTERNS", (("apos", r"can't[0-9]{2}", "<CUT'>"),)
    )
    sql = _pii_redaction_sql()
    assert "can''t" in sql and "<CUT''>" in sql
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        "SELECT CAST(5 AS BIGINT) AS doc_id, 'x can''t42 y' AS text"
    )
    row = con.sql(sql).fetchall()[0]
    cols = [d[0] for d in con.sql(sql).description]
    got = dict(zip(cols, row))
    # planted length straight from the same engine, so the scrub
    # assertion is exact: "can't42" (7 chars) -> "<CUT'>" (6 chars)
    planted_len = con.sql(
        "SELECT length(text || ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@mail.example.com from 10.0.' || CAST(doc_id % 200 AS VARCHAR)"
        " || '.' || CAST((doc_id * 7) % 250 AS VARCHAR)"
        " || ' tel 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))"
        " FROM documents"
    ).fetchone()[0]
    con.close()
    assert got["n_apos"] == 1
    assert got["n_chars_after"] == planted_len - 1
