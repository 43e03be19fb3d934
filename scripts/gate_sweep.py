"""Strict local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given sf_dir and
compares it against ``oracle_sql()`` via DuckDB with EXACT value
comparison (full-precision repr, columns sorted by name; rows sorted,
EXCEPT for queries whose oracle declares a top-level ORDER BY — those
compare row-order-sensitively so tie-break divergences under LIMIT
are caught) — unlike tests/oracle_utils.py, floats are NOT rounded,
so this catches last-ulp divergences the 9-sig-fig test comparator
hides (the r1 q01 sum_charge failure mode).

Usage:
    python scripts/gate_sweep.py [--sf /root/testdata/sf0.01] [names...]

Prints one line per query (PASS/FAIL/ERR + wall seconds) and a final
summary; exit code 1 on any failure.
"""

from __future__ import annotations

import argparse
import math
import sys
import time

sys.path.insert(0, "/root/repo")


def canon(rows, cols, keep_row_order=False):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return repr(v)
        if isinstance(v, (list, tuple)):
            return tuple(cell(x) for x in v)
        return v

    out = [tuple(cell(list(r)[i]) for i in order) for r in rows]
    return out if keep_row_order else sorted(out, key=repr)


# DuckDB types that the driver's dataframe-typed fetch materializes as
# float64 (pandas has no 128-bit int), silently turning integer values
# like 410 into 410.0 and failing the driver's value-hash even when the
# engines agree row-for-row (round-6 `pipeline_quality_funnel` failure
# mode: UNION ALL promoted uncast sum(INT) branches to HUGEINT).  The
# plain `fetchall()` path surfaces them as Python ints and masked the
# bug, so any oracle emitting one of these is a FAIL here regardless of
# values.
_DRIVER_UNSAFE_DUCK_TYPES = {"HUGEINT", "UHUGEINT"}


def _duck_unsafe_reason(t: str) -> str | None:
    """Why a DuckDB output type breaks the driver harness, or None.

    Two classes, both of which this gate must catch because canon()
    happily compares them while the driver cannot:
      * typing — HUGEINT class: dataframe fetch → float64 (r6).
      * shape  — ARRAY/LIST/STRUCT/MAP/UNION: the driver's pandas
        canonicalizer sort_values throws `unhashable type` before any
        value comparison (r7 `q_salted_hot_user_profile` /
        `emb_l2_normalize` failure mode).  Declared queries must emit
        atomic scalar columns only.
    """
    u = str(t).upper()
    if u in _DRIVER_UNSAFE_DUCK_TYPES:
        return "typing"
    # "[" catches both the LIST spelling (DOUBLE[]) and the fixed-size
    # ARRAY spelling (INTEGER[3]); no atomic DuckDB type contains one
    if "[" in u or u.startswith(("STRUCT", "MAP", "LIST", "UNION")):
        return "shape"
    return None


def driver_unsafe_cols(rel) -> list:
    """Columns of a DuckDB relation that diverge or crash under the
    driver's dataframe-typed fetch + pandas canonicalizer."""
    out = []
    for c, t in zip(rel.columns, rel.types):
        reason = _duck_unsafe_reason(t)
        if reason:
            out.append((c, str(t), reason))
    return out


def spark_unsafe_cols(df) -> list:
    """Spark output columns with non-atomic types — same shape class
    as the DuckDB side: the driver's pandas canonicalizer cannot
    hash/sort list/dict cells, so any declared query emitting one is
    a FAIL here regardless of values."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        (f.name, f.dataType.simpleString(), "shape")
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def has_top_level_order_by(sql: str) -> bool:
    """True when the query declares a result ordering — i.e. an ORDER
    BY outside any parentheses (window-clause/subquery ORDER BYs don't
    count).  Such queries are compared row-order-sensitively so a
    Spark/oracle tie-break divergence under LIMIT is caught."""
    depth, top = 0, []
    for ch in sql:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            top.append(ch)
    return "order by" in "".join(top).lower()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--oracle-types",
        action="store_true",
        help="Spark-free sweep: bind every oracle_sql() entry in DuckDB and "
        "flag output columns whose type the driver's dataframe fetch would "
        "materialize as float64 (HUGEINT class) or whose non-atomic shape "
        "(ARRAY/LIST/STRUCT/MAP) the driver's pandas canonicalizer cannot "
        "sort. Exit 1 on any flag.",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod

    if args.oracle_types:
        con = duckdb.connect()
        for t in [
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        ]:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")
        oracles = entrymod.oracle_sql()
        names = args.names or list(oracles)
        n_flag = 0
        for name in names:
            if name not in oracles:
                print(f"{name:32s} SKIP (no oracle)")
                continue
            try:
                unsafe = driver_unsafe_cols(con.sql(oracles[name]))
            except Exception as e:  # noqa: BLE001
                n_flag += 1
                print(f"{name:32s} ERR   {type(e).__name__}: {e}")
                continue
            if unsafe:
                n_flag += 1
                print(f"{name:32s} FLAG  {unsafe}")
        print(f"-- {len(names)} oracles, {n_flag} flagged")
        return 1 if n_flag else 0

    from connected_component_spark.session import get_spark

    spark = get_spark()
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(qs)

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    n_fail = 0
    t_all = time.time()
    for name in names:
        if name not in qs:
            print(f"{name:32s} SKIP (unknown)")
            continue
        t0 = time.time()
        try:
            df = qs[name](spark, args.sf)
            s_unsafe = spark_unsafe_cols(df)
            s_rows = [tuple(r) for r in df.collect()]
            s_cols = df.columns
            if name not in oracles:
                if s_unsafe:
                    n_fail += 1
                    print(
                        f"{name:32s} FAIL  {len(s_rows):6d} rows  "
                        f"{time.time()-t0:6.1f}s  driver-unsafe spark output: {s_unsafe}"
                    )
                    continue
                print(f"{name:32s} ROWS-ONLY  {len(s_rows):6d} rows  {time.time()-t0:6.1f}s")
                continue
            d = con.sql(oracles[name])
            d_cols = d.columns
            unsafe = driver_unsafe_cols(d)
            d_rows = d.fetchall()
            status, detail = "PASS", ""
            if s_unsafe:
                status, detail = (
                    "FAIL",
                    f"driver-unsafe spark output (canonicalizer cannot sort): {s_unsafe}",
                )
            elif unsafe:
                status, detail = (
                    "FAIL",
                    f"driver-unsafe oracle output: {unsafe}",
                )
            elif sorted(s_cols) != sorted(d_cols):
                status, detail = "FAIL", f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}"
            elif len(s_rows) != len(d_rows):
                status, detail = "FAIL", f"rows spark={len(s_rows)} duck={len(d_rows)}"
            else:
                ordered = has_top_level_order_by(oracles[name])
                sn = canon(s_rows, s_cols, keep_row_order=ordered)
                dn = canon(d_rows, d_cols, keep_row_order=ordered)
                if sn != dn:
                    diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:2]
                    status, detail = (
                        "FAIL",
                        f"values{' (row-order-sensitive)' if ordered else ''};"
                        f" first diffs: {diffs}",
                    )
            if status == "FAIL":
                n_fail += 1
            print(f"{name:32s} {status}  {len(s_rows):6d} rows  {time.time()-t0:6.1f}s  {detail}")
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"{name:32s} ERR   {time.time()-t0:6.1f}s  {type(e).__name__}: {e}")
    print(f"-- {len(names)} queries, {n_fail} failures, {time.time()-t_all:.1f}s total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
