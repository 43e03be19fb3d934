"""Driver-harness output-shape gates (r8).

Two classes of local-pass/driver-fail have shipped in two rounds:
typing (r6: HUGEINT → float64 under the driver's dataframe fetch) and
shape (r7: ARRAY output columns crash the driver's pandas
canonicalizer with `unhashable type: 'list'` before any value
comparison).  scripts/gate_sweep.py now flags both structurally;
these tests pin the detector and sweep every declared oracle so the
local gate stays strictly harder than the driver's.
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

_GATE = os.path.join(os.path.dirname(__file__), "..", "scripts", "gate_sweep.py")
_spec = importlib.util.spec_from_file_location("gate_sweep", _GATE)
gate_sweep = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(gate_sweep)

_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.mark.parametrize(
    ("duck_type", "reason"),
    [
        ("HUGEINT", "typing"),
        ("UHUGEINT", "typing"),
        ("DOUBLE[]", "shape"),
        ("VARCHAR[]", "shape"),
        ("INTEGER[3]", "shape"),  # fixed-size ARRAY spelling (review r8)
        ("STRUCT(a INTEGER)", "shape"),
        ("MAP(VARCHAR, INTEGER)", "shape"),
        ("BIGINT", None),
        ("DOUBLE", None),
        ("VARCHAR", None),
        ("DECIMAL(18,4)", None),
        ("TIMESTAMP", None),
    ],
)
def test_duck_unsafe_reason_classes(duck_type, reason):
    assert gate_sweep._duck_unsafe_reason(duck_type) == reason


def test_spark_unsafe_cols_flags_non_atomic(spark):
    df = spark.sql(
        "SELECT 1 AS id, array(1, 2) AS xs, named_struct('a', 1) AS st, "
        "map('k', 1) AS m, 'ok' AS s"
    )
    flagged = {c for c, _t, _r in gate_sweep.spark_unsafe_cols(df)}
    assert flagged == {"xs", "st", "m"}
    clean = spark.sql("SELECT 1 AS id, 2.0 AS v, 'x' AS s")
    assert gate_sweep.spark_unsafe_cols(clean) == []


def test_every_declared_oracle_is_driver_safe(sf_dir):
    """Bind every oracle_sql() entry in DuckDB (no execution — types
    come from the bound plan) and assert zero driver-unsafe output
    columns: no HUGEINT-class types, no ARRAY/LIST/STRUCT/MAP shapes.
    This is the Spark-free half of `gate_sweep --oracle-types`."""
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in _TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = {}
    for name, sql in entrymod.oracle_sql().items():
        unsafe = gate_sweep.driver_unsafe_cols(con.sql(sql))
        if unsafe:
            bad[name] = unsafe
    assert not bad, f"driver-unsafe oracle outputs: {bad}"
