"""Capture .explain("formatted") output for declared queries.

Usage:
    python scripts/capture_plans.py --out plans/r14 --suffix _before [names...]

With no names, captures every declared query.  Each query's formatted
physical plan (AQE-initial) is written to ``<out>/<name><suffix>.txt``.
The plan is captured WITHOUT executing the query (explain only), so
this is cheap enough to run for the whole registry.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r14")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from connected_component_spark.session import get_spark

    spark = get_spark(app_name="cc-spark-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    names = args.names or sorted(qs)
    os.makedirs(args.out, exist_ok=True)

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not a declared query", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, args.sf)
            text = df._jdf.queryExecution().explainString(mode)
        except Exception as ex:  # noqa: BLE001
            text = f"ERROR building plan: {type(ex).__name__}: {ex}"
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)")


if __name__ == "__main__":
    main()
