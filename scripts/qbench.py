"""Per-query micro-bench: warmed noop-sink draws for named queries.

Usage:
    python scripts/qbench.py [--sf DIR] [--draws 3] name [name...]

Prints per-draw wall seconds and the median per query.  Uses the same
session construction and noop-sink methodology as bench.py, so the
numbers are comparable to a bench draw, but the warmup is a single
throwaway draw of each requested query (JIT/file-index warm) instead
of the full-suite warmup.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--draws", type=int, default=3)
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from connected_component_spark.session import get_spark

    spark = get_spark(app_name="cc-spark-qbench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out: dict[str, dict] = {}
    for name in args.names:
        if name not in qs:
            print(f"SKIP {name}: not declared", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"qbench:{name}")
        if not args.no_warm:
            try:
                qs[name](spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as ex:  # noqa: BLE001
                print(f"ERR {name} (warm): {type(ex).__name__}: {ex}")
                continue
        walls = []
        for _ in range(args.draws):
            t0 = time.perf_counter()
            qs[name](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "draws": walls,
            "median": round(statistics.median(walls), 3),
        }
        print(f"{name}: median={out[name]['median']}s draws={walls}")
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
