"""Paired same-session A/B: auto-salt default vs star_salts=None on
the declared CC rows (VERDICT r14 #2 — cc_copresence_rosters read
+39% cross-artifact with no paired adjudication on record).

Alternating blocks in ONE session: each block monkeypatches the
queries' module-level ``connected_components`` binding to pin the
kernel layout, warms once, then records 3 noop-sink draws per query.
Block order A,B,A,B,A,B so host drift cancels.

Usage: python scripts/ab_autosalt.py [--sf DIR] [--draws 3]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["cc_copresence_rosters", "cc_user_copresence", "cc_generated_chains"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--draws", type=int, default=3)
    ap.add_argument("--blocks", type=int, default=3)
    args = ap.parse_args()

    from connected_component_spark.session import get_spark
    import connected_component_spark.queries.graph as qg
    from connected_component_spark.graph.cc import connected_components as cc

    spark = get_spark(app_name="cc-ab-autosalt")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    arms = {
        "auto": cc,  # HEAD default (star_salts="auto")
        "fused": functools.partial(cc, star_salts=None),
    }

    # one throwaway warm draw per query (file index, codegen)
    for name in QUERIES:
        qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()

    results: dict[str, dict[str, list[float]]] = {
        n: {a: [] for a in arms} for n in QUERIES
    }
    for block in range(args.blocks):
        for arm, fn in arms.items():
            qg.connected_components = fn
            for name in QUERIES:
                spark.sparkContext.setJobDescription(
                    f"ab-autosalt:{arm}:b{block}:{name}"
                )
                walls = []
                for _ in range(args.draws):
                    t0 = time.perf_counter()
                    qs[name](spark, args.sf).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    walls.append(round(time.perf_counter() - t0, 3))
                med = round(statistics.median(walls), 3)
                results[name][arm].append(med)
                print(f"block {block} {arm:5s} {name}: {med} {walls}", flush=True)
    qg.connected_components = cc  # restore
    summary = {
        n: {a: round(statistics.median(v), 3) for a, v in per.items()}
        for n, per in results.items()
    }
    print(json.dumps({"block_medians": results, "median_of_blocks": summary}))
    spark.stop()


if __name__ == "__main__":
    main()
