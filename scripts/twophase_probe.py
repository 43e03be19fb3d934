"""cc_generated_chains algorithmic probe (r15, verdict #7).

Compares the HEAD alternating kernel (large-star, small-star per
round) against a two-phase variant (large-star TWICE, then
small-star) on the generated-chains edge set — the only remaining
cut on the board's #1 row is algorithmic scheduling.  Semantics are
checked, not assumed: both arms' final assignments must be
row-identical (the alternating family's fixpoint is the
component-min map either way).

The variant lives HERE, not in graph/cc.py: cc_round_skew_report
declares the per-round operator outputs as oracle-replayed query
results, so the OPERATORS cannot change; only the kernel loop's
scheduling could.  This probe decides whether it should.

Usage: python scripts/twophase_probe.py [--sf DIR] [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from connected_component_spark.session import get_spark
    import connected_component_spark.graph.cc as ccmod

    spark = get_spark(app_name="cc-twophase-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from connected_component_spark.graph.cliques import cliques_to_edges
    from connected_component_spark.queries.graph import (
        _generated_chain_cliques,
    )
    from connected_component_spark.sources.tables import table_row_count

    n_chains = table_row_count(spark, args.sf, "documents")
    edges = cliques_to_edges(
        _generated_chain_cliques(spark, n_chains)
    ).localCheckpoint(eager=True)

    from connected_component_spark.plans.tuning import shrunk_shuffle

    def two_phase(edge_df, max_iterations=20):
        """Large-star x2 then small-star per round; same convergence
        fingerprint + shuffle-sizing discipline as the HEAD loop,
        fused layout (arms differ ONLY in star scheduling — HEAD arm
        runs star_salts=None below for the same reason)."""
        pairs = ccmod._canonical_edges(edge_df).distinct().localCheckpoint()
        n0 = pairs.count()
        prev_fp = None
        iters = 0
        with shrunk_shuffle(spark, n0):
            for iters in range(1, max_iterations + 1):
                pairs = ccmod.small_star(
                    ccmod.large_star(ccmod.large_star(pairs))
                ).localCheckpoint(eager=False)
                fp = ccmod._set_fingerprint(pairs)
                if fp == prev_fp:
                    break
                prev_fp = fp
        asg = pairs.groupBy(F.col("src").alias("node")).agg(
            F.min("dst").alias("component")
        )
        return asg, iters

    def checksum(asg):
        row = asg.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("node", "component").cast("decimal(20,0)")),
                F.lit(0),
            ).alias("h"),
        ).first()
        return (int(row["n"]), int(row["h"]))

    # warm + equivalence check
    res = ccmod.connected_components(edges, star_salts=None)
    head_sum = checksum(res.assignments)
    asg2, it2 = two_phase(edges)
    tp_sum = checksum(asg2)
    print(f"HEAD iters={res.iterations} checksum={head_sum}")
    print(f"2phase iters={it2} checksum={tp_sum}")
    print(f"assignments identical: {head_sum == tp_sum}")

    out = {"head": [], "twophase": []}
    for rep in range(args.reps):
        spark.sparkContext.setJobDescription(f"twophase:head:r{rep}")
        t0 = time.perf_counter()
        r = ccmod.connected_components(edges, star_salts=None)
        r.assignments.write.format("noop").mode("overwrite").save()
        out["head"].append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(f"twophase:2p:r{rep}")
        t0 = time.perf_counter()
        asg, it = two_phase(edges)
        asg.write.format("noop").mode("overwrite").save()
        out["twophase"].append(round(time.perf_counter() - t0, 3))
        print(
            f"rep {rep}: head={out['head'][-1]}s ({r.iterations} it)  "
            f"twophase={out['twophase'][-1]}s ({it} it)",
            flush=True,
        )
    for arm, walls in out.items():
        print(f"{arm}: median={statistics.median(walls)} {walls}")
    spark.stop()


if __name__ == "__main__":
    main()
