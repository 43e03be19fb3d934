"""Decompose the fused auto-salt probe's per-round tax on a
non-skewed kernel run (r15): HEAD probe vs probe-without-percentile
vs plain fingerprint (fused), same session, alternating draws.

The flip decision consumes only profile["max"] (graph/cc.py:676),
so the percentile_approx in _set_fingerprint_with_skew is candidate
dead weight; the rest of the tax is the keyed (p, k) hash-agg
replacing the unkeyed two-scalar aggregation.

Usage: python scripts/probe_decompose.py [--sf DIR] [--reps 3]
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

    spark = get_spark(app_name="cc-probe-decompose")
    spark.sparkContext.setLogLevel("ERROR")

    # the cc_generated_chains edge set (the biggest declared CC row)
    from connected_component_spark.graph.cliques import cliques_to_edges
    from connected_component_spark.queries.graph import (
        _generated_chain_cliques,
    )
    from connected_component_spark.sources.tables import table_row_count

    n_chains = table_row_count(spark, args.sf, "documents")
    edges = cliques_to_edges(
        _generated_chain_cliques(spark, n_chains)
    ).localCheckpoint(eager=True)

    head_probe = ccmod._set_fingerprint_with_skew

    def slim_probe(pairs):
        """HEAD probe minus percentile_approx (max only)."""
        h = F.xxhash64("src", "dst")
        is_probe = F.pmod(h, F.lit(ccmod._PROBE_SAMPLE_MOD)) == 0
        row = (
            pairs.select(
                is_probe.alias("p"),
                F.when(is_probe, F.col("dst"))
                .otherwise(F.pmod(h, F.lit(ccmod._PROBE_SPREAD)))
                .alias("k"),
                h.cast("decimal(20,0)").alias("h"),
            )
            .groupBy("p", "k")
            .agg(
                F.count(F.lit(1)).alias("deg"),
                F.sum("h").cast("decimal(38,0)").alias("hsum"),
            )
            .agg(
                F.sum("deg").alias("n"),
                F.coalesce(F.sum("hsum"), F.lit(0))
                .cast("decimal(38,0)")
                .alias("h"),
                F.max(F.when(F.col("p"), F.col("deg"))).alias("mx"),
            )
            .first()
        )
        if row["n"] is None or int(row["n"]) == 0:
            return (0, 0), {"max": 0, "p50": 0, "p99": 0}
        fp = (int(row["n"]), int(row["h"]))
        if row["mx"] is None:
            return fp, {"max": 0, "p50": 0, "p99": 0}
        mx = int(row["mx"]) * ccmod._PROBE_SAMPLE_MOD
        return fp, {"max": mx, "p50": 0, "p99": 0}

    arms = {
        "auto_head": ("auto", head_probe),
        "auto_slim": ("auto", slim_probe),
        "fused": (None, head_probe),
    }
    # warm
    ccmod.connected_components(edges).assignments.write.format("noop").mode(
        "overwrite"
    ).save()

    out = {a: [] for a in arms}
    for rep in range(args.reps):
        for arm, (salts, probe) in arms.items():
            ccmod._set_fingerprint_with_skew = probe
            spark.sparkContext.setJobDescription(f"probe-decomp:{arm}:r{rep}")
            t0 = time.perf_counter()
            res = ccmod.connected_components(edges, star_salts=salts)
            res.assignments.write.format("noop").mode("overwrite").save()
            w = round(time.perf_counter() - t0, 3)
            out[arm].append(w)
            print(
                f"rep {rep} {arm:10s}: {w}s iters={res.iterations} "
                f"salted_from={res.salted_from_round}",
                flush=True,
            )
    ccmod._set_fingerprint_with_skew = head_probe
    for arm, walls in out.items():
        print(f"{arm}: median={statistics.median(walls)} {walls}")
    spark.stop()


if __name__ == "__main__":
    main()
