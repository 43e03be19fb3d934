"""Decompose the durable-IVF first-fold cost (r15, verdict #8).

fold_timings put ann_ivf_incremental_topk's epoch-0 fold at ~3.2 s
vs ~0.8 s steady-state.  Centroid training is NOT the suspect — the
codebook is served from the warmup-staged memo as a LocalTableScan —
so this probe times the store phases of every fold: each write (per
table), the manifest commit, and the residue, by wrapping
ParquetStateStore methods with timers.

Usage: python scripts/fold0_decompose.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from connected_component_spark.session import get_spark

    spark = get_spark(app_name="cc-fold0-decompose")
    spark.sparkContext.setLogLevel("ERROR")

    import connected_component_spark.streaming.store as store_mod

    log: list[tuple] = []

    real_write = store_mod.ParquetStateStore.write
    real_commit = store_mod.ParquetStateStore.commit

    def timed_write(self, table, batch_idx, df, partition_by=None):
        t0 = time.perf_counter()
        real_write(self, table, batch_idx, df, partition_by)
        log.append(("write", table, batch_idx, round(time.perf_counter() - t0, 3)))

    def timed_commit(self, batch_idx, params, epoch_id=None, **kw):
        t0 = time.perf_counter()
        real_commit(self, batch_idx, params, epoch_id, **kw)
        log.append(("commit", "-", batch_idx, round(time.perf_counter() - t0, 3)))

    store_mod.ParquetStateStore.write = timed_write
    store_mod.ParquetStateStore.commit = timed_commit

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    name = "ann_ivf_incremental_topk"
    # warm draw first (codebook memo, JIT) so fold-0's residue is honest
    for rep in range(2):
        log.clear()
        store_mod.FOLD_TELEMETRY = folds = []
        t0 = time.perf_counter()
        qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
        total = round(time.perf_counter() - t0, 3)
        store_mod.FOLD_TELEMETRY = None
        print(f"--- rep {rep} total={total}s")
        for f in folds:
            phases = [e for e in log if e[2] == f["epoch"]]
            acc = sum(t for (_k, _tab, _b, t) in phases)
            print(
                f"  fold {f['epoch']}: {f['sec']}s  "
                + " ".join(
                    f"{k}({tab})={t}" if tab != "-" else f"{k}={t}"
                    for (k, tab, _b, t) in phases
                )
                + f"  residue={round(f['sec'] - acc, 3)}"
            )

    store_mod.ParquetStateStore.write = real_write
    store_mod.ParquetStateStore.commit = real_commit
    spark.stop()


if __name__ == "__main__":
    main()
