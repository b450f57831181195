#!/usr/bin/env python
"""Standalone per-query bench (the BASELINE.md re-measurement protocol):
fresh session, warm-up scan, then for each named query PASSES passes of
median-of-REPS noop-sink runs with the stable controls alongside.

Usage: python scripts/standalone_bench.py q_approx_stats [q_x ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), PASSES (3), REPS (3).
"""

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("PASSES", "3"))
REPS = int(os.environ.get("REPS", "3"))
CONTROLS = ["q_count", "q_sort", "q_filter_eq"]


def median_of(spark, fn, reps):
    import gc

    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
        df = None
        gc.collect()
        spark.sparkContext._jvm.System.gc()
    return round(statistics.median(runs), 3)


def main():
    names = sys.argv[1:]
    if not names:
        print("usage: standalone_bench.py <query> [...]", file=sys.stderr)
        sys.exit(2)
    from postgres_cdc_reconciliation_spark.plans.registry import all_queries
    from postgres_cdc_reconciliation_spark.session import get_spark

    spark = get_spark(app_name="standalone-bench", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    reg = all_queries()
    for c in CONTROLS:
        print(f"control {c}: {median_of(spark, reg[c].fn, REPS)}")
    for name in names:
        passes = [median_of(spark, reg[name].fn, REPS) for _ in range(PASSES)]
        print(
            f"{name}: passes={'/'.join(str(p) for p in passes)} "
            f"median={statistics.median(passes)}"
        )
    for c in CONTROLS:
        print(f"control(after) {c}: {median_of(spark, reg[c].fn, REPS)}")


if __name__ == "__main__":
    main()
