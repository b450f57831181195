#!/usr/bin/env python
"""q_ivm_agg A/B (VERDICT r14 #2): same standalone-bench cycle (3 passes of
median-of-3 noop-sink runs + controls) against a repo root passed as argv[1]
— run once with /tmp/ab_r12 (round-12 code) and once with /root/repo, same
host window, to attribute the r13 sf1 2.695->7.199 s excursion.
"""

import os
import statistics
import sys
import time

ROOT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo"
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CONTROLS = ["q_count", "q_filter_eq"]


def median_of(spark, fn, reps=3):
    import gc

    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
        df = None
        gc.collect()
    return round(statistics.median(runs), 3)


def main():
    from postgres_cdc_reconciliation_spark.plans.registry import all_queries
    from postgres_cdc_reconciliation_spark.session import get_spark

    spark = get_spark(
        app_name="ivm-ab", master="local[32]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    reg = all_queries()
    print(f"root={ROOT} sf={SF_DIR}")
    for c in CONTROLS:
        print(f"control {c}: {median_of(spark, reg[c].fn)}")
    for name in ("q_ivm_agg", "q_ivm_join"):
        passes = [median_of(spark, reg[name].fn) for _ in range(3)]
        print(f"{name}: passes={'/'.join(map(str, passes))} median={statistics.median(passes)}")
    for c in CONTROLS:
        print(f"control(after) {c}: {median_of(spark, reg[c].fn)}")


if __name__ == "__main__":
    main()
