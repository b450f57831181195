#!/usr/bin/env python
"""Round-13 scaling probe: the two reshaped text-pipeline queries at 1x
(sf0.1) vs 10x (/tmp/pcr_sf1, the round-7 sf1 corpus).

VERDICT r12 flagged q_vocab_coverage (single-partition global window)
and q_repetition (per-doc quadratic mode_freq) as the last scale-killers.
Both were reshaped (range-partitioned two-pass prefix sum; sorted-run
fold). This probe records the empirical exponent: wall(10x)/wall(1x)
should be ~<= 10 (linear) for map-shaped q_repetition and ~vocab-bound
for q_vocab_coverage.

Usage: python scripts/scaling_probe_r13.py  (prints the SCALING.md rows)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = "/root/testdata/sf0.1"
SF10 = os.environ.get("PCR_SF1_DIR", "/tmp/pcr_sf1")


def median_of(spark, fn, sf_dir, reps=3):
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 3)


def main():
    from postgres_cdc_reconciliation_spark.plans.registry import all_queries
    from postgres_cdc_reconciliation_spark.session import get_spark

    spark = get_spark(app_name="scaling-r13", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    for d in (SF1, SF10):
        spark.read.parquet(f"{d}/documents.parquet").count()  # warm-up
    reg = all_queries()
    for name in ("q_repetition", "q_vocab_coverage"):
        w1 = median_of(spark, reg[name].fn, SF1)
        w10 = median_of(spark, reg[name].fn, SF10)
        import math

        exp = math.log(w10 / w1) / math.log(10) if w1 > 0 else float("nan")
        print(f"{name}: 1x={w1}s 10x={w10}s ratio={w10/w1:.2f} exponent={exp:.2f}")


if __name__ == "__main__":
    main()
