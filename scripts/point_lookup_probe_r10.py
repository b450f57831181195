#!/usr/bin/env python
"""Round-10 probe: key-routed point lookup IO/latency vs full-scan filter.

Builds a 600k-row manifest target (256 buckets, compacted to one file per
bucket), then compares read_keys(...) against read_snapshot().filter(isin)
for probe sets of 1 / 10 / 100 keys: files opened and wall-clock. The
claim under test: point-read IO is O(touched buckets), never O(target).

Usage: python scripts/point_lookup_probe_r10.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgres_cdc_reconciliation_spark.operators.manifest_target import (  # noqa: E402
    compact,
    commit_delta,
    read_keys,
    read_snapshot,
)
from postgres_cdc_reconciliation_spark.session import get_spark  # noqa: E402

ROOT = "/tmp/pcr_point_lookup_target"
N_ROWS = 600_000
N_BUCKETS = 256


def build(spark):
    if os.path.exists(f"{ROOT}/_manifests/v1.json"):
        return
    shutil.rmtree(ROOT, ignore_errors=True)
    df = spark.range(N_ROWS).select(
        F.col("id").alias("k"),
        (F.col("id") % 1000).alias("g"),
        (F.col("id") * F.lit(1.5)).alias("v"),
    )
    commit_delta(df, ROOT, ["k"], list(range(N_BUCKETS)), N_BUCKETS)
    compact(spark, ROOT, ["k"], N_BUCKETS)  # one file per bucket


def main():
    spark = get_spark(app_name="point-lookup-probe-r10")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)

    full = read_snapshot(spark, ROOT)
    total_files = len(full.inputFiles())
    print(f"target: {N_ROWS} rows, {N_BUCKETS} buckets, {total_files} files")

    for n_keys in (1, 10, 100):
        keys = [i * 6007 % N_ROWS for i in range(n_keys)]  # scattered keys
        # point lookup (median of 3)
        times, files = [], None
        for _ in range(3):
            t0 = time.perf_counter()
            df = read_keys(spark, ROOT, ["k"], keys)
            n = df.count()
            times.append(time.perf_counter() - t0)
            files = len(df.inputFiles())
        times.sort()
        # full-scan filter baseline (median of 3)
        scan_times = []
        for _ in range(3):
            t0 = time.perf_counter()
            m = read_snapshot(spark, ROOT).filter(F.col("k").isin(keys)).count()
            scan_times.append(time.perf_counter() - t0)
        scan_times.sort()
        assert n == m == n_keys, (n, m, n_keys)
        print(
            f"{n_keys:4d} keys: lookup {times[1]:.3f}s / {files} files read"
            f"  vs full-scan {scan_times[1]:.3f}s / {total_files} files"
        )
    spark.stop()


if __name__ == "__main__":
    main()
