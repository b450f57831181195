#!/usr/bin/env python
"""Round-10 probe: file-level zone-map skipping IO/latency vs full-scan
filter, and footer-only stats vs scan aggregation.

Builds a 6M-row table range-clustered into 192 files by an event-time-like
key (write_range_clustered stamps per-file [min,max] zones from footers),
then compares read_range(...) against read.parquet().filter(between) for
windows of 0.5% / 5% / 50% selectivity: files opened and wall-clock. Also
times target-stats-style footer aggregation (count+min/max with zero data
IO) against the equivalent scan. Claims under test: files opened tracks
window width (never table size), and footer stats answer without a scan.

Usage: python scripts/zonemap_probe_r10.py
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgres_cdc_reconciliation_spark.operators.layout import (  # noqa: E402
    footer_stats,
    read_range,
    write_range_clustered,
)
from postgres_cdc_reconciliation_spark.session import get_spark  # noqa: E402

ROOT = "/tmp/pcr_zonemap_probe"
N_ROWS = 6_000_000
N_FILES = 192


def build(spark) -> int:
    if os.path.exists(f"{ROOT}/_pcr_zonemap.json"):
        return N_FILES
    shutil.rmtree(ROOT, ignore_errors=True)
    df = spark.range(N_ROWS).select(
        F.col("id").alias("t"),  # monotone event-time stand-in
        (F.col("id") % 1000).alias("g"),
        (F.col("id") * F.lit(1.5)).alias("v"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    t0 = time.time()
    written = write_range_clustered(df, ROOT, "t", n_files=N_FILES)
    print(f"built: {N_ROWS} rows, {written} files, {time.time()-t0:.1f}s "
          "(incl. footer pass + sidecar)")
    return written


def _med(fn, n=3):
    return statistics.median(fn() for _ in range(n))


def main():
    spark = get_spark(app_name="zonemap-probe-r10")
    spark.sparkContext.setLogLevel("ERROR")
    written = build(spark)

    plain = spark.read.parquet(ROOT)
    total_files = len(plain.inputFiles())
    print(f"table: {total_files} data files")

    for frac, label in ((0.005, "0.5%"), (0.05, "5%"), (0.5, "50%")):
        lo = int(N_ROWS * 0.25)
        hi = lo + int(N_ROWS * frac) - 1

        pruned = read_range(spark, ROOT, "t", lo, hi)
        n_files = len(pruned.inputFiles())

        def run_pruned():
            t0 = time.time()
            read_range(spark, ROOT, "t", lo, hi).agg(
                F.count("*"), F.sum("v")
            ).collect()
            return time.time() - t0

        def run_scan():
            t0 = time.time()
            plain.filter((F.col("t") >= lo) & (F.col("t") <= hi)).agg(
                F.count("*"), F.sum("v")
            ).collect()
            return time.time() - t0

        print(
            f"window {label}: files {n_files}/{total_files}, "
            f"pruned {_med(run_pruned):.2f}s, full-scan {_med(run_scan):.2f}s"
        )

    # footer stats vs scan aggregation
    files = [f for f in plain.inputFiles()]

    def run_footers():
        t0 = time.time()
        st = footer_stats(spark, files, ["t", "v"])
        n = sum(p["rows"] for p in st.values())
        assert n == N_ROWS
        return time.time() - t0

    def run_agg():
        t0 = time.time()
        plain.agg(F.count("*"), F.min("t"), F.max("t"), F.min("v"),
                  F.max("v")).collect()
        return time.time() - t0

    print(f"stats: footers {_med(run_footers):.2f}s, scan agg {_med(run_agg):.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
