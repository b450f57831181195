#!/usr/bin/env python
"""Standalone CDC-apply throughput re-measurement (VERDICT r11 #3):
exactly bench.py's micro-bench — fixture materialized to parquet once,
2 untimed warm-ups, 7 trials of 4 back-to-back runs, median events/s +
outlier-trimmed spread — in a fresh session with nothing else running."""

import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from postgres_cdc_reconciliation_spark import fixtures as fx  # noqa: E402
from postgres_cdc_reconciliation_spark.operators.apply import (  # noqa: E402
    latest_per_key,
)
from postgres_cdc_reconciliation_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main():
    spark = get_spark(app_name="cdc-standalone", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    ev_dir = tempfile.mkdtemp(prefix="cdc-standalone-")
    try:
        fx.cdc_events_df(spark, SF_DIR).write.mode("overwrite").parquet(ev_dir)
        ev = spark.read.parquet(ev_dir)
        n_events = ev.count()

        def _run_apply():
            (
                latest_per_key(
                    ev, ["order_id"], lsn_col="lsn_long", lsn_is_text=False
                )
                .filter(F.col("op") != "d")
                .write.format("noop")
                .mode("overwrite")
                .save()
            )

        def _trial(k=4):
            t0 = time.perf_counter()
            for _ in range(k):
                _run_apply()
            return k * n_events / (time.perf_counter() - t0)

        _run_apply()
        _run_apply()
        trials = sorted(_trial() for _ in range(7))
        med = statistics.median(trials)
        trimmed = trials[1:-1]
        print(f"n_events={n_events}")
        print("trials_sorted_keps:", [round(t / 1000, 1) for t in trials])
        print(f"median_eps={round(med, 1)}")
        print(f"trimmed_spread={round((trimmed[-1] - trimmed[0]) / med, 3)}")
    finally:
        shutil.rmtree(ev_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
