#!/usr/bin/env python
"""Round-5 scaling probe, part B: the three NEW operators (q_scd2_dim,
q_changelog_compaction, q_kcore) at sf0.1 (1x) vs the synthesized 10x
corpus from scaling_probe_r5.py (reused if present; orders added here).

10x orders: copy k shifts o_orderkey by k*10^8 — the CDC fixture derives
its changelog deterministically from o_orderkey (ops at %5/%3/%7, lsn =
key*16+off), so each copy is an independent sf0.1 changelog: 10x keys,
identical per-key event-run shape. Same exponent discipline as part A:
exponent = log10(t_10x / t_1x), ≤1.2 accepted, min-of-2 per cell.

Usage: python scripts/scaling_probe_r5b.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgres_cdc_reconciliation_spark.session import get_spark  # noqa: E402

SF1 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF10 = "/tmp/pcr_sf10x"
COPIES = 10
QUERIES = ["q_scd2_dim", "q_changelog_compaction", "q_kcore"]


def build_orders_10x(spark) -> None:
    od = spark.read.parquet(f"{SF1}/orders.parquet")
    parts = []
    for k in range(COPIES):
        shift = k * 100_000_000
        parts.append(
            od.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(shift))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{SF10}/orders.parquet")


def main() -> None:
    from postgres_cdc_reconciliation_spark.plans.registry import all_queries

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="pcr-scaling-r5b", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.isdir(f"{SF10}/lineitem.parquet"):
        print("# 10x lineitem missing - run scripts/scaling_probe_r5.py first")
        sys.exit(1)
    if not os.path.isdir(f"{SF10}/orders.parquet"):
        t0 = time.perf_counter()
        build_orders_10x(spark)
        print(f"# built 10x orders in {time.perf_counter() - t0:.1f}s")

    qs = all_queries()
    spark.read.parquet(f"{SF1}/orders.parquet").count()  # warm-up

    def best_of(fn, sf, reps=2):
        best, rows = float("inf"), -1
        for _ in range(reps):
            t0 = time.perf_counter()
            rows = fn(spark, sf).count()
            best = min(best, time.perf_counter() - t0)
        return best, rows

    results = {}
    for name in QUERIES:
        fn = qs[name].fn
        t1x, rows1 = best_of(fn, SF1)
        t10x, rows10 = best_of(fn, SF10)
        exp = math.log10(t10x / t1x) if t1x > 0 else float("nan")
        results[name] = {
            "t_1x_sec": round(t1x, 2),
            "rows_1x": rows1,
            "t_10x_sec": round(t10x, 2),
            "rows_10x": rows10,
            "exponent": round(exp, 2),
        }
        print(
            f"{name}: 1x {t1x:.2f}s ({rows1} rows) -> 10x {t10x:.2f}s "
            f"({rows10} rows), exponent {exp:.2f}"
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
