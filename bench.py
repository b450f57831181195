#!/usr/bin/env python
"""Benchmark: run every registered query at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Each query is materialized through the noop sink (full column
materialization, no driver collect — measures the distributed plan, not
toPandas serialization). One warm-up scan first so JVM/codegen startup isn't
attributed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from postgres_cdc_reconciliation_spark.plans.registry import all_queries
    from postgres_cdc_reconciliation_spark.session import get_spark

    spark = get_spark(app_name="pcr-bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM, codegen, parquet footer reads
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    for name, spec in sorted(all_queries().items()):
        t0 = time.perf_counter()
        try:
            df = spec.fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # a failing query must not kill the bench
            timings[name] = -1.0
            print(f"# bench error {name}: {e}", file=sys.stderr)

    total = round(sum(v for v in timings.values() if v >= 0), 3)
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = sf
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_num,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
