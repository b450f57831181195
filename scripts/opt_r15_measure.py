#!/usr/bin/env python
"""Round-14 optimization measurement harness.

Usage:
    python scripts/opt_r15_measure.py before q_semantic_dedup q_pagerank ...
    python scripts/opt_r15_measure.py after  q_semantic_dedup ...
    python scripts/opt_r15_measure.py time   q_semantic_dedup ...   # no plan dump
    python scripts/opt_r15_measure.py plan:before q_x ...           # plan dump only,
                                                                    # no timed runs

For each named query: builds the DataFrame, dumps .explain("formatted") to
plans/r15/<name>_<tag>.txt (unless tag == "time"), then times REPS noop-sink
runs (same methodology as bench.py: median, GC between runs) and prints one
line per query. SF dir and core count honour the bench env vars.
"""

from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from postgres_cdc_reconciliation_spark.plans.registry import all_queries
    from postgres_cdc_reconciliation_spark.session import get_spark

    spark = get_spark(app_name=f"pcr-opt-r15-{tag}", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()  # warm-up

    reg = all_queries()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", "r15")
    os.makedirs(outdir, exist_ok=True)

    plan_only = tag.startswith("plan:")
    file_tag = tag.split(":", 1)[1] if plan_only else tag

    for name in names:
        spec = reg[name]
        spark.sparkContext.setJobDescription(f"opt-r15 {tag} {name}")
        df = spec.fn(spark, SF_DIR)
        if tag != "time":
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(outdir, f"{name}_{file_tag}.txt"), "w") as f:
                f.write(plan)
        if plan_only:
            print(f"{name}: plan dumped", flush=True)
            continue
        runs: list[float] = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            df = spec.fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            df = None
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        med = statistics.median(runs)
        print(
            f"{name}: median={med:.3f} runs={[round(r, 3) for r in runs]}",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
