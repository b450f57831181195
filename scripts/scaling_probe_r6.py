#!/usr/bin/env python
"""Round-6 scaling probe (VERDICT r5 #4): the four newest query shapes
plus the fingerprint drill-down at sf0.1 (1x) vs a synthesized 10x,
scaling exponent per probe.

10x corpus rules (same discipline as scaling_probe_r5.py — copies must
behave like INDEPENDENT sf0.1 corpora so the probe measures the engine,
not a synthetically densified workload):

- events: copy k shifts user_id by k*100_000 — 10x keys, each copy's
  per-user daily series identical in shape; the query key (user 7,
  copy 0) stays a single series, so similarity probes grow linearly in
  candidates.
- interval overlap: the registered query's grp = o_custkey % 50 folds
  every copy into the SAME 50 groups (10x rows per group → ~100x output
  pairs — quadratic in the CORPUS, which is a workload property, not an
  engine one). The probe therefore keys each copy into its own 50
  groups (grp = copy*50 + custkey%50), preserving intra-copy join
  structure exactly — the independent-copies semantics of the rest of
  the 10x corpus.
- fingerprint drill-down: the sparse-divergence scenario the fast path
  exists for — a CONSTANT ~50 divergent keys while the table grows 10x,
  both sides stored in the PK-hash-bucketed layout and the drill-down
  reading with bucket_of=_bucket so the bucket predicate prunes
  partition dirs. Expected near-flat; the same probe without the
  bucketed layout is scan-bound (predicate over pmod(xxhash64) cannot
  push into parquet) and is reported alongside for the contrast.

Exponent = log10(t_10x / t_1x): 1.0 linear, <=1.2 accepted (VERDICT),
min-of-2 per cell. Results go to SCALING.md.

Usage: python scripts/scaling_probe_r6.py
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
USER_SHIFT = 100_000
KEY_SHIFT = 100_000_000  # o_orderkey shift per copy (scaling_probe_r5b.py)


def build_events_10x(spark) -> None:
    from postgres_cdc_reconciliation_spark import fixtures as fx

    ev = fx.events_df(spark, SF1)  # vintage-normalized NTZ micros
    parts = [
        ev.withColumn("user_id", F.col("user_id") + F.lit(k * USER_SHIFT))
        for k in range(COPIES)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{SF10}/events.parquet"
    )


def probe_interval_overlap(spark, sf_dir):
    """interval_overlap_join with per-copy groups (see module docstring)."""
    from postgres_cdc_reconciliation_spark.operators.temporal import (
        interval_overlap_join,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base_key = F.col("o_orderkey") % KEY_SHIFT
    copy = (F.col("o_orderkey") / KEY_SHIFT).cast("long")

    def side(mod_filter, span_mod):
        return o.filter(base_key % mod_filter == 0).select(
            (copy * 50 + F.col("o_custkey") % 50).cast("long").alias("grp"),
            F.col("o_orderkey").cast("long").alias("iid"),
            F.col("o_orderdate").alias("start"),
            (
                F.col("o_orderdate")
                + F.make_dt_interval(
                    (base_key % span_mod).cast("int"),
                    F.lit(0), F.lit(0), F.lit(0),
                )
            ).alias("end"),
        )

    return interval_overlap_join(
        side(5, 7), side(7, 11), on="grp",
        l_id="iid", l_start="start", l_end="end",
        r_id="iid", r_start="start", r_end="end",
        chunk_seconds=4 * 86_400,
    )


def _sparse_pair(spark, sf_dir, n_divergent=50):
    """Recon pair with a constant number of divergent keys at any scale."""
    src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").cast("long").alias("order_id"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("amount"),
        F.col("o_orderstatus").alias("status"),
    )
    n = src.count()
    p = max(1, n // n_divergent)
    tgt = src.withColumn(
        "amount",
        F.when(
            F.col("order_id") % p == 0,
            F.expr("cast(amount + 0.01 as decimal(12,2))"),
        ).otherwise(F.col("amount")),
    )
    return src, tgt


def probe_drilldown_bucketed(spark, sf_dir, tmp_tag):
    """fingerprint_diff + drilldown with both sides in the bucketed
    layout, drilldown pruning on the _bucket partition column."""
    from postgres_cdc_reconciliation_spark.operators.apply import (
        write_bucketed_target,
    )
    from postgres_cdc_reconciliation_spark.operators.recon import (
        fingerprint_diff,
        fingerprint_drilldown,
    )

    n_buckets = 64
    paths = {}
    for name, df in zip(("src", "tgt"), _sparse_pair(spark, sf_dir)):
        path = f"/tmp/pcr_r6_drill_{tmp_tag}_{name}"
        if not os.path.isdir(path):
            write_bucketed_target(df, path, ["order_id"], n_buckets,
                                  dynamic=False)
        paths[name] = path

    def bucketed(path):
        return spark.read.parquet(path)

    def run():
        src = bucketed(paths["src"])
        tgt = bucketed(paths["tgt"])
        bucket_of = lambda df: F.col("_bucket")  # noqa: E731
        summary = fingerprint_diff(
            src, tgt, ["order_id"], n_buckets=n_buckets,
            hash_cols=["order_id", "amount", "status"], bucket_of=bucket_of,
        )
        return fingerprint_drilldown(
            src, tgt, ["order_id"], summary, n_buckets=n_buckets,
            bucket_of=bucket_of,
        )

    return run


def probe_drilldown_flat(spark, sf_dir):
    """Same check on unpartitioned frames — the scan-bound contrast."""
    from postgres_cdc_reconciliation_spark.operators.recon import (
        fingerprint_diff,
        fingerprint_drilldown,
    )

    def run():
        src, tgt = _sparse_pair(spark, sf_dir)
        summary = fingerprint_diff(src, tgt, ["order_id"], n_buckets=64)
        return fingerprint_drilldown(
            src, tgt, ["order_id"], summary, n_buckets=64
        )

    return run


def main() -> None:
    from postgres_cdc_reconciliation_spark.plans.registry import all_queries

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="pcr-scaling-r6", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.isdir(f"{SF10}/orders.parquet"):
        print("# 10x orders missing - run scripts/scaling_probe_r5b.py first")
        sys.exit(1)
    if not os.path.isdir(f"{SF10}/events.parquet"):
        t0 = time.perf_counter()
        build_events_10x(spark)
        print(f"# built 10x events in {time.perf_counter() - t0:.1f}s")

    qs = all_queries()
    spark.read.parquet(f"{SF1}/orders.parquet").count()  # warm-up

    def best_of(thunk, reps=2):
        best, rows = float("inf"), -1
        for _ in range(reps):
            t0 = time.perf_counter()
            rows = thunk().count()
            best = min(best, time.perf_counter() - t0)
        return best, rows

    probes = {
        "q_profile_diff": lambda sf: (lambda: qs["q_profile_diff"].fn(spark, sf)),
        "q_series_similarity": lambda sf: (
            lambda: qs["q_series_similarity"].fn(spark, sf)
        ),
        "q_series_dtw": lambda sf: (lambda: qs["q_series_dtw"].fn(spark, sf)),
        "interval_overlap_percopy": lambda sf: (
            lambda: probe_interval_overlap(spark, sf)
        ),
        "fingerprint_drilldown_flat": lambda sf: probe_drilldown_flat(spark, sf),
        "fingerprint_drilldown_bucketed": lambda sf: probe_drilldown_bucketed(
            spark, sf, "1x" if sf == SF1 else "10x"
        ),
    }

    results = {}
    for name, mk in probes.items():
        t1x, rows1 = best_of(mk(SF1))
        t10x, rows10 = best_of(mk(SF10))
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
