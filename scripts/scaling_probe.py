#!/usr/bin/env python
"""Scaling probe: measure headline plans at 1x (sf0.1) vs 10x synthetic data.

Builds a 10x corpus in /tmp by unioning sf0.1 with shifted keys (pure Spark,
no external data), then times the canonical plans at both scales. A
shuffle-disciplined plan should scale ~linearly in rows on fixed cores;
superlinear growth exposes a plan that won't survive 100 TB.

Also demonstrates skew handling: a 90%-hot-key join plain vs salted.

Usage: python scripts/scaling_probe.py   (writes SCALING.md numbers to stdout)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgres_cdc_reconciliation_spark.operators.apply import latest_per_key  # noqa: E402
from postgres_cdc_reconciliation_spark.operators.layout import salted_join  # noqa: E402
from postgres_cdc_reconciliation_spark.operators.recon import diff_by_hash  # noqa: E402
from postgres_cdc_reconciliation_spark.session import get_spark  # noqa: E402

SF1 = "/root/testdata/sf0.1"
TENX = "/tmp/pcr_scale10x"
MULT = 10


def build_10x(spark):
    if os.path.exists(f"{TENX}/lineitem.parquet/_SUCCESS"):
        return
    for t, key in [("orders", "o_orderkey"), ("lineitem", "l_orderkey")]:
        base = spark.read.parquet(f"{SF1}/{t}.parquet")
        n = 200_000
        reps = spark.range(MULT).withColumnRenamed("id", "_rep")
        big = base.crossJoin(reps).withColumn(key, F.col(key) + F.col("_rep") * n).drop(
            "_rep"
        )
        big.write.mode("overwrite").parquet(f"{TENX}/{t}.parquet")


def t_pricing(spark, d):
    li = spark.read.parquet(f"{d}/lineitem.parquet")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(12,2)")
    t0 = time.perf_counter()
    (
        li.filter(F.col("l_shipdate") <= F.expr("cast('1998-09-02' as timestamp_ntz)"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(price).alias("s1"),
            F.sum(price * (F.lit(1) - disc)).alias("s2"),
            F.count("*").alias("c"),
        )
        .write.format("noop").mode("overwrite").save()
    )
    return time.perf_counter() - t0


def t_apply(spark, d):
    o = spark.read.parquet(f"{d}/orders.parquet").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("amount"),
    )
    ev = o.withColumn("op", F.lit("c")).withColumn(
        "lsn", F.col("order_id") * 4 + 1
    ).unionByName(
        o.filter(F.col("order_id") % 3 == 0)
        .withColumn("op", F.lit("u"))
        .withColumn("lsn", F.col("order_id") * 4 + 2)
    )
    t0 = time.perf_counter()
    latest_per_key(ev, ["order_id"], lsn_col="lsn", lsn_is_text=False).filter(
        F.col("op") != "d"
    ).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def t_recon(spark, d):
    o = spark.read.parquet(f"{d}/orders.parquet").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("v"),
        "o_orderstatus",
    )
    tgt = o.filter(F.col("k") % 97 != 0)
    t0 = time.perf_counter()
    diff_by_hash(o, tgt, ["k"]).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def t_skew(spark):
    """Big-big shuffle join with one 90%-hot key; broadcast disabled so the
    shuffle actually happens (with a broadcastable side, broadcast is always
    the first answer to skew — salting is for big-big)."""
    n = 4_000_000
    skewed = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(2_000_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim_v")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        t0 = time.perf_counter()
        skewed.join(dim, "k").agg(F.count("*")).collect()
        plain = time.perf_counter() - t0

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        t0 = time.perf_counter()
        skewed.join(dim, "k").agg(F.count("*")).collect()
        aqe = time.perf_counter() - t0

        t0 = time.perf_counter()
        salted_join(skewed, dim, "k", n_salts=16).agg(F.count("*")).collect()
        salted = time.perf_counter() - t0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    return plain, aqe, salted


def main():
    spark = get_spark(app_name="scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    build_10x(spark)
    spark.read.parquet(f"{SF1}/lineitem.parquet").count()  # warm

    print(f"{'plan':<22}{'1x (s)':>9}{'10x (s)':>9}{'ratio':>7}")
    for name, fn in [("pricing_summary_agg", t_pricing), ("cdc_latest_per_key", t_apply), ("recon_hash_diff", t_recon)]:
        t1 = min(fn(spark, SF1) for _ in range(2))
        t10 = min(fn(spark, TENX) for _ in range(2))
        print(f"{name:<22}{t1:>9.2f}{t10:>9.2f}{t10 / t1:>7.1f}")

    te, tf = t_cosine_paths(spark)
    print(f"cosine 128x2000x64: sql_fold={te:.2f}s pandas_udf={tf:.2f}s ({te / tf:.1f}x)")

    plain, aqe, salted = t_skew(spark)
    print(
        f"skew_join 90%-hot-key big-big (no broadcast): "
        f"plain(noAQE)={plain:.2f}s AQE-skew-split={aqe:.2f}s salted(16)={salted:.2f}s"
    )
    spark.stop()


def t_cosine_paths(spark):
    """Exact SQL-fold vs vectorized pandas-UDF cosine, 128 queries x 2000 corpus x 64 dims (256k pairs)."""
    import math

    from postgres_cdc_reconciliation_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_fast,
    )

    n, d = 2000, 64
    rows = [
        (i, [math.sin(0.1 * i + 0.37 * j) for j in range(d)], i % 8)
        for i in range(n)
    ]
    v = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int").cache()
    v.count()
    q = v.filter(F.col("vec_id") < 128)
    t_exact = min(
        _timed(lambda: cosine_topk(q, v, k=5).write.format("noop").mode("overwrite").save())
        for _ in range(2)
    )
    t_fast = min(
        _timed(lambda: cosine_topk_fast(q, v, k=5).write.format("noop").mode("overwrite").save())
        for _ in range(2)
    )
    v.unpersist()
    return t_exact, t_fast


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
