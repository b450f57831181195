#!/usr/bin/env python
"""Round-4 scaling probe: lakehouse commit protocol + streaming dedup.

Measures, at 1x (sf0.1) and 10x (replicated with shifted keys):

1. manifest full v0 commit (the O(target) operation, for reference)
2. incremental commit of a delta confined to 2 of 64 buckets
   (read touched buckets -> apply_batch -> commit_delta) — the steady-state
   micro-batch shape, claimed O(touched buckets)
3. snapshot_changes(v0 -> v1) — claimed O(changed buckets) via manifest
   pruning
4. schema-evolution apply_batch plan (documented O(target): DDL-rare full
   alignment)
5. streaming dedup: one fixed ~500-doc micro-batch probed against a
   committed LSH band index of a 1x vs 10x corpus (claimed O(batch))

Usage: python scripts/scaling_probe_r4.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgres_cdc_reconciliation_spark.operators.apply import (  # noqa: E402
    apply_batch,
    bucket_expr,
)
from postgres_cdc_reconciliation_spark.operators.manifest_target import (  # noqa: E402
    commit_delta,
    read_buckets,
    snapshot_changes,
)
from postgres_cdc_reconciliation_spark.session import get_spark  # noqa: E402

SF1 = "/root/testdata/sf0.1"
N_BUCKETS = 64


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.2f}s")
    return out, dt


def orders_at(spark, mult: int):
    base = spark.read.parquet(f"{SF1}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    if mult == 1:
        return base
    reps = spark.range(mult).withColumnRenamed("id", "_rep")
    return (
        base.crossJoin(reps)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("_rep") * 10_000_000)
        .drop("_rep")
    )


def probe_manifest(spark, mult: int):
    print(f"manifest target, {mult}x orders ({150_000 * mult} rows):")
    root = tempfile.mkdtemp(prefix=f"pcr_probe_m{mult}_")
    try:
        orders = orders_at(spark, mult).localCheckpoint()
        _, t_full = timed(
            "v0 full commit (O(target))",
            lambda: commit_delta(
                orders, root, ["o_orderkey"], list(range(N_BUCKETS)), N_BUCKETS
            ),
        )

        # delta confined to buckets {0, 1}: the steady-state micro-batch
        delta_src = orders.filter(
            bucket_expr(["o_orderkey"], N_BUCKETS).isin([0, 1])
        ).limit(1000)
        events = delta_src.select(
            "o_orderkey",
            "o_custkey",
            (F.col("o_totalprice") + 1.0).alias("o_totalprice"),
            F.lit("u").alias("op"),
            F.lit("0/FF").alias("source_lsn"),
        ).localCheckpoint()

        def incr():
            prev = read_buckets(spark, root, [0, 1])
            merged = apply_batch(prev, events, ["o_orderkey"]).localCheckpoint(
                eager=True
            )
            return commit_delta(merged, root, ["o_orderkey"], [0, 1], N_BUCKETS)

        _, t_incr = timed("incremental commit, 2/64 buckets (O(touched))", incr)
        _, t_cdf = timed(
            "snapshot_changes v0->v1 (O(changed buckets))",
            lambda: snapshot_changes(spark, root, ["o_orderkey"], 0, 1)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
        return t_full, t_incr, t_cdf
    finally:
        shutil.rmtree(root, ignore_errors=True)


def probe_schema_evolution(spark, mult: int):
    orders = orders_at(spark, mult).localCheckpoint()
    key = F.col("o_orderkey")
    target = orders.filter(key % 3 == 0)
    events = (
        orders.filter((key % 4 == 0) | (key % 9 == 0))
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(10.0))
        .withColumn("o_note", F.concat(F.lit("n"), (key % 7).cast("string")))
        .withColumn("op", F.when(key % 9 == 0, F.lit("d")).otherwise(F.lit("u")))
        .withColumn("source_lsn", F.lit("0/1000"))
    )
    timed(
        f"schema-evolution apply plan, {mult}x",
        lambda: apply_batch(
            target, events, ["o_orderkey"], drop_cols=("op", "source_lsn"),
            evolve_schema=True,
        )
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )


def probe_streaming_dedup(spark, mult: int):
    from postgres_cdc_reconciliation_spark.operators.dedup import lsh_band_index

    print(f"streaming dedup, {mult}x corpus ({5_000 * mult} docs):")
    root = tempfile.mkdtemp(prefix=f"pcr_probe_sd{mult}_")
    try:
        docs = spark.read.parquet(f"{SF1}/documents.parquet").select(
            "doc_id", "text"
        )
        if mult > 1:
            reps = spark.range(mult).withColumnRenamed("id", "_rep")
            docs = (
                docs.crossJoin(reps)
                .withColumn("doc_id", F.col("doc_id") + F.col("_rep") * 10_000_000)
                # perturb replicas so they are near-dups, not exact clones
                .withColumn(
                    "text",
                    F.concat(F.col("text"), F.lit(" r"), F.col("_rep").cast("string")),
                )
                .drop("_rep")
            )
        # committed index = whole corpus (built once, untimed). Seeded at
        # batch=-1: stream micro-batch ids start at 0 and the stream
        # excludes its own batch's partition when probing (replay safety),
        # so a seed at batch=0 would be invisible to the first micro-batch.
        idx = lsh_band_index(docs)
        idx.write.mode("overwrite").parquet(f"{root}/index/batch=-1")
        # fixed micro-batch: 500 fresh docs derived from the corpus head
        batch = (
            spark.read.parquet(f"{SF1}/documents.parquet")
            .select("doc_id", "text")
            .limit(500)
            .withColumn("doc_id", F.col("doc_id") + 90_000_000)
        )
        batch.write.mode("overwrite").parquet(f"{root}/incoming")

        from postgres_cdc_reconciliation_spark.streaming.dedup import dedup_stream

        def run():
            stream = spark.readStream.schema(batch.schema).parquet(f"{root}/incoming")
            q = (
                dedup_stream(
                    stream,
                    f"{root}/index",
                    f"{root}/hits",
                    f"{root}/ckpt",
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return spark.read.parquet(f"{root}/hits").count()

        hits, _ = timed("one 500-doc micro-batch (probe + admit)", run)
        print(f"  hits: {hits}")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main():
    spark = get_spark(app_name="pcr-scaling-r4", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF1}/orders.parquet").count()  # warm up
    for mult in (1, 10):
        probe_manifest(spark, mult)
    for mult in (1, 10):
        probe_schema_evolution(spark, mult)
    for mult in (1, 10):
        probe_streaming_dedup(spark, mult)
    spark.stop()


if __name__ == "__main__":
    main()
