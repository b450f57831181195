#!/usr/bin/env python
"""Round-9 apply-path scale probe (VERDICT r7 #6): the CDC apply hot loop
at a 100x-shape workload — ~6M events through apply_stream's MANIFEST
protocol — recording events/s and the per-batch latency trajectory.

Two regimes, matching the two scale claims in apply_stream's docstring:

Probe A — DENSE feed: 20 micro-batches x 300k events (6M total) over a
fixed 600k-key space (10 events/key/batch -> latest_per_key collapses
300k -> 30k upserts per batch), n_buckets=64. Keys hash into every
bucket, so each batch merges the whole steady-state target — the honest
dense-churn shape. Pass = per-batch latency FLAT once the key space
saturates (batches 1-2 grow the target; 3+ are pure churn), plus a
headline events/s through the full merge + manifest-commit path.

Probe B — SPARSE feed (touched-bucket pruning): target prebuilt with
600k keys at n_buckets=256, then 30 micro-batches x 4,096 events over 32
revolving hot keys each (~128 versions/key — hot-entity churn). 32 keys
touch <= 32 of 256 buckets, so per-batch work must be O(touched bucket
content), NOT O(target): pass = flat per-batch latency well under the
dense regime's, while the target stays 600k rows throughout.

Results -> SCALING.md. Usage: python scripts/apply_probe_r9.py
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgres_cdc_reconciliation_spark.session import get_spark  # noqa: E402

WORK = "/tmp/pcr_apply_probe_r9"

EVENT_SCHEMA = (
    "order_id long, customer_id long, amount string, op string, "
    "source_lsn string, ts_ms long, __deleted string"
)


def _gen_batch(spark, j: int, n_events: int, key_expr: str):
    """One micro-batch of synthetic unwrapped CDC events. LSN = 'J/ID' hex
    (monotone across batches, unique within); ~5% deletes."""
    return spark.range(n_events).select(
        F.expr(key_expr).alias("order_id"),
        (F.col("id") % 1000).alias("customer_id"),
        F.format_string("%d.00", F.col("id") % 500).alias("amount"),
        F.when(F.col("id") % 20 == 7, F.lit("d")).otherwise(F.lit("u")).alias("op"),
        F.format_string("%X/%X", F.lit(j + 1), F.col("id")).alias("source_lsn"),
        (F.lit(1700000000000) + F.col("id")).alias("ts_ms"),
        F.lit(None).cast("string").alias("__deleted"),
    )


def _run_stream(spark, src: str, target: str, ckpt: str, n_buckets: int):
    from postgres_cdc_reconciliation_spark.operators.apply import apply_stream

    feed = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        apply_stream(feed, target, ["order_id"], ckpt,
                     n_buckets=n_buckets, protocol="manifest")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(3600)
    prog = [
        (int(p.numInputRows), float(p.durationMs["triggerExecution"]) / 1000.0)
        for p in q.recentProgress
        if int(p.numInputRows) > 0
    ]
    return prog


def _report(tag: str, prog, t_wall: float):
    events = sum(r for r, _ in prog)
    lat = [s for _, s in prog]
    head = statistics.mean(lat[2:7]) if len(lat) > 7 else statistics.mean(lat)
    tail = statistics.mean(lat[-5:])
    print(f"{tag}: batches={len(lat)} events={events} wall={t_wall:.1f}s "
          f"events/s={events / t_wall:,.0f} "
          f"per-batch head(3..7)={head:.2f}s tail(last5)={tail:.2f}s "
          f"tail/head={tail / head:.2f}")
    print(f"{tag} trajectory: " + " ".join(f"{s:.2f}" for s in lat))
    return tail / head


def probe_dense(spark) -> None:
    root = f"{WORK}/dense"
    shutil.rmtree(root, ignore_errors=True)
    src = f"{root}/in"
    os.makedirs(src)
    n_batches, per_batch, key_space = 20, 300_000, 600_000
    for j in range(n_batches):
        # 30k distinct keys/batch, 10 versions each, key space revolves so
        # after 2 batches every bucket is steady-state churn
        _gen_batch(
            spark, j, per_batch,
            f"pmod(xxhash64(id + {j * 7919}), {key_space})",
        ).coalesce(1).write.mode("append").parquet(src)
    t0 = time.time()
    prog = _run_stream(spark, src, f"{root}/target", f"{root}/ck", 64)
    ratio = _report("dense 6M/64bk", prog, time.time() - t0)
    from postgres_cdc_reconciliation_spark.operators.manifest_target import (
        read_snapshot,
    )

    n = read_snapshot(spark, f"{root}/target").count()
    print(f"dense final target rows: {n}")
    assert ratio < 2.0, f"dense per-batch trajectory grew: {ratio:.2f}"


def probe_sparse(spark) -> None:
    from postgres_cdc_reconciliation_spark.operators.manifest_target import (
        commit_delta,
        read_snapshot,
    )

    root = f"{WORK}/sparse"
    shutil.rmtree(root, ignore_errors=True)
    src = f"{root}/in"
    os.makedirs(src)
    target = f"{root}/target"
    n_buckets, key_space = 256, 600_000
    # prebuilt 600k-row target (the '100x' resident state)
    base = spark.range(key_space).select(
        F.col("id").alias("order_id"),
        (F.col("id") % 1000).alias("customer_id"),
        F.lit("0.00").alias("amount"),
    )
    commit_delta(base, target, ["order_id"], list(range(n_buckets)), n_buckets)
    n_batches, per_batch = 30, 4_096
    for j in range(n_batches):
        # 32 revolving hot keys/batch -> touches <= 32 of 256 buckets
        _gen_batch(
            spark, j, per_batch,
            f"cast({(j * 37) % key_space} + pmod(id, 32) as bigint)",
        ).coalesce(1).write.mode("append").parquet(src)
    t0 = time.time()
    prog = _run_stream(spark, src, target, f"{root}/ck", n_buckets)
    ratio = _report("sparse 32key/256bk", prog, time.time() - t0)
    n = read_snapshot(spark, target).count()
    print(f"sparse final target rows: {n} (expected ~{key_space})")
    assert ratio < 2.0, f"sparse per-batch trajectory grew: {ratio:.2f}"


if __name__ == "__main__":
    spark = get_spark(app_name="apply-probe-r9")
    probe_dense(spark)
    probe_sparse(spark)
    print("apply probe r9 complete")
