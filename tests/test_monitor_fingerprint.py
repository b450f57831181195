"""Streaming e2e for the fingerprint monitor (VERDICT r5 #5): a live
apply pipeline checked per poll with the O(buckets) bucket-checksum pass
instead of the reference's count + full row compare
(verify_replication.py:148-167). A mid-stream divergence must be flagged
as EXACTLY the touched bucket, and the check must converge once the
missing change event is applied."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.operators.apply import (
    apply_stream,
    bucket_expr,
    read_target,
)
from postgres_cdc_reconciliation_spark.sources.cdc import (
    parse_stream,
    read_cdc_stream,
    unwrap,
)
from postgres_cdc_reconciliation_spark.streaming.monitor import (
    fingerprint_check,
    wait_fingerprint_match,
)

N_BUCKETS = 8


def _env(op, before, after, lsn):
    return {
        "op": op,
        "before": before,
        "after": after,
        "source": {
            "lsn": lsn,
            "txId": 1,
            "ts_ms": 1700000000000,
            "schema": "public",
            "table": "orders",
        },
    }


def _row(oid, amount):
    return {
        "order_id": oid,
        "customer_id": oid % 10,
        "amount": f"{amount:.2f}",
        "ts": "2026-01-01 00:00:00",
        "batch_id": 0,
    }


def _run_available(spark, src, target, ckpt):
    q = (
        apply_stream(
            unwrap(parse_stream(read_cdc_stream(spark, file_path=str(src)))),
            target,
            ["order_id"],
            ckpt,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_fingerprint_monitor_flags_exact_bucket_then_converges(spark, tmp_path):
    src = tmp_path / "stream_in"
    src.mkdir()
    with open(src / "batch1.json", "w") as f:
        for i in range(1, 9):
            f.write(
                json.dumps(
                    {
                        "key": str(i),
                        "value": json.dumps(
                            _env("r", None, _row(i, i * 10.0), f"0/{i:X}")
                        ),
                    }
                )
                + "\n"
            )

    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    _run_available(spark, src, target, ckpt)

    # source of truth: the target's eventual state — key 2 already updated
    # upstream, but the update event hasn't reached the stream yet
    applied = read_target(spark, target)
    expected = applied.withColumn(
        "amount",
        F.when(
            F.col("order_id") == 2,
            F.lit("22.00").cast(applied.schema["amount"].dataType),
        ).otherwise(
            F.col("amount")
        ),
    )
    src_table = str(tmp_path / "src_table")
    expected.write.parquet(src_table)

    def src_fn():
        return spark.read.parquet(src_table)

    def tgt_fn():
        return read_target(spark, target)

    # divergence: exactly key 2's bucket (same bucket expression the
    # target layout uses), nothing else
    key2_bucket = (
        src_fn()
        .filter(F.col("order_id") == 2)
        .select(bucket_expr(["order_id"], N_BUCKETS).cast("long").alias("b"))
        .collect()[0]["b"]
    )
    bad = fingerprint_check(src_fn, tgt_fn, ["order_id"], n_buckets=N_BUCKETS)
    assert bad == [key2_bucket]

    # a poll loop that times out before the fix arrives reports the
    # still-divergent bucket
    t = {"now": 0.0}

    def sleep(s):
        t["now"] += s

    ok, last_bad = wait_fingerprint_match(
        src_fn,
        tgt_fn,
        ["order_id"],
        n_buckets=N_BUCKETS,
        timeout_s=15,
        interval_s=10,
        clock=lambda: t["now"],
        sleep=sleep,
    )
    assert not ok and last_bad == [key2_bucket]


def test_fingerprint_monitor_poll_converges_after_fix(spark, tmp_path):
    src = tmp_path / "stream_in"
    src.mkdir()
    with open(src / "batch1.json", "w") as f:
        for i in range(1, 9):
            f.write(
                json.dumps(
                    {
                        "key": str(i),
                        "value": json.dumps(
                            _env("r", None, _row(i, i * 10.0), f"0/{i:X}")
                        ),
                    }
                )
                + "\n"
            )
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    _run_available(spark, src, target, ckpt)

    applied = read_target(spark, target)
    expected = applied.withColumn(
        "amount",
        F.when(
            F.col("order_id") == 2,
            F.lit("22.00").cast(applied.schema["amount"].dataType),
        ).otherwise(
            F.col("amount")
        ),
    )
    src_table = str(tmp_path / "src_table")
    expected.write.parquet(src_table)

    def src_fn():
        return spark.read.parquet(src_table)

    def tgt_fn():
        return read_target(spark, target)

    # the poll's sleep doubles as "the pipeline catches up": the missing
    # update event lands and the stream applies it between polls
    def deliver_fix(_s):
        with open(src / "batch2.json", "w") as f:
            f.write(
                json.dumps(
                    {
                        "key": "2",
                        "value": json.dumps(
                            _env("u", _row(2, 20.0), _row(2, 22.0), "0/10")
                        ),
                    }
                )
                + "\n"
            )
        _run_available(spark, src, target, ckpt)

    t = {"now": 0.0}

    def sleep(s):
        t["now"] += s
        deliver_fix(s)

    ok, last_bad = wait_fingerprint_match(
        src_fn,
        tgt_fn,
        ["order_id"],
        n_buckets=N_BUCKETS,
        timeout_s=100,
        interval_s=10,
        clock=lambda: t["now"],
        sleep=sleep,
    )
    assert ok and last_bad == []
    # and the target really converged (row-level ground truth)
    final = {
        r["order_id"]: float(r["amount"]) for r in tgt_fn().collect()
    }
    assert final[2] == 22.0
