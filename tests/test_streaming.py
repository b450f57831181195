"""Streaming e2e: file-source change stream → parse → unwrap → apply →
frontier (SURVEY.md §2.9 T1-T6; golden scenario of docs/getting_started.md
reproduced deterministically in FIXTURES.md §7 spirit)."""

from __future__ import annotations

import json

from postgres_cdc_reconciliation_spark.operators.apply import apply_stream
from postgres_cdc_reconciliation_spark.sources.cdc import (
    parse_stream,
    read_cdc_stream,
    unwrap,
)
from postgres_cdc_reconciliation_spark.streaming.frontier import current_frontier


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


def test_stream_apply_and_frontier(spark, tmp_path):
    src = tmp_path / "stream_in"
    src.mkdir()
    # micro-batch 1: snapshot-style inserts (T4), one per key
    with open(src / "batch1.json", "w") as f:
        for i in range(1, 6):
            f.write(
                json.dumps(
                    {"key": str(i), "value": json.dumps(_env("r", None, _row(i, i * 10.0), f"0/{i:X}"))}
                )
                + "\n"
            )
    # micro-batch 2: update key 2, delete key 3 (arrives later)
    with open(src / "batch2.json", "w") as f:
        f.write(
            json.dumps({"key": "2", "value": json.dumps(_env("u", _row(2, 20.0), _row(2, 22.0), "0/10"))})
            + "\n"
        )
        f.write(
            json.dumps({"key": "3", "value": json.dumps(_env("d", _row(3, 30.0), None, "0/11"))})
            + "\n"
        )

    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    frontier = str(tmp_path / "frontier")

    raw = read_cdc_stream(spark, file_path=str(src))
    flat = unwrap(parse_stream(raw))
    q = apply_stream(flat, target, ["order_id"], ckpt, frontier_path=frontier).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)

    final = {
        r["order_id"]: float(r["amount"])
        for r in spark.read.parquet(target).collect()
    }
    assert final == {1: 10.0, 2: 22.0, 4: 40.0, 5: 50.0}  # 3 deleted, 2 updated

    f = current_frontier(spark, frontier).collect()[0]
    assert f["frontier_lsn_long"] == 0x11  # delete at 0/11 is the max applied
    assert f["frontier_lsn"] == "0/11"

    # restart with no new data: checkpoint resumes, target unchanged (T1)
    q2 = apply_stream(
        unwrap(parse_stream(read_cdc_stream(spark, file_path=str(src)))),
        target,
        ["order_id"],
        ckpt,
        frontier_path=frontier,
    ).trigger(availableNow=True).start()
    q2.awaitTermination(120)
    final2 = {
        r["order_id"]: float(r["amount"])
        for r in spark.read.parquet(target).collect()
    }
    assert final2 == final


def test_snapshot_then_stream(spark, tmp_path):
    """T4: snapshot backfill, then the incremental stream applies on top."""
    from postgres_cdc_reconciliation_spark.engine import Engine

    eng = Engine(spark)
    target = str(tmp_path / "target2")
    snapshot = spark.createDataFrame(
        [(i, i % 10, f"{i * 10.0:.2f}", None, 0) for i in range(1, 4)],
        "order_id long, customer_id int, amount string, ts timestamp_ntz, batch_id long",
    )
    eng.snapshot_backfill(snapshot, target)
    assert spark.read.parquet(target).count() == 3

    src = tmp_path / "inc_in"
    src.mkdir()
    with open(src / "inc.json", "w") as f:
        f.write(
            json.dumps({"key": "1", "value": json.dumps(_env("u", _row(1, 10.0), _row(1, 99.0), "0/20"))})
            + "\n"
        )
        f.write(
            json.dumps({"key": "2", "value": json.dumps(_env("d", _row(2, 20.0), None, "0/21"))})
            + "\n"
        )
    q = eng.start_cdc_pipeline(
        target, ["order_id"], str(tmp_path / "ckpt2"),
        file_path=str(src), trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    final = {
        r["order_id"]: float(r["amount"])
        for r in spark.read.parquet(target).collect()
    }
    assert final == {1: 99.0, 3: 30.0}  # 1 updated over snapshot, 2 deleted
