"""Custom stateful streaming operators: state survives across micro-batches."""

from __future__ import annotations

import json

from postgres_cdc_reconciliation_spark.streaming.stateful import (
    first_seen_dedup,
    running_counter,
)


def _write_batch(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_first_seen_dedup_across_batches(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write_batch(src / "b1.json", [
        {"k": "a", "v": 1}, {"k": "b", "v": 2}, {"k": "a", "v": 3},
    ])
    _write_batch(src / "b2.json", [
        {"k": "b", "v": 4}, {"k": "c", "v": 5},
    ])
    stream = (
        spark.readStream.schema("k string, v long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = first_seen_dedup(stream.groupBy("k"), "k", "k string, v long")
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["k"]: r["v"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    # each key exactly once; 'b' from batch1 (first seen), not batch2
    assert set(rows) == {"a", "b", "c"}
    assert rows["b"] == 2 and rows["c"] == 5


def test_running_counter_accumulates(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write_batch(src / "b1.json", [{"k": "t1", "v": 1}, {"k": "t1", "v": 2}])
    _write_batch(src / "b2.json", [{"k": "t1", "v": 3}, {"k": "t2", "v": 4}])
    stream = (
        spark.readStream.schema("k string, v long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = running_counter(
        stream.groupBy("k"), "k", "k string, batch_events long, total_events long"
    )
    rows = []

    def sink(df, bid):
        rows.extend(r.asDict() for r in df.collect())

    q = (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    t1 = [r["total_events"] for r in rows if r["k"] == "t1"]
    assert sorted(t1) == [2, 3]  # 2 after batch1, 3 after batch2 (state carried)
    assert [r["total_events"] for r in rows if r["k"] == "t2"] == [1]


def test_transform_with_state_running_totals(spark, tmp_path):
    # transformWithState's state-server protocol is protobuf-based; the
    # operator is env-gated exactly like the Kafka/JDBC paths when the
    # runtime lacks google.protobuf.
    import pytest

    pytest.importorskip("google.protobuf")
    from postgres_cdc_reconciliation_spark.streaming.stateful import (
        running_totals_tws,
    )

    # transformWithState requires the RocksDB state store provider
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    src = tmp_path / "tws_in"
    src.mkdir()
    _write_batch(src / "b1.json", [
        {"k": "a", "v": 1}, {"k": "b", "v": 2}, {"k": "a", "v": 3},
    ])
    _write_batch(src / "b2.json", [
        {"k": "a", "v": 10}, {"k": "c", "v": 5},
    ])
    stream = (
        spark.readStream.schema("k string, v long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = running_totals_tws(stream.groupBy("k"), "k", "v")
    q = (
        out.writeStream.format("memory")
        .queryName("tws_totals")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM tws_totals"
    ).collect()
    # last emission per key reflects cross-batch state
    latest = {}
    for r in rows:
        latest[r["k"]] = (r["total_events"], r["total_value"])
    assert latest["a"] == (3, 14.0)   # 2 events batch1 + 1 event batch2
    assert latest["b"] == (1, 2.0)
    assert latest["c"] == (1, 5.0)
    if prev is None:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    else:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_session_aggregate_gap_and_timeout(spark, tmp_path):
    """Sessions close on in-data gaps AND on watermark timeout; still-open
    sessions are not emitted."""
    from postgres_cdc_reconciliation_spark.streaming.stateful import (
        session_aggregate,
    )

    src = tmp_path / "in"
    src.mkdir()
    # gap = 60s. A: two events 30s apart (one session), then one at +120s
    # (gap 90s -> closes the first). B appears late; its lone session stays
    # open except A's second session times out as B advances the watermark.
    import os as _os

    _write_batch(src / "b1.json", [
        {"k": "A", "ts": "2026-01-01 00:00:00", "v": 1.0},
        {"k": "A", "ts": "2026-01-01 00:00:30", "v": 2.0},
    ])
    _write_batch(src / "b2.json", [{"k": "A", "ts": "2026-01-01 00:02:00", "v": 4.0}])
    _write_batch(src / "b3.json", [{"k": "B", "ts": "2026-01-01 00:10:00", "v": 8.0}])
    _write_batch(src / "b4.json", [{"k": "B", "ts": "2026-01-01 00:20:00", "v": 16.0}])
    # the file source orders micro-batches by modification time — same-second
    # mtimes would arrive in arbitrary order, so pin them explicitly
    for i, name in enumerate(["b1.json", "b2.json", "b3.json", "b4.json"]):
        t = 1700000000 + i * 10
        _os.utime(src / name, (t, t))

    stream = (
        spark.readStream.schema("k string, ts timestamp, v double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withWatermark("ts", "0 seconds")
    )
    out = session_aggregate(stream.groupBy("k"), "k", "ts", "v", gap_seconds=60)
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = sorted(
        (
            (r["k"], r["n_events"], r["total_value"],
             r["session_end"].second - r["session_start"].second)
            for r in spark.read.parquet(str(tmp_path / "out")).collect()
        )
    )
    # A's first session: 2 events, 30s span, closed by the in-data gap.
    # A's second: 1 event, closed by watermark timeout (B pushed the clock).
    a_sessions = [r for r in rows if r[0] == "A"]
    assert a_sessions == [("A", 1, 4.0, 0), ("A", 2, 3.0, 30)]
    # B's 00:10 session closes via the in-data gap when 00:20 arrives; the
    # 00:20 session is still open at shutdown and must NOT be emitted
    b_sessions = [r for r in rows if r[0] == "B"]
    assert b_sessions == [("B", 1, 8.0, 0)]
