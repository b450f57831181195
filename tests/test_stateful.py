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
