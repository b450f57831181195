"""Stream-stream joins, dedup-within-watermark, malformed-envelope
resilience — the remaining Structured Streaming surface."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.sources.cdc import parse_stream, unwrap


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_stream_join_with_watermarks(spark, tmp_path):
    """orders-stream ⋈ payments-stream on key within a ±1h event-time bound
    (state-bounded by both watermarks)."""
    odir, pdir = tmp_path / "orders_s", tmp_path / "pays_s"
    odir.mkdir(), pdir.mkdir()
    _write(odir / "o.json", [
        {"oid": 1, "ots": "2024-01-01 10:00:00", "amt": 10.0},
        {"oid": 2, "ots": "2024-01-01 10:30:00", "amt": 20.0},
        {"oid": 3, "ots": "2024-01-01 12:00:00", "amt": 30.0},
    ])
    _write(pdir / "p.json", [
        {"oid": 1, "pts": "2024-01-01 10:20:00"},  # within 1h of order 1
        {"oid": 2, "pts": "2024-01-01 13:00:00"},  # too late for order 2
        {"oid": 3, "pts": "2024-01-01 12:30:00"},  # within 1h of order 3
    ])
    orders = (
        spark.readStream.schema("oid long, ots string, amt double")
        .json(str(odir))
        .withColumn("ots", F.col("ots").cast("timestamp"))
        .withWatermark("ots", "2 hours")
    )
    pays = (
        spark.readStream.schema("oid long, pts string")
        .json(str(pdir))
        .withColumn("pts", F.col("pts").cast("timestamp"))
        .withWatermark("pts", "2 hours")
    )
    joined = orders.join(
        pays,
        (orders.oid == pays.oid)
        & (pays.pts >= orders.ots)
        & (pays.pts <= F.expr("ots + INTERVAL 1 HOUR")),
        "inner",
    )
    q = (
        joined.select(orders.oid, "amt", "ots", "pts")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["oid"] for r in spark.read.parquet(str(tmp_path / "out")).collect())
    assert got == [1, 3]  # order 2's payment fell outside the join bound


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """at-least-once transport dedup: same event id delivered twice within
    the watermark window is emitted once."""
    src = tmp_path / "dups_in"
    src.mkdir()
    _write(src / "a.json", [
        {"eid": 1, "ts": "2024-01-01 10:00:00", "v": 1.0},
        {"eid": 2, "ts": "2024-01-01 10:01:00", "v": 2.0},
    ])
    _write(src / "b.json", [
        {"eid": 1, "ts": "2024-01-01 10:00:00", "v": 1.0},  # redelivery
        {"eid": 3, "ts": "2024-01-01 10:05:00", "v": 3.0},
    ])
    stream = (
        spark.readStream.schema("eid long, ts string, v double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["eid"])
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(str(tmp_path / "out")).collect()
    assert sorted(r["eid"] for r in rows) == [1, 2, 3]


def test_malformed_envelope_survives_parse(spark):
    """Garbage change-event payloads must not kill the pipeline: from_json
    yields null envelope → treated like a tombstone and dropped by unwrap."""
    raw = spark.createDataFrame(
        [
            ("1", '{"op":"c","after":{"order_id":1,"customer_id":1,'
                  '"amount":"5.00","ts":"2026-01-01 00:00:00","batch_id":0},'
                  '"source":{"lsn":"0/1","txId":1,"ts_ms":1,"schema":"public","table":"orders"}}'),
            ("2", "this is not json at all {{{"),
            ("3", '{"op": 12345}'),  # wrong type for op
            ("4", None),  # tombstone
        ],
        "key string, value string",
    )
    flat = unwrap(parse_stream(raw))
    rows = flat.collect()
    assert [r["order_id"] for r in rows] == [1]  # only the valid event
