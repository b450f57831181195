"""Streaming event-time windows with watermark (T12 streaming form):
tumbling-window aggregation over a file-sourced event stream, late rows
beyond the watermark dropped."""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def test_streaming_tumbling_watermark(spark, tmp_path):
    src = tmp_path / "ev_in"
    src.mkdir()
    rows1 = [
        {"event_id": 1, "ts": "2024-01-01 10:05:00", "user_id": 1, "value": 1.0},
        {"event_id": 2, "ts": "2024-01-01 10:20:00", "user_id": 1, "value": 2.0},
        {"event_id": 3, "ts": "2024-01-01 11:10:00", "user_id": 2, "value": 3.0},
        {"event_id": 4, "ts": "2024-01-01 13:00:00", "user_id": 2, "value": 4.0},
    ]
    # a very late event: far behind the watermark (13:00 - 1h), dropped
    rows2 = [
        {"event_id": 5, "ts": "2024-01-01 09:01:00", "user_id": 1, "value": 100.0},
    ]
    with open(src / "a.json", "w") as f:
        for r in rows1:
            f.write(json.dumps(r) + "\n")

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_available():
        stream = (
            spark.readStream.schema(
                "event_id long, ts string, user_id long, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total"),
            )
            .select(
                F.col("w.start").alias("ws"), "user_id", "n", "total"
            )
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_available()
    # append-mode emits only windows finalized by the watermark (< 12:00)
    got1 = {
        (r["ws"].hour, r["user_id"]): (r["n"], r["total"])
        for r in spark.read.parquet(out).collect()
    }
    assert got1 == {(10, 1): (2, 3.0), (11, 2): (1, 3.0)}

    # late event arrives; watermark at 12:00 → 09:00 window is closed, dropped
    with open(src / "b.json", "w") as f:
        for r in rows2:
            f.write(json.dumps(r) + "\n")
    run_available()
    got2 = spark.read.parquet(out)
    assert got2.filter(F.col("total") == 100.0).count() == 0
