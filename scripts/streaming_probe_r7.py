#!/usr/bin/env python
"""Round-7 streaming scale probe (VERDICT r6 #6): bounded-state evidence
for the streaming tier beyond functional-scale e2e tests.

Probe A — dedup_stream trajectory: feed documents in FIXED-SIZE micro-
batches (500 docs/file, maxFilesPerTrigger=1) while the persisted band
index grows from 0 to 50k docs (the sf1 corpus). Pass = per-batch latency
FLAT as the index grows 100x (the O(|batch| + matched buckets) claim —
probing is an equality join against an index whose per-bucket hit set is
bounded, never a corpus rescan). The on-disk index grows linearly (it IS
the corpus fingerprint — external state, reported for completeness).

Probe B — watermark-bounded stream-stream join: orders x payments within
a +1h event-time bound, both sides watermarked 2h, fed as 20 time-ordered
files spanning 40h of event time (one 2h slice per micro-batch) at 1x and
10x event RATE. Pass = the state store's numRowsTotal PLATEAUS (watermark
eviction keeps state = rate x bounded-window, independent of stream
length) and per-batch latency stays flat across the run at both rates.

Results -> SCALING.md. Usage: python scripts/streaming_probe_r7.py
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgres_cdc_reconciliation_spark.session import get_spark  # noqa: E402

SF1_DOCS = "/tmp/pcr_sf1/documents.parquet"
WORK = "/tmp/pcr_stream_probe_r7"


def probe_dedup_stream(spark) -> None:
    from postgres_cdc_reconciliation_spark.streaming.dedup import dedup_stream

    root = f"{WORK}/dedup"
    shutil.rmtree(root, ignore_errors=True)
    src = f"{root}/in"
    os.makedirs(src)
    docs = (
        spark.read.parquet(SF1_DOCS)
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    )
    batch_size = 500
    files = [docs[i : i + batch_size] for i in range(0, len(docs), batch_size)]
    print(f"dedup_stream: {len(files)} batches x {batch_size} docs")
    for j, rows in enumerate(files):
        with open(f"{src}/b{j:04d}.json", "w") as f:
            for r in rows:
                f.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
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
    q.awaitTermination(1800)
    prog = q.recentProgress
    durs = [
        (p["batchId"], p["batchDuration"] / 1000.0)
        for p in prog
        if p.get("numInputRows", 0) > 0
    ]
    head = [d for _, d in durs[1:11]]
    tail = [d for _, d in durs[-10:]]
    idx_bytes = sum(
        os.path.getsize(os.path.join(dp, fn))
        for dp, _, fns in os.walk(f"{root}/index")
        for fn in fns
    )
    print(
        f"dedup_stream batches={len(durs)} "
        f"median batch sec: first10={statistics.median(head):.2f} "
        f"last10={statistics.median(tail):.2f} "
        f"ratio={statistics.median(tail)/statistics.median(head):.2f} "
        f"index={idx_bytes/1e6:.1f}MB"
    )


def probe_watermark_join(spark, rate_mult: int) -> None:
    root = f"{WORK}/join_{rate_mult}x"
    shutil.rmtree(root, ignore_errors=True)
    odir, pdir = f"{root}/orders", f"{root}/pays"
    os.makedirs(odir), os.makedirs(pdir)
    base = 1_700_000_000  # epoch seconds
    n_files = 20
    per_file = 5_000 * rate_mult  # events per 2h slice
    eid = 0
    for j in range(n_files):
        t0 = base + j * 7200
        with open(f"{odir}/o{j:03d}.json", "w") as fo, open(
            f"{pdir}/p{j:03d}.json", "w"
        ) as fp:
            for i in range(per_file):
                ts = t0 + (i * 7200) // per_file
                fo.write(json.dumps({"oid": eid, "ots": ts, "amt": 1.0}) + "\n")
                # 2/3 of payments inside the +1h bound, 1/3 outside
                delta = 1800 if eid % 3 else 5400
                fp.write(json.dumps({"oid": eid, "pts": ts + delta}) + "\n")
                eid += 1

    def _s(path, tcol):
        return (
            spark.readStream.schema(f"oid long, {tcol} long, amt double"
                                    if tcol == "ots" else f"oid long, {tcol} long")
            .option("maxFilesPerTrigger", 1)
            .json(path)
            .withColumn(tcol, F.col(tcol).cast("timestamp"))
            .withWatermark(tcol, "2 hours")
        )

    orders, pays = _s(odir, "ots"), _s(pdir, "pts")
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
        .option("path", f"{root}/out")
        .option("checkpointLocation", f"{root}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(1800)
    prog = [p for p in q.recentProgress if p.get("numInputRows", 0) > 0]
    state = [
        (p["batchId"], p["stateOperators"][0]["numRowsTotal"],
         p["batchDuration"] / 1000.0)
        for p in prog
        if p.get("stateOperators")
    ]
    rows_out = spark.read.parquet(f"{root}/out").count()
    mid = len(state) // 2
    print(
        f"wm-join {rate_mult}x: batches={len(state)} out={rows_out} "
        f"state rows mid={state[mid][1]} last={state[-1][1]} "
        f"peak={max(s for _, s, _ in state)} "
        f"median batch sec first-half="
        f"{statistics.median(d for _, _, d in state[1:mid]):.2f} "
        f"second-half={statistics.median(d for _, _, d in state[mid:]):.2f}"
    )


def main() -> None:
    spark = get_spark(app_name="streaming-probe-r7")
    # default retention is ~100 progress updates — probe A produces 100+
    # batches, so without this the "first10" baseline would silently read
    # EVICTED (wrong) entries once the run exceeds the buffer
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "300")
    which = set(sys.argv[1:]) or {"dedup", "join1", "join10"}
    if "dedup" in which:
        probe_dedup_stream(spark)
    if "join1" in which:
        probe_watermark_join(spark, 1)
    if "join10" in which:
        probe_watermark_join(spark, 10)
    spark.stop()


if __name__ == "__main__":
    main()
