#!/usr/bin/env python
"""Round-11 probe: (a) bloom-filter file skipping at growing table size,
(b) duplicated-span coverage at 1x/10x corpus.

Bloom claim under test: on a table range-clustered by TIME, a point probe
on the UNclustered key column opens O(files actually holding the key +
fpp x files) — the files-opened count must stay ~flat as the FILE COUNT
grows 4x (each file holds the key with equal probability, so matching
files stay ~constant while total files grow; a zone map opens everything
here because every file spans the full key range). Also measures stamp
cost (one column-pruned pass) and the false-positive rate against the
stamped fpp.

Span claim under test: duplicate_span_stats is linear in corpus tokens —
a replica-disjoint 10x corpus (per-replica token suffixing keeps
gram vocabularies disjoint across replicas, so true duplicated-gram
structure scales exactly 10x) must cost ~10x wall-clock, not gram-join
quadratic, and per-replica coverage must be identical to the 1x run.

Usage: python scripts/bloom_span_probe_r11.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgres_cdc_reconciliation_spark.operators.dedup import (  # noqa: E402
    duplicate_span_stats,
)
from postgres_cdc_reconciliation_spark.operators.layout import (  # noqa: E402
    read_point,
    stamp_bloom,
    write_range_clustered,
)
from postgres_cdc_reconciliation_spark.session import get_spark  # noqa: E402

ROOT = "/tmp/pcr_bloom_probe"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def bloom_probe(spark) -> None:
    print("== bloom file skipping vs table size ==")
    for n_files, n_rows in ((48, 1_500_000), (96, 3_000_000), (192, 6_000_000)):
        path = f"{ROOT}/t{n_files}"
        shutil.rmtree(path, ignore_errors=True)
        df = spark.range(n_rows).select(
            F.col("id").alias("ts_key"),
            ((F.col("id") * 7919) % n_rows).alias("uid"),
        )
        written = write_range_clustered(df, path, "ts_key", n_files=n_files)
        t0 = time.perf_counter()
        stamp_bloom(spark, path, ["uid"], fpp=0.01)
        stamp_s = time.perf_counter() - t0
        # 20 probes: 10 present keys, 10 absent; count files opened + rows
        opened_present, opened_absent, wrong = [], [], 0
        t0 = time.perf_counter()
        for i in range(10):
            out = read_point(spark, path, {"uid": (i * 37) % n_rows})
            opened_present.append(len(out.inputFiles()))
            if out.count() < 1:
                wrong += 1
        for i in range(10):
            out = read_point(spark, path, {"uid": n_rows + 1 + i})
            opened_absent.append(len(out.inputFiles()))
            if out.count() != 0:
                wrong += 1
        probe_s = time.perf_counter() - t0
        print(
            f"files={written:4d} rows={n_rows:9,d} stamp={stamp_s:6.2f}s "
            f"opened(present)={sum(opened_present)/10:5.2f} "
            f"opened(absent)={sum(opened_absent)/10:5.2f} "
            f"20probes={probe_s:6.2f}s wrong={wrong}"
        )


def span_probe(spark) -> None:
    print("== duplicated-span coverage at 1x/10x ==")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    n1 = docs.count()
    results = {}
    for mult in (1, 10):
        if mult == 1:
            corpus = docs
        else:
            # replica-disjoint: suffix every token with the replica id so
            # grams never collide across replicas -> true structure x10
            reps = spark.range(mult).select(F.col("id").alias("_r"))
            corpus = docs.crossJoin(reps).select(
                (F.col("doc_id") + F.col("_r") * 10_000_000).alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.split("text", " "),
                        lambda t: F.concat(
                            t, F.lit("_"), F.col("_r").cast("string")
                        ),
                    ),
                    " ",
                ).alias("text"),
            ).localCheckpoint()
        t0 = time.perf_counter()
        agg = duplicate_span_stats(corpus, k=8).agg(
            F.count("*").alias("docs"),
            F.sum("dup_tokens").alias("dup"),
            F.sum("n_tokens").alias("tok"),
        ).collect()[0]
        dt = time.perf_counter() - t0
        results[mult] = (dt, agg["docs"], agg["dup"], agg["tok"])
        print(
            f"x{mult:2d}: docs={agg['docs']:7,d} dup_tokens={agg['dup']:9,d} "
            f"tokens={agg['tok']:10,d} wall={dt:6.2f}s"
        )
    t1, d1, dup1, tok1 = results[1]
    t10, d10, dup10, tok10 = results[10]
    print(
        f"scale: time x{t10 / t1:.2f}, dup_tokens x{dup10 / dup1:.2f} "
        f"(exact 10x expected), docs x{d10 / d1:.2f}"
    )
    assert d10 == 10 * d1
    assert dup10 == 10 * dup1, "replica-disjoint coverage must scale exactly"


if __name__ == "__main__":
    spark = get_spark(app_name="bloom-span-probe", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    bloom_probe(spark)
    span_probe(spark)
    shutil.rmtree(ROOT, ignore_errors=True)
