#!/usr/bin/env python
"""Synthesize an sf1 corpus (10x sf0.1) at /tmp/pcr_sf1 for the round-7
full-registry bench sweep (VERDICT r6 #3).

Independent-copies discipline (scaling_probe_r5/r6): each copy k shifts
every fact-table key by k * 1e9 — one offset for ALL key families, large
enough that no cross-copy or cross-family aliasing is possible (the
1_000_000-offset used in early probes made copy-0 parts alias copy-1
suppliers through q_pagerank's dst = partkey + 1e6 vertex encoding).
Dimension tables (region, nation) stay fixed — copies share the 25
nations, exactly how a 10x-bigger TPC-H behaves. documents get per-copy
word suffixes (independent shingle spaces); embeddings get per-copy sign
flips and a SHIFTED label space (labels stay ~200/bucket — the
independent-corpora reading; the shared-label dense-mode shape is probed
separately by scaling_probe_r7.py).

Queries with literal id filters (vec_id < 16 etc.) keep hitting copy 0 —
identical selectivity semantics, 10x corpus behind them.

Usage: python scripts/build_sf1.py   # idempotent (skips existing tables)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgres_cdc_reconciliation_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("PCR_SF1_DIR", "/tmp/pcr_sf1")
COPIES = 10
K = 1_000_000_000  # per-copy key offset, shared by every key family


def _signs(copy: int, dim: int) -> list[int]:
    if copy == 0:
        return [1] * dim
    out = []
    x = copy * 2654435761 % (2**32)
    for _ in range(dim):
        x = (x * 6364136223846793005 + 1442695040888963407) % (2**64)
        out.append(1 if (x >> 33) & 1 else -1)
    return out


def _union(parts):
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _write(df, name):
    df.repartition(32).write.mode("overwrite").parquet(f"{DST}/{name}.parquet")
    print(f"  {name}: {df.count()} rows")


def main() -> None:
    spark = get_spark(app_name="build-sf1")
    done = lambda t: os.path.exists(f"{DST}/{t}.parquet/_SUCCESS")  # noqa: E731

    for t in ("region", "nation"):
        if not done(t):
            _write(spark.read.parquet(f"{SRC}/{t}.parquet"), t)

    shifted = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    }
    for t, keys in shifted.items():
        if done(t):
            continue
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for k in range(COPIES):
            df = base
            for c in keys:
                df = df.withColumn(c, F.col(c) + F.lit(k * K))
            parts.append(df)
        _write(_union(parts), t)

    if not done("events"):
        base = spark.read.parquet(f"{SRC}/events.parquet")
        parts = []
        for k in range(COPIES):
            parts.append(
                base.withColumn("event_id", F.col("event_id") + F.lit(k * K))
                .withColumn("user_id", F.col("user_id") + F.lit(k * K))
            )
        _write(_union(parts), "events")

    if not done("documents"):
        base = spark.read.parquet(f"{SRC}/documents.parquet")
        parts = [base]
        for k in range(1, COPIES):
            suffixed = F.array_join(
                F.expr(f"transform(split(text, ' '), x -> concat(x, '_{k}'))"),
                " ",
            )
            parts.append(
                base.select(
                    (F.col("doc_id") + F.lit(k * K)).alias("doc_id"),
                    suffixed.alias("text"),
                    "lang",
                    "source",
                    F.length(suffixed).cast("long").alias("n_chars"),
                )
            )
        _write(_union(parts), "documents")

    if not done("embeddings"):
        base = spark.read.parquet(f"{SRC}/embeddings.parquet")
        dim = base.select(F.size("embedding").alias("d")).first()["d"]
        parts = [base]
        for k in range(1, COPIES):
            s = "array({})".format(",".join(f"{v}.0F" for v in _signs(k, dim)))
            parts.append(
                base.select(
                    (F.col("vec_id") + F.lit(k * K)).alias("vec_id"),
                    F.expr(
                        f"zip_with(embedding, {s}, (a, b) -> cast(a * b as float))"
                    ).alias("embedding"),
                    (F.col("label") + F.lit(k * 10)).alias("label"),
                )
            )
        _write(_union(parts), "embeddings")

    spark.stop()
    print(f"sf1 corpus ready at {DST}")


if __name__ == "__main__":
    main()
