#!/usr/bin/env python
"""Round-7 scaling probe (VERDICT r6 #1): the embedding near-dup hot-bucket
guard, 1x (sf0.1) vs the 10x corpus.

The 10x embeddings construction is scaling_probe_r5.py's: each copy keeps the
SAME label but a sign-flipped vector — label buckets grow 10x, which is the
dense-mode shape that made q_dedup_embed's raw exponent 0.84 (the within-
bucket pair join is O(bucket²), and 10x buckets → ~100x candidates). The r6
verdict asked for (a) an output-normalized exponent for the uncapped op (how
much of 0.84 is just output growth) and (b) the capped op's exponent (the
guard should hold the bucket size — and so the candidate volume per row —
constant as the corpus grows).

Exponent = log10(t_10x / t_1x); output-normalized = log10((t10/rows10) /
(t1/rows1)). min-of-2 per cell. Results → SCALING.md.

Usage: python scripts/scaling_probe_r7.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgres_cdc_reconciliation_spark.session import get_spark  # noqa: E402
from postgres_cdc_reconciliation_spark.operators.similarity import (  # noqa: E402
    embedding_near_dup_pairs,
)

SF1 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF10 = "/tmp/pcr_sf10x_r7"
COPIES = 10


def _signs(copy: int, dim: int) -> list[int]:
    if copy == 0:
        return [1] * dim
    out = []
    x = copy * 2654435761 % (2**32)
    for _ in range(dim):
        x = (x * 6364136223846793005 + 1442695040888963407) % (2**64)
        out.append(1 if (x >> 33) & 1 else -1)
    return out


def build_10x(spark) -> None:
    if os.path.exists(f"{SF10}/embeddings.parquet/_SUCCESS"):
        return
    emb = spark.read.parquet(f"{SF1}/embeddings.parquet")
    dim = emb.select(F.size("embedding").alias("d")).first()["d"]
    parts = []
    for k in range(COPIES):
        if k == 0:
            parts.append(emb)
        else:
            s = "array({})".format(",".join(f"{v}.0F" for v in _signs(k, dim)))
            parts.append(
                emb.select(
                    (F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
                    F.expr(
                        f"zip_with(embedding, {s}, (a, b) -> cast(a * b as float))"
                    ).alias("embedding"),
                    "label",
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{SF10}/embeddings.parquet")


def run(spark, sf_dir: str, split_planes) -> tuple[float, int]:
    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    kw = dict(threshold=0.35)
    if split_planes is not None:
        kw.update(max_bucket_size=40, dim=64, split_planes=split_planes)
    best, rows = None, None
    for _ in range(2):
        t0 = time.monotonic()
        rows = embedding_near_dup_pairs(v, **kw).count()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return best, rows


def main() -> None:
    import math

    spark = get_spark(app_name="scaling-probe-r7")
    build_10x(spark)
    print(f"{'probe':32s} {'1x sec (rows)':>18s} {'10x sec (rows)':>20s} "
          f"{'exp':>6s} {'exp/out':>8s}")
    for name, sp in (("q_dedup_embed (uncapped)", None),
                     ("q_dedup_embed cap=40 sp=4", 4),
                     ("q_dedup_embed cap=40 sp=8", 8),
                     ("q_dedup_embed cap=40 auto", "auto")):
        t1, r1 = run(spark, SF1, sp)
        t10, r10 = run(spark, SF10, sp)
        exp = math.log10(t10 / t1)
        expn = math.log10((t10 / max(r10, 1)) / (t1 / max(r1, 1)))
        print(f"{name:32s} {t1:9.2f} ({r1:6d}) {t10:11.2f} ({r10:6d}) "
              f"{exp:6.2f} {expn:8.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
