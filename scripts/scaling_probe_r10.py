#!/usr/bin/env python
"""Round-10 scaling probe: n-gram Jaccard dedup at 1x vs 10x corpus.

VERDICT r9 flagged q_dedup_ngram as "the one to watch at 100x": an
inverted-index self-join whose pair blow-up is bounded only by the
document-frequency cap. This probe measures that bound empirically.

10x corpus construction: sf0.1 documents unioned 10 times with shifted
doc_ids AND per-replica token suffixing (every token gets "_<rep>"
appended via regexp_replace with a column replacement), so replicas are
mutually disjoint in shingle space — within-replica near-dup structure is
preserved, cross-replica Jaccard is exactly 0. True near-dup pairs
therefore scale exactly 10x (linear), and a shuffle-disciplined plan
should scale ~linearly in time on fixed cores. Superlinear time OR
superlinear candidate-pair growth would expose the df-cap failing.

Usage: python scripts/scaling_probe_r10.py   (prints the SCALING.md rows)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgres_cdc_reconciliation_spark.operators.dedup import (  # noqa: E402
    ngram_jaccard_pairs,
    shingles,
)
from postgres_cdc_reconciliation_spark.session import get_spark  # noqa: E402

SF1 = "/root/testdata/sf0.1"
TENX = "/tmp/pcr_scale10x_docs"
MULT = 10


def build_10x(spark):
    if os.path.exists(f"{TENX}/documents.parquet/_SUCCESS"):
        return
    base = spark.read.parquet(f"{SF1}/documents.parquet")
    n = base.agg(F.max("doc_id")).first()[0] + 1
    reps = spark.range(MULT).withColumnRenamed("id", "_rep")
    big = (
        base.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("_rep") * n)
        # suffix EVERY token with the replica id: replicas become disjoint
        # shingle universes (cross-replica Jaccard = 0) while within-replica
        # near-dup structure is untouched -> true pairs scale exactly 10x
        .withColumn(
            "text",
            F.regexp_replace(
                F.col("text"),
                F.lit(r"(\S+)"),
                F.concat(F.lit(r"$1_"), F.col("_rep").cast("string")),
            ),
        )
        .drop("_rep")
    )
    big.write.mode("overwrite").parquet(f"{TENX}/documents.parquet")


def run_ngram(spark, d):
    docs = spark.read.parquet(f"{d}/documents.parquet").select("doc_id", "text")
    t0 = time.perf_counter()
    pairs = ngram_jaccard_pairs(shingles(docs, k=3), threshold=0.5, max_doc_freq=100)
    n_pairs = pairs.count()
    dt = time.perf_counter() - t0
    return dt, n_pairs


def candidate_volume(spark, d):
    """Pre-threshold candidate pairs (the quantity the df-cap bounds)."""
    docs = spark.read.parquet(f"{d}/documents.parquet").select("doc_id", "text")
    sh = shingles(docs, k=3)
    hot = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") > 100)
        .select("shingle")
    )
    capped = sh.join(hot, "shingle", "left_anti")
    a, b = capped.alias("a"), capped.alias("b")
    return (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )


def main():
    spark = get_spark(app_name="scaling-probe-r10")
    spark.sparkContext.setLogLevel("ERROR")
    build_10x(spark)

    nd1 = spark.read.parquet(f"{SF1}/documents.parquet").count()
    nd10 = spark.read.parquet(f"{TENX}/documents.parquet").count()
    print(f"docs: 1x={nd1} 10x={nd10}")

    # warm-up then best-of-2 at each scale, interleaved to average drift
    results = {}
    for label, d in [("1x", SF1), ("10x", TENX)]:
        run_ngram(spark, d)  # warm-up (parquet footer + JIT)
        best = min(run_ngram(spark, d) for _ in range(2))
        cand = candidate_volume(spark, d)
        results[label] = (best[0], best[1], cand)
        print(
            f"ngram_jaccard {label}: {best[0]:.2f}s  "
            f"pairs>=0.5={best[1]}  candidates={cand}"
        )

    t1, p1, c1 = results["1x"]
    t10, p10, c10 = results["10x"]
    print(
        f"ratios at 10x data: time {t10 / t1:.2f}x  "
        f"true-pairs {p10 / max(p1, 1):.2f}x  candidates {c10 / max(c1, 1):.2f}x"
    )
    spark.stop()


if __name__ == "__main__":
    main()
