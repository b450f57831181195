#!/usr/bin/env python
"""Round-14 scaling probe (VERDICT r13 #5): the two sf1 tail queries —
q_dedup_ngram_prefix (prefix-filtered n-gram similarity join over
documents) and q_semantic_dedup (k-means-localized SemDeDup over
embeddings) — measured at sf1 vs a synthesized sf2 (2x sf1), to confirm
their scale exponent is still subquadratic after two rounds of sf1 wall
growth (12.7->17.6 s and 14.3->16.7 s, which could be host drift or a
shape problem; the exponent decides).

sf2 synthesis reuses build_sf1.py's construction one octave up: copy 0 is
the sf1 table verbatim; copy 1 shifts ids by 10*K and suffixes every token
with '_b' (documents — vocabulary disjoint from every sf1 copy, so no
cross-copy near-dups distort the candidate structure) / sign-flips the
embedding under a fresh deterministic pattern (embeddings — norms and
pairwise structure within the copy preserved). Only the two tables these
queries read are built.

Exponent = log(t_2x / t_1x) / log(2); SCALING.md gate <= 1.2.
"""

from __future__ import annotations

import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = os.environ.get("PCR_SF1_DIR", "/tmp/pcr_sf1")
SF2 = os.environ.get("PCR_SF2_DIR", "/tmp/pcr_sf2")
K = 1_000_000_000


def _signs(copy: int, dim: int) -> list[int]:
    x = copy * 2654435761 % (2**32)
    out = []
    for _ in range(dim):
        x = (x * 6364136223846793005 + 1442695040888963407) % (2**64)
        out.append(1 if (x >> 33) & 1 else -1)
    return out


def build_sf2(spark) -> None:
    from pyspark.sql import functions as F

    if not os.path.exists(f"{SF2}/documents.parquet/_SUCCESS"):
        base = spark.read.parquet(f"{SF1}/documents.parquet")
        suffixed = F.array_join(
            F.expr("transform(split(text, ' '), x -> concat(x, '_b'))"), " "
        )
        copy1 = base.select(
            (F.col("doc_id") + F.lit(10 * K)).alias("doc_id"),
            suffixed.alias("text"),
            "lang",
            "source",
            F.length(suffixed).cast("long").alias("n_chars"),
        )
        base.unionByName(copy1).repartition(64).write.mode(
            "overwrite"
        ).parquet(f"{SF2}/documents.parquet")
    if not os.path.exists(f"{SF2}/embeddings.parquet/_SUCCESS"):
        base = spark.read.parquet(f"{SF1}/embeddings.parquet")
        dim = base.select(F.size("embedding").alias("d")).first()["d"]
        s = "array({})".format(
            ",".join(f"{v}.0F" for v in _signs(11, dim))
        )
        copy1 = base.select(
            (F.col("vec_id") + F.lit(10 * K)).alias("vec_id"),
            F.expr(
                f"zip_with(embedding, {s}, (a, b) -> cast(a * b as float))"
            ).alias("embedding"),
            (F.col("label") + F.lit(100)).alias("label"),
        )
        base.unionByName(copy1).repartition(64).write.mode(
            "overwrite"
        ).parquet(f"{SF2}/embeddings.parquet")


def median_of(spark, fn, sf_dir, reps=3):
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 3)


def main():
    from postgres_cdc_reconciliation_spark.plans.registry import all_queries
    from postgres_cdc_reconciliation_spark.session import get_spark

    spark = get_spark(
        app_name="scaling-r14", master="local[32]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_sf2(spark)
    for d in (SF1, SF2):
        spark.read.parquet(f"{d}/documents.parquet").count()
    reg = all_queries()
    for name in ("q_dedup_ngram_prefix", "q_semantic_dedup"):
        w1 = median_of(spark, reg[name].fn, SF1)
        w2 = median_of(spark, reg[name].fn, SF2)
        exp = math.log(w2 / w1) / math.log(2) if w1 > 0 else float("nan")
        print(
            f"{name}: 1x(sf1)={w1}s 2x(sf2)={w2}s "
            f"ratio={w2 / w1:.2f} exponent={exp:.2f}"
        )


if __name__ == "__main__":
    main()
