#!/usr/bin/env python
"""Round-5 scaling probe (VERDICT r4 #5): the five bench headliners at
sf0.1 (1x) vs a synthesized sf1 (10x), scaling exponent per query.

10x corpus construction (one-time, written to /tmp, reused if present) —
shaped so each copy behaves like an INDEPENDENT sf0.1 corpus and the
workload grows ~linearly in rows, which is what a real 10x crawl looks
like (10x the docs, same duplicate density — NOT 10 byte-identical
copies, which would explode cross-copy near-dup pairs quadratically and
measure the corpus, not the engine):

- documents: copy k shifts doc_id by k*10^7 and suffixes every TOKEN with
  "_k" — intra-copy shingle/minhash/Jaccard structure is preserved
  verbatim, cross-copy shingles never collide;
- embeddings: copy k shifts vec_id and multiplies each vector elementwise
  by a deterministic ±1 sign pattern — intra-copy cosines are EXACTLY
  preserved (cos(s∘x, s∘y) = cos(x, y)), cross-copy cosines scramble;
- lineitem (pagerank edge source): copy k shifts l_suppkey/l_partkey by
  k*10^8 — 10 disjoint copies of the co-purchase graph.

Exponent = log10(t_10x / t_1x): 1.0 = linear, ≤1.2 accepted (VERDICT),
>1.2 = superlinear, must be named and fixed.

Usage: python scripts/scaling_probe_r5.py [--rebuild]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgres_cdc_reconciliation_spark.session import get_spark  # noqa: E402

SF1 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF10 = "/tmp/pcr_sf10x"
COPIES = 10
HEADLINERS = [
    "q_pagerank",
    "q_corpus_curation",
    "q_dedup_clusters",
    "q_dedup_ngram",
    "q_dedup_embed",
]


def _signs(copy: int, dim: int) -> list[int]:
    """Deterministic ±1 pattern per copy (copy 0 = identity)."""
    if copy == 0:
        return [1] * dim
    out = []
    x = copy * 2654435761 % (2**32)
    for _ in range(dim):
        x = (x * 6364136223846793005 + 1442695040888963407) % (2**64)
        out.append(1 if (x >> 33) & 1 else -1)
    return out


def build_10x(spark) -> None:
    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    parts = []
    for k in range(COPIES):
        if k == 0:
            parts.append(docs)
        else:
            suffixed = F.array_join(
                F.expr(f"transform(split(text, ' '), x -> concat(x, '_{k}'))"),
                " ",
            )
            parts.append(
                docs.select(
                    (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
                    suffixed.alias("text"),
                    "lang",
                    "source",
                    F.length(suffixed).alias("n_chars"),
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{SF10}/documents.parquet")

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
                        f"zip_with(embedding, {s}, "
                        f"(a, b) -> cast(a * b as float))"
                    ).alias("embedding"),
                    "label",
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{SF10}/embeddings.parquet")

    li = spark.read.parquet(f"{SF1}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_partkey"
    )
    parts = []
    for k in range(COPIES):
        shift = k * 100_000_000
        parts.append(
            li.select(
                (F.col("l_orderkey") + F.lit(shift)).alias("l_orderkey"),
                (F.col("l_suppkey") + F.lit(shift)).alias("l_suppkey"),
                (F.col("l_partkey") + F.lit(shift)).alias("l_partkey"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{SF10}/lineitem.parquet")


def main() -> None:
    from postgres_cdc_reconciliation_spark.plans.registry import all_queries

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="pcr-scaling-r5", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    if "--rebuild" in sys.argv and os.path.isdir(SF10):
        shutil.rmtree(SF10)
    if not os.path.isdir(f"{SF10}/lineitem.parquet"):
        t0 = time.perf_counter()
        build_10x(spark)
        print(f"# built 10x corpus at {SF10} in {time.perf_counter() - t0:.1f}s")

    qs = all_queries()
    # warm-up: JVM + codegen on a representative plan
    spark.read.parquet(f"{SF1}/documents.parquet").count()

    def best_of(fn, sf, reps=2):
        """min-of-N executions: the FIRST run of a plan shape pays codegen +
        plan build (2-4s here), which at sf0.1 absolute times (4-10s) drowns
        the data-dependent cost and once produced a 10x run measuring FASTER
        than 1x. min over a warm rep isolates the data-scaling term. Also
        returns the result cardinality so the probe can prove the 10x input
        is actually flowing through the operator."""
        best, rows = float("inf"), -1
        for _ in range(reps):
            t0 = time.perf_counter()
            rows = fn(spark, sf).count()
            best = min(best, time.perf_counter() - t0)
        return best, rows

    results = {}
    for name in HEADLINERS:
        fn = qs[name].fn
        t1x, rows1 = best_of(fn, SF1)
        t10x, rows10 = best_of(fn, SF10)
        exp = math.log10(t10x / t1x) if t1x > 0 else float("nan")
        results[name] = {
            "t_1x_sec": round(t1x, 2),
            "t_10x_sec": round(t10x, 2),
            "rows_1x": rows1,
            "rows_10x": rows10,
            "exponent": round(exp, 3),
            "verdict": "ok" if exp <= 1.2 else "SUPERLINEAR",
        }
        print(
            f"  {name}: 1x {t1x:.2f}s ({rows1} rows)  "
            f"10x {t10x:.2f}s ({rows10} rows)  exp {exp:.3f}"
        )

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
