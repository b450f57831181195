#!/usr/bin/env python
"""Cold-session phase profile of q_ann_pq (VERDICT r13 #1).

Fresh JVM, sf0.1 by default. Times each phase of the query separately:
  1. codebook collect (pq_encode_fast's driver-side cb = codebooks.collect())
  2. encode pass (mapInPandas over the corpus, counted)
  3. dtable broadcast build + the ADC join/topk
  4. the full query end-to-end again (second call, same session)
so the first-call blow-up (driver draw 25.2 s vs r12 3.6 s) can be
attributed to a specific phase.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.3f}s", flush=True)
    return out


def main():
    from pyspark.sql import functions as F

    from postgres_cdc_reconciliation_spark.operators.similarity import (
        pq_codebooks,
        pq_encode_fast,
        pq_topk,
    )
    from postgres_cdc_reconciliation_spark.session import get_spark

    spark = t("session", lambda: get_spark(app_name="pq-cold", master="local[32]"))
    spark.sparkContext.setLogLevel("ERROR")
    t("warmup lineitem count", lambda: spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count())

    v = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    t("embeddings count", v.count)

    books = pq_codebooks(v, n_sub=32, d_sub=2, k_codes=64)
    t("codebooks collect", books.collect)

    codes = t("encode build (pq_encode_fast incl. cb collect)", lambda: pq_encode_fast(v, books, n_sub=32, d_sub=2))
    t("encode count (mapInPandas pass)", codes.count)

    q = v.filter(F.col("vec_id") < 16)
    top = t("topk build", lambda: pq_topk(q, codes, books, k=5, n_sub=32, d_sub=2))
    t("topk noop write (encode re-runs here: codes not cached)", lambda: top.write.format("noop").mode("overwrite").save())

    # full query, same session — the warm number
    from postgres_cdc_reconciliation_spark.plans.registry import all_queries

    reg = all_queries()
    for i in range(3):
        t(f"full q_ann_pq call {i + 1}", lambda: reg["q_ann_pq"].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save())


if __name__ == "__main__":
    main()
