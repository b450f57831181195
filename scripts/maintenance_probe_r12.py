#!/usr/bin/env python
"""Round-12 maintenance probe: text-index admit-count vs persisted-query
wall, before and after text_index_compact — the curve maintenance_report's
max_admits threshold is calibrated against (VERDICT r11 #7)."""

import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from postgres_cdc_reconciliation_spark.operators.maintenance import (  # noqa: E402
    maintenance_report,
)
from postgres_cdc_reconciliation_spark.operators.retrieval import (  # noqa: E402
    bm25_persisted,
    text_index_admit,
    text_index_build,
    text_index_compact,
)
from postgres_cdc_reconciliation_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
TERMS = ["spark", "vector", "query"]


def timed_query(spark, path, reps=5):
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        bm25_persisted(spark, path, TERMS).write.format("noop").mode(
            "overwrite"
        ).save()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 3)


def main():
    spark = get_spark(app_name="maint-probe", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    # seed with the first half, admit the rest in equal slices
    half = n // 2
    base = tempfile.mkdtemp(prefix="maint-probe-")
    idx = f"{base}/idx"
    text_index_build(
        docs.where(F.col("doc_id") < half), idx, n_buckets=64
    )
    print(f"corpus={n} docs, seed={half}")
    print(f"admits=0  wall={timed_query(spark, idx)}s")
    slice_n = max(1, (n - half) // 16)
    admitted = 0
    for step in range(16):
        lo = half + step * slice_n
        hi = min(n, lo + slice_n)
        if lo >= n:
            break
        text_index_admit(
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), idx
        )
        admitted += 1
        if admitted in (4, 8, 16):
            w = timed_query(spark, idx)
            print(f"admits={admitted}  wall={w}s")
    rep = maintenance_report(spark, idx, max_admits=8).collect()[0]
    print(
        f"maintenance_report: admits={rep['n_admits']} due="
        f"{rep['compaction_due']} advice={rep['advice']!r}"
    )
    compacted = f"{base}/idx_compact"
    t0 = time.perf_counter()
    text_index_compact(spark, idx, compacted)
    print(f"compact wall={round(time.perf_counter() - t0, 3)}s")
    print(f"post-compact  wall={timed_query(spark, compacted)}s")
    a = sorted(map(tuple, bm25_persisted(spark, idx, TERMS).collect()))
    b = sorted(map(tuple, bm25_persisted(spark, compacted, TERMS).collect()))
    print(f"value-identical: {a == b} ({len(a)} rows)")


if __name__ == "__main__":
    main()
