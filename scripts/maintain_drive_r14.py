#!/usr/bin/env python
"""Round-14 operational drive (VERDICT r13 #7): run the maintenance
executor end-to-end on REAL bench-corpus state at sf0.1 — not unit-test
toys — and prove report → execute → report-goes-green with data intact.

Builds from /root/testdata/sf0.1:
  1. a manifest target holding the orders table (16 buckets), grown
     through 8 delta commits so compact AND vacuum come due;
  2. a BM25 text index over the full documents corpus, seeded with half
     and grown through 6 admits so text_index_compact comes due;
then runs maintenance_report (due), maintain(dry_run=False), and
maintenance_report again (green), checking a snapshot count and a BM25
query answer survive the swap byte-for-byte.
"""

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main():
    from postgres_cdc_reconciliation_spark.operators.maintenance import (
        maintain,
        maintenance_report,
    )
    from postgres_cdc_reconciliation_spark.operators.manifest_target import (
        commit_delta,
        read_snapshot,
    )
    from postgres_cdc_reconciliation_spark.operators.retrieval import (
        bm25_persisted,
        text_index_admit,
        text_index_build,
    )
    from postgres_cdc_reconciliation_spark.session import get_spark

    spark = get_spark(
        app_name="maintain-drive-r14", master="local[32]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="maintain-drive-r14-")
    mt, ti = f"{base}/orders_target", f"{base}/docs_index"

    # --- grow the manifest target: orders, 16 buckets, 8 delta commits
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    n_orders = orders.count()
    buckets = list(range(16))
    commit_delta(orders, mt, ["o_orderkey"], buckets, 16)
    for i in range(8):
        # delta contract: complete bucket content per commit; extra write
        # tasks pile files into each live bucket dir -> compact due
        commit_delta(orders.repartition(24), mt, ["o_orderkey"], buckets, 16)

    # --- grow the text index: seed half the corpus, admit the rest
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    half = n_docs // 2
    text_index_build(docs.where(F.col("doc_id") < half), ti, n_buckets=64)
    step = max(1, (n_docs - half) // 6)
    for k in range(6):
        lo = half + k * step
        hi = n_docs if k == 5 else min(n_docs, lo + step)
        if lo >= n_docs:
            break
        text_index_admit(
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), ti
        )

    terms = ["spark", "vector", "query"]
    before_ans = sorted(
        map(tuple, bm25_persisted(spark, ti, terms).collect())
    )

    kw = dict(max_files_per_bucket=8, max_versions=4, max_admits=4)
    rep = maintenance_report(spark, [mt, ti], **kw).collect()
    print("== report (before) ==")
    for r in rep:
        print(f"  {r['tier']:16s} due={r['compaction_due']} {r['advice'][:90]}")
    assert all(r["compaction_due"] for r in rep), "both tiers must be due"

    t0 = time.perf_counter()
    done = maintain(
        spark, [mt, ti], dry_run=False, keep_manifests=2,
        min_attempt_age_seconds=0.0, **kw
    ).collect()
    wall = time.perf_counter() - t0
    print(f"== maintain(dry_run=False) in {wall:.1f}s ==")
    for r in done:
        print(f"  {r['action']:22s} executed={r['executed']} {r['detail'][:80]}")
    assert all(r["executed"] for r in done), "every advised action must run"

    # data intact through compact+vacuum+swap
    assert read_snapshot(spark, mt).count() == n_orders
    after_ans = sorted(
        map(tuple, bm25_persisted(spark, ti, terms).collect())
    )
    assert after_ans == before_ans, "BM25 answers changed across compact"

    rep2 = maintenance_report(spark, [mt, ti], **kw).collect()
    print("== report (after) ==")
    for r in rep2:
        print(f"  {r['tier']:16s} due={r['compaction_due']} {r['advice'][:90]}")
    assert all(not r["compaction_due"] for r in rep2), "report must be green"
    print(
        f"OK: {n_orders} orders rows + {n_docs}-doc BM25 index maintained; "
        f"answers stable; report green"
    )


if __name__ == "__main__":
    main()
