#!/usr/bin/env python
"""Round-10 probe: incremental-semantic-index LIFECYCLE cost.

Admission appends one file per touched cluster per batch, so probe cost
grows with ADMITTED BATCH COUNT (file listing + opens per touched
cluster), even while row volume stays modest — the read-amplification
that :func:`semantic_index_compact` exists to fix. This probe measures
it honestly: seed a 4k-vector index, run 30 admit+probe rounds of 100
vectors each, record probe wall-clock and files-read at rounds 1/10/
20/30, then compact and re-probe.

Pass criteria: files-read grows ~linearly with admitted batches (the
documented amplification), post-compaction probe returns to ~round-1
cost with identical verdicts.

Usage: python scripts/semstream_lifecycle_probe_r10.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgres_cdc_reconciliation_spark.operators.similarity import (  # noqa: E402
    semantic_dedup_incremental,
    semantic_index_admit,
    semantic_index_build,
    semantic_index_compact,
)
from postgres_cdc_reconciliation_spark.session import get_spark  # noqa: E402
from scripts.semdedup_probe_r10 import corpus  # noqa: E402

ROUNDS = 30
BATCH = 100


def main():
    spark = get_spark(app_name="semstream-lifecycle-r10")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="pcr_semlife_") + "/idx"
    semantic_index_build(
        corpus(spark, 4_000).localCheckpoint(), root,
        target_cluster_size=128, max_iter=3,
    )

    def probe_batch(r):
        # fresh ids per round; vectors reuse the corpus generator shifted
        # into novel family space so most rows are kept (and admitted)
        return corpus(spark, BATCH).select(
            (F.col("vec_id") + (r + 1) * 1_000_000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: F.when(i % 3 == r % 3, x * 0.5 + 0.1).otherwise(-x),
            ).alias("embedding"),
        ).localCheckpoint()

    marks = {}
    fixed = probe_batch(97)  # one fixed probe re-measured at each mark
    for r in range(ROUNDS):
        b = probe_batch(r)
        v = semantic_dedup_incremental(b, root, threshold=0.99)
        kept = b.join(v.filter("keep").select("vec_id", "cent_id"), "vec_id")
        semantic_index_admit(kept, root, r)
        if r + 1 in (1, 10, 20, 30):
            t0 = time.time()
            out = semantic_dedup_incremental(fixed, root, threshold=0.99)
            rows = sorted((x["vec_id"], x["keep"]) for x in out.collect())
            marks[r + 1] = dict(
                probe_s=round(time.time() - t0, 2),
                files_read=len(out.inputFiles()),
                verdicts=rows,
            )
            print(f"after {r + 1} admitted batches: "
                  f"{marks[r + 1]['probe_s']} s, "
                  f"{marks[r + 1]['files_read']} files", flush=True)

    dst = tempfile.mkdtemp(prefix="pcr_semlife_c_") + "/idx"
    t0 = time.time()
    n = semantic_index_compact(spark, root, dst)
    compact_s = round(time.time() - t0, 2)
    t0 = time.time()
    out = semantic_dedup_incremental(fixed, dst, threshold=0.99)
    rows = sorted((x["vec_id"], x["keep"]) for x in out.collect())
    post = dict(probe_s=round(time.time() - t0, 2),
                files_read=len(out.inputFiles()), verdicts=rows)
    print(f"compact: {n} rows in {compact_s} s")
    print(f"post-compaction probe: {post['probe_s']} s, "
          f"{post['files_read']} files")
    same = post["verdicts"] == marks[30]["verdicts"]
    print(f"verdicts identical post-compaction: {same}")
    assert same
    spark.stop()


if __name__ == "__main__":
    main()
