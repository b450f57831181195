#!/usr/bin/env python
"""Round-10 probe: incremental semantic dedup cost vs corpus size.

The design claim (operators/similarity.py::semantic_dedup_incremental):
a fixed ingest batch probes ONLY its touched cluster dirs of a persisted
semantic index, so per-batch cost is O(|batch| × cluster size) —
CONSTANT as the corpus grows (k scales with n, cluster size pinned by
target_cluster_size). This probe builds indexes over 4k and 40k planted
corpora (same md5 families as semdedup_probe_r10.py), probes both with
the SAME 400-vector batch (half dups of corpus families, half novel
directions), and measures files read + warm wall-clock + verdict mix.

Pass criteria: files read grows ~O(touched clusters) not O(index files)
(ratio vs total index files must FALL as the corpus grows), warm
wall-clock ~flat (<2× across 10× corpus), and all 200 planted corpus
dups prune with match_src=corpus at BOTH corpus sizes (the novel half
may batch-prune among itself — the affine transform clusters them —
which is correct and reported, not a planted claim).

Usage: python scripts/semdedup_incremental_probe_r10.py
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
    semantic_index_build,
)
from postgres_cdc_reconciliation_spark.session import get_spark  # noqa: E402
from scripts.semdedup_probe_r10 import corpus  # noqa: E402

BATCH = 400


def batch_df(spark, n_corpus):
    """400 probe vectors: ids 10M+, first half duplicate corpus family
    bases (family j = j-th corpus family, member wiggle 0.0005 — within
    the >0.999 family cone), second half novel md5 directions derived
    from a 'novel' salt no corpus family uses."""
    dup = corpus(spark, BATCH // 2).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    nov_base = corpus(spark, BATCH // 2).select(
        (F.col("vec_id") + 10_000_000 + BATCH).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i % 2 == 0, -x).otherwise(x * 0.7 + 0.3),
        ).alias("embedding"),
    )
    return dup.unionByName(nov_base)


def main():
    spark = get_spark(app_name="semdedup-incr-probe-r10")
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for n in (4_000, 40_000):
        path = tempfile.mkdtemp(prefix=f"pcr_semincr_{n}_") + "/idx"
        corp = corpus(spark, n).localCheckpoint()
        t0 = time.time()
        k = semantic_index_build(corp, path, target_cluster_size=128,
                                 max_iter=3)
        build_s = time.time() - t0
        total_files = len(spark.read.parquet(path).inputFiles())
        b = batch_df(spark, n).localCheckpoint()
        # warm-up once (JVM/codegen), then measure
        semantic_dedup_incremental(b, path, threshold=0.99).collect()
        t0 = time.time()
        out = semantic_dedup_incremental(b, path, threshold=0.99)
        rows = out.collect()
        probe_s = time.time() - t0
        files_read = len(out.inputFiles())
        pruned_corpus = sum(1 for r in rows if r["match_src"] == "corpus")
        pruned_batch = sum(1 for r in rows if r["match_src"] == "batch")
        dup_ids_pruned_corpus = sum(
            1 for r in rows
            if r["match_src"] == "corpus"
            and r["vec_id"] < 10_000_000 + BATCH // 2
        )
        results.append(
            dict(n=n, k=k, build_s=round(build_s, 2),
                 probe_s=round(probe_s, 2), files_read=files_read,
                 total_files=total_files,
                 read_frac=round(files_read / total_files, 3),
                 n_verdicts=len(rows), pruned_corpus=pruned_corpus,
                 pruned_batch=pruned_batch,
                 planted_dups_caught=f"{dup_ids_pruned_corpus}/{BATCH // 2}")
        )
        print(results[-1], flush=True)
    a, z = results
    print(f"\nwall-clock ratio (10x corpus): {z['probe_s'] / a['probe_s']:.2f}x"
          f"  (claim: ~flat, <2x)")
    print(f"read fraction: {a['read_frac']:.3f} -> {z['read_frac']:.3f}"
          f"  (claim: falls with corpus growth)")
    spark.stop()


if __name__ == "__main__":
    main()
