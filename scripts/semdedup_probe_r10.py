#!/usr/bin/env python
"""Round-10 probe: SemDeDup cost linearity under corpus growth.

The design claim (operators/similarity.py::semantic_dedup): with
k = ceil(n / target_cluster_size), expected cluster size — and therefore
per-cluster pair cost — is CONSTANT in n, so total work scales ~linearly.
This probe measures it: planted corpora of 4k / 40k vectors (64-dim,
10-member near-duplicate families at cosine > 0.999, md5-derived — no RNG
state, reruns identical), same target_cluster_size, wall-clock + kept
counts. A superlinear exponent would mean a stage regressed to
cross-cluster or all-pairs work.

Usage: python scripts/semdedup_probe_r10.py
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgres_cdc_reconciliation_spark.operators.similarity import (  # noqa: E402
    semantic_dedup,
)
from postgres_cdc_reconciliation_spark.session import get_spark  # noqa: E402

DIM = 64
FAMILY = 10  # vectors per near-duplicate family


def corpus(spark, n):
    """n deterministic 64-dim vectors in families of 10: members of a
    family share an md5-derived base direction (uncorrelated across
    families — expected |cos| ~ 1/sqrt(64) ≈ 0.125 between families) plus
    a tiny per-member wiggle on one component, so within-family cosine
    stays > 0.999. Engine-independent (md5, no RNG)."""
    fam = (F.col("vec_id") / FAMILY).cast("long")
    member = F.col("vec_id") % FAMILY
    comps = []
    for i in range(DIM):
        u = (
            F.conv(
                F.substring(F.md5(F.concat_ws(":", F.lit(i), fam)), 1, 8),
                16,
                10,
            ).cast("double")
            / F.lit(4294967296.0)
            - 0.5
        )
        if i == 0:
            u = u + member * F.lit(0.001)  # the wiggle
        comps.append(u.cast("float"))
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*comps).alias("embedding")
    )


def main():
    spark = get_spark(app_name="semdedup-probe-r10")
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for n in (4_000, 40_000):
        df = corpus(spark, n).localCheckpoint()
        t0 = time.time()
        out = semantic_dedup(df, threshold=0.99, target_cluster_size=128)
        kept = out.filter("keep").count()
        dt = time.time() - t0
        results.append((n, dt, kept))
        print(f"n={n}: {dt:.2f}s, kept {kept}/{n} "
              f"(perfect family recall would keep {n // FAMILY})")
    (n1, t1, _), (n2, t2, _) = results
    exp = math.log(t2 / t1) / math.log(n2 / n1)
    print(f"time exponent across 10x: {exp:.2f} (1.0 = linear)")
    spark.stop()


if __name__ == "__main__":
    main()
