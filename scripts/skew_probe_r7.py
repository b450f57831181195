#!/usr/bin/env python
"""Round-7 skew probe: registered queries under planted heavy-key skew.

Companion to tests/test_skew_inputs.py (which asserts completion at
sf0.001): this measures the COST of skew at sf0.01 — uniform vs skewed
wall clock and output rows for the join/group/dedup-heavy queries — so the
100-TB story has numbers, not just "the guards exist". The skewed corpus
plants the same modes as the sweep: ~30% of lineitem on one l_orderkey,
~30% of orders on one o_custkey, ~30% of documents with identical text,
~30% of embeddings with an identical vector, ~40% of events on one
user_id.

A query passes the skew bar when t_skew / t_uniform stays within a small
constant (the hot key costs itself, not the job) AND pair-producing
outputs stay far from the quadratic ceiling (0.3n)². Results → SCALING.md.

Usage: python scripts/skew_probe_r7.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgres_cdc_reconciliation_spark.session import get_spark  # noqa: E402
from postgres_cdc_reconciliation_spark.plans.registry import all_queries  # noqa: E402

UNIFORM = os.environ.get("SPARK_GRAFT_SKEW_BASE", "/root/testdata/sf0.01")
SKEWED = "/tmp/pcr_skew_sf001"

# join/group/blocking-key-heavy subset; the rest of the registry is covered
# for completion by the sweep test
QUERIES = [
    "q_top_supplier",
    "q_product_profit",
    "q_left_join_agg",
    "q_latest_per_group",
    "q_salted_join",
    "q_session_window",
    "q_hopping_window",
    "q_interval_overlap",
    "q_series_similarity",
    "q_series_dtw",
    "q_cdc_apply",
    "q_recon_diff",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_ngram",
    "q_dedup_simhash",
    "q_dedup_clusters",
    "q_dedup_embed",
    "q_dedup_embed_capped",
    "q_dedup_embed_matrix",
    "q_dedup_embed_rp",
    "q_dedup_embed_rp_multi",
    "q_corpus_curation",
    "q_kmeans",
]


def build_skewed(spark) -> None:
    # sentinel on events: it is the LAST table tests/_corpora.py::build_skew
    # writes, so a partially-built corpus from an interrupted run can never
    # masquerade as complete
    if os.path.exists(f"{SKEWED}/events.parquet/_SUCCESS"):
        return
    os.makedirs(SKEWED, exist_ok=True)
    from tests._corpora import build_skew

    build_skew(spark, UNIFORM, SKEWED)


def _run(spark, name, sf_dir):
    fn = all_queries()[name].fn
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    rows = fn(spark, sf_dir).count()  # untimed: output-boundedness evidence
    return best, rows


def main() -> None:
    names = sys.argv[1:] or QUERIES
    spark = get_spark(app_name="pcr-skew-probe")
    build_skewed(spark)
    # warm-up
    spark.read.parquet(f"{UNIFORM}/lineitem.parquet").count()
    print(f"{'query':28s} {'uniform':>8s} {'skewed':>8s} {'ratio':>6s} "
          f"{'rows_u':>8s} {'rows_s':>8s}")
    for name in names:
        tu, ru = _run(spark, name, UNIFORM)
        ts, rs = _run(spark, name, SKEWED)
        print(f"{name:28s} {tu:8.2f} {ts:8.2f} {ts / tu:6.2f} "
              f"{ru:8d} {rs:8d}")
    spark.stop()


if __name__ == "__main__":
    main()
