"""Hot-bucket guard for the embedding near-dup tier (VERDICT r6 #1).

A within-bucket pair join is O(Σ bucket²); one dense embedding mode turns it
quadratic. cap_hot_buckets bounds every bucket at the cap by (1) splitting
oversized buckets with extra sign-LSH planes, (2) dropping sub-buckets the
planes can't separate (identical vectors). These tests plant both shapes.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.operators.similarity import (
    cap_hot_buckets,
    embedding_near_dup_pairs,
    hot_buckets,
    rp_near_dup_pairs_multi,
)


def _vec(i: int, dim: int = 16) -> list[float]:
    # deterministic spread-out directions (distinct angles, no RNG)
    return [math.sin(0.7 * i + 0.31 * j) + 0.05 for j in range(dim)]


def _skewed_df(spark, n_hot: int = 80, n_cold: int = 12):
    """One planted hot bucket (label 0, many distinct directions) plus small
    cold buckets."""
    rows = [(i, _vec(i), 0) for i in range(n_hot)]
    rows += [(1000 + i, _vec(1000 + i), 1 + i % 3) for i in range(n_cold)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_cap_splits_hot_bucket_and_bounds_every_group(spark):
    df = _skewed_df(spark)
    capped = cap_hot_buckets(df, max_bucket_size=30, bucket_col="label", dim=16,
                             split_planes=4)
    sizes = {r["label"]: r["n"] for r in
             capped.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert sizes, "cap dropped everything — split planes failed to separate"
    assert max(sizes.values()) <= 30
    # cold buckets survive untouched (string-cast key, same membership)
    cold = capped.filter(~F.col("label").contains("#"))
    assert cold.count() == 12
    # hot-bucket rows either split into sub-buckets or dropped, never merged
    assert all("#" in k for k in sizes if sizes[k] and k not in ("1", "2", "3"))


def test_capped_pairs_are_bounded_and_sound(spark):
    """Pair output under the cap is a SUBSET of the uncapped pairs (no false
    pairs) and the candidate volume is bounded by buckets x cap^2."""
    df = _skewed_df(spark)
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(df, threshold=0.1).collect()
    }
    capped_df = embedding_near_dup_pairs(
        df, threshold=0.1, max_bucket_size=30, dim=16, split_planes=4
    )
    capped = {(r["id_a"], r["id_b"]) for r in capped_df.collect()}
    assert capped, "guard should degrade recall, not zero it"
    assert capped <= uncapped
    # hard bound check: no surviving bucket can contribute > C(cap,2) pairs
    sizes = [
        r["n"]
        for r in cap_hot_buckets(df, 30, "label", dim=16, split_planes=4)
        .groupBy("label").agg(F.count("*").alias("n")).collect()
    ]
    assert len(capped) <= sum(s * (s - 1) // 2 for s in sizes)


def test_identical_vector_mode_is_dropped_and_reported(spark):
    """No hyperplane separates identical vectors: the residual-drop stage
    must cut the mode, and hot_buckets must surface it loudly."""
    base = _vec(3)
    rows = [(i, list(base), 0) for i in range(50)]  # unsplittable mode
    rows += [(100 + i, _vec(100 + i), 1) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    capped = cap_hot_buckets(df, max_bucket_size=10, bucket_col="label", dim=16)
    ids = {r["vec_id"] for r in capped.select("vec_id").collect()}
    assert ids == {100 + i for i in range(8)}  # mode dropped, cold bucket kept
    report = hot_buckets(df, 10, "label").collect()
    assert [(r["label"], r["bucket_size"]) for r in report] == [(0, 50)]


def test_drop_mode_without_split_planes(spark):
    df = _skewed_df(spark)
    capped = cap_hot_buckets(df, max_bucket_size=30, bucket_col="label",
                             split_planes=0)
    labels = {r["label"] for r in capped.select("label").distinct().collect()}
    assert labels == {"1", "2", "3"}  # hot bucket dropped whole, keys stringified


def test_multi_table_cap_consistent_across_scorers(spark):
    """Per-table capping applies identical membership to the candidate-join
    scorers and the matrix scorer (same shared split key), so all three
    produce the same pair set under the cap — and it is a subset of the
    uncapped pairs."""
    rows = [(i, _vec(i, 8)) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(dim=8, threshold=0.1, n_planes=2, n_tables=2)
    uncapped = {(r["id_a"], r["id_b"]) for r in
                rp_near_dup_pairs_multi(df, **kw).collect()}
    got = {}
    for scorer in ("sql", "numpy", "matrix"):
        got[scorer] = {
            (r["id_a"], r["id_b"])
            for r in rp_near_dup_pairs_multi(
                df, scorer=scorer, max_bucket_size=12, **kw
            ).collect()
        }
    assert got["sql"] == got["numpy"] == got["matrix"]
    assert got["sql"] and got["sql"] <= uncapped
