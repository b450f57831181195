"""Whole-registry planted-skew sweep.

At 100 TB the data is never uniform: one mega-customer owns a third of the
orders, one boilerplate string is a third of the corpus, one embedding mode
dominates a sign-LSH bucket. Every registered query runs against a corpus
with heavy skew planted into every join/group/blocking key and must
complete — the per-operator guards (AQE skew split, df-cap, band-cap,
hot-bucket cap, max_by instead of window-sort) are supposed to make skew a
cost problem, never a crash or a quadratic blowup.

Planted modes (sf0.001 base):
- ``lineitem``: ~30% of rows remapped to ONE existing ``l_orderkey`` —
  a 1,800-row fan-out through every orders⋈lineitem join and one hot
  group in every l_orderkey aggregation;
- ``orders``: ~30% of rows remapped to ONE ``o_custkey`` (mega-customer);
- ``documents``: ~30% of rows carry IDENTICAL text (boilerplate mode) —
  every shingle of the mode is df-hot, every minhash band is a mega-band,
  exact dedup collapses a third of the corpus;
- ``embeddings``: ~30% of rows carry an IDENTICAL vector — one sign-LSH
  bucket holds the mode, the hot-bucket cap's residual-drop path fires
  (identical vectors are unsplittable by extra planes, by design);
- ``events``: ~40% of rows remapped to ONE ``user_id`` — one mega session
  window / hot hopping-window key.

The sweep asserts completion; boundedness-under-skew of the capped
operators is asserted separately (tests/test_hot_bucket_cap.py,
tests/test_dedup_quality.py) and measured at sf0.01 in SCALING.md's
skew-probe table (scripts/skew_probe_r7.py).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.plans.registry import all_queries


@pytest.fixture(scope="session")
def skew_dir(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("skew_sf")
    for t in "region nation customer supplier part".split():
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.mode("overwrite").parquet(
            str(root / f"{t}.parquet")
        )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    hot_order = li.agg(F.min("l_orderkey")).first()[0]
    li.withColumn(
        "l_orderkey",
        F.when(F.col("l_orderkey") % 10 < 3, F.lit(hot_order)).otherwise(
            F.col("l_orderkey")
        ),
    ).write.mode("overwrite").parquet(str(root / "lineitem.parquet"))

    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    hot_cust = od.agg(F.min("o_custkey")).first()[0]
    od.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 10 < 3, F.lit(hot_cust)).otherwise(
            F.col("o_custkey")
        ),
    ).write.mode("overwrite").parquet(str(root / "orders.parquet"))

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mode_text = (
        docs.orderBy("doc_id").select("text").first()[0]
    )
    docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 10 < 3, F.lit(mode_text)).otherwise(F.col("text")),
    ).write.mode("overwrite").parquet(str(root / "documents.parquet"))

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mode_vec_df = emb.orderBy("vec_id").select(
        F.col("embedding").alias("_mode_vec")
    ).limit(1)
    emb.crossJoin(F.broadcast(mode_vec_df)).withColumn(
        "embedding",
        F.when(F.col("vec_id") % 10 < 3, F.col("_mode_vec")).otherwise(
            F.col("embedding")
        ),
    ).drop("_mode_vec").write.mode("overwrite").parquet(str(root / "embeddings.parquet"))

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hot_user = ev.agg(F.min("user_id")).first()[0]
    ev.withColumn(
        "user_id",
        F.when(F.col("event_id") % 10 < 4, F.lit(hot_user)).otherwise(
            F.col("user_id")
        ),
    ).write.mode("overwrite").parquet(str(root / "events.parquet"))
    return str(root)


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_skewed_input(name, spark, skew_dir):
    rows = all_queries()[name].fn(spark, skew_dir).collect()
    assert rows is not None
