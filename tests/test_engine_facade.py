"""Engine facade: the one-stop API a reference user migrates to."""

from __future__ import annotations

from postgres_cdc_reconciliation_spark import fixtures as fx
from postgres_cdc_reconciliation_spark.engine import Engine


def test_status_and_views(spark, sf_dir):
    eng = Engine(spark)
    bc = fx.batch_control_df(spark, sf_dir)
    slots, pubs = fx.slots_df(spark), fx.pubs_df(spark)

    latest = eng.latest_status(bc, slots, pubs, "public", "orders", as_of=fx.AS_OF)
    assert latest.count() == 1
    report = eng.health_report(
        bc, slots, pubs, ["public.orders", "public.customer"], as_of=fx.AS_OF
    )
    assert {r["table_name"] for r in report.collect()} == {"orders", "customer"}

    views = eng.register_views(sf_dir)
    assert "orders" in views and "events" in views
    n = spark.sql("SELECT COUNT(*) AS c FROM orders").collect()[0]["c"]
    assert n == spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    # events view is nanos-normalized and queryable in SQL
    assert spark.sql("SELECT MIN(ts) FROM events").collect()[0][0] is not None


def test_dedup_and_similarity_facade(spark, sf_dir):
    eng = Engine(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = eng.dedup_exact(docs)
    assert exact.count() <= docs.count()
    clusters = eng.dedup_fuzzy(docs)
    assert clusters.count() == docs.count()  # every doc mapped
    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    from pyspark.sql import functions as F

    top = eng.similarity_topk(v.filter(F.col("vec_id") < 4), v, k=3)
    assert top.count() == 4 * 3
