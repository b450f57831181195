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


def test_ann_and_curation_facade(spark, sf_dir):
    from pyspark.sql import functions as F

    eng = Engine(spark)
    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = v.filter(F.col("vec_id") < 4)
    ivf = eng.similarity_topk_approx(q, v, k=3, method="ivf", nprobe=16)
    exact = eng.similarity_topk(q, v, k=3)
    # full probe == exact, through the facade too
    assert {(r["query_id"], r["rank"], r["neighbor_id"]) for r in ivf.collect()} == {
        (r["query_id"], r["rank"], r["neighbor_id"]) for r in exact.collect()
    }
    pq = eng.similarity_topk_approx(q, v, k=3, method="pq", n_sub=32, d_sub=2, rerank=20)
    assert pq.count() == 4 * 3

    pairs = eng.near_dup_pairs(v, dim=64, threshold=0.3, n_tables=2)
    assert pairs.filter(F.col("cos") < 0.3).count() == 0

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = eng.curate(docs, budget=1000)
    assert 0 < kept.count() < docs.count()
    assert kept.filter(F.col("cum_tokens") > 1000).count() == 0


def test_clustering_graph_incremental_facade(spark, sf_dir):
    from pyspark.sql import functions as F

    eng = Engine(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assigned, cents = eng.kmeans(emb, k=3, max_iter=2)
    assert assigned.count() == emb.count()
    assert cents.count() == 3

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src bigint, dst bigint"
    )
    ranks = eng.pagerank(edges, max_iter=5)
    assert abs(sum(r["rank"] for r in ranks.collect()) - 1.0) < 1e-9

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 4 != 1)
    batch = docs.filter(F.col("doc_id") % 4 == 1)
    idx = eng.dedup_index_build(corpus)
    hits = eng.dedup_incremental(batch, idx)
    assert {"new_id", "match_id", "match_src", "n_shared_bands"} <= set(
        hits.columns
    )
