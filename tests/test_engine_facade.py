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


def test_temporal_recon_facade(spark, sf_dir):
    """Round-5 facade methods delegate correctly (smoke + shape checks)."""
    from pyspark.sql import functions as F

    from postgres_cdc_reconciliation_spark import fixtures as fx
    from postgres_cdc_reconciliation_spark.engine import Engine

    eng = Engine(spark)
    log = spark.createDataFrame(
        [(1, "c", 10.0, 1), (1, "u", 11.0, 2), (2, "c", 20.0, 3),
         (2, "d", None, 4)],
        "id int, op string, val double, seq long",
    )
    hist = eng.scd2(log.filter("seq <= 2"), key="id", seq="seq",
                    attrs=["val"])
    merged = eng.scd2_merge(hist, log.filter("seq > 2"), key="id",
                            seq="seq", attrs=["val"])
    full = eng.scd2(log, key="id", seq="seq", attrs=["val"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )

    net = eng.compact_changelog(log, key_cols=["id"], attr_cols=["val"],
                                seq_col="seq")
    assert {r.id: r.net_op for r in net.collect()} == {1: "c"}

    trace = eng.kcore(
        spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1)], "u int, v int"
        ), k=2, rounds=2,
    )
    assert {(r.round, r.n_vertices) for r in trace.collect()} == {
        (1, 3), (2, 3)
    }

    src, tgt = fx.recon_pair(spark, sf_dir)
    fp = eng.fingerprint_diff(src, tgt, ["order_id"], n_buckets=16,
                              bucket_of=lambda df: F.col("order_id") % 16)
    assert fp.count() == 16
    prof = eng.profile_diff(src, tgt)
    assert prof.count() == 3

    iv = spark.createDataFrame(
        [(1, "a", "2026-01-01 00:00:00", "2026-01-01 02:00:00")],
        "k int, iid string, start string, end string",
    ).select("k", "iid", F.col("start").cast("timestamp").alias("start"),
             F.col("end").cast("timestamp").alias("end"))
    ov = eng.interval_overlap(iv, iv, on="k", l_id="iid", l_start="start",
                              l_end="end", r_id="iid", r_start="start",
                              r_end="end")
    assert ov.count() == 1


def test_pq_rerank_tolerates_zero_norm_vectors(spark):
    """The facade's exact-rerank step recomputes true cosine over the PQ
    shortlist: a zero-norm corpus vector reaching the shortlist must drop
    out of the reranked top-k — not raise under ANSI mode, not rank FIRST
    as NaN (the cosine_topk contract, which this inline rerank previously
    missed)."""
    import math

    from pyspark.sql import functions as F

    def vec(i):
        return [math.sin(0.7 * i + 0.31 * j) + 0.05 for j in range(16)]

    # ids 0..7 cover the k_codes=8 codebook seeds; 99 is the zero vector
    rows = [(i, vec(i)) for i in range(8)] + [(99, [0.0] * 16)]
    v = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    eng = Engine(spark)
    q = v.filter(F.col("vec_id") < 2)
    out = eng.similarity_topk_approx(
        q, v, k=3, method="pq", n_sub=8, d_sub=2, rerank=9
    ).collect()
    assert out
    assert all(r["neighbor_id"] != 99 for r in out)
    assert all(r["cos"] == r["cos"] for r in out)  # no NaN survives


def test_semantic_dedup_and_shards_facade(spark, sf_dir, tmp_path):
    """Round-10 facade methods delegate correctly (smoke + shape checks)."""
    from postgres_cdc_reconciliation_spark.engine import Engine

    eng = Engine(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sd = eng.semantic_dedup(emb, threshold=0.3, target_cluster_size=64)
    assert set(sd.columns) == {"vec_id", "cent_id", "keep"}
    assert sd.count() == emb.count()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    st = eng.shard_stats(docs, n_shards=4)
    assert st.count() == 4
    assert abs(sum(r["token_share"] for r in st.collect()) - 1.0) < 1e-9

    out = str(tmp_path / "shards")
    eng.write_shards(docs, out, n_shards=4)
    assert spark.read.parquet(out).count() == docs.count()


def test_quality_and_planner_facade(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    eng = Engine(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    split = eng.leakage_safe_split(docs)
    assert {"group_id", "split_bucket", "split"} <= set(split.columns)
    assert split.count() == docs.count()

    ev = fx.events_df(spark, sf_dir)
    rep = eng.skew_report(ev, ["event_type"], target_rows=50)
    assert rep.count() == ev.select("event_type").distinct().count()
    assert rep.filter("is_hot").count() > 0

    out = eng.robust_outliers(ev, "event_type", "value", id_cols=["event_id"])
    assert {"robust_z", "is_outlier"} <= set(out.columns)

    # stats-driven join: small dim broadcasts, result matches a plain join
    fact, dim = str(tmp_path / "f"), str(tmp_path / "d")
    spark.range(2000).select((F.col("id") % 10).alias("k"),
                             F.col("id").alias("v")).write.parquet(fact)
    spark.range(10).select(F.col("id").alias("dk"),
                           F.col("id").alias("lbl")).write.parquet(dim)
    plan = eng.join_plan(fact, dim, "k", "dk")
    assert plan["broadcast"] == "right"
    assert eng.stats_join(fact, dim, "k", "dk").count() == 2000


def test_target_lifecycle_facade(spark, tmp_path):
    """The manifest-target verbs ride the facade end-to-end: commit via
    operator, read/time-travel, compact, vacuum, and maintain all through
    Engine."""
    from pyspark.sql import functions as F

    from postgres_cdc_reconciliation_spark.operators.manifest_target import (
        commit_delta,
    )

    eng = Engine(spark)
    root = str(tmp_path / "t")
    df = spark.range(40).select(F.col("id").alias("k"),
                                (F.col("id") * 1.0).alias("v"))
    v0 = commit_delta(df, root, ["k"], list(range(4)), 4)
    commit_delta(df.repartition(8), root, ["k"], list(range(4)), 4)
    assert eng.read_target(root).count() == 40
    assert eng.read_target(root, version=v0).count() == 40  # time travel
    v2 = eng.compact_target(root, ["k"], 4)
    assert eng.read_target(root, version=v2).count() == 40
    removed = eng.vacuum_target(root, keep_manifests=2,
                                min_attempt_age_seconds=0.0)
    assert isinstance(removed, list) and removed  # superseded stage dirs went
    assert eng.read_target(root).count() == 40  # latest snapshot intact
    # time travel to the vacuumed version now fails loudly
    import pytest as _pytest

    with _pytest.raises(Exception):
        eng.read_target(root, version=v0).collect()
