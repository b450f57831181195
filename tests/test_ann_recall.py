"""Recall quality gates for the approximate ANN tiers (IVF multi-probe, PQ).

Approximate indexes earn their keep only if they find most of what exact
search finds — a bucketing scheme with chance-level recall is a shuffle
optimization of a wrong answer. Floors below are set well under measured
values on the gaussian testdata (IVF/PQ's worst case — no cluster
structure): PQ recall@5 measured 0.66-0.70, shortlist@20 0.975-0.988;
IVF nprobe=4 measured 0.31-0.45, nprobe=8 measured 0.68-0.73. The chance
floor (5 of ~500 at random) is 0.01.

Hard correctness property: IVF with nprobe = n_cent scans every inverted
list, so it must reproduce brute force EXACTLY (ids and ranks) — any
divergence is a bug in assignment/probe plumbing, not an approximation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.operators.similarity import (
    _dot,
    cosine_topk,
    ivf_centroids,
    ivf_topk_multiprobe,
    pq_codebooks,
    pq_encode,
    pq_topk,
    rp_near_dup_pairs_multi,
    with_norm,
)


def _exact_pairs(spark, sf_dir, k=5):
    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = v.filter(F.col("vec_id") < 16)
    return v, q, {
        (r["query_id"], r["neighbor_id"]) for r in cosine_topk(q, v, k=k).collect()
    }


def _recall(found, exact):
    return len(found & exact) / len(exact)


def test_ivf_multiprobe_recall_monotone(spark, sf_dir):
    v, q, exact = _exact_pairs(spark, sf_dir)
    cents = ivf_centroids(v, n_cent=16, seed_lo=16)
    rec = {}
    for nprobe in (4, 8):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk_multiprobe(q, v, cents, k=5, nprobe=nprobe).collect()
        }
        rec[nprobe] = _recall(got, exact)
    assert rec[4] >= 0.25, rec
    assert rec[8] >= 0.55, rec
    assert rec[8] >= rec[4], rec


def test_ivf_full_probe_equals_brute_force(spark, sf_dir):
    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = v.filter(F.col("vec_id") < 16)
    cents = ivf_centroids(v, n_cent=16, seed_lo=16)
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk(q, v, k=5).collect()
    }
    full = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_topk_multiprobe(q, v, cents, k=5, nprobe=16).collect()
    }
    assert full == exact


def test_pq_recall_and_shortlist(spark, sf_dir):
    v, q, exact = _exact_pairs(spark, sf_dir)
    books = pq_codebooks(v, n_sub=32, d_sub=2, k_codes=64)
    codes = pq_encode(v, books, n_sub=32, d_sub=2)
    top5 = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(q, codes, books, k=5, n_sub=32, d_sub=2).collect()
    }
    short20 = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(q, codes, books, k=20, n_sub=32, d_sub=2).collect()
    }
    assert _recall(top5, exact) >= 0.5
    # rerank path: a 20-candidate shortlist from codes alone retains nearly
    # all of the exact top-5 — the production pattern is PQ-shortlist then
    # exact-rerank on the shortlist only.
    assert _recall(short20, exact) >= 0.9


def test_rp_multitable_recall_monotone_no_false_positives(spark, sf_dir):
    """L independent LSH tables lift recall (1-(1-p)^L); the exact-cosine
    verification step means precision is ALWAYS 1.0 — any pair reported must
    also appear in the brute-force set. Measured recall at threshold 0.3:
    0.14-0.16 (L=1), 0.45-0.47 (L=4), 0.71-0.72 (L=8)."""
    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    vn = with_norm(v)
    a, b = vn.alias("a"), vn.alias("b")
    brute = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            (
                _dot("a.embedding", "b.embedding")
                / (F.col("a._norm") * F.col("b._norm"))
            ).alias("cos"),
        )
        .filter(F.col("cos") >= 0.3)
    )
    exact = {(r["id_a"], r["id_b"]) for r in brute.collect()}
    rec = {}
    for n_tables in (1, 4):
        got = {
            (r["id_a"], r["id_b"])
            for r in rp_near_dup_pairs_multi(
                v, dim=64, threshold=0.3, n_tables=n_tables
            ).collect()
        }
        assert got <= exact  # verification step: zero false positives
        rec[n_tables] = len(got & exact) / len(exact)
    assert rec[1] >= 0.05, rec
    assert rec[4] >= 0.3, rec
    assert rec[4] > rec[1], rec


def test_pq_codes_complete_and_bounded(spark, sf_dir):
    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = pq_codebooks(v, n_sub=32, d_sub=2, k_codes=64)
    codes = pq_encode(v, books, n_sub=32, d_sub=2)
    n = v.count()
    agg = codes.agg(
        F.count("*").alias("rows"),
        F.countDistinct("vec_id").alias("vecs"),
        F.min("code").alias("lo"),
        F.max("code").alias("hi"),
    ).first()
    assert agg["rows"] == n * 32  # every vector fully encoded
    assert agg["vecs"] == n
    assert 0 <= agg["lo"] and agg["hi"] < 64


def test_pq_encode_fast_agrees_exactly(spark, sf_dir):
    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = pq_codebooks(v, n_sub=32, d_sub=2, k_codes=64)
    from postgres_cdc_reconciliation_spark.operators.similarity import (
        pq_encode_fast,
    )

    slow = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in pq_encode(v, books, n_sub=32, d_sub=2).collect()
    }
    fast = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in pq_encode_fast(v, books, n_sub=32, d_sub=2).collect()
    }
    assert fast == slow


def test_rp_numpy_scorer_agrees(spark, sf_dir):
    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sql_pairs = {
        (r["id_a"], r["id_b"])
        for r in rp_near_dup_pairs_multi(
            v, dim=64, threshold=0.3, n_tables=2
        ).collect()
    }
    np_pairs = {
        (r["id_a"], r["id_b"])
        for r in rp_near_dup_pairs_multi(
            v, dim=64, threshold=0.3, n_tables=2, scorer="numpy"
        ).collect()
    }
    # identical pair sets (testdata margin to the threshold is >>  the
    # last-ulp summation difference between fold and einsum)
    assert np_pairs == sql_pairs


def test_rp_matrix_scorer_agrees(spark, sf_dir):
    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sql_pairs = {
        (r["id_a"], r["id_b"])
        for r in rp_near_dup_pairs_multi(
            v, dim=64, threshold=0.3, n_tables=2
        ).collect()
    }
    mx_pairs = {
        (r["id_a"], r["id_b"])
        for r in rp_near_dup_pairs_multi(
            v, dim=64, threshold=0.3, n_tables=2, scorer="matrix"
        ).collect()
    }
    assert mx_pairs == sql_pairs


def test_all_scorers_agree_on_dirty_vectors(spark, sf_dir):
    """Scorer contract under dirt: NULL, empty, and truncated embeddings
    must produce IDENTICAL pair sets across sql / numpy / matrix scorers —
    the SQL fold's semantics (cross-length pairs NULL out via zip_with
    padding, zero-norm pairs drop via try_divide) are the contract the
    vectorized paths mirror with per-length-group batching. Same-length
    truncated vectors may legitimately pair with each other."""
    from pyspark.sql import functions as F

    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "embedding",
        F.when(F.col("vec_id") % 23 == 20, F.lit(None).cast("array<float>"))
        .when(F.col("vec_id") % 23 == 21, F.expr("array()").cast("array<float>"))
        .when(F.col("vec_id") % 23 == 22, F.expr("slice(embedding, 1, 8)"))
        .otherwise(F.col("embedding")),
    )
    results = {
        scorer: {
            (r["id_a"], r["id_b"])
            for r in rp_near_dup_pairs_multi(
                v, dim=64, threshold=0.3, n_tables=2, scorer=scorer
            ).collect()
        }
        for scorer in ("sql", "numpy", "matrix")
    }
    assert results["numpy"] == results["sql"]
    assert results["matrix"] == results["sql"]
    assert results["sql"]  # dirt must not empty the result outright
