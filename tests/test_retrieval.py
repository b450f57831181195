"""BM25 + RRF retrieval operators (operators/retrieval.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.operators.retrieval import (
    bm25_scores,
    hybrid_rrf_topk,
    rrf_fuse,
)

DOCS = [
    (1, "spark shuffle spark join"),
    (2, "vector index"),
    (3, "plain text with nothing relevant"),
    (4, "spark vector spark vector spark"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_matches_hand_computation(spark, docs):
    rows = {
        r["doc_id"]: r
        for r in bm25_scores(docs, ["spark", "vector"]).collect()
    }
    # docs 1, 2, 4 match ≥1 term; doc 3 matches none
    assert set(rows) == {1, 2, 4}
    # hand-compute doc 2's 'vector' score: N=4, df(vector)=2, tf=1, dl=2,
    # avgdl=(4+2+5+5)/4
    n, df_v, tf, dl, avgdl = 4, 2, 1, 2, 16 / 4
    idf = math.log(1 + (n - df_v + 0.5) / (df_v + 0.5))
    expected = round(idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 6)
    assert rows[2]["s_vector"] == expected
    assert rows[2]["s_spark"] == 0.0
    assert rows[2]["bm25"] == expected
    # doc 4 matches both terms: total is the sum of the per-term columns
    r4 = rows[4]
    assert r4["bm25"] == r4["s_spark"] + r4["s_vector"] > 0


def test_bm25_rejects_empty_terms(docs):
    with pytest.raises(ValueError, match="at least one"):
        bm25_scores(docs, [])


def test_rrf_fuse_orders_and_nulls(spark):
    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, r_a long")
    b = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, r_b long")
    out = {r["doc_id"]: r for r in rrf_fuse([a, b], rank_cols=["r_a", "r_b"]).collect()}
    assert out[1]["r_b"] is None and out[3]["r_a"] is None
    assert out[2]["rrf"] == round(1 / 62 + 1 / 61, 6)  # both systems
    assert out[1]["rrf"] == round(1 / 61, 6)
    # doc surfaced by both systems outranks single-system docs here
    assert out[2]["rrf"] > max(out[1]["rrf"], out[3]["rrf"])


def test_hybrid_topk_runs_on_testdata(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = hybrid_rrf_topk(docs, emb, ["spark", "vector"], query_vec_id=0, k=5)
    rows = out.collect()
    assert len(rows) == 5
    # fused scores are non-increasing with doc_id tie-break
    scores = [r["rrf_r"] for r in rows]
    assert scores == sorted(scores, reverse=True)
