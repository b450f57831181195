"""Persisted inverted index (operators/retrieval.py::text_index_build/
text_index_admit/bm25_persisted): value-identity with the corpus-derived
bm25_scores, bucket-pruned reads, crash-safe incremental admits, and the
refit-safety contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.operators.retrieval import (
    bm25_persisted,
    bm25_scores,
    text_index_admit,
    text_index_build,
)

TERMS = ["spark", "vector", "query"]


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def idx(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("textidx") / "idx")
    meta = text_index_build(docs, path, n_buckets=16)
    return path, meta


def _sorted(df):
    return sorted(map(tuple, df.collect()))


class TestBuildAndQuery:
    def test_value_identical_to_corpus_scoring(self, spark, docs, idx):
        path, _ = idx
        got = _sorted(bm25_persisted(spark, path, TERMS))
        expect = _sorted(bm25_scores(docs, TERMS))
        assert got == expect

    def test_meta_counts(self, docs, idx):
        _, meta = idx
        assert meta["n_docs"] == docs.count()
        assert meta["n_buckets"] == 16

    def test_bucket_pruned_read(self, spark, idx):
        """A 1-term query must open ONLY its hash bucket's directory."""
        path, _ = idx
        one = bm25_persisted(spark, path, ["spark"])
        buckets = {
            f.split("bucket=")[1].split("/")[0]
            for f in one.inputFiles()
            if "bucket=" in f
        }
        assert len(buckets) == 1, buckets
        all_buckets = {
            f.split("bucket=")[1].split("/")[0]
            for f in spark.read.parquet(f"{path}/postings").inputFiles()
        }
        assert len(all_buckets) > 1  # pruning is non-vacuous
        assert one.count() > 0

    def test_topk_cut_deterministic(self, spark, idx):
        path, _ = idx
        top = bm25_persisted(spark, path, TERMS, k=5).collect()
        assert len(top) == 5
        allrows = sorted(
            bm25_persisted(spark, path, TERMS).collect(),
            key=lambda r: (-round(r["bm25"], 6), r["doc_id"]),
        )[:5]
        assert [r["doc_id"] for r in top] == [r["doc_id"] for r in allrows]

    def test_refuses_silent_rebuild(self, spark, docs, idx):
        path, _ = idx
        with pytest.raises(ValueError, match="already committed"):
            text_index_build(docs, path)

    def test_errors(self, spark, docs, idx):
        path, _ = idx
        with pytest.raises(ValueError, match="at least one"):
            bm25_persisted(spark, path, [])
        with pytest.raises(ValueError, match="must not contain"):
            bm25_persisted(spark, path, ["a.b"])
        with pytest.raises(ValueError, match="no committed text index"):
            bm25_persisted(spark, path + "_nowhere", ["spark"])
        with pytest.raises(ValueError, match="n_buckets"):
            text_index_build(docs, path + "_bad", n_buckets=0)


class TestAdmit:
    def test_incremental_equals_rebuild(self, spark, docs, tmp_path):
        half_a = docs.where(F.col("doc_id") % 2 == 0)
        half_b = docs.where(F.col("doc_id") % 2 == 1)
        inc = str(tmp_path / "inc")
        full = str(tmp_path / "full")
        text_index_build(half_a, inc, n_buckets=8)
        meta = text_index_admit(half_b, inc)
        text_index_build(docs, full, n_buckets=8)
        assert _sorted(bm25_persisted(spark, inc, TERMS)) == _sorted(
            bm25_persisted(spark, full, TERMS)
        )
        assert meta["n_docs"] == docs.count()
        # and both equal the corpus-derived scorer
        assert _sorted(bm25_persisted(spark, inc, TERMS)) == _sorted(
            bm25_scores(docs, TERMS)
        )

    def test_torn_admit_is_invisible(self, spark, docs, tmp_path):
        """A delta without its _COMMIT marker must not serve."""
        import os

        path = str(tmp_path / "torn")
        half_a = docs.where(F.col("doc_id") % 2 == 0)
        text_index_build(half_a, path, n_buckets=8)
        before = _sorted(bm25_persisted(spark, path, TERMS))
        text_index_admit(docs.where(F.col("doc_id") % 2 == 1), path)
        os.remove(f"{path}/delta/v=0/_COMMIT")
        assert _sorted(bm25_persisted(spark, path, TERMS)) == before

    def test_overwrite_discards_deltas(self, spark, docs, tmp_path):
        path = str(tmp_path / "ow")
        half_a = docs.where(F.col("doc_id") % 2 == 0)
        text_index_build(half_a, path, n_buckets=8)
        text_index_admit(docs.where(F.col("doc_id") % 2 == 1), path)
        text_index_build(half_a, path, n_buckets=8, overwrite=True)
        assert _sorted(bm25_persisted(spark, path, TERMS)) == _sorted(
            bm25_scores(half_a, TERMS)
        )


class TestEmptyResultSchema:
    """A query whose terms hash to no existing bucket dir must return an
    empty frame with the index's REAL schema — a hardcoded `doc_id long`
    breaks unions/joins for a string-id index (ADVICE r11)."""

    def _probe_missing_terms(self, spark, path, tries=200):
        # find a term whose bucket dir does NOT exist (tiny corpus, 64
        # buckets -> most are absent) so the empty-schema branch is the one
        # exercised; deterministic scan, no randomness
        import os

        from pyspark.sql import functions as F

        present = {
            int(d.split("=")[1])
            for d in os.listdir(f"{path}/postings")
            if d.startswith("bucket=")
        }
        for i in range(tries):
            t = f"zz_absent_{i}"
            b = (
                spark.createDataFrame([(t,)], "token string")
                .select(F.pmod(F.xxhash64("token"), F.lit(64)).alias("b"))
                .first()["b"]
            )
            if b not in present:
                return bm25_persisted(spark, path, [t])
        raise AssertionError("no absent-bucket term found")

    def test_string_id_index_empty_result_typed(self, spark, tmp_path):
        docs = spark.createDataFrame(
            [("doc-a", "alpha beta"), ("doc-b", "beta gamma")],
            "doc_id string, text string",
        )
        path = str(tmp_path / "sidx")
        text_index_build(docs, path, n_buckets=64)
        out = self._probe_missing_terms(spark, path)
        assert out.count() == 0
        assert dict(out.dtypes)["doc_id"] == "string"
        # the empty frame unions cleanly against a non-empty result
        hit = bm25_persisted(spark, path, ["alpha"])
        assert dict(hit.dtypes)["doc_id"] == "string"
        u = hit.select("doc_id", "bm25").unionByName(
            out.select("doc_id", "bm25")
        )
        assert {r["doc_id"] for r in u.collect()} == {"doc-a"}

    def test_long_id_index_unchanged(self, spark, tmp_path):
        docs = spark.createDataFrame(
            [(1, "alpha beta")], "doc_id long, text string"
        )
        path = str(tmp_path / "lidx")
        text_index_build(docs, path, n_buckets=64)
        out = self._probe_missing_terms(spark, path)
        assert out.count() == 0
        assert dict(out.dtypes)["doc_id"] == "bigint"
