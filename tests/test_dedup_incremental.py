"""Incremental LSH dedup: a batch probes a persisted band index and finds
planted near-dups against both the corpus and itself, without reshingling
the corpus."""

from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.operators.dedup import (
    incremental_near_dups,
    lsh_band_index,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden"
)


def test_incremental_finds_planted_dups(spark, tmp_path):
    corpus = spark.createDataFrame(
        [
            (1, BASE),
            (2, "completely different text about spark query planning and shuffles"),
            (3, "yet another unrelated document mentioning parquet footers only"),
        ],
        "doc_id bigint, text string",
    )
    # persist the index (the production shape: built once, read per batch)
    idx_path = str(tmp_path / "lsh_index")
    lsh_band_index(corpus).write.parquet(idx_path)
    index = spark.read.parquet(idx_path)

    batch = spark.createDataFrame(
        [
            (10, BASE + " tonight"),  # near-dup of corpus doc 1
            (11, "fresh novel content with no twin anywhere in this corpus"),
            (12, "fresh novel content with no twin anywhere in that corpus"),
        ],
        "doc_id bigint, text string",
    )
    hits = incremental_near_dups(batch, index).collect()
    pairs = {(r["new_id"], r["match_id"], r["match_src"]) for r in hits}
    assert (10, 1, "corpus") in pairs  # batch-vs-corpus
    assert (11, 12, "batch") in pairs  # intra-batch
    # the unrelated corpus docs never surface
    assert all(m not in (2, 3) for _, m, _ in pairs)


def test_index_append_only_growth(spark):
    corpus = spark.createDataFrame(
        [(1, BASE), (2, "unrelated doc about morning coffee rituals and rain")],
        "doc_id bigint, text string",
    )
    batch = spark.createDataFrame(
        [(10, BASE + " again")], "doc_id bigint, text string"
    )
    index = lsh_band_index(corpus)
    # after admission the batch's own band rows union in; a later twin of
    # doc 10 must then match it through the grown index
    grown = index.unionByName(lsh_band_index(batch))
    later = spark.createDataFrame(
        [(20, BASE + " again and again")], "doc_id bigint, text string"
    )
    hits = {
        (r["new_id"], r["match_id"])
        for r in incremental_near_dups(later, grown).collect()
    }
    assert (20, 10) in hits and (20, 1) in hits


def test_no_hits_for_novel_batch(spark):
    corpus = spark.createDataFrame([(1, BASE)], "doc_id bigint, text string")
    batch = spark.createDataFrame(
        [(10, "entirely disjoint vocabulary nothing shared at all here")],
        "doc_id bigint, text string",
    )
    assert incremental_near_dups(batch, lsh_band_index(corpus)).count() == 0
