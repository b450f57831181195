"""Exact duplicated-span coverage (operators/dedup.py::duplicate_span_stats):
planted corpora with hand-computable interval unions — shared spans count,
overlapping windows union (never double-count), short/unique docs report 0,
and the hot-gram cap only ever reduces coverage."""

from __future__ import annotations

import pytest

from postgres_cdc_reconciliation_spark.operators.dedup import (
    duplicate_span_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


CORPUS = [
    (0, "a b c d x1 x2 x3"),        # shares "a b c d" with doc 1
    (1, "z1 a b c d z2 z3"),
    (2, "p p p p p p"),             # self-repeating: all 3 grams dup'd
    (3, "q r s"),                   # shorter than k: no windows
    (4, "u1 u2 u3 u4 u5"),          # unique content
]


def test_planted_spans_exact_coverage(spark):
    out = {
        r["doc_id"]: r
        for r in duplicate_span_stats(_docs(spark, CORPUS), k=4).collect()
    }
    assert len(out) == 5
    assert (out[0]["n_tokens"], out[0]["dup_tokens"]) == (7, 4)
    assert (out[1]["n_tokens"], out[1]["dup_tokens"]) == (7, 4)
    # doc 2: grams at pos 0,1,2 each occur 3x; union [0,4)+[1,5)+[2,6) = 6
    assert (out[2]["n_tokens"], out[2]["dup_tokens"]) == (6, 6)
    assert out[2]["dup_fraction"] == 1.0
    assert (out[3]["n_tokens"], out[3]["dup_tokens"]) == (3, 0)
    assert (out[4]["n_tokens"], out[4]["dup_tokens"]) == (5, 0)
    assert out[0]["dup_fraction"] == 4 / 7


def test_overlapping_windows_union_not_sum(spark):
    # "a..i" contains two overlapping duplicated 8-grams (pos 0 and 1,
    # each mirrored in a partner doc): coverage is the 9-token union,
    # not 16
    t9 = "t1 t2 t3 t4 t5 t6 t7 t8 t9"
    rows = [
        (0, t9),
        (1, "x " + " ".join(t9.split()[:8])),   # duplicates gram at pos 0
        (2, " ".join(t9.split()[1:]) + " y"),   # duplicates gram at pos 1
    ]
    out = {
        r["doc_id"]: r["dup_tokens"]
        for r in duplicate_span_stats(_docs(spark, rows), k=8).collect()
    }
    assert out[0] == 9


def test_hot_gram_cap_only_reduces_coverage(spark):
    uncapped = {
        r["doc_id"]: r["dup_tokens"]
        for r in duplicate_span_stats(_docs(spark, CORPUS), k=4).collect()
    }
    capped = {
        r["doc_id"]: r["dup_tokens"]
        for r in duplicate_span_stats(
            _docs(spark, CORPUS), k=4, max_gram_freq=2
        ).collect()
    }
    # the p-run gram occurs 3x > cap: doc 2 loses its coverage; the
    # count-2 shared span is untouched
    assert capped[2] == 0
    assert capped[0] == uncapped[0] == 4
    for d in capped:
        assert capped[d] <= uncapped[d]


def test_validation(spark):
    with pytest.raises(ValueError, match="k must be"):
        duplicate_span_stats(_docs(spark, CORPUS), k=0)
    with pytest.raises(ValueError, match="min_count"):
        duplicate_span_stats(_docs(spark, CORPUS), min_count=1)


def test_empty_corpus_schema(spark):
    out = duplicate_span_stats(_docs(spark, []), k=4)
    assert out.count() == 0
    assert out.columns == ["doc_id", "n_tokens", "dup_tokens", "dup_fraction"]


# --- strip_duplicate_spans: the cleaning transform --------------------------


def test_strip_removes_exactly_the_covered_tokens(spark):
    from postgres_cdc_reconciliation_spark.operators.dedup import (
        strip_duplicate_spans,
    )

    out = {
        r["doc_id"]: r
        for r in strip_duplicate_spans(_docs(spark, CORPUS), k=4).collect()
    }
    assert len(out) == 5
    # doc 0: "a b c d" cut, tail survives in order
    assert (out[0]["kept_tokens"], out[0]["clean_text"]) == (3, "x1 x2 x3")
    # doc 1: shared span is mid-doc — both flanks survive, order preserved
    assert (out[1]["kept_tokens"], out[1]["clean_text"]) == (3, "z1 z2 z3")
    # doc 2: fully duplicated -> empty, not NULL
    assert (out[2]["kept_tokens"], out[2]["clean_text"]) == (0, "")
    # docs 3/4: untouched pass-through
    assert out[3]["clean_text"] == "q r s"
    assert out[4]["clean_text"] == "u1 u2 u3 u4 u5"


def test_strip_complements_stats_exactly(spark):
    from postgres_cdc_reconciliation_spark.operators.dedup import (
        strip_duplicate_spans,
    )

    stats = {
        r["doc_id"]: r
        for r in duplicate_span_stats(_docs(spark, CORPUS), k=4).collect()
    }
    strip = {
        r["doc_id"]: r
        for r in strip_duplicate_spans(_docs(spark, CORPUS), k=4).collect()
    }
    for d in stats:
        # same hits, complementary sides of the interval union
        assert stats[d]["dup_tokens"] + strip[d]["kept_tokens"] \
            == stats[d]["n_tokens"], d


def test_strip_hot_gram_cap_only_preserves_more(spark):
    from postgres_cdc_reconciliation_spark.operators.dedup import (
        strip_duplicate_spans,
    )

    # "h h h h" appears in 5 docs -> capped out at max_gram_freq=3, so its
    # windows are NOT removed (recall-only: under-clean, never over-remove)
    rows = [(i, f"h h h h m{i}") for i in range(5)]
    uncapped = {
        r["doc_id"]: r["kept_tokens"]
        for r in strip_duplicate_spans(_docs(spark, rows), k=4).collect()
    }
    capped = {
        r["doc_id"]: r["kept_tokens"]
        for r in strip_duplicate_spans(
            _docs(spark, rows), k=4, max_gram_freq=3
        ).collect()
    }
    for d in uncapped:
        assert uncapped[d] == 1 and capped[d] == 5, d


def test_strip_empty_corpus_and_validation(spark):
    from postgres_cdc_reconciliation_spark.operators.dedup import (
        strip_duplicate_spans,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = strip_duplicate_spans(empty, k=4)
    assert out.columns == ["doc_id", "n_tokens", "kept_tokens", "clean_text"]
    assert out.count() == 0
    with pytest.raises(ValueError, match="k must be"):
        strip_duplicate_spans(empty, k=0)
    with pytest.raises(ValueError, match="min_count"):
        strip_duplicate_spans(empty, min_count=1)
