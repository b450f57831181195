"""Whole-registry empty-input sweep.

At 100 TB, empty inputs are routine — a filter that matches nothing, a
partition with no files, a backfill over a quiet day. Every registered
query must either return an (empty or constant) result or raise one of the
DOCUMENTED loud preconditions below; an undocumented crash on empty input
is a bug (this sweep found two real ones in round 7: pq_encode_fast died
on `max()` of an empty codebook, and an empty manifest snapshot was
unreadable because nothing recorded its schema).
"""

from __future__ import annotations

import pytest

from postgres_cdc_reconciliation_spark.plans.registry import all_queries

# Queries whose contract REQUIRES data and says so loudly: a ValueError
# naming the precondition is the correct empty-input behavior. Keep this
# list justified — anything not listed must survive empty input.
_DOCUMENTED_PRECONDITIONS = {
    # k-means needs at least one point to seed centroids
    # farthest-first seeding now fails at dim inference (one scan earlier
    # than the old 'empty corpus' raise) — both are the documented loud
    # empty-precondition, so either message satisfies the pin
    "q_kmeans": "empty corpus|empty input",
    # the DTW query pivots on ONE driver-chosen query series; with no rows
    # there is no query key to band against
    "q_series_dtw": "query series",
    # an incremental probe needs a fitted index; fitting one from zero
    # vectors is meaningless and semantic_index_build says so loudly
    "q_semantic_dedup_incremental": "empty corpus",
    # a persisted IVF needs a coarse quantizer; an empty corpus yields
    # zero seed centroids and the build says so loudly
    "q_ann_ivf_persisted": "centroids must be non-empty",
    # SQ8 scales are fitted from corpus max-abs per dimension; an empty
    # corpus has no dimensionality to infer and sq_scales says so loudly
    "q_ann_sq": "empty corpus|empty input",
}


@pytest.fixture(scope="session")
def empty_dir(spark, sf_dir, tmp_path_factory):
    """Zero-row copies of every testdata table, schemas preserved."""
    root = tmp_path_factory.mktemp("empty_sf")
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(
            str(root / f"{t}.parquet")
        )
    return str(root)


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_empty_input(name, spark, empty_dir):
    spec = all_queries()[name]
    expected = _DOCUMENTED_PRECONDITIONS.get(name)
    if expected is not None:
        with pytest.raises(ValueError, match=expected):
            spec.fn(spark, empty_dir).collect()
        return
    rows = spec.fn(spark, empty_dir).collect()
    # no assertion on the count: a global aggregate legitimately returns
    # one row over empty input (COUNT(*) = 0 etc.) — surviving the run
    # with a well-formed result IS the contract
    assert rows is not None
