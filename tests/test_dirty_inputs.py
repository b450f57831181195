"""Whole-registry dirty-row sweep.

Real corpora carry malformed rows — NULL text, empty/whitespace-only
documents, NULL or truncated embedding arrays. At 100 TB a single dirty
row must cost itself (drop out of the affected computation), never the
job. Every registered query runs against a corpus with dirt injected into
``documents.text`` and ``embeddings.embedding`` and must complete.

This sweep found seven real crashes in round 7:
- the per-bucket gemm scorer crashed ``np.stack`` on mixed-length buckets
  (now: one gemm per length group — exact parity with the SQL fold, whose
  zip_with-padded dot NULLs out cross-length pairs);
- the pair-cosine einsum UDF had the same mixed-length ``np.stack`` crash;
- ``pq_encode_fast``/``pq_encode``/``pq_topk`` crashed reshaping malformed
  vectors (now: size != n_sub*d_sub rows are dropped, both encoders
  agreeing);
- ``q_repetition``'s 2-gram transform hit the descending-``sequence()``
  footgun on one-token docs (slice start 0), and its 2-gram share divided
  0/0 under ANSI;
- k-means indexed ``_v[i]`` past the end of empty arrays in the per-dim
  avg (now: well-formed vectors only, dim inferred by max(size)).
"""

from __future__ import annotations

import pytest

from postgres_cdc_reconciliation_spark.plans.registry import all_queries


@pytest.fixture(scope="session")
def dirty_dir(spark, sf_dir, tmp_path_factory):
    """sf0.001 with dirt: ~3/17 of documents NULL/empty/whitespace text,
    ~2/23 of embeddings NULL/empty arrays. The transform lives in
    tests/_corpora.py (shared with the determinism-sweep script so the
    test and the sweep measure the SAME corpus)."""
    from tests._corpora import build_dirty_text

    root = tmp_path_factory.mktemp("dirty_sf")
    return build_dirty_text(spark, sf_dir, str(root))


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_dirty_input(name, spark, dirty_dir):
    rows = all_queries()[name].fn(spark, dirty_dir).collect()
    assert rows is not None
