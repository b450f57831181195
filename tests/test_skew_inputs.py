"""Whole-registry planted-skew sweep.

At 100 TB the data is never uniform: one mega-customer owns a third of the
orders, one boilerplate string is a third of the corpus, one embedding mode
dominates a sign-LSH bucket. Every registered query runs against a corpus
with heavy skew planted into every join/group/blocking key and must
complete — the per-operator guards (AQE skew split, df-cap, band-cap,
hot-bucket cap, max_by instead of window-sort) are supposed to make skew a
cost problem, never a crash or a quadratic blowup.

Planted modes (sf0.001 base):
- ``lineitem``: ~30% of rows remapped to ONE existing ``l_orderkey`` —
  a 1,800-row fan-out through every orders⋈lineitem join and one hot
  group in every l_orderkey aggregation;
- ``orders``: ~30% of rows remapped to ONE ``o_custkey`` (mega-customer);
- ``documents``: ~30% of rows carry IDENTICAL text (boilerplate mode) —
  every shingle of the mode is df-hot, every minhash band is a mega-band,
  exact dedup collapses a third of the corpus;
- ``embeddings``: ~30% of rows carry an IDENTICAL vector — one sign-LSH
  bucket holds the mode, the hot-bucket cap's residual-drop path fires
  (identical vectors are unsplittable by extra planes, by design);
- ``events``: ~40% of rows remapped to ONE ``user_id`` — one mega session
  window / hot hopping-window key.

The sweep asserts completion; boundedness-under-skew of the capped
operators is asserted separately (tests/test_hot_bucket_cap.py,
tests/test_dedup_quality.py) and measured at sf0.01 in SCALING.md's
skew-probe table (scripts/skew_probe_r7.py).
"""

from __future__ import annotations

import pytest

from postgres_cdc_reconciliation_spark.plans.registry import all_queries


@pytest.fixture(scope="session")
def skew_dir(spark, sf_dir, tmp_path_factory):
    """Planted-skew corpus; the transform lives in tests/_corpora.py
    (shared with scripts/skew_probe_r7.py and the determinism sweep so
    every consumer measures the SAME corpus)."""
    from tests._corpora import build_skew

    root = tmp_path_factory.mktemp("skew_sf")
    return build_skew(spark, sf_dir, str(root))


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_skewed_input(name, spark, skew_dir):
    rows = all_queries()[name].fn(spark, skew_dir).collect()
    assert rows is not None
