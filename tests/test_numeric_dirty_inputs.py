"""Whole-registry numeric-dirt sweep.

The round-7 dirty-row sweep (tests/test_dirty_inputs.py) covered NULL/empty
TEXT and embeddings; this one covers the numeric half of real-corpus dirt:
NaN / ±Inf / NULL / negative / extreme-magnitude doubles in every measure
column, NaN-and-Inf COMPONENTS inside otherwise well-formed embedding
vectors, malformed JSON in ``events.props``, and one far-future timestamp
outlier (the classic grid-explosion hazard for anything that builds a
min→max time range). Every registered query must complete — a dirty value
may propagate (NaN in, NaN out) but must never kill the job or blow up an
intermediate.

Spark-specific hazards this is aimed at: NaN sorts ABOVE every double in
ORDER BY/windows (unlike the SQL NULL rules), ±Inf arithmetic produces
NaN on subtraction, ANSI mode raises on some NaN→int casts, and
``sequence()`` on an outlier-stretched range tries to materialize the
whole span.
"""

from __future__ import annotations

import pytest

from postgres_cdc_reconciliation_spark.plans.registry import all_queries


@pytest.fixture(scope="session")
def numdirty_dir(spark, sf_dir, tmp_path_factory):
    """Numeric-dirt corpus; the transform lives in tests/_corpora.py
    (shared with the determinism-sweep script so the test and the sweep
    measure the SAME corpus)."""
    from tests._corpora import build_numeric_dirty

    root = tmp_path_factory.mktemp("numdirty_sf")
    return build_numeric_dirty(spark, sf_dir, str(root))


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_numeric_dirty_input(name, spark, numdirty_dir):
    rows = all_queries()[name].fn(spark, numdirty_dir).collect()
    assert rows is not None
