"""Whole-registry unicode/outlier-text sweep.

Real corpora are not ASCII: CJK text has no whitespace (a whole sentence
is one "token" to a split-tokenizer), emoji and combining marks are
multi-codepoint, RTL scripts reverse visual order, zero-width characters
hide inside ASCII words, and document length is heavy-tailed (one ~300KB
mega-doc planted). Every registered query must complete — tokenizers,
shinglers, hashes, PII regexes, chunkers and language-ID must treat
unusual text as data, never as a crash, and the mega-doc must cost
itself (its own explode rows), not the partition.

Corpus transform shared via tests/_corpora.py (same rule as the dirty/
numeric/skew sweeps).
"""

from __future__ import annotations

import pytest

from postgres_cdc_reconciliation_spark.plans.registry import all_queries


@pytest.fixture(scope="session")
def unicode_dir(spark, sf_dir, tmp_path_factory):
    from tests._corpora import build_unicode_text

    root = tmp_path_factory.mktemp("unicode_sf")
    return build_unicode_text(spark, sf_dir, str(root))


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_unicode_input(name, spark, unicode_dir):
    rows = all_queries()[name].fn(spark, unicode_dir).collect()
    assert rows is not None
