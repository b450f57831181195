#!/usr/bin/env python
"""Determinism sweep over the DIRTY corpora (round-7 session 3).

The clean-corpus sweep proves partition-invariance where ordering keys
are unique by construction. Dirty data is the harder case: NULL text,
NaN/Inf measures, duplicated keys/texts/vectors CREATE ordering ties
(duplicate LSNs, tied timestamps, equal scores), and an arrival-ordered
tie resolution — max_by, lead(), last(ignorenulls), row_number — is
exactly the class of partition-dependence this round's hardening fixed.

Builds the three dirty-corpus variants from sf0.001 with the SAME
transforms as their sweep-test fixtures (tests/test_dirty_inputs.py,
tests/test_numeric_dirty_inputs.py, tests/test_skew_inputs.py), then
runs every registered query under (local[3], 5 shuffle partitions) vs
(local[16], 32) and compares full sorted result sets.

Usage: python scripts/dirty_determinism_sweep_r7.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402

BASE = "/root/testdata/sf0.001"
ROOT = "/tmp/pcr_dirty_determinism"


def build(spark) -> dict[str, str]:
    """The three dirty corpora, built by the SAME shared transforms the
    sweep tests use (tests/_corpora.py) — the review pass caught an
    earlier inline copy silently missing four of the numeric-dirt
    mutations, which would have overstated the sweep's coverage."""
    from tests._corpora import build_dirty_text, build_numeric_dirty, build_skew

    return {
        "dirty": build_dirty_text(spark, BASE, f"{ROOT}/dirty"),
        "numdirty": build_numeric_dirty(spark, BASE, f"{ROOT}/numdirty"),
        "skew": build_skew(spark, BASE, f"{ROOT}/skew"),
    }


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    corpora = build(spark)
    spark.stop()

    from determinism_sweep import compare

    failures = {}
    for label, path in corpora.items():
        diff = compare(path)
        if diff:
            failures[label] = diff
    if failures:
        print("FAIL:", failures)
        sys.exit(1)
    print("OK: all corpora partition-invariant")


if __name__ == "__main__":
    main()
