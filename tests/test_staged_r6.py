"""Pre-verification of the round-6 staged queries (plans/staged_r6.py):
the same Spark-vs-DuckDB compare the driver gate runs, so promotion in
round 6 is a mechanical move, not new risk."""

from __future__ import annotations

import pytest

from postgres_cdc_reconciliation_spark.plans.staged_r6 import (
    STAGED,
    staged_oracles,
)
from tests.test_oracle_parity import compare, duck_con


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_query_matches_oracle(spark, sf_dir, name):
    fn = STAGED[name][0]
    sql = staged_oracles()[name]
    spark_pdf = fn(spark, sf_dir).toPandas()
    duck_pdf = duck_con(sf_dir).execute(sql).fetchdf()
    assert len(spark_pdf) > 0, f"{name}: vacuous (0 rows)"
    compare(name, spark_pdf, duck_pdf)
