"""Grouped-map applyInPandas surface demo (moved out of the hot query path).

q_grouped_demean runs as a native unbounded-frame window agg (no Python in
the plan); this test keeps the Arrow grouped-pandas path exercised and proves
the two implementations agree bit-for-bit: the pandas body computes the same
decimal-exact mean (integer cents, one float division) as the window's
SUM(DECIMAL)/COUNT, so `value - mean` is the identical IEEE subtraction.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.fixtures import events_df


def _native_demean(e):
    w = Window.partitionBy("user_id")
    mean_v = (
        F.sum(F.col("value").cast("decimal(12,2)")).over(w).cast("double")
        / F.count("*").over(w)
    )
    return e.select("event_id", "user_id", (F.col("value") - mean_v).alias("demeaned"))


def _pandas_demean(e):
    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = (pdf["value"] * 100).round().astype("int64")
        mean_v = (float(cents.sum()) / 100.0) / len(pdf)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "demeaned": pdf["value"] - mean_v,
            }
        )

    return e.groupBy("user_id").applyInPandas(
        demean, "event_id long, user_id long, demeaned double"
    )


def test_apply_in_pandas_demean_matches_native_window(spark, sf_dir):
    e = events_df(spark, sf_dir).select("event_id", "user_id", "value")
    native = {r["event_id"]: r["demeaned"] for r in _native_demean(e).collect()}
    arrow = {r["event_id"]: r["demeaned"] for r in _pandas_demean(e).collect()}
    assert len(native) == len(arrow) > 0
    # bit-for-bit: both sides do (exact-decimal sum → double) / n, then one
    # IEEE subtraction
    assert native == arrow


def test_native_demean_plan_has_no_python(spark, sf_dir):
    e = events_df(spark, sf_dir).select("event_id", "user_id", "value")
    plan = _native_demean(e)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
