"""Mergeable-sketch aggregates: estimates within published error bounds of
exact answers, and merge-equals-rescan (the property that makes sketches
the incremental/partitioned answer at scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.operators.sketches import (
    hll_group_distinct,
    hll_rollup,
    kll_group_quantiles,
    theta_segment_algebra,
)


def _orders(spark):
    # 3 groups, overlapping member sets, known exact distincts
    rows = [(f"g{i % 3}", i % 1000) for i in range(20000)]
    return spark.createDataFrame(rows, "seg string, member long")


def test_hll_group_estimates_within_bounds(spark):
    df = _orders(spark)
    est = {
        r["seg"]: r["approx_distinct"]
        for r in hll_group_distinct(df, "seg", "member").collect()
    }
    exact = {
        r["seg"]: r["n"]
        for r in df.groupBy("seg")
        .agg(F.countDistinct("member").alias("n"))
        .collect()
    }
    for g in exact:
        assert abs(est[g] - exact[g]) / exact[g] < 0.05, (g, est[g], exact[g])


def test_hll_rollup_merges_group_sketches(spark):
    df = _orders(spark)
    sketches = hll_group_distinct(df, "seg", "member")
    [r] = hll_rollup(sketches).collect()
    exact = df.select("member").distinct().count()  # 1000 (groups overlap)
    assert abs(r["approx_distinct_total"] - exact) / exact < 0.05
    # distinct counts don't sum: the naive rollup would be ~3x off
    naive = sum(
        x["approx_distinct"] for x in sketches.collect()
    )
    assert naive > 2.5 * exact


def test_theta_algebra_matches_exact_set_ops(spark):
    # A = {0..599}, B = {400..999}: |A∩B| = 200, |A\B| = 400, |A∪B| = 1000
    rows = [("a", i) for i in range(600)] + [("b", i) for i in range(400, 1000)]
    df = spark.createDataFrame(rows, "seg string, member long")
    [r] = theta_segment_algebra(df, "seg", "member", "a", "b").collect()
    for col, exact in [
        ("n_a", 600),
        ("n_b", 600),
        ("n_union", 1000),
        ("n_intersect", 200),
        ("n_a_only", 400),
    ]:
        assert abs(r[col] - exact) / exact < 0.06, (col, r[col], exact)


def test_kll_quantiles_close_to_exact(spark):
    df = spark.range(10000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.col("id").cast("double").alias("v"),
    )
    out = {r["g"]: r for r in kll_group_quantiles(df, "g", "v").collect()}
    # values are ~uniform over [0, 10000): q50 ≈ 5000, q90 ≈ 9000
    for g in ("0", "1"):
        assert abs(out[g]["q_50"] - 5000) < 500
        assert abs(out[g]["q_90"] - 9000) < 500
        assert out[g]["q_99"] > out[g]["q_90"] > out[g]["q_50"]
