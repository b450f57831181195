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


def _zipf_df(spark):
    """Deterministic skew: value v repeated ~1000/v times, v in 1..60 —
    value 1 is a 17% heavy hitter, the tail is light."""
    rows = [(v,) for v in range(1, 61) for _ in range(1000 // v)]
    return spark.createDataFrame(rows, "v long")


def test_cms_estimate_one_sided_and_bounded(spark):
    import math

    from postgres_cdc_reconciliation_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    df = _zipf_df(spark)
    n = df.count()
    w, d = 512, 4
    cms = cms_build(df, "v", width=w, depth=d)
    exact = {r["v"]: r["c"] for r in df.groupBy("v").agg(
        F.count("*").alias("c")).collect()}
    est = {r["v"]: r["est"] for r in cms_estimate(
        cms, df, "v", width=w, depth=d).collect()}
    assert set(est) == set(exact)
    bound = math.e / w * n  # Cormode-Muthukrishnan additive error
    for v, c in exact.items():
        assert est[v] >= c, f"underestimate at {v}"
        assert est[v] <= c + bound, f"est {est[v]} > {c} + {bound:.1f} at {v}"


def test_cms_merge_equals_whole_build(spark):
    from postgres_cdc_reconciliation_spark.operators.sketches import (
        cms_build,
        cms_merge,
    )

    df = _zipf_df(spark)
    half_a = df.where(F.col("v") % 2 == 0)
    half_b = df.where(F.col("v") % 2 != 0)
    merged = cms_merge(
        cms_build(half_a, "v", width=256, depth=3),
        cms_build(half_b, "v", width=256, depth=3),
    )
    whole = cms_build(df, "v", width=256, depth=3)
    a = sorted(map(tuple, merged.collect()))
    b = sorted(map(tuple, whole.collect()))
    assert a == b


def test_heavy_hitters_no_false_negatives(spark):
    from postgres_cdc_reconciliation_spark.operators.sketches import (
        heavy_hitters,
    )

    df = _zipf_df(spark)
    n = df.count()
    phi = 0.05
    exact_hitters = {
        r["v"]
        for r in df.groupBy("v").agg(F.count("*").alias("c"))
        .where(F.col("c") >= phi * n).collect()
    }
    got = {r["v"]: r["est"] for r in heavy_hitters(
        df, "v", min_fraction=phi, width=512, depth=4).collect()}
    assert exact_hitters <= set(got)  # the CMS guarantee: none missed
    # false positives are bounded near-hitters, never arbitrary values
    exact = {r["v"]: r["c"] for r in df.groupBy("v").agg(
        F.count("*").alias("c")).collect()}
    import math

    for v in got:
        assert exact[v] >= phi * n - math.e / 512 * n


def test_heavy_hitters_validation_and_empty(spark):
    import pytest

    from postgres_cdc_reconciliation_spark.operators.sketches import (
        cms_build,
        heavy_hitters,
    )

    df = _zipf_df(spark)
    with pytest.raises(ValueError, match="min_fraction"):
        heavy_hitters(df, "v", min_fraction=0.0)
    with pytest.raises(ValueError, match="width/depth"):
        cms_build(df, "v", width=0)
    empty = spark.createDataFrame([], "v long")
    assert heavy_hitters(empty, "v", min_fraction=0.5).count() == 0
    # NULLs are not members
    withnull = spark.createDataFrame([(1,), (None,), (1,)], "v long")
    got = heavy_hitters(withnull, "v", min_fraction=0.5).collect()
    assert [(r["v"], r["est"]) for r in got] == [(1, 2)]
