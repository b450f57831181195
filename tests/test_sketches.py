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


# --- KMV (bottom-k) sketches: deterministic, mergeable, engine-portable ---


def _kmv(spark):
    # 30k rows over exactly 1000 distinct members
    rows = [(i % 1000,) for i in range(30000)]
    return spark.createDataFrame(rows, "member long")


def test_kmv_distinct_estimate_within_bounds(spark):
    from postgres_cdc_reconciliation_spark.operators.sketches import (
        kmv_build,
        kmv_distinct,
    )

    sk = kmv_build(_kmv(spark), "member", k=256)
    [r] = kmv_distinct(sk, k=256).collect()
    assert r["n_hashes"] == 256
    # SE ~ 1/sqrt(k-2) = 6.3%; 3 sigma = 19%
    assert abs(r["est_distinct"] - 1000) / 1000 < 0.19, r["est_distinct"]


def test_kmv_exact_when_universe_below_k(spark):
    from postgres_cdc_reconciliation_spark.operators.sketches import (
        kmv_build,
        kmv_distinct,
    )

    small = spark.createDataFrame([(i % 100,) for i in range(5000)], "v long")
    sk = kmv_build(small, "v", k=256)
    [r] = kmv_distinct(sk, k=256).collect()
    # fewer members than k: the sketch IS the distinct hash set -> exact
    assert r["n_hashes"] == 100
    assert r["est_distinct"] == 100.0


def test_kmv_merge_equals_rebuild_exactly(spark):
    from postgres_cdc_reconciliation_spark.operators.sketches import (
        kmv_build,
        kmv_merge,
    )

    df = _kmv(spark)
    a = df.where(F.col("member") < 600)
    b = df.where(F.col("member") >= 400)  # overlapping halves
    merged = sorted(
        r["h"]
        for r in kmv_merge(
            kmv_build(a, "member", k=128), kmv_build(b, "member", k=128), k=128
        ).collect()
    )
    whole = sorted(r["h"] for r in kmv_build(df, "member", k=128).collect())
    assert merged == whole  # deterministic sketches merge EXACTLY


def test_kmv_threshold_path_matches_naive_bottom_k(spark):
    from postgres_cdc_reconciliation_spark.operators.sketches import (
        kmv_build,
        kmv_hash,
    )

    df = _kmv(spark)  # 1000 distinct > 4*64 -> threshold pre-filter fires
    got = sorted(r["h"] for r in kmv_build(df, "member", k=64).collect())
    naive = sorted(
        r["h"]
        for r in df.select(kmv_hash("member").alias("h"))
        .distinct()
        .orderBy("h")
        .limit(64)
        .collect()
    )
    assert got == naive and len(got) == 64


def test_kmv_grouped_matches_global_per_group(spark):
    from postgres_cdc_reconciliation_spark.operators.sketches import (
        kmv_build,
        kmv_build_grouped,
        kmv_distinct_grouped,
    )

    rows = [("a", i % 500) for i in range(8000)] + [
        ("b", i % 40) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    grouped = kmv_build_grouped(df, "g", "v", k=64)
    for g in ("a", "b"):
        per = sorted(
            r["h"] for r in grouped.where(F.col("g") == g).collect()
        )
        solo = sorted(
            r["h"]
            for r in kmv_build(df.where(F.col("g") == g), "v", k=64).collect()
        )
        assert per == solo, g
    ests = {
        r["g"]: (r["n_hashes"], r["est_distinct"])
        for r in kmv_distinct_grouped(grouped, "g", k=64).collect()
    }
    assert ests["b"] == (40, 40.0)  # below k -> exact
    assert abs(ests["a"][1] - 500) / 500 < 0.40  # k=64 -> SE ~ 13%


def test_kmv_jaccard_planted_overlap(spark):
    from postgres_cdc_reconciliation_spark.operators.sketches import (
        kmv_build,
        kmv_jaccard,
    )

    # A = {0..599}, B = {400..999}: J = 200/1000 = 0.2
    a = spark.createDataFrame([(i,) for i in range(600)], "v long")
    b = spark.createDataFrame([(i,) for i in range(400, 1000)], "v long")
    [r] = kmv_jaccard(
        kmv_build(a, "v", k=256), kmv_build(b, "v", k=256), k=256
    ).collect()
    assert r["k_used"] == 256
    assert 0 <= r["shared"] <= r["k_used"]
    assert abs(r["est_jaccard"] - 0.2) < 0.09, r["est_jaccard"]
    assert abs(r["est_union"] - 1000) / 1000 < 0.19, r["est_union"]
    assert abs(r["est_intersection"] - 200) < 90, r["est_intersection"]


def test_kmv_determinism_nulls_and_validation(spark):
    import pytest

    from postgres_cdc_reconciliation_spark.operators.sketches import (
        kmv_build,
        kmv_build_grouped,
    )

    df = _kmv(spark)
    h1 = sorted(r["h"] for r in kmv_build(df, "member", k=32).collect())
    h2 = sorted(
        r["h"] for r in kmv_build(df.repartition(7), "member", k=32).collect()
    )
    assert h1 == h2  # layout-independent
    withnull = spark.createDataFrame(
        [(1,), (None,), (2,), (1,)], "v long"
    )
    assert kmv_build(withnull, "v", k=8).count() == 2  # NULLs not members
    with pytest.raises(ValueError, match="k must be"):
        kmv_build(df, "member", k=1)
    with pytest.raises(ValueError, match="k must be"):
        kmv_build_grouped(df, "member", "member", k=0)


def test_kmv_build_pair_matches_per_side_build(spark):
    # r14 opt: the one-pass two-sided build must be byte-identical to
    # kmv_build run per side — covering both the threshold-filtered side
    # (500 distinct > 4*64) and the small-side fallback (40 distinct < 4*64)
    from postgres_cdc_reconciliation_spark.operators.sketches import (
        kmv_build,
        kmv_build_pair,
    )

    rows = [(0, i % 500) for i in range(8000)] + [
        (1, i % 40) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "side int, v long")
    pair = kmv_build_pair(df, "side", "v", k=64)
    for side in (0, 1):
        got = sorted(r["h"] for r in pair[side].collect())
        ref = sorted(
            r["h"]
            for r in kmv_build(
                df.where(F.col("side") == side), "v", k=64
            ).collect()
        )
        assert got == ref, side
