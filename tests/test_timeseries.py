"""Time-series similarity search: numpy ground truth, alignment and
degenerate-series semantics. (Registry slot queued for round 6 — the
r5 driver window is full; see NOTES_r5.)"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.operators.timeseries import (
    series_similarity_topk,
)


def _series_df(spark, rows):
    return spark.createDataFrame(rows, "user_id long, bucket int, value double")


def test_matches_numpy_pearson(spark):
    """Deterministic multi-key series: ranking and r values must match a
    direct Pearson computation."""
    rows = []
    for u in range(6):
        for t in range(12):
            # user u's series: base wave + per-user phase/scale + drift
            v = (
                10.0 * (u + 1) * math.sin(0.5 * t + 0.3 * u)
                + 2.0 * u * t
                + 100.0
            )
            rows.append((u, t, round(v, 3)))
    df = _series_df(spark, rows)
    got = series_similarity_topk(df, query_key=0, k=5).collect()

    by_user = {u: [r[2] for r in rows if r[0] == u] for u in range(6)}
    q = by_user[0]

    def pearson(x, y):
        n = len(x)
        sx, sy = sum(x), sum(y)
        sxy = sum(a * b for a, b in zip(x, y))
        sxx, syy = sum(a * a for a in x), sum(b * b for b in y)
        return (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
    expected = sorted(
        ((round(pearson(by_user[u], q), 6), u) for u in range(1, 6)),
        key=lambda t: (-t[0], t[1]),
    )
    assert [(r.user_id, r.corr_r) for r in got] == [
        (u, r) for r, u in expected
    ]
    assert all(r.n_buckets == 12 for r in got)


def test_alignment_and_degenerate_series(spark):
    rows = (
        [(0, t, float(t)) for t in range(6)]            # query: 0..5
        + [(1, t, 2.0 * t + 7) for t in range(6)]       # perfect r=1
        + [(2, t, -3.0 * t) for t in range(6)]          # perfect r=-1
        + [(3, t, 5.0) for t in range(6)]               # constant: dropped
        + [(4, 0, 1.0), (4, 1, 9.0)]                    # overlap 2 < 3: dropped
        + [(5, t, float(t * t)) for t in range(3, 9)]   # partial overlap 3
    )
    got = {r.user_id: r for r in series_similarity_topk(
        _series_df(spark, rows), query_key=0, k=10).collect()}
    assert set(got) == {1, 2, 5}
    assert got[1].corr_r == 1.0
    assert got[2].corr_r == -1.0
    assert got[5].n_buckets == 3  # only buckets 3..5 pair with the query
    assert -1.0 <= got[5].corr_r <= 1.0


def test_scale_and_offset_invariance(spark):
    """Pearson ranking must ignore per-key volume: a 1000x-scaled,
    shifted copy of the query ranks at r=1 ahead of a slightly noisy
    unscaled copy."""
    rows = (
        [(0, t, math.sin(t / 2.0)) for t in range(10)]
        + [(1, t, 1000.0 * math.sin(t / 2.0) + 5e6) for t in range(10)]
        + [(2, t, math.sin(t / 2.0) + (0.05 if t % 3 == 0 else -0.02))
           for t in range(10)]
    )
    got = series_similarity_topk(_series_df(spark, rows), query_key=0, k=2)
    out = got.collect()
    assert [r.user_id for r in out] == [1, 2]
    assert out[0].corr_r == 1.0 and out[1].corr_r < 1.0


def _ref_dtw(a, b):
    """Unbanded reference DP (pure python) for cross-checking."""
    import math as m

    n, p = len(a), len(b)
    INF = float("inf")
    D = [[INF] * (p + 1) for _ in range(n + 1)]
    D[0][0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, p + 1):
            c = (a[i - 1] - b[j - 1]) ** 2
            D[i][j] = c + min(D[i - 1][j], D[i][j - 1], D[i - 1][j - 1])
    return m.sqrt(D[n][p])


def _znorm_py(x):
    import statistics as st

    mu = sum(x) / len(x)
    sd = (sum((v - mu) ** 2 for v in x) / len(x)) ** 0.5
    return [(v - mu) / sd for v in x]


def test_dtw_matches_reference_dp(spark):
    """Wide band == the unbanded reference DP on z-normalized series;
    identical-shape series score 0."""
    from postgres_cdc_reconciliation_spark.operators.timeseries import (
        series_dtw_topk,
    )

    rows = []
    series = {
        0: [1.0, 3.0, 2.0, 5.0, 4.0, 6.0, 2.0, 1.0],
        1: [10.0, 30.0, 20.0, 50.0, 40.0, 60.0, 20.0, 10.0],  # scaled copy
        2: [1.0, 1.0, 3.0, 2.0, 5.0, 4.0, 6.0, 2.0],          # shifted in time
        3: [6.0, 1.0, 5.0, 2.0, 4.0, 3.0, 6.0, 1.0],          # different shape
    }
    for u, vals in series.items():
        rows += [(u, t, v) for t, v in enumerate(vals)]
    df = _series_df(spark, rows)
    got = {r.user_id: r.dtw_dist for r in
           series_dtw_topk(df, query_key=0, k=10, band=20).collect()}

    qz = _znorm_py(series[0])
    for u in (1, 2, 3):
        expected = round(_ref_dtw(_znorm_py(series[u]), qz), 6)
        assert abs(got[u] - expected) < 1e-9, u
    assert got[1] == 0.0  # scaled copy z-normalizes to the query exactly
    # time-shifted copy warps much closer than the different shape
    assert got[2] < got[3]


def test_dtw_beats_pearson_on_time_shift(spark):
    """The motivating case: a time-shifted copy of the query ranks FIRST
    under DTW, while lockstep Pearson prefers an in-phase but
    differently-shaped series."""
    import math

    from postgres_cdc_reconciliation_spark.operators.timeseries import (
        series_dtw_topk,
        series_similarity_topk,
    )

    n = 16
    q = [math.sin(t * 0.8) for t in range(n)]
    # same shape with a plateau inserted mid-series (locally stretched in
    # time): DTW's warping absorbs the repeats nearly for free, while
    # every lockstep point after the plateau decorrelates
    warped = (q[:5] + [q[4]] * 3 + q[5:])[:n]
    inphase = [math.sin(t * 0.8) * (1 if t % 2 else 0.2) for t in range(n)]
    rows = (
        [(0, t, v) for t, v in enumerate(q)]
        + [(1, t, v) for t, v in enumerate(warped)]
        + [(2, t, v) for t, v in enumerate(inphase)]
    )
    df = _series_df(spark, rows)
    dtw_first = series_dtw_topk(df, query_key=0, k=1, band=6).collect()[0]
    assert dtw_first.user_id == 1
    pearson = {r.user_id: r.corr_r for r in
               series_similarity_topk(df, query_key=0, k=2).collect()}
    assert pearson[2] > pearson[1]  # lockstep metric misranks the pair


def test_dtw_preserves_string_key_type(spark):
    """ADVICE r5: the applyInPandas output schema must carry the caller's
    key type — a string-keyed series must come back string-keyed."""
    from postgres_cdc_reconciliation_spark.operators.timeseries import (
        series_dtw_topk,
    )

    rows = []
    for name in ("alpha", "beta", "query"):
        for t in range(8):
            shift = {"alpha": 0, "beta": 3, "query": 0}[name]
            rows.append((name, t, math.sin(0.7 * (t + shift)) + 0.01 * t))
    df = spark.createDataFrame(
        rows, "series_id string, bucket int, value double"
    )
    got = series_dtw_topk(
        df, query_key="query", key_col="series_id", k=5, band=8
    )
    assert dict(got.dtypes)["series_id"] == "string"
    out = got.collect()
    assert {r["series_id"] for r in out} == {"alpha", "beta"}
    # alpha is the same shape as the query; beta is time-shifted — DTW
    # still ranks alpha first (identical series → distance 0)
    assert out[0]["series_id"] == "alpha" and out[0]["dtw_dist"] == 0.0


def test_pearson_overflow_raises_not_silently_drops(spark):
    """ADVICE r5: a decimal(18,6) sufficient-statistic sum that overflows
    to NULL (ANSI off) must raise loudly, not silently drop the key from
    the top-k."""
    import pytest

    # sxx per row ~ 1e24 (decimal(37,12) products); 200 rows sum to
    # ~2e26 > decimal(38,12) max — the sum overflows to NULL
    big = 999_999_999_999.0
    rows = [(0, t, float(t)) for t in range(200)] + [
        (1, t, big) for t in range(200)
    ]
    df = _series_df(spark, rows)
    # ANSI-on (Spark 4 default): the decimal sum itself raises
    # ARITHMETIC_OVERFLOW; ANSI-off: the sum yields NULL and the
    # operator's own guard raises. Either way: loud, never a silent drop.
    with pytest.raises(
        Exception, match="NULL sufficient statistic|ARITHMETIC_OVERFLOW"
    ):
        series_similarity_topk(df, query_key=0, k=5).collect()

    # and the ANSI-off path exercises the in-plan guard explicitly
    ansi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(Exception, match="NULL sufficient statistic"):
            series_similarity_topk(df, query_key=0, k=5).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi)


def test_dtw_certificate_invariants_hold(spark):
    """The certificate's three invariants must hold on series of unequal
    lengths (tail absorbed by the edge path) and time-shifted shapes."""
    from postgres_cdc_reconciliation_spark.operators.timeseries import (
        series_dtw_certificate,
    )

    rows = []
    lengths = {7: 12, 1: 12, 2: 9, 3: 15, 4: 12}
    for u, n in lengths.items():
        for t in range(n):
            shift = u  # each key a different time shift
            rows.append((u, t, math.sin(0.6 * (t + shift)) + 0.05 * t))
    # key 5: too short — must be excluded from the certificate
    rows += [(5, 0, 1.0), (5, 1, 2.0)]
    # key 6: constant — zero variance, excluded
    rows += [(6, t, 4.2) for t in range(12)]
    df = _series_df(spark, rows)
    got = series_dtw_certificate(df, query_key=7, band=3, narrow_band=1)
    out = {r["user_id"]: r for r in got.collect()}
    assert set(out) == {1, 2, 3, 4}
    for u, r in out.items():
        assert r["n_points"] == lengths[u]
        assert r["dtw_nonneg"] and r["band_monotone"] and r["dtw_within_edgepath"], (
            u,
            r,
        )


def test_dtw_certificate_rejects_bad_query_series(spark):
    """An absent or constant query key must fail with the same clear
    ValueError as series_dtw_topk — not an IndexError on an empty qz or
    NaN-poisoned invariant flags."""
    import pytest

    from postgres_cdc_reconciliation_spark.operators.timeseries import (
        series_dtw_certificate,
    )

    rows = [(k, t, float(t % 5 + k)) for k in range(3) for t in range(10)]
    rows += [(9, t, 7.0) for t in range(10)]  # constant series, key 9
    df = spark.createDataFrame(rows, "user_id long, bucket long, value double")
    with pytest.raises(ValueError, match="query series"):
        series_dtw_certificate(df, query_key=42)  # absent key
    with pytest.raises(ValueError, match="query series"):
        series_dtw_certificate(df, query_key=9)  # zero variance


def test_dtw_certificate_duplicate_timestamps_bound_holds(spark):
    """Duplicate (key, t) rows: the DP scores values in
    array_sort(struct(t, x)) order, and the edge-path bound must walk the
    SAME tie-broken sequence — with an orderBy(t)-only row_number the
    bound could be computed over a permuted series and spuriously flag a
    correct DTW (code-review r6 finding)."""
    from postgres_cdc_reconciliation_spark.operators.timeseries import (
        series_dtw_certificate,
    )

    rows = [(0, t, float(t)) for t in range(8)]  # query
    # candidate with a duplicated timestamp carrying OPPOSITE values —
    # the tie-break order changes the series shape materially
    rows += [(1, t, float(t * 2)) for t in range(6)]
    rows += [(1, 3, -100.0), (1, 3, 100.0)]
    rows += [(2, t, float((t * 7) % 5)) for t in range(8)]
    df = spark.createDataFrame(rows, "user_id long, bucket long, value double")
    got = series_dtw_certificate(df, query_key=0, band=3, narrow_band=1)
    flags = {
        r["user_id"]: (
            r["dtw_nonneg"], r["band_monotone"], r["dtw_within_edgepath"]
        )
        for r in got.collect()
    }
    assert set(flags) == {1, 2}
    assert all(all(v) for v in flags.values()), flags


# ---------------------------------------------------------------------------
# robust_outliers


def _outlier_df(spark):
    rows = [(i, "a", 10.0 + (i % 5) * 0.1) for i in range(100)]
    rows.append((100, "a", 1000.0))  # the wild point
    rows += [(200 + i, "b", 50.0 + (i % 3) * 0.5) for i in range(60)]
    rows.append((300, "b", None))  # NULL must be excluded, not scored
    return spark.createDataFrame(rows, "event_id long, grp string, value double")


def test_robust_outliers_flags_wild_point_only(spark):
    from postgres_cdc_reconciliation_spark.operators.timeseries import (
        robust_outliers,
    )

    out = robust_outliers(
        _outlier_df(spark), "grp", "value", id_cols=["event_id"]
    )
    flagged = [r["event_id"] for r in out.filter("is_outlier").collect()]
    assert flagged == [100]
    assert out.filter(F.col("event_id") == 300).count() == 0  # NULL excluded
    assert out.count() == 161  # 101 in group a + 60 non-null in group b


def test_robust_outliers_median_immune_to_the_outlier(spark):
    """The robustness claim itself: the wild point leaves the group median
    and MAD where the clean data put them (a mean/stddev score would have
    its baseline dragged by the outlier)."""
    from postgres_cdc_reconciliation_spark.operators.timeseries import (
        robust_outliers,
    )

    out = robust_outliers(
        _outlier_df(spark), "grp", "value", id_cols=["event_id"]
    )
    a = out.filter(F.col("grp") == "a").select("med", "mad").first()
    assert abs(a["med"] - 10.2) < 1e-9  # median of 10.0..10.4 pattern
    assert 0 < a["mad"] < 1.0  # MAD from the clean spread, not the 1000


# ---------------------------------------------------------------------------
# gapfill


def _readings(spark):
    rows = [
        # key "a": observations at hours 0, 3, 4 -> holes at 1, 2
        ("a", "2024-01-01 00:00:00", 10.0),
        ("a", "2024-01-01 03:00:00", 20.0),
        ("a", "2024-01-01 04:00:00", 50.0),
        # key "b": single observation -> grid of one row, no gaps
        ("b", "2024-01-01 07:00:00", 5.0),
    ]
    return spark.createDataFrame(
        rows, "k string, bucket string, v double"
    ).select(
        "k",
        F.col("bucket").cast("timestamp_ntz").alias("bucket"),
        "v",
        F.lit(1).cast("long").alias("n"),
    )


def test_gapfill_locf_and_linear_exact(spark):
    from postgres_cdc_reconciliation_spark.operators.timeseries import gapfill

    out = gapfill(
        _readings(spark), ["k"], "bucket", "v", 3600, count_col="n"
    )
    a = {
        r["bucket"].hour: r
        for r in out.filter(F.col("k") == "a").collect()
    }
    assert sorted(a) == [0, 1, 2, 3, 4]  # densified to the full grid
    assert not a[0]["is_gap"] and a[1]["is_gap"] and a[2]["is_gap"]
    # locf carries the last observation
    assert a[1]["locf_v"] == 10.0 and a[2]["locf_v"] == 10.0
    # linear interpolates between (0h, 10) and (3h, 20)
    assert abs(a[1]["linear_v"] - 13.333333) < 1e-9
    assert abs(a[2]["linear_v"] - 16.666667) < 1e-9
    # real readings pass through untouched
    assert a[3]["linear_v"] == 20.0 and a[3]["locf_v"] == 20.0
    # count zero-fills in gaps
    assert a[1]["n"] == 0 and a[0]["n"] == 1
    # single-observation key: one grid row, not a gap
    b = out.filter(F.col("k") == "b").collect()
    assert len(b) == 1 and not b[0]["is_gap"]


def test_gapfill_grid_never_crosses_keys(spark):
    """Key b's lone 07:00 bucket must not inherit key a's 00-04 span —
    the grid is per key, not a global calendar."""
    from postgres_cdc_reconciliation_spark.operators.timeseries import gapfill

    out = gapfill(_readings(spark), ["k"], "bucket", "v", 3600)
    assert out.count() == 5 + 1
    assert out.filter((F.col("k") == "b") & F.col("is_gap")).count() == 0


# ---------------------------------------------------------------------------
# time_weighted_avg / counter_deltas


def test_time_weighted_avg_exact_integral(spark):
    """Hand-computable: value 10 held 30s, then 20 held 10s ->
    TWA = (10*30 + 20*10) / 40 = 12.5 — a plain AVG would say 14.0
    (wait: (10+20+40)/3) — and the closing sample carries no weight."""
    from postgres_cdc_reconciliation_spark.operators.timeseries import (
        time_weighted_avg,
    )

    rows = [
        ("a", "2024-01-01 00:00:00", 10.0),
        ("a", "2024-01-01 00:00:30", 20.0),
        ("a", "2024-01-01 00:00:40", 40.0),  # closing sample: weight 0
        ("b", "2024-01-01 00:00:00", 7.0),   # single sample: NULL avg
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double").select(
        "k", F.col("ts").cast("timestamp_ntz").alias("ts"), "v",
        F.monotonically_increasing_id().alias("id"),
    )
    out = {r["k"]: r for r in time_weighted_avg(
        df, ["k"], "ts", "v", tiebreak_cols=["id"]).collect()}
    assert out["a"]["n_samples"] == 3
    assert out["a"]["duration_us"] == 40_000_000
    assert out["a"]["time_weighted_avg"] == 12.5
    assert out["b"]["time_weighted_avg"] is None  # zero duration, no crash


def test_counter_deltas_handles_resets(spark):
    """Counter 0->50->10->30: increase = 50 (growth) + 10 (post-reset
    reading) + 20 (growth) = 80, one reset."""
    from postgres_cdc_reconciliation_spark.operators.timeseries import (
        counter_deltas,
    )

    rows = [
        ("a", "2024-01-01 00:00:00", 0.0),
        ("a", "2024-01-01 00:01:00", 50.0),
        ("a", "2024-01-01 00:02:00", 10.0),  # reset
        ("a", "2024-01-01 00:03:00", 30.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double").select(
        "k", F.col("ts").cast("timestamp_ntz").alias("ts"), "v"
    )
    out = counter_deltas(df, ["k"], "ts", "v").collect()[0]
    assert out["total_increase"] == 80.0
    assert out["n_resets"] == 1
    assert out["n_samples"] == 4
