"""Round-5 pytest-witnessed operators: interval overlap join, column
profiling / profile diff. (Registry slots for the round-5 driver window
are full — these register as driver queries next round; until then the
witnesses are the equivalence tests below.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.operators.recon import (
    profile_columns,
    profile_diff,
)
from postgres_cdc_reconciliation_spark.operators.temporal import (
    interval_overlap_join,
)


def _intervals(spark, side, n, seed_shift, key_mod=3):
    """Deterministic interval set: lengths from seconds to many hours so
    chunk binning sees sub-chunk, exact-chunk and straddling spans."""
    base = spark.range(n).select(
        "id",
        (F.col("id") % key_mod).cast("int").alias("k"),
        F.concat(F.lit(side), F.col("id").cast("string")).alias("iid"),
        (
            F.lit("2026-01-01 00:00:00").cast("timestamp")
            + F.make_dt_interval(
                F.lit(0), F.lit(0), F.lit(0),
                ((F.col("id") * 7919 + seed_shift) % 86_400).cast("double"),
            )
        ).alias("start"),
    )
    return base.select(
        "k", "iid", "start",
        (
            F.col("start")
            + F.make_dt_interval(
                F.lit(0), F.lit(0), F.lit(0),
                ((F.col("id") * 104_729 + seed_shift) % 20_000 + 1).cast(
                    "double"
                ),
            )
        ).alias("end"),
    )


def test_interval_overlap_matches_theta_join(spark):
    """Binned equality-join formulation == the naive theta join, for chunk
    sizes below, near and above the interval lengths."""
    left = _intervals(spark, "L", 120, 0)
    right = _intervals(spark, "R", 150, 4321)
    naive = (
        left.alias("l")
        .join(
            right.alias("r"),
            (F.col("l.k") == F.col("r.k"))
            & (F.col("l.start") <= F.col("r.end"))
            & (F.col("r.start") <= F.col("l.end")),
        )
        .select(
            F.col("l.iid").alias("l_id"), F.col("r.iid").alias("r_id")
        )
    )
    expected = sorted((r.l_id, r.r_id) for r in naive.collect())
    assert expected, "fixture produced no overlaps — vacuous test"
    assert len(expected) < 120 * 150 / 3, "fixture overlaps everything"
    for chunk in (60, 3600, 100_000):
        got = interval_overlap_join(
            left, right, on="k",
            l_id="iid", l_start="start", l_end="end",
            r_id="iid", r_start="start", r_end="end",
            chunk_seconds=chunk,
        )
        assert (
            sorted((r.l_id, r.r_id) for r in got.collect()) == expected
        ), f"chunk={chunk} diverged"


def test_interval_overlap_bounds_and_touching_endpoints(spark):
    rows = [
        (1, "a", "2026-01-01 00:00:00", "2026-01-01 01:00:00"),
        (1, "b", "2026-01-01 02:00:00", "2026-01-01 03:00:00"),
    ]
    mk = lambda r: spark.createDataFrame(  # noqa: E731
        r, "k int, iid string, start string, end string"
    ).select(
        "k", "iid",
        F.col("start").cast("timestamp").alias("start"),
        F.col("end").cast("timestamp").alias("end"),
    )
    left = mk(rows)
    # touching endpoint (closed bounds): end == other start DOES overlap
    right = mk([(1, "x", "2026-01-01 01:00:00", "2026-01-01 02:00:00")])
    got = interval_overlap_join(
        left, right, on="k",
        l_id="iid", l_start="start", l_end="end",
        r_id="iid", r_start="start", r_end="end",
        chunk_seconds=600,
    ).collect()
    pairs = {(r.l_id, r.r_id) for r in got}
    assert pairs == {("a", "x"), ("b", "x")}
    by = {r.l_id: r for r in got}
    assert str(by["a"].overlap_start) == "2026-01-01 01:00:00"
    assert str(by["a"].overlap_end) == "2026-01-01 01:00:00"
    assert str(by["b"].overlap_start) == "2026-01-01 02:00:00"


def test_profile_columns_exact(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5), (3, "a", None), (4, "b", 4.0)],
        "id int, s string, v double",
    )
    got = {r.column: r for r in profile_columns(df).collect()}
    assert set(got) == {"id", "s", "v"}
    assert all(r.n_rows == 4 for r in got.values())
    assert (got["s"].n_nulls, got["s"].n_distinct) == (1, 2)
    assert (got["v"].n_nulls, got["v"].n_distinct) == (1, 3)
    assert (got["id"].min_str, got["id"].max_str) == ("1", "4")
    assert (got["v"].min_str, got["v"].max_str) == ("1.5", "4.0")


def test_profile_diff_localizes_column_drift(spark, sf_dir):
    """On the seeded recon pair, the profile diff must flag exactly the
    drifted columns: order_id (counts + max: extras at +10M), amount
    (perturbed values), while status survives with matching nulls (row
    counts differ everywhere, so no column fully matches — the per-metric
    columns localize WHAT drifted)."""
    from postgres_cdc_reconciliation_spark import fixtures as fx

    src, tgt = fx.recon_pair(spark, sf_dir)
    got = {r.column: r for r in profile_diff(src, tgt).collect()}
    assert not got["order_id"].column_match
    assert got["order_id"].src_max_str != got["order_id"].tgt_max_str  # +10M extras
    assert not got["amount"].column_match
    assert got["amount"].src_n_distinct != got["amount"].tgt_n_distinct
    # status: same domain both sides — min/max/nulls match, counts differ
    assert got["status"].src_min_str == got["status"].tgt_min_str
    assert got["status"].src_max_str == got["status"].tgt_max_str
    assert got["status"].src_n_nulls == got["status"].tgt_n_nulls == 0


def test_interval_overlap_hot_key_stays_correct(spark):
    """Power-law key distribution (one key holds ~80% of intervals): the
    binned join must stay exact — the scale rationale is that (key,chunk)
    spreads a hot key across chunks where the theta join concentrates it."""
    left = _intervals(spark, "L", 200, 17, key_mod=1).withColumn(
        "k", (F.monotonically_increasing_id() % 5 == 0).cast("int")
    )  # ~20% key 1, 80% key 0
    right = _intervals(spark, "R", 200, 9999, key_mod=1).withColumn(
        "k", (F.monotonically_increasing_id() % 7 == 0).cast("int")
    )
    naive = (
        left.alias("l")
        .join(
            right.alias("r"),
            (F.col("l.k") == F.col("r.k"))
            & (F.col("l.start") <= F.col("r.end"))
            & (F.col("r.start") <= F.col("l.end")),
        )
        .select(F.col("l.iid").alias("l_id"), F.col("r.iid").alias("r_id"))
    )
    expected = sorted((r.l_id, r.r_id) for r in naive.collect())
    assert len(expected) > 100  # genuinely hot
    got = interval_overlap_join(
        left, right, on="k",
        l_id="iid", l_start="start", l_end="end",
        r_id="iid", r_start="start", r_end="end",
        chunk_seconds=1800,
    )
    assert sorted((r.l_id, r.r_id) for r in got.collect()) == expected


def test_interval_overlap_guards_runaway_spans(spark):
    """A corrupt interval (end far in the future, or end < start) must
    fail the job with a clear error, never explode unboundedly."""
    import pytest

    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "k int, iid string, start string, end string"
    ).select("k", "iid",
             F.col("start").cast("timestamp").alias("start"),
             F.col("end").cast("timestamp").alias("end"))
    ok = mk([(1, "a", "2026-01-01 00:00:00", "2026-01-01 01:00:00")])
    corrupt = mk([(1, "z", "2026-01-01 00:00:00", "9999-01-01 00:00:00")])
    with pytest.raises(Exception, match="chunks"):
        interval_overlap_join(
            corrupt, ok, on="k", l_id="iid", l_start="start", l_end="end",
            r_id="iid", r_start="start", r_end="end", chunk_seconds=3600,
        ).collect()
    swapped = mk([(1, "s", "2026-01-02 00:00:00", "2026-01-01 00:00:00")])
    with pytest.raises(Exception, match="chunks"):
        interval_overlap_join(
            swapped, ok, on="k", l_id="iid", l_start="start", l_end="end",
            r_id="iid", r_start="start", r_end="end", chunk_seconds=3600,
        ).collect()


def test_profile_approx_mode_no_expand_and_sound_flags(spark, sf_dir):
    """approx_distinct mode must plan WITHOUT Expand (the multi-distinct
    row-duplication the exact mode pays) and keep match flags sound:
    identical sides fully match, drifted columns still flag."""
    from postgres_cdc_reconciliation_spark import fixtures as fx

    src, tgt = fx.recon_pair(spark, sf_dir)
    approx = profile_columns(src, approx_distinct=True)
    plan = approx._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "Expand" not in plan
    exact_plan = profile_columns(src)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "Expand" in exact_plan  # the cost approx mode avoids

    same = profile_diff(src, src, approx_distinct=True).collect()
    assert all(r.column_match for r in same)
    drift = {
        r.column: r for r in profile_diff(src, tgt, approx_distinct=True).collect()
    }
    assert not drift["amount"].column_match


def test_interval_overlap_preserves_duplicate_multiplicity(spark):
    """ADVICE r5 closure: duplicate (id, start, end) rows and ids reused
    across different intervals must multiply in the output exactly as the
    direct theta join's — the single-emitting-chunk rule replaced the
    distinct() that used to collapse them."""
    from collections import Counter

    left_rows = [
        (1, "a", "2026-01-01 00:00:00", "2026-01-01 05:00:00"),
        (1, "a", "2026-01-01 00:00:00", "2026-01-01 05:00:00"),  # exact dup
        (1, "a", "2026-01-01 02:00:00", "2026-01-01 09:00:00"),  # id reuse
    ]
    right_rows = [
        (1, "x", "2026-01-01 01:00:00", "2026-01-01 03:00:00"),
        (1, "x", "2026-01-01 01:00:00", "2026-01-01 03:00:00"),  # exact dup
    ]
    mk = lambda r: spark.createDataFrame(  # noqa: E731
        r, "k int, iid string, start string, end string"
    ).select(
        "k", "iid",
        F.col("start").cast("timestamp").alias("start"),
        F.col("end").cast("timestamp").alias("end"),
    )
    left, right = mk(left_rows), mk(right_rows)
    naive = (
        left.alias("l")
        .join(
            right.alias("r"),
            (F.col("l.k") == F.col("r.k"))
            & (F.col("l.start") <= F.col("r.end"))
            & (F.col("r.start") <= F.col("l.end")),
        )
        .select(F.col("l.iid").alias("l_id"), F.col("r.iid").alias("r_id"))
    )
    expected = Counter((r.l_id, r.r_id) for r in naive.collect())
    assert expected[("a", "x")] == 6  # 3 left rows x 2 right rows
    for chunk in (1800, 3600, 100_000):
        got = interval_overlap_join(
            left, right, on="k",
            l_id="iid", l_start="start", l_end="end",
            r_id="iid", r_start="start", r_end="end",
            chunk_seconds=chunk,
        )
        assert Counter(
            (r.l_id, r.r_id) for r in got.collect()
        ) == expected, f"chunk={chunk} multiplicity diverged"


def test_asof_join_tied_right_rows_fill_partition_invariantly(spark):
    """Two RIGHT rows tied on (key, ts): last(ignorenulls) over an
    (_ts, _side)-only order fills whichever arrived last in the partition
    — partition-dependent. The window's third order key (right-payload
    hash) makes the fill deterministic under any partitioning and input
    order; left rows strictly after the tie must still see SOME one of
    the tied values, consistently."""
    from postgres_cdc_reconciliation_spark.operators.temporal import asof_join

    right_rows = [(1, 100, "r-a"), (1, 100, "r-b"), (1, 50, "r-early")]
    left_rows = [(1, 150, "L1"), (1, 75, "L2"), (1, 10, "L0")]
    picks = set()
    for r_order, nparts in [(right_rows, 1), (right_rows[::-1], 5), (right_rows[1:] + right_rows[:1], 3)]:
        left = spark.createDataFrame(left_rows, "k long, ts long, lval string").repartition(nparts)
        right = spark.createDataFrame(r_order, "k long, rts long, rval string").repartition(nparts)
        out = {
            r["lval"]: (r["rval"], r["rts"])
            for r in asof_join(left, right, "k", "ts", "rts").collect()
        }
        assert out["L2"] == ("r-early", 50)  # untied path unaffected
        assert out["L0"] == (None, None)
        assert out["L1"][1] == 100
        picks.add(out["L1"][0])
    assert len(picks) == 1, picks  # tie resolved the same way every time


def test_tie_break_hashes_tolerate_map_columns(spark):
    """The payload-hash tie-breaks must not make previously-working
    schemas un-analyzable: Spark's xxhash64 refuses MapType, so the hash
    covers every column EXCEPT maps (rows differing only in a map column
    tie back to arrival order — the pre-tie-break behavior)."""
    from postgres_cdc_reconciliation_spark.operators.apply import latest_per_key
    from postgres_cdc_reconciliation_spark.operators.temporal import (
        asof_join,
        scd2_build,
    )

    left = spark.createDataFrame([(1, 100, "L")], "k long, ts long, lval string")
    right = spark.createDataFrame(
        [(1, 50, {"a": "1"}), (1, 40, {"b": "2"})],
        "k long, rts long, rmap map<string,string>",
    )
    out = asof_join(left, right, "k", "ts", "rts").collect()
    assert len(out) == 1 and out[0]["rts"] == 50

    log = spark.createDataFrame(
        [(1, "u", 10, {"x": "1"}), (1, "u", 20, {"x": "2"})],
        "k long, op string, seq long, props map<string,string>",
    )
    hist = scd2_build(log, key="k", seq="seq", attrs=["props"]).collect()
    assert len(hist) == 2

    ev = spark.createDataFrame(
        [(1, "0/10", "u", {"m": "1"})],
        "order_id long, source_lsn string, op string, props map<string,string>",
    )
    assert latest_per_key(ev, ["order_id"]).count() == 1


def test_tie_break_hashes_tolerate_nested_map_columns(spark):
    """xxhash64 refuses a map ANYWHERE in the type tree, not just at the
    top level — array<map<...>> and struct-with-map-field columns must be
    excluded from the payload hash too (ADVICE r7), or analysis raises
    DATATYPE_MISMATCH on feeds the docstring promised to tolerate."""
    from postgres_cdc_reconciliation_spark.operators.apply import (
        hash_safe_cols,
        latest_per_key,
    )

    ev = spark.createDataFrame(
        [(1, "0/10", "u", [{"m": "1"}], (1, {"n": "2"}))],
        "order_id long, source_lsn string, op string, "
        "amaps array<map<string,string>>, "
        "smap struct<a: long, m: map<string,string>>",
    )
    assert hash_safe_cols(ev, ev.columns) == ["order_id", "source_lsn", "op"]
    # end-to-end: analysis + execution survive the nested maps
    assert latest_per_key(ev, ["order_id"]).count() == 1


def test_cast_null_audit_counts_silent_exclusions(spark):
    """cast_null_audit names the column and count of values try_cast
    would silently null (non-NULL source, NULL result) — zero on clean
    columns, and a true NULL does NOT count (nothing was lost)."""
    from postgres_cdc_reconciliation_spark.operators.recon import cast_null_audit

    df = spark.createDataFrame(
        [("1.5", 2.0), ("garbage", float("nan")), (None, 1e300), ("2.25", 3.0)],
        "txt string, dbl double",
    )
    out = {
        r["column"]: r
        for r in cast_null_audit(
            df, {"txt": "decimal(12,2)", "dbl": "decimal(12,2)"}
        ).collect()
    }
    assert out["txt"]["silently_nulled"] == 1  # 'garbage'; NULL row not counted
    assert out["dbl"]["silently_nulled"] == 2  # NaN and 1e300 overflow
    assert out["txt"]["n_rows"] == 4
    assert out["txt"]["target_type"] == "decimal(12,2)"


def _asof_frames(spark):
    from pyspark.sql import Row

    left = spark.createDataFrame(
        [Row(k=1, lts=t) for t in (5.0, 12.0, 30.0)]
        + [Row(k=2, lts=7.0)],
        "k long, lts double",
    )
    right = spark.createDataFrame(
        [Row(k=1, rts=4.0, val="a"), Row(k=1, rts=10.0, val="b"),
         Row(k=1, rts=20.0, val="c")],
        "k long, rts double, val string",
    )
    return left, right


def test_asof_forward_and_tolerance_numeric(spark):
    from postgres_cdc_reconciliation_spark.operators.temporal import asof_join

    left, right = _asof_frames(spark)
    fwd = {
        (r["k"], r["lts"]): (r["val"], r["rts"])
        for r in asof_join(
            left, right, "k", "lts", "rts", direction="forward"
        ).collect()
    }
    # earliest right at-or-after each left ts; no following row -> nulls
    assert fwd[(1, 5.0)] == ("b", 10.0)
    assert fwd[(1, 12.0)] == ("c", 20.0)
    assert fwd[(1, 30.0)] == (None, None)
    assert fwd[(2, 7.0)] == (None, None)

    tol = {
        (r["k"], r["lts"]): (r["val"], r["rts"])
        for r in asof_join(
            left, right, "k", "lts", "rts", direction="forward", tolerance=5
        ).collect()
    }
    # gap 10-5=5 within tolerance, gap 20-12=8 nulls back out
    assert tol[(1, 5.0)] == ("b", 10.0)
    assert tol[(1, 12.0)] == (None, None)

    back = {
        (r["k"], r["lts"]): (r["val"], r["rts"])
        for r in asof_join(
            left, right, "k", "lts", "rts", tolerance=2
        ).collect()
    }
    # backward gaps: 5-4=1 keeps, 12-10=2 keeps (<=), 30-20=10 nulls
    assert back[(1, 5.0)] == ("a", 4.0)
    assert back[(1, 12.0)] == ("b", 10.0)
    assert back[(1, 30.0)] == (None, None)


def test_asof_forward_equal_ts_eligible_and_validation(spark):
    import pytest

    from postgres_cdc_reconciliation_spark.operators.temporal import asof_join

    left, right = _asof_frames(spark)
    eq = spark.createDataFrame([(1, 10.0)], "k long, lts double")
    got = asof_join(eq, right, "k", "lts", "rts",
                    direction="forward").collect()[0]
    assert (got["val"], got["rts"]) == ("b", 10.0)  # >= includes equality
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, "k", "lts", "rts", direction="nearest")
    with pytest.raises(ValueError, match="tolerance"):
        asof_join(left, right, "k", "lts", "rts", tolerance=-1)
    with pytest.raises(ValueError, match="tolerance"):
        asof_join(left, right, "k", "lts", "rts", tolerance=True)


def test_asof_tolerance_temporal_is_naive_calendar(spark):
    # the DST trap: under a non-UTC session, epoch-seconds diffs shift
    # across a transition while NTZ data is naive — tolerance must use
    # naive-calendar seconds (4 days across 1995-04-02 US = 345600 s,
    # not 342000)
    from postgres_cdc_reconciliation_spark.operators.temporal import asof_join

    left = spark.sql(
        "SELECT 1 AS k, cast('1995-04-03 12:00:00' as timestamp_ntz) AS lts"
    )
    right = spark.sql(
        "SELECT 1 AS k, cast('1995-03-30 12:00:00' as timestamp_ntz) AS rts,"
        " 'x' AS val"
    )
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        kept = asof_join(left, right, "k", "lts", "rts",
                         tolerance=345600).collect()[0]
        assert kept["val"] == "x"  # exactly at tolerance: kept
        cut = asof_join(left, right, "k", "lts", "rts",
                        tolerance=345599).collect()[0]
        assert cut["val"] is None
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_asof_tolerance_mixed_kind_rejected(spark):
    import pytest

    from postgres_cdc_reconciliation_spark.operators.temporal import asof_join

    left = spark.sql(
        "SELECT 1 AS k, cast('1995-04-03' as timestamp_ntz) AS lts"
    )
    right = spark.createDataFrame([(1, 5.0, "x")],
                                  "k long, rts double, val string")
    with pytest.raises(ValueError, match="same\\s+kind"):
        asof_join(left, right, "k", "lts", "rts", tolerance=10)
