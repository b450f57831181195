"""Hot-bucket guard for the embedding near-dup tier (VERDICT r6 #1).

A within-bucket pair join is O(Σ bucket²); one dense embedding mode turns it
quadratic. cap_hot_buckets bounds every bucket at the cap by (1) splitting
oversized buckets with extra sign-LSH planes, (2) dropping sub-buckets the
planes can't separate (identical vectors). These tests plant both shapes.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.operators.similarity import (
    cap_hot_buckets,
    embedding_near_dup_pairs,
    hot_buckets,
    rp_near_dup_pairs_multi,
)


def _vec(i: int, dim: int = 16) -> list[float]:
    # deterministic spread-out directions (distinct angles, no RNG)
    return [math.sin(0.7 * i + 0.31 * j) + 0.05 for j in range(dim)]


def _skewed_df(spark, n_hot: int = 80, n_cold: int = 12):
    """One planted hot bucket (label 0, many distinct directions) plus small
    cold buckets."""
    rows = [(i, _vec(i), 0) for i in range(n_hot)]
    rows += [(1000 + i, _vec(1000 + i), 1 + i % 3) for i in range(n_cold)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_cap_splits_hot_bucket_and_bounds_every_group(spark):
    df = _skewed_df(spark)
    capped = cap_hot_buckets(df, max_bucket_size=30, bucket_col="label", dim=16,
                             split_planes=4)
    sizes = {r["label"]: r["n"] for r in
             capped.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert sizes, "cap dropped everything — split planes failed to separate"
    assert max(sizes.values()) <= 30
    # cold buckets survive untouched (string-cast key, same membership)
    cold = capped.filter(~F.col("label").contains("#"))
    assert cold.count() == 12
    # hot-bucket rows either split into sub-buckets or dropped, never merged
    assert all("#" in k for k in sizes if sizes[k] and k not in ("1", "2", "3"))


def test_capped_pairs_are_bounded_and_sound(spark):
    """Pair output under the cap is a SUBSET of the uncapped pairs (no false
    pairs) and the candidate volume is bounded by buckets x cap^2."""
    df = _skewed_df(spark)
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(df, threshold=0.1).collect()
    }
    capped_df = embedding_near_dup_pairs(
        df, threshold=0.1, max_bucket_size=30, dim=16, split_planes=4
    )
    capped = {(r["id_a"], r["id_b"]) for r in capped_df.collect()}
    assert capped, "guard should degrade recall, not zero it"
    assert capped <= uncapped
    # hard bound check: no surviving bucket can contribute > C(cap,2) pairs
    sizes = [
        r["n"]
        for r in cap_hot_buckets(df, 30, "label", dim=16, split_planes=4)
        .groupBy("label").agg(F.count("*").alias("n")).collect()
    ]
    assert len(capped) <= sum(s * (s - 1) // 2 for s in sizes)


def test_identical_vector_mode_is_dropped_and_reported(spark):
    """No hyperplane separates identical vectors: the residual-drop stage
    must cut the mode, and hot_buckets must surface it loudly."""
    base = _vec(3)
    rows = [(i, list(base), 0) for i in range(50)]  # unsplittable mode
    rows += [(100 + i, _vec(100 + i), 1) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    capped = cap_hot_buckets(df, max_bucket_size=10, bucket_col="label", dim=16)
    ids = {r["vec_id"] for r in capped.select("vec_id").collect()}
    assert ids == {100 + i for i in range(8)}  # mode dropped, cold bucket kept
    report = hot_buckets(df, 10, "label").collect()
    assert [(r["label"], r["bucket_size"]) for r in report] == [(0, 50)]


def test_drop_mode_without_split_planes(spark):
    df = _skewed_df(spark)
    capped = cap_hot_buckets(df, max_bucket_size=30, bucket_col="label",
                             split_planes=0)
    labels = {r["label"] for r in capped.select("label").distinct().collect()}
    assert labels == {"1", "2", "3"}  # hot bucket dropped whole, keys stringified


def test_multi_table_cap_consistent_across_scorers(spark):
    """Per-table capping applies identical membership to the candidate-join
    scorers and the matrix scorer (same shared split key), so all three
    produce the same pair set under the cap — and it is a subset of the
    uncapped pairs."""
    rows = [(i, _vec(i, 8)) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(dim=8, threshold=0.1, n_planes=2, n_tables=2)
    uncapped = {(r["id_a"], r["id_b"]) for r in
                rp_near_dup_pairs_multi(df, **kw).collect()}
    got = {}
    for scorer in ("sql", "numpy", "matrix"):
        got[scorer] = {
            (r["id_a"], r["id_b"])
            for r in rp_near_dup_pairs_multi(
                df, scorer=scorer, max_bucket_size=12, **kw
            ).collect()
        }
    assert got["sql"] == got["numpy"] == got["matrix"]
    assert got["sql"] and got["sql"] <= uncapped


def test_auto_split_planes_recovers_undersized_split(spark):
    """The SCALING.md r7 footgun, made executable: a 600-row hot bucket at
    cap=30 needs ~2^5 sub-buckets; a fixed 2-plane split leaves every
    sub-bucket over the cap (whole mode residually dropped, zero pairs),
    while split_planes='auto' sizes the count from the measured hottest
    bucket and keeps pairs flowing. Every surviving bucket respects the
    cap in both modes. Vectors are hash-decorrelated (NOT the 1-D sinusoid
    family _vec gives — a 1-D curve crosses only O(planes) hyperplanes, so
    its sign patterns can't multiply exponentially; real embedding modes
    have enough intrinsic dimension for the split to work as designed)."""

    def _rvec(i: int, dim: int = 16) -> list[float]:
        return [
            math.sin(i * 12.9898 + j * 78.233) * 43758.5453 % 2.0 - 1.0
            for j in range(dim)
        ]

    rows = [(i, _rvec(i), 0) for i in range(600)]
    rows += [(10_000 + i, _rvec(10_000 + i), 1 + i % 3) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    fixed = cap_hot_buckets(df, 30, "label", dim=16, split_planes=2)
    # under the undersized fixed split nearly all hot rows are residually
    # dropped (only sub-buckets that land under the cap by chance survive —
    # here 19 of 600)
    fixed_survivors = fixed.filter(F.col("label").contains("#")).count()
    assert fixed_survivors < 60, fixed_survivors

    auto = cap_hot_buckets(df, 30, "label", dim=16, split_planes="auto")
    sizes = [r["n"] for r in
             auto.groupBy("label").agg(F.count("*").alias("n")).collect()]
    assert max(sizes) <= 30
    survivors = auto.filter(F.col("label").contains("#")).count()
    assert survivors > 300, f"auto split kept only {survivors} of 600 hot rows"

    # and pairs actually flow end-to-end under auto
    pairs = embedding_near_dup_pairs(
        df, threshold=0.1, max_bucket_size=30, dim=16, split_planes="auto"
    ).count()
    assert pairs > 0


def test_auto_split_noop_when_nothing_hot(spark):
    """auto with no bucket over the cap must not split anything — keys are
    only type-normalized to string."""
    rows = [(i, _vec(i), i % 5) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = cap_hot_buckets(df, 30, "label", dim=16, split_planes="auto")
    keys = {r["label"] for r in out.select("label").distinct().collect()}
    assert keys == {"0", "1", "2", "3", "4"}
    assert out.count() == 40


def test_multi_table_auto_cap(spark):
    """rp_near_dup_pairs_multi with the default auto-sized cap: bounded,
    sound (subset of uncapped), and scorer-consistent."""
    rows = [(i, _vec(i, 8)) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(dim=8, threshold=0.1, n_planes=1, n_tables=2)  # 2 fat buckets/table
    uncapped = {(r["id_a"], r["id_b"]) for r in
                rp_near_dup_pairs_multi(df, **kw).collect()}
    sql = {(r["id_a"], r["id_b"]) for r in
           rp_near_dup_pairs_multi(df, max_bucket_size=20, **kw).collect()}
    mat = {(r["id_a"], r["id_b"]) for r in
           rp_near_dup_pairs_multi(df, max_bucket_size=20, scorer="matrix",
                                   **kw).collect()}
    assert sql == mat
    assert sql and sql <= uncapped


def test_multi_cap_split_planes_zero_rejected(spark):
    import pytest

    df = spark.createDataFrame([(1, _vec(1, 8))], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="cap_split_planes"):
        rp_near_dup_pairs_multi(df, dim=8, max_bucket_size=5, cap_split_planes=0)


def test_multi_auto_cap_noop_matches_uncapped(spark):
    """auto cap with no bucket anywhere over the cap must short-circuit:
    identical pair set to the uncapped run (no split fold, no drops)."""
    rows = [(i, _vec(i, 8)) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(dim=8, threshold=0.1, n_planes=3, n_tables=2)
    uncapped = {(r["id_a"], r["id_b"]) for r in
                rp_near_dup_pairs_multi(df, **kw).collect()}
    capped = {(r["id_a"], r["id_b"]) for r in
              rp_near_dup_pairs_multi(df, max_bucket_size=1000, **kw).collect()}
    assert capped == uncapped


def test_rp_hot_bucket_report_names_the_modes(spark):
    """The facade's loud-reporting companion: same plane sets as the multi
    operator, (table, bucket, size) rows for every bucket over the cap."""
    from postgres_cdc_reconciliation_spark.operators.similarity import (
        rp_hot_bucket_report,
    )

    base = _vec(7, 8)
    rows = [(i, list(base)) for i in range(30)]          # one dense mode
    rows += [(100 + i, _vec(100 + i, 8)) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    rep = rp_hot_bucket_report(df, dim=8, max_bucket_size=20, n_planes=2,
                               n_tables=3).collect()
    # the identical-vector mode lands in ONE bucket of EVERY table
    assert {r["table"] for r in rep} == {0, 1, 2}
    assert all(r["bucket_size"] >= 30 for r in rep)


def test_rp_hot_bucket_report_auto_matches_multi(spark):
    """ADVICE r9 (medium): the report's default n_planes must resolve to
    the SAME plane count rp_near_dup_pairs_multi(n_planes='auto') uses for
    the same corpus + cap — otherwise the report names buckets the capped
    job never blocked on. Both defaults now route through
    auto_n_planes(count, target_bucket_size=max_bucket_size); witness the
    alignment on a corpus where auto resolves != the old fixed 4."""
    import pytest

    from postgres_cdc_reconciliation_spark.operators.similarity import (
        auto_n_planes,
        rp_hot_bucket_report,
    )

    rows = [(i, _vec(i, 8)) for i in range(40)]
    rows += [(1000 + i, _vec(7, 8)) for i in range(12)]  # dense mode
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cap = 8
    resolved = auto_n_planes(df.count(), target_bucket_size=cap)
    assert resolved != 4  # otherwise this test can't tell auto from legacy
    auto_rep = {
        (r["table"], r["bucket"], r["bucket_size"])
        for r in rp_hot_bucket_report(
            df, dim=8, max_bucket_size=cap, n_tables=2
        ).collect()
    }
    pinned_rep = {
        (r["table"], r["bucket"], r["bucket_size"])
        for r in rp_hot_bucket_report(
            df, dim=8, max_bucket_size=cap, n_planes=resolved, n_tables=2
        ).collect()
    }
    assert auto_rep == pinned_rep and auto_rep  # mode must show up
    # bool is an int subclass — n_planes=True must raise, not run 1-plane
    with pytest.raises(ValueError):
        rp_hot_bucket_report(df, dim=8, max_bucket_size=cap, n_planes=True)


def test_scorers_agree_on_null_buckets_and_zero_norms(spark):
    """Review-pass edge cases: NULL bucket keys pair with nothing in EITHER
    scorer (the SQL equality join is null-rejecting; the matrix path must
    filter, not form a giant NULL group), and zero-norm vectors (cosine =
    NaN) are excluded in both — Spark's NaN >= threshold is TRUE, so the
    SQL filter needs the explicit isnan guard numpy/DuckDB semantics give
    for free."""
    rows = [(1, _vec(1), 0), (2, _vec(2), 0)]         # normal pair
    rows += [(10, _vec(10), None), (11, _vec(11), None)]  # NULL bucket
    rows += [(20, [0.0] * 16, 1), (21, _vec(21), 1)]  # zero-norm in bucket 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    for kw in ({}, {"max_bucket_size": 1000, "dim": 16}):
        got = {}
        for scorer in ("sql", "matrix"):
            got[scorer] = {
                (r["id_a"], r["id_b"])
                for r in embedding_near_dup_pairs(
                    df, threshold=-1.0, scorer=scorer, **kw
                ).collect()
            }
        assert got["sql"] == got["matrix"], (kw, got)
        assert not any(10 in p or 11 in p for p in got["sql"]), "NULL bucket paired"
        assert not any(20 in p for p in got["sql"]), "zero-norm NaN pair emitted"
        assert (1, 2) in got["sql"]


def test_unknown_scorer_raises(spark):
    import pytest

    df = spark.createDataFrame([(1, _vec(1))], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="unknown scorer"):
        embedding_near_dup_pairs(df, scorer="Matrix")
    with pytest.raises(ValueError, match="unknown scorer"):
        rp_near_dup_pairs_multi(df, dim=16, scorer="einsum")


def test_matrix_scorer_string_ids(spark):
    """The matrix output schema follows the caller's id type — string ids
    work (np.minimum/maximum order object arrays lexicographically, same
    as the SQL path's < on strings)."""
    from postgres_cdc_reconciliation_spark.operators.similarity import (
        embedding_near_dup_pairs as endp,
    )

    rows = [(f"doc{i}", _vec(i), 0) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>, label int")
    sql_pairs = {(r["id_a"], r["id_b"]) for r in
                 endp(df, threshold=-1.0, scorer="sql").collect()}
    mat_pairs = {(r["id_a"], r["id_b"]) for r in
                 endp(df, threshold=-1.0, scorer="matrix").collect()}
    assert sql_pairs == mat_pairs and len(sql_pairs) == 15


def test_scorers_agree_on_null_embeddings(spark):
    """A NULL embedding folds to sign-bucket 0 (the CASE's otherwise
    branch), so it reaches the scorers: SQL drops it via NULL cosine; the
    matrix path must filter it before np.stack, not crash."""
    rows = [(1, _vec(1), 0), (2, _vec(2), 0), (3, None, 0)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    for scorer in ("sql", "matrix"):
        pairs = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_dup_pairs(
                df, threshold=-1.0, scorer=scorer
            ).collect()
        }
        assert pairs == {(1, 2)}, (scorer, pairs)
    multi = {
        (r["id_a"], r["id_b"])
        for r in rp_near_dup_pairs_multi(
            df, dim=16, threshold=-1.0, n_planes=2, n_tables=2, scorer="matrix"
        ).collect()
    }
    assert multi == {(1, 2)}


def test_scorers_agree_on_nonfinite_components(spark):
    """A NaN or ±Inf COMPONENT inside a right-sized vector (the numeric-
    dirt sweep's class): every scorer's cosine for a pair touching it is
    non-finite — IEEE gives inf/inf = NaN in the SQL fold, numpy and the
    gemm alike — and a NaN compare is false, so the dirty vector pairs
    with NOTHING and the clean pair set is identical across scorers."""
    nan, inf = float("nan"), float("inf")
    v_nan = _vec(3)
    v_nan[0] = nan
    v_inf = _vec(4)
    v_inf[0] = inf
    rows = [(1, _vec(1), 0), (2, _vec(2), 0), (3, v_nan, 0), (4, v_inf, 0)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    for scorer in ("sql", "matrix"):
        pairs = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_dup_pairs(
                df, threshold=-1.0, scorer=scorer
            ).collect()
        }
        assert pairs == {(1, 2)}, (scorer, pairs)
    for scorer in ("sql", "numpy", "matrix"):
        multi = {
            (r["id_a"], r["id_b"])
            for r in rp_near_dup_pairs_multi(
                df, dim=16, threshold=-1.0, n_planes=2, n_tables=2, scorer=scorer
            ).collect()
        }
        assert multi == {(1, 2)}, (scorer, multi)
