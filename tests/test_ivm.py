"""Incremental view maintenance (operators/ivm.py): maintained views equal
full recomputes from the applied base EXACTLY — per batch, across
multi-batch sequences, and through insert/update/delete/fk-retarget."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.operators.apply import apply_batch
from postgres_cdc_reconciliation_spark.operators.ivm import (
    build_agg_view,
    build_join_view,
    maintain_agg_view,
    maintain_join_view,
)

BASE_SCHEMA = "k long, g string, amt decimal(18,2)"
EV_SCHEMA = (
    "k long, g string, amt decimal(18,2), op string, source_lsn string"
)


def _base(spark):
    rows = [
        (1, "a", Decimal("10.00")),
        (2, "a", Decimal("20.00")),
        (3, "b", Decimal("5.50")),
        (4, "c", Decimal("7.25")),
    ]
    return spark.createDataFrame(rows, BASE_SCHEMA)


def _events(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


BATCHES = [
    # update 1 (a stays), move 2 from a->b (group migration), delete 3
    [
        (1, "a", Decimal("11.00"), "u", "0/1"),
        (2, "b", Decimal("20.00"), "u", "0/2"),
        (3, "b", Decimal("5.50"), "d", "0/3"),
    ],
    # delete 4 (group c empties), insert 5 into new group d,
    # delete a key that never existed (no-op)
    [
        (4, "c", Decimal("7.25"), "d", "0/4"),
        (5, "d", Decimal("100.00"), "c", "0/5"),
        (99, "zz", Decimal("1.00"), "d", "0/6"),
    ],
    # same key twice in one batch: the higher LSN wins
    [
        (5, "d", Decimal("1.00"), "u", "0/7"),
        (5, "d", Decimal("2.00"), "u", "0/8"),
    ],
]


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_agg_view_fixpoint_over_a_batch_sequence(spark):
    base = _base(spark)
    view = build_agg_view(base, "g", ["amt"])
    for rows in BATCHES:
        ev = _events(spark, rows)
        view = maintain_agg_view(
            view, base, ev, ["k"], "g", ["amt"]
        ).localCheckpoint()
        base = apply_batch(base, ev, ["k"]).localCheckpoint()
        rebuilt = build_agg_view(base, "g", ["amt"])
        assert _rows(view) == _rows(rebuilt.select(view.columns))
    final = {r["g"]: (r["n_rows"], r["sum_amt"]) for r in view.collect()}
    # a: key1 only; b: key2 migrated in, key3 deleted; c emptied and
    # DROPPED; d: the lsn-8 image of key5
    assert final == {
        "a": (1, Decimal("11.00")),
        "b": (1, Decimal("20.00")),
        "d": (1, Decimal("2.00")),
    }


def test_agg_view_decimal_sums_are_order_free(spark):
    # maintain in two different batch orders -> identical sums (decimal)
    base = _base(spark)
    view = build_agg_view(base, "g", ["amt"])
    ev_a = _events(spark, [(1, "a", Decimal("0.10"), "u", "0/1")])
    ev_b = _events(spark, [(2, "a", Decimal("0.20"), "u", "0/2")])
    v_ab = maintain_agg_view(
        maintain_agg_view(view, base, ev_a, ["k"], "g", ["amt"]),
        apply_batch(base, ev_a, ["k"]), ev_b, ["k"], "g", ["amt"],
    )
    v_ba = maintain_agg_view(
        maintain_agg_view(view, base, ev_b, ["k"], "g", ["amt"]),
        apply_batch(base, ev_b, ["k"]), ev_a, ["k"], "g", ["amt"],
    )
    assert _rows(v_ab) == _rows(v_ba)


DIM_SCHEMA = "g string, label string"


def _dim(spark):
    return spark.createDataFrame(
        [("a", "Alpha"), ("b", "Beta"), ("d", "Delta")], DIM_SCHEMA
    )


def test_join_view_fixpoint_and_fk_retarget(spark):
    base, dim = _base(spark), _dim(spark)
    view = build_join_view(base, dim, on="g", how="inner")
    # base key 4 (g=c) has no dim row -> not in the inner view
    assert sorted(r["k"] for r in view.collect()) == [1, 2, 3]
    for rows in BATCHES:
        ev = _events(spark, rows)
        view = maintain_join_view(
            view, ev, dim, ["k"], on="g", how="inner"
        ).localCheckpoint()
        base = apply_batch(base, ev, ["k"]).localCheckpoint()
        rebuilt = build_join_view(base, dim, on="g", how="inner")
        assert _rows(view) == _rows(rebuilt.select(view.columns))
    got = {r["k"]: (r["g"], r["label"], r["amt"]) for r in view.collect()}
    # key 2 retargeted a->b picked up Beta; key 5 joined Delta at lsn 8
    assert got == {
        1: ("a", "Alpha", Decimal("11.00")),
        2: ("b", "Beta", Decimal("20.00")),
        5: ("d", "Delta", Decimal("2.00")),
    }


def test_join_view_left_keeps_dimless_rows(spark):
    base, dim = _base(spark), _dim(spark)
    view = build_join_view(base, dim, on="g", how="left")
    assert view.count() == 4
    ev = _events(spark, [(6, "nope", Decimal("3.00"), "c", "0/1")])
    view = maintain_join_view(view, ev, dim, ["k"], on="g", how="left")
    base = apply_batch(base, ev, ["k"])
    rebuilt = build_join_view(base, dim, on="g", how="left")
    assert _rows(view) == _rows(rebuilt.select(view.columns))
    [r] = view.filter(F.col("k") == 6).collect()
    assert r["label"] is None


def test_validation(spark):
    base, dim = _base(spark), _dim(spark)
    with pytest.raises(ValueError, match="how must be"):
        build_join_view(base, dim, on="g", how="full")
    view = build_join_view(base, dim, on="g")
    ev = _events(spark, [])
    with pytest.raises(ValueError, match="how must be"):
        maintain_join_view(view, ev, dim, ["k"], on="g", how="cross")


def test_empty_batch_is_identity(spark):
    base = _base(spark)
    view = build_agg_view(base, "g", ["amt"])
    ev = _events(spark, [])
    kept = maintain_agg_view(view, base, ev, ["k"], "g", ["amt"])
    assert _rows(kept) == _rows(view)
    jview = build_join_view(base, _dim(spark), on="g")
    jkept = maintain_join_view(jview, ev, _dim(spark), ["k"], on="g")
    assert _rows(jkept) == _rows(jview)
