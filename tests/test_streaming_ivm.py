"""Streaming incremental view maintenance (streaming/ivm.py): one CDC
stream keeps the manifest base target and its aggregate view current
together — the committed view equals build_agg_view over the committed
base EXACTLY at every point, replays never double-maintain, and the
view-first commit order survives a crash between the two commits."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.operators.ivm import build_agg_view
from postgres_cdc_reconciliation_spark.operators.manifest_target import (
    read_snapshot,
)
from postgres_cdc_reconciliation_spark.streaming.ivm import (
    agg_view_stream,
    current_view,
)

EV_SCHEMA = "k long, g string, amt long, op string, source_lsn string"

BATCHES = [
    # inserts across two groups
    [
        {"k": 1, "g": "a", "amt": 10, "op": "c", "source_lsn": "0/1"},
        {"k": 2, "g": "a", "amt": 20, "op": "c", "source_lsn": "0/2"},
        {"k": 3, "g": "b", "amt": 5, "op": "c", "source_lsn": "0/3"},
    ],
    # update 1, migrate 2 a->b, delete 3 (group b keeps only key 2)
    [
        {"k": 1, "g": "a", "amt": 11, "op": "u", "source_lsn": "0/4"},
        {"k": 2, "g": "b", "amt": 20, "op": "u", "source_lsn": "0/5"},
        {"k": 3, "g": "b", "amt": 5, "op": "d", "source_lsn": "0/6"},
    ],
    # delete 1 (group a empties and must drop), insert 4 into c
    [
        {"k": 1, "g": "a", "amt": 11, "op": "d", "source_lsn": "0/7"},
        {"k": 4, "g": "c", "amt": 7, "op": "c", "source_lsn": "0/8"},
    ],
]


def _write_batches(src, batches):
    """CDC batches are ORDERED; the file source triggers in modification-
    time order, so stamp strictly increasing mtimes (same-millisecond
    writes otherwise deliver arbitrarily — a real out-of-order feed, which
    this operator, like apply_stream, does not reorder)."""
    import os
    import time

    src.mkdir()
    now = time.time()
    for i, rows in enumerate(batches):
        p = src / f"b{i}.json"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(p, (now + i * 10, now + i * 10))


def _run(spark, tmp_path, ckpt="ckpt"):
    src = tmp_path / "in"
    if not src.exists():
        _write_batches(src, BATCHES)
    events = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = agg_view_stream(
        events,
        str(tmp_path / "base"),
        str(tmp_path / "view"),
        str(tmp_path / ckpt),
        key_cols=["k"],
        group_col="g",
        sum_cols=["amt"],
        n_buckets=4,
    ).trigger(availableNow=True).start()
    q.awaitTermination(180)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_view_equals_rebuild_from_committed_base(spark, tmp_path):
    _run(spark, tmp_path)
    base = read_snapshot(spark, str(tmp_path / "base"))
    # base state: k2 in b(20), k4 in c(7) — k1/k3 deleted
    assert _rows(base.select("k", "g", "amt")) == [(2, "b", 20), (4, "c", 7)]
    view = current_view(spark, str(tmp_path / "view"))
    rebuilt = build_agg_view(base, "g", ["amt"])
    assert _rows(view) == _rows(rebuilt)
    # emptied group a is GONE, not a zero row
    assert view.filter(F.col("g") == "a").count() == 0


def test_replay_never_double_maintains(spark, tmp_path):
    _run(spark, tmp_path)
    before = _rows(current_view(spark, str(tmp_path / "view")))
    # fresh checkpoint re-delivers every batch with ids <= high-water
    _run(spark, tmp_path, ckpt="ckpt2")
    after = _rows(current_view(spark, str(tmp_path / "view")))
    assert after == before
    base = read_snapshot(spark, str(tmp_path / "base"))
    assert _rows(base.select("k", "g", "amt")) == [(2, "b", 20), (4, "c", 7)]


def test_crash_between_view_and_base_commits(spark, tmp_path):
    """The middle crash window: view committed for the batch, base commit
    never ran. A replay must skip the view and still merge the base —
    converging to the same pair a clean run produces."""
    from postgres_cdc_reconciliation_spark.operators.apply import (
        apply_batch,
        latest_per_key,
    )
    from postgres_cdc_reconciliation_spark.operators.ivm import (
        maintain_agg_view,
    )
    from postgres_cdc_reconciliation_spark.operators.manifest_target import (
        commit_delta,
    )
    from postgres_cdc_reconciliation_spark.streaming.ivm import _fs

    tgt, vw = str(tmp_path / "base"), str(tmp_path / "view")
    b0 = spark.createDataFrame(
        [(1, "a", 10, "c", "0/1"), (2, "b", 20, "c", "0/2")], EV_SCHEMA
    )
    # clean batch 0 by hand (view + base)
    payload_empty = b0.limit(0).drop("op", "source_lsn")
    view0 = maintain_agg_view(
        build_agg_view(payload_empty, "g", ["amt"]),
        payload_empty,
        b0,
        ["k"],
        "g",
        ["amt"],
    )
    view0.write.parquet(f"{vw}/v=0/view")
    fs, _ = _fs(spark, vw)
    _, marker = _fs(spark, f"{vw}/v=0/_COMMIT")
    fs.create(marker, True).close()
    commit_delta(
        apply_batch(payload_empty, b0, ["k"]), tgt, ["k"], [0, 1, 2, 3], 4
    )
    # batch 1: simulate the crash — hand-commit the VIEW for the batch id
    # the stream will use (its first delivery is batch_id 0, and view
    # v=0/v=1 exist, so high-water 1 >= 0 fires the replay guard), while
    # the BASE never sees the batch
    b1_rows = [{"k": 1, "g": "a", "amt": 99, "op": "u", "source_lsn": "0/3"}]
    src = tmp_path / "in"
    _write_batches(src, [b1_rows])
    events = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    view1 = maintain_agg_view(
        spark.read.parquet(f"{vw}/v=0/view"),
        read_snapshot(spark, tgt),
        spark.createDataFrame(
            [(1, "a", 99, "u", "0/3")], EV_SCHEMA
        ),
        ["k"],
        "g",
        ["amt"],
    )
    view1.write.parquet(f"{vw}/v=1/view")
    _, marker1 = _fs(spark, f"{vw}/v=1/_COMMIT")
    fs.create(marker1, True).close()
    # the stream now replays batch ids 0 (its first delivery): view v=0
    # and v=1 exist, high-water=1 >= 0 -> view skipped; base still merges
    q = agg_view_stream(
        events,
        tgt,
        vw,
        str(tmp_path / "ckpt"),
        key_cols=["k"],
        group_col="g",
        sum_cols=["amt"],
        n_buckets=4,
    ).trigger(availableNow=True).start()
    q.awaitTermination(180)
    base = read_snapshot(spark, tgt)
    assert _rows(base.select("k", "g", "amt")) == [(1, "a", 99), (2, "b", 20)]
    view = current_view(spark, vw)
    assert _rows(view) == _rows(build_agg_view(base, "g", ["amt"]))


# ---------------------------------------------------------------------------
# join_view_stream


JV_SCHEMA = "k long, fk long, amt long, op string, source_lsn string"

JV_BATCHES = [
    # inserts: k1->fk1, k2->fk2, k3->fk1
    [
        {"k": 1, "fk": 1, "amt": 10, "op": "c", "source_lsn": "0/1"},
        {"k": 2, "fk": 2, "amt": 20, "op": "c", "source_lsn": "0/2"},
        {"k": 3, "fk": 1, "amt": 30, "op": "c", "source_lsn": "0/3"},
    ],
    # retarget k1 to fk2; retarget k2 to a MISSING dim key (inner: leaves)
    [
        {"k": 1, "fk": 2, "amt": 11, "op": "u", "source_lsn": "0/4"},
        {"k": 2, "fk": 99, "amt": 20, "op": "u", "source_lsn": "0/5"},
    ],
    # delete k3
    [
        {"k": 3, "fk": 1, "amt": 30, "op": "d", "source_lsn": "0/6"},
    ],
]


def _dim(spark):
    return spark.createDataFrame(
        [(1, "one"), (2, "two")], "fk long, label string"
    )


def _run_jv(spark, tmp_path, how="inner", ckpt="jvckpt"):
    from postgres_cdc_reconciliation_spark.streaming.ivm import (
        join_view_stream,
    )

    src = tmp_path / "jvin"
    if not src.exists():
        _write_batches(src, JV_BATCHES)
    events = (
        spark.readStream.schema(JV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = join_view_stream(
        events,
        _dim(spark),
        str(tmp_path / f"jview_{how}"),
        str(tmp_path / ckpt),
        key_cols=["k"],
        on="fk",
        how=how,
        n_buckets=4,
    ).trigger(availableNow=True).start()
    q.awaitTermination(180)


def test_join_view_stream_inner_semantics(spark, tmp_path):
    _run_jv(spark, tmp_path, how="inner")
    view = read_snapshot(spark, str(tmp_path / "jview_inner"))
    # k1 retargeted to fk2 (label two); k2 left the view (missing fk);
    # k3 deleted
    assert _rows(view.select("k", "fk", "amt", "label")) == [
        (1, 2, 11, "two")
    ]


def test_join_view_stream_left_keeps_unmatched(spark, tmp_path):
    _run_jv(spark, tmp_path, how="left", ckpt="jvckpt_left")
    view = read_snapshot(spark, str(tmp_path / "jview_left"))
    assert _rows(view.select("k", "fk", "amt", "label")) == [
        (1, 2, 11, "two"),
        (2, 99, 20, None),
    ]


def test_join_view_stream_replay_converges(spark, tmp_path):
    _run_jv(spark, tmp_path, how="inner")
    before = _rows(
        read_snapshot(spark, str(tmp_path / "jview_inner")).select(
            "k", "fk", "amt", "label"
        )
    )
    _run_jv(spark, tmp_path, how="inner", ckpt="jvckpt2")
    after = _rows(
        read_snapshot(spark, str(tmp_path / "jview_inner")).select(
            "k", "fk", "amt", "label"
        )
    )
    assert after == before == [(1, 2, 11, "two")]


def test_join_view_stream_matches_batch_operator(spark, tmp_path):
    """Fixpoint vs the batch algebra: the streamed view equals
    build_join_view over the fully-applied fact table."""
    from postgres_cdc_reconciliation_spark.operators.apply import apply_batch
    from postgres_cdc_reconciliation_spark.operators.ivm import (
        build_join_view,
    )

    _run_jv(spark, tmp_path, how="inner", ckpt="jvckpt3")
    fact = spark.createDataFrame([], "k long, fk long, amt long")
    for rows in JV_BATCHES:
        ev = spark.createDataFrame(
            [tuple(r.values()) for r in rows], JV_SCHEMA
        )
        fact = apply_batch(fact, ev, ["k"])
    want = build_join_view(fact, _dim(spark), "fk")
    view = read_snapshot(spark, str(tmp_path / "jview_inner"))
    assert _rows(view.select(*want.columns)) == _rows(want)
