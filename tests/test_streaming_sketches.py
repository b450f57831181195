"""Incremental heavy hitters (streaming/sketches.py::cms_stream): the
persisted sketch merges across micro-batches exactly (cell-wise == a
whole-corpus build), hitters track the running threshold with no false
negatives, and a replayed stream never double-merges."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.operators.sketches import cms_build
from postgres_cdc_reconciliation_spark.streaming.sketches import (
    cms_stream,
    current_heavy_hitters,
    current_sketch,
)

W, D = 256, 4


def _write_batches(src, batches):
    src.mkdir()
    for i, rows in enumerate(batches):
        with open(src / f"b{i}.json", "w") as f:
            for v in rows:
                f.write(json.dumps({"v": v}) + "\n")


def _run(spark, tmp_path, batches, ckpt="ckpt", min_fraction=0.2):
    src = tmp_path / "in"
    if not src.exists():
        _write_batches(src, batches)
    events = (
        spark.readStream.schema("v string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = cms_stream(
        events, str(tmp_path / "cms"), str(tmp_path / ckpt), "v",
        min_fraction=min_fraction, width=W, depth=D,
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)


def test_incremental_merge_and_hitters(spark, tmp_path):
    # batch 0: 'a' x6 of 10 (60%); batch 1 adds 'b' x8 of 10 more —
    # running hitters at 20%: after all 20 events a=7 (35%), b=8 (40%)
    b0 = ["a"] * 6 + ["c", "d", "e", "f"]
    b1 = ["b"] * 8 + ["a", "g"]
    _run(spark, tmp_path, [b0, b1])
    path = str(tmp_path / "cms")

    # the streamed sketch must equal a whole-corpus batch build exactly
    whole = spark.createDataFrame([(v,) for v in b0 + b1], "v string")
    expect = sorted(
        map(tuple, cms_build(whole, "v", width=W, depth=D).collect())
    )
    got = sorted(map(tuple, current_sketch(spark, path).collect()))
    assert got == expect

    hitters = {
        r["v"]: r["est"]
        for r in current_heavy_hitters(spark, path).collect()
    }
    # exact counts: a=7, b=8, rest 1 each; threshold 0.2*20 = 4
    assert set(hitters) >= {"a", "b"}
    assert hitters["a"] >= 7 and hitters["b"] >= 8
    for v in hitters:  # bounded false positives: near-hitters only
        true = (b0 + b1).count(v)
        assert true + 2.72 / W * 20 >= 4 * 0.99 or true >= 4


def test_replay_never_double_merges(spark, tmp_path):
    b0 = ["a"] * 6 + ["c", "d", "e", "f"]
    b1 = ["b"] * 8 + ["a", "g"]
    _run(spark, tmp_path, [b0, b1])
    path = str(tmp_path / "cms")
    before = sorted(map(tuple, current_sketch(spark, path).collect()))
    # fresh checkpoint re-delivers every batch with ids <= high-water
    _run(spark, tmp_path, [b0, b1], ckpt="ckpt_replay")
    after = sorted(map(tuple, current_sketch(spark, path).collect()))
    assert after == before
    # total from hash row 0 is still exactly 20
    n = sum(c for r, _, c in after if r == 0)
    assert n == 20


def test_rising_value_readmitted(spark, tmp_path):
    # 'z' is light in batch 0 (pruned), heavy by batch 2 — it must be
    # re-admitted when it re-occurs and crosses the running threshold
    b0 = ["a"] * 5 + ["z"]
    b1 = ["a"] * 3 + ["z"] * 3
    b2 = ["z"] * 8
    _run(spark, tmp_path, [b0, b1, b2], min_fraction=0.45)
    path = str(tmp_path / "cms")
    hitters = {
        r["v"]: r["est"]
        for r in current_heavy_hitters(spark, path).collect()
    }
    # totals: a=8 (40%), z=12 (60%) of 20 — only z clears 45%, whatever
    # order the micro-batches arrived in (z is light in b0 alone, so some
    # orders prune it early and must re-admit it when it re-occurs)
    assert "z" in hitters and hitters["z"] >= 12
    assert "a" not in hitters


# --- kmv_stream: streamed bottom-k == whole-corpus build EXACTLY ------------


def _run_kmv(spark, tmp_path, batches, ckpt="kckpt", k=16):
    from postgres_cdc_reconciliation_spark.streaming.sketches import kmv_stream

    src = tmp_path / "kin"
    if not src.exists():
        _write_batches(src, batches)
    events = (
        spark.readStream.schema("v string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = kmv_stream(
        events, str(tmp_path / "kmv"), str(tmp_path / ckpt), "v", k=k
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)


def test_kmv_stream_equals_batch_build_exactly(spark, tmp_path):
    from postgres_cdc_reconciliation_spark.operators.sketches import (
        kmv_build,
        kmv_distinct,
    )
    from postgres_cdc_reconciliation_spark.streaming.sketches import current_kmv

    b0 = [f"m{i}" for i in range(40)]
    b1 = [f"m{i}" for i in range(20, 70)]  # overlaps b0
    b2 = [f"n{i}" for i in range(30)]
    _run_kmv(spark, tmp_path, [b0, b1, b2], k=16)
    path = str(tmp_path / "kmv")
    whole = spark.createDataFrame([(v,) for v in b0 + b1 + b2], "v string")
    expect = sorted(r["h"] for r in kmv_build(whole, "v", k=16).collect())
    got_df = current_kmv(spark, path)
    got = sorted(r["h"] for r in got_df.collect())
    assert got == expect  # deterministic merge: EXACT equality
    assert len(got) == 16  # bounded state at any stream length
    [est] = kmv_distinct(got_df, k=16).collect()
    assert 0 < est["est_distinct"] < 1000


def test_kmv_stream_replay_is_idempotent(spark, tmp_path):
    from postgres_cdc_reconciliation_spark.streaming.sketches import current_kmv

    b0 = [f"m{i}" for i in range(40)]
    b1 = [f"m{i}" for i in range(20, 70)]
    _run_kmv(spark, tmp_path, [b0, b1], k=16)
    path = str(tmp_path / "kmv")
    before = sorted(r["h"] for r in current_kmv(spark, path).collect())
    # fresh checkpoint re-delivers every batch (ids <= high-water skipped)
    _run_kmv(spark, tmp_path, [b0, b1], ckpt="kckpt2", k=16)
    after = sorted(r["h"] for r in current_kmv(spark, path).collect())
    assert after == before


def test_kmv_stream_validation(spark, tmp_path):
    import pytest

    from postgres_cdc_reconciliation_spark.streaming.sketches import kmv_stream

    events = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="k must be"):
        kmv_stream(events, "x", "y", "value", k=1)


# --- parameter-stamp guard (r13): restarts must present the same layout ----


class TestParamsGuard:
    def test_same_params_restart_fine_width_change_rejected(self, spark, tmp_path):
        import pytest

        _run(spark, tmp_path, [["a", "a", "b"]])
        # same params restart: allowed (and replay-guarded)
        _run(spark, tmp_path, [["a", "a", "b"]], ckpt="ckpt2")
        # different CMS layout against the same state: rejected at build
        events = (
            spark.readStream.schema("v string").json(str(tmp_path / "in"))
        )
        with pytest.raises(ValueError, match="different\\s+parameters"):
            cms_stream(events, str(tmp_path / "cms"),
                       str(tmp_path / "ckpt3"), "v",
                       min_fraction=0.2, width=W * 2, depth=D)
        # min_fraction is re-tunable, NOT frozen
        q = cms_stream(events, str(tmp_path / "cms"),
                       str(tmp_path / "ckpt4"), "v",
                       min_fraction=0.5, width=W, depth=D)
        assert q is not None

    def test_kmv_salt_change_rejected(self, spark, tmp_path):
        import pytest

        from postgres_cdc_reconciliation_spark.streaming.sketches import (
            kmv_stream,
        )

        _run_kmv(spark, tmp_path, [["a", "b", "c"]])
        events = (
            spark.readStream.schema("v string").json(str(tmp_path / "kin"))
        )
        with pytest.raises(ValueError, match="different\\s+parameters"):
            kmv_stream(events, str(tmp_path / "kmv"),
                       str(tmp_path / "kc2"), "v", k=16, salt="other-salt")
        with pytest.raises(ValueError, match="different\\s+parameters"):
            kmv_stream(events, str(tmp_path / "kmv"),
                       str(tmp_path / "kc3"), "v", k=32)

    def test_legacy_unstamped_state_needs_optin(self, spark, tmp_path):
        import pytest

        from postgres_cdc_reconciliation_spark.streaming.state_guard import (
            stamp_params,
        )

        _run(spark, tmp_path, [["a", "a", "b"]])
        (tmp_path / "cms" / "_params.json").unlink()  # pre-guard state dir
        crc = tmp_path / "cms" / "._params.json.crc"
        if crc.exists():
            crc.unlink()
        events = (
            spark.readStream.schema("v string").json(str(tmp_path / "in"))
        )
        with pytest.raises(ValueError, match="no\\s+parameter\\s+stamp"):
            cms_stream(events, str(tmp_path / "cms"),
                       str(tmp_path / "ckpt5"), "v",
                       min_fraction=0.2, width=W, depth=D)
        stamp_params(spark, str(tmp_path / "cms"),
                     {"kind": "cms", "width": W, "depth": D, "value_col": "v"})
        q = cms_stream(events, str(tmp_path / "cms"),
                       str(tmp_path / "ckpt6"), "v",
                       min_fraction=0.2, width=W, depth=D)
        assert q is not None
