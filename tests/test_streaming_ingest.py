"""Streamed clustered appends (streaming/ingest_clustered.py): exactly-once
file landing under replay, per-batch sidecar maintenance, pruned reads
correct at every instant, and compaction closing the lifecycle."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.streaming.ingest_clustered import (
    clustered_append_stream,
)


def _write_batches(src, batches):
    src.mkdir()
    for i, rows in enumerate(batches):
        with open(src / f"b{i}.json", "w") as f:
            for k, v in rows:
                f.write(json.dumps({"k": k, "v": v}) + "\n")


BATCHES = [
    [(i, i * 3) for i in range(0, 200)],
    [(i, i * 3) for i in range(150, 400)],   # overlaps batch 0's range
    [(i, i * 3) for i in range(400, 450)],
]


def _run(spark, tmp_path, ckpt="ckpt", **kw):
    src = tmp_path / "in"
    if not src.exists():
        _write_batches(src, BATCHES)
    events = (
        spark.readStream.schema("k long, v long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = clustered_append_stream(
        events, str(tmp_path / "tbl"), str(tmp_path / ckpt), "k",
        zone_cols=["k"], bloom_cols=["v"], ndv_cols=["v"], **kw
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    return str(tmp_path / "tbl")


def test_appends_land_once_and_sidecars_cover_all_files(spark, tmp_path):
    from postgres_cdc_reconciliation_spark.operators.layout import (
        read_ndv,
        read_point,
        read_range,
    )

    path = _run(spark, tmp_path)
    expect = sorted(k for b in BATCHES for k, _ in b)
    got = sorted(r["k"] for r in spark.read.parquet(path).collect())
    assert got == expect  # every batch exactly once
    files = {os.path.basename(f) for f in glob.glob(f"{path}/*.parquet")}
    assert files == {f"b{i}-00000.parquet" for i in range(3)}
    for sidecar in ("_pcr_zonemap.json", "_pcr_bloom.json", "_pcr_ndv.json"):
        doc = json.load(open(f"{path}/{sidecar}"))
        assert set(doc["files"]) == files, sidecar
    # zone prune: a window only batch 2 covers opens 1 file
    out = read_range(spark, path, "k", 420, 430)
    assert sorted(r["k"] for r in out.collect()) == list(range(420, 431))
    assert len({os.path.basename(f) for f in out.inputFiles()}) == 1
    # bloom point probe on the unclustered column
    assert read_point(spark, path, {"v": 1200}).count() == 1  # k=400
    # ndv sees the merged distinct universe
    [ndv] = read_ndv(spark, path, ["v"]).collect()
    assert ndv["n_files"] == 3 and ndv["est_distinct"] > 64


def test_replay_from_fresh_checkpoint_is_a_noop(spark, tmp_path):
    path = _run(spark, tmp_path)
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    zones_before = json.load(open(f"{path}/_pcr_zonemap.json"))
    _run(spark, tmp_path, ckpt="ckpt2")  # re-delivers batch ids 0..2
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before
    assert json.load(open(f"{path}/_pcr_zonemap.json")) == zones_before


def test_torn_run_replays_idempotently(spark, tmp_path):
    """Crash window: files renamed but journal not advanced — the replay
    overwrites its own partials under the same deterministic names."""
    path = _run(spark, tmp_path)
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    # simulate the torn state: roll the journal back one batch (through
    # the module's writer — the local FS keeps checksum sidecars)
    from postgres_cdc_reconciliation_spark.streaming.ingest_clustered import (
        _write_journal,
    )

    _write_journal(spark, path, 1)
    _run(spark, tmp_path, ckpt="ckpt3")  # batch 2 re-lands over itself
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before
    assert json.load(open(f"{path}/_pcr_appends.json"))["high_water"] == 2


def test_streamed_table_compacts_into_pruned_layout(spark, tmp_path):
    from postgres_cdc_reconciliation_spark.operators.layout import (
        compact_clustered,
        read_range,
    )

    path = _run(spark, tmp_path)
    dst = str(tmp_path / "compacted")
    out = compact_clustered(spark, path, dst, n_files=2)
    assert out["n_files"] == 2
    assert out["zonemap"] == ["k"] and out["bloom"] == ["v"]
    assert out["ndv"] == ["v"]
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert sorted(map(tuple, spark.read.parquet(dst).collect())) == before
    got = sorted(r["k"] for r in read_range(spark, dst, "k", 100, 120).collect())
    assert got == list(range(100, 121))


def test_validation(spark, tmp_path):
    events = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="files_per_batch"):
        clustered_append_stream(events, "x", "y", "value", files_per_batch=0)
