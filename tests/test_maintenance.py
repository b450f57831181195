"""Unified maintenance monitor (operators/maintenance.py): tier
detection across every persisted sidecar surface, threshold-driven
compaction_due verdicts, advice naming the right verb, and the two new
compaction verbs (text_index_compact, compact_batch_store) preserving
query values. VERDICT r11 #7.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.operators.maintenance import (
    compact_batch_store,
    detect_tier,
    maintenance_report,
)


def _row(report, tier):
    rows = [r for r in report.collect() if r["tier"] == tier]
    assert len(rows) == 1, report.collect()
    return rows[0]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"tok{i % 7} alpha tok{i % 5} beta gamma tok{i}") for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDetectAndReport:
    def test_manifest_target(self, spark, tmp_path):
        from postgres_cdc_reconciliation_spark.operators.manifest_target import (
            commit_delta,
        )

        root = str(tmp_path / "mt")
        df = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
        commit_delta(df, root, ["k"], list(range(4)), 4)
        assert detect_tier(spark, root) == "manifest_target"
        r = _row(maintenance_report(spark, root), "manifest_target")
        assert r["n_files"] > 0 and r["n_bytes"] > 0
        assert r["n_versions"] == 1
        assert r["stale_files"] == 0  # no orphan stage attempts
        assert r["compaction_due"] is False and r["advice"] == "healthy"
        # versions beyond the threshold flip the verdict
        for i in range(3):
            commit_delta(
                df.limit(5), root, ["k"], list(range(4)), 4
            )
        r = _row(
            maintenance_report(spark, root, max_versions=2), "manifest_target"
        )
        assert r["compaction_due"] is True and "vacuum" in r["advice"]

    def test_manifest_orphan_stage_detected(self, spark, tmp_path):
        from postgres_cdc_reconciliation_spark.operators.manifest_target import (
            commit_delta,
        )

        root = str(tmp_path / "mo")
        df = spark.range(20).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
        commit_delta(df, root, ["k"], list(range(4)), 4)
        # a crashed writer's staged-but-never-committed attempt
        df.limit(3).withColumn(
            "_bucket", F.lit(0)
        ).write.partitionBy("_bucket").parquet(f"{root}/stage/v=9-deadbeef")
        r = _row(maintenance_report(spark, root), "manifest_target")
        assert r["stale_files"] == 1
        assert r["compaction_due"] is True and "orphan" in r["advice"]

    def test_text_index(self, spark, docs, tmp_path):
        from postgres_cdc_reconciliation_spark.operators.retrieval import (
            text_index_admit,
            text_index_build,
        )

        path = str(tmp_path / "ti")
        half = docs.where(F.col("doc_id") < 30)
        text_index_build(half, path, n_buckets=8)
        assert detect_tier(spark, path) == "text_index"
        r = _row(maintenance_report(spark, path), "text_index")
        assert r["n_admits"] == 0 and r["compaction_due"] is False
        for lo in (30, 40, 50):
            text_index_admit(
                docs.where(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 10)
                ),
                path,
            )
        r = _row(maintenance_report(spark, path, max_admits=2), "text_index")
        assert r["n_admits"] == 3
        assert r["compaction_due"] is True
        assert "text_index_compact" in r["advice"]

    def test_stamped_parquet(self, spark, tmp_path):
        from postgres_cdc_reconciliation_spark.operators.layout import (
            stamp_zonemap,
        )

        path = str(tmp_path / "zp")
        spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") % 50).alias("g")
        ).repartition(4).write.parquet(path)
        stamp_zonemap(spark, path, ["k"])
        assert detect_tier(spark, path) == "stamped_parquet"
        r = _row(maintenance_report(spark, path), "stamped_parquet")
        assert r["stale_files"] == 0 and r["compaction_due"] is False
        # append files the sidecar hasn't seen: staleness rises, advice
        # names the append-mode restamp
        spark.range(1000, 2000).select(
            F.col("id").alias("k"), (F.col("id") % 50).alias("g")
        ).repartition(4).write.mode("append").parquet(path)
        r = _row(
            maintenance_report(spark, path, max_stale_share=0.25),
            "stamped_parquet",
        )
        assert r["stale_files"] == 4
        assert r["compaction_due"] is True
        assert "stamp_zonemap(mode='append')" in r["advice"]

    def test_batch_store(self, spark, tmp_path):
        path = str(tmp_path / "bs")
        for b in range(4):
            spark.createDataFrame(
                [(f"d{b}", f"band_{b % 2}")], "doc_id string, band string"
            ).write.parquet(f"{path}/batch={b}")
        assert detect_tier(spark, path) == "batch_store"
        r = _row(maintenance_report(spark, path, max_admits=3), "batch_store")
        assert r["n_admits"] == 4
        assert r["compaction_due"] is True
        assert "compact_batch_store" in r["advice"]

    def test_unknown_path_is_loud_not_fatal(self, spark, tmp_path):
        path = str(tmp_path / "plain")
        spark.range(10).write.parquet(path)
        r = _row(maintenance_report(spark, path), "unknown")
        assert r["compaction_due"] is False

    def test_multiple_paths_one_report(self, spark, tmp_path):
        p1 = str(tmp_path / "a")
        p2 = str(tmp_path / "b")
        spark.range(5).write.parquet(p1)
        spark.range(5).write.parquet(p2)
        rep = maintenance_report(spark, [p1, p2])
        assert rep.count() == 2
        with pytest.raises(ValueError, match="non-empty"):
            maintenance_report(spark, [])


class TestTextIndexCompact:
    def test_value_identical_and_flat_dirs(self, spark, docs, tmp_path):
        from postgres_cdc_reconciliation_spark.operators.retrieval import (
            bm25_persisted,
            text_index_admit,
            text_index_build,
            text_index_compact,
        )

        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        text_index_build(docs.where(F.col("doc_id") < 30), src, n_buckets=8)
        for lo in (30, 45):
            text_index_admit(
                docs.where(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 15)
                ),
                src,
            )
        meta = text_index_compact(spark, src, dst)
        assert meta["deltas"] == []
        assert meta["n_docs"] == 60
        terms = ["alpha", "tok3"]
        before = sorted(map(tuple, bm25_persisted(spark, src, terms).collect()))
        after = sorted(map(tuple, bm25_persisted(spark, dst, terms).collect()))
        assert after == before
        r = _row(maintenance_report(spark, dst), "text_index")
        assert r["n_admits"] == 0 and r["compaction_due"] is False

    def test_guards(self, spark, docs, tmp_path):
        from postgres_cdc_reconciliation_spark.operators.retrieval import (
            text_index_build,
            text_index_compact,
        )

        src = str(tmp_path / "g")
        text_index_build(docs.limit(5), src, n_buckets=4)
        with pytest.raises(ValueError, match="NEW path"):
            text_index_compact(spark, src, src)
        dst = str(tmp_path / "g2")
        text_index_compact(spark, src, dst)
        with pytest.raises(ValueError, match="already holds"):
            text_index_compact(spark, src, dst)


class TestCompactBatchStore:
    def test_rows_preserved_and_file_bound(self, spark, tmp_path):
        src = str(tmp_path / "s")
        dst = str(tmp_path / "d")
        for b in range(5):
            spark.createDataFrame(
                [(f"d{b}_{i}", f"band_{i % 3}") for i in range(20)],
                "doc_id string, band string",
            ).write.parquet(f"{src}/batch={b}")
        n = compact_batch_store(spark, src, dst, partition_col="band")
        assert n == 100
        before = sorted(
            map(
                tuple,
                spark.read.parquet(src).select("doc_id", "band").collect(),
            )
        )
        after = sorted(
            map(
                tuple,
                spark.read.parquet(dst).select("doc_id", "band").collect(),
            )
        )
        assert after == before
        r = _row(maintenance_report(spark, dst), "batch_store")
        assert r["n_admits"] == 1 and r["compaction_due"] is False
        with pytest.raises(ValueError, match="already exists"):
            compact_batch_store(spark, src, dst)

    def test_engine_facade(self, spark, tmp_path):
        from postgres_cdc_reconciliation_spark.engine import Engine

        eng = Engine(spark)
        p = str(tmp_path / "e")
        spark.range(5).write.parquet(p)
        assert eng.maintenance_report(p).count() == 1
