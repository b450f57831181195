"""Round-11 session-3 scale probe: the quality/planner tier at 10x.

Four claims, each measured rather than asserted-from-the-docstring:

1. leakage_safe_split is ONE fingerprint window — wall grows ~linearly
   with documents at 10x, and group-atomicity (no duplicate class
   straddling splits) holds on the 10x corpus exactly as at sf0.1.
2. skew_report is one keyed count shuffle — wall ~flat-to-linear at 10x
   events, counts exact vs a direct groupBy.
3. join_plan is METADATA-ONLY: planning wall is O(files), so it must not
   grow with row count when the file count is fixed — the planner stays
   interactive at any table size.
4. maintain_agg_view through the manifest target is O(touched buckets):
   the SAME change batch against a 10x-bigger base costs ~the same wall
   (the base-size-independence that makes streaming IVM viable at 100 TB).

Usage: python scripts/build_sf1.py && python scripts/quality_planner_probe_r11.py
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgres_cdc_reconciliation_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("PCR_SF1_DIR", "/tmp/pcr_sf1")


def med3(fn):
    outs = []
    for _ in range(3):
        t0 = time.time()
        fn()
        outs.append(time.time() - t0)
    return statistics.median(outs)


def main():
    spark = get_spark(app_name="quality-planner-probe")
    from postgres_cdc_reconciliation_spark.fixtures import events_df
    from postgres_cdc_reconciliation_spark.operators.curation import (
        leakage_safe_split,
    )
    from postgres_cdc_reconciliation_spark.operators.layout import (
        join_plan,
        skew_report,
    )

    # ---- 1. leakage split at 10x ----
    for sf, path in (("sf0.1", SF01), ("sf1", SF1)):
        docs = spark.read.parquet(f"{path}/documents.parquet")
        out = leakage_safe_split(docs)
        w = med3(lambda: out.foreach(lambda r: None))
        straddlers = (
            out.groupBy("group_id")
            .agg(F.countDistinct("split").alias("k"))
            .filter(F.col("k") > 1)
            .count()
        )
        print(
            f"leakage_split {sf}: {docs.count()} docs wall {w:.2f}s "
            f"straddling_groups {straddlers}"
        )

    # ---- 2. skew report at 10x ----
    for sf, path in (("sf0.1", SF01), ("sf1", SF1)):
        ev = events_df(spark, path)
        rep = skew_report(ev, ["user_id"], target_rows=700)
        w = med3(lambda: rep.foreach(lambda r: None))
        exact = dict(
            ev.groupBy("user_id").count().collect()
        )
        got = {r["user_id"]: r["n_rows"] for r in rep.collect()}
        assert got == {k: v for k, v in exact.items()}, "counts drifted"
        print(f"skew_report {sf}: {len(got)} keys wall {w:.2f}s (counts exact)")

    # ---- 3. planner wall is metadata-only ----
    tmp = tempfile.mkdtemp(prefix="pcr_planprobe_")
    for tag, n in (("1x", 200_000), ("10x", 2_000_000)):
        spark.range(n).select(
            (F.col("id") % 1000).alias("k"), F.col("id").alias("v")
        ).repartition(16).write.parquet(f"{tmp}/fact_{tag}")
        spark.range(5000).select(
            F.col("id").alias("dk"), F.col("id").alias("lbl")
        ).coalesce(2).write.parquet(f"{tmp}/dim_{tag}")
        w = med3(
            lambda: join_plan(
                spark, f"{tmp}/fact_{tag}", f"{tmp}/dim_{tag}", "k", "dk"
            )
        )
        plan = join_plan(spark, f"{tmp}/fact_{tag}", f"{tmp}/dim_{tag}", "k", "dk")
        print(
            f"join_plan {tag}: rows {plan['left']['rows']} plan wall {w:.2f}s "
            f"broadcast={plan['broadcast']}"
        )

    # ---- 4. view maintenance is base-size independent ----
    from postgres_cdc_reconciliation_spark.operators.apply import (
        apply_batch,
        bucket_expr,
        latest_per_key,
    )
    from postgres_cdc_reconciliation_spark.operators.ivm import (
        build_agg_view,
        maintain_agg_view,
    )
    from postgres_cdc_reconciliation_spark.operators.manifest_target import (
        commit_delta,
        read_buckets,
    )

    n_buckets = 64
    batch = spark.createDataFrame(
        [(i, "g%d" % (i % 50), i * 3, "u", "0/%d" % i) for i in range(500)],
        "k long, g string, amt long, op string, source_lsn string",
    )
    for tag, n in (("1x", 200_000), ("10x", 2_000_000)):
        tgt = f"{tmp}/ivmbase_{tag}"
        base = spark.range(n).select(
            F.col("id").alias("k"),
            F.concat(F.lit("g"), (F.col("id") % 50).cast("string")).alias("g"),
            (F.col("id") % 97).alias("amt"),
        )
        commit_delta(base, tgt, ["k"], list(range(n_buckets)), n_buckets)
        view = build_agg_view(base, "g", ["amt"]).localCheckpoint(eager=True)

        def _maintain():
            latest = latest_per_key(batch, ["k"])
            db = [
                r[0]
                for r in latest.select(
                    bucket_expr(["k"], n_buckets).alias("_b")
                ).distinct().collect()
            ]
            before = read_buckets(spark, tgt, db)
            maintain_agg_view(
                view, before, batch, ["k"], "g", ["amt"]
            ).foreach(lambda r: None)

        w = med3(_maintain)
        print(f"maintain_agg_view {tag}: base {n} rows, 500-row batch wall {w:.2f}s")


if __name__ == "__main__":
    main()
