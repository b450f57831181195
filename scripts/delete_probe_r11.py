"""Round-11 session-4 probe: row-level delete cost on a manifest target.

Claim under test: delete_keys costs O(touched buckets) — the same 10-key
delete should cost the SAME against a 4x-bigger target, and the rewrite
should touch exactly the buckets the keys hash to (never the table).

Method (the apply_probe_r9 discipline): build targets of 150k and 600k
rows at 256 buckets, delete 10 spread keys from each, measure wall and
buckets_rewritten from the committed history; then a delete_where with a
1-bucket-selective predicate vs one spanning many buckets.

Run: python scripts/delete_probe_r11.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from postgres_cdc_reconciliation_spark.session import get_spark  # noqa: E402
from postgres_cdc_reconciliation_spark.operators.manifest_target import (  # noqa: E402
    commit_delta,
    delete_keys,
    delete_where,
    describe_history,
    read_snapshot,
)

spark = get_spark(app_name="delete-probe")
N_BUCKETS = 256

for label, n in (("150k", 150_000), ("600k", 600_000)):
    root = f"/tmp/del_probe_{label}"
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 2.0).alias("v"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    commit_delta(df, root, ["k"], list(range(N_BUCKETS)), N_BUCKETS)
    keys = [i * (n // 10) + 7 for i in range(10)]
    t0 = time.time()
    delete_keys(spark, root, ["k"], keys)
    t_del = time.time() - t0
    hist = describe_history(spark, root).collect()
    rewritten = {r["version"]: r["buckets_rewritten"] for r in hist}[
        max(r["version"] for r in hist)
    ]
    left = read_snapshot(spark, root).count()
    assert left == n - 10, (left, n)
    t0 = time.time()
    delete_where(spark, root, ["k"], f"k >= {n - 1000}")  # 1000-row range
    t_where = time.time() - t0
    hist = describe_history(spark, root).collect()
    rew_where = {r["version"]: r["buckets_rewritten"] for r in hist}[
        max(r["version"] for r in hist)
    ]
    print(
        f"{label}: delete_keys(10) {t_del:.2f}s rewrote {rewritten}/256 "
        f"buckets; delete_where(1000-row range) {t_where:.2f}s rewrote "
        f"{rew_where}/256; survivors exact"
    )
spark.stop()
