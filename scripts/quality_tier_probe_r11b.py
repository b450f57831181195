"""Round-11 session-4 scale probe: data-quality tier + SQ8 ANN.

Measures (not asserts) the four scale claims the new operators make:

1. check_constraints single-scan efficiency: an 8-constraint row-local
   suite should cost ~one scan, not ~8 (vs running 8 one-constraint
   suites) — the claim behind folding every row-local constraint into ONE
   aggregate.
2. PSI report: wall vs corpus size (sf0.01 -> sf0.1 orders, 10x rows) with
   a fixed O(n_buckets) result — expect sublinear-to-linear scan cost,
   identical report values at any partitioning.
3. k-anonymity certificate: same 10x sweep, one keyed count shuffle.
4. SQ8: measured on-disk compression of the persisted codes table vs the
   float32 vectors, sq_topk_codes wall vs exact cosine_topk wall at sf0.1,
   and recall@5 vs exact.

Run: python scripts/quality_tier_probe_r11b.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from postgres_cdc_reconciliation_spark.session import get_spark  # noqa: E402
from postgres_cdc_reconciliation_spark.operators.quality import (  # noqa: E402
    check_constraints,
    k_anonymity_report,
    psi_report,
)
from postgres_cdc_reconciliation_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    sq_encode,
    sq_scales,
    sq_topk_codes,
)

spark = get_spark(app_name="quality-probe")
SF1 = "/root/testdata/sf0.01"
SF10 = "/root/testdata/sf0.1"

ROW_LOCAL = [
    {"kind": "not_null", "col": "l_orderkey"},
    {"kind": "not_null", "col": "l_partkey"},
    {"kind": "between", "col": "l_discount", "lo": 0.0, "hi": 0.1},
    {"kind": "between", "col": "l_quantity", "lo": 0.0, "hi": 100.0},
    {"kind": "in_set", "col": "l_returnflag", "values": ["A", "N", "R"]},
    {"kind": "in_set", "col": "l_linestatus", "values": ["O", "F"]},
    {"kind": "matches", "col": "l_linestatus", "pattern": "^[OF]$"},
    {"kind": "min_rows", "n": 1000},
]


def wall(f, n=3):
    ts = []
    for _ in range(n):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2]


print("== 1. single-scan suite: wall vs suite size (sf0.1 lineitem) ==")
li = spark.read.parquet(f"{SF10}/lineitem.parquet")
for n in (1, 2, 4, 8):
    t = wall(lambda: check_constraints(li, ROW_LOCAL[:n]).collect())
    print(f"  {n}-constraint suite: {t:.3f}s")
t_each = wall(
    lambda: [check_constraints(li, [c]).collect() for c in ROW_LOCAL]
)
print(f"  8 x 1-constraint (8 separate scans): {t_each:.3f}s")

print("== 2. PSI wall vs corpus size (orders, 10 buckets) ==")
for sf, d in (("sf0.01", SF1), ("sf0.1", SF10)):
    o = spark.read.parquet(f"{d}/orders.parquet")
    cut = F.to_timestamp(F.lit("1995-07-01"))
    ref = o.where(F.col("o_orderdate") < cut)
    cur = o.where(F.col("o_orderdate") >= cut)
    t = wall(lambda: psi_report(cur, ref, "o_totalprice", 10).collect())
    n = o.count()
    print(f"{sf}: {n} rows  psi_report {t:.3f}s (result always 10 rows)")

# partition invariance of the report values
o = spark.read.parquet(f"{SF1}/orders.parquet")
cut = F.to_timestamp(F.lit("1995-07-01"))
a = psi_report(
    o.where(F.col("o_orderdate") >= cut).repartition(3),
    o.where(F.col("o_orderdate") < cut).repartition(7),
    "o_totalprice",
    10,
).collect()
b = psi_report(
    o.where(F.col("o_orderdate") >= cut).coalesce(1),
    o.where(F.col("o_orderdate") < cut).coalesce(1),
    "o_totalprice",
    10,
).collect()
print(f"partition-invariant: {sorted(map(tuple, a)) == sorted(map(tuple, b))}")

print("== 3. k-anonymity wall vs corpus size (customer) ==")
for sf, d in (("sf0.01", SF1), ("sf0.1", SF10)):
    c = spark.read.parquet(f"{d}/customer.parquet")
    t = wall(
        lambda: k_anonymity_report(
            c, ["c_nationkey", "c_mktsegment"], k=10
        ).collect()
    )
    print(f"{sf}: {c.count()} rows  k_anonymity_report {t:.3f}s")

print("== 4. SQ8: compression, wall, recall (sf0.1 embeddings) ==")
v = spark.read.parquet(f"{SF10}/embeddings.parquet")
scales = sq_scales(v)
codes = sq_encode(v, scales)
codes_path = "/tmp/sq_codes_probe"
codes.select(
    "vec_id", F.expr("transform(codes, c -> cast(c as tinyint))").alias("codes")
).write.mode("overwrite").parquet(codes_path)


def du(p):
    p = p.replace("file://", "")
    if os.path.isfile(p):
        return os.path.getsize(p)
    tot = 0
    for root, _, files in os.walk(p):
        for f_ in files:
            tot += os.path.getsize(os.path.join(root, f_))
    return tot


vec_bytes = du(f"{SF10}/embeddings.parquet")
code_bytes = du(codes_path)
print(
    f"on-disk: float32 vectors {vec_bytes/1e6:.2f} MB, int8 codes "
    f"{code_bytes/1e6:.2f} MB  ({vec_bytes/code_bytes:.2f}x smaller)"
)

codes_persisted = spark.read.parquet(codes_path).select(
    "vec_id", F.expr("transform(codes, c -> cast(c as int))").alias("codes")
)
q = v.filter(F.col("vec_id") < 16)
t_exact = wall(lambda: cosine_topk(q, v, k=5).collect())
t_sq = wall(lambda: sq_topk_codes(q, codes_persisted, scales, k=5).collect())
exact = {
    (r["query_id"], r["neighbor_id"])
    for r in cosine_topk(q, v, k=5).collect()
}
sq = {
    (r["query_id"], r["neighbor_id"])
    for r in sq_topk_codes(q, codes_persisted, scales, k=5).collect()
}
print(
    f"wall: exact {t_exact:.3f}s  sq-codes {t_sq:.3f}s   "
    f"recall@5 {len(exact & sq) / len(exact):.3f}"
)
spark.stop()

print("== 5. prefilter_join: big-side rows entering the main join (sf0.1) ==")
spark = get_spark(app_name="quality-probe-2")
li = spark.read.parquet(f"{SF10}/lineitem.parquet")
urgent = (
    spark.read.parquet(f"{SF10}/orders.parquet")
    .where(F.col("o_orderpriority") == "1-URGENT")
    .select(F.col("o_orderkey").alias("l_orderkey"))
)
total = li.count()
# replicate the coarse pre-filter to count survivors (the operator fuses it
# into the join; the probe wants the intermediate cardinality)
filt = li
for i in range(2):
    b = F.pmod(F.xxhash64(F.col("l_orderkey"), F.lit(i)), F.lit(1 << 19))
    occ = urgent.select(b.alias("_pb")).distinct()
    filt = filt.join(F.broadcast(occ), b == F.col("_pb"), "left_semi")
survivors = filt.count()
matches = li.join(urgent, "l_orderkey", "left_semi").count()
print(
    f"big rows {total}, true matches {matches} "
    f"({matches/total:.3f}), coarse survivors {survivors} "
    f"({survivors/total:.3f}) at 2^19 buckets x 2 hashes — "
    f"shuffle input cut {total/survivors:.2f}x, fp pass-through "
    f"{(survivors-matches)/max(total-matches,1):.4f}"
)
spark.stop()
