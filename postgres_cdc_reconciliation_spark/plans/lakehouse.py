"""Driver queries over the lakehouse surface: manifest-target CDF and
additive schema evolution.

These drive the batch-expressible parts of ``operators/manifest_target.py``
(versioned-manifest commit protocol + change-data-feed between committed
versions) and ``operators/apply.py``'s additive schema evolution through the
correctness gate with DuckDB oracles — the reference gets both behaviors
from its sink database (Postgres MVCC + Debezium JDBC-sink
``schema.evolution: basic``, jdbc-sink-connector-config.json:10-17); here
they are explicit, testable operators over plain parquet.

Both queries derive their change sets deterministically from ``orders`` with
modular-arithmetic predicates, so the oracle can reconstruct the exact same
result relationally:

- q_snapshot_cdf: commit v0 = orders keys with k%7≠0; commit v1 applying
  deletes (k%11=0) and upserts (+1.0 price, k%5=0 ∧ k%11≠0); then
  ``snapshot_changes(v0→v1)`` must emit exactly the insert/update/delete
  rows the predicates imply. Double arithmetic (+1.0) is IEEE-exact in both
  engines, so the value hash matches bit-for-bit.
- q_schema_evolution: a change batch carrying a NEW column (o_note) applies
  onto a target lacking it with ``evolve_schema=True``; surviving old rows
  NULL-fill the new column.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import functions as F

from ..fixtures import load
from ..operators.apply import apply_batch, bucket_expr
from ..operators.manifest_target import commit_delta, snapshot_changes
from .registry import register

_N_BUCKETS = 8

# One committed (v0, v1) manifest root per (session, sf_dir), removed at
# process exit. Without this every invocation re-committed two full copies
# of orders under a fresh mkdtemp — the bench's 3 reps plus the correctness
# pass left ~8 abandoned copies per run in /tmp (ADVICE r3).
_CDF_ROOTS: dict[tuple[int, str], str] = {}


def _rm_cdf_roots() -> None:
    for root in _CDF_ROOTS.values():
        shutil.rmtree(root, ignore_errors=True)


atexit.register(_rm_cdf_roots)


def _ensure_cdf_root(spark, sf_dir) -> str:
    """Build (once per session × sf_dir) the two-version manifest target the
    lakehouse queries share: v0 = orders keys k%7≠0; v1 applies deletes
    (k%11=0) and upserts (+1.0 price, k%5=0 ∧ k%11≠0)."""
    cache_key = (id(spark), sf_dir)
    root = _CDF_ROOTS.get(cache_key)
    if root is None:
        root = tempfile.mkdtemp(prefix="pcr_cdf_")
        orders = load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        key = F.col("o_orderkey")
        v0 = orders.filter(key % 7 != 0)
        all_buckets = list(range(_N_BUCKETS))
        commit_delta(v0, root, ["o_orderkey"], all_buckets, _N_BUCKETS)

        upserts = orders.filter((key % 5 == 0) & (key % 11 != 0)).withColumn(
            "o_totalprice", F.col("o_totalprice") + F.lit(1.0)
        )
        changed = key % 5 == 0  # upsert keys…
        removed = key % 11 == 0  # …delete keys win on overlap
        v1 = v0.filter(~(changed | removed)).unionByName(upserts)

        # incremental commit: only buckets holding a changed key get
        # rewritten; merged holds the COMPLETE new content of exactly those
        # buckets
        touched = [
            r["_b"]
            for r in orders.filter(changed | removed)
            .select(bucket_expr(["o_orderkey"], _N_BUCKETS).alias("_b"))
            .distinct()
            .collect()  # bounded: ≤ _N_BUCKETS ids
        ]
        merged = v1.filter(
            bucket_expr(["o_orderkey"], _N_BUCKETS).isin(touched)
        )
        commit_delta(merged, root, ["o_orderkey"], touched, _N_BUCKETS)
        _CDF_ROOTS[cache_key] = root
    return root


@register(
    "q_snapshot_cdf",
    """WITH v0 AS (
         SELECT o_orderkey, o_custkey, o_totalprice
         FROM orders WHERE o_orderkey % 7 <> 0
       )
       SELECT o_orderkey, o_custkey, o_totalprice + 1.0 AS o_totalprice,
              'insert' AS _change_type
       FROM orders
       WHERE o_orderkey % 5 = 0 AND o_orderkey % 11 <> 0 AND o_orderkey % 7 = 0
       UNION ALL
       SELECT o_orderkey, o_custkey, o_totalprice + 1.0, 'update'
       FROM orders
       WHERE o_orderkey % 5 = 0 AND o_orderkey % 11 <> 0 AND o_orderkey % 7 <> 0
       UNION ALL
       SELECT o_orderkey, o_custkey, o_totalprice, 'delete'
       FROM orders
       WHERE o_orderkey % 11 = 0 AND o_orderkey % 7 <> 0""",
    doc="change-data-feed between two committed manifest versions "
    "(operators/manifest_target.py::snapshot_changes): v0 = keys k%7≠0; the "
    "delta deletes k%11=0 and upserts k%5=0∧k%11≠0 at price+1.0. Inserts/"
    "updates carry the v1 image, deletes the v0 before-image (the CDC unwrap "
    "contract). Manifest pruning reads only buckets whose data version "
    "changed — adjacent versions of a 100 TB target diff GBs, not TBs.",
)
def q_snapshot_cdf(spark, sf_dir):
    root = _ensure_cdf_root(spark, sf_dir)
    return snapshot_changes(spark, root, ["o_orderkey"], 0, 1).select(
        "o_orderkey", "o_custkey", "o_totalprice", "_change_type"
    )


@register(
    "q_manifest_point_lookup",
    """SELECT o_orderkey, o_custkey, o_totalprice
       FROM orders
       WHERE o_orderkey % 97 = 0 AND o_orderkey % 7 <> 0
         AND o_orderkey % 5 <> 0 AND o_orderkey % 11 <> 0
       UNION ALL
       SELECT o_orderkey, o_custkey, o_totalprice + 1.0
       FROM orders
       WHERE o_orderkey % 97 = 0 AND o_orderkey % 5 = 0
         AND o_orderkey % 11 <> 0""",
    doc="key-routed point lookup over the committed v1 manifest snapshot "
    "(operators/manifest_target.py::read_keys): the probe keys (orders "
    "k%97=0 — present, upserted, deleted, and never-inserted keys alike) "
    "hash to their buckets via bucket_expr, ONLY those bucket dirs are "
    "read, and the key list pushes into the parquet scan as an IN "
    "predicate — IO is O(touched buckets), never O(target). The "
    "reference's analog is verify_replication.py's per-primary-key "
    "row reads from the target database; here manifest + hash routing "
    "replace the B-tree. Oracle reconstructs v1 relationally (v0=k%7≠0, "
    "deletes k%11=0, upserts k%5=0∧k%11≠0 at +1.0) restricted to the "
    "probe keys.",
)
def q_manifest_point_lookup(spark, sf_dir):
    from ..operators.manifest_target import read_keys

    from ..operators.manifest_target import read_snapshot

    root = _ensure_cdf_root(spark, sf_dir)
    probe = [
        r["o_orderkey"]
        for r in load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 97 == 0)
        .select("o_orderkey")
        .collect()  # lookup-sized by construction: ~1% of orders keys
    ]
    if not probe:  # nothing to look up (empty corpus) — empty result, same shape
        return read_snapshot(spark, root).limit(0)
    return read_keys(spark, root, ["o_orderkey"], probe)


@register(
    "q_schema_evolution",
    """SELECT o_orderkey, o_custkey, o_totalprice,
              CAST(NULL AS VARCHAR) AS o_note
       FROM orders
       WHERE o_orderkey % 3 = 0 AND o_orderkey % 4 <> 0 AND o_orderkey % 9 <> 0
       UNION ALL
       SELECT o_orderkey, o_custkey, o_totalprice + 10.0,
              'n' || CAST(o_orderkey % 7 AS VARCHAR)
       FROM orders
       WHERE o_orderkey % 4 = 0 AND o_orderkey % 9 <> 0""",
    doc="additive schema evolution through apply_batch(evolve_schema=True) "
    "(operators/apply.py:129-146, Debezium schema.evolution basic, reference "
    "jdbc-sink-connector-config.json:14): the change batch carries a new "
    "o_note column; surviving target rows NULL-fill it, deletes (k%9=0) drop "
    "out, upserts (k%4=0) land with the evolved image.",
)
def q_schema_evolution(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    key = F.col("o_orderkey")
    target = orders.filter(key % 3 == 0)
    events = (
        orders.filter((key % 4 == 0) | (key % 9 == 0))
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(10.0))
        .withColumn(
            "o_note", F.concat(F.lit("n"), (key % 7).cast("string"))
        )
        .withColumn(
            "op", F.when(key % 9 == 0, F.lit("d")).otherwise(F.lit("u"))
        )
        .withColumn("source_lsn", F.lit("0/1000"))
    )
    return apply_batch(
        target,
        events,
        ["o_orderkey"],
        drop_cols=("op", "source_lsn"),
        evolve_schema=True,
    )
