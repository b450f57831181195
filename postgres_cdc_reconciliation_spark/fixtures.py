"""Deterministic reference-shaped fixtures, derived from the driver testdata.

The driver's correctness gate runs each Spark query AND an equivalent DuckDB
SQL oracle on the same parquet tables (region nation customer supplier part
orders lineitem events documents embeddings). The reference-shaped tables
(batch_control, replication slots, publication tables, CDC events — FIXTURES.md)
therefore must be derivable *identically* on both engines. This module is the
single source of truth: every derivation exists once as a Spark DataFrame
builder and once as a DuckDB CTE SQL string, built from the same constants.

All derivations are pure functions of the data (modulo/hash of keys, fixed
timestamps) — no randomness, no wall clock.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schemas

# Deterministic "now" for every NOW()-relative predicate (SURVEY.md §7 delta 3).
AS_OF = "2026-01-02 00:00:00"

# 48h of batch history, minute granularity, spread by a stride coprime to 60
# so health buckets (READY / REPLICATING / SLOW>30m / STUCK>60m) all occur.
MINUTES_MOD = 2880
MINUTE_STRIDE = 7

# (table_name, t_idx) — batch_control covers three replicated tables.
BC_TABLES = [("orders", 0), ("lineitem", 1), ("customer", 2)]

# Stand-in pg_replication_slots rows (FIXTURES.md §3): exercise all three
# LIKE-match arms, the priority ordering, and the logical/active filters.
SLOTS = [
    # slot_name, slot_type, active, restart_lsn, confirmed_flush_lsn
    ("orders_pub_slot", "logical", True, "1/40000", "1/50000"),  # arm 1 (pubname)
    ("orders_slot", "logical", True, "1/30000", "1/40000"),  # arm 2 (table name)
    ("lineitem_slot", "logical", True, "0/100000", "0/150000"),  # arms 2+3
    ("analytics_slot", "logical", True, "2/10000", "2/20000"),  # arm 3 (stripped)
    ("stray_slot", "logical", True, "0/5000", "0/6000"),  # matches nothing
    # NULL confirmed_flush_lsn: a just-created slot that never confirmed —
    # exercises the reference's ELSE false arm (replication_complete must be
    # false, not NULL). Wins 'customer' via arm 2 (table-name match beats
    # analytics_slot's arm-3 stripped-pubname match).
    ("customer_slot", "logical", True, "0/9000", None),
    ("physical_decoy", "physical", True, "0/1000", "0/2000"),  # filtered: type
    ("inactive_slot", "logical", False, "0/1000", "0/2000"),  # filtered: active
]

# Stand-in pg_publication_tables rows (FIXTURES.md §4).
PUBS = [
    ("orders_pub", "public", "orders"),
    ("orders_pub", "public", "batch_control"),
    ("lineitem_pub", "public", "lineitem"),
    ("analytics_pub", "public", "customer"),
]

# pg_roles stand-in for ::regrole resolution (F18,
# docs/replication_troubleshooting.md:50): oid → rolname.
ROLES = [
    (10, "postgres"),
    (16384, "repl_user"),
    (16385, "analytics_owner"),
]

# pg_publication stand-in: pubname, pubowner OID, puballtables.
# orphan_pub's owner OID has no pg_roles row — ::regrole then renders the
# numeric OID text, which the lookup must reproduce.
PUB_OWNERS = [
    ("orders_pub", 16384, False),
    ("lineitem_pub", 10, False),
    ("analytics_pub", 16385, False),
    ("orphan_pub", 99999, True),
]


def orders_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def events_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table, with its parquet ``ts`` column normalized to
    TIMESTAMP_NTZ regardless of how the generator wrote it.

    Two generator vintages exist: TIMESTAMP(NANOS), which Spark's reader
    rejects unless read as raw longs (nanosAsLong) and rebuilt by truncating
    to micros (the exact semantics DuckDB applies, so oracle comparisons
    line up — pure NTZ arithmetic, independent of session timezone); and
    TIMESTAMP(MICROS), which Spark reads natively and only needs an NTZ
    cast for sessions whose timestampType default is LTZ.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = raw.schema["ts"].dataType.simpleString()
    if ts_type == "bigint":
        return raw.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000,"
                " cast('1970-01-01 00:00:00' as timestamp_ntz))"
            ),
        )
    return raw.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


# ---------------------------------------------------------------------------
# batch_control — derived from orders: batch_id = o_orderkey // 100 (the
# reference ingests ~100 orders/batch, config.json:10), replicated over three
# tables, with a deterministic status machine / timestamps / LSNs.
# For row (batch_id, t_idx), let k = batch_id*3 + t_idx:
#   status      = k%10==7 -> IN_PROGRESS, k%10==8 -> FAILED, else COMPLETED
#   minutes_ago = (k*7) % 2880
#   completion  = AS_OF - minutes_ago min   (NULL unless COMPLETED)
#   start       = AS_OF - (minutes_ago+5) min
#   lsn         = hex((batch_id+t_idx)%3) '/' hex((batch_id+1)*65536 + t_idx*256)
# ---------------------------------------------------------------------------


# Derived-fixture cache: the same batch_control / cdc_events DataFrames are
# inputs to ~10 registered queries; within one session derive + cache once
# (metadata-sized: ~4.5k control rows / ~400k event rows at sf0.1).
_FIXTURE_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def _cached(spark: SparkSession, sf_dir: str, kind: str, build) -> DataFrame:
    key = (id(spark), sf_dir, kind)
    if key not in _FIXTURE_CACHE:
        _FIXTURE_CACHE[key] = build().cache()
    return _FIXTURE_CACHE[key]


def batch_control_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cached(spark, sf_dir, "batch_control", lambda: _batch_control_df(spark, sf_dir))


def _batch_control_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    batches = (
        orders_raw(spark, sf_dir)
        .select(F.floor(F.col("o_orderkey") / 100).cast("long").alias("batch_id"))
        .distinct()
    )
    tables = _catalog_values_df(
        spark, [(t, i) for t, i in BC_TABLES], "table_name string, t_idx int"
    )
    base = batches.crossJoin(F.broadcast(tables)).withColumn(
        "k", F.col("batch_id") * 3 + F.col("t_idx")
    )
    as_of = F.expr(f"cast('{AS_OF}' as timestamp_ntz)")
    status = (
        F.when(F.col("k") % 10 == 7, F.lit("IN_PROGRESS"))
        .when(F.col("k") % 10 == 8, F.lit("FAILED"))
        .otherwise(F.lit("COMPLETED"))
    )
    minutes_ago = (F.col("k") * MINUTE_STRIDE) % MINUTES_MOD
    completed = F.col("status") == "COMPLETED"
    return (
        base.withColumn("status", status)
        .withColumn("minutes_ago", minutes_ago)
        .select(
            F.col("k").alias("id"),
            F.lit("public").alias("schema_name"),
            F.col("table_name"),
            F.col("batch_id"),
            F.col("status"),
            F.expr(
                f"timestampadd(MINUTE, -(cast(minutes_ago as int) + 5),"
                f" cast('{AS_OF}' as timestamp_ntz))"
            ).alias("start_timestamp"),
            F.when(
                completed,
                F.expr(
                    f"timestampadd(MINUTE, -cast(minutes_ago as int),"
                    f" cast('{AS_OF}' as timestamp_ntz))"
                ),
            ).alias("completion_timestamp"),
            F.when(
                completed,
                F.format_string(
                    "%X/%X",
                    (F.col("batch_id") + F.col("t_idx")) % 3,
                    (F.col("batch_id") + 1) * 65536 + F.col("t_idx") * 256,
                ),
            ).alias("completion_lsn"),
            F.lit(100).alias("row_count"),
            F.when(F.col("status") == "FAILED", F.lit("simulated load failure")).alias(
                "error_message"
            ),
        )
    )


def _catalog_values_df(spark: SparkSession, rows: list[tuple], schema) -> DataFrame:
    """Tiny catalog fixture as a JVM LocalRelation (``VALUES ... AS t(...)``),
    NOT ``createDataFrame(list, schema)``. The latter routes through
    applySchemaToPythonRDD — a Python RDD that re-runs a Python-worker
    round-trip on EVERY action of every consuming plan; profiling showed it
    alone cost ~0.7 s per warm status-query execution, the bulk of the
    <1 s interactive budget (VERDICT r9 #5). A VALUES relation is
    evaluated driver-side in the JVM (ConvertToLocalRelation folds the
    typing casts), so broadcast builds over the catalog are effectively
    free. Only hit for literal scalar rows — parquet-derived fixtures
    don't come through here."""
    from pyspark.sql.types import StructType, _parse_datatype_string

    if not isinstance(schema, StructType):
        schema = _parse_datatype_string(schema)

    def lit(v, dt) -> str:
        if v is None:
            return f"CAST(NULL AS {dt.simpleString()})"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return f"CAST({v} AS {dt.simpleString()})"

    values = ", ".join(
        "(" + ", ".join(lit(v, f.dataType) for v, f in zip(r, schema.fields)) + ")"
        for r in rows
    )
    cols = ", ".join(f.name for f in schema.fields)
    df = spark.sql(f"SELECT * FROM (VALUES {values}) AS t({cols})")
    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def slots_df(spark: SparkSession) -> DataFrame:
    return _catalog_values_df(spark, SLOTS, schemas.REPLICATION_SLOTS)


def pubs_df(spark: SparkSession) -> DataFrame:
    return _catalog_values_df(spark, PUBS, schemas.PUBLICATION_TABLES)


def roles_df(spark: SparkSession) -> DataFrame:
    return _catalog_values_df(spark, ROLES, "oid bigint, rolname string")


def pub_owners_df(spark: SparkSession) -> DataFrame:
    return _catalog_values_df(
        spark, PUB_OWNERS, "pubname string, pubowner bigint, puballtables boolean"
    )


# ---------------------------------------------------------------------------
# DuckDB oracle CTEs — the same derivations in ANSI-ish SQL. Each returns a
# "name AS (...)" fragment to splice into a WITH clause.
# ---------------------------------------------------------------------------


def _values_sql(rows: list[tuple], quote=lambda v: v) -> str:
    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(v)

    return ", ".join("(" + ", ".join(lit(v) for v in row) + ")" for row in rows)


def oracle_batch_control_cte() -> str:
    return f"""
batch_ids AS (
  SELECT DISTINCT CAST(o_orderkey // 100 AS BIGINT) AS batch_id FROM orders
),
bc_tables(table_name, t_idx) AS (VALUES {_values_sql(BC_TABLES)}),
bc_base AS (
  SELECT batch_id, table_name, t_idx, batch_id * 3 + t_idx AS k
  FROM batch_ids CROSS JOIN bc_tables
),
batch_control AS (
  SELECT
    k AS id,
    'public' AS schema_name,
    table_name,
    batch_id,
    CASE k % 10 WHEN 7 THEN 'IN_PROGRESS' WHEN 8 THEN 'FAILED' ELSE 'COMPLETED' END AS status,
    TIMESTAMP '{AS_OF}' - to_minutes(CAST((k * {MINUTE_STRIDE}) % {MINUTES_MOD} + 5 AS BIGINT)) AS start_timestamp,
    CASE WHEN k % 10 NOT IN (7, 8)
         THEN TIMESTAMP '{AS_OF}' - to_minutes(CAST((k * {MINUTE_STRIDE}) % {MINUTES_MOD} AS BIGINT))
    END AS completion_timestamp,
    CASE WHEN k % 10 NOT IN (7, 8)
         THEN printf('%X/%X', (batch_id + t_idx) % 3, (batch_id + 1) * 65536 + t_idx * 256)
    END AS completion_lsn,
    100 AS row_count,
    CASE WHEN k % 10 = 8 THEN 'simulated load failure' END AS error_message
  FROM bc_base
)"""


def oracle_slots_cte() -> str:
    return (
        "replication_slots(slot_name, slot_type, active, restart_lsn,"
        f" confirmed_flush_lsn) AS (VALUES {_values_sql(SLOTS)})"
    )


def oracle_pubs_cte() -> str:
    return (
        "publication_tables(pubname, schemaname, tablename) AS "
        f"(VALUES {_values_sql(PUBS)})"
    )


def oracle_roles_cte() -> str:
    return f"roles(oid, rolname) AS (VALUES {_values_sql(ROLES)})"


def oracle_pub_owners_cte() -> str:
    return (
        "pub_meta(pubname, pubowner, puballtables) AS "
        f"(VALUES {_values_sql(PUB_OWNERS)})"
    )


# DuckDB expression: parse 'H/L' LSN text to BIGINT (matches functions.lsn).
# NULL-guarded: DuckDB split_part(NULL, ...) yields '' (not NULL), so the
# naive '0x' || ... would fail to cast instead of propagating NULL the way
# Spark's split_part/conv do.
def oracle_lsn_to_long(expr: str) -> str:
    return (
        f"(CASE WHEN {expr} IS NULL THEN NULL ELSE"
        f" CAST('0x' || split_part({expr}, '/', 1) AS BIGINT) * 4294967296"
        f" + CAST('0x' || split_part({expr}, '/', 2) AS BIGINT) END)"
    )


# ---------------------------------------------------------------------------
# CDC change-event fixture (FIXTURES.md §5) — derived from orders.
# Per order key: one insert; keys %5==0 get an early update (+5.00, lower
# LSN); keys %3==0 a later update (+1.00); keys %7==0 a final delete.
# LSN = key*16 + {1,3,5,9} formatted as hex text — proves max-LSN
# last-writer-wins dedup and delete semantics.
# ---------------------------------------------------------------------------


def cdc_events_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cached(spark, sf_dir, "cdc_events", lambda: _cdc_events_df(spark, sf_dir))


def _cdc_events_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = orders_raw(spark, sf_dir).select(
        F.col("o_orderkey").alias("order_id"),
        (F.col("o_custkey") % 1000).cast("int").alias("customer_id"),
        F.col("o_totalprice").try_cast("decimal(10,2)").alias("amount"),
        F.col("o_orderdate").alias("ts"),
        F.floor(F.col("o_orderkey") / 100).cast("long").alias("batch_id"),
    )

    def ev(df: DataFrame, op: str, lsn_off: int, amount_delta: str | None) -> DataFrame:
        amount = (
            F.expr(f"cast(amount + {amount_delta} as decimal(10,2))")
            if amount_delta
            else F.col("amount")
        )
        lsn_long = F.col("order_id") * 16 + lsn_off
        return df.select(
            F.col("order_id"),
            F.lit(op).alias("op"),
            F.when(F.lit(op) != "d", amount).alias("amount"),
            F.col("customer_id"),
            F.col("ts"),
            F.col("batch_id"),
            F.format_string(
                "%X/%X",
                F.shiftrightunsigned(lsn_long, 32),
                lsn_long.bitwiseAND(F.lit(0xFFFFFFFF)),
            ).alias("source_lsn"),
            lsn_long.alias("lsn_long"),
        )

    inserts = ev(o, "c", 1, None)
    early_updates = ev(o.filter(F.col("order_id") % 5 == 0), "u", 3, "5.00")
    late_updates = ev(o.filter(F.col("order_id") % 3 == 0), "u", 5, "1.00")
    deletes = ev(o.filter(F.col("order_id") % 7 == 0), "d", 9, None)
    return inserts.unionByName(early_updates).unionByName(late_updates).unionByName(
        deletes
    )


def oracle_cdc_events_cte() -> str:
    base = """
  SELECT CAST(o_orderkey AS BIGINT) AS order_id,
         CAST(o_custkey % 1000 AS INTEGER) AS customer_id,
         CAST(o_totalprice AS DECIMAL(10,2)) AS amount,
         o_orderdate AS ts,
         CAST(o_orderkey // 100 AS BIGINT) AS batch_id
  FROM orders"""
    return f"""
cdc_base AS ({base}),
cdc_events AS (
  SELECT order_id, 'c' AS op, amount, customer_id, ts, batch_id,
         printf('%X/%X', (order_id*16+1) // 4294967296, (order_id*16+1) % 4294967296) AS source_lsn,
         order_id*16+1 AS lsn_long
  FROM cdc_base
  UNION ALL
  SELECT order_id, 'u', CAST(amount + 5.00 AS DECIMAL(10,2)), customer_id, ts, batch_id,
         printf('%X/%X', (order_id*16+3) // 4294967296, (order_id*16+3) % 4294967296),
         order_id*16+3
  FROM cdc_base WHERE order_id % 5 = 0
  UNION ALL
  SELECT order_id, 'u', CAST(amount + 1.00 AS DECIMAL(10,2)), customer_id, ts, batch_id,
         printf('%X/%X', (order_id*16+5) // 4294967296, (order_id*16+5) % 4294967296),
         order_id*16+5
  FROM cdc_base WHERE order_id % 3 = 0
  UNION ALL
  SELECT order_id, 'd', NULL, customer_id, ts, batch_id,
         printf('%X/%X', (order_id*16+9) // 4294967296, (order_id*16+9) % 4294967296),
         order_id*16+9
  FROM cdc_base WHERE order_id % 7 = 0
)"""


# ---------------------------------------------------------------------------
# Reconciliation source/target pair (FIXTURES.md §6): target = orders with
# seeded mutations — rows %97==0 missing, %89==0 amount-perturbed (+0.01),
# %101==0 duplicated, 3 extra rows with shifted keys.
# ---------------------------------------------------------------------------


def recon_pair(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    src = orders_raw(spark, sf_dir).select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_totalprice").try_cast("decimal(12,2)").alias("amount"),
        F.col("o_orderstatus").alias("status"),
    )
    tgt_main = src.filter(F.col("order_id") % 97 != 0).withColumn(
        "amount",
        F.when(
            F.col("order_id") % 89 == 0,
            F.expr("cast(amount + 0.01 as decimal(12,2))"),
        ).otherwise(F.col("amount")),
    )
    dups = src.filter(F.col("order_id") % 101 == 0).filter(F.col("order_id") % 97 != 0)
    extras = src.filter(F.col("order_id") < 3).select(
        (F.col("order_id") + 10_000_000).alias("order_id"),
        F.col("amount"),
        F.col("status"),
    )
    return src, tgt_main.unionByName(dups).unionByName(extras)


def oracle_recon_cte() -> str:
    return """
recon_src AS (
  SELECT CAST(o_orderkey AS BIGINT) AS order_id,
         CAST(o_totalprice AS DECIMAL(12,2)) AS amount,
         o_orderstatus AS status
  FROM orders
),
recon_tgt AS (
  SELECT order_id,
         CASE WHEN order_id % 89 = 0 THEN CAST(amount + 0.01 AS DECIMAL(12,2)) ELSE amount END AS amount,
         status
  FROM recon_src WHERE order_id % 97 <> 0
  UNION ALL
  SELECT order_id, amount, status FROM recon_src
  WHERE order_id % 101 = 0 AND order_id % 97 <> 0
  UNION ALL
  SELECT order_id + 10000000, amount, status FROM recon_src WHERE order_id < 3
)"""
