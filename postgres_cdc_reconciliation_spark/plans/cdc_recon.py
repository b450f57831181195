"""CDC, reconciliation, and replication-status queries with DuckDB oracles.

These are the reference's core capabilities (SURVEY.md §2.1, §2.3 J7/J8,
§2.9) re-expressed Spark-first, driven by the deterministic fixtures in
..fixtures (same derivations on both engines).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import fixtures as fx
from ..functions.lsn import long_to_lsn, lsn_to_long
from ..operators import status as st
from .registry import register

SPECS = ["public.orders", "public.lineitem", "public.customer", "public.missing"]
_SPECS_VALUES = ", ".join(
    "('%s', '%s')" % tuple(s.split(".")) for s in SPECS
)


def _lsn(e: str) -> str:
    return fx.oracle_lsn_to_long(e)


# Shared oracle CTE pipeline mirroring operators.status.latest_status_multi.
_LATEST_JOINED_CTES = f"""{fx.oracle_batch_control_cte()},
{fx.oracle_slots_cte()},
{fx.oracle_pubs_cte()},
specs(schema_name, table_name) AS (VALUES {_SPECS_VALUES}),
latest AS (
  SELECT * FROM (
    SELECT bc.schema_name, bc.table_name, bc.batch_id,
           bc.completion_lsn AS batch_lsn, bc.completion_timestamp,
           ROW_NUMBER() OVER (PARTITION BY bc.schema_name, bc.table_name
                              ORDER BY bc.batch_id DESC) AS rn
    FROM batch_control bc
    JOIN specs s ON bc.schema_name = s.schema_name AND bc.table_name = s.table_name
    WHERE bc.status = 'COMPLETED' AND bc.completion_lsn IS NOT NULL
  ) WHERE rn = 1
),
table_pub AS (
  SELECT s.schema_name, s.table_name, MIN(pt.pubname) AS pubname
  FROM publication_tables pt
  JOIN specs s ON pt.schemaname = s.schema_name AND pt.tablename = s.table_name
  GROUP BY 1, 2
),
rel_slot AS (
  SELECT * FROM (
    SELECT tp.schema_name, tp.table_name, rs.slot_name,
           rs.confirmed_flush_lsn, tp.pubname,
           ROW_NUMBER() OVER (
             PARTITION BY tp.schema_name, tp.table_name
             ORDER BY CASE WHEN rs.slot_name LIKE '%' || tp.pubname || '%' THEN 1
                           WHEN rs.slot_name LIKE '%' || tp.table_name || '%' THEN 2
                           ELSE 3 END,
                      rs.slot_name) AS rn
    FROM replication_slots rs CROSS JOIN table_pub tp
    WHERE rs.slot_type = 'logical' AND rs.active
      AND (rs.slot_name LIKE '%' || tp.pubname || '%'
           OR rs.slot_name LIKE '%' || tp.table_name || '%'
           OR tp.pubname LIKE '%' || replace(rs.slot_name, '_slot', '') || '%')
  ) WHERE rn = 1
),
joined AS (
  SELECT lb.schema_name, lb.table_name, lb.batch_id AS latest_batch_id,
         rs.slot_name,
         COALESCE(rs.pubname, 'unknown') AS publication_name,
         rs.confirmed_flush_lsn AS slot_current_lsn,
         lb.batch_lsn AS batch_completion_lsn,
         COALESCE({_lsn('rs.confirmed_flush_lsn')} >= {_lsn('lb.batch_lsn')}, FALSE) AS replication_complete,
         round(date_diff('microsecond', lb.completion_timestamp, TIMESTAMP '{fx.AS_OF}') / 60000000.0, 2)
           AS minutes_since_completion
  FROM latest lb
  JOIN rel_slot rs ON lb.schema_name = rs.schema_name AND lb.table_name = rs.table_name
)"""


@register(
    "q_latest_per_group",
    f"""WITH {_LATEST_JOINED_CTES}
SELECT * FROM joined""",
    doc="W1/W2/J1-J4 latest-batch status per table, one vectorized plan — check_latest_batch_replication_status.sql:17-83",
)
def q_latest_per_group(spark, sf_dir):
    return st.latest_status_multi(
        spark,
        fx.batch_control_df(spark, sf_dir),
        fx.slots_df(spark),
        fx.pubs_df(spark),
        SPECS,
        as_of=fx.AS_OF,
    )


@register(
    "q_health_report",
    f"""WITH {_LATEST_JOINED_CTES}
SELECT schema_name, table_name, latest_batch_id, slot_name, publication_name,
       replication_complete,
       CAST(CASE WHEN NOT replication_complete
                 THEN {_lsn('batch_completion_lsn')} - {_lsn('slot_current_lsn')}
                 ELSE 0 END AS BIGINT) AS lag_bytes,
       minutes_since_completion,
       CASE WHEN replication_complete THEN 'READY'
            WHEN minutes_since_completion > 60 THEN 'STUCK'
            WHEN minutes_since_completion > 30 THEN 'SLOW'
            ELSE 'REPLICATING' END AS health_status
FROM joined""",
    doc="U1/F5/F6/O2/T7 multi-table health report — check_multiple_tables_replication_status.sql:1-90",
)
def q_health_report(spark, sf_dir):
    return st.multiple_tables_replication_status(
        spark,
        fx.batch_control_df(spark, sf_dir),
        fx.slots_df(spark),
        fx.pubs_df(spark),
        SPECS,
        as_of=fx.AS_OF,
    )


@register(
    "q_batch_status",
    f"""WITH {fx.oracle_batch_control_cte()},
{fx.oracle_slots_cte()},
{fx.oracle_pubs_cte()},
batch_info AS (
  SELECT schema_name, table_name, batch_id, completion_lsn AS batch_lsn
  FROM batch_control
  WHERE schema_name = 'public' AND table_name = 'orders'
    AND status = 'COMPLETED' AND completion_lsn IS NOT NULL
    AND completion_timestamp >= TIMESTAMP '{fx.AS_OF}' - INTERVAL 24 HOUR
),
table_pubs AS (
  SELECT DISTINCT pubname FROM publication_tables
  WHERE schemaname = 'public' AND tablename = 'orders'
),
slot_info AS (
  SELECT rs.slot_name, rs.confirmed_flush_lsn, MIN(tp.pubname) AS matched_publication
  FROM replication_slots rs
  LEFT JOIN table_pubs tp
    ON rs.slot_name LIKE '%' || tp.pubname || '%'
    OR tp.pubname LIKE '%' || replace(rs.slot_name, '_slot', '') || '%'
  WHERE rs.slot_type = 'logical' AND rs.active
  GROUP BY 1, 2
),
kept AS (
  SELECT * FROM slot_info
  WHERE matched_publication IS NOT NULL OR slot_name LIKE '%orders%'
)
SELECT bi.schema_name, bi.table_name, bi.batch_id, k.slot_name,
       COALESCE(k.matched_publication, 'unknown') AS publication_name,
       k.confirmed_flush_lsn AS slot_current_lsn,
       bi.batch_lsn AS batch_completion_lsn,
       COALESCE({_lsn('k.confirmed_flush_lsn')} >= {_lsn('bi.batch_lsn')}, FALSE) AS replication_complete,
       CAST(CASE WHEN {_lsn('k.confirmed_flush_lsn')} < {_lsn('bi.batch_lsn')}
                 THEN {_lsn('bi.batch_lsn')} - {_lsn('k.confirmed_flush_lsn')}
                 ELSE 0 END AS BIGINT) AS lag_bytes
FROM batch_info bi CROSS JOIN kept k""",
    doc="P2-P4/J2/J3/F10/T6 all recent batches × matching slots — check_batch_replication_status.sql:17-92",
)
def q_batch_status(spark, sf_dir):
    return st.batch_replication_status(
        spark,
        fx.batch_control_df(spark, sf_dir),
        fx.slots_df(spark),
        fx.pubs_df(spark),
        "public",
        "orders",
        as_of=fx.AS_OF,
    )


@register(
    "q_like_join",
    f"""WITH {fx.oracle_slots_cte()},
{fx.oracle_pubs_cte()}
SELECT rs.slot_name, pt.pubname,
       CASE WHEN rs.slot_name LIKE '%' || pt.pubname || '%' THEN 1
            WHEN pt.pubname LIKE '%' || replace(rs.slot_name, '_slot', '') || '%' THEN 2
            ELSE 3 END AS priority
FROM replication_slots rs
JOIN publication_tables pt
  ON rs.slot_name LIKE '%' || pt.pubname || '%'
  OR pt.pubname LIKE '%' || replace(rs.slot_name, '_slot', '') || '%'
WHERE rs.slot_type = 'logical' AND rs.active""",
    doc="J2/P5 theta-join via LIKE on concatenated columns → BroadcastNestedLoopJoin — check_batch_replication_status.sql:49-59",
)
def q_like_join(spark, sf_dir):
    slots = fx.slots_df(spark).filter(
        (F.col("slot_type") == "logical") & F.col("active")
    )
    pubs = fx.pubs_df(spark)
    cond = F.col("slot_name").contains(F.col("pubname")) | F.col("pubname").contains(
        F.regexp_replace("slot_name", "_slot", "")
    )
    prio = (
        F.when(F.col("slot_name").contains(F.col("pubname")), 1)
        .when(
            F.col("pubname").contains(F.regexp_replace("slot_name", "_slot", "")), 2
        )
        .otherwise(3)
    )
    return (
        slots.join(F.broadcast(pubs), cond)
        .select("slot_name", "pubname", prio.alias("priority"))
    )


@register(
    "q_lsn_ops",
    f"""WITH {fx.oracle_batch_control_cte()}
SELECT id, completion_lsn,
       {_lsn('completion_lsn')} AS lsn_long,
       printf('%X/%X', {_lsn('completion_lsn')} // 4294967296,
                        {_lsn('completion_lsn')} % 4294967296) AS canonical,
       {_lsn('completion_lsn')} - {_lsn("'1/50000'")} AS diff_from_mark,
       {_lsn('completion_lsn')} >= {_lsn("'1/50000'")} AS past_mark
FROM batch_control WHERE completion_lsn IS NOT NULL""",
    doc="F10-F12 LSN text↔BIGINT encode/decode/compare/diff — check_batch_replication_status.sql:25,75,80",
)
def q_lsn_ops(spark, sf_dir):
    bc = fx.batch_control_df(spark, sf_dir).filter(F.col("completion_lsn").isNotNull())
    lsn = lsn_to_long("completion_lsn")
    mark = 4294967296 + 327680  # '1/50000'
    return bc.select(
        "id",
        "completion_lsn",
        lsn.alias("lsn_long"),
        long_to_lsn(lsn).alias("canonical"),
        (lsn - F.lit(mark)).alias("diff_from_mark"),
        (lsn >= F.lit(mark)).alias("past_mark"),
    )


@register(
    "q_minutes_since",
    f"""WITH {fx.oracle_batch_control_cte()}
SELECT id, table_name, batch_id,
       round(date_diff('microsecond', completion_timestamp, TIMESTAMP '{fx.AS_OF}') / 60000000.0, 2)
         AS minutes_since
FROM batch_control WHERE completion_timestamp IS NOT NULL""",
    doc="F9 EXTRACT(EPOCH)/60 + ROUND(2), sub-second-faithful — check_latest_batch_replication_status.sql:79",
)
def q_minutes_since(spark, sf_dir):
    bc = fx.batch_control_df(spark, sf_dir).filter(
        F.col("completion_timestamp").isNotNull()
    )
    return bc.select(
        "id",
        "table_name",
        "batch_id",
        F.round(
            F.expr(
                f"timestampdiff(MICROSECOND, completion_timestamp, cast('{fx.AS_OF}' as timestamp_ntz))"
            )
            / 60000000.0,
            2,
        ).alias("minutes_since"),
    )


# --- CDC envelope / apply (S5-S7, T2/T3/T5) --------------------------------


@register(
    "q_cdc_parse",
    """SELECT event_id, event_type,
              CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
       FROM events""",
    doc="F20/S5 JSON field extraction (envelope-parse analog) — docker-compose.yml:73-76",
)
def q_cdc_parse(spark, sf_dir):
    e = fx.events_df(spark, sf_dir)
    return e.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").try_cast("int").alias("k"),
    )


@register(
    "q_cdc_unwrap",
    f"""WITH {fx.oracle_cdc_events_cte()}
SELECT order_id, op, CAST(amount AS DOUBLE) AS amount, customer_id, batch_id,
       source_lsn,
       CASE WHEN op = 'd' THEN 'true' ELSE 'false' END AS __deleted
FROM cdc_events""",
    doc="S6/T3 ExtractNewRecordState unwrap: after-image + __deleted rewrite — debezium-connector-config.json:22-25",
)
def q_cdc_unwrap(spark, sf_dir):
    ev = fx.cdc_events_df(spark, sf_dir)
    return ev.select(
        "order_id",
        "op",
        F.col("amount").try_cast("double").alias("amount"),
        "customer_id",
        "batch_id",
        "source_lsn",
        F.when(F.col("op") == "d", "true").otherwise("false").alias("__deleted"),
    )


@register(
    "q_cdc_apply",
    f"""WITH {fx.oracle_cdc_events_cte()},
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY order_id ORDER BY lsn_long DESC) AS rn
  FROM cdc_events
)
SELECT order_id, CAST(amount AS DOUBLE) AS amount, customer_id, batch_id, source_lsn
FROM ranked WHERE rn = 1 AND op <> 'd'""",
    doc="S7/T2 upsert apply: last event per PK wins (max LSN), deletes drop — jdbc-sink-connector-config.json:10-17",
)
def q_cdc_apply(spark, sf_dir):
    # max_by hash-agg (map-side combine), not a window sort — the oracle's
    # ROW_NUMBER formulation is semantically identical but this one shuffles
    # O(keys) instead of sorting O(events). See operators.apply.
    from ..operators.apply import latest_per_key

    ev = fx.cdc_events_df(spark, sf_dir)
    latest = latest_per_key(ev, ["order_id"], lsn_col="lsn_long", lsn_is_text=False)
    return latest.filter(F.col("op") != "d").select(
        "order_id",
        F.col("amount").try_cast("double").alias("amount"),
        "customer_id",
        "batch_id",
        "source_lsn",
    )


@register(
    "q_scd2_dim",
    f"""WITH {fx.oracle_cdc_events_cte()},
b AS (
  SELECT order_id, op, amount, customer_id, lsn_long,
         lead(lsn_long) OVER (PARTITION BY order_id ORDER BY lsn_long)
           AS valid_to
  FROM cdc_events)
SELECT order_id, CAST(amount AS DOUBLE) AS amount, customer_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY order_id ORDER BY lsn_long)
            AS BIGINT) AS version,
       lsn_long AS valid_from, valid_to,
       valid_to IS NULL AS is_current
FROM b WHERE op <> 'd'""",
    doc="[EXT] SCD type-2 dimension build from the CDC changelog — the "
    "history table a reconciliation pipeline keeps beside the live "
    "target (reference applies only the latest image, jdbc-sink-"
    "connector-config.json:10-17; this is the 'keep every version' "
    "variant warehouse teams layer on the same Debezium feed). Each "
    "non-delete event opens a version; the NEXT event on the key "
    "(update or delete) closes it via lead(lsn); a trailing delete "
    "leaves the key with no current row. One keyed window over the "
    "changelog — shuffles O(events), no interval self-join. All-exact "
    "columns (BIGINT lsn bounds, DECIMAL->DOUBLE amount, BOOLEAN flag). "
    "operators/temporal.py::scd2_build.",
)
def q_scd2_dim(spark, sf_dir):
    from ..operators.temporal import scd2_build

    ev = fx.cdc_events_df(spark, sf_dir)
    dim = scd2_build(
        ev, key="order_id", seq="lsn_long", attrs=["amount", "customer_id"]
    )
    return dim.select(
        "order_id",
        F.col("amount").try_cast("double").alias("amount"),
        "customer_id",
        "version",
        "valid_from",
        "valid_to",
        "is_current",
    )


@register(
    "q_scd2_incremental",
    f"""WITH {fx.oracle_cdc_events_cte()},
b AS (
  SELECT order_id, op, amount, customer_id, lsn_long,
         lead(lsn_long) OVER (PARTITION BY order_id ORDER BY lsn_long)
           AS valid_to
  FROM cdc_events)
SELECT order_id, CAST(amount AS DOUBLE) AS amount, customer_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY order_id ORDER BY lsn_long)
            AS BIGINT) AS version,
       lsn_long AS valid_from, valid_to,
       valid_to IS NULL AS is_current
FROM b WHERE op <> 'd'""",
    doc="[EXT] INCREMENTAL SCD2 maintenance, driver-certified: the "
    "changelog is split deterministically (half the keyspace fully in "
    "the base, the other half split right after its create event, so "
    "merged keys genuinely continue an existing open version), the base "
    "builds a history, the remainder merges into it via "
    "operators/temporal.py::scd2_merge_batch (close open versions at the "
    "key's first new seq, renumber, per-key replay guard). The oracle is "
    "the ONE-SHOT full-log build — the merge contract is exact "
    "equivalence (merge(build(log<=t), log>t) == build(log)), so any "
    "drift in the incremental path (a version double-append, a "
    "mis-closed interval, a guard leak) hash-mismatches here. Every "
    "split point + streaming e2e are pytest-pinned in "
    "tests/test_scd2_compaction_kcore.py; this row makes the driver "
    "witness one of them. Scale: the merge touches O(batch + touched "
    "keys), never re-sorting history (bucket-pruned under the "
    "streaming/scd2.py layout).",
)
def q_scd2_incremental(spark, sf_dir):
    from ..operators.cache_scope import scoped_persist
    from ..operators.temporal import scd2_build, scd2_merge_batch

    ev = fx.cdc_events_df(spark, sf_dir)
    # fixed, deterministic midpoint: lsn = key*16+off, so half the keyspace
    # (not half of each key's run) lands per side — keys near the cut have
    # their runs genuinely split across hist/batch
    mid = (F.col("order_id") % 4) < 2
    # scoped_persist (r15 opt, guide §1.2/§5): the merge reads its history
    # input three times (key-stats action, close-versions join, untouched
    # anti-join) — without the hint each consumer re-runs the full
    # changelog window build. Hint-only (deterministic recompute); the
    # streaming path feeds the merge bucket-pruned history instead, so the
    # operator itself stays persist-free.
    hist = scoped_persist(scd2_build(
        ev.filter(mid).union(ev.filter(~mid).filter(F.col("op") == "c")),
        key="order_id", seq="lsn_long", attrs=["amount", "customer_id"],
    ))
    batch = ev.filter(~mid).filter(F.col("op") != "c")
    dim = scd2_merge_batch(
        hist, batch, key="order_id", seq="lsn_long",
        attrs=["amount", "customer_id"],
    )
    return dim.select(
        "order_id",
        F.col("amount").try_cast("double").alias("amount"),
        "customer_id",
        "version",
        "valid_from",
        "valid_to",
        "is_current",
    )


@register(
    "q_changelog_compaction",
    f"""WITH {fx.oracle_cdc_events_cte()},
win AS (
  SELECT * FROM cdc_events WHERE NOT (op = 'c' AND order_id % 2 = 1)),
agg AS (
  SELECT order_id,
         min_by(op, lsn_long) AS first_op,
         max_by(struct_pack(op := op, amount := amount,
                            customer_id := customer_id), lsn_long) AS last_ev,
         min(lsn_long) AS first_seq,
         max(lsn_long) AS last_seq,
         CAST(count(*) AS BIGINT) AS n_events
  FROM win GROUP BY order_id)
SELECT order_id,
       CASE WHEN last_ev.op = 'd' THEN 'd'
            WHEN first_op = 'c' THEN 'c' ELSE 'u' END AS net_op,
       CASE WHEN last_ev.op = 'd' THEN NULL
            ELSE CAST(last_ev.amount AS DOUBLE) END AS amount,
       CASE WHEN last_ev.op = 'd' THEN NULL
            ELSE last_ev.customer_id END AS customer_id,
       n_events, first_seq, last_seq
FROM agg WHERE NOT (first_op = 'c' AND last_ev.op = 'd')""",
    doc="[EXT] changelog compaction to net effect per key — what the "
    "Kafka broker leg the reference rides on does with cleanup.policy="
    "compact (docker-compose.yml Kafka service) plus sink-side tombstone "
    "collapse: born-and-died-inside-the-window keys vanish, a surviving "
    "key collapses to one event (c/u carrying the LAST after-image, or a "
    "d tombstone with nulled attributes). Replaying the compacted log "
    "equals replaying the full log. The window starts mid-stream for odd "
    "keys (their creates predate it), so all four first/last rule "
    "branches are exercised. ONE min_by/max_by agg (map-side partial "
    "combine, shuffle O(keys) not O(events)) — no whole-log window sort, no "
    "self-join. operators/apply.py::compact_changelog.",
)
def q_changelog_compaction(spark, sf_dir):
    from ..operators.apply import compact_changelog

    ev = fx.cdc_events_df(spark, sf_dir).filter(
        ~((F.col("op") == "c") & (F.col("order_id") % 2 == 1))
    )
    out = compact_changelog(
        ev,
        key_cols=["order_id"],
        attr_cols=["amount", "customer_id"],
        seq_col="lsn_long",
    )
    return out.select(
        "order_id",
        "net_op",
        F.col("amount").try_cast("double").alias("amount"),
        "customer_id",
        "n_events",
        "first_seq",
        "last_seq",
    )


@register(
    "q_frontier_complete",
    f"""WITH {fx.oracle_cdc_events_cte()},
frontier AS (
  SELECT MAX(lsn_long) AS frontier_lsn FROM cdc_events WHERE order_id % 2 = 0
),
per_batch AS (
  SELECT batch_id, MAX(lsn_long) AS batch_max_lsn FROM cdc_events GROUP BY batch_id
)
SELECT p.batch_id, p.batch_max_lsn,
       printf('%X/%X', p.batch_max_lsn // 4294967296, p.batch_max_lsn % 4294967296) AS batch_max_lsn_text,
       p.batch_max_lsn <= f.frontier_lsn AS complete,
       CAST(CASE WHEN p.batch_max_lsn > f.frontier_lsn
                 THEN p.batch_max_lsn - f.frontier_lsn ELSE 0 END AS BIGINT) AS lag_bytes
FROM per_batch p CROSS JOIN frontier f""",
    doc="T5/T6/F11 completeness frontier (event-progress watermark): batch complete ⟺ frontier ≥ batch max LSN — check_batch_replication_status.sql:74-82",
)
def q_frontier_complete(spark, sf_dir):
    ev = fx.cdc_events_df(spark, sf_dir)
    frontier = ev.filter(F.col("order_id") % 2 == 0).agg(
        F.max("lsn_long").alias("frontier_lsn")
    )
    per_batch = ev.groupBy("batch_id").agg(F.max("lsn_long").alias("batch_max_lsn"))
    return per_batch.crossJoin(F.broadcast(frontier)).select(
        "batch_id",
        "batch_max_lsn",
        long_to_lsn("batch_max_lsn").alias("batch_max_lsn_text"),
        (F.col("batch_max_lsn") <= F.col("frontier_lsn")).alias("complete"),
        F.when(
            F.col("batch_max_lsn") > F.col("frontier_lsn"),
            F.col("batch_max_lsn") - F.col("frontier_lsn"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("lag_bytes"),
    )


# --- reconciliation (J7/J8, U2, A4) ----------------------------------------


@register(
    "q_recon_diff",
    f"""WITH {fx.oracle_recon_cte()},
src_g AS (
  SELECT order_id, COUNT(*) AS src_cnt, MAX(amount) AS src_amt FROM recon_src GROUP BY order_id
),
tgt_g AS (
  SELECT order_id, COUNT(*) AS tgt_cnt, MAX(amount) AS tgt_amt FROM recon_tgt GROUP BY order_id
),
d AS (
  SELECT COALESCE(s.order_id, t.order_id) AS order_id,
         COALESCE(s.src_cnt, 0) AS src_cnt, COALESCE(t.tgt_cnt, 0) AS tgt_cnt,
         CAST(s.src_amt AS DOUBLE) AS src_amount, CAST(t.tgt_amt AS DOUBLE) AS tgt_amount,
         CASE WHEN s.order_id IS NULL THEN 'extra_in_target'
              WHEN t.order_id IS NULL THEN 'missing_in_target'
              WHEN s.src_cnt <> t.tgt_cnt THEN 'cardinality_mismatch'
              WHEN s.src_amt IS DISTINCT FROM t.tgt_amt THEN 'value_mismatch'
         END AS diff_type
  FROM src_g s FULL OUTER JOIN tgt_g t ON s.order_id = t.order_id
)
SELECT * FROM d WHERE diff_type IS NOT NULL""",
    doc="J7 keyed full-outer reconciliation diff (fixes the reference's positional-zip misalignment, verify_replication.py:125-142)",
)
def q_recon_diff(spark, sf_dir):
    src, tgt = fx.recon_pair(spark, sf_dir)
    src_g = src.groupBy("order_id").agg(
        F.count("*").alias("src_cnt"), F.max("amount").alias("src_amt")
    )
    tgt_g = tgt.groupBy("order_id").agg(
        F.count("*").alias("tgt_cnt"), F.max("amount").alias("tgt_amt")
    )
    j = src_g.join(tgt_g, "order_id", "full_outer")
    diff_type = (
        F.when(F.col("src_cnt").isNull(), "extra_in_target")
        .when(F.col("tgt_cnt").isNull(), "missing_in_target")
        .when(F.col("src_cnt") != F.col("tgt_cnt"), "cardinality_mismatch")
        .when(~F.col("src_amt").eqNullSafe(F.col("tgt_amt")), "value_mismatch")
    )
    return (
        j.select(
            "order_id",
            F.coalesce("src_cnt", F.lit(0)).alias("src_cnt"),
            F.coalesce("tgt_cnt", F.lit(0)).alias("tgt_cnt"),
            F.col("src_amt").try_cast("double").alias("src_amount"),
            F.col("tgt_amt").try_cast("double").alias("tgt_amount"),
            diff_type.alias("diff_type"),
        )
        .filter(F.col("diff_type").isNotNull())
    )


@register(
    "q_recon_positional",
    f"""WITH {fx.oracle_recon_cte()},
s AS (
  SELECT row_number() OVER (ORDER BY order_id, amount, status) AS _pos,
         order_id AS src_order_id, CAST(amount AS DOUBLE) AS src_amount,
         status AS src_status
  FROM recon_src),
t AS (
  SELECT row_number() OVER (ORDER BY order_id, amount, status) AS _pos,
         order_id AS tgt_order_id, CAST(amount AS DOUBLE) AS tgt_amount,
         status AS tgt_status
  FROM recon_tgt)
SELECT CAST(_pos AS BIGINT) AS _pos,
       src_order_id, src_amount, src_status,
       tgt_order_id, tgt_amount, tgt_status
FROM s FULL OUTER JOIN t USING (_pos)
WHERE src_order_id IS DISTINCT FROM tgt_order_id
   OR src_amount IS DISTINCT FROM tgt_amount
   OR src_status IS DISTINCT FROM tgt_status""",
    doc="J7 positional zip-diff, bug-compatible with the reference's "
    "verify_replication.py:125-133 (rows compared by sort POSITION, not "
    "key, so one missing row misaligns every subsequent comparison — kept "
    "for parity; q_recon_diff is the keyed fix). row_number over a total "
    "order on both sides, full-outer joined on position, null-safe "
    "any-column inequality filter (operators/recon.py::"
    "diff_rows_positional). The global sort is the semantics, not an "
    "accident — this mode is O(sort) and single-frontier by definition; "
    "at 100 TB you use q_recon_fingerprint/q_recon_diff instead. "
    "Deterministic under ties: the only tied sort keys are exact "
    "duplicate rows (interchangeable positions, identical values).",
)
def q_recon_positional(spark, sf_dir):
    from ..operators.recon import diff_rows_positional

    src, tgt = fx.recon_pair(spark, sf_dir)
    out = diff_rows_positional(src, tgt, ["order_id", "amount", "status"])
    return out.select(
        F.col("_pos").cast("long").alias("_pos"),
        "src_order_id",
        F.col("src_amount").try_cast("double").alias("src_amount"),
        "src_status",
        "tgt_order_id",
        F.col("tgt_amount").try_cast("double").alias("tgt_amount"),
        "tgt_status",
    )


@register(
    "q_recon_fingerprint",
    f"""WITH {fx.oracle_recon_cte()},
s AS (
  SELECT order_id % 256 AS bucket,
         CAST(count(*) AS BIGINT) AS src_count,
         CAST(SUM(CAST(CAST('0x' || substr(md5(
              CASE WHEN order_id IS NULL THEN 'N' ELSE CAST(length(CAST(order_id AS VARCHAR)) AS VARCHAR) || ':' || CAST(order_id AS VARCHAR) END || '|' || CASE WHEN amount IS NULL THEN 'N' ELSE CAST(length(CAST(amount AS VARCHAR)) AS VARCHAR) || ':' || CAST(amount AS VARCHAR) END || '|' || CASE WHEN status IS NULL THEN 'N' ELSE CAST(length(CAST(status AS VARCHAR)) AS VARCHAR) || ':' || CAST(status AS VARCHAR) END), 1, 8) AS BIGINT) AS BIGINT)) AS BIGINT)
           AS src_fp
  FROM recon_src GROUP BY 1),
t AS (
  SELECT order_id % 256 AS bucket,
         CAST(count(*) AS BIGINT) AS tgt_count,
         CAST(SUM(CAST(CAST('0x' || substr(md5(
              CASE WHEN order_id IS NULL THEN 'N' ELSE CAST(length(CAST(order_id AS VARCHAR)) AS VARCHAR) || ':' || CAST(order_id AS VARCHAR) END || '|' || CASE WHEN amount IS NULL THEN 'N' ELSE CAST(length(CAST(amount AS VARCHAR)) AS VARCHAR) || ':' || CAST(amount AS VARCHAR) END || '|' || CASE WHEN status IS NULL THEN 'N' ELSE CAST(length(CAST(status AS VARCHAR)) AS VARCHAR) || ':' || CAST(status AS VARCHAR) END), 1, 8) AS BIGINT) AS BIGINT)) AS BIGINT)
           AS tgt_fp
  FROM recon_tgt GROUP BY 1)
SELECT CAST(bucket AS BIGINT) AS bucket,
       COALESCE(src_count, 0) AS src_count,
       COALESCE(tgt_count, 0) AS tgt_count,
       s.src_fp, t.tgt_fp,
       COALESCE(src_count, 0) = COALESCE(tgt_count, 0)
         AND src_fp IS NOT DISTINCT FROM tgt_fp AS bucket_match
FROM s FULL OUTER JOIN t USING (bucket)""",
    doc="[EXT] bucket-fingerprint reconciliation — the 100 TB FIRST pass "
    "(operators/recon.py::fingerprint_diff): each side collapses to one "
    "(count, checksum) row per key bucket (row fingerprint = 8 md5 hex "
    "chars of the netstring-canonicalized row — length-prefixed fields, "
    "null marker; same cross-engine md5 idiom as q_hash_split; bucket checksum = order-independent SUM), so the "
    "shuffle is O(buckets x partitions) partial rows — network cost "
    "independent of table width and row count, where diff_rows/"
    "diff_by_hash (q_recon_diff) ship O(rows). Matching buckets are "
    "proven divergence-free (mod 2^-32 collisions); only flagged ones "
    "proceed to the row-level drill-down (fingerprint_drilldown, "
    "pytest-pinned equal to diff_rows on the flagged subset). Key-mod "
    "bucketing here so the oracle is engine-exact; production default "
    "is xxhash64 aligned with the apply target's layout for co-located, "
    "partition-pruned reads. Non-vacuous both ways at sf0.001/0.01 "
    "(clean and divergent buckets both present).",
)
def q_recon_fingerprint(spark, sf_dir):
    from ..operators.recon import fingerprint_diff

    src, tgt = fx.recon_pair(spark, sf_dir)
    return fingerprint_diff(
        src,
        tgt,
        key_cols=["order_id"],
        n_buckets=256,
        bucket_of=lambda df: F.col("order_id") % 256,
    )


@register(
    "q_recon_setdiff",
    f"""WITH {fx.oracle_recon_cte()}
SELECT 'src_minus_tgt' AS direction, order_id, CAST(amount AS DOUBLE) AS amount, status
FROM (SELECT * FROM recon_src EXCEPT ALL SELECT * FROM recon_tgt)
UNION ALL
SELECT 'tgt_minus_src', order_id, CAST(amount AS DOUBLE), status
FROM (SELECT * FROM recon_tgt EXCEPT ALL SELECT * FROM recon_src)""",
    doc="U2 INTERSECT/EXCEPT set-diff reconciliation — generalizes verify_replication.py:125-142",
)
def q_recon_setdiff(spark, sf_dir):
    src, tgt = fx.recon_pair(spark, sf_dir)

    def tag(df, direction):
        return df.select(
            F.lit(direction).alias("direction"),
            "order_id",
            F.col("amount").try_cast("double").alias("amount"),
            "status",
        )

    return tag(src.exceptAll(tgt), "src_minus_tgt").unionByName(
        tag(tgt.exceptAll(src), "tgt_minus_src")
    )


@register(
    "q_lateral_counts",
    f"""WITH {fx.oracle_recon_cte()},
s AS (SELECT status, COUNT(*) AS src_count FROM recon_src GROUP BY status),
t AS (SELECT status, COUNT(*) AS tgt_count FROM recon_tgt GROUP BY status)
SELECT COALESCE(s.status, t.status) AS status,
       COALESCE(s.src_count, 0) AS src_count,
       COALESCE(t.tgt_count, 0) AS tgt_count,
       COALESCE(s.src_count, 0) = COALESCE(t.tgt_count, 0) AS counts_match
FROM s FULL OUTER JOIN t ON s.status = t.status""",
    doc="J6/J8/A4 per-group source-vs-target count compare (dblink/LATERAL analog, native in Spark) — docs/replication_troubleshooting.md:127-149",
)
def q_lateral_counts(spark, sf_dir):
    src, tgt = fx.recon_pair(spark, sf_dir)
    s = src.groupBy("status").agg(F.count("*").alias("src_count"))
    t = tgt.groupBy("status").agg(F.count("*").alias("tgt_count"))
    return s.join(t, "status", "full_outer").select(
        "status",
        F.coalesce("src_count", F.lit(0)).alias("src_count"),
        F.coalesce("tgt_count", F.lit(0)).alias("tgt_count"),
        (
            F.coalesce("src_count", F.lit(0)) == F.coalesce("tgt_count", F.lit(0))
        ).alias("counts_match"),
    )


@register(
    "q_csv_roundtrip",
    """SELECT o_orderkey, o_custkey, o_orderstatus,
              CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total,
              o_orderdate
       FROM orders""",
    doc="S1/S2 CSV feed-file sink + bulk load roundtrip fidelity — data_generator.py:57-64,110-114 (oracle = identity: roundtrip must lose nothing)",
)
def q_csv_roundtrip(spark, sf_dir):
    import os
    import tempfile

    sel = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").try_cast("decimal(12,2)").cast("double").alias("total"),
        "o_orderdate",
    )
    path = os.path.join(
        tempfile.gettempdir(), "pcr_csv_roundtrip_" + os.path.basename(sf_dir.rstrip("/"))
    )
    sel.write.mode("overwrite").option("header", True).csv(path)
    return spark.read.csv(
        path,
        header=True,
        schema="o_orderkey bigint, o_custkey bigint, o_orderstatus string, total double, o_orderdate timestamp_ntz",
    )


@register(
    "q_slot_lag_report",
    f"""WITH {fx.oracle_slots_cte()},
stats AS (
  SELECT slot_name, active, restart_lsn, confirmed_flush_lsn,
         {_lsn("'2/100000'")} - {_lsn('confirmed_flush_lsn')} AS lag_bytes
  FROM replication_slots WHERE slot_type = 'logical'
)
SELECT slot_name, active, restart_lsn, confirmed_flush_lsn, lag_bytes,
       CASE WHEN lag_bytes < 1024 THEN CAST(lag_bytes AS VARCHAR) || ' bytes'
            WHEN lag_bytes < 1048576 THEN CAST(round(lag_bytes / 1024.0, 2) AS VARCHAR) || ' KB'
            WHEN lag_bytes < 1073741824 THEN CAST(round(lag_bytes / 1048576.0, 2) AS VARCHAR) || ' MB'
            ELSE CAST(round(lag_bytes / 1073741824.0, 2) AS VARCHAR) || ' GB'
       END AS lag,
       '2/100000' AS current_wal_lsn
FROM stats""",
    doc="§1 diagnostic: slot lag vs WAL frontier with tiered pretty-print, worst first — docs/replication_troubleshooting.md:7-31",
)
def q_slot_lag_report(spark, sf_dir):
    from ..operators.diagnostics import slot_lag_report

    return slot_lag_report(fx.slots_df(spark), "2/100000")


@register(
    "q_publication_owners",
    f"""WITH {fx.oracle_roles_cte()},
{fx.oracle_pub_owners_cte()}
SELECT pubname,
       COALESCE(rolname, CAST(pubowner AS VARCHAR)) AS owner,
       puballtables
FROM pub_meta LEFT JOIN roles ON pubowner = oid""",
    doc="F18 ::regrole owner lookup (OID → role name, numeric-text fallback) — docs/replication_troubleshooting.md:50",
)
def q_publication_owners(spark, sf_dir):
    from ..operators.diagnostics import publication_owners

    return publication_owners(fx.pub_owners_df(spark), fx.roles_df(spark))


@register(
    "q_orc_roundtrip",
    """SELECT o_orderkey, o_orderstatus,
              CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total
       FROM orders""",
    doc="S1/S2-extension: ORC write/read roundtrip fidelity (columnar alternative to parquet; oracle = identity)",
)
def q_orc_roundtrip(spark, sf_dir):
    import os
    import tempfile

    sel = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").try_cast("decimal(12,2)").cast("double").alias("total"),
    )
    path = os.path.join(
        tempfile.gettempdir(),
        "pcr_orc_roundtrip_" + os.path.basename(sf_dir.rstrip("/")),
    )
    sel.write.mode("overwrite").orc(path)
    return spark.read.orc(path)


@register(
    "q_json_roundtrip",
    """SELECT o_orderkey, o_orderstatus,
              CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total
       FROM orders""",
    doc="S1/S2-extension: JSON-lines write/read roundtrip with declared schema (interchange format; oracle = identity)",
)
def q_json_roundtrip(spark, sf_dir):
    import os
    import tempfile

    sel = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").try_cast("decimal(12,2)").cast("double").alias("total"),
    )
    path = os.path.join(
        tempfile.gettempdir(),
        "pcr_json_roundtrip_" + os.path.basename(sf_dir.rstrip("/")),
    )
    sel.write.mode("overwrite").json(path)
    return spark.read.json(
        path, schema="o_orderkey bigint, o_orderstatus string, total double"
    )


# --- column profile diff (promoted from r5 staging) -------------------------


def _profile_side_sql(rel: str, prefix: str) -> str:
    parts = []
    for c in ("order_id", "amount", "status"):
        parts.append(
            f"""SELECT '{c}' AS "column",
       CAST(count(*) AS BIGINT) AS {prefix}_n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS {prefix}_n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS {prefix}_n_distinct,
       CAST(min({c}) AS VARCHAR) AS {prefix}_min_str,
       CAST(max({c}) AS VARCHAR) AS {prefix}_max_str
FROM {rel}"""
        )
    return "\nUNION ALL\n".join(parts)


@register(
    "q_profile_diff",
    f"""WITH {fx.oracle_recon_cte()},
sp AS ({_profile_side_sql("recon_src", "src")}),
tp AS ({_profile_side_sql("recon_tgt", "tgt")})
SELECT sp."column",
       sp.src_n_rows, tp.tgt_n_rows,
       sp.src_n_nulls, tp.tgt_n_nulls,
       sp.src_n_distinct, tp.tgt_n_distinct,
       sp.src_min_str, tp.tgt_min_str,
       sp.src_max_str, tp.tgt_max_str,
       sp.src_n_rows = tp.tgt_n_rows
         AND sp.src_n_nulls = tp.tgt_n_nulls
         AND sp.src_n_distinct = tp.tgt_n_distinct
         AND sp.src_min_str IS NOT DISTINCT FROM tp.tgt_min_str
         AND sp.src_max_str IS NOT DISTINCT FROM tp.tgt_max_str
         AS column_match
FROM sp JOIN tp USING ("column")""",
    doc="Column-level drift localization on the seeded recon pair "
    "(operators/recon.py::profile_diff, exact mode): per-column "
    "aggregates computed in parallel (null/min/max in one job, the "
    "distinct counts in their own — the Expand split), unpivoted with "
    "stack() — answers WHICH column diverged after the fingerprint pass "
    "says a bucket did (reference does row-compare only, "
    "verify_replication.py:125-142).",
)
def q_profile_diff(spark, sf_dir):
    from ..operators.recon import profile_diff

    src, tgt = fx.recon_pair(spark, sf_dir)
    return profile_diff(src, tgt)


@register(
    "q_apply_drop_audit",
    f"""WITH {fx.oracle_cdc_events_cte()}
SELECT CAST(count(*) AS BIGINT) AS events,
       CAST(SUM(CASE WHEN lsn_long IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS unorderable_lsn,
       CAST(SUM(CASE WHEN order_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS unkeyable,
       CAST(SUM(CASE WHEN lsn_long IS NULL OR order_id IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS dropped
FROM cdc_events""",
    doc="[EXT] apply-path drop audit (operators/apply.py::drop_metrics_df): "
    "how many events of a feed the latest_per_key dirty-feed guards will "
    "discard (unparseable pg_lsn / NULL key) — the relational form of the "
    "per-batch accounting apply_stream logs, for scheduled feed audits; "
    "the try_cast twin is q_cast_audit. Zero everywhere on the clean "
    "driver feed (both engines agree the guards are no-ops there); the "
    "non-zero path is exercised by the dirty-feed sweeps and the "
    "apply_stream e2e warn test. One all-map-side aggregate, no shuffle "
    "beyond the final combine.",
)
def q_apply_drop_audit(spark, sf_dir):
    from ..operators.apply import drop_metrics_df

    ev = fx.cdc_events_df(spark, sf_dir)
    return drop_metrics_df(ev, ["order_id"], lsn_col="source_lsn")


@register(
    "q_recon_repair",
    """WITH base AS (
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders)
SELECT o_orderkey, o_custkey, o_totalprice, 'u' AS op
FROM base WHERE o_orderkey % 13 = 0 OR o_orderkey % 7 = 0
UNION ALL
SELECT o_orderkey + 10000000000000,
       CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), 'd'
FROM base WHERE o_orderkey % 11 = 0""",
    doc="[EXT] reconciliation REPAIR (operators/recon.py::repair_batch): "
    "the corrective change batch that converges a drifted target onto "
    "the source — the reference's verifier stops at reporting "
    "(verify_replication.py:99-146 prints mismatches); this closes the "
    "loop so apply_batch(tgt, repair) == src (convergence pytest-pinned, "
    "tests/test_recon.py). Planted drift: keys k%13=0 dropped from the "
    "target (missing -> upsert), k%7=0 survivors at price+5.0 "
    "(value_mismatch -> upsert with the SOURCE image), phantom keys "
    "k+1e13 for k%11=0 (extra_in_target -> delete, NULL payload). Batch "
    "is O(|drift|): one keyed diff — two map-side-combinable groupBys + "
    "a full-outer join on the key; doubles compare via eqNullSafe so "
    "+5.0 flips every planted row in both engines (IEEE-exact).",
)
def q_recon_repair(spark, sf_dir):
    from ..operators.recon import repair_batch

    src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    key = F.col("o_orderkey")
    tgt = (
        src.filter(key % 13 != 0)
        .withColumn(
            "o_totalprice",
            F.when(key % 7 == 0, F.col("o_totalprice") + F.lit(5.0))
            .otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            src.filter(key % 11 == 0).withColumn(
                "o_orderkey", key + F.lit(10_000_000_000_000)
            )
        )
    )
    return repair_batch(src, tgt, ["o_orderkey"]).drop("source_lsn")
