"""The five troubleshooting queries, one function each
(docs/replication_troubleshooting.md:7-168) — a reference user's diagnostic
runbook, parameterized by input DataFrames + deterministic as_of/current-LSN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.lsn import lsn_to_long, pretty_bytes


def slot_lag_report(slots: DataFrame, current_wal_lsn: str) -> DataFrame:
    """§1 slot status: lag vs the current WAL frontier, pretty-printed,
    worst first (troubleshooting.md:7-31)."""
    cur = lsn_to_long(F.lit(current_wal_lsn))
    lag = cur - lsn_to_long("confirmed_flush_lsn")
    return (
        slots.filter(F.col("slot_type") == "logical")
        .select(
            "slot_name",
            "active",
            "restart_lsn",
            "confirmed_flush_lsn",
            lag.alias("lag_bytes"),
            pretty_bytes(lag).alias("lag"),
            F.lit(current_wal_lsn).alias("current_wal_lsn"),
        )
        # a never-confirmed slot (NULL flush LSN) has unknown lag → NULL,
        # sorted after the known-worst offenders, deterministically
        .orderBy(F.desc_nulls_last("lag_bytes"), "slot_name")
    )


def publication_mappings(pubs: DataFrame) -> DataFrame:
    """§2 publication → ordered table list (troubleshooting.md:43-62)."""
    return pubs.groupBy("pubname").agg(
        F.array_join(F.sort_array(F.collect_list("tablename")), ",").alias(
            "published_tables"
        ),
        F.count("*").alias("n_tables"),
    )


def all_tables_status(
    batch_control: DataFrame, slots: DataFrame, as_of: str
) -> DataFrame:
    """§3 DISTINCT ON latest batch per table × all live slots, worst lag
    first (troubleshooting.md:65-105)."""
    recent = (
        batch_control.filter(
            (F.col("status") == "COMPLETED")
            & (
                F.col("completion_timestamp")
                >= F.expr(f"timestampadd(HOUR, -24, cast('{as_of}' as timestamp_ntz))")
            )
        )
        .groupBy("schema_name", "table_name")
        .agg(
            F.max_by(
                F.struct("batch_id", "completion_lsn"), F.col("batch_id")
            ).alias("_t")
        )
        .select(
            "schema_name",
            "table_name",
            F.col("_t.batch_id").alias("latest_batch"),
            F.col("_t.completion_lsn").alias("batch_lsn"),
        )
    )
    live = slots.filter(
        (F.col("slot_type") == "logical") & F.col("active")
    ).select("slot_name", "confirmed_flush_lsn")
    flush = lsn_to_long("confirmed_flush_lsn")
    batch = lsn_to_long("batch_lsn")
    return (
        recent.crossJoin(F.broadcast(live))
        .select(
            "schema_name",
            "table_name",
            "latest_batch",
            "slot_name",
            "confirmed_flush_lsn",
            "batch_lsn",
            F.coalesce(flush >= batch, F.lit(False)).alias("replication_complete"),
            F.when(flush < batch, batch - flush).otherwise(F.lit(0)).cast("long").alias(
                "lag_bytes"
            ),
        )
        .orderBy(F.desc("lag_bytes"), "slot_name")
    )


def publication_owners(pub_meta: DataFrame, roles: DataFrame) -> DataFrame:
    """§2-extension (F18): ``pubowner::regrole`` — OID → role-name lookup.

    Reference docs/replication_troubleshooting.md:50 renders the publication
    owner via the regrole cast; Postgres resolves the OID against pg_roles
    and falls back to the numeric OID text when no role exists. Catalog-sized
    inputs → broadcast hash join, no shuffle.
    """
    r = roles.select("oid", "rolname")
    return (
        pub_meta.join(F.broadcast(r), pub_meta.pubowner == r.oid, "left")
        .select(
            "pubname",
            F.coalesce("rolname", F.col("pubowner").cast("string")).alias("owner"),
            "puballtables",
        )
        .orderBy("pubname")
    )


def compare_all_table_counts(
    pairs: dict[str, tuple[DataFrame, DataFrame]], only_mismatched: bool = True
) -> DataFrame:
    """§4 LATERAL compare_table_counts + dblink, natively: per-table counts
    both sides in one session, keep mismatches (troubleshooting.md:108-149)."""
    from .recon import compare_counts

    out = compare_counts(pairs)
    return out.filter(~F.col("counts_match")) if only_mismatched else out


def lag_trend_history(
    batch_control: DataFrame, slots: DataFrame, slot_name: str, as_of: str
) -> DataFrame:
    """§5 per-batch historical lag vs a slot's frontier over the last hour
    (correlated scalar subquery → broadcast scalar join,
    troubleshooting.md:152-167)."""
    flush = slots.filter(F.col("slot_name") == slot_name).select(
        lsn_to_long("confirmed_flush_lsn").alias("_flush")
    )
    recent = batch_control.filter(
        F.col("completion_timestamp")
        >= F.expr(f"timestampadd(HOUR, -1, cast('{as_of}' as timestamp_ntz))")
    )
    return (
        recent.crossJoin(F.broadcast(flush))
        .select(
            "table_name",
            "batch_id",
            "completion_timestamp",
            (lsn_to_long("completion_lsn") - F.col("_flush")).alias(
                "historical_lag_bytes"
            ),
        )
        .orderBy(F.desc("completion_timestamp"), "table_name")
    )
