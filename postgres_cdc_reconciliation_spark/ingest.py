"""Batch ingest with bracketing protocol (SURVEY.md §3.1, T10/T11).

The reference's data_generator.py brackets each CSV bulk load in one
transaction: record IN_PROGRESS + row_count → COPY load → stamp COMPLETED +
pg_current_wal_lsn() (data_generator.py:96-128). Rollback on failure leaves a
FAILED row with error_message.

Spark design: parquet appends are atomic per-file but not transactional
across (data, control) — so the ordering IS the protocol: write data first,
control row last (commit marker). A reader that joins data against COMPLETED
control rows never sees a half-ingested batch. Each batch's data lands in
its own ``_ingest_batch={batch_id}`` partition via dynamic partition
overwrite, so retrying a batch whose marker write failed REPLACES the
orphaned data instead of appending a second copy (the reference's
single-transaction rollback, data_generator.py:96-128, prevents exactly
that duplicate).

The engine LSN: with no WAL, the frontier advances by bytes written —
previous frontier + ingested row count (byte analog), formatted as pg_lsn
text. Monotone, deterministic, and byte-distance arithmetic keeps meaning.
"""

from __future__ import annotations

import traceback

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.lsn import lsn_to_long
from . import schemas


def _path_exists(spark: SparkSession, path: str) -> bool:
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def _read_control(spark: SparkSession, control_path: str) -> DataFrame | None:
    # only true absence means "no control table yet" — a transient read error
    # must raise, not silently restart the LSN frontier at 0 (ADVICE r1:
    # current_engine_lsn returning 0 would regress completion_lsn monotonicity)
    if not _path_exists(spark, control_path):
        return None
    return spark.read.parquet(control_path)


def current_engine_lsn(spark: SparkSession, control_path: str) -> int:
    """Max completion LSN recorded so far (0 when no control table yet)."""
    ctl = _read_control(spark, control_path)
    if ctl is None:
        return 0
    row = ctl.agg(
        F.max(lsn_to_long("completion_lsn")).alias("m")
    ).collect()[0]
    return int(row["m"] or 0)


def _lsn_text(v: int) -> str:
    return f"{v >> 32:X}/{v & 0xFFFFFFFF:X}"


def _control_row(
    spark: SparkSession,
    schema_name: str,
    table_name: str,
    batch_id: int,
    status: str,
    row_count: int | None,
    completion_lsn: str | None,
    error_message: str | None,
    as_of: str,
) -> DataFrame:
    df = spark.createDataFrame(
        [
            (
                batch_id,
                schema_name,
                table_name,
                batch_id,
                status,
                None,
                None,
                completion_lsn,
                row_count,
                error_message,
            )
        ],
        schemas.BATCH_CONTROL,
    )
    ts = F.expr(f"cast('{as_of}' as timestamp_ntz)")
    return df.withColumn("start_timestamp", ts).withColumn(
        "completion_timestamp", ts if status == "COMPLETED" else F.lit(None).cast("timestamp_ntz")
    )


def ingest_batch(
    spark: SparkSession,
    source: DataFrame | str,
    table_path: str,
    control_path: str,
    schema_name: str,
    table_name: str,
    batch_id: int,
    csv_schema: str | None = None,
    as_of: str = "2026-01-02 00:00:00",
) -> dict:
    """CSV/DataFrame → table append + COMPLETED control row (commit marker).

    source: a DataFrame, or a CSV path read with the declared schema
    (header'd feed file, data_generator.py:57-64 / COPY :110-114 analog).
    On failure: FAILED control row with the error message
    (data_generator.py:125-128; init-scripts/source/01-init.sql:16,21).
    """
    try:
        if isinstance(source, str):
            if csv_schema is None:
                raise ValueError("csv_schema required for CSV ingest")
            df = spark.read.csv(source, header=True, schema=csv_schema)
        else:
            df = source
        df = df.withColumn("batch_id", F.lit(batch_id).cast("long"))
        row_count = df.count()

        # data first — into this batch's own partition, dynamically
        # overwritten so a retry after a failed marker write replaces any
        # orphaned copy instead of duplicating it. `_ingest_batch` mirrors
        # batch_id as the layout key; batch_id itself stays a typed data
        # column (partition-value inference must not change its type).
        (
            df.withColumn("_ingest_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_ingest_batch")
            .parquet(table_path)
        )

        # … control marker last, stamped with the advanced frontier
        new_lsn = current_engine_lsn(spark, control_path) + max(row_count, 1)
        ctl = _control_row(
            spark, schema_name, table_name, batch_id, "COMPLETED",
            row_count, _lsn_text(new_lsn), None, as_of,
        )
        ctl.write.mode("append").parquet(control_path)
        return {
            "status": "COMPLETED",
            "batch_id": batch_id,
            "row_count": row_count,
            "completion_lsn": _lsn_text(new_lsn),
        }
    except Exception as e:  # FAILED marker, never a half-visible batch
        msg = f"{type(e).__name__}: {e}"[:500]
        try:
            ctl = _control_row(
                spark, schema_name, table_name, batch_id, "FAILED",
                None, None, msg, as_of,
            )
            ctl.write.mode("append").parquet(control_path)
        except Exception:
            traceback.print_exc()
        return {"status": "FAILED", "batch_id": batch_id, "error": msg}


def read_committed(
    spark: SparkSession, table_path: str, control_path: str,
    schema_name: str, table_name: str,
) -> DataFrame:
    """Read only rows whose batch has a COMPLETED marker (bracket semantics)."""
    data = spark.read.parquet(table_path)
    if "_ingest_batch" in data.columns:
        data = data.drop("_ingest_batch")
    ctl = _read_control(spark, control_path)
    if ctl is None:
        return data.limit(0)
    done = (
        ctl.filter(
            (F.col("schema_name") == schema_name)
            & (F.col("table_name") == table_name)
            & (F.col("status") == "COMPLETED")
        )
        .select("batch_id")
        .distinct()
    )
    return data.join(F.broadcast(done), "batch_id", "left_semi")


def generate_orders(
    spark: SparkSession, n: int, batch_id: int, seed: int = 42
) -> DataFrame:
    """Seeded synthetic order batch (data_generator.py:45-55, made
    deterministic per SURVEY.md §5: fix the reference's unseeded randomness).
    customer_id uniform 1..1000, amount uniform 10.00..1000.00 (2dp).

    Values derive from xxhash64(id, seed), not F.rand(seed): rand is only
    reproducible under a FIXED partitioning (its stream seeds per
    partition), so the same call on a different cluster parallelism would
    generate different rows — hash-of-id is bit-stable under any layout,
    the same partition-invariance the determinism sweep pins for queries."""
    h1 = F.pmod(F.xxhash64((F.col("id") * 2 + seed).cast("string")), F.lit(1000))
    h2 = F.pmod(
        F.xxhash64((F.col("id") * 2 + 1 + seed).cast("string")), F.lit(99001)
    )
    return (
        spark.range(n)
        .select(
            (F.col("id") + 1 + batch_id * n).cast("int").alias("order_id"),
            (h1 + 1).cast("int").alias("customer_id"),
            (h2.cast("decimal(10,2)") / 100 + 10)
            .cast("decimal(10,2)")
            .alias("amount"),
            F.expr(
                "timestampadd(SECOND, cast(id as int),"
                " cast('2026-01-01 00:00:00' as timestamp_ntz))"
            ).alias("timestamp"),
            F.lit(batch_id).cast("long").alias("batch_id"),
        )
    )
