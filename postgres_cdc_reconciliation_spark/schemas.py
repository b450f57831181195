"""Declared schemas (StructTypes) for the engine's tables and CDC envelope.

The reference uses static DDL-declared schemas (init-scripts/source/01-init.sql:2-24)
and a Debezium JSON change-event envelope (debezium-connector-config.json:13-25,
docker-compose.yml:73-76). Type mapping rationale in SURVEY.md §1.2.
"""

from __future__ import annotations

from pyspark.sql import types as T

# orders — the replicated user table (init-scripts/source/01-init.sql:2-8)
ORDERS = T.StructType(
    [
        T.StructField("order_id", T.IntegerType(), False),
        T.StructField("customer_id", T.IntegerType(), False),
        T.StructField("amount", T.DecimalType(10, 2), False),
        T.StructField("timestamp", T.TimestampNTZType(), False),
        T.StructField("batch_id", T.LongType(), False),
    ]
)

# batch_control — batch bookkeeping (init-scripts/source/01-init.sql:11-24)
BATCH_CONTROL = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("schema_name", T.StringType(), False),
        T.StructField("table_name", T.StringType(), False),
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("status", T.StringType(), False),  # IN_PROGRESS|COMPLETED|FAILED
        T.StructField("start_timestamp", T.TimestampNTZType(), True),
        T.StructField("completion_timestamp", T.TimestampNTZType(), True),
        T.StructField("completion_lsn", T.StringType(), True),  # 'H/L' hex text
        T.StructField("row_count", T.IntegerType(), True),
        T.StructField("error_message", T.StringType(), True),
    ]
)

# stand-in for pg_replication_slots (check_batch_replication_status.sql:43-65)
REPLICATION_SLOTS = T.StructType(
    [
        T.StructField("slot_name", T.StringType(), False),
        T.StructField("slot_type", T.StringType(), False),  # 'logical'|'physical'
        T.StructField("active", T.BooleanType(), False),
        T.StructField("restart_lsn", T.StringType(), True),
        T.StructField("confirmed_flush_lsn", T.StringType(), True),
    ]
)

# stand-in for pg_publication_tables (check_batch_replication_status.sql:34-42)
PUBLICATION_TABLES = T.StructType(
    [
        T.StructField("pubname", T.StringType(), False),
        T.StructField("schemaname", T.StringType(), False),
        T.StructField("tablename", T.StringType(), False),
    ]
)

# Debezium-style change-event envelope, pre-unwrap
# (debezium-connector-config.json:13-25; FIXTURES.md §5)
_ROW = T.StructType(
    [
        T.StructField("order_id", T.LongType(), True),
        T.StructField("customer_id", T.IntegerType(), True),
        T.StructField("amount", T.DecimalType(10, 2), True),
        T.StructField("ts", T.TimestampNTZType(), True),
        T.StructField("batch_id", T.LongType(), True),
    ]
)

CDC_ENVELOPE = T.StructType(
    [
        T.StructField("key_order_id", T.LongType(), False),
        T.StructField("op", T.StringType(), True),  # c|u|d|r ; null value = tombstone
        T.StructField("before", _ROW, True),
        T.StructField("after", _ROW, True),
        T.StructField("source_lsn", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
    ]
)
