"""JDBC batch source (S3) — reading live Postgres tables and catalogs.

The reference polls `orders`, `batch_control`, and the system catalogs
over psycopg2 (verify_replication.py:37-45,58-59,104-123). The engine's
equivalents are plain JDBC reads; the status operators take the resulting
DataFrames as inputs (SURVEY.md §1.1: the functions are parameterized views
over catalog relations).

Scale: partitioned reads (partitionColumn/numPartitions) parallelize the
scan across executors; catalog tables are tiny single-partition reads.
No Postgres is available in the test container; the read paths (partitioned
bounds, query pushdown, option plumbing) are exercised end-to-end against
embedded Apache Derby — the JDBC database already on Spark's classpath —
in tests/test_jdbc.py, with the Postgres driver/catalog SQL kept as the
production default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PG_DRIVER = "org.postgresql.Driver"

# the catalog queries the status functions need (SURVEY.md §2.1 S4)
REPLICATION_SLOTS_SQL = (
    "SELECT slot_name, slot_type, active, restart_lsn::text AS restart_lsn,"
    " confirmed_flush_lsn::text AS confirmed_flush_lsn FROM pg_replication_slots"
)
PUBLICATION_TABLES_SQL = (
    "SELECT pubname, schemaname, tablename FROM pg_publication_tables"
)
CURRENT_LSN_SQL = "SELECT pg_current_wal_lsn()::text AS lsn"


def read_table(
    spark: SparkSession,
    url: str,
    table: str,
    user: str,
    password: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    driver: str = PG_DRIVER,
) -> DataFrame:
    """Batch JDBC scan; partitioned when a numeric split column is given."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned read needs lower/upper bounds")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader.load()


def read_query(
    spark: SparkSession,
    url: str,
    query: str,
    user: str,
    password: str,
    driver: str = PG_DRIVER,
) -> DataFrame:
    """Single-partition pushdown query (catalog scans, scalar probes)."""
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", query)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .load()
    )


def read_replication_slots(spark, url, user, password) -> DataFrame:
    return read_query(spark, url, REPLICATION_SLOTS_SQL, user, password)


def read_publication_tables(spark, url, user, password) -> DataFrame:
    return read_query(spark, url, PUBLICATION_TABLES_SQL, user, password)
