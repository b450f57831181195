"""JDBC source (S3) exercised end-to-end against embedded Apache Derby.

No Postgres runs in this container (reference: verify_replication.py:58-59
polls live catalogs over psycopg2), but Spark ships Derby on its classpath
for the Hive metastore — an embedded JDBC database that needs no server.
These tests drive the REAL partitioned-read / query-pushdown code paths in
sources/jdbc.py through Spark's JDBC relation against it; only the driver
class differs from production (the Postgres driver string stays the
default).
"""

from __future__ import annotations

import pytest

from postgres_cdc_reconciliation_spark.sources import jdbc as J

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    """Create an embedded Derby DB seeded with a batch_control-like table."""
    db = tmp_path_factory.mktemp("derby") / "pcrdb"
    url = f"jdbc:derby:{db};create=true"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE batch_control ("
        " batch_id INT NOT NULL,"
        " table_name VARCHAR(64),"
        " status VARCHAR(16),"
        " row_count INT)"
    )
    ps = conn.prepareStatement(
        "INSERT INTO batch_control VALUES (?, ?, ?, ?)"
    )
    for i in range(200):
        ps.setInt(1, i)
        ps.setString(2, "orders" if i % 2 == 0 else "lineitem")
        ps.setString(3, "COMPLETED" if i % 10 != 7 else "IN_PROGRESS")
        ps.setInt(4, 100 + i)
        ps.addBatch()
    ps.executeBatch()
    st.close()
    conn.close()
    return url


def test_read_table_unpartitioned(spark, derby_url):
    df = J.read_table(spark, derby_url, "batch_control", "", "", driver=DERBY_DRIVER)
    assert df.count() == 200
    assert {c.upper() for c in df.columns} == {
        "BATCH_ID",
        "TABLE_NAME",
        "STATUS",
        "ROW_COUNT",
    }


def test_read_table_partitioned_bounds(spark, derby_url):
    """partitionColumn/numPartitions/bounds must fan the scan out into N
    JDBC partitions that together return every row exactly once (including
    rows outside [lower, upper] — bounds stripe, they don't filter)."""
    df = J.read_table(
        spark,
        derby_url,
        "batch_control",
        "",
        "",
        partition_column="batch_id",
        num_partitions=4,
        lower_bound=50,  # deliberately interior bounds:
        upper_bound=150,  # rows 0-49 and 150-199 land in the edge stripes
        driver=DERBY_DRIVER,
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 200
    assert sorted(r[0] for r in df.select("BATCH_ID").collect()) == list(range(200))


def test_read_table_partitioned_requires_bounds(spark, derby_url):
    with pytest.raises(ValueError, match="bounds"):
        J.read_table(
            spark,
            derby_url,
            "batch_control",
            "",
            "",
            partition_column="batch_id",
            driver=DERBY_DRIVER,
        )


def test_read_query_pushdown(spark, derby_url):
    """`query` option pushes the whole statement to the database — the
    catalog-probe shape (REPLICATION_SLOTS_SQL etc. in production)."""
    df = J.read_query(
        spark,
        derby_url,
        "SELECT status, COUNT(*) AS n FROM batch_control GROUP BY status",
        "",
        "",
        driver=DERBY_DRIVER,
    )
    got = {r[0]: r[1] for r in df.collect()}
    assert got == {"COMPLETED": 180, "IN_PROGRESS": 20}


def test_filter_pushdown_reaches_jdbc_source(spark, derby_url):
    """A DataFrame filter over a JDBC relation must appear as a PushedFilters
    entry (run database-side), not a post-scan Spark filter of all rows."""
    df = J.read_table(
        spark, derby_url, "batch_control", "", "", driver=DERBY_DRIVER
    ).filter("STATUS = 'COMPLETED'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "STATUS" in plan
    assert df.count() == 180
