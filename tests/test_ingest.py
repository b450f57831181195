"""Batch-bracketing ingest (T10/T11, SURVEY.md §3.1)."""

from __future__ import annotations

from postgres_cdc_reconciliation_spark.ingest import (
    generate_orders,
    ingest_batch,
    read_committed,
)


def test_ingest_bracket_and_frontier(spark, tmp_path):
    table = str(tmp_path / "orders")
    ctl = str(tmp_path / "batch_control")

    b0 = generate_orders(spark, 50, batch_id=0)
    r0 = ingest_batch(spark, b0, table, ctl, "public", "orders", 0)
    assert r0["status"] == "COMPLETED" and r0["row_count"] == 50
    assert r0["completion_lsn"] == "0/32"  # 50 rows → frontier 50

    # CSV feed-file path (S1/S2): write a feed, ingest it
    feed = str(tmp_path / "feed.csv")
    b1 = generate_orders(spark, 30, batch_id=1)
    b1.drop("batch_id").toPandas().to_csv(feed, index=False)
    r1 = ingest_batch(
        spark, feed, table, ctl, "public", "orders", 1,
        csv_schema="order_id int, customer_id int, amount decimal(10,2), timestamp timestamp_ntz",
    )
    assert r1["status"] == "COMPLETED" and r1["row_count"] == 30
    assert r1["completion_lsn"] == "0/50"  # 50+30=80 → hex 50

    committed = read_committed(spark, table, ctl, "public", "orders")
    assert committed.count() == 80

    # failure path: bad CSV schema → FAILED marker, no new committed rows
    r2 = ingest_batch(
        spark, str(tmp_path / "missing.csv"), table, ctl, "public", "orders", 2,
        csv_schema="order_id int",
    )
    assert r2["status"] == "FAILED" and "error" in r2
    assert read_committed(spark, table, ctl, "public", "orders").count() == 80
    statuses = {
        (r["batch_id"], r["status"])
        for r in spark.read.parquet(ctl).collect()
    }
    assert (2, "FAILED") in statuses


def test_generator_is_seeded(spark):
    a = generate_orders(spark, 20, 0).collect()
    b = generate_orders(spark, 20, 0).collect()
    assert a == b
    amounts = [float(r["amount"]) for r in a]
    assert all(10.0 <= x <= 1000.0 for x in amounts)


def test_csv_corrupt_rows_permissive(spark, tmp_path):
    """Malformed feed-file rows: PERMISSIVE parse quarantines them in
    _corrupt_record instead of failing the load (bulk-load robustness the
    reference's COPY would reject wholesale)."""
    feed = tmp_path / "bad.csv"
    feed.write_text(
        "order_id,customer_id,amount\n"
        "1,10,99.50\n"
        "not_a_number,20,x\n"
        "3,30,12.25\n"
    )
    df = spark.read.csv(
        str(feed),
        header=True,
        schema="order_id int, customer_id int, amount decimal(10,2), _corrupt_record string",
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    ).cache()
    try:
        from pyspark.sql import functions as F

        good = df.filter(F.col("_corrupt_record").isNull())
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert good.count() == 2 and bad.count() == 1
        assert "not_a_number" in bad.collect()[0]["_corrupt_record"]
    finally:
        df.unpersist()


def test_ingest_retry_replaces_orphaned_data(spark, tmp_path):
    """If the data write lands but the COMPLETED marker write fails, retrying
    the same batch_id must not duplicate rows once the marker finally lands
    (the reference's single-transaction rollback analog)."""
    table = str(tmp_path / "orders_r")
    ctl = str(tmp_path / "ctl_r")

    b0 = generate_orders(spark, 40, batch_id=0)
    # simulate the half-committed state: data written, no control marker
    from pyspark.sql import functions as F

    (
        b0.withColumn("_ingest_batch", F.lit(0))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_ingest_batch")
        .parquet(table)
    )
    # orphaned data is invisible (no marker)
    # note: control path absent → read_committed returns empty
    assert read_committed(spark, table, ctl, "public", "orders").count() == 0

    # retry the full ingest of the same batch
    r = ingest_batch(spark, b0, table, ctl, "public", "orders", 0)
    assert r["status"] == "COMPLETED" and r["row_count"] == 40
    committed = read_committed(spark, table, ctl, "public", "orders")
    assert committed.count() == 40  # replaced, not appended
    # batch_id column keeps its declared LONG type (no partition-inference drift)
    assert dict(committed.dtypes)["batch_id"] == "bigint"
