"""Edge-case robustness: empty inputs and no-match paths must produce empty
results, never errors (a monitoring system's 3am failure mode)."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark import fixtures as fx, schemas
from postgres_cdc_reconciliation_spark.operators import status as st
from postgres_cdc_reconciliation_spark.operators.apply import apply_batch, latest_per_key
from postgres_cdc_reconciliation_spark.operators.dedup import (
    lsh_candidates,
    minhash_signatures,
    shingles,
)
from postgres_cdc_reconciliation_spark.operators.graph import connected_components
from postgres_cdc_reconciliation_spark.operators.recon import diff_rows


def _empty(spark, schema):
    return spark.createDataFrame([], schema)


def test_status_with_empty_control(spark):
    bc = _empty(spark, schemas.BATCH_CONTROL)
    out = st.multiple_tables_replication_status(
        spark, bc, fx.slots_df(spark), fx.pubs_df(spark),
        ["public.orders"], as_of=fx.AS_OF,
    )
    assert out.count() == 0


def test_status_with_no_matching_slot(spark, sf_dir):
    bc = fx.batch_control_df(spark, sf_dir)
    # slots exist but none logical+active
    dead_slots = fx.slots_df(spark).withColumn("active", F.lit(False))
    out = st.latest_batch_replication_status(
        spark, bc, dead_slots, fx.pubs_df(spark), "public", "orders", as_of=fx.AS_OF
    )
    assert out.count() == 0


def test_status_unknown_table_spec(spark, sf_dir):
    out = st.multiple_tables_replication_status(
        spark, fx.batch_control_df(spark, sf_dir), fx.slots_df(spark),
        fx.pubs_df(spark), ["public.nonexistent"], as_of=fx.AS_OF,
    )
    assert out.count() == 0


def test_apply_empty_batch(spark):
    events = _empty(
        spark,
        "order_id long, amount decimal(10,2), op string, source_lsn string",
    )
    target = spark.createDataFrame(
        [(1, None)], "order_id long, amount decimal(10,2)"
    )
    out = apply_batch(target, events, ["order_id"], drop_cols=("op", "source_lsn"))
    assert out.count() == 1  # untouched target passes through
    assert latest_per_key(events, ["order_id"]).count() == 0


def test_diff_identical_and_empty(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    assert diff_rows(df, df, ["k"]).count() == 0
    empty = df.limit(0)
    d = diff_rows(df, empty, ["k"]).collect()
    assert {r["diff_type"] for r in d} == {"missing_in_target"} and len(d) == 2


def test_dedup_on_empty_and_tiny_docs(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "two words")], "doc_id long, text string"
    )
    sh = shingles(docs, k=3)  # all docs below shingle size
    assert sh.count() == 0
    assert lsh_candidates(minhash_signatures(sh)).count() == 0


def test_components_empty_edges(spark):
    edges = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(edges).count() == 0
