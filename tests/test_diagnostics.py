"""The troubleshooting runbook functions (docs/replication_troubleshooting.md)."""

from __future__ import annotations

from postgres_cdc_reconciliation_spark import fixtures as fx
from postgres_cdc_reconciliation_spark.operators.diagnostics import (
    all_tables_status,
    compare_all_table_counts,
    lag_trend_history,
    publication_mappings,
    slot_lag_report,
)


def test_slot_lag_ordering_and_pretty(spark):
    out = slot_lag_report(fx.slots_df(spark), "2/100000").collect()
    lags = [r["lag_bytes"] for r in out]
    known = [x for x in lags if x is not None]
    assert known == sorted(known, reverse=True)  # worst first
    # never-confirmed slot (NULL flush): unknown lag sorts last
    assert lags[len(known):] == [None] * (len(lags) - len(known))
    assert all(
        r["lag"].endswith((" bytes", " KB", " MB", " GB"))
        for r in out
        if r["lag_bytes"] is not None
    )


def test_publication_mappings(spark):
    out = {r["pubname"]: r for r in publication_mappings(fx.pubs_df(spark)).collect()}
    assert out["orders_pub"]["published_tables"] == "batch_control,orders"
    assert out["orders_pub"]["n_tables"] == 2


def test_all_tables_status(spark, sf_dir):
    bc = fx.batch_control_df(spark, sf_dir)
    out = all_tables_status(bc, fx.slots_df(spark), fx.AS_OF)
    rows = out.collect()
    n_live_slots = 6  # logical+active fixtures (incl. NULL-flush customer_slot)
    tables = {r["table_name"] for r in rows}
    assert tables == {"orders", "lineitem", "customer"}
    assert len(rows) == 3 * n_live_slots  # latest per table × live slots
    lags = [r["lag_bytes"] for r in rows]
    assert lags == sorted(lags, reverse=True)


def test_compare_all_table_counts_mismatch_filter(spark, sf_dir):
    src, tgt = fx.recon_pair(spark, sf_dir)
    out = compare_all_table_counts(
        {"orders": (src, tgt), "self": (src, src)}
    ).collect()
    assert [r["table_name"] for r in out] == ["orders"]  # only the mismatch


def test_lag_trend_history(spark, sf_dir):
    bc = fx.batch_control_df(spark, sf_dir)
    out = lag_trend_history(bc, fx.slots_df(spark), "orders_pub_slot", fx.AS_OF)
    rows = out.collect()
    assert len(rows) > 0
    # completion within the last hour of AS_OF only
    assert all(r["completion_timestamp"] is not None for r in rows)
    # lag sign can be either way (ahead/behind); values must be finite ints
    assert all(isinstance(r["historical_lag_bytes"], int) for r in rows)


def test_publication_owners_regrole(spark):
    from postgres_cdc_reconciliation_spark.operators.diagnostics import (
        publication_owners,
    )

    out = {
        r["pubname"]: r["owner"]
        for r in publication_owners(
            fx.pub_owners_df(spark), fx.roles_df(spark)
        ).collect()
    }
    assert out == {
        "orders_pub": "repl_user",
        "lineitem_pub": "postgres",
        "analytics_pub": "analytics_owner",
        "orphan_pub": "99999",  # no pg_roles row → numeric OID text
    }
