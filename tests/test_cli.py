"""CLI parity with the reference's operational tools (in-process main())."""

from __future__ import annotations

import json

from postgres_cdc_reconciliation_spark import fixtures as fx
from postgres_cdc_reconciliation_spark.cli import main


def test_generate_verify_status_flow(spark, sf_dir, tmp_path, capsys, monkeypatch):
    # reuse the session the test harness owns
    monkeypatch.setattr(
        "postgres_cdc_reconciliation_spark.cli._spark", lambda: spark
    )
    table = str(tmp_path / "orders")
    ctl = str(tmp_path / "ctl")

    rc = main([
        "generate", "--table-path", table, "--control-path", ctl,
        "--batch-size", "50", "--batch-id", "1",
    ])
    out = json.loads(capsys.readouterr().out.strip())
    assert rc == 0 and out["status"] == "COMPLETED" and out["row_count"] == 50

    # verify table against itself → consistent, exit 0
    rc = main(["verify", "--source", table, "--target", table, "--keys", "order_id"])
    v = json.loads(capsys.readouterr().out.strip())
    assert rc == 0 and v["consistent"]

    # verify against a damaged copy → exit 1 with a bounded sample
    damaged = str(tmp_path / "damaged")
    spark.read.parquet(table).filter("order_id % 2 = 0").write.parquet(damaged)
    rc = main(["verify", "--source", table, "--target", damaged, "--keys", "order_id"])
    v = json.loads(capsys.readouterr().out.strip())
    assert rc == 1 and not v["consistent"] and len(v["sample"]) == 5

    # status over fixture-shaped catalog tables (STUCK rows → exit 1)
    slots_p, pubs_p, bc_p = (
        str(tmp_path / "slots"), str(tmp_path / "pubs"), str(tmp_path / "bc"),
    )
    fx.slots_df(spark).write.parquet(slots_p)
    fx.pubs_df(spark).write.parquet(pubs_p)
    fx.batch_control_df(spark, sf_dir).write.parquet(bc_p)
    rc = main([
        "status", "--control-path", bc_p, "--slots", slots_p, "--pubs", pubs_p,
        "--tables", "public.orders", "public.customer", "--as-of", fx.AS_OF,
    ])
    rows = json.loads(capsys.readouterr().out.strip())
    assert {r["table_name"] for r in rows} == {"orders", "customer"}
    assert rc == 1  # fixture has a STUCK table at AS_OF


def test_verify_fingerprint_mode(spark, tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(
        "postgres_cdc_reconciliation_spark.cli._spark", lambda: spark
    )
    table = str(tmp_path / "orders")
    main([
        "generate", "--table-path", table, "--control-path",
        str(tmp_path / "ctl"), "--batch-size", "60", "--batch-id", "1",
    ])
    capsys.readouterr()

    # self-compare: consistent, zero divergent buckets, exit 0
    rc = main([
        "verify", "--source", table, "--target", table,
        "--keys", "order_id", "--mode", "fingerprint", "--buckets", "16",
    ])
    v = json.loads(capsys.readouterr().out.strip())
    assert rc == 0 and v["consistent"] and v["divergent_buckets"] == 0

    # damaged copy: divergent buckets reported + drill-down sample
    damaged = str(tmp_path / "damaged")
    spark.read.parquet(table).filter("order_id % 3 != 0").write.parquet(damaged)
    rc = main([
        "verify", "--source", table, "--target", damaged,
        "--keys", "order_id", "--mode", "fingerprint", "--buckets", "16",
        "--max-report", "3",
    ])
    v = json.loads(capsys.readouterr().out.strip())
    assert rc == 1 and not v["consistent"]
    assert v["divergent_buckets"] > 0
    assert 0 < len(v["sample"]) <= 3
    assert all(s["diff_type"] == "missing_in_target" for s in v["sample"])
