"""CLI — the reference's operational tools as engine subcommands.

Mirrors the two entry points a reference operator uses daily:
- ``generate``: data_generator.py (seeded batch synthesis + bracketed ingest,
  reference: data_generator.py:130-158 CLI args --batch-size/--batch-id),
- ``verify``: verify_replication.py (counts + row diff + poll loop,
  reference: verify_replication.py:169-186, exit code 0/1),
- ``status``: the health report over parquet-backed control/catalog tables.

Tables are parquet paths (the engine's storage); JDBC sources plug in the
same DataFrames via sources.jdbc.

Usage:
  python -m postgres_cdc_reconciliation_spark.cli generate \
      --table-path /lake/orders --control-path /lake/batch_control \
      --batch-size 100 --batch-id 7
  python -m postgres_cdc_reconciliation_spark.cli verify \
      --source /lake/orders --target /lake/orders_replica --keys order_id
  python -m postgres_cdc_reconciliation_spark.cli status \
      --control-path /lake/batch_control --slots /lake/slots \
      --pubs /lake/pubs --tables public.orders public.lineitem
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark():
    from .session import get_spark

    return get_spark(app_name="pcr-cli")


def cmd_generate(args) -> int:
    from .engine import Engine
    from .ingest import generate_orders

    spark = _spark()
    eng = Engine(spark)
    batch = generate_orders(spark, args.batch_size, args.batch_id, seed=args.seed)
    result = eng.ingest(
        batch.drop("batch_id"),
        args.table_path,
        args.control_path,
        args.schema_name,
        args.table_name,
        args.batch_id,
    )
    print(json.dumps(result))
    return 0 if result["status"] == "COMPLETED" else 1


def cmd_verify(args) -> int:
    from .engine import Engine

    spark = _spark()
    eng = Engine(spark)
    from .operators.apply import read_target

    # read_target hides a bucketed layout's internal _bucket column, so a
    # verify against an apply/scd2 target compares payload, not layout
    src = read_target(spark, args.source)
    tgt = read_target(spark, args.target)
    if args.mode == "fingerprint":
        # 100 TB mode: bucket checksums first, keyed drill-down only on the
        # divergent buckets (operators/recon.py::fingerprint_diff)
        summary = eng.fingerprint_diff(
            src, tgt, args.keys, n_buckets=args.buckets
        ).cache()
        bad = summary.filter("NOT bucket_match").count()
        sample = []
        if bad:
            from .operators.recon import fingerprint_drilldown

            drill = fingerprint_drilldown(
                src, tgt, args.keys, summary, n_buckets=args.buckets
            )
            sample = [
                r.asDict()
                for r in drill.orderBy(*args.keys).limit(args.max_report).collect()
            ]
        result = {
            "mode": "fingerprint",
            "n_buckets": args.buckets,
            "divergent_buckets": bad,
            "consistent": bad == 0,
            "sample": sample,
        }
    else:
        result = eng.verify(src, tgt, args.keys, max_report=args.max_report)
        result["sample"] = result["sample"][: args.max_report]
    print(json.dumps(result, default=str))
    # exit semantics of verify_replication.py:182-186
    return 0 if result["consistent"] else 1


def cmd_status(args) -> int:
    from .engine import Engine

    spark = _spark()
    eng = Engine(spark)
    bc = spark.read.parquet(args.control_path)
    slots = spark.read.parquet(args.slots)
    pubs = spark.read.parquet(args.pubs)
    report = eng.health_report(bc, slots, pubs, args.tables, as_of=args.as_of)
    rows = [r.asDict() for r in report.collect()]
    print(json.dumps(rows, default=str))
    unhealthy = [r for r in rows if r["health_status"] in ("SLOW", "STUCK")]
    return 1 if unhealthy else 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="postgres-cdc-reconciliation-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="synthesize + ingest one bracketed batch")
    g.add_argument("--table-path", required=True)
    g.add_argument("--control-path", required=True)
    g.add_argument("--schema-name", default="public")
    g.add_argument("--table-name", default="orders")
    g.add_argument("--batch-size", type=int, default=100)  # config.json:10
    g.add_argument("--batch-id", type=int, required=True)
    g.add_argument("--seed", type=int, default=42)
    g.set_defaults(fn=cmd_generate)

    v = sub.add_parser("verify", help="source↔target counts + keyed row diff")
    v.add_argument("--source", required=True)
    v.add_argument("--target", required=True)
    v.add_argument("--keys", nargs="+", required=True)
    v.add_argument("--max-report", type=int, default=5)  # verify_replication.py:136
    v.add_argument("--mode", choices=["rows", "fingerprint"], default="rows",
                   help="rows: keyed full diff; fingerprint: bucket "
                        "checksums first, drill-down on divergent buckets")
    v.add_argument("--buckets", type=int, default=1024)
    v.set_defaults(fn=cmd_verify)

    s = sub.add_parser("status", help="multi-table replication health report")
    s.add_argument("--control-path", required=True)
    s.add_argument("--slots", required=True)
    s.add_argument("--pubs", required=True)
    s.add_argument("--tables", nargs="+", required=True)
    s.add_argument("--as-of", default=None)
    s.set_defaults(fn=cmd_status)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
