"""Reconciliation operators — source vs target verification (J7/J8, A1/A4).

The reference's verify_replication.py:
- check_table_counts (:54-70): COUNT(*) both sides, equality verdict;
- verify_data_consistency (:99-146): ordered SELECT both sides, positional
  zip compare in client memory, report first 5 mismatches.

The positional zip is O(table) in one Python process and silently misaligns
every row after a gap (SURVEY.md §7 delta 2). The engine's primary diff is
a KEYED full-outer join — distributed, gap-proof, and it classifies each
divergence. A positional mode (row_number over the sort order on both
sides, joined on position) is provided for bug-compatible comparisons.

Scale: the diff shuffles both sides once on the join key (or position);
hash-compare mode reduces wide rows to one hash column before the shuffle,
so network volume is O(rows·16B) instead of O(rows·row_width).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compare_counts(
    pairs: dict[str, tuple[DataFrame, DataFrame]]
) -> DataFrame:
    """Per-table source/target row counts + match verdict in ONE plan.

    The reference needs dblink or two connections + client compare
    (docs/replication_troubleshooting.md:127-139); two DataFrames in one
    session make it a union of tiny aggregates."""
    outs = []
    for table, (src, tgt) in pairs.items():
        s = src.agg(F.count("*").alias("src_count")).withColumn(
            "table_name", F.lit(table)
        )
        t = tgt.agg(F.count("*").alias("tgt_count")).withColumn(
            "table_name", F.lit(table)
        )
        outs.append(s.join(t, "table_name"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.select(
        "table_name",
        "src_count",
        "tgt_count",
        (F.col("src_count") == F.col("tgt_count")).alias("counts_match"),
    )


def diff_rows(
    src: DataFrame,
    tgt: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    max_report: int | None = None,
) -> DataFrame:
    """Keyed full-outer diff with per-key cardinality + value classification.

    diff_type ∈ {missing_in_target, extra_in_target, cardinality_mismatch,
    value_mismatch}. compare_cols defaults to all non-key columns.
    max_report caps the output like verify_replication.py:136-138 (first-5
    report) — applied AFTER classification so the count is still exact."""
    if compare_cols is None:
        compare_cols = [c for c in src.columns if c not in key_cols]
    s = src.groupBy(*key_cols).agg(
        F.count("*").alias("src_cnt"),
        *[F.max(c).alias(f"src_{c}") for c in compare_cols],
    )
    t = tgt.groupBy(*key_cols).agg(
        F.count("*").alias("tgt_cnt"),
        *[F.max(c).alias(f"tgt_{c}") for c in compare_cols],
    )
    j = s.join(t, key_cols, "full_outer")
    value_mismatch = None
    for c in compare_cols:
        neq = ~F.col(f"src_{c}").eqNullSafe(F.col(f"tgt_{c}"))
        value_mismatch = neq if value_mismatch is None else (value_mismatch | neq)
    diff_type = (
        F.when(F.col("src_cnt").isNull(), "extra_in_target")
        .when(F.col("tgt_cnt").isNull(), "missing_in_target")
        .when(F.col("src_cnt") != F.col("tgt_cnt"), "cardinality_mismatch")
        .when(value_mismatch, "value_mismatch")
    )
    out = j.withColumn("diff_type", diff_type).filter(
        F.col("diff_type").isNotNull()
    )
    if max_report is not None:
        out = out.orderBy(*key_cols).limit(max_report)
    return out


def diff_rows_positional(
    src: DataFrame, tgt: DataFrame, order_cols: list[str]
) -> DataFrame:
    """Bug-compatible positional diff (verify_replication.py:125-133):
    row_number over the sort order on both sides, joined on position.

    Kept for parity with the reference's semantics; note a single missing
    row shifts every subsequent position — exactly the reference's
    misalignment behavior, now at least distributed."""
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    cols = list(src.columns)

    def pos_prefixed(df: DataFrame, prefix: str) -> DataFrame:
        return df.withColumn("_pos", F.row_number().over(w)).select(
            "_pos", *[F.col(c).alias(f"{prefix}{c}") for c in cols]
        )

    s = pos_prefixed(src, "src_")
    t = pos_prefixed(tgt, "tgt_")
    cond = None
    for c in cols:
        neq = ~F.col(f"src_{c}").eqNullSafe(F.col(f"tgt_{c}"))
        cond = neq if cond is None else (cond | neq)
    return s.join(t, "_pos", "full_outer").filter(cond)


def diff_by_hash(
    src: DataFrame, tgt: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Wide-table diff: compare one xxhash64 over all non-key columns.

    Shrinks shuffle payload to (key, hash) — the 100 TB mode. Rows whose
    hash differs (or exist on one side only) are reported; re-join the
    originals on key for the value-level detail of just those rows."""
    def h(df: DataFrame) -> DataFrame:
        rest = [c for c in df.columns if c not in key_cols]
        return df.select(
            *key_cols,
            F.xxhash64(*[F.col(c).cast("string") for c in rest]).alias("row_hash"),
        )

    s = h(src).withColumnRenamed("row_hash", "src_hash")
    t = h(tgt).withColumnRenamed("row_hash", "tgt_hash")
    return (
        s.join(t, key_cols, "full_outer")
        .filter(
            ~F.col("src_hash").eqNullSafe(F.col("tgt_hash"))
        )
        .select(
            *key_cols,
            "src_hash",
            "tgt_hash",
            F.when(F.col("src_hash").isNull(), "extra_in_target")
            .when(F.col("tgt_hash").isNull(), "missing_in_target")
            .otherwise("value_mismatch")
            .alias("diff_type"),
        )
    )


def verify_batch(
    spark,
    src: DataFrame,
    tgt: DataFrame,
    key_cols: list[str],
    max_report: int = 5,
) -> dict:
    """One-call verification verdict (verify_replication.py main flow):
    counts + keyed diff, first-N mismatch sample, boolean verdict."""
    src_count = src.count()
    tgt_count = tgt.count()
    diff = diff_rows(src, tgt, key_cols)
    n_diff = diff.count()
    sample = diff.orderBy(*key_cols).limit(max_report).collect()
    return {
        "source_count": src_count,
        "target_count": tgt_count,
        "counts_match": src_count == tgt_count,
        "n_differences": n_diff,
        "consistent": n_diff == 0 and src_count == tgt_count,
        "sample": [r.asDict() for r in sample],
    }
