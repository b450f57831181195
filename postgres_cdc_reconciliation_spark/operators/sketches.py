"""[EXT] Mergeable-sketch aggregates: HLL distinct counts, theta set
algebra, KLL quantiles (Apache DataSketches, built into Spark 4 SQL).

Why sketches are the 100 TB answer: a sketch is a small (KB) summary with
an associative, commutative merge. That buys three things exact aggregates
can't give at scale:

- **map-side partials stay tiny**: a distinct-count over billions of keys
  shuffles fixed-size sketch bytes per group, never the key sets
  (`approx_count_distinct` is the same idea; these functions also EXPOSE
  the sketch, which enables the next two);
- **incremental maintenance**: persist one sketch per partition/day; any
  range's distinct count is a union of stored sketches — no re-scan of the
  raw data (the rollup_stream pattern, but for distincts, which plain
  running sums cannot maintain under re-aggregation);
- **cross-segment algebra** (theta): union/intersection/difference of
  *sets* from their sketches alone — "users in segment A and B" across
  shards without ever co-shuffling the raw membership lists.

Everything here is JVM expressions (zero Python on the data path); results
are estimates with published error bounds (HLL lgConfigK=12 → ~1.6% RSE;
KLL k=200 → ~1.65% rank error), asserted in tests/test_sketches.py against
exact answers. DataSketches KLL compaction flips random coins, so asserts
use tolerance bands, not exact equality.

Reference parity: the reference has no approximate surface (its COUNT(*)
comparisons are exact, verify_replication.py:54-70); this extends SURVEY
§2.4 A6's approx row into the full mergeable-sketch family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_group_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lg_config_k: int = 12,
) -> DataFrame:
    """Per-group approximate distinct count, keeping the sketch bytes.

    Returns (group, approx_distinct, sketch). Persisting ``sketch`` is the
    point: later rollups union the stored sketches (``hll_rollup``) instead
    of touching the raw data again.
    """
    return df.groupBy(group_col).agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(value_col, F.lit(lg_config_k))
        ).alias("approx_distinct"),
        F.hll_sketch_agg(value_col, F.lit(lg_config_k)).alias("sketch"),
    )


def hll_rollup(sketches: DataFrame, sketch_col: str = "sketch") -> DataFrame:
    """Global distinct estimate from per-group sketches ALONE — the merge
    that makes incremental/partitioned maintenance work. Distinct counts
    don't sum (groups share members); sketch union handles overlap."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias(
            "approx_distinct_total"
        )
    )


def theta_segment_algebra(
    df: DataFrame,
    segment_col: str,
    value_col: str,
    seg_a: str,
    seg_b: str,
) -> DataFrame:
    """Set algebra over two segments' member sets from theta sketches:
    |A|, |B|, |A ∪ B|, |A ∩ B|, |A \\ B| — one scan, no self-join.

    The exact formulation is a groupBy + self-join (or two scans with
    INTERSECT/EXCEPT); at 100 TB that shuffles the full membership lists.
    Theta sketches reduce it to one scan emitting two KB-sized summaries,
    then constant-time algebra on the driver side of the plan.
    """
    sk = df.filter(F.col(segment_col).isin(seg_a, seg_b)).agg(
        F.theta_sketch_agg(
            F.when(F.col(segment_col) == seg_a, F.col(value_col))
        ).alias("sk_a"),
        F.theta_sketch_agg(
            F.when(F.col(segment_col) == seg_b, F.col(value_col))
        ).alias("sk_b"),
    )
    return sk.select(
        F.theta_sketch_estimate("sk_a").alias("n_a"),
        F.theta_sketch_estimate("sk_b").alias("n_b"),
        F.theta_sketch_estimate(F.theta_union("sk_a", "sk_b")).alias("n_union"),
        F.theta_sketch_estimate(F.theta_intersection("sk_a", "sk_b")).alias(
            "n_intersect"
        ),
        F.theta_sketch_estimate(F.theta_difference("sk_a", "sk_b")).alias(
            "n_a_only"
        ),
    )


def kll_group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-group streaming quantiles from a KLL sketch (double variant).

    Exact percentiles need a full sort per group; KLL reads once, merges
    associatively (partial aggregation applies), and answers any quantile
    after the fact. Returns one row per group with ``q_<pct>`` columns.
    """
    sk = df.groupBy(group_col).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double")).alias("sk")
    )
    cols = [F.col(group_col)]
    for p in probs:
        cols.append(
            F.kll_sketch_get_quantile_double("sk", F.lit(float(p))).alias(
                f"q_{int(p * 100)}"
            )
        )
    return sk.select(*cols)
