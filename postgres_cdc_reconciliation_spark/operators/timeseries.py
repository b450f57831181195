"""[EXT] Time-series similarity search over keyed event series.

Motivated by the distributed time-series similarity-search literature
(e.g. "Time Series Similarity Search for Streaming Data in Distributed
Systems", EDBT 2019): given per-key value series (one reading per key per
time bucket), find the keys whose series moves most like a query key's
series.

Spark-first shape — the whole search is ONE broadcast join + ONE keyed
aggregation + a TakeOrdered top-k:

  1. the query key's series (a few hundred rows) broadcasts;
  2. every other key's series inner-joins it on the time bucket — series
     align on the query's observed buckets, keys missing a bucket simply
     contribute fewer paired points (n per key is part of the output);
  3. Pearson r per key from the five sufficient statistics
     (n, Σx, Σy, Σxy, Σx², Σy²) in one map-side-combined aggregation —
     shuffle O(keys), never O(points);
  4. top-k by (r, key) via sort+limit (planned as TakeOrdered — no global
     sort materialization).

Determinism discipline (the repo's oracle rules): values are cast to
DECIMAL before summation so the sufficient statistics are EXACT in any
engine regardless of summation order; r is computed from those exact
sums in double (same IEEE inputs → same IEEE result cross-engine) and
rounded BEFORE the top-k cut so fp noise can't flip the ordering.

Pearson r is z-normalized-euclidean similarity in disguise
(d_z² = 2n(1−r)), so this is also the classic normalized-subsequence
ranking; correlation is preferred here because it is scale/offset
invariant — two users with the same activity *shape* at different
volumes rank together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def series_similarity_topk(
    series: DataFrame,
    query_key,
    key_col: str = "user_id",
    time_col: str = "bucket",
    value_col: str = "value",
    k: int = 10,
    min_overlap: int = 3,
    round_dp: int = 6,
) -> DataFrame:
    """Top-k keys by Pearson correlation of their series with
    ``query_key``'s series, aligned on the query's time buckets.

    ``series`` must hold ONE row per (key, time bucket) — pre-aggregate
    first (e.g. daily sums). Keys with fewer than ``min_overlap`` paired
    buckets are dropped (a 1-point series correlates with anything), as
    are constant series on either side (r undefined: zero variance).

    Returns (key, n_buckets, corr_r) ordered by (corr_r desc, key),
    ``corr_r`` rounded at ``round_dp`` before the cut.
    """
    dec = "decimal(28,6)"
    q = (
        series.filter(F.col(key_col) == F.lit(query_key))
        .select(
            F.col(time_col).alias("_t"),
            F.col(value_col).cast(dec).alias("_y"),
        )
    )
    rest = series.filter(F.col(key_col) != F.lit(query_key)).select(
        F.col(key_col).alias("_k"),
        F.col(time_col).alias("_t"),
        F.col(value_col).cast(dec).alias("_x"),
    )
    paired = rest.join(F.broadcast(q), "_t")
    stats = paired.groupBy("_k").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    r = (n * sxy - sx * sy) / F.sqrt(var_x * var_y)
    return (
        stats.filter(
            (F.col("n") >= min_overlap) & (var_x > 0) & (var_y > 0)
        )
        .select(
            F.col("_k").alias(key_col),
            F.col("n").alias("n_buckets"),
            F.round(r, round_dp).alias("corr_r"),
        )
        .orderBy(F.desc("corr_r"), key_col)
        .limit(k)
    )
