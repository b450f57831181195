"""Registry of driver-facing queries with their DuckDB oracle SQL.

Each operator from SURVEY.md §2 ships as a QuerySpec: a Spark implementation
``fn(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) the equivalent
ANSI SQL the DuckDB oracle runs on the same parquet tables. The driver's
correctness gate compares the two (row count + schema + order-insensitive
value hash), so column names AND value representations must match exactly:

- every computed column is aliased identically on both sides;
- money math is done in DECIMAL (exact) and surfaced as DOUBLE via a final
  cast, so float nondeterminism (summation order) can't leak into the hash;
- timestamps are TIMESTAMP_NTZ end-to-end (testdata parquet is NTZ);
- all "now"-relative logic uses fixtures.AS_OF.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL; None → rows-only check (non-SQL op)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str], doc: str = ""):
    def deco(fn):
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# The driver's correctness gate walks queries() in dict order and (observed
# round 1) covers a bounded window from the front — only the first 50 of 81
# registered queries got a CORRECTNESS row. Order therefore encodes priority:
# queries with no hard signal yet, then queries whose implementation changed
# this round (need re-verification), then the already-green remainder.
_CHECK_PRIORITY: list[str] = [
    # -- round 4, window goal: rotate the 78 rows whose latest CORRECTNESS
    # evidence is r1/r2 through the driver's 50-query window (VERDICT r3 #1).
    # Changed-this-round queries first (riskiest), then the 30 queries whose
    # only row is r1, then 15 r2-stale picks (event-time/timestamp-sensitive
    # and perf-flagged shapes fronted). ~28 r2-stale rows remain for round 5.
    #
    # -- changed this round: re-verify (5) --
    "q_priority_pick",  # min_by struct agg replaced the window sort
    "q_sample",  # TABLESAMPLE → deterministic md5 hash sample (now oracled)
    "q_pagerank",  # fixed-iteration + 8dp pre-round (now oracled, CTE unroll)
    "q_grouped_demean",  # applyInPandas → native unbounded-frame window
    "q_snapshot_cdf",  # commit root now cached per (session, sf_dir)
    # -- stale: newest row is round 1 (30) --
    "q_ann_cosine",
    "q_ann_ivf",
    "q_slot_lag_report",
    "q_minutes_since",
    "q_count",
    "q_minmax",
    "q_ext_cube",
    "q_filter_eq",
    "q_filter_timewindow",
    "q_distinct",
    "q_semi_range",
    "q_semi_exists",
    "q_cross_join",
    "q_sort",
    "q_scalar_pack",
    "q_lag_trend",
    "q_ext_tumble",
    "q_anti_join",
    "q_regex_pack",
    "q_null_funcs",
    "q_having",
    "q_csv_roundtrip",
    "q_orc_roundtrip",
    "q_json_roundtrip",
    "q_token_count",
    "q_lang_id",
    "q_quality_score",
    "q_fingerprint",
    "q_text_normalize",
    "q_tokenize",
    # -- stale: newest row is round 2 — event-time/timestamp-sensitive
    # (TIMESTAMP-vintage fixture path), perf-flagged, and r1+r2-only
    # multimodal/curation shapes (15) --
    "q_forecast_revenue",
    "q_session_window",
    "q_asof_join",
    "q_range_join",
    "q_percentiles",  # perf-weak r3: row refresh alongside solo re-measure
    "q_stats_pack",  # perf-weak r3
    "q_rank_pack",  # perf-watch r3
    "q_date_funcs",
    "q_pivot",
    "q_dedup_embed",
    "q_hash_split",
    "q_contamination",
    "q_pack_chunks",
    "q_multimodal_features",
    "q_frame_sample",
    # -- position 50 cuts here. Everything beyond the manual window is
    # ordered AUTOMATICALLY by staleness (see _last_checked): never-checked
    # first, then ascending newest-CORRECTNESS-round. Next round: prune this
    # list down to just the changed-this-round queries — the automatic tier
    # fronts the remaining r2-stale rows (~32) by itself. --
]


def _last_checked() -> dict[str, int]:
    """Per-query newest round with a recorded CORRECTNESS row, read from the
    committed CORRECTNESS_r*.json files. Lets future rounds rotate the
    check window automatically: the stalest evidence re-verifies first
    without hand-curating the priority list each round. Missing/unreadable
    files degrade to {} (manual order only)."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except Exception:
            continue
        for name in rows:
            seen[name] = max(seen.get(name, 0), rnd)
    return seen


def all_queries() -> dict[str, QuerySpec]:
    # import for side effects: modules self-register
    from . import relational  # noqa: F401
    from . import cdc_recon  # noqa: F401
    from . import text_pipeline  # noqa: F401
    from . import coverage  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import analytics  # noqa: F401
    from . import curation  # noqa: F401
    from . import lakehouse  # noqa: F401

    # manual priority first (changed-this-round queries that need
    # re-verification regardless of row age), then automatic staleness
    # rotation: never-checked queries, then ascending last-checked round,
    # stable by registration order within a tier
    ordered: dict[str, QuerySpec] = {}
    for name in _CHECK_PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    seen = _last_checked()
    rest = [n for n in _REGISTRY if n not in ordered]
    for name in sorted(rest, key=lambda n: seen.get(n, -1)):
        ordered[name] = _REGISTRY[name]
    return ordered
