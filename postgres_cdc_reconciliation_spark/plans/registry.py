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


def all_queries() -> dict[str, QuerySpec]:
    # import for side effects: modules self-register
    from . import relational  # noqa: F401
    from . import cdc_recon  # noqa: F401
    from . import text_pipeline  # noqa: F401
    from . import coverage  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import analytics  # noqa: F401

    return dict(_REGISTRY)
