#!/usr/bin/env python
"""Generate QUERIES.md — the user-facing map of every registered query:
name -> implementing module -> oracle presence -> one-line description
(VERDICT r7 #7: 150 queries and ~30 public operators need a single page
a new user can scan without reading seven rounds of NOTES).

Generated FROM the registry (the same object the driver consumes), so it
cannot drift from the shipped surface. Re-run after adding queries:

    python scripts/gen_query_map.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postgres_cdc_reconciliation_spark.plans.registry import all_queries  # noqa: E402


def first_sentence(doc: str, limit: int = 160) -> str:
    doc = " ".join((doc or "").split())
    for stop in (". ", "; "):
        i = doc.find(stop)
        if 0 < i < limit:
            return doc[: i + 1]
    return doc[:limit] + ("…" if len(doc) > limit else "")


def main() -> None:
    qs = all_queries()
    by_module: dict[str, list] = {}
    for spec in qs.values():
        mod = spec.fn.__module__.rsplit(".", 1)[-1]
        by_module.setdefault(mod, []).append(spec)

    out = []
    out.append("# Query map\n")
    out.append(
        "Auto-generated from `plans/registry.py` by "
        "`scripts/gen_query_map.py` — do not edit by hand.\n"
    )
    n_oracle = sum(1 for s in qs.values() if s.oracle)
    out.append(
        f"\n**{len(qs)} registered queries**, {n_oracle} with a full DuckDB "
        "oracle (the driver compares row count + schema + value hash at "
        f"sf0.01), {len(qs) - n_oracle} rows-only. Every query is a "
        "callable `fn(spark, sf_dir) -> DataFrame` exported through "
        "`__spark_entry__.queries()`.\n"
    )
    for mod in sorted(by_module):
        specs = sorted(by_module[mod], key=lambda s: s.name)
        out.append(f"\n## plans/{mod}.py ({len(specs)} queries)\n")
        out.append("| query | oracle | what it does |")
        out.append("|---|---|---|")
        for s in specs:
            oracle = "DuckDB" if s.oracle else "rows-only"
            doc = first_sentence(s.doc).replace("|", "\\|")
            out.append(f"| `{s.name}` | {oracle} | {doc} |")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "QUERIES.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path}: {len(qs)} queries, {len(by_module)} modules")


if __name__ == "__main__":
    main()
