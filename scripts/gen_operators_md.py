#!/usr/bin/env python
"""Regenerate OPERATORS.md from the live query catalog.

Run from the repo root: python scripts/gen_operators_md.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_warehouse_opensky_spark.plans import QUERIES  # noqa: E402

HEADER = """\
# OPERATORS — catalog coverage map

One row per registered query in
`data_warehouse_opensky_spark/plans/` (the `queries()` /
`oracle_sql()` surface of `__spark_entry__.py`). Tier refers to
SURVEY.md §2: T1 = operators coded in the reference, T2 = the SQL
surface the reference delegates to PostgreSQL, T3 = north-star
LLM-data-pipeline extensions. "oracle" = exact DuckDB twin checked by
the driver at sf0.01 (rows-only check otherwise).

This file is generated: `python scripts/gen_operators_md.py`.

| query | tier | oracle | what it covers |
|---|---|---|---|
"""


def main() -> None:
    rows = []
    for name in sorted(QUERIES):
        q = QUERIES[name]
        doc = " ".join(q.doc.split())
        rows.append(
            f"| `{name}` | {q.tier} | {'exact' if q.oracle else 'rows-only'} | {doc} |"
        )
    out = HEADER + "\n".join(rows) + "\n"
    Path("OPERATORS.md").write_text(out)
    print(f"wrote OPERATORS.md with {len(rows)} queries")


if __name__ == "__main__":
    main()
