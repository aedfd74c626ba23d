#!/usr/bin/env python
"""Full-catalog oracle sweep at sf0.1 — the scale tier neither pytest
(sf0.001) nor the driver gate (sf0.01) exercises.

Run before a round ends: larger data hits boundary cases the small SFs
never produce (a real example: an event gap of exactly 1800 s at sf0.1
exposed that the session oracles encoded `gap >= 1800` where Spark's
session_window merges at the boundary — green at sf0.001/sf0.01, wrong
at sf0.1). Takes ~10 min on local[32]; too slow for the default suite,
cheap insurance once per round.

Usage: python scripts/sanity_sf01.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

from data_warehouse_opensky_spark.session import get_spark  # noqa: E402
from oracle_harness import run_all  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("sf01-sanity")
    spark.sparkContext.setLogLevel("ERROR")
    results = run_all(spark, sf_dir)
    bad = [(r.name, r.errors[:2]) for r in results if not r.ok]
    print(f"TOTAL {len(results)} FAILURES: {bad or 'none'}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
