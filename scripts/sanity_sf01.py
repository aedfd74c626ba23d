#!/usr/bin/env python
"""Full-catalog oracle sweep at sf0.1 — the scale tier neither pytest
(sf0.001) nor the driver gate (sf0.01) exercises.

Run before a round ends: larger data hits boundary cases the small SFs
never produce (a real example: an event gap of exactly 1800 s at sf0.1
exposed that the session oracles encoded `gap >= 1800` where Spark's
session_window merges at the boundary — green at sf0.001/sf0.01, wrong
at sf0.1). Takes ~10 min on local[32]; too slow for the default suite,
cheap insurance once per round.

Transient adjudication (VERDICT r6 #5): a multi-hundred-query sweep in
ONE long-lived JVM occasionally throws a SparkException that a fresh
session cannot reproduce (r6: graph_pagerank died 25 min in, green on
manual re-run, values hash-matched). Long-session stability is itself
a 100x property, but a red that a human must re-adjudicate is harness
debt — so any EXCEPTION result is automatically retried TWICE, each
in a fresh SparkSession, and reported as `transient-recovered` only
if BOTH retries are green (ADVICE r7: a single green retry would let
a genuinely flaky ~50%-failure query pass the sweep — two independent
greens drop that escape probability to ~25% per sweep, and recovered
names are printed for the round ledger so a repeat offender across
rounds is flagged as a real defect). Any red retry → `fail`
(deterministic or flaky: fix the query). Value mismatches are
deterministic by construction and are never retried.

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
    spark.stop()

    exceptions = [
        r.name
        for r in results
        if not r.ok and any(e.startswith("EXCEPTION:") for e in r.errors)
    ]
    mismatches = [
        (r.name, r.errors[:2])
        for r in results
        if not r.ok and r.name not in exceptions
    ]

    recovered, still_failing = [], []
    for name in exceptions:
        # newSession() shares the JVM whose episode we are ruling out —
        # a genuine fresh session needs a new SparkContext, which in
        # local mode means stop + rebuild (get_spark recreates it).
        # Two independent fresh-JVM retries, BOTH must be green: one
        # green retry cannot distinguish a long-session episode from a
        # coin-flip-flaky plan (ADVICE r7).
        retries = []
        for attempt in (1, 2):
            retry = get_spark(f"sf01-retry-{name}-{attempt}")
            retry.sparkContext.setLogLevel("ERROR")
            rr = run_all(retry, sf_dir, names=[name])
            retry.stop()
            retries.append(rr[0] if rr else None)
        if all(r is not None and r.ok for r in retries):
            recovered.append(name)
        else:
            errs = [
                e
                for r in retries
                if r is not None and not r.ok
                for e in r.errors[:2]
            ] or ["no result"]
            still_failing.append((name, errs[:2]))

    fails = mismatches + still_failing
    print(f"TOTAL {len(results)}")
    # Record recovered names in the round ledger (SCALE.md close-out);
    # a query that recovers in CONSECUTIVE rounds is a real defect.
    print(f"transient-recovered: {recovered or 'none'}")
    print(f"FAILURES: {fails or 'none'}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
