#!/usr/bin/env python
"""sf3 decade for the two fact-scale champions (VERDICT r10 #6).

Measures `streaming_timeout_sessions` (events x30 replica slice) and
`dedup_prefix_filter_jaccard` (Zipf-vocabulary slice at 30x docs with
Heaps-law vocabulary growth) one decade past the sf1 curve, min-of-2
per cell with cache clears, same methodology as run_scale_curve.py.
Prints one JSON line per (query, slice) cell.

Generate slices first: python scripts/gen_scale_slice.py --sf3-only
(plus the existing default run for scale_data/sf1).
"""

from __future__ import annotations

import json
import os
import sys
import time

_SCRIPTS_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS_DIR))
sys.path.insert(0, _SCRIPTS_DIR)

from data_warehouse_opensky_spark.plans import QUERIES
from data_warehouse_opensky_spark.session import get_spark

ROOT = os.path.join(os.path.dirname(_SCRIPTS_DIR), "scale_data")

CELLS = [
    # (query, label, sf_dir)
    ("streaming_timeout_sessions", "sf1", os.path.join(ROOT, "sf1")),
    ("streaming_timeout_sessions", "sf3", os.path.join(ROOT, "sf3")),
    ("dedup_prefix_filter_jaccard", "zipf_sf0.1",
     os.path.join(ROOT, "zipf_docs_sf0.1")),
    ("dedup_prefix_filter_jaccard", "zipf_sf3",
     os.path.join(ROOT, "zipf_docs_sf3")),
]


def main() -> None:
    spark = get_spark("sf3-decade")
    spark.sparkContext.setLogLevel("ERROR")
    # warm codegen once at the driver's smallest sf
    for q in {c[0] for c in CELLS}:
        QUERIES[q].fn(spark, "/root/testdata/sf0.001").write.format(
            "noop").mode("overwrite").save()
    spark.catalog.clearCache()
    for q, label, d in CELLS:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[q].fn(spark, d).write.format("noop").mode(
                "overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(json.dumps({"query": q, "slice": label,
                          "sec": round(best, 2)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
