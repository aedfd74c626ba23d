#!/usr/bin/env python
"""In-bench reproduction harness for the minhash-family step (r13 item 1).

The family (dedup_incremental_minhash, dedup_minhash_lsh,
dedup_ngram_jaccard, dedup_minhash_calibration, dedup_containment_pairs,
corpus_cross_source_dups) reads 2.5-3x its floors ONLY inside a full
267-query bench run (7 consecutive records since BENCH_HISTORY[28],
two core counts) while isolated re-times sit at the floors.  This
script reproduces the bench's structure at adjustable scope so the
mechanism can be bisected:

  --warm=none|family|all[:N]   what to warm at sf0.001 first
                               (all:N = first N catalog queries)
  --time=family|<q1,q2,...>    what to time (min-of-PASSES round-robin
                               at $SPARK_GRAFT_SF_DIR, noop sink,
                               clearCache per query -- bench.py's loop)
  --passes=3
  --jvm                        print JVM code-cache/metaspace pool
                               usage + JIT compile totals at each phase

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/repro_inbench.py --warm=all --jvm
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_warehouse_opensky_spark.plans import QUERIES
from data_warehouse_opensky_spark.session import get_spark

FAMILY = [
    "dedup_incremental_minhash",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_minhash_calibration",
    "dedup_containment_pairs",
    "corpus_cross_source_dups",
    "dedup_components_canonical",
    "dedup_impact_report",
    "join_star_revenue",  # control, floor ~1.09 s
]


def jvm_stats(spark) -> dict:
    jvm = spark._jvm
    mf = jvm.java.lang.management.ManagementFactory
    out = {}
    it = mf.getMemoryPoolMXBeans().iterator()
    while it.hasNext():
        p = it.next()
        name = p.getName()
        if "CodeHeap" in name or "Metaspace" in name or "Compressed" in name:
            u = p.getUsage()
            out[name] = {
                "used_mb": round(u.getUsed() / 2**20, 1),
                "max_mb": round(u.getMax() / 2**20, 1),
            }
    comp = mf.getCompilationMXBean()
    out["jit_total_compile_ms"] = comp.getTotalCompilationTime()
    return out


def main() -> None:
    warm = "family"
    time_set = "family"
    passes = 3
    prepend: list[str] = []
    show_jvm = "--jvm" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--warm="):
            warm = a.split("=", 1)[1]
        elif a.startswith("--time="):
            time_set = a.split("=", 1)[1]
        elif a.startswith("--passes="):
            passes = int(a.split("=", 1)[1])
        elif a.startswith("--prepend="):
            prepend = a.split("=", 1)[1].split(",")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("repro")
    spark.sparkContext.setLogLevel("ERROR")

    if show_jvm:
        print("JVM@start", json.dumps(jvm_stats(spark)), flush=True)

    if warm == "family":
        warm_list = FAMILY
    elif warm == "none":
        warm_list = []
    elif warm.startswith("all"):
        n = int(warm.split(":", 1)[1]) if ":" in warm else len(QUERIES)
        warm_list = list(QUERIES)[:n]
    else:
        warm_list = warm.split(",")
    warm_list = prepend + [q for q in warm_list if q not in prepend]

    t0 = time.perf_counter()
    for name in warm_list:
        spark.sparkContext.setJobDescription(f"warm {name}")
        QUERIES[name].fn(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
    spark.catalog.clearCache()
    print(f"warmed {len(warm_list)} queries in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    if show_jvm:
        print("JVM@warmed", json.dumps(jvm_stats(spark)), flush=True)

    targets = FAMILY if time_set == "family" else time_set.split(",")
    best = {n: float("inf") for n in targets}
    for p in range(passes):
        for name in targets:
            spark.sparkContext.setJobDescription(f"time {name} p{p}")
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            spark.catalog.clearCache()
        print(f"pass{p}", json.dumps({n: round(best[n], 3) for n in targets}),
              flush=True)

    if show_jvm:
        print("JVM@end", json.dumps(jvm_stats(spark)), flush=True)
    print("BEST", json.dumps({n: round(best[n], 3) for n in targets}),
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
