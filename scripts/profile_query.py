#!/usr/bin/env python
"""Isolated per-query profiler for optimization work (guide §1).

Usage: python scripts/profile_query.py q1 [q2 ...] [--explain] [--reps N]

For each named catalog query: warm once at sf0.001, then time REPS
noop-sink runs at $SPARK_GRAFT_SF_DIR (default sf0.1) and report
min/median plus the number of Spark jobs the timed run launched
(sequential job count is the local-mode latency driver — each job is
a driver round trip + scheduling barrier). --explain writes the
formatted plan to /tmp/plan_<name>.txt.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_warehouse_opensky_spark.plans import QUERIES
from data_warehouse_opensky_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    explain = "--explain" in sys.argv
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    out = {}
    for name in args:
        fn = QUERIES[name].fn
        spark.sparkContext.setJobDescription(f"warm {name}")
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()
        if explain:
            with open(f"/tmp/plan_{name}.txt", "w") as f:
                f.write(fn(spark, sf_dir)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
        times = []
        jobs = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            ids_before = set(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            ids_after = set(tracker.getJobIdsForGroup(None) or [])
            jobs.append(len(ids_after - ids_before))
            spark.catalog.clearCache()
        out[name] = {
            "min": round(min(times), 3),
            "all": [round(t, 3) for t in times],
            "jobs": jobs[-1],
        }
        print(name, json.dumps(out[name]), flush=True)
    print("TOTAL_MIN", round(sum(v["min"] for v in out.values()), 3))
    spark.stop()


if __name__ == "__main__":
    main()
