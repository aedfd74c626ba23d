#!/usr/bin/env python
"""Skewed-prefix probe for dedup_fuzzy_levenshtein (VERDICT r9 #1).

Generates the adversarial crawl fixture (30% of docs in ONE
(length-bucket, 8-char-prefix) block — boilerplate openings) at two
sizes and times the catalog plan (capped_block_self_pairs, cap=256)
against the pre-round-10 plain blocked equi-join on the same fixture.

What the numbers must show:
- The hot block's pair count is quadratic BY CONSTRUCTION (that is
  the semantics of blocked all-pairs, not a plan defect), so the
  honest scale claim is about DISTRIBUTION, not total work: the
  uncapped plan runs the whole hot block's Levenshtein kernel inside
  ONE task (one join key = one reducer), the capped plan spreads it
  over g(g+1)/2 cells of <= ~cap^2 kernel area.
- Normalized cost (seconds per million hot pairs) must stay ~flat as
  n grows for the capped plan — the marginal tracks intrinsic pair
  work, with no super-quadratic term and no single-task wall.

Usage: python scripts/run_skew_slice.py  (prints a SCALE.md table)
"""

from __future__ import annotations

import os
import sys
import time

_SCRIPTS_DIR = os.path.dirname(os.path.abspath(__file__))
# repo root for the package import, scripts/ for the sibling-module
# import below (needed when invoked via -m or from another cwd)
sys.path.insert(0, os.path.dirname(_SCRIPTS_DIR))
sys.path.insert(0, _SCRIPTS_DIR)

from pyspark.sql import functions as F

from data_warehouse_opensky_spark.plans import QUERIES
from data_warehouse_opensky_spark.session import get_spark
from data_warehouse_opensky_spark.sources import load_table
from gen_scale_slice import DST_ROOT, SKEWED_PARAMS, gen_skewed_prefix_documents

SIZES = [3000, 9000]


def uncapped_plan(spark, sf_dir):
    """The pre-round-10 plan: plain blocked self-equi-join — the whole
    hot block lands on one reducer."""
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    b = d.select(
        "doc_id",
        "text",
        (F.length("text") / 16).cast("long").alias("len_b"),
        F.substring("text", 1, 8).alias("pre"),
    )
    a2, b2 = b.alias("a"), b.alias("b")
    j = a2.join(
        b2,
        on=[
            F.col("a.len_b") == F.col("b.len_b"),
            F.col("a.pre") == F.col("b.pre"),
            F.col("a.doc_id") < F.col("b.doc_id"),
        ],
    ).filter(F.abs(F.length("a.text") - F.length("b.text")) <= 12)
    return (
        j.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein("a.text", "b.text").cast("long").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 12)
        .orderBy("doc_a", "doc_b")
    )


def timed(fn, *args, reps: int = 2):
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark("skew-slice")
    spark.sparkContext.setLogLevel("ERROR")
    for n in SIZES:
        d = os.path.join(DST_ROOT, f"skewed_docs_n{n}")
        if not os.path.isfile(os.path.join(d, "documents.parquet")):
            gen_skewed_prefix_documents(d, n)
        n_hot = int(n * SKEWED_PARAMS["hot_frac"])
        hot_pairs = n_hot * (n_hot - 1) // 2
        # warm plan/codegen paths
        QUERIES["dedup_fuzzy_levenshtein"].fn(spark, d).write.format(
            "noop"
        ).mode("overwrite").save()
        spark.catalog.clearCache()
        t_cap = timed(QUERIES["dedup_fuzzy_levenshtein"].fn, spark, d)
        print(f"n={n} hot={n_hot} pairs={hot_pairs/1e6:.2f}M "
              f"capped={t_cap:.2f}s", flush=True)
        spark.catalog.clearCache()
        n_out = QUERIES["dedup_fuzzy_levenshtein"].fn(spark, d).count()
        print(f"n={n} pairs_out={n_out}", flush=True)
        spark.catalog.clearCache()
        # single shot: the uncapped baseline runs the whole hot block's
        # kernel inside ONE task (tens of minutes at n=9000 — the
        # defect being demonstrated); min-of-2 would double the wait.
        # Printed incrementally so a harness timeout keeps the smaller
        # sizes' numbers.
        t_plain = timed(uncapped_plan, spark, d, reps=1)
        print(f"n={n} uncapped={t_plain:.2f}s speedup={t_plain/t_cap:.1f}x "
              f"capped_s_per_Mpair={t_cap/(hot_pairs/1e6):.2f}", flush=True)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
