#!/usr/bin/env python
"""Measure the wall-time-vs-sf scaling curve for the heaviest queries.

Runs heavy-hitter families across sf0.001 → sf1 (driver slices plus
the replica-disjoint slices from gen_scale_slice.py) and prints a
markdown table for SCALE.md §31. min-of-2 per (query, sf); caches
cleared between runs (catalog contract).

Usage: python scripts/run_scale_curve.py
    [lineitem|embeddings|documents|streaming|round9|all]
(default lineitem — the original §31 family; `embeddings` runs the
similarity/ANN chain on the isomorphic text/vector replicas,
VERDICT r6 #4; `documents` the text/corpus chain on the Caesar
replicas; `streaming` the stateful micro-batch chain on the events
replicas, VERDICT r7 #2).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_warehouse_opensky_spark.plans import QUERIES
from data_warehouse_opensky_spark.session import get_spark

FAMILIES = {
    "lineitem": [
        "pricing_summary",
        "stats_weighted_median",
        "graph_triangle_count",
        "graph_kcore_peeling",
        "graph_label_propagation",
        "graph_bfs_hops",
        "graph_community_modularity",
        # events-family (per-user series replicate exactly in the slices)
        "mart_sessionize_gaps",
        "window_range_trailing_1h",
        "mart_attribution_last_touch",
        "stats_gapfill_interpolate",
        "audit_burst_rate",
        "mart_markov_transitions",
    ],
    # similarity/ANN chain (k-means fit + PQ encode + probe is the most
    # plan-complex family; gen_scale_slice replicates documents via
    # per-replica Caesar bijection and embeddings via per-replica
    # isometry, so within-replica similarity structure is EXACT while
    # replicas stay disjoint — weak scaling, not duplicate blowup)
    "embeddings": [
        "ann_ivfpq_topk",
        "ann_binary_hamming_topk",
        "embedding_semantic_dedup",
        "dedup_minhash_lsh",
        "ann_shortlist_rerank",
    ],
    # text-dedup/IR chain over the Caesar-replicated documents corpus
    # (within-replica shingle relations exact, replicas disjoint)
    "documents": [
        "dedup_exact_substring_spans",
        "dedup_simhash_pairs",
        "dedup_ngram_jaccard",
        "text_tfidf_topk",
        "text_bm25_topk",
        "corpus_decontaminate",
    ],
    # stateful micro-batch chain over the key-offset events replicas
    # (VERDICT r7 #2 — the last family with no sf0.3/sf1 point).
    # Per-user event series replicate exactly under the key offset, so
    # user count scales with sf while per-user state stays constant —
    # weak scaling for keyed state: invocation counts and state-store
    # size should scale ~linearly with users, and the per-user blob
    # (open day-sessions) should NOT grow with sf at all.
    "streaming": [
        "streaming_timeout_sessions",
        "streaming_stream_stream_join",
        "streaming_dedup_within_watermark",
        "streaming_stateful_running_agg",
        "session_window_stats",
    ],
    # round-9 additions. Winnowing is the data-heavy one (token-grain
    # explode + pair join); under the Caesar replication each replica's
    # token hashes are bijectively remapped, so winnowed fingerprints
    # never collide across replicas — pair structure replicates exactly
    # (weak scaling). KMV/Theil–Sen ride the key-offset orders
    # replicas: distinct customers scale with k, the KMV sketch stays
    # 128 words, and the Theil–Sen pairwise stage is calendar-bounded
    # (day count constant under replication) — the curve should show
    # the first-aggregate linear term only.
    "round9": [
        "text_winnowing",
        "dedup_winnowing_pairs",
        "sketch_kmv_distinct",
        "stats_theil_sen_trend",
        "corpus_shuffle_shards",
        "corpus_interleave_order",
        # batch 2: wedge join on the sparse signal graph / single-scan
        # QI audit / day-grain sequence stat / UnionLoop recursion whose
        # deepest level joins the replicated customer table
        "graph_neighbor_jaccard",
        "audit_l_diversity",
        "stats_runs_test",
        "sql_recursive_hierarchy",
        # batch 3: day-grain rank correlations (flat by construction)
        "stats_spearman_rank_corr",
        "stats_kendall_tau",
    ],
    # the COMPLETE graph family (VERDICT r9 #4) — §31 measured the
    # five lineitem-family members in round 6; this family re-measures
    # those after three rounds of code drift AND adds the four that
    # never had an sf0.3→sf1 point (pagerank, hierarchy rollup,
    # link-prediction RA, neighbor Jaccard). The co-purchase graph of
    # each slice replica is a disjoint isomorphic copy of sf0.1's, so
    # |V|, |E|, wedge count and per-node degrees all scale exactly
    # linearly — any super-linear wall marginal is a PLAN bug, not a
    # data artifact (that instrument caught the triangle-count join
    # regression and the modularity cache race in round 6).
    "graph": [
        "graph_pagerank",
        "graph_triangle_count",
        "graph_hierarchy_rollup",
        "graph_kcore_peeling",
        "graph_link_prediction_ra",
        "graph_bfs_hops",
        "graph_label_propagation",
        "graph_community_modularity",
        "graph_neighbor_jaccard",
    ],
}
CURVE_QUERIES = FAMILIES["lineitem"]
SLICES = [
    ("0.001", "/root/testdata/sf0.001"),
    ("0.01", "/root/testdata/sf0.01"),
    ("0.1", "/root/testdata/sf0.1"),
    ("0.3", "scale_data/sf0.3"),
    ("1", "scale_data/sf1"),
]


def main() -> None:
    fam = sys.argv[1] if len(sys.argv) > 1 else "lineitem"
    if fam != "all" and fam not in FAMILIES:
        valid = " | ".join([*FAMILIES, "all"])
        raise SystemExit(
            f"unknown family {fam!r}; valid families: {valid}"
        )
    queries = (
        [q for f in FAMILIES.values() for q in f]
        if fam == "all"
        else FAMILIES[fam]
    )
    global CURVE_QUERIES
    CURVE_QUERIES = queries
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = get_spark("scale-curve")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm codegen/plan paths once at the smallest sf.
    for name in CURVE_QUERIES:
        QUERIES[name].fn(spark, SLICES[0][1]).write.format("noop").mode(
            "overwrite"
        ).save()
    spark.catalog.clearCache()
    results: dict[str, dict[str, float]] = {n: {} for n in CURVE_QUERIES}
    for _ in range(2):
        for sf, d in SLICES:
            path = d if os.path.isabs(d) else os.path.join(repo, d)
            if not os.path.isdir(path):
                continue
            for name in CURVE_QUERIES:
                t0 = time.perf_counter()
                QUERIES[name].fn(spark, path).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                results[name][sf] = min(results[name].get(sf, 1e9), dt)
                spark.catalog.clearCache()
    sfs = [sf for sf, _ in SLICES]
    print("| query | " + " | ".join(f"sf{sf}" for sf in sfs)
          + " | x(0.1→1) |")
    print("|---|" + "---|" * (len(sfs) + 1))
    for name in CURVE_QUERIES:
        row = results[name]
        ratio = (row.get("1", 0) / row["0.1"]) if row.get("0.1") else 0
        print(
            f"| {name} | "
            + " | ".join(
                f"{row[sf]:.2f}" if sf in row else "-" for sf in sfs
            )
            + f" | {ratio:.1f}x |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
