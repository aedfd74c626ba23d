"""Cache-lifecycle contract test (VERDICT r4 directive #4 / r3 ADVICE #2).

Catalog query fns may persist() shared subtrees (iterative ranks,
dedup signatures, prefix-scan locals) and deliberately never unpersist
them — the returned DataFrame is lazy, so the cache must outlive the
fn() call. The SESSION OWNER (bench.py, tests/oracle_harness.py, the
external driver) is responsible for `spark.catalog.clearCache()` after
its action. This test codifies that contract end-to-end: run the most
cache-hungry catalog queries back-to-back the way a harness does
(action, then clearCache) and prove the session ends with ZERO cached
blocks — so a third consumer following the documented contract can
never accumulate storage.
"""

from __future__ import annotations

from data_warehouse_opensky_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"

# The heaviest persist() users across families: iterative graph
# (per-round persists), dedup signatures, prefix-scan locals, k-means.
CACHE_HEAVY = [
    "graph_pagerank",
    "graph_kcore_peeling",
    "graph_triangle_count",
    "dedup_minhash_calibration",
    "stats_weighted_median",
    "mart_cumulative_revenue_scan",
    "embedding_kmeans",
]


def _n_cached_rdds(spark) -> int:
    return spark.sparkContext._jsc.sc().getRDDStorageInfo().__len__()


def test_catalog_sweep_ends_with_zero_cached_blocks(spark):
    spark.catalog.clearCache()
    for name in CACHE_HEAVY:
        QUERIES[name].fn(spark, SF).collect()
        spark.catalog.clearCache()
    assert _n_cached_rdds(spark) == 0


def test_clear_cache_reclaims_mid_sweep_storage(spark):
    """The contract's load-bearing half: the queries DO cache (so the
    contract matters), and one clearCache() reclaims everything even
    before any result is consumed a second time."""
    spark.catalog.clearCache()
    df = QUERIES["graph_pagerank"].fn(spark, SF)
    df.collect()
    assert _n_cached_rdds(spark) > 0  # persists really happened
    spark.catalog.clearCache()
    assert _n_cached_rdds(spark) == 0
