"""SparkSession construction and per-session config contract.

The driver owns its own SparkSession; we therefore split config into
(a) builder-time settings used by our own tests/bench entry points, and
(b) runtime-settable session confs applied idempotently by
:func:`configure_runtime` at the top of every query, so behavior is
identical whether the session is ours or the driver's.

Scale stance (100 TB design point): AQE on (runtime re-plan, skew-join
splitting, partition coalescing), broadcast threshold high enough to
catch TPC-H-style dims, UTC session time so event-time semantics match
tz-naive columnar storage (parquet written tz-naive; DuckDB reads it
naive — UTC makes Spark agree).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import SparkSession

#: Confs that can be set on a live session (spark.conf.set) — applied by
#: every query entry point so driver-owned sessions behave identically.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # TPC-H dims (region/nation/customer/supplier/part) stay well under this
    # at bench scale; at 100 TB only region/nation/date dims qualify and the
    # rest fall back to sort-merge automatically.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # ANSI off: the reference contract is coerce-to-NULL (SURVEY §1.3);
    # we still use try_cast everywhere so this is belt-and-braces.
    "spark.sql.ansi.enabled": "false",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The driver testdata's `events.ts` is parquet TIMESTAMP(NANOS) which
    # Spark 4 refuses by default; read as long ns and convert explicitly
    # (floor to µs — matches DuckDB's read behavior, verified).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Recursive-CTE traffic backstop. The default 1e6 tripped on the
    # sf1 slice (SCALE.md §41): graph_hierarchy_rollup's aggregate-
    # before-recurse bounds loop rows by |distinct parts|·depth, and
    # 10x parts × depth 6 ≈ 1.2M crosses the default even though the
    # plan is the right shape. The limit is a runaway-recursion fuse,
    # not a capacity plan — size it ~100x above the expected
    # node-grain recursion mass (at 100 TB, scale with the aggregated
    # key cardinality, never raw facts; recursing over facts should
    # still trip it).
    "spark.sql.cteRecursionRowLimit": str(100_000_000),
}

#: Builder-only confs (need JVM restart to change).
BUILDER_CONFS: dict[str, str] = {
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.driver.memory": "16g",
    # A catalog-wide run compiles 50+ generated-code plans in one JVM;
    # the JVM's default 240 MB code cache fills, the JIT stops
    # compiling, and later queries run interpreted with 5-10x tails.
    "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=1g",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.ui.enabled": "false",
    "spark.sql.parquet.compression.codec": "snappy",
}


#: Sessions already configured — configure_runtime is called from
#: EVERY load_table()/query entry (usually several times per query),
#: and each conf.set is a py4j driver round trip (~10 ms of pure
#: driver latency per query × a 267-query catalog run). One apply per
#: live SparkSession object is enough: nothing in the repo ever
#: changes these confs afterwards, and a NEW session is configured on
#: first touch. WeakSet (identity-keyed, auto-evicted on GC) rather
#: than an id() set so a recycled address can never masquerade as an
#: already-configured session.
_CONFIGURED_SESSIONS: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def configure_runtime(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs idempotently. Safe on any session."""
    if spark in _CONFIGURED_SESSIONS:
        return spark
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf not settable on this session build — keep going
    _CONFIGURED_SESSIONS.add(spark)
    return spark


def get_spark(app_name: str = "data-warehouse-opensky-spark") -> SparkSession:
    """Build (or fetch) a local session for tests/bench."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    for k, v in {**BUILDER_CONFS, **RUNTIME_CONFS}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return configure_runtime(spark)
