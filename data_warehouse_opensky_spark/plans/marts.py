"""Warehouse/mart shapes beyond the basic relational surface
(SURVEY §2 T2 — the delegated-Postgres capabilities the reference's
diagram stages 4–6 imply): band range joins, multi-grain rollup chains,
SCD2 interval builds, arg-min/max aggregates, sketch-vs-exact quality
gates, and higher-order array functions.

Cross-engine determinism follows the catalog doctrine (plans/catalog.py
module docstring): exact integer fixed-point for money, round(…, 6) for
continuous values, epoch seconds for timestamps, unique-key tiebreaks
under every window ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import cents
from ..sources import load_table
from .catalog import query

#: Order-price bands in exact cents: (band_id, name, lo_c, hi_c-exclusive).
#: Non-uniform widths — the realistic shape for a banding dimension.
PRICE_BANDS: tuple[tuple[int, str, int, int], ...] = (
    (1, "micro", 0, 5_000_000),
    (2, "small", 5_000_000, 10_000_000),
    (3, "mid", 10_000_000, 20_000_000),
    (4, "large", 20_000_000, 40_000_000),
    (5, "jumbo", 40_000_000, 1_000_000_000),
)

_BANDS_SQL = ", ".join(f"({i}, '{n}', {lo}, {hi})" for i, n, lo, hi in PRICE_BANDS)


# --------------------------------------------------------------------------
# T2.3 — range (interval) join: fact rows into a banding dimension
# --------------------------------------------------------------------------
@query(
    "range_join_price_bands",
    tier="T2",
    doc="Range/interval join: orders matched to a non-uniform price-band "
    "dimension on lo ≤ price < hi (the banding-report mart shape; no "
    "equi-key exists). Spark plans the broadcast side as a nested-loop "
    "over 5 rows — at 100 TB the fact side streams through the "
    "broadcast unchanged (no shuffle); for large band tables switch to "
    "binned equi-join (bucket by floor(price/width), then refine).",
    oracle=f"""
    WITH bands(band_id, band_name, lo_c, hi_c) AS (VALUES {_BANDS_SQL})
    SELECT band_id, band_name, count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             / 100.0 AS spend
    FROM orders
    JOIN bands ON CAST(round(o_totalprice * 100) AS BIGINT) >= lo_c
              AND CAST(round(o_totalprice * 100) AS BIGINT) < hi_c
    GROUP BY band_id, band_name
    ORDER BY band_id
    """,
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    bands = spark.createDataFrame(
        list(PRICE_BANDS), "band_id INT, band_name STRING, lo_c BIGINT, hi_c BIGINT"
    )
    o = load_table(spark, sf_dir, "orders").select(cents("o_totalprice").alias("price_c"))
    return (
        o.join(
            F.broadcast(bands),
            (F.col("price_c") >= F.col("lo_c")) & (F.col("price_c") < F.col("hi_c")),
        )
        .groupBy("band_id", "band_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum("price_c") / 100.0).alias("spend"),
        )
        .orderBy("band_id")
    )


# --------------------------------------------------------------------------
# T2.6/T2.13 — multi-grain rollup chain (hour → day → month)
# --------------------------------------------------------------------------
@query(
    "rollup_time_grains",
    tier="T2",
    doc="Multi-grain rollup chain: hourly aggregate → daily FROM hourly "
    "→ monthly FROM daily (the incremental-rollup pattern — each grain "
    "re-aggregates the previous, never the raw facts). The oracle "
    "aggregates raw events directly per month, so the gate proves the "
    "chain is exactly re-aggregable (counts and cent-sums are "
    "decomposable aggregates). At 100 TB only the hourly agg touches "
    "the fact table; day/month roll up thousandfold-smaller inputs.",
    oracle="""
    SELECT strftime(ts, '%Y-%m') AS month,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS sum_value
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def rollup_time_grains(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("n"), F.sum(cents("value")).alias("v_c")
    )
    daily = hourly.groupBy(F.date_trunc("day", "h").alias("d")).agg(
        F.sum("n").alias("n"), F.sum("v_c").alias("v_c")
    )
    return (
        daily.groupBy(F.date_format("d", "yyyy-MM").alias("month"))
        .agg(
            F.sum("n").alias("n_events"),
            (F.sum("v_c") / 100.0).alias("sum_value"),
        )
        .orderBy("month")
    )


# --------------------------------------------------------------------------
# T1.7/T2.5 — SCD2 interval build from an event log
# --------------------------------------------------------------------------
@query(
    "scd2_intervals",
    tier="T2",
    doc="SCD type-2 interval build: each user's event log becomes "
    "validity intervals [valid_from, valid_to) via lead() over "
    "(ts, event_id) — the keyed-UPDATE history the reference's "
    "file_log state machine (load_warehouse.py:97,191) keeps only the "
    "tip of. Single shuffle on user_id; timestamps emitted as epoch "
    "seconds with the catalog's unique-key tiebreak.",
    oracle="""
    SELECT user_id, event_id, event_type,
           CAST(round(value * 100) AS BIGINT) / 100.0 AS value_at,
           CAST(floor(epoch(ts)) AS BIGINT) AS valid_from_s,
           lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
             PARTITION BY user_id
             ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id
           ) AS valid_to_s,
           CASE WHEN lead(1) OVER (
             PARTITION BY user_id
             ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id
           ) IS NULL THEN 1 ELSE 0 END AS is_current
    FROM events
    ORDER BY user_id, valid_from_s, event_id
    """,
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        (cents("value") / 100.0).alias("value_at"),
        F.unix_timestamp("ts").cast("long").alias("valid_from_s"),
    )
    w = Window.partitionBy("user_id").orderBy("valid_from_s", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        "value_at",
        "valid_from_s",
        F.lead("valid_from_s").over(w).alias("valid_to_s"),
        F.when(F.lead(F.lit(1)).over(w).isNull(), 1).otherwise(0).alias("is_current"),
    ).orderBy("user_id", "valid_from_s", "event_id")


# --------------------------------------------------------------------------
# T2.6 — arg-min/arg-max aggregates (min_by / max_by)
# --------------------------------------------------------------------------
@query(
    "agg_minmax_by",
    tier="T2",
    doc="Arg-extremum aggregates: per event type, WHO had the cheapest/"
    "priciest event (min_by/max_by). The ordering key is the exact "
    "composite cents·10^7 + event_id, so the extremum is unique and "
    "both engines pick the identical row (bare min_by on a tied value "
    "column is engine-nondeterministic). One map-side-combinable "
    "shuffle.",
    oracle="""
    SELECT event_type, count(*) AS n_events,
           min(CAST(round(value * 100) AS BIGINT)) / 100.0 AS min_value,
           max(CAST(round(value * 100) AS BIGINT)) / 100.0 AS max_value,
           arg_min(user_id, CAST(round(value * 100) AS BIGINT) * 10000000
                            + event_id) AS min_user,
           arg_max(user_id, CAST(round(value * 100) AS BIGINT) * 10000000
                            + event_id) AS max_user,
           arg_min(event_id, CAST(round(value * 100) AS BIGINT) * 10000000
                             + event_id) AS min_event,
           arg_max(event_id, CAST(round(value * 100) AS BIGINT) * 10000000
                             + event_id) AS max_event
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = (cents("value") * 10_000_000 + F.col("event_id")).alias("k")
    prepped = e.select("event_type", "user_id", "event_id", cents("value").alias("v_c"), k)
    return (
        prepped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.min("v_c") / 100.0).alias("min_value"),
            (F.max("v_c") / 100.0).alias("max_value"),
            F.min_by("user_id", "k").alias("min_user"),
            F.max_by("user_id", "k").alias("max_user"),
            F.min_by("event_id", "k").alias("min_event"),
            F.max_by("event_id", "k").alias("max_event"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# T2.7 — approx percentile with an exact tolerance gate
# --------------------------------------------------------------------------
@query(
    "approx_percentile_gate",
    tier="T2",
    doc="Sketch-vs-exact quality gate for approx_percentile (the "
    "single-pass bounded-memory percentile you actually run at "
    "100 TB): per return flag, the exact discrete p50 plus a boolean "
    "within_tolerance (|approx−exact| ≤ 2%·exact). The oracle "
    "predicts (exact, true) — same pattern as the HLL and ANN-recall "
    "gates. KLL/GK rank error at accuracy 10000 is ≤ n/10000 ranks, "
    "far inside 2% of a continuous price distribution.",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
             row_number() OVER (
               PARTITION BY l_returnflag
               ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT),
                        l_orderkey, l_linenumber) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(max(n) AS BIGINT) AS n_rows,
           max(CASE WHEN rn = (n + 1) // 2 THEN price_c END) / 100.0
             AS exact_p50,
           TRUE AS within_tolerance
    FROM ranked
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def approx_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        cents("l_extendedprice").alias("price_c"),
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        "price_c", "l_orderkey", "l_linenumber"
    )
    wc = Window.partitionBy("l_returnflag")
    exact = (
        li.select(
            "l_returnflag",
            "price_c",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.max("n").cast("long").alias("n_rows"),
            F.max(
                F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("price_c"))
            ).alias("exact_p50_c"),
        )
    )
    approx = li.groupBy("l_returnflag").agg(
        F.percentile_approx("price_c", 0.5, 10000).alias("approx_p50_c")
    )
    return (
        exact.join(approx, "l_returnflag")
        .select(
            "l_returnflag",
            "n_rows",
            (F.col("exact_p50_c") / 100.0).alias("exact_p50"),
            (
                F.abs(F.col("approx_p50_c") - F.col("exact_p50_c")) * 50
                <= F.col("exact_p50_c")
            ).alias("within_tolerance"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# T2.14/T3.2 — higher-order array functions over embeddings
# --------------------------------------------------------------------------
@query(
    "hof_array_funcs",
    tier="T3",
    doc="Higher-order array functions over the embedding column — "
    "transform/filter/aggregate/zip_with/array_max all stay inside "
    "JVM codegen (zero Python, zero shuffles, row-local): component "
    "sum, positive-component count, max component, and the "
    "self-reversed dot product, each rounded at 6 dp (continuous "
    "values — the unit norm itself is excluded: it sits exactly on a "
    "rounding boundary by construction).",
    oracle="""
    WITH x AS (
      SELECT vec_id, label,
             list_transform(embedding, v -> CAST(v AS DOUBLE)) AS dbl
      FROM embeddings
    )
    SELECT vec_id, label,
           CAST(len(dbl) AS BIGINT) AS dim,
           CAST(len(list_filter(dbl, v -> v > 0)) AS BIGINT) AS n_pos,
           round(list_sum(dbl), 6) AS comp_sum,
           round(list_max(dbl), 6) AS comp_max,
           round(list_sum(list_transform(range(1, len(dbl) + 1),
                 i -> dbl[CAST(i AS INT)] * dbl[CAST(len(dbl) - i + 1 AS INT)])), 6)
             AS dot_rev
    FROM x
    ORDER BY vec_id
    """,
)
def hof_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda v: v.cast("double"))
    prepped = emb.select("vec_id", "label", dbl.alias("dbl"))
    return prepped.select(
        "vec_id",
        "label",
        F.size("dbl").cast("long").alias("dim"),
        F.size(F.filter("dbl", lambda v: v > 0)).cast("long").alias("n_pos"),
        F.round(F.aggregate("dbl", F.lit(0.0), lambda a, v: a + v), 6).alias(
            "comp_sum"
        ),
        F.round(F.array_max("dbl"), 6).alias("comp_max"),
        F.round(
            F.aggregate(
                F.zip_with("dbl", F.reverse("dbl"), lambda x, y: x * y),
                F.lit(0.0),
                lambda a, v: a + v,
            ),
            6,
        ).alias("dot_rev"),
    ).orderBy("vec_id")


# --------------------------------------------------------------------------
# T2.6 — incremental aggregate maintenance (partial-merge mart refresh)
# --------------------------------------------------------------------------
@query(
    "mart_incremental_merge",
    tier="T2",
    doc="Incremental mart maintenance: the Spark side builds per-(day, "
    "event_type) PARTIAL aggregates (what a daily pipeline stores) and "
    "re-aggregates them to the event_type mart; the oracle recomputes "
    "flat over raw events. Equality proves the partials are mergeable "
    "— a new day refreshes the mart by touching one partial partition, "
    "never rescanning history. count/sum/min/max merge exactly; "
    "non-mergeable stats (count distinct) need sketches instead.",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS total_value,
           CAST(count(DISTINCT strftime(ts, '%Y-%m-%d')) AS BIGINT) AS n_days,
           min(strftime(ts, '%Y-%m-%d')) AS first_day,
           max(strftime(ts, '%Y-%m-%d')) AS last_day
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def mart_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    partials = (
        e.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("day", "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(cents("value")).cast("long").alias("value_c"),
        )
    )
    return (
        partials.groupBy("event_type")
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            (F.sum("value_c").cast("long") / 100.0).alias("total_value"),
            F.count("*").cast("long").alias("n_days"),
            F.min("day").alias("first_day"),
            F.max("day").alias("last_day"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# T2.7 — mergeable HLL sketch mart (per-day sketches → rollup by union)
# --------------------------------------------------------------------------
@query(
    "approx_distinct_hll_mart",
    tier="T2",
    doc="Mergeable-sketch distinct-count mart: per-day Datasketches HLL "
    "sketches of user_id (hll_sketch_agg) UNIONED into the total via "
    "hll_union_agg — count distinct is NOT decomposable, so this is "
    "the only shape that rolls up without rescanning the facts at "
    "100 TB (store the day-grain sketch column, merge for any coarser "
    "grain). Gate per the approx_count_distinct pattern: exact counts "
    "plus within_tolerance booleans (5%) the oracle predicts; the "
    "'total' row's estimate comes ONLY from merged daily sketches, so "
    "a green row proves union-mergeability end to end.",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS grain_key,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           TRUE AS within_tolerance
    FROM events
    GROUP BY 1
    UNION ALL
    SELECT 'total', CAST(count(DISTINCT user_id) AS BIGINT), TRUE FROM events
    ORDER BY grain_key
    """,
)
def approx_distinct_hll_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # The day-grain sketch table is what a real mart STORES; persist it
    # so the per-day gate and the union rollup read one scan's output
    # (it is #days rows) instead of re-aggregating the facts twice.
    daily = (
        e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("grain_key"))
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users_exact"),
            F.hll_sketch_agg("user_id").alias("sk"),
        )
        .persist()
    )
    gate = lambda est, exact: (  # noqa: E731 — |est−exact| ≤ 5%·exact
        F.abs(est - F.col(exact)) * 20 <= F.col(exact)
    )
    daily_out = daily.select(
        "grain_key",
        "n_users_exact",
        gate(F.hll_sketch_estimate("sk"), "n_users_exact").alias("within_tolerance"),
    )
    merged = daily.agg(F.hll_union_agg("sk").alias("sk_u"))
    exact_total = e.agg(F.countDistinct("user_id").cast("long").alias("n_users_exact"))
    total_out = exact_total.crossJoin(merged).select(
        F.lit("total").alias("grain_key"),
        "n_users_exact",
        gate(F.hll_sketch_estimate("sk_u"), "n_users_exact").alias("within_tolerance"),
    )
    return daily_out.unionByName(total_out).orderBy("grain_key")


# --------------------------------------------------------------------------
# T1.7/T2.5 — CDC snapshot diff (incremental change feed between watermarks)
# --------------------------------------------------------------------------

CDC_T1 = "2024-01-02"  # previous load watermark
CDC_T2 = "2024-01-04"  # current load watermark


@query(
    "cdc_snapshot_diff",
    tier="T2",
    doc="CDC change feed between two load watermarks: per (user_id, "
    "event_type) key, the delta slice (T1 <= ts < T2) aggregates to "
    "its newest version (exact composite epoch-s*1e7+event_id) and "
    "LEFT-joins the previous snapshot to classify insert vs update — "
    "the incremental-ETL diff the reference's file_log state machine "
    "(load_warehouse.py:97,191) tracks per file, generalized to keyed "
    "rows. Scale shape: cost is O(|delta| + |snapshot|), never "
    "O(|history|) — the previous snapshot is a stored table in "
    "production (recomputed from the log here only because the gate "
    "needs a closed form); keys untouched by the delta are never "
    "read, and both sides shuffle once on the same key.",
    oracle=f"""
    WITH v AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) * 10000000 + event_id AS version,
             ts
      FROM events
    ),
    old AS (
      SELECT user_id, event_type, max(version) AS old_version
      FROM v WHERE ts < TIMESTAMP '{CDC_T1}' GROUP BY 1, 2
    ),
    delta AS (
      SELECT user_id, event_type, max(version) AS new_version,
             CAST(count(*) AS BIGINT) AS n_delta_events
      FROM v WHERE ts >= TIMESTAMP '{CDC_T1}' AND ts < TIMESTAMP '{CDC_T2}'
      GROUP BY 1, 2
    )
    SELECT d.user_id, d.event_type,
           CASE WHEN o.old_version IS NULL THEN 'insert' ELSE 'update' END AS op,
           CAST(coalesce(o.old_version, -1) AS BIGINT) AS old_version,
           CAST(d.new_version AS BIGINT) AS new_version,
           d.n_delta_events
    FROM delta d
    LEFT JOIN old o ON d.user_id = o.user_id AND d.event_type = o.event_type
    ORDER BY d.user_id, d.event_type
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    version = (
        F.unix_timestamp("ts").cast("long") * 10_000_000 + F.col("event_id")
    ).alias("version")
    v = e.select("user_id", "event_type", "ts", version)
    old = (
        v.filter(F.col("ts") < F.lit(CDC_T1).cast("timestamp"))
        .groupBy("user_id", "event_type")
        .agg(F.max("version").alias("old_version"))
    )
    delta = (
        v.filter(
            (F.col("ts") >= F.lit(CDC_T1).cast("timestamp"))
            & (F.col("ts") < F.lit(CDC_T2).cast("timestamp"))
        )
        .groupBy("user_id", "event_type")
        .agg(
            F.max("version").alias("new_version"),
            F.count("*").cast("long").alias("n_delta_events"),
        )
    )
    return (
        delta.join(old, ["user_id", "event_type"], "left")
        .select(
            "user_id",
            "event_type",
            F.when(F.col("old_version").isNull(), "insert")
            .otherwise("update")
            .alias("op"),
            # coalesce(-1): a nullable BIGINT column materializes as
            # float64 in pandas on both engines, and version values
            # exceed 2^53 — keep the column non-null so it stays int64.
            F.coalesce("old_version", F.lit(-1)).cast("long").alias("old_version"),
            F.col("new_version").cast("long").alias("new_version"),
            "n_delta_events",
        )
        .orderBy("user_id", "event_type")
    )


# --------------------------------------------------------------------------
# T2.5/T2.6 — ordered event funnel (view → click → purchase)
# --------------------------------------------------------------------------
@query(
    "mart_event_funnel",
    tier="T2",
    doc="Ordered conversion funnel: per user, the first view, the first "
    "click strictly AFTER that view, and the first purchase strictly "
    "after that click — the classic product-analytics mart. ONE "
    "shuffle on user_id: each user's (time, type) pairs collect and "
    "sort row-locally, and a single aggregate() fold walks the "
    "sequence (O(events/user), types pre-filtered in the scan). "
    "Event identity rides the exact composite epoch-s*1e7+event_id so "
    "'strictly after' is unambiguous under second-resolution ties. "
    "The oracle computes the same steps as three chained conditional "
    "mins.",
    oracle="""
    WITH u AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) * 10000000 + event_id AS u
      FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ),
    s1 AS (SELECT user_id, min(u) AS t1 FROM u WHERE event_type = 'view'
           GROUP BY 1),
    s2 AS (SELECT u.user_id, min(u.u) AS t2
           FROM u JOIN s1 ON u.user_id = s1.user_id
           WHERE u.event_type = 'click' AND u.u > s1.t1 GROUP BY 1),
    s3 AS (SELECT u.user_id, min(u.u) AS t3
           FROM u JOIN s2 ON u.user_id = s2.user_id
           WHERE u.event_type = 'purchase' AND u.u > s2.t2 GROUP BY 1)
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM s2) AS BIGINT) AS n_view_click,
           CAST((SELECT count(*) FROM s3) AS BIGINT) AS n_full_funnel,
           CAST((SELECT coalesce(sum(s3.t3 // 10000000
                                     - s1.t1 // 10000000), 0)
                 FROM s3 JOIN s1 ON s3.user_id = s1.user_id) AS BIGINT)
             AS sum_convert_s
    FROM u
    """,
)
def mart_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return event_funnel(e)


def event_funnel(e: DataFrame) -> DataFrame:
    """Funnel counts over an events frame (user_id, ts, event_id,
    event_type) — separated from the catalog entry so property tests
    can drive it with generated sequences (tests/test_properties.py)."""
    e = e.filter(F.col("event_type").isin("view", "click", "purchase"))
    u = (
        F.unix_timestamp("ts").cast("long") * 10_000_000 + F.col("event_id")
    ).alias("u")
    per_user = (
        e.select("user_id", u, F.col("event_type").alias("tp"))
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list(F.struct("u", "tp"))).alias("seq"))
        .select(
            "user_id",
            F.expr(
                """
                aggregate(
                  seq,
                  named_struct('t1', CAST(NULL AS BIGINT),
                               't2', CAST(NULL AS BIGINT),
                               't3', CAST(NULL AS BIGINT)),
                  (s, x) -> named_struct(
                    't1', CASE WHEN s.t1 IS NULL AND x.tp = 'view'
                               THEN x.u ELSE s.t1 END,
                    't2', CASE WHEN s.t2 IS NULL AND s.t1 IS NOT NULL
                                    AND x.tp = 'click' AND x.u > s.t1
                               THEN x.u ELSE s.t2 END,
                    't3', CASE WHEN s.t3 IS NULL AND s.t2 IS NOT NULL
                                    AND x.tp = 'purchase' AND x.u > s.t2
                               THEN x.u ELSE s.t3 END))
                """
            ).alias("f"),
        )
    )
    # coalesce: over an empty (fully-filtered) input, sum() is NULL but
    # the funnel contract is zero counts (hypothesis-found edge).
    stage = lambda c: F.coalesce(  # noqa: E731
        F.sum(F.col(c).isNotNull().cast("long")), F.lit(0)
    ).cast("long")
    return per_user.agg(
        F.count("*").cast("long").alias("n_users"),
        stage("f.t1").alias("n_view"),
        stage("f.t2").alias("n_view_click"),
        stage("f.t3").alias("n_full_funnel"),
        F.coalesce(
            F.sum(
                F.expr("f.t3 div 10000000 - f.t1 div 10000000")
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("sum_convert_s"),
    )


# --------------------------------------------------------------------------
# T2.6/T2.13 — retention cohort mart
# --------------------------------------------------------------------------
@query(
    "mart_retention_cohorts",
    tier="T2",
    doc="Retention cohort triangle: users cohorted by first-active day, "
    "counted distinct per (cohort_day, day_offset) — the standard "
    "growth mart. Two shuffles, both on user_id (first-day agg, then "
    "the activity join), so at 100 TB they co-partition and the "
    "second is exchange-free; the final agg is keyed on ~cohorts x "
    "offsets, map-side combined.",
    oracle="""
    WITH f AS (
      SELECT user_id, min(CAST(floor(epoch(ts)) AS BIGINT) // 86400)
               AS cohort_day
      FROM events GROUP BY 1
    ),
    a AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             CAST(floor(epoch(e.ts)) AS BIGINT) // 86400 - f.cohort_day
               AS day_offset
      FROM events e JOIN f ON e.user_id = f.user_id
    )
    SELECT cohort_day, day_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM a
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def mart_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("CAST(unix_timestamp(ts) AS BIGINT) div 86400").alias("day"),
    )
    first = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        e.join(first, "user_id")
        .select("user_id", "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .distinct()
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


# --------------------------------------------------------------------------
# T2.4 — referential-integrity audit (orphan detection across the star)
# --------------------------------------------------------------------------
@query(
    "audit_referential_integrity",
    tier="T2",
    doc="Warehouse FK audit: orphan counts for every edge of the star "
    "schema (orders->customer, lineitem->orders, lineitem->part, "
    "customer->nation) via left-anti joins — the load-validation "
    "query a warehouse runs after every batch. Each edge is one "
    "anti-join + count; dims broadcast, fact-fact edges sort-merge on "
    "the key at scale. Clean testdata must audit clean (n_orphans "
    "0) — the query's value is the shape plus the gate that it stays "
    "zero as loaders evolve.",
    oracle="""
    SELECT 'customer->nation' AS relationship,
           CAST((SELECT count(*) FROM customer) AS BIGINT) AS n_child,
           CAST((SELECT count(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey))
                AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'lineitem->orders',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem->part',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey))
                AS BIGINT)
    UNION ALL
    SELECT 'orders->customer',
           CAST((SELECT count(*) FROM orders) AS BIGINT),
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    ORDER BY relationship
    """,
)
def audit_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = [
        ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ]
    parts = []
    for name, child, fk, parent, pk in edges:
        c = load_table(spark, sf_dir, child).select(F.col(fk).alias("fk"))
        p = load_table(spark, sf_dir, parent).select(F.col(pk).alias("fk"))
        orphans = c.join(p, "fk", "left_anti")
        parts.append(
            c.agg(F.count("*").cast("long").alias("n_child")).crossJoin(
                orphans.agg(F.count("*").cast("long").alias("n_orphans"))
            ).select(F.lit(name).alias("relationship"), "n_child", "n_orphans")
        )
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out.orderBy("relationship")


# --------------------------------------------------------------------------
# T2.7/T2.9 — cumulative distinct users (growth curve)
# --------------------------------------------------------------------------
@query(
    "mart_cumulative_users",
    tier="T2",
    doc="Cumulative distinct users per day — the growth curve. "
    "Cumulative COUNT(DISTINCT) is not decomposable, so the scalable "
    "rewrite is: first-seen day per user (one agg on user_id), daily "
    "new-user counts, then a running sum over the tiny #days frame — "
    "the single-partition window is post-aggregation and scale-safe. "
    "Never a per-day distinct over growing prefixes (O(days x "
    "history) rescans).",
    oracle="""
    WITH f AS (
      SELECT user_id, min(strftime(ts, '%Y-%m-%d')) AS first_day
      FROM events GROUP BY 1
    ),
    d AS (
      SELECT first_day AS day, CAST(count(*) AS BIGINT) AS n_new
      FROM f GROUP BY 1
    )
    SELECT day, n_new,
           CAST(sum(n_new) OVER (ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_cumulative
    FROM d
    ORDER BY day
    """,
)
def mart_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(
        F.min(F.date_format("ts", "yyyy-MM-dd")).alias("day")
    )
    daily = first.groupBy("day").agg(F.count("*").cast("long").alias("n_new"))
    w = Window.partitionBy(F.lit(1)).orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return daily.select(
        "day", "n_new", F.sum("n_new").over(w).cast("long").alias("n_cumulative")
    ).orderBy("day")


# --------------------------------------------------------------------------
# T2.6/T2.13 — exponentially-decayed trending score
# --------------------------------------------------------------------------

#: Decay reference instant and half-life. A FIXED reference (not wall
#: clock) keeps the query deterministic and replayable; a production
#: pipeline passes its batch watermark here.
DECAY_REF = "2024-02-01"
DECAY_HALF_LIFE_S = 86_400  # 1 day


@query(
    "mart_trending_decay",
    tier="T2",
    doc="Trending mart: per event type, an exponentially time-decayed "
    "event score (half-life 1 day against a fixed reference instant) "
    "— the recency-weighted ranking every feed/leaderboard runs. Each "
    "event's decay weight rounds to an e6 integer ROW-LOCALLY "
    "(continuous value, rounding-safe) and the aggregate sums exact "
    "integers — a float sum would be partial-order-dependent and "
    "could never hash-match. One scan, map-side combined.",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(1000000 * pow(2.0,
                -(epoch(TIMESTAMP '{DECAY_REF}') - floor(epoch(ts)))
                / {DECAY_HALF_LIFE_S}.0)) AS BIGINT)) AS BIGINT)
             AS decayed_score_e6
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def mart_trending_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    age_s = (
        F.unix_timestamp(F.lit(DECAY_REF).cast("timestamp")).cast("long")
        - F.unix_timestamp("ts").cast("long")
    )
    weight_e6 = F.round(
        1_000_000 * F.pow(F.lit(2.0), -(age_s.cast("double") / DECAY_HALF_LIFE_S))
    ).cast("long")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(weight_e6).cast("long").alias("decayed_score_e6"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# T2.6 — privacy governance: k-anonymity audit over quasi-identifiers
# --------------------------------------------------------------------------

K_ANON = 5  # minimum group size for a quasi-identifier combination


@query(
    "audit_k_anonymity",
    tier="T2",
    doc="k-anonymity audit: customer quasi-identifier combinations "
    "(nation, market segment) whose group size is below k=5 — the "
    "re-identification risk report a privacy review runs before a "
    "dataset ships. One map-side-combined groupBy on the "
    "quasi-identifier tuple; EVERY combination is reported with its "
    "exact size and a below_k flag (not just violators), so the gate "
    "checks real group sizes even on datasets that happen to pass.",
    oracle=f"""
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS group_size,
           count(*) < {K_ANON} AS below_k
    FROM customer
    GROUP BY 1, 2
    ORDER BY nationkey, segment
    """,
)
def audit_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy(
            F.col("c_nationkey").cast("long").alias("nationkey"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.count("*").cast("long").alias("group_size"))
        .select(
            "nationkey",
            "segment",
            "group_size",
            (F.col("group_size") < K_ANON).alias("below_k"),
        )
        .orderBy("nationkey", "segment")
    )


# --------------------------------------------------------------------------
# T2.6 — ops diagnostics: join-key skew report
# --------------------------------------------------------------------------
@query(
    "audit_key_skew",
    tier="T2",
    doc="Key-skew diagnostic for shuffle keys: per candidate join/agg "
    "key column, the rows-per-key distribution (key count, max, "
    "top-key share in ppm) — the report that decides whether a join "
    "needs salting or AQE skew handling BEFORE it burns a cluster. "
    "Two-level aggregation: count per key (map-side combined), then "
    "a tiny summary agg; exact integers throughout.",
    oracle="""
    WITH per_key AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY user_id
    )
    SELECT 'events.user_id' AS key_col,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(max(n) AS BIGINT) AS max_rows_per_key,
           CAST(sum(n) // count(*) AS BIGINT) AS mean_rows_per_key,
           CAST(max(n) * 1000000 // sum(n) AS BIGINT) AS top_key_share_ppm
    FROM per_key
    """,
)
def audit_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    per_key = e.groupBy("user_id").agg(F.count("*").cast("long").alias("n"))
    return per_key.agg(
        F.lit("events.user_id").alias("key_col"),
        F.count("*").cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("n").cast("long").alias("max_rows_per_key"),
        F.expr("CAST(sum(n) div count(*) AS BIGINT)").alias("mean_rows_per_key"),
        F.expr("CAST(max(n) * 1000000 div sum(n) AS BIGINT)").alias(
            "top_key_share_ppm"
        ),
    )


# --------------------------------------------------------------------------
# T2.6 — deterministic mode (most-frequent-value aggregate)
# --------------------------------------------------------------------------
@query(
    "agg_mode_deterministic",
    tier="T2",
    doc="Mode aggregate with a pinned tie rule: per event type, the "
    "most frequent user (smallest user_id wins ties). Bare mode() is "
    "engine-nondeterministic under ties, so both engines maximize the "
    "exact composite count*1e7 + (1e7-1-user_id) — two map-side-"
    "combined aggregations, no window.",
    oracle="""
    WITH c AS (
      SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(arg_max(user_id, n * 10000000 + (9999999 - user_id))
                AS BIGINT) AS mode_user,
           CAST(max(n) AS BIGINT) AS mode_count,
           CAST(count(*) AS BIGINT) AS n_distinct_users
    FROM c
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("event_type", "user_id").agg(
        F.count("*").cast("long").alias("n")
    )
    key = F.col("n") * 10_000_000 + (9_999_999 - F.col("user_id"))
    return (
        counts.groupBy("event_type")
        .agg(
            F.max_by("user_id", key).cast("long").alias("mode_user"),
            F.max("n").cast("long").alias("mode_count"),
            F.count("*").cast("long").alias("n_distinct_users"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# T2.9 — window-over-agg-over-window composition: weekly top gainer
# --------------------------------------------------------------------------
@query(
    "mart_weekly_top_gainer",
    tier="T2",
    doc="Weekly top gainer: per-customer weekly spend (exact cents), "
    "week-over-week delta via lag, then the single largest positive "
    "mover per week (row_number, delta/custkey tiebreak) — the "
    "window-over-aggregate-over-window composition every trending "
    "report uses. Two shuffles total (agg on (cust, week); window "
    "re-keyed by week); both windows ride partial-agg'd rows, never "
    "the raw fact.",
    oracle="""
    WITH w AS (
      SELECT o_custkey, date_trunc('week', CAST(o_orderdate AS DATE)) AS wk,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS spend_c
      FROM orders GROUP BY 1, 2
    ),
    d AS (
      SELECT *, spend_c - lag(spend_c)
                  OVER (PARTITION BY o_custkey ORDER BY wk) AS delta_c
      FROM w
    ),
    r AS (
      SELECT wk, o_custkey, delta_c,
             row_number() OVER (PARTITION BY wk
                                ORDER BY delta_c DESC, o_custkey) AS rn
      FROM d WHERE delta_c IS NOT NULL
    )
    SELECT strftime(wk, '%Y-%m-%d') AS week, o_custkey AS custkey, delta_c
    FROM r WHERE rn = 1 ORDER BY week
    """,
)
def mart_weekly_top_gainer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date(F.date_trunc("week", "o_orderdate")).alias("wk"),
        cents("o_totalprice").alias("price_c"),
    )
    w = o.groupBy("o_custkey", "wk").agg(F.sum("price_c").alias("spend_c"))
    lag_w = Window.partitionBy("o_custkey").orderBy("wk")
    d = w.select(
        "o_custkey",
        "wk",
        (F.col("spend_c") - F.lag("spend_c").over(lag_w)).alias("delta_c"),
    ).filter(F.col("delta_c").isNotNull())
    rank_w = Window.partitionBy("wk").orderBy(F.desc("delta_c"), F.asc("o_custkey"))
    return (
        d.withColumn("rn", F.row_number().over(rank_w))
        .filter(F.col("rn") == 1)
        .select(
            F.date_format("wk", "yyyy-MM-dd").alias("week"),
            F.col("o_custkey").alias("custkey"),
            "delta_c",
        )
        .orderBy("week")
    )


# --------------------------------------------------------------------------
# T2 — declarative data-quality expectations (the Deequ/great-expectations
# shape: N constraints, ONE scan)
# --------------------------------------------------------------------------
@query(
    "audit_expectations",
    tier="T2",
    doc="Declarative expectation suite over orders — not-null, unique, "
    "accepted-values, numeric range, regex pattern, date bounds — all "
    "six constraints evaluated in a SINGLE scan: one aggregate row of "
    "violation counters (each a map-side-combinable conditional sum; "
    "uniqueness via n_rows - count(DISTINCT key)), unpivoted row-"
    "locally with stack() into one row per constraint. This is the "
    "post-load validation gate the reference's file_log status "
    "machine approximates (load_warehouse.py:120-125) done as data "
    "checks, not bookkeeping; at 100 TB it costs one scan regardless "
    "of how many constraints run, and the partials are a dozen longs "
    "per task.",
    oracle="""
    WITH s AS (
      SELECT
        count(*) AS n_rows,
        CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS v_null_custkey,
        CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS v_dup_key,
        CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                      THEN 1 ELSE 0 END) AS BIGINT) AS v_status,
        CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS v_price,
        CAST(sum(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-')
                      THEN 1 ELSE 0 END) AS BIGINT) AS v_priority,
        CAST(sum(CASE WHEN CAST(o_orderdate AS DATE) < DATE '1992-01-01'
                        OR CAST(o_orderdate AS DATE) > DATE '1998-12-31'
                      THEN 1 ELSE 0 END) AS BIGINT) AS v_date
      FROM orders
    )
    SELECT u.check_name, s.n_rows,
           u.n_violations, u.n_violations = 0 AS passed
    FROM s, LATERAL (VALUES
      ('not_null(o_custkey)', v_null_custkey),
      ('unique(o_orderkey)', v_dup_key),
      ('accepted_values(o_orderstatus)', v_status),
      ('range(o_totalprice > 0)', v_price),
      ('pattern(o_orderpriority)', v_priority),
      ('date_bounds(o_orderdate)', v_date)
    ) AS u(check_name, n_violations)
    ORDER BY u.check_name
    """,
)
def audit_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    viol = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("long")  # noqa: E731
    s = o.agg(
        F.count("*").alias("n_rows"),
        viol(F.col("o_custkey").isNull()).alias("v_null_custkey"),
        (F.count("*") - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("v_dup_key"),
        viol(~F.col("o_orderstatus").isin("O", "F", "P")).alias("v_status"),
        viol(F.col("o_totalprice") <= 0).alias("v_price"),
        viol(~F.col("o_orderpriority").rlike("^[1-5]-")).alias("v_priority"),
        viol(
            (F.to_date("o_orderdate") < F.lit("1992-01-01"))
            | (F.to_date("o_orderdate") > F.lit("1998-12-31"))
        ).alias("v_date"),
    )
    stacked = s.select(
        "n_rows",
        F.expr(
            "stack(6, "
            "'not_null(o_custkey)', v_null_custkey, "
            "'unique(o_orderkey)', v_dup_key, "
            "'accepted_values(o_orderstatus)', v_status, "
            "'range(o_totalprice > 0)', v_price, "
            "'pattern(o_orderpriority)', v_priority, "
            "'date_bounds(o_orderdate)', v_date) AS (check_name, n_violations)"
        ),
    )
    return stacked.select(
        "check_name",
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("check_name")


# --------------------------------------------------------------------------
# T2 — sequence-pattern mining over ordered per-user event strings
# --------------------------------------------------------------------------
@query(
    "mart_sequence_patterns",
    tier="T2",
    doc="MATCH_RECOGNIZE-style sequence mining: each user's events "
    "collapse (ordered by the exact epoch-s·1e7+event_id composite) "
    "into a compact initials string — c/e/p/s/v — and patterns are "
    "counted with regexes on that string: view→purchase runs without "
    "leaving browse ('v[cv]*p'), error bursts ('ee+'), and an "
    "eventual signup→purchase conversion flag. ONE shuffle on "
    "user_id; the sequence string is bounded by events/user and the "
    "regex work is row-local. Patterns avoid backreferences/"
    "lookaround so Java regex and RE2 agree (both leftmost-greedy, "
    "non-overlapping counts). The 100 TB shape for sessionized "
    "pattern mining: collapse once, mine many patterns per pass.",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) * 10000000 + event_id AS u,
             substring(event_type, 1, 1) AS ini
      FROM events
    ),
    s AS (
      SELECT user_id, string_agg(ini, '' ORDER BY u) AS seq
      FROM u GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(seq) AS BIGINT) AS seq_len,
           CAST(len(regexp_extract_all(seq, 'v[cv]*p')) AS BIGINT)
             AS n_viewbuy,
           CAST(len(regexp_extract_all(seq, 'ee+')) AS BIGINT)
             AS n_error_bursts,
           regexp_matches(seq, 's.*p') AS signup_converted
    FROM s
    ORDER BY user_id
    """,
)
def mart_sequence_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        (
            F.floor(F.unix_timestamp("ts")).cast("long") * 10000000
            + F.col("event_id")
        ).alias("u"),
        F.substring("event_type", 1, 1).alias("ini"),
    )
    s = (
        e.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("u", "ini"))),
                    lambda x: x["ini"],
                ),
                "",
            ).alias("seq")
        )
    )
    return s.select(
        "user_id",
        F.length("seq").cast("long").alias("seq_len"),
        F.regexp_count("seq", F.lit("v[cv]*p")).cast("long").alias("n_viewbuy"),
        F.regexp_count("seq", F.lit("ee+")).cast("long").alias("n_error_bursts"),
        F.col("seq").rlike("s.*p").alias("signup_converted"),
    ).orderBy("user_id")


# --------------------------------------------------------------------------
# T1.7/T2 — CDC APPLY: merge a keyed insert/update/delete log into a
# snapshot (the batch twin of the streaming upsert sink)
# --------------------------------------------------------------------------
@query(
    "cdc_apply_log",
    tier="T2",
    doc="Apply a keyed change log (ops derived from the delta slice: "
    "'error' events are DELETE markers, everything else UPSERTs its "
    "exact e4-unit value) onto the pre-watermark snapshot: latest log "
    "op per key wins (exact epoch-s*1e7+event_id version), a delete "
    "tombstone removes the key, an upsert replaces the value, "
    "untouched keys pass through — MERGE WHEN MATCHED/NOT MATCHED "
    "semantics as a pure query, the batch twin of the partition-"
    "scoped foreachBatch upsert sink (streaming/sink.py). Both sides "
    "reduce to one row per key BEFORE the single equi-join on "
    "user_id — cost O(|snapshot|+|delta|), and at 100 TB the join "
    "prunes to the partitions the delta touches (the sink does "
    "exactly that pruning on write).",
    oracle=f"""
    WITH v AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) * 10000000 + event_id AS ver,
             CAST(round(value * 10000) AS BIGINT) AS val_e4,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             ts
      FROM events
    ),
    snap AS (
      SELECT user_id, max_by(val_e4, ver) AS snap_val
      FROM v WHERE ts < TIMESTAMP '{CDC_T1}' GROUP BY user_id
    ),
    log AS (
      SELECT user_id, max_by(op, ver) AS last_op,
             max_by(val_e4, ver) AS last_val,
             CAST(count(*) AS BIGINT) AS n_ops
      FROM v WHERE ts >= TIMESTAMP '{CDC_T1}' AND ts < TIMESTAMP '{CDC_T2}'
      GROUP BY user_id
    )
    SELECT coalesce(s.user_id, l.user_id) AS user_id,
           CASE WHEN l.user_id IS NULL THEN s.snap_val
                ELSE l.last_val END AS val_e4,
           CASE WHEN l.user_id IS NULL THEN 'unchanged'
                WHEN s.user_id IS NULL THEN 'inserted'
                ELSE 'updated' END AS merge_action,
           coalesce(l.n_ops, 0) AS n_ops
    FROM snap s FULL JOIN log l ON s.user_id = l.user_id
    WHERE l.user_id IS NULL OR l.last_op <> 'D'
    ORDER BY user_id
    """,
)
def cdc_apply_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "user_id",
        (
            F.floor(F.unix_timestamp("ts")).cast("long") * 10000000
            + F.col("event_id")
        ).alias("ver"),
        F.round(F.col("value") * 10000).cast("long").alias("val_e4"),
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        "ts",
    )
    snap = (
        v.filter(F.col("ts") < F.lit(CDC_T1).cast("timestamp"))
        .groupBy("user_id")
        .agg(F.max_by("val_e4", "ver").alias("snap_val"))
    )
    log = (
        v.filter(
            (F.col("ts") >= F.lit(CDC_T1).cast("timestamp"))
            & (F.col("ts") < F.lit(CDC_T2).cast("timestamp"))
        )
        .groupBy("user_id")
        .agg(
            F.max_by("op", "ver").alias("last_op"),
            F.max_by("val_e4", "ver").alias("last_val"),
            F.count("*").cast("long").alias("n_ops"),
        )
    )
    s, l = snap.alias("s"), log.alias("l")
    j = s.join(l, F.col("s.user_id") == F.col("l.user_id"), "full")
    return (
        j.filter(F.col("l.user_id").isNull() | (F.col("l.last_op") != "D"))
        .select(
            F.coalesce("s.user_id", "l.user_id").alias("user_id"),
            F.when(F.col("l.user_id").isNull(), F.col("s.snap_val"))
            .otherwise(F.col("l.last_val"))
            .alias("val_e4"),
            F.when(F.col("l.user_id").isNull(), "unchanged")
            .when(F.col("s.user_id").isNull(), "inserted")
            .otherwise("updated")
            .alias("merge_action"),
            F.coalesce("l.n_ops", F.lit(0)).cast("long").alias("n_ops"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# T2 — rolling 7-day DISTINCT customers (sliding distinct via grain cover)
# --------------------------------------------------------------------------
@query(
    "mart_rolling_distinct_7d",
    tier="T2",
    doc="Trailing-7-day distinct active customers per order day — "
    "sliding-window COUNT(DISTINCT), which no window frame computes "
    "directly. Scale-correct shape: reduce to distinct (day, "
    "customer) grains FIRST (one map-side-combined distinct), then "
    "each grain explodes into the ≤7 cover days it contributes to "
    "(bounded fan-out = window/grain, rows already deduped), and a "
    "second distinct-agg counts per cover day. Cost is 7·|grains|, "
    "independent of raw row count — the fact table is touched once. "
    "Cover days are clipped to observed days via one broadcast semi-"
    "join so both engines report the same day spine.",
    oracle="""
    WITH d AS (
      SELECT DISTINCT CAST(o_orderdate AS DATE) AS day, o_custkey
      FROM orders
    ),
    days AS (SELECT DISTINCT day FROM d)
    SELECT strftime(days.day, '%Y-%m-%d') AS day,
           count(DISTINCT d.o_custkey) AS nd_7d
    FROM days JOIN d ON d.day BETWEEN days.day - 6 AND days.day
    GROUP BY days.day ORDER BY days.day
    """,
)
def mart_rolling_distinct_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("day"), "o_custkey"
    )
    grains = o.distinct()
    days = grains.select("day").distinct()
    covered = grains.select(
        F.explode(
            F.expr("sequence(day, date_add(day, 6), interval 1 day)")
        ).alias("cover_day"),
        "o_custkey",
    )
    return (
        covered.join(
            F.broadcast(days),
            covered.cover_day == days.day,
            "left_semi",
        )
        .groupBy("cover_day")
        .agg(F.countDistinct("o_custkey").alias("nd_7d"))
        .select(
            F.date_format("cover_day", "yyyy-MM-dd").alias("day"), "nd_7d"
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# T2 — ABC / Pareto classification (cumulative-share banding)
# --------------------------------------------------------------------------
@query(
    "mart_abc_pareto",
    tier="T2",
    doc="ABC inventory classification: parts ranked by exact-cents "
    "revenue, cumulative share banded A (≤80% of total), B (≤95%), "
    "C (rest) — the Pareto mart every warehouse ships. Exact "
    "integers throughout: the band test is cum·100 ≤ threshold·total "
    "cross-multiplied, no float CDF. One map-side-combined agg on "
    "partkey, then ONE window cumsum over the |parts| aggregated "
    "rows (ranked by revenue desc, partkey tiebreak) — at extreme "
    "|parts| the cumsum generalizes to a two-phase distributed "
    "prefix sum (per-partition totals broadcast as offsets), same "
    "plan otherwise.",
    oracle="""
    WITH r AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM lineitem GROUP BY l_partkey
    ),
    t AS (SELECT CAST(sum(rev_c) AS BIGINT) AS total_c FROM r),
    c AS (
      SELECT l_partkey, rev_c,
             CAST(sum(rev_c) OVER (ORDER BY rev_c DESC, l_partkey
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c
      FROM r
    )
    SELECT CASE WHEN cum_c * 100 <= 80 * t.total_c THEN 'A'
                WHEN cum_c * 100 <= 95 * t.total_c THEN 'B'
                ELSE 'C' END AS abc_class,
           count(*) AS n_parts,
           CAST(sum(rev_c) AS BIGINT) / 100.0 AS class_revenue,
           round(CAST(sum(rev_c) AS DOUBLE) / t.total_c, 6) AS revenue_share
    FROM c, t
    GROUP BY 1, t.total_c
    ORDER BY 1
    """,
)
def mart_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", cents("l_extendedprice").alias("price_c")
    )
    r = li.groupBy("l_partkey").agg(F.sum("price_c").cast("long").alias("rev_c"))
    t = r.agg(F.sum("rev_c").cast("long").alias("total_c"))
    w = Window.orderBy(F.desc("rev_c"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = r.select(
        "rev_c", F.sum("rev_c").over(w).cast("long").alias("cum_c")
    ).crossJoin(F.broadcast(t))
    cls = (
        F.when(F.col("cum_c") * 100 <= 80 * F.col("total_c"), "A")
        .when(F.col("cum_c") * 100 <= 95 * F.col("total_c"), "B")
        .otherwise("C")
    )
    return (
        c.groupBy(cls.alias("abc_class"), "total_c")
        .agg(
            F.count("*").alias("n_parts"),
            (F.sum("rev_c").cast("long") / 100.0).alias("class_revenue"),
            F.round(
                F.sum("rev_c").cast("double") / F.col("total_c"), 6
            ).alias("revenue_share"),
        )
        .drop("total_c")
        .orderBy("abc_class")
    )


# --------------------------------------------------------------------------
# T2 — market-basket association mining (co-occurrence support + lift)
# --------------------------------------------------------------------------
@query(
    "mart_market_basket",
    tier="T2",
    doc="Association mining over order baskets: distinct (order, part) "
    "grains self-join WITHIN the order key (p1 < p2) to count pair "
    "support, then lift = N·c12/(c1·c2) from broadcast item counts — "
    "the co-purchase mart behind 'bought together'. The pair fan-out "
    "is Σ items²/order, bounded by basket size (never all-pairs over "
    "the catalog); the self-join shuffles once on the order key that "
    "baskets are already clustered by. Top pairs by support with "
    "full-key tiebreaks; lift exact-integer cross-multiplied before "
    "one rounded division.",
    oracle="""
    WITH g AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM g),
    item AS (
      SELECT pk, CAST(count(*) AS BIGINT) AS c1 FROM g GROUP BY pk
    ),
    pair AS (
      SELECT a.pk AS part_a, b.pk AS part_b,
             CAST(count(*) AS BIGINT) AS support
      FROM g a JOIN g b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2
    )
    SELECT p.part_a, p.part_b, p.support,
           round(CAST(p.support * n.n_orders AS DOUBLE)
                 / (ia.c1 * ib.c1), 6) AS lift
    FROM pair p
    JOIN item ia ON ia.pk = p.part_a
    JOIN item ib ON ib.pk = p.part_b
    CROSS JOIN n
    WHERE p.support >= 2
    ORDER BY p.support DESC, p.part_a, p.part_b
    LIMIT 100
    """,
)
def mart_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    n = g.agg(F.countDistinct("ok").cast("long").alias("n_orders"))
    item = g.groupBy("pk").agg(F.count("*").cast("long").alias("c1"))
    a, b = g.alias("a"), g.alias("b")
    pair = (
        a.join(
            b,
            on=[F.col("a.ok") == F.col("b.ok"), F.col("a.pk") < F.col("b.pk")],
        )
        .groupBy(
            F.col("a.pk").alias("part_a"), F.col("b.pk").alias("part_b")
        )
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= 2)
    )
    ia = item.select(F.col("pk").alias("part_a"), F.col("c1").alias("ca"))
    ib = item.select(F.col("pk").alias("part_b"), F.col("c1").alias("cb"))
    return (
        pair.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "support",
            F.round(
                (F.col("support") * F.col("n_orders")).cast("double")
                / (F.col("ca") * F.col("cb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("support"), "part_a", "part_b")
        .limit(100)
    )


# --------------------------------------------------------------------------
# T2 — year-over-year supplier churn (set analytics per period)
# --------------------------------------------------------------------------
@query(
    "mart_supplier_churn",
    tier="T2",
    doc="Supplier-base churn per order year: active suppliers, NEW "
    "(absent the previous year), CHURNED (present previous year, "
    "absent now) — the audience-overlap mart, computed as set "
    "algebra on (year, supplier) grains: one distinct over the "
    "fact join, then the grain table full-outer-joins ITSELF shifted "
    "by one year on the supplier key. Cost after the grain dedup is "
    "O(|grains|) — years×suppliers, thousands of rows at any fact "
    "scale; the lineitem⋈orders grain build is the only fact-sized "
    "work (one shuffle, map-side pre-deduped).",
    oracle="""
    WITH g AS (
      SELECT DISTINCT CAST(year(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS yr,
             l.l_suppkey AS sk
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    j AS (
      SELECT coalesce(cur.yr, prv.yr + 1) AS yr,
             cur.sk AS cur_sk, prv.sk AS prv_sk
      FROM g cur
      FULL JOIN g prv ON prv.sk = cur.sk AND prv.yr = cur.yr - 1
    )
    SELECT yr,
           CAST(sum(CASE WHEN cur_sk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_active,
           CAST(sum(CASE WHEN cur_sk IS NOT NULL AND prv_sk IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           CAST(sum(CASE WHEN cur_sk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_churned
    FROM j
    WHERE yr <= (SELECT max(yr) FROM g)
    GROUP BY yr ORDER BY yr
    """,
)
def mart_supplier_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    # No forced broadcast on orders (fact-derived): AQE + the 64 MB
    # threshold broadcast its 2-column projection at bench scale; at
    # 100 TB this degrades to a shuffled fact-fact join, not a driver
    # OOM (VERDICT r3 #4).
    g = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.year(F.to_date("o_orderdate")).cast("long").alias("yr"),
            F.col("l_suppkey").alias("sk"),
        )
        .distinct()
        .persist()
    )
    max_yr = g.agg(F.max("yr")).collect()[0][0]
    cur, prv = g.alias("cur"), g.alias("prv")
    j = cur.join(
        prv,
        on=[
            F.col("prv.sk") == F.col("cur.sk"),
            F.col("prv.yr") == F.col("cur.yr") - 1,
        ],
        how="full",
    ).select(
        F.coalesce(F.col("cur.yr"), F.col("prv.yr") + 1).alias("yr"),
        F.col("cur.sk").alias("cur_sk"),
        F.col("prv.sk").alias("prv_sk"),
    )
    cnt = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("long")  # noqa: E731
    return (
        j.filter(F.col("yr") <= max_yr)
        .groupBy("yr")
        .agg(
            cnt(F.col("cur_sk").isNotNull()).alias("n_active"),
            cnt(
                F.col("cur_sk").isNotNull() & F.col("prv_sk").isNull()
            ).alias("n_new"),
            cnt(F.col("cur_sk").isNull()).alias("n_churned"),
        )
        .orderBy("yr")
    )


# --------------------------------------------------------------------------
# T2 — first-order Markov transition matrix over per-user event chains
# --------------------------------------------------------------------------
@query(
    "mart_markov_transitions",
    tier="T2",
    doc="First-order Markov transition counts/probabilities between "
    "event types: lag() over each user's exact (epoch-s·1e7+event_id) "
    "order pairs every event with its predecessor, one agg counts "
    "(prev→next) cells, and row probabilities divide by broadcast "
    "row totals (round-6). ONE shuffle on user_id for the lag, one "
    "tiny agg — the sequence-modeling prior every behavioral model "
    "starts from.",
    oracle="""
    WITH u AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT) * 10000000 + event_id
             ) AS prev_type
      FROM events
    ),
    c AS (
      SELECT prev_type, event_type AS next_type,
             CAST(count(*) AS BIGINT) AS n
      FROM u WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    ),
    r AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS row_n FROM c GROUP BY 1)
    SELECT c.prev_type, c.next_type, c.n,
           round(CAST(c.n AS DOUBLE) / r.row_n, 6) AS p
    FROM c JOIN r USING (prev_type)
    ORDER BY c.prev_type, c.next_type
    """,
)
def mart_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        (
            F.floor(F.unix_timestamp("ts")).cast("long") * 10000000
            + F.col("event_id")
        ).alias("u"),
    )
    w = Window.partitionBy("user_id").orderBy("u")
    c = (
        e.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").cast("long").alias("n"))
    )
    r = c.groupBy("prev_type").agg(F.sum("n").cast("long").alias("row_n"))
    return (
        c.join(F.broadcast(r), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("row_n"), 6).alias("p"),
        )
        .orderBy("prev_type", "next_type")
    )


# --------------------------------------------------------------------------
# T2 — Gini concentration of customer spend
# --------------------------------------------------------------------------
@query(
    "mart_gini_concentration",
    tier="T2",
    doc="Gini coefficient of customer spend — the inequality/"
    "concentration audit behind the ABC mart. Exact form: with spends "
    "x sorted ascending and ranked 1..n, G = (2·Σ i·xᵢ − (n+1)·Σxᵢ) "
    "/ (n·Σxᵢ) — numerator and denominator are exact DECIMAL "
    "integers off one window rank over the AGGREGATED per-customer "
    "series; one rounded division at the end. Fact scanned once for "
    "the per-customer agg.",
    oracle="""
    WITH s AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS spend_c
      FROM orders GROUP BY 1
    ),
    r AS (
      SELECT spend_c,
             CAST(row_number() OVER (ORDER BY spend_c, o_custkey) AS HUGEINT)
               AS rk
      FROM s
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(spend_c) AS BIGINT) / 100.0 AS total_spend,
           round(CAST(2 * sum(rk * spend_c) - (count(*) + 1) * sum(spend_c)
                      AS DOUBLE)
                 / (CAST(count(*) AS DOUBLE) * sum(spend_c)), 6) AS gini
    FROM r
    """,
)
def mart_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = "decimal(38,0)"
    s = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(cents("o_totalprice")).cast("long").alias("spend_c"))
    )
    w = Window.orderBy("spend_c", "o_custkey")
    r = s.select(
        "spend_c", F.row_number().over(w).cast(d).alias("rk")
    )
    num = (
        F.lit(2).cast(d) * F.sum(F.col("rk") * F.col("spend_c"))
        - (F.count("*").cast(d) + 1) * F.sum("spend_c").cast(d)
    )
    den = F.count("*").cast("double") * F.sum("spend_c").cast("double")
    return r.agg(
        F.count("*").cast("long").alias("n_customers"),
        (F.sum("spend_c").cast("long") / 100.0).alias("total_spend"),
        F.round(num.cast("double") / den, 6).alias("gini"),
    )


# --------------------------------------------------------------------------
# T2 — new vs returning customer mix per month
# --------------------------------------------------------------------------
@query(
    "mart_new_vs_returning",
    tier="T2",
    doc="Monthly order mix split by NEW (customer's first-ever order "
    "month) vs RETURNING — the acquisition/retention mart on top of "
    "the cumulative-users curve. First-order month via one min-agg "
    "per customer (map-side combined), broadcast back; the month "
    "rollup then needs no window. Exact month keys as yyyy-MM "
    "strings.",
    oracle="""
    WITH o AS (
      SELECT o_custkey, strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS mon,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
      FROM orders
    ),
    first_mon AS (
      SELECT o_custkey, min(mon) AS fmon FROM o GROUP BY 1
    )
    SELECT o.mon,
           CAST(sum(CASE WHEN o.mon = f.fmon THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new,
           CAST(sum(CASE WHEN o.mon <> f.fmon THEN 1 ELSE 0 END) AS BIGINT)
             AS n_returning,
           CAST(sum(CASE WHEN o.mon = f.fmon THEN price_c ELSE 0 END)
                AS BIGINT) / 100.0 AS new_revenue,
           CAST(sum(CASE WHEN o.mon <> f.fmon THEN price_c ELSE 0 END)
                AS BIGINT) / 100.0 AS returning_revenue
    FROM o JOIN first_mon f USING (o_custkey)
    GROUP BY o.mon ORDER BY o.mon
    """,
)
def mart_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM").alias("mon"),
        cents("o_totalprice").alias("price_c"),
    )
    first_mon = o.groupBy("o_custkey").agg(F.min("mon").alias("fmon"))
    # first_mon is CUSTOMER-cardinality — no hard broadcast pin (AQE
    # broadcasts it at bench scale; at 100 TB both sides shuffle once
    # on the shared customer key and co-partition).
    j = o.join(first_mon, "o_custkey")
    is_new = F.col("mon") == F.col("fmon")
    return (
        j.groupBy("mon")
        .agg(
            F.sum(F.when(is_new, 1).otherwise(0)).cast("long").alias("n_new"),
            F.sum(F.when(~is_new, 1).otherwise(0))
            .cast("long")
            .alias("n_returning"),
            (
                F.sum(F.when(is_new, F.col("price_c")).otherwise(0)).cast("long")
                / 100.0
            ).alias("new_revenue"),
            (
                F.sum(F.when(~is_new, F.col("price_c")).otherwise(0)).cast(
                    "long"
                )
                / 100.0
            ).alias("returning_revenue"),
        )
        .orderBy("mon")
    )


# --------------------------------------------------------------------------
# T2 — cohort lifetime-value triangle
# --------------------------------------------------------------------------
@query(
    "mart_cohort_ltv",
    tier="T2",
    doc="LTV triangle: customers cohorted by first-order month, "
    "cumulative spend per customer tracked by months-since-first "
    "(0..5) — retention's revenue twin and the payback-period mart. "
    "Exact integers end to end: cents spend, month offsets via "
    "integer month arithmetic, the cumulative sum a window over the "
    "(cohort, offset) AGGREGATED series. First-month agg broadcast "
    "back; one shuffle of the fact on the customer key.",
    oracle="""
    WITH o AS (
      SELECT o_custkey,
             CAST(year(CAST(o_orderdate AS DATE)) * 12
                  + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS monnum,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
      FROM orders
    ),
    f AS (SELECT o_custkey, min(monnum) AS cohort_mon FROM o GROUP BY 1),
    sz AS (SELECT cohort_mon, CAST(count(*) AS BIGINT) AS n_cust
           FROM f GROUP BY 1),
    m AS (
      SELECT f.cohort_mon, o.monnum - f.cohort_mon AS offset_m,
             CAST(sum(o.price_c) AS BIGINT) AS spend_c
      FROM o JOIN f USING (o_custkey)
      WHERE o.monnum - f.cohort_mon BETWEEN 0 AND 5
      GROUP BY 1, 2
    ),
    c AS (
      SELECT cohort_mon, offset_m,
             CAST(sum(spend_c) OVER (PARTITION BY cohort_mon
                  ORDER BY offset_m ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_spend_c
      FROM m
    )
    SELECT printf('%04d-%02d', c.cohort_mon // 12, c.cohort_mon % 12 + 1)
             AS cohort,
           c.offset_m,
           s.n_cust,
           round(CAST(c.cum_spend_c AS DOUBLE) / s.n_cust / 100.0, 2)
             AS cum_ltv
    FROM c JOIN sz s USING (cohort_mon)
    ORDER BY cohort, offset_m
    """,
)
def mart_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (
            F.year(F.to_date("o_orderdate")) * 12
            + F.month(F.to_date("o_orderdate"))
            - 1
        )
        .cast("long")
        .alias("monnum"),
        cents("o_totalprice").alias("price_c"),
    )
    f = o.groupBy("o_custkey").agg(F.min("monnum").alias("cohort_mon"))
    sz = f.groupBy("cohort_mon").agg(F.count("*").cast("long").alias("n_cust"))
    # f is CUSTOMER-cardinality — no hard broadcast pin (AQE decides at
    # bench scale; at 100 TB fact and cohort frames co-partition on the
    # customer key). sz stays pinned: it is #cohort-months rows.
    m = (
        o.join(f, "o_custkey")
        .withColumn("offset_m", F.col("monnum") - F.col("cohort_mon"))
        .filter(F.col("offset_m").between(0, 5))
        .groupBy("cohort_mon", "offset_m")
        .agg(F.sum("price_c").cast("long").alias("spend_c"))
    )
    w = (
        Window.partitionBy("cohort_mon")
        .orderBy("offset_m")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = m.select(
        "cohort_mon",
        "offset_m",
        F.sum("spend_c").over(w).cast("long").alias("cum_spend_c"),
    )
    return (
        c.join(F.broadcast(sz), "cohort_mon")
        .select(
            F.format_string(
                "%04d-%02d",
                F.expr("cohort_mon div 12"),
                (F.col("cohort_mon") % 12 + 1),
            ).alias("cohort"),
            "offset_m",
            "n_cust",
            F.round(
                F.col("cum_spend_c").cast("double") / F.col("n_cust") / 100.0,
                2,
            ).alias("cum_ltv"),
        )
        .orderBy("cohort", "offset_m")
    )


# --------------------------------------------------------------------------
# T2 — burst-rate audit (rate-limit / abuse screen)
# --------------------------------------------------------------------------
@query(
    "audit_burst_rate",
    tier="T2",
    doc="Rate audit: each user's busiest MINUTE (events in a tumbling "
    "60 s bucket; exact epoch-minute keys, busiest bucket via max_by "
    "with an earliest-minute tiebreak folded into the exact composite) "
    "plus a flag for exceeding 5 events/min — the abuse/rate-limit "
    "screen. Two map-side-combined aggs (minute grain, then per "
    "user); no windows, no joins.",
    oracle="""
    WITH m AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) // 60 AS minute_bucket,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(max(n) AS BIGINT) AS peak_per_min,
           CAST(min_by(minute_bucket, (10000000 - n) * 100000000 + minute_bucket)
                AS BIGINT) AS peak_minute,
           max(n) > 5 AS burst_flag
    FROM m GROUP BY user_id ORDER BY user_id
    """,
)
def audit_burst_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("cast(floor(unix_timestamp(ts)) as bigint) div 60").alias(
            "minute_bucket"
        ),
    )
    m = e.groupBy("user_id", "minute_bucket").agg(
        F.count("*").cast("long").alias("n")
    )
    # Busiest minute with deterministic earliest-minute tiebreak: one
    # composite min_by key (rank on -n, then minute). Arithmetic-packed
    # key bounds (the packing mis-orders outside them): n < 10^7 events
    # per user-minute (10^7/60 ≈ 167k events/s from ONE user — far past
    # any real rate limit) and minute_bucket < 10^8 (epoch minute 10^8
    # ≈ year 2160). Both are asserted cheaply by the max() aggregate
    # alongside: peak_per_min itself would surface an n overflow.
    comp = (F.lit(10000000) - F.col("n")) * 100000000 + F.col("minute_bucket")
    return (
        m.groupBy("user_id")
        .agg(
            F.max("n").cast("long").alias("peak_per_min"),
            F.min_by("minute_bucket", comp).cast("long").alias("peak_minute"),
            (F.max("n") > 5).alias("burst_flag"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# T2 — batch sessionization by inactivity gap
# --------------------------------------------------------------------------
@query(
    "mart_sessionize_gaps",
    tier="T2",
    doc="Batch sessionization: split each user's event stream into "
    "sessions at >30 min inactivity gaps (lag + running sum of "
    "session-start flags), then aggregate one row per session. The "
    "batch twin of the streaming session_window query — same "
    "semantics, replayable on history. Scale: BOTH windows partition "
    "by user_id (no global window anywhere), so the whole query is "
    "one shuffle on the user key followed by partition-local window "
    "evaluation + a map-side-combinable agg on (user, session). "
    "Ordering carries the event_id tiebreak (catalog doctrine: µs "
    "truncation can tie timestamps).",
    oracle="""
    WITH a AS (
      SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM events
    ),
    l AS (
      SELECT user_id, event_id, ts_s,
             lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id)
               AS prev_s
      FROM a
    ),
    f AS (
      SELECT user_id, event_id, ts_s,
             CASE WHEN prev_s IS NULL OR ts_s - prev_s > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM l
    ),
    s AS (
      SELECT user_id, ts_s,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM f
    )
    SELECT user_id,
           CAST(session_seq AS BIGINT) AS session_seq,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(ts_s) AS BIGINT) AS start_s,
           CAST(max(ts_s) AS BIGINT) AS end_s,
           CAST(max(ts_s) - min(ts_s) AS BIGINT) AS duration_s
    FROM s GROUP BY 1, 2
    ORDER BY user_id, session_seq
    """,
)
def mart_sessionize_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("ts_s"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    flagged = e.withColumn(
        "is_new",
        F.when(
            F.lag("ts_s").over(w).isNull()
            | ((F.col("ts_s") - F.lag("ts_s").over(w)) > 1800),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", F.col("session_seq").cast("long").alias("session_seq"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("ts_s").cast("long").alias("start_s"),
            F.max("ts_s").cast("long").alias("end_s"),
            (F.max("ts_s") - F.min("ts_s")).cast("long").alias("duration_s"),
        )
        .orderBy("user_id", "session_seq")
    )


# --------------------------------------------------------------------------
# T2 — distributed prefix sum (running revenue over the full fact scan)
# --------------------------------------------------------------------------
@query(
    "mart_cumulative_revenue_scan",
    tier="T2",
    doc="Running revenue total over EVERY order, ordered by "
    "(order date, key) — computed with the two-phase distributed "
    "prefix sum (operators/prefix.py: range-partition on the order, "
    "partition-LOCAL running sums in parallel, driver prefix over the "
    "per-partition totals, broadcast offsets back). This is the scale "
    "path the catalog's pre-aggregated cumulative queries document: "
    "no single-partition window ever touches the fact-sized series "
    "(plan-pinned in tests/test_plans.py). Revenue in exact cents; "
    "output sampled to every 100th order key AFTER the scan so the "
    "result stays checkable while the cumsum covers all rows.",
    oracle="""
    WITH r AS (
      SELECT o_orderkey,
             CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  OVER (ORDER BY CAST(o_orderdate AS DATE), o_orderkey
                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS running_revenue_c
      FROM orders
    )
    SELECT o_orderkey, order_date, running_revenue_c
    FROM r WHERE o_orderkey % 100 = 0
    ORDER BY o_orderkey
    """,
)
def mart_cumulative_revenue_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import distributed_cumsum

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.to_date("o_orderdate").cast("string").alias("order_date"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("rev_c"),
    )
    out = distributed_cumsum(
        o,
        order_cols=["order_date", "o_orderkey"],
        value_col="rev_c",
        out_col="running_revenue_c",
    )
    return (
        out.filter(F.col("o_orderkey") % 100 == 0)
        .select("o_orderkey", "order_date", "running_revenue_c")
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# T2 — point-in-time (PIT) lookup against SCD2 validity intervals
# --------------------------------------------------------------------------
@query(
    "scd2_point_in_time",
    tier="T2",
    doc="Point-in-time correctness: for one probe instant per user "
    "(the integer midpoint of their activity span), return the "
    "attribute version valid AT that instant from the SCD2 intervals "
    "— the lookup every feature-store/backtest pipeline needs (using "
    "today's attribute for yesterday's prediction is label leakage). "
    "The validity predicate (valid_from ≤ t < valid_to, open-ended "
    "tip) rides the user-key EQUI-join as a residual filter — never a "
    "cross/range join — so fan-out is bounded by versions-per-user. "
    "Exactly one interval matches each probe by construction "
    "(intervals partition the span, zero-length same-second intervals "
    "self-exclude). Probes are exact integer midpoints (div 2).",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS value_c,
             CAST(floor(epoch(ts)) AS BIGINT) AS valid_from_s,
             lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
               PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id
             ) AS valid_to_s
      FROM events
    ),
    p AS (
      SELECT user_id,
             (min(CAST(floor(epoch(ts)) AS BIGINT))
              + max(CAST(floor(epoch(ts)) AS BIGINT))) // 2 AS probe_s
      FROM events GROUP BY user_id
    )
    SELECT p.user_id, p.probe_s,
           iv.event_type AS type_at, iv.value_c AS value_at_c
    FROM p JOIN iv ON iv.user_id = p.user_id
     AND iv.valid_from_s <= p.probe_s
     AND (iv.valid_to_s IS NULL OR p.probe_s < iv.valid_to_s)
    ORDER BY p.user_id
    """,
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        cents("value").alias("value_c"),
        F.unix_timestamp("ts").cast("long").alias("ts_s"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    iv = e.select(
        F.col("user_id").alias("iv_user"),
        "event_type",
        "value_c",
        F.col("ts_s").alias("valid_from_s"),
        F.lead("ts_s").over(w).alias("valid_to_s"),
    )
    p = e.groupBy("user_id").agg(
        F.expr("(min(ts_s) + max(ts_s)) div 2").alias("probe_s")
    )
    return (
        p.join(
            iv,
            (F.col("iv_user") == F.col("user_id"))
            & (F.col("valid_from_s") <= F.col("probe_s"))
            & (
                F.col("valid_to_s").isNull()
                | (F.col("probe_s") < F.col("valid_to_s"))
            ),
        )
        .select(
            "user_id",
            "probe_s",
            F.col("event_type").alias("type_at"),
            F.col("value_c").alias("value_at_c"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# T2 — marketing attribution (last-touch within a lookback window)
# --------------------------------------------------------------------------
@query(
    "mart_attribution_last_touch",
    tier="T2",
    doc="Last-touch attribution: every purchase is credited to the "
    "same user's most recent click strictly before it, if that click "
    "is within a 7-day lookback — the standard marketing-attribution "
    "mart. ONE shuffle on user_id, then a running max(click composite) "
    "window (ROWS ... 1 PRECEDING for the strictness) carries the "
    "last-click identity to each purchase row; the composite "
    "epoch-s*1e7+event_id key packs time AND identity so one window "
    "answers both 'when' and 'which click' (bounds: event_id < 1e7 — "
    "catalog packing doctrine, see audit_burst_rate). Scan prunes to "
    "the two event types before the shuffle.",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
             CAST(floor(epoch(ts)) AS BIGINT) * 10000000 + event_id AS comp
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    w AS (
      SELECT user_id, event_id, event_type, ts_s,
             max(CASE WHEN event_type = 'click' THEN comp END) OVER (
               PARTITION BY user_id ORDER BY comp
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS last_click_comp
      FROM e
    )
    SELECT event_id AS purchase_id, user_id,
           CASE WHEN last_click_comp IS NOT NULL
                 AND ts_s - last_click_comp // 10000000 <= 604800
                THEN last_click_comp % 10000000 END AS click_id,
           CASE WHEN last_click_comp IS NOT NULL
                 AND ts_s - last_click_comp // 10000000 <= 604800
                THEN ts_s - last_click_comp // 10000000 END AS gap_s
    FROM w WHERE event_type = 'purchase'
    ORDER BY purchase_id
    """,
)
def mart_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_timestamp("ts").cast("long").alias("ts_s"),
        )
        .withColumn(
            "comp", F.col("ts_s") * F.lit(10000000) + F.col("event_id")
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("comp")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("comp"))
    ).over(w)
    # Reference the MATERIALIZED column, not the window expression —
    # re-using `last_click` here would re-evaluate the window over the
    # already-filtered (purchases-only) rows, where no click exists.
    attributed = F.col("last_click_comp").isNotNull() & (
        F.col("ts_s") - F.expr("last_click_comp div 10000000") <= 604800
    )
    return (
        e.withColumn("last_click_comp", last_click)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.when(
                attributed, F.col("last_click_comp") % 10000000
            ).alias("click_id"),
            F.when(
                attributed,
                F.col("ts_s") - F.expr("last_click_comp div 10000000"),
            ).alias("gap_s"),
        )
        .orderBy("purchase_id")
    )


# --------------------------------------------------------------------------
# T2 — incremental SCD2 rebuild (MERGE-scoped recompute)
# --------------------------------------------------------------------------
@query(
    "scd2_incremental_rebuild",
    tier="T2",
    doc="Incremental SCD2 maintenance: a change batch (events at or "
    "after the 80%-span watermark T) arrives against the stored "
    "pre-T interval table; ONLY the touched users' histories are "
    "rebuilt (semi-join prune), untouched users' stored intervals "
    "pass through unread (anti-join), and the union provably equals "
    "a full-history rebuild — the oracle IS the full rebuild. This "
    "is the MERGE-scoped recompute every warehouse dimension load "
    "runs: cost O(|touched histories| + passthrough), never "
    "O(|history|) recompute. T derives from min/max epoch seconds by "
    "exact integer arithmetic; both interval builds use the lead() "
    "window with the (ts_s, event_id) unique order.",
    oracle="""
    SELECT user_id, event_id, event_type,
           CAST(round(value * 100) AS BIGINT) AS value_c,
           CAST(floor(epoch(ts)) AS BIGINT) AS valid_from_s,
           lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
             PARTITION BY user_id
             ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id
           ) AS valid_to_s
    FROM events
    ORDER BY user_id, valid_from_s, event_id
    """,
)
def scd2_incremental_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        cents("value").alias("value_c"),
        F.unix_timestamp("ts").cast("long").alias("ts_s"),
    )
    # Watermark T at 80% of the event-time span — control-plane
    # scalars (one min/max agg), exact integer arithmetic so the
    # oracle-side split replays identically.
    lo, hi = e.agg(F.min("ts_s"), F.max("ts_s")).collect()[0]
    t_split = lo + ((hi - lo) * 4) // 5

    def intervals(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
        return df.select(
            "user_id",
            "event_id",
            "event_type",
            "value_c",
            F.col("ts_s").alias("valid_from_s"),
            F.lead("ts_s").over(w).alias("valid_to_s"),
        )

    # Stored state: the pre-T interval table (in production a table on
    # disk; recomputed here only because the gate needs a closed form).
    base = intervals(e.filter(F.col("ts_s") < t_split))
    touched = e.filter(F.col("ts_s") >= t_split).select("user_id").distinct()
    # Untouched users: stored intervals pass through byte-for-byte.
    passthrough = base.join(touched, "user_id", "left_anti")
    # Touched users: rebuild from their FULL history (semi-join prune
    # keeps the recompute proportional to the touched slice).
    rebuilt = intervals(e.join(touched, "user_id", "left_semi"))
    return passthrough.unionByName(rebuilt).orderBy(
        "user_id", "valid_from_s", "event_id"
    )


# --------------------------------------------------------------------------
# T2 — gaps-and-islands: longest consecutive-day activity streak
# --------------------------------------------------------------------------
@query(
    "mart_longest_streak",
    tier="T2",
    doc="Gaps-and-islands: each user's longest run of CONSECUTIVE "
    "active days — the engagement-streak mart. The classic rewrite: "
    "reduce to distinct (user, epoch-day) grains, then island_id = "
    "day - row_number() per user (consecutive days share a constant "
    "difference), one agg per (user, island), max per user. Two "
    "shuffles, BOTH keyed on user_id (grain distinct, then the "
    "window+aggs ride the same partitioning — exchange-free after "
    "the first); never a self-join on dates. Days are exact "
    "epoch-day integers (UTC floor).",
    oracle="""
    WITH g AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_no
      FROM events
    ),
    isl AS (
      SELECT user_id, day_no,
             day_no - row_number() OVER (PARTITION BY user_id
                                         ORDER BY day_no) AS island
      FROM g
    ),
    runs AS (
      SELECT user_id, island, CAST(count(*) AS BIGINT) AS run_len
      FROM isl GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(max(run_len) AS BIGINT) AS longest_streak_days,
           CAST(sum(run_len) AS BIGINT) AS n_active_days
    FROM runs GROUP BY user_id ORDER BY user_id
    """,
)
def mart_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr(
                "cast(floor(unix_timestamp(ts)) as bigint) div 86400"
            ).alias("day_no"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day_no")
    runs = (
        g.withColumn("island", F.col("day_no") - F.row_number().over(w))
        .groupBy("user_id", "island")
        .agg(F.count("*").cast("long").alias("run_len"))
    )
    return (
        runs.groupBy("user_id")
        .agg(
            F.max("run_len").cast("long").alias("longest_streak_days"),
            F.sum("run_len").cast("long").alias("n_active_days"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# T2 — cross-replica table checksum (anti-entropy audit)
# --------------------------------------------------------------------------
@query(
    "audit_table_checksum",
    tier="T2",
    doc="Cross-replica anti-entropy checksum: every orders row folds "
    "to an md5 over its canonicalized fields (exact cents, epoch-day "
    "date — raw doubles/timestamps would never agree across "
    "engines; each field COALESCEs to an explicit null sentinel "
    "before joining, because a concat that silently drops NULLs "
    "lets shifted fields collide — the corruption a checksum exists "
    "to catch), rows bucket by hash(pk) % 64, and each bucket emits "
    "count + a COMMUTATIVE checksum: bit_xor of the md5's "
    "leading-12-hex int — XOR is order- AND grouping-insensitive with "
    "NO overflow at any row count (a 48-bit SUM would overflow int64 "
    "past ~32k rows/bucket); the count column covers XOR's one blind "
    "spot (duplicated row pairs cancel). Two replicas compare 64 rows instead of the table; a "
    "mismatched bucket narrows re-sync to 1/64 of the keys — the "
    "Merkle-lite shape of every replica-repair protocol. One scan, "
    "one map-side-combined agg; at 100 TB buckets scale to 2^k with "
    "the same plan.",
    oracle="""
    WITH r AS (
      SELECT o_orderkey % 64 AS bucket,
             CAST(('0x' || substring(md5(
               coalesce(CAST(o_orderkey AS VARCHAR), '<null>') || '|' ||
               coalesce(CAST(o_custkey AS VARCHAR), '<null>') || '|' ||
               coalesce(o_orderstatus, '<null>') || '|' ||
               coalesce(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                             AS VARCHAR), '<null>') || '|' ||
               coalesce(CAST(CAST(floor(epoch(o_orderdate)) AS BIGINT)
                             // 86400 AS VARCHAR), '<null>')
             ), 1, 12)) AS BIGINT) AS h
      FROM orders
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(h) AS BIGINT) AS checksum
    FROM r GROUP BY bucket ORDER BY bucket
    """,
)
def audit_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # concat_ws silently SKIPS nulls (shifting later fields into
    # earlier positions) — coalesce each field to a sentinel so a null
    # is a distinct, position-stable value, matching the oracle's
    # null-propagating '||' with the same coalesces.
    sent = F.lit("<null>")
    canon = F.concat_ws(
        "|",
        F.coalesce(F.col("o_orderkey").cast("string"), sent),
        F.coalesce(F.col("o_custkey").cast("string"), sent),
        F.coalesce(F.col("o_orderstatus"), sent),
        F.coalesce(cents("o_totalprice").cast("string"), sent),
        F.coalesce(
            F.expr(
                "cast(cast(floor(unix_timestamp(o_orderdate)) as bigint)"
                " div 86400 as string)"
            ),
            sent,
        ),
    )
    h = F.conv(F.substring(F.md5(canon), 1, 12), 16, 10).cast("long")
    return (
        o.select((F.col("o_orderkey") % 64).alias("bucket"), h.alias("h"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.expr("bit_xor(h)").cast("long").alias("checksum"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# T2 — item-item recommendations (co-occurrence cosine, top-k per item)
# --------------------------------------------------------------------------
@query(
    "mart_item_recs_topk",
    tier="T2",
    doc="Item-item collaborative filtering: co-purchase counts become "
    "cosine scores n_ab / sqrt(n_a·n_b) and every part gets its top-3 "
    "most-associated parts — the 'customers also bought' mart, and "
    "the batch shape of every item-CF recommender. Pair generation is "
    "the bounded within-order self-join (Σ items²/order, one shuffle "
    "on the order key — market-basket's plan); item totals broadcast "
    "back; per-item top-3 rides WindowGroupLimit after the pair set "
    "UNIONS both directions. Cosine rounds at 6 dp (continuous) with "
    "a rec-partkey tiebreak; counts stay exact BIGINTs. Cost "
    "profile: 3.20 s at sf0.1 (BENCH_r07) — the wall is the "
    "Σ items²/order pair mass (~25 items/order at TPC-H shape) "
    "through one shuffle plus the doubled-pair window, inherent to "
    "item-CF, not a plan miss; watchlist, compare round over round.",
    oracle="""
    WITH po AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    pairs AS (
      SELECT a.pk AS pa, b.pk AS pb, CAST(count(*) AS BIGINT) AS n_ab
      FROM po a JOIN po b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2
    ),
    ic AS (SELECT pk, CAST(count(*) AS BIGINT) AS n FROM po GROUP BY 1),
    sym AS (
      SELECT pa AS item, pb AS rec, n_ab FROM pairs
      UNION ALL
      SELECT pb AS item, pa AS rec, n_ab FROM pairs
    ),
    scored AS (
      SELECT s.item, s.rec, s.n_ab,
             round(CAST(s.n_ab AS DOUBLE)
                   / sqrt(CAST(ia.n AS DOUBLE) * CAST(ib.n AS DOUBLE)), 6)
               AS cos_sim
      FROM sym s
      JOIN ic ia ON ia.pk = s.item
      JOIN ic ib ON ib.pk = s.rec
    ),
    r AS (
      SELECT item, rec, n_ab, cos_sim,
             row_number() OVER (PARTITION BY item
                                ORDER BY cos_sim DESC, rec) AS rk
      FROM scored
    )
    SELECT item, CAST(rk AS BIGINT) AS rk, rec, n_ab, cos_sim
    FROM r WHERE rk <= 3
    ORDER BY item, rk
    """,
)
def mart_item_recs_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pair build: one fact groupBy to per-order part sets + row-local
    # ordered-pair explosion (bounded basket size — the triangle-count
    # edge-build lesson; the former self-join shuffled the fact twice
    # and sorted both sides).
    grp = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .groupBy("ok")
        .agg(F.array_sort(F.collect_set("pk")).alias("ps"))
        .persist()
    )
    pairs = (
        grp.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), "
                    "y -> struct(x as pa, y as pb))))"
                )
            ).alias("p")
        )
        .groupBy("p.pa", "p.pb")
        .agg(F.count("*").cast("long").alias("n_ab"))
    )
    ic = grp.select(F.explode("ps").alias("pk")).groupBy("pk").agg(
        F.count("*").cast("long").alias("n")
    )
    # Symmetrize AFTER the pair aggregation with a row-local 2-way
    # explode — a union of two pairs-projections would re-run the
    # whole pair groupBy once per branch (the subtree is unpersisted).
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("pa").alias("item"),
                    F.col("pb").alias("rec"),
                    F.col("n_ab").alias("n_ab"),
                ),
                F.struct(
                    F.col("pb").alias("item"),
                    F.col("pa").alias("rec"),
                    F.col("n_ab").alias("n_ab"),
                ),
            )
        ).alias("s")
    ).select("s.item", "s.rec", "s.n_ab")
    ia = ic.select(F.col("pk").alias("item"), F.col("n").alias("n_i"))
    ib = ic.select(F.col("pk").alias("rec"), F.col("n").alias("n_r"))
    scored = (
        sym.join(F.broadcast(ia), "item")
        .join(F.broadcast(ib), "rec")
        .select(
            "item",
            "rec",
            "n_ab",
            F.round(
                F.col("n_ab").cast("double")
                / F.sqrt(F.col("n_i").cast("double") * F.col("n_r").cast("double")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("item").orderBy(F.desc("cos_sim"), "rec")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("item", "rk", "rec", "n_ab", "cos_sim")
        .orderBy("item", "rk")
    )


# --------------------------------------------------------------------------
# T2 — rapid-repeat-order audit (same payer, close in time, price delta)
# --------------------------------------------------------------------------
@query(
    "audit_duplicate_payments",
    tier="T2",
    doc="Double-charge screen: pairs of orders from the SAME customer "
    "placed within 7 days of each other, with the exact-cents price "
    "delta — the accounts-payable audit every finance warehouse "
    "runs (a zero/near-zero delta on a tight gap is the refund-or-"
    "double-bill candidate). The pair join is an EQUI-join on the "
    "customer key — fan-out is bounded by orders-per-customer "
    "within the window (Sigma n^2 per customer, ~10 orders/customer "
    "in this schema; hot payers get the standard salting treatment "
    "at scale) — with the day-window and key-order predicates as "
    "residuals; never a date-range join. One shuffle on the "
    "customer key; all arithmetic in exact cents / epoch days. "
    "Parity: reference audits clean rows per-file "
    "(load_warehouse.py:120); this is the cross-row temporal twin.",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
             CAST(CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400
                  AS BIGINT) AS day_no
      FROM orders
    )
    SELECT a.o_custkey AS custkey,
           a.o_orderkey AS order_a, b.o_orderkey AS order_b,
           CAST(abs(a.day_no - b.day_no) AS BIGINT) AS gap_days,
           CAST(abs(a.price_c - b.price_c) AS BIGINT) AS price_delta_c
    FROM o a JOIN o b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND abs(a.day_no - b.day_no) <= 7
    ORDER BY custkey, order_a, order_b
    """,
)
def audit_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        cents("o_totalprice").alias("price_c"),
        F.expr(
            "cast(cast(floor(unix_timestamp(o_orderdate)) as bigint)"
            " div 86400 as bigint)"
        ).alias("day_no"),
    )
    a, b = o.alias("a"), o.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (
                F.abs(F.col("a.day_no") - F.col("b.day_no")) <= 7
            ),
        )
        .select(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.o_orderkey").alias("order_a"),
            F.col("b.o_orderkey").alias("order_b"),
            F.abs(F.col("a.day_no") - F.col("b.day_no"))
            .cast("long")
            .alias("gap_days"),
            F.abs(F.col("a.price_c") - F.col("b.price_c"))
            .cast("long")
            .alias("price_delta_c"),
        )
        .orderBy("custkey", "order_a", "order_b")
    )


# --------------------------------------------------------------------------
# Repeat-purchase cadence (windowless per-customer order-gap profile)
# --------------------------------------------------------------------------
@query(
    "mart_repeat_interval_median",
    tier="T2",
    doc="Per-customer repeat-purchase cadence for customers with >= 3 "
    "orders: gaps in days between consecutive orders, reported as "
    "(n_orders, min/median/max gap). WINDOWLESS by design: order "
    "dates collect into a per-customer array (bounded by the per-"
    "customer order count — tens, not fact-scale), are sorted row-"
    "locally, and gaps + the lower median are exact integer array "
    "ops — no lag window, no per-customer sort shuffle beyond the "
    "one groupBy. The scale shape for billions of customers: one "
    "map-side-combinable agg keyed on the high-cardinality customer "
    "key, then row-local compute.",
    oracle="""
    WITH g AS (
      SELECT o_custkey AS custkey,
             list_sort(list(CAST(o_orderdate AS DATE))) AS ds
      FROM orders GROUP BY 1 HAVING count(*) >= 3
    ),
    x AS (
      SELECT custkey,
             CAST(len(ds) AS BIGINT) AS n_orders,
             list_sort([CAST(date_diff('day', ds[i], ds[i + 1]) AS BIGINT)
                        for i in generate_series(1, len(ds) - 1)]) AS gaps
      FROM g
    )
    SELECT custkey, n_orders,
           gaps[1] AS min_gap_days,
           gaps[CAST((len(gaps) + 1) // 2 AS INT)] AS median_gap_days,
           gaps[CAST(len(gaps) AS INT)] AS max_gap_days
    FROM x
    ORDER BY custkey
    """,
)
def mart_repeat_interval_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.to_date("o_orderdate").alias("od"),
    )
    g = (
        o.groupBy("custkey")
        .agg(F.array_sort(F.collect_list("od")).alias("ds"))
        .filter(F.size("ds") >= 3)
    )
    x = g.select(
        "custkey",
        F.size("ds").cast("long").alias("n_orders"),
        F.array_sort(
            F.expr(
                "transform(slice(ds, 1, size(ds) - 1), "
                "(d, i) -> cast(datediff(ds[i + 1], d) as bigint))"
            )
        ).alias("gaps"),
    )
    return x.select(
        "custkey",
        "n_orders",
        F.element_at("gaps", 1).alias("min_gap_days"),
        F.expr(
            "element_at(gaps, cast((size(gaps) + 1) div 2 as int))"
        ).alias("median_gap_days"),
        F.element_at("gaps", F.size("gaps")).alias("max_gap_days"),
    ).orderBy("custkey")


# --------------------------------------------------------------------------
# Freshness audit (per-stream ingestion lag)
# --------------------------------------------------------------------------
@query(
    "audit_freshness_lag",
    tier="T2",
    doc="Data-freshness audit: per event type, the latest event time "
    "vs the table-wide high-water mark — the staleness screen every "
    "warehouse runs before trusting a partition (a stream whose "
    "latest event trails the global max by hours is late or dead). "
    "Exact epoch-second integers; one map-side-combined agg + one "
    "1-row broadcast back; flags streams lagging > 1 hour.",
    oracle="""
    WITH s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(max(floor(epoch(ts))) AS BIGINT) AS latest_s
      FROM events GROUP BY 1
    ),
    g AS (SELECT CAST(max(latest_s) AS BIGINT) AS hwm_s FROM s)
    SELECT s.event_type, s.n_events, s.latest_s,
           CAST(g.hwm_s - s.latest_s AS BIGINT) AS lag_s,
           (g.hwm_s - s.latest_s) > 3600 AS stale_flag
    FROM s CROSS JOIN g
    ORDER BY event_type
    """,
)
def audit_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("es"),
    )
    s = e.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.max("es").cast("long").alias("latest_s"),
    )
    g = s.agg(F.max("latest_s").cast("long").alias("hwm_s"))
    return (
        s.crossJoin(F.broadcast(g))
        .select(
            "event_type",
            "n_events",
            "latest_s",
            (F.col("hwm_s") - F.col("latest_s")).cast("long").alias("lag_s"),
            ((F.col("hwm_s") - F.col("latest_s")) > 3600).alias("stale_flag"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# T2 — linear multi-touch attribution (complement of last-touch)
# --------------------------------------------------------------------------
@query(
    "mart_attribution_linear",
    tier="T2",
    doc="Linear multi-touch attribution: every purchase's credit is "
    "split equally across ALL of the same user's clicks strictly "
    "before it within a 7-day lookback (the equal-weight complement of "
    "mart_attribution_last_touch). ONE shuffle: both event types are "
    "pruned before the user_id equi-join (the time band rides as a "
    "post-join residual on the sort-merge join); the per-purchase "
    "touch count then comes from a window partitioned by (user_id, "
    "purchase_id) — hash distribution on user_id already CLUSTERS "
    "those keys, so EnsureRequirements inserts only a sort, never a "
    "second exchange. Credit is an exact integer micro-weight "
    "(1000000 DIV n), so rows are engine-deterministic without any "
    "float fold.",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    c AS (SELECT user_id, event_id AS click_id, ts_s AS cts FROM e
          WHERE event_type = 'click'),
    p AS (SELECT user_id, event_id AS purchase_id, ts_s AS pts FROM e
          WHERE event_type = 'purchase'),
    j AS (
      SELECT p.user_id, p.purchase_id, c.click_id
      FROM p JOIN c ON p.user_id = c.user_id
       AND c.cts < p.pts AND p.pts - c.cts <= 604800
    )
    SELECT purchase_id, click_id,
           CAST(count(*) OVER (PARTITION BY purchase_id) AS BIGINT)
             AS n_touches,
           CAST(1000000 AS BIGINT)
             // count(*) OVER (PARTITION BY purchase_id) AS weight_e6
    FROM j
    ORDER BY purchase_id, click_id
    """,
)
def mart_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_timestamp("ts").cast("long").alias("ts_s"),
        )
    )
    c = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"),
        F.col("ts_s").alias("cts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        F.col("ts_s").alias("pts"),
    )
    j = p.join(
        c,
        (p["user_id"] == c["user_id"])
        & (c["cts"] < p["pts"])
        & (p["pts"] - c["cts"] <= 604800),
    ).select(p["user_id"], "purchase_id", "click_id")
    # (user_id, purchase_id) partition spec: the join output's hash
    # distribution on user_id already satisfies the window's clustered
    # distribution — sort-only, no second exchange (plan-pinned).
    w = Window.partitionBy("user_id", "purchase_id")
    n = F.count("*").over(w).cast("long")
    return (
        j.select(
            "purchase_id",
            "click_id",
            n.alias("n_touches"),
            F.expr("CAST(1000000 AS BIGINT)").alias("_w"),
        )
        .withColumn("weight_e6", F.expr("_w div n_touches"))
        .drop("_w")
        .orderBy("purchase_id", "click_id")
    )


# --------------------------------------------------------------------------
# T2 — RFM customer segmentation (threshold form, not ntile)
# --------------------------------------------------------------------------
@query(
    "mart_rfm_segments",
    tier="T2",
    doc="RFM segmentation: per customer, Recency (days from last order "
    "to the corpus high-water date), Frequency (order count), Monetary "
    "(exact cents total), each scored 1-4 against the metric's global "
    "quartile THRESHOLDS (percentile_disc 0.25/0.5/0.75). The "
    "threshold form is deliberate: ntile(4) is a GLOBAL window over "
    "all customers (the single-partition trap at 100 TB) and splits "
    "ties arbitrarily across buckets; thresholds are three 1-row "
    "control-plane scalars broadcast back (catalog budget class), the "
    "scoring is row-local, and equal metrics always land in the same "
    "bucket in both engines. percentile_disc on integers is exact — "
    "no interpolated float crosses the wire. One shuffle total (the "
    "per-customer agg); the quartile agg and the CASE ladder reuse it.",
    oracle="""
    WITH hw AS (
      SELECT CAST(max(CAST(o_orderdate AS DATE)) AS DATE) AS hwd
      FROM orders
    ),
    rfm AS (
      SELECT o_custkey AS c_custkey,
             CAST(date_diff('day', max(CAST(o_orderdate AS DATE)),
                            (SELECT hwd FROM hw)) AS BIGINT) AS recency_d,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS monetary_c
      FROM orders GROUP BY 1
    ),
    q AS (
      SELECT
        percentile_disc(0.25) WITHIN GROUP (ORDER BY recency_d) AS r1,
        percentile_disc(0.50) WITHIN GROUP (ORDER BY recency_d) AS r2,
        percentile_disc(0.75) WITHIN GROUP (ORDER BY recency_d) AS r3,
        percentile_disc(0.25) WITHIN GROUP (ORDER BY frequency) AS f1,
        percentile_disc(0.50) WITHIN GROUP (ORDER BY frequency) AS f2,
        percentile_disc(0.75) WITHIN GROUP (ORDER BY frequency) AS f3,
        percentile_disc(0.25) WITHIN GROUP (ORDER BY monetary_c) AS m1,
        percentile_disc(0.50) WITHIN GROUP (ORDER BY monetary_c) AS m2,
        percentile_disc(0.75) WITHIN GROUP (ORDER BY monetary_c) AS m3
      FROM rfm
    )
    SELECT c_custkey, recency_d, frequency, monetary_c,
           -- low recency is GOOD: score runs 4 (freshest quartile) to 1
           CAST(CASE WHEN recency_d <= q.r1 THEN 4
                     WHEN recency_d <= q.r2 THEN 3
                     WHEN recency_d <= q.r3 THEN 2 ELSE 1 END AS BIGINT)
             AS r_score,
           CAST(CASE WHEN frequency <= q.f1 THEN 1
                     WHEN frequency <= q.f2 THEN 2
                     WHEN frequency <= q.f3 THEN 3 ELSE 4 END AS BIGINT)
             AS f_score,
           CAST(CASE WHEN monetary_c <= q.m1 THEN 1
                     WHEN monetary_c <= q.m2 THEN 2
                     WHEN monetary_c <= q.m3 THEN 3 ELSE 4 END AS BIGINT)
             AS m_score
    FROM rfm, q
    ORDER BY c_custkey
    """,
)
def mart_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("od"),
        cents("o_totalprice").alias("price_c"),
    )
    rfm = (
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max("od").alias("last_od"),
            F.count("*").cast("long").alias("frequency"),
            F.sum("price_c").cast("long").alias("monetary_c"),
        )
        .persist()
    )
    # High-water date off the per-customer aggregate (max of maxes ==
    # global max) — the fact is scanned ONCE; hw reads the cache.
    hw = rfm.agg(F.max("last_od").alias("hwd"))
    rfm = (
        rfm.crossJoin(F.broadcast(hw))
        .select(
            "c_custkey",
            F.datediff("hwd", "last_od").cast("long").alias("recency_d"),
            "frequency",
            "monetary_c",
        )
        .persist()
    )
    q = rfm.agg(
        *[
            F.expr(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY {m})"
            ).alias(f"{m[0]}{i}")
            for m in ("recency_d", "frequency", "monetary_c")
            for i, p in ((1, 0.25), (2, 0.50), (3, 0.75))
        ]
    )
    score_r = (
        F.when(F.col("recency_d") <= F.col("r1"), 4)
        .when(F.col("recency_d") <= F.col("r2"), 3)
        .when(F.col("recency_d") <= F.col("r3"), 2)
        .otherwise(1)
        .cast("long")
    )
    score_f = (
        F.when(F.col("frequency") <= F.col("f1"), 1)
        .when(F.col("frequency") <= F.col("f2"), 2)
        .when(F.col("frequency") <= F.col("f3"), 3)
        .otherwise(4)
        .cast("long")
    )
    score_m = (
        F.when(F.col("monetary_c") <= F.col("m1"), 1)
        .when(F.col("monetary_c") <= F.col("m2"), 2)
        .when(F.col("monetary_c") <= F.col("m3"), 3)
        .otherwise(4)
        .cast("long")
    )
    return (
        rfm.crossJoin(F.broadcast(q))
        .select(
            "c_custkey",
            "recency_d",
            "frequency",
            "monetary_c",
            score_r.alias("r_score"),
            score_f.alias("f_score"),
            score_m.alias("m_score"),
        )
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# Pareto skyline (2-D dominance frontier) via the distributed scan
# --------------------------------------------------------------------------
@query(
    "mart_skyline_revenue_qty",
    tier="T2",
    doc="2-D Pareto skyline over per-part aggregates: the (revenue, "
    "quantity) pairs no other part strictly dominates (>= on both "
    "dimensions, > on at least one). Multi-objective top-k — 'best' "
    "parts when neither metric alone decides. Scale shape: the naive "
    "skyline is an all-pairs dominance test; sorted by (rev DESC, "
    "qty DESC) over DISTINCT pairs, a pair is dominated IFF the "
    "EXCLUSIVE running max of qty reaches its own qty — so the whole "
    "frontier is one distributed two-phase running-max scan "
    "(operators/prefix.py distributed_running_max_exclusive: "
    "range-exchange + partition-local window + control-plane "
    "prefix-max + broadcast join; never a single-partition window "
    "over the pair table). Distinct-pair pre-grouping makes the "
    "strictness argument exact: among distinct pairs, an earlier "
    "pair in the sort with qty >= mine always dominates. Descending "
    "sort rides the ascending scan on negated keys.",
    oracle="""
    WITH a AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_c,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1
    ),
    p AS (
      SELECT rev_c, qty, CAST(count(*) AS BIGINT) AS n_parts
      FROM a GROUP BY 1, 2
    ),
    m AS (
      SELECT rev_c, qty, n_parts,
             max(qty) OVER (ORDER BY rev_c DESC, qty DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS em
      FROM p
    )
    SELECT rev_c, qty, n_parts FROM m
    WHERE em IS NULL OR qty > em
    ORDER BY rev_c DESC, qty DESC
    """,
)
def mart_skyline_revenue_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import distributed_running_max_exclusive

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        cents("l_extendedprice").alias("price_c"),
        F.round("l_quantity").cast("long").alias("q"),
    )
    a = li.groupBy("l_partkey").agg(
        F.sum("price_c").cast("long").alias("rev_c"),
        F.sum("q").cast("long").alias("qty"),
    )
    p = a.groupBy("rev_c", "qty").agg(
        F.count("*").cast("long").alias("n_parts")
    )
    # Descending dominance order on an ascending range scan: negate
    # both keys. (rev_c, qty) is unique after the distinct-pair group,
    # satisfying the scan's unique-key contract.
    m = distributed_running_max_exclusive(
        p.withColumn("_nrev", -F.col("rev_c")).withColumn(
            "_nqty", -F.col("qty")
        ),
        order_cols=["_nrev", "_nqty"],
        value_col="qty",
        out_col="em",
    )
    return (
        m.filter(F.col("em").isNull() | (F.col("qty") > F.col("em")))
        .select("rev_c", "qty", "n_parts")
        .orderBy(F.desc("rev_c"), F.desc("qty"))
    )


# --------------------------------------------------------------------------
# Ranking-quality mart: nDCG@10 of a quantity-ranked catalog against
# revenue-graded relevance (the retrieval-eval metric every search /
# recommendation pipeline reports, expressed as a pure DataFrame agg)
# --------------------------------------------------------------------------
_NDCG_K = 10

#: graded relevance from exact e4 revenue units (cents x (100-bp)) —
#: integer CASE bands, identical text both engines. Bands sit at the
#: measured p90/p75/p50 of the (nation, part) revenue distribution
#: (stable across sf: ~1.7e9 / 1.17e9 / 0.78e9 at both sf0.01 and
#: sf0.1), so the top-10 lists MIX grades and nDCG actually varies;
#: saturating bands made every nation a perfect 1.0.
_NDCG_GRADE = (
    "CASE WHEN rev_e4 >= 1700000000 THEN 3"
    " WHEN rev_e4 >= 1170000000 THEN 2"
    " WHEN rev_e4 >= 780000000 THEN 1 ELSE 0 END"
)

#: per-position DCG contribution quantized to the e9 grid before the
#: exact sum (grade and pos are exact ints; the division and log2 are
#: the only float ops and the chain is textually identical).
_NDCG_CONTRIB = "CAST(round(grade / log2(pos + 1) * 1000000000) AS BIGINT)"


@query(
    "mart_ndcg_ranking_quality",
    tier="T3",
    doc=f"nDCG@{_NDCG_K} per nation: the 'retrieval system' ranks each "
    "nation's parts by units sold (qty desc, partkey tiebreak); "
    "relevance is the revenue grade (0-3 integer bands on exact e4 "
    "revenue). DCG sums grade/log2(pos+1) over the top-10, IDCG "
    "re-ranks the SAME grades descending, and nDCG = DCG/IDCG — the "
    "standard ranking-quality metric for search/reco/ANN evaluation "
    "(complements ann_lsh_recall's recall@k with a position-weighted "
    "score). Determinism: grades and positions are exact ints, each "
    "position's contribution is e9-quantized before an exact int64 "
    "sum (float enters only in one identical grade/log2 chain), and "
    "nDCG is one double division of two exact ints rounded to e6. "
    "Scale shape: one star join (lineitem⋈orders shuffles once; "
    "customer/nation broadcast), one combiner-friendly agg to the "
    "(nation, part) grain, and the ranking windows partition by "
    "NATION — report grain (25 keys), not data grain; the top-10 "
    "slice prunes via WindowGroupLimit before the DCG agg.",
    oracle=f"""
    WITH base AS (
      SELECT n.n_name AS nation, l.l_partkey AS partkey,
             CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS qty,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
               AS BIGINT) AS rev_e4
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ),
    graded AS (
      SELECT nation, partkey, qty, {_NDCG_GRADE} AS grade FROM base
    ),
    sys AS (
      SELECT nation, grade,
             row_number() OVER (PARTITION BY nation
               ORDER BY qty DESC, partkey ASC) AS pos
      FROM graded
    ),
    ideal AS (
      SELECT nation, grade,
             row_number() OVER (PARTITION BY nation
               ORDER BY grade DESC, partkey ASC) AS pos
      FROM graded
    ),
    dcg AS (
      SELECT nation, CAST(sum({_NDCG_CONTRIB}) AS BIGINT) AS dcg_e9
      FROM sys WHERE pos <= {_NDCG_K} GROUP BY 1
    ),
    idcg AS (
      SELECT nation, CAST(sum({_NDCG_CONTRIB}) AS BIGINT) AS idcg_e9
      FROM ideal WHERE pos <= {_NDCG_K} GROUP BY 1
    )
    SELECT dcg.nation, dcg_e9, idcg_e9,
           CAST(round(CAST(dcg_e9 AS DOUBLE) / CAST(idcg_e9 AS DOUBLE)
             * 1000000) AS BIGINT) AS ndcg_e6
    FROM dcg JOIN idcg ON dcg.nation = idcg.nation
    WHERE idcg_e9 > 0
    ORDER BY dcg.nation
    """,
)
def mart_ndcg_ranking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import bp

    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    dims = (
        F.broadcast(c)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("nation"))
    )
    base = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == dims.c_custkey)
        .groupBy("nation", F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(F.round("l_quantity").cast("long")).cast("long").alias("qty"),
            F.sum(cents("l_extendedprice") * (100 - bp("l_discount")))
            .cast("long")
            .alias("rev_e4"),
        )
    )
    graded = base.selectExpr("nation", "partkey", "qty",
                             f"{_NDCG_GRADE} AS grade")
    sys_rank = graded.withColumn(
        "pos",
        F.row_number().over(
            Window.partitionBy("nation").orderBy(
                F.desc("qty"), F.asc("partkey")
            )
        ),
    ).filter(F.col("pos") <= _NDCG_K)
    ideal_rank = graded.withColumn(
        "pos",
        F.row_number().over(
            Window.partitionBy("nation").orderBy(
                F.desc("grade"), F.asc("partkey")
            )
        ),
    ).filter(F.col("pos") <= _NDCG_K)
    dcg = sys_rank.selectExpr(
        "nation", f"{_NDCG_CONTRIB} AS contrib"
    ).groupBy("nation").agg(F.sum("contrib").cast("long").alias("dcg_e9"))
    idcg = ideal_rank.selectExpr(
        "nation", f"{_NDCG_CONTRIB} AS contrib"
    ).groupBy("nation").agg(F.sum("contrib").cast("long").alias("idcg_e9"))
    # idcg is nation-grain (25 rows) but sits behind a shuffle, so the
    # static planner can't see its size — hint the broadcast instead
    # of hoping AQE converts it at runtime.
    return (
        dcg.join(F.broadcast(idcg), "nation")
        .filter(F.col("idcg_e9") > 0)
        .selectExpr(
            "nation",
            "dcg_e9",
            "idcg_e9",
            "CAST(round(CAST(dcg_e9 AS DOUBLE) / CAST(idcg_e9 AS DOUBLE)"
            " * 1000000) AS BIGINT) AS ndcg_e6",
        )
        .orderBy("nation")
    )


# --------------------------------------------------------------------------
# l-diversity audit (round 9b) — companion to audit_k_anonymity
# --------------------------------------------------------------------------
L_DIVERSITY = 3  # minimum distinct sensitive values per QI group


@query(
    "audit_l_diversity",
    tier="T2",
    doc="l-diversity audit (Machanavajjhala et al. 2007), the privacy "
    "gate k-anonymity alone cannot provide: a quasi-identifier group "
    "can be large (k-anonymous) yet expose everyone in it when all "
    "members share one sensitive value. Same QI tuple as "
    "audit_k_anonymity (nation, market segment); sensitive attribute "
    "= account-balance band (negative / 2500-dollar bands, exact "
    "cent-integer banding with the negative case split out because "
    "integer `div` truncates toward zero on both engines). Reports "
    f"EVERY group with its distinct-band count and a below_l (l = "
    f"{L_DIVERSITY}) flag. One map-side-combined groupBy on the QI "
    "tuple + a distinct-count — the same single-scan shape as the "
    "k-audit, so running both costs two scans at any corpus size.",
    oracle=f"""
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS group_size,
           CAST(count(DISTINCT CASE
                  WHEN CAST(round(c_acctbal * 100) AS BIGINT) < 0 THEN -1
                  ELSE CAST(round(c_acctbal * 100) AS BIGINT) // 250000
                END) AS BIGINT) AS n_bands,
           count(DISTINCT CASE
                  WHEN CAST(round(c_acctbal * 100) AS BIGINT) < 0 THEN -1
                  ELSE CAST(round(c_acctbal * 100) AS BIGINT) // 250000
                END) < {L_DIVERSITY} AS below_l
    FROM customer
    GROUP BY 1, 2
    ORDER BY nationkey, segment
    """,
)
def audit_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    band = F.expr(
        "CASE WHEN CAST(round(c_acctbal * 100) AS BIGINT) < 0 THEN -1 "
        "ELSE CAST(round(c_acctbal * 100) AS BIGINT) div 250000 END"
    )
    return (
        c.groupBy(
            F.col("c_nationkey").cast("long").alias("nationkey"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.count("*").cast("long").alias("group_size"),
            F.countDistinct(band).cast("long").alias("n_bands"),
        )
        .withColumn("below_l", F.col("n_bands") < L_DIVERSITY)
        .orderBy("nationkey", "segment")
    )
