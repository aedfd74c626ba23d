"""Tier-2 window/as-of surface (SURVEY T2.5, T2.9, T2.10).

The flagship semantic of the reference's data model: "current position
of each aircraft" = latest row per key (SURVEY T2.5) — the same shape
here over the `events` stream table.

Determinism: the parquet event timestamps are nanosecond-precision;
both Spark and DuckDB truncate to microseconds on read (verified), but
every ordering still carries `event_id` as a unique tiebreaker, and no
raw timestamp is ever output (epoch seconds / formatted strings only).

Scale: all of these are single-shuffle (hash partition by the window
key) — the as-of join uses the union+last_value trick, NOT a pairwise
join, so it stays O(n log n within partition) at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import cents
from ..operators.asof import asof_join
from ..sources import load_table
from .catalog import query


# --------------------------------------------------------------------------
# T2.5 — latest-per-key (the "current state" query)
# --------------------------------------------------------------------------
@query(
    "latest_event_per_user",
    tier="T2",
    doc="Latest row per key via row_number (T2.5 — current position of "
    "each aircraft). Single shuffle on user_id; at 100 TB prefer "
    "partition-pruned recent data + this window.",
    oracle="""
    SELECT user_id, event_id, event_type,
           CAST(round(value * 100) AS BIGINT) / 100.0 AS value,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch_s
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    ORDER BY user_id
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            (cents("value") / 100.0).alias("value"),
            F.unix_timestamp("ts").cast("long").alias("ts_epoch_s"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# T2.9 — lag/lead deltas (trajectory deltas between crawls)
# --------------------------------------------------------------------------
@query(
    "window_lag_delta",
    tier="T2",
    doc="Per-key lag delta (T2.9 — per-aircraft velocity delta between "
    "10-min crawls). Exact cents arithmetic so deltas hash-match.",
    oracle="""
    SELECT event_id,
           user_id,
           (CAST(round(value * 100) AS BIGINT)
            - lag(CAST(round(value * 100) AS BIGINT)) OVER w) / 100.0 AS value_delta,
           CAST(floor(epoch(ts)) - lag(floor(epoch(ts))) OVER w AS BIGINT) AS gap_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY event_id
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    value_c = cents("value")
    epoch = F.unix_timestamp("ts").cast("long")
    return (
        e.select(
            "event_id",
            "user_id",
            ((value_c - F.lag(value_c).over(w)) / 100.0).alias("value_delta"),
            (epoch - F.lag(epoch).over(w)).cast("long").alias("gap_s"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# T2.9 — rolling frame aggregate (exact fixed-point rolling mean)
# --------------------------------------------------------------------------
@query(
    "window_rolling_avg",
    tier="T2",
    doc="Rolling mean over a 4-row frame per key (T2.9 frames). Integer "
    "floor-division avg → deterministic across engines.",
    oracle="""
    SELECT event_id,
           (sum(CAST(round(value * 100) AS BIGINT)) OVER w * 100)
             // count(*) OVER w / 10000.0 AS rolling_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def window_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    x = e.select(
        "event_id",
        F.sum(cents("value")).over(w).alias("s"),
        F.count(F.lit(1)).over(w).alias("c"),
    )
    return x.select(
        "event_id", (F.expr("(s * 100) div c") / 10000.0).alias("rolling_avg")
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# T2.9/T2.10 — ranked top-n per group
# --------------------------------------------------------------------------
@query(
    "rank_topn_per_group",
    tier="T2",
    doc="Top-3 orders per customer via row_number (T2.9 ranking + T2.10 "
    "top-k). WindowGroupLimit pushes the limit into the sort at scale.",
    oracle="""
    SELECT o_custkey, o_orderkey, rn AS rank_in_cust, o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
      FROM orders
    )
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
)
def rank_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("rn").alias("rank_in_cust"),
            "o_totalprice",
        )
        .orderBy("o_custkey", "rank_in_cust")
    )


# --------------------------------------------------------------------------
# T2.5 — as-of join (latest click before each purchase)
# --------------------------------------------------------------------------
@query(
    "asof_click_before_purchase",
    tier="T2",
    doc="As-of join: for each purchase, the user's most recent strictly-"
    "earlier click (T2.5). Implemented scalably via union + last_value "
    "over a single user-partitioned window (operators/asof.py) — no "
    "pairwise join blowup. Oracle uses a correlated subquery (exact "
    "same (ts, event_id) lexicographic tie rule).",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           CAST(round(p.value * 100) AS BIGINT) / 100.0 AS purchase_value,
           (SELECT CAST(round(c.value * 100) AS BIGINT) / 100.0
            FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id))
            ORDER BY c.ts DESC, c.event_id DESC
            LIMIT 1) AS last_click_value
    FROM events p
    WHERE p.event_type = 'purchase'
    ORDER BY purchase_id
    """,
)
def asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    clicks = e.filter(F.col("event_type") == "click")
    joined = asof_join(
        left=purchases,
        right=clicks,
        on="user_id",
        left_time=["ts", "event_id"],
        right_time=["ts", "event_id"],
        right_values={"last_click_value_c": cents("value")},
        strict=True,
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        (cents("value") / 100.0).alias("purchase_value"),
        (F.col("last_click_value_c") / 100.0).alias("last_click_value"),
    ).orderBy("purchase_id")


# --------------------------------------------------------------------------
# T2.9 — ranking family: rank / dense_rank / ntile over ties
# --------------------------------------------------------------------------
@query(
    "window_rank_dense_ntile",
    tier="T2",
    doc="rank vs dense_rank vs ntile(4) over a coarse price bucket with "
    "real ties (T2.9 ranking functions). Single shuffle on the "
    "partition key.",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           CAST(rank() OVER w AS INTEGER) AS price_rank,
           CAST(dense_rank() OVER w AS INTEGER) AS price_dense_rank,
           CAST(ntile(4) OVER w AS INTEGER) AS price_quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) // 1000000,
                          o_orderkey)
    ORDER BY o_orderkey
    """,
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # Bucket to 10k-dollar steps so rank/dense_rank diverge on real ties.
    bucket = F.expr(
        "CAST(round(o_totalprice * 100) AS BIGINT) div 1000000"
    )
    w = Window.partitionBy("o_orderpriority").orderBy(bucket, F.asc("o_orderkey"))
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.rank().over(w).cast("int").alias("price_rank"),
            F.dense_rank().over(w).cast("int").alias("price_dense_rank"),
            F.ntile(4).over(w).cast("int").alias("price_quartile"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# T2.16 — sessionization (session windows over event time, batch form)
# --------------------------------------------------------------------------
@query(
    "session_window_stats",
    tier="T2",
    doc="Per-user sessionization with a 30-min inactivity gap via "
    "session_window (T2.16) — the batch twin of the streaming session "
    "query. Timestamps floored to whole seconds first so the gap rule "
    "is engine-exact (parquet ns vs µs). Oracle reproduces Spark's "
    "merge rule with lag + a running sum: sessions merge when the "
    "next event's window start <= the current session end, so a gap "
    "of EXACTLY the 30-min threshold still merges — new session iff "
    "gap > 1800 s (verified against a real boundary gap at sf0.1; "
    ">= silently agrees at SFs that never produce an exact tie).",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM events
    ),
    flagged AS (
      SELECT *,
             CASE WHEN ts_s - lag(ts_s) OVER (
                    PARTITION BY user_id ORDER BY ts_s, event_id) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM e
    ),
    sessions AS (
      SELECT user_id, event_id, ts_s,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts_s, event_id
               ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id,
           CAST(count(DISTINCT session_no) AS BIGINT) AS n_sessions,
           CAST(sum(cnt) AS BIGINT) AS n_events,
           CAST(max(cnt) AS BIGINT) AS max_session_events,
           CAST(max(dur) AS BIGINT) AS max_session_dur_s
    FROM (
      SELECT user_id, session_no, count(*) AS cnt,
             max(ts_s) - min(ts_s) AS dur
      FROM sessions GROUP BY user_id, session_no
    ) GROUP BY user_id
    ORDER BY user_id
    """,
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.timestamp_seconds(F.unix_timestamp("ts")).alias("ts_floor"),
        F.unix_timestamp("ts").cast("long").alias("ts_s"),
    )
    per_session = (
        e.groupBy("user_id", F.session_window("ts_floor", "30 minutes"))
        .agg(
            F.count("*").alias("cnt"),
            (F.max("ts_s") - F.min("ts_s")).alias("dur"),
        )
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.sum("cnt").cast("long").alias("n_events"),
            F.max("cnt").cast("long").alias("max_session_events"),
            F.max("dur").cast("long").alias("max_session_dur_s"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# T2.9 — analytic value functions: first/last/nth over frames, distribution
# --------------------------------------------------------------------------
@query(
    "window_value_functions",
    tier="T2",
    doc="first_value / last_value / nth_value over a running frame plus "
    "percent_rank and cume_dist (T2.9 analytic functions). Exact cents "
    "for values; distribution ratios are exact rationals rounded to "
    "6 dp.",
    oracle="""
    SELECT event_id,
           user_id,
           first_value(CAST(round(value * 100) AS BIGINT)) OVER w AS first_c,
           last_value(CAST(round(value * 100) AS BIGINT)) OVER w AS running_last_c,
           nth_value(CAST(round(value * 100) AS BIGINT), 2) OVER w AS second_c,
           round(percent_rank() OVER w2, 6) AS pct_rank,
           round(cume_dist() OVER w2, 6) AS cume
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w2 AS (PARTITION BY user_id
                  ORDER BY CAST(round(value * 100) AS BIGINT), event_id)
    ORDER BY event_id
    """,
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    value_c = cents("value")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w2 = Window.partitionBy("user_id").orderBy(value_c, "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.first(value_c).over(w).alias("first_c"),
        F.last(value_c).over(w).alias("running_last_c"),
        F.nth_value(value_c, 2).over(w).alias("second_c"),
        F.round(F.percent_rank().over(w2), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w2), 6).alias("cume"),
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# T2.13 — date spine: sequence + explode joined to facts (gap-free series)
# --------------------------------------------------------------------------
@query(
    "date_spine_daily_orders",
    tier="T2",
    doc="Gap-free daily series via sequence()+explode left-joined to "
    "per-day order counts (T2.13 date math — the mart-report spine "
    "pattern; days with no orders appear with zeros).",
    oracle="""
    WITH bounds AS (
      SELECT min(CAST(o_orderdate AS DATE)) AS d0,
             max(CAST(o_orderdate AS DATE)) AS d1
      FROM orders
    ),
    spine AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      FROM bounds
    ),
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS spend_c
      FROM orders GROUP BY 1
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day,
           coalesce(d.n, 0) AS n_orders,
           coalesce(d.spend_c, 0) / 100.0 AS total_spend
    FROM spine s LEFT JOIN daily d ON d.day = s.day
    ORDER BY day
    """,
)
def date_spine_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("day"), cents("o_totalprice").alias("price_c")
    )
    bounds = o.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    daily = o.groupBy("day").agg(
        F.count("*").alias("n"), F.sum("price_c").alias("spend_c")
    )
    return (
        spine.join(daily, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n_orders"),
            (F.coalesce("spend_c", F.lit(0)) / 100.0).alias("total_spend"),
        )
        .orderBy("day")
    )


@query(
    "window_percent_rank_cume_dist",
    tier="T2",
    doc="Relative-rank window functions (T2.9): percent_rank and "
    "cume_dist per order priority over a TIE-FREE total order "
    "(price cents, orderkey tiebreak). Both engines evaluate the "
    "identical builtin formula on identical integer ranks, so the "
    "doubles agree bit-for-bit; emitted as floor(x*1e6) integers to "
    "keep the gate integer-typed.",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           CAST(floor(percent_rank() OVER w * 1000000) AS BIGINT)
             AS pct_rank_e6,
           CAST(floor(cume_dist() OVER w * 1000000) AS BIGINT)
             AS cume_dist_e6
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY CAST(round(o_totalprice * 100) AS BIGINT),
                          o_orderkey)
    ORDER BY o_orderkey
    """,
)
def window_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import cents

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        cents("o_totalprice"), "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.percent_rank().over(w) * 1_000_000)
        .cast("long")
        .alias("pct_rank_e6"),
        F.floor(F.cume_dist().over(w) * 1_000_000)
        .cast("long")
        .alias("cume_dist_e6"),
    ).orderBy("o_orderkey")


# --------------------------------------------------------------------------
# T2.5 — NEAREST-in-time join (bidirectional as-of with tolerance)
# --------------------------------------------------------------------------
@query(
    "join_asof_nearest",
    tier="T2",
    doc="Nearest-neighbor-in-time join: each purchase attaches the "
    "click closest in EITHER direction within ±1800 s — two mirrored "
    "as-of passes (the forward pass is the backward operator on "
    "negated time keys; operators/asof.py, one |L|+|R| shuffle each, "
    "no range-join blowup), then a row-local arbitration: smaller "
    "|Δ| wins, exact ties prefer the backward candidate. The oracle "
    "encodes the identical total order (|Δ|, backward-first, "
    "lexicographic closeness within a same-second group). The shape "
    "sensor-fusion / feature-attach pipelines need when events "
    "straddle both sides of the anchor.",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           (SELECT c.event_id FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND abs(CAST(floor(epoch(c.ts)) AS BIGINT)
                      - CAST(floor(epoch(p.ts)) AS BIGINT)) <= 1800
            ORDER BY
              abs(CAST(floor(epoch(c.ts)) AS BIGINT)
                  - CAST(floor(epoch(p.ts)) AS BIGINT)),
              CASE WHEN (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id))
                   THEN 0 ELSE 1 END,
              CASE WHEN (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id))
                   THEN -c.event_id ELSE c.event_id END
            LIMIT 1) AS nearest_click_id,
           (SELECT CAST(floor(epoch(c.ts)) AS BIGINT)
                   - CAST(floor(epoch(p.ts)) AS BIGINT)
            FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND abs(CAST(floor(epoch(c.ts)) AS BIGINT)
                      - CAST(floor(epoch(p.ts)) AS BIGINT)) <= 1800
            ORDER BY
              abs(CAST(floor(epoch(c.ts)) AS BIGINT)
                  - CAST(floor(epoch(p.ts)) AS BIGINT)),
              CASE WHEN (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id))
                   THEN 0 ELSE 1 END,
              CASE WHEN (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id))
                   THEN -c.event_id ELSE c.event_id END
            LIMIT 1) AS delta_s
    FROM events p
    WHERE p.event_type = 'purchase'
    ORDER BY purchase_id
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    tol = 1800
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("ts_s"),
    )
    p = e.filter(F.col("event_type") == "purchase")
    c = e.filter(F.col("event_type") == "click")
    back = asof_join(
        left=p,
        right=c,
        on="user_id",
        left_time=["ts_s", "event_id"],
        right_time=["ts_s", "event_id"],
        right_values={"back_id": F.col("event_id"), "back_ts": F.col("ts_s")},
        strict=True,
    ).select("event_id", "user_id", "ts_s", "back_id", "back_ts")
    neg = lambda df: df.withColumn("nts", -F.col("ts_s")).withColumn(  # noqa: E731
        "nid", -F.col("event_id")
    )
    fwd = asof_join(
        left=neg(p),
        right=neg(c),
        on="user_id",
        left_time=["nts", "nid"],
        right_time=["nts", "nid"],
        right_values={"fwd_id": F.col("event_id"), "fwd_ts": F.col("ts_s")},
        strict=True,
    ).select(F.col("event_id").alias("p_id"), "fwd_id", "fwd_ts")
    j = back.join(fwd, back.event_id == fwd.p_id)
    db = F.col("ts_s") - F.col("back_ts")
    df_ = F.col("fwd_ts") - F.col("ts_s")
    ok_b = F.col("back_ts").isNotNull() & (db <= tol)
    ok_f = F.col("fwd_ts").isNotNull() & (df_ <= tol)
    pick_back = ok_b & (~ok_f | (db <= df_))
    return j.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(pick_back, F.col("back_id"))
        .when(ok_f, F.col("fwd_id"))
        .alias("nearest_click_id"),
        F.when(pick_back, -db).when(ok_f, df_).alias("delta_s"),
    ).orderBy("purchase_id")


# --------------------------------------------------------------------------
# T2.9 — ntile bucketing within groups
# --------------------------------------------------------------------------
@query(
    "window_ntile_quartiles",
    tier="T2",
    doc="ntile(4) spend quartiles within each market segment: "
    "customers ranked by exact-cents order spend (custkey tiebreak — "
    "ntile is deterministic only under a total order), bucketed into "
    "4 near-equal-count tiles, then per-(segment, quartile) stats. "
    "The window runs over the PRE-AGGREGATED per-customer frame "
    "(bounded by |customers| per segment — the documented exemption "
    "class; the fact table itself is reduced by one map-side-combined "
    "agg first). The per-segment partitioning keys the shuffle.",
    oracle="""
    WITH s AS (
      SELECT c.c_mktsegment AS segment, c.c_custkey,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS spend_c
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    t AS (
      SELECT segment, c_custkey, spend_c,
             ntile(4) OVER (PARTITION BY segment
                            ORDER BY spend_c DESC, c_custkey) AS quartile
      FROM s
    )
    SELECT segment, CAST(quartile AS BIGINT) AS quartile,
           CAST(count(*) AS BIGINT) AS n_cust,
           CAST(min(spend_c) AS BIGINT) AS min_spend_c,
           CAST(max(spend_c) AS BIGINT) AS max_spend_c
    FROM t GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("segment"), "c_custkey"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", cents("o_totalprice").alias("price_c")
    )
    s = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("segment", "c_custkey")
        .agg(F.sum("price_c").cast("long").alias("spend_c"))
    )
    w = Window.partitionBy("segment").orderBy(F.desc("spend_c"), "c_custkey")
    return (
        s.withColumn("quartile", F.ntile(4).over(w).cast("long"))
        .groupBy("segment", "quartile")
        .agg(
            F.count("*").cast("long").alias("n_cust"),
            F.min("spend_c").cast("long").alias("min_spend_c"),
            F.max("spend_c").cast("long").alias("max_spend_c"),
        )
        .orderBy("segment", "quartile")
    )


# --------------------------------------------------------------------------
# T2.9 — RANGE frame over event time (value-based window, not row-based)
# --------------------------------------------------------------------------
@query(
    "window_range_trailing_1h",
    tier="T2",
    doc="RANGE-frame window: for every purchase, the count and exact "
    "cent-sum of the SAME user's events in the trailing hour — "
    "`RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW` over integer "
    "epoch seconds. RANGE frames bound by VALUE, not row count (a "
    "burst of 500 events in a minute is all inside the frame; a "
    "ROWS 500 frame would be wrong), and rows with EQUAL ordering "
    "values share one frame by definition — so no tiebreak column "
    "is needed for cross-engine agreement, unlike every ROWS frame "
    "in the catalog. One shuffle on user_id; the frame scan is "
    "partition-local and incremental (Spark's sliding aggregation "
    "over a sorted run).",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
             CAST(round(value * 100) AS BIGINT) AS value_c
      FROM events
    ),
    w AS (
      SELECT user_id, event_id, event_type,
             CAST(count(*) OVER fr AS BIGINT) AS n_trailing_1h,
             CAST(sum(value_c) OVER fr AS BIGINT) AS sum_trailing_c
      FROM e
      WINDOW fr AS (PARTITION BY user_id ORDER BY ts_s
                    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id AS purchase_id, user_id, n_trailing_1h, sum_trailing_c
    FROM w WHERE event_type = 'purchase'
    ORDER BY purchase_id
    """,
)
def window_range_trailing_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("ts_s"),
        cents("value").alias("value_c"),
    )
    fr = (
        Window.partitionBy("user_id")
        .orderBy("ts_s")
        .rangeBetween(-3600, 0)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            "event_type",
            F.count("*").over(fr).cast("long").alias("n_trailing_1h"),
            F.sum("value_c").over(fr).cast("long").alias("sum_trailing_c"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "n_trailing_1h",
            "sum_trailing_c",
        )
        .orderBy("purchase_id")
    )
