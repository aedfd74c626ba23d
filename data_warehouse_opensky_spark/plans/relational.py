"""Tier-2 relational surface (SURVEY §2, T2.1–T2.15 minus windows).

Each query is the Spark-first expression of a capability the reference
delegates to PostgreSQL (SURVEY §0: its "query engine" IS Postgres).
Oracles are exact — see catalog.py determinism rules (integer
fixed-point for money, no raw timestamps, explicit output casts).

Scale notes are inline per query; the common ones:
* dims (region/nation/supplier/part/customer) are broadcast — at
  100 TB the fact side never shuffles for a dim join;
* aggregations are partial (map-side combine) automatically because we
  use built-in hash aggregates over exact integer columns;
* every filter/projection is declarative → Catalyst pushes it into the
  parquet scan (PushedFilters/ReadSchema verified in tests/bench).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import bp, cents
from ..sources import load_table
from .catalog import query


def _lineitem_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem with exact fixed-point money columns added."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.withColumn("qty_c", cents("l_quantity"))
        .withColumn("price_c", cents("l_extendedprice"))
        .withColumn("disc_bp", bp("l_discount"))
        .withColumn("tax_bp", bp("l_tax"))
        .withColumn("disc_e4", F.col("price_c") * (100 - F.col("disc_bp")))
        .withColumn("charge_e6", F.col("disc_e4") * (100 + F.col("tax_bp")))
    )


_LINEITEM_EXACT_SQL = """
  SELECT l.*,
         CAST(round(l_quantity * 100) AS BIGINT)      AS qty_c,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
         CAST(round(l_discount * 100) AS BIGINT)      AS disc_bp,
         CAST(round(l_tax * 100) AS BIGINT)           AS tax_bp,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS disc_e4,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))
           * (100 + CAST(round(l_tax * 100) AS BIGINT))      AS charge_e6
  FROM lineitem l
"""


# --------------------------------------------------------------------------
# T2.6 / T2.1 / T2.10 — the TPC-H Q1 shape: filter → hash agg → sort
# --------------------------------------------------------------------------
@query(
    "pricing_summary",
    tier="T2",
    doc="Filter + multi-aggregate GROUP BY (T2.6; diagram stage 5 'Create "
    "aggregate script'). Exact fixed-point so sums are order-independent.",
    oracle=f"""
    WITH l AS ({_LINEITEM_EXACT_SQL})
    SELECT l_returnflag, l_linestatus,
           CAST(sum(qty_c) AS BIGINT) / 100.0        AS sum_qty,
           CAST(sum(price_c) AS BIGINT) / 100.0      AS sum_base_price,
           CAST(sum(disc_e4) AS BIGINT) / 10000.0    AS sum_disc_price,
           CAST(sum(charge_e6) AS BIGINT) / 1000000.0 AS sum_charge,
           (CAST(sum(qty_c) AS BIGINT) * 10000) // count(*) / 1000000.0 AS avg_qty,
           (CAST(sum(price_c) AS BIGINT) * 10000) // count(*) / 1000000.0 AS avg_price,
           (CAST(sum(disc_bp) AS BIGINT) * 10000) // count(*) / 1000000.0 AS avg_disc,
           count(*) AS count_order
    FROM l
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _lineitem_exact(spark, sf_dir).filter(F.col("l_shipdate") <= "1998-09-02")
    agg = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty_c").alias("sq"),
        F.sum("price_c").alias("sp"),
        F.sum("disc_e4").alias("sd"),
        F.sum("charge_e6").alias("sc"),
        F.sum("disc_bp").alias("sdisc"),
        F.count("*").alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("sq") / 100.0).alias("sum_qty"),
        (F.col("sp") / 100.0).alias("sum_base_price"),
        (F.col("sd") / 10000.0).alias("sum_disc_price"),
        (F.col("sc") / 1000000.0).alias("sum_charge"),
        (F.expr("(sq * 10000) div count_order") / 1000000.0).alias("avg_qty"),
        (F.expr("(sp * 10000) div count_order") / 1000000.0).alias("avg_price"),
        (F.expr("(sdisc * 10000) div count_order") / 1000000.0).alias("avg_disc"),
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


# --------------------------------------------------------------------------
# T2.1 — predicate surface: =, !=, range, IN, LIKE, IS NULL
# --------------------------------------------------------------------------
@query(
    "filter_predicates",
    tier="T2",
    doc="Compound predicate scan (T2.1; load_warehouse.py:97,191 shape). "
    "All predicates pushable into the parquet scan.",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_rows,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_qty
    FROM lineitem
    WHERE l_returnflag IN ('A', 'R')
      AND l_quantity BETWEEN 10 AND 20
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_linestatus = 'F'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            F.col("l_returnflag").isin("A", "R")
            & F.col("l_quantity").between(10, 20)
            & (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_linestatus") == "F")
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            (F.sum(cents("l_quantity")) / 100.0).alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# T2.2 — projection / column pruning
# --------------------------------------------------------------------------
@query(
    "projection_pruning",
    tier="T2",
    doc="Narrow projection with a computed column (T2.2; load_warehouse.py:"
    "77-91). ReadSchema in the physical plan must show only 4 columns.",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT)) / 10000.0 AS net_price
    FROM lineitem
    WHERE l_orderkey % 97 = 0
    """,
)
def projection_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(F.col("l_orderkey") % 97 == 0).select(
        "l_orderkey",
        "l_linenumber",
        ((cents("l_extendedprice") * (100 - bp("l_discount"))) / 10000.0).alias(
            "net_price"
        ),
    )


# --------------------------------------------------------------------------
# T2.3 — star-schema join (fact ⋈ broadcast dims)
# --------------------------------------------------------------------------
@query(
    "join_star_revenue",
    tier="T2",
    doc="4-way star join with broadcast dims + agg (T2.3; diagram stage 4 "
    "star schema). At 100 TB: lineitem⋈orders is the only shuffle; "
    "customer/nation/region broadcast.",
    oracle="""
    SELECT n.n_name,
           CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
             / 10000.0 AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('EUROPE', 'ASIA')
    GROUP BY n.n_name, order_year
    ORDER BY n.n_name, order_year
    """,
)
def join_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dims = (
        F.broadcast(c)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name").isin("EUROPE", "ASIA"))
        .select("c_custkey", "n_name")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == dims.c_custkey)
        .withColumn("order_year", F.year("o_orderdate").cast("int"))
        .groupBy("n_name", "order_year")
        .agg(
            (F.sum(cents("l_extendedprice") * (100 - bp("l_discount"))) / 10000.0).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
        .orderBy("n_name", "order_year")
    )


# --------------------------------------------------------------------------
# T2.3 — left outer join (keep customers with zero orders)
# --------------------------------------------------------------------------
@query(
    "join_left_outer",
    tier="T2",
    doc="Left outer join + per-key agg (T2.3). NULL-side handling per "
    "T2.15 (coalesce).",
    oracle="""
    SELECT c.c_custkey,
           count(o.o_orderkey) AS n_orders,
           coalesce(CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT), 0)
             / 100.0 AS total_spent
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    ORDER BY c.c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            (F.coalesce(F.sum(cents("o_totalprice")), F.lit(0)) / 100.0).alias(
                "total_spent"
            ),
        )
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# T2.4 — left-semi / left-anti joins
# --------------------------------------------------------------------------
@query(
    "join_semi",
    tier="T2",
    doc="Left-semi join: customers with ≥1 big order (T2.4; membership "
    "scan load_warehouse.py:97).",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE c_custkey IN (
      SELECT o_custkey FROM orders WHERE o_totalprice > 150000
    )
    ORDER BY c_custkey
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@query(
    "join_anti",
    tier="T2",
    doc="Left-anti join: customers with no big order (T2.4; the file-set "
    "difference at load_warehouse.py:185 is exactly this operator).",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 150000)
    ORDER BY c_custkey
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# T2.10 — ORDER BY / LIMIT / top-k
# --------------------------------------------------------------------------
@query(
    "topk_orders",
    tier="T2",
    doc="Global top-k (T2.10; fetchone()=LIMIT 1 at extract_script.py:68 "
    "generalized). TakeOrderedAndProject — no full sort at scale.",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select(
            "o_orderkey",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .limit(10)
    )


# --------------------------------------------------------------------------
# T1.8 — point lookup
# --------------------------------------------------------------------------
@query(
    "point_lookup",
    tier="T1",
    doc="Keyed point lookup + LIMIT 1 (T1.8; extract_script.py:66-68).",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal
    FROM customer WHERE c_custkey = 42 LIMIT 1
    """,
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_custkey") == 42)
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
        .limit(1)
    )


# --------------------------------------------------------------------------
# T2.11 — set operations
# --------------------------------------------------------------------------
@query(
    "set_ops_union",
    tier="T2",
    doc="UNION ALL + re-agg (T2.11; the multi-file concat loop at "
    "load_warehouse.py:144-159 is a union).",
    oracle="""
    SELECT nationkey, side, count(*) AS n
    FROM (
      SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    )
    GROUP BY nationkey, side
    ORDER BY nationkey, side
    """,
)
def set_ops_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return (
        c.unionByName(s)
        .groupBy("nationkey", "side")
        .agg(F.count("*").alias("n"))
        .orderBy("nationkey", "side")
    )


@query(
    "set_ops_intersect",
    tier="T2",
    doc="INTERSECT (distinct) — nations having both customers and "
    "suppliers (T2.11).",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def set_ops_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s).orderBy("nationkey")


@query(
    "set_ops_except",
    tier="T2",
    doc="EXCEPT (distinct) — BUILDING-segment customer nations minus "
    "rich-supplier nations (T2.11; Python set difference "
    "load_warehouse.py:185).",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
    ORDER BY nationkey
    """,
)
def set_ops_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    # subtract = EXCEPT DISTINCT (exceptAll would be multiset semantics:
    # each supplier occurrence cancels only ONE customer occurrence).
    return c.subtract(s).orderBy("nationkey")


# --------------------------------------------------------------------------
# T2.7 — COUNT(DISTINCT) exact and approximate
# --------------------------------------------------------------------------
@query(
    "count_distinct_users",
    tier="T2",
    doc="Exact COUNT(DISTINCT) per group (T2.7 — distinct aircraft per "
    "window analog). Two-phase shuffle; fine at scale with AQE.",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def count_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type")
    )


@query(
    "approx_count_distinct_users",
    tier="T2",
    doc="approx_count_distinct / HLL (T2.7). HLL estimates are "
    "engine-specific, so the raw estimate can never hash-match an "
    "oracle; instead (ann_lsh_recall gate pattern) emit the exact "
    "count plus a within_tolerance boolean (|approx-exact|/exact < "
    "0.05) that the oracle predicts exactly. At 100 TB the approx "
    "path is the operator you actually run (single pass, bounded "
    "memory); this query gates its quality.",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users_exact,
           TRUE AS within_tolerance
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def approx_count_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # The exact and approximate counts run as SEPARATE aggregations,
    # joined on the (group-count-sized) result. Fusing them into one
    # agg plans partial_approx_count_distinct UNDER the distinct
    # rewrite: the rsd=0.01 HLL++ sketch is ~1.6k longs (~13 KB) of
    # buffer PER (event_type, user_id) KEY, so the partial-agg state
    # and the shuffle both blow up by four orders of magnitude vs the
    # rows they summarize (measured r12, guide §2.3: 2.87 s fused →
    # ~0.5 s split at sf0.1; at 100 TB the fused shape is sketch-state
    # × distinct-keys — a straight OOM). Split, the HLL pass keeps
    # one sketch per (group × partition) and the exact pass is the
    # plain two-phase distinct.
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact")
    )
    approx = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("_approx")
    )
    # Null-safe join key (ADVICE r12): a NULL event_type group would
    # survive both aggregations but a null-unsafe inner join would drop
    # it — <=> keeps the split plan shape while matching the fused
    # form's semantics on NULL groups. (No NULL groups exist in the
    # fixtures; this is latent-correctness, output unchanged.)
    return (
        exact.join(
            approx, exact["event_type"].eqNullSafe(approx["event_type"])
        )
        .select(
            exact["event_type"],
            "n_users_exact",
            (
                F.abs(F.col("_approx") - F.col("n_users_exact"))
                / F.col("n_users_exact")
                < 0.05
            ).alias("within_tolerance"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# T2.8 — rollup / cube / grouping sets
# --------------------------------------------------------------------------
@query(
    "agg_rollup",
    tier="T2",
    doc="ROLLUP region→nation mart cube (T2.8; diagram stage 6 DataMart).",
    oracle="""
    SELECT r.r_name, n.n_name,
           count(*) AS n_customers,
           CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS sum_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    ORDER BY r.r_name NULLS FIRST, n.n_name NULLS FIRST
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            (F.sum(cents("c_acctbal")) / 100.0).alias("sum_acctbal"),
        )
        .orderBy(F.asc_nulls_first("r_name"), F.asc_nulls_first("n_name"))
    )


@query(
    "agg_cube",
    tier="T2",
    doc="CUBE over order status × priority (T2.8).",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(cents("o_totalprice")) / 100.0).alias("sum_price"),
        )
        .orderBy(
            F.asc_nulls_first("o_orderstatus"), F.asc_nulls_first("o_orderpriority")
        )
    )


@query(
    "grouping_sets",
    tier="T2",
    doc="GROUPING SETS via Spark SQL (T2.8): (type,day), (type), ().",
    oracle="""
    SELECT event_type,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((event_type, day), (event_type), ())
    ORDER BY event_type NULLS FIRST, day NULLS FIRST
    """,
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_type,
               date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS day,
               count(*) AS n,
               sum(CAST(round(value * 100) AS BIGINT)) / CAST(100.0 AS DOUBLE)
                 AS sum_value
        FROM events
        GROUP BY GROUPING SETS ((event_type, day), (event_type), ())
        ORDER BY event_type NULLS FIRST, day NULLS FIRST
        """
    )


# --------------------------------------------------------------------------
# T2.12 — scalar string functions
# --------------------------------------------------------------------------
@query(
    "string_funcs",
    tier="T2",
    doc="lower/trim/substring/concat/LIKE/startswith (T2.12; "
    "load_warehouse.py:74,175, extract_script.py:111,184,206).",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           substring(p_type, 1, 5) AS type_prefix,
           concat(p_brand, '#', CAST(p_size AS VARCHAR)) AS brand_size,
           CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END AS has_a,
           length(p_name) AS name_len
    FROM part
    WHERE p_type LIKE 'TYPE%' OR p_brand LIKE '%1'
    ORDER BY p_partkey
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_type").like("TYPE%") | F.col("p_brand").like("%1"))
        .select(
            "p_partkey",
            F.lower("p_name").alias("name_lower"),
            F.substring("p_type", 1, 5).alias("type_prefix"),
            F.concat(
                F.col("p_brand"), F.lit("#"), F.col("p_size").cast("string")
            ).alias("brand_size"),
            F.when(F.col("p_name").like("%a%"), 1).otherwise(0).alias("has_a"),
            F.length("p_name").cast("long").alias("name_len"),
        )
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# T2.13 — date/time functions
# --------------------------------------------------------------------------
@query(
    "datetime_funcs",
    tier="T2",
    doc="date_trunc / hour-of-day buckets over event time (T2.13; epoch "
    "conversions load_warehouse.py:70-71, formatting extract_script.py:205).",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(hour(ts) AS INTEGER) AS hod,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
    FROM events
    GROUP BY day, hod
    ORDER BY day, hod
    """,
)
def datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            F.hour("ts").cast("int").alias("hod"),
            cents("value").alias("value_c"),
        )
        .groupBy("day", "hod")
        .agg(F.count("*").alias("n"), (F.sum("value_c") / 100.0).alias("sum_value"))
        .orderBy("day", "hod")
    )


# --------------------------------------------------------------------------
# T2.14 — math functions (min/max are order-independent → exact)
# --------------------------------------------------------------------------
@query(
    "math_funcs",
    tier="T2",
    doc="sqrt/ln/pow over telemetry-like columns (T2.14). Only order-"
    "independent aggregates (min/max) of continuous values, rounded — "
    "sum(double) would be non-deterministic.",
    oracle="""
    SELECT l_returnflag,
           round(max(sqrt(l_extendedprice)), 6) AS max_sqrt_price,
           round(min(ln(l_extendedprice + 1)), 6) AS min_log_price,
           round(max(pow(l_quantity, 2)), 6) AS max_qty_sq,
           round(max(abs(l_extendedprice * l_discount)), 6) AS max_disc_amt
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(F.max(F.sqrt("l_extendedprice")), 6).alias("max_sqrt_price"),
            F.round(F.min(F.log(F.col("l_extendedprice") + 1)), 6).alias(
                "min_log_price"
            ),
            F.round(F.max(F.pow("l_quantity", F.lit(2))), 6).alias("max_qty_sq"),
            F.round(
                F.max(F.abs(F.col("l_extendedprice") * F.col("l_discount"))), 6
            ).alias("max_disc_amt"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# T2.15 — NULL handling
# --------------------------------------------------------------------------
@query(
    "null_handling",
    tier="T2",
    doc="nullif/coalesce/IS NULL counting (T2.15; coerce-to-NULL is the "
    "reference's core cast contract, load_warehouse.py:63-71).",
    oracle="""
    WITH x AS (
      SELECT l_returnflag,
             nullif(CAST(round(l_discount * 100) AS BIGINT), 0) AS disc_bp
      FROM lineitem
    )
    SELECT l_returnflag,
           count(*) AS n_rows,
           count(disc_bp) AS n_discounted,
           CAST(sum(CASE WHEN disc_bp IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_free,
           CAST(sum(coalesce(disc_bp, 0)) AS BIGINT) AS total_disc_bp
    FROM x
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    x = l.select(
        "l_returnflag", F.expr("nullif(cast(round(l_discount*100) as long), 0)").alias("disc_bp")
    )
    return (
        x.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("disc_bp").alias("n_discounted"),
            F.sum(F.when(F.col("disc_bp").isNull(), 1).otherwise(0)).alias("n_free"),
            F.sum(F.coalesce("disc_bp", F.lit(0))).alias("total_disc_bp"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# CASE WHEN bucketing (conditional expressions, T2.15 adjacent)
# --------------------------------------------------------------------------
@query(
    "case_when_buckets",
    tier="T2",
    doc="Conditional bucketing for mart reports (status state machine "
    "load_warehouse.py:97,191 analog).",
    oracle="""
    SELECT CASE
             WHEN o_totalprice < 50000 THEN 'small'
             WHEN o_totalprice < 150000 THEN 'medium'
             ELSE 'large'
           END AS bucket,
           count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS sum_price
    FROM orders
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def case_when_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return (
        o.select(bucket.alias("bucket"), cents("o_totalprice").alias("price_c"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), (F.sum("price_c") / 100.0).alias("sum_price"))
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# T2.3 — right outer join
# --------------------------------------------------------------------------
@query(
    "join_right_outer",
    tier="T2",
    doc="Right outer join (T2.3): order lines right-joined to orders so "
    "orders keep a row even with no matching filtered line. Same "
    "broadcast/shuffle shape as left outer with sides swapped — "
    "Catalyst normalizes it to a left join internally.",
    oracle="""
    SELECT o.o_orderkey,
           count(l.l_linenumber) AS n_big_lines,
           coalesce(CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
             AS BIGINT), 0) / 100.0 AS big_line_revenue
    FROM (SELECT * FROM lineitem WHERE l_quantity >= 30) l
    RIGHT JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey
    ORDER BY o.o_orderkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 30)
    o = load_table(spark, sf_dir, "orders")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey, "right")
        .groupBy("o_orderkey")
        .agg(
            F.count("l_linenumber").alias("n_big_lines"),
            (F.coalesce(F.sum(cents("l_extendedprice")), F.lit(0)) / 100.0).alias(
                "big_line_revenue"
            ),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# T2.3 — full outer join
# --------------------------------------------------------------------------
@query(
    "join_full_outer",
    tier="T2",
    doc="Full outer join (T2.3): customer-count per nation vs supplier-"
    "count per nation; nations with only one side keep a NULL-padded "
    "row. Both inputs are pre-aggregated (tiny) — at 100 TB full outer "
    "between facts shuffles both sides on the join key.",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_customers
               FROM customer GROUP BY c_nationkey),
    s AS (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
          FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
           coalesce(c.n_customers, 0) AS n_customers,
           coalesce(s.n_suppliers, 0) AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    ORDER BY nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return (
        c.join(s, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


# --------------------------------------------------------------------------
# Deterministic sampling (reproducible splits for training pipelines)
# --------------------------------------------------------------------------
@query(
    "sample_hash_5pct",
    tier="T3",
    doc="Deterministic ~5% sample via md5(key) mod 100 < 5 — the "
    "reproducible-split pattern for train/eval partitioning at 100 TB "
    "(row-level RNG sampling is not reproducible across engines or "
    "re-runs; key-hash sampling is, and it is a pushdown-friendly "
    "filter).",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
               AS BIGINT) % 100 < 5
    ORDER BY o_orderkey
    """,
)
def sample_hash_5pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    return (
        o.filter(bucket < 5)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# T2.6 — exact discrete percentiles (manual, engine-portable)
# --------------------------------------------------------------------------
@query(
    "percentile_disc_price",
    tier="T2",
    doc="Exact p50/p90 order price per priority, computed as the "
    "ceil(p·n)-th row of the per-group sort (percentile_disc "
    "semantics) via row_number — integer-exact and identical in any "
    "engine, unlike interpolated percentile_cont whose float math is "
    "implementation-defined. One shuffle on the group key.",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey) AS rn,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    )
    SELECT o_orderpriority,
           max(CASE WHEN rn = (n + 1) // 2 THEN price_c END) / 100.0 AS p50_price,
           max(CASE WHEN rn = (9 * n + 9) // 10 THEN price_c END) / 100.0
             AS p90_price,
           max(n) AS n_orders
    FROM ranked
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def percentile_disc_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", cents("o_totalprice").alias("price_c")
    )
    w = Window.partitionBy("o_orderpriority").orderBy("price_c", "o_orderkey")
    wc = Window.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority",
        "price_c",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    return (
        ranked.groupBy("o_orderpriority")
        .agg(
            (
                F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("price_c")))
                / 100.0
            ).alias("p50_price"),
            (
                F.max(
                    F.when(F.col("rn") == F.expr("(9 * n + 9) div 10"), F.col("price_c"))
                )
                / 100.0
            ).alias("p90_price"),
            F.max("n").alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )
