"""Canonical multi-way-join reporting queries (TPC-H analogs restricted
to the testdata's columns) — the delegated-SQL reporting tier the
reference's diagram stage 5 produces, at full star-schema width:
4-6-way joins with selective date/dim predicates, exercising Catalyst's
join ordering, dim broadcasting, and scan-level date pushdown.

Money doctrine (plans/catalog.py): discounted revenue aggregates as the
exact int64 `cents · (100 − discount%)` product (1e-4 dollar units) —
`sum(extendedprice * (1 - discount))` in float would be
partial-order-dependent and could never hash-match. Ratios divide
exact integers at the end.

Int64 headroom: e4-unit revenue is ~1e9/row, so a group's sum stays
inside int64 up to ~10^9 rows per group — comfortable for nation/year
grains at bench and mid scales. A true-100 TB deployment with
billion-row groups lifts the accumulator to DECIMAL(38,0), exactly as
plans/stats.py does for its sufficient statistics; the plan shape is
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cents
from ..sources import load_table
from .catalog import query


def _rev_e4() -> F.Column:
    """Exact discounted revenue in 1e-4 dollar units."""
    return cents("l_extendedprice") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )


_REV_E4_SQL = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)


# --------------------------------------------------------------------------
# Q5 analog — local supplier volume (6-way star join, same-nation predicate)
# --------------------------------------------------------------------------
@query(
    "report_local_supplier_volume",
    tier="T2",
    doc="TPC-H Q5 analog: revenue per nation from orders where the "
    "customer and the line's supplier share a nation, restricted to "
    "ASIA and order year 1996 — the canonical 6-way star join. Plan "
    "shape: region→nation prunes to a handful of keys, all four dims "
    "broadcast, lineitem⋈orders is the only fact-fact work, and the "
    "order-date predicate pushes to the orders scan. The same-nation "
    "equality rides the supplier join as an extra key, never a "
    "post-join filter over the full fan-out. Revenue is the exact "
    "int64 e4 product.",
    oracle=f"""
    SELECT n.n_name AS nation, CAST(sum({_REV_E4_SQL}) AS BIGINT) AS revenue_e4
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
    GROUP BY 1
    ORDER BY revenue_e4 DESC, nation
    """,
)
def report_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.to_date("o_orderdate") >= F.lit("1996-01-01"))
            & (F.to_date("o_orderdate") < F.lit("1997-01-01"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", _rev_e4().alias("rev_e4")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum("rev_e4").cast("long").alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), "nation")
    )


# --------------------------------------------------------------------------
# Q7 analog — volume shipping between two nations, by direction and year
# --------------------------------------------------------------------------
@query(
    "report_volume_shipping",
    tier="T2",
    doc="TPC-H Q7 analog: trade volume between NATION_1 and NATION_2 "
    "in BOTH directions (supplier nation ↔ customer nation), per ship "
    "year 1996-1997. The nation-pair predicate is a broadcast join of "
    "two 1-row dims per side — the fact never fans out; the "
    "direction disjunction lives in the join condition so Catalyst "
    "can still push both nationkey IN-lists into the dim scans.",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(CAST(l.l_shipdate AS DATE)) AS BIGINT) AS ship_year,
           CAST(sum({_REV_E4_SQL}) AS BIGINT) AS revenue_e4
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
    WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
      AND year(CAST(l.l_shipdate AS DATE)) IN (1996, 1997)
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def report_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.year(F.to_date("l_shipdate")).cast("long").alias("ship_year"),
        _rev_e4().alias("rev_e4"),
    ).filter(F.col("ship_year").isin(1996, 1997))
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), s.s_nationkey == F.col("ns_key"))
        .join(F.broadcast(nc), c.c_nationkey == F.col("nc_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "ship_year")
        .agg(F.sum("rev_e4").cast("long").alias("revenue_e4"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


# --------------------------------------------------------------------------
# Q10 analog — returned-item reporting (top-20 customers by lost revenue)
# --------------------------------------------------------------------------
@query(
    "report_returned_items",
    tier="T2",
    doc="TPC-H Q10 analog: the 20 customers with the highest revenue "
    "on RETURNED lines (l_returnflag = 'R') over order half-year "
    "1996-H1 — the churn-risk report. The returnflag + date filters "
    "push to the scans; the customer/nation dims broadcast AFTER the "
    "per-customer aggregate (join on the small aggregated side, not "
    "the fact); top-20 rides TakeOrderedAndProject. Account balance "
    "in exact cents.",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(sum({_REV_E4_SQL}) AS BIGINT) AS revenue_e4,
           CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_c,
           n.n_name AS nation
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1996-07-01'
    GROUP BY 1, 2, 4, 5
    ORDER BY revenue_e4 DESC, c_custkey
    LIMIT 20
    """,
)
def report_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", _rev_e4().alias("rev_e4"))
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.to_date("o_orderdate") >= F.lit("1996-01-01"))
            & (F.to_date("o_orderdate") < F.lit("1996-07-01"))
        )
        .select("o_orderkey", "o_custkey")
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", cents("c_acctbal").alias("acctbal_c")
    )
    n = load_table(spark, sf_dir, "nation")
    per_cust = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("rev_e4").cast("long").alias("revenue_e4"))
    )
    return (
        per_cust.join(F.broadcast(c), per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            "revenue_e4",
            "acctbal_c",
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.desc("revenue_e4"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q14 analog — promotion effect (conditional-share aggregate over a join)
# --------------------------------------------------------------------------
@query(
    "report_promo_effect",
    tier="T2",
    doc="TPC-H Q14 analog: the share of revenue from PROMO-type parts "
    "among lines shipped in 1996-09, as an exact e6 integer ratio "
    "((1e6 · promo) div total) plus both raw sums — conditional "
    "aggregation over a fact⋈part join with the date filter pushed "
    "to the lineitem scan and the part dim broadcast. The float "
    "'100 * sum(case...)/sum(...)' of the original is the "
    "catalog-doctrine violation this query exists to avoid.",
    oracle=f"""
    SELECT CAST(sum(CASE WHEN p.p_type = 'PROMO'
                         THEN {_REV_E4_SQL} ELSE 0 END) AS BIGINT)
             AS promo_rev_e4,
           CAST(sum({_REV_E4_SQL}) AS BIGINT) AS total_rev_e4,
           CAST(1000000 * sum(CASE WHEN p.p_type = 'PROMO'
                                   THEN {_REV_E4_SQL} ELSE 0 END)
                // sum({_REV_E4_SQL}) AS BIGINT) AS promo_share_e6
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-09-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1996-10-01'
    """,
)
def report_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.to_date("l_shipdate") >= F.lit("1996-09-01"))
            & (F.to_date("l_shipdate") < F.lit("1996-10-01"))
        )
        .select("l_partkey", _rev_e4().alias("rev_e4"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", F.col("rev_e4")).otherwise(0)
    )
    total = F.sum("rev_e4")
    return j.agg(
        promo.cast("long").alias("promo_rev_e4"),
        total.cast("long").alias("total_rev_e4"),
        F.expr(
            "cast((1000000 * sum(case when p_type = 'PROMO' then rev_e4"
            " else 0 end)) div sum(rev_e4) as long)"
        ).alias("promo_share_e6"),
    )
