"""Driver contract for the spark-graft builder (PySpark target).

Everything is delegated to the query catalog
(`data_warehouse_opensky_spark.plans.catalog`): each SURVEY.md §2
operator is registered there with its Spark program and (when
SQL-expressible) an exact DuckDB oracle. Cross-engine determinism
rules (integer fixed-point money, no raw timestamps, total-order
tiebreaks, identical aliases) are documented in catalog.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_warehouse_opensky_spark.plans import get_oracles, get_queries
from data_warehouse_opensky_spark.plans.relational import join_star_revenue


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Scan → broadcast star join → exact fixed-point agg → sort: one of
    everything (SURVEY §7 v0 slice).
    """
    return join_star_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; keys missing here get the rows-only check."""
    return get_oracles()
