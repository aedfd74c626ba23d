"""T3.5 — the user-defined-function surface, plus JSON functions.

One catalog query per UDF flavor, each with an exact DuckDB oracle:

* scalar pandas UDF (Arrow-vectorized, the ONLY sanctioned Python
  scalar path — row-at-a-time `udf()` is deliberately absent from this
  codebase's hot paths);
* grouped-aggregate pandas UDF (vectorized UDAF);
* grouped-map `applyInPandas` (the reference's `transform_chunk`,
  load_warehouse.py:62-91, is exactly this shape: pandas-function over
  a partition of rows);
* Spark 4 Python UDTF (table function, 1 row → N rows).

Determinism: every UDF computes in EXACT integer arithmetic (numpy
int64 / Python int) so results hash-match SQL engines bit-for-bit —
the float-summation-order trap (catalog.py) applies doubly to numpy
whose pairwise sums differ from any SQL engine's fold order.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cents
from ..sources import load_table
from .catalog import query

# NOTE: @pandas_udf decorators parse their DDL return type against the
# ACTIVE SparkSession, so UDFs are defined lazily inside each query fn
# (this module imports at package load, before any session exists).


# --------------------------------------------------------------------------
# JSON functions (T1.2 at rest: the API payload decode generalized)
# --------------------------------------------------------------------------
@query(
    "json_extract_props",
    tier="T2",
    doc="JSON field extraction from the events.props column "
    "(get_json_object — the at-rest twin of the API JSON decode "
    "T1.2), aggregated per event_type. JSON parse stays JVM-side.",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS n_distinct_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.countDistinct("k").alias("n_distinct_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# T3.5a — scalar pandas UDF (Arrow batches)
# --------------------------------------------------------------------------
@query(
    "udf_scalar_token_count",
    tier="T3",
    doc="Scalar pandas UDF over Arrow batches (T3.5): vectorized "
    "token count per document. Integer-exact, so it hash-matches the "
    "pure-SQL twin — proving the Python path gives identical results "
    "to the JVM path it would replace.",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
    ORDER BY doc_id
    """,
)
def udf_scalar_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def ws_token_count(s: pd.Series) -> pd.Series:
        # Vectorized pandas str ops (== size(split(text, ' ')))
        return (s.str.count(" ") + 1).astype("int64")

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", ws_token_count(F.col("text")).alias("n_tokens")
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# T3.5b — grouped-aggregate pandas UDF (vectorized UDAF)
# --------------------------------------------------------------------------
@query(
    "udf_grouped_agg_spend",
    tier="T3",
    doc="Grouped-aggregate pandas UDF (T3.5 UDAF): per-priority-class "
    "spend summed as int64 cents inside Python, exactly matching SQL "
    "SUM. Key doctrine (same as the grouped-map twin below): a pandas "
    "UDAF pays one Python invocation PER GROUP, so it wants FEW LARGE "
    "groups — this query originally grouped by o_custkey (~15k "
    "groups) and measured 12.2 s at sf0.1 in the first full-catalog "
    "bench (r6) vs sub-second on the 5-group priority key, identical "
    "data. High-cardinality grouped aggregation belongs to built-in "
    "JVM aggs (pricing_summary, agg_minmax_by); a UDAF is for custom "
    "reduction "
    "logic over coarse segments.",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS total_spent
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def udf_grouped_agg_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def sum_int64(v: pd.Series) -> int:
        # Exact int64 sum — safe as a UDAF because integer addition is
        # order-independent (float sums would NOT be).
        return int(v.sum())

    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderpriority", cents("o_totalprice").alias("price_c"))
        .groupBy("o_orderpriority")
        .agg((sum_int64("price_c") / 100.0).alias("total_spent"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# T3.5c — grouped-map applyInPandas (the reference transform_chunk shape)
# --------------------------------------------------------------------------
def _order_share(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per priority class: each order's share of class spend in exact
    ppm (billionths would overflow ×1e9; ppm fits int64).

    Same shape as the reference's transform_chunk
    (load_warehouse.py:62-91): DataFrame-in → DataFrame-out over a
    group of rows, vectorized pandas inside. Grouping key chosen
    COARSE on purpose: applyInPandas pays per-group Arrow round-trip
    overhead, so the scalable pattern is few large groups (grouping by
    a 100k-cardinality key measured 20× slower on identical data).
    """
    total = int(pdf["price_c"].sum())
    out = pdf[["o_orderpriority", "o_orderkey"]].copy()
    # floor-div ppm — integer-exact, engine-reproducible
    out["share_ppm"] = (pdf["price_c"].astype("int64") * 1_000_000) // total
    return out


@query(
    "udf_grouped_map_share",
    tier="T3",
    doc="Grouped-map applyInPandas (T3.5): per-priority order-spend "
    "share in exact ppm. The reference's transform_chunk "
    "(load_warehouse.py:62-91) is exactly this operator shape. Coarse "
    "group key on purpose — applyInPandas scales with FEW LARGE "
    "groups, not many tiny ones.",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           (CAST(round(o_totalprice * 100) AS BIGINT) * 1000000)
             // CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    OVER (PARTITION BY o_orderpriority) AS BIGINT) AS share_ppm
    FROM orders
    ORDER BY o_orderpriority, o_orderkey
    """,
)
def udf_grouped_map_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", cents("o_totalprice").alias("price_c")
    )
    return (
        o.groupBy("o_orderpriority")
        .applyInPandas(
            _order_share,
            schema="o_orderpriority string, o_orderkey long, share_ppm long",
        )
        .orderBy("o_orderpriority", "o_orderkey")
    )


# --------------------------------------------------------------------------
# T3.5d — Python UDTF (Spark 4 table function, 1 row → N rows)
# --------------------------------------------------------------------------
@query(
    "udtf_token_positions",
    tier="T3",
    doc="Python UDTF (T3.5, Spark 4): explode each document into "
    "(position, token) rows via a lateral table-function call — the "
    "Python twin of posexplode(split(...)).",
    oracle="""
    SELECT doc_id,
           CAST(i AS INTEGER) AS pos,
           string_split(text, ' ')[i] AS token
    FROM documents,
         unnest(range(1, len(string_split(text, ' ')) + 1)) AS t(i)
    WHERE doc_id < 100
    ORDER BY doc_id, pos
    """,
)
def udtf_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, token: string")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" "), start=1):
                yield i, tok

    spark.udtf.register("tokenize_udtf", Tokenize)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    d.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM __udtf_docs d, LATERAL tokenize_udtf(d.text) t
        ORDER BY d.doc_id, t.pos
        """
    )


# --------------------------------------------------------------------------
# T2 — VARIANT semi-structured type (Spark 4)
# --------------------------------------------------------------------------
@query(
    "json_variant_extract",
    tier="T2",
    doc="Spark 4 VARIANT path for semi-structured data: props parses "
    "ONCE to a VARIANT (binary-encoded, typed) and every access is "
    "try_variant_get with a typed path — vs json_extract_props, "
    "which re-parses the JSON string per access. At 100 TB the "
    "VARIANT column is stored parsed (write once, read many), so "
    "repeated field access never re-tokenizes text; the null arm "
    "(try_ on a missing path) is exercised alongside the hit path. "
    "All extraction stays JVM-side in codegen.",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k,
           CAST(count(CAST(json_extract_string(props, '$.missing') AS BIGINT))
                AS BIGINT) AS n_missing_hits
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.parse_json("props").alias("v")
    )
    k = F.try_variant_get("v", "$.k", "bigint")
    miss = F.try_variant_get("v", "$.missing", "bigint")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.max(k).alias("max_k"),
            F.count(miss).alias("n_missing_hits"),
        )
        .orderBy("event_type")
    )
