"""Skew-mitigation operators (the 100 TB hot-key toolkit).

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; these explicit forms cover what AQE can't:

* `salted_join` — a shuffled equi-join where one side has pathological
  hot keys AND the other side is too big to broadcast. The skewed side
  gets a deterministic per-row salt, the other side is replicated
  across all salt values, and the join key becomes (key, salt) — one
  hot key spreads over `num_salts` reducers.
* `salted_agg` — two-phase aggregation for hot GROUP BY keys with
  non-algebraic combine concerns: partial agg on (key, salt), final
  re-agg on key. (Spark's hash aggregate already map-side combines;
  the explicit form exists for collect-heavy aggs whose partials are
  themselves large.)

Salts are DETERMINISTIC (hash of a caller-named spread column, e.g. a
unique id), never rand(): task retries must salt identically or
exactly-once sinks see different data per attempt.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(spread_col: str, num_salts: int) -> Column:
    return F.pmod(F.xxhash64(F.col(spread_col)), F.lit(num_salts))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    spread_col: str,
    how: str = "inner",
    num_salts: int = 16,
) -> DataFrame:
    """Equi-join with the skewed side salted and `other` replicated.

    Result equals `skewed.join(other, on, how)` for how in
    {inner, left}. `spread_col` must be a column of `skewed` with high
    cardinality (an id) — it only spreads rows, values don't matter.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    s = skewed.withColumn("__salt", _salt(spread_col, num_salts))
    o = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    joined = s.join(o, [on, "__salt"], how)
    return joined.drop("__salt")


def salted_agg(
    df: DataFrame,
    key: str,
    spread_col: str,
    aggs: Sequence[tuple[str, str, str]],
    num_salts: int = 32,
) -> DataFrame:
    """Two-phase agg: (key, salt) partials → key finals.

    `aggs` = [(col, fn, out_alias)] with fn in {sum, count, min, max} —
    the algebraic functions whose partials re-combine exactly.
    """
    partial_exprs = []
    final_exprs = []
    for col, fn, alias in aggs:
        p = f"__p_{alias}"
        if fn == "count":
            partial_exprs.append(F.count(col).alias(p))
            final_exprs.append(F.sum(p).cast("long").alias(alias))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(alias))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(alias))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(alias))
        else:
            raise ValueError(f"non-algebraic agg fn: {fn}")
    return (
        df.withColumn("__salt", _salt(spread_col, num_salts))
        .groupBy(key, "__salt")
        .agg(*partial_exprs)
        .groupBy(key)
        .agg(*final_exprs)
    )
