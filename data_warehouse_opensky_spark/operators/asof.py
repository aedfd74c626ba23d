"""As-of join and latest-per-key — the temporal operators of SURVEY T2.5.

The reference's data model (10-minute crawl snapshots of a live fleet,
extract_script.py crawl loop) makes "latest state per key as of T" its
flagship semantic; Spark has no built-in as-of join, so we implement it
as a composition of existing DataFrame ops (SURVEY §2 guidance).

Algorithm (the scalable one): UNION both sides with a side tag, hash-
partition once by the join key, sort within partition by the time key,
and propagate the most recent right-side values to each left row with
``last(..., ignorenulls=True)`` over an unbounded-preceding window.
Cost: ONE shuffle of |L|+|R| rows and an in-partition sort — no
pairwise join blowup, no range-condition nested loop. This is the plan
you want at 100 TB; a naive `L join R on key and r.ts <= l.ts` +
row_number would shuffle |L|·|R_matches| intermediate rows.

Skew note: a hot key (one aircraft emitting most events) concentrates
one partition; AQE skew handling does not split windows, so for known-
skewed domains pre-bucket the time range (e.g. day) into the partition
key and stitch boundaries — not needed at bench scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str | Sequence[str],
    right_time: str | Sequence[str],
    right_values: dict[str, Column],
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the most recent right-side values.

    Parameters
    ----------
    on : equality key(s) — the shuffle partition key.
    left_time / right_time : ordering key(s); include a unique id as the
        last component to make the order total (ns-vs-µs timestamp ties
        are real — SURVEY determinism notes).
    right_values : {output_name: column expression over `right`}.
    strict : if True, a right row whose full time key exactly equals a
        left row's is NOT visible to it (`<` instead of `<=`). With a
        unique id in the time key, exact full-key ties across sides are
        impossible, so this only matters for pure-timestamp keys.
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    lt = [left_time] if isinstance(left_time, str) else list(left_time)
    rt = [right_time] if isinstance(right_time, str) else list(right_time)
    if len(lt) != len(rt):
        raise ValueError("left_time and right_time must have equal arity")

    tnames = [f"__asof_t{i}" for i in range(len(lt))]
    # side ordering at an exact time-key tie: right-before-left => right
    # visible ("<="); left-before-right => right hidden ("<").
    left_tag, right_tag = (0, 1) if strict else (1, 0)

    lsel = left.select(
        "*",
        *[F.col(c).alias(t) for c, t in zip(lt, tnames)],
        F.lit(left_tag).alias("__asof_side"),
        F.lit(True).alias("__asof_is_left"),
    )
    rsel = right.select(
        *on_cols,
        *[F.col(c).alias(t) for c, t in zip(rt, tnames)],
        F.lit(right_tag).alias("__asof_side"),
        F.lit(False).alias("__asof_is_left"),
        *[expr.alias(name) for name, expr in right_values.items()],
    )

    unioned = lsel.unionByName(rsel, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on_cols)
        .orderBy(*tnames, "__asof_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.when(~F.col("__asof_is_left"), F.col(name)), ignorenulls=True)
            .over(w)
            .alias(f"__asof_v_{name}")
            for name in right_values
        ],
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"__asof_v_{name}").alias(name) for name in right_values
    ]
    return filled.filter(F.col("__asof_is_left")).select(*out_cols)


def latest_per_key(
    df: DataFrame,
    keys: str | Sequence[str],
    order: str | Sequence[str],
) -> DataFrame:
    """Latest row per key (T2.5): row_number over (key, order desc) == 1.

    Single shuffle; with AQE the final filter collapses early. The
    `order` key should end with a unique id for a total order.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order = [order] if isinstance(order, str) else list(order)
    w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in order])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
