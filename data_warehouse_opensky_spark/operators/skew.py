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

* `capped_block_self_pairs` — a blocked self-join (candidate-pair
  generation for dedup/ER) where one block key may be pathologically
  hot (boilerplate prefixes: every same-length doc opening with
  "<!DOCTYPE html" lands in ONE block). The triangle / fragment-
  replicate split: rows in a block of size n get one of
  g = ceil(n / cap) deterministic salts; each row is replicated to
  the g reducer cells (min(salt,i), max(salt,i)), so the block's
  n²/2 pairs spread over g(g+1)/2 tasks of ≤ ~cap² kernel area each
  — EXACT pair semantics (every unordered pair meets in exactly one
  cell), no pair dropped, no pair duplicated. Small blocks have
  g = 1 → zero replication, the plan degrades to the plain equi-join.

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


#: Persisted relations from the LAST capped_block_self_pairs call.
#: They cannot be unpersisted before the (lazy) returned plan runs, so
#: each new invocation releases the previous one's caches and
#: `release_caches()` lets a long-running session drop the final set —
#: bounding cache accumulation at one invocation's worth instead of
#: growing without bound across a 200-query bench run (ADVICE r11).
#: Unpersisting a still-referenced plan is always safe: Spark just
#: recomputes the subtree if it is re-executed.
_LIVE_CACHES: list[DataFrame] = []


def release_caches() -> None:
    """Unpersist relations cached by prior capped_block_self_pairs
    invocations (see _LIVE_CACHES)."""
    while _LIVE_CACHES:
        df = _LIVE_CACHES.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing left to release


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


def capped_block_self_pairs(
    df: DataFrame,
    block_cols: Sequence[str],
    id_col: str,
    cap: int = 256,
    max_splits: int = 64,
) -> DataFrame:
    """Unordered within-block pairs with hot blocks triangle-split.

    Returns one row per unordered pair of distinct `df` rows sharing
    `block_cols`, with the pair's two rows as struct columns `a` and
    `b` (all original columns each) ordered `a[id_col] < b[id_col]` —
    exactly the pairs of the naive self-equi-join, but a block of
    n > cap rows is processed by ceil(n/cap)·(ceil(n/cap)+1)/2
    reducer cells instead of one.

    Why exact: row x with salt s(x) ∈ [0, g) is replicated to cells
    {(min(s(x), i), max(s(x), i)) : i ∈ [0, g)}. A pair (x, y) shares
    cell (min(s(x), s(y)), max(s(x), s(y))); the orientation filter
    (a.salt, b.salt) == (lo, hi) or (hi, lo) admits it ONLY there —
    same-salt pairs also co-occur in off-diagonal cells but carry
    (s, s) ≠ (lo, hi), so only their diagonal cell (s, s) emits.

    Cost: replication factor is g per row (1 for blocks ≤ cap), so
    total extra shuffle volume is paid only by hot blocks — the rows
    whose pair work is quadratic anyway. `max_splits` bounds the
    replication factor of a single monster block (64 splits already
    spreads one block over 2080 cells).

    Per-block g rides a count aggregate on the SAME key as the pair
    join — one extra map-side-combined agg + one equi-join, no
    broadcast assumption (the block-count table scales with block
    cardinality, not corpus size).

    Plan structure is a CONTROL-PLANE decision (the triangle-count
    join-strategy doctrine, plans/graph.py): one scalar aggregate
    reads the max block size up front. If no block exceeds the cap —
    the common, unskewed case — the returned plan IS the plain
    self-equi-join, zero extra operators (measured: the always-on
    split machinery cost ~2.5x plain in fixed per-row overhead on the
    5k-doc bench corpus, a permanent tax on the unskewed 99%). Above
    the cap, blocks <= cap take the plain join, hot blocks take the
    triangle cells, and the two pair sets union. The scalar read is
    one map-side-combined count-agg + max — block-cardinality-sized,
    the same budget class as the cached edge-count gate.
    """
    blocks = list(block_cols)

    def _plain(frame):
        fa, fb = frame.alias("a"), frame.alias("b")
        return fa.join(
            fb,
            [F.col(f"a.{c}") == F.col(f"b.{c}") for c in blocks]
            + [F.col(f"a.{id_col}") < F.col(f"b.{id_col}")],
        ).select(
            F.struct(*[F.col(f"a.{c}") for c in df.columns]).alias("a"),
            F.struct(*[F.col(f"b.{c}") for c in df.columns]).alias("b"),
        )

    # Release the previous invocation's caches before adding new ones
    # (bounded-accumulation contract, see _LIVE_CACHES).
    release_caches()

    # One pass over the corpus computes the block-count table; persist
    # it (block-cardinality-sized, NOT corpus-sized) so the gate scalar
    # below and the tagging join share the same computation instead of
    # re-scanning df.
    counts = df.groupBy(*blocks).agg(F.count("*").alias("__n")).persist()
    max_n = counts.agg(F.max("__n")).collect()[0][0] or 0
    if max_n <= cap:
        counts.unpersist()
        return _plain(df)
    _LIVE_CACHES.append(counts)

    # Both the small-block and hot-block branches filter this join;
    # persisting it avoids scanning df twice more. It is corpus-sized,
    # but only materialized when skew was actually detected (the rare
    # path), and only the join output — no pair expansion yet.
    tagged = df.join(counts, blocks).persist()
    _LIVE_CACHES.append(tagged)
    # plain path: every block at or below the cap
    small_pairs = _plain(tagged.filter(F.col("__n") <= cap).drop("__n"))

    # triangle path: hot blocks only (empty on an unskewed corpus)
    g = F.greatest(
        F.least(
            F.ceil(F.col("__n") / F.lit(cap)).cast("int"), F.lit(max_splits)
        ),
        F.lit(1),
    )
    salted = (
        tagged.filter(F.col("__n") > cap)
        .withColumn("__g", g)
        .withColumn(
            "__salt",
            F.pmod(F.xxhash64(F.col(id_col)), F.col("__g")).cast("int"),
        )
        .drop("__n")
    )
    cells = salted.withColumn(
        "__i", F.explode(F.sequence(F.lit(0), F.col("__g") - 1))
    ).select(
        *blocks,
        F.least("__salt", "__i").alias("__lo"),
        F.greatest("__salt", "__i").alias("__hi"),
        F.col("__salt"),
        *[F.col(c).alias(f"__c_{c}") for c in df.columns],
    )
    ha, hb = cells.alias("a"), cells.alias("b")
    on = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in blocks] + [
        F.col("a.__lo") == F.col("b.__lo"),
        F.col("a.__hi") == F.col("b.__hi"),
        F.col(f"a.__c_{id_col}") < F.col(f"b.__c_{id_col}"),
    ]
    oriented = (
        (F.col("a.__salt") == F.col("a.__lo"))
        & (F.col("b.__salt") == F.col("a.__hi"))
    ) | (
        (F.col("a.__salt") == F.col("a.__hi"))
        & (F.col("b.__salt") == F.col("a.__lo"))
    )
    hot_pairs = (
        ha.join(hb, on)
        .filter(oriented)
        .select(
            F.struct(
                *[F.col(f"a.__c_{c}").alias(c) for c in df.columns]
            ).alias("a"),
            F.struct(
                *[F.col(f"b.__c_{c}").alias(c) for c in df.columns]
            ).alias("b"),
        )
    )
    return small_pairs.unionByName(hot_pairs)
