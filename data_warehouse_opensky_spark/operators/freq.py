"""Frequent-item (heavy-hitter) mining at scale: Misra–Gries propose,
exact verify.

The naive exact answer — groupBy(token).count().filter(cnt >= T) —
shuffles EVERY distinct token. At 100 TB the token key space is the
problem: the shuffle is dominated by the long tail that can never
qualify. The scale shape used here is the standard two-phase
mergeable-summaries design (Agarwal et al., "Mergeable Summaries",
PODS 2012):

1. PROPOSE — each input partition runs a Misra–Gries sketch of
   capacity k (vectorized: per-Arrow-batch value_counts merged into
   the running sketch, then one δ-decrement where δ = the (k+1)-th
   largest counter). MG guarantees est(x) ≥ c_p(x) − n_p/(k+1), and
   by the max-ratio pigeonhole any item with global count ≥ N/r has
   a partition where c_p/n_p ≥ 1/r — so with k+1 > r (we use
   k = 512 for r ≈ 200, a 2.5× margin) every true heavy hitter
   survives in at least one partition's sketch. Output: candidate
   tokens only (≤ partitions·k rows, kilobytes).
2. VERIFY — exact counts for candidates only: broadcast-semi-join
   the token stream against the candidate set (scan-local filter, no
   tail shuffle), then an exact map-side-combined count and the
   threshold filter.

The final output is EXACTLY the true heavy-hitter set: the proposal
is a superset for any partitioning (so the nondeterministic Arrow
batch boundaries cannot change the answer), and verification is
exact — which is what lets a sketch-based operator sit behind a
plain GROUP BY/HAVING SQL oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Sketch capacity. Must exceed the inverse threshold r (items with
#: count ≥ N/r); 512 vs r=200 leaves margin for the integer-floor
#: threshold edge at small N.
MG_CAPACITY = 512


def _mg_shrink(acc: pd.Series, k: int) -> pd.Series:
    """One Misra–Gries decrement: keep ≤ k counters."""
    if len(acc) <= k:
        return acc
    delta = acc.nlargest(k + 1).iloc[-1]
    acc = acc - delta
    return acc[acc > 0]


def heavy_hitters(
    tokens: DataFrame, *, col: str = "token", inv_threshold: int = 200
) -> DataFrame:
    """Tokens with exact count ≥ max(N // inv_threshold, 1).

    Returns (token, cnt) — the exact qualifying set regardless of
    partitioning; ordered by the caller.
    """
    k = MG_CAPACITY
    assert k + 1 > inv_threshold, "sketch capacity must exceed 1/threshold"

    # The token stream feeds THREE consumers (the sketch pass, the
    # exact total, the verify count) and typically arrives as an
    # unpersisted explode over the document scan — persist it so the
    # tokenization runs once instead of three times (guide §5: reuse
    # plus non-trivial recompute; cache lifecycle follows the catalog
    # contract — session owner clears).
    tokens = tokens.persist()

    def propose(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = pd.Series(dtype="int64")
        for pdf in batches:
            # Vectorized batch count, then one sketch merge + shrink.
            b = pdf[col].value_counts()
            acc = acc.add(b, fill_value=0) if len(acc) else b.astype("int64")
            acc = _mg_shrink(acc, k)
        if len(acc):
            yield pd.DataFrame({col: acc.index.astype(str)})

    candidates = tokens.mapInPandas(propose, f"{col} string").distinct()

    # Exact scalar total (control-plane; one map-side-combined count).
    n_total = tokens.count()
    threshold = max(n_total // inv_threshold, 1)

    return (
        tokens.join(F.broadcast(candidates), col, "semi")
        .groupBy(col)
        .agg(F.count("*").cast("long").alias("cnt"))
        .filter(F.col("cnt") >= threshold)
    )
