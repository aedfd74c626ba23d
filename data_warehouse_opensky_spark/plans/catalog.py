"""Query catalog: every operator from SURVEY.md §2 is a named query.

Each entry pairs a Spark DataFrame program with (when SQL-expressible)
an equivalent ANSI-SQL oracle that DuckDB runs on the same parquet
tables. The driver compares row-count + schema + order-insensitive
value-hash, so cross-engine determinism rules apply:

* Grid-valued numerics (money = 2 decimals, rates = 2 decimals) are
  aggregated in exact integer fixed-point (cents / basis points) and
  only converted to double at the end — double SUMs are
  order-dependent and Spark's partial aggregation order is
  nondeterministic, so raw `sum(double)` can never hash-match.
* Continuous values (cosine similarity, ratios of large integers) are
  safe to `round(x, k)` — the probability of landing within an ulp of
  a rounding boundary is ~0 for genuinely continuous data.
* Timestamps are never output raw (parquet ns vs Spark µs vs session
  tz): output epoch seconds as BIGINT or `yyyy-MM-dd` strings.
* Orderings that feed window functions always carry a unique-key
  tiebreaker (`event_id`), because Spark's µs truncation of the ns
  event timestamps can create ties DuckDB doesn't see.
* Every computed column is aliased identically in both programs.

Cache lifecycle contract: query fns may persist() shared subtrees
(iterative ranks, dedup signatures, sampling bases) and never
unpersist them — the returned DataFrame is lazy, so the cache must
survive past the fn() call. The SESSION OWNER (bench.py, the oracle
harness, the external driver) is responsible for
`spark.catalog.clearCache()` after it has run its action; both
in-repo harnesses do.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver runs rows-only check
    tier: str  # "T1" | "T2" | "T3"
    doc: str = ""


QUERIES: dict[str, Query] = {}


def query(name: str, *, oracle: str | None, tier: str, doc: str = ""):
    """Register a catalog query. Used as a decorator on (spark, sf_dir) fns."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, tier=tier, doc=doc)
        return fn

    return deco


def reorder(front: list[str]) -> None:
    """Move `front` queries (in the given order) to the head of the registry.

    dicts preserve insertion order, and the external driver checks only
    the first N queries of `get_queries()` — rotating the front cycles
    driver verification across the catalog round by round. Names not in
    `front` keep their relative registration order after it. Unknown
    names are an error (catches typos when the catalog evolves).
    """
    unknown = [n for n in front if n not in QUERIES]
    if unknown:
        raise ValueError(f"reorder: unknown query names: {unknown}")
    rest = {n: q for n, q in QUERIES.items() if n not in set(front)}
    ordered = {n: QUERIES[n] for n in front}
    ordered.update(rest)
    QUERIES.clear()
    QUERIES.update(ordered)


def get_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in QUERIES.items()}


def get_oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
