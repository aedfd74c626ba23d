"""Local replica of the driver's correctness gate: run every catalog
query in Spark AND its DuckDB oracle, compare row count + column names
+ order-insensitive values. Strict equality for exact types; tight
tolerance fallback for floats (the catalog aims for bit-equality, the
tolerance only localizes a failure to 'float drift' vs 'wrong rows').

Materialization fidelity (round-2 post-mortem): the driver converts
BOTH result sets to pandas before hashing, so DuckDB type promotions
that only surface in pandas MUST surface here too. The canonical trap:
DuckDB `sum()` over any integer type returns HUGEINT (INT128), which
`fetchall()` hands over as a Python int (lossless, matches Spark) but
pandas `.df()` coerces to float64 (`956.0` != `956` in the hash).
Round 2 shipped five such oracles green locally / red at the driver.
Hence both sides now go through pandas: Spark via `toPandas()`, DuckDB
via `.df()`, with numpy scalars normalized — one-sided promotion now
fails locally before it fails in CORRECTNESS.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import numpy as np
import pandas as pd

from data_warehouse_opensky_spark.sources import TABLES


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int = -1
    oracle_rows: int = -1
    errors: list[str] = field(default_factory=list)
    #: sha256 over the driver-normalized, column-sorted, order-
    #: insensitive Spark result — the result-pinning scheme
    #: (VERDICT r7 #8): a recorded hash per (query, fixture) lets a
    #: later round prove "result unchanged" locally without re-running
    #: the DuckDB twin, so external-driver slots can concentrate on
    #: new and changed plans.
    spark_hash: str = ""


def result_hash(cols, rows) -> str:
    """Stable digest of a normalized result set (driver hash semantics:
    lowercase column names sorted, rows order-insensitive, values
    through the same type-tag normalization the compare uses)."""
    import hashlib

    payload = repr((sorted(cols), _sorted_rows(cols, rows)))
    return hashlib.sha256(payload.encode()).hexdigest()


def fixture_digest(sf_dir: str) -> str:
    """Digest of the fixture the pins were recorded against — pin
    checks are void (skipped loudly) when the driver regenerates
    testdata. File bytes, not mtimes: a byte-identical regeneration
    keeps pins valid."""
    import hashlib
    import os

    h = hashlib.sha256()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        h.update(t.encode())
        if os.path.exists(p):
            with open(p, "rb") as f:
                h.update(hashlib.md5(f.read()).digest())
    return h.hexdigest()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    # pandas materialization hands back numpy scalars; unwrap them so
    # the type tag reflects what the driver's hash sees (np.float64 ->
    # float, np.int64 -> int, np.bool_ -> bool). None/NaT/NaN unify.
    if isinstance(v, np.generic):
        v = v.item()
    if v is None or v is pd.NaT:
        return ("n", None)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", v)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    return ("s", str(v))


def _sorted_rows(cols, rows):
    # driver semantics: sort columns by name, order-insensitive rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(name: str, sdf, oracle: str, con) -> CompareResult:
    res = CompareResult(name=name, ok=True)
    # Driver-faithful materialization: BOTH engines through pandas.
    spdf = sdf.toPandas()
    scols = [str(c).lower() for c in spdf.columns]
    srows = list(spdf.itertuples(index=False, name=None))
    res.spark_hash = result_hash(scols, srows)
    odf = con.execute(oracle).df()
    ocols = [str(c).lower() for c in odf.columns]
    orows = list(odf.itertuples(index=False, name=None))
    res.spark_rows, res.oracle_rows = len(srows), len(orows)

    if sorted(scols) != sorted(ocols):
        res.ok = False
        res.errors.append(f"columns differ: spark={sorted(scols)} duck={sorted(ocols)}")
        return res
    if len(srows) != len(orows):
        res.ok = False
        res.errors.append(f"row count: spark={len(srows)} duck={len(orows)}")

    a = _sorted_rows(scols, srows)
    b = _sorted_rows(ocols, orows)
    mism = 0
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra == rb:
            continue
        # float-tolerance diagnostic pass
        close = len(ra) == len(rb) and all(
            (
                ta == tb
                and (
                    va == vb
                    or (
                        ta == "f"
                        and isinstance(va, float)
                        and isinstance(vb, float)
                        and abs(va - vb) <= 1e-9 * max(1.0, abs(va), abs(vb))
                    )
                )
            )
            for (ta, va), (tb, vb) in zip(ra, rb)
        )
        mism += 1
        if mism <= 3:
            tag = "FLOAT-DRIFT" if close else "VALUE"
            res.errors.append(f"{tag} row {i}: spark={ra} duck={rb}")
    if mism:
        res.ok = False
        res.errors.append(f"{mism} mismatched rows total")
    return res


def run_all(spark, sf_dir: str, names: list[str] | None = None) -> list[CompareResult]:
    from data_warehouse_opensky_spark.plans import QUERIES

    con = duck_connection(sf_dir)
    results = []
    for name, q in QUERIES.items():
        if names and name not in names:
            continue
        try:
            sdf = q.fn(spark, sf_dir)
            if q.oracle is None:
                n = sdf.count()
                results.append(
                    CompareResult(name=name, ok=n >= 0, spark_rows=n, oracle_rows=-1)
                )
                continue
            results.append(compare(name, sdf, q.oracle, con))
        except Exception as ex:  # noqa: BLE001
            results.append(
                CompareResult(name=name, ok=False, errors=[f"EXCEPTION: {ex}"])
            )
        finally:
            # Queries persist() shared subtrees (pagerank edges, kmeans
            # base, dedup signatures) and intentionally do NOT unpersist
            # — the returned DataFrame is lazy, so the cache must outlive
            # the fn() call; the SESSION OWNER drops it after the action.
            # Mirror bench.py so a full-catalog sweep in one long-lived
            # session doesn't accumulate every query's cached blocks.
            spark.catalog.clearCache()
    return results
