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
