"""Golden reference-faithfulness tests (SURVEY §5): run the §1.3
transform on the reference's own 14 sample CSVs and assert the exact
null profile / types / values recorded in SURVEY §1.3 — the closest
thing to a golden corpus the reference provides."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_warehouse_opensky_spark.schemas import CLEAN_COLUMNS, RAW_SCHEMA
from data_warehouse_opensky_spark.transform import clean_state_vectors

REF_GLOB = "/root/reference/data/states_*.csv"

GOLDEN_NULLS = {
    "baro_altitude": 295,
    "vertical_rate": 324,
    "geo_altitude": 334,
    "squawk": 262,
    "callsign": 27,
    "velocity": 1,
    "sensors": 1834,
}


@pytest.fixture(scope="module")
def clean(spark):
    raw = spark.read.csv(REF_GLOB, header=True, schema=RAW_SCHEMA)
    df = clean_state_vectors(raw)
    df.cache().count()
    return df


def test_row_count_and_columns(clean):
    assert clean.count() == 1834
    assert list(clean.columns) == list(CLEAN_COLUMNS)


def test_golden_null_profile(clean):
    aggs = [
        (F.count("*") - F.count(c)).alias(c) for c in GOLDEN_NULLS
    ]
    row = clean.agg(*aggs).first().asDict()
    assert row == GOLDEN_NULLS


def test_distinct_aircraft(clean):
    assert clean.select("icao24").distinct().count() == 1447


def test_position_source_always_zero(clean):
    vals = [r[0] for r in clean.select("position_source").distinct().collect()]
    assert vals == [0]


def test_callsign_padding_preserved(clean):
    """SURVEY §1.3: 8-char right-padded callsigns must NOT be trimmed."""
    padded = clean.filter(F.col("callsign").rlike(" $")).count()
    assert padded > 0
    lens = (
        clean.filter(F.col("callsign").isNotNull())
        .select(F.length("callsign").alias("n"))
        .distinct()
        .collect()
    )
    assert {r.n for r in lens} == {8}


def test_strict_bool_semantics(spark):
    """on_ground/spi: lowercase true/false only; Spark's wider boolean
    vocabulary (t/f/y/n/0/1) must map to NULL (SURVEY §1.3 contract)."""
    rows = [("x", v) for v in ["True", "FALSE", "true", "t", "1", "yes", "", None]]
    raw = spark.createDataFrame(rows, ["icao24", "on_ground"])
    out = clean_state_vectors(raw).select("on_ground").collect()
    assert [r.on_ground for r in out] == [True, False, True, None, None, None, None, None]


def test_numeric_coercion_to_null(spark):
    raw = spark.createDataFrame(
        [("x", "12.5"), ("x", "garbage"), ("x", ""), ("x", None), ("x", "-3e2")],
        ["icao24", "velocity"],
    )
    out = [r.velocity for r in clean_state_vectors(raw).select("velocity").collect()]
    assert out == [12.5, None, None, None, -300.0]


def test_epoch_conversion(spark):
    raw = spark.createDataFrame(
        [("x", "1700000000"), ("x", "bad"), ("x", None)],
        ["icao24", "time_position"],
    )
    out = clean_state_vectors(raw).select(
        F.unix_timestamp("time_position").alias("s")
    ).collect()
    assert [r.s for r in out] == [1700000000, None, None]


def test_missing_columns_backfilled_null(spark):
    """load_warehouse.py:87-89: absent raw columns appear as NULL."""
    raw = spark.createDataFrame([("abc123",)], ["icao24"])
    out = clean_state_vectors(raw)
    assert list(out.columns) == list(CLEAN_COLUMNS)
    row = out.first()
    assert row.icao24 == "abc123"
    assert row.velocity is None and row.squawk is None


def test_squawk_stays_string(clean):
    """Documented divergence: squawk keeps leading zeros (the reference
    float-ifies by accident — SURVEY §1.3)."""
    assert dict(clean.dtypes)["squawk"] == "string"
    lead0 = clean.filter(F.col("squawk").startswith("0")).count()
    assert lead0 > 0  # corpus contains leading-zero squawks worth protecting
