"""Reference-domain queries: the faithful clean transform + the
flagship state-vector analytics, run against the reference's own 14
sample CSVs (/root/reference/data — read-only, readable).

These queries ignore `sf_dir` (the reference corpus has one scale).
Their oracles replicate the SURVEY §1.3 coercion contract in DuckDB
(try_cast doubles, strict boolean vocabulary, epoch→timestamp), so the
driver's harness directly checks reference parity, not just TPC-H-ish
shapes. The same 1,834-row corpus backs the golden unit tests in
tests/test_transform.py (null profile from SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import RAW_SCHEMA
from ..session import configure_runtime
from ..transform import clean_state_vectors
from .catalog import query

REFERENCE_GLOB = "/root/reference/data/states_*.csv"

#: DuckDB twin of the §1.3 transform over the raw CSVs. all_varchar so
#: typing is OUR contract, not the CSV sniffer's (SURVEY §1.2).
_CLEAN_SQL = f"""
  SELECT try_cast(longitude AS DOUBLE) AS longitude,
         try_cast(latitude AS DOUBLE) AS latitude,
         try_cast(baro_altitude AS DOUBLE) AS baro_altitude,
         try_cast(velocity AS DOUBLE) AS velocity,
         try_cast(true_track AS DOUBLE) AS true_track,
         try_cast(vertical_rate AS DOUBLE) AS vertical_rate,
         try_cast(geo_altitude AS DOUBLE) AS geo_altitude,
         try_cast(position_source AS INTEGER) AS position_source,
         to_timestamp(try_cast(time_position AS BIGINT)) AS time_position,
         to_timestamp(try_cast(last_contact AS BIGINT)) AS last_contact,
         CASE WHEN lower(on_ground) = 'true' THEN true
              WHEN lower(on_ground) = 'false' THEN false END AS on_ground,
         CASE WHEN lower(spi) = 'true' THEN true
              WHEN lower(spi) = 'false' THEN false END AS spi,
         icao24, callsign, origin_country, sensors, squawk
  FROM read_csv('{REFERENCE_GLOB}', header = true, all_varchar = true)
"""


@query(
    "opensky_clean_parity",
    tier="T1",
    doc="Faithful §1.3 transform over the reference's own sample corpus "
    "(T1.11–T1.16), reduced to a null/count/value profile. Matches the "
    "golden numbers in SURVEY §1.3 (e.g. 1834 rows, 27 null callsigns).",
    oracle=f"""
    WITH c AS ({_CLEAN_SQL})
    SELECT count(*) AS n_rows,
           count(DISTINCT icao24) AS n_aircraft,
           count(*) - count(callsign) AS nulls_callsign,
           count(*) - count(velocity) AS nulls_velocity,
           count(*) - count(baro_altitude) AS nulls_baro_altitude,
           count(*) - count(vertical_rate) AS nulls_vertical_rate,
           count(*) - count(geo_altitude) AS nulls_geo_altitude,
           count(*) - count(squawk) AS nulls_squawk,
           count(*) - count(sensors) AS nulls_sensors,
           CAST(sum(CASE WHEN on_ground THEN 1 ELSE 0 END) AS BIGINT)
             AS n_on_ground,
           CAST(sum(CASE WHEN spi THEN 1 ELSE 0 END) AS BIGINT) AS n_spi,
           CAST(sum(CAST(round(velocity * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS sum_velocity,
           CAST(min(epoch(last_contact)) AS BIGINT) AS min_last_contact_s,
           CAST(max(epoch(last_contact)) AS BIGINT) AS max_last_contact_s
    FROM c
    """,
)
def opensky_clean_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_runtime(spark)
    raw = spark.read.csv(REFERENCE_GLOB, header=True, schema=RAW_SCHEMA)
    c = clean_state_vectors(raw)
    return c.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("icao24").alias("n_aircraft"),
        (F.count("*") - F.count("callsign")).alias("nulls_callsign"),
        (F.count("*") - F.count("velocity")).alias("nulls_velocity"),
        (F.count("*") - F.count("baro_altitude")).alias("nulls_baro_altitude"),
        (F.count("*") - F.count("vertical_rate")).alias("nulls_vertical_rate"),
        (F.count("*") - F.count("geo_altitude")).alias("nulls_geo_altitude"),
        (F.count("*") - F.count("squawk")).alias("nulls_squawk"),
        (F.count("*") - F.count("sensors")).alias("nulls_sensors"),
        F.sum(F.when(F.col("on_ground"), 1).otherwise(0)).alias("n_on_ground"),
        F.sum(F.when(F.col("spi"), 1).otherwise(0)).alias("n_spi"),
        (F.sum(F.round(F.col("velocity") * 100).cast("long")) / 100.0).alias(
            "sum_velocity"
        ),
        F.min(F.unix_timestamp("last_contact")).cast("long").alias(
            "min_last_contact_s"
        ),
        F.max(F.unix_timestamp("last_contact")).cast("long").alias(
            "max_last_contact_s"
        ),
    )


@query(
    "opensky_latest_position",
    tier="T2",
    doc="THE flagship domain query (T2.5): current position of each "
    "aircraft = latest last_contact per icao24 across the 14 crawls, "
    "rolled up per origin country.",
    oracle=f"""
    WITH c AS ({_CLEAN_SQL}),
    latest AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY icao24
          ORDER BY last_contact DESC, time_position DESC NULLS LAST,
                   longitude DESC NULLS LAST, latitude DESC NULLS LAST,
                   velocity DESC NULLS LAST, baro_altitude DESC NULLS LAST,
                   callsign DESC NULLS LAST) AS rn
        FROM c
      ) WHERE rn = 1
    )
    SELECT origin_country,
           count(*) AS n_aircraft,
           CAST(sum(CASE WHEN on_ground THEN 1 ELSE 0 END) AS BIGINT)
             AS n_on_ground,
           CAST(sum(CAST(round(velocity * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS sum_velocity,
           CAST(max(round(baro_altitude * 100)) AS BIGINT) / 100.0
             AS max_baro_altitude
    FROM latest
    GROUP BY origin_country
    ORDER BY origin_country
    """,
)
def opensky_latest_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    configure_runtime(spark)
    raw = spark.read.csv(REFERENCE_GLOB, header=True, schema=RAW_SCHEMA)
    c = clean_state_vectors(raw)
    # Tiebreak chain long enough to be a total order in practice —
    # identical last_contact across overlapping crawl files is common.
    w = Window.partitionBy("icao24").orderBy(
        F.desc("last_contact"),
        F.desc_nulls_last("time_position"),
        F.desc_nulls_last("longitude"),
        F.desc_nulls_last("latitude"),
        F.desc_nulls_last("velocity"),
        F.desc_nulls_last("baro_altitude"),
        F.desc_nulls_last("callsign"),
    )
    latest = c.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        latest.groupBy("origin_country")
        .agg(
            F.count("*").alias("n_aircraft"),
            F.sum(F.when(F.col("on_ground"), 1).otherwise(0)).alias("n_on_ground"),
            (F.sum(F.round(F.col("velocity") * 100).cast("long")) / 100.0).alias(
                "sum_velocity"
            ),
            (F.max(F.round(F.col("baro_altitude") * 100)).cast("long") / 100.0).alias(
                "max_baro_altitude"
            ),
        )
        .orderBy("origin_country")
    )


# --------------------------------------------------------------------------
# T2.14 — geo math: per-aircraft trajectory length (haversine + lag)
# --------------------------------------------------------------------------
@query(
    "opensky_trajectory_km",
    tier="T2",
    doc="Per-aircraft great-circle trajectory length across the crawl "
    "series (T2.14 math fns + T2.9 lag): haversine over consecutive "
    "positions. Segments are rounded to integer 1e-4 km BEFORE the sum "
    "so the aggregate is order-independent integer math (catalog "
    "determinism rule for continuous values feeding SUM).",
    oracle=f"""
    WITH c AS ({{clean}}),
    pts AS (
      SELECT icao24,
             CAST(floor(epoch(last_contact)) AS BIGINT) AS ts_s,
             longitude, latitude
      FROM c
      WHERE longitude IS NOT NULL AND latitude IS NOT NULL
        AND last_contact IS NOT NULL
    ),
    seg AS (
      SELECT icao24,
             2 * 6371.0088 * asin(sqrt(
               sin(radians(latitude - lag(latitude) OVER w) / 2)
                 * sin(radians(latitude - lag(latitude) OVER w) / 2)
               + cos(radians(lag(latitude) OVER w)) * cos(radians(latitude))
                 * sin(radians(longitude - lag(longitude) OVER w) / 2)
                 * sin(radians(longitude - lag(longitude) OVER w) / 2)
             )) AS seg_km
      FROM pts
      WINDOW w AS (PARTITION BY icao24 ORDER BY ts_s, longitude, latitude)
    )
    SELECT icao24,
           count(seg_km) AS n_segments,
           CAST(sum(CAST(round(seg_km * 10000.0) AS BIGINT)) AS BIGINT) / 10000.0
             AS total_km
    FROM seg
    WHERE seg_km IS NOT NULL
    GROUP BY icao24
    ORDER BY icao24
    """.format(clean=_CLEAN_SQL),
)
def opensky_trajectory_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.geo import haversine_km

    configure_runtime(spark)
    raw = spark.read.csv(REFERENCE_GLOB, header=True, schema=RAW_SCHEMA)
    c = clean_state_vectors(raw)
    pts = c.filter(
        F.col("longitude").isNotNull()
        & F.col("latitude").isNotNull()
        & F.col("last_contact").isNotNull()
    ).select(
        "icao24",
        F.unix_timestamp("last_contact").cast("long").alias("ts_s"),
        "longitude",
        "latitude",
    )
    w = Window.partitionBy("icao24").orderBy("ts_s", "longitude", "latitude")
    seg = pts.select(
        "icao24",
        haversine_km(
            F.lag("latitude").over(w),
            F.lag("longitude").over(w),
            F.col("latitude"),
            F.col("longitude"),
        ).alias("seg_km"),
    )
    return (
        seg.filter(F.col("seg_km").isNotNull())
        .groupBy("icao24")
        .agg(
            F.count("seg_km").alias("n_segments"),
            (
                F.sum(F.round(F.col("seg_km") * 10000.0).cast("long")).cast("long")
                / 10000.0
            ).alias("total_km"),
        )
        .orderBy("icao24")
    )


@query(
    "opensky_per_file_profile",
    tier="T1",
    doc="Per-crawl-file ingest profile (T1.4/T1.22's unit of work, "
    "T1.11-T1.15's typed contract): row count, aircraft count, null "
    "profile and fixed-point velocity sum per file_source — the "
    "second independent driver gate on the clean transform, grouped "
    "by the same input_file_name lineage the warehouse load stamps "
    "on every row (load_warehouse.py:149).",
    oracle=f"""
    WITH c AS (
      SELECT parse_filename(filename) AS file_source,
             try_cast(velocity AS DOUBLE) AS velocity,
             try_cast(geo_altitude AS DOUBLE) AS geo_altitude,
             CASE WHEN lower(on_ground) = 'true' THEN true
                  WHEN lower(on_ground) = 'false' THEN false
             END AS on_ground,
             to_timestamp(try_cast(last_contact AS BIGINT)) AS last_contact,
             icao24, callsign, squawk
      FROM read_csv('{REFERENCE_GLOB}', header = true,
                    all_varchar = true, filename = true)
    )
    SELECT file_source,
           count(*) AS n_rows,
           count(DISTINCT icao24) AS n_aircraft,
           count(*) - count(callsign) AS nulls_callsign,
           count(*) - count(velocity) AS nulls_velocity,
           count(*) - count(geo_altitude) AS nulls_geo_altitude,
           count(*) - count(squawk) AS nulls_squawk,
           CAST(sum(CASE WHEN on_ground THEN 1 ELSE 0 END) AS BIGINT)
             AS n_on_ground,
           CAST(sum(CAST(round(velocity * 100) AS BIGINT)) AS BIGINT)
             AS sum_velocity_c,
           CAST(min(epoch(last_contact)) AS BIGINT) AS min_last_contact_s,
           CAST(max(epoch(last_contact)) AS BIGINT) AS max_last_contact_s
    FROM c
    GROUP BY file_source
    ORDER BY file_source
    """,
)
def opensky_per_file_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_runtime(spark)
    raw = spark.read.csv(REFERENCE_GLOB, header=True, schema=RAW_SCHEMA)
    c = clean_state_vectors(raw)
    return (
        c.groupBy("file_source")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("icao24").alias("n_aircraft"),
            (F.count("*") - F.count("callsign")).alias("nulls_callsign"),
            (F.count("*") - F.count("velocity")).alias("nulls_velocity"),
            (F.count("*") - F.count("geo_altitude")).alias("nulls_geo_altitude"),
            (F.count("*") - F.count("squawk")).alias("nulls_squawk"),
            F.sum(F.when(F.col("on_ground"), 1).otherwise(0))
            .cast("long")
            .alias("n_on_ground"),
            F.sum(F.round(F.col("velocity") * 100).cast("long")).alias(
                "sum_velocity_c"
            ),
            F.min(F.unix_timestamp("last_contact"))
            .cast("long")
            .alias("min_last_contact_s"),
            F.max(F.unix_timestamp("last_contact"))
            .cast("long")
            .alias("max_last_contact_s"),
        )
        .orderBy("file_source")
    )


@query(
    "opensky_grid_density",
    tier="T2",
    doc="Spatial density mart: airborne state vectors bucketed into "
    "1-degree grid cells (floor(lat), floor(lon)) with counts, "
    "distinct aircraft, and fixed-point mean velocity per cell — the "
    "grid-bucketing shape that makes spatial aggregation an ordinary "
    "equi-groupBy (and spatial joins an equi-join on cell keys) at "
    "any scale, instead of geometry predicates per row pair. Third "
    "independent driver gate over the cleaned reference corpus.",
    oracle=f"""
    WITH c AS ({_CLEAN_SQL})
    SELECT CAST(floor(latitude) AS BIGINT) AS cell_lat,
           CAST(floor(longitude) AS BIGINT) AS cell_lon,
           count(*) AS n_states,
           count(DISTINCT icao24) AS n_aircraft,
           CAST(sum(CASE WHEN on_ground THEN 0 ELSE 1 END) AS BIGINT)
             AS n_airborne,
           CAST(sum(CAST(round(velocity * 100) AS BIGINT)) AS BIGINT)
             AS sum_velocity_c
    FROM c
    WHERE latitude IS NOT NULL AND longitude IS NOT NULL
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def opensky_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_runtime(spark)
    raw = spark.read.csv(REFERENCE_GLOB, header=True, schema=RAW_SCHEMA)
    c = clean_state_vectors(raw)
    return (
        c.filter(F.col("latitude").isNotNull() & F.col("longitude").isNotNull())
        .groupBy(
            F.floor("latitude").cast("long").alias("cell_lat"),
            F.floor("longitude").cast("long").alias("cell_lon"),
        )
        .agg(
            F.count("*").alias("n_states"),
            F.countDistinct("icao24").alias("n_aircraft"),
            F.sum(F.when(F.col("on_ground"), 0).otherwise(1))
            .cast("long")
            .alias("n_airborne"),
            F.sum(F.round(F.col("velocity") * 100).cast("long"))
            .cast("long")
            .alias("sum_velocity_c"),
        )
        .orderBy("cell_lat", "cell_lon")
    )


@query(
    "opensky_airline_traffic",
    tier="T2",
    doc="Airline traffic mix from the reference corpus: the 3-letter "
    "ICAO airline prefix of each cleaned callsign (trimmed ONLY for "
    "this derived dim — the faithful layer preserves the reference's "
    "8-char padding, SURVEY §1.3) rolled up to message/aircraft/"
    "airborne counts, top-15 by volume with a full-key tiebreak. A "
    "third reference-corpus driver row exercising the string surface "
    "(T2.12 trim/substring) on real crawled data.",
    oracle=f"""
    WITH c AS ({_CLEAN_SQL}),
    a AS (
      SELECT trim(callsign) AS cs, icao24, on_ground
      FROM c
      WHERE callsign IS NOT NULL AND length(trim(callsign)) >= 3
    )
    SELECT substring(cs, 1, 3) AS airline,
           count(*) AS n_msgs,
           count(DISTINCT icao24) AS n_aircraft,
           CAST(sum(CASE WHEN NOT on_ground THEN 1 ELSE 0 END) AS BIGINT)
             AS n_airborne
    FROM a
    GROUP BY 1
    ORDER BY n_msgs DESC, airline
    LIMIT 15
    """,
)
def opensky_airline_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_runtime(spark)
    raw = spark.read.csv(REFERENCE_GLOB, header=True, schema=RAW_SCHEMA)
    c = clean_state_vectors(raw)
    a = c.filter(
        F.col("callsign").isNotNull()
        & (F.length(F.trim("callsign")) >= 3)
    ).select(
        F.substring(F.trim("callsign"), 1, 3).alias("airline"),
        "icao24",
        "on_ground",
    )
    return (
        a.groupBy("airline")
        .agg(
            F.count("*").alias("n_msgs"),
            F.countDistinct("icao24").alias("n_aircraft"),
            F.sum(F.when(~F.col("on_ground"), 1).otherwise(0))
            .cast("long")
            .alias("n_airborne"),
        )
        .orderBy(F.desc("n_msgs"), "airline")
        .limit(15)
    )


# --------------------------------------------------------------------------
# T2 — Z-order clustering key (the data-layout primitive for 100 TB skipping)
# --------------------------------------------------------------------------
#: Fixed Europe-crawl bounding box (reference job bbox family) and an
#: 8-bit-per-axis grid: 256x256 cells, 16-bit interleaved key.
_Z_LAT0, _Z_LAT_SPAN = 30.0, 45.0
_Z_LON0, _Z_LON_SPAN = -30.0, 80.0
_Z_BITS = 8


def _z_interleave(divop: str) -> str:
    """Bit-interleave xi (even bits) and yi (odd bits) with pure integer
    arithmetic — `divop` is the engine's integer-division operator
    ('div' for Spark SQL, '//' for DuckDB); everything else is shared.
    """
    terms = [
        f"(((xi {divop} {1 << i}) % 2) * {1 << (2 * i)}"
        f" + ((yi {divop} {1 << i}) % 2) * {1 << (2 * i + 1)})"
        for i in range(_Z_BITS)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


_Z_CELLS = f"""
    SELECT least(greatest(CAST(floor(
             (longitude - {_Z_LON0}) / {_Z_LON_SPAN} * {1 << _Z_BITS}
           ) AS BIGINT), 0), {(1 << _Z_BITS) - 1}) AS xi,
           least(greatest(CAST(floor(
             (latitude - {_Z_LAT0}) / {_Z_LAT_SPAN} * {1 << _Z_BITS}
           ) AS BIGINT), 0), {(1 << _Z_BITS) - 1}) AS yi,
           icao24
    FROM c
    WHERE latitude IS NOT NULL AND longitude IS NOT NULL
"""


@query(
    "opensky_zorder_key",
    tier="T2",
    doc="Z-order (Morton) clustering key over the state-vector "
    "positions: 8-bit lat/lon grid coordinates bit-interleaved into a "
    "16-bit key by pure integer arithmetic, aggregated per z-cell. "
    "This is the LAYOUT primitive for 100 TB: writing the fact sorted "
    "by zkey makes every parquet row-group's lat/lon min/max tight in "
    "BOTH dimensions simultaneously, so a spatial range predicate "
    "prunes files on ordinary column statistics — multidimensional "
    "skipping without a spatial index. The key itself is row-local "
    "(no shuffle); the per-cell rollup is one combiner-friendly "
    "groupBy, and ORDER BY zkey demonstrates the write-side range "
    "partitioning that the layout would use.",
    oracle=f"""
    WITH c AS ({{clean}}),
    g AS ({_Z_CELLS})
    SELECT {_z_interleave('//')} AS zkey,
           count(*) AS n_states,
           count(DISTINCT icao24) AS n_aircraft
    FROM g
    GROUP BY 1
    ORDER BY zkey
    """.format(clean=_CLEAN_SQL),
)
def opensky_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_runtime(spark)
    raw = spark.read.csv(REFERENCE_GLOB, header=True, schema=RAW_SCHEMA)
    c = clean_state_vectors(raw)
    hi = (1 << _Z_BITS) - 1
    g = c.filter(
        F.col("latitude").isNotNull() & F.col("longitude").isNotNull()
    ).select(
        F.least(
            F.greatest(
                F.floor(
                    (F.col("longitude") - _Z_LON0)
                    / _Z_LON_SPAN
                    * (1 << _Z_BITS)
                ).cast("long"),
                F.lit(0).cast("long"),
            ),
            F.lit(hi).cast("long"),
        ).alias("xi"),
        F.least(
            F.greatest(
                F.floor(
                    (F.col("latitude") - _Z_LAT0)
                    / _Z_LAT_SPAN
                    * (1 << _Z_BITS)
                ).cast("long"),
                F.lit(0).cast("long"),
            ),
            F.lit(hi).cast("long"),
        ).alias("yi"),
        "icao24",
    )
    return (
        g.select(F.expr(_z_interleave("div")).alias("zkey"), "icao24")
        .groupBy("zkey")
        .agg(
            F.count("*").alias("n_states"),
            F.countDistinct("icao24").alias("n_aircraft"),
        )
        .orderBy("zkey")
    )
