"""Structured Streaming ingest + windowed analytics (SURVEY T2.16).

The reference's 10-minute crawl cadence + hourly staging load (diagram
labels "Chạy 10p/lần" / "1h/lần") is a micro-batch streaming pattern;
its hand-rolled incremental machinery — directory diff (T1.4/T1.5),
per-file ledger (T1.6), never-reprocess guarantee — is exactly what a
Structured Streaming file source's checkpoint provides natively
(exactly-once per file). That replacement IS the design point: the
control table shrinks to an audit log, and correctness no longer
depends on our own bookkeeping.

Late data: `time_position`/`last_contact` (event time) lag
`load_timestamp` (arrival) by design — watermarks bound that skew and
let windowed state be dropped (bounded memory at 100 TB; the batch
equivalent would re-scan everything each hour).

Tests drive these with `trigger(availableNow=True)` so they run
bounded; production uses a processing-time trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..schemas import RAW_SCHEMA
from ..session import configure_runtime
from ..transform import clean_state_vectors


def stream_landing_source(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-source stream over the landing zone (subsumes T1.4/T1.5:
    glob filter + incremental cut via checkpoint)."""
    configure_runtime(spark)
    return (
        spark.readStream.schema(RAW_SCHEMA)
        .option("header", True)
        .option("pathGlobFilter", "states_*.csv")
        .option("maxFilesPerTrigger", 16)  # bound per-micro-batch work
        .csv(landing_dir)
    )


def stream_clean_to_silver(
    spark: SparkSession,
    landing_dir: str,
    silver_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """EP2 as a stream: landing CSVs → §1.3 clean transform → silver
    parquet, exactly-once per file via checkpoint."""
    raw = stream_landing_source(spark, landing_dir)
    clean = clean_state_vectors(raw).withColumn(
        "event_date", F.to_date(F.coalesce("last_contact", "load_timestamp"))
    )
    writer = (
        clean.writeStream.format("parquet")
        .option("path", silver_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="10 minutes")
    return writer.start()


def windowed_country_counts(
    clean: DataFrame,
    window_duration: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "20 minutes",
) -> DataFrame:
    """Tumbling/sliding event-time window agg with watermark (T2.16):
    distinct-aircraft + mean velocity per country per window.

    Works on both batch and streaming DataFrames (same code path — the
    batch twin is the unit-test oracle)."""
    win = (
        F.window("last_contact", window_duration, slide)
        if slide
        else F.window("last_contact", window_duration)
    )
    src = clean
    if clean.isStreaming:
        src = clean.withWatermark("last_contact", watermark)
    return (
        src.filter(F.col("last_contact").isNotNull())
        .groupBy(win.alias("w"), "origin_country")
        .agg(
            F.approx_count_distinct("icao24").alias("n_aircraft_approx"),
            F.count("*").alias("n_states"),
            F.avg("velocity").alias("avg_velocity"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "origin_country",
            "n_aircraft_approx",
            "n_states",
            "avg_velocity",
        )
    )


def session_window_stats(
    clean: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-aircraft session windows (T2.16): a 'flight leg' ends after
    `gap` of silence. Streaming-native via session_window."""
    src = clean
    if clean.isStreaming:
        src = clean.withWatermark("last_contact", watermark)
    return (
        src.filter(F.col("last_contact").isNotNull())
        .groupBy(F.session_window("last_contact", gap).alias("s"), "icao24")
        .agg(
            F.count("*").alias("n_pings"),
            F.avg("velocity").alias("avg_velocity"),
            F.max("baro_altitude").alias("max_altitude"),
        )
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "icao24",
            "n_pings",
            "avg_velocity",
            "max_altitude",
        )
    )


def streaming_dedup(clean: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Exactly-once per (aircraft, contact instant) within the
    watermark horizon — the streaming form of T1.6's keyed dedup."""
    src = clean
    if clean.isStreaming:
        src = clean.withWatermark("last_contact", watermark)
    return src.dropDuplicates(["icao24", "last_contact"])
