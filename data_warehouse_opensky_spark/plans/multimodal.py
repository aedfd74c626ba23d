"""Tier-3 multimodal-column queries (north-star T3.3).

The decode step is a deterministic fake (container has no media libs —
see operators/multimodal.py), so the Arrow/mapInPandas plumbing gets a
REAL SQL oracle: the fake dims are pure arithmetic on payload length,
which DuckDB reproduces from octet_length(encode(text)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import multimodal as M
from ..sources import load_table
from .catalog import query


@query(
    "multimodal_decode_meta",
    tier="T3",
    doc="Binary payload → typed image metadata via Arrow-batched "
    "mapInPandas (T3.3). Decode itself is a deterministic fake; the "
    "batch plumbing and schema contract are real.",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST((octet_length(encode(text)) * 7) % 640 + 16 AS INTEGER) AS width,
           CAST((octet_length(encode(text)) * 13) % 480 + 16 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return M.decode_image_meta(M.attach_binary(d)).orderBy("doc_id")


@query(
    "multimodal_frame_sample",
    tier="T3",
    doc="Frame sampling: exploding mapInPandas (video-style 1→N rows, "
    "T3.3). Oracle: lateral unnest(range(n_frames)).",
    oracle=f"""
    WITH x AS (
      SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents
    )
    SELECT doc_id,
           CAST(f AS INTEGER) AS frame_idx,
           CAST(f * {M.FRAME_SIZE} AS BIGINT) AS frame_offset,
           CAST(least({M.FRAME_SIZE}, n_bytes - f * {M.FRAME_SIZE}) AS BIGINT)
             AS frame_bytes
    FROM x, unnest(range(least(n_bytes // {M.FRAME_SIZE} + 1, {M.MAX_FRAMES}))) AS t(f)
    ORDER BY doc_id, frame_idx
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return M.frame_sample(M.attach_binary(d)).orderBy("doc_id", "frame_idx")
