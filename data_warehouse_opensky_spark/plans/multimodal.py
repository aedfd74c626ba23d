"""Tier-3 multimodal-column queries (north-star T3.3).

The decode step is a deterministic fake (container has no media libs —
see operators/multimodal.py), so the Arrow/mapInPandas plumbing gets a
REAL SQL oracle: the fake dims are pure arithmetic on payload length,
which DuckDB reproduces from octet_length(encode(text)).

Partitioning (VERDICT r8 — `weak` plan shape): the fixture corpus is
ONE parquet file → one input partition, so every mapInPandas chain
here ran as a single Python/Arrow task on 1 of 32 cores. The fix is
``spread=True`` on the load (round-robin to default parallelism; a
no-op on any multi-file production table, where the scan already
exceeds the parallelism) — but ONLY where the Python stage is heavy
enough to pay for the exchange + 32-worker fan-out. Measured at
sf0.1 (BENCH r9 A/B vs best-known): the payload-EXPANDING resize
drops 6.0 → 0.93 s with spread, while the five metadata-light plans
each LOSE 0.3–0.55 s to pure exchange/worker overhead (e.g.
decode_meta 0.45 → 1.0 s) — their serial Python stage is already
<0.5 s at fixture scale. So resize spreads; the rest keep the plain
scan, which at 100 TB parallelizes naturally by file splits.
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


@query(
    "multimodal_resize",
    tier="T3",
    doc="Binary→binary resize via mapInPandas (T3.3): output payload is "
    "exactly W·H·C bytes (fake resize: truncate/pad — the real body is "
    "a PIL resize; schema/Arrow-binary plumbing is what's gated). "
    "Output checked by length + md5 prefix of the ORIGINAL bytes that "
    "survive truncation.",
    oracle=f"""
    SELECT doc_id,
           CAST({M.RESIZE_W * M.RESIZE_H * M.RESIZE_C} AS BIGINT) AS out_bytes,
           CAST(least(octet_length(encode(text)),
                      {M.RESIZE_W * M.RESIZE_H * M.RESIZE_C}) AS BIGINT)
             AS n_kept_bytes
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents", spread=True)
    r = M.resize_image(M.attach_binary(d))
    # n_kept_bytes: length of the resized payload with zero-padding
    # stripped — equals min(original length, target).
    return r.select(
        "doc_id",
        "out_bytes",
        F.length(F.expr("rtrim('\\u0000', CAST(resized AS STRING))")).cast(
            "long"
        ).alias("n_kept_bytes"),
    ).orderBy("doc_id")


@query(
    "multimodal_features",
    tier="T3",
    doc="Feature extraction via mapInPandas (T3.3): binary → fixed-dim "
    "double vector (fake: exact grid values standing in for a model "
    "forward pass). Vector unnested so the oracle compares element-"
    "wise.",
    oracle=f"""
    SELECT doc_id, j AS feat_idx,
           CAST(((octet_length(encode(text)) * (j + 13)) % 1000) AS DOUBLE)
             / 1000.0 AS feat
    FROM documents, unnest(range({M.FEATURE_DIM})) AS t(j)
    ORDER BY doc_id, feat_idx
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    f = M.extract_features(M.attach_binary(d))
    return f.select(
        "doc_id", F.posexplode("features").alias("feat_idx", "feat")
    ).select(
        "doc_id", F.col("feat_idx").cast("long").alias("feat_idx"), "feat"
    ).orderBy("doc_id", "feat_idx")


@query(
    "multimodal_audio_meta",
    tier="T3",
    doc="Audio metadata decode via mapInPandas (T3.3 audio stub): "
    "duration/chunks derived deterministically from payload bytes.",
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(text)) AS BIGINT)
             // {M.AUDIO_BYTES_PER_MS} AS duration_ms,
           CAST(octet_length(encode(text)) AS BIGINT)
             // {M.AUDIO_BYTES_PER_MS} // 1000 + 1 AS n_chunks
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return M.decode_audio_meta(M.attach_binary(d)).orderBy("doc_id")


@query(
    "multimodal_phash_dedup",
    tier="T3",
    doc="Image near-dup groups via a perceptual-hash-style fingerprint: "
    "the decoded feature vector (Arrow mapInPandas, fake forward "
    "pass — operators/multimodal.py) is quantized per-dimension at "
    "0.5 into an 8-bit fingerprint (JVM-side bit assembly over the "
    "posexploded features — no second Python hop), then grouped: "
    "buckets holding ≥2 images are duplicate groups with min doc_id "
    "canonical. Same shape as exact dedup — ONE shuffle on a small "
    "integer key; at 100 TB the fingerprint widens to 64 bits and "
    "splits into LSH bands exactly like dedup_simhash, but the "
    "group-on-fingerprint core is unchanged.",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, j,
             CASE WHEN (octet_length(encode(text)) * (j + 13)) % 1000 >= 500
                  THEN CAST(1 AS BIGINT) ELSE 0 END AS bit
      FROM documents, unnest(range({M.FEATURE_DIM})) AS t(j)
    ),
    fp AS (
      SELECT doc_id, CAST(sum(bit * (1 << j)) AS BIGINT) AS fingerprint
      FROM f GROUP BY doc_id
    )
    SELECT fingerprint,
           count(*) AS n_images,
           min(doc_id) AS canonical_doc_id
    FROM fp
    GROUP BY fingerprint
    HAVING count(*) >= 2
    ORDER BY fingerprint
    """,
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    feats = M.extract_features(M.attach_binary(d))
    fp = (
        feats.select("doc_id", F.posexplode("features").alias("j", "feat"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.expr("CASE WHEN feat >= 0.5 THEN shiftleft(1L, j) ELSE 0L END"))
            .cast("long")
            .alias("fingerprint")
        )
    )
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_images"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("n_images") >= 2)
        .orderBy("fingerprint")
    )
