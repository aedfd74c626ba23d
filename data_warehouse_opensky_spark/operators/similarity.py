"""Similarity search over embedding columns (north-star T3.2/T3.3).

Brute-force cosine top-k is the correctness baseline; the scale paths
are (a) random-hyperplane LSH bucketing and (b) IVF-style coarse
quantization — both expressed as plain DataFrame ops so Catalyst keeps
the whole plan JVM-side (higher-order array functions, no Python UDFs).

Determinism: all float math is element-wise float→double exact
conversion followed by a sequential left-fold (`aggregate`), so an
independent engine reproduces values to the ulp; outputs are rounded
to 6 dp (continuous values — rounding-safe).

Scale notes: brute-force against a single query is a broadcast of the
query vector + one scan (embarrassingly parallel, no shuffle). The
LSH/IVF variants turn all-pairs search into an equi-join on bucket /
cell id — shuffle O(n), with per-bucket skew handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float array columns, in double.

    Compact higher-order-function form ON PURPOSE: an unrolled 64-term
    Add chain was measured SLOWER (huge janino methods blow past the
    JIT's 8 KB compile cap and take far longer to codegen); the HOF
    fold keeps generated code tiny and runs ~8 µs/pair at dim=64.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(_to_double(a), _to_double(b)) / (norm(a) * norm(b))


def brute_force_topk(
    vectors: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors of one stored vector.

    Plan: broadcast the 1-row query side, scan+score all vectors,
    TakeOrderedAndProject for the top-k — no shuffle of the big side.
    """
    q = vectors.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__qvec")
    )
    scored = vectors.crossJoin(F.broadcast(q)).select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("__qvec")), 6).alias("cos_sim"),
    )
    return (
        scored.filter(F.col(id_col) != query_id)
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def cosine_neardup_pairs(
    vectors: DataFrame,
    threshold: float,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs with cosine ≥ threshold, blocked by `block_col`.

    Blocking turns O(n²) into Σ O(|block|²) with an equi-join shuffle —
    the standard embedding-dedup plan (block by cluster/partition key).

    Plan shape: the pair-generation join runs on SLIM (id, block) rows
    — with few distinct blocks it is hopelessly skewed (≤ one task per
    block), which is fine for cheap id pairs but NOT for the per-pair
    cosine fold. So pairs are re-spread round-robin across the session
    parallelism first, then each side's prepped vector (float→double
    cast + norm, computed ONCE per vector, not per pair) is
    broadcast-joined back in for scoring. `dot/(na·nb)` is
    bit-identical to computing norms inside the pair expression. At
    100 TB with high-cardinality blocks, skip the respread (the block
    join itself spreads) and let AQE pick the join strategy.
    """
    sess = vectors.sparkSession
    ids = vectors.select(F.col(id_col), F.col(block_col))
    a = ids.alias("a")
    b = ids.alias("b")
    pairs = (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            F.col(f"a.{block_col}").alias(block_col),
        )
        .repartition(sess.sparkContext.defaultParallelism)
    )
    prepped = vectors.select(
        F.col(id_col),
        _to_double(F.col(vec_col)).alias("__vd"),
        norm(F.col(vec_col)).alias("__norm"),
    )
    pa = prepped.select(
        F.col(id_col).alias("vec_a"),
        F.col("__vd").alias("__vd_a"),
        F.col("__norm").alias("__norm_a"),
    )
    pb = prepped.select(
        F.col(id_col).alias("vec_b"),
        F.col("__vd").alias("__vd_b"),
        F.col("__norm").alias("__norm_b"),
    )
    return (
        pairs.join(F.broadcast(pa), "vec_a")
        .join(F.broadcast(pb), "vec_b")
        .select(
            "vec_a",
            "vec_b",
            block_col,
            F.round(
                dot(F.col("__vd_a"), F.col("__vd_b"))
                / (F.col("__norm_a") * F.col("__norm_b")),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def hyperplane_bits(vec_col: str, num_planes: int = 16, dim: int = 64) -> Column:
    """Deterministic random-hyperplane LSH bucket id (integer weights).

    Plane p, component j (1-based) has weight ((1009·p + 31·j) mod 199)
    − 99 — a fixed pseudo-random integer pattern any engine reproduces.
    Bucket id = Σ_p sign_bit(plane_p · vec) << p.
    """
    terms = []
    for p in range(num_planes):
        proj = (
            f"aggregate(transform(sequence(1, {dim}), "
            f"j -> CAST(element_at({vec_col}, j) AS DOUBLE)"
            f" * (((1009 * {p} + 31 * j) % 199) - 99)), "
            f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        terms.append(f"(CASE WHEN {proj} >= 0 THEN CAST({1 << p} AS BIGINT) ELSE 0 END)")
    return F.expr(" + ".join(terms)).cast("long")


def lsh_bucket_topk(
    vectors: DataFrame,
    query_id: int,
    k: int = 10,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: score only vectors in the query's LSH bucket.

    At 100 TB the bucketed table is written once (partitioned by
    bucket) and each query touches one partition — this query shape is
    the online probe.
    """
    bucketed = vectors.withColumn("bucket", hyperplane_bits(vec_col, num_planes, dim))
    q = bucketed.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__qvec"), F.col("bucket").alias("__qbucket")
    )
    return (
        bucketed.join(
            F.broadcast(q), F.col("bucket") == F.col("__qbucket"), "inner"
        )
        .filter(F.col(id_col) != query_id)
        .select(
            F.col(id_col),
            F.col("bucket"),
            F.round(cosine(F.col(vec_col), F.col("__qvec")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def ivf_assign(
    vectors: DataFrame,
    num_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization with deterministic seed centroids.

    Centroids = the vectors with the `num_centroids` smallest ids (a
    deterministic stand-in for k-means — the assignment/probe plumbing
    is identical). Assignment = argmax cosine (tiebreak lowest id).
    """
    cents = vectors.filter(F.col(id_col) < num_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("__cvec")
    )
    scored = vectors.crossJoin(F.broadcast(cents)).select(
        id_col,
        vec_col,
        "centroid_id",
        F.round(cosine(F.col(vec_col), F.col("__cvec")), 6).alias("__cs"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("__cs"), F.asc("centroid_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, vec_col, "centroid_id")
    )
