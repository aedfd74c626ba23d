"""Iterative centroid clustering (Lloyd's k-means) over an embedding
column — the grouping step of embedding-space corpus curation
(semantic dedup buckets, topic balancing, diversity sampling).

Cross-engine determinism (the hard part of putting an ML iteration
behind a SQL oracle): floating-point k-means is nondeterministic under
Spark's partial-aggregation order, so EVERYTHING here is exact integer
arithmetic —

* vectors quantize ONCE to 1e-6 integer units (`round` of a float→
  double promotion, deterministic on every engine);
* distances are exact integer sums of squared differences (≤ 2^47 for
  64-dim e6-quantized unit-scale vectors — no overflow);
* centroid updates are `floor(Σx / n)` computed via double division of
  exactly-representable integers (< 2^53), identical everywhere;
* seeds are the k vectors with the smallest md5(vec_id) — no RNG;
* argmin ties break on the smaller centroid id.

Scale design (100 TB): each Lloyd round is one scan + one map-side-
combinable aggregation keyed on (cluster, dim) — the same shape as a
groupBy sum. Centroids (k×dim integers) ride the driver ↔ literal
path like the TF-IDF vocab / bigram-LM model: a control-plane collect
bounded by k·dim, re-entering the plan as a constant-folded literal
(no join, no shuffle on the fact side for ASSIGNMENT — assignment is
a row-local expression over the broadcast-literal centroids).
Iteration count is fixed (compile-time unrolled), the standard
practice for production pipelines (convergence-tested offline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT = 1_000_000  # 1e-6 units


def quantize(vec: Column | str) -> Column:
    """float array → exact integer-unit array (1e-6 grid)."""
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: F.round(x.cast("double") * QUANT).cast("long"))


def _assign(base: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Row-local argmin over literal centroids → (vid, xq, cluster, d).

    Distances go into ONE array column and the argmin reads it with
    array_min/array_position (first match → ties break to the smaller
    cid, matching the oracle's ORDER BY d, cid). NEVER build the
    argmin as a chain of when(d < best_d) expressions threading the
    running best through each step — each step references the previous
    best twice, so the expression tree doubles per centroid (2^k
    blowup; the k=8 version took minutes to even analyze).
    """
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col("xq"),
                    F.array(*[F.lit(int(v)).cast("long") for v in c]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            for c in centroids
        ]
    )
    return base.withColumn("_dists", dists).select(
        "vid",
        "xq",
        (F.array_position("_dists", F.array_min("_dists")) - 1)
        .cast("long")
        .alias("cluster"),
        F.array_min("_dists").alias("d"),
    )


def _recompute(assigned: DataFrame, k: int, dim: int) -> list[list[int]]:
    """One centroid update: Σx per (cluster, dim) → floor-mean.

    posexplode → groupBy(cluster, dim) sum is map-side combinable;
    the collect is k·dim longs (control plane). Empty clusters keep
    a zero vector (cannot arise with md5-seeded distinct seeds, but
    the contract is total).
    """
    rows = (
        assigned.select("cluster", F.posexplode("xq").alias("dim", "xu"))
        .groupBy("cluster", "dim")
        .agg(F.sum("xu").alias("s"), F.count("*").alias("n"))
        .collect()
    )
    cents = [[0] * dim for _ in range(k)]
    import math

    for r in rows:
        cents[r["cluster"]][r["dim"]] = math.floor(r["s"] / r["n"])
    return cents


def kmeans(
    df: DataFrame,
    *,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Run `iters` Lloyd rounds; return (cluster, n_vecs, inertia_q).

    inertia_q = exact integer sum of squared quantized distances of
    each vector to its FINAL centroid (the usual k-means objective,
    in 1e-12 units of the original scale).
    """
    base = df.select(
        F.col(id_col).alias("vid"), quantize(vec_col).alias("xq")
    )
    # Seed selection and seed-vector fetch in ONE job: k is tiny, so
    # collecting the quantized vectors alongside the md5 rank costs
    # nothing extra and saves a whole scheduling round trip.
    seed_rows = (
        base.withColumn("_h", F.md5(F.col("vid").cast("string")))
        .orderBy("_h", "vid")
        .limit(k)
        .collect()
    )
    centroids = [list(r["xq"]) for r in seed_rows]

    for _ in range(iters):
        centroids = _recompute(_assign(base, centroids), k, dim)

    final = _assign(base, centroids)
    return (
        final.groupBy("cluster")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.sum("d").cast("long").alias("inertia_q"),
        )
        .orderBy("cluster")
    )
