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
bounded by k·dim, re-entering the plan as a closure constant of the
Arrow-vectorized assignment kernel (no join, no shuffle on the fact
side for ASSIGNMENT — assignment is row-local; see _assign for why
the kernel is a pandas UDF and not a JVM expression).
Iteration count is fixed (compile-time unrolled), the standard
practice for production pipelines (convergence-tested offline).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT = 1_000_000  # 1e-6 units


def quantize(vec: Column | str) -> Column:
    """float array → exact integer-unit array (1e-6 grid)."""
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: F.round(x.cast("double") * QUANT).cast("long"))


def _assign(base: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Row-local argmin over literal centroids → (vid, xq, cluster, d).

    The distance kernel is an Arrow-vectorized pandas UDF doing exact
    int64 matrix arithmetic: ‖x−c‖² = Σx² + Σc² − 2·x·c, computed as
    one (batch × dim) @ (dim × k) integer matmul per Arrow batch, with
    np.argmin's first-occurrence rule giving the tie-break to the
    smaller cid (matching the oracle's ORDER BY d, cid). All values
    stay ≤ 2^47 so int64 matmul is exact — bit-identical to the SQL
    oracle.

    Why a pandas UDF when the catalog's doctrine is built-ins first:
    the pure-JVM forms were measured and lose —
    * zip_with/aggregate HOF lambdas are evaluated INTERPRETED, per
      element, allocating a 64-long array per (row, centroid):
      ~1.5 s/job at sf0.1 (25.6M interpreted ops);
    * the expanded flat form (512 element_at mult-add terms) is 2×
      worse still — bounds-checked per-term array access and a giant
      codegen method;
    * this numpy kernel runs the same 25.6M integer ops in ~50 ms of
      C loops; Arrow moves 50k×64 int64 ≈ 25 MB per job.
    This is the "model forward pass against a broadcast parameter
    block" shape — the sanctioned Pandas-UDF use — with centroids as
    a closure constant (k·dim ints, the same control-plane budget as
    the TF-IDF vocab literal).
    """
    C = np.asarray(centroids, dtype=np.int64)  # (k, dim)
    c2 = (C * C).sum(axis=1)  # (k,)

    @F.pandas_udf("struct<cluster: bigint, d: bigint>")
    def assign_udf(xq: pd.Series) -> pd.DataFrame:
        if len(xq) == 0:
            return pd.DataFrame({"cluster": [], "d": []}, dtype="int64")
        X = np.stack(xq.to_numpy()).astype(np.int64, copy=False)
        dist = (
            (X * X).sum(axis=1)[:, None] + c2[None, :] - 2 * (X @ C.T)
        )
        cl = dist.argmin(axis=1)
        return pd.DataFrame(
            {
                "cluster": cl.astype("int64"),
                "d": dist[np.arange(len(cl)), cl].astype("int64"),
            }
        )

    return base.withColumn("_a", assign_udf("xq")).select(
        "vid",
        "xq",
        F.col("_a.cluster").alias("cluster"),
        F.col("_a.d").alias("d"),
    )


def _recompute(assigned: DataFrame, k: int, dim: int) -> list[list[int]]:
    """One centroid update: Σx per (cluster, dim) → floor-mean.

    The per-dimension sums are `dim` separate sum aggregates over
    element_at(xq, i) — NO posexplode: exploding a 64-dim vector
    multiplies the aggregation input 64× (3.2M rows at sf0.1) and
    shuffles (cluster, dim) pairs, where the wide-agg shape keeps one
    row per vector and shuffles k rows of dim partial sums (measured
    ~2× on the bench round). Map-side combinable either way; the
    collect is k·(dim+1) longs (control plane). Empty clusters keep
    a zero vector (cannot arise with md5-seeded distinct seeds, but
    the contract is total).
    """
    rows = (
        assigned.groupBy("cluster")
        .agg(
            F.count("*").alias("n"),
            *[
                F.sum(F.element_at("xq", i + 1)).alias(f"s{i}")
                for i in range(dim)
            ],
        )
        .collect()
    )
    cents = [[0] * dim for _ in range(k)]
    import math

    for r in rows:
        cents[r["cluster"]] = [
            math.floor(r[f"s{i}"] / r["n"]) for i in range(dim)
        ]
    return cents


def kmeans_fit(
    df: DataFrame,
    *,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> tuple[DataFrame, list[list[int]]]:
    """kmeans_assign plus the FINAL centroid list (k·dim control-plane
    ints) — IVF-style consumers need the centroids themselves to form
    residuals, not just the assignment."""
    # Quantization is an interpreted HOF over 64 elements; the loop
    # below runs 2·iters+2 jobs over `base`, so cache the quantized
    # vectors once (50k rows × 64 longs ≈ 25 MB at sf0.1 — at 100 TB
    # this is the standard iterate-on-cached-working-set pattern;
    # MEMORY_AND_DISK spills instead of recomputing).
    base = df.select(
        F.col(id_col).alias("vid"), quantize(vec_col).alias("xq")
    ).persist()
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

    return _assign(base, centroids), centroids


def kmeans_assign(
    df: DataFrame,
    *,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Run `iters` Lloyd rounds; return the final per-vector assignment
    (vid, xq, cluster, d) — the building block under both the kmeans
    summary query and cluster-scoped downstream work (semantic dedup
    prunes near-dups WITHIN clusters, turning the all-pairs problem
    into Σ cluster² — the whole point of bucketing at 100 TB)."""
    return kmeans_fit(
        df, k=k, iters=iters, id_col=id_col, vec_col=vec_col, dim=dim
    )[0]


def kmeans(
    df: DataFrame,
    *,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """(cluster, n_vecs, inertia_q) summary over `kmeans_assign`.

    inertia_q = exact integer sum of squared quantized distances of
    each vector to its FINAL centroid (the usual k-means objective,
    in 1e-12 units of the original scale).
    """
    final = kmeans_assign(
        df, k=k, iters=iters, id_col=id_col, vec_col=vec_col, dim=dim
    )
    return (
        final.groupBy("cluster")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.sum("d").cast("long").alias("inertia_q"),
        )
        .orderBy("cluster")
    )


def pq_encode(
    df: DataFrame,
    *,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    pre_quantized: bool = False,
):
    """Shared PQ encoder: returns (enc_frame, codebook).

    enc_frame has (vid, xq, codes array<bigint>, errs array<bigint>);
    the codebook is the (ksub, m, ds) int64 ndarray of md5-seeded
    sub-centroids (control-plane ksub*dim ints). Factored out of
    `pq_codes` so the ADC scan (plans/similarity.py:ann_pq_adc_topk)
    reuses the per-vector codes instead of re-deriving them.
    Determinism contract documented on `pq_codes`.
    """
    ds = dim // m
    # pre_quantized: vec_col already holds exact int64 grid values
    # (e.g. IVF residuals, which are differences of e6-grid ints) —
    # re-quantizing would be a lossy no-op.
    vec = F.col(vec_col) if pre_quantized else quantize(vec_col)
    base = df.select(F.col(id_col).alias("vid"), vec.alias("xq")).persist()
    seed_rows = (
        base.withColumn("_h", F.md5(F.col("vid").cast("string")))
        .orderBy("_h", "vid")
        .limit(ksub)
        .collect()
    )
    C = np.asarray([list(r["xq"]) for r in seed_rows], dtype=np.int64)
    C3 = C.reshape(ksub, m, ds)  # (ksub, m, ds)
    c2 = (C3 * C3).sum(axis=2)  # (ksub, m)

    @F.pandas_udf(
        "struct<codes: array<bigint>, errs: array<bigint>>"
    )
    def encode_udf(xq: pd.Series) -> pd.DataFrame:
        if len(xq) == 0:
            return pd.DataFrame({"codes": [], "errs": []})
        X = np.stack(xq.to_numpy()).astype(np.int64, copy=False)
        X3 = X.reshape(len(X), m, ds)  # (b, m, ds)
        codes = np.empty((len(X), m), dtype=np.int64)
        errs = np.empty((len(X), m), dtype=np.int64)
        for s in range(m):
            Xs = X3[:, s, :]  # (b, ds)
            dist = (
                (Xs * Xs).sum(axis=1)[:, None]
                + c2[:, s][None, :]
                - 2 * (Xs @ C3[:, s, :].T)
            )  # (b, ksub)
            codes[:, s] = dist.argmin(axis=1)
            errs[:, s] = dist[np.arange(len(X)), codes[:, s]]
        return pd.DataFrame(
            {"codes": list(codes), "errs": list(errs)}
        )

    enc = base.withColumn("_e", encode_udf("xq")).select(
        "vid", "xq", F.col("_e.codes").alias("codes"), F.col("_e.errs").alias("errs")
    )
    return enc, C3


def pq_codes(
    df: DataFrame,
    *,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Product quantization: codes + per-subspace quality summary.

    PQ is the memory-side companion to SQ8 (operators above): the
    vector splits into `m` subspaces of dim/m, each encoded as the id
    of its nearest sub-centroid from a `ksub`-entry codebook — 64
    float32 dims become 8 bytes, and ANN scans read codes via lookup
    tables instead of raw vectors. Same determinism contract as
    `kmeans`: e6-quantized integers, exact int64 distances (≤ 2^45
    for 8-dim e6 subvectors), md5-seeded codebooks (the ksub seed
    vectors' subvectors — production would Lloyd-refine per subspace;
    seeding keeps the oracle replayable and the shape identical),
    argmin ties to the smaller code id.

    Scale: encoding is ROW-LOCAL against the (ksub·dim)-int codebook
    literal — the same control-plane budget and Arrow-matmul kernel
    rationale as `_assign` (one (batch×dim)@(dim×ksub) int64 matmul
    per subspace per Arrow batch). The only shuffle is the final
    (subspace) summary agg: m rows out.
    """
    enc, _ = pq_encode(
        df, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col, dim=dim
    )
    z = enc.select(
        F.posexplode(F.arrays_zip("codes", "errs")).alias("subspace", "ce")
    )
    return (
        z.groupBy(F.col("subspace").cast("long").alias("subspace"))
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.countDistinct("ce.codes").cast("long").alias("n_codes_used"),
            F.sum("ce.errs").cast("long").alias("sq_err_total"),
        )
        .orderBy("subspace")
    )


def ivfpq_topk(
    df: DataFrame,
    *,
    query_id: int = 0,
    topk: int = 10,
    k_coarse: int = 8,
    nprobe: int = 2,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """IVF-PQ approximate nearest neighbors — the standard production
    ANN index shape (coarse inverted lists + residual product codes):

    1. Coarse quantizer: `iters` exact-integer Lloyd rounds
       (kmeans_fit) give k_coarse centroids and the per-vector list
       assignment.
    2. Residual encode: each vector's residual against ITS centroid
       is PQ-encoded (pq_encode pre_quantized — residuals of e6-grid
       ints are exact) — residuals are far smaller than raw vectors,
       which is why IVF-PQ recall beats flat PQ at equal bytes.
    3. Query: coarse distances to the k centroids are a pure
       control-plane computation (numpy over k·dim ints); the nprobe
       nearest lists are probed. Per probed list, the QUERY residual
       against THAT list's centroid builds an ADC lookup table
       (nprobe·m·ksub int64 cells — control plane, broadcast back).
    4. Candidates = vectors in probed lists only; each scores as a
       row-local sum of m table lookups over its code bytes; top-k by
       (adc, id) via TakeOrdered.

    At 100 TB: the fact-scale work is ONE scan for assignment, ONE
    for residual encode, and a probed-lists-only ADC scan (the
    inverted-list pruning is the point — nprobe/k_coarse of the data
    touched per query); everything the query needs rides broadcasts
    of control-plane tables. All arithmetic is exact int64 on the e6
    grid, so an independent SQL engine replays the index bit-for-bit.
    """
    assigned, centroids = kmeans_fit(
        df, k=k_coarse, iters=iters, id_col=id_col, vec_col=vec_col, dim=dim
    )
    assigned = assigned.persist()
    spark = df.sparkSession
    cent_df = spark.createDataFrame(
        [(cid, list(cu)) for cid, cu in enumerate(centroids)],
        "cluster int, cu array<bigint>",
    )
    resid = assigned.join(F.broadcast(cent_df), "cluster").select(
        "vid",
        "cluster",
        F.expr("zip_with(xq, cu, (a, b) -> a - b)").alias("xr"),
    )
    enc, C3 = pq_encode(
        resid,
        m=m,
        ksub=ksub,
        id_col="vid",
        vec_col="xr",
        dim=dim,
        pre_quantized=True,
    )
    # Query side — all control plane: the query vector (1 row), coarse
    # distances to k_coarse centroids, probe selection, and the
    # per-probed-list ADC tables.
    qrow = assigned.filter(F.col("vid") == query_id).select("xq").collect()
    if not qrow:
        raise ValueError(f"query_id {query_id} not found")
    q = np.asarray(qrow[0]["xq"], dtype=np.int64)
    C = np.asarray(centroids, dtype=np.int64)  # (k, dim)
    coarse_d = ((q[None, :] - C) ** 2).sum(axis=1)  # (k,)
    probes = sorted(range(k_coarse), key=lambda c: (int(coarse_d[c]), c))[
        :nprobe
    ]
    ds = dim // m
    lut_rows = []
    for c in probes:
        rq = (q - C[c]).reshape(m, ds)  # query residual vs THIS list
        # (m, ksub) exact int64 sub-distances to the residual codebook
        lut = ((rq[:, None, :] - C3.transpose(1, 0, 2)) ** 2).sum(axis=2)
        lut_rows.append((c, [[int(x) for x in row] for row in lut]))
    lut_df = spark.createDataFrame(
        lut_rows, "cluster int, lut array<array<bigint>>"
    )
    cand = (
        enc.join(
            assigned.select("vid", "cluster"), "vid"
        )
        .join(F.broadcast(lut_df), "cluster")  # probed lists only
        .filter(F.col("vid") != query_id)
    )
    return (
        cand.select(
            F.col("vid").alias(id_col),
            F.col("cluster").cast("long").alias("cluster"),
            F.expr(
                "aggregate(transform(codes, (c, i) -> lut[i][c]), 0L,"
                " (acc, v) -> acc + v)"
            )
            .cast("long")
            .alias("adc_q"),
        )
        .orderBy(F.asc("adc_q"), F.asc(id_col))
        .limit(topk)
    )
