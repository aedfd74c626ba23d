"""Tier-3 similarity-search queries over the `embeddings` table.

Oracles compute the identical float→double sequential-fold cosine in
DuckDB (list comprehensions + list_sum); NOT DuckDB's built-in
list_cosine_similarity, which accumulates in float32 and would
mismatch. All similarity outputs rounded to 6 dp (continuous-safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as S
from ..sources import load_table
from .catalog import query

DIM = 64


def _cos_sql(a: str, b: str, dim: int = DIM) -> str:
    """Exact DuckDB twin of operators.similarity.cosine."""
    d = (
        f"list_sum([CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
        f"for i in range(1, {dim} + 1)])"
    )
    na = (
        f"sqrt(list_sum([CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE) "
        f"for i in range(1, {dim} + 1)]))"
    )
    nb = (
        f"sqrt(list_sum([CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
        f"for i in range(1, {dim} + 1)]))"
    )
    return f"({d} / ({na} * {nb}))"


def _planes_sql(vec: str, num_planes: int, dim: int = DIM) -> str:
    """Exact DuckDB twin of operators.similarity.hyperplane_bits."""
    terms = []
    for p in range(num_planes):
        proj = (
            f"list_sum([CAST({vec}[j] AS DOUBLE) "
            f"* (((1009 * {p} + 31 * j) % 199) - 99) "
            f"for j in range(1, {dim} + 1)])"
        )
        terms.append(
            f"(CASE WHEN {proj} >= 0 THEN CAST({1 << p} AS BIGINT) ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


# --------------------------------------------------------------------------
@query(
    "ann_brute_force_topk",
    tier="T3",
    doc="Exact cosine top-10 neighbors of vec_id=0 (T3.2 baseline). "
    "Broadcast query vector; TakeOrderedAndProject — no shuffle.",
    oracle=f"""
    WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           round({_cos_sql('e.embedding', 'q.qvec')}, 6) AS cos_sim
    FROM embeddings e, q
    WHERE e.vec_id != 0
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT 10
    """,
)
def ann_brute_force_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return S.brute_force_topk(e, query_id=0, k=10)


# --------------------------------------------------------------------------
@query(
    "embedding_neardup_pairs",
    tier="T3",
    doc="Embedding near-dup pairs: cosine ≥ 0.4 within label blocks "
    "(T3.2 embedding-cosine near-dup; blocking = the scale plan).",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
           round({_cos_sql('a.embedding', 'b.embedding')}, 6) AS cos_sim
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round({_cos_sql('a.embedding', 'b.embedding')}, 6) >= 0.4
    ORDER BY vec_a, vec_b
    """,
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return S.cosine_neardup_pairs(e, threshold=0.4).orderBy("vec_a", "vec_b")


# --------------------------------------------------------------------------
@query(
    "ann_lsh_buckets",
    tier="T3",
    doc="Random-hyperplane LSH bucket histogram (8 deterministic integer "
    "planes). The offline half of the ANN scale path.",
    oracle=f"""
    SELECT {_planes_sql('embedding', 8)} AS bucket,
           count(*) AS n_vecs,
           min(vec_id) AS min_vec_id
    FROM embeddings
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.withColumn("bucket", S.hyperplane_bits("embedding", 8))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"), F.min("vec_id").alias("min_vec_id"))
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
@query(
    "ann_lsh_topk",
    tier="T3",
    doc="ANN probe: top-10 within the query's LSH bucket only (the "
    "online half of the scale path; compare recall vs brute force).",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding,
             {_planes_sql('embedding', 8)} AS bucket
      FROM embeddings
    ),
    q AS (SELECT embedding AS qvec, bucket AS qbucket FROM b WHERE vec_id = 0)
    SELECT e.vec_id, e.bucket,
           round({_cos_sql('e.embedding', 'q.qvec')}, 6) AS cos_sim
    FROM b e, q
    WHERE e.bucket = q.qbucket AND e.vec_id != 0
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT 10
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return S.lsh_bucket_topk(e, query_id=0, k=10, num_planes=8)


# --------------------------------------------------------------------------
@query(
    "ann_ivf_topk",
    tier="T3",
    doc="IVF-style ANN: assign to deterministic seed centroids (argmax "
    "cosine), probe only the query's cell (T3.2 IVF variant).",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS centroid_id, embedding AS cvec
      FROM embeddings WHERE vec_id < 8
    ),
    assigned AS (
      SELECT vec_id, embedding, centroid_id FROM (
        SELECT e.vec_id, e.embedding, c.centroid_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round({_cos_sql('e.embedding', 'c.cvec')}, 6) DESC,
                          c.centroid_id) AS rn
        FROM embeddings e, cents c
      ) WHERE rn = 1
    ),
    q AS (SELECT embedding AS qvec, centroid_id AS qcell
          FROM assigned WHERE vec_id = 0)
    SELECT a.vec_id, a.centroid_id,
           round({_cos_sql('a.embedding', 'q.qvec')}, 6) AS cos_sim
    FROM assigned a, q
    WHERE a.centroid_id = q.qcell AND a.vec_id != 0
    ORDER BY cos_sim DESC, a.vec_id
    LIMIT 10
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    assigned = S.ivf_assign(e, num_centroids=8)
    q = assigned.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("__qvec"), F.col("centroid_id").alias("__qcell")
    )
    return (
        assigned.join(F.broadcast(q), F.col("centroid_id") == F.col("__qcell"))
        .filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            "centroid_id",
            F.round(S.cosine(F.col("embedding"), F.col("__qvec")), 6).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


# --------------------------------------------------------------------------
@query(
    "ann_lsh_recall",
    tier="T3",
    doc="ANN quality gate: recall@10 of the LSH bucket probe vs exact "
    "brute force, for 5 query vectors in one pass (the metric that "
    "decides if a bucketing config ships). Ranks use round-6 cosine "
    "with vec_id tiebreak so both engines rank identically.",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding,
             {_planes_sql('embedding', 8)} AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, embedding AS qvec, bucket AS qbucket
          FROM b WHERE vec_id < 5),
    scored AS (
      SELECT q.qid, e.vec_id, e.bucket, q.qbucket,
             round({_cos_sql('e.embedding', 'q.qvec')}, 6) AS cos_sim
      FROM b e, q
      WHERE e.vec_id != q.qid
    ),
    exact_topk AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY cos_sim DESC, vec_id) AS rn
        FROM scored
      ) WHERE rn <= 10
    ),
    probe_topk AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY cos_sim DESC, vec_id) AS rn
        FROM scored WHERE bucket = qbucket
      ) WHERE rn <= 10
    )
    SELECT e.qid AS query_id,
           (SELECT count(*) FROM probe_topk p WHERE p.qid = e.qid)
             AS n_probe,
           round(count(p.vec_id) / CAST(10 AS DOUBLE), 6) AS recall_at_10
    FROM exact_topk e
    LEFT JOIN probe_topk p ON p.qid = e.qid AND p.vec_id = e.vec_id
    GROUP BY e.qid
    ORDER BY query_id
    """,
)
def ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    b = e.withColumn("bucket", S.hyperplane_bits("embedding", 8))
    q = b.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("__qvec"),
        F.col("bucket").alias("__qbucket"),
    )
    scored = (
        b.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            "bucket",
            "__qbucket",
            F.round(S.cosine(F.col("embedding"), F.col("__qvec")), 6).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    exact_topk = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("qid", "vec_id")
    )
    probe_topk = (
        scored.filter(F.col("bucket") == F.col("__qbucket"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("qid", "vec_id")
    )
    n_probe = probe_topk.groupBy("qid").agg(F.count("*").alias("n_probe"))
    overlap = exact_topk.join(probe_topk, ["qid", "vec_id"], "left_semi")
    return (
        exact_topk.groupBy("qid")
        .agg(F.count("*").alias("__n_exact"))
        .join(F.broadcast(n_probe), "qid", "left")
        .join(
            F.broadcast(
                overlap.groupBy("qid").agg(F.count("*").alias("__n_hit"))
            ),
            "qid",
            "left",
        )
        .select(
            F.col("qid").alias("query_id"),
            F.coalesce("n_probe", F.lit(0)).alias("n_probe"),
            F.round(
                F.coalesce("__n_hit", F.lit(0)) / F.lit(10.0), 6
            ).alias("recall_at_10"),
        )
        .orderBy("query_id")
    )


# --------------------------------------------------------------------------
# T3.2 — iterative embedding clustering (exact-integer Lloyd's k-means)
# --------------------------------------------------------------------------
def _kmeans_assign_ctes(k: int = 8, dim: int = DIM) -> str:
    """WITH-body (no `WITH`, no final SELECT) replaying
    operators.clustering.kmeans (k, iters=2) up to the final assignment
    CTE `a3(vec_id, cluster, d)`, with `qv(vec_id, xq)` the quantized
    vectors — shared by the kmeans oracle and every oracle that builds
    on cluster assignments (semantic dedup)."""
    idx = f"generate_series(1, {dim})"
    zeros = f"[CAST(0 AS BIGINT) for i in {idx}]"

    def dist(q: str, c: str) -> str:
        return (
            f"list_sum([({q}.xq[i] - {c}.cu[i]) * ({q}.xq[i] - {c}.cu[i]) "
            f"for i in {idx}])"
        )

    def assign(n: int, cents: str) -> str:
        return f"""
    d{n} AS (
      SELECT q.vec_id, c.cid, {dist('q', 'c')} AS d
      FROM qv q CROSS JOIN {cents} c
    ),
    a{n} AS (
      SELECT vec_id, cid AS cluster, d FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM d{n}
      ) WHERE rn = 1
    )"""

    def update(n: int, asg: str) -> str:
        return f"""
    c{n}_raw AS (
      SELECT cluster AS cid, list(cu ORDER BY dim) AS cu FROM (
        SELECT a.cluster, g.i AS dim,
               CAST(floor(CAST(sum(q.xq[g.i]) AS DOUBLE) / count(*)) AS BIGINT)
                 AS cu
        FROM {asg} a JOIN qv q USING (vec_id)
        CROSS JOIN {idx} g(i)
        GROUP BY 1, 2
      ) GROUP BY 1
    ),
    c{n} AS (
      SELECT r.cid, coalesce(c.cu, {zeros}) AS cu
      FROM (SELECT unnest(generate_series(0, {k - 1})) AS cid) r
      LEFT JOIN c{n}_raw c USING (cid)
    )"""

    return f"""qv AS (
      SELECT vec_id,
             [CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
              for i in {idx}] AS xq
      FROM embeddings
    ),
    seeds AS (
      SELECT vec_id, rn - 1 AS cid FROM (
        SELECT vec_id, row_number()
                 OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM embeddings
      ) WHERE rn <= {k}
    ),
    c0 AS (
      SELECT s.cid, q.xq AS cu FROM seeds s JOIN qv q USING (vec_id)
    ),{assign(1, 'c0')},{update(1, 'a1')},{assign(2, 'c1')},{update(2, 'a2')},{assign(3, 'c2')}"""


def _kmeans_oracle(k: int = 8, dim: int = DIM) -> str:
    """SQL twin of operators.clustering.kmeans (k=8, iters=2): the same
    quantize→seed→assign→update→assign→update→assign sequence in exact
    integer arithmetic; empty clusters zero-fill on both engines."""
    return f"""
    WITH {_kmeans_assign_ctes(k, dim)}
    SELECT cluster, count(*) AS n_vecs, CAST(sum(d) AS BIGINT) AS inertia_q
    FROM a3 GROUP BY 1 ORDER BY 1
    """


@query(
    "embedding_kmeans",
    tier="T3",
    doc="Iterative Lloyd's k-means (k=8, 2 update rounds) over the "
    "embedding table in EXACT integer arithmetic — the semantic-"
    "bucketing step of embedding-space corpus curation, and the "
    "catalog's iterative-ML shape with a full SQL oracle (quantized "
    "e6 vectors, md5-seeded init, integer distances, floor-mean "
    "updates, argmin ties to the smaller cid). Per round: one scan + "
    "one map-side-combined (cluster, dim) agg; assignment is row-"
    "local against driver-literal centroids (k·dim control-plane "
    "collect, same budget class as the TF-IDF vocab) — the fact side "
    "never shuffles for assignment. See operators/clustering.py for "
    "the 100 TB notes.",
    oracle=_kmeans_oracle(),
)
def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import clustering as C

    emb = load_table(spark, sf_dir, "embeddings")
    return C.kmeans(emb, k=8, iters=2, dim=DIM)


# --------------------------------------------------------------------------
# T3.2 — int8 scalar quantization (the ANN compression path)
# --------------------------------------------------------------------------
@query(
    "embedding_quantize_sq8",
    tier="T3",
    doc="Scalar int8 quantization of the embedding column — the "
    "compression step that makes 100 TB of vectors memory-resident "
    "for ANN (SQ8 = 4× smaller than float32, distance kernels read "
    "the codes directly). Everything is EXACT integer arithmetic on "
    "the e6-quantized grid: per-vector min/max range, code = "
    "round(255·(x−mn)/range) via the (2·255·a + r) div (2r) "
    "half-up-floor identity, reconstruction error likewise — so the "
    "oracle replays bit-for-bit. Entirely row-local (zero shuffles "
    "until the 1-row quality summary): per-vector codes/error, then "
    "one global agg gating mean reconstruction error. Constant "
    "vectors (range 0) quantize to code 0 with zero error.",
    oracle=f"""
    WITH q AS (
      SELECT vec_id,
             [CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
              for i in range(1, {DIM} + 1)] AS xq
      FROM embeddings
    ),
    r AS (
      SELECT vec_id, xq,
             list_min(xq) AS mn,
             list_max(xq) - list_min(xq) AS rng
      FROM q
    ),
    c AS (
      SELECT vec_id, mn, rng,
             [CASE WHEN rng = 0 THEN 0
                   ELSE (2 * 255 * (x - mn) + rng) // (2 * rng) END
              for x in xq] AS codes,
             xq
      FROM r
    ),
    e AS (
      SELECT vec_id, mn, rng,
             list_sum([
               (mn + CASE WHEN rng = 0 THEN 0
                          ELSE (2 * codes[i] * rng + 255) // (2 * 255) END
                - xq[i])
               * (mn + CASE WHEN rng = 0 THEN 0
                            ELSE (2 * codes[i] * rng + 255) // (2 * 255) END
                  - xq[i])
              for i in range(1, {DIM} + 1)]) AS sq_err
      FROM c
    )
    SELECT count(*) AS n_vecs,
           CAST(min(rng) AS BIGINT) AS min_range,
           CAST(max(rng) AS BIGINT) AS max_range,
           CAST(sum(sq_err) AS BIGINT) AS total_sq_err,
           round(CAST(sum(sq_err) AS DOUBLE) / count(*) / {DIM}, 4)
             AS mean_dim_sq_err
    FROM e
    """,
)
def embedding_quantize_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> "
            "cast(round(cast(x as double) * 1000000) as bigint))"
        ).alias("xq"),
    )
    r = q.select(
        "vec_id",
        "xq",
        F.array_min("xq").alias("mn"),
        (F.array_max("xq") - F.array_min("xq")).alias("rng"),
    )
    c = r.select(
        "vec_id",
        "xq",
        "mn",
        "rng",
        F.expr(
            "transform(xq, x -> CASE WHEN rng = 0 THEN 0L "
            "ELSE (2 * 255 * (x - mn) + rng) div (2 * rng) END)"
        ).alias("codes"),
    )
    recon = (
        "transform(codes, q -> mn + CASE WHEN rng = 0 THEN 0L "
        "ELSE (2 * q * rng + 255) div (2 * 255) END)"
    )
    e = c.select(
        "vec_id",
        "rng",
        F.expr(
            f"aggregate(zip_with({recon}, xq, (r, x) -> (r - x) * (r - x)), "
            "0L, (acc, v) -> acc + v)"
        ).alias("sq_err"),
    )
    return e.agg(
        F.count("*").alias("n_vecs"),
        F.min("rng").cast("long").alias("min_range"),
        F.max("rng").cast("long").alias("max_range"),
        F.sum("sq_err").cast("long").alias("total_sq_err"),
        F.round(
            F.sum("sq_err").cast("double") / F.count("*") / DIM, 4
        ).alias("mean_dim_sq_err"),
    )


# --------------------------------------------------------------------------
# T3.2 — exact feature-covariance audit (the PCA-input matrix)
# --------------------------------------------------------------------------
_COV_DIMS = 16
_COV_TOPK = 20


def _cov_oracle() -> str:
    sums = ",\n             ".join(
        f"CAST(sum(xq[{i + 1}]) AS HUGEINT) AS s{i}" for i in range(_COV_DIMS)
    )
    prods = ",\n             ".join(
        f"CAST(sum(xq[{i + 1}] * xq[{j + 1}]) AS HUGEINT) AS p{i}_{j}"
        for i in range(_COV_DIMS)
        for j in range(i, _COV_DIMS)
    )
    cells = "\n      UNION ALL ".join(
        f"SELECT {i} AS dim_i, {j} AS dim_j, "
        f"CAST(n * p{i}_{j} - s{i} * s{j} AS DOUBLE) / (CAST(n AS DOUBLE) * n)"
        f" AS cov_e6 FROM s"
        for i in range(_COV_DIMS)
        for j in range(i, _COV_DIMS)
    )
    return f"""
    WITH q AS (
      SELECT [CAST(round(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT)
              for i in range(1, {_COV_DIMS} + 1)] AS xq
      FROM embeddings
    ),
    s AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             {sums},
             {prods}
      FROM q
    ),
    cells AS (
      {cells}
    )
    SELECT dim_i, dim_j, round(cov_e6, 4) AS cov_q
    FROM cells
    ORDER BY abs(cov_e6) DESC, dim_i, dim_j
    LIMIT {_COV_TOPK}
    """


@query(
    "embedding_covariance_audit",
    tier="T3",
    doc=f"Exact covariance matrix over the first {_COV_DIMS} embedding "
    "dimensions — the input to PCA/whitening and the redundant-"
    "feature audit. All sufficient statistics (n, 16 sums, 136 "
    "pairwise product-sums) accumulate as exact int64 long sums over "
    "the cached quantized scan, split across two codegen-sized "
    "aggregates (see the in-function note on codegen.maxFields). "
    "Covariance cells (n·Σxy − Σx·Σy)/n² are computed in DECIMAL "
    "from the single stats row (138 cells, cost-free) and the "
    "top-|cov| cells emit with a full-key tiebreak. Adding "
    "dimensions grows the aggregate width, never the scan count.",
    oracle=_cov_oracle(),
)
def embedding_covariance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings", spread=True).selectExpr(
        f"transform(slice(embedding, 1, {_COV_DIMS}), x -> "
        "cast(round(cast(x as double) * 1000) as bigint)) AS xq"
    ).persist()
    # e3 quantization keeps per-row products ≤ 1e6, so every running
    # sum stays inside int64 up to ~9·10^12 rows — all-long arithmetic.
    # Plan-construction discipline (measured, in order): (1) the 153
    # statistics SPLIT across two aggregates of ≤80 fields each —
    # a single 153-field aggregate exceeds codegen.maxFields (and at
    # raised limits breaks janino), falling back to interpreted
    # evaluation (5.3 s vs 1.4 s); (2) every wide expression list is
    # built as SQL STRINGS through selectExpr/F.expr — composing
    # ~1500 Column objects through the Python API cost 5+ s of pure
    # Py4J round trips before the first task launched. DECIMAL
    # accumulators and a numpy mapInPandas kernel were measured too;
    # both lose.
    pairs = [(i, j) for i in range(_COV_DIMS) for j in range(i, _COV_DIMS)]
    half = len(pairs) // 2

    def psum(i: int, j: int) -> str:
        return f"cast(sum(xq[{i}] * xq[{j}]) as bigint) AS p{i}_{j}"

    agg_a = emb.selectExpr(
        "cast(count(*) as bigint) AS n",
        *[f"cast(sum(xq[{i}]) as bigint) AS s{i}" for i in range(_COV_DIMS)],
        *[psum(i, j) for i, j in pairs[:half]],
    )
    agg_b = emb.selectExpr(*[psum(i, j) for i, j in pairs[half:]])
    s = agg_a.crossJoin(agg_b)
    d = "decimal(38,0)"
    cell_sql = ", ".join(
        f"named_struct('dim_i', {i}, 'dim_j', {j}, 'cov_e6', "
        f"cast(cast(n as {d}) * cast(p{i}_{j} as {d})"
        f" - cast(s{i} as {d}) * cast(s{j} as {d}) as double)"
        f" / (cast(n as double) * cast(n as double)))"
        for i, j in pairs
    )
    return (
        s.select(F.explode(F.expr(f"array({cell_sql})")).alias("c"))
        .select("c.dim_i", "c.dim_j", "c.cov_e6")
        .orderBy(F.abs(F.col("cov_e6")).desc(), "dim_i", "dim_j")
        .limit(_COV_TOPK)
        .select("dim_i", "dim_j", F.round("cov_e6", 4).alias("cov_q"))
    )


# --------------------------------------------------------------------------
# T3.2 — product quantization (the memory-side ANN compression path)
# --------------------------------------------------------------------------
_PQ_M, _PQ_KSUB, _PQ_DS = 8, 16, DIM // 8


def _pq_sub_dist(q: str = "q", c: str = "c") -> str:
    """Squared int distance between one subvector pair (DuckDB)."""
    return (
        f"list_sum([({q}.xq[g.m * {_PQ_DS} + i] - {c}.xq[g.m * {_PQ_DS} + i])"
        f" * ({q}.xq[g.m * {_PQ_DS} + i] - {c}.xq[g.m * {_PQ_DS} + i])"
        f" for i in generate_series(1, {_PQ_DS})])"
    )


def _pq_assign_ctes() -> str:
    """Shared WITH body: e6-quantized vectors -> md5-seeded codebook ->
    per-(vector, subspace) nearest-code assignment. The single source
    of truth for the PQ encoding contract — used by BOTH the code-
    quality oracle (_pq_oracle) and the ADC-scan oracle
    (_pq_adc_oracle) so the two can never desynchronize."""
    return f"""qv AS (
      SELECT vec_id,
             [CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
              for i in generate_series(1, {DIM})] AS xq
      FROM embeddings
    ),
    seeds AS (
      SELECT vec_id, rn - 1 AS sid FROM (
        SELECT vec_id, row_number()
                 OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM embeddings
      ) WHERE rn <= {_PQ_KSUB}
    ),
    cb AS (SELECT s.sid, q.xq FROM seeds s JOIN qv q USING (vec_id)),
    d AS (
      SELECT q.vec_id, g.m AS subspace, c.sid, {_pq_sub_dist()} AS d
      FROM qv q
      CROSS JOIN cb c
      CROSS JOIN (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS m) g
    ),
    a AS (
      SELECT vec_id, subspace, sid AS code, d FROM (
        SELECT *, row_number()
                 OVER (PARTITION BY vec_id, subspace ORDER BY d, sid) AS rn
        FROM d
      ) WHERE rn = 1
    )"""


def _pq_oracle() -> str:
    return f"""
    WITH {_pq_assign_ctes()}
    SELECT CAST(subspace AS BIGINT) AS subspace,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(count(DISTINCT code) AS BIGINT) AS n_codes_used,
           CAST(sum(d) AS BIGINT) AS sq_err_total
    FROM a GROUP BY subspace ORDER BY subspace
    """


@query(
    "embedding_pq_codes",
    tier="T3",
    doc=f"Product quantization ({_PQ_M} subspaces × {_PQ_KSUB}-entry "
    "codebooks): each embedding's subvectors encode as nearest-sub-"
    "centroid ids — 64 float dims become 8 code bytes, the compression "
    "that makes 100 TB of vectors ANN-scannable from memory (lookup-"
    "table distances over codes; SQ8's row-wise cousin). Exact-integer "
    "determinism throughout (e6 grid, int64 distances, md5-seeded "
    "codebooks, argmin ties to the smaller code) so the SQL oracle "
    "replays bit-for-bit. Encoding is row-local against the codebook "
    "literal (Arrow int-matmul kernel, control-plane ksub·dim "
    "collect); one m-row summary agg gates code utilization and "
    "quantization error per subspace.",
    oracle=_pq_oracle(),
)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import clustering as C

    emb = load_table(spark, sf_dir, "embeddings")
    return C.pq_codes(emb, m=_PQ_M, ksub=_PQ_KSUB, dim=DIM)


# --------------------------------------------------------------------------
# T3.2 — semantic dedup (SemDeDup shape: near-dups WITHIN kmeans buckets)
# --------------------------------------------------------------------------
_SEM_K = 8
_SEM_RED_THR = 0.3
#: target cluster size for the adaptive cluster count (see query doc):
#: k = max(_SEM_K, n // _SEM_TARGET) keeps sum(cluster^2) ~ n * target
#: — LINEAR in corpus size — instead of n^2/k under a fixed k.
_SEM_TARGET = 250


def _semantic_dedup_oracle() -> str:
    idx = f"generate_series(1, {DIM})"
    return f"""
    WITH {_kmeans_assign_ctes(_SEM_K, DIM)},
    v AS (
      SELECT a.vec_id, a.cluster, q.xq,
             sqrt(CAST(list_sum([x * x for x in q.xq]) AS DOUBLE)) AS nrm
      FROM a3 a JOIN qv q USING (vec_id)
    ),
    p AS (
      SELECT x.cluster, x.vec_id AS vec_a, y.vec_id AS vec_b,
             round(CAST(list_sum([x.xq[i] * y.xq[i] for i in {idx}])
                        AS DOUBLE) / (x.nrm * y.nrm), 6) AS cos_q
      FROM v x JOIN v y
        ON x.cluster = y.cluster AND x.vec_id < y.vec_id
    ),
    top AS (
      SELECT cluster, vec_a, vec_b, cos_q FROM (
        SELECT *, row_number() OVER (PARTITION BY cluster
                 ORDER BY cos_q DESC, vec_a, vec_b) AS rn
        FROM p
      ) WHERE rn = 1
    ),
    cnt AS (
      SELECT cluster, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN cos_q >= {_SEM_RED_THR} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_redundant
      FROM p GROUP BY cluster
    ),
    cl AS (SELECT DISTINCT cluster FROM a3)
    SELECT cl.cluster,
           coalesce(c.n_pairs, 0) AS n_pairs,
           coalesce(c.n_redundant, 0) AS n_redundant,
           t.vec_a, t.vec_b, t.cos_q
    FROM cl
    LEFT JOIN cnt c USING (cluster)
    LEFT JOIN top t USING (cluster)
    ORDER BY cl.cluster
    """


@query(
    "embedding_semantic_dedup",
    tier="T3",
    doc=f"Semantic-dedup audit (the SemDeDup shape): kmeans buckets "
    "the corpus (exact-integer Lloyd's, md5 seeds, 2 rounds — the "
    "shared assignment replayed by the oracle), then near-duplicate "
    "scoring runs only WITHIN each bucket — the clustering turns the "
    "all-pairs O(n²) cosine problem into Σ cluster², which is the "
    "only way semantic dedup scales to 100 TB of embeddings. Per "
    f"cluster: pair count, count of redundant pairs (cos ≥ "
    f"{_SEM_RED_THR}), and the single most-similar pair. The kernel "
    "is one exact int64 X·Xᵀ matmul per cluster group "
    "(applyInPandas; cluster sizes are the operator's unit of work). "
    "Cluster COUNT is a control-plane decision off the corpus count: "
    "k = max(8, n/250) holds cluster size ~constant as the corpus "
    "grows, so sum(cluster^2) — the kernel's total work — stays "
    "LINEAR in n; a fixed k made the sf0.001->sf1 weak-scaling curve "
    "go 7.1x at 10x data (clusters grew 10x, pair kernels 100x — the "
    "round-7 curve finding), and the adaptive k brings it back to "
    "~data-linear. The oracle replays k=8, which IS the adaptive "
    "choice at every oracle-gated scale (n <= 2000 at sf0.1 and "
    "below); larger corpora only run in the timing-only scale "
    "slices. Cosines round at 6 dp before any comparison so both "
    "engines rank identically.",
    oracle=_semantic_dedup_oracle(),
)
def embedding_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators import clustering as C

    emb = load_table(spark, sf_dir, "embeddings")
    # one metadata-cheap control-plane action; the count also bounds
    # the seed collect inside kmeans_fit (k rows of k*dim ints).
    n = emb.count()
    k = max(_SEM_K, n // _SEM_TARGET)
    a = C.kmeans_assign(emb, k=k, iters=2, dim=DIM)

    schema = (
        "cluster long, n_pairs long, n_redundant long, "
        "vec_a long, vec_b long, cos_q double"
    )

    def per_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        cluster = int(pdf["cluster"].iloc[0])
        pdf = pdf.sort_values("vid")
        vids = pdf["vid"].to_numpy()
        if len(vids) < 2:
            return pd.DataFrame(
                [[cluster, 0, 0, None, None, None]],
                columns=[
                    "cluster", "n_pairs", "n_redundant",
                    "vec_a", "vec_b", "cos_q",
                ],
            )
        X = np.stack(pdf["xq"].to_numpy()).astype(np.int64, copy=False)
        dots = X @ X.T  # exact: |dot| <= 64e12 < 2^53
        nrm = np.sqrt(np.diag(dots).astype(np.float64))
        cos = np.round(dots / np.outer(nrm, nrm), 6)
        iu, ju = np.triu_indices(len(vids), k=1)
        c = cos[iu, ju]
        # top pair by (cos desc, vec_a, vec_b) on the ROUNDED value —
        # identical to the oracle's row_number ordering.
        order = np.lexsort((vids[ju], vids[iu], -c))
        b = order[0]
        return pd.DataFrame(
            [[
                cluster,
                int(len(c)),
                int((c >= _SEM_RED_THR).sum()),
                int(vids[iu[b]]),
                int(vids[ju[b]]),
                float(c[b]),
            ]],
            columns=[
                "cluster", "n_pairs", "n_redundant",
                "vec_a", "vec_b", "cos_q",
            ],
        )

    return (
        a.select("cluster", "vid", "xq")
        .groupBy("cluster")
        .applyInPandas(per_cluster, schema)
        .orderBy("cluster")
    )


# --------------------------------------------------------------------------
# T3.2 — retrieval with metadata (the RAG lookup join)
# --------------------------------------------------------------------------
@query(
    "ann_topk_with_metadata",
    tier="T3",
    doc="Retrieval join: exact cosine top-5 for the query vector, then "
    "the k-row result joins the documents table for display metadata "
    "(lang, source, length) — the lookup shape every retrieval "
    "pipeline ends with. The expensive half (scoring) never touches "
    "the wide table: TakeOrdered stops at k rows and only THOSE join "
    "metadata (broadcast of the k-row side; at 100 TB the metadata "
    "join is a point-lookup pattern against a keyed store).",
    oracle=f"""
    WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
    topk AS (
      SELECT e.vec_id,
             round({_cos_sql('e.embedding', 'q.qvec')}, 6) AS cos_sim
      FROM embeddings e, q
      WHERE e.vec_id != 0
      ORDER BY cos_sim DESC, e.vec_id
      LIMIT 5
    )
    SELECT t.vec_id, t.cos_sim, d.lang, d.source, d.n_chars
    FROM topk t JOIN documents d ON d.doc_id = t.vec_id
    ORDER BY t.cos_sim DESC, t.vec_id
    """,
)
def ann_topk_with_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    topk = S.brute_force_topk(e, query_id=0, k=5)
    return (
        F.broadcast(topk)
        .join(d, topk.vec_id == d.doc_id)
        .select("vec_id", "cos_sim", "lang", "source", "n_chars")
        .orderBy(F.desc("cos_sim"), "vec_id")
    )


# --------------------------------------------------------------------------
# T3.2 — hard-negative mining (contrastive-training data prep)
# --------------------------------------------------------------------------
@query(
    "embedding_hard_negatives",
    tier="T3",
    doc="Hard-negative mining: for each of 5 anchor vectors, the 3 "
    "most-similar vectors with a DIFFERENT label — the contrastive-"
    "training data-prep step (high-similarity cross-label pairs are "
    "the negatives that actually teach the margin). The 5-row anchor "
    "side broadcasts; scoring is one scan of the corpus (fan-out 5, "
    "row-local cosine fold); per-anchor top-3 rides the rank window "
    "(WindowGroupLimit pushes k into the shuffle). At 100 TB the scan "
    "narrows to each anchor's LSH bucket first (ann_lsh_topk's path) "
    "— same ranking, candidate-bounded cost. Cosines round at 6 dp "
    "with a vec_id tiebreak (catalog doctrine).",
    oracle=f"""
    WITH a AS (
      SELECT vec_id AS anchor_id, embedding AS avec, label AS albl
      FROM embeddings WHERE vec_id < 5
    ),
    s AS (
      SELECT a.anchor_id, e.vec_id,
             round({_cos_sql('e.embedding', 'a.avec')}, 6) AS cos_sim
      FROM embeddings e, a
      WHERE e.label != a.albl
    ),
    r AS (
      SELECT anchor_id, vec_id, cos_sim,
             row_number() OVER (PARTITION BY anchor_id
                                ORDER BY cos_sim DESC, vec_id) AS rk
      FROM s
    )
    SELECT anchor_id, CAST(rk AS BIGINT) AS rk,
           vec_id AS negative_id, cos_sim
    FROM r WHERE rk <= 3
    ORDER BY anchor_id, rk
    """,
)
def embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    a = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("avec"),
        F.col("label").alias("albl"),
    )
    scored = (
        e.crossJoin(F.broadcast(a))
        .filter(F.col("label") != F.col("albl"))
        .select(
            "anchor_id",
            "vec_id",
            F.round(S.cosine(F.col("embedding"), F.col("avec")), 6).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("anchor_id", "rk", F.col("vec_id").alias("negative_id"), "cos_sim")
        .orderBy("anchor_id", "rk")
    )


# --------------------------------------------------------------------------
# T3.2 — PQ asymmetric-distance scan (the memory-resident ANN query path)
# --------------------------------------------------------------------------
def _pq_adc_oracle() -> str:
    exact = (
        f"list_sum([(a.xq[i] - q0.xq[i]) * (a.xq[i] - q0.xq[i])"
        f" for i in generate_series(1, {DIM})])"
    )
    return f"""
    WITH {_pq_assign_ctes()},
    lut AS (
      SELECT g.m AS subspace, c.sid, {_pq_sub_dist()} AS d
      FROM (SELECT xq FROM qv WHERE vec_id = 0) q
      CROSS JOIN cb c
      CROSS JOIN (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS m) g
    ),
    adc AS (
      SELECT a.vec_id, CAST(sum(l.d) AS BIGINT) AS adc_d
      FROM a JOIN lut l ON l.subspace = a.subspace AND l.sid = a.code
      WHERE a.vec_id != 0
      GROUP BY a.vec_id
    ),
    ex AS (
      SELECT a.vec_id, CAST({exact} AS BIGINT) AS exact_d
      FROM qv a, (SELECT xq FROM qv WHERE vec_id = 0) q0
      WHERE a.vec_id != 0
    ),
    extop AS (SELECT vec_id FROM ex ORDER BY exact_d, vec_id LIMIT 10),
    r AS (
      SELECT adc.vec_id, adc.adc_d, ex.exact_d,
             row_number() OVER (ORDER BY adc.adc_d, adc.vec_id) AS rk
      FROM adc JOIN ex USING (vec_id)
    )
    SELECT CAST(rk AS BIGINT) AS rk, vec_id, adc_d, exact_d,
           vec_id IN (SELECT vec_id FROM extop) AS in_exact_top10
    FROM r WHERE rk <= 10 ORDER BY rk
    """


@query(
    "ann_pq_adc_topk",
    tier="T3",
    doc="PQ asymmetric-distance (ADC) scan: the query vector builds an "
    f"({_PQ_M}×{_PQ_KSUB})-entry lookup table of exact int64 distances "
    "to every sub-centroid, and each corpus vector's approximate "
    "distance is the sum of 8 TABLE LOOKUPS on its code bytes — no "
    "vector arithmetic in the scan. This is how 100 TB of embeddings "
    "is actually searched: codes live in memory (8 B/vector), the LUT "
    "is query-local (control-plane m·ksub ints), and the scan is "
    "row-local + one TakeOrdered — no shuffle, no global window. Each "
    "of the top-10 rows carries its exact quantized distance and an "
    "in_exact_top10 flag, so the result IS the recall audit of the "
    "compression (the ann_lsh_recall gate pattern). Exact integer "
    "arithmetic end to end; ADC ties break on vec_id.",
    oracle=_pq_adc_oracle(),
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from ..operators.clustering import pq_encode

    e = load_table(spark, sf_dir, "embeddings")
    enc, C3 = pq_encode(e, m=_PQ_M, ksub=_PQ_KSUB, dim=DIM)
    enc = enc.persist()
    # Query subvectors → LUT (control plane: m·ksub int64 cells).
    q = np.asarray(
        enc.filter(F.col("vid") == 0).select("xq").collect()[0][0],
        dtype=np.int64,
    ).reshape(_PQ_M, _PQ_DS)
    lut = ((C3.transpose(1, 0, 2) - q[:, None, :]) ** 2).sum(axis=2)  # (m, ksub)
    lut_lit = F.array(
        *[
            F.array(*[F.lit(int(v)) for v in lut[s]])
            for s in range(_PQ_M)
        ]
    )
    adc = sum(
        (
            F.element_at(
                F.element_at(lut_lit, s + 1),
                (F.element_at("codes", s + 1) + 1).cast("int"),
            )
            for s in range(_PQ_M)
        ),
        F.lit(0),
    )
    q0 = enc.filter(F.col("vid") == 0).select(F.col("xq").alias("q0"))
    scored = (
        enc.filter(F.col("vid") != 0)
        .crossJoin(F.broadcast(q0))
        .select(
            F.col("vid").alias("vec_id"),
            adc.cast("long").alias("adc_d"),
            F.aggregate(
                F.zip_with("xq", "q0", lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("exact_d"),
        )
    )
    topk = scored.orderBy("adc_d", "vec_id").limit(10)
    extop = scored.orderBy("exact_d", "vec_id").limit(10).select("vec_id")
    from pyspark.sql import Window

    return (
        topk.join(
            F.broadcast(extop.withColumn("_hit", F.lit(True))), "vec_id", "left"
        )
        .select(
            F.row_number()
            .over(Window.orderBy("adc_d", "vec_id"))
            .cast("long")
            .alias("rk"),
            "vec_id",
            "adc_d",
            "exact_d",
            F.coalesce(F.col("_hit"), F.lit(False)).alias("in_exact_top10"),
        )
        .orderBy("rk")
    )


# --------------------------------------------------------------------------
# T3.2 — power iteration: top singular direction, exact integer replay
# --------------------------------------------------------------------------
_PI_DIMS = 8
_PI_ROUNDS = 3
_PI_GRID = 1_000_000


def _pi_chain_sql(div_op: str) -> str:
    """The shared iteration chain: second-moment agg -> 3 unrolled
    matrix-vector rounds with e6 rescale. `div_op` is the engine's
    integer-division token ('div' / '//') — only ever applied to
    NON-NEGATIVE operands here (sign-split below), where Spark's
    truncating `div` and DuckDB's flooring `//` agree.
    """
    k, g = _PI_DIMS, _PI_GRID
    m = lambda i, j: f"m{min(i, j)}_{max(i, j)}"  # noqa: E731
    parts = [
        "s AS (SELECT "
        + ", ".join(
            f"CAST(sum(xq[{i + 1}] * xq[{j + 1}]) AS BIGINT) AS m{i}_{j}"
            for i in range(k)
            for j in range(i, k)
        )
        + " FROM q)",
        "r0 AS (SELECT s.*, "
        + ", ".join(f"CAST({g} AS BIGINT) AS v{i}" for i in range(k))
        + " FROM s)",
    ]
    keep = ", ".join(f"m{i}_{j}" for i in range(k) for j in range(i, k))
    for t in range(1, _PI_ROUNDS + 1):
        wsum = {
            i: " + ".join(f"{m(i, j)} * v{j}" for j in range(k))
            for i in range(k)
        }
        parts.append(
            f"w{t} AS (SELECT r{t - 1}.*, "
            + ", ".join(f"({wsum[i]}) AS w{i}" for i in range(k))
            + f" FROM r{t - 1})"
        )
        mx = "greatest(" + ", ".join(f"abs(w{i})" for i in range(k)) + ")"
        parts.append(
            f"x{t} AS (SELECT w{t}.*, "
            f"greatest({mx} {div_op} {g}, 1) AS mxd FROM w{t})"
        )
        vdiv = ", ".join(
            f"(CASE WHEN w{i} < 0 THEN -((-w{i}) {div_op} mxd) "
            f"ELSE w{i} {div_op} mxd END) AS v{i}"
            for i in range(k)
        )
        parts.append(f"r{t} AS (SELECT {keep}, {vdiv} FROM x{t})")
    return ",\n    ".join(parts)


def _pi_oracle() -> str:
    k = _PI_DIMS
    final = f"r{_PI_ROUNDS}"
    sel = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS dim, CAST(v{i} AS BIGINT) "
        f"AS loading_e6 FROM {final}"
        for i in range(k)
    )
    return f"""
    WITH q AS (
      SELECT [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)
              for x in embedding[1:{k}]] AS xq
      FROM embeddings
    ),
    {_pi_chain_sql('//')}
    SELECT dim, loading_e6 FROM ({sel}) ORDER BY dim
    """


@query(
    "embedding_power_iteration",
    tier="T3",
    doc=f"Top singular direction of the (quantized) embedding matrix "
    f"via {_PI_ROUNDS} unrolled power-iteration rounds over the first "
    f"{_PI_DIMS} dims — the PCA/spectral building block, built so an "
    "independent SQL engine replays every round BIT-FOR-BIT: the "
    "second-moment matrix is one exact-int64 aggregate (e3-quantized "
    "products; 36 upper-triangle sums, map-side combinable — the ONLY "
    "data-scale pass), and each round is a control-plane 1-row "
    "matrix-vector product with an e6 integer rescale using sign-"
    "split truncating division (Spark `div` truncates, DuckDB `//` "
    "floors — sign-splitting makes them agree on negatives). int64 "
    "bound: |M·v| <= dims·Σ|x_i x_j|·1e6, safe through ~1e6 rows at "
    "e3 quantization — ENFORCED in-plan: the moment aggregate also "
    "counts rows and an assert_true gate raises past 1e6 rows rather "
    "than let non-ANSI int64 sums wrap silently (ADVICE r5); past "
    "that the chain lifts to DECIMAL(38,0) unchanged. No collect, no "
    "loop over data — iterations live in the plan exactly like "
    "graph_pagerank's unrolled rounds.",
    oracle=_pi_oracle(),
)
def embedding_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = _PI_DIMS
    emb = load_table(spark, sf_dir, "embeddings", spread=True).selectExpr(
        f"transform(slice(embedding, 1, {k}), x -> "
        "cast(round(cast(x as double) * 1000) as bigint)) AS xq"
    )
    m = lambda i, j: f"m{min(i, j)}_{max(i, j)}"  # noqa: E731
    # NOTE: Spark SQL's arr[i] is 0-BASED; the DuckDB oracle's is
    # 1-based — the generators differ by exactly that offset.
    r = emb.selectExpr(
        *[
            f"cast(sum(xq[{i}] * xq[{j}]) as bigint) AS m{i}_{j}"
            for i in range(k)
            for j in range(i, k)
        ],
        "count(*) AS n_rows",
    ).selectExpr("*", *[f"cast({_PI_GRID} as bigint) AS v{i}" for i in range(k)])
    # Row-budget guard (free — n_rows rides the same 1-row aggregate):
    # the docstring's int64 bound holds through ~1e6 rows at e3
    # quantization; beyond it non-ANSI Spark would WRAP the sums
    # silently. assert_true is fused onto m0_0, which every round's
    # w0 consumes, so Catalyst cannot prune the check away.
    r = r.selectExpr(
        "*",
        "CASE WHEN assert_true(n_rows <= 1000000, "
        "'embedding_power_iteration: >1e6 rows exceeds the exact-int64 "
        "moment bound; lift the chain to DECIMAL(38,0)') IS NULL "
        "THEN m0_0 END AS _m00_checked",
    ).drop("m0_0", "n_rows").withColumnRenamed("_m00_checked", "m0_0")
    mcols = [f"m{i}_{j}" for i in range(k) for j in range(i, k)]
    for _ in range(_PI_ROUNDS):
        r = r.selectExpr(
            "*",
            *[
                f"({' + '.join(f'{m(i, j)} * v{j}' for j in range(k))}) AS w{i}"
                for i in range(k)
            ],
        )
        mx = "greatest(" + ", ".join(f"abs(w{i})" for i in range(k)) + ")"
        r = r.selectExpr("*", f"greatest({mx} div {_PI_GRID}, 1) AS mxd")
        r = r.selectExpr(
            *mcols,
            *[
                f"(CASE WHEN w{i} < 0 THEN -((-w{i}) div mxd) "
                f"ELSE w{i} div mxd END) AS v{i}"
                for i in range(k)
            ],
        )
    cells = ", ".join(
        f"named_struct('dim', cast({i} as bigint), "
        f"'loading_e6', cast(v{i} as bigint))"
        for i in range(k)
    )
    return (
        r.select(F.explode(F.expr(f"array({cells})")).alias("c"))
        .select("c.dim", "c.loading_e6")
        .orderBy("dim")
    )


# --------------------------------------------------------------------------
# T3.2 — MMR diversified retrieval (maximal marginal relevance)
# --------------------------------------------------------------------------
_MMR_POOL = 20
_MMR_K = 5
#: λ = 0.7 as the exact integer pair (7, 3) on a ×10 grid.
_MMR_REL_W, _MMR_DIV_W = 7, 3


def _mmr_round_ctes() -> str:
    """Unrolled MMR selection rounds shared by the DuckDB oracle.

    Round 1 picks pure argmax relevance; round t>1 scores every
    remaining candidate as REL_W·rel − DIV_W·max(sim to selected) and
    picks the (score desc, vec_id) argmax. All integer arithmetic.
    """
    parts = [
        f"""s1 AS (
      SELECT vec_id, rel, CAST({_MMR_REL_W} * rel AS BIGINT) AS mmr,
             CAST(1 AS BIGINT) AS rank
      FROM cand ORDER BY rel DESC, vec_id LIMIT 1
    )""",
        "sel1 AS (SELECT vec_id FROM s1)",
    ]
    for t in range(2, _MMR_K + 1):
        p = t - 1
        parts.append(
            f"""s{t} AS (
      SELECT c.vec_id, c.rel,
             CAST({_MMR_REL_W} * c.rel - {_MMR_DIV_W} * (
               SELECT max(s.dp) FROM sims s
               WHERE s.a = c.vec_id
                 AND s.b IN (SELECT vec_id FROM sel{p})
             ) AS BIGINT) AS mmr,
             CAST({t} AS BIGINT) AS rank
      FROM cand c
      WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{p})
      ORDER BY mmr DESC, c.vec_id LIMIT 1
    )"""
        )
        parts.append(
            f"""sel{t} AS (
      SELECT vec_id FROM sel{p} UNION ALL SELECT vec_id FROM s{t}
    )"""
        )
    return ",\n    ".join(parts)


def _mmr_oracle() -> str:
    dot = (
        "list_sum([a.xq[i] * b.xq[i] for i in generate_series(1, "
        f"{DIM})])"
    )
    qdot = (
        "list_sum([e.xq[i] * q.xq[i] for i in generate_series(1, "
        f"{DIM})])"
    )
    union = " UNION ALL ".join(
        f"SELECT rank, vec_id, rel, mmr FROM s{t}"
        for t in range(1, _MMR_K + 1)
    )
    return f"""
    WITH base AS (
      SELECT vec_id,
             [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)
              for x in embedding] AS xq
      FROM embeddings
    ),
    q AS (SELECT xq FROM base WHERE vec_id = 0),
    cand AS (
      SELECT e.vec_id, CAST({qdot} AS BIGINT) AS rel
      FROM base e CROSS JOIN q
      WHERE e.vec_id != 0
      ORDER BY rel DESC, e.vec_id LIMIT {_MMR_POOL}
    ),
    sims AS (
      SELECT a.vec_id AS a, b.vec_id AS b, CAST({dot} AS BIGINT) AS dp
      FROM (SELECT c.vec_id, base.xq FROM cand c JOIN base USING (vec_id)) a
      JOIN (SELECT c.vec_id, base.xq FROM cand c JOIN base USING (vec_id)) b
        ON a.vec_id != b.vec_id
    ),
    {_mmr_round_ctes()}
    SELECT rank, vec_id, rel, mmr FROM ({union}) ORDER BY rank
    """


@query(
    "embedding_mmr_topk",
    tier="T3",
    doc=f"MMR diversified retrieval (Carbonell & Goldstein 1998): "
    f"top-{_MMR_K} results for the vec-0 query that balance relevance "
    f"against redundancy — round 1 takes the pure argmax, each later "
    f"round scores remaining candidates as {_MMR_REL_W}·rel − "
    f"{_MMR_DIV_W}·max(sim to already-selected) (λ=0.7 on an exact "
    "×10 integer grid) and takes the (score, id) argmax. The "
    "dedup-aware retrieval shape for curating diverse training "
    "samples. Scale/determinism design: ONE data-scale pass scores "
    f"relevance (exact e3-quantized int dots); the top-{_MMR_POOL} "
    f"candidate pool and its pairwise sims are control-plane "
    f"({_MMR_POOL}\u00b2 ints) collected once, and the {_MMR_K} "
    "selection rounds run as a driver-side argmax loop over them "
    "(k-means centroid budget class) — every score an exact int64, "
    "replayed bit-for-bit by the oracle's unrolled CTE chain.",
    oracle=_mmr_oracle(),
)
def embedding_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        load_table(spark, sf_dir, "embeddings", spread=True)
        .selectExpr(
            "vec_id",
            "transform(embedding, x -> "
            "cast(round(cast(x as double) * 1000) as bigint)) AS xq",
        )
        .persist()
    )
    q = base.filter(F.col("vec_id") == 0).select(F.col("xq").alias("qq"))
    dot = (
        "aggregate(zip_with(xq, {o}, (a, b) -> a * b), 0L, "
        "(acc, x) -> acc + x)"
    )
    cand = (
        base.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .selectExpr("vec_id", "xq", f"cast({dot.format(o='qq')} as bigint) AS rel")
        .orderBy(F.desc("rel"), "vec_id")
        .limit(_MMR_POOL)
        .persist()
    )
    ca = cand.select(F.col("vec_id").alias("a"), F.col("xq").alias("xa"))
    cb = cand.select(F.col("vec_id").alias("b"), F.col("xq").alias("xb"))
    sims = (
        ca.crossJoin(cb)
        .filter(F.col("a") != F.col("b"))
        .selectExpr(
            "a",
            "b",
            "cast(aggregate(zip_with(xa, xb, (p, r) -> p * r), 0L, "
            "(acc, x) -> acc + x) as bigint) AS dp",
        )
        .persist()
    )
    # Selection rounds are CONTROL PLANE: the pool is _MMR_POOL rows and
    # sims _MMR_POOL² ints — collect once and run the argmax loop on the
    # driver (same budget class as the k-means centroid collects; the
    # plan-side alternative chains 5 limit(1) subplans and measured 5×
    # slower for identical output). The data-scale work — scoring and
    # top-pool selection — stays distributed above.
    pool = {r["vec_id"]: r["rel"] for r in cand.select("vec_id", "rel").collect()}
    dp = {(r["a"], r["b"]): r["dp"] for r in sims.collect()}
    first = max(pool, key=lambda v: (pool[v], -v))
    rows = [(1, first, pool[first], _MMR_REL_W * pool[first])]
    selected = [first]
    for t in range(2, _MMR_K + 1):
        best = None
        for v, rel in pool.items():
            if v in selected:
                continue
            mmr = _MMR_REL_W * rel - _MMR_DIV_W * max(
                dp[(v, s)] for s in selected
            )
            if best is None or (mmr, -v) > (best[3], -best[1]):
                best = (t, v, rel, mmr)
        rows.append(best)
        selected.append(best[1])
    return spark.createDataFrame(
        rows, "rank long, vec_id long, rel long, mmr long"
    ).orderBy("rank")


# --------------------------------------------------------------------------
# T3 — Matryoshka truncation audit (dimension-budget recall tradeoff)
# --------------------------------------------------------------------------
_MRL_DIM = 16
_MRL_K = 10
_MRL_QUERIES = 5


@query(
    "embedding_truncation_recall",
    tier="T3",
    doc=f"Dimension-truncation audit: recall@{_MRL_K} of a "
    f"{_MRL_DIM}-dim prefix-truncated cosine ranking vs the full "
    f"{DIM}-dim exact ranking, for {_MRL_QUERIES} query vectors in "
    "one pass — the acceptance gate for Matryoshka-style dimension "
    "cuts (store/search a prefix, keep the tail offline). 4x fewer "
    "dims = 4x less ANN memory and bandwidth; this query measures "
    "what that costs in retrieval quality BEFORE the index is built. "
    "Shape: one broadcast of the query rows against one scan of the "
    "embedding table computing BOTH cosines row-locally (the "
    "truncated one over an array slice — no second scan, no second "
    "shuffle); two per-query top-k windows over the same scored "
    "frame; overlap via a semi-join on (qid, vec_id). Recall is an "
    "exact integer percent.",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qvec FROM embeddings
      WHERE vec_id < {_MRL_QUERIES}
    ),
    scored AS (
      SELECT q.qid, e.vec_id,
             round({_cos_sql('e.embedding', 'q.qvec')}, 6) AS cos_full,
             round({_cos_sql('e.embedding', 'q.qvec', _MRL_DIM)}, 6)
               AS cos_trunc
      FROM embeddings e, q
      WHERE e.vec_id != q.qid
    ),
    full_topk AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY cos_full DESC, vec_id) AS rn
        FROM scored
      ) WHERE rn <= {_MRL_K}
    ),
    trunc_topk AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY cos_trunc DESC, vec_id) AS rn
        FROM scored
      ) WHERE rn <= {_MRL_K}
    )
    SELECT f.qid,
           CAST(count(t.vec_id) AS BIGINT) AS n_hit,
           CAST(count(t.vec_id) * 100 / {_MRL_K} AS BIGINT) AS recall_pct
    FROM full_topk f
    LEFT JOIN trunc_topk t ON f.qid = t.qid AND f.vec_id = t.vec_id
    GROUP BY f.qid
    ORDER BY f.qid
    """,
)
def embedding_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _MRL_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("__qvec")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(S.cosine(F.col("embedding"), F.col("__qvec")), 6).alias(
                "cos_full"
            ),
            F.round(
                S.cosine(
                    F.slice("embedding", 1, _MRL_DIM),
                    F.slice("__qvec", 1, _MRL_DIM),
                ),
                6,
            ).alias("cos_trunc"),
        )
    )
    wf = Window.partitionBy("qid").orderBy(F.desc("cos_full"), F.asc("vec_id"))
    wt = Window.partitionBy("qid").orderBy(
        F.desc("cos_trunc"), F.asc("vec_id")
    )
    full_topk = (
        scored.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") <= _MRL_K)
        .select("qid", "vec_id")
    )
    trunc_topk = (
        scored.withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") <= _MRL_K)
        .select("qid", "vec_id")
    )
    hits = full_topk.join(trunc_topk, ["qid", "vec_id"], "left_semi")
    return (
        full_topk.groupBy("qid")
        .agg(F.lit(1).alias("__one"))
        .join(
            F.broadcast(
                hits.groupBy("qid").agg(
                    F.count("*").cast("long").alias("n_hit")
                )
            ),
            "qid",
            "left",
        )
        .select(
            "qid",
            F.coalesce("n_hit", F.lit(0).cast("long")).alias("n_hit"),
            (
                F.coalesce("n_hit", F.lit(0).cast("long"))
                * 100
                / F.lit(_MRL_K)
            )
            .cast("long")
            .alias("recall_pct"),
        )
        .orderBy("qid")
    )


# --------------------------------------------------------------------------
# T3 — two-stage retrieval: truncated shortlist, full-precision re-rank
# --------------------------------------------------------------------------
_RERANK_SHORTLIST = 50


@query(
    "ann_shortlist_rerank",
    tier="T3",
    doc=f"Two-stage retrieval — the production remedy the truncation "
    f"audit motivates: stage 1 scores the WHOLE table with the cheap "
    f"{_MRL_DIM}-dim truncated cosine and keeps a "
    f"{_RERANK_SHORTLIST}-candidate shortlist per query "
    "(WindowGroupLimit prunes per partition before the window sort); "
    f"stage 2 re-fetches ONLY the shortlist's full {DIM}-dim vectors "
    "(an equi-join on vec_id — candidates x queries rows, never the "
    "corpus) and re-ranks with the exact cosine, returning top-"
    f"{_MRL_K}. Full-precision work scales with the shortlist, not "
    "the table: at 100 TB that is the difference between reading 8 B "
    "prefixes per row and 256 B vectors per row for everything. "
    "Output carries both scores so the rank movement is visible.",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qvec FROM embeddings
      WHERE vec_id < {_MRL_QUERIES}
    ),
    st1 AS (
      SELECT q.qid, e.vec_id, q.qvec,
             round({_cos_sql('e.embedding', 'q.qvec', _MRL_DIM)}, 6)
               AS cos_trunc
      FROM embeddings e, q
      WHERE e.vec_id != q.qid
    ),
    shortlist AS (
      SELECT qid, vec_id, qvec, cos_trunc FROM (
        SELECT qid, vec_id, qvec, cos_trunc,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY cos_trunc DESC, vec_id) AS rn
        FROM st1
      ) WHERE rn <= {_RERANK_SHORTLIST}
    ),
    st2 AS (
      SELECT s.qid, s.vec_id, s.cos_trunc,
             round({_cos_sql('e.embedding', 's.qvec')}, 6) AS cos_full
      FROM shortlist s JOIN embeddings e ON s.vec_id = e.vec_id
    )
    SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, cos_trunc, cos_full
    FROM (
      SELECT qid, vec_id, cos_trunc, cos_full,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos_full DESC, vec_id) AS rank
      FROM st2
    ) WHERE rank <= {_MRL_K}
    ORDER BY qid, rank
    """,
)
def ann_shortlist_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _MRL_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("__qvec")
    )
    st1 = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            "__qvec",
            F.round(
                S.cosine(
                    F.slice("embedding", 1, _MRL_DIM),
                    F.slice("__qvec", 1, _MRL_DIM),
                ),
                6,
            ).alias("cos_trunc"),
        )
    )
    w1 = Window.partitionBy("qid").orderBy(
        F.desc("cos_trunc"), F.asc("vec_id")
    )
    shortlist = (
        st1.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= _RERANK_SHORTLIST)
        .select("qid", "vec_id", "__qvec", "cos_trunc")
    )
    st2 = shortlist.join(
        e.select("vec_id", "embedding"), "vec_id"
    ).select(
        "qid",
        "vec_id",
        "cos_trunc",
        F.round(S.cosine(F.col("embedding"), F.col("__qvec")), 6).alias(
            "cos_full"
        ),
    )
    w2 = Window.partitionBy("qid").orderBy(F.desc("cos_full"), F.asc("vec_id"))
    return (
        st2.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= _MRL_K)
        .select("qid", F.col("rank").cast("long"), "vec_id", "cos_trunc",
                "cos_full")
        .orderBy("qid", "rank")
    )


# --------------------------------------------------------------------------
# T3.2 — reciprocal-rank fusion of two retrievers
# --------------------------------------------------------------------------
_RRF_C = 60  # the standard RRF damping constant (Cormack et al. 2009)
_RRF_K = 10


@query(
    "ann_rrf_fusion",
    tier="T3",
    doc=f"Reciprocal-rank fusion of two retrievers over the same "
    "corpus for query vec 0: retriever A ranks by the FULL-dimension "
    f"exact integer dot product, retriever B by the cheap {_MRL_DIM}-"
    "dim truncated dot (the shortlist scorer) — rrf = "
    f"1/({_RRF_C}+rank_A) + 1/({_RRF_C}+rank_B) on an exact e6 "
    "integer grid (floor division, both engines). THE standard "
    "hybrid-retrieval combiner: rank-space fusion needs no score "
    "calibration between retrievers. Scale shape: scores are "
    "row-local exact int64 dots (one scan, query broadcast as a "
    "1-row control-plane literal); each ranking is the two-phase "
    "distributed rank (operators/prefix.py cumsum of ones — never a "
    "single-partition row_number over the corpus), CHAINED so the "
    "second ranking rides the first's output with no join-back.",
    oracle=f"""
    WITH x AS (
      SELECT vec_id,
             [CAST(round(CAST(e AS DOUBLE) * 1000) AS BIGINT)
              for e in embedding] AS xq
      FROM embeddings
    ),
    q AS (SELECT xq AS qv FROM x WHERE vec_id = 0),
    sc AS (
      SELECT x.vec_id,
             CAST(list_sum([x.xq[i] * q.qv[i]
               for i in range(1, {DIM} + 1)]) AS BIGINT) AS dot_full,
             CAST(list_sum([x.xq[i] * q.qv[i]
               for i in range(1, {_MRL_DIM} + 1)]) AS BIGINT) AS dot_trunc
      FROM x, q WHERE x.vec_id != 0
    ),
    r AS (
      SELECT vec_id,
             CAST(row_number() OVER (ORDER BY dot_full DESC, vec_id)
                  AS BIGINT) AS rank_a,
             CAST(row_number() OVER (ORDER BY dot_trunc DESC, vec_id)
                  AS BIGINT) AS rank_b
      FROM sc
    )
    SELECT vec_id, rank_a, rank_b,
           CAST(1000000 // ({_RRF_C} + rank_a)
              + 1000000 // ({_RRF_C} + rank_b) AS BIGINT) AS rrf_e6
    FROM r
    ORDER BY rrf_e6 DESC, vec_id
    LIMIT {_RRF_K}
    """,
)
def ann_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import distributed_cumsum

    e = load_table(spark, sf_dir, "embeddings", spread=True).selectExpr(
        "vec_id",
        "transform(embedding, e -> cast(round(cast(e as double) * 1000)"
        " as bigint)) AS xq",
    )
    q = e.filter(F.col("vec_id") == 0).select(F.col("xq").alias("__qv"))
    sc = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .selectExpr(
            "vec_id",
            "cast(aggregate(zip_with(xq, __qv, (a, b) -> a * b), 0L,"
            " (acc, v) -> acc + v) as bigint) AS dot_full",
            f"cast(aggregate(zip_with(slice(xq, 1, {_MRL_DIM}),"
            f" slice(__qv, 1, {_MRL_DIM}), (a, b) -> a * b), 0L,"
            " (acc, v) -> acc + v) as bigint) AS dot_trunc",
        )
        .withColumn("one", F.lit(1).cast("long"))
    )
    ra = distributed_cumsum(
        sc.withColumn("_na", -F.col("dot_full")),
        order_cols=["_na", "vec_id"],
        value_col="one",
        out_col="rank_a",
    )
    rb = distributed_cumsum(
        ra.withColumn("_nb", -F.col("dot_trunc")),
        order_cols=["_nb", "vec_id"],
        value_col="one",
        out_col="rank_b",
    ).drop("one", "_na", "_nb")
    return (
        rb.selectExpr(
            "vec_id",
            "rank_a",
            "rank_b",
            f"cast(1000000 div ({_RRF_C} + rank_a)"
            f" + 1000000 div ({_RRF_C} + rank_b) as bigint) AS rrf_e6",
        )
        .orderBy(F.desc("rrf_e6"), F.asc("vec_id"))
        .limit(_RRF_K)
    )


# --------------------------------------------------------------------------
# T3.2 — binary quantization (sign bits vs per-dim mean) + Hamming rerank
# --------------------------------------------------------------------------
_BQ_SHORTLIST = 30
_BQ_K = 10


def _bq_word(arr: str, sums, nvar: str, lo: int, base: int) -> str:
    """Textual packed-word expression: 32 threshold bits -> one BIGINT.

    `sums(i)` renders the per-dim sum reference; `base` is the array
    index origin (Spark 0, DuckDB 1). Weights are Python-exact 2^j
    literals, so bit 31 of each word never touches the sign bit.
    """
    return " + ".join(
        f"(CASE WHEN {arr}[{i + base}] * {nvar} >= {sums(i + base)} "
        f"THEN {1 << (i - lo)} ELSE 0 END)"
        for i in range(lo, lo + 32)
    )


def _bq_oracle() -> str:
    lo = _bq_word("xq", lambda i: f"sv[{i}]", "nn", 0, 1)
    hi = _bq_word("xq", lambda i: f"sv[{i}]", "nn", 32, 1)
    return f"""
    WITH x AS (
      SELECT vec_id, embedding,
             [CAST(round(CAST(e AS DOUBLE) * 1000) AS BIGINT)
              for e in embedding] AS xq
      FROM embeddings
    ),
    n_ AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM x),
    s_ AS (
      SELECT list(s ORDER BY i) AS sv FROM (
        SELECT i, CAST(sum(xq[i]) AS BIGINT) AS s
        FROM x, generate_series(1, {DIM}) AS t(i) GROUP BY i
      )
    ),
    w AS (
      SELECT vec_id, embedding,
             CAST({lo} AS BIGINT) AS w_lo, CAST({hi} AS BIGINT) AS w_hi
      FROM x, n_, s_
    ),
    q AS (SELECT w_lo AS q_lo, w_hi AS q_hi, embedding AS qvec
          FROM w WHERE vec_id = 0),
    h AS (
      SELECT w.vec_id, w.embedding, q.qvec,
             CAST(bit_count(xor(w.w_lo, q.q_lo))
                + bit_count(xor(w.w_hi, q.q_hi)) AS BIGINT) AS hamming
      FROM w, q WHERE w.vec_id != 0
    ),
    short AS (
      SELECT * FROM h ORDER BY hamming, vec_id LIMIT {_BQ_SHORTLIST}
    )
    SELECT vec_id, hamming,
           round({_cos_sql('embedding', 'qvec')}, 6) AS cos_sim
    FROM short ORDER BY cos_sim DESC, vec_id LIMIT {_BQ_K}
    """


@query(
    "ann_binary_hamming_topk",
    tier="T3",
    doc=f"Binary-quantized retrieval with exact rerank: every vector "
    "compresses to ONE BIT PER DIMENSION (1 iff the dim exceeds its "
    f"corpus mean — computed exactly as x_i*n >= sum_i on e3 ints), "
    f"packed into two int64 words; candidate scan is xor + bit_count "
    f"Hamming distance (row-local, {DIM} dims in 2 machine words = "
    f"32x less memory than float32), a {_BQ_SHORTLIST}-candidate "
    f"shortlist reranks with the exact cosine, top-{_BQ_K} out. The "
    "third point on the catalog's quantization curve (SQ8 -> PQ -> "
    "binary) and the cheapest memory-resident ANN scan there is. "
    "Scale shape: per-dim means are ONE map-side-combined 64-sum "
    "aggregate broadcast back as a 1-row literal; bit-packing and "
    "Hamming are row-local integer ops inside whole-stage codegen; "
    "only the shortlist (not the corpus) touches full-precision "
    "vectors again. All-integer until the final rerank cosine.",
    oracle=_bq_oracle(),
)
def ann_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = load_table(spark, sf_dir, "embeddings", spread=True).selectExpr(
        "vec_id",
        "embedding",
        "transform(embedding, e -> cast(round(cast(e as double) * 1000)"
        " as bigint)) AS xq",
    )
    sums = x.agg(
        F.count("*").cast("long").alias("nn"),
        *[
            F.sum(F.expr(f"xq[{i}]")).cast("long").alias(f"s{i}")
            for i in range(DIM)
        ],
    )
    lo = _bq_word("xq", lambda i: f"s{i}", "nn", 0, 0)
    hi = _bq_word("xq", lambda i: f"s{i}", "nn", 32, 0)
    w = x.crossJoin(F.broadcast(sums)).selectExpr(
        "vec_id",
        "embedding",
        f"CAST({lo} AS BIGINT) AS w_lo",
        f"CAST({hi} AS BIGINT) AS w_hi",
    )
    q = w.filter(F.col("vec_id") == 0).select(
        F.col("w_lo").alias("q_lo"),
        F.col("w_hi").alias("q_hi"),
        F.col("embedding").alias("__qvec"),
    )
    h = (
        w.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .selectExpr(
            "vec_id",
            "embedding",
            "__qvec",
            "cast(bit_count(w_lo ^ q_lo) + bit_count(w_hi ^ q_hi)"
            " as bigint) AS hamming",
        )
    )
    short = h.orderBy(F.asc("hamming"), F.asc("vec_id")).limit(_BQ_SHORTLIST)
    return (
        short.select(
            "vec_id",
            "hamming",
            F.round(S.cosine(F.col("embedding"), F.col("__qvec")), 6).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(_BQ_K)
    )


# --------------------------------------------------------------------------
# T3.2 — IVF-PQ: coarse inverted lists + residual product codes
# --------------------------------------------------------------------------
_IVF_K, _IVF_NPROBE, _IVF_TOPK = 8, 2, 10


def _ivfpq_oracle() -> str:
    ds, m, ksub = _PQ_DS, _PQ_M, _PQ_KSUB
    sub = f"generate_series(1, {ds})"

    def sq(expr: str) -> str:
        return f"({expr}) * ({expr})"

    rd_term = sq(f"r.xr[g.m * {ds} + i] - c.xr[g.m * {ds} + i]")
    qp_term = sq("q.xq[i] - c.cu[i]")
    lut_term = sq(
        f"q.xq[g.m * {ds} + i] - cc.cu[g.m * {ds} + i]"
        f" - c.xr[g.m * {ds} + i]"
    )
    return f"""
    WITH {_kmeans_assign_ctes(_IVF_K, DIM)},
    rv AS (
      SELECT q.vec_id,
             [q.xq[i] - c.cu[i] for i in generate_series(1, {DIM})] AS xr
      FROM qv q JOIN a3 a USING (vec_id) JOIN c2 c ON c.cid = a.cluster
    ),
    rseeds AS (
      SELECT vec_id, rn - 1 AS sid FROM (
        SELECT vec_id, row_number()
                 OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM embeddings
      ) WHERE rn <= {ksub}
    ),
    rcb AS (SELECT s.sid, r.xr FROM rseeds s JOIN rv r USING (vec_id)),
    rd AS (
      SELECT r.vec_id, g.m AS subspace, c.sid,
             list_sum([{rd_term} for i in {sub}]) AS d
      FROM rv r CROSS JOIN rcb c
      CROSS JOIN (SELECT unnest(generate_series(0, {m - 1})) AS m) g
    ),
    renc AS (
      SELECT vec_id, subspace, sid AS code FROM (
        SELECT *, row_number()
                 OVER (PARTITION BY vec_id, subspace ORDER BY d, sid) AS rn
        FROM rd
      ) WHERE rn = 1
    ),
    qp AS (
      SELECT c.cid,
             list_sum([{qp_term} for i in generate_series(1, {DIM})]) AS d
      FROM qv q CROSS JOIN c2 c WHERE q.vec_id = 0
    ),
    probes AS (
      SELECT cid FROM (
        SELECT *, row_number() OVER (ORDER BY d, cid) AS rn FROM qp
      ) WHERE rn <= {_IVF_NPROBE}
    ),
    lut AS (
      SELECT p.cid AS cluster, g.m AS m, c.sid,
             list_sum([{lut_term} for i in {sub}]) AS d
      FROM probes p
      JOIN c2 cc ON cc.cid = p.cid
      CROSS JOIN rcb c
      CROSS JOIN (SELECT unnest(generate_series(0, {m - 1})) AS m) g
      CROSS JOIN (SELECT xq FROM qv WHERE vec_id = 0) q
    )
    SELECT e.vec_id, CAST(a.cluster AS BIGINT) AS cluster,
           CAST(sum(l.d) AS BIGINT) AS adc_q
    FROM renc e
    JOIN a3 a USING (vec_id)
    JOIN lut l ON l.cluster = a.cluster AND l.m = e.subspace
              AND l.sid = e.code
    WHERE e.vec_id != 0
    GROUP BY 1, 2
    ORDER BY adc_q, vec_id
    LIMIT {_IVF_TOPK}
    """


@query(
    "ann_ivfpq_topk",
    tier="T3",
    doc=f"IVF-PQ approximate nearest neighbors — the standard "
    f"production ANN index: {_IVF_K} coarse inverted lists (exact-"
    "integer Lloyd's, the kmeans machinery) partition the corpus; "
    f"each vector's RESIDUAL against its list centroid is PQ-encoded "
    f"({_PQ_M}x{_PQ_KSUB} codebooks, 8 bytes/vector); the query "
    f"probes its {_IVF_NPROBE} nearest lists and scans ONLY those "
    "lists' codes with a per-list ADC table built from the query's "
    "residual against THAT list's centroid. Residuals are smaller "
    "than raw vectors, which is why IVF-PQ beats flat PQ at equal "
    "bytes — and the probed-list pruning means a query touches "
    f"{_IVF_NPROBE}/{_IVF_K} of the data (at 100 TB, the difference "
    "between an index and a scan). Fact-scale work: one assignment "
    "scan, one residual-encode scan, one probed-lists ADC scan; the "
    "centroids, probe set, and ADC tables are all control-plane "
    "broadcasts. Exact int64 on the e6 grid end-to-end, so the SQL "
    "oracle replays coarse training, residual encoding, probing, and "
    "the ADC scan bit-for-bit. Cost profile: 2.66 s at sf0.1 "
    "(BENCH_r07; 2.66-3.57 s across the r7 runs) — the wall is the "
    "three mandatory fact scans (assign, encode, ADC), all "
    "whole-stage int64 arithmetic, not a plan miss; watchlist, "
    "compare round over round.",
    oracle=_ivfpq_oracle(),
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        emb,
        query_id=0,
        topk=_IVF_TOPK,
        k_coarse=_IVF_K,
        nprobe=_IVF_NPROBE,
        m=_PQ_M,
        ksub=_PQ_KSUB,
        dim=DIM,
    )


# --------------------------------------------------------------------------
# T3.2 — batch range search: many queries, a radius instead of a k
# --------------------------------------------------------------------------
_RANGE_TAU = 0.25
_RANGE_QUERY_IDS = [0, 1, 2, 3, 4]


@query(
    "ann_batch_range_search",
    tier="T3",
    doc=f"Batch range retrieval: ALL neighbors within cosine >= "
    f"{_RANGE_TAU} for a 5-query batch, in one pass — the two shapes "
    "the top-k family doesn't cover: (a) BATCHED queries amortize the "
    "corpus scan across the whole query set (the right unit of work "
    "for offline retrieval: scan once, score q x n pairs), (b) a "
    "RADIUS predicate returns however many neighbors qualify (dedup "
    "candidate generation, near-duplicate audits) instead of a fixed "
    "k. Plan: the 5-row query side broadcasts onto the corpus scan "
    "(BroadcastNestedLoopJoin — q*n scored rows with NO shuffle of "
    "the corpus), the radius filter prunes before any exchange, and "
    "the only shuffle is the final small-result sort. At 100 TB with "
    "big query batches this becomes block-partitioned matmul "
    "(queries bucketed, corpus scanned once per bucket wave); the "
    "5-query broadcast is the degenerate case of that plan. Cosines "
    "round at 6 dp pre-filter so both engines admit identical edge "
    "rows.",
    oracle=f"""
    SELECT q.vec_id AS query_id, e.vec_id,
           round({_cos_sql('e.embedding', 'q.embedding')}, 6) AS cos_sim
    FROM embeddings e
    JOIN embeddings q
      ON q.vec_id IN ({", ".join(str(i) for i in _RANGE_QUERY_IDS)})
     AND e.vec_id != q.vec_id
    WHERE round({_cos_sql('e.embedding', 'q.embedding')}, 6) >= {_RANGE_TAU}
    ORDER BY query_id, cos_sim DESC, e.vec_id
    """,
)
def ann_batch_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id").isin(_RANGE_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(S.cosine(F.col("embedding"), F.col("qvec")), 6).alias(
                "cos_sim"
            ),
        )
        .filter(F.col("cos_sim") >= _RANGE_TAU)
        .orderBy("query_id", F.desc("cos_sim"), F.asc("vec_id"))
    )
