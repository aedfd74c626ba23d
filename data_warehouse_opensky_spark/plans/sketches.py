"""Probabilistic-sketch queries: Bloom-filter membership and Count-Min
frequency estimation, built as plain exact-integer DataFrame programs.

Why sketches in a 100 TB engine: both structures compress a
data-sized key set into a CONTROL-PLANE-sized summary (a few thousand
int64 words) that then rides a broadcast — membership pre-filters
before expensive joins (the "does this key exist at all" probe that
saves a full shuffle), frequency estimates drive skew handling and
heavy-hitter routing without a second exact pass. Spark ships a
Bloom filter (DataFrame.stat.bloomFilter) but it materializes
driver-side and its hash is JVM-private — useless for a cross-engine
oracle; these implementations use only integer arithmetic both
engines reproduce bit-for-bit (the operators/dedup.py doctrine).

Complements the existing sketch surface: approx_count_distinct (HLL,
T2.7), approx_percentile, Misra-Gries heavy hitters (operators/
freq.py) — this file adds the membership and point-frequency
families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .catalog import query

# Bloom configuration. m bits packed 60 per int64 word (bit index <=
# 59 keeps every mask positive — no sign-bit portability risk between
# engines); k independent salted multiplicative hashes over the same
# public 33-bit prime the MinHash family uses. m = 2^15 is sized so
# the fixture exercises BOTH regimes: ~0 false positives at the
# sf0.01 gate (load factor ~4%) and a measurable ~4% FPR at the
# sf0.1 bench (load ~35%) — the oracle proves the accounting either
# way, and the docstring's broadcast-size claim (547 words) holds at
# any load.
_BLOOM_M = 1 << 15  # 32,768 bits
_BLOOM_K = 3
_BLOOM_BITS_PER_WORD = 60
_BLOOM_PRIME = 4294967311  # = operators/dedup.py MINHASH_PRIME

#: salted hash h_j(x) -> bit position in [0, m). The multipliers are
#: ~2^31-scale (Knuth's 2654435761 + odd salt steps) so a*x EXCEEDS
#: the 33-bit prime for every realistic key and the outer mod
#: actually wraps: with small multipliers (a*x < P) the prime mod is
#: the identity and every row of a d-row sketch degenerates to the
#: SAME `x mod w` collision classes — d "independent" hashes that
#: all collide identically (caught by the CMS overshoot fixture).
#: a*x stays within int64 for keys up to ~3.4e9.
def _bloom_pos_sql(j: int, x: str) -> str:
    a = 2_654_435_761 + 40_503 * j
    b = 1_779_033_703 + 104_729 * j
    return f"((({a} * {x} + {b}) % {_BLOOM_PRIME}) % {_BLOOM_M})"


# Count-Min configuration: d rows x w columns of exact int64 counters.
# w = 256 deliberately puts the fixture in the COLLIDING regime
# (~6 keys/counter at sf0.01, ~60 at sf0.1) so the overshoot column
# actually shows the eps*N estimation error the structure trades for
# its fixed footprint — a non-colliding sketch demonstrates nothing.
_CMS_D = 4
_CMS_W = 256


def _cms_col_sql(j: int, x: str) -> str:
    # large-multiplier family — see _bloom_pos_sql for why.
    a = 3_266_489_917 + 40_503 * j
    b = 1_013_904_223 + 217_645 * j
    return f"((({a} * {x} + {b}) % {_BLOOM_PRIME}) % {_CMS_W})"


@query(
    "sketch_bloom_membership",
    tier="T3",
    doc="Bloom-filter membership audit: build a 2^15-bit / 3-hash "
    "Bloom filter over the custkeys that ordered in 1997-Q1 (~31% of "
    "customers — the negatives make the FPR measurable; explode each "
    "key into 3 (word, mask) pairs, ONE map-side-combined groupBy "
    "bit_or -> a 547-row int64 word table), then probe EVERY "
    "customer through it and score against exact truth (membership "
    "join-back). Reports probe volume, true members, Bloom "
    "positives, false positives, and the realized FPR in exact ppm "
    "(integer division — no float anywhere; the hash family is the "
    "same public-prime multiplicative family as MinHash, so DuckDB "
    "reproduces the filter bit-for-bit). The 100 TB shape: the "
    "filter is CONTROL-PLANE sized (547 words ~ 4 KB) however large "
    "the build side is, so it broadcasts to pre-filter a data-sized "
    "probe before any shuffle join — the classic existence "
    "pre-filter that turns an anti-join against a huge fact into a "
    "local bitmap test plus a small verification join; the build is "
    "one combiner-friendly agg (bit_or is associative/commutative), "
    "never a collect.",
    oracle=f"""
    WITH members AS (
      SELECT DISTINCT o_custkey AS k FROM orders
      WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
        AND CAST(o_orderdate AS DATE) < DATE '1997-04-01'
    ),
    bits AS (
      SELECT pos // {_BLOOM_BITS_PER_WORD} AS word_idx,
             CAST(1 AS BIGINT) << (pos % {_BLOOM_BITS_PER_WORD}) AS mask
      FROM (
        {" UNION ALL ".join(f"SELECT {_bloom_pos_sql(j, 'k')} AS pos FROM members" for j in range(_BLOOM_K))}
      )
    ),
    words AS (
      SELECT word_idx, bit_or(mask) AS w FROM bits GROUP BY 1
    ),
    probe AS (
      SELECT c_custkey AS k,
             CASE WHEN c_custkey IN (SELECT k FROM members)
                  THEN 1 ELSE 0 END AS is_member
      FROM customer
    ),
    probe_bits AS (
      {" UNION ALL ".join(
          f"SELECT k, is_member, "
          f"{_bloom_pos_sql(j, 'k')} // {_BLOOM_BITS_PER_WORD} AS word_idx, "
          f"CAST(1 AS BIGINT) << ({_bloom_pos_sql(j, 'k')} % {_BLOOM_BITS_PER_WORD}) AS mask "
          f"FROM probe" for j in range(_BLOOM_K))}
    ),
    hits AS (
      SELECT pb.k, pb.is_member,
             CASE WHEN (words.w & pb.mask) = pb.mask THEN 1 ELSE 0 END AS hit
      FROM probe_bits pb LEFT JOIN words USING (word_idx)
    ),
    verdict AS (
      SELECT k, min(is_member) AS is_member,
             CASE WHEN sum(hit) = {_BLOOM_K} THEN 1 ELSE 0 END AS bloom_pos
      FROM hits GROUP BY k
    )
    SELECT CAST(count(*) AS BIGINT) AS n_probed,
           CAST(sum(is_member) AS BIGINT) AS n_true_members,
           CAST(sum(bloom_pos) AS BIGINT) AS n_bloom_positive,
           CAST(sum(CASE WHEN bloom_pos = 1 AND is_member = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positive,
           CAST(CASE WHEN count(*) - sum(is_member) > 0 THEN
             1000000 * sum(CASE WHEN bloom_pos = 1 AND is_member = 0
                           THEN 1 ELSE 0 END)
               // (count(*) - sum(is_member)) ELSE 0 END AS BIGINT)
             AS fpr_ppm
    FROM verdict
    """,
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    members = (
        load_table(spark, sf_dir, "orders")
        .filter(
            "CAST(o_orderdate AS DATE) >= DATE '1997-01-01'"
            " AND CAST(o_orderdate AS DATE) < DATE '1997-04-01'"
        )
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    # Build: k hash positions per member -> (word, mask) -> bit_or.
    pos_exprs = [
        f"{_bloom_pos_sql(j, 'k')} AS pos" for j in range(_BLOOM_K)
    ]
    bits = None
    for e in pos_exprs:
        part = members.selectExpr(e).selectExpr(
            f"pos div {_BLOOM_BITS_PER_WORD} AS word_idx",
            f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_BLOOM_BITS_PER_WORD} AS INT)) AS mask",
        )
        bits = part if bits is None else bits.unionByName(part)
    words = bits.groupBy("word_idx").agg(F.expr("bit_or(mask)").alias("w"))

    # Probe: every customer; exact truth via a LEFT SEMI membership
    # flag (distinct member keys join-back — broadcastable dim here,
    # shuffle join at scale; either way exact).
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k")
    )
    probe = cust.join(
        members.withColumn("is_member", F.lit(1)), "k", "left"
    ).fillna(0, ["is_member"])
    pb = None
    for j in range(_BLOOM_K):
        part = probe.selectExpr(
            "k",
            "is_member",
            f"{_bloom_pos_sql(j, 'k')} div {_BLOOM_BITS_PER_WORD} AS word_idx",
            f"shiftleft(CAST(1 AS BIGINT), CAST({_bloom_pos_sql(j, 'k')} % {_BLOOM_BITS_PER_WORD} AS INT)) AS mask",
        )
        pb = part if pb is None else pb.unionByName(part)
    # The word table is control-plane sized by construction — say so.
    hits = pb.join(F.broadcast(words), "word_idx", "left").select(
        "k",
        "is_member",
        F.when(
            F.expr("(w & mask) = mask"), F.lit(1)
        ).otherwise(F.lit(0)).alias("hit"),
    )
    verdict = hits.groupBy("k").agg(
        F.min("is_member").alias("is_member"),
        F.when(F.sum("hit") == _BLOOM_K, F.lit(1))
        .otherwise(F.lit(0))
        .alias("bloom_pos"),
    )
    fp = F.sum(
        F.when((F.col("bloom_pos") == 1) & (F.col("is_member") == 0), 1)
        .otherwise(0)
    )
    totals = verdict.agg(
        F.count("*").cast("long").alias("n_probed"),
        F.sum("is_member").cast("long").alias("n_true_members"),
        F.sum("bloom_pos").cast("long").alias("n_bloom_positive"),
        fp.cast("long").alias("n_false_positive"),
    )
    # `div`, not `/`: Spark's `/` on longs is a double divide, and the
    # oracle's `//` is exact integer floor — keep both sides integral.
    return totals.selectExpr(
        "n_probed",
        "n_true_members",
        "n_bloom_positive",
        "n_false_positive",
        "CAST(CASE WHEN n_probed - n_true_members > 0 THEN"
        " (1000000 * n_false_positive) div (n_probed - n_true_members)"
        " ELSE 0 END AS BIGINT) AS fpr_ppm",
    )


@query(
    "sketch_countmin_frequency",
    tier="T3",
    doc=f"Count-Min sketch frequency audit: one pass over events "
    f"builds a {_CMS_D}x{_CMS_W} exact-int64 counter grid (each event "
    "explodes into d (row, col) cells; ONE map-side-combined groupBy "
    "sum — the sketch is <=1,024 rows of control-plane state no "
    "matter how many events flow through it), then the exact top-20 "
    "users by "
    "event count are estimated back through the sketch: est = min "
    "over d of counter[row, h_row(user)], reported next to the exact "
    "count (CMS guarantees est >= exact; the overshoot column makes "
    "the collision inflation visible). Same public-prime hash family "
    "as the Bloom/MinHash queries, so DuckDB rebuilds the identical "
    "grid. The 100 TB shape: frequency-estimation-before-shuffle — "
    "the broadcastable grid answers 'is this key hot' for skew "
    "routing (salting decisions, heavy-hitter side-paths) without a "
    "second exact pass over the fact.",
    oracle=f"""
    WITH ev AS (SELECT user_id AS k FROM events),
    cells AS (
      {" UNION ALL ".join(
          f"SELECT {j} AS row_idx, {_cms_col_sql(j, 'k')} AS col FROM ev"
          for j in range(_CMS_D))}
    ),
    grid AS (
      SELECT row_idx, col, CAST(count(*) AS BIGINT) AS cnt
      FROM cells GROUP BY 1, 2
    ),
    exact AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_exact
      FROM ev GROUP BY k
      ORDER BY n_exact DESC, k ASC LIMIT 20
    ),
    probes AS (
      {" UNION ALL ".join(
          f"SELECT k, n_exact, {j} AS row_idx, {_cms_col_sql(j, 'k')} AS col "
          f"FROM exact" for j in range(_CMS_D))}
    ),
    est AS (
      SELECT p.k AS user_id, min(p.n_exact) AS n_exact,
             CAST(min(g.cnt) AS BIGINT) AS n_cms
      FROM probes p JOIN grid g USING (row_idx, col)
      GROUP BY p.k
    )
    SELECT user_id, n_exact, n_cms,
           CAST(n_cms - n_exact AS BIGINT) AS overshoot
    FROM est ORDER BY n_exact DESC, user_id ASC
    """,
)
def sketch_countmin_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k")
    )
    cells = None
    for j in range(_CMS_D):
        part = ev.selectExpr(
            f"{j} AS row_idx", f"{_cms_col_sql(j, 'k')} AS col"
        )
        cells = part if cells is None else cells.unionByName(part)
    grid = cells.groupBy("row_idx", "col").agg(
        F.count("*").cast("long").alias("cnt")
    )
    exact = (
        ev.groupBy("k")
        .agg(F.count("*").cast("long").alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("k"))
        .limit(20)
    )
    probes = None
    for j in range(_CMS_D):
        part = exact.selectExpr(
            "k", "n_exact", f"{j} AS row_idx", f"{_cms_col_sql(j, 'k')} AS col"
        )
        probes = part if probes is None else probes.unionByName(part)
    est = (
        probes.join(grid, ["row_idx", "col"])
        .groupBy("k")
        .agg(
            F.min("n_exact").alias("n_exact"),
            F.min("cnt").cast("long").alias("n_cms"),
        )
        .select(
            F.col("k").alias("user_id"),
            "n_exact",
            "n_cms",
            (F.col("n_cms") - F.col("n_exact")).cast("long").alias("overshoot"),
        )
    )
    return est.orderBy(F.desc("n_exact"), F.asc("user_id"))


# --------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k) distinct sketch — round 9
# --------------------------------------------------------------------------
# Unlike HLL (approx_count_distinct_users, whose engine-private
# register layout forces a tolerance GATE), a KMV sketch is fully
# deterministic given the hash: both engines compute the same k
# smallest hash values, the same k-th order statistic, and therefore
# the SAME estimate — so the estimate itself hash-matches the oracle,
# the strongest correctness statement an approximate-distinct operator
# can make. Estimator (Bar-Yossef et al. 2002): with U_(k) the k-th
# smallest of n distinct uniform hashes on [0, P), E[U_(k)] ~ k*P/(n+1),
# so n_hat = (k-1) * P div U_(k) (the unbiased variant).
_KMV_K = 128
_KMV_A = 2_654_435_761  # Knuth multiplicative family — see _bloom_pos_sql
_KMV_B = 1_779_033_703
_KMV_SQL_H = f"(({_KMV_A} * o_custkey + {_KMV_B}) % {_BLOOM_PRIME})"


@query(
    "sketch_kmv_distinct",
    tier="T3",
    doc="KMV (bottom-k) distinct-count sketch over ordering customers, "
    f"k = {_KMV_K}: per order priority AND a merged _ALL_ row built "
    "from the UNION of the per-group sketches — the global bottom-k "
    "is provably contained in the union of group bottom-ks, so the "
    "merged row demonstrates the mergeability that makes KMV the "
    "distributed distinct-count structure (map-side bottom-k per "
    "partition, combine by keep-k-smallest; at 100 TB the sketch is "
    "k int64s per group riding a broadcast, vs a data-sized exact "
    "distinct shuffle). Bottom-k rides row_number + filter, which "
    "Spark executes as WindowGroupLimit (partial per-partition top-k "
    "BEFORE the exchange — the rank_topn_per_group plan shape). "
    "Estimate = (k-1)*P div h_(k), exact integer division both "
    "engines reproduce bit-for-bit; err_ppm quantifies the ~1/sqrt(k) "
    "(~9%) expected relative error against the exact count computed "
    "side-by-side.",
    oracle=f"""
    WITH d AS (
      SELECT DISTINCT o_orderpriority AS grp, o_custkey,
             {_KMV_SQL_H} AS h
      FROM orders
    ),
    exact AS (
      SELECT grp, CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact
      FROM d GROUP BY grp
      UNION ALL
      SELECT '_ALL_', CAST(count(DISTINCT o_custkey) AS BIGINT) FROM d
    ),
    hashes AS (
      SELECT grp, h FROM (
        SELECT grp, h,
               row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
        FROM (SELECT DISTINCT grp, h FROM d)
      ) WHERE rn <= {_KMV_K}
    ),
    merged AS (
      SELECT '_ALL_' AS grp, h FROM (
        SELECT h, row_number() OVER (ORDER BY h) AS rn
        FROM (SELECT DISTINCT h FROM hashes)
      ) WHERE rn <= {_KMV_K}
    ),
    sk AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n_sketch,
             CAST(max(h) AS BIGINT) AS kth_hash
      FROM (SELECT * FROM hashes UNION ALL SELECT * FROM merged)
      GROUP BY grp
    )
    SELECT sk.grp,
           exact.n_exact,
           sk.n_sketch,
           sk.kth_hash,
           CAST(CASE WHEN sk.n_sketch < {_KMV_K} THEN sk.n_sketch
                ELSE ({_KMV_K - 1} * {_BLOOM_PRIME}) // sk.kth_hash
                END AS BIGINT) AS kmv_est,
           CAST(abs(CASE WHEN sk.n_sketch < {_KMV_K} THEN sk.n_sketch
                    ELSE ({_KMV_K - 1} * {_BLOOM_PRIME}) // sk.kth_hash
                    END - exact.n_exact) * 1000000
                // exact.n_exact AS BIGINT) AS err_ppm
    FROM sk JOIN exact ON exact.grp = sk.grp
    ORDER BY sk.grp
    """,
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    d = o.selectExpr(
        "o_orderpriority AS grp", "o_custkey", f"{_KMV_SQL_H} AS h"
    ).distinct()
    exact = d.groupBy("grp").agg(
        F.countDistinct("o_custkey").cast("long").alias("n_exact")
    )
    exact_all = d.agg(
        F.countDistinct("o_custkey").cast("long").alias("n_exact")
    ).select(F.lit("_ALL_").alias("grp"), "n_exact")
    exact = exact.unionByName(exact_all)

    w = Window.partitionBy("grp").orderBy("h")
    hashes = (
        d.select("grp", "h")
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_K)
        .drop("rn")
        # feeds BOTH the per-group sketch agg and the _ALL_ merge
        .persist()
    )
    merged = (
        hashes.select("h")
        .distinct()
        .withColumn("rn", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("rn") <= _KMV_K)
        .select(F.lit("_ALL_").alias("grp"), "h")
    )
    sk = (
        hashes.unionByName(merged)
        .groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n_sketch"),
            F.max("h").cast("long").alias("kth_hash"),
        )
    )
    est = F.when(
        F.col("n_sketch") < _KMV_K, F.col("n_sketch")
    ).otherwise(
        F.expr(f"{_KMV_K - 1} * {_BLOOM_PRIME} div kth_hash")
    ).cast("long")
    return (
        sk.join(exact, "grp")
        .withColumn("kmv_est", est)
        .withColumn(
            "err_ppm",
            F.expr("abs(kmv_est - n_exact) * 1000000 div n_exact")
            .cast("long"),
        )
        .select(
            "grp", "n_exact", "n_sketch", "kth_hash", "kmv_est", "err_ppm"
        )
        .orderBy("grp")
    )
