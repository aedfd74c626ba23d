"""Iterative graph analytics over warehouse-derived edge lists.

Complements the dedup connected-components operator (operators/
dedup.py:connected_components — min-label propagation) with a
damped-propagation shape: PageRank with FIXED unrolled iterations and
EXACT integer arithmetic, so an independent SQL engine replays it
bit-for-bit (catalog doctrine, plans/catalog.py).

Why exact integers: float PageRank is partial-agg-order dependent.
Here ranks live on a 10^12 grid; contributions are integer floor
divisions (rank div degree, then ·85 div 100) — both engines define
integer division identically on non-negative operands, and every sum
is an exact int64 (≤ 10^12 · |V|, far under 2^63).

Scale design (100 TB of facts): the EDGE LIST is built once with the
fact-fact join (one shuffle on the join key) + distinct; iterations
never touch the facts again — each round is one equi-join of the rank
table (|V| rows) against edges plus a map-side-combinable sum per dst.
Co-partition edges and ranks on the node key and the per-round
exchange disappears (the same bucketing argument as SCALE.md §2);
rounds are compile-time unrolled exactly like the k-means loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .catalog import query

#: Rank grid: 10^12 units of total mass 1.0 (per-node init 10^12/N).
PR_SCALE = 1_000_000_000_000
PR_ITERS = 3

#: JEP-223-style size suffixes Spark accepts for byte configs.
_SIZE_UNITS = {
    "b": 1,
    "k": 1 << 10,
    "kb": 1 << 10,
    "m": 1 << 20,
    "mb": 1 << 20,
    "g": 1 << 30,
    "gb": 1 << 30,
    "t": 1 << 40,
    "tb": 1 << 40,
    "p": 1 << 50,
    "pb": 1 << 50,
}


def _broadcast_threshold_bytes(spark: SparkSession) -> int:
    """The session's spark.sql.autoBroadcastJoinThreshold in bytes
    (<= 0 when broadcast is disabled). Spark serves the value back in
    whatever form it was set — bare bytes, "10MB", "10m", "-1" — so
    parse all of them rather than assume the canonical default."""
    raw = str(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    ).strip().lower()
    import re as _re

    m = _re.fullmatch(r"(-?\d+)\s*([a-z]*)", raw)
    if not m or (m.group(2) and m.group(2) not in _SIZE_UNITS):
        # Fail loudly (ADVICE r7): silently substituting a stock
        # default here would shrink/grow the un-hinted broadcast
        # window ~6x relative to the repo session's 64 MB pin — a
        # plan-shape change with no visible cause.
        raise ValueError(
            "unparseable spark.sql.autoBroadcastJoinThreshold: "
            f"{raw!r}"
        )
    return int(m.group(1)) * _SIZE_UNITS.get(m.group(2) or "b", 1)


def _pagerank_oracle() -> str:
    rounds = []
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        rounds.append(
            f"""
    r{i} AS (
      SELECT d.node,
             (15 * ({PR_SCALE} // (SELECT n FROM nv))) // 100
             + (85 * coalesce(s.acc, 0)) // 100 AS rank_q
      FROM deg d
      LEFT JOIN (
        SELECT e.dst AS node, sum({prev}.rank_q // dg.degree) AS acc
        FROM e
        JOIN {prev} ON {prev}.node = e.src
        JOIN deg dg ON dg.node = e.src
        GROUP BY e.dst
      ) s ON s.node = d.node
    )"""
        )
        prev = f"r{i}"
    rounds_sql = ",".join(rounds)
    return f"""
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    e AS (
      SELECT ck * 2 AS src, sk * 2 + 1 AS dst FROM pairs
      UNION ALL
      SELECT sk * 2 + 1 AS src, ck * 2 AS dst FROM pairs
    ),
    deg AS (
      SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
      FROM e GROUP BY src
    ),
    nv AS (SELECT count(*) AS n FROM deg),
    r0 AS (
      SELECT node, {PR_SCALE} // (SELECT n FROM nv) AS rank_q FROM deg
    ),{rounds_sql}
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS node_type,
           node // 2 AS node_key,
           CAST(rank_q AS BIGINT) AS rank_q
    FROM {prev}
    ORDER BY rank_q DESC, node_type, node_key
    LIMIT 20
    """


@query(
    "graph_pagerank",
    tier="T3",
    doc=f"PageRank ({PR_ITERS} unrolled rounds, damping 0.85) over the "
    "customer↔supplier interaction graph (distinct trade pairs from "
    "lineitem⋈orders, both directions so no dangling nodes). Exact "
    "integer ranks on a 10^12 grid — floor-div contributions, int64 "
    "sums — replayed bit-for-bit by the SQL oracle. The facts are "
    "touched ONCE to build the edge list; each round is an equi-join "
    "of the |V|-row rank table with edges + one map-side-combined "
    "sum. Top-20 by final rank.",
    oracle=_pagerank_oracle(),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # No forced broadcast: orders projects to two int columns (~2 MB at
    # sf0.1) and AQE + the 64 MB autoBroadcastJoinThreshold already
    # broadcast it at bench scale; at 100 TB orders is a fact table and
    # a hard hint would be a driver OOM — the plan then degrades to the
    # bucketed fact-fact join of SCALE.md §2 with no code change.
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk")
        )
        .distinct()
    )
    # Symmetrize with a ROW-LOCAL 2-way explode, not a union of two
    # projections: `pairs` is unpersisted (it exists only to build e)
    # and a union evaluates the whole join+distinct subtree once per
    # branch while e's cache materializes (guide §2.4 — the same
    # diamond the CC operator had; explode touches the fact join
    # exactly once).
    e = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    (F.col("ck") * 2).alias("src"),
                    (F.col("sk") * 2 + 1).alias("dst"),
                ),
                F.struct(
                    (F.col("sk") * 2 + 1).alias("src"),
                    (F.col("ck") * 2).alias("dst"),
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # Iterations re-read edges/degrees 3×; cache the (small) edge and
    # degree tables — the facts are never rescanned after this point.
    e = e.persist()
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("degree")
    ).persist()
    # The degree-annotated edge table feeds EVERY round — persist the
    # JOINED form, or each round silently re-runs the |E|⋈|V| join
    # from the two caches (measured ~1.5 s of the 4.5 s total).
    # |V| is control-plane (one count over the cached degree table) and
    # re-enters the plan as a literal — same budget class as the
    # k-means centroids; avoids threading a 1-row frame through every
    # round as a nested-loop broadcast.
    n = deg.count()
    init_q = PR_SCALE // n
    base_q = (15 * init_q) // 100

    # Co-partitioned iteration, NO broadcast hints (VERDICT r3 #2): at
    # 100 TB the |V|-row rank table is the customer∪supplier universe
    # (hundreds of millions of rows) and a per-round F.broadcast is a
    # driver OOM. It is ALSO a loss at bench scale — plain joins
    # drive-measured at 3.608 s (BENCH_r04, sf0.1 min-of-3) vs ~5.6 s
    # for the broadcast-ranks variant when it was A/B'd in round 3,
    # because every round's broadcast collects the freshly-joined rank
    # subtree through the driver, serializing the rounds. With plain
    # joins the cached co-partitioning carries the plan: `deg` is
    # frozen hash-partitioned on node by its groupBy, `ed` on src by
    # the e⋈deg join, so the only inherent per-round exchange is the
    # groupBy("dst") that moves rank mass from src-space to dst-space.
    # Catalyst remains free to broadcast from STATS (at sf0.1 it
    # builds a hash relation from the ~28 MB cached ed — under the
    # 64 MB threshold; at 100 TB that gate fails and the same code
    # runs shuffled joins). Pinned by tests/test_plans.py::
    # test_pagerank_no_forced_rank_broadcast (zero ResolvedHint +
    # shuffled-join shape when size-based broadcast is off).
    ranks = deg.select("node", F.lit(init_q).alias("rank_q"))
    ed = e.join(deg, e.src == deg.node).select("src", "dst", "degree").persist()
    for _ in range(PR_ITERS):
        acc = (
            ed.join(ranks, ed.src == ranks.node)
            .select("dst", F.expr("rank_q div degree").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("acc"))
        )
        # No per-round backfill join: the edge list is SYMMETRIC (both
        # directions unioned above), so every node in deg has in-degree
        # >= 1 and acc already carries the full node set — the oracle's
        # LEFT JOIN deg never fires its NULL arm. Dropping the join
        # removes one |V|-join per round (3 total) from the plan; a
        # directed-graph variant would need it back (dangling mass).
        ranks = acc.select(
            F.col("dst").alias("node"),
            (F.lit(base_q) + F.expr("(85 * acc) div 100")).alias("rank_q"),
        )
    return (
        ranks.select(
            F.when(F.col("node") % 2 == 0, "customer")
            .otherwise("supplier")
            .alias("node_type"),
            F.expr("node div 2").alias("node_key"),
            F.col("rank_q").cast("long").alias("rank_q"),
        )
        .orderBy(F.desc("rank_q"), "node_type", "node_key")
        .limit(20)
    )


# --------------------------------------------------------------------------
# T3 — triangle counting (degree-ordered orientation)
# --------------------------------------------------------------------------
_TRI_ORACLE = """
    WITH pairs AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs
      ) GROUP BY node
    ),
    o AS (
      SELECT CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.u ELSE p.v END AS src,
             CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.v ELSE p.u END AS dst,
             CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN dv.d ELSE du.d END AS dd
      FROM pairs p
      JOIN deg du ON du.node = p.u
      JOIN deg dv ON dv.node = p.v
    ),
    w AS (
      SELECT o1.dst AS v, o2.dst AS w
      FROM o o1 JOIN o o2 ON o1.src = o2.src
      WHERE (o1.dd, o1.dst) < (o2.dd, o2.dst)
    ),
    t AS (
      SELECT count(*) AS n_triangles
      FROM w JOIN o ON o.src = w.v AND o.dst = w.w
    )
    SELECT CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_edges,
           CAST((SELECT count(*) FROM w) AS BIGINT) AS n_wedges,
           CAST(t.n_triangles AS BIGINT) AS n_triangles
    FROM t
    """


@query(
    "graph_triangle_count",
    tier="T3",
    doc="Exact triangle count over the part co-purchase graph (parts "
    "sharing an order; edges deduped, a<b) via DEGREE-ORDERED "
    "orientation — the canonical distributed algorithm: orient every "
    "edge from the (degree, id)-smaller endpoint to the larger, "
    "enumerate wedges only among each node's ORIENTED out-neighbors, "
    "then semi-check the closing edge. Orientation bounds every "
    "out-degree by O(sqrt(2m)), so wedge fan-out is O(m^1.5) worst "
    "case instead of the O(Σ deg²) a naive wedge join pays on skewed "
    "degree distributions — at 100 TB the hub node that breaks the "
    "naive plan is exactly the one orientation defuses. Edge build is "
    "one fact groupBy + row-local ordered-pair explosion (bounded "
    "basket size), then edge distinct, wedge join key, and the "
    "closing join are the remaining shuffles; counts are exact "
    "BIGINTs.",
    oracle=_TRI_ORACLE,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # Edge build: ONE groupBy shuffle of the fact (600k rows at sf0.1
    # → per-order part sets), then row-local explosion — replaces the
    # r4 self-join, whose SMJ shuffled the fact TWICE and sorted both
    # sides (measured 4.7 → 4.45 s at sf0.1). Row-local is safe
    # because basket size is bounded (TPC-H ≤ 7 items/order; any
    # real co-purchase feed is similarly bounded) — a pathological
    # million-item group would need the self-join's streamed form
    # instead of an in-row array.
    grp = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    pairs = (
        grp.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), "
                    "y -> struct(x as u, y as v))))"
                )
            ).alias("p")
        )
        .select("p.u", "p.v")
        .distinct()
        .persist()
    )
    # deg feeds THREE consumers (du, dv, max_node) — persist so the
    # orientation join never re-aggregates the edge list (the r4 plan
    # recomputed it; ReusedExchange only caught the du/dv twins).
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select("v"))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
        .persist()
    )
    du, dv = deg.alias("du"), deg.alias("dv")
    # (deg, id) total order decides direction; ties on degree break by id.
    u_first = (F.col("du.d") < F.col("dv.d")) | (
        (F.col("du.d") == F.col("dv.d")) & (F.col("u") < F.col("v"))
    )
    o = (
        pairs.join(du, F.col("du.node") == F.col("u"))
        .join(dv, F.col("dv.node") == F.col("v"))
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(u_first, F.col("dv.d")).otherwise(F.col("du.d")).alias("dd"),
        )
        .persist()
    )
    # The wedge stream is the O(m^1.5) cost center (~35M rows at
    # sf0.1) — touch it exactly ONCE, as the probe side of the closing
    # INNER join, counted without materializing wide rows. Three
    # plan-level choices keep it cheap:
    #  * n_wedges never scans the wedge stream: it is Σ outdeg·(outdeg
    #    − 1)/2 over the ORIENTED degree table (|V| rows, closed form).
    #  * the wedge (v, w) pair packs into ONE long (shiftleft 32) so
    #    the closing join hashes/compares a single word, not a struct —
    #    GUARDED, not assumed: the max node key is a control-plane
    #    scalar off the cached degree table, and keys >= 2^31 fall
    #    back to the two-column join (same result, one fewer codegen
    #    trick) instead of silently colliding packed keys.
    #  * shuffle_hash hints (NOT broadcast — edges are fact-derived)
    #    keep the 35M-row stream from being SORTED: sort-merge would
    #    sort the wedges; a shuffled hash join builds on the 1.2M-edge
    #    side and streams the wedges through probe-side counting.
    # ONE control-plane action serves BOTH gates below (guide §1/§2:
    # sequential driver actions are scheduling barriers — the former
    # separate max_node agg + pairs.count() cost two jobs): over the
    # persisted DEGREE table, sum(d) = 2·|pairs| (each deduped pair
    # contributes one endpoint row per side) gives the edge count and
    # max(node) the packing gate. Aggregating deg — not pairs — also
    # keeps the original materialization order: this action pins BOTH
    # the pairs and deg caches before the wedge mega-job reads them
    # (aggregating pairs alone left deg to materialize inside that
    # job, where racing consumers recompute it — measured ~1.5 s
    # slower at sf0.1).
    _stats = deg.agg(
        F.sum("d").alias("sum_d"), F.max("node").alias("mx")
    ).collect()[0]
    n_edge_rows = (_stats["sum_d"] or 0) // 2
    max_node = _stats["mx"]
    packable = max_node is not None and 0 <= max_node < (1 << 31)
    o1, o2 = o.alias("o1"), o.alias("o2")
    wedges = o1.join(
        o2.hint("shuffle_hash"), F.col("o1.src") == F.col("o2.src")
    ).filter(
        (F.col("o1.dd") < F.col("o2.dd"))
        | (
            (F.col("o1.dd") == F.col("o2.dd"))
            & (F.col("o1.dst") < F.col("o2.dst"))
        )
    )
    # Closing join strategy is a CONTROL-PLANE decision off the cached
    # edge count, not a hope: while the packed edge side fits the
    # session's broadcast gate the un-hinted join lets AQE broadcast it
    # from runtime stats (~15 MB at sf0.1, measured 1.5 s faster than a
    # hinted shuffle-hash join because the 35M-row wedge stream then
    # never shuffles). ABOVE the gate the un-hinted planner falls back
    # to SORT-MERGE — which sorts the O(m^1.5)-row wedge stream
    # (measured: 22x wall at 10x data on the sf1 slice, 101 s, almost
    # all of it the wedge sort). The shuffle_hash hint restores the
    # right asymptotics: build on the edge side, STREAM the wedges
    # through probe-side counting (measured 101 -> ~9 s at sf1; see
    # SCALE.md §31). The row cutover is DERIVED from the session's
    # spark.sql.autoBroadcastJoinThreshold (r6 ADVICE #4 — a fixed 3M
    # rows silently encoded the 64 MB default and broke on sessions
    # with a smaller gate): ~22 B/edge is the measured in-memory
    # relation footprint of the packed (one-long) edge row, and the
    # 0.7 margin keeps estimate error from landing exactly on the
    # cliff. Threshold -1 (broadcast disabled) always hints.
    bcast_gate = _broadcast_threshold_bytes(spark)
    edge_cutover = int(bcast_gate * 0.7) // 22 if bcast_gate > 0 else 0
    edge_hint = (
        (lambda d: d)
        if n_edge_rows <= edge_cutover
        else (lambda d: d.hint("shuffle_hash"))
    )
    if packable:
        w = wedges.select(
            (F.shiftleft(F.col("o1.dst"), 32) + F.col("o2.dst")).alias("wk")
        )
        oc = o.select(
            (F.shiftleft(F.col("src"), 32) + F.col("dst")).alias("wk")
        )
        tri = w.join(edge_hint(oc), "wk").agg(
            F.count("*").alias("n_triangles")
        )
    else:
        w = wedges.select(
            F.col("o1.dst").alias("cv"), F.col("o2.dst").alias("cw")
        )
        oc = o.select(F.col("src").alias("cv"), F.col("dst").alias("cw"))
        tri = w.join(edge_hint(oc), ["cv", "cw"]).agg(
            F.count("*").alias("n_triangles")
        )
    odeg = o.groupBy("src").agg(F.count("*").alias("od"))
    n_wedges = odeg.agg(
        F.expr("sum((od * (od - 1)) div 2)").cast("long").alias("n_wedges")
    )
    n_edges = pairs.agg(F.count("*").alias("n_edges"))
    return (
        n_edges.crossJoin(n_wedges)
        .crossJoin(tri)
        .select(
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_wedges").cast("long").alias("n_wedges"),
            F.col("n_triangles").cast("long").alias("n_triangles"),
        )
    )


# --------------------------------------------------------------------------
# T2 — recursive CTE: hierarchical rollup (BOM / org-chart shape)
# --------------------------------------------------------------------------
@query(
    "graph_hierarchy_rollup",
    tier="T2",
    doc="Recursive-CTE hierarchical rollup (Spark 4 WITH RECURSIVE): "
    "part revenue aggregated up a 10-ary ancestor tree (parent = "
    "partkey div 10 — an arithmetic hierarchy, so both engines agree "
    "on the edges), reporting the top 2 tree levels (node < 100). The "
    "BOM-explosion / org-chart rollup every warehouse eventually "
    "needs, here on the recursive-SQL surface: each iteration is one "
    "equi-projection of the previous frontier (upward out-degree is "
    "exactly 1, so the recursion is LINEAR — rows x depth <= 7, no "
    "fan-out blowup; contrast BFS over a co-purchase graph, where the "
    "frontier needs per-level dedup and the iterative-join form "
    "(graph_pagerank's shape) is the scale path). Revenue in exact "
    "cents; contribution counts exact BIGINTs. The recursion input is "
    "AGGREGATED FIRST (one map-side-combined agg to |parts| rows) — "
    "recursing over raw lineitems would push |facts|·depth rows "
    "through the loop and trip Spark's cteRecursionRowLimit (1e6) at "
    "sf0.1 already; aggregate-before-recurse bounds loop traffic by "
    "|parts|·7 at ANY fact scale.",
    oracle="""
    WITH RECURSIVE base AS (
      SELECT l_partkey AS node,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM lineitem GROUP BY l_partkey
    ),
    up AS (
      SELECT node, rev_c, 0 AS depth FROM base
      UNION ALL
      SELECT node // 10, rev_c, depth + 1 FROM up WHERE node > 0
    )
    SELECT node, CAST(count(*) AS BIGINT) AS n_contrib,
           CAST(max(depth) AS BIGINT) AS max_depth,
           CAST(sum(rev_c) AS BIGINT) AS subtree_rev_c
    FROM up WHERE node < 100
    GROUP BY node ORDER BY node
    """,
)
def graph_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        WITH RECURSIVE base AS (
          SELECT l_partkey AS node,
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                      AS BIGINT) AS rev_c
          FROM lineitem GROUP BY l_partkey
        ),
        up AS (
          SELECT node, rev_c, 0 AS depth FROM base
          UNION ALL
          SELECT node div 10, rev_c, depth + 1 FROM up WHERE node > 0
        )
        SELECT node, CAST(count(*) AS BIGINT) AS n_contrib,
               CAST(max(depth) AS BIGINT) AS max_depth,
               CAST(sum(rev_c) AS BIGINT) AS subtree_rev_c
        FROM up WHERE node < 100
        GROUP BY node ORDER BY node
        """
    )


# --------------------------------------------------------------------------
# T3 — k-core peeling (bounded unrolled rounds)
# --------------------------------------------------------------------------
_KCORE_K = 12
_KCORE_ROUNDS = 3


def _kcore_oracle() -> str:
    ctes = [
        """e0 AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )"""
    ]
    rows = []
    for i in range(1, _KCORE_ROUNDS + 1):
        p = i - 1
        ctes.append(
            f"""d{i} AS (
      SELECT node, count(*) AS d FROM (
        SELECT u AS node FROM e{p} UNION ALL SELECT v FROM e{p}
      ) GROUP BY node
    ),
    s{i} AS (SELECT node FROM d{i} WHERE d >= {_KCORE_K}),
    e{i} AS (
      SELECT u, v FROM e{p}
      WHERE u IN (SELECT node FROM s{i})
        AND v IN (SELECT node FROM s{i})
    )"""
        )
        rows.append(
            f"SELECT {i} AS round, (SELECT count(*) FROM s{i}) AS n_nodes,"
            f" (SELECT count(*) FROM e{i}) AS n_edges"
        )
    return (
        "WITH " + ",\n    ".join(ctes) + "\n    "
        + "\n    UNION ALL ".join(rows) + "\n    ORDER BY round"
    )


@query(
    "graph_kcore_peeling",
    tier="T3",
    doc=f"k-core decomposition ({_KCORE_ROUNDS} unrolled peeling "
    f"rounds, k={_KCORE_K}) over the part co-purchase graph: each "
    "round drops nodes with degree < k and the edges touching them; "
    "surviving nodes/edges per round trace the peeling trajectory "
    "(converged when two rounds agree). The dense-subgraph mining "
    "primitive behind community/core detection — and the graph twin "
    "of the dedup CC operator's round structure: per round ONE "
    "map-side-combined degree agg + two semi-joins, edges touched "
    "once per round, no broadcast of anything fact-sized (survivor "
    "sets are |V|-bounded and the joins key on the node id). Fixed "
    "unrolled rounds keep the SQL oracle replayable (pagerank/"
    "k-means doctrine); production iterates to fixpoint with the "
    "observe()-based convergence loop of operators/dedup.py.",
    oracle=_kcore_oracle(),
)
def graph_kcore_peeling(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # Edge build: fact groupBy + row-local ordered-pair explosion
    # (bounded basket size — the triangle-count edge-build shape; the
    # former self-join shuffled the fact twice and sorted both sides).
    e = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), "
                    "y -> struct(x as u, y as v))))"
                )
            ).alias("p")
        )
        .select("p.u", "p.v")
        .distinct()
        .persist()
    )
    # Each round MATERIALIZES (persist + one action) before the next:
    # eager materialization stops the final action from re-deriving
    # three rounds of lazily-chained caches (>2x blowup when A/B'd;
    # BENCH_r05 drive-measured the two-actions-per-round form at
    # 4.913 s sf0.1). ONE action per round (VERDICT r5 #3): the
    # degree table is persisted and a single aggregate over it yields
    # BOTH control-plane numbers — the survivor count of THIS round
    # and, since sum(d) = 2|E|, the edge count of the PREVIOUS round
    # (whose edge list the degrees were computed over). Only the
    # final round's edge count needs its own count(). The fixpoint
    # short-circuit keys on n_nodes alone: survivor sets shrink
    # monotonically, so an unchanged COUNT means an unchanged SET,
    # hence identical edges and identical later rounds.
    def degree(edges: DataFrame) -> DataFrame:
        return (
            edges.select(F.col("u").alias("node"))
            .unionAll(edges.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("d"))
            .persist()
        )

    n_nodes_hist: list[int] = []
    n_edges_hist: list[int] = []  # n_edges_hist[i] = edges AFTER round i+1
    converged_at = None
    deg = degree(e)
    for rnd in range(1, _KCORE_ROUNDS + 1):
        s = deg.agg(
            F.coalesce(F.sum("d"), F.lit(0)).alias("sum_d"),
            F.count(F.when(F.col("d") >= _KCORE_K, 1)).alias("n_surv"),
        ).collect()[0]
        if rnd > 1:
            n_edges_hist.append(int(s["sum_d"]) // 2)
        n_nodes_hist.append(int(s["n_surv"]))
        if rnd > 1 and n_nodes_hist[-1] == n_nodes_hist[-2]:
            converged_at = rnd
            break
        surv = deg.filter(F.col("d") >= _KCORE_K).select("node")
        e = (
            e.join(surv.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(surv.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
            .persist()
        )
        if rnd == _KCORE_ROUNDS:
            break
        deg = degree(e)
    if converged_at is not None:
        # Round converged_at changed nothing: its edge count equals
        # the previous round's, and all later rounds are identical.
        n_edges_hist.append(n_edges_hist[-1])
        while len(n_nodes_hist) < _KCORE_ROUNDS:
            n_nodes_hist.append(n_nodes_hist[-1])
            n_edges_hist.append(n_edges_hist[-1])
    else:
        n_edges_hist.append(e.count())
    rows = [
        (rnd, n_nodes_hist[rnd - 1], n_edges_hist[rnd - 1])
        for rnd in range(1, _KCORE_ROUNDS + 1)
    ]
    return spark.createDataFrame(
        rows, "round long, n_nodes long, n_edges long"
    ).orderBy("round")


# --------------------------------------------------------------------------
# T3 — link prediction (Resource-Allocation index over common neighbors)
# --------------------------------------------------------------------------
def _repeat_edges_sql() -> str:
    """Repeat co-purchase edges: part pairs sharing >= 2 DISTINCT orders.

    This graph stays SPARSE as the fact grows (measured: 2.4k / 3.6k /
    3.9k edges at sf0.001/0.01/0.1 while the plain co-purchase graph
    grows 9k -> 1.2M) — repeat co-occurrence is a signal threshold, so
    wedge enumeration over it is cheap at every scale.
    """
    return """
      SELECT u, v FROM (
        SELECT DISTINCT a.l_orderkey AS ok, a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      ) GROUP BY u, v HAVING count(*) >= 2
    """


def _repeat_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _repeat_edges_sql: ONE fact groupBy to per-order
    part sets + row-local ordered-pair explosion (bounded basket size —
    the triangle-count edge-build shape; a fact self-join would shuffle
    the fact twice and sort both sides). Per-order pairs are distinct
    by construction (collect_set + i<j), so the pair count IS the
    distinct-order count."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), "
                    "y -> struct(x as u, y as v))))"
                )
            ).alias("p")
        )
        .select("p.u", "p.v")
        .groupBy("u", "v")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .drop("c")
    )


@query(
    "graph_link_prediction_ra",
    tier="T3",
    doc="Link prediction on the repeat co-purchase graph (part pairs "
    "sharing >= 2 distinct orders — a sparse signal graph at every "
    "scale) via the Resource-Allocation index (Zhou et al. 2009): "
    "score(x,z) = sum over common neighbors v of 1/deg(v), held as "
    "EXACT e12 fixed-point integers (1e12 div deg) so the sum is "
    "order-independent — chosen over Adamic-Adar's 1/ln(deg) "
    "precisely because it needs no transcendental call whose last "
    "ulp could differ across engines. Plan: symmetrize edges, one "
    "wedge self-join on the center (bounded by the signal graph's "
    "low degree), anti-join out already-linked pairs, top-20 by "
    "(score, pair). The item-item 'customers also bought' candidate "
    "generator in its scale-correct form.",
    oracle=f"""
    WITH e2 AS ({_repeat_edges_sql()}),
    e AS (SELECT u, v FROM e2 UNION ALL SELECT v AS u, u AS v FROM e2),
    deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1),
    w AS (
      SELECT a.v AS x, b.v AS z, a.u AS c
      FROM e a JOIN e b ON a.u = b.u AND a.v < b.v
    ),
    scored AS (
      SELECT w.x, w.z,
             CAST(count(*) AS BIGINT) AS n_common,
             CAST(sum(1000000000000 // deg.d) AS BIGINT) AS ra_e12
      FROM w JOIN deg ON deg.node = w.c
      GROUP BY w.x, w.z
    )
    SELECT s.x AS u, s.z AS v, s.n_common, s.ra_e12
    FROM scored s
    WHERE NOT EXISTS (SELECT 1 FROM e2 WHERE e2.u = s.x AND e2.v = s.z)
    ORDER BY s.ra_e12 DESC, u, v
    LIMIT 20
    """,
)
def graph_link_prediction_ra(spark: SparkSession, sf_dir: str) -> DataFrame:
    e2 = _repeat_edges(spark, sf_dir).persist()
    e = e2.unionAll(e2.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = e.groupBy(F.col("u").alias("node")).agg(
        F.count("*").cast("long").alias("d")
    )
    wa, wb = e.alias("wa"), e.alias("wb")
    w = wa.join(
        wb,
        (F.col("wa.u") == F.col("wb.u")) & (F.col("wa.v") < F.col("wb.v")),
    ).select(
        F.col("wa.v").alias("x"),
        F.col("wb.v").alias("z"),
        F.col("wa.u").alias("c"),
    )
    scored = (
        w.join(deg, F.col("node") == F.col("c"))
        .groupBy("x", "z")
        .agg(
            F.count("*").cast("long").alias("n_common"),
            F.sum(F.expr("1000000000000 div d")).cast("long").alias("ra_e12"),
        )
    )
    out = (
        scored.join(
            e2,
            (F.col("x") == F.col("u")) & (F.col("z") == F.col("v")),
            "left_anti",
        )
        .select(
            F.col("x").alias("u"),
            F.col("z").alias("v"),
            "n_common",
            "ra_e12",
        )
        .orderBy(F.desc("ra_e12"), "u", "v")
        .limit(20)
    )
    return out


# --------------------------------------------------------------------------
# T3 — level-synchronous BFS (bounded unrolled rounds)
# --------------------------------------------------------------------------
_BFS_SEED_MAX = 50
_BFS_HOPS = 3


@query(
    "graph_bfs_hops",
    tier="T3",
    doc="Multi-source BFS hop distance over the repeat co-purchase "
    "graph: seeds = graph nodes with id < 50, levels 0..3 unrolled as "
    "level-synchronous frontier expansion — per level ONE equi-join "
    "(frontier x edges) plus ONE anti-join against the visited set, "
    "the textbook distributed BFS (no per-path enumeration: a "
    "recursive all-paths CTE on a dense graph explodes "
    "combinatorially; the frontier form dedups per level, so work is "
    "bounded by |E| per round at any scale). Bounded depth keeps the "
    "loop unrolled and the plan static; min-hop semantics fall out of "
    "the visited-set anti-join, no min() needed.",
    oracle=f"""
    WITH e2 AS ({_repeat_edges_sql()}),
    e AS (SELECT u, v FROM e2 UNION ALL SELECT v AS u, u AS v FROM e2),
    d0 AS (SELECT DISTINCT u AS node FROM e WHERE u < {_BFS_SEED_MAX}),
    d1 AS (
      SELECT DISTINCT e.v AS node FROM e JOIN d0 ON e.u = d0.node
      WHERE e.v NOT IN (SELECT node FROM d0)
    ),
    d2 AS (
      SELECT DISTINCT e.v AS node FROM e JOIN d1 ON e.u = d1.node
      WHERE e.v NOT IN (SELECT node FROM d0)
        AND e.v NOT IN (SELECT node FROM d1)
    ),
    d3 AS (
      SELECT DISTINCT e.v AS node FROM e JOIN d2 ON e.u = d2.node
      WHERE e.v NOT IN (SELECT node FROM d0)
        AND e.v NOT IN (SELECT node FROM d1)
        AND e.v NOT IN (SELECT node FROM d2)
    )
    SELECT node, hops FROM (
      SELECT node, CAST(0 AS BIGINT) AS hops FROM d0
      UNION ALL SELECT node, 1 FROM d1
      UNION ALL SELECT node, 2 FROM d2
      UNION ALL SELECT node, 3 FROM d3
    ) ORDER BY hops, node
    """,
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    e2 = _repeat_edges(spark, sf_dir)
    # Row-local explode symmetrization: e2 is unpersisted and a union
    # of two projections would run the whole edge-build subtree twice
    # while e's cache materializes (guide §2.4; pagerank/CC diamond).
    e = e2.select(
        F.explode(
            F.array(
                F.struct(F.col("u"), F.col("v")),
                F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
            )
        ).alias("e")
    ).select("e.u", "e.v").persist()
    # Each frontier is PERSISTED: level h+1's plan references level h
    # AND the visited union of 0..h — without materialization the
    # lineage replays every earlier round per level (a >4x blowup
    # when A/B'd during development; the materialized form drive-
    # measured at 3.065 s, BENCH_r05 sf0.1 min-of-3). Materialized
    # frontiers are the textbook level-synchronous form; session
    # owner clears the cache.
    levels = [
        e.filter(F.col("u") < _BFS_SEED_MAX)
        .select(F.col("u").alias("node"))
        .distinct()
        .persist()
    ]
    visited = levels[0]
    for _ in range(_BFS_HOPS):
        frontier = levels[-1]
        nxt = (
            e.join(frontier, e["u"] == frontier["node"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .persist()
        )
        levels.append(nxt)
        visited = visited.unionAll(nxt)
    out = levels[0].select("node", F.lit(0).cast("long").alias("hops"))
    for h, lv in enumerate(levels[1:], start=1):
        out = out.unionAll(
            lv.select("node", F.lit(h).cast("long").alias("hops"))
        )
    return out.orderBy("hops", "node")


# --------------------------------------------------------------------------
# T3 — label propagation communities (sync LPA, K unrolled rounds)
# --------------------------------------------------------------------------
_LPA_ROUNDS = 3


def _lpa_oracle() -> str:
    ctes = [
        f"e2 AS ({_repeat_edges_sql()})",
        """e AS (
      SELECT u AS node, v AS nbr FROM e2
      UNION ALL SELECT v AS node, u AS nbr FROM e2
    )""",
        """l0 AS (
      SELECT node, node AS lbl FROM (SELECT DISTINCT node FROM e)
    )""",
    ]
    for k in range(1, _LPA_ROUNDS + 1):
        ctes.append(
            f"""c{k} AS (
      SELECT e.node, l.lbl AS nlbl, count(*) AS c
      FROM e JOIN l{k - 1} l ON e.nbr = l.node
      GROUP BY 1, 2
    )""",
        )
        ctes.append(
            f"""l{k} AS (
      SELECT node, nlbl AS lbl FROM (
        SELECT node, nlbl,
               row_number() OVER (
                 PARTITION BY node ORDER BY c DESC, nlbl
               ) AS rn
        FROM c{k}
      ) WHERE rn = 1
    )""",
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node, lbl FROM l{_LPA_ROUNDS} ORDER BY node"
    )


@query(
    "graph_label_propagation",
    tier="T3",
    doc=f"Synchronous label propagation ({_LPA_ROUNDS} unrolled rounds) "
    "over the repeat-co-purchase graph: every node adopts the MODE of "
    "its neighbors' labels each round (ties -> smallest label, so the "
    "sync update is a pure deterministic function of the previous "
    "round — the asynchronous/random-order variants of LPA are not "
    "cross-engine replayable). Each round is one co-partitioned "
    "|E|⋈|V| join plus a two-level agg: count per (node, nlbl), then "
    "a per-node argmax via max(struct(c, -nlbl)) — the mode-with-"
    "tie-break collapses into ONE combiner-friendly agg instead of a "
    "row_number window over the candidate set (same trick as "
    "agg_mode_deterministic). Labels persist per round (pagerank "
    "doctrine: unpersisted chains re-run every prior round). At "
    "100 TB the per-round shuffle is on the edge key — the same "
    "co-partitioned iteration budget as pagerank; unrolled rounds "
    "keep the oracle replayable.",
    oracle=_lpa_oracle(),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, _, labels = _lpa_labels(spark, sf_dir)
    return labels.orderBy("node")


def _lpa_labels(spark: SparkSession, sf_dir: str):
    """Shared LPA core: returns (e2 pair list, symmetric adjacency,
    final labels frame) after _LPA_ROUNDS sync rounds. e2 and e are
    persisted (both feed multiple consumers; session owner clears)."""
    e2 = _repeat_edges(spark, sf_dir).persist()
    e = e2.unionAll(
        e2.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).select(F.col("u").alias("node"), F.col("v").alias("nbr")).persist()
    labels = e.select("node").distinct().select(
        "node", F.col("node").alias("lbl")
    )
    for _ in range(_LPA_ROUNDS):
        labels = (
            e.join(
                labels.select(
                    F.col("node").alias("nbr"), F.col("lbl").alias("nlbl")
                ),
                "nbr",
            )
            .groupBy("node", "nlbl")
            .agg(F.count("*").alias("c"))
            .groupBy("node")
            .agg(
                F.max(
                    F.struct(F.col("c"), (-F.col("nlbl")).alias("neg"))
                ).alias("m")
            )
            .select("node", (-F.col("m.neg")).alias("lbl"))
            .persist()
        )
    return e2, e, labels


# --------------------------------------------------------------------------
# T3 — modularity of the LPA communities (partition-quality metric)
# --------------------------------------------------------------------------
def _lpa_label_cte() -> str:
    """The LPA oracle's CTE chain up to the final labels frame
    (shared with graph_label_propagation's oracle)."""
    full = _lpa_oracle()
    # Strip the trailing SELECT: keep everything up to the last CTE.
    return full[: full.rindex("\n    SELECT node, lbl")]


@query(
    "graph_community_modularity",
    tier="T3",
    doc="Newman modularity of the LPA communities, kept EXACT by "
    "scaling out both divisions: q4m2 = 4m*in_c - deg_c^2 is each "
    "community's contribution times 4m^2 (Q = sum(q4m2) / 4m^2), all "
    "integer. in_c (intra-community edge count) is ONE pass over the "
    "pair list with both endpoints' labels attached (two label joins "
    "- at 100 TB these are the same co-partitioned |E|x|V| joins as "
    "the LPA rounds themselves); deg_c is the degree table joined to "
    "labels once. m enters as a control-plane literal (one count over "
    "the persisted pair list - pagerank's |V| budget class). The "
    "oracle replays the full LPA chain, proving label AND metric "
    "together.",
    oracle=f"""
    {_lpa_label_cte()},
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY node
    ),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e2),
    members AS (
      SELECT lbl, CAST(count(*) AS BIGINT) AS n_members,
             CAST(sum(d) AS BIGINT) AS deg_c
      FROM l{_LPA_ROUNDS} l JOIN deg USING (node) GROUP BY lbl
    ),
    intra AS (
      SELECT lu.lbl, CAST(count(*) AS BIGINT) AS in_c
      FROM e2
      JOIN l{_LPA_ROUNDS} lu ON e2.u = lu.node
      JOIN l{_LPA_ROUNDS} lv ON e2.v = lv.node
      WHERE lu.lbl = lv.lbl
      GROUP BY lu.lbl
    )
    SELECT mb.lbl, mb.n_members, coalesce(i.in_c, 0) AS in_c, mb.deg_c,
           4 * m.m * coalesce(i.in_c, 0) - mb.deg_c * mb.deg_c AS q4m2
    FROM members mb LEFT JOIN intra i USING (lbl), m
    ORDER BY mb.lbl
    """,
)
def graph_community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e2, e, labels = _lpa_labels(spark, sf_dir)
    # labels is persisted by _lpa_labels — but persist() is LAZY, and
    # this plan references labels THREE times (members, lu, lv). If
    # the cache is not materialized before the output action runs,
    # each occurrence recomputes the whole LPA chain (measured on the
    # sf1 slice: 19.9 s vs 6.3 s for LPA alone ≈ the chain computed
    # 3x). One eager |V|-row count pins the cache first; the label
    # joins then read it (SCALE.md §31).
    labels.count()
    m = e2.count()  # control-plane literal (pagerank |V| budget class)
    deg = e.groupBy("node").agg(F.count("*").cast("long").alias("d"))
    members = (
        labels.join(deg, "node")
        .groupBy("lbl")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.sum("d").cast("long").alias("deg_c"),
        )
    )
    lu = labels.select(F.col("node").alias("u"), F.col("lbl").alias("lu"))
    lv = labels.select(F.col("node").alias("v"), F.col("lbl").alias("lv"))
    intra = (
        e2.join(lu, "u")
        .join(lv, "v")
        .filter(F.col("lu") == F.col("lv"))
        .groupBy(F.col("lu").alias("lbl"))
        .agg(F.count("*").cast("long").alias("in_c"))
    )
    return (
        members.join(intra, "lbl", "left")
        .select(
            "lbl",
            "n_members",
            F.coalesce("in_c", F.lit(0).cast("long")).alias("in_c"),
            "deg_c",
            (
                F.lit(4 * m).cast("long")
                * F.coalesce("in_c", F.lit(0).cast("long"))
                - F.col("deg_c") * F.col("deg_c")
            ).alias("q4m2"),
        )
        .orderBy("lbl")
    )


# --------------------------------------------------------------------------
# Neighbor-set Jaccard link scoring (round 9b)
# --------------------------------------------------------------------------
@query(
    "graph_neighbor_jaccard",
    tier="T3",
    doc="Link prediction via neighbor-set Jaccard on the repeat "
    "co-purchase graph: score(x,z) = |N(x) ∩ N(z)| / |N(x) ∪ N(z)|, "
    "held exact as the integer pair (n_common, deg_x + deg_z - "
    "n_common) and emitted as jaccard_e6 = n_common * 1e6 div union "
    "— no float until nothing is left to round. Complements "
    "graph_link_prediction_ra: RA weights RARE common neighbors "
    "(sum 1/deg), Jaccard normalizes by how connected the endpoints "
    "already are — a hub pair with one shared neighbor scores low "
    "here even when RA ranks it. Same scale-correct plan shape: one "
    "wedge self-join on the center of the SPARSE signal graph "
    "(degree-bounded), a broadcast-back of the tiny degree table, "
    "anti-join out existing edges, TakeOrdered top-20.",
    oracle=f"""
    WITH e2 AS ({_repeat_edges_sql()}),
    e AS (SELECT u, v FROM e2 UNION ALL SELECT v AS u, u AS v FROM e2),
    deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1),
    w AS (
      SELECT a.v AS x, b.v AS z
      FROM e a JOIN e b ON a.u = b.u AND a.v < b.v
    ),
    common AS (
      SELECT x, z, CAST(count(*) AS BIGINT) AS n_common
      FROM w GROUP BY x, z
    ),
    scored AS (
      SELECT c.x, c.z, c.n_common,
             dx.d + dz.d - c.n_common AS n_union,
             c.n_common * 1000000 // (dx.d + dz.d - c.n_common)
               AS jaccard_e6
      FROM common c
      JOIN deg dx ON dx.node = c.x
      JOIN deg dz ON dz.node = c.z
    )
    SELECT s.x AS u, s.z AS v, s.n_common,
           CAST(s.n_union AS BIGINT) AS n_union,
           CAST(s.jaccard_e6 AS BIGINT) AS jaccard_e6
    FROM scored s
    WHERE NOT EXISTS (SELECT 1 FROM e2 WHERE e2.u = s.x AND e2.v = s.z)
    ORDER BY s.jaccard_e6 DESC, u, v
    LIMIT 20
    """,
)
def graph_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    e2 = _repeat_edges(spark, sf_dir).persist()
    e = e2.unionAll(e2.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = e.groupBy(F.col("u").alias("node")).agg(
        F.count("*").cast("long").alias("d")
    )
    wa, wb = e.alias("wa"), e.alias("wb")
    common = (
        wa.join(
            wb,
            (F.col("wa.u") == F.col("wb.u")) & (F.col("wa.v") < F.col("wb.v")),
        )
        .groupBy(F.col("wa.v").alias("x"), F.col("wb.v").alias("z"))
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    dx = deg.select(F.col("node").alias("x"), F.col("d").alias("dx"))
    dz = deg.select(F.col("node").alias("z"), F.col("d").alias("dz"))
    scored = (
        common.join(F.broadcast(dx), "x")
        .join(F.broadcast(dz), "z")
        .withColumn("n_union", F.expr("dx + dz - n_common").cast("long"))
        .withColumn(
            "jaccard_e6",
            F.expr("n_common * 1000000 div n_union").cast("long"),
        )
    )
    return (
        scored.join(
            e2,
            (F.col("x") == F.col("u")) & (F.col("z") == F.col("v")),
            "left_anti",
        )
        .select(
            F.col("x").alias("u"),
            F.col("z").alias("v"),
            "n_common",
            "n_union",
            "jaccard_e6",
        )
        .orderBy(F.desc("jaccard_e6"), "u", "v")
        .limit(20)
    )


# --------------------------------------------------------------------------
# T3 — local clustering coefficient (round 10)
# --------------------------------------------------------------------------
@query(
    "graph_clustering_coefficient",
    tier="T3",
    doc="Local clustering coefficient over the repeat co-purchase "
    "graph: per node, lcc = 2·tri(v) / (d(v)·(d(v)−1)) — how close a "
    "node's neighborhood is to a clique, THE per-node cohesion "
    "signal (graph_triangle_count reports the global count; this "
    "attributes each triangle to its 3 corners). Triangles are "
    "enumerated with the same degree-ordered orientation (out-degree "
    "O(sqrt(2m)), no hub blowup), each closed wedge credits all "
    "three corners via a row-local 3-array explode, and lcc is an "
    "exact e6 integer division. Top-20 by (lcc, degree, node) with "
    "d >= 2. The repeat graph (pairs sharing >= 2 distinct orders) "
    "is a SIGNAL-THRESHOLDED sparse graph at every scale — see "
    "_repeat_edges_sql; the same plan runs on the dense co-purchase "
    "graph with only the orientation bound doing more work.",
    oracle=f"""
    WITH pairs AS ({_repeat_edges_sql()}),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs
      ) GROUP BY node
    ),
    o AS (
      SELECT CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.u ELSE p.v END AS src,
             CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.v ELSE p.u END AS dst,
             CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN dv.d ELSE du.d END AS dd
      FROM pairs p
      JOIN deg du ON du.node = p.u
      JOIN deg dv ON dv.node = p.v
    ),
    tri AS (
      SELECT o1.src AS a, o1.dst AS b, o2.dst AS c
      FROM o o1 JOIN o o2
        ON o1.src = o2.src AND (o1.dd, o1.dst) < (o2.dd, o2.dst)
      JOIN o oc ON oc.src = o1.dst AND oc.dst = o2.dst
    ),
    pt AS (
      SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT deg.node, deg.d AS degree,
           CAST(coalesce(pt.n_tri, 0) AS BIGINT) AS n_tri,
           CAST(2000000 * coalesce(pt.n_tri, 0) // (deg.d * (deg.d - 1))
                AS BIGINT) AS lcc_e6
    FROM deg LEFT JOIN pt USING (node)
    WHERE deg.d >= 2
    ORDER BY lcc_e6 DESC, degree DESC, node
    LIMIT 20
    """,
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _repeat_edges(spark, sf_dir).persist()
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select("v"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
        .persist()
    )
    du, dv = deg.alias("du"), deg.alias("dv")
    u_first = (F.col("du.d") < F.col("dv.d")) | (
        (F.col("du.d") == F.col("dv.d")) & (F.col("u") < F.col("v"))
    )
    o = (
        pairs.join(du, F.col("du.node") == F.col("u"))
        .join(dv, F.col("dv.node") == F.col("v"))
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(u_first, F.col("dv.d")).otherwise(F.col("du.d")).alias("dd"),
        )
        .persist()
    )
    o1, o2, oc = o.alias("o1"), o.alias("o2"), o.alias("oc")
    tri = (
        o1.join(o2, F.col("o1.src") == F.col("o2.src"))
        .filter(
            (F.col("o1.dd") < F.col("o2.dd"))
            | (
                (F.col("o1.dd") == F.col("o2.dd"))
                & (F.col("o1.dst") < F.col("o2.dst"))
            )
        )
        .join(
            oc,
            (F.col("oc.src") == F.col("o1.dst"))
            & (F.col("oc.dst") == F.col("o2.dst")),
        )
        .select(
            F.explode(
                F.array(F.col("o1.src"), F.col("o1.dst"), F.col("o2.dst"))
            ).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_tri"))
    )
    return (
        deg.join(tri, "node", "left")
        .filter(F.col("d") >= 2)
        .select(
            "node",
            F.col("d").alias("degree"),
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
            F.expr(
                "CAST(2000000 * coalesce(n_tri, 0) div (d * (d - 1)) AS LONG)"
            ).alias("lcc_e6"),
        )
        .orderBy(F.desc("lcc_e6"), F.desc("degree"), "node")
        .limit(20)
    )
