"""Iterative graph analytics under the oracle gate: integer PageRank.

PageRank is the canonical iterative Spark workload, but float damping
makes results accumulation-order-dependent -- unverifiable against a
second engine. This variant runs the power iteration entirely in scaled
INTEGER arithmetic (rank mass in 1e-12 units, integer division for the
damping and out-degree splits), so every iteration is bit-identical on
any engine and partitioning, and the DuckDB oracle is the same fixed
number of iterations unrolled as a CTE chain (GROUP BY is illegal in a
recursive CTE member, so fixed-depth unrolling IS the portable form).

Graph: the customer<->supplier bipartite graph of who bought from whom
(distinct (o_custkey, l_suppkey) pairs via orders |x| lineitem), edges
in both directions so neither side is a rank sink. At 100 TB each
iteration is one join + one aggregation shuffle, both on node id;
iterations are a fixed constant (5).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from station_data_ingestion_spark.queries.registry import load, query

_SCALE = 10**12
_SUPP_OFF = 10**9
_ITERS = 5


def _pagerank_oracle() -> str:
    head = f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
edges AS (
  SELECT cust AS src, supp + {_SUPP_OFF} AS dst FROM pairs
  UNION ALL
  SELECT supp + {_SUPP_OFF} AS src, cust AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
meta AS (SELECT COUNT(*) AS n FROM nodes),
outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT node, {_SCALE} // m.n AS rank FROM nodes, meta m)"""
    steps = []
    for i in range(1, _ITERS + 1):
        steps.append(f""",
r{i} AS (
  SELECT nd.node,
         (15 * {_SCALE}) // (100 * m.n)
           + (85 * COALESCE(s.s, 0)) // 100 AS rank
  FROM nodes nd CROSS JOIN meta m
  LEFT JOIN (
    SELECT e.dst, SUM(r.rank // o.deg) AS s
    FROM edges e
    JOIN r{i - 1} r ON e.src = r.node
    JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst
  ) s ON s.dst = nd.node
)""")
    return (
        head
        + "".join(steps)
        + f"\nSELECT node, CAST(rank AS BIGINT) AS rank FROM r{_ITERS}"
    )


@query("graph_pagerank_bipartite", _pagerank_oracle())
def graph_pagerank_bipartite(spark, sf_dir):
    """5 integer power iterations of damped PageRank (d=0.85) over the
    customer<->supplier purchase graph. The node count is the only
    driver-side scalar (graph metadata, like k-means' k centroids)."""
    t = load(spark, sf_dir, "orders", "lineitem")
    pairs = (
        t["lineitem"]
        .select("l_orderkey", "l_suppkey")
        .join(
            t["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )
    edges = (
        pairs.select(
            F.col("cust").alias("src"), (F.col("supp") + _SUPP_OFF).alias("dst")
        )
        .unionByName(
            pairs.select(
                (F.col("supp") + _SUPP_OFF).alias("src"), F.col("cust").alias("dst")
            )
        )
        # eager localCheckpoint instead of persist: same reuse benefit
        # across the derived frames / 5 iterations, but the blocks are
        # reclaimed by the ContextCleaner when the frames are GC'd —
        # persist() entries would outlive the query (r4 VERDICT #3)
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Observation

    obs_n = Observation()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .observe(obs_n, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    # node count rides the checkpoint action as an observed metric
    n = int(obs_n.get["n"])
    # out-degree rides ON the edge rows, joined ONCE outside the loop:
    # each iteration is then exactly one rank join + one dst aggregation
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edeg = edges.join(outdeg, "src").localCheckpoint(eager=True)
    base = (15 * _SCALE) // (100 * n)

    rank = nodes.withColumn("rank", F.lit(_SCALE // n))
    for _ in range(_ITERS):
        contrib = (
            edeg.join(rank, edeg["src"] == rank["node"])
            .select(F.col("dst"), F.expr("rank div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        # no per-iteration persist: each rank feeds exactly one consumer,
        # so the 5-iteration lineage executes once as a chain; only the
        # fan-out frames (edges+degrees, nodes) are cached
        rank = nodes.join(contrib, nodes["node"] == contrib["dst"], "left").select(
            "node",
            (F.lit(base) + F.expr("coalesce(s, 0) * 85 div 100")).alias("rank"),
        )
    return rank


@query(
    "graph_triangle_count_copurchase",
    """
WITH li AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
  WHERE l_partkey % 10 = 0
),
e AS (
  SELECT DISTINCT a.p AS a, b.p AS b
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
)
SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
       CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e1.b = e2.a
JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b
""",
)
def graph_triangle_count_copurchase(spark, sf_dir):
    """Triangle counting on the part co-purchase graph (parts appearing
    in the same order, sampled to 1/10 of parts; edges oriented a < b so
    each triangle is counted exactly once).

    The two-hop join is the textbook distributed algorithm; at real
    scale the standard refinement is degeneracy ordering (orient edges
    low-degree -> high-degree instead of by id) so the e1⋈e2 wedge
    explosion is bounded by arboricity, plus a count-distinct edge
    pre-aggregation — the id-orientation here keeps the oracle twin
    byte-identical.
    """
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    nodes = (
        li.filter(F.col("l_partkey") % 10 == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = nodes.alias("a"), nodes.alias("b")
    e = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("a"), F.col("b.p").alias("b"))
        .distinct()
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e1.a") == F.col("e3.a")) & (F.col("e2.b") == F.col("e3.b")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        e.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(F.broadcast(tri))
        .select("n_edges", "n_triangles")
    )


_BFS_HOPS = 3


def _bfs_oracle() -> str:
    return f"""
WITH RECURSIVE pairs AS (
  SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
edges AS (
  SELECT cust AS src, supp + {_SUPP_OFF} AS dst FROM pairs
  UNION ALL
  SELECT supp + {_SUPP_OFF} AS src, cust AS dst FROM pairs
),
seeds AS (
  SELECT s_suppkey + {_SUPP_OFF} AS node FROM supplier WHERE s_nationkey < 4
),
walk(node, d) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT e.dst, w.d + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.d < {_BFS_HOPS}
)
SELECT node, CAST(MIN(d) AS BIGINT) AS hops FROM walk GROUP BY node
"""


@query("graph_bfs_hops", _bfs_oracle())
def graph_bfs_hops(spark, sf_dir):
    """Multi-source BFS over a CYCLIC graph: exact hop distance from a
    seed set (nation 0-3 suppliers) through the bipartite who-bought-from-
    whom graph, {_BFS_HOPS} hops max. Unlike the pointer-doubling
    hierarchy walk (a forest), general-graph BFS needs a visited
    frontier: each round expands the frontier one hop and anti-joins the
    cumulative visited set, so a node is settled at its FIRST (minimal)
    depth and cycles never loop. Rounds are a fixed constant; each is
    one join + one anti-join shuffle on node id; per-round
    localCheckpoint keeps the plan O(1) deep. The DuckDB oracle is the
    same walk as a recursive CTE with UNION dedup + MIN(d).
    """
    t = load(spark, sf_dir, "orders", "lineitem", "supplier")
    pairs = (
        t["orders"]
        .join(
            t["lineitem"],
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("cust"),
            (F.col("l_suppkey") + _SUPP_OFF).alias("supp"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("cust").alias("src"), F.col("supp").alias("dst"))
        .unionByName(
            pairs.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
        )
        # reused every round: materialize once, with real size stats
        .localCheckpoint(eager=True)
    )
    frontier = (
        t["supplier"]
        .filter(F.col("s_nationkey") < 4)
        .select((F.col("s_suppkey") + _SUPP_OFF).alias("node"))
        .withColumn("hops", F.lit(0))
        .localCheckpoint(eager=True)
    )
    visited = frontier
    for d in range(1, _BFS_HOPS + 1):
        nxt = (
            edges.join(
                frontier.select(F.col("node").alias("src")), "src"
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(d))
            .localCheckpoint(eager=True)
        )
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited.select("node", F.col("hops").cast("long"))


_SSSP_CAP = 25


def _sssp_oracle() -> str:
    return f"""
WITH RECURSIVE nodes AS (
  SELECT c_custkey - 1 AS i FROM customer
),
edges AS (
  SELECT i AS src, (2*i + 1) % (SELECT COUNT(*) FROM customer) AS dst,
         2 + (i % 6) AS wt FROM nodes
  UNION ALL
  SELECT i, (3*i + 7) % (SELECT COUNT(*) FROM customer), 3 + (i % 5)
  FROM nodes
),
walk(node, d) AS (
  SELECT i, 0 FROM nodes WHERE i < 4
  UNION
  SELECT e.dst, w.d + e.wt
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.d < {_SSSP_CAP}
)
SELECT CAST(node AS BIGINT) AS node, CAST(MIN(d) AS BIGINT) AS dist
FROM walk GROUP BY node HAVING MIN(d) < {_SSSP_CAP}
"""


@query("graph_sssp_weighted", _sssp_oracle())
def graph_sssp_weighted(spark, sf_dir):
    """WEIGHTED single-source (multi-seed) shortest paths by frontier
    Bellman-Ford (operators/graph.py:sssp) over a deterministic sparse
    cyclic graph synthesized from customer keys (out-degree 2, integer
    weights 2..7 — derivable identically in SQL, so DuckDB can walk the
    same graph with a real WITH RECURSIVE). Distances are capped at
    {_SSSP_CAP}: positive weights make the cap a sound in-loop prune on
    BOTH engines (a prefix of any sub-cap shortest path is itself
    sub-cap), which is what keeps the recursive oracle's state space
    polynomial. Exact integer distances — no float tolerance."""
    n = load(spark, sf_dir, "customer")["customer"].count()
    nodes = load(spark, sf_dir, "customer")["customer"].select(
        (F.col("c_custkey") - 1).alias("i")
    )
    edges = nodes.select(
        F.col("i").alias("src"),
        ((2 * F.col("i") + 1) % n).alias("dst"),
        (2 + (F.col("i") % 6)).alias("wt"),
    ).unionByName(
        nodes.select(
            F.col("i").alias("src"),
            ((3 * F.col("i") + 7) % n).alias("dst"),
            (3 + (F.col("i") % 5)).alias("wt"),
        )
    )
    seeds = nodes.filter(F.col("i") < 4).select(F.col("i").alias("node"))
    from station_data_ingestion_spark.operators.graph import sssp

    out = sssp(edges, seeds, cap=_SSSP_CAP)
    return out.select(
        F.col("node").cast("long").alias("node"),
        F.col("dist").cast("long").alias("dist"),
    )


_KCORE_K = 14
_KCORE_ROUNDS = 30


def _kcore_oracle() -> str:
    return f"""
WITH RECURSIVE li AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
  WHERE l_partkey % 5 = 0
),
e0 AS (
  SELECT DISTINCT a.p AS a, b.p AS b
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
),
e AS (
  SELECT a AS src, b AS dst FROM e0
  UNION ALL SELECT b AS src, a AS dst FROM e0
),
peel(r, node) AS (
  SELECT 0, src FROM e GROUP BY src
  UNION ALL
  SELECT p.r + 1, d.src
  FROM (
    SELECT MAX(r) AS r FROM peel
  ) p,
  LATERAL (
    SELECT e.src, COUNT(*) AS deg
    FROM e
    JOIN peel pa ON pa.node = e.src
    JOIN peel pb ON pb.node = e.dst
    GROUP BY e.src
  ) d
  WHERE d.deg >= {_KCORE_K} AND p.r < {_KCORE_ROUNDS}
),
core AS (
  SELECT node FROM peel WHERE r = {_KCORE_ROUNDS}
)
SELECT e.src AS node, CAST(COUNT(*) AS BIGINT) AS deg
FROM e
JOIN core ca ON ca.node = e.src
JOIN core cb ON cb.node = e.dst
GROUP BY e.src
"""


@query("graph_kcore_membership", _kcore_oracle())
def graph_kcore_membership(spark, sf_dir):
    """k-core decomposition (k={_KCORE_K}) of the co-purchase graph —
    the standard graph-density filter (drop everything that cannot sit
    inside a subgraph of minimum degree k) used for community seeding
    and spam pruning. Iterative peeling via operators/graph.py:kcore —
    each round joins the shrinking alive set to the edge list and
    recomputes degrees (node-id shuffles only), localCheckpoint
    truncates the lineage, and non-convergence within the shared round
    cap RAISES rather than returning a non-fixpoint. The DuckDB oracle
    peels the same graph through a recursive CTE whose working table is
    the previous round's alive set, unrolled to the same cap — after
    convergence the set reproduces itself, so round {_KCORE_ROUNDS}
    IS the fixpoint both engines certify."""
    from station_data_ingestion_spark.operators.graph import kcore

    li = (
        load(spark, sf_dir, "lineitem")["lineitem"]
        .filter(F.col("l_partkey") % 5 == 0)
        .select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .distinct()
    )
    e0 = (
        li.alias("a")
        .join(li.alias("b"), F.col("a.o") == F.col("b.o"))
        .filter(F.col("a.p") < F.col("b.p"))
        .select(F.col("a.p").alias("a"), F.col("b.p").alias("b"))
        .distinct()
    )
    edges = e0.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(
        e0.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).localCheckpoint(eager=True)
    return kcore(edges, k=_KCORE_K, max_rounds=_KCORE_ROUNDS)


_COPURCHASE_EDGES_SQL = """
WITH li AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
  WHERE l_partkey % 10 = 0
),
e AS (
  SELECT DISTINCT a.p AS a, b.p AS b
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
)
"""


def _copurchase_edges(spark, sf_dir):
    """The shared part co-purchase edge frame (a < b, deduplicated) —
    same construction as graph_triangle_count_copurchase."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    nodes = (
        li.filter(F.col("l_partkey") % 10 == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = nodes.alias("a"), nodes.alias("b")
    return (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("a"), F.col("b.p").alias("b"))
        .distinct()
    )


@query(
    "graph_clustering_coefficient",
    _COPURCHASE_EDGES_SQL
    + """,
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e1.b = e2.a
  JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b
), tri_per_node AS (
  SELECT v, COUNT(*) AS tri FROM (
    SELECT x AS v FROM tri UNION ALL
    SELECT y FROM tri UNION ALL
    SELECT z FROM tri
  ) GROUP BY v
), deg AS (
  SELECT v, COUNT(*) AS d FROM (
    SELECT a AS v FROM e UNION ALL SELECT b FROM e
  ) GROUP BY v
), cc AS (
  SELECT deg.v, deg.d, COALESCE(tri_per_node.tri, 0) AS tri,
         (20 * COALESCE(tri_per_node.tri, 0)) // (deg.d * (deg.d - 1))
           AS bucket,
         2.0 * COALESCE(tri_per_node.tri, 0) / (deg.d * (deg.d - 1)) AS c
  FROM deg LEFT JOIN tri_per_node ON deg.v = tri_per_node.v
  WHERE deg.d >= 2
)
SELECT CAST(bucket AS BIGINT) AS cc_tenths_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       ROUND(AVG(c), 6) AS avg_cc
FROM cc GROUP BY 1
""",
)
def graph_clustering_coefficient(spark, sf_dir):
    """LOCAL clustering coefficient distribution over the co-purchase
    graph: cc(v) = 2*tri(v) / (deg(v)*(deg(v)-1)) for deg >= 2,
    bucketed into tenths. Triangles come from the same oriented
    (a<b<c) two-hop join as the triangle-count query, projected onto
    all three corners; the bucket is EXACT integer floor division
    (20*tri div d(d-1)) so no float ever decides a bucket edge — only
    the per-bucket average coefficient is floating point. Every join
    is an equi-join on node id; output is bucket-bounded (<=11
    rows)."""
    e = _copurchase_edges(spark, sf_dir)
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e1.a") == F.col("e3.a")) & (F.col("e2.b") == F.col("e3.b")),
        )
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    tri_per_node = (
        tri.select(F.col("x").alias("v"))
        .unionAll(tri.select(F.col("y").alias("v")))
        .unionAll(tri.select(F.col("z").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("tri"))
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    cc = (
        deg.join(tri_per_node, "v", "left")
        .withColumn("tri", F.coalesce(F.col("tri"), F.lit(0)))
        .filter(F.col("d") >= 2)
        .select(
            F.expr("(20 * tri) div (d * (d - 1))").alias("bucket"),
            (
                2.0 * F.col("tri") / (F.col("d") * (F.col("d") - 1))
            ).alias("c"),
        )
    )
    return cc.groupBy(
        F.col("bucket").cast("long").alias("cc_tenths_bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.round(F.avg("c"), 6).alias("avg_cc"),
    )


@query(
    "graph_common_neighbors_linkpred",
    _COPURCHASE_EDGES_SQL
    + """,
adj AS (
  SELECT a AS u, b AS w FROM e UNION ALL SELECT b, a FROM e
), deg AS (
  SELECT u AS v, COUNT(*) AS d FROM adj GROUP BY u
), cand AS (
  SELECT s.u AS x, t.w AS z, COUNT(*) AS cn
  FROM adj s JOIN adj t ON s.w = t.u
  WHERE s.u < t.w
  GROUP BY s.u, t.w
), nonedge AS (
  SELECT cand.* FROM cand
  LEFT JOIN e ON e.a = cand.x AND e.b = cand.z
  WHERE e.a IS NULL
)
SELECT CAST(x AS BIGINT) AS x, CAST(z AS BIGINT) AS z,
       CAST(cn AS BIGINT) AS common_neighbors,
       ROUND(cn * 1.0 / (dx.d + dz.d - cn), 6) AS jaccard
FROM nonedge
JOIN deg dx ON dx.v = x JOIN deg dz ON dz.v = z
ORDER BY cn DESC, x ASC, z ASC LIMIT 20
""",
)
def graph_common_neighbors_linkpred(spark, sf_dir):
    """LINK PREDICTION by common-neighbor count: the top-20 NON-adjacent
    part pairs sharing the most co-purchase neighbors, with Jaccard
    |N(x) ∩ N(z)| / |N(x) ∪ N(z)| as the score. Wedge enumeration is
    the same two-hop equi-join the triangle count pays (bounded by
    sum of squared degrees); existing edges leave via one anti-join
    on the oriented pair; degrees attach by node-id equi-joins.
    Deterministic top-20 (cn desc, then pair id) via TakeOrdered —
    never a global row_number window."""
    e = _copurchase_edges(spark, sf_dir)
    adj = e.select(F.col("a").alias("u"), F.col("b").alias("w")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("w"))
    )
    deg = adj.groupBy(F.col("u").alias("v")).agg(
        F.count(F.lit(1)).alias("d")
    )
    s, t = adj.alias("s"), adj.alias("t")
    cand = (
        s.join(t, F.col("s.w") == F.col("t.u"))
        .filter(F.col("s.u") < F.col("t.w"))
        .groupBy(F.col("s.u").alias("x"), F.col("t.w").alias("z"))
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    nonedge = cand.join(
        e,
        (F.col("a") == F.col("x")) & (F.col("b") == F.col("z")),
        "left_anti",
    )
    dx = deg.select(F.col("v").alias("x"), F.col("d").alias("dx"))
    dz = deg.select(F.col("v").alias("z"), F.col("d").alias("dz"))
    scored = (
        nonedge.join(dx, "x")
        .join(dz, "z")
        .select(
            F.col("x").cast("long"),
            F.col("z").cast("long"),
            F.col("cn").cast("long").alias("common_neighbors"),
            F.round(
                F.col("cn") * 1.0 / (F.col("dx") + F.col("dz") - F.col("cn")),
                6,
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.col("common_neighbors").desc(), F.col("x").asc(), F.col("z").asc()
    ).limit(20)


@query(
    "graph_adamic_adar_linkpred",
    _COPURCHASE_EDGES_SQL
    + """,
adj AS (
  SELECT a AS u, b AS w FROM e UNION ALL SELECT b, a FROM e
), deg AS (
  SELECT u AS v, COUNT(*) AS d FROM adj GROUP BY u
), wedge AS (
  SELECT s.u AS x, t.w AS z, s.w AS mid
  FROM adj s JOIN adj t ON s.w = t.u
  WHERE s.u < t.w
), scored AS (
  SELECT x, z,
         CAST(SUM(CAST(ROUND(1000000.0 / ln(deg.d)) AS BIGINT)) AS BIGINT)
           AS aa_micro,
         CAST(SUM(CAST(ROUND(1000000.0 / deg.d) AS BIGINT)) AS BIGINT)
           AS ra_micro
  FROM wedge JOIN deg ON deg.v = wedge.mid
  GROUP BY x, z
), nonedge AS (
  SELECT scored.* FROM scored
  LEFT JOIN e ON e.a = scored.x AND e.b = scored.z
  WHERE e.a IS NULL
)
SELECT CAST(x AS BIGINT) AS x, CAST(z AS BIGINT) AS z,
       ROUND(aa_micro / 1000000.0, 6) AS adamic_adar,
       ROUND(ra_micro / 1000000.0, 6) AS resource_alloc
FROM nonedge
ORDER BY aa_micro DESC, x ASC, z ASC LIMIT 20
""",
)
def graph_adamic_adar_linkpred(spark, sf_dir):
    """LINK PREDICTION by Adamic-Adar: top-20 non-adjacent part pairs
    scored by sum over common neighbors w of 1/ln(deg(w)) — rare shared
    neighbors count more than popular hubs — plus the resource-allocation
    index (1/deg(w)). Same wedge equi-join the common-neighbor query
    pays (bounded by sum of squared degrees, never all-pairs); the
    middle node's degree attaches by one equi-join BEFORE the pair
    group-by, so each wedge contributes its term exactly once. Per-wedge
    terms are quantized to integer micro-units before the SUM — integer
    addition is associative, so the aggregate is bit-identical across
    partitionings and engines (the registry float rule). Top-20 by
    (aa desc, pair id) is a TakeOrdered on the integer score, never a
    global window. At 100 TB the wedge join is the one shuffle and the
    hub-degree skew is the knob — the same cap/salting levers as the
    triangle count apply."""
    e = _copurchase_edges(spark, sf_dir)
    adj = e.select(F.col("a").alias("u"), F.col("b").alias("w")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("w"))
    )
    deg = adj.groupBy(F.col("u").alias("v")).agg(
        F.count(F.lit(1)).alias("d")
    )
    s, t = adj.alias("s"), adj.alias("t")
    wedge = (
        s.join(t, F.col("s.w") == F.col("t.u"))
        .filter(F.col("s.u") < F.col("t.w"))
        .select(
            F.col("s.u").alias("x"),
            F.col("t.w").alias("z"),
            F.col("s.w").alias("mid"),
        )
    )
    scored = (
        wedge.join(deg, F.col("mid") == F.col("v"))
        .groupBy("x", "z")
        .agg(
            F.sum(
                F.round(F.lit(1000000.0) / F.log(F.col("d").cast("double")))
                .cast("long")
            ).alias("aa_micro"),
            F.sum(
                F.round(F.lit(1000000.0) / F.col("d")).cast("long")
            ).alias("ra_micro"),
        )
    )
    nonedge = scored.join(
        e,
        (F.col("a") == F.col("x")) & (F.col("b") == F.col("z")),
        "left_anti",
    )
    out = nonedge.select(
        F.col("x").cast("long"),
        F.col("z").cast("long"),
        F.round(F.col("aa_micro") / 1000000.0, 6).alias("adamic_adar"),
        F.round(F.col("ra_micro") / 1000000.0, 6).alias("resource_alloc"),
        F.col("aa_micro"),
    )
    return (
        out.orderBy(F.col("aa_micro").desc(), F.col("x").asc(), F.col("z").asc())
        .limit(20)
        .drop("aa_micro")
    )


@query(
    "graph_label_propagation_sync3",
    _COPURCHASE_EDGES_SQL
    + """,
adj AS (
  SELECT a AS u, b AS w FROM e UNION ALL SELECT b, a FROM e
), l0 AS (
  SELECT DISTINCT u AS v, u AS label FROM adj
), v1 AS (
  SELECT adj.u AS v, l.label, COUNT(*) AS c
  FROM adj JOIN l0 l ON adj.w = l.v GROUP BY adj.u, l.label
), r1 AS (
  SELECT v, label FROM v1
  QUALIFY ROW_NUMBER() OVER (PARTITION BY v ORDER BY c DESC, label ASC) = 1
), v2 AS (
  SELECT adj.u AS v, l.label, COUNT(*) AS c
  FROM adj JOIN r1 l ON adj.w = l.v GROUP BY adj.u, l.label
), r2 AS (
  SELECT v, label FROM v2
  QUALIFY ROW_NUMBER() OVER (PARTITION BY v ORDER BY c DESC, label ASC) = 1
), v3 AS (
  SELECT adj.u AS v, l.label, COUNT(*) AS c
  FROM adj JOIN r2 l ON adj.w = l.v GROUP BY adj.u, l.label
), r3 AS (
  SELECT v, label FROM v3
  QUALIFY ROW_NUMBER() OVER (PARTITION BY v ORDER BY c DESC, label ASC) = 1
)
SELECT CAST(label AS BIGINT) AS community,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(MIN(v) AS BIGINT) AS min_member
FROM r3 GROUP BY label
""",
)
def graph_label_propagation_sync3(spark, sf_dir):
    """Community detection by SYNCHRONOUS label propagation, three
    deterministic rounds: every node starts labeled with its own id and
    each round adopts the most frequent label among its neighbors
    (ties break to the smallest label, so the update is a pure function
    of the previous round — no asynchronous/order-dependent drift).
    Each round is ONE equi-join (edges x labels) + ONE aggregation; the
    per-node argmax is a single max(struct(count, -label)) — no window
    over the wedge frame. Fixed round count keeps the lineage bounded
    (no iterate-to-convergence checkpoint dance) and makes the oracle
    expressible as three unrolled SQL layers. At 100 TB each round
    shuffles edges once on dst — the same cost profile as one PageRank
    iteration; hub skew salts the same way."""
    e = _copurchase_edges(spark, sf_dir)
    adj = e.select(F.col("a").alias("u"), F.col("b").alias("w")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("w"))
    )
    labels = adj.select(F.col("u").alias("v")).distinct().select(
        "v", F.col("v").alias("label")
    )
    for _ in range(3):
        votes = (
            adj.join(labels, F.col("w") == F.col("v"))
            .groupBy(F.col("u"), F.col("label"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            votes.groupBy("u")
            .agg(
                F.max(
                    F.struct(
                        F.col("c").alias("c"),
                        (-F.col("label")).alias("neg_label"),
                    )
                ).alias("top")
            )
            .select(
                F.col("u").alias("v"),
                (-F.col("top.neg_label")).alias("label"),
            )
        )
    return labels.groupBy(F.col("label").cast("long").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.min("v").cast("long").alias("min_member"),
    )


_PPR_ITERS = 3


def _ppr_oracle() -> str:
    head = f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
edges AS (
  SELECT cust AS src, supp + {_SUPP_OFF} AS dst FROM pairs
  UNION ALL
  SELECT supp + {_SUPP_OFF} AS src, cust AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
sn AS (
  SELECT n.node, s.s_nationkey AS nk
  FROM nodes n
  JOIN supplier s ON n.node = s.s_suppkey + {_SUPP_OFF}
),
seeds AS (SELECT node FROM sn WHERE nk = (SELECT MIN(nk) FROM sn)),
smeta AS (SELECT COUNT(*) AS ns FROM seeds),
r0 AS (
  SELECT n.node,
         CASE WHEN sd.node IS NOT NULL THEN {_SCALE} // m.ns ELSE 0 END
           AS rank
  FROM nodes n CROSS JOIN smeta m LEFT JOIN seeds sd ON sd.node = n.node
)"""
    steps = []
    for i in range(1, _PPR_ITERS + 1):
        steps.append(f""",
r{i} AS (
  SELECT n.node,
         CASE WHEN sd.node IS NOT NULL
              THEN (15 * {_SCALE}) // (100 * m.ns) ELSE 0 END
           + (85 * COALESCE(s.s, 0)) // 100 AS rank
  FROM nodes n CROSS JOIN smeta m
  LEFT JOIN seeds sd ON sd.node = n.node
  LEFT JOIN (
    SELECT e.dst, SUM(r.rank // o.deg) AS s
    FROM edges e
    JOIN r{i - 1} r ON e.src = r.node
    JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst
  ) s ON s.dst = n.node
)""")
    return (
        head
        + "".join(steps)
        + f"\nSELECT node, CAST(rank AS BIGINT) AS rank FROM r{_PPR_ITERS}"
    )


@query("graph_personalized_pagerank", _ppr_oracle())
def graph_personalized_pagerank(spark, sf_dir):
    """Personalized PageRank: the teleport vector concentrates on a
    SEED SET (suppliers of the smallest nation key present in the
    graph — a rule that is non-empty at every SF) instead of spreading
    uniformly, so
    ranks measure proximity to that segment — the standard seeded
    relevance/recommendation primitive. Same exact-integer mass scheme
    as graph_pagerank_bipartite (1e-12 units, integer division), so 3
    fixed iterations are bit-identical on any engine/partitioning and
    the DuckDB oracle is the unrolled CTE chain. Unreached nodes keep
    rank 0 (PPR mass leaks by definition — no uniform floor). Per
    iteration: one rank join + one dst aggregation, both keyed on node
    id; the seed flag rides the cached node frame so no per-iteration
    seed join."""
    t = load(spark, sf_dir, "orders", "lineitem", "supplier")
    pairs = (
        t["lineitem"]
        .select("l_orderkey", "l_suppkey")
        .join(
            t["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )
    edges = (
        pairs.select(
            F.col("cust").alias("src"), (F.col("supp") + _SUPP_OFF).alias("dst")
        )
        .unionByName(
            pairs.select(
                (F.col("supp") + _SUPP_OFF).alias("src"),
                F.col("cust").alias("dst"),
            )
        )
        .localCheckpoint(eager=True)
    )
    sup = t["supplier"].select(
        (F.col("s_suppkey") + _SUPP_OFF).alias("snode"),
        F.col("s_nationkey").alias("nk"),
    )
    bare_nodes = (
        edges.select(F.col("src").alias("node")).distinct().localCheckpoint(eager=True)
    )
    sn = bare_nodes.join(F.broadcast(sup), F.col("node") == F.col("snode"))
    # graph metadata scalar, same class as the node count in plain PR
    mn = sn.agg(F.min("nk")).collect()[0][0]
    seeds = sn.where(F.col("nk") == mn).select("snode")
    from pyspark.sql import Observation

    obs_s = Observation()
    nodes = (
        bare_nodes.join(F.broadcast(seeds), F.col("node") == F.col("snode"), "left")
        .select("node", F.col("snode").isNotNull().alias("is_seed"))
        .observe(obs_s, F.sum(F.col("is_seed").cast("long")).alias("ns"))
        .localCheckpoint(eager=True)
    )
    # seed count rides the checkpoint action as an observed metric
    ns = int(obs_s.get["ns"] or 0)
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edeg = edges.join(outdeg, "src").localCheckpoint(eager=True)
    base = (15 * _SCALE) // (100 * ns)

    rank = nodes.select(
        "node",
        F.when(F.col("is_seed"), F.lit(_SCALE // ns)).otherwise(F.lit(0)).alias("rank"),
    )
    for _ in range(_PPR_ITERS):
        contrib = (
            edeg.join(rank, edeg["src"] == rank["node"])
            .select(F.col("dst"), F.expr("rank div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        rank = nodes.join(contrib, nodes["node"] == contrib["dst"], "left").select(
            "node",
            (
                F.when(F.col("is_seed"), F.lit(base)).otherwise(F.lit(0))
                + F.expr("coalesce(s, 0) * 85 div 100")
            ).alias("rank"),
        )
    return rank


@query(
    "graph_mean_aggregation_layer",
    _COPURCHASE_EDGES_SQL
    + """,
adj AS (
  SELECT a AS u, b AS w FROM e UNION ALL SELECT b, a FROM e
),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY u),
agg AS (
  SELECT adj.u AS node,
         CAST(COUNT(*) AS BIGINT) AS n_neighbors,
         CAST(SUM(nd.d) AS BIGINT) AS neigh_deg_sum,
         (SUM(nd.d) * 1000000) // COUNT(*) AS mean_micro
  FROM adj JOIN deg nd ON adj.w = nd.u
  GROUP BY adj.u
)
SELECT a.node, d.d AS own_degree, a.n_neighbors, a.neigh_deg_sum,
       CAST(a.mean_micro AS BIGINT) AS neigh_deg_mean_micro
FROM agg a JOIN deg d ON a.node = d.u
ORDER BY a.neigh_deg_sum DESC, a.node ASC LIMIT 25
""",
    doc="One mean-aggregation message-passing layer (GraphSAGE shape): "
    "each node averages its neighbors' degree feature; integer micro "
    "mean.",
)
def graph_mean_aggregation_layer(spark, sf_dir):
    """One MESSAGE-PASSING layer (the GraphSAGE-mean shape that
    underlies GNN feature pipelines): every node aggregates its
    neighbors' feature — here the degree, the canonical structural
    feature — by mean. On Spark this is exactly one edge-to-feature
    join plus one destination aggregation, the same two-shuffle
    skeleton as a PageRank iteration; stacking L layers = L of these.
    The mean is integer micro-division (exact on both engines); output
    is the top-25 nodes by aggregate with node tiebreak. Feature
    vectors beyond scalars ride the same plan with array columns
    (F.aggregate elementwise sums)."""
    e = _copurchase_edges(spark, sf_dir)
    adj = e.select(F.col("a").alias("u"), F.col("b").alias("w")).unionByName(
        e.select(F.col("b").alias("u"), F.col("a").alias("w"))
    ).localCheckpoint(eager=True)
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d"))
    nd = deg.select(F.col("u").alias("w"), F.col("d").alias("wd"))
    agg = (
        adj.join(nd, "w")
        .groupBy("u")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_neighbors"),
            F.sum("wd").cast("long").alias("neigh_deg_sum"),
        )
    )
    return (
        agg.join(deg, "u")
        .select(
            F.col("u").alias("node"),
            F.col("d").alias("own_degree"),
            "n_neighbors",
            "neigh_deg_sum",
            F.expr("neigh_deg_sum * 1000000 div n_neighbors")
            .cast("long")
            .alias("neigh_deg_mean_micro"),
        )
        .orderBy(F.col("neigh_deg_sum").desc(), F.col("node").asc())
        .limit(25)
    )


_HITS_ITERS = 3


def _hits_oracle() -> str:
    head = f"""
WITH edges AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS u, l_suppkey AS v
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
hubs0 AS (SELECT DISTINCT u, CAST({_SCALE} AS HUGEINT) AS h FROM edges)"""
    steps = []
    for i in range(1, _HITS_ITERS + 1):
        steps.append(f""",
araw{i} AS MATERIALIZED (
  SELECT e.v, CAST(SUM(h.h) AS HUGEINT) AS s
  FROM edges e JOIN hubs{i - 1} h ON e.u = h.u GROUP BY e.v
),
atot{i} AS (SELECT CAST(SUM(s) AS HUGEINT) AS tot FROM araw{i}),
auth{i} AS MATERIALIZED (
  SELECT v, CAST(s * {_SCALE} // t.tot AS HUGEINT) AS a
  FROM araw{i}, atot{i} t
),
hraw{i} AS MATERIALIZED (
  SELECT e.u, CAST(SUM(a.a) AS HUGEINT) AS s
  FROM edges e JOIN auth{i} a ON e.v = a.v GROUP BY e.u
),
htot{i} AS (SELECT CAST(SUM(s) AS HUGEINT) AS tot FROM hraw{i}),
hubs{i} AS MATERIALIZED (
  SELECT u, CAST(s * {_SCALE} // t.tot AS HUGEINT) AS h
  FROM hraw{i}, htot{i} t
)"""
        )
    tail = f"""
, top_a AS (
  SELECT 'authority' AS kind, v AS node, CAST(a AS BIGINT) AS score,
         ROW_NUMBER() OVER (ORDER BY a DESC, v ASC) AS rk
  FROM auth{_HITS_ITERS}
), top_h AS (
  SELECT 'hub' AS kind, u AS node, CAST(h AS BIGINT) AS score,
         ROW_NUMBER() OVER (ORDER BY h DESC, u ASC) AS rk
  FROM hubs{_HITS_ITERS}
)
SELECT kind, CAST(rk AS BIGINT) AS rk, node, score FROM top_a WHERE rk <= 10
UNION ALL
SELECT kind, CAST(rk AS BIGINT) AS rk, node, score FROM top_h WHERE rk <= 10
"""
    return head + "".join(steps) + tail


@query("graph_hits_hubs_authorities", _hits_oracle())
def graph_hits_hubs_authorities(spark, sf_dir):
    """HITS (Kleinberg) on the directed customer->supplier purchase
    graph: 3 mutual-reinforcement iterations — authority(v) = sum of
    hub scores buying from v, hub(u) = sum of authority scores u buys
    from — with SUM-normalization each half-step in scaled INTEGER
    arithmetic (the PageRank pattern: integer division makes every
    iteration bit-identical on any engine/partitioning; the float
    L2-normalized variant would be unverifiable). Each half-step is
    one join + one aggregation shuffle on node id; the normalizer is a
    one-row broadcast. Ships the top-10 hubs and authorities under a
    deterministic (score DESC, node) order."""
    t = load(spark, sf_dir, "orders", "lineitem")
    edges = (
        t["lineitem"]
        .select("l_orderkey", "l_suppkey")
        .join(
            t["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("u"), F.col("l_suppkey").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Observation

    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    hubs = edges.select("u").distinct().withColumn(
        "h", F.lit(_SCALE).cast("decimal(38,0)")
    )
    auth = None
    for _ in range(_HITS_ITERS):
        # eager checkpoint per half-step: araw/hraw each feed BOTH the
        # normalizer scalar and the scaled scores — without cutting the
        # lineage the shared subtree re-executes 2x per level (2^6 by
        # iteration 3; measured 23s -> ~3s at sf0.1). The normalizer is
        # a driver-side scalar (PageRank's node-count pattern: graph
        # META, not data), embedded as a literal so each half-step
        # stays one join + one aggregation — and it rides the
        # checkpoint action as an OBSERVED metric (exact decimal sum
        # over the same rows), so the six per-half-step normalizer
        # collect jobs of r10 are gone (guide §5: fold scalar actions
        # into jobs already being paid).
        obs_a = Observation()
        araw = (
            edges.join(hubs, "u")
            .groupBy("v")
            .agg(F.sum(dec(F.col("h"))).alias("s"))
            .observe(obs_a, F.sum("s").alias("tot"))
            .localCheckpoint(eager=True)
        )
        atot = int(obs_a.get["tot"])
        auth = araw.select(
            "v",
            F.expr(f"(s * {_SCALE}) div {atot}")
            .cast("decimal(38,0)")
            .alias("a"),
        )
        obs_h = Observation()
        hraw = (
            edges.join(auth, "v")
            .groupBy("u")
            .agg(F.sum(dec(F.col("a"))).alias("s"))
            .observe(obs_h, F.sum("s").alias("tot"))
            .localCheckpoint(eager=True)
        )
        htot = int(obs_h.get["tot"])
        hubs = hraw.select(
            "u",
            F.expr(f"(s * {_SCALE}) div {htot}")
            .cast("decimal(38,0)")
            .alias("h"),
        )
    from pyspark.sql import Window

    # top-10 via orderBy+limit = TakeOrderedAndProject (distributed
    # per-partition partial top-k, no global window over the node
    # frame); the rank attach is a window over the 10-row RESULT only
    wa = Window.orderBy(F.col("a").desc(), F.col("v").asc())
    wh = Window.orderBy(F.col("h").desc(), F.col("u").asc())
    top_a = (
        auth.orderBy(F.col("a").desc(), F.col("v").asc())
        .limit(10)
        .withColumn("rk", F.row_number().over(wa))
        .select(
            F.lit("authority").alias("kind"),
            F.col("rk").cast("long").alias("rk"),
            F.col("v").alias("node"),
            F.col("a").cast("long").alias("score"),
        )
    )
    top_h = (
        hubs.orderBy(F.col("h").desc(), F.col("u").asc())
        .limit(10)
        .withColumn("rk", F.row_number().over(wh))
        .select(
            F.lit("hub").alias("kind"),
            F.col("rk").cast("long").alias("rk"),
            F.col("u").alias("node"),
            F.col("h").cast("long").alias("score"),
        )
    )
    return top_a.unionByName(top_h)
