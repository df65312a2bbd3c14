"""Distributed graph operators: connected components.

Alternating large-star / small-star connected components (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 -- public
algorithm, also the basis of GraphFrames' CC). Compared to plain min-label
propagation, which needs O(diameter) rounds and dies on chain-shaped
graphs (a pathological near-dup cluster can be a long chain of pairwise
matches), star contraction converges in O(log^2 n) rounds on ANY graph
shape -- each round rewires every node toward its neighborhood minimum, so
chains collapse geometrically.

Per-round lineage is truncated with either ``localCheckpoint`` (fast,
executor-local -- fine on a single node or with external shuffle/storage)
or a RELIABLE ``checkpoint`` into a caller-supplied directory (HDFS/S3) --
on a real cluster executor loss mid-iteration would otherwise discard
localCheckpoint blocks and kill the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    checkpoint_dir: str | None = None,
    max_rounds: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """Label every node of an undirected graph with its component minimum.

    ``edges``: two numeric columns (any names), one row per edge, either
    orientation, duplicates/self-loops tolerated. Returns
    ``DataFrame[node, rep]`` covering every node that appears in an edge;
    ``rep`` is the smallest node id in the component (the same labeling a
    reachability closure produces, so results are oracle-checkable).

    ``checkpoint_dir``: when set, per-round truncation uses reliable
    ``checkpoint()`` into this directory (survives executor loss);
    otherwise ``localCheckpoint()``. ``stats``, if given, gets
    ``stats["rounds"]`` set -- tests assert the chain-collapse bound.
    """
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df: DataFrame) -> DataFrame:
        return df.checkpoint() if checkpoint_dir is not None else df.localCheckpoint()

    u0, v0 = edges.columns[:2]
    base = edges.select(
        F.col(u0).cast("long").alias("u"), F.col(v0).cast("long").alias("v")
    ).filter(F.col("u") != F.col("v"))
    nodes = base.select(F.col("u").alias("node")).union(
        base.select(F.col("v").alias("node"))
    ).distinct()
    # symmetric adjacency
    e = _ckpt(
        base.union(base.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
    )

    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        # large-star: every neighbor larger than u rewires to
        # m(u) = min(neighborhood(u) + {u})
        lmins = e.groupBy("u").agg(F.min("v").alias("mn"))
        large = (
            e.join(lmins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("a"),
                F.least(F.col("mn"), F.col("u")).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # small-star on the larger->smaller orientation: every smaller
        # neighbor (and u itself) rewires to the smallest
        sdir = (
            large.select(
                F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
            ).distinct()
        )
        smins = sdir.groupBy("u").agg(F.min("v").alias("mn"))
        small = (
            sdir.join(smins, "u")
            .select(F.col("v").alias("a"), F.col("mn").alias("b"))
            .union(smins.select(F.col("u").alias("a"), F.col("mn").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        new_e = _ckpt(
            small.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
                small.select(F.col("b").alias("u"), F.col("a").alias("v"))
            ).distinct()
        )
        # fixpoint: the undirected edge set stopped changing. Both sides
        # are checkpoint-materialized, so the two anti-joins are cheap —
        # and both witness probes ride ONE action (union of two limit-1
        # frames) instead of two count jobs per round.
        changed = (
            new_e.exceptAll(e)
            .limit(1)
            .unionAll(e.exceptAll(new_e).limit(1))
            .count()
        )
        e = new_e
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    if stats is not None:
        stats["rounds"] = rounds

    # converged graph is a union of stars centered at component minima
    label = e.groupBy("u").agg(F.min("v").alias("nbr_min"))
    return (
        nodes.join(label, nodes["node"] == label["u"], "left")
        .select(
            "node",
            F.least(F.coalesce("nbr_min", "node"), "node").alias("rep"),
        )
    )


def sssp(
    edges: DataFrame,
    seeds: DataFrame,
    cap: int,
    max_rounds: int = 64,
) -> DataFrame:
    """Multi-source WEIGHTED shortest paths (Bellman-Ford frontier
    relaxation), distances pruned at ``cap``.

    ``edges``: (src, dst, wt) with POSITIVE integer weights. ``seeds``:
    (node,) at distance 0. Returns (node, dist) with dist < cap — every
    node's exact minimum distance from the seed set.

    Scale shape: the state is ONE row per settled node and the frontier
    is only the nodes IMPROVED last round — each round is a join on src
    plus a min-groupBy, both shuffling on node id; lineage is truncated
    per round (localCheckpoint) so the plan stays O(1) deep. Positive
    weights make distances monotone, so candidates >= cap are pruned
    INSIDE the loop (they can never lead to a sub-cap result) and the
    loop terminates in at most cap/min_wt rounds — the driver's only
    per-round action is the frontier-empty check. Dijkstra's priority
    queue does not distribute; frontier Bellman-Ford is the standard
    bulk-synchronous form (Pregel/GraphFrames use the same shape).
    """
    edges = edges.select("src", "dst", "wt").localCheckpoint(eager=True)
    dist = (
        seeds.select("node").distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = dist
    for _ in range(max_rounds):
        cand = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(
                edges["dst"].alias("node"),
                (frontier["dist"] + edges["wt"]).alias("dist"),
            )
            .filter(F.col("dist") < cap)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        from pyspark.sql import Observation

        obs_i = Observation()
        improved = (
            cand.join(
                dist.select("node", F.col("dist").alias("cur")),
                "node",
                "left",
            )
            .filter(F.col("cur").isNull() | (F.col("dist") < F.col("cur")))
            .select("node", "dist")
            .observe(obs_i, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        # the frontier-empty check rides the checkpoint action as an
        # observed metric — one job per round instead of two
        if int(obs_i.get["n"]) == 0:
            break
        dist = (
            dist.join(improved.select("node"), "node", "left_anti")
            .unionByName(improved)
            .localCheckpoint(eager=True)
        )
        frontier = improved
    else:
        raise RuntimeError(
            f"sssp did not converge in {max_rounds} rounds "
            "(cap/min-weight bound exceeded — check weights are positive)"
        )
    return dist


def kcore(
    edges: DataFrame,
    k: int,
    max_rounds: int = 30,
) -> DataFrame:
    """k-core decomposition membership: the maximal subgraph where every
    node keeps degree >= k, by iterative peeling (remove all nodes below
    k, recompute degrees, repeat to fixpoint).

    ``edges`` is an undirected simple graph given as BOTH directions
    (src, dst), no self-loops, no duplicates. Returns (node, deg) with
    deg = the node's degree INSIDE the core.

    Scale shape: each round is one join of the (shrinking) alive set
    against the edge list + one degree groupBy — shuffles on node id
    only, never materializing anything super-linear; localCheckpoint
    truncates the iterative lineage. Peeling converges in at most the
    degeneracy-ordering depth (a handful of rounds on real graphs);
    exceeding ``max_rounds`` raises instead of silently returning a
    non-fixpoint (oracles unroll exactly max_rounds, so the raise keeps
    the two engines honest with each other).

    [reference: none — the reference has no graph surface; engine
    breadth row, same family as connected_components/sssp]
    """
    from pyspark.sql import Observation

    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # the per-round survivor tally rides each checkpoint action as an
    # observed metric — one job per round instead of two
    obs0 = Observation()
    alive = (
        deg.filter(F.col("deg") >= k)
        .select(F.col("src").alias("node"))
        .observe(obs0, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n_alive = int(obs0.get["n"])
    for _ in range(max_rounds):
        deg = (
            edges.join(alive.select(F.col("node").alias("src")), "src")
            .join(alive.select(F.col("node").alias("dst")), "dst")
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        obs_r = Observation()
        nxt = (
            deg.filter(F.col("deg") >= k)
            .select(F.col("src").alias("node"))
            .observe(obs_r, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        n_nxt = int(obs_r.get["n"])
        if n_nxt == n_alive:
            alive = nxt
            break
        alive, n_alive = nxt, n_nxt
        if n_alive == 0:
            break
    else:
        raise RuntimeError(
            f"kcore did not converge in {max_rounds} peeling rounds"
        )
    # final in-core degrees for the surviving set
    return (
        edges.join(alive.select(F.col("node").alias("src")), "src")
        .join(alive.select(F.col("node").alias("dst")), "dst")
        .groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
