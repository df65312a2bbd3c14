"""Connected components: star contraction vs union-find ground truth."""

import random

import pytest

from station_data_ingestion_spark.operators.graph import connected_components


def _union_find_labels(edges):
    """Ground truth: component-min label per node, pure Python."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for a, b in edges:
        union(a, b)
    groups = {}
    for n in parent:
        groups.setdefault(find(n), []).append(n)
    out = {}
    for members in groups.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _check(spark, edges, **kw):
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.node: r.rep for r in connected_components(df, **kw).collect()}
    assert got == _union_find_labels(edges)


def test_cc_path_graph_depth_far_beyond_typical(spark):
    """A 120-node chain: plain propagation would need ~120 rounds; star
    contraction collapses it in O(log n)."""
    edges = [(i, i + 1) for i in range(120)]
    random.Random(7).shuffle(edges)
    stats = {}
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.node: r.rep for r in connected_components(df, stats=stats).collect()}
    assert got == {i: 0 for i in range(121)}
    assert stats["rounds"] <= 12  # log-ish, NOT O(diameter)=120


def test_cc_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for trial in range(4):
        n = rng.randint(10, 60)
        edges = [
            (rng.randrange(n) * 10, rng.randrange(n) * 10)
            for _ in range(rng.randint(5, 2 * n))
        ]
        edges = [(a, b) for a, b in edges if a != b] or [(0, 10)]
        _check(spark, edges)


def test_cc_two_node_and_triangle(spark):
    _check(spark, [(5, 3)])
    _check(spark, [(1, 2), (2, 3), (1, 3)])


def test_cc_duplicate_and_reversed_edges(spark):
    _check(spark, [(1, 2), (2, 1), (1, 2), (4, 3), (3, 4)])


def test_cc_reliable_checkpoint_dir(spark, tmp_path):
    import os

    ckpt = str(tmp_path / "ckpt")
    edges = [(i, i + 1) for i in range(30)] + [(100, 101)]
    _check(spark, edges, checkpoint_dir=ckpt)
    # reliable checkpoints actually landed on disk
    found = []
    for root, _dirs, files in os.walk(ckpt):
        found.extend(files)
    assert found, "checkpoint dir should contain materialized RDD blocks"


def test_cc_nonconvergence_guard(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_rounds=0)
