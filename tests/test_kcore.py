"""kcore operator: peeling fixpoint vs a reference implementation."""

import pytest
from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.graph import kcore


def _edges_df(spark, pairs):
    undirected = list(pairs) + [(b, a) for a, b in pairs]
    return spark.createDataFrame(undirected, "src long, dst long")


def _kcore_ref(pairs, k):
    import collections

    adj = collections.defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    alive = set(adj)
    while True:
        drop = {n for n in alive if sum(1 for m in adj[n] if m in alive) < k}
        if not drop:
            break
        alive -= drop
    return {
        n: sum(1 for m in adj[n] if m in alive) for n in alive
    }


def test_kcore_matches_reference_peeling(spark):
    # a 4-clique (core for k=3) + a tail path that must peel away
    pairs = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # clique
        (4, 5), (5, 6), (6, 7),  # tail
        (7, 8), (8, 9), (9, 7),  # triangle, survives k=2 not k=3
    ]
    for k in (2, 3):
        got = {
            r["node"]: r["deg"]
            for r in kcore(_edges_df(spark, pairs), k=k).collect()
        }
        assert got == _kcore_ref(pairs, k), f"k={k}"


def test_kcore_empty_core_and_round_cap(spark):
    pairs = [(i, i + 1) for i in range(10)]  # path: 2-core is empty
    assert kcore(_edges_df(spark, pairs), k=2).count() == 0
    # a long path peels one node per side per round; a tiny cap raises
    with pytest.raises(RuntimeError, match="converge"):
        kcore(_edges_df(spark, [(i, i + 1) for i in range(30)]), k=2,
              max_rounds=2)
