"""Weighted SSSP frontier relaxation (operators/graph.py:sssp)."""

import pytest

from station_data_ingestion_spark.operators.graph import sssp


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, wt long")


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node long")


def test_weighted_path_beats_fewer_hops(spark):
    # 0->3 direct costs 10; 0->1->2->3 costs 3+3+3=9: weights matter
    e = _edges(
        spark, [(0, 3, 10), (0, 1, 3), (1, 2, 3), (2, 3, 3)]
    )
    out = {
        r["node"]: r["dist"]
        for r in sssp(e, _seeds(spark, [0]), cap=100).collect()
    }
    assert out == {0: 0, 1: 3, 2: 6, 3: 9}


def test_multi_source_takes_min_over_seeds(spark):
    e = _edges(spark, [(0, 5, 9), (1, 5, 2), (5, 6, 1)])
    out = {
        r["node"]: r["dist"]
        for r in sssp(e, _seeds(spark, [0, 1]), cap=100).collect()
    }
    assert out[5] == 2 and out[6] == 3


def test_cycle_terminates_and_cap_prunes(spark):
    # 3-cycle plus a spur priced above the cap
    e = _edges(spark, [(0, 1, 2), (1, 2, 2), (2, 0, 2), (2, 9, 50)])
    out = {
        r["node"]: r["dist"]
        for r in sssp(e, _seeds(spark, [0]), cap=20).collect()
    }
    assert out == {0: 0, 1: 2, 2: 4}  # node 9 pruned, unreachable absent


def test_later_round_can_improve_settled_node(spark):
    # node 2 is settled at 8 via the direct hop, then IMPROVED to 6 via
    # the longer chain — pure BFS visited-set logic would miss this
    e = _edges(spark, [(0, 2, 8), (0, 1, 1), (1, 3, 1), (3, 4, 1), (4, 2, 3)])
    out = {
        r["node"]: r["dist"]
        for r in sssp(e, _seeds(spark, [0]), cap=100).collect()
    }
    assert out[2] == 6


def test_nonconvergence_guard_raises(spark):
    e = _edges(spark, [(0, 1, 1), (1, 0, 1), (0, 2, 1), (2, 0, 1)])
    with pytest.raises(RuntimeError, match="did not converge"):
        sssp(e, _seeds(spark, [0]), cap=1000, max_rounds=1)
