"""Mergeable frequency sketch tests (operators/sketches.py)."""

from collections import Counter

import numpy as np

from station_data_ingestion_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    space_saving_topk,
)


def _skewed_rows(n=20_000, seed=3):
    rng = np.random.default_rng(seed)
    # zipf-ish: a few heavy keys, long light tail
    keys = [f"k{int(v)}" for v in rng.zipf(1.4, size=n) % 500]
    return keys


def test_cms_one_sided_and_bounded(spark):
    keys = _skewed_rows()
    truth = Counter(keys)
    df = spark.createDataFrame([(k,) for k in keys], "k string").repartition(8)
    d, w = 5, 2048
    m = cms_build(df, "k", d=d, w=w)
    assert int(m[0].sum()) == len(keys), "each row increments every sketch row once"
    probe = list(truth)[:200]
    ests = cms_estimate(m, probe, d=d, w=w)
    eps_n = (np.e / w) * len(keys)
    for key, est in zip(probe, ests):
        assert est >= truth[key], "count-min NEVER undercounts"
        assert est <= truth[key] + eps_n, (key, est, truth[key], eps_n)


def test_cms_partitioning_invariant(spark):
    keys = _skewed_rows(n=5000, seed=9)
    a = cms_build(
        spark.createDataFrame([(k,) for k in keys], "k string").repartition(3),
        "k",
    )
    b = cms_build(
        spark.createDataFrame([(k,) for k in keys], "k string").repartition(11),
        "k",
    )
    assert (a == b).all(), "elementwise-add merge must be partitioning-invariant"


def test_space_saving_finds_all_heavy_hitters(spark):
    # 6 planted heavy keys clearly above N/k, noise tail below it
    rng = np.random.default_rng(17)
    heavy = {f"H{i}": 1500 + 100 * i for i in range(6)}
    rows = [k for k, c in heavy.items() for _ in range(c)]
    rows += [f"noise{int(x)}" for x in rng.integers(0, 2000, size=8000)]
    rng.shuffle(rows)
    truth = Counter(rows)
    n, k = len(rows), 64
    df = spark.createDataFrame([(r,) for r in rows], "k string").repartition(8)
    summary = space_saving_topk(df, "k", k=k)
    items = {item: (c, o) for item, c, o in summary}
    assert len(summary) <= k
    for hk, cnt in heavy.items():
        assert cnt > n / k, "test corpus must make the guarantee applicable"
        assert hk in items, f"heavy hitter {hk} missing — guarantee broken"
        est, over = items[hk]
        assert est >= truth[hk] >= est - over, (hk, est, over, truth[hk])
    # heavy keys dominate the top of the summary
    top6 = [item for item, _, _ in summary[:6]]
    assert set(top6) == set(heavy)


def test_space_saving_with_total_counts_rows(spark):
    """with_total=True returns the exact row count from the same scan."""
    rows = _skewed_rows(n=5000)
    df = spark.createDataFrame([(r,) for r in rows], "k string").repartition(6)
    items, n = space_saving_topk(df, "k", k=16, with_total=True)
    assert n == len(rows)
    assert items == space_saving_topk(df, "k", k=16)
