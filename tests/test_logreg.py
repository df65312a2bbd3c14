"""Distributed IRLS logistic regression (operators/logreg.py).

The 1-feature path is certified cross-engine by the DuckDB oracle of
q:stats_logreg_irls_newton; these tests certify (a) statistical sanity
(known coefficients recovered on synthetic logistic data) and (b) the
k > 2 numpy-solve path against an EXACT numpy replica that reproduces
the operator's quantization bit-for-bit (same 2^-30 sigmoid grid, same
2^-20 integer moment terms, same half-away-from-zero rounding, same
left-associated operation order).
"""

import math

import numpy as np
from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.logreg import (
    PROB_FLOOR,
    PROB_SCALE,
    TERM_SCALE,
    logreg_irls_fit,
)


def _round_half_away(t: np.ndarray) -> np.ndarray:
    # Spark's ROUND on doubles is HALF_UP (away from zero); np.round is
    # half-even, which differs on the exact-.5 dyadic terms step 1
    # produces. floor(t + .5) / ceil(t - .5) matches HALF_UP exactly on
    # every value the pipeline can produce (dyadic rationals).
    return np.where(t >= 0, np.floor(t + 0.5), np.ceil(t - 0.5))


def _replica_irls(xs: list[np.ndarray], y: np.ndarray, steps: int):
    """Exact replica of logreg_irls_fit's math in numpy doubles."""
    feats = [np.ones_like(y)] + xs
    k = len(feats)
    betas = [0.0] * k
    for _ in range(steps):
        eta = None
        for b, f in zip(betas, feats):
            term = b * f
            eta = term if eta is None else eta + term
        p = np.round((1.0 / (1.0 + np.exp(-eta))) * PROB_SCALE) / PROB_SCALE
        p = np.minimum(np.maximum(p, PROB_FLOOR), 1.0 - PROB_FLOOR)
        w = p * (1.0 - p)
        z = eta + (y - p) / w
        a = np.zeros((k, k))
        bvec = np.zeros(k)
        for i in range(k):
            for j in range(i, k):
                s = _round_half_away(w * feats[i] * feats[j] * TERM_SCALE)
                a[i][j] = a[j][i] = s.astype(np.int64).sum() / TERM_SCALE
            sz = _round_half_away(w * feats[i] * z * TERM_SCALE)
            bvec[i] = sz.astype(np.int64).sum() / TERM_SCALE
        betas = [float(v) for v in np.linalg.solve(a, bvec)]
    return betas


def _logistic_frame(spark, n=4000, seed=11):
    rng = np.random.RandomState(seed)
    # dyadic features (denominator <= 2^6) keep step-1 moments
    # integer-exact, mirroring the gate query's l_quantity/64 choice
    x1 = rng.randint(1, 51, n) / 64.0
    x2 = rng.randint(0, 32, n) / 32.0
    eta = -1.0 + 3.0 * x1 - 2.0 * x2
    y = (rng.uniform(size=n) < 1.0 / (1.0 + np.exp(-eta))).astype(float)
    rows = [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)]
    return spark.createDataFrame(rows, "x1 double, x2 double, y double"), (
        x1,
        x2,
        y,
    )


def test_k3_matches_exact_numpy_replica(spark):
    df, (x1, x2, y) = _logistic_frame(spark)
    fit = logreg_irls_fit(df, ["x1", "x2"], "y", steps=3)
    want = _replica_irls([x1, x2], y, steps=3)
    assert fit["n"] == len(y)
    for got, exp in zip(fit["betas"], want):
        assert abs(got - exp) < 1e-12, (fit["betas"], want)


def test_recovers_known_coefficients(spark):
    df, (x1, x2, y) = _logistic_frame(spark, n=20000, seed=3)
    fit = logreg_irls_fit(df, ["x1", "x2"], "y", steps=8)
    b0, b1, b2 = fit["betas"]
    # 20k rows: MLE of (-1, 3, -2) within loose sampling tolerance
    assert abs(b0 - (-1.0)) < 0.35, fit
    assert abs(b1 - 3.0) < 0.5, fit
    assert abs(b2 - (-2.0)) < 0.5, fit


def test_single_feature_cramer_path(spark):
    df = spark.range(1000).select(
        ((F.col("id") % 50 + 1) / F.lit(64.0)).alias("x"),
        F.when(F.col("id") % 50 >= 25, 1.0).otherwise(0.0).alias("y"),
    )
    fit = logreg_irls_fit(df, ["x"], "y", steps=4)
    # y = 1 iff x >= 26/64: a steep positive slope, negative intercept
    assert fit["betas"][1] > 0
    assert fit["betas"][0] < 0
    assert all(math.isfinite(b) for b in fit["betas"])
