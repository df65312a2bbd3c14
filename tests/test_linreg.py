"""Distributed OLS normal equations (operators/linreg.py)."""

import math

from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.linreg import fit_ols


def test_exact_linear_relation_recovered(spark):
    df = spark.range(200).select(
        F.col("id").cast("double").alias("x1"),
        (F.col("id") % 7).cast("double").alias("x2"),
    ).withColumn("y", 3.0 * F.col("x1") - 2.5 * F.col("x2") + 11.0)
    fit = fit_ols(df, "y", ["x1", "x2"])
    assert math.isclose(fit["coef"]["x1"], 3.0, abs_tol=1e-9)
    assert math.isclose(fit["coef"]["x2"], -2.5, abs_tol=1e-9)
    assert math.isclose(fit["intercept"], 11.0, abs_tol=1e-7)
    assert math.isclose(fit["r2"], 1.0, abs_tol=1e-12)
    assert fit["n"] == 200


def test_matches_numpy_lstsq_with_noise(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    x1 = rng.uniform(0, 10, 500)
    x2 = rng.uniform(-5, 5, 500)
    y = 2.0 * x1 + 0.5 * x2 + 4.0 + rng.normal(0, 1.0, 500)
    rows = [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    fit = fit_ols(df, "y", ["x1", "x2"])
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta = np.linalg.lstsq(X, y, rcond=None)[0]
    assert math.isclose(fit["intercept"], beta[0], rel_tol=1e-8)
    assert math.isclose(fit["coef"]["x1"], beta[1], rel_tol=1e-8)
    assert math.isclose(fit["coef"]["x2"], beta[2], rel_tol=1e-8)
    assert 0.0 < fit["r2"] < 1.0


def test_ridge_shrinks_toward_zero(spark):
    df = spark.range(100).select(
        F.col("id").cast("double").alias("x1")
    ).withColumn("y", 5.0 * F.col("x1"))
    plain = fit_ols(df, "y", ["x1"])
    shrunk = fit_ols(df, "y", ["x1"], ridge=1e4)
    assert abs(shrunk["coef"]["x1"]) < abs(plain["coef"]["x1"])
    assert abs(shrunk["coef"]["x1"]) > 0.0
