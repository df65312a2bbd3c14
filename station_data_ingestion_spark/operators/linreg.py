"""Distributed ordinary least squares via normal equations.

Closed-form multiple linear regression as ONE aggregation pass: Spark
computes the k x k covariance matrix of the features plus the
feature-target covariances with built-in ``covar_pop`` (a numerically
stable one-pass merge aggregate — the same updateable (n, mean, M2)
sketch DuckDB and NumPy use), and the driver solves the k x k system.

100 TB shape: the data-plane cost is a single whole-stage-codegen scan
with map-side partial aggregation; the shuffle carries ONE row of
k(k+1)/2 + 2k + 2 scalars per partial, and the driver's solve is O(k^3)
on a k x k matrix — for k features this is microseconds and never grows
with row count. This is exactly how MLlib's ``WeightedLeastSquares``
"normal" solver is laid out; re-derived here declaratively so the same
statistics are reusable (the covariance matrix doubles as a correlation
/ multicollinearity audit). Iterative gradient descent would pay one
full scan PER STEP — the closed form pays one, total.

Ridge regression falls out for free: ``ridge=lambda`` adds lambda*I to
the centered Gram matrix driver-side (penalizing slopes, not the
intercept) — zero extra data passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_ols(
    df: DataFrame,
    y: str,
    xs: list[str] | tuple[str, ...],
    ridge: float = 0.0,
) -> dict:
    """Fit y ~ intercept + xs. Returns {"n", "intercept", "coef":
    {x: b}, "r2"}. One aggregation pass; driver solves k x k."""
    import numpy as np

    xs = list(xs)
    k = len(xs)
    aggs = [F.count(F.lit(1)).alias("n"), F.avg(y).alias("_my")]
    aggs += [F.avg(c).alias(f"_m{i}") for i, c in enumerate(xs)]
    aggs += [F.var_pop(y).alias("_vy")]
    for i in range(k):
        for j in range(i, k):
            aggs.append(F.covar_pop(xs[i], xs[j]).alias(f"_c{i}_{j}"))
        aggs.append(F.covar_pop(xs[i], y).alias(f"_cy{i}"))
    row = df.agg(*aggs).first()

    C = np.empty((k, k))
    for i in range(k):
        for j in range(i, k):
            C[i, j] = C[j, i] = row[f"_c{i}_{j}"]
    cy = np.array([row[f"_cy{i}"] for i in range(k)])
    if ridge:
        C = C + ridge * np.eye(k)
    beta = np.linalg.solve(C, cy)
    mx = np.array([row[f"_m{i}"] for i in range(k)])
    intercept = float(row["_my"] - beta @ mx)
    vy = row["_vy"]
    r2 = float(beta @ cy / vy) if vy else float("nan")
    return {
        "n": int(row["n"]),
        "intercept": intercept,
        "coef": {c: float(b) for c, b in zip(xs, beta)},
        "r2": r2,
    }


def ols_terms_df(spark, fit: dict, decimals: int = 6) -> DataFrame:
    """Long-format (term, value) frame of a fit, rounded for
    engine-independent comparison (last-bit accumulation drift is below
    the rounding; see registry determinism rules)."""
    rows = [("intercept", round(fit["intercept"], decimals))]
    rows += [(c, round(b, decimals)) for c, b in sorted(fit["coef"].items())]
    rows.append(("r2", round(fit["r2"], decimals)))
    return spark.createDataFrame(rows, "term string, value double")
