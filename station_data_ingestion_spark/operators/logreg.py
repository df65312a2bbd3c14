"""Distributed logistic regression: IRLS (Newton-Raphson) with
exactly-quantized moment aggregation.

Each IRLS step is ONE distributed aggregation pass — per row the JVM
computes eta = beta . x, the working weight w = p(1-p) and working
response z = eta + (y-p)/w, then sums the k(k+3)/2 weighted moments
(w*xi*xj upper triangle and w*xi*z). The normal-equations solve is a
k x k driver-side step (k = features + intercept, never row count), so
at 100 TB the cost per step is one map-side-combined agg over the fact
table and a constant-size collect: the same shape as the closed-form
OLS operator (operators/linreg.py), iterated.

Cross-engine determinism (the gate query's DuckDB oracle replays the
identical algorithm in SQL) is engineered, not hoped for:

- the sigmoid is quantized to 2^-30 grid points (round half-away-from-
  zero, matching both Spark's HALF_UP and C round()) BEFORE w/z are
  derived, so the only transcendental (exp) contributes one rounding
  decision per row; everything downstream is exact dyadic arithmetic.
- every per-row moment term is rounded to integer 2^-20 units and
  summed as BIGINT — integer addition is associative, so partitioning
  and engine cannot perturb the sums. Powers of two (not 10^k) make
  the step-1 terms (beta = 0 => w = 1/4, z = 4y-2) EXACT integers with
  zero rounding decisions when features are dyadic rationals.
- for one feature the 2x2 solve is written in closed form (Cramer)
  with the identical operation tree the SQL oracle uses, so the floats
  agree bit-for-bit; k > 2 uses numpy.linalg.solve and is certified by
  an exact numpy-replica pytest instead (tests/test_logreg.py).

A single rounded term differing by one 2^-20 unit (possible only if an
engine's exp() lands a row within ~1e-16 of a quantization boundary)
shifts a moment by ~1/(n * 2^20) relative — far below the 6-decimal
output rounding, so the gate stays stable at any SF.

[reference: the reference engine ships no model-fitting operator; this
extends SURVEY §2.9's stats family the way Spark MLlib users expect,
but as pure DataFrame aggregation with a second-engine oracle.]
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TERM_SCALE = float(1 << 20)
PROB_SCALE = float(1 << 30)
PROB_FLOOR = 1.0 / 1048576.0  # clamp keeps w = p(1-p) > 0


def _quant(col):
    """ROUND(col * 2^20) as bigint — the associative-sum moment term."""
    return F.round(col * F.lit(TERM_SCALE)).cast("long")


def logreg_irls_fit(
    df: DataFrame, x_cols: list[str], y_col: str, steps: int = 2
) -> dict:
    """Fit logistic regression of y (0/1) on x_cols via `steps` IRLS
    iterations from beta = 0. Returns {"betas": [b0, b1, ...], "n": n}
    with betas[0] the intercept. One agg + one k x k solve per step."""
    y = F.col(y_col).cast("double")
    feats = [F.lit(1.0)] + [F.col(c).cast("double") for c in x_cols]
    k = len(feats)
    betas = [0.0] * k
    n = 0
    for _ in range(steps):
        eta = None
        for b, f in zip(betas, feats):
            term = F.lit(float(b)) * f
            eta = term if eta is None else eta + term
        p = F.round((F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))) * F.lit(PROB_SCALE)) / F.lit(PROB_SCALE)
        p = F.least(
            F.greatest(p, F.lit(PROB_FLOOR)), F.lit(1.0) - F.lit(PROB_FLOOR)
        )
        w = p * (F.lit(1.0) - p)
        z = eta + (y - p) / w
        aggs = [F.count(F.lit(1)).alias("n")]
        for i in range(k):
            for j in range(i, k):
                aggs.append(
                    F.sum(_quant(w * feats[i] * feats[j])).alias(f"a_{i}_{j}")
                )
        for i in range(k):
            aggs.append(F.sum(_quant(w * feats[i] * z)).alias(f"b_{i}"))
        row = df.agg(*aggs).collect()[0]
        n = row["n"]
        a = [[0.0] * k for _ in range(k)]
        bvec = [0.0] * k
        for i in range(k):
            for j in range(i, k):
                v = row[f"a_{i}_{j}"] / TERM_SCALE
                a[i][j] = v
                a[j][i] = v
            bvec[i] = row[f"b_{i}"] / TERM_SCALE
        if k == 2:
            # closed-form 2x2 (Cramer) — the op tree the SQL oracle
            # mirrors verbatim, so doubles agree bit-for-bit
            det = a[0][0] * a[1][1] - a[0][1] * a[0][1]
            betas = [
                (a[1][1] * bvec[0] - a[0][1] * bvec[1]) / det,
                (a[0][0] * bvec[1] - a[0][1] * bvec[0]) / det,
            ]
        else:
            import numpy as np

            betas = [
                float(v)
                for v in np.linalg.solve(
                    np.array(a, dtype=np.float64),
                    np.array(bvec, dtype=np.float64),
                )
            ]
    return {"betas": betas, "n": int(n)}
