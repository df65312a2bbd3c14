"""Statistical-modeling queries: closed-form regression under the gate.

The distributed-OLS operator (operators/linreg.py) is certified two
independent ways: the two-feature fit against DuckDB running the SAME
closed form spelled out in SQL (Cramer's rule over covariances), and the
single-feature fit against DuckDB's NATIVE ``regr_slope`` /
``regr_intercept`` / ``regr_r2`` aggregates — an implementation we
didn't write, so a shared algebra bug can't self-certify. Measured
cross-engine agreement is ~1e-11 absolute on sf0.01 (stable one-pass
covariance sketches on both sides); results round to 6 decimals, seven
orders of magnitude above the drift.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.linreg import fit_ols, ols_terms_df
from station_data_ingestion_spark.queries.registry import load, query


@query(
    "stats_ols_two_feature",
    """
WITH s AS (
  SELECT covar_pop(l_quantity, l_quantity)      AS c11,
         covar_pop(l_quantity, l_discount)      AS c12,
         covar_pop(l_discount, l_discount)      AS c22,
         covar_pop(l_quantity, l_extendedprice) AS c1y,
         covar_pop(l_discount, l_extendedprice) AS c2y,
         var_pop(l_extendedprice)               AS vy,
         avg(l_quantity) AS m1, avg(l_discount) AS m2,
         avg(l_extendedprice) AS my
  FROM lineitem
), b AS (
  SELECT (c22*c1y - c12*c2y) / (c11*c22 - c12*c12) AS b1,
         (c11*c2y - c12*c1y) / (c11*c22 - c12*c12) AS b2, *
  FROM s
)
SELECT 'intercept' AS term, ROUND(my - b1*m1 - b2*m2, 6) AS value FROM b
UNION ALL SELECT 'l_discount', ROUND(b2, 6) FROM b
UNION ALL SELECT 'l_quantity', ROUND(b1, 6) FROM b
UNION ALL SELECT 'r2', ROUND((b1*c1y + b2*c2y) / vy, 6) FROM b
""",
)
def stats_ols_two_feature(spark, sf_dir):
    """Multiple linear regression l_extendedprice ~ l_quantity +
    l_discount by distributed normal equations: ONE codegen aggregation
    pass emits the covariance matrix (k(k+1)/2 + 2k + 2 scalars, map-side
    partials), the driver solves k x k. No per-step scans, no Python
    workers, driver state O(k^2) — row count never touches anything but
    the single scan. Oracle: the same closed form in SQL (Cramer)."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    fit = fit_ols(li, "l_extendedprice", ["l_quantity", "l_discount"])
    return ols_terms_df(spark, fit)


@query(
    "stats_ols_single_native",
    """
SELECT 'intercept' AS term,
       ROUND(regr_intercept(n_chars, n_words), 6) AS value FROM d
UNION ALL SELECT 'n_words', ROUND(regr_slope(n_chars, n_words), 6) FROM d
UNION ALL SELECT 'r2', ROUND(regr_r2(n_chars, n_words), 6) FROM d
""".replace(
        "FROM d",
        "FROM (SELECT n_chars, "
        "length(text) - length(replace(text, ' ', '')) + 1 AS n_words "
        "FROM documents) d",
    ),
)
def stats_ols_single_native(spark, sf_dir):
    """Single-feature fit (document char count ~ word count, a
    near-perfectly-linear pair) certified against DuckDB's NATIVE
    regr_slope/regr_intercept/regr_r2 — an independent implementation,
    not our own algebra restated. Word count is derived identically on
    both sides (separator count + 1) so the regression inputs match
    exactly."""
    d = load(spark, sf_dir, "documents")["documents"].select(
        "n_chars",
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
        ).alias("n_words"),
    )
    fit = fit_ols(d, "n_chars", ["n_words"])
    return ols_terms_df(spark, fit)
