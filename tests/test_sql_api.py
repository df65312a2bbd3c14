"""SQL entry point: cross-dialect consistency.

Every oracle SQL string that parses under Spark SQL must produce the
same values as its DataFrame twin. (DuckDB-only dialect -- list_*,
strftime, UNNEST, quantile_cont -- is skipped; Spark SQL parses numeric
literals like 10000.0 as DECIMAL where the DataFrame API uses double,
so values compare after numeric normalization.)
"""

import math
from decimal import Decimal

import pytest

from station_data_ingestion_spark.plans.sql_api import (
    register_obs_table,
    register_tables,
    run_sql,
)
from station_data_ingestion_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    return v


def _key(row):
    # quantize floats in the sort key so a last-ulp difference between
    # the two plans cannot order the row lists differently and mispair
    # rows at the _same() comparison
    return tuple(
        f"{v:.6e}" if isinstance(v, float) else repr(v)
        for v in (_norm(x) for x in row)
    )


def _same(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def test_oracle_sql_runs_on_spark_where_dialect_allows(spark):
    register_tables(spark, SF)
    ran, skipped = [], []
    for name, q in QUERIES.items():
        if not q.oracle:
            continue
        try:
            # analysis (parse/resolve) happens at spark.sql(): a failure
            # here is DuckDB-only dialect and skips the query
            df = run_sql(spark, q.oracle)
        except Exception:
            skipped.append(name)
            continue
        # but a query that ANALYZES fine must also RUN: an execution
        # failure is a real regression, not dialect
        sql_rows = df.collect()
        df_rows = q.fn(spark, SF).collect()
        assert len(sql_rows) == len(df_rows), name
        a = sorted(([_norm(v) for v in r] for r in sql_rows), key=_key)
        b = sorted(([_norm(v) for v in r] for r in df_rows), key=_key)
        for ra, rb in zip(a, b):
            assert len(ra) == len(rb) and all(
                _same(x, y) for x, y in zip(ra, rb)
            ), (name, ra, rb)
        ran.append(name)
    # the ANSI core of the surface must stay Spark-SQL-runnable
    assert len(ran) >= 35, (len(ran), skipped)
    for must in (
        "q1_pricing_summary",
        "q6_forecast_revenue",
        "q13_customer_distribution",
        "left_outer_order_counts",
        "setop_union_buyers",
        "rollup_flag_status",
    ):
        assert must in ran, (must, skipped)


def test_register_obs_table(spark, tmp_path):
    df = spark.createDataFrame(
        [("s1", "2022-03-01", 1.5)], "station_id string, date string, value double"
    )
    path = str(tmp_path / "obs")
    df.write.parquet(path)
    register_obs_table(spark, path, "obs_v")
    got = run_sql(spark, "SELECT station_id, value FROM obs_v").collect()
    assert [(r.station_id, r.value) for r in got] == [("s1", 1.5)]
