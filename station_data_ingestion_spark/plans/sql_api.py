"""SQL entry point: ANSI SQL over the engine's registered tables.

The reference has no SQL surface [reference: SURVEY §2.0 -- no parser,
no dialect]; the engine inherits a full one from Spark's parser +
Catalyst. This module is the thin veneer: register the corpus tables
(and any ingested observation table) as temp views, then run SQL
strings. Most of the DuckDB oracle strings in the query registry are
plain ANSI and run unchanged on Spark SQL -- the test suite uses that
overlap as a cross-dialect consistency check.

Scale notes: views are lazy; a SQL query plans through the same
Catalyst pipeline as the DataFrame programs (predicate pushdown,
partition pruning, AQE all apply).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from station_data_ingestion_spark.queries.registry import TABLES, load


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    """Register the corpus parquet tables as temp views (lazy scans).

    Goes through registry.load so per-table normalizations (events.ts
    nanos -> micros timestamp) match the DataFrame query surface.
    """
    for name, df in load(spark, sf_dir, *tables).items():
        df.createOrReplaceTempView(name)


def register_obs_table(
    spark: SparkSession, table_path: str, view_name: str = "observations"
) -> None:
    """Register an ingested observation table for SQL access."""
    spark.read.parquet(table_path).createOrReplaceTempView(view_name)


def run_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Run one SQL statement against the registered views."""
    return spark.sql(sql)
