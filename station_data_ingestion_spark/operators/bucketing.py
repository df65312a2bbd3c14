"""Bucketed tables: shuffle-free co-located joins for repeated big joins.

A fact table joined on the same key by many queries should be written
bucketed on that key once; every subsequent join (against another table
bucketed the same way) then runs with ZERO exchanges -- the scan itself
is the partitioning. At 100 TB this turns the dominant shuffle of a
fact-fact join into plain co-located map work.

Spark's native bucketing (Hive-less) requires the table catalog, so
writes go through ``saveAsTable`` into the session warehouse; readers use
``spark.table``. Bucket pruning additionally applies equality filters on
the bucket column to skip whole buckets at scan time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist df as a bucketed (and bucket-sorted) parquet table.

    Sorting within buckets lets sort-merge joins skip their sort step
    entirely (the scan is already sorted on the join key).
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables; the plan must contain no Exchange.

    Callers are responsible for having bucketed both tables on `on` with
    the same bucket count (assert_no_exchange in tests verifies).
    """
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
