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


MERGE_BUCKET_COLS = ["station_id", "date"]


def write_merge_target(
    df: DataFrame,
    table_name: str,
    n_buckets: int,
    bucket_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist an observation table bucketed for shuffle-free merges.

    The ingestion merge joins on the full composite key
    ``[datatype, period, date, fill, station_id, *extras]``
    [reference: src/tapis_direct_driver.py:72-73], but within one job the
    datatype/period/fill/extras columns of the update side are lit()
    constants, so Catalyst folds them into filter predicates and the
    *effective* equi-join keys are (date, station_id). Bucketing the
    target on exactly those columns means:

    - the multi-match count window needs no Exchange (the bucket hash
      clusters every composite key), and
    - the full-outer merge join reuses the scan's partitioning, so ONLY
      the (small, per-job) update side shuffles -- at 100 TB the target
      scan never re-shuffles, which is the difference between a merge
      bounded by the daily file and one bounded by the whole table.

    Sorting within buckets keeps files key-ordered for bucket pruning
    and cheaper in-partition sorts.
    """
    cols = MERGE_BUCKET_COLS if bucket_cols is None else bucket_cols
    write_bucketed(df, table_name, cols, n_buckets, sort=True, mode=mode)


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
