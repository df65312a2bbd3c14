"""Table maintenance: small-file compaction for merge-heavy tables.

Each merge run rewrites a (datatype, period) slice with one file per
shuffle partition (plans/runner.py:_overwrite_slice); daily runs over
years of slices accumulate thousands of small files, and at 100 TB the
scan's task-per-file scheduling and footer reads become the bottleneck
long before the bytes do. Compaction rewrites a slice into
ceil(bytes / target_file_bytes) files.

The reference has no table-maintenance analog (its store is a remote
document DB [reference: src/modules/ingestion_handler.py:122-136]); this
is engine surface required by the parquet-table design. Transactional
formats (Delta OPTIMIZE, Iceberg rewrite_data_files) replace this at
deploy time; the operator keeps the same contract.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def slice_bytes(df: DataFrame) -> int:
    """Total on-disk bytes of the files backing a DataFrame's scan.

    Uses the Hadoop FileSystem API so it works on any supported
    filesystem, not just file://.
    """
    spark = df.sparkSession
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    total = 0
    for uri in df.inputFiles():
        path = jvm.org.apache.hadoop.fs.Path(uri)
        fs = path.getFileSystem(conf)
        total += fs.getFileStatus(path).getLen()
    return total


def compact_slice(
    spark: SparkSession,
    table_path: str,
    partition_values: dict[str, str],
    partition_cols: tuple[str, ...] = ("datatype", "period"),
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> int:
    """Rewrite one partition slice into size-targeted files.

    Returns the number of output files written. Uses coalesce (no
    shuffle): compaction is pure IO, so the narrow merge of read splits
    is strictly cheaper than a round-robin repartition. Only the
    selected slice is rewritten (dynamic partition overwrite), other
    slices' files are untouched.
    """
    df = spark.read.parquet(table_path)
    pred = None
    for c in partition_cols:
        clause = F.col(c) == F.lit(partition_values[c])
        pred = clause if pred is None else (pred & clause)
    sliced = df.filter(pred) if pred is not None else df
    n_files = max(1, math.ceil(slice_bytes(sliced) / target_file_bytes))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            sliced.coalesce(n_files)
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(table_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return n_files
