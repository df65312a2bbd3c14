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


def _parquet_statuses(spark: SparkSession, dir_path: str) -> list:
    """Recursive Hadoop FileStatus list of the parquet files under a dir.

    Uses the Hadoop FileSystem API so it works on any supported
    filesystem, not just file://. (DataFrame.inputFiles() is NOT usable
    here: on a path-based parquet read it lists the whole table's files
    regardless of partition filters, which would inflate the size by the
    number of slices.)
    """
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(dir_path)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return []
    out = []
    it = fs.listFiles(path, True)
    while it.hasNext():
        status = it.next()
        if status.getPath().getName().endswith(".parquet"):
            out.append(status)
    return out


def partition_dir_bytes(spark: SparkSession, dir_path: str) -> int:
    """Total parquet bytes under one partition directory (recursive)."""
    return sum(s.getLen() for s in _parquet_statuses(spark, dir_path))


def list_partition_values(
    spark: SparkSession,
    table_path: str,
    partition_cols: tuple[str, ...] = ("datatype", "period"),
) -> list[dict[str, str]]:
    """Enumerate the table's partition-value combinations from its
    directory layout (driver-side Hadoop listing, no Spark job)."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return []

    def walk(path, depth):
        if depth == len(partition_cols):
            return [{}]
        out = []
        for st in fs.listStatus(path):
            name = st.getPath().getName()
            if not st.isDirectory() or "=" not in name:
                continue
            col, val = name.split("=", 1)
            if col != partition_cols[depth]:
                continue
            for rest in walk(st.getPath(), depth + 1):
                out.append({col: val, **rest})
        return out

    return walk(root, 0)


def compact_table(
    spark: SparkSession,
    table_path: str,
    partition_cols: tuple[str, ...] = ("datatype", "period"),
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> dict[tuple[str, ...], int]:
    """Compact every partition slice of the table; returns files written
    per slice. Slices compact independently (each is its own job), so a
    failure mid-way leaves untouched slices valid."""
    results: dict[tuple[str, ...], int] = {}
    for values in list_partition_values(spark, table_path, partition_cols):
        n = compact_slice(
            spark, table_path, values, partition_cols, target_file_bytes
        )
        results[tuple(values[c] for c in partition_cols)] = n
    return results


def compact_slice(
    spark: SparkSession,
    table_path: str,
    partition_values: dict[str, str],
    partition_cols: tuple[str, ...] = ("datatype", "period"),
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> int:
    """Rewrite one partition slice into size-targeted files.

    Returns the number of parquet files actually present in the slice
    after the rewrite (coalesce cannot exceed the read's partition
    count, so the requested file count is a ceiling, not a promise).
    Uses coalesce (no shuffle): compaction is pure IO, so the narrow
    merge of read splits is strictly cheaper than a round-robin
    repartition. Only the selected slice is rewritten (dynamic partition
    overwrite), other slices' files are untouched.
    """
    df = spark.read.parquet(table_path)
    pred = None
    for c in partition_cols:
        clause = F.col(c) == F.lit(partition_values[c])
        pred = clause if pred is None else (pred & clause)
    sliced = df.filter(pred) if pred is not None else df
    slice_dir = "/".join(
        [table_path] + [f"{c}={partition_values[c]}" for c in partition_cols]
    )
    n_files = max(
        1, math.ceil(partition_dir_bytes(spark, slice_dir) / target_file_bytes)
    )
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
    return len(_parquet_statuses(spark, slice_dir))
