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

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"
# The character set Hive's escapePathName percent-encodes in partition
# directory names (plus control chars, handled by ord < 32).
_HIVE_ESCAPE = set('"#%\'*/:=?\\\x7f{[]^')


def _escape_pv(value: str) -> str:
    return "".join(
        f"%{ord(ch):02X}" if ch in _HIVE_ESCAPE or ord(ch) < 32 else ch
        for ch in value
    )


def _unescape_pv(name: str) -> str:
    out, i = [], 0
    while i < len(name):
        if name[i] == "%" and len(name) - i >= 3:
            try:
                out.append(chr(int(name[i + 1 : i + 3], 16)))
                i += 3
                continue
            except ValueError:
                pass
        out.append(name[i])
        i += 1
    return "".join(out)


def _hadoop_fs(spark: SparkSession, path_str: str):
    """(FileSystem, Path) for any supported filesystem, not just file://."""
    path = spark._jvm.org.apache.hadoop.fs.Path(path_str)
    return path.getFileSystem(spark._jsc.hadoopConfiguration()), path


def _parquet_statuses(spark: SparkSession, dir_path: str) -> list:
    """Recursive Hadoop FileStatus list of the parquet files under a dir.

    (DataFrame.inputFiles() is NOT usable here: on a path-based parquet
    read it lists the whole table's files regardless of partition
    filters, which would inflate sizes by the number of slices.)
    """
    fs, path = _hadoop_fs(spark, dir_path)
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
) -> list[dict[str, str | None]]:
    """Enumerate the table's partition-value combinations from its
    directory layout (driver-side Hadoop listing, no Spark job).

    Values are DECODED: Hive percent-escapes are unescaped and the
    __HIVE_DEFAULT_PARTITION__ sentinel maps to None, so the results are
    the actual data values compact_slice filters on.
    """
    fs, root = _hadoop_fs(spark, table_path)
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
            decoded = None if val == _HIVE_NULL else _unescape_pv(val)
            for rest in walk(st.getPath(), depth + 1):
                out.append({col: decoded, **rest})
        return out

    return walk(root, 0)


def compact_table(
    spark: SparkSession,
    table_path: str,
    partition_cols: tuple[str, ...] = ("datatype", "period"),
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> dict[tuple[str | None, ...], int]:
    """Compact every partition slice of the table; returns files written
    per slice. Slices compact independently (each is its own job), so a
    failure mid-way leaves untouched slices valid."""
    results: dict[tuple[str | None, ...], int] = {}
    for values in list_partition_values(spark, table_path, partition_cols):
        n = compact_slice(
            spark, table_path, values, partition_cols, target_file_bytes
        )
        results[tuple(values[c] for c in partition_cols)] = n
    return results


def _slice_dir(
    table_path: str,
    partition_values: dict[str, str | None],
    partition_cols: tuple[str, ...],
) -> str:
    segs = []
    for c in partition_cols:
        v = partition_values[c]
        segs.append(f"{c}={_HIVE_NULL if v is None else _escape_pv(v)}")
    return "/".join([table_path, *segs])


def compact_slice(
    spark: SparkSession,
    table_path: str,
    partition_values: dict[str, str | None],
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

    The read is bounded to the slice directory (basePath keeps the
    partition columns), so compacting S slices lists each slice once
    instead of the whole table S times.
    """
    slice_dir = _slice_dir(table_path, partition_values, partition_cols)
    df = spark.read.option("basePath", table_path).parquet(slice_dir)
    pred = None
    for c in partition_cols:
        v = partition_values[c]
        clause = F.col(c).isNull() if v is None else (F.col(c) == F.lit(v))
        pred = clause if pred is None else (pred & clause)
    sliced = df.filter(pred) if pred is not None else df
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
