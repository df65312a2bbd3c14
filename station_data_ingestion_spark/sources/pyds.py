"""Spark 4 Python Data Source API: a JSONL source with per-file
partitions and row-level filter pushdown.

This exercises the engine surface the DataFrame reader cannot fake: a
``DataSource`` subclass registered with ``spark.dataSource.register``,
whose ``DataSourceReader`` (a) plans one ``InputPartition`` PER FILE so
a directory of N files scans with N-way parallelism on executors' own
Python workers, and (b) accepts Catalyst's pushed predicates through
``pushFilters`` — supported comparisons are applied row-wise inside the
reader (rows never cross the Python/JVM boundary), unsupported ones are
returned so Spark re-applies them above the scan. JSONL has no file
statistics, so pushdown here saves serialization, not I/O; a stats-
bearing format would prune whole partitions the same way the snapshot
store's zone maps do.

At 100 TB the pattern is what matters: the reference ingests from a
remote document store [reference: src/modules/query_handler.py — the
doc-store query source S5], and this API is how such a source becomes a
first-class, partition-parallel, predicate-aware Spark scan without a
JVM connector.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Iterable, Iterator, List

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _compile_filter(f: Filter):
    """Supported pushed filter -> row predicate, else None.

    Only single-column top-level comparisons are claimed; everything
    else is declined so Spark keeps it above the scan (claiming a
    filter you mishandle SILENTLY DROPS ROWS — decline when unsure)."""
    if isinstance(f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)):
        if len(f.attribute) != 1:  # nested column path: decline
            return None
        (col,) = f.attribute
        v = f.value
        ops = {
            EqualTo: lambda x: x is not None and x == v,
            GreaterThan: lambda x: x is not None and x > v,
            GreaterThanOrEqual: lambda x: x is not None and x >= v,
            LessThan: lambda x: x is not None and x < v,
            LessThanOrEqual: lambda x: x is not None and x <= v,
        }
        op = ops[type(f)]
        return lambda rec: op(rec.get(col))
    if isinstance(f, IsNotNull):
        if len(f.attribute) != 1:
            return None
        (col,) = f.attribute
        return lambda rec: rec.get(col) is not None
    return None


class JsonlDataSource(DataSource):
    """``spark.read.format("jsonl_pyds").schema(ddl).option("path", d)``.

    The caller supplies the schema (JSONL is schemaless; inferring it
    would need a driver-side pre-scan). Values are coerced to the
    declared field types; missing keys read as NULL."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_pyds"

    def schema(self):
        raise NotImplementedError(
            "jsonl_pyds requires an explicit .schema(...)"
        )

    def reader(self, schema: StructType) -> "JsonlReader":
        return JsonlReader(schema, self.options)


class JsonlReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_pyds needs .option('path', dir)")
        self.predicates = []

    def pushFilters(self, filters: List[Filter]) -> Iterable[Filter]:
        unsupported = []
        for f in filters:
            pred = _compile_filter(f)
            if pred is None:
                unsupported.append(f)
            else:
                self.predicates.append(pred)
        return unsupported

    def partitions(self):
        files = sorted(
            glob.glob(os.path.join(self.path, "*.json"))
            + glob.glob(os.path.join(self.path, "*.jsonl"))
        )
        if not files:
            raise FileNotFoundError(f"no JSONL files under {self.path}")
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        fields = [(f.name, f.dataType.simpleString()) for f in self.schema.fields]

        def coerce(v, t):
            if v is None:
                return None
            if t in ("bigint", "int", "smallint", "tinyint"):
                return int(v)
            if t == "double" or t == "float":
                return float(v)
            if t == "string":
                return str(v)
            if t == "boolean":
                return bool(v)
            return v

        with open(partition.path, "r", encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                if all(p(rec) for p in self.predicates):
                    yield tuple(
                        coerce(rec.get(n), t) for n, t in fields
                    )


def register_jsonl_source(spark) -> None:
    """Idempotent registration of the jsonl_pyds format.

    The DataSource class is cloudpickled to dedicated Python workers
    that do NOT share the driver's sys.path (an external driver may run
    this package from a checkout the executors never see), so this
    module is registered for pickle-BY-VALUE: the class definition
    ships inside the plan instead of being re-imported worker-side."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    # pushFilters is gated behind a SQL conf (off by default in 4.1);
    # a reader that implements it with the conf off is a hard error
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(JsonlDataSource)


class JsonlStreamDataSource(DataSource):
    """Streaming twin of :class:`JsonlDataSource`: a custom Python
    STREAMING source whose offset is the count of (sorted) files
    consumed. Files only ever arrive with new names, so the sorted
    listing is append-stable and an offset {"idx": n} identifies an
    exact prefix — a restarted query resumes from the committed offset
    and reads ONLY files that arrived since (exactly-once across
    restarts, asserted by the gate query). Each microbatch plans one
    InputPartition per new file, so executor-side Python workers parse
    in parallel exactly like the batch source."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_pyds_stream"

    def schema(self):
        raise NotImplementedError(
            "jsonl_pyds_stream requires an explicit .schema(...)"
        )

    def streamReader(self, schema: StructType) -> "JsonlStreamReader":
        return JsonlStreamReader(schema, self.options)


class JsonlStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_pyds_stream needs .option('path', dir)")

    def _files(self) -> list:
        return sorted(
            glob.glob(os.path.join(self.path, "*.json"))
            + glob.glob(os.path.join(self.path, "*.jsonl"))
        )

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def latestOffset(self) -> dict:
        return {"idx": len(self._files())}

    def partitions(self, start: dict, end: dict):
        files = self._files()
        return [_FilePartition(p) for p in files[start["idx"]: end["idx"]]]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        fields = [
            (f.name, f.dataType.simpleString()) for f in self.schema.fields
        ]

        def coerce(v, t):
            if v is None:
                return None
            if t in ("bigint", "int", "smallint", "tinyint"):
                return int(v)
            if t in ("double", "float"):
                return float(v)
            if t == "string":
                return str(v)
            if t == "boolean":
                return bool(v)
            return v

        with open(partition.path, "r", encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    yield tuple(coerce(rec.get(n), t) for n, t in fields)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint; nothing source-side


def register_jsonl_stream_source(spark) -> None:
    """Idempotent registration of the jsonl_pyds_stream format."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(JsonlStreamDataSource)
