"""JSON-lines source: schema-explicit line-delimited JSON ingestion.

The reference ingests CSV matrices and JSON CONFIG files only
[reference: src/tapis_direct_driver.py:34-41 — json.load of the job
config]; a document corpus shipped as .jsonl is the other ubiquitous
wire format at training-pipeline scale, so the engine provides a
first-class reader with the same strictness contract as the CSV path
(R4: garbage raises, never silently nulls).

Design notes:
- schema is REQUIRED. Schema inference reads the data twice and types
  by sampling — both wrong at 100 TB (and inference can flip types
  between runs on dirty corpora). Callers pass the DDL they expect.
- ``mode='failfast'`` (default): any malformed line fails the read —
  the strict-cast contract. ``mode='permissive'`` instead captures the
  raw malformed line in a ``_corrupt_record`` column so a curation
  pipeline can quarantine bad lines without losing them.
- The reader is a plain ``spark.read.json`` under the hood: fully
  distributed (one task per split), predicate/column pruning apply,
  and .jsonl.gz works transparently (per-file decompression).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    mode: str = "failfast",
) -> DataFrame:
    """Read line-delimited JSON with an explicit schema.

    ``mode``: 'failfast' (malformed line -> error) or 'permissive'
    (malformed lines kept, raw text in ``_corrupt_record``, all data
    columns null).
    """
    mode = mode.lower()
    if mode not in ("failfast", "permissive"):
        raise ValueError(f"mode must be failfast|permissive, got {mode}")
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if mode == "permissive" and CORRUPT_COL not in schema.fieldNames():
        schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
        )
    return (
        spark.read.schema(schema)
        .option("mode", mode.upper())
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a permissive read into (clean_rows, corrupt_rows).

    Corrupt rows carry only the raw line; clean rows drop the corrupt
    column. Spark requires a materialized frame to filter on the corrupt
    column reliably (the raw-line column exists only while the parser
    sees the raw input), so the split runs on an eager localCheckpoint —
    the same pattern as operators/prefix_sum.py: unlike cache(), whose
    CacheManager entry leaks without an explicit unpersist the caller
    would have to remember, checkpoint blocks are reclaimed by the
    ContextCleaner once the returned frames are garbage-collected.
    """
    if CORRUPT_COL not in df.columns:
        raise ValueError("quarantine_split needs a permissive read")
    from pyspark.sql import functions as F

    mat = df.localCheckpoint(eager=True)
    clean = mat.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = mat.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, bad
