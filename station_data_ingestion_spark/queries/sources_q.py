"""Source-format surface under the correctness gate.

The wide-CSV path is gate-covered through the ingestion queries; this
module runs the OTHER batch source formats end-to-end: stage a corpus
slice in the format under test, read it back through the engine's
reader, aggregate, and compare against the DuckDB oracle on the
original parquet — so a reader bug (encoding, schema drift, silent
null-ing) is a gate red, not a pytest-only red.

Staging is cached per (applicationId, sf_dir) like the streaming replay
source: the corpus is immutable, so each format pays its one write per
session, not per query/bench repeat.
"""

from __future__ import annotations

import atexit
import tempfile

from pyspark.sql import SparkSession, functions as F

from station_data_ingestion_spark.queries.registry import load, query
from station_data_ingestion_spark.sources.jsonl import read_jsonl

_STAGED: dict[tuple[str, str, str], str] = {}

_DOCS_DDL = "doc_id long, text string, lang string, source string, n_chars long"


def _cleanup() -> None:
    import shutil

    for d in _STAGED.values():
        shutil.rmtree(d, ignore_errors=True)
    _STAGED.clear()


atexit.register(_cleanup)


def _staged_documents_jsonl(spark: SparkSession, sf_dir: str) -> str:
    key = (spark.sparkContext.applicationId, sf_dir, "jsonl")
    if key not in _STAGED:
        docs = load(spark, sf_dir, "documents")["documents"]
        d = tempfile.mkdtemp(prefix="jsonl_src_")
        # multi-file on purpose: one task per file on read-back
        docs.repartition(4).write.json(f"{d}/docs")
        _STAGED[key] = d
    return f"{_STAGED[key]}/docs"


@query(
    "source_jsonl_roundtrip",
    """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(length(text)) AS BIGINT) AS sum_text_len
FROM documents GROUP BY lang, source
""",
)
def source_jsonl_roundtrip(spark, sf_dir):
    """documents staged as line-delimited JSON, read back through
    sources/jsonl.py in FAILFAST mode with an explicit schema, then
    aggregated — text length in the output proves string content (incl.
    any escaping) survived the round-trip byte-for-byte, not just row
    counts."""
    path = _staged_documents_jsonl(spark, sf_dir)
    df = read_jsonl(spark, path, _DOCS_DDL, mode="failfast")
    return df.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.length("text")).alias("sum_text_len"),
    )
