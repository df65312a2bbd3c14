"""Source-format surface under the correctness gate.

This module runs batch source formats end-to-end — including the
reference's wide-CSV ingestion dataflow (ingest_wide_csv_e2e): stage a corpus
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


def _staged_wide_csv(spark: SparkSession, sf_dir: str) -> str:
    """Deterministic station-matrix CSV derived from orders: stations =
    o_custkey % 50, date columns = March 1996, cells = cents sums (or
    NA). Built driver-side on purpose — this constructs the TEST INPUT
    (bounded: 50 rows x 31 columns); the operator under test then reads
    it back distributed."""
    key = (spark.sparkContext.applicationId, sf_dir, "wide_csv")
    if key not in _STAGED:
        days = [f"1996-03-{d:02d}" for d in range(1, 32)]
        orders = load(spark, sf_dir, "orders")["orders"]
        cells = (
            orders.where(
                F.col("o_orderdate").between(days[0], days[-1])
            )
            .groupBy(
                (F.col("o_custkey") % 50).alias("skn"),
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
            )
            .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
            .collect()
        )
        matrix: dict[int, dict[str, int]] = {}
        for r in cells:
            matrix.setdefault(int(r["skn"]), {})[r["d"]] = int(r["cents"])
        meta = "Station.Name,Observer,Network,Island,ELEV.m.,LAT,LON,NCEI.id,NWS.id,NESDIS.id,SCAN.id,SMART_NODE_RF.id,Notes"
        header = "SKN," + meta + "," + ",".join(
            "X" + d.replace("-", ".") for d in days
        )
        lines = [header]
        for skn in sorted(matrix):
            vals = [str(matrix[skn].get(d, "NA")) for d in days]
            lines.append(
                f"{skn},st{skn}," + ",".join(["NA"] * 12) + "," + ",".join(vals)
            )
        d = tempfile.mkdtemp(prefix="wide_src_")
        with open(f"{d}/orders_wide.csv", "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        _STAGED[key] = d
    return f"{_STAGED[key]}/orders_wide.csv"


@query(
    "ingest_wide_csv_e2e",
    """
SELECT CAST(o_custkey % 50 AS VARCHAR) AS station_id,
       strftime(o_orderdate, '%Y-%m-%d') AS obs_date,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
         AS value
FROM orders
WHERE CAST(o_orderdate AS DATE)
      BETWEEN DATE '1996-03-02' AND DATE '1996-03-30'
GROUP BY 1, 2
""",
)
def ingest_wide_csv_e2e(spark, sf_dir):
    """The reference's CORE dataflow end-to-end under the oracle gate
    for the first time: a wide station matrix (derived from orders so
    DuckDB can recompute it) goes through the real ingestion job —
    header classification, inclusive date-range column pruning (the job
    range drops the Mar 1 and Mar 31 columns), NA sentinel filtering,
    narrow unpivot, strict double cast, composite-key MERGE into the
    versioned snapshot store — and the table read back must equal the
    straight SQL aggregate. [reference: src/driver.py:136-170 — this is
    that pipeline, restated as one declarative Spark plan]"""
    from station_data_ingestion_spark.plans.jobspec import (
        DataItemSpec,
        JobSpec,
    )
    from station_data_ingestion_spark.plans.runner import run_job
    from station_data_ingestion_spark.plans.snapshot_store import read_table

    csv_path = _staged_wide_csv(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="ingest_e2e_")
    _STAGED[(spark.sparkContext.applicationId, sf_dir, f"work{work}")] = work
    item = DataItemSpec(
        files=[csv_path],
        datatype="order_cents",
        period="day",
        fill="raw",
        start_date="1996-03-02",
        end_date="1996-03-30",
    )
    run_job(
        spark,
        JobSpec(data=[item]),
        f"{work}/obs_table",
        None,
        staging_dir=f"{work}/staging",
    )
    obs = read_table(spark, f"{work}/obs_table")
    return obs.select(
        "station_id",
        F.col("date").alias("obs_date"),
        "value",
    )


_PYDS_DDL = "event_id bigint, event_type string, user_id bigint, value_cents bigint"


def _staged_pyds_jsonl(spark: SparkSession, sf_dir: str) -> str:
    key = (spark.sparkContext.applicationId, sf_dir, "pyds_jsonl")
    if key not in _STAGED:
        d = tempfile.mkdtemp(prefix="pyds_jsonl_")
        load(spark, sf_dir, "events")["events"].select(
            "event_id",
            "event_type",
            "user_id",
            F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        ).repartition(4).write.json(f"{d}/src")
        _STAGED[key] = d
    return f"{_STAGED[key]}/src"


@query(
    "source_python_datasource_scan",
    """
SELECT user_id % 50 AS user_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events
WHERE event_type = 'click' AND CAST(ROUND(value * 100) AS BIGINT) >= 500
GROUP BY 1
""",
    doc="Spark 4 Python Data Source API: custom JSONL format with "
    "per-file InputPartitions and pushFilters row-level pushdown; "
    "oracle on the original parquet.",
)
def source_python_datasource_scan(spark, sf_dir):
    """Custom PYTHON DATA SOURCE (Spark 4 DataSource API) end-to-end:
    events staged as 4 JSONL files are read back through a registered
    ``DataSource`` subclass — Catalyst plans one InputPartition per
    file (asserted in-query via distinct spark_partition_id), pushes
    the equality + range predicates into the reader via pushFilters
    (rows failing them never cross the Python->JVM boundary; claimed
    filters are REMOVED from the post-scan plan, so the oracle is
    auditing the reader's own predicate code), and the aggregate must
    match DuckDB on the original parquet. This is how a remote
    document-store source (the reference's S5) becomes a first-class
    partition-parallel Spark scan without a JVM connector."""
    import glob as _glob

    from station_data_ingestion_spark.sources.pyds import (
        register_jsonl_source,
    )

    src = _staged_pyds_jsonl(spark, sf_dir)
    register_jsonl_source(spark)
    df = (
        spark.read.format("jsonl_pyds")
        .schema(_PYDS_DDL)
        .option("path", src)
        .load()
    )
    n_files = len(
        _glob.glob(f"{src}/*.json") + _glob.glob(f"{src}/*.jsonl")
    )
    n_parts = df.select(F.spark_partition_id()).distinct().count()
    if n_parts != n_files:
        raise RuntimeError(
            f"expected one InputPartition per file ({n_files}), planned "
            f"{n_parts}"
        )
    return (
        df.filter(
            (F.col("event_type") == "click") & (F.col("value_cents") >= 500)
        )
        .groupBy((F.col("user_id") % 50).alias("user_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("value_cents").cast("long").alias("cents"),
        )
    )


@query(
    "source_python_stream_datasource_replay",
    """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events GROUP BY event_type
""",
    doc="Custom Python STREAMING data source: file-count offsets, "
    "per-file partitions, restart reads only newly-arrived files; "
    "exactly-once union equals the plain batch aggregate.",
)
def source_python_stream_datasource_replay(spark, sf_dir):
    """Custom Python STREAMING source (Spark 4 DataSourceStreamReader)
    end-to-end: the offset is the count of sorted files, so a
    checkpoint identifies an exact file prefix. Run 1 streams the
    first half of the corpus; two more files then ARRIVE; run 2
    resumes from the committed offset and must read ONLY the new
    files (asserted: run-2 input rows == rows in the late files —
    re-reading old files would double-count, skipping new ones would
    drop data). The union of both runs' foreachBatch outputs must
    equal the plain batch aggregate — exactly-once across a restart,
    which is the property a 100 TB ingest loop actually relies on.
    Each microbatch plans one InputPartition per new file: executor
    Python workers parse in parallel; offsets/commits live in the
    checkpoint, the source itself is stateless."""
    import glob as _glob
    import shutil

    from station_data_ingestion_spark.sources.pyds import (
        register_jsonl_stream_source,
    )

    staged = _staged_pyds_jsonl(spark, sf_dir)  # 4 JSONL files
    register_jsonl_stream_source(spark)
    d = tempfile.mkdtemp(prefix="pyds_stream_run_")
    _STAGED[("run", d, "pyds_stream")] = d  # atexit cleanup
    src = f"{d}/src"
    import os as _os

    _os.makedirs(src)
    files = sorted(_glob.glob(f"{staged}/part-*.json"))
    if len(files) < 4:
        raise RuntimeError(f"expected >=4 staged files, got {len(files)}")
    half = len(files) // 2
    for i, f_ in enumerate(files[:half]):
        shutil.copy(f_, f"{src}/a{i}.jsonl")

    ckpt = f"{d}/ckpt"
    ddl = _PYDS_DDL

    def _run(out_dir: str) -> int:
        stream = (
            spark.readStream.format("jsonl_pyds_stream")
            .schema(ddl)
            .option("path", src)
            .load()
        )

        def _sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            stream.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sum(int(p["numInputRows"]) for p in q.recentProgress)

    n1 = _run(f"{d}/out1")

    # two more files ARRIVE between runs
    for i, f_ in enumerate(files[half:]):
        shutil.copy(f_, f"{src}/b{i}.jsonl")
    late_rows = (
        spark.read.schema(ddl).json([f"{src}/b{i}.jsonl" for i in range(len(files) - half)]).count()
    )
    n2 = _run(f"{d}/out2")
    if n2 != late_rows:
        raise RuntimeError(
            f"restart must read ONLY newly-arrived files: expected "
            f"{late_rows} rows, streamed {n2}"
        )
    if n1 + n2 == n1:
        raise RuntimeError("run 2 streamed nothing")
    out = spark.read.parquet(f"{d}/out1").unionByName(
        spark.read.parquet(f"{d}/out2")
    )
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("value_cents").cast("long").alias("cents"),
    )


@query(
    "source_fixed_width_roundtrip",
    """
WITH src AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS cents,
       CAST(SUM(CASE WHEN cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null
FROM src GROUP BY o_orderstatus
""",
)
def source_fixed_width_roundtrip(spark, sf_dir):
    """FIXED-WIDTH TEXT SOURCE round-trip (the NOAA/GHCN station-feed
    format): orders render to position-delimited lines (write twin
    right-pads, overflow raises), land on disk as plain text, and parse
    back through one spark.read.text scan with substring/trim/
    strict-cast projections — no Python in the row path, whole-stage
    codegen end to end. The aggregate matching the source table proves
    the round trip is lossless (padding stripped, types restored,
    NULLs preserved as empty fields). [reference: strict parse
    semantics of src/driver.py:141 / tapis_direct_driver.py:145]"""
    import tempfile

    from station_data_ingestion_spark.sources.fixed_width import (
        format_fixed_width,
        scan_fixed_width,
    )

    o = load(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    specs = [
        ("o_orderkey", 1, 12, "bigint"),
        ("o_orderstatus", 13, 2, "string"),
        ("cents", 15, 14, "bigint"),
    ]
    tmp = tempfile.mkdtemp(prefix="fixedw_") + "/orders_fw"
    format_fixed_width(o, specs).write.text(tmp)
    parsed = scan_fixed_width(spark, tmp, specs)
    return parsed.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents"),
        F.sum(F.when(F.col("cents").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null"),
    )


def _staged_lineitem_orc(spark: SparkSession, sf_dir: str) -> str:
    key = (spark.sparkContext.applicationId, sf_dir, "orc")
    if key not in _STAGED:
        li = load(spark, sf_dir, "lineitem")["lineitem"].select(
            "l_orderkey", "l_linestatus", "l_quantity", "l_extendedprice"
        )
        d = tempfile.mkdtemp(prefix="orc_src_")
        # zlib is ORC's default codec; set it explicitly so the staged
        # bytes exercise the compressed read path deterministically
        li.repartition(4).write.option("compression", "zlib").orc(
            f"{d}/lineitem"
        )
        _STAGED[key] = d
    return f"{_STAGED[key]}/lineitem"


@query(
    "source_orc_roundtrip",
    """
SELECT l_linestatus AS status, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS cents
FROM lineitem GROUP BY 1
""",
)
def source_orc_roundtrip(spark, sf_dir):
    """ORC source round-trip: the lineitem slice lands as zlib ORC
    (the other big columnar format a lake ingests beside parquet) and
    reads back through Spark's native vectorized ORC reader with
    filters/pruning intact; the aggregate must match DuckDB on the
    original parquet — a reader bug (codec, type mapping, null
    handling) is a gate red. The projection below keeps 3 of the 4
    staged columns (l_orderkey is pruned): ORC's ReadSchema pruning is
    exercised, not just decoded."""
    path = _staged_lineitem_orc(spark, sf_dir)
    df = spark.read.orc(path)
    return df.groupBy(F.col("l_linestatus").alias("status")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.round("l_quantity").cast("long")).cast("long").alias("qty"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )
