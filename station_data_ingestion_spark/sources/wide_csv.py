"""Wide station-matrix CSV source -> long observation / metadata DataFrames.

The reference's whole dataflow essence [reference: src/driver.py:136-170,
src/tapis_direct_driver.py:84-184] re-expressed as one declarative Spark
program:

    scan(all-string) -> header classify (driver-side, on names only)
    -> select (column prune happens in Catalyst before the scan)
    -> unpivot (wide->long)  -> filter(value != nodata)
    -> strict cast to double -> attach literal columns

Scale notes (100 TB): a station matrix is wide but the long output is what
shuffles; the unpivot is narrow (no shuffle) and pipelined inside
whole-stage codegen. Column pruning is decided driver-side from the header
so Spark's CSV scan only parses the needed columns. Many files parallelize
by Spark's file-splitting; one giant file splits by line ranges.

Semantic traps handled (SURVEY §7):
- nodata is a STRING sentinel compared post-read, never null
  [src/driver.py:141 keep_default_na=False] -> we read with an all-string
  schema, emptyValue="" and nullValue unset so "NA" survives literally.
- station IDs stay strings [src/driver.py:141 dtype={"SKN": str}].
- cast failure must RAISE, not null [src/tapis_direct_driver.py:145] ->
  raise_error guard on (cast IS NULL AND raw != nodata AND raw != '').
- inclusive-both-ends date range [src/driver.py:54-55,115].
- unknown header columns dropped [src/driver.py:46-57].
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from station_data_ingestion_spark.functions.dates import header_to_iso, is_date_header


def _c(name: str) -> F.Column:
    """Column ref for raw header names, which may contain dots (ELEV.m.)."""
    return F.col(f"`{name}`")
from station_data_ingestion_spark.plans.jobspec import (
    METADATA_COL_TRANSLATIONS,
    DataItemSpec,
)


def read_header(spark: SparkSession, path: str) -> list[str]:
    """Read just the header row of a CSV (driver-side, one small read)."""
    return spark.read.option("header", True).csv(path).columns


def classify_headers(
    columns: list[str], spec: DataItemSpec
) -> tuple[dict[str, str], list[str]]:
    """Classify header columns -> (metadata renames, in-range date columns).

    Anything else is dropped. Runs on the driver over column names only.
    Replicates the clean (pandas-path) semantics of the reference's
    filter_cols [reference: src/driver.py:44-76]; the streaming path's
    range_start quirk [src/tapis_direct_driver.py:128-129] is intentionally
    not replicated (SURVEY §7 trap 7).
    """
    rng = spec.date_range
    meta: dict[str, str] = {}
    dates: list[str] = []
    for i, c in enumerate(columns):
        if c in METADATA_COL_TRANSLATIONS:
            meta[c] = METADATA_COL_TRANSLATIONS[c]
        elif (
            i >= spec.data_col_start
            and is_date_header(c, spec.period)
            and rng.contains_header(c)
        ):
            # positional contract: a date-SHAPED header before
            # data_col_start is not data [reference:
            # src/tapis_direct_driver.py:128-129 range_start slicing]
            dates.append(c)
    return meta, dates


def scan_wide_csv(spark: SparkSession, path: str, columns: list[str]) -> DataFrame:
    """All-string CSV scan preserving sentinel strings exactly.

    inferSchema stays OFF so numeric-looking station IDs (e.g. "39.20")
    keep their text form; no nullValue so "NA" is a real string.
    """
    schema = T.StructType([T.StructField(c, T.StringType(), True) for c in columns])
    return (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("emptyValue", "")
        .schema(schema)
        .csv(path)
    )


def observations_from_wide(df: DataFrame, date_cols: list[str], spec: DataItemSpec) -> DataFrame:
    """Wide matrix -> long observation table.

    Output schema: station_id string, date string (ISO), value double,
    datatype/period/fill strings, + per-job additional property columns.
    """
    id_col = "SKN"
    if id_col not in df.columns:
        raise ValueError("wide matrix is missing the SKN station-id column")
    if not date_cols:
        # No in-range dates -> empty long table with the right schema,
        # derived FROM df (not createDataFrame) so a streaming input
        # stays a streaming DataFrame (writeStream-able empty stream).
        base = df.select(
            _c(id_col).alias("station_id"),
            F.lit(None).cast("string").alias("date"),
            F.lit(None).cast("double").alias("value"),
        ).filter(F.lit(False))
    else:
        # Unpivot via explode(map_from_arrays(iso_dates, value_cols)):
        # semantically identical to DataFrame.unpivot, but one array build
        # per input row instead of an Expand with |date_cols| projection
        # branches -- for station matrices with hundreds of date columns
        # the Expand's generated code blows past codegen limits and runs
        # ~3x slower than the explode form.
        iso_dates = F.array(
            *[F.lit(header_to_iso(c, spec.period)) for c in date_cols]
        )
        long_df = df.select(
            _c(id_col).alias("station_id"),
            F.explode(
                F.map_from_arrays(iso_dates, F.array(*[_c(c) for c in date_cols]))
            ).alias("date", "raw_value"),
        )
        # Row guards: skip empty/short rows (null station or null cell)
        # [reference: src/tapis_direct_driver.py:134-136] then the nodata
        # string filter [src/driver.py:162]. The != '' guard is the
        # documented drop-empty-cells divergence -- see
        # _parse_wide_csv_bytes for the rationale (shared semantics).
        filtered = long_df.filter(
            F.col("station_id").isNotNull()
            & F.col("raw_value").isNotNull()
            & (F.col("raw_value") != F.lit(""))
            & (F.col("raw_value") != F.lit(spec.nodata))
        )
        # Strict cast: the reference raises on a non-numeric non-nodata cell
        # [src/tapis_direct_driver.py:145]. try_cast nulls the garbage, then
        # the raise_error guard surfaces the domain error inside the same
        # expression (no extra pass; ANSI-mode-independent).
        value = F.col("raw_value").try_cast("double")
        base = filtered.select(
            "station_id",
            "date",
            F.when(
                value.isNull(),
                F.raise_error(
                    F.concat(
                        F.lit("non-numeric observation value: "), F.col("raw_value")
                    )
                ).cast("double"),
            )
            .otherwise(value)
            .alias("value"),
        )
    for k, v in spec.static_properties.items():
        base = base.withColumn(k, F.lit(v).cast("string"))
    return base


def _parse_wide_csv_bytes(
    buf: bytes,
    cols: list[str],
    dcols: list[str],
    iso_dates: list[str],
    nodata: str,
    skip_rows: int = 0,
):
    """Shared Arrow parse core: wide-CSV bytes -> long pandas frame.

    pyarrow.csv C++ parse with all-string columns (no null coercion, so
    the nodata sentinel survives literally), column-major unpivot as an
    Arrow column-stack, sentinel/empty filter, and the strict
    raise-on-garbage cast. Rows whose field count differs from the
    header (truncated tails, stub rows) are pad/truncated to the header
    width, matching Spark's PERMISSIVE CSV mode and the reference's
    partial-row zip [reference: src/tapis_direct_driver.py:134-139] --
    their present in-range cells ARE ingested.

    DOCUMENTED DIVERGENCE (both engine paths, deliberately): a genuinely
    EMPTY in-range cell is dropped as missing, where the reference raises
    (float('') is a ValueError [src/tapis_direct_driver.py:145]).
    Raising would contradict the pad/truncate contract above -- padded
    short rows fill missing cells with '' -- and drop-as-missing is the
    more useful semantic for sparse station matrices. Whitespace-only
    cells still raise on both paths (they survive the '' filter and fail
    the numeric cast).
    Runs inside executors; returns None when nothing survives.
    """
    import csv as _csv
    import io

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.csv as pacsv

    include = ["SKN"] + list(dcols)
    cols = list(cols)
    invalid_lines: list[str] = []

    def _keep_invalid(row):
        invalid_lines.append(row.text)
        return "skip"

    tbl = pacsv.read_csv(
        io.BytesIO(buf),
        read_options=pacsv.ReadOptions(column_names=cols, skip_rows=skip_rows),
        parse_options=pacsv.ParseOptions(invalid_row_handler=_keep_invalid),
        convert_options=pacsv.ConvertOptions(
            column_types={c: pa.string() for c in include},
            include_columns=include,
            null_values=[],  # "NA" stays a literal string, like the JVM path
            strings_can_be_null=False,
        ),
    )
    if invalid_lines:
        # Rare path: re-parse the handful of wrong-width rows, padded to
        # the header width (missing -> "", extras truncated).
        padded = []
        for line in invalid_lines:
            if not line:
                continue
            fields = next(_csv.reader([line]))
            padded.append((fields + [""] * len(cols))[: len(cols)])
        if padded:
            extra = pa.table(
                {
                    c: pa.array([r[cols.index(c)] for r in padded], type=pa.string())
                    for c in include
                }
            )
            tbl = pa.concat_tables([tbl, extra])
    n = tbl.num_rows
    if n == 0:
        return None
    ids = tbl.column("SKN").combine_chunks()
    # Column-major unpivot: every row's value for date column j, then
    # j+1, ... Order is irrelevant to the (unordered) result.
    value_raw = pa.chunked_array([tbl.column(c).combine_chunks() for c in dcols])
    station = pa.chunked_array([ids] * len(dcols))
    date_col = pa.chunked_array(
        [pa.array([iso] * n, type=pa.string()) for iso in iso_dates]
    )
    # blank station id drops the row, like the JVM path's isNotNull guard
    # (Spark's default nullValue turns the empty field into null there)
    keep = pc.and_(
        pc.and_(pc.not_equal(value_raw, ""), pc.not_equal(value_raw, nodata)),
        pc.not_equal(station, ""),
    )
    # trim before the cast: Arrow's string->double rejects ' 1.5' while
    # the declarative path's try_cast (and the reference's float()) trims
    # and accepts -- the two paths must agree on the same file
    vals = pc.utf8_trim_whitespace(value_raw.filter(keep))
    try:
        cast = pc.cast(vals, pa.float64())
    except pa.ArrowInvalid as e:
        raise ValueError(f"non-numeric observation value: {e}") from None
    return pa.table(
        {
            "station_id": station.filter(keep),
            "date": date_col.filter(keep),
            "value": cast,
        }
    ).to_pandas()


def observations_from_wide_fast(
    spark: SparkSession,
    path: str,
    columns: list[str],
    date_cols: list[str],
    spec: DataItemSpec,
) -> DataFrame | None:
    """Arrow-native wide->long fast path: text-line splits + pyarrow.csv.

    Same output schema and semantics as :func:`observations_from_wide`
    (nodata/empty filter, strict raise-on-garbage cast, PERMISSIVE-style
    pad/truncate of wrong-width rows, static property columns) with one
    documented divergence: a mid-file line identical to the header is
    treated as a header (dropped) rather than a strict-cast error --
    the concatenated-files case.

    Why this exists: the declarative path builds a |date_cols|-wide
    map_from_arrays projection whose generated code grows linearly with
    the matrix width, and parses every cell as a JVM UTF8String. Here the
    file is read as raw line splits (spark.read.text -- still distributed
    by HDFS-style line ranges, so a huge file fans out across executors)
    and each Arrow batch of lines goes through pyarrow.csv's C++ parser;
    the unpivot is a column-stack + sentinel filter + strict cast done
    entirely in Arrow compute. Constant plan size, no per-cell JVM
    objects, one Python worker pass.

    Returns None when the path is not a plain local file (glob/dir/URI) --
    callers then use the declarative path. Quoted embedded newlines are
    not supported here (same limitation as the reference's line-streamed
    HTTP scan [src/tapis_direct_driver.py:104-107]).
    """
    if not date_cols or "SKN" not in columns or not os.path.isfile(path):
        return None
    with open(path, "rb") as f:
        header_line = f.readline().decode("utf-8", errors="replace").rstrip("\r\n")
    col_names = list(columns)
    dcols = list(date_cols)
    iso_dates = [header_to_iso(c, spec.period) for c in dcols]
    nodata = spec.nodata

    def parse_lines(batches):
        for pdf in batches:
            lines = pdf["value"]
            lines = lines[lines != header_line]
            if lines.empty:
                continue
            buf = ("\n".join(lines.tolist()) + "\n").encode("utf-8")
            out = _parse_wide_csv_bytes(buf, col_names, dcols, iso_dates, nodata)
            if out is not None:
                yield out

    lines_df = spark.read.text(path)
    parallelism = spark.sparkContext.defaultParallelism
    if len(dcols) > 50 and lines_df.rdd.getNumPartitions() < parallelism:
        # Same rationale as the declarative path: spread the few, wide
        # pre-expansion lines before the ~|date_cols|x fan-out.
        lines_df = lines_df.repartition(parallelism)
    base = lines_df.mapInPandas(
        parse_lines, "station_id string, date string, value double"
    )
    for k, v in spec.static_properties.items():
        base = base.withColumn(k, F.lit(v).cast("string"))
    return base


def plan_file_ranges(path: str, split_bytes: int) -> list[tuple[int, int]]:
    """Tile a CSV file into newline-aligned byte ranges after the header.

    The distributed analog of the reference's in-file byte-position resume
    cursor [reference: README.md:41-43]: each range is a unit of resume
    (and of parallelism). Ranges are contiguous, start at the first data
    byte, and every boundary falls just after a ``\\n``, so each range is
    exactly whole lines. Driver cost is one seek + short read per range.
    """
    size = os.path.getsize(path)
    ranges: list[tuple[int, int]] = []
    with open(path, "rb") as f:
        f.readline()  # header
        start = f.tell()
        while start < size:
            target = start + split_bytes
            if target >= size:
                end = size
            else:
                f.seek(target)
                f.readline()  # advance to the next line boundary
                end = f.tell()
            ranges.append((start, end))
            start = end
    return ranges


def observations_from_wide_ranges(
    spark: SparkSession,
    path: str,
    ranges: list[tuple[int, int]],
    spec: DataItemSpec,
) -> DataFrame | None:
    """Parse ONLY the given byte ranges of one wide CSV, distributed.

    One task per range; each seeks into the file and runs the same
    pyarrow.csv parse as :func:`observations_from_wide_fast`, so resuming
    a partially-ingested 500 GB file re-reads only its unfinished ranges.
    Requires the path to be readable from executors (shared FS -- the
    same contract as the other local fast paths). Returns None when the
    file has no in-range date columns.
    """
    with open(path, "rb") as f:
        header_line = f.readline().decode("utf-8", errors="replace").rstrip("\r\n")
    cfg = classify_header_line(header_line, spec)
    if cfg is None:
        raise ValueError(f"wide matrix is missing the SKN station-id column: {path}")
    cols, dcols, iso_dates = cfg
    if not dcols:
        return None
    nodata = spec.nodata

    def parse_ranges(batches):
        for pdf in batches:
            for p, s, e in zip(pdf["path"], pdf["start"], pdf["end"]):
                with open(p, "rb") as f:
                    f.seek(int(s))
                    raw = f.read(int(e) - int(s))
                lines = [
                    ln for ln in raw.decode("utf-8", errors="replace").splitlines()
                    if ln != header_line
                ]
                if not lines:
                    continue
                buf = ("\n".join(lines) + "\n").encode("utf-8")
                out = _parse_wide_csv_bytes(buf, cols, dcols, iso_dates, nodata)
                if out is not None:
                    yield out

    rows = [(path, int(s), int(e)) for s, e in ranges]
    rdf = spark.createDataFrame(
        rows, "path string, start long, end long"
    ).repartition(max(1, len(rows)))
    base = rdf.mapInPandas(
        parse_ranges, "station_id string, date string, value double"
    )
    for k, v in spec.static_properties.items():
        base = base.withColumn(k, F.lit(v).cast("string"))
    return base


def observations_from_wide_many_fast(
    spark: SparkSession, paths: list[str], spec: DataItemSpec
) -> DataFrame | None:
    """Batch ingestion: MANY wide CSVs in ONE distributed plan.

    The reference (and the faithful per-file runner loop) ingests files
    sequentially [reference: src/driver.py:136-141, utils/task.sh:8-15];
    at 100 TB / thousands of monthly files that serializes job scheduling.
    This operator reads every file in a single ``spark.read.text`` scan
    (splittable per file AND within large files) and dispatches each line
    to its own file's header layout via ``input_file_name()`` -- files may
    have entirely different date columns. Parsing per Arrow batch is the
    same pyarrow.csv path as :func:`observations_from_wide_fast`.

    Cells from different files with the SAME composite key are NOT
    deduplicated here (the sequential loop resolves them by merge order);
    callers batching overlapping files should dedup before merging.
    Wrong-width rows pad/truncate to their file's header width
    (PERMISSIVE parity, see :func:`_parse_wide_csv_bytes`).

    Returns None if any path is not a plain local file (stage remote
    files first) or no file has in-range date columns.
    """
    if not paths or not all(os.path.isfile(p) for p in paths):
        return None
    # Driver-side: one tiny header read per file -> per-file parse config.
    # A file whose station-id column can't be identified RAISES (like the
    # sequential path) -- silently skipping it would let callers mark the
    # file ingested when it never was. Files with no in-range date
    # columns legitimately contribute nothing and are excluded from the
    # scan.
    configs: dict[str, tuple[str, list[str], list[str], list[str]]] = {}
    for p in paths:
        with open(p, "rb") as f:
            header_line = f.readline().decode("utf-8", errors="replace").rstrip("\r\n")
        cfg = classify_header_line(header_line, spec)
        if cfg is None:
            raise ValueError(
                f"wide matrix is missing the SKN station-id column: {p}"
            )
        cols, date_cols, iso = cfg
        if not date_cols:
            continue  # nothing to contribute
        configs[os.path.abspath(p)] = (header_line, cols, date_cols, iso)
    if not configs:
        return None
    nodata = spec.nodata

    def parse_many(batches):
        import urllib.parse

        def local_path(uri: str) -> str:
            return urllib.parse.unquote(urllib.parse.urlparse(uri).path)

        for pdf in batches:
            for uri, group in pdf.groupby("_file", sort=False):
                cfg = configs.get(local_path(uri))
                if cfg is None:
                    continue
                header_line, cols, dcols, iso_dates = cfg
                lines = group["value"]
                lines = lines[lines != header_line]
                if lines.empty:
                    continue
                buf = ("\n".join(lines.tolist()) + "\n").encode("utf-8")
                out = _parse_wide_csv_bytes(buf, cols, dcols, iso_dates, nodata)
                if out is not None:
                    yield out

    lines_df = spark.read.text(list(configs)).select(
        F.input_file_name().alias("_file"), "value"
    )
    parallelism = spark.sparkContext.defaultParallelism
    if lines_df.rdd.getNumPartitions() < parallelism:
        lines_df = lines_df.repartition(parallelism)
    base = lines_df.mapInPandas(
        parse_many, "station_id string, date string, value double"
    )
    for k, v in spec.static_properties.items():
        base = base.withColumn(k, F.lit(v).cast("string"))
    return base


def _csv_iter(lines):
    import csv

    return csv.reader(lines)


def classify_header_line(
    header_line: str, spec: DataItemSpec
) -> tuple[list[str], list[str], list[str]] | None:
    """One header line -> (columns, in-range date columns, iso dates).

    Applies the positional id_col -> SKN rename when the literal header
    is absent [reference: src/tapis_direct_driver.py:54-56]. Returns
    None when no station-id column can be identified (unusable file).
    Shared by the batch and remote ingestion paths so their header
    handling can never diverge.
    """
    cols = next(_csv_iter([header_line]), [])
    if "SKN" not in cols and 0 <= spec.id_col < len(cols):
        cols = list(cols)
        cols[spec.id_col] = "SKN"
    if "SKN" not in cols:
        return None
    _meta, date_cols = classify_headers(cols, spec)
    return cols, date_cols, [header_to_iso(c, spec.period) for c in date_cols]


def metadata_from_wide(df: DataFrame, meta_renames: dict[str, str], location: str) -> DataFrame:
    """Station metadata branch [reference: src/driver.py:144-151].

    Injects id_field="skn" and station_group=f"{location}_climate_primary".
    nodata-valued fields are NOT dropped here (a DataFrame has fixed
    schema); the sparse per-record drop happens at serialization time in
    sinks.sparse_json_docs.
    """
    cols = [_c(src).alias(dst) for src, dst in meta_renames.items()]
    return df.select(*cols).withColumns(
        {
            "id_field": F.lit("skn"),
            "station_group": F.lit(f"{location}_climate_primary"),
        }
    )


def ingest_wide_csv(
    spark: SparkSession,
    path: str,
    spec: DataItemSpec,
    location: str = "hawaii",
    fast: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Full ingestion program for one wide CSV: (observations, metadata).

    The station-id column is found by name (SKN, the pandas-path spec);
    if absent, the config's positional ``id_col`` designates it
    [reference: src/tapis_direct_driver.py:54-56, README.md:36] and that
    column is treated as SKN.

    With ``fast`` (default), the observation branch uses the Arrow-native
    parse path (:func:`observations_from_wide_fast`) when applicable; the
    metadata branch always reads via the JVM CSV scan, which Catalyst
    prunes to just the metadata columns.
    """
    columns = read_header(spark, path)
    if "SKN" not in columns and 0 <= spec.id_col < len(columns):
        columns = list(columns)
        columns[spec.id_col] = "SKN"
    meta_renames, date_cols = classify_headers(columns, spec)
    obs = (
        observations_from_wide_fast(spark, path, columns, date_cols, spec)
        if fast
        else None
    )
    if obs is not None:
        meta = metadata_from_wide(scan_wide_csv(spark, path, columns), meta_renames, location)
        return obs, meta
    needed = list(meta_renames) + date_cols
    df = scan_wide_csv(spark, path, columns).select(*[_c(c) for c in needed])
    # One small CSV = one input split, but the unpivot fans each wide row
    # out ~|date_cols| times: spread the (few, narrow) wide rows across the
    # cluster BEFORE the expansion. Round-robin of pre-expansion rows is
    # cheap; at 100 TB many files already give enough splits and AQE
    # coalesces the extra exchange away.
    parallelism = spark.sparkContext.defaultParallelism
    if len(date_cols) > 50 and df.rdd.getNumPartitions() < parallelism:
        df = df.repartition(parallelism)
    obs = observations_from_wide(df, date_cols, spec)
    meta = metadata_from_wide(df, meta_renames, location)
    return obs, meta
