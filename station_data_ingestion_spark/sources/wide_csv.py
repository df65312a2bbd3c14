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
    for c in columns:
        if c in METADATA_COL_TRANSLATIONS:
            meta[c] = METADATA_COL_TRANSLATIONS[c]
        elif is_date_header(c, spec.period) and rng.contains_header(c):
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
        # No in-range dates -> empty long table with the right schema.
        base = df.sparkSession.createDataFrame(
            [], "station_id string, date string, value double"
        )
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
        # string filter [src/driver.py:162].
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
    spark: SparkSession, path: str, spec: DataItemSpec, location: str = "hawaii"
) -> tuple[DataFrame, DataFrame]:
    """Full ingestion program for one wide CSV: (observations, metadata).

    The station-id column is found by name (SKN, the pandas-path spec);
    if absent, the config's positional ``id_col`` designates it
    [reference: src/tapis_direct_driver.py:54-56, README.md:36] and that
    column is treated as SKN.
    """
    columns = read_header(spark, path)
    if "SKN" not in columns and 0 <= spec.id_col < len(columns):
        columns = list(columns)
        columns[spec.id_col] = "SKN"
    meta_renames, date_cols = classify_headers(columns, spec)
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
