"""Registry of named queries with DuckDB-oracle SQL counterparts.

Each query is a callable (spark, sf_dir) -> DataFrame plus (usually) an
ANSI-SQL string that DuckDB can run over the same parquet tables. The
external driver compares them by row-count + schema + order-insensitive
value hash, so every query here follows three determinism rules:

1. float aggregates use the exact-integer pattern
   ``sum(cast(round(x * 10^k) as bigint)) / 10^k`` -- integer addition is
   associative, so the result is bit-identical regardless of partitioning
   or engine (a plain sum(double) varies in the last bits with the
   accumulation order). Helper: :func:`money_sum` / :data:`MONEY_SQL`.
2. timestamps never appear raw in output -- always formatted to strings.
3. any LIMIT/top-k has a total order (unique tiebreak column included).

At 100 TB the same pattern holds: integer sums also avoid double rounding
drift across AQE re-partitions. (A production deployment would use
DECIMAL(18,4) columns instead; the parquet corpus is double-typed.)
"""

from __future__ import annotations

import weakref
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


QUERIES: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register fn(spark, sf_dir) -> DataFrame under `name`."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


_READY_SESSIONS: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()

# Session confs every query depends on for CORRECTNESS (not tuning).
# The external driver builds its own SparkSession without session.py's
# factory, so these are (re)applied at runtime -- all three are
# runtime-settable SQL confs:
# - nanosAsLong: events.ts is parquet TIMESTAMP(NANOS); without this a
#   plain session fails the scan with PARQUET_TYPE_ILLEGAL.
# - UTC timezone: timestamp->string formatting and epoch arithmetic in
#   query output must not depend on the host zone.
# - Arrow: mapInPandas stages move batches, not pickled rows.
_REQUIRED_CONFS = (
    ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ("spark.sql.session.timeZone", "UTC"),
    ("spark.sql.execution.arrow.pyspark.enabled", "true"),
)


def ensure_session_confs(spark: SparkSession) -> None:
    """Apply correctness-critical session confs to any SparkSession.

    If a conf cannot be set AND its effective value differs, results
    would be silently wrong (zone-shifted strings, failing nanos scans),
    so that raises instead of proceeding. Arrow is performance-only and
    never raises.
    """
    if spark in _READY_SESSIONS:
        return
    for k, v in _REQUIRED_CONFS:
        try:
            spark.conf.set(k, v)
        except Exception:
            effective = spark.conf.get(k, None)
            must_match = k != "spark.sql.execution.arrow.pyspark.enabled"
            if must_match and effective != v:
                raise RuntimeError(
                    f"session conf {k} is locked to {effective!r} but the "
                    f"query surface requires {v!r} for correct results"
                ) from None
    _READY_SESSIONS.add(spark)


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to session-zone TIMESTAMP.

    The corpus has shipped ``events.ts`` in two parquet encodings across
    regenerations, and downstream code (``cast("long")``,
    ``unix_micros``, ``withWatermark``) requires a zoned TIMESTAMP:

    - ``TIMESTAMP(NANOS)`` read as a nanos bigint (via
      ``spark.sql.legacy.parquet.nanosAsLong``): integer-div to micros,
      NOT /1000.0 -- nanos ~1.7e18 exceed double's 53-bit mantissa, so
      float division drifts by hundreds of nanoseconds.
    - ``timestamp[us]`` read as TIMESTAMP_NTZ: cast to TIMESTAMP. The
      session zone is pinned UTC (ensure_session_confs), so the cast is
      a pure re-tag -- string formatting and epoch arithmetic stay
      bit-identical to the NTZ wall-clock values.

    Already-TIMESTAMP columns pass through untouched. Idempotent, so
    both batch (``load``) and streaming sources apply it defensively.
    """
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif dt == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


_SCHEMA_CACHE: dict = {}


def load(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load parquet tables as DataFrames (schemas pruned by Catalyst).

    events.ts is normalized to a session-UTC TIMESTAMP whatever parquet
    encoding the corpus shipped (see :func:`normalize_event_ts`), so
    semantics match engines with native nanos support (DuckDB truncates
    the same way).

    Schemas are memoized per (sf_dir, table) for the life of the
    process — the metastore/catalog pattern: ``spark.read.parquet``
    without an explicit schema runs ONE Spark job per call for footer
    inference (~0.1s of pure per-job overhead), and a bench/driver run
    issues hundreds of loads of the same immutable tables. The first
    load of a table still infers from the real footer (nothing is
    persisted across processes; only plan METADATA is cached, never
    data or results — every query still scans parquet in full).
    """
    ensure_session_confs(spark)
    out = {}
    for n in names or TABLES:
        key = (sf_dir, n)
        schema = _SCHEMA_CACHE.get(key)
        if schema is None:
            df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
            _SCHEMA_CACHE[key] = df.schema
        else:
            df = spark.read.schema(schema).parquet(f"{sf_dir}/{n}.parquet")
        if n == "events":
            df = normalize_event_ts(df)
        out[n] = df
    return out


def money_sum(col: Column, scale: int = 4) -> Column:
    """Deterministic float sum: per-row round to 10^-scale, integer-sum."""
    k = 10 ** scale
    return F.sum(F.round(col * k).cast("long")) / float(k)


def money_sum_sql(expr: str, scale: int = 4) -> str:
    k = 10 ** scale
    return f"SUM(CAST(ROUND(({expr}) * {k}) AS BIGINT)) / {k}.0"
