"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All queries live in station_data_ingestion_spark/queries/ (one module per
operator family); this file just re-exports the registry.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from station_data_ingestion_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: Q1 pricing summary."""
    return QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def _certification_counts() -> dict[str, int]:
    """How many past driver rounds certified each query green.

    The driver samples a PREFIX of queries() (50/90 in r2), so a fixed
    order leaves the same ~40 queries driver-unchecked forever. Counting
    green rows across the committed CORRECTNESS_r*.json artifacts and
    sorting least-certified-first rotates the sample automatically each
    round: never-sampled and previously-errored queries go to the front,
    already-certified ones cycle to the back.

    A no_oracle rows-only row counts as certified ONLY while the query
    still has no oracle -- for a rows-only-by-design query that row is
    its strongest possible driver check, but once the query gains a SQL
    oracle (e.g. sim_pq_adc_topk, rows-only when sampled in r8, full
    oracle since r9) the stale rows-only row no longer certifies it: the
    new oracle has never been driver-checked, so the query re-fronts in
    the next sample automatically (VERDICT r10 item #1).

    Sample-budget policy (VERDICT r10 item #7): with certification debt
    at zero, the prefix the driver takes is spent on (a) any query whose
    oracle is newer than its last sample -- the rule above zeroes its
    count, putting it first -- then (b) least-certified, so every query
    keeps cycling through the gate with at most ~(registry/50)-round lag.
    """
    counts: dict[str, int] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(path, encoding="utf-8") as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, r in rows.items():
            qd = QUERIES.get(name)
            rows_only_ok = (
                r.get("err") == "no_oracle"
                and r.get("spark_rows") is not None
                and (qd is None or qd.oracle is None)
            )
            if bool(r.get("rows_match")) or rows_only_ok:
                counts[name] = counts.get(name, 0) + 1
    return counts


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    least-driver-certified first (see _certification_counts)."""
    certified = _certification_counts()
    order = sorted(
        enumerate(QUERIES), key=lambda t: (certified.get(t[1], 0), t[0])
    )
    return {name: QUERIES[name].fn for _, name in order}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-expressible query."""
    return {name: qd.oracle for name, qd in QUERIES.items() if qd.oracle is not None}
