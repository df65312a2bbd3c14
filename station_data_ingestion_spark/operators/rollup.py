"""Period rollup: day observations -> month aggregate observations.

The reference ingests day-period and month-period files as separate
configs [reference: src/example_config.json:4-6 period field,
src/modules/date_parser.py:5-13 two formats]; the month values are
produced upstream. This operator derives them in-engine -- the
continuous-aggregate / hypertable-rollup shape a station-data engine
needs when the upstream only ships days.

Scale notes: one shuffle on (datatype, fill, station_id, month); the
output is ~1/30 of the input and merges into the month slice of the
same observation table via the ordinary merge (idempotent re-rollup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AGGS = ("mean", "min", "max", "count")


def rollup_monthly(obs: DataFrame, agg: str = "mean") -> DataFrame:
    """Aggregate day-period rows into month-period observation rows.

    Input must be observation-shaped (station_id, date 'yyyy-MM-dd',
    value, datatype, period='day', fill, ...extras). Output rows carry
    period='month', date='yyyy-MM', and the aggregated value; the
    `aggregation` name is attached so different rollups of the same
    series stay distinct under the composite merge key (the reference
    uses exactly this field as an additional key property
    [reference: src/example_config.json:31-33]).

    The mean uses the exact scaled-integer sum (1e9 scale), so re-rolling
    the same days reproduces bit-identical values (merge no-ops on
    replay); magnitudes beyond ~3e8 would overflow the scaled sum and
    are out of range for station observations.
    """
    if agg not in AGGS:
        raise ValueError(f"agg must be one of {AGGS}, got {agg!r}")
    extras = [
        c
        for c in obs.columns
        if c not in ("station_id", "date", "value", "datatype", "period", "fill")
    ]
    day = obs.filter(F.col("period") == "day")
    # 1e9 scale: nano-resolution addends stay exact for |value| < ~3e8
    # over month-sized groups, so trace-level readings (1e-5 precip)
    # survive; 1e4 would quantize them to zero.
    exact_sum = F.sum(F.round(F.col("value") * 1e9).cast("long"))
    agg_col = {
        "mean": (exact_sum / 1e9 / F.count(F.lit(1))),
        "min": F.min("value"),
        "max": F.max("value"),
        "count": F.count(F.lit(1)).cast("double"),
    }[agg]
    # If the day rows already carry an `aggregation` property, the
    # rollup name is APPENDED (raw -> raw.mean): collapsing it would
    # mix differently-aggregated day series, and overwriting it would
    # collide two distinct series onto one composite key.
    agg_tag = (
        F.concat_ws(".", F.col("aggregation"), F.lit(agg))
        if "aggregation" in extras
        else F.lit(agg)
    )
    return (
        day.groupBy(
            "datatype",
            "fill",
            "station_id",
            F.substring("date", 1, 7).alias("date"),
            *extras,
        )
        .agg(agg_col.alias("value"))
        .withColumns({"period": F.lit("month"), "aggregation": agg_tag})
        .select(
            "station_id", "date", "value", "datatype", "period", "fill",
            *[c for c in extras if c != "aggregation"], "aggregation",
        )
    )
