"""Day->month rollup: values, key safety, merge idempotency."""

import pytest
from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.merge import merge_observations
from station_data_ingestion_spark.operators.rollup import rollup_monthly


def _obs(spark, rows):
    return spark.createDataFrame(
        rows,
        "station_id string, date string, value double, datatype string, "
        "period string, fill string",
    )


def test_rollup_monthly_mean(spark):
    obs = _obs(
        spark,
        [
            ("s1", "2022-03-01", 10.0, "t", "day", "raw"),
            ("s1", "2022-03-02", 20.0, "t", "day", "raw"),
            ("s1", "2022-04-01", 7.0, "t", "day", "raw"),
            ("s2", "2022-03-05", 5.0, "t", "day", "raw"),
            ("s1", "2022-03", 99.0, "t", "month", "raw"),  # ignored: not day
        ],
    )
    out = {
        (r.station_id, r.date): (r.value, r.period, r.aggregation)
        for r in rollup_monthly(obs).collect()
    }
    assert out[("s1", "2022-03")] == (15.0, "month", "mean")
    assert out[("s1", "2022-04")] == (7.0, "month", "mean")
    assert out[("s2", "2022-03")] == (5.0, "month", "mean")
    assert len(out) == 3


def test_rollup_bad_agg_raises(spark):
    with pytest.raises(ValueError, match="agg must be one of"):
        rollup_monthly(_obs(spark, []), agg="median")


def test_rollup_appends_to_existing_aggregation(spark):
    obs = _obs(
        spark,
        [
            ("s1", "2022-03-01", 1.0, "t", "day", "raw"),
            ("s1", "2022-03-01", 9.0, "t", "day", "raw"),
        ],
    ).withColumn(
        "aggregation", F.when(F.col("value") < 5, "min").otherwise("max")
    )
    out = {
        r.aggregation: r.value for r in rollup_monthly(obs, agg="mean").collect()
    }
    # two distinct day series stay distinct series after rollup
    assert out == {"min.mean": 1.0, "max.mean": 9.0}


def test_rollup_merge_is_idempotent(spark):
    obs = _obs(
        spark,
        [
            ("s1", "2022-03-01", 10.0, "t", "day", "raw"),
            ("s1", "2022-03-02", 20.5, "t", "day", "raw"),
        ],
    )
    keys = ["datatype", "period", "date", "fill", "station_id", "aggregation"]
    m1 = rollup_monthly(obs)
    merged, stats = merge_observations(
        spark.createDataFrame([], m1.schema), m1, keys
    )
    assert stats.created == 1
    # re-rolling the same days produces bit-identical values -> no-op
    merged2, stats2 = merge_observations(merged, rollup_monthly(obs), keys)
    assert stats2.created == 0 and stats2.replaced == 0


def test_rollup_mean_preserves_trace_values(spark):
    obs = _obs(
        spark,
        [
            ("s1", "2022-03-01", 0.00004, "t", "day", "raw"),
            ("s1", "2022-03-02", 0.00004, "t", "day", "raw"),
        ],
    )
    [r] = rollup_monthly(obs).collect()
    assert r.value == pytest.approx(0.00004, rel=1e-6)
