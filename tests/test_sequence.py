"""Sequence pattern matching (operators/sequence.py)."""

from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.sequence import (
    count_pattern,
    encode_sequences,
)


def _seqs(spark, rows):
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, t string")
    return encode_sequences(
        df, key="user_id", order_cols=["ts", "event_id"], code=F.col("t")
    )


def test_encoding_orders_by_ts_then_tiebreak(spark):
    rows = [(1, 10, 2, "b"), (1, 10, 1, "a"), (1, 5, 9, "z"), (2, 1, 1, "q")]
    got = {r["user_id"]: r["seq"] for r in _seqs(spark, rows).collect()}
    assert got == {1: "zab", 2: "q"}


def test_nonoverlapping_leftmost_counting(spark):
    # s c p s p -> two matches; the middle 's c p' cannot re-use rows
    rows = [(1, i, i, t) for i, t in enumerate("scpsp")]
    # s c s p -> ONE match: leftmost 's' fails (s not in [cv]), scan
    # resumes and the second s..p matches -- skip-past-last-row
    rows += [(2, i, i, t) for i, t in enumerate("scsp")]
    # e between s and p breaks the run
    rows += [(3, i, i, t) for i, t in enumerate("scep")]
    out = {
        r["user_id"]: r["n_matches"]
        for r in count_pattern(_seqs(spark, rows), "s[cv]*p").collect()
    }
    assert out == {1: 2, 2: 1, 3: 0}


def test_whale_key_guard_raises_loudly(spark):
    import pytest
    from pyspark.sql import functions as F

    from station_data_ingestion_spark.operators.sequence import (
        count_pattern,
        encode_sequences,
    )

    rows = [("u1", i, "c") for i in range(5)] + [
        ("whale", i, "c") for i in range(500)
    ]
    df = spark.createDataFrame(rows, "user_id string, ts long, ev string")
    code = F.substring("ev", 1, 1)

    # under the cap: identical to the unguarded result
    ok = encode_sequences(
        df.filter("user_id = 'u1'"), "user_id", ["ts"], code,
        max_events_per_key=100,
    )
    assert ok.collect()[0]["seq"] == "ccccc"

    whaled = encode_sequences(
        df, "user_id", ["ts"], code, max_events_per_key=100
    )
    with pytest.raises(Exception, match="whale key whale"):
        whaled.collect()

    with pytest.raises(ValueError, match="positive"):
        encode_sequences(df, "user_id", ["ts"], code, max_events_per_key=0)

    # no cap: legacy behavior untouched
    legacy = count_pattern(
        encode_sequences(df, "user_id", ["ts"], code), "c+"
    )
    assert legacy.count() == 2
