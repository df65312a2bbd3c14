"""Timestamp-encoding robustness: the corpus has shipped events.ts as
parquet TIMESTAMP(NANOS) (round 1) and as timestamp[us]/TIMESTAMP_NTZ
(round 2's regeneration, which broke every ts-dependent query). These
tests pin that all three plausible parquet encodings of the SAME
wall-clock instants produce IDENTICAL query output, so the next corpus
regeneration cannot silently break the engine again.

Encodings under test (written with pyarrow):
- ``us``      timestamp[us], no zone  -> Spark reads TIMESTAMP_NTZ
- ``ns``      timestamp[ns]           -> parquet TIMESTAMP(NANOS), Spark
              reads a nanos bigint via spark.sql.legacy.parquet.nanosAsLong
- ``us_utc``  timestamp[us, tz=UTC]   -> Spark reads zoned TIMESTAMP
"""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from station_data_ingestion_spark.queries.registry import load, normalize_event_ts

ENCODINGS = ("us", "ns", "us_utc")

_T0 = dt.datetime(2024, 3, 1, 9, 0, 0)


def _rows():
    """~40 deterministic events: 4 users x (signup, clicks, purchases)
    spread over several hours so sessionization/as-of/funnel all have
    non-trivial output."""
    rows = []
    eid = 0
    for u in range(4):
        base = _T0 + dt.timedelta(minutes=17 * u)
        rows.append((eid, base, u, "signup", 1.0, "{}")); eid += 1
        for i in range(5):
            rows.append(
                (eid, base + dt.timedelta(minutes=3 + 41 * i), u, "click",
                 round(0.5 + 0.25 * i, 2), "{}"))
            eid += 1
        for i in range(3):
            rows.append(
                (eid, base + dt.timedelta(minutes=29 + 67 * i), u, "purchase",
                 round(9.99 + i, 2), "{}"))
            eid += 1
        # a burst >30min after the last event: a second session
        rows.append((eid, base + dt.timedelta(hours=6), u, "click", 0.1, "{}"))
        eid += 1
    return rows


def _write_events(path: str, encoding: str) -> None:
    rows = _rows()
    ts_type = {
        "us": pa.timestamp("us"),
        "ns": pa.timestamp("ns"),
        "us_utc": pa.timestamp("us", tz="UTC"),
    }[encoding]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows]).cast(ts_type),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, path)


@pytest.fixture(scope="module")
def encoded_dirs(spark, tmp_path_factory):
    """One sf_dir per encoding, each holding only events.parquet."""
    dirs = {}
    for enc in ENCODINGS:
        d = tmp_path_factory.mktemp(f"enc_{enc}")
        _write_events(str(d / "events.parquet"), enc)
        dirs[enc] = str(d)
    return dirs


def test_fixture_encodings_differ_on_disk(encoded_dirs):
    """The fixtures really are distinct parquet physical types."""
    got = {
        enc: str(pq.read_schema(f"{d}/events.parquet").field("ts").type)
        for enc, d in encoded_dirs.items()
    }
    assert got == {
        "us": "timestamp[us]",
        "ns": "timestamp[ns]",
        "us_utc": "timestamp[us, tz=UTC]",
    }


def test_load_normalizes_all_encodings_to_timestamp(spark, encoded_dirs):
    outs = {}
    for enc, d in encoded_dirs.items():
        df = load(spark, d, "events")["events"]
        assert dict(df.dtypes)["ts"] == "timestamp", f"{enc}: {df.dtypes}"
        outs[enc] = sorted(
            (r.event_id, r.iso)
            for r in df.select(
                "event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("iso")
            ).collect()
        )
    assert outs["us"] == outs["ns"] == outs["us_utc"]
    assert outs["us"][0][1] == "2024-03-01 09:00:00"


@pytest.mark.parametrize(
    "qname",
    [
        "events_sessionization",
        "events_daily_active_users",
        "events_funnel_signup_purchase",
        "asof_purchase_last_click",
        "range_join_signup_hour_activity",
        "events_tumbling_hourly",
    ],
)
def test_ts_queries_identical_across_encodings(spark, encoded_dirs, qname):
    from station_data_ingestion_spark.queries import QUERIES

    results = {}
    for enc, d in encoded_dirs.items():
        df = QUERIES[qname].fn(spark, d)
        results[enc] = sorted(map(tuple, df.collect()))
    assert results["us"] == results["ns"], qname
    assert results["us"] == results["us_utc"], qname
    assert len(results["us"]) > 0, f"{qname} trivially empty"


@pytest.mark.parametrize("enc", list(ENCODINGS))
def test_streaming_tumbling_over_each_encoding(spark, encoded_dirs, enc, tmp_path):
    """A file stream over each raw encoding drains through the watermarked
    tumbling window (normalize_event_ts runs inside the streaming op)."""
    from station_data_ingestion_spark.streaming import windows as W

    import shutil

    raw = spark.read.parquet(f"{encoded_dirs[enc]}/events.parquet")
    # file streams want a directory of files, not one file
    src = tmp_path / "stream_src"
    src.mkdir()
    shutil.copy(f"{encoded_dirs[enc]}/events.parquet", src / "part-0.parquet")
    stream = spark.readStream.schema(raw.schema).parquet(str(src))
    name = f"enc_tumble_{enc}"
    q = (
        W.tumbling_counts(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.table(name).collect()))
    # batch twin over the normalized load
    exp = sorted(
        map(
            tuple,
            normalize_event_ts(raw)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                (F.sum(F.round(F.col("value") * 10000).cast("long")) / 10000.0).alias(
                    "total_value"
                ),
            )
            .select(
                F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias(
                    "window_start"
                ),
                "event_type",
                "n_events",
                "total_value",
            )
            .collect(),
        )
    )
    assert got == exp and len(got) > 0
