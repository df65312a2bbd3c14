import json

import pytest

from station_data_ingestion_spark.operators import sinks


def test_backoff_schedule_shape():
    delays = list(sinks.backoff_delays(5, seed=7))
    assert len(delays) == 5
    assert 0.25 <= delays[0] <= 0.5
    for prev, cur in zip(delays, delays[1:]):
        assert 2 * prev <= cur <= 3 * prev


def test_with_retries_gives_up():
    calls = []

    def boom():
        calls.append(1)
        raise RuntimeError("nope")

    with pytest.raises(RuntimeError):
        sinks.with_retries(boom, retries=3, sleep=lambda s: None)
    assert len(calls) == 4  # initial + 3 retries


def test_with_retries_recovers():
    state = {"n": 0}

    def flaky():
        state["n"] += 1
        if state["n"] < 3:
            raise RuntimeError("flaky")

    sinks.with_retries(flaky, retries=5, sleep=lambda s: None)
    assert state["n"] == 3


def test_write_docs_chunks(spark, tmp_path):
    out = tmp_path / "sink"
    df = spark.range(1050).selectExpr("id", "id * 2 as v")
    sinks.write_docs(
        df,
        lambda: sinks.jsonl_dir_transport(str(out)),
        chunk_size=500,
        max_parallelism=1,
    )
    docs = sinks.read_jsonl_docs(str(out))
    assert len(docs) == 1050
    assert {d["id"] for d in docs} == set(range(1050))
    # chunking: 1050 docs on 1 partition -> 3 chunk files
    files = [p for p in out.iterdir() if p.suffix == ".jsonl"]
    assert len(files) == 3


def test_sparse_json_docs_drops_nodata(spark):
    df = spark.createDataFrame(
        [("1", "Kula", "NA"), ("2", "NA", "obs")],
        "skn string, name string, observer string",
    )
    docs = [json.loads(r.json) for r in sinks.sparse_json_docs(df, "NA").collect()]
    by_skn = {d["skn"]: d for d in docs}
    assert "observer" not in by_skn["1"] and by_skn["1"]["name"] == "Kula"
    assert "name" not in by_skn["2"] and by_skn["2"]["observer"] == "obs"


def test_envelope_docs(spark):
    df = spark.createDataFrame([("1", 2.0)], "station_id string, value double")
    doc = json.loads(sinks.envelope_docs(df).collect()[0].json)
    assert doc["name"] == "hcdp_station_value"
    assert doc["value"] == {"station_id": "1", "value": 2.0}
