"""Remote CSV staging source: HTTP fetch, reuse, retry, runner wiring."""

import http.server
import threading

import pytest

from station_data_ingestion_spark.sources.remote import is_remote, stage_if_remote

CSV = "SKN,X2022.03.01\n1.0,2.5\n"


@pytest.fixture()
def http_root(tmp_path):
    (tmp_path / "w.csv").write_text(CSV)
    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=str(tmp_path), **kw
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_local_paths_pass_through(tmp_path):
    p = str(tmp_path / "x.csv")
    assert not is_remote(p)
    assert stage_if_remote(p, str(tmp_path / "stage")) == p


def test_http_fetch_and_reuse(http_root, tmp_path):
    stage = str(tmp_path / "stage")
    local = stage_if_remote(f"{http_root}/w.csv", stage)
    assert open(local).read() == CSV
    # second call reuses the staged file (mtime unchanged)
    import os

    mtime = os.path.getmtime(local)
    assert stage_if_remote(f"{http_root}/w.csv", stage) == local
    assert os.path.getmtime(local) == mtime


def test_http_404_raises_after_retries(http_root, tmp_path, monkeypatch):
    import station_data_ingestion_spark.operators.sinks as sinks

    sleeps = []
    monkeypatch.setattr(
        "station_data_ingestion_spark.operators.sinks.time.sleep", sleeps.append
    )
    with pytest.raises(Exception):
        stage_if_remote(f"{http_root}/missing.csv", str(tmp_path / "s"), retries=2)


def test_runner_ingests_remote_file(spark, http_root, tmp_path):
    from station_data_ingestion_spark.plans.jobspec import JobSpec
    from station_data_ingestion_spark.plans.runner import run_job

    cfg = {
        "data": [
            {
                "files": [f"{http_root}/w.csv"],
                "datatype": "t",
                "period": "day",
                "fill": "raw",
                "start_date": "2022-03-01",
                "end_date": "2022-03-01",
            }
        ]
    }
    obs_path = str(tmp_path / "obs")
    stats = run_job(
        spark,
        JobSpec.from_dict(cfg),
        obs_path,
        str(tmp_path / "m.json"),
        staging_dir=str(tmp_path / "stage"),
    )
    assert stats[f"{http_root}/w.csv"].created == 1
    rows = spark.read.parquet(obs_path).collect()
    assert len(rows) == 1 and rows[0]["station_id"] == "1.0"
