from datetime import date

from station_data_ingestion_spark.plans.jobspec import DataItemSpec, JobSpec
from station_data_ingestion_spark.plans.runner import Manifest, run_job, template_dates
from station_data_ingestion_spark.plans.snapshot_store import read_table


def test_template_dates():
    out = template_dates('{"start_date": "%y-%m-%d"}', on=date(2022, 3, 5))
    assert out == '{"start_date": "2022-03-05"}'


def make_job(csv_path):
    item = DataItemSpec(
        files=[csv_path],
        datatype="temperature",
        period="day",
        fill="raw",
        start_date="2022-03-02",
        end_date="2022-03-05",
        additional_properties={"aggregation": "min"},
        additional_key_properties=["aggregation"],
    )
    return JobSpec(data=[item])


def test_run_job_end_to_end_and_resume(spark, wide_csv_day, tmp_path):
    table = str(tmp_path / "obs_table")
    manifest = str(tmp_path / "manifest.json")
    job = make_job(wide_csv_day)

    stats = run_job(spark, job, table, manifest)
    s = stats[wide_csv_day]
    assert s.created == 6 and s.replaced == 0  # 3 + 3 non-NA in-range cells

    obs = read_table(spark, table)
    assert obs.count() == 6
    assert set(obs.select("datatype").distinct().toPandas()["datatype"]) == {"temperature"}

    # resume: file marked complete -> skipped entirely
    stats2 = run_job(spark, job, table, manifest)
    assert stats2 == {}
    assert Manifest(manifest).all_complete([wide_csv_day])

    # re-run without manifest: idempotent (all no-ops)
    stats3 = run_job(spark, job, table, None)
    s3 = stats3[wide_csv_day]
    assert s3.created == 0 and s3.replaced == 0
    assert read_table(spark, table).count() == 6


def test_zero_row_run_then_rerun(spark, tmp_path):
    """A file with no in-range data writes an empty table; re-running against
    that empty table dir must not crash (UNABLE_TO_INFER_SCHEMA guard)."""
    p = tmp_path / "empty_range.csv"
    p.write_text("SKN,X2021.01.01\n7,5.5\n")
    item = DataItemSpec(
        files=[str(p)], datatype="t", period="day", fill="raw",
        start_date="2022-03-01", end_date="2022-03-03",
    )
    job = JobSpec(data=[item])
    table = str(tmp_path / "obs_table")
    s1 = run_job(spark, job, table, None)[str(p)]
    assert s1.created == 0 and s1.replaced == 0
    s2 = run_job(spark, job, table, None)[str(p)]
    assert s2.created == 0 and s2.replaced == 0


def test_run_job_writes_sparse_metadata(spark, tmp_path, wide_csv_day):
    """With a metadata transport, run_job emits sparse station docs:
    nodata fields dropped per record, station_group injected."""
    from station_data_ingestion_spark.operators.sinks import (
        jsonl_dir_transport,
        read_jsonl_docs,
    )
    from station_data_ingestion_spark.plans.jobspec import JobSpec
    from station_data_ingestion_spark.plans.runner import run_job

    out = str(tmp_path / "meta_docs")
    cfg = {
        "data": [
            {
                "files": [wide_csv_day],
                "datatype": "temperature",
                "period": "day",
                "fill": "raw",
                "start_date": "2022-03-01",
                "end_date": "2022-03-06",
            }
        ]
    }
    run_job(
        spark,
        JobSpec.from_dict(cfg),
        str(tmp_path / "obs"),
        str(tmp_path / "m.json"),
        metadata_transport=lambda: jsonl_dir_transport(out),
    )
    docs = {d["skn"]: d for d in read_jsonl_docs(out) if "skn" in d}
    kula = docs["39.20"]
    assert kula["station_group"] == "hawaii_climate_primary"
    assert kula["name"] == "Kula"
    assert "observer" not in kula  # NA field dropped per record
    assert docs["0042"]["observer"] == "Obs2"


def test_run_job_batch_files_mode(spark, tmp_path):
    """batch_files=True: one plan over all pending files, same final
    table as the sequential loop, manifest marks every file complete."""
    import json

    from station_data_ingestion_spark.plans.jobspec import JobSpec
    from station_data_ingestion_spark.plans.runner import run_job

    (tmp_path / "jan.csv").write_text("SKN,X2022.01.01,X2022.01.02\n1,1.0,NA\n2,2.0,2.5\n")
    (tmp_path / "feb.csv").write_text("SKN,X2022.02.01\n1,3.5\n")
    cfg = {
        "data": [
            {
                "files": [str(tmp_path / "jan.csv"), str(tmp_path / "feb.csv")],
                "datatype": "temperature",
                "period": "day",
                "fill": "raw",
                "start_date": "2022-01-01",
                "end_date": "2022-12-31",
            }
        ]
    }
    seq_table = str(tmp_path / "obs_seq")
    bat_table = str(tmp_path / "obs_bat")
    run_job(spark, JobSpec.from_dict(cfg), seq_table)
    manifest_path = str(tmp_path / "manifest.json")
    stats = run_job(
        spark, JobSpec.from_dict(cfg), bat_table, manifest_path,
        batch_files=True,
    )
    assert set(stats) == set(cfg["data"][0]["files"])
    assert all(s.created == 4 for s in stats.values())  # batch totals
    a = read_table(spark, seq_table)
    b = read_table(spark, bat_table)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    m = json.load(open(manifest_path))
    assert all(m[f]["complete"] for f in cfg["data"][0]["files"])
    # additive stats: totals live ONCE on the batch record, never per file
    assert all("created" not in m[f] for f in cfg["data"][0]["files"])
    batches = list(m["__batches__"].values())
    assert len(batches) == 1 and batches[0]["created"] == 4
    assert sorted(batches[0]["files"]) == sorted(cfg["data"][0]["files"])
    # resume: everything complete -> second batched run is a no-op
    again = run_job(
        spark, JobSpec.from_dict(cfg), bat_table, manifest_path,
        batch_files=True,
    )
    assert again == {}


def _big_wide_csv(tmp_path, n_rows=40):
    header = "SKN,Station.Name," + ",".join(
        f"X2022.03.{d:02d}" for d in range(1, 6)
    )
    rows = [
        f"s{i:03d},St{i}," + ",".join(f"{i}.{d}" for d in range(1, 6))
        for i in range(n_rows)
    ]
    p = tmp_path / "big_wide.csv"
    p.write_text(header + "\n" + "\n".join(rows) + "\n")
    return str(p)


def _ranged_job(csv_path):
    item = DataItemSpec(
        files=[csv_path],
        datatype="temperature",
        period="day",
        fill="raw",
        start_date="2022-03-01",
        end_date="2022-03-05",
    )
    return JobSpec(data=[item])


def test_mid_file_resume_reingests_only_unfinished_ranges(
    spark, tmp_path, monkeypatch
):
    """Kill mid-file, resume: only unfinished byte ranges re-ingest and the
    final table equals an uninterrupted run [reference: README.md:41-43]."""
    import station_data_ingestion_spark.plans.runner as runner_mod
    from station_data_ingestion_spark.plans.snapshot_store import read_table

    csv = _big_wide_csv(tmp_path)
    plain_table = str(tmp_path / "plain_run")
    run_job(spark, _ranged_job(csv), plain_table)  # uninterrupted baseline
    want = sorted(
        map(tuple, read_table(spark, plain_table).select(
            "station_id", "date", "value").collect())
    )
    assert len(want) == 40 * 5

    table = str(tmp_path / "ranged_run")
    manifest = str(tmp_path / "m.json")
    real_merge = runner_mod._merge_into_table
    calls = {"n": 0}

    def dying_merge(*a, **kw):
        calls["n"] += 1
        if calls["n"] >= 3:
            raise RuntimeError("simulated crash mid-file")
        return real_merge(*a, **kw)

    monkeypatch.setattr(runner_mod, "_merge_into_table", dying_merge)
    try:
        run_job(
            spark, _ranged_job(csv), table, manifest,
            resume_ranges_bytes=150, ranges_per_commit=2,
        )
        raise AssertionError("expected the simulated crash")
    except RuntimeError as e:
        assert "simulated crash" in str(e)
    monkeypatch.setattr(runner_mod, "_merge_into_table", real_merge)

    st = Manifest(manifest).range_state(csv)
    n_done = len(st["ranges"])
    assert n_done == 4  # two groups of two ranges committed before death
    assert not Manifest(manifest).is_complete(csv)

    # resume: re-ingests only the remaining ranges
    calls2 = {"n": 0}

    def counting_merge(*a, **kw):
        calls2["n"] += 1
        return real_merge(*a, **kw)

    monkeypatch.setattr(runner_mod, "_merge_into_table", counting_merge)
    stats = run_job(
        spark, _ranged_job(csv), table, manifest,
        resume_ranges_bytes=150, ranges_per_commit=2,
    )
    got = sorted(
        map(tuple, read_table(spark, table).select(
            "station_id", "date", "value").collect())
    )
    assert got == want
    entry = Manifest(manifest).state[csv]
    assert entry["complete"] and entry["created"] == 40 * 5  # additive total
    import math
    total_ranges = len(entry["ranges"])
    remaining_groups = math.ceil((total_ranges - n_done) / 2)
    assert calls2["n"] == remaining_groups  # completed ranges NOT re-merged
    # third run: file complete -> no work at all
    assert run_job(
        spark, _ranged_job(csv), table, manifest,
        resume_ranges_bytes=150, ranges_per_commit=2,
    ) == {}
    assert 0 < stats[csv].created < 40 * 5  # this run's ranges only


def test_concurrent_merges_same_slice_never_lose_updates(spark, tmp_path):
    """Two merges race on ONE (datatype, period) slice: the loser's CAS
    publish fails (table advanced past the version it merged against),
    and the redo loop re-reads + re-merges — the rival's rows survive.
    Under last-publisher-wins rebase they would be silently dropped."""
    from station_data_ingestion_spark.plans.runner import _merge_into_table
    from station_data_ingestion_spark.plans.snapshot_store import SnapshotTable

    table = str(tmp_path / "obs_race")
    item = DataItemSpec(
        files=[], datatype="temperature", period="day", fill="raw",
        start_date="2022-03-01", end_date="2022-03-31",
    )

    def obs(station, value):
        return spark.createDataFrame(
            [(station, "2022-03-01", value, "temperature", "day", "raw")],
            "station_id string, date string, value double, "
            "datatype string, period string, fill string",
        )

    # seed (also exercises the bootstrap CAS path, expected_version=0)
    _merge_into_table(spark, obs("1", 1.0), item, table)

    orig = SnapshotTable._write_manifest_exclusive
    state = {"fired": False}

    def hooked(self, version, manifest):
        if not state["fired"]:
            state["fired"] = True
            # rival merge lands BETWEEN writer1's read and its publish
            s = _merge_into_table(spark, obs("3", 3.0), item, table)
            assert s.created == 1
        return orig(self, version, manifest)

    SnapshotTable._write_manifest_exclusive = hooked
    try:
        stats = _merge_into_table(spark, obs("2", 2.0), item, table)
    finally:
        SnapshotTable._write_manifest_exclusive = orig
    assert state["fired"]
    assert stats.created == 1

    got = {(r.station_id, r.value) for r in read_table(spark, table).collect()}
    assert got == {("1", 1.0), ("2", 2.0), ("3", 3.0)}, got
