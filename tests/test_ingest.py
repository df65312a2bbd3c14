import pytest
from pyspark.sql import functions as F

from station_data_ingestion_spark.plans.jobspec import DataItemSpec
from station_data_ingestion_spark.sources import wide_csv


def make_spec(**kw):
    base = dict(
        files=[],
        datatype="temperature",
        period="day",
        fill="raw",
        start_date="2022-03-02",
        end_date="2022-03-05",
        additional_properties={"aggregation": "min"},
        additional_key_properties=["aggregation"],
    )
    base.update(kw)
    return DataItemSpec(**base)


def test_classify_headers_drops_unknown_and_prunes(spark, wide_csv_day):
    spec = make_spec()
    cols = wide_csv.read_header(spark, wide_csv_day)
    meta, date_cols = wide_csv.classify_headers(cols, spec)
    assert "Notes" not in meta and "Notes" not in date_cols
    assert meta["SKN"] == "skn" and meta["ELEV.m."] == "elevation_m"
    # inclusive both ends: 02..05 only
    assert date_cols == ["X2022.03.02", "X2022.03.03", "X2022.03.04", "X2022.03.05"]


def test_observations_long_output(spark, wide_csv_day):
    spec = make_spec()
    obs, meta = wide_csv.ingest_wide_csv(spark, wide_csv_day, spec)
    rows = {(r.station_id, r.date): r.value for r in obs.collect()}
    # NA cells and out-of-range dates excluded; station ids stay strings
    assert rows[("39.20", "2022-03-03")] == 22.0
    assert rows[("0042", "2022-03-04")] == 19.5
    assert ("39.20", "2022-03-02") not in rows  # NA
    assert ("39.20", "2022-03-01") not in rows  # out of range
    assert ("39.20", "2022-03-06") not in rows  # out of range
    sample = obs.limit(1).collect()[0]
    assert sample.datatype == "temperature"
    assert sample.period == "day"
    assert sample.fill == "raw"
    assert sample.aggregation == "min"
    # short/empty rows contribute nothing beyond their non-null cells
    assert all(sid in ("39.20", "0042") for sid, _ in rows)


def test_metadata_branch(spark, wide_csv_day):
    spec = make_spec()
    _obs, meta = wide_csv.ingest_wide_csv(spark, wide_csv_day, spec, location="hawaii")
    m = {r.skn: r.asDict() for r in meta.collect() if r.skn}
    assert m["39.20"]["name"] == "Kula"
    assert m["39.20"]["observer"] == "NA"  # sentinel survives the read
    assert m["0042"]["station_group"] == "hawaii_climate_primary"
    assert m["0042"]["id_field"] == "skn"


def test_strict_cast_raises_on_garbage(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("SKN,X2022.03.02\n1,oops\n")
    spec = make_spec()
    obs, _ = wide_csv.ingest_wide_csv(spark, str(p), spec)
    with pytest.raises(Exception, match="non-numeric observation value"):
        obs.collect()


def test_month_period(spark, tmp_path):
    p = tmp_path / "wide_month.csv"
    p.write_text("SKN,X2021.01,X2021.02,X2021.03\n5,1.0,NA,3.0\n")
    spec = make_spec(period="month", start_date="2021-01", end_date="2021-02")
    obs, _ = wide_csv.ingest_wide_csv(spark, str(p), spec)
    rows = {(r.station_id, r.date): r.value for r in obs.collect()}
    assert rows == {("5", "2021-01"): 1.0}


def test_flagship_groupby_over_ingested(spark, wide_csv_day):
    """SURVEY §7 M1: avg(value) per station over the ingested long table."""
    spec = make_spec()
    obs, _ = wide_csv.ingest_wide_csv(spark, wide_csv_day, spec)
    out = {
        r.station_id: r.avg_value
        for r in obs.groupBy("station_id")
        .agg(F.round(F.avg("value"), 3).alias("avg_value"))
        .collect()
    }
    assert out["39.20"] == round((22.0 + 22.5 + 23.0) / 3, 3)
    assert out["0042"] == round((18.0 + 19.5 + 20.0) / 3, 3)


def test_fast_and_declarative_paths_agree(spark, wide_csv_day):
    """The Arrow-native fast parse and the declarative unpivot produce the
    same rows/schema on the fixture (incl. its short and empty rows)."""
    spec = make_spec()
    a, _ = wide_csv.ingest_wide_csv(spark, wide_csv_day, spec, fast=True)
    b, _ = wide_csv.ingest_wide_csv(spark, wide_csv_day, spec, fast=False)
    # nullability flags may differ between the two plans; names/types must not
    assert [(f.name, f.dataType) for f in a.schema] == [
        (f.name, f.dataType) for f in b.schema
    ]
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_fast_path_used_for_local_file(spark, wide_csv_day):
    spec = make_spec()
    obs = wide_csv.observations_from_wide_fast(
        spark,
        wide_csv_day,
        wide_csv.read_header(spark, wide_csv_day),
        ["X2022.03.02"],
        spec,
    )
    assert obs is not None
    assert "MapInPandas" in obs._jdf.queryExecution().executedPlan().toString()


def test_positional_id_col_when_skn_absent(spark, tmp_path):
    """No SKN header -> the config's positional id_col designates the
    station-id column [reference: src/tapis_direct_driver.py:54-56]."""
    from station_data_ingestion_spark.plans.jobspec import DataItemSpec
    from station_data_ingestion_spark.sources.wide_csv import ingest_wide_csv

    p = tmp_path / "noskn.csv"
    p.write_text("Station.Name,STID,X2022.03.01\nKula,39.20,1.5\n")
    spec = DataItemSpec(
        files=[], datatype="t", period="day", fill="raw",
        start_date="2022-03-01", end_date="2022-03-01", id_col=1,
    )
    obs, _ = ingest_wide_csv(spark, str(p), spec)
    rows = obs.collect()
    assert len(rows) == 1
    assert rows[0]["station_id"] == "39.20" and rows[0]["value"] == 1.5


def test_batch_multi_file_ingest_matches_per_file(spark, tmp_path):
    """observations_from_wide_many_fast: many files, different header
    layouts, one plan == union of per-file ingests."""
    spec = make_spec(start_date="2022-01-01", end_date="2022-12-31")
    p1 = tmp_path / "jan.csv"
    p1.write_text("SKN,X2022.01.01,X2022.01.02\n1,1.0,NA\n2,2.0,2.5\n")
    p2 = tmp_path / "feb.csv"  # different date columns + extra metadata col
    p2.write_text("SKN,Station.Name,X2022.02.01\n1,Kula,3.5\n")
    p3 = tmp_path / "old.csv"  # all dates out of range -> contributes nothing
    p3.write_text("SKN,X2021.01.01\n1,9.9\n")
    paths = [str(p1), str(p2), str(p3)]
    batch = wide_csv.observations_from_wide_many_fast(spark, paths, spec)
    assert batch is not None
    per_file = None
    for p in paths:
        obs, _ = wide_csv.ingest_wide_csv(spark, p, spec)
        per_file = obs if per_file is None else per_file.unionAll(obs)
    assert batch.exceptAll(per_file).count() == 0
    assert per_file.exceptAll(batch).count() == 0
    assert batch.count() == 4  # jan: 3 non-NA cells, feb: 1, old: 0


def test_truncated_row_keeps_present_cells_both_paths(spark, tmp_path):
    """A truncated tail line (interrupted download) must contribute its
    present in-range cells on BOTH parse paths (PERMISSIVE parity), and
    an over-wide row is truncated to the header width."""
    p = tmp_path / "trunc.csv"
    p.write_text(
        "SKN,X2022.03.02,X2022.03.03\n"
        "1,10.0,11.0\n"
        "2,12.0\n"             # truncated: only first date present
        "3,13.0,14.0,99.0\n"   # over-wide: extra field dropped
    )
    spec = make_spec()
    fast, _ = wide_csv.ingest_wide_csv(spark, str(p), spec, fast=True)
    slow, _ = wide_csv.ingest_wide_csv(spark, str(p), spec, fast=False)
    expect = {
        ("1", "2022-03-02", 10.0), ("1", "2022-03-03", 11.0),
        ("2", "2022-03-02", 12.0),
        ("3", "2022-03-02", 13.0), ("3", "2022-03-03", 14.0),
    }
    got_fast = {(r.station_id, r.date, r.value) for r in fast.collect()}
    got_slow = {(r.station_id, r.date, r.value) for r in slow.collect()}
    assert got_fast == expect
    assert got_slow == expect


def test_blank_station_id_dropped_both_paths(spark, tmp_path):
    p = tmp_path / "blank_skn.csv"
    p.write_text("SKN,X2022.03.02\n,5.5\n1,6.0\n")
    spec = make_spec()
    for fast in (True, False):
        obs, _ = wide_csv.ingest_wide_csv(spark, str(p), spec, fast=fast)
        rows = {(r.station_id, r.value) for r in obs.collect()}
        assert rows == {("1", 6.0)}, (fast, rows)


def test_batch_ingest_raises_on_unusable_file(spark, tmp_path):
    import pytest

    good = tmp_path / "good.csv"
    good.write_text("SKN,X2022.03.02\n1,1.0\n")
    bad = tmp_path / "bad.csv"
    bad.write_text("")  # empty/corrupt file: no header at all
    spec = make_spec()
    with pytest.raises(ValueError, match="missing the SKN station-id"):
        wide_csv.observations_from_wide_many_fast(
            spark, [str(good), str(bad)], spec
        )


def test_whitespace_padded_numeric_both_paths(spark, tmp_path):
    """' 1.5' must parse on BOTH paths (reference float() trims); a
    whitespace-only cell must RAISE on both (survives the '' filter,
    fails the cast)."""
    p = tmp_path / "pad.csv"
    p.write_text("SKN,X2022.03.02,X2022.03.03\n1, 1.5 ,2.0\n")
    spec = make_spec()
    for fast in (True, False):
        obs, _ = wide_csv.ingest_wide_csv(spark, str(p), spec, fast=fast)
        rows = {(r.date, r.value) for r in obs.collect()}
        assert rows == {("2022-03-02", 1.5), ("2022-03-03", 2.0)}, (fast, rows)

    bad = tmp_path / "ws.csv"
    bad.write_text("SKN,X2022.03.02\n1,  \n")
    for fast in (True, False):
        obs, _ = wide_csv.ingest_wide_csv(spark, str(bad), spec, fast=fast)
        import pytest

        with pytest.raises(Exception, match="non-numeric observation value"):
            obs.collect()


def test_empty_cell_dropped_both_paths_documented_divergence(spark, tmp_path):
    """Genuinely empty in-range cells drop as missing on both paths (the
    documented divergence from the reference's float('') ValueError)."""
    p = tmp_path / "empty_cell.csv"
    p.write_text("SKN,X2022.03.02,X2022.03.03\n1,,7.0\n")
    spec = make_spec()
    for fast in (True, False):
        obs, _ = wide_csv.ingest_wide_csv(spark, str(p), spec, fast=fast)
        rows = {(r.date, r.value) for r in obs.collect()}
        assert rows == {("2022-03-03", 7.0)}, (fast, rows)


def test_data_col_start_positional_contract(spark):
    """A date-shaped header BEFORE data_col_start is not a data column."""
    from station_data_ingestion_spark.plans.jobspec import DataItemSpec

    spec = DataItemSpec(
        files=[], datatype="temperature", period="day", fill="raw",
        start_date="2022-03-01", end_date="2022-03-05", data_col_start=2,
    )
    cols = ["SKN", "X2022.03.01", "X2022.03.02", "X2022.03.03"]
    _meta, dates = wide_csv.classify_headers(cols, spec)
    assert dates == ["X2022.03.02", "X2022.03.03"]  # index 1 excluded
