from datetime import datetime

import pytest

from station_data_ingestion_spark.functions import dates


def test_header_regex_day():
    assert dates.is_date_header("X2022.03.01", "day")
    assert not dates.is_date_header("X2022.03", "day")
    assert not dates.is_date_header("X2022.3.1", "day")
    assert not dates.is_date_header("SKN", "day")
    assert not dates.is_date_header("X2022.03.01.extra", "day")


def test_header_regex_month():
    assert dates.is_date_header("X2021.12", "month")
    assert not dates.is_date_header("X2021.12.01", "month")


def test_parse_and_iso_roundtrip():
    assert dates.header_to_iso("X2022.03.05", "day") == "2022-03-05"
    assert dates.header_to_iso("X2021.07", "month") == "2021-07"
    assert dates.parse_iso("2022-03-05", "day") == datetime(2022, 3, 5)
    assert dates.parse_iso("2021-07", "month") == datetime(2021, 7, 1)


def test_unknown_period_raises():
    with pytest.raises(ValueError):
        dates.is_date_header("X2022.03.01", "year")
    with pytest.raises(ValueError):
        dates.parse_iso("2022-03-05", "hour")


def test_range_inclusive_both_ends():
    r = dates.DateRange.from_iso("2022-03-02", "2022-03-05", "day")
    assert not r.contains_header("X2022.03.01")
    assert r.contains_header("X2022.03.02")
    assert r.contains_header("X2022.03.05")
    assert not r.contains_header("X2022.03.06")


def test_range_end_before_start_raises():
    with pytest.raises(ValueError):
        dates.DateRange.from_iso("2022-03-05", "2022-03-02", "day")
