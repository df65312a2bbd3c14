"""JSON-lines source tests: strictness contract + quarantine split."""

import pytest

from station_data_ingestion_spark.sources.jsonl import (
    CORRUPT_COL,
    quarantine_split,
    read_jsonl,
)

_DDL = "id long, name string, score double"


def _write(tmp_path, lines, name="data.jsonl"):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_failfast_reads_clean_lines(spark, tmp_path):
    path = _write(
        tmp_path,
        ['{"id": 1, "name": "a", "score": 1.5}', '{"id": 2, "name": "b", "score": 2.0}'],
    )
    rows = sorted(
        (r.id, r.name, r.score) for r in read_jsonl(spark, path, _DDL).collect()
    )
    assert rows == [(1, "a", 1.5), (2, "b", 2.0)]


def test_failfast_raises_on_malformed_line(spark, tmp_path):
    path = _write(tmp_path, ['{"id": 1, "name": "a", "score": 1.0}', "{not json"])
    with pytest.raises(Exception):
        read_jsonl(spark, path, _DDL).collect()


def test_permissive_quarantines_malformed_lines(spark, tmp_path):
    path = _write(
        tmp_path,
        [
            '{"id": 1, "name": "a", "score": 1.0}',
            "{broken",
            '{"id": 3, "name": "c", "score": 3.0}',
        ],
    )
    df = read_jsonl(spark, path, _DDL, mode="permissive")
    clean, bad = quarantine_split(df)
    assert sorted(r.id for r in clean.collect()) == [1, 3]
    bad_rows = [r[CORRUPT_COL] for r in bad.collect()]
    assert bad_rows == ["{broken"], "raw malformed line must be preserved"


def test_mode_validation():
    with pytest.raises(ValueError):
        read_jsonl(None, "x", _DDL, mode="dropmalformed")
