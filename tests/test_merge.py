import pytest

from station_data_ingestion_spark.operators.merge import (
    RecordKeyError,
    merge_observations,
)

KEY = ["datatype", "period", "date", "fill", "station_id", "aggregation"]
SCHEMA = (
    "station_id string, date string, value double, datatype string, "
    "period string, fill string, aggregation string"
)


def row(sid, d, v):
    return (sid, d, v, "temperature", "day", "raw", "min")


def make(spark, rows):
    return spark.createDataFrame([row(*r) for r in rows], SCHEMA)


def collect_vals(df):
    return {(r.station_id, r.date): r.value for r in df.collect()}


def test_create_replace_noop_matrix(spark):
    # FIXTURES.md §4 matrix: exact-dup (no-op), changed (replace),
    # target-only (untouched), update-only (create)
    target = make(spark, [("1", "2022-03-01", 10.0), ("2", "2022-03-01", 20.0), ("3", "2022-03-01", 30.0)])
    updates = make(spark, [("1", "2022-03-01", 10.0), ("2", "2022-03-01", 99.0), ("4", "2022-03-01", 40.0)])
    merged, stats = merge_observations(target, updates, KEY, replace=True)
    assert stats.created == 1 and stats.replaced == 1
    vals = collect_vals(merged)
    assert vals == {
        ("1", "2022-03-01"): 10.0,
        ("2", "2022-03-01"): 99.0,
        ("3", "2022-03-01"): 30.0,
        ("4", "2022-03-01"): 40.0,
    }


def test_replace_false_drops_changed(spark):
    target = make(spark, [("2", "2022-03-01", 20.0)])
    updates = make(spark, [("2", "2022-03-01", 99.0), ("4", "2022-03-01", 40.0)])
    merged, stats = merge_observations(target, updates, KEY, replace=False)
    assert stats.created == 1 and stats.replaced == 0
    vals = collect_vals(merged)
    assert vals[("2", "2022-03-01")] == 20.0  # kept, not replaced
    assert vals[("4", "2022-03-01")] == 40.0  # still created


def test_multi_match_raises(spark):
    target = make(spark, [("2", "2022-03-01", 20.0), ("2", "2022-03-01", 21.0)])
    updates = make(spark, [("2", "2022-03-01", 99.0)])
    with pytest.raises(RecordKeyError):
        merge_observations(target, updates, KEY, replace=True)


def test_duplicate_target_key_untouched_is_ok(spark):
    # duplicate keys in the target are only an error when an update hits them
    target = make(spark, [("9", "2022-03-01", 1.0), ("9", "2022-03-01", 2.0)])
    updates = make(spark, [("4", "2022-03-01", 40.0)])
    merged, stats = merge_observations(target, updates, KEY, replace=True)
    assert stats.created == 1
    assert merged.count() == 3


def test_merge_idempotent(spark):
    target = make(spark, [("1", "2022-03-01", 10.0)])
    updates = make(spark, [("1", "2022-03-01", 11.0), ("2", "2022-03-02", 2.0)])
    once, _ = merge_observations(target, updates, KEY)
    twice, stats2 = merge_observations(once, updates, KEY)
    assert stats2.created == 0 and stats2.replaced == 0
    assert collect_vals(once) == collect_vals(twice)


def test_exact_duplicate_updates_collapse(spark):
    """Two identical update rows for one key create ONE row (idempotent
    dedup on the update side), not a duplicate-key pair."""
    from station_data_ingestion_spark.operators.merge import merge_observations

    keys = ["datatype", "period", "date", "fill", "station_id"]
    mk = lambda v: ("t", "day", "2022-03-01", "raw", "s1", v)  # noqa: E731
    schema = "datatype string, period string, date string, fill string, station_id string, value double"
    target = spark.createDataFrame([], schema)
    updates = spark.createDataFrame([mk(1.5), mk(1.5)], schema)
    merged, stats = merge_observations(target, updates, keys)
    assert stats.created == 1 and stats.replaced == 0
    assert merged.count() == 1


def test_conflicting_duplicate_updates_raise(spark):
    """Same key, DIFFERENT data in one update batch -> RecordKeyError
    (writing both would poison the table for every later merge)."""
    import pytest

    from station_data_ingestion_spark.operators.merge import (
        RecordKeyError,
        merge_observations,
    )

    keys = ["datatype", "period", "date", "fill", "station_id"]
    schema = "datatype string, period string, date string, fill string, station_id string, value double"
    target = spark.createDataFrame([], schema)
    updates = spark.createDataFrame(
        [
            ("t", "day", "2022-03-01", "raw", "s1", 1.5),
            ("t", "day", "2022-03-01", "raw", "s1", 9.9),
        ],
        schema,
    )
    with pytest.raises(RecordKeyError, match="Conflicting update rows"):
        merge_observations(target, updates, keys)


def test_merge_apply_ops_delete_upsert_matrix(spark):
    """Three-branch merge: delete matched, upsert changed/new, no-op on
    unmatched deletes; delete+upsert same key = re-create with new row."""
    from station_data_ingestion_spark.operators.merge import merge_apply_ops

    target = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
    )
    ops = spark.createDataFrame(
        [
            (2, None, "delete"),     # matched delete
            (9, None, "delete"),     # unmatched delete -> no-op
            (3, 31.0, "upsert"),     # matched changed -> replace
            (4, 40.0, "upsert"),     # new -> create
            (5, None, "delete"),     # delete...
            (5, 50.0, "upsert"),     # ...then upsert same key -> created
        ],
        "k long, v double, _op string",
    )
    got = {(r.k, r.v) for r in merge_apply_ops(target, ops, ["k"]).collect()}
    assert got == {(1, 10.0), (3, 31.0), (4, 40.0), (5, 50.0)}


def test_merge_apply_ops_idempotent_replay(spark):
    from station_data_ingestion_spark.operators.merge import merge_apply_ops

    target = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    ops = spark.createDataFrame(
        [(1, None, "delete"), (3, 30.0, "upsert")], "k long, v double, _op string"
    )
    once = merge_apply_ops(target, ops, ["k"])
    twice = merge_apply_ops(once, ops, ["k"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_merge_schema_evolution(spark):
    """evolve_schema: new update columns null-fill the target; dropped
    columns null-fill the updates (replace writes the update's NULL);
    missing key fields still raise; default remains strict."""
    import pytest as _pytest

    from station_data_ingestion_spark.operators.merge import merge_plan

    target = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b")], "k long, v long, old_col string"
    )
    updates = spark.createDataFrame(
        [(2, 21, "x"), (3, 30, "y")], "k long, v long, new_col string"
    )
    with _pytest.raises(ValueError, match="schema mismatch"):
        merge_plan(target, updates, ["k"])
    out = {
        r["k"]: (r["_action"], r["v"], r["old_col"], r["new_col"])
        for r in merge_plan(
            target, updates, ["k"], replace=True, evolve_schema=True
        ).collect()
    }
    assert out == {
        1: ("keep", 10, "a", None),
        2: ("replace", 21, None, "x"),  # update is the new truth
        3: ("create", 30, None, "y"),
    }
    with _pytest.raises(ValueError, match="key fields must exist"):
        merge_plan(target.drop("k"), updates, ["k"], evolve_schema=True)
