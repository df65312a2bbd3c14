"""Multi-table atomic catalog transactions (plans/catalog.py)."""

import pytest
from pyspark.sql import functions as F

from station_data_ingestion_spark.plans.catalog import Catalog
from station_data_ingestion_spark.plans.snapshot_store import (
    ConcurrentCommitError,
)


def _fact(spark, lo, hi, price=10):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("string").alias("p"),
        F.lit(price).cast("long").alias("cents"),
    )


def _rollup_of(df):
    return df.groupBy("p").agg(F.sum("cents").alias("cents"))


def _mk(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.init()
    txn = cat.transaction()
    fact = _fact(spark, 0, 100)
    txn.create_table("fact", fact, partition_cols=("p",), stat_cols=())
    txn.create_table(
        "rollup", _rollup_of(fact), partition_cols=(), stat_cols=()
    )
    txn.commit()
    return cat


def test_txn_commit_is_atomic_across_tables(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    s0 = cat.snapshot()
    txn = cat.transaction()
    fact2 = _fact(spark, 0, 100, price=13)
    txn.write("fact", fact2)
    # staged but uncommitted: a fresh snapshot still sees the OLD fact
    mid = cat.snapshot()
    assert mid.read("fact").agg(F.sum("cents")).first()[0] == 1000
    txn.write("rollup", _rollup_of(fact2))
    txn.commit()
    # old snapshot: internally consistent OLD pair
    assert s0.read("fact").agg(F.sum("cents")).first()[0] == 1000
    assert s0.read("rollup").agg(F.sum("cents")).first()[0] == 1000
    # new snapshot: both flipped together
    s1 = cat.snapshot()
    assert s1.read("fact").agg(F.sum("cents")).first()[0] == 1300
    assert s1.read("rollup").agg(F.sum("cents")).first()[0] == 1300


def test_txn_read_your_writes_and_snapshot_isolation(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    txn = cat.transaction()
    txn.write("fact", _fact(spark, 0, 100, price=20))
    assert txn.read("fact").agg(F.sum("cents")).first()[0] == 2000
    assert txn.read("rollup").agg(F.sum("cents")).first()[0] == 1000
    txn.abort()
    assert cat.snapshot().read("fact").agg(F.sum("cents")).first()[0] == 1000


def test_overlapping_txns_conflict_at_catalog_commit(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    a, b = cat.transaction(), cat.transaction()
    a.write("fact", _fact(spark, 0, 100, price=11))
    a.commit()
    # b read the pre-a snapshot; its fact write is a stale RMW — the
    # staged table version is inert, the CONFLICT surfaces at commit
    b.write("fact", _fact(spark, 0, 100, price=12))
    with pytest.raises(ConcurrentCommitError):
        b.commit()
    assert cat.snapshot().read("fact").agg(F.sum("cents")).first()[0] == 1100
    # retry pattern: fresh txn sees a's state and lands
    c = cat.transaction()
    c.write("fact", _fact(spark, 0, 100, price=12))
    c.commit()
    assert cat.snapshot().read("fact").agg(F.sum("cents")).first()[0] == 1200


def test_abort_never_wedges_later_writers(spark, tmp_path):
    # regression: a table-level CAS pinned to the snapshot version would
    # see the aborted txn's unpinned version as "the table advanced" and
    # reject every later write to that table forever
    cat = _mk(spark, tmp_path)
    a = cat.transaction()
    a.write("fact", _fact(spark, 0, 100, price=77))
    a.abort()
    b = cat.transaction()
    b.write("fact", _fact(spark, 0, 100, price=21))
    b.commit()
    assert cat.snapshot().read("fact").agg(F.sum("cents")).first()[0] == 2100


def test_pin_props_travel_with_the_commit(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    txn = cat.transaction()
    txn.write("rollup", _rollup_of(_fact(spark, 0, 100)), props={"cursor": 5})
    txn.commit()
    assert cat.snapshot().props("rollup") == {"cursor": 5}
    assert cat.snapshot().props("fact") == {}


def test_create_create_conflict_detected_at_catalog_commit(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    a, b = cat.transaction(), cat.transaction()
    a.create_table(
        "dim",
        spark.range(3).select(F.col("id").alias("k")),
        path=str(tmp_path / "dim_a"),
        partition_cols=(),
        stat_cols=(),
    )
    b.create_table(
        "dim",
        spark.range(7).select(F.col("id").alias("k")),
        path=str(tmp_path / "dim_b"),
        partition_cols=(),
        stat_cols=(),
    )
    a.commit()
    with pytest.raises(ConcurrentCommitError):
        b.commit()
    assert cat.snapshot().read("dim").count() == 3


def test_disjoint_txns_rebase_and_both_land(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    a, b = cat.transaction(), cat.transaction()
    a.write("fact", _fact(spark, 0, 100, price=15))
    b.write("rollup", _rollup_of(_fact(spark, 0, 100, price=15)))
    a.commit()
    b.commit()  # loses the CAS on v+1, rebases over a's pins, lands v+2
    s = cat.snapshot()
    assert s.read("fact").agg(F.sum("cents")).first()[0] == 1500
    assert s.read("rollup").agg(F.sum("cents")).first()[0] == 1500
    # both catalog versions exist; the rebased pin set kept a's fact
    assert cat.latest_version() == 3


def test_unpinned_table_versions_are_invisible(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    txn = cat.transaction()
    txn.write("fact", _fact(spark, 0, 100, price=99))
    txn.abort()
    s = cat.snapshot()
    assert s.read("fact").agg(F.sum("cents")).first()[0] == 1000
    # the staged table-level version exists on disk but is never resolved
    t = s.table("fact")
    assert t.latest_version() > s.pinned_version("fact")


def test_empty_txn_commit_is_a_noop(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    v = cat.latest_version()
    txn = cat.transaction()
    assert txn.commit() == v
    assert cat.latest_version() == v


def test_cross_table_erasure_is_atomic(spark, tmp_path):
    """GDPR-style erasure: one subject's rows leave BOTH tables in ONE
    catalog commit — any snapshot sees the subject in both or neither."""
    cat = Catalog(spark, str(tmp_path / "gdpr"))
    cat.init()
    users = spark.range(0, 20).select(
        F.col("id").alias("uid"),
        (F.col("id") % 2).cast("string").alias("p"),
    )
    events = spark.range(0, 200).select(
        F.col("id").alias("eid"),
        (F.col("id") % 20).alias("uid"),
        (F.col("id") % 2).cast("string").alias("p"),
    )
    t0 = cat.transaction()
    t0.create_table("users", users, partition_cols=("p",), stat_cols=())
    t0.create_table("events", events, partition_cols=("p",), stat_cols=())
    t0.commit()

    subject = 7
    pre = cat.snapshot()
    txn = cat.transaction()
    for name, key in (("users", "uid"), ("events", "uid")):
        full = txn.read(name)
        keep = full.filter(F.col(key) != subject)
        changes = full.filter(F.col(key) == subject).withColumn(
            "_change_type", F.lit("delete")
        )
        txn.write(name, keep, changes=changes)
    txn.commit()

    # pre-commit snapshot still whole (snapshot isolation)
    assert pre.read("users").filter(F.col("uid") == subject).count() == 1
    assert pre.read("events").filter(F.col("uid") == subject).count() == 10
    # post-commit: gone from both
    s = cat.snapshot()
    assert s.read("users").filter(F.col("uid") == subject).count() == 0
    assert s.read("events").filter(F.col("uid") == subject).count() == 0
    # both tables' change feeds record the erasure rows
    for name, n in (("users", 1), ("events", 10)):
        tbl = s.table(name)
        feed = tbl.read_change_feed(tbl.latest_version() - 1)
        dels = feed.filter(F.col("_change_type") == "delete")
        assert dels.filter(F.col("uid") == subject).count() == n


def test_catalog_views_pinned_consistency(spark, tmp_path):
    """A catalog VIEW resolves its tables at the SNAPSHOT's pins: after
    a later transaction advances a base table, an old snapshot's view
    still computes the old answer; the new snapshot's view sees the new
    one — and both flip atomically with the pins."""
    from pyspark.sql import Row, functions as F

    from station_data_ingestion_spark.plans.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.init()
    txn = cat.transaction()
    txn.create_table(
        "fact",
        spark.createDataFrame(
            [Row(k=1, v=10, p=1), Row(k=2, v=20, p=1)], "k int, v int, p int"
        ),
        partition_cols=("p",),
    )
    txn.create_table(
        "dim",
        spark.createDataFrame(
            [Row(k=1, name="a", p=1), Row(k=2, name="b", p=1)],
            "k int, name string, p int",
        ),
        partition_cols=("p",),
    )
    txn.create_view(
        "fact_by_name",
        "SELECT d.name, SUM(f.v) AS total FROM fact f "
        "JOIN dim d ON f.k = d.k GROUP BY d.name",
    )
    v1 = txn.commit()
    s1 = cat.snapshot(v1)
    got1 = {r["name"]: r["total"] for r in s1.read_view("fact_by_name").collect()}
    assert got1 == {"a": 10, "b": 20}
    # advance fact in a second txn
    txn2 = cat.transaction()
    txn2.write(
        "fact",
        spark.createDataFrame([Row(k=1, v=99, p=1), Row(k=2, v=20, p=1)],
                              "k int, v int, p int"),
    )
    v2 = txn2.commit()
    # old snapshot's view is frozen; new snapshot's view sees the write
    got_old = {r["name"]: r["total"] for r in s1.read_view("fact_by_name").collect()}
    assert got_old == {"a": 10, "b": 20}
    got_new = {
        r["name"]: r["total"]
        for r in cat.snapshot(v2).read_view("fact_by_name").collect()
    }
    assert got_new == {"a": 99, "b": 20}


def test_catalog_view_validation_and_chaining(spark, tmp_path):
    import pytest
    from pyspark.sql import Row

    from station_data_ingestion_spark.plans.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "cat2"))
    cat.init()
    txn = cat.transaction()
    txn.create_table(
        "t",
        spark.createDataFrame([Row(k=1, v=5, p=1)], "k int, v int, p int"),
        partition_cols=("p",),
    )
    # typo'd column fails at CREATE time
    with pytest.raises(Exception):
        txn.create_view("bad", "SELECT nope FROM t")
    txn.create_view("base_v", "SELECT k, v * 2 AS v2 FROM t")
    txn.commit()
    # a later txn can build a view ON a view
    txn2 = cat.transaction()
    txn2.create_view("top_v", "SELECT SUM(v2) AS s FROM base_v")
    v = txn2.commit()
    snap = cat.snapshot(v)
    assert snap.views() == ["base_v", "top_v"]
    assert snap.read_view("top_v").collect()[0]["s"] == 10
    # drop
    txn3 = cat.transaction()
    txn3.drop_view("top_v")
    v3 = txn3.commit()
    assert cat.snapshot(v3).views() == ["base_v"]
