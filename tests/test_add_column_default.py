"""ADD COLUMN with initial default: metadata-only, per-file fill."""

import pytest
from pyspark.sql import functions as F

from station_data_ingestion_spark.plans.snapshot_store import SnapshotTable


def _mk(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), partition_cols=("p",))
    t.commit_overwrite_partitions(
        spark.range(0, 20).select(
            F.col("id").alias("k"),
            (F.col("id") % 2).cast("string").alias("p"),
            (F.col("id") * 10).alias("v"),
        )
    )
    return t


def test_old_files_read_default_new_files_keep_nulls(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v1 = t.latest_version()
    files1 = {e["path"] for e in t._read_manifest(v1)["files"]}
    t.add_column("tag", "string", default="legacy")
    assert {e["path"] for e in t._read_manifest(t.latest_version())["files"]} == files1
    # pre-add rows all read the default
    assert t.read().filter(F.col("tag") == "legacy").count() == 20
    # new partition write: real values INCLUDING genuine nulls
    t.commit_overwrite_partitions(
        spark.range(100, 110).select(
            F.col("id").alias("k"),
            F.lit("9").alias("p"),
            (F.col("id") * 10).alias("v"),
            F.when(F.col("id") % 2 == 0, F.lit("new")).alias("tag"),
        )
    )
    got = {r["k"]: r["tag"] for r in t.read().collect()}
    assert sum(1 for v in got.values() if v == "legacy") == 20
    assert sum(1 for v in got.values() if v == "new") == 5
    assert sum(1 for v in got.values() if v is None) == 5  # nulls survive
    # time travel: pre-add version has no such column
    assert "tag" not in t.read(version=1).columns


def test_add_column_typed_default_and_validation(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_column("score", "bigint", default=7)
    assert dict(t.read().select("score").dtypes)["score"] == "bigint"
    assert t.read().filter(F.col("score") == 7).count() == 20
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("v", "bigint")
    t.drop_column("score")
    with pytest.raises(ValueError, match="retired"):
        t.add_column("score", "bigint")


def test_add_column_composes_with_dv_and_cow(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_column("tag", "string", default="legacy")
    t.delete_where_dv(F.col("k") % 5 == 0)  # DV over fill-tagged files
    assert t.read().count() == 16
    assert t.read().filter(F.col("tag") == "legacy").count() == 16
    # COW rewrite materializes the default into the rewritten file
    t.delete_where(F.col("k") == 1)
    assert t.read().count() == 15
    assert t.read().filter(F.col("tag") == "legacy").count() == 15


def test_widen_column_mixed_files_and_validation(spark, tmp_path):
    """int -> bigint widening: metadata-only, mixed narrow/wide files
    read in separate groups, writes align to the wide type, time
    travel keeps the narrow era narrow."""
    t = SnapshotTable(spark, str(tmp_path / "w"), partition_cols=("p",))
    t.commit_overwrite_partitions(
        spark.range(0, 10).select(
            F.col("id").alias("k"),
            (F.col("id") % 2).cast("string").alias("p"),
            F.col("id").cast("int").alias("v"),
        )
    )
    v1 = t.latest_version()
    t.widen_column("v", "bigint")
    assert dict(t.read().dtypes)["v"] == "bigint"
    assert dict(t.read(version=v1).dtypes)["v"] == "int"
    # a narrow INCOMING frame into the SAME partitions must align wide
    t.commit_overwrite_partitions(
        spark.range(100, 105).select(
            F.col("id").alias("k"),
            F.lit("0").alias("p"),
            F.col("id").cast("int").alias("v"),
        )
    )
    # over-int32 values land fine
    t.commit_overwrite_partitions(
        spark.range(0, 3).select(
            (F.col("id") + 200).alias("k"),
            F.lit("9").alias("p"),
            (F.col("id") + 5_000_000_000).alias("v"),
        )
    )
    got = t.read()
    assert got.filter(F.col("v") >= 5_000_000_000).count() == 3
    assert got.count() == 5 + 5 + 3  # p=1 kept, p=0 replaced, p=9 new
    with pytest.raises(ValueError, match="unsupported widening"):
        t.widen_column("v", "int")
    with pytest.raises(ValueError, match="partition"):
        t.widen_column("p", "bigint")
    # widen survives restore (schema metadata stays current)
    t.restore(v1)
    assert dict(t.read().dtypes)["v"] == "bigint"
    assert t.read().count() == 10


def test_widen_with_bloom_point_reads(spark, tmp_path):
    """Blooms record their build-time type per file, so point reads on
    a widened column stay correct across eras: in-range probes hash
    with the narrow type for narrow files, and an over-int32 probe
    PRUNES pre-widen files (try_cast overflow = cannot contain) while
    still finding the value in post-widen files."""
    t = SnapshotTable(
        spark, str(tmp_path / "wb"), partition_cols=("p",),
        bloom_cols=("v",),
    )
    t.commit_overwrite_partitions(
        spark.range(0, 50).select(
            F.col("id").alias("k"),
            (F.col("id") % 2).cast("string").alias("p"),
            F.col("id").cast("int").alias("v"),
        )
    )
    t.widen_column("v", "bigint")
    t.commit_overwrite_partitions(
        spark.range(0, 3).select(
            (F.col("id") + 100).alias("k"),
            F.lit("9").alias("p"),
            (F.col("id") + 6_000_000_000).alias("v"),
        )
    )
    # in-range value: found in the narrow era (typed per-file hash)
    got = t.read(point={"v": 7})
    assert got is not None and got.filter(F.col("v") == 7).count() == 1
    # over-int32 value: narrow files pruned, wide file serves it
    got_big = t.read(point={"v": 6_000_000_001})
    assert got_big is not None
    assert got_big.filter(F.col("v") == 6_000_000_001).count() == 1
    # absent over-range value: prunes everything (None = no files)
    assert t.read(point={"v": 7_000_000_000}) is None


def test_widen_fill_and_dv_compose_on_one_table(spark, tmp_path):
    """All three per-entry read mechanisms at once — widen tags, fill
    tags, and deletion vectors — must compose: groups split by their
    (fill, widen) signature, casts and defaults apply per era, and the
    DV anti-join still removes exactly its rows."""
    t = SnapshotTable(spark, str(tmp_path / "c"), partition_cols=("p",))
    t.commit_overwrite_partitions(
        spark.range(0, 20).select(
            F.col("id").alias("k"),
            (F.col("id") % 2).cast("string").alias("p"),
            F.col("id").cast("int").alias("v"),
        )
    )
    t.widen_column("v", "bigint")
    t.add_column("tag", "string", default="old")
    t.delete_where_dv(F.col("k") % 4 == 0)  # 5 rows out via DV
    t.commit_overwrite_partitions(
        spark.range(0, 4).select(
            (F.col("id") + 100).alias("k"),
            F.lit("9").alias("p"),
            (F.col("id") + 9_000_000_000).alias("v"),
            F.lit("new").alias("tag"),
        )
    )
    got = t.read()
    assert dict(got.dtypes)["v"] == "bigint"
    assert got.count() == 15 + 4
    assert got.filter(F.col("tag") == "old").count() == 15
    assert got.filter(F.col("v") >= 9_000_000_000).count() == 4
    assert got.filter(F.col("k") % 4 == 0).filter(F.col("k") < 100).count() == 0
    # add_column must CARRY the table-level widened map: a NARROW-typed
    # append after the add still aligns to bigint — before the carry
    # fix the int file shared a scan group with the wide untagged file
    # and read() died with CANNOT_MERGE_SCHEMAS
    t.commit_overwrite_partitions(
        spark.range(0, 3).select(
            (F.col("id") + 200).alias("k"),
            F.lit("8").alias("p"),
            (F.col("id") + 7).cast("int").alias("v"),
            F.lit("narrow").alias("tag"),
        )
    )
    got = t.read()
    assert dict(got.dtypes)["v"] == "bigint"
    assert got.filter(F.col("tag") == "narrow").count() == 3
    assert got.count() == 15 + 4 + 3
    # a LATER widen must merge with (not clobber) the carried map —
    # and widening an ADDED column composes (fill casts to the wide type)
    t.add_column("w2", "int", default=1)
    t.widen_column("w2", "bigint")
    assert set((t._read_manifest(t.latest_version())["widened"]).keys()) == {
        "v",
        "w2",
    }
    got = t.read()
    assert dict(got.dtypes)["w2"] == "bigint"
    assert got.filter(F.col("w2") == 1).count() == 22
    # and the whole stack survives a vacuum
    t.vacuum(older_than_sec=0.0)
    assert t.read().count() == 22


def test_restore_preserves_added_column(spark, tmp_path):
    """RESTORE rolls back data, not schema: a column added (metadata-
    only, per-file fill) after the restore target must stay in the live
    schema, with restored files re-tagged so they read the default —
    the same keep-schema-current rule the widen handling follows."""
    t = _mk(spark, tmp_path)
    v1 = t.latest_version()
    t.add_column("tag", "string", default="legacy")
    t.commit_overwrite_partitions(
        spark.range(100, 104).select(
            F.col("id").alias("k"),
            F.lit("9").alias("p"),
            (F.col("id") * 10).alias("v"),
            F.lit("new").alias("tag"),
        )
    )
    t.restore(v1)
    got = t.read()
    assert "tag" in got.columns
    assert got.count() == 20
    assert got.filter(F.col("tag") == "legacy").count() == 20
    # restore TO a post-add version keeps the physical values
    t.restore(t.latest_version() - 1)  # back to the 24-row state
    got = t.read()
    assert got.count() == 24
    assert got.filter(F.col("tag") == "new").count() == 4


def test_added_map_follows_drop_and_metadata_ops(spark, tmp_path):
    """The table-level added map rides every metadata commit and the
    dropped column leaves it (its name is retired anyway)."""
    t = _mk(spark, tmp_path)
    t.add_column("a1", "string", default="x")
    t.add_column("a2", "bigint", default=5)
    t.rename_column("v", "val")
    t.widen_column("k", "bigint")
    m = t._read_manifest(t.latest_version())
    assert set(m["added"].keys()) == {"a1", "a2"}
    t.drop_column("a1")
    m = t._read_manifest(t.latest_version())
    assert set(m["added"].keys()) == {"a2"}
    # restore past everything: a2 still reads its default on old files
    t.restore(1)
    got = t.read()
    assert got.filter(F.col("a2") == 5).count() == 20
    assert "a1" not in got.columns
