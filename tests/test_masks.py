"""Column-mask policies: metadata-only governance applied on
read_masked, persisted in the manifest, carried across every commit."""

import hashlib

import pytest
from pyspark.sql import functions as F

from station_data_ingestion_spark.plans.snapshot_store import SnapshotTable


def _mk(spark, tmp_path, name="t"):
    t = SnapshotTable(
        spark, str(tmp_path / name), partition_cols=("p",), stat_cols=()
    )
    t.commit_overwrite_partitions(
        spark.range(0, 20).select(
            F.col("id").alias("k"),
            (F.col("id") % 2).cast("string").alias("p"),
            F.concat(F.lit("user-"), F.col("id")).alias("name"),
            F.concat(F.lit("555-010"), F.col("id")).alias("phone"),
            (F.col("id") * 137 + 13).alias("balance"),
        )
    )
    return t


def test_masks_apply_only_on_read_masked(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.set_column_mask("name", "hash")
    t.set_column_mask("phone", "partial", 4)
    t.set_column_mask("balance", "bucket", 100)
    raw = {r["k"]: r for r in t.read().collect()}
    gov = {r["k"]: r for r in t.read_masked().collect()}
    assert raw[3]["name"] == "user-3"
    assert gov[3]["name"] == hashlib.sha256(b"user-3").hexdigest()
    assert gov[3]["phone"] == "****0103"
    assert gov[3]["balance"] == (3 * 137 + 13) // 100 * 100
    # deterministic tokenization: equal raw values mask equally
    assert gov[3]["name"] == hashlib.sha256(b"user-3").hexdigest()


def test_nullify_keeps_type(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.set_column_mask("balance", "nullify")
    df = t.read_masked()
    assert dict(df.dtypes)["balance"] == "bigint"
    assert df.filter(F.col("balance").isNotNull()).count() == 0


def test_masks_persist_across_reopen_and_commits(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.set_column_mask("name", "hash")
    # an unrelated data commit must carry the policy
    t.commit_overwrite_partitions(
        spark.range(100, 105).select(
            F.col("id").alias("k"),
            F.lit("9").alias("p"),
            F.concat(F.lit("user-"), F.col("id")).alias("name"),
            F.lit("555-0000").alias("phone"),
            (F.col("id") * 137 + 13).alias("balance"),
        )
    )
    # unrelated DDL must carry it too (the r7 widened-drop bug class)
    t.add_column("tag", "string", default="x")
    t.rename_column("phone", "phone_number")  # rename of an UNMASKED col
    fresh = SnapshotTable(
        spark, t.path, partition_cols=("p",), stat_cols=()
    )
    assert fresh.masks() == {"name": ["hash", None]}
    got = fresh.read_masked().filter(F.col("k") == 100).collect()[0]
    assert got["name"] == hashlib.sha256(b"user-100").hexdigest()


def test_mask_follows_rename_and_retires_on_drop(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.set_column_mask("name", "hash")
    t.rename_column("name", "full_name")
    assert t.masks() == {"full_name": ["hash", None]}
    got = t.read_masked().filter(F.col("k") == 1).collect()[0]
    assert got["full_name"] == hashlib.sha256(b"user-1").hexdigest()
    t.drop_column("full_name")
    assert t.masks() == {}


def test_masks_stay_current_across_restore(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v1 = t.latest_version()
    t.set_column_mask("phone", "partial", 2)
    t.restore(v1)
    assert t.masks() == {"phone": ["partial", 2]}
    got = t.read_masked().filter(F.col("k") == 5).collect()[0]
    assert got["phone"] == "****05"
    # time travel through read_masked: CURRENT policy covers history
    got_v1 = t.read_masked(version=v1).filter(F.col("k") == 5).collect()[0]
    assert got_v1["phone"] == "****05"


def test_drop_column_mask_and_validation(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.set_column_mask("phone", "partial", 4)
    t.drop_column_mask("phone")
    assert t.masks() == {}
    assert t.read_masked().filter(F.col("k") == 1).collect()[0][
        "phone"
    ] == "555-0101"
    with pytest.raises(ValueError, match="no mask policy"):
        t.drop_column_mask("phone")
    with pytest.raises(ValueError, match="unknown mask kind"):
        t.set_column_mask("phone", "rot13")
    with pytest.raises(ValueError, match="positive int"):
        t.set_column_mask("phone", "partial")
    with pytest.raises(ValueError, match="does not exist"):
        t.set_column_mask("ghost", "hash")
