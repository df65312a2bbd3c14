"""Bloom-accelerated cross-restart streaming dedup.

streaming/global_dedup.py makes the TABLE the dedup state: every
micro-batch anti-joins against the full committed history — exact, but
the whole batch pays the history shuffle even when (the common case)
almost every arriving id is brand new. This variant splits each batch
with a PERSISTENT Bloom filter over all ids ever committed:

    bloom says "not present"  -> DEFINITELY new (no false negatives):
                                 skip the history join entirely
    bloom says "maybe present" -> exact anti-join, as before

so the expensive exact path runs only on the (false-positive + true
duplicate) sliver, and the common case is one broadcast-probe filter —
no history scan, no shuffle.

Crash-safety invariant: the persisted bloom must always be a SUPERSET
of the committed ids — a stale bloom that misses committed ids would
wave real duplicates through the fast path. The protocol guarantees it
by ordering: each batch ORs its ids into the bloom and persists it
BEFORE the table commit (atomic rename, versioned files, same pattern
as the snapshot manifest). A crash between the two leaves extra ids in
the bloom — pure false positives, absorbed by the exact path on
replay. The probe itself uses the PRE-batch words, so the batch's own
rows aren't self-flagged.

Bloom geometry is the caller's scale knob: 2^24 bits ≈ 2 MiB of words
holds ~1.7e6 ids at 1% fp; the words travel once per executor as a
single-row broadcast (operators/bloom.py machinery — all-JVM probe,
never F.lit(list)).
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from station_data_ingestion_spark.operators.bloom import (
    bloom_might_contain,
    build_bloom_words,
)
from station_data_ingestion_spark.plans.snapshot_store import (
    SnapshotTable,
    _fs,
)


def _load_bloom(spark, path: str) -> dict | None:
    """Newest bloom-v*.json under `path`, or None."""
    fs, p, jvm = _fs(spark, path)
    if not fs.exists(p):
        return None
    best, best_v = None, -1
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith("bloom-v") and name.endswith(".json"):
            try:
                v = int(name[len("bloom-v"):-5])
            except ValueError:
                continue
            if v > best_v:
                best, best_v = name, v
    if best is None:
        return None
    stream = fs.open(jvm.org.apache.hadoop.fs.Path(f"{path}/{best}"))
    try:
        text = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    out = json.loads(text)
    out["version"] = best_v
    return out


def _save_bloom(spark, path: str, payload: dict, version: int) -> None:
    """Atomic write of bloom-v{version}.json (temp + rename).

    The rename MUST be verified: the protocol is save-bloom-then-commit,
    so a silently lost save would let the table commit ids the bloom
    never recorded — breaking the superset invariant and waving real
    duplicates through the fast path later. A failed rename (e.g. a
    concurrent writer won this version number) raises instead, failing
    the batch BEFORE its table commit; the streaming retry then reloads
    the winner's bloom and re-ORs on top of it."""
    fs, p, jvm = _fs(spark, path)
    fs.mkdirs(p)
    HPath = jvm.org.apache.hadoop.fs.Path
    tmp = HPath(f"{path}/.tmp-{uuid.uuid4().hex}.json")
    out = fs.create(tmp, False)
    try:
        out.write(json.dumps(payload).encode("utf-8"))
    finally:
        out.close()
    dest = HPath(f"{path}/bloom-v{version:09d}.json")
    if not fs.rename(tmp, dest):
        fs.delete(tmp, False)
        raise IOError(
            f"lost the bloom publish race for v{version} at {path}; "
            "batch aborts before its table commit (superset invariant)"
        )


def bloom_dedup_commit(
    table: SnapshotTable,
    bloom_path: str,
    id_col: str = "event_id",
    run_token: str = "run",
    m_bits: int = 1 << 20,
    k: int = 4,
    stats: dict | None = None,
):
    """foreachBatch callback: bloom-split dedup against the table's
    history, then commit survivors. ``stats``, if given, accumulates
    ``exact_path_rows`` / ``fast_path_rows`` across batches so tests
    and benchmarks can see the split actually happening."""

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        b = batch_df.dropDuplicates([id_col])
        prior = _load_bloom(spark, bloom_path)
        if prior is not None and (
            prior["m_bits"] != m_bits or prior["k"] != k
        ):
            raise ValueError(
                "bloom geometry changed mid-table: "
                f"stored ({prior['m_bits']},{prior['k']}) "
                f"vs requested ({m_bits},{k})"
            )
        old_words = prior["words"] if prior else [0] * (m_bits // 64)
        # 1. grow + persist the bloom BEFORE committing (superset
        #    invariant: bloom ⊇ committed ids survives any crash point)
        batch_words = build_bloom_words(
            b.select(id_col), id_col, m_bits=m_bits, k=k
        )
        new_words = [a | c for a, c in zip(old_words, batch_words)]
        _save_bloom(
            spark,
            bloom_path,
            {"m_bits": m_bits, "k": k, "words": new_words},
            (prior["version"] + 1) if prior else 0,
        )
        # 2. split on the PRE-batch bloom: misses are definitely new
        bf = spark.createDataFrame(
            [(old_words,)],
            T.StructType(
                [T.StructField("__bf", T.ArrayType(T.LongType()), False)]
            ),
        )
        probed = b.crossJoin(F.broadcast(bf)).withColumn(
            "__maybe",
            bloom_might_contain(F.col(id_col), F.col("__bf"), m_bits, k),
        ).drop("__bf")
        fresh = probed.where(~F.col("__maybe")).drop("__maybe")
        maybe = probed.where(F.col("__maybe")).drop("__maybe")
        if stats is not None:
            # rows ENTERING each path (the split the bloom achieved),
            # not exact-path survivors — extra actions, only on request
            stats["fast_path_rows"] = stats.get("fast_path_rows", 0) + (
                fresh.count()
            )
            stats["exact_path_rows"] = stats.get("exact_path_rows", 0) + (
                maybe.count()
            )
        cur = table.read() if table.exists() else None
        if cur is not None:
            maybe = maybe.join(cur.select(id_col), id_col, "left_anti")
        table.commit_overwrite_partitions(
            fresh.unionByName(maybe).withColumn(
                "batch_id", F.lit(f"{run_token}-{int(batch_id)}")
            )
        )

    return commit


def run_bloom_dedup_stream(
    stream: DataFrame,
    table: SnapshotTable,
    checkpoint_dir: str,
    bloom_path: str,
    id_col: str = "event_id",
    m_bits: int = 1 << 20,
    k: int = 4,
    stats: dict | None = None,
):
    """Start (availableNow) the bloom-accelerated globally-deduping
    stream into `table`; returns the StreamingQuery (caller awaits)."""
    import hashlib

    token = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]
    return (
        stream.writeStream.foreachBatch(
            bloom_dedup_commit(
                table,
                bloom_path,
                id_col,
                run_token=token,
                m_bits=m_bits,
                k=k,
                stats=stats,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
