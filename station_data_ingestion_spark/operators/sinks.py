"""Sinks: chunked, retrying, bounded-parallelism document writers.

Re-expresses the reference's sink stack -- 500-doc chunked bulk creates
[reference: src/modules/ingestion_handler.py:122-136], retry with
exponential backoff + jitter [ingestion_handler.py:70-78,104-120], bounded
concurrency [ingestion_handler.py:28-29,83], REST POST envelope
[src/driver.py:28-41] -- as executor-side partition writers:

- parallelism is partitions x executors; cap with coalesce(n) instead of a
  semaphore (the Spark analog of the reference's `concurrency` knob)
- each partition buffers `chunk_size` docs then flushes one transport call
- per-request backoff retry lives INSIDE the writer; Spark task retries
  (spark.task.maxFailures) cover coarse failures, and merge-key idempotency
  makes replays safe

The transport is pluggable; the default writes JSONL files locally so tests
never touch a network. An HTTP transport poster is provided for the real
REST sink shape.

Sparse metadata docs: nodata-valued fields are dropped per record at
serialization [reference: src/driver.py:151] -- done here with a JVM-side
to_json over a null-ified struct (ignoreNullFields drops them), keeping the
hot path out of Python.
"""

from __future__ import annotations

import json
import os
import random
import time
import uuid
from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

Transport = Callable[[list[str]], None]


def backoff_delays(retries: int, seed: int | None = None) -> Iterator[float]:
    """Backoff schedule: first 0.25-0.5 s, then 2-3x the previous delay.

    [reference: src/modules/ingestion_handler.py:70-78]
    """
    rng = random.Random(seed)
    delay = 0.25 + rng.random() * 0.25
    for _ in range(retries):
        yield delay
        delay *= 2 + rng.random()


def with_retries(
    fn: Callable[[], None],
    retries: int = 3,
    sleep: Callable[[float], None] | None = None,
) -> None:
    """Run fn, retrying with backoff; re-raises after `retries` failures.

    ``sleep`` resolves at call time (late-bound) so tests can patch
    time.sleep; a def-time default would capture the real function.
    """
    if sleep is None:
        sleep = time.sleep
    delays = backoff_delays(retries)
    while True:
        try:
            return fn()
        except Exception:
            delay = next(delays, None)
            if delay is None:
                raise
            sleep(delay)


def jsonl_dir_transport(out_dir: str) -> Transport:
    """Default local transport: each flush writes one JSONL chunk file."""

    def post(chunk: list[str]) -> None:
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"chunk-{uuid.uuid4().hex}.jsonl")
        with open(path, "w", encoding="utf-8") as f:
            f.write("\n".join(chunk) + "\n")

    return post


def http_post_transport(url: str, token: str | None = None, timeout: float = 30.0) -> Transport:
    """REST transport: POST a JSON array of docs with bearer auth.

    Mirrors the reference's API sink envelope [src/driver.py:28-41] without
    any proprietary endpoint baked in -- the URL is caller-supplied.
    """

    def post(chunk: list[str]) -> None:
        import urllib.request

        body = ("[" + ",".join(chunk) + "]").encode("utf-8")
        req = urllib.request.Request(url, data=body, method="POST")
        req.add_header("Content-Type", "application/json")
        if token:
            req.add_header("Authorization", f"Bearer {token}")
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            resp.read()

    return post


def write_docs(
    df: DataFrame,
    transport_factory: Callable[[], Transport],
    chunk_size: int = 500,
    retries: int = 3,
    max_parallelism: int | None = None,
) -> None:
    """foreachPartition writer with chunking + retry.

    `transport_factory` is called once per partition ON THE EXECUTOR (so
    connections/auth are per-task, like the per-process Tapis client).
    All non-string inputs are serialized to JSON strings JVM-side first.
    """
    json_df = df if df.columns == ["json"] else df.select(F.to_json(F.struct(*df.columns)).alias("json"))
    if max_parallelism is not None:
        json_df = json_df.coalesce(max_parallelism)

    def write_partition(rows: Iterable[Row]) -> None:
        post = transport_factory()
        buf: list[str] = []

        def flush() -> None:
            if buf:
                chunk = list(buf)
                with_retries(lambda: post(chunk), retries=retries)
                buf.clear()

        for row in rows:
            buf.append(row["json"])
            if len(buf) >= chunk_size:
                flush()
        flush()

    json_df.foreachPartition(write_partition)


def sparse_json_docs(df: DataFrame, nodata: str = "NA") -> DataFrame:
    """Serialize rows to JSON, dropping nodata-valued fields per record.

    [reference: src/driver.py:151] -- sentinel-valued fields become null,
    then to_json(ignoreNullFields=true) omits them. Pure JVM expressions.
    """
    nulled = [
        F.when(F.col(c).cast("string") != F.lit(nodata), F.col(c)).alias(c)
        for c in df.columns
    ]
    return df.select(
        F.to_json(F.struct(*nulled), {"ignoreNullFields": "true"}).alias("json")
    )


def envelope_docs(df: DataFrame, doc_name: str = "hcdp_station_value") -> DataFrame:
    """Wrap rows in the {"name", "value": {...}} document envelope.

    [reference: src/tapis_direct_driver.py:162-165]
    """
    return df.select(
        F.to_json(
            F.struct(
                F.lit(doc_name).alias("name"), F.struct(*df.columns).alias("value")
            )
        ).alias("json")
    )


def read_jsonl_docs(out_dir: str) -> list[dict]:
    """Test helper: read back everything a jsonl_dir_transport wrote."""
    docs = []
    for name in sorted(os.listdir(out_dir)):
        if name.endswith(".jsonl"):
            with open(os.path.join(out_dir, name), encoding="utf-8") as f:
                docs.extend(json.loads(line) for line in f if line.strip())
    return docs
