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
    ignore_exceptions: tuple[type, ...] = (),
) -> None:
    """Run fn, retrying with backoff; re-raises after `retries` failures.

    ``ignore_exceptions`` lists exception types that propagate IMMEDIATELY
    with no retry (exact type match, as the reference checks ``type(e) in
    ignore_exceptions``) -- for errors where retrying cannot help, e.g. a
    404 on a lookup [reference: src/modules/ingestion_handler.py:104-120].

    ``sleep`` resolves at call time (late-bound) so tests can patch
    time.sleep; a def-time default would capture the real function.
    """
    if sleep is None:
        sleep = time.sleep
    delays = backoff_delays(retries)
    while True:
        try:
            return fn()
        except Exception as e:
            if type(e) in ignore_exceptions:
                raise
            delay = next(delays, None)
            if delay is None:
                raise
            sleep(delay)


class TokenProvider:
    """Cached bearer token with refresh-before-expiry.

    Spark re-expression of the reference's auth lifecycle
    [reference: src/modules/ingestion_handler.py:51-67]: the reference
    re-auths when the token expires in < 5 minutes, serializing the
    refresh behind a lock so concurrent tasks reuse one fetch. Here the
    provider lives per Python worker process (created in the
    transport_factory closure, shipped to executors); a threading.Lock
    gives the same single-refresh guarantee within a worker, and
    cross-worker refreshes are independent fetches -- acceptable because
    token issuance is idempotent.

    ``fetch`` returns ``(token, expires_in_seconds)``.
    ``invalidate()`` drops the cached token so the next ``token()`` call
    re-fetches -- call it on an auth rejection (401) before retrying.
    """

    def __init__(
        self,
        fetch: Callable[[], tuple[str, float]],
        refresh_margin: float = 300.0,
        clock: Callable[[], float] | None = None,
    ) -> None:
        import threading

        self._fetch = fetch
        self._margin = refresh_margin
        self._clock = clock or time.monotonic
        self._token: str | None = None
        self._expires_at = float("-inf")
        self._lock = threading.Lock()

    def token(self) -> str:
        with self._lock:
            if self._token is None or self._clock() >= self._expires_at - self._margin:
                tok, expires_in = self._fetch()
                self._token = tok
                self._expires_at = self._clock() + float(expires_in)
            return self._token

    def invalidate(self) -> None:
        with self._lock:
            self._token = None
            self._expires_at = float("-inf")

    def __getstate__(self):  # Lock is not picklable; recreate on executor
        d = self.__dict__.copy()
        del d["_lock"]
        d["_token"] = None
        d["_expires_at"] = float("-inf")
        return d

    def __setstate__(self, d):
        import threading

        self.__dict__.update(d)
        self._lock = threading.Lock()


def password_grant_fetch(
    token_url: str,
    api_key: str,
    api_secret: str,
    username: str,
    password: str,
    scope: str = "PRODUCTION",
    client_name: str | None = None,
    timeout: float = 30.0,
) -> Callable[[], tuple[str, float]]:
    """OAuth2 password-grant token fetch for :class:`TokenProvider`.

    Mirrors the reference's curl password grant
    [reference: src/modules/get_config.py:5-12] with urllib: basic auth
    with the consumer key/secret, form-encoded grant fields, and the
    access token pulled from the JSON response. All credentials are
    caller-supplied -- nothing is read from the environment here; wire
    env vars up at the config layer if desired [get_config.py:14-26].
    """

    def fetch() -> tuple[str, float]:
        import base64
        import urllib.parse
        import urllib.request

        fields = {
            "grant_type": "password",
            "username": username,
            "password": password,
            "scope": scope,
        }
        if client_name:
            fields["client_name"] = client_name
        req = urllib.request.Request(
            token_url, data=urllib.parse.urlencode(fields).encode("utf-8"),
            method="POST",
        )
        basic = base64.b64encode(f"{api_key}:{api_secret}".encode()).decode()
        req.add_header("Authorization", f"Basic {basic}")
        req.add_header("Content-Type", "application/x-www-form-urlencoded")
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            payload = json.loads(resp.read().decode("utf-8"))
        return payload["access_token"], float(payload.get("expires_in", 3600.0))

    return fetch


def jsonl_dir_transport(out_dir: str) -> Transport:
    """Default local transport: each flush writes one JSONL chunk file."""

    def post(chunk: list[str]) -> None:
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"chunk-{uuid.uuid4().hex}.jsonl")
        with open(path, "w", encoding="utf-8") as f:
            f.write("\n".join(chunk) + "\n")

    return post


def http_post_transport(
    url: str,
    token: "str | TokenProvider | None" = None,
    timeout: float = 30.0,
) -> Transport:
    """REST transport: POST a JSON array of docs with bearer auth.

    Mirrors the reference's API sink envelope [src/driver.py:28-41] without
    any proprietary endpoint baked in -- the URL is caller-supplied.

    ``token`` may be a static string or a :class:`TokenProvider`; with a
    provider, each request resolves a fresh-enough token (refreshing
    before expiry, like the reference's pre-call __check_auth
    [src/modules/ingestion_handler.py:104-106]), and a 401 response
    invalidates the cache before re-raising so the surrounding
    ``with_retries`` retries with a newly fetched token.
    """

    def post(chunk: list[str]) -> None:
        import urllib.error
        import urllib.request

        tok = token.token() if isinstance(token, TokenProvider) else token
        body = ("[" + ",".join(chunk) + "]").encode("utf-8")
        req = urllib.request.Request(url, data=body, method="POST")
        req.add_header("Content-Type", "application/json")
        if tok:
            req.add_header("Authorization", f"Bearer {tok}")
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                resp.read()
        except urllib.error.HTTPError as e:
            if e.code == 401 and isinstance(token, TokenProvider):
                token.invalidate()
            raise

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
