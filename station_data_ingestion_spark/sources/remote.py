"""Remote CSV source: fetch http(s) files to a local staging dir.

The reference streams remote CSVs over HTTP line-by-line
[reference: src/tapis_direct_driver.py:103-107, src/driver.py:140-141].
Spark's CSV reader has no native http:// filesystem, so the idiomatic
equivalent is a driver-side staging fetch: download once into a staging
directory (shared storage on a real cluster), then let the distributed
CSV scan split the staged file normally. Downloads reuse the sink stack's
backoff-retry schedule [src/modules/ingestion_handler.py:70-78].

At 100 TB ingestion the staging copy is the right trade anyway: executors
re-read the data many times (scan retries, AQE re-plans), and ranged
parallel reads need a seekable store, not a one-shot HTTP stream.
"""

from __future__ import annotations

import os
import shutil
import urllib.parse
import urllib.request

from station_data_ingestion_spark.operators.sinks import with_retries

_REMOTE_SCHEMES = ("http", "https")


def is_remote(path: str) -> bool:
    return urllib.parse.urlparse(path).scheme in _REMOTE_SCHEMES


def stage_if_remote(
    path: str,
    staging_dir: str,
    retries: int = 3,
    timeout: float = 60.0,
    overwrite: bool = False,
) -> str:
    """Return a local path for `path`, downloading into staging_dir if remote.

    Local paths pass through untouched. The staged filename is derived
    from the URL path so re-runs reuse the same name; an existing staged
    file is reused unless `overwrite` (resume-friendly: the runner's
    manifest already guards re-ingestion).
    """
    if not is_remote(path):
        return path
    name = os.path.basename(urllib.parse.urlparse(path).path) or "download.csv"
    os.makedirs(staging_dir, exist_ok=True)
    dest = os.path.join(staging_dir, name)
    if os.path.exists(dest) and not overwrite:
        return dest

    def fetch() -> None:
        tmp = dest + ".tmp"
        with urllib.request.urlopen(path, timeout=timeout) as resp, open(
            tmp, "wb"
        ) as out:
            shutil.copyfileobj(resp, out)
        os.replace(tmp, dest)

    with_retries(fetch, retries=retries)
    return dest
