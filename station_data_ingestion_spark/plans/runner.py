"""Config-driven job runner: multi-file ingestion with resume manifest.

Re-expresses the reference's operational loop [reference:
src/driver.py:101-170, utils/task.sh:8-15, README.md:41-43]:

- per data_item, per file: ingest wide CSV -> observations + metadata
- observations MERGE into the target parquet table (partitioned by
  datatype/period so date-range queries prune partitions)
- per-file commit manifest for resume: a file that completed is skipped on
  re-run; merge-key idempotency makes partial replays safe (the batch
  analog of the reference's byte-position state file)
- all_complete() equivalent: AND over the manifest's complete flags
  [reference: utils/all_complete.py:4-12]
- date templating of config text: %y/%m/%d -> concrete zero-padded dates
  [reference: utils/update_date_string_in_config.py:32-48]
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict
from datetime import date, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.merge import (
    _DUP_UPDATE_MSG,
    _MULTI_MATCH_MSG,
    MergeStats,
    RecordKeyError,
    merge_observed,
)
from station_data_ingestion_spark.plans.jobspec import DataItemSpec, JobSpec
from station_data_ingestion_spark.sources.remote import stage_if_remote
from station_data_ingestion_spark.sources.wide_csv import ingest_wide_csv

OBS_PARTITION_COLS = ("datatype", "period")
_MAX_MERGE_REDO_ATTEMPTS = 5


def template_dates(config_text: str, on: date | None = None) -> str:
    """Replace %y/%m/%d tokens with a concrete (default: yesterday's) date."""
    d = on or (date.today() - timedelta(days=1))
    return (
        config_text.replace("%y", f"{d.year:04d}")
        .replace("%m", f"{d.month:02d}")
        .replace("%d", f"{d.day:02d}")
    )


class Manifest:
    """Per-file commit log for resume (JSON file, driver-side)."""

    def __init__(self, path: str):
        self.path = path
        self.state: dict[str, dict] = {}
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                self.state = json.load(f)

    def is_complete(self, file: str) -> bool:
        return self.state.get(file, {}).get("complete", False)

    def mark_complete(self, file: str, stats: MergeStats) -> None:
        entry = self.state.get(file, {})
        entry.update({"complete": True, **asdict(stats)})
        self.state[file] = entry
        self._save()

    def mark_batch_complete(self, files: list[str], stats: MergeStats) -> None:
        """One merged batch of files done: stats recorded ONCE.

        Per-file entries carry only completion + a batch pointer, so
        summing created/replaced across the manifest stays additive (a
        batch's totals cannot be counted once per member file). Batch
        records live under the reserved "__batches__" key.
        """
        import uuid

        bid = uuid.uuid4().hex[:12]
        batches = self.state.setdefault("__batches__", {})
        batches[bid] = {"files": list(files), **asdict(stats)}
        for f in files:
            self.state[f] = {"complete": True, "batch_id": bid}
        self._save()

    # -- mid-file resume granularity [reference: README.md:41-43] --------

    def range_state(self, file: str) -> dict:
        """{"split_bytes", "ranges" (completed keys), running stat sums}."""
        e = self.state.get(file, {})
        return {
            "split_bytes": e.get("split_bytes"),
            "ranges": set(e.get("ranges", [])),
            "created": e.get("created", 0),
            "replaced": e.get("replaced", 0),
        }

    def mark_ranges_complete(
        self, file: str, range_keys: list[str], stats: MergeStats, split_bytes: int
    ) -> None:
        """One commit's worth of ranges done; stat sums stay ADDITIVE --
        stats attach to the commit (group), never invented per range."""
        entry = self.state.setdefault(file, {"complete": False})
        entry["split_bytes"] = split_bytes
        done = set(entry.get("ranges", []))
        done.update(range_keys)
        entry["ranges"] = sorted(done)
        entry["created"] = entry.get("created", 0) + stats.created
        entry["replaced"] = entry.get("replaced", 0) + stats.replaced
        self._save()

    def _save(self) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(self.state, f, indent=2)
        os.replace(tmp, self.path)

    def all_complete(self, files: list[str]) -> bool:
        return all(self.is_complete(f) for f in files)


def _table_has_parquet(spark: SparkSession, table_path: str) -> bool:
    """True iff the path exists and contains >=1 parquet file (any FS)."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return False
    it = fs.listFiles(path, True)
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            return True
    return False


def read_obs_table(spark: SparkSession, table_path: str, spec: DataItemSpec) -> DataFrame:
    """Read the observation target, pruned to the spec's merge slice.

    Partition pruning on (datatype, period) bounds the target scan -- the
    scale-critical move: a 100 TB observation table is never fully read to
    merge one month of one datatype. Snapshot-layout tables (the default
    sink, see plans.snapshot_store) prune driver-side from the manifest;
    plain-layout tables prune via directory partition discovery.
    """
    from station_data_ingestion_spark.plans.snapshot_store import SnapshotTable

    snap = SnapshotTable(spark, table_path, OBS_PARTITION_COLS)
    if snap.exists():
        df = snap.read(
            partition={"datatype": spec.datatype, "period": spec.period}
        )
        if df is not None:
            return df
    # A previous zero-row run leaves a dir with no parquet footers, so an
    # existence check alone isn't enough to read it back. Uses the Hadoop
    # FileSystem API, NOT os.path: on hdfs:// or s3a:// paths a local
    # check would report "missing", the target would read as empty, and
    # the dynamic partition overwrite would then wipe the real slice.
    if snap.exists() or not _table_has_parquet(spark, table_path):
        schema = "station_id string, date string, value double, " + ", ".join(
            f"{k} string" for k in spec.static_properties
        )
        return spark.createDataFrame([], schema)
    # Partition-column type inference would read a numeric-looking
    # partition value (datatype='850') back as int; the merge would then
    # compare/rewrite it as a number and create a duplicate slice
    # ('datatype=850.0') the overwrite never replaces. Keys are strings.
    conf_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prev = spark.conf.get(conf_key, "true")
    spark.conf.set(conf_key, "false")
    try:
        df = spark.read.parquet(table_path)
    finally:
        spark.conf.set(conf_key, prev)
    return df.filter(
        (F.col("datatype") == spec.datatype) & (F.col("period") == spec.period)
    )


def _merge_into_table(
    spark: SparkSession,
    obs: DataFrame,
    item: DataItemSpec,
    obs_table_path: str,
    table_format: str = "snapshot",
) -> MergeStats:
    """Read the pruned target, align schemas, merge, overwrite the slice.

    The single sequence both runner modes share; key-integrity failures
    surface as RecordKeyError.

    Concurrency: MERGE is read-merge-write, so a rival commit landing
    between our target read and our publish would be silently dropped by
    a last-publisher-wins rebase. Snapshot targets therefore publish
    with compare-and-swap (``expected_version`` = the version the merge
    read); a CAS loss re-reads the NEW snapshot and redoes the whole
    merge — serializable isolation, never lost updates. Bounded retries:
    a merge is minutes of work, so pathological contention should fail
    loudly rather than spin.
    """
    from station_data_ingestion_spark.plans.snapshot_store import (
        ConcurrentCommitError,
        SnapshotTable,
    )

    obs_in = obs
    last_conflict: Exception | None = None
    for _attempt in range(_MAX_MERGE_REDO_ATTEMPTS):
        snap = SnapshotTable(spark, obs_table_path, OBS_PARTITION_COLS)
        expected = snap.latest_version() or 0
        target = read_obs_table(spark, obs_table_path, item)
        obs, target = _align_union_columns(obs_in, target)
        merged, finish = merge_observed(
            target, obs, item.key_fields, replace=item.replace_duplicates
        )
        try:
            _overwrite_slice(
                merged, obs_table_path, item, table_format,
                expected_version=expected,
            )
        except ConcurrentCommitError as e:
            last_conflict = e
            continue
        except Exception as e:
            for msg in (_MULTI_MATCH_MSG, _DUP_UPDATE_MSG):
                if msg in str(e):
                    raise RecordKeyError(msg) from e
            raise
        return finish()
    raise ConcurrentCommitError(
        f"merge into {obs_table_path} lost the serialization race "
        f"{_MAX_MERGE_REDO_ATTEMPTS} times"
    ) from last_conflict


def _align_union_columns(obs: DataFrame, target: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Null-extend both frames to the union of their columns (same order).

    Missing columns are per-job additional properties -- always strings
    [reference: src/tapis_direct_driver.py:159-161].
    """
    all_cols = list(dict.fromkeys([*obs.columns, *target.columns]))
    for c in all_cols:
        if c not in obs.columns:
            obs = obs.withColumn(c, F.lit(None).cast("string"))
        if c not in target.columns:
            target = target.withColumn(c, F.lit(None).cast("string"))
    return obs.select(*all_cols), target.select(*all_cols)


def run_job(
    spark: SparkSession,
    job: JobSpec,
    obs_table_path: str,
    manifest_path: str | None = None,
    staging_dir: str = "staging",
    metadata_transport=None,
    batch_files: bool = False,
    table_format: str = "snapshot",
    resume_ranges_bytes: int | None = None,
    ranges_per_commit: int | None = None,
) -> dict[str, MergeStats]:
    """Run every data_item/file, merging observations into the obs table.

    Returns per-file MergeStats. Files already complete in the manifest are
    skipped (resume contract). http(s) files are staged locally first
    [reference: src/tapis_direct_driver.py:103-107]; manifest keys stay the
    original URL so resume semantics are unchanged.

    ``metadata_transport``: optional zero-arg factory returning a sink
    transport (see operators.sinks). When given, each file's station
    metadata branch is serialized as sparse JSON docs (nodata fields
    dropped per record [reference: src/driver.py:144-152]) and written
    through it with the chunked retrying writer.

    ``batch_files``: scale mode -- all of a data item's pending files
    ingest in ONE distributed plan (per-file header dispatch, see
    observations_from_wide_many_fast) and merge once. The returned stats
    repeat the batch totals per file; the MANIFEST records the totals
    once (under "__batches__", per-file entries just point at the batch)
    so manifest sums stay additive. Resume granularity is the batch.
    Files must be
    key-disjoint (e.g. distinct months) -- conflicting duplicate keys
    across batched files raise RecordKeyError, matching the merge guard.
    Requires a local/staged path per file; items that don't qualify fall
    back to the sequential loop.

    ``table_format``: layout for a NEW observation table -- "snapshot"
    (default, transactional versioned manifest; read back via
    ``read_table``) or "plain" (bare partitioned parquet, single-writer
    only). An existing table always keeps its current layout.

    ``resume_ranges_bytes``: mid-file resume [reference: README.md:41-43].
    When set (and a manifest is given), a local file LARGER than this is
    ingested as newline-aligned byte ranges of ~this size; each group of
    ``ranges_per_commit`` ranges (default: the session's parallelism)
    merges and commits as a unit, recording per-range completion in the
    manifest. A crash mid-file then resumes at the first unfinished
    range instead of re-parsing the whole file. Merge-key idempotency
    keeps a replayed half-committed group safe.
    """
    manifest = Manifest(manifest_path) if manifest_path else None
    results: dict[str, MergeStats] = {}
    for item in job.data:
        if batch_files:
            batched = _run_item_batched(
                spark, job, item, obs_table_path, manifest, staging_dir,
                metadata_transport, table_format,
            )
            if batched is not None:
                results.update(batched)
                continue
        for file in item.files:
            if manifest and manifest.is_complete(file):
                continue
            local = stage_if_remote(file, staging_dir)
            if (
                resume_ranges_bytes
                and manifest
                and os.path.isfile(local)
                and os.path.getsize(local) > resume_ranges_bytes
            ):
                stats = _run_file_ranged(
                    spark, job, item, file, local, obs_table_path, manifest,
                    resume_ranges_bytes, ranges_per_commit,
                    metadata_transport, table_format,
                )
                results[file] = stats
                continue
            obs, meta = ingest_wide_csv(spark, local, item, job.location)
            if metadata_transport is not None:
                from station_data_ingestion_spark.operators.sinks import (
                    sparse_json_docs,
                    write_docs,
                )

                write_docs(
                    sparse_json_docs(meta, nodata=item.nodata),
                    metadata_transport,
                    retries=job.retries,
                    max_parallelism=job.concurrency,
                )
            stats = _merge_into_table(
                spark, obs, item, obs_table_path, table_format
            )
            results[file] = stats
            if manifest:
                manifest.mark_complete(file, stats)
    return results


def _run_file_ranged(
    spark: SparkSession,
    job: JobSpec,
    item: DataItemSpec,
    file: str,
    local: str,
    obs_table_path: str,
    manifest: Manifest,
    resume_ranges_bytes: int,
    ranges_per_commit: int | None,
    metadata_transport,
    table_format: str,
) -> MergeStats:
    """Ingest one huge file as resumable byte-range groups (see run_job).

    The range tiling is pinned to the split size recorded in the manifest
    on first contact, so a changed config can never mis-align a resume.
    Stats cover THIS run's ranges only (previously-completed ranges keep
    their recorded stats; the file entry rolls up the grand total).
    """
    from station_data_ingestion_spark.sources.wide_csv import (
        observations_from_wide_ranges,
        plan_file_ranges,
    )

    prior = manifest.range_state(file)
    split_bytes = prior["split_bytes"] or resume_ranges_bytes
    done = prior["ranges"]
    ranges = plan_file_ranges(local, split_bytes)
    pending = [r for r in ranges if f"{r[0]}-{r[1]}" not in done]

    if metadata_transport is not None and not done:
        # metadata derives from the whole (small-rowcount) station axis;
        # emit it once, before any range completes
        from station_data_ingestion_spark.operators.sinks import (
            sparse_json_docs,
            write_docs,
        )
        from station_data_ingestion_spark.sources.wide_csv import (
            classify_headers,
            metadata_from_wide,
            read_header,
            scan_wide_csv,
        )

        columns = read_header(spark, local)
        meta_renames, _dates = classify_headers(columns, item)
        meta = metadata_from_wide(
            scan_wide_csv(spark, local, columns), meta_renames, job.location
        )
        write_docs(
            sparse_json_docs(meta, nodata=item.nodata),
            metadata_transport,
            retries=job.retries,
            max_parallelism=job.concurrency,
        )

    group_size = ranges_per_commit or spark.sparkContext.defaultParallelism
    created = replaced = 0
    for i in range(0, len(pending), group_size):
        group = pending[i : i + group_size]
        obs = observations_from_wide_ranges(spark, local, group, item)
        if obs is None:
            break  # no in-range date columns: nothing to ingest
        stats = _merge_into_table(spark, obs, item, obs_table_path, table_format)
        created += stats.created
        replaced += stats.replaced
        manifest.mark_ranges_complete(
            file, [f"{r[0]}-{r[1]}" for r in group], stats, split_bytes
        )
    total = MergeStats(
        created=created + prior["created"], replaced=replaced + prior["replaced"]
    )
    manifest.mark_complete(file, total)
    return MergeStats(created=created, replaced=replaced)


def _run_item_batched(
    spark: SparkSession,
    job: JobSpec,
    item: DataItemSpec,
    obs_table_path: str,
    manifest,
    staging_dir: str,
    metadata_transport,
    table_format: str = "snapshot",
) -> dict[str, MergeStats] | None:
    """One-plan ingest+merge of an item's pending files (see run_job).

    Returns None when the batch path doesn't apply (no pending files ->
    empty dict; staging or header classification finds nothing usable ->
    None, caller falls back to the per-file loop).
    """
    from station_data_ingestion_spark.sources.wide_csv import (
        observations_from_wide_many_fast,
    )

    pending = [
        f for f in item.files if not (manifest and manifest.is_complete(f))
    ]
    if not pending:
        return {}
    local_by_file = {f: stage_if_remote(f, staging_dir) for f in pending}
    obs = observations_from_wide_many_fast(
        spark, list(local_by_file.values()), item
    )
    if obs is None:
        return None
    if metadata_transport is not None:
        from station_data_ingestion_spark.operators.sinks import (
            sparse_json_docs,
            write_docs,
        )
        from station_data_ingestion_spark.sources.wide_csv import (
            classify_headers,
            metadata_from_wide,
            read_header,
            scan_wide_csv,
        )

        for local in local_by_file.values():
            # metadata branch only: no need to build (and discard) the
            # observation plan that ingest_wide_csv would also produce
            columns = read_header(spark, local)
            meta_renames, _dates = classify_headers(columns, item)
            meta = metadata_from_wide(
                scan_wide_csv(spark, local, columns), meta_renames, job.location
            )
            write_docs(
                sparse_json_docs(meta, nodata=item.nodata),
                metadata_transport,
                retries=job.retries,
                max_parallelism=job.concurrency,
            )
    stats = _merge_into_table(spark, obs, item, obs_table_path, table_format)
    if manifest:
        manifest.mark_batch_complete(pending, stats)
    return {f: stats for f in pending}


def _overwrite_slice(
    merged: DataFrame,
    table_path: str,
    item: DataItemSpec,
    table_format: str = "snapshot",
    expected_version: int | None = None,
) -> None:
    """Overwrite only the merged (datatype, period) partition slice.

    Layout auto-detects from what's on disk (an existing table keeps its
    format); a NEW table uses ``table_format``:

    - "snapshot" (default): transactional versioned-snapshot commit
      (plans.snapshot_store) -- new files + atomic manifest publish, so
      concurrent readers always see a complete version and a crash
      mid-commit leaves the previous snapshot intact. Also safe on object
      stores with no atomic directory rename. Read it back with
      :func:`station_data_ingestion_spark.read_table`.
    - "plain": Spark dynamic partition overwrite. One local/HDFS writer
      only: the merged plan reads the same path it rewrites, and a reader
      listing the directory mid-swap can see a torn state.
    """
    from station_data_ingestion_spark.plans.snapshot_store import SnapshotTable

    spark = merged.sparkSession
    snap = SnapshotTable(spark, table_path, OBS_PARTITION_COLS)
    if snap.exists() or (
        table_format == "snapshot" and not _table_has_parquet(spark, table_path)
    ):
        # NOT clustered: repartitionByRange samples its child plan, which
        # would evaluate the merge plan (and its created/replaced stat
        # aggregation) twice. Zone-map stats still record; a maintenance
        # pass can re-cluster slices offline when date pruning matters.
        snap.commit_overwrite_partitions(merged, expected_version=expected_version)
        return
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.write.mode("overwrite")
            .partitionBy(*OBS_PARTITION_COLS)
            .parquet(table_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
