"""Multimodal columns: opaque binary payloads + typed metadata.

The container has no image/audio libraries, so the *decode* is a
deterministic stand-in (documented stub), but the Spark-side plumbing is
real and scale-shaped: binary columns, typed metadata structs, Arrow-
batched mapInPandas for the decode stage, sequence/explode for frame
sampling. Real deployments swap `_fake_decode_batch` for PIL/ffmpeg
decoding; schema, partitioning, UDF signature, and batch shape stay.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F

from station_data_ingestion_spark.queries.registry import load, query


@query(
    "mm_binary_metadata",
    """
SELECT doc_id,
       'application/octet-stream' AS mime,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS checksum,
       CAST(doc_id % 3 = 0 AS INT) AS is_sampled
FROM documents
""",
)
def mm_binary_metadata(spark, sf_dir):
    """Opaque binary payload column + typed metadata row per asset.

    The binary column is built from text (the corpus has no real media);
    the metadata struct (mime, n_bytes, checksum) is the real pattern for
    100 TB multimodal tables: metadata columns stay queryable/prunable
    while payload bytes are only materialized by stages that decode."""
    d = load(spark, sf_dir, "documents")["documents"]
    payload = F.encode("text", "utf-8")
    return d.select(
        "doc_id",
        F.lit("application/octet-stream").alias("mime"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("checksum"),
        (F.col("doc_id") % 3 == 0).cast("int").alias("is_sampled"),
    )


def _fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decode: deterministic fake image dimensions from the checksum.

    A real implementation would decode `payload` (PIL/libav) per Arrow
    batch; unavailable in this container, so dimensions derive from the
    md5 checksum (first two hex nibbles). Raises nowhere -- the plumbing
    (Arrow batch in/out, schema contract) is the tested surface.
    """
    for pdf in batches:
        nib0 = pdf["checksum"].str[0].apply(lambda c: int(c, 16))
        nib1 = pdf["checksum"].str[1].apply(lambda c: int(c, 16))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": (64 + nib0 * 16).astype("int32"),
                "height": (64 + nib1 * 16).astype("int32"),
                "n_pixels": ((64 + nib0 * 16) * (64 + nib1 * 16)).astype("int64"),
            }
        )


@query(
    "mm_decode_features",
    """
WITH meta AS (
  SELECT doc_id, md5(text) AS checksum FROM documents
)
SELECT doc_id,
       CAST(64 + (strpos('0123456789abcdef', substr(checksum, 1, 1)) - 1) * 16 AS INT) AS width,
       CAST(64 + (strpos('0123456789abcdef', substr(checksum, 2, 1)) - 1) * 16 AS INT) AS height,
       CAST((64 + (strpos('0123456789abcdef', substr(checksum, 1, 1)) - 1) * 16)
            * (64 + (strpos('0123456789abcdef', substr(checksum, 2, 1)) - 1) * 16)
            AS BIGINT) AS n_pixels
FROM meta
""",
)
def mm_decode_features(spark, sf_dir):
    """Decode/feature-extract stage via Arrow-batched mapInPandas.

    The stub decode is deterministic (dims from checksum nibbles) so the
    oracle can state the same arithmetic in SQL -- proving the Python
    stage's plumbing end-to-end while the heavy lifting stays batch-wise.
    """
    d = load(spark, sf_dir, "documents")["documents"]
    meta = d.select("doc_id", F.md5(F.encode("text", "utf-8")).alias("checksum"))
    return meta.mapInPandas(
        _fake_decode_batch, "doc_id long, width int, height int, n_pixels long"
    )


def _fake_resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB resize: aspect-preserving thumbnail dims, longest side 128.

    A real implementation would decode + resample pixels (PIL.thumbnail)
    per Arrow batch; unavailable in this container, so only the dimension
    arithmetic runs. Schema/batch plumbing is the tested surface.
    """
    for pdf in batches:
        import numpy as np

        w = pdf["width"].to_numpy(dtype="int64")
        h = pdf["height"].to_numpy(dtype="int64")
        scale = 128.0 / np.maximum(w, h)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "thumb_w": np.floor(w * scale).astype("int32"),
                "thumb_h": np.floor(h * scale).astype("int32"),
            }
        )


@query(
    "mm_resize_thumbnails",
    """
WITH meta AS (SELECT doc_id, md5(text) AS checksum FROM documents),
dims AS (
  SELECT doc_id,
         64 + (strpos('0123456789abcdef', substr(checksum, 1, 1)) - 1) * 16 AS w,
         64 + (strpos('0123456789abcdef', substr(checksum, 2, 1)) - 1) * 16 AS h
  FROM meta
)
SELECT doc_id,
       CAST(FLOOR(w * 128.0 / GREATEST(w, h)) AS INT) AS thumb_w,
       CAST(FLOOR(h * 128.0 / GREATEST(w, h)) AS INT) AS thumb_h
FROM dims
""",
)
def mm_resize_thumbnails(spark, sf_dir):
    """Resize stage chained after decode: two Arrow stages fuse into one
    Python runner (no shuffle between them), the pattern for chained
    per-asset transforms at 100 TB."""
    decoded = mm_decode_features(spark, sf_dir)
    return decoded.select("doc_id", "width", "height").mapInPandas(
        _fake_resize_batch, "doc_id long, thumb_w int, thumb_h int"
    )


@query(
    "mm_audio_features",
    """
SELECT doc_id,
       CAST(FLOOR(octet_length(encode(text)) * 1000 / 16000) AS BIGINT) AS duration_ms,
       CAST(FLOOR(octet_length(encode(text)) / 2) AS BIGINT) AS n_samples,
       CAST(doc_id % 2 AS INT) AS channel_layout
FROM documents
""",
)
def mm_audio_features(spark, sf_dir):
    """Audio metadata stand-in: duration/sample-count derived from payload
    byte length at a nominal 16 kHz 16-bit mono rate. The real decode
    (libav/soundfile) is stubbed; the byte-length arithmetic is JVM-side
    so the scan never leaves codegen."""
    d = load(spark, sf_dir, "documents")["documents"]
    nbytes = F.length(F.encode("text", "utf-8")).cast("long")
    return d.select(
        "doc_id",
        F.floor(nbytes * 1000 / 16000).alias("duration_ms"),
        F.floor(nbytes / 2).alias("n_samples"),
        (F.col("doc_id") % 2).cast("int").alias("channel_layout"),
    )


@query(
    "mm_frame_sampling",
    """
WITH assets AS (
  SELECT doc_id, CAST(doc_id % 30 + 1 AS INT) AS n_frames FROM documents
  WHERE doc_id % 4 = 0
)
SELECT doc_id, n_frames, UNNEST(range(0, n_frames, 5)) AS frame_idx
FROM assets
""",
)
def mm_frame_sampling(spark, sf_dir):
    """Video-style frame sampling: every-5th-frame explode per asset.

    range/sequence + explode is the scalable pattern: frame rows are
    generated executor-side, never on the driver."""
    d = load(spark, sf_dir, "documents")["documents"]
    assets = d.filter(F.col("doc_id") % 4 == 0).select(
        "doc_id", (F.col("doc_id") % 30 + 1).cast("int").alias("n_frames")
    )
    return assets.select(
        "doc_id",
        "n_frames",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(5))).alias("fi"),
    ).select("doc_id", "n_frames", F.col("fi").cast("long").alias("frame_idx"))


@query(
    "mm_phash_neardup",
    """
WITH a0 AS (
  SELECT doc_id,
         list_transform(
           string_split(regexp_replace(text, '[^ -~]', '', 'g'), ''),
           x -> unicode(x)) AS cs
  FROM documents
),
a1 AS (
  SELECT doc_id, cs, len(cs) AS n,
         CAST(list_aggregate(cs, 'sum') AS BIGINT) AS total
  FROM a0 WHERE len(cs) >= 60
),
h AS (
  SELECT doc_id,
         CAST(list_aggregate(list_transform(range(0, 60), b ->
           CASE WHEN CAST(list_aggregate(
                       array_slice(cs, (b*n)//60 + 1, ((b+1)*n)//60),
                       'sum') AS BIGINT) * n
                     > total * (((b+1)*n)//60 - (b*n)//60)
                THEN (1::BIGINT << b) ELSE 0 END), 'sum') AS BIGINT) AS ph
  FROM a1
)
SELECT x.doc_id AS a_id, y.doc_id AS b_id,
       CAST(bit_count(xor(x.ph, y.ph)) AS BIGINT) AS hamming
FROM h x JOIN h y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.ph, y.ph)) <= 11
""",
)
def mm_phash_neardup(spark, sf_dir):
    """Perceptual-hash near-duplicate pairs over the binary payload
    column (operators/phash.py): 60-bit block-mean aHash per asset in
    one narrow Arrow stage, candidates from 12x5-bit band buckets
    (lossless for Hamming <= 11 by pigeonhole), exact JVM bit_count
    rerank. The oracle recomputes the identical integer-exact hash
    definition in SQL and brute-forces all pairs — so the banded path
    must find EXACTLY the brute-force pairs, proving the bucketing
    loses nothing."""
    from station_data_ingestion_spark.operators.phash import phash_neardup_pairs

    d = load(spark, sf_dir, "documents")["documents"]
    payload = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return phash_neardup_pairs(payload, "doc_id", "payload", max_hamming=11)
