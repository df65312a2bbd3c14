"""Perceptual-hash near-duplicate detection for binary/media payloads.

The aHash family: split the payload into fixed blocks, set bit b when
block b's mean exceeds the global mean, compare hashes by Hamming
distance. On real media the blocks are pixels after decode; this
container has no decoders (multimodal decode is a documented stub), so
the hash runs over the payload's printable-ASCII byte projection — the
locality property (similar payloads -> similar hashes) still holds for
the text-backed fixtures, and the DISTRIBUTED machinery is the real
surface:

- one narrow Arrow stage computes the 60-bit hash per row (numpy
  ``add.reduceat`` over block boundaries; exact integer compares
  ``sum_b * n > total * cnt_b`` so the definition is engine-portable);
- candidate pairs come from BAND BUCKETING: 12 bands of 5 bits; by
  pigeonhole, two hashes within Hamming distance 11 MUST agree on at
  least one whole band, so bucketing is lossless for the <=11 threshold
  (bands > max_hamming, the SimHash-banding completeness argument; a
  production 256-bit hash would use wider bands for the same budget);
- the exact Hamming rerank is JVM-side ``bit_count(a ^ b)`` on the
  bucketed candidates only — never all pairs.

At 100 TB: hashing is embarrassingly parallel per row; the only
shuffles key on (band, value) buckets whose size the 10-bit bands keep
small; the rerank join carries candidate pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BITS = 60
N_BANDS = 12
BAND_BITS = N_BITS // N_BANDS


def _ahash_batches(batches):
    import numpy as np

    for pdf in batches:
        out = []
        for s in pdf["payload"]:
            b = np.frombuffer(
                s if isinstance(s, (bytes, bytearray)) else str(s).encode(),
                dtype=np.uint8,
            )
            b = b[(b >= 0x20) & (b <= 0x7E)]  # printable-ASCII projection
            n = len(b)
            if n < N_BITS:
                out.append(None)
                continue
            bounds = (np.arange(N_BITS) * n) // N_BITS
            sums = np.add.reduceat(b.astype(np.int64), bounds)
            cnts = np.diff(np.append(bounds, n))
            total = int(b.sum(dtype=np.int64))
            bits = (sums * n) > (total * cnts)
            h = int(np.sum(bits.astype(np.int64) << np.arange(N_BITS)))
            out.append(h)
        import pandas as pd

        res = pdf[["row_id"]].copy()
        # nullable Int64, NOT a plain object/float column: None entries
        # would coerce the column to float64 and silently truncate the
        # hash's low bits (doubles hold 53 bits, the hash has 60)
        res["phash"] = pd.array(out, dtype="Int64")
        yield res


def with_ahash(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """(id, phash) rows — null-hash rows (payload too short) dropped."""
    src = df.select(
        F.col(id_col).alias("row_id"), F.col(payload_col).alias("payload")
    )
    hashed = src.mapInPandas(_ahash_batches, "row_id long, phash long")
    return hashed.filter(F.col("phash").isNotNull())


def phash_neardup_pairs(
    df: DataFrame, id_col: str, payload_col: str, max_hamming: int = 11
) -> DataFrame:
    """(a_id, b_id, hamming) pairs with Hamming(phash) <= max_hamming.

    max_hamming must stay < N_BANDS for the band bucketing to be
    lossless (pigeonhole: fewer flipped bits than bands leaves one band
    untouched).
    """
    if max_hamming >= N_BANDS:
        raise ValueError(
            f"max_hamming={max_hamming} needs > {max_hamming} bands for "
            f"lossless bucketing; operator has {N_BANDS}"
        )
    # Materialize the (id, phash) table once: it feeds BOTH sides of the
    # band self-join, and without real size stats Catalyst broadcasts a
    # corpus-sized build side and runs the Python hash stage twice (the
    # minhash-LSH scale-killer, same shape). One row per image, so the
    # checkpoint is far smaller than the payload scan it replaces.
    hashed = with_ahash(df, id_col, payload_col).localCheckpoint(eager=True)
    bands = hashed.select(
        "row_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.shiftright(F.col("phash"), k * BAND_BITS)
                        .bitwiseAND(F.lit((1 << BAND_BITS) - 1))
                        .alias("sig"),
                    )
                    for k in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("row_id", "phash", "bk.band", "bk.sig")
    a = bands.select(
        F.col("row_id").alias("a_id"), F.col("phash").alias("ha"), "band", "sig"
    )
    b = bands.select(
        F.col("row_id").alias("b_id"), F.col("phash").alias("hb"), "band", "sig"
    )
    cands = (
        a.join(b, ["band", "sig"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "ha", "hb")
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cands.withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )
