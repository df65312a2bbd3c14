"""Bloom-filter semi-join pre-filter: cut a big side's shuffle volume
before an exact join.

The pattern behind Spark's own runtime row-level filtering (and every
warehouse's join pruning): when the dim side's key set is small enough
to summarize, ship a Bloom filter to the fact side's scan and drop rows
that cannot match BEFORE the shuffle. The exact join still runs after
the pre-filter, so false positives cost only wasted shuffle bytes,
never correctness — results are identical to the plain join.

Implementation notes (pure numpy/Arrow — the JVM BloomFilter from
df.stat.bloomFilter is a py4j handle that cannot ship to Python
workers):
- driver collects the DISTINCT dim keys (bounded by the dim table — the
  same boundedness argument as broadcast joins; do not use this when the
  dim side is huge),
- double hashing (idx_i = h1 + i*h2 mod m) over two independent 64-bit
  hashes from pandas' SipHash (`pd.util.hash_array` with different hash
  keys) gives k probes per key,
- the bit array broadcasts once per executor; membership tests are
  vectorized per Arrow batch.

At 100 TB: fact-side scan stays narrow (key column only feeds the
filter), the filter is one broadcast of m/8 bytes, and the exchange
after it carries only candidate rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


_HK1 = "0123456789abcdef"
_HK2 = "fedcba9876543210"


def _probe_indices(values, m_bits: int, k: int):
    """(n, k) array of bit indices for each value (double hashing)."""
    import numpy as np
    import pandas as pd

    s = pd.Series(values).astype(str)
    h1 = pd.util.hash_array(s.to_numpy(dtype=object), hash_key=_HK1)
    h2 = pd.util.hash_array(s.to_numpy(dtype=object), hash_key=_HK2) | 1
    idx = (
        h1[:, None] + np.arange(k, dtype="uint64")[None, :] * h2[:, None]
    ) % np.uint64(m_bits)
    return idx.astype("int64")


def build_bloom_bits(keys, m_bits: int = 1 << 20, k: int = 4):
    """Dense uint8 bit array with all keys' probe bits set."""
    import numpy as np

    bits = np.zeros(m_bits // 8, dtype="uint8")
    if len(keys):
        idx = _probe_indices(keys, m_bits, k).ravel()
        np.bitwise_or.at(bits, idx // 8, (1 << (idx % 8)).astype("uint8"))
    return bits


def bloom_prefilter(
    big: DataFrame,
    small: DataFrame,
    on: str,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """`big` restricted to rows whose `on` value MIGHT appear in
    `small[on]` (no false negatives; a tunable false-positive rate).
    This is the shuffle-volume reducer; compose with an exact join for
    exact results."""
    keys = [r[0] for r in small.select(on).distinct().collect()]
    bits = build_bloom_bits(keys, m_bits=m_bits, k=k)
    bc = big.sparkSession.sparkContext.broadcast(bits)
    schema = big.schema

    def might_contain(batches):
        arr = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            idx = _probe_indices(pdf[on].to_numpy(), m_bits, k)
            hits = (arr[idx // 8] & (1 << (idx % 8)).astype("uint8")) != 0
            yield pdf[hits.all(axis=1)]

    return big.mapInPandas(might_contain, schema)


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """`big.join(small, on, how)` with a Bloom pre-filter on `big`.

    Exact results (the real join follows the pre-filter); `how` must be
    a match-only join (inner/semi) — outer joins would lose the rows the
    filter drops.
    """
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(f"bloom pre-filter only for inner/semi joins, got {how}")
    filtered = bloom_prefilter(big, small, on, m_bits=m_bits, k=k)
    if how == "inner":
        return filtered.join(small, on, "inner")
    return filtered.join(small, on, "left_semi")
