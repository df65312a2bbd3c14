"""Bloom-filter semi-join pre-filter: cut a big side's shuffle volume
before an exact join.

The pattern behind Spark's own runtime row-level filtering (and every
warehouse's join pruning): summarize the dim side's key set in a Bloom
filter and drop fact rows that cannot match BEFORE the shuffle. The
exact join still runs after the pre-filter, so false positives cost
only wasted shuffle bytes, never correctness — results are identical
to the plain join.

Everything stays JVM-side (no Python stage anywhere):

- **build**: each dim key's k probe-bit indices are computed with
  ``xxhash64`` Column expressions, exploded, and OR-folded into 64-bit
  words with a ``bit_or`` aggregation grouped by word index. ``bit_or``
  partial-aggregates map-side, so the shuffle AND the driver collect are
  bounded by ``m_bits/64`` words (16 KiB of longs for the default 2^20
  bits) — NOT by the dim key count. The dim side is never collected;
  it can be arbitrarily large.
- **probe**: the packed words travel as ONE array<bigint> value in a
  single-row broadcast joined to the fact side (a broadcast
  nested-loop join against one row: each output row just references
  the same array — one ~m/8-byte broadcast per executor, no per-row
  copy). Deliberately NOT ``F.lit(list)``: PySpark expands a list
  literal into ``CreateArray`` with m/64 child literals evaluated per
  row, which measured 18x SLOWER than the plain join at sf0.1. Each
  fact row then evaluates k ``get``/``shiftright``/``&`` predicates —
  plain codegen-capable expressions (no interpreted higher-order
  function) — referencing only the key column, so column pruning keeps
  the fact scan narrow and no row ever crosses into a Python worker.

Both sides hash the SAME Spark-typed value with the SAME JVM xxhash64
(the dim key is cast to the fact key's type first), so there is no
driver-vs-worker string-rendering divergence for floats or any other
type — no false negatives by construction.

Double hashing (idx_i = h1 + i*h2 mod m, h2 odd) gives k probes from
the lower/upper halves of one xxhash64 evaluation (Kirsch-Mitzenmacher);
all arithmetic is done on pmod-reduced values so it is overflow-free
under ANSI mode.

At 100 TB: the fact-side scan stays narrow (only the key column feeds
the filter), the filter costs one ≤ m/8-byte broadcast per executor,
and the exchange after it carries only candidate rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _index_exprs(col: Column, m_bits: int, k: int) -> list[Column]:
    """k bit-index Columns for `col` (double hashing, all values < m).

    Both hashes derive from ONE xxhash64 evaluation (lower bits -> h1,
    upper 32 bits -> h2, Kirsch-Mitzenmacher style): per-row probe cost
    is a single hash plus k pmod/shift index computations."""
    h = F.xxhash64(col)
    h1 = F.pmod(h, F.lit(m_bits))
    # odd step < m_bits: full-period stepping when m is a power of two
    h2 = F.pmod(F.shiftright(h, 32), F.lit(m_bits // 2)) * 2 + 1
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)]


def build_bloom_words(keys: DataFrame, on: str, m_bits: int = 1 << 20, k: int = 4) -> list[int]:
    """Bloom bit array for `keys[on]`, packed into m_bits/64 int64 words.

    Distributed build: explode each key's k bit indices, OR them into
    words with a partial-aggregating ``bit_or`` — the shuffle and the
    driver collect are bounded by the word count, never the key count.
    """
    if m_bits % 64 or m_bits < 64:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    exploded = keys.select(
        F.explode(F.array(*_index_exprs(F.col(on), m_bits, k))).alias("idx")
    )
    rows = (
        exploded.groupBy(F.expr("idx div 64").alias("w"))
        .agg(F.expr("bit_or(shiftleft(1L, cast(idx % 64 as int)))").alias("bits"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["w"]] = r["bits"]
    return words


def bloom_might_contain(col: Column, words: Column, m_bits: int, k: int) -> Column:
    """Boolean Column: all k probe bits of `col` are set in the packed
    word array `words` (an array<bigint> Column — pass the single-row
    broadcast attribute, see :func:`bloom_prefilter`).

    Pure JVM expression tree (get / shiftright / bitwise-and) — runs
    inside WholeStageCodegen.
    """
    tests = []
    for idx in _index_exprs(col, m_bits, k):
        word = F.get(words, F.floor(idx / F.lit(64)).cast("int"))
        bit = F.call_function(
            "shiftright", word, F.pmod(idx, F.lit(64)).cast("int")
        ).bitwiseAND(F.lit(1))
        tests.append(bit == 1)
    return reduce(lambda a, b: a & b, tests)


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
    key_type = big.schema[on].dataType
    # canonical typed hashing: cast the dim key to the fact key's exact
    # type so xxhash64 sees identical bits on both sides
    keys = small.select(F.col(on).cast(key_type).alias(on))
    words = build_bloom_words(keys, on, m_bits=m_bits, k=k)
    spark = big.sparkSession
    bf = spark.createDataFrame(
        [(words,)],
        T.StructType([T.StructField("__bf", T.ArrayType(T.LongType()), False)]),
    )
    return (
        big.crossJoin(F.broadcast(bf))
        .filter(bloom_might_contain(F.col(on), F.col("__bf"), m_bits, k))
        .drop("__bf")
    )


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
