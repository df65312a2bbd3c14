"""KMV (k-minimum-values / bottom-k) mergeable distinct-count sketch.

The classic distributed COUNT(DISTINCT) trade: hash every key to a
uniform 64-bit value and keep only the k SMALLEST hashes per group.
The k-th smallest hash estimates the key density — if k minima span a
fraction ``h_k / 2^64`` of the hash space, about ``(k-1) / (h_k/2^64)``
distinct keys exist (Bar-Yossef et al. 2002; Beyer et al. 2007 for the
unbiased (k-1) form). Two properties make it the right shape at 100 TB:

- **Mergeable**: union of two sketches = union of their hash sets,
  re-truncated to the k smallest. So per-partition partials (bounded
  k * 8 bytes per group, no matter how many rows the partition holds)
  combine associatively — the shuffle moves sketches, never keys. The
  same merge implements DISTINCT-of-UNION across relations without
  re-scanning either side: ``sketch(A ∪ B) = merge(sketch(A),
  sketch(B))`` exactly (both sides keep the same bottom-k of the same
  hash function).
- **Exact below k**: while a group has fewer than k distinct keys the
  sketch holds ALL its hashes, so the estimate IS the exact distinct
  count (up to 64-bit hash collisions, ~n^2/2^65 — negligible and
  deterministic). That is what makes it oracle-checkable: at test SF
  the true NDV sits under k, so the sketch path must equal DuckDB's
  COUNT(DISTINCT) bit-for-bit; beyond k the estimator degrades
  gracefully to a ±1/sqrt(k) relative-error approximation.

Execution shape: one narrow Arrow pass (mapInPandas) emits per
(input-partition, group) bottom-k arrays — rows bounded by
partitions * groups, not data — then ONE tiny shuffle groups partials
by group key and applyInPandas folds them. Driver sees only the final
per-group sketch rows (k * 8 bytes each) when the caller needs sketch
algebra (cross-group unions).

State bound: a partial holds groups_in_partition * k hashes. KMV is
meant for FEW groups x HUGE key cardinality (the opposite corner —
many groups, small NDV each — is a plain groupBy/countDistinct, which
Spark already does with partial aggregation). Callers with unbounded
group domains should pre-aggregate or cap k accordingly.

[reference: none — engine surface ("a novel sketch" class from the
capability brief), same gate pattern as operators/sketches.py:
guarantee-anchored so the oracle can verify it exactly.]
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# pd.util.hash_array requires exactly 16 bytes of hash key.
_HASH_KEY = "kmvsketch0123456"
_PARTIAL_SCHEMA = "grp string, hashes binary"


def _hash_u64(values):
    """Deterministic uint64 hash of values via their string form.

    String canonicalization makes the hash engine-independent and
    stable across int/str key columns; pd.util.hash_array with a fixed
    key is reproducible across runs, partitions and platforms.
    """
    import numpy as np
    import pandas as pd

    s = pd.Series(values).astype(str).to_numpy(dtype=object)
    return pd.util.hash_array(s, hash_key=_HASH_KEY).astype(np.uint64)


def merge_hashes(parts, k: int):
    """Fold sorted-unique uint64 hash arrays into one bottom-k array.

    Associative and commutative (set union then truncate), so any fold
    tree gives the same sketch.
    """
    import numpy as np

    if not parts:
        return np.empty(0, dtype=np.uint64)
    merged = parts[0] if len(parts) == 1 else np.unique(np.concatenate(parts))
    return merged[:k]


def kmv_estimate(hashes, k: int) -> int:
    """Distinct-count estimate from a bottom-k sketch array.

    Exact (= len) while the sketch is unsaturated; the unbiased
    (k-1)/density estimator once full.
    """
    if len(hashes) < k:
        return int(len(hashes))
    kth = int(hashes[k - 1])
    # density of the k-th minimum in [0, 2^64); +1 guards kth == 0
    return round((k - 1) * float(2**64) / float(kth + 1))


def kmv_sketches(df: DataFrame, key_col: str, group_col: str, k: int) -> DataFrame:
    """Per-group bottom-k sketch DataFrame: (grp string, hashes binary).

    Stage 1 (no shuffle): every input partition emits one row per group
    it contains, carrying that partition's bottom-k hash set.
    Stage 2 (sketch-sized shuffle): partials group by `grp` and fold.
    """

    def partials(batches):
        import numpy as np
        import pandas as pd

        acc: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            h = _hash_u64(pdf["k"])
            for g, idx in pdf.groupby("grp", sort=False).indices.items():
                cand = np.unique(h[idx])
                prev = acc.get(g)
                acc[g] = cand[:k] if prev is None else merge_hashes([prev, cand], k)
        for g, arr in acc.items():
            yield pd.DataFrame({"grp": [g], "hashes": [arr.tobytes()]})

    def fold(pdf):
        import numpy as np
        import pandas as pd

        parts = [
            np.frombuffer(b, dtype=np.uint64) for b in pdf["hashes"] if len(b)
        ]
        merged = merge_hashes(parts, k)
        return pd.DataFrame(
            {"grp": [pdf["grp"].iloc[0]], "hashes": [merged.tobytes()]}
        )

    # NULL semantics match SQL COUNT(DISTINCT): null keys are dropped
    # before hashing (they would otherwise stringify to 'None'/'nan' and
    # count as a spurious distinct value). Null GROUP BY keys are also
    # dropped here -- pandas groupby would silently discard them anyway,
    # so making the filter explicit keeps the sketch deterministic;
    # callers needing SQL's NULL group must coalesce the group column
    # to a sentinel before sketching.
    narrow = df.select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(key_col).alias("k"),
    ).where(F.col("grp").isNotNull() & F.col("k").isNotNull())
    return (
        narrow.mapInPandas(partials, _PARTIAL_SCHEMA)
        .groupBy("grp")
        .applyInPandas(fold, _PARTIAL_SCHEMA)
    )
