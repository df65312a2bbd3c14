"""Mergeable frequency sketches: count-min and space-saving heavy
hitters.

The distributed-sketch pattern: each partition builds a small fixed-size
summary in one Arrow pass, the summaries MERGE associatively (numpy
adds / summary union) on the driver or in a tree, and the final sketch
answers frequency queries with known one-sided error. This is how
frequency estimation works when the key cardinality is too large for an
exact groupBy to be worth its shuffle — the sketch never shuffles the
data at all: a mapInPandas stage emits one serialized summary per
partition (rows = partitions, not keys), and the driver folds them.

- **Count-min sketch** (Cormode–Muthukrishnan 2005): d x w counter
  matrix, item increments one counter per row (row-wise hash). Merge =
  elementwise add. Estimate = min over rows; NEVER undercounts
  (one-sided), overcounts by at most eps*N with probability 1-delta for
  w = ceil(e/eps), d = ceil(ln(1/delta)).
- **Space-saving** (Metwally 2005): k (item, count, overestimate)
  slots; evicting the min slot inherits its count as the new item's
  overestimate. Merge: sum counts for shared items, inherit the other
  summary's min for absent ones, re-truncate to k. Every item with true
  frequency > N/k is guaranteed present in the k-slot summary.

Both sketches hash/serialize deterministically (pd.util.hash_array with
fixed keys), so results are reproducible across runs and partitionings
for count-min; space-saving's counts depend on arrival order per
partition (inherent to the algorithm), but its GUARANTEES (no false
negatives above N/k, bounded overestimate) hold under any order — the
tests assert the guarantees, not an order-dependent trace.

[reference: none — engine surface ("a novel sketch" class from the
capability brief); exact twins exist in the registry for oracle
anchoring of the same questions (agg_mode_deterministic,
text_token_frequencies).]
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_HK = "cmsk0123456789ab"


def _rows_hash(values, d: int, w: int):
    """(n, d) int64 matrix of counter columns per value."""
    import numpy as np
    import pandas as pd

    s = pd.Series(values).astype(str).to_numpy(dtype=object)
    cols = np.empty((len(s), d), dtype="int64")
    for r in range(d):
        h = pd.util.hash_array(s, hash_key=f"{_HK[:14]}{r:02d}")
        cols[:, r] = (h % np.uint64(w)).astype("int64")
    return cols


def cms_build(df: DataFrame, col: str, d: int = 5, w: int = 2048):
    """Count-min matrix (d x w int64 numpy array) for df[col].

    One narrow Arrow pass; per-partition partial matrices are merged by
    elementwise addition (associative+commutative, so partitioning
    never changes the result). Driver cost: one d*w matrix per
    partition, folded as they arrive.
    """
    import numpy as np

    def partials(batches):
        import pandas as pd

        m = np.zeros((d, w), dtype="int64")
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            cols = _rows_hash(pdf[col], d, w)
            for r in range(d):
                np.add.at(m[r], cols[:, r], 1)
        if seen:
            yield pd.DataFrame({"m": [m.tobytes()]})

    rows = df.select(col).mapInPandas(partials, "m binary").collect()
    total = np.zeros((d, w), dtype="int64")
    for r in rows:
        total += np.frombuffer(r["m"], dtype="int64").reshape(d, w)
    return total


def cms_estimate(matrix, values, d: int = 5, w: int = 2048):
    """Point-frequency estimates (list[int]) for `values`; never below
    the true count."""
    import numpy as np

    cols = _rows_hash(values, d, w)
    ests = []
    for i in range(len(values)):
        ests.append(int(min(matrix[r, cols[i, r]] for r in range(d))))
    return ests


def _ss_merge(a: dict, b: dict, k: int) -> dict:
    """Merge two space-saving summaries {item: (count, over)} to k slots."""
    min_a = min((c for c, _ in a.values()), default=0)
    min_b = min((c for c, _ in b.values()), default=0)
    merged: dict = {}
    for item in set(a) | set(b):
        ca, oa = a.get(item, (min_b, min_b))
        cb, ob = b.get(item, (min_a, min_a))
        if item in a and item in b:
            merged[item] = (ca + cb, oa + ob)
        elif item in a:
            merged[item] = (ca + min_b, oa + min_b)
        else:
            merged[item] = (cb + min_a, ob + min_a)
    top = sorted(merged.items(), key=lambda kv: (-kv[1][0], str(kv[0])))[:k]
    return dict(top)


def space_saving_topk(
    df: DataFrame, col: str, k: int = 32, with_total: bool = False
):
    """(item, est_count, overestimate) list, count-descending.

    Guarantee: any item with true frequency > N/k appears; est_count >=
    true count >= est_count - overestimate. Per-partition summaries are
    k-slot dicts built in one Arrow pass and tree-merged on the driver
    (rows collected = partitions, never keys).

    ``with_total=True`` returns ``(items, n)`` where ``n`` is the exact
    row count, accumulated on the SAME scan (per-partition counts ride
    the partial summaries) -- the N of the N/k guarantee without a
    second pass over the data.
    """

    def partials(batches):
        import pandas as pd
        from pyspark import TaskContext

        slots: dict = {}
        n_rows = 0
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            n_rows += len(pdf)
            for v in pdf[col].astype(str):
                if v in slots:
                    c, o = slots[v]
                    slots[v] = (c + 1, o)
                elif len(slots) < k:
                    slots[v] = (1, 0)
                else:
                    evict = min(slots.items(), key=lambda kv: (kv[1][0], kv[0]))
                    c_min = evict[1][0]
                    del slots[evict[0]]
                    slots[v] = (c_min + 1, c_min)
        if seen:
            pid = TaskContext.get().partitionId()
            yield pd.DataFrame(
                {
                    "pid": pid,
                    "item": list(slots),
                    "c": [slots[i][0] for i in slots],
                    "o": [slots[i][1] for i in slots],
                    "n": n_rows,
                }
            )

    rows = df.select(col).mapInPandas(
        partials, "pid int, item string, c long, o long, n long"
    ).collect()
    by_part: dict[int, dict] = {}
    n_by_part: dict[int, int] = {}
    for r in rows:
        by_part.setdefault(r["pid"], {})[r["item"]] = (int(r["c"]), int(r["o"]))
        n_by_part[r["pid"]] = int(r["n"])
    summary: dict = {}
    # deterministic fold order (by partition id): merge is conservative
    # in any order, but a fixed order makes repeated runs identical
    for pid in sorted(by_part):
        summary = _ss_merge(summary, by_part[pid], k)
    items = [
        (item, c, o)
        for item, (c, o) in sorted(
            summary.items(), key=lambda kv: (-kv[1][0], str(kv[0]))
        )
    ]
    if with_total:
        return items, sum(n_by_part.values())
    return items
