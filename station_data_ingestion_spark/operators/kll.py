"""Mergeable quantile sketch (KLL-style) + sketch-guided EXACT quantiles.

The scale problem: an exact quantile needs a global sort; a 100 TB sort
for one number is absurd, and Spark's approxQuantile is
non-deterministic and approximate. The KLL family (Karnin, Lang,
Liberty 2016) solves the sketch half: per-partition compactor stacks of
O(k log n) samples that MERGE associatively, so a full pass yields
rank-error-bounded quantile estimates with only sketch-sized driver
traffic (the same partial->driver-reduce shape as operators/kmeans.py
and sketches.py).

This module then closes the exactness gap the same way sketch_q.py's
CMS/space-saving queries do (sketch proposes, exact disposes):

1. one pass builds per-partition KLL sketches; driver merges;
2. the sketch brackets each target rank with a [lo, hi] value band;
3. an exact pass counts rows below/inside the band and VERIFIES the
   true rank falls inside (if the sketch's probabilistic-style bound
   ever missed, the band widens to the full range — correctness never
   depends on the sketch);
4. equi-width histogram refinement narrows the band until it is
   driver-small, then the exact rank element is picked locally.

Every pass is a pushed-down column scan + JVM aggregate over a
shrinking predicate; nothing global is ever sorted or collected beyond
the final (tiny) band. Determinism: compaction uses ALTERNATING parity
instead of coin flips (the de-randomized compactor variant), so the
same data in the same partitioning yields the same sketch — and the
final answer is exact regardless.

[reference: none — engine surface ("a novel sketch" class), joining
CMS + space-saving in operators/sketches.py]
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class KLLSketch:
    """Equal-capacity compactor stack; weight of level h is 2**h."""

    def __init__(self, k: int = 200):
        if k < 8:
            raise ValueError(f"k must be >= 8, got {k}")
        self.k = k
        self.levels: list[list[float]] = [[]]
        self.parity = 0

    def update_many(self, values) -> None:
        self.levels[0].extend(float(v) for v in values)
        self._compress()

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        while len(self.levels) < len(other.levels):
            self.levels.append([])
        for h, lvl in enumerate(other.levels):
            self.levels[h].extend(lvl)
        self._compress()
        return self

    def _compress(self) -> None:
        h = 0
        while h < len(self.levels):
            if len(self.levels[h]) >= 2 * self.k:
                buf = sorted(self.levels[h])
                # odd leftover rides at the current level unpromoted
                keep = buf[-1:] if len(buf) % 2 else []
                buf = buf[: len(buf) - len(buf) % 2]
                promoted = buf[self.parity :: 2]
                self.parity ^= 1
                self.levels[h] = keep
                if h + 1 == len(self.levels):
                    self.levels.append([])
                self.levels[h + 1].extend(promoted)
            h += 1

    def weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for h, lvl in enumerate(self.levels):
            vals.extend(lvl)
            wts.extend([1 << h] * len(lvl))
        order = np.argsort(np.asarray(vals, dtype=np.float64), kind="stable")
        return (
            np.asarray(vals, dtype=np.float64)[order],
            np.asarray(wts, dtype=np.int64)[order],
        )

    def quantile(self, phi: float) -> float:
        vals, wts = self.weighted_items()
        if not len(vals):
            raise ValueError("empty sketch")
        cum = np.cumsum(wts)
        target = phi * cum[-1]
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(vals[min(idx, len(vals) - 1)])

    def size(self) -> int:
        return sum(len(l) for l in self.levels)


def _sketch_partials_counted(k: int):
    """Per-partition sketch + exact row count in the SAME Arrow pass:
    the caller's separate COUNT(*) job folds into the sketch build
    (r11 — the count is a by-product of a pass we already pay for)."""

    def run(batches):
        import pandas as pd

        sk = KLLSketch(k)
        n = 0
        for pdf in batches:
            col = pdf.iloc[:, 0]
            n += len(col)  # row count BEFORE the NaN drop == COUNT(*)
            sk.update_many(col[col.notna()].to_numpy(dtype=np.float64))
        yield pd.DataFrame(
            {
                "levels": [[list(map(float, l)) for l in sk.levels]],
                "n": [n],
            }
        )

    return run


def _sketch_partials(k: int):
    def run(batches):
        import pandas as pd

        sk = KLLSketch(k)
        for pdf in batches:
            col = pdf.iloc[:, 0]
            sk.update_many(col[col.notna()].to_numpy(dtype=np.float64))
        yield pd.DataFrame(
            {"levels": [[list(map(float, l)) for l in sk.levels]]}
        )

    return run


def kll_build(df: DataFrame, col: str, k: int = 200) -> KLLSketch:
    """One Arrow-batched pass; per-partition sketches merge on the
    driver (P x O(k log n) floats of traffic, no shuffle)."""
    rows = (
        df.select(F.col(col).cast("double"))
        .mapInPandas(_sketch_partials(k), "levels array<array<double>>")
        .collect()
    )
    merged = KLLSketch(k)
    for r in rows:
        part = KLLSketch(k)
        part.levels = [list(l) for l in r["levels"]] or [[]]
        merged.merge(part)
    return merged


def kll_exact_quantiles(
    df: DataFrame,
    col: str,
    phis: list[float],
    k: int = 200,
    delta: float = 0.05,
    buckets: int = 1024,
    collect_limit: int = 100_000,
) -> list[tuple[float, float]]:
    """EXACT lower quantiles (value at 1-indexed rank ceil(phi*n), the
    quantile_disc convention), located through the sketch. NULLs are
    excluded, like SQL aggregates."""
    for phi in phis:
        if not 0.0 < phi <= 1.0:
            raise ValueError(f"phi must be in (0, 1], got {phi}")
    vals = df.select(F.col(col).cast("double").alias("v")).filter(
        F.col("v").isNotNull()
    )
    # ONE Arrow pass builds the sketch AND the exact count (r11: the
    # separate COUNT(*) job folded into the pass already being paid)
    rows = vals.mapInPandas(
        _sketch_partials_counted(k), "levels array<array<double>>, n long"
    ).collect()
    sk = KLLSketch(k)
    n = 0
    for r in rows:
        part = KLLSketch(k)
        part.levels = [list(l) for l in r["levels"]] or [[]]
        sk.merge(part)
        n += int(r["n"])
    if n == 0:
        raise ValueError(f"no non-null values in column {col!r}")
    targets = []  # (phi, rank, lo, hi)
    for phi in phis:
        targets.append(
            (
                phi,
                math.ceil(phi * n),
                sk.quantile(max(0.0, phi - delta)),
                sk.quantile(min(1.0, phi + delta)),
            )
        )
    # ONE aggregation verifies every band (below/inside per phi) — the
    # per-phi band-count jobs shared a full scan each; the conditional
    # sums share one
    aggs = []
    for i, (_, _, lo, hi) in enumerate(targets):
        aggs.append(F.sum((F.col("v") < F.lit(lo)).cast("long")).alias(f"b{i}"))
        aggs.append(
            F.sum(
                ((F.col("v") >= F.lit(lo)) & (F.col("v") <= F.lit(hi))).cast(
                    "long"
                )
            ).alias(f"i{i}")
        )
    row = vals.agg(*aggs).first()
    counts = [
        (int(row[f"b{i}"] or 0), int(row[f"i{i}"] or 0))
        for i in range(len(targets))
    ]
    # bands that verified AND are small enough resolve from ONE batched
    # tagged collect; the rest (sketch miss, oversized band) fall back to
    # the per-phi refinement loop with their counts already in hand
    easy = [
        i
        for i, ((_, r, _, _), (below, inside)) in enumerate(
            zip(targets, counts)
        )
        if below < r <= below + inside and inside <= collect_limit
    ]
    by_band: dict[int, np.ndarray] = {}
    if easy:
        tags = F.array_compact(
            F.array(
                *[
                    F.when(
                        (F.col("v") >= F.lit(targets[i][2]))
                        & (F.col("v") <= F.lit(targets[i][3])),
                        F.lit(i),
                    )
                    for i in easy
                ]
            )
        )
        tagged = (
            vals.select(F.explode(tags).alias("i"), "v")
            .collect()
        )
        grouped: dict[int, list[float]] = {i: [] for i in easy}
        for rec in tagged:
            grouped[rec["i"]].append(rec["v"])
        by_band = {i: np.sort(np.asarray(g)) for i, g in grouped.items()}
    out = []
    for i, ((phi, r, lo, hi), (below, inside)) in enumerate(
        zip(targets, counts)
    ):
        if i in by_band:
            out.append((phi, float(by_band[i][r - below - 1])))
        else:
            out.append(
                (
                    phi,
                    _exact_rank_in_band(
                        vals,
                        r,
                        lo,
                        hi,
                        buckets,
                        collect_limit,
                        precounted=(below, inside),
                    ),
                )
            )
    return out


def _exact_rank_in_band(
    vals: DataFrame, r: int, lo: float, hi: float,
    buckets: int, collect_limit: int,
    precounted: tuple[int, int] | None = None,
) -> float:
    """Value at global rank r, given a candidate band [lo, hi]; verifies
    the band and falls back to the full range if the sketch missed.
    ``precounted`` = (below, inside) when the caller already verified
    the band in its batched aggregation (skips one scan)."""
    below, inside = (
        precounted if precounted is not None else _band_counts(vals, lo, hi)
    )
    if not below < r <= below + inside:
        # sketch band missed the rank (delta too tight for k) -- exact
        # fallback, still never a global sort
        mm = vals.agg(F.min("v"), F.max("v")).first()
        lo, hi = float(mm[0]), float(mm[1])
        below, inside = _band_counts(vals, lo, hi)
    j = r - below  # j-th smallest inside [lo, hi]
    for _ in range(64):
        if lo == hi:
            return lo
        if inside <= collect_limit:
            band = np.sort(
                np.fromiter(
                    (
                        row["v"]
                        for row in vals.filter(
                            (F.col("v") >= lo) & (F.col("v") <= hi)
                        ).collect()
                    ),
                    dtype=np.float64,
                )
            )
            return float(band[j - 1])
        width = (hi - lo) / buckets
        if width <= 0.0 or not math.isfinite(width):
            break  # value-range underflow: adjacent doubles; exact tail below
        bucket = F.least(
            F.lit(buckets - 1),
            F.floor((F.col("v") - F.lit(lo)) / F.lit(width)).cast("int"),
        )
        counts = dict(
            vals.filter((F.col("v") >= lo) & (F.col("v") <= hi))
            .groupBy(bucket.alias("b"))
            .count()
            .collect()
        )
        cum = 0
        for b in range(buckets):
            c = counts.get(b, 0)
            if cum + c >= j:
                j -= cum
                new_lo, new_hi = lo + b * width, min(hi, lo + (b + 1) * width)
                if c == inside and new_lo <= lo and new_hi >= hi:
                    break  # no shrink possible: identical values dominate
                lo, hi, inside = new_lo, new_hi, c
                break
            cum += c
    # terminal: value-range underflow or refinement stall — the band
    # spans at most a few DISTINCT doubles however many rows repeat
    # them, so exact per-value counts resolve the rank locally
    vc = sorted(
        vals.filter((F.col("v") >= lo) & (F.col("v") <= hi))
        .groupBy("v")
        .count()
        .collect()
    )
    cum = 0
    for v, c in vc:
        if cum + c >= j:
            return float(v)
        cum += c
    raise AssertionError("band lost the target rank — counting bug")


def _band_counts(vals: DataFrame, lo: float, hi: float) -> tuple[int, int]:
    row = vals.agg(
        F.sum((F.col("v") < lo).cast("long")).alias("below"),
        F.sum(((F.col("v") >= lo) & (F.col("v") <= hi)).cast("long")).alias(
            "inside"
        ),
    ).first()
    return int(row["below"] or 0), int(row["inside"] or 0)
