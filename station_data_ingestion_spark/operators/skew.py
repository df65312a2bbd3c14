"""Skew mitigation: salted joins for pathologically hot keys.

AQE's skew-join handling (spark.sql.adaptive.skewJoin, on by default in
session.py) splits oversized sort-merge partitions at runtime and is the
first line of defense. Salting is the explicit fallback for cases AQE
cannot fix: broadcast-ineligible small sides, hot keys inside aggregating
joins, or engines/configs without AQE. The operator keeps the exact join
semantics while spreading each hot key over `n_salt` shuffle partitions:

- big side: one deterministic salt per row, derived by hashing a set of
  high-cardinality columns (NOT rand(): task retries must reproduce the
  same salt or shuffle retries produce duplicates/losses)
- small side: replicated n_salt times via explode(sequence(...))

The cost model: small side grows n_salt-fold (it must stay small); the
big side's hottest key now occupies n_salt partitions instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salt: int,
    big_unique_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big` with `small` on `on`, salted across n_salt buckets.

    `big_unique_cols`: columns of the big side whose hash spreads rows
    uniformly (e.g. the fact table's primary key). Output columns match
    a plain ``big.join(small, on, how)``.

    Only big-side-preserving joins are supported: the small side is
    replicated n_salt times, so right/full outer would emit every
    unmatched small row n_salt times.
    """
    if not big_unique_cols:
        raise ValueError("big_unique_cols must name at least one column")
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports big-side-preserving joins only, not {how!r}"
        )
    salted_big = big.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in big_unique_cols]), F.lit(n_salt))
    )
    salted_small = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn(_SALT, F.col(_SALT).cast(salted_big.schema[_SALT].dataType))
    return salted_big.join(salted_small, on=[*on, _SALT], how=how).drop(_SALT)
