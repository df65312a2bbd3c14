"""Fuzzy string similarity join (edit distance <= 1) with
deletion-variant blocking.

The naive fuzzy join is the all-pairs cross join with a levenshtein
filter — quadratic, dead at scale. The SymSpell/FastSS observation
makes it a bucketed equi-join: two strings within edit distance 1
(substitution, insertion or deletion of one character) MUST share at
least one "deletion variant" — the string itself or the string with
one character deleted. So: expand each input row into its L+1 variants
(a narrow generator, no shuffle), equi-join on the variant (candidates
shuffle on the variant hash, exactly like shingle-blocked Jaccard in
llm_dedup.py — buckets stay small because variants keep every
non-deleted character), then rerank the DISTINCT candidate pairs with
the exact levenshtein predicate. The expensive exact metric runs on
candidates only; completeness is exact, not probabilistic (unlike LSH:
the deletion-variant cover is a theorem, not a recall target).

All stages are JVM built-ins (sequence/posexplode/substring/
levenshtein) — no Python in the path.

[reference: none — engine surface in the fuzzy-dedup family next to
llm_dedup.py's MinHash/Jaccard operators]
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants(
    df: DataFrame, id_col: str, str_col: str
) -> DataFrame:
    """(id, s, variant): the string itself plus every delete-one-char
    form. L+1 output rows per input row — linear expansion, same scale
    class as shingling."""
    with_pos = df.select(
        F.col(id_col).alias("_id"),
        F.col(str_col).alias("_s"),
        F.posexplode(F.sequence(F.lit(0), F.length(str_col))).alias(
            "_i", "_del"
        ),
    )
    # _del == 0 -> the original string; _del == i -> drop character i
    variant = F.when(F.col("_del") == 0, F.col("_s")).otherwise(
        F.concat(
            F.expr("substring(_s, 1, _del - 1)"),
            F.expr("substring(_s, _del + 1)"),
        )
    )
    return with_pos.select("_id", "_s", variant.alias("_variant"))


def fuzzy_join_ed1(df: DataFrame, id_col: str, str_col: str) -> DataFrame:
    """All pairs (a_id < b_id) of rows whose strings are within edit
    distance 1, with the exact distance. Complete by the
    deletion-variant cover; candidate generation is one equi-join on
    the variant, the levenshtein rerank touches candidates only."""
    v = deletion_variants(df, id_col, str_col)
    a = v.select(
        F.col("_id").alias("a_id"),
        F.col("_s").alias("a_s"),
        "_variant",
    )
    b = v.select(
        F.col("_id").alias("b_id"),
        F.col("_s").alias("b_s"),
        "_variant",
    )
    cand = (
        a.join(b, "_variant")
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_s", "b_s")
        .distinct()
    )
    return cand.select(
        "a_id",
        "b_id",
        F.levenshtein("a_s", "b_s").alias("dist"),
    ).where(F.col("dist") <= 1)
