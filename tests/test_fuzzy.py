"""Deletion-variant fuzzy join (operators/fuzzy.py)."""

from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.fuzzy import (
    deletion_variants,
    fuzzy_join_ed1,
)


def _ed(a, b):
    # reference Levenshtein
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]


def test_variants_cover_and_count(spark):
    df = spark.createDataFrame([(1, "abc")], "id long, s string")
    got = {r["_variant"] for r in deletion_variants(df, "id", "s").collect()}
    assert got == {"abc", "bc", "ac", "ab"}


def test_ed1_join_complete_vs_bruteforce(spark):
    words = [
        "kettle", "ketle", "kettles", "kittle", "battle", "bottle",
        "bottles", "cat", "cut", "ct", "cart", "", "a", "b",
    ]
    rows = list(enumerate(words))
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r["a_id"], r["b_id"], r["dist"])
        for r in fuzzy_join_ed1(df, "id", "s").collect()
    }
    exp = {
        (i, j, _ed(a, b))
        for i, a in rows
        for j, b in rows
        if i < j and _ed(a, b) <= 1
    }
    assert got == exp, f"missing={exp - got} extra={got - exp}"
