"""User-extensible function surface (SURVEY §2.8): UDTF + grouped UDAF.

The reference hard-codes every transform; the engine instead exposes the
full Spark extension surface. These registry entries prove the two
shapes that go beyond scalar pandas_udf (already exercised throughout
the LLM-pipeline modules):

- a Python UDTF used as a LATERAL table function (one input row ->
  many output rows with its own schema);
- a pandas grouped-aggregate UDAF (whole-group vector -> scalar).

Both are the slow path relative to built-ins and are used here only
where user logic genuinely needs the hook; at scale the same mechanics
hold (UDTFs stream rows per partition, grouped UDAFs receive one
Arrow-backed series per group after a hash shuffle on the key).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from station_data_ingestion_spark.queries.registry import load, query


@udtf(returnType="sent_idx int, n_chars int, n_tokens int")
class _SentenceStats:
    """Split a document on '. ' and emit per-sentence stats.

    Plain separator split (not a regex) so the DuckDB oracle's
    string_split is character-identical.
    """

    def eval(self, text: str):
        for i, sent in enumerate((text or "").split(". ")):
            yield i, len(sent), len(sent.split(" "))


@query(
    "udtf_sentence_stats",
    """
WITH s AS (SELECT doc_id, string_split(text, '. ') AS l FROM documents)
SELECT doc_id,
       CAST(i AS INT) AS sent_idx,
       CAST(len(l[i + 1]) AS INT) AS n_chars,
       CAST(len(string_split(l[i + 1], ' ')) AS INT) AS n_tokens
FROM s, UNNEST(range(len(l))) AS t(i)
""",
)
def udtf_sentence_stats(spark, sf_dir):
    """Python UDTF as a lateral table function: documents explode into
    one row per sentence with computed stats."""
    load(spark, sf_dir, "documents")["documents"].createOrReplaceTempView(
        "udtf_docs"
    )
    spark.udtf.register("sentence_stats", _SentenceStats)
    return spark.sql(
        "SELECT d.doc_id, s.sent_idx, s.n_chars, s.n_tokens "
        "FROM udtf_docs d, LATERAL sentence_stats(d.text) s"
    )


def _group_udafs():
    # built inside the query fn: @pandas_udf parses its DDL return type
    # eagerly and the registry imports before any SparkSession exists.
    # Spark disallows mixing pandas and built-in aggregates in one agg(),
    # so the count is a pandas UDAF too.
    @pandas_udf("double")
    def median(v: pd.Series) -> float:
        return float(v.median())

    @pandas_udf("long")
    def group_size(v: pd.Series) -> int:
        return int(len(v))

    return median, group_size


@query(
    "udaf_median_order_value",
    """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(MEDIAN(o_totalprice), 2) AS median_price
FROM orders GROUP BY o_orderpriority
""",
)
def udaf_median_order_value(spark, sf_dir):
    """pandas grouped-aggregate UDAF: exact median order value per
    priority. Both engines average the two middle float64s for even
    group sizes, so the 2-dp round is engine-identical."""
    o = load(spark, sf_dir, "orders")["orders"]
    median, group_size = _group_udafs()
    return o.groupBy("o_orderpriority").agg(
        group_size("o_totalprice").alias("n_orders"),
        F.round(median("o_totalprice"), 2).alias("median_price"),
    )


@query(
    "udf_pandas_scalar_charstats",
    """
SELECT doc_id,
       CAST(len(list_distinct(string_split_regex(text, ''))) AS INT)
           AS n_distinct_chars,
       CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[aeiou]', '', 'g'))
            AS INT) AS n_vowels
FROM documents WHERE doc_id % 7 = 0
""",
)
def udf_pandas_scalar_charstats(spark, sf_dir):
    """The third user-extension point next to the UDTF and grouped UDAF:
    a VECTORIZED SCALAR pandas_udf (Arrow batches in, one output column
    out — never row-at-a-time). Integer outputs keep the oracle
    engine-exact; the batch shape (pd.Series -> pd.Series) is the 100 TB
    contract."""
    import pandas as pd  # noqa: F811 -- executor-side import

    @pandas_udf("int")
    def distinct_chars(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: len(set(t)))

    @pandas_udf("int")
    def vowels(texts: pd.Series) -> pd.Series:
        return texts.str.count("[aeiou]").astype("int32")

    d = load(spark, sf_dir, "documents")["documents"]
    return d.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id",
        distinct_chars("text").alias("n_distinct_chars"),
        vowels("text").alias("n_vowels"),
    )


@query(
    "udtf_polymorphic_top_tokens",
    """
WITH tok AS (
  SELECT doc_id, t.w
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       UNNEST(l) AS t(w)
), cnt AS (
  SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w
), ranked AS (
  SELECT doc_id, w,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, w ASC)
           AS rn
  FROM cnt
)
SELECT doc_id,
       MAX(CASE WHEN rn = 1 THEN w END) AS token_1,
       MAX(CASE WHEN rn = 2 THEN w END) AS token_2,
       MAX(CASE WHEN rn = 3 THEN w END) AS token_3
FROM ranked GROUP BY doc_id
""",
)
def udtf_polymorphic_top_tokens(spark, sf_dir):
    """POLYMORPHIC Python UDTF (Spark 4 analyze-time schema): the
    output schema is computed by the UDTF's static ``analyze`` from the
    CONSTANT k argument — ``top_tokens(text, 3)`` plans three string
    columns, ``top_tokens(text, 5)`` would plan five, no code change.
    Each document emits its k most frequent tokens (count desc, token
    asc — a total order both engines replay). The oracle is the fixed
    k=3 unrolled rank-pivot. The per-row Counter is bounded by document
    length; the UDTF runs as a LATERAL table function so Catalyst keeps
    the scan and the join in one stage."""
    from pyspark.sql.functions import udtf as _udtf
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class _TopTokens:
        @staticmethod
        def analyze(text: AnalyzeArgument, k: AnalyzeArgument):
            if not isinstance(k.value, int) or k.value < 1:
                raise ValueError("k must be a positive integer literal")
            return AnalyzeResult(
                StructType(
                    [
                        StructField(f"token_{i + 1}", StringType())
                        for i in range(k.value)
                    ]
                )
            )

        def eval(self, text: str, k: int):
            from collections import Counter

            c = Counter((text or "").split(" "))
            top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
            row = [w for w, _n in top]
            row += [None] * (k - len(row))
            yield tuple(row)

    TopTokens = _udtf(_TopTokens)
    load(spark, sf_dir, "documents")["documents"].createOrReplaceTempView(
        "udtf_poly_docs"
    )
    spark.udtf.register("top_tokens", TopTokens)
    return spark.sql(
        "SELECT d.doc_id, s.token_1, s.token_2, s.token_3 "
        "FROM udtf_poly_docs d, LATERAL top_tokens(d.text, 3) s"
    )
