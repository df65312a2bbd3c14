"""Classical-ML text pipelines under the oracle gate: multinomial
naive Bayes and hashing-trick featurization.

Both follow the family's determinism rules: every per-term log is
rounded to integer microbits BEFORE any sum (integer addition is
associative, so the aggregate is bit-identical under any partitioning
and on both engines), and the feature-hashing path is ALL-integer —
md5-derived buckets, signs and weights, exact bigint dot products.

[reference: none — engine surface (training-data pipeline classifiers
from the capability brief); sits beside sim_nearest_centroid_confusion
(discriminative geometric) as the generative counterpart.]
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from station_data_ingestion_spark.queries.registry import load, query

_NB_ORACLE = """
WITH train AS (
  SELECT doc_id, lang, text FROM documents WHERE doc_id % 2 = 0
),
test AS (
  SELECT doc_id, lang, text FROM documents WHERE doc_id % 2 = 1
),
ttok AS (
  SELECT lang, UNNEST(string_split(text, ' ')) AS tok FROM train
),
clt AS (SELECT lang, tok, COUNT(*) AS c FROM ttok GROUP BY 1, 2),
nl AS (SELECT lang, SUM(c) AS n_l FROM clt GROUP BY 1),
vm AS (SELECT COUNT(DISTINCT tok) AS v FROM ttok),
prior AS (
  SELECT lang,
         CAST(ROUND(log2(COUNT(*) * 1.0 /
                         (SELECT COUNT(*) FROM train)) * 1000000)
              AS BIGINT) AS prior_mb,
         CAST(ROUND(log2(1.0 / ((SELECT n_l FROM nl n
                                 WHERE n.lang = t.lang) + (SELECT v FROM vm)))
                    * 1000000) AS BIGINT) AS mb0
  FROM train t GROUP BY lang
),
delta AS (
  SELECT c.lang, c.tok,
         CAST(ROUND(log2((c.c + 1.0) / (n.n_l + (SELECT v FROM vm)))
                    * 1000000) AS BIGINT)
           - p.mb0 AS d_mb
  FROM clt c JOIN nl n ON c.lang = n.lang JOIN prior p ON c.lang = p.lang
),
dtok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM test
),
dcnt AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM dtok GROUP BY 1, 2),
dtot AS (SELECT doc_id, SUM(cnt) AS total FROM dcnt GROUP BY 1),
overlap AS (
  SELECT d.doc_id, x.lang, SUM(d.cnt * x.d_mb) AS extra
  FROM dcnt d JOIN delta x ON d.tok = x.tok
  GROUP BY 1, 2
),
score AS (
  SELECT t.doc_id, te.lang AS true_lang, p.lang AS pred_lang,
         p.prior_mb + t.total * p.mb0 + COALESCE(o.extra, 0) AS s
  FROM dtot t
  JOIN test te ON te.doc_id = t.doc_id
  CROSS JOIN prior p
  LEFT JOIN overlap o ON o.doc_id = t.doc_id AND o.lang = p.lang
),
best AS (
  SELECT true_lang, pred_lang,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY s DESC, pred_lang ASC) AS rn
  FROM score
)
SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM best WHERE rn = 1 GROUP BY 1, 2
"""


@query(
    "ml_naive_bayes_lang_confusion",
    _NB_ORACLE,
    doc="Multinomial naive Bayes (Laplace-smoothed, integer-microbit "
    "log terms) trained on even doc_ids, confusion matrix on odd.",
)
def ml_naive_bayes_lang_confusion(spark, sf_dir):
    """Multinomial naive Bayes language classifier: train on even
    doc_ids (per-class token counts + Laplace smoothing), classify odd
    doc_ids, report the confusion matrix. Every log term — class
    prior, unseen-token floor mb0, and the seen-token delta — is
    rounded to integer MICROBITS before summation (the Kneser-Ney
    pattern), so scores are exact integers and argmax is
    engine-independent; ties break on class name. Plan shape: the
    (lang, token) model table is one map-side-combined aggregation of
    the train split; scoring decomposes as prior + total_tokens*mb0 +
    sum(cnt * delta) so UNSEEN tokens never materialize rows — the
    only join against test tokens is an inner join on the seen vocab
    (broadcastable: |vocab| x |classes|), and the dense doc x class
    grid is a 5-row broadcast cross attach. At 100 TB: vocab tables
    beyond broadcast size shuffle on token instead — same plan
    skeleton, and the model side is the small one by construction."""
    d = load(spark, sf_dir, "documents")["documents"]
    train = d.where(F.col("doc_id") % 2 == 0)
    test = d.where(F.col("doc_id") % 2 == 1)

    from pyspark.sql import Observation

    # n_train (a model metadata scalar, same class as PageRank's node
    # count) rides the clt checkpoint action as an observed metric on
    # the train scan instead of a separate COUNT job
    obs_t = Observation()
    ttok = train.observe(obs_t, F.count(F.lit(1)).alias("nd")).select(
        "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    clt = ttok.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    clt = clt.localCheckpoint(eager=True)  # feeds nl, vocab size, delta
    nl = clt.groupBy("lang").agg(F.sum("c").alias("n_l"))
    n_train = int(obs_t.get["nd"])
    v = clt.select("tok").distinct().count()

    mb = lambda col: F.round(F.log2(col) * 1000000).cast("long")  # noqa: E731
    prior = (
        train.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("nd"))
        .join(nl, "lang")
        .select(
            "lang",
            mb(F.col("nd") * 1.0 / F.lit(n_train)).alias("prior_mb"),
            mb(F.lit(1.0) / (F.col("n_l") + F.lit(v))).alias("mb0"),
            "n_l",
        )
    )
    delta = (
        clt.join(prior, "lang")
        .select(
            "lang",
            "tok",
            (
                mb((F.col("c") + F.lit(1.0)) / (F.col("n_l") + F.lit(v)))
                - F.col("mb0")
            ).alias("d_mb"),
        )
    )

    dcnt = (
        test.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    dtot = dcnt.groupBy("doc_id").agg(F.sum("cnt").alias("total"))
    overlap = (
        dcnt.join(F.broadcast(delta), "tok")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("cnt") * F.col("d_mb")).alias("extra"))
    )
    consts = prior.select("lang", "prior_mb", "mb0")
    ov = overlap.select(
        F.col("doc_id").alias("odoc"), F.col("lang").alias("olang"), "extra"
    )
    score = (
        dtot.join(test.select("doc_id", F.col("lang").alias("true_lang")), "doc_id")
        .crossJoin(F.broadcast(consts))
        .join(
            ov,
            (F.col("doc_id") == F.col("odoc")) & (F.col("lang") == F.col("olang")),
            "left",
        )
        .select(
            "doc_id",
            "true_lang",
            F.col("lang").alias("pred_lang"),
            (
                F.col("prior_mb")
                + F.col("total") * F.col("mb0")
                + F.coalesce(F.col("extra"), F.lit(0))
            ).alias("s"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("s").desc(), F.col("pred_lang").asc()
    )
    return (
        score.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


_FH_BUCKETS = 64

_FH_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
tc AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
hb AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(tok), 1, 8)) AS UBIGINT)
              % {_FH_BUCKETS} AS BIGINT) AS bucket,
         CASE WHEN CAST(('0x' || substr(md5(tok), 9, 1)) AS UBIGINT) < 8
              THEN cnt ELSE -cnt END AS signed_cnt
  FROM tc
),
feat AS (
  SELECT doc_id, bucket, SUM(signed_cnt) AS f
  FROM hb GROUP BY 1, 2
),
wt AS (
  SELECT b AS bucket,
         CAST(CAST(('0x' || substr(md5('w' || b), 1, 8)) AS UBIGINT)
              % 2001 AS BIGINT) - 1000 AS w
  FROM UNNEST(generate_series(0, {_FH_BUCKETS - 1})) AS t(b)
),
score AS (
  SELECT doc_id, CAST(SUM(f * w) AS BIGINT) AS score
  FROM feat JOIN wt USING (bucket) GROUP BY doc_id
)
SELECT doc_id, score FROM score
ORDER BY score DESC, doc_id ASC LIMIT 20
"""


@query(
    "ml_feature_hash_scores",
    _FH_ORACLE,
    doc="Hashing-trick featurization (64 signed md5 buckets) scored "
    "against an md5-derived integer weight vector; exact bigint math.",
)
def ml_feature_hash_scores(spark, sf_dir):
    """Feature hashing (Weinberger et al. 2009): tokens hash into 64
    signed buckets (md5 prefix -> bucket, 9th hex digit -> sign), the
    per-doc sparse feature vector is the signed count sum, and a fixed
    md5-derived integer weight vector scores each doc — the standard
    way to featurize unbounded vocabularies with BOUNDED state. The
    whole pipeline is exact bigint arithmetic (no floats anywhere), so
    the oracle replays it verbatim. Plan: one explode + two map-side-
    combined aggregations; the 64-row weight table broadcasts; top-20
    with doc_id tiebreak gives the total order. At 100 TB the bucket
    count rises (2^18+) with the identical plan — state stays
    buckets-bounded regardless of vocabulary growth."""
    d = load(spark, sf_dir, "documents")["documents"]
    tc = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    u32 = lambda c, a, n: F.conv(F.substring(F.md5(c), a, n), 16, 10).cast(  # noqa: E731
        "long"
    )
    hb = tc.select(
        "doc_id",
        (u32(F.col("tok"), 1, 8) % _FH_BUCKETS).alias("bucket"),
        F.when(u32(F.col("tok"), 9, 1) < 8, F.col("cnt"))
        .otherwise(-F.col("cnt"))
        .alias("signed_cnt"),
    )
    feat = hb.groupBy("doc_id", "bucket").agg(F.sum("signed_cnt").alias("f"))
    wt = spark.range(_FH_BUCKETS).select(
        F.col("id").alias("bucket"),
        (u32(F.concat(F.lit("w"), F.col("id")), 1, 8) % 2001 - 1000).alias("w"),
    )
    return (
        feat.join(F.broadcast(wt), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("f") * F.col("w")).cast("long").alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


_STUMP_FEATS = 4
_Q = 1048576.0  # 2^20 feature quantization

_STUMP_ORACLE = f"""
WITH pts AS (
  SELECT f, CAST(ROUND(emb[f + 1] * {_Q}) AS BIGINT) AS q,
         CAST(label % 2 AS BIGINT) AS y
  FROM (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
               label
        FROM embeddings),
       UNNEST(generate_series(0, {_STUMP_FEATS - 1})) AS t(f)
),
cells AS (
  SELECT f, q, COUNT(*) AS cnt, SUM(y) AS pos FROM pts GROUP BY 1, 2
),
tot AS (SELECT f, SUM(cnt) AS n, SUM(pos) AS p FROM cells GROUP BY 1),
cum AS (
  SELECT f, q,
         SUM(cnt) OVER (PARTITION BY f ORDER BY q) AS nl,
         SUM(pos) OVER (PARTITION BY f ORDER BY q) AS pl
  FROM cells
),
cand AS (
  SELECT c.f, c.q, c.nl, c.pl, t.n - c.nl AS nr, t.p - c.pl AS pr, t.n
  FROM cum c JOIN tot t ON c.f = t.f
  WHERE c.nl < t.n
),
scored AS (
  SELECT f, q, nl, nr, pl, pr,
         ROUND((CAST(pl * pl + (nl - pl) * (nl - pl) AS DOUBLE) / nl
                + CAST(pr * pr + (nr - pr) * (nr - pr) AS DOUBLE) / nr)
               / n, 9) AS purity
  FROM cand
)
SELECT CAST(f AS BIGINT) AS feature, q AS threshold_micro,
       CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
       CAST(pl AS BIGINT) AS pos_left, CAST(pr AS BIGINT) AS pos_right,
       purity
FROM scored
ORDER BY purity DESC, feature ASC, threshold_micro ASC LIMIT 1
"""


@query(
    "ml_decision_stump_gini",
    _STUMP_ORACLE,
    doc="Best 1-level decision-tree split over 4 embedding dims: "
    "prefix-sum class counts per sorted feature value, exact-integer "
    "Gini argmin.",
)
def ml_decision_stump_gini(spark, sf_dir):
    """Decision-stump fitting — the split-finding primitive under
    every distributed tree ensemble (XGBoost/LightGBM histogram
    builders): for each candidate feature, sort its quantized values,
    prefix-sum the class counts with ONE partitioned window, and score
    every boundary's weighted Gini in a single expression. All counts
    are exact integers; the only double is the final purity score
    (sum of per-side squared-count ratios — monotone inverse of
    weighted Gini: gini = 1 - purity), rounded to 9dp with
    (feature, threshold) tiebreak, so both engines pick the same
    argmax. Plan: explode 4 dims -> value-cell aggregation (map-side
    combined) -> per-feature cumulative window -> global top-1 (a
    takeOrdered over the cell table, which is |distinct values| x
    |features| — data-bounded, never row-bounded). At 100 TB the cell
    table is what histogram-based tree learners materialize; binning
    the quantization coarser caps it at bins x features."""
    e = load(spark, sf_dir, "embeddings")["embeddings"]
    pts = e.select(
        F.posexplode(F.slice(F.col("embedding"), 1, _STUMP_FEATS)).alias(
            "f", "x"
        ),
        (F.col("label") % 2).cast("long").alias("y"),
    ).select(
        "f",
        F.round(F.col("x").cast("double") * _Q).cast("long").alias("q"),
        "y",
    )
    cells = pts.groupBy("f", "q").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos")
    )
    w = (
        Window.partitionBy("f")
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cells.select(
        "f",
        "q",
        F.sum("cnt").over(w).alias("nl"),
        F.sum("pos").over(w).alias("pl"),
    )
    tot = cells.groupBy("f").agg(
        F.sum("cnt").alias("n"), F.sum("pos").alias("p")
    )
    cand = (
        cum.join(F.broadcast(tot), "f")
        .withColumn("nr", F.col("n") - F.col("nl"))
        .withColumn("pr", F.col("p") - F.col("pl"))
        .where(F.col("nl") < F.col("n"))
    )
    purity = F.round(
        (
            (
                F.col("pl") * F.col("pl")
                + (F.col("nl") - F.col("pl")) * (F.col("nl") - F.col("pl"))
            ).cast("double")
            / F.col("nl")
            + (
                F.col("pr") * F.col("pr")
                + (F.col("nr") - F.col("pr")) * (F.col("nr") - F.col("pr"))
            ).cast("double")
            / F.col("nr")
        )
        / F.col("n"),
        9,
    )
    return (
        cand.select(
            F.col("f").cast("long").alias("feature"),
            F.col("q").alias("threshold_micro"),
            F.col("nl").cast("long").alias("n_left"),
            F.col("nr").cast("long").alias("n_right"),
            F.col("pl").cast("long").alias("pos_left"),
            F.col("pr").cast("long").alias("pos_right"),
            purity.alias("purity"),
        )
        .orderBy(
            F.col("purity").desc(),
            F.col("feature").asc(),
            F.col("threshold_micro").asc(),
        )
        .limit(1)
    )


_ALS_LAM_MICRO = 100000  # lambda = 0.1 in (milli^2 = 1e-6) factor units

_ALS_ORACLE = f"""
WITH r AS (
  SELECT o_custkey AS u, l_partkey AS i,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS rt
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
yf AS (
  SELECT i,
         CAST(CAST(('0x' || substr(md5('f1_' || i), 1, 8)) AS UBIGINT)
              % 2001 AS BIGINT) - 1000 AS y1m,
         CAST(CAST(('0x' || substr(md5('f2_' || i), 1, 8)) AS UBIGINT)
              % 2001 AS BIGINT) - 1000 AS y2m
  FROM (SELECT DISTINCT i FROM r)
),
ne AS (
  SELECT r.u,
         CAST(COUNT(*) AS BIGINT) AS n_items,
         SUM(y1m * y1m) AS a11, SUM(y1m * y2m) AS a12,
         SUM(y2m * y2m) AS a22,
         SUM(rt * y1m) AS b1, SUM(rt * y2m) AS b2
  FROM r JOIN yf ON r.i = yf.i GROUP BY r.u
),
sv AS (
  SELECT u, n_items,
         (a11 + {_ALS_LAM_MICRO}) * (a22 + {_ALS_LAM_MICRO}) - a12 * a12
           AS det,
         (a22 + {_ALS_LAM_MICRO}) * b1 - a12 * b2 AS n1,
         (a11 + {_ALS_LAM_MICRO}) * b2 - a12 * b1 AS n2
  FROM ne
)
SELECT u AS custkey, n_items,
       ROUND(CAST(n1 AS DOUBLE) / det * 1000.0, 6) AS u1,
       ROUND(CAST(n2 AS DOUBLE) / det * 1000.0, 6) AS u2
FROM sv
ORDER BY ROUND(CAST(n1 AS DOUBLE) / det * 1000.0, 6) DESC, custkey ASC
LIMIT 20
"""


@query(
    "ml_als_user_factors_k2",
    _ALS_ORACLE,
    doc="One ALS half-step (k=2): per-user ridge solve against "
    "md5-seeded item factors — exact-integer normal equations, "
    "closed-form 2x2 inverse.",
)
def ml_als_user_factors_k2(spark, sf_dir):
    """One half-step of Alternating Least Squares (the matrix-
    factorization recommender primitive): item factors are fixed
    (deterministic md5-seeded milli-integers — the 'previous
    iteration'), and each user's factor vector solves the k=2 ridge
    normal equations (Y'Y + lambda I) u = Y'r in closed form. The
    accumulation phase — A's three distinct entries and b's two —
    is one exact-integer aggregation over the rating rows (map-side
    combined, shuffled once on user), and the 2x2 solve is a fixed
    per-row expression: numerators and determinant stay exact bigints,
    the single final division is the only double (rounded 6dp,
    custkey tiebreak). This IS how distributed ALS scales: per-entity
    k x k sufficient statistics via aggregation, tiny dense solve per
    row — never a materialized user x item matrix. k beyond closed
    form moves the solve into an Arrow-batched numpy stage (the
    linreg/PCA pattern); the aggregation shape is unchanged."""
    t = load(spark, sf_dir, "orders", "lineitem")
    r = (
        t["lineitem"]
        .select("l_orderkey", "l_partkey", "l_quantity")
        .join(
            t["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i")
        )
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("rt"))
    )
    h = lambda pre: (  # noqa: E731
        F.conv(
            F.substring(F.md5(F.concat(F.lit(pre), F.col("i").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 2001
        - 1000
    )
    yf = r.select("i").distinct().select(
        "i", h("f1_").alias("y1m"), h("f2_").alias("y2m")
    )
    ne = (
        r.join(yf, "i")
        .groupBy("u")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.col("y1m") * F.col("y1m")).alias("a11"),
            F.sum(F.col("y1m") * F.col("y2m")).alias("a12"),
            F.sum(F.col("y2m") * F.col("y2m")).alias("a22"),
            F.sum(F.col("rt") * F.col("y1m")).alias("b1"),
            F.sum(F.col("rt") * F.col("y2m")).alias("b2"),
        )
    )
    lam = F.lit(_ALS_LAM_MICRO)
    sv = ne.select(
        "u",
        "n_items",
        ((F.col("a11") + lam) * (F.col("a22") + lam) - F.col("a12") * F.col("a12")).alias("det"),
        ((F.col("a22") + lam) * F.col("b1") - F.col("a12") * F.col("b2")).alias("n1"),
        ((F.col("a11") + lam) * F.col("b2") - F.col("a12") * F.col("b1")).alias("n2"),
    )
    u1 = F.round(F.col("n1").cast("double") / F.col("det") * 1000.0, 6)
    u2 = F.round(F.col("n2").cast("double") / F.col("det") * 1000.0, 6)
    return (
        sv.select(
            F.col("u").alias("custkey"),
            "n_items",
            u1.alias("u1"),
            u2.alias("u2"),
        )
        .orderBy(F.col("u1").desc(), F.col("custkey").asc())
        .limit(20)
    )


_CV_FOLDS = 5

_CV_ORACLE = f"""
WITH pts AS (
  SELECT vec_id % {_CV_FOLDS} AS fold, f,
         CAST(ROUND(emb[f + 1] * {_Q}) AS BIGINT) AS q,
         CAST(label % 2 AS BIGINT) AS y
  FROM (SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
               label
        FROM embeddings),
       UNNEST(generate_series(0, {_STUMP_FEATS - 1})) AS t(f)
),
cells_all AS (
  SELECT f, q, COUNT(*) AS cnt, SUM(y) AS pos FROM pts GROUP BY 1, 2
),
cells_fold AS (
  SELECT fold, f, q, COUNT(*) AS cnt, SUM(y) AS pos FROM pts GROUP BY 1, 2, 3
),
train_cells AS (
  SELECT k.fold, a.f, a.q,
         a.cnt - COALESCE(cf.cnt, 0) AS cnt,
         a.pos - COALESCE(cf.pos, 0) AS pos
  FROM cells_all a
  CROSS JOIN (SELECT UNNEST(range({_CV_FOLDS})) AS fold) k
  LEFT JOIN cells_fold cf
    ON cf.fold = k.fold AND cf.f = a.f AND cf.q = a.q
  WHERE a.cnt - COALESCE(cf.cnt, 0) > 0
),
tot AS (
  SELECT fold, f, SUM(cnt) AS n, SUM(pos) AS p FROM train_cells GROUP BY 1, 2
),
cum AS (
  SELECT fold, f, q,
         SUM(cnt) OVER (PARTITION BY fold, f ORDER BY q) AS nl,
         SUM(pos) OVER (PARTITION BY fold, f ORDER BY q) AS pl
  FROM train_cells
),
cand AS (
  SELECT c.fold, c.f, c.q, c.nl, c.pl,
         t.n - c.nl AS nr, t.p - c.pl AS pr, t.n
  FROM cum c JOIN tot t ON c.fold = t.fold AND c.f = t.f
  WHERE c.nl < t.n
),
scored AS (
  SELECT fold, f, q, nl, nr, pl, pr,
         ROUND((CAST(pl * pl + (nl - pl) * (nl - pl) AS DOUBLE) / nl
                + CAST(pr * pr + (nr - pr) * (nr - pr) AS DOUBLE) / nr)
               / n, 9) AS purity
  FROM cand
),
best AS (
  SELECT fold, f, q,
         CASE WHEN 2 * pl > nl THEN 1 ELSE 0 END AS pred_left,
         CASE WHEN 2 * pr > nr THEN 1 ELSE 0 END AS pred_right
  FROM scored
  QUALIFY ROW_NUMBER() OVER (PARTITION BY fold
                             ORDER BY purity DESC, f ASC, q ASC) = 1
),
eval AS (
  SELECT p.fold,
         CASE WHEN (p.q <= b.q AND p.y = b.pred_left)
                OR (p.q > b.q AND p.y = b.pred_right)
              THEN 1 ELSE 0 END AS correct
  FROM pts p JOIN best b ON p.fold = b.fold AND p.f = b.f
)
SELECT e.fold AS fold,
       CAST(b.f AS BIGINT) AS feature, b.q AS threshold_micro,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(e.correct) AS BIGINT) AS n_correct,
       ROUND(SUM(e.correct) * 1.0 / COUNT(*), 6) AS accuracy
FROM eval e JOIN best b ON e.fold = b.fold
GROUP BY e.fold, b.f, b.q
"""


@query(
    "ml_cv_stump_accuracy",
    _CV_ORACLE,
    doc="5-fold cross-validated decision stump: per-fold training "
    "histograms by INCLUSION-EXCLUSION (all-minus-fold), held-out "
    "accuracy per fold.",
)
def ml_cv_stump_accuracy(spark, sf_dir):
    """K-FOLD CROSS-VALIDATION as a first-class distributed op,
    applied to the decision stump: fold-k training counts are derived
    by INCLUSION-EXCLUSION (global histogram minus fold-k's histogram)
    — the data is scanned ONCE for all folds instead of once per fold,
    which is the trick that makes distributed CV affordable (the naive
    per-fold rescan is k scans). Each fold's best split (same
    exact-integer Gini argmax as ml_decision_stump_gini, zero-count
    cells excluded from both engines' candidate sets) then scores its
    own held-out rows with majority-class leaves; accuracy is the only
    final double. State: cells x folds, data-bounded like every
    histogram tree learner."""
    e = load(spark, sf_dir, "embeddings")["embeddings"]
    pts = e.select(
        (F.col("vec_id") % _CV_FOLDS).alias("fold"),
        F.posexplode(F.slice(F.col("embedding"), 1, _STUMP_FEATS)).alias(
            "f", "x"
        ),
        (F.col("label") % 2).cast("long").alias("y"),
    ).select(
        "fold",
        "f",
        F.round(F.col("x").cast("double") * _Q).cast("long").alias("q"),
        "y",
    )
    pts = pts.localCheckpoint(eager=True)  # feeds cells + eval
    cells_all = pts.groupBy("f", "q").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos")
    )
    cells_fold = pts.groupBy("fold", "f", "q").agg(
        F.count(F.lit(1)).alias("cnt_f"), F.sum("y").alias("pos_f")
    )
    folds = spark.range(_CV_FOLDS).select(F.col("id").alias("fold"))
    train = (
        cells_all.crossJoin(F.broadcast(folds))
        .join(cells_fold, ["fold", "f", "q"], "left")
        .select(
            "fold",
            "f",
            "q",
            (F.col("cnt") - F.coalesce(F.col("cnt_f"), F.lit(0))).alias("cnt"),
            (F.col("pos") - F.coalesce(F.col("pos_f"), F.lit(0))).alias("pos"),
        )
        .where(F.col("cnt") > 0)
    )
    tot = train.groupBy("fold", "f").agg(
        F.sum("cnt").alias("n"), F.sum("pos").alias("p")
    )
    w = (
        Window.partitionBy("fold", "f")
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = train.select(
        "fold",
        "f",
        "q",
        F.sum("cnt").over(w).alias("nl"),
        F.sum("pos").over(w).alias("pl"),
    )
    cand = (
        cum.join(tot, ["fold", "f"])
        .withColumn("nr", F.col("n") - F.col("nl"))
        .withColumn("pr", F.col("p") - F.col("pl"))
        .where(F.col("nl") < F.col("n"))
    )
    purity = F.round(
        (
            (
                F.col("pl") * F.col("pl")
                + (F.col("nl") - F.col("pl")) * (F.col("nl") - F.col("pl"))
            ).cast("double")
            / F.col("nl")
            + (
                F.col("pr") * F.col("pr")
                + (F.col("nr") - F.col("pr")) * (F.col("nr") - F.col("pr"))
            ).cast("double")
            / F.col("nr")
        )
        / F.col("n"),
        9,
    )
    wb = Window.partitionBy("fold").orderBy(
        F.col("purity").desc(), F.col("f").asc(), F.col("q").asc()
    )
    best = (
        cand.withColumn("purity", purity)
        .withColumn("rn", F.row_number().over(wb))
        .where(F.col("rn") == 1)
        .select(
            "fold",
            F.col("f").alias("bf"),
            F.col("q").alias("bq"),
            F.when(2 * F.col("pl") > F.col("nl"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("pred_left"),
            F.when(2 * F.col("pr") > F.col("nr"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("pred_right"),
        )
    )
    ev = pts.join(
        F.broadcast(best),
        (pts["fold"] == best["fold"]) & (pts["f"] == F.col("bf")),
    ).select(
        pts["fold"].alias("fold"),
        "bf",
        "bq",
        F.when(
            ((F.col("q") <= F.col("bq")) & (F.col("y") == F.col("pred_left")))
            | ((F.col("q") > F.col("bq")) & (F.col("y") == F.col("pred_right"))),
            1,
        )
        .otherwise(0)
        .alias("correct"),
    )
    return ev.groupBy("fold", "bf", "bq").agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum("correct").cast("long").alias("n_correct"),
        F.round(F.sum("correct") * 1.0 / F.count(F.lit(1)), 6).alias(
            "accuracy"
        ),
    ).select(
        "fold",
        F.col("bf").cast("long").alias("feature"),
        F.col("bq").alias("threshold_micro"),
        "n_test",
        "n_correct",
        "accuracy",
    )


_AUC_ORACLE = f"""
WITH pts AS (
  SELECT CAST(ROUND(emb[1] * {_Q}) AS BIGINT) AS s,
         CAST(label % 2 AS BIGINT) AS y
  FROM (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
               label
        FROM embeddings)
),
cells AS (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(y) AS BIGINT) AS pos
  FROM pts GROUP BY s
),
cum AS (
  SELECT s, cnt, pos, SUM(cnt) OVER (ORDER BY s) AS cum_n FROM cells
),
tot AS (
  SELECT CAST(SUM(pos) AS BIGINT) AS n1,
         CAST(SUM(cnt) - SUM(pos) AS BIGINT) AS n0
  FROM cells
),
r AS (
  SELECT CAST(SUM(pos * (2 * (cum_n - cnt) + cnt + 1)) AS BIGINT) AS r2
  FROM cum
)
SELECT t.n1, t.n0,
       CAST(r.r2 - t.n1 * (t.n1 + 1) AS BIGINT) AS auc_num,
       ROUND(CAST(r.r2 - t.n1 * (t.n1 + 1) AS DOUBLE)
             / (2.0 * t.n1 * t.n0), 6) AS auc
FROM r, tot t
"""


@query(
    "ml_roc_auc_exact",
    _AUC_ORACLE,
    doc="Exact tie-corrected ROC AUC via the rank-sum identity "
    "AUC = (R1 - n1(n1+1)/2)/(n1*n0), doubled ranks keep it integer.",
)
def ml_roc_auc_exact(spark, sf_dir):
    """Exact ROC AUC — the standard classifier-quality number —
    computed by the rank-sum identity (AUC is the Mann-Whitney U
    statistic normalized): scores collapse to a value histogram, the
    tie-corrected average rank of each distinct score is
    (2*below + count + 1)/2, and doubling clears the fraction so the
    whole numerator stays an exact integer. The cumulative count comes
    from the distributed two-phase prefix scan
    (operators/prefix_sum.py) — NO global window touches the
    histogram, so the plan survives a score column with billions of
    distinct values. The only double is the final normalization.
    Scorer under test: embedding dim 0 against label parity (any score
    column slots in)."""
    from station_data_ingestion_spark.operators.prefix_sum import (
        ordered_prefix_sum,
    )

    e = load(spark, sf_dir, "embeddings")["embeddings"]
    pts = e.select(
        F.round(F.col("embedding")[0].cast("double") * _Q)
        .cast("long")
        .alias("s"),
        (F.col("label") % 2).cast("long").alias("y"),
    )
    cells = pts.groupBy("s").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos")
    )
    cum = ordered_prefix_sum(cells, ["s"], "cnt", out_col="cum_n")
    r = cum.agg(
        F.sum(
            F.col("pos")
            * (2 * (F.col("cum_n") - F.col("cnt")) + F.col("cnt") + 1)
        )
        .cast("long")
        .alias("r2")
    )
    tot = cells.agg(
        F.sum("pos").cast("long").alias("n1"),
        (F.sum("cnt") - F.sum("pos")).cast("long").alias("n0"),
    )
    return (
        r.crossJoin(F.broadcast(tot))
        .select(
            "n1",
            "n0",
            (F.col("r2") - F.col("n1") * (F.col("n1") + 1))
            .cast("long")
            .alias("auc_num"),
            F.round(
                (F.col("r2") - F.col("n1") * (F.col("n1") + 1)).cast("double")
                / (2.0 * F.col("n1") * F.col("n0")),
                6,
            ).alias("auc"),
        )
    )


_LIFT_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
tc AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
hb AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(tok), 1, 8)) AS UBIGINT)
              % {_FH_BUCKETS} AS BIGINT) AS bucket,
         CASE WHEN CAST(('0x' || substr(md5(tok), 9, 1)) AS UBIGINT) < 8
              THEN cnt ELSE -cnt END AS signed_cnt
  FROM tc
),
feat AS (SELECT doc_id, bucket, SUM(signed_cnt) AS f FROM hb GROUP BY 1, 2),
wt AS (
  SELECT b AS bucket,
         CAST(CAST(('0x' || substr(md5('w' || b), 1, 8)) AS UBIGINT)
              % 2001 AS BIGINT) - 1000 AS w
  FROM UNNEST(generate_series(0, {_FH_BUCKETS - 1})) AS t(b)
),
score AS (
  SELECT f.doc_id, CAST(SUM(f.f * wt.w) AS BIGINT) AS score,
         MAX(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END) AS y
  FROM feat f JOIN wt USING (bucket)
  JOIN documents d ON d.doc_id = f.doc_id
  GROUP BY f.doc_id
),
ranked AS (
  SELECT y, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rk,
         COUNT(*) OVER () AS n, SUM(y) OVER () AS npos
  FROM score
),
dec AS (
  SELECT ((rk - 1) * 10) // n AS decile,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(y) AS BIGINT) AS n_pos,
         MAX(n) AS n, MAX(npos) AS npos
  FROM ranked GROUP BY 1
),
g AS (
  SELECT decile, n_docs, n_pos,
         SUM(n_pos) OVER (ORDER BY decile) AS cum_pos,
         SUM(n_docs) OVER (ORDER BY decile) AS cum_docs,
         n, npos
  FROM dec
)
SELECT CAST(decile AS BIGINT) AS decile, n_docs, n_pos,
       CAST(cum_pos AS BIGINT) AS cum_pos,
       CAST((CAST(cum_pos AS HUGEINT) * n * 1000000)
            // (CAST(cum_docs AS HUGEINT) * npos) AS BIGINT)
         AS lift_ppm
FROM g
"""


@query(
    "ml_lift_gains_deciles",
    _LIFT_ORACLE,
    doc="Decile lift/gains table for the feature-hash scorer against "
    "the lang='en' target — integer ppm lift, distributed ranking.",
)
def ml_lift_gains_deciles(spark, sf_dir):
    """LIFT & GAINS table — how model evaluation actually ships in
    targeting/ranking systems: rank every doc by the (integer)
    feature-hash score, cut into score deciles, and report each
    decile's positive concentration vs the base rate as integer ppm
    lift. The global rank comes from the distributed two-phase prefix
    scan over (score desc, doc_id) — no single-partition window on the
    per-doc frame, which GROWS with the corpus (the decile frame the
    final cumulative window touches is 10 rows, frozen by
    construction). Everything through the lift is exact integer
    division."""
    from station_data_ingestion_spark.operators.prefix_sum import (
        ordered_prefix_sum,
    )

    d = load(spark, sf_dir, "documents")["documents"]
    tc = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    u32 = lambda c, a, n: F.conv(F.substring(F.md5(c), a, n), 16, 10).cast(  # noqa: E731
        "long"
    )
    hb = tc.select(
        "doc_id",
        (u32(F.col("tok"), 1, 8) % _FH_BUCKETS).alias("bucket"),
        F.when(u32(F.col("tok"), 9, 1) < 8, F.col("cnt"))
        .otherwise(-F.col("cnt"))
        .alias("signed_cnt"),
    )
    feat = hb.groupBy("doc_id", "bucket").agg(F.sum("signed_cnt").alias("f"))
    wt = spark.range(_FH_BUCKETS).select(
        F.col("id").alias("bucket"),
        (u32(F.concat(F.lit("w"), F.col("id")), 1, 8) % 2001 - 1000).alias("w"),
    )
    score = (
        feat.join(F.broadcast(wt), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("f") * F.col("w")).cast("long").alias("score"))
        .join(
            d.select(
                "doc_id",
                F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
            ),
            "doc_id",
        )
        .withColumn("neg", -F.col("score"))
    )
    ranked = ordered_prefix_sum(
        score, ["neg", "doc_id"], F.lit(1), out_col="rk"
    )
    # corpus totals: one-row broadcast (n docs, n positives)
    tot = score.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("npos"),
    )
    dec = (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn("decile", F.expr("(rk - 1) * 10 div n"))
        .groupBy("decile", "n", "npos")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("y").cast("long").alias("n_pos"),
        )
    )
    wd = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    g = dec.select(
        "decile",
        "n_docs",
        "n_pos",
        F.sum("n_pos").over(wd).alias("cum_pos"),
        F.sum("n_docs").over(wd).alias("cum_docs"),
        "n",
        "npos",
    )
    return g.select(
        F.col("decile").cast("long").alias("decile"),
        "n_docs",
        "n_pos",
        F.col("cum_pos").cast("long").alias("cum_pos"),
        # decimal(38,0) intermediate: cum_pos*n*1e6 overflows int64 past
        # ~3M docs (Spark non-ANSI would wrap silently, DuckDB errors);
        # the quotient itself is <= 1e7 so the final long cast is safe.
        F.expr(
            "cast(cum_pos as decimal(38,0)) * n * 1000000"
            " div (cast(cum_docs as decimal(38,0)) * npos)"
        )
        .cast("long")
        .alias("lift_ppm"),
    )


_KNN_LOO_ORACLE = """
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (
  SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
), pairs AS (
  SELECT a.vec_id AS q, a.label AS ql, b.vec_id AS c, b.label AS cl,
         ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS sim
  FROM n a JOIN n b ON a.vec_id <> b.vec_id
), top5 AS (
  SELECT q, ql, cl,
         ROW_NUMBER() OVER (PARTITION BY q ORDER BY sim DESC, c) AS rk
  FROM pairs
), votes AS (
  SELECT q, ql, cl, COUNT(*) AS cnt FROM top5 WHERE rk <= 5 GROUP BY 1, 2, 3
), pred AS (
  SELECT q, ql, cl AS pred,
         ROW_NUMBER() OVER (PARTITION BY q ORDER BY cnt DESC, cl ASC) AS pr
  FROM votes
)
SELECT CAST(ql AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN pred = ql THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       CAST(SUM(CASE WHEN pred = ql THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS acc_ppm
FROM pred WHERE pr = 1 GROUP BY ql
"""


@query("ml_knn_loo_accuracy", _KNN_LOO_ORACLE)
def ml_knn_loo_accuracy(
    spark,
    sf_dir,
    max_eval_rows: int = 100_000,
    sample_over_budget: bool = False,
):
    """5-NN leave-one-out label accuracy over the embedding corpus —
    the zero-training sanity eval of embedding quality (if 5-NN can't
    recover labels, no downstream head will). The distributed shape is
    block x broadcast-matrix: the eval corpus broadcasts once as one
    float64 matrix inside the closure, and each Arrow batch scores
    itself against it with ONE matmul, taking top-5 under the oracle's
    exact (round(sim,6) DESC, id ASC) key and voting majority-with-
    smallest-label-tiebreak via bincount/argmax. Per-label accuracy
    rows in integer ppm.

    LOO is O(n^2) by definition and the reference matrix lives on the
    driver, so the eval corpus is BUDGETED, not assumed bounded
    (semantic_near_pairs_auto's alarm pattern): past ``max_eval_rows``
    the query raises loudly, or — with ``sample_over_budget=True`` —
    down-samples deterministically (md5 bottom-k on vec_id, so every
    run and engine sees the same sample) to the budget. Unbudgeted
    full-corpus retrieval belongs to the IVF/PQ/LSH paths."""
    import numpy as np

    e = load(spark, sf_dir, "embeddings")["embeddings"]
    n_corpus = e.count()
    if n_corpus > max_eval_rows:
        if not sample_over_budget:
            raise RuntimeError(
                f"ml_knn_loo_accuracy: eval corpus has {n_corpus} rows, "
                f"over the max_eval_rows={max_eval_rows} budget — LOO is "
                "quadratic and broadcasts the corpus to the driver. "
                "Raise max_eval_rows, pass sample_over_budget=True for a "
                "deterministic md5 down-sample, or use the IVF/PQ/LSH "
                "retrieval paths for unbounded corpora."
            )
        e = (
            e.orderBy(F.md5(F.col("vec_id").cast("string")))
            .limit(int(max_eval_rows))
            .localCheckpoint(eager=False)
        )
    ref = e.select("vec_id", "label", "embedding").collect()
    ref_ids = np.array([r["vec_id"] for r in ref], dtype=np.int64)
    ref_lab = np.array([r["label"] for r in ref], dtype=np.int64)
    mat = np.array([r["embedding"] for r in ref], dtype=np.float64)
    nrm = np.linalg.norm(mat, axis=1)
    n_lab = int(ref_lab.max()) + 1

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf["embedding"]), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            labs = pdf["label"].to_numpy(dtype=np.int64)
            sims = np.round(
                (x @ mat.T) / np.outer(np.linalg.norm(x, axis=1), nrm), 6
            )
            # a vector is not its own neighbor
            self_mask = ids[:, None] == ref_ids[None, :]
            sims[self_mask] = -np.inf
            preds = np.empty(len(ids), dtype=np.int64)
            for i in range(len(ids)):
                order = np.lexsort((ref_ids, -sims[i]))[:5]
                counts = np.bincount(ref_lab[order], minlength=n_lab)
                preds[i] = int(np.argmax(counts))
            yield pd.DataFrame(
                {"label": labs, "correct": (preds == labs).astype(np.int64)}
            )

    per = e.select("vec_id", "label", "embedding").mapInPandas(
        run, "label long, correct long"
    )
    return per.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("correct").cast("long").alias("n_correct"),
        F.expr("sum(correct) * 1000000 div count(1)")
        .cast("long")
        .alias("acc_ppm"),
    )


_PRF_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
tc AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
hb AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(tok), 1, 8)) AS UBIGINT)
              % {_FH_BUCKETS} AS BIGINT) AS bucket,
         CASE WHEN CAST(('0x' || substr(md5(tok), 9, 1)) AS UBIGINT) < 8
              THEN cnt ELSE -cnt END AS signed_cnt
  FROM tc
),
feat AS (
  SELECT doc_id, bucket, SUM(signed_cnt) AS f FROM hb GROUP BY 1, 2
),
wt AS (
  SELECT b AS bucket,
         CAST(CAST(('0x' || substr(md5('w' || b), 1, 8)) AS UBIGINT)
              % 2001 AS BIGINT) - 1000 AS w
  FROM UNNEST(generate_series(0, {_FH_BUCKETS - 1})) AS t(b)
),
score AS (
  SELECT fe.doc_id, CAST(SUM(fe.f * w) AS BIGINT) AS score,
         MAX(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END) AS y
  FROM feat fe JOIN wt USING (bucket)
  JOIN documents d ON d.doc_id = fe.doc_id
  GROUP BY fe.doc_id
),
cm AS (
  SELECT CAST(SUM(CASE WHEN score >= 0 AND y = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN score >= 0 AND y = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN score < 0 AND y = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS fn,
         CAST(SUM(CASE WHEN score < 0 AND y = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS tn
  FROM score
)
SELECT tp, fp, fn, tn,
       CAST(tp * 1000000 // (tp + fp) AS BIGINT) AS precision_ppm,
       CAST(tp * 1000000 // (tp + fn) AS BIGINT) AS recall_ppm,
       CAST(2 * tp * 1000000 // (2 * tp + fp + fn) AS BIGINT) AS f1_ppm,
       CAST(ROUND((tp * 1.0 * tn - fp * 1.0 * fn)
                  / sqrt((tp + fp) * 1.0 * (tp + fn)
                         * (tn + fp) * (tn + fn)) * 1000000) AS BIGINT)
         AS mcc_micro
FROM cm
"""


@query("ml_precision_recall_f1_mcc", _PRF_ORACLE)
def ml_precision_recall_f1_mcc(spark, sf_dir):
    """Thresholded-classifier evaluation: the feature-hash scorer
    predicts lang='en' at score >= 0, and the 2x2 confusion collapses
    to precision / recall / F1 (integer ppm via integer division) and
    Matthews correlation (one IEEE sqrt over exact integer cell
    products — the balanced metric that doesn't inflate under class
    skew). Complements ml_roc_auc_exact (threshold-free) and
    ml_lift_gains_deciles (ranking): together they are the standard
    offline eval triad. One aggregation to a single 2x2 row; every
    upstream step is the exact-bigint hashing pipeline."""
    d = load(spark, sf_dir, "documents")["documents"]
    tc = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    u32 = lambda c, a, n: F.conv(F.substring(F.md5(c), a, n), 16, 10).cast(  # noqa: E731
        "long"
    )
    hb = tc.select(
        "doc_id",
        (u32(F.col("tok"), 1, 8) % _FH_BUCKETS).alias("bucket"),
        F.when(u32(F.col("tok"), 9, 1) < 8, F.col("cnt"))
        .otherwise(-F.col("cnt"))
        .alias("signed_cnt"),
    )
    feat = hb.groupBy("doc_id", "bucket").agg(F.sum("signed_cnt").alias("f"))
    wt = spark.range(_FH_BUCKETS).select(
        F.col("id").alias("bucket"),
        (u32(F.concat(F.lit("w"), F.col("id")), 1, 8) % 2001 - 1000).alias("w"),
    )
    score = (
        feat.join(F.broadcast(wt), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("f") * F.col("w")).cast("long").alias("score"))
        .join(
            d.select(
                "doc_id",
                F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
            ),
            "doc_id",
        )
    )
    cm = score.agg(
        F.sum(F.when((F.col("score") >= 0) & (F.col("y") == 1), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when((F.col("score") >= 0) & (F.col("y") == 0), 1).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when((F.col("score") < 0) & (F.col("y") == 1), 1).otherwise(0))
        .cast("long")
        .alias("fn"),
        F.sum(F.when((F.col("score") < 0) & (F.col("y") == 0), 1).otherwise(0))
        .cast("long")
        .alias("tn"),
    )
    dbl = lambda c: c.cast("double")  # noqa: E731
    return cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr("tp * 1000000 div (tp + fp)").cast("long").alias(
            "precision_ppm"
        ),
        F.expr("tp * 1000000 div (tp + fn)").cast("long").alias("recall_ppm"),
        F.expr("2 * tp * 1000000 div (2 * tp + fp + fn)")
        .cast("long")
        .alias("f1_ppm"),
        F.round(
            (dbl(F.col("tp")) * dbl(F.col("tn")) - dbl(F.col("fp")) * dbl(F.col("fn")))
            / F.sqrt(
                (dbl(F.col("tp")) + dbl(F.col("fp")))
                * (dbl(F.col("tp")) + dbl(F.col("fn")))
                * (dbl(F.col("tn")) + dbl(F.col("fp")))
                * (dbl(F.col("tn")) + dbl(F.col("fn")))
            )
            * 1000000
        )
        .cast("long")
        .alias("mcc_micro"),
    )
