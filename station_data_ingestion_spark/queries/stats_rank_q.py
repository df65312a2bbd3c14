"""Rank-based and resampling nonparametric tests: Kruskal-Wallis,
Mood's median, trimmed/winsorized means, Hodges-Lehmann, Friedman,
mutual information, Page's trend, randomization (permutation) tests,
and Siegel repeated medians.

Split from stats_infer_q.py (pure file move, registry names unchanged)
when that module passed 2,000 LoC. Every query keeps its
integer-or-6dp-rounded output discipline so the DuckDB oracle hashes
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from station_data_ingestion_spark.queries.registry import load, query


@query(
    "stats_kruskal_wallis",
    """
WITH g AS (
  SELECT CAST(l_quantity AS BIGINT) AS v,
         CASE l_returnflag WHEN 'A' THEN 0 WHEN 'N' THEN 1 ELSE 2 END AS j
  FROM lineitem
), pv AS (
  SELECT v,
         CAST(SUM(CASE WHEN j = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS c0,
         CAST(SUM(CASE WHEN j = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS c1,
         CAST(SUM(CASE WHEN j = 2 THEN 1 ELSE 0 END) AS HUGEINT) AS c2,
         CAST(COUNT(*) AS HUGEINT) AS c
  FROM g GROUP BY v
), pc AS (
  SELECT v, c0, c1, c2, c, SUM(c) OVER (ORDER BY v) - c AS cum_less FROM pv
), s AS (
  SELECT CAST(SUM(c0 * (2 * cum_less + c + 1)) AS HUGEINT) AS r0,
         CAST(SUM(c1 * (2 * cum_less + c + 1)) AS HUGEINT) AS r1,
         CAST(SUM(c2 * (2 * cum_less + c + 1)) AS HUGEINT) AS r2,
         CAST(SUM(c0) AS HUGEINT) AS n0,
         CAST(SUM(c1) AS HUGEINT) AS n1,
         CAST(SUM(c2) AS HUGEINT) AS n2,
         CAST(SUM(c * c * c - c) AS HUGEINT) AS tie
  FROM pc
)
SELECT CAST(n0 + n1 + n2 AS BIGINT) AS n,
       ROUND(12.0 / ((n0 + n1 + n2) * 1.0 * (n0 + n1 + n2 + 1))
             * (r0 * 1.0 * r0 / (4.0 * n0)
                + r1 * 1.0 * r1 / (4.0 * n1)
                + r2 * 1.0 * r2 / (4.0 * n2))
             - 3.0 * (n0 + n1 + n2 + 1), 6) AS h_stat,
       ROUND((12.0 / ((n0 + n1 + n2) * 1.0 * (n0 + n1 + n2 + 1))
              * (r0 * 1.0 * r0 / (4.0 * n0)
                 + r1 * 1.0 * r1 / (4.0 * n1)
                 + r2 * 1.0 * r2 / (4.0 * n2))
              - 3.0 * (n0 + n1 + n2 + 1))
             / (1.0 - tie * 1.0
                / ((n0 + n1 + n2) * 1.0 * (n0 + n1 + n2)
                   * (n0 + n1 + n2) - (n0 + n1 + n2))), 6)
         AS h_tie_corrected
FROM s
""",
)
def stats_kruskal_wallis(spark, sf_dir):
    """Kruskal-Wallis H test (k=3 return-flag groups on quantity) — the
    k-sample extension of Mann-Whitney, the nonparametric one-way ANOVA
    for heavy-tailed metrics. Same scale shape as stats_mann_whitney_u:
    ranking collapses to the DISTINCT-VALUE frame (bounded quantity
    domain) with the exclusive cumulative count through
    ordered_prefix_sum — no global window at any corpus size. Doubled
    average ranks keep the three per-group rank sums and the tie term
    exact integers; per-group squared terms stay one-row WIDE (three
    columns, one explicit + chain) so the float summation order is
    fixed and engine-identical."""
    from station_data_ingestion_spark.operators.prefix_sum import (
        ordered_prefix_sum,
    )

    li = load(spark, sf_dir, "lineitem")["lineitem"]
    g = li.select(
        F.col("l_quantity").cast("bigint").alias("v"),
        F.when(F.col("l_returnflag") == "A", 0)
        .when(F.col("l_returnflag") == "N", 1)
        .otherwise(2)
        .alias("j"),
    )
    pv = g.groupBy("v").agg(
        *[
            F.sum(F.when(F.col("j") == k, 1).otherwise(0)).alias(f"c{k}")
            for k in range(3)
        ],
        F.count(F.lit(1)).alias("c"),
    )
    pc = ordered_prefix_sum(pv, ["v"], "c", out_col="cumc").withColumn(
        "cum_less", F.col("cumc") - F.col("c")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    dbl = lambda c: c.cast("double")  # noqa: E731
    s = pc.agg(
        *[
            F.sum(
                dec(F.col(f"c{k}"))
                * (2 * dec(F.col("cum_less")) + dec(F.col("c")) + 1)
            ).alias(f"r{k}")
            for k in range(3)
        ],
        *[dec(F.sum(f"c{k}")).alias(f"n{k}") for k in range(3)],
        F.sum(
            dec(F.col("c")) * dec(F.col("c")) * dec(F.col("c"))
            - dec(F.col("c"))
        ).alias("tie"),
    )
    n = F.col("n0") + F.col("n1") + F.col("n2")
    sum_term = (
        dbl(F.col("r0")) * dbl(F.col("r0")) / (4.0 * dbl(F.col("n0")))
        + dbl(F.col("r1")) * dbl(F.col("r1")) / (4.0 * dbl(F.col("n1")))
        + dbl(F.col("r2")) * dbl(F.col("r2")) / (4.0 * dbl(F.col("n2")))
    )
    h = 12.0 / (dbl(n) * dbl(n + 1)) * sum_term - 3.0 * dbl(n + 1)
    corr = 1.0 - dbl(F.col("tie")) / (dbl(n) * dbl(n) * dbl(n) - dbl(n))
    return s.select(
        n.cast("long").alias("n"),
        F.round(h, 6).alias("h_stat"),
        F.round(h / corr, 6).alias("h_tie_corrected"),
    )


@query(
    "stats_mood_median_test",
    """
WITH x AS (
  SELECT o_orderpriority AS grp,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), med AS (
  -- lower median: exact order statistic at ceil(n/2), integer cents
  SELECT cents AS m FROM (
    SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn,
           COUNT(*) OVER () AS n
    FROM x
  ) WHERE rn = (n + 1) // 2
), cells AS (
  SELECT grp,
         CAST(SUM(CASE WHEN cents > (SELECT m FROM med) THEN 1 ELSE 0 END)
              AS HUGEINT) AS above,
         CAST(SUM(CASE WHEN cents <= (SELECT m FROM med) THEN 1 ELSE 0 END)
              AS HUGEINT) AS notabove
  FROM x GROUP BY grp
), tot AS (
  SELECT CAST(SUM(above) AS HUGEINT) AS ta,
         CAST(SUM(notabove) AS HUGEINT) AS tn,
         CAST(SUM(above + notabove) AS HUGEINT) AS n
  FROM cells
)
SELECT grp, CAST(above AS BIGINT) AS above,
       CAST(notabove AS BIGINT) AS notabove,
       ROUND((above * 1.0 - (above + notabove) * 1.0 * ta / n)
             * (above * 1.0 - (above + notabove) * 1.0 * ta / n)
             / ((above + notabove) * 1.0 * ta / n)
             + (notabove * 1.0 - (above + notabove) * 1.0 * tn / n)
             * (notabove * 1.0 - (above + notabove) * 1.0 * tn / n)
             / ((above + notabove) * 1.0 * tn / n), 6)
         AS chi2_contrib
FROM cells, tot
ORDER BY grp
""",
)
def stats_mood_median_test(spark, sf_dir):
    """Mood's median test (k=5 order priorities on order totals): does
    any priority's distribution sit above/below the GRAND median? The
    grand median is the exact lower-median order statistic found
    metadata-light via the distributed two-phase prefix scan shape (a
    one-row broadcast afterwards); the k x 2 contingency cells are one
    conditional aggregation pass, and each group's chi-square
    contribution is computed from exact integer cells with a fixed
    IEEE expression. Per-group contributions ship as rows (the global
    chi2 is their sum) so the output also pinpoints WHICH priority
    deviates — more actionable than the scalar."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")["orders"].select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    # exact lower median: global sort rank via two-phase prefix sum
    from station_data_ingestion_spark.operators.prefix_sum import (
        ordered_prefix_sum,
    )

    pv = o.groupBy("cents").agg(F.count(F.lit(1)).alias("c"))
    pc = ordered_prefix_sum(pv, ["cents"], "c", out_col="cum")
    tot_n = o.count()
    want = (tot_n + 1) // 2
    med = (
        pc.filter(
            (F.col("cum") >= want) & (F.col("cum") - F.col("c") < want)
        )
        .select(F.col("cents").alias("m"))
    )
    cells = (
        o.crossJoin(F.broadcast(med))
        .groupBy("grp")
        .agg(
            F.sum(F.when(F.col("cents") > F.col("m"), 1).otherwise(0))
            .cast("decimal(38,0)")
            .alias("above"),
            F.sum(F.when(F.col("cents") <= F.col("m"), 1).otherwise(0))
            .cast("decimal(38,0)")
            .alias("notabove"),
        )
    )
    w = Window.partitionBy()
    dbl = lambda c: c.cast("double")  # noqa: E731
    tot = cells.select(
        "grp",
        "above",
        "notabove",
        F.sum("above").over(w).alias("ta"),
        F.sum("notabove").over(w).alias("tn"),
        (F.sum("above").over(w) + F.sum("notabove").over(w)).alias("n"),
    )
    rowtot = F.col("above") + F.col("notabove")
    ea = dbl(rowtot) * dbl(F.col("ta")) / dbl(F.col("n"))
    en = dbl(rowtot) * dbl(F.col("tn")) / dbl(F.col("n"))
    return tot.select(
        "grp",
        F.col("above").cast("long").alias("above"),
        F.col("notabove").cast("long").alias("notabove"),
        F.round(
            (dbl(F.col("above")) - ea) * (dbl(F.col("above")) - ea) / ea
            + (dbl(F.col("notabove")) - en)
            * (dbl(F.col("notabove")) - en)
            / en,
            6,
        ).alias("chi2_contrib"),
    )


@query(
    "stats_trimmed_winsorized_means",
    """
WITH x AS (
  SELECT o_orderpriority AS grp,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), pv AS (
  SELECT grp, cents, CAST(COUNT(*) AS BIGINT) AS c
  FROM x GROUP BY grp, cents
), pc AS (
  SELECT grp, cents, c,
         SUM(c) OVER (PARTITION BY grp ORDER BY cents) AS cum,
         SUM(c) OVER (PARTITION BY grp) AS n
  FROM pv
), k AS (
  SELECT grp, cents, c, cum, cum - c AS cum_less, n, n // 10 AS k FROM pc
), agg AS (
  SELECT grp, MAX(n) AS n, MAX(k) AS k,
         CAST(SUM(GREATEST(0, LEAST(cum, n - k) - GREATEST(cum_less, k))
                  * cents) AS HUGEINT) AS tsum,
         MAX(CASE WHEN cum_less < k + 1 AND k + 1 <= cum
                  THEN cents END) AS lo,
         MAX(CASE WHEN cum_less < n - k AND n - k <= cum
                  THEN cents END) AS hi
  FROM k GROUP BY grp
)
SELECT grp, CAST(n AS BIGINT) AS n, CAST(lo AS BIGINT) AS lo_cents,
       CAST(hi AS BIGINT) AS hi_cents,
       ROUND(tsum * 1.0 / (n - 2 * k), 4) AS trimmed_mean_cents,
       ROUND((tsum + CAST(k AS HUGEINT) * lo + CAST(k AS HUGEINT) * hi)
             * 1.0 / n, 4) AS winsorized_mean_cents
FROM agg ORDER BY grp
""",
)
def stats_trimmed_winsorized_means(spark, sf_dir):
    """10% trimmed and winsorized means of order totals per priority —
    the robust-location estimators that survive the heavy right tail a
    plain mean drowns in. No per-row ranking window: the order
    statistics come from the DISTINCT-VALUE frame (per-group value
    counts + cumulative counts), so each value row contributes
    ``overlap([cum_less, cum], [k, n-k]) * value`` to the trimmed sum —
    exact integer arithmetic at any corpus size, with the per-group
    cumulative built from ONE global two-phase prefix scan over
    (grp, cents) minus broadcast per-group offsets (the group count is
    bounded, the scan is not). Winsorized sum = trimmed sum + k*lo +
    k*hi where lo/hi are the clamp quantile values read off the same
    frame."""
    from pyspark.sql import Window

    from station_data_ingestion_spark.operators.prefix_sum import (
        ordered_prefix_sum,
    )

    o = load(spark, sf_dir, "orders")["orders"].select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    pv = o.groupBy("grp", "cents").agg(F.count(F.lit(1)).alias("c"))
    pc = ordered_prefix_sum(pv, ["grp", "cents"], "c", out_col="gcum")
    # per-group offsets: bounded frame (one row per group), tiny window
    gtot = pv.groupBy("grp").agg(F.sum("c").alias("n"))
    woff = Window.orderBy("grp").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = gtot.select(
        "grp", "n", F.coalesce(F.sum("n").over(woff), F.lit(0)).alias("off")
    )
    kf = (
        pc.join(F.broadcast(offs), "grp")
        .withColumn("cum", F.col("gcum") - F.col("off"))
        .withColumn("cum_less", F.col("cum") - F.col("c"))
        .withColumn("k", F.expr("n div 10"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = kf.groupBy("grp").agg(
        F.max("n").alias("n"),
        F.max("k").alias("k"),
        F.sum(
            dec(
                F.greatest(
                    F.lit(0),
                    F.least(F.col("cum"), F.col("n") - F.col("k"))
                    - F.greatest(F.col("cum_less"), F.col("k")),
                )
            )
            * dec(F.col("cents"))
        ).alias("tsum"),
        F.max(
            F.when(
                (F.col("cum_less") < F.col("k") + 1)
                & (F.col("k") + 1 <= F.col("cum")),
                F.col("cents"),
            )
        ).alias("lo"),
        F.max(
            F.when(
                (F.col("cum_less") < F.col("n") - F.col("k"))
                & (F.col("n") - F.col("k") <= F.col("cum")),
                F.col("cents"),
            )
        ).alias("hi"),
    )
    dbl = lambda c: c.cast("double")  # noqa: E731
    return agg.select(
        "grp",
        F.col("n").cast("long").alias("n"),
        F.col("lo").cast("long").alias("lo_cents"),
        F.col("hi").cast("long").alias("hi_cents"),
        F.round(
            dbl(F.col("tsum")) / dbl(F.col("n") - 2 * F.col("k")), 4
        ).alias("trimmed_mean_cents"),
        F.round(
            dbl(
                F.col("tsum")
                + dec(F.col("k")) * dec(F.col("lo"))
                + dec(F.col("k")) * dec(F.col("hi"))
            )
            / dbl(F.col("n")),
            4,
        ).alias("winsorized_mean_cents"),
    )


@query(
    "stats_hodges_lehmann_shift",
    """
WITH days AS (
  SELECT l_shipdate AS d, l_returnflag AS f,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem
  WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
        AND l_returnflag IN ('R', 'N')
  GROUP BY 1, 2
), x AS (SELECT d, cents FROM days WHERE f = 'R'),
y AS (SELECT d, cents FROM days WHERE f = 'N'),
diffs AS (
  SELECT x.cents - y.cents AS dv, CAST(COUNT(*) AS BIGINT) AS c
  FROM x, y GROUP BY 1
), pc AS (
  SELECT dv, c, SUM(c) OVER (ORDER BY dv) AS cum,
         SUM(c) OVER () AS npairs
  FROM diffs
)
SELECT CAST(MAX(npairs) AS BIGINT) AS n_pairs,
       CAST(MAX(CASE WHEN cum - c < (npairs + 1) // 2
                      AND (npairs + 1) // 2 <= cum
                     THEN dv END) AS BIGINT) AS hl_shift_cents
FROM pc
""",
)
def stats_hodges_lehmann_shift(spark, sf_dir):
    """Hodges-Lehmann shift estimator between the returned ('R') and
    non-returned ('N') DAILY revenue series over one calendar year: the
    exact lower median of all pairwise differences — the robust
    location-shift companion to Mann-Whitney (its point estimate). The
    pairwise frame is CALENDAR-BOUNDED (<=366 x 366 day pairs however
    big the corpus), built after the distributed daily aggregation, so
    the quadratic step never touches raw rows; the median comes off the
    distinct-difference frame through the two-phase prefix scan, exact
    integer cents end to end."""
    from station_data_ingestion_spark.operators.prefix_sum import (
        ordered_prefix_sum,
    )

    li = load(spark, sf_dir, "lineitem")["lineitem"]
    days = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-01-01"))
            & F.col("l_returnflag").isin("R", "N")
        )
        .groupBy("l_shipdate", "l_returnflag")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    x = days.filter(F.col("l_returnflag") == "R").select(
        F.col("cents").alias("xc")
    )
    y = days.filter(F.col("l_returnflag") == "N").select(
        F.col("cents").alias("yc")
    )
    diffs = (
        x.crossJoin(y)
        .select((F.col("xc") - F.col("yc")).alias("dv"))
        .groupBy("dv")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pc = ordered_prefix_sum(diffs, ["dv"], "c", out_col="cum")
    tot = pc.agg(F.sum("c").alias("npairs"))
    want = tot.select(
        "npairs", F.expr("(npairs + 1) div 2").alias("want")
    )
    return (
        pc.crossJoin(F.broadcast(want))
        .agg(
            F.max("npairs").cast("long").alias("n_pairs"),
            F.max(
                F.when(
                    (F.col("cum") - F.col("c") < F.col("want"))
                    & (F.col("want") <= F.col("cum")),
                    F.col("dv"),
                )
            )
            .cast("long")
            .alias("hl_shift_cents"),
        )
    )


@query(
    "stats_friedman_test",
    """
WITH daily AS (
  SELECT (CAST(o_orderdate AS DATE) - DATE '1992-01-06') // 7 AS blk,
         ((CAST(o_orderdate AS DATE) - DATE '1992-01-06') % 7) + 1 AS dow,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders
  WHERE o_orderdate >= DATE '1992-01-06'
  GROUP BY 1, 2
), full_blk AS (
  SELECT blk FROM daily GROUP BY blk HAVING COUNT(*) = 7
), d AS (
  SELECT daily.* FROM daily JOIN full_blk USING (blk)
), r2 AS (
  -- doubled average rank within each 7-row block: bounded 7x7 fan-out
  SELECT a.blk, a.dow,
         SUM(CASE WHEN b.cents < a.cents THEN 2
                  WHEN b.cents = a.cents THEN 1 ELSE 0 END) + 1 AS r2
  FROM d a JOIN d b USING (blk) GROUP BY a.blk, a.dow
), rj AS (
  SELECT dow, CAST(SUM(r2) AS HUGEINT) AS r2j,
         CAST(COUNT(*) AS HUGEINT) AS b
  FROM r2 GROUP BY dow
), s AS (
  SELECT CAST(SUM(r2j * r2j) AS HUGEINT) AS sumsq, MAX(b) AS b,
         CAST(COUNT(*) AS HUGEINT) AS k
  FROM rj
)
SELECT CAST(b AS BIGINT) AS n_blocks,
       ROUND(12.0 * (sumsq / 4.0) / (b * 1.0 * k * (k + 1))
             - 3.0 * b * (k + 1), 6) AS friedman_chi2
FROM s
""",
)
def stats_friedman_test(spark, sf_dir):
    """Friedman test: is daily order revenue NOT exchangeable across
    weekdays? Blocks = complete Monday-anchored calendar weeks (every
    week contributes one ranking of its 7 weekdays), the repeated-
    measures twin of Kruskal-Wallis — blocking removes the huge
    week-to-week volume drift that would drown a pooled rank test.
    Ranking happens INSIDE bounded 7-row blocks (a 7x7 self-join
    fan-out after the distributed daily aggregation — no window, no
    skew), with doubled average ranks keeping block rank sums and
    their squares exact integers; the chi-square statistic is one IEEE
    expression over those integers."""
    o = load(spark, sf_dir, "orders")["orders"]
    daily = (
        o.filter(F.col("o_orderdate") >= F.lit("1992-01-06"))
        .groupBy(
            F.expr("datediff(o_orderdate, date'1992-01-06') div 7").alias(
                "blk"
            ),
            (
                F.expr("datediff(o_orderdate, date'1992-01-06') % 7") + 1
            ).alias("dow"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    full_blk = daily.groupBy("blk").agg(
        F.count(F.lit(1)).alias("nd")
    ).filter(F.col("nd") == 7).select("blk")
    d = daily.join(full_blk, "blk")
    b_side = d.select(
        F.col("blk"), F.col("cents").alias("bcents")
    )
    r2 = (
        d.join(b_side, "blk")
        .groupBy("blk", "dow")
        .agg(
            (
                F.sum(
                    F.when(F.col("bcents") < F.col("cents"), 2)
                    .when(F.col("bcents") == F.col("cents"), 1)
                    .otherwise(0)
                )
                + 1
            ).alias("r2")
        )
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    rj = r2.groupBy("dow").agg(
        dec(F.sum("r2")).alias("r2j"),
        dec(F.count(F.lit(1))).alias("b"),
    )
    s = rj.agg(
        F.sum(dec(F.col("r2j")) * dec(F.col("r2j"))).alias("sumsq"),
        F.max("b").alias("b"),
        dec(F.count(F.lit(1))).alias("k"),
    )
    dbl = lambda c: c.cast("double")  # noqa: E731
    return s.select(
        F.col("b").cast("long").alias("n_blocks"),
        F.round(
            12.0
            * (dbl(F.col("sumsq")) / 4.0)
            / (dbl(F.col("b")) * dbl(F.col("k")) * dbl(F.col("k") + 1))
            - 3.0 * dbl(F.col("b")) * dbl(F.col("k") + 1),
            6,
        ).alias("friedman_chi2"),
    )


@query(
    "stats_mutual_information_lang_len",
    """
WITH x AS (
  SELECT lang, LEAST(n_chars // 500, 3) AS lb FROM documents
), cells AS (
  SELECT lang, lb, CAST(COUNT(*) AS BIGINT) AS c FROM x GROUP BY 1, 2
), marg AS (
  SELECT lang, lb, c,
         SUM(c) OVER (PARTITION BY lang) AS cx,
         SUM(c) OVER (PARTITION BY lb) AS cy,
         SUM(c) OVER () AS n
  FROM cells
)
SELECT CAST(MAX(n) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(CAST(ROUND(c * 1.0 / n
                           * LN(c * 1.0 * n / (cx * 1.0 * cy))
                           * 1000000) AS BIGINT)) AS BIGINT)
         AS mi_micronats
FROM marg
""",
)
def stats_mutual_information_lang_len(spark, sf_dir):
    """Mutual information between document language and length bucket,
    in integer micro-nats — the dependence audit a mixture designer
    runs before stratifying one way and sampling the other (MI ~ 0
    means length-stratified sampling cannot skew language balance).
    One aggregation pass to the BOUNDED cell frame (|langs| x 4
    buckets), marginals by windows over that tiny frame, and each
    cell's p*ln(p/(px py)) contribution rounds to integer micro-nats
    BEFORE the final sum — associative integer addition, so the total
    is partitioning- and engine-independent (ln agreement is ~1 ulp,
    six orders below the rounding grain)."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")["documents"].select(
        "lang", F.least(F.expr("n_chars div 500"), F.lit(3)).alias("lb")
    )
    cells = d.groupBy("lang", "lb").agg(F.count(F.lit(1)).alias("c"))
    marg = cells.select(
        "lang",
        "lb",
        "c",
        F.sum("c").over(Window.partitionBy("lang")).alias("cx"),
        F.sum("c").over(Window.partitionBy("lb")).alias("cy"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    dbl = lambda c: c.cast("double")  # noqa: E731
    contrib = F.round(
        dbl(F.col("c"))
        / dbl(F.col("n"))
        * F.log(
            dbl(F.col("c")) * dbl(F.col("n"))
            / (dbl(F.col("cx")) * dbl(F.col("cy")))
        )
        * 1000000
    ).cast("long")
    return marg.agg(
        F.max("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum(contrib).cast("long").alias("mi_micronats"),
    )


@query(
    "stats_page_trend_test",
    """
WITH daily AS (
  SELECT (CAST(o_orderdate AS DATE) - DATE '1992-01-06') // 7 AS blk,
         ((CAST(o_orderdate AS DATE) - DATE '1992-01-06') % 7) + 1 AS dow,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders
  WHERE o_orderdate >= DATE '1992-01-06'
  GROUP BY 1, 2
), full_blk AS (
  SELECT blk FROM daily GROUP BY blk HAVING COUNT(*) = 7
), d AS (
  SELECT daily.* FROM daily JOIN full_blk USING (blk)
), r2 AS (
  SELECT a.blk, a.dow,
         SUM(CASE WHEN b.cents < a.cents THEN 2
                  WHEN b.cents = a.cents THEN 1 ELSE 0 END) + 1 AS r2
  FROM d a JOIN d b USING (blk) GROUP BY a.blk, a.dow
), rj AS (
  SELECT dow, CAST(SUM(r2) AS HUGEINT) AS r2j,
         CAST(COUNT(*) AS HUGEINT) AS b
  FROM r2 GROUP BY dow
), s AS (
  SELECT CAST(SUM(dow * r2j) AS HUGEINT) AS l2, MAX(b) AS b,
         CAST(COUNT(*) AS HUGEINT) AS k
  FROM rj
)
SELECT CAST(b AS BIGINT) AS n_blocks, CAST(l2 AS BIGINT) AS page_l_x2,
       ROUND((6.0 * l2 - 3.0 * b * k * (k + 1) * (k + 1))
             / ((k * k * k - k) * sqrt(b * 1.0 / (k - 1))), 6) AS z
FROM s
""",
)
def stats_page_trend_test(spark, sf_dir):
    """Page's trend test: is there a MONOTONE weekday ordering in daily
    revenue (Mon < Tue < ... by rank), not just ANY difference
    (Friedman)? L = Σ_j j·R_j over the same doubled block ranks as
    stats_friedman_test — exact integers from the bounded 7x7 in-block
    fan-out — with the normal approximation z computed in one fixed
    IEEE expression from (L, b, k). Ordered alternatives are the right
    test when the hypothesis is a trend across ordered treatments."""
    o = load(spark, sf_dir, "orders")["orders"]
    daily = (
        o.filter(F.col("o_orderdate") >= F.lit("1992-01-06"))
        .groupBy(
            F.expr("datediff(o_orderdate, date'1992-01-06') div 7").alias(
                "blk"
            ),
            (
                F.expr("datediff(o_orderdate, date'1992-01-06') % 7") + 1
            ).alias("dow"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    full_blk = (
        daily.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") == 7)
        .select("blk")
    )
    d = daily.join(full_blk, "blk")
    b_side = d.select(F.col("blk"), F.col("cents").alias("bcents"))
    r2 = (
        d.join(b_side, "blk")
        .groupBy("blk", "dow")
        .agg(
            (
                F.sum(
                    F.when(F.col("bcents") < F.col("cents"), 2)
                    .when(F.col("bcents") == F.col("cents"), 1)
                    .otherwise(0)
                )
                + 1
            ).alias("r2")
        )
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    rj = r2.groupBy("dow").agg(
        dec(F.sum("r2")).alias("r2j"), dec(F.count(F.lit(1))).alias("b")
    )
    s = rj.agg(
        F.sum(dec(F.col("dow")) * dec(F.col("r2j"))).alias("l2"),
        F.max("b").alias("b"),
        dec(F.count(F.lit(1))).alias("k"),
    )
    dbl = lambda c: c.cast("double")  # noqa: E731
    l2, b, k = dbl(F.col("l2")), dbl(F.col("b")), dbl(F.col("k"))
    # z = (L - E[L]) / sqrt(Var L): E[L] = b·k(k+1)²/4 and
    # Var(L) = b(k³-k)²/(144(k-1)) (both rank vectors are 1..k), with
    # L = l2/2 for doubled ranks -> z = (6·l2 - 3bk(k+1)²)/((k³-k)·sqrt(b/(k-1)))
    return s.select(
        F.col("b").cast("long").alias("n_blocks"),
        F.col("l2").cast("long").alias("page_l_x2"),
        F.round(
            (6.0 * l2 - 3.0 * b * k * (k + 1) * (k + 1))
            / ((k * k * k - k) * F.sqrt(b / (k - 1))),
            6,
        ).alias("z"),
    )


_RAND_K = 200


@query(
    "stats_randomization_test_diff_means",
    f"""
WITH x AS (
  SELECT o_orderkey AS id,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
  FROM orders
), obs AS (
  SELECT (SUM(CASE WHEN y = 1 THEN cents ELSE 0 END) * 1000000)
           // SUM(y) -
         (SUM(CASE WHEN y = 0 THEN cents ELSE 0 END) * 1000000)
           // SUM(1 - y) AS diff_obs_micro,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM x
), grid AS (
  SELECT x.id, x.cents, t.k,
         CASE WHEN substr(md5(t.k || '-' || x.id), 1, 1) < '8'
              THEN 1 ELSE 0 END AS yk
  FROM x, UNNEST(generate_series(0, {_RAND_K - 1})) AS t(k)
), perm AS (
  SELECT k,
         (SUM(CASE WHEN yk = 1 THEN cents ELSE 0 END) * 1000000)
           // SUM(yk) -
         (SUM(CASE WHEN yk = 0 THEN cents ELSE 0 END) * 1000000)
           // SUM(1 - yk) AS diff_k
  FROM grid GROUP BY k
)
SELECT o.n, CAST(o.diff_obs_micro AS BIGINT) AS diff_obs_micro,
       CAST(SUM(CASE WHEN ABS(p.diff_k) >= ABS(o.diff_obs_micro)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
       CAST((SUM(CASE WHEN ABS(p.diff_k) >= ABS(o.diff_obs_micro)
                      THEN 1 ELSE 0 END) + 1) * 1000000
            // ({_RAND_K} + 1) AS BIGINT) AS p_ppm
FROM perm p, obs o GROUP BY o.n, o.diff_obs_micro
""",
)
def stats_randomization_test_diff_means(spark, sf_dir):
    """Randomization (Monte-Carlo permutation) test for the urgent-vs-
    rest order-value gap: 200 deterministic md5-seeded Bernoulli
    relabelings replace the group column, and the p-value is the share
    of relabeled |mean gaps| at least as extreme as observed (with the
    +1 'observed counts as a draw' correction). The scale shape is the
    interesting part: all 200 replicates ride ONE scan — each row
    explodes into (k, contribution) pairs and map-side partial
    aggregation collapses them to 200 x partitions rows before the
    shuffle, so the cost is one wide pass, not 200 jobs. Every
    replicate's mean gap is integer micro-cents (sums and counts are
    exact; one integer division each), so the extreme-count and p are
    bit-identical cross-engine. Bernoulli relabeling approximates the
    exact permutation null (marginal group sizes vary binomially) —
    the standard large-N randomization-test trade."""
    o = load(spark, sf_dir, "orders")["orders"]
    x = o.select(
        F.col("o_orderkey").alias("id"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("y"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    obs = x.agg(
        (
            F.expr(
                "sum(case when y = 1 then cents else 0 end) * cast(1000000 as decimal(38,0)) div sum(y)"
            )
            - F.expr(
                "sum(case when y = 0 then cents else 0 end) * cast(1000000 as decimal(38,0)) div sum(1 - y)"
            )
        ).alias("diff_obs_micro"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    grid = x.select(
        "id",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_RAND_K - 1))).alias("k"),
    ).select(
        "k",
        "cents",
        F.when(
            F.substring(
                F.md5(F.concat(F.col("k").cast("string"), F.lit("-"), F.col("id").cast("string"))),
                1,
                1,
            )
            < "8",
            1,
        )
        .otherwise(0)
        .alias("yk"),
    )
    perm = grid.groupBy("k").agg(
        (
            F.expr(
                "sum(case when yk = 1 then cents else 0 end) * cast(1000000 as decimal(38,0)) div sum(yk)"
            )
            - F.expr(
                "sum(case when yk = 0 then cents else 0 end) * cast(1000000 as decimal(38,0)) div sum(1 - yk)"
            )
        ).alias("diff_k")
    )
    return (
        perm.crossJoin(F.broadcast(obs))
        .groupBy("n", "diff_obs_micro")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("diff_k")) >= F.abs(F.col("diff_obs_micro")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_extreme"),
            F.expr(
                "(sum(case when abs(diff_k) >= abs(diff_obs_micro) then 1 "
                f"else 0 end) + 1) * 1000000 div ({_RAND_K} + 1)"
            )
            .cast("long")
            .alias("p_ppm"),
        )
        .select(
            "n",
            F.col("diff_obs_micro").cast("long").alias("diff_obs_micro"),
            "n_extreme",
            "p_ppm",
        )
    )


@query(
    "stats_siegel_repeated_medians",
    """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS xc
  FROM orders GROUP BY 1
), p AS (
  SELECT a.d AS di, b.d AS dj,
         ROUND((b.xc - a.xc) * 1.0 / (b.d - a.d), 6) AS slope
  FROM daily a JOIN daily b ON b.d <> a.d
), med_i AS (
  SELECT di, slope AS mi FROM (
    SELECT di, slope,
           ROW_NUMBER() OVER (PARTITION BY di ORDER BY slope, dj) AS rn,
           COUNT(*) OVER (PARTITION BY di) AS cnt
    FROM p
  ) WHERE rn = (cnt + 1) // 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       MAX(mi) FILTER (WHERE rn = (cnt + 1) // 2)
         AS slope_cents_per_day
FROM (
  SELECT mi, ROW_NUMBER() OVER (ORDER BY mi, di) AS rn,
         COUNT(*) OVER () AS cnt, di
  FROM med_i
)
""",
)
def stats_siegel_repeated_medians(spark, sf_dir):
    """Siegel repeated-medians slope for the daily-revenue trend: the
    median over points of each point's median pairwise slope — 50%
    breakdown (vs Theil-Sen's 29%), the estimator that stands when a
    THIRD of the days are corrupted. Same scale shape as Theil-Sen:
    the pair frame is CALENDAR-bounded (<=2.4k x 2.4k at any SF), so
    both median layers run over bounded windows after the one
    fact-bounded daily aggregation. Slopes are 6-dp-rounded exact-cent
    ratios and both medians are exact LOWER order statistics (no
    interpolation), so the result hashes bit-for-bit cross-engine."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")["orders"]
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("xc")
    )
    a = daily.select(F.col("d").alias("di"), F.col("xc").alias("xi"))
    b = daily.select(F.col("d").alias("dj"), F.col("xc").alias("xj"))
    p = a.join(F.broadcast(b), F.col("dj") != F.col("di")).select(
        "di",
        "dj",
        F.round(
            (F.col("xj") - F.col("xi"))
            * 1.0
            / F.datediff(F.col("dj"), F.col("di")),
            6,
        ).alias("slope"),
    )
    wi = Window.partitionBy("di").orderBy("slope", "dj")
    med_i = (
        p.select(
            "di",
            "slope",
            F.row_number().over(wi).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("di")).alias("cnt"),
        )
        .filter(F.col("rn") == F.expr("(cnt + 1) div 2"))
        .select("di", F.col("slope").alias("mi"))
    )
    wg = Window.orderBy("mi", "di")
    return (
        med_i.select(
            "mi",
            "di",
            F.row_number().over(wg).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("cnt"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.max(
                F.when(
                    F.col("rn") == F.expr("(cnt + 1) div 2"), F.col("mi")
                )
            ).alias("slope_cents_per_day"),
        )
    )
