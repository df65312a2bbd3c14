"""Statistical-inference queries: effect sizes, survival, resampling,
sequential and exact tests, reliability, and matching estimators.

Split from stats_q.py (pure file move, registry names unchanged) when
that module passed 2,000 LoC; closed-form regression / correlation /
rank-test families stay in stats_q.py. Every query keeps its
integer-or-6dp-rounded output discipline so the DuckDB oracle hashes
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from station_data_ingestion_spark.queries.registry import load, query

@query(
    "stats_cohens_d_effect_size",
    """
WITH x AS (
  SELECT l_linestatus AS grp,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
),
m AS (
  SELECT grp, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(cents) AS HUGEINT) AS s,
         CAST(SUM(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS ss
  FROM x GROUP BY grp
),
w AS (
  SELECT MAX(CASE WHEN grp = 'O' THEN n END) AS n1,
         MAX(CASE WHEN grp = 'O' THEN s END) AS s1,
         MAX(CASE WHEN grp = 'O' THEN ss END) AS ss1,
         MAX(CASE WHEN grp = 'F' THEN n END) AS n2,
         MAX(CASE WHEN grp = 'F' THEN s END) AS s2,
         MAX(CASE WHEN grp = 'F' THEN ss END) AS ss2
  FROM m
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       ROUND((s1 * 1.0 / n1 - s2 * 1.0 / n2)
             / SQRT(((ss1 - s1 * 1.0 * s1 / n1)
                     + (ss2 - s2 * 1.0 * s2 / n2))
                    / (n1 + n2 - 2)), 6) AS cohens_d
FROM w
""",
    doc="Cohen's d standardized effect size (pooled SD) from exact "
    "integer moments — the magnitude companion to the Welch t-test.",
)
def stats_cohens_d_effect_size(spark, sf_dir):
    """COHEN'S D — the standardized effect size reviewers ask for next
    to every p-value: mean difference over the pooled standard
    deviation. Same exact HUGEINT/decimal moment pipeline as the
    t-test/ANOVA family (one map-side-combined pass, one fixed IEEE
    expression), so significance (stats_welch_ttest) and MAGNITUDE now
    both sit under the oracle."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    x = li.select(
        F.col("l_linestatus").alias("grp"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    m = x.groupBy("grp").agg(
        dec(F.count(F.lit(1))).alias("n"),
        dec(F.sum("cents")).alias("s"),
        F.sum(dec(F.col("cents")) * F.col("cents")).alias("ss"),
    )

    def cell(g, c):
        return F.max(F.when(F.col("grp") == g, F.col(c)))

    w = m.agg(
        cell("O", "n").alias("n1"),
        cell("O", "s").alias("s1"),
        cell("O", "ss").alias("ss1"),
        cell("F", "n").alias("n2"),
        cell("F", "s").alias("s2"),
        cell("F", "ss").alias("ss2"),
    )
    mean_diff = F.col("s1") * 1.0 / F.col("n1") - F.col("s2") * 1.0 / F.col(
        "n2"
    )
    pooled = (
        (F.col("ss1") - F.col("s1") * 1.0 * F.col("s1") / F.col("n1"))
        + (F.col("ss2") - F.col("s2") * 1.0 * F.col("s2") / F.col("n2"))
    ) / (F.col("n1") + F.col("n2") - 2)
    return w.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round(mean_diff / F.sqrt(pooled), 6).alias("cohens_d"),
    )


@query(
    "stats_kaplan_meier_survival",
    """
WITH signup AS (
  SELECT user_id, MIN(ts) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), conv AS (
  SELECT e.user_id, MIN(e.ts) AS tp
  FROM events e JOIN signup s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s.t0
  GROUP BY e.user_id
), last AS (
  SELECT user_id, MAX(ts) AS tl FROM events GROUP BY user_id
), subj AS (
  SELECT s.user_id,
         CASE WHEN c.tp IS NOT NULL
              THEN epoch_us(c.tp) - epoch_us(s.t0)
              ELSE epoch_us(l.tl) - epoch_us(s.t0) END // 3600000000
           AS dur_h,
         CASE WHEN c.tp IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM signup s
  JOIN last l ON l.user_id = s.user_id
  LEFT JOIN conv c ON c.user_id = s.user_id
), tot AS (
  SELECT COUNT(*) AS n_subjects FROM subj
), at_event AS (
  SELECT dur_h, COUNT(*) AS d FROM subj WHERE ev = 1 GROUP BY dur_h
), risk AS (
  SELECT a.dur_h, a.d,
         (SELECT COUNT(*) FROM subj WHERE subj.dur_h >= a.dur_h) AS n_risk
  FROM at_event a
), terms AS (
  SELECT dur_h, d, n_risk,
         CASE WHEN n_risk = d THEN 0 ELSE
           CAST(ROUND(ln((n_risk - d) * 1.0 / n_risk) * 1000000) AS BIGINT)
         END AS ln_micro,
         CASE WHEN n_risk = d THEN 1 ELSE 0 END AS zero_flag
  FROM risk
), km AS (
  SELECT dur_h, d, n_risk,
         SUM(ln_micro) OVER (ORDER BY dur_h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_micro,
         MAX(zero_flag) OVER (ORDER BY dur_h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hit_zero
  FROM terms
)
SELECT CAST(dur_h AS BIGINT) AS duration_hours,
       CAST(n_risk AS BIGINT) AS n_at_risk,
       CAST(d AS BIGINT) AS n_events,
       CASE WHEN hit_zero = 1 THEN 0.0
            ELSE ROUND(exp(cum_micro / 1000000.0), 6) END AS survival
FROM km
""",
)
def stats_kaplan_meier_survival(spark, sf_dir):
    """KAPLAN-MEIER survival estimate for time-to-first-purchase after
    signup, with right-censoring at each non-converting user's last
    observed event. The product-limit estimator is computed as
    exp(cumsum(ln((n-d)/n))) with each per-time hazard term quantized to
    integer micro-units BEFORE the cumulative sum — the running total is
    exact integer arithmetic, so accumulation order cannot perturb the
    curve (the registry float rule applied to a cumulative PRODUCT).
    n_at_risk comes from one descending prefix-sum over the event-time
    histogram, not a per-subject window: the heavy side (subjects) is
    aggregated to distinct event times first, so the window runs over a
    bounded post-agg series. [reference semantics: survival curves over
    station-observation gap durations]"""
    e = load(spark, sf_dir, "events")["events"]
    signup = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .join(signup, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    last = e.groupBy("user_id").agg(F.max("ts").alias("tl"))
    us = lambda c: F.unix_micros(F.col(c))  # noqa: E731
    subj = (
        signup.join(last, "user_id")
        .join(conv, "user_id", "left")
        .select(
            F.floor(
                F.when(F.col("tp").isNotNull(), us("tp") - us("t0"))
                .otherwise(us("tl") - us("t0"))
                / 3600000000
            ).alias("dur_h"),
            F.when(F.col("tp").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("ev"),
        )
    )
    # Histogram of ALL subject durations (events and censorings) so
    # n_at_risk is a suffix sum over distinct times, never a subject scan
    # per event time.
    hist = subj.groupBy("dur_h").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum("ev").alias("d"),
    )
    from station_data_ingestion_spark.operators.prefix_sum import (
        ordered_prefix_sum,
        ordered_prefix_sums,
    )

    risk = ordered_prefix_sum(
        hist.withColumn("neg_dur", -F.col("dur_h")),
        ["neg_dur"],
        F.col("n_all"),
        out_col="n_risk",
    ).filter(F.col("d") > 0)
    dead = F.col("n_risk") == F.col("d")
    terms = risk.select(
        "dur_h",
        "d",
        "n_risk",
        F.when(dead, F.lit(0))
        .otherwise(
            F.round(
                F.log(
                    (F.col("n_risk") - F.col("d")) * 1.0 / F.col("n_risk")
                )
                * 1000000
            ).cast("long")
        )
        .alias("ln_micro"),
        F.when(dead, F.lit(1)).otherwise(F.lit(0)).alias("zero_flag"),
    )
    km = ordered_prefix_sums(
        terms,
        ["dur_h"],
        {"cum_micro": F.col("ln_micro"), "hit_zero": F.col("zero_flag")},
    )
    return km.select(
        F.col("dur_h").cast("long").alias("duration_hours"),
        F.col("n_risk").cast("long").alias("n_at_risk"),
        F.col("d").cast("long").alias("n_events"),
        F.when(F.col("hit_zero") >= 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("cum_micro") / 1000000.0), 6))
        .alias("survival"),
    )


@query(
    "stats_isotonic_regression_pava",
    """
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY o_orderdate
), idx AS (
  SELECT d, y,
         ROW_NUMBER() OVER (ORDER BY d) AS rn,
         SUM(y) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ps
  FROM daily
), grid AS (
  SELECT k.rn AS k, j.rn AS j,
         (k.ps - j.ps + j.y) * 1.0 / (k.rn - j.rn + 1) AS avgjk
  FROM idx k JOIN idx j ON j.rn <= k.rn
), m AS (
  SELECT j, k,
         MIN(avgjk) OVER (PARTITION BY j ORDER BY k DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mmin
  FROM grid
), iso AS (
  SELECT k AS i, MAX(mmin) AS yhat_cents FROM m GROUP BY k
)
SELECT strftime(idx.d, '%Y-%m-%d') AS day,
       ROUND(idx.y / 100.0, 2) AS daily_revenue,
       ROUND(iso.yhat_cents / 100.0, 6) AS isotonic_fit
FROM iso JOIN idx ON idx.rn = iso.i
""",
)
def stats_isotonic_regression_pava(spark, sf_dir):
    """ISOTONIC REGRESSION (monotone non-decreasing least-squares fit) of
    daily revenue, via the closed-form minimax identity
    yhat_i = max_{j<=i} min_{k>=i} mean(y[j..k]) — the exact PAVA
    solution without PAVA's sequential pooling loop, so it distributes.
    The fact table collapses to one bounded post-agg series first; the
    (j,k) grid is generated JVM-side by explode(sequence(1, rn)) (no
    inequality join on the Spark side), interval means come from two
    prefix-sum lookups, the inner min is a per-j running suffix-min
    window over the grid (grid is |days|^2/2 rows — a function of the
    CALENDAR, not of fact cardinality, so it does not grow with SF),
    and the outer max is one groupBy. Interval means are exact-integer
    sums divided once, so every compared double is bit-identical across
    engines; min/max never accumulate error."""
    from station_data_ingestion_spark.operators.prefix_sum import (
        ordered_prefix_sums,
    )

    o = load(spark, sf_dir, "orders")["orders"]
    daily = o.groupBy("o_orderdate").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y")
    )
    # rn and ps share one total order -> one two-phase scan for both
    # (one shuffle + one totals collect instead of two of each)
    idx = ordered_prefix_sums(
        daily, ["o_orderdate"], {"rn": F.lit(1), "ps": F.col("y")}
    )
    grid = idx.select(
        F.col("rn").alias("k"),
        F.col("ps").alias("psk"),
        F.explode(F.sequence(F.lit(1), F.col("rn"))).alias("j"),
    )
    left = idx.select(
        F.col("rn").alias("j"),
        (F.col("ps") - F.col("y")).alias("psj1"),
    )
    avgjk = grid.join(left, "j").select(
        "j",
        "k",
        (
            (F.col("psk") - F.col("psj1")) * 1.0
            / (F.col("k") - F.col("j") + 1)
        ).alias("avgjk"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("j")
        .orderBy(F.col("k").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = avgjk.select("j", "k", F.min("avgjk").over(w).alias("mmin"))
    iso = m.groupBy(F.col("k").alias("i")).agg(
        F.max("mmin").alias("yhat_cents")
    )
    return iso.join(idx, F.col("i") == F.col("rn")).select(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        F.round(F.col("y") / 100.0, 2).alias("daily_revenue"),
        F.round(F.col("yhat_cents") / 100.0, 6).alias("isotonic_fit"),
    )


@query(
    "stats_bootstrap_subsample_ci",
    """
WITH base AS (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), reps AS (
  SELECT b.b, base.cents
  FROM base
  JOIN (SELECT UNNEST(RANGE(1, 65)) AS b) b
    ON substr(md5(CONCAT(CAST(o_orderkey AS VARCHAR), ':',
                         CAST(b.b AS VARCHAR))), 32, 1)
       IN ('0','2','4','6','8','a','c','e')
), means AS (
  SELECT b, SUM(cents) * 1.0 / COUNT(*) / 100.0 AS m
  FROM reps GROUP BY b
), ranked AS (
  SELECT m, ROW_NUMBER() OVER (ORDER BY m, b) AS rn FROM means
), pick AS (
  SELECT MAX(CASE WHEN rn = 2 THEN m END) AS lo,
         MAX(CASE WHEN rn = 63 THEN m END) AS hi
  FROM ranked
), full_mean AS (
  SELECT COUNT(*) AS n, SUM(cents) * 1.0 / COUNT(*) / 100.0 AS est
  FROM base
)
SELECT CAST(n AS BIGINT) AS n_orders, 64 AS n_replicates,
       ROUND(est, 6) AS mean_estimate,
       ROUND(lo, 6) AS ci_lo, ROUND(hi, 6) AS ci_hi
FROM full_mean, pick
""",
)
def stats_bootstrap_subsample_ci(spark, sf_dir):
    """BOOTSTRAP confidence interval for the mean order price by
    deterministic half-sampling: replicate b keeps row r iff the last
    hex nibble of md5(key:b) is even — a reproducible coin both engines
    flip identically, so the 'randomness' needs no RNG state and any
    executor can re-derive membership (the md5-derived-hyperplane trick
    from SRP-LSH applied to resampling). 64 replicates explode from a
    sequence literal (the 64x row blowup is the honest distributed cost
    of bootstrap — one wide scan, one groupBy(b), partial aggregation
    map-side). Replicate means are exact-integer cent sums divided once;
    the 2.5%/97.5% order statistics come from a rank over the bounded
    64-row post-agg frame via the distributed prefix-sum operator, never
    a window over raw rows."""
    from station_data_ingestion_spark.operators.prefix_sum import (
        ordered_prefix_sum,
    )

    o = load(spark, sf_dir, "orders")["orders"]
    base = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    reps = (
        base.select(
            "o_orderkey",
            "cents",
            F.explode(F.sequence(F.lit(1), F.lit(64))).alias("b"),
        )
        .filter(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("o_orderkey").cast("string"),
                        F.col("b").cast("string"),
                    )
                ),
                32,
                1,
            ).isin("0", "2", "4", "6", "8", "a", "c", "e")
        )
    )
    means = reps.groupBy("b").agg(
        (F.sum("cents") * 1.0 / F.count(F.lit(1)) / 100.0).alias("m")
    )
    ranked = ordered_prefix_sum(means, ["m", "b"], F.lit(1), out_col="rn")
    pick = ranked.agg(
        F.max(F.when(F.col("rn") == 2, F.col("m"))).alias("lo"),
        F.max(F.when(F.col("rn") == 63, F.col("m"))).alias("hi"),
    )
    full = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        (F.sum("cents") * 1.0 / F.count(F.lit(1)) / 100.0).alias("est"),
    )
    return full.join(pick).select(
        "n_orders",
        F.lit(64).alias("n_replicates"),
        F.round("est", 6).alias("mean_estimate"),
        F.round("lo", 6).alias("ci_lo"),
        F.round("hi", 6).alias("ci_hi"),
    )


@query(
    "stats_mcnemar_paired",
    """
WITH per_user AS (
  SELECT user_id,
         CASE WHEN COUNT(CASE WHEN event_type = 'click' THEN 1 END) >= 14
              THEN 1 ELSE 0 END AS clicked,
         CASE WHEN COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) >= 14
              THEN 1 ELSE 0 END AS bought
  FROM events GROUP BY user_id
), cells AS (
  SELECT
    CAST(SUM(CASE WHEN clicked = 1 AND bought = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
    CAST(SUM(CASE WHEN clicked = 1 AND bought = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
    CAST(SUM(CASE WHEN clicked = 0 AND bought = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
    CAST(SUM(CASE WHEN clicked = 0 AND bought = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM per_user
)
SELECT a, b, c, d,
       ROUND((b - c) * (b - c) * 1.0 / (b + c), 6) AS mcnemar_chi2,
       ROUND((abs(b - c) - 1) * (abs(b - c) - 1) * 1.0 / (b + c), 6)
         AS mcnemar_chi2_cc
FROM cells
""",
)
def stats_mcnemar_paired(spark, sf_dir):
    """McNEMAR'S TEST for paired binary outcomes (is a HEAVY clicker
    also a heavy buyer? thresholded per-user counts so the paired table
    is non-degenerate): the 2x2 paired table collapses per user in
    one aggregation, the statistic (b-c)^2/(b+c) — plus Edwards'
    continuity-corrected variant — is one fixed IEEE expression over
    exact integer cells. The discordant cells are the whole story;
    concordant users cancel out, which is why this beats a naive
    two-proportion test on paired data. Two aggregation passes total
    (per-user collapse, then cells), both map-side combined."""
    e = load(spark, sf_dir, "events")["events"]
    per_user = e.groupBy("user_id").agg(
        (
            F.count(F.when(F.col("event_type") == "click", 1)) >= 14
        ).cast("int").alias("clicked"),
        (
            F.count(F.when(F.col("event_type") == "purchase", 1)) >= 14
        ).cast("int").alias("bought"),
    )
    cells = per_user.agg(
        F.sum(
            F.when((F.col("clicked") == 1) & (F.col("bought") == 1), 1).otherwise(0)
        ).cast("long").alias("a"),
        F.sum(
            F.when((F.col("clicked") == 1) & (F.col("bought") == 0), 1).otherwise(0)
        ).cast("long").alias("b"),
        F.sum(
            F.when((F.col("clicked") == 0) & (F.col("bought") == 1), 1).otherwise(0)
        ).cast("long").alias("c"),
        F.sum(
            F.when((F.col("clicked") == 0) & (F.col("bought") == 0), 1).otherwise(0)
        ).cast("long").alias("d"),
    )
    bc = F.col("b") - F.col("c")
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        F.round(bc * bc * 1.0 / (F.col("b") + F.col("c")), 6).alias(
            "mcnemar_chi2"
        ),
        F.round(
            (F.abs(bc) - 1) * (F.abs(bc) - 1) * 1.0
            / (F.col("b") + F.col("c")),
            6,
        ).alias("mcnemar_chi2_cc"),
    )


@query(
    "stats_runs_test_randomness",
    """
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY o_orderdate
), med AS (
  SELECT CAST(ROUND(MEDIAN(y)) AS BIGINT) AS m FROM daily
), signs AS (
  SELECT d, CASE WHEN y > (SELECT m FROM med) THEN 1 ELSE 0 END AS s
  FROM daily WHERE y <> (SELECT m FROM med)
), lagged AS (
  SELECT s, LAG(s) OVER (ORDER BY d) AS prev FROM signs
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(s) AS BIGINT) AS n1,
         CAST(COUNT(*) - SUM(s) AS BIGINT) AS n2,
         CAST(1 + SUM(CASE WHEN prev IS NOT NULL AND s <> prev
                           THEN 1 ELSE 0 END) AS BIGINT) AS runs
  FROM lagged
)
SELECT n, n1, n2, runs,
       ROUND((runs - (2.0 * n1 * n2 / n + 1))
             / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n)
                    / (n * n * (n - 1))), 6) AS z
FROM agg
""",
)
def stats_runs_test_randomness(spark, sf_dir):
    """WALD-WOLFOWITZ RUNS TEST on daily revenue around its median:
    counts maximal above/below-median runs and standardizes against the
    random-ordering expectation — the classic check that a series'
    fluctuations are noise rather than regime-switching. The sign
    sequence lives on the bounded post-agg daily series (the lag window
    is calendar-bounded like the autocorrelation family); the median
    ties drop per the textbook construction; the z-score is one fixed
    IEEE expression over four exact integers."""
    from station_data_ingestion_spark.operators.prefix_sum import (
        ordered_prefix_sum,
    )

    o = load(spark, sf_dir, "orders")["orders"]
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("y")
    )
    med = daily.agg(
        F.round(F.expr("median(y)")).cast("long").alias("m")
    )
    signs = (
        daily.join(F.broadcast(med))
        .filter(F.col("y") != F.col("m"))
        .select(
            "d", F.when(F.col("y") > F.col("m"), 1).otherwise(0).alias("s")
        )
    )
    # boundary count via the prefix-sum operator: a run starts where the
    # sign differs from its predecessor — expressed as a self-join on
    # consecutive ranks, no global lag window over the series
    ranked = ordered_prefix_sum(signs, ["d"], F.lit(1), out_col="rn")
    prev = ranked.select((F.col("rn") + 1).alias("rn"), F.col("s").alias("prev"))
    lagged = ranked.join(prev, "rn", "left")
    agg = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("s").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("s")).cast("long").alias("n2"),
        (
            1
            + F.sum(
                F.when(
                    F.col("prev").isNotNull() & (F.col("s") != F.col("prev")),
                    1,
                ).otherwise(0)
            )
        )
        .cast("long")
        .alias("runs"),
    )
    n, n1, n2, runs = F.col("n"), F.col("n1"), F.col("n2"), F.col("runs")
    mu = 2.0 * n1 * n2 / n + 1
    var = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1))
    return agg.select(
        "n",
        "n1",
        "n2",
        "runs",
        F.round((runs - mu) / F.sqrt(var), 6).alias("z"),
    )


@query(
    "stats_cronbach_alpha",
    """
WITH items AS (
  SELECT CAST(ROUND(l_quantity * 100) AS BIGINT) AS x1,
         CAST(ROUND(l_extendedprice) AS BIGINT) AS x2,
         CAST(ROUND(l_discount * 10000) AS BIGINT) AS x3
  FROM lineitem
), m AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(x1) AS HUGEINT) AS s1, CAST(SUM(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS q1,
         CAST(SUM(x2) AS HUGEINT) AS s2, CAST(SUM(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS q2,
         CAST(SUM(x3) AS HUGEINT) AS s3, CAST(SUM(CAST(x3 AS HUGEINT) * x3) AS HUGEINT) AS q3,
         CAST(SUM(CAST(x1 + x2 + x3 AS HUGEINT) * (x1 + x2 + x3)) AS HUGEINT) AS qt,
         CAST(SUM(x1 + x2 + x3) AS HUGEINT) AS st
  FROM items
), v AS (
  SELECT n,
         (q1 - s1 * 1.0 * s1 / n) / (n - 1) AS v1,
         (q2 - s2 * 1.0 * s2 / n) / (n - 1) AS v2,
         (q3 - s3 * 1.0 * s3 / n) / (n - 1) AS v3,
         (qt - st * 1.0 * st / n) / (n - 1) AS vt
  FROM m
)
SELECT CAST(n AS BIGINT) AS n,
       ROUND(1.5 * (1 - (v1 + v2 + v3) / vt), 6) AS cronbach_alpha
FROM v
""",
)
def stats_cronbach_alpha(spark, sf_dir):
    """CRONBACH'S ALPHA internal-consistency reliability over three
    lineitem measures treated as scale items: alpha = k/(k-1) *
    (1 - sum(item variances)/variance(total)). One aggregation pass
    emits exact integer moments for each item AND their rowwise total
    (the total's square rides the same pass — no second scan), then one
    fixed IEEE expression. k=3 makes the leading factor exactly 1.5."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    items = li.select(
        F.round(F.col("l_quantity") * 100).cast("long").alias("x1"),
        F.round(F.col("l_extendedprice")).cast("long").alias("x2"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("x3"),
    ).withColumn("xt", F.col("x1") + F.col("x2") + F.col("x3"))
    m = items.agg(
        dec(F.count(F.lit(1))).alias("n"),
        dec(F.sum("x1")).alias("s1"),
        F.sum(dec(F.col("x1")) * F.col("x1")).alias("q1"),
        dec(F.sum("x2")).alias("s2"),
        F.sum(dec(F.col("x2")) * F.col("x2")).alias("q2"),
        dec(F.sum("x3")).alias("s3"),
        F.sum(dec(F.col("x3")) * F.col("x3")).alias("q3"),
        dec(F.sum("xt")).alias("st"),
        F.sum(dec(F.col("xt")) * F.col("xt")).alias("qt"),
    )
    var = lambda q, s: (  # noqa: E731
        F.col(q) - F.col(s) * 1.0 * F.col(s) / F.col("n")
    ) / (F.col("n") - 1)
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.round(
            1.5
            * (
                1
                - (var("q1", "s1") + var("q2", "s2") + var("q3", "s3"))
                / var("qt", "st")
            ),
            6,
        ).alias("cronbach_alpha"),
    )


@query(
    "agg_geo_harmonic_means",
    """
WITH x AS (
  SELECT o_orderstatus AS st,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), t AS (
  SELECT st,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(ln(cents) * 1000000) AS BIGINT)) AS BIGINT)
           AS lnsum_micro,
         CAST(SUM(CAST(ROUND(1000000000000.0 / cents) AS BIGINT)) AS BIGINT)
           AS recip_pico
  FROM x GROUP BY st
)
SELECT st,
       n,
       ROUND(exp(lnsum_micro * 1.0 / n / 1000000.0) / 100.0, 4)
         AS geometric_mean,
       ROUND(n * 1000000000000.0 / recip_pico / 100.0, 4)
         AS harmonic_mean
FROM t
""",
)
def agg_geo_harmonic_means(spark, sf_dir):
    """GEOMETRIC and HARMONIC means per order status — the two
    Pythagorean means plain AVG misrepresents (multiplicative growth;
    rates). Both reduce to associative integer sums under the registry
    float rule: per-row ln(x) quantized to micro-units (geometric) and
    per-row reciprocals quantized to pico-units (harmonic), each a
    single deterministic scalar op; the final exp/divide renders once
    per group. One aggregation pass, map-side combined."""
    o = load(spark, sf_dir, "orders")["orders"]
    x = o.select(
        F.col("o_orderstatus").alias("st"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    t = x.groupBy("st").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.round(F.log(F.col("cents").cast("double")) * 1000000).cast(
                "long"
            )
        )
        .cast("long")
        .alias("lnsum_micro"),
        F.sum(
            F.round(F.lit(1000000000000.0) / F.col("cents")).cast("long")
        )
        .cast("long")
        .alias("recip_pico"),
    )
    return t.select(
        "st",
        "n",
        F.round(
            F.exp(F.col("lnsum_micro") * 1.0 / F.col("n") / 1000000.0)
            / 100.0,
            4,
        ).alias("geometric_mean"),
        F.round(
            F.col("n") * 1000000000000.0 / F.col("recip_pico") / 100.0, 4
        ).alias("harmonic_mean"),
    )


@query(
    "stats_jarque_bera_normality",
    """
WITH m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(c AS HUGEINT)) AS DOUBLE) AS s1,
         CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE) AS s2,
         CAST(SUM(CAST(c AS HUGEINT) * c * c) AS DOUBLE) AS s3,
         CAST(SUM(CAST(c AS HUGEINT) * c * c * c) AS DOUBLE) AS s4
  FROM (SELECT CAST(ROUND(value * 100) AS BIGINT) AS c FROM events)
), mu AS (
  SELECT n, s1 / n AS mean, s2, s3, s4 FROM m
), cm AS (
  SELECT n,
         s2 / n - mean * mean AS m2,
         s3 / n - 3 * mean * (s2 / n) + 2 * mean * mean * mean AS m3,
         s4 / n - 4 * mean * (s3 / n) + 6 * mean * mean * (s2 / n)
           - 3 * mean * mean * mean * mean AS m4
  FROM mu
), sk AS (
  SELECT n, m3 / (m2 * sqrt(m2)) AS skew, m4 / (m2 * m2) AS kurt FROM cm
)
SELECT CAST(n AS BIGINT) AS n,
       ROUND(skew, 6) AS skewness,
       ROUND(kurt, 6) AS kurtosis,
       ROUND(n / 6 * (skew * skew + (kurt - 3) * (kurt - 3) / 4), 4)
         AS jb_stat
FROM sk
""",
)
def stats_jarque_bera_normality(spark, sf_dir):
    """Jarque-Bera normality test on event values: skewness and excess
    kurtosis from ONE aggregation pass of exact integer raw moments
    (cents, cents^2..^4 summed in decimal(38,0) — associative, so
    bit-identical under any partitioning), then a fixed driver-free
    double expression. sqrt(m2)*m2 replaces pow(m2,1.5) because IEEE
    sqrt is correctly rounded on both engines while libm pow is not.
    At 100 TB this stays one map-side-combined scan with a 5-number
    reduce — the same shape as the Welch/ANOVA family."""
    e = load(spark, sf_dir, "events")["events"]
    c = F.round(F.col("value") * 100).cast("long")
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    m = e.select(c.alias("c")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dec(F.sum("c")).cast("double").alias("s1"),
        F.sum(dec(F.col("c")) * F.col("c")).cast("double").alias("s2"),
        F.sum(dec(F.col("c")) * F.col("c") * F.col("c"))
        .cast("double")
        .alias("s3"),
        F.sum(dec(F.col("c")) * F.col("c") * F.col("c") * F.col("c"))
        .cast("double")
        .alias("s4"),
    )
    mu = m.select("n", (F.col("s1") / F.col("n")).alias("mean"), "s2", "s3", "s4")
    mean = F.col("mean")
    cm = mu.select(
        "n",
        (F.col("s2") / F.col("n") - mean * mean).alias("m2"),
        (
            F.col("s3") / F.col("n")
            - F.lit(3) * mean * (F.col("s2") / F.col("n"))
            + F.lit(2) * mean * mean * mean
        ).alias("m3"),
        (
            F.col("s4") / F.col("n")
            - F.lit(4) * mean * (F.col("s3") / F.col("n"))
            + F.lit(6) * mean * mean * (F.col("s2") / F.col("n"))
            - F.lit(3) * mean * mean * mean * mean
        ).alias("m4"),
    )
    sk = cm.select(
        "n",
        (F.col("m3") / (F.col("m2") * F.sqrt("m2"))).alias("skew"),
        (F.col("m4") / (F.col("m2") * F.col("m2"))).alias("kurt"),
    )
    return sk.select(
        F.col("n").cast("long").alias("n"),
        F.round(F.col("skew"), 6).alias("skewness"),
        F.round(F.col("kurt"), 6).alias("kurtosis"),
        F.round(
            F.col("n")
            / 6
            * (
                F.col("skew") * F.col("skew")
                + (F.col("kurt") - 3) * (F.col("kurt") - 3) / 4
            ),
            4,
        ).alias("jb_stat"),
    )


# SPRT constants, precomputed ONCE in Python and embedded as integer
# literals in both engines (no engine-side logs): H0 p=0.50 vs
# H1 p=0.58, alpha = beta = 0.05.
_SPRT_C1 = 148420  # round(ln(0.58/0.50) * 1e6)  per-success LLR
_SPRT_C0 = -174353  # round(ln(0.42/0.50) * 1e6)  per-failure LLR
_SPRT_A = 2944439  # round(ln((1-beta)/alpha) * 1e6)  accept-H1 bound
_SPRT_B = -2944439  # round(ln(beta/(1-alpha)) * 1e6)  accept-H0 bound

_SPRT_ORACLE = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS trials,
         CAST(COUNT(*) FILTER (WHERE value >= 40) AS BIGINT) AS succ
  FROM events WHERE event_type = 'view' GROUP BY 1
),
cum AS (
  SELECT d,
         SUM(trials) OVER (ORDER BY d) AS n,
         SUM(succ) OVER (ORDER BY d) AS s
  FROM daily
),
llr AS (
  SELECT d, n, s,
         s * {_SPRT_C1} + (n - s) * {_SPRT_C0} AS llr_micro,
         ROW_NUMBER() OVER (ORDER BY d DESC) AS from_end
  FROM cum
),
pick AS (
  SELECT *,
         CASE WHEN llr_micro >= {_SPRT_A} OR llr_micro <= {_SPRT_B}
              THEN 0 ELSE 1 END AS tag
  FROM llr
  WHERE llr_micro >= {_SPRT_A} OR llr_micro <= {_SPRT_B} OR from_end = 1
)
SELECT strftime(d, '%Y-%m-%d') AS decision_day,
       CASE WHEN llr_micro >= {_SPRT_A} THEN 'accept_h1'
            WHEN llr_micro <= {_SPRT_B} THEN 'accept_h0'
            ELSE 'continue' END AS verdict,
       CAST(n AS BIGINT) AS n_trials, CAST(s AS BIGINT) AS n_success,
       CAST(llr_micro AS BIGINT) AS llr_micro
FROM pick ORDER BY tag ASC, d ASC LIMIT 1
"""


@query(
    "stats_sprt_sequential_test",
    _SPRT_ORACLE,
    doc="Wald SPRT on daily view-conversion: integer micro-nat LLR "
    "random walk, first boundary crossing = early-stopping decision.",
)
def stats_sprt_sequential_test(spark, sf_dir):
    """Wald's Sequential Probability Ratio Test — the early-stopping
    A/B primitive: instead of a fixed-horizon test, the cumulative
    log-likelihood ratio walks until it exits [ln(beta/(1-alpha)),
    ln((1-beta)/alpha)] and the FIRST crossing day is the decision.
    Per-trial LLR terms are integer micro-nats precomputed in Python
    (no engine logs at all), so the walk is exact integer arithmetic:
    llr_n = s*c1 + (n-s)*c0. The cumulative window runs over the
    post-aggregation DAILY series (calendar-bounded), never the fact
    table; the fallback row (no crossing -> 'continue' at the last
    day) rides the same frame via a tag sort, keeping the output
    exactly one row."""
    e = load(spark, sf_dir, "events")["events"]
    daily = (
        e.where(F.col("event_type") == "view")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("trials"),
            F.count(F.when(F.col("value") >= 40, 1)).cast("long").alias("succ"),
        )
    )
    wc = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    we = Window.orderBy(F.col("d").desc())
    cum = daily.select(
        "d",
        F.sum("trials").over(wc).alias("n"),
        F.sum("succ").over(wc).alias("s"),
    ).withColumn("from_end", F.row_number().over(we))
    llr = cum.withColumn(
        "llr_micro",
        F.col("s") * _SPRT_C1 + (F.col("n") - F.col("s")) * _SPRT_C0,
    )
    crossed = (F.col("llr_micro") >= _SPRT_A) | (F.col("llr_micro") <= _SPRT_B)
    pick = llr.where(crossed | (F.col("from_end") == 1)).withColumn(
        "tag", F.when(crossed, F.lit(0)).otherwise(F.lit(1))
    )
    return (
        pick.select(
            F.date_format("d", "yyyy-MM-dd").alias("decision_day"),
            F.when(F.col("llr_micro") >= _SPRT_A, F.lit("accept_h1"))
            .when(F.col("llr_micro") <= _SPRT_B, F.lit("accept_h0"))
            .otherwise(F.lit("continue"))
            .alias("verdict"),
            F.col("n").cast("long").alias("n_trials"),
            F.col("s").cast("long").alias("n_success"),
            F.col("llr_micro").cast("long").alias("llr_micro"),
            "tag",
            "d",
        )
        .orderBy(F.col("tag").asc(), F.col("d").asc())
        .limit(1)
        .drop("tag", "d")
    )


_NEYMAN_K = 100

_NEYMAN_ORACLE = f"""
WITH m AS (
  SELECT o_orderpriority AS stratum,
         CAST(COUNT(*) AS BIGINT) AS n_h,
         CAST(SUM(CAST(c AS HUGEINT)) AS DOUBLE) AS s1,
         CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE) AS s2
  FROM (SELECT o_orderpriority,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
        FROM orders)
  GROUP BY 1
),
wgt AS (
  SELECT stratum, n_h,
         n_h * sqrt((s2 - s1 * s1 / n_h) / (n_h - 1)) AS w
  FROM m
),
alloc AS (
  SELECT stratum, n_h,
         GREATEST(CAST(1 AS BIGINT),
                  CAST(ROUND({_NEYMAN_K} * w / (SELECT SUM(w) FROM wgt))
                       AS BIGINT)) AS k_h
  FROM wgt
),
ranked AS (
  SELECT o_orderpriority AS stratum, o_orderkey,
         ROW_NUMBER() OVER (
           PARTITION BY o_orderpriority
           ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rk
  FROM orders
)
SELECT r.stratum, a.k_h AS k_alloc, r.o_orderkey, r.rk
FROM ranked r JOIN alloc a ON r.stratum = a.stratum
WHERE r.rk <= a.k_h
"""


@query(
    "sample_neyman_allocation",
    _NEYMAN_ORACLE,
    doc="Neyman-optimal stratified sampling: allocate 100 draws "
    "proportional to N_h * S_h, then deterministic md5 bottom-k per "
    "stratum.",
)
def sample_neyman_allocation(spark, sf_dir):
    """Neyman (optimal) allocation for stratified sampling: a first
    variance pass computes each stratum's N_h and standard deviation
    S_h from exact integer moments, the budget of 100 draws is
    allocated proportional to N_h*S_h (the allocation that minimizes
    the stratified-mean variance; floor of 1 per stratum), and a
    second pass takes each stratum's k_h lowest-md5 rows — the
    family's seedless repartition-stable draw. Two scans total: one
    map-side-combined moment aggregation, one per-stratum top-k window
    (rank pushdown keeps k rows per partition before the merge). The
    tiny allocation table broadcasts onto the ranked stream. S_h uses
    IEEE sqrt over exact integer sums — correctly rounded, so both
    engines allocate identically."""
    o = load(spark, sf_dir, "orders")["orders"]
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    m = (
        o.select(F.col("o_orderpriority").alias("stratum"), cents.alias("c"))
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_h"),
            dec(F.sum("c")).cast("double").alias("s1"),
            F.sum(dec(F.col("c")) * F.col("c")).cast("double").alias("s2"),
        )
    )
    wgt = m.select(
        "stratum",
        "n_h",
        (
            F.col("n_h")
            * F.sqrt(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_h"))
                / (F.col("n_h") - 1)
            )
        ).alias("w"),
    )
    tot = wgt.agg(F.sum("w").alias("tw"))
    alloc = wgt.crossJoin(F.broadcast(tot)).select(
        "stratum",
        F.greatest(
            F.lit(1).cast("long"),
            F.round(F.lit(_NEYMAN_K) * F.col("w") / F.col("tw")).cast("long"),
        ).alias("k_alloc"),
    )
    w = Window.partitionBy("stratum").orderBy(
        F.md5(F.col("o_orderkey").cast("string")), F.col("o_orderkey")
    )
    ranked = o.select(
        F.col("o_orderpriority").alias("stratum"), "o_orderkey"
    ).withColumn("rk", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(alloc), "stratum")
        .where(F.col("rk") <= F.col("k_alloc"))
        .select("stratum", "k_alloc", "o_orderkey", "rk")
    )


_PCORR_ORACLE = """
WITH q AS (
  SELECT CAST(ROUND(l_quantity) AS BIGINT) AS x,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS z
  FROM lineitem
),
m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
         CAST(SUM(CAST(z AS HUGEINT)) AS DOUBLE) AS sz,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
         CAST(SUM(CAST(z AS HUGEINT) * z) AS DOUBLE) AS szz,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x AS HUGEINT) * z) AS DOUBLE) AS sxz,
         CAST(SUM(CAST(y AS HUGEINT) * z) AS DOUBLE) AS syz
  FROM q
),
r AS (
  SELECT n,
         (n * sxy - sx * sy)
           / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS rxy,
         (n * sxz - sx * sz)
           / sqrt((n * sxx - sx * sx) * (n * szz - sz * sz)) AS rxz,
         (n * syz - sy * sz)
           / sqrt((n * syy - sy * sy) * (n * szz - sz * sz)) AS ryz
  FROM m
)
SELECT CAST(n AS BIGINT) AS n,
       ROUND(rxy, 6) AS r_xy, ROUND(rxz, 6) AS r_xz,
       ROUND(ryz, 6) AS r_yz,
       ROUND((rxy - rxz * ryz)
             / sqrt((1 - rxz * rxz) * (1 - ryz * ryz)), 6) AS r_xy_given_z
FROM r
"""


@query(
    "stats_partial_correlation",
    _PCORR_ORACLE,
    doc="First-order partial correlation r_xy.z (quantity~price "
    "controlling for discount) from one pass of exact integer moments.",
)
def stats_partial_correlation(spark, sf_dir):
    """Partial correlation — the dependence between quantity and
    extended price once discount is CONTROLLED FOR:
    r_xy.z = (r_xy - r_xz r_yz) / sqrt((1-r_xz^2)(1-r_yz^2)). One
    aggregation pass of nine exact integer raw moments (associative,
    partition-independent), then a fixed IEEE expression — same family
    as the correlation matrix, extended to the confounder-adjusted
    coefficient every observational analysis actually needs."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    q = li.select(
        F.round("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        F.round(F.col("l_discount") * 100).cast("long").alias("z"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = q.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec("x")).cast("double").alias("sx"),
        F.sum(dec("y")).cast("double").alias("sy"),
        F.sum(dec("z")).cast("double").alias("sz"),
        F.sum(dec("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(dec("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(dec("z") * F.col("z")).cast("double").alias("szz"),
        F.sum(dec("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(dec("x") * F.col("z")).cast("double").alias("sxz"),
        F.sum(dec("y") * F.col("z")).cast("double").alias("syz"),
    )
    corr = lambda sab, sa, sb, saa, sbb: (  # noqa: E731
        (F.col("n") * F.col(sab) - F.col(sa) * F.col(sb))
        / F.sqrt(
            (F.col("n") * F.col(saa) - F.col(sa) * F.col(sa))
            * (F.col("n") * F.col(sbb) - F.col(sb) * F.col(sb))
        )
    )
    r = m.select(
        "n",
        corr("sxy", "sx", "sy", "sxx", "syy").alias("rxy"),
        corr("sxz", "sx", "sz", "sxx", "szz").alias("rxz"),
        corr("syz", "sy", "sz", "syy", "szz").alias("ryz"),
    )
    return r.select(
        F.col("n").cast("long").alias("n"),
        F.round("rxy", 6).alias("r_xy"),
        F.round("rxz", 6).alias("r_xz"),
        F.round("ryz", 6).alias("r_yz"),
        F.round(
            (F.col("rxy") - F.col("rxz") * F.col("ryz"))
            / F.sqrt(
                (1 - F.col("rxz") * F.col("rxz"))
                * (1 - F.col("ryz") * F.col("ryz"))
            ),
            6,
        ).alias("r_xy_given_z"),
    )


_KAPPA_ORACLE = """
WITH lab AS (
  SELECT CASE WHEN value >= 40 THEN 1 ELSE 0 END AS a,
         CASE WHEN event_type IN ('purchase', 'click') THEN 1 ELSE 0 END
           AS b
  FROM events
),
cells AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (WHERE a = 1 AND b = 1) AS BIGINT) AS n11,
         CAST(COUNT(*) FILTER (WHERE a = 1 AND b = 0) AS BIGINT) AS n10,
         CAST(COUNT(*) FILTER (WHERE a = 0 AND b = 1) AS BIGINT) AS n01,
         CAST(COUNT(*) FILTER (WHERE a = 0 AND b = 0) AS BIGINT) AS n00
  FROM lab
)
SELECT n, n11, n10, n01, n00,
       ROUND((1.0 * n * (n11 + n00) - (1.0 * (n11 + n10) * (n11 + n01)
              + 1.0 * (n01 + n00) * (n10 + n00)))
             / (1.0 * n * n - (1.0 * (n11 + n10) * (n11 + n01)
                + 1.0 * (n01 + n00) * (n10 + n00))), 6) AS kappa
FROM cells
"""


@query(
    "stats_cohens_kappa",
    _KAPPA_ORACLE,
    doc="Cohen's kappa agreement between two derived binary raters "
    "from one exact contingency pass.",
)
def stats_cohens_kappa(spark, sf_dir):
    """Cohen's kappa — chance-corrected agreement between two raters
    (here: two derived binary labelings of the same events; in a
    training-data pipeline, two annotators or a model vs. gold).
    kappa = (p_o - p_e) / (1 - p_e) computed from the four exact
    contingency cells of ONE aggregation pass, algebraically cleared
    of denominators so the only division is the final one (fixed IEEE
    over exact integers, rounded). Complements McNemar (which tests
    marginal DISAGREEMENT) with the agreement coefficient itself."""
    e = load(spark, sf_dir, "events")["events"]
    lab = e.select(
        F.when(F.col("value") >= 40, 1).otherwise(0).alias("a"),
        F.when(F.col("event_type").isin("purchase", "click"), 1)
        .otherwise(0)
        .alias("b"),
    )
    c = lab.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.when((F.col("a") == 1) & (F.col("b") == 1), 1))
        .cast("long")
        .alias("n11"),
        F.count(F.when((F.col("a") == 1) & (F.col("b") == 0), 1))
        .cast("long")
        .alias("n10"),
        F.count(F.when((F.col("a") == 0) & (F.col("b") == 1), 1))
        .cast("long")
        .alias("n01"),
        F.count(F.when((F.col("a") == 0) & (F.col("b") == 0), 1))
        .cast("long")
        .alias("n00"),
    )
    pe_num = (
        1.0 * (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01"))
        + 1.0 * (F.col("n01") + F.col("n00")) * (F.col("n10") + F.col("n00"))
    )
    return c.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(
            (1.0 * F.col("n") * (F.col("n11") + F.col("n00")) - pe_num)
            / (1.0 * F.col("n") * F.col("n") - pe_num),
            6,
        ).alias("kappa"),
    )


_GRANGER_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS y,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM orders GROUP BY 1
),
lagged AS (
  SELECT y, LAG(y) OVER (ORDER BY d) AS yl, LAG(x) OVER (ORDER BY d) AS xl
  FROM daily
),
p AS (SELECT y, yl, xl FROM lagged WHERE yl IS NOT NULL),
m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
         CAST(SUM(CAST(yl AS HUGEINT)) AS DOUBLE) AS s1,
         CAST(SUM(CAST(xl AS HUGEINT)) AS DOUBLE) AS s2,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
         CAST(SUM(CAST(yl AS HUGEINT) * yl) AS DOUBLE) AS s11,
         CAST(SUM(CAST(xl AS HUGEINT) * xl) AS DOUBLE) AS s22,
         CAST(SUM(CAST(yl AS HUGEINT) * xl) AS DOUBLE) AS s12,
         CAST(SUM(CAST(y AS HUGEINT) * yl) AS DOUBLE) AS sy1,
         CAST(SUM(CAST(y AS HUGEINT) * xl) AS DOUBLE) AS sy2
  FROM p
),
c AS (
  SELECT n,
         syy - sy * sy / n AS tss,
         s11 - s1 * s1 / n AS a11,
         s22 - s2 * s2 / n AS a22,
         s12 - s1 * s2 / n AS a12,
         sy1 - sy * s1 / n AS b1,
         sy2 - sy * s2 / n AS b2
  FROM m
),
fit AS (
  SELECT n, tss,
         b1 * b1 / a11 AS ess_r,
         (a22 * b1 * b1 - 2 * a12 * b1 * b2 + a11 * b2 * b2)
           / (a11 * a22 - a12 * a12) AS ess_f
  FROM c
)
SELECT CAST(n AS BIGINT) AS n_days,
       ROUND(ess_r / tss, 6) AS r2_restricted,
       ROUND(ess_f / tss, 6) AS r2_full,
       ROUND((ess_f - ess_r) / (tss - ess_f) * (n - 3), 6) AS f_stat
FROM fit
"""


@query(
    "ts_granger_lite_orders",
    _GRANGER_ORACLE,
    doc="Granger-style lag-1 test: does yesterday's order COUNT "
    "explain today's revenue beyond yesterday's revenue? Closed-form "
    "two-regressor OLS from exact moments, F statistic.",
)
def ts_granger_lite_orders(spark, sf_dir):
    """Granger-causality (lite, lag-1): regress today's revenue on
    yesterday's revenue alone (restricted) and on yesterday's revenue
    + yesterday's ORDER COUNT (full); the F statistic on the explained
    sum-of-squares gain says whether the count series carries
    predictive information beyond revenue's own history — the standard
    lead-indicator screen. Both fits are CLOSED FORM from one pass of
    exact integer cross-moments over the lagged daily series (2x2
    normal equations expanded by Cramer's rule — no iteration, no
    matrix library), so the only doubles are the final fixed
    expressions. Windows run over the calendar-bounded post-agg
    series."""
    o = load(spark, sf_dir, "orders")["orders"]
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y"),
        F.count(F.lit(1)).cast("long").alias("x"),
    )
    wd = Window.orderBy("d")
    p = (
        daily.select(
            "y",
            F.lag("y").over(wd).alias("yl"),
            F.lag("x").over(wd).alias("xl"),
        )
        .where(F.col("yl").isNotNull())
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = p.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec("y")).cast("double").alias("sy"),
        F.sum(dec("yl")).cast("double").alias("s1"),
        F.sum(dec("xl")).cast("double").alias("s2"),
        F.sum(dec("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(dec("yl") * F.col("yl")).cast("double").alias("s11"),
        F.sum(dec("xl") * F.col("xl")).cast("double").alias("s22"),
        F.sum(dec("yl") * F.col("xl")).cast("double").alias("s12"),
        F.sum(dec("y") * F.col("yl")).cast("double").alias("sy1"),
        F.sum(dec("y") * F.col("xl")).cast("double").alias("sy2"),
    )
    c = m.select(
        "n",
        (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")).alias("tss"),
        (F.col("s11") - F.col("s1") * F.col("s1") / F.col("n")).alias("a11"),
        (F.col("s22") - F.col("s2") * F.col("s2") / F.col("n")).alias("a22"),
        (F.col("s12") - F.col("s1") * F.col("s2") / F.col("n")).alias("a12"),
        (F.col("sy1") - F.col("sy") * F.col("s1") / F.col("n")).alias("b1"),
        (F.col("sy2") - F.col("sy") * F.col("s2") / F.col("n")).alias("b2"),
    )
    fit = c.select(
        "n",
        "tss",
        (F.col("b1") * F.col("b1") / F.col("a11")).alias("ess_r"),
        (
            (
                F.col("a22") * F.col("b1") * F.col("b1")
                - 2 * F.col("a12") * F.col("b1") * F.col("b2")
                + F.col("a11") * F.col("b2") * F.col("b2")
            )
            / (F.col("a11") * F.col("a22") - F.col("a12") * F.col("a12"))
        ).alias("ess_f"),
    )
    return fit.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(F.col("ess_r") / F.col("tss"), 6).alias("r2_restricted"),
        F.round(F.col("ess_f") / F.col("tss"), 6).alias("r2_full"),
        F.round(
            (F.col("ess_f") - F.col("ess_r"))
            / (F.col("tss") - F.col("ess_f"))
            * (F.col("n") - 3),
            6,
        ).alias("f_stat"),
    )


_CAPTURE_ORACLE = """
WITH s1 AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
),
s2 AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
),
cells AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n1,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n2,
         (SELECT CAST(COUNT(*) AS BIGINT)
          FROM s1 JOIN s2 USING (user_id)) AS m
)
SELECT n1, n2, m,
       CAST(((n1 + 1) * (n2 + 1)) // (m + 1) - 1 AS BIGINT)
         AS chapman_estimate,
       (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events)
         AS true_population
FROM cells
"""


@query(
    "stats_capture_recapture",
    _CAPTURE_ORACLE,
    doc="Chapman capture-recapture population estimate from two "
    "event-type capture occasions, vs the true distinct count.",
)
def stats_capture_recapture(spark, sf_dir):
    """CAPTURE-RECAPTURE population estimation (Chapman's
    bias-corrected Lincoln-Petersen): treat two event types as capture
    occasions; users seen in both are the recaptures, and
    N = (n1+1)(n2+1)/(m+1) - 1 estimates the total population — the
    classical trick for estimating the size of a set you can only
    sample (dedup-cluster counts, crawl frontier size, error classes).
    INTEGER division keeps the estimate engine-exact; the true
    distinct count rides along so the gate also audits the estimator's
    bias on this corpus. Plan: two distinct-sets (map-side partial
    distinct), one semi-overlap count on user_id, zero windows."""
    e = load(spark, sf_dir, "events")["events"]
    s1 = e.where(F.col("event_type") == "click").select("user_id").distinct()
    s2 = e.where(F.col("event_type") == "view").select("user_id").distinct()
    n1 = s1.count()
    n2 = s2.count()
    m = s1.join(s2, "user_id").count()
    true_pop = e.select("user_id").distinct().count()
    est = ((n1 + 1) * (n2 + 1)) // (m + 1) - 1
    return spark.createDataFrame(
        [(n1, n2, m, est, true_pop)],
        "n1 long, n2 long, m long, chapman_estimate long, "
        "true_population long",
    )


_JACK_ORACLE = """
WITH x AS (
  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y,
         CAST(ROUND(l_quantity) AS BIGINT) AS x
  FROM lineitem
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(y AS HUGEINT)) AS BIGINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT)) AS BIGINT) AS sx
  FROM x
),
loo AS (
  SELECT t.n,
         CAST(ROUND((t.sy - x.y) * 1000000000.0 / (t.sx - x.x))
              AS BIGINT) AS r_nano
  FROM x CROSS JOIN tot t
),
agg AS (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(CAST(r_nano AS HUGEINT)) AS DOUBLE) AS s1,
         CAST(SUM(CAST(r_nano AS HUGEINT) * r_nano) AS DOUBLE) AS s2
  FROM loo GROUP BY n
)
SELECT n,
       ROUND((SELECT sy * 1.0 / sx FROM tot), 9) AS ratio,
       ROUND(sqrt((n - 1.0) / n * (s2 - s1 * s1 / n)) / 1000000000.0, 9)
         AS jackknife_se
FROM agg
"""


@query(
    "stats_jackknife_ratio_se",
    _JACK_ORACLE,
    doc="Jackknife standard error of the revenue/quantity ratio "
    "estimator: leave-one-out ratios quantized to nano units, one "
    "variance pass.",
)
def stats_jackknife_ratio_se(spark, sf_dir):
    """JACKKNIFE variance for a NONLINEAR estimator (the ratio
    price-per-unit = sum(price)/sum(quantity), whose variance no
    closed form covers): each row's leave-one-out ratio
    R_i = (S_y - y_i)/(S_x - x_i) comes from broadcasting the two
    totals back over the scan — the inclusion-exclusion trick that
    makes all n replicates ONE pass instead of n. Every R_i is the
    same IEEE division on both engines, quantized to integer nano
    units BEFORE the variance aggregation (associative), so the
    jackknife SE sqrt((n-1)/n * sum((R_i - Rbar)^2)) is
    engine-exact. Deterministic resampling inference without any
    randomness — complements the md5-seeded bootstrap."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    x = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        F.round("l_quantity").cast("long").alias("x"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    tot = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec("y")).cast("long").alias("sy"),
        F.sum(dec("x")).cast("long").alias("sx"),
    )
    loo = x.crossJoin(F.broadcast(tot)).select(
        "n",
        F.round(
            (F.col("sy") - F.col("y"))
            * 1000000000.0
            / (F.col("sx") - F.col("x"))
        )
        .cast("long")
        .alias("r_nano"),
        "sy",
        "sx",
    )
    agg = loo.groupBy("n", "sy", "sx").agg(
        F.sum(dec("r_nano")).cast("double").alias("s1"),
        F.sum(dec("r_nano") * F.col("r_nano")).cast("double").alias("s2"),
    )
    return agg.select(
        "n",
        F.round(F.col("sy") * 1.0 / F.col("sx"), 9).alias("ratio"),
        F.round(
            F.sqrt(
                (F.col("n") - 1.0)
                / F.col("n")
                * (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            )
            / 1000000000.0,
            9,
        ).alias("jackknife_se"),
    )


_WILCOXON_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(SUM(CASE WHEN event_type = 'click'
                       THEN CAST(ROUND(value * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN event_type = 'view'
                       THEN CAST(ROUND(value * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS b
  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1
),
diffs AS (
  SELECT a - b AS dv, ABS(a - b) AS ad FROM daily WHERE a <> b
),
cells AS (
  SELECT ad, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(COUNT(*) FILTER (WHERE dv > 0) AS BIGINT) AS pos
  FROM diffs GROUP BY ad
),
cum AS (
  SELECT ad, cnt, pos, SUM(cnt) OVER (ORDER BY ad) AS cum_n FROM cells
),
w AS (
  SELECT CAST(SUM(pos * (2 * (cum_n - cnt) + cnt + 1)) AS BIGINT) AS w2,
         CAST(SUM(cnt) AS BIGINT) AS n
  FROM cum
)
SELECT n, CAST(w2 AS BIGINT) AS w_plus_x2,
       ROUND((w2 - n * (n + 1) / 2.0 * 1.0)
             / sqrt(n * (n + 1) * (2 * n + 1) / 6.0 * 1.0), 6) AS z
FROM w
"""


@query(
    "stats_wilcoxon_signed_rank",
    _WILCOXON_ORACLE,
    doc="Wilcoxon signed-rank test on paired daily click vs view "
    "totals: doubled tie-corrected ranks keep W+ an exact integer.",
)
def stats_wilcoxon_signed_rank(spark, sf_dir):
    """Wilcoxon SIGNED-RANK test — the paired nonparametric twin of
    Mann-Whitney (which this registry already ships for the unpaired
    case): daily click and view cent totals pair by day, zero
    differences drop (Wilcoxon's rule), |d| ranks come from the value
    histogram with tie-corrected average ranks DOUBLED so W+ stays an
    exact integer (same identity as ml_roc_auc_exact), and the normal
    approximation z = (W+ - n(n+1)/4)/sqrt(n(n+1)(2n+1)/24) is the
    fixed final double (expressed with doubled W to clear the /4). The
    ranking runs over the post-aggregation daily-difference histogram,
    calendar-bounded."""
    e = load(spark, sf_dir, "events")["events"]
    cents = F.round(F.col("value") * 100).cast("long")
    daily = (
        e.where(F.col("event_type").isin("click", "view"))
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", cents).otherwise(0)
            ).alias("a"),
            F.sum(
                F.when(F.col("event_type") == "view", cents).otherwise(0)
            ).alias("b"),
        )
    )
    diffs = daily.where(F.col("a") != F.col("b")).select(
        (F.col("a") - F.col("b")).alias("dv"),
        F.abs(F.col("a") - F.col("b")).alias("ad"),
    )
    cells = diffs.groupBy("ad").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count(F.when(F.col("dv") > 0, 1)).alias("pos"),
    )
    wc = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select(
        "ad", "cnt", "pos", F.sum("cnt").over(wc).alias("cum_n")
    )
    w = cum.agg(
        F.sum(
            F.col("pos")
            * (2 * (F.col("cum_n") - F.col("cnt")) + F.col("cnt") + 1)
        )
        .cast("long")
        .alias("w2"),
        F.sum("cnt").cast("long").alias("n"),
    )
    return w.select(
        "n",
        F.col("w2").alias("w_plus_x2"),
        F.round(
            (F.col("w2") - F.col("n") * (F.col("n") + 1) / 2.0 * 1.0)
            / F.sqrt(
                F.col("n")
                * (F.col("n") + 1)
                * (2 * F.col("n") + 1)
                / 6.0
                * 1.0
            ),
            6,
        ).alias("z"),
    )


_CEM_ORACLE = """
WITH users AS (
  SELECT user_id,
         CAST(CASE WHEN COUNT(*) FILTER (WHERE event_type = 'signup') >= 14
              THEN 1 ELSE 0 END AS BIGINT) AS t,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(ROUND(value * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y,
         CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS x
  FROM events GROUP BY user_id
),
b AS (SELECT t, y, x // 5 AS bucket FROM users),
cells AS (
  SELECT bucket,
         CAST(SUM(t) AS BIGINT) AS nt,
         CAST(COUNT(*) - SUM(t) AS BIGINT) AS nc,
         CAST(SUM(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT) AS syt,
         CAST(SUM(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT) AS syc
  FROM b GROUP BY bucket
),
matched AS (
  SELECT bucket, nt, nc, syt, syc,
         CAST(ROUND(nt * (syt * 1.0 * nc - syc * 1.0 * nt)
                    * 1000000.0 / (nt * 1.0 * nc)) AS BIGINT)
           AS term_micro
  FROM cells WHERE nt > 0 AND nc > 0
),
naive AS (
  SELECT SUM(CASE WHEN t = 1 THEN y ELSE 0 END) * 1.0 / SUM(t)
           - SUM(CASE WHEN t = 0 THEN y ELSE 0 END) * 1.0
             / (COUNT(*) - SUM(t)) AS nd
  FROM users
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_matched_buckets,
       CAST(SUM(nt) AS BIGINT) AS n_treated_matched,
       ROUND(SUM(term_micro) / 1000000.0 / SUM(nt), 4) AS att_cents,
       (SELECT ROUND(nd, 4) FROM naive) AS naive_diff_cents
FROM matched
"""


@query(
    "stats_cem_att",
    _CEM_ORACLE,
    doc="Coarsened exact matching: treated/control balanced within "
    "coarsened-covariate buckets, treated-weighted ATT vs the naive "
    "difference.",
)
def stats_cem_att(spark, sf_dir):
    """COARSENED EXACT MATCHING (Iacus-King-Porro) — the causal
    estimate the naive group difference gets wrong when treatment
    correlates with activity: users coarsen into covariate buckets
    (view count div 5), buckets containing BOTH treated (heavy
    signup activity, >= 14 events — nearly every user has SOME signup
    in this corpus, so presence alone has no control group)
    and control users contribute their within-bucket outcome gap
    weighted by treated count, and ATT = the treated-weighted mean of
    those gaps. Each bucket's gap is one exact rational
    (syt*nc - syc*nt)/(nt*nc) quantized to micro-cents BEFORE the
    cross-bucket sum (engine-identical; a raw double sum would be
    accumulation-order-dependent), and the naive unmatched difference
    rides along to show the adjustment. Completes the causal family
    (diff-in-diff, CUPED) with matching. One user aggregation, one
    bucket aggregation — both map-side combined."""
    e = load(spark, sf_dir, "events")["events"]
    cents = F.round(F.col("value") * 100).cast("long")
    users = e.groupBy("user_id").agg(
        F.when(
            F.count(F.when(F.col("event_type") == "signup", 1)) >= 14, 1
        )
        .otherwise(0)
        .cast("long")
        .alias("t"),
        F.sum(
            F.when(F.col("event_type") == "purchase", cents).otherwise(0)
        )
        .cast("long")
        .alias("y"),
        F.count(F.when(F.col("event_type") == "view", 1))
        .cast("long")
        .alias("x"),
    )
    b = users.select("t", "y", F.expr("x div 5").alias("bucket"))
    cells = b.groupBy("bucket").agg(
        F.sum("t").cast("long").alias("nt"),
        (F.count(F.lit(1)) - F.sum("t")).cast("long").alias("nc"),
        F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("syt"),
        F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("syc"),
    )
    matched = cells.where((F.col("nt") > 0) & (F.col("nc") > 0)).withColumn(
        "term_micro",
        F.round(
            F.col("nt")
            * (F.col("syt") * 1.0 * F.col("nc") - F.col("syc") * 1.0 * F.col("nt"))
            * 1000000.0
            / (F.col("nt") * 1.0 * F.col("nc"))
        ).cast("long"),
    )
    naive = users.agg(
        (
            F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0))
            * 1.0
            / F.sum("t")
            - F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0))
            * 1.0
            / (F.count(F.lit(1)) - F.sum("t"))
        ).alias("nd")
    )
    return (
        matched.agg(
            F.count(F.lit(1)).cast("long").alias("n_matched_buckets"),
            F.sum("nt").cast("long").alias("n_treated_matched"),
            F.round(
                F.sum("term_micro") / 1000000.0 / F.sum("nt"), 4
            ).alias("att_cents"),
        )
        .crossJoin(F.broadcast(naive))
        .select(
            "n_matched_buckets",
            "n_treated_matched",
            "att_cents",
            F.round(F.col("nd"), 4).alias("naive_diff_cents"),
        )
    )

