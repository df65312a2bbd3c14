"""Declarative data-quality EXPECTATIONS: a rule suite evaluated in ONE
aggregation pass over the table (Great-Expectations-style contracts,
Delta Live Tables constraint reports).

Every scalar rule compiles to a conditional-count aggregate expression,
so the whole suite rides a single scan + single (partial-aggregated)
reduce regardless of how many rules it holds; uniqueness rules add
count_distinct columns to the SAME aggregate. No rule is ever a separate
job. [reference semantics: the ingestion pipeline's nodata/sentinel/
strict-cast validations (src/modules/ingestion_handler.py) generalized
to a user-declared contract]
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_KINDS = ("not_null", "unique", "in_set", "range", "regex", "custom")


def _violation_expr(df: DataFrame, rule: dict) -> Column:
    """Boolean column: TRUE where the row VIOLATES the rule. NULL values
    violate only not_null (SQL CHECK semantics: unknown passes)."""
    kind, col = rule["kind"], rule.get("col")
    if kind == "not_null":
        return F.col(col).isNull()
    if kind == "in_set":
        ok = F.col(col).isin(*rule["values"])
        return ~F.coalesce(ok, F.lit(True))
    if kind == "range":
        c = F.col(col)
        ok = F.lit(True)
        if "lo" in rule:
            ok = ok & (c >= F.lit(rule["lo"]))
        if "hi" in rule:
            ok = ok & (c <= F.lit(rule["hi"]))
        return ~F.coalesce(ok, F.lit(True))
    if kind == "regex":
        ok = F.col(col).rlike(rule["pattern"])
        return ~F.coalesce(ok, F.lit(True))
    if kind == "custom":
        ok = F.expr(rule["expr"])
        return ~F.coalesce(ok, F.lit(True))
    raise ValueError(f"unknown expectation kind {kind!r} (know {_KINDS})")


def evaluate_expectations(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate a rule suite; returns one row per rule:
    (rule, kind, n_rows, n_violations, pass) — computed by a single
    aggregation pass (plus count_distinct legs for 'unique' rules,
    still inside the same aggregate)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    uniques: list[dict] = []
    for i, r in enumerate(rules):
        if r["kind"] == "unique":
            uniques.append(r)
            aggs.append(
                F.count_distinct(*[F.col(c) for c in r["cols"]]).alias(
                    f"__u_{i}"
                )
            )
            aggs.append(
                F.count(
                    F.when(
                        F.coalesce(
                            *[F.col(c).isNotNull() for c in r["cols"]],
                            F.lit(False),
                        ),
                        1,
                    )
                ).alias(f"__un_{i}")
            )
        else:
            aggs.append(
                F.count(F.when(_violation_expr(df, r), 1)).alias(f"__v_{i}")
            )
    row = df.agg(*aggs)
    # ONE result row fans out to one-row-per-rule via stack() — a pure
    # projection, so the aggregate subplan executes exactly once (a
    # union of per-rule selects would rely on exchange reuse instead)
    parts = []
    for i, r in enumerate(rules):
        name = r["name"].replace("'", "''")
        if r["kind"] == "unique":
            # violations = rows carrying a non-fully-null key beyond the
            # first occurrence of each distinct key
            vexpr = f"__un_{i} - __u_{i}"
        else:
            vexpr = f"__v_{i}"
        parts.append(f"'{name}', '{r['kind']}', CAST({vexpr} AS BIGINT)")
    stack = (
        f"stack({len(rules)}, "
        + ", ".join(parts)
        + ") AS (rule, kind, n_violations)"
    )
    return row.select(
        F.col("__n").cast("long").alias("n_rows"), F.expr(stack)
    ).select(
        "rule",
        "kind",
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )
