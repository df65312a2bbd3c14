"""Expectation-suite operator: planted violations per rule kind, NULL
semantics (SQL CHECK: unknown passes everything but not_null), and the
one-pass plan shape."""

from pyspark.sql import Row

from station_data_ingestion_spark.operators.expectations import (
    evaluate_expectations,
)


def _df(spark):
    return spark.createDataFrame(
        [
            Row(k=1, st="O", price=10.0, tag="1-URGENT"),
            Row(k=1, st="X", price=-5.0, tag="9-BAD"),   # dup, domain, range, regex
            Row(k=None, st=None, price=None, tag=None),  # nulls
            Row(k=3, st="F", price=20.0, tag="5-LOW"),
        ],
        "k int, st string, price double, tag string",
    )


RULES = [
    {"name": "k_nn", "kind": "not_null", "col": "k"},
    {"name": "k_uq", "kind": "unique", "cols": ["k"]},
    {"name": "st_dom", "kind": "in_set", "col": "st", "values": ["O", "F"]},
    {"name": "price_rng", "kind": "range", "col": "price", "lo": 0.0},
    {"name": "tag_re", "kind": "regex", "col": "tag", "pattern": "^[1-5]-"},
    {"name": "cust", "kind": "custom", "expr": "price < 100"},
]


def test_planted_violations(spark):
    got = {
        r["rule"]: (r["n_rows"], r["n_violations"], r["passed"])
        for r in evaluate_expectations(_df(spark), RULES).collect()
    }
    assert got["k_nn"] == (4, 1, False)     # one NULL key
    assert got["k_uq"] == (4, 1, False)     # k=1 twice; NULL not counted
    assert got["st_dom"] == (4, 1, False)   # 'X'; NULL passes
    assert got["price_rng"] == (4, 1, False)  # -5; NULL passes
    assert got["tag_re"] == (4, 1, False)   # '9-BAD'; NULL passes
    assert got["cust"] == (4, 0, True)      # NULL passes custom too


def test_all_green_suite(spark):
    rules = [
        {"name": "a", "kind": "not_null", "col": "id"},
        {"name": "b", "kind": "unique", "cols": ["id"]},
    ]
    df = spark.range(10).withColumnRenamed("id", "id")
    got = evaluate_expectations(df, rules).collect()
    assert all(r["passed"] for r in got)


def test_one_pass_plan(spark):
    """The suite must compile to a single aggregate over a single scan —
    no per-rule jobs/unions."""
    plan = evaluate_expectations(
        _df(spark), RULES
    )._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("logicalrdd") == 1
    assert "Union" not in plan
