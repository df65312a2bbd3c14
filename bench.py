#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query materializes fully via the noop sink (so projections are not
pruned away, unlike count()). Session startup is excluded; a warmup query
primes the JVM/codegen so timings reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from station_data_ingestion_spark.queries import QUERIES  # noqa: E402
from station_data_ingestion_spark.session import get_spark  # noqa: E402

# Representative headline set: scan-agg, joins, windows, sessionization,
# dedup (LSH), similarity, text, merge -- the scale-critical shapes.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_revenue",
    "q6_forecast_revenue",
    "q10_returned_revenue",
    "agg_distinct_suppliers",
    "window_running_customer_spend",
    "window_topk_parts_per_brand",
    "events_sessionization",
    "events_tumbling_hourly",
    "setop_intersect_repeat_buyers",
    "sort_topn_expensive_orders",
    "merge_upsert_orders",
    "q9_profit_by_nation_year",
    "q18_large_volume_customers",
    "asof_purchase_last_click",
    "range_join_signup_hour_activity",
    "dedup_exact_hash",
    "dedup_minhash_lsh",
    "sim_brute_topk",
    "sim_brute_topk_blocked",
    "text_quality_features",
    "text_fingerprint_rolling_hash",
    "mm_decode_features",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench")
    # warmup: prime codegen/JIT, the parquet footer cache, and the Python
    # worker pool (first mapInPandas otherwise pays ~4s of daemon startup)
    materialize(QUERIES["q6_forecast_revenue"].fn(spark, sf_dir))
    spark.range(0, 1000, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        materialize(QUERIES[name].fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
