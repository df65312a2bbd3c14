#!/usr/bin/env python
"""Materialize a k-times-scaled copy of a testdata sf directory.

Same replication semantics as bench.py's in-memory 10x scale probe
(fact tables replicated with per-replica key remaps so join/pair
cardinality scales LINEARLY; document text bijectively re-vocabularied
per replica so near-dup structure replicates instead of going
quadratic), but PERSISTED — this is how the sf1 evidence set for the
full-headline bench is produced from the driver's sf0.1 tables without
touching /root/testdata (read-only).

Dimension tables (region/nation/customer/supplier/part/embeddings) are
copied unscaled: the fact-decade shape (facts grow 10x, dims don't) is
the production norm and keeps every FK resolvable.

Usage: python tools/make_scaled_sf.py [--src /root/testdata/sf0.1]
       [--dst .localdata/sf1] [--k 10]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from station_data_ingestion_spark.session import get_spark  # noqa: E402

DIMS = ("region", "nation", "customer", "supplier", "part", "embeddings")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=".localdata/sf1")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    k = args.k
    os.makedirs(args.dst, exist_ok=True)
    spark = get_spark(app_name="make_scaled_sf")

    reps = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("_r")

    def scaled(name: str, key_cols: list[str], salt_text: bool = False):
        df = spark.read.parquet(f"{args.src}/{name}.parquet").select("*", reps)
        for c in key_cols:
            df = df.withColumn(c, F.col(c) * k + F.col("_r"))
        if salt_text:
            df = df.withColumn(
                "text",
                F.regexp_replace(
                    F.col("text"), F.lit(r"(\S+)"),
                    F.concat(F.lit("$1x"), F.col("_r").cast("string")),
                ),
            )
        out = f"{args.dst}/{name}.parquet"
        shutil.rmtree(out, ignore_errors=True)
        df.drop("_r").write.parquet(out)
        print(f"scaled {name}: {spark.read.parquet(out).count()} rows")

    for t in DIMS:
        dst = f"{args.dst}/{t}.parquet"
        if os.path.lexists(dst):
            os.remove(dst) if os.path.islink(dst) else shutil.rmtree(dst)
        os.symlink(os.path.abspath(f"{args.src}/{t}.parquet"), dst)
    scaled("orders", ["o_orderkey"])
    scaled("lineitem", ["l_orderkey"])
    scaled("documents", ["doc_id"], salt_text=True)
    scaled("events", ["event_id", "user_id"])
    print("done:", args.dst)


if __name__ == "__main__":
    main()
