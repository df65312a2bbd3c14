"""The external driver builds its OWN SparkSession (no session.py
factory). Every query must still be correct there: registry.load
applies the correctness-critical confs (nanos-as-long, UTC, Arrow) at
runtime. This test reproduces the driver exactly: a fresh subprocess, a
plain unconfigured session, queries() from __spark_entry__."""

import subprocess
import sys

_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[4]").appName("plain-driver").getOrCreate()
assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "false"

import __spark_entry__ as entry_mod

qs = entry_mod.queries()
sf = "/root/testdata/sf0.001"
# the nanos-sensitive table + a timestamp-formatting query + the flagship
for name in ("events_tumbling_hourly", "events_sessionization", "q1_pricing_summary"):
    rows = qs[name](spark, sf).collect()
    assert rows, name
df = entry_mod.entry(spark)
assert df.count() >= 0
print("PLAIN_DRIVER_OK")
"""


def test_queries_run_on_plain_unconfigured_session():
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "PLAIN_DRIVER_OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]
