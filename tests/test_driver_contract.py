"""Driver-contract resilience: the harness hands queries a SparkSession we
did not configure. A bare session (no nanosAsLong, no UTC) must still run
every table's read path — exercised in a clean subprocess because a bare
session can't coexist with the configured one in this JVM."""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = """
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]").appName("driver-sim")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

rows = e.entry(spark).collect()
assert len(rows) > 0, "entry returned no rows"

# the nano-timestamp table is the schema-level hazard: run an events query
df = e.queries()["q5_dup_dates"](spark, "/root/testdata/sf0.001")
assert df.count() >= 0
df2 = e.queries()["events_windowed"](spark, "/root/testdata/sf0.001")
assert df2.count() > 0
print("DRIVER_SIM_OK")
spark.stop()
"""


def test_bare_session_driver_simulation():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert "DRIVER_SIM_OK" in proc.stdout, proc.stderr[-2000:]
