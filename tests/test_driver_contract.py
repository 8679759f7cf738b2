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


def test_bench_stdout_line_fits_driver_tail_buffer():
    """The bench stdout JSON line must stay well under the driver's 2 kB
    tail buffer AT ANY REGISTRY SIZE — the r1/r5/r6 clipping regression
    (parsed: null) pinned structurally: per-query maps are stripped, so
    the line size is constant in the query count."""
    import json

    from bench import slim_stdout_payload

    payload = {
        "metric": "sum of per-query median wall-clock",
        "value": 123.4567,
        "unit": "sec",
        "queries": {f"q{i}": 0.1234 for i in range(1000)},
        "cold": {f"q{i}": 1.1234 for i in range(1000)},
        "cold_total": 1234.5,
        "load1_start": 0.12,
        "load1_end": 3.45,
        "load1_per_query": {f"q{i}": 1.0 for i in range(1000)},
        "spread_per_query": {f"q{i}": 1.5 for i in range(1000)},
        "requeued": [f"q{i}" for i in range(8)],
        "requeue_medians": {f"q{i}": {"first": 1.0} for i in range(8)},
        "sf": 0.1,
    }
    slim = slim_stdout_payload(payload)
    line = json.dumps(slim, separators=(",", ":"))
    assert len(line) < 1024, len(line)
    parsed = json.loads(line)
    assert parsed["n_queries"] == 1000
    assert parsed["value"] == 123.4567 and parsed["sf"] == 0.1
    assert "queries" not in parsed and "cold" not in parsed
    assert parsed["requeued"]  # the adjudication headline survives
