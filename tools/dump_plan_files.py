"""Dump `.explain("formatted")` for named queries into per-query files.

Usage:
    python tools/dump_plan_files.py <out_dir> <suffix> <query> [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` — the optimization-round
evidence files (plans/r12/<query>_before.txt / _after.txt) the judge
diffs against the claims in OPTIMIZATION_r12.md. Plans are built at
sf0.001 (plan SHAPE is sf-independent; iterative queries execute their
fixpoint loops during construction, so the smallest SF keeps this fast).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analysis_of_flight_delay_data_by_mapreduce_spark.plans import synthetic
from analysis_of_flight_delay_data_by_mapreduce_spark.plans.inspect import plan_text
from analysis_of_flight_delay_data_by_mapreduce_spark.session import get_spark


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plan-files")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for name in names:
        df = synthetic.QUERIES[name](spark, sf)
        text = plan_text(df, "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
