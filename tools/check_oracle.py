"""Local replica of the driver's oracle-differential check.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given sf dir, then compares row count, sorted column names, and an
order-insensitive value hash. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from analysis_of_flight_delay_data_by_mapreduce_spark.schema import SYNTHETIC_TABLES
from analysis_of_flight_delay_data_by_mapreduce_spark.session import get_spark


def normalize_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # round-trip at 12 significant digits to absorb last-ulp formatting noise
        return f"{v:.12g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(rows: list[tuple], cols: list[str]) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(normalize_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in SYNTHETIC_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql(sf_dir)
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # mirror the driver: record, keep going
            failures += 1
            msg = str(exc).splitlines()[0][:200]
            print(f"{name}: ERROR {msg}")
            continue
        scols = list(sdf.columns)
        sn, sh = table_hash(srows, scols)
        if name not in oracles:
            print(f"{name}: rows-only check — spark rows={sn} cols={sorted(scols)}")
            continue
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        on, oh = table_hash(orows, ocols)
        ok = (sn == on) and (sorted(scols) == sorted(ocols)) and (sh == oh)
        status = "OK " if ok else "FAIL"
        print(f"{name}: {status} spark(n={sn},h={sh}) duck(n={on},h={oh})")
        if not ok:
            failures += 1
            if sorted(scols) != sorted(ocols):
                print(f"  cols spark={sorted(scols)} duck={sorted(ocols)}")
            if sn == on and sorted(scols) == sorted(ocols):
                # locate first differing line
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ls = sorted("\x1f".join(normalize_cell(r[i]) for i in order_s) for r in srows)
                lo = sorted("\x1f".join(normalize_cell(r[i]) for i in order_o) for r in orows)
                for a, b in zip(ls, lo):
                    if a != b:
                        print(f"  spark: {a!r}\n  duck : {b!r}")
                        break
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
