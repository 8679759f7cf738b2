"""Oracle-differential test for the NATIVE flight pipeline: a generated
UK-CAA-shaped CSV (deterministic, 20k rows) is run through
read_flight_csv → q1/q2 on Spark AND through equivalent SQL in DuckDB over
the same file. This checks the native-schema path end-to-end at volume —
the golden tests only pin 7-row fixtures."""

from __future__ import annotations

import random

import duckdb
import pytest

from analysis_of_flight_delay_data_by_mapreduce_spark.plans.flight_queries import (
    q1_delay,
    q2_late,
)
from analysis_of_flight_delay_data_by_mapreduce_spark.sources import read_flight_csv

from test_sources import _HEADER

AIRPORTS = [f"AIRPORT_{i}" for i in range(25)]
AIRLINES = [f"AIR {chr(65+i)}" for i in range(30)]


def _gen_rows(n=20000, seed=7):
    rng = random.Random(seed)
    for _ in range(n):
        period = f"{rng.randint(2011, 2017)}{rng.randint(1, 12):02d}"
        b31, b61, b181, b360 = (round(rng.uniform(0, 25), 1) for _ in range(4))
        yield (
            "05-Apr-2011 13:31",
            period,
            rng.choice(AIRPORTS),
            "COUNTRY",
            "CITY",
            rng.choice(AIRLINES),
            rng.choice("AAD") if rng.random() > 0.02 else "X",
            "S" if rng.random() > 0.1 else "C",
            f" {rng.randint(0, 200)} ",  # space-padded, incl. zeros
            " 0 ",
            f" {max(0.0, 100 - (b31 + b61 + b181 + b360)):.1f} ",
            " 0.0 ",
            f" {b31} ",
            f" {b61} ",
            f" {b181} ",
            f" {b360} ",
            f" {round(rng.uniform(0, 60), 2)} ",
            " 0 ",
            " 0 ",
            " 0.0 ",
            " 0.0 ",
        )


@pytest.fixture(scope="module")
def flight_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("flightcsv") / "flights.csv"
    with open(p, "w") as f:
        f.write(_HEADER + "\n")
        for row in _gen_rows():
            f.write(",".join(str(x) for x in row) + "\n")
        f.write("\n")  # trailing blank line (reference tolerates)
    return str(p)


def _norm(rows):
    out = []
    for r in rows:
        out.append(tuple(None if v is None else round(v, 9) if isinstance(v, float) else v for v in r))
    return sorted(out)


def test_q1_native_vs_duckdb(spark, flight_csv):
    got = _norm(tuple(r) for r in q1_delay(read_flight_csv(spark, flight_csv)).collect())
    exp = _norm(
        duckdb.sql(
            f"""
        WITH f AS (
          SELECT trim(reporting_airport) AS airport,
                 trim(arrival_departure) AS ad,
                 CAST(trim(number_flights_matched) AS BIGINT) AS flights,
                 CAST(trim(average_delay_mins) AS DOUBLE) AS delay
          FROM read_csv('{flight_csv}', header=true, all_varchar=true)
          WHERE trim(scheduled_charter) = 'S'
            AND CAST(trim(number_flights_matched) AS BIGINT) <> 0
        )
        SELECT airport,
               CASE WHEN SUM(CASE WHEN ad='A' THEN flights ELSE 0 END) <> 0
                    THEN SUM(CASE WHEN ad='A' THEN CAST(ROUND(flights*delay) AS BIGINT) ELSE 0 END)
                         / CAST(SUM(CASE WHEN ad='A' THEN flights ELSE 0 END) AS DOUBLE)
               END AS avg_arr,
               CASE WHEN SUM(CASE WHEN ad<>'A' THEN flights ELSE 0 END) <> 0
                    THEN SUM(CASE WHEN ad<>'A' THEN CAST(ROUND(flights*delay) AS BIGINT) ELSE 0 END)
                         / CAST(SUM(CASE WHEN ad<>'A' THEN flights ELSE 0 END) AS DOUBLE)
               END AS avg_dep
        FROM f GROUP BY airport
        """
        ).fetchall()
    )
    assert got == exp


def test_q2_native_vs_duckdb(spark, flight_csv):
    got = _norm(tuple(r) for r in q2_late(read_flight_csv(spark, flight_csv)).collect())
    exp = _norm(
        duckdb.sql(
            f"""
        WITH f AS (
          SELECT trim(airline_name) AS airline,
                 substr(trim(reporting_period), 1, 4) AS year,
                 CAST(trim(number_flights_matched) AS BIGINT) AS flights,
                 CAST(ROUND(CAST(trim(number_flights_matched) AS BIGINT) *
                      ((CAST(trim(flts_31_to_60_mins_late_percent) AS DOUBLE)
                        + CAST(trim(flts_61_to_180_mins_late_percent) AS DOUBLE)
                        + CAST(trim(flts_181_to_360_mins_late_percent) AS DOUBLE)
                        + CAST(trim(more_than_360_mins_late_percent) AS DOUBLE)) / 100.0))
                      AS BIGINT) AS late
          FROM read_csv('{flight_csv}', header=true, all_varchar=true)
          WHERE trim(scheduled_charter) = 'S'
            AND CAST(trim(number_flights_matched) AS BIGINT) <> 0
            AND trim(arrival_departure) = 'D'
        )
        SELECT airline AS airline_name, year,
               SUM(late) / CAST(SUM(flights) AS DOUBLE) AS late_ratio
        FROM f GROUP BY airline, year
        HAVING SUM(flights) > 0
           AND SUM(late) / CAST(SUM(flights) AS DOUBLE) >= 0.5
        """
        ).fetchall()
    )
    assert got == exp
