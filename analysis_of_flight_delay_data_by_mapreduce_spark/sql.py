"""SQL surface of the engine.

Every capability is reachable two ways — the DataFrame operators
(``operators/``, ``plans/``) and plain Spark SQL over registered views.
Catalyst produces the same physical plan either way (SURVEY §3); the SQL
strings below are the reference's five queries in the form a SQL user would
write them (§2.6), parameterized by view name.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schema import SYNTHETIC_TABLES
from .sources import read_parquet_table

#: The reference's five queries as ANSI-ish Spark SQL over a `flights` /
#: `weblog` / `corpus` view (native schemas, SURVEY §2.6). Semantics match
#: plans.flight_queries exactly — incl. round-then-sum (§2.7.1), the
#: flag != 'A' departure bucket (§2.7.4), NULL on empty side (§2.7.3).
FLIGHT_SQL: dict[str, str] = {
    "q1_delay": """
        SELECT reporting_airport,
               CASE WHEN SUM(CASE WHEN arrival_departure = 'A'
                                  THEN CAST(ROUND(number_flights_matched, 0) AS BIGINT)
                                  ELSE 0L END) <> 0
                    THEN SUM(CASE WHEN arrival_departure = 'A'
                                  THEN CAST(ROUND(number_flights_matched * average_delay_mins, 0) AS BIGINT)
                                  ELSE 0L END)
                         / CAST(SUM(CASE WHEN arrival_departure = 'A'
                                         THEN CAST(ROUND(number_flights_matched, 0) AS BIGINT)
                                         ELSE 0L END) AS DOUBLE)
               END AS avg_arrival_delay,
               CASE WHEN SUM(CASE WHEN arrival_departure <> 'A'
                                  THEN CAST(ROUND(number_flights_matched, 0) AS BIGINT)
                                  ELSE 0L END) <> 0
                    THEN SUM(CASE WHEN arrival_departure <> 'A'
                                  THEN CAST(ROUND(number_flights_matched * average_delay_mins, 0) AS BIGINT)
                                  ELSE 0L END)
                         / CAST(SUM(CASE WHEN arrival_departure <> 'A'
                                         THEN CAST(ROUND(number_flights_matched, 0) AS BIGINT)
                                         ELSE 0L END) AS DOUBLE)
               END AS avg_departure_delay
        FROM flights
        WHERE scheduled_charter = 'S' AND number_flights_matched <> 0
        GROUP BY reporting_airport
    """,
    "q2_late": """
        WITH src AS (
          SELECT airline_name,
                 SUBSTRING(reporting_period, 1, 4) AS year,
                 CAST(ROUND(number_flights_matched *
                      ((flts_31_to_60_mins_late_percent + flts_61_to_180_mins_late_percent +
                        flts_181_to_360_mins_late_percent + more_than_360_mins_late_percent) / 100.0),
                      0) AS BIGINT) AS late,
                 CAST(number_flights_matched AS BIGINT) AS flights
          FROM flights
          WHERE scheduled_charter = 'S' AND number_flights_matched <> 0
            AND arrival_departure = 'D'
        )
        SELECT airline_name, year,
               CAST(SUM(late) AS DOUBLE) / CAST(SUM(flights) AS DOUBLE) AS late_ratio
        FROM src
        GROUP BY airline_name, year
        HAVING SUM(flights) > 0
           AND CAST(SUM(late) AS DOUBLE) / CAST(SUM(flights) AS DOUBLE) >= 0.5
    """,
    "q3_wordcount": """
        SELECT word, COUNT(*) AS cnt
        FROM (SELECT explode(filter(split(line, '\\\\s+'), t -> t <> '')) AS word
              FROM corpus)
        GROUP BY word
    """,
    "q4_weblog1": """
        SELECT username, url, COUNT(*) AS n
        FROM weblog
        GROUP BY username, url
        HAVING COUNT(*) >= 2
    """,
    "q5_weblog2": """
        SELECT username, url, COUNT(*) AS n, COUNT(DISTINCT date) AS n_distinct
        FROM weblog
        GROUP BY username, url
        HAVING COUNT(*) > COUNT(DISTINCT date)
    """,
}


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every synthetic table as a temp view (for ``spark.sql``)."""
    names = []
    for t in SYNTHETIC_TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            read_parquet_table(spark, sf_dir, t).createOrReplaceTempView(t)
            names.append(t)
    return names


def register_flight_views(
    spark: SparkSession,
    flights: DataFrame | None = None,
    weblog: DataFrame | None = None,
    corpus: DataFrame | None = None,
) -> None:
    """Register native-schema inputs under the view names FLIGHT_SQL uses."""
    if flights is not None:
        flights.createOrReplaceTempView("flights")
    if weblog is not None:
        weblog.createOrReplaceTempView("weblog")
    if corpus is not None:
        corpus.createOrReplaceTempView("corpus")


def run_flight_sql(spark: SparkSession, name: str) -> DataFrame:
    """Run one of the five reference queries via the SQL surface."""
    return spark.sql(FLIGHT_SQL[name])
