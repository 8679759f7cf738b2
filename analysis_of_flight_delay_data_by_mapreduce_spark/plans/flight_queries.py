"""The reference's five queries on their native schemas (SURVEY §2.6).

Each is a thin composition of the generic operators in
``operators.aggregates`` — the reference's flaw was hard-coding each
pipeline; here the capability is reusable and the query is declaration only.

Inputs are plain DataFrames (from ``sources.read_flight_csv`` /
``read_weblog`` / ``read_text_corpus`` or any other scan), so the same plans
serve batch Parquet, CSV, and (for the aggregation shapes that allow it)
Structured Streaming inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import weighted_rounded, year_of_period
from ..operators.aggregates import (
    duplicate_within,
    pivoted_weighted_mean,
    ratio_threshold,
    repeated_within,
    token_counts,
)

__all__ = ["q1_delay", "q2_late", "q3_wordcount", "q4_weblog1", "q5_weblog2"]

#: Late-bucket percentage columns summed by the Late job
#: (``Program/Late.java:61``): flights ≥31 minutes late.
LATE_BUCKETS = [
    "flts_31_to_60_mins_late_percent",
    "flts_61_to_180_mins_late_percent",
    "flts_181_to_360_mins_late_percent",
    "more_than_360_mins_late_percent",
]


def _scheduled_with_flights(flights: DataFrame) -> DataFrame:
    """Shared filter P2 (``Program/Delay.java:51``): scheduled (not charter)
    rows with at least one matched flight. Also drops the header/blank
    residue exactly as the reference does as a side effect."""
    return flights.filter(
        (F.col("scheduled_charter") == "S") & (F.col("number_flights_matched") != 0)
    )


def q1_delay(flights: DataFrame) -> DataFrame:
    """Q1 Delay (``Program/Delay.java``): per-airport average arrival and
    departure delay, weighted by matched-flight count, with per-row
    rounding of ``flights × avg_delay`` before accumulation (§2.7.1).

    Output: ``reporting_airport, avg_arrival_delay, avg_departure_delay``.
    An airport with rows on only one side gets NULL on the other (the
    reference's NaN — §2.7.3). The departure bucket is ``flag != 'A'``
    (else-branch, ``Program/Delay.java:80-84``), honored by
    ``pivoted_weighted_mean``'s otherwise-bucket.
    """
    return pivoted_weighted_mean(
        _scheduled_with_flights(flights),
        keys=["reporting_airport"],
        weight="number_flights_matched",
        value="average_delay_mins",
        flag="arrival_departure",
        match="A",
        out_match="avg_arrival_delay",
        out_other="avg_departure_delay",
    )


def q2_late(flights: DataFrame, theta: float = 0.5) -> DataFrame:
    """Q2 Late (``Program/Late.java``): (airline, year) pairs where at least
    ``theta`` (default 50%) of scheduled departures were ≥31 min late.

    Year is the 4-char prefix of ``reporting_period`` (§2.7.6); the late
    count is rounded per row (§2.7.1); boundary is ``>=`` (kept at exactly
    ``theta``, ``Program/Late.java:175``).

    Output: ``airline_name, year, late_ratio``.
    """
    src = _scheduled_with_flights(flights).filter(F.col("arrival_departure") == "D")
    late_rate = sum(F.col(c) for c in LATE_BUCKETS) / F.lit(100.0)
    src = src.withColumn("year", year_of_period("reporting_period"))
    return ratio_threshold(
        src,
        keys=["airline_name", "year"],
        num=weighted_rounded(F.col("number_flights_matched"), late_rate),
        den=F.col("number_flights_matched").cast("long"),
        theta=theta,
        out="late_ratio",
    )


def q3_wordcount(corpus: DataFrame, col: str = "line") -> DataFrame:
    """Q3 WordCount (``WordCount.java``): token → occurrence count."""
    return token_counts(corpus, col, out="cnt")


def q4_weblog1(weblog: DataFrame, min_visits: int = 2) -> DataFrame:
    """Q4 WebLog1 (``WebLog1.java:40-59``): (user, url) pairs visited at
    least ``min_visits`` times."""
    return repeated_within(weblog, ["username", "url"], min_count=min_visits)


def q5_weblog2(weblog: DataFrame) -> DataFrame:
    """Q5 WebLog2 (``WebLog2.java:51-76``): (user, url) pairs where some
    date repeats — COUNT(*) > COUNT(DISTINCT date) within the group."""
    return duplicate_within(weblog, ["username", "url"], "date")
