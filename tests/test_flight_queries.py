"""Golden tests for the reference's five queries on their native schemas,
pinning the §2.7 semantic fine print (hand-computed expectations, modeled on
the reference's embedded 10-row fixture — SURVEY §5)."""

from __future__ import annotations

import math

from analysis_of_flight_delay_data_by_mapreduce_spark.plans.flight_queries import (
    q1_delay,
    q2_late,
    q3_wordcount,
    q4_weblog1,
    q5_weblog2,
)
from analysis_of_flight_delay_data_by_mapreduce_spark.schema import (
    FLIGHT_PUNCTUALITY,
    TEXT_CORPUS,
    WEBLOG,
)


def _flight_row(
    airport="HEATHROW",
    ad="A",
    sc="S",
    flights=10,
    delay=5.0,
    airline="AIR A",
    period="201101",
    b31=0.0,
    b61=0.0,
    b181=0.0,
    b360=0.0,
):
    return (
        "05-Apr-2011 13:31",
        period,
        airport,
        "COUNTRY",
        "CITY",
        airline,
        ad,
        sc,
        flights,
        0,
        100.0 - (b31 + b61 + b181 + b360),
        0.0,
        b31,
        b61,
        b181,
        b360,
        delay,
        0,
        0,
        0.0,
        0.0,
    )


def test_q1_delay_golden(spark):
    rows = [
        # HEATHROW arrivals: round(10*5.0)=50, round(5*2.5)=round(12.5)=13 (HALF_UP)
        _flight_row(flights=10, delay=5.0),
        _flight_row(flights=5, delay=2.5),
        # HEATHROW departure: round(4*3.1)=12
        _flight_row(ad="D", flights=4, delay=3.1),
        # excluded: charter row and zero-matched-flights row (P2)
        _flight_row(sc="C", flights=100, delay=50.0),
        _flight_row(flights=0, delay=50.0),
        # departure-only airport → arrival side NULL (§2.7.3)
        _flight_row(airport="GATWICK", ad="D", flights=8, delay=2.0),
        # junk flag 'X' lands in the departure bucket (flag != 'A', §2.7.4)
        _flight_row(airport="LUTON", ad="X", flights=2, delay=1.0),
    ]
    df = spark.createDataFrame(rows, FLIGHT_PUNCTUALITY)
    got = {r.reporting_airport: r for r in q1_delay(df).collect()}
    assert set(got) == {"HEATHROW", "GATWICK", "LUTON"}
    assert math.isclose(got["HEATHROW"].avg_arrival_delay, 63 / 15)  # 4.2
    assert math.isclose(got["HEATHROW"].avg_departure_delay, 12 / 4)
    assert got["GATWICK"].avg_arrival_delay is None
    assert math.isclose(got["GATWICK"].avg_departure_delay, 2.0)
    assert got["LUTON"].avg_arrival_delay is None
    assert math.isclose(got["LUTON"].avg_departure_delay, 1.0)


def test_q2_late_golden(spark):
    rows = [
        # ratio exactly 0.5 → KEPT (>= boundary, Program/Late.java:175)
        _flight_row(airline="AIR A", period="201101", ad="D", flights=10, b31=50.0),
        # ratio 0.4 → dropped
        _flight_row(airline="AIR B", period="201101", ad="D", flights=10, b31=40.0),
        # late buckets are summed: 20+15+10+15 = 60% → kept; year is
        # the string prefix of the period (§2.7.6)
        _flight_row(
            airline="AIR A", period="201512", ad="D", flights=10,
            b31=20.0, b61=15.0, b181=10.0, b360=15.0,
        ),
        # arrivals ignored even when 100% late (P3 filter)
        _flight_row(airline="AIR B", period="201101", ad="A", flights=10, b31=100.0),
        # charter ignored
        _flight_row(airline="AIR B", period="201101", ad="D", sc="C", flights=10, b31=100.0),
        # per-row HALF_UP rounding: round(5 * 0.49) = round(2.45) = 2 → 0.4 dropped
        _flight_row(airline="AIR C", period="201301", ad="D", flights=5, b31=49.0),
    ]
    df = spark.createDataFrame(rows, FLIGHT_PUNCTUALITY)
    got = {(r.airline_name, r.year): r.late_ratio for r in q2_late(df).collect()}
    assert set(got) == {("AIR A", "2011"), ("AIR A", "2015")}
    assert math.isclose(got[("AIR A", "2011")], 0.5)
    assert math.isclose(got[("AIR A", "2015")], 0.6)


def test_q2_round_then_sum_diverges_from_sum_then_round(spark):
    # Two rows at 5×0.49 → per-row round gives 2+2=4/10=0.4 (dropped);
    # sum-then-round would give round(4.9)=5/10=0.5 (kept). Pins §2.7.1.
    rows = [
        _flight_row(airline="AIR R", period="201101", ad="D", flights=5, b31=49.0),
        _flight_row(airline="AIR R", period="201101", ad="D", flights=5, b31=49.0),
    ]
    df = spark.createDataFrame(rows, FLIGHT_PUNCTUALITY)
    assert q2_late(df).count() == 0


def test_q3_wordcount(spark):
    rows = [("the cat  sat",), ("the   cat",), ("",), ("cat.",)]
    df = spark.createDataFrame(rows, TEXT_CORPUS)
    got = {r.word: r.cnt for r in q3_wordcount(df).collect()}
    # punctuation is NOT stripped ('cat.' ≠ 'cat') and empty lines emit nothing
    assert got == {"the": 2, "cat": 2, "sat": 1, "cat.": 1}


_WEBLOG_ROWS = [
    ("alice", "2017-01-01", "/a"),  # twice, different dates → Q4 yes, Q5 no
    ("alice", "2017-01-02", "/a"),
    ("bob", "2017-01-01", "/b"),  # twice, same date → Q4 yes, Q5 yes
    ("bob", "2017-01-01", "/b"),
    ("carol", "2017-01-01", "/c"),  # once → neither
    ("dave", "2017-01-01", "/a"),  # same url as alice, different user
]


def test_q4_weblog1(spark):
    df = spark.createDataFrame(_WEBLOG_ROWS, WEBLOG)
    got = {(r.username, r.url) for r in q4_weblog1(df).collect()}
    assert got == {("alice", "/a"), ("bob", "/b")}


def test_q5_weblog2(spark):
    df = spark.createDataFrame(_WEBLOG_ROWS, WEBLOG)
    got = {(r.username, r.url) for r in q5_weblog2(df).collect()}
    assert got == {("bob", "/b")}


def test_all_queries_tolerate_empty_input(spark):
    """Every native plan must return an empty (not failing) result when the
    filters eliminate all rows — the reference's header-only-input case."""
    flights = spark.createDataFrame([], FLIGHT_PUNCTUALITY)
    weblog = spark.createDataFrame([], WEBLOG)
    corpus = spark.createDataFrame([], TEXT_CORPUS)
    assert q1_delay(flights).count() == 0
    assert q2_late(flights).count() == 0
    assert q3_wordcount(corpus).count() == 0
    assert q4_weblog1(weblog).count() == 0
    assert q5_weblog2(weblog).count() == 0
