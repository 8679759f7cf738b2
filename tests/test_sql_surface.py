"""SQL/DataFrame duality: the SQL strings must produce identical results to
the DataFrame plans on the same inputs."""

from __future__ import annotations

from analysis_of_flight_delay_data_by_mapreduce_spark import sql as sqlmod
from analysis_of_flight_delay_data_by_mapreduce_spark.plans import flight_queries as fq
from analysis_of_flight_delay_data_by_mapreduce_spark.schema import (
    FLIGHT_PUNCTUALITY,
    TEXT_CORPUS,
    WEBLOG,
)

from test_flight_queries import _WEBLOG_ROWS, _flight_row


def _norm(rows):
    return sorted(tuple(r) for r in rows)


def test_sql_equals_dataframe_q1_q2(spark):
    flights = spark.createDataFrame(
        [
            _flight_row(flights=10, delay=5.0),
            _flight_row(flights=5, delay=2.5),
            _flight_row(ad="D", flights=4, delay=3.1),
            _flight_row(sc="C", flights=100, delay=50.0),
            _flight_row(airport="GATWICK", ad="D", flights=8, delay=2.0),
            _flight_row(airline="AIR A", period="201101", ad="D", flights=10, b31=50.0),
            _flight_row(airline="AIR B", period="201512", ad="D", flights=10, b31=60.0),
        ],
        FLIGHT_PUNCTUALITY,
    )
    sqlmod.register_flight_views(spark, flights=flights)
    assert _norm(sqlmod.run_flight_sql(spark, "q1_delay").collect()) == _norm(
        fq.q1_delay(flights).collect()
    )
    assert _norm(sqlmod.run_flight_sql(spark, "q2_late").collect()) == _norm(
        fq.q2_late(flights).collect()
    )


def test_sql_equals_dataframe_q3_q4_q5(spark):
    corpus = spark.createDataFrame([("a b  a",), ("b",), ("",)], TEXT_CORPUS)
    weblog = spark.createDataFrame(_WEBLOG_ROWS, WEBLOG)
    sqlmod.register_flight_views(spark, weblog=weblog, corpus=corpus)
    assert _norm(sqlmod.run_flight_sql(spark, "q3_wordcount").collect()) == _norm(
        fq.q3_wordcount(corpus).collect()
    )
    got_sql = _norm(
        sqlmod.run_flight_sql(spark, "q4_weblog1").select("username", "url").collect()
    )
    got_df = _norm(fq.q4_weblog1(weblog).select("username", "url").collect())
    assert got_sql == got_df
    got_sql5 = _norm(
        sqlmod.run_flight_sql(spark, "q5_weblog2").select("username", "url").collect()
    )
    got_df5 = _norm(fq.q5_weblog2(weblog).select("username", "url").collect())
    assert got_sql5 == got_df5


def test_register_views_roundtrip(spark):
    from conftest import SF_DIR

    names = sqlmod.register_views(spark, SF_DIR)
    assert "lineitem" in names and "documents" in names
    n = spark.sql("SELECT COUNT(*) AS n FROM lineitem").first().n
    assert n > 0
