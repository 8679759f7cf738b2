"""Driver-facing query registry on the synthetic tables (TESTDATA.md).

Every implemented capability from SURVEY §2 (and the extension tier) is
registered here twice: a Spark plan ``(spark, sf_dir) -> DataFrame`` and —
whenever SQL can express it — an equivalent DuckDB oracle SQL string over
the same Parquet tables. The driver hash-compares the two at sf=0.01.

Determinism contract (what makes the hashes stable):
- all money/weight aggregates use the reference's round-then-sum shape —
  per-row ``ROUND()`` to exact int64, THEN sum — so group totals are
  bit-identical under any partitioning / accumulation order;
- final ratios are a single ``int64 / int64`` double division (one IEEE op,
  deterministic on both engines);
- raw SUM(double) over many rows is avoided in oracle-checked outputs
  (floating accumulation is order-dependent);
- every computed column is aliased identically in Spark and SQL.

Mapping of the reference's flight semantics onto the TPC-H-ish tables
(FIXTURES.md §4): ``lineitem`` stands in for the punctuality table
(group key ≙ ``l_suppkey``/``l_returnflag``, weight ≙ ``l_quantity``,
rate ≙ price/discount columns, A/D flag ≙ ``l_linestatus``), ``events``
stands in for the weblog (user ≙ ``user_id``, url ≙ ``event_type``,
date ≙ ``date(ts)``), ``documents.text`` for the word-count corpus.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import weighted_rounded, year_of_period
from ..operators.aggregates import (
    duplicate_within,
    pivoted_weighted_mean,
    ratio_threshold,
    token_counts,
    repeated_within,
)
from ..sources import read_parquet_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Reference surface: Q1 Delay — pivoted weighted mean (SURVEY §2.6 Q1).
# lineitem mapping: airport ≙ l_suppkey, A/D flag ≙ l_linestatus ('O' is the
# match bucket, everything else the otherwise-bucket — reference §2.7.4),
# charter filter ≙ l_returnflag != 'R', flights ≙ l_quantity,
# avg delay ≙ l_extendedprice.
# ---------------------------------------------------------------------------
@register(
    "q1_delay",
    oracle="""
    SELECT l_suppkey,
           CASE WHEN SUM(CASE WHEN l_linestatus = 'O'
                              THEN CAST(ROUND(l_quantity) AS BIGINT) ELSE 0 END) <> 0
                THEN SUM(CASE WHEN l_linestatus = 'O'
                              THEN CAST(ROUND(l_quantity * l_extendedprice) AS BIGINT)
                              ELSE 0 END)
                     / CAST(SUM(CASE WHEN l_linestatus = 'O'
                                     THEN CAST(ROUND(l_quantity) AS BIGINT)
                                     ELSE 0 END) AS DOUBLE)
           END AS avg_open_price,
           CASE WHEN SUM(CASE WHEN l_linestatus <> 'O'
                              THEN CAST(ROUND(l_quantity) AS BIGINT) ELSE 0 END) <> 0
                THEN SUM(CASE WHEN l_linestatus <> 'O'
                              THEN CAST(ROUND(l_quantity * l_extendedprice) AS BIGINT)
                              ELSE 0 END)
                     / CAST(SUM(CASE WHEN l_linestatus <> 'O'
                                     THEN CAST(ROUND(l_quantity) AS BIGINT)
                                     ELSE 0 END) AS DOUBLE)
           END AS avg_closed_price
    FROM lineitem
    WHERE l_returnflag <> 'R' AND l_quantity <> 0
    GROUP BY l_suppkey
    """,
)
def q1_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    src = li.filter((F.col("l_returnflag") != "R") & (F.col("l_quantity") != 0))
    return pivoted_weighted_mean(
        src,
        keys=["l_suppkey"],
        weight="l_quantity",
        value="l_extendedprice",
        flag="l_linestatus",
        match="O",
        out_match="avg_open_price",
        out_other="avg_closed_price",
    )


# ---------------------------------------------------------------------------
# Reference surface: Q2 Late — ratio-of-sums + HAVING threshold (§2.6 Q2).
# Mapping: (airline, year) ≙ (l_suppkey, 4-char prefix of ship date),
# departure filter ≙ l_linestatus = 'F', flights ≙ l_quantity, late-rate ≙
# 5.5 × (l_discount + l_tax)  (straddles the 0.5 threshold: ~300/700 groups
# kept at sf0.01, so the HAVING boundary is genuinely exercised).
# Per-row ROUND before summation, >= boundary, den>0 guard — §2.7.1/.5.
# ---------------------------------------------------------------------------
@register(
    "q2_late",
    oracle="""
    WITH src AS (
      SELECT l_suppkey,
             substr(CAST(l_shipdate AS VARCHAR), 1, 4) AS l_year,
             CAST(ROUND(l_quantity * ((l_discount + l_tax) * 5.5)) AS BIGINT) AS late,
             CAST(ROUND(l_quantity) AS BIGINT) AS flights
      FROM lineitem
      WHERE l_quantity <> 0 AND l_linestatus = 'F'
    )
    SELECT l_suppkey, l_year,
           SUM(late) / CAST(SUM(flights) AS DOUBLE) AS late_ratio
    FROM src
    GROUP BY l_suppkey, l_year
    HAVING SUM(flights) > 0
       AND SUM(late) / CAST(SUM(flights) AS DOUBLE) >= 0.5
    """,
)
def q2_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    src = (
        li.filter((F.col("l_quantity") != 0) & (F.col("l_linestatus") == "F"))
        .withColumn("l_year", year_of_period("l_shipdate"))
    )
    late_rate = (F.col("l_discount") + F.col("l_tax")) * F.lit(5.5)
    return ratio_threshold(
        src,
        keys=["l_suppkey", "l_year"],
        num=weighted_rounded(F.col("l_quantity"), late_rate),
        den=F.round(F.col("l_quantity"), 0).cast("long"),
        theta=0.5,
        out="late_ratio",
    )


# ---------------------------------------------------------------------------
# Reference surface: Q3 WordCount (§2.6 Q3) over documents.text.
# ---------------------------------------------------------------------------
@register(
    "q3_wordcount",
    oracle=r"""
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
)
def q3_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return token_counts(docs, "text", out="cnt")


# ---------------------------------------------------------------------------
# Reference surface: Q4 WebLog1 (§2.6 Q4) — repeated (user, url) visits.
# events mapping: username ≙ user_id, url ≙ event_type.
# ---------------------------------------------------------------------------
@register(
    "q4_repeat_visits",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events
    GROUP BY user_id, event_type
    HAVING COUNT(*) >= 2
    """,
)
def q4_repeat_visits(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return repeated_within(ev, ["user_id", "event_type"], min_count=2)


# ---------------------------------------------------------------------------
# Reference surface: Q5 WebLog2 (§2.6 Q5) — same (user, url) on a repeated
# date: COUNT(*) > COUNT(DISTINCT date(ts)).
# ---------------------------------------------------------------------------
@register(
    "q5_dup_dates",
    oracle="""
    SELECT user_id, event_type,
           COUNT(*) AS n,
           COUNT(DISTINCT CAST(ts AS DATE)) AS n_distinct
    FROM events
    GROUP BY user_id, event_type
    HAVING COUNT(*) > COUNT(DISTINCT CAST(ts AS DATE))
    """,
)
def q5_dup_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn("d", F.col("ts").cast("date"))
    return duplicate_within(ev, ["user_id", "event_type"], "d")
