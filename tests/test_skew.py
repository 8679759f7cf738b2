"""Salted aggregation must be value-identical to the plain groupBy."""

from __future__ import annotations

from pyspark.sql import functions as F

from analysis_of_flight_delay_data_by_mapreduce_spark.operators.skew import (
    salted_sum_count,
)
from analysis_of_flight_delay_data_by_mapreduce_spark.sources import read_parquet_table

from conftest import SF_DIR


def test_salted_equals_plain(spark):
    li = read_parquet_table(spark, SF_DIR, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    salted = salted_sum_count(
        li, ["l_returnflag"], {"cents": cents}, n_salts=8
    ).collect()
    plain = (
        li.groupBy("l_returnflag")
        .agg(F.sum(cents).alias("cents"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted(tuple(r) for r in salted) == sorted(tuple(r) for r in plain)


def test_salted_two_shuffles(spark):
    from analysis_of_flight_delay_data_by_mapreduce_spark.plans.inspect import plan_text

    li = read_parquet_table(spark, SF_DIR, "lineitem")
    df = salted_sum_count(li, ["l_returnflag"], {"q": F.col("l_quantity")}, n_salts=4)
    txt = plan_text(df, "simple")
    assert txt.count("Exchange hashpartitioning") == 2  # (key,salt) then key
