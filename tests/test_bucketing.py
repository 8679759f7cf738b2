"""Bucketed join: no Exchange on either side, identical results to the
shuffled join."""

from __future__ import annotations

from analysis_of_flight_delay_data_by_mapreduce_spark.operators.bucketing import (
    bucketed_join_ready,
    write_bucketed,
)
from analysis_of_flight_delay_data_by_mapreduce_spark.plans.inspect import plan_text
from analysis_of_flight_delay_data_by_mapreduce_spark.sources import read_parquet_table

from conftest import SF_DIR


def test_bucketed_join_no_shuffle(spark):
    li = read_parquet_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).withColumnRenamed("l_orderkey", "okey")
    orders = read_parquet_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    ).withColumnRenamed("o_orderkey", "okey")

    write_bucketed(li, "li_bucketed", "okey", n_buckets=8)
    write_bucketed(orders, "orders_bucketed", "okey", n_buckets=8)

    joined = bucketed_join_ready(
        spark, "li_bucketed", "orders_bucketed", "okey", force_sort_merge=True
    )
    txt = plan_text(joined, "simple")
    assert "Exchange" not in txt  # co-located buckets: zero shuffles
    assert "SortMergeJoin" in txt

    # results identical to the plain (shuffled) join
    plain = li.join(orders, "okey")
    assert joined.count() == plain.count()
