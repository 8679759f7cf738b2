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


def test_aqe_skew_split_fires_on_planted_hot_key(spark):
    """The executed plan must carry skew=true for a planted hot-key
    sort-merge join under the lowered local-scale thresholds (the exact
    setup tools/skew_bench.py times head-to-head)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from skew_bench import SKEW_CONF, build, skewed_join, executed_plan_has_skew_split

    # the fixture session runs shuffle=4; the split needs enough reduce
    # partitions for a meaningful median (bench runs 32 — mirror it)
    overrides = dict(
        SKEW_CONF,
        **{
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.shuffle.partitions": "32",
        },
    )
    old = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        # 8M rows: the hot partition's *compressed* shuffle bytes must
        # clear the lowered 1MB trigger (2M rows leaves it borderline)
        fact, dim = build(spark, 8_000_000)
        assert executed_plan_has_skew_split(skewed_join(fact, dim))
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
