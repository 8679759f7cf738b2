"""Salted aggregation must be value-identical to the plain groupBy."""

from __future__ import annotations

from pyspark.sql import functions as F

from analysis_of_flight_delay_data_by_mapreduce_spark.operators.skew import (
    salted_join,
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


def test_salted_join_row_identical_to_plain(spark):
    """Inner and left salted joins must be row-identical to the plain
    join — including a planted hot key, keys missing from the dim
    (left: exactly ONE null-extended row, never one per replica), and
    duplicate dim payload values."""
    ev = read_parquet_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts"
    )
    dim = (
        read_parquet_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.min("ts").alias("f"))
        .filter(F.col("user_id") % 3 != 0)  # holes -> exercises left join
    )
    for how in ("inner", "left"):
        plain = ev.join(dim, "user_id", how)
        salted = salted_join(ev, dim, "user_id", "event_id", 8, how)
        assert salted.exceptAll(plain).count() == 0
        assert plain.exceptAll(salted).count() == 0


def test_salted_join_planted_hot_key(spark):
    """A key holding most of the fact table spreads across salts and
    still joins exactly."""
    facts = spark.createDataFrame(
        [(i, 1 if i < 900 else i) for i in range(1000)], "eid long, k long"
    )
    dim = spark.createDataFrame(
        [(1, "hot")] + [(i, f"v{i}") for i in range(900, 1000)],
        "k long, payload string",
    )
    plain = facts.join(dim, "k")
    salted = salted_join(facts, dim, "k", "eid", n_salts=4)
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
    assert plain.count() == 1000
    # the salt genuinely spreads the hot key
    n_buckets = (
        facts.filter(F.col("k") == 1)
        .select(F.pmod(F.xxhash64(F.col("eid")), F.lit(4)).alias("s"))
        .distinct()
        .count()
    )
    assert n_buckets == 4


def test_salted_join_rejects_replication_unsafe_modes(spark):
    import pytest

    facts = spark.createDataFrame([(1, 1)], "eid long, k long")
    dim = spark.createDataFrame([(1, "x")], "k long, p string")
    with pytest.raises(ValueError):
        salted_join(facts, dim, "k", "eid", how="right")
    with pytest.raises(ValueError):
        salted_join(facts, dim, "k", "eid", n_salts=0)


def test_salted_join_joins_on_salt_key(spark):
    """The physical join keys must include the salt — otherwise the
    operator silently degenerates to the plain (skew-prone) join."""
    from analysis_of_flight_delay_data_by_mapreduce_spark.plans.inspect import (
        plan_text,
    )

    facts = spark.createDataFrame([(1, 1)], "eid long, k long")
    dim = spark.createDataFrame([(1, "x")], "k long, p string")
    txt = plan_text(salted_join(facts, dim, "k", "eid"), "simple")
    assert "__salt" in txt
