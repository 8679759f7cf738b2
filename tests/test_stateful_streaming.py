"""applyInPandasWithState: running totals across micro-batches must end at
the batch groupBy answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from analysis_of_flight_delay_data_by_mapreduce_spark.sources import read_parquet_table
from analysis_of_flight_delay_data_by_mapreduce_spark.streaming.stateful import (
    running_user_totals,
)
from analysis_of_flight_delay_data_by_mapreduce_spark.streaming.windows import (
    read_events_stream,
)

from conftest import SF_DIR


def test_running_totals_match_batch(spark):
    stream = read_events_stream(spark, SF_DIR)
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("user_totals")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    try:
        # last emitted row per user = final running total
        got = {
            r.user_id: (r.n_events, r.value_cents)
            for r in spark.sql("SELECT * FROM user_totals").collect()
        }
    finally:
        q.stop()

    ev = read_parquet_table(spark, SF_DIR, "events")
    expected = {
        r.user_id: (r.n, r.cents)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert got == expected


def test_running_totals_tws_match_batch_and_apws(spark):
    """transformWithStateInPandas (Spark 4 typed-state API, RocksDB store)
    must land on the same final totals as the batch groupBy and the
    applyInPandasWithState operator. Skips when google.protobuf (the TWS
    state-protocol dependency, absent from this container) is missing, so
    the assertion has NOT run here — it documents the intended contract
    for an environment that has protobuf."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state protocol needs protobuf (not in image)",
    )
    from analysis_of_flight_delay_data_by_mapreduce_spark.streaming.stateful import (
        running_user_totals_tws,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_events_stream(spark, SF_DIR)
        q = (
            running_user_totals_tws(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("user_totals_tws")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        try:
            got = {
                r.user_id: (r.n_events, r.value_cents)
                for r in spark.sql("SELECT * FROM user_totals_tws").collect()
            }
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    ev = read_parquet_table(spark, SF_DIR, "events")
    expected = {
        r.user_id: (r.n, r.cents)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert got == expected
