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


# The transformWithStateInPandas parity test was removed with the operator
# in round 4 (google.protobuf absent from this image -> the test was a
# permanent skip; an assertion that never runs documents nothing). The
# intended TWS shape is archived in NEXT.md.
