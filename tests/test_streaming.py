"""Streaming layer: the same transform must produce identical results via
readStream (availableNow) and plain batch read — the batch/stream parity
contract from SURVEY §7.3."""

from __future__ import annotations

from analysis_of_flight_delay_data_by_mapreduce_spark.sources import read_parquet_table
from analysis_of_flight_delay_data_by_mapreduce_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
    sessionized_counts,
    windowed_event_counts,
)

from conftest import SF_DIR


def test_windowed_counts_stream_equals_batch(spark):
    batch = windowed_event_counts(read_parquet_table(spark, SF_DIR, "events"))
    expected = {
        (r.window_start, r.event_type): (r.n, r.value_cents) for r in batch.collect()
    }

    stream = read_events_stream(spark, SF_DIR)
    agg = windowed_event_counts(stream, watermark="30 minutes")
    q = run_stream_to_memory(agg, "win_counts", mode="complete")
    try:
        got = {
            (r.window_start, r.event_type): (r.n, r.value_cents)
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
    finally:
        q.stop()
    assert got == expected
    assert len(got) > 0


def test_sessionized_counts_batch(spark):
    ev = read_parquet_table(spark, SF_DIR, "events")
    sessions = sessionized_counts(ev, gap="30 minutes")
    rows = sessions.collect()
    assert len(rows) > 0
    assert sum(r.n for r in rows) == ev.count()  # every event in exactly one session
    assert all(r.session_end > r.session_start for r in rows)
