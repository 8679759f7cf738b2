"""Session operators: gap-boundary semantics, run collapsing (SCD2
intervals), changelog compaction tiebreaks, and plan shape (per-key hash
partitioning, never a data-wide SinglePartition exchange)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from analysis_of_flight_delay_data_by_mapreduce_spark.operators.sessions import (
    collapse_runs,
    latest_state,
    session_summary,
    sessionize,
)
from analysis_of_flight_delay_data_by_mapreduce_spark.plans.inspect import plan_text


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 10, minute, second, micro)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, event_type string"
    )


def test_gap_boundary_is_strict(spark):
    # gap == 60s exactly → SAME session; 60s + 1µs → NEW session.
    rows = [
        (1, 1, _ts(0), "a"),
        (1, 2, _ts(1), "a"),          # +60.000000s  → same session
        (1, 3, _ts(2, 0, 1), "a"),    # +60.000001s  → new session
    ]
    out = sessionize(
        _events(spark, rows), "user_id", "ts", gap_seconds=60,
        tiebreak=["event_id"],
    )
    got = {r.event_id: r.session_idx for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2}


def test_sessions_do_not_cross_users(spark):
    rows = [(1, 1, _ts(0), "a"), (2, 2, _ts(0, 0, 1), "a")]
    out = sessionize(_events(spark, rows), "user_id", "ts", 3600)
    assert {r.session_idx for r in out.collect()} == {1}


def test_session_summary_counts_and_duration(spark):
    rows = [
        (1, 1, _ts(0), "a"),
        (1, 2, _ts(10), "a"),   # gap 600s > 300 → new session
        (1, 3, _ts(12), "a"),
        (1, 4, _ts(14), "a"),
    ]
    out = session_summary(
        _events(spark, rows), "user_id", "ts", gap_seconds=300,
        tiebreak=["event_id"],
    ).collect()
    by_idx = {r.session_idx: r for r in out}
    assert by_idx[1].n_events == 1 and by_idx[1].duration_s == 0
    assert by_idx[2].n_events == 3 and by_idx[2].duration_s == 240


def test_collapse_runs_islands_and_interval_chain(spark):
    rows = [
        (1, 1, _ts(0), "A"),
        (1, 2, _ts(1), "A"),
        (1, 3, _ts(2), "B"),
        (1, 4, _ts(3), "A"),  # A again — must be a NEW run, not merged
    ]
    out = collapse_runs(
        _events(spark, rows), "user_id", "ts", "event_type",
        tiebreak=["event_id"],
    )
    runs = sorted(out.collect(), key=lambda r: r.valid_from)
    assert [r.state for r in runs] == ["A", "B", "A"]
    assert [r.n_rows for r in runs] == [2, 1, 1]
    # half-open chain: each valid_to equals the next valid_from; last NULL
    assert runs[0].valid_to == runs[1].valid_from
    assert runs[1].valid_to == runs[2].valid_from
    assert runs[2].valid_to is None


def test_latest_state_tiebreak_on_equal_ts(spark):
    rows = [
        (1, 1, _ts(0), "old"),
        (1, 2, _ts(5), "mid"),
        (1, 3, _ts(5), "new"),  # same ts — higher event_id wins
    ]
    out = latest_state(
        _events(spark, rows), "user_id", "ts", tiebreak=["event_id"]
    ).collect()
    assert len(out) == 1 and out[0].event_type == "new"


def test_plans_hash_partition_by_key_only(spark):
    rows = [(1, 1, _ts(0), "a")]
    for df in (
        sessionize(_events(spark, rows), "user_id", "ts", 60),
        collapse_runs(_events(spark, rows), "user_id", "ts", "event_type"),
        latest_state(_events(spark, rows), "user_id", "ts"),
    ):
        txt = plan_text(df, "simple").lower()
        assert "hashpartitioning(user_id" in txt
        assert "singlepartition" not in txt
