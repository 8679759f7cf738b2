"""Temporal joins: as-of semantics (at-or-before, simultaneous-visible,
no-prior → NULL), interval half-open boundaries and overlap duplication,
and plan shape (broadcast inner side; single shuffle for as-of)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from analysis_of_flight_delay_data_by_mapreduce_spark.operators.joins import (
    asof_join,
    interval_join,
    interval_join_binned,
)
from analysis_of_flight_delay_data_by_mapreduce_spark.plans.inspect import plan_text


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


def test_asof_basic_and_no_prior(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (1, 11, _ts(1)), (2, 20, _ts(5))],
        "user_id bigint, event_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(2), 100), (1, _ts(4), 200)],
        "user_id bigint, ts timestamp, v bigint",
    )
    out = {
        r.event_id: r.v_asof
        for r in asof_join(left, right, "user_id", "ts", ["v"]).collect()
    }
    assert out == {10: 200, 11: None, 20: None}


def test_asof_simultaneous_right_row_is_visible(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5))], "user_id bigint, event_id bigint, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 7)], "user_id bigint, ts timestamp, v bigint"
    )
    out = asof_join(left, right, "user_id", "ts", ["v"]).collect()
    assert out[0].v_asof == 7


def test_asof_multiple_payload_columns(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5))], "user_id bigint, event_id bigint, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(2), 9, "x")], "user_id bigint, ts timestamp, v bigint, tag string"
    )
    row = asof_join(left, right, "user_id", "ts", ["v", "tag"]).collect()[0]
    assert (row.v_asof, row.tag_asof) == (9, "x")


def test_interval_join_half_open_and_overlap(spark):
    facts = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(10)), (3, _ts(20))],
        "fid bigint, ts timestamp",
    )
    iv = spark.createDataFrame(
        [("a", _ts(0), _ts(10)), ("b", _ts(5), _ts(25))],
        "iid string, start timestamp, end timestamp",
    )
    got = sorted(
        (r.fid, r.iid) for r in interval_join(facts, iv, "ts").collect()
    )
    # fid=1 at start boundary → inside 'a' (closed start); fid=2 at 'a' end
    # boundary → OUTSIDE 'a' (open end) but inside 'b'; fid=3 only 'b'.
    assert got == [(1, "a"), (2, "b"), (3, "b")]


def test_interval_join_overlapping_windows_duplicate(spark):
    facts = spark.createDataFrame([(1, _ts(7))], "fid bigint, ts timestamp")
    iv = spark.createDataFrame(
        [("a", _ts(0), _ts(10)), ("b", _ts(5), _ts(25))],
        "iid string, start timestamp, end timestamp",
    )
    assert interval_join(facts, iv, "ts").count() == 2


def test_plan_shapes(spark):
    facts = spark.createDataFrame([(1, _ts(7))], "fid bigint, ts timestamp")
    iv = spark.createDataFrame(
        [("a", _ts(0), _ts(10))], "iid string, start timestamp, end timestamp"
    )
    txt = plan_text(interval_join(facts, iv, "ts"), "simple").lower()
    assert "broadcastnestedloopjoin" in txt  # inner side broadcast, no shuffle

    left = spark.createDataFrame(
        [(1, 10, _ts(5))], "user_id bigint, event_id bigint, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(2), 9)], "user_id bigint, ts timestamp, v bigint"
    )
    atxt = plan_text(
        asof_join(left, right, "user_id", "ts", ["v"]), "simple"
    ).lower()
    assert "hashpartitioning(user_id" in atxt
    assert "sortmergejoin" not in atxt and "nestedloop" not in atxt


def test_interval_join_binned_equals_broadcast(spark):
    """The binned equi-join plan must produce EXACTLY the broadcast
    nested-loop's rows — bins partition the match space, they never
    change it — including boundary facts, overlapping intervals,
    multi-bin intervals, and empty intervals (end <= start)."""
    facts = spark.createDataFrame(
        [(i, _ts(m, s)) for i, (m, s) in enumerate(
            [(0, 0), (4, 59), (5, 0), (7, 30), (25, 0), (59, 59)]
        )],
        "fid bigint, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            ("a", _ts(0), _ts(10)),       # spans several 3-min bins
            ("b", _ts(5), _ts(25)),       # overlaps 'a'
            ("c", _ts(7), _ts(7)),        # empty: matches nothing
            ("d", _ts(30), _ts(20)),      # inverted: matches nothing
        ],
        "iid string, start timestamp, end timestamp",
    )
    for how in ("inner", "left"):
        want = sorted(
            (r.fid, r.iid)
            for r in interval_join(facts, iv, "ts", how=how).collect()
        )
        got = sorted(
            (r.fid, r.iid)
            for r in interval_join_binned(
                facts, iv, "ts", bin_seconds=180, how=how
            ).collect()
        )
        assert got == want
        assert want  # non-degenerate fixture


def test_interval_join_binned_plans_as_equi_join(spark):
    """The range condition must ride an EQUI-join on the bin key (hash
    join, fact side never nested-looped) — the whole point of binning."""
    facts = spark.createDataFrame([(1, _ts(7))], "fid bigint, ts timestamp")
    iv = spark.createDataFrame(
        [("a", _ts(0), _ts(10))], "iid string, start timestamp, end timestamp"
    )
    txt = plan_text(
        interval_join_binned(facts, iv, "ts", bin_seconds=180), "simple"
    ).lower()
    assert "broadcastnestedloopjoin" not in txt and "cartesian" not in txt
    assert "__fbin" in txt and "__ibin" in txt


def test_interval_join_binned_rejects_replication_unsafe_modes(spark):
    import pytest

    facts = spark.createDataFrame([(1, _ts(7))], "fid bigint, ts timestamp")
    iv = spark.createDataFrame(
        [("a", _ts(0), _ts(10))], "iid string, start timestamp, end timestamp"
    )
    with pytest.raises(ValueError):
        interval_join_binned(facts, iv, "ts", how="right")
    with pytest.raises(ValueError):
        interval_join_binned(facts, iv, "ts", how="full")
