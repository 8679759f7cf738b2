"""Event-sequence operators: gap sessionization, run collapsing (SCD2
reconstruction), and changelog compaction (extension tier).

The reference repo has no event/stream processing at all (SURVEY §2.4 —
its WebLog jobs are plain group-bys over `username date url` triples,
``Jar/UKFlightAnalysis.jar!org/leicester/WebLog1.java:28-59``). These are
the standard event-log operators a training-data / analytics pipeline
layers on top of that surface, expressed with per-key window functions so
every shuffle is ``hashpartitioning(key)`` — never a data-wide
``SinglePartition`` exchange:

- ``sessionize``      : split each key's timeline into sessions separated
                        by silence gaps > ``gap`` (classic web-analytics
                        sessionization). One shuffle on the key; the
                        lag/cumsum windows run inside each key partition.
- ``collapse_runs``   : gaps-and-islands — collapse consecutive rows with
                        the same state into ``[valid_from, valid_to)``
                        intervals, i.e. rebuild an SCD2 dimension from a
                        changelog.
- ``latest_state``    : changelog compaction — the most recent row per
                        key (what a CDC pipeline materializes as the
                        current snapshot).

All comparisons happen on exact int64 microseconds (``unix_micros``), not
float epoch seconds, so session boundaries are bit-stable and match a SQL
oracle's ``INTERVAL`` arithmetic exactly.

Scale notes (100 TB posture): every operator here is a single hash
shuffle on the entity key followed by narrow per-partition windows, so it
scales with the number of keys. Skewed keys (one user with millions of
events) pressure a single task; for that regime, pre-bucket the key by a
coarse time range first, sessionize within buckets, then merge boundary
sessions — the same two-pass trick as ``sequence.global_running_sum``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["sessionize", "session_summary", "collapse_runs", "latest_state"]


def _order_cols(ts_col: str, tiebreak: list[str] | None) -> list[str]:
    return [ts_col, *(tiebreak or [])]


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak: list[str] | None = None,
    out: str = "session_idx",
) -> DataFrame:
    """Assign a 1-based per-key session index; a new session starts when
    the silence since the previous event strictly exceeds ``gap_seconds``.

    Adds column ``out``. Deterministic given a total per-key order
    (``ts_col`` + ``tiebreak`` must be unique within a key).
    """
    order = _order_cols(ts_col, tiebreak)
    w = W.partitionBy(key_col).orderBy(*order)
    micros = F.unix_micros(F.col(ts_col))
    prev = F.lag(micros).over(w)
    new_session = F.when(
        prev.isNull() | (micros - prev > F.lit(int(gap_seconds) * 1_000_000)),
        F.lit(1),
    ).otherwise(F.lit(0))
    w_cum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return df.withColumn(out, F.sum(new_session).over(w_cum))


def session_summary(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Sessionize then aggregate: one row per (key, session) with event
    count and the session's first/last timestamps (as strings, for
    engine-portable hashing) plus whole-second duration."""
    s = sessionize(df, key_col, ts_col, gap_seconds, tiebreak)
    return s.groupBy(key_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.col(ts_col)).cast("string").alias("start_s"),
        F.max(F.col(ts_col)).cast("string").alias("end_s"),
        (
            (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col)))
            / F.lit(1_000_000)
        )
        .cast("long")
        .alias("duration_s"),
    )


def collapse_runs(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Collapse consecutive rows with the same ``state_col`` per key into
    validity intervals (gaps-and-islands / SCD2 reconstruction).

    Returns one row per run: ``key, state, valid_from, valid_to, n_rows``
    where ``valid_to`` is the next run's start (NULL for the current run)
    — half-open ``[valid_from, valid_to)`` intervals. Timestamps are
    emitted as strings for engine-portable hashing.
    """
    order = _order_cols(ts_col, tiebreak)
    w = W.partitionBy(key_col).orderBy(*order)
    change = F.when(
        F.lag(F.col(state_col)).over(w).isNull()
        | (F.lag(F.col(state_col)).over(w) != F.col(state_col)),
        F.lit(1),
    ).otherwise(F.lit(0))
    w_cum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    runs = df.withColumn("__run", F.sum(change).over(w_cum))
    grouped = runs.groupBy(key_col, "__run", state_col).agg(
        F.min(F.col(ts_col)).alias("__from"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    w_next = W.partitionBy(key_col).orderBy("__run")
    return grouped.select(
        F.col(key_col),
        F.col(state_col).alias("state"),
        F.col("__from").cast("string").alias("valid_from"),
        F.lead(F.col("__from")).over(w_next).cast("string").alias("valid_to"),
        "n_rows",
    )


def latest_state(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Changelog compaction: keep only the most recent row per key
    (ROW_NUMBER()==1 descending). One hash shuffle on the key; at scale
    this is the standard CDC-snapshot materialization and benefits from
    partial aggregation only when reduced to max_by — we keep the window
    form because it preserves *all* columns of the winning row.
    """
    order = _order_cols(ts_col, tiebreak)
    w = W.partitionBy(key_col).orderBy(*[F.col(c).desc() for c in order])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
