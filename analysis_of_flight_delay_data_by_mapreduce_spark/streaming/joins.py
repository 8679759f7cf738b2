"""Stream-stream joins (Structured Streaming extension tier).

The reference is batch-only (SURVEY §2.4). This adds the canonical
event-correlation shape: join two event streams on a key within a time
interval. Both sides carry watermarks plus a time-range join condition, so
Spark bounds the join state on both sides (rows age out once the watermark
passes the range) — the requirement for an unbounded 100 TB/day stream.

The transform takes plain DataFrames: the same function serves batch
frames (``withWatermark`` is a no-op requirement there), which is what the
stream==batch parity test exploits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join_streams"]


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "1 hour",
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner-join ``left`` and ``right`` events sharing ``key`` where the
    right event lands in ``[left.ts, left.ts + within]``.

    Output: ``key, l_ts, r_ts`` (both event times, exact microseconds).
    State stays bounded because BOTH sides are watermarked and the join
    condition is a closed time range — Spark derives the state-eviction
    watermark from the range arithmetic.
    """
    l = left.select(
        F.col(key).alias("__lk"), F.col(ts_col).alias("l_ts")
    ).withWatermark("l_ts", watermark)
    r = right.select(
        F.col(key).alias("__rk"), F.col(ts_col).alias("r_ts")
    ).withWatermark("r_ts", watermark)
    joined = l.join(
        r,
        (F.col("__lk") == F.col("__rk"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}")),
    )
    return joined.select(F.col("__lk").alias(key), "l_ts", "r_ts")


def enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    on_left: str = "user_id",
    on_right: str = "c_custkey",
    how: str = "inner",
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    (re-read per batch) static dimension — no state store involved, the
    dimension is broadcast into every batch. The canonical lookup-table
    pattern; works identically on a batch left side.
    """
    from pyspark.sql import functions as F

    return stream.join(
        F.broadcast(dim), stream[on_left] == dim[on_right], how
    )
