"""Scalable global ordering operators: distributed prefix sums and
training-sequence chunking (extension tier).

The naive way to compute a global running sum is ``Window.orderBy(key)``
with no partition — Spark plans that as ``Exchange SinglePartition``: one
task receives the whole table. These operators use the classic two-pass
distributed prefix-sum instead:

1. assign each row a range bucket from **data-derived, plan-literal
   boundaries** (sampled once on the driver, bounded size);
2. per-bucket running sum (narrow window inside each bucket);
3. tiny per-bucket totals → cumulative offsets (rows = #buckets),
   broadcast back and added.

Determinism note: an earlier version derived the bucket from
``spark_partition_id()`` after ``repartitionByRange`` and pinned the
(sampled, nondeterministic) range boundaries with ``persist()``. That is
only *advisory* — an evicted block re-runs the exchange with re-sampled
boundaries, so two actions over the same DataFrame (e.g. a count and a
hash) could observe different bucket assignments. Deriving the bucket
from the DATA via literal boundaries makes the result a pure function of
the input: stable across actions, retries, and partition counts.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["global_running_sum", "pack_chunks", "range_bucket"]

_SAMPLE_PER_BUCKET = 64  # sampled keys per target bucket when picking boundaries


def range_bucket(df: DataFrame, order_col: str, n_buckets: int) -> Column:
    """Return a Column assigning each row a range-bucket id in
    ``[0, n_buckets)`` such that every key in bucket i sorts before every
    key in bucket i+1 (NULLS FIRST, matching Spark/DuckDB ASC ordering).

    Boundaries are computed ONCE here via a bounded sample
    (``n_buckets * 64`` keys collected to the driver, ~KBs even for a
    100 TB input) and baked into the plan as literals — the assignment is
    a pure function of the row, so it is deterministic across actions.
    """
    n = df.count()
    if n == 0 or n_buckets <= 1:
        return F.lit(0)
    target = n_buckets * _SAMPLE_PER_BUCKET
    fraction = min(1.0, target / n)
    keys = sorted(
        r[0]
        for r in df.select(order_col).sample(False, fraction, seed=42).collect()
        if r[0] is not None
    )
    if not keys:
        return F.lit(0)
    step = max(1, len(keys) // n_buckets)
    boundaries: list = []
    for i in range(step, len(keys), step):
        b = keys[i]
        if not boundaries or b != boundaries[-1]:
            boundaries.append(b)
    boundaries = boundaries[: n_buckets - 1]
    if not boundaries:
        return F.lit(0)
    # bucket = #boundaries strictly below the key; NULL keys sort first → 0.
    key = F.col(order_col)
    return reduce(
        lambda acc, b: acc + F.when(key > F.lit(b), 1).otherwise(0),
        boundaries,
        F.lit(0),
    )


def global_running_sum(
    df: DataFrame,
    order_col: str,
    value_col: str | Column,
    out: str = "running",
    num_partitions: int | None = None,
) -> DataFrame:
    """Running sum of ``value_col`` over the global ``order_col`` order,
    inclusive of the current row — without a single-partition shuffle."""
    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    v = F.col(value_col) if isinstance(value_col, str) else value_col

    part = df.withColumn("__v", v).withColumn(
        "__pid", range_bucket(df, order_col, n_part)
    )
    w_local = (
        W.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = part.withColumn("__local", F.sum("__v").over(w_local))

    totals = local.groupBy("__pid").agg(F.max("__local").alias("__total"))
    w_off = (
        W.orderBy("__pid").rowsBetween(W.unboundedPreceding, W.currentRow)
    )  # single partition — but over #buckets rows, not the data
    offsets = totals.withColumn(
        "__offset", F.coalesce(F.sum("__total").over(w_off) - F.col("__total"), F.lit(0))
    ).select("__pid", "__offset")

    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out, F.col("__local") + F.col("__offset"))
        .drop("__pid", "__local", "__offset", "__v")
    )


def pack_chunks(
    df: DataFrame,
    order_col: str,
    token_col: str | Column,
    max_tokens: int,
    out: str = "chunk_id",
) -> DataFrame:
    """Assign documents (in global ``order_col`` order) to fixed-budget
    training chunks: document d goes to chunk ``floor(prefix_tokens(d) /
    max_tokens)`` where the prefix EXCLUDES d itself — the streaming
    "start a new sequence when the budget would overflow" rule, made
    deterministic and partitioning-independent by the exact global prefix
    sum. Documents longer than ``max_tokens`` occupy their own chunk(s).
    """
    with_run = global_running_sum(df, order_col, token_col, out="__cum")
    t = F.col(token_col) if isinstance(token_col, str) else token_col
    chunk = ((F.col("__cum") - t) / max_tokens).cast("long")
    return with_run.withColumn(out, chunk).drop("__cum")
