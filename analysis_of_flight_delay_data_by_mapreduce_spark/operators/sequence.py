"""Scalable global ordering operators: distributed prefix sums and
training-sequence chunking (extension tier).

The naive way to compute a global running sum is ``Window.orderBy(key)``
with no partition — Spark plans that as ``Exchange SinglePartition``: one
task receives the whole table. These operators use the classic two-pass
distributed prefix-sum instead:

1. range-partition by the order key (parallel, sorted between partitions);
2. per-partition running sum (narrow window inside each partition);
3. tiny per-partition totals → cumulative offsets (rows = #partitions),
   broadcast back and added.

The result equals the single-partition answer for ANY partition boundary
placement, so it is deterministic and partitioning-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["global_running_sum", "pack_chunks"]


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

    part = (
        df.withColumn("__v", v)
        .repartitionByRange(n_part, F.col(order_col))
        .withColumn("__pid", F.spark_partition_id())
    )
    w_local = (
        W.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # ``local`` feeds two branches (offsets + final join). Persist it:
    # re-executing the range exchange per branch can RE-SAMPLE partition
    # boundaries, making ``spark_partition_id`` disagree between branches
    # (observed: wrong sums at some partition counts). One materialization
    # pins the boundaries; a production job would checkpoint this shard.
    local = part.withColumn("__local", F.sum("__v").over(w_local)).persist()

    totals = local.groupBy("__pid").agg(F.max("__local").alias("__total"))
    w_off = (
        W.orderBy("__pid").rowsBetween(W.unboundedPreceding, W.currentRow)
    )  # single partition — but over #partitions rows, not the data
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
