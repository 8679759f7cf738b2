"""Table profiling (extension tier): per-column statistics in ONE pass.

The data-quality step of every ingestion pipeline: row count, null count,
exact distinct count, min/max per column. All columns are profiled in a
single aggregation over one scan (Catalyst evaluates the whole batch of
aggregates in one HashAggregateExec), then the 1-row result is unpivoted
with ``stack`` — so profiling a 100 TB table costs one scan + one
1-row-per-column shuffle, not one job per column.

Exact ``count_distinct`` is used (oracle-comparable); swap
``approx_count_distinct`` for the HLL path when a ±2% answer is enough —
same single-pass shape, no second scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns"]


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Profile ``cols`` → one row per column:
    ``column, n_rows, n_null, n_distinct, min_val, max_val`` (min/max as
    strings so heterogeneous column types stack into one frame).
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}"),
            F.count_distinct(F.col(c)).alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __null_{c}, __dist_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return one.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_null, n_distinct, min_val, max_val)"
        ),
    ).select("column", "n_rows", "n_null", "n_distinct", "min_val", "max_val")
