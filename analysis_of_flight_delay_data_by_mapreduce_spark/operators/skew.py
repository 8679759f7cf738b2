"""Skew-aware aggregation (100 TB posture, SURVEY §7.3).

A hot grouping key concentrates a whole partition's worth of rows on one
reducer. AQE's skew-join handling covers joins; for aggregations the
standard remedy is salting — pre-aggregate on (key, salt) so the hot key's
rows split across ``n_salts`` tasks, then finish on the key alone.

Only algebraic aggregates decompose this way (sum/count/min/max — the ones
the reference's pipelines need). For Q1/Q2-shaped workloads Spark's own
partial aggregation already does map-side combining; salting matters when
the *post-shuffle* per-key state is the bottleneck (billions of rows on one
key, or high-cardinality distinct-count state under one key).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_sum_count"]


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    sums: dict[str, Column],
    n_salts: int = 16,
    count_out: str | None = "n",
) -> DataFrame:
    """Two-stage salted aggregation: SUMs (and a row count) per ``keys``.

    Stage 1 groups by (keys, random salt in [0, n_salts)) — the hot key's
    rows spread over ``n_salts`` reducers; stage 2 re-sums the partials by
    the bare keys. Both stages are partial-aggregated by Spark, so the
    extra cost is one narrow pass over ``n_salts ×`` fewer rows.

    ``sums``: output name → per-row column expression to sum. Results are
    identical to the unsalted groupBy for these algebraic aggregates
    (int64-exact when the inputs are, per the engine's determinism
    contract).
    """
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("__salt")
    stage1 = df.select(
        *[F.col(k) for k in keys],
        salt,
        *[expr.alias(f"__v_{name}") for name, expr in sums.items()],
    )
    partial_aggs = [F.sum(f"__v_{name}").alias(f"__p_{name}") for name in sums]
    if count_out:
        partial_aggs.append(F.count(F.lit(1)).alias("__p_cnt"))
    partial = stage1.groupBy(*keys, "__salt").agg(*partial_aggs)

    final_aggs = [F.sum(f"__p_{name}").alias(name) for name in sums]
    if count_out:
        final_aggs.append(F.sum("__p_cnt").alias(count_out))
    return partial.groupBy(*keys).agg(*final_aggs)
