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

__all__ = ["salted_sum_count", "salted_join"]


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


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    salt_from: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe big-big equi-join: spread a hot join key across
    ``n_salts`` reducers by salting the FACT side with a deterministic
    hash of ``salt_from`` (a fact column that varies within a key — an
    event id, a timestamp) and replicating every DIM row once per salt.
    Joining on ``(key, salt)`` splits a key with a billion fact rows
    over ``n_salts`` tasks at the cost of ``n_salts``x the (smaller)
    dim shuffle — the standard remedy when AQE's skew splitting cannot
    apply (it only splits sort-merge partitions; a hash-partitioned
    stateful consumer, bucketed table, or storage-partitioned join
    pins the layout).

    Row-identical to the plain join: every fact row meets exactly the
    one replica of its dim row that carries its salt. Only ``inner``
    and ``left`` survive replication unchanged (``right``/``full``
    would emit one null-extended row PER REPLICA of an unmatched dim
    row); others are rejected.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    salt = F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))
    f = facts.withColumn("__salt", salt.cast("int"))
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return f.join(d, [key_col, "__salt"], how).drop("__salt")
