"""Count-min sketch: the mergeable frequency sketch (Cormode &
Muthukrishnan, J. Algorithms 2005) completing the sketch tier next to
the HLL distinct-count and theta set-algebra rollups.

At 100 TB the pattern is the same as the HLL tier's: daily jobs
materialize a tiny ``depth × width`` counter grid per partition key;
any later window's term-frequency question is answered by summing
sketches cell-wise (*mergeability is exact* — the grid is a linear
projection of the data) and taking the per-term column minimum, instead
of rescanning raw tokens. Guarantees: ``estimate ≥ true`` always (a
deterministic invariant — counters only over-count, never under-count),
and ``estimate ≤ true + εN`` with probability ``1 − e^{−depth}`` where
``ε = e / width`` and ``N`` is the total item count.

All hashing is JVM-side ``xxhash64(seed, item)``; the build is one
explode + one partial-aggregated shuffle keyed on (seed, cell).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_build", "cms_estimate", "cms_merge"]


def _cell(seed: Column, item: Column, width: int) -> Column:
    return F.pmod(F.xxhash64(seed, item), F.lit(width))


def cms_build(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Sketch the multiset of ``item_col`` values into a ``depth × width``
    counter grid: rows ``(seed, cell, cnt)``, empty cells omitted (they
    read as 0). One explode over the seed family + one shuffle keyed on
    (seed, cell) — ≤ depth·width output rows no matter the input size.
    """
    seeds = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("seed")
    entries = df.select(F.col(item_col).alias("__item"), seeds).select(
        "seed", _cell(F.col("seed"), F.col("__item"), width).alias("cell")
    )
    return entries.groupBy("seed", "cell").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    out: str = "est",
) -> DataFrame:
    """Point frequency estimates for each probe item: the minimum of the
    item's ``depth`` counter cells. The probe frame is tiny (it names the
    terms you are asking about), so the join broadcasts it; a missing
    cell row reads as count 0."""
    seeds = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("seed")
    cells = probes.select(F.col(item_col), seeds).select(
        item_col,
        "seed",
        _cell(F.col("seed"), F.col(item_col), width).alias("cell"),
    )
    return (
        cells.join(sketch, ["seed", "cell"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of sketches built with the same (depth, width) —
    exactly the sketch of the concatenated inputs (the grid is linear in
    the data), which is what makes per-day sketches roll up into any
    window for free."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("seed", "cell").agg(F.sum("cnt").alias("cnt"))
