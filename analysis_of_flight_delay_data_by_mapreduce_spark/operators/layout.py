"""Data-layout operators: multi-dimensional clustering for scan pruning.

Parquet scans prune at file/row-group granularity from column min/max
statistics, so WHERE-clause selectivity only turns into I/O savings if
rows with nearby values sit in the same files. A sort by one column
gives perfect pruning on that column and none on the others; Z-ordering
(bit-interleaved Morton curve, the technique behind Delta/Iceberg
``OPTIMIZE ZORDER BY``) spreads locality across several columns at once
— every participating column's min/max range per file stays narrow, so
a selective predicate on ANY of them skips most files. At 100 TB this
is the difference between scanning a table and scanning a few percent
of it for multi-dimensional slice queries.

Everything here is plain DataFrame/Catalyst work: the only driver-side
data movement is the per-column cell boundaries (one min/max row, or
≤ 2^bits − 1 approx-quantile doubles per column — bounded metadata, same
class as the range-bucket boundaries in ``operators.sequence``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "zorder_write"]


def _linear_cell(col: Column, lo: float | None, hi: float | None, bits: int) -> Column:
    """Scale a numeric column to an integer cell id in [0, 2^bits).

    NULL values land in cell 0 (matching ``_quantile_cell``, whose fold
    counts zero boundary hits for NULL); an empty / all-NULL column has
    ``lo is None`` and degenerates to the constant-column case.
    """
    cells = (1 << bits) - 1
    if lo is None or hi is None or hi <= lo:
        # constant / empty / all-NULL column: everything lands in cell 0
        return F.lit(0).cast("bigint")
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0))
    cell = F.round(clamped * F.lit(float(cells)), 0).cast("bigint")
    return F.coalesce(cell, F.lit(0).cast("bigint"))


def _quantile_cell(col: Column, bounds: list[float]) -> Column:
    """Equi-depth cell id: how many quantile boundaries the value meets.

    One fold over the ≤ 2^bits − 1 boundary literals per row (loop
    codegen). Equi-depth matters on skewed columns: linear min/max
    scaling hands most of the curve's resolution to empty cells above
    the bulk of a long-tailed distribution, so the interleave degrades
    to single-column ordering; rank-scaled cells keep every dimension's
    bits discriminative regardless of the distribution.
    """
    distinct_bounds = sorted(set(bounds))
    if not distinct_bounds:  # constant column
        return F.lit(0).cast("bigint")
    arr = F.array(*[F.lit(float(b)) for b in distinct_bounds])
    return F.aggregate(
        arr,
        F.lit(0).cast("bigint"),
        lambda acc, b: acc
        + F.when(col.cast("double") >= b, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        ),
    )


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 6,
    out: str = "__z",
    strategy: str = "quantile",
) -> DataFrame:
    """Append the Morton (Z-order) key over ``cols``.

    ``strategy="quantile"`` (default) rank-scales each dimension with
    equi-depth boundaries from ``approxQuantile`` — ≤ 2^bits − 1 doubles
    per column driver-side (bounded metadata, same class as the
    range-bucket boundaries in ``operators.sequence``; persist them next
    to the table when the layout is rebuilt incrementally).
    ``strategy="linear"`` uses one global min/max row instead — cheaper,
    correct for roughly-uniform columns, degenerate on skewed ones. Bit
    interleave runs as one Catalyst ``aggregate`` fold over bit
    positions — loop codegen, O(1) plan size in ``bits``. Total key
    width ``bits × len(cols)`` must stay < 63.
    """
    if bits * len(cols) > 62:
        raise ValueError(f"z-key too wide: {bits} bits × {len(cols)} cols")
    if strategy == "quantile":
        n_cells = 1 << bits
        probs = [i / n_cells for i in range(1, n_cells)]
        per_col = df.stat.approxQuantile(cols, probs, 1.0 / (4 * n_cells))
        cells = F.array(
            *[_quantile_cell(F.col(c), per_col[i]) for i, c in enumerate(cols)]
        )
    elif strategy == "linear":
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
        ranges = df.agg(*aggs).first()

        def _f(v):  # min/max of an empty or all-NULL column is None
            return None if v is None else float(v)

        cells = F.array(
            *[
                _linear_cell(
                    F.col(c),
                    _f(ranges[f"__lo_{c}"]),
                    _f(ranges[f"__hi_{c}"]),
                    bits,
                )
                for c in cols
            ]
        )
    else:
        raise ValueError(f"unknown zorder strategy {strategy!r}")
    ncols = len(cols)
    one = F.lit(1).cast("bigint")

    def _interleave(acc: Column, b: Column) -> Column:
        contrib = None
        for i in range(ncols):
            bit = F.call_function(
                "shiftright", F.element_at(cells, i + 1), b.cast("int")
            ).bitwiseAND(one)
            placed = F.call_function(
                "shiftleft", bit, (b * ncols + i).cast("int")
            )
            contrib = placed if contrib is None else contrib + placed
        return acc + contrib

    z = F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("bigint"),
        _interleave,
    )
    return df.withColumn(out, z)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 6,
    n_files: int = 32,
    strategy: str = "quantile",
) -> None:
    """Write ``df`` as parquet clustered on the Z-order of ``cols``.

    ``repartitionByRange`` on the key puts contiguous curve segments in
    the same file (range exchange, sampled boundaries — no single-task
    sort), and the within-partition sort tightens row-group stats. The
    key column itself is dropped from the output: it is layout, not data.
    """
    keyed = zorder_key(df, cols, bits, strategy=strategy)
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
