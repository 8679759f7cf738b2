"""Temporal join operators Spark lacks as primitives: as-of join and
interval (range) join (extension tier).

The reference repo has zero joins of any kind (SURVEY §2.4 — no
join-shaped code in any of its five programs), so this whole module is
additive capability, built the Spark-first way:

- ``asof_join``     : for each left row, the most recent right row with
                      ``right.ts <= left.ts`` per key. Implemented as
                      union + per-key ordered window (``last`` with
                      ignorenulls) — ONE hash shuffle on the key, no
                      range-condition join (which Spark would plan as a
                      broadcast nested loop or a full sort-merge with
                      inequality post-filter). This is the classic
                      changelog-enrichment join (trades joined against
                      latest quote, event against latest profile).
- ``interval_join`` : facts joined to a SMALL set of [start, end)
                      intervals via an explicit ``broadcast()`` hint +
                      range predicate — a broadcast nested-loop whose
                      inner side is tiny, so cost is |facts| × |intervals|
                      comparisons streamed through codegen with zero
                      shuffle of the fact table. At 100 TB this is the
                      only sane plan when intervals fit in memory; for
                      large interval sets, bucket both sides by coarse
                      time grain first and equi-join on the bucket.

Determinism: as-of tie-breaking is explicit (right rows sort before left
rows at equal timestamps, so a simultaneous right row IS visible to the
left row), matching the SQL-window oracle formulation exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join", "interval_join_binned"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    payload_cols: list[str],
    tiebreak: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Enrich each ``left`` row with the latest ``right`` row at-or-before
    its timestamp (per ``key_col``). ``payload_cols`` are the right-side
    columns to carry over; they appear on the output as
    ``<name><suffix>`` (NULL when no prior right row exists).

    Single shuffle: both sides are unioned then window-scanned within
    each key partition. Right rows at the exact same timestamp as a left
    row ARE visible to it (at-or-before semantics).
    """
    payload = F.struct(*[F.col(c) for c in payload_cols]).alias("__p")
    r = right.select(
        F.col(key_col), F.col(ts_col), payload, F.lit(1).alias("__is_r")
    )
    left_cols = [c for c in left.columns]
    l = left.select(
        *left_cols,
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        F.lit(0).alias("__is_r"),
    )
    # align: right side needs the left-only columns as NULLs
    for c in left_cols:
        if c not in (key_col, ts_col):
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    both = l.unionByName(r.select(*l.columns))

    order = [F.col(ts_col).asc(), F.col("__is_r").desc()] + [
        F.col(c).asc() for c in (tiebreak or [])
    ]
    w = (
        W.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    enriched = both.withColumn("__last", F.last("__p", ignorenulls=True).over(w))
    out = enriched.filter(F.col("__is_r") == 0).select(
        *left_cols,
        *[F.col(f"__last.{c}").alias(f"{c}{suffix}") for c in payload_cols],
    )
    return out


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str = "start",
    end_col: str = "end",
    how: str = "inner",
) -> DataFrame:
    """Join fact rows to every interval containing their timestamp
    (half-open ``[start, end)``). The interval side is broadcast — the
    fact table is never shuffled. Overlapping intervals multiply rows
    (each match emits one row), same as the SQL range-predicate join.
    """
    cond = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    return facts.join(F.broadcast(intervals), cond, how)


def interval_join_binned(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str = "start",
    end_col: str = "end",
    bin_seconds: int = 86400,
    how: str = "inner",
) -> DataFrame:
    """Big-big interval join: the scale path when the interval set does
    NOT fit in a broadcast (the regime :func:`interval_join`'s docstring
    defers to). Both sides get a coarse time-bin key and the range match
    becomes an EQUI-join:

    - each interval explodes to every bin it overlaps (an interval of
      length L costs ``ceil(L / bin) + 1`` rows — pick ``bin_seconds``
      near the typical interval length to keep the blow-up ~2x);
    - each fact row lands in exactly ONE bin, so bin-sharing is exact
      partitioning of the match space and no post-join dedup is needed;
    - the exact ``[start, end)`` predicate filters within bin partners.

    Catalyst plans the bin equality as a hash join (shuffle or broadcast
    per AQE stats) instead of the nested-loop a bare range predicate
    forces. Empty intervals (``end <= start``) match nothing, exactly as
    the half-open predicate dictates (Spark ``sequence(hi, lo)`` counts
    DOWN, so they are filtered, not exploded).

    Bin math is exact integer arithmetic on epoch microseconds (no
    double division near bin boundaries).

    Only ``inner`` and ``left`` are supported: a ``right``/``full`` join
    would emit one null-extended row PER BIN REPLICA of an unmatched
    interval (the same replication hazard ``salted_join`` rejects).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"interval_join_binned supports inner/left, got {how!r}"
        )
    w_us = int(bin_seconds) * 1_000_000

    def bin_of(c: Column) -> Column:
        # (us - pmod) is an exact multiple of w_us, and `div` is integer
        # division — exact at ANY timestamp (a double `/` would lose
        # exactness past 2^53 us, ~year 2255)
        us = F.unix_micros(c)
        return F.call_function("div", us - F.pmod(us, F.lit(w_us)), F.lit(w_us))

    fb = facts.withColumn("__fbin", bin_of(F.col(ts_col)))
    iv = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "__ibin",
        F.explode(
            F.sequence(
                bin_of(F.col(start_col)),
                F.call_function(
                    "div",
                    F.unix_micros(F.col(end_col))
                    - 1
                    - F.pmod(F.unix_micros(F.col(end_col)) - 1, F.lit(w_us)),
                    F.lit(w_us),
                ),
            )
        ),
    )
    cond = (
        (fb["__fbin"] == iv["__ibin"])
        & (fb[ts_col] >= iv[start_col])
        & (fb[ts_col] < iv[end_col])
    )
    return fb.join(iv, cond, how).drop("__fbin", "__ibin")
