"""Streaming sinks: exactly-once-per-partition lake writes.

Structured Streaming's file sink is append-only; aggregation streams
need upsert semantics. The canonical pattern is ``foreachBatch`` +
idempotent partition overwrite (``sources.sinks.upsert_partitions``):
each micro-batch replaces exactly the hive partitions it contains, so a
replayed epoch (driver retry, checkpoint recovery) rewrites the same
partitions with the same data instead of duplicating. Update output mode
emits each group's complete current value, and the partition layout is
the group key — together that makes the write idempotent at partition
granularity without a table format. (Layering Delta/Iceberg MERGE swaps
into the same foreachBatch slot.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "stream_daily_type_counts_upsert",
    "stream_daily_quantile_grid_upsert",
    "stream_daily_cms_upsert",
]


def stream_daily_type_counts_upsert(
    events: DataFrame,
    path: str,
    checkpoint: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    watermark: str = "1 day",
) -> None:
    """Maintain a (day, event_type)-partitioned parquet rollup of event
    counts from a stream, exactly-once per partition.

    Blocks until the ``availableNow`` run drains (test/batch-parity
    harness shape; a production job would omit the trigger and run
    continuously). State is bounded by the watermark; the sink partition
    key equals the aggregation key, which is what makes the dynamic
    partition overwrite idempotent under replay.
    """
    from ..sources.sinks import upsert_partitions

    agg = (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 day").alias("__w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.to_date(F.col("__w.start")).alias("day"), key_col, "n"
        )
    )

    def _upsert(batch_df: DataFrame, _epoch: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_partitions(batch_df, path, ["day", key_col])

    (
        agg.writeStream.outputMode("update")
        .foreachBatch(_upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def stream_daily_quantile_grid_upsert(
    events: DataFrame,
    path: str,
    checkpoint: str,
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "1 day",
) -> None:
    """Maintain a day-partitioned mergeable QUANTILE-SKETCH grid from an
    event stream, exactly-once per partition — the streaming face of
    ``operators.sketch.qsketch_build`` (values are rounded to integer
    cents first, the engine's exact-money pattern).

    Each micro-batch updates only the (day, shift, sub) cells it touched
    (update mode + watermark keeps state bounded); the sink partition key
    equals the FULL aggregation key, so the dynamic partition overwrite
    is idempotent under epoch replay — the same contract as
    ``stream_daily_type_counts_upsert``. One parquet directory per grid
    cell per day is bounded by the grid (≤ ~1k cells/day), not the data;
    a table-format MERGE collapses the layout when available. Any
    window's quantile question is then answered by ``qsketch_merge`` +
    ``qsketch_quantiles`` over the day grids — no raw-event rescan.
    """
    from ..operators.sketch import with_qsketch_bucket
    from ..sources.sinks import upsert_partitions

    cents = F.round(F.col(value_col) * 100, 0).cast("bigint")
    bucketed = with_qsketch_bucket(
        events.withColumn("__cents", cents), "__cents"
    )
    agg = (
        bucketed.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 day").alias("__w"), "shift", "sub")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.to_date(F.col("__w.start")).alias("day"), "shift", "sub", "cnt")
    )

    def _upsert(batch_df: DataFrame, _epoch: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_partitions(batch_df, path, ["day", "shift", "sub"])

    (
        agg.writeStream.outputMode("update")
        .foreachBatch(_upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def stream_daily_cms_upsert(
    docs: DataFrame,
    path: str,
    checkpoint: str,
    ts_col: str = "ts",
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
    watermark: str = "1 day",
) -> None:
    """Maintain a day-partitioned COUNT-MIN grid over a token stream,
    exactly-once per partition — the streaming face of
    ``operators.sketch.cms_build``, completing the mergeable-sketch
    streaming trio next to the count and quantile-grid sinks.

    Each micro-batch updates only the (day, seed, cell) cells its tokens
    touched (update mode + watermark keeps state bounded at ≤
    depth·width live cells per open day); the sink partition key equals
    the FULL aggregation key, so the dynamic partition overwrite is
    idempotent under epoch replay. The directory count is bounded by the
    grid (≤ depth·width per day), not the data — a table-format MERGE
    collapses the layout when available. Any window's term-frequency
    question is then ``cms_merge`` + ``cms_estimate`` over the day grids
    — no raw-token rescan, the same 100 TB rollup pattern as the batch
    tier.
    """
    from ..functions import word_tokens
    from ..operators.sketch import _cell
    from ..sources.sinks import upsert_partitions

    # one generator per select clause: tokens first, then the seed family
    toks = docs.select(
        F.col(ts_col),
        F.explode(word_tokens(F.col(text_col))).alias("__tok"),
    ).select(
        ts_col,
        "__tok",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("seed"),
    )
    agg = (
        toks.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, "1 day").alias("__w"),
            "seed",
            _cell(F.col("seed"), F.col("__tok"), width).alias("cell"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.to_date(F.col("__w.start")).alias("day"), "seed", "cell", "cnt"
        )
    )

    def _upsert(batch_df: DataFrame, _epoch: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_partitions(batch_df, path, ["day", "seed", "cell"])

    (
        agg.writeStream.outputMode("update")
        .foreachBatch(_upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
