"""Streaming face of DSIR data selection: score each micro-batch of
documents against the twin-trained hashed-n-gram models and keep only
the target-like ones — the continuous-ingest counterpart of
``operators.selection.dsir_select`` (a web-crawl firehose filtered down
to pretraining-quality documents as it lands).

Scoring is per-document against FROZEN literals (the trained
log-ratios), so the decision for a document never depends on which
micro-batch carried it — any batch split yields the same union of
selected rows (the parity contract the tests pin). foreachBatch +
availableNow + an epoch-partitioned idempotent sink follow the
`streaming.dedup` recipe: a blind append would duplicate selections
under epoch replay (foreachBatch alone is at-least-once)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["run_dsir_select_stream"]


def run_dsir_select_stream(
    stream_docs: DataFrame,
    logratios: list[int],
    min_score: int,
    out_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Drive DSIR selection over a document stream: each micro-batch is
    scored against the frozen trained literals and the selected rows
    written to an ``epoch``-partitioned parquet sink via idempotent
    partition overwrite (exactly-once at the sink under epoch replay,
    the ``streaming.dedup`` recipe). ``availableNow`` drains the backlog
    and stops (bounded replay)."""
    from ..operators.selection import dsir_select
    from ..sources.sinks import upsert_partitions

    def _epoch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # dsir_select is batch-shaped for foreachBatch: the score filter
        # sits above a per-batch aggregate, so the score is evaluated
        # once (the fold face would score every row twice under a
        # pushed-down filter — see operators.selection.dsir_scores_agg)
        out = dsir_select(batch_df, id_col, text_col, logratios, min_score)
        upsert_partitions(
            out.withColumn("epoch", F.lit(epoch_id)), out_path, ["epoch"]
        )

    return (
        stream_docs.writeStream.foreachBatch(_epoch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
