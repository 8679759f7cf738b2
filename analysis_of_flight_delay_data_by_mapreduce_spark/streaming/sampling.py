"""Streaming face of A-ES weighted sampling: maintain the exact
weighted-without-replacement top-k per group over a document stream
with BOUNDED state — the continuous-ingest counterpart of
``operators.selection.weighted_sample_topk`` (a rolling, length-weighted
eval/inspection sample that is always the sample of everything ingested
so far).

Why this streams exactly: the A-ES key is a pure per-row function
(md5-derived u, ``ln(u)/w`` micro-quantized), so the union's top-k is
computable from any partition of the stream into batches —
``merge(topk(state), topk(batch)) == topk(state ∪ batch)``
(:func:`~analysis_of_flight_delay_data_by_mapreduce_spark.operators.selection.weighted_sample_merge`,
driver-witnessed by the ``docs_weighted_sample_merge_check`` oracle
face). State is ``groups × k`` rows — never data-sized.

Epoch replay (foreachBatch is at-least-once): each epoch writes the
FULL merged selection under ``epoch=E``, computed from the latest state
with epoch < E — so replaying E reads the same predecessor and
overwrites ``epoch=E`` with identical rows (the merge also collapses
duplicate ids, so even a state that somehow already contains the
batch's rows merges to the same top-k). A crashed partial ``epoch=E``
write is simply overwritten on replay and never read as a predecessor
by E itself. One tiny directory per epoch (bounded by ``groups × k``
rows each); an ``availableNow`` drain is bounded by the backlog, and a
real deployment compacts old epochs or swaps in a table-format MERGE.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "compact_sample_state",
    "latest_sample_state",
    "run_weighted_sample_stream",
]


def _epochs_on_disk(state_path: str) -> list[int]:
    if not os.path.isdir(state_path):
        return []
    out = []
    for name in os.listdir(state_path):
        m = re.fullmatch(r"epoch=(\d+)", name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def latest_sample_state(
    spark: SparkSession, state_path: str, before: int | None = None
) -> DataFrame | None:
    """The most recent epoch's selection (optionally restricted to
    epochs strictly below ``before`` — what an epoch handler must read
    so a replayed epoch sees the same predecessor it saw the first
    time). Reads the one epoch subdirectory directly — ``groups × k``
    rows, no partition discovery over the epoch history."""
    epochs = _epochs_on_disk(state_path)
    if before is not None:
        epochs = [e for e in epochs if e < before]
    if not epochs:
        return None
    return spark.read.parquet(f"{state_path}/epoch={epochs[-1]}")


def compact_sample_state(state_path: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest ``keep_last`` epoch directories (each
    epoch's selection is COMPLETE — it already merged its predecessor —
    so older epochs are pure history, not state). Keeping >= 2 leaves
    the newest epoch's predecessor in place, so an at-least-once replay
    of the newest epoch after a compaction still reads the same
    predecessor it read the first time. Returns the removed epoch ids.
    Run between drains, not concurrently with an active stream."""
    import shutil

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1 (got {keep_last})")
    epochs = _epochs_on_disk(state_path)
    drop = epochs[:-keep_last] if keep_last < len(epochs) else []
    for e in drop:
        shutil.rmtree(os.path.join(state_path, f"epoch={e}"))
    return drop


def run_weighted_sample_stream(
    stream_docs: DataFrame,
    group_cols: list[str],
    id_col: str,
    weight_col: str,
    k: int,
    state_path: str,
    checkpoint: str,
):
    """Drive the rolling weighted sample over a stream: per micro-batch,
    select the batch's per-group top-k (bounded), merge with the
    previous epoch's state (bounded), write the merged selection under
    ``epoch=<id>`` via idempotent partition overwrite. After the drain,
    ``latest_sample_state(spark, state_path)`` IS the exact A-ES
    selection over everything ingested — equal to the batch operator on
    the union (parity pinned in ``tests/test_streaming.py``).
    ``availableNow`` drains the backlog and stops (bounded replay)."""
    from ..operators.selection import weighted_sample_merge, weighted_sample_topk
    from ..sources.sinks import upsert_partitions

    cols = list(group_cols) + [id_col, weight_col]

    def _epoch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        parts = [
            weighted_sample_topk(
                batch_df.select(*cols), group_cols, id_col, weight_col, k
            )
        ]
        prev = latest_sample_state(
            batch_df.sparkSession, state_path, before=epoch_id
        )
        if prev is not None:
            parts.append(prev.select(*parts[0].columns))
        merged = weighted_sample_merge(parts, group_cols, id_col, k)
        upsert_partitions(
            merged.withColumn("epoch", F.lit(epoch_id)), state_path, ["epoch"]
        )

    return (
        stream_docs.writeStream.foreachBatch(_epoch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
