"""Streaming incremental dedup: a document stream anti-joined against a
static historical fingerprint index.

The batch face is ``plans.synthetic.dedup_incremental``'s exact stage;
this is its continuous-ingest version: each micro-batch keeps only the
documents whose canonical fingerprint (``operators.text.fingerprint``)
is absent from the historical index, then collapses duplicates WITHIN
the stream. Structured Streaming does not support stream-static
``left_anti``, so the anti join is the canonical ``left_outer`` +
``IS NULL`` rewrite — stateless per micro-batch, the static side joined
fresh each epoch exactly like ``joins.enrich_with_dim``. At 100 TB the
index side is the big stable relation: materialize it bucketed by ``fp``
(``operators.bucketing``) and every epoch's join reuses that layout
shuffle-free, which is what keeps per-epoch cost O(increment).

In-stream dedup uses ``dropDuplicates`` on the fingerprint; bounded
replays (``availableNow``) bound its state. A continuous deployment
should instead carry an event-time column and use
``windows.dedup_events_stream``'s ``dropDuplicatesWithinWatermark``
shape so fingerprint state ages out.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text import fingerprint

__all__ = ["read_documents_stream", "dedup_stream_against_index"]


def read_documents_stream(spark, sf_dir: str) -> DataFrame:
    """The documents table as a bounded file-source stream (schema from a
    driver-side footer read, same recipe as ``windows.read_events_stream``;
    real deployments swap in Kafka/landing-dir sources)."""
    inferred = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).schema
    return (
        spark.readStream.schema(inferred)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


def dedup_stream_against_index(
    new_docs: DataFrame,
    index_docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Keep only stream documents that are exact-new versus the historical
    corpus: fingerprint each arrival, drop it if the fingerprint exists in
    ``index_docs`` (static), then keep one arrival per fingerprint within
    the stream. Works identically on a batch ``new_docs`` frame (no
    streaming branch — the plan is batch/stream agnostic), which is the
    parity contract the test pins.
    Output: the surviving ``new_docs`` rows plus their ``fp`` column.
    """
    fps = fingerprint(new_docs, text_col)
    seen = (
        fingerprint(index_docs, text_col)
        .select("fp")
        .distinct()
        .withColumn("__seen", F.lit(1))
    )
    fresh = (
        fps.join(seen, "fp", "left_outer")
        .filter(F.col("__seen").isNull())
        .drop("__seen")
    )
    return fresh.dropDuplicates(["fp"])
