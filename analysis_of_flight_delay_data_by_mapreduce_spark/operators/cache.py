"""Scoped caching: persist() with deterministic release.

Operators persist intermediates that feed both construction-time actions
(fixpoint probes, stats samples) and the lazily-consumed result, so they
cannot unpersist before returning. Left alone, those blocks accumulate
across a long driver session running many registry queries back-to-back
and pressure executor storage memory.

``scoped_persist`` records every such DataFrame; ``release_stale`` (called
by the query registry before each new query builds) unpersists everything
the previous query left behind. The driver consumes one query fully
before building the next, so at most one query's blocks are ever live.

``localCheckpoint`` blocks (graph.py's closure rounds) are not tracked
here: once a round's DataFrame is unreferenced, Spark's ContextCleaner
unpersists the checkpointed RDD after GC — bounded by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

__all__ = ["scoped_persist", "release_stale"]

_LIVE: list[DataFrame] = []


def scoped_persist(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """persist() that registers the DataFrame for release before the next
    registry query builds."""
    df = df.persist(level) if level is not None else df.persist()
    _LIVE.append(df)
    return df


def release_stale() -> None:
    """Unpersist every DataFrame cached by previous registry queries."""
    for df in _LIVE:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    _LIVE.clear()
