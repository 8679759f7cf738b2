"""Custom stateful streaming operators via ``applyInPandasWithState``.

Where ``window``/``session_window`` (windows.py) cover time-bucketed state,
this is the arbitrary-state surface: per-key state that survives across
micro-batches, with explicit timeout control. The example operator keeps
running per-user totals — the shape of any incremental feature/counter
pipeline (fraud counters, rate limits, per-source ingest accounting).

Scale notes: state lives in the executor state store partitioned by key
(no driver state); per-batch work is Arrow-batched pandas on just that
batch's rows. Watermark + timeout bound state growth.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["running_user_totals", "running_user_totals_tws"]

_OUT_SCHEMA = "user_id long, n_events long, value_cents long"
_STATE_SCHEMA = "n_events long, value_cents long"


def _update_totals(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in batches:
        n += len(pdf)
        cents += int(pdf["__cents"].sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "value_cents": [cents]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Running (event count, cent-exact value total) per user, updated each
    micro-batch. Works only on streaming DataFrames (state requires the
    incremental execution engine); the batch equivalent is a plain
    ``groupBy(user_id).agg(...)`` — asserted equal in tests."""
    prepared = events.select(
        "user_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("__cents"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# The same operator on Spark 4's transformWithStateInPandas — the successor
# arbitrary-state API (typed state handles: ValueState/ListState/MapState,
# TTL, timers) backed by the RocksDB state store. Kept alongside
# applyInPandasWithState so both stateful surfaces are exercised; a real
# deployment picks ONE (TWS for new pipelines).
# ---------------------------------------------------------------------------
try:  # pragma: no cover - import guard
    # transformWithState needs BOTH the Spark 4 API and google.protobuf
    # (its state-server wire protocol; the TWS driver worker imports it at
    # query start). protobuf is not in this container, so the operator is
    # gated — the code documents the production shape and activates the
    # moment the dependency exists.
    import google.protobuf  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    _HAS_TWS = True
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]
    _HAS_TWS = False


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """``running_user_totals`` on the transformWithStateInPandas API.

    Same semantics as the applyInPandasWithState version. EXPERIMENTAL /
    UNVERIFIED HERE: the parity test (test_stateful_streaming.py)
    importorskips on google.protobuf, which this image lacks, so this
    path has never executed in this environment — do not assume parity
    until the skip count is zero. Requires the RocksDB state store
    provider (``session.get_spark`` config or per-query option).
    """
    if not _HAS_TWS:  # pragma: no cover
        raise NotImplementedError(
            "transformWithState requires Spark >= 4.0 and google.protobuf"
        )

    # Defined inside the function so cloudpickle serializes the class BY
    # VALUE: transformWithState runs a dedicated driver-side Python worker
    # that unpickles the processor WITHOUT this package on its import
    # path (unlike executor workers, it does not inherit sys.path).
    class _RunningTotalsProcessor(StatefulProcessor):
        """Per-user running (count, cent total) in a ValueState handle.

        State is one fixed-width row per key in the executor-local RocksDB
        store — O(|keys|) state, zero driver involvement, exactly the
        shape that scales to a billion-user stream.
        """

        def init(self, handle: "StatefulProcessorHandle") -> None:
            self._totals = handle.getValueState(
                "totals", "n_events long, value_cents long"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, cents = self._totals.get() if self._totals.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                cents += int(pdf["__cents"].sum())
            self._totals.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "value_cents": [cents]}
            )

        def close(self) -> None:
            pass

    prepared = events.select(
        "user_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("__cents"),
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        _RunningTotalsProcessor(),
        outputStructType=_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
