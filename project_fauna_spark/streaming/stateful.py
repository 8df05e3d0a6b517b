"""Custom stateful streaming operator via ``applyInPandasWithState``.

The escape hatch for stateful logic the built-in window/session
operators can't express — here, a per-user running profile that emits
an updated row per trigger and expires idle users via processing-time
timeout.  State is a compact tuple per key: at scale the state store
shards by key across executors (RocksDB provider in production;
set ``spark.sql.streaming.stateStore.providerClass``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_event_type", T.StringType()),
        T.StructField("expired", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_event_type", T.StringType()),
    ]
)


def _update_user_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this trigger's events into the user's running state."""
    (user_id,) = key
    if state.hasTimedOut:
        n, total, last = state.get
        state.remove()
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "total_value": total,
              "last_event_type": last, "expired": True}]
        )
        return
    n, total, last = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        # Deterministic fold order regardless of batch arrival order.
        pdf = pdf.sort_values("event_id")
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last = str(pdf["event_type"].iloc[-1])
    state.update((n, total, last))
    state.setTimeoutDuration(60_000)  # expire after 60s idle
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "total_value": total,
          "last_event_type": last, "expired": False}]
    )


def user_profile_stream(events: DataFrame) -> DataFrame:
    """events stream → per-user running profile with idle expiry."""
    return (
        events.select("user_id", "event_id", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas: the successor state API (typed state
# variables, timers, RocksDB-backed).  Same per-user EWMA the batch operator
# ts_ewma_bounded computes, expressed as true streaming state.
# ---------------------------------------------------------------------------

EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)


from pyspark.sql.streaming.stateful_processor import StatefulProcessor


class EwmaProcessor(StatefulProcessor):
    """Per-key running EWMA (α = 1/2) via typed ValueState.

    ``transformWithStateInPandas`` requires the RocksDB state store
    provider (set ``spark.sql.streaming.stateStore.providerClass``);
    state per key is two scalars — constant regardless of stream
    length, the property that keeps a 100 TB/day stream's state store
    bounded by keyspace, not traffic.
    """

    def init(self, handle) -> None:
        self._state = handle.getValueState(
            "ewma_state", T.StructType([
                T.StructField("s", T.DoubleType()),
                T.StructField("n", T.LongType()),
            ])
        )

    def handleInputRows(self, key, rows, timerValues) -> "Iterator[pd.DataFrame]":
        s, n = (self._state.get() or (0.0, 0)) if self._state.exists() else (0.0, 0)
        # Rows for one key can span several Arrow chunks: sort the
        # WHOLE batch, not each chunk, or the fold order (and thus
        # the EWMA) would depend on chunk boundaries.
        batch = pd.concat(list(rows), ignore_index=True).sort_values("event_id")
        for v in batch["value"]:
            s = float(v) if n == 0 else 0.5 * float(v) + 0.5 * s
            n += 1
        self._state.update((s, n))
        yield pd.DataFrame([{"user_id": key[0], "n_events": n, "ewma": s}])

    def close(self) -> None:
        pass


def user_ewma_stream(events: DataFrame) -> DataFrame:
    """events stream → per-user running EWMA on the Spark-4 state API."""
    proc = EwmaProcessor()
    return (
        events.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=EWMA_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
