"""Custom stateful streaming operator (SURVEY §2B streaming;
``applyInPandasWithState``).

The reference processes each document incrementally within a request-scoped
session (app/parser.py:212-252); the streaming analog is per-key running
state that survives across micro-batches: a progress tracker accumulating
event counts/values per key, emitting the updated running totals whenever
the key appears in a batch, and expiring idle keys via processing-time
timeout (bounded state — the operational requirement at scale).
"""
from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_OUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _make_update_running(expire_idle: bool):
    def _update_running(
        key: Tuple[str],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, float(total)))
        if expire_idle:
            # idle keys expire after 30 min of processing time → bounded state
            state.setTimeoutDuration(30 * 60 * 1000)
        yield pd.DataFrame(
            {"key": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return _update_running


def running_totals_with_state(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    value_col: str = "value",
    expire_idle: bool = True,
) -> DataFrame:
    """Per-key running (count, sum) maintained across micro-batches with
    processing-time state expiry. Input needs `key_col` and a numeric
    `value_col`; emits one updated row per key per batch (Update mode).

    ``expire_idle=False`` disables the processing-time timeout: pending
    timers keep an availableNow query alive past its data, so bounded
    finite runs (bench/correctness harnesses) opt out, while long-running
    deployments keep the expiry for bounded state."""
    from pyspark.sql import functions as F

    keyed = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _make_update_running(expire_idle),
        outputStructType=RUNNING_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if expire_idle
            else GroupStateTimeout.NoTimeout
        ),
    )


def _make_running_totals_processor():
    """StatefulProcessor for the Spark 4 transformWithState API — the
    successor of applyInPandasWithState with typed composable state
    (value/list/map), timers, and state schema evolution.

    Built lazily: instantiating it needs only pyspark, but RUNNING it
    requires (a) the RocksDB state-store provider and (b) the
    `google.protobuf` package for the state-server wire protocol —
    absent in this sandbox, so the operator follows the same
    sandbox-blocked-kernel discipline as pdfalto/LibreOffice: real
    plumbing, gated test (tests/test_streaming.py skips without
    protobuf), no registered driver query.
    """
    import pandas as pd  # noqa: F811 — local to keep import cost off the hot path
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "tot", "n BIGINT, total DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, float(total)))
            yield pd.DataFrame(
                {
                    "key": [str(key[0])],
                    "n_events": [n],
                    "total_value": [total],
                }
            )

        def close(self) -> None:
            pass

    return RunningTotalsProcessor()


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def running_totals_transform_with_state(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) via Spark 4 ``transformWithStateInPandas``.

    The caller must set ``spark.sql.streaming.stateStore.providerClass``
    to :data:`ROCKSDB_PROVIDER` before starting the stream — the
    transformWithState operator only supports the RocksDB store (its
    state layout needs column families).
    """
    from pyspark.sql import functions as F

    keyed = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    return keyed.groupBy("key").transformWithStateInPandas(
        statefulProcessor=_make_running_totals_processor(),
        outputStructType=RUNNING_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


__all__ = [
    "running_totals_with_state",
    "running_totals_transform_with_state",
    "ROCKSDB_PROVIDER",
    "RUNNING_OUT_SCHEMA",
]
