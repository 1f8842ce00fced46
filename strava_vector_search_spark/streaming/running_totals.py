"""Arbitrary-state streaming with the Spark 4 ``transformWithStateInPandas``
API: per-user running event totals that survive across micro-batches.

This is the successor API to ``applyInPandasWithState`` (which
``streaming/sessionize.py`` uses): typed state handles (ValueState /
ListState / MapState) managed by the operator, RocksDB-backed, with
per-batch Arrow transfer. The operator here is the minimal useful shape —
a keyed running aggregate emitted in Update mode — the building block for
live feature stores and monitoring counters.

Reference tie-in: the TARGET_LAG refresh loop (01:173) keeps a derived
artifact continuously current; this operator is the same contract for a
running aggregate instead of an index.

Scale: state is partitioned by the grouping key across executors; RocksDB
spills state to local disk, so total state size is bounded by cluster disk
rather than memory. Each micro-batch touches only the keys present in the
batch.

Environment note: the transformWithState driver worker speaks its state
protocol over ``google.protobuf``; in containers without protobuf the query
crashes at initialization. The operator builds and type-checks regardless
(plan test in tests/test_running_totals_stream.py); the live-stream test is
skipped when protobuf is absent.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"


class RunningTotalsProcessor(StatefulProcessor):
    """Keyed running (count, sum) with a ValueState handle."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "totals", "n bigint, total double"
        )

    def handleInputRows(self, key, rows, timerValues):
        if self._state.exists():
            prev = self._state.get()
            n, total = int(prev[0]), float(prev[1])
        else:
            n, total = 0, 0.0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 6)],
            }
        )

    def close(self) -> None:
        pass


def running_totals_stream(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """events stream → per-user running (n_events, total_value), one row per
    user per micro-batch the user appears in (Update mode).

    The session must use the RocksDB state store provider
    (``ROCKSDB_PROVIDER``) — transformWithState requires it.
    """
    prepared = events.select(
        F.col(user_col).cast("bigint").alias("user_id"),
        F.col(value_col).cast("double").alias("value"),
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
