"""Custom stateful streaming via transformWithStateInPandas (Spark 4 API).

Companion to streaming/stateful.py (applyInPandasWithState): the same
"user-defined state the built-in windows can't carry" capability, expressed
through the newer StatefulProcessor interface — typed state handles, an
explicit lifecycle (init/handleInputRows/close), and the RocksDB state
store.  The operator keeps per-user running totals (event count + value
sum) and emits the refreshed totals for every user seen in a micro-batch —
the streaming analog of an incrementally-maintained aggregate table.

Scale: state is one small row per distinct user key, partitioned by the
stream's groupBy hash — the state store shards with the shuffle, so 100 TB
of history costs O(distinct users) space, not O(events).  RocksDB spills
state to local disk and checkpoints incrementally, which is the
production-scale choice over the default in-memory HDFS-backed provider.

Environment gate: the transformWithState protocol speaks protobuf between
the JVM and the Python driver worker (pyspark/sql/streaming/proto), and
``google.protobuf`` is NOT installed in this container — the query would
crash in the pre-init handshake.  ``TRANSFORM_WITH_STATE_AVAILABLE`` makes
the capability testable; the pytest skips with the documented reason when
false, and the operator itself is complete and runs wherever protobuf is
present.  The applyInPandasWithState sessionizer (streaming/stateful.py)
has no such dependency and is the fully-tested custom-state path here.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

try:  # capability probe, not an import of convenience
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    TRANSFORM_WITH_STATE_AVAILABLE = True
except ImportError:
    TRANSFORM_WITH_STATE_AVAILABLE = False

#: RocksDB provider conf transformWithState requires (session conf; the
#: test sets it before starting the query and restores the prior value).
ROCKSDB_PROVIDER_CONF = (
    "spark.sql.streaming.stateStore.providerClass",
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


class RunningTotals(StatefulProcessor):
    """Per-key running (count, sum) in a ValueState handle."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, sv = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            sv += float(pdf["value"].sum())
        self._totals.update((n, sv))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [sv]}
        )

    def close(self) -> None:
        pass


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals.  `events` must be a streaming
    DataFrame with (user_id, ts, event_id, value)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
