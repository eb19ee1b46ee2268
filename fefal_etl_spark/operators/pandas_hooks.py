"""X3 extension hooks (SURVEY.md §2.10): the engine's sanctioned escape
hatches into Python, all Arrow-batched — never row-at-a-time.

- scalar: ``pandas_udf`` (see functions.text.normalize_text_udf — the
  full-Unicode accent path)
- grouped aggregate (UDAF): :func:`grouped_agg_udf`
- grouped map (UDTF-ish): :func:`grouped_apply` via ``applyInPandas``
- per-partition stream (UDTF): ``mapInPandas`` (see llm.multimodal)
- custom stateful streaming: :func:`running_counts_stateful` via
  ``applyInPandasWithState``

Everything here ships whole Arrow record batches across the boundary
(~10-100× faster than pickled row UDFs) and keeps grouping/shuffling on the
JVM side.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def grouped_agg_udf():
    """A pandas UDAF: trimmed mean (drop top/bottom 10%) — an aggregate stock
    SQL can't express directly. Usable in ``groupBy().agg()`` and windows."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(DoubleType())
    def trimmed_mean(v: pd.Series) -> float:
        a = np.sort(v.dropna().to_numpy())
        if len(a) == 0:
            return float("nan")
        k = int(len(a) * 0.1)
        trimmed = a[k : len(a) - k] if len(a) > 2 * k else a
        return float(trimmed.mean())

    return trimmed_mean


def grouped_apply(
    df: DataFrame, keys: list[str], fn, schema: StructType | str
) -> DataFrame:
    """Grouped-map hook: ``fn(pandas.DataFrame) -> pandas.DataFrame`` runs
    once per key group (group must fit one executor's memory — document the
    cardinality contract of any fn you plug in)."""
    return df.groupBy(*keys).applyInPandas(fn, schema)


RUNNING_COUNT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events_total", LongType()),
        StructField("sum_value_total", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("s", DoubleType())]
)


def running_counts_stateful(
    events: DataFrame, timeout_minutes: int | None = None
) -> DataFrame:
    """Custom stateful streaming operator (SURVEY.md §2.11 extension):
    per-user lifetime event count + value sum maintained in explicit state
    via ``applyInPandasWithState`` — the hook for operators Structured
    Streaming's built-ins can't express (decaying counters, custom session
    logic, online sketches).

    Works on a streaming DataFrame grouped by user_id. ``timeout_minutes``
    evicts idle-user state after that much processing-time inactivity
    (bounds state size on unbounded key spaces). Leave it ``None`` for
    finite/catch-up runs: with ``Trigger.AvailableNow`` a processing-time
    timeout makes the query spin empty state-cleanup micro-batches until the
    timeout elapses instead of terminating.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, s = (state.get if state.exists else (0, 0.0))
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
        state.update((n, s))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events_total": [n], "sum_value_total": [s]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_COUNT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if timeout_minutes is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


TWS_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events_total", LongType()),
        StructField("n_types_total", LongType()),
    ]
)


def user_type_counts_tws(events: DataFrame) -> DataFrame:
    """Custom stateful streaming via Spark 4's `transformWithStateInPandas`
    — the successor API to `applyInPandasWithState` (SPARK-46815): typed
    state primitives (ValueState / ListState / MapState) with independent
    per-key lifetimes, timers, and TTL support, on the RocksDB state
    store. This operator maintains per-user lifetime event count
    (ValueState) and the set of DISTINCT event types seen (MapState used
    as a set — the state shape the old API could only fake by pickling a
    dict into a tuple field).

    Scale: state is partitioned by the grouping key across executors and
    incrementally checkpointed by RocksDB — the exact mechanism that
    holds billions of keys at 100 TB; distinct-type cardinality per user
    is bounded (event-type vocabulary), so MapState stays KB-sized per
    key. Requires the RocksDB state store provider (set by the caller or
    session; the HDFS-backed default store does not implement
    transformWithState).

    ENV GATE: the transformWithState Python worker requires
    ``google.protobuf`` (state serialization protocol); this sandbox has
    no protobuf, so the operator is exercised by a skip-gated
    batch-equivalence test (tests/test_round4_ops.py) rather than a
    registry query — on any cluster with protobuf installed it runs
    as-is."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTypeCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState(
                "n", StructType([StructField("n", LongType())])
            )
            self._types = handle.getMapState(
                "types",
                StructType([StructField("t", StringType())]),
                StructType([StructField("seen", LongType())]),
            )

        def handleInputRows(self, key, rows, timerValues):
            n = self._n.get()[0] if self._n.exists() else 0
            for pdf in rows:
                n += len(pdf)
                for t in pdf["event_type"].dropna().unique():
                    self._types.updateValue((str(t),), (1,))
            self._n.update((n,))
            n_types = sum(1 for _ in self._types.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events_total": [n],
                    "n_types_total": [n_types],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTypeCounts(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
