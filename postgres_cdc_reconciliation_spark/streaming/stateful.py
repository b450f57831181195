"""[EXT] Custom stateful streaming operators (applyInPandasWithState).

Built-in Structured Streaming covers windows/watermarks/dedup-within-
watermark; anything with bespoke per-key state (first-seen dedup across the
whole stream, running counters that survive micro-batches) is an
applyInPandasWithState operator: Arrow-batched per-key groups + a GroupState
handle, exactly the shape the reference would need to emulate Debezium's
at-least-once dedup on the consumer side.

State is partitioned by key (scales horizontally with executors) and
checkpointed with the query — restart-safe.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def first_seen_dedup(grouped_keys, key_col: str, out_schema: str):
    """Returns the applyInPandasWithState plan: emit each key's FIRST event
    only, ever — later occurrences (any micro-batch) are suppressed.

    State per key: a single seen-flag. Emits at most one row per key total.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            # already emitted; drain input, emit nothing
            for _ in pdfs:
                pass
            return
        first_row: pd.DataFrame | None = None
        for pdf in pdfs:
            if len(pdf) and first_row is None:
                first_row = pdf.iloc[:1]
        if first_row is not None:
            state.update((1,))
            yield first_row

    return grouped_keys.applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_counter(grouped_keys, key_col: str, out_schema: str):
    """Per-key running event count across micro-batches (monitoring metric:
    events-per-table counters surviving restarts)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (prev,) = state.get if state.exists else (0,)
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        total = prev + n
        state.update((total,))
        yield pd.DataFrame({key_col: [key[0]], "batch_events": [n], "total_events": [total]})

    return grouped_keys.applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="total int",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_totals_tws(grouped_keys, key_col: str, value_col: str):
    """Per-key running count+sum via transformWithStateInPandas — the
    Spark 4 stateful API (typed ValueState handles, explicit init/close
    lifecycle, timer support) that supersedes applyInPandasWithState for
    new operators. Functionally mirrors ``running_counter`` so both API
    generations stay covered; state is key-partitioned and checkpointed
    with the query either way.

    Environment requirements (gated like the Kafka/JDBC paths): the
    RocksDB state store provider
    (spark.sql.streaming.stateStore.providerClass) and ``google.protobuf``
    in the Python env (the state-server wire protocol) — the test
    importorskips when absent."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField(key_col, StringType()),
            StructField("total_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals",
                StructType(
                    [
                        StructField("n", LongType()),
                        StructField("s", DoubleType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timerValues):
            n, s = (
                tuple(self._state.get()) if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                s += float(pdf[value_col].sum())
            self._state.update((n, s))
            yield pd.DataFrame(
                {key_col: [key[0]], "total_events": [n], "total_value": [s]}
            )

        def close(self) -> None:
            pass

    return grouped_keys.transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
