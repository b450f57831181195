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


def session_aggregate(
    grouped_keys,
    key_col: str,
    ts_col: str = "ts",
    value_col: str = "v",
    gap_seconds: int = 60,
):
    """Gap-based sessionization with custom per-session aggregates — the
    applyInPandasWithState formulation of what ``session_window`` computes
    for built-in aggs, needed once the per-session logic outgrows SQL
    (bespoke payloads, emit-on-close side effects).

    A session is a maximal run of a key's events with inter-event gaps
    ≤ ``gap_seconds``. Sessions close two ways:
    - a later event arrives past the gap (closed session emitted, new one
      opened), or
    - the event-time watermark passes last_event + gap with nothing new
      (EventTimeTimeout fires; the idle session is emitted and state
      cleared — bounded state, no leak from dead keys).

    Emits one row per CLOSED session: (key, session_start, session_end,
    n_events, total_value). The input must carry ``withWatermark(ts_col,
    ...)`` — the timeout clock IS the watermark. State per key is one open
    session (4 scalars), partitioned by key across executors and
    checkpointed with the query.
    """
    gap_ms = gap_seconds * 1000

    def _emit(key, start_ms, last_ms, n, total):
        return pd.DataFrame(
            {
                key_col: [key],
                "session_start": [pd.Timestamp(start_ms, unit="ms")],
                "session_end": [pd.Timestamp(last_ms, unit="ms")],
                "n_events": [n],
                "total_value": [float(total)],
            }
        )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start_ms, last_ms, n, total = state.get
            state.remove()
            yield _emit(key[0], start_ms, last_ms, n, total)
            return
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        batch = pd.concat(parts, ignore_index=True).sort_values(ts_col)
        ts_ms = (batch[ts_col].astype("int64") // 10**6).tolist()
        vals = batch[value_col].astype(float).tolist()
        open_s = list(state.get) if state.exists else None
        for t, v in zip(ts_ms, vals):
            if open_s is None:
                open_s = [t, t, 1, v]
            elif t - open_s[1] > gap_ms:
                yield _emit(key[0], *open_s)
                open_s = [t, t, 1, v]
            else:
                # watermark-bounded disorder: an in-gap event may predate the
                # open session's start (it extends the session backwards)
                open_s[0] = min(open_s[0], t)
                open_s[1] = max(open_s[1], t)
                open_s[2] += 1
                open_s[3] += v
        state.update(tuple(open_s))
        state.setTimeoutTimestamp(open_s[1] + gap_ms)

    return grouped_keys.applyInPandasWithState(
        fn,
        outputStructType=(
            f"{key_col} string, session_start timestamp, "
            "session_end timestamp, n_events long, total_value double"
        ),
        stateStructType="start_ms long, last_ms long, n long, total double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
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
