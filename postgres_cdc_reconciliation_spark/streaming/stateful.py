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
