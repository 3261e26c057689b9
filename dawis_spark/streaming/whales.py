"""Streaming whale detection — the journey guard's online form.

operators/journeys.whale_guard protects batch sequence windows from
hot keys; a STREAMING pipeline needs the same signal before its own
stateful per-key operators (sessionization, transition counting) absorb
a bot. This module keeps one running event count per key and emits a
single-shot ``whale`` alert the moment a key crosses ``max_events`` —
the alert stream is what downstream jobs join (broadcast — whale sets
are scarce by construction) to reroute or drop the key's traffic.

Semantics per key: state = (count, alerted). Every micro-batch adds the
key's row count; on FIRST crossing count > max_events emit one
(key, n_events, crossed_ms) row and latch ``alerted`` — no re-alerting
storm as the count keeps growing. With ``ttl_ms`` set, a key silent for
that long gets its state dropped (processing-time timeout, the
stream_dedup TTL contract): counts become "within the active window"
rather than all-time, and a formerly-flagged key can re-alert after
going quiet — the windowed-bot shape. State per key: two int64s + a
bool, bounded by live key cardinality (TTL prunes dead keys).

Batch equivalence (tested): with no TTL, the alerted key set after any
prefix of micro-batches equals operators/journeys.whale_keys(
max_events) over the union of delivered rows.

Timeout contract: processing-time timeouts fire on the next micro-batch
after expiry — run under ``trigger(processingTime=...)`` when using
``ttl_ms`` (availableNow never schedules the cleanup batch).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), True),
        T.StructField("alerted", T.BooleanType(), True),
    ]
)


def stream_whale_alerts(
    stream_df: DataFrame,
    key_col: str,
    max_events: int,
    ttl_ms: int | None = None,
) -> DataFrame:
    """(key, n_events, crossed_ms) alert stream: one row per key when
    its running count first exceeds ``max_events`` (per active window
    when ``ttl_ms`` is set, all-time otherwise)."""
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("crossed_ms", T.LongType()),
        ]
    )

    def track(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # the key went quiet for ttl_ms: forget it entirely (count
            # AND the alert latch) — the next burst starts a new window
            state.remove()
            return
        batch_n = sum(len(pdf) for pdf in pdfs)
        n, alerted = (state.get if state.exists else (0, False))
        n += batch_n
        now = state.getCurrentProcessingTimeMs()
        if not alerted and n > max_events:
            alerted = True
            yield pd.DataFrame(
                {
                    key_col: [str(key[0])],
                    "n_events": [n],
                    "crossed_ms": [now],
                }
            )
        state.update((n, alerted))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

    return stream_df.groupBy(key_col).applyInPandasWithState(
        track,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
