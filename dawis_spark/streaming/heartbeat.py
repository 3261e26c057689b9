"""Streaming heartbeat monitoring — alert when a series goes silent.

The dual of streaming/anomaly.py: that module scores the values a
series DOES emit; this one alerts on the rows that never arrive — the
monitoring gap the batch gap-fill operator (operators/gapfill.py) can
only patch after the fact. The reference's alerting surface (SURVEY
§2.5 A5/A6 + the dispatcher sinks) is threshold checks over delivered
data; a cron source that silently stops delivering is invisible to
them, and detecting that NEEDS processing-time state timeouts — there
is no row to evaluate.

Semantics per key: every sighting stores last-seen processing time and
(re)arms a ``silence_ms`` timeout. When the timeout fires (no rows for
the key in ``silence_ms``), emit ONE ``silent`` alert and go quiet —
no re-alerting storm; the alerted flag stays in state. The key's next
sighting emits a ``recovered`` row carrying the realized gap, then
normal arming resumes. State per key: two int64s + a bool, forever
bounded by the series count (dead series keep one tombstone row until
recovery — drop them operationally by restarting the query with a
fresh state location if series churn is unbounded).

Timeout contract (same as stream_dedup's TTL mode): processing-time
timeouts fire on the next micro-batch after expiry, so run under
``trigger(processingTime=...)`` — availableNow never schedules the
cleanup batch that delivers timeouts.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_seen_ms", T.LongType(), True),
        T.StructField("alerted", T.BooleanType(), True),
    ]
)


def stream_heartbeat_alerts(
    stream_df: DataFrame, key_col: str, silence_ms: int
) -> DataFrame:
    """(key, status, last_seen_ms, gap_ms) alert stream: ``silent`` when
    a key has emitted nothing for ``silence_ms`` of processing time,
    ``recovered`` on its first row after a silent alert."""
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField("status", T.StringType()),
            T.StructField("last_seen_ms", T.LongType()),
            T.StructField("gap_ms", T.LongType()),
        ]
    )

    def monitor(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        now = state.getCurrentProcessingTimeMs()
        if state.hasTimedOut:
            last_seen, _ = state.get
            # single-shot: alerted=True and NO re-arm — one alert per
            # outage, state kept so the recovery can be recognized
            state.update((last_seen, True))
            yield pd.DataFrame(
                {
                    key_col: [str(key[0])],
                    "status": ["silent"],
                    "last_seen_ms": [last_seen],
                    "gap_ms": [now - last_seen],
                }
            )
            return
        was_alerted = False
        prev_seen = None
        if state.exists:
            prev_seen, was_alerted = state.get
        state.update((now, False))
        state.setTimeoutDuration(silence_ms)
        if was_alerted:
            yield pd.DataFrame(
                {
                    key_col: [str(key[0])],
                    "status": ["recovered"],
                    "last_seen_ms": [prev_seen],
                    "gap_ms": [now - prev_seen],
                }
            )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        monitor,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
