"""Stateful streaming dedup — exact dedup across micro-batches.

The batch dedup operators (operators/dedup.py) dedup within one dataset;
a streaming ingest pipeline must also suppress documents already seen in
PREVIOUS micro-batches. Spark's arbitrary-stateful operator
(``applyInPandasWithState``) keeps a per-key "seen" state across batches:

  key   = content fingerprint (group key)
  state = first-seen marker (timestamp-free: set once)
  emit  = only rows whose key has no prior state, first-in-batch wins

At scale state is partitioned by key across executors and checkpointed;
the state per key is one boolean — memory is O(distinct corpus), same as
any streaming dedup, and can be bounded with state TTL
(``GroupStateTimeout.ProcessingTimeTimeout``) for windowed-dedup semantics.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("seen", T.BooleanType(), True),
        # absolute processing-time expiry deadline (ms since epoch), set
        # once at FIRST sight; None in exact (no-TTL) mode. Kept in state
        # because Spark clears a key's pending timeout every time its
        # group function runs — any later call must re-arm from this.
        T.StructField("deadline_ms", T.LongType(), True),
    ]
)


def stream_dedup(
    stream_df: DataFrame,
    key_col: str,
    output_schema: T.StructType,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Emit only the first row per ``key_col`` across batches.

    ``stream_df`` must be a streaming DataFrame whose columns match
    ``output_schema`` plus the key column. Within a batch, the first row
    (input order) wins — matching exact_dedup's keep-one semantics.

    ``ttl_ms``: windowed-dedup semantics — a key's "seen" state expires
    ``ttl_ms`` of processing time after FIRST sight (fixed window, not
    sliding: later duplicates are suppressed but do not extend the
    window), after which the key may be emitted again. This bounds state
    for endless streams where exact forever-dedup would grow O(all
    distinct keys ever): at 100 TB/day ingest the state store holds only
    the TTL window's keys. None keeps exact first-ever semantics.
    Timeouts fire on the next micro-batch after expiry (Spark's
    processing-time timeout contract), so re-emission is at-earliest the
    following trigger.

    Trigger contract: TTL mode is for CONTINUOUS queries
    (``trigger(processingTime=...)``) — with processing-time timeouts the
    engine schedules a state-cleanup batch every trigger, so
    ``availableNow``/``processAllAvailable`` never reach quiescence and
    will not terminate. The exact (None) mode works with any trigger."""
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def dedup_group(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()  # forget the key; next sighting re-emits
            return
        if state.exists:
            # Spark's GroupState contract: invoking the function for a key
            # clears its pending processing-time timeout. A duplicate
            # arriving in a LATER micro-batch lands here — re-arm the
            # timeout to the REMAINDER of the original window, else the
            # key would never expire (unbounded state) and never re-emit.
            if ttl_ms is not None:
                deadline = state.get[1]
                remaining = deadline - state.getCurrentProcessingTimeMs()
                state.setTimeoutDuration(max(1, remaining))
            return
        first = None
        for pdf in pdfs:
            if len(pdf) > 0:
                first = pdf.iloc[[0]]
                break
        if ttl_ms is not None:
            state.update((True, state.getCurrentProcessingTimeMs() + ttl_ms))
            state.setTimeoutDuration(ttl_ms)
        else:
            state.update((True, None))
        if first is not None:
            yield first[[f.name for f in output_schema.fields]]

    return stream_df.groupBy(key_col).applyInPandasWithState(
        dedup_group,
        outputStructType=output_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
