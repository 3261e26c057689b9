"""Streaming CUSUM shift monitor — the cross-batch form of the
``cusum_changepoints`` query (Page 1954 one-sided upward CUSUM in the
cumsum-minus-running-min closed form, integer cents end to end).

Same state posture as streaming/anomaly.py: the per-key state is the
series' retained (bucket, value) history capped at ``max_history``
buckets — the input is already a per-bucket rollup, so state is
retention-window-sized, never event-volume-sized. Each micro-batch
folds the new final bucket aggregates in (same-bucket redelivery
REPLACES — idempotent), recomputes the reference (total, n_days) and
the integer CUSUM over the retained series, and emits the scored rows
for the buckets present in the batch.

Arithmetic matches the batch query EXACTLY: x = 20*nd*v - 21*tot,
S = cum - min(0, running_min(cum)), breach when S > 20*tot — pure
int64, so after any tick sequence the final tick's emitted rows equal
the batch closed form over the retained history (the module family's
defining batch-equivalence property, tested).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("buckets", T.ArrayType(T.LongType()), True),
        T.StructField("values", T.ArrayType(T.LongType()), True),
    ]
)


def cusum_closed_form(series: list[tuple[int, int]]) -> list[tuple[int, int, bool]]:
    """(bucket, cusum_scaled, breached) over a sorted (bucket, v_cents)
    series — the batch query's integer arithmetic, reusable by the
    streaming fold and the equivalence test."""
    if not series:
        return []
    nd = len(series)
    tot = sum(v for _, v in series)
    h = 20 * tot
    out = []
    cum = 0
    run_min = 0  # min(0, running_min)
    for b, v in series:
        x = 20 * nd * v - 21 * tot
        cum += x
        run_min = min(run_min, cum)
        s = cum - run_min
        out.append((b, s, s > h))
    return out


def stream_cusum(
    stream_df: DataFrame,
    key_col: str,
    bucket_col: str,
    cents_col: str,
    max_history: int = 90,
) -> DataFrame:
    """Monitor each arriving (key, bucket, v_cents) final rollup row;
    emit (key, bucket, cusum_scaled, breached) for the batch's buckets."""
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField(bucket_col, T.LongType()),
            T.StructField("cusum_scaled", T.LongType()),
            T.StructField("breached", T.BooleanType()),
        ]
    )

    def fold(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        fresh: dict = {}
        for pdf in pdfs:
            for b, v in zip(pdf[bucket_col].tolist(), pdf[cents_col].tolist()):
                fresh[int(b)] = int(v)
        hist: dict = {}
        if state.exists:
            prev_b, prev_v = state.get
            hist = dict(zip(prev_b, prev_v))
        hist.update(fresh)
        kept = sorted(hist.items())[-max_history:]
        state.update(([b for b, _ in kept], [v for _, v in kept]))

        scored = {b: (s, fl) for b, s, fl in cusum_closed_form(kept)}
        out_b = [b for b in sorted(fresh) if b in scored]
        yield pd.DataFrame(
            {
                key_col: [str(key[0])] * len(out_b),
                bucket_col: out_b,
                "cusum_scaled": [scored[b][0] for b in out_b],
                "breached": [scored[b][1] for b in out_b],
            }
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

_ALERT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("buckets", T.ArrayType(T.LongType()), True),
        T.StructField("values", T.ArrayType(T.LongType()), True),
        T.StructField("alerted", T.BooleanType(), True),
    ]
)


def stream_cusum_alerts(
    stream_df: DataFrame,
    key_col: str,
    bucket_col: str,
    cents_col: str,
    max_history: int = 90,
) -> DataFrame:
    """Single-shot CUSUM BREACH ALERTS — the stream_psi_alerts
    discipline applied to the shift detector: same retained-series
    state plus an ``alerted`` latch; the FIRST micro-batch whose
    recomputed integer CUSUM breaches (S > 20*tot at any retained
    bucket) emits one (key, bucket, cusum_scaled, n_buckets,
    crossed_ms) row for the FIRST breaching bucket, then the latch
    stops the re-alerting storm while the shift persists. Together
    with ``cusum_alerts_to_queue`` this closes the monitoring loop for
    the second detector family: PSI alerts on DISTRIBUTION drift,
    CUSUM alerts on LEVEL shift — both land in the same reference
    queue -> Dispatcher path.

    Batch equivalence (tested): with the same rollup rows delivered in
    any tick split, the alerted key set equals the keys whose
    cusum_closed_form over the retained series breaches — same-bucket
    redelivery replaces (idempotent), and the closed form is one
    shared function of the final series.

    Scale: state per key = the retained (bucket, value) series capped
    at ``max_history`` + a bool; monitored keys are catalog-bounded;
    the alert stream is at most |keys| rows EVER."""
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField(bucket_col, T.LongType()),
            T.StructField("cusum_scaled", T.LongType()),
            T.StructField("n_buckets", T.LongType()),
            T.StructField("crossed_ms", T.LongType()),
        ]
    )

    def fold(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        fresh: dict = {}
        for pdf in pdfs:
            for b, v in zip(pdf[bucket_col].tolist(), pdf[cents_col].tolist()):
                fresh[int(b)] = int(v)
        hist: dict = {}
        alerted = False
        if state.exists:
            prev_b, prev_v, alerted = state.get
            hist = dict(zip(prev_b, prev_v))
            alerted = bool(alerted)
        hist.update(fresh)
        kept = sorted(hist.items())[-max_history:]

        if not alerted:
            breach = next(
                ((b, s) for b, s, fl in cusum_closed_form(kept) if fl), None
            )
            if breach is not None:
                alerted = True
                yield pd.DataFrame(
                    {
                        key_col: [str(key[0])],
                        bucket_col: [breach[0]],
                        "cusum_scaled": [breach[1]],
                        "n_buckets": [len(kept)],
                        "crossed_ms": [state.getCurrentProcessingTimeMs()],
                    }
                )
        state.update(
            ([b for b, _ in kept], [v for _, v in kept], alerted)
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=_ALERT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cusum_alerts_to_queue(alert_stream: DataFrame, queue, group: str = "shift"):
    """Wire the CUSUM alert stream into the alert QUEUE — the
    psi_alerts_to_queue twin for the level-shift detector: each alert
    row becomes one ALERT_SCHEMA row (message carries key + breach
    bucket, data = the JSON context). Returns the foreachBatch
    ``DataStreamWriter``; delivery inherits the queue's at-least-once
    commit-after-send contract."""
    from pyspark.sql import functions as F

    key_col, bucket_col, *_ = alert_stream.columns

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        queue.add(
            batch_df.select(
                F.timestamp_millis(F.col("crossed_ms")).alias("date"),
                F.lit(group).alias("group"),
                F.concat(
                    F.lit("CUSUM level shift on "),
                    F.col(key_col),
                    F.lit(" at bucket "),
                    F.col(bucket_col).cast("string"),
                ).alias("message"),
                F.to_json(
                    F.struct(key_col, bucket_col, "cusum_scaled", "n_buckets")
                ).alias("data"),
            )
        )

    return alert_stream.writeStream.foreachBatch(sink)
