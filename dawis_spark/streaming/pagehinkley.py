"""Streaming Page-Hinkley mean-drift alerts — the online form of the
``page_hinkley_drift`` query, completing the detector family that feeds
the alert queue: PSI (distribution drift, streaming/drift.py), CUSUM
(level shift, streaming/cusum.py), PAGE-HINKLEY (sustained mean drift,
this module). Same state posture as streaming/cusum.py: per-key state is
the retained (bucket, v_cents) rollup series capped at ``max_history``
(same-bucket redelivery REPLACES — idempotent) plus the single-shot
``alerted`` latch.

Arithmetic matches the batch query EXACTLY (integer cents end to end):
dv_t = v_t - cum_t // t (truncating-division running mean), m_t = sum of
dv, PH_t = m_t - min_{s<=t} m_s, alarm when PH_t * 50 > cum_t (the
scale-free 2%-of-cumulative-revenue threshold). After any tick sequence
the recomputed closed form over the retained series equals the batch
form — the family's batch-equivalence property, tested.
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
        T.StructField("alerted", T.BooleanType(), True),
    ]
)


def ph_closed_form(series: list[tuple[int, int]]) -> list[tuple[int, int, bool]]:
    """(bucket, ph_cents, alarm) over a sorted (bucket, v_cents) series —
    the batch query's integer arithmetic, shared by the streaming fold
    and the equivalence test."""
    out = []
    cum = 0
    mt = 0
    mn = 0
    for i, (b, v) in enumerate(series, start=1):
        cum += v
        mt += v - cum // i
        mn = min(mn, mt)
        ph = mt - mn
        out.append((b, ph, ph * 50 > cum))
    return out


def stream_page_hinkley_alerts(
    stream_df: DataFrame,
    key_col: str,
    bucket_col: str,
    cents_col: str,
    max_history: int = 90,
) -> DataFrame:
    """Single-shot mean-drift alerts: the FIRST micro-batch whose
    recomputed Page-Hinkley statistic alarms (PH * 50 > cumulative, at
    any retained bucket) emits one (key, bucket, ph_cents, n_buckets,
    crossed_ms) row for the first alarming bucket; the latch then
    stops the re-alerting storm while the drift persists.

    Scale: state per key = the capped retained series + a bool;
    monitored keys are catalog-bounded; the alert stream is at most
    |keys| rows ever."""
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField(bucket_col, T.LongType()),
            T.StructField("ph_cents", T.LongType()),
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
            alarm = next(
                ((b, ph) for b, ph, fl in ph_closed_form(kept) if fl), None
            )
            if alarm is not None:
                alerted = True
                yield pd.DataFrame(
                    {
                        key_col: [str(key[0])],
                        bucket_col: [alarm[0]],
                        "ph_cents": [alarm[1]],
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
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ph_alerts_to_queue(alert_stream: DataFrame, queue, group: str = "mean-drift"):
    """Wire the Page-Hinkley alert stream into the alert QUEUE — the
    third detector landing in the same ALERT_SCHEMA -> Dispatcher path.
    Returns the foreachBatch ``DataStreamWriter``; delivery inherits
    the queue's at-least-once commit-after-send contract."""
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
                    F.lit("Page-Hinkley mean drift on "),
                    F.col(key_col),
                    F.lit(" at bucket "),
                    F.col(bucket_col).cast("string"),
                ).alias("message"),
                F.to_json(
                    F.struct(key_col, bucket_col, "ph_cents", "n_buckets")
                ).alias("data"),
            )
        )

    return alert_stream.writeStream.foreachBatch(sink)
