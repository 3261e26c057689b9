"""Streaming SPC monitor — the cross-batch form of the
``spc_xbar_breaches`` query (Shewhart individuals chart with the four
Western Electric run rules, moving-range sigma).

Same state posture as streaming/cusum.py: per-key state is the retained
(bucket, cents) rollup series capped at ``max_history`` plus an
``alerted`` latch. Each micro-batch folds the new final bucket rollups
in (same-bucket redelivery REPLACES — idempotent), recomputes the
chart limits over the retained series, and scores every retained bucket
with the WE rules; the first batch whose recomputed chart breaches any
rule emits ONE alert row, then the latch holds.

Arithmetic matches the batch query's semantics over the retained
series: mu = mean, sigma = mean moving range / 1.128, rule flags off
constant-width trailing windows (9/3/5). A degenerate flat series
(sigma == 0) scores no rules instead of dividing by zero — the
streaming guard the PSI monitor grew in r12 (ADVICE drift.py:188).

Completing the detector-family triangle: PSI alerts on DISTRIBUTION
drift, CUSUM on sustained LEVEL shift, Page-Hinkley on mean drift —
SPC/WE is the point-and-run-pattern chart a human actually reads, now
landing in the same queue -> Dispatcher path.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_ALERT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("buckets", T.ArrayType(T.LongType()), True),
        T.StructField("values", T.ArrayType(T.LongType()), True),
        T.StructField("alerted", T.BooleanType(), True),
    ]
)


def spc_closed_form(
    series: list[tuple[int, int]],
) -> list[tuple[int, int, int]]:
    """(bucket, sigma_units_milli, rule_mask) over a sorted
    (bucket, cents) series — the spc_xbar_breaches arithmetic
    (individuals chart, WE rules 1-4; mask bit j-1 = rule j), reusable
    by the streaming fold and the equivalence test."""
    n = len(series)
    if n < 2:
        return [(b, 0, 0) for b, _ in series]
    vals = [v for _, v in series]
    mu = sum(vals) / n
    mrbar = sum(abs(b - a) for a, b in zip(vals, vals[1:])) / (n - 1)
    sigma = mrbar / 1.128
    if sigma == 0.0:
        return [(b, 0, 0) for b, _ in series]
    sides = []
    flags = []  # (b3, a2, u2, a1, u1)
    for v in vals:
        x = float(v)
        sides.append(1 if x > mu else (-1 if x < mu else 0))
        flags.append(
            (
                int(x > mu + 3 * sigma or x < mu - 3 * sigma),
                int(x > mu + 2 * sigma),
                int(x < mu - 2 * sigma),
                int(x > mu + sigma),
                int(x < mu - sigma),
            )
        )
    out = []
    for i, (b, v) in enumerate(series):
        w9 = sides[max(0, i - 8) : i + 1]
        w3 = flags[max(0, i - 2) : i + 1]
        w5 = flags[max(0, i - 4) : i + 1]
        r1 = flags[i][0]
        r2 = int(len(w9) == 9 and abs(sum(w9)) == 9)
        r3 = int(sum(f[1] for f in w3) >= 2 or sum(f[2] for f in w3) >= 2)
        r4 = int(sum(f[3] for f in w5) >= 4 or sum(f[4] for f in w5) >= 4)
        mask = r1 | (r2 << 1) | (r3 << 2) | (r4 << 3)
        units = round((float(v) - mu) / sigma * 1000)
        out.append((b, int(units), mask))
    return out


def stream_spc_alerts(
    stream_df: DataFrame,
    key_col: str,
    bucket_col: str,
    cents_col: str,
    max_history: int = 90,
) -> DataFrame:
    """Single-shot SPC BREACH ALERTS — the stream_cusum_alerts
    discipline for the control-chart detector: retained-series state
    plus an ``alerted`` latch; the FIRST micro-batch whose recomputed
    chart fires any WE rule emits one (key, bucket, rule_mask,
    sigma_units_milli, n_buckets, crossed_ms) row for the FIRST
    breaching bucket, then the latch stops the re-alerting storm.

    Batch equivalence (tested): with the same rollup rows delivered in
    any tick split, the alerted key set equals the keys whose
    spc_closed_form over the retained union fires — same-bucket
    redelivery replaces, and the closed form is one shared function of
    the final series.

    Scale: state per key = the capped (bucket, value) series + a bool;
    monitored keys are catalog-bounded; the alert stream is at most
    |keys| rows EVER."""
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField(bucket_col, T.LongType()),
            T.StructField("rule_mask", T.LongType()),
            T.StructField("sigma_units_milli", T.LongType()),
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
                (
                    (b, u, m)
                    for b, u, m in spc_closed_form(kept)
                    if m > 0
                ),
                None,
            )
            if breach is not None:
                alerted = True
                yield pd.DataFrame(
                    {
                        key_col: [str(key[0])],
                        bucket_col: [breach[0]],
                        "rule_mask": [breach[2]],
                        "sigma_units_milli": [breach[1]],
                        "n_buckets": [len(kept)],
                        "crossed_ms": [state.getCurrentProcessingTimeMs()],
                    }
                )
        state.update(([b for b, _ in kept], [v for _, v in kept], alerted))

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=_ALERT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def spc_alerts_to_queue(alert_stream: DataFrame, queue, group: str = "spc"):
    """Wire the SPC alert stream into the alert QUEUE — the
    cusum_alerts_to_queue twin for the control-chart detector: each
    alert row becomes one ALERT_SCHEMA row (message carries key, breach
    bucket, and the fired-rule list; data = the JSON context). Returns
    the foreachBatch ``DataStreamWriter``; delivery inherits the
    queue's at-least-once commit-after-send contract."""
    from pyspark.sql import functions as F

    key_col, bucket_col, *_ = alert_stream.columns

    rules = F.concat_ws(
        "+",
        *[
            F.when(
                F.col("rule_mask").bitwiseAND(1 << j) > 0, F.lit(f"WE{j + 1}")
            )
            for j in range(4)
        ],
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        queue.add(
            batch_df.select(
                F.timestamp_millis(F.col("crossed_ms")).alias("date"),
                F.lit(group).alias("group"),
                F.concat(
                    F.lit("SPC rule breach ("),
                    rules,
                    F.lit(") on "),
                    F.col(key_col),
                    F.lit(" at bucket "),
                    F.col(bucket_col).cast("string"),
                ).alias("message"),
                F.to_json(
                    F.struct(
                        key_col,
                        bucket_col,
                        "rule_mask",
                        "sigma_units_milli",
                        "n_buckets",
                    )
                ).alias("data"),
            )
        )

    return alert_stream.writeStream.foreachBatch(sink)
