"""Streaming robust anomaly scoring — the cross-batch form of
operators/anomaly.robust_zscores.

The batch operator scores a finished (series, bucket, value) rollup;
a monitoring pipeline wants each bucket scored AS IT ARRIVES, against a
baseline built from everything the series has emitted so far. Medians
are not mergeable (no bounded-state exact sketch exists), so the state
carries the series' trailing bucket history itself — (bucket, value)
pairs capped at ``max_history`` buckets — which is the right call for
this operator's domain: the input is already a per-bucket rollup, so
per-series state is the RETENTION WINDOW length (config-scale, e.g.
90 daily points), not the event volume. Same posture as the batch
docstring: holistic cost only ever paid within a bounded group.

Per micro-batch, per series: fold the new final bucket aggregates into
the history (same-bucket redelivery REPLACES — idempotent on the
at-least-once upstream), truncate to the newest ``max_history``
buckets, recompute median/MAD over the retained history, and emit a
scored row for each bucket present in this batch. Scoring matches the
batch operator exactly (numpy median interpolates even counts like
Spark/DuckDB ``median``; half-up 6-digit rounding; MAD = 0 yields NULL
z and a false flag), so after any tick sequence the emitted scores for
the final tick equal ``robust_zscores`` over the retained history — the
defining batch-equivalence test of this module family.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from dawis_spark.operators.anomaly import MAD_SIGMA

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("buckets", T.ArrayType(T.LongType()), True),
        T.StructField("values", T.ArrayType(T.DoubleType()), True),
    ]
)


def _half_up6(x: float) -> float:
    import math

    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def stream_robust_anomalies(
    stream_df: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    max_history: int = 90,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Score each arriving (key, bucket, value) row against the series'
    retained history. ``bucket_col`` must be int64 (epoch bucket index
    or day number); rows are FINAL per-bucket aggregates (emit them
    from a watermarked windowed agg upstream).

    Output per batch: (key, bucket, value, robust_z, is_anomaly) for
    the buckets present in that batch.
    """
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField(bucket_col, T.LongType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField("robust_z", T.DoubleType()),
            T.StructField("is_anomaly", T.BooleanType()),
        ]
    )

    def fold(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        fresh: dict = {}
        for pdf in pdfs:
            for b, v in zip(pdf[bucket_col].tolist(), pdf[value_col].tolist()):
                fresh[int(b)] = float(v)  # last row per bucket wins in-batch
        hist: dict = {}
        if state.exists:
            prev_b, prev_v = state.get
            hist = dict(zip(prev_b, prev_v))
        hist.update(fresh)  # redelivered bucket replaces its old value
        kept = sorted(hist.items())[-max_history:]
        state.update(([b for b, _ in kept], [v for _, v in kept]))

        vals = np.array([v for _, v in kept], dtype=np.float64)
        med = float(np.median(vals))
        mad = float(np.median(np.abs(vals - med)))
        out_b, out_v, out_z, out_flag = [], [], [], []
        retained = dict(kept)
        for b in sorted(fresh):
            if b not in retained:
                continue  # older than the retention window after merge
            v = retained[b]
            if mad == 0.0:
                z, flag = None, False
            else:
                z = _half_up6((v - med) / (MAD_SIGMA * mad))
                flag = abs(z) > z_threshold
            out_b.append(b)
            out_v.append(v)
            out_z.append(z)
            out_flag.append(flag)
        yield pd.DataFrame(
            {
                key_col: [str(key[0])] * len(out_b),
                bucket_col: out_b,
                value_col: out_v,
                "robust_z": out_z,
                "is_anomaly": out_flag,
            }
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
