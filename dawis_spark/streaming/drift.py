"""Streaming PSI drift monitor — the online form of psi_value_drift.

The batch query compares a reference period against a current period in
one scan; a STREAMING pipeline instead carries the reference histogram
as configuration (bin edges + counts frozen when the model/baseline
shipped) and maintains the current-period histogram as keyed state,
emitting the running PSI after every micro-batch — the number a
monitoring dashboard thresholds (0.1 watch / 0.25 retrain) without ever
rescanning history.

Semantics per key: state = one int64 count per bin (n_bins + a row
counter, config-sized). Each micro-batch bins its rows with the SAME
clamped equal-width rule as the batch query (operators/drift.bin_index,
reference extrema fixed), adds them to state, and emits
(key, n_rows_total, psi) computed by operators/drift.psi_from_counts —
the shared formula, so batch equivalence is equality of one function
applied to one histogram pair.

Batch equivalence (tested): after any prefix of micro-batches the
emitted psi equals psi_from_counts(ref, histogram(union of delivered
rows)) — the whale-alert discipline.

Scale: state is n_bins int64s per monitored key (metrics/segments —
catalog-bounded); each micro-batch does one map-side binning pass, no
shuffle beyond the keyed state exchange.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from dawis_spark.operators.drift import bin_index, psi_from_counts


def stream_psi_drift(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
    ref_lo: float,
    ref_hi: float,
    ref_counts: list[int],
) -> DataFrame:
    """(key, n_rows, psi) per micro-batch: running PSI of the key's
    observed value distribution against the frozen reference histogram
    (``ref_counts`` over ``len(ref_counts)`` equal-width bins spanning
    [ref_lo, ref_hi], clamped)."""
    n_bins = len(ref_counts)
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("psi", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("counts", T.ArrayType(T.LongType()), True)]
    )

    def track(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        counts = list(state.get[0]) if state.exists else [0] * n_bins
        for pdf in pdfs:
            for x in pdf[value_col]:
                counts[bin_index(float(x), ref_lo, ref_hi, n_bins)] += 1
        state.update((counts,))
        n = sum(counts)
        if n:
            yield pd.DataFrame(
                {
                    key_col: [str(key[0])],
                    "n_rows": [n],
                    "psi": [psi_from_counts(ref_counts, counts)],
                }
            )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        track,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
