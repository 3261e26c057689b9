"""Streaming cross-batch sketches — a KMV distinct-count synopsis
maintained in stream state.

The batch KMV operator (operators/sketches.py) answers COUNT(DISTINCT)
over a finished table; an ingest pipeline wants the same answer as a
RUNNING figure over everything seen so far, without keeping the seen-set
(exact streaming distinct via stream_dedup state is O(all distinct keys
ever) — precisely what a sketch exists to avoid). KMV's merge is "k
smallest of a union of k-smallest sets" — associative, commutative,
idempotent — so per-key state is a bounded sorted array of ≤ k int64s
and each micro-batch folds in with one union+truncate. State per key is
k*8 bytes FOREVER, independent of stream length.

Hash parity: values hash with the same polynomial + uniformizing rounds
as the batch operator (vectorized numpy here, SQL expressions there —
same values, the dual-rendering discipline of functions/text.py). The
consequence is the defining test: after any number of ticks, the
streaming state equals the BATCH sketch of the concatenated input, so
the running estimate is exactly what kmv_distinct would say over a
table holding the whole history.

Emission (append mode — each row is a final per-batch snapshot event) —
(key, n_kept, estimate) — the running cardinality for downstream
dashboards/alerts; keys untouched by a batch emit nothing.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from dawis_spark.functions.text import MOD, np_char_hash_batch
from dawis_spark.operators.sketches import _KMV_ROUNDS

_STATE_SCHEMA = T.StructType(
    [T.StructField("hs", T.ArrayType(T.LongType()), True)]
)


def _np_mix(h):
    """The KMV uniformizing rounds on an int64 numpy array (values
    identical to the SQL rendering; h < MOD so h*h < 2^60.5)."""
    for a, b in _KMV_ROUNDS:
        h = (h * h + a * h + b) % MOD
    return h


def _estimate(hs: list, k: int) -> float:
    if len(hs) < k:
        return float(len(hs))
    return round(float(k - 1) * MOD / hs[k - 1], 6)


def stream_kmv_distinct(
    stream_df: DataFrame, key_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Running per-key KMV distinct estimate over a stream.

    Output rows: (key, n_kept, estimate), one per key per micro-batch.
    """
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField("n_kept", T.IntegerType()),
            T.StructField("estimate", T.DoubleType()),
        ]
    )

    def fold(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        values: set = set()
        for pdf in pdfs:
            values.update(str(v) for v in pdf[value_col].tolist())
        hs = np.asarray(np_char_hash_batch(sorted(values)), dtype=np.int64)
        hs = _np_mix(hs)
        if state.exists:
            (prev,) = state.get
            merged = np.union1d(np.asarray(prev, dtype=np.int64), hs)
        else:
            merged = np.unique(hs)
        kept = [int(x) for x in merged[:k]]
        state.update((kept,))
        yield pd.DataFrame(
            {
                key_col: [str(key[0])],
                "n_kept": [len(kept)],
                "estimate": [_estimate(kept, k)],
            }
        )

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
