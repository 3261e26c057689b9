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
            # match the batch operator's NULL contract: cast-to-string of
            # NULL is NULL and collect_set drops it, so nulls never enter
            # the sketch there — drop them here too
            values.update(str(v) for v in pdf[value_col].dropna().tolist())
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


# --- Streaming count-min + heavy-hitter candidates ------------------------
#
# The batch count-min sketch (operators/sketches.cm_sketch) estimates
# frequencies over a finished table; the streaming form keeps the d x w
# counter table in stream state — counters are additive, so the
# micro-batch merge is cell-wise addition and the state equals the batch
# sketch of the concatenated history (same equivalence property as the
# KMV state above, same dual-rendered hashing). Because a CM sketch
# alone cannot enumerate its heavy hitters (it answers point queries),
# the state also carries the classic companion candidate set: the top-M
# values by estimated count seen so far (the CM+heap construction,
# Cormode & Muthukrishnan 2005 §4) — update a value's estimate from the
# refreshed counters when it appears in a batch, keep the best M.
# State per group: d*w int64 counters + M (value, estimate) pairs —
# bounded forever.

_CM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("counters", T.ArrayType(T.LongType()), True),
        T.StructField("cand_vals", T.ArrayType(T.StringType()), True),
        T.StructField("cand_ests", T.ArrayType(T.LongType()), True),
    ]
)


def stream_cm_heavy_hitters(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
    d: int = 4,
    w: int = 512,
    top_m: int = 10,
) -> DataFrame:
    """Running heavy hitters per key over a stream: one row per key per
    candidate per micro-batch — (key, value, cm_estimate, rank)."""
    import numpy as np

    from dawis_spark.operators.sketches import _cm_coeffs

    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField(value_col, T.StringType()),
            T.StructField("cm_estimate", T.LongType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )
    coeffs = _cm_coeffs(d)

    def fold(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        batch: list = []
        for pdf in pdfs:
            # NULL contract as in stream_kmv_distinct: batch cm_sketch's
            # cast-to-string keeps NULL out of the counters
            batch.extend(str(v) for v in pdf[value_col].dropna().tolist())
        if state.exists:
            counters_l, cand_vals, cand_ests = state.get
            counters = np.asarray(counters_l, dtype=np.int64).reshape(d, w)
            cands = dict(zip(cand_vals, cand_ests))
        else:
            counters = np.zeros((d, w), dtype=np.int64)
            cands = {}
        uniq = sorted(set(batch))
        hs = _np_mix(np.asarray(np_char_hash_batch(uniq), dtype=np.int64))
        hmap = dict(zip(uniq, (int(h) for h in hs)))
        for v in batch:
            h = hmap[v]
            for i, (a, b) in enumerate(coeffs):
                counters[i, ((a * h + b) % MOD) % w] += 1
        # refresh estimates for every value this batch touched, then trim
        for v in uniq:
            h = hmap[v]
            cands[v] = min(
                int(counters[i, ((a * h + b) % MOD) % w])
                for i, (a, b) in enumerate(coeffs)
            )
        top = sorted(cands.items(), key=lambda kv: (-kv[1], kv[0]))[:top_m]
        state.update(
            (
                [int(x) for x in counters.ravel()],
                [v for v, _ in top],
                [int(e) for _, e in top],
            )
        )
        yield pd.DataFrame(
            {
                key_col: [str(key[0])] * len(top),
                value_col: [v for v, _ in top],
                "cm_estimate": [e for _, e in top],
                "rank": list(range(1, len(top) + 1)),
            }
        )

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=_CM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
