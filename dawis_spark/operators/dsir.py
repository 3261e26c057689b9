"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

The data-selection pass of an LLM pipeline: given a small TARGET corpus
(the distribution you want more of) and a large RAW corpus, score every
raw document by its log importance ratio under hashed-n-gram bag models,

    log w(x) = sum_b c_b(x) * [ log p_tgt(b) - log p_raw(b) ],

then resample raw docs with probability proportional to w. Features are
hashed unigram + bigram buckets (the paper's construction, feature
hashing per Weinberger et al. 2009) with add-one smoothing on both
bucket models.

Scale shape mirrors operators/classifier.py: MODEL ESTIMATION is two
bucket-count aggregations whose exchanges are m-bounded (explode +
groupBy(bucket) keeps partial aggregation map-side, so each task ships
at most m rows, never one row per token); the two m-sized count vectors
ride the driver (config-scale) and fuse into a single log-ratio literal
array. SCORING is then one codegen'd fold inside the raw-corpus scan —
no shuffle, no UDF, no per-token join. The final resampling step is the
caller's: deterministic top-k by weight, or Gumbel-noise top-k for the
paper's stochastic variant — both are an ORDER BY over doc-level scores.

Determinism for the oracle: token/bigram hashing is the shared
dual-rendered family (functions/text.char_hash + the classifier's
uniformizing rounds); lambda components round HALF-UP to 6 digits (the
quantizer-training convention), so DuckDB can replay estimation in SQL
and the per-doc fold adds identical doubles in identical order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dawis_spark.functions import text as TXT
from dawis_spark.operators.classifier import _buckets_expr, _ROUNDS

MOD = TXT.MOD


def feature_buckets_expr(text_col: str, m: int, dialect: str) -> str:
    """Hashed unigram + bigram bucket array of a text column (one entry
    per occurrence, order: all unigrams then all bigrams)."""
    toks = TXT.tokens(text_col, dialect)
    uni = _buckets_expr(toks, m, dialect)
    th = TXT.token_hash_array(text_col, dialect)
    if dialect == "spark":
        bg = (
            f"flatten(transform(array({th}), h -> "
            f"case when size(h) < 2 then array() else "
            f"transform(sequence(0, size(h) - 2), i -> (h[i] * 131 + h[i + 1]) % {MOD}) end))"
        )
        for a, b in _ROUNDS:
            bg = f"transform({bg}, __x -> (__x * __x + {a} * __x + {b}) % {MOD})"
        bg = f"transform({bg}, __x -> __x % {m})"
        return f"concat({uni}, {bg})"
    bg = (
        f"flatten(list_transform([{th}], h -> "
        f"list_transform(range(1, greatest(len(h) - 1, 0) + 1), "
        f"i -> (h[i] * 131 + h[i + 1]) % {MOD})))"
    )
    for a, b in _ROUNDS:
        bg = f"list_transform({bg}, __x -> (__x * __x + {a} * __x + {b}) % {MOD})"
    bg = f"list_transform({bg}, __x -> __x % {m})"
    return f"list_concat({uni}, {bg})"


def _bucket_counts(docs: DataFrame, text_col: str, m: int) -> list[int]:
    """m-vector of feature-occurrence counts over ``docs`` (driver-side
    result, m-bounded by partial aggregation)."""
    feats = feature_buckets_expr(text_col, m, "spark")
    rows = (
        docs.select(F.explode(F.expr(feats)).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    out = [0] * m
    for r in rows:
        out[r["b"]] = r["c"]
    return out


def dsir_train(
    target: DataFrame, raw: DataFrame, text_col: str, m: int = 1024
) -> list[float]:
    """Log importance-ratio vector lambda[b] = log p_tgt(b) - log
    p_raw(b) with add-one smoothing, each component rounded half-up to
    6 digits (oracle-replayable)."""
    import math

    def _r6(x: float) -> float:
        return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)

    ct = _bucket_counts(target, text_col, m)
    cr = _bucket_counts(raw, text_col, m)
    t_tot, r_tot = sum(ct), sum(cr)
    return [
        _r6(
            math.log((ct[b] + 1.0) / (t_tot + m))
            - math.log((cr[b] + 1.0) / (r_tot + m))
        )
        for b in range(m)
    ]


def dsir_scores(
    raw: DataFrame,
    id_col: str,
    text_col: str,
    lam: list[float],
    m: int = 1024,
) -> DataFrame:
    """(id, n_feats, log_ir) per raw document: one map-side fold of the
    literal lambda array over the doc's feature buckets — the scoring
    plan is the classifier's (zero shuffle, zero UDF). Resampling is the
    caller's ORDER BY."""
    lam_lit = (
        "array(" + ", ".join(f"cast({float(x)!r} as double)" for x in lam) + ")"
    )
    feats = feature_buckets_expr(text_col, m, "spark")
    return (
        raw.select(id_col, F.expr(feats).alias("__feats"))
        .select(
            id_col,
            F.size("__feats").cast("bigint").alias("n_feats"),
            F.round(
                F.expr(
                    f"aggregate(__feats, cast(0 as double), "
                    f"(s, b) -> s + {lam_lit}[b])"
                ),
                6,
            ).alias("log_ir"),
        )
    )
