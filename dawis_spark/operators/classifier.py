"""Linear text-classifier inference at corpus scale — the fasttext-style
quality-filter shape every LLM data pipeline runs (CCNet, RedPajama,
FineWeb all gate documents on a hashed-bag-of-words linear model).

Model = a weight vector over 2^b hashed token buckets (Weinberger et al.
2009, feature hashing). Inference is embarrassingly map-side: tokenize,
hash each token to its bucket, sum the bucket weights, threshold. The
implementation keeps it exactly that shape in Spark: the weight vector
is a SINGLE-ROW relation (config-sized: n_features ints) broadcast to
every task, and scoring is one codegen'd fold over the token array —
``aggregate(tokens, 0, (s, t) -> s + w[bucket(t)])`` — so the whole
classifier runs inside the document scan: no explode, no per-token
shuffle, no UDF. A naive explode→join-weights→groupBy(doc) plan
shuffles one row PER TOKEN — at 100 TB that is a larger shuffle than
the corpus itself; the fold ships zero.

Weights here are a deterministic pseudo-random stand-in (integer
hash-mixed per bucket, zero-mean) because no trained artifact ships in
this environment — the Spark-side plumbing (model relation, broadcast,
bucket hashing, fold, thresholding) is the real, tested surface, and a
trained fasttext/logistic vector drops in by replacing
``pseudo_weights``'s generator expression with a read of the artifact.
Integer weights + integer token hashing make scores exact int64 —
bit-reproducible in the DuckDB oracle regardless of fold order (the
fold IS sequential in both engines) or partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dawis_spark.functions import text as TXT

MOD = TXT.MOD

# same uniformizing rounds as the sketch family: bucket spread assumes
# equidistributed hashes (operators/sketches.py design notes)
_ROUNDS = ((48271, 11), (69621, 137))


# zero-mean integer pseudo-weights: ((48271*b + 11) % 997) - 498
_W_GEN = "((48271 * b + 11) % 997) - 498"


def pseudo_weights(spark: SparkSession, n_features: int) -> DataFrame:
    """The model relation: one row, ``w: array<int>`` of length
    n_features. Replace the generator with a read of a trained weight
    artifact for a real model — the broadcast/scoring plan is unchanged."""
    return spark.range(1).select(
        F.expr(
            f"transform(sequence(0, {n_features - 1}), "
            f"b -> cast({_W_GEN} as int))"
        ).alias("w")
    )


def _buckets_expr(toks_expr: str, n_features: int, dialect: str) -> str:
    """Array of token buckets: hash each token ONCE, then mix and
    reduce mod n_features through chained transforms — each stage binds
    its input, so the O(len) per-token hash fold evaluates once per
    token instead of 3^rounds times (the expression-blowup trap
    operators/sketches.py documents)."""
    if dialect == "spark":
        out = f"transform({toks_expr}, t -> {TXT.char_hash('t', dialect)})"
        for a, b in _ROUNDS:
            out = f"transform({out}, __x -> (__x * __x + {a} * __x + {b}) % {MOD})"
        return f"transform({out}, __x -> __x % {n_features})"
    out = f"list_transform({toks_expr}, t -> {TXT.char_hash('t', dialect)})"
    for a, b in _ROUNDS:
        out = f"list_transform({out}, __x -> (__x * __x + {a} * __x + {b}) % {MOD})"
    return f"list_transform({out}, __x -> __x % {n_features})"


def _bucket(tok_expr: str, n_features: int, dialect: str) -> str:
    """Single-token bucket (used by tests to hand-check scores)."""
    wrapped = f"array({tok_expr})" if dialect == "spark" else f"[{tok_expr}]"
    arr = _buckets_expr(wrapped, n_features, dialect)
    return f"({arr})[{0 if dialect == 'spark' else 1}]"


def score_expr(text_col: str, n_features: int, dialect: str) -> str:
    """int64 score: sum of bucket weights over the token bag. ``w`` must
    be in scope (the broadcast model row)."""
    toks = TXT.tokens(text_col, dialect)
    buckets = _buckets_expr(toks, n_features, dialect)
    if dialect == "spark":
        return (
            f"aggregate({buckets}, cast(0 as bigint), (s, b) -> s + w[b])"
        )
    return (
        f"list_reduce(list_prepend(cast(0 as bigint), "
        f"list_transform({buckets}, b -> cast(w[b + 1] as bigint))), "
        f"(s, v) -> s + v)"
    )


def classify(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    weights: DataFrame,
    n_features: int = 4096,
) -> DataFrame:
    """(id, n_tokens, score, mean_w, label) per document — one map-side
    pass over the scan with the broadcast model row; only the final
    (small) result crosses any exchange the CALLER adds."""
    toks = TXT.tokens(text_col, "spark")
    return (
        docs.select(id_col, text_col)
        .crossJoin(F.broadcast(weights))
        .select(
            id_col,
            F.expr(f"size({toks})").cast("bigint").alias("n_tokens"),
            F.expr(score_expr(text_col, n_features, "spark")).alias("score"),
        )
        .withColumn(
            "mean_w",
            F.when(
                F.col("n_tokens") > 0,
                F.round(F.col("score") / F.col("n_tokens"), 6),
            ),
        )
        .withColumn("label", F.col("score") > 0)
    )


def classifier_oracle_ctes(
    table: str, id_col: str, text_col: str, n_features: int
) -> str:
    """DuckDB replay ending in ``clf(id, n_tokens, score, mean_w,
    label)`` — same weights, buckets, and sequential fold."""
    toks = TXT.tokens(text_col, "duck")
    return f"""clf_w AS (
  SELECT list_transform(range(0, {n_features}),
                        b -> CAST({_W_GEN} AS INT)) AS w
),
clf AS (
  SELECT {id_col},
    CAST(len({toks}) AS BIGINT) AS n_tokens,
    {score_expr(text_col, n_features, 'duck')} AS score,
    CASE WHEN len({toks}) > 0
         THEN round(CAST({score_expr(text_col, n_features, 'duck')} AS DOUBLE)
                    / len({toks}), 6) END AS mean_w,
    {score_expr(text_col, n_features, 'duck')} > 0 AS label
  FROM {table} CROSS JOIN clf_w
)"""
