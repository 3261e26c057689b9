"""Distributed logistic-regression TRAINING — the learning half of the
quality-classifier story (operators/classifier.py ships inference with a
pluggable weight vector; fasttext-style gates in CCNet/RedPajama/FineWeb
are exactly such trained linear models).

Full-batch gradient descent with a fixed iteration count, deterministic
end to end — the pagerank/kmeans discipline applied to model training:

* **Per-row math is rounded before aggregation.** margin and residual
  round to 6 digits; each per-dimension gradient contribution scales to
  an INTEGER (micro units) so the gradient sum is exact int64 in any
  partitioning — no float summation-order drift (the LM/trend-slopes
  integer-sufficient-statistics discipline).
* **Training is EAGER like train_kmeans**: each iteration aggregates
  the 65 gradient integers, collects them (config-sized — the weight
  vector IS driver state in every trainer), applies the update in
  HALF_UP-rounded arithmetic matching SQL round(), and re-injects the
  new weights as literals into the next iteration's scoring fold.
* **Scoring is the inference plan**: a sequential fold over the vector
  against a literal/broadcast weight array inside the scan — no explode
  in the margin path; only the gradient aggregation explodes (65 rows
  per example, partial-aggregated map-side to a 65-key exchange).

The DuckDB oracle replays every iteration: weights live as a
(dim, weight) relation per round, margins use the same sequential
fold, and the update uses the same expression shape — bit-identical
trajectories (exp() is the one libm call; its input is pre-rounded so
a 1-ulp engine difference cannot survive the post-round, the same
convention the PMI/perplexity operators use for ln()).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dawis_spark.functions import vectors as V


def _half_up6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def _w_literal(w: list[float]) -> str:
    return (
        "array(" + ", ".join(f"cast({x!r} as double)" for x in w) + ")"
    )


def _xs_expr(vec_col: str) -> str:
    """Feature array: vector dims cast to double + bias feature 1.0."""
    return (
        f"concat(transform({vec_col}, x -> cast(x as double)), "
        f"array(cast(1.0 as double)))"
    )


def margin_expr(vec_col: str, w: list[float]) -> str:
    """round-6 margin of the example against literal weights (the
    last weight is the bias)."""
    xs = _xs_expr(vec_col)
    return f"round({V.dot(xs, _w_literal(w), 'spark')}, 6)"


def logreg_train(
    data: DataFrame,
    vec_col: str,
    y_expr: str,
    dim: int,
    iterations: int = 3,
    lr: float = 1.0,
) -> list[float]:
    """Learn ``dim + 1`` weights (bias last) by ``iterations`` rounds of
    full-batch GD from zero init. ``y_expr``: SQL expr yielding the 0/1
    double label. Returns the weight list (driver-side, config-sized)."""
    n = data.count()
    w = [0.0] * (dim + 1)
    for _ in range(iterations):
        resid = (
            f"round(1.0 / (1.0 + exp(-({margin_expr(vec_col, w)}))) "
            f"- ({y_expr}), 6)"
        )
        grads = (
            data.select(
                F.expr(resid).alias("__r"),
                F.posexplode(F.expr(_xs_expr(vec_col))).alias("__d", "__x"),
            )
            .select(
                "__d",
                F.expr(
                    "cast(round(__r * __x * 1000000) as bigint)"
                ).alias("__g"),
            )
            .groupBy("__d")
            .agg(F.sum("__g").alias("__g"))
            .collect()
        )
        g = {r["__d"]: r["__g"] for r in grads}
        w = [
            _half_up6(w[j] - lr * (g.get(j, 0) / 1e6) / n)
            for j in range(dim + 1)
        ]
    return w


def auc_accuracy(
    data: DataFrame,
    vec_col: str,
    y_expr: str,
    w: list[float],
) -> DataFrame:
    """Exact tie-aware ROC AUC (midrank rank-sum form — integers until
    the final division) + accuracy at threshold 0, one row:
    (n, n_pos, auc, accuracy)."""
    from pyspark.sql import Window

    scored = data.select(
        F.expr(f"cast({y_expr} as int)").alias("y"),
        F.expr(margin_expr(vec_col, w)).alias("s"),
    )
    rk = scored.withColumn(
        "rn", F.row_number().over(Window.orderBy("s"))
    )
    mr = rk.groupBy("s").agg(
        (F.min("rn") + F.max("rn")).alias("mr2")
    )
    j = rk.join(mr, "s")
    return j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
        F.round(
            (
                F.sum(F.when(F.col("y") == 1, F.col("mr2")).otherwise(0)).cast(
                    "double"
                )
                - F.sum("y").cast("double")
                * (F.sum("y").cast("double") + 1)
            )
            / (
                2.0
                * F.sum("y").cast("double")
                * (F.count(F.lit(1)) - F.sum("y")).cast("double")
            ),
            6,
        ).alias("auc"),
        F.round(
            F.sum(
                F.when(
                    (F.col("s") > 0) == (F.col("y") == 1), F.lit(1)
                ).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("accuracy"),
    )
