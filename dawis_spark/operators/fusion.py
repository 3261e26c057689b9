"""Reciprocal-rank fusion (Cormack et al. 2009) — the standard way
production retrieval stacks combine a sparse (BM25) and a dense (ANN)
ranking into one list ("hybrid search" in every current vector store).

RRF is rank-only: score(d) = Σ_lists 1 / (k + rank_d), so it needs no
score calibration between lists with incomparable scales (BM25 logs vs
cosines) — the reason it beats score interpolation in practice and the
reason it replays exactly: ranks are integers, each document's fused
score is a fixed-length sum of rationals evaluated in one expression
(no aggregation-order float drift), rounded to 6 digits.

Plan shape: each input ranking is top-N-sized (config-scale), so the
fusion is a full-outer join of tiny relations + one TakeOrdered — at
100 TB the retrieval legs dominate and the fusion is free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    a_rank: str,
    b_rank: str,
    k: int = 60,
    top_n: int = 10,
) -> DataFrame:
    """Fuse two (id, rank) rankings. Output: (id, rrf_score, a_rank,
    b_rank) — top ``top_n`` by fused score desc, id asc; rank columns
    NULL where a list didn't retrieve the document."""
    from pyspark.sql import Window

    joined = a.join(b, "id", "full_outer")
    score = (
        f"round(coalesce(1.0 / ({k} + {a_rank}), 0.0d) "
        f"+ coalesce(1.0 / ({k} + {b_rank}), 0.0d), 6)"
    )
    w = Window.orderBy(F.desc("rrf_score"), F.asc("id"))
    return (
        joined.withColumn("rrf_score", F.expr(score))
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= top_n)
        .select("id", "rrf_score", a_rank, b_rank)
    )
