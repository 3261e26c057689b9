"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

Beyond-reference capability (BASELINE.json north star) for training-data
pipelines. Everything is built-in Spark SQL expressions (codegen, no
Python): these run map-side at any scale — the only cost is the scan.

Heuristics are deliberately simple & deterministic (stopword ratios,
punctuation ratios, polynomial fingerprints) so the DuckDB oracle renders
the identical definition via functions/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dawis_spark.functions import text as TXT

# Tiny per-language stopword inventories (public common words).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "es": ("el", "la", "de", "y", "en", "que", "los", "se"),
    "de": ("der", "die", "das", "und", "zu", "den", "von", "mit"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une"),
}

# A BPE-ish segmentation: letter runs, digit runs, single other non-space.
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def _stopword_ratio_expr(lang: str, dialect: str) -> str:
    """share of tokens that are stopwords of ``lang`` (over token count)."""
    toks = "__toks"
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    if dialect == "spark":
        hits = f"size(filter({toks}, t -> array_contains(array({words}), t)))"
        total = f"size({toks})"
    else:
        hits = f"len(list_filter({toks}, t -> list_contains([{words}], t)))"
        total = f"len({toks})"
    return f"(cast({hits} as double) / cast(greatest({total}, 1) as double))"


def language_scores_sql(text_col: str, dialect: str) -> dict[str, str]:
    """Per-language stopword-ratio expressions keyed ``score_<lang>``.
    Callers wrap them in a SELECT that binds ``__toks``."""
    return {
        f"score_{lang}": _stopword_ratio_expr(lang, dialect) for lang in STOPWORDS
    }


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """n-gram/stopword heuristic language ID.

    Output: (id, score_en..score_fr, lang_pred) — argmax with a fixed
    tie-break order (the STOPWORDS key order).
    """
    toks = TXT.tokens(text_col, "spark")
    scores = language_scores_sql(text_col, "spark")
    scored = df.select(
        F.col(id_col), F.expr(toks).alias("__toks")
    ).select(
        F.col(id_col),
        *[F.round(F.expr(e), 6).alias(name) for name, e in scores.items()],
    )
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier languages win ties
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best <= 0, F.lit("und")).otherwise(pred)
    return scored.withColumn("lang_pred", pred)


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Length / punctuation / stopword quality heuristics + composite score.

    Columns: n_chars_obs, n_tokens, avg_token_len, punct_ratio,
    stop_ratio_en, quality (all rounded for oracle parity).
    quality = clamp01(0.3*min(n_tokens/100,1) + 0.4*(1-punct_ratio)
              + 0.3*min(stop_ratio_en*4, 1))
    """
    toks = TXT.tokens(text_col, "spark")
    base = df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars_obs"),
        F.expr(toks).alias("__toks"),
        F.expr(f"length(regexp_replace({text_col}, '[a-zA-Z0-9\\\\s]', ''))").alias(
            "__punct"
        ),
    )
    stop = _stopword_ratio_expr("en", "spark")
    out = base.select(
        F.col(id_col),
        "n_chars_obs",
        F.size("__toks").alias("n_tokens"),
        F.round(
            F.expr(
                "aggregate(__toks, cast(0 as bigint), (s, t) -> s + length(t)) "
                "/ cast(greatest(size(__toks), 1) as double)"
            ),
            6,
        ).alias("avg_token_len"),
        F.round(
            F.col("__punct") / F.greatest(F.col("n_chars_obs"), F.lit(1)), 6
        ).alias("punct_ratio"),
        F.round(F.expr(stop), 6).alias("stop_ratio_en"),
    )
    quality = (
        0.3 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0))
        + 0.4 * (1.0 - F.col("punct_ratio"))
        + 0.3 * F.least(F.col("stop_ratio_en") * 4.0, F.lit(1.0))
    )
    return out.withColumn("quality", F.round(quality, 6))


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish regex segment count."""
    toks = TXT.tokens(text_col, "spark")
    # Spark SQL string literals process backslash escapes; double them so
    # the regex arrives intact (DuckDB standard strings don't escape).
    spark_regex = TOKEN_REGEX.replace("\\", "\\\\")
    return df.select(
        F.col(id_col),
        F.expr(f"size({toks})").alias("ws_tokens"),
        F.expr(
            f"size(regexp_extract_all(lower({text_col}), '{spark_regex}', 0))"
        ).alias("bpe_tokens"),
    )


def fingerprint(
    df: DataFrame, id_col: str, text_col: str, vectorized: bool = True
) -> DataFrame:
    """Rolling polynomial hash of the whitespace-normalized document.

    Normalization: lower + collapse runs of whitespace to one space + trim,
    so formatting-only variants collide (the point of a fingerprint).

    Two equivalent evaluators of the SAME definition (tests assert bit
    equality): the SQL higher-order fold (oracle-parity rendering, used by
    the DuckDB oracle) and an Arrow-batched numpy UDF (~3x faster on whole
    documents — HOFs evaluate interpreted, one lambda step per character).
    """
    norm = f"trim(regexp_replace(lower({text_col}), '\\\\s+', ' '))"
    normed = df.select(F.col(id_col), F.expr(norm).alias("__norm"))
    if not vectorized:
        h = TXT.char_hash("__norm", "spark")
        return normed.select(F.col(id_col), F.expr(h).alias("fingerprint"))

    import pandas as pd
    from pyspark.sql import types as T

    def _np_hash(texts):
        return pd.Series(TXT.np_char_hash_batch(list(texts)), dtype="int64")

    np_hash = F.pandas_udf(_np_hash, T.LongType())
    return normed.select(F.col(id_col), np_hash("__norm").alias("fingerprint"))


def normalized_text_sql(text_col: str, dialect: str) -> str:
    if dialect == "spark":
        return f"trim(regexp_replace(lower({text_col}), '\\\\s+', ' '))"
    return f"trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g'))"
