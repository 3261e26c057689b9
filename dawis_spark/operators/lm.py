"""Perplexity-based quality filtering — the CCNet gate (Wenzek et al.
2020: "CCNet: Extracting High Quality Monolingual Datasets from Web
Crawl Data"), the one canonical pretraining-pipeline filter the corpus
family (C4 line rules, Gopher repetition, DSIR importance, language ID)
was still missing.

CCNet trains a KenLM 5-gram model on a trusted reference corpus
(Wikipedia), scores every crawled document by perplexity, and keeps the
head/middle/tail bands of the distribution. This re-expression keeps
the pipeline shape and swaps the model for an add-one-smoothed BIGRAM
LM — the smoothing/order is a pluggable detail (the probability table
is just a keyed relation); the distributed plumbing is the point:

* **Training** = two counting aggregations over the reference slice
  (unigram follow-counts and bigram counts) plus a distinct-count for
  the vocabulary size — all map-side partial, vocabulary-sized
  exchanges.
* **Scoring** joins each document's adjacent-pair stream against the
  count relations. Tokens are char-hashed (functions/text.token_hash_
  array, dual-rendered) and a bigram key packs both hashes into ONE
  int64 (``h1 * MOD + h2`` — valid since h < MOD; the same composite-
  key trick as the prefix-filter ordering), so every exchange carries
  8-byte keys and token strings never leave the scan. Hash collisions
  merge counts for ~n²/2·MOD token pairs — the standard trade, shared
  by the dedup family.
* **Determinism**: per-pair log-probs are rounded to 6 digits, scaled
  to integer micro-nats, and summed as int64 — bit-identical in any
  partitioning/engine (the trend_slopes integer-sufficient-statistics
  discipline). Banding compares these integers, never floats; the
  reported perplexity is a pure presentation function of the integer.
* **Banding**: head/middle/tail by terciles of the per-token NLL,
  computed with the distributed-selection quantiles
  (operators/sketches.rank_quantiles_select) — no global sort.

Per-pair probability: P(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V),
V = reference vocabulary size (+1 for the unseen-history pseudo-count
denominator when c1 = 0, which the formula covers with c = 0 joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dawis_spark.functions import text as TXT


def _pair_keys_expr() -> str:
    """(pos-ordered) adjacent-pair composite keys from a token-hash
    array column ``__th``: h1 * MOD + h2 (one int64 per bigram slot)."""
    return (
        "case when size(__th) < 2 then array() else "
        f"transform(sequence(0, size(__th) - 2), "
        f"p -> __th[p] * {TXT.MOD}L + __th[p + 1]) end"
    )


def bigram_lm_counts(
    train_docs: DataFrame, text_col: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the add-one bigram LM on the reference slice.

    Returns ``(follow_counts, bigram_counts, vocab)``:
    (h1, c1) — times hash h1 appears as a bigram HISTORY;
    (bk, c12) — count per composite bigram key;
    a 1-row (v,) vocabulary-size relation (distinct token hashes).
    """
    th = TXT.token_hash_array(text_col, "spark")
    hashed = train_docs.select(F.expr(th).alias("__th"))
    pairs = hashed.select(F.explode(F.expr(_pair_keys_expr())).alias("bk"))
    bic = pairs.groupBy("bk").agg(F.count(F.lit(1)).alias("c12"))
    follow = pairs.select(
        F.expr(f"bk div {TXT.MOD}").alias("h1")
    ).groupBy("h1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        hashed.select(F.explode("__th").alias("h"))
        .agg(F.countDistinct("h").alias("v"))
    )
    return follow, bic, vocab


def perplexity_bands(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    train_predicate: str,
    pcts: tuple[int, int] = (33, 67),
) -> DataFrame:
    """Score every document against the bigram LM trained on the
    ``train_predicate`` slice and band by NLL terciles (CCNet's
    head / middle / tail; documents with < 2 tokens band as 'na').

    Output: (id, n_trans, nll_micro, ppl, band) where ``nll_micro`` is
    the exact int64 per-token NLL in micro-nats (the banding key) and
    ``ppl = round(exp(nll_micro / 1e6), 4)`` its readable form.
    """
    from dawis_spark.operators.sketches import rank_quantiles_select

    follow, bic, vocab = bigram_lm_counts(
        docs.filter(F.expr(train_predicate)), text_col
    )
    th = TXT.token_hash_array(text_col, "spark")
    doc_pairs = (
        docs.select(F.col(id_col).alias("id"), F.expr(th).alias("__th"))
        .select("id", F.explode(F.expr(_pair_keys_expr())).alias("bk"))
        .withColumn("h1", F.expr(f"bk div {TXT.MOD}"))
    )
    # add-one smoothed log-prob, rounded then scaled to integer
    # micro-nats: the sum is order-independent int64 arithmetic
    logp_micro = (
        "cast(round(round(ln((c12n + 1.0) / (c1n + vn)), 6) * 1000000) "
        "as bigint)"
    )
    scored = (
        doc_pairs.join(bic, "bk", "left")
        .join(follow, "h1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "id",
            F.coalesce("c12", F.lit(0)).alias("c12n"),
            F.coalesce("c1", F.lit(0)).alias("c1n"),
            F.col("v").alias("vn"),
        )
        .select("id", F.expr(logp_micro).alias("lp"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_trans"),
            (-F.sum("lp")).alias("nll_sum_micro"),
        )
        .withColumn(
            "nll_micro",
            F.expr("nll_sum_micro div n_trans").cast("bigint"),
        )
        # persisted: the scored relation feeds the tercile selection AND
        # the banded output — without it the tokenize/explode + two LM
        # joins run twice per pass (the r15 before-plan showed 145
        # Exchange nodes from exactly that duplication). One row per doc:
        # document-count-bounded state, spills if it outgrows memory.
        .persist()
    )
    thr = rank_quantiles_select(
        scored.withColumn("__g", F.lit(1)), ["__g"], "nll_micro", list(pcts)
    )
    tlo, thi = pcts
    cuts = thr.groupBy().agg(
        F.max(F.when(F.col("pct") == tlo, F.col("value"))).alias("t_lo"),
        F.max(F.when(F.col("pct") == thi, F.col("value"))).alias("t_hi"),
    )
    band = (
        f"case when nll_micro <= t_lo then 'head' "
        f"when nll_micro <= t_hi then 'middle' else 'tail' end"
    )
    out = (
        scored.crossJoin(F.broadcast(cuts))
        .select(
            "id",
            "n_trans",
            "nll_micro",
            F.round(F.exp(F.col("nll_micro").cast("double") / 1e6), 4).alias(
                "ppl"
            ),
            F.expr(band).alias("band"),
        )
    )
    # documents too short to have a bigram keep a typed 'na' row
    all_ids = docs.select(F.col(id_col).alias("id"))
    return all_ids.join(out, "id", "left").select(
        "id",
        F.coalesce("n_trans", F.lit(0)).cast("bigint").alias("n_trans"),
        "nll_micro",
        "ppl",
        F.coalesce("band", F.lit("na")).alias("band"),
    )
