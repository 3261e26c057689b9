"""Corpus-level training-data operators: vocabulary, packing, decontamination.

Beyond-reference capabilities (BASELINE.json north star) complementing the
dedup/similarity family — the three ops every LLM data pipeline runs
between raw documents and training shards:

  - vocabulary building: token document-frequency (the input to BPE/vocab
    pruning and idf weighting);
  - document packing: greedy sequential packing of documents into
    fixed-token-budget shards (context-window filling);
  - benchmark decontamination: n-gram collision between the training
    corpus and a held-out benchmark set (GPT-3 appendix C methodology).

All text math reuses the dual-rendered fragments (functions/text.py), so
every operator here is oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dawis_spark.functions import text as TXT


def token_document_frequency(
    df: DataFrame, id_col: str, text_col: str, top_k: int | None = None
) -> DataFrame:
    """(token, doc_freq): number of documents containing each token.

    Scale: explode(distinct tokens per doc) -> groupBy(token) with
    map-side partial counts; token cardinality (vocab) is orders smaller
    than the corpus, so the shuffle carries (token, partial count) only.
    Top-k (if set) is a TakeOrdered, not a full sort.
    """
    toks = TXT.tokens(text_col, "spark")
    exploded = df.select(
        F.col(id_col), F.explode(F.expr(f"array_distinct({toks})")).alias("token")
    )
    out = exploded.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("doc_freq")
    )
    if top_k is not None:
        out = out.orderBy(F.desc("doc_freq"), "token").limit(top_k)
    return out


def pack_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    partition_col: str,
    token_budget: int,
) -> DataFrame:
    """Greedy sequential shard assignment: within each partition (ordered
    by id), a document's shard is the token-budget bin its starting
    offset falls in — ``floor((cumsum(tokens) - tokens) / budget)``.

    Scale: packing is inherently sequential, so it MUST be scoped to a
    partition key (source, day, ...) — one window per partition, never a
    global ordering. At 100 TB the per-partition token streams are
    independent, so the window parallelizes across partitions; the only
    shuffle is the hash partition on ``partition_col``. (This is the
    standard approximation of first-fit packing used by sequence-packing
    pipelines: deterministic, single-pass, fragmentation bounded by one
    document per shard boundary.)
    """
    from pyspark.sql import Window

    toks = TXT.tokens(text_col, "spark")
    w = (
        Window.partitionBy(partition_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_tokens = df.select(
        F.col(partition_col),
        F.col(id_col),
        F.expr(f"size({toks})").cast("bigint").alias("n_tokens"),
    )
    return with_tokens.withColumn(
        "shard_id",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(token_budget)
        ).cast("bigint"),
    )


def benchmark_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, shared_shingles) for corpus docs sharing >= 1 word-k-gram with
    the benchmark set — the train/test leakage check.

    Scale: both sides reduce to (id, shingle-hash) pairs map-side
    (functions/text.shingle_hashes emits distinct hashes per doc); the
    benchmark hash set deduplicates to its vocabulary of n-grams; the
    collision join is ONE hash join on the 8-byte hash — the documents
    themselves never move. Benchmark sets are usually broadcast-small,
    but the plan stays a shuffle join so a 'benchmark' the size of a
    held-out split cannot OOM executors; AQE downgrades it to broadcast
    when the build side is actually tiny.
    """
    sh = TXT.shingle_hashes(text_col, shingle_k, "spark")
    corpus_h = corpus.select(
        F.col(id_col), F.explode(F.expr(sh)).alias("sh")
    )
    bench_h = benchmark.select(F.explode(F.expr(sh)).alias("sh")).distinct()
    return (
        corpus_h.join(bench_h, "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_shingles"))
    )
