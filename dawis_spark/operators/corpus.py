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

    Scale: both sides reduce to (id, shingle-hash) pairs map-side — the
    Arrow-batched numpy evaluator of functions/text.shingle_hashes (the
    SQL rendering stays the oracle; SQL HOFs evaluate interpreted, one
    lambda step per token, ~4x slower on whole documents); the
    benchmark hash set deduplicates to its vocabulary of n-grams; the
    collision join is ONE hash join on the 8-byte hash — the documents
    themselves never move. Benchmark sets are usually broadcast-small,
    but the plan stays a shuffle join so a 'benchmark' the size of a
    held-out split cannot OOM executors; AQE downgrades it to broadcast
    when the build side is actually tiny.
    """
    from dawis_spark.operators.dedup import _shingle_hashes_col

    sh_col = _shingle_hashes_col(text_col, shingle_k)
    corpus_h = corpus.select(F.col(id_col), F.explode(sh_col).alias("sh"))
    bench_h = benchmark.select(F.explode(sh_col).alias("sh")).distinct()
    return (
        corpus_h.join(bench_h, "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_shingles"))
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = polynomial hash
    of (salt + id) mod 100, mapped to splits by cumulative weight.

    Properties a training pipeline needs and random() can't give:
    reproducible across runs/engines (the hash is the dual-rendered
    functions/text.char_hash), stable under corpus growth (a document
    never changes split when others are added), and salt-versioned
    (changing the salt re-rolls every assignment). Map-side only —
    zero shuffles.
    """
    h = TXT.char_hash(f"concat('{salt}', cast({id_col} as string))", "spark")
    bucket = F.expr(f"({h}) % 100")
    expr = None
    edge = 0.0
    for name, w in weights.items():
        edge += w * 100
        cond = bucket < F.lit(int(round(edge)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame, group_col: str, id_col: str, n_per_group: int, salt: str = "sample"
) -> DataFrame:
    """Deterministic n-per-group sample: rank rows inside each group by
    hash(salt + id) and keep the first n — an unbiased, reproducible
    stand-in for per-stratum random sampling.

    Scale: one window per group (hash partition on ``group_col``); the
    hash order is data-independent so re-runs and engines agree. For
    heavily skewed strata sizes the window is still a single pass —
    no per-group collect, no sortWithinPartitions of the full corpus.
    """
    from pyspark.sql import Window

    h = TXT.char_hash(f"concat('{salt}', cast({id_col} as string))", "spark")
    w = Window.partitionBy(group_col).orderBy(F.expr(h), F.col(id_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_group)
        .drop("__rk")
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf (smooth idf,
    sklearn formulation: idf = ln((N+1)/(df+1)) + 1, tf = raw count).

    Output: (id, token, tfidf, term_rank) with term_rank 1..k; ties break
    lexicographically so ranks are deterministic across engines.

    Scale: one explode -> (id, token) partial counts (the tf relation);
    doc-frequency is a groupBy on token over that relation (vocab-sized,
    orders smaller than the corpus); N joins in as a broadcast 1-row
    aggregate so the plan stays lazy. The final top-k is a window over
    each document's OWN terms (partition key = id), not a global sort.
    """
    from pyspark.sql import Window

    toks = TXT.tokens(text_col, "spark")
    tf = (
        df.select(F.col(id_col), F.explode(F.expr(toks)).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    docfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("double").alias("df_t")
    )
    n_docs = df.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(docfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1) / (F.col("df_t") + 1)) + 1),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("term_rank") <= k)
        .select(id_col, "token", "tfidf", "term_rank")
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
    tokens: DataFrame | None = None,
) -> DataFrame:
    """Okapi BM25 relevance of every document to a bag-of-words query
    (Robertson/Lucene idf variant: ln(1 + (N - df + 0.5)/(df + 0.5))).

    Output: top ``top_n`` (id, bm25) by score desc, id asc.

    Scale: the explode is filtered to the query terms BEFORE the shuffle,
    so the (id, token) relation carries only matching postings — the
    classic inverted-index access pattern, corpus-size-independent for
    selective terms. Corpus stats (N, avgdl) ride along as a broadcast
    1-row aggregate; doc length joins on id (same key as the postings).

    ``tokens`` optionally supplies a precomputed (``id_col``, __toks)
    relation — callers that run several BM25 queries (the IR eval
    panel) persist ONE tokenization and share it, instead of this
    function re-tokenizing the corpus per query (and per internal
    consumer: doc lengths AND postings both read the token arrays).
    Same values by construction: the expression is identical.
    """
    if tokens is not None:
        base = tokens.select(F.col(id_col), "__toks")
    else:
        toks = TXT.tokens(text_col, "spark")
        base = df.select(F.col(id_col), F.expr(toks).alias("__toks"))
    dl = base.select(
        F.col(id_col), F.expr("size(__toks)").cast("double").alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    term_tf = (
        base.select(F.col(id_col), F.explode("__toks").alias("token"))
        .filter(F.col("token").isin(list(terms)))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = term_tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("double").alias("df_t")
    )
    scored = (
        term_tf.join(dfreq, "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "contrib",
            F.log(
                1
                + (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
            )
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum("contrib"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.col(id_col))
        .limit(top_n)
    )


def bm25_scores_multi(
    df: DataFrame,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, tuple[str, ...]]],
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
    tokens: DataFrame | None = None,
) -> dict[int, DataFrame]:
    """Per-query top-``top_n`` BM25 for a SET of bag-of-words queries,
    sharing ONE corpus pass (tokenize -> explode -> per-(id, token) tf ->
    per-token df, persisted) across the set — the IR eval panel
    otherwise re-ran the whole postings pipeline once per query.

    Each query's output is identical to ``bm25_scores(df, ..., terms)``
    by construction: the per-query tail (filter cached tf to the query's
    terms -> join df_t -> join dl -> broadcast stats -> sum contribs ->
    TakeOrdered top_n) evaluates the same expressions over the same rows
    — a token's tf and df do not depend on which query probes it, and
    the scale-right per-query global top-k (TakeOrdered, never a
    corpus-wide window sort) is preserved.

    Scale: the shuffled relations are postings for the UNION of query
    terms (selective-term-sized) and doc lengths; both are persisted
    once instead of rebuilt per query.
    """
    if tokens is not None:
        base = tokens.select(F.col(id_col), "__toks")
    else:
        toks = TXT.tokens(text_col, "spark")
        base = df.select(F.col(id_col), F.expr(toks).alias("__toks"))
    all_terms = sorted({t for _, terms in queries for t in terms})
    dl = base.select(
        F.col(id_col), F.expr("size(__toks)").cast("double").alias("dl")
    ).persist()
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf_all = (
        base.select(F.col(id_col), F.explode("__toks").alias("token"))
        .filter(F.col("token").isin(all_terms))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        .persist()
    )
    dfreq_all = tf_all.groupBy("token").agg(
        F.count(F.lit(1)).cast("double").alias("df_t")
    )
    out: dict[int, DataFrame] = {}
    for qid, terms in queries:
        term_tf = tf_all.filter(F.col("token").isin(list(terms)))
        dfreq = dfreq_all.filter(F.col("token").isin(list(terms)))
        scored = (
            term_tf.join(dfreq, "token")
            .join(dl, id_col)
            .crossJoin(F.broadcast(stats))
            .withColumn(
                "contrib",
                F.log(
                    1
                    + (F.col("n_docs") - F.col("df_t") + 0.5)
                    / (F.col("df_t") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                ),
            )
        )
        out[qid] = (
            scored.groupBy(id_col)
            .agg(F.round(F.sum("contrib"), 6).alias("bm25"))
            .orderBy(F.desc("bm25"), F.col(id_col))
            .limit(top_n)
        )
    return out


def corpus_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    keep_lang: str = "en",
    min_quality: float = 0.5,
    min_tokens: int = 10,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """End-to-end corpus filter — the composition every LLM data pipeline
    runs between raw documents and training shards: language gate ->
    quality gate -> length gate -> exact dedup (keep lowest id per text).

    Scale shape: ALL signals (per-language stopword ratios, punctuation
    ratio, token counts, composite quality) evaluate in ONE map-side
    projection over a single scan — not operator-per-operator joins,
    which would rescan the corpus once per signal. The only shuffle in
    the whole plan is the dedup exchange, and it partitions on the
    32-byte sha2 digest, never on document text. Filters run BEFORE the
    shuffle, so rejected documents (the majority, in practice) never
    leave their input partition.

    Output: (id, *extra_cols, lang_pred, n_tokens, quality) for the
    surviving documents.
    """
    from pyspark.sql import Window

    from dawis_spark.operators.textstats import (
        STOPWORDS,
        _stopword_ratio_expr,
    )

    toks = TXT.tokens(text_col, "spark")
    base = df.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.col(text_col).alias("__text"),
        F.length(text_col).alias("__n_chars"),
        F.expr(toks).alias("__toks"),
        F.expr(
            f"length(regexp_replace({text_col}, '[a-zA-Z0-9\\\\s]', ''))"
        ).alias("__punct"),
    )
    langs = list(STOPWORDS)
    scored = base.select(
        id_col,
        *extra_cols,
        "__text",
        F.size("__toks").alias("n_tokens"),
        *[
            F.round(F.expr(_stopword_ratio_expr(l, "spark")), 6).alias(f"score_{l}")
            for l in langs
        ],
        F.round(
            F.col("__punct") / F.greatest(F.col("__n_chars"), F.lit(1)), 6
        ).alias("punct_ratio"),
    )
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier languages win ties
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best <= 0, F.lit("und")).otherwise(pred)
    quality = F.round(
        F.lit(0.3) * F.least(F.col("n_tokens") / 100.0, F.lit(1.0))
        + F.lit(0.4) * (F.lit(1.0) - F.col("punct_ratio"))
        + F.lit(0.3) * F.least(F.col(f"score_{keep_lang}") * 4.0, F.lit(1.0)),
        6,
    )
    kept = (
        scored.withColumn("lang_pred", pred)
        .withColumn("quality", quality)
        .filter(
            (F.col("lang_pred") == keep_lang)
            & (F.col("quality") >= min_quality)
            & (F.col("n_tokens") >= min_tokens)
        )
    )
    w = Window.partitionBy(F.sha2(F.col("__text"), 256)).orderBy(F.col(id_col))
    return (
        kept.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, *extra_cols, "lang_pred", "n_tokens", "quality")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 100,
    overlap: int = 10,
) -> DataFrame:
    """Split documents into overlapping token windows — the
    context-window chunking step between cleaned documents and training
    sequences (the fixed-stride approximation every large pipeline uses;
    pack_documents then bins the chunks).

    Output: (id, chunk_id, n_chunk_tokens, chunk_text), chunk i covering
    tokens [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; the final window may be short, and
    a document never yields zero chunks (empty text -> one empty chunk).

    Scale: pure map-side array arithmetic — tokenize once, then
    posexplode over a sequence of window offsets; no shuffle at all.
    Row growth is n_tokens/stride per doc, the unavoidable output size.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = TXT.tokens(text_col, "spark")
    base = df.select(
        F.col(id_col),
        F.expr(toks).alias("__toks"),
    ).withColumn("__n", F.size("__toks"))
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.col("__n") - F.lit(chunk_tokens)) / F.lit(stride)) + 1,
    ).cast("int")
    return (
        base.withColumn("__nc", n_chunks)
        .select(
            id_col,
            "__toks",
            F.explode(F.expr("sequence(0, __nc - 1)")).alias("chunk_id"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.expr(
                f"slice(__toks, chunk_id * {stride} + 1, {chunk_tokens})"
            ).alias("__chunk"),
        )
        .select(
            id_col,
            "chunk_id",
            F.size("__chunk").cast("bigint").alias("n_chunk_tokens"),
            F.array_join("__chunk", " ").alias("chunk_text"),
        )
    )


def mixture_weights(
    df: DataFrame,
    group_col: str,
    mass_col: str,
    alpha: float = 0.5,
    total_budget: int = 10_000,
) -> DataFrame:
    """Temperature-scaled data-mixing weights per source/domain — the
    sampling-ratio computation LLM pipelines run to rebalance a corpus
    (w_g proportional to mass_g^alpha; alpha<1 upsamples the tail, the
    standard multilingual/domain temperature trick).

    Determinism across engines: the per-group mass is an integer SUM
    (order-independent), and the normalizer Z folds the k group terms in
    sorted order via aggregate(array_sort(collect_list(...))) — an IEEE
    sum over doubles is order-dependent, so a plain SUM(pow(mass,alpha))
    could differ between Spark and the oracle in the last ulp and flip
    the 6-digit rounding. budget_docs derives from the already-rounded
    weight (half-up), so it matches wherever weight does.

    Scale shape: one shuffle on group_col carrying (group, partial-sum)
    pairs; the normalizer is a single-row broadcast (same pattern as
    the corpus stats sides in tfidf/bm25). Group count is domain-sized
    (thousands at most), never corpus-sized.
    """
    per = df.groupBy(group_col).agg(F.sum(F.col(mass_col)).alias("mass"))
    z = per.agg(
        F.expr(
            "aggregate(array_sort(collect_list(pow(mass, "
            f"{alpha}))), cast(0 as double), (s, v) -> s + v)"
        ).alias("z")
    )
    w = F.round(F.pow("mass", F.lit(alpha)) / F.col("z"), 6)
    return (
        per.crossJoin(F.broadcast(z))
        .select(
            group_col,
            F.col("mass"),
            w.alias("weight"),
            F.floor(w * total_budget + F.lit(0.5))
            .cast("bigint")
            .alias("budget_docs"),
        )
    )


def mixture_sample(
    df: DataFrame, group_col: str, id_col: str, rates: DataFrame
) -> DataFrame:
    """Materialize a data mixture: keep each row iff the uniformized
    hash of its id falls under its group's sampling rate — the step that
    turns ``mixture_weights``'s ratios into an actual rebalanced corpus.

    ``rates`` is (group_col, rate_ppm) — domain-count-sized, broadcast.
    Membership is a pure function of (id, group rate): the sample is
    reproducible across runs/engines/layouts, composable with the
    coordinated-sampling property of hash_sample_pred (same id ⇒ same
    draw in every table), and REFRESH-STABLE — re-running after an
    upstream append keeps every previously-sampled row (no resample
    churn in downstream shards), which rand()-per-row sampling cannot
    offer. Evaluates inside the scan after a broadcast join; no shuffle.
    """
    from dawis_spark.operators.sketches import _mixed_sql

    h = TXT.char_hash(f"cast({id_col} as string)", "spark")
    pred = f"({_mixed_sql(h, 'spark')}) % 1000000 < rate_ppm"
    return df.join(F.broadcast(rates), group_col).where(F.expr(pred))


def build_postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """POSITIONAL inverted index: one (term, id, positions, tf) posting
    per distinct term per document, positions 0-based in token order —
    the index bm25_scores' bag-of-words form can't serve: phrase and
    proximity queries need offsets.

    Scale: index BUILD is the one legitimately token-sized shuffle in
    the search family (each token ships its 8-byte hash + position once,
    then aggregates into per-doc position arrays); production persists
    the result bucketed by ``term`` (catalog.write_bucketed) so QUERIES
    touch only the probed terms' buckets and join postings without an
    exchange. Terms are char-hashes, never strings, on the wire.
    """
    th = TXT.token_hash_array(text_col, "spark")
    return (
        docs.select(F.col(id_col), F.expr(th).alias("__th"))
        .select(id_col, F.posexplode("__th").alias("pos", "term"))
        .groupBy("term", id_col)
        .agg(
            F.sort_array(F.collect_list("pos")).alias("positions"),
            F.count(F.lit(1)).alias("tf"),
        )
    )


def phrase_query(
    postings: DataFrame, id_col: str, phrase_terms: list[int]
) -> DataFrame:
    """Exact phrase search over a positional posting index: a phrase of
    k term hashes matches at ``base`` when term i occurs at ``base + i``
    for ALL i — the classic positional-intersection algorithm
    (Manning/Raghavan/Schütze IR ch. 2), expressed as position
    normalization (pos - i) + a count-distinct-terms group.

    The phrase relation is config-sized and broadcast; only the k probed
    terms' postings leave the index scan (predicate pushdown on the
    bucketed term column). Repeated terms in the phrase are handled (the
    join fans out each occurrence to every phrase slot holding that
    term; count(DISTINCT i) = k still requires every slot witnessed).

    Output: (id, n_matches, first_pos) per matching document.
    """
    spark = postings.sparkSession
    ph = spark.createDataFrame(
        [(i, int(h)) for i, h in enumerate(phrase_terms)], "i int, term bigint"
    )
    k = len(phrase_terms)
    # Explicit probed-term filter BEFORE the slot join (r15): the join
    # with the k-row phrase relation restricts to these terms anyway,
    # but Catalyst cannot push a JOIN through the index-build aggregate —
    # it CAN push this equivalent IN-filter on the grouping column below
    # the groupBy, so an unbucketed postings build shuffles only the k
    # probed terms' tokens instead of the whole corpus (locally ~37x
    # fewer aggregate input rows; on the bucketed production index it is
    # the same partition prune the docstring describes).
    cand = (
        postings.filter(F.col("term").isin([int(h) for h in phrase_terms]))
        .join(F.broadcast(ph), "term")
        .select(id_col, "i", F.explode("positions").alias("p"))
        .withColumn("base", F.col("p") - F.col("i"))
    )
    hits = (
        cand.groupBy(id_col, "base")
        .agg(F.countDistinct("i").alias("__nt"))
        .filter(F.col("__nt") == k)
    )
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_matches"), F.min("base").alias("first_pos")
    )


def phrase_term_hashes(phrase: str) -> list[int]:
    """Driver-side term hashes of a whitespace phrase (same char-hash
    family the index uses)."""
    from dawis_spark.functions.text import _np_token_hash

    return [
        _np_token_hash(t) for t in phrase.lower().split() if t != ""
    ]


def pmi_collocations(
    docs: DataFrame,
    text_col: str,
    min_count: int = 5,
) -> DataFrame:
    """Collocation mining by pointwise mutual information (Church &
    Hanks 1990; the statistic behind word2vec's phrase pass, Mikolov et
    al. 2013): score each adjacent token pair by

        pmi(w1, w2) = ln( p(w1 w2) / (p(w1) * p(w2)) )

    with bigram probability over all bigram slots and unigram
    probabilities over all token slots, keeping pairs seen at least
    ``min_count`` times (PMI is notoriously noisy on rare pairs — the
    classic cutoff, not a scalability cap).

    Scale: three counting aggregations (unigrams, bigrams, the two
    scalar totals) — all map-side partially aggregated, so exchanges
    carry vocabulary-sized rows, not corpus-sized; the scoring joins key
    on tokens (vocabulary-sized relations). Token strings ride the
    shuffle here (unlike the hash-only dedup family) because the OUTPUT
    is the human-readable phrase list.

    Output: (bigram, c12, pmi) — counts and 6-digit-rounded PMI.
    """
    toks = TXT.tokens(text_col, "spark")
    w = docs.select(F.expr(toks).alias("w"))
    uni = w.select(F.explode("w").alias("t"))
    unic = uni.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    bi = w.select(
        F.explode(
            F.expr(
                "case when size(w) < 2 then array() else "
                "transform(sequence(0, size(w) - 2), "
                "i -> struct(w[i] as t1, w[i + 1] as t2)) end"
            )
        ).alias("p")
    ).select("p.t1", "p.t2")
    bic = bi.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("c12"))
    tot = uni.agg(F.count(F.lit(1)).alias("n")).crossJoin(
        bi.agg(F.count(F.lit(1)).alias("b"))
    )
    u1 = unic.select(F.col("t").alias("t1"), F.col("c").alias("c1"))
    u2 = unic.select(F.col("t").alias("t2"), F.col("c").alias("c2"))
    return (
        bic.filter(F.col("c12") >= min_count)
        .join(u1, "t1")
        .join(u2, "t2")
        .crossJoin(F.broadcast(tot))
        .select(
            F.concat_ws(" ", "t1", "t2").alias("bigram"),
            "c12",
            F.round(
                F.log(
                    (F.col("c12") * F.lit(1.0) / F.col("b"))
                    / (
                        (F.col("c1") * F.lit(1.0) / F.col("n"))
                        * (F.col("c2") * F.lit(1.0) / F.col("n"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )


def source_js_divergence(docs: DataFrame, source_col: str, text_col: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between per-source unigram
    distributions — the corpus-drift / source-similarity matrix a
    mixture designer reads next to source_mixture_weights (Lin 1991;
    the bounded, symmetric alternative to KL).

    Identity that keeps the plan shuffle-light: tokens present in only
    one source of a pair contribute exactly 0.5*ln2*p each, so

      JS = 0.5 * sum_shared[ p*ln(2p/(p+q)) + q*ln(2q/(p+q)) ]
         + 0.5 * ln2 * [ (1 - sum_shared p) + (1 - sum_shared q) ]

    needs only the INNER join on shared tokens plus per-pair shared-mass
    sums — no full-outer join materializing every (pair, token) slot.

    Scale: distributions are vocabulary-sized relations; the shared-token
    self-join keys on token (vocabulary-sized exchange), and the output
    is S*(S-1)/2 rows. Nothing corpus-sized moves after the one counting
    aggregation. Output: (src_a, src_b, js_div), js in [0, ln 2];
    pairs sharing NO token are absent (their JS is exactly ln 2).
    """
    import math
    toks = TXT.tokens(text_col, "spark")
    cnt = (
        docs.select(F.col(source_col).alias("src"), F.explode(F.expr(toks)).alias("t"))
        .groupBy("src", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cnt.groupBy("src").agg(F.sum("c").alias("n"))
    p = cnt.join(tot, "src").select(
        "src", "t", (F.col("c") * F.lit(1.0) / F.col("n")).alias("p")
    )
    a = p.select(F.col("src").alias("src_a"), "t", F.col("p").alias("pa"))
    b = p.select(F.col("src").alias("src_b"), "t", F.col("p").alias("pb"))
    shared = a.join(b, "t").filter(F.col("src_a") < F.col("src_b"))
    term = F.expr(
        "pa * ln(2.0 * pa / (pa + pb)) + pb * ln(2.0 * pb / (pa + pb))"
    )
    return (
        shared.groupBy("src_a", "src_b")
        .agg(
            F.sum(term).alias("__sh"),
            F.sum("pa").alias("__ma"),
            F.sum("pb").alias("__mb"),
        )
        .select(
            "src_a",
            "src_b",
            F.round(
                0.5 * F.col("__sh")
                + 0.5
                * F.lit(math.log(2.0))
                * ((1.0 - F.col("__ma")) + (1.0 - F.col("__mb"))),
                6,
            ).alias("js_div"),
        )
    )
