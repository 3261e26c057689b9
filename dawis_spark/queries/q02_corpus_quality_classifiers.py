"""Query inventory, part 2/6 (definition order preserved from the pre-split queries.py; see _registry.REGISTRY_ORDER).

Corpus mixtures, semantic dedup, text quality, language ID, classifier family (logreg/AUC/calibration), whale-guarded journeys.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dawis_spark.catalog import register_testdata
from dawis_spark.queries._registry import query
from dawis_spark.queries.q01_spine_dedup_ann import (
    _BM25_TERMS,
    _TS,
    _TXT,
    _VEC,
    _embedding_topk_oracle,
    _ivfpq_oracle,
    _kmeans_c1_ctes,
)

_MIXTURE_ORACLE = """
WITH per AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS mass FROM documents GROUP BY source
),
z AS (
  SELECT list_reduce(
           list_prepend(CAST(0 AS DOUBLE), list_sort(list(pow(mass, 0.5)))),
           (s, v) -> s + v) AS z
  FROM per
)
SELECT source, mass,
       ROUND(pow(mass, 0.5) / z.z, 6) AS weight,
       CAST(floor(ROUND(pow(mass, 0.5) / z.z, 6) * 10000 + 0.5) AS BIGINT)
         AS budget_docs
FROM per, z ORDER BY source
"""


@query("source_mixture_weights", oracle=_MIXTURE_ORACLE)
def source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled data-mixing weights per source (w proportional
    to char-mass^0.5, the standard alpha<1 tail-upsampling trick), plus
    the per-source document budget out of a 10k-doc target.

    Determinism: integer char-mass sums are order-independent, and the
    normalizer folds the k group terms in SORTED order on both engines
    (operators/corpus.mixture_weights) — a plain double SUM could differ
    in the last ulp between Spark and DuckDB and flip the 6-digit round.

    Scale: one shuffle carrying (source, partial-sum); the normalizer is
    a single-row broadcast. Group count is domain-sized, never
    corpus-sized."""
    from dawis_spark.operators.corpus import mixture_weights

    return mixture_weights(
        spark.table("documents").select("source", "n_chars"),
        "source",
        "n_chars",
        alpha=0.5,
        total_budget=10_000,
    ).orderBy("source")


# Deterministic URL synthesis (same text in both dialects): scheme-case,
# www-prefix, trailing-slash, utm-param, param-order, and fragment variants
# all collapse onto one canonical key, so the dedup has real work to do.
_SYNTH_URL = (
    "concat("
    "CASE WHEN doc_id % 3 = 0 THEN 'HTTP://' ELSE 'https://' END, "
    "CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END, "
    "'Site', CAST(doc_id % 7 AS STRING), '.Example.COM', "
    "'/page/', CAST(doc_id % 50 AS STRING), "
    "CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END, "
    "CASE WHEN doc_id % 5 = 0 THEN concat('?utm_source=feed&ref=', CAST(doc_id % 10 AS STRING)) "
    "     WHEN doc_id % 5 = 1 THEN concat('?ref=', CAST(doc_id % 10 AS STRING), '&utm_campaign=x') "
    "     ELSE '' END, "
    "CASE WHEN doc_id % 6 = 0 THEN '#section' ELSE '' END)"
)


def _url_canonical_oracle() -> str:
    from dawis_spark.functions.urls import canonical_url_sql

    return f"""
WITH u AS (SELECT doc_id, {_SYNTH_URL} AS url FROM documents),
c AS (SELECT doc_id, {canonical_url_sql('url', 'duck')} AS canonical_url FROM u)
SELECT canonical_url, COUNT(*) AS n_variants, MIN(doc_id) AS canonical_doc_id
FROM c GROUP BY canonical_url ORDER BY canonical_url
"""


@query("url_canonical_dedup", oracle=_url_canonical_oracle())
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup — the SEO-flavored page-identity
    operator the reference's URL model implies (utilities/url.py:4-17;
    the canonical-tag family is A4): scheme folded to https, host
    lowercased and de-www'd, fragment dropped, utm_* params stripped,
    surviving params sorted, trailing slash stripped; then one group per
    canonical page keeping the lowest doc_id (functions/urls.
    canonical_url_sql, dual-rendered Spark/DuckDB).

    Scale: canonicalization is pure map-side string/array built-ins (no
    UDF); the dedup shuffle carries (canonical_url, id) pairs only. A
    crawl-scale run would hash the canonical key for the exchange the
    way exact_dedup does."""
    from dawis_spark.functions.urls import canonical_url_sql

    return (
        spark.table("documents")
        .select("doc_id", F.expr(_SYNTH_URL).alias("url"))
        .select("doc_id", F.expr(canonical_url_sql("url", "spark")).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .orderBy("canonical_url")
    )


def _semantic_dedup_oracle(
    k: int, dim: int, threshold: float, cap: int, n_planes: int = 4
) -> str:
    """Replay of semantic_dedup: the trained-k-means CTE chain assigns
    every vector to a cluster, then the capped within-cluster routing
    (exact below ``cap`` rows, block-scoped sign-LSH above) finds
    cosine >= threshold pairs, and any vector matching a LOWER-id
    cluster-mate is a duplicate."""
    from dawis_spark.operators.similarity import lsh_bucket_expr

    cos_final = _VEC.cosine_null("v.vec", "fc.cvec", "duck")
    dot = _VEC.dot("a.vec", "b.vec", "duck")
    nsq = _VEC.norm_sq("vec", "duck")
    bucket = lsh_bucket_expr(n_planes, dim, "duck")
    return f"""
WITH {_kmeans_c1_ctes(k, dim)},
asg AS (
  SELECT v.vec_id, v.vec,
    (SELECT fc.cid FROM c1 fc
     ORDER BY coalesce(round({cos_final}, 6), -2.0) DESC, fc.cid LIMIT 1) AS cid
  FROM v
),
w AS (SELECT vec_id, cid, vec, sqrt({nsq}) AS nrm FROM asg),
sizes AS (SELECT cid, COUNT(*) AS bn FROM w GROUP BY cid),
big AS (
  SELECT w.cid, w.vec_id, w.vec, {bucket} AS bucket
  FROM w JOIN sizes s ON s.cid = w.cid AND s.bn > {cap}
),
pairs AS (
  SELECT a.cid, a.vec_id AS id_a, b.vec_id AS id_b
  FROM w a
  JOIN w b ON a.cid = b.cid AND a.vec_id < b.vec_id
  JOIN sizes s ON s.cid = a.cid AND s.bn <= {cap}
  UNION ALL
  SELECT DISTINCT x.cid, x.vec_id AS id_a, y.vec_id AS id_b
  FROM big x
  JOIN big y ON x.cid = y.cid AND x.bucket = y.bucket AND x.vec_id < y.vec_id
),
dups AS (
  SELECT DISTINCT p.id_b
  FROM pairs p
  JOIN w a ON a.vec_id = p.id_a
  JOIN w b ON b.vec_id = p.id_b
  WHERE ROUND({dot} / (a.nrm * b.nrm), 6) >= {threshold}
)
SELECT w.vec_id, w.cid, (d.id_b IS NULL) AS keep
FROM w LEFT JOIN dups d ON w.vec_id = d.id_b
ORDER BY w.vec_id
"""


@query("semantic_dedup", oracle=_semantic_dedup_oracle(8, 64, 0.3, 300))
def semantic_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) over the embedding corpus: trained
    k-means clustering IS the blocking, then any vector with cosine >=
    0.3 to a lower-id cluster-mate is marked ``keep = false`` (pairwise
    lowest-id-wins — the deterministic stand-in for the paper's
    one-representative-per-epsilon-ball choice).

    Scale (operators/similarity.semantic_dedup): centroids ride the
    driver, assignment is a map-side argmax (vectors never shuffle),
    clusters above 300 rows route through block-scoped sign-LSH instead
    of all-pairs, and pair verification joins vectors by id via
    shuffle-hash. The FAISS-style recipe: coarse-quantize once, dedup
    within cells — the exact shape this needs at 100 TB."""
    from dawis_spark.operators.similarity import semantic_dedup

    return semantic_dedup(
        spark.table("embeddings"),
        "vec_id",
        "embedding",
        k=8,
        threshold=0.3,
        max_block_rows=300,
        iterations=1,
    ).orderBy("vec_id")


def _filtered_topk_oracle(k: int, n_queries: int, label: int) -> str:
    cos = _VEC.cosine("q_vec", "c_vec", "duck")
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < {n_queries}),
c AS (SELECT vec_id AS neighbor_id, embedding AS c_vec FROM embeddings WHERE label = {label}),
scored AS (
  SELECT query_id, neighbor_id, ROUND({cos}, 6) AS cosine
  FROM q, c WHERE query_id != neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
ORDER BY query_id, rank
"""


@query("embedding_filtered_topk", oracle=_filtered_topk_oracle(5, 10, 3))
def embedding_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered ANN (the vector-DB "filtered search" shape):
    exact cosine top-k restricted to corpus rows with ``label = 3`` —
    pre-filter strategy, the right call when the predicate is selective.

    Scale: the equality predicate pushes to the parquet scan
    (PushedFilters), so only matching row-groups are ever read and the
    brute-force side shrinks by the filter's selectivity BEFORE any
    compute; queries broadcast as usual. When the filter keeps most of
    the corpus, switch to ivf_ann_topk over the filtered scan instead —
    same pushdown, probe-bounded compute."""
    from dawis_spark.operators.similarity import brute_force_topk

    emb = spark.table("embeddings")
    return brute_force_topk(
        corpus=emb.filter(F.col("label") == 3),
        queries=emb.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
    ).orderBy("query_id", "rank")


def _filtered_ivf_oracle(
    k: int, n_queries: int, kc: int, n_probe: int, dim: int, label: int
) -> str:
    """_ivf_trained_oracle composed over a filtered corpus: training,
    bucketing and search all read only ``label = {label}`` rows (the
    k-means chain's ``where`` parameter), while queries still come from
    the unfiltered table — mirroring ivf_ann_topk(corpus=filtered,
    queries=all)."""
    cos_vc = _VEC.cosine_null("vec", "cvec", "duck")
    cos_qc = _VEC.cosine("q_vec", "c_vec", "duck")
    return f"""
WITH {_kmeans_c1_ctes(kc, dim, where=f"label = {label}")},
allq AS (
  SELECT vec_id, embedding AS vec FROM embeddings WHERE vec_id < {n_queries}
),
corpus_aff AS (
  SELECT vec_id AS neighbor_id, vec, cid,
         coalesce(ROUND({cos_vc}, 6), -2.0) AS aff
  FROM v, (SELECT cid, cvec FROM c1) cent(cid, cvec)
),
corpus_b AS (
  SELECT neighbor_id, vec AS c_vec, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY neighbor_id ORDER BY aff DESC, cid) AS r
    FROM corpus_aff
  ) WHERE r <= 1
),
q_aff AS (
  SELECT vec_id AS query_id, vec, cid,
         coalesce(ROUND({cos_vc}, 6), -2.0) AS aff
  FROM allq, (SELECT cid, cvec FROM c1) cent(cid, cvec)
),
q_b AS (
  SELECT query_id, vec AS q_vec, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY aff DESC, cid) AS r
    FROM q_aff
  ) WHERE r <= {n_probe}
),
scored AS (
  SELECT DISTINCT query_id, neighbor_id, ROUND({cos_qc}, 6) AS cosine
  FROM q_b JOIN corpus_b USING (cid)
  WHERE query_id != neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
ORDER BY query_id, rank
"""


@query("embedding_filtered_ann_ivf", oracle=_filtered_ivf_oracle(5, 10, 8, 3, 64, 3))
def embedding_filtered_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed filtered ANN — the path embedding_filtered_topk's
    docstring points at for low-selectivity predicates: ivf_ann_topk over
    the filter-pushed scan. The quantizer trains on (and buckets only)
    the filtered corpus, so probe cost scales with the filtered size,
    and the ``label = 3`` equality predicate reaches the parquet scan
    (PushedFilters — plan-asserted in tests/test_plan_properties.py).

    Scale: pre-filter + IVF composes the two savings — row-group pruning
    shrinks the scan, probe-restriction shrinks the compute; the corpus
    never shuffles by vector either way. This is the vector-DB
    "filtered search" shape at its cheap end."""
    from dawis_spark.operators.similarity import ivf_ann_topk

    emb = spark.table("embeddings")
    return ivf_ann_topk(
        corpus=emb.filter(F.col("label") == 3),
        queries=emb.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        n_centroids=8,
        n_probe=3,
    ).orderBy("query_id", "rank")


def _ann_recall_filtered_ivf_oracle(k: int) -> str:
    exact = _filtered_topk_oracle(k, 10, 3).strip()
    approx = _filtered_ivf_oracle(k, 10, 8, 3, 64, 3).strip()
    return f"""
WITH exact_r AS (SELECT * FROM ({exact})),
approx_r AS (SELECT * FROM ({approx}))
SELECT e.query_id,
  CAST(COUNT(a.neighbor_id) AS BIGINT) AS hits,
  ROUND(CAST(COUNT(a.neighbor_id) AS DOUBLE) / {k}, 6) AS recall_at_k
FROM exact_r e
LEFT JOIN approx_r a
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id ORDER BY e.query_id
"""


@query("ann_recall_filtered_ivf", oracle=_ann_recall_filtered_ivf_oracle(5))
def ann_recall_filtered_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the composed filtered-IVF path against the exact
    filtered brute-force baseline, per query — proves the composition
    (pushed filter -> trained quantizer -> probe search) holds quality,
    not just shape. Both sides reuse the production operators and the
    same filtered corpus; the comparison join is top-k-sized."""
    from dawis_spark.operators.similarity import brute_force_topk, ivf_ann_topk

    emb = spark.table("embeddings")
    filtered = emb.filter(F.col("label") == 3)
    queries_df = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(
        corpus=filtered, queries=queries_df, id_col="vec_id",
        vec_col="embedding", k=5,
    ).select("query_id", "neighbor_id")
    approx = ivf_ann_topk(
        corpus=filtered, queries=queries_df, id_col="vec_id",
        vec_col="embedding", k=5, n_centroids=8, n_probe=3,
    ).select(
        F.col("query_id").alias("a_qid"), F.col("neighbor_id").alias("a_nid")
    )
    joined = exact.join(
        approx,
        (exact["query_id"] == approx["a_qid"])
        & (exact["neighbor_id"] == approx["a_nid"]),
        "left",
    )
    return (
        joined.groupBy("query_id")
        .agg(
            F.count("a_nid").cast("bigint").alias("hits"),
            F.round(F.count("a_nid").cast("double") / F.lit(5), 6).alias(
                "recall_at_k"
            ),
        )
        .orderBy("query_id")
    )


def _kmv_oracle(k: int) -> str:
    from dawis_spark.operators.sketches import kmv_oracle_sql

    return f"""
WITH {kmv_oracle_sql('events', ['event_type'], 'user_id', k).strip()},
exact AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT s.event_type, s.n_kept, s.kth_hash, s.estimate, e.exact_distinct,
  round(abs(s.estimate - e.exact_distinct) / e.exact_distinct, 6) AS rel_error
FROM kmv s JOIN exact e USING (event_type)
ORDER BY event_type
"""


@query("kmv_distinct_users", oracle=_kmv_oracle(64))
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch (k=64) per event type, scored against
    the exact count — bounded-state cardinality estimation, the 100 TB
    answer to COUNT(DISTINCT) (operators/sketches.py design notes: only
    k-bounded hash arrays cross the wire, vs every (key, user) pair for
    the exact form). Deterministic polynomial hashing makes the sketch
    bit-reproducible, so the oracle replays estimator arithmetic exactly
    and the rel_error column doubles as the accuracy self-eval."""
    from dawis_spark.operators.sketches import kmv_distinct

    ev = spark.table("events")
    sketch = kmv_distinct(ev, ["event_type"], "user_id", k=64)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return (
        sketch.join(exact, "event_type")
        .select(
            "event_type",
            "n_kept",
            "kth_hash",
            "estimate",
            "exact_distinct",
            F.round(
                F.abs(F.col("estimate") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                6,
            ).alias("rel_error"),
        )
        .orderBy("event_type")
    )


def _cm_oracle(top_n: int, d: int, w: int) -> str:
    from dawis_spark.operators.sketches import (
        _cm_bucket,
        _cm_coeffs,
        _kmv_round,
        _KMV_ROUNDS,
        cm_oracle_ctes,
    )

    toks = _TXT.tokens("text", "duck")
    h = _TXT.char_hash("cast(tok as varchar)", "duck")
    probe_chain = [f"probe_h0 AS (SELECT tok, {h} AS h FROM top)"]
    src = "probe_h0"
    for n, (a, b) in enumerate(_KMV_ROUNDS):
        probe_chain.append(
            f"probe_h{n + 1} AS (SELECT tok, {_kmv_round('h', a, b)} AS h FROM {src})"
        )
        src = f"probe_h{n + 1}"
    cells = " UNION ALL ".join(
        f"SELECT tok, {i} AS row, CAST({_cm_bucket('h', a, b, w)} AS INT) AS bucket FROM {src}"
        for i, (a, b) in enumerate(_cm_coeffs(d))
    )
    return f"""
WITH occ AS (
  SELECT unnest({toks}) AS tok FROM documents
),
{cm_oracle_ctes('occ', 'tok', d, w)},
exact AS (SELECT tok, COUNT(*) AS exact_count FROM occ GROUP BY tok),
top AS (
  SELECT tok, exact_count FROM (
    SELECT *, row_number() OVER (ORDER BY exact_count DESC, tok) AS rn FROM exact
  ) WHERE rn <= {top_n}
),
{", ".join(probe_chain)},
probe_cells AS ({cells}),
est AS (
  SELECT p.tok, MIN(COALESCE(cm.cnt, 0)) AS cm_estimate
  FROM probe_cells p LEFT JOIN cm USING (row, bucket)
  GROUP BY p.tok
)
SELECT t.tok AS token, t.exact_count, e.cm_estimate,
       e.cm_estimate - t.exact_count AS overestimate
FROM top t JOIN est e ON e.tok = t.tok
ORDER BY t.exact_count DESC, token
"""


@query("cm_heavy_hitters", oracle=_cm_oracle(20, 4, 512))
def cm_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min heavy hitters: token frequencies for the exact top-20
    tokens estimated from a 4x512 count-min sketch, with the realized
    overestimate per token (count-min never undercounts). The sketch is
    2048 cells regardless of vocabulary size — at 100 TB this replaces a
    vocabulary-cardinality shuffle with a fixed-size counter table
    (operators/sketches.py); the exact side here exists only to score
    the sketch, mirroring the ANN recall self-evals. The exact top-20
    is orderBy().limit() — TakeOrderedAndProject, per-partition top-k +
    driver merge — never a single-partition row_number window over the
    vocabulary-sized frequency relation (r10-verdict fix)."""
    from dawis_spark.operators.sketches import cm_estimate, cm_sketch

    toks = _TXT.tokens("text", "spark")
    occ = spark.table("documents").select(
        F.explode(F.expr(toks)).alias("tok")
    )
    # ONE tokenize pass (r15): exact top-20 and sketch both ride the
    # persisted vocabulary-bounded count relation (a token's d buckets
    # depend only on the token, so sum(count) == count of occurrences).
    exact = (
        occ.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_count")).persist()
    )
    top = (
        exact.orderBy(F.desc("exact_count"), F.asc("tok"))
        .limit(20)
        .select("tok", "exact_count")
    )
    sk = cm_sketch(exact, "tok", d=4, w=512, weight_col="exact_count")
    est = cm_estimate(sk, top.select("tok"), "tok", d=4, w=512)
    return (
        top.join(est, "tok")
        .select(
            F.col("tok").alias("token"),
            "exact_count",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("exact_count")).alias("overestimate"),
        )
        .orderBy(F.desc("exact_count"), "token")
    )


def _kmv_overlap_oracle(k: int, n_src: int) -> str:
    from dawis_spark.operators.sketches import _KMV_ROUNDS, _kmv_round

    sh = _TXT.shingle_hashes("text", 3, "duck")
    srcs = ", ".join(f"'src{i}'" for i in range(n_src))
    mix_ctes, src = "", "t"
    col = "s"
    for n, (a, b) in enumerate(_KMV_ROUNDS):
        mix_ctes += (
            f"mix{n} AS (SELECT source, {_kmv_round(col, a, b)} AS h FROM {src}),\n"
        )
        src, col = f"mix{n}", "h"
    return f"""
WITH t AS (
  SELECT DISTINCT source, unnest({sh}) AS s
  FROM documents WHERE source IN ({srcs})
),
{mix_ctes}sk AS (
  SELECT source, list_sort(list(DISTINCT h))[1:{k}] AS hs
  FROM {src} GROUP BY source
),
prs AS (
  SELECT a.source AS source_a, b.source AS source_b, a.hs AS hs_a, b.hs AS hs_b
  FROM sk a JOIN sk b ON a.source < b.source
),
mg AS (
  SELECT source_a, source_b, hs_a, hs_b,
         list_sort(list_distinct(list_concat(hs_a, hs_b)))[1:{k}] AS m
  FROM prs
),
ic AS (
  SELECT source_a, source_b, len(m) AS ke,
    len(list_filter(m, x -> list_contains(hs_a, x) AND list_contains(hs_b, x))) AS nc,
    m FROM mg
),
est AS (
  SELECT source_a, source_b,
    CASE WHEN ke >= {k} THEN round(CAST({k - 1} AS DOUBLE) * {_TXT.MOD} / m[{k}], 6)
         ELSE CAST(ke AS DOUBLE) END AS est_union,
    CAST(nc AS DOUBLE) / ke AS rho
  FROM ic
),
ex_inter AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS exact_intersection
  FROM t a JOIN t b ON a.s = b.s AND a.source < b.source
  GROUP BY 1, 2
),
sizes AS (SELECT source, COUNT(*) AS n FROM t GROUP BY source),
ex AS (
  SELECT sa.source AS source_a, sb.source AS source_b,
    COALESCE(i.exact_intersection, 0) AS exact_intersection,
    sa.n + sb.n - COALESCE(i.exact_intersection, 0) AS exact_union
  FROM sizes sa JOIN sizes sb ON sa.source < sb.source
  LEFT JOIN ex_inter i ON i.source_a = sa.source AND i.source_b = sb.source
)
SELECT ex.source_a, ex.source_b,
  est_union, round(rho * est_union, 6) AS est_intersection,
  round(rho, 6) AS est_jaccard,
  exact_union, exact_intersection,
  round(CAST(exact_intersection AS DOUBLE) / exact_union, 6) AS exact_jaccard
FROM est JOIN ex USING (source_a, source_b)
ORDER BY source_a, source_b
"""


@query("kmv_shingle_overlap", oracle=_kmv_overlap_oracle(128, 5))
def kmv_shingle_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-operation estimates — pairwise shingle-set union /
    intersection / Jaccard between sources from 128-element sketches,
    scored against the exact figures. The mergeable-sketch shape that
    makes cross-segment overlap tractable at 100 TB: per-segment
    synopses are k int64s, any pair (or union of segments) composes
    driver-free from the sketches alone, no re-scan of the corpora
    (Beyer et al. 2007; operators/sketches.py kmv_sets/kmv_set_ops).

    Accuracy shape, visible in the output: the union estimate is tight
    (±1/√k), while intersection/Jaccard variance scales like
    1/(J·k) — at J≈0.03 and k=128 only ~4 sketch elements witness the
    overlap, so est_intersection is an order-of-magnitude signal. That
    is the published estimator's behavior, not an implementation
    artifact; size k to the smallest Jaccard that must be resolved."""
    from dawis_spark.operators.sketches import kmv_set_ops, kmv_sets

    sh = _TXT.shingle_hashes("text", 3, "spark")
    srcs = [f"src{i}" for i in range(5)]
    # Persisted (r15): this distinct (source, shingle) relation feeds
    # FOUR consumers — the KMV sketch build, the exact per-source sizes,
    # and both legs of the exact-intersection self-join — each of which
    # re-ran the corpus shingle-hash pass + the distinct exchange.
    # Distinct-shingle-bounded rows, the postings-cache budget.
    t = (
        spark.table("documents")
        .filter(F.col("source").isin(srcs))
        .select("source", F.explode(F.expr(sh)).alias("s"))
        .distinct()
        .persist()
    )
    sk = kmv_sets(t, ["source"], "s", k=128, pre_hashed=True)
    pairs = sk.select(
        F.col("source").alias("source_a"), F.col("hs").alias("hs_a")
    ).join(
        sk.select(F.col("source").alias("source_b"), F.col("hs").alias("hs_b")),
        F.col("source_a") < F.col("source_b"),
    )
    est = kmv_set_ops(pairs, "hs_a", "hs_b", 128).select(
        "source_a", "source_b", "est_union", "est_intersection", "est_jaccard"
    )
    sizes = t.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    ex_inter = (
        t.select(F.col("source").alias("source_a"), "s")
        .join(t.select(F.col("source").alias("source_b"), "s"), "s")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    ex = (
        sizes.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
        .join(
            sizes.select(F.col("source").alias("source_b"), F.col("n").alias("nb")),
            F.col("source_a") < F.col("source_b"),
        )
        .join(ex_inter, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            F.coalesce("exact_intersection", F.lit(0)).alias("exact_intersection"),
            (F.col("na") + F.col("nb") - F.coalesce("exact_intersection", F.lit(0)))
            .alias("exact_union"),
        )
    )
    return (
        est.join(ex, ["source_a", "source_b"])
        .select(
            "source_a",
            "source_b",
            "est_union",
            "est_intersection",
            "est_jaccard",
            "exact_union",
            "exact_intersection",
            F.round(
                F.col("exact_intersection").cast("double") / F.col("exact_union"), 6
            ).alias("exact_jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


def _prefix_filter_oracle(shingle_k: int, t_num: int, t_den: int) -> str:
    sh = _TXT.shingle_hashes("text", shingle_k, "duck")
    jac = _TXT.jaccard("a.sh", "b.sh", "duck")
    plen = f"len(ks) - CAST(({t_num} * len(ks) + {t_den} - 1) // {t_den} AS INT) + 1"
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({sh}) AS h FROM documents
),
dft AS (SELECT h, COUNT(*) AS df_t FROM tok GROUP BY h),
keyed AS (
  SELECT doc_id, d.df_t * {_TXT.MOD} + t.h AS key
  FROM tok t JOIN dft d USING (h)
),
docs_k AS (SELECT doc_id, list_sort(list(key)) AS ks FROM keyed GROUP BY doc_id),
pref AS (
  SELECT doc_id, unnest(list_slice(ks, 1, {plen})) AS key FROM docs_k
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM pref a JOIN pref b USING (key) WHERE a.doc_id < b.doc_id
),
sh_t AS (SELECT doc_id, {sh} AS sh FROM documents)
SELECT id_a, id_b, ROUND({jac}, 6) AS jaccard
FROM cand
JOIN sh_t a ON id_a = a.doc_id
JOIN sh_t b ON id_b = b.doc_id
WHERE ROUND({jac}, 6) >= CAST({t_num} AS DOUBLE) / {t_den}
ORDER BY id_a, id_b
"""


@query("prefix_filter_similar", oracle=_prefix_filter_oracle(3, 3, 10))
def prefix_filter_similar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT similarity self-join via prefix filtering (operators/
    dedup.py prefix_filter_pairs — the AllPairs/SSJoin family): every
    document pair with 3-gram Jaccard ≥ 0.3, no LSH recall loss, no
    all-pairs.

    Scale: the completeness-preserving alternative to the MinHash-LSH
    route when recall must be exactly 1 — candidate volume is bounded
    by rare-first PREFIX postings (frequent tokens never generate
    candidates), the df-ordering needs no global sort (composite
    ``df*MOD + h`` key), and verification joins hash arrays by pair id
    via shuffle-hash. The LSH route stays the default for throughput;
    this is the audit-grade path."""
    from dawis_spark.operators.dedup import prefix_filter_pairs

    return prefix_filter_pairs(
        spark.table("documents"), "doc_id", "text",
        shingle_k=3, t_num=3, t_den=10,
    ).orderBy("id_a", "id_b")


def _matryoshka_oracle(k: int, n_queries: int, prefix_dim: int) -> str:
    exact = _embedding_topk_oracle(k, n_queries).strip()
    cos = _VEC.cosine("q_vec", "c_vec", "duck")
    approx = f"""
WITH q AS (SELECT vec_id AS query_id, embedding[1:{prefix_dim}] AS q_vec
           FROM embeddings WHERE vec_id < {n_queries}),
c AS (SELECT vec_id AS neighbor_id, embedding[1:{prefix_dim}] AS c_vec
      FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id, ROUND({cos}, 6) AS cosine
  FROM q, c WHERE query_id != neighbor_id
)
SELECT query_id, neighbor_id FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
""".strip()
    return f"""
WITH exact_r AS (SELECT * FROM ({exact})),
approx_r AS ({approx})
SELECT e.query_id,
  CAST(COUNT(a.neighbor_id) AS BIGINT) AS hits,
  ROUND(CAST(COUNT(a.neighbor_id) AS DOUBLE) / {k}, 6) AS recall_at_k
FROM exact_r e
LEFT JOIN approx_r a
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id ORDER BY e.query_id
"""


@query("ann_recall_matryoshka", oracle=_matryoshka_oracle(5, 10, 16))
def ann_recall_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of search over the 16-dim PREFIX of the embeddings
    against full 64-dim exact search — the Matryoshka-representation
    dial (Kusupati et al. 2022): when embeddings are trained
    prefix-nested, truncation is a 4x compute/storage cut with a
    measurable recall cost, and this query IS that measurement on the
    corpus at hand.

    Scale: dimension truncation composes with every other path in the
    family (IVF probing, PQ codes, SQ8 levels all shrink 4x with the
    prefix); the scan/score plan is brute_force_topk's — the truncation
    itself is a zero-cost projection inside the scan."""
    from dawis_spark.operators.similarity import brute_force_topk

    emb = spark.table("embeddings")
    trunc = emb.select(
        "vec_id", F.expr("slice(embedding, 1, 16)").alias("embedding")
    )
    exact = brute_force_topk(
        corpus=emb, queries=emb.filter(F.col("vec_id") < 10),
        id_col="vec_id", vec_col="embedding", k=5,
    ).select("query_id", "neighbor_id")
    approx = brute_force_topk(
        corpus=trunc, queries=trunc.filter(F.col("vec_id") < 10),
        id_col="vec_id", vec_col="embedding", k=5,
    ).select(
        F.col("query_id").alias("a_qid"), F.col("neighbor_id").alias("a_nid")
    )
    joined = exact.join(
        approx,
        (exact["query_id"] == approx["a_qid"])
        & (exact["neighbor_id"] == approx["a_nid"]),
        "left",
    )
    return (
        joined.groupBy("query_id")
        .agg(
            F.count("a_nid").cast("bigint").alias("hits"),
            F.round(F.count("a_nid").cast("double") / F.lit(5), 6).alias(
                "recall_at_k"
            ),
        )
        .orderBy("query_id")
    )


def _scd2_oracle() -> str:
    from dawis_spark.operators.scd import scd2_oracle_ctes

    return f"""
WITH cur AS (
  SELECT c_custkey, c_mktsegment,
         TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to,
         TRUE AS is_current
  FROM customer
  UNION ALL
  SELECT c_custkey, 'LEGACY', TIMESTAMP '2023-01-01 00:00:00',
         TIMESTAMP '2024-01-01 00:00:00', FALSE
  FROM customer WHERE c_custkey % 11 = 0
),
upd AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN 'MOVED' ELSE c_mktsegment END
           AS c_mktsegment
  FROM customer
  UNION ALL
  SELECT c_custkey + 1000000, 'FRESH' FROM customer WHERE c_custkey % 97 = 0
),
{scd2_oracle_ctes('cur', 'upd', ['c_custkey'], ['c_mktsegment'],
                  '2024-06-01 00:00:00')}
SELECT * FROM scd2 ORDER BY c_custkey, valid_from, is_current
"""


def _scd2_demo_next_state(spark: SparkSession) -> DataFrame:
    """The shared SCD2 demo load: customer dim with a LEGACY history
    slice, segment moves for custkey%7, new FRESH keys for custkey%97,
    applied at 2024-06-01 (used by scd2_dimension_load and the as-of
    read)."""
    from dawis_spark.operators.scd import scd2_apply

    cust = spark.table("customer")
    cur = (
        cust.select(
            "c_custkey",
            "c_mktsegment",
            F.expr("timestamp '2024-01-01 00:00:00'").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        .unionByName(
            cust.where(F.expr("c_custkey % 11 = 0")).select(
                "c_custkey",
                F.lit("LEGACY").alias("c_mktsegment"),
                F.expr("timestamp '2023-01-01 00:00:00'").alias("valid_from"),
                F.expr("timestamp '2024-01-01 00:00:00'").alias("valid_to"),
                F.lit(False).alias("is_current"),
            )
        )
    )
    upd = cust.select(
        "c_custkey",
        F.when(F.expr("c_custkey % 7 = 0"), F.lit("MOVED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    ).unionByName(
        cust.where(F.expr("c_custkey % 97 = 0")).select(
            (F.col("c_custkey") + 1000000).alias("c_custkey"),
            F.lit("FRESH").alias("c_mktsegment"),
        )
    )
    return scd2_apply(
        cur, upd, ["c_custkey"], ["c_mktsegment"], "2024-06-01 00:00:00"
    )


@query("scd2_dimension_load", oracle=_scd2_oracle())
def scd2_dimension_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension maintenance (operators/scd.py): one load
    closes changed open rows at the batch timestamp, inserts new
    versions and brand-new keys, and passes unchanged/closed history
    through untouched — the warehouse MERGE shape, as a pure state-in/
    state-out transform the oracle replays CTE-for-CTE.

    Scale: one key-equi-join of the OPEN slice against the update batch
    (dimension keys unique on both sides — no skew surface), closed
    history never moves; bucketing the dimension by key co-locates every
    load's join (module design notes)."""
    return _scd2_demo_next_state(spark).orderBy(
        "c_custkey", "valid_from", "is_current"
    )


def _scd2_asof_oracle() -> str:
    base = _scd2_oracle().strip().rsplit("SELECT * FROM scd2", 1)[0]
    return f"""{base}
SELECT 'past' AS asof_label, c_custkey, c_mktsegment FROM scd2
WHERE valid_from <= TIMESTAMP '2023-06-01 00:00:00'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2023-06-01 00:00:00')
UNION ALL
SELECT 'present', c_custkey, c_mktsegment FROM scd2
WHERE valid_from <= TIMESTAMP '2024-06-02 00:00:00'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-06-02 00:00:00')
ORDER BY asof_label, c_custkey
"""


@query("scd2_asof_read", oracle=_scd2_asof_oracle())
def scd2_asof_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel reads of the SCD2 dimension (operators/scd.scd2_asof):
    the same maintained history answered at two instants — during the
    LEGACY era (2023-06-01: only the pre-migration versions exist) and
    after the 2024-06-01 load (every key's newest version, including the
    FRESH inserts). The query-side payoff of type-2 history: facts join
    "as of" their event time with a map-side validity filter, no
    snapshot copies.

    Scale: the filter is map-side over the dimension; on the bucketed
    load layout an as-of fact join stays co-located."""
    from dawis_spark.operators.scd import scd2_asof

    dim = _scd2_demo_next_state(spark)
    past = scd2_asof(dim, "2023-06-01 00:00:00").select(
        F.lit("past").alias("asof_label"), "c_custkey", "c_mktsegment"
    )
    present = scd2_asof(dim, "2024-06-02 00:00:00").select(
        F.lit("present").alias("asof_label"), "c_custkey", "c_mktsegment"
    )
    return past.unionAll(present).orderBy("asof_label", "c_custkey")


def _mixture_sample_oracle(alpha: float, budget: int) -> str:
    from dawis_spark.operators.sketches import _mixed_sql

    h = _TXT.char_hash("cast(doc_id as varchar)", "duck")
    return f"""
WITH per AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS mass,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
),
z AS (
  SELECT list_reduce(
           list_prepend(CAST(0 AS DOUBLE), list_sort(list(pow(mass, {alpha})))),
           (s, v) -> s + v) AS z
  FROM per
),
rates AS (
  SELECT source, n_docs,
         CAST(floor(ROUND(pow(mass, {alpha}) / z.z, 6) * {budget} + 0.5) AS BIGINT)
           AS budget_docs,
         least(1000000,
               (CAST(floor(ROUND(pow(mass, {alpha}) / z.z, 6) * {budget} + 0.5) AS BIGINT)
                * 1000000) // n_docs) AS rate_ppm
  FROM per, z
),
samp AS (
  SELECT d.source FROM documents d JOIN rates r ON d.source = r.source
  WHERE ({_mixed_sql(h, 'duck')}) % 1000000 < r.rate_ppm
)
SELECT r.source, r.n_docs, r.budget_docs, r.rate_ppm,
       CAST(COALESCE(s.n, 0) AS BIGINT) AS sampled_docs,
       CAST(COALESCE(s.n, 0) * 1000000 AS BIGINT) // r.n_docs AS realized_ppm
FROM rates r
LEFT JOIN (SELECT source, COUNT(*) AS n FROM samp GROUP BY source) s
  ON r.source = s.source
ORDER BY r.source
"""


@query("mixture_sampled_corpus", oracle=_mixture_sample_oracle(0.5, 200))
def mixture_sampled_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized data mixture: temperature weights (alpha = 0.5,
    200-doc budget) turned into per-source deterministic sampling rates
    and an actual sampled corpus (operators/corpus.py mixture_sample),
    with realized-vs-target rates as the self-eval.

    Scale: the rates relation is domain-count-sized (broadcast); the
    membership predicate evaluates inside the document scan. The
    hash-defined draw makes the mixture refresh-stable — appending new
    raw data never resamples previously-kept documents, so downstream
    packed shards stay valid incrementally (design notes on
    mixture_sample)."""
    from dawis_spark.operators.corpus import mixture_sample, mixture_weights

    docs = spark.table("documents")
    w = mixture_weights(docs, "source", "n_chars", alpha=0.5, total_budget=200)
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    rates = (
        w.join(counts, "source")
        .select(
            "source",
            "n_docs",
            "budget_docs",
            F.least(
                F.lit(1000000),
                F.expr("(budget_docs * 1000000) div n_docs"),
            ).alias("rate_ppm"),
        )
    )
    samp = mixture_sample(docs, "source", "doc_id", rates.select("source", "rate_ppm"))
    sampled = samp.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    return (
        rates.join(sampled, "source", "left")
        .select(
            "source",
            "n_docs",
            "budget_docs",
            "rate_ppm",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("sampled_docs"),
            F.expr("(coalesce(n, 0) * 1000000) div n_docs")
            .cast("bigint")
            .alias("realized_ppm"),
        )
        .orderBy("source")
    )


def _coordinated_sample_oracle(rate_ppm: int) -> str:
    from dawis_spark.operators.sketches import int_hash_sample_pred

    scale = 1_000_000 / rate_ppm
    o_pred = int_hash_sample_pred("o_orderkey", rate_ppm, "duck")
    l_pred = int_hash_sample_pred("l_orderkey", rate_ppm, "duck")
    return f"""
WITH o_samp AS (SELECT * FROM orders WHERE {o_pred}),
l_samp AS (SELECT * FROM lineitem WHERE {l_pred}),
est AS (
  SELECT l_returnflag,
         COUNT(*) AS sample_rows,
         ROUND(SUM(l_extendedprice * (1 - l_discount)) * {scale}, 2) AS est_revenue
  FROM l_samp JOIN o_samp ON l_orderkey = o_orderkey
  GROUP BY l_returnflag
),
exact AS (
  SELECT l_returnflag,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS exact_revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_returnflag
)
SELECT e.l_returnflag, sample_rows, est_revenue, exact_revenue,
       ROUND(abs(est_revenue - exact_revenue) / exact_revenue, 6) AS rel_error
FROM est e JOIN exact x ON e.l_returnflag = x.l_returnflag
ORDER BY e.l_returnflag
"""


@query("coordinated_sample_join", oracle=_coordinated_sample_oracle(50000))
def coordinated_sample_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-query-processing join over COORDINATED hash samples
    (Join Synopses, Acharya et al. 1999): both orders and lineitem are
    sampled by the SAME deterministic hash of the order key, so the join
    of the samples IS a 5% sample of the join — two independent 5%
    samples would intersect on only 0.25% of the join and estimate
    nothing. Revenue scales by 1/rate; rel_error is the self-eval.

    Scale: both sample predicates evaluate inside their scans; the join
    and aggregation touch 5% of each input — the standard 20-400x
    speedup dial for exploratory aggregates over a 100 TB fact join,
    with the hash-coordination (unlike rand()) keeping it correct and
    reproducible. Deterministic membership is also what lets the oracle
    replay the exact sample."""
    from dawis_spark.operators.sketches import int_hash_sample_pred

    rate_ppm = 50000
    scale = 1_000_000 / rate_ppm
    o = spark.table("orders").where(
        F.expr(int_hash_sample_pred("o_orderkey", rate_ppm, "spark"))
    )
    li = spark.table("lineitem").where(
        F.expr(int_hash_sample_pred("l_orderkey", rate_ppm, "spark"))
    )
    est = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("sample_rows"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                * F.lit(scale),
                2,
            ).alias("est_revenue"),
        )
    )
    exact = (
        spark.table("lineitem")
        .join(spark.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("exact_revenue")
        )
    )
    return (
        est.join(exact, "l_returnflag")
        .withColumn(
            "rel_error",
            F.round(
                F.abs(F.col("est_revenue") - F.col("exact_revenue"))
                / F.col("exact_revenue"),
                6,
            ),
        )
        .orderBy("l_returnflag")
    )


def _classifier_oracle(n_features: int) -> str:
    from dawis_spark.operators.classifier import classifier_oracle_ctes

    return f"""
WITH {classifier_oracle_ctes('documents', 'doc_id', 'text', n_features)}
SELECT doc_id, n_tokens, score, mean_w, label
FROM clf ORDER BY doc_id
"""


@query("quality_classifier_scores", oracle=_classifier_oracle(4096))
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear classifier inference over the corpus
    (operators/classifier.py) — the fasttext-shaped quality-filter pass
    of an LLM data pipeline, with a deterministic stand-in weight
    vector (a trained artifact drops into the same plan).

    Scale: the model is ONE broadcast row; scoring is a codegen'd fold
    inside the document scan — zero shuffle, zero UDF, vs the
    token-explode + weights-join plan whose shuffle exceeds the corpus
    size at 100 TB (module design notes)."""
    from dawis_spark.operators.classifier import classify, pseudo_weights

    # presentation sort runs BELOW the scoring fold (narrow scan columns
    # only): a trailing orderBy made the range exchange sample the whole
    # scoring chain, evaluating it twice per pass (r16; the
    # psi_metric_extraction pattern — order-preserving map stack above
    # an ordered exchange, rows and order identical)
    docs = spark.table("documents").orderBy("doc_id")
    w = pseudo_weights(spark, 4096)
    return classify(docs, "doc_id", "text", w, n_features=4096).select(
        "doc_id", "n_tokens", "score", "mean_w", "label"
    )


def _sampled_quantiles_oracle(rate_ppm: int, pcts: list[int]) -> str:
    from dawis_spark.operators.sketches import int_hash_sample_pred, rank_quantile_ctes

    pred = int_hash_sample_pred(
        "l_orderkey * 8 + l_linenumber", rate_ppm, "duck"
    )
    return f"""
WITH samp AS (
  SELECT l_returnflag, l_extendedprice FROM lineitem WHERE {pred}
),
{rank_quantile_ctes('samp', ['l_returnflag'], 'l_extendedprice', pcts, 'sq')}
SELECT l_returnflag, pct, n AS sample_n, value AS est_value
FROM sq ORDER BY l_returnflag, pct
"""


def _quantiles_error_oracle(rate_ppm: int, pcts: list[int]) -> str:
    from dawis_spark.operators.sketches import int_hash_sample_pred, rank_quantile_ctes

    pred = int_hash_sample_pred(
        "l_orderkey * 8 + l_linenumber", rate_ppm, "duck"
    )
    return f"""
WITH samp AS (
  SELECT l_returnflag, l_extendedprice FROM lineitem WHERE {pred}
),
{rank_quantile_ctes('samp', ['l_returnflag'], 'l_extendedprice', pcts, 'sq')},
{rank_quantile_ctes('lineitem', ['l_returnflag'], 'l_extendedprice', pcts, 'xq')}
SELECT s.l_returnflag, s.pct,
       s.n AS sample_n, s.value AS est_value, x.value AS exact_value,
       round(abs(s.value - x.value) / x.value, 6) AS rel_error
FROM sq s JOIN xq x ON s.l_returnflag = x.l_returnflag AND s.pct = x.pct
ORDER BY s.l_returnflag, s.pct
"""


@query("sampled_quantiles", oracle=_sampled_quantiles_oracle(50000, [50, 90, 99]))
def sampled_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a deterministic 5% hash sample
    (operators/sketches.py rank_quantiles design notes) — the
    estimate-only operator; its accuracy self-eval lives in
    quantiles_error_eval so the bench prices the operator, not its
    exact baseline (split per VERDICT r7 ask #5).

    Scale: an exact per-group quantile sorts the FULL group — at 100 TB
    that is the dominant shuffle+sort of any summary pipeline. The
    hash-sample predicate evaluates inside the scan — the INTEGER-key
    uniformizer (int_hash_sample_pred), pure codegen arithmetic where
    the string form pays an interpreted per-character fold (measured
    2.5 s -> ~0.15 s on the 600k-row scan) — so the sort sees 5% of the rows for a rank error of
    O(1/√(0.05·n)); membership is a pure function of the row id, making
    the estimate reproducible across runs, partitionings, and engines
    (the oracle replays the exact sample), and coordinated across
    tables — the join-synopses property rand()-sampling lacks."""
    from dawis_spark.operators.sketches import int_hash_sample_pred, rank_quantiles

    li = spark.table("lineitem")
    pred = int_hash_sample_pred("l_orderkey * 8 + l_linenumber", 50000, "spark")
    samp = li.where(F.expr(pred))
    est = rank_quantiles(samp, ["l_returnflag"], "l_extendedprice", [50, 90, 99])
    return (
        est.select(
            "l_returnflag",
            "pct",
            F.col("n").alias("sample_n"),
            F.col("value").alias("est_value"),
        ).orderBy("l_returnflag", "pct")
    )


@query("quantiles_error_eval", oracle=_quantiles_error_oracle(50000, [50, 90, 99]))
def quantiles_error_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy self-eval for sampled_quantiles: the 5% hash-sample
    estimate joined against the exact nearest-rank quantiles, with the
    realized relative error per (group, pct).

    The exact side uses distributed SELECTION, not the per-group window
    sort: with 3 groups the window form's parallelism is 3 at any data
    size; selection shuffles bucket COUNTS and sorts only the chosen
    buckets (operators/sketches.py rank_quantiles_select; values
    identical by construction, so the window-form oracle SQL still
    replays this side exactly)."""
    from dawis_spark.operators.sketches import (
        int_hash_sample_pred,
        rank_quantiles,
        rank_quantiles_select,
    )

    li = spark.table("lineitem")
    pred = int_hash_sample_pred("l_orderkey * 8 + l_linenumber", 50000, "spark")
    samp = li.where(F.expr(pred))
    est = rank_quantiles(samp, ["l_returnflag"], "l_extendedprice", [50, 90, 99])
    exact = rank_quantiles_select(
        li, ["l_returnflag"], "l_extendedprice", [50, 90, 99]
    )
    return (
        est.select(
            "l_returnflag",
            "pct",
            F.col("n").alias("sample_n"),
            F.col("value").alias("est_value"),
        )
        .join(
            exact.select(
                "l_returnflag", "pct", F.col("value").alias("exact_value")
            ),
            ["l_returnflag", "pct"],
        )
        .withColumn(
            "rel_error",
            F.round(
                F.abs(F.col("est_value") - F.col("exact_value"))
                / F.col("exact_value"),
                6,
            ),
        )
        .orderBy("l_returnflag", "pct")
    )


def _textrank_oracle(iterations: int, top_n: int) -> str:
    from dawis_spark.operators.graph import pagerank_oracle_ctes

    toks = _TXT.tokens("text", "duck")
    return f"""
WITH tok AS (
  SELECT doc_id, tok, p FROM (
    SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS p
    FROM (SELECT doc_id, {toks} AS ts FROM documents))
  WHERE length(tok) >= 4),
adj AS (
  SELECT DISTINCT a.tok AS src, b.tok AS dst
  FROM tok a JOIN tok b
    ON a.doc_id = b.doc_id AND b.p - a.p BETWEEN 1 AND 2
   AND a.tok <> b.tok),
edges AS (
  SELECT src, dst FROM adj UNION SELECT dst, src FROM adj),
{pagerank_oracle_ctes('edges', iterations)}
SELECT node AS token, rank_scaled,
       round(CAST(rank_scaled AS DOUBLE) / 1e12, 6) AS rank
FROM pr
ORDER BY rank_scaled DESC, token
LIMIT {top_n}
"""


@query("textrank_keywords", oracle=_textrank_oracle(3, 20))
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction: PageRank (3 fixed iterations, exact
    scaled-int64) over the corpus-level token co-occurrence graph —
    content tokens (length >= 4) adjacent within a 2-token window,
    symmetrized and deduplicated. The graph-centrality member of the
    keyword family: rake_keyphrases scores phrases by degree/frequency
    inside stopword-delimited chunks, lexrank_top_sentences ranks
    SENTENCES — TextRank ranks TOKENS by global graph importance,
    which surfaces terms that bridge many contexts even at moderate
    frequency.

    Exactness: edge construction is exact (positions from ordinality);
    the rank trajectory is the shared integer-division PageRank
    (operators/graph.py), replayed bit-for-bit by the oracle chain;
    top-20 with (rank, token) tie order.

    Scale: the position self-join shuffles on doc_id (positional pairs
    are corpus-linear with a x2 window constant); the DISTINCT
    collapses to the vocab-x-vocab adjacency, so the three rank
    iterations join vocab-bounded relations — the pagerank_top_nodes
    posture with tokens for nodes."""
    from dawis_spark.operators.graph import pagerank

    toks = _TXT.tokens("text", "spark")
    # persisted: both sides of the positional self-join read the
    # content-token relation (tokenize ran twice per pass without it)
    tok = (
        spark.table("documents")
        .select("doc_id", F.posexplode(F.expr(toks)).alias("p", "tok"))
        .filter(F.length("tok") >= 4)
        .persist()
    )
    a = tok.selectExpr("doc_id", "p AS pa", "tok AS src")
    b = tok.selectExpr("doc_id", "p AS pb", "tok AS dst")
    adj = (
        a.join(b, "doc_id")
        .filter(F.expr("pb - pa BETWEEN 1 AND 2 AND src <> dst"))
        .select("src", "dst")
        .distinct()
    )
    # symmetrize with one explode instead of a 2-leg union (the union
    # evaluated the adjacency join + distinct twice) — identical rows
    edges = (
        adj.select(
            F.explode(
                F.array(
                    F.struct(F.col("src"), F.col("dst")),
                    F.struct(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .persist()
    )
    return (
        pagerank(edges, iterations=3)
        .selectExpr(
            "node AS token",
            "rank_scaled",
            "round(CAST(rank_scaled AS DOUBLE) / 1e12, 6) AS rank",
        )
        .orderBy(F.desc("rank_scaled"), "token")
        .limit(20)
    )


_PPMI_V = 48  # vocabulary: the 48 most frequent content tokens
_PPMI_ITERS = 8
_PPMI_SCALE = 1_000_000


def _ppmi_iter_sql(prev: str, t: int) -> str:
    """One scaled-integer power-iteration round over the PPMI cell
    relation: u_i = sum_j P_ij * v_j (exact), then renormalize to
    SCALE by the max component (integer division — the PageRank
    scaled-int discipline)."""
    return f"""
u{t} AS MATERIALIZED (
  SELECT m.i, CAST(SUM(m.p6 * v.v) AS HUGEINT) AS u
  FROM cells m JOIN {prev} v ON v.i = m.j GROUP BY 1),
v{t} AS MATERIALIZED (
  SELECT i, CAST(u * {_PPMI_SCALE} // (SELECT MAX(u) FROM u{t}) AS BIGINT) AS v
  FROM u{t})"""


def _ppmi_oracle() -> str:
    toks = _TXT.tokens("text", "duck")
    iters = ",".join(
        _ppmi_iter_sql(f"v{t - 1}" if t > 1 else "v0", t)
        for t in range(1, _PPMI_ITERS + 1)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, tok, p FROM (
    SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS p
    FROM (SELECT doc_id, {toks} AS ts FROM documents))
  WHERE length(tok) >= 4),
vocab AS (
  SELECT tok, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS INT) AS i
  FROM (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY 1)
  ORDER BY cnt DESC, tok LIMIT {_PPMI_V}),
pos AS (
  SELECT t.doc_id, t.p, v.i FROM tok t JOIN vocab v USING (tok)),
pairs AS (
  SELECT a.i AS i, b.i AS j, CAST(COUNT(*) AS BIGINT) AS n_ij
  FROM pos a JOIN pos b
    ON a.doc_id = b.doc_id AND abs(a.p - b.p) BETWEEN 1 AND 2
  GROUP BY 1, 2),
marg AS (SELECT i, CAST(SUM(n_ij) AS BIGINT) AS n_i FROM pairs GROUP BY 1),
tot AS (SELECT CAST(SUM(n_ij) AS BIGINT) AS nn FROM pairs),
cells AS MATERIALIZED (
  SELECT p.i, p.j,
         GREATEST(CAST(ROUND(ln(CAST(p.n_ij AS DOUBLE) * t.nn
                   / (CAST(ma.n_i AS DOUBLE) * mb.n_i)) * 1000000)
                  AS BIGINT), 0) AS p6
  FROM pairs p
  JOIN marg ma ON ma.i = p.i
  JOIN marg mb ON mb.i = p.j
  CROSS JOIN tot t),
v0 AS MATERIALIZED (SELECT i, CAST({_PPMI_SCALE} AS BIGINT) AS v FROM vocab),
{iters}
SELECT CAST(ROW_NUMBER() OVER (ORDER BY f.v DESC, vb.tok) AS INT) AS rank,
       vb.tok AS token,
       ROUND(CAST(f.v AS DOUBLE) / {_PPMI_SCALE}, 6) AS loading
FROM v{_PPMI_ITERS} f JOIN vocab vb USING (i)
ORDER BY f.v DESC, vb.tok LIMIT 16
"""


@query("ppmi_top_axis", oracle=_ppmi_oracle())
def ppmi_top_axis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant axis of the PPMI word-association matrix (the
    count-based precursor of word embeddings — PPMI factorization is
    what word2vec implicitly performs): 48-token vocabulary by corpus
    frequency, co-occurrence within a +/-2 window, positive PMI cells
    micro-scaled to exact integers, and 8 scaled-integer power-
    iteration rounds (renormalized by the max component with integer
    division — the PageRank discipline) yielding the top-16 tokens by
    loading on the principal association axis: the corpus's dominant
    topic direction, from counts alone.

    Exactness: counts and marginals exact; each PPMI cell pays one ln
    over an identical double chain then rounds to micro units; the
    whole iteration trajectory is exact integer arithmetic, so ranks
    and loadings are bit-identical across engines.

    Scale: one positional pair shuffle (corpus-linear, x2 window
    constant) collapsing to a <= 48x48 cell relation; the iteration
    runs on a BOUNDED COLLECT of those cells (<= 2304 rows — the
    grid_dbscan documented-bound class) in exact Python ints."""
    toks = _TXT.tokens("text", "spark")
    tok = (
        spark.table("documents")
        .select("doc_id", F.posexplode(F.expr(toks)).alias("p", "tok"))
        .filter(F.length("tok") >= 4)
    )
    from pyspark.sql import Window as _W

    vocab = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), "tok")
        .limit(_PPMI_V)
        .select(
            "tok",
            F.row_number()
            .over(_W.orderBy(F.desc("cnt"), "tok"))
            .cast("int")
            .alias("i"),
        )
    )
    pos = tok.join(F.broadcast(vocab), "tok").select("doc_id", "p", "i")
    a = pos.selectExpr("doc_id", "p AS pa", "i AS ia")
    b = pos.selectExpr("doc_id", "p AS pb", "i AS jb")
    pairs = (
        a.join(b, "doc_id")
        .filter(F.expr("abs(pa - pb) BETWEEN 1 AND 2"))
        .groupBy(F.col("ia").alias("i"), F.col("jb").alias("j"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ij"))
    )
    marg = pairs.groupBy("i").agg(F.sum("n_ij").cast("bigint").alias("n_i"))
    tot = pairs.agg(F.sum("n_ij").cast("bigint").alias("nn"))
    cells = (
        pairs.join(F.broadcast(marg), "i")
        .join(
            F.broadcast(marg.selectExpr("i AS j", "n_i AS n_j")), "j"
        )
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "i",
            "j",
            "GREATEST(CAST(ROUND(ln(CAST(n_ij AS DOUBLE) * nn"
            " / (CAST(n_i AS DOUBLE) * n_j)) * 1000000) AS BIGINT), 0)"
            " AS p6",
        )
    )
    # bounded collect: <= 48x48 PPMI cells + the 48-row vocab
    cell_rows = [(r["i"], r["j"], r["p6"]) for r in cells.collect()]
    vocab_rows = [(r["i"], r["tok"]) for r in vocab.collect()]
    idx = sorted({i for i, _ in vocab_rows})
    v = {i: _PPMI_SCALE for i in idx}
    by_i: dict[int, list] = {}
    for i, j, p6 in cell_rows:
        by_i.setdefault(i, []).append((j, p6))
    for _ in range(_PPMI_ITERS):
        u = {
            i: sum(p6 * v.get(j, 0) for j, p6 in by_i.get(i, []))
            for i in idx
        }
        mx = max(u.values()) if u else 0
        if mx == 0:
            break
        v = {i: (u[i] * _PPMI_SCALE) // mx for i in idx}
    tok_of = dict(vocab_rows)
    ranked = sorted(
        ((v.get(i, 0), tok_of[i]) for i in idx),
        key=lambda t: (-t[0], t[1]),
    )[:16]
    rows = [
        (rank, token, round(val / _PPMI_SCALE, 6))
        for rank, (val, token) in enumerate(ranked, start=1)
    ]
    return spark.createDataFrame(
        rows, "rank int, token string, loading double"
    ).orderBy("rank")


def _pagerank_oracle(iterations: int, top_n: int) -> str:
    from dawis_spark.operators.graph import pagerank_oracle_ctes

    return f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
),
{pagerank_oracle_ctes('edges', iterations)}
SELECT node, rank_scaled,
       round(CAST(rank_scaled AS DOUBLE) / 1e12, 6) AS rank
FROM pr
ORDER BY rank_scaled DESC, node
LIMIT {top_n}
"""


@query("pagerank_top_nodes", oracle=_pagerank_oracle(3, 20))
def pagerank_top_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (operators/graph.py) over the
    symmetrized customer↔supplier trade graph — the iterative-algorithm
    shape (Pregel-style message passing as unrolled DataFrame joins)
    the relational inventory otherwise lacks.

    Scale: per iteration one edges⋈ranks shuffle join plus one
    groupBy(dst) — edge-count-bound, with node-count-bound side tables;
    the edge relation is persisted because every iteration re-reads it
    (on a cluster it would also be bucketed by src so the iteration
    joins co-locate). Exact scaled-int64 arithmetic makes the result
    independent of partitioning and summation order — the property that
    lets DuckDB replay all three iterations bit-for-bit.

    Node ids are int64 (even = customer 2k, odd = supplier 2k+1), not
    'c123'-style strings: the id column rides every iteration's shuffle
    twice, and an 8-byte fixed key hashes/compares in codegen where a
    variable-length UTF8 key drags the whole join path — measured ~1.4x
    on the 10x rehearsal for identical results."""
    from dawis_spark.operators.graph import pagerank

    pairs = (
        spark.table("lineitem")
        .join(
            spark.table("orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    # symmetrize with one explode (r15): the 2-leg union evaluated the
    # lineitem-orders distinct-pair join twice at materialization
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("c").alias("src"), F.col("s").alias("dst")),
                    F.struct(F.col("s").alias("src"), F.col("c").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .persist()
    )
    return (
        pagerank(edges, iterations=3)
        .select(
            "node",
            "rank_scaled",
            F.round(F.col("rank_scaled").cast("double") / 1e12, 6).alias("rank"),
        )
        .orderBy(F.desc("rank_scaled"), F.asc("node"))
        .limit(20)
    )


def _sq8_ann_oracle(k: int, n_queries: int, dim: int) -> str:
    from dawis_spark.operators.similarity import sq8_oracle_ctes

    cos = _VEC.cosine("q_vec", "c_vec", "duck")
    return f"""
WITH {sq8_oracle_ctes('embeddings', 'vec_id', 'embedding', dim)},
q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < {n_queries}),
scored AS (
  SELECT query_id, neighbor_id, ROUND({cos}, 6) AS cosine
  FROM q, sq8_recon WHERE query_id != neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
ORDER BY query_id, rank
"""


@query("embedding_ann_sq8", oracle=_sq8_ann_oracle(5, 10, 64))
def embedding_ann_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized (SQ8) search — FAISS IndexScalarQuantizer shape:
    per-dimension [lo, hi] levels, one byte per component, asymmetric
    reconstruct-and-score against the raw query
    (operators/similarity.py sq8_* design notes).

    Scale: the stored/scanned form is 4x smaller than float32 vectors —
    at 100 TB that is the difference between an embedding index that
    fits hot storage and one that doesn't — while the search plan stays
    the exact-scan shape: stats broadcast as one row, encode and scoring
    codegen'd inside the corpus scan, only (id, score) pairs shuffle for
    top-k. SQ8 slots between brute force (no compression) and PQ (64x,
    lossier) in the quantization family."""
    from dawis_spark.operators.similarity import sq8_encode, sq8_stats, sq8_topk

    emb = spark.table("embeddings")
    # Persisted (r15): the 1-row stats relation feeds BOTH the encode
    # and the reconstruction broadcast; unpersisted, each consumer
    # re-ran the full-corpus min/max aggregate.
    stats = sq8_stats(emb, "embedding", dim=64).persist()
    codes = sq8_encode(emb, "vec_id", "embedding", stats, dim=64)
    return sq8_topk(
        codes,
        stats,
        emb.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        dim=64,
    ).orderBy("query_id", "rank")


def _ann_recall_sq8_oracle(k: int) -> str:
    exact = _embedding_topk_oracle(k, 10).strip()
    approx = _sq8_ann_oracle(k, 10, 64).strip()
    return f"""
WITH exact_r AS (SELECT * FROM ({exact})),
approx_r AS (SELECT * FROM ({approx}))
SELECT e.query_id,
  CAST(COUNT(a.neighbor_id) AS BIGINT) AS hits,
  ROUND(CAST(COUNT(a.neighbor_id) AS DOUBLE) / {k}, 6) AS recall_at_k
FROM exact_r e
LEFT JOIN approx_r a
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id ORDER BY e.query_id
"""


@query("ann_recall_sq8", oracle=_ann_recall_sq8_oracle(5))
def ann_recall_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the SQ8 asymmetric scan against exact brute force —
    the quantization family's accuracy dial (expected ≈ 1.0 at 8 bits
    per dimension; drops appear only when [lo, hi] is stretched by
    outlier dimensions). Completes the self-eval set: LSH, multiprobe,
    IVF, PQ, IVFPQ, IVFADC, filtered-IVF, SQ8."""
    from dawis_spark.operators.similarity import (
        brute_force_topk,
        sq8_encode,
        sq8_stats,
        sq8_topk,
    )

    emb = spark.table("embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(
        corpus=emb, queries=queries_df, id_col="vec_id",
        vec_col="embedding", k=5,
    ).select("query_id", "neighbor_id")
    stats = sq8_stats(emb, "embedding", dim=64).persist()
    codes = sq8_encode(emb, "vec_id", "embedding", stats, dim=64)
    approx = sq8_topk(
        codes, stats, queries_df, id_col="vec_id", vec_col="embedding",
        k=5, dim=64,
    ).select(
        F.col("query_id").alias("a_qid"), F.col("neighbor_id").alias("a_nid")
    )
    joined = exact.join(
        approx,
        (exact["query_id"] == approx["a_qid"])
        & (exact["neighbor_id"] == approx["a_nid"]),
        "left",
    )
    return (
        joined.groupBy("query_id")
        .agg(
            F.count("a_nid").cast("bigint").alias("hits"),
            F.round(F.count("a_nid").cast("double") / F.lit(5), 6).alias(
                "recall_at_k"
            ),
        )
        .orderBy("query_id")
    )


def _bloom_oracle(m: int, d: int) -> str:
    from dawis_spark.operators.bloomjoin import bloom_oracle_ctes, bloom_probe_pred

    return f"""
WITH dim_keys AS (
  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_9'
),
{bloom_oracle_ctes('dim_keys', 's_suppkey', m, d)},
probe AS (
  SELECT l_returnflag,
         {bloom_probe_pred('l_suppkey', m, d)} AS pass,
         l_suppkey IN (SELECT s_suppkey FROM dim_keys) AS is_match
  FROM lineitem CROSS JOIN bloom
),
agg AS (
  SELECT l_returnflag,
         COUNT(*) AS n_rows,
         CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
         CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_bloom
  FROM probe GROUP BY l_returnflag
)
SELECT l_returnflag, n_rows, n_exact, n_pass_bloom,
       CAST(n_pass_bloom - n_exact AS BIGINT) AS n_false_pos,
       round(CAST(n_pass_bloom - n_exact AS DOUBLE)
             / greatest(n_rows - n_exact, 1), 6) AS fp_rate
FROM agg ORDER BY l_returnflag
"""


@query("bloom_semi_join", oracle=_bloom_oracle(128, 2))
def bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter runtime join pruning (operators/bloomjoin.py): build
    the filter from the NATION_9 supplier keys, reject non-matching
    lineitem rows map-side BEFORE any exchange, and score the realized
    false-positive rate against the exact semi join.

    Scale: this is the explicit form of Spark's runtime bloom filter /
    DPP — at 100 TB the selective-dim semi join shuffles only the
    matching fraction plus the deterministic FP residue instead of the
    full fact table. The filter is a sorted position array (≤ m ints)
    broadcast once; the probe is codegen'd array search inside the scan
    stage. m here is measurement-sized (128 bits for ~10 keys) so the
    self-eval exhibits a nonzero FP rate at sf0.01; deployments size
    m ≈ 10-16 bits per expected distinct key (FPR ≈ (1-e^(-dn/m))^d).
    """
    from dawis_spark.operators.bloomjoin import _positions_sql, bloom_build

    m, d = 128, 2
    keys = (
        spark.table("supplier")
        .join(
            spark.table("nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .where(F.col("n_name") == "NATION_9")
        .select("s_suppkey")
    )
    bloom = bloom_build(keys, "s_suppkey", m=m, d=d)
    li = spark.table("lineitem")
    # ONE fact scan (r15): totals, the exact semi-join count and the
    # bloom pass count were three separate lineitem scans + aggregates
    # stitched by two joins; the exact membership rides a broadcast
    # left join marker (keys are distinct by construction) and both
    # counts fold as conditional sums in the same flag aggregate —
    # identical bigints.
    #
    # Decide with small rows (guide §8): the O(len) polynomial hash fold
    # is evaluated once per SUPPLIER key (the probe key's dimension
    # domain) instead of once per fact row, and the fact row reads its
    # pass flag off the broadcast (suppkey, in_keys, passes) relation —
    # at 100 TB that is dim-cardinality hash work instead of fact-
    # cardinality. A fact key missing from the domain (no FK in the
    # data) still evaluates the original per-row expression via the
    # lazily-branched coalesce, so the aggregate is identical bigints
    # for ANY input.
    kd = (
        keys.distinct()
        .withColumnRenamed("s_suppkey", "l_suppkey")
        .withColumn("__k", F.lit(1))
    )
    dom = (
        spark.table("supplier")
        .select(F.col("s_suppkey").alias("l_suppkey"))
        .join(kd, "l_suppkey", "left")
        .crossJoin(F.broadcast(bloom))
        .withColumn("__pos", F.expr(_positions_sql("l_suppkey", m, d, "spark")))
        .select(
            "l_suppkey",
            "__k",
            F.expr("forall(__pos, p -> array_contains(bloom, p))").alias("__p"),
        )
    )
    return (
        li.select("l_returnflag", "l_suppkey")
        .join(F.broadcast(dom), "l_suppkey", "left")
        .crossJoin(F.broadcast(bloom))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("__k") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_exact"),
            F.sum(
                F.when(
                    F.coalesce(
                        F.col("__p"),
                        F.expr(
                            "forall("
                            + _positions_sql("l_suppkey", m, d, "spark")
                            + ", p -> array_contains(bloom, p))"
                        ),
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_pass_bloom"),
        )
        .withColumn("n_false_pos", F.col("n_pass_bloom") - F.col("n_exact"))
        .withColumn(
            "fp_rate",
            F.round(
                F.col("n_false_pos").cast("double")
                / F.greatest(F.col("n_rows") - F.col("n_exact"), F.lit(1)),
                6,
            ),
        )
        .orderBy("l_returnflag")
    )


def _ivfpq_refine_oracle(
    k: int, rf: int, n_queries: int, n_cent: int, n_probe: int, n_sub: int,
    ds: int, ks: int, dim: int,
) -> str:
    """Refined-IVFPQ replay: the full IVFPQ oracle (trained coarse
    quantizer + PQ train/encode/ADC) retains k*rf candidates, then the
    candidate pairs re-score with exact cosine over the raw vectors and
    the true top-k survives — the same two stages the Spark operator
    composes."""
    inner = _ivfpq_oracle(k * rf, n_queries, n_cent, n_probe, n_sub, ds, ks, dim).strip()
    cos = _VEC.cosine("q.vec", "n.vec", "duck")
    return f"""
WITH cand AS (SELECT query_id, neighbor_id FROM ({inner})),
ev AS (SELECT vec_id, embedding AS vec FROM embeddings),
rer AS (
  SELECT c.query_id, c.neighbor_id, ROUND({cos}, 6) AS cosine
  FROM cand c
  JOIN ev q ON q.vec_id = c.query_id
  JOIN ev n ON n.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM rer
) WHERE rank <= {k}
ORDER BY query_id, rank
"""


@query("embedding_ann_refined", oracle=_ivfpq_refine_oracle(5, 3, 10, 16, 4, 4, 16, 16, 64))
def embedding_ann_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFPQ retrieval + exact re-ranking (FAISS ``IndexRefineFlat``
    shape, operators/similarity.ivfpq_refine_topk): stage 1 scans PQ
    codes in 4 probed buckets and keeps top-15 per query by ADC score;
    stage 2 re-scores ONLY those 15 pairs exactly and keeps the true
    top-5. The production recipe for compressed-index search with
    near-exact quality: ADC ordering mistakes inside the pool are
    corrected for free, and quantization error costs recall only when a
    true neighbor misses the pool entirely.

    Scale: the candidate set is queries x pool-sized, so the refine pass
    broadcasts it into one more corpus (id, vec) scan — no exchange
    carries a raw vector; at 100 TB the refine overhead is a map-side
    hash probe per corpus row. Oracle replays both stages in one SQL."""
    from dawis_spark.operators.similarity import ivfpq_refine_topk, pq_train

    emb = spark.table("embeddings")
    books = pq_train(emb, "vec_id", "embedding", n_subspaces=4, n_codes=16)
    return ivfpq_refine_topk(
        corpus=emb,
        queries=emb.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        refine_factor=3,
        n_centroids=16,
        n_probe=4,
        books=books,
    ).orderBy("query_id", "rank")


def _ann_recall_refined_oracle(k: int) -> str:
    exact = _embedding_topk_oracle(k, 10).strip()
    raw = _ivfpq_oracle(k, 10, 16, 4, 4, 16, 16, 64).strip()
    refined = _ivfpq_refine_oracle(k, 3, 10, 16, 4, 4, 16, 16, 64).strip()
    return f"""
WITH exact_r AS (SELECT * FROM ({exact})),
raw_r AS (SELECT * FROM ({raw})),
ref_r AS (SELECT * FROM ({refined}))
SELECT e.query_id,
  ROUND(CAST(COUNT(r1.neighbor_id) AS DOUBLE) / {k}, 6) AS recall_ivfpq,
  ROUND(CAST(COUNT(r2.neighbor_id) AS DOUBLE) / {k}, 6) AS recall_refined
FROM exact_r e
LEFT JOIN raw_r r1
  ON e.query_id = r1.query_id AND e.neighbor_id = r1.neighbor_id
LEFT JOIN ref_r r2
  ON e.query_id = r2.query_id AND e.neighbor_id = r2.neighbor_id
GROUP BY e.query_id ORDER BY e.query_id
"""


@query("ann_recall_refined", oracle=_ann_recall_refined_oracle(5))
def ann_recall_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of raw IVFPQ vs refined IVFPQ against exact brute force,
    per query — the self-eval that justifies the refine stage's extra
    corpus scan (refined recall must dominate raw: the refine pool is a
    superset of the raw top-k, re-ranked exactly). One shared quantizer
    training feeds all approximate sides; the comparison joins are
    top-k-sized."""
    from dawis_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_ann_topk,
        pq_train,
        refine_exact,
        train_kmeans,
    )

    emb = spark.table("embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    books = pq_train(emb, "vec_id", "embedding", n_subspaces=4, n_codes=16)
    cents = train_kmeans(emb, "vec_id", "embedding", k=16, iterations=1)
    # persisted (r15): the exact ground truth feeds both recall joins —
    # its corpus×queries scoring pass sits under a broadcast nested loop
    # (no exchange for ReuseExchange to dedupe). queries×k rows.
    exact = (
        brute_force_topk(
            corpus=emb, queries=qs, id_col="vec_id", vec_col="embedding", k=5
        )
        .select("query_id", "neighbor_id")
        .persist()
    )
    # ONE ADC candidate pool serves both branches (r15): the raw IVFPQ
    # top-5 is by definition ranks 1..5 of the k*refine_factor pool the
    # refine stage starts from (same deterministic (desc cosine, asc id)
    # ordering), so computing ivfpq_ann_topk TWICE — once at k=5, once at
    # k=15 inside ivfpq_refine_topk — duplicated the whole corpus
    # encode+ADC-score+window pipeline (plan: 8 embeddings scans, zero
    # ReusedExchange). Persisted: queries×15 rows.
    pool = ivfpq_ann_topk(
        emb, qs, "vec_id", "embedding", k=5 * 3, n_centroids=16, n_probe=4,
        books=books, centroids=cents,
    ).persist()
    raw = pool.filter(F.col("rank") <= 5).select(
        F.col("query_id").alias("r1_qid"), F.col("neighbor_id").alias("r1_nid")
    )
    ref = refine_exact(
        pool, emb, qs, "vec_id", "embedding", k=5
    ).select(F.col("query_id").alias("r2_qid"), F.col("neighbor_id").alias("r2_nid"))
    joined = (
        exact.join(
            raw,
            (exact["query_id"] == raw["r1_qid"])
            & (exact["neighbor_id"] == raw["r1_nid"]),
            "left",
        ).join(
            ref,
            (F.col("query_id") == F.col("r2_qid"))
            & (F.col("neighbor_id") == F.col("r2_nid")),
            "left",
        )
    )
    return (
        joined.groupBy("query_id")
        .agg(
            F.round(F.count("r1_nid").cast("double") / 5, 6).alias("recall_ivfpq"),
            F.round(F.count("r2_nid").cast("double") / 5, 6).alias("recall_refined"),
        )
        .orderBy("query_id")
    )


_ANOMALY_MAD_ORACLE = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
med AS (SELECT event_type, median(cnt) AS med FROM daily GROUP BY 1),
dev AS (
  SELECT d.event_type, d.day, d.cnt, d.cnt - m.med AS delta,
         ABS(d.cnt - m.med) AS adev
  FROM daily d JOIN med m USING (event_type)
),
mad AS (SELECT event_type, median(adev) AS mad FROM dev GROUP BY 1),
scored AS (
  SELECT dv.event_type, dv.day, dv.cnt,
         ROUND(dv.delta / NULLIF(1.4826 * md.mad, 0), 6) AS robust_z
  FROM dev dv JOIN mad md USING (event_type)
)
SELECT event_type, day, cnt, robust_z,
       COALESCE(ABS(robust_z) > 3.0, FALSE) AS is_anomaly
FROM scored
ORDER BY event_type, day
"""


@query("anomaly_mad_daily", oracle=_ANOMALY_MAD_ORACLE)
def anomaly_mad_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection over daily event volumes
    (operators/anomaly.robust_zscores): per event type, score each day's
    count by its median/MAD z-score and flag |z| > 3 — the statistical
    escalation of the reference's fixed-threshold checks (SURVEY §2.5
    A5/A6) for series where thresholds can't be hand-set.

    Scale: the raw stream aggregates to (series, day) FIRST, so the
    holistic medians run over time-bounded groups (#days) while the
    series count scales freely; all three aggregations and both joins
    share the series key — one exchange footprint under AQE. At 100 TB
    of events this plan touches the fact table exactly once."""
    from dawis_spark.operators.anomaly import robust_zscores

    daily = (
        spark.table("events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        robust_zscores(daily, ["event_type"], "cnt", z_threshold=3.0)
        .select("event_type", "day", "cnt", "robust_z", "is_anomaly")
        .orderBy("event_type", "day")
    )


_GAPFILL_ORACLE = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day, ROUND(SUM(value), 2) AS total
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT user_id, MIN(day) AS b0, MAX(day) AS b1 FROM daily GROUP BY 1),
spine AS (
  SELECT user_id, UNNEST(generate_series(b0, b1, INTERVAL 1 DAY)) AS day
  FROM bounds
),
j AS (
  SELECT s.user_id, s.day, d.total
  FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
)
SELECT user_id, day, total,
  last_value(total IGNORE NULLS) OVER (
    PARTITION BY user_id ORDER BY day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
  total IS NULL AS is_gap
FROM j ORDER BY user_id, day
"""


@query("gapfill_daily_user_value", oracle=_GAPFILL_ORACLE)
def gapfill_daily_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily value series with gap filling
    (operators/gapfill.gapfill_locf): generate each user's own date
    spine over [first, last] active day, left-join the observed daily
    totals, carry the last observation forward, and flag generated rows
    — the TimescaleDB ``time_bucket_gapfill + locf`` shape that makes
    downstream period joins and anomaly scoring see one row per
    (series, day).

    Scale: the spine explodes per key from a bounded per-key range (no
    global calendar cross join); bounds agg, spine join, and the LOCF
    window all share the user key. At 100 TB the fact table is read
    once into the daily rollup and everything after is rollup-sized."""
    from dawis_spark.operators.gapfill import gapfill_locf

    daily = (
        spark.table("events")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    return (
        gapfill_locf(daily, ["user_id"], "day", "total", step="1 day")
        .select("user_id", "day", "total", "filled", "is_gap")
        .orderBy("user_id", "day")
    )


def _dup_spans_oracle(k: int) -> str:
    th = _TXT.token_hash_array("text", "duck")
    whs = _TXT.window_hash_structs("h", k, "duck")
    return f"""
WITH th AS (SELECT doc_id, {th} AS h FROM documents),
w0 AS (SELECT doc_id, unnest({whs}) AS u FROM th),
w AS (SELECT doc_id, u.pos AS pos, u.wh AS wh FROM w0),
freq AS (SELECT wh FROM w GROUP BY wh HAVING COUNT(*) >= 2),
dup AS (SELECT doc_id, pos FROM w WHERE wh IN (SELECT wh FROM freq)),
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM dup
)
SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + {k} AS span_end,
       COUNT(*) AS n_windows
FROM isl GROUP BY doc_id, grp
ORDER BY doc_id, span_start
"""


@query("duplicated_spans", oracle=_dup_spans_oracle(8))
def duplicated_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring spans (operators/dedup.duplicated_spans;
    Lee et al. 2021 suffix-array dedup re-expressed distributed): every
    maximal token span whose 8-token windows all repeat somewhere in the
    corpus — the span-level complement to document-level MinHash dedup
    (boilerplate, license headers, copied passages inside otherwise
    unique docs).

    Scale: bodies reduce to (doc, pos, 8-byte hash) in the scan; the
    frequency count and semi join shuffle hashes only; the island merge
    windows per doc. At 100 TB this is the only known shuffle-friendly
    form — a suffix array would need a global sort of every suffix."""
    from dawis_spark.operators.dedup import duplicated_spans

    return (
        duplicated_spans(
            spark.table("documents"), "doc_id", "text", window_k=8
        )
        .select("doc_id", "span_start", "span_end", "n_windows")
        .orderBy("doc_id", "span_start")
    )


def _dsir_oracle(m: int) -> str:
    from dawis_spark.operators.dsir import feature_buckets_expr

    feats = feature_buckets_expr("text", m, "duck")
    return f"""
WITH tgt AS (SELECT {feats} AS f FROM documents WHERE source = 'src0'),
raw AS (SELECT doc_id, {feats} AS f FROM documents WHERE source != 'src0'),
ctc AS (SELECT b, COUNT(*) AS c FROM (SELECT unnest(f) AS b FROM tgt) GROUP BY b),
crc AS (SELECT b, COUNT(*) AS c FROM (SELECT unnest(f) AS b FROM raw) GROUP BY b),
tots AS (SELECT (SELECT COALESCE(SUM(c), 0) FROM ctc) AS t_tot,
                (SELECT COALESCE(SUM(c), 0) FROM crc) AS r_tot),
lam AS (
  SELECT gs.b AS b,
         ROUND(ln((COALESCE(tc.c, 0) + 1.0) / (t.t_tot + {m}))
             - ln((COALESCE(rc.c, 0) + 1.0) / (t.r_tot + {m})), 6) AS lam
  FROM range(0, {m}) gs(b)
  LEFT JOIN ctc tc ON tc.b = gs.b
  LEFT JOIN crc rc ON rc.b = gs.b
  CROSS JOIN tots t
),
lamv AS (SELECT list(lam ORDER BY b) AS lv FROM lam)
SELECT doc_id, len(f) AS n_feats,
       ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(f, b -> lv[b + 1])), (s, v) -> s + v), 6) AS log_ir
FROM raw, lamv
ORDER BY doc_id
"""


@query("dsir_importance_weights", oracle=_dsir_oracle(1024))
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (operators/dsir.py; Xie et al. 2023): score
    every raw document by its log importance ratio under hashed
    unigram+bigram bag models of the target slice (source src0) vs the
    raw corpus — the principled replacement for a hand-tuned quality
    threshold when "quality" means "looks like this target set".

    Scale: model estimation is two m-bounded bucket-count aggregations
    (partial agg keeps the exchange at m rows per task); the fused
    log-ratio vector is ONE driver-side literal array and scoring is a
    codegen'd fold inside the raw scan — the classifier plan, zero
    shuffle. Oracle replays estimation AND scoring in one SQL."""
    from dawis_spark.operators.dsir import dsir_scores, dsir_train, doc_features

    docs = spark.table("documents")
    # ONE tokenize+hash pass (r15): target counts, raw counts and raw
    # scoring each re-evaluated the feature expression end-to-end (the
    # raw corpus paid it twice). The persisted per-doc bucket arrays
    # feed all three consumers; identical values by construction.
    feats = doc_features(docs, ["doc_id", "source"], "text", m=1024).persist()
    tgt_f = feats.filter(F.col("source") == "src0")
    raw_f = feats.filter(F.col("source") != "src0")
    raw = docs.filter(F.col("source") != "src0")
    lam = dsir_train(
        None, None, "text", m=1024, target_features=tgt_f, raw_features=raw_f
    )
    return dsir_scores(
        raw, "doc_id", "text", lam, m=1024, features=raw_f
    ).orderBy("doc_id")


def _phrase_oracle(phrase: str) -> str:
    from dawis_spark.operators.corpus import phrase_term_hashes

    hs = phrase_term_hashes(phrase)
    th = _TXT.token_hash_array("text", "duck")
    vals = ", ".join(f"({i}, {h})" for i, h in enumerate(hs))
    return f"""
WITH th AS (SELECT doc_id, {th} AS h FROM documents),
post AS (
  SELECT doc_id,
         unnest(range(0, len(h))) AS pos,
         unnest(list_transform(range(0, len(h)), i -> h[i + 1])) AS term
  FROM th
),
ph(i, term) AS (VALUES {vals}),
cand AS (
  SELECT p.doc_id, p.pos - ph.i AS base, ph.i
  FROM post p JOIN ph ON p.term = ph.term
),
hits AS (
  SELECT doc_id, base FROM cand
  GROUP BY doc_id, base HAVING COUNT(DISTINCT i) = {len(hs)}
)
SELECT doc_id, COUNT(*) AS n_matches, MIN(base) AS first_pos
FROM hits GROUP BY doc_id ORDER BY doc_id
"""


@query("phrase_search", oracle=_phrase_oracle("slow hash batch"))
def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search over a positional inverted index
    (operators/corpus.build_postings + phrase_query): documents
    containing the token phrase "slow hash batch", with occurrence count
    and first offset — the positional-intersection complement to
    bm25_search's bag-of-words ranking.

    Scale: the index is built once (the one token-sized shuffle, then
    persisted bucketed by term in production) and the query touches only
    the 3 probed terms' postings — the phrase relation broadcasts, and
    everything on the wire is (hash, id, position) ints."""
    from dawis_spark.operators.corpus import (
        build_postings,
        phrase_query,
        phrase_term_hashes,
    )

    postings = build_postings(spark.table("documents"), "doc_id", "text")
    return phrase_query(
        postings, "doc_id", phrase_term_hashes("slow hash batch")
    ).orderBy("doc_id")


def _pmi_oracle(min_count: int, k: int) -> str:
    toks = _TXT.tokens("text", "duck")
    return f"""
WITH tk AS (SELECT {toks} AS w FROM documents),
uni AS (SELECT unnest(w) AS t FROM tk),
unic AS (SELECT t, COUNT(*) AS c FROM uni GROUP BY t),
bi AS (
  SELECT w[i] AS t1, w[i + 1] AS t2
  FROM tk, unnest(range(1, greatest(len(w) - 1, 0) + 1)) AS u(i)
),
bic AS (SELECT t1, t2, COUNT(*) AS c12 FROM bi GROUP BY t1, t2),
tot AS (SELECT (SELECT COUNT(*) FROM uni) AS n, (SELECT COUNT(*) FROM bi) AS b)
SELECT t1 || ' ' || t2 AS bigram, c12,
       ROUND(ln((c12 * 1.0 / t.b) / ((u1.c * 1.0 / t.n) * (u2.c * 1.0 / t.n))), 6) AS pmi
FROM bic
JOIN unic u1 ON bic.t1 = u1.t
JOIN unic u2 ON bic.t2 = u2.t
CROSS JOIN tot t
WHERE c12 >= {min_count}
ORDER BY pmi DESC, bigram LIMIT {k}
"""


@query("pmi_collocations", oracle=_pmi_oracle(5, 50))
def pmi_collocations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 collocations by pointwise mutual information
    (operators/corpus.pmi_collocations; Church & Hanks 1990 — the
    word2vec phrase-pass statistic): adjacent token pairs that co-occur
    far above chance, with the classic min-count cutoff against rare-
    pair noise.

    Scale: unigram/bigram counting partially aggregates map-side
    (vocabulary-sized exchanges); scoring joins vocabulary-sized count
    relations; the two scalar totals broadcast. The final top-k is a
    TakeOrdered, not a global sort."""
    from dawis_spark.operators.corpus import pmi_collocations

    return (
        pmi_collocations(spark.table("documents"), "text", min_count=5)
        .orderBy(F.desc("pmi"), "bigram")
        .limit(50)
    )


_DQ_ORACLE = """
WITH v1 AS (SELECT o_orderkey FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
v2 AS (SELECT l_orderkey FROM lineitem l
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
v3 AS (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1),
v4 AS (SELECT 1 AS x FROM customer WHERE c_custkey IS NULL),
v5 AS (SELECT 1 AS x FROM orders
       WHERE o_orderstatus NOT IN ('O', 'F', 'P') OR o_orderstatus IS NULL),
v6 AS (SELECT 1 AS x FROM lineitem WHERE l_quantity <= 0 OR l_extendedprice < 0)
SELECT 'orders_custkey_fk' AS check_name, (SELECT COUNT(*) FROM v1) AS n_violations,
       (SELECT COUNT(*) FROM v1) = 0 AS passed
UNION ALL SELECT 'lineitem_orderkey_fk', (SELECT COUNT(*) FROM v2),
       (SELECT COUNT(*) FROM v2) = 0
UNION ALL SELECT 'orders_pk_unique', (SELECT COUNT(*) FROM v3),
       (SELECT COUNT(*) FROM v3) = 0
UNION ALL SELECT 'customer_custkey_not_null', (SELECT COUNT(*) FROM v4),
       (SELECT COUNT(*) FROM v4) = 0
UNION ALL SELECT 'orders_status_domain', (SELECT COUNT(*) FROM v5),
       (SELECT COUNT(*) FROM v5) = 0
UNION ALL SELECT 'lineitem_positive_amounts', (SELECT COUNT(*) FROM v6),
       (SELECT COUNT(*) FROM v6) = 0
ORDER BY check_name
"""


@query("dq_integrity_checks", oracle=_DQ_ORACLE)
def dq_integrity_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse data-quality suite (operators/checks.dq_suite — the
    dbt-tests shape): FK integrity orders->customer and
    lineitem->orders, PK uniqueness, not-null, accepted-values domain,
    and range invariants, reduced to one (check_name, n_violations, passed)
    row each and unioned into a single alertable relation.

    Scale: every check is an independent count over a pruned scan —
    anti joins for FKs (null-safe, broadcastable dims), map-side
    predicate counts for the rest; the union carries six rows. This is
    what a 100 TB nightly QA gate looks like: no violation ROWS move
    unless someone asks for them."""
    from dawis_spark.operators.checks import dq_suite

    orders = spark.table("orders")
    customer = spark.table("customer")
    lineitem = spark.table("lineitem")
    checks = [
        (
            "orders_custkey_fk",
            orders.join(
                customer.select(F.col("c_custkey").alias("o_custkey")),
                "o_custkey",
                "left_anti",
            ),
        ),
        (
            "lineitem_orderkey_fk",
            lineitem.join(
                orders.select(F.col("o_orderkey").alias("l_orderkey")),
                "l_orderkey",
                "left_anti",
            ),
        ),
        (
            "orders_pk_unique",
            orders.groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1),
        ),
        ("customer_custkey_not_null", customer.filter(F.col("c_custkey").isNull())),
        (
            "orders_status_domain",
            orders.filter(
                ~F.col("o_orderstatus").isin("O", "F", "P")
                | F.col("o_orderstatus").isNull()
            ),
        ),
        (
            "lineitem_positive_amounts",
            lineitem.filter(
                (F.col("l_quantity") <= 0) | (F.col("l_extendedprice") < 0)
            ),
        ),
    ]
    return dq_suite(checks).orderBy("check_name")


def _js_oracle() -> str:
    toks = _TXT.tokens("text", "duck")
    return f"""
WITH tk AS (SELECT source AS src, unnest({toks}) AS t FROM documents),
cnt AS (SELECT src, t, COUNT(*) AS c FROM tk GROUP BY src, t),
tot AS (SELECT src, SUM(c) AS n FROM cnt GROUP BY src),
p AS (SELECT cnt.src, t, cnt.c * 1.0 / tot.n AS p FROM cnt JOIN tot ON cnt.src = tot.src),
sh AS (
  SELECT a.src AS src_a, b.src AS src_b,
         SUM(a.p * ln(2.0 * a.p / (a.p + b.p))
           + b.p * ln(2.0 * b.p / (a.p + b.p))) AS sh_term,
         SUM(a.p) AS ma, SUM(b.p) AS mb
  FROM p a JOIN p b ON a.t = b.t AND a.src < b.src
  GROUP BY a.src, b.src
)
SELECT src_a, src_b,
       ROUND(0.5 * sh_term + 0.5 * ln(2.0) * ((1.0 - ma) + (1.0 - mb)), 6) AS js_div
FROM sh ORDER BY src_a, src_b
"""


@query("source_js_divergence", oracle=_js_oracle())
def source_js_divergence_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between source unigram
    distributions (operators/corpus.source_js_divergence) — the
    source-similarity matrix read next to source_mixture_weights when
    designing a training mixture.

    Scale: one corpus-scan counting aggregation, then everything is
    vocabulary-sized; the one-sided-token masses fold into shared-mass
    sums so no full-outer (pair x token) relation ever materializes."""
    from dawis_spark.operators.corpus import source_js_divergence

    return source_js_divergence(
        spark.table("documents"), "source", "text"
    ).orderBy("src_a", "src_b")


def _entropy_oracle() -> str:
    s = _TS.sorted_tokens_sql("text", "duck")
    st = _TS.run_starts_sql("s", "duck")
    ent = _TS.entropy_from_runs_sql("st", "len(s)", "duck")
    return f"""
WITH srt AS (SELECT doc_id, {s} AS s FROM documents),
runs AS (SELECT doc_id, s, {st} AS st FROM srt)
SELECT doc_id,
       len(s) AS n_tokens,
       len(st) AS n_distinct,
       ROUND({ent}, 6) AS entropy,
       ROUND(({ent}) / NULLIF(ln(len(st)), 0.0), 6) AS norm_entropy
FROM runs ORDER BY doc_id
"""


@query("token_entropy", oracle=_entropy_oracle())
def token_entropy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the unigram distribution
    (operators/textstats.token_entropy) — the distribution-wide
    complement to the Gopher top-token repetition signals; low entropy
    at normal length flags keyword-stuffed or template documents.

    Scale: entirely map-side (sorted-run lengths inside the scan — no
    token ever crosses an exchange, unlike the explode+groupBy
    formulation whose shuffle is corpus-sized)."""
    from dawis_spark.operators.textstats import token_entropy

    # sort below the entropy fold (the psi_metric_extraction pattern)
    return token_entropy(
        spark.table("documents").orderBy("doc_id"), "doc_id", "text"
    )


def _cohesion_oracle(k: int, dim: int) -> str:
    cos_final = _VEC.cosine_null("v.vec", "fc.cvec", "duck")
    cos_own = _VEC.cosine_null("a.vec", "c.cvec", "duck")
    return f"""
WITH {_kmeans_c1_ctes(k, dim)},
asg AS (
  SELECT v.vec_id, v.vec,
    (SELECT fc.cid FROM c1 fc
     ORDER BY coalesce(round({cos_final}, 6), -2.0) DESC, fc.cid LIMIT 1) AS cid
  FROM v
),
sc AS (
  SELECT a.cid, coalesce(round({cos_own}, 6), -2.0) AS cosa
  FROM asg a JOIN c1 c ON c.cid = a.cid
)
SELECT cid, COUNT(*) AS n, ROUND(AVG(cosa), 6) AS mean_cos,
       ROUND(SUM(1.0 - cosa), 6) AS cohesion
FROM sc GROUP BY cid ORDER BY cid
"""


@query("kmeans_cohesion", oracle=_cohesion_oracle(8, 64))
def kmeans_cohesion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster cohesion self-eval of the trained k=8 quantizer
    (operators/similarity.kmeans_cohesion): size, mean cosine to own
    centroid, and sum(1 - cos) — the metric that tunes k/iterations for
    the IVF family and semantic_dedup the way ann_recall_* tunes
    n_probe. One map-side pass, k-row output; vectors never shuffle."""
    from dawis_spark.operators.similarity import kmeans_cohesion, train_kmeans

    emb = spark.table("embeddings")
    cents = train_kmeans(emb, "vec_id", "embedding", k=8, iterations=1)
    return kmeans_cohesion(emb, "vec_id", "embedding", cents).orderBy("cid")


_TREND_ORACLE = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', TIMESTAMP '2024-01-01', date_trunc('day', ts)) AS x,
         COUNT(*) AS y
  FROM events GROUP BY 1, 2
),
agg AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM daily GROUP BY event_type
)
SELECT event_type, n AS n_points,
  ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
        / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0.0), 6) AS slope,
  ROUND((CAST(sy AS DOUBLE)
         - (CAST(n * sxy - sx * sy AS DOUBLE)
            / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0.0)) * sx) / n, 6)
    AS intercept,
  ROUND(CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
        / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0.0)
        / NULLIF(CAST(n * syy - sy * sy AS DOUBLE), 0.0), 6) AS r2
FROM agg ORDER BY event_type
"""


@query("trend_slopes", oracle=_TREND_ORACLE)
def trend_slopes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series OLS trend over daily event volumes
    (operators/anomaly.trend_slopes): slope, intercept, and r² of count
    vs day index from the five sufficient statistics — the drift
    detector next to anomaly_mad_daily's jump detector. Integer
    sufficient statistics make the aggregation bit-deterministic; one
    partially-aggregated pass, one row per series."""
    from dawis_spark.operators.anomaly import trend_slopes

    daily = (
        spark.table("events")
        .groupBy(
            "event_type",
            F.datediff(F.date_trunc("day", "ts"), F.lit("2024-01-01")).alias("x"),
        )
        .agg(F.count(F.lit(1)).alias("y"))
    )
    return (
        trend_slopes(daily, ["event_type"], "x", "y")
        .orderBy("event_type")
    )


_SEASONAL_ORACLE = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', TIMESTAMP '2024-01-01', date_trunc('day', ts)) AS bucket,
         COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, bucket, cnt,
         cnt - lag(cnt, 7) OVER (PARTITION BY event_type ORDER BY bucket)
           AS residual
  FROM daily
),
med AS (SELECT event_type, median(residual) AS med FROM r
        WHERE residual IS NOT NULL GROUP BY 1),
dev AS (
  SELECT r.event_type, bucket, cnt, residual,
         residual - m.med AS delta, ABS(residual - m.med) AS adev
  FROM r JOIN med m USING (event_type) WHERE residual IS NOT NULL
),
mad AS (SELECT event_type, median(adev) AS mad FROM dev GROUP BY 1),
sc AS (
  SELECT d.event_type, bucket, cnt, residual,
         ROUND(d.delta / NULLIF(1.4826 * m.mad, 0), 6) AS robust_z
  FROM dev d JOIN mad m USING (event_type)
)
SELECT event_type, bucket, cnt, residual, robust_z,
       COALESCE(ABS(robust_z) > 3.0, FALSE) AS is_anomaly
FROM sc
UNION ALL
SELECT event_type, bucket, cnt, NULL, NULL, FALSE FROM r WHERE residual IS NULL
ORDER BY event_type, bucket
"""


@query("anomaly_seasonal_daily", oracle=_SEASONAL_ORACLE)
def anomaly_seasonal_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive anomaly scoring over daily event volumes
    (operators/anomaly.seasonal_residual_zscores): difference against
    the same weekday one week back, then MAD-score the residuals — the
    weekly-shape-aware sibling of anomaly_mad_daily (a normal Sunday
    stops looking anomalous; a broken Tuesday stops hiding in the
    weekly spread).

    Scale: one lag window + the MAD aggregations, all keyed on the
    series; the fact table is read once into the daily rollup."""
    from dawis_spark.operators.anomaly import seasonal_residual_zscores

    daily = (
        spark.table("events")
        .groupBy(
            "event_type",
            F.datediff(F.date_trunc("day", "ts"), F.lit("2024-01-01")).alias(
                "bucket"
            ),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        seasonal_residual_zscores(
            daily, ["event_type"], "bucket", "cnt", season_lag=7
        )
        .select("event_type", "bucket", "cnt", "residual", "robust_z", "is_anomaly")
        .orderBy("event_type", "bucket")
    )


_IVM_JOIN_ORACLE = """
WITH dim_final AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 5 = 0 THEN 'MOVED2'
              WHEN c_custkey % 7 = 0 THEN 'MOVED1'
              ELSE c_mktsegment END AS c_mktsegment
  FROM customer
)
SELECT o.o_orderkey, d.c_mktsegment, o.o_totalprice
FROM orders o JOIN dim_final d ON o.o_custkey = d.c_custkey
ORDER BY o.o_orderkey
"""


@query("incremental_join_2ticks", oracle=_IVM_JOIN_ORACLE)
def incremental_join_2ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-view maintenance, oracle-proven (operators/ivm.py): the
    orders⋈customer view starts from a third of the facts, then two
    ticks each append a fact slice AND update a customer-segment slice
    (custkey%7 -> MOVED1, then custkey%5 -> MOVED2, overlapping); the
    maintained view must row-hash-match a single-shot join of ALL
    orders against the FINAL dimension. Re-derivation pulls fact
    columns from the view itself — the fact table is never re-joined
    for dimension churn, the delta rule every warehouse's materialized
    denormalization relies on.

    Scale: per tick, one key-pruned pass over the view plus
    deltas-sized joins; nothing history-sized shuffles."""
    from dawis_spark.operators.ivm import maintain_join_view

    cust = spark.table("customer")
    orders = spark.table("orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )

    def dim_state(*moves: tuple[int, str]) -> DataFrame:
        seg = F.col("c_mktsegment")
        for mod, label in moves:  # later moves win: apply in reverse below
            seg = F.when(F.col("c_custkey") % mod == 0, label).otherwise(seg)
        return cust.select("c_custkey", seg.alias("c_mktsegment"))

    dim0 = dim_state()
    dim1 = dim_state((7, "MOVED1"))
    dim2 = dim_state((7, "MOVED1"), (5, "MOVED2"))

    key = ["c_custkey"]
    fact = orders.withColumnRenamed("o_custkey", "c_custkey")
    view = fact.filter("o_orderkey % 3 = 0").join(dim0, key)
    view = maintain_join_view(
        view,
        fact.filter("o_orderkey % 3 = 1"),
        dim1,
        cust.filter("c_custkey % 7 = 0").select(*key),
        key,
        ["c_mktsegment"],
    )
    view = maintain_join_view(
        view,
        fact.filter("o_orderkey % 3 = 2"),
        dim2,
        cust.filter("c_custkey % 5 = 0").select(*key),
        key,
        ["c_mktsegment"],
    )
    return view.select("o_orderkey", "c_mktsegment", "o_totalprice").orderBy(
        "o_orderkey"
    )


_NULLSAFE_ORACLE = """
WITH l AS (
  SELECT CASE WHEN c_custkey % 40 = 0 THEN NULL ELSE c_custkey % 500 END AS k,
         c_acctbal
  FROM customer WHERE c_custkey % 2 = 0),
r AS (
  SELECT CASE WHEN c_custkey % 30 = 0 THEN NULL ELSE c_custkey % 500 END AS k
  FROM customer WHERE c_custkey % 2 = 1)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM l JOIN r ON l.k = r.k)
    AS n_equals_join,
  (SELECT CAST(COUNT(*) AS BIGINT)
   FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k)
    AS n_null_safe_join,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM l WHERE k IS NULL) AS n_left_nulls,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM r WHERE k IS NULL) AS n_right_nulls
"""


@query("null_safe_join_semantics", oracle=_NULLSAFE_ORACLE)
def null_safe_join_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join parity: ``=`` drops every NULL-keyed row
    (NULL = NULL is unknown) while the null-safe operator (Spark
    ``<=>``, ANSI ``IS NOT DISTINCT FROM``) matches NULL keys to each
    other — so n_null_safe = n_equals + n_left_nulls * n_right_nulls.
    The join-key companion to not_in_null_semantics: ETL dedup/merge
    steps keyed on nullable business keys silently drop rows under
    ``=`` and need the null-safe form.

    Scale note: Spark plans ``<=>`` as an ordinary hash join (the
    null bucket is just one more key), so correctness costs nothing —
    the trap is semantic, not physical."""
    register_testdata(spark, sf_dir)
    return spark.sql(
        """
        WITH l AS (
          SELECT CASE WHEN c_custkey % 40 = 0 THEN NULL
                      ELSE c_custkey % 500 END AS k, c_acctbal
          FROM customer WHERE c_custkey % 2 = 0),
        r AS (
          SELECT CASE WHEN c_custkey % 30 = 0 THEN NULL
                      ELSE c_custkey % 500 END AS k
          FROM customer WHERE c_custkey % 2 = 1)
        SELECT
          (SELECT CAST(COUNT(*) AS BIGINT) FROM l JOIN r ON l.k = r.k)
            AS n_equals_join,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM l JOIN r ON l.k <=> r.k)
            AS n_null_safe_join,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM l WHERE k IS NULL)
            AS n_left_nulls,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM r WHERE k IS NULL)
            AS n_right_nulls
        """
    )


_UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT n_name,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                  THEN CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS urgent_cents,
         CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
                  THEN CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS low_cents
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY 1)
SELECT n_name, metric, value_cents
FROM wide
UNPIVOT (value_cents FOR metric IN (urgent_cents, low_cents))
ORDER BY n_name, metric
"""


@query("unpivot_metric_long", oracle=_UNPIVOT_ORACLE)
def unpivot_metric_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long UNPIVOT of a per-nation revenue matrix (the inverse
    of pivot_event_counts): two priority-revenue columns melt into
    (metric, value) rows — the reshape every metric-store loader and
    plotting pipeline needs, expressed with Spark's ``stack`` (its
    UNPIVOT workhorse) against DuckDB's ANSI UNPIVOT.

    Scale: the wide aggregate is the only shuffle; the melt is a
    map-side 2x row expansion with column-pruned input."""
    register_testdata(spark, sf_dir)
    return spark.sql(
        """
        WITH wide AS (
          SELECT n_name,
                 CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                          ELSE 0 END) AS BIGINT) AS urgent_cents,
                 CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
                          THEN CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                          ELSE 0 END) AS BIGINT) AS low_cents
          FROM orders
          JOIN customer ON c_custkey = o_custkey
          JOIN nation ON n_nationkey = c_nationkey
          GROUP BY 1)
        SELECT n_name, metric, value_cents
        FROM wide
        LATERAL VIEW stack(2,
          'urgent_cents', urgent_cents,
          'low_cents', low_cents) AS metric, value_cents
        ORDER BY n_name, metric
        """
    )


_NOT_IN_NULL_ORACLE = """
WITH probe AS (
  SELECT CASE WHEN c_custkey % 50 = 0 THEN NULL ELSE c_custkey END AS k
  FROM customer WHERE c_custkey % 2 = 0
),
clean AS (SELECT k FROM probe WHERE k IS NOT NULL)
SELECT
  (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN (SELECT k FROM probe))
    AS n_not_in_with_null,
  (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN (SELECT k FROM clean))
    AS n_not_in_clean,
  (SELECT COUNT(*) FROM orders o
   WHERE NOT EXISTS (SELECT 1 FROM probe p WHERE p.k = o.o_custkey))
    AS n_not_exists
"""


@query("not_in_null_semantics", oracle=_NOT_IN_NULL_ORACLE)
def not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic parity check: ``NOT IN`` against a subquery
    CONTAINING a NULL must return ZERO rows (x <> NULL is unknown for
    every x — the classic SQL trap), while the NULL-free ``NOT IN`` and
    the ``NOT EXISTS`` rewrite count normally. One row, three counts —
    an engine that silently rewrites NOT IN to an anti join without the
    null guard fails this against any ANSI oracle.

    Scale note: this is exactly why operators/idempotent.py and the DQ
    suite build on left_anti/NOT EXISTS — Spark plans the null-aware
    NOT IN as a BroadcastNestedLoopJoin when the subquery may contain
    NULLs, which is correct and expensive; the null-free forms get the
    cheap anti join."""
    register_testdata(spark, sf_dir)
    return spark.sql(
        """
        WITH probe AS (
          SELECT CASE WHEN c_custkey % 50 = 0 THEN NULL
                      ELSE c_custkey END AS k
          FROM customer WHERE c_custkey % 2 = 0
        ),
        clean AS (SELECT k FROM probe WHERE k IS NOT NULL)
        SELECT
          (SELECT COUNT(*) FROM orders
           WHERE o_custkey NOT IN (SELECT k FROM probe))
            AS n_not_in_with_null,
          (SELECT COUNT(*) FROM orders
           WHERE o_custkey NOT IN (SELECT k FROM clean))
            AS n_not_in_clean,
          (SELECT COUNT(*) FROM orders o
           WHERE NOT EXISTS (SELECT 1 FROM probe p
                             WHERE p.k = o.o_custkey))
            AS n_not_exists
        """
    )


def _mask_spans_oracle(k: int) -> str:
    inner = _dup_spans_oracle(k).strip()
    toks = _TXT.tokens("text", "duck")
    keep = (
        "list_filter(range(0, len(t)), i -> spans IS NULL OR "
        "len(list_filter(spans, s -> i >= s.span_start AND i < s.span_end)) = 0)"
    )
    return f"""
WITH spans_raw AS (SELECT * FROM ({inner})),
sp AS (
  SELECT doc_id,
         list({{'span_start': span_start, 'span_end': span_end}}) AS spans
  FROM spans_raw GROUP BY doc_id
),
tk AS (
  SELECT d.doc_id, {toks} AS t, sp.spans
  FROM documents d LEFT JOIN sp ON d.doc_id = sp.doc_id
),
kept AS (SELECT doc_id, t, {keep} AS keep FROM tk)
SELECT doc_id,
       len(t) AS n_before,
       len(keep) AS n_after,
       COALESCE(
         list_aggregate(list_transform(keep, i -> t[i + 1]), 'string_agg', ' '),
         '') AS clean_text
FROM kept ORDER BY doc_id
"""


@query("dedup_masked_text", oracle=_mask_spans_oracle(8))
def dedup_masked_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span REMOVAL — the second half of Lee et al. 2021
    (operators/dedup.mask_duplicated_spans): every token covered by a
    duplicated 8-gram span is cut from the canonical token stream,
    keeping the unique remainder of each document instead of dropping
    whole near-duplicates.

    Scale: spans collect per doc (merged maximal runs — few per doc),
    the join keys on doc id, and masking is one map-side expression
    over each doc's own token array."""
    from dawis_spark.operators.dedup import duplicated_spans, mask_duplicated_spans

    docs = spark.table("documents")
    spans = duplicated_spans(docs, "doc_id", "text", window_k=8)
    return mask_duplicated_spans(docs, spans, "doc_id", "text").orderBy("doc_id")


# ---------------------------------------------------------------------------
# Driver-check rotation
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Graph-based ANN: cell-partitioned NSW beam search (operators/nsw.py)
# ---------------------------------------------------------------------------


def _nsw_oracle(
    k: int, nq: int, kc: int, n_probe: int, m: int, beam: int, hops: int, dim: int
) -> str:
    """Replay of nsw_ann_topk: quantizer training (shared k-means CTEs),
    within-cell kNN edge build, per-cell entry points, then ``hops``
    unrolled beam iterations — every cosine 6-digit-rounded with
    id-ascending tie-breaks, so both engines walk the identical graph."""
    cos_vc = _VEC.cosine_null("vec", "cvec", "duck")
    cos_ab = _VEC.cosine_null("a.vec", "b.vec", "duck")
    cos_qn = _VEC.cosine_null("q.q_vec", "a.vec", "duck")
    hop_ctes = []
    prev = "f0"
    for t in range(1, hops + 1):
        hop_ctes.append(f"""
e{t} AS (
  SELECT query_id, node_id FROM {prev}
  UNION
  SELECT f.query_id, ed.dst AS node_id
  FROM {prev} f JOIN edges ed ON f.node_id = ed.src
),
s{t} AS (
  SELECT e.query_id, e.node_id,
         coalesce(ROUND({cos_qn}, 6), -2.0) AS cosine
  FROM e{t} e
  JOIN assign a ON e.node_id = a.id
  JOIN qv q ON e.query_id = q.query_id
),
f{t} AS (
  SELECT query_id, node_id, cosine FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, node_id) AS r
    FROM s{t}) WHERE r <= {beam}
)""")
        prev = f"f{t}"
    return f"""
WITH {_kmeans_c1_ctes(kc, dim)},
corpus_aff AS (
  SELECT vec_id AS id, vec, cid,
         coalesce(ROUND({cos_vc}, 6), -2.0) AS aff
  FROM v, (SELECT cid, cvec FROM c1) cent(cid, cvec)
),
assign AS (
  SELECT id, vec, cid, aff FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY aff DESC, cid) AS r
    FROM corpus_aff) WHERE r <= 1
),
knn AS (
  SELECT src, dst FROM (
    SELECT a.id AS src, b.id AS dst,
           row_number() OVER (PARTITION BY a.id
             ORDER BY coalesce(ROUND({cos_ab}, 6), -2.0) DESC, b.id) AS r
    FROM assign a JOIN assign b USING (cid) WHERE a.id != b.id
  ) WHERE r <= {m}
),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM knn UNION ALL SELECT dst AS src, src AS dst FROM knn)
),
entries AS (
  SELECT cid, id AS node_id FROM (
    SELECT cid, id, row_number() OVER (PARTITION BY cid ORDER BY aff DESC, id) AS r
    FROM assign) WHERE r <= 1
),
qv AS (SELECT vec_id AS query_id, vec AS q_vec FROM v WHERE vec_id < {nq}),
q_aff AS (
  SELECT query_id, cid,
         coalesce(ROUND({_VEC.cosine_null("q_vec", "cvec", "duck")}, 6), -2.0) AS aff
  FROM qv, (SELECT cid, cvec FROM c1) cent(cid, cvec)
),
q_b AS (
  SELECT query_id, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY aff DESC, cid) AS r
    FROM q_aff) WHERE r <= {n_probe}
),
f0 AS (SELECT DISTINCT query_id, node_id FROM q_b JOIN entries USING (cid)),
{','.join(hop_ctes)}
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, node_id AS neighbor_id, cosine,
         row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, node_id) AS rank
  FROM f{hops} WHERE query_id != node_id
) WHERE rank <= {k}
ORDER BY query_id, rank
"""


@query("embedding_ann_nsw", oracle=_nsw_oracle(5, 10, 8, 2, 4, 10, 2, 64))
def embedding_ann_nsw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-based ANN (operators/nsw.py): single-layer NSW beam search
    over a cell-partitioned kNN graph, entry points from the trained IVF
    quantizer — the graph-index family (HNSW's) re-expressed so that
    construction shards per cell and search unrolls deterministically.

    Scale: graph build is cell-scoped self-joins (bounded blocks, never
    corpus all-pairs); search exchanges carry id/score triples with
    candidate hydration bounded by beam x degree per query per hop. The
    hierarchy HNSW uses to find entry points is replaced by the coarse
    quantizer the engine already trains and replays."""
    from dawis_spark.operators.nsw import nsw_ann_topk

    emb = spark.table("embeddings")
    return nsw_ann_topk(
        corpus=emb,
        queries=emb.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        n_centroids=8,
        n_probe=2,
        m=4,
        beam=10,
        hops=2,
    ).orderBy("query_id", "rank")


def _ann_recall_nsw_oracle(k: int) -> str:
    exact = _embedding_topk_oracle(k, 10).strip()
    nsw = _nsw_oracle(k, 10, 8, 2, 4, 10, 2, 64).strip()
    return f"""
WITH exact_r AS (SELECT * FROM ({exact})),
nsw_r AS (SELECT * FROM ({nsw}))
SELECT e.query_id,
  ROUND(CAST(COUNT(r.neighbor_id) AS DOUBLE) / {k}, 6) AS recall_nsw
FROM exact_r e
LEFT JOIN nsw_r r
  ON e.query_id = r.query_id AND e.neighbor_id = r.neighbor_id
GROUP BY e.query_id ORDER BY e.query_id
"""


@query("ann_recall_nsw", oracle=_ann_recall_nsw_oracle(5))
def ann_recall_nsw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the NSW beam search against exact brute force, per
    query — the same self-eval discipline as every other ANN family
    (one shared quantizer training feeds the approximate side)."""
    from dawis_spark.operators.nsw import nsw_ann_topk
    from dawis_spark.operators.similarity import brute_force_topk, train_kmeans

    emb = spark.table("embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    cents = train_kmeans(emb, "vec_id", "embedding", k=8, iterations=1)
    exact = brute_force_topk(
        corpus=emb, queries=qs, id_col="vec_id", vec_col="embedding", k=5
    ).select("query_id", "neighbor_id")
    approx = nsw_ann_topk(
        emb, qs, "vec_id", "embedding",
        k=5, n_probe=2, m=4, beam=10, hops=2, centroids=cents,
    ).select(F.col("query_id").alias("a_qid"), F.col("neighbor_id").alias("a_nid"))
    joined = exact.join(
        approx,
        (exact["query_id"] == approx["a_qid"])
        & (exact["neighbor_id"] == approx["a_nid"]),
        "left",
    )
    return (
        joined.groupBy("query_id")
        .agg(
            F.round(F.count("a_nid").cast("double") / 5, 6).alias("recall_nsw"),
        )
        .orderBy("query_id")
    )



# ---------------------------------------------------------------------------
# CCNet perplexity quality filter (operators/lm.py)
# ---------------------------------------------------------------------------


def _perplexity_oracle(train_source: str, tlo: int, thi: int) -> str:
    th = _TXT.token_hash_array("text", "duck")
    mod = _TXT.MOD
    pair = (
        f"list_transform(range(1, len(th)), "
        f"p -> th[p] * {mod} + th[p + 1])"
    )
    return f"""
WITH tr AS (SELECT {th} AS th FROM documents WHERE source = '{train_source}'),
tpairs AS (SELECT unnest({pair}) AS bk FROM tr),
bic AS (SELECT bk, COUNT(*) AS c12 FROM tpairs GROUP BY bk),
follow AS (SELECT bk // {mod} AS h1, COUNT(*) AS c1 FROM tpairs GROUP BY 1),
vocab AS (SELECT COUNT(DISTINCT h) AS v FROM (SELECT unnest(th) AS h FROM tr)),
dp AS (
  SELECT id, unnest({pair}) AS bk
  FROM (SELECT doc_id AS id, {th} AS th FROM documents)
),
lp AS (
  SELECT id,
         CAST(round(round(ln((coalesce(c12, 0) + 1.0)
                            / (coalesce(c1, 0) + v)), 6) * 1000000)
              AS BIGINT) AS lp
  FROM dp
  LEFT JOIN bic USING (bk)
  LEFT JOIN follow ON dp.bk // {mod} = follow.h1
  CROSS JOIN vocab
),
scored AS (
  SELECT id, COUNT(*) AS n_trans,
         (-CAST(SUM(lp) AS BIGINT)) // COUNT(*) AS nll_micro
  FROM lp GROUP BY id
),
nq AS (SELECT COUNT(*) AS n FROM scored),
thr AS (
  SELECT pct, val FROM (
    SELECT p.pct, s.nll_micro AS val,
           row_number() OVER (PARTITION BY p.pct ORDER BY s.nll_micro) AS rn,
           (p.pct * (nq.n - 1)) // 100 + 1 AS t
    FROM scored s, (VALUES ({tlo}), ({thi})) p(pct), nq
  ) WHERE rn = t
),
cuts AS (
  SELECT max(CASE WHEN pct = {tlo} THEN val END) AS t_lo,
         max(CASE WHEN pct = {thi} THEN val END) AS t_hi
  FROM thr
)
SELECT d.doc_id AS id, coalesce(s.n_trans, 0) AS n_trans, s.nll_micro,
       round(exp(CAST(s.nll_micro AS DOUBLE) / 1000000.0), 4) AS ppl,
       CASE WHEN s.id IS NULL THEN 'na'
            WHEN s.nll_micro <= c.t_lo THEN 'head'
            WHEN s.nll_micro <= c.t_hi THEN 'middle'
            ELSE 'tail' END AS band
FROM documents d
LEFT JOIN scored s ON d.doc_id = s.id
CROSS JOIN cuts c
ORDER BY id
"""


@query("perplexity_quality_bands", oracle=_perplexity_oracle("src0", 33, 67))
def perplexity_quality_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet perplexity filtering (operators/lm.py; Wenzek et al. 2020):
    train a smoothed bigram LM on the trusted slice (source src0 — the
    Wikipedia stand-in), score every document's per-token NLL against
    it, and band the corpus head/middle/tail by NLL terciles — the
    model-based quality gate that complements the rule-based C4/Gopher
    filters and DSIR's importance weights.

    Scale: LM training is two map-side-partial counting aggregations
    (vocabulary-sized exchanges); scoring joins int64 composite bigram
    keys (token strings never leave the scan); per-doc NLL accumulates
    in exact integer micro-nats (partition-order invariant — what lets
    DuckDB replay it); tercile cuts come from the distributed-selection
    quantiles, so there is no global sort anywhere."""
    from dawis_spark.plans.bounded import register_bounded

    register_bounded(
        "perplexity_quality_bands",
        "bucket-counts",
        "prefix-sum over the <=1024-row bucket-count relation",
        n_windows=2,
    )

    from dawis_spark.operators.lm import perplexity_bands

    return (
        perplexity_bands(
            spark.table("documents"),
            "doc_id",
            "text",
            "source = 'src0'",
            pcts=(33, 67),
        )
        .orderBy("id")
    )



# ---------------------------------------------------------------------------
# Binary-quantization ANN (operators/bq.py)
# ---------------------------------------------------------------------------


def _bq_oracle(k: int, rf: int, nq: int, dim: int) -> str:
    from dawis_spark.operators.bq import bq_code_expr, bq_hamming_expr

    code = bq_code_expr("vec", dim, "duck")
    ham = bq_hamming_expr("q.q_codes", "c.codes", dim, "duck")
    cos = _VEC.cosine("qv.vec", "cv.vec", "duck")
    return f"""
WITH v AS (SELECT vec_id, embedding AS vec FROM embeddings),
codes AS (SELECT vec_id AS id, {code} AS codes FROM v),
qc AS (SELECT id AS query_id, codes AS q_codes FROM codes WHERE id < {nq}),
scored AS (
  SELECT q.query_id, c.id AS neighbor_id, {ham} AS hamming
  FROM qc q CROSS JOIN codes c WHERE q.query_id != c.id
),
pool AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY hamming, neighbor_id) AS r
    FROM scored) WHERE r <= {k * rf}
),
rer AS (
  SELECT p.query_id, p.neighbor_id, ROUND({cos}, 6) AS cosine
  FROM pool p
  JOIN v cv ON p.neighbor_id = cv.vec_id
  JOIN v qv ON p.query_id = qv.vec_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM rer) WHERE rank <= {k}
ORDER BY query_id, rank
"""


@query("embedding_ann_bq", oracle=_bq_oracle(5, 8, 10, 64))
def embedding_ann_bq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantization ANN (operators/bq.py): 1-bit sign codes
    (32x compression), Hamming-distance candidate pool via XOR+popcount
    integer codegen, exact cosine re-rank of the pool — the BQ+rescore
    recipe production vector stores ship, completing the quantization
    ladder (PQ / SQ8 / BQ) with its cheapest rung.

    Scale: the candidate stage projects codes only (2 int64 words per
    vector here; 32 words for a 1024-dim production embedding) — the
    corpus-side scan carries no raw vectors; queries broadcast; the
    refine stage hydrates pool members only.

    Honesty note on parameters: 64 dims is BQ's worst case (64 sign
    bits carry far less angular information than the >=256-dim
    embeddings BQ ships against in production), so this query oversizes
    the rescore pool (refine_factor=8 vs the 3-5 production default) and
    still reports mid-range recall in ann_recall_bq — the dial, and its
    price, are what the self-eval exists to show."""
    from dawis_spark.operators.bq import bq_topk

    emb = spark.table("embeddings")
    return bq_topk(
        corpus=emb,
        queries=emb.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        refine_factor=8,
        dim=64,
    ).orderBy("query_id", "rank")


def _ann_recall_bq_oracle(k: int) -> str:
    exact = _embedding_topk_oracle(k, 10).strip()
    bq = _bq_oracle(k, 8, 10, 64).strip()
    return f"""
WITH exact_r AS (SELECT * FROM ({exact})),
bq_r AS (SELECT * FROM ({bq}))
SELECT e.query_id,
  ROUND(CAST(COUNT(r.neighbor_id) AS DOUBLE) / {k}, 6) AS recall_bq
FROM exact_r e
LEFT JOIN bq_r r
  ON e.query_id = r.query_id AND e.neighbor_id = r.neighbor_id
GROUP BY e.query_id ORDER BY e.query_id
"""


@query("ann_recall_bq", oracle=_ann_recall_bq_oracle(5))
def ann_recall_bq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of BQ+rescore against exact brute force, per query —
    prices the 32x compression in recall, the same self-eval discipline
    as every other ANN family."""
    from dawis_spark.operators.bq import bq_topk
    from dawis_spark.operators.similarity import brute_force_topk

    emb = spark.table("embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(
        corpus=emb, queries=qs, id_col="vec_id", vec_col="embedding", k=5
    ).select("query_id", "neighbor_id")
    approx = bq_topk(
        emb, qs, "vec_id", "embedding", k=5, refine_factor=8, dim=64
    ).select(F.col("query_id").alias("a_qid"), F.col("neighbor_id").alias("a_nid"))
    joined = exact.join(
        approx,
        (exact["query_id"] == approx["a_qid"])
        & (exact["neighbor_id"] == approx["a_nid"]),
        "left",
    )
    return (
        joined.groupBy("query_id")
        .agg(F.round(F.count("a_nid").cast("double") / 5, 6).alias("recall_bq"))
        .orderBy("query_id")
    )



# ---------------------------------------------------------------------------
# Distributed BPE tokenizer training (operators/bpe.py)
# ---------------------------------------------------------------------------


def _bpe_chain_ctes(n_merges: int) -> str:
    """Shared CTE chain replaying bpe_train: word-type counts, then
    ``n_merges`` unrolled rounds of pair-count -> lexicographic-tie
    argmax -> greedy merge via the spaced-string replace (the same
    built-in replace semantics, verified identical across engines).
    Defines wt, w0..w{n}, p1..p{n}, b1..b{n}. All rounds MATERIALIZED:
    inlining the multiply-referenced CTEs re-evaluates the chain
    exponentially (the round-8 hang)."""
    toks = _TXT.tokens("text", "duck")
    init = (
        "concat(' ', array_to_string(list_append("
        "list_transform(range(1, length(word) + 1), "
        "j -> substr(word, j, 1)), '</w>'), '  '), ' ')"
    )
    rounds = []
    for t in range(1, n_merges + 1):
        rounds.append(f"""
p{t} AS MATERIALIZED (
  SELECT sy[i] AS p1, sy[i + 1] AS p2, CAST(SUM(cnt) AS BIGINT) AS pair_count
  FROM (SELECT cnt, string_split(trim(s), '  ') AS sy FROM w{t - 1}),
       unnest(range(1, len(sy))) AS u(i)
  GROUP BY 1, 2
),
b{t} AS MATERIALIZED (SELECT p1, p2, pair_count FROM p{t}
         ORDER BY pair_count DESC, p1, p2 LIMIT 1),
w{t} AS MATERIALIZED (
  SELECT cnt, replace(s, ' ' || b.p1 || '  ' || b.p2 || ' ',
                         ' ' || b.p1 || b.p2 || ' ') AS s
  FROM w{t - 1}, b{t} b
)""")
    return f"""wt AS (
  SELECT word, COUNT(*) AS cnt
  FROM (SELECT unnest({toks}) AS word FROM documents) GROUP BY word
),
w0 AS MATERIALIZED (SELECT cnt, {init} AS s FROM wt),
{','.join(rounds)}"""


def _bpe_oracle(n_merges: int) -> str:
    finals = "\nUNION ALL ".join(
        f"SELECT {t} AS step, p1 AS \"left\", p2 AS \"right\", pair_count FROM b{t}"
        for t in range(1, n_merges + 1)
    )
    return f"""
WITH {_bpe_chain_ctes(n_merges)}
SELECT step, "left", "right", pair_count FROM (
{finals}
) ORDER BY step
"""


def _bpe_segment_oracle(n_merges: int) -> str:
    """Replay of train + APPLY: per-document word stream re-segmented by
    the learned merges (each round's argmax joined in as a 1-row
    relation feeding the same spaced-string replace)."""
    toks = _TXT.tokens("text", "duck")
    init = (
        "concat(' ', array_to_string(list_append("
        "list_transform(range(1, length(word) + 1), "
        "j -> substr(word, j, 1)), '</w>'), '  '), ' ')"
    )
    segs = []
    for t in range(1, n_merges + 1):
        segs.append(f"""
seg{t} AS MATERIALIZED (
  SELECT id, replace(s, ' ' || b.p1 || '  ' || b.p2 || ' ',
                        ' ' || b.p1 || b.p2 || ' ') AS s
  FROM seg{t - 1}, b{t} b
)""")
    return f"""
WITH {_bpe_chain_ctes(n_merges)},
seg0 AS (
  SELECT id, {init} AS s
  FROM (SELECT doc_id AS id, unnest({toks}) AS word FROM documents)
),
{','.join(segs)}
SELECT id, COUNT(*) AS n_tokens,
       CAST(SUM(len(string_split(trim(s), '  '))) AS BIGINT) AS n_subwords
FROM seg{n_merges} GROUP BY id ORDER BY id
"""


@query("bpe_learned_merges", oracle=_bpe_oracle(8))
def bpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (operators/bpe.py; Sennrich et
    al. 2016): learn the first 8 merge rules over the document corpus —
    the tokenizer-construction step upstream of every token-counting /
    chunking operator in the pipeline.

    Scale: the corpus collapses to the word-type relation first
    (vocabulary-sized by Zipf — why the reference implementation trains
    on word counts too); each round's pair-count exchange is vocabulary-
    sized, the argmax broadcasts one row, and the merge applies as a
    codegen'd replace over the spaced symbol string (no UDF anywhere).
    Ties break to the lexicographically smallest pair, making the whole
    training trajectory engine-replayable."""
    from dawis_spark.operators.bpe import bpe_train

    return bpe_train(spark.table("documents"), "text", n_merges=8)


@query("bpe_segmented_corpus", oracle=_bpe_segment_oracle(8))
def bpe_segmented_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-apply: segment every document with the 8 learned BPE
    merges and report per-doc token vs subword counts — the end-to-end
    tokenizer loop (learn merges.txt, then tokenize the corpus with it),
    the shape every pretraining pipeline runs before packing.

    Scale: training as in bpe_learned_merges; application is pure
    map-side (the merge table rides the plan as literals — a shipped
    tokenizer's merges.txt), one codegen replace per merge inside the
    document scan, then a per-doc count aggregation."""
    from dawis_spark.operators.bpe import bpe_segment, bpe_train

    docs = spark.table("documents")
    merges = [
        (r["left"], r["right"])
        for r in bpe_train(docs, "text", n_merges=8).collect()
    ]
    return bpe_segment(docs, "doc_id", "text", merges).orderBy("id")



# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion (operators/fusion.py)
# ---------------------------------------------------------------------------


def _hybrid_rrf_oracle(depth: int, k_rrf: int, top_n: int) -> str:
    toks = _TXT.tokens("text", "duck")
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    cos = _VEC.cosine("q.vec", "c.vec", "duck")
    return f"""
WITH base AS (SELECT doc_id, {toks} AS __toks FROM documents),
dl AS (SELECT doc_id, CAST(len(__toks) AS DOUBLE) AS dl FROM base),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl),
tk AS (SELECT doc_id, unnest(__toks) AS token FROM base),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf FROM tk
  WHERE token IN ({terms}) GROUP BY doc_id, token
),
dfq AS (SELECT token, CAST(count(*) AS DOUBLE) AS df_t FROM tf GROUP BY token),
bscored AS (
  SELECT tf.doc_id,
         ln(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
           * (tf * (1.2 + 1))
           / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl)) AS contrib
  FROM tf JOIN dfq USING (token) JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
),
bagg AS (
  SELECT doc_id, ROUND(SUM(contrib), 6) AS bm25
  FROM bscored GROUP BY doc_id
),
sparse AS (
  SELECT doc_id AS id, CAST(r AS INT) AS sparse_rank FROM (
    SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
    FROM bagg) WHERE r <= {depth}
),
v AS (SELECT vec_id, embedding AS vec FROM embeddings),
dense AS (
  SELECT id, CAST(r AS INT) AS dense_rank FROM (
    SELECT c.vec_id AS id,
           row_number() OVER (
             ORDER BY ROUND({cos}, 6) DESC, c.vec_id) AS r
    FROM (SELECT vec FROM v WHERE vec_id = 0) q
    CROSS JOIN (SELECT vec_id, vec FROM v WHERE vec_id != 0) c
  ) WHERE r <= {depth}
)
SELECT id, round(coalesce(1.0 / ({k_rrf} + sparse_rank), 0.0)
              + coalesce(1.0 / ({k_rrf} + dense_rank), 0.0), 6) AS rrf_score,
       sparse_rank, dense_rank
FROM sparse FULL OUTER JOIN dense USING (id)
ORDER BY rrf_score DESC, id LIMIT {top_n}
"""


@query("hybrid_search_rrf", oracle=_hybrid_rrf_oracle(20, 60, 10))
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 sparse top-20 fused with dense cosine
    top-20 by reciprocal-rank fusion (operators/fusion.py; Cormack et
    al. 2009) — the production hybrid-search recipe. The query pair here
    is synthetic (the fixed BM25 bag + vector 0's embedding); the fused
    operator, its rank-only determinism, and the full-outer top-k plan
    are the point.

    Scale: both retrieval legs are existing corpus-scale operators; the
    fusion joins two top-N relations (config-sized) and takes one
    ordered head — free next to the legs."""
    from dawis_spark.plans.bounded import register_bounded

    register_bounded(
        "hybrid_search_rrf",
        "candidate-pool",
        "ranks over the fused candidate pool (two top-N legs)",
        n_windows=2,
    )
    from pyspark.sql import Window

    from dawis_spark.operators.corpus import bm25_scores
    from dawis_spark.operators.fusion import rrf_fuse
    from dawis_spark.operators.similarity import brute_force_topk

    docs = spark.table("documents")
    emb = spark.table("embeddings")
    sparse = (
        bm25_scores(docs, "doc_id", "text", list(_BM25_TERMS), top_n=20)
        .select(
            F.col("doc_id").alias("id"),
            F.row_number()
            .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
            .cast("int")
            .alias("sparse_rank"),
        )
    )
    dense = brute_force_topk(
        corpus=emb,
        queries=emb.filter(F.col("vec_id") == 0),
        id_col="vec_id",
        vec_col="embedding",
        k=20,
    ).select(
        F.col("neighbor_id").alias("id"),
        F.col("rank").cast("int").alias("dense_rank"),
    )
    return rrf_fuse(
        sparse, dense, "sparse_rank", "dense_rank", k=60, top_n=10
    ).orderBy(F.desc("rrf_score"), "id")



# ---------------------------------------------------------------------------
# Logistic-regression training + AUC eval (operators/logreg.py)
# ---------------------------------------------------------------------------

_LOGREG_Y_SPARK = (
    "case when label < 5 then cast(1.0 as double) else cast(0.0 as double) end"
)

# Training-sample cap for the logreg quality-classifier family (the
# train_kmeans sample discipline): train on the _LOGREG_SAMPLE_LIMIT
# lowest-vec_id embeddings, score the full corpus distributed. 4096 is
# generous for a 65-parameter linear model; it is a no-op at sf0.01/0.1
# (500/2000 rows) and binds at sf1+ (20000+), which is the point — at
# 100 TB training cost is constant while scoring stays one scan.
_LOGREG_SAMPLE_LIMIT = 4096

# One trained weight vector shared by the five classifier queries
# (logreg_weights, classifier_auc_eval, classifier_calibration_curve,
# ece_classifier_calibration, gains_lift_deciles) — keyed on the data
# directory + hyperparameters, NOT the session: testdata at a given
# sf_dir is immutable, and the weights are plain floats.
_LOGREG_W_CACHE: dict[tuple, list[float]] = {}


def _trained_logreg_w(
    spark: SparkSession, sf_dir: str, dim: int = 64, iters: int = 3, lr: float = 1.0
) -> list[float]:
    from dawis_spark.operators.logreg import logreg_train

    key = (sf_dir, dim, iters, lr, _LOGREG_SAMPLE_LIMIT)
    if key not in _LOGREG_W_CACHE:
        _LOGREG_W_CACHE[key] = logreg_train(
            spark.table("embeddings"),
            "embedding",
            _LOGREG_Y_SPARK,
            dim=dim,
            iterations=iters,
            lr=lr,
            id_col="vec_id",
            sample_limit=_LOGREG_SAMPLE_LIMIT,
        )
    return _LOGREG_W_CACHE[key]


_PLATT_ITERS = 3
_PLATT_LR = 0.5
_PLATT_CACHE: dict[tuple, tuple[float, float]] = {}


def _trained_platt_ab(spark: SparkSession, sf_dir: str) -> tuple[float, float]:
    """Platt (a, b) fitted on the SAME bounded lowest-vec_id sample the
    logreg family trains on, against the shared trained margins —
    memoized per data directory like _trained_logreg_w."""
    from dawis_spark.operators.logreg import margin_expr, platt_fit

    key = (sf_dir, _PLATT_ITERS, _PLATT_LR, _LOGREG_SAMPLE_LIMIT)
    if key not in _PLATT_CACHE:
        w = _trained_logreg_w(spark, sf_dir)
        rows = (
            spark.table("embeddings")
            .select(
                F.col("vec_id"),
                F.expr(margin_expr("embedding", w)).alias("m"),
                F.expr(f"cast({_LOGREG_Y_SPARK} as double)").alias("y"),
            )
            .orderBy("vec_id")
            .limit(_LOGREG_SAMPLE_LIMIT)
            .collect()
        )
        _PLATT_CACHE[key] = platt_fit(
            [r["m"] for r in rows],
            [r["y"] for r in rows],
            iterations=_PLATT_ITERS,
            lr=_PLATT_LR,
        )
    return _PLATT_CACHE[key]


def _platt_chain_ctes(iters: int, lr: float) -> str:
    """CTE chain replaying platt_fit over ``mt`` (the sampled round-6
    margins): per round a round-6 affine margin, round-6 residual,
    integer-micro gradient pair, round-6 (a, b) update. Ends at
    p{iters}(a, b). Requires the logreg chain's ``nn`` CTE."""
    rounds = []
    for t in range(1, iters + 1):
        rounds.append(f"""
pg{t} AS MATERIALIZED (
  SELECT CAST(SUM(CAST(round(r * m * 1000000) AS BIGINT)) AS BIGINT) AS ga,
         CAST(SUM(CAST(round(r * 1000000) AS BIGINT)) AS BIGINT) AS gb
  FROM (SELECT mt.m,
               round(1.0 / (1.0 + exp(-(round(p.a * mt.m + p.b, 6)))) - mt.y,
                     6) AS r
        FROM mt, p{t - 1} p)),
p{t} AS (
  SELECT round(p.a - {lr} * (g.ga / 1000000.0) / nn.n, 6) AS a,
         round(p.b - {lr} * (g.gb / 1000000.0) / nn.n, 6) AS b
  FROM p{t - 1} p, pg{t} g, nn)""")
    return (
        "p0 AS (SELECT CAST(1.0 AS DOUBLE) AS a, CAST(0.0 AS DOUBLE) AS b),"
        + ",".join(rounds)
    )


def _logreg_chain_ctes(dim: int, iters: int, lr: float, sample_limit: int) -> str:
    """CTE chain replaying logreg_train: zero-init weights, per round a
    round-6 margin fold, round-6 residual, integer-micro gradient sums,
    and a round-6 HALF_UP weight update. Ends at w{iters}(dim, weight).
    All MATERIALIZED (multiply-referenced CTEs inline exponentially).

    ``v`` is the FULL corpus (downstream scoring CTEs read it); training
    rounds read ``vt``, the ``sample_limit`` lowest-vec_id prefix — the
    exact sample logreg_train(sample_limit=...) collects."""
    d1 = dim + 1
    dot = _VEC.dot("xs", "wl", "duck")
    rounds = []
    for t in range(1, iters + 1):
        rounds.append(f"""
wl{t - 1} AS (SELECT list(weight ORDER BY dim) AS wl FROM w{t - 1}),
sc{t} AS MATERIALIZED (
  SELECT vec_id, xs,
         round(1.0 / (1.0 + exp(-(round({dot}, 6)))) - y, 6) AS r
  FROM vt, wl{t - 1}
),
g{t} AS MATERIALIZED (
  SELECT u.pos - 1 AS dim,
         CAST(SUM(CAST(round(r * xs[u.pos] * 1000000) AS BIGINT)) AS BIGINT) AS g
  FROM sc{t}, unnest(range(1, {d1 + 1})) u(pos) GROUP BY 1
),
w{t} AS MATERIALIZED (
  SELECT w.dim, round(w.weight - {lr} * (g.g / 1000000.0) / nn.n, 6) AS weight
  FROM w{t - 1} w JOIN g{t} g USING (dim), nn
)""")
    return f"""v AS MATERIALIZED (
  SELECT vec_id,
         list_append(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                     CAST(1.0 AS DOUBLE)) AS xs,
         CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS y
  FROM embeddings
),
vt AS MATERIALIZED (
  SELECT * FROM v ORDER BY vec_id LIMIT {sample_limit}
),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM vt),
w0 AS MATERIALIZED (
  SELECT u.d - 1 AS dim, CAST(0.0 AS DOUBLE) AS weight
  FROM unnest(range(1, {d1 + 1})) u(d)
),
{','.join(rounds)}"""


def _logreg_weights_oracle(dim: int, iters: int, lr: float) -> str:
    return f"""
WITH {_logreg_chain_ctes(dim, iters, lr, _LOGREG_SAMPLE_LIMIT)}
SELECT dim, weight FROM w{iters} ORDER BY dim
"""


def _logreg_auc_oracle(dim: int, iters: int, lr: float) -> str:
    dot = _VEC.dot("xs", "wl", "duck")
    return f"""
WITH {_logreg_chain_ctes(dim, iters, lr, _LOGREG_SAMPLE_LIMIT)},
wlF AS (SELECT list(weight ORDER BY dim) AS wl FROM w{iters}),
scF AS MATERIALIZED (
  SELECT CAST(v.y AS INT) AS y, round({dot}, 6) AS s FROM v, wlF
),
rk AS MATERIALIZED (
  SELECT y, s, row_number() OVER (ORDER BY s) AS rn FROM scF
),
mr AS (SELECT s, min(rn) + max(rn) AS mr2 FROM rk GROUP BY s)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(y) AS BIGINT) AS n_pos,
       round((CAST(SUM(CASE WHEN y = 1 THEN mr2 ELSE 0 END) AS DOUBLE)
              - CAST(SUM(y) AS DOUBLE) * (CAST(SUM(y) AS DOUBLE) + 1))
             / (2.0 * CAST(SUM(y) AS DOUBLE)
                * CAST(COUNT(*) - SUM(y) AS DOUBLE)), 6) AS auc,
       round(CAST(SUM(CASE WHEN (s > 0) = (y = 1) THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS accuracy
FROM rk JOIN mr USING (s)
"""


@query("logreg_weights", oracle=_logreg_weights_oracle(64, 3, 1.0))
def logreg_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic-regression training (operators/logreg.py):
    3 rounds of full-batch GD on the labeled embeddings (y = label < 5),
    returning the learned 65-weight vector (bias last) — the training
    half of the fasttext-style quality gate whose inference plan
    quality_classifier_scores already ships.

    Scale: training runs driver-side on the _LOGREG_SAMPLE_LIMIT
    lowest-vec_id examples (one bounded TakeOrdered collect — the
    train_kmeans sample discipline), so cost is CONSTANT in corpus
    size; the trained vector is memoized and shared by the whole
    classifier family (_trained_logreg_w). The integer-micro gradient
    discipline makes the numpy trajectory bit-equal to the distributed
    full-batch path on the same rows, which is what lets DuckDB replay
    all 3 rounds (vt CTE = the same id-ordered prefix)."""
    w = _trained_logreg_w(spark, sf_dir)
    return spark.createDataFrame(
        [(j, wj) for j, wj in enumerate(w)], "dim int, weight double"
    ).orderBy("dim")


@query("classifier_auc_eval", oracle=_logreg_auc_oracle(64, 3, 1.0))
def classifier_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-eval for logreg_weights: exact tie-aware ROC AUC (midrank
    rank-sum form — integers until the final division) and accuracy at
    threshold 0 for the trained model on the FULL corpus (training
    itself sees only the bounded lowest-id sample). The eval discipline
    every trained component here carries (ann_recall_*,
    quantiles_error_eval) applied to the classifier."""
    from dawis_spark.operators.logreg import auc_accuracy

    emb = spark.table("embeddings")
    w = _trained_logreg_w(spark, sf_dir)
    return auc_accuracy(emb, "embedding", _LOGREG_Y_SPARK, w)


_LP_SEED_MAX = 200  # labeled seed = vec_id < 200; propagation targets = the rest
_LP_K = 5


def _labelprop_oracle(seed_max: int, k: int) -> str:
    cos = _VEC.cosine("t_vec", "s_vec", "duck")
    return f"""
WITH s AS (SELECT vec_id AS sid, label AS lbl, embedding AS s_vec
           FROM embeddings WHERE vec_id < {seed_max}),
t AS (SELECT vec_id AS target_id, embedding AS t_vec
      FROM embeddings WHERE vec_id >= {seed_max}),
scored AS (SELECT target_id, sid, lbl, ROUND({cos}, 6) AS c FROM t, s),
topk AS (SELECT * FROM (
  SELECT *, row_number() OVER (PARTITION BY target_id ORDER BY c DESC, sid) AS rnk
  FROM scored) WHERE rnk <= {k}),
votes AS (
  SELECT target_id, lbl,
         CAST(COUNT(*) AS BIGINT) AS votes,
         CAST(SUM(CAST(ROUND(c * 1000000, 0) AS BIGINT)) AS BIGINT) AS score_micro
  FROM topk GROUP BY target_id, lbl),
best AS (SELECT * FROM (
  SELECT *, row_number() OVER (
    PARTITION BY target_id ORDER BY votes DESC, score_micro DESC, lbl) AS r
  FROM votes) WHERE r = 1)
SELECT target_id, lbl AS predicted_label, votes, score_micro
FROM best ORDER BY target_id
"""


def _labelprop_predictions(spark: SparkSession):
    from dawis_spark.operators.labelprop import collect_seed, knn_label_propagation

    emb = spark.table("embeddings")
    seed_rows = collect_seed(
        emb.filter(F.col("vec_id") < _LP_SEED_MAX), "vec_id", "embedding", "label"
    )
    targets = emb.filter(F.col("vec_id") >= _LP_SEED_MAX)
    return seed_rows, knn_label_propagation(
        targets, seed_rows, "vec_id", "embedding", k=_LP_K
    )


@query("knn_label_propagation", oracle=_labelprop_oracle(_LP_SEED_MAX, _LP_K))
def knn_label_propagation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised labeling: each unlabeled document takes the majority
    label of its k=5 nearest LABELED seed vectors by cosine (the
    FineWeb-Edu / quality-classifier pipeline shape). The seed rides into
    the corpus scan as a literal — per-row top-k and the vote argmax are
    array expressions inside the projection, so the corpus is never
    shuffled or joined (zero exchanges; plan-pinned). Vote weights sum
    6-digit cosines in integer micro-units: addition-order invariant,
    which is what lets DuckDB replay the election exactly."""
    _, preds = _labelprop_predictions(spark)
    return preds.orderBy("target_id")


def _labelprop_eval_oracle(seed_max: int, k: int) -> str:
    base = _labelprop_oracle(seed_max, k).strip().rstrip()
    # reuse the propagation CTE verbatim; wrap with the truth join
    return f"""
WITH preds AS ({base}),
truth AS (SELECT vec_id AS target_id, label AS true_label
          FROM embeddings WHERE vec_id >= {seed_max}),
seed_mode AS (SELECT label AS m_lbl FROM (
  SELECT label, COUNT(*) AS n FROM embeddings WHERE vec_id < {seed_max}
  GROUP BY label ORDER BY n DESC, label LIMIT 1))
SELECT CAST(COUNT(*) AS BIGINT) AS n_eval,
       CAST(SUM(CASE WHEN p.predicted_label = t.true_label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       ROUND(CAST(SUM(CASE WHEN p.predicted_label = t.true_label THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 4) AS accuracy,
       ROUND(CAST(SUM(CASE WHEN t.true_label = (SELECT m_lbl FROM seed_mode) THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 4) AS baseline_accuracy
FROM preds p JOIN truth t USING (target_id)
"""


@query(
    "label_propagation_accuracy",
    oracle=_labelprop_eval_oracle(_LP_SEED_MAX, _LP_K),
)
def label_propagation_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-eval for knn_label_propagation: holdout accuracy of the
    propagated labels against the withheld true labels, beside the
    majority-class baseline the propagation must beat (the standing
    discipline: every trained/approximate component ships with the
    query that measures it).

    On THIS synthetic testdata the eval honestly reads ~chance (0.10 vs
    0.083 baseline; the binary label<5 variant probes at ~0.50): the
    labels are not locally clustered in the embedding space — the
    linear probe (classifier_auc_eval, AUC 0.70) finds a global
    direction that 200-seed kNN neighborhoods cannot see. That is the
    self-eval doing its job: it would flag exactly this before anyone
    shipped propagated labels from an unsuitable embedding."""
    from collections import Counter

    from dawis_spark.operators.labelprop import propagation_accuracy

    seed_rows, preds = _labelprop_predictions(spark)
    counts = Counter(l for _, l, _ in seed_rows)
    baseline = min(
        counts, key=lambda l: (-counts[l], l)
    )  # majority, ties -> lowest label (matches the oracle's ORDER BY)
    truth = spark.table("embeddings").filter(F.col("vec_id") >= _LP_SEED_MAX)
    return propagation_accuracy(preds, truth, "vec_id", "label", baseline)


_MMR_NQ, _MMR_POOL, _MMR_K = 5, 20, 5


def _mmr_base_ctes(n_queries: int, n_pool: int) -> str:
    cos = _VEC.cosine("q_vec", "c_vec", "duck")
    cos_ab = _VEC.cosine("a.vec", "b.vec", "duck")
    return f"""
q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < {n_queries}),
c AS (SELECT vec_id AS did, embedding AS c_vec FROM embeddings),
scored AS (SELECT query_id, did, ROUND({cos}, 6) AS cosine FROM q, c WHERE query_id != did),
ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, did) AS rnk FROM scored),
pool AS (SELECT query_id, did, rnk, CAST(ROUND(cosine * 1000000, 0) AS BIGINT) AS rel_micro
         FROM ranked WHERE rnk <= {n_pool}),
pv AS (SELECT p.query_id, p.did, c.c_vec AS vec FROM pool p JOIN c ON p.did = c.did),
pp0 AS (SELECT a.query_id, a.did AS a, b.did AS b,
               CAST(ROUND(ROUND({cos_ab}, 6) * 1000000, 0) AS BIGINT) AS sim_micro
        FROM pv a JOIN pv b ON a.query_id = b.query_id AND a.did < b.did),
pp AS (SELECT query_id, a, b, sim_micro FROM pp0
       UNION ALL SELECT query_id, b, a, sim_micro FROM pp0)"""


def _mmr_step_ctes(k: int) -> str:
    """Unrolled integer greedy: k (cand, pick, sel) CTE triples — the
    same eager-trajectory replay discipline as the kmeans/BPE oracles."""
    parts = [
        "sel0(query_id, did) AS (SELECT query_id, did FROM pool WHERE 1=0)"
    ]
    for t in range(1, k + 1):
        parts.append(f"""
cand{t} AS (
  SELECT p.query_id, p.did,
         7 * p.rel_micro - 3 * COALESCE((
           SELECT MAX(x.sim_micro) FROM pp x
           WHERE x.query_id = p.query_id AND x.a = p.did
             AND x.b IN (SELECT s.did FROM sel{t - 1} s WHERE s.query_id = p.query_id)), 0)
         AS score
  FROM pool p
  WHERE p.did NOT IN (SELECT s.did FROM sel{t - 1} s WHERE s.query_id = p.query_id)),
pick{t} AS (SELECT query_id, did, score FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, did) AS r
  FROM cand{t}) WHERE r = 1),
sel{t} AS (SELECT query_id, did FROM sel{t - 1}
           UNION ALL SELECT query_id, did FROM pick{t})""")
    return ",\n".join(parts)


def _mmr_oracle(n_queries: int, n_pool: int, k: int) -> str:
    picks = "\nUNION ALL ".join(
        f"SELECT query_id, {t} AS rank, did, score AS mmr_score_scaled FROM pick{t}"
        for t in range(1, k + 1)
    )
    return (
        "WITH "
        + _mmr_base_ctes(n_queries, n_pool)
        + ",\n"
        + _mmr_step_ctes(k)
        + f"\nSELECT * FROM ({picks})\nORDER BY query_id, rank"
    )


@query("mmr_rerank", oracle=_mmr_oracle(_MMR_NQ, _MMR_POOL, _MMR_K))
def mmr_rerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified re-ranking (Carbonell & Goldstein 1998): greedy
    λ·rel − (1−λ)·max-sim-to-selected over a top-20 candidate pool,
    λ=0.7 as the integer pair (7,3) over micro-unit cosines so the
    whole greedy trajectory is integer-exact and DuckDB replays all 5
    steps as unrolled CTEs. Distributed work is the pool retrieval and
    the pool's pairwise similarities; the selection runs on the
    collected head (bounded by construction — operators/rerank.py)."""
    from dawis_spark.operators.rerank import mmr_rerank

    emb = spark.table("embeddings")
    return mmr_rerank(
        spark,
        corpus=emb,
        queries=emb.filter(F.col("vec_id") < _MMR_NQ),
        id_col="vec_id",
        vec_col="embedding",
        k=_MMR_K,
        n_pool=_MMR_POOL,
    ).orderBy("query_id", "rank")


def _mmr_eval_oracle(n_queries: int, n_pool: int, k: int) -> str:
    return (
        "WITH "
        + _mmr_base_ctes(n_queries, n_pool)
        + ",\n"
        + _mmr_step_ctes(k)
        + f"""
, mmr AS (SELECT query_id, did FROM sel{k}),
topk AS (SELECT query_id, did, rel_micro FROM pool WHERE rnk <= {k}),
tp AS (SELECT p.query_id, CAST(SUM(p.sim_micro) AS BIGINT) AS pairsim FROM pp0 p
       JOIN topk x ON x.query_id = p.query_id AND x.did = p.a
       JOIN topk y ON y.query_id = p.query_id AND y.did = p.b
       GROUP BY p.query_id),
mp AS (SELECT p.query_id, CAST(SUM(p.sim_micro) AS BIGINT) AS pairsim FROM pp0 p
       JOIN mmr x ON x.query_id = p.query_id AND x.did = p.a
       JOIN mmr y ON y.query_id = p.query_id AND y.did = p.b
       GROUP BY p.query_id),
tr AS (SELECT query_id, CAST(SUM(rel_micro) AS BIGINT) AS rel FROM topk GROUP BY query_id),
mr AS (SELECT p.query_id, CAST(SUM(p.rel_micro) AS BIGINT) AS rel FROM pool p
       JOIN mmr m ON m.query_id = p.query_id AND m.did = p.did GROUP BY p.query_id)
SELECT tr.query_id, tr.rel AS topk_rel_sum, mr.rel AS mmr_rel_sum,
       tp.pairsim AS topk_pairsim_sum, mp.pairsim AS mmr_pairsim_sum,
       CAST(tp.pairsim - mp.pairsim AS BIGINT) AS diversity_gain
FROM tr JOIN mr ON tr.query_id = mr.query_id
JOIN tp ON tp.query_id = tr.query_id
JOIN mp ON mp.query_id = tr.query_id
ORDER BY tr.query_id"""
    )


@query("mmr_diversity_eval", oracle=_mmr_eval_oracle(_MMR_NQ, _MMR_POOL, _MMR_K))
def mmr_diversity_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-eval for mmr_rerank: per query, summed relevance and summed
    pairwise intra-set similarity of the plain top-5 vs the MMR-5
    (all integer micro-units). diversity_gain = how much intra-set
    redundancy MMR removed; the relevance columns price what it cost.
    The standing discipline: every re-ranking/approximate component
    ships with the query that measures its trade."""
    from dawis_spark.operators.rerank import mmr_pool_pairs, mmr_rerank

    from dawis_spark.operators.similarity import brute_force_topk

    emb = spark.table("embeddings")
    queries_df = emb.filter(F.col("vec_id") < _MMR_NQ)
    # ONE persisted brute-force pool + ONE persisted pairs relation
    # (r15): `ranked` feeds the pool (both pairs-hydration legs + the
    # mmr relevance join), the top-k subset (pairsum a/b legs + the
    # relevance sum) AND, via the new mmr_rerank pool/pairs parameters,
    # the greedy selection's two driver collects — before, each consumer
    # re-ran the corpus x queries brute-force cosine scan end-to-end
    # (~8 evaluations per pass). Both relations are head-sized
    # (n_queries x pool and n_queries x pool^2/2).
    ranked = brute_force_topk(
        corpus=emb, queries=queries_df, id_col="vec_id", vec_col="embedding",
        k=_MMR_POOL,
    ).select(
        "query_id",
        F.col("neighbor_id").alias("did"),
        F.col("rank").alias("rnk"),
        F.expr("cast(round(cosine * 1000000, 0) as bigint)").alias("rel_micro"),
    ).persist()
    pool = ranked.select("query_id", "did", "rel_micro")
    pairs = mmr_pool_pairs(pool, emb, "vec_id", "embedding").persist()
    mmr = mmr_rerank(
        spark, emb, queries_df, "vec_id", "embedding", k=_MMR_K,
        n_pool=_MMR_POOL, pool=pool, pairs=pairs,
    ).select("query_id", "did")
    topk = ranked.filter(F.col("rnk") <= _MMR_K).select(
        "query_id", "did", "rel_micro"
    )

    def pairsum(sel):
        return (
            pairs.join(
                sel.select("query_id", F.col("did").alias("a")), ["query_id", "a"]
            )
            .join(sel.select("query_id", F.col("did").alias("b")), ["query_id", "b"])
            .groupBy("query_id")
            .agg(F.sum("sim_micro").cast("bigint").alias("pairsim"))
        )

    tp = pairsum(topk).withColumnRenamed("pairsim", "topk_pairsim_sum")
    mp = pairsum(mmr).withColumnRenamed("pairsim", "mmr_pairsim_sum")
    tr = topk.groupBy("query_id").agg(
        F.sum("rel_micro").cast("bigint").alias("topk_rel_sum")
    )
    mr = (
        pool.join(mmr, ["query_id", "did"])
        .groupBy("query_id")
        .agg(F.sum("rel_micro").cast("bigint").alias("mmr_rel_sum"))
    )
    return (
        tr.join(mr, "query_id")
        .join(tp, "query_id")
        .join(mp, "query_id")
        .withColumn(
            "diversity_gain",
            (F.col("topk_pairsim_sum") - F.col("mmr_pairsim_sum")).cast("bigint"),
        )
        .orderBy("query_id")
    )


_PPS_SCALE = 2100  # ppm per token; 2100 = 2^2*3*5^2*7 — 3 and 7 never divide 2e12, so round(1e12/pi) cannot land on an exact .5


def _pps_w(dialect: str) -> str:
    fn = "size" if dialect == "spark" else "len"
    return f"cast({fn}({_TXT.tokens('text', dialect)}) as bigint)"


def _pps_sample_oracle() -> str:
    from dawis_spark.operators.sketches import pps_oracle_sample_sql

    inner = pps_oracle_sample_sql("documents", "doc_id", _pps_w("duck"), _PPS_SCALE)
    return f"""
SELECT doc_id, CAST(w AS BIGINT) AS n_tokens, pi_ppm, ht_micro
FROM ({inner}) ORDER BY doc_id
"""


@query("pps_weighted_sample", oracle=_pps_sample_oracle())
def pps_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size document sampling (pi = token
    count x 700ppm, capped at 1): hash-defined inclusion — reproducible,
    coordinated, refresh-stable — with the integer-ppm pi and micro-unit
    Horvitz-Thompson reweight computed inside the scan (zero shuffle
    before the display sort). The weighted counterpart of the uniform
    hash-Bernoulli sampler; in a quality pipeline the weight column is
    the quality/importance score instead of size."""
    from dawis_spark.operators.sketches import pps_sample

    docs = spark.table("documents").select(
        "doc_id", F.expr(_pps_w("spark")).alias("n_tokens")
    )
    return pps_sample(docs, "doc_id", "n_tokens", _PPS_SCALE).select(
        "doc_id", "n_tokens", "pi_ppm", "ht_micro"
    ).orderBy("doc_id")


def _pps_totals_oracle() -> str:
    from dawis_spark.operators.sketches import pps_oracle_sample_sql

    inner = pps_oracle_sample_sql("documents", "doc_id", _pps_w("duck"), _PPS_SCALE)
    return f"""
WITH s AS ({inner}),
e AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM({_pps_w('duck')}) AS BIGINT) AS total_tokens
      FROM documents),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS sample_docs,
             CAST(SUM(ht_micro) AS BIGINT) AS est_docs_micro,
             CAST(SUM(w * ht_micro) AS BIGINT) AS est_tokens_micro
      FROM s)
SELECT e.n_docs, e.total_tokens, m.sample_docs, m.est_docs_micro, m.est_tokens_micro,
       ROUND((m.est_docs_micro / 1000000.0 - e.n_docs) / e.n_docs, 4) AS err_docs,
       ROUND((m.est_tokens_micro / 1000000.0 - e.total_tokens) / e.total_tokens, 4) AS err_tokens
FROM e, m
"""


@query("pps_ht_totals", oracle=_pps_totals_oracle())
def pps_ht_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-eval for pps_weighted_sample: Horvitz-Thompson estimates of
    the document and token totals from the weighted sample, against the
    exact full-scan totals, with realized relative errors. The token
    total rides on the size-proportional design (big docs near-certain),
    so err_tokens should sit well inside err_docs — the property pps
    exists to buy."""
    from dawis_spark.operators.sketches import pps_sample

    docs = spark.table("documents").select(
        "doc_id", F.expr(_pps_w("spark")).alias("n_tokens")
    )
    e = docs.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )
    m = pps_sample(docs, "doc_id", "n_tokens", _PPS_SCALE).agg(
        F.count("*").cast("bigint").alias("sample_docs"),
        F.sum("ht_micro").cast("bigint").alias("est_docs_micro"),
        F.sum(F.col("n_tokens") * F.col("ht_micro"))
        .cast("bigint")
        .alias("est_tokens_micro"),
    )
    return e.crossJoin(m).select(
        "n_docs",
        "total_tokens",
        "sample_docs",
        "est_docs_micro",
        "est_tokens_micro",
        F.round(
            (F.col("est_docs_micro") / 1000000.0 - F.col("n_docs"))
            / F.col("n_docs"),
            4,
        ).alias("err_docs"),
        F.round(
            (F.col("est_tokens_micro") / 1000000.0 - F.col("total_tokens"))
            / F.col("total_tokens"),
            4,
        ).alias("err_tokens"),
    )


def _hll_oracle() -> str:
    from dawis_spark.operators.sketches import hll_oracle_sql

    inner = hll_oracle_sql("events", "event_id", numeric=True).strip()
    return f"""
WITH h AS ({inner}),
e AS (SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_exact FROM events)
SELECT e.n_exact, h.v_empty, h.s_scaled, h.est_raw, h.method, h.est,
       ROUND((h.est - e.n_exact) / e.n_exact, 4) AS rel_err
FROM e, h
"""


@query("hll_distinct_events", oracle=_hll_oracle())
def hll_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct count (Flajolet et al. 2007) made
    engine-exact: salted uniformized hashes, rho as the STRING length of
    the minimal binary rendering (integer in both engines), the harmonic
    denominator kept as the exact dyadic integer sum 2^(25-rho), and one
    final literal/int division — the construction that retires the KMV
    section's 'HLL hangs on float log2' objection. Exchange carries at
    most 64 (register, partial-max) rows per task; partial max IS the
    sketch union, so shard merge is free. Regime-complete (VERDICT r8
    #5): the estimator auto-dispatches to the Whang et al. linear-
    counting branch (raw est <= 2.5m with empty registers) — m*ln(m/v)
    over the FINITE v_empty domain {1..64} rendered as 64 shared decimal
    literals, so the correction adds no transcendental to either engine.
    The `method` column records the regime taken; here (600k distinct at
    sf0.1) it's 'raw', and the small-range fixture test exercises
    'linear'. Self-eval inline: exact distinct vs estimate (expected
    |err| ~ 1.04/sqrt(64) = 13%)."""
    from dawis_spark.operators.sketches import hll_estimate, hll_registers

    ev = spark.table("events")
    est = hll_estimate(hll_registers(ev, "event_id", numeric=True))
    exact = ev.agg(F.countDistinct("event_id").cast("bigint").alias("n_exact"))
    return exact.crossJoin(est).select(
        "n_exact",
        "v_empty",
        "s_scaled",
        "est_raw",
        "method",
        "est",
        F.round((F.col("est") - F.col("n_exact")) / F.col("n_exact"), 4).alias(
            "rel_err"
        ),
    )


_FUNNEL_STEPS_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1
    AND e.ts <= v.t1 + INTERVAL 7 DAY
  GROUP BY e.user_id),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
    AND e.ts <= c.t2 + INTERVAL 7 DAY
  GROUP BY e.user_id)
SELECT
  CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS users_view,
  CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS users_click,
  CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS users_purchase,
  ROUND(CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
        / (SELECT COUNT(*) FROM v), 4) AS conv_view_click,
  ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
        / (SELECT COUNT(*) FROM c), 4) AS conv_click_purchase,
  ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
        / (SELECT COUNT(*) FROM v), 4) AS conv_total
"""


@query("funnel_conversion", oracle=_FUNNEL_STEPS_SQL)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict ordered funnel (view -> click -> purchase, each step within
    7 days of the previous step's FIRST occurrence) — the standard
    product-analytics sequence query the reference's marketing warehouse
    domain lives on. Three per-user MIN aggregations chained by
    co-partitioned user_id joins: every exchange hashes on user_id, so
    AQE coalesces them onto one partitioning; the per-step relations
    shrink monotonically (each join's right side is the previous step's
    survivors). No window sort, no per-user event arrays — at 100 TB the
    plan is 3 partial-agg scans + 2 shrinking hash joins.

    Distinct from funnel_view_click_purchase (the FIRST-TOUCH form: one
    conditional-MIN pass, order checked by comparing first-touch times,
    no step windows): this is the strict sequential-within-window
    semantics product analytics defaults to — a click only counts after
    the first view AND within its 7-day window, and the purchase clock
    restarts from that click.

    r15: the SQL form's six scalar subqueries re-derived the v/c/p step
    chains end-to-end (36 scans in the plan — each COUNT re-ran its
    step's whole join chain). The steps are now built once each as
    persisted user-keyed relations (the same monotonically-shrinking
    aggregates the docstring describes) and the one-row counts read off
    them; expressions are the oracle SQL's verbatim, so the six output
    values are identical."""
    e = spark.table("events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .persist()
    )
    c = (
        e.join(v, "user_id")
        .filter(
            (F.col("event_type") == "click")
            & (F.col("ts") > F.col("t1"))
            & F.expr("ts <= t1 + INTERVAL 7 DAY")
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .persist()
    )
    p = (
        e.join(c, "user_id")
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t2"))
            & F.expr("ts <= t2 + INTERVAL 7 DAY")
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
        .persist()
    )
    nv = v.agg(F.count(F.lit(1)).alias("nv"))
    nc = c.agg(F.count(F.lit(1)).alias("nc"))
    np_ = p.agg(F.count(F.lit(1)).alias("np"))
    return (
        nv.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(np_))
        .selectExpr(
            "CAST(nv AS BIGINT) AS users_view",
            "CAST(nc AS BIGINT) AS users_click",
            "CAST(np AS BIGINT) AS users_purchase",
            "ROUND(CAST(nc AS DOUBLE) / nv, 4) AS conv_view_click",
            "ROUND(CAST(np AS DOUBLE) / nc, 4) AS conv_click_purchase",
            "ROUND(CAST(np AS DOUBLE) / nv, 4) AS conv_total",
        )
    )


def _cohort_oracle() -> str:
    return """
WITH first_seen AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
  FROM events),
cohort_size AS (
  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_users
  FROM first_seen GROUP BY cohort_week),
m AS (
  SELECT f.cohort_week,
         CAST(date_diff('day', f.cohort_week, a.active_week) / 7 AS INT) AS week_offset,
         CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS active_users
  FROM first_seen f JOIN activity a ON f.user_id = a.user_id
  GROUP BY 1, 2)
SELECT m.cohort_week, m.week_offset, m.active_users, s.cohort_users,
       ROUND(CAST(m.active_users AS DOUBLE) / s.cohort_users, 4) AS retention
FROM m JOIN cohort_size s ON m.cohort_week = s.cohort_week
ORDER BY m.cohort_week, m.week_offset
"""


@query("cohort_retention", oracle=_cohort_oracle())
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix with RATE normalization — extends
    weekly_retention_cohorts (offset x count only) with per-cohort sizes
    and retention fractions, the form dashboards consume. Shapes: first-seen and the distinct (user, week)
    activity relation each shuffle once on user_id (co-partitioned for
    the join); the retention matrix itself is weeks x weeks — tiny. The
    count-distinct in the matrix agg is exact; at extreme user
    cardinality the KMV/HLL sketches in operators/sketches.py are the
    drop-in approximate form."""
    e = spark.table("events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    cohort_size = first_seen.groupBy("cohort_week").agg(
        F.count("*").cast("bigint").alias("cohort_users")
    )
    m = (
        first_seen.join(activity, "user_id")
        .select(
            "cohort_week",
            (
                F.datediff(
                    F.col("active_week").cast("date"),
                    F.col("cohort_week").cast("date"),
                )
                / 7
            )
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").cast("bigint").alias("active_users"))
    )
    return (
        m.join(cohort_size, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "active_users",
            "cohort_users",
            F.round(F.col("active_users") / F.col("cohort_users"), 4).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


# --- journey whale policy (operators/journeys.py whale guard) -------------
#
# Every per-user sequence window below (event_transitions,
# frequent_event_sequences, session_entry_exit_bounce,
# markov_next_event_accuracy) routes through the whale guard: users
# holding > 0.8% of ALL events (exact integer share test,
# c * 1000 > total * 8) are flagged by a broadcast whale set — bounded
# at 125 keys by the share itself — and EXCLUDED from the
# Window.partitionBy(user_id) path sort; every guarded query carries
# the excluded-key count as an ``n_whales`` audit column so the
# exclusion is observable. At 100 TB this keeps one bot/sentinel key
# from single-tasking the journey window (SCALE.md zipf rehearsal).
_WHALE_SHARE = (8, 1000)

_WG_CTES = f"""wg_counts AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1),
wg_tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM wg_counts),
wg_whales AS (SELECT user_id FROM wg_counts, wg_tot
              WHERE c * {_WHALE_SHARE[1]} > t * {_WHALE_SHARE[0]}),
wg_nw AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_whales FROM wg_whales),
kept_events AS (
  SELECT e.* FROM events e
  WHERE NOT EXISTS (SELECT 1 FROM wg_whales w WHERE w.user_id = e.user_id))"""


def _guarded_events(spark: SparkSession):
    """(kept, nw): events minus whale users, plus the 1-row n_whales
    audit relation — the Spark twin of _WG_CTES. The whale set (≤ 125
    keys by the share bound) is computed in ONE counting scan and
    persisted, so the guard costs exactly one map-side count aggregate
    + one broadcast anti-join on top of whatever the consumer does."""
    from dawis_spark.operators.journeys import whale_guard, whale_keys

    e = spark.table("events")
    whales = whale_keys(e, ["user_id"], max_share=_WHALE_SHARE).persist()
    nw = whales.agg(F.count(F.lit(1)).cast("bigint").alias("n_whales"))
    kept = whale_guard(e, ["user_id"], whales=whales).filter(~F.col("is_whale"))
    return kept, nw


def _with_whale_audit(result: DataFrame, nw: DataFrame) -> DataFrame:
    """``result`` with ``n_whales`` on every row — via a LEFT join FROM
    the 1-row audit relation, so an all-whale corpus (result empty)
    still yields ONE row of NULL measures + the whale count instead of
    an empty relation (the audit must not vanish exactly when the guard
    filtered everything). ``result`` is always a type-cardinality-
    bounded aggregate here, so broadcasting it is free."""
    return nw.join(F.broadcast(result), F.lit(True), "left").select(
        *result.columns, "n_whales"
    )


_TRANSITIONS_SQL = f"""
WITH {_WG_CTES},
ordered AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM kept_events),
pairs AS (
  SELECT event_type AS src, next_type AS dst, CAST(COUNT(*) AS BIGINT) AS n
  FROM ordered WHERE next_type IS NOT NULL
  GROUP BY src, dst),
outdeg AS (
  SELECT src, CAST(SUM(n) AS BIGINT) AS total FROM pairs GROUP BY src)
SELECT q.src, q.dst, q.n, q.prob, wg_nw.n_whales
FROM wg_nw LEFT JOIN (
  SELECT p.src, p.dst, p.n, ROUND(CAST(p.n AS DOUBLE) / o.total, 4) AS prob
  FROM pairs p JOIN outdeg o ON p.src = o.src) q ON TRUE
ORDER BY q.src, q.dst
"""


@query("event_transitions", oracle=_TRANSITIONS_SQL)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event paths:
    lead() within (user_id ORDER BY ts, event_id) pairs each event with
    its successor, then (src, dst) counts normalize by source out-degree.
    ONE shuffle moves event rows (the user_id window — carrying only
    (user, type, ts)); everything after is event-type-cardinality-sized.
    The deterministic event_id tie-break makes simultaneous-timestamp
    paths replayable. The classic clickstream/path-analysis query of the
    reference's web-analytics domain (GA behavior flow).

    Guarded: whale users (> 0.8% of all events) are excluded from the
    path sort by the broadcast whale guard and reported via the
    n_whales audit column — see _WHALE_SHARE above."""
    from pyspark.sql import Window

    kept, nw = _guarded_events(spark)
    e = kept.select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("next_type").alias("dst"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    # out-degree as a window over the (src, dst) relation itself: no join
    # and — crucially — no second evaluation of the event-path subtree
    # (a groupBy-then-join-back would recompute the user window at scale)
    total = F.sum("n").over(Window.partitionBy("src"))
    trans = pairs.select(
        "src",
        "dst",
        "n",
        F.round(F.col("n") / total, 4).alias("prob"),
    )
    return _with_whale_audit(trans, nw).orderBy("src", "dst")


_GAPFILL_INTERP_ORACLE = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day, ROUND(SUM(value), 2) AS total
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT user_id, MIN(day) AS b0, MAX(day) AS b1 FROM daily GROUP BY 1),
spine AS (
  SELECT user_id, UNNEST(generate_series(b0, b1, INTERVAL 1 DAY)) AS day
  FROM bounds
),
j AS (
  SELECT s.user_id, s.day, d.total
  FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
),
w AS (
  SELECT user_id, day, total,
    last_value(total IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
    last_value(CASE WHEN total IS NOT NULL THEN day END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_b,
    first_value(total IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY day
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
    first_value(CASE WHEN total IS NOT NULL THEN day END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY day
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_b
  FROM j
)
SELECT user_id, day, total,
  CASE WHEN total IS NOT NULL THEN ROUND(total, 4)
       WHEN next_v IS NULL THEN ROUND(prev_v, 4)
       ELSE ROUND(prev_v + (next_v - prev_v)
                  * date_diff('day', prev_b, day)
                  / date_diff('day', prev_b, next_b), 4)
  END AS filled,
  total IS NULL AS is_gap
FROM w ORDER BY user_id, day
"""


@query("gapfill_interp_user_value", oracle=_GAPFILL_INTERP_ORACLE)
def gapfill_interp_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily spine with LINEAR interpolation across interior
    gaps (trailing gaps carry forward) — the interpolate() companion to
    gapfill_daily_user_value's LOCF. The fill is one fixed-order
    multiply-divide over exact integer day offsets, rounded once:
    engine-exact without accumulation-order hazards."""
    from dawis_spark.operators.gapfill import gapfill_interp

    daily = (
        spark.table("events")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    return gapfill_interp(daily, ["user_id"], "day", "total").orderBy(
        "user_id", "day"
    )


from dawis_spark.operators import journeys as _journeys  # noqa: E402


@query(
    "position_attribution",
    oracle=_journeys.attribution_oracle_sql("purchase"),
)
def position_attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped multi-touch attribution: each purchase's value is split
    40/20/40 across the first/middle/last touches of the journey that
    closed with it (the standard position-based model in GA/attribution
    reporting — the multi-touch extension of asof_last_click). Credits
    are exact BIGINT cent-ppm micro-units (flooring remainder pinned to
    the first touch), so the engines agree to the bit and the only float
    op is the display division. One user-hashed exchange builds journey
    indices; the purchase<->touch join is co-keyed on (user, journey);
    the output aggregate is event-type-sized."""
    return _journeys.position_attribution(
        spark.table("events"), "purchase"
    ).orderBy("touch_type")


_SEQ_GUARDED = _journeys.sequences_oracle_sql(
    3, 25, source="kept_events", prelude=_WG_CTES
)
# wrap: top-25 relation x the whale audit (all-whale corpus -> one
# NULL-measure row carrying n_whales, same as the other guarded queries)
_SEQ_ORACLE = f"""
WITH q AS ({_SEQ_GUARDED}),
{_WG_CTES}
SELECT q.seq, q.support, q.share, wg_nw.n_whales
FROM wg_nw LEFT JOIN q ON TRUE
ORDER BY q.support DESC, q.seq
"""


@query("frequent_event_sequences", oracle=_SEQ_ORACLE)
def frequent_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-3 consecutive event-type path mining (the PrefixSpan k=3
    slice): per-user lead() pairs inside ONE user-hashed window exchange,
    then a |types|^3-key support aggregate with a global-share column.
    Deterministic (support DESC, seq) top-25. The 'what happens right
    before an error/purchase' query of behavior-flow analytics.

    Guarded: whale users (> 0.8% of all events, _WHALE_SHARE) are
    excluded from the path window; n_whales audits the exclusion."""
    from dawis_spark.plans.bounded import register_bounded

    register_bounded(
        "frequent_event_sequences",
        "category-domain",
        "share over the |event_types|^3 sequence relation",
        n_windows=1,
    )

    kept, nw = _guarded_events(spark)
    seqs = _journeys.frequent_sequences(kept, 3, 25)
    return _with_whale_audit(seqs, nw).orderBy(F.desc("support"), "seq")


from dawis_spark.operators import profile as _profile  # noqa: E402

_PROFILE_COLS = ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]


@query(
    "column_stats_profile",
    oracle=_profile.profile_oracle_sql("lineitem", _PROFILE_COLS),
)
def column_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column statistics (rows, nulls, exact NDV, min,
    max, mean) over the lineitem measures in one unpivot + aggregate —
    the stats block data-quality rules and the CBO consume. Values snap
    to integer cents so the mean is exact-int / exact-int: one ordered
    division, bit-stable across engines. Scale: one scan, |cols| agg
    keys; NDV is the exact two-phase plan (KMV/HLL in
    operators/sketches.py are the sketch form at extreme cardinality)."""
    return _profile.column_profile(spark.table("lineitem"), _PROFILE_COLS)


@query(
    "feature_correlations",
    oracle=_profile.pearson_oracle_sql("lineitem", _PROFILE_COLS),
)
def feature_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the lineitem measures in
    ONE moment-aggregate scan (map-side partials, zero keyed shuffle) —
    feature screening for the logreg/classifier family. Integer-cent
    moments are carried as DECIMAL(38,0)/HUGEINT so n*Sxy - Sx*Sy is
    EXACT; the only floats are correctly-rounded int->double casts, IEEE
    sqrt, and one division — engines agree to the bit (contrast: naive
    CORR() is accumulation-order-dependent)."""
    return _profile.pearson_matrix(spark.table("lineitem"), _PROFILE_COLS)


from dawis_spark.operators import cooccur as _cooccur  # noqa: E402

_ITEM_SPARK = "cast(get_json_object(props, '$.k') as int)"
_ITEM_DUCK = "CAST(json_extract_string(props, '$.k') AS INT)"


@query(
    "item_cooccurrence_topk",
    oracle=_cooccur.cooccurrence_oracle_sql(_ITEM_DUCK, 5, 128, 2),
)
def item_cooccurrence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering over the events stream's JSON
    item attribute (get_json_object — the §2.8 JSON surface in a data
    plane): distinct (user, item) baskets -> within-user pairs ->
    co-user counts -> cosine co/sqrt(n_i*n_j) -> deterministic top-5
    neighbors per item. Oversized baskets (> 128 items) are dropped
    before pairing — the standard quadratic-blowup guard, replayed in
    the oracle. Cosine is exact-int / (IEEE sqrt x IEEE sqrt): bit-stable
    across engines. Post-pairing everything is item-catalog-sized."""
    return _cooccur.cooccurrence_topk(
        spark.table("events"), _ITEM_SPARK, 5, 128, 2
    )


def _containment_oracle(
    shingle_k: int, df_cap: int, min_inter: int, min_cont: float, top: int
) -> str:
    sh = _TXT.shingle_hashes("text", shingle_k, "duck")
    return f"""
WITH sh AS (
  SELECT doc_id, UNNEST({sh}) AS h FROM documents
  WHERE len({sh}) > 0),
rare AS (SELECT h FROM sh GROUP BY h HAVING COUNT(*) <= {df_cap}),
p AS (SELECT sh.doc_id, sh.h FROM sh JOIN rare USING (h)),
fsz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM p GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM p a JOIN p b ON a.h = b.h AND a.doc_id <> b.doc_id
  GROUP BY 1, 2 HAVING COUNT(*) >= {min_inter})
SELECT i.id_a, i.id_b, i.inter,
       ROUND(CAST(i.inter AS DOUBLE) / s.sz, 6) AS containment
FROM inter i JOIN fsz s ON i.id_a = s.doc_id
WHERE CAST(i.inter AS DOUBLE) / s.sz >= {min_cont}
ORDER BY containment DESC, id_a, id_b LIMIT {top}
"""


@query(
    "containment_near_dups",
    oracle=_containment_oracle(3, 20, 5, 0.6, 100),
)
def containment_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup C(A->B) = |S_A n S_B| / |S_A|: finds
    docs EMBEDDED in larger ones, which symmetric Jaccard union-washes
    out. Stop-shingles (document frequency > 20) are dropped before the
    postings self-join — the df-cap quadratic guard, applied identically
    to numerators and denominators and replayed in the oracle. Postings
    carry hashes only; per-shingle join fanout is <= df_cap^2."""
    from dawis_spark.operators.dedup import containment_pairs

    return containment_pairs(
        spark.table("documents"), "doc_id", "text", 3, 20, 5, 0.6, 100
    )


def _coreset_oracle(kc: int, m: int, dim: int) -> str:
    cos_vc = _VEC.cosine_null("vec", "cvec", "duck")
    return f"""
WITH {_kmeans_c1_ctes(kc, dim)},
aff AS (
  SELECT v.vec_id, cent.cid,
         coalesce(ROUND({cos_vc}, 6), -2.0) AS aff
  FROM v, (SELECT cid, cvec FROM c1) cent(cid, cvec)),
best AS (
  SELECT vec_id, cid, aff FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY aff DESC, cid) AS r
    FROM aff) WHERE r = 1),
ranked AS (
  SELECT CAST(cid AS INT) AS cell, vec_id, aff AS centrality,
         CAST(row_number() OVER (PARTITION BY cid ORDER BY aff DESC, vec_id) AS INT) AS rank
  FROM best)
SELECT cell, vec_id, centrality, rank FROM ranked
WHERE rank <= {m} ORDER BY cell, rank
"""


