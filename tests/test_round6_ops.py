"""Round-6 operators: mixture weights, URL canonicalization,
SemDeDup semantic dedup, filtered top-k."""

import duckdb
from pyspark.sql import functions as F


def test_mixture_weights_values(spark):
    from dawis_spark.operators.corpus import mixture_weights

    # three sources, char masses 100 / 400 / 2500 -> sqrt masses 10/20/50,
    # z = 80 -> weights .125/.25/.625, budgets 125/250/625 of 1000
    rows = [("a", 60), ("a", 40), ("b", 400), ("c", 2500)]
    df = spark.createDataFrame(rows, "source string, n_chars bigint")
    out = {
        r["source"]: r
        for r in mixture_weights(
            df, "source", "n_chars", alpha=0.5, total_budget=1000
        ).collect()
    }
    assert out["a"]["mass"] == 100 and out["a"]["weight"] == 0.125
    assert out["b"]["weight"] == 0.25 and out["b"]["budget_docs"] == 250
    assert out["c"]["weight"] == 0.625 and out["c"]["budget_docs"] == 625
    # weights sum to 1 (exactly representable here)
    assert sum(r["weight"] for r in out.values()) == 1.0


def test_canonical_url_spark_duck_parity(spark):
    from dawis_spark.functions.urls import canonical_url_sql

    urls = [
        "HTTP://www.Ex.COM/A/b/?utm_source=x&z=1&a=2#frag",
        "https://ex.com/A/b?a=2&z=1",
        "https://www.ex.com/",  # root: trailing slash stripped to bare host
        "http://ex.com",  # no path, no query
        "https://ex.com/p?utm_a=1&utm_b=2",  # all params tracking
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got_spark = [
        r["c"]
        for r in df.select(
            F.expr(canonical_url_sql("url", "spark")).alias("c")
        ).collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute(
            "WITH u AS (SELECT ? AS url) "
            f"SELECT {canonical_url_sql('url', 'duck')} FROM u",
            [u],
        ).fetchone()[0]
        for u in urls
    ]
    assert got_spark == got_duck
    assert got_spark[0] == "https://ex.com/A/b?a=2&z=1"
    assert got_spark[0] == got_spark[1]  # variants collapse
    assert got_spark[2] == "https://ex.com"
    assert got_spark[3] == "https://ex.com"
    assert got_spark[4] == "https://ex.com/p"


def test_semantic_dedup_marks_lowest_id_survivor(spark):
    from dawis_spark.operators.similarity import semantic_dedup

    # two tight direction-clusters in 4-d; within each, every later vector
    # is a near-dup of the first (cosine ~1), across clusters cosine ~0
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.99, 0.01, 0.0, 0.0]),
        (3, [0.98, 0.0, 0.01, 0.0]),
        (10, [0.0, 1.0, 0.0, 0.0]),
        (11, [0.0, 0.99, 0.01, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(
            df, "vec_id", "embedding", k=2, threshold=0.9, max_block_rows=10
        ).collect()
    }
    assert out == {1: True, 2: False, 3: False, 10: True, 11: False}


def test_filtered_topk_only_searches_filtered_corpus(spark):
    from dawis_spark.operators.similarity import brute_force_topk

    rows = [
        (0, [1.0, 0.0], 1),
        (1, [0.9, 0.1], 2),  # closest overall but label 2 -> excluded
        (2, [0.5, 0.5], 1),
        (3, [0.0, 1.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    out = brute_force_topk(
        corpus=df.filter(F.col("label") == 1),
        queries=df.filter(F.col("vec_id") == 0),
        id_col="vec_id",
        vec_col="embedding",
        k=2,
    ).collect()
    assert [r["neighbor_id"] for r in out] == [2, 3]
