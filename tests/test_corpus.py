"""Corpus ops: vocabulary, packing, decontamination on tiny fixtures."""

from dawis_spark.operators.corpus import (
    benchmark_contamination,
    pack_documents,
    token_document_frequency,
)


def test_token_document_frequency_counts_docs_not_occurrences(spark):
    df = spark.createDataFrame(
        [(1, "spark spark spark joins"), (2, "spark shuffles"), (3, "parquet")],
        "id bigint, text string",
    )
    out = {r["token"]: r["doc_freq"] for r in
           token_document_frequency(df, "id", "text").collect()}
    assert out["spark"] == 2  # repeated within doc 1 counts once
    assert out["joins"] == 1 and out["parquet"] == 1


def test_pack_documents_budget_boundaries(spark):
    # 3-token docs, budget 5: starting offsets 0,3,6,9 -> shards 0,0,1,1
    rows = [(i, "a b c", "s") for i in range(4)]
    df = spark.createDataFrame(rows, "id bigint, text string, src string")
    out = {r["id"]: r["shard_id"] for r in
           pack_documents(df, "id", "text", "src", 5).collect()}
    assert out == {0: 0, 1: 0, 2: 1, 3: 1}
    # independent streams per partition key
    rows += [(10, "a b c", "other")]
    df2 = spark.createDataFrame(rows, "id bigint, text string, src string")
    out2 = {r["id"]: r["shard_id"] for r in
            pack_documents(df2, "id", "text", "src", 5).collect()}
    assert out2[10] == 0


def test_benchmark_contamination_counts_shared_shingles(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "id bigint, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox sleeps"),  # shares 2 of its 3-grams
            (2, "completely different words here"),
        ],
        "id bigint, text string",
    )
    out = {r["id"]: r["shared_shingles"] for r in
           benchmark_contamination(corpus, bench, "id", "text", 3).collect()}
    assert out == {1: 2}  # clean doc 2 absent


def test_hash_split_stable_under_corpus_growth(spark):
    from dawis_spark.operators.corpus import hash_split

    w = {"train": 0.9, "val": 0.05, "test": 0.05}
    small = spark.createDataFrame([(i,) for i in range(50)], "id bigint")
    big = spark.createDataFrame([(i,) for i in range(200)], "id bigint")
    s = {r["id"]: r["split"] for r in hash_split(small, "id", w).collect()}
    b = {r["id"]: r["split"] for r in hash_split(big, "id", w).collect()}
    assert all(b[i] == s[i] for i in s)  # membership never re-rolls
    assert set(b.values()) == {"train", "val", "test"}
    # salt re-rolls assignments
    s2 = {r["id"]: r["split"] for r in hash_split(small, "id", w, salt="v2").collect()}
    assert s2 != s


def test_stratified_sample_deterministic_n_per_group(spark):
    from dawis_spark.operators.corpus import stratified_sample

    rows = [(i, "g%d" % (i % 3)) for i in range(30)]
    df = spark.createDataFrame(rows, "id bigint, grp string")
    a = sorted((r["grp"], r["id"]) for r in stratified_sample(df, "grp", "id", 4).collect())
    b = sorted((r["grp"], r["id"]) for r in stratified_sample(df, "grp", "id", 4).collect())
    assert a == b and len(a) == 12
    from collections import Counter

    assert set(Counter(g for g, _ in a).values()) == {4}
