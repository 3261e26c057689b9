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
