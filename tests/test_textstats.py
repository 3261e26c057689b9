"""Text-analysis operators: language ID, quality, tokens, fingerprint."""

from dawis_spark.operators.textstats import (
    fingerprint,
    language_id,
    quality_score,
    token_counts,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id bigint, text string")


def test_language_id_argmax_and_und(spark):
    df = _df(
        spark,
        [
            (1, "the cat and the dog of a house"),
            (2, "el perro y la casa de los gatos"),
            (3, "zzz qqq www"),
        ],
    )
    out = {r["id"]: r["lang_pred"] for r in language_id(df, "id", "text").collect()}
    assert out == {1: "en", 2: "es", 3: "und"}


def test_quality_score_components(spark):
    df = _df(spark, [(1, "the data!!")])
    r = quality_score(df, "id", "text").first()
    assert r["n_tokens"] == 2
    assert r["n_chars_obs"] == 10
    assert r["punct_ratio"] == 0.2  # two '!' of 10 chars
    assert 0.0 < r["quality"] <= 1.0


def test_token_counts_ws_vs_bpe(spark):
    df = _df(spark, [(1, "hello world42 x-y")])
    r = token_counts(df, "id", "text").first()
    assert r["ws_tokens"] == 3
    # hello | world | 42 | x | - | y
    assert r["bpe_tokens"] == 6


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = _df(spark, [(1, "Hello  World"), (2, "hello world"), (3, "hello worlds")])
    out = {r["id"]: r["fingerprint"] for r in fingerprint(df, "id", "text").collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_fingerprint_vectorized_equals_expression(spark):
    df = _df(
        spark,
        [(1, "Hello  World"), (2, ""), (3, "x" * 3000), (4, "mixed 123 !?")],
    )
    from dawis_spark.operators.textstats import fingerprint as fp

    a = {r["id"]: r["fingerprint"] for r in fp(df, "id", "text", vectorized=True).collect()}
    b = {r["id"]: r["fingerprint"] for r in fp(df, "id", "text", vectorized=False).collect()}
    assert a == b
