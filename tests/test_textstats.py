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


def test_repetition_stats_hand_computed(spark):
    from dawis_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "x y z w")], "id bigint, text string"
    )
    out = {r["id"]: r for r in repetition_stats(df, "id", "text").collect()}
    # doc 1: tokens a,a,a,b -> dup 3/4, top 3/4; 2-grams "a a","a a","a b"
    # -> "a a" twice => dup_ngram 2/3
    assert out[1]["n_tokens"] == 4
    assert out[1]["dup_token_frac"] == 0.75
    assert out[1]["top_token_frac"] == 0.75
    assert out[1]["dup_ngram_frac"] == round(2 / 3, 6)
    # doc 2: all unique
    assert out[2]["dup_token_frac"] == 0.0
    assert out[2]["top_token_frac"] == 0.25
    assert out[2]["dup_ngram_frac"] == 0.0


def test_repetition_stats_short_doc_no_ngrams(spark):
    from dawis_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame([(1, "solo")], "id bigint, text string")
    row = repetition_stats(df, "id", "text").collect()[0]
    # one token, zero 2-grams: the guarded division yields 0, not an error
    assert row["n_tokens"] == 1 and row["dup_ngram_frac"] == 0.0


def test_line_quality_c4_rules(spark):
    from dawis_spark.operators.textstats import line_quality

    text = "good line here.\nshort.\nno punct at all\n\nanother fine line!"
    df = spark.createDataFrame([(1, text)], "id bigint, text string")
    row = line_quality(df, "id", "text").collect()[0]
    # blank line dropped; "short." fails min_words; "no punct..." fails punct
    assert row["n_lines"] == 4
    assert row["n_short_lines"] == 1
    assert row["n_unpunct_lines"] == 1
    assert row["n_kept_lines"] == 2
    assert row["kept_line_frac"] == 0.5


def test_token_entropy_known_values(spark):
    import math

    from dawis_spark.operators.textstats import token_entropy

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),        # uniform over 4: H = ln 4, norm = 1
            (2, "a a a a"),        # constant: H = 0, norm NULL
            (3, "a a b"),          # H = -(2/3 ln 2/3 + 1/3 ln 1/3)
            (4, ""),               # empty: H = 0, distinct 0, norm NULL
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in token_entropy(docs, "doc_id", "text").collect()}
    assert out[1]["entropy"] == round(math.log(4), 6)
    assert out[1]["norm_entropy"] == 1.0
    assert out[2]["entropy"] == 0.0 and out[2]["norm_entropy"] is None
    h3 = -(2 / 3 * math.log(2 / 3) + 1 / 3 * math.log(1 / 3))
    assert abs(out[3]["entropy"] - round(h3, 6)) < 1e-9
    assert out[3]["n_distinct"] == 2
    assert out[4]["entropy"] == 0.0 and out[4]["n_tokens"] == 0
