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


def test_tfidf_top_terms_rank_and_value(spark):
    import math

    from dawis_spark.operators.corpus import tfidf_top_terms

    df = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry"), (3, "cherry date")],
        "id bigint, text string",
    )
    out = tfidf_top_terms(df, "id", "text", k=1).collect()
    by_id = {r["id"]: r for r in out}
    # doc 1: apple tf=2, df=1 -> tfidf = 2*(ln(4/2)+1); banana tf=1, df=2
    assert by_id[1]["token"] == "apple"
    assert by_id[1]["tfidf"] == round(2 * (math.log(4 / 2) + 1), 6)
    assert all(r["term_rank"] == 1 for r in out)


def test_bm25_prefers_matching_docs_and_caps_topn(spark):
    from dawis_spark.operators.corpus import bm25_scores

    df = spark.createDataFrame(
        [(1, "spark spark spark"), (2, "spark other words"), (3, "none here")],
        "id bigint, text string",
    )
    out = bm25_scores(df, "id", "text", ["spark"], top_n=2).collect()
    # doc 3 has no query terms: absent; doc 1 outranks doc 2 (higher tf)
    assert [r["id"] for r in out] == [1, 2]
    assert out[0]["bm25"] > out[1]["bm25"] > 0


def test_bm25_multi_matches_per_query_scores(spark):
    """bm25_scores_multi (one shared postings pass) must return, per
    query, exactly what bm25_scores computes standalone — including a
    query whose terms overlap another's (shared df/tf rows) and one with
    zero matches."""
    from dawis_spark.operators.corpus import bm25_scores, bm25_scores_multi

    df = spark.createDataFrame(
        [
            (1, "spark spark fast engine"),
            (2, "spark other words"),
            (3, "fast words here"),
            (4, "none at all"),
        ],
        "id bigint, text string",
    )
    queries = [(1, ("spark", "fast")), (2, ("spark",)), (3, ("zzz",))]
    multi = bm25_scores_multi(df, "id", "text", queries, top_n=3)
    for qid, terms in queries:
        single = [
            (r["id"], r["bm25"])
            for r in bm25_scores(df, "id", "text", list(terms), top_n=3).collect()
        ]
        shared = [(r["id"], r["bm25"]) for r in multi[qid].collect()]
        assert shared == single, f"query {qid}: {shared} != {single}"


def test_keep_one_per_cluster_survivors(spark):
    from dawis_spark.operators.dedup import keep_one_per_cluster

    corpus = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id bigint")
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (5, 5), (6, 5)], "id bigint, cluster_id bigint"
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in keep_one_per_cluster(corpus, clusters, "doc_id").collect()
    }
    # one survivor per cluster (the min-id member) + unclustered doc 4
    assert out == {1: 1, 4: 4, 5: 5}


def test_corpus_filter_gates_and_dedup(spark):
    from dawis_spark.operators.corpus import corpus_filter

    en = (
        "the cat sat of the mat and it is a story to read in the house "
        "it is long enough to pass the token gate easily today"
    )
    rows = [
        (1, en, "a"),                          # kept
        (2, en, "b"),                          # exact dup of 1 -> dropped
        (3, "der hund und die katze und der vogel mit den tieren von hier "
            "und noch mehr der die das worte zu den satz", "a"),  # German
        (4, "xx yy zz", "a"),                  # too short
        (5, en + " extra tail words here", "a"),  # kept (distinct text)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = {
        r["doc_id"]: r
        for r in corpus_filter(
            df, "doc_id", "text", keep_lang="en", min_quality=0.4,
            min_tokens=10, extra_cols=("source",),
        ).collect()
    }
    assert set(out) == {1, 5}  # dup keeps lowest id; de + short rejected
    assert out[1]["lang_pred"] == "en" and out[1]["source"] == "a"
    assert out[1]["quality"] >= 0.4 and out[1]["n_tokens"] >= 10


def test_chunk_documents_windows_and_edges(spark):
    import pytest as _pytest

    from dawis_spark.operators.corpus import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame(
        [(1, text), (2, "a b"), (3, "")], "doc_id bigint, text string"
    )
    out = {
        (r["doc_id"], r["chunk_id"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=1).collect()
    }
    # doc 1: stride 3 -> offsets 0,3,6; the last window reaches w9, so
    # ceil((10-4)/3)+1 = 3 windows cover all tokens with no extra tail
    assert out[(1, 0)] == (4, "w0 w1 w2 w3")
    assert out[(1, 1)] == (4, "w3 w4 w5 w6")  # overlap of 1 token
    assert out[(1, 2)] == (4, "w6 w7 w8 w9")
    # short doc -> one window; empty doc -> one empty chunk, never zero rows
    assert out[(2, 0)] == (2, "a b")
    assert out[(3, 0)] == (0, "")
    assert len(out) == 5
    with _pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=4)


def test_phrase_query_positions_and_counts(spark):
    from dawis_spark.operators.corpus import (
        build_postings, phrase_query, phrase_term_hashes,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma x alpha beta gamma"),
            (2, "beta alpha gamma"),          # right bag, wrong order
            (3, "alpha beta delta"),          # prefix only
            (4, "z alpha beta gamma"),        # one match, offset 1
        ],
        "doc_id bigint, text string",
    )
    postings = build_postings(docs, "doc_id", "text")
    out = {
        r["doc_id"]: r
        for r in phrase_query(
            postings, "doc_id", phrase_term_hashes("alpha beta gamma")
        ).collect()
    }
    assert set(out) == {1, 4}
    assert (out[1]["n_matches"], out[1]["first_pos"]) == (2, 0)
    assert (out[4]["n_matches"], out[4]["first_pos"]) == (1, 1)


def test_phrase_query_repeated_term_in_phrase(spark):
    # "b a b" requires slot 0 and slot 2 to BOTH be witnessed by (possibly
    # different) occurrences of "b" — the count(DISTINCT i) guard.
    from dawis_spark.operators.corpus import (
        build_postings, phrase_query, phrase_term_hashes,
    )

    docs = spark.createDataFrame(
        [(1, "b a b"), (2, "b a c"), (3, "x b a b y")],
        "doc_id bigint, text string",
    )
    postings = build_postings(docs, "doc_id", "text")
    out = {
        r["doc_id"]: r
        for r in phrase_query(
            postings, "doc_id", phrase_term_hashes("b a b")
        ).collect()
    }
    assert set(out) == {1, 3}
    assert out[3]["first_pos"] == 1


def test_pmi_collocations_known_values(spark):
    import math

    from dawis_spark.operators.corpus import pmi_collocations

    # corpus: "new york" always together (3x), "the cat" chance-level.
    docs = spark.createDataFrame(
        [
            (1, "new york is big"),
            (2, "i love new york"),
            (3, "new york wins"),
            (4, "the cat sat"),
            (5, "the dog ran"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["bigram"]: r
        for r in pmi_collocations(docs, "text", min_count=2).collect()
    }
    assert "new york" in out
    r = out["new york"]
    # totals: n = 17 unigram slots, b = 12 bigram slots; c(new)=c(york)=3
    want = math.log((3 / 12) / ((3 / 17) * (3 / 17)))
    assert abs(r["pmi"] - round(want, 6)) < 1e-9
    assert r["c12"] == 3
    # pairs below min_count are cut
    assert "the cat" not in out


def test_source_js_divergence_known_values(spark):
    import math

    from dawis_spark.operators.corpus import source_js_divergence

    docs = spark.createDataFrame(
        [
            ("s1", 1, "a a b"),
            ("s2", 2, "a b b"),
            ("s3", 3, "a a b"),   # identical distribution to s1
        ],
        "source string, doc_id bigint, text string",
    )
    out = {
        (r["src_a"], r["src_b"]): r["js_div"]
        for r in source_js_divergence(docs, "source", "text").collect()
    }
    # identical distributions -> 0
    assert out[("s1", "s3")] == 0.0
    # s1 = (2/3, 1/3), s2 = (1/3, 2/3); mixtures are (1/2, 1/2):
    # JS = 0.5*[2/3 ln(4/3) + 1/3 ln(2/3)] * 2 (symmetric in a/b terms)
    p, q = 2 / 3, 1 / 3
    want = 0.5 * (
        p * math.log(2 * p / (p + q)) + q * math.log(2 * q / (p + q))
    ) + 0.5 * (
        q * math.log(2 * q / (q + p)) + p * math.log(2 * p / (q + p))
    )
    assert abs(out[("s1", "s2")] - round(want, 6)) < 1e-9


def test_source_js_divergence_disjoint_vocab_pair_absent(spark):
    # documented contract: a pair with no shared token does not appear
    # (its JS is exactly ln 2)
    from dawis_spark.operators.corpus import source_js_divergence

    docs = spark.createDataFrame(
        [("s1", 1, "x y"), ("s2", 2, "z w")],
        "source string, doc_id bigint, text string",
    )
    assert source_js_divergence(docs, "source", "text").count() == 0
