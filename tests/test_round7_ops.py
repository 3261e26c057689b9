"""Round-7 fixes and operators: semantic_dedup dim forwarding + empty
guard (ADVICE r6), composed filtered ANN, Bloom runtime join pruning,
SQ8 scalar quantization, integer PageRank, deterministic hash samples
(rank quantiles incl. the distributed-selection exact path, coordinated
AQP joins), hashed-feature classifier, SCD2 maintenance."""

from pyspark.sql import functions as F


def test_semantic_dedup_forwards_dim_to_lsh_path(spark):
    # ADVICE r6: with max_block_rows below the cluster size the in-cell
    # pairs route through sign-LSH, which previously hard-coded dim=64 —
    # every plane folded over NULL elements for a 4-d corpus and all rows
    # collapsed into one bucket. With dim forwarded, the LSH path still
    # separates the two tight clusters and finds the in-cluster dups.
    from dawis_spark.operators.similarity import semantic_dedup

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
            df,
            "vec_id",
            "embedding",
            k=2,
            threshold=0.9,
            max_block_rows=1,  # force the LSH overflow path
            dim=4,
            n_planes=2,
        ).collect()
    }
    # same-direction vectors share every sign bit, so LSH buckets keep
    # the in-cluster pairs together: later ids are still marked dups
    assert out[1] is True and out[10] is True
    assert out[2] is False and out[3] is False and out[11] is False


def test_semantic_dedup_empty_corpus_returns_empty(spark):
    from dawis_spark.operators.similarity import semantic_dedup

    df = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    out = semantic_dedup(df, "vec_id", "embedding", k=4)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["vec_id", "cid", "keep"]


# --- Bloom-filter runtime join pruning (operators/bloomjoin.py) ----------

def _bloom_parts(spark):
    from dawis_spark.operators.bloomjoin import bloom_build, bloom_probe

    keys = spark.createDataFrame([(k,) for k in (3, 17, 42)], "k bigint")
    fact = spark.createDataFrame(
        [(i, i % 7) for i in range(500)], "id bigint, k bigint"
    )
    return keys, fact, bloom_build, bloom_probe


def test_bloom_probe_has_no_false_negatives(spark):
    # Bloom membership is one-sided: every true match must pass, for any
    # (m, d) sizing — false positives are allowed, false negatives never.
    keys, fact, bloom_build, bloom_probe = _bloom_parts(spark)
    for m, d in ((16, 1), (64, 2), (8192, 3)):
        bloom = bloom_build(keys, "k", m=m, d=d)
        passed = {
            r["id"] for r in bloom_probe(fact, "k", bloom, m=m, d=d).collect()
        }
        true_ids = {r["id"] for r in fact.where("k = 3").collect()}
        assert true_ids <= passed, (m, d)


def test_bloom_probe_empty_keys_rejects_everything(spark):
    from dawis_spark.operators.bloomjoin import bloom_build, bloom_probe

    keys = spark.createDataFrame([], "k bigint")
    fact = spark.createDataFrame([(i, i) for i in range(20)], "id bigint, k bigint")
    bloom = bloom_build(keys, "k", m=64, d=2)
    assert bloom_probe(fact, "k", bloom, m=64, d=2).count() == 0


def test_bloom_probe_is_deterministic_and_selective(spark):
    # with a deployment-sized filter (many bits per key) the FP residue on
    # this small domain is empty: the probe equals the exact semi join;
    # and two runs agree bit-for-bit (deterministic hashing)
    keys, fact, bloom_build, bloom_probe = _bloom_parts(spark)
    bloom = bloom_build(keys, "k", m=8192, d=3)
    a = sorted(r["id"] for r in bloom_probe(fact, "k", bloom, m=8192, d=3).collect())
    b = sorted(r["id"] for r in bloom_probe(fact, "k", bloom, m=8192, d=3).collect())
    exact = sorted(r["id"] for r in fact.where("k = 3").collect())
    assert a == b == exact


# --- SQ8 scalar quantization (operators/similarity.py sq8_*) --------------

def test_sq8_roundtrip_error_bounded_by_half_level(spark):
    # reconstruction error of each component is at most half a level:
    # (hi - lo) / 255 / 2 — the defining property of uniform 8-bit SQ
    from dawis_spark.operators.similarity import (
        _sq8_decode_expr, sq8_encode, sq8_stats,
    )

    rows = [(i, [float(i) * 0.31 % 2.0 - 1.0, float(i * i % 17) / 17.0, 5.0])
            for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    stats = sq8_stats(df, "embedding", dim=3)
    codes = sq8_encode(df, "vec_id", "embedding", stats, dim=3)
    recon = codes.crossJoin(stats).selectExpr(
        "vec_id", _sq8_decode_expr("codes", 3, "spark") + " AS r"
    )
    joined = {r["vec_id"]: r["r"] for r in recon.collect()}
    lohi = stats.collect()[0]
    for vid, vec in rows:
        for i, x in enumerate(vec):
            span = lohi["hi"][i] - lohi["lo"][i]
            tol = span / 255.0 / 2.0 + 1e-12
            assert abs(joined[vid][i] - x) <= tol, (vid, i)


def test_sq8_degenerate_dimension_reconstructs_exactly(spark):
    # a constant dimension (hi == lo) must encode to 0 and decode to lo
    from dawis_spark.operators.similarity import (
        _sq8_decode_expr, sq8_encode, sq8_stats,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 7.5]), (2, [2.0, 7.5])], "vec_id bigint, embedding array<double>"
    )
    stats = sq8_stats(df, "embedding", dim=2)
    codes = sq8_encode(df, "vec_id", "embedding", stats, dim=2)
    vals = {r["vec_id"]: r["codes"] for r in codes.collect()}
    assert vals[1][1] == 0 and vals[2][1] == 0
    recon = codes.crossJoin(stats).selectExpr(
        "vec_id", _sq8_decode_expr("codes", 2, "spark") + " AS r"
    )
    for r in recon.collect():
        assert r["r"][1] == 7.5


# --- Fixed-iteration PageRank (operators/graph.py) ------------------------

def test_pagerank_mass_conserved_on_symmetric_graph(spark):
    # a symmetrized edge list has no dangling nodes, so total mass stays
    # SCALE up to integer-division rounding (< 1 ulp-of-SCALE per node
    # per iteration)
    from dawis_spark.operators.graph import SCALE, pagerank

    pairs = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs],
        "src bigint, dst bigint",
    )
    out = pagerank(edges, iterations=3).collect()
    total = sum(r["rank_scaled"] for r in out)
    assert abs(total - SCALE) < 3 * len(out) * 3  # n_nodes * iters slack
    # hub (node 3, degree 3) outranks the leaf (node 5, degree 1)
    ranks = {r["node"]: r["rank_scaled"] for r in out}
    assert ranks[3] > ranks[5]


def test_pagerank_is_partition_order_invariant(spark):
    # exact integer arithmetic: any physical layout gives bit-identical
    # ranks (the property float PageRank lacks)
    from dawis_spark.operators.graph import pagerank

    pairs = [(i, (i * 7 + 1) % 23) for i in range(60)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs],
        "src bigint, dst bigint",
    )
    a = {r["node"]: r["rank_scaled"]
         for r in pagerank(edges.repartition(1), iterations=2).collect()}
    b = {r["node"]: r["rank_scaled"]
         for r in pagerank(edges.repartition(17, "dst"), iterations=2).collect()}
    assert a == b


# --- Deterministic-sample quantiles (operators/sketches.py) ---------------

def test_rank_quantiles_known_values(spark):
    from dawis_spark.operators.sketches import rank_quantiles

    # 0..100 in one group: nearest-rank(lower) p50 -> rank 51 -> value 50
    df = spark.createDataFrame(
        [("g", float(i)) for i in range(101)], "k string, v double"
    )
    out = {r["pct"]: r["value"]
           for r in rank_quantiles(df, ["k"], "v", [0, 50, 99, 100]).collect()}
    assert out == {0: 0.0, 50: 50.0, 99: 99.0, 100: 100.0}


def test_hash_sample_is_layout_invariant_and_close_to_rate(spark):
    from dawis_spark.operators.sketches import hash_sample_pred
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i,) for i in range(20000)], "id bigint")
    pred = hash_sample_pred("id", 100000, "spark")  # 10%
    n1 = df.where(F.expr(pred)).count()
    n2 = df.repartition(13).where(F.expr(pred)).count()
    assert n1 == n2  # membership is a function of the data, not layout
    assert 0.08 < n1 / 20000 < 0.12  # realized rate near nominal


# --- Hashed-feature linear classifier (operators/classifier.py) -----------

def test_classifier_score_is_sum_of_token_bucket_weights(spark):
    from dawis_spark.operators.classifier import (
        classify, pseudo_weights, _bucket, _W_GEN,
    )
    from pyspark.sql import functions as F

    w = pseudo_weights(spark, 64)
    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, ""), (3, "gamma")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in
           classify(docs, "doc_id", "text", w, n_features=64).collect()}
    # hand-compute: bucket each token with the same exprs, index weights
    wlist = w.collect()[0]["w"]
    buckets = {
        r["t"]: r["b"]
        for r in spark.createDataFrame(
            [("alpha",), ("beta",), ("gamma",)], "t string"
        ).select("t", F.expr(_bucket("t", 64, "spark")).alias("b")).collect()
    }
    assert out[1]["score"] == 2 * wlist[buckets["alpha"]] + wlist[buckets["beta"]]
    assert out[1]["n_tokens"] == 3
    assert out[2]["n_tokens"] == 0 and out[2]["score"] == 0
    assert out[2]["mean_w"] is None
    assert out[3]["label"] == (wlist[buckets["gamma"]] > 0)


def test_classifier_weights_are_zero_mean_ish(spark):
    # the stand-in generator must not be degenerate (all-positive would
    # make the threshold label constant)
    from dawis_spark.operators.classifier import pseudo_weights

    wlist = pseudo_weights(spark, 4096).collect()[0]["w"]
    assert min(wlist) < -400 and max(wlist) > 400
    assert abs(sum(wlist)) / 4096 < 30


def test_coordinated_sample_keeps_whole_order_groups(spark):
    # join-synopses property: sampling BOTH sides by the same hash of the
    # join key keeps every child row of a sampled parent — the sampled
    # join equals the join of the full tables filtered by parent sample
    from dawis_spark.operators.sketches import hash_sample_pred
    from pyspark.sql import functions as F

    parents = spark.createDataFrame([(i,) for i in range(500)], "ok bigint")
    children = spark.createDataFrame(
        [(i, j) for i in range(500) for j in range(3)], "ok bigint, ln bigint"
    )
    pred_p = hash_sample_pred("ok", 200000, "spark")
    ps = parents.where(F.expr(pred_p))
    cs = children.where(F.expr(pred_p))
    joined = cs.join(ps, "ok")
    # every sampled parent contributes ALL 3 children
    per_parent = joined.groupBy("ok").count().collect()
    assert per_parent and all(r["count"] == 3 for r in per_parent)
    assert joined.count() == ps.count() * 3


# --- SCD2 dimension maintenance (operators/scd.py) ------------------------

def test_scd2_apply_close_insert_passthrough(spark):
    from dawis_spark.operators.scd import scd2_apply
    from pyspark.sql import functions as F

    cur = spark.createDataFrame(
        [
            (1, "A", "2024-01-01 00:00:00", None, True),
            (1, "OLD", "2023-01-01 00:00:00", "2024-01-01 00:00:00", False),
            (2, "B", "2024-01-01 00:00:00", None, True),
        ],
        "k bigint, attr string, valid_from string, valid_to string, is_current boolean",
    ).select(
        "k", "attr",
        F.to_timestamp("valid_from").alias("valid_from"),
        F.to_timestamp("valid_to").alias("valid_to"),
        "is_current",
    )
    upd = spark.createDataFrame(
        [(1, "A2"), (2, "B"), (3, "C")], "k bigint, attr string"
    )
    out = scd2_apply(cur, upd, ["k"], ["attr"], "2024-06-01 00:00:00")
    rows = sorted(
        ((r["k"], r["attr"], r["is_current"], r["valid_to"] is None)
         for r in out.collect())
    )
    assert rows == sorted([
        (1, "OLD", False, False),     # closed history untouched
        (1, "A", False, False),       # changed: closed at batch ts
        (1, "A2", True, True),        # changed: new open version
        (2, "B", True, True),         # unchanged: passes through open
        (3, "C", True, True),         # new key: inserted open
    ])
    # the closed A row carries the batch timestamp
    closed_a = [r for r in out.collect()
                if r["k"] == 1 and r["attr"] == "A" and not r["is_current"]][0]
    assert str(closed_a["valid_to"]).startswith("2024-06-01")


def test_scd2_apply_is_idempotent_on_reapply(spark):
    # re-applying the SAME update batch to the new state changes nothing
    # (the exactly-once property foreachBatch redelivery relies on)
    from dawis_spark.operators.scd import scd2_apply
    from pyspark.sql import functions as F

    cur = spark.createDataFrame(
        [(1, "A", "2024-01-01 00:00:00", None, True)],
        "k bigint, attr string, valid_from string, valid_to string, is_current boolean",
    ).select(
        "k", "attr",
        F.to_timestamp("valid_from").alias("valid_from"),
        F.to_timestamp("valid_to").alias("valid_to"),
        "is_current",
    )
    upd = spark.createDataFrame([(1, "A2")], "k bigint, attr string")
    once = scd2_apply(cur, upd, ["k"], ["attr"], "2024-06-01 00:00:00")
    twice = scd2_apply(once, upd, ["k"], ["attr"], "2024-06-01 00:00:00")
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b


def test_rank_quantiles_select_equals_window_form(spark):
    # the distributed-selection algorithm must return EXACTLY the same
    # nearest-rank values as the window implementation, including on
    # degenerate distributions (constant group, tiny group, heavy ties)
    from dawis_spark.operators.sketches import rank_quantiles, rank_quantiles_select

    rows = (
        [("a", float(i % 97) * 1.5) for i in range(2000)]     # heavy ties
        + [("b", 42.0)] * 50                                  # constant
        + [("c", float(i) ** 1.3 - 300.0) for i in range(333)]
        + [("d", 7.0)]                                        # single row
    )
    df = spark.createDataFrame(rows, "k string, v double").repartition(13)
    for pcts in ([50], [0, 25, 50, 75, 90, 99, 100]):
        a = sorted(map(tuple, rank_quantiles(df, ["k"], "v", pcts).collect()))
        b = sorted(map(tuple,
                       rank_quantiles_select(df, ["k"], "v", pcts,
                                             n_buckets=16).collect()))
        assert a == b, pcts


def test_scd2_apply_multi_key_multi_tracked(spark):
    from dawis_spark.operators.scd import scd2_apply
    from pyspark.sql import functions as F

    cur = spark.createDataFrame(
        [(1, "x", "A", 10, "2024-01-01 00:00:00", None, True),
         (1, "y", "B", 20, "2024-01-01 00:00:00", None, True)],
        "k1 bigint, k2 string, a string, b bigint, valid_from string, valid_to string, is_current boolean",
    ).select(
        "k1", "k2", "a", "b",
        F.to_timestamp("valid_from").alias("valid_from"),
        F.to_timestamp("valid_to").alias("valid_to"),
        "is_current",
    )
    upd = spark.createDataFrame(
        [(1, "x", "A", 11),   # b changed
         (1, "y", "B", 20)],  # unchanged
        "k1 bigint, k2 string, a string, b bigint",
    )
    out = scd2_apply(cur, upd, ["k1", "k2"], ["a", "b"], "2024-06-01 00:00:00")
    got = sorted((r["k2"], r["b"], r["is_current"]) for r in out.collect())
    assert got == [("x", 10, False), ("x", 11, True), ("y", 20, True)]


def test_prefix_filter_is_complete_vs_all_pairs(spark):
    # prefix filtering must find EVERY pair at/above the threshold —
    # equivalence against the brute-force all-pairs verify
    from dawis_spark.operators.dedup import prefix_filter_pairs
    from dawis_spark.functions import text as TXT
    from pyspark.sql import functions as F

    base = "the quick brown fox jumps over the lazy dog "
    rows = [
        (1, base * 3),
        (2, base * 3 + "and then some extra tail tokens here"),
        (3, "completely different words compose this one document body"),
        (4, base * 2 + "half related suffix material goes here now ok"),
        (5, "completely different words compose this one document text"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in prefix_filter_pairs(df, "doc_id", "text", 3, 3, 10).collect()
    }
    # brute force over the same shingle hashes
    sh = df.select(
        "doc_id", F.expr(TXT.shingle_hashes("text", 3, "spark")).alias("sh")
    ).filter(F.size("sh") > 0)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    jac = TXT.jaccard("sh_a", "sh_b", "spark")
    exact = {
        (r["id_a"], r["id_b"]): r["j"]
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(F.expr(jac), 6).alias("j"))
        .filter(F.col("j") >= 0.3)
        .collect()
    }
    assert got == exact and (1, 2) in got and (3, 5) in got


def test_refine_exact_over_full_pool_equals_brute_force(spark):
    # IndexRefineFlat contract: when the candidate pool contains every
    # (query, neighbor) pair, exact re-ranking IS brute force — same
    # neighbors, same exact cosines, same ranks.
    from dawis_spark.operators.similarity import brute_force_topk, refine_exact

    rows = [
        (i, [float((i * 7 + d * 3) % 11) for d in range(4)]) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    qs = df.filter(F.col("vec_id") < 2)
    pool = (
        qs.select(F.col("vec_id").alias("query_id"))
        .crossJoin(df.select(F.col("vec_id").alias("neighbor_id")))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    got = refine_exact(pool, df, qs, "vec_id", "embedding", k=3).collect()
    want = brute_force_topk(df, qs, "vec_id", "embedding", k=3).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_refine_exact_stays_inside_the_candidate_pool(spark):
    # The refine stage may only reorder the pool, never resurrect a
    # neighbor the first stage pruned.
    from dawis_spark.operators.similarity import refine_exact

    rows = [(i, [1.0, float(i)]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    qs = df.filter(F.col("vec_id") == 0)
    pool = spark.createDataFrame(
        [(0, 3), (0, 4)], "query_id bigint, neighbor_id bigint"
    )
    got = refine_exact(pool, df, qs, "vec_id", "embedding", k=5).collect()
    assert {r["neighbor_id"] for r in got} == {3, 4}
    assert [r["rank"] for r in sorted(got, key=lambda r: r["rank"])] == [1, 2]


def test_robust_zscores_known_values_and_flag(spark):
    # Series A: [10,10,10,10,100] -> median 10, adevs [0,0,0,0,90],
    # MAD = 0 ... that's the degenerate case; use a spread series instead:
    # [8,9,10,11,100]: median 10, adevs [2,1,0,1,90] -> MAD 1,
    # z(100) = 90/1.4826 = 60.7041, z(8) = -2/1.4826 = -1.349,
    # so only 100 flags at |z| > 3.
    from dawis_spark.operators.anomaly import robust_zscores

    rows = [("a", v) for v in (8, 9, 10, 11, 100)]
    df = spark.createDataFrame(rows, "k string, v bigint")
    out = {r["v"]: r for r in robust_zscores(df, ["k"], "v").collect()}
    assert out[100]["is_anomaly"] and not out[8]["is_anomaly"]
    assert abs(out[100]["robust_z"] - round(90 / 1.4826, 6)) < 1e-9
    assert abs(out[8]["robust_z"] - round(-2 / 1.4826, 6)) < 1e-9


def test_robust_zscores_mad_zero_group_never_flags(spark):
    # Over half the points identical -> MAD 0: z is NULL and the flag is
    # false for every row, including the wild outlier (documented
    # degenerate-baseline contract).
    from dawis_spark.operators.anomaly import robust_zscores

    rows = [("a", v) for v in (5, 5, 5, 5, 1000)]
    df = spark.createDataFrame(rows, "k string, v bigint")
    out = robust_zscores(df, ["k"], "v").collect()
    assert all(r["robust_z"] is None for r in out)
    assert all(r["is_anomaly"] is False for r in out)


def test_gapfill_locf_fills_and_flags_missing_buckets(spark):
    from datetime import datetime

    from dawis_spark.operators.gapfill import gapfill_locf

    rows = [
        ("a", datetime(2024, 1, 1), 10.0),
        ("a", datetime(2024, 1, 4), 40.0),   # 2nd+3rd missing
        ("b", datetime(2024, 1, 2), 7.0),    # single day: no gaps
    ]
    df = spark.createDataFrame(rows, "k string, day timestamp, v double")
    out = gapfill_locf(df, ["k"], "day", "v").orderBy("k", "day").collect()
    a = [r for r in out if r["k"] == "a"]
    assert [r["day"].day for r in a] == [1, 2, 3, 4]
    assert [r["is_gap"] for r in a] == [False, True, True, False]
    assert [r["filled"] for r in a] == [10.0, 10.0, 10.0, 40.0]
    assert [r["v"] for r in a] == [10.0, None, None, 40.0]
    b = [r for r in out if r["k"] == "b"]
    assert len(b) == 1 and not b[0]["is_gap"] and b[0]["filled"] == 7.0


def test_gapfill_locf_spine_is_per_key_not_global(spark):
    # Key spans must not leak into each other: a key active only in
    # March gets no January rows even though another key was.
    from datetime import datetime

    from dawis_spark.operators.gapfill import gapfill_locf

    rows = [
        ("jan", datetime(2024, 1, 1), 1.0),
        ("jan", datetime(2024, 1, 2), 2.0),
        ("mar", datetime(2024, 3, 9), 3.0),
    ]
    df = spark.createDataFrame(rows, "k string, day timestamp, v double")
    out = gapfill_locf(df, ["k"], "day", "v").collect()
    assert {(r["k"], r["day"].month) for r in out} == {("jan", 1), ("mar", 3)}
    assert len(out) == 3


def test_duplicated_spans_merges_maximal_run(spark):
    # Two docs share the 6-token run "a b c d e f"; with k=3 windows the
    # duplicated windows are positions 0..3 in doc 1 (offset 1 in doc 2)
    # and must merge into ONE maximal span of length 6, not four 3-token
    # spans.
    from dawis_spark.operators.dedup import duplicated_spans

    rows = [
        (1, "a b c d e f x y z"),
        (2, "q a b c d e f w"),
        (3, "totally different tokens here entirely now"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: r
        for r in duplicated_spans(df, "doc_id", "text", window_k=3).collect()
    }
    assert set(out) == {1, 2}
    assert (out[1]["span_start"], out[1]["span_end"], out[1]["n_windows"]) == (0, 6, 4)
    assert (out[2]["span_start"], out[2]["span_end"], out[2]["n_windows"]) == (1, 7, 4)


def test_duplicated_spans_counts_within_doc_repeats(spark):
    # A phrase repeated inside ONE doc is a duplicated span too (the
    # paper's suffix-array semantics), and disjoint repeats stay two
    # separate spans.
    from dawis_spark.operators.dedup import duplicated_spans

    rows = [(1, "x one two three a b c x one two three y")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = sorted(
        duplicated_spans(df, "doc_id", "text", window_k=3).collect(),
        key=lambda r: r["span_start"],
    )
    # "x one two three" repeats at offsets 0 and 7 -> windows {0,1} and
    # {7,8} duplicated, merged into two disjoint 4-token spans.
    assert len(out) == 2
    assert (out[0]["span_start"], out[0]["span_end"]) == (0, 4)
    assert (out[1]["span_start"], out[1]["span_end"]) == (7, 11)


def test_dsir_weights_rank_target_like_docs_higher(spark):
    # Raw docs that share the target's vocabulary must get a higher log
    # importance ratio than docs from a disjoint vocabulary.
    from dawis_spark.operators.dsir import dsir_scores, dsir_train

    tgt = spark.createDataFrame(
        [(100 + i, "physics quantum field theory lattice") for i in range(3)],
        "doc_id bigint, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "quantum field theory on the lattice"),
            (2, "cheap pills casino bonus click here"),
        ],
        "doc_id bigint, text string",
    )
    lam = dsir_train(tgt, raw, "text", m=256)
    out = {r["doc_id"]: r["log_ir"] for r in dsir_scores(raw, "doc_id", "text", lam, m=256).collect()}
    assert out[1] > out[2]


def test_dsir_empty_doc_scores_zero(spark):
    from dawis_spark.operators.dsir import dsir_scores

    raw = spark.createDataFrame([(1, "   ")], "doc_id bigint, text string")
    out = dsir_scores(raw, "doc_id", "text", [0.5] * 64, m=64).collect()
    assert out[0]["n_feats"] == 0 and out[0]["log_ir"] == 0.0


def test_trend_slopes_known_line_and_degenerates(spark):
    from dawis_spark.operators.anomaly import trend_slopes

    rows = (
        # exact line y = 3x + 7 -> slope 3, intercept 7, r2 = 1
        [("lin", x, 3 * x + 7) for x in range(6)]
        # flat series: slope 0; r2 is 0/0 -> NULL (no y variance)
        + [("flat", x, 42) for x in range(4)]
        # single point: slope undefined -> NULLs
        + [("one", 5, 9)]
    )
    df = spark.createDataFrame(rows, "k string, x int, y int")
    out = {r["k"]: r for r in trend_slopes(df, ["k"], "x", "y").collect()}
    assert out["lin"]["slope"] == 3.0
    assert out["lin"]["intercept"] == 7.0
    assert out["lin"]["r2"] == 1.0
    assert out["flat"]["slope"] == 0.0 and out["flat"]["r2"] is None
    assert out["one"]["slope"] is None and out["one"]["intercept"] is None


def test_scd2_asof_picks_version_in_effect(spark):
    from datetime import datetime

    from dawis_spark.operators.scd import scd2_asof

    rows = [
        # key 1: v1 [jan, mar), v2 [mar, open)
        (1, "v1", datetime(2024, 1, 1), datetime(2024, 3, 1), False),
        (1, "v2", datetime(2024, 3, 1), None, True),
        # key 2: born in april
        (2, "x", datetime(2024, 4, 1), None, True),
    ]
    dim = spark.createDataFrame(
        rows, "k bigint, v string, valid_from timestamp, valid_to timestamp, is_current boolean"
    )
    feb = {(r["k"], r["v"]) for r in scd2_asof(dim, "2024-02-15 00:00:00").collect()}
    assert feb == {(1, "v1")}  # key 2 not born yet; v2 not yet in effect
    may = {(r["k"], r["v"]) for r in scd2_asof(dim, "2024-05-01 00:00:00").collect()}
    assert may == {(1, "v2"), (2, "x")}
    # boundary: as-of exactly at a version switch takes the NEW version
    mar = {(r["k"], r["v"]) for r in scd2_asof(dim, "2024-03-01 00:00:00").collect()}
    assert mar == {(1, "v2")}


def test_seasonal_residual_flags_broken_phase_not_seasonal_shape(spark):
    import statistics

    from dawis_spark.operators.anomaly import seasonal_residual_zscores

    # weekly pattern (weekends 100, weekdays 10) + deterministic jitter,
    # over 4 weeks; one broken Wednesday (bucket 17: +45). Raw MAD
    # scoring would flag every weekend; seasonal differencing flags the
    # outage (17) and its phantom "recovery" one season later (24).
    def val(b):
        v = (100 if b % 7 in (5, 6) else 10) + (b * b) % 11 - 5
        return v + 45 if b == 17 else v

    rows = [("m", b, val(b)) for b in range(28)]
    df = spark.createDataFrame(rows, "k string, bucket int, v int")
    out = {r["bucket"]: r for r in
           seasonal_residual_zscores(df, ["k"], "bucket", "v", 7).collect()}
    # pure-python replica of the expected flags
    resid = {b: val(b) - val(b - 7) for b in range(7, 28)}
    med = statistics.median(resid.values())
    mad = statistics.median(abs(r - med) for r in resid.values())
    assert mad > 0  # jitter keeps the baseline non-degenerate
    want = {b for b, r in resid.items() if abs((r - med) / (1.4826 * mad)) > 3}
    assert {17, 24} <= want
    flagged = {b for b, r in out.items() if r["is_anomaly"]}
    assert flagged == want
    # warm-up rows carry no flag and NULL scores
    assert all(out[b]["robust_z"] is None and not out[b]["is_anomaly"]
               for b in range(7))


def test_maintain_join_view_equals_full_refresh(spark):
    from dawis_spark.operators.ivm import maintain_join_view

    dim0 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, attr string"
    )
    f0 = spark.createDataFrame([(10, 1), (11, 2)], "fid bigint, k bigint")
    view = f0.join(dim0, "k")
    # tick: append one fact, change dim key 2 -> "B"
    dim1 = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c")], "k bigint, attr string"
    )
    delta = spark.createDataFrame([(12, 2)], "fid bigint, k bigint")
    changed = spark.createDataFrame([(2,)], "k bigint")
    got = maintain_join_view(view, delta, dim1, changed, ["k"], ["attr"])
    want = f0.unionByName(delta).join(dim1, "k")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # the stale (11, 2, "b") row was retracted, not duplicated
    rows = [tuple(r) for r in got.collect() if r["fid"] == 11]
    assert rows == [(2, 11, "B")]


def test_mask_duplicated_spans_cuts_only_flagged_tokens(spark):
    from dawis_spark.operators.dedup import duplicated_spans, mask_duplicated_spans

    docs = spark.createDataFrame(
        [
            (1, "intro a b c d e f outro one"),
            (2, "pre a b c d e f post two"),
            (3, "nothing shared at all here friends"),
        ],
        "doc_id bigint, text string",
    )
    spans = duplicated_spans(docs, "doc_id", "text", window_k=3)
    out = {
        r["doc_id"]: r
        for r in mask_duplicated_spans(docs, spans, "doc_id", "text").collect()
    }
    # the shared 6-token run is cut; the unique frame survives
    assert out[1]["clean_text"] == "intro outro one"
    assert out[2]["clean_text"] == "pre post two"
    assert (out[1]["n_before"], out[1]["n_after"]) == (9, 3)
    # span-free docs pass through whole
    assert out[3]["clean_text"] == "nothing shared at all here friends"
    assert out[3]["n_before"] == out[3]["n_after"] == 6


def test_mask_duplicated_spans_full_duplicate_masks_to_empty(spark):
    from dawis_spark.operators.dedup import duplicated_spans, mask_duplicated_spans

    docs = spark.createDataFrame(
        [(1, "x y z w v u"), (2, "x y z w v u")],
        "doc_id bigint, text string",
    )
    spans = duplicated_spans(docs, "doc_id", "text", window_k=3)
    out = {r["doc_id"]: r for r in
           mask_duplicated_spans(docs, spans, "doc_id", "text").collect()}
    assert out[1]["n_after"] == 0 and out[1]["clean_text"] == ""
    assert out[2]["n_after"] == 0
