"""Round-8 additions: the NSW graph-ANN family (operators/nsw.py) and
the watermark-lateness equivalence for the streaming windowed aggs."""

from pyspark.sql import functions as F


def _toy_corpus(spark):
    # two tight clusters + one outlier; dim 4 keeps the kNN obvious
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0, 0.0]),
        (2, [0.98, 0.0, 0.01, 0.0]),
        (3, [0.97, 0.01, 0.01, 0.0]),
        (10, [0.0, 1.0, 0.0, 0.0]),
        (11, [0.0, 0.99, 0.01, 0.0]),
        (12, [0.0, 0.98, 0.0, 0.01]),
        (20, [0.0, 0.0, 0.0, 1.0]),
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_nsw_edges_are_symmetric_and_degree_bounded(spark):
    from dawis_spark.operators.nsw import nsw_edges
    from dawis_spark.operators.similarity import _ivf_assign, train_kmeans

    df = _toy_corpus(spark)
    cents = sorted(
        (int(c), list(v))
        for c, v in train_kmeans(df, "vec_id", "embedding", k=2, iterations=1)
    )
    assigned = _ivf_assign(df, "vec_id", "embedding", cents, "id", "vec", 1)
    edges = nsw_edges(assigned, m=2).collect()
    pairs = {(r["src"], r["dst"]) for r in edges}
    # symmetrized: every edge has its reverse
    assert all((d, s) in pairs for s, d in pairs)
    # no self loops
    assert all(s != d for s, d in pairs)
    # out-degree bounded by m + incoming symmetrization (<= 2m here,
    # and never more than cell size - 1)
    from collections import Counter

    deg = Counter(s for s, _ in pairs)
    assert max(deg.values()) <= 4


def test_nsw_finds_in_cluster_neighbors(spark):
    from dawis_spark.operators.nsw import nsw_ann_topk

    df = _toy_corpus(spark)
    out = nsw_ann_topk(
        df,
        df.filter(F.col("vec_id") == 0),
        "vec_id",
        "embedding",
        k=3,
        n_centroids=2,
        n_probe=2,
        m=2,
        beam=5,
        hops=2,
    ).collect()
    got = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    # the three cluster-mates of vector 0, nearest first
    assert got == [1, 3, 2] or set(got) == {1, 2, 3}
    # ranks contiguous from 1, cosines non-increasing
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3]
    cs = [r["cosine"] for r in sorted(out, key=lambda r: r["rank"])]
    assert cs == sorted(cs, reverse=True)


def test_nsw_empty_quantizer_returns_typed_empty(spark):
    from dawis_spark.operators.nsw import nsw_ann_topk

    df = _toy_corpus(spark).limit(0)
    out = nsw_ann_topk(
        df, df, "vec_id", "embedding", k=3, n_centroids=2, centroids=[]
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id",
        "neighbor_id",
        "cosine",
        "rank",
    ]


def test_nsw_deterministic_across_partitionings(spark):
    from dawis_spark.operators.nsw import nsw_ann_topk

    df = _toy_corpus(spark)
    qs = df.filter(F.col("vec_id") < 11)

    def run(parts):
        out = nsw_ann_topk(
            df.repartition(parts),
            qs,
            "vec_id",
            "embedding",
            k=3,
            n_centroids=2,
            n_probe=2,
            m=2,
            beam=5,
            hops=2,
        ).collect()
        return sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in out)

    assert run(1) == run(7)
