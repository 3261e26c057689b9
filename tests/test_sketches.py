"""KMV distinct-count sketch: exact-below-k path, partition-layout
invariance (the k-smallest combine is associative), and estimator
quality on a larger synthetic cardinality."""

from pyspark.sql import functions as F


def _kmv(spark, n_values, n_rows_per, k, n_parts):
    from dawis_spark.operators.sketches import kmv_distinct

    df = (
        spark.range(n_values * n_rows_per)
        .select(
            F.lit("g").alias("grp"),
            (F.col("id") % n_values).alias("val"),
        )
        .repartition(n_parts)
    )
    return kmv_distinct(df, ["grp"], "val", k=k).collect()[0]


def test_kmv_exact_below_k(spark):
    row = _kmv(spark, n_values=40, n_rows_per=3, k=64, n_parts=8)
    # fewer distinct values than k: the sketch IS the exact distinct set
    assert row["n_kept"] == 40
    assert row["kth_hash"] is None
    assert row["estimate"] == 40.0


def test_kmv_partition_layout_invariant(spark):
    # k smallest of per-partition k-smallest == global k smallest, so the
    # result must not depend on how rows are scattered across tasks
    rows = [
        _kmv(spark, n_values=5000, n_rows_per=2, k=64, n_parts=p)
        for p in (1, 7, 32)
    ]
    assert len({r["kth_hash"] for r in rows}) == 1
    assert len({r["estimate"] for r in rows}) == 1


def test_kmv_estimate_quality(spark):
    # KMV standard error is ~1/sqrt(k); allow 4 sigma at k=64 (12.5%/σ)
    row = _kmv(spark, n_values=5000, n_rows_per=2, k=64, n_parts=16)
    assert row["n_kept"] == 64
    assert abs(row["estimate"] - 5000) / 5000 < 0.5


def test_kmv_set_ops_exact_when_sets_small(spark):
    # both sketches exhaustive (sets < k): every figure is exact
    from dawis_spark.operators.sketches import kmv_set_ops, kmv_sets

    rows = [("a", v) for v in range(10)] + [("b", v) for v in range(5, 20)]
    df = spark.createDataFrame(rows, "grp string, val int")
    sk = kmv_sets(df, ["grp"], "val", k=64)
    a = sk.filter("grp = 'a'").select(F.col("hs").alias("hs_a"))
    b = sk.filter("grp = 'b'").select(F.col("hs").alias("hs_b"))
    out = kmv_set_ops(a.crossJoin(b), "hs_a", "hs_b", 64).collect()[0]
    # |A|=10, |B|=15, inter {5..9} = 5, union = 20
    assert out["est_union"] == 20.0
    assert out["est_intersection"] == 5.0
    assert out["est_jaccard"] == 0.25


def test_weighted_sketch_builds_match_per_occurrence(spark):
    """cm_sketch/cs_sketch built from a pre-counted (value, count)
    relation must be cell-for-cell identical to the per-occurrence
    build: a value's d (row, bucket, sign) cells depend only on the
    value, so sum(weight) == count of occurrences and
    sum(sign * weight) == sum of per-occurrence signs (the r15
    one-tokenize-pass rewrite of the heavy-hitter queries rides this)."""
    from dawis_spark.operators.sketches import cm_sketch, cs_sketch

    rows = [(f"v{i % 17}",) for i in range(300) for _ in range(i % 7 + 1)]
    df = spark.createDataFrame(rows, ["v"]).repartition(5)
    counts = df.groupBy("v").agg(F.count(F.lit(1)).alias("n"))

    occ_cm = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cm_sketch(df, "v", d=4, w=64).collect()
    }
    wt_cm = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cm_sketch(counts, "v", d=4, w=64, weight_col="n").collect()
    }
    assert occ_cm == wt_cm

    occ_cs = {
        (r["row"], r["bucket"]): r["ssum"]
        for r in cs_sketch(df, "v", d=5, w=64).collect()
    }
    wt_cs = {
        (r["row"], r["bucket"]): r["ssum"]
        for r in cs_sketch(counts, "v", d=5, w=64, weight_col="n").collect()
    }
    assert occ_cs == wt_cs
