"""Parameterized SQL runner, column mapping, warehouse, idempotent append."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from dawis_spark.catalog import Warehouse
from dawis_spark.operators.idempotent import idempotent_append
from dawis_spark.plans.column_mapping import apply_column_mapping
from dawis_spark.plans.sql_runner import resolve_parameters, run_query


def test_resolve_date_days_ago():
    out = resolve_parameters(
        {"d": {"dateDaysAgo": 3}, "s": "x", "n": 7}, today=dt.date(2024, 1, 10)
    )
    assert out == {"d": dt.date(2024, 1, 7), "s": "x", "n": 7}


def test_resolve_rejects_unknown_dynamic():
    with pytest.raises(ValueError):
        resolve_parameters({"d": {"weeksAgo": 1}})


def test_run_query_binds_typed_params(spark):
    spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string").createOrReplaceTempView(
        "t_rq"
    )
    out = run_query(spark, "SELECT id FROM t_rq WHERE s = :v", {"v": "b"}).collect()
    assert [r["id"] for r in out] == [2]


def test_column_mapping_flat_nested_array(spark):
    df = spark.createDataFrame(
        [(1, ("x", 2), [("y", 3)])],
        "a int, st struct<f1:string,f2:int>, arr array<struct<g1:string,g2:int>>",
    )
    out = apply_column_mapping(df, {"a": "A", "st.f1": "renamed", "arr.g1": "h1"})
    assert out.columns == ["A", "st", "arr"]
    assert out.schema["st"].dataType.fieldNames() == ["renamed", "f2"]
    assert out.schema["arr"].dataType.elementType.fieldNames() == ["h1", "g2"]
    row = out.first()
    assert row["st"]["renamed"] == "x" and row["arr"][0]["h1"] == "y"


def test_column_mapping_rejects_deep_paths(spark):
    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(ValueError):
        apply_column_mapping(df, {"a.b.c": "x"})


def test_warehouse_roundtrip_partitioned(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    df = spark.createDataFrame(
        [("2024-01-01", 1), ("2024-01-02", 2)], "date string, v int"
    )
    wh.write(df, "facts", partition_by=["date"])
    assert wh.exists("facts")
    assert wh.read("facts").count() == 2
    # append disposition
    wh.write(df.filter(F.col("v") == 1), "facts", partition_by=["date"])
    assert wh.read("facts").count() == 3
    # truncate disposition
    wh.write(df, "facts", mode="overwrite", partition_by=["date"])
    assert wh.read("facts").count() == 2


def test_idempotent_append_skips_existing_slices(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    batch = spark.createDataFrame(
        [("p1", "2024-01-01", 1.0), ("p1", "2024-01-01", 2.0)],
        "property string, date string, v double",
    )
    n1 = idempotent_append(spark, batch, path, ["property", "date"])
    assert n1 == 2
    # re-running the same import is a no-op (P12 skip-if-present)
    n2 = idempotent_append(spark, batch, path, ["property", "date"])
    assert n2 == 0
    # a new slice still lands
    batch2 = spark.createDataFrame(
        [("p1", "2024-01-02", 3.0)], "property string, date string, v double"
    )
    assert idempotent_append(spark, batch2, path, ["property", "date"]) == 1
    assert spark.read.parquet(path).count() == 3


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    orders = spark.range(0, 1000).selectExpr("id AS o_key", "id % 7 AS o_val")
    items = spark.range(0, 3000).selectExpr("id % 1000 AS i_key", "id AS i_val")
    wh.write_bucketed(orders, "b_orders", ["o_key"], 4)
    wh.write_bucketed(items, "b_items", ["i_key"], 4)
    # model a large-large join: broadcast would hide the bucketing benefit
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b_orders")
            .join(
                spark.table("b_items"),
                F.col("o_key") == F.col("i_key"),
            )
            .groupBy("o_val")
            .count()
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must not introduce a shuffle: both sides are
        # co-bucketed on the key (only the final groupBy may exchange)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning(o_key" not in plan
        assert "Exchange hashpartitioning(i_key" not in plan
        assert joined.count() == 7
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_items")


def test_write_sorted_files_cover_disjoint_ranges(spark, tmp_path):
    """Range-partitioned sorted writes give parquet files DISJOINT min/max
    ranges on the sort key — footer stats alone let selective scans skip
    whole files (the data-skipping layout for 100 TB fact tables)."""
    import glob

    import pyarrow.parquet as pq

    from dawis_spark.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path))
    df = spark.range(0, 10000).selectExpr(
        "id", "cast(id % 97 as double) as v"
    ).orderBy(F.expr("rand(7)"))  # scrambled input
    wh.write_sorted(df, "facts_sorted", ["id"], num_files=4)

    ranges = []
    for f in glob.glob(str(tmp_path / "facts_sorted" / "*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # id is the first column
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) == 4
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # files never overlap on the sort key
    # data intact
    assert wh.read("facts_sorted").count() == 10000


def test_compact_merges_small_files(spark, tmp_path):
    import glob

    from dawis_spark.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path))
    # accrete 12 tiny appends (cron micro-batch pattern)
    for i in range(12):
        wh.write(
            spark.range(i * 10, (i + 1) * 10).selectExpr("id", "id * 2 as v"),
            "accreted",
        )
    files_pattern = str(tmp_path / "accreted" / "**" / "*.parquet")
    n_files = len(glob.glob(files_pattern, recursive=True))
    assert n_files >= 12
    before_rows = sorted(r["id"] for r in wh.read("accreted").collect())

    n_before, n_after = wh.compact("accreted")
    assert n_before == n_files and n_after < n_before
    assert sorted(r["id"] for r in wh.read("accreted").collect()) == before_rows


def test_compact_preserves_hive_partitions(spark, tmp_path):
    import glob

    from dawis_spark.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path))
    for i in range(6):
        wh.write(
            spark.range(i * 10, (i + 1) * 10).selectExpr(
                "id", "cast(id % 2 as int) as day"
            ),
            "parts",
            partition_by=["day"],
        )
    n_before, n_after = wh.compact("parts")
    assert n_after < n_before
    # partition dirs survive and data is intact per partition
    dirs = {p.split("=")[1] for p in glob.glob(str(tmp_path / "parts" / "day=*"))}
    assert dirs == {"0", "1"}
    out = wh.read("parts")
    assert out.filter("day = 0").count() + out.filter("day = 1").count() == 60


def test_incremental_rollup_matches_full_recompute(spark, tmp_path):
    """Three arbitrary batch splits merged incrementally equal one full
    aggregation — the re-aggregatability invariant, plus replace()'s
    self-read safety (tick N reads the table tick N writes)."""
    from dawis_spark.catalog import Warehouse
    from dawis_spark.operators.rollup import update_rollup

    wh = Warehouse(spark, str(tmp_path))
    facts = spark.range(0, 300).selectExpr(
        "cast(id % 7 as string) as k", "cast(id as double) as v", "id"
    )
    measures = {
        "n": ("sum", F.count(F.lit(1)).cast("bigint")),
        "v_sum": ("sum", F.sum(F.col("v").cast("decimal(18,6)"))),
        "v_max": ("max", F.max("v")),
    }
    for m in range(3):
        merged = update_rollup(
            wh, "r", facts.filter(f"id % 3 = {m}"), ["k"], measures
        )
    got = {
        r["k"]: (r["n"], float(r["v_sum"]), r["v_max"])
        for r in merged.collect()
    }
    want = {
        r["k"]: (r["n"], float(r["v_sum"]), r["v_max"])
        for r in facts.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("v").cast("decimal(18,6)")).alias("v_sum"),
            F.max("v").alias("v_max"),
        )
        .collect()
    }
    assert got == want and len(got) == 7


def test_load_table_events_ts_is_timezone_independent(spark):
    """load_table pins the session timezone before the LTZ->NTZ cast, so a
    caller who never goes through register_testdata (which also pins UTC)
    sees the same wall-clock values as the UTC oracle."""
    from dawis_spark.catalog import load_table

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.exists(os.path.join(sf_dir, "events.parquet")):
        pytest.skip("testdata not present")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        shifted = load_table(spark, sf_dir, "events").agg(
            F.min("ts").alias("lo"), F.max("ts").alias("hi")
        ).collect()[0]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    utc = load_table(spark, sf_dir, "events").agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    spark.conf.set("spark.sql.session.timeZone", prev)
    assert (shifted.lo, shifted.hi) == (utc.lo, utc.hi)


def test_write_zordered_prunes_both_dimensions(spark, tmp_path):
    """Z-order vs lexicographic on a 2-d grid: after write_sorted([x, y])
    every file spans the FULL y range (filtering on y skips nothing),
    while write_zordered([x, y]) gives files compact in BOTH dimensions —
    a selective y filter prunes most files from footer stats alone."""
    import glob

    import pyarrow.parquet as pq

    from dawis_spark.catalog import Warehouse

    def file_ranges(root, col_name):
        out = []
        for f in glob.glob(f"{root}/*.parquet"):
            md = pq.ParquetFile(f)
            ci = md.schema_arrow.names.index(col_name)
            mins, maxs = [], []
            for rg in range(md.metadata.num_row_groups):
                st = md.metadata.row_group(rg).column(ci).statistics
                mins.append(st.min)
                maxs.append(st.max)
            out.append((min(mins), max(maxs)))
        return out

    wh = Warehouse(spark, str(tmp_path))
    # 128x128 grid, scrambled arrival order
    grid = spark.range(128 * 128).selectExpr(
        "cast(id % 128 as int) as x", "cast(id div 128 as int) as y"
    ).orderBy(F.expr("rand(11)"))
    wh.write_sorted(grid, "lex", ["x", "y"], num_files=16)
    wh.write_zordered(grid, "zord", ["x", "y"], bits=4, num_files=16)

    def overlapping(ranges, lo, hi):
        return sum(1 for mn, mx in ranges if not (mx < lo or mn > hi))

    # selective filter on y (the SECOND sort column): 8/128 of the domain
    lex_hit = overlapping(file_ranges(str(tmp_path / "lex"), "y"), 0, 7)
    z_hit = overlapping(file_ranges(str(tmp_path / "zord"), "y"), 0, 7)
    assert lex_hit == 16  # lexicographic: every file spans all of y
    assert z_hit <= 8  # z-order: footer stats prune most files on y
    # and x-pruning is preserved under z-order too
    zx_hit = overlapping(file_ranges(str(tmp_path / "zord"), "x"), 0, 7)
    assert zx_hit <= 8
    # data intact
    assert wh.read("zord").count() == 128 * 128
