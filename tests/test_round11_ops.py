"""Round-11 operator tests: range_partitioned_ranks extensions (sum_col
running sums, NULL sort-key routing) and the journey whale guard."""

import random

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_range_partitioned_ranks_sum_col_matches_global_running_sum(spark):
    from dawis_spark.operators.sketches import range_partitioned_ranks

    rng = random.Random(11)
    rows = [(i, rng.choice([1, 2, 2, 3, 5, 5, 5, 900, 10**7])) for i in range(500)]
    df = spark.createDataFrame(rows, ["k", "v"]).repartition(7)
    for desc in (False, True):
        got = {
            r["k"]: (r["r"], r["cum"])
            for r in range_partitioned_ranks(
                df, "v", ["k"], desc=desc, n_buckets=16, out_col="r", sum_col="cum"
            ).collect()
        }
        order = [F.desc("v") if desc else F.asc("v"), F.asc("k")]
        w = Window.orderBy(*order)
        want = {
            r["k"]: (r["r"], r["cum"])
            for r in df.select(
                "k",
                F.row_number().over(w).alias("r"),
                F.sum("v")
                .over(w.rowsBetween(Window.unboundedPreceding, 0))
                .alias("cum"),
            ).collect()
        }
        assert got == want


def test_range_partitioned_ranks_null_values_match_window_null_order(spark):
    """ADVICE r10: NULL sort keys must land where Spark's window puts
    them — FIRST for ASC, LAST for DESC — not silently in bucket 0."""
    from dawis_spark.operators.sketches import range_partitioned_ranks

    rows = [(0, None), (1, 5), (2, None), (3, 1), (4, 9), (5, 1)]
    df = spark.createDataFrame(rows, "k int, v int").repartition(3)
    for desc in (False, True):
        got = {
            r["k"]: r["r"]
            for r in range_partitioned_ranks(
                df, "v", ["k"], desc=desc, n_buckets=4, out_col="r"
            ).collect()
        }
        order = [F.desc("v") if desc else F.asc("v"), F.asc("k")]
        want = {
            r["k"]: r["r"]
            for r in df.select(
                "k", F.row_number().over(Window.orderBy(*order)).alias("r")
            ).collect()
        }
        assert got == want, desc
