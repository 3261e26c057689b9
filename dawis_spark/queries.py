"""Query inventory — every operator family from SURVEY.md §2 expressed as a
``(spark, sf_dir) -> DataFrame`` callable plus a DuckDB-runnable oracle SQL.

Conventions (driver contract, __spark_entry__.py):
  - every computed column is aliased identically in Spark and oracle SQL;
  - float aggregates are rounded to a fixed precision on BOTH sides so the
    value-hash is insensitive to summation-order ulp differences;
  - date-ish outputs stay TIMESTAMP (never DATE) so pandas dtypes agree;
  - each query registers the testdata views itself (idempotent).

Scale notes are attached per query: the same plan must make sense at 100 TB
on a 1000-executor cluster, not just at sf0.01.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dawis_spark.catalog import register_testdata
from dawis_spark.plans.sql_runner import run_query

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            register_testdata(spark, sf_dir)
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


# ---------------------------------------------------------------------------
# Core relational spine (SURVEY §2.5 aggregations, §3.2 SQL-on-warehouse path)
# ---------------------------------------------------------------------------

_Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2)                                       AS sum_qty,
  ROUND(SUM(l_extendedprice), 2)                                  AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)               AS sum_disc_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  ROUND(AVG(l_quantity), 6)                                       AS avg_qty,
  ROUND(AVG(l_extendedprice), 6)                                  AS avg_price,
  ROUND(AVG(l_discount), 6)                                       AS avg_disc,
  COUNT(*)                                                        AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", oracle=_Q1_SQL)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape through the parameterized SQL runner (S9, §3.2).

    Scale: single scan of the fact table with the date predicate pushed to
    parquet; partial aggregation map-side; the groupBy key space is tiny
    (RF x LS = 6 groups) so the shuffle is negligible at any scale.
    """
    return run_query(
        spark,
        _Q1_SQL.replace("TIMESTAMP '2001-09-01 00:00:00'", ":cutoff"),
        parameters={"cutoff": "2001-09-01 00:00:00"},
    )


_Q3_SQL = """
SELECT
  l_orderkey,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q3_shipping_priority", oracle=_Q3_SQL)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact joins -> top-k (W3/W4).

    Scale: customer(filtered) is small relative to lineitem, AQE converts
    the first join to broadcast; the final ORDER BY ... LIMIT is a TakeOrdered,
    not a global sort.
    """
    c = spark.table("customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = spark.table("orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = spark.table("lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q5_SQL = """
SELECT
  n_name,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey  = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@query("q5_region_revenue", oracle=_Q5_SQL)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join through two tiny dims (broadcast) + facts.

    Scale: nation/region/supplier are classic broadcast dims (SURVEY §2.4:
    "broadcast hints for the small sides"); only orders x lineitem shuffles,
    on the join key both sides already share.
    """
    n = F.broadcast(spark.table("nation"))
    r = F.broadcast(spark.table("region").filter(F.col("r_name") == "EUROPE"))
    s = spark.table("supplier")
    c = spark.table("customer")
    o = spark.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = spark.table("lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )
