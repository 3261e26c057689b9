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
from dawis_spark.operators.similarity import TRAIN_SAMPLE_LIMIT
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


# ---------------------------------------------------------------------------
# dawis operator semantics (SURVEY §2.3-2.7): enrichment, checks, alerts,
# windows, previous-period join, set ops, column mapping, anti-join
# ---------------------------------------------------------------------------

_MATCH_ORACLE = r"""
SELECT
  p_partkey,
  p_name,
  CASE
    WHEN contains(p_name, 'gear') THEN 'tool'
    WHEN contains(p_name, 'nut') THEN 'fastener'
    WHEN contains(p_name, 'bolt') THEN 'fastener'
    WHEN regexp_matches(p_name, '(ring)') THEN 'ring_item'
    WHEN regexp_matches(p_name, '^(small|red) (\w+)$')
      THEN 'sz_' || regexp_extract(p_name, '^(small|red) (\w+)$', 2)
    ELSE 'other'
  END AS label
FROM part
ORDER BY p_partkey
"""


@query("match_enrichment", oracle=_MATCH_ORACLE)
def match_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3+P4+P5 (google_search_console.py op:335-386): ordered regex and
    CSV-contains expressions with last-write-wins overwrite + fallback.

    Scale: one map-side when-chain projection, zero shuffle; the pattern
    set is YAML/CSV config (tens of entries), folded into codegen.
    """
    from dawis_spark.operators.enrich import match_enrich

    expressions = [
        {"regex": r"^(small|red) (\w+)$", "output": "sz_$2"},
        {"regex": r"(ring)", "output": "ring_item"},
        {"csv": {"fastener": ["bolt", "nut"], "tool": ["gear"]}, "useRegex": False},
    ]
    df = match_enrich(
        spark.table("part"), "p_name", "label", expressions, fallback="other"
    )
    return df.select("p_partkey", "p_name", "label").orderBy("p_partkey")


_CHECKS_ORACLE = """
SELECT event_id, 'value_nonneg' AS "check", CAST(value AS VARCHAR) AS value, value >= 0 AS valid FROM events
UNION ALL
SELECT event_id, 'value_small' AS "check", CAST(value AS VARCHAR) AS value, value < 50 AS valid FROM events
UNION ALL
SELECT event_id, 'is_click' AS "check", CAST(event_type AS VARCHAR) AS value, event_type = 'click' AS valid FROM events
"""


@query("comparison_checks", oracle=_CHECKS_ORACLE)
def comparison_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 comparison mini-DSL -> typed Column predicates (parsing.py:4-55),
    emitted as normalized check rows (service/check.py:27-57 semantics:
    stringified value + boolean valid)."""
    from dawis_spark.operators.checks import check_rows

    return check_rows(
        spark.table("events"),
        checks={
            "value_nonneg": "{value} >= 0",
            "value_small": "{value} < 50",
            "is_click": "{event_type} == click",
        },
        value_cols={
            "value_nonneg": "value",
            "value_small": "value",
            "is_click": "event_type",
        },
        key_cols=["event_id"],
    )


_ALERTS_ORACLE = """
SELECT g."group", event_type || ' exceeded: ' || CAST(value AS VARCHAR) AS message
FROM events, (VALUES ('ops'), ('seo')) g("group")
WHERE value > 90
"""


@query("alerts_per_line", oracle=_ALERTS_ORACLE)
def alerts_per_line_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 (alerting_check.py:171-196): per-row check, alert per failing row
    per group; alert fires iff check-result != negate (the reference's XOR)."""
    from dawis_spark.operators.checks import alerts_per_line

    return alerts_per_line(
        spark.table("events"),
        check_template="{value} > 90",
        groups=["ops", "seo"],
        message_template="{event_type} exceeded: {value}",
        negate=False,
    )


_PREV_DAY_ORACLE = """
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS day, ROUND(SUM(value), 2) AS total
  FROM events GROUP BY 1, 2
)
SELECT c.event_type, c.day, c.total, p.total AS totalPreviousDay
FROM d c LEFT JOIN d p
  ON p.event_type = c.event_type AND p.day = c.day - INTERVAL 1 DAY
ORDER BY 1, 2
"""


@query("prev_period_day", oracle=_PREV_DAY_ORACLE)
def prev_period_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 previous-period enrichment (google_search_console.py:369-408):
    the reference's per-row find_one lookup becomes ONE self left join on
    the dimension key + shifted date.

    Scale: both join sides are the same pre-aggregated (small) daily
    rollup; on day-partitioned facts the previous slice prunes to one
    partition."""
    from dawis_spark.operators.period import previous_period_join

    daily = (
        spark.table("events")
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    out = previous_period_join(
        daily, keys=["event_type"], date_col="day", metrics=["total"], period="Day"
    )
    return out.select("event_type", "day", "total", "totalPreviousDay").orderBy(
        "event_type", "day"
    )


_LATEST_ORACLE = """
SELECT user_id, event_id, ts, event_type, value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
ORDER BY user_id
"""


@query("latest_event_per_user", oracle=_LATEST_ORACLE)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/J4 latest-snapshot-per-key (mongodb.py:128-131 find_last_sorted):
    row_number over (key, time desc) with a unique-id tie-break."""
    from dawis_spark.operators.windows import latest_per_key

    return latest_per_key(
        spark.table("events").select("user_id", "event_id", "ts", "event_type", "value"),
        keys=["user_id"],
        order_by=[F.desc("ts"), F.desc("event_id")],
    ).orderBy("user_id")


_CHANGE_ORACLE = """
SELECT user_id, event_id, event_type, lagged AS diff
FROM (
  SELECT user_id, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lagged
  FROM events
)
WHERE lagged IS NOT NULL AND event_type != lagged
ORDER BY user_id, event_id
"""


@query("change_detection", oracle=_CHANGE_ORACLE)
def change_detection_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 change detection (metatags.py:209-275): value vs previous snapshot
    of the same key; previous value carried as ``diff``."""
    from dawis_spark.operators.windows import change_detection

    out = change_detection(
        spark.table("events").select("user_id", "event_id", "ts", "event_type"),
        keys=["user_id"],
        order_by=[F.asc("ts"), F.asc("event_id")],
        value_col="event_type",
    )
    return out.select("user_id", "event_id", "event_type", "diff").orderBy(
        "user_id", "event_id"
    )


_DUPS_CAP = 10

_DUPS_ORACLE = f"""
WITH g AS (
  SELECT p_name,
         list_sort(list_transform(list(p_partkey), x -> CAST(x AS VARCHAR))) AS ids
  FROM part GROUP BY p_name HAVING count(*) > 1
),
x AS (SELECT p_name, ids, unnest(ids) AS id FROM g)
SELECT id AS p_partkey, p_name,
       array_to_string(list_slice(list_filter(ids, v -> v != id), 1, {_DUPS_CAP}), ', ') AS diff
FROM x
ORDER BY p_name, p_partkey
"""


@query("duplicate_detection", oracle=_DUPS_ORACLE)
def duplicate_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 duplicate detection (metatags.py:277-377): group by value, groups
    of size > 1 are duplicates; one row per (value, id) with ``diff`` =
    comma-joined OTHER ids, capped at the first ``_DUPS_CAP`` sorted
    other-ids.

    The cap is the DEFAULT because the reference's uncapped diff format is
    quadratic in group size (sf1 measured: 84.6 s, ~626M id references).
    ``duplicate_detection_parity`` keeps the exact uncapped reference
    format as the opt-in. Scale: the capped plan never materializes a
    group's full id list (see exact_duplicate_groups)."""
    from dawis_spark.operators.dedup import exact_duplicate_groups

    return exact_duplicate_groups(
        spark.table("part"),
        id_col="p_partkey",
        value_col="p_name",
        max_diff_ids=_DUPS_CAP,
    ).orderBy("p_name", "p_partkey")


_NO_ORDERS_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


@query("customers_without_orders", oracle=_NO_ORDERS_ORACLE)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 existence/idempotency predicate as a left-anti join — the
    exactly-once-append building block (idempotent.py uses the same plan).

    Scale: anti join shuffles only the key columns; with AQE it broadcasts
    the smaller side."""
    c = spark.table("customer")
    o = spark.table("orders").select("o_custkey").distinct()
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


_TOPK_ORACLE = """
WITH rev AS (
  SELECT p_brand, p.p_partkey,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p_brand, p.p_partkey
)
SELECT p_brand, p_partkey, revenue, rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rank
  FROM rev
)
WHERE rank <= 3
ORDER BY p_brand, rank
"""


@query("top_parts_per_brand", oracle=_TOPK_ORACLE)
def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 top-k per group: agg + row_number window, deterministic tie-break.

    Scale: one shuffle for the (brand, part) rollup, one narrower shuffle
    for the per-brand window (hash partitioning on the composite key can't
    be reused for its prefix). The second exchange moves only the rolled-up
    rows (|parts| << |lineitem|), so it's negligible at any scale."""
    from dawis_spark.operators.windows import top_k_per_group

    rev = (
        spark.table("lineitem")
        .join(F.broadcast(spark.table("part")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )
    out = top_k_per_group(
        rev, keys=["p_brand"], order_by=[F.desc("revenue"), F.asc("p_partkey")], k=3
    )
    return out.select(
        "p_brand", "p_partkey", "revenue", F.col("rank_in_group").alias("rank")
    ).orderBy("p_brand", "rank")


_UNION_ORACLE = """
SELECT DISTINCT user_id FROM (
  SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 20
  UNION ALL
  SELECT user_id FROM events WHERE event_type = 'signup'
) ORDER BY user_id
"""


@query("union_dedup", oracle=_UNION_ORACLE)
def union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 set semantics: the retry-queue merge (unionByName +
    dropDuplicates, google_search_console.py:53-129) as a data-plane op."""
    e = spark.table("events")
    a = e.filter((F.col("event_type") == "purchase") & (F.col("value") > 20)).select(
        "user_id"
    )
    b = e.filter(F.col("event_type") == "signup").select("user_id")
    return a.unionByName(b).dropDuplicates().orderBy("user_id")


_EXCEPT_ORACLE = """
SELECT user_id FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error'
ORDER BY user_id
"""


@query("set_except", oracle=_EXCEPT_ORACLE)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (beyond the reference's implicit set ops): users who
    clicked but never errored."""
    e = spark.table("events")
    clickers = e.filter(F.col("event_type") == "click").select("user_id")
    erroring = e.filter(F.col("event_type") == "error").select("user_id")
    return clickers.subtract(erroring).orderBy("user_id")


_SQLPARAM_ORACLE = """
SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
FROM events WHERE ts >= DATE '2024-01-15'
GROUP BY event_type ORDER BY event_type
"""


@query("sql_params_date_days_ago", oracle=_SQLPARAM_ORACLE)
def sql_params_date_days_ago(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9/§3.2: parameterized SQL with the reference's ``dateDaysAgo``
    dynamic parameter (query_helper.py:73-78), bound as a typed date inside
    Catalyst (constant-folded -> partition-prunable)."""
    import datetime as dt

    return run_query(
        spark,
        "SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total "
        "FROM events WHERE ts >= :cutoff GROUP BY event_type ORDER BY event_type",
        parameters={"cutoff": {"dateDaysAgo": 5}},
        today=dt.date(2024, 1, 20),
    )


_COLMAP_ORACLE = """
SELECT event_id AS id, event_type AS kind, value FROM events ORDER BY id
"""


@query("column_mapping_nested", oracle=_COLMAP_ORACLE)
def column_mapping_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 column mapping incl. nested-struct field rename
    (query_helper.py:87-156): rename a field inside a struct and a
    top-level column, then flatten — all compile-time plan rewrites."""
    from dawis_spark.plans.column_mapping import apply_column_mapping

    df = spark.table("events").select(
        "event_id",
        F.struct(F.col("event_type").alias("type"), F.col("value")).alias("payload"),
    )
    df = apply_column_mapping(df, {"payload.type": "kind", "event_id": "id"})
    return df.select(
        "id", F.col("payload.kind").alias("kind"), F.col("payload.value").alias("value")
    ).orderBy("id")


_SESSION_ORACLE = """
WITH e AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
)
SELECT user_id,
       CAST(SUM(CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM e GROUP BY user_id ORDER BY user_id
"""


@query("sessionization", oracle=_SESSION_ORACLE)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (gap > 30 min) via lag + conditional count — the
    batch analog of streaming session windows (§2.9; in streaming this is
    ``session_window``/``applyInPandasWithState``)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = spark.table("events").withColumn("prev_ts", F.lag("ts").over(w))
    new_sess = F.when(
        F.col("prev_ts").isNull()
        | (F.col("ts") > F.col("prev_ts") + F.expr("INTERVAL 30 MINUTE")),
        1,
    ).otherwise(0)
    return (
        e.withColumn("new_sess", new_sess)
        .groupBy("user_id")
        .agg(F.sum("new_sess").cast("bigint").alias("n_sessions"))
        .orderBy("user_id")
    )


_TUMBLING_ORACLE = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n, ROUND(SUM(value), 2) AS total
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("tumbling_window_agg", oracle=_TUMBLING_ORACLE)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregate via ``F.window`` — identical code shape to
    the Structured Streaming version (readStream + watermark + window);
    §2.9's daily-partition micro-batches generalized."""
    e = spark.table("events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total"
        )
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# LLM-training-data pipeline operators (BASELINE.json north star):
# dedup, similarity search, text analysis. Oracles are generated from the
# SAME dual-rendered fragments the Spark plans use (functions/text.py,
# functions/vectors.py) — parity by construction.
# ---------------------------------------------------------------------------

from dawis_spark.functions import text as _TXT
from dawis_spark.functions import vectors as _VEC
from dawis_spark.operators import textstats as _TS

_N_PERMS, _BANDS, _SHINGLE_K = 8, 4, 3
_ROWS_PER_BAND = _N_PERMS // _BANDS


def _norm_text(dialect: str) -> str:
    return _TS.normalized_text_sql("text", dialect)


_EXACT_DEDUP_ORACLE = f"""
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS group_size
FROM documents
GROUP BY {_norm_text('duck')}
ORDER BY doc_id
"""


@query("dedup_exact", oracle=_EXACT_DEDUP_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content fingerprint: keep the lowest doc_id per
    normalized-text group. Oracle groups by the normalized text itself —
    agreeing results also validate the fingerprint's injectivity here.

    Scale: the shuffle carries (64-bit-ish hash, id), never document
    bodies; survivors semi-join back (see operators/dedup.exact_dedup).
    """
    from dawis_spark.operators.textstats import fingerprint

    fp = fingerprint(spark.table("documents"), "doc_id", "text")
    return (
        fp.groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("group_size"))
        .select("doc_id", "group_size")
        .orderBy("doc_id")
    )


def _minhash_sig_oracle() -> str:
    sh = _TXT.shingle_hashes("text", _SHINGLE_K, "duck")
    elems = [
        f"{_TXT.minhash_element('sh', a, b, 'duck')} AS m{i}"
        for i, (a, b) in enumerate(_TXT.minhash_coeffs(_N_PERMS))
    ]
    return (
        f"WITH s AS (SELECT doc_id, {sh} AS sh FROM documents) "
        f"SELECT doc_id, {', '.join(elems)} FROM s WHERE len(sh) > 0 ORDER BY doc_id"
    )


@query("minhash_signatures", oracle=_minhash_sig_oracle())
def minhash_signatures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (Broder '97): K=8 permutations over word-3-gram
    polynomial hashes — all map-side codegen, no shuffle, no Python."""
    from dawis_spark.operators.dedup import minhash_signatures

    sigs = minhash_signatures(
        spark.table("documents"), "doc_id", "text", _N_PERMS, _SHINGLE_K
    )
    return sigs.select(
        "doc_id", *[F.expr(f"sig[{i}]").alias(f"m{i}") for i in range(_N_PERMS)]
    ).orderBy("doc_id")


def _lsh_pairs_oracle(threshold: float) -> str:
    sh = _TXT.shingle_hashes("text", _SHINGLE_K, "duck")
    sig = (
        "["
        + ", ".join(
            _TXT.minhash_element("sh", a, b, "duck")
            for a, b in _TXT.minhash_coeffs(_N_PERMS)
        )
        + "]"
    )
    band_key = " || ':' || ".join(
        f"CAST(sig[b * {_ROWS_PER_BAND} + {r + 1}] AS VARCHAR)"
        for r in range(_ROWS_PER_BAND)
    )
    jac = _TXT.jaccard("a.sh", "b.sh", "duck")
    return f"""
WITH hashes AS (SELECT doc_id, {sh} AS sh FROM documents),
sigs AS (SELECT doc_id, {sig} AS sig FROM hashes WHERE len(sh) > 0),
bands AS (
  SELECT doc_id, t.b AS band, {band_key} AS key
  FROM sigs, range(0, {_BANDS}) t(b)
),
cands AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
)
SELECT id_a, id_b, ROUND({jac}, 6) AS jaccard
FROM cands JOIN hashes a ON a.doc_id = id_a JOIN hashes b ON b.doc_id = id_b
WHERE ROUND({jac}, 6) >= {threshold}
ORDER BY id_a, id_b
"""


@query("minhash_lsh_pairs", oracle=_lsh_pairs_oracle(0.2))
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: banded candidate generation ->
    exact-Jaccard verification (>= 0.2).

    Scale: the ONLY shuffle is the band-bucket self-join on (band, key);
    exact Jaccard runs on candidate pairs, not all pairs. AQE splits
    skewed buckets (boilerplate-heavy corpora)."""
    from dawis_spark.operators.dedup import minhash_near_duplicates

    return minhash_near_duplicates(
        spark.table("documents"),
        "doc_id",
        "text",
        n_perms=_N_PERMS,
        bands=_BANDS,
        threshold=0.2,
        shingle_k=_SHINGLE_K,
    ).orderBy("id_a", "id_b")


def _ngram_topk_oracle(cap: int = 100) -> str:
    """Scale-invariant replay of the blocked/capped routing: blocks up to
    ``cap`` rows pair exactly; hot blocks replay the block-scoped
    MinHash-LSH route (band self-join within the block), so the oracle
    matches at ANY scale factor, not just where every block stays small
    (sf0.1 has 250-row blocks that route through LSH)."""
    sh = _TXT.shingle_hashes("text", _SHINGLE_K, "duck")
    sig = (
        "["
        + ", ".join(
            _TXT.minhash_element("sh", a, b, "duck")
            for a, b in _TXT.minhash_coeffs(_N_PERMS)
        )
        + "]"
    )
    band_key = " || ':' || ".join(
        f"CAST(sig[b * {_ROWS_PER_BAND} + {r + 1}] AS VARCHAR)"
        for r in range(_ROWS_PER_BAND)
    )
    jac = _TXT.jaccard("a.sh", "b.sh", "duck")
    return f"""
WITH h0 AS (SELECT source, doc_id, {sh} AS sh FROM documents),
h AS (SELECT * FROM h0 WHERE len(sh) > 0),
sizes AS (SELECT source, COUNT(*) AS bn FROM documents GROUP BY source),
bsigs AS (
  SELECT h.source, h.doc_id, {sig} AS sig
  FROM h JOIN sizes s ON s.source = h.source AND s.bn > {cap}
),
bbands AS (
  SELECT source, doc_id, t.b AS band, {band_key} AS key
  FROM bsigs, range(0, {_BANDS}) t(b)
),
pairs AS (
  SELECT a.source, a.doc_id AS id_a, b.doc_id AS id_b, 'exact' AS pair_method
  FROM h a
  JOIN h b ON a.source = b.source AND a.doc_id < b.doc_id
  JOIN sizes s ON s.source = a.source AND s.bn <= {cap}
  UNION ALL
  SELECT DISTINCT x.source, x.doc_id AS id_a, y.doc_id AS id_b, 'lsh' AS pair_method
  FROM bbands x
  JOIN bbands y ON x.source = y.source AND x.band = y.band AND x.key = y.key
              AND x.doc_id < y.doc_id
)
SELECT p.source AS source, p.id_a, p.id_b, ROUND({jac}, 6) AS jaccard, p.pair_method
FROM pairs p
JOIN h a ON a.doc_id = p.id_a
JOIN h b ON b.doc_id = p.id_b
ORDER BY jaccard DESC, id_a, id_b
LIMIT 20
"""


@query("ngram_jaccard_topk", oracle=_ngram_topk_oracle())
def ngram_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked exact n-gram Jaccard: all pairs WITHIN a blocking group
    (source), top-20 most similar. Blocking is what keeps exact Jaccard
    feasible at scale — never all-pairs the corpus — and the per-block
    pair budget (max_block_rows=100) routes hot blocks through
    block-scoped MinHash LSH instead of O(n²) all-pairs. At sf0.01 every
    block (25 rows) stays exact; at sf0.1 (250-row blocks) the same query
    exercises the approximate scale path. The oracle replays the SAME
    size-based routing, so parity holds at either scale."""
    from dawis_spark.operators.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        spark.table("documents"),
        "doc_id",
        "text",
        "source",
        _SHINGLE_K,
        max_block_rows=100,
        n_perms=_N_PERMS,
        bands=_BANDS,
    )
    return pairs.orderBy(F.desc("jaccard"), "id_a", "id_b").limit(20)


def _simhash_oracle(bits: int = 32) -> str:
    toks = _TXT.tokens("text", "duck")
    h = _TXT.char_hash("tok", "duck")
    bit_sums = ", ".join(
        f"SUM(CASE WHEN ((h >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(bits)
    )
    combine = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(bits)
    )
    return f"""
WITH tok AS (SELECT doc_id, unnest({toks}) AS tok FROM documents),
th AS (SELECT doc_id, {h} AS h FROM tok),
bits AS (SELECT doc_id, {bit_sums} FROM th GROUP BY doc_id)
SELECT doc_id, {combine} AS simhash FROM bits ORDER BY doc_id
"""


@query("simhash_docs", oracle=_simhash_oracle())
def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash (Charikar 2002): per-token hash, bit-majority vote.
    explode + groupBy(doc) keeps partial aggregation map-side."""
    from dawis_spark.operators.dedup import simhash

    return simhash(spark.table("documents"), "doc_id", "text", bits=32).orderBy(
        "doc_id"
    )


def _embedding_topk_oracle(k: int, n_queries: int) -> str:
    cos = _VEC.cosine("q_vec", "c_vec", "duck")
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < {n_queries}),
c AS (SELECT vec_id AS neighbor_id, embedding AS c_vec FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id, ROUND({cos}, 6) AS cosine
  FROM q, c WHERE query_id != neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
ORDER BY query_id, rank
"""


@query("embedding_topk", oracle=_embedding_topk_oracle(5, 10))
def embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k ANN baseline: broadcast the query set against the
    corpus (map-side nested loop, corpus never shuffles), per-query top-k
    window. Ties broken on (rounded score, neighbor_id)."""
    from dawis_spark.operators.similarity import brute_force_topk

    emb = spark.table("embeddings")
    return brute_force_topk(
        corpus=emb,
        queries=emb.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
    ).orderBy("query_id", "rank")


def _ann_lsh_oracle(k: int, n_queries: int, n_planes: int, dim: int) -> str:
    from dawis_spark.operators.similarity import lsh_bucket_expr

    cos = _VEC.cosine("q_vec", "c_vec", "duck")
    bucket = lsh_bucket_expr(n_planes, dim, "duck")
    return f"""
WITH b0 AS (SELECT vec_id, embedding AS vec FROM embeddings),
b AS (SELECT vec_id, vec, {bucket} AS bucket FROM b0),
q AS (SELECT vec_id AS query_id, vec AS q_vec, bucket FROM b WHERE vec_id < {n_queries}),
c AS (SELECT vec_id AS neighbor_id, vec AS c_vec, bucket FROM b),
scored AS (
  SELECT query_id, neighbor_id, ROUND({cos}, 6) AS cosine
  FROM q JOIN c USING (bucket) WHERE query_id != neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
ORDER BY query_id, rank
"""


@query("embedding_ann_lsh", oracle=_ann_lsh_oracle(5, 10, 4, 64))
def embedding_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate NN (sign random projection, Charikar 2002):
    exact cosine only within the query's bucket.

    Scale path vs embedding_topk: bucket assignment is map-side; the only
    shuffle is the bucket equi-join — O(N*Q) becomes O(N*Q / 2^planes)."""
    from dawis_spark.operators.similarity import lsh_ann_topk

    emb = spark.table("embeddings")
    return lsh_ann_topk(
        corpus=emb,
        queries=emb.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        n_planes=4,
        dim=64,
    ).orderBy("query_id", "rank")


def _ann_lsh_multiprobe_oracle(k: int, n_queries: int, n_planes: int, dim: int) -> str:
    from dawis_spark.operators.similarity import lsh_bucket_expr, lsh_probe_keys

    cos = _VEC.cosine("q_vec", "c_vec", "duck")
    bucket = lsh_bucket_expr(n_planes, dim, "duck")
    probes = ", ".join(lsh_probe_keys(n_planes, dim, "duck"))
    return f"""
WITH b0 AS (SELECT vec_id, embedding AS vec FROM embeddings),
q AS (
  SELECT vec_id AS query_id, vec AS q_vec, unnest([{probes}]) AS bucket
  FROM b0 WHERE vec_id < {n_queries}
),
c AS (SELECT vec_id AS neighbor_id, vec AS c_vec, {bucket} AS bucket FROM b0),
scored AS (
  SELECT DISTINCT query_id, neighbor_id, ROUND({cos}, 6) AS cosine
  FROM q JOIN c USING (bucket) WHERE query_id != neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
ORDER BY query_id, rank
"""


@query("embedding_ann_lsh_multiprobe", oracle=_ann_lsh_multiprobe_oracle(5, 10, 4, 64))
def embedding_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe sign-LSH ANN (Lv et al. 2007): each query probes its own
    bucket plus every Hamming-1 neighbor bucket — recall@5 rises from 0.36
    to 0.76 on this corpus (see ann_recall_lsh_multiprobe) for ~(planes+1)x
    the candidate cost. Scale shape unchanged: only the SMALL query side
    fans out (explode before the broadcast), the corpus keeps one map-side
    bucket per row and the only shuffle is still the bucket equi-join."""
    from dawis_spark.operators.similarity import lsh_ann_topk

    emb = spark.table("embeddings")
    return lsh_ann_topk(
        corpus=emb,
        queries=emb.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        n_planes=4,
        dim=64,
        multi_probe=True,
    ).orderBy("query_id", "rank")


def _kmeans_c1_ctes(k: int, dim: int, prefix: str = "", where: str = "") -> str:
    """CTE chain replaying train_kmeans(iterations=1): init = k lowest-id
    vectors (components rounded 6), one assign/update round, empty
    clusters keep their centroid. Ends with ``{prefix}c1(cid, cvec)``.

    ``prefix`` namespaces every CTE so the chain composes into oracles
    that define their own v/init/a1/upd (the PQ family).

    NB: alias names must avoid 'i' — the duck fragment binds a lambda
    variable i in list_transform(range(...)) and a table alias i would
    shadow it inside the correlated subquery.

    Training reads only the ``TRAIN_SAMPLE_LIMIT`` lowest-id prefix
    ({p}tr), mirroring the library's bounded driver-side sample — parity
    holds even when the corpus outgrows the limit (ADVICE r6).

    ``where``: optional predicate restricting the corpus (filtered-ANN
    composition) — applied to init and {p}v alike, mirroring a library
    call that trains on an already-filtered DataFrame."""
    p = prefix
    wh = f"WHERE {where} " if where else ""
    cos_init = _VEC.cosine_null("tr.vec", "ini.cvec", "duck")
    return f"""
{p}init AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
         list_transform(embedding, x -> round(CAST(x AS DOUBLE), 6)) AS cvec
  FROM embeddings {wh}ORDER BY vec_id LIMIT {k}
),
{p}v AS (SELECT vec_id, embedding AS vec FROM embeddings {wh}),
{p}tr AS (SELECT vec_id, vec FROM {p}v ORDER BY vec_id LIMIT {TRAIN_SAMPLE_LIMIT}),
{p}a1 AS (
  SELECT tr.vec_id, tr.vec,
    (SELECT ini.cid FROM {p}init ini
     ORDER BY coalesce(round({cos_init}, 6), -2.0) DESC, ini.cid LIMIT 1) AS cid
  FROM {p}tr tr
),
{p}upd AS (
  SELECT cid, r.pos AS pos, round(avg(CAST(vec[r.pos] AS DOUBLE)), 6) AS m
  FROM {p}a1, range(1, {dim + 1}) r(pos)
  GROUP BY cid, r.pos
),
{p}c1a AS (SELECT cid, list(m ORDER BY pos) AS cvec FROM {p}upd GROUP BY cid),
{p}c1 AS (
  SELECT ini.cid, COALESCE(c1a.cvec, ini.cvec) AS cvec
  FROM {p}init ini LEFT JOIN {p}c1a c1a USING (cid)
)"""


def _kmeans_oracle(k: int, dim: int) -> str:
    cos_final = _VEC.cosine_null("v.vec", "fc.cvec", "duck")
    return f"""
WITH {_kmeans_c1_ctes(k, dim)}
SELECT v.vec_id,
  (SELECT fc.cid FROM c1 fc
   ORDER BY coalesce(round({cos_final}, 6), -2.0) DESC, fc.cid LIMIT 1) AS cid
FROM v ORDER BY v.vec_id
"""


@query("kmeans_clusters", oracle=_kmeans_oracle(8, 64))
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (k=8, one training round) over the embedding corpus
    — trains the coarse quantizer ivf_ann_topk's ``centroids=`` parameter
    consumes, closing the IVF loop (deterministic-init -> trained
    centroids -> probe search). ASSIGN is a map-side argmax against
    literal centroids; UPDATE's only shuffle carries (cid, dim, partial
    avg) triples, never vectors; the k x dim centroid matrix rides the
    driver between rounds exactly like a FAISS coarse quantizer. Every
    centroid component rounds to 6 digits per round so engine float
    drift cannot flip an assignment — the DuckDB oracle replays the
    identical round."""
    from dawis_spark.operators.similarity import kmeans_assign, train_kmeans

    emb = spark.table("embeddings")
    cents = train_kmeans(emb, "vec_id", "embedding", k=8, iterations=1)
    return (
        kmeans_assign(emb, "vec_id", "embedding", cents)
        .select(F.col("id").alias("vec_id"), "cid")
        .orderBy("vec_id")
    )


def _lang_id_oracle() -> str:
    toks = _TXT.tokens("text", "duck")
    scores = _TS.language_scores_sql("text", "duck")
    score_sel = ", ".join(
        f"ROUND({e}, 6) AS {name}" for name, e in scores.items()
    )
    langs = list(_TS.STOPWORDS)
    greatest = "greatest(" + ", ".join(f"score_{l}" for l in langs) + ")"
    pred = "CASE WHEN " + greatest + " <= 0 THEN 'und' "
    pred += " ".join(
        f"WHEN score_{l} = {greatest} THEN '{l}'" for l in langs
    )
    pred += " ELSE 'und' END"
    return f"""
WITH t AS (SELECT doc_id, {toks} AS __toks FROM documents),
s AS (SELECT doc_id, {score_sel} FROM t)
SELECT doc_id, {', '.join('score_' + l for l in langs)}, {pred} AS lang_pred
FROM s ORDER BY doc_id
"""


@query("language_id", oracle=_lang_id_oracle())
def language_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language ID heuristic — map-side only, argmax with a
    fixed tie-break order."""
    from dawis_spark.operators.textstats import language_id

    return language_id(spark.table("documents"), "doc_id", "text").orderBy("doc_id")


def _quality_oracle() -> str:
    toks = _TXT.tokens("text", "duck")
    stop = _TS._stopword_ratio_expr("en", "duck")
    return f"""
WITH base AS (
  SELECT doc_id,
         length(text) AS n_chars_obs,
         {toks} AS __toks,
         length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS __punct
  FROM documents
),
o AS (
  SELECT doc_id, n_chars_obs,
         len(__toks) AS n_tokens,
         ROUND(list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(__toks, t -> CAST(length(t) AS BIGINT))),
               (s, v) -> s + v) / CAST(greatest(len(__toks), 1) AS DOUBLE), 6)
           AS avg_token_len,
         ROUND(__punct / CAST(greatest(n_chars_obs, 1) AS DOUBLE), 6) AS punct_ratio,
         ROUND({stop}, 6) AS stop_ratio_en
  FROM base
)
SELECT doc_id, n_chars_obs, n_tokens, avg_token_len, punct_ratio, stop_ratio_en,
       ROUND(0.3 * least(n_tokens / 100.0, 1.0)
           + 0.4 * (1.0 - punct_ratio)
           + 0.3 * least(stop_ratio_en * 4.0, 1.0), 6) AS quality
FROM o ORDER BY doc_id
"""


@query("quality_scores", oracle=_quality_oracle())
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality heuristics (length/punct/stopword) + composite
    score — the Gopher/C4-style filtering signals, all codegen."""
    from dawis_spark.operators.textstats import quality_score

    return quality_score(spark.table("documents"), "doc_id", "text").orderBy("doc_id")


def _token_counts_oracle() -> str:
    toks = _TXT.tokens("text", "duck")
    return f"""
SELECT doc_id,
       len({toks}) AS ws_tokens,
       len(regexp_extract_all(lower(text), '{_TS.TOKEN_REGEX}')) AS bpe_tokens
FROM documents ORDER BY doc_id
"""


@query("token_counts", oracle=_token_counts_oracle())
def token_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counting."""
    from dawis_spark.operators.textstats import token_counts

    return token_counts(spark.table("documents"), "doc_id", "text").orderBy("doc_id")


def _fingerprint_oracle() -> str:
    h = _TXT.char_hash("__norm", "duck")
    return f"""
WITH n AS (SELECT doc_id, {_norm_text('duck')} AS __norm FROM documents)
SELECT doc_id, {h} AS fingerprint FROM n ORDER BY doc_id
"""


@query("doc_fingerprints", oracle=_fingerprint_oracle())
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial fingerprint of whitespace-normalized documents."""
    from dawis_spark.operators.textstats import fingerprint

    return fingerprint(spark.table("documents"), "doc_id", "text").orderBy("doc_id")


# ---------------------------------------------------------------------------
# Analytics the reference lacks but Spark gives for free (SURVEY §2.5 note:
# "no grouping sets / cube / rollup ... These come free in Spark if wanted")
# ---------------------------------------------------------------------------

_ROLLUP_SQL = """
SELECT r_name, n_name,
       ROUND(SUM(s_acctbal), 2) AS total_acctbal,
       COUNT(*) AS n_suppliers
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
"""


@query("rollup_acctbal", oracle=_ROLLUP_SQL)
def rollup_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotals (region -> nation -> grand total) in one pass —
    partial aggregation handles all grouping sets in a single shuffle."""
    return spark.sql(_ROLLUP_SQL)


_PIVOT_SQL = """
SELECT user_id,
       CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS clicks,
       CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS views,
       CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS errors,
       ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2) AS purchase_value
FROM events GROUP BY user_id ORDER BY user_id
"""


@query("pivot_event_counts", oracle=_PIVOT_SQL)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot via the DataFrame API (groupBy().pivot() — map-side conditional
    aggregation, one shuffle, no per-category scan)."""
    e = spark.table("events")
    pivoted = (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "view", "error", "purchase"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("val"),
        )
    )
    return pivoted.select(
        "user_id",
        F.coalesce(F.col("click_n"), F.lit(0)).alias("clicks"),
        F.coalesce(F.col("view_n"), F.lit(0)).alias("views"),
        F.coalesce(F.col("error_n"), F.lit(0)).alias("errors"),
        F.coalesce(F.col("purchase_val"), F.lit(0.0)).alias("purchase_value"),
    ).orderBy("user_id")


_PCTL_SQL = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.25), 6) AS p25,
       ROUND(quantile_cont(value, 0.50), 6) AS p50,
       ROUND(quantile_cont(value, 0.90), 6) AS p90
FROM events GROUP BY event_type ORDER BY event_type
"""


@query("percentiles_by_type", oracle=_PCTL_SQL)
def percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``). At 100 TB swap in percentile_approx (t-digest) —
    same plan shape, bounded memory; the exact form is the oracle-checkable
    baseline."""
    return spark.table("events").groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(value, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.90)"), 6).alias("p90"),
    ).orderBy("event_type")


_CUMSUM_SQL = """
SELECT user_id, event_id,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 2) AS running_value
FROM events
ORDER BY user_id, event_id
"""


@query("cumulative_user_value", oracle=_CUMSUM_SQL)
def cumulative_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per user with an explicit ROWS frame — deterministic
    tie-break (ts, event_id) so both engines accumulate in the same order."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spark.table("events")
        .select(
            "user_id",
            "event_id",
            F.round(F.sum("value").over(w), 2).alias("running_value"),
        )
        .orderBy("user_id", "event_id")
    )


_ABOVE_AVG_SQL = """
SELECT p_partkey, p_name, p_brand,
       ROUND(p_retailprice, 2) AS price
FROM part p
WHERE p_retailprice > (
  SELECT AVG(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
)
ORDER BY p_partkey
"""


@query("above_brand_avg_price", oracle=_ABOVE_AVG_SQL)
def above_brand_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + join, so the 'per-row subquery' is really one pass."""
    return spark.sql(_ABOVE_AVG_SQL)


_DISTINCT_AGG_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS distinct_users,
       COUNT(*) AS events
FROM events GROUP BY event_type ORDER BY event_type
"""


@query("distinct_users_by_type", oracle=_DISTINCT_AGG_SQL)
def distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate (expand + two-phase in Spark). At 100 TB swap
    approx_count_distinct (HLL) for the exact form when ±2%% suffices —
    same plan minus the expand."""
    return spark.table("events").groupBy("event_type").agg(
        F.countDistinct("user_id").alias("distinct_users"),
        F.count(F.lit(1)).alias("events"),
    ).orderBy("event_type")


_ORDERS_DIST_SQL = """
SELECT n_orders, COUNT(*) AS n_customers
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY n_orders
ORDER BY n_orders
"""


@query("customer_order_distribution", oracle=_ORDERS_DIST_SQL)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join preserving zero-order customers, then a
    distribution over the counts (two cheap aggregations, one join)."""
    c = spark.table("customer")
    o = spark.table("orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("n_orders")
    )


def _ivf_trained_oracle(k: int, n_queries: int, kc: int, n_probe: int, dim: int) -> str:
    # the IVF probe chain of _ivf_oracle with `cent` replaced by the
    # k-means-trained c1 centroids (rounded per round, so both engines
    # hold bit-identical quantizers)
    cos_vc = _VEC.cosine_null("vec", "cvec", "duck")
    cos_qc = _VEC.cosine("q_vec", "c_vec", "duck")
    return f"""
WITH {_kmeans_c1_ctes(kc, dim)},
corpus_aff AS (
  SELECT vec_id AS neighbor_id, vec, cid,
         coalesce(ROUND({cos_vc}, 6), -2.0) AS aff
  FROM v, (SELECT cid, cvec FROM c1) cent(cid, cvec)
),
corpus_b AS (
  SELECT neighbor_id, vec AS c_vec, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY neighbor_id ORDER BY aff DESC, cid) AS r
    FROM corpus_aff
  ) WHERE r <= 1
),
q_aff AS (
  SELECT vec_id AS query_id, vec, cid,
         coalesce(ROUND({cos_vc}, 6), -2.0) AS aff
  FROM (SELECT vec_id, vec FROM v WHERE vec_id < {n_queries}) q,
       (SELECT cid, cvec FROM c1) cent(cid, cvec)
),
q_b AS (
  SELECT query_id, vec AS q_vec, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY aff DESC, cid) AS r
    FROM q_aff
  ) WHERE r <= {n_probe}
),
scored AS (
  SELECT DISTINCT query_id, neighbor_id, ROUND({cos_qc}, 6) AS cosine
  FROM q_b JOIN corpus_b USING (cid)
  WHERE query_id != neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
ORDER BY query_id, rank
"""


@query("embedding_ann_ivf", oracle=_ivf_trained_oracle(5, 10, 16, 4, 64))
def embedding_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate NN (inverted-file coarse quantizer): corpus bucketed
    by nearest centroid map-side; each query probes its 4 nearest
    centroids' buckets only.

    Scale path vs brute force: the corpus never shuffles by vector —
    assignment is a broadcast argmin over C centroids, search is an
    equi-join on centroid id, cost ~ n_probe/C of exact. The coarse
    quantizer is the library default: TRAINED one-round k-means (k=16),
    deterministic so the oracle replays training and search in one SQL."""
    from dawis_spark.operators.similarity import ivf_ann_topk

    emb = spark.table("embeddings")
    return ivf_ann_topk(
        corpus=emb,
        queries=emb.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        n_centroids=16,
        n_probe=4,
    ).orderBy("query_id", "rank")


@query("embedding_ann_ivf_trained", oracle=_ivf_trained_oracle(5, 10, 8, 3, 64))
def embedding_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full IVF pipeline composed end to end: train the coarse
    quantizer with one k-means round (k=8), then probe-search with the
    TRAINED centroids through ivf_ann_topk's ``centroids=`` parameter —
    the production path (FAISS: train quantizer offline, search online),
    staying fully lazy on the corpus side. The oracle replays training
    AND search in one SQL; per-round centroid rounding keeps both
    engines' quantizers bit-identical."""
    from dawis_spark.operators.similarity import ivf_ann_topk, train_kmeans

    emb = spark.table("embeddings")
    cents = train_kmeans(emb, "vec_id", "embedding", k=8, iterations=1)
    return ivf_ann_topk(
        corpus=emb,
        queries=emb.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        n_probe=3,
        centroids=cents,
    ).orderBy("query_id", "rank")


_Q7_SQL = """
SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name IN ('NATION_1', 'NATION_2')
    AND n2.n_name IN ('NATION_1', 'NATION_2')
    AND n1.n_name != n2.n_name
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@query("q7_nation_trade", oracle=_Q7_SQL)
def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two-role dimension (nation joined twice under
    different aliases) + year extraction. The nation dim broadcasts for
    both roles; the selective IN filters prune before the fact join."""
    return spark.sql(_Q7_SQL)


_Q12_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished,
       CAST(SUM(CASE WHEN o_orderstatus != 'F' THEN 1 ELSE 0 END) AS BIGINT) AS open_or_partial
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q12_priority_buckets", oracle=_Q12_SQL)
def q12_priority_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional-sum bucketing after a fact-fact join;
    the CASE aggregation is map-side partial, one shuffle on priority."""
    return spark.sql(_Q12_SQL)


_Q13_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '%URGENT%'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("q13_customer_distribution", oracle=_Q13_SQL)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (the one spine query previously absent): left outer
    join with a predicate inside the ON clause (customers keep their row
    even when every order is excluded), per-customer COUNT of a nullable
    key (counts 0, not 1, for the all-null group), then a second
    aggregation over the counts. Two shuffles total — c_custkey, then
    c_count — both map-side partial; the outer join preserves the
    customer side so no customer is lost to the filter.
    Reference parity: the dedup/alerting configs count per-entity matches
    including empty groups (duplicate_content.py groupby semantics)."""
    return spark.sql(_Q13_SQL)


_Q14_SQL = """
SELECT ROUND(100.00 * SUM(CASE WHEN p_type = 'ECONOMY'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS economy_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
"""


@query("q14_category_share", oracle=_Q14_SQL)
def q14_category_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: category revenue share — a single global aggregate
    with a broadcast dim join; answers in one pass at any scale."""
    return spark.sql(_Q14_SQL)


_Q19_SQL = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
"""


@query("q19_disjunctive_filter", oracle=_Q19_SQL)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides. Catalyst
    factors the common join key and pushes the per-side conjuncts into
    each scan (the part of a disjunct that mentions only one table)."""
    return spark.sql(_Q19_SQL)


_Q22_SQL = """
SELECT cntrycode,
       COUNT(*) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM (
  SELECT substring(c_name, 10, 2) AS cntrycode, c_acctbal
  FROM customer
  WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
) custsale
GROUP BY cntrycode
ORDER BY cntrycode
"""


@query("q22_idle_customers", oracle=_Q22_SQL)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (computed once, broadcast as a
    literal) + windowed anti join (no orders since 2000) + substring
    bucketing."""
    return spark.sql(_Q22_SQL)


_FUNNEL_SQL = """
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY user_id
)
SELECT
  CAST(COUNT(first_view) AS BIGINT) AS viewed,
  CAST(SUM(CASE WHEN first_click > first_view THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after_view,
  CAST(SUM(CASE WHEN first_purchase > first_click AND first_click > first_view
                THEN 1 ELSE 0 END) AS BIGINT) AS purchased_after_funnel
FROM firsts
"""


@query("funnel_view_click_purchase", oracle=_FUNNEL_SQL)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel via conditional-MIN first-touch times —
    one shuffle on user_id, no self-joins (the naive 3-way self-join
    formulation shuffles the events table three times)."""
    return spark.sql(_FUNNEL_SQL)


_RETENTION_SQL = """
WITH cohorts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events
)
SELECT c.cohort_week,
       CAST(datediff(a.active_week, c.cohort_week) / 7 AS BIGINT) AS week_offset,
       COUNT(*) AS active_users
FROM cohorts c JOIN activity a ON c.user_id = a.user_id
GROUP BY c.cohort_week, week_offset
ORDER BY c.cohort_week, week_offset
"""

_RETENTION_ORACLE = """
WITH cohorts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events
)
SELECT c.cohort_week,
       CAST(date_diff('day', c.cohort_week, a.active_week) / 7 AS BIGINT) AS week_offset,
       COUNT(*) AS active_users
FROM cohorts c JOIN activity a ON c.user_id = a.user_id
GROUP BY c.cohort_week, week_offset
ORDER BY c.cohort_week, week_offset
"""


@query("weekly_retention_cohorts", oracle=_RETENTION_ORACLE)
def weekly_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: first-seen week x active week offsets. Both CTEs
    shuffle on user_id once and the join reuses that key; week arithmetic
    differs by dialect (datediff vs date_diff) so the two renderings are
    kept side by side."""
    return spark.sql(_RETENTION_SQL)


_SLIDING_ORACLE = """
WITH expanded AS (
  SELECT e.*, time_bucket(INTERVAL 30 MINUTE, ts) - k.k * INTERVAL 30 MINUTE AS window_start
  FROM events e, (VALUES (0), (1)) k(k)
)
SELECT window_start, event_type, COUNT(*) AS n
FROM expanded
WHERE ts >= window_start AND ts < window_start + INTERVAL 60 MINUTE
GROUP BY window_start, event_type
ORDER BY window_start, event_type
"""


@query("sliding_window_agg", oracle=_SLIDING_ORACLE)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (overlapping) windows: 1-hour windows every 30 minutes via
    ``F.window(ts, '1 hour', '30 minutes')`` — each event lands in 2
    windows. The oracle expands the window membership explicitly (event x
    slide-offset), which is exactly Spark's internal expansion; the
    aggregation stays one shuffle on (window, key)."""
    return (
        spark.table("events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
        .orderBy("window_start", "event_type")
    )


def _emb_neardup_oracle(
    threshold: float, cap: int = 100, n_planes: int = 4, dim: int = 64
) -> str:
    """Scale-invariant replay of the blocked/capped routing: label blocks
    up to ``cap`` rows pair exactly; hot blocks replay the block-scoped
    sign-LSH route (same deterministic hyperplanes as the Spark side), so
    the oracle matches at any scale factor. Norms precomputed once per
    vector (same arithmetic as the Spark plan: dot / (sqrt(nsq_a) *
    sqrt(nsq_b)) in identical order)."""
    from dawis_spark.operators.similarity import lsh_bucket_expr

    dot = _VEC.dot("a.vec", "b.vec", "duck")
    nsq = _VEC.norm_sq("embedding", "duck")
    bucket = lsh_bucket_expr(n_planes, dim, "duck")
    return f"""
WITH v AS (SELECT vec_id, label, embedding AS vec, sqrt({nsq}) AS nrm FROM embeddings),
sizes AS (SELECT label, COUNT(*) AS bn FROM v GROUP BY label),
big AS (
  SELECT v.label, v.vec_id, v.vec, {bucket} AS bucket
  FROM v JOIN sizes s ON s.label = v.label AND s.bn > {cap}
),
pairs AS (
  SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b, 'exact' AS pair_method
  FROM v a
  JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
  JOIN sizes s ON s.label = a.label AND s.bn <= {cap}
  UNION ALL
  SELECT DISTINCT x.label, x.vec_id AS id_a, y.vec_id AS id_b, 'lsh' AS pair_method
  FROM big x
  JOIN big y ON x.label = y.label AND x.bucket = y.bucket AND x.vec_id < y.vec_id
)
SELECT p.label AS label, p.id_a, p.id_b,
       ROUND({dot} / (a.nrm * b.nrm), 6) AS cosine,
       p.pair_method
FROM pairs p
JOIN v a ON a.vec_id = p.id_a
JOIN v b ON b.vec_id = p.id_b
WHERE ROUND({dot} / (a.nrm * b.nrm), 6) >= {threshold}
ORDER BY label, id_a, id_b
"""


@query("embedding_near_dups", oracle=_emb_neardup_oracle(0.3))
def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= 0.3 — threshold
    tuned to the synthetic corpus where within-label cosine tops at ~0.47;
    real embedding corpora use ~0.95), blocked by
    label — the dedup-family entry for semantic near-dups.

    Scale: blocking (label / cluster id / LSH bucket) bounds the pair
    count exactly like the n-gram variant; vectors join the bare id-pairs
    via shuffle-hash (never broadcast — the vector relation is
    corpus-sized) and norms are hoisted so each magnitude is computed
    once. The per-block pair budget (max_block_rows=100) routes hot
    blocks through block-scoped sign-LSH instead of O(n²) all-pairs: at
    sf0.01 every label block (44-59 rows) stays exact; at sf0.1 (~200-row
    blocks) the same query exercises the approximate scale path. The
    oracle replays the SAME size-based routing, so parity holds at
    either scale."""
    from dawis_spark.operators.similarity import embedding_near_dup_pairs

    return embedding_near_dup_pairs(
        spark.table("embeddings"),
        id_col="vec_id",
        vec_col="embedding",
        block_col="label",
        threshold=0.3,
        max_block_rows=100,
    ).orderBy("label", "id_a", "id_b")


# ---------------------------------------------------------------------------
# PSI v2 metric extraction (S4: reference google_pagespeed.py:345-487)
# ---------------------------------------------------------------------------

# One spec drives BOTH sides: the Spark path synthesizes a PSI JSON body
# from doc_id with these integer formulas, runs the real from_json
# extraction (modules/google_pagespeed.py), and flattens the nested
# record; the oracle computes the same planted values directly. The
# round-trip (synthesize -> parse -> navigate -> validate) must land
# exactly on the planted ground truth. All arithmetic is integer-only so
# the JSON strings and the oracle expressions agree to the last bit.

_PSI_NV = {  # labdata numericValue formulas (JSON integers)
    "cls": "(doc_id % 50)",
    "lcp": "(1000 + doc_id % 700)",
    "fcp": "(500 + doc_id % 300)",
    "tbt": "(doc_id % 400)",
    "mpfid": "(doc_id % 250)",
    "ttfb": "(80 + doc_id % 120)",
}
_PSI_SCORES = {  # audit score formulas (JSON 0/1 integers)
    "serverResponseTime": "(doc_id % 2)",
    "usesTextCompression": "((doc_id + 1) % 2)",
    "usesLongCacheTtl": "(doc_id % 2)",
    "domSize": "((doc_id + 1) % 2)",
    "offscreenImages": "(doc_id % 2)",
    "usesOptimizedImages": "((doc_id + 1) % 2)",
    "usesResponsiveImages": "(doc_id % 2)",
    "renderBlockingResources": "(doc_id % 2)",
    "bootupTime": "((doc_id + 1) % 2)",
    "mainthreadWorkBreakdown": "(doc_id % 2)",
}
_PSI_SCORE_AUDIT_NAMES = {
    "serverResponseTime": "server-response-time",
    "usesTextCompression": "uses-text-compression",
    "usesLongCacheTtl": "uses-long-cache-ttl",
    "domSize": "dom-size",
    "offscreenImages": "offscreen-images",
    "usesOptimizedImages": "uses-optimized-images",
    "usesResponsiveImages": "uses-responsive-images",
    "renderBlockingResources": "render-blocking-resources",
    "bootupTime": "bootup-time",
    "mainthreadWorkBreakdown": "mainthread-work-breakdown",
}
_PSI_NV_AUDIT_NAMES = {
    "cls": "cumulative-layout-shift",
    "lcp": "largest-contentful-paint",
    "fcp": "first-contentful-paint",
    "tbt": "total-blocking-time",
    "mpfid": "max-potential-fid",
    "ttfb": "server-response-time",
}
_PSI_CRUX_PCT = {  # percentile formulas; offset o distinguishes origin vs page
    "cls": lambda o: f"(10 + (doc_id + {o}) % 90)",
    "lcp": lambda o: f"(1500 + (doc_id + {o}) % 1000)",
    "fcp": lambda o: f"(900 + (doc_id + {o}) % 500)",
    "fid": lambda o: f"(10 + (doc_id + {o}) % 100)",
}
_PSI_CRUX_KEYS = {
    "cls": "CUMULATIVE_LAYOUT_SHIFT_SCORE",
    "lcp": "LARGEST_CONTENTFUL_PAINT_MS",
    "fcp": "FIRST_CONTENTFUL_PAINT_MS",
    "fid": "FIRST_INPUT_DELAY_MS",
}
_PSI_PROPS = {  # fixed Good/Medium/Bad proportions per metric (JSON literals)
    "cls": ("0.5", "0.3", "0.2"),
    "lcp": ("0.6", "0.25", "0.15"),
    "fcp": ("0.7", "0.2", "0.1"),
    "fid": ("0.8", "0.15", "0.05"),
}
_PSI_DAY = "lpad(cast(doc_id % 28 + 1 as string), 2, '0')"
_PSI_STATUS = "(200 + (doc_id % 2) * 104)"
_PSI_PERF = "concat('0.', lpad(cast(doc_id % 100 as string), 2, '0'))"


def _psi_crux_json(offset: int, fallback: bool) -> str:
    """Spark SQL string expr for one CrUX loading-experience JSON record."""
    metrics = []
    for m, key in _PSI_CRUX_KEYS.items():
        pct = _PSI_CRUX_PCT[m](offset)
        g, md, b = _PSI_PROPS[m]
        metrics.append(
            f"'\"{key}\":{{\"percentile\":', cast({pct} as string), "
            f"',\"distributions\":[{{\"proportion\":{g}}},"
            f"{{\"proportion\":{md}}},{{\"proportion\":{b}}}]}}'"
        )
    inner = ", ',', ".join(metrics)
    fb = ',\"origin_fallback\":true' if fallback else ""
    return f"concat('{{\"metrics\":{{', {inner}, '}}{fb}}}')"


def _psi_body_expr() -> str:
    """Spark SQL expr: synthetic PSI response body keyed on doc_id."""
    audits = []
    for m, audit in _PSI_NV_AUDIT_NAMES.items():
        if audit == "server-response-time":
            continue  # rendered below with both leaves
        audits.append(
            f"'\"{audit}\":{{\"numericValue\":', cast({_PSI_NV[m]} as string), '}}'"
        )
    audits.append(
        f"'\"server-response-time\":{{\"numericValue\":', "
        f"cast({_PSI_NV['ttfb']} as string), "
        f"',\"score\":', cast({_PSI_SCORES['serverResponseTime']} as string), '}}'"
    )
    for m, audit in _PSI_SCORE_AUDIT_NAMES.items():
        if audit == "server-response-time":
            continue
        audits.append(
            f"'\"{audit}\":{{\"score\":', cast({_PSI_SCORES[m]} as string), '}}'"
        )
    audits.append(
        f"'\"network-requests\":{{\"details\":{{\"items\":[{{\"statusCode\":', "
        f"cast({_PSI_STATUS} as string), '}}]}}}}'"
    )
    audits_sql = ", ',', ".join(audits)
    le = (
        "case when doc_id % 3 = 0 then '' "
        f"when doc_id % 5 = 0 then concat(',\"loadingExperience\":', {_psi_crux_json(7, True)}) "
        f"else concat(',\"loadingExperience\":', {_psi_crux_json(7, False)}) end"
    )
    return (
        "concat("
        f"'{{\"analysisUTCTimestamp\":\"2026-03-', {_PSI_DAY}, 'T08:15:30.000Z\",', "
        f"'\"lighthouseResult\":{{\"audits\":{{', {audits_sql}, '}}', "
        f"',\"categories\":{{\"performance\":{{\"score\":', {_PSI_PERF}, '}}}}}},', "
        f"'\"originLoadingExperience\":', {_psi_crux_json(0, False)}, "
        f"{le}, "
        "'}')"
    )


def _psi_oracle() -> str:
    """Direct-arithmetic oracle: the planted ground truth, no JSON."""
    cols = [
        "'https://ex.com/doc/' || CAST(doc_id AS VARCHAR) AS url",
        "CASE WHEN doc_id % 2 = 0 THEN 'desktop' ELSE 'mobile' END AS strategy",
        f"CAST('2026-03-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')"
        f" || ' 08:15:30' AS TIMESTAMP) AS date",
        f"CAST({_PSI_STATUS} AS INTEGER) AS statusCode",
        "source AS cluster",
    ]
    for m in _PSI_NV:
        cols.append(f"CAST({_PSI_NV[m]} AS DOUBLE) AS lab_{m}")
    cols.append("CAST(doc_id % 100 AS DOUBLE) / 100 AS lab_performanceScore")
    for m in _PSI_SCORES:
        cols.append(f"CAST({_PSI_SCORES[m]} AS DOUBLE) AS lab_{m}")
    for m in _PSI_CRUX_KEYS:
        cols.append(f"CAST({_PSI_CRUX_PCT[m](0)} AS BIGINT) AS ole_{m}")
        for band, lit in zip(("Good", "Medium", "Bad"), _PSI_PROPS[m]):
            cols.append(f"CAST({lit} AS DOUBLE) AS ole_{m}{band}")
    le_present = "(doc_id % 3 != 0 AND doc_id % 5 != 0)"
    for m in _PSI_CRUX_KEYS:
        cols.append(
            f"CASE WHEN {le_present} THEN CAST({_PSI_CRUX_PCT[m](7)} AS BIGINT) END AS le_{m}"
        )
        for band, lit in zip(("Good", "Medium", "Bad"), _PSI_PROPS[m]):
            cols.append(
                f"CASE WHEN {le_present} THEN CAST({lit} AS DOUBLE) END AS le_{m}{band}"
            )
    sel = ",\n  ".join(cols)
    return f"SELECT\n  {sel}\nFROM documents\nORDER BY CAST(doc_id AS VARCHAR)"


@query("psi_metric_extraction", oracle=_psi_oracle())
def psi_metric_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageSpeed v2 extraction (S4) end-to-end: synthesize a PSI response
    body per document, run the real pruned-schema from_json extraction +
    validation (modules/google_pagespeed.py), flatten the nested record.

    Scale: the body never leaves the executor — synthesis, parse and
    struct navigation are one map-side codegen stage with zero exchanges
    (the final ORDER BY is presentation-only). from_json deserializes
    only the ~50 navigated paths of the megabyte response."""
    from dawis_spark.modules.google_pagespeed import psi_facts
    from dawis_spark.schemas import LABDATA_STRUCT, LOADING_EXPERIENCE_STRUCT

    docs = spark.table("documents").select(
        F.concat(F.lit("https://ex.com/doc/"), F.col("doc_id").cast("string")).alias(
            "url"
        ),
        F.col("source").alias("cluster"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("desktop"))
        .otherwise(F.lit("mobile"))
        .alias("strategy"),
        F.expr(_psi_body_expr()).alias("body"),
        F.col("doc_id"),
    )
    facts = psi_facts(docs)
    flat = [
        F.col("url"),
        F.col("strategy"),
        F.col("date"),
        F.col("statusCode"),
        F.col("cluster"),
    ]
    for f in LABDATA_STRUCT.fields:
        flat.append(F.col("labdata")[f.name].alias(f"lab_{f.name}"))
    for f in LOADING_EXPERIENCE_STRUCT.fields:
        flat.append(
            F.col("originLoadingExperience")[f.name].alias(f"ole_{f.name}")
        )
    for f in LOADING_EXPERIENCE_STRUCT.fields:
        flat.append(F.col("loadingExperience")[f.name].alias(f"le_{f.name}"))
    return facts.select(*flat).orderBy("url")


# ---------------------------------------------------------------------------
# TPC-H breadth: EXISTS/anti shapes, correlated scalars, market share,
# top-k revenue — the relational shapes a warehouse engine must plan well
# ---------------------------------------------------------------------------

_Q4_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q4_order_priority", oracle=_Q4_SQL)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS -> left-semi): order counts by priority for
    orders with at least one returned line. (The canonical Q4 predicate is
    l_commitdate < l_receiptdate; those columns don't exist in the
    testdata, so the returned-line predicate keeps the identical plan
    shape.)

    Scale: the date filter prunes orders at the scan; the EXISTS becomes
    ONE left-semi hash join on l_orderkey (no row duplication before the
    aggregate); the groupBy key space is 5 priorities, so the final
    shuffle is negligible.
    """
    orders = spark.table("orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    returned = spark.table("lineitem").filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return (
        orders.join(returned, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q6_SQL = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("q6_forecast_revenue", oracle=_Q6_SQL)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate. The whole query is one
    map-side pass: every predicate pushes to the parquet scan (min/max
    row-group pruning on l_shipdate), the SUM partial-aggregates per
    partition, and a single scalar crosses the wire."""
    return spark.sql(_Q6_SQL)


_Q8_SQL = """
SELECT o_year,
       ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) / SUM(volume), 6)
         AS mkt_share
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
) t
GROUP BY o_year
ORDER BY o_year
"""


@query("q8_market_share", oracle=_Q8_SQL)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional volume per year.
    Two-role nation dim (customer side filters through region; supplier
    side labels the share) — both roles plus part/customer/supplier/
    region broadcast under AQE, so the lineitem fact never shuffles for
    a dimension; the only exchange is the 7-group year aggregate."""
    return spark.sql(_Q8_SQL)


_Q9_SQL = """
SELECT nation, o_year, CAST(ROUND(SUM(amount), 2) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18, 2))
           * (1 - CAST(l_discount AS DECIMAL(4, 2))) AS amount
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN part     ON p_partkey = l_partkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%gear%'
) t
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@query("q9_product_profit", oracle=_Q9_SQL)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: per-nation-per-year profit over a part-name
    pattern. (The canonical Q9 subtracts ps_supplycost; the testdata has
    no partsupp table, so amount is the discounted price — same joins,
    same plan.) The LIKE filter prunes part before the fact join; all
    dims broadcast; partial aggregation runs map-side before the
    (nation x year) shuffle."""
    return spark.sql(_Q9_SQL)


_Q10_SQL = """
SELECT c_custkey, c_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q10_returned_items", oracle=_Q10_SQL)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by lost revenue in a quarter. Both
    selective filters push to the scans before the orders-lineitem join;
    nation broadcasts; the final top-k is a TakeOrdered over the grouped
    result, not a full sort."""
    return spark.sql(_Q10_SQL)


_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@query("q15_top_supplier", oracle=_Q15_SQL)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) achieving the max quarterly revenue. The
    revenue CTE aggregates once; the scalar-max subquery reuses it (one
    extra reduce to a single row, broadcast back as a filter) — no
    window, no second scan of lineitem. Rounding to 2 digits on BOTH the
    CTE and the comparison keeps the float equality engine-portable."""
    return spark.sql(_Q15_SQL)


_Q17_SQL = """
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#13'
  AND l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l_partkey
  )
"""


@query("q17_small_quantity", oracle=_Q17_SQL)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated scalar subquery (per-part average quantity).
    Catalyst decorrelates it into an aggregate-then-join on l_partkey —
    the same shape as above_brand_avg_price — so the 'per row subquery'
    costs one extra aggregation over the brand's lines, not N scans."""
    return spark.sql(_Q17_SQL)


_Q18_SQL = """
SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
       ROUND(SUM(l_quantity), 2) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 120
)
GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@query("q18_large_orders", oracle=_Q18_SQL)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders. The IN-subquery is an aggregate
    producing bare orderkeys -> left-semi join (key-only build side, far
    smaller than the fact); the outer aggregate then runs only on
    surviving orders. Top-100 by price is TakeOrdered."""
    return spark.sql(_Q18_SQL)


_Q21_SQL = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders    ON o_orderkey = l1.l_orderkey
JOIN nation    ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R' AND n_name = 'NATION_1'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


@query("q21_sole_blame_supplier", oracle=_Q21_SQL)
def q21_sole_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely responsible for a failed
    multi-supplier order (EXISTS another supplier's line, NOT EXISTS
    another returned line — return flag stands in for the receipt-delay
    predicate absent from the testdata). Catalyst plans the EXISTS as a
    left-semi and the NOT EXISTS as a left-anti join, both on
    l_orderkey; the nation filter prunes supplier before the fact join;
    top-10 is TakeOrdered."""
    return spark.sql(_Q21_SQL)


_RANGE_JOIN_ORACLE = """
SELECT a.user_id AS user_id, a.event_id AS event_id, a.ts AS ts,
       CAST(COUNT(b.event_id) AS BIGINT) AS n_following
FROM events a LEFT JOIN events b
  ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
GROUP BY a.user_id, a.event_id, a.ts
ORDER BY user_id, event_id
"""


@query("events_following_1h", oracle=_RANGE_JOIN_ORACLE)
def events_following_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range self-join: per event, the count of same-user events in
    the following hour (attribution-window shape).

    Scale: a naive theta-join here is a BroadcastNestedLoopJoin — O(N²)
    comparisons and a corpus broadcast. following_count bin-buckets time
    into Δ-wide bins and equi-joins on (user_id, bin), so the only
    shuffle is a hash join keyed (user, hour-bin) and the per-bucket
    fan-out is bounded by each user's event density, not corpus size
    (operators/rangejoin.py)."""
    from dawis_spark.operators.rangejoin import following_count

    e = spark.table("events").select("user_id", "event_id", "ts")
    return following_count(
        e, ["user_id"], "event_id", "ts", 3600
    ).select("user_id", "event_id", "ts", "n_following").orderBy("user_id", "event_id")


# ---------------------------------------------------------------------------
# Corpus-level training-data ops: vocabulary, packing, decontamination
# ---------------------------------------------------------------------------

def _vocab_oracle(k: int) -> str:
    toks = _TXT.tokens("text", "duck")
    return f"""
WITH t AS (SELECT doc_id, unnest(list_distinct({toks})) AS token FROM documents)
SELECT token, CAST(COUNT(*) AS BIGINT) AS doc_freq
FROM t GROUP BY token
ORDER BY doc_freq DESC, token
LIMIT {k}
"""


@query("vocab_top_tokens", oracle=_vocab_oracle(50))
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building: top-50 tokens by document frequency — the
    input to BPE vocab pruning / idf weighting. Scale: the shuffle
    carries (token, partial count) — vocab-sized, not corpus-sized; the
    top-k is TakeOrdered (operators/corpus.py)."""
    from dawis_spark.operators.corpus import token_document_frequency

    return token_document_frequency(
        spark.table("documents"), "doc_id", "text", top_k=50
    )


def _packing_oracle(budget: int) -> str:
    toks = _TXT.tokens("text", "duck")
    return f"""
WITH t AS (
  SELECT source, doc_id, CAST(len({toks}) AS BIGINT) AS n_tokens FROM documents
)
SELECT source, doc_id, n_tokens,
       CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) - n_tokens) / {budget}) AS BIGINT) AS shard_id
FROM t ORDER BY source, doc_id
"""


@query("doc_packing_shards", oracle=_packing_oracle(4096))
def doc_packing_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequential document packing into 4096-token shards, scoped
    per source — context-window filling for training shards. Packing is
    inherently sequential, so it's windowed per partition key (the
    streams parallelize across sources); never a global order
    (operators/corpus.py)."""
    from dawis_spark.operators.corpus import pack_documents

    return pack_documents(
        spark.table("documents"), "doc_id", "text", "source", 4096
    ).orderBy("source", "doc_id")


def _contamination_oracle(k: int) -> str:
    sh = _TXT.shingle_hashes("text", k, "duck")
    return f"""
WITH h AS (SELECT source, doc_id, unnest({sh}) AS sh FROM documents),
bench AS (SELECT DISTINCT sh FROM h WHERE source = 'src0'),
corpus AS (SELECT doc_id, sh FROM h WHERE source <> 'src0')
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS shared_shingles
FROM corpus JOIN bench USING (sh)
GROUP BY doc_id ORDER BY doc_id
"""


@query("benchmark_contamination", oracle=_contamination_oracle(_SHINGLE_K))
def benchmark_contamination_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test decontamination (GPT-3 appendix C shape): corpus docs
    sharing >= 1 word-3-gram with the 'benchmark' slice (source src0).
    Scale: both sides reduce to (id, 8-byte hash) map-side; one hash
    join on the hash — document bodies never shuffle
    (operators/corpus.py)."""
    from dawis_spark.operators.corpus import benchmark_contamination

    docs = spark.table("documents")
    return benchmark_contamination(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        "doc_id",
        "text",
        shingle_k=_SHINGLE_K,
    ).orderBy("doc_id")


def _split_oracle() -> str:
    h = _TXT.char_hash("concat('split', cast(doc_id as varchar))", "duck")
    return f"""
WITH b AS (SELECT source, doc_id, ({h}) % 100 AS bucket FROM documents)
SELECT source, doc_id,
       CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val'
            ELSE 'test' END AS split
FROM b ORDER BY source, doc_id
"""


@query("dataset_split", oracle=_split_oracle())
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment via salted content
    hash — reproducible across engines and stable under corpus growth
    (a doc's split never changes when others are added). Map-side only
    (operators/corpus.hash_split)."""
    from dawis_spark.operators.corpus import hash_split

    return hash_split(
        spark.table("documents").select("source", "doc_id"),
        "doc_id",
        {"train": 0.90, "val": 0.05, "test": 0.05},  # cumulative edges 90/95/100
    ).orderBy("source", "doc_id")


def _stratified_oracle(n: int) -> str:
    h = _TXT.char_hash("concat('sample', cast(doc_id as varchar))", "duck")
    return f"""
WITH r AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY ({h}), doc_id) AS rk
  FROM documents
)
SELECT source, doc_id FROM r WHERE rk <= {n} ORDER BY source, doc_id
"""


@query("stratified_sample_docs", oracle=_stratified_oracle(5))
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-per-source sample ranked by salted hash — the
    reproducible stand-in for per-stratum random sampling; one window
    pass, no per-group collect (operators/corpus.stratified_sample)."""
    from dawis_spark.operators.corpus import stratified_sample

    return stratified_sample(
        spark.table("documents").select("source", "doc_id"), "source", "doc_id", 5
    ).orderBy("source", "doc_id")


def _clusters_cte(threshold: float) -> str:
    """WITH-prefix computing ``cl(doc_id, cluster_id)`` — the recursive
    transitive closure of the LSH near-dup pair graph (shared by the
    cluster and keep-canonical oracles)."""
    pairs_sql = _lsh_pairs_oracle(threshold).strip().rstrip()
    return f"""
WITH RECURSIVE p AS ({pairs_sql}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM p
  UNION
  SELECT id_b AS src, id_a AS dst FROM p
),
reach(src, dst) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.dst FROM edges e JOIN reach r ON e.dst = r.src
),
cl AS (
  SELECT src AS doc_id, MIN(dst) AS cluster_id
  FROM reach GROUP BY src
)
"""


def _clusters_oracle(threshold: float) -> str:
    return _clusters_cte(threshold) + "SELECT doc_id, cluster_id FROM cl ORDER BY doc_id"


@query("duplicate_clusters", oracle=_clusters_oracle(0.2))
def duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup capstone: near-dup PAIRS (MinHash+LSH, Jaccard >= 0.2)
    -> duplicate CLUSTERS via connected components (min-label
    propagation), so keep-one-per-cluster dedup has its group key.

    Scale: each propagation round is one edges-x-labels join + groupBy
    on node id (same partitioning, AQE reuses the exchange); duplicate
    clusters are near-cliques so rounds ~ diameter ~ 3. The oracle walks
    the same graph with a recursive CTE (operators/dedup.py
    connected_components)."""
    from dawis_spark.operators.dedup import (
        connected_components,
        minhash_near_duplicates,
    )

    # persisted: connected_components reads the pair relation twice
    # (both edge directions) — one evaluation of the LSH pipeline, not two
    pairs = minhash_near_duplicates(
        spark.table("documents"),
        "doc_id",
        "text",
        n_perms=_N_PERMS,
        bands=_BANDS,
        threshold=0.2,
        shingle_k=_SHINGLE_K,
    ).persist()
    return (
        connected_components(pairs)
        .select(F.col("id").alias("doc_id"), "cluster_id")
        .orderBy("doc_id")
    )


def _keep_canonical_oracle(threshold: float) -> str:
    return _clusters_cte(threshold) + """
SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
WHERE cl.cluster_id IS NULL OR d.doc_id = cl.cluster_id
ORDER BY d.doc_id
"""


@query("dedup_keep_canonical", oracle=_keep_canonical_oracle(0.2))
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup DEDUP: pairs (MinHash+LSH) -> clusters
    (connected components) -> keep one doc per cluster (the min-id
    member, which IS the cluster label) plus all unclustered docs.
    This is the actual corpus-shrinking operation a training pipeline
    runs; duplicate_clusters is its diagnostic view.

    Scale: on top of the cluster pass, one id-keyed left join against a
    cluster relation orders smaller than the corpus (AQE broadcasts it
    when tiny) and a map-side survivor filter."""
    from dawis_spark.operators.dedup import (
        connected_components,
        keep_one_per_cluster,
        minhash_near_duplicates,
    )

    pairs = minhash_near_duplicates(
        spark.table("documents"),
        "doc_id",
        "text",
        n_perms=_N_PERMS,
        bands=_BANDS,
        threshold=0.2,
        shingle_k=_SHINGLE_K,
    ).persist()
    clusters = connected_components(pairs)
    return keep_one_per_cluster(
        spark.table("documents"), clusters, "doc_id"
    ).orderBy("doc_id")


def _repetition_oracle(ngram_n: int) -> str:
    toks = _TXT.tokens("text", "duck")
    sh = _TXT.shingles("__toks", ngram_n, "duck")
    tok_sum = "SUM(CASE WHEN u LIKE 't:%' THEN c ELSE 0 END)"
    ng_sum = "SUM(CASE WHEN u LIKE 'g:%' THEN c ELSE 0 END)"
    return f"""
WITH base AS (SELECT doc_id, {toks} AS __toks FROM documents),
units AS (
  SELECT doc_id, unnest(list_concat(
    list_transform(__toks, t -> 't:' || t),
    list_transform({sh}, s -> 'g:' || s))) AS u
  FROM base
),
cnt AS (SELECT doc_id, u, count(*) AS c FROM units GROUP BY doc_id, u)
SELECT doc_id,
  CAST({tok_sum} AS BIGINT) AS n_tokens,
  ROUND(CAST(SUM(CASE WHEN u LIKE 't:%' AND c > 1 THEN c ELSE 0 END) AS DOUBLE)
        / GREATEST({tok_sum}, 1), 6) AS dup_token_frac,
  ROUND(CAST(MAX(CASE WHEN u LIKE 't:%' THEN c END) AS DOUBLE)
        / GREATEST({tok_sum}, 1), 6) AS top_token_frac,
  ROUND(CAST(SUM(CASE WHEN u LIKE 'g:%' AND c > 1 THEN c ELSE 0 END) AS DOUBLE)
        / GREATEST({ng_sum}, 1), 6) AS dup_ngram_frac
FROM cnt GROUP BY doc_id ORDER BY doc_id
"""


@query("repetition_signals", oracle=_repetition_oracle(2))
def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition filters (dup-token
    fraction, top-token weight, dup-2-gram fraction) over the documents
    table — the signals MassiveText-class pipelines threshold on before
    training (operators/textstats.repetition_stats)."""
    return _TS.repetition_stats(
        spark.table("documents"), "doc_id", "text", ngram_n=2
    ).orderBy("doc_id")


_LINED = "replace(replace(text, ' value ', '.' || chr(10)), ' table ', chr(10))"


def _line_quality_oracle(min_words: int) -> str:
    stats = _TS.line_stats_sql("ltext", "duckdb", min_words)
    cols = ",\n  ".join(
        f"CAST({e} AS BIGINT) AS {k}" for k, e in stats.items()
    )
    return f"""
WITH lined AS (SELECT doc_id, {_LINED} AS ltext FROM documents),
counted AS (SELECT doc_id, {cols} FROM lined)
SELECT doc_id, n_lines, n_short_lines, n_unpunct_lines, n_kept_lines,
  ROUND(CAST(n_kept_lines AS DOUBLE) / GREATEST(n_lines, 1), 6) AS kept_line_frac
FROM counted ORDER BY doc_id
"""


@query("c4_line_quality", oracle=_line_quality_oracle(3))
def c4_line_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-filter counters (Raffel et al. 2020 §2.2: drop lines
    without terminal punctuation or with < 3 words). The corpus text is
    single-line, so lines are derived deterministically first (sentence
    breaks at ' value ', bare breaks at ' table ') — same derivation in
    the oracle. Entirely map-side array expressions
    (operators/textstats.line_quality)."""
    lined = spark.table("documents").select(
        "doc_id", F.expr(_LINED).alias("ltext")
    )
    return _TS.line_quality(lined, "doc_id", "ltext", min_words=3).orderBy(
        "doc_id"
    )


def _tfidf_oracle(k: int) -> str:
    toks = _TXT.tokens("text", "duck")
    return f"""
WITH tk AS (SELECT doc_id, unnest({toks}) AS token FROM documents),
tf AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf FROM tk GROUP BY doc_id, token),
dfq AS (SELECT token, CAST(count(*) AS DOUBLE) AS df_t FROM tf GROUP BY token),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, token,
         ROUND(tf * (ln((n_docs + 1) / (df_t + 1)) + 1), 6) AS tfidf
  FROM tf JOIN dfq USING (token) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, token, tfidf,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS BIGINT) AS term_rank
  FROM scored
)
SELECT doc_id, token, tfidf, term_rank FROM ranked
WHERE term_rank <= {k} ORDER BY doc_id, term_rank
"""


@query("tfidf_top_terms", oracle=_tfidf_oracle(3))
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by smooth tf-idf — the
    vocabulary/df relation is vocab-sized, N rides along as a broadcast
    1-row aggregate, and the top-k is a per-document window, never a
    global sort (operators/corpus.tfidf_top_terms)."""
    from dawis_spark.operators.corpus import tfidf_top_terms

    return tfidf_top_terms(
        spark.table("documents"), "doc_id", "text", k=3
    ).orderBy("doc_id", "term_rank")


_BM25_TERMS = ("spark", "hash", "window")


def _bm25_oracle(k1: float, b: float, top_n: int) -> str:
    toks = _TXT.tokens("text", "duck")
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
WITH base AS (SELECT doc_id, {toks} AS __toks FROM documents),
dl AS (SELECT doc_id, CAST(len(__toks) AS DOUBLE) AS dl FROM base),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl),
tk AS (SELECT doc_id, unnest(__toks) AS token FROM base),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf FROM tk
  WHERE token IN ({terms}) GROUP BY doc_id, token
),
dfq AS (SELECT token, CAST(count(*) AS DOUBLE) AS df_t FROM tf GROUP BY token),
scored AS (
  SELECT tf.doc_id,
         ln(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
           * (tf * ({k1} + 1))
           / (tf + {k1} * (1 - {b} + {b} * dl.dl / avgdl)) AS contrib
  FROM tf JOIN dfq USING (token) JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
)
SELECT doc_id, ROUND(SUM(contrib), 6) AS bm25
FROM scored GROUP BY doc_id
ORDER BY bm25 DESC, doc_id LIMIT {top_n}
"""


@query("bm25_search", oracle=_bm25_oracle(1.2, 0.75, 10))
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 documents for a bag-of-words query. The explode
    is filtered to the query terms BEFORE any shuffle — the inverted-index
    access pattern, corpus-size-independent for selective terms
    (operators/corpus.bm25_scores)."""
    from dawis_spark.operators.corpus import bm25_scores

    return bm25_scores(
        spark.table("documents"),
        "doc_id",
        "text",
        list(_BM25_TERMS),
        k1=1.2,
        b=0.75,
        top_n=10,
    )


_CDC_K = 4  # rolling-window width (tokens) for the boundary test
_CDC_MOD = 16  # boundary when window hash % 16 == 0 -> ~16-token chunks


def _cdc_cuts_expr(th: str, dialect: str) -> str:
    """Content-defined cut-point array over a BOUND token-hash array
    column ``th``: positions where the k-token rolling hash hits 0 mod
    _CDC_MOD, with 0 and len appended — bind this in its own projection
    (the _mixed_sql lesson: the chunk fold references it ~6 times)."""
    whs = _TXT.window_hash_structs(th, _CDC_K, dialect)
    if dialect == "spark":
        return (
            f"array_sort(array_distinct(concat(array(0),"
            f" transform(filter({whs}, s -> s.wh % {_CDC_MOD} = 0),"
            f" s -> s.pos + {_CDC_K}), array(size({th})))))"
        )
    return (
        f"list_sort(list_distinct(list_concat(list_concat([0],"
        f" list_transform(list_filter({whs}, s -> s.wh % {_CDC_MOD} = 0),"
        f" s -> s.pos + {_CDC_K})), [len({th})])))"
    )


def _cdc_chunks_expr(th: str, cuts: str, dialect: str) -> str:
    """Per-document CDC chunk array over BOUND ``th`` (token hashes)
    and ``cuts`` (cut points) columns: each chunk a struct (len, ch)
    with ch = the Horner-131 fold of its token hashes. The
    insertion-robust chunking (a one-token edit moves ONE boundary,
    so every other chunk hash survives — the property fixed-width
    chunking lacks and the reason storage dedup uses CDC)."""
    if dialect == "spark":
        return (
            f"case when size({th}) = 0 then"
            " array()"
            f" else transform(sequence(1, size({cuts}) - 1), i -> struct("
            f"{cuts}[i] - {cuts}[i - 1] as len,"
            f" aggregate(slice({th}, {cuts}[i - 1] + 1,"
            f" {cuts}[i] - {cuts}[i - 1]), cast(0 as bigint),"
            f" (h, x) -> (h * 131 + x) % {_TXT.MOD}) as ch)) end"
        )
    return (
        f"CASE WHEN len({th}) = 0 THEN [] ELSE"
        f" list_transform(range(1, len({cuts})), i -> {{"
        f"'len': {cuts}[i + 1] - {cuts}[i],"
        f" 'ch': list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" {th}[{cuts}[i] + 1:{cuts}[i + 1]]),"
        f" (h, x) -> (h * 131 + x) % {_TXT.MOD})}}) END"
    )


def _cdc_oracle() -> str:
    th = _TXT.token_hash_array("text", "duck")
    cuts = _cdc_cuts_expr("__th", "duck")
    chunks = _cdc_chunks_expr("__th", "__cuts", "duck")
    return f"""
WITH th0 AS (SELECT doc_id, source, {th} AS __th FROM documents),
th AS (SELECT doc_id, source, __th, {cuts} AS __cuts FROM th0),
ck AS (SELECT source, unnest({chunks}) AS c FROM th),
flat AS (SELECT source, c.len AS l, c.ch AS ch FROM ck)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(DISTINCT ch) AS BIGINT) AS n_distinct_chunks,
       ROUND(1.0 - CAST(COUNT(DISTINCT ch) AS DOUBLE) / COUNT(*), 6)
         AS chunk_dup_ratio,
       ROUND(CAST(SUM(l) AS DOUBLE) / COUNT(*), 4) AS avg_chunk_tokens
FROM flat GROUP BY source ORDER BY source
"""


@query("cdc_chunk_dedup", oracle=_cdc_oracle())
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup profile per source: documents cut
    where a 4-token rolling hash hits 0 mod 16 (~16-token expected
    chunks), chunk identity = the exact Horner fold of its token
    hashes; reports chunk counts, the cross-document duplicate-chunk
    ratio, and mean chunk size. CDC is the insertion-robust half of
    the dedup family: line_dedup catches exact LINES and
    duplicated_spans fixed-width windows, but a one-token edit shifts
    every downstream fixed window while moving only ONE content-
    defined boundary — so the CDC dup ratio is the honest measure of
    template reuse across a source.

    Exactness: token hashes, window hashes, cut points, and chunk
    folds are all exact int64 mod-1e9+7 arithmetic (functions/text.py
    primitives) — identical both engines; two display divisions.

    Scale: everything up to the explode is per-row array math inside
    the scan (O(tokens x k) per doc); the only exchange carries
    (source, len, chunk-hash int64) — never text."""
    th = _TXT.token_hash_array("text", "spark")
    cuts = _cdc_cuts_expr("__th", "spark")
    chunks = _cdc_chunks_expr("__th", "__cuts", "spark")
    flat = (
        spark.table("documents")
        .selectExpr("doc_id", "source", f"{th} AS __th")
        .selectExpr("source", "__th", f"{cuts} AS __cuts")
        .selectExpr("source", f"explode({chunks}) AS c")
        .selectExpr("source", "c.len AS l", "c.ch AS ch")
    )
    return (
        flat.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.countDistinct("ch").cast("bigint").alias("n_distinct_chunks"),
            F.expr(
                "ROUND(1.0 - CAST(COUNT(DISTINCT ch) AS DOUBLE) / COUNT(*), 6)"
            ).alias("chunk_dup_ratio"),
            F.expr(
                "ROUND(CAST(SUM(l) AS DOUBLE) / COUNT(*), 4)"
            ).alias("avg_chunk_tokens"),
        )
        .orderBy("source")
    )


_QLM_MU = 2000  # Dirichlet smoothing mass (Zhai & Lafferty's standard)
# per-(doc, term) log-likelihood contribution, micro-scaled to an exact
# integer before the per-doc sum — tf/cf/dl/ctot are exact integers, so
# the ln argument is one identical double chain in both engines
_QLM_TERM = (
    "CAST(ROUND(ln((tf + {mu} * (CAST(cf AS DOUBLE) / ctot))"
    " / (dl + {mu})) * 1000000) AS BIGINT)"
)


def _qlm_oracle(top_n: int) -> str:
    toks = _TXT.tokens("text", "duck")
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    term = _QLM_TERM.format(mu=_QLM_MU)
    return f"""
WITH base AS (SELECT doc_id, {toks} AS __toks FROM documents),
dl AS (SELECT doc_id, CAST(len(__toks) AS BIGINT) AS dl FROM base),
ctot AS (SELECT CAST(SUM(dl) AS BIGINT) AS ctot FROM dl),
tk AS (SELECT doc_id, unnest(__toks) AS token FROM base),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM tk
  WHERE token IN ({terms}) GROUP BY doc_id, token),
cf AS (SELECT token, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY token),
grid AS (
  SELECT dl.doc_id, cf.token, cf.cf, dl.dl, ctot.ctot,
         COALESCE(tf.tf, 0) AS tf
  FROM dl CROSS JOIN cf CROSS JOIN ctot
  LEFT JOIN tf ON tf.doc_id = dl.doc_id AND tf.token = cf.token),
scored AS (
  SELECT doc_id, CAST(SUM({term}) AS BIGINT) AS s6
  FROM grid GROUP BY doc_id)
SELECT doc_id, ROUND(CAST(s6 AS DOUBLE) / 1000000, 6) AS qlm_loglik
FROM scored ORDER BY s6 DESC, doc_id LIMIT {top_n}
"""


@query("qlm_dirichlet_search", oracle=_qlm_oracle(10))
def qlm_dirichlet_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood language-model retrieval with Dirichlet
    smoothing (mu = 2000) for the shared 3-term query: score(d) =
    sum_t ln((tf_td + mu * cf_t/|C|) / (|d| + mu)) — the third classic
    ranking family beside tf-idf (vector space) and bm25
    (probabilistic): the LM view scores how likely the DOCUMENT's
    language model is to emit the query, and its smoothing term means
    documents missing a term are still comparable (no zero-knockout).
    Top-10 with (score, doc_id) tie order.

    Exactness: tf/cf/dl/|C| are exact integers; each (doc, term)
    contribution pays one ln over an identical double chain and rounds
    to micro units BEFORE the per-doc sum, so ordering is exact
    (ties broken on exact integers).

    Scale: the explode is term-filtered before any shuffle (inverted-
    index posture); the grid is |docs| x |terms| with the 3-row term
    stats broadcast — one scan, one doc-keyed aggregate, TakeOrdered
    top-10."""
    toks = _TXT.tokens("text", "spark")
    term = _QLM_TERM.format(mu=_QLM_MU)
    base = spark.table("documents").select(
        "doc_id", F.expr(toks).alias("__toks")
    )
    dl = base.select(
        "doc_id", F.expr("CAST(size(__toks) AS BIGINT)").alias("dl")
    )
    ctot = dl.agg(F.sum("dl").cast("bigint").alias("ctot"))
    tf = (
        base.select("doc_id", F.explode("__toks").alias("token"))
        .filter(F.col("token").isin(list(_BM25_TERMS)))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    cf = tf.groupBy("token").agg(F.sum("tf").cast("bigint").alias("cf"))
    grid = (
        dl.crossJoin(F.broadcast(cf))
        .crossJoin(F.broadcast(ctot))
        .join(tf, ["doc_id", "token"], "left")
        .selectExpr("doc_id", "cf", "dl", "ctot", "COALESCE(tf, 0) AS tf")
    )
    scored = grid.groupBy("doc_id").agg(
        F.expr(f"CAST(SUM({term}) AS BIGINT)").alias("s6")
    )
    return (
        scored.orderBy(F.desc("s6"), "doc_id")
        .limit(10)
        .selectExpr(
            "doc_id", "ROUND(CAST(s6 AS DOUBLE) / 1000000, 6) AS qlm_loglik"
        )
    )


from dawis_spark.functions import pii as _PII


def _pii_text(dialect: str) -> str:
    """text + a deterministic PII suffix (the synthetic corpus contains no
    organic PII, so the query plants one email/IP/phone per doc, keyed off
    doc_id, identically in both dialects)."""
    cast = "cast({} as string)" if dialect == "spark" else "CAST({} AS VARCHAR)"
    return (
        "text || ' contact user' || " + cast.format("doc_id")
        + " || '@mail' || " + cast.format("doc_id % 7")
        + " || '.example.com from 10.0.' || " + cast.format("doc_id % 250")
        + " || '.' || " + cast.format("doc_id % 9")
        + " || ' tel +49 30 1234 5' || " + cast.format("doc_id % 100")
    )


def _pii_oracle() -> str:
    counts = _PII.pii_counts_sql("ptext", "duckdb")
    cols = ",\n  ".join(f"CAST({e} AS BIGINT) AS {k}" for k, e in counts.items())
    red = _PII.redact_sql("ptext", "duckdb")
    return f"""
WITH p AS (SELECT doc_id, {_pii_text('duckdb')} AS ptext FROM documents)
SELECT doc_id,
  {cols},
  {red} AS redacted
FROM p ORDER BY doc_id
"""


@query("pii_redaction", oracle=_pii_oracle())
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the corpus: count + redact emails, IPv4s, and
    phone numbers with dual-rendered backslash-free regexes
    (functions/pii.py). Pure map over the scan — zero shuffles at any
    scale; the value-hash compares the redacted strings byte-for-byte."""
    p = spark.table("documents").select(
        "doc_id", F.expr(_pii_text("spark")).alias("ptext")
    )
    counts = _PII.pii_counts_sql("ptext", "spark")
    return p.select(
        "doc_id",
        *[F.expr(e).cast("bigint").alias(k) for k, e in counts.items()],
        F.expr(_PII.redact_sql("ptext", "spark")).alias("redacted"),
    ).orderBy("doc_id")


_ASOF_ORACLE = """
WITH c AS (
  SELECT user_id, ts, event_id AS click_id FROM events WHERE event_type = 'click'
),
p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
j AS (
  SELECT p.event_id, p.user_id, p.ts, c.click_id, c.ts AS click_ts,
         row_number() OVER (
           PARTITION BY p.event_id ORDER BY c.ts DESC, c.click_id DESC
         ) AS rn
  FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
)
SELECT event_id, user_id, ts, click_id, click_ts
FROM j WHERE rn = 1 ORDER BY event_id
"""


@query("asof_last_click", oracle=_ASOF_ORACLE)
def asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every purchase matched to the user's most recent click
    at or before it (operators/asof.py). One union + one window per user
    — linear merge-join shape, vs the oracle's backward range join whose
    row inflation is the average click history per user."""
    from dawis_spark.operators.asof import asof_join

    ev = spark.table("events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        purchases,
        clicks,
        keys=["user_id"],
        time_col="ts",
        payload_cols=["click_id"],
        right_order="click_id",
        right_time_as="click_ts",
    ).select("event_id", "user_id", "ts", "click_id", "click_ts").orderBy("event_id")


_HYPER_SQL = """
SELECT
  CASE WHEN GROUPING(d) = 0 THEN 'day'
       WHEN GROUPING(w) = 0 THEN 'week'
       ELSE 'month' END AS grain,
  COALESCE(d, w, m) AS bucket,
  event_type,
  ROUND(SUM(value), 2) AS sum_value,
  COUNT(*) AS n_events
FROM (
  SELECT date_trunc('day', ts) AS d, date_trunc('week', ts) AS w,
         date_trunc('month', ts) AS m, event_type, value
  FROM events
) t
GROUP BY GROUPING SETS ((d, event_type), (w, event_type), (m, event_type))
ORDER BY grain, bucket, event_type
"""


@query("hypertable_rollup", oracle=_HYPER_SQL)
def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain continuous aggregate (the hypertable rollup pattern):
    day, week, and month buckets per event type computed in ONE scan via
    GROUPING SETS — Spark expands the sets map-side and partial-aggregates
    each, so the fact table is read once, not three times. Identical SQL
    text runs on both engines (date_trunc semantics agree: ISO weeks)."""
    return spark.sql(_HYPER_SQL)


_INCR_ROLLUP_ORACLE = """
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS v_sum,
  MIN(value) AS v_min, MAX(value) AS v_max,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("incremental_rollup_2ticks", oracle=_INCR_ROLLUP_ORACLE)
def incremental_rollup_2ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate MAINTENANCE, oracle-proven: the fact table is
    split into two interleaved batches (event_id parity — deliberately
    not time-ordered), each merged into a stored rollup by
    operators/rollup.update_rollup; the final rollup must hash-match a
    single-shot GROUP BY over ALL facts. This is the re-aggregatability
    invariant every incremental materialized view relies on: partials
    (count, decimal sum, min, max) merge associatively, derived metrics
    (avg) compute at read time.

    Scale: per-tick cost is one groupBy over the NEW slice plus a merge
    groupBy over (rollup ∪ batch partials) — grain-sized, independent of
    history length. Sums run on DECIMAL so any batch split produces
    bit-identical results (double summation order would drift)."""
    import shutil

    from dawis_spark.catalog import Warehouse
    from dawis_spark.operators.rollup import update_rollup

    root = "/root/repo/spark-warehouse/incr_rollup_demo"
    shutil.rmtree(root, ignore_errors=True)  # idempotent re-runs
    wh = Warehouse(spark, root)
    events = spark.table("events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "event_type",
        "value",
        "event_id",
    )
    measures = {
        "n_events": ("sum", F.count(F.lit(1)).cast("bigint")),
        "v_sum": ("sum", F.sum(F.col("value").cast("decimal(18,6)"))),
        "v_min": ("min", F.min("value")),
        "v_max": ("max", F.max("value")),
    }
    keys = ["day", "event_type"]
    update_rollup(wh, "rollup", events.filter("event_id % 2 = 0"), keys, measures)
    merged = update_rollup(
        wh, "rollup", events.filter("event_id % 2 = 1"), keys, measures
    )
    return merged.select(
        "day",
        "event_type",
        "n_events",
        F.round("v_sum", 2).cast("double").alias("v_sum"),
        "v_min",
        "v_max",
        F.round(F.col("v_sum").cast("double") / F.col("n_events"), 6).alias(
            "avg_value"
        ),
    ).orderBy("day", "event_type")


_Q2_SQL = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
europe AS (
  SELECT s_suppkey, s_acctbal, s_name, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT s.s_acctbal, s.s_name, s.n_name, p.p_partkey, p.p_name,
       ROUND(c.unit_cost, 2) AS unit_cost
FROM part p
JOIN cost c ON c.l_partkey = p.p_partkey
JOIN europe s ON s.s_suppkey = c.l_suppkey
WHERE p.p_type = 'SMALL' AND p.p_size = 5
  AND c.unit_cost = (
    SELECT MIN(c2.unit_cost) FROM cost c2
    JOIN europe s2 ON s2.s_suppkey = c2.l_suppkey
    WHERE c2.l_partkey = p.p_partkey
  )
ORDER BY s.s_acctbal DESC, s.n_name, s.s_name, p.p_partkey
LIMIT 100
"""


@query("q2_min_cost_supplier", oracle=_Q2_SQL)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier with a correlated scalar
    subquery), adapted: the testdata has no partsupp, so supply cost is
    the observed MIN(l_extendedprice/l_quantity) per (part, supplier).
    Catalyst decorrelates the subquery into a per-part min + self-join;
    nation/region/supplier dims broadcast."""
    return spark.sql(_Q2_SQL)


_Q11_SQL = """
WITH val AS (
  SELECT l_partkey, SUM(l_extendedprice) AS part_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY l_partkey
)
SELECT l_partkey, ROUND(part_value, 2) AS part_value
FROM val
WHERE part_value > (SELECT SUM(part_value) * 0.0015 FROM val)
ORDER BY part_value DESC, l_partkey
"""


@query("q11_important_stock", oracle=_Q11_SQL)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (group value vs a global-total scalar subquery),
    adapted to lineitem-derived part value for one nation's suppliers
    (no partsupp table). The HAVING threshold is an uncorrelated scalar
    subquery — one extra reduction over the SAME aggregate, which Spark
    reuses via a subquery broadcast, not a rescan."""
    return spark.sql(_Q11_SQL)


_Q16_SQL = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#2'
  AND p_type NOT LIKE 'ECONOMY%'
  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@query("q16_supplier_relationship", oracle=_Q16_SQL)
def q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (distinct-supplier count per part attribute with a
    NOT IN anti-join), adapted: lineitem is the part-supplier bridge (no
    partsupp) and the complaints filter becomes a negative-balance filter
    (no s_comment column). Anti-join broadcasts the tiny supplier
    exclusion set; COUNT(DISTINCT) expands map-side."""
    return spark.sql(_Q16_SQL)


_Q20_SQL = """
WITH shipped AS (
  SELECT l_suppkey, l_partkey,
         SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                   AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
                  THEN l_quantity ELSE 0 END) AS qty_1996,
         SUM(l_quantity) AS qty_total
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'small%'
  GROUP BY l_suppkey, l_partkey
)
SELECT DISTINCT s_name, n_name
FROM shipped
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE qty_1996 > 0.5 * qty_total
ORDER BY s_name
"""


@query("q20_excess_shippers", oracle=_Q20_SQL)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers whose recent movement of a part family
    exceeds half their total), adapted: availability comes from shipped
    quantities (no partsupp). The year/total comparison is a conditional
    aggregation in ONE pass over the filtered fact — no self-join of
    lineitem; the part-name filter prunes before the shuffle."""
    return spark.sql(_Q20_SQL)


def _ann_recall_oracle(k: int) -> str:
    exact = _embedding_topk_oracle(k, 10).strip()
    approx = _ann_lsh_oracle(k, 10, 4, 64).strip()
    return f"""
WITH exact_r AS (SELECT * FROM ({exact})),
approx_r AS (SELECT * FROM ({approx}))
SELECT e.query_id,
  CAST(COUNT(a.neighbor_id) AS BIGINT) AS hits,
  ROUND(CAST(COUNT(a.neighbor_id) AS DOUBLE) / {k}, 6) AS recall_at_k
FROM exact_r e
LEFT JOIN approx_r a
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id ORDER BY e.query_id
"""


@query("ann_recall_lsh", oracle=_ann_recall_oracle(5))
def ann_recall_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-evaluation of the ANN index: recall@5 of the sign-LSH path
    against the exact brute-force top-5, per query — the metric an index
    tuner watches when trading planes/probes against recall. Both sides
    reuse the production operators; the comparison join is on
    (query_id, neighbor_id) — top-k-sized, negligible at any scale."""
    from dawis_spark.operators.similarity import brute_force_topk, lsh_ann_topk

    emb = spark.table("embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(
        corpus=emb, queries=queries_df, id_col="vec_id",
        vec_col="embedding", k=5,
    ).select("query_id", "neighbor_id")
    approx = lsh_ann_topk(
        corpus=emb, queries=queries_df, id_col="vec_id",
        vec_col="embedding", k=5, n_planes=4, dim=64,
    ).select(
        F.col("query_id").alias("a_qid"), F.col("neighbor_id").alias("a_nid")
    )
    joined = exact.join(
        approx,
        (exact["query_id"] == approx["a_qid"])
        & (exact["neighbor_id"] == approx["a_nid"]),
        "left",
    )
    return (
        joined.groupBy("query_id")
        .agg(
            F.count("a_nid").cast("bigint").alias("hits"),
            F.round(F.count("a_nid").cast("double") / F.lit(5), 6).alias(
                "recall_at_k"
            ),
        )
        .orderBy("query_id")
    )


# skew profile legs: (key name, table, key column) — the three join keys
# the relational spine actually shuffles on
_SKEW_LEGS = (
    ("orders.o_custkey", "orders", "o_custkey"),
    ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
    ("events.user_id", "events", "user_id"),
)


def _skew_leg_sql(name: str, table: str, col: str) -> str:
    return f"""
SELECT '{name}' AS join_key,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       CAST(MAX(c) AS BIGINT) AS max_key_rows,
       ROUND(CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c), 4)
         AS max_over_mean,
       ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top1_share
FROM (SELECT {col} AS k, CAST(COUNT(*) AS BIGINT) AS c
      FROM {table} GROUP BY 1)"""


_SKEW_PROFILE_ORACLE = (
    "\nUNION ALL\n".join(_skew_leg_sql(*leg) for leg in _SKEW_LEGS)
    + "\nORDER BY join_key"
)


@query("join_key_skew_profile", oracle=_SKEW_PROFILE_ORACLE)
def join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew profile for the three join keys the relational
    spine actually exchanges on: per key, the distinct-key count, row
    count, heaviest key's row count, its ratio over the mean key size
    (the number AQE's skew-join threshold reasons about), and its share
    of all rows. The planning input for the salting/whale-guard
    machinery — you measure skew BEFORE choosing between a plain
    shuffle join, a broadcast, or salted_skew_join, and at 100 TB this
    profile is the difference between a plan that finishes and one
    straggler task that doesn't.

    Exactness: all counts exact integers from one keyed aggregate per
    leg; two display divisions. Scale: each leg is one map-partial
    groupBy collapsing to a 1-row summary — the profile costs a
    fraction of any join it informs."""
    out = None
    for name, table, col in _SKEW_LEGS:
        per_key = (
            spark.table(table)
            .groupBy(F.col(col).alias("k"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
        leg = per_key.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum("c").cast("bigint").alias("n_rows"),
            F.max("c").cast("bigint").alias("max_key_rows"),
        ).selectExpr(
            f"'{name}' AS join_key",
            "n_keys",
            "n_rows",
            "max_key_rows",
            "ROUND(CAST(max_key_rows AS DOUBLE) * n_keys / n_rows, 4)"
            " AS max_over_mean",
            "ROUND(CAST(max_key_rows AS DOUBLE) / n_rows, 6) AS top1_share",
        )
        out = leg if out is None else out.unionByName(leg)
    return out.orderBy("join_key")


_SALTED_JOIN_ORACLE = """
WITH dim(event_type, weight) AS (
  VALUES ('click', 2), ('error', 5), ('purchase', 4), ('signup', 3), ('view', 1)
)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,6)) * d.weight), 2) AS DOUBLE) AS weighted_value
FROM events e JOIN dim d ON e.event_type = d.event_type
GROUP BY e.event_type
ORDER BY e.event_type
"""


@query("salted_skew_join", oracle=_SALTED_JOIN_ORACLE)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicitly salted join over a pathologically skewed key: events has
    only 5 distinct event_type values, so an unsalted shuffle join tops
    out at 5 active tasks no matter how many executors exist. salted_join
    (operators/skew.py) scatters the big side across salt_buckets
    sub-keys and replicates the small side once per bucket — 5 keys
    become 40 shuffle partitionable keys, restoring parallelism. The
    result is provably identical to the plain join (the oracle IS the
    plain join); at this dim size broadcast would also work — salting is
    the tool when the small side exceeds the broadcast budget or the
    planner is stuck on sort-merge. Sums run on DECIMAL so both engines
    agree to the last bit regardless of summation order."""
    from dawis_spark.operators.skew import salted_join

    dim = spark.createDataFrame(
        [("click", 2), ("error", 5), ("purchase", 4), ("signup", 3), ("view", 1)],
        "event_type string, weight int",
    )
    joined = salted_join(
        spark.table("events").select("event_type", "value"),
        dim,
        "event_type",
        salt_buckets=8,
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)") * F.col("weight")), 2
            )
            .cast("double")
            .alias("weighted_value"),
        )
        .orderBy("event_type")
    )


def _ann_recall_multiprobe_oracle(k: int) -> str:
    exact = _embedding_topk_oracle(k, 10).strip()
    approx = _ann_lsh_multiprobe_oracle(k, 10, 4, 64).strip()
    return f"""
WITH exact_r AS (SELECT * FROM ({exact})),
approx_r AS (SELECT * FROM ({approx}))
SELECT e.query_id,
  CAST(COUNT(a.neighbor_id) AS BIGINT) AS hits,
  ROUND(CAST(COUNT(a.neighbor_id) AS DOUBLE) / {k}, 6) AS recall_at_k
FROM exact_r e
LEFT JOIN approx_r a
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id ORDER BY e.query_id
"""


@query("ann_recall_lsh_multiprobe", oracle=_ann_recall_multiprobe_oracle(5))
def ann_recall_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 of the MULTI-PROBE sign-LSH path against exact brute-force
    — the companion metric to ann_recall_lsh that quantifies what the
    Hamming-1 probe set buys (0.36 -> 0.76 recall on this corpus at
    sf0.01). Same top-k-sized comparison join."""
    from dawis_spark.operators.similarity import brute_force_topk, lsh_ann_topk

    emb = spark.table("embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(
        corpus=emb, queries=queries_df, id_col="vec_id",
        vec_col="embedding", k=5,
    ).select("query_id", "neighbor_id")
    approx = lsh_ann_topk(
        corpus=emb, queries=queries_df, id_col="vec_id",
        vec_col="embedding", k=5, n_planes=4, dim=64, multi_probe=True,
    ).select(
        F.col("query_id").alias("a_qid"), F.col("neighbor_id").alias("a_nid")
    )
    joined = exact.join(
        approx,
        (exact["query_id"] == approx["a_qid"])
        & (exact["neighbor_id"] == approx["a_nid"]),
        "left",
    )
    return (
        joined.groupBy("query_id")
        .agg(
            F.count("a_nid").cast("bigint").alias("hits"),
            F.round(F.count("a_nid").cast("double") / F.lit(5), 6).alias(
                "recall_at_k"
            ),
        )
        .orderBy("query_id")
    )


def _chunk_docs_oracle(chunk: int, overlap: int) -> str:
    stride = chunk - overlap
    toks = _TXT.tokens("text", "duck")
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
n AS (
  SELECT doc_id, toks,
         greatest(1, CAST(ceil((len(toks) - {chunk}) / {stride}.0) AS BIGINT) + 1) AS nc
  FROM t
),
c AS (
  SELECT doc_id, unnest(range(0, nc)) AS chunk_id, toks FROM n
),
s AS (
  SELECT doc_id, chunk_id,
         list_slice(toks, chunk_id * {stride} + 1, chunk_id * {stride} + {chunk}) AS ch
  FROM c
)
SELECT doc_id, chunk_id,
       CAST(len(ch) AS BIGINT) AS n_chunk_tokens,
       array_to_string(ch, ' ') AS chunk_text
FROM s ORDER BY doc_id, chunk_id
"""


@query("chunk_documents", oracle=_chunk_docs_oracle(64, 8))
def chunk_documents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-stride context-window chunking (64-token windows, 8-token
    overlap) — the step between cleaned documents and training
    sequences; pack_documents bins the output. Pure map-side array
    arithmetic: tokenize once, explode window offsets, slice — zero
    shuffles besides the output sort."""
    from dawis_spark.operators.corpus import chunk_documents

    return chunk_documents(
        spark.table("documents"), "doc_id", "text", chunk_tokens=64, overlap=8
    ).orderBy("doc_id", "chunk_id")


def _corpus_filter_oracle(
    keep_lang: str, min_quality: float, min_tokens: int
) -> str:
    lang = _lang_id_oracle().strip()
    qual = _quality_oracle().strip()
    return f"""
WITH l AS (SELECT doc_id, lang_pred FROM ({lang})),
qq AS (SELECT doc_id, n_tokens, quality FROM ({qual})),
kept AS (
  SELECT d.doc_id, d.source, d.text, l.lang_pred, qq.n_tokens, qq.quality
  FROM documents d JOIN l USING (doc_id) JOIN qq USING (doc_id)
  WHERE l.lang_pred = '{keep_lang}'
    AND qq.quality >= {min_quality} AND qq.n_tokens >= {min_tokens}
),
dedup AS (
  SELECT *, row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS __rn
  FROM kept
)
SELECT doc_id, source, lang_pred, n_tokens, quality
FROM dedup WHERE __rn = 1 ORDER BY doc_id
"""


@query("corpus_filter_pipeline", oracle=_corpus_filter_oracle("en", 0.65, 10))
def corpus_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship training-data composition: language gate -> quality
    gate -> length gate -> exact dedup, producing the surviving corpus.

    Scale shape (operators/corpus.corpus_filter): every signal evaluates
    in ONE map-side projection over a single scan — the oracle composes
    the standalone language/quality SQL for readability, but the Spark
    plan never rescans or self-joins the corpus. Filters precede the
    plan's only shuffle (the dedup exchange on 32-byte sha2 digests), so
    rejected documents never leave their input partition."""
    from dawis_spark.operators.corpus import corpus_filter

    return corpus_filter(
        spark.table("documents"),
        "doc_id",
        "text",
        keep_lang="en",
        min_quality=0.65,
        min_tokens=10,
        extra_cols=("source",),
    ).orderBy("doc_id")


def _source_rollup_oracle() -> str:
    quality = _quality_oracle().strip()
    return f"""
WITH q AS (SELECT * FROM ({quality}))
SELECT d.source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(DISTINCT sha256(d.text)) AS BIGINT) AS n_distinct_texts,
  ROUND(1.0 - COUNT(DISTINCT sha256(d.text)) / CAST(COUNT(*) AS DOUBLE), 6) AS dup_frac,
  ROUND(AVG(CAST(q.n_tokens AS DOUBLE)), 2) AS avg_tokens,
  ROUND(AVG(q.quality), 4) AS avg_quality
FROM documents d JOIN q ON d.doc_id = q.doc_id
GROUP BY d.source ORDER BY d.source
"""


@query("source_quality_rollup", oracle=_source_rollup_oracle())
def source_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-reputation rollup — the per-domain health table a crawl
    pipeline keeps: volume, exact-dup rate, mean length and quality per
    source. Composes the production quality_score operator with a
    distinct-count on sha2(text): the exchange for the distinct carries
    32-byte digests, never document bodies — same cardinality (SHA-256
    collisions are negligible), scale-safe shuffle width. DuckDB's
    sha256() mirrors it on the oracle side. Single scan: quality_score
    passes source/text through (extra_cols) instead of self-joining the
    corpus back on doc_id."""
    docs = spark.table("documents")
    scored = _TS.quality_score(
        docs, "doc_id", "text", extra_cols=("source", "text")
    ).select("doc_id", "source", "text", "n_tokens", "quality")
    digest = F.sha2(F.col("text"), 256)
    return (
        scored
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct(digest).cast("bigint").alias("n_distinct_texts"),
            F.round(
                1.0 - F.countDistinct(digest) / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("dup_frac"),
            F.round(F.avg(F.col("n_tokens").cast("double")), 2).alias("avg_tokens"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
        )
        .orderBy("source")
    )


_DUPS_PARITY_ORACLE = """
WITH g AS (
  SELECT p_name,
         list_sort(list_transform(list(p_partkey), x -> CAST(x AS VARCHAR))) AS ids
  FROM part GROUP BY p_name HAVING count(*) > 1
),
x AS (SELECT p_name, ids, unnest(ids) AS id FROM g)
SELECT id AS p_partkey, p_name,
       array_to_string(list_filter(ids, v -> v != id), ', ') AS diff
FROM x
ORDER BY p_name, p_partkey
"""


@query("duplicate_detection_parity", oracle=_DUPS_PARITY_ORACLE)
def duplicate_detection_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 duplicate detection, exact reference diff format (metatags.py:
    277-377): every member lists EVERY other member — opt-in because the
    format itself is quadratic in group size; ``duplicate_detection`` (the
    capped form) is the pipeline default."""
    from dawis_spark.operators.dedup import exact_duplicate_groups

    return exact_duplicate_groups(
        spark.table("part"), id_col="p_partkey", value_col="p_name"
    ).orderBy("p_name", "p_partkey")


_DUPS_HOT_ORACLE = f"""
WITH g AS (
  SELECT p_brand,
         list_sort(list_transform(list(p_partkey), x -> CAST(x AS VARCHAR))) AS ids
  FROM part GROUP BY p_brand HAVING count(*) > 1
),
x AS (SELECT p_brand, ids, unnest(ids) AS id FROM g)
SELECT id AS p_partkey, p_brand,
       array_to_string(list_slice(list_filter(ids, v -> v != id), 1, {_DUPS_CAP}), ', ') AS diff
FROM x
ORDER BY p_brand, p_partkey
"""


@query("duplicate_groups_hot_key", oracle=_DUPS_HOT_ORACLE)
def duplicate_groups_hot_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capped duplicate-diff path under a HOT value: ~25 distinct
    p_brand values over the whole part table means groups of hundreds at
    sf0.01 (millions at scale) — exactly the pathological case the cap
    exists for. The bounded plan (row_number top-K+1, never a whole-group
    collect_list) emits one linear-size row per member; the oracle mirrors
    the first-K-sorted-other-ids semantics with list_slice."""
    from dawis_spark.operators.dedup import exact_duplicate_groups

    return exact_duplicate_groups(
        spark.table("part"),
        id_col="p_partkey",
        value_col="p_brand",
        max_diff_ids=_DUPS_CAP,
    ).orderBy("p_brand", "p_partkey")


def _pq_ctes(n_sub: int, ds: int, ks: int) -> str:
    """DuckDB replay of PQ training (1 Lloyd round, L2 per subspace) and
    corpus encoding — mirrors operators/similarity.pq_train/pq_encode
    bit-for-bit: init = slices of the ks lowest-id vectors rounded to 6,
    assignment = argmin of 6-digit-rounded L2^2 with lowest-code
    tie-break, update = per-(m,code,pos) avg rounded to 6. Ends with
    cb(m, code, cv) and codes(vec_id, m, code).

    Training (a1/upd) reads only the ``TRAIN_SAMPLE_LIMIT`` lowest-id
    prefix, mirroring pq_train's bounded driver sample (ADVICE r6);
    encoding (codes) still covers the full corpus."""
    l2_init = _VEC.l2_sq("s.sv", "ini.cv", "duck")
    l2_enc = _VEC.l2_sq("s.sv", "cb.cv", "duck")
    return f"""
v AS (SELECT vec_id, embedding AS vec FROM embeddings),
sub AS (
  SELECT vec_id, sp.m AS m,
         list_transform(range(sp.m * {ds} + 1, sp.m * {ds} + {ds} + 1),
                        ix -> CAST(vec[ix] AS DOUBLE)) AS sv
  FROM v, range(0, {n_sub}) sp(m)
),
init AS (
  SELECT s.m, row_number() OVER (PARTITION BY s.m ORDER BY s.vec_id) - 1 AS code,
         list_transform(s.sv, x -> round(x, 6)) AS cv
  FROM sub s
  WHERE s.vec_id IN (SELECT vec_id FROM v ORDER BY vec_id LIMIT {ks})
),
a1 AS (
  SELECT s.vec_id, s.m, s.sv,
    (SELECT ini.code FROM init ini WHERE ini.m = s.m
     ORDER BY round({l2_init}, 6) ASC, ini.code LIMIT 1) AS code
  FROM sub s
  WHERE s.vec_id IN (SELECT vec_id FROM v ORDER BY vec_id LIMIT {TRAIN_SAMPLE_LIMIT})
),
upd AS (
  SELECT m, code, r.pos AS pos, round(avg(sv[r.pos]), 6) AS c
  FROM a1, range(1, {ds + 1}) r(pos)
  GROUP BY m, code, r.pos
),
cb1a AS (SELECT m, code, list(c ORDER BY pos) AS cv FROM upd GROUP BY m, code),
cb AS (
  SELECT ini.m, ini.code, COALESCE(u.cv, ini.cv) AS cv
  FROM init ini LEFT JOIN cb1a u ON ini.m = u.m AND ini.code = u.code
),
codes AS (
  SELECT s.vec_id, s.m,
    (SELECT cb.code FROM cb WHERE cb.m = s.m
     ORDER BY round({l2_enc}, 6) ASC, cb.code LIMIT 1) AS code
  FROM sub s
)"""


def _pq_codes_oracle(n_sub: int, ds: int, ks: int) -> str:
    return f"""
WITH {_pq_ctes(n_sub, ds, ks)}
SELECT vec_id, m, code FROM codes ORDER BY vec_id, m
"""


@query("embedding_pq_codes", oracle=_pq_codes_oracle(4, 16, 16))
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encode (Jegou et al. 2011): train 4 per-
    subspace codebooks of 16 codes (one Lloyd round, L2, deterministic
    init + 6-digit rounding) and compress every 64-float embedding to 4
    small codes — 256 B -> 4 B, the write path that makes a 100 TB
    embedding table scannable. Training shuffles only (m, code, pos,
    partial-avg); encoding is pure map-side codegen. Emitted exploded as
    one (vec_id, m, code) row per subspace so every cell is a scalar the
    comparison harness can sort/hash. The oracle replays training AND
    encoding in DuckDB."""
    from dawis_spark.operators.similarity import pq_encode, pq_train

    emb = spark.table("embeddings")
    books = pq_train(emb, "vec_id", "embedding", n_subspaces=4, n_codes=16)
    return (
        pq_encode(emb, "vec_id", "embedding", books)
        .select(F.col("id").alias("vec_id"), F.posexplode("codes").alias("m", "code"))
        .orderBy("vec_id", "m")
    )


def _pq_ann_oracle(k: int, n_queries: int, n_sub: int, ds: int, ks: int) -> str:
    nsq_cv = _VEC.norm_sq("cb.cv", "duck")
    dot_qc = _VEC.dot("q.sv", "cb.cv", "duck")
    qn_v = _VEC.norm_sq("vec", "duck")
    fold = "list_reduce(list_prepend(CAST(0 AS DOUBLE), {}), (s, acc_v) -> s + acc_v)"
    return f"""
WITH {_pq_ctes(n_sub, ds, ks)},
nsq AS (
  SELECT c.vec_id, c.m, {nsq_cv} AS nsq
  FROM codes c JOIN cb ON c.m = cb.m AND c.code = cb.code
),
recon AS (
  SELECT vec_id, {fold.format("list(nsq ORDER BY m)")} AS xsq
  FROM nsq GROUP BY vec_id
),
ipm AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.m, {dot_qc} AS ipm
  FROM sub q
  JOIN codes c ON q.m = c.m
  JOIN cb ON c.m = cb.m AND c.code = cb.code
  WHERE q.vec_id < {n_queries}
),
ip AS (
  SELECT query_id, neighbor_id, {fold.format("list(ipm ORDER BY m)")} AS ip
  FROM ipm GROUP BY query_id, neighbor_id
),
qn AS (SELECT vec_id AS query_id, sqrt({qn_v}) AS qn FROM v WHERE vec_id < {n_queries}),
scored AS (
  SELECT ip.query_id, ip.neighbor_id,
         round(ip.ip / nullif(qn.qn * sqrt(r.xsq), 0), 6) AS cosine
  FROM ip
  JOIN qn USING (query_id)
  JOIN recon r ON r.vec_id = ip.neighbor_id
  WHERE ip.query_id != ip.neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
ORDER BY query_id, rank
"""


@query("embedding_ann_pq", oracle=_pq_ann_oracle(5, 10, 4, 16, 16))
def embedding_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-k (ADC linear scan, Jegou et al. §4.1):
    per query, a lookup table of <query-slice, sub-centroid> inner
    products against the literal codebooks; per pair, the approximate
    cosine is 4 array lookups + adds over the 4-byte codes. The corpus
    side reads only (id, codes) — at 100 TB the scan is ~64x lighter
    than raw vectors, and no shuffle ever carries a vector. Oracle
    replays train + encode + ADC scoring in one SQL."""
    from dawis_spark.operators.similarity import pq_topk, pq_train

    emb = spark.table("embeddings")
    books = pq_train(emb, "vec_id", "embedding", n_subspaces=4, n_codes=16)
    return pq_topk(
        corpus=emb,
        queries=emb.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        books=books,
    ).orderBy("query_id", "rank")


def _ivfpq_oracle(
    k: int, n_queries: int, n_cent: int, n_probe: int, n_sub: int, ds: int, ks: int,
    dim: int,
) -> str:
    """IVFPQ replay with the TRAINED coarse quantizer: the ``cent`` CTE is
    the one-round-k-means chain (km_ prefix), mirroring the library's
    trained-by-default quantizer."""
    cos_vc = _VEC.cosine("vec", "cvec", "duck")
    nsq_cv = _VEC.norm_sq("cb.cv", "duck")
    dot_qc = _VEC.dot("q.sv", "cb.cv", "duck")
    qn_v = _VEC.norm_sq("vec", "duck")
    fold = "list_reduce(list_prepend(CAST(0 AS DOUBLE), {}), (s, acc_v) -> s + acc_v)"
    return f"""
WITH {_pq_ctes(n_sub, ds, ks)},
{_kmeans_c1_ctes(n_cent, dim, "km_")},
cent AS (SELECT cid, cvec FROM km_c1),
corpus_aff AS (
  SELECT vec_id AS neighbor_id, cid, ROUND({cos_vc}, 6) AS aff FROM v, cent
),
corpus_b AS (
  SELECT neighbor_id, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY neighbor_id ORDER BY aff DESC, cid) AS r
    FROM corpus_aff
  ) WHERE r <= 1
),
q_aff AS (
  SELECT vec_id AS query_id, cid, ROUND({cos_vc}, 6) AS aff
  FROM (SELECT vec_id, vec FROM v WHERE vec_id < {n_queries}) q, cent
),
q_b AS (
  SELECT query_id, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY aff DESC, cid) AS r
    FROM q_aff
  ) WHERE r <= {n_probe}
),
cand AS (
  SELECT DISTINCT query_id, neighbor_id
  FROM q_b JOIN corpus_b USING (cid)
  WHERE query_id != neighbor_id
),
nsq AS (
  SELECT c.vec_id, c.m, {nsq_cv} AS nsq
  FROM codes c JOIN cb ON c.m = cb.m AND c.code = cb.code
),
recon AS (
  SELECT vec_id, {fold.format("list(nsq ORDER BY m)")} AS xsq
  FROM nsq GROUP BY vec_id
),
ipm AS (
  SELECT ca.query_id, ca.neighbor_id, q.m, {dot_qc} AS ipm
  FROM cand ca
  JOIN sub q ON q.vec_id = ca.query_id
  JOIN codes c ON c.vec_id = ca.neighbor_id AND c.m = q.m
  JOIN cb ON cb.m = c.m AND cb.code = c.code
),
ip AS (
  SELECT query_id, neighbor_id, {fold.format("list(ipm ORDER BY m)")} AS ip
  FROM ipm GROUP BY query_id, neighbor_id
),
qn AS (SELECT vec_id AS query_id, sqrt({qn_v}) AS qn FROM v WHERE vec_id < {n_queries}),
scored AS (
  SELECT ip.query_id, ip.neighbor_id,
         round(ip.ip / nullif(qn.qn * sqrt(r.xsq), 0), 6) AS cosine
  FROM ip
  JOIN qn USING (query_id)
  JOIN recon r ON r.vec_id = ip.neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
ORDER BY query_id, rank
"""


def _ivfadc_oracle(
    k: int, n_queries: int, n_cent: int, n_probe: int, n_sub: int, ds: int, ks: int,
    dim: int,
) -> str:
    """Full residual-IVFPQ (IVFADC) replay with the TRAINED coarse
    quantizer (km_ k-means chain, mirroring the library default): coarse
    assignment, residual computation, PQ training excluding the cid label
    set (the degenerate-init guard mirrored from ivfpq_residual_ann_topk),
    encoding, and decomposed-norm ADC scoring, all in one DuckDB SQL."""
    cos_vc = _VEC.cosine("vec", "cvec", "duck")
    l2_init = _VEC.l2_sq("s.sv", "ini.cv", "duck")
    l2_enc = _VEC.l2_sq("s.sv", "cb.cv", "duck")
    nsq_cv = _VEC.norm_sq("cb.cv", "duck")
    nsq_cent = _VEC.norm_sq("cvec", "duck")
    dot_qc = _VEC.dot("q.sv", "cb.cv", "duck")
    dot_qcent = _VEC.dot("qv.vec", "cn.cvec", "duck")
    # <c_m, r_mj>: dot of the centroid's m-th slice against the sub-centroid
    dot_ccv = _VEC.dot("cs.cvsub", "cb.cv", "duck")
    fold = "list_reduce(list_prepend(CAST(0 AS DOUBLE), {}), (s, acc_v) -> s + acc_v)"
    return f"""
WITH v AS (SELECT vec_id, embedding AS vec FROM embeddings),
{_kmeans_c1_ctes(n_cent, dim, "km_")},
cent AS (SELECT cid, cvec FROM km_c1),
corpus_aff AS (
  SELECT vec_id AS id, cid, ROUND({cos_vc}, 6) AS aff FROM v, cent
),
corpus_b AS (
  SELECT id, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY aff DESC, cid) AS r
    FROM corpus_aff
  ) WHERE r <= 1
),
sub AS (
  SELECT b.id AS vec_id, sp.m AS m,
         list_transform(range(sp.m * {ds} + 1, sp.m * {ds} + {ds} + 1),
                        ix -> CAST(vv.vec[ix] AS DOUBLE) - CAST(cn.cvec[ix] AS DOUBLE)) AS sv
  FROM corpus_b b
  JOIN v vv ON vv.vec_id = b.id
  JOIN cent cn ON cn.cid = b.cid,
       range(0, {n_sub}) sp(m)
),
init AS (
  SELECT s.m, row_number() OVER (PARTITION BY s.m ORDER BY s.vec_id) - 1 AS code,
         list_transform(s.sv, x -> round(x, 6)) AS cv
  FROM sub s
  WHERE s.vec_id IN (
    SELECT vec_id FROM v WHERE vec_id NOT IN (SELECT cid FROM cent)
    ORDER BY vec_id LIMIT {ks}
  )
),
a1 AS (
  SELECT s.vec_id, s.m, s.sv,
    (SELECT ini.code FROM init ini WHERE ini.m = s.m
     ORDER BY round({l2_init}, 6) ASC, ini.code LIMIT 1) AS code
  FROM sub s
  WHERE s.vec_id IN (
    SELECT vec_id FROM v WHERE vec_id NOT IN (SELECT cid FROM cent)
    ORDER BY vec_id LIMIT {TRAIN_SAMPLE_LIMIT}
  )
),
upd AS (
  SELECT m, code, r.pos AS pos, round(avg(sv[r.pos]), 6) AS c
  FROM a1, range(1, {ds + 1}) r(pos)
  GROUP BY m, code, r.pos
),
cb1a AS (SELECT m, code, list(c ORDER BY pos) AS cv FROM upd GROUP BY m, code),
cb AS (
  SELECT ini.m, ini.code, COALESCE(u.cv, ini.cv) AS cv
  FROM init ini LEFT JOIN cb1a u ON ini.m = u.m AND ini.code = u.code
),
codes AS (
  SELECT s.vec_id, s.m,
    (SELECT cb.code FROM cb WHERE cb.m = s.m
     ORDER BY round({l2_enc}, 6) ASC, cb.code LIMIT 1) AS code
  FROM sub s
),
centsub AS (
  SELECT cn.cid, sp.m AS m,
         list_transform(range(sp.m * {ds} + 1, sp.m * {ds} + {ds} + 1),
                        ix -> CAST(cn.cvec[ix] AS DOUBLE)) AS cvsub
  FROM cent cn, range(0, {n_sub}) sp(m)
),
resq AS (
  SELECT c.vec_id, c.m, 2 * {dot_ccv} + {nsq_cv} AS rq
  FROM codes c
  JOIN corpus_b b ON b.id = c.vec_id
  JOIN centsub cs ON cs.cid = b.cid AND cs.m = c.m
  JOIN cb ON cb.m = c.m AND cb.code = c.code
),
recon AS (
  SELECT r.vec_id,
         (SELECT {nsq_cent} FROM cent WHERE cid = b.cid) +
         {fold.format("list(rq ORDER BY m)")} AS xsq
  FROM resq r JOIN corpus_b b ON b.id = r.vec_id
  GROUP BY r.vec_id, b.cid
),
q_aff AS (
  SELECT vec_id AS query_id, cid, ROUND({cos_vc}, 6) AS aff
  FROM (SELECT vec_id, vec FROM v WHERE vec_id < {n_queries}) q, cent
),
q_b AS (
  SELECT query_id, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY aff DESC, cid) AS r
    FROM q_aff
  ) WHERE r <= {n_probe}
),
cand AS (
  SELECT DISTINCT q_b.query_id, b.id AS neighbor_id
  FROM q_b JOIN corpus_b b USING (cid)
  WHERE q_b.query_id != b.id
),
qsub AS (
  SELECT vv.vec_id AS query_id, sp.m AS m,
         list_transform(range(sp.m * {ds} + 1, sp.m * {ds} + {ds} + 1),
                        ix -> CAST(vv.vec[ix] AS DOUBLE)) AS sv
  FROM v vv, range(0, {n_sub}) sp(m)
  WHERE vv.vec_id < {n_queries}
),
ipm AS (
  SELECT ca.query_id, ca.neighbor_id, q.m, {dot_qc} AS ipm
  FROM cand ca
  JOIN qsub q ON q.query_id = ca.query_id
  JOIN codes c ON c.vec_id = ca.neighbor_id AND c.m = q.m
  JOIN cb ON cb.m = c.m AND cb.code = c.code
),
ip AS (
  SELECT query_id, neighbor_id, {fold.format("list(ipm ORDER BY m)")} AS ipr
  FROM ipm GROUP BY query_id, neighbor_id
),
qcterm AS (
  SELECT qv.vec_id AS query_id, b.id AS neighbor_id, {dot_qcent} AS qc
  FROM (SELECT vec_id, vec FROM v WHERE vec_id < {n_queries}) qv,
       corpus_b b JOIN cent cn ON cn.cid = b.cid
),
qn AS (SELECT vec_id AS query_id, sqrt({_VEC.norm_sq("vec", "duck")}) AS qn
       FROM v WHERE vec_id < {n_queries}),
scored AS (
  SELECT ip.query_id, ip.neighbor_id,
         round((qt.qc + ip.ipr) / nullif(qn.qn * sqrt(r.xsq), 0), 6) AS cosine
  FROM ip
  JOIN qcterm qt ON qt.query_id = ip.query_id AND qt.neighbor_id = ip.neighbor_id
  JOIN qn ON qn.query_id = ip.query_id
  JOIN recon r ON r.vec_id = ip.neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
ORDER BY query_id, rank
"""


@query("embedding_ann_ivfadc", oracle=_ivfadc_oracle(5, 10, 16, 4, 4, 16, 16, 64))
def embedding_ann_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVFPQ — the canonical FAISS IVFADC: PQ codebooks trained
    on (x - coarse centroid) residuals, candidates from 4 probed coarse
    buckets, scoring from the exact decomposition <q,x^> = <q,c> +
    <q,r^> and |x^|^2 = |c|^2 + 2<c,r^> + |r^|^2 — per corpus row the
    non-code terms are driver-built literal lookups, so the scan still
    reads only (id, codes). The coarse quantizer is the library default:
    TRAINED one-round k-means (untrained first-C gives lopsided buckets
    on skewed embeddings). The oracle replays k-means training, coarse
    assignment, residual training, encoding and decomposed scoring in
    one SQL."""
    from dawis_spark.operators.similarity import ivfpq_residual_ann_topk

    emb = spark.table("embeddings")
    return ivfpq_residual_ann_topk(
        corpus=emb,
        queries=emb.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        n_centroids=16,
        n_probe=4,
        n_subspaces=4,
        n_codes=16,
    ).orderBy("query_id", "rank")


@query("embedding_ann_ivfpq", oracle=_ivfpq_oracle(5, 10, 16, 4, 4, 16, 16, 64))
def embedding_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ composed (the FAISS IVFPQ shape, non-residual): the
    coarse quantizer prunes candidates to 4 probed buckets, PQ asymmetric
    distance scores the survivors from 4-byte codes — at 100 TB this is
    THE embedding-search plan: n_probe/C of the corpus scanned, and what
    is scanned is codes, never raw vectors. Encode + coarse assignment
    happen in one map-side scan with no shuffle; the only exchanges carry
    id/score triples. The coarse quantizer is the library default:
    TRAINED one-round k-means. Oracle replays k-means, coarse probing
    AND PQ train/encode/scoring in one SQL."""
    from dawis_spark.operators.similarity import ivfpq_ann_topk, pq_train

    emb = spark.table("embeddings")
    books = pq_train(emb, "vec_id", "embedding", n_subspaces=4, n_codes=16)
    return ivfpq_ann_topk(
        corpus=emb,
        queries=emb.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        n_centroids=16,
        n_probe=4,
        books=books,
    ).orderBy("query_id", "rank")


def _ann_recall_pq_oracle(k: int) -> str:
    exact = _embedding_topk_oracle(k, 10).strip()
    approx = _pq_ann_oracle(k, 10, 4, 16, 16).strip()
    return f"""
WITH exact_r AS (SELECT * FROM ({exact})),
approx_r AS (SELECT * FROM ({approx}))
SELECT e.query_id,
  CAST(COUNT(a.neighbor_id) AS BIGINT) AS hits,
  ROUND(CAST(COUNT(a.neighbor_id) AS DOUBLE) / {k}, 6) AS recall_at_k
FROM exact_r e
LEFT JOIN approx_r a
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id ORDER BY e.query_id
"""


@query("ann_recall_pq", oracle=_ann_recall_pq_oracle(5))
def ann_recall_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the PQ ADC scan against exact brute force, per query —
    the metric that tunes M/Ks (code budget) against quality, completing
    the self-eval set (LSH, multiprobe, PQ). Both sides reuse the
    production operators; the comparison join is top-k-sized."""
    from dawis_spark.operators.similarity import brute_force_topk, pq_topk, pq_train

    emb = spark.table("embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    books = pq_train(emb, "vec_id", "embedding", n_subspaces=4, n_codes=16)
    exact = brute_force_topk(
        corpus=emb, queries=queries_df, id_col="vec_id",
        vec_col="embedding", k=5,
    ).select("query_id", "neighbor_id")
    approx = pq_topk(
        corpus=emb, queries=queries_df, id_col="vec_id",
        vec_col="embedding", k=5, books=books,
    ).select(
        F.col("query_id").alias("a_qid"), F.col("neighbor_id").alias("a_nid")
    )
    joined = exact.join(
        approx,
        (exact["query_id"] == approx["a_qid"])
        & (exact["neighbor_id"] == approx["a_nid"]),
        "left",
    )
    return (
        joined.groupBy("query_id")
        .agg(
            F.count("a_nid").cast("bigint").alias("hits"),
            F.round(F.count("a_nid").cast("double") / F.lit(5), 6).alias(
                "recall_at_k"
            ),
        )
        .orderBy("query_id")
    )


def _ann_recall_ivfadc_oracle(k: int) -> str:
    exact = _embedding_topk_oracle(k, 10).strip()
    approx = _ivfadc_oracle(k, 10, 16, 4, 4, 16, 16, 64).strip()
    return f"""
WITH exact_r AS (SELECT * FROM ({exact})),
approx_r AS (SELECT * FROM ({approx}))
SELECT e.query_id,
  CAST(COUNT(a.neighbor_id) AS BIGINT) AS hits,
  ROUND(CAST(COUNT(a.neighbor_id) AS DOUBLE) / {k}, 6) AS recall_at_k
FROM exact_r e
LEFT JOIN approx_r a
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id ORDER BY e.query_id
"""


@query("ann_recall_ivfadc", oracle=_ann_recall_ivfadc_oracle(5))
def ann_recall_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the full production ANN pipeline (trained-quantizer
    residual IVFPQ) against exact brute force, per query — the self-eval
    that proves the composed default (k-means coarse quantizer + residual
    codes + 4-probe search) holds quality, completing the recall set
    (LSH, multiprobe, PQ, IVFADC). Both sides reuse the production
    operators; the comparison join is top-k-sized."""
    from dawis_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_residual_ann_topk,
    )

    emb = spark.table("embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(
        corpus=emb, queries=queries_df, id_col="vec_id",
        vec_col="embedding", k=5,
    ).select("query_id", "neighbor_id")
    approx = ivfpq_residual_ann_topk(
        corpus=emb, queries=queries_df, id_col="vec_id",
        vec_col="embedding", k=5, n_centroids=16, n_probe=4,
        n_subspaces=4, n_codes=16,
    ).select(
        F.col("query_id").alias("a_qid"), F.col("neighbor_id").alias("a_nid")
    )
    joined = exact.join(
        approx,
        (exact["query_id"] == approx["a_qid"])
        & (exact["neighbor_id"] == approx["a_nid"]),
        "left",
    )
    return (
        joined.groupBy("query_id")
        .agg(
            F.count("a_nid").cast("bigint").alias("hits"),
            F.round(F.count("a_nid").cast("double") / F.lit(5), 6).alias(
                "recall_at_k"
            ),
        )
        .orderBy("query_id")
    )


_SESSION_WINDOW_ORACLE = """
WITH e AS (
  SELECT user_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
         event_id
  FROM events
),
m AS (
  SELECT *, CASE WHEN prev_ts IS NULL OR ts >= prev_ts + INTERVAL 30 MINUTE
                 THEN 1 ELSE 0 END AS brk
  FROM e
),
g AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
)
SELECT MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       user_id,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 2) AS total
FROM g GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


@query("session_window_agg", oracle=_SESSION_WINDOW_ORACLE)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows in batch (``F.session_window``, 30-minute
    gap): one row per (user, session) with bounds and totals — the same
    engine state machine the streaming ``session_counts`` wrapper uses,
    oracle-checked here via the gaps-and-islands SQL equivalent. Session
    end is last-event + gap and the boundary is EXCLUSIVE (an event at
    exactly prev + gap starts a new session), which the oracle mirrors
    with ``>=``.

    Scale: one shuffle on user_id; the engine merges windows inside the
    aggregation state rather than via a lag + cumsum window pair, so
    there is no second windowing pass over the sorted partition."""
    ev = spark.table("events")
    return (
        ev.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n",
            "total",
        )
        .orderBy("user_id", "session_start")
    )


# ---------------------------------------------------------------------------
# Round-6 additions: data-mixing weights, URL canonicalization dedup,
# SemDeDup semantic dedup, metadata-filtered ANN
# ---------------------------------------------------------------------------

_MIXTURE_ORACLE = """
WITH per AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS mass FROM documents GROUP BY source
),
z AS (
  SELECT list_reduce(
           list_prepend(CAST(0 AS DOUBLE), list_sort(list(pow(mass, 0.5)))),
           (s, v) -> s + v) AS z
  FROM per
)
SELECT source, mass,
       ROUND(pow(mass, 0.5) / z.z, 6) AS weight,
       CAST(floor(ROUND(pow(mass, 0.5) / z.z, 6) * 10000 + 0.5) AS BIGINT)
         AS budget_docs
FROM per, z ORDER BY source
"""


@query("source_mixture_weights", oracle=_MIXTURE_ORACLE)
def source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled data-mixing weights per source (w proportional
    to char-mass^0.5, the standard alpha<1 tail-upsampling trick), plus
    the per-source document budget out of a 10k-doc target.

    Determinism: integer char-mass sums are order-independent, and the
    normalizer folds the k group terms in SORTED order on both engines
    (operators/corpus.mixture_weights) — a plain double SUM could differ
    in the last ulp between Spark and DuckDB and flip the 6-digit round.

    Scale: one shuffle carrying (source, partial-sum); the normalizer is
    a single-row broadcast. Group count is domain-sized, never
    corpus-sized."""
    from dawis_spark.operators.corpus import mixture_weights

    return mixture_weights(
        spark.table("documents").select("source", "n_chars"),
        "source",
        "n_chars",
        alpha=0.5,
        total_budget=10_000,
    ).orderBy("source")


# Deterministic URL synthesis (same text in both dialects): scheme-case,
# www-prefix, trailing-slash, utm-param, param-order, and fragment variants
# all collapse onto one canonical key, so the dedup has real work to do.
_SYNTH_URL = (
    "concat("
    "CASE WHEN doc_id % 3 = 0 THEN 'HTTP://' ELSE 'https://' END, "
    "CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END, "
    "'Site', CAST(doc_id % 7 AS STRING), '.Example.COM', "
    "'/page/', CAST(doc_id % 50 AS STRING), "
    "CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END, "
    "CASE WHEN doc_id % 5 = 0 THEN concat('?utm_source=feed&ref=', CAST(doc_id % 10 AS STRING)) "
    "     WHEN doc_id % 5 = 1 THEN concat('?ref=', CAST(doc_id % 10 AS STRING), '&utm_campaign=x') "
    "     ELSE '' END, "
    "CASE WHEN doc_id % 6 = 0 THEN '#section' ELSE '' END)"
)


def _url_canonical_oracle() -> str:
    from dawis_spark.functions.urls import canonical_url_sql

    return f"""
WITH u AS (SELECT doc_id, {_SYNTH_URL} AS url FROM documents),
c AS (SELECT doc_id, {canonical_url_sql('url', 'duck')} AS canonical_url FROM u)
SELECT canonical_url, COUNT(*) AS n_variants, MIN(doc_id) AS canonical_doc_id
FROM c GROUP BY canonical_url ORDER BY canonical_url
"""


@query("url_canonical_dedup", oracle=_url_canonical_oracle())
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup — the SEO-flavored page-identity
    operator the reference's URL model implies (utilities/url.py:4-17;
    the canonical-tag family is A4): scheme folded to https, host
    lowercased and de-www'd, fragment dropped, utm_* params stripped,
    surviving params sorted, trailing slash stripped; then one group per
    canonical page keeping the lowest doc_id (functions/urls.
    canonical_url_sql, dual-rendered Spark/DuckDB).

    Scale: canonicalization is pure map-side string/array built-ins (no
    UDF); the dedup shuffle carries (canonical_url, id) pairs only. A
    crawl-scale run would hash the canonical key for the exchange the
    way exact_dedup does."""
    from dawis_spark.functions.urls import canonical_url_sql

    return (
        spark.table("documents")
        .select("doc_id", F.expr(_SYNTH_URL).alias("url"))
        .select("doc_id", F.expr(canonical_url_sql("url", "spark")).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .orderBy("canonical_url")
    )


def _semantic_dedup_oracle(
    k: int, dim: int, threshold: float, cap: int, n_planes: int = 4
) -> str:
    """Replay of semantic_dedup: the trained-k-means CTE chain assigns
    every vector to a cluster, then the capped within-cluster routing
    (exact below ``cap`` rows, block-scoped sign-LSH above) finds
    cosine >= threshold pairs, and any vector matching a LOWER-id
    cluster-mate is a duplicate."""
    from dawis_spark.operators.similarity import lsh_bucket_expr

    cos_final = _VEC.cosine_null("v.vec", "fc.cvec", "duck")
    dot = _VEC.dot("a.vec", "b.vec", "duck")
    nsq = _VEC.norm_sq("vec", "duck")
    bucket = lsh_bucket_expr(n_planes, dim, "duck")
    return f"""
WITH {_kmeans_c1_ctes(k, dim)},
asg AS (
  SELECT v.vec_id, v.vec,
    (SELECT fc.cid FROM c1 fc
     ORDER BY coalesce(round({cos_final}, 6), -2.0) DESC, fc.cid LIMIT 1) AS cid
  FROM v
),
w AS (SELECT vec_id, cid, vec, sqrt({nsq}) AS nrm FROM asg),
sizes AS (SELECT cid, COUNT(*) AS bn FROM w GROUP BY cid),
big AS (
  SELECT w.cid, w.vec_id, w.vec, {bucket} AS bucket
  FROM w JOIN sizes s ON s.cid = w.cid AND s.bn > {cap}
),
pairs AS (
  SELECT a.cid, a.vec_id AS id_a, b.vec_id AS id_b
  FROM w a
  JOIN w b ON a.cid = b.cid AND a.vec_id < b.vec_id
  JOIN sizes s ON s.cid = a.cid AND s.bn <= {cap}
  UNION ALL
  SELECT DISTINCT x.cid, x.vec_id AS id_a, y.vec_id AS id_b
  FROM big x
  JOIN big y ON x.cid = y.cid AND x.bucket = y.bucket AND x.vec_id < y.vec_id
),
dups AS (
  SELECT DISTINCT p.id_b
  FROM pairs p
  JOIN w a ON a.vec_id = p.id_a
  JOIN w b ON b.vec_id = p.id_b
  WHERE ROUND({dot} / (a.nrm * b.nrm), 6) >= {threshold}
)
SELECT w.vec_id, w.cid, (d.id_b IS NULL) AS keep
FROM w LEFT JOIN dups d ON w.vec_id = d.id_b
ORDER BY w.vec_id
"""


@query("semantic_dedup", oracle=_semantic_dedup_oracle(8, 64, 0.3, 300))
def semantic_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) over the embedding corpus: trained
    k-means clustering IS the blocking, then any vector with cosine >=
    0.3 to a lower-id cluster-mate is marked ``keep = false`` (pairwise
    lowest-id-wins — the deterministic stand-in for the paper's
    one-representative-per-epsilon-ball choice).

    Scale (operators/similarity.semantic_dedup): centroids ride the
    driver, assignment is a map-side argmax (vectors never shuffle),
    clusters above 300 rows route through block-scoped sign-LSH instead
    of all-pairs, and pair verification joins vectors by id via
    shuffle-hash. The FAISS-style recipe: coarse-quantize once, dedup
    within cells — the exact shape this needs at 100 TB."""
    from dawis_spark.operators.similarity import semantic_dedup

    return semantic_dedup(
        spark.table("embeddings"),
        "vec_id",
        "embedding",
        k=8,
        threshold=0.3,
        max_block_rows=300,
        iterations=1,
    ).orderBy("vec_id")


def _filtered_topk_oracle(k: int, n_queries: int, label: int) -> str:
    cos = _VEC.cosine("q_vec", "c_vec", "duck")
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < {n_queries}),
c AS (SELECT vec_id AS neighbor_id, embedding AS c_vec FROM embeddings WHERE label = {label}),
scored AS (
  SELECT query_id, neighbor_id, ROUND({cos}, 6) AS cosine
  FROM q, c WHERE query_id != neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
ORDER BY query_id, rank
"""


@query("embedding_filtered_topk", oracle=_filtered_topk_oracle(5, 10, 3))
def embedding_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered ANN (the vector-DB "filtered search" shape):
    exact cosine top-k restricted to corpus rows with ``label = 3`` —
    pre-filter strategy, the right call when the predicate is selective.

    Scale: the equality predicate pushes to the parquet scan
    (PushedFilters), so only matching row-groups are ever read and the
    brute-force side shrinks by the filter's selectivity BEFORE any
    compute; queries broadcast as usual. When the filter keeps most of
    the corpus, switch to ivf_ann_topk over the filtered scan instead —
    same pushdown, probe-bounded compute."""
    from dawis_spark.operators.similarity import brute_force_topk

    emb = spark.table("embeddings")
    return brute_force_topk(
        corpus=emb.filter(F.col("label") == 3),
        queries=emb.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
    ).orderBy("query_id", "rank")


def _filtered_ivf_oracle(
    k: int, n_queries: int, kc: int, n_probe: int, dim: int, label: int
) -> str:
    """_ivf_trained_oracle composed over a filtered corpus: training,
    bucketing and search all read only ``label = {label}`` rows (the
    k-means chain's ``where`` parameter), while queries still come from
    the unfiltered table — mirroring ivf_ann_topk(corpus=filtered,
    queries=all)."""
    cos_vc = _VEC.cosine_null("vec", "cvec", "duck")
    cos_qc = _VEC.cosine("q_vec", "c_vec", "duck")
    return f"""
WITH {_kmeans_c1_ctes(kc, dim, where=f"label = {label}")},
allq AS (
  SELECT vec_id, embedding AS vec FROM embeddings WHERE vec_id < {n_queries}
),
corpus_aff AS (
  SELECT vec_id AS neighbor_id, vec, cid,
         coalesce(ROUND({cos_vc}, 6), -2.0) AS aff
  FROM v, (SELECT cid, cvec FROM c1) cent(cid, cvec)
),
corpus_b AS (
  SELECT neighbor_id, vec AS c_vec, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY neighbor_id ORDER BY aff DESC, cid) AS r
    FROM corpus_aff
  ) WHERE r <= 1
),
q_aff AS (
  SELECT vec_id AS query_id, vec, cid,
         coalesce(ROUND({cos_vc}, 6), -2.0) AS aff
  FROM allq, (SELECT cid, cvec FROM c1) cent(cid, cvec)
),
q_b AS (
  SELECT query_id, vec AS q_vec, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY aff DESC, cid) AS r
    FROM q_aff
  ) WHERE r <= {n_probe}
),
scored AS (
  SELECT DISTINCT query_id, neighbor_id, ROUND({cos_qc}, 6) AS cosine
  FROM q_b JOIN corpus_b USING (cid)
  WHERE query_id != neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
ORDER BY query_id, rank
"""


@query("embedding_filtered_ann_ivf", oracle=_filtered_ivf_oracle(5, 10, 8, 3, 64, 3))
def embedding_filtered_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed filtered ANN — the path embedding_filtered_topk's
    docstring points at for low-selectivity predicates: ivf_ann_topk over
    the filter-pushed scan. The quantizer trains on (and buckets only)
    the filtered corpus, so probe cost scales with the filtered size,
    and the ``label = 3`` equality predicate reaches the parquet scan
    (PushedFilters — plan-asserted in tests/test_plan_properties.py).

    Scale: pre-filter + IVF composes the two savings — row-group pruning
    shrinks the scan, probe-restriction shrinks the compute; the corpus
    never shuffles by vector either way. This is the vector-DB
    "filtered search" shape at its cheap end."""
    from dawis_spark.operators.similarity import ivf_ann_topk

    emb = spark.table("embeddings")
    return ivf_ann_topk(
        corpus=emb.filter(F.col("label") == 3),
        queries=emb.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        n_centroids=8,
        n_probe=3,
    ).orderBy("query_id", "rank")


def _ann_recall_filtered_ivf_oracle(k: int) -> str:
    exact = _filtered_topk_oracle(k, 10, 3).strip()
    approx = _filtered_ivf_oracle(k, 10, 8, 3, 64, 3).strip()
    return f"""
WITH exact_r AS (SELECT * FROM ({exact})),
approx_r AS (SELECT * FROM ({approx}))
SELECT e.query_id,
  CAST(COUNT(a.neighbor_id) AS BIGINT) AS hits,
  ROUND(CAST(COUNT(a.neighbor_id) AS DOUBLE) / {k}, 6) AS recall_at_k
FROM exact_r e
LEFT JOIN approx_r a
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id ORDER BY e.query_id
"""


@query("ann_recall_filtered_ivf", oracle=_ann_recall_filtered_ivf_oracle(5))
def ann_recall_filtered_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the composed filtered-IVF path against the exact
    filtered brute-force baseline, per query — proves the composition
    (pushed filter -> trained quantizer -> probe search) holds quality,
    not just shape. Both sides reuse the production operators and the
    same filtered corpus; the comparison join is top-k-sized."""
    from dawis_spark.operators.similarity import brute_force_topk, ivf_ann_topk

    emb = spark.table("embeddings")
    filtered = emb.filter(F.col("label") == 3)
    queries_df = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(
        corpus=filtered, queries=queries_df, id_col="vec_id",
        vec_col="embedding", k=5,
    ).select("query_id", "neighbor_id")
    approx = ivf_ann_topk(
        corpus=filtered, queries=queries_df, id_col="vec_id",
        vec_col="embedding", k=5, n_centroids=8, n_probe=3,
    ).select(
        F.col("query_id").alias("a_qid"), F.col("neighbor_id").alias("a_nid")
    )
    joined = exact.join(
        approx,
        (exact["query_id"] == approx["a_qid"])
        & (exact["neighbor_id"] == approx["a_nid"]),
        "left",
    )
    return (
        joined.groupBy("query_id")
        .agg(
            F.count("a_nid").cast("bigint").alias("hits"),
            F.round(F.count("a_nid").cast("double") / F.lit(5), 6).alias(
                "recall_at_k"
            ),
        )
        .orderBy("query_id")
    )


def _kmv_oracle(k: int) -> str:
    from dawis_spark.operators.sketches import kmv_oracle_sql

    return f"""
WITH {kmv_oracle_sql('events', ['event_type'], 'user_id', k).strip()},
exact AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT s.event_type, s.n_kept, s.kth_hash, s.estimate, e.exact_distinct,
  round(abs(s.estimate - e.exact_distinct) / e.exact_distinct, 6) AS rel_error
FROM kmv s JOIN exact e USING (event_type)
ORDER BY event_type
"""


@query("kmv_distinct_users", oracle=_kmv_oracle(64))
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch (k=64) per event type, scored against
    the exact count — bounded-state cardinality estimation, the 100 TB
    answer to COUNT(DISTINCT) (operators/sketches.py design notes: only
    k-bounded hash arrays cross the wire, vs every (key, user) pair for
    the exact form). Deterministic polynomial hashing makes the sketch
    bit-reproducible, so the oracle replays estimator arithmetic exactly
    and the rel_error column doubles as the accuracy self-eval."""
    from dawis_spark.operators.sketches import kmv_distinct

    ev = spark.table("events")
    sketch = kmv_distinct(ev, ["event_type"], "user_id", k=64)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return (
        sketch.join(exact, "event_type")
        .select(
            "event_type",
            "n_kept",
            "kth_hash",
            "estimate",
            "exact_distinct",
            F.round(
                F.abs(F.col("estimate") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                6,
            ).alias("rel_error"),
        )
        .orderBy("event_type")
    )


def _cm_oracle(top_n: int, d: int, w: int) -> str:
    from dawis_spark.operators.sketches import (
        _cm_bucket,
        _cm_coeffs,
        _kmv_round,
        _KMV_ROUNDS,
        cm_oracle_ctes,
    )

    toks = _TXT.tokens("text", "duck")
    h = _TXT.char_hash("cast(tok as varchar)", "duck")
    probe_chain = [f"probe_h0 AS (SELECT tok, {h} AS h FROM top)"]
    src = "probe_h0"
    for n, (a, b) in enumerate(_KMV_ROUNDS):
        probe_chain.append(
            f"probe_h{n + 1} AS (SELECT tok, {_kmv_round('h', a, b)} AS h FROM {src})"
        )
        src = f"probe_h{n + 1}"
    cells = " UNION ALL ".join(
        f"SELECT tok, {i} AS row, CAST({_cm_bucket('h', a, b, w)} AS INT) AS bucket FROM {src}"
        for i, (a, b) in enumerate(_cm_coeffs(d))
    )
    return f"""
WITH occ AS (
  SELECT unnest({toks}) AS tok FROM documents
),
{cm_oracle_ctes('occ', 'tok', d, w)},
exact AS (SELECT tok, COUNT(*) AS exact_count FROM occ GROUP BY tok),
top AS (
  SELECT tok, exact_count FROM (
    SELECT *, row_number() OVER (ORDER BY exact_count DESC, tok) AS rn FROM exact
  ) WHERE rn <= {top_n}
),
{", ".join(probe_chain)},
probe_cells AS ({cells}),
est AS (
  SELECT p.tok, MIN(COALESCE(cm.cnt, 0)) AS cm_estimate
  FROM probe_cells p LEFT JOIN cm USING (row, bucket)
  GROUP BY p.tok
)
SELECT t.tok AS token, t.exact_count, e.cm_estimate,
       e.cm_estimate - t.exact_count AS overestimate
FROM top t JOIN est e ON e.tok = t.tok
ORDER BY t.exact_count DESC, token
"""


@query("cm_heavy_hitters", oracle=_cm_oracle(20, 4, 512))
def cm_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min heavy hitters: token frequencies for the exact top-20
    tokens estimated from a 4x512 count-min sketch, with the realized
    overestimate per token (count-min never undercounts). The sketch is
    2048 cells regardless of vocabulary size — at 100 TB this replaces a
    vocabulary-cardinality shuffle with a fixed-size counter table
    (operators/sketches.py); the exact side here exists only to score
    the sketch, mirroring the ANN recall self-evals. The exact top-20
    is orderBy().limit() — TakeOrderedAndProject, per-partition top-k +
    driver merge — never a single-partition row_number window over the
    vocabulary-sized frequency relation (r10-verdict fix)."""
    from dawis_spark.operators.sketches import cm_estimate, cm_sketch

    toks = _TXT.tokens("text", "spark")
    occ = spark.table("documents").select(
        F.explode(F.expr(toks)).alias("tok")
    )
    exact = occ.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_count"))
    top = (
        exact.orderBy(F.desc("exact_count"), F.asc("tok"))
        .limit(20)
        .select("tok", "exact_count")
    )
    sk = cm_sketch(occ, "tok", d=4, w=512)
    est = cm_estimate(sk, top.select("tok"), "tok", d=4, w=512)
    return (
        top.join(est, "tok")
        .select(
            F.col("tok").alias("token"),
            "exact_count",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("exact_count")).alias("overestimate"),
        )
        .orderBy(F.desc("exact_count"), "token")
    )


def _kmv_overlap_oracle(k: int, n_src: int) -> str:
    from dawis_spark.operators.sketches import _KMV_ROUNDS, _kmv_round

    sh = _TXT.shingle_hashes("text", 3, "duck")
    srcs = ", ".join(f"'src{i}'" for i in range(n_src))
    mix_ctes, src = "", "t"
    col = "s"
    for n, (a, b) in enumerate(_KMV_ROUNDS):
        mix_ctes += (
            f"mix{n} AS (SELECT source, {_kmv_round(col, a, b)} AS h FROM {src}),\n"
        )
        src, col = f"mix{n}", "h"
    return f"""
WITH t AS (
  SELECT DISTINCT source, unnest({sh}) AS s
  FROM documents WHERE source IN ({srcs})
),
{mix_ctes}sk AS (
  SELECT source, list_sort(list(DISTINCT h))[1:{k}] AS hs
  FROM {src} GROUP BY source
),
prs AS (
  SELECT a.source AS source_a, b.source AS source_b, a.hs AS hs_a, b.hs AS hs_b
  FROM sk a JOIN sk b ON a.source < b.source
),
mg AS (
  SELECT source_a, source_b, hs_a, hs_b,
         list_sort(list_distinct(list_concat(hs_a, hs_b)))[1:{k}] AS m
  FROM prs
),
ic AS (
  SELECT source_a, source_b, len(m) AS ke,
    len(list_filter(m, x -> list_contains(hs_a, x) AND list_contains(hs_b, x))) AS nc,
    m FROM mg
),
est AS (
  SELECT source_a, source_b,
    CASE WHEN ke >= {k} THEN round(CAST({k - 1} AS DOUBLE) * {_TXT.MOD} / m[{k}], 6)
         ELSE CAST(ke AS DOUBLE) END AS est_union,
    CAST(nc AS DOUBLE) / ke AS rho
  FROM ic
),
ex_inter AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS exact_intersection
  FROM t a JOIN t b ON a.s = b.s AND a.source < b.source
  GROUP BY 1, 2
),
sizes AS (SELECT source, COUNT(*) AS n FROM t GROUP BY source),
ex AS (
  SELECT sa.source AS source_a, sb.source AS source_b,
    COALESCE(i.exact_intersection, 0) AS exact_intersection,
    sa.n + sb.n - COALESCE(i.exact_intersection, 0) AS exact_union
  FROM sizes sa JOIN sizes sb ON sa.source < sb.source
  LEFT JOIN ex_inter i ON i.source_a = sa.source AND i.source_b = sb.source
)
SELECT ex.source_a, ex.source_b,
  est_union, round(rho * est_union, 6) AS est_intersection,
  round(rho, 6) AS est_jaccard,
  exact_union, exact_intersection,
  round(CAST(exact_intersection AS DOUBLE) / exact_union, 6) AS exact_jaccard
FROM est JOIN ex USING (source_a, source_b)
ORDER BY source_a, source_b
"""


@query("kmv_shingle_overlap", oracle=_kmv_overlap_oracle(128, 5))
def kmv_shingle_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-operation estimates — pairwise shingle-set union /
    intersection / Jaccard between sources from 128-element sketches,
    scored against the exact figures. The mergeable-sketch shape that
    makes cross-segment overlap tractable at 100 TB: per-segment
    synopses are k int64s, any pair (or union of segments) composes
    driver-free from the sketches alone, no re-scan of the corpora
    (Beyer et al. 2007; operators/sketches.py kmv_sets/kmv_set_ops).

    Accuracy shape, visible in the output: the union estimate is tight
    (±1/√k), while intersection/Jaccard variance scales like
    1/(J·k) — at J≈0.03 and k=128 only ~4 sketch elements witness the
    overlap, so est_intersection is an order-of-magnitude signal. That
    is the published estimator's behavior, not an implementation
    artifact; size k to the smallest Jaccard that must be resolved."""
    from dawis_spark.operators.sketches import kmv_set_ops, kmv_sets

    sh = _TXT.shingle_hashes("text", 3, "spark")
    srcs = [f"src{i}" for i in range(5)]
    t = (
        spark.table("documents")
        .filter(F.col("source").isin(srcs))
        .select("source", F.explode(F.expr(sh)).alias("s"))
        .distinct()
    )
    sk = kmv_sets(t, ["source"], "s", k=128, pre_hashed=True)
    pairs = sk.select(
        F.col("source").alias("source_a"), F.col("hs").alias("hs_a")
    ).join(
        sk.select(F.col("source").alias("source_b"), F.col("hs").alias("hs_b")),
        F.col("source_a") < F.col("source_b"),
    )
    est = kmv_set_ops(pairs, "hs_a", "hs_b", 128).select(
        "source_a", "source_b", "est_union", "est_intersection", "est_jaccard"
    )
    sizes = t.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    ex_inter = (
        t.select(F.col("source").alias("source_a"), "s")
        .join(t.select(F.col("source").alias("source_b"), "s"), "s")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    ex = (
        sizes.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
        .join(
            sizes.select(F.col("source").alias("source_b"), F.col("n").alias("nb")),
            F.col("source_a") < F.col("source_b"),
        )
        .join(ex_inter, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            F.coalesce("exact_intersection", F.lit(0)).alias("exact_intersection"),
            (F.col("na") + F.col("nb") - F.coalesce("exact_intersection", F.lit(0)))
            .alias("exact_union"),
        )
    )
    return (
        est.join(ex, ["source_a", "source_b"])
        .select(
            "source_a",
            "source_b",
            "est_union",
            "est_intersection",
            "est_jaccard",
            "exact_union",
            "exact_intersection",
            F.round(
                F.col("exact_intersection").cast("double") / F.col("exact_union"), 6
            ).alias("exact_jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


def _prefix_filter_oracle(shingle_k: int, t_num: int, t_den: int) -> str:
    sh = _TXT.shingle_hashes("text", shingle_k, "duck")
    jac = _TXT.jaccard("a.sh", "b.sh", "duck")
    plen = f"len(ks) - CAST(({t_num} * len(ks) + {t_den} - 1) // {t_den} AS INT) + 1"
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({sh}) AS h FROM documents
),
dft AS (SELECT h, COUNT(*) AS df_t FROM tok GROUP BY h),
keyed AS (
  SELECT doc_id, d.df_t * {_TXT.MOD} + t.h AS key
  FROM tok t JOIN dft d USING (h)
),
docs_k AS (SELECT doc_id, list_sort(list(key)) AS ks FROM keyed GROUP BY doc_id),
pref AS (
  SELECT doc_id, unnest(list_slice(ks, 1, {plen})) AS key FROM docs_k
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM pref a JOIN pref b USING (key) WHERE a.doc_id < b.doc_id
),
sh_t AS (SELECT doc_id, {sh} AS sh FROM documents)
SELECT id_a, id_b, ROUND({jac}, 6) AS jaccard
FROM cand
JOIN sh_t a ON id_a = a.doc_id
JOIN sh_t b ON id_b = b.doc_id
WHERE ROUND({jac}, 6) >= CAST({t_num} AS DOUBLE) / {t_den}
ORDER BY id_a, id_b
"""


@query("prefix_filter_similar", oracle=_prefix_filter_oracle(3, 3, 10))
def prefix_filter_similar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT similarity self-join via prefix filtering (operators/
    dedup.py prefix_filter_pairs — the AllPairs/SSJoin family): every
    document pair with 3-gram Jaccard ≥ 0.3, no LSH recall loss, no
    all-pairs.

    Scale: the completeness-preserving alternative to the MinHash-LSH
    route when recall must be exactly 1 — candidate volume is bounded
    by rare-first PREFIX postings (frequent tokens never generate
    candidates), the df-ordering needs no global sort (composite
    ``df*MOD + h`` key), and verification joins hash arrays by pair id
    via shuffle-hash. The LSH route stays the default for throughput;
    this is the audit-grade path."""
    from dawis_spark.operators.dedup import prefix_filter_pairs

    return prefix_filter_pairs(
        spark.table("documents"), "doc_id", "text",
        shingle_k=3, t_num=3, t_den=10,
    ).orderBy("id_a", "id_b")


def _matryoshka_oracle(k: int, n_queries: int, prefix_dim: int) -> str:
    exact = _embedding_topk_oracle(k, n_queries).strip()
    cos = _VEC.cosine("q_vec", "c_vec", "duck")
    approx = f"""
WITH q AS (SELECT vec_id AS query_id, embedding[1:{prefix_dim}] AS q_vec
           FROM embeddings WHERE vec_id < {n_queries}),
c AS (SELECT vec_id AS neighbor_id, embedding[1:{prefix_dim}] AS c_vec
      FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id, ROUND({cos}, 6) AS cosine
  FROM q, c WHERE query_id != neighbor_id
)
SELECT query_id, neighbor_id FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
""".strip()
    return f"""
WITH exact_r AS (SELECT * FROM ({exact})),
approx_r AS ({approx})
SELECT e.query_id,
  CAST(COUNT(a.neighbor_id) AS BIGINT) AS hits,
  ROUND(CAST(COUNT(a.neighbor_id) AS DOUBLE) / {k}, 6) AS recall_at_k
FROM exact_r e
LEFT JOIN approx_r a
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id ORDER BY e.query_id
"""


@query("ann_recall_matryoshka", oracle=_matryoshka_oracle(5, 10, 16))
def ann_recall_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of search over the 16-dim PREFIX of the embeddings
    against full 64-dim exact search — the Matryoshka-representation
    dial (Kusupati et al. 2022): when embeddings are trained
    prefix-nested, truncation is a 4x compute/storage cut with a
    measurable recall cost, and this query IS that measurement on the
    corpus at hand.

    Scale: dimension truncation composes with every other path in the
    family (IVF probing, PQ codes, SQ8 levels all shrink 4x with the
    prefix); the scan/score plan is brute_force_topk's — the truncation
    itself is a zero-cost projection inside the scan."""
    from dawis_spark.operators.similarity import brute_force_topk

    emb = spark.table("embeddings")
    trunc = emb.select(
        "vec_id", F.expr("slice(embedding, 1, 16)").alias("embedding")
    )
    exact = brute_force_topk(
        corpus=emb, queries=emb.filter(F.col("vec_id") < 10),
        id_col="vec_id", vec_col="embedding", k=5,
    ).select("query_id", "neighbor_id")
    approx = brute_force_topk(
        corpus=trunc, queries=trunc.filter(F.col("vec_id") < 10),
        id_col="vec_id", vec_col="embedding", k=5,
    ).select(
        F.col("query_id").alias("a_qid"), F.col("neighbor_id").alias("a_nid")
    )
    joined = exact.join(
        approx,
        (exact["query_id"] == approx["a_qid"])
        & (exact["neighbor_id"] == approx["a_nid"]),
        "left",
    )
    return (
        joined.groupBy("query_id")
        .agg(
            F.count("a_nid").cast("bigint").alias("hits"),
            F.round(F.count("a_nid").cast("double") / F.lit(5), 6).alias(
                "recall_at_k"
            ),
        )
        .orderBy("query_id")
    )


def _scd2_oracle() -> str:
    from dawis_spark.operators.scd import scd2_oracle_ctes

    return f"""
WITH cur AS (
  SELECT c_custkey, c_mktsegment,
         TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to,
         TRUE AS is_current
  FROM customer
  UNION ALL
  SELECT c_custkey, 'LEGACY', TIMESTAMP '2023-01-01 00:00:00',
         TIMESTAMP '2024-01-01 00:00:00', FALSE
  FROM customer WHERE c_custkey % 11 = 0
),
upd AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN 'MOVED' ELSE c_mktsegment END
           AS c_mktsegment
  FROM customer
  UNION ALL
  SELECT c_custkey + 1000000, 'FRESH' FROM customer WHERE c_custkey % 97 = 0
),
{scd2_oracle_ctes('cur', 'upd', ['c_custkey'], ['c_mktsegment'],
                  '2024-06-01 00:00:00')}
SELECT * FROM scd2 ORDER BY c_custkey, valid_from, is_current
"""


def _scd2_demo_next_state(spark: SparkSession) -> DataFrame:
    """The shared SCD2 demo load: customer dim with a LEGACY history
    slice, segment moves for custkey%7, new FRESH keys for custkey%97,
    applied at 2024-06-01 (used by scd2_dimension_load and the as-of
    read)."""
    from dawis_spark.operators.scd import scd2_apply

    cust = spark.table("customer")
    cur = (
        cust.select(
            "c_custkey",
            "c_mktsegment",
            F.expr("timestamp '2024-01-01 00:00:00'").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        .unionByName(
            cust.where(F.expr("c_custkey % 11 = 0")).select(
                "c_custkey",
                F.lit("LEGACY").alias("c_mktsegment"),
                F.expr("timestamp '2023-01-01 00:00:00'").alias("valid_from"),
                F.expr("timestamp '2024-01-01 00:00:00'").alias("valid_to"),
                F.lit(False).alias("is_current"),
            )
        )
    )
    upd = cust.select(
        "c_custkey",
        F.when(F.expr("c_custkey % 7 = 0"), F.lit("MOVED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    ).unionByName(
        cust.where(F.expr("c_custkey % 97 = 0")).select(
            (F.col("c_custkey") + 1000000).alias("c_custkey"),
            F.lit("FRESH").alias("c_mktsegment"),
        )
    )
    return scd2_apply(
        cur, upd, ["c_custkey"], ["c_mktsegment"], "2024-06-01 00:00:00"
    )


@query("scd2_dimension_load", oracle=_scd2_oracle())
def scd2_dimension_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension maintenance (operators/scd.py): one load
    closes changed open rows at the batch timestamp, inserts new
    versions and brand-new keys, and passes unchanged/closed history
    through untouched — the warehouse MERGE shape, as a pure state-in/
    state-out transform the oracle replays CTE-for-CTE.

    Scale: one key-equi-join of the OPEN slice against the update batch
    (dimension keys unique on both sides — no skew surface), closed
    history never moves; bucketing the dimension by key co-locates every
    load's join (module design notes)."""
    return _scd2_demo_next_state(spark).orderBy(
        "c_custkey", "valid_from", "is_current"
    )


def _scd2_asof_oracle() -> str:
    base = _scd2_oracle().strip().rsplit("SELECT * FROM scd2", 1)[0]
    return f"""{base}
SELECT 'past' AS asof_label, c_custkey, c_mktsegment FROM scd2
WHERE valid_from <= TIMESTAMP '2023-06-01 00:00:00'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2023-06-01 00:00:00')
UNION ALL
SELECT 'present', c_custkey, c_mktsegment FROM scd2
WHERE valid_from <= TIMESTAMP '2024-06-02 00:00:00'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-06-02 00:00:00')
ORDER BY asof_label, c_custkey
"""


@query("scd2_asof_read", oracle=_scd2_asof_oracle())
def scd2_asof_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel reads of the SCD2 dimension (operators/scd.scd2_asof):
    the same maintained history answered at two instants — during the
    LEGACY era (2023-06-01: only the pre-migration versions exist) and
    after the 2024-06-01 load (every key's newest version, including the
    FRESH inserts). The query-side payoff of type-2 history: facts join
    "as of" their event time with a map-side validity filter, no
    snapshot copies.

    Scale: the filter is map-side over the dimension; on the bucketed
    load layout an as-of fact join stays co-located."""
    from dawis_spark.operators.scd import scd2_asof

    dim = _scd2_demo_next_state(spark)
    past = scd2_asof(dim, "2023-06-01 00:00:00").select(
        F.lit("past").alias("asof_label"), "c_custkey", "c_mktsegment"
    )
    present = scd2_asof(dim, "2024-06-02 00:00:00").select(
        F.lit("present").alias("asof_label"), "c_custkey", "c_mktsegment"
    )
    return past.unionAll(present).orderBy("asof_label", "c_custkey")


def _mixture_sample_oracle(alpha: float, budget: int) -> str:
    from dawis_spark.operators.sketches import _mixed_sql

    h = _TXT.char_hash("cast(doc_id as varchar)", "duck")
    return f"""
WITH per AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS mass,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
),
z AS (
  SELECT list_reduce(
           list_prepend(CAST(0 AS DOUBLE), list_sort(list(pow(mass, {alpha})))),
           (s, v) -> s + v) AS z
  FROM per
),
rates AS (
  SELECT source, n_docs,
         CAST(floor(ROUND(pow(mass, {alpha}) / z.z, 6) * {budget} + 0.5) AS BIGINT)
           AS budget_docs,
         least(1000000,
               (CAST(floor(ROUND(pow(mass, {alpha}) / z.z, 6) * {budget} + 0.5) AS BIGINT)
                * 1000000) // n_docs) AS rate_ppm
  FROM per, z
),
samp AS (
  SELECT d.source FROM documents d JOIN rates r ON d.source = r.source
  WHERE ({_mixed_sql(h, 'duck')}) % 1000000 < r.rate_ppm
)
SELECT r.source, r.n_docs, r.budget_docs, r.rate_ppm,
       CAST(COALESCE(s.n, 0) AS BIGINT) AS sampled_docs,
       CAST(COALESCE(s.n, 0) * 1000000 AS BIGINT) // r.n_docs AS realized_ppm
FROM rates r
LEFT JOIN (SELECT source, COUNT(*) AS n FROM samp GROUP BY source) s
  ON r.source = s.source
ORDER BY r.source
"""


@query("mixture_sampled_corpus", oracle=_mixture_sample_oracle(0.5, 200))
def mixture_sampled_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized data mixture: temperature weights (alpha = 0.5,
    200-doc budget) turned into per-source deterministic sampling rates
    and an actual sampled corpus (operators/corpus.py mixture_sample),
    with realized-vs-target rates as the self-eval.

    Scale: the rates relation is domain-count-sized (broadcast); the
    membership predicate evaluates inside the document scan. The
    hash-defined draw makes the mixture refresh-stable — appending new
    raw data never resamples previously-kept documents, so downstream
    packed shards stay valid incrementally (design notes on
    mixture_sample)."""
    from dawis_spark.operators.corpus import mixture_sample, mixture_weights

    docs = spark.table("documents")
    w = mixture_weights(docs, "source", "n_chars", alpha=0.5, total_budget=200)
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    rates = (
        w.join(counts, "source")
        .select(
            "source",
            "n_docs",
            "budget_docs",
            F.least(
                F.lit(1000000),
                F.expr("(budget_docs * 1000000) div n_docs"),
            ).alias("rate_ppm"),
        )
    )
    samp = mixture_sample(docs, "source", "doc_id", rates.select("source", "rate_ppm"))
    sampled = samp.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    return (
        rates.join(sampled, "source", "left")
        .select(
            "source",
            "n_docs",
            "budget_docs",
            "rate_ppm",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("sampled_docs"),
            F.expr("(coalesce(n, 0) * 1000000) div n_docs")
            .cast("bigint")
            .alias("realized_ppm"),
        )
        .orderBy("source")
    )


def _coordinated_sample_oracle(rate_ppm: int) -> str:
    from dawis_spark.operators.sketches import int_hash_sample_pred

    scale = 1_000_000 / rate_ppm
    o_pred = int_hash_sample_pred("o_orderkey", rate_ppm, "duck")
    l_pred = int_hash_sample_pred("l_orderkey", rate_ppm, "duck")
    return f"""
WITH o_samp AS (SELECT * FROM orders WHERE {o_pred}),
l_samp AS (SELECT * FROM lineitem WHERE {l_pred}),
est AS (
  SELECT l_returnflag,
         COUNT(*) AS sample_rows,
         ROUND(SUM(l_extendedprice * (1 - l_discount)) * {scale}, 2) AS est_revenue
  FROM l_samp JOIN o_samp ON l_orderkey = o_orderkey
  GROUP BY l_returnflag
),
exact AS (
  SELECT l_returnflag,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS exact_revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_returnflag
)
SELECT e.l_returnflag, sample_rows, est_revenue, exact_revenue,
       ROUND(abs(est_revenue - exact_revenue) / exact_revenue, 6) AS rel_error
FROM est e JOIN exact x ON e.l_returnflag = x.l_returnflag
ORDER BY e.l_returnflag
"""


@query("coordinated_sample_join", oracle=_coordinated_sample_oracle(50000))
def coordinated_sample_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-query-processing join over COORDINATED hash samples
    (Join Synopses, Acharya et al. 1999): both orders and lineitem are
    sampled by the SAME deterministic hash of the order key, so the join
    of the samples IS a 5% sample of the join — two independent 5%
    samples would intersect on only 0.25% of the join and estimate
    nothing. Revenue scales by 1/rate; rel_error is the self-eval.

    Scale: both sample predicates evaluate inside their scans; the join
    and aggregation touch 5% of each input — the standard 20-400x
    speedup dial for exploratory aggregates over a 100 TB fact join,
    with the hash-coordination (unlike rand()) keeping it correct and
    reproducible. Deterministic membership is also what lets the oracle
    replay the exact sample."""
    from dawis_spark.operators.sketches import int_hash_sample_pred

    rate_ppm = 50000
    scale = 1_000_000 / rate_ppm
    o = spark.table("orders").where(
        F.expr(int_hash_sample_pred("o_orderkey", rate_ppm, "spark"))
    )
    li = spark.table("lineitem").where(
        F.expr(int_hash_sample_pred("l_orderkey", rate_ppm, "spark"))
    )
    est = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("sample_rows"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                * F.lit(scale),
                2,
            ).alias("est_revenue"),
        )
    )
    exact = (
        spark.table("lineitem")
        .join(spark.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("exact_revenue")
        )
    )
    return (
        est.join(exact, "l_returnflag")
        .withColumn(
            "rel_error",
            F.round(
                F.abs(F.col("est_revenue") - F.col("exact_revenue"))
                / F.col("exact_revenue"),
                6,
            ),
        )
        .orderBy("l_returnflag")
    )


def _classifier_oracle(n_features: int) -> str:
    from dawis_spark.operators.classifier import classifier_oracle_ctes

    return f"""
WITH {classifier_oracle_ctes('documents', 'doc_id', 'text', n_features)}
SELECT doc_id, n_tokens, score, mean_w, label
FROM clf ORDER BY doc_id
"""


@query("quality_classifier_scores", oracle=_classifier_oracle(4096))
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear classifier inference over the corpus
    (operators/classifier.py) — the fasttext-shaped quality-filter pass
    of an LLM data pipeline, with a deterministic stand-in weight
    vector (a trained artifact drops into the same plan).

    Scale: the model is ONE broadcast row; scoring is a codegen'd fold
    inside the document scan — zero shuffle, zero UDF, vs the
    token-explode + weights-join plan whose shuffle exceeds the corpus
    size at 100 TB (module design notes)."""
    from dawis_spark.operators.classifier import classify, pseudo_weights

    docs = spark.table("documents")
    w = pseudo_weights(spark, 4096)
    return (
        classify(docs, "doc_id", "text", w, n_features=4096)
        .select("doc_id", "n_tokens", "score", "mean_w", "label")
        .orderBy("doc_id")
    )


def _sampled_quantiles_oracle(rate_ppm: int, pcts: list[int]) -> str:
    from dawis_spark.operators.sketches import int_hash_sample_pred, rank_quantile_ctes

    pred = int_hash_sample_pred(
        "l_orderkey * 8 + l_linenumber", rate_ppm, "duck"
    )
    return f"""
WITH samp AS (
  SELECT l_returnflag, l_extendedprice FROM lineitem WHERE {pred}
),
{rank_quantile_ctes('samp', ['l_returnflag'], 'l_extendedprice', pcts, 'sq')}
SELECT l_returnflag, pct, n AS sample_n, value AS est_value
FROM sq ORDER BY l_returnflag, pct
"""


def _quantiles_error_oracle(rate_ppm: int, pcts: list[int]) -> str:
    from dawis_spark.operators.sketches import int_hash_sample_pred, rank_quantile_ctes

    pred = int_hash_sample_pred(
        "l_orderkey * 8 + l_linenumber", rate_ppm, "duck"
    )
    return f"""
WITH samp AS (
  SELECT l_returnflag, l_extendedprice FROM lineitem WHERE {pred}
),
{rank_quantile_ctes('samp', ['l_returnflag'], 'l_extendedprice', pcts, 'sq')},
{rank_quantile_ctes('lineitem', ['l_returnflag'], 'l_extendedprice', pcts, 'xq')}
SELECT s.l_returnflag, s.pct,
       s.n AS sample_n, s.value AS est_value, x.value AS exact_value,
       round(abs(s.value - x.value) / x.value, 6) AS rel_error
FROM sq s JOIN xq x ON s.l_returnflag = x.l_returnflag AND s.pct = x.pct
ORDER BY s.l_returnflag, s.pct
"""


@query("sampled_quantiles", oracle=_sampled_quantiles_oracle(50000, [50, 90, 99]))
def sampled_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a deterministic 5% hash sample
    (operators/sketches.py rank_quantiles design notes) — the
    estimate-only operator; its accuracy self-eval lives in
    quantiles_error_eval so the bench prices the operator, not its
    exact baseline (split per VERDICT r7 ask #5).

    Scale: an exact per-group quantile sorts the FULL group — at 100 TB
    that is the dominant shuffle+sort of any summary pipeline. The
    hash-sample predicate evaluates inside the scan — the INTEGER-key
    uniformizer (int_hash_sample_pred), pure codegen arithmetic where
    the string form pays an interpreted per-character fold (measured
    2.5 s -> ~0.15 s on the 600k-row scan) — so the sort sees 5% of the rows for a rank error of
    O(1/√(0.05·n)); membership is a pure function of the row id, making
    the estimate reproducible across runs, partitionings, and engines
    (the oracle replays the exact sample), and coordinated across
    tables — the join-synopses property rand()-sampling lacks."""
    from dawis_spark.operators.sketches import int_hash_sample_pred, rank_quantiles

    li = spark.table("lineitem")
    pred = int_hash_sample_pred("l_orderkey * 8 + l_linenumber", 50000, "spark")
    samp = li.where(F.expr(pred))
    est = rank_quantiles(samp, ["l_returnflag"], "l_extendedprice", [50, 90, 99])
    return (
        est.select(
            "l_returnflag",
            "pct",
            F.col("n").alias("sample_n"),
            F.col("value").alias("est_value"),
        ).orderBy("l_returnflag", "pct")
    )


@query("quantiles_error_eval", oracle=_quantiles_error_oracle(50000, [50, 90, 99]))
def quantiles_error_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy self-eval for sampled_quantiles: the 5% hash-sample
    estimate joined against the exact nearest-rank quantiles, with the
    realized relative error per (group, pct).

    The exact side uses distributed SELECTION, not the per-group window
    sort: with 3 groups the window form's parallelism is 3 at any data
    size; selection shuffles bucket COUNTS and sorts only the chosen
    buckets (operators/sketches.py rank_quantiles_select; values
    identical by construction, so the window-form oracle SQL still
    replays this side exactly)."""
    from dawis_spark.operators.sketches import (
        int_hash_sample_pred,
        rank_quantiles,
        rank_quantiles_select,
    )

    li = spark.table("lineitem")
    pred = int_hash_sample_pred("l_orderkey * 8 + l_linenumber", 50000, "spark")
    samp = li.where(F.expr(pred))
    est = rank_quantiles(samp, ["l_returnflag"], "l_extendedprice", [50, 90, 99])
    exact = rank_quantiles_select(
        li, ["l_returnflag"], "l_extendedprice", [50, 90, 99]
    )
    return (
        est.select(
            "l_returnflag",
            "pct",
            F.col("n").alias("sample_n"),
            F.col("value").alias("est_value"),
        )
        .join(
            exact.select(
                "l_returnflag", "pct", F.col("value").alias("exact_value")
            ),
            ["l_returnflag", "pct"],
        )
        .withColumn(
            "rel_error",
            F.round(
                F.abs(F.col("est_value") - F.col("exact_value"))
                / F.col("exact_value"),
                6,
            ),
        )
        .orderBy("l_returnflag", "pct")
    )


def _textrank_oracle(iterations: int, top_n: int) -> str:
    from dawis_spark.operators.graph import pagerank_oracle_ctes

    toks = _TXT.tokens("text", "duck")
    return f"""
WITH tok AS (
  SELECT doc_id, tok, p FROM (
    SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS p
    FROM (SELECT doc_id, {toks} AS ts FROM documents))
  WHERE length(tok) >= 4),
adj AS (
  SELECT DISTINCT a.tok AS src, b.tok AS dst
  FROM tok a JOIN tok b
    ON a.doc_id = b.doc_id AND b.p - a.p BETWEEN 1 AND 2
   AND a.tok <> b.tok),
edges AS (
  SELECT src, dst FROM adj UNION SELECT dst, src FROM adj),
{pagerank_oracle_ctes('edges', iterations)}
SELECT node AS token, rank_scaled,
       round(CAST(rank_scaled AS DOUBLE) / 1e12, 6) AS rank
FROM pr
ORDER BY rank_scaled DESC, token
LIMIT {top_n}
"""


@query("textrank_keywords", oracle=_textrank_oracle(3, 20))
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction: PageRank (3 fixed iterations, exact
    scaled-int64) over the corpus-level token co-occurrence graph —
    content tokens (length >= 4) adjacent within a 2-token window,
    symmetrized and deduplicated. The graph-centrality member of the
    keyword family: rake_keyphrases scores phrases by degree/frequency
    inside stopword-delimited chunks, lexrank_top_sentences ranks
    SENTENCES — TextRank ranks TOKENS by global graph importance,
    which surfaces terms that bridge many contexts even at moderate
    frequency.

    Exactness: edge construction is exact (positions from ordinality);
    the rank trajectory is the shared integer-division PageRank
    (operators/graph.py), replayed bit-for-bit by the oracle chain;
    top-20 with (rank, token) tie order.

    Scale: the position self-join shuffles on doc_id (positional pairs
    are corpus-linear with a x2 window constant); the DISTINCT
    collapses to the vocab-x-vocab adjacency, so the three rank
    iterations join vocab-bounded relations — the pagerank_top_nodes
    posture with tokens for nodes."""
    from dawis_spark.operators.graph import pagerank

    toks = _TXT.tokens("text", "spark")
    tok = (
        spark.table("documents")
        .select("doc_id", F.posexplode(F.expr(toks)).alias("p", "tok"))
        .filter(F.length("tok") >= 4)
    )
    a = tok.selectExpr("doc_id", "p AS pa", "tok AS src")
    b = tok.selectExpr("doc_id", "p AS pb", "tok AS dst")
    adj = (
        a.join(b, "doc_id")
        .filter(F.expr("pb - pa BETWEEN 1 AND 2 AND src <> dst"))
        .select("src", "dst")
        .distinct()
    )
    edges = (
        adj.unionAll(adj.selectExpr("dst AS src", "src AS dst"))
        .distinct()
        .persist()
    )
    return (
        pagerank(edges, iterations=3)
        .selectExpr(
            "node AS token",
            "rank_scaled",
            "round(CAST(rank_scaled AS DOUBLE) / 1e12, 6) AS rank",
        )
        .orderBy(F.desc("rank_scaled"), "token")
        .limit(20)
    )


def _pagerank_oracle(iterations: int, top_n: int) -> str:
    from dawis_spark.operators.graph import pagerank_oracle_ctes

    return f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
),
{pagerank_oracle_ctes('edges', iterations)}
SELECT node, rank_scaled,
       round(CAST(rank_scaled AS DOUBLE) / 1e12, 6) AS rank
FROM pr
ORDER BY rank_scaled DESC, node
LIMIT {top_n}
"""


@query("pagerank_top_nodes", oracle=_pagerank_oracle(3, 20))
def pagerank_top_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (operators/graph.py) over the
    symmetrized customer↔supplier trade graph — the iterative-algorithm
    shape (Pregel-style message passing as unrolled DataFrame joins)
    the relational inventory otherwise lacks.

    Scale: per iteration one edges⋈ranks shuffle join plus one
    groupBy(dst) — edge-count-bound, with node-count-bound side tables;
    the edge relation is persisted because every iteration re-reads it
    (on a cluster it would also be bucketed by src so the iteration
    joins co-locate). Exact scaled-int64 arithmetic makes the result
    independent of partitioning and summation order — the property that
    lets DuckDB replay all three iterations bit-for-bit.

    Node ids are int64 (even = customer 2k, odd = supplier 2k+1), not
    'c123'-style strings: the id column rides every iteration's shuffle
    twice, and an 8-byte fixed key hashes/compares in codegen where a
    variable-length UTF8 key drags the whole join path — measured ~1.4x
    on the 10x rehearsal for identical results."""
    from dawis_spark.operators.graph import pagerank

    pairs = (
        spark.table("lineitem")
        .join(
            spark.table("orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .unionAll(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
        .persist()
    )
    return (
        pagerank(edges, iterations=3)
        .select(
            "node",
            "rank_scaled",
            F.round(F.col("rank_scaled").cast("double") / 1e12, 6).alias("rank"),
        )
        .orderBy(F.desc("rank_scaled"), F.asc("node"))
        .limit(20)
    )


def _sq8_ann_oracle(k: int, n_queries: int, dim: int) -> str:
    from dawis_spark.operators.similarity import sq8_oracle_ctes

    cos = _VEC.cosine("q_vec", "c_vec", "duck")
    return f"""
WITH {sq8_oracle_ctes('embeddings', 'vec_id', 'embedding', dim)},
q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < {n_queries}),
scored AS (
  SELECT query_id, neighbor_id, ROUND({cos}, 6) AS cosine
  FROM q, sq8_recon WHERE query_id != neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
ORDER BY query_id, rank
"""


@query("embedding_ann_sq8", oracle=_sq8_ann_oracle(5, 10, 64))
def embedding_ann_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized (SQ8) search — FAISS IndexScalarQuantizer shape:
    per-dimension [lo, hi] levels, one byte per component, asymmetric
    reconstruct-and-score against the raw query
    (operators/similarity.py sq8_* design notes).

    Scale: the stored/scanned form is 4x smaller than float32 vectors —
    at 100 TB that is the difference between an embedding index that
    fits hot storage and one that doesn't — while the search plan stays
    the exact-scan shape: stats broadcast as one row, encode and scoring
    codegen'd inside the corpus scan, only (id, score) pairs shuffle for
    top-k. SQ8 slots between brute force (no compression) and PQ (64x,
    lossier) in the quantization family."""
    from dawis_spark.operators.similarity import sq8_encode, sq8_stats, sq8_topk

    emb = spark.table("embeddings")
    stats = sq8_stats(emb, "embedding", dim=64)
    codes = sq8_encode(emb, "vec_id", "embedding", stats, dim=64)
    return sq8_topk(
        codes,
        stats,
        emb.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        dim=64,
    ).orderBy("query_id", "rank")


def _ann_recall_sq8_oracle(k: int) -> str:
    exact = _embedding_topk_oracle(k, 10).strip()
    approx = _sq8_ann_oracle(k, 10, 64).strip()
    return f"""
WITH exact_r AS (SELECT * FROM ({exact})),
approx_r AS (SELECT * FROM ({approx}))
SELECT e.query_id,
  CAST(COUNT(a.neighbor_id) AS BIGINT) AS hits,
  ROUND(CAST(COUNT(a.neighbor_id) AS DOUBLE) / {k}, 6) AS recall_at_k
FROM exact_r e
LEFT JOIN approx_r a
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id ORDER BY e.query_id
"""


@query("ann_recall_sq8", oracle=_ann_recall_sq8_oracle(5))
def ann_recall_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the SQ8 asymmetric scan against exact brute force —
    the quantization family's accuracy dial (expected ≈ 1.0 at 8 bits
    per dimension; drops appear only when [lo, hi] is stretched by
    outlier dimensions). Completes the self-eval set: LSH, multiprobe,
    IVF, PQ, IVFPQ, IVFADC, filtered-IVF, SQ8."""
    from dawis_spark.operators.similarity import (
        brute_force_topk,
        sq8_encode,
        sq8_stats,
        sq8_topk,
    )

    emb = spark.table("embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(
        corpus=emb, queries=queries_df, id_col="vec_id",
        vec_col="embedding", k=5,
    ).select("query_id", "neighbor_id")
    stats = sq8_stats(emb, "embedding", dim=64)
    codes = sq8_encode(emb, "vec_id", "embedding", stats, dim=64)
    approx = sq8_topk(
        codes, stats, queries_df, id_col="vec_id", vec_col="embedding",
        k=5, dim=64,
    ).select(
        F.col("query_id").alias("a_qid"), F.col("neighbor_id").alias("a_nid")
    )
    joined = exact.join(
        approx,
        (exact["query_id"] == approx["a_qid"])
        & (exact["neighbor_id"] == approx["a_nid"]),
        "left",
    )
    return (
        joined.groupBy("query_id")
        .agg(
            F.count("a_nid").cast("bigint").alias("hits"),
            F.round(F.count("a_nid").cast("double") / F.lit(5), 6).alias(
                "recall_at_k"
            ),
        )
        .orderBy("query_id")
    )


def _bloom_oracle(m: int, d: int) -> str:
    from dawis_spark.operators.bloomjoin import bloom_oracle_ctes, bloom_probe_pred

    return f"""
WITH dim_keys AS (
  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_9'
),
{bloom_oracle_ctes('dim_keys', 's_suppkey', m, d)},
probe AS (
  SELECT l_returnflag,
         {bloom_probe_pred('l_suppkey', m, d)} AS pass,
         l_suppkey IN (SELECT s_suppkey FROM dim_keys) AS is_match
  FROM lineitem CROSS JOIN bloom
),
agg AS (
  SELECT l_returnflag,
         COUNT(*) AS n_rows,
         CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
         CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_bloom
  FROM probe GROUP BY l_returnflag
)
SELECT l_returnflag, n_rows, n_exact, n_pass_bloom,
       CAST(n_pass_bloom - n_exact AS BIGINT) AS n_false_pos,
       round(CAST(n_pass_bloom - n_exact AS DOUBLE)
             / greatest(n_rows - n_exact, 1), 6) AS fp_rate
FROM agg ORDER BY l_returnflag
"""


@query("bloom_semi_join", oracle=_bloom_oracle(128, 2))
def bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter runtime join pruning (operators/bloomjoin.py): build
    the filter from the NATION_9 supplier keys, reject non-matching
    lineitem rows map-side BEFORE any exchange, and score the realized
    false-positive rate against the exact semi join.

    Scale: this is the explicit form of Spark's runtime bloom filter /
    DPP — at 100 TB the selective-dim semi join shuffles only the
    matching fraction plus the deterministic FP residue instead of the
    full fact table. The filter is a sorted position array (≤ m ints)
    broadcast once; the probe is codegen'd array search inside the scan
    stage. m here is measurement-sized (128 bits for ~10 keys) so the
    self-eval exhibits a nonzero FP rate at sf0.01; deployments size
    m ≈ 10-16 bits per expected distinct key (FPR ≈ (1-e^(-dn/m))^d).
    """
    from dawis_spark.operators.bloomjoin import bloom_build, bloom_probe

    m, d = 128, 2
    keys = (
        spark.table("supplier")
        .join(
            spark.table("nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .where(F.col("n_name") == "NATION_9")
        .select("s_suppkey")
    )
    bloom = bloom_build(keys, "s_suppkey", m=m, d=d)
    li = spark.table("lineitem")
    passed = (
        bloom_probe(li, "l_suppkey", bloom, m=m, d=d)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_pass_bloom"))
    )
    exact = (
        li.join(
            keys.withColumnRenamed("s_suppkey", "l_suppkey"),
            "l_suppkey",
            "left_semi",
        )
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    totals = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_rows"))
    return (
        totals.join(exact, "l_returnflag", "left")
        .join(passed, "l_returnflag", "left")
        .select(
            "l_returnflag",
            "n_rows",
            F.coalesce("n_exact", F.lit(0)).alias("n_exact"),
            F.coalesce("n_pass_bloom", F.lit(0)).alias("n_pass_bloom"),
        )
        .withColumn("n_false_pos", F.col("n_pass_bloom") - F.col("n_exact"))
        .withColumn(
            "fp_rate",
            F.round(
                F.col("n_false_pos").cast("double")
                / F.greatest(F.col("n_rows") - F.col("n_exact"), F.lit(1)),
                6,
            ),
        )
        .orderBy("l_returnflag")
    )


def _ivfpq_refine_oracle(
    k: int, rf: int, n_queries: int, n_cent: int, n_probe: int, n_sub: int,
    ds: int, ks: int, dim: int,
) -> str:
    """Refined-IVFPQ replay: the full IVFPQ oracle (trained coarse
    quantizer + PQ train/encode/ADC) retains k*rf candidates, then the
    candidate pairs re-score with exact cosine over the raw vectors and
    the true top-k survives — the same two stages the Spark operator
    composes."""
    inner = _ivfpq_oracle(k * rf, n_queries, n_cent, n_probe, n_sub, ds, ks, dim).strip()
    cos = _VEC.cosine("q.vec", "n.vec", "duck")
    return f"""
WITH cand AS (SELECT query_id, neighbor_id FROM ({inner})),
ev AS (SELECT vec_id, embedding AS vec FROM embeddings),
rer AS (
  SELECT c.query_id, c.neighbor_id, ROUND({cos}, 6) AS cosine
  FROM cand c
  JOIN ev q ON q.vec_id = c.query_id
  JOIN ev n ON n.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM rer
) WHERE rank <= {k}
ORDER BY query_id, rank
"""


@query("embedding_ann_refined", oracle=_ivfpq_refine_oracle(5, 3, 10, 16, 4, 4, 16, 16, 64))
def embedding_ann_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFPQ retrieval + exact re-ranking (FAISS ``IndexRefineFlat``
    shape, operators/similarity.ivfpq_refine_topk): stage 1 scans PQ
    codes in 4 probed buckets and keeps top-15 per query by ADC score;
    stage 2 re-scores ONLY those 15 pairs exactly and keeps the true
    top-5. The production recipe for compressed-index search with
    near-exact quality: ADC ordering mistakes inside the pool are
    corrected for free, and quantization error costs recall only when a
    true neighbor misses the pool entirely.

    Scale: the candidate set is queries x pool-sized, so the refine pass
    broadcasts it into one more corpus (id, vec) scan — no exchange
    carries a raw vector; at 100 TB the refine overhead is a map-side
    hash probe per corpus row. Oracle replays both stages in one SQL."""
    from dawis_spark.operators.similarity import ivfpq_refine_topk, pq_train

    emb = spark.table("embeddings")
    books = pq_train(emb, "vec_id", "embedding", n_subspaces=4, n_codes=16)
    return ivfpq_refine_topk(
        corpus=emb,
        queries=emb.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        refine_factor=3,
        n_centroids=16,
        n_probe=4,
        books=books,
    ).orderBy("query_id", "rank")


def _ann_recall_refined_oracle(k: int) -> str:
    exact = _embedding_topk_oracle(k, 10).strip()
    raw = _ivfpq_oracle(k, 10, 16, 4, 4, 16, 16, 64).strip()
    refined = _ivfpq_refine_oracle(k, 3, 10, 16, 4, 4, 16, 16, 64).strip()
    return f"""
WITH exact_r AS (SELECT * FROM ({exact})),
raw_r AS (SELECT * FROM ({raw})),
ref_r AS (SELECT * FROM ({refined}))
SELECT e.query_id,
  ROUND(CAST(COUNT(r1.neighbor_id) AS DOUBLE) / {k}, 6) AS recall_ivfpq,
  ROUND(CAST(COUNT(r2.neighbor_id) AS DOUBLE) / {k}, 6) AS recall_refined
FROM exact_r e
LEFT JOIN raw_r r1
  ON e.query_id = r1.query_id AND e.neighbor_id = r1.neighbor_id
LEFT JOIN ref_r r2
  ON e.query_id = r2.query_id AND e.neighbor_id = r2.neighbor_id
GROUP BY e.query_id ORDER BY e.query_id
"""


@query("ann_recall_refined", oracle=_ann_recall_refined_oracle(5))
def ann_recall_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of raw IVFPQ vs refined IVFPQ against exact brute force,
    per query — the self-eval that justifies the refine stage's extra
    corpus scan (refined recall must dominate raw: the refine pool is a
    superset of the raw top-k, re-ranked exactly). One shared quantizer
    training feeds all approximate sides; the comparison joins are
    top-k-sized."""
    from dawis_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_ann_topk,
        ivfpq_refine_topk,
        pq_train,
        train_kmeans,
    )

    emb = spark.table("embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    books = pq_train(emb, "vec_id", "embedding", n_subspaces=4, n_codes=16)
    cents = train_kmeans(emb, "vec_id", "embedding", k=16, iterations=1)
    exact = brute_force_topk(
        corpus=emb, queries=qs, id_col="vec_id", vec_col="embedding", k=5
    ).select("query_id", "neighbor_id")
    raw = ivfpq_ann_topk(
        emb, qs, "vec_id", "embedding", k=5, n_centroids=16, n_probe=4,
        books=books, centroids=cents,
    ).select(F.col("query_id").alias("r1_qid"), F.col("neighbor_id").alias("r1_nid"))
    ref = ivfpq_refine_topk(
        emb, qs, "vec_id", "embedding", k=5, refine_factor=3,
        n_centroids=16, n_probe=4, books=books, centroids=cents,
    ).select(F.col("query_id").alias("r2_qid"), F.col("neighbor_id").alias("r2_nid"))
    joined = (
        exact.join(
            raw,
            (exact["query_id"] == raw["r1_qid"])
            & (exact["neighbor_id"] == raw["r1_nid"]),
            "left",
        ).join(
            ref,
            (F.col("query_id") == F.col("r2_qid"))
            & (F.col("neighbor_id") == F.col("r2_nid")),
            "left",
        )
    )
    return (
        joined.groupBy("query_id")
        .agg(
            F.round(F.count("r1_nid").cast("double") / 5, 6).alias("recall_ivfpq"),
            F.round(F.count("r2_nid").cast("double") / 5, 6).alias("recall_refined"),
        )
        .orderBy("query_id")
    )


_ANOMALY_MAD_ORACLE = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
med AS (SELECT event_type, median(cnt) AS med FROM daily GROUP BY 1),
dev AS (
  SELECT d.event_type, d.day, d.cnt, d.cnt - m.med AS delta,
         ABS(d.cnt - m.med) AS adev
  FROM daily d JOIN med m USING (event_type)
),
mad AS (SELECT event_type, median(adev) AS mad FROM dev GROUP BY 1),
scored AS (
  SELECT dv.event_type, dv.day, dv.cnt,
         ROUND(dv.delta / NULLIF(1.4826 * md.mad, 0), 6) AS robust_z
  FROM dev dv JOIN mad md USING (event_type)
)
SELECT event_type, day, cnt, robust_z,
       COALESCE(ABS(robust_z) > 3.0, FALSE) AS is_anomaly
FROM scored
ORDER BY event_type, day
"""


@query("anomaly_mad_daily", oracle=_ANOMALY_MAD_ORACLE)
def anomaly_mad_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection over daily event volumes
    (operators/anomaly.robust_zscores): per event type, score each day's
    count by its median/MAD z-score and flag |z| > 3 — the statistical
    escalation of the reference's fixed-threshold checks (SURVEY §2.5
    A5/A6) for series where thresholds can't be hand-set.

    Scale: the raw stream aggregates to (series, day) FIRST, so the
    holistic medians run over time-bounded groups (#days) while the
    series count scales freely; all three aggregations and both joins
    share the series key — one exchange footprint under AQE. At 100 TB
    of events this plan touches the fact table exactly once."""
    from dawis_spark.operators.anomaly import robust_zscores

    daily = (
        spark.table("events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        robust_zscores(daily, ["event_type"], "cnt", z_threshold=3.0)
        .select("event_type", "day", "cnt", "robust_z", "is_anomaly")
        .orderBy("event_type", "day")
    )


_GAPFILL_ORACLE = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day, ROUND(SUM(value), 2) AS total
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT user_id, MIN(day) AS b0, MAX(day) AS b1 FROM daily GROUP BY 1),
spine AS (
  SELECT user_id, UNNEST(generate_series(b0, b1, INTERVAL 1 DAY)) AS day
  FROM bounds
),
j AS (
  SELECT s.user_id, s.day, d.total
  FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
)
SELECT user_id, day, total,
  last_value(total IGNORE NULLS) OVER (
    PARTITION BY user_id ORDER BY day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
  total IS NULL AS is_gap
FROM j ORDER BY user_id, day
"""


@query("gapfill_daily_user_value", oracle=_GAPFILL_ORACLE)
def gapfill_daily_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily value series with gap filling
    (operators/gapfill.gapfill_locf): generate each user's own date
    spine over [first, last] active day, left-join the observed daily
    totals, carry the last observation forward, and flag generated rows
    — the TimescaleDB ``time_bucket_gapfill + locf`` shape that makes
    downstream period joins and anomaly scoring see one row per
    (series, day).

    Scale: the spine explodes per key from a bounded per-key range (no
    global calendar cross join); bounds agg, spine join, and the LOCF
    window all share the user key. At 100 TB the fact table is read
    once into the daily rollup and everything after is rollup-sized."""
    from dawis_spark.operators.gapfill import gapfill_locf

    daily = (
        spark.table("events")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    return (
        gapfill_locf(daily, ["user_id"], "day", "total", step="1 day")
        .select("user_id", "day", "total", "filled", "is_gap")
        .orderBy("user_id", "day")
    )


def _dup_spans_oracle(k: int) -> str:
    th = _TXT.token_hash_array("text", "duck")
    whs = _TXT.window_hash_structs("h", k, "duck")
    return f"""
WITH th AS (SELECT doc_id, {th} AS h FROM documents),
w0 AS (SELECT doc_id, unnest({whs}) AS u FROM th),
w AS (SELECT doc_id, u.pos AS pos, u.wh AS wh FROM w0),
freq AS (SELECT wh FROM w GROUP BY wh HAVING COUNT(*) >= 2),
dup AS (SELECT doc_id, pos FROM w WHERE wh IN (SELECT wh FROM freq)),
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM dup
)
SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + {k} AS span_end,
       COUNT(*) AS n_windows
FROM isl GROUP BY doc_id, grp
ORDER BY doc_id, span_start
"""


@query("duplicated_spans", oracle=_dup_spans_oracle(8))
def duplicated_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring spans (operators/dedup.duplicated_spans;
    Lee et al. 2021 suffix-array dedup re-expressed distributed): every
    maximal token span whose 8-token windows all repeat somewhere in the
    corpus — the span-level complement to document-level MinHash dedup
    (boilerplate, license headers, copied passages inside otherwise
    unique docs).

    Scale: bodies reduce to (doc, pos, 8-byte hash) in the scan; the
    frequency count and semi join shuffle hashes only; the island merge
    windows per doc. At 100 TB this is the only known shuffle-friendly
    form — a suffix array would need a global sort of every suffix."""
    from dawis_spark.operators.dedup import duplicated_spans

    return (
        duplicated_spans(
            spark.table("documents"), "doc_id", "text", window_k=8
        )
        .select("doc_id", "span_start", "span_end", "n_windows")
        .orderBy("doc_id", "span_start")
    )


def _dsir_oracle(m: int) -> str:
    from dawis_spark.operators.dsir import feature_buckets_expr

    feats = feature_buckets_expr("text", m, "duck")
    return f"""
WITH tgt AS (SELECT {feats} AS f FROM documents WHERE source = 'src0'),
raw AS (SELECT doc_id, {feats} AS f FROM documents WHERE source != 'src0'),
ctc AS (SELECT b, COUNT(*) AS c FROM (SELECT unnest(f) AS b FROM tgt) GROUP BY b),
crc AS (SELECT b, COUNT(*) AS c FROM (SELECT unnest(f) AS b FROM raw) GROUP BY b),
tots AS (SELECT (SELECT COALESCE(SUM(c), 0) FROM ctc) AS t_tot,
                (SELECT COALESCE(SUM(c), 0) FROM crc) AS r_tot),
lam AS (
  SELECT gs.b AS b,
         ROUND(ln((COALESCE(tc.c, 0) + 1.0) / (t.t_tot + {m}))
             - ln((COALESCE(rc.c, 0) + 1.0) / (t.r_tot + {m})), 6) AS lam
  FROM range(0, {m}) gs(b)
  LEFT JOIN ctc tc ON tc.b = gs.b
  LEFT JOIN crc rc ON rc.b = gs.b
  CROSS JOIN tots t
),
lamv AS (SELECT list(lam ORDER BY b) AS lv FROM lam)
SELECT doc_id, len(f) AS n_feats,
       ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(f, b -> lv[b + 1])), (s, v) -> s + v), 6) AS log_ir
FROM raw, lamv
ORDER BY doc_id
"""


@query("dsir_importance_weights", oracle=_dsir_oracle(1024))
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (operators/dsir.py; Xie et al. 2023): score
    every raw document by its log importance ratio under hashed
    unigram+bigram bag models of the target slice (source src0) vs the
    raw corpus — the principled replacement for a hand-tuned quality
    threshold when "quality" means "looks like this target set".

    Scale: model estimation is two m-bounded bucket-count aggregations
    (partial agg keeps the exchange at m rows per task); the fused
    log-ratio vector is ONE driver-side literal array and scoring is a
    codegen'd fold inside the raw scan — the classifier plan, zero
    shuffle. Oracle replays estimation AND scoring in one SQL."""
    from dawis_spark.operators.dsir import dsir_scores, dsir_train

    docs = spark.table("documents")
    tgt = docs.filter(F.col("source") == "src0")
    raw = docs.filter(F.col("source") != "src0")
    lam = dsir_train(tgt, raw, "text", m=1024)
    return dsir_scores(raw, "doc_id", "text", lam, m=1024).orderBy("doc_id")


def _phrase_oracle(phrase: str) -> str:
    from dawis_spark.operators.corpus import phrase_term_hashes

    hs = phrase_term_hashes(phrase)
    th = _TXT.token_hash_array("text", "duck")
    vals = ", ".join(f"({i}, {h})" for i, h in enumerate(hs))
    return f"""
WITH th AS (SELECT doc_id, {th} AS h FROM documents),
post AS (
  SELECT doc_id,
         unnest(range(0, len(h))) AS pos,
         unnest(list_transform(range(0, len(h)), i -> h[i + 1])) AS term
  FROM th
),
ph(i, term) AS (VALUES {vals}),
cand AS (
  SELECT p.doc_id, p.pos - ph.i AS base, ph.i
  FROM post p JOIN ph ON p.term = ph.term
),
hits AS (
  SELECT doc_id, base FROM cand
  GROUP BY doc_id, base HAVING COUNT(DISTINCT i) = {len(hs)}
)
SELECT doc_id, COUNT(*) AS n_matches, MIN(base) AS first_pos
FROM hits GROUP BY doc_id ORDER BY doc_id
"""


@query("phrase_search", oracle=_phrase_oracle("slow hash batch"))
def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search over a positional inverted index
    (operators/corpus.build_postings + phrase_query): documents
    containing the token phrase "slow hash batch", with occurrence count
    and first offset — the positional-intersection complement to
    bm25_search's bag-of-words ranking.

    Scale: the index is built once (the one token-sized shuffle, then
    persisted bucketed by term in production) and the query touches only
    the 3 probed terms' postings — the phrase relation broadcasts, and
    everything on the wire is (hash, id, position) ints."""
    from dawis_spark.operators.corpus import (
        build_postings,
        phrase_query,
        phrase_term_hashes,
    )

    postings = build_postings(spark.table("documents"), "doc_id", "text")
    return phrase_query(
        postings, "doc_id", phrase_term_hashes("slow hash batch")
    ).orderBy("doc_id")


def _pmi_oracle(min_count: int, k: int) -> str:
    toks = _TXT.tokens("text", "duck")
    return f"""
WITH tk AS (SELECT {toks} AS w FROM documents),
uni AS (SELECT unnest(w) AS t FROM tk),
unic AS (SELECT t, COUNT(*) AS c FROM uni GROUP BY t),
bi AS (
  SELECT w[i] AS t1, w[i + 1] AS t2
  FROM tk, unnest(range(1, greatest(len(w) - 1, 0) + 1)) AS u(i)
),
bic AS (SELECT t1, t2, COUNT(*) AS c12 FROM bi GROUP BY t1, t2),
tot AS (SELECT (SELECT COUNT(*) FROM uni) AS n, (SELECT COUNT(*) FROM bi) AS b)
SELECT t1 || ' ' || t2 AS bigram, c12,
       ROUND(ln((c12 * 1.0 / t.b) / ((u1.c * 1.0 / t.n) * (u2.c * 1.0 / t.n))), 6) AS pmi
FROM bic
JOIN unic u1 ON bic.t1 = u1.t
JOIN unic u2 ON bic.t2 = u2.t
CROSS JOIN tot t
WHERE c12 >= {min_count}
ORDER BY pmi DESC, bigram LIMIT {k}
"""


@query("pmi_collocations", oracle=_pmi_oracle(5, 50))
def pmi_collocations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 collocations by pointwise mutual information
    (operators/corpus.pmi_collocations; Church & Hanks 1990 — the
    word2vec phrase-pass statistic): adjacent token pairs that co-occur
    far above chance, with the classic min-count cutoff against rare-
    pair noise.

    Scale: unigram/bigram counting partially aggregates map-side
    (vocabulary-sized exchanges); scoring joins vocabulary-sized count
    relations; the two scalar totals broadcast. The final top-k is a
    TakeOrdered, not a global sort."""
    from dawis_spark.operators.corpus import pmi_collocations

    return (
        pmi_collocations(spark.table("documents"), "text", min_count=5)
        .orderBy(F.desc("pmi"), "bigram")
        .limit(50)
    )


_DQ_ORACLE = """
WITH v1 AS (SELECT o_orderkey FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
v2 AS (SELECT l_orderkey FROM lineitem l
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
v3 AS (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1),
v4 AS (SELECT 1 AS x FROM customer WHERE c_custkey IS NULL),
v5 AS (SELECT 1 AS x FROM orders
       WHERE o_orderstatus NOT IN ('O', 'F', 'P') OR o_orderstatus IS NULL),
v6 AS (SELECT 1 AS x FROM lineitem WHERE l_quantity <= 0 OR l_extendedprice < 0)
SELECT 'orders_custkey_fk' AS check_name, (SELECT COUNT(*) FROM v1) AS n_violations,
       (SELECT COUNT(*) FROM v1) = 0 AS passed
UNION ALL SELECT 'lineitem_orderkey_fk', (SELECT COUNT(*) FROM v2),
       (SELECT COUNT(*) FROM v2) = 0
UNION ALL SELECT 'orders_pk_unique', (SELECT COUNT(*) FROM v3),
       (SELECT COUNT(*) FROM v3) = 0
UNION ALL SELECT 'customer_custkey_not_null', (SELECT COUNT(*) FROM v4),
       (SELECT COUNT(*) FROM v4) = 0
UNION ALL SELECT 'orders_status_domain', (SELECT COUNT(*) FROM v5),
       (SELECT COUNT(*) FROM v5) = 0
UNION ALL SELECT 'lineitem_positive_amounts', (SELECT COUNT(*) FROM v6),
       (SELECT COUNT(*) FROM v6) = 0
ORDER BY check_name
"""


@query("dq_integrity_checks", oracle=_DQ_ORACLE)
def dq_integrity_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse data-quality suite (operators/checks.dq_suite — the
    dbt-tests shape): FK integrity orders->customer and
    lineitem->orders, PK uniqueness, not-null, accepted-values domain,
    and range invariants, reduced to one (check_name, n_violations, passed)
    row each and unioned into a single alertable relation.

    Scale: every check is an independent count over a pruned scan —
    anti joins for FKs (null-safe, broadcastable dims), map-side
    predicate counts for the rest; the union carries six rows. This is
    what a 100 TB nightly QA gate looks like: no violation ROWS move
    unless someone asks for them."""
    from dawis_spark.operators.checks import dq_suite

    orders = spark.table("orders")
    customer = spark.table("customer")
    lineitem = spark.table("lineitem")
    checks = [
        (
            "orders_custkey_fk",
            orders.join(
                customer.select(F.col("c_custkey").alias("o_custkey")),
                "o_custkey",
                "left_anti",
            ),
        ),
        (
            "lineitem_orderkey_fk",
            lineitem.join(
                orders.select(F.col("o_orderkey").alias("l_orderkey")),
                "l_orderkey",
                "left_anti",
            ),
        ),
        (
            "orders_pk_unique",
            orders.groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1),
        ),
        ("customer_custkey_not_null", customer.filter(F.col("c_custkey").isNull())),
        (
            "orders_status_domain",
            orders.filter(
                ~F.col("o_orderstatus").isin("O", "F", "P")
                | F.col("o_orderstatus").isNull()
            ),
        ),
        (
            "lineitem_positive_amounts",
            lineitem.filter(
                (F.col("l_quantity") <= 0) | (F.col("l_extendedprice") < 0)
            ),
        ),
    ]
    return dq_suite(checks).orderBy("check_name")


def _js_oracle() -> str:
    toks = _TXT.tokens("text", "duck")
    return f"""
WITH tk AS (SELECT source AS src, unnest({toks}) AS t FROM documents),
cnt AS (SELECT src, t, COUNT(*) AS c FROM tk GROUP BY src, t),
tot AS (SELECT src, SUM(c) AS n FROM cnt GROUP BY src),
p AS (SELECT cnt.src, t, cnt.c * 1.0 / tot.n AS p FROM cnt JOIN tot ON cnt.src = tot.src),
sh AS (
  SELECT a.src AS src_a, b.src AS src_b,
         SUM(a.p * ln(2.0 * a.p / (a.p + b.p))
           + b.p * ln(2.0 * b.p / (a.p + b.p))) AS sh_term,
         SUM(a.p) AS ma, SUM(b.p) AS mb
  FROM p a JOIN p b ON a.t = b.t AND a.src < b.src
  GROUP BY a.src, b.src
)
SELECT src_a, src_b,
       ROUND(0.5 * sh_term + 0.5 * ln(2.0) * ((1.0 - ma) + (1.0 - mb)), 6) AS js_div
FROM sh ORDER BY src_a, src_b
"""


@query("source_js_divergence", oracle=_js_oracle())
def source_js_divergence_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between source unigram
    distributions (operators/corpus.source_js_divergence) — the
    source-similarity matrix read next to source_mixture_weights when
    designing a training mixture.

    Scale: one corpus-scan counting aggregation, then everything is
    vocabulary-sized; the one-sided-token masses fold into shared-mass
    sums so no full-outer (pair x token) relation ever materializes."""
    from dawis_spark.operators.corpus import source_js_divergence

    return source_js_divergence(
        spark.table("documents"), "source", "text"
    ).orderBy("src_a", "src_b")


def _entropy_oracle() -> str:
    s = _TS.sorted_tokens_sql("text", "duck")
    st = _TS.run_starts_sql("s", "duck")
    ent = _TS.entropy_from_runs_sql("st", "len(s)", "duck")
    return f"""
WITH srt AS (SELECT doc_id, {s} AS s FROM documents),
runs AS (SELECT doc_id, s, {st} AS st FROM srt)
SELECT doc_id,
       len(s) AS n_tokens,
       len(st) AS n_distinct,
       ROUND({ent}, 6) AS entropy,
       ROUND(({ent}) / NULLIF(ln(len(st)), 0.0), 6) AS norm_entropy
FROM runs ORDER BY doc_id
"""


@query("token_entropy", oracle=_entropy_oracle())
def token_entropy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the unigram distribution
    (operators/textstats.token_entropy) — the distribution-wide
    complement to the Gopher top-token repetition signals; low entropy
    at normal length flags keyword-stuffed or template documents.

    Scale: entirely map-side (sorted-run lengths inside the scan — no
    token ever crosses an exchange, unlike the explode+groupBy
    formulation whose shuffle is corpus-sized)."""
    from dawis_spark.operators.textstats import token_entropy

    return token_entropy(spark.table("documents"), "doc_id", "text").orderBy(
        "doc_id"
    )


def _cohesion_oracle(k: int, dim: int) -> str:
    cos_final = _VEC.cosine_null("v.vec", "fc.cvec", "duck")
    cos_own = _VEC.cosine_null("a.vec", "c.cvec", "duck")
    return f"""
WITH {_kmeans_c1_ctes(k, dim)},
asg AS (
  SELECT v.vec_id, v.vec,
    (SELECT fc.cid FROM c1 fc
     ORDER BY coalesce(round({cos_final}, 6), -2.0) DESC, fc.cid LIMIT 1) AS cid
  FROM v
),
sc AS (
  SELECT a.cid, coalesce(round({cos_own}, 6), -2.0) AS cosa
  FROM asg a JOIN c1 c ON c.cid = a.cid
)
SELECT cid, COUNT(*) AS n, ROUND(AVG(cosa), 6) AS mean_cos,
       ROUND(SUM(1.0 - cosa), 6) AS cohesion
FROM sc GROUP BY cid ORDER BY cid
"""


@query("kmeans_cohesion", oracle=_cohesion_oracle(8, 64))
def kmeans_cohesion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster cohesion self-eval of the trained k=8 quantizer
    (operators/similarity.kmeans_cohesion): size, mean cosine to own
    centroid, and sum(1 - cos) — the metric that tunes k/iterations for
    the IVF family and semantic_dedup the way ann_recall_* tunes
    n_probe. One map-side pass, k-row output; vectors never shuffle."""
    from dawis_spark.operators.similarity import kmeans_cohesion, train_kmeans

    emb = spark.table("embeddings")
    cents = train_kmeans(emb, "vec_id", "embedding", k=8, iterations=1)
    return kmeans_cohesion(emb, "vec_id", "embedding", cents).orderBy("cid")


_TREND_ORACLE = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', TIMESTAMP '2024-01-01', date_trunc('day', ts)) AS x,
         COUNT(*) AS y
  FROM events GROUP BY 1, 2
),
agg AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM daily GROUP BY event_type
)
SELECT event_type, n AS n_points,
  ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
        / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0.0), 6) AS slope,
  ROUND((CAST(sy AS DOUBLE)
         - (CAST(n * sxy - sx * sy AS DOUBLE)
            / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0.0)) * sx) / n, 6)
    AS intercept,
  ROUND(CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
        / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0.0)
        / NULLIF(CAST(n * syy - sy * sy AS DOUBLE), 0.0), 6) AS r2
FROM agg ORDER BY event_type
"""


@query("trend_slopes", oracle=_TREND_ORACLE)
def trend_slopes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series OLS trend over daily event volumes
    (operators/anomaly.trend_slopes): slope, intercept, and r² of count
    vs day index from the five sufficient statistics — the drift
    detector next to anomaly_mad_daily's jump detector. Integer
    sufficient statistics make the aggregation bit-deterministic; one
    partially-aggregated pass, one row per series."""
    from dawis_spark.operators.anomaly import trend_slopes

    daily = (
        spark.table("events")
        .groupBy(
            "event_type",
            F.datediff(F.date_trunc("day", "ts"), F.lit("2024-01-01")).alias("x"),
        )
        .agg(F.count(F.lit(1)).alias("y"))
    )
    return (
        trend_slopes(daily, ["event_type"], "x", "y")
        .orderBy("event_type")
    )


_SEASONAL_ORACLE = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', TIMESTAMP '2024-01-01', date_trunc('day', ts)) AS bucket,
         COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, bucket, cnt,
         cnt - lag(cnt, 7) OVER (PARTITION BY event_type ORDER BY bucket)
           AS residual
  FROM daily
),
med AS (SELECT event_type, median(residual) AS med FROM r
        WHERE residual IS NOT NULL GROUP BY 1),
dev AS (
  SELECT r.event_type, bucket, cnt, residual,
         residual - m.med AS delta, ABS(residual - m.med) AS adev
  FROM r JOIN med m USING (event_type) WHERE residual IS NOT NULL
),
mad AS (SELECT event_type, median(adev) AS mad FROM dev GROUP BY 1),
sc AS (
  SELECT d.event_type, bucket, cnt, residual,
         ROUND(d.delta / NULLIF(1.4826 * m.mad, 0), 6) AS robust_z
  FROM dev d JOIN mad m USING (event_type)
)
SELECT event_type, bucket, cnt, residual, robust_z,
       COALESCE(ABS(robust_z) > 3.0, FALSE) AS is_anomaly
FROM sc
UNION ALL
SELECT event_type, bucket, cnt, NULL, NULL, FALSE FROM r WHERE residual IS NULL
ORDER BY event_type, bucket
"""


@query("anomaly_seasonal_daily", oracle=_SEASONAL_ORACLE)
def anomaly_seasonal_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive anomaly scoring over daily event volumes
    (operators/anomaly.seasonal_residual_zscores): difference against
    the same weekday one week back, then MAD-score the residuals — the
    weekly-shape-aware sibling of anomaly_mad_daily (a normal Sunday
    stops looking anomalous; a broken Tuesday stops hiding in the
    weekly spread).

    Scale: one lag window + the MAD aggregations, all keyed on the
    series; the fact table is read once into the daily rollup."""
    from dawis_spark.operators.anomaly import seasonal_residual_zscores

    daily = (
        spark.table("events")
        .groupBy(
            "event_type",
            F.datediff(F.date_trunc("day", "ts"), F.lit("2024-01-01")).alias(
                "bucket"
            ),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        seasonal_residual_zscores(
            daily, ["event_type"], "bucket", "cnt", season_lag=7
        )
        .select("event_type", "bucket", "cnt", "residual", "robust_z", "is_anomaly")
        .orderBy("event_type", "bucket")
    )


_IVM_JOIN_ORACLE = """
WITH dim_final AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 5 = 0 THEN 'MOVED2'
              WHEN c_custkey % 7 = 0 THEN 'MOVED1'
              ELSE c_mktsegment END AS c_mktsegment
  FROM customer
)
SELECT o.o_orderkey, d.c_mktsegment, o.o_totalprice
FROM orders o JOIN dim_final d ON o.o_custkey = d.c_custkey
ORDER BY o.o_orderkey
"""


@query("incremental_join_2ticks", oracle=_IVM_JOIN_ORACLE)
def incremental_join_2ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-view maintenance, oracle-proven (operators/ivm.py): the
    orders⋈customer view starts from a third of the facts, then two
    ticks each append a fact slice AND update a customer-segment slice
    (custkey%7 -> MOVED1, then custkey%5 -> MOVED2, overlapping); the
    maintained view must row-hash-match a single-shot join of ALL
    orders against the FINAL dimension. Re-derivation pulls fact
    columns from the view itself — the fact table is never re-joined
    for dimension churn, the delta rule every warehouse's materialized
    denormalization relies on.

    Scale: per tick, one key-pruned pass over the view plus
    deltas-sized joins; nothing history-sized shuffles."""
    from dawis_spark.operators.ivm import maintain_join_view

    cust = spark.table("customer")
    orders = spark.table("orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )

    def dim_state(*moves: tuple[int, str]) -> DataFrame:
        seg = F.col("c_mktsegment")
        for mod, label in moves:  # later moves win: apply in reverse below
            seg = F.when(F.col("c_custkey") % mod == 0, label).otherwise(seg)
        return cust.select("c_custkey", seg.alias("c_mktsegment"))

    dim0 = dim_state()
    dim1 = dim_state((7, "MOVED1"))
    dim2 = dim_state((7, "MOVED1"), (5, "MOVED2"))

    key = ["c_custkey"]
    fact = orders.withColumnRenamed("o_custkey", "c_custkey")
    view = fact.filter("o_orderkey % 3 = 0").join(dim0, key)
    view = maintain_join_view(
        view,
        fact.filter("o_orderkey % 3 = 1"),
        dim1,
        cust.filter("c_custkey % 7 = 0").select(*key),
        key,
        ["c_mktsegment"],
    )
    view = maintain_join_view(
        view,
        fact.filter("o_orderkey % 3 = 2"),
        dim2,
        cust.filter("c_custkey % 5 = 0").select(*key),
        key,
        ["c_mktsegment"],
    )
    return view.select("o_orderkey", "c_mktsegment", "o_totalprice").orderBy(
        "o_orderkey"
    )


_NOT_IN_NULL_ORACLE = """
WITH probe AS (
  SELECT CASE WHEN c_custkey % 50 = 0 THEN NULL ELSE c_custkey END AS k
  FROM customer WHERE c_custkey % 2 = 0
),
clean AS (SELECT k FROM probe WHERE k IS NOT NULL)
SELECT
  (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN (SELECT k FROM probe))
    AS n_not_in_with_null,
  (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN (SELECT k FROM clean))
    AS n_not_in_clean,
  (SELECT COUNT(*) FROM orders o
   WHERE NOT EXISTS (SELECT 1 FROM probe p WHERE p.k = o.o_custkey))
    AS n_not_exists
"""


@query("not_in_null_semantics", oracle=_NOT_IN_NULL_ORACLE)
def not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic parity check: ``NOT IN`` against a subquery
    CONTAINING a NULL must return ZERO rows (x <> NULL is unknown for
    every x — the classic SQL trap), while the NULL-free ``NOT IN`` and
    the ``NOT EXISTS`` rewrite count normally. One row, three counts —
    an engine that silently rewrites NOT IN to an anti join without the
    null guard fails this against any ANSI oracle.

    Scale note: this is exactly why operators/idempotent.py and the DQ
    suite build on left_anti/NOT EXISTS — Spark plans the null-aware
    NOT IN as a BroadcastNestedLoopJoin when the subquery may contain
    NULLs, which is correct and expensive; the null-free forms get the
    cheap anti join."""
    register_testdata(spark, sf_dir)
    return spark.sql(
        """
        WITH probe AS (
          SELECT CASE WHEN c_custkey % 50 = 0 THEN NULL
                      ELSE c_custkey END AS k
          FROM customer WHERE c_custkey % 2 = 0
        ),
        clean AS (SELECT k FROM probe WHERE k IS NOT NULL)
        SELECT
          (SELECT COUNT(*) FROM orders
           WHERE o_custkey NOT IN (SELECT k FROM probe))
            AS n_not_in_with_null,
          (SELECT COUNT(*) FROM orders
           WHERE o_custkey NOT IN (SELECT k FROM clean))
            AS n_not_in_clean,
          (SELECT COUNT(*) FROM orders o
           WHERE NOT EXISTS (SELECT 1 FROM probe p
                             WHERE p.k = o.o_custkey))
            AS n_not_exists
        """
    )


def _mask_spans_oracle(k: int) -> str:
    inner = _dup_spans_oracle(k).strip()
    toks = _TXT.tokens("text", "duck")
    keep = (
        "list_filter(range(0, len(t)), i -> spans IS NULL OR "
        "len(list_filter(spans, s -> i >= s.span_start AND i < s.span_end)) = 0)"
    )
    return f"""
WITH spans_raw AS (SELECT * FROM ({inner})),
sp AS (
  SELECT doc_id,
         list({{'span_start': span_start, 'span_end': span_end}}) AS spans
  FROM spans_raw GROUP BY doc_id
),
tk AS (
  SELECT d.doc_id, {toks} AS t, sp.spans
  FROM documents d LEFT JOIN sp ON d.doc_id = sp.doc_id
),
kept AS (SELECT doc_id, t, {keep} AS keep FROM tk)
SELECT doc_id,
       len(t) AS n_before,
       len(keep) AS n_after,
       COALESCE(
         list_aggregate(list_transform(keep, i -> t[i + 1]), 'string_agg', ' '),
         '') AS clean_text
FROM kept ORDER BY doc_id
"""


@query("dedup_masked_text", oracle=_mask_spans_oracle(8))
def dedup_masked_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span REMOVAL — the second half of Lee et al. 2021
    (operators/dedup.mask_duplicated_spans): every token covered by a
    duplicated 8-gram span is cut from the canonical token stream,
    keeping the unique remainder of each document instead of dropping
    whole near-duplicates.

    Scale: spans collect per doc (merged maximal runs — few per doc),
    the join keys on doc id, and masking is one map-side expression
    over each doc's own token array."""
    from dawis_spark.operators.dedup import duplicated_spans, mask_duplicated_spans

    docs = spark.table("documents")
    spans = duplicated_spans(docs, "doc_id", "text", window_k=8)
    return mask_duplicated_spans(docs, spans, "doc_id", "text").orderBy("doc_id")


# ---------------------------------------------------------------------------
# Driver-check rotation
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Graph-based ANN: cell-partitioned NSW beam search (operators/nsw.py)
# ---------------------------------------------------------------------------


def _nsw_oracle(
    k: int, nq: int, kc: int, n_probe: int, m: int, beam: int, hops: int, dim: int
) -> str:
    """Replay of nsw_ann_topk: quantizer training (shared k-means CTEs),
    within-cell kNN edge build, per-cell entry points, then ``hops``
    unrolled beam iterations — every cosine 6-digit-rounded with
    id-ascending tie-breaks, so both engines walk the identical graph."""
    cos_vc = _VEC.cosine_null("vec", "cvec", "duck")
    cos_ab = _VEC.cosine_null("a.vec", "b.vec", "duck")
    cos_qn = _VEC.cosine_null("q.q_vec", "a.vec", "duck")
    hop_ctes = []
    prev = "f0"
    for t in range(1, hops + 1):
        hop_ctes.append(f"""
e{t} AS (
  SELECT query_id, node_id FROM {prev}
  UNION
  SELECT f.query_id, ed.dst AS node_id
  FROM {prev} f JOIN edges ed ON f.node_id = ed.src
),
s{t} AS (
  SELECT e.query_id, e.node_id,
         coalesce(ROUND({cos_qn}, 6), -2.0) AS cosine
  FROM e{t} e
  JOIN assign a ON e.node_id = a.id
  JOIN qv q ON e.query_id = q.query_id
),
f{t} AS (
  SELECT query_id, node_id, cosine FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, node_id) AS r
    FROM s{t}) WHERE r <= {beam}
)""")
        prev = f"f{t}"
    return f"""
WITH {_kmeans_c1_ctes(kc, dim)},
corpus_aff AS (
  SELECT vec_id AS id, vec, cid,
         coalesce(ROUND({cos_vc}, 6), -2.0) AS aff
  FROM v, (SELECT cid, cvec FROM c1) cent(cid, cvec)
),
assign AS (
  SELECT id, vec, cid, aff FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY aff DESC, cid) AS r
    FROM corpus_aff) WHERE r <= 1
),
knn AS (
  SELECT src, dst FROM (
    SELECT a.id AS src, b.id AS dst,
           row_number() OVER (PARTITION BY a.id
             ORDER BY coalesce(ROUND({cos_ab}, 6), -2.0) DESC, b.id) AS r
    FROM assign a JOIN assign b USING (cid) WHERE a.id != b.id
  ) WHERE r <= {m}
),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM knn UNION ALL SELECT dst AS src, src AS dst FROM knn)
),
entries AS (
  SELECT cid, id AS node_id FROM (
    SELECT cid, id, row_number() OVER (PARTITION BY cid ORDER BY aff DESC, id) AS r
    FROM assign) WHERE r <= 1
),
qv AS (SELECT vec_id AS query_id, vec AS q_vec FROM v WHERE vec_id < {nq}),
q_aff AS (
  SELECT query_id, cid,
         coalesce(ROUND({_VEC.cosine_null("q_vec", "cvec", "duck")}, 6), -2.0) AS aff
  FROM qv, (SELECT cid, cvec FROM c1) cent(cid, cvec)
),
q_b AS (
  SELECT query_id, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY aff DESC, cid) AS r
    FROM q_aff) WHERE r <= {n_probe}
),
f0 AS (SELECT DISTINCT query_id, node_id FROM q_b JOIN entries USING (cid)),
{','.join(hop_ctes)}
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, node_id AS neighbor_id, cosine,
         row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, node_id) AS rank
  FROM f{hops} WHERE query_id != node_id
) WHERE rank <= {k}
ORDER BY query_id, rank
"""


@query("embedding_ann_nsw", oracle=_nsw_oracle(5, 10, 8, 2, 4, 10, 2, 64))
def embedding_ann_nsw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-based ANN (operators/nsw.py): single-layer NSW beam search
    over a cell-partitioned kNN graph, entry points from the trained IVF
    quantizer — the graph-index family (HNSW's) re-expressed so that
    construction shards per cell and search unrolls deterministically.

    Scale: graph build is cell-scoped self-joins (bounded blocks, never
    corpus all-pairs); search exchanges carry id/score triples with
    candidate hydration bounded by beam x degree per query per hop. The
    hierarchy HNSW uses to find entry points is replaced by the coarse
    quantizer the engine already trains and replays."""
    from dawis_spark.operators.nsw import nsw_ann_topk

    emb = spark.table("embeddings")
    return nsw_ann_topk(
        corpus=emb,
        queries=emb.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        n_centroids=8,
        n_probe=2,
        m=4,
        beam=10,
        hops=2,
    ).orderBy("query_id", "rank")


def _ann_recall_nsw_oracle(k: int) -> str:
    exact = _embedding_topk_oracle(k, 10).strip()
    nsw = _nsw_oracle(k, 10, 8, 2, 4, 10, 2, 64).strip()
    return f"""
WITH exact_r AS (SELECT * FROM ({exact})),
nsw_r AS (SELECT * FROM ({nsw}))
SELECT e.query_id,
  ROUND(CAST(COUNT(r.neighbor_id) AS DOUBLE) / {k}, 6) AS recall_nsw
FROM exact_r e
LEFT JOIN nsw_r r
  ON e.query_id = r.query_id AND e.neighbor_id = r.neighbor_id
GROUP BY e.query_id ORDER BY e.query_id
"""


@query("ann_recall_nsw", oracle=_ann_recall_nsw_oracle(5))
def ann_recall_nsw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the NSW beam search against exact brute force, per
    query — the same self-eval discipline as every other ANN family
    (one shared quantizer training feeds the approximate side)."""
    from dawis_spark.operators.nsw import nsw_ann_topk
    from dawis_spark.operators.similarity import brute_force_topk, train_kmeans

    emb = spark.table("embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    cents = train_kmeans(emb, "vec_id", "embedding", k=8, iterations=1)
    exact = brute_force_topk(
        corpus=emb, queries=qs, id_col="vec_id", vec_col="embedding", k=5
    ).select("query_id", "neighbor_id")
    approx = nsw_ann_topk(
        emb, qs, "vec_id", "embedding",
        k=5, n_probe=2, m=4, beam=10, hops=2, centroids=cents,
    ).select(F.col("query_id").alias("a_qid"), F.col("neighbor_id").alias("a_nid"))
    joined = exact.join(
        approx,
        (exact["query_id"] == approx["a_qid"])
        & (exact["neighbor_id"] == approx["a_nid"]),
        "left",
    )
    return (
        joined.groupBy("query_id")
        .agg(
            F.round(F.count("a_nid").cast("double") / 5, 6).alias("recall_nsw"),
        )
        .orderBy("query_id")
    )



# ---------------------------------------------------------------------------
# CCNet perplexity quality filter (operators/lm.py)
# ---------------------------------------------------------------------------


def _perplexity_oracle(train_source: str, tlo: int, thi: int) -> str:
    th = _TXT.token_hash_array("text", "duck")
    mod = _TXT.MOD
    pair = (
        f"list_transform(range(1, len(th)), "
        f"p -> th[p] * {mod} + th[p + 1])"
    )
    return f"""
WITH tr AS (SELECT {th} AS th FROM documents WHERE source = '{train_source}'),
tpairs AS (SELECT unnest({pair}) AS bk FROM tr),
bic AS (SELECT bk, COUNT(*) AS c12 FROM tpairs GROUP BY bk),
follow AS (SELECT bk // {mod} AS h1, COUNT(*) AS c1 FROM tpairs GROUP BY 1),
vocab AS (SELECT COUNT(DISTINCT h) AS v FROM (SELECT unnest(th) AS h FROM tr)),
dp AS (
  SELECT id, unnest({pair}) AS bk
  FROM (SELECT doc_id AS id, {th} AS th FROM documents)
),
lp AS (
  SELECT id,
         CAST(round(round(ln((coalesce(c12, 0) + 1.0)
                            / (coalesce(c1, 0) + v)), 6) * 1000000)
              AS BIGINT) AS lp
  FROM dp
  LEFT JOIN bic USING (bk)
  LEFT JOIN follow ON dp.bk // {mod} = follow.h1
  CROSS JOIN vocab
),
scored AS (
  SELECT id, COUNT(*) AS n_trans,
         (-CAST(SUM(lp) AS BIGINT)) // COUNT(*) AS nll_micro
  FROM lp GROUP BY id
),
nq AS (SELECT COUNT(*) AS n FROM scored),
thr AS (
  SELECT pct, val FROM (
    SELECT p.pct, s.nll_micro AS val,
           row_number() OVER (PARTITION BY p.pct ORDER BY s.nll_micro) AS rn,
           (p.pct * (nq.n - 1)) // 100 + 1 AS t
    FROM scored s, (VALUES ({tlo}), ({thi})) p(pct), nq
  ) WHERE rn = t
),
cuts AS (
  SELECT max(CASE WHEN pct = {tlo} THEN val END) AS t_lo,
         max(CASE WHEN pct = {thi} THEN val END) AS t_hi
  FROM thr
)
SELECT d.doc_id AS id, coalesce(s.n_trans, 0) AS n_trans, s.nll_micro,
       round(exp(CAST(s.nll_micro AS DOUBLE) / 1000000.0), 4) AS ppl,
       CASE WHEN s.id IS NULL THEN 'na'
            WHEN s.nll_micro <= c.t_lo THEN 'head'
            WHEN s.nll_micro <= c.t_hi THEN 'middle'
            ELSE 'tail' END AS band
FROM documents d
LEFT JOIN scored s ON d.doc_id = s.id
CROSS JOIN cuts c
ORDER BY id
"""


@query("perplexity_quality_bands", oracle=_perplexity_oracle("src0", 33, 67))
def perplexity_quality_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet perplexity filtering (operators/lm.py; Wenzek et al. 2020):
    train a smoothed bigram LM on the trusted slice (source src0 — the
    Wikipedia stand-in), score every document's per-token NLL against
    it, and band the corpus head/middle/tail by NLL terciles — the
    model-based quality gate that complements the rule-based C4/Gopher
    filters and DSIR's importance weights.

    Scale: LM training is two map-side-partial counting aggregations
    (vocabulary-sized exchanges); scoring joins int64 composite bigram
    keys (token strings never leave the scan); per-doc NLL accumulates
    in exact integer micro-nats (partition-order invariant — what lets
    DuckDB replay it); tercile cuts come from the distributed-selection
    quantiles, so there is no global sort anywhere."""
    from dawis_spark.operators.lm import perplexity_bands

    return (
        perplexity_bands(
            spark.table("documents"),
            "doc_id",
            "text",
            "source = 'src0'",
            pcts=(33, 67),
        )
        .orderBy("id")
    )



# ---------------------------------------------------------------------------
# Binary-quantization ANN (operators/bq.py)
# ---------------------------------------------------------------------------


def _bq_oracle(k: int, rf: int, nq: int, dim: int) -> str:
    from dawis_spark.operators.bq import bq_code_expr, bq_hamming_expr

    code = bq_code_expr("vec", dim, "duck")
    ham = bq_hamming_expr("q.q_codes", "c.codes", dim, "duck")
    cos = _VEC.cosine("qv.vec", "cv.vec", "duck")
    return f"""
WITH v AS (SELECT vec_id, embedding AS vec FROM embeddings),
codes AS (SELECT vec_id AS id, {code} AS codes FROM v),
qc AS (SELECT id AS query_id, codes AS q_codes FROM codes WHERE id < {nq}),
scored AS (
  SELECT q.query_id, c.id AS neighbor_id, {ham} AS hamming
  FROM qc q CROSS JOIN codes c WHERE q.query_id != c.id
),
pool AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY hamming, neighbor_id) AS r
    FROM scored) WHERE r <= {k * rf}
),
rer AS (
  SELECT p.query_id, p.neighbor_id, ROUND({cos}, 6) AS cosine
  FROM pool p
  JOIN v cv ON p.neighbor_id = cv.vec_id
  JOIN v qv ON p.query_id = qv.vec_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM rer) WHERE rank <= {k}
ORDER BY query_id, rank
"""


@query("embedding_ann_bq", oracle=_bq_oracle(5, 8, 10, 64))
def embedding_ann_bq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantization ANN (operators/bq.py): 1-bit sign codes
    (32x compression), Hamming-distance candidate pool via XOR+popcount
    integer codegen, exact cosine re-rank of the pool — the BQ+rescore
    recipe production vector stores ship, completing the quantization
    ladder (PQ / SQ8 / BQ) with its cheapest rung.

    Scale: the candidate stage projects codes only (2 int64 words per
    vector here; 32 words for a 1024-dim production embedding) — the
    corpus-side scan carries no raw vectors; queries broadcast; the
    refine stage hydrates pool members only.

    Honesty note on parameters: 64 dims is BQ's worst case (64 sign
    bits carry far less angular information than the >=256-dim
    embeddings BQ ships against in production), so this query oversizes
    the rescore pool (refine_factor=8 vs the 3-5 production default) and
    still reports mid-range recall in ann_recall_bq — the dial, and its
    price, are what the self-eval exists to show."""
    from dawis_spark.operators.bq import bq_topk

    emb = spark.table("embeddings")
    return bq_topk(
        corpus=emb,
        queries=emb.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        refine_factor=8,
        dim=64,
    ).orderBy("query_id", "rank")


def _ann_recall_bq_oracle(k: int) -> str:
    exact = _embedding_topk_oracle(k, 10).strip()
    bq = _bq_oracle(k, 8, 10, 64).strip()
    return f"""
WITH exact_r AS (SELECT * FROM ({exact})),
bq_r AS (SELECT * FROM ({bq}))
SELECT e.query_id,
  ROUND(CAST(COUNT(r.neighbor_id) AS DOUBLE) / {k}, 6) AS recall_bq
FROM exact_r e
LEFT JOIN bq_r r
  ON e.query_id = r.query_id AND e.neighbor_id = r.neighbor_id
GROUP BY e.query_id ORDER BY e.query_id
"""


@query("ann_recall_bq", oracle=_ann_recall_bq_oracle(5))
def ann_recall_bq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of BQ+rescore against exact brute force, per query —
    prices the 32x compression in recall, the same self-eval discipline
    as every other ANN family."""
    from dawis_spark.operators.bq import bq_topk
    from dawis_spark.operators.similarity import brute_force_topk

    emb = spark.table("embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(
        corpus=emb, queries=qs, id_col="vec_id", vec_col="embedding", k=5
    ).select("query_id", "neighbor_id")
    approx = bq_topk(
        emb, qs, "vec_id", "embedding", k=5, refine_factor=8, dim=64
    ).select(F.col("query_id").alias("a_qid"), F.col("neighbor_id").alias("a_nid"))
    joined = exact.join(
        approx,
        (exact["query_id"] == approx["a_qid"])
        & (exact["neighbor_id"] == approx["a_nid"]),
        "left",
    )
    return (
        joined.groupBy("query_id")
        .agg(F.round(F.count("a_nid").cast("double") / 5, 6).alias("recall_bq"))
        .orderBy("query_id")
    )



# ---------------------------------------------------------------------------
# Distributed BPE tokenizer training (operators/bpe.py)
# ---------------------------------------------------------------------------


def _bpe_chain_ctes(n_merges: int) -> str:
    """Shared CTE chain replaying bpe_train: word-type counts, then
    ``n_merges`` unrolled rounds of pair-count -> lexicographic-tie
    argmax -> greedy merge via the spaced-string replace (the same
    built-in replace semantics, verified identical across engines).
    Defines wt, w0..w{n}, p1..p{n}, b1..b{n}. All rounds MATERIALIZED:
    inlining the multiply-referenced CTEs re-evaluates the chain
    exponentially (the round-8 hang)."""
    toks = _TXT.tokens("text", "duck")
    init = (
        "concat(' ', array_to_string(list_append("
        "list_transform(range(1, length(word) + 1), "
        "j -> substr(word, j, 1)), '</w>'), '  '), ' ')"
    )
    rounds = []
    for t in range(1, n_merges + 1):
        rounds.append(f"""
p{t} AS MATERIALIZED (
  SELECT sy[i] AS p1, sy[i + 1] AS p2, CAST(SUM(cnt) AS BIGINT) AS pair_count
  FROM (SELECT cnt, string_split(trim(s), '  ') AS sy FROM w{t - 1}),
       unnest(range(1, len(sy))) AS u(i)
  GROUP BY 1, 2
),
b{t} AS MATERIALIZED (SELECT p1, p2, pair_count FROM p{t}
         ORDER BY pair_count DESC, p1, p2 LIMIT 1),
w{t} AS MATERIALIZED (
  SELECT cnt, replace(s, ' ' || b.p1 || '  ' || b.p2 || ' ',
                         ' ' || b.p1 || b.p2 || ' ') AS s
  FROM w{t - 1}, b{t} b
)""")
    return f"""wt AS (
  SELECT word, COUNT(*) AS cnt
  FROM (SELECT unnest({toks}) AS word FROM documents) GROUP BY word
),
w0 AS MATERIALIZED (SELECT cnt, {init} AS s FROM wt),
{','.join(rounds)}"""


def _bpe_oracle(n_merges: int) -> str:
    finals = "\nUNION ALL ".join(
        f"SELECT {t} AS step, p1 AS \"left\", p2 AS \"right\", pair_count FROM b{t}"
        for t in range(1, n_merges + 1)
    )
    return f"""
WITH {_bpe_chain_ctes(n_merges)}
SELECT step, "left", "right", pair_count FROM (
{finals}
) ORDER BY step
"""


def _bpe_segment_oracle(n_merges: int) -> str:
    """Replay of train + APPLY: per-document word stream re-segmented by
    the learned merges (each round's argmax joined in as a 1-row
    relation feeding the same spaced-string replace)."""
    toks = _TXT.tokens("text", "duck")
    init = (
        "concat(' ', array_to_string(list_append("
        "list_transform(range(1, length(word) + 1), "
        "j -> substr(word, j, 1)), '</w>'), '  '), ' ')"
    )
    segs = []
    for t in range(1, n_merges + 1):
        segs.append(f"""
seg{t} AS MATERIALIZED (
  SELECT id, replace(s, ' ' || b.p1 || '  ' || b.p2 || ' ',
                        ' ' || b.p1 || b.p2 || ' ') AS s
  FROM seg{t - 1}, b{t} b
)""")
    return f"""
WITH {_bpe_chain_ctes(n_merges)},
seg0 AS (
  SELECT id, {init} AS s
  FROM (SELECT doc_id AS id, unnest({toks}) AS word FROM documents)
),
{','.join(segs)}
SELECT id, COUNT(*) AS n_tokens,
       CAST(SUM(len(string_split(trim(s), '  '))) AS BIGINT) AS n_subwords
FROM seg{n_merges} GROUP BY id ORDER BY id
"""


@query("bpe_learned_merges", oracle=_bpe_oracle(8))
def bpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (operators/bpe.py; Sennrich et
    al. 2016): learn the first 8 merge rules over the document corpus —
    the tokenizer-construction step upstream of every token-counting /
    chunking operator in the pipeline.

    Scale: the corpus collapses to the word-type relation first
    (vocabulary-sized by Zipf — why the reference implementation trains
    on word counts too); each round's pair-count exchange is vocabulary-
    sized, the argmax broadcasts one row, and the merge applies as a
    codegen'd replace over the spaced symbol string (no UDF anywhere).
    Ties break to the lexicographically smallest pair, making the whole
    training trajectory engine-replayable."""
    from dawis_spark.operators.bpe import bpe_train

    return bpe_train(spark.table("documents"), "text", n_merges=8)


@query("bpe_segmented_corpus", oracle=_bpe_segment_oracle(8))
def bpe_segmented_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-apply: segment every document with the 8 learned BPE
    merges and report per-doc token vs subword counts — the end-to-end
    tokenizer loop (learn merges.txt, then tokenize the corpus with it),
    the shape every pretraining pipeline runs before packing.

    Scale: training as in bpe_learned_merges; application is pure
    map-side (the merge table rides the plan as literals — a shipped
    tokenizer's merges.txt), one codegen replace per merge inside the
    document scan, then a per-doc count aggregation."""
    from dawis_spark.operators.bpe import bpe_segment, bpe_train

    docs = spark.table("documents")
    merges = [
        (r["left"], r["right"])
        for r in bpe_train(docs, "text", n_merges=8).collect()
    ]
    return bpe_segment(docs, "doc_id", "text", merges).orderBy("id")



# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion (operators/fusion.py)
# ---------------------------------------------------------------------------


def _hybrid_rrf_oracle(depth: int, k_rrf: int, top_n: int) -> str:
    toks = _TXT.tokens("text", "duck")
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    cos = _VEC.cosine("q.vec", "c.vec", "duck")
    return f"""
WITH base AS (SELECT doc_id, {toks} AS __toks FROM documents),
dl AS (SELECT doc_id, CAST(len(__toks) AS DOUBLE) AS dl FROM base),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl),
tk AS (SELECT doc_id, unnest(__toks) AS token FROM base),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf FROM tk
  WHERE token IN ({terms}) GROUP BY doc_id, token
),
dfq AS (SELECT token, CAST(count(*) AS DOUBLE) AS df_t FROM tf GROUP BY token),
bscored AS (
  SELECT tf.doc_id,
         ln(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
           * (tf * (1.2 + 1))
           / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl)) AS contrib
  FROM tf JOIN dfq USING (token) JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
),
bagg AS (
  SELECT doc_id, ROUND(SUM(contrib), 6) AS bm25
  FROM bscored GROUP BY doc_id
),
sparse AS (
  SELECT doc_id AS id, CAST(r AS INT) AS sparse_rank FROM (
    SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
    FROM bagg) WHERE r <= {depth}
),
v AS (SELECT vec_id, embedding AS vec FROM embeddings),
dense AS (
  SELECT id, CAST(r AS INT) AS dense_rank FROM (
    SELECT c.vec_id AS id,
           row_number() OVER (
             ORDER BY ROUND({cos}, 6) DESC, c.vec_id) AS r
    FROM (SELECT vec FROM v WHERE vec_id = 0) q
    CROSS JOIN (SELECT vec_id, vec FROM v WHERE vec_id != 0) c
  ) WHERE r <= {depth}
)
SELECT id, round(coalesce(1.0 / ({k_rrf} + sparse_rank), 0.0)
              + coalesce(1.0 / ({k_rrf} + dense_rank), 0.0), 6) AS rrf_score,
       sparse_rank, dense_rank
FROM sparse FULL OUTER JOIN dense USING (id)
ORDER BY rrf_score DESC, id LIMIT {top_n}
"""


@query("hybrid_search_rrf", oracle=_hybrid_rrf_oracle(20, 60, 10))
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 sparse top-20 fused with dense cosine
    top-20 by reciprocal-rank fusion (operators/fusion.py; Cormack et
    al. 2009) — the production hybrid-search recipe. The query pair here
    is synthetic (the fixed BM25 bag + vector 0's embedding); the fused
    operator, its rank-only determinism, and the full-outer top-k plan
    are the point.

    Scale: both retrieval legs are existing corpus-scale operators; the
    fusion joins two top-N relations (config-sized) and takes one
    ordered head — free next to the legs."""
    from pyspark.sql import Window

    from dawis_spark.operators.corpus import bm25_scores
    from dawis_spark.operators.fusion import rrf_fuse
    from dawis_spark.operators.similarity import brute_force_topk

    docs = spark.table("documents")
    emb = spark.table("embeddings")
    sparse = (
        bm25_scores(docs, "doc_id", "text", list(_BM25_TERMS), top_n=20)
        .select(
            F.col("doc_id").alias("id"),
            F.row_number()
            .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
            .cast("int")
            .alias("sparse_rank"),
        )
    )
    dense = brute_force_topk(
        corpus=emb,
        queries=emb.filter(F.col("vec_id") == 0),
        id_col="vec_id",
        vec_col="embedding",
        k=20,
    ).select(
        F.col("neighbor_id").alias("id"),
        F.col("rank").cast("int").alias("dense_rank"),
    )
    return rrf_fuse(
        sparse, dense, "sparse_rank", "dense_rank", k=60, top_n=10
    ).orderBy(F.desc("rrf_score"), "id")



# ---------------------------------------------------------------------------
# Logistic-regression training + AUC eval (operators/logreg.py)
# ---------------------------------------------------------------------------

_LOGREG_Y_SPARK = (
    "case when label < 5 then cast(1.0 as double) else cast(0.0 as double) end"
)

# Training-sample cap for the logreg quality-classifier family (the
# train_kmeans sample discipline): train on the _LOGREG_SAMPLE_LIMIT
# lowest-vec_id embeddings, score the full corpus distributed. 4096 is
# generous for a 65-parameter linear model; it is a no-op at sf0.01/0.1
# (500/2000 rows) and binds at sf1+ (20000+), which is the point — at
# 100 TB training cost is constant while scoring stays one scan.
_LOGREG_SAMPLE_LIMIT = 4096

# One trained weight vector shared by the five classifier queries
# (logreg_weights, classifier_auc_eval, classifier_calibration_curve,
# ece_classifier_calibration, gains_lift_deciles) — keyed on the data
# directory + hyperparameters, NOT the session: testdata at a given
# sf_dir is immutable, and the weights are plain floats.
_LOGREG_W_CACHE: dict[tuple, list[float]] = {}


def _trained_logreg_w(
    spark: SparkSession, sf_dir: str, dim: int = 64, iters: int = 3, lr: float = 1.0
) -> list[float]:
    from dawis_spark.operators.logreg import logreg_train

    key = (sf_dir, dim, iters, lr, _LOGREG_SAMPLE_LIMIT)
    if key not in _LOGREG_W_CACHE:
        _LOGREG_W_CACHE[key] = logreg_train(
            spark.table("embeddings"),
            "embedding",
            _LOGREG_Y_SPARK,
            dim=dim,
            iterations=iters,
            lr=lr,
            id_col="vec_id",
            sample_limit=_LOGREG_SAMPLE_LIMIT,
        )
    return _LOGREG_W_CACHE[key]


_PLATT_ITERS = 3
_PLATT_LR = 0.5
_PLATT_CACHE: dict[tuple, tuple[float, float]] = {}


def _trained_platt_ab(spark: SparkSession, sf_dir: str) -> tuple[float, float]:
    """Platt (a, b) fitted on the SAME bounded lowest-vec_id sample the
    logreg family trains on, against the shared trained margins —
    memoized per data directory like _trained_logreg_w."""
    from dawis_spark.operators.logreg import margin_expr, platt_fit

    key = (sf_dir, _PLATT_ITERS, _PLATT_LR, _LOGREG_SAMPLE_LIMIT)
    if key not in _PLATT_CACHE:
        w = _trained_logreg_w(spark, sf_dir)
        rows = (
            spark.table("embeddings")
            .select(
                F.col("vec_id"),
                F.expr(margin_expr("embedding", w)).alias("m"),
                F.expr(f"cast({_LOGREG_Y_SPARK} as double)").alias("y"),
            )
            .orderBy("vec_id")
            .limit(_LOGREG_SAMPLE_LIMIT)
            .collect()
        )
        _PLATT_CACHE[key] = platt_fit(
            [r["m"] for r in rows],
            [r["y"] for r in rows],
            iterations=_PLATT_ITERS,
            lr=_PLATT_LR,
        )
    return _PLATT_CACHE[key]


def _platt_chain_ctes(iters: int, lr: float) -> str:
    """CTE chain replaying platt_fit over ``mt`` (the sampled round-6
    margins): per round a round-6 affine margin, round-6 residual,
    integer-micro gradient pair, round-6 (a, b) update. Ends at
    p{iters}(a, b). Requires the logreg chain's ``nn`` CTE."""
    rounds = []
    for t in range(1, iters + 1):
        rounds.append(f"""
pg{t} AS MATERIALIZED (
  SELECT CAST(SUM(CAST(round(r * m * 1000000) AS BIGINT)) AS BIGINT) AS ga,
         CAST(SUM(CAST(round(r * 1000000) AS BIGINT)) AS BIGINT) AS gb
  FROM (SELECT mt.m,
               round(1.0 / (1.0 + exp(-(round(p.a * mt.m + p.b, 6)))) - mt.y,
                     6) AS r
        FROM mt, p{t - 1} p)),
p{t} AS (
  SELECT round(p.a - {lr} * (g.ga / 1000000.0) / nn.n, 6) AS a,
         round(p.b - {lr} * (g.gb / 1000000.0) / nn.n, 6) AS b
  FROM p{t - 1} p, pg{t} g, nn)""")
    return (
        "p0 AS (SELECT CAST(1.0 AS DOUBLE) AS a, CAST(0.0 AS DOUBLE) AS b),"
        + ",".join(rounds)
    )


def _logreg_chain_ctes(dim: int, iters: int, lr: float, sample_limit: int) -> str:
    """CTE chain replaying logreg_train: zero-init weights, per round a
    round-6 margin fold, round-6 residual, integer-micro gradient sums,
    and a round-6 HALF_UP weight update. Ends at w{iters}(dim, weight).
    All MATERIALIZED (multiply-referenced CTEs inline exponentially).

    ``v`` is the FULL corpus (downstream scoring CTEs read it); training
    rounds read ``vt``, the ``sample_limit`` lowest-vec_id prefix — the
    exact sample logreg_train(sample_limit=...) collects."""
    d1 = dim + 1
    dot = _VEC.dot("xs", "wl", "duck")
    rounds = []
    for t in range(1, iters + 1):
        rounds.append(f"""
wl{t - 1} AS (SELECT list(weight ORDER BY dim) AS wl FROM w{t - 1}),
sc{t} AS MATERIALIZED (
  SELECT vec_id, xs,
         round(1.0 / (1.0 + exp(-(round({dot}, 6)))) - y, 6) AS r
  FROM vt, wl{t - 1}
),
g{t} AS MATERIALIZED (
  SELECT u.pos - 1 AS dim,
         CAST(SUM(CAST(round(r * xs[u.pos] * 1000000) AS BIGINT)) AS BIGINT) AS g
  FROM sc{t}, unnest(range(1, {d1 + 1})) u(pos) GROUP BY 1
),
w{t} AS MATERIALIZED (
  SELECT w.dim, round(w.weight - {lr} * (g.g / 1000000.0) / nn.n, 6) AS weight
  FROM w{t - 1} w JOIN g{t} g USING (dim), nn
)""")
    return f"""v AS MATERIALIZED (
  SELECT vec_id,
         list_append(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                     CAST(1.0 AS DOUBLE)) AS xs,
         CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS y
  FROM embeddings
),
vt AS MATERIALIZED (
  SELECT * FROM v ORDER BY vec_id LIMIT {sample_limit}
),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM vt),
w0 AS MATERIALIZED (
  SELECT u.d - 1 AS dim, CAST(0.0 AS DOUBLE) AS weight
  FROM unnest(range(1, {d1 + 1})) u(d)
),
{','.join(rounds)}"""


def _logreg_weights_oracle(dim: int, iters: int, lr: float) -> str:
    return f"""
WITH {_logreg_chain_ctes(dim, iters, lr, _LOGREG_SAMPLE_LIMIT)}
SELECT dim, weight FROM w{iters} ORDER BY dim
"""


def _logreg_auc_oracle(dim: int, iters: int, lr: float) -> str:
    dot = _VEC.dot("xs", "wl", "duck")
    return f"""
WITH {_logreg_chain_ctes(dim, iters, lr, _LOGREG_SAMPLE_LIMIT)},
wlF AS (SELECT list(weight ORDER BY dim) AS wl FROM w{iters}),
scF AS MATERIALIZED (
  SELECT CAST(v.y AS INT) AS y, round({dot}, 6) AS s FROM v, wlF
),
rk AS MATERIALIZED (
  SELECT y, s, row_number() OVER (ORDER BY s) AS rn FROM scF
),
mr AS (SELECT s, min(rn) + max(rn) AS mr2 FROM rk GROUP BY s)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(y) AS BIGINT) AS n_pos,
       round((CAST(SUM(CASE WHEN y = 1 THEN mr2 ELSE 0 END) AS DOUBLE)
              - CAST(SUM(y) AS DOUBLE) * (CAST(SUM(y) AS DOUBLE) + 1))
             / (2.0 * CAST(SUM(y) AS DOUBLE)
                * CAST(COUNT(*) - SUM(y) AS DOUBLE)), 6) AS auc,
       round(CAST(SUM(CASE WHEN (s > 0) = (y = 1) THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS accuracy
FROM rk JOIN mr USING (s)
"""


@query("logreg_weights", oracle=_logreg_weights_oracle(64, 3, 1.0))
def logreg_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic-regression training (operators/logreg.py):
    3 rounds of full-batch GD on the labeled embeddings (y = label < 5),
    returning the learned 65-weight vector (bias last) — the training
    half of the fasttext-style quality gate whose inference plan
    quality_classifier_scores already ships.

    Scale: training runs driver-side on the _LOGREG_SAMPLE_LIMIT
    lowest-vec_id examples (one bounded TakeOrdered collect — the
    train_kmeans sample discipline), so cost is CONSTANT in corpus
    size; the trained vector is memoized and shared by the whole
    classifier family (_trained_logreg_w). The integer-micro gradient
    discipline makes the numpy trajectory bit-equal to the distributed
    full-batch path on the same rows, which is what lets DuckDB replay
    all 3 rounds (vt CTE = the same id-ordered prefix)."""
    w = _trained_logreg_w(spark, sf_dir)
    return spark.createDataFrame(
        [(j, wj) for j, wj in enumerate(w)], "dim int, weight double"
    ).orderBy("dim")


@query("classifier_auc_eval", oracle=_logreg_auc_oracle(64, 3, 1.0))
def classifier_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-eval for logreg_weights: exact tie-aware ROC AUC (midrank
    rank-sum form — integers until the final division) and accuracy at
    threshold 0 for the trained model on the FULL corpus (training
    itself sees only the bounded lowest-id sample). The eval discipline
    every trained component here carries (ann_recall_*,
    quantiles_error_eval) applied to the classifier."""
    from dawis_spark.operators.logreg import auc_accuracy

    emb = spark.table("embeddings")
    w = _trained_logreg_w(spark, sf_dir)
    return auc_accuracy(emb, "embedding", _LOGREG_Y_SPARK, w)


_LP_SEED_MAX = 200  # labeled seed = vec_id < 200; propagation targets = the rest
_LP_K = 5


def _labelprop_oracle(seed_max: int, k: int) -> str:
    cos = _VEC.cosine("t_vec", "s_vec", "duck")
    return f"""
WITH s AS (SELECT vec_id AS sid, label AS lbl, embedding AS s_vec
           FROM embeddings WHERE vec_id < {seed_max}),
t AS (SELECT vec_id AS target_id, embedding AS t_vec
      FROM embeddings WHERE vec_id >= {seed_max}),
scored AS (SELECT target_id, sid, lbl, ROUND({cos}, 6) AS c FROM t, s),
topk AS (SELECT * FROM (
  SELECT *, row_number() OVER (PARTITION BY target_id ORDER BY c DESC, sid) AS rnk
  FROM scored) WHERE rnk <= {k}),
votes AS (
  SELECT target_id, lbl,
         CAST(COUNT(*) AS BIGINT) AS votes,
         CAST(SUM(CAST(ROUND(c * 1000000, 0) AS BIGINT)) AS BIGINT) AS score_micro
  FROM topk GROUP BY target_id, lbl),
best AS (SELECT * FROM (
  SELECT *, row_number() OVER (
    PARTITION BY target_id ORDER BY votes DESC, score_micro DESC, lbl) AS r
  FROM votes) WHERE r = 1)
SELECT target_id, lbl AS predicted_label, votes, score_micro
FROM best ORDER BY target_id
"""


def _labelprop_predictions(spark: SparkSession):
    from dawis_spark.operators.labelprop import collect_seed, knn_label_propagation

    emb = spark.table("embeddings")
    seed_rows = collect_seed(
        emb.filter(F.col("vec_id") < _LP_SEED_MAX), "vec_id", "embedding", "label"
    )
    targets = emb.filter(F.col("vec_id") >= _LP_SEED_MAX)
    return seed_rows, knn_label_propagation(
        targets, seed_rows, "vec_id", "embedding", k=_LP_K
    )


@query("knn_label_propagation", oracle=_labelprop_oracle(_LP_SEED_MAX, _LP_K))
def knn_label_propagation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised labeling: each unlabeled document takes the majority
    label of its k=5 nearest LABELED seed vectors by cosine (the
    FineWeb-Edu / quality-classifier pipeline shape). The seed rides into
    the corpus scan as a literal — per-row top-k and the vote argmax are
    array expressions inside the projection, so the corpus is never
    shuffled or joined (zero exchanges; plan-pinned). Vote weights sum
    6-digit cosines in integer micro-units: addition-order invariant,
    which is what lets DuckDB replay the election exactly."""
    _, preds = _labelprop_predictions(spark)
    return preds.orderBy("target_id")


def _labelprop_eval_oracle(seed_max: int, k: int) -> str:
    base = _labelprop_oracle(seed_max, k).strip().rstrip()
    # reuse the propagation CTE verbatim; wrap with the truth join
    return f"""
WITH preds AS ({base}),
truth AS (SELECT vec_id AS target_id, label AS true_label
          FROM embeddings WHERE vec_id >= {seed_max}),
seed_mode AS (SELECT label AS m_lbl FROM (
  SELECT label, COUNT(*) AS n FROM embeddings WHERE vec_id < {seed_max}
  GROUP BY label ORDER BY n DESC, label LIMIT 1))
SELECT CAST(COUNT(*) AS BIGINT) AS n_eval,
       CAST(SUM(CASE WHEN p.predicted_label = t.true_label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       ROUND(CAST(SUM(CASE WHEN p.predicted_label = t.true_label THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 4) AS accuracy,
       ROUND(CAST(SUM(CASE WHEN t.true_label = (SELECT m_lbl FROM seed_mode) THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 4) AS baseline_accuracy
FROM preds p JOIN truth t USING (target_id)
"""


@query(
    "label_propagation_accuracy",
    oracle=_labelprop_eval_oracle(_LP_SEED_MAX, _LP_K),
)
def label_propagation_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-eval for knn_label_propagation: holdout accuracy of the
    propagated labels against the withheld true labels, beside the
    majority-class baseline the propagation must beat (the standing
    discipline: every trained/approximate component ships with the
    query that measures it).

    On THIS synthetic testdata the eval honestly reads ~chance (0.10 vs
    0.083 baseline; the binary label<5 variant probes at ~0.50): the
    labels are not locally clustered in the embedding space — the
    linear probe (classifier_auc_eval, AUC 0.70) finds a global
    direction that 200-seed kNN neighborhoods cannot see. That is the
    self-eval doing its job: it would flag exactly this before anyone
    shipped propagated labels from an unsuitable embedding."""
    from collections import Counter

    from dawis_spark.operators.labelprop import propagation_accuracy

    seed_rows, preds = _labelprop_predictions(spark)
    counts = Counter(l for _, l, _ in seed_rows)
    baseline = min(
        counts, key=lambda l: (-counts[l], l)
    )  # majority, ties -> lowest label (matches the oracle's ORDER BY)
    truth = spark.table("embeddings").filter(F.col("vec_id") >= _LP_SEED_MAX)
    return propagation_accuracy(preds, truth, "vec_id", "label", baseline)


_MMR_NQ, _MMR_POOL, _MMR_K = 5, 20, 5


def _mmr_base_ctes(n_queries: int, n_pool: int) -> str:
    cos = _VEC.cosine("q_vec", "c_vec", "duck")
    cos_ab = _VEC.cosine("a.vec", "b.vec", "duck")
    return f"""
q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < {n_queries}),
c AS (SELECT vec_id AS did, embedding AS c_vec FROM embeddings),
scored AS (SELECT query_id, did, ROUND({cos}, 6) AS cosine FROM q, c WHERE query_id != did),
ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, did) AS rnk FROM scored),
pool AS (SELECT query_id, did, rnk, CAST(ROUND(cosine * 1000000, 0) AS BIGINT) AS rel_micro
         FROM ranked WHERE rnk <= {n_pool}),
pv AS (SELECT p.query_id, p.did, c.c_vec AS vec FROM pool p JOIN c ON p.did = c.did),
pp0 AS (SELECT a.query_id, a.did AS a, b.did AS b,
               CAST(ROUND(ROUND({cos_ab}, 6) * 1000000, 0) AS BIGINT) AS sim_micro
        FROM pv a JOIN pv b ON a.query_id = b.query_id AND a.did < b.did),
pp AS (SELECT query_id, a, b, sim_micro FROM pp0
       UNION ALL SELECT query_id, b, a, sim_micro FROM pp0)"""


def _mmr_step_ctes(k: int) -> str:
    """Unrolled integer greedy: k (cand, pick, sel) CTE triples — the
    same eager-trajectory replay discipline as the kmeans/BPE oracles."""
    parts = [
        "sel0(query_id, did) AS (SELECT query_id, did FROM pool WHERE 1=0)"
    ]
    for t in range(1, k + 1):
        parts.append(f"""
cand{t} AS (
  SELECT p.query_id, p.did,
         7 * p.rel_micro - 3 * COALESCE((
           SELECT MAX(x.sim_micro) FROM pp x
           WHERE x.query_id = p.query_id AND x.a = p.did
             AND x.b IN (SELECT s.did FROM sel{t - 1} s WHERE s.query_id = p.query_id)), 0)
         AS score
  FROM pool p
  WHERE p.did NOT IN (SELECT s.did FROM sel{t - 1} s WHERE s.query_id = p.query_id)),
pick{t} AS (SELECT query_id, did, score FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, did) AS r
  FROM cand{t}) WHERE r = 1),
sel{t} AS (SELECT query_id, did FROM sel{t - 1}
           UNION ALL SELECT query_id, did FROM pick{t})""")
    return ",\n".join(parts)


def _mmr_oracle(n_queries: int, n_pool: int, k: int) -> str:
    picks = "\nUNION ALL ".join(
        f"SELECT query_id, {t} AS rank, did, score AS mmr_score_scaled FROM pick{t}"
        for t in range(1, k + 1)
    )
    return (
        "WITH "
        + _mmr_base_ctes(n_queries, n_pool)
        + ",\n"
        + _mmr_step_ctes(k)
        + f"\nSELECT * FROM ({picks})\nORDER BY query_id, rank"
    )


@query("mmr_rerank", oracle=_mmr_oracle(_MMR_NQ, _MMR_POOL, _MMR_K))
def mmr_rerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified re-ranking (Carbonell & Goldstein 1998): greedy
    λ·rel − (1−λ)·max-sim-to-selected over a top-20 candidate pool,
    λ=0.7 as the integer pair (7,3) over micro-unit cosines so the
    whole greedy trajectory is integer-exact and DuckDB replays all 5
    steps as unrolled CTEs. Distributed work is the pool retrieval and
    the pool's pairwise similarities; the selection runs on the
    collected head (bounded by construction — operators/rerank.py)."""
    from dawis_spark.operators.rerank import mmr_rerank

    emb = spark.table("embeddings")
    return mmr_rerank(
        spark,
        corpus=emb,
        queries=emb.filter(F.col("vec_id") < _MMR_NQ),
        id_col="vec_id",
        vec_col="embedding",
        k=_MMR_K,
        n_pool=_MMR_POOL,
    ).orderBy("query_id", "rank")


def _mmr_eval_oracle(n_queries: int, n_pool: int, k: int) -> str:
    return (
        "WITH "
        + _mmr_base_ctes(n_queries, n_pool)
        + ",\n"
        + _mmr_step_ctes(k)
        + f"""
, mmr AS (SELECT query_id, did FROM sel{k}),
topk AS (SELECT query_id, did, rel_micro FROM pool WHERE rnk <= {k}),
tp AS (SELECT p.query_id, CAST(SUM(p.sim_micro) AS BIGINT) AS pairsim FROM pp0 p
       JOIN topk x ON x.query_id = p.query_id AND x.did = p.a
       JOIN topk y ON y.query_id = p.query_id AND y.did = p.b
       GROUP BY p.query_id),
mp AS (SELECT p.query_id, CAST(SUM(p.sim_micro) AS BIGINT) AS pairsim FROM pp0 p
       JOIN mmr x ON x.query_id = p.query_id AND x.did = p.a
       JOIN mmr y ON y.query_id = p.query_id AND y.did = p.b
       GROUP BY p.query_id),
tr AS (SELECT query_id, CAST(SUM(rel_micro) AS BIGINT) AS rel FROM topk GROUP BY query_id),
mr AS (SELECT p.query_id, CAST(SUM(p.rel_micro) AS BIGINT) AS rel FROM pool p
       JOIN mmr m ON m.query_id = p.query_id AND m.did = p.did GROUP BY p.query_id)
SELECT tr.query_id, tr.rel AS topk_rel_sum, mr.rel AS mmr_rel_sum,
       tp.pairsim AS topk_pairsim_sum, mp.pairsim AS mmr_pairsim_sum,
       CAST(tp.pairsim - mp.pairsim AS BIGINT) AS diversity_gain
FROM tr JOIN mr ON tr.query_id = mr.query_id
JOIN tp ON tp.query_id = tr.query_id
JOIN mp ON mp.query_id = tr.query_id
ORDER BY tr.query_id"""
    )


@query("mmr_diversity_eval", oracle=_mmr_eval_oracle(_MMR_NQ, _MMR_POOL, _MMR_K))
def mmr_diversity_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-eval for mmr_rerank: per query, summed relevance and summed
    pairwise intra-set similarity of the plain top-5 vs the MMR-5
    (all integer micro-units). diversity_gain = how much intra-set
    redundancy MMR removed; the relevance columns price what it cost.
    The standing discipline: every re-ranking/approximate component
    ships with the query that measures its trade."""
    from dawis_spark.operators.rerank import mmr_pool_pairs, mmr_rerank

    from dawis_spark.operators.similarity import brute_force_topk

    emb = spark.table("embeddings")
    queries_df = emb.filter(F.col("vec_id") < _MMR_NQ)
    ranked = brute_force_topk(
        corpus=emb, queries=queries_df, id_col="vec_id", vec_col="embedding",
        k=_MMR_POOL,
    ).select(
        "query_id",
        F.col("neighbor_id").alias("did"),
        F.col("rank").alias("rnk"),
        F.expr("cast(round(cosine * 1000000, 0) as bigint)").alias("rel_micro"),
    )
    pool = ranked.select("query_id", "did", "rel_micro")
    pairs = mmr_pool_pairs(pool, emb, "vec_id", "embedding")
    mmr = mmr_rerank(
        spark, emb, queries_df, "vec_id", "embedding", k=_MMR_K, n_pool=_MMR_POOL
    ).select("query_id", "did")
    topk = ranked.filter(F.col("rnk") <= _MMR_K).select(
        "query_id", "did", "rel_micro"
    )

    def pairsum(sel):
        return (
            pairs.join(
                sel.select("query_id", F.col("did").alias("a")), ["query_id", "a"]
            )
            .join(sel.select("query_id", F.col("did").alias("b")), ["query_id", "b"])
            .groupBy("query_id")
            .agg(F.sum("sim_micro").cast("bigint").alias("pairsim"))
        )

    tp = pairsum(topk).withColumnRenamed("pairsim", "topk_pairsim_sum")
    mp = pairsum(mmr).withColumnRenamed("pairsim", "mmr_pairsim_sum")
    tr = topk.groupBy("query_id").agg(
        F.sum("rel_micro").cast("bigint").alias("topk_rel_sum")
    )
    mr = (
        pool.join(mmr, ["query_id", "did"])
        .groupBy("query_id")
        .agg(F.sum("rel_micro").cast("bigint").alias("mmr_rel_sum"))
    )
    return (
        tr.join(mr, "query_id")
        .join(tp, "query_id")
        .join(mp, "query_id")
        .withColumn(
            "diversity_gain",
            (F.col("topk_pairsim_sum") - F.col("mmr_pairsim_sum")).cast("bigint"),
        )
        .orderBy("query_id")
    )


_PPS_SCALE = 2100  # ppm per token; 2100 = 2^2*3*5^2*7 — 3 and 7 never divide 2e12, so round(1e12/pi) cannot land on an exact .5


def _pps_w(dialect: str) -> str:
    fn = "size" if dialect == "spark" else "len"
    return f"cast({fn}({_TXT.tokens('text', dialect)}) as bigint)"


def _pps_sample_oracle() -> str:
    from dawis_spark.operators.sketches import pps_oracle_sample_sql

    inner = pps_oracle_sample_sql("documents", "doc_id", _pps_w("duck"), _PPS_SCALE)
    return f"""
SELECT doc_id, CAST(w AS BIGINT) AS n_tokens, pi_ppm, ht_micro
FROM ({inner}) ORDER BY doc_id
"""


@query("pps_weighted_sample", oracle=_pps_sample_oracle())
def pps_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size document sampling (pi = token
    count x 700ppm, capped at 1): hash-defined inclusion — reproducible,
    coordinated, refresh-stable — with the integer-ppm pi and micro-unit
    Horvitz-Thompson reweight computed inside the scan (zero shuffle
    before the display sort). The weighted counterpart of the uniform
    hash-Bernoulli sampler; in a quality pipeline the weight column is
    the quality/importance score instead of size."""
    from dawis_spark.operators.sketches import pps_sample

    docs = spark.table("documents").select(
        "doc_id", F.expr(_pps_w("spark")).alias("n_tokens")
    )
    return pps_sample(docs, "doc_id", "n_tokens", _PPS_SCALE).select(
        "doc_id", "n_tokens", "pi_ppm", "ht_micro"
    ).orderBy("doc_id")


def _pps_totals_oracle() -> str:
    from dawis_spark.operators.sketches import pps_oracle_sample_sql

    inner = pps_oracle_sample_sql("documents", "doc_id", _pps_w("duck"), _PPS_SCALE)
    return f"""
WITH s AS ({inner}),
e AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM({_pps_w('duck')}) AS BIGINT) AS total_tokens
      FROM documents),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS sample_docs,
             CAST(SUM(ht_micro) AS BIGINT) AS est_docs_micro,
             CAST(SUM(w * ht_micro) AS BIGINT) AS est_tokens_micro
      FROM s)
SELECT e.n_docs, e.total_tokens, m.sample_docs, m.est_docs_micro, m.est_tokens_micro,
       ROUND((m.est_docs_micro / 1000000.0 - e.n_docs) / e.n_docs, 4) AS err_docs,
       ROUND((m.est_tokens_micro / 1000000.0 - e.total_tokens) / e.total_tokens, 4) AS err_tokens
FROM e, m
"""


@query("pps_ht_totals", oracle=_pps_totals_oracle())
def pps_ht_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-eval for pps_weighted_sample: Horvitz-Thompson estimates of
    the document and token totals from the weighted sample, against the
    exact full-scan totals, with realized relative errors. The token
    total rides on the size-proportional design (big docs near-certain),
    so err_tokens should sit well inside err_docs — the property pps
    exists to buy."""
    from dawis_spark.operators.sketches import pps_sample

    docs = spark.table("documents").select(
        "doc_id", F.expr(_pps_w("spark")).alias("n_tokens")
    )
    e = docs.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )
    m = pps_sample(docs, "doc_id", "n_tokens", _PPS_SCALE).agg(
        F.count("*").cast("bigint").alias("sample_docs"),
        F.sum("ht_micro").cast("bigint").alias("est_docs_micro"),
        F.sum(F.col("n_tokens") * F.col("ht_micro"))
        .cast("bigint")
        .alias("est_tokens_micro"),
    )
    return e.crossJoin(m).select(
        "n_docs",
        "total_tokens",
        "sample_docs",
        "est_docs_micro",
        "est_tokens_micro",
        F.round(
            (F.col("est_docs_micro") / 1000000.0 - F.col("n_docs"))
            / F.col("n_docs"),
            4,
        ).alias("err_docs"),
        F.round(
            (F.col("est_tokens_micro") / 1000000.0 - F.col("total_tokens"))
            / F.col("total_tokens"),
            4,
        ).alias("err_tokens"),
    )


def _hll_oracle() -> str:
    from dawis_spark.operators.sketches import hll_oracle_sql

    inner = hll_oracle_sql("events", "event_id", numeric=True).strip()
    return f"""
WITH h AS ({inner}),
e AS (SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_exact FROM events)
SELECT e.n_exact, h.v_empty, h.s_scaled, h.est_raw, h.method, h.est,
       ROUND((h.est - e.n_exact) / e.n_exact, 4) AS rel_err
FROM e, h
"""


@query("hll_distinct_events", oracle=_hll_oracle())
def hll_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct count (Flajolet et al. 2007) made
    engine-exact: salted uniformized hashes, rho as the STRING length of
    the minimal binary rendering (integer in both engines), the harmonic
    denominator kept as the exact dyadic integer sum 2^(25-rho), and one
    final literal/int division — the construction that retires the KMV
    section's 'HLL hangs on float log2' objection. Exchange carries at
    most 64 (register, partial-max) rows per task; partial max IS the
    sketch union, so shard merge is free. Regime-complete (VERDICT r8
    #5): the estimator auto-dispatches to the Whang et al. linear-
    counting branch (raw est <= 2.5m with empty registers) — m*ln(m/v)
    over the FINITE v_empty domain {1..64} rendered as 64 shared decimal
    literals, so the correction adds no transcendental to either engine.
    The `method` column records the regime taken; here (600k distinct at
    sf0.1) it's 'raw', and the small-range fixture test exercises
    'linear'. Self-eval inline: exact distinct vs estimate (expected
    |err| ~ 1.04/sqrt(64) = 13%)."""
    from dawis_spark.operators.sketches import hll_estimate, hll_registers

    ev = spark.table("events")
    est = hll_estimate(hll_registers(ev, "event_id", numeric=True))
    exact = ev.agg(F.countDistinct("event_id").cast("bigint").alias("n_exact"))
    return exact.crossJoin(est).select(
        "n_exact",
        "v_empty",
        "s_scaled",
        "est_raw",
        "method",
        "est",
        F.round((F.col("est") - F.col("n_exact")) / F.col("n_exact"), 4).alias(
            "rel_err"
        ),
    )


_FUNNEL_STEPS_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1
    AND e.ts <= v.t1 + INTERVAL 7 DAY
  GROUP BY e.user_id),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
    AND e.ts <= c.t2 + INTERVAL 7 DAY
  GROUP BY e.user_id)
SELECT
  CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS users_view,
  CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS users_click,
  CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS users_purchase,
  ROUND(CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
        / (SELECT COUNT(*) FROM v), 4) AS conv_view_click,
  ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
        / (SELECT COUNT(*) FROM c), 4) AS conv_click_purchase,
  ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
        / (SELECT COUNT(*) FROM v), 4) AS conv_total
"""


@query("funnel_conversion", oracle=_FUNNEL_STEPS_SQL)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict ordered funnel (view -> click -> purchase, each step within
    7 days of the previous step's FIRST occurrence) — the standard
    product-analytics sequence query the reference's marketing warehouse
    domain lives on. Three per-user MIN aggregations chained by
    co-partitioned user_id joins: every exchange hashes on user_id, so
    AQE coalesces them onto one partitioning; the per-step relations
    shrink monotonically (each join's right side is the previous step's
    survivors). No window sort, no per-user event arrays — at 100 TB the
    plan is 3 partial-agg scans + 2 shrinking hash joins.

    Distinct from funnel_view_click_purchase (the FIRST-TOUCH form: one
    conditional-MIN pass, order checked by comparing first-touch times,
    no step windows): this is the strict sequential-within-window
    semantics product analytics defaults to — a click only counts after
    the first view AND within its 7-day window, and the purchase clock
    restarts from that click."""
    return spark.sql(_FUNNEL_STEPS_SQL)


def _cohort_oracle() -> str:
    return """
WITH first_seen AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
  FROM events),
cohort_size AS (
  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_users
  FROM first_seen GROUP BY cohort_week),
m AS (
  SELECT f.cohort_week,
         CAST(date_diff('day', f.cohort_week, a.active_week) / 7 AS INT) AS week_offset,
         CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS active_users
  FROM first_seen f JOIN activity a ON f.user_id = a.user_id
  GROUP BY 1, 2)
SELECT m.cohort_week, m.week_offset, m.active_users, s.cohort_users,
       ROUND(CAST(m.active_users AS DOUBLE) / s.cohort_users, 4) AS retention
FROM m JOIN cohort_size s ON m.cohort_week = s.cohort_week
ORDER BY m.cohort_week, m.week_offset
"""


@query("cohort_retention", oracle=_cohort_oracle())
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix with RATE normalization — extends
    weekly_retention_cohorts (offset x count only) with per-cohort sizes
    and retention fractions, the form dashboards consume. Shapes: first-seen and the distinct (user, week)
    activity relation each shuffle once on user_id (co-partitioned for
    the join); the retention matrix itself is weeks x weeks — tiny. The
    count-distinct in the matrix agg is exact; at extreme user
    cardinality the KMV/HLL sketches in operators/sketches.py are the
    drop-in approximate form."""
    e = spark.table("events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    cohort_size = first_seen.groupBy("cohort_week").agg(
        F.count("*").cast("bigint").alias("cohort_users")
    )
    m = (
        first_seen.join(activity, "user_id")
        .select(
            "cohort_week",
            (
                F.datediff(
                    F.col("active_week").cast("date"),
                    F.col("cohort_week").cast("date"),
                )
                / 7
            )
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").cast("bigint").alias("active_users"))
    )
    return (
        m.join(cohort_size, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "active_users",
            "cohort_users",
            F.round(F.col("active_users") / F.col("cohort_users"), 4).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


# --- journey whale policy (operators/journeys.py whale guard) -------------
#
# Every per-user sequence window below (event_transitions,
# frequent_event_sequences, session_entry_exit_bounce,
# markov_next_event_accuracy) routes through the whale guard: users
# holding > 0.8% of ALL events (exact integer share test,
# c * 1000 > total * 8) are flagged by a broadcast whale set — bounded
# at 125 keys by the share itself — and EXCLUDED from the
# Window.partitionBy(user_id) path sort; every guarded query carries
# the excluded-key count as an ``n_whales`` audit column so the
# exclusion is observable. At 100 TB this keeps one bot/sentinel key
# from single-tasking the journey window (SCALE.md zipf rehearsal).
_WHALE_SHARE = (8, 1000)

_WG_CTES = f"""wg_counts AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1),
wg_tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM wg_counts),
wg_whales AS (SELECT user_id FROM wg_counts, wg_tot
              WHERE c * {_WHALE_SHARE[1]} > t * {_WHALE_SHARE[0]}),
wg_nw AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_whales FROM wg_whales),
kept_events AS (
  SELECT e.* FROM events e
  WHERE NOT EXISTS (SELECT 1 FROM wg_whales w WHERE w.user_id = e.user_id))"""


def _guarded_events(spark: SparkSession):
    """(kept, nw): events minus whale users, plus the 1-row n_whales
    audit relation — the Spark twin of _WG_CTES. The whale set (≤ 125
    keys by the share bound) is computed in ONE counting scan and
    persisted, so the guard costs exactly one map-side count aggregate
    + one broadcast anti-join on top of whatever the consumer does."""
    from dawis_spark.operators.journeys import whale_guard, whale_keys

    e = spark.table("events")
    whales = whale_keys(e, ["user_id"], max_share=_WHALE_SHARE).persist()
    nw = whales.agg(F.count(F.lit(1)).cast("bigint").alias("n_whales"))
    kept = whale_guard(e, ["user_id"], whales=whales).filter(~F.col("is_whale"))
    return kept, nw


def _with_whale_audit(result: DataFrame, nw: DataFrame) -> DataFrame:
    """``result`` with ``n_whales`` on every row — via a LEFT join FROM
    the 1-row audit relation, so an all-whale corpus (result empty)
    still yields ONE row of NULL measures + the whale count instead of
    an empty relation (the audit must not vanish exactly when the guard
    filtered everything). ``result`` is always a type-cardinality-
    bounded aggregate here, so broadcasting it is free."""
    return nw.join(F.broadcast(result), F.lit(True), "left").select(
        *result.columns, "n_whales"
    )


_TRANSITIONS_SQL = f"""
WITH {_WG_CTES},
ordered AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM kept_events),
pairs AS (
  SELECT event_type AS src, next_type AS dst, CAST(COUNT(*) AS BIGINT) AS n
  FROM ordered WHERE next_type IS NOT NULL
  GROUP BY src, dst),
outdeg AS (
  SELECT src, CAST(SUM(n) AS BIGINT) AS total FROM pairs GROUP BY src)
SELECT q.src, q.dst, q.n, q.prob, wg_nw.n_whales
FROM wg_nw LEFT JOIN (
  SELECT p.src, p.dst, p.n, ROUND(CAST(p.n AS DOUBLE) / o.total, 4) AS prob
  FROM pairs p JOIN outdeg o ON p.src = o.src) q ON TRUE
ORDER BY q.src, q.dst
"""


@query("event_transitions", oracle=_TRANSITIONS_SQL)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event paths:
    lead() within (user_id ORDER BY ts, event_id) pairs each event with
    its successor, then (src, dst) counts normalize by source out-degree.
    ONE shuffle moves event rows (the user_id window — carrying only
    (user, type, ts)); everything after is event-type-cardinality-sized.
    The deterministic event_id tie-break makes simultaneous-timestamp
    paths replayable. The classic clickstream/path-analysis query of the
    reference's web-analytics domain (GA behavior flow).

    Guarded: whale users (> 0.8% of all events) are excluded from the
    path sort by the broadcast whale guard and reported via the
    n_whales audit column — see _WHALE_SHARE above."""
    from pyspark.sql import Window

    kept, nw = _guarded_events(spark)
    e = kept.select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("next_type").alias("dst"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    # out-degree as a window over the (src, dst) relation itself: no join
    # and — crucially — no second evaluation of the event-path subtree
    # (a groupBy-then-join-back would recompute the user window at scale)
    total = F.sum("n").over(Window.partitionBy("src"))
    trans = pairs.select(
        "src",
        "dst",
        "n",
        F.round(F.col("n") / total, 4).alias("prob"),
    )
    return _with_whale_audit(trans, nw).orderBy("src", "dst")


_GAPFILL_INTERP_ORACLE = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day, ROUND(SUM(value), 2) AS total
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT user_id, MIN(day) AS b0, MAX(day) AS b1 FROM daily GROUP BY 1),
spine AS (
  SELECT user_id, UNNEST(generate_series(b0, b1, INTERVAL 1 DAY)) AS day
  FROM bounds
),
j AS (
  SELECT s.user_id, s.day, d.total
  FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
),
w AS (
  SELECT user_id, day, total,
    last_value(total IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
    last_value(CASE WHEN total IS NOT NULL THEN day END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_b,
    first_value(total IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY day
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
    first_value(CASE WHEN total IS NOT NULL THEN day END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY day
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_b
  FROM j
)
SELECT user_id, day, total,
  CASE WHEN total IS NOT NULL THEN ROUND(total, 4)
       WHEN next_v IS NULL THEN ROUND(prev_v, 4)
       ELSE ROUND(prev_v + (next_v - prev_v)
                  * date_diff('day', prev_b, day)
                  / date_diff('day', prev_b, next_b), 4)
  END AS filled,
  total IS NULL AS is_gap
FROM w ORDER BY user_id, day
"""


@query("gapfill_interp_user_value", oracle=_GAPFILL_INTERP_ORACLE)
def gapfill_interp_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily spine with LINEAR interpolation across interior
    gaps (trailing gaps carry forward) — the interpolate() companion to
    gapfill_daily_user_value's LOCF. The fill is one fixed-order
    multiply-divide over exact integer day offsets, rounded once:
    engine-exact without accumulation-order hazards."""
    from dawis_spark.operators.gapfill import gapfill_interp

    daily = (
        spark.table("events")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    return gapfill_interp(daily, ["user_id"], "day", "total").orderBy(
        "user_id", "day"
    )


from dawis_spark.operators import journeys as _journeys  # noqa: E402


@query(
    "position_attribution",
    oracle=_journeys.attribution_oracle_sql("purchase"),
)
def position_attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped multi-touch attribution: each purchase's value is split
    40/20/40 across the first/middle/last touches of the journey that
    closed with it (the standard position-based model in GA/attribution
    reporting — the multi-touch extension of asof_last_click). Credits
    are exact BIGINT cent-ppm micro-units (flooring remainder pinned to
    the first touch), so the engines agree to the bit and the only float
    op is the display division. One user-hashed exchange builds journey
    indices; the purchase<->touch join is co-keyed on (user, journey);
    the output aggregate is event-type-sized."""
    return _journeys.position_attribution(
        spark.table("events"), "purchase"
    ).orderBy("touch_type")


_SEQ_GUARDED = _journeys.sequences_oracle_sql(
    3, 25, source="kept_events", prelude=_WG_CTES
)
# wrap: top-25 relation x the whale audit (all-whale corpus -> one
# NULL-measure row carrying n_whales, same as the other guarded queries)
_SEQ_ORACLE = f"""
WITH q AS ({_SEQ_GUARDED}),
{_WG_CTES}
SELECT q.seq, q.support, q.share, wg_nw.n_whales
FROM wg_nw LEFT JOIN q ON TRUE
ORDER BY q.support DESC, q.seq
"""


@query("frequent_event_sequences", oracle=_SEQ_ORACLE)
def frequent_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-3 consecutive event-type path mining (the PrefixSpan k=3
    slice): per-user lead() pairs inside ONE user-hashed window exchange,
    then a |types|^3-key support aggregate with a global-share column.
    Deterministic (support DESC, seq) top-25. The 'what happens right
    before an error/purchase' query of behavior-flow analytics.

    Guarded: whale users (> 0.8% of all events, _WHALE_SHARE) are
    excluded from the path window; n_whales audits the exclusion."""
    kept, nw = _guarded_events(spark)
    seqs = _journeys.frequent_sequences(kept, 3, 25)
    return _with_whale_audit(seqs, nw).orderBy(F.desc("support"), "seq")


from dawis_spark.operators import profile as _profile  # noqa: E402

_PROFILE_COLS = ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]


@query(
    "column_stats_profile",
    oracle=_profile.profile_oracle_sql("lineitem", _PROFILE_COLS),
)
def column_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column statistics (rows, nulls, exact NDV, min,
    max, mean) over the lineitem measures in one unpivot + aggregate —
    the stats block data-quality rules and the CBO consume. Values snap
    to integer cents so the mean is exact-int / exact-int: one ordered
    division, bit-stable across engines. Scale: one scan, |cols| agg
    keys; NDV is the exact two-phase plan (KMV/HLL in
    operators/sketches.py are the sketch form at extreme cardinality)."""
    return _profile.column_profile(spark.table("lineitem"), _PROFILE_COLS)


@query(
    "feature_correlations",
    oracle=_profile.pearson_oracle_sql("lineitem", _PROFILE_COLS),
)
def feature_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the lineitem measures in
    ONE moment-aggregate scan (map-side partials, zero keyed shuffle) —
    feature screening for the logreg/classifier family. Integer-cent
    moments are carried as DECIMAL(38,0)/HUGEINT so n*Sxy - Sx*Sy is
    EXACT; the only floats are correctly-rounded int->double casts, IEEE
    sqrt, and one division — engines agree to the bit (contrast: naive
    CORR() is accumulation-order-dependent)."""
    return _profile.pearson_matrix(spark.table("lineitem"), _PROFILE_COLS)


from dawis_spark.operators import cooccur as _cooccur  # noqa: E402

_ITEM_SPARK = "cast(get_json_object(props, '$.k') as int)"
_ITEM_DUCK = "CAST(json_extract_string(props, '$.k') AS INT)"


@query(
    "item_cooccurrence_topk",
    oracle=_cooccur.cooccurrence_oracle_sql(_ITEM_DUCK, 5, 128, 2),
)
def item_cooccurrence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering over the events stream's JSON
    item attribute (get_json_object — the §2.8 JSON surface in a data
    plane): distinct (user, item) baskets -> within-user pairs ->
    co-user counts -> cosine co/sqrt(n_i*n_j) -> deterministic top-5
    neighbors per item. Oversized baskets (> 128 items) are dropped
    before pairing — the standard quadratic-blowup guard, replayed in
    the oracle. Cosine is exact-int / (IEEE sqrt x IEEE sqrt): bit-stable
    across engines. Post-pairing everything is item-catalog-sized."""
    return _cooccur.cooccurrence_topk(
        spark.table("events"), _ITEM_SPARK, 5, 128, 2
    )


def _containment_oracle(
    shingle_k: int, df_cap: int, min_inter: int, min_cont: float, top: int
) -> str:
    sh = _TXT.shingle_hashes("text", shingle_k, "duck")
    return f"""
WITH sh AS (
  SELECT doc_id, UNNEST({sh}) AS h FROM documents
  WHERE len({sh}) > 0),
rare AS (SELECT h FROM sh GROUP BY h HAVING COUNT(*) <= {df_cap}),
p AS (SELECT sh.doc_id, sh.h FROM sh JOIN rare USING (h)),
fsz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM p GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM p a JOIN p b ON a.h = b.h AND a.doc_id <> b.doc_id
  GROUP BY 1, 2 HAVING COUNT(*) >= {min_inter})
SELECT i.id_a, i.id_b, i.inter,
       ROUND(CAST(i.inter AS DOUBLE) / s.sz, 6) AS containment
FROM inter i JOIN fsz s ON i.id_a = s.doc_id
WHERE CAST(i.inter AS DOUBLE) / s.sz >= {min_cont}
ORDER BY containment DESC, id_a, id_b LIMIT {top}
"""


@query(
    "containment_near_dups",
    oracle=_containment_oracle(3, 20, 5, 0.6, 100),
)
def containment_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup C(A->B) = |S_A n S_B| / |S_A|: finds
    docs EMBEDDED in larger ones, which symmetric Jaccard union-washes
    out. Stop-shingles (document frequency > 20) are dropped before the
    postings self-join — the df-cap quadratic guard, applied identically
    to numerators and denominators and replayed in the oracle. Postings
    carry hashes only; per-shingle join fanout is <= df_cap^2."""
    from dawis_spark.operators.dedup import containment_pairs

    return containment_pairs(
        spark.table("documents"), "doc_id", "text", 3, 20, 5, 0.6, 100
    )


def _coreset_oracle(kc: int, m: int, dim: int) -> str:
    cos_vc = _VEC.cosine_null("vec", "cvec", "duck")
    return f"""
WITH {_kmeans_c1_ctes(kc, dim)},
aff AS (
  SELECT v.vec_id, cent.cid,
         coalesce(ROUND({cos_vc}, 6), -2.0) AS aff
  FROM v, (SELECT cid, cvec FROM c1) cent(cid, cvec)),
best AS (
  SELECT vec_id, cid, aff FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY aff DESC, cid) AS r
    FROM aff) WHERE r = 1),
ranked AS (
  SELECT CAST(cid AS INT) AS cell, vec_id, aff AS centrality,
         CAST(row_number() OVER (PARTITION BY cid ORDER BY aff DESC, vec_id) AS INT) AS rank
  FROM best)
SELECT cell, vec_id, centrality, rank FROM ranked
WHERE rank <= {m} ORDER BY cell, rank
"""


@query("coreset_cluster_balanced", oracle=_coreset_oracle(8, 40, 64))
def coreset_cluster_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced coreset selection for training-data curation:
    k-means cells (deterministic bounded-sample training, the IVF
    quantizer machinery) -> map-side full-corpus assignment -> top-40
    most-central vectors PER CELL, so every mode keeps representation
    where a global top-m collapses onto the densest cluster (SemDeDup's
    selection step inverted: keep prototypes, not prune dupes). Only
    exchange: the per-cell top-m window over config-sized keys."""
    from dawis_spark.operators.similarity import cluster_balanced_coreset

    return cluster_balanced_coreset(
        spark.table("embeddings"), "vec_id", "embedding", 8, 40, 1
    )


def _triangle_oracle(max_basket: int, min_co: int) -> str:
    return f"""
WITH b0 AS (
  SELECT DISTINCT user_id, {_ITEM_DUCK} AS item FROM events
  WHERE {_ITEM_DUCK} IS NOT NULL),
bn AS (SELECT user_id, COUNT(*) AS n FROM b0 GROUP BY user_id),
b AS (SELECT b0.user_id, b0.item FROM b0 JOIN bn USING (user_id)
      WHERE bn.n <= {max_basket}),
e AS (
  SELECT a.item AS i, b2.item AS j
  FROM b a JOIN b b2 ON a.user_id = b2.user_id AND a.item < b2.item
  GROUP BY 1, 2 HAVING COUNT(*) >= {min_co}),
tri AS (
  SELECT ab.i AS x, ab.j AS y, bc.j AS z
  FROM e ab JOIN e bc ON ab.j = bc.i
  JOIN e ac ON ac.i = ab.i AND ac.j = bc.j),
nodes AS (
  SELECT x AS item FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
SELECT item, CAST(COUNT(*) AS BIGINT) AS triangles
FROM nodes GROUP BY item ORDER BY triangles DESC, item
"""


@query("item_graph_triangles", oracle=_triangle_oracle(128, 6))
def item_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the item co-occurrence graph
    (edges = item pairs co-touched by >= 6 users, baskets capped at 128)
    — the clustering-density primitive behind community/link-farm
    detection. Edges are ORIENTED i<j so each triangle {a<b<c} is
    counted exactly once as a closed wedge (Suri & Vassilvitskii's
    'last reducer' fix): two edge-keyed self-joins + one explode/count,
    all edge-count-bound shuffles."""
    from dawis_spark.operators.cooccur import item_baskets
    from dawis_spark.operators.graph import triangle_counts

    b = item_baskets(spark.table("events"), _ITEM_SPARK, 128)
    edges = (
        b.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("i"), F.col("b.item").alias("j"))
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= 6)
        .select("i", "j")
    )
    return triangle_counts(edges)


_FUZZY_ORACLE = """
WITH names AS (
  SELECT p_brand AS g, p_name AS t, CAST(COUNT(*) AS BIGINT) AS n,
         length(p_name) AS ln
  FROM part GROUP BY 1, 2)
SELECT a.g AS p_brand, a.t AS text_a, b2.t AS text_b,
       CAST(levenshtein(a.t, b2.t) AS INT) AS dist,
       a.n AS n_a, b2.n AS n_b
FROM names a JOIN names b2
  ON a.g = b2.g AND a.t < b2.t AND abs(a.ln - b2.ln) <= 2
WHERE levenshtein(a.t, b2.t) <= 2
ORDER BY p_brand, text_a, text_b
"""


@query("fuzzy_name_matches", oracle=_FUZZY_ORACLE)
def fuzzy_name_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy matching on SHORT strings: part names
    within brand blocks at Levenshtein distance <= 2 — the string-family
    operator shingle/MinHash can't serve (3-gram sets of two-word names
    are too sparse). Runs on the DISTINCT-NAME catalog with occurrence
    counts (the sf1 rehearsal caught the row-level formulation at an
    18e9-pair enumeration; the name catalog barely grows under tiling).
    Length filter |len_a - len_b| <= 2 (an edit-distance lower bound)
    prunes inside the join condition; the distance is the engines'
    native integer levenshtein — no floats anywhere."""
    from dawis_spark.operators.dedup import edit_distance_pairs

    return edit_distance_pairs(
        spark.table("part"), "p_partkey", "p_name", "p_brand", 2, None
    )


from dawis_spark.operators import diff as _diff  # noqa: E402

_DIFF_OLD = "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 10 <> 0"
_DIFF_NEW = (
    "SELECT o_orderkey, o_orderstatus, "
    "CASE WHEN o_orderkey % 5 = 0 THEN ROUND(o_totalprice * 1.1, 2) "
    "ELSE o_totalprice END AS o_totalprice "
    "FROM orders WHERE o_orderkey % 7 <> 0"
)


@query(
    "snapshot_table_diff",
    oracle=_diff.diff_oracle_sql(
        _DIFF_OLD,
        _DIFF_NEW,
        ["o_orderkey"],
        ["o_orderstatus", "o_totalprice"],
    )
    + " ORDER BY o_orderkey",
)
def snapshot_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style snapshot reconciliation: two deterministic versions of
    orders (keys mod-10 vs mod-7 membership churn; mod-5 keys get a 10%
    price bump) are diffed by ONE co-keyed full outer join into
    added/removed/changed rows with the exact changed-column list under
    null-safe equality — the change feed operators/ivm.py consumes and
    operators/scd.py writes history from. Output is churn-sized, never
    table-sized."""
    orders = spark.table("orders")
    old = orders.filter("o_orderkey % 10 <> 0").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = orders.filter("o_orderkey % 7 <> 0").select(
        "o_orderkey",
        "o_orderstatus",
        F.expr(
            "CASE WHEN o_orderkey % 5 = 0 THEN ROUND(o_totalprice * 1.1, 2) "
            "ELSE o_totalprice END"
        ).alias("o_totalprice"),
    )
    return _diff.table_diff(
        old, new, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    ).orderBy("o_orderkey")


@query(
    "totalprice_histogram",
    oracle=_profile.histogram_oracle_sql("orders", "o_totalprice", 20),
)
def totalprice_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bucket histogram of order totals with IN-QUERY
    bounds — the ANALYZE/optimizer-stats histogram. Bucket index is
    integer multiply-then-divide over cents ((vc-minc)*B div range), so
    boundary ties land identically in both engines where a float
    (v-min)/width would round apart. Bounds row broadcasts; the count
    aggregate has 20 keys, all map-side-partial."""
    return _profile.equi_width_histogram(spark.table("orders"), "o_totalprice", 20)


_BOUNCE_ORACLE = f"""
WITH {_WG_CTES},
e AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM kept_events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM e),
per_sess AS (
  SELECT user_id, sess,
         first(event_type ORDER BY ts, event_id) AS entry_type,
         last(event_type ORDER BY ts, event_id) AS exit_type,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM s GROUP BY user_id, sess),
per_entry AS (
  SELECT entry_type,
         CAST(COUNT(*) AS BIGINT) AS sessions,
         CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bounces,
         ROUND(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*), 4) AS bounce_rate,
         ROUND(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 4) AS avg_events,
         CAST(SUM(CASE WHEN entry_type = exit_type THEN 1 ELSE 0 END) AS BIGINT)
           AS same_exit
  FROM per_sess GROUP BY entry_type)
SELECT q.entry_type, q.sessions, q.bounces, q.bounce_rate, q.avg_events,
       q.same_exit, wg_nw.n_whales
FROM wg_nw LEFT JOIN per_entry q ON TRUE
ORDER BY q.entry_type
"""


@query("session_entry_exit_bounce", oracle=_BOUNCE_ORACLE)
def session_entry_exit_bounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GA-style landing-page analytics re-expressed on the events stream:
    sessionize (30-min inactivity gap, same rule as `sessionization`),
    take each session's ENTRY and EXIT event types, and roll up bounce
    rate (single-event sessions), average depth, and same-entry-exit
    counts per entry type. One user-hashed exchange carries both windows
    (gap flag + running session id share the sort); the per-session
    collapse rides the same key; the final rollup is type-sized. Ratios
    are exact-int / exact-int single divisions.

    Guarded: whale users (> 0.8% of all events, _WHALE_SHARE) are
    excluded from the sessionization window; n_whales audits the
    exclusion."""
    from pyspark.sql import Window

    kept, nw = _guarded_events(spark)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = kept.select("user_id", "event_type", "ts", "event_id")
    new_sess = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts") > F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTE")),
        1,
    ).otherwise(0)
    s = e.withColumn("new_sess", new_sess).withColumn(
        "sess",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_sess = s.groupBy("user_id", "sess").agg(
        F.min_by("event_type", F.struct("ts", "event_id")).alias("entry_type"),
        F.max_by("event_type", F.struct("ts", "event_id")).alias("exit_type"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    bounce = F.sum((F.col("n_events") == 1).cast("int")).cast("bigint")
    per_entry = per_sess.groupBy("entry_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("sessions"),
        bounce.alias("bounces"),
        F.round(bounce / F.count(F.lit(1)), 4).alias("bounce_rate"),
        F.round(F.sum("n_events") / F.count(F.lit(1)), 4).alias("avg_events"),
        F.sum((F.col("entry_type") == F.col("exit_type")).cast("int"))
        .cast("bigint")
        .alias("same_exit"),
    )
    return _with_whale_audit(per_entry, nw).orderBy("entry_type")


from dawis_spark.operators import drift as _drift  # noqa: E402


@query(
    "ks_price_drift",
    oracle=_drift.ks_oracle_sql(
        "orders",
        "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)",
        "o_orderpriority",
        "1-URGENT",
        "5-LOW",
    ),
)
def ks_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov drift between the URGENT and
    LOW order-total distributions — the binless companion to the binned
    JS source-drift monitor. The sup|F_a - F_b| argmax is decided in
    INTEGER cross-multiplied form |c_a*n_b - c_b*n_a| so both engines
    pick the identical location; value pre-agg makes the single global
    cumulative window distinct-support-sized, not row-sized."""
    o = spark.table("orders").withColumn(
        "v_cents", F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    )
    return _drift.ks_two_sample(
        o, "v_cents", "o_orderpriority", "1-URGENT", "5-LOW"
    )


@query(
    "benford_first_digit",
    oracle=_drift.benford_oracle_sql("orders", "o_totalprice"),
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit screen over order totals — the
    classic fabricated-numbers data-quality check. Expected frequencies
    are nine literals (no runtime log); output is per-digit rows so no
    cross-row float accumulation exists; observed shares are
    exact-int / exact-int single divisions. One scan, 9 agg keys."""
    return _drift.benford_profile(spark.table("orders"), "o_totalprice")


_CURRICULUM_ORACLE = f"""
WITH q AS ({{q}}),
b AS (
  SELECT doc_id, quality, n_tokens,
         ntile(10) OVER (ORDER BY quality, doc_id) AS bucket
  FROM q)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(quality) AS min_q, MAX(quality) AS max_q,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 4) AS avg_tokens
FROM b GROUP BY bucket ORDER BY bucket
""".format(q=_quality_oracle().replace("ORDER BY doc_id", ""))


@query("curriculum_buckets", oracle=_CURRICULUM_ORACLE)
def curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning difficulty deciles: ntile(10) over the
    composite quality score (ties broken by doc_id — replayable), then
    per-bucket doc/token rollups — the ordering stage of quality-
    curriculum training schedules (easy-to-hard). The ntile is computed
    by exact_ntile (range-bucketed two-level prefix-sum ranking,
    operators/sketches.py), NOT a partition-less window — no
    single-partition corpus sort exists in the plan; the only
    whole-data exchange carries <= 1024 bucket counts. Bit-identical to
    the window ntile, so the oracle keeps the reference form."""
    from dawis_spark.operators.sketches import exact_ntile
    from dawis_spark.operators.textstats import quality_score

    q = quality_score(spark.table("documents"), "doc_id", "text")
    b = exact_ntile(q, "quality", ["doc_id"], 10, out_col="bucket")
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("quality").alias("min_q"),
            F.max("quality").alias("max_q"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.round(F.sum("n_tokens") / F.count(F.lit(1)), 4).alias("avg_tokens"),
        )
        .orderBy("bucket")
    )


def _quota_oracle(total: int) -> str:
    from dawis_spark.operators.sketches import _mixed_sql

    h = _TXT.char_hash("cast(doc_id as varchar)", "duck")
    return f"""
WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY source),
tot AS (SELECT SUM(n) AS nc FROM c),
alloc0 AS (
  SELECT source, n,
         ({total} * n) // nc AS base,
         ({total} * n) % nc AS rem
  FROM c, tot),
leftover AS (SELECT {total} - SUM(base) AS l FROM alloc0),
alloc AS (
  SELECT source, n,
         base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, source) <= l
                     THEN 1 ELSE 0 END AS quota
  FROM alloc0, leftover),
ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
           ORDER BY ({_mixed_sql(h, 'duck')}) % 1000000, doc_id) AS rk
  FROM documents)
SELECT r.source, CAST(a.quota AS BIGINT) AS quota, r.doc_id,
       CAST(r.rk AS INT) AS rk
FROM ranked r JOIN alloc a ON r.source = a.source
WHERE r.rk <= a.quota
ORDER BY r.source, r.rk
"""


@query("stratified_quota_sample", oracle=_quota_oracle(200))
def stratified_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional stratified sampling with LARGEST-REMAINDER seat
    allocation: per-source quotas are floor(total*n_h/N) plus one seat
    for the largest remainders (ties by source — the Hare quota method,
    integer-exact so both engines allocate identically), then each
    stratum takes its quota by deterministic uniformized-hash rank —
    the exactly-N companion to the rate-based stratified_sample. Scale:
    counts are one agg; the per-source top-quota is a window over the
    source key; the allocation relation is |sources|-sized."""
    from pyspark.sql import Window

    from dawis_spark.operators.sketches import _mixed_sql
    from dawis_spark.functions import text as _T

    total = 200
    d = spark.table("documents")
    c = d.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = c.agg(F.sum("n").alias("nc"))
    alloc0 = c.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        F.expr(f"({total} * n) div nc").alias("base"),
        F.expr(f"({total} * n) % nc").alias("rem"),
    )
    leftover = alloc0.agg((F.lit(total) - F.sum("base")).alias("l"))
    alloc = alloc0.crossJoin(F.broadcast(leftover)).select(
        "source",
        (
            F.col("base")
            + F.when(
                F.row_number().over(Window.orderBy(F.desc("rem"), "source"))
                <= F.col("l"),
                1,
            ).otherwise(0)
        ).alias("quota"),
    )
    h = _T.char_hash("cast(doc_id as string)", "spark")
    ranked = d.select(
        "doc_id",
        "source",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.expr(f"({_mixed_sql(h, 'spark')}) % 1000000"), "doc_id"
            )
        )
        .alias("rk"),
    )
    return (
        ranked.join(F.broadcast(alloc), "source")
        .filter(F.col("rk") <= F.col("quota"))
        .select(
            "source",
            F.col("quota").cast("bigint").alias("quota"),
            "doc_id",
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("source", "rk")
    )


def _loss_weights_oracle() -> str:
    return """
WITH g AS (
  SELECT doc_id, sha256(text) AS h FROM documents),
sz AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS group_size FROM g GROUP BY h)
SELECT g.doc_id, sz.group_size,
       CAST(1000000 // sz.group_size AS BIGINT) AS weight_ppm
FROM g JOIN sz USING (h) ORDER BY g.doc_id
"""


@query("dedup_loss_weights", oracle=_loss_weights_oracle())
def dedup_loss_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-aware loss weighting — the KEEP-but-downweight
    alternative to dropping exact dups (each content group's total
    gradient mass sums to ~1): weight_ppm = 1e6 div group_size over
    sha-256 content groups, integer-exact. One content-hash aggregate
    plus a hash-keyed join back; weights stay with rows, no row is
    dropped — the form data loaders consume."""
    d = spark.table("documents").withColumn("h", F.sha2(F.col("text"), 256))
    sz = d.groupBy("h").agg(F.count(F.lit(1)).cast("bigint").alias("group_size"))
    return (
        d.join(sz, "h")
        .select(
            "doc_id",
            "group_size",
            F.expr("cast(1000000 div group_size as bigint)").alias("weight_ppm"),
        )
        .orderBy("doc_id")
    )


_ASSOC_ORACLE = f"""
WITH s AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess,
         {_ITEM_DUCK} AS item
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, item,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM s WHERE item IS NOT NULL),
b AS (SELECT DISTINCT user_id * 1000000 + sid AS basket, item FROM sess),
nb AS (SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n_baskets FROM b),
marg AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY item),
co AS (
  SELECT x.item AS i, y.item AS j, CAST(COUNT(*) AS BIGINT) AS n_ij
  FROM b x JOIN b y ON x.basket = y.basket AND x.item <> y.item
  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
SELECT co.i, co.j, co.n_ij,
       ROUND(CAST(co.n_ij AS DOUBLE) / nb.n_baskets, 6) AS support,
       ROUND(CAST(co.n_ij AS DOUBLE) / mi.n, 6) AS confidence,
       ROUND(CAST(co.n_ij AS DOUBLE) * nb.n_baskets / (mi.n * mj.n), 6) AS lift
FROM co JOIN marg mi ON co.i = mi.item JOIN marg mj ON co.j = mj.item, nb
ORDER BY lift DESC, i, j LIMIT 25
"""


@query("association_rules", oracle=_ASSOC_ORACLE)
def association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules i->j over SESSION-scoped item
    baskets (30-min-gap sessions, the same rule as `sessionization`):
    support, confidence, and lift, each a single division of exact
    BIGINT counts (lift's numerator n_ij * N stays in int64) — top-25
    by lift, ties replayable. The directional-rules complement to
    item_cooccurrence_topk's symmetric cosine. Shuffles: one user
    window, one basket-keyed pair join, then item-catalog-sized joins."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = spark.table("events").select(
        "user_id", "ts", "event_id", F.expr(_ITEM_SPARK).alias("item")
    )
    new_sess = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts") > F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTE")),
        1,
    ).otherwise(0)
    sess = (
        e.withColumn("new_sess", new_sess)
        .withColumn(
            "sid",
            F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .filter(F.col("item").isNotNull())
    )
    b = sess.select(
        (F.col("user_id") * 1000000 + F.col("sid")).alias("basket"), "item"
    ).distinct()
    nb = b.agg(F.countDistinct("basket").cast("bigint").alias("n_baskets"))
    marg = b.groupBy("item").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    co = (
        b.alias("x")
        .join(
            b.alias("y"),
            (F.col("x.basket") == F.col("y.basket"))
            & (F.col("x.item") != F.col("y.item")),
        )
        .groupBy(F.col("x.item").alias("i"), F.col("y.item").alias("j"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ij"))
        .filter(F.col("n_ij") >= 3)
    )
    mi = marg.select(F.col("item").alias("i"), F.col("n").alias("n_i"))
    mj = marg.select(F.col("item").alias("j"), F.col("n").alias("n_j"))
    return (
        co.join(mi, "i")
        .join(mj, "j")
        .crossJoin(F.broadcast(nb))
        .select(
            "i",
            "j",
            "n_ij",
            F.round(F.col("n_ij") / F.col("n_baskets"), 6).alias("support"),
            F.round(F.col("n_ij") / F.col("n_i"), 6).alias("confidence"),
            F.round(
                F.col("n_ij") * F.col("n_baskets") / (F.col("n_i") * F.col("n_j")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "i", "j")
        .limit(25)
    )


_ROLLING_MEDIAN_ORACLE = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
  FROM events GROUP BY 1, 2),
expanded AS (
  SELECT d.user_id, d.day + to_days(CAST(off.o AS INT)) AS day, d.total_cents
  FROM daily d, range(0, 7) off(o)),
med AS (
  SELECT e.user_id, e.day,
         median(e.total_cents) AS med_cents,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM expanded e JOIN daily cur ON e.user_id = cur.user_id AND e.day = cur.day
  GROUP BY 1, 2)
SELECT user_id, day, med_cents, n_days
FROM med WHERE n_days >= 4 ORDER BY user_id, day
"""


@query("rolling_median_7d", oracle=_ROLLING_MEDIAN_ORACLE)
def rolling_median_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trailing-7-day median of per-user daily totals — the robust
    rolling statistic MAD-style monitors want where a mean window is
    skew-fragile. No per-row re-sort of a range window: each daily total
    EXPLODES to the <=7 future days it participates in (a fixed map-side
    x7 fanout of hash-only rows), then one (user, day) aggregate takes
    the exact median; days present only via the spine (no own total)
    are dropped by the inner join back to observed days; windows with
    fewer than 4 contributing days are suppressed (warm-up rule).
    Medians run over integer cents (both engines interpolate midpoints
    on .5 exactly); output is one final division."""
    daily = (
        spark.table("events")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("total_cents")
        )
    )
    expanded = daily.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
        "day",
        "total_cents",
    ).select(
        "user_id",
        F.expr("day + make_interval(0, 0, 0, o)").alias("day"),
        "total_cents",
    )
    cur = daily.select("user_id", "day")
    med = (
        expanded.join(cur, ["user_id", "day"])
        .groupBy("user_id", "day")
        .agg(
            F.expr("percentile(total_cents, 0.5)").alias("med_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
        )
        .filter(F.col("n_days") >= 4)
    )
    # output stays in CENTS: an even-count median is x.5 cents — an exact
    # dyadic double both engines hold bit-identically, where /100-then-
    # round would split on the engines' half-cent display rounding
    return med.select("user_id", "day", "med_cents", "n_days").orderBy(
        "user_id", "day"
    )


_PARETO_ORACLE = """
WITH rev AS (
  SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS r_cents
  FROM orders GROUP BY o_custkey),
tot AS (SELECT SUM(r_cents) AS t, CAST(COUNT(*) AS BIGINT) AS n_cust FROM rev),
ranked AS (
  SELECT o_custkey, r_cents,
         SUM(r_cents) OVER (ORDER BY r_cents DESC, o_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         ROW_NUMBER() OVER (ORDER BY r_cents DESC, o_custkey) AS rk
  FROM rev)
SELECT CAST(MIN(rk) AS BIGINT) AS top_customers,
       n_cust,
       ROUND(CAST(MIN(rk) AS DOUBLE) / n_cust, 6) AS customer_share,
       ROUND(CAST(MIN(cum) AS DOUBLE) / t, 6) AS revenue_share
FROM ranked, tot
WHERE cum * 5 >= t * 4
GROUP BY n_cust, t
"""


@query("pareto_customers", oracle=_PARETO_ORACLE)
def pareto_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: the smallest prefix of customers (by
    revenue, deterministic tie-break) whose cumulative revenue crosses
    80% of the total — the crossing test is INTEGER (cum*5 >= t*4), so
    no float boundary ambiguity exists. One customer-keyed aggregate,
    then rank AND running revenue from ``range_partitioned_ranks``
    (sum_col) — bucket-count/bucket-sum prefix arrays + per-bucket
    windows, so the customer-cardinality relation is never sorted on a
    single task (the r10-verdict partition-less-window fix; ranks and
    cumulative sums are bit-identical to the global window's by
    construction)."""
    from dawis_spark.operators.sketches import range_partitioned_ranks

    rev = (
        spark.table("orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("r_cents")
        )
    )
    tot = rev.agg(
        F.sum("r_cents").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("n_cust"),
    )
    ranked = range_partitioned_ranks(
        rev,
        "r_cents",
        ["o_custkey"],
        desc=True,
        out_col="rk",
        sum_col="cum",
        log_scale=True,  # revenue is heavy-tailed: linear buckets collapse
        # under a whale customer (r11 zipf rehearsal: 2.2x -> ~1x)
    )
    crossed = ranked.crossJoin(F.broadcast(tot)).filter(
        F.col("cum") * 5 >= F.col("t") * 4
    )
    return crossed.groupBy("n_cust", "t").agg(
        F.min("rk").cast("bigint").alias("top_customers"),
        F.round(F.min("rk") / F.col("n_cust"), 6).alias("customer_share"),
        F.round(F.min("cum") / F.col("t"), 6).alias("revenue_share"),
    ).select("top_customers", "n_cust", "customer_share", "revenue_share")


@query("symspell_name_matches", oracle=_FUZZY_ORACLE)
def symspell_name_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SymSpell symmetric-delete fuzzy matching — the candidate-
    generation scale path for edit distance: each distinct name emits
    its <= 2-deletion neighborhood (recall-COMPLETE for levenshtein<=2)
    and candidates are an EQUI-join on (block, variant-hash), replacing
    the catalog's quadratic self-join with fanout the distance metric
    itself induces. The oracle here is the EXHAUSTIVE all-pairs SQL
    (same as fuzzy_name_matches) — passing it proves the approximate
    candidate path loses nothing."""
    from dawis_spark.operators.dedup import symspell_pairs

    return symspell_pairs(spark.table("part"), "p_partkey", "p_name", "p_brand", 2)


_ROLLING_WAU_ORACLE = """
WITH du AS (
  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events),
expanded AS (
  SELECT d.day + to_days(CAST(off.o AS INT)) AS day, d.user_id
  FROM du d, range(0, 7) off(o)),
days AS (SELECT DISTINCT day FROM du)
SELECT e.day, CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS wau
FROM expanded e JOIN days ON e.day = days.day
GROUP BY e.day ORDER BY e.day
"""


@query("rolling_wau_7d", oracle=_ROLLING_WAU_ORACLE)
def rolling_wau_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trailing-7-day active users per day (daily WAU) — the
    rolling COUNT DISTINCT a plain window cannot express (distinct isn't
    decomposable over sliding frames). Same explode-forward shape as
    rolling_median_7d: each (day, user) observation participates in <= 7
    future windows (fixed map-side fanout of two-int rows), then one
    exact two-phase distinct per day; days outside the observed spine
    drop via the day join. The sketch form at extreme user cardinality
    is the HLL register relation (operators/sketches.py), whose
    register-max merge makes the window a rolling max — documented
    boundary, this query prices the exact form."""
    du = (
        spark.table("events")
        .select(F.date_trunc("day", "ts").alias("day"), "user_id")
        .distinct()
    )
    expanded = du.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"), "day", "user_id"
    ).select(F.expr("day + make_interval(0, 0, 0, o)").alias("day"), "user_id")
    days = du.select("day").distinct()
    return (
        expanded.join(days, "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
        .orderBy("day")
    )


def _fingerprint_exprs(table: str, cols: list[str], dialect: str) -> str:
    cast_t = "string" if dialect == "spark" else "varchar"
    sep = "chr(31)"
    joined = f"concat_ws({sep}, " + ", ".join(
        f"coalesce(cast({c} as {cast_t}), '')" for c in cols
    ) + ")"
    h = _TXT.char_hash(joined, dialect)
    return h


def _fingerprint_oracle(tables: dict[str, list[str]]) -> str:
    parts = []
    for t, cols in tables.items():
        h = _fingerprint_exprs(t, cols, "duck")
        parts.append(
            f"""
SELECT '{t}' AS table_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM({h}) % 1000000007 AS BIGINT) AS fingerprint
FROM {t}"""
        )
    return " UNION ALL ".join(parts) + " ORDER BY table_name"


_FP_TABLES = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
    "customer": ["c_custkey", "c_name", "c_nationkey"],
}


@query("table_fingerprints", oracle=_fingerprint_oracle(_FP_TABLES))
def table_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style ORDER-INDEPENDENT table fingerprints — the replica-
    reconciliation primitive: two copies of a table are content-equal
    iff (n_rows, fingerprint) agree, verified WITHOUT moving rows
    between systems (each side scans locally; only two integers travel).
    fingerprint = SUM of per-row char-hashes mod 1e9+7 — commutative, so
    partition order, shard layout, and insertion history are invisible;
    SUM(bigint < 1e9+7 each) stays exact far past 1e9 rows per table
    (DuckDB's HUGEINT sum exact always; Spark's bigint sum overflows at
    ~9e9 rows x 1e9 — the documented boundary where the mod folds into
    the partial aggregate). One scan per table, map-side partials, a
    1-row exchange each."""
    outs = []
    for t, cols in _FP_TABLES.items():
        # bind the concatenated row string ONCE per row before hashing:
        # char_hash's fold references its operand per character, so an
        # inline concat would be re-evaluated O(len) times per row (the
        # _mixed_sql expression-blowup lesson; measured 6x on orders)
        joined = "concat_ws(chr(31), " + ", ".join(
            f"coalesce(cast({c} as string), '')" for c in cols
        ) + ")"
        h = _TXT.char_hash("__s", "spark")
        outs.append(
            spark.table(t)
            .select(F.expr(joined).alias("__s"))
            .select(F.expr(h).alias("__h"))
            .agg(
                F.lit(t).alias("table_name"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                (F.sum("__h") % 1000000007).cast("bigint").alias("fingerprint"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("table_name")


_IQR_ORACLE = """
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS c FROM events),
q AS (
  SELECT event_type,
         quantile_cont(c, 0.25) AS q1_c,
         quantile_cont(c, 0.75) AS q3_c,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM v GROUP BY event_type),
f AS (
  SELECT event_type, q1_c, q3_c, n,
         q1_c - 1.5 * (q3_c - q1_c) AS lo_c,
         q3_c + 1.5 * (q3_c - q1_c) AS hi_c
  FROM q)
SELECT f.event_type, f.n,
       f.q1_c AS q1_cents, f.q3_c AS q3_cents,
       f.lo_c AS lo_fence_cents, f.hi_c AS hi_fence_cents,
       CAST(SUM(CASE WHEN v.c < f.lo_c OR v.c > f.hi_c THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM f JOIN v ON v.event_type = f.event_type
GROUP BY 1, 2, 3, 4, 5, 6 ORDER BY f.event_type
"""


@query("iqr_outlier_fences", oracle=_IQR_ORACLE)
def iqr_outlier_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR outlier fences per event type — the boxplot/DQ
    companion to the MAD anomaly family. Quartiles interpolate over
    integer cents (a + frac*(b-a) with dyadic frac — bit-exact in both
    engines); fences stay in exact dyadic cents (the rolling_median
    lesson: never divide to display and re-round). Two passes over the
    type-keyed relation (quartiles, then fence counts) — both map-side-
    partial with |types| keys; the exact-selection rank machinery is the
    single-pass alternative at extreme group counts."""
    v = spark.table("events").select(
        "event_type", F.round(F.col("value") * 100, 0).cast("bigint").alias("c")
    )
    q = v.groupBy("event_type").agg(
        F.expr("percentile(c, 0.25)").alias("q1_c"),
        F.expr("percentile(c, 0.75)").alias("q3_c"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    f = q.select(
        "event_type",
        "n",
        "q1_c",
        "q3_c",
        (F.col("q1_c") - 1.5 * (F.col("q3_c") - F.col("q1_c"))).alias("lo_c"),
        (F.col("q3_c") + 1.5 * (F.col("q3_c") - F.col("q1_c"))).alias("hi_c"),
    )
    return (
        v.join(f, "event_type")
        .groupBy("event_type", "n", "q1_c", "q3_c", "lo_c", "hi_c")
        .agg(
            F.sum(
                ((F.col("c") < F.col("lo_c")) | (F.col("c") > F.col("hi_c"))).cast(
                    "int"
                )
            )
            .cast("bigint")
            .alias("n_outliers")
        )
        .select(
            "event_type",
            "n",
            F.col("q1_c").alias("q1_cents"),
            F.col("q3_c").alias("q3_cents"),
            F.col("lo_c").alias("lo_fence_cents"),
            F.col("hi_c").alias("hi_fence_cents"),
            "n_outliers",
        )
        .orderBy("event_type")
    )


_SORTED_NBHD_ORACLE = """
WITH names AS (
  SELECT p_name AS t, CAST(COUNT(*) AS BIGINT) AS n FROM part GROUP BY 1),
ranked AS (
  SELECT t, n, ROW_NUMBER() OVER (ORDER BY reverse(t), t) AS rk FROM names),
cand AS (
  SELECT a.t AS text_a, b.t AS text_b, a.n AS n_a, b.n AS n_b
  FROM ranked a JOIN ranked b
    ON b.rk BETWEEN a.rk + 1 AND a.rk + 5)
SELECT text_a, text_b,
       CAST(levenshtein(text_a, text_b) AS INT) AS dist, n_a, n_b
FROM cand WHERE levenshtein(text_a, text_b) <= 2
ORDER BY text_a, text_b
"""


@query("sorted_neighborhood_matches", oracle=_SORTED_NBHD_ORACLE)
def sorted_neighborhood_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood entity resolution (Hernandez & Stolfo's
    merge/purge): sort the distinct-name catalog once, pair each name
    with its next 5 sort neighbors, verify with exact levenshtein — the
    third classic ER blocking strategy next to attribute blocks
    (fuzzy_name_matches) and deletion neighborhoods (symspell) —
    LINEAR candidate count (w per name) at the price of bounded recall:
    a forward sort found ZERO pairs on this catalog (all variation sits
    in the first word), so this query runs the classic SECOND pass —
    sorting by the REVERSED string, i.e. by suffix — which is where
    merge/purge gets its recall (production composes several sort
    keys). The window's rank join is expressed as an offset EXPLODE so
    no range/theta join exists: candidates come from an equi-join on
    rank. The global sort-rank itself comes from range_partitioned_ranks
    (r10-verdict fix — the catalog is entity-cardinality-sized, so a
    partition-less row_number window would single-task it at 100 TB):
    rows range-bucket on a NUMERIC proxy of the sort key — the first 7
    bytes of reverse(name) as a big-endian integer, monotone in the
    string order for single-byte (ASCII) names like this catalog's, with
    proxy ties (shared 7-byte prefix) resolved inside the bucket by the
    full (reverse(name), name) ordering — so ranks equal the global
    ORDER BY reverse(t), t by construction."""
    from dawis_spark.operators.sketches import range_partitioned_ranks

    names = (
        spark.table("part")
        .groupBy(F.col("p_name").alias("t"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .withColumn("__rev", F.reverse("t"))
    )
    # big-endian 7-byte prefix: ascii() of position i (0 past the end),
    # weighted 256^(7-i) — equal proxies always share a bucket, and the
    # proxy never inverts the ASCII string order it coarsens
    proxy = " + ".join(
        f"coalesce(ascii(substring(__rev, {i}, 1)), 0) * {256 ** (7 - i)}"
        for i in range(1, 8)
    )
    ranked = range_partitioned_ranks(
        names.withColumn("__sk", F.expr(f"cast({proxy} as bigint)")),
        "__sk",
        ["__rev", "t"],
        out_col="rk",
    ).drop("__sk", "__rev")
    probe = ranked.select(
        F.explode(F.sequence(F.lit(1), F.lit(5))).alias("o"),
        F.col("t").alias("text_a"),
        F.col("n").alias("n_a"),
        "rk",
    ).select("text_a", "n_a", (F.col("rk") + F.col("o")).alias("rk"))
    build = ranked.select(
        F.col("rk"), F.col("t").alias("text_b"), F.col("n").alias("n_b")
    )
    return (
        probe.join(build, "rk")
        .withColumn("dist", F.levenshtein("text_a", "text_b"))
        .filter(F.col("dist") <= 2)
        .select(
            "text_a", "text_b", F.col("dist").cast("int").alias("dist"), "n_a", "n_b"
        )
        .orderBy("text_a", "text_b")
    )


_WILSON_Z = 1.96  # 95% two-sided, literal — never computed at query time
_WILSON_ORACLE = f"""
WITH pe AS (
  SELECT {_ITEM_DUCK} AS item,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks
  FROM events WHERE {_ITEM_DUCK} IS NOT NULL GROUP BY 1),
s AS (
  SELECT item, views, clicks, views + clicks AS n,
         CAST(clicks AS DOUBLE) / (views + clicks) AS p,
         {_WILSON_Z} * {_WILSON_Z} AS z2
  FROM pe WHERE views + clicks >= 20)
SELECT item, views, clicks, ROUND(p, 6) AS ctr,
       ROUND((p + z2 / (2 * n)
              - {_WILSON_Z} * sqrt((p * (1 - p) + z2 / (4 * n)) / n))
             / (1 + z2 / n), 6) AS wilson_lo
FROM s ORDER BY wilson_lo DESC, item LIMIT 25
"""


@query("ctr_wilson_ranking", oracle=_WILSON_ORACLE)
def ctr_wilson_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item ranking by the WILSON score lower bound of click-through
    rate — the 'how not to sort by average rating' formula: a 95% lower
    confidence bound that pulls small-sample items down instead of
    letting 2/2 beat 180/200. Trials n = views + clicks (the two event
    streams are independent in this feed, so p = clicks/n is the
    bounded-in-[0,1] engagement share). Per-row arithmetic only
    (divisions, one IEEE sqrt, fixed order — bit-stable across engines;
    z is a literal); the data plane is one item-keyed count aggregate.
    Minimum 20 trials replayed in the oracle."""
    z = _WILSON_Z
    pe = (
        spark.table("events")
        .select(F.expr(_ITEM_SPARK).alias("item"), "event_type")
        .filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(
            F.sum((F.col("event_type") == "view").cast("int"))
            .cast("bigint")
            .alias("views"),
            F.sum((F.col("event_type") == "click").cast("int"))
            .cast("bigint")
            .alias("clicks"),
        )
        .withColumn("n", F.col("views") + F.col("clicks"))
        .filter(F.col("n") >= 20)
    )
    p = F.col("clicks") / F.col("n")
    z2 = F.lit(z * z)
    wilson = (
        p
        + z2 / (2 * F.col("n"))
        - z * F.sqrt((p * (1 - p) + z2 / (4 * F.col("n"))) / F.col("n"))
    ) / (1 + z2 / F.col("n"))
    return (
        pe.select(
            "item",
            "views",
            "clicks",
            F.round(p, 6).alias("ctr"),
            F.round(wilson, 6).alias("wilson_lo"),
        )
        .orderBy(F.desc("wilson_lo"), "item")
        .limit(25)
    )


_CUSUM_ORACLE = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2),
ref AS (
  SELECT event_type,
         CAST(SUM(v) AS BIGINT) AS tot, CAST(COUNT(*) AS BIGINT) AS nd
  FROM daily GROUP BY 1),
d AS (
  SELECT daily.event_type, day,
         20 * ref.nd * v - 21 * ref.tot AS x,
         20 * ref.tot AS h
  FROM daily JOIN ref USING (event_type)),
c AS (
  SELECT event_type, day, h,
         SUM(x) OVER (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM d),
r AS (
  SELECT event_type, day, h, cum,
         MIN(cum) OVER (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_min
  FROM c)
SELECT event_type, day,
       CAST(cum - LEAST(run_min, 0) AS BIGINT) AS cusum_scaled,
       cum - LEAST(run_min, 0) > h AS breached
FROM r ORDER BY event_type, day
"""


@query("cusum_changepoints", oracle=_CUSUM_ORACLE)
def cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM upward-shift detection per event type over daily
    totals — the sequential changepoint monitor (Page 1954). The textbook
    recursion S_t = max(0, S_{t-1} + x_t - k) is not window-expressible,
    but its CLOSED FORM is: S_t = cum_t - min(0, running_min(cum)) with
    x centered at the series mean plus slack k = 5% of the mean. All
    arithmetic is cross-multiplied INTEGER cents (x scaled by n_days so
    the mean never divides) — both engines breach on identical days.
    Shape: one daily rollup, a per-type reference row, two stacked
    windows on the (type, day) relation; output is the full monitored
    series with a breach flag (dashboards plot S_t, alerting filters it).
    Scaling: x and h are cross-multiplied by 20*nd so no mean ever
    divides — int64 end to end."""
    from pyspark.sql import Window

    daily = (
        spark.table("events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("v")
        )
    )
    ref = daily.groupBy("event_type").agg(
        F.sum("v").cast("bigint").alias("tot"),
        F.count(F.lit(1)).cast("bigint").alias("nd"),
    )
    # cross-multiplied by 20*nd so mean (tot/nd) and slack (mean/20)
    # never divide: x = 20*nd*v - 21*tot; threshold h = 20*tot (= mean
    # at the same scale). Pure int64 end to end.
    d = daily.join(ref, "event_type").select(
        "event_type",
        "day",
        (20 * F.col("nd") * F.col("v") - 21 * F.col("tot"))
        .cast("bigint")
        .alias("x"),
        (20 * F.col("tot")).cast("bigint").alias("h"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = d.withColumn("cum", F.sum("x").over(w)).withColumn(
        "run_min", F.min("cum").over(w)
    )
    return (
        c.select(
            "event_type",
            "day",
            (F.col("cum") - F.least(F.col("run_min"), F.lit(0)))
            .cast("bigint")
            .alias("cusum_scaled"),
            "h",
        )
        .select(
            "event_type",
            "day",
            "cusum_scaled",
            (F.col("cusum_scaled") > F.col("h")).alias("breached"),
        )
        .orderBy("event_type", "day")
    )


_DOW_ORACLE = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, isodow(ts) AS dow,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2, 3),
per_dow AS (
  SELECT event_type, dow, CAST(SUM(v) AS BIGINT) AS sv,
         CAST(COUNT(*) AS BIGINT) AS nd
  FROM daily GROUP BY 1, 2),
overall AS (
  SELECT event_type, CAST(SUM(v) AS BIGINT) AS tv, CAST(COUNT(*) AS BIGINT) AS td
  FROM daily GROUP BY 1)
SELECT p.event_type, CAST(p.dow AS INT) AS dow, p.nd AS n_days,
       ROUND((CAST(p.sv AS DOUBLE) / p.nd) / (CAST(o.tv AS DOUBLE) / o.td), 6)
         AS seasonality_index
FROM per_dow p JOIN overall o USING (event_type)
ORDER BY event_type, dow
"""


@query("dow_seasonality_index", oracle=_DOW_ORACLE)
def dow_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index per event type: (dow mean daily
    value) / (overall mean daily value) — the multiplicative profile the
    seasonal-MAD anomaly family consumes, here as an inspectable
    artifact. Two exact-int ratios and one division of the two (fixed
    order, bit-stable). Shape: daily rollup -> |types|x7 aggregate."""
    daily = (
        spark.table("events")
        .groupBy(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
            (F.weekday("ts") + 1).alias("dow"),  # ISO: 1=Mon..7=Sun, matches duck isodow
        )
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("v")
        )
    )
    per_dow = daily.groupBy("event_type", "dow").agg(
        F.sum("v").cast("bigint").alias("sv"),
        F.count(F.lit(1)).cast("bigint").alias("nd"),
    )
    overall = daily.groupBy("event_type").agg(
        F.sum("v").cast("bigint").alias("tv"),
        F.count(F.lit(1)).cast("bigint").alias("td"),
    )
    return (
        per_dow.join(overall, "event_type")
        .select(
            "event_type",
            F.col("dow").cast("int").alias("dow"),
            F.col("nd").alias("n_days"),
            F.round(
                (F.col("sv") / F.col("nd")) / (F.col("tv") / F.col("td")), 6
            ).alias("seasonality_index"),
        )
        .orderBy("event_type", "dow")
    )


_TTC_ORACLE = """
WITH first_signup AS (
  SELECT user_id, MIN(ts) AS t0 FROM events WHERE event_type = 'signup' GROUP BY 1),
first_purchase AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'purchase' GROUP BY 1),
lat AS (
  SELECT s.user_id,
         CAST(date_diff('second', s.t0, p.t1) AS BIGINT) AS secs
  FROM first_signup s JOIN first_purchase p USING (user_id)
  WHERE p.t1 >= s.t0)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       quantile_cont(secs, 0.25) AS p25_s,
       quantile_cont(secs, 0.50) AS p50_s,
       quantile_cont(secs, 0.90) AS p90_s,
       CAST(MAX(secs) AS BIGINT) AS max_s
FROM lat
"""


@query("time_to_conversion", oracle=_TTC_ORACLE)
def time_to_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup -> first-purchase latency distribution: exact interpolated
    percentiles over INTEGER seconds (dyadic interpolation fractions —
    bit-stable, the rolling-median discipline). Two first-event
    aggregates co-keyed on user_id, one join, one global percentile
    over converted users only."""
    e = spark.table("events")
    s = e.filter("event_type = 'signup'").groupBy("user_id").agg(
        F.min("ts").alias("t0")
    )
    p = e.filter("event_type = 'purchase'").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    lat = (
        s.join(p, "user_id")
        .filter(F.col("t1") >= F.col("t0"))
        .select(
            (F.unix_timestamp("t1") - F.unix_timestamp("t0"))
            .cast("bigint")
            .alias("secs")
        )
    )
    return lat.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.expr("percentile(secs, 0.25)").alias("p25_s"),
        F.expr("percentile(secs, 0.50)").alias("p50_s"),
        F.expr("percentile(secs, 0.90)").alias("p90_s"),
        F.max("secs").cast("bigint").alias("max_s"),
    )


_GINI_ORACLE = """
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS x
  FROM orders GROUP BY 1),
rk AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS r FROM rev),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
         SUM(CAST(r AS HUGEINT) * x) AS srx
  FROM rk)
SELECT n AS n_customers,
       ROUND(CAST(2 * srx - (n + 1) * CAST(sx AS HUGEINT) AS DOUBLE)
             / (CAST(n AS HUGEINT) * sx), 6) AS gini
FROM m
"""


@query("gini_concentration", oracle=_GINI_ORACLE)
def gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration — the summary
    statistic behind pareto_customers' cutoff view, from the rank
    formula G = (2*sum(r*x) - (n+1)*sum(x)) / (n*sum(x)) over revenue
    sorted ascending (ties by key — replayable). The numerator is exact
    integer (DECIMAL(38,0)/HUGEINT rank-weighted sums; rank*cents
    crosses int64 at sf1); one final division. Ranks come from
    range_partitioned_ranks (bucket-count exchange + per-bucket
    windows), not a partition-less window — no single-partition
    customer sort in the plan; ranks are identical by construction so
    the oracle keeps the global ROW_NUMBER form."""
    from dawis_spark.operators.sketches import range_partitioned_ranks

    rev = (
        spark.table("orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("x")
        )
    )
    rk = range_partitioned_ranks(
        rev, "x", ["o_custkey"], out_col="r", log_scale=True
    ).select("x", "r")
    m = rk.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("r").cast("decimal(38,0)") * F.col("x")).alias("srx"),
    )
    return m.select(
        F.col("n").alias("n_customers"),
        F.round(
            (2 * F.col("srx") - (F.col("n") + 1) * F.col("sx").cast("decimal(38,0)"))
            .cast("double")
            / (F.col("n").cast("decimal(38,0)") * F.col("sx")).cast("double"),
            6,
        ).alias("gini"),
    )


_NEW_RETURNING_ORACLE = """
WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events),
fs AS (SELECT user_id, MIN(day) AS first_day FROM du GROUP BY 1)
SELECT du.day,
       CAST(COUNT(*) AS BIGINT) AS active_users,
       CAST(SUM(CASE WHEN du.day = fs.first_day THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
       CAST(SUM(CASE WHEN du.day > fs.first_day THEN 1 ELSE 0 END) AS BIGINT) AS returning_users,
       ROUND(CAST(SUM(CASE WHEN du.day > fs.first_day THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 4) AS returning_share
FROM du JOIN fs USING (user_id)
GROUP BY du.day ORDER BY du.day
"""


@query("new_vs_returning_daily", oracle=_NEW_RETURNING_ORACLE)
def new_vs_returning_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning split — the standard audience report:
    first-seen day per user (one user-keyed aggregate) joined back to
    the distinct (day, user) activity relation on the same key, then a
    day-keyed rollup. Exact-int ratio, one division."""
    du = (
        spark.table("events")
        .select(F.date_trunc("day", "ts").alias("day"), "user_id")
        .distinct()
    )
    fs = du.groupBy("user_id").agg(F.min("day").alias("first_day"))
    is_new = (F.col("day") == F.col("first_day")).cast("int")
    is_ret = (F.col("day") > F.col("first_day")).cast("int")
    return (
        du.join(fs, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("active_users"),
            F.sum(is_new).cast("bigint").alias("new_users"),
            F.sum(is_ret).cast("bigint").alias("returning_users"),
            F.round(F.sum(is_ret) / F.count(F.lit(1)), 4).alias("returning_share"),
        )
        .orderBy("day")
    )


_RFM_ORACLE = """
WITH base AS (
  SELECT o_custkey,
         CAST(date_diff('day', MAX(o_orderdate),
              (SELECT MAX(o_orderdate) FROM orders)) AS BIGINT) AS recency_d,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS monetary_c
  FROM orders GROUP BY 1),
scored AS (
  SELECT o_custkey,
         ntile(3) OVER (ORDER BY recency_d ASC, o_custkey) AS r,
         ntile(3) OVER (ORDER BY frequency DESC, o_custkey) AS f,
         ntile(3) OVER (ORDER BY monetary_c DESC, o_custkey) AS m
  FROM base)
SELECT CAST(r * 100 + f * 10 + m AS INT) AS segment,
       CAST(COUNT(*) AS BIGINT) AS customers
FROM scored GROUP BY 1 ORDER BY 1
"""


@query("rfm_segments", oracle=_RFM_ORACLE)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency / frequency / monetary
    terciles (ntile(3), ties broken by key so both engines cut
    identically — best tercile is 1 on every axis), crossed into 27
    segments with counts. One customer aggregate, then three
    exact_ntile passes (range-bucketed distributed ranking — no
    partition-less windows, so no single-partition customer sorts; the
    whole-relation exchanges carry only bucket counts), then a 27-key
    rollup. Bit-identical to window ntile, oracle unchanged."""
    from dawis_spark.operators.sketches import exact_ntile

    o = spark.table("orders")
    maxd = o.agg(F.max("o_orderdate").alias("maxd"))
    base = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("monetary_c"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            "o_custkey",
            F.datediff(F.col("maxd").cast("date"), F.col("last_order").cast("date"))
            .cast("bigint")
            .alias("recency_d"),
            "frequency",
            "monetary_c",
        )
    )
    scored = exact_ntile(base, "recency_d", ["o_custkey"], 3, out_col="r")
    scored = exact_ntile(scored, "frequency", ["o_custkey"], 3, desc=True, out_col="f")
    scored = exact_ntile(
        scored, "monetary_c", ["o_custkey"], 3, desc=True, out_col="m"
    )
    scored = scored.select(
        (F.col("r") * 100 + F.col("f") * 10 + F.col("m")).cast("int").alias("segment")
    )
    return (
        scored.groupBy("segment")
        .agg(F.count(F.lit(1)).cast("bigint").alias("customers"))
        .orderBy("segment")
    )


_DWELL_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type AS src, ts,
         lead(event_type) OVER w AS dst,
         CAST(date_diff('second', ts, lead(ts) OVER w) AS BIGINT) AS gap_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT src, dst,
       CAST(COUNT(*) AS BIGINT) AS n,
       quantile_cont(gap_s, 0.5) AS median_gap_s,
       quantile_cont(gap_s, 0.9) AS p90_gap_s
FROM ordered WHERE dst IS NOT NULL
GROUP BY src, dst ORDER BY src, dst
"""


@query("transition_dwell_times", oracle=_DWELL_ORACLE)
def transition_dwell_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell-time profile per event transition — the timing companion to
    event_transitions' probabilities: exact interpolated median/p90 of
    the gap (integer seconds) between each (src -> dst) step. One user
    window (same exchange shape as the transition matrix), then a
    |types|^2-key percentile aggregate."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = spark.table("events").select("user_id", "event_type", "ts", "event_id")
    o = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
        (F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp("ts"))
        .cast("bigint")
        .alias("gap_s"),
    ).filter(F.col("dst").isNotNull())
    return (
        o.groupBy("src", "dst")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.expr("percentile(gap_s, 0.5)").alias("median_gap_s"),
            F.expr("percentile(gap_s, 0.9)").alias("p90_gap_s"),
        )
        .orderBy("src", "dst")
    )


from dawis_spark.operators import wordpiece as _wp  # noqa: E402

_WP_VOCAB_ORACLE = (
    "WITH " + _wp.vocab_oracle_ctes(48) + "\nSELECT rank, piece, freq FROM wp_vocab ORDER BY rank"
)


@query("wordpiece_vocab", oracle=_WP_VOCAB_ORACLE)
def wordpiece_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece-style vocabulary training: top-48 substrings (length
    2..5) of the word-TYPE relation weighted by corpus counts, ties
    lexicographic — the second tokenizer family member next to BPE
    (frequency-vocab + greedy apply instead of learned merges). The
    substring explosion is map-side over word types (vocabulary-sized by
    Zipf); one piece-keyed count exchange; one top-V sort."""
    return _wp.vocab_df(spark.table("documents"), "text", 48)


@query("wordpiece_segmented_corpus", oracle=_wp.segment_oracle_sql(48))
def wordpiece_segmented_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-apply WordPiece segmentation: greedy LONGEST-MATCH-
    FIRST subword counts per document under the learned 48-piece vocab
    (single chars as fallback). The sequential per-word scan is a
    bounded ``aggregate`` fold whose steps fire only at the current
    position — pure codegen string ops, no UDF; the vocab rides as a
    literal array in the scan (training is eager and driver-bounded,
    the bpe_train/kmeans pattern). Oracle replays train AND apply."""
    from dawis_spark.operators.wordpiece import segment_corpus, wordpiece_train

    d = spark.table("documents")
    vocab = [p for p, _ in wordpiece_train(d, "text", 48)]
    return segment_corpus(d, "doc_id", "text", vocab)


_HHI_ORACLE = """
WITH qs AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2),
agg AS (
  SELECT l_partkey,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         CAST(SUM(q) AS BIGINT) AS qt,
         SUM(CAST(q AS HUGEINT) * q) AS sq2
  FROM qs GROUP BY 1 HAVING COUNT(*) >= 3)
SELECT l_partkey, n_suppliers,
       ROUND(CAST(sq2 AS DOUBLE) / (CAST(qt AS HUGEINT) * qt), 6) AS hhi
FROM agg ORDER BY hhi DESC, l_partkey LIMIT 25
"""


@query("part_supplier_hhi", oracle=_HHI_ORACLE)
def part_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman supply-concentration index per part: HHI =
    sum(share^2) over each part's supplier quantity shares, computed in
    CROSS-MULTIPLIED integer form sum(q_s^2) / (sum q_s)^2 — exact
    integer numerator and denominator (HUGEINT/DECIMAL38 squares), ONE
    final division. The supply-risk screen of procurement analytics.
    Two part-keyed aggregates; top-25 most concentrated with >= 3
    suppliers, ties replayable."""
    qs = (
        spark.table("lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.round("l_quantity", 0).cast("bigint"))
            .cast("bigint")
            .alias("q")
        )
    )
    agg = (
        qs.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            F.sum("q").cast("bigint").alias("qt"),
            F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias("sq2"),
        )
        .filter(F.col("n_suppliers") >= 3)
    )
    return (
        agg.select(
            "l_partkey",
            "n_suppliers",
            F.round(
                F.col("sq2").cast("double")
                / (F.col("qt").cast("decimal(38,0)") * F.col("qt")).cast("double"),
                6,
            ).alias("hhi"),
        )
        .orderBy(F.desc("hhi"), "l_partkey")
        .limit(25)
    )


def _lexical_oracle() -> str:
    toks = _TXT.tokens("text", "duck")
    return f"""
WITH tok AS (
  SELECT source, unnest({toks}) AS token FROM documents),
tf AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS f
  FROM tok GROUP BY 1, 2)
SELECT source,
       CAST(SUM(f) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(f), 6) AS type_token_ratio,
       CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapaxes,
       ROUND(CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS hapax_share
FROM tf GROUP BY source ORDER BY source
"""


@query("lexical_richness_by_source", oracle=_lexical_oracle())
def lexical_richness_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical richness per source: type-token ratio and hapax-legomenon
    share — the vocabulary-diversity screen for template/boilerplate
    feeds (a spun-content source has low TTR; an organic one keeps
    hapaxes). One explode -> (source, token) count relation (map-side
    partials), then a source-keyed rollup; ratios are exact-int
    divisions."""
    toks = _TXT.tokens("text", "spark")
    tf = (
        spark.table("documents")
        .select("source", F.explode(F.expr(toks)).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    return (
        tf.groupBy("source")
        .agg(
            F.sum("f").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.round(F.count(F.lit(1)) / F.sum("f"), 6).alias("type_token_ratio"),
            F.sum((F.col("f") == 1).cast("int")).cast("bigint").alias("hapaxes"),
            F.round(
                F.sum((F.col("f") == 1).cast("int")) / F.count(F.lit(1)), 6
            ).alias("hapax_share"),
        )
        .orderBy("source")
    )


# Burrows' Delta stylometry: 16 English function words (the classic
# most-frequent-word channel — topic-free, so rate differences reflect
# STYLE), per-mille rates micro-scaled to exact integers.
_DELTA_WORDS = (
    "the of and a to in is it that for on with as was at by".split()
)
# z-score of a micro-rate r against the k-source population, in exact
# cleared-denominator form: z = (r - S/k) / (sqrt(k*Sxx - S^2)/k)
# = (k*r - S) / sqrt(k*Sxx - S^2) — exact integer numerator, one sqrt,
# one division, round 6; zero-variance words contribute z = 0 on both
# engines. Re-scaled to micro integers so pair sums are exact.
_DELTA_Z6 = (
    "CAST(ROUND(COALESCE("
    "  ROUND(CAST(k * r - s_r AS DOUBLE)"
    "        / nullif(SQRT(CAST(k * s_rr - s_r * s_r AS DOUBLE)), 0),"
    "        6), 0.0) * 1000000) AS BIGINT)"
)


def _delta_oracle() -> str:
    toks = _TXT.tokens("text", "duck")
    words = ", ".join(f"'{w}'" for w in _DELTA_WORDS)
    return f"""
WITH tok AS (
  SELECT source, unnest({toks}) AS token FROM documents),
totals AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS tot FROM tok GROUP BY 1),
fw AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tok WHERE token IN ({words}) GROUP BY 1, 2),
grid AS (
  SELECT t.source, w.token,
         CAST(ROUND(COALESCE(fw.cnt, 0) * 1000000000.0 / t.tot) AS BIGINT) AS r
  FROM totals t CROSS JOIN (SELECT unnest([{words}]) AS token) w
  LEFT JOIN fw ON fw.source = t.source AND fw.token = w.token),
wstats AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS k,
         SUM(CAST(r AS HUGEINT)) AS s_r,
         SUM(CAST(r AS HUGEINT) * r) AS s_rr
  FROM grid GROUP BY 1),
zs AS (
  SELECT source, token, {_DELTA_Z6} AS z6
  FROM (SELECT g.source, g.token, g.r, w.k, w.s_r, w.s_rr
        FROM grid g JOIN wstats w USING (token))),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(abs(a.z6 - b.z6)) AS BIGINT) AS s_abs
  FROM zs a JOIN zs b ON a.token = b.token AND a.source < b.source
  GROUP BY 1, 2)
SELECT source_a, source_b, n_words,
       ROUND(CAST(s_abs AS DOUBLE) / (n_words * 1000000.0), 6) AS delta
FROM pairs ORDER BY source_a, source_b
"""


@query("burrows_delta_sources", oracle=_delta_oracle())
def burrows_delta_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta stylometric distance between every source pair:
    per-mille rates of 16 topic-free English function words, z-scored
    across the source population per word, delta = mean |z_a - z_b| —
    the standard authorship/template-attribution measure (two feeds
    syndicating the same generator show near-zero delta even when
    their topics differ; MinHash only catches verbatim overlap).

    Exactness: rates are micro-scaled integers (one rounded division
    of exact counts); z-scores use the exact integer numerator
    k*r - S with one sqrt + one division, round 6, then re-scaled to
    exact micro integers so the pairwise |z_a - z_b| sums are exact;
    one final division per pair. Zero-variance words contribute 0 on
    both engines (COALESCE over the nullif'd sigma).

    Scale: ONE token explode (filtered to the 16-word channel before
    the shuffle) + a total-count rollup; everything downstream runs on
    the |sources| x 16 grid and its |sources|^2/2 pair join —
    catalog-bounded, broadcastable."""
    toks = _TXT.tokens("text", "spark")
    words_arr = ", ".join(f"'{w}'" for w in _DELTA_WORDS)
    tok = spark.table("documents").select(
        "source", F.explode(F.expr(toks)).alias("token")
    )
    totals = tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("tot")
    )
    fw = (
        tok.filter(F.col("token").isin(_DELTA_WORDS))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    wordrel = spark.sql(
        f"SELECT explode(array({words_arr})) AS token"
    )
    grid = (
        totals.crossJoin(F.broadcast(wordrel))
        .join(fw, ["source", "token"], "left")
        .selectExpr(
            "source",
            "token",
            "CAST(ROUND(COALESCE(cnt, 0) * 1000000000.0 / tot) AS BIGINT) AS r",
        )
    )
    wstats = grid.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.col("r").cast("decimal(38,0)")).alias("s_r"),
        F.sum(F.col("r").cast("decimal(38,0)") * F.col("r")).alias("s_rr"),
    )
    zs = grid.join(wstats, "token").selectExpr(
        "source", "token", f"{_DELTA_Z6} AS z6"
    )
    pairs = (
        zs.alias("a")
        .join(
            zs.alias("b"),
            (F.expr("a.token = b.token")) & (F.expr("a.source < b.source")),
        )
        .groupBy(
            F.expr("a.source").alias("source_a"),
            F.expr("b.source").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.expr("abs(a.z6 - b.z6)")).cast("bigint").alias("s_abs"),
        )
    )
    return pairs.selectExpr(
        "source_a",
        "source_b",
        "n_words",
        "ROUND(CAST(s_abs AS DOUBLE) / (n_words * 1000000.0), 6) AS delta",
    ).orderBy("source_a", "source_b")


from dawis_spark.operators import stats as _stats  # noqa: E402

_THEIL_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(date_diff('day', TIMESTAMP '2024-01-01', date_trunc('day', ts)) AS BIGINT) AS x,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
pairs AS (
  SELECT a.event_type, CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS s
  FROM daily a JOIN daily b ON a.event_type = b.event_type AND a.x < b.x),
npts AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_points FROM daily GROUP BY 1)
SELECT n.event_type, n.n_points, ROUND(quantile_cont(p.s, 0.5), 6) AS slope
FROM pairs p JOIN npts n USING (event_type)
GROUP BY 1, 2 ORDER BY 1
"""


@query("theil_sen_trends", oracle=_THEIL_ORACLE)
def theil_sen_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event type — the median-of-pairwise-
    slopes estimator (breakdown point 29%) next to trend_slopes' OLS.
    Each slope is ONE IEEE division of exact integers (cents / day
    offset) so both engines hold the identical slope multiset; the
    median picks identical order statistics. Pairing is per-series
    O(days^2) — window-bounded, never row-scale."""
    daily = (
        spark.table("events")
        .groupBy(
            "event_type",
            F.datediff(
                F.date_trunc("day", "ts").cast("date"),
                F.lit("2024-01-01").cast("date"),
            )
            .cast("bigint")
            .alias("x"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("y")
        )
    )
    return _stats.theil_sen(daily, "event_type", "x", "y")


_MW_ORACLE = """
WITH tagged AS (
  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS ia,
         CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS ib
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
per_v AS (
  SELECT v, CAST(SUM(ia) AS BIGINT) AS na_v, CAST(SUM(ib) AS BIGINT) AS nb_v
  FROM tagged GROUP BY v),
ranked AS (
  SELECT v, na_v, nb_v, na_v + nb_v AS t_v,
         COALESCE(SUM(na_v + nb_v) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM per_v),
agg AS (
  SELECT CAST(SUM(na_v) AS BIGINT) AS n_a, CAST(SUM(nb_v) AS BIGINT) AS n_b,
         SUM((2 * (before + 1) + (t_v - 1)) / 2.0 * na_v) AS r_a,
         SUM(CAST(t_v AS HUGEINT) * t_v * t_v - t_v) AS tie_cubes
  FROM ranked)
SELECT n_a, n_b,
       ROUND(r_a - (n_a * (n_a + 1)) / 2.0, 1) AS u_a,
       ROUND((r_a - (n_a * (n_a + 1)) / 2.0 - n_a * n_b / 2.0)
             / sqrt(CAST(n_a * n_b AS DOUBLE) / 12.0
                    * (CAST(n_a + n_b + 1 AS DOUBLE)
                       - CAST(tie_cubes AS DOUBLE)
                         / CAST((n_a + n_b) * (n_a + n_b - 1) AS DOUBLE))), 6) AS z
FROM agg
"""


@query("mann_whitney_drift", oracle=_MW_ORACLE)
def mann_whitney_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney rank-sum drift between the URGENT and LOW order-
    total populations — the nonparametric location test next to
    ks_price_drift's sup-distance. Average tie ranks are .5-exact
    dyadics (sums stay exact in double below 2^52), the tie-corrected
    variance is exact-integer until one sqrt — both engines produce the
    identical z. Value pre-agg first: everything past it is
    distinct-support-sized."""
    o = spark.table("orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("v_cents"),
        "o_orderpriority",
    )
    return _stats.mann_whitney(o, "v_cents", "o_orderpriority", "1-URGENT", "5-LOW")


_CHI2_ORACLE = """
WITH cells AS (
  SELECT event_type AS r, isodow(ts) AS c, CAST(COUNT(*) AS BIGINT) AS obs
  FROM events GROUP BY 1, 2),
rows_m AS (SELECT r, CAST(SUM(obs) AS BIGINT) AS row_n FROM cells GROUP BY 1),
cols_m AS (SELECT c, CAST(SUM(obs) AS BIGINT) AS col_n FROM cells GROUP BY 1),
tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells),
scored AS (
  SELECT rm.r, cm.c, CAST(COALESCE(obs, 0) AS BIGINT) AS obs, row_n, col_n, n
  FROM rows_m rm CROSS JOIN cols_m cm
  LEFT JOIN cells ON cells.r = rm.r AND cells.c = cm.c
  CROSS JOIN tot),
terms AS (
  SELECT r, c,
         CAST((CAST(obs AS HUGEINT) * n - CAST(row_n AS HUGEINT) * col_n)
              * (CAST(obs AS HUGEINT) * n - CAST(row_n AS HUGEINT) * col_n) AS DOUBLE)
         / CAST(CAST(row_n AS HUGEINT) * col_n * n AS DOUBLE) AS term
  FROM scored)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST((COUNT(DISTINCT r) - 1) * (COUNT(DISTINCT c) - 1) AS BIGINT) AS dof,
       ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(term ORDER BY r, c)), (acc, e) -> acc + e), 6) AS chi2
FROM terms
"""


@query("chi_square_independence", oracle=_CHI2_ORACLE)
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence screen for event_type x ISO-weekday —
    'does activity mix depend on the day'. Per-cell statistic is an
    exact-integer numerator (HUGEINT/DECIMAL38 cross products) paying
    ONE division; the cell sum is an ORDERED FOLD over (row, col)-sorted
    cells, so float accumulation order is part of the definition, not
    partition luck (a groupBy SUM of doubles would be). Contingency
    table is |types| x 7 — everything past the first rollup is
    cell-cardinality-sized."""
    e = spark.table("events").select(
        "event_type", (F.weekday("ts") + 1).alias("dow")
    )
    return _stats.chi_square_independence(e, "event_type", "dow")


def _jl_oracle(k: int, n_queries: int, dim: int, out_dim: int) -> str:
    from dawis_spark.operators.jl import project_expr

    cos = _VEC.cosine("q_vec", "c_vec", "duck")
    proj = project_expr("embedding", dim, out_dim, "duck")
    return f"""
WITH p AS (SELECT vec_id, {proj} AS proj FROM embeddings),
q AS (SELECT vec_id AS query_id, proj AS q_vec FROM p WHERE vec_id < {n_queries}),
c AS (SELECT vec_id AS neighbor_id, proj AS c_vec FROM p),
scored AS (
  SELECT query_id, neighbor_id, ROUND({cos}, 6) AS cosine
  FROM q, c WHERE query_id != neighbor_id)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM scored) WHERE rank <= {k}
ORDER BY query_id, rank
"""


@query("embedding_ann_jl", oracle=_jl_oracle(5, 10, 64, 16))
def embedding_ann_jl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss projected search (operators/jl.py): project
    64 -> 16 dims with the inline deterministic +-1 matrix (Achlioptas
    2003 database-friendly JL) and run the exact top-k IN THE SMALL
    SPACE — every distance costs d'/d of the original; the standard
    geometry-compressing pre-filter in front of an exact re-rank
    (contrast the code-compressing PQ/SQ8/BQ rungs). Projection is pure
    map-side codegen; both engines fold components in the same fixed
    order, so the projected vectors are bit-identical."""
    from dawis_spark.operators.jl import jl_project
    from dawis_spark.operators.similarity import brute_force_topk

    emb = spark.table("embeddings")
    p = jl_project(emb, "vec_id", "embedding", 64, 16)
    return brute_force_topk(
        corpus=p,
        queries=p.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="proj",
        k=5,
    ).orderBy("query_id", "rank")


def _ann_recall_jl_oracle(k: int) -> str:
    exact = _embedding_topk_oracle(k, 10).strip()
    jl = _jl_oracle(k, 10, 64, 16).strip()
    return f"""
WITH exact_r AS (SELECT * FROM ({exact})),
jl_r AS (SELECT * FROM ({jl}))
SELECT e.query_id,
  ROUND(CAST(COUNT(r.neighbor_id) AS DOUBLE) / {k}, 6) AS recall_jl
FROM exact_r e
LEFT JOIN jl_r r
  ON e.query_id = r.query_id AND e.neighbor_id = r.neighbor_id
GROUP BY e.query_id ORDER BY e.query_id
"""


@query("ann_recall_jl", oracle=_ann_recall_jl_oracle(5))
def ann_recall_jl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the 16-dim JL search against exact 64-dim brute
    force, per query — prices the 4x geometry compression in recall,
    the standing ANN self-eval discipline."""
    from dawis_spark.operators.jl import jl_project
    from dawis_spark.operators.similarity import brute_force_topk

    emb = spark.table("embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(
        corpus=emb, queries=qs, id_col="vec_id", vec_col="embedding", k=5
    ).select("query_id", "neighbor_id")
    p = jl_project(emb, "vec_id", "embedding", 64, 16)
    approx = brute_force_topk(
        corpus=p,
        queries=p.filter(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="proj",
        k=5,
    ).select(F.col("query_id").alias("a_qid"), F.col("neighbor_id").alias("a_nid"))
    return (
        exact.join(
            approx,
            (F.col("query_id") == F.col("a_qid"))
            & (F.col("neighbor_id") == F.col("a_nid")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.round(F.count("a_nid") / 5, 6).alias("recall_jl"))
        .orderBy("query_id")
    )


def _langid_confusion_oracle() -> str:
    inner = _lang_id_oracle().strip().replace("ORDER BY doc_id", "")
    return f"""
WITH pred AS ({inner}),
j AS (
  SELECT d.lang AS actual, p.lang_pred AS predicted
  FROM documents d JOIN pred p USING (doc_id))
SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER (PARTITION BY actual), 6) AS row_share
FROM j GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("langid_confusion_matrix", oracle=_langid_confusion_oracle())
def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the stopword-ratio language-ID heuristic
    against the corpus' ground-truth lang labels — the self-eval the
    classifier families get (ann_recall_*, classifier_auc_eval), applied
    to language_id: per (actual, predicted) counts and row-normalized
    shares. Prediction is the same map-side argmax; the rollup is
    |langs|^2-sized."""
    from pyspark.sql import Window

    from dawis_spark.operators.textstats import language_id

    pred = language_id(spark.table("documents"), "doc_id", "text").select(
        "doc_id", "lang_pred"
    )
    j = spark.table("documents").select("doc_id", F.col("lang").alias("actual")).join(
        pred, "doc_id"
    )
    rw = Window.partitionBy("actual")
    return (
        j.groupBy("actual", F.col("lang_pred").alias("predicted"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .withColumn(
            "row_share", F.round(F.col("n") / F.sum("n").over(rw), 6)
        )
        .orderBy("actual", "predicted")
    )


_PROP_Z_ORACLE = """
WITH g AS (
  SELECT CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS k1,
         CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS k2
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW'))
SELECT n1, k1, n2, k2,
       ROUND(CAST(k1 AS DOUBLE) / n1, 6) AS p1,
       ROUND(CAST(k2 AS DOUBLE) / n2, 6) AS p2,
       ROUND((CAST(k1 AS DOUBLE) / n1 - CAST(k2 AS DOUBLE) / n2)
             / sqrt((CAST(k1 + k2 AS DOUBLE) / (n1 + n2))
                    * (1 - CAST(k1 + k2 AS DOUBLE) / (n1 + n2))
                    * (1.0 / n1 + 1.0 / n2)), 6) AS z
FROM g
"""


@query("proportion_ztest", oracle=_PROP_Z_ORACLE)
def proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion pooled z-test — the A/B-testing primitive
    completing the hypothesis suite (KS location-free, Mann-Whitney
    rank, chi-square independence, this one for binary outcomes):
    'F'-status share URGENT vs LOW. One scan, one agg row, fixed-order
    IEEE arithmetic over exact counts."""
    a = F.col("o_orderpriority") == "1-URGENT"
    b = F.col("o_orderpriority") == "5-LOW"
    f = F.col("o_orderstatus") == "F"
    g = (
        spark.table("orders")
        .filter(a | b)
        .agg(
            F.sum(a.cast("int")).cast("bigint").alias("n1"),
            F.sum((a & f).cast("int")).cast("bigint").alias("k1"),
            F.sum(b.cast("int")).cast("bigint").alias("n2"),
            F.sum((b & f).cast("int")).cast("bigint").alias("k2"),
        )
    )
    p1 = F.col("k1") / F.col("n1")
    p2 = F.col("k2") / F.col("n2")
    pp = (F.col("k1") + F.col("k2")) / (F.col("n1") + F.col("n2"))
    z = (p1 - p2) / F.sqrt(
        pp * (1 - pp) * (1.0 / F.col("n1") + 1.0 / F.col("n2"))
    )
    return g.select(
        "n1",
        "k1",
        "n2",
        "k2",
        F.round(p1, 6).alias("p1"),
        F.round(p2, 6).alias("p2"),
        F.round(z, 6).alias("z"),
    )


def _kappa_oracle() -> str:
    inner = _lang_id_oracle().strip().replace("ORDER BY doc_id", "")
    return f"""
WITH pred AS ({inner}),
j AS (
  SELECT d.lang AS actual, p.lang_pred AS predicted
  FROM documents d JOIN pred p USING (doc_id)),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN actual = predicted THEN 1 ELSE 0 END) AS BIGINT) AS agree
  FROM j),
marg AS (
  SELECT SUM(CAST(a.n_a AS HUGEINT) * p.n_p) AS chance_num
  FROM (SELECT actual AS c, CAST(COUNT(*) AS BIGINT) AS n_a FROM j GROUP BY 1) a
  JOIN (SELECT predicted AS c, CAST(COUNT(*) AS BIGINT) AS n_p FROM j GROUP BY 1) p
    USING (c))
SELECT m.n, m.agree,
       ROUND(CAST(m.agree AS DOUBLE) / m.n, 6) AS accuracy,
       ROUND((CAST(m.agree AS DOUBLE) / m.n
              - CAST(marg.chance_num AS DOUBLE) / (CAST(m.n AS HUGEINT) * m.n))
             / (1 - CAST(marg.chance_num AS DOUBLE) / (CAST(m.n AS HUGEINT) * m.n)), 6)
         AS kappa
FROM m, marg
"""


@query("langid_cohens_kappa", oracle=_kappa_oracle())
def langid_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa for the language-ID heuristic against ground truth
    — chance-corrected agreement on top of langid_confusion_matrix's raw
    counts: kappa = (p_o - p_e) / (1 - p_e) with p_e from the exact
    integer marginal products (HUGEINT/DECIMAL38 — n^2 crosses int64 at
    corpus scale). One prediction scan, label-cardinality marginals."""
    from dawis_spark.operators.textstats import language_id

    pred = language_id(spark.table("documents"), "doc_id", "text").select(
        "doc_id", "lang_pred"
    )
    j = (
        spark.table("documents")
        .select("doc_id", F.col("lang").alias("actual"))
        .join(pred, "doc_id")
        .select("actual", F.col("lang_pred").alias("predicted"))
    )
    m = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("actual") == F.col("predicted")).cast("int"))
        .cast("bigint")
        .alias("agree"),
    )
    a = j.groupBy(F.col("actual").alias("c")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_a")
    )
    p = j.groupBy(F.col("predicted").alias("c")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_p")
    )
    marg = a.join(p, "c").agg(
        F.sum(F.col("n_a").cast("decimal(38,0)") * F.col("n_p")).alias("chance_num")
    )
    po = F.col("agree") / F.col("n")
    pe = F.col("chance_num").cast("double") / (
        F.col("n").cast("decimal(38,0)") * F.col("n")
    ).cast("double")
    return (
        m.crossJoin(F.broadcast(marg))
        .select(
            "n",
            "agree",
            F.round(po, 6).alias("accuracy"),
            F.round((po - pe) / (1 - pe), 6).alias("kappa"),
        )
    )


_RBO_P = 0.9
_RBO_D = 20
# (1-p) p^(d-1) / (1 - p^D) snapped to 9 digits in PYTHON once — both
# engines consume identical literals (no runtime pow)
_RBO_W = [
    round((1 - _RBO_P) * _RBO_P ** (d - 1) / (1 - _RBO_P**_RBO_D), 9)
    for d in range(1, _RBO_D + 1)
]


def _rbo_oracle() -> str:
    # reuse the RRF oracle's leg CTEs (base..sparse..dense) and swap the
    # final select for the depth-wise overlap fold
    rrf = _hybrid_rrf_oracle(_RBO_D, 60, 10)
    legs = rrf[: rrf.index("SELECT id, round(")].rstrip().rstrip(")") + ")"
    wvals = ", ".join(f"({d}, {w!r})" for d, w in enumerate(_RBO_W, start=1))
    return f"""
{legs},
m AS (
  SELECT greatest(s.sparse_rank, de.dense_rank) AS first_depth
  FROM sparse s JOIN dense de USING (id)),
w(depth, wt) AS (VALUES {wvals}),
ov AS (
  SELECT w.depth, w.wt,
         CAST((SELECT COUNT(*) FROM m WHERE m.first_depth <= w.depth) AS BIGINT) AS overlap
  FROM w)
SELECT CAST(depth AS INT) AS depth, overlap,
       ROUND(SUM(wt * overlap / depth) OVER (ORDER BY depth
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS rbo_at
FROM ov ORDER BY depth
"""


@query("rank_biased_overlap", oracle=_rbo_oracle())
def rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010) between the hybrid
    pipeline's two retrieval legs (BM25 sparse vs dense cosine, the
    exact rankings hybrid_search_rrf fuses) — the top-weighted
    ranking-similarity diagnostic that tells you WHETHER fusion has
    anything to add (RBO ~1 means the legs agree and fusion is a
    no-op). Depth weights are nine-digit Python literals (no runtime
    pow); per-depth overlaps are exact ints; the running RBO is an
    ORDERED window cumsum, so float accumulation is part of the
    definition (the chi-square discipline). Both legs are config-sized
    top-20 relations — everything here is free next to retrieval."""
    from pyspark.sql import Window

    from dawis_spark.operators.corpus import bm25_scores
    from dawis_spark.operators.similarity import brute_force_topk

    docs = spark.table("documents")
    emb = spark.table("embeddings")
    sparse = bm25_scores(docs, "doc_id", "text", list(_BM25_TERMS), top_n=_RBO_D).select(
        F.col("doc_id").alias("id"),
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("sparse_rank"),
    )
    dense = brute_force_topk(
        corpus=emb,
        queries=emb.filter(F.col("vec_id") == 0),
        id_col="vec_id",
        vec_col="embedding",
        k=_RBO_D,
    ).select(F.col("neighbor_id").alias("id"), F.col("rank").alias("dense_rank"))
    m = sparse.join(dense, "id").select(
        F.greatest("sparse_rank", "dense_rank").alias("first_depth")
    )
    w_rows = spark.createDataFrame(
        [(d, w) for d, w in enumerate(_RBO_W, start=1)], "depth int, wt double"
    )
    ov = (
        F.broadcast(w_rows)
        .join(m, F.col("first_depth") <= F.col("depth"), "left")
        .groupBy("depth", "wt")
        .agg(F.count("first_depth").cast("bigint").alias("overlap"))
    )
    run = Window.orderBy("depth").rowsBetween(Window.unboundedPreceding, 0)
    return (
        ov.withColumn(
            "rbo_at",
            F.round(
                F.sum(F.col("wt") * F.col("overlap") / F.col("depth")).over(run), 6
            ),
        )
        .select("depth", "overlap", "rbo_at")
        .orderBy("depth")
    )


def _oph_pairs_oracle(threshold: float) -> str:
    from dawis_spark.operators.oph import oph_signature

    sh = _TXT.shingle_hashes("text", _SHINGLE_K, "duck")
    sig = oph_signature("sh", _N_PERMS, "duck")
    band_key = " || ':' || ".join(
        f"CAST(sig[b * {_ROWS_PER_BAND} + {r + 1}] AS VARCHAR)"
        for r in range(_ROWS_PER_BAND)
    )
    jac = _TXT.jaccard("a.sh", "b.sh", "duck")
    slots = (
        f"list_sum(list_transform(range(1, {_N_PERMS + 1}), "
        "i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))"
    )
    return f"""
WITH hashes AS (SELECT doc_id, {sh} AS sh FROM documents),
sigs AS (SELECT doc_id, {sig} AS sig FROM hashes WHERE len(sh) > 0),
bands AS (
  SELECT doc_id, t.b AS band, {band_key} AS key
  FROM sigs, range(0, {_BANDS}) t(b)
),
cands AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
)
SELECT id_a, id_b, ROUND({jac}, 6) AS jaccard,
       CAST({slots} AS BIGINT) AS slots_eq,
       ROUND(CAST({slots} AS DOUBLE) / {_N_PERMS}, 6) AS oph_est
FROM cands JOIN hashes a ON a.doc_id = id_a JOIN hashes b ON b.doc_id = id_b
           JOIN sigs sa ON sa.doc_id = id_a JOIN sigs sb ON sb.doc_id = id_b
WHERE ROUND({jac}, 6) >= {threshold}
ORDER BY id_a, id_b
"""


@query("oph_minhash_pairs", oracle=_oph_pairs_oracle(0.2))
def oph_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-permutation-hashing near-dup pipeline (Li/Owen/Zhang 2012 +
    rotation densification, Shrivastava & Li 2014): each shingle hashed
    ONCE and binned, vs K=8 permutation passes for classic MinHash — the
    K-fold map-side saving that matters when signature hashing dominates
    corpus dedup cost. Then the identical banded-LSH candidate join and
    exact-Jaccard verification as minhash_lsh_pairs (threshold 0.2), so
    the two families are directly comparable; ``slots_eq``/``oph_est``
    carry the signature-agreement Jaccard estimate per surviving pair.

    Scale: one band-bucket self-join (the only shuffle), shuffle_hash
    verification on pair ids — corpus-sized sides never broadcast."""
    from dawis_spark.operators.oph import oph_near_duplicates

    return oph_near_duplicates(
        spark.table("documents"),
        "doc_id",
        "text",
        k_bins=_N_PERMS,
        bands=_BANDS,
        threshold=0.2,
        shingle_k=_SHINGLE_K,
    ).orderBy("id_a", "id_b")


_LSH_CURVE_ANCHOR_MOD = 25
_LSH_CURVE_ANCHOR_CAP = 500  # fixed 20-anchor eval at EVERY scale factor


def _lsh_curve_oracle() -> str:
    sh = _TXT.shingle_hashes("text", _SHINGLE_K, "duck")
    sig = (
        "["
        + ", ".join(
            _TXT.minhash_element("sh", a, b, "duck")
            for a, b in _TXT.minhash_coeffs(_N_PERMS)
        )
        + "]"
    )
    band_hit = " OR ".join(
        "("
        + " AND ".join(
            f"sa.sig[{b * _ROWS_PER_BAND + r + 1}] = sb.sig[{b * _ROWS_PER_BAND + r + 1}]"
            for r in range(_ROWS_PER_BAND)
        )
        + ")"
        for b in range(_BANDS)
    )
    inter = "len(list_intersect(a.sh, b.sh))"
    union = "len(list_distinct(list_concat(a.sh, b.sh)))"
    return f"""
WITH hashes AS (SELECT doc_id, {sh} AS sh FROM documents),
h AS (SELECT * FROM hashes WHERE len(sh) > 0),
sigs AS (SELECT doc_id, {sig} AS sig FROM h),
pairs AS (
  SELECT LEAST(CAST(10 * {inter} // {union} AS INT), 9) AS bucket,
         CASE WHEN {band_hit} THEN 1 ELSE 0 END AS hit
  FROM h a JOIN h b ON a.doc_id != b.doc_id
  JOIN sigs sa ON sa.doc_id = a.doc_id JOIN sigs sb ON sb.doc_id = b.doc_id
  WHERE a.doc_id % {_LSH_CURVE_ANCHOR_MOD} = 0 AND a.doc_id < {_LSH_CURVE_ANCHOR_CAP}
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(hit) AS BIGINT) AS n_detected,
       ROUND(CAST(SUM(hit) AS DOUBLE) / COUNT(*), 6) AS detect_rate
FROM pairs GROUP BY bucket ORDER BY bucket
"""


@query("lsh_detection_curve", oracle=_lsh_curve_oracle())
def lsh_detection_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Realized LSH S-curve: for a bounded deterministic anchor set
    (doc_id % 25 = 0, capped at id < 500 — a FIXED 20-anchor eval at
    every corpus scale), measure the fraction of anchor-candidate pairs per
    exact-Jaccard decile that the production banded MinHash (K=8, 4x2)
    would surface (>= 1 band collision, read off the signatures — no
    bucket join needed). This is the tuning diagnostic for bands/rows:
    the empirical detection probability by true similarity, the realized
    counterpart of 1-(1-s^r)^b. The decile is INTEGER (10*|∩| // |∪|),
    no float bucket boundaries.

    Scale: anchors broadcast against one corpus scan — linear, the
    ann_recall_* eval pattern, never an all-pairs join."""
    from dawis_spark.operators.dedup import _shingle_hashes_col, ensure_parallelism

    docs = ensure_parallelism(spark.table("documents"))
    h = docs.select(
        "doc_id", _shingle_hashes_col("text", _SHINGLE_K).alias("sh")
    ).filter(F.size("sh") > 0)
    elems = [
        _TXT.minhash_element("sh", a, b, "spark")
        for a, b in _TXT.minhash_coeffs(_N_PERMS)
    ]
    hs = h.select(
        "doc_id", "sh", F.expr("array(" + ", ".join(elems) + ")").alias("sig")
    )
    anchors = hs.filter(
        (F.col("doc_id") % _LSH_CURVE_ANCHOR_MOD == 0)
        & (F.col("doc_id") < _LSH_CURVE_ANCHOR_CAP)
    ).select(
        F.col("doc_id").alias("id_a"),
        F.col("sh").alias("sh_a"),
        F.col("sig").alias("sig_a"),
    )
    cands = hs.select(
        F.col("doc_id").alias("id_b"),
        F.col("sh").alias("sh_b"),
        F.col("sig").alias("sig_b"),
    )
    band_hit = " OR ".join(
        "("
        + " AND ".join(
            f"sig_a[{b * _ROWS_PER_BAND + r}] = sig_b[{b * _ROWS_PER_BAND + r}]"
            for r in range(_ROWS_PER_BAND)
        )
        + ")"
        for b in range(_BANDS)
    )
    pairs = (
        F.broadcast(anchors)
        .join(cands, F.col("id_a") != F.col("id_b"))
        .select(
            F.expr(
                "least(cast((10 * size(array_intersect(sh_a, sh_b))) div "
                "size(array_union(sh_a, sh_b)) as int), 9)"
            ).alias("bucket"),
            F.expr(f"case when {band_hit} then 1 else 0 end").alias("hit"),
        )
    )
    return (
        pairs.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("hit").cast("bigint").alias("n_detected"),
            F.round(F.sum("hit") / F.count(F.lit(1)), 6).alias("detect_rate"),
        )
        .orderBy("bucket")
    )


# Poisson(1) inverse-CDF thresholds scaled to MOD=1e9+7 (nine-digit
# literals, no runtime exp): P(X<=n) * MOD rounded, n = 0..6.
_POIS_THRESH = [367879444, 735758887, 919698609, 981011850, 996340160, 999405822, 999916766]
_BOOT_B = 64  # replicates
_BOOT_A, _BOOT_C = 1103515245, 12345  # LCG-style mix (public-domain constants)


def _bootstrap_weight_case(u_expr: str) -> str:
    branches = " ".join(
        f"WHEN {u_expr} < {t} THEN {w}" for w, t in enumerate(_POIS_THRESH)
    )
    return f"CASE {branches} ELSE {len(_POIS_THRESH)} END"


def _bootstrap_oracle() -> str:
    # Reduce before multiplying: (key % MOD) * A < 1e9 * 1.2e9 ~ 1.2e18 stays
    # inside int64 even at 100 TB keys, where A * (key*64+b) would wrap in
    # Spark and raise out-of-range in DuckDB (engine-parity break).
    u = f"(((o_orderkey * {_BOOT_B} + t.b) % {_TXT.MOD}) * {_BOOT_A} + {_BOOT_C}) % {_TXT.MOD}"
    w = _bootstrap_weight_case(f"(({u}))")
    return f"""
WITH base AS (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders),
expanded AS (
  SELECT t.b AS b, {w} AS w, cents
  FROM base, range(0, {_BOOT_B}) t(b)),
reps AS (
  SELECT b, CAST(SUM(w * cents) AS BIGINT) AS num, CAST(SUM(w) AS BIGINT) AS den
  FROM expanded GROUP BY b),
ranked AS (
  SELECT b, num, den,
         ROW_NUMBER() OVER (ORDER BY CAST(num AS DOUBLE) / den, b) AS rk
  FROM reps),
point AS (
  SELECT ROUND(CAST(SUM(cents) AS DOUBLE) / COUNT(*), 6) AS point_cents FROM base)
SELECT point_cents,
       ROUND(MIN(CASE WHEN rk = 2 THEN CAST(num AS DOUBLE) / den END), 6) AS ci_lo_cents,
       ROUND(MIN(CASE WHEN rk = {_BOOT_B - 1} THEN CAST(num AS DOUBLE) / den END), 6) AS ci_hi_cents,
       CAST({_BOOT_B} AS BIGINT) AS n_replicates
FROM ranked, point GROUP BY point_cents
"""


@query("bootstrap_ci_order_value", oracle=_bootstrap_oracle())
def bootstrap_ci_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson bootstrap (the distributed bootstrap of
    Chamandy et al. / Kleiner-style resampling): each order contributes
    to replicate b with weight ~ Poisson(1), drawn by inverse-CDF over a
    hash-uniform integer — fully deterministic and engine-identical, no
    RNG state. B=64 replicate means of order value; the 95% CI is the
    nearest-rank 2.5%/97.5% selection over the replicates (ranks 2 and
    63), point estimate alongside.

    Scale: a fixed x64 map-side fanout of (b, w, cents) rows into a
    64-group partial aggregate — the shuffle carries 64 rows per
    partition regardless of data size. The replicate ranking is over 64
    rows on one reducer. This is THE cluster-friendly bootstrap: no
    per-replicate resample materialization, no driver loop."""
    b = spark.table("orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    u = f"(((o_orderkey * {_BOOT_B} + b) % {_TXT.MOD}) * {_BOOT_A} + {_BOOT_C}) % {_TXT.MOD}"
    expanded = b.select(
        "o_orderkey",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    ).select(
        F.col("b"),
        F.expr(_bootstrap_weight_case(f"(({u}))")).alias("w"),
        "cents",
    )
    reps = expanded.groupBy("b").agg(
        F.sum(F.col("w") * F.col("cents")).cast("bigint").alias("num"),
        F.sum("w").cast("bigint").alias("den"),
    )
    from pyspark.sql import Window

    ranked = reps.select(
        "b",
        "num",
        "den",
        F.row_number()
        .over(Window.orderBy(F.col("num").cast("double") / F.col("den"), F.col("b")))
        .alias("rk"),
    )
    point = b.agg(
        F.round(F.sum("cents").cast("double") / F.count(F.lit(1)), 6).alias(
            "point_cents"
        )
    )
    ci = ranked.groupBy().agg(
        F.round(
            F.min(
                F.when(F.col("rk") == 2, F.col("num").cast("double") / F.col("den"))
            ),
            6,
        ).alias("ci_lo_cents"),
        F.round(
            F.min(
                F.when(
                    F.col("rk") == _BOOT_B - 1,
                    F.col("num").cast("double") / F.col("den"),
                )
            ),
            6,
        ).alias("ci_hi_cents"),
    )
    return point.crossJoin(ci).select(
        "point_cents",
        "ci_lo_cents",
        "ci_hi_cents",
        F.lit(_BOOT_B).cast("bigint").alias("n_replicates"),
    )


_SKYLINE_ORACLE = """
WITH p AS (
  SELECT p_partkey, CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS p_size
  FROM part),
w AS (
  SELECT p_partkey, price_cents, p_size,
         MAX(p_size) OVER (ORDER BY price_cents
             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_cheaper,
         MAX(p_size) OVER (PARTITION BY price_cents) AS best_same_price
  FROM p)
SELECT p_partkey, price_cents, p_size
FROM w
WHERE (best_cheaper IS NULL OR p_size > best_cheaper)
  AND p_size = best_same_price
ORDER BY price_cents, p_partkey
"""


@query("pareto_frontier_parts", oracle=_SKYLINE_ORACLE)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of parts: minimize retail price,
    maximize size — the rows no other part dominates (<= price AND
    >= size, one strict). The textbook definition is a quadratic NOT
    EXISTS self-join; the sort-based rewrite here is O(n log n): order
    by price, then a part survives iff its size beats the running max
    over all STRICTLY cheaper parts and it attains the max within its
    own price tie-group. tests/test_round8_ops.py cross-checks this
    rewrite against the quadratic definition at sf0.001.

    Scale: the running max is TWO-LEVEL (the range_partitioned_ranks
    discipline, r10-verdict fix — the previous partition-less range
    window moved every part to one task): range-bucket by price (equal
    prices never straddle buckets, so 'strictly cheaper within bucket'
    is a partitioned range frame), per-bucket maxima prefix-combined in
    one <=1024-struct array (broadcast), best_cheaper = greatest(earlier
    buckets' prefix max, within-bucket running max). Domination tests
    are exact integer comparisons (price in cents)."""
    from pyspark.sql import Window

    p = spark.table("part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100, 0).cast("bigint").alias("price_cents"),
        F.col("p_size").cast("bigint").alias("p_size"),
    )
    nb = 1024
    stats = p.agg(
        F.min("price_cents").alias("__lo"), F.max("price_cents").alias("__hi")
    )
    pos = (
        "((cast(price_cents as double) - cast(__lo as double)) /"
        " (cast(__hi as double) - cast(__lo as double)))"
    )
    bexpr = (
        f"case when __hi = __lo then 0 else least({nb - 1}, "
        f"greatest(0, cast(floor({pos} * {nb}) as int))) end"
    )
    # feeds both the per-bucket maxima and the final windows; persist()
    # avoids recomputing the scan per branch (row-scale footprint —
    # released by the harness's per-query clearCache)
    bucketed = (
        p.crossJoin(F.broadcast(stats)).withColumn("__b", F.expr(bexpr)).persist()
    )
    prefmax = (
        bucketed.groupBy("__b")
        .agg(F.max("p_size").alias("__bm"))
        .agg(F.sort_array(F.collect_list(F.struct("__b", "__bm"))).alias("__a"))
        .select(
            F.explode(
                F.expr(
                    "transform(__a, (s, i) -> struct(s.__b AS __b, "
                    "aggregate(slice(__a, 1, i), cast(null as bigint), "
                    "(acc, x) -> greatest(acc, x.__bm)) AS __pm))"
                )
            ).alias("__s")
        )
        .select(F.col("__s.__b").alias("__b"), F.col("__s.__pm").alias("__pm"))
    )
    cheaper = (
        Window.partitionBy("__b")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    same = Window.partitionBy("price_cents")
    w = bucketed.join(F.broadcast(prefmax), "__b").select(
        "p_partkey",
        "price_cents",
        "p_size",
        F.greatest(F.max("p_size").over(cheaper), F.col("__pm")).alias(
            "best_cheaper"
        ),
        F.max("p_size").over(same).alias("best_same_price"),
    )
    return (
        w.filter(
            (F.col("best_cheaper").isNull() | (F.col("p_size") > F.col("best_cheaper")))
            & (F.col("p_size") == F.col("best_same_price"))
        )
        .select("p_partkey", "price_cents", "p_size")
        .orderBy("price_cents", "p_partkey")
    )


_EWMA_W = 16  # truncation window: weights 2^(W-1-j) for lag j — exact dyadic


def _ewma_oracle() -> str:
    return f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2),
ref AS (
  SELECT event_type, CAST(SUM(v) AS BIGINT) AS tot, CAST(COUNT(*) AS BIGINT) AS nd
  FROM daily GROUP BY 1),
expanded AS (
  SELECT event_type, day + to_days(CAST(t.o AS INT)) AS day,
         v * (1::BIGINT << ({_EWMA_W} - 1 - t.o)) AS wv,
         (1::BIGINT << ({_EWMA_W} - 1 - t.o)) AS w
  FROM daily, range(0, {_EWMA_W}) t(o)),
sm AS (
  SELECT e.event_type, e.day,
         CAST(SUM(e.wv) AS BIGINT) AS num, CAST(SUM(e.w) AS BIGINT) AS den
  FROM expanded e JOIN daily d ON d.event_type = e.event_type AND d.day = e.day
  GROUP BY e.event_type, e.day)
SELECT sm.event_type, sm.day,
       ROUND(CAST(num AS DOUBLE) / den, 6) AS ewma_cents,
       num * nd * 4 > tot * den * 7 AS breached
FROM sm JOIN ref ON ref.event_type = sm.event_type
ORDER BY sm.event_type, sm.day
"""


@query("ewma_daily_smoothing", oracle=_ewma_oracle())
def ewma_daily_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart over daily event totals — the third classic
    SPC monitor beside the MAD band and CUSUM: lambda = 1/2 with a
    16-term truncation, so the weights 2^(W-1-j) are EXACT dyadic
    integers and the smoothed value is one rational num/den per day
    (missing days shrink the denominator — the standard irregular-series
    EWMA renormalization). The recursion is rewritten as the same
    explode-fanout the exact rolling median uses: each daily total
    fans out to the <= 16 future days it weights (map-side, hash-only
    rows), then one (type, day) aggregate — window-free and exact, where
    the textbook recursive form would need a sequential fold. Breach
    flag (EWMA > 1.75x the per-type grand mean) is an exact integer
    cross-multiplication, no float boundary.

    Scale: fixed x16 fanout of narrow rows into a partial-aggregated
    (type, day) groupBy — linear, no window over unbounded history."""
    daily = (
        spark.table("events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("v")
        )
    )
    ref = daily.groupBy("event_type").agg(
        F.sum("v").cast("bigint").alias("tot"),
        F.count(F.lit(1)).cast("bigint").alias("nd"),
    )
    expanded = daily.select(
        "event_type",
        F.explode(F.sequence(F.lit(0), F.lit(_EWMA_W - 1))).alias("o"),
        "day",
        "v",
    ).select(
        "event_type",
        F.expr("day + make_interval(0, 0, 0, o)").alias("day"),
        F.expr(f"v * shiftleft(cast(1 as bigint), {_EWMA_W} - 1 - o)").alias("wv"),
        F.expr(f"shiftleft(cast(1 as bigint), {_EWMA_W} - 1 - o)").alias("w"),
    )
    observed = daily.select("event_type", "day")
    sm = (
        expanded.join(observed, ["event_type", "day"])
        .groupBy("event_type", "day")
        .agg(
            F.sum("wv").cast("bigint").alias("num"),
            F.sum("w").cast("bigint").alias("den"),
        )
    )
    return (
        sm.join(F.broadcast(ref), "event_type")
        .select(
            "event_type",
            "day",
            F.round(F.col("num").cast("double") / F.col("den"), 6).alias("ewma_cents"),
            (F.col("num") * F.col("nd") * 4 > F.col("tot") * F.col("den") * 7).alias(
                "breached"
            ),
        )
        .orderBy("event_type", "day")
    )


_NEG_K = 4
_NEG_ANCHOR_MOD = 25
_NEG_POOL = 256  # global candidate pool size (the bounded side)
_NEG_A1, _NEG_A2 = 2654435761, 40503  # Knuth multiplicative constants


def _contrastive_oracle() -> str:
    # doc_id is reduced mod MOD before the Knuth multiply: A1 * (MOD-1)
    # ~ 2.7e18 < 2^63, whereas A1 * doc_id wraps for doc_id >~ 3.4e9
    # (plausible at 100 TB) — silent in Spark, an error in DuckDB.
    g = f"({_NEG_A2} * (doc_id % {_TXT.MOD})) % {_TXT.MOD}"
    h = (
        f"({_NEG_A1} * (a.doc_id % {_TXT.MOD}) "
        f"+ {_NEG_A2} * (c.neg_id % {_TXT.MOD})) % {_TXT.MOD}"
    )
    return f"""
WITH pool AS (
  SELECT doc_id AS neg_id, source AS src_c
  FROM documents ORDER BY {g}, doc_id LIMIT {_NEG_POOL}),
ranked AS (
  SELECT a.doc_id AS anchor_id, c.neg_id,
         CAST({h} AS BIGINT) AS pair_hash,
         ROW_NUMBER() OVER (PARTITION BY a.doc_id ORDER BY {h}, c.neg_id) AS rk
  FROM documents a JOIN pool c
    ON a.source != c.src_c AND a.doc_id % {_NEG_ANCHOR_MOD} = 0
)
SELECT anchor_id, neg_id, pair_hash, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {_NEG_K}
ORDER BY anchor_id, rk
"""


@query("contrastive_negative_pairs", oracle=_contrastive_oracle())
def contrastive_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for each
    anchor document (deterministic class doc_id % 25 = 0), pick k=4
    pseudo-random negatives from OTHER sources, ranked by an integer
    pair hash — reproducible across runs, engines and cluster sizes (the
    property in-batch random negatives lack). Negatives come from a
    GLOBAL 256-candidate pool (the shared negative-pool pattern of
    in-batch contrastive training), itself picked deterministically by
    a candidate hash; cross-source exclusion is the cheap hard-negative
    hygiene filter (same-source near-dups make false negatives).

    Scale: the pool is TakeOrdered-bounded (256 rows — r12 fix: the
    earlier anchors x ALL-cross-source join was quadratic, 126x for 10x
    data in the full-inventory sf1 bench), so the anchor x pool fanout
    is a broadcast-fed 256x map-side expansion and the per-anchor top-k
    window is anchor-partitioned. Linear in the corpus at any scale."""
    from pyspark.sql import Window

    docs = spark.table("documents")
    anchors = docs.filter(F.col("doc_id") % _NEG_ANCHOR_MOD == 0).select(
        F.col("doc_id").alias("anchor_id"), F.col("source").alias("src_a")
    )
    g = F.expr(f"({_NEG_A2} * (doc_id % {_TXT.MOD})) % {_TXT.MOD}")
    pool = (
        docs.select(
            F.col("doc_id").alias("neg_id"),
            F.col("source").alias("src_c"),
            g.alias("__g"),
        )
        .orderBy("__g", "neg_id")
        .limit(_NEG_POOL)
        .drop("__g")
    )
    h = F.expr(
        f"({_NEG_A1} * (anchor_id % {_TXT.MOD}) "
        f"+ {_NEG_A2} * (neg_id % {_TXT.MOD})) % {_TXT.MOD}"
    )
    ranked = (
        anchors.join(F.broadcast(pool), F.col("src_a") != F.col("src_c"))
        .select("anchor_id", "neg_id", h.cast("bigint").alias("pair_hash"))
        .withColumn(
            "rk",
            F.row_number()
            .over(
                Window.partitionBy("anchor_id").orderBy("pair_hash", "neg_id")
            )
            .cast("bigint"),
        )
        .filter(F.col("rk") <= _NEG_K)
    )
    return ranked.select("anchor_id", "neg_id", "pair_hash", "rk").orderBy(
        "anchor_id", "rk"
    )


def _ppr_oracle(iterations: int, top_n: int, seed_nation: int) -> str:
    from dawis_spark.operators.graph import ppr_oracle_ctes

    return f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
),
seeds AS (
  SELECT c_custkey * 2 AS node FROM customer WHERE c_nationkey = {seed_nation}
),
{ppr_oracle_ctes('edges', 'seeds', iterations)}
SELECT node, rank_scaled,
       round(CAST(rank_scaled AS DOUBLE) / 1e12, 6) AS rank
FROM ppr
WHERE rank_scaled > 0
ORDER BY rank_scaled DESC, node
LIMIT {top_n}
"""


_PPR_SEED_NATION = 3


@query("personalized_pagerank", oracle=_ppr_oracle(3, 20, _PPR_SEED_NATION))
def personalized_pagerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (Haveliwala 2002) over the symmetrized
    customer↔supplier trade graph, seeded on one nation's customers —
    rank mass initializes on and teleports back to the seed set, so the
    top nodes are the suppliers (and fellow customers) CLOSEST to that
    nation's buying activity: seed-expanded discovery, the recommender /
    audience-expansion primitive plain PageRank can't express.

    Scale: identical per-iteration shape to pagerank_top_nodes (one
    edges⋈ranks shuffle + one groupBy(dst), edge-count-bound); the seed
    relation is customer-count-bounded and broadcast into the rank
    rebuild. Exact scaled-int64 arithmetic — DuckDB replays all three
    iterations bit-for-bit (operators/graph.py:ppr_oracle_ctes)."""
    from dawis_spark.operators.graph import personalized_pagerank

    pairs = (
        spark.table("lineitem")
        .join(spark.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .unionAll(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
        .persist()
    )
    seeds = (
        spark.table("customer")
        .filter(F.col("c_nationkey") == _PPR_SEED_NATION)
        .select((F.col("c_custkey") * 2).alias("node"))
    )
    return (
        personalized_pagerank(edges, seeds, iterations=3)
        .filter(F.col("rank_scaled") > 0)
        .select(
            "node",
            "rank_scaled",
            F.round(F.col("rank_scaled").cast("double") / 1e12, 6).alias("rank"),
        )
        .orderBy(F.desc("rank_scaled"), F.asc("node"))
        .limit(20)
    )


def _hits_oracle(iterations: int, top_n: int) -> str:
    from dawis_spark.operators.graph import hits_oracle_ctes

    return f"""
WITH edges AS (
  SELECT DISTINCT o_custkey AS src, l_suppkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
{hits_oracle_ctes('edges', iterations)},
top_a AS (
  SELECT 'authority' AS role, node, auth_scaled AS score_scaled
  FROM ht_out ORDER BY auth_scaled DESC, node LIMIT {top_n}),
top_h AS (
  SELECT 'hub' AS role, node, hub_scaled AS score_scaled
  FROM ht_out ORDER BY hub_scaled DESC, node LIMIT {top_n})
SELECT role, node, score_scaled FROM top_a
UNION ALL
SELECT role, node, score_scaled FROM top_h
ORDER BY role, score_scaled DESC, node
"""


@query("hits_hub_authority", oracle=_hits_oracle(2, 15))
def hits_hub_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999) on the DIRECTED customer →
    supplier purchase graph: suppliers score as authorities (bought by
    the strongest hub customers), customers as hubs (buying from the
    strongest authorities) — the mutually-reinforcing centrality pair
    PageRank's single score conflates. L2 normalization is replaced by
    exact integer MAX-rescaling per half-step (ranking-invariant), so
    the whole trajectory is partition-order independent and DuckDB
    replays it (operators/graph.py:hits_oracle_ctes). Top 15 of each
    role, one relation out.

    Scale: per half-step one edges⋈scores shuffle join + groupBy —
    edge-count-bound, node-count side tables, max-rescale broadcasts a
    single row. Overflow bound documented in operators/graph.py (lower
    HITS_SCALE one decade per decade of edges past ~9e6)."""
    from dawis_spark.operators.graph import hits

    edges = (
        spark.table("lineitem")
        .join(spark.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .distinct()
        .persist()
    )
    out = hits(edges, iterations=2)
    top_a = (
        out.select(F.lit("authority").alias("role"), "node", F.col("auth_scaled").alias("score_scaled"))
        .orderBy(F.desc("score_scaled"), "node")
        .limit(15)
    )
    top_h = (
        out.select(F.lit("hub").alias("role"), "node", F.col("hub_scaled").alias("score_scaled"))
        .orderBy(F.desc("score_scaled"), "node")
        .limit(15)
    )
    return top_a.unionAll(top_h).orderBy("role", F.desc("score_scaled"), "node")


_MARKOV_TEST_DAYS = 7


def _markov_acc_oracle() -> str:
    return f"""
WITH {_WG_CTES},
mx AS (SELECT date_trunc('day', MAX(ts)) AS max_day FROM kept_events),
seq AS (
  SELECT user_id, ts, event_id, event_type AS cur,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM kept_events),
pairs AS (
  SELECT cur, nxt,
         date_trunc('day', ts) >= max_day - INTERVAL {_MARKOV_TEST_DAYS} DAY AS is_test
  FROM seq, mx WHERE nxt IS NOT NULL),
train AS (
  SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS c FROM pairs
  WHERE NOT is_test GROUP BY cur, nxt),
pred AS (
  SELECT cur, nxt AS predicted_next FROM (
    SELECT cur, nxt, ROW_NUMBER() OVER (PARTITION BY cur ORDER BY c DESC, nxt) AS rk
    FROM train) t WHERE rk = 1),
test AS (SELECT cur, nxt FROM pairs WHERE is_test),
acc AS (
  SELECT t.cur AS event_type, p.predicted_next,
         CAST(COUNT(*) AS BIGINT) AS n_test,
         CAST(SUM(CASE WHEN t.nxt = p.predicted_next THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
         ROUND(CAST(SUM(CASE WHEN t.nxt = p.predicted_next THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*), 6) AS accuracy
  FROM test t JOIN pred p ON t.cur = p.cur
  GROUP BY t.cur, p.predicted_next)
SELECT q.event_type, q.predicted_next, q.n_test, q.n_correct, q.accuracy,
       wg_nw.n_whales
FROM wg_nw LEFT JOIN acc q ON TRUE
ORDER BY q.event_type
"""


@query("markov_next_event_accuracy", oracle=_markov_acc_oracle())
def markov_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-holdout self-eval of the first-order Markov transition
    model (event_transitions): train argmax-next-type on all transition
    pairs except the last 7 days, then measure top-1 next-event
    accuracy on the held-out tail — the eval that says whether the
    transition matrix actually predicts, per current event type. Split,
    argmax (deterministic tie-break) and accuracy are all exact; the
    7-day boundary is data-derived (global max day), so the query is
    scale-portable.

    Scale: one user-keyed window pass to form consecutive pairs (the
    event_transitions shuffle), a type×type-sized training aggregate,
    and a broadcast of the |types|-row prediction map onto the test
    aggregate. Nothing new shuffles beyond the pair formation.

    Guarded: whale users (> 0.8% of all events, _WHALE_SHARE) are
    excluded before the pair window (and from the holdout boundary);
    n_whales audits the exclusion."""
    from pyspark.sql import Window

    ev, nw = _guarded_events(spark)
    mx = ev.agg(F.date_trunc("day", F.max("ts")).alias("max_day"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    pairs = seq.crossJoin(F.broadcast(mx)).select(
        "cur",
        "nxt",
        (
            F.date_trunc("day", F.col("ts"))
            >= F.col("max_day") - F.expr(f"INTERVAL {_MARKOV_TEST_DAYS} DAY")
        ).alias("is_test"),
    )
    train = (
        pairs.filter(~F.col("is_test"))
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    pw = Window.partitionBy("cur").orderBy(F.desc("c"), "nxt")
    pred = (
        train.withColumn("rk", F.row_number().over(pw))
        .filter(F.col("rk") == 1)
        .select("cur", F.col("nxt").alias("predicted_next"))
    )
    test = pairs.filter(F.col("is_test")).select("cur", "nxt")
    acc = (
        test.join(F.broadcast(pred), "cur")
        .groupBy(F.col("cur").alias("event_type"), "predicted_next")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum((F.col("nxt") == F.col("predicted_next")).cast("int"))
            .cast("bigint")
            .alias("n_correct"),
            F.round(
                F.sum((F.col("nxt") == F.col("predicted_next")).cast("int"))
                / F.count(F.lit(1)),
                6,
            ).alias("accuracy"),
        )
    )
    return _with_whale_audit(acc, nw).orderBy("event_type")


def _stl_oracle() -> str:
    return """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2),
expanded AS (
  SELECT event_type, day + to_days(CAST(t.o AS INT)) AS day, v
  FROM daily, range(-3, 4) t(o)),
trend AS (
  SELECT e.event_type, e.day,
         CAST(SUM(e.v) AS BIGINT) AS num, CAST(COUNT(*) AS BIGINT) AS k
  FROM expanded e JOIN daily d ON d.event_type = e.event_type AND d.day = e.day
  GROUP BY e.event_type, e.day),
det AS (
  SELECT d.event_type, d.day, dayofweek(d.day) AS dow,
         ROUND(CAST(t.num AS DOUBLE) / t.k, 6) AS trend_cents,
         ROUND(d.v - CAST(t.num AS DOUBLE) / t.k, 6) AS detrended
  FROM daily d JOIN trend t ON t.event_type = d.event_type AND t.day = d.day
  WHERE t.k = 7),
seas AS (
  SELECT event_type, dow, ROUND(AVG(detrended), 6) AS seasonal_cents
  FROM det GROUP BY 1, 2)
SELECT det.event_type, det.day, trend_cents, seasonal_cents,
       ROUND(detrended - seasonal_cents, 6) AS residual_cents
FROM det JOIN seas ON seas.event_type = det.event_type AND seas.dow = det.dow
ORDER BY det.event_type, det.day
"""


@query("stl_decomposition_daily", oracle=_stl_oracle())
def stl_decomposition_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite seasonal-trend decomposition of daily event totals:
    trend = centered 7-day moving average (rows with all 7 neighbors
    observed — the warm-up/cool-down rule), seasonal = per-day-of-week
    mean of the detrended series, residual = the rest. The additive
    classical decomposition (Cleveland's STL with loess swapped for the
    moving-average smoother it generalizes) — what the seasonal-MAD
    anomaly family assumes, made explicit as its own operator.

    The 7-day window is the rolling-median explode-fanout (each daily
    total fans to the ±3 days it smooths, hash-only rows, one (type,
    day) aggregate) — no unbounded window. Sums are exact integer cents
    up to the final divisions (ROUND..6, both engines).

    Scale: fixed x7 fanout into a partial-aggregated groupBy, a
    |types|x7-row seasonal aggregate broadcast back. Linear, two small
    shuffles."""
    daily = (
        spark.table("events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("v")
        )
    )
    expanded = daily.select(
        "event_type",
        F.explode(F.sequence(F.lit(-3), F.lit(3))).alias("o"),
        "day",
        "v",
    ).select(
        "event_type",
        F.expr("day + make_interval(0, 0, 0, o)").alias("day"),
        "v",
    )
    trend = (
        expanded.join(daily.select("event_type", "day"), ["event_type", "day"])
        .groupBy("event_type", "day")
        .agg(
            F.sum("v").cast("bigint").alias("num"),
            F.count(F.lit(1)).cast("bigint").alias("k"),
        )
        .filter(F.col("k") == 7)
    )
    det = daily.join(trend, ["event_type", "day"]).select(
        "event_type",
        "day",
        F.dayofweek("day").alias("dow"),
        F.round(F.col("num").cast("double") / F.col("k"), 6).alias("trend_cents"),
        F.round(F.col("v") - F.col("num").cast("double") / F.col("k"), 6).alias(
            "detrended"
        ),
    )
    seas = det.groupBy("event_type", "dow").agg(
        F.round(F.avg("detrended"), 6).alias("seasonal_cents")
    )
    return (
        det.join(F.broadcast(seas), ["event_type", "dow"])
        .select(
            "event_type",
            "day",
            "trend_cents",
            "seasonal_cents",
            F.round(F.col("detrended") - F.col("seasonal_cents"), 6).alias(
                "residual_cents"
            ),
        )
        .orderBy("event_type", "day")
    )


def _calibration_oracle(dim: int, iters: int, lr: float) -> str:
    dot = _VEC.dot("xs", "wl", "duck")
    return f"""
WITH {_logreg_chain_ctes(dim, iters, lr, _LOGREG_SAMPLE_LIMIT)},
wlF AS (SELECT list(weight ORDER BY dim) AS wl FROM w{iters}),
scF AS MATERIALIZED (
  SELECT CAST(v.y AS INT) AS y,
         round(1.0 / (1.0 + exp(-(round({dot}, 6)))), 6) AS p
  FROM v, wlF)
SELECT LEAST(CAST(FLOOR(p * 10) AS INT), 9) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(p), 6) AS mean_predicted,
       ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS empirical_rate
FROM scF GROUP BY 1 ORDER BY 1
"""


@query("classifier_calibration_curve", oracle=_calibration_oracle(64, 3, 1.0))
def classifier_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the trained logistic quality classifier:
    sigmoid scores bucketed into deciles (FLOOR both engines — no
    truncate-vs-round cast trap), mean predicted probability vs
    empirical positive rate per bucket — the calibration eval that AUC
    (ranking-only) cannot see; a quality-gate threshold is only
    meaningful if these two track. Training replays the exact
    logreg_weights trajectory (same params), scoring is the same
    round-6 margin fold.

    Scale: training shared via _trained_logreg_w (bounded-sample,
    memoized — no retrain); the curve itself is one scan with a
    10-group aggregate."""
    from dawis_spark.operators.logreg import margin_expr

    emb = spark.table("embeddings")
    w = _trained_logreg_w(spark, sf_dir)
    p = f"round(1.0 / (1.0 + exp(-({margin_expr('embedding', w)}))), 6)"
    scored = emb.select(
        F.expr(f"cast({_LOGREG_Y_SPARK} as int)").alias("y"),
        F.expr(p).alias("p"),
    )
    return (
        scored.select(
            F.expr("least(cast(floor(p * 10) as int), 9)").alias("bucket"),
            "y",
            "p",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.avg("p"), 6).alias("mean_predicted"),
            F.round(F.sum("y") / F.count(F.lit(1)), 6).alias("empirical_rate"),
        )
        .orderBy("bucket")
    )


def _affinity_oracle(dim: int) -> str:
    return f"""
WITH de AS (
  SELECT d.source, u.pos AS dim,
         CAST(ROUND(CAST(e.embedding[u.pos] AS DOUBLE) * 1000000, 0) AS BIGINT) AS xm
  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id,
       unnest(range(1, {dim + 1})) u(pos)),
cent AS (
  SELECT source, dim,
         CAST(SUM(xm) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS c
  FROM de GROUP BY source, dim),
norms AS (
  SELECT source, CAST(SUM(c * c) AS BIGINT) AS n2 FROM cent GROUP BY source),
dots AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(SUM(a.c * b.c) AS BIGINT) AS dot
  FROM cent a JOIN cent b ON a.dim = b.dim AND a.source < b.source
  GROUP BY a.source, b.source)
SELECT source_a, source_b,
       ROUND(dot / (SQRT(CAST(na.n2 AS DOUBLE)) * SQRT(CAST(nb.n2 AS DOUBLE))), 6)
         AS cosine
FROM dots JOIN norms na ON na.source = source_a
          JOIN norms nb ON nb.source = source_b
ORDER BY source_a, source_b
"""


@query("source_embedding_affinity", oracle=_affinity_oracle(64))
def source_embedding_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine affinity between per-source embedding centroids —
    the corpus-mixture diagnostic (which sources are semantically
    redundant, which add diversity) that drives mixture reweighting
    decisions. Centroids are EXACT: micro-unit integer dimensions,
    integer sums, one integer division per (source, dim); cosine is one
    final double division (sqrt is IEEE-correctly-rounded, so both
    engines agree bit-for-bit).

    Scale: one docs⋈embeddings join, a x64 posexplode into a (source,
    dim)-keyed partial aggregate (|sources|x64 rows out), then an
    O(|sources|^2 x 64) centroid self-join — catalog-sized, trivial at
    any corpus scale."""
    de = (
        spark.table("documents")
        .join(
            spark.table("embeddings"),
            F.col("vec_id") == F.col("doc_id"),
        )
        .select(
            "source",
            F.posexplode(F.col("embedding")).alias("dim", "x"),
        )
        .select(
            "source",
            "dim",
            F.expr("cast(round(cast(x as double) * 1000000, 0) as bigint)").alias("xm"),
        )
    )
    cent = de.groupBy("source", "dim").agg(
        F.expr("sum(xm) div count(*)").cast("bigint").alias("c")
    )
    norms = cent.groupBy("source").agg(F.sum(F.col("c") * F.col("c")).cast("bigint").alias("n2"))
    a = cent.select(F.col("source").alias("source_a"), "dim", F.col("c").alias("ca"))
    b = cent.select(
        F.col("source").alias("source_b"),
        F.col("dim").alias("dim_b"),
        F.col("c").alias("cb"),
    )
    dots = (
        a.join(
            b,
            (F.col("dim") == F.col("dim_b")) & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("dot"))
    )
    na = norms.select(F.col("source").alias("source_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("source").alias("source_b"), F.col("n2").alias("nb2"))
    return (
        dots.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.round(
                F.col("dot")
                / (
                    F.sqrt(F.col("na2").cast("double"))
                    * F.sqrt(F.col("nb2").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
        .orderBy("source_a", "source_b")
    )


# The round driver records correctness for only the FIRST 50 registry
# entries; the rest are verified locally (tools/check_correctness.py). To
# keep that hard signal managed deliberately (round-4 lesson: an insertion
# silently rotated q4/q6/q8 out of the driver-checked set), the first 50
# are pinned here each round: queries whose driver check is stalest or
# whose code changed this round come first, then a rotating tail of
# recently-driver-checked ones. Everything stays oracle-checked either way.
def _kcore_oracle(k: int, iterations: int) -> str:
    from dawis_spark.operators.graph import kcore_oracle_ctes

    return f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
),
{kcore_oracle_ctes('edges', k, iterations)}
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS side,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(MIN(degree) AS BIGINT) AS min_degree,
       CAST(MAX(degree) AS BIGINT) AS max_degree
FROM kcore GROUP BY 1 ORDER BY 1
"""


_KCORE_K = 30


@query("kcore_trade_graph", oracle=_kcore_oracle(_KCORE_K, 3))
def kcore_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (Seidman 1983) of the symmetrized customer↔
    supplier trade graph: peel nodes of degree < 30 for three rounds
    and profile the surviving dense backbone per side — the cohesion
    skeleton community detection and link-farm isolation start from
    (the graph family's density primitive, next to pagerank's
    centrality and triangle_counts' closure).

    Scale: each peel round is one degree count plus two hash semi-joins
    of edges against the persisted node-count-bounded survivor set —
    edge-count-bound, no quadratic step, no driver loop (fixed rounds
    = one declarative plan). All-integer, so DuckDB replays every peel
    exactly (operators/graph.py:kcore_oracle_ctes)."""
    from dawis_spark.operators.graph import kcore_peel

    pairs = (
        spark.table("lineitem")
        .join(spark.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .unionAll(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
        .persist()
    )
    core = kcore_peel(edges, k=_KCORE_K, iterations=3)
    return (
        core.groupBy(
            F.when(F.col("node") % 2 == 0, "customer")
            .otherwise("supplier")
            .alias("side")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.min("degree").cast("bigint").alias("min_degree"),
            F.max("degree").cast("bigint").alias("max_degree"),
        )
        .orderBy("side")
    )


def _bfs_oracle(max_hops: int, seed_nation: int) -> str:
    from dawis_spark.operators.graph import bfs_oracle_ctes

    return f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
),
seeds AS (
  SELECT c_custkey * 2 AS node FROM customer WHERE c_nationkey = {seed_nation}
),
{bfs_oracle_ctes('edges', 'seeds', max_hops)}
SELECT hops, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM bfs GROUP BY hops ORDER BY hops
"""


@query("bfs_hop_distribution", oracle=_bfs_oracle(3, _PPR_SEED_NATION))
def bfs_hop_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS reach profile: minimum hop distance from one
    nation's customers across the symmetrized trade graph, histogrammed
    per level — the reachability/expansion-sphere primitive (how fast
    does influence saturate the graph) that complements the rank-mass
    view personalized_pagerank gives over the SAME seed set.

    Scale: per hop one frontier⋈edges shuffle join plus a min/distinct
    — frontier-degree-bound with monotonically shrinking frontiers; the
    visited set is node-count-bounded persisted state. All-integer:
    DuckDB replays the level sets exactly."""
    from dawis_spark.operators.graph import bfs_hops

    pairs = (
        spark.table("lineitem")
        .join(spark.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .unionAll(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
        .persist()
    )
    seeds = (
        spark.table("customer")
        .filter(F.col("c_nationkey") == _PPR_SEED_NATION)
        .select((F.col("c_custkey") * 2).alias("node"))
    )
    return (
        bfs_hops(edges, seeds, max_hops=3)
        .groupBy("hops")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        .orderBy("hops")
    )


_DAILY_REV_ORDERS_CTE = """
daily AS (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1)
"""

_SPEARMAN_ORACLE = f"""
WITH {_DAILY_REV_ORDERS_CTE},
rk AS (
  SELECT (2 * RANK() OVER (ORDER BY rev) + COUNT(*) OVER (PARTITION BY rev) - 1) AS rx,
         (2 * RANK() OVER (ORDER BY cnt) + COUNT(*) OVER (PARTITION BY cnt) - 1) AS ry
  FROM daily),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(rx AS HUGEINT)) AS sx, SUM(CAST(ry AS HUGEINT)) AS sy,
         SUM(CAST(rx AS HUGEINT) * ry) AS sxy,
         SUM(CAST(rx AS HUGEINT) * rx) AS sxx,
         SUM(CAST(ry AS HUGEINT) * ry) AS syy
  FROM rk)
SELECT n,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS rho_spearman
FROM m
"""


@query("spearman_daily_rev_orders", oracle=_SPEARMAN_ORACLE)
def spearman_daily_rev_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between daily revenue and daily order
    count — the monotone-association screen (robust to outliers and
    nonlinearity) that belongs next to feature_correlations' Pearson
    and theil_sen's robust slope. Average ranks for ties, carried as
    DOUBLED ranks so every moment is an exact integer; the only float
    ops are two int->double conversions, two sqrts, one division —
    bit-stable across engines (operators/stats.py:spearman_rho).

    Scale: the input is a calendar-bounded daily aggregate; rank state
    is distinct-value-bounded; moment sums are map-side partial."""
    from dawis_spark.operators.stats import spearman_rho

    daily = (
        spark.table("orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("bigint")
            .alias("rev"),
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
        )
    )
    return spearman_rho(daily, "rev", "cnt")


_KENDALL_ORACLE = f"""
WITH {_DAILY_REV_ORDERS_CTE},
cls AS (
  SELECT CASE WHEN (a.rev < b.rev AND a.cnt < b.cnt)
                OR (a.rev > b.rev AND a.cnt > b.cnt) THEN 1 ELSE 0 END AS con,
         CASE WHEN (a.rev < b.rev AND a.cnt > b.cnt)
                OR (a.rev > b.rev AND a.cnt < b.cnt) THEN 1 ELSE 0 END AS dis,
         CASE WHEN a.rev = b.rev AND a.cnt <> b.cnt THEN 1 ELSE 0 END AS tx,
         CASE WHEN a.cnt = b.cnt AND a.rev <> b.rev THEN 1 ELSE 0 END AS ty,
         CASE WHEN a.rev = b.rev AND a.cnt = b.cnt THEN 1 ELSE 0 END AS txy
  FROM daily a JOIN daily b ON a.d < b.d),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n0,
         CAST(SUM(con) AS BIGINT) AS c, CAST(SUM(dis) AS BIGINT) AS dd,
         CAST(SUM(tx) AS BIGINT) AS ntx, CAST(SUM(ty) AS BIGINT) AS nty,
         CAST(SUM(txy) AS BIGINT) AS ntxy
  FROM cls)
SELECT c AS n_concordant, dd AS n_discordant,
       ROUND(CAST(c - dd AS DOUBLE)
             / (SQRT(CAST(n0 - ntx - ntxy AS DOUBLE))
                * SQRT(CAST(n0 - nty - ntxy AS DOUBLE))), 6) AS tau_b
FROM m
"""


@query("kendall_daily_rev_orders", oracle=_KENDALL_ORACLE)
def kendall_daily_rev_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b (full tie correction) between daily revenue and
    daily order count — the pairwise-agreement form of the monotone-
    association question spearman_daily_rev_orders answers with ranks;
    tau's bounded influence per pair makes it the standard cross-check
    when rank correlations disagree with Pearson.

    Scale: O(n^2) in the SERIES length only — the input is a calendar-
    bounded daily aggregate (n grows with days, not data volume), so
    the pair join stays a few-million-row broadcast nested loop even at
    100 TB; all counts integer-exact (operators/stats.py:kendall_tau_b)."""
    from dawis_spark.operators.stats import kendall_tau_b

    daily = (
        spark.table("orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("bigint")
            .alias("rev"),
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
        )
    )
    return kendall_tau_b(daily, "d", "rev", "cnt")


def _acf_oracle(max_lag: int) -> str:
    lag_selects = "\n  UNION ALL ".join(
        f"SELECT {k} AS lag, x, x{k} AS xl FROM leads WHERE x{k} IS NOT NULL"
        for k in range(1, max_lag + 1)
    )
    lead_cols = ", ".join(
        f"LEAD(rev, {k}) OVER (ORDER BY d) AS x{k}" for k in range(1, max_lag + 1)
    )
    return f"""
WITH {_DAILY_REV_ORDERS_CTE},
leads AS (SELECT rev AS x, {lead_cols} FROM daily),
gstats AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(CAST(rev AS HUGEINT)) AS s,
         SUM(CAST(rev AS HUGEINT) * rev) AS sxx
  FROM daily),
long AS ({lag_selects}),
per_lag AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         SUM(CAST(x AS HUGEINT) * xl) AS sxy,
         SUM(CAST(x AS HUGEINT)) AS sh, SUM(CAST(xl AS HUGEINT)) AS st
  FROM long GROUP BY lag)
SELECT CAST(lag AS INT) AS lag, n_pairs,
       ROUND(CAST(n*n*sxy - n*s*(sh + st) + n_pairs*s*s AS DOUBLE)
             / CAST(n*n*sxx - n*s*s AS DOUBLE), 6) AS acf
FROM per_lag CROSS JOIN gstats ORDER BY lag
"""


@query("acf_daily_revenue", oracle=_acf_oracle(14))
def acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily revenue at lags 1-14 — the
    seasonality/persistence fingerprint (weekly structure shows as a
    lag-7/14 ridge) that motivates the STL and seasonal-MAD operators;
    in a feature pipeline it is the standard pre-check before fitting
    any AR-family forecaster.

    Exactness: the 1/n mean is cleared by cross-multiplying with n^2 so
    every numerator/denominator term is an exact DECIMAL(38,0) integer;
    both engines convert the same integers once and divide once
    (operators/stats.py:acf). Scale: all 14 leads ride ONE window sort
    over the calendar-bounded daily series; per-lag sums are one
    unpivoted map-side-partial aggregate."""
    from dawis_spark.operators.stats import acf

    daily = (
        spark.table("orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("bigint")
            .alias("rev"),
        )
    )
    return acf(daily, "d", "rev", max_lag=14)


def _holt_oracle(horizon: int) -> str:
    from dawis_spark.operators.forecast import holt_oracle_ctes

    return f"""
WITH RECURSIVE daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2),
{holt_oracle_ctes('daily', 'event_type', 'day', 'v', horizon)}
SELECT k AS event_type, h, forecast AS forecast_cents,
       level AS level_cents, trend AS trend_cents, n_points
FROM holt ORDER BY event_type, h
"""


@query("holt_linear_forecast", oracle=_holt_oracle(7))
def holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear (double-exponential) smoothing of daily event totals
    with a 7-day-ahead forecast fan — the trend-aware forecaster
    between the EWMA chart (level only) and the seasonal STL family.
    Dyadic smoothing weights (alpha = 1/4, beta = 1/8) keep the whole
    state trajectory in truncating integer-cent arithmetic, so a
    recursive CTE replays it bit-for-bit.

    The recurrence is sequential and div-truncation makes it nonlinear
    — no impulse-response unroll exists (the EWMA/CUSUM closed-form
    trick does not apply), so this is the repo's one batch
    applyInPandas operator: Arrow-batched, keyed by series, O(1) state
    over a calendar-bounded series per group
    (operators/forecast.py:holt_linear documents the boundary).

    Scale: the shuffle is (event_type, day, cents) daily aggregates,
    never raw events; groups are catalog-bounded; forecast fan-out is
    h rows per key."""
    from dawis_spark.operators.forecast import holt_linear

    daily = (
        spark.table("events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("v")
        )
    )
    out = holt_linear(daily, "event_type", "day", "v", horizon=7)
    return out.select(
        "event_type",
        "h",
        F.col("forecast").alias("forecast_cents"),
        F.col("level").alias("level_cents"),
        F.col("trend").alias("trend_cents"),
        "n_points",
    ).orderBy("event_type", "h")


_KANON_QI_EXPR = (
    "(SELECT c_nationkey, c_mktsegment, "
    "CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band FROM customer)"
)


def _kanon_oracle(thresholds: list[int]) -> str:
    from dawis_spark.operators.profile import k_anonymity_oracle_sql

    return k_anonymity_oracle_sql(
        _KANON_QI_EXPR, ["c_nationkey", "c_mktsegment", "bal_band"], thresholds
    )


@query("k_anonymity_customers", oracle=_kanon_oracle([2, 5, 10, 20]))
def k_anonymity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity risk profile of the customer table under the
    (nation, market segment, account-balance band) quasi-identifier
    tuple: per k in {2, 5, 10, 20}, the equivalence classes and row
    fraction that would be re-identifiable below that threshold
    (Sweeney 2002) — the release-gate number a privacy review asks for,
    and the structural complement of pii_redaction (redaction strips
    direct identifiers; this measures whether the remaining
    quasi-identifiers still single records out).

    Scale: one groupBy over the QI tuple is the only row-scale shuffle;
    the threshold fan-out runs over the group-count relation
    (operators/profile.py:k_anonymity_profile)."""
    from dawis_spark.operators.profile import k_anonymity_profile

    qi = spark.table("customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    )
    return k_anonymity_profile(
        qi, ["c_nationkey", "c_mktsegment", "bal_band"], [2, 5, 10, 20]
    )


def _nprobe_curve_oracle(k: int, nq: int, kc: int, probes: list[int]) -> str:
    exact = _embedding_topk_oracle(k, nq).strip()
    parts = []
    for np_ in probes:
        approx = _ivf_trained_oracle(k, nq, kc, np_, 64).strip()
        parts.append(
            f"""
SELECT {np_} AS n_probe,
       CAST(COUNT(a.neighbor_id) AS BIGINT) AS hits,
       ROUND(CAST(COUNT(a.neighbor_id) AS DOUBLE) / {k * nq}, 6) AS mean_recall
FROM ({exact}) e LEFT JOIN ({approx}) a
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id"""
        )
    return " UNION ALL ".join(parts) + " ORDER BY n_probe"


@query("ivf_nprobe_recall_curve", oracle=_nprobe_curve_oracle(5, 10, 16, [1, 2, 4, 8]))
def ivf_nprobe_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF accuracy dial measured end-to-end: recall@5 against
    exact brute force as n_probe sweeps 1 -> 2 -> 4 -> 8 over the same
    trained 16-centroid quantizer — the curve an operator actually uses
    to pick the recall/cost point (probing n of C buckets costs ~n/C of
    exact), where the single-point ann_recall_* evals only spot-check
    one setting.

    The quantizer trains ONCE (deterministic one-round k-means) and is
    shared by all four probe runs via ivf_ann_topk's ``centroids=``
    parameter, so the sweep isolates the n_probe effect; the oracle
    replays training and all four searches."""
    from dawis_spark.operators.similarity import (
        brute_force_topk,
        ivf_ann_topk,
        train_kmeans,
    )

    emb = spark.table("embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    cents = train_kmeans(emb, "vec_id", "embedding", k=16, iterations=1)
    exact = brute_force_topk(
        corpus=emb, queries=queries_df, id_col="vec_id", vec_col="embedding", k=5
    ).select("query_id", "neighbor_id")
    curves = []
    for np_ in (1, 2, 4, 8):
        approx = ivf_ann_topk(
            corpus=emb,
            queries=queries_df,
            id_col="vec_id",
            vec_col="embedding",
            k=5,
            n_probe=np_,
            centroids=cents,
        ).select("query_id", "neighbor_id", F.lit(1).alias("m"))
        curves.append(
            exact.join(approx, ["query_id", "neighbor_id"], "left").agg(
                F.lit(np_).cast("int").alias("n_probe"),
                F.sum(F.coalesce(F.col("m"), F.lit(0))).cast("bigint").alias("hits"),
                F.round(
                    F.sum(F.coalesce(F.col("m"), F.lit(0))).cast("double") / (5 * 10),
                    6,
                ).alias("mean_recall"),
            )
        )
    out = curves[0]
    for c in curves[1:]:
        out = out.unionAll(c)
    return out.orderBy("n_probe")


_IR_QUERIES: list[tuple[int, tuple[str, ...]]] = [
    (1, ("spark", "hash")),
    (2, ("window", "sort")),
    (3, ("shuffle", "join")),  # zero AND-matches: exercises the rr=0 path
]
_IR_K = 20


def _ir_eval_oracle(k1: float, b: float, k: int) -> str:
    toks = _TXT.tokens("text", "duck")
    parts = []
    for qid, terms in _IR_QUERIES:
        term_list = ", ".join(f"'{t}'" for t in terms)
        rel_pred = " AND ".join(f"list_contains(__toks, '{t}')" for t in terms)
        parts.append(
            f"""
SELECT * FROM (
WITH base AS (SELECT doc_id, {toks} AS __toks FROM documents),
dl AS (SELECT doc_id, CAST(len(__toks) AS DOUBLE) AS dl FROM base),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl),
tk AS (SELECT doc_id, unnest(__toks) AS token FROM base),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf FROM tk
  WHERE token IN ({term_list}) GROUP BY doc_id, token
),
dfq AS (SELECT token, CAST(count(*) AS DOUBLE) AS df_t FROM tf GROUP BY token),
scored AS (
  SELECT tf.doc_id,
         ln(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
           * (tf * ({k1} + 1))
           / (tf + {k1} * (1 - {b} + {b} * dl.dl / avgdl)) AS contrib
  FROM tf JOIN dfq USING (token) JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
),
top AS (
  SELECT doc_id, ROUND(SUM(contrib), 6) AS bm25
  FROM scored GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT {k}
),
rk AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
  FROM top
),
rel AS (SELECT doc_id, ({rel_pred}) AS rel FROM base),
nrel AS (SELECT CAST(COUNT(*) FILTER (rel) AS BIGINT) AS n_relevant FROM rel),
j AS (SELECT rk.rank, rel.rel FROM rk JOIN rel USING (doc_id)),
m AS (
  SELECT MIN(CASE WHEN rel THEN rank END) AS fr,
         COALESCE(SUM(CASE WHEN rel AND rank <= 5 THEN 1 ELSE 0 END), 0) AS rel5,
         COALESCE(SUM(CASE WHEN rel THEN 1 ELSE 0 END), 0) AS relk
  FROM j)
SELECT {qid} AS query_id,
       nrel.n_relevant,
       CAST(COALESCE(fr, 0) AS BIGINT) AS first_rel_rank,
       ROUND(CASE WHEN fr IS NULL THEN 0.0 ELSE 1.0 / fr END, 6)
         AS reciprocal_rank,
       ROUND(CAST(rel5 AS DOUBLE) / 5, 6) AS p_at_5,
       ROUND(CAST(relk AS DOUBLE) / GREATEST(nrel.n_relevant, 1), 6)
         AS recall_at_{k}
FROM m CROSS JOIN nrel
)"""
        )
    return " UNION ALL ".join(parts) + " ORDER BY query_id"


@query("search_mrr_eval", oracle=_ir_eval_oracle(1.2, 0.75, _IR_K))
def search_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IR-metric self-eval for the BM25 retriever: per bag-of-words
    query, reciprocal rank of the first AND-relevant document plus
    precision@5 and recall@20 against exact AND-containment ground
    truth — the MRR/P@k panel that turns bm25_search from 'returns
    rows' into a measured retriever (query 3 has zero relevant docs by
    construction, pinning the rr = 0 path through an EMPTY candidate
    set — the global aggregate still emits its row). Complements the
    dense-side recall evals (ann_recall_*) and the fusion leg
    (hybrid_search_rrf) with the lexical leg's own quality number.

    Scale: each query's candidate set is the top-k of the inverted-
    index-shaped BM25 plan (postings filtered BEFORE any shuffle);
    relevance flags are a map-side conjunction on the same token
    arrays; the per-query aggregate is k-row-bounded."""
    from pyspark.sql import Window

    from dawis_spark.operators.corpus import bm25_scores

    docs = spark.table("documents")
    toks = _TXT.tokens("text", "spark")
    out = None
    for qid, terms in _IR_QUERIES:
        ranked = bm25_scores(
            docs, "doc_id", "text", list(terms), k1=1.2, b=0.75, top_n=_IR_K
        ).select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("bm25"), "doc_id"))
            .alias("rank"),
        )
        rel_pred = F.expr(
            " AND ".join(f"array_contains({toks}, '{t}')" for t in terms)
        )
        rel = docs.select("doc_id", rel_pred.alias("rel"))
        nrel = rel.agg(
            F.sum(F.when(F.col("rel"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_relevant")
        )
        first = F.min(F.when(F.col("rel"), F.col("rank")))
        m = ranked.join(rel, "doc_id").agg(
            first.alias("fr"),
            F.coalesce(
                F.sum(F.when(F.col("rel") & (F.col("rank") <= 5), 1).otherwise(0)),
                F.lit(0),
            ).alias("rel5"),
            F.coalesce(
                F.sum(F.when(F.col("rel"), 1).otherwise(0)), F.lit(0)
            ).alias("relk"),
        )
        row = m.crossJoin(F.broadcast(nrel)).select(
            F.lit(qid).cast("int").alias("query_id"),
            "n_relevant",
            F.coalesce(F.col("fr"), F.lit(0)).cast("bigint").alias("first_rel_rank"),
            F.round(
                F.when(F.col("fr").isNull(), F.lit(0.0)).otherwise(
                    F.lit(1.0) / F.col("fr")
                ),
                6,
            ).alias("reciprocal_rank"),
            F.round(F.col("rel5").cast("double") / 5, 6).alias("p_at_5"),
            F.round(
                F.col("relk").cast("double")
                / F.greatest(F.col("n_relevant"), F.lit(1)),
                6,
            ).alias(f"recall_at_{_IR_K}"),
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("query_id")


_WMEDIAN_ORACLE = """
WITH src AS (
  SELECT l_returnflag AS k,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS v,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem),
g AS (SELECT k, v, SUM(w) AS wv FROM src GROUP BY k, v),
c AS (
  SELECT k, v,
         SUM(wv) OVER (PARTITION BY k ORDER BY v) AS cumw,
         SUM(wv) OVER (PARTITION BY k) AS tw
  FROM g)
SELECT k AS l_returnflag, CAST(tw AS BIGINT) AS total_w,
       CAST(MIN(CASE WHEN cumw >= (tw + 1) // 2 THEN v END) AS BIGINT)
         AS median_value
FROM c GROUP BY k, tw ORDER BY l_returnflag
"""


@query("weighted_median_price", oracle=_WMEDIAN_ORACLE)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median of extended price per return flag — the
    robust center under size weights (what does a TYPICAL UNIT sell
    at), which the row-median answers incorrectly when line sizes vary.
    Runs as the two-pass distributed selection
    (operators/sketches.py:weighted_median_select): the only full-data
    exchange carries group x bucket WEIGHT SUMS, the second pass sorts
    only the chosen buckets' rows — the rank_quantiles_select shape
    generalized from counts to weights, immune to the per-group window
    sort that dies at 100 TB."""
    from dawis_spark.operators.sketches import weighted_median_select

    src = spark.table("lineitem").select(
        F.col("l_returnflag"),
        F.expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)").alias("vc"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    return (
        weighted_median_select(src, ["l_returnflag"], "vc", "w")
        .select("l_returnflag", "total_w", F.col("median_value").cast("bigint").alias("median_value"))
        .orderBy("l_returnflag")
    )


def _lpa_oracle(iterations: int, top_n: int) -> str:
    from dawis_spark.operators.graph import label_propagation_oracle_ctes

    return f"""
WITH names AS (
  SELECT p_brand AS g, p_name AS t, length(p_name) AS ln
  FROM part GROUP BY 1, 2),
e0 AS (
  SELECT a.g || '|' || a.t AS i, b2.g || '|' || b2.t AS j
  FROM names a JOIN names b2
    ON a.g = b2.g AND a.t < b2.t AND abs(a.ln - b2.ln) <= 2
  WHERE levenshtein(a.t, b2.t) <= 2),
edges AS (SELECT i AS src, j AS dst FROM e0 UNION ALL SELECT j, i FROM e0),
{label_propagation_oracle_ctes('edges', iterations)}
SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM lpa GROUP BY label ORDER BY n_nodes DESC, community LIMIT {top_n}
"""


@query("community_detection_lpa", oracle=_lpa_oracle(3, 10))
def community_detection_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation community detection (Raghavan et al. 2007,
    deterministic min-label tie-break) over the fuzzy name-match graph
    (part names within brand blocks at edit distance <= 2 — the
    fuzzy_name_matches relation as edges): three voting rounds, then
    the ten largest entity groups. This is LPA's production use in an
    ER pipeline — variants cluster onto one canonical label without a
    global transitive closure — and the unsupervised complement to
    knn_label_propagation's seeded classifier. (The trade and item
    co-occurrence graphs are near-cliques on this corpus; LPA needs a
    SPARSE graph to say anything, which the blocked edit-distance
    relation is: ~400 communities over ~800 name nodes at sf0.1.)

    Scale: edge build is the blocked length-filtered name join
    (catalog-bounded names relation); per round one edges join labels
    shuffle + one (node, label) count + an argmax window over the count
    relation; label state is node-count-bounded and persisted. The
    min-label tie-break makes all rounds DuckDB-replayable
    (operators/graph.py:label_propagation_oracle_ctes)."""
    from dawis_spark.operators.graph import label_propagation

    names = (
        spark.table("part")
        .select(F.col("p_brand").alias("g"), F.col("p_name").alias("t"))
        .distinct()
        .withColumn("ln", F.length("t"))
    )
    a, b = names.alias("a"), names.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.t") < F.col("b.t"))
            & (F.abs(F.col("a.ln") - F.col("b.ln")) <= 2),
        )
        .filter(F.levenshtein(F.col("a.t"), F.col("b.t")) <= 2)
        .select(
            F.concat_ws("|", F.col("a.g"), F.col("a.t")).alias("i"),
            F.concat_ws("|", F.col("b.g"), F.col("b.t")).alias("j"),
        )
    )
    edges = (
        pairs.select(F.col("i").alias("src"), F.col("j").alias("dst"))
        .unionAll(pairs.select(F.col("j").alias("src"), F.col("i").alias("dst")))
        .persist()
    )
    return (
        label_propagation(edges, iterations=3)
        .groupBy(F.col("label").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        .orderBy(F.desc("n_nodes"), "community")
        .limit(10)
    )


_HAMPEL_ORACLE = """
WITH daily AS (
  SELECT event_type AS k, date_trunc('day', ts) AS d,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2),
fan AS (
  SELECT k, d + to_days(CAST(t.o AS INT)) AS cday, v
  FROM daily, range(-3, 4) t(o)),
wins AS (
  SELECT k, cday, list_sort(list(v)) AS vals, COUNT(*) AS n
  FROM fan GROUP BY k, cday),
scored AS (
  SELECT k, cday, vals[4] AS med,
         list_sort(list_transform(vals, x -> abs(x - vals[4])))[4] AS mad
  FROM wins WHERE n = 7)
SELECT d.k AS event_type, d.d AS day, d.v AS value_cents,
       CAST(s.med AS BIGINT) AS med, CAST(s.mad AS BIGINT) AS mad,
       CAST(abs(d.v - s.med) AS BIGINT) AS dev
FROM daily d JOIN scored s ON d.k = s.k AND d.d = s.cday
WHERE abs(d.v - s.med) * 10000 > 44478 * s.mad
ORDER BY event_type, day
"""


@query("hampel_outliers_daily", oracle=_HAMPEL_ORACLE)
def hampel_outliers_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel despike filter on daily event totals: points more than
    3 x 1.4826 x MAD from their ROLLING 7-day median — the windowed
    form of the global MAD test (anomaly_mad_daily), robust to level
    shifts that poison a global baseline. The threshold compares
    |dev| * 10000 > 44478 * MAD in pure int64 (median and MAD are each
    the 4th order statistic of 7 integers), so the flag set is
    bit-stable with zero float ops
    (operators/anomaly.py:hampel_outliers).

    Scale: the rolling-median explode fanout — x7 hash-only rows into
    one (key, center-day) aggregate; no unbounded window, no per-key
    full-series sort."""
    from dawis_spark.operators.anomaly import hampel_outliers

    daily = (
        spark.table("events")
        .groupBy(
            F.col("event_type").alias("k"),
            F.date_trunc("day", "ts").alias("day"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("v")
        )
    )
    return (
        hampel_outliers(daily, "k", "day", "v", half_window=3)
        .select(
            F.col("k").alias("event_type"),
            "day",
            F.col("v").alias("value_cents"),
            "med",
            "mad",
            "dev",
        )
        .orderBy("event_type", "day")
    )


_TRIMMED_MEAN_ORACLE = """
WITH src AS (
  SELECT l_returnflag AS k,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS v
  FROM lineitem),
rk AS (
  SELECT k, v,
         row_number() OVER (PARTITION BY k ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY k) AS n
  FROM src),
t AS (
  SELECT k, v, rn, n,
         (5 * (n - 1)) // 100 + 1 AS t_lo,
         (95 * (n - 1)) // 100 + 1 AS t_hi
  FROM rk)
SELECT k AS l_returnflag, CAST(n AS BIGINT) AS n,
       CAST(t_hi - t_lo + 1 AS BIGINT) AS kept_n,
       CAST(SUM(CASE WHEN rn BETWEEN t_lo AND t_hi THEN v ELSE 0 END) AS BIGINT)
         AS trimmed_sum,
       ROUND(CAST(SUM(CASE WHEN rn BETWEEN t_lo AND t_hi THEN v ELSE 0 END)
                  AS DOUBLE) / CAST(t_hi - t_lo + 1 AS DOUBLE), 6)
         AS trimmed_mean
FROM t GROUP BY k, n, t_lo, t_hi ORDER BY l_returnflag
"""


@query("trimmed_mean_price", oracle=_TRIMMED_MEAN_ORACLE)
def trimmed_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5/95 trimmed mean of extended price per return flag — the robust
    location estimate for heavy-tailed measures, computed WITHOUT a
    per-group sort: cutoffs come from the bucket-selection quantiles
    and the trimmed sum is recovered arithmetically with exact tie
    corrections at both cutoffs
    (operators/sketches.py:trimmed_mean_select — identical by
    construction to sorting and summing ranks t_lo..t_hi, which is what
    the oracle does). Two scans plus the selection machinery's
    bucket-count exchange; the oracle's window form is the
    non-scalable shape the operator exists to avoid."""
    from dawis_spark.operators.sketches import trimmed_mean_select

    src = spark.table("lineitem").select(
        F.col("l_returnflag").alias("k"),
        F.expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)").alias("vc"),
    )
    return (
        trimmed_mean_select(src, ["k"], "vc", 5, 95)
        .select(
            F.col("k").alias("l_returnflag"),
            "n",
            "kept_n",
            "trimmed_sum",
            "trimmed_mean",
        )
        .orderBy("l_returnflag")
    )


def _bellman_oracle(iterations: int, top_n: int, seed_nation: int) -> str:
    from dawis_spark.operators.graph import bellman_ford_oracle_ctes

    return f"""
WITH rel AS (
  SELECT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s,
         CAST(MIN(DATEDIFF('day', o_orderdate, l_shipdate)) AS BIGINT) AS w
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
edges AS (
  SELECT c AS src, s AS dst, w FROM rel
  UNION ALL
  SELECT s AS src, c AS dst, w FROM rel
),
seeds AS (
  SELECT c_custkey * 2 AS node FROM customer WHERE c_nationkey = {seed_nation}
),
{bellman_ford_oracle_ctes('edges', 'seeds', iterations)}
SELECT node, dist FROM bf
WHERE node % 2 = 1
ORDER BY dist, node LIMIT {top_n}
"""


@query("bellman_ford_fastest_supply", oracle=_bellman_oracle(3, 15, _PPR_SEED_NATION))
def bellman_ford_fastest_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source Bellman-Ford over the trade graph with edge weight
    = the relationship's fastest observed ship lag (days): the 15
    suppliers cheapest to reach from one nation's customers within 3
    relaxation rounds — weighted shortest paths, the cost-aware
    companion to bfs_hop_distribution's hop counts (same seed set, same
    graph, different metric). Non-negative integer weights keep every
    min-plus round exact; DuckDB replays all relaxations
    (operators/graph.py:bellman_ford_oracle_ctes).

    Scale: per round one dist⋈edges shuffle join + one min-groupBy —
    edge-count-bound with node-count-bounded persisted distance state;
    the edge build aggregates lineitem⋈orders down to one row per
    trading relationship before any iteration."""
    from dawis_spark.operators.graph import bellman_ford

    rel = (
        spark.table("lineitem")
        .join(spark.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .agg(
            F.min(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")))
            .cast("bigint")
            .alias("w")
        )
    )
    edges = (
        rel.select(F.col("c").alias("src"), F.col("s").alias("dst"), "w")
        .unionAll(rel.select(F.col("s").alias("src"), F.col("c").alias("dst"), "w"))
        .persist()
    )
    seeds = (
        spark.table("customer")
        .filter(F.col("c_nationkey") == _PPR_SEED_NATION)
        .select((F.col("c_custkey") * 2).alias("node"))
    )
    return (
        bellman_ford(edges, seeds, iterations=3)
        .filter(F.col("node") % 2 == 1)
        .orderBy("dist", "node")
        .limit(15)
    )


def _ccf_oracle(max_lag: int) -> str:
    shift_selects = []
    for k in range(-max_lag, max_lag + 1):
        fn = f"LEAD(rev, {k})" if k >= 0 else f"LAG(rev, {-k})"
        shift_selects.append(f"{fn} OVER (ORDER BY d) AS y_{k + max_lag}")
    lag_selects = "\n  UNION ALL ".join(
        f"SELECT {k} AS lag, x, y_{k + max_lag} AS yl FROM wide"
        f" WHERE y_{k + max_lag} IS NOT NULL"
        for k in range(-max_lag, max_lag + 1)
    )
    return f"""
WITH {_DAILY_REV_ORDERS_CTE},
wide AS (SELECT cnt AS x, {', '.join(shift_selects)} FROM daily),
gstats AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(cnt AS HUGEINT)) AS sx, SUM(CAST(rev AS HUGEINT)) AS sy,
         SUM(CAST(cnt AS HUGEINT) * cnt) AS sxx,
         SUM(CAST(rev AS HUGEINT) * rev) AS syy
  FROM daily),
long AS ({lag_selects}),
per_lag AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         SUM(CAST(x AS HUGEINT) * yl) AS sxy,
         SUM(CAST(x AS HUGEINT)) AS xh, SUM(CAST(yl AS HUGEINT)) AS yt
  FROM long GROUP BY lag)
SELECT CAST(lag AS INT) AS lag, n_pairs,
       ROUND(CAST(n*n*sxy - n*sy*xh - n*sx*yt + n_pairs*sx*sy AS DOUBLE)
             / (SQRT(CAST(n*n*sxx - n*sx*sx AS DOUBLE))
                * SQRT(CAST(n*n*syy - n*sy*sy AS DOUBLE))), 6) AS ccf
FROM per_lag CROSS JOIN gstats ORDER BY lag
"""


@query("ccf_orders_vs_revenue", oracle=_ccf_oracle(7))
def ccf_orders_vs_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation between daily order count and daily revenue at
    lags -7..+7 — the lead/lag detector (which series moves FIRST) that
    completes the temporal-association panel: ACF for self-structure,
    Spearman/Kendall for contemporaneous monotone association, CCF for
    direction. Same n^2-cross-multiplied exactness as acf: every
    numerator term an exact DECIMAL(38,0) integer, two sqrts and one
    division at the end (operators/stats.py:ccf).

    Scale: all 15 shifted pairings ride ONE window sort over the
    calendar-bounded daily series."""
    from dawis_spark.operators.stats import ccf

    daily = (
        spark.table("orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("bigint")
            .alias("rev"),
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
        )
    )
    return ccf(daily, "d", "cnt", "rev", max_lag=7)


def _rake_oracle() -> str:
    from dawis_spark.operators.rake import rake_oracle_sql

    return rake_oracle_sql("documents", "doc_id", "text")


@query("rake_keyphrases", oracle=_rake_oracle())
def rake_keyphrases_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010) over the corpus:
    top collocations by deg/freq word scores — the unsupervised
    keyword/topic surfacer next to pmi_collocations (PMI finds
    surprising PAIRS; RAKE ranks whole stopword-free phrases) and
    tfidf_top_terms (per-source single tokens).

    Phrase segmentation is POSITIONAL, not regex: separator flags +
    per-doc cumulative sum define maximal stopword-free runs in
    engine-neutral relational ops, and each phrase's float score folds
    word scores in position order (the ordered-fold discipline), so
    DuckDB reproduces every bit (operators/rake.py).

    Scale: one tokenize/posexplode scan, a per-document window
    (document-length-bounded, parallel across docs), a vocab-bounded
    word-stats aggregate, one phrase re-aggregate."""
    from dawis_spark.operators.rake import rake_keyphrases

    return rake_keyphrases(spark.table("documents"), "doc_id", "text")


_WINSOR_ORACLE = """
WITH src AS (
  SELECT l_returnflag AS k,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS v
  FROM lineitem),
rk AS (
  SELECT k, v,
         row_number() OVER (PARTITION BY k ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY k) AS n
  FROM src),
t AS (
  SELECT k, v, rn, n,
         (5 * (n - 1)) // 100 + 1 AS t_lo,
         (95 * (n - 1)) // 100 + 1 AS t_hi
  FROM rk),
cuts AS (
  SELECT k,
         MAX(CASE WHEN rn = t_lo THEN v END) AS q_lo,
         MAX(CASE WHEN rn = t_hi THEN v END) AS q_hi
  FROM t GROUP BY k)
SELECT t.k AS l_returnflag, CAST(t.n AS BIGINT) AS n,
       CAST(SUM(CASE WHEN rn < t_lo THEN c.q_lo
                     WHEN rn > t_hi THEN c.q_hi
                     ELSE v END) AS BIGINT) AS winsor_sum,
       ROUND(CAST(SUM(CASE WHEN rn < t_lo THEN c.q_lo
                           WHEN rn > t_hi THEN c.q_hi
                           ELSE v END) AS DOUBLE) / t.n, 6) AS winsor_mean
FROM t JOIN cuts c ON t.k = c.k
GROUP BY t.k, t.n ORDER BY l_returnflag
"""


@query("winsorized_mean_price", oracle=_WINSOR_ORACLE)
def winsorized_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5/95 winsorized mean of extended price per return flag — the
    trimmed mean's other leg: extremes are REPLACED by the cutoff
    values rather than dropped, keeping the mean over the full n (the
    estimator of choice when row counts must be preserved, e.g.
    weighting downstream aggregates). Shares trimmed_mean_select's
    bucket-selection cutoffs and exact tie corrections — the oracle's
    per-rank CASE replay is the definitionally equivalent sorted form
    the operator avoids at scale."""
    from dawis_spark.operators.sketches import trimmed_mean_select

    src = spark.table("lineitem").select(
        F.col("l_returnflag").alias("k"),
        F.expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)").alias("vc"),
    )
    return (
        trimmed_mean_select(src, ["k"], "vc", 5, 95)
        .select(
            F.col("k").alias("l_returnflag"),
            "n",
            "winsor_sum",
            "winsor_mean",
        )
        .orderBy("l_returnflag")
    )


import math as _math

_NDCG_K = 10
# 1/log2(1+r) discounts as shared decimal literals: both engines parse
# the same decimal string to the same IEEE double, so no libm log enters
# either plan — the cross-engine determinism trick for the one place
# nDCG genuinely needs a logarithm.
_NDCG_W = [round(1.0 / _math.log2(1 + r), 12) for r in range(1, _NDCG_K + 1)]
_NDCG_CUMW = [round(sum(_NDCG_W[:j]), 12) for j in range(0, _NDCG_K + 1)]


def _ndcg_ideal_expr(g: int, cw) -> str:
    """Ideal-DCG expression from the per-grade-level >=counts: descending
    grade levels fill the top of the ideal ranking, so level ``lvl``
    contributes ``lvl * (cumw[min(n_ge_lvl, K)] - cumw[min(n_ge_lvl+1, K)])``
    (n_ge_{g+1} = 0). ``cw`` renders the cumulative-discount lookup for
    the target engine; the generated arithmetic string is identical for
    both, so IEEE association matches bit-for-bit."""
    parts = []
    for lvl in range(1, g + 1):
        hi = cw(f"n_ge_{lvl}")
        lo = cw(f"n_ge_{lvl + 1}") if lvl < g else "CAST(0.0 AS DOUBLE)"
        parts.append(f"{lvl} * ({hi} - {lo})")
    return " + ".join(parts)


def _ndcg_oracle(k1: float, b: float) -> str:
    toks = _TXT.tokens("text", "duck")
    w_arr = ", ".join(str(w) for w in _NDCG_W)
    cumw_arr = ", ".join(str(w) for w in _NDCG_CUMW)
    parts = []
    for qid, terms in _IR_QUERIES:
        term_list = ", ".join(f"'{t}'" for t in terms)
        grade = " + ".join(
            f"CASE WHEN list_contains(__toks, '{t}') THEN 1 ELSE 0 END"
            for t in terms
        )
        # The ideal DCG derives from the per-grade-level count histogram
        # (grades descend over the prefix-summed discount literals), so it
        # stays correct for ANY number of query terms — the closed form
        # g*cw_full + (cw_both - cw_full) is only valid when all partial
        # matches carry grade exactly 1 (i.e. g == 2). For g == 2 this
        # reduces to the same values, term-by-term and in the same
        # floating-point association as the Spark rendering below.
        g = len(terms)
        gc_counts = ",\n         ".join(
            f"CAST(SUM(CASE WHEN grade >= {lvl} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_ge_{lvl}"
            for lvl in range(1, g + 1)
        )
        idcg_sql = _ndcg_ideal_expr(
            g, lambda e: f"([{cumw_arr}])[CAST(least({e}, {_NDCG_K}) AS INT) + 1]"
        )
        parts.append(
            f"""
SELECT * FROM (
WITH base AS (SELECT doc_id, {toks} AS __toks FROM documents),
dl AS (SELECT doc_id, CAST(len(__toks) AS DOUBLE) AS dl FROM base),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl),
tk AS (SELECT doc_id, unnest(__toks) AS token FROM base),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf FROM tk
  WHERE token IN ({term_list}) GROUP BY doc_id, token
),
dfq AS (SELECT token, CAST(count(*) AS DOUBLE) AS df_t FROM tf GROUP BY token),
scored AS (
  SELECT tf.doc_id,
         ln(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
           * (tf * ({k1} + 1))
           / (tf + {k1} * (1 - {b} + {b} * dl.dl / avgdl)) AS contrib
  FROM tf JOIN dfq USING (token) JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
),
top AS (
  SELECT doc_id, ROUND(SUM(contrib), 6) AS bm25
  FROM scored GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT {_NDCG_K}
),
rk AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
  FROM top
),
gr AS (SELECT doc_id, ({grade}) AS grade FROM base),
gc AS (
  SELECT {gc_counts}
  FROM gr),
dcg_t AS (
  SELECT COALESCE(list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE), list_transform(
             list_sort(list(struct_pack(r := rk.rank, g := gr.grade))),
             e -> e.g * ([{w_arr}])[e.r])),
           (a, v) -> a + v), 0.0) AS dcg
  FROM rk JOIN gr USING (doc_id)),
ideal AS (
  SELECT n_ge_1 - n_ge_{g} AS n_partial, n_ge_{g} AS n_full,
         {idcg_sql} AS idcg
  FROM gc)
SELECT {qid} AS query_id, n_full, n_partial,
       ROUND(dcg, 6) AS dcg,
       ROUND(idcg, 6) AS idcg,
       ROUND(CASE WHEN idcg = 0 THEN 0.0 ELSE dcg / idcg END, 6) AS ndcg
FROM dcg_t CROSS JOIN ideal
)"""
        )
    return " UNION ALL ".join(parts) + " ORDER BY query_id"


@query("search_ndcg_eval", oracle=_ndcg_oracle(1.2, 0.75))
def search_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded nDCG@10 for the BM25 retriever — the ranked-quality
    number completing the IR panel (search_mrr_eval scores the first
    hit; nDCG scores the whole ordering): relevance grade = number of
    query terms a document contains, discounts 1/log2(1+r) shared as
    DECIMAL LITERALS so neither engine calls a log in the scoring path,
    and the IDEAL DCG is CLOSED-FORM from the corpus grade counts
    (prefix-summed discount literals indexed by min(count, k)) — no
    corpus-wide sort or collect to build the ideal ranking, the detail
    that keeps nDCG computable at 100 TB. The realized DCG folds the
    10-row ranking in rank order (ordered-fold discipline)."""
    from pyspark.sql import Window

    from dawis_spark.operators.corpus import bm25_scores

    docs = spark.table("documents")
    toks = _TXT.tokens("text", "spark")
    w_arr = ", ".join(f"{w}D" for w in _NDCG_W)
    cumw_arr = ", ".join(f"{w}D" for w in _NDCG_CUMW)
    out = None
    for qid, terms in _IR_QUERIES:
        g = len(terms)
        ranked = bm25_scores(
            docs, "doc_id", "text", list(terms), k1=1.2, b=0.75, top_n=_NDCG_K
        ).select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("bm25"), "doc_id"))
            .alias("rank"),
        )
        grade_expr = " + ".join(
            f"CASE WHEN array_contains({toks}, '{t}') THEN 1 ELSE 0 END"
            for t in terms
        )
        grades = docs.select("doc_id", F.expr(grade_expr).alias("grade"))
        gc = grades.agg(
            *[
                F.sum(F.when(F.col("grade") >= lvl, 1).otherwise(0))
                .cast("bigint")
                .alias(f"n_ge_{lvl}")
                for lvl in range(1, g + 1)
            ]
        )
        dcg_row = ranked.join(grades, "doc_id").agg(
            F.coalesce(
                F.expr(
                    "aggregate(array_sort(collect_list(struct(rank, grade))), "
                    f"cast(0.0 as double), (a, e) -> a + e.grade * element_at(array({w_arr}), e.rank))"
                ),
                F.lit(0.0),
            ).alias("dcg")
        )
        # Same per-grade-level ideal as the oracle (see _ndcg_ideal_expr):
        # the generated arithmetic string is identical, so the IEEE
        # association matches the DuckDB rendering exactly.
        idcg = F.expr(
            _ndcg_ideal_expr(
                g,
                lambda e: (
                    f"element_at(array({cumw_arr}), "
                    f"cast(least({e}, {_NDCG_K}) as int) + 1)"
                ),
            )
        )
        row = dcg_row.crossJoin(F.broadcast(gc)).select(
            F.lit(qid).cast("int").alias("query_id"),
            F.col(f"n_ge_{g}").alias("n_full"),
            (F.col("n_ge_1") - F.col(f"n_ge_{g}")).alias("n_partial"),
            F.round("dcg", 6).alias("dcg"),
            F.round(idcg, 6).alias("idcg"),
            F.round(
                F.when(idcg == 0, F.lit(0.0)).otherwise(F.col("dcg") / idcg), 6
            ).alias("ndcg"),
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("query_id")


# ---------------------------------------------------------------------------
# Round-10 additions: line-level corpus dedup (CCNet), KMV sketch set
# algebra, tokenizer fertility eval
# ---------------------------------------------------------------------------

_LINE_DEDUP_K = 5  # a line repeated across >= K documents is boilerplate


def _line_dedup_oracle() -> str:
    h = _TXT.char_hash("line", "duck")
    return f"""
WITH lined AS (
  SELECT doc_id, source, trim(l) AS line
  FROM (SELECT doc_id, source, unnest(string_split({_LINED}, chr(10))) AS l
        FROM documents)
  WHERE trim(l) != ''),
lh AS (SELECT doc_id, source, {h} AS h FROM lined),
freq AS (SELECT h, COUNT(*) AS freq FROM lh GROUP BY h)
SELECT source,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS lines_total,
       CAST(COUNT(DISTINCT lh.h) AS BIGINT) AS distinct_lines,
       CAST(SUM(CASE WHEN freq >= {_LINE_DEDUP_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS boiler_instances,
       CAST(COUNT(DISTINCT CASE WHEN freq >= {_LINE_DEDUP_K} THEN doc_id END)
         AS BIGINT) AS docs_affected,
       ROUND(CAST(SUM(CASE WHEN freq >= {_LINE_DEDUP_K} THEN 1 ELSE 0 END)
         AS DOUBLE) / COUNT(*), 6) AS removed_frac
FROM lh JOIN freq USING (h)
GROUP BY source ORDER BY source
"""


@query("line_dedup_boilerplate", oracle=_line_dedup_oracle())
def line_dedup_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style line-level corpus deduplication (Wenzek et al. 2020
    §3.1: hash every line, drop lines repeated across the corpus —
    the boilerplate killer for nav bars / cookie banners / footers that
    document-level dedup never sees). Lines derive from the shared
    _LINED break rules; a line repeated in >= 5 documents is
    boilerplate; per-source report of instances removed, documents
    touched, and removed share.

    Scale: the line explode is map-side; lines hash to int64 inside the
    scan so the ONLY data-sized exchanges carry (hash) and (hash, count)
    — never line text (the containment-family discipline). The
    frequency join keys on the hash; the rollup is source-keyed with
    map-side partials. At 100 TB the freq relation is
    distinct-line-bounded and the hot boilerplate hashes are exactly the
    keys AQE's skew split handles."""
    h = _TXT.char_hash("line", "spark")
    lines_expr = (
        f"filter(transform(split({_LINED}, '\\n'), l -> trim(l)), l -> l != '')"
    )
    lined = spark.table("documents").select(
        "doc_id", "source", F.explode(F.expr(lines_expr)).alias("line")
    )
    lh = lined.select("doc_id", "source", F.expr(h).cast("bigint").alias("h"))
    freq = lh.groupBy("h").agg(F.count(F.lit(1)).alias("freq"))
    boiler = F.when(F.col("freq") >= _LINE_DEDUP_K, 1).otherwise(0)
    return (
        lh.join(freq, "h")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("lines_total"),
            F.countDistinct("h").cast("bigint").alias("distinct_lines"),
            F.sum(boiler).cast("bigint").alias("boiler_instances"),
            F.countDistinct(
                F.when(F.col("freq") >= _LINE_DEDUP_K, F.col("doc_id"))
            )
            .cast("bigint")
            .alias("docs_affected"),
            F.round(F.sum(boiler) / F.count(F.lit(1)), 6).alias("removed_frac"),
        )
        .orderBy("source")
    )


_KMV_SET_K = 128
_KMV_SET_A, _KMV_SET_B = "view", "purchase"


def _kmv_set_oracle() -> str:
    from dawis_spark.operators.sketches import MOD as _SK_MOD
    from dawis_spark.operators.sketches import kmv_arrays_oracle_ctes

    src = (
        "(SELECT event_type, user_id FROM events "
        f"WHERE event_type IN ('{_KMV_SET_A}', '{_KMV_SET_B}'))"
    )
    k = _KMV_SET_K
    return f"""
WITH {kmv_arrays_oracle_ctes(src, ['event_type'], 'user_id', k, 'ks')},
ab AS (SELECT
  (SELECT hs FROM ks WHERE event_type = '{_KMV_SET_A}') AS a,
  (SELECT hs FROM ks WHERE event_type = '{_KMV_SET_B}') AS b),
syn AS (SELECT list_sort(list_distinct(a || b))[1:{k}] AS u, a, b FROM ab),
m AS (SELECT len(u) AS nu, u[len(u)] AS kth,
             len(list_filter(u, x -> list_contains(a, x)
                                 AND list_contains(b, x))) AS ni
      FROM syn),
est AS (SELECT nu, ni,
               CASE WHEN nu >= {k}
                    THEN ROUND(CAST({k - 1} AS DOUBLE) * {_SK_MOD} / kth, 6)
                    ELSE CAST(nu AS DOUBLE) END AS est_union,
               CAST(ni AS DOUBLE) / nu AS rho
        FROM m),
ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_union,
              CAST(SUM(CASE WHEN ha AND hb THEN 1 ELSE 0 END) AS BIGINT)
                AS exact_inter
       FROM (SELECT user_id,
                    BOOL_OR(event_type = '{_KMV_SET_A}') AS ha,
                    BOOL_OR(event_type = '{_KMV_SET_B}') AS hb
             FROM events
             WHERE event_type IN ('{_KMV_SET_A}', '{_KMV_SET_B}')
             GROUP BY user_id))
SELECT CAST({k} AS BIGINT) AS k,
       est_union, exact_union,
       ROUND((est_union - exact_union) / exact_union, 4) AS err_union,
       ROUND(rho, 6) AS est_jaccard,
       ROUND(CAST(exact_inter AS DOUBLE) / exact_union, 6) AS exact_jaccard,
       ROUND(rho * est_union, 6) AS est_intersection, exact_inter
FROM est, ex
"""


@query("kmv_set_algebra", oracle=_kmv_set_oracle())
def kmv_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET ALGEBRA (Beyer et al. 2007 §4): estimate
    |A ∪ B|, |A ∩ B| and Jaccard between two user sets (viewers vs
    purchasers) from their k-minimum-value synopses alone — the
    combined sketch K = k smallest of A ∪ B, ρ = |{h ∈ K : h ∈ A ∧
    h ∈ B}| / |K| estimates Jaccard, ρ · n̂(K) the intersection. The
    audience-overlap primitive that works when the sets live on
    different clusters and only k int64s can cross. Exact counts
    computed alongside as the self-eval.

    Scale: each synopsis builds with the kmv_distinct plan (map-side
    k-truncation via kmv_sets, k-bounded exchange); the algebra itself
    (kmv_set_ops) touches 2k int64s on one row. The exact twin pays a
    user-cardinality exchange — exactly the cost the sketch avoids."""
    from dawis_spark.operators.sketches import kmv_set_ops, kmv_sets

    k = _KMV_SET_K
    ev = (
        spark.table("events")
        .filter(F.col("event_type").isin(_KMV_SET_A, _KMV_SET_B))
        .select("event_type", "user_id")
    )
    sk = kmv_sets(ev, ["event_type"], "user_id", k=k)
    a = sk.filter(F.col("event_type") == _KMV_SET_A).select(F.col("hs").alias("a"))
    b = sk.filter(F.col("event_type") == _KMV_SET_B).select(F.col("hs").alias("b"))
    est = kmv_set_ops(a.crossJoin(b), "a", "b", k)
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.col("event_type") == _KMV_SET_A).alias("ha"),
            F.max(F.col("event_type") == _KMV_SET_B).alias("hb"),
        )
    )
    ex = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_union"),
        F.sum((F.col("ha") & F.col("hb")).cast("int"))
        .cast("bigint")
        .alias("exact_inter"),
    )
    return est.crossJoin(ex).select(
        F.lit(k).cast("bigint").alias("k"),
        "est_union",
        "exact_union",
        F.round(
            (F.col("est_union") - F.col("exact_union")) / F.col("exact_union"), 4
        ).alias("err_union"),
        "est_jaccard",
        F.round(
            F.col("exact_inter").cast("double") / F.col("exact_union"), 6
        ).alias("exact_jaccard"),
        "est_intersection",
        "exact_inter",
    )


def _fertility_oracle(n_merges: int) -> str:
    toks = _TXT.tokens("text", "duck")
    init = (
        "concat(' ', array_to_string(list_append("
        "list_transform(range(1, length(word) + 1), "
        "j -> substr(word, j, 1)), '</w>'), '  '), ' ')"
    )
    segs = []
    for t in range(1, n_merges + 1):
        segs.append(f"""
fseg{t} AS MATERIALIZED (
  SELECT id, replace(s, ' ' || b.p1 || '  ' || b.p2 || ' ',
                        ' ' || b.p1 || b.p2 || ' ') AS s
  FROM fseg{t - 1}, b{t} b
)""")
    return f"""
WITH {_bpe_chain_ctes(n_merges)},
fseg0 AS (
  SELECT id, {init} AS s
  FROM (SELECT doc_id AS id, unnest({toks}) AS word FROM documents)
),
{','.join(segs)},
perdoc AS (
  SELECT id, COUNT(*) AS n_words,
         CAST(SUM(len(string_split(trim(s), '  '))) AS BIGINT) AS n_subwords
  FROM fseg{n_merges} GROUP BY id),
meta AS (SELECT doc_id AS id, source, strlen(text) AS nbytes
         FROM documents)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS words,
       CAST(SUM(n_subwords) AS BIGINT) AS subwords,
       ROUND(CAST(SUM(n_subwords) AS DOUBLE) / SUM(n_words), 6) AS fertility,
       ROUND(CAST(SUM(nbytes) AS DOUBLE) / SUM(n_subwords), 6)
         AS bytes_per_subword
FROM perdoc JOIN meta USING (id)
GROUP BY source ORDER BY source
"""


@query("tokenizer_fertility_eval", oracle=_fertility_oracle(8))
def tokenizer_fertility_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY self-eval per source: subwords-per-word and
    bytes-per-subword under the corpus-trained 8-merge BPE — the
    standard tokenizer-quality report (fertility near 1 = merges cover
    the domain; a high-fertility source costs proportionally more
    sequence length per byte of training data, the number that sizes a
    pretraining budget per data source).

    Scale: training is the vocabulary-sized bpe_learned_merges plan;
    application is the map-side literal-merge-table segmentation of
    bpe_segmented_corpus; the extra work here is one broadcast-joined
    doc-meta projection and a source-keyed rollup."""
    from dawis_spark.operators.bpe import bpe_segment, bpe_train

    docs = spark.table("documents")
    merges = [
        (r["left"], r["right"])
        for r in bpe_train(docs, "text", n_merges=8).collect()
    ]
    perdoc = bpe_segment(docs, "doc_id", "text", merges)
    meta = docs.select(
        F.col("doc_id").alias("id"),
        "source",
        F.octet_length("text").alias("nbytes"),
    )
    return (
        perdoc.join(meta, "id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("words"),
            F.sum("n_subwords").cast("bigint").alias("subwords"),
            F.round(F.sum("n_subwords") / F.sum("n_tokens"), 6).alias(
                "fertility"
            ),
            F.round(F.sum("nbytes") / F.sum("n_subwords"), 6).alias(
                "bytes_per_subword"
            ),
        )
        .orderBy("source")
    )


_NCC_SCALE = 1_000_000  # per-component int scaling for order-free sums
_NCC_DIM = 64
_NCC_TEST_MOD = 5  # vec_id % 5 == 0 -> test split (20%)


def _ncc_oracle() -> str:
    cos = _VEC.cosine("e.embedding", "c.cvec", "duck")
    return f"""
WITH train AS (
  SELECT label, embedding FROM embeddings WHERE vec_id % {_NCC_TEST_MOD} != 0),
comps AS (
  SELECT label, generate_subscripts(embedding, 1) AS dim,
         CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * {_NCC_SCALE}, 0)
              AS BIGINT) AS xs
  FROM train),
sums AS (
  SELECT label, dim, CAST(SUM(xs) AS BIGINT) AS s, COUNT(*) AS n
  FROM comps GROUP BY label, dim),
cents AS (
  SELECT label AS clabel,
         list(CAST(s AS DOUBLE) / (n * {_NCC_SCALE}.0) ORDER BY dim) AS cvec
  FROM sums GROUP BY label),
test AS (
  SELECT vec_id, label, embedding FROM embeddings
  WHERE vec_id % {_NCC_TEST_MOD} = 0),
scored AS (
  SELECT e.vec_id, e.label, c.clabel, ROUND({cos}, 6) AS cos
  FROM test e CROSS JOIN cents c),
pred AS (
  SELECT vec_id, label,
         (array_agg(clabel ORDER BY cos DESC, clabel))[1] AS predicted
  FROM scored GROUP BY vec_id, label)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(CASE WHEN predicted = label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       ROUND(CAST(SUM(CASE WHEN predicted = label THEN 1 ELSE 0 END)
         AS DOUBLE) / COUNT(*), 6) AS accuracy
FROM pred GROUP BY label ORDER BY label
"""


@query("nearest_centroid_accuracy", oracle=_ncc_oracle())
def nearest_centroid_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-class-centroid (Rocchio) classifier over the embedding
    table with a deterministic 80/20 id-hash split: per-label centroids
    from the train slice, cosine-argmax prediction on the test slice,
    per-label accuracy — the 5-minute baseline every embedding-quality
    audit starts with (if NCC can't separate the labels, the embeddings
    won't carry a downstream classifier either). On THIS synthetic
    corpus the audit's finding is negative: held-out accuracy sits at
    the random baseline (~7-10%) while train-set eval reaches ~43% —
    the labels are memorizable but not linearly generalizable, exactly
    the signal this query exists to surface before anyone trains on it.

    Engine-exactness: centroid sums are ORDER-FREE exact integers
    (components scale by 1e6 and round to bigint before summing — the
    logreg/graph discipline), so the centroid doubles are identical in
    any partitioning and both engines; cosines round to 6 digits before
    the argmax with ties to the lowest label (kmeans_assign discipline).

    Scale: the centroid build explodes to (label, dim) keys — a
    labels x dim bounded exchange of integer partial sums; the centroid
    relation (labels x dim doubles) broadcasts; scoring is a map-side
    cross of each test vector with k centroid rows and a per-vector
    argmax — no vector ever shuffles."""
    cos = _VEC.cosine("embedding", "cvec", "spark")
    emb = spark.table("embeddings")
    train = emb.filter(F.col("vec_id") % _NCC_TEST_MOD != 0)
    comps = train.select(
        "label", F.posexplode("embedding").alias("dim0", "x")
    ).select(
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.round(F.col("x").cast("double") * _NCC_SCALE, 0)
        .cast("bigint")
        .alias("xs"),
    )
    sums = comps.groupBy("label", "dim").agg(
        F.sum("xs").cast("bigint").alias("s"), F.count(F.lit(1)).alias("n")
    )
    cents = (
        sums.select(
            F.col("label").alias("clabel"),
            "dim",
            (F.col("s").cast("double") / (F.col("n") * float(_NCC_SCALE))).alias(
                "cv"
            ),
        )
        .groupBy("clabel")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(dim, cv))), e -> e.cv)")
            .alias("cvec")
        )
    )
    test = emb.filter(F.col("vec_id") % _NCC_TEST_MOD == 0).select(
        "vec_id", "label", "embedding"
    )
    scored = test.crossJoin(F.broadcast(cents)).select(
        "vec_id", "label", "clabel", F.round(F.expr(cos), 6).alias("cos")
    )
    pred = scored.groupBy("vec_id", "label").agg(
        F.expr(
            "element_at(transform(array_sort(collect_list("
            "struct(cos * -1 AS negcos, clabel))), e -> e.clabel), 1)"
        ).alias("predicted")
    )
    hit = F.when(F.col("predicted") == F.col("label"), 1).otherwise(0)
    return (
        pred.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(hit).cast("bigint").alias("n_correct"),
            F.round(F.sum(hit) / F.count(F.lit(1)), 6).alias("accuracy"),
        )
        .orderBy("label")
    )


_SHUF_EPOCHS = 2
_SHUF_SHARDS = 8


def _epoch_shuffle_oracle() -> str:
    from dawis_spark.operators.sketches import _int_mix

    h = _int_mix(f"(doc_id * 31 + 1000003 * e)")
    return f"""
WITH expanded AS (
  SELECT doc_id, e.e AS epoch, {h} AS h
  FROM documents, range(0, {_SHUF_EPOCHS}) e(e)),
placed AS (
  SELECT epoch, h % {_SHUF_SHARDS} AS shard, h, doc_id FROM expanded),
pos AS (
  SELECT epoch, shard,
         ROW_NUMBER() OVER (PARTITION BY epoch, shard ORDER BY h, doc_id)
           AS position
  FROM placed)
SELECT CAST(epoch AS INT) AS epoch, CAST(shard AS INT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MAX(position) AS BIGINT) AS max_pos,
       (CAST(MAX(position) AS BIGINT) = COUNT(*)) AS dense_ok
FROM pos GROUP BY epoch, shard ORDER BY epoch, shard
"""


@query("epoch_shuffle_order", oracle=_epoch_shuffle_oracle())
def epoch_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic EPOCH SHUFFLE for training reproducibility: each
    (doc, epoch) gets a uniformized integer hash; shard = h mod 8,
    within-shard order = (h, doc_id) — so every epoch is a different
    but fully reproducible permutation, any shard is readable
    independently, and a crashed run resumes at an exact (epoch, shard,
    position). This is the data-ordering contract pretraining loaders
    (e.g. deterministic samplers over packed shards) rely on; the
    verification rollup asserts positions are dense 1..n per shard.

    Scale: the epoch fanout is a map-side x2 explode; the only exchange
    hash-partitions by (epoch, shard) — exactly the parallelism of the
    output shards — and the per-shard window sorts shard-sized slices
    (corpus/16 rows each). No global sort anywhere."""
    from dawis_spark.operators.sketches import _int_mix
    from pyspark.sql import Window

    h = _int_mix(f"(doc_id * 31 + 1000003 * e)")
    placed = (
        spark.table("documents")
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(_SHUF_EPOCHS - 1))).alias("e"),
        )
        .select(
            F.col("e").cast("int").alias("epoch"),
            "doc_id",
            F.expr(h).alias("h"),
        )
        .withColumn("shard", (F.col("h") % _SHUF_SHARDS).cast("int"))
    )
    w = Window.partitionBy("epoch", "shard").orderBy("h", "doc_id")
    pos = placed.withColumn("position", F.row_number().over(w))
    return (
        pos.groupBy("epoch", "shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.max("position").cast("bigint").alias("max_pos"),
            (F.max("position").cast("bigint") == F.count(F.lit(1))).alias(
                "dense_ok"
            ),
        )
        .orderBy("epoch", "shard")
    )


_ZIPF_TOP = 200


def _zipf_oracle() -> str:
    toks = _TXT.tokens("text", "duck")

    def fold(term: str) -> str:
        return (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(ps, e -> {term})), (a, v) -> a + v)"
        )

    return f"""
WITH tk AS (SELECT unnest({toks}) AS token FROM documents),
tf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS freq FROM tk GROUP BY token),
top AS (SELECT token, freq FROM tf ORDER BY freq DESC, token LIMIT {_ZIPF_TOP}),
arr AS (
  SELECT list_transform(
           list_sort(list(struct_pack(nf := -freq, token := token))),
           e -> ln(CAST(-e.nf AS DOUBLE))) AS ys
  FROM top),
pairs AS (
  SELECT len(ys) AS n,
         list_transform(range(1, len(ys) + 1),
           i -> struct_pack(x := ln(CAST(i AS DOUBLE)), y := ys[i])) AS ps
  FROM arr),
sums AS (
  SELECT CAST(n AS DOUBLE) AS n,
         {fold('e.x')} AS sx, {fold('e.y')} AS sy,
         {fold('e.x * e.x')} AS sxx, {fold('e.y * e.y')} AS syy,
         {fold('e.x * e.y')} AS sxy
  FROM pairs)
SELECT CAST(n AS BIGINT) AS n_top,
       ROUND(-((n * sxy - sx * sy) / (n * sxx - sx * sx)), 6) AS s_hat,
       ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
         AS intercept,
       ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM sums
"""


@query("zipf_exponent_fit", oracle=_zipf_oracle())
def zipf_exponent_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf exponent of the corpus token distribution: least-squares fit
    of ln(freq) on ln(rank) over the top-200 terms — the one-number
    summary of vocabulary health (natural text sits near s = 1;
    markedly lower = templated/synthetic text, higher = degenerate
    repetition). Reports s_hat, the intercept, and the fit's R².

    Engine-exactness: the five regression sums fold SEQUENTIALLY over
    the rank-sorted top-200 array gathered onto one row — the nDCG/BM25
    ordered-fold discipline — and the closed forms render identically,
    so both engines produce the same doubles before rounding.

    Scale: one token-count aggregate (vocabulary-sized exchange), a
    top-200 TakeOrdered, then O(200) arithmetic on a single row."""
    toks = _TXT.tokens("text", "spark")
    tf = (
        spark.table("documents")
        .select(F.explode(F.expr(toks)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    top = tf.orderBy(F.desc("freq"), "token").limit(_ZIPF_TOP)
    arr = top.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(cast(-freq as bigint)"
            " as nf, token))), e -> ln(cast(-e.nf as double)))"
        ).alias("ys")
    )
    pairs = arr.select(
        F.expr("size(ys)").alias("n0"),
        F.expr(
            "transform(sequence(1, size(ys)), i -> struct("
            "ln(cast(i as double)) as x, element_at(ys, i) as y))"
        ).alias("ps"),
    )

    def fold(term: str) -> str:
        return (
            f"aggregate(ps, cast(0.0 as double), (a, e) -> a + ({term}))"
        )

    sums = pairs.select(
        F.col("n0").cast("double").alias("n"),
        F.expr(fold("e.x")).alias("sx"),
        F.expr(fold("e.y")).alias("sy"),
        F.expr(fold("e.x * e.x")).alias("sxx"),
        F.expr(fold("e.y * e.y")).alias("syy"),
        F.expr(fold("e.x * e.y")).alias("sxy"),
    )
    b = "((n * sxy - sx * sy) / (n * sxx - sx * sx))"
    return sums.select(
        F.col("n").cast("bigint").alias("n_top"),
        F.round(F.expr(f"-{b}"), 6).alias("s_hat"),
        F.round(F.expr(f"(sy - {b} * sx) / n"), 6).alias("intercept"),
        F.round(
            F.expr(
                "(n * sxy - sx * sy) * (n * sxy - sx * sy)"
                " / ((n * sxx - sx * sx) * (n * syy - sy * sy))"
            ),
            6,
        ).alias("r2"),
    )


_BURST_TOP = 25


def _burstiness_oracle() -> str:
    toks = _TXT.tokens("text", "duck")
    return f"""
WITH nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
tk AS (SELECT doc_id, unnest({toks}) AS token FROM documents),
percell AS (
  SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM tk GROUP BY token, doc_id),
stats AS (
  SELECT token,
         CAST(COUNT(*) AS BIGINT) AS docs_with,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c * c) AS BIGINT) AS q
  FROM percell GROUP BY token)
SELECT token, s AS total_tf, docs_with,
       ROUND(CAST(n_docs * CAST(q AS HUGEINT) - CAST(s AS HUGEINT) * CAST(s AS HUGEINT) AS DOUBLE)
             / (n_docs * s), 6)
         AS dispersion,
       (n_docs * CAST(q AS HUGEINT) - CAST(s AS HUGEINT) * CAST(s AS HUGEINT)
          > n_docs * CAST(s AS HUGEINT)) AS overdispersed
FROM stats, nd
ORDER BY total_tf DESC, token LIMIT {_BURST_TOP}
"""


@query("token_burstiness_topk", oracle=_burstiness_oracle())
def token_burstiness_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token BURSTINESS (variance-to-mean dispersion index over per-doc
    counts, zeros included) for the top-25 corpus terms — Church &
    Gale's burstiness: D ~ 1 means Poisson-spread usage, D >> 1 means
    the term clumps into few documents (keyword stuffing / boilerplate
    / topical islands — a spam signal quality filters act on).

    Exactness: D = (N·Σc² − (Σc)²) / (N·Σc) is computed entirely in
    exact integer arithmetic with ONE final division, and the
    overdispersion flag is a pure integer comparison — partition-order
    invariant in both engines.

    Scale: one (token, doc) aggregate (the tf relation every retrieval
    query already builds), a vocabulary-sized stats rollup, TakeOrdered
    top-25. The doc count broadcasts as a 1-row aggregate."""
    toks = _TXT.tokens("text", "spark")
    docs = spark.table("documents")
    nd = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    percell = (
        docs.select("doc_id", F.explode(F.expr(toks)).alias("token"))
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    stats = percell.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs_with"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("q"),
    )
    # the N·Σc² − (Σc)² difference is computed in decimal(38,0) (HUGEINT
    # in the oracle): a hot token with s > ~3e9 would silently wrap the
    # int64 s·s in Spark while DuckDB errors — the same engine-parity
    # overflow class the bootstrap/contrastive hashes fixed. Exact for
    # s < 1e19 (a 100 TB corpus tops out ~1e12 for the hottest term).
    sd = F.col("s").cast("decimal(38,0)")
    qd = F.col("q").cast("decimal(38,0)")
    diff = F.col("n_docs") * qd - sd * sd
    return (
        stats.crossJoin(F.broadcast(nd))
        .select(
            "token",
            F.col("s").alias("total_tf"),
            "docs_with",
            F.round(
                diff.cast("double") / (F.col("n_docs") * F.col("s")),
                6,
            ).alias("dispersion"),
            (diff > (F.col("n_docs") * sd)).alias("overdispersed"),
        )
        .orderBy(F.desc("total_tf"), "token")
        .limit(_BURST_TOP)
    )


_CMJ_D, _CMJ_W = 4, 512
_CMJ_A, _CMJ_B = "view", "purchase"


def _cm_join_oracle() -> str:
    from dawis_spark.operators.sketches import cm_oracle_ctes

    side_a = f"(SELECT user_id FROM events WHERE event_type = '{_CMJ_A}')"
    side_b = f"(SELECT user_id FROM events WHERE event_type = '{_CMJ_B}')"
    return f"""
WITH {cm_oracle_ctes(side_a, 'user_id', _CMJ_D, _CMJ_W, 'cma')},
{cm_oracle_ctes(side_b, 'user_id', _CMJ_D, _CMJ_W, 'cmb')},
per_row AS (
  SELECT a.row, CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS ip
  FROM cma a JOIN cmb b ON a.row = b.row AND a.bucket = b.bucket
  GROUP BY a.row),
est AS (SELECT CAST(MIN(ip) AS BIGINT) AS cm_join_size FROM per_row),
ex AS (
  SELECT CAST(SUM(fa.n * fb.n) AS BIGINT) AS exact_join_size
  FROM (SELECT user_id, COUNT(*) AS n FROM {side_a} GROUP BY user_id) fa
  JOIN (SELECT user_id, COUNT(*) AS n FROM {side_b} GROUP BY user_id) fb
    ON fa.user_id = fb.user_id)
SELECT CAST({_CMJ_D} AS BIGINT) AS d, CAST({_CMJ_W} AS BIGINT) AS w,
       cm_join_size, exact_join_size,
       ROUND(CAST(cm_join_size - exact_join_size AS DOUBLE)
             / exact_join_size, 4) AS rel_overestimate
FROM est, ex
"""


@query("cm_join_size_estimate", oracle=_cm_join_oracle())
def cm_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-SIZE estimation from Count-Min sketches (the AMS/CM inner
    product, Alon-Matias-Szegedy 1996; Cormode & Muthukrishnan 2005
    §4.2): |R ⋈ S on key| = Σ_v f_R(v)·f_S(v), estimated per sketch row
    as Σ_b R[i][b]·S[i][b] and taken as the MIN over the d rows — never
    an underestimate, within ε·|R|·|S| w.h.p. The cardinality-estimation
    primitive a cost-based optimizer (or an admission controller
    deciding whether a join is runnable at all) consults BEFORE paying
    the join: here viewer-stream ⋈ purchase-stream on user_id. The
    exact twin is the realized self-eval.

    Scale: each sketch build is a d×w-bounded exchange regardless of
    input size; the estimate joins two d×w relations. The exact twin
    pays two user-keyed aggregates + a join — the cost the sketch
    consults without paying."""
    from dawis_spark.operators.sketches import cm_sketch

    ev = spark.table("events")
    a = ev.filter(F.col("event_type") == _CMJ_A).select("user_id")
    b = ev.filter(F.col("event_type") == _CMJ_B).select("user_id")
    ska = cm_sketch(a, "user_id", d=_CMJ_D, w=_CMJ_W)
    skb = cm_sketch(b, "user_id", d=_CMJ_D, w=_CMJ_W)
    per_row = (
        ska.alias("a")
        .join(
            skb.alias("b"),
            (F.col("a.row") == F.col("b.row"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .groupBy(F.col("a.row"))
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).cast("bigint").alias("ip"))
    )
    est = per_row.agg(F.min("ip").cast("bigint").alias("cm_join_size"))
    fa = a.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_a"))
    fb = b.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_b"))
    ex = (
        fa.join(fb, "user_id")
        .agg(
            F.sum(F.col("n_a") * F.col("n_b"))
            .cast("bigint")
            .alias("exact_join_size")
        )
    )
    return est.crossJoin(ex).select(
        F.lit(_CMJ_D).cast("bigint").alias("d"),
        F.lit(_CMJ_W).cast("bigint").alias("w"),
        "cm_join_size",
        "exact_join_size",
        F.round(
            (F.col("cm_join_size") - F.col("exact_join_size")).cast("double")
            / F.col("exact_join_size"),
            4,
        ).alias("rel_overestimate"),
    )


_AES_K = 100


def _aes_oracle() -> str:
    from dawis_spark.operators.sketches import _int_mix

    toks = _TXT.tokens("text", "duck")
    u = f"(({_int_mix('doc_id * 13 + 7')}) % 1000000 + 1) / 1000001.0"
    return f"""
WITH base AS (
  SELECT doc_id, source,
         CAST(len({toks}) AS BIGINT) AS w_tokens,
         {u} AS u
  FROM documents),
keyed AS (
  SELECT doc_id, source, w_tokens,
         ROUND(exp(ln(u) / w_tokens), 6) AS key_r
  FROM base WHERE w_tokens > 0)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY key_r DESC, doc_id) AS BIGINT) AS rk,
       doc_id, source, w_tokens, key_r
FROM keyed ORDER BY key_r DESC, doc_id LIMIT {_AES_K}
"""


@query("weighted_sample_without_replacement", oracle=_aes_oracle())
def weighted_sample_without_replacement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fixed-size weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006 A-ES): every document draws key = u^(1/w) from a
    hash-uniform u and its token-count weight; the global top-k by key
    IS a weighted sample without replacement — the one-pass,
    merge-friendly design for 'give me exactly 100 documents, long ones
    proportionally more often' (PPS/Poisson sampling only bounds the
    EXPECTED size; A-ES hits k exactly). Deterministic: u is the
    uniformized id hash (reproducible across runs/engines/partitions),
    keys round to 6 digits before ranking with doc_id tie-breaks.

    Scale: key evaluation rides the scan; the only reduction is a top-k
    (TakeOrdered — per-partition heaps, no global sort). The k-th key
    threshold makes the sample mergeable across shards: union the
    per-shard top-k and re-take k."""
    from dawis_spark.operators.sketches import _int_mix

    toks = _TXT.tokens("text", "spark")
    u = f"(({_int_mix('doc_id * 13 + 7')}) % 1000000 + 1) / 1000001.0"
    keyed = (
        spark.table("documents")
        .select(
            "doc_id",
            "source",
            F.expr(f"cast(size({toks}) as bigint)").alias("w_tokens"),
            F.expr(u).alias("u"),
        )
        .filter(F.col("w_tokens") > 0)
        .select(
            "doc_id",
            "source",
            "w_tokens",
            F.round(F.expr("exp(ln(u) / w_tokens)"), 6).alias("key_r"),
        )
    )
    top = keyed.orderBy(F.desc("key_r"), "doc_id").limit(_AES_K)
    # rank the k-bounded head via a sorted-array posexplode, NOT a
    # partition-less row_number window (the round-10 no-WindowExec-WARN
    # discipline; k = 100 structs on one row)
    arr = top.agg(
        F.expr(
            "array_sort(collect_list(struct(-key_r AS nk, doc_id, source,"
            " w_tokens, key_r)))"
        ).alias("a")
    )
    return (
        arr.select(F.posexplode("a").alias("p", "s"))
        .select(
            (F.col("p") + 1).cast("bigint").alias("rk"),
            F.col("s.doc_id").alias("doc_id"),
            F.col("s.source").alias("source"),
            F.col("s.w_tokens").alias("w_tokens"),
            F.col("s.key_r").alias("key_r"),
        )
        .orderBy("rk")
    )


_MASE_H = 7  # test horizon: the trailing week


_MASE_ORACLE = f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2),
mx AS (SELECT MAX(day) AS maxd FROM daily),
test AS (
  SELECT t.event_type, CAST(ABS(t.v - p.v) AS BIGINT) AS ae
  FROM daily t JOIN daily p
    ON t.event_type = p.event_type AND p.day = t.day - INTERVAL 7 DAY
  CROSS JOIN mx WHERE t.day > mx.maxd - INTERVAL {_MASE_H} DAY),
train AS (
  SELECT t.event_type, CAST(ABS(t.v - p.v) AS BIGINT) AS ae
  FROM daily t JOIN daily p
    ON t.event_type = p.event_type AND p.day = t.day - INTERVAL 1 DAY
  CROSS JOIN mx WHERE t.day <= mx.maxd - INTERVAL {_MASE_H} DAY),
te AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_test,
              CAST(SUM(ae) AS BIGINT) AS sae_test FROM test GROUP BY 1),
tr AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_train,
              CAST(SUM(ae) AS BIGINT) AS sae_train FROM train GROUP BY 1)
SELECT event_type, n_train, n_test,
       ROUND(CAST(sae_test AS DOUBLE) / n_test, 4) AS mae_naive_cents,
       ROUND(CAST(sae_train AS DOUBLE) / n_train, 4) AS mae_insample_cents,
       ROUND((CAST(sae_test AS DOUBLE) / n_test)
             / (CAST(sae_train AS DOUBLE) / n_train), 6) AS mase
FROM te JOIN tr USING (event_type) ORDER BY event_type
"""


@query("seasonal_naive_mase", oracle=_MASE_ORACLE)
def seasonal_naive_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE (Hyndman & Koehler 2006) of the SEASONAL-NAIVE forecast
    (y_hat(d) = y(d-7)) over the trailing week, scaled by the in-sample
    one-step naive MAE — the scale-free forecast-accuracy yardstick the
    Holt/STL family should be judged against: MASE < 1 beats the naive
    random walk; a seasonal-naive MASE near 1 says the series has no
    exploitable weekly structure beyond level persistence. Absolute
    errors are exact integer cents; date-JOINED lags (day = day - 7),
    not row lags, so calendar gaps can't silently misalign the
    comparison — two final divisions per row.

    Scale: one daily rollup (the exchange every forecast query already
    pays), two self-joins on (type, day) over the calendar-bounded daily
    relation, and a |types|-keyed aggregate."""
    daily = (
        spark.table("events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("v")
        )
    )
    mx = daily.agg(F.max("day").alias("maxd"))
    d = daily.crossJoin(F.broadcast(mx))
    t7 = d.alias("t").join(
        daily.alias("p"),
        (F.col("t.event_type") == F.col("p.event_type"))
        & (F.col("p.day") == F.expr("t.day - INTERVAL 7 DAY")),
    )
    test = t7.filter(
        F.expr(f"t.day > maxd - INTERVAL {_MASE_H} DAY")
    ).select(
        F.col("t.event_type").alias("event_type"),
        F.abs(F.col("t.v") - F.col("p.v")).cast("bigint").alias("ae"),
    )
    t1 = d.alias("t").join(
        daily.alias("p"),
        (F.col("t.event_type") == F.col("p.event_type"))
        & (F.col("p.day") == F.expr("t.day - INTERVAL 1 DAY")),
    )
    train = t1.filter(
        F.expr(f"t.day <= maxd - INTERVAL {_MASE_H} DAY")
    ).select(
        F.col("t.event_type").alias("event_type"),
        F.abs(F.col("t.v") - F.col("p.v")).cast("bigint").alias("ae"),
    )
    te = test.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum("ae").cast("bigint").alias("sae_test"),
    )
    tr = train.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_train"),
        F.sum("ae").cast("bigint").alias("sae_train"),
    )
    return (
        te.join(tr, "event_type")
        .select(
            "event_type",
            "n_train",
            "n_test",
            F.round(F.col("sae_test").cast("double") / F.col("n_test"), 4).alias(
                "mae_naive_cents"
            ),
            F.round(
                F.col("sae_train").cast("double") / F.col("n_train"), 4
            ).alias("mae_insample_cents"),
            F.round(
                (F.col("sae_test").cast("double") / F.col("n_test"))
                / (F.col("sae_train").cast("double") / F.col("n_train")),
                6,
            ).alias("mase"),
        )
        .orderBy("event_type")
    )


_LDIV_THRESHOLDS = [2, 3, 5]


_LDIV_ORACLE = f"""
WITH qi AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band
  FROM customer),
classes AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(DISTINCT bal_band) AS BIGINT) AS l
  FROM qi GROUP BY 1, 2),
tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS n FROM classes)
SELECT t.l AS l_threshold,
       CAST(SUM(CASE WHEN c.l < t.l THEN 1 ELSE 0 END) AS BIGINT)
         AS classes_below,
       CAST(SUM(CASE WHEN c.l < t.l THEN c.n_rows ELSE 0 END) AS BIGINT)
         AS rows_at_risk,
       ROUND(CAST(SUM(CASE WHEN c.l < t.l THEN c.n_rows ELSE 0 END)
             AS DOUBLE) / MIN(tot.n), 6) AS risk_frac
FROM classes c CROSS JOIN (SELECT unnest([{', '.join(map(str, _LDIV_THRESHOLDS))}]) AS l) t
CROSS JOIN tot
GROUP BY t.l ORDER BY t.l
"""


@query("l_diversity_profile", oracle=_LDIV_ORACLE)
def l_diversity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity risk profile (Machanavajjhala et al. 2007) — the
    k-anonymity companion: a class of identical quasi-identifiers
    (nation, market segment) is safe only if its SENSITIVE attribute
    (balance band) takes at least l distinct values; k-anonymity alone
    passes a class of 1000 rows that all share one salary band, and
    this is the query that catches it. Per l in {2, 3, 5}: classes
    below l and the row fraction exposed to homogeneity attacks.

    Scale: one groupBy over the QI tuple (count + count-distinct of the
    sensitive attribute) is the only row-scale shuffle; the threshold
    fan-out runs over the class-count relation."""
    classes = (
        spark.table("customer")
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
        )
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("bal_band").cast("bigint").alias("l"),
        )
    )
    tot = classes.agg(F.sum("n_rows").cast("bigint").alias("n"))
    fan = classes.crossJoin(F.broadcast(tot)).select(
        "n_rows",
        "l",
        "n",
        F.explode(
            F.array(*[F.lit(t) for t in _LDIV_THRESHOLDS])
        ).alias("l_threshold"),
    )
    below = F.when(F.col("l") < F.col("l_threshold"), 1).otherwise(0)
    rows_below = F.when(
        F.col("l") < F.col("l_threshold"), F.col("n_rows")
    ).otherwise(0)
    return (
        fan.groupBy("l_threshold")
        .agg(
            F.sum(below).cast("bigint").alias("classes_below"),
            F.sum(rows_below).cast("bigint").alias("rows_at_risk"),
            F.round(F.sum(rows_below).cast("double") / F.min("n"), 6).alias(
                "risk_frac"
            ),
        )
        .orderBy("l_threshold")
    )


_FD_ORACLE = """
WITH cells AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY source, lang),
per_det AS (
  SELECT source, CAST(SUM(n) AS BIGINT) AS n_rows,
         CAST(MAX(n) AS BIGINT) AS n_majority,
         CAST(COUNT(*) AS BIGINT) AS n_values
  FROM cells GROUP BY source)
SELECT source, n_rows, n_values, n_majority,
       CAST(n_rows - n_majority AS BIGINT) AS violations,
       ROUND(CAST(n_majority AS DOUBLE) / n_rows, 6) AS fd_confidence
FROM per_det ORDER BY source
"""


@query("fd_confidence_profile", oracle=_FD_ORACLE)
def fd_confidence_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate functional-dependency discovery (the g3-error of
    Kivinen & Mannila 1995, the measure FD profilers like Metanome's
    TANE report): does source -> lang hold? Per determinant value: the
    majority dependent's share (fd_confidence = 1 means the FD holds
    exactly there; violations counts the rows a repair would touch).
    The data-profiling primitive that turns 'we think every source is
    monolingual' into a measured, alertable number.

    Scale: one (source, lang) cell aggregate — the exchange is bounded
    by the attribute-pair cardinality, never rows — then a
    determinant-keyed rollup of the cell relation."""
    cells = (
        spark.table("documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return (
        cells.groupBy("source")
        .agg(
            F.sum("n").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_values"),
            F.max("n").cast("bigint").alias("n_majority"),
        )
        .select(
            "source",
            "n_rows",
            "n_values",
            "n_majority",
            (F.col("n_rows") - F.col("n_majority"))
            .cast("bigint")
            .alias("violations"),
            F.round(
                F.col("n_majority").cast("double") / F.col("n_rows"), 6
            ).alias("fd_confidence"),
        )
        .orderBy("source")
    )


_GAP_THRESHOLDS_S = [600, 1800, 3600]


_GAP_CURVE_ORACLE = f"""
WITH ordered AS (
  SELECT user_id,
         CAST(date_diff('second', lag(ts) OVER w, ts) AS BIGINT) AS gap_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
users AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM events),
t AS (SELECT unnest([{', '.join(map(str, _GAP_THRESHOLDS_S))}]) AS gap_limit_s)
SELECT t.gap_limit_s,
       CAST(u.n_users + SUM(CASE WHEN o.gap_s > t.gap_limit_s THEN 1 ELSE 0 END)
         AS BIGINT) AS n_sessions,
       ROUND(CAST(u.n_users + SUM(CASE WHEN o.gap_s > t.gap_limit_s
             THEN 1 ELSE 0 END) AS DOUBLE) / u.n_users, 4)
         AS sessions_per_user
FROM ordered o CROSS JOIN t CROSS JOIN users u
WHERE o.gap_s IS NOT NULL
GROUP BY t.gap_limit_s, u.n_users ORDER BY t.gap_limit_s
"""


@query("session_gap_curve", oracle=_GAP_CURVE_ORACLE)
def session_gap_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session count as a function of the inactivity threshold (10/30/60
    minutes) — the evidence behind choosing a session timeout: sessions
    = users + gaps exceeding the threshold, so ONE user-ordered window
    pass prices every candidate simultaneously (each threshold is a
    map-side CASE over the same gap column; no per-threshold re-window).
    The elbow of this curve is where the 30-minute industry default
    comes from — or doesn't, for this corpus.

    Scale: the single (user) window exchange the journey family already
    pays, then a 3-key rollup; thresholds fan out map-side."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        spark.table("events")
        .select(
            "user_id",
            (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)))
            .cast("bigint")
            .alias("gap_s"),
        )
        .filter(F.col("gap_s").isNotNull())
    )
    users = spark.table("events").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )
    fan = gaps.crossJoin(F.broadcast(users)).select(
        "gap_s",
        "n_users",
        F.explode(
            F.array(*[F.lit(t) for t in _GAP_THRESHOLDS_S])
        ).alias("gap_limit_s"),
    )
    breaks = F.when(F.col("gap_s") > F.col("gap_limit_s"), 1).otherwise(0)
    return (
        fan.groupBy("gap_limit_s", "n_users")
        .agg(F.sum(breaks).alias("nb"))
        .select(
            "gap_limit_s",
            (F.col("n_users") + F.col("nb")).cast("bigint").alias("n_sessions"),
            F.round(
                (F.col("n_users") + F.col("nb")).cast("double")
                / F.col("n_users"),
                4,
            ).alias("sessions_per_user"),
        )
        .orderBy("gap_limit_s")
    )


def _split_leakage_oracle(threshold: float) -> str:
    pairs = _lsh_pairs_oracle(threshold).strip().rstrip()
    # strip the trailing ORDER BY so the pair relation composes as a CTE
    pairs = pairs[: pairs.rindex("ORDER BY")]
    h = _TXT.char_hash("concat('split', cast(doc_id as varchar))", "duck")
    return f"""
WITH pairs AS ({pairs}),
sp AS (
  SELECT doc_id,
         CASE WHEN ({h}) % 100 < 90 THEN 'train'
              WHEN ({h}) % 100 < 95 THEN 'val'
              ELSE 'test' END AS split
  FROM documents)
SELECT p.id_a, p.id_b, sa.split AS split_a, sb.split AS split_b, p.jaccard
FROM pairs p JOIN sp sa ON p.id_a = sa.doc_id
             JOIN sp sb ON p.id_b = sb.doc_id
WHERE sa.split != sb.split
ORDER BY p.id_a, p.id_b
"""


@query("split_leakage_neardups", oracle=_split_leakage_oracle(0.2))
def split_leakage_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval SPLIT LEAKAGE audit: near-duplicate pairs (the
    MinHash+LSH pipeline, Jaccard >= 0.2) that STRADDLE the 90/5/5
    hash-split boundaries — each one is an eval document whose
    near-copy sits in training, i.e. a measured leak that inflates eval
    metrics (the within-corpus complement of benchmark_contamination,
    which only checks against an external benchmark). The canonical
    fix ordering — dedup BEFORE splitting — is exactly what this query
    verifies or indicts.

    Scale: the near-dup relation is the banded minhash_lsh_pairs plan
    (band-bucket self-join, candidates-only verify); split labels
    evaluate map-side from the id hash (zero extra exchange — the join
    back to splits keys on doc_id)."""
    from dawis_spark.operators.corpus import hash_split
    from dawis_spark.operators.dedup import minhash_near_duplicates

    docs = spark.table("documents")
    pairs = minhash_near_duplicates(
        docs,
        "doc_id",
        "text",
        n_perms=_N_PERMS,
        bands=_BANDS,
        threshold=0.2,
        shingle_k=_SHINGLE_K,
    )
    sp = hash_split(
        docs.select("doc_id"), "doc_id", {"train": 0.90, "val": 0.05, "test": 0.05}
    )
    sa = sp.select(F.col("doc_id").alias("id_a"), F.col("split").alias("split_a"))
    sb = sp.select(F.col("doc_id").alias("id_b"), F.col("split").alias("split_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b", "jaccard")
        .orderBy("id_a", "id_b")
    )


def _hll_union_oracle() -> str:
    from dawis_spark.operators.sketches import (
        HLL_B,
        HLL_LC,
        HLL_LC_THRESHOLD,
        HLL_M,
        HLL_NUM,
        _hll_j_rho,
    )

    j, rho = _hll_j_rho("user_id", "duck", numeric=True)

    def regs(src: str, prefix: str) -> str:
        return (
            f"{prefix} AS (SELECT j, MAX(rho) AS r FROM ("
            f"SELECT {j} AS j, {rho} AS rho FROM {src}) GROUP BY j)"
        )

    lc_arr = ", ".join(repr(x) for x in HLL_LC)

    def est(regs_cte: str, prefix: str) -> str:
        return f"""{prefix}_agg AS (
  SELECT CAST({HLL_M} - COUNT(*) AS BIGINT) AS v_empty,
         CAST(SUM(1::BIGINT << ({HLL_B} - r))
              + ({HLL_M} - COUNT(*)) * {1 << HLL_B} AS BIGINT) AS s_scaled
  FROM {regs_cte}),
{prefix} AS (
  SELECT ROUND(CASE WHEN v_empty > 0
                     AND {HLL_NUM!r} / s_scaled <= {HLL_LC_THRESHOLD!r}
               THEN ([{lc_arr}])[CAST(v_empty AS INT) + 1]
               ELSE {HLL_NUM!r} / s_scaled END, 4) AS est
  FROM {prefix}_agg)"""

    a = "(SELECT user_id FROM events WHERE event_type = 'view')"
    b = "(SELECT user_id FROM events WHERE event_type = 'purchase')"
    return f"""
WITH {regs(a, 'ra')},
{regs(b, 'rb')},
ru AS (SELECT j, MAX(r) AS r FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb)
       GROUP BY j),
{est('ra', 'ea')},
{est('rb', 'eb')},
{est('ru', 'eu')},
ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_union,
              CAST(SUM(CASE WHEN ha AND hb THEN 1 ELSE 0 END) AS BIGINT)
                AS exact_inter
       FROM (SELECT user_id, BOOL_OR(event_type = 'view') AS ha,
                    BOOL_OR(event_type = 'purchase') AS hb
             FROM events WHERE event_type IN ('view', 'purchase')
             GROUP BY user_id))
SELECT ea.est AS est_view, eb.est AS est_purchase, eu.est AS est_union,
       ROUND(GREATEST(ea.est + eb.est - eu.est, 0.0), 4) AS est_inter,
       exact_union, exact_inter,
       ROUND((eu.est - exact_union) / exact_union, 4) AS err_union
FROM ea, eb, eu, ex
"""


@query("hll_union_events", oracle=_hll_union_oracle())
def hll_union_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL SET MERGEABILITY as a first-class operation: the union of two
    audiences is the ELEMENT-WISE MAX of their register vectors (the
    property that makes HLL the warehouse sketch — per-segment sketches
    roll up to any grouping without rescanning), and the intersection
    falls out by inclusion-exclusion (clamped at 0 — the estimator's
    known weakness for small overlaps, which the exact twin prices).
    The KMV flavor of this algebra is kmv_set_algebra; HLL trades its
    per-element arrays for 64 fixed registers.

    Scale: each register build is the 64-key partial-max exchange; the
    merge is a 128-row union + 64-key max; estimates are one row each."""
    from dawis_spark.operators.sketches import hll_estimate, hll_registers

    ev = spark.table("events")
    ra = hll_registers(
        ev.filter(F.col("event_type") == "view").select("user_id"),
        "user_id",
        numeric=True,
    )
    rb = hll_registers(
        ev.filter(F.col("event_type") == "purchase").select("user_id"),
        "user_id",
        numeric=True,
    )
    ru = ra.unionAll(rb).groupBy("j").agg(F.max("r").alias("r"))
    ea = hll_estimate(ra).select(F.col("est").alias("est_view"))
    eb = hll_estimate(rb).select(F.col("est").alias("est_purchase"))
    eu = hll_estimate(ru).select(F.col("est").alias("est_union"))
    per_user = (
        ev.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy("user_id")
        .agg(
            F.max(F.col("event_type") == "view").alias("ha"),
            F.max(F.col("event_type") == "purchase").alias("hb"),
        )
    )
    ex = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_union"),
        F.sum((F.col("ha") & F.col("hb")).cast("int"))
        .cast("bigint")
        .alias("exact_inter"),
    )
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .crossJoin(ex)
        .select(
            "est_view",
            "est_purchase",
            "est_union",
            F.round(
                F.greatest(
                    F.col("est_view") + F.col("est_purchase") - F.col("est_union"),
                    F.lit(0.0),
                ),
                4,
            ).alias("est_inter"),
            "exact_union",
            "exact_inter",
            F.round(
                (F.col("est_union") - F.col("exact_union")) / F.col("exact_union"),
                4,
            ).alias("err_union"),
        )
    )


# Fellegi-Sunter field weights in integer MILLI-BITS, literal at
# authoring time (like _WILSON_Z — never computed at query time, so both
# engines sum identical bigints). agree = round(1000*log2(m/u)),
# disagree = round(1000*log2((1-m)/(1-u))) for per-field (m, u):
#   name_sim (lev<=2):     m=0.90 u=0.05 ->  +4170 / -3248
#   type_eq:               m=0.80 u=0.10 ->  +3000 / -2170
#   price_sim (<=100 ct):  m=0.85 u=0.05 ->  +4087 / -2663
_FS_W = {
    "name": (4170, -3248),
    "type": (3000, -2170),
    "price": (4087, -2663),
}
_FS_LINK, _FS_POSSIBLE = 5000, 0  # milli-bit thresholds


def _fs_weight_sql(field: str, agree_expr: str) -> str:
    a, d = _FS_W[field]
    return f"CASE WHEN {agree_expr} THEN {a} ELSE {d} END"


def _fs_oracle() -> str:
    pat = {
        "name": "levenshtein(a.p_name, b.p_name) <= 2",
        "type": "a.p_type = b.p_type",
        "price": "abs(a.pc - b.pc) <= 100",
    }
    agree_cols = ", ".join(
        f"CAST({expr} AS BOOLEAN) AS {f}_agree" for f, expr in pat.items()
    )
    wsum = " + ".join(_fs_weight_sql(f, f"{f}_agree") for f in _FS_W)
    all_w = sum(_FS_W[f][0] for f in _FS_W)
    return f"""
WITH recs AS (
  SELECT p_name, p_brand, p_type, p_size,
         CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS pc,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM part GROUP BY 1, 2, 3, 4, 5),
cross_pairs AS (
  SELECT {agree_cols}, a.n * b.n AS mult
  FROM recs a JOIN recs b
    ON a.p_brand = b.p_brand AND a.p_size = b.p_size
   AND (a.p_name, a.p_type, a.pc) < (b.p_name, b.p_type, b.pc)),
same_pairs AS (
  SELECT TRUE AS name_agree, TRUE AS type_agree, TRUE AS price_agree,
         n * (n - 1) / 2 AS mult
  FROM recs WHERE n > 1),
pairs AS (SELECT * FROM cross_pairs UNION ALL SELECT * FROM same_pairs),
scored AS (
  SELECT *, CAST({wsum} AS BIGINT) AS weight_milli FROM pairs)
SELECT name_agree, type_agree, price_agree,
       CAST(SUM(mult) AS BIGINT) AS n_pairs,
       weight_milli,
       CASE WHEN weight_milli >= {_FS_LINK} THEN 'link'
            WHEN weight_milli >= {_FS_POSSIBLE} THEN 'possible'
            ELSE 'non-match' END AS decision
FROM scored
GROUP BY name_agree, type_agree, price_agree, weight_milli
ORDER BY weight_milli DESC, name_agree, type_agree, price_agree
"""


def _fs_pairs_df(spark: SparkSession) -> DataFrame:
    """Blocked candidate pairs over the DISTINCT-RECORD part catalog:
    (name_agree, type_agree, price_agree, mult) — cross-record pairs
    weight n_a*n_b, identical-record pairs the closed form n*(n-1)/2
    (see fellegi_sunter_patterns for the scale adjudication)."""
    recs = (
        spark.table("part")
        .groupBy(
            "p_name",
            "p_brand",
            "p_type",
            "p_size",
            F.round(F.col("p_retailprice") * 100, 0).cast("bigint").alias("pc"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    a, b = recs.alias("a"), recs.alias("b")
    tup_a = F.struct(F.col("a.p_name"), F.col("a.p_type"), F.col("a.pc"))
    tup_b = F.struct(F.col("b.p_name"), F.col("b.p_type"), F.col("b.pc"))
    cross_pairs = a.join(
        b,
        (F.col("a.p_brand") == F.col("b.p_brand"))
        & (F.col("a.p_size") == F.col("b.p_size"))
        & (tup_a < tup_b),
    ).select(
        (F.levenshtein("a.p_name", "b.p_name") <= 2).alias("name_agree"),
        (F.col("a.p_type") == F.col("b.p_type")).alias("type_agree"),
        (F.abs(F.col("a.pc") - F.col("b.pc")) <= 100).alias("price_agree"),
        (F.col("a.n") * F.col("b.n")).alias("mult"),
    )
    same_pairs = recs.filter(F.col("n") > 1).select(
        F.lit(True).alias("name_agree"),
        F.lit(True).alias("type_agree"),
        F.lit(True).alias("price_agree"),
        (F.col("n") * (F.col("n") - 1) / 2).cast("bigint").alias("mult"),
    )
    return cross_pairs.unionByName(same_pairs)


@query("fellegi_sunter_patterns", oracle=_fs_oracle())
def fellegi_sunter_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FELLEGI-SUNTER probabilistic record linkage (Fellegi & Sunter
    1969) — the scoring layer on top of this repo's blocking operators
    (attribute blocks, symspell deletions, sorted neighborhoods): every
    within-block candidate pair gets an agreement VECTOR over three
    comparison fields and a match weight Σ log2(m_f/u_f) (agreements)
    + Σ log2((1-m_f)/(1-u_f)) (disagreements); pairs classify into
    link / possible / non-match by thresholds. Output is the classic
    agreement-PATTERN frequency table (<= 2^3 x weights rows — what the
    EM step of a production linker consumes to re-estimate m/u), not
    the raw pair list.

    Exactness: weights are literal integer milli-bits summed as
    bigints; decisions are integer threshold compares — no float
    anywhere (the m/u logs are authoring-time constants, like the
    Wilson z).

    Scale: pairs come from (brand, size) equi-join BLOCKS over the
    DISTINCT-RECORD catalog with multiplicities (the fuzzy family's
    discipline — identical records collapse to one row carrying n, so
    pair counts weight by n_a*n_b and identical-record pairs are the
    closed form n*(n-1)/2, never enumerated): within-block work is
    quadratic in distinct-ENTITY diversity, not row count — the sf1
    tiling rehearsal is ~1x where the row-level form was 40x. The
    pattern rollup's exchange carries <= 8 x |distinct weights|
    groups."""
    pairs = _fs_pairs_df(spark)
    w = None
    for f in _FS_W:
        ag, dg = _FS_W[f]
        term = F.when(F.col(f"{f}_agree"), F.lit(ag)).otherwise(F.lit(dg))
        w = term if w is None else w + term
    scored = pairs.withColumn("weight_milli", w.cast("bigint"))
    return (
        scored.groupBy("name_agree", "type_agree", "price_agree", "weight_milli")
        .agg(F.sum("mult").cast("bigint").alias("n_pairs"))
        .select(
            "name_agree",
            "type_agree",
            "price_agree",
            "n_pairs",
            "weight_milli",
            F.when(F.col("weight_milli") >= _FS_LINK, F.lit("link"))
            .when(F.col("weight_milli") >= _FS_POSSIBLE, F.lit("possible"))
            .otherwise(F.lit("non-match"))
            .alias("decision"),
        )
        .orderBy(F.desc("weight_milli"), "name_agree", "type_agree", "price_agree")
    )


_FS_EM_ITERS = 8
_FS_EM_INIT = {"p": 0.1, "m": 0.8, "u": 0.2}
_FS_FIELDS = ("name", "type", "price")


def _fs_pair_ctes() -> str:
    """The distinct-record blocked pair CTEs shared by the FS oracles,
    ending in ``pairs(name_agree, type_agree, price_agree, mult)``."""
    pat = {
        "name": "levenshtein(a.p_name, b.p_name) <= 2",
        "type": "a.p_type = b.p_type",
        "price": "abs(a.pc - b.pc) <= 100",
    }
    agree_cols = ", ".join(
        f"CAST({expr} AS BOOLEAN) AS {f}_agree" for f, expr in pat.items()
    )
    return f"""recs AS (
  SELECT p_name, p_brand, p_type, p_size,
         CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS pc,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM part GROUP BY 1, 2, 3, 4, 5),
cross_pairs AS (
  SELECT {agree_cols}, a.n * b.n AS mult
  FROM recs a JOIN recs b
    ON a.p_brand = b.p_brand AND a.p_size = b.p_size
   AND (a.p_name, a.p_type, a.pc) < (b.p_name, b.p_type, b.pc)),
same_pairs AS (
  SELECT TRUE AS name_agree, TRUE AS type_agree, TRUE AS price_agree,
         n * (n - 1) / 2 AS mult
  FROM recs WHERE n > 1),
pairs AS (SELECT * FROM cross_pairs UNION ALL SELECT * FROM same_pairs)"""


def _fs_em_oracle() -> str:
    """Unrolled EM replay: per-iteration E-step weight CTE + ordered-fold
    M-step CTE, ending with the post-training E-step posteriors joined to
    the learned parameter row."""
    order = "name_agree, type_agree, price_agree"

    def a_expr(it: str, which: str) -> str:
        # which: 'm' (match class, scaled by p) or 'u' (scaled by 1-p)
        lead = f"{it}.p" if which == "m" else f"(1.0 - {it}.p)"
        terms = [
            f"CASE WHEN {f}_agree THEN {it}.{which}_{f} "
            f"ELSE 1.0 - {it}.{which}_{f} END"
            for f in _FS_FIELDS
        ]
        e = lead
        for t in terms:
            e = f"({e} * {t})"
        return e

    def fold(term: str) -> str:
        return (
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list({term} ORDER BY {order})), (acc, e) -> acc + e)"
        )

    init_cols = ", ".join(
        [f"CAST({_FS_EM_INIT['p']!r} AS DOUBLE) AS p"]
        + [f"CAST({_FS_EM_INIT['m']!r} AS DOUBLE) AS m_{f}" for f in _FS_FIELDS]
        + [f"CAST({_FS_EM_INIT['u']!r} AS DOUBLE) AS u_{f}" for f in _FS_FIELDS]
    )
    ctes = [
        _fs_pair_ctes(),
        f"""pat AS (
  SELECT name_agree, type_agree, price_agree, CAST(SUM(mult) AS BIGINT) AS n
  FROM pairs GROUP BY 1, 2, 3)""",
        f"it0 AS (SELECT {init_cols})",
    ]
    for k in range(1, _FS_EM_ITERS + 1):
        prev = f"it{k - 1}"
        a = a_expr("it", "m")
        b = a_expr("it", "u")
        ctes.append(
            f"""w{k} AS (
  SELECT pat.*, ROUND({a} / ({a} + {b}), 9) AS w
  FROM pat, {prev} it)"""
        )
        agg_cols = [
            f"{fold('CAST(n AS DOUBLE) * w')} AS W",
            f"{fold('CAST(n AS DOUBLE) * (1.0 - w)')} AS L",
        ]
        for f in _FS_FIELDS:
            agg_cols.append(
                f"{fold(f'CASE WHEN {f}_agree THEN CAST(n AS DOUBLE) * w ELSE 0.0 END')} AS Wm_{f}"
            )
            agg_cols.append(
                f"{fold(f'CASE WHEN {f}_agree THEN CAST(n AS DOUBLE) * (1.0 - w) ELSE 0.0 END')} AS Lu_{f}"
            )
        out_cols = ["ROUND(W / (W + L), 9) AS p"]
        out_cols += [f"ROUND(Wm_{f} / W, 9) AS m_{f}" for f in _FS_FIELDS]
        out_cols += [f"ROUND(Lu_{f} / L, 9) AS u_{f}" for f in _FS_FIELDS]
        ctes.append(
            f"""it{k} AS (
  SELECT {', '.join(out_cols)}
  FROM (SELECT {', '.join(agg_cols)} FROM w{k}) agg)"""
        )
    # post-training E-step: posteriors under the learned params
    a = a_expr("it", "m")
    b = a_expr("it", "u")
    last = f"it{_FS_EM_ITERS}"
    params = ", ".join(
        ["it.p AS p_match"]
        + [f"it.m_{f} AS m_{f}" for f in _FS_FIELDS]
        + [f"it.u_{f} AS u_{f}" for f in _FS_FIELDS]
    )
    joined = ",\n".join(ctes)
    return f"""
WITH {joined}
SELECT pat.name_agree, pat.type_agree, pat.price_agree, pat.n AS n_pairs,
       ROUND({a} / ({a} + {b}), 9) AS posterior,
       {params}
FROM pat, {last} it
ORDER BY pat.name_agree, pat.type_agree, pat.price_agree
"""


@query("fellegi_sunter_em", oracle=_fs_em_oracle())
def fellegi_sunter_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EM estimation of the Fellegi-Sunter m/u/p parameters (Winkler
    1988) — the learning step the fellegi_sunter_patterns docstring
    points at: the agreement-PATTERN frequency table is EM's sufficient
    statistic, so after the distributed pair/pattern aggregation the
    whole fit runs over <= 2^3 rows of config-sized state (the
    logreg/kmeans trainer discipline: the heavy pass is distributed,
    the parameter updates are driver state replayed exactly).

    Determinism: every E-step weight and every updated parameter is
    ROUND(x, 9) HALF_UP; products are fixed left-associated; M-step
    sums are ORDERED FOLDS over the (name, type, price)-sorted pattern
    list — float accumulation order is part of the definition, so the
    DuckDB replay (unrolled per-iteration CTEs) is bit-identical.
    Output: per-pattern posterior match probability under the learned
    parameters + the learned (p, m_f, u_f) on every row."""
    import math

    pat_rows = (
        _fs_pairs_df(spark)
        .groupBy("name_agree", "type_agree", "price_agree")
        .agg(F.sum("mult").cast("bigint").alias("n"))
        .collect()
    )
    pats = sorted(
        (bool(r["name_agree"]), bool(r["type_agree"]), bool(r["price_agree"]), int(r["n"]))
        for r in pat_rows
    )

    def r9(x: float) -> float:
        return math.floor(x * 1e9 + 0.5) / 1e9

    p = _FS_EM_INIT["p"]
    m = {f: _FS_EM_INIT["m"] for f in _FS_FIELDS}
    u = {f: _FS_EM_INIT["u"] for f in _FS_FIELDS}

    def e_step():
        ws = []
        for gn, gt, gp, n in pats:
            g = {"name": gn, "type": gt, "price": gp}
            a = p
            for f in _FS_FIELDS:
                a = a * (m[f] if g[f] else 1.0 - m[f])
            b = 1.0 - p
            for f in _FS_FIELDS:
                b = b * (u[f] if g[f] else 1.0 - u[f])
            ws.append(r9(a / (a + b)))
        return ws

    def fold(terms):
        acc = 0.0
        for t in terms:
            acc += t
        return acc

    for _ in range(_FS_EM_ITERS):
        ws = e_step()
        W = fold(float(n) * w for (_, _, _, n), w in zip(pats, ws))
        L = fold(float(n) * (1.0 - w) for (_, _, _, n), w in zip(pats, ws))
        new_m, new_u = {}, {}
        for i, f in enumerate(_FS_FIELDS):
            gsel = [pt[i] for pt in pats]
            new_m[f] = r9(
                fold(
                    float(n) * w if g else 0.0
                    for (_, _, _, n), w, g in zip(pats, ws, gsel)
                )
                / W
            )
            new_u[f] = r9(
                fold(
                    float(n) * (1.0 - w) if g else 0.0
                    for (_, _, _, n), w, g in zip(pats, ws, gsel)
                )
                / L
            )
        p, m, u = r9(W / (W + L)), new_m, new_u
    posterior = e_step()
    rows = [
        (
            gn,
            gt,
            gp,
            n,
            w,
            p,
            m["name"],
            m["type"],
            m["price"],
            u["name"],
            u["type"],
            u["price"],
        )
        for (gn, gt, gp, n), w in zip(pats, posterior)
    ]
    return spark.createDataFrame(
        rows,
        "name_agree boolean, type_agree boolean, price_agree boolean, "
        "n_pairs bigint, posterior double, p_match double, "
        "m_name double, m_type double, m_price double, "
        "u_name double, u_type double, u_price double",
    ).orderBy("name_agree", "type_agree", "price_agree")


def _cs_oracle(top_n: int, d: int, w: int) -> str:
    from dawis_spark.operators.sketches import (
        _cm_bucket,
        _cm_coeffs,
        _cs_sign,
        _cs_sign_coeffs,
        _kmv_round,
        _KMV_ROUNDS,
        cs_oracle_ctes,
    )

    toks = _TXT.tokens("text", "duck")
    h = _TXT.char_hash("cast(tok as varchar)", "duck")
    probe_chain = [f"probe_h0 AS (SELECT tok, {h} AS h FROM top)"]
    src = "probe_h0"
    for n, (a, b) in enumerate(_KMV_ROUNDS):
        probe_chain.append(
            f"probe_h{n + 1} AS (SELECT tok, {_kmv_round('h', a, b)} AS h FROM {src})"
        )
        src = f"probe_h{n + 1}"
    cells = " UNION ALL ".join(
        f"SELECT tok, {i} AS row, CAST({_cm_bucket('h', a, b, w)} AS INT) AS bucket,"
        f" CAST({_cs_sign('h', sa, sb)} AS BIGINT) AS s FROM {src}"
        for i, ((a, b), (sa, sb)) in enumerate(
            zip(_cm_coeffs(d), _cs_sign_coeffs(d))
        )
    )
    mid = (d + 1) // 2
    return f"""
WITH occ AS (
  SELECT unnest({toks}) AS tok FROM documents
),
{cs_oracle_ctes('occ', 'tok', d, w)},
exact AS (SELECT tok, COUNT(*) AS exact_count FROM occ GROUP BY tok),
top AS (
  SELECT tok, exact_count FROM (
    SELECT *, row_number() OVER (ORDER BY exact_count DESC, tok) AS rn FROM exact
  ) WHERE rn <= {top_n}
),
{", ".join(probe_chain)},
probe_cells AS ({cells}),
est AS (
  SELECT p.tok,
         CAST(list_sort(list(p.s * COALESCE(cs.ssum, 0)))[{mid}] AS BIGINT)
           AS cs_estimate
  FROM probe_cells p LEFT JOIN cs USING (row, bucket)
  GROUP BY p.tok
)
SELECT t.tok AS token, CAST(t.exact_count AS BIGINT) AS exact_count,
       e.cs_estimate,
       e.cs_estimate - t.exact_count AS signed_err
FROM top t JOIN est e ON e.tok = t.tok
ORDER BY t.exact_count DESC, token
"""


@query("cs_heavy_hitters", oracle=_cs_oracle(20, 5, 512))
def cs_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT-SKETCH heavy hitters (Charikar et al. 2002) — the UNBIASED
    companion to cm_heavy_hitters: colliding tokens add +-1 signs
    instead of stacking, so the per-row estimates scatter around the
    truth and the exact d-value median (never a percentile
    approximation) recovers it; signed_err shows the two-sided error
    count-min structurally cannot produce (its overestimate column is
    always >= 0). Same fixed 5x512-cell footprint regardless of
    vocabulary size; the exact side exists only to score the sketch.

    Scale: the only row-scale exchange carries d*w = 2560 signed-count
    groups; the top-20 is TakeOrderedAndProject; the sketch broadcasts
    into the probe join."""
    from dawis_spark.operators.sketches import cs_estimate, cs_sketch

    toks = _TXT.tokens("text", "spark")
    occ = spark.table("documents").select(F.explode(F.expr(toks)).alias("tok"))
    exact = occ.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_count")
    )
    top = (
        exact.orderBy(F.desc("exact_count"), F.asc("tok"))
        .limit(20)
        .select("tok", "exact_count")
    )
    sk = cs_sketch(occ, "tok", d=5, w=512)
    est = cs_estimate(sk, top.select("tok"), "tok", d=5, w=512)
    return (
        top.join(est, "tok")
        .select(
            F.col("tok").alias("token"),
            "exact_count",
            "cs_estimate",
            (F.col("cs_estimate") - F.col("exact_count")).alias("signed_err"),
        )
        .orderBy(F.desc("exact_count"), "token")
    )


def _hll_by_oracle() -> str:
    from dawis_spark.operators.sketches import hll_oracle_sql_by

    return f"""
WITH {hll_oracle_sql_by("events", ["event_type"], "user_id", numeric=True)},
exact AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM events GROUP BY 1)
SELECT e.event_type, h.method, h.est, e.exact_users,
       ROUND((h.est - e.exact_users) / e.exact_users, 4) AS rel_err
FROM hll_by h JOIN exact e USING (event_type)
ORDER BY e.event_type
"""


@query("hll_distinct_users_by_type", oracle=_hll_by_oracle())
def hll_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED HyperLogLog: distinct users PER EVENT TYPE from per-key
    64-register synopses (operators/sketches.hll_registers_by) — the
    GROUP BY companion to hll_distinct_events. At 100 TB this replaces
    a per-group COUNT(DISTINCT)'s (group, user)-cardinality exchange
    with |groups| x 64 partial-max rows; the per-group estimator
    auto-dispatches linear-counting vs raw exactly like the global form
    (small groups take 'linear'). The exact side exists only to score
    the sketch per group (expected |err| ~ 1.04/sqrt(64))."""
    from dawis_spark.operators.sketches import hll_estimate_by, hll_registers_by

    ev = spark.table("events")
    est = hll_estimate_by(
        hll_registers_by(ev, ["event_type"], "user_id", numeric=True),
        ["event_type"],
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users")
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "method",
            "est",
            "exact_users",
            F.round(
                (F.col("est") - F.col("exact_users")) / F.col("exact_users"), 4
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


_KM_ORACLE = """
WITH du AS (
  SELECT user_id, date_trunc('day', ts) AS day FROM events),
pu AS (SELECT user_id, MIN(day) AS fd, MAX(day) AS ld FROM du GROUP BY 1),
hz AS (SELECT MAX(day) AS h FROM du),
dur AS (
  SELECT CAST(date_diff('day', fd, ld) AS BIGINT) AS duration,
         (ld <= h - INTERVAL 1 DAY) AS churn
  FROM pu, hz),
g AS (
  SELECT duration, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN churn THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM dur GROUP BY 1),
arr AS (
  SELECT list(struct_pack(duration := duration, c := c, d := d)
              ORDER BY duration) AS a,
         CAST(SUM(c) AS BIGINT) AS N
  FROM g),
idx AS (SELECT UNNEST(range(1, len(a) + 1)) AS i, a, N FROM arr)
SELECT CAST(a[i].duration AS BIGINT) AS duration,
       N - list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(a[1:i-1], x -> x.c)), (p, q) -> p + q) AS at_risk,
       a[i].d AS churned, a[i].c - a[i].d AS censored,
       ROUND(list_reduce(
         list_prepend(struct_pack(s := CAST(1.0 AS DOUBLE),
                                  seen := CAST(0 AS BIGINT)),
                      list_transform(a[1:i],
                        x -> struct_pack(s := CAST(x.d AS DOUBLE), seen := x.c))),
         (acc, x) -> struct_pack(
           s := acc.s * (1.0 - x.s / CAST(N - acc.seen AS DOUBLE)),
           seen := acc.seen + x.seen)).s, 9)
         AS survival
FROM idx
ORDER BY duration
"""


@query("kaplan_meier_retention", oracle=_KM_ORACLE)
def kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN-MEIER survival curve over user lifetimes (Kaplan & Meier
    1958) — right-censored retention, the survival-analysis member of
    the time-series family: a user's lifetime is first-to-last active
    day; users still active within 1 day of the corpus horizon are
    CENSORED (their true lifetime is unknown — dropping them is the
    classic retention-bias mistake this estimator exists to fix; the
    1-day window fits this synthetic feed's density — every user is
    active almost daily — production retention uses weeks).

    DuckDB-replay note: the oracle's running-product fold keeps the
    DERIVED field first and the counter last in its struct accumulator —
    DuckDB 1.0's list_reduce mis-evaluates struct fields that read an
    EARLIER-updated field (verified: (seen, s) order diverges from the
    left fold at >= 3 elements; (s, seen) matches exactly).
    S(t) = prod_{t_i <= t} (1 - d_i / n_i) over event times, with
    censored users leaving the risk set without contributing a death.

    Exactness: d_i, n_i are exact bigints; each factor is ONE division;
    the running product is a LEFT FOLD over the duration-sorted array
    with a (seen, s) struct accumulator — float multiplication order is
    part of the definition (the chi-square ordered-fold discipline), so
    both engines walk the identical sequence; ROUND(,9) only on output.

    Scale: one user-keyed aggregate (the only row-scale exchange); the
    curve itself lives on the duration-bounded relation (<= observation
    window in days), folded through one <= |durations|-struct array —
    no partition-less window, no quadratic anything."""
    e = spark.table("events").select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    )
    pu = e.groupBy("user_id").agg(
        F.min("day").alias("fd"), F.max("day").alias("ld")
    )
    hz = e.agg(F.max("day").alias("h"))
    dur = pu.crossJoin(F.broadcast(hz)).select(
        F.datediff("ld", "fd").cast("bigint").alias("duration"),
        F.expr("ld <= h - interval 1 days").alias("churn"),
    )
    g = dur.groupBy("duration").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum(F.when(F.col("churn"), 1).otherwise(0)).cast("bigint").alias("d"),
    )
    arr = g.agg(
        F.sort_array(F.collect_list(F.struct("duration", "c", "d"))).alias("a"),
        F.sum("c").cast("bigint").alias("N"),
    )
    rows = arr.select(
        F.explode(
            F.expr(
                "transform(a, (x, i) -> struct("
                "x.duration AS duration, "
                "N - aggregate(slice(a, 1, i), cast(0 as bigint), "
                "(p, y) -> p + y.c) AS at_risk, "
                "x.d AS churned, x.c - x.d AS censored, "
                "round(aggregate(slice(a, 1, i + 1), "
                "named_struct('seen', cast(0 as bigint), 's', cast(1.0 as double)), "
                "(acc, y) -> named_struct('seen', acc.seen + y.c, "
                "'s', acc.s * (1.0 - y.d / cast(N - acc.seen as double)))).s, 9) "
                "AS survival))"
            )
        ).alias("r")
    )
    return rows.select(
        F.col("r.duration").alias("duration"),
        F.col("r.at_risk").alias("at_risk"),
        F.col("r.churned").alias("churned"),
        F.col("r.censored").alias("censored"),
        F.col("r.survival").alias("survival"),
    ).orderBy("duration")


_LOGRANK_ORACLE = """
WITH du AS (
  SELECT user_id, ts, event_id, event_type, date_trunc('day', ts) AS day
  FROM events),
first_ev AS (
  SELECT user_id, event_type AS fe FROM (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM du) WHERE rn = 1),
pu AS (
  SELECT du.user_id, MIN(day) AS fd, MAX(day) AS ld,
         BOOL_OR(f.fe = 'view') AS g1
  FROM du JOIN first_ev f ON f.user_id = du.user_id
  GROUP BY du.user_id),
hz AS (SELECT MAX(day) AS h FROM du),
dur AS (
  SELECT CAST(date_diff('day', fd, ld) AS BIGINT) AS duration,
         (ld <= h - INTERVAL 1 DAY) AS churn, g1
  FROM pu, hz),
g AS (
  SELECT duration,
         CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN churn THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN churn AND g1 THEN 1 ELSE 0 END) AS BIGINT) AS d1
  FROM dur GROUP BY 1),
arr AS (
  SELECT list(struct_pack(e := CAST(d AS DOUBLE), v := CAST(d1 AS DOUBLE),
                          seen := c, seen1 := c1) ORDER BY duration) AS a,
         CAST(SUM(c) AS BIGINT) AS N, CAST(SUM(c1) AS BIGINT) AS N1,
         CAST(SUM(d1) AS BIGINT) AS O1
  FROM g),
folded AS (
  SELECT N, N1, O1,
         list_reduce(
           list_prepend(struct_pack(e := CAST(0.0 AS DOUBLE),
                                    v := CAST(0.0 AS DOUBLE),
                                    seen := CAST(0 AS BIGINT),
                                    seen1 := CAST(0 AS BIGINT)), a),
           (acc, x) -> struct_pack(
             e := acc.e + x.e * (CAST(N1 - acc.seen1 AS DOUBLE)
                                 / CAST(N - acc.seen AS DOUBLE)),
             v := acc.v + CASE WHEN (N - acc.seen) > 1 THEN
               ((x.e * (CAST(N1 - acc.seen1 AS DOUBLE)
                        / CAST(N - acc.seen AS DOUBLE)))
                * (1.0 - CAST(N1 - acc.seen1 AS DOUBLE)
                         / CAST(N - acc.seen AS DOUBLE)))
               * (CAST((N - acc.seen) - CAST(x.e AS BIGINT) AS DOUBLE)
                  / CAST((N - acc.seen) - 1 AS DOUBLE))
               ELSE 0.0 END,
             seen := acc.seen + x.seen,
             seen1 := acc.seen1 + x.seen1)) AS f
  FROM arr)
SELECT N AS n_users, N1 AS n_group1, O1 AS observed1,
       ROUND(f.e, 6) AS expected1,
       ROUND(f.v, 6) AS variance,
       ROUND(CASE WHEN f.v > 0.0
             THEN (CAST(O1 AS DOUBLE) - f.e) * (CAST(O1 AS DOUBLE) - f.e) / f.v
             ELSE 0.0 END, 6) AS chi2
FROM folded
"""


@query("logrank_first_event_groups", oracle=_LOGRANK_ORACLE)
def logrank_first_event_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOG-RANK test (Mantel 1966) — do two user cohorts churn at the
    same rate? The hypothesis-test companion to kaplan_meier_retention:
    group 1 = users whose deterministic FIRST event (ts, event_id
    order) is a 'view'; at each pooled lifetime the observed group-1
    churns compare against the hypergeometric expectation d_t*n1_t/n_t,
    variance d_t*(n1/n)*(1-n1/n)*(n-d)/(n-1); chi2 = (O-E)^2/V with
    1 dof.

    Exactness: all counts and risk sets are exact bigints maintained as
    prefix sums inside ONE left fold over the duration-sorted array
    (the Kaplan-Meier accumulator extended with the group dimension);
    per-duration E and V terms are fixed-order float expressions of
    those integers, accumulated in fold order — both engines walk the
    identical sequence; ROUND(,6) only on output.

    Scale: one user window for the first event + one user-keyed
    aggregate (the row-scale exchanges); the test statistic folds over
    the duration-bounded relation. Same 1-day censor window and DuckDB
    list_reduce field-order note as kaplan_meier_retention (derived
    accumulations first, counters last)."""
    from pyspark.sql import Window

    e = spark.table("events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
    )
    pu = e.groupBy("user_id").agg(
        F.min("day").alias("fd"),
        F.max("day").alias("ld"),
        (
            F.min(F.struct("ts", "event_id", "event_type")).getField("event_type")
            == "view"
        ).alias("g1"),
    )
    hz = e.agg(F.max("day").alias("h"))
    dur = pu.crossJoin(F.broadcast(hz)).select(
        F.datediff("ld", "fd").cast("bigint").alias("duration"),
        F.expr("ld <= h - interval 1 days").alias("churn"),
        "g1",
    )
    g = dur.groupBy("duration").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum(F.when(F.col("churn"), 1).otherwise(0)).cast("bigint").alias("d"),
        F.sum(F.when(F.col("g1"), 1).otherwise(0)).cast("bigint").alias("c1"),
        F.sum(F.when(F.col("churn") & F.col("g1"), 1).otherwise(0))
        .cast("bigint")
        .alias("d1"),
    )
    arr = g.agg(
        F.sort_array(
            F.collect_list(F.struct("duration", "c", "d", "c1", "d1"))
        ).alias("a"),
        F.sum("c").cast("bigint").alias("N"),
        F.sum("c1").cast("bigint").alias("N1"),
        F.sum("d1").cast("bigint").alias("O1"),
    )
    fold = (
        "aggregate(a, named_struct("
        "'seen', cast(0 as bigint), 'seen1', cast(0 as bigint), "
        "'e', cast(0.0 as double), 'v', cast(0.0 as double)), "
        "(acc, y) -> named_struct("
        "'seen', acc.seen + y.c, "
        "'seen1', acc.seen1 + y.c1, "
        "'e', acc.e + cast(y.d as double) * (cast(N1 - acc.seen1 as double) "
        "/ cast(N - acc.seen as double)), "
        "'v', acc.v + case when (N - acc.seen) > 1 then "
        "((cast(y.d as double) * (cast(N1 - acc.seen1 as double) "
        "/ cast(N - acc.seen as double))) "
        "* (1.0 - cast(N1 - acc.seen1 as double) "
        "/ cast(N - acc.seen as double))) "
        "* (cast((N - acc.seen) - y.d as double) "
        "/ cast((N - acc.seen) - 1 as double)) "
        "else 0.0 end))"
    )
    return arr.select(
        F.col("N").alias("n_users"),
        F.col("N1").alias("n_group1"),
        F.col("O1").alias("observed1"),
        F.expr(f"round(({fold}).e, 6)").alias("expected1"),
        F.expr(f"round(({fold}).v, 6)").alias("variance"),
        F.expr(
            f"round(case when ({fold}).v > 0.0 then "
            f"(cast(O1 as double) - ({fold}).e) "
            f"* (cast(O1 as double) - ({fold}).e) / ({fold}).v "
            "else 0.0 end, 6)"
        ).alias("chi2"),
    )


_SHAP_BITS = {"click": 1, "error": 2, "signup": 4, "view": 8}
_SHAP_W24 = [6, 2, 2, 6]  # s!(k-1-s)!/k! * 24 for |S| = 0..3, k = 4


def _shapley_oracle() -> str:
    bit_expr = " + ".join(
        f"CASE WHEN BOOL_OR(event_type = '{t}') THEN {b} ELSE 0 END"
        for t, b in _SHAP_BITS.items()
    )
    w_arr = ", ".join(str(w) for w in _SHAP_W24)
    chans = ", ".join(f"('{t}', {b})" for t, b in _SHAP_BITS.items())
    return f"""
WITH e AS (
  SELECT user_id, event_type, ts, event_id,
         COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS journey
  FROM events),
j AS (
  SELECT user_id, journey,
         CAST({bit_expr} AS INT) AS mask,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM e GROUP BY user_id, journey),
m AS (
  SELECT mask, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(conv) AS BIGINT) AS conv
  FROM j GROUP BY mask),
vm AS (
  SELECT MAP(list(mask ORDER BY mask),
             list(CAST(conv AS DOUBLE) / n ORDER BY mask)) AS v,
         CAST(SUM(n) AS BIGINT) AS n_journeys,
         CAST(SUM(conv) AS BIGINT) AS n_conversions
  FROM m),
ch(channel, bit) AS (VALUES {chans})
SELECT ch.channel,
       ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         list_transform(range(0, 16), s -> CASE WHEN (s & ch.bit) = 0 THEN
           CAST(([{w_arr}])[bit_count(CAST(s AS BIGINT)) + 1] AS DOUBLE)
           * (COALESCE(map_extract(vm.v, s | ch.bit)[1], 0.0)
              - COALESCE(map_extract(vm.v, s)[1], 0.0))
           ELSE 0.0 END)), (a, b) -> a + b) / 24.0, 6) AS shapley,
       vm.n_journeys, vm.n_conversions
FROM ch, vm
ORDER BY ch.channel
"""


@query("shapley_channel_attribution", oracle=_shapley_oracle())
def shapley_channel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHAPLEY-VALUE multi-touch attribution (Shapley 1953 applied to
    marketing journeys) — the game-theoretic companion to the U-shaped
    position_attribution: journeys (purchase-delimited via the journey
    index of operators/journeys.py) become coalitions of the channels
    they touched; v(S) is the empirical conversion rate of journeys
    whose touch-set is EXACTLY S; each channel's credit is the exact
    Shapley sum over the 2^4 = 16 subsets with the classic
    s!(k-1-s)!/k! weights carried as INTEGER 24ths ([6,2,2,6]) and ONE
    final /24 — the weights are exact, every v is one division, and
    the subset sum is an ordered fold over the fixed literal mask
    sequence, so both engines walk identical float sequences.

    Scale: one user-window pass (the journey index) + one
    (user, journey)-keyed aggregate are the row-scale exchanges; the
    value function lives on a 16-row mask relation that collapses to a
    single broadcast map — the Shapley evaluation is constant work
    regardless of data size."""
    from pyspark.sql import Window

    from dawis_spark.operators.journeys import with_journey_index

    e = with_journey_index(spark.table("events"), "purchase")
    bit = None
    for t, b in _SHAP_BITS.items():
        term = F.when(F.max((F.col("event_type") == t).cast("int")) == 1, b).otherwise(0)
        bit = term if bit is None else bit + term
    j = e.groupBy("user_id", "journey").agg(
        bit.cast("int").alias("mask"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    m = j.groupBy("mask").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("conv").cast("bigint").alias("conv"),
    )
    vm = m.agg(
        F.expr(
            "map_from_arrays(array_sort(collect_list(mask)), "
            "transform(array_sort(collect_list(struct(mask, "
            "cast(conv as double) / n AS v))), x -> x.v))"
        ).alias("v"),
        F.sum("n").cast("bigint").alias("n_journeys"),
        F.sum("conv").cast("bigint").alias("n_conversions"),
    )
    chans = spark.createDataFrame(
        sorted(_SHAP_BITS.items()), "channel string, bit int"
    )
    w_arr = ", ".join(str(w) for w in _SHAP_W24)
    fold = (
        "aggregate(sequence(0, 15), cast(0.0 as double), (acc, s) -> acc + "
        "case when (s & bit) = 0 then "
        f"cast(element_at(array({w_arr}), bit_count(cast(s as bigint)) + 1) as double) "
        "* (coalesce(element_at(v, s | bit), 0.0) "
        "- coalesce(element_at(v, s), 0.0)) else 0.0 end)"
    )
    return (
        chans.crossJoin(F.broadcast(vm))
        .select(
            "channel",
            F.round(F.expr(fold) / 24.0, 6).alias("shapley"),
            "n_journeys",
            "n_conversions",
        )
        .orderBy("channel")
    )


_TCLOSE_TOP = 20
_TCLOSE_ORACLE = f"""
WITH qi AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS band
  FROM customer),
cls AS (
  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM qi GROUP BY 1, 2),
cb AS (
  SELECT c_nationkey, c_mktsegment, band, CAST(COUNT(*) AS BIGINT) AS c
  FROM qi GROUP BY 1, 2, 3),
g AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS gc FROM qi GROUP BY 1),
gm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m, CAST(SUM(gc) AS BIGINT) AS n FROM g),
gcum AS (
  SELECT band, CAST(SUM(gc) OVER (ORDER BY band
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_g,
    ROW_NUMBER() OVER (ORDER BY band) AS bi
  FROM g),
grid AS (
  SELECT cls.c_nationkey, cls.c_mktsegment, cls.n_rows,
         gcum.band, gcum.cum_g, gcum.bi
  FROM cls CROSS JOIN gcum),
cum AS (
  SELECT grid.*, COALESCE(cb.c, 0) AS c,
         CAST(SUM(COALESCE(cb.c, 0)) OVER (
           PARTITION BY grid.c_nationkey, grid.c_mktsegment
           ORDER BY grid.band
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_c
  FROM grid LEFT JOIN cb
    ON cb.c_nationkey = grid.c_nationkey
   AND cb.c_mktsegment = grid.c_mktsegment
   AND cb.band = grid.band),
emd AS (
  SELECT c_nationkey, c_mktsegment, n_rows,
         CAST(SUM(CASE WHEN bi < (SELECT m FROM gm)
                  THEN ABS(cum_c * (SELECT n FROM gm) - cum_g * n_rows)
                  ELSE 0 END) AS BIGINT) AS num
  FROM cum GROUP BY 1, 2, 3)
SELECT c_nationkey, c_mktsegment, n_rows,
       ROUND(CASE WHEN gm.m <= 1 THEN 0.0
             ELSE CAST(num AS DOUBLE) / ((gm.m - 1) * n_rows * gm.n) END, 6)
         AS t_closeness
FROM emd, gm
ORDER BY t_closeness DESC, c_nationkey, c_mktsegment
LIMIT {_TCLOSE_TOP}
"""


@query("t_closeness_profile", oracle=_TCLOSE_ORACLE)
def t_closeness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness (Li, Li & Venkatasubramanian 2007) — the third leg of
    the privacy trio beside k_anonymity_customers and
    l_diversity_profile: a QI class leaks even when diverse if its
    SENSITIVE-attribute distribution differs from the corpus-wide one
    (skewness attack); t is the Earth Mover's Distance between the
    class's ordinal balance-band distribution and the global one —
    EMD over an ordered domain = mean |cumulative difference|
    (Σ_{i<m} |P_cum(i) - Q_cum(i)| / (m-1)).

    Exactness: each cumulative difference is the INTEGER
    cum_c*N - cum_g*n_class over a common denominator (n_class*N), so
    the whole EMD is one bigint sum and ONE final division — exact for
    N < 3e9 (|cum_c*N| <= N^2 < 2^63). The top-|t| classes surface
    first (skewed-but-diverse classes l-diversity passes).

    Scale: one row-scale shuffle (the QI x band aggregate); the grid is
    classes x bands (QI-cardinality x a VALUE-BOUNDED ~11-band domain);
    the per-class cumulative window partitions by class; the global
    band cumulative uses the sorted-array prefix trick over <= m structs
    — no partition-less window anywhere."""
    from pyspark.sql import Window

    qi = spark.table("customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("band"),
    )
    cls = qi.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    cb = qi.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    g = qi.groupBy("band").agg(F.count(F.lit(1)).cast("bigint").alias("gc"))
    # global band cumulative + (m, N) via the sorted-array prefix trick
    # (bounded: <= m structs on one row; no partition-less window)
    gcum = (
        g.agg(F.sort_array(F.collect_list(F.struct("band", "gc"))).alias("__a"))
        .select(
            F.expr("size(__a)").alias("m"),
            F.expr("aggregate(__a, cast(0 as bigint), (acc, x) -> acc + x.gc)").alias(
                "n"
            ),
            F.explode(
                F.expr(
                    "transform(__a, (s, i) -> struct(s.band AS band, "
                    "cast(i + 1 as bigint) AS bi, "
                    "aggregate(slice(__a, 1, i + 1), cast(0 as bigint), "
                    "(acc, x) -> acc + x.gc) AS cum_g))"
                )
            ).alias("__s"),
        )
        .select("m", "n", "__s.band", "__s.bi", "__s.cum_g")
    )
    grid = cls.crossJoin(F.broadcast(gcum))
    joined = grid.join(
        cb, ["c_nationkey", "c_mktsegment", "band"], "left"
    ).withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
    wc = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = joined.withColumn("cum_c", F.sum("c").over(wc).cast("bigint"))
    emd = cum.groupBy("c_nationkey", "c_mktsegment", "n_rows", "m", "n").agg(
        F.sum(
            F.when(
                F.col("bi") < F.col("m"),
                F.abs(F.col("cum_c") * F.col("n") - F.col("cum_g") * F.col("n_rows")),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("num")
    )
    return (
        emd.select(
            "c_nationkey",
            "c_mktsegment",
            "n_rows",
            F.round(
                F.when(F.col("m") <= 1, F.lit(0.0)).otherwise(
                    F.col("num")
                    / ((F.col("m") - 1) * F.col("n_rows") * F.col("n"))
                ),
                6,
            ).alias("t_closeness"),
        )
        .orderBy(F.desc("t_closeness"), "c_nationkey", "c_mktsegment")
        .limit(_TCLOSE_TOP)
    )


_WHALE_TRANS_SQL = """
WITH counts AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM counts),
whales AS (SELECT user_id FROM counts, tot WHERE c * 1000 > t * 8),
nw AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_whales FROM whales),
kept AS (
  SELECT e.* FROM events e
  WHERE NOT EXISTS (SELECT 1 FROM whales w WHERE w.user_id = e.user_id)),
ordered AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM kept),
pairs AS (
  SELECT event_type AS src, next_type AS dst, CAST(COUNT(*) AS BIGINT) AS n
  FROM ordered WHERE next_type IS NOT NULL GROUP BY 1, 2),
outdeg AS (SELECT src, CAST(SUM(n) AS BIGINT) AS total FROM pairs GROUP BY 1)
SELECT q.src, q.dst, q.n, q.prob, nw.n_whales
FROM nw LEFT JOIN (
  SELECT p.src, p.dst, p.n, ROUND(CAST(p.n AS DOUBLE) / o.total, 4) AS prob
  FROM pairs p JOIN outdeg o ON p.src = o.src) q ON TRUE
ORDER BY q.src, q.dst
"""


@query("whale_guarded_transitions", oracle=_WHALE_TRANS_SQL)
def whale_guarded_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """event_transitions behind the journey WHALE GUARD
    (operators/journeys.py — the skew mitigation SCALE.md's zipf
    adjudication prescribes for the per-user sequence windows): users
    holding > 0.8% of all events (exact integer share test,
    c * 1000 > total * 8) are flagged by a broadcast whale set — the
    set is share-bounded (<= 125 keys CAN exceed 0.8%), so the guard
    adds no data-sized shuffle — and excluded from the
    Window.partitionBy(user_id) path sort; the transition matrix is
    computed over the remaining organic users, with the whale count
    carried on every row as the audit column (LEFT-joined FROM the
    audit relation, so an ALL-whale corpus — observed at sf0.001 —
    still reports one NULL-measure row with n_whales instead of an
    empty relation). At 100 TB this is the difference between one bot
    key single-tasking the journey window and the window's per-key
    parallelism holding (SCALE.md zipf rehearsal: guarded form flat at
    sf1skew)."""
    from pyspark.sql import Window

    from dawis_spark.operators.journeys import whale_guard, whale_keys

    e = spark.table("events").select("user_id", "event_type", "ts", "event_id")
    share = (8, 1000)
    nw = whale_keys(e, ["user_id"], max_share=share).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_whales")
    )
    kept = whale_guard(e, ["user_id"], max_share=share).filter(~F.col("is_whale"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        kept.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("next_type").alias("dst"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    total = F.sum("n").over(Window.partitionBy("src"))
    trans = pairs.select(
        "src", "dst", "n", F.round(F.col("n") / total, 4).alias("prob")
    )
    return _with_whale_audit(trans, nw).orderBy("src", "dst")


def _ljung_box_oracle(max_lag: int) -> str:
    lag_selects = "\n  UNION ALL ".join(
        f"SELECT {k} AS lag, x, x{k} AS xl FROM leads WHERE x{k} IS NOT NULL"
        for k in range(1, max_lag + 1)
    )
    lead_cols = ", ".join(
        f"LEAD(rev, {k}) OVER (ORDER BY d) AS x{k}" for k in range(1, max_lag + 1)
    )
    return f"""
WITH {_DAILY_REV_ORDERS_CTE},
leads AS (SELECT rev AS x, {lead_cols} FROM daily),
gstats AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(CAST(rev AS HUGEINT)) AS s,
         SUM(CAST(rev AS HUGEINT) * rev) AS sxx
  FROM daily),
long AS ({lag_selects}),
per_lag AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         SUM(CAST(x AS HUGEINT) * xl) AS sxy,
         SUM(CAST(x AS HUGEINT)) AS sh, SUM(CAST(xl AS HUGEINT)) AS st
  FROM long GROUP BY lag),
rhos AS (
  SELECT lag, n,
         CAST(n*n*sxy - n*s*(sh + st) + n_pairs*s*s AS DOUBLE)
           / CAST(n*n*sxx - n*s*s AS DOUBLE) AS rho
  FROM per_lag CROSS JOIN gstats)
SELECT CAST(MAX(n) AS BIGINT) AS n, CAST({max_lag} AS INT) AS m,
       ROUND((CAST(MAX(n) AS DOUBLE) * CAST(MAX(n) + 2 AS DOUBLE))
             * list_reduce(
                 list_prepend(CAST(0 AS DOUBLE),
                   list(rho * rho / CAST(n - lag AS DOUBLE) ORDER BY lag)),
                 (s, t) -> s + t), 6) AS q_stat
FROM rhos
"""


@query("ljung_box_daily_revenue", oracle=_ljung_box_oracle(10))
def ljung_box_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test (m=10) on daily revenue — the 'is
    there ANY serial structure' gate that decides whether the
    i.i.d.-assuming members of the hypothesis suite (bootstrap CIs,
    proportion z-tests) may be applied to a time-ordered metric, and
    the standard residual-whiteness check after fitting the Holt/STL
    forecasters: Q = n(n+2) * sum_k rho_k^2/(n-k) ~ chi2(m) under the
    white-noise null.

    Exactness: rho_k from acf's exact DECIMAL(38,0) integers; the
    m-term sum is an ordered lag-sorted fold (the chi-square
    discipline), so both engines accumulate in the same order.

    Scale: one calendar-bounded daily aggregate; the lead window and
    everything after ride the day-bounded series (whitelisted class);
    Q itself is a fold over m=10 doubles
    (operators/stats.py:ljung_box)."""
    from dawis_spark.operators.stats import ljung_box

    daily = (
        spark.table("orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("bigint")
            .alias("rev"),
        )
    )
    return ljung_box(daily, "d", "rev", max_lag=10)


# Closed-form two-feature OLS (normal equations, Cramer's rule), written
# ONCE as SQL expression strings evaluated by BOTH engines (F.expr on the
# Spark side) over identical exact-integer sufficient statistics — same
# expression tree + same IEEE doubles in = bit-identical coefficients out.
_OLS2_DET = "(n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2))"
_OLS2_B0 = (
    "(sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y))"
    f" / {_OLS2_DET}"
)
_OLS2_B1 = (
    "(n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2))"
    f" / {_OLS2_DET}"
)
_OLS2_B2 = (
    "(n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2))"
    f" / {_OLS2_DET}"
)
_OLS2_SSE = (
    "(syy - 2*(b0*sy + b1*s1y + b2*s2y)"
    " + (b0*b0*n + b1*b1*s11 + b2*b2*s22"
    " + 2*(b0*b1*s1 + b0*b2*s2 + b1*b2*s12)))"
)
_OLS2_R2 = f"(1 - {_OLS2_SSE} / (syy - sy*sy/n))"

_OLS2_STAT_CASTS = (
    "CAST(n0 AS DOUBLE) AS n, CAST(s1_i AS DOUBLE) AS s1,"
    " CAST(s2_i AS DOUBLE) AS s2, CAST(s11_i AS DOUBLE) AS s11,"
    " CAST(s22_i AS DOUBLE) AS s22, CAST(s12_i AS DOUBLE) AS s12,"
    " CAST(sy_i AS DOUBLE) AS sy, CAST(syy_i AS DOUBLE) AS syy,"
    " CAST(s1y_i AS DOUBLE) AS s1y, CAST(s2y_i AS DOUBLE) AS s2y"
)

_OLS2_ORACLE = f"""
WITH obs AS (
  SELECT CAST(l_quantity AS HUGEINT) AS x1,
         CAST(ROUND(l_discount * 100, 0) AS HUGEINT) AS x2,
         CAST(ROUND(l_extendedprice * 100, 0) AS HUGEINT) AS y
  FROM lineitem),
stats AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n0,
         SUM(x1) AS s1_i, SUM(x2) AS s2_i,
         SUM(x1*x1) AS s11_i, SUM(x2*x2) AS s22_i, SUM(x1*x2) AS s12_i,
         SUM(y) AS sy_i, SUM(y*y) AS syy_i,
         SUM(x1*y) AS s1y_i, SUM(x2*y) AS s2y_i
  FROM obs),
d AS (SELECT {_OLS2_STAT_CASTS} FROM stats),
coef AS (
  SELECT n, s1, s2, s11, s22, s12, sy, syy, s1y, s2y,
         {_OLS2_B0} AS b0, {_OLS2_B1} AS b1, {_OLS2_B2} AS b2
  FROM d)
SELECT CAST(n AS BIGINT) AS n_rows,
       ROUND(b0, 6) AS intercept_cents,
       ROUND(b1, 6) AS cents_per_qty,
       ROUND(b2, 6) AS cents_per_disc_pt,
       ROUND({_OLS2_R2}, 6) AS r2
FROM coef
"""


@query("ols_price_regression", oracle=_OLS2_ORACLE)
def ols_price_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature OLS via normal equations — extendedprice_cents ~
    quantity + discount_pct over lineitem, solved closed-form with
    Cramer's rule from ten sufficient statistics. The multiple-
    regression counterpart to theil_sen (robust single-slope): the
    workhorse 'fit a plane to a fact table' primitive a feature
    pipeline runs per segment.

    Exactness: every sufficient statistic is an exact integer sum
    (cents x quantity x discount-points in DECIMAL(38,0)/HUGEINT —
    syy ~ 1e26 at 1e12 rows, inside 38 digits); both engines convert
    the SAME integers to double once and then evaluate the SAME
    expression strings (_OLS2_B0/..., F.expr here, plain SQL there),
    so the coefficient doubles are bit-identical — no tolerance.

    Scale: ONE map-side-combined aggregate over the fact scan collapses
    any data volume to a single 10-number row; the solve is O(1) on
    that row. No shuffle wider than one row ever happens."""
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    x1 = d(F.col("l_quantity"))
    x2 = d(F.round(F.col("l_discount") * 100, 0))
    y = d(F.round(F.col("l_extendedprice") * 100, 0))
    stats = spark.table("lineitem").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n0"),
        F.sum(x1).alias("s1_i"),
        F.sum(x2).alias("s2_i"),
        F.sum(x1 * x1).alias("s11_i"),
        F.sum(x2 * x2).alias("s22_i"),
        F.sum(x1 * x2).alias("s12_i"),
        F.sum(y).alias("sy_i"),
        F.sum(y * y).alias("syy_i"),
        F.sum(x1 * y).alias("s1y_i"),
        F.sum(x2 * y).alias("s2y_i"),
    )
    doubles = stats.selectExpr(*_OLS2_STAT_CASTS.split(", "))
    coef = doubles.select(
        "*",
        F.expr(_OLS2_B0).alias("b0"),
        F.expr(_OLS2_B1).alias("b1"),
        F.expr(_OLS2_B2).alias("b2"),
    )
    return coef.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(F.col("b0"), 6).alias("intercept_cents"),
        F.round(F.col("b1"), 6).alias("cents_per_qty"),
        F.round(F.col("b2"), 6).alias("cents_per_disc_pt"),
        F.expr(f"ROUND({_OLS2_R2}, 6)").alias("r2"),
    )


_KDE_G = "mn + i * (mx - mn) / 20"
_KDE_H = "(mx - mn) / 10"
_KDE_U = "(x - g) / h"
_KDE_K = f"0.75 * (1 - ({_KDE_U}) * ({_KDE_U}))"

_KDE_ORACLE = f"""
WITH o AS (SELECT o_totalprice AS x FROM orders),
ext AS (SELECT MIN(x) AS mn, MAX(x) AS mx, CAST(COUNT(*) AS BIGINT) AS n FROM o),
grid AS (
  SELECT CAST(i AS INT) AS i, {_KDE_G} AS g, {_KDE_H} AS h, n
  FROM ext, range(0, 21) t(i)),
hits AS (
  SELECT grid.i, grid.g, grid.h, grid.n, {_KDE_K} AS k
  FROM o JOIN grid ON abs({_KDE_U}) < 1)
SELECT i, ROUND(g, 6) AS grid_x, CAST(COUNT(*) AS BIGINT) AS n_win,
       ROUND(SUM(k), 3) AS kernel_mass,
       ROUND(1000000 * SUM(k) / (n * h), 6) AS density_ppm
FROM hits GROUP BY i, g, h, n ORDER BY i
"""


@query("kde_totalprice_density", oracle=_KDE_ORACLE)
def kde_totalprice_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epanechnikov kernel density estimate of order totalprice at a
    21-point grid — the smooth-density companion to
    totalprice_histogram (hard bins) and kde-free iqr_outlier_fences:
    what a profiling UI plots as the distribution curve. Bandwidth
    h = range/10, kernel K(u) = 0.75(1-u^2) on |u| < 1.

    Exactness: grid points, bandwidth, and every per-row kernel term
    come from ONE shared expression string per quantity (_KDE_G/_H/_K,
    F.expr here = oracle text there) over the same parquet doubles, so
    per-row terms are bit-identical; only the summation order differs
    (error ~n*eps*mass ~ 3e-7 at sf0.1 against a 5e-4 rounding margin).

    Scale: the grid is a broadcast 21-row relation; the scan streams
    once through a broadcast nested-loop membership filter (each row
    hits <= 3 grid windows at h = range/10) and collapses map-side to
    a 21-group aggregate — the exchange carries 21 rows regardless of
    data volume."""
    o = spark.table("orders").select(F.col("o_totalprice").alias("x"))
    ext = o.agg(
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    grid = ext.select(
        F.explode(F.sequence(F.lit(0), F.lit(20))).alias("i"), "mn", "mx", "n"
    ).selectExpr(
        "CAST(i AS INT) AS i", f"{_KDE_G} AS g", f"{_KDE_H} AS h", "n"
    )
    hits = (
        o.crossJoin(F.broadcast(grid))
        .filter(F.expr(f"abs({_KDE_U}) < 1"))
        .selectExpr("i", "g", "h", "n", f"{_KDE_K} AS k")
    )
    return (
        hits.groupBy("i", "g", "h", "n")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_win"),
            F.sum("k").alias("mass"),
        )
        .selectExpr(
            "i",
            "ROUND(g, 6) AS grid_x",
            "n_win",
            "ROUND(mass, 3) AS kernel_mass",
            "ROUND(1000000 * mass / (n * h), 6) AS density_ppm",
        )
        .orderBy("i")
    )


def _stump_h(p: str) -> str:
    """Binary entropy with the 0*ln(0) guard, as a shared expression
    string (same text evaluated by both engines)."""
    return (
        f"CASE WHEN {p} <= 0 OR {p} >= 1 THEN 0.0 "
        f"ELSE -(({p}) * ln({p}) + (1 - ({p})) * ln(1 - ({p}))) END"
    )


_STUMP_PP = "(CAST(p_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))"
_STUMP_PL = "(CAST(plft AS DOUBLE) / CAST(nlft AS DOUBLE))"
_STUMP_PR = "(CAST(p_tot - plft AS DOUBLE) / CAST(n_tot - nlft AS DOUBLE))"
_STUMP_WL = "(CAST(nlft AS DOUBLE) / CAST(n_tot AS DOUBLE))"
_STUMP_WR = "(CAST(n_tot - nlft AS DOUBLE) / CAST(n_tot AS DOUBLE))"
_STUMP_GAIN = (
    f"{_stump_h(_STUMP_PP)} - {_STUMP_WL} * ({_stump_h(_STUMP_PL)})"
    f" - {_STUMP_WR} * ({_stump_h(_STUMP_PR)})"
)

_STUMP_ORACLE = f"""
WITH per_v AS (
  SELECT CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS v,
         CAST(COUNT(*) AS BIGINT) AS n_v,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS pos_v
  FROM lineitem GROUP BY 1),
tot AS (
  SELECT CAST(SUM(n_v) AS BIGINT) AS n_tot,
         CAST(SUM(pos_v) AS BIGINT) AS p_tot
  FROM per_v),
lefts AS (
  SELECT t.v AS t,
         CAST(SUM(p.n_v) AS BIGINT) AS nlft,
         CAST(SUM(p.pos_v) AS BIGINT) AS plft
  FROM per_v t JOIN per_v p ON p.v <= t.v GROUP BY 1)
SELECT t AS disc_pt_threshold, nlft AS n_left, plft AS pos_left,
       ROUND({_STUMP_GAIN}, 6) AS info_gain
FROM lefts CROSS JOIN tot WHERE nlft < n_tot ORDER BY t
"""


@query("decision_stump_discount", oracle=_STUMP_ORACLE)
def decision_stump_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-1 decision tree (stump) over l_discount predicting the
    'R' returnflag: information gain of every candidate split
    x <= t vs x > t — the greedy-split primitive inside any
    tree/boosting trainer and the feature-importance screen a data
    pipeline runs before committing a column to a model.

    Exactness: all split counts are exact integers from one
    value-keyed aggregate + an 11x11 bounded self-join (no window, no
    prefix-sum over data); the entropy/gain arithmetic is a shared
    expression string (_STUMP_GAIN) both engines evaluate over the
    same doubles — only ln's last-ulp may differ, absorbed by
    round 6.

    Scale: the fact scan collapses map-side to |distinct values| rows
    (11 here; any real feature is binned to O(100) first); everything
    after is value-bounded. This is the stump the curriculum/quality
    families would call per feature."""
    per_v = (
        spark.table("lineitem")
        .groupBy(
            F.round(F.col("l_discount") * 100, 0).cast("bigint").alias("v")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_v"),
            F.sum((F.col("l_returnflag") == "R").cast("int"))
            .cast("bigint")
            .alias("pos_v"),
        )
    )
    tot = per_v.agg(
        F.sum("n_v").cast("bigint").alias("n_tot"),
        F.sum("pos_v").cast("bigint").alias("p_tot"),
    )
    t_side = per_v.select(F.col("v").alias("t"))
    lefts = (
        t_side.join(F.broadcast(per_v), per_v.v <= t_side.t)
        .groupBy("t")
        .agg(
            F.sum("n_v").cast("bigint").alias("nlft"),
            F.sum("pos_v").cast("bigint").alias("plft"),
        )
    )
    return (
        lefts.crossJoin(F.broadcast(tot))
        .filter(F.col("nlft") < F.col("n_tot"))
        .selectExpr(
            "t AS disc_pt_threshold",
            "nlft AS n_left",
            "plft AS pos_left",
            f"ROUND({_STUMP_GAIN}, 6) AS info_gain",
        )
        .orderBy("disc_pt_threshold")
    )


# Per-(doc, lang) log-posterior, written once and evaluated by both
# engines over identically-named columns. Unseen tokens contribute
# exactly 0 to the seen-sum (ln(0+1)=0 would anyway), so the only
# per-lang correction is the -TF(d)*ln(T_l+V) smoothing denominator.
_NB_SCORE = (
    "ln(d_l) - ln(d) + COALESCE(seen_s, CAST(0 AS DOUBLE))"
    " - tf_tot * ln(t_l + v)"
)

# CTE chain ending in ev(actual docs) + pred(doc_id, predicted) — shared
# by the confusion-matrix oracle and the McNemar paired-comparison oracle.
_NB_CTES = f"""train AS (SELECT * FROM documents WHERE doc_id % 4 <> 0),
ev AS (SELECT * FROM documents WHERE doc_id % 4 = 0),
ttok AS (
  SELECT lang, t FROM (
    SELECT lang, unnest(string_split(lower(text), ' ')) AS t FROM train)
  WHERE t <> ''),
ct AS (SELECT lang, t, CAST(COUNT(*) AS BIGINT) AS c FROM ttok GROUP BY 1, 2),
tl AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS t_l FROM ct GROUP BY 1),
vt AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS v FROM ct),
pri AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS d_l FROM train GROUP BY 1),
dtot AS (SELECT CAST(COUNT(*) AS BIGINT) AS d FROM train),
langs AS (
  SELECT pri.lang, d_l, t_l, v, d
  FROM pri JOIN tl USING (lang) CROSS JOIN vt CROSS JOIN dtot),
etok AS (
  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM ev)
  WHERE t <> '' GROUP BY 1, 2),
etot AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS tf_tot FROM etok GROUP BY 1),
seen AS (
  SELECT e.doc_id, ct.lang, SUM(e.tf * ln(ct.c + 1)) AS seen_s
  FROM etok e JOIN ct ON e.t = ct.t GROUP BY 1, 2),
scored AS (
  SELECT etot.doc_id, l.lang, {_NB_SCORE} AS score
  FROM etot CROSS JOIN langs l
  LEFT JOIN seen s ON s.doc_id = etot.doc_id AND s.lang = l.lang),
pred AS (
  SELECT doc_id, lang AS predicted FROM (
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, lang ASC) AS rn
    FROM scored)
  WHERE rn = 1)"""

_NB_ORACLE = f"""
WITH {_NB_CTES}
SELECT d.lang AS actual, p.predicted, CAST(COUNT(*) AS BIGINT) AS n
FROM ev d JOIN pred p USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("naive_bayes_langid", oracle=_NB_ORACLE)
def naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes trained on 3/4 of the corpus (Laplace
    smoothing) and evaluated as a confusion matrix on the held-out
    quarter — a LEARNED language classifier next to the fixed
    stopword-ratio heuristic (langid_confusion_matrix): the full
    train/apply/eval ML loop expressed relationally.

    Determinism: both engines tokenize with the same split, build the
    same exact-integer count model, and evaluate the same score string
    (_NB_SCORE); the per-(doc,lang) seen-token sum is the one
    order-nondeterministic float reduce, and it only matters at exact
    argmax ties, which the (score DESC, lang ASC) tiebreak resolves
    identically for any difference above ulp noise.

    Scale: the model is a (lang x vocab) relation — sublinear in corpus
    size; the eval-token/model join shuffles int-hashable (token) keys;
    the doc x lang fan-out is a |langs|-constant broadcast cross join;
    the argmax window is partitioned BY doc. Nothing single-partitions
    and no text crosses an exchange after tokenization."""
    from pyspark.sql import Window

    docs = spark.table("documents")
    train = docs.filter(F.col("doc_id") % 4 != 0)
    ev = docs.filter(F.col("doc_id") % 4 == 0)

    def tok(df, keep):
        return (
            df.select(*keep, F.explode(F.split(F.lower("text"), " ")).alias("t"))
            .filter(F.col("t") != "")
        )

    ct = (
        tok(train, ["lang"])
        .groupBy("lang", "t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tl = ct.groupBy("lang").agg(F.sum("c").cast("bigint").alias("t_l"))
    vt = ct.agg(F.countDistinct("t").cast("bigint").alias("v"))
    pri = train.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("d_l")
    )
    dtot = train.agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    langs = (
        pri.join(tl, "lang").crossJoin(F.broadcast(vt)).crossJoin(F.broadcast(dtot))
    )

    etok = (
        tok(ev, ["doc_id"])
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    etot = etok.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("tf_tot"))
    seen = (
        etok.join(ct, "t")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("tf") * F.log(F.col("c") + 1)).alias("seen_s"))
    )
    scored = (
        etot.crossJoin(F.broadcast(langs))
        .join(seen, ["doc_id", "lang"], "left")
        .selectExpr("doc_id", "lang", f"{_NB_SCORE} AS score")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("lang").asc()
    )
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("predicted"))
    )
    return (
        ev.select("doc_id", F.col("lang").alias("actual"))
        .join(pred, "doc_id")
        .groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("actual", "predicted")
    )


# Two-proportion pooled z (nation vs rest-of-world), then the two-sided
# p-value via the Abramowitz-Stegun 7.1.26 erf polynomial — a closed
# form both engines evaluate from the SAME expression strings, since
# neither Spark SQL nor a portable oracle has a builtin normal CDF.
# For a two-sided test, p = 2*(1 - Phi(|z|)) = 1 - erf(|z|/sqrt(2)),
# and with the A&S form erf(x) = 1 - poly(t)*exp(-x^2), that collapses
# to p = poly(t)*exp(-x^2), t = 1/(1 + 0.3275911*x) (|error| < 1.5e-7).
_BH_Z = (
    "(CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    " - CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE))"
    " / sqrt((CAST(k1 + k2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))"
    " * (1 - CAST(k1 + k2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))"
    " * (1 / CAST(n1 AS DOUBLE) + 1 / CAST(n2 AS DOUBLE)))"
)
_BH_AZ = "abs(z) / sqrt(2)"
_BH_TT = "1 / (1 + 0.3275911 * az)"
_BH_P = (
    "((((1.061405429 * tt - 1.453152027) * tt + 1.421413741) * tt"
    " - 0.284496736) * tt + 0.254829592) * tt * exp(-(az * az))"
)
_BH_CRIT = "CAST(rn AS DOUBLE) / CAST(m AS DOUBLE) * 0.05"

_BH_ORACLE = f"""
WITH per_nation AS (
  SELECT c_nationkey,
         CAST(COUNT(*) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
              AS BIGINT) AS k1
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1),
tot AS (
  SELECT CAST(SUM(n1) AS BIGINT) AS nn, CAST(SUM(k1) AS BIGINT) AS kk,
         CAST(COUNT(*) AS BIGINT) AS m
  FROM per_nation),
base AS (
  SELECT n_name, n1, k1, nn - n1 AS n2, kk - k1 AS k2, m
  FROM per_nation CROSS JOIN tot
  JOIN nation ON n_nationkey = c_nationkey),
zs AS (SELECT n_name, n1, k1, m, {_BH_Z} AS z FROM base),
ps AS (
  SELECT n_name, n1, k1, m, z, {_BH_P} AS p
  FROM (SELECT *, {_BH_TT} AS tt
        FROM (SELECT *, {_BH_AZ} AS az FROM zs))),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY p, n_name) AS rn FROM ps),
flagged AS (
  SELECT *, CASE WHEN p <= {_BH_CRIT} THEN 1 ELSE 0 END AS pass_i
  FROM ranked)
SELECT n_name, n1 AS n_orders, k1 AS n_urgent,
       ROUND(z, 6) AS z_score, ROUND(p, 6) AS p_value,
       CAST(rn AS INT) AS p_rank,
       CAST(MAX(pass_i) OVER (ORDER BY rn
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS INT)
         AS rejected
FROM flagged ORDER BY p_rank
"""


@query("fdr_bh_nation_urgency", oracle=_BH_ORACLE)
def fdr_bh_nation_urgency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over 25 simultaneous hypothesis
    tests — per-nation urgent-order share vs the rest of the world,
    two-proportion pooled z each, then the step-up procedure (reject
    all ranks <= max{i : p_(i) <= i/m * alpha}, alpha=0.05). The
    multiple-comparisons discipline every per-segment screening query
    in the suite (proportion_ztest run per group) actually requires.

    Determinism: counts are exact integers off one fact-dim join; z,
    the A&S-7.1.26 p-value, and the BH threshold are shared expression
    strings (_BH_Z/_BH_P/_BH_CRIT) — bit-identical modulo exp()'s last
    ulp, absorbed by round 6 and irrelevant to the step-up comparisons
    at any realistic margin.

    Scale: the orders-customer join is the canonical co-partitioned
    fact-dim shuffle; everything after is a 25-row relation, so the
    rank/step-up windows are nation-bounded (whitelisted class)."""
    from pyspark.sql import Window

    per_nation = (
        spark.table("orders")
        .join(
            spark.table("customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n1"),
            F.sum((F.col("o_orderpriority") == "1-URGENT").cast("int"))
            .cast("bigint")
            .alias("k1"),
        )
    )
    tot = per_nation.agg(
        F.sum("n1").cast("bigint").alias("nn"),
        F.sum("k1").cast("bigint").alias("kk"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    base = (
        per_nation.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(spark.table("nation")),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .selectExpr(
            "n_name", "n1", "k1", "nn - n1 AS n2", "kk - k1 AS k2", "m"
        )
    )
    ps = (
        base.selectExpr("n_name", "n1", "k1", "m", f"{_BH_Z} AS z")
        .selectExpr("*", f"{_BH_AZ} AS az")
        .selectExpr("*", f"{_BH_TT} AS tt")
        .selectExpr("n_name", "n1", "k1", "m", "z", f"{_BH_P} AS p")
    )
    ranked = ps.withColumn(
        "rn", F.row_number().over(Window.orderBy("p", "n_name"))
    ).withColumn(
        "pass_i",
        F.expr(f"CASE WHEN p <= {_BH_CRIT} THEN 1 ELSE 0 END"),
    )
    wrej = (
        Window.orderBy("rn").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return ranked.select(
        "n_name",
        F.col("n1").alias("n_orders"),
        F.col("k1").alias("n_urgent"),
        F.round("z", 6).alias("z_score"),
        F.round("p", 6).alias("p_value"),
        F.col("rn").cast("int").alias("p_rank"),
        F.max("pass_i").over(wrej).cast("int").alias("rejected"),
    ).orderBy("p_rank")


from dawis_spark.operators.stats import (
    ANOVA_ETA2 as _ANOVA_ETA2,
    ANOVA_F as _ANOVA_F,
    ANOVA_SSB as _ANOVA_SSB,
    ANOVA_SSW as _ANOVA_SSW,
    WELCH_DF as _WELCH_DF,
    WELCH_P as _WELCH_P,
    WELCH_T as _WELCH_T,
)

_CENTS_O = "CAST(ROUND(o_totalprice * 100, 0) AS HUGEINT)"

_WELCH_ORACLE = f"""
WITH one AS (
  SELECT CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS HUGEINT) AS n1_i,
         CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS HUGEINT) AS n2_i,
         SUM(CASE WHEN o_orderstatus = 'F' THEN {_CENTS_O} END) AS s1_i,
         SUM(CASE WHEN o_orderstatus = 'O' THEN {_CENTS_O} END) AS s2_i,
         SUM(CASE WHEN o_orderstatus = 'F' THEN {_CENTS_O} * {_CENTS_O} END) AS q1_i,
         SUM(CASE WHEN o_orderstatus = 'O' THEN {_CENTS_O} * {_CENTS_O} END) AS q2_i
  FROM orders WHERE o_orderstatus IN ('F', 'O')),
d AS (
  SELECT CAST(n1_i AS DOUBLE) AS n1, CAST(n2_i AS DOUBLE) AS n2,
         CAST(s1_i AS DOUBLE) AS s1, CAST(s2_i AS DOUBLE) AS s2,
         CAST(n1_i * q1_i - s1_i * s1_i AS DOUBLE) AS nv1,
         CAST(n2_i * q2_i - s2_i * s2_i AS DOUBLE) AS nv2
  FROM one)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       ROUND(s1 / n1, 4) AS mean1, ROUND(s2 / n2, 4) AS mean2,
       ROUND({_WELCH_T}, 6) AS t_stat,
       ROUND({_WELCH_DF}, 4) AS df_welch,
       ROUND({_WELCH_P}, 6) AS p_value
FROM d
"""


@query("welch_ttest_order_value", oracle=_WELCH_ORACLE)
def welch_ttest_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test: do finished ('F') and open
    ('O') orders differ in mean value? The two-sample mean-comparison
    companion to proportion_ztest (shares) and mann_whitney_drift
    (distribution shift) — Welch rather than pooled Student because
    segment variances are never equal in practice.

    Exactness: one conditional exact-integer aggregate (cents
    discipline); t, the Welch-Satterthwaite df, and the A&S-7.1.26
    normal p-value are shared expression strings evaluated by both
    engines over the same doubles (operators/stats.py:welch_ttest).

    Scale: single scan collapsing map-side to one 6-number row — no
    exchange wider than one row."""
    from dawis_spark.operators.stats import welch_ttest

    o = spark.table("orders").select(
        "o_orderstatus",
        F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").alias("cents"),
    )
    return welch_ttest(o, "o_orderstatus", "cents", "F", "O")


_ANOVA_ORACLE = f"""
WITH per AS (
  SELECT o_orderpriority AS g, CAST(COUNT(*) AS HUGEINT) AS n_g,
         SUM({_CENTS_O}) AS s_g,
         SUM({_CENTS_O} * {_CENTS_O}) AS q_g
  FROM orders GROUP BY 1),
terms AS (
  SELECT g, n_g, s_g, q_g,
         CAST(s_g * s_g AS DOUBLE) / CAST(n_g AS DOUBLE) AS t_g
  FROM per),
folded AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k_i,
         SUM(n_g) AS n_i, SUM(s_g) AS s_i, SUM(q_g) AS q_i,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(t_g ORDER BY g)), (acc, e) -> acc + e) AS sum_tg
  FROM terms),
d AS (
  SELECT k_i, n_i, CAST(k_i AS DOUBLE) AS k, CAST(n_i AS DOUBLE) AS n,
         CAST(q_i AS DOUBLE) AS q,
         CAST(s_i * s_i AS DOUBLE) / CAST(n_i AS DOUBLE) AS ss_over_n,
         sum_tg
  FROM folded)
SELECT CAST(k_i AS INT) AS k_groups, CAST(n_i AS BIGINT) AS n_rows,
       ROUND({_ANOVA_SSB}, 4) AS ssb, ROUND({_ANOVA_SSW}, 4) AS ssw,
       ROUND({_ANOVA_F}, 6) AS f_stat,
       ROUND({_ANOVA_ETA2}, 6) AS eta_squared
FROM d
"""


@query("anova_order_value_priority", oracle=_ANOVA_ORACLE)
def anova_order_value_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA: does mean order value differ across the five
    order priorities? The k-group generalization of
    welch_ttest_order_value — the screen run BEFORE k*(k-1)/2 pairwise
    tests (which fdr_bh_nation_urgency then corrects), with eta^2 as
    the effect size a significance-only report omits.

    Exactness: per-group exact-integer sufficient statistics; each
    group's s^2/n pays one identical double division and the k-term
    sum is an ordered group-sorted fold; F/eta^2 are shared expression
    strings (operators/stats.py:anova_oneway).

    Scale: one keyed aggregate to k=5 rows; everything after is
    group-cardinality-bounded."""
    from dawis_spark.operators.stats import anova_oneway

    o = spark.table("orders").select(
        "o_orderpriority",
        F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").alias("cents"),
    )
    return anova_oneway(o, "o_orderpriority", "cents")


_ASSOC_ORACLE = """
WITH cells AS (
  SELECT l_returnflag AS r, l_linestatus AS c, CAST(COUNT(*) AS BIGINT) AS obs
  FROM lineitem GROUP BY 1, 2),
rows_m AS (SELECT r, CAST(SUM(obs) AS BIGINT) AS row_n FROM cells GROUP BY 1),
cols_m AS (SELECT c, CAST(SUM(obs) AS BIGINT) AS col_n FROM cells GROUP BY 1),
tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells),
scored AS (
  SELECT rm.r, cm.c, CAST(COALESCE(obs, 0) AS BIGINT) AS obs, row_n, col_n, n
  FROM rows_m rm CROSS JOIN cols_m cm
  LEFT JOIN cells ON cells.r = rm.r AND cells.c = cm.c
  CROSS JOIN tot),
terms AS (
  SELECT r, c, n,
         CAST((CAST(obs AS HUGEINT) * n - CAST(row_n AS HUGEINT) * col_n)
              * (CAST(obs AS HUGEINT) * n - CAST(row_n AS HUGEINT) * col_n) AS DOUBLE)
           / CAST(CAST(row_n AS HUGEINT) * col_n * n AS DOUBLE) AS chi_term,
         CASE WHEN obs > 0 THEN
           (CAST(obs AS DOUBLE) / CAST(n AS DOUBLE))
           * ln(CAST(CAST(obs AS HUGEINT) * n AS DOUBLE)
                / CAST(CAST(row_n AS HUGEINT) * col_n AS DOUBLE))
         ELSE 0.0 END AS mi_term
  FROM scored),
cell_fold AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n_rows, CAST(COUNT(*) AS BIGINT) AS n_cells,
         CAST(COUNT(DISTINCT r) - 1 AS BIGINT) AS rm1,
         CAST(COUNT(DISTINCT c) - 1 AS BIGINT) AS cm1,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(chi_term ORDER BY r, c)), (acc, e) -> acc + e) AS chi2_raw,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(mi_term ORDER BY r, c)), (acc, e) -> acc + e) AS mi_raw
  FROM terms),
hr AS (
  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(-(CAST(row_n AS DOUBLE) / CAST(n AS DOUBLE))
                * ln(CAST(row_n AS DOUBLE) / CAST(n AS DOUBLE)) ORDER BY r)),
         (acc, e) -> acc + e) AS h_r
  FROM (SELECT DISTINCT r, row_n, n FROM scored)),
hc AS (
  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(-(CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE))
                * ln(CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE)) ORDER BY c)),
         (acc, e) -> acc + e) AS h_c
  FROM (SELECT DISTINCT c, col_n, n FROM scored))
SELECT n_rows, n_cells, CAST(rm1 * cm1 AS BIGINT) AS dof,
       ROUND(chi2_raw, 6) AS chi2,
       ROUND(sqrt(chi2_raw / (CAST(n_rows AS DOUBLE) * least(rm1, cm1))), 6)
         AS cramers_v,
       ROUND(mi_raw, 6) AS mi_nats,
       ROUND(mi_raw / sqrt(h_r * h_c), 6) AS nmi
FROM cell_fold CROSS JOIN hr CROSS JOIN hc
"""


@query("categorical_association_profile", oracle=_ASSOC_ORACLE)
def categorical_association_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effect-size profile for the returnflag x linestatus association:
    chi-square (is there ANY dependence), Cramér's V and normalized
    mutual information (how MUCH, on [0, 1]) in one pass — what a
    feature-selection/profiling sweep ranks categorical column pairs
    by, complementing feature_correlations (numeric) and
    chi_square_independence (significance only).

    Exactness: exact-integer cells/marginals; per-cell chi/MI terms pay
    one double division (+ln) evaluated identically in both engines;
    every sum is an ordered fold (operators/stats.py:
    categorical_association).

    Scale: one keyed aggregate to the 6-cell contingency relation;
    marginal windows and folds are cell-/category-bounded."""
    from dawis_spark.operators.stats import categorical_association

    li = spark.table("lineitem").select("l_returnflag", "l_linestatus")
    return categorical_association(li, "l_returnflag", "l_linestatus")


# Per-(doc, lang) log-posterior for the fold model — same shape as
# _NB_SCORE but over the LEAVE-ONE-FOLD-OUT parameters (t_l, v, d_l, d
# are per-fold). Written once, evaluated by both engines.
_NBCV_SCORE = (
    "ln(d_l) - ln(d) + COALESCE(seen_s, CAST(0 AS DOUBLE))"
    " - tf_tot * ln(t_l + v)"
)

_NBCV_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, CAST(doc_id % 4 AS INT) AS fold, lang, t FROM (
    SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS t
    FROM documents)
  WHERE t <> ''),
ctf AS (
  SELECT fold, lang, t, CAST(COUNT(*) AS BIGINT) AS c_f
  FROM toks GROUP BY 1, 2, 3),
ct_tot AS (
  SELECT lang, t, CAST(SUM(c_f) AS BIGINT) AS c_tot FROM ctf GROUP BY 1, 2),
fold_l AS (
  SELECT fold, lang, CAST(SUM(c_f) AS BIGINT) AS f_l FROM ctf GROUP BY 1, 2),
tot_l AS (SELECT lang, CAST(SUM(c_tot) AS BIGINT) AS tl_all FROM ct_tot GROUP BY 1),
tok_tot AS (SELECT t, CAST(SUM(c_tot) AS BIGINT) AS tt FROM ct_tot GROUP BY 1),
tok_f AS (
  SELECT fold, t, CAST(SUM(c_f) AS BIGINT) AS tf_cnt FROM ctf GROUP BY 1, 2),
v_all AS (SELECT CAST(COUNT(*) AS BIGINT) AS va FROM tok_tot),
v_only AS (
  SELECT f.fold, CAST(COUNT(*) AS BIGINT) AS vo
  FROM tok_f f JOIN tok_tot USING (t) WHERE f.tf_cnt = tok_tot.tt
  GROUP BY 1),
folds AS (SELECT DISTINCT CAST(doc_id % 4 AS INT) AS fold FROM documents),
v_f AS (
  SELECT folds.fold, va - COALESCE(vo, 0) AS v
  FROM folds CROSS JOIN v_all LEFT JOIN v_only ON v_only.fold = folds.fold),
d_fold AS (
  SELECT CAST(doc_id % 4 AS INT) AS fold, lang,
         CAST(COUNT(*) AS BIGINT) AS df_l
  FROM documents GROUP BY 1, 2),
d_tot AS (SELECT lang, CAST(SUM(df_l) AS BIGINT) AS dt_l FROM d_fold GROUP BY 1),
langs AS (
  SELECT folds.fold, d_tot.lang,
         dt_l - COALESCE(df_l, 0) AS d_l,
         tl_all - COALESCE(f_l, 0) AS t_l,
         v
  FROM folds CROSS JOIN d_tot
  JOIN tot_l ON tot_l.lang = d_tot.lang
  JOIN v_f ON v_f.fold = folds.fold
  LEFT JOIN d_fold ON d_fold.fold = folds.fold AND d_fold.lang = d_tot.lang
  LEFT JOIN fold_l ON fold_l.fold = folds.fold AND fold_l.lang = d_tot.lang),
d_train AS (
  SELECT fold, CAST(SUM(d_l) AS BIGINT) AS d FROM langs GROUP BY 1),
etok AS (
  SELECT doc_id, fold, t, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, fold, t FROM toks) GROUP BY 1, 2, 3),
etot AS (
  SELECT doc_id, fold, CAST(SUM(tf) AS BIGINT) AS tf_tot
  FROM etok GROUP BY 1, 2),
seen AS (
  SELECT e.doc_id, ct_tot.lang,
         SUM(e.tf * ln(ct_tot.c_tot - COALESCE(ctf.c_f, 0) + 1)) AS seen_s
  FROM etok e
  JOIN ct_tot ON ct_tot.t = e.t
  LEFT JOIN ctf ON ctf.fold = e.fold AND ctf.lang = ct_tot.lang
                AND ctf.t = e.t
  WHERE ct_tot.c_tot - COALESCE(ctf.c_f, 0) > 0
  GROUP BY 1, 2),
scored AS (
  SELECT etot.doc_id, etot.fold, l.lang, {_NBCV_SCORE} AS score
  FROM etot
  JOIN langs l ON l.fold = etot.fold
  JOIN d_train ON d_train.fold = etot.fold
  LEFT JOIN seen s ON s.doc_id = etot.doc_id AND s.lang = l.lang),
pred AS (
  SELECT doc_id, fold, lang AS predicted FROM (
    SELECT doc_id, fold, lang,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, lang ASC) AS rn
    FROM scored)
  WHERE rn = 1)
SELECT p.fold, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN d.lang = p.predicted THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       ROUND(CAST(SUM(CASE WHEN d.lang = p.predicted THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy
FROM documents d JOIN pred p USING (doc_id)
GROUP BY 1 ORDER BY 1
"""


@query("naive_bayes_cv_folds", oracle=_NBCV_ORACLE)
def naive_bayes_cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-fold cross-validated naive Bayes language ID — per-fold
    held-out accuracy, the variance-aware upgrade of the single-split
    naive_bayes_langid eval. The k models are NEVER trained
    separately: one tokenization pass builds per-(fold, lang, token)
    counts, and fold f's training counts are the TOTALS MINUS fold f's
    (the leave-one-out subtraction trick) — per-fold vocabulary size
    and priors likewise by subtraction, so k-fold CV costs one corpus
    scan plus vocabulary-sized arithmetic instead of k scans.

    Determinism: same discipline as naive_bayes_langid — exact-integer
    count models, shared score string (_NBCV_SCORE), (score DESC, lang
    ASC) argmax tiebreak; the per-(doc,lang) seen-sum is the one float
    reduce and only matters at exact argmax ties.

    Scale: model relations are folds x vocabulary-sized (4x the langid
    model), never corpus-sized; the eval-token/model join shuffles
    token keys; the doc x lang fan-out is |langs|-bounded; the argmax
    window is partitioned by doc."""
    from pyspark.sql import Window

    docs = spark.table("documents").withColumn(
        "fold", (F.col("doc_id") % 4).cast("int")
    )
    toks = docs.select(
        "doc_id",
        "fold",
        "lang",
        F.explode(F.split(F.lower("text"), " ")).alias("t"),
    ).filter(F.col("t") != "")

    ctf = toks.groupBy("fold", "lang", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_f")
    )
    ct_tot = ctf.groupBy("lang", "t").agg(
        F.sum("c_f").cast("bigint").alias("c_tot")
    )
    fold_l = ctf.groupBy("fold", "lang").agg(
        F.sum("c_f").cast("bigint").alias("f_l")
    )
    tot_l = ct_tot.groupBy("lang").agg(
        F.sum("c_tot").cast("bigint").alias("tl_all")
    )
    tok_tot = ct_tot.groupBy("t").agg(F.sum("c_tot").cast("bigint").alias("tt"))
    tok_f = ctf.groupBy("fold", "t").agg(
        F.sum("c_f").cast("bigint").alias("tf_cnt")
    )
    v_all = tok_tot.agg(F.count(F.lit(1)).cast("bigint").alias("va"))
    v_only = (
        tok_f.join(tok_tot, "t")
        .filter(F.col("tf_cnt") == F.col("tt"))
        .groupBy("fold")
        .agg(F.count(F.lit(1)).cast("bigint").alias("vo"))
    )
    folds = docs.select("fold").distinct()
    v_f = (
        folds.crossJoin(F.broadcast(v_all))
        .join(F.broadcast(v_only), "fold", "left")
        .select(
            "fold",
            (F.col("va") - F.coalesce(F.col("vo"), F.lit(0))).alias("v"),
        )
    )
    d_fold = docs.groupBy("fold", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("df_l")
    )
    d_tot = d_fold.groupBy("lang").agg(F.sum("df_l").cast("bigint").alias("dt_l"))
    langs = (
        folds.crossJoin(F.broadcast(d_tot))
        .join(F.broadcast(tot_l), "lang")
        .join(F.broadcast(v_f), "fold")
        .join(F.broadcast(d_fold), ["fold", "lang"], "left")
        .join(F.broadcast(fold_l), ["fold", "lang"], "left")
        .select(
            "fold",
            "lang",
            (F.col("dt_l") - F.coalesce(F.col("df_l"), F.lit(0))).alias("d_l"),
            (F.col("tl_all") - F.coalesce(F.col("f_l"), F.lit(0))).alias("t_l"),
            "v",
        )
    )
    d_train = langs.groupBy("fold").agg(F.sum("d_l").cast("bigint").alias("d"))

    etok = toks.groupBy("doc_id", "fold", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    etot = etok.groupBy("doc_id", "fold").agg(
        F.sum("tf").cast("bigint").alias("tf_tot")
    )
    c_train = (
        etok.join(ct_tot, "t")
        .join(ctf, ["fold", "lang", "t"], "left")
        .select(
            "doc_id",
            "fold",
            "lang",
            "tf",
            (F.col("c_tot") - F.coalesce(F.col("c_f"), F.lit(0))).alias("c_tr"),
        )
        .filter(F.col("c_tr") > 0)
    )
    seen = c_train.groupBy("doc_id", "lang").agg(
        F.sum(F.col("tf") * F.log(F.col("c_tr") + 1)).alias("seen_s")
    )
    scored = (
        etot.join(F.broadcast(langs), "fold")
        .join(F.broadcast(d_train), "fold")
        .join(seen, ["doc_id", "lang"], "left")
        .selectExpr("doc_id", "fold", "lang", f"{_NBCV_SCORE} AS score")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("lang").asc()
    )
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "fold", F.col("lang").alias("predicted"))
    )
    return (
        docs.select("doc_id", F.col("lang").alias("actual"))
        .join(pred, "doc_id")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((F.col("actual") == F.col("predicted")).cast("int"))
            .cast("bigint")
            .alias("n_correct"),
        )
        .select(
            "fold",
            "n_docs",
            "n_correct",
            F.round(
                F.col("n_correct").cast("double") / F.col("n_docs").cast("double"),
                6,
            ).alias("accuracy"),
        )
        .orderBy("fold")
    )


_PCA_SCALE = 1_000_000
_PCA_ITERS = 12

# Covariance entry from the exact-integer moments (shared string shape):
# C_ij = (n*S_ij - m_i*m_j) / (n^2 * scale^2), the integer numerator cast
# to double ONCE in both engines.
_PCA_C = (
    "CAST(n_i * s_ij - m_i * m_j AS DOUBLE)"
    " / (CAST(n_i AS DOUBLE) * CAST(n_i AS DOUBLE)"
    f" * {_PCA_SCALE}.0 * {_PCA_SCALE}.0)"
)


def _pca_oracle() -> str:
    its = []
    prev = "v0"
    for t in range(1, _PCA_ITERS + 1):
        its.append(
            f"""w{t} AS MATERIALIZED (
  SELECT m.i AS i,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(m.c * v.v ORDER BY m.j)), (a, b) -> a + b) AS w
  FROM mat m JOIN {prev} v ON v.i = m.j GROUP BY m.i),
n{t} AS (
  SELECT sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         list(w * w ORDER BY i)), (a, b) -> a + b)) AS nr
  FROM w{t}),
v{t} AS (SELECT i, w / nr AS v FROM w{t} CROSS JOIN n{t})"""
        )
        prev = f"v{t}"
    iter_ctes = ",\n".join(its)
    return f"""
WITH comps AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * {_PCA_SCALE}, 0)
              AS HUGEINT) AS q
  FROM embeddings),
moms AS (
  SELECT i, SUM(q) AS m_i, CAST(COUNT(*) AS HUGEINT) AS n_i
  FROM comps GROUP BY i),
sij AS (
  SELECT a.i AS i, b.i AS j, SUM(a.q * b.q) AS s_ij
  FROM comps a JOIN comps b USING (vec_id) GROUP BY 1, 2),
mat AS MATERIALIZED (
  SELECT s.i, s.j, {_PCA_C} AS c
  FROM (SELECT i, j, s_ij FROM sij) s
  JOIN (SELECT i, m_i, n_i FROM moms) mm ON mm.i = s.i
  JOIN (SELECT i AS ji, m_i AS m_j FROM moms) mj ON mj.ji = s.j),
v0 AS (SELECT i, CAST(0.125 AS DOUBLE) AS v FROM moms),
{iter_ctes},
ref AS (
  SELECT (list(CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END
               ORDER BY abs(v) DESC, i))[1] AS sgn
  FROM v{_PCA_ITERS})
SELECT CAST(v.i AS INT) AS component,
       ROUND(v.v * sgn, 6) AS loading,
       ROUND(nr, 6) AS eigenvalue
FROM v{_PCA_ITERS} v CROSS JOIN n{_PCA_ITERS} CROSS JOIN ref
ORDER BY component
"""


@query("pca_top_component", oracle=_pca_oracle())
def pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding covariance by 12
    relational power iterations: per-dimension loading + the dominant
    eigenvalue. The spectral profile an embedding pipeline checks
    before trusting cosine geometry (anisotropy = one direction
    hogging variance degrades every ANN family upstream), and the
    whitening/JL companion to embedding_ann_jl.

    Exactness — iterative float linear algebra made bit-identical:
    components quantize to ints (x * 1e6, the nearest_centroid
    discipline) so the 64x64 covariance comes from EXACT integer
    moments paying one double cast per entry; every matvec and norm in
    the 12 unrolled iterations is an ORDERED FOLD (by j within row,
    by i across rows), so both engines accumulate in the same order
    and the loadings agree bit-for-bit regardless of convergence
    state. Sign is fixed by the max-|loading| component (ties by
    smallest index).

    Scale: the Gram pass is a mapInPandas integer accumulator — each
    Arrow batch contributes one exact int64 Q^T Q (values fit: q <=
    ~1e6 scaled, so a 10k-row batch partial is <= ~3e15 << 2^63) plus
    the moment vector, and the exchange carries batches x 4,161 rows of
    partial integers, never vectors (the quantizer stays JVM-side so no
    Python rounding can diverge from the oracle's). The earlier
    explode-to-pairs formulation was 64x the scan volume — measured 7x
    for 10x data at sf1; the accumulator's linear part is just the
    batch matmul. Iterations run on 64-row relations with 64-row
    persisted half-steps (the graph-family pattern); nothing downstream
    of the first aggregate sees data volume."""
    import pandas as pd

    emb = spark.table("embeddings")
    qvec = emb.select(
        F.expr(
            "transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE)"
            f" * {_PCA_SCALE}, 0) AS BIGINT))"
        ).alias("q")
    )

    def gram_partials(it):
        import numpy as np

        for pdf in it:
            Q = np.array(pdf["q"].tolist(), dtype=np.int64)
            if Q.size == 0:
                continue
            G = Q.T @ Q
            s = Q.sum(axis=0)
            dim = Q.shape[1]
            ii, jj = np.meshgrid(np.arange(dim), np.arange(dim), indexing="ij")
            yield pd.DataFrame(
                {
                    "i": np.concatenate([ii.ravel(), np.arange(dim), [-1]]),
                    "j": np.concatenate(
                        [jj.ravel(), np.full(dim, -1), [-1]]
                    ),
                    "v": np.concatenate([G.ravel(), s, [Q.shape[0]]]),
                }
            )

    partials = qvec.mapInPandas(gram_partials, "i int, j int, v long")
    sums = partials.groupBy("i", "j").agg(
        F.sum(F.col("v").cast("decimal(38,0)")).alias("v")
    )
    n_row = sums.filter("i = -1 AND j = -1").select(F.col("v").alias("n_i"))
    moms = (
        sums.filter("i >= 0 AND j = -1")
        .select("i", F.col("v").alias("m_i"))
        .crossJoin(F.broadcast(n_row))
    )
    sij = sums.filter("i >= 0 AND j >= 0").select(
        "i", "j", F.col("v").alias("s_ij")
    )
    mat = (
        sij.join(F.broadcast(moms), "i")
        .join(
            F.broadcast(moms.select(F.col("i").alias("j"), F.col("m_i").alias("m_j"))),
            "j",
        )
        .selectExpr("i", "j", f"{_PCA_C} AS c")
        # 4,096-row matrix referenced by all 12 iterations: localCheckpoint
        # truncates the Gram lineage out of every per-iteration plan (the
        # dedup.py:458 discipline — without it the doubly-referenced
        # half-steps compound the LOGICAL plan ~3x per iteration).
        .localCheckpoint(eager=False)
    )
    v = moms.select("i", F.lit(0.125).alias("v"))
    nr = None
    for _ in range(_PCA_ITERS):
        w = (
            mat.join(v.select(F.col("i").alias("j"), "v"), "j")
            .select("i", (F.col("c") * F.col("v")).alias("cv"), "j")
            .groupBy("i")
            .agg(
                F.expr(
                    "aggregate(array_sort(collect_list(struct(j, cv))), "
                    "cast(0.0 as double), (a, e) -> a + e.cv)"
                ).alias("w")
            )
            # 64 rows; reused by the norm AND the next v — truncate here
            .localCheckpoint(eager=False)
        )
        nr = w.select("i", (F.col("w") * F.col("w")).alias("ww")).agg(
            F.expr(
                "sqrt(aggregate(array_sort(collect_list(struct(i, ww))), "
                "cast(0.0 as double), (a, e) -> a + e.ww))"
            ).alias("nr")
        )
        v = w.crossJoin(F.broadcast(nr)).select(
            "i", (F.col("w") / F.col("nr")).alias("v")
        )
    ref = (
        v.orderBy(F.abs(F.col("v")).desc(), F.col("i").asc())
        .limit(1)
        .selectExpr("CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS sgn")
    )
    return (
        v.crossJoin(F.broadcast(ref))
        .crossJoin(F.broadcast(nr))
        .select(
            F.col("i").cast("int").alias("component"),
            F.round(F.col("v") * F.col("sgn"), 6).alias("loading"),
            F.round("nr", 6).alias("eigenvalue"),
        )
        .orderBy("component")
    )


# Equal-width value bins shared by the isotonic fit (same string both
# engines; mn/mx/x are columns in scope).
_ISO_B = "least(CAST(floor((x - mn) / (mx - mn) * 20) AS INT), 19)"

_ISO_ORACLE = f"""
WITH o AS (
  SELECT o_totalprice AS x,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
  FROM orders),
ext AS (SELECT MIN(x) AS mn, MAX(x) AS mx FROM o),
bins AS (
  SELECT {_ISO_B} AS b, CAST(COUNT(*) AS BIGINT) AS n_b,
         CAST(SUM(y) AS BIGINT) AS k_b
  FROM o CROSS JOIN ext GROUP BY 1),
ivals AS (
  SELECT j.b AS j, k.b AS k,
         CAST(SUM(p.n_b) AS BIGINT) AS sn, CAST(SUM(p.k_b) AS BIGINT) AS sk
  FROM bins j JOIN bins k ON j.b <= k.b
  JOIN bins p ON p.b BETWEEN j.b AND k.b
  GROUP BY 1, 2),
inner_min AS (
  SELECT i.b AS i, v.j,
         MIN(CAST(v.sk AS DOUBLE) / CAST(v.sn AS DOUBLE)) AS min_mean
  FROM bins i JOIN ivals v ON v.j <= i.b AND v.k >= i.b
  GROUP BY 1, 2),
iso AS (SELECT i, MAX(min_mean) AS iso_rate FROM inner_min GROUP BY 1)
SELECT b AS bin, n_b, k_b,
       ROUND(CAST(k_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS raw_rate,
       ROUND(iso_rate, 6) AS iso_rate
FROM bins JOIN iso ON iso.i = bins.b ORDER BY bin
"""


@query("isotonic_urgency_by_value", oracle=_ISO_ORACLE)
def isotonic_urgency_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone non-decreasing) regression of the urgent-order
    share on order value, over 20 equal-width value bins — the
    shape-constrained dose-response fit (and the calibration method
    behind isotonic score recalibration, the step up from
    classifier_calibration_curve's raw reliability diagram). Computed
    by the minimax characterization iso(i) = max_{j<=i} min_{k>=i}
    mean(y[j..k]) instead of the sequential pool-adjacent-violators
    stack — pure relational algebra, no order-dependent state.

    Exactness: interval sums are exact integers off a bin-bounded
    triple join; each interval mean pays one identical double
    division; min/max over identical double multisets are
    order-insensitive, so no fold discipline is even needed.

    Scale: one scan collapses to <= 20 bins; intervals are <= 210
    rows and the minimax joins are bin-bounded — constant beyond the
    first aggregate."""
    o = spark.table("orders").select(
        F.col("o_totalprice").alias("x"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("y"),
    )
    ext = o.agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    bins = (
        o.crossJoin(F.broadcast(ext))
        .selectExpr(f"{_ISO_B} AS b", "y")
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_b"),
            F.sum("y").cast("bigint").alias("k_b"),
        )
    )
    j = bins.select(F.col("b").alias("j"))
    k = bins.select(F.col("b").alias("k"))
    p = bins.select(F.col("b").alias("pb"), "n_b", "k_b")
    ivals = (
        j.join(F.broadcast(k), F.col("j") <= F.col("k"))
        .join(
            F.broadcast(p),
            (F.col("pb") >= F.col("j")) & (F.col("pb") <= F.col("k")),
        )
        .groupBy("j", "k")
        .agg(
            F.sum("n_b").cast("bigint").alias("sn"),
            F.sum("k_b").cast("bigint").alias("sk"),
        )
    )
    i_side = bins.select(F.col("b").alias("i"))
    inner_min = (
        i_side.join(
            F.broadcast(ivals),
            (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")),
        )
        .groupBy("i", "j")
        .agg(
            F.min(F.col("sk").cast("double") / F.col("sn").cast("double")).alias(
                "min_mean"
            )
        )
    )
    iso = inner_min.groupBy("i").agg(F.max("min_mean").alias("iso_rate"))
    return (
        bins.join(F.broadcast(iso), bins.b == iso.i)
        .select(
            F.col("b").alias("bin"),
            "n_b",
            "k_b",
            F.round(
                F.col("k_b").cast("double") / F.col("n_b").cast("double"), 6
            ).alias("raw_rate"),
            F.round("iso_rate", 6).alias("iso_rate"),
        )
        .orderBy("bin")
    )


_CUPED_CUTOFF = "1999-01-01 00:00:00"

# CUPED statistics over the pooled exact-integer moments (cnum/cden are
# the covariance/variance numerators n*Sxy - Sx*Sy and n*Sxx - Sx^2 cast
# to double once) and the per-arm exact sums (n_a, sx_a, sy_a doubles).
_CUPED_THETA = "(cnum / cden)"
_CUPED_ADJ = f"(sy_a / n_a - {_CUPED_THETA} * (sx_a / n_a - sx / n))"
_CUPED_CORR2 = "(cnum * cnum / (cden * vyn))"

_CUPED_ORACLE = f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(o_custkey % 2 AS INT) AS arm,
         SUM(CASE WHEN o_orderdate < TIMESTAMP '{_CUPED_CUTOFF}'
             THEN CAST(ROUND(o_totalprice * 100, 0) AS HUGEINT) ELSE 0 END) AS x,
         SUM(CASE WHEN o_orderdate >= TIMESTAMP '{_CUPED_CUTOFF}'
             THEN CAST(ROUND(o_totalprice * 100, 0) AS HUGEINT) ELSE 0 END) AS y
  FROM orders GROUP BY 1, 2),
arms AS (
  SELECT arm, CAST(COUNT(*) AS HUGEINT) AS n_a_i,
         SUM(x) AS sx_a_i, SUM(y) AS sy_a_i,
         SUM(x*x) AS sxx_a_i, SUM(x*y) AS sxy_a_i, SUM(y*y) AS syy_a_i
  FROM per_cust GROUP BY 1),
pooled AS (
  SELECT CAST(SUM(n_a_i) AS HUGEINT) AS n_i,
         SUM(sx_a_i) AS sx_i, SUM(sy_a_i) AS sy_i,
         SUM(sxx_a_i) AS sxx_i, SUM(sxy_a_i) AS sxy_i, SUM(syy_a_i) AS syy_i
  FROM arms),
d AS (
  SELECT arm, CAST(n_a_i AS DOUBLE) AS n_a, CAST(sx_a_i AS DOUBLE) AS sx_a,
         CAST(sy_a_i AS DOUBLE) AS sy_a,
         CAST(n_i AS DOUBLE) AS n, CAST(sx_i AS DOUBLE) AS sx,
         CAST(n_i * sxy_i - sx_i * sy_i AS DOUBLE) AS cnum,
         CAST(n_i * sxx_i - sx_i * sx_i AS DOUBLE) AS cden,
         CAST(n_i * syy_i - sy_i * sy_i AS DOUBLE) AS vyn
  FROM arms CROSS JOIN pooled)
SELECT arm, CAST(n_a AS BIGINT) AS n_units,
       ROUND(sy_a / n_a, 4) AS mean_post_cents,
       ROUND({_CUPED_ADJ}, 4) AS mean_adjusted_cents,
       ROUND({_CUPED_THETA}, 6) AS theta,
       ROUND({_CUPED_CORR2}, 6) AS variance_reduction
FROM d ORDER BY arm
"""


@query("cuped_adjusted_arm_means", oracle=_CUPED_ORACLE)
def cuped_adjusted_arm_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for an A/B readout: per-customer
    post-period revenue adjusted by pre-period revenue
    (y' = y - theta*(x - mean(x)), theta = cov(x,y)/var(x) pooled),
    arms assigned by the deterministic custkey hash split. The
    experimentation-platform primitive that shrinks metric variance by
    corr(x,y)^2 — reported alongside the adjustment so the readout
    shows WHY the adjusted CI is tighter.

    Exactness: per-customer period sums and all cross-moments are
    exact integers (cents discipline); theta, the adjusted means, and
    the variance-reduction ratio are shared expression strings over
    one-time double casts of those integers — bit-identical engines.

    Scale: one keyed aggregate to customer grain (the canonical
    pre-aggregation), one conditional aggregate to 2 arm rows, pooled
    moments by exact-integer arm sums — nothing wider than 2 rows
    after the customer rollup."""
    cents = F.expr("CAST(ROUND(o_totalprice * 100, 0) AS DECIMAL(38,0))")
    pre = F.col("o_orderdate") < F.lit(_CUPED_CUTOFF).cast("timestamp")
    per_cust = (
        spark.table("orders")
        .groupBy(
            "o_custkey", (F.col("o_custkey") % 2).cast("int").alias("arm")
        )
        .agg(
            F.sum(F.when(pre, cents).otherwise(F.lit(0).cast("decimal(38,0)")))
            .alias("x"),
            F.sum(F.when(~pre, cents).otherwise(F.lit(0).cast("decimal(38,0)")))
            .alias("y"),
        )
    )
    arms = per_cust.groupBy("arm").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_a_i"),
        F.sum("x").alias("sx_a_i"),
        F.sum("y").alias("sy_a_i"),
        F.sum(F.col("x") * F.col("x")).alias("sxx_a_i"),
        F.sum(F.col("x") * F.col("y")).alias("sxy_a_i"),
        F.sum(F.col("y") * F.col("y")).alias("syy_a_i"),
    )
    pooled = arms.agg(
        F.sum("n_a_i").alias("n_i"),
        F.sum("sx_a_i").alias("sx_i"),
        F.sum("sy_a_i").alias("sy_i"),
        F.sum("sxx_a_i").alias("sxx_i"),
        F.sum("sxy_a_i").alias("sxy_i"),
        F.sum("syy_a_i").alias("syy_i"),
    )
    d = arms.crossJoin(F.broadcast(pooled)).selectExpr(
        "arm",
        "CAST(n_a_i AS DOUBLE) AS n_a",
        "CAST(sx_a_i AS DOUBLE) AS sx_a",
        "CAST(sy_a_i AS DOUBLE) AS sy_a",
        "CAST(n_i AS DOUBLE) AS n",
        "CAST(sx_i AS DOUBLE) AS sx",
        "CAST(n_i * sxy_i - sx_i * sy_i AS DOUBLE) AS cnum",
        "CAST(n_i * sxx_i - sx_i * sx_i AS DOUBLE) AS cden",
        "CAST(n_i * syy_i - sy_i * sy_i AS DOUBLE) AS vyn",
    )
    return d.selectExpr(
        "arm",
        "CAST(n_a AS BIGINT) AS n_units",
        "ROUND(sy_a / n_a, 4) AS mean_post_cents",
        f"ROUND({_CUPED_ADJ}, 4) AS mean_adjusted_cents",
        f"ROUND({_CUPED_THETA}, 6) AS theta",
        f"ROUND({_CUPED_CORR2}, 6) AS variance_reduction",
    ).orderBy("arm")


# 2x2 DiD cell names: t = in-region (treated), p = post-period. The
# one-row relation carries per-cell doubles (nTP, sTP, nvTP) with
# nv = n*q - s^2 exact-int variance numerators.
_DID_EST = "((s11/n11 - s10/n10) - (s01/n01 - s00/n00))"
_DID_SE = (
    "sqrt(nv00/(n00*(n00-1))/n00 + nv01/(n01*(n01-1))/n01"
    " + nv10/(n10*(n10-1))/n10 + nv11/(n11*(n11-1))/n11)"
)
_DID_Z = f"({_DID_EST} / {_DID_SE})"

_DID_ORACLE = f"""
WITH base AS (
  SELECT CASE WHEN r_name = 'ASIA' THEN 1 ELSE 0 END AS t,
         CASE WHEN o_orderdate >= TIMESTAMP '{_CUPED_CUTOFF}' THEN 1 ELSE 0 END AS p,
         CAST(ROUND(o_totalprice * 100, 0) AS HUGEINT) AS v
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey),
cells AS (
  SELECT t, p, CAST(COUNT(*) AS HUGEINT) AS n_i, SUM(v) AS s_i,
         SUM(v*v) AS q_i
  FROM base GROUP BY 1, 2),
one AS (
  SELECT
    MAX(CASE WHEN t=0 AND p=0 THEN CAST(n_i AS DOUBLE) END) AS n00,
    MAX(CASE WHEN t=0 AND p=1 THEN CAST(n_i AS DOUBLE) END) AS n01,
    MAX(CASE WHEN t=1 AND p=0 THEN CAST(n_i AS DOUBLE) END) AS n10,
    MAX(CASE WHEN t=1 AND p=1 THEN CAST(n_i AS DOUBLE) END) AS n11,
    MAX(CASE WHEN t=0 AND p=0 THEN CAST(s_i AS DOUBLE) END) AS s00,
    MAX(CASE WHEN t=0 AND p=1 THEN CAST(s_i AS DOUBLE) END) AS s01,
    MAX(CASE WHEN t=1 AND p=0 THEN CAST(s_i AS DOUBLE) END) AS s10,
    MAX(CASE WHEN t=1 AND p=1 THEN CAST(s_i AS DOUBLE) END) AS s11,
    MAX(CASE WHEN t=0 AND p=0 THEN CAST(n_i*q_i - s_i*s_i AS DOUBLE) END) AS nv00,
    MAX(CASE WHEN t=0 AND p=1 THEN CAST(n_i*q_i - s_i*s_i AS DOUBLE) END) AS nv01,
    MAX(CASE WHEN t=1 AND p=0 THEN CAST(n_i*q_i - s_i*s_i AS DOUBLE) END) AS nv10,
    MAX(CASE WHEN t=1 AND p=1 THEN CAST(n_i*q_i - s_i*s_i AS DOUBLE) END) AS nv11
  FROM cells),
zs AS (
  SELECT CAST(n00 + n01 + n10 + n11 AS BIGINT) AS n_orders,
         ROUND(s00/n00, 4) AS mean_ctrl_pre, ROUND(s01/n01, 4) AS mean_ctrl_post,
         ROUND(s10/n10, 4) AS mean_treat_pre, ROUND(s11/n11, 4) AS mean_treat_post,
         ROUND({_DID_EST}, 4) AS did_cents, ROUND({_DID_SE}, 4) AS se_cents,
         {_DID_Z} AS z
  FROM one)
SELECT n_orders, mean_ctrl_pre, mean_ctrl_post, mean_treat_pre, mean_treat_post,
       did_cents, se_cents, ROUND(z, 6) AS z_score,
       ROUND({{P}}, 6) AS p_value
FROM (SELECT *, {{TT}} AS tt FROM (SELECT *, {{AZ}} AS az FROM zs))
"""


def _did_oracle() -> str:
    return _DID_ORACLE.replace("{P}", _BH_P).replace("{TT}", _BH_TT).replace(
        "{AZ}", _BH_AZ
    )


@query("diff_in_diff_region_value", oracle=_did_oracle())
def diff_in_diff_region_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate of the ASIA-region order-value
    shift across the 1999 period boundary: (treat_post - treat_pre) -
    (ctrl_post - ctrl_pre), with the large-sample SE from the four
    cell variances and the A&S normal p — the panel-data causal
    companion to cuped_adjusted_arm_means (which handles randomized
    splits; DiD handles the observational region 'rollout').

    Exactness: the 2x2 cells carry exact-integer (n, s, q) off one
    fact-dim join; means, the DiD contrast, its SE, z, and p are
    shared expression strings over one-time double casts — identical
    engines.

    Scale: the orders->customer->nation->region join broadcasts the
    dims; one conditional aggregate collapses to a single row."""
    cutoff = F.lit(_CUPED_CUTOFF).cast("timestamp")
    o = spark.table("orders")
    c = spark.table("customer")
    n = spark.table("nation")
    r = spark.table("region")
    base = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            (F.col("r_name") == "ASIA").cast("int").alias("t"),
            (F.col("o_orderdate") >= cutoff).cast("int").alias("p"),
            F.expr("CAST(ROUND(o_totalprice * 100, 0) AS DECIMAL(38,0))").alias(
                "v"
            ),
        )
    )
    cells = base.groupBy("t", "p").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_i"),
        F.sum("v").alias("s_i"),
        F.sum(F.col("v") * F.col("v")).alias("q_i"),
    )
    picks = []
    for t in (0, 1):
        for p in (0, 1):
            cond = f"t = {t} AND p = {p}"
            picks += [
                F.expr(f"MAX(CASE WHEN {cond} THEN CAST(n_i AS DOUBLE) END)")
                .alias(f"n{t}{p}"),
                F.expr(f"MAX(CASE WHEN {cond} THEN CAST(s_i AS DOUBLE) END)")
                .alias(f"s{t}{p}"),
                F.expr(
                    f"MAX(CASE WHEN {cond} THEN"
                    " CAST(n_i*q_i - s_i*s_i AS DOUBLE) END)"
                ).alias(f"nv{t}{p}"),
            ]
    one = cells.agg(*picks)
    zs = one.selectExpr(
        "CAST(n00 + n01 + n10 + n11 AS BIGINT) AS n_orders",
        "ROUND(s00/n00, 4) AS mean_ctrl_pre",
        "ROUND(s01/n01, 4) AS mean_ctrl_post",
        "ROUND(s10/n10, 4) AS mean_treat_pre",
        "ROUND(s11/n11, 4) AS mean_treat_post",
        f"ROUND({_DID_EST}, 4) AS did_cents",
        f"ROUND({_DID_SE}, 4) AS se_cents",
        f"{_DID_Z} AS z",
    )
    return (
        zs.selectExpr("*", f"{_BH_AZ} AS az")
        .selectExpr("*", f"{_BH_TT} AS tt")
        .selectExpr(
            "n_orders",
            "mean_ctrl_pre",
            "mean_ctrl_post",
            "mean_treat_pre",
            "mean_treat_post",
            "did_cents",
            "se_cents",
            "ROUND(z, 6) AS z_score",
            f"ROUND({_BH_P}, 6) AS p_value",
        )
    )


# Beta-binomial method-of-moments prior over the per-group rates
# (mu/s2 from ordered folds; shared strings over k, sum_p, sum_p2).
_EB_MU = "(sum_p / k)"
_EB_S2 = "((sum_p2 - sum_p * sum_p / k) / (k - 1))"
_EB_COMMON = f"({_EB_MU} * (1 - {_EB_MU}) / {_EB_S2} - 1)"
_EB_ALPHA = f"({_EB_MU} * {_EB_COMMON})"
_EB_BETA = f"((1 - {_EB_MU}) * {_EB_COMMON})"

_EB_ORACLE = f"""
WITH per_nation AS (
  SELECT n_name,
         CAST(COUNT(*) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
              AS BIGINT) AS k1
  FROM orders JOIN customer ON o_custkey = c_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY 1),
rates AS (
  SELECT n_name, n1, k1, CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p_i
  FROM per_nation),
prior AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS k,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(p_i ORDER BY n_name)), (a, b) -> a + b) AS sum_p,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(p_i * p_i ORDER BY n_name)), (a, b) -> a + b) AS sum_p2
  FROM rates)
SELECT n_name, n1 AS n_orders, k1 AS n_urgent,
       ROUND(p_i, 6) AS raw_rate,
       ROUND((CAST(k1 AS DOUBLE) + {_EB_ALPHA})
             / (CAST(n1 AS DOUBLE) + {_EB_ALPHA} + {_EB_BETA}), 6)
         AS shrunk_rate,
       ROUND({_EB_ALPHA}, 4) AS alpha, ROUND({_EB_BETA}, 4) AS beta
FROM rates CROSS JOIN prior ORDER BY n_name
"""


@query("eb_shrunk_urgent_rates", oracle=_EB_ORACLE)
def eb_shrunk_urgent_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-nation urgent-order rates under
    a beta-binomial prior fitted by method of moments across the 25
    nations — the 'rank small-sample segments honestly' primitive
    (raw rates overrank tiny-n segments; shrunk rates pull them
    toward the prior mean in proportion to their evidence), the
    estimation companion to fdr_bh_nation_urgency's testing.

    Exactness: per-nation counts are exact integers; each rate pays
    one identical double division; the prior's mean/variance come
    from name-sorted ordered folds and alpha/beta/shrinkage are
    shared expression strings — identical engines.

    Scale: one co-partitioned fact-dim join to a 25-row relation;
    the prior fold and the broadcast-back are nation-bounded."""
    per_nation = (
        spark.table("orders")
        .join(
            F.broadcast(spark.table("customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(spark.table("nation")),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n1"),
            F.sum((F.col("o_orderpriority") == "1-URGENT").cast("int"))
            .cast("bigint")
            .alias("k1"),
        )
    )
    rates = per_nation.select(
        "n_name",
        "n1",
        "k1",
        (F.col("k1").cast("double") / F.col("n1").cast("double")).alias("p_i"),
    )
    prior = rates.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(n_name, p_i))), "
            "cast(0.0 as double), (a, e) -> a + e.p_i)"
        ).alias("sum_p"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(n_name, p_i * p_i as pp))), "
            "cast(0.0 as double), (a, e) -> a + e.pp)"
        ).alias("sum_p2"),
    )
    return (
        rates.crossJoin(F.broadcast(prior))
        .selectExpr(
            "n_name",
            "n1 AS n_orders",
            "k1 AS n_urgent",
            "ROUND(p_i, 6) AS raw_rate",
            f"ROUND((CAST(k1 AS DOUBLE) + {_EB_ALPHA})"
            f" / (CAST(n1 AS DOUBLE) + {_EB_ALPHA} + {_EB_BETA}), 6)"
            " AS shrunk_rate",
            f"ROUND({_EB_ALPHA}, 4) AS alpha",
            f"ROUND({_EB_BETA}, 4) AS beta",
        )
        .orderBy("n_name")
    )


def _hw_oracle(horizon: int) -> str:
    from dawis_spark.operators.forecast import holt_winters_oracle_ctes

    return f"""
WITH RECURSIVE daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2),
{holt_winters_oracle_ctes('daily', 'event_type', 'day', 'v', 7, horizon)}
SELECT k AS event_type, h, forecast AS forecast_cents,
       level AS level_cents, trend AS trend_cents,
       seasonal AS seasonal_cents, n_points
FROM hw ORDER BY event_type, h
"""


@query("holt_winters_forecast", oracle=_hw_oracle(7))
def holt_winters_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (triple-exponential, weekly period) on
    daily event totals with a 7-day forecast fan — the seasonal step up
    from holt_linear_forecast: forecast(h) = level + h*trend +
    seasonal(phase of n+h), so the day-of-week shape the DOW
    seasonality index measures descriptively is carried into the
    forecast. Dyadic weights (alpha 1/4, beta 1/8, gamma 1/4) keep the
    whole (level, trend, 7-slot seasonal) state in truncating integer
    cents, replayed bit-for-bit by a recursive CTE carrying the
    seasonal slots as columns.

    Scale: same honest applyInPandas boundary as holt_linear_forecast
    — the trunc-div recurrence is sequential per series; the shuffle
    carries (event_type, day, cents) daily aggregates, groups are
    catalog-bounded, per-group state is O(m=7)
    (operators/forecast.py:holt_winters)."""
    from dawis_spark.operators.forecast import holt_winters

    daily = (
        spark.table("events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("v")
        )
    )
    out = holt_winters(daily, "event_type", "day", "v", m=7, horizon=7)
    return out.select(
        "event_type",
        "h",
        F.col("forecast").alias("forecast_cents"),
        F.col("level").alias("level_cents"),
        F.col("trend").alias("trend_cents"),
        F.col("seasonal").alias("seasonal_cents"),
        "n_points",
    ).orderBy("event_type", "h")


_CUBE_ORACLE = """
SELECT COALESCE(l_returnflag, 'ALL') AS flag,
       COALESCE(l_linestatus, 'ALL') AS status,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT)
         AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS HUGEINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY gid, flag, status
"""


@query("cube_revenue_flag_status", oracle=_CUBE_ORACLE)
def cube_revenue_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE rollup of lineitem revenue over (returnflag, linestatus):
    all four grouping-set levels (detail, each single-dim margin, grand
    total) in ONE pass, disambiguated by grouping_id — the
    multi-margin companion to rollup_acctbal (hierarchical ROLLUP).
    NULL placeholder rows are coalesced to 'ALL' so the margin rows
    are self-describing (gid keeps them distinct from any literal).

    Exactness: pure exact-integer counting/summing — no float paths.

    Scale: Spark expands the cube map-side into 4 grouping sets and
    partial-aggregates before the single hash exchange keyed by
    (gid, keys); margin rows add 3 groups per (flag, status) partition
    — the exchange stays group-bounded (max 6*4 rows here)."""
    li = spark.table("lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(F.expr("CAST(ROUND(l_extendedprice * 100, 0) AS DECIMAL(38,0))"))
            .cast("bigint")
            .alias("revenue_cents"),
            F.grouping_id().cast("int").alias("gid"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
            "gid",
            "n_items",
            "revenue_cents",
        )
        .orderBy("gid", "flag", "status")
    )


_HBT_ORIGINS = 3  # rolling origins, one week apart


def _hbt_oracle(horizon: int) -> str:
    from dawis_spark.operators.forecast import holt_oracle_ctes

    return f"""
WITH RECURSIVE daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2),
origins AS (
  SELECT o.o AS origin, MAX(day) - INTERVAL (7 * o.o) DAY AS cutoff
  FROM daily, range(1, {_HBT_ORIGINS + 1}) o(o) GROUP BY o.o),
hb_daily AS (
  SELECT event_type || '|' || CAST(origin AS VARCHAR) AS ck, day, v
  FROM daily JOIN origins ON day <= cutoff),
{holt_oracle_ctes('hb_daily', 'ck', 'day', 'v', horizon)},
fc AS (
  SELECT CAST(string_split(k, '|')[1] AS VARCHAR) AS event_type,
         CAST(string_split(k, '|')[2] AS INT) AS origin, h, forecast
  FROM holt),
joined AS (
  SELECT f.origin, f.h, abs(f.forecast - d.v) AS abs_err
  FROM fc f
  JOIN origins o ON o.origin = f.origin
  JOIN daily d ON d.event_type = f.event_type
              AND d.day = o.cutoff + INTERVAL (f.h) DAY)
SELECT origin, h, CAST(COUNT(*) AS BIGINT) AS n_series,
       ROUND(CAST(SUM(abs_err) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4)
         AS mae_cents
FROM joined GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("holt_backtest_mae", oracle=_hbt_oracle(7))
def holt_backtest_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest of the Holt linear forecaster: re-fit on
    the series truncated one/two/three weeks before the end, forecast
    the next 7 days, and score MAE against the actuals per (origin,
    horizon) — the time-series cross-validation that turns
    holt_linear_forecast from 'a forecast' into 'a forecaster with a
    measured error curve' (and the honest input to choosing it over
    seasonal_naive_mase's yardstick).

    Mechanics: all origins refit in ONE applyInPandas pass by crossing
    the daily series with the 3-row origin relation and compositing
    (event_type, origin) into the series key — k x |origins| small
    groups, no per-origin job. The oracle replays the same composite
    keys through the shared recursive-CTE generator.

    Exactness: forecasts and actuals are exact integer cents, |err|
    exact; MAE pays one double division per output row.

    Scale: the crossed series multiplies the day-bounded daily
    relation by a 3-row broadcast — still calendar-bounded; the
    forecast/actual join is keyed on (event_type, day)."""
    from dawis_spark.operators.forecast import holt_linear

    daily = (
        spark.table("events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("v")
        )
    )
    origins = (
        daily.agg(F.max("day").alias("mx"))
        .select(
            F.explode(F.sequence(F.lit(1), F.lit(_HBT_ORIGINS))).alias("origin"),
            "mx",
        )
        .select(
            "origin",
            F.expr("mx - make_interval(0, 0, 0, 7 * origin)").alias("cutoff"),
        )
    )
    hb_daily = (
        daily.crossJoin(F.broadcast(origins))
        .filter(F.col("day") <= F.col("cutoff"))
        .select(
            F.concat_ws("|", "event_type", F.col("origin").cast("string")).alias(
                "ck"
            ),
            "day",
            "v",
        )
    )
    fc = holt_linear(hb_daily, "ck", "day", "v", horizon=7).select(
        F.split("ck", "\\|").getItem(0).alias("event_type"),
        F.split("ck", "\\|").getItem(1).cast("int").alias("origin"),
        "h",
        "forecast",
    )
    joined = (
        fc.join(F.broadcast(origins), "origin")
        .join(
            daily,
            (F.col("day") == F.expr("cutoff + make_interval(0, 0, 0, h)"))
            & (daily.event_type == fc.event_type),
        )
        .select("origin", "h", F.abs(F.col("forecast") - F.col("v")).alias("abs_err"))
    )
    return (
        joined.groupBy("origin", "h")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_series"),
            F.round(
                F.sum("abs_err").cast("double") / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("mae_cents"),
        )
        .orderBy("origin", "h")
    )


_THETA_ORACLE = f"""
WITH RECURSIVE daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2),
{{CTES}}
SELECT k AS event_type, h, forecast AS forecast_cents,
       level AS ses_level_cents, slope AS slope_cents_per_day, n_points
FROM theta ORDER BY event_type, h
"""


def _theta_oracle() -> str:
    from dawis_spark.operators.forecast import theta_oracle_ctes

    return _THETA_ORACLE.format(
        CTES=theta_oracle_ctes("daily", "event_type", "day", "v", 7)
    )


@query("theta_method_forecast", oracle=_theta_oracle())
def theta_method_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Theta(0,2) forecast of daily event totals, 7 days ahead
    per event type — the M3-competition-winning simple combination that
    sits between holt_linear_forecast (recursive trend) and
    seasonal_naive: SES supplies the local level, HALF the global OLS
    drift supplies the trend, which empirically damps Holt's tendency
    to over-extrapolate.

    Exactness: the SES state is the holt_linear dyadic truncating
    integer recursion (alpha = 1/4); the drift adds round(num * (h - 1
    + 4) / (2 * den)) computed from the EXACT rational OLS slope, the
    same expression in the pandas fit and the recursive-CTE twin
    (operators/forecast.py:theta_forecast).

    Scale: one hash exchange of calendar-bounded daily aggregates;
    O(days) integer state per key inside the honest applyInPandas
    boundary; h-row fan-out per key."""
    from dawis_spark.operators.forecast import theta_forecast

    daily = (
        spark.table("events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)"))
            .cast("bigint")
            .alias("v")
        )
    )
    return (
        theta_forecast(daily, "event_type", "day", "v", horizon=7)
        .select(
            "event_type",
            "h",
            F.col("forecast").alias("forecast_cents"),
            F.col("level").alias("ses_level_cents"),
            F.col("slope").alias("slope_cents_per_day"),
            "n_points",
        )
        .orderBy("event_type", "h")
    )


_CROSTON_THR = 200.0
_CROSTON_ORACLE = f"""
WITH RECURSIVE dm AS (
  SELECT event_type,
         date_diff('day',
                   (SELECT MIN(date_trunc('day', ts)) FROM events),
                   date_trunc('day', ts)) AS d0,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE value >= {_CROSTON_THR} GROUP BY 1, 2),
{{CTES}}
SELECT k AS event_type, n_points, size_hat, interval_hat, rate
FROM croston_out ORDER BY event_type
"""


def _croston_oracle() -> str:
    from dawis_spark.operators.forecast import croston_oracle_ctes

    return _CROSTON_ORACLE.format(
        CTES=croston_oracle_ctes("dm", "event_type", "d0", "c")
    )


@query("croston_intermittent_demand", oracle=_croston_oracle())
def croston_intermittent_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's intermittent-demand forecast over the SPARSE daily
    series of high-value events (value >= 200) per event type: SES of
    the nonzero demand sizes and SES of the inter-arrival intervals,
    rate = size_hat / interval_hat. For series that are mostly zero
    (spare parts, rare conversions, incident counts) plain SES decays
    toward zero between demands and systematically under-forecasts;
    Croston's split estimator is the standard fix — this is the
    forecaster the holt/theta family hands over to when the series
    goes sparse.

    Exactness: both SES states are micro-scaled integers under the
    dyadic truncating recursion; day offsets are exact integer
    date-diffs from the global first event day; two final divisions
    (operators/forecast.py:croston).

    Scale: the demand relation is (key x demand-days) — SPARSER than
    the calendar; one hash exchange, O(points) per key, 1-row output
    per key."""
    from dawis_spark.operators.forecast import croston

    ev = spark.table("events")
    first_day = ev.agg(
        F.date_trunc("day", F.min(F.date_trunc("day", "ts"))).alias("d_first")
    )
    dm = (
        ev.filter(F.col("value") >= F.lit(_CROSTON_THR))
        .crossJoin(F.broadcast(first_day))
        .groupBy(
            "event_type",
            F.expr("datediff(date_trunc('day', ts), d_first)").alias("d0"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return (
        croston(dm, "event_type", "d0", "c")
        .orderBy("event_type")
    )


_PGRAM_K = 14
_PGRAM_ORACLE = f"""
WITH daily AS (
  SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev,
         ROW_NUMBER() OVER (ORDER BY o_orderdate) - 1 AS t,
         COUNT(*) OVER () AS n
  FROM orders GROUP BY o_orderdate),
grid AS (
  SELECT kk.k, d.rev, d.n,
         CAST(ROUND(cos(2 * pi() * kk.k * d.t / d.n) * 1000000) AS BIGINT) AS c6,
         CAST(ROUND(sin(2 * pi() * kk.k * d.t / d.n) * 1000000) AS BIGINT) AS s6
  FROM daily d CROSS JOIN range(1, {_PGRAM_K + 1}) kk(k)),
sums AS (
  SELECT k, CAST(MAX(n) AS BIGINT) AS n_days,
         SUM(CAST(rev AS HUGEINT) * c6) AS sc,
         SUM(CAST(rev AS HUGEINT) * s6) AS ss
  FROM grid GROUP BY 1)
SELECT CAST(k AS INT) AS k, n_days,
       ROUND(CAST(n_days AS DOUBLE) / k, 2) AS period_days,
       ROUND((CAST(sc AS DOUBLE) / 100000000.0 / n_days)
             * (CAST(sc AS DOUBLE) / 100000000.0 / n_days)
             + (CAST(ss AS DOUBLE) / 100000000.0 / n_days)
             * (CAST(ss AS DOUBLE) / 100000000.0 / n_days), 4) AS power
FROM sums ORDER BY k
"""


@query("periodogram_daily_revenue", oracle=_PGRAM_ORACLE)
def periodogram_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-Fourier periodogram of daily revenue at integer
    frequencies k = 1..14: power_k = |n^-1 * sum_t x_t e^(-2pi i k
    t/n)|^2 in squared currency units — the frequency-domain
    complement to acf_daily_revenue (a weekly cycle shows as a ridge
    at period ~7, i.e. k ~ n/7) and the principled input to choosing
    holt_winters' season length m.

    Determinism: the trig basis is rounded to micro units per (t, k)
    cell BEFORE the sums, so both engines sum exact HUGEINT/DECIMAL38
    products (revenue cents x micro-cos) — summation order vanishes;
    the two squares and divisions are identical double chains.
    (Math.cos vs libm cos can differ by ~1 ulp, which only matters if
    a cell lands within 1e-10 of a .5 micro boundary — the standing
    round-6 transcendental discipline used by the perplexity family.)

    Scale: the daily series is calendar-bounded; the k-grid multiplies
    it by a CONSTANT 14 — one map-side expand + one 14-group exact
    aggregate; no shuffle wider than 14 rows."""
    daily = (
        spark.table("orders")
        .groupBy("o_orderdate")
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("bigint")
            .alias("rev")
        )
    )
    from pyspark.sql import Window as _W

    indexed = daily.select(
        "rev",
        (F.row_number().over(_W.orderBy("o_orderdate")) - 1).alias("t"),
        F.count(F.lit(1)).over(_W.partitionBy()).alias("n"),
    )
    grid = indexed.crossJoin(
        F.broadcast(
            spark.range(1, _PGRAM_K + 1).select(F.col("id").cast("int").alias("k"))
        )
    ).selectExpr(
        "k",
        "rev",
        "n",
        "CAST(ROUND(cos(2 * pi() * k * t / n) * 1000000) AS BIGINT) AS c6",
        "CAST(ROUND(sin(2 * pi() * k * t / n) * 1000000) AS BIGINT) AS s6",
    )
    sums = grid.groupBy("k").agg(
        F.max("n").cast("bigint").alias("n_days"),
        F.sum(F.col("rev").cast("decimal(38,0)") * F.col("c6")).alias("sc"),
        F.sum(F.col("rev").cast("decimal(38,0)") * F.col("s6")).alias("ss"),
    )
    return sums.selectExpr(
        "CAST(k AS INT) AS k",
        "n_days",
        "ROUND(CAST(n_days AS DOUBLE) / k, 2) AS period_days",
        "ROUND((CAST(sc AS DOUBLE) / 100000000.0 / n_days)"
        " * (CAST(sc AS DOUBLE) / 100000000.0 / n_days)"
        " + (CAST(ss AS DOUBLE) / 100000000.0 / n_days)"
        " * (CAST(ss AS DOUBLE) / 100000000.0 / n_days), 4) AS power",
    ).orderBy("k")


_MP_M = 7  # subsequence length (one week)
_MP_TOPK = 5

_MP_ORACLE = f"""
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev
  FROM orders GROUP BY 1),
ix AS (
  SELECT d, rev, ROW_NUMBER() OVER (ORDER BY d) - 1 AS t FROM daily),
win AS (
  SELECT t, d, {', '.join(f'w{k}' for k in range(_MP_M))}
  FROM (SELECT t, d,
               {', '.join(f'LEAD(rev, {k}) OVER (ORDER BY t) AS w{k}'
                          for k in range(_MP_M))}
        FROM ix)
  WHERE w{_MP_M - 1} IS NOT NULL),
halfpairs AS (
  SELECT a.t AS ta, b.t AS tb,
         ({' + '.join(f'CAST(a.w{k} - b.w{k} AS HUGEINT) * (a.w{k} - b.w{k})'
                      for k in range(_MP_M))}) AS dist
  FROM win a JOIN win b ON b.t >= a.t + {_MP_M}),
dists AS (
  SELECT w.t, w.d, MIN(p.dist) AS mp
  FROM (SELECT ta AS t, dist FROM halfpairs
        UNION ALL SELECT tb AS t, dist FROM halfpairs) p
  JOIN win w ON w.t = p.t
  GROUP BY 1, 2),
discords AS (
  SELECT 'discord' AS kind,
         CAST(ROW_NUMBER() OVER (ORDER BY mp DESC, t) AS INT) AS rank,
         t, d, mp
  FROM dists ORDER BY mp DESC, t LIMIT {_MP_TOPK}),
motifs AS (
  SELECT 'motif' AS kind,
         CAST(ROW_NUMBER() OVER (ORDER BY mp ASC, t) AS INT) AS rank,
         t, d, mp
  FROM dists ORDER BY mp ASC, t LIMIT {_MP_TOPK})
SELECT kind, rank, CAST(t AS BIGINT) AS t, d AS day,
       CAST(mp AS DOUBLE) AS mp_dist
FROM (SELECT * FROM discords UNION ALL SELECT * FROM motifs)
ORDER BY kind, rank
"""


@query("matrix_profile_daily", oracle=_MP_ORACLE)
def matrix_profile_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix profile of the daily revenue series with week-long (m=7)
    subsequences under exact integer Euclidean distance: per window,
    the squared distance to its NEAREST non-overlapping neighbor; the
    top-5 DISCORDS (largest profile — the week least like any other,
    the strongest anomaly primitive in the UCR lineage) and top-5
    MOTIFS (smallest — the most repeated weekly pattern). Complements
    the pointwise detectors (MAD/ESD/CUSUM flag single days; the
    matrix profile flags anomalous SHAPES).

    Exactness: distances are exact HUGEINT/DECIMAL38 sums of squared
    cent differences — min/rank over exact integers, no floats until
    the display cast.

    Scale: the all-pairs join is O(days^2) in the CALENDAR-bounded
    series (the kendall_tau adjudication: ~5.7M pairs for 2400 days,
    constant in row count at 100 TB); windows ride one ordered walk."""
    from pyspark.sql import Window as _W

    daily = (
        spark.table("orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("bigint")
            .alias("rev")
        )
    )
    ix = daily.select(
        "d", "rev", (F.row_number().over(_W.orderBy("d")) - 1).alias("t")
    )
    lead_w = _W.orderBy("t")
    win = ix.select(
        "t",
        "d",
        *[F.lead("rev", k).over(lead_w).alias(f"w{k}") for k in range(_MP_M)],
    ).filter(F.col(f"w{_MP_M - 1}").isNotNull())
    dist_expr = " + ".join(
        f"CAST(a.w{k} - b.w{k} AS DECIMAL(38,0)) * (a.w{k} - b.w{k})"
        for k in range(_MP_M)
    )
    # the ordered-walk output is ONE partition; spread the probe side so
    # the nested-loop pair scan parallelizes across cores
    a = win.repartition(32, "t").alias("a")
    b = win.selectExpr(
        "t AS tb", *[f"w{k}" for k in range(_MP_M)]
    ).alias("b")
    halfpairs = a.join(F.broadcast(b), F.expr(f"b.tb >= a.t + {_MP_M}")).select(
        F.expr("a.t").alias("ta"),
        F.col("tb"),
        F.expr(dist_expr).alias("dist"),
    )
    both = halfpairs.selectExpr("ta AS t", "dist").unionByName(
        halfpairs.selectExpr("tb AS t", "dist")
    )
    dists = (
        both.groupBy("t")
        .agg(F.min("dist").alias("mp"))
        .join(win.select("t", "d"), "t")
    )
    discords = (
        dists.orderBy(F.desc("mp"), "t")
        .limit(_MP_TOPK)
        .select(
            F.lit("discord").alias("kind"),
            F.row_number()
            .over(_W.orderBy(F.desc("mp"), "t"))
            .cast("int")
            .alias("rank"),
            "t",
            "d",
            "mp",
        )
    )
    motifs = (
        dists.orderBy(F.asc("mp"), "t")
        .limit(_MP_TOPK)
        .select(
            F.lit("motif").alias("kind"),
            F.row_number()
            .over(_W.orderBy(F.asc("mp"), "t"))
            .cast("int")
            .alias("rank"),
            "t",
            "d",
            "mp",
        )
    )
    return (
        discords.unionByName(motifs)
        .selectExpr(
            "kind",
            "rank",
            "CAST(t AS BIGINT) AS t",
            "d AS day",
            "CAST(mp AS DOUBLE) AS mp_dist",
        )
        .orderBy("kind", "rank")
    )


def _mase_oracle() -> str:
    from dawis_spark.operators.forecast import (
        holt_oracle_ctes,
        theta_oracle_ctes,
    )

    return f"""
WITH RECURSIVE alldaily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2),
cut AS (SELECT MAX(day) - INTERVAL 7 DAY AS cutoff FROM alldaily),
train AS (
  SELECT a.* FROM alldaily a CROSS JOIN cut WHERE a.day <= cutoff),
test AS (
  SELECT a.event_type, CAST(date_diff('day', cutoff, a.day) AS INT) AS h, a.v
  FROM alldaily a CROSS JOIN cut WHERE a.day > cutoff),
{holt_oracle_ctes('train', 'event_type', 'day', 'v', 7)},
{theta_oracle_ctes('train', 'event_type', 'day', 'v', 7)},
lastv AS (
  SELECT event_type, v AS lv
  FROM (SELECT event_type, v,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY day DESC) AS rn
        FROM train) WHERE rn = 1),
snv AS (
  SELECT event_type, CAST(8 - rn AS INT) AS h, v AS sv
  FROM (SELECT event_type, v,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY day DESC) AS rn
        FROM train) WHERE rn <= 7),
scale AS (
  SELECT event_type,
         CAST(SUM(abs(v - pv)) AS DOUBLE) / COUNT(*) AS sc
  FROM (SELECT event_type, v,
               LAG(v) OVER (PARTITION BY event_type ORDER BY day) AS pv
        FROM train)
  WHERE pv IS NOT NULL GROUP BY 1),
fc AS (
  SELECT t.event_type, t.h, 'naive1' AS model,
         CAST(l.lv AS DOUBLE) AS f, t.v
  FROM test t JOIN lastv l USING (event_type)
  UNION ALL
  SELECT t.event_type, t.h, 'snaive7', CAST(s.sv AS DOUBLE), t.v
  FROM test t JOIN snv s ON s.event_type = t.event_type AND s.h = t.h
  UNION ALL
  SELECT t.event_type, t.h, 'holt', CAST(hl.forecast AS DOUBLE), t.v
  FROM test t JOIN holt hl ON hl.k = t.event_type AND hl.h = t.h
  UNION ALL
  SELECT t.event_type, t.h, 'theta', CAST(th.forecast AS DOUBLE), t.v
  FROM test t JOIN theta th ON th.k = t.event_type AND th.h = t.h),
mae AS (
  SELECT event_type, model,
         CAST(COUNT(*) AS BIGINT) AS n_test,
         SUM(abs(f - v)) / COUNT(*) AS mae
  FROM fc GROUP BY 1, 2)
SELECT m.event_type, m.model, m.n_test,
       ROUND(m.mae, 4) AS mae_cents,
       ROUND(m.mae / s.sc, 6) AS mase
FROM mae m JOIN scale s USING (event_type)
ORDER BY m.event_type, m.model
"""


@query("forecast_model_mase", oracle=_mase_oracle())
def forecast_model_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-model leaderboard on a 7-day holdout: naive-1 (last
    value), seasonal-naive-7, Holt linear, and Theta(0,2) all forecast
    the final week of daily event totals per type; scored by MAE and
    MASE (MAE over the in-sample naive-1 MAE — Hyndman's scale-free
    skill score, < 1 = beats naive). The model-SELECTION readout the
    forecaster family was missing: holt_backtest_mae diagnoses one
    model across origins, this ranks the four models against each
    other on the same holdout.

    Exactness: all four forecasts are exact integers (the holt/theta
    shared trajectories; naive legs are selections); MAE sums |int -
    int| values exactly per (type, model) group before two divisions.

    Scale: one daily rollup; holt/theta run on calendar-bounded
    applyInPandas groups; naive legs are two window selections; all
    joins are |types| x 7 relations."""
    from dawis_spark.operators.forecast import holt_linear, theta_forecast
    from pyspark.sql import Window as _W

    alldaily = (
        spark.table("events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)"))
            .cast("bigint")
            .alias("v")
        )
    )
    cut = alldaily.agg(
        F.expr("MAX(day) - INTERVAL 7 DAY").alias("cutoff")
    )
    wcut = alldaily.crossJoin(F.broadcast(cut))
    train = wcut.filter(F.col("day") <= F.col("cutoff")).select(
        "event_type", "day", "v"
    )
    test = wcut.filter(F.col("day") > F.col("cutoff")).selectExpr(
        "event_type", "CAST(datediff(day, cutoff) AS INT) AS h", "v"
    )
    holt = holt_linear(train, "event_type", "day", "v", horizon=7).selectExpr(
        "event_type", "h", "CAST(forecast AS DOUBLE) AS f", "'holt' AS model"
    )
    theta = theta_forecast(
        train, "event_type", "day", "v", horizon=7
    ).selectExpr(
        "event_type", "h", "CAST(forecast AS DOUBLE) AS f", "'theta' AS model"
    )
    rn = _W.partitionBy("event_type").orderBy(F.desc("day"))
    ranked = train.select(
        "event_type", "v", F.row_number().over(rn).alias("rn")
    )
    naive1 = (
        ranked.filter(F.col("rn") == 1)
        .crossJoin(
            F.broadcast(spark.range(1, 8).selectExpr("CAST(id AS INT) AS h"))
        )
        .selectExpr(
            "event_type", "h", "CAST(v AS DOUBLE) AS f", "'naive1' AS model"
        )
    )
    snaive = ranked.filter(F.col("rn") <= 7).selectExpr(
        "event_type",
        "CAST(8 - rn AS INT) AS h",
        "CAST(v AS DOUBLE) AS f",
        "'snaive7' AS model",
    )
    fc = holt.unionByName(theta).unionByName(naive1).unionByName(snaive)
    lagw = _W.partitionBy("event_type").orderBy("day")
    scale = (
        train.select(
            "event_type", "v", F.lag("v").over(lagw).alias("pv")
        )
        .filter(F.col("pv").isNotNull())
        .groupBy("event_type")
        .agg(
            (
                F.sum(F.abs(F.col("v") - F.col("pv"))).cast("double")
                / F.count(F.lit(1))
            ).alias("sc")
        )
    )
    mae = (
        fc.join(test, ["event_type", "h"])
        .groupBy("event_type", "model")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            (
                F.sum(F.abs(F.col("f") - F.col("v"))) / F.count(F.lit(1))
            ).alias("mae"),
        )
    )
    return (
        mae.join(F.broadcast(scale), "event_type")
        .selectExpr(
            "event_type",
            "model",
            "n_test",
            "ROUND(mae, 4) AS mae_cents",
            "ROUND(mae / sc, 6) AS mase",
        )
        .orderBy("event_type", "model")
    )


# Mann-Kendall statistics over (s BIGINT, var_s DOUBLE) columns —
# shared strings; z applies the standard continuity correction.
_MK_Z = (
    "(CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1) / sqrt(var_s)"
    " WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1) / sqrt(var_s)"
    " ELSE 0.0 END)"
)

_MK_ORACLE = f"""
WITH {{DAILY}},
pairs AS (
  SELECT CAST(SUM(CASE WHEN b.rev > a.rev THEN 1
                       WHEN b.rev < a.rev THEN -1 ELSE 0 END) AS BIGINT) AS s
  FROM daily a JOIN daily b ON a.d < b.d),
nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM daily),
ties AS (
  SELECT COALESCE(CAST(SUM(t * (t - 1) * (2 * t + 5)) AS HUGEINT), 0) AS tie_term
  FROM (SELECT CAST(COUNT(*) AS HUGEINT) AS t FROM daily GROUP BY rev)
  WHERE t > 1),
vs AS (
  SELECT s, CAST(n AS BIGINT) AS n_days,
         CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE) / 18 AS var_s
  FROM pairs CROSS JOIN nn CROSS JOIN ties),
zs AS (SELECT n_days, s, var_s, {_MK_Z} AS z FROM vs)
SELECT n_days, s AS s_stat, ROUND(var_s, 4) AS var_s,
       ROUND(z, 6) AS z_score, ROUND({{P}}, 6) AS p_value
FROM (SELECT *, {{TT}} AS tt FROM (SELECT *, {{AZ}} AS az FROM zs))
"""


def _mk_oracle() -> str:
    return (
        _MK_ORACLE.replace("{DAILY}", _DAILY_REV_ORDERS_CTE)
        .replace("{P}", _BH_P)
        .replace("{TT}", _BH_TT)
        .replace("{AZ}", _BH_AZ)
    )


@query("mann_kendall_daily_revenue", oracle=_mk_oracle())
def mann_kendall_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test on daily revenue — the
    nonparametric significance companion to theil_sen_trends (which
    estimates the slope this test decides is real): S = sum of
    pairwise sign comparisons, tie-corrected variance
    [n(n-1)(2n+5) - sum t(t-1)(2t+5)]/18, continuity-corrected z, and
    the A&S normal p.

    Exactness: S and both variance terms are exact integers (the sign
    sum off a day-bounded pair join, the tie term off a value-keyed
    count); var pays one double cast, z/p are shared expression
    strings — identical engines.

    Scale: the O(days^2) pair join is calendar-bounded (the theil_sen
    adjudication), never row-scale; everything else is one row."""
    daily = (
        spark.table("orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("bigint")
            .alias("rev")
        )
    )
    a = daily.select(F.col("d").alias("da"), F.col("rev").alias("ra"))
    b = daily.select(F.col("d").alias("db"), F.col("rev").alias("rb"))
    pairs = (
        a.join(b, F.col("da") < F.col("db"))
        .agg(
            F.sum(
                F.when(F.col("rb") > F.col("ra"), 1)
                .when(F.col("rb") < F.col("ra"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s")
        )
    )
    nn = daily.agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("n"))
    ties = (
        daily.groupBy("rev")
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("tie_term")
        )
    )
    vs = (
        pairs.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(ties))
        .selectExpr(
            "s",
            "CAST(n AS BIGINT) AS n_days",
            "CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE) / 18 AS var_s",
        )
    )
    return (
        vs.selectExpr("n_days", "s", "var_s", f"{_MK_Z} AS z")
        .selectExpr("*", f"{_BH_AZ} AS az")
        .selectExpr("*", f"{_BH_TT} AS tt")
        .selectExpr(
            "n_days",
            "s AS s_stat",
            "ROUND(var_s, 4) AS var_s",
            "ROUND(z, 6) AS z_score",
            f"ROUND({_BH_P}, 6) AS p_value",
        )
    )


# Restricted (single-lag) OLS strings over the same sufficient-statistic
# column names the _OLS2_* strings use; b1r/b0r are staged columns.
_OLS1_B1 = "((n * s1y - s1 * sy) / (n * s11 - s1 * s1))"
_OLS1_B0 = "((sy - b1r * s1) / n)"
_OLS1_SSE = (
    "(syy - 2 * (b0r * sy + b1r * s1y)"
    " + (b0r * b0r * n + b1r * b1r * s11 + 2 * b0r * b1r * s1))"
)
_GRANGER_F = "(((sse_r - sse_u) * (n - 3)) / sse_u)"

_GRANGER_ORACLE = f"""
WITH {{DAILY}},
lagged AS (
  SELECT CAST(rev AS HUGEINT) AS y,
         CAST(LAG(rev) OVER (ORDER BY d) AS HUGEINT) AS y1,
         CAST(LAG(cnt) OVER (ORDER BY d) AS HUGEINT) AS x1
  FROM daily),
obs AS (SELECT y, y1, x1 FROM lagged WHERE y1 IS NOT NULL),
stats AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n0,
         SUM(y1) AS s1_i, SUM(x1) AS s2_i,
         SUM(y1*y1) AS s11_i, SUM(x1*x1) AS s22_i, SUM(y1*x1) AS s12_i,
         SUM(y) AS sy_i, SUM(y*y) AS syy_i,
         SUM(y1*y) AS s1y_i, SUM(x1*y) AS s2y_i
  FROM obs),
d AS (SELECT {{CASTS}} FROM stats),
coef AS (
  SELECT *, {{B0}} AS b0, {{B1}} AS b1, {{B2}} AS b2, {_OLS1_B1} AS b1r
  FROM d),
coef2 AS (SELECT *, {_OLS1_B0} AS b0r FROM coef),
sses AS (
  SELECT n, b1, b2, {{SSE_U}} AS sse_u, {_OLS1_SSE} AS sse_r FROM coef2),
fs AS (
  SELECT CAST(n AS BIGINT) AS n_obs,
         ROUND(b1, 6) AS coef_rev_lag1, ROUND(b2, 6) AS coef_orders_lag1,
         ROUND(sse_u, 4) AS sse_unrestricted, ROUND(sse_r, 4) AS sse_restricted,
         {_GRANGER_F} AS f, sqrt({_GRANGER_F}) AS z
  FROM sses)
SELECT n_obs, coef_rev_lag1, coef_orders_lag1, sse_unrestricted,
       sse_restricted, ROUND(f, 6) AS f_stat, ROUND({{P}}, 6) AS p_value
FROM (SELECT * , {{TT}} AS tt FROM (SELECT *, {{AZ}} AS az FROM fs))
"""


def _granger_oracle() -> str:
    return (
        _GRANGER_ORACLE.replace("{DAILY}", _DAILY_REV_ORDERS_CTE)
        .replace("{CASTS}", _OLS2_STAT_CASTS)
        .replace("{B0}", _OLS2_B0)
        .replace("{B1}", _OLS2_B1)
        .replace("{B2}", _OLS2_B2)
        .replace("{SSE_U}", _OLS2_SSE)
        .replace("{P}", _BH_P)
        .replace("{TT}", _BH_TT)
        .replace("{AZ}", _BH_AZ)
    )


@query("granger_orders_to_revenue", oracle=_granger_oracle())
def granger_orders_to_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger causality screen (one lag): does yesterday's ORDER COUNT
    improve today's revenue prediction beyond yesterday's revenue?
    Compares the two-feature OLS y_t ~ y_{t-1} + x_{t-1} against the
    restricted y_t ~ y_{t-1}; F = (SSE_r - SSE_u)(n-3)/SSE_u with 1
    numerator dof, p via the F(1,df) = t^2 identity and the A&S
    normal approximation (df in the hundreds+ here — same
    approximation discipline as welch_ttest). The lead/lag companion
    to ccf_orders_vs_revenue that answers 'is the lead PREDICTIVE'.

    Exactness: the ten sufficient statistics are exact DECIMAL(38,0)
    integers off ONE aggregate of the lagged day-bounded series; both
    regressions' coefficients and SSEs reuse the ols_price_regression
    expression strings (_OLS2_*/_OLS1_*) over the same doubles —
    bit-identical engines.

    Scale: the lag window rides the calendar-bounded daily series
    (whitelisted class); everything after is one 10-number row."""
    from pyspark.sql import Window

    daily = (
        spark.table("orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("bigint")
            .alias("rev"),
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
        )
    )
    w = Window.orderBy("d")
    dd = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    obs = (
        daily.select(
            F.col("rev").alias("y0"),
            F.lag("rev").over(w).alias("y1_0"),
            F.lag("cnt").over(w).alias("x1_0"),
        )
        .filter(F.col("y1_0").isNotNull())
        .select(
            dd("y0").alias("y"), dd("y1_0").alias("y1"), dd("x1_0").alias("x1")
        )
    )
    stats = obs.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n0"),
        F.sum("y1").alias("s1_i"),
        F.sum("x1").alias("s2_i"),
        F.sum(F.col("y1") * F.col("y1")).alias("s11_i"),
        F.sum(F.col("x1") * F.col("x1")).alias("s22_i"),
        F.sum(F.col("y1") * F.col("x1")).alias("s12_i"),
        F.sum("y").alias("sy_i"),
        F.sum(F.col("y") * F.col("y")).alias("syy_i"),
        F.sum(F.col("y1") * F.col("y")).alias("s1y_i"),
        F.sum(F.col("x1") * F.col("y")).alias("s2y_i"),
    )
    d = stats.selectExpr(*_OLS2_STAT_CASTS.split(", "))
    coef = d.select(
        "*",
        F.expr(_OLS2_B0).alias("b0"),
        F.expr(_OLS2_B1).alias("b1"),
        F.expr(_OLS2_B2).alias("b2"),
        F.expr(_OLS1_B1).alias("b1r"),
    ).withColumn("b0r", F.expr(_OLS1_B0))
    sses = coef.select(
        "n",
        "b1",
        "b2",
        F.expr(_OLS2_SSE).alias("sse_u"),
        F.expr(_OLS1_SSE).alias("sse_r"),
    )
    fs = sses.selectExpr(
        "CAST(n AS BIGINT) AS n_obs",
        "ROUND(b1, 6) AS coef_rev_lag1",
        "ROUND(b2, 6) AS coef_orders_lag1",
        "ROUND(sse_u, 4) AS sse_unrestricted",
        "ROUND(sse_r, 4) AS sse_restricted",
        f"{_GRANGER_F} AS f",
        f"sqrt({_GRANGER_F}) AS z",
    )
    return (
        fs.selectExpr("*", f"{_BH_AZ} AS az")
        .selectExpr("*", f"{_BH_TT} AS tt")
        .selectExpr(
            "n_obs",
            "coef_rev_lag1",
            "coef_orders_lag1",
            "sse_unrestricted",
            "sse_restricted",
            "ROUND(f, 6) AS f_stat",
            f"ROUND({_BH_P}, 6) AS p_value",
        )
    )


# Single-feature log-log OLS over (n, sx, sy, sxx, sxy) doubles from
# ordered folds — Heaps' law V = k * N^beta linearized as
# ln V = ln k + beta ln N.
_HEAPS_BETA = "((n * sxy - sx * sy) / (n * sxx - sx * sx))"
_HEAPS_K = f"exp((sy - {_HEAPS_BETA} * sx) / n)"

_HEAPS_ORACLE = f"""
WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
toks AS (
  SELECT CAST(doc_id * 10 // (m + 1) AS INT) AS b, t FROM (
    SELECT doc_id, m, unnest(string_split(lower(text), ' ')) AS t
    FROM documents CROSS JOIN mx)
  WHERE t <> ''),
per_bt AS (SELECT b, t, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2),
tok_first AS (SELECT t, MIN(b) AS fb FROM per_bt GROUP BY 1),
bucket_new AS (
  SELECT fb AS b, CAST(COUNT(*) AS BIGINT) AS new_vocab
  FROM tok_first GROUP BY 1),
bucket_tok AS (SELECT b, CAST(SUM(c) AS BIGINT) AS n_tok FROM per_bt GROUP BY 1),
cum AS (
  SELECT a.b,
         CAST(SUM(bt.n_tok) AS BIGINT) AS cum_tokens,
         CAST(SUM(COALESCE(bn.new_vocab, 0)) AS BIGINT) AS cum_vocab
  FROM bucket_tok a
  JOIN bucket_tok bt ON bt.b <= a.b
  LEFT JOIN bucket_new bn ON bn.b = bt.b
  GROUP BY 1),
pts AS (
  SELECT b, cum_tokens, cum_vocab,
         ln(CAST(cum_tokens AS DOUBLE)) AS lx,
         ln(CAST(cum_vocab AS DOUBLE)) AS ly
  FROM cum),
fit AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(lx ORDER BY b)), (a, e) -> a + e) AS sx,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(ly ORDER BY b)), (a, e) -> a + e) AS sy,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(lx * lx ORDER BY b)), (a, e) -> a + e) AS sxx,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(lx * ly ORDER BY b)), (a, e) -> a + e) AS sxy
  FROM pts)
SELECT b AS bucket, cum_tokens, cum_vocab,
       ROUND({_HEAPS_K}, 4) AS heaps_k,
       ROUND({_HEAPS_BETA}, 6) AS heaps_beta
FROM pts CROSS JOIN fit ORDER BY bucket
"""


@query("heaps_law_vocab_growth", oracle=_HEAPS_ORACLE)
def heaps_law_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit of vocabulary growth: V(N) = k*N^beta over ten
    cumulative corpus prefixes (doc_id order) — the companion to
    zipf_exponent_fit (they are two views of the same heavy tail) and
    the capacity-planning curve a tokenizer/dedup pipeline consults
    ('how much NEW vocabulary will the next 10 TB bring').

    The cumulative-distinct trick: cumulative vocabulary at prefix b =
    count of tokens whose FIRST-occurrence bucket <= b — one min-bucket
    aggregate per token instead of a distinct-count per prefix, so the
    10 prefixes cost one pass.

    Exactness: prefix token/vocab counts are exact integers off
    bucket-bounded joins; the log-log OLS uses bucket-sorted ordered
    folds and shared expression strings for k/beta — identical engines.

    Scale: token relations are vocabulary-sized (the tokenizer-family
    discipline); the prefix self-join is 10x10; the fit folds 10
    doubles."""
    mx = spark.table("documents").agg(F.max("doc_id").alias("m"))
    toks = (
        spark.table("documents")
        .crossJoin(F.broadcast(mx))
        .select(
            F.expr("CAST(doc_id * 10 div (m + 1) AS INT)").alias("b"),
            F.explode(F.split(F.lower("text"), " ")).alias("t"),
        )
        .filter(F.col("t") != "")
    )
    per_bt = toks.groupBy("b", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tok_first = per_bt.groupBy("t").agg(F.min("b").alias("fb"))
    bucket_new = tok_first.groupBy(F.col("fb").alias("b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("new_vocab")
    )
    bucket_tok = per_bt.groupBy("b").agg(
        F.sum("c").cast("bigint").alias("n_tok")
    )
    a = bucket_tok.select(F.col("b").alias("ab"))
    cum = (
        a.join(F.broadcast(bucket_tok), F.col("b") <= F.col("ab"))
        .join(F.broadcast(bucket_new), "b", "left")
        .groupBy("ab")
        .agg(
            F.sum("n_tok").cast("bigint").alias("cum_tokens"),
            F.sum(F.coalesce(F.col("new_vocab"), F.lit(0)))
            .cast("bigint")
            .alias("cum_vocab"),
        )
        .select(F.col("ab").alias("b"), "cum_tokens", "cum_vocab")
    )
    pts = cum.select(
        "b",
        "cum_tokens",
        "cum_vocab",
        F.log(F.col("cum_tokens").cast("double")).alias("lx"),
        F.log(F.col("cum_vocab").cast("double")).alias("ly"),
    )
    fold = (
        "aggregate(array_sort(collect_list(struct(b, {v} as vv))), "
        "cast(0.0 as double), (a, e) -> a + e.vv)"
    )
    fit = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.expr(fold.format(v="lx")).alias("sx"),
        F.expr(fold.format(v="ly")).alias("sy"),
        F.expr(fold.format(v="lx * lx")).alias("sxx"),
        F.expr(fold.format(v="lx * ly")).alias("sxy"),
    )
    return (
        pts.crossJoin(F.broadcast(fit))
        .selectExpr(
            "b AS bucket",
            "cum_tokens",
            "cum_vocab",
            f"ROUND({_HEAPS_K}, 4) AS heaps_k",
            f"ROUND({_HEAPS_BETA}, 6) AS heaps_beta",
        )
        .orderBy("bucket")
    )


# Simplified silhouette per point over (a, b) distance columns — the
# centroid-distance variant (a = distance to own centroid, b = nearest
# OTHER centroid), shared string.
_SIL_S = "(CASE WHEN greatest(a, b) <= 0 THEN 0.0 ELSE (b - a) / greatest(a, b) END)"


def _silhouette_oracle(k: int, dim: int) -> str:
    cos = _VEC.cosine_null("v.vec", "fc.cvec", "duck")
    return f"""
WITH {_kmeans_c1_ctes(k, dim)},
scored AS (
  SELECT v.vec_id, fc.cid,
         coalesce(round({cos}, 6), -2.0) AS cos6
  FROM v CROSS JOIN c1 fc),
own AS (
  SELECT vec_id, cid AS own_cid, 1 - cos6 AS a FROM (
    SELECT vec_id, cid, cos6,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY cos6 DESC, cid) AS rn
    FROM scored)
  WHERE rn = 1),
bs AS (
  SELECT s.vec_id, MIN(1 - s.cos6) AS b
  FROM scored s JOIN own o ON o.vec_id = s.vec_id AND s.cid <> o.own_cid
  GROUP BY 1),
sil AS (
  SELECT own.own_cid AS cid, {_SIL_S} AS s
  FROM own JOIN bs ON bs.vec_id = own.vec_id)
SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_points,
       ROUND(AVG(s), 6) AS mean_silhouette
FROM sil GROUP BY 1 ORDER BY 1
"""


@query("kmeans_silhouette_simplified", oracle=_silhouette_oracle(8, 64))
def kmeans_silhouette_simplified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-distance) silhouette per k-means cluster —
    the cluster-quality readout kmeans_cohesion (within-SSE only)
    cannot give: s = (b - a)/max(a, b) with a = cosine distance to the
    own centroid and b = to the nearest OTHER centroid, so clusters
    that are tight but not separated score low. The O(n*k)
    centroid-distance form replaces the O(n^2) pairwise silhouette —
    the only variant that exists at corpus scale.

    Determinism: the same trained round-6 centroids as kmeans_clusters
    (oracle replays training); per-point cosines round to 6 before the
    argmax/min, so a/b/s are identical doubles; the per-cluster mean
    is the one order-dependent float reduce — error ~n*eps against the
    round-6 margin (the KDE adjudication; at 1e9-point clusters move
    the rounding to 4).

    Scale: one map-side k-fan-out against literal centroids, collapsed
    by vec_id then by cid — exchanges carry (point, 2 doubles) and the
    k-row result."""
    from dawis_spark.operators.similarity import train_kmeans

    emb = spark.table("embeddings")
    cents = train_kmeans(emb, "vec_id", "embedding", k=8, iterations=1)
    cent_df = spark.createDataFrame(
        [(int(c), [float(x) for x in vec]) for c, vec in cents],
        "cid int, cvec array<double>",
    )
    cos = _VEC.cosine_null("vec", "cvec", "spark")
    scored = (
        emb.select("vec_id", F.col("embedding").alias("vec"))
        .crossJoin(F.broadcast(cent_df))
        .selectExpr(
            "vec_id", "cid", f"coalesce(round({cos}, 6), -2.0) AS cos6"
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.col("cos6").desc(), F.col("cid"))
    own = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("cid").alias("own_cid"),
            (F.lit(1) - F.col("cos6")).alias("a"),
        )
    )
    bs = (
        scored.join(own, "vec_id")
        .filter(F.col("cid") != F.col("own_cid"))
        .groupBy("vec_id")
        .agg(F.min(F.lit(1) - F.col("cos6")).alias("b"))
    )
    sil = own.join(bs, "vec_id").selectExpr("own_cid AS cid", f"{_SIL_S} AS s")
    return (
        sil.groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.round(F.avg("s"), 6).alias("mean_silhouette"),
        )
        .orderBy("cid")
    )


# Dispersion statistics over per-group (n, s, q) exact integers:
# D = var/mean = (n*q - s^2) / ((n-1) * n * mean) ... written against the
# one-cast doubles (n, s, nv) with nv = n*q - s^2.
_OD_MEAN = "(s / n)"
_OD_VAR = "(nv / (n * (n - 1)))"
_OD_D = f"({_OD_VAR} / {_OD_MEAN})"
_OD_CHI2 = f"((n - 1) * {_OD_D})"
_OD_Z = f"(({_OD_CHI2} - (n - 1)) / sqrt(2 * (n - 1)))"

_OD_ORACLE = f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
per AS (
  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n_i,
         SUM(CAST(c AS HUGEINT)) AS s_i,
         SUM(CAST(c AS HUGEINT) * c) AS q_i
  FROM daily GROUP BY 1),
d AS (
  SELECT event_type, CAST(n_i AS DOUBLE) AS n, CAST(s_i AS DOUBLE) AS s,
         CAST(n_i * q_i - s_i * s_i AS DOUBLE) AS nv
  FROM per),
zs AS (
  SELECT event_type, CAST(n AS BIGINT) AS n_days,
         ROUND({_OD_MEAN}, 4) AS mean_daily, ROUND({_OD_VAR}, 4) AS var_daily,
         ROUND({_OD_D}, 6) AS dispersion, {_OD_Z} AS z
  FROM d)
SELECT event_type, n_days, mean_daily, var_daily, dispersion,
       ROUND(z, 6) AS z_score, ROUND({{P}}, 6) AS p_value
FROM (SELECT *, {{TT}} AS tt FROM (SELECT *, {{AZ}} AS az FROM zs))
ORDER BY event_type
"""


def _od_oracle() -> str:
    return (
        _OD_ORACLE.replace("{P}", _BH_P)
        .replace("{TT}", _BH_TT)
        .replace("{AZ}", _BH_AZ)
    )


@query("overdispersion_event_counts", oracle=_od_oracle())
def overdispersion_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson overdispersion screen on daily event counts per type:
    dispersion index D = var/mean, the chi-square dispersion statistic
    (n-1)*D, and its normal-approximation p — the 'is a Poisson model
    even admissible' gate before rate-based alerting (a bursty type
    with D >> 1 needs negative-binomial thresholds, which is exactly
    what anomaly_mad_daily's robust bands approximate).

    Exactness: daily counts and the (n, s, q) sufficient statistics
    are exact integers; D/chi2/z/p are shared expression strings over
    one-time double casts — identical engines.

    Scale: one keyed day-rollup (the exchange carries daily counts),
    then a type-keyed aggregate to |types| rows."""
    daily = (
        spark.table("events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    dd = F.col("c").cast("decimal(38,0)")
    per = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_i"),
        F.sum(dd).alias("s_i"),
        F.sum(dd * dd).alias("q_i"),
    )
    d = per.selectExpr(
        "event_type",
        "CAST(n_i AS DOUBLE) AS n",
        "CAST(s_i AS DOUBLE) AS s",
        "CAST(n_i * q_i - s_i * s_i AS DOUBLE) AS nv",
    )
    return (
        d.selectExpr(
            "event_type",
            "CAST(n AS BIGINT) AS n_days",
            f"ROUND({_OD_MEAN}, 4) AS mean_daily",
            f"ROUND({_OD_VAR}, 4) AS var_daily",
            f"ROUND({_OD_D}, 6) AS dispersion",
            f"{_OD_Z} AS z",
        )
        .selectExpr("*", f"{_BH_AZ} AS az")
        .selectExpr("*", f"{_BH_TT} AS tt")
        .selectExpr(
            "event_type",
            "n_days",
            "mean_daily",
            "var_daily",
            "dispersion",
            "ROUND(z, 6) AS z_score",
            f"ROUND({_BH_P}, 6) AS p_value",
        )
        .orderBy("event_type")
    )


# Order-statistic ranks for the distribution-free median CI (normal
# approximation to Binomial(n, 1/2), z = 1.959964): shared strings over
# the one-row n.
_MCI_LO = "CAST(floor((n + 1) / 2.0 - 1.959964 * sqrt(CAST(n AS DOUBLE)) / 2) AS BIGINT)"
_MCI_MED = "CAST(floor((n + 1) / 2.0) AS BIGINT)"
_MCI_HI = "CAST(ceil((n + 1) / 2.0 + 1.959964 * sqrt(CAST(n AS DOUBLE)) / 2) AS BIGINT)"

_MCI_ORACLE = f"""
WITH vals AS (
  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1),
nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM vals),
ranks AS (
  SELECT 'lo' AS which, {_MCI_LO} AS r FROM nn
  UNION ALL SELECT 'median', {_MCI_MED} FROM nn
  UNION ALL SELECT 'hi', {_MCI_HI} FROM nn),
cum AS (
  SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM vals),
sel AS (
  SELECT which, r, MIN(v) AS val
  FROM ranks JOIN cum ON cum.cum >= ranks.r
  GROUP BY 1, 2)
SELECT (SELECT n FROM nn) AS n_orders,
       MAX(CASE WHEN which = 'median' THEN val END) AS median_cents,
       MAX(CASE WHEN which = 'lo' THEN val END) AS ci_lo_cents,
       MAX(CASE WHEN which = 'hi' THEN val END) AS ci_hi_cents,
       MAX(CASE WHEN which = 'lo' THEN r END) AS rank_lo,
       MAX(CASE WHEN which = 'hi' THEN r END) AS rank_hi
FROM sel
"""


@query("median_ci_order_value", oracle=_MCI_ORACLE)
def median_ci_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free 95% confidence interval for the MEDIAN order
    value by binomial order statistics: the CI endpoints are the
    sample values at ranks (n+1)/2 -/+ 1.96*sqrt(n)/2 — exact-rank
    selection, no resampling, so it costs one value rollup instead of
    bootstrap_ci_order_value's B replicates (its cross-check: the two
    intervals should agree).

    Exactness: rank targets come from one shared sqrt expression over
    the exact count; selection walks exact-integer cumulative counts
    over the distinct-value relation — no other float paths.

    Scale: the value rollup is distinct-cents-bounded (the
    weighted_median adjudication); the cumulative window runs over
    that value relation, not rows, and the rank probe is a 3-row
    broadcast join."""
    vals = (
        spark.table("orders")
        .groupBy(
            F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").alias("v")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    nn = vals.agg(F.sum("c").cast("bigint").alias("n"))
    ranks = nn.selectExpr(
        f"stack(3, 'lo', {_MCI_LO}, 'median', {_MCI_MED}, 'hi', {_MCI_HI})"
        " AS (which, r)"
    )
    from pyspark.sql import Window

    cum = vals.select(
        "v", F.sum("c").over(Window.orderBy("v")).alias("cum")
    )
    sel = (
        F.broadcast(ranks)
        .join(cum, F.col("cum") >= F.col("r"))
        .groupBy("which", "r")
        .agg(F.min("v").alias("val"))
    )
    return sel.crossJoin(F.broadcast(nn)).agg(
        F.max("n").alias("n_orders"),
        F.max(F.when(F.col("which") == "median", F.col("val"))).alias(
            "median_cents"
        ),
        F.max(F.when(F.col("which") == "lo", F.col("val"))).alias("ci_lo_cents"),
        F.max(F.when(F.col("which") == "hi", F.col("val"))).alias("ci_hi_cents"),
        F.max(F.when(F.col("which") == "lo", F.col("r"))).alias("rank_lo"),
        F.max(F.when(F.col("which") == "hi", F.col("r"))).alias("rank_hi"),
    )


# Two-sample mean difference over the one-row conditional sums (all
# doubles cast once from exact ints) — shared by the observed statistic
# and every permutation replicate.
_PERM_DIFF = "(s1 / n1 - s2 / n2)"

_PERM_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
         o_orderstatus AS g
  FROM orders WHERE o_orderstatus IN ('F', 'O')),
obs AS (
  SELECT CAST(SUM(CASE WHEN g = 'F' THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
         CAST(SUM(CASE WHEN g = 'O' THEN 1 ELSE 0 END) AS DOUBLE) AS n2,
         CAST(SUM(CASE WHEN g = 'F' THEN cents ELSE 0 END) AS DOUBLE) AS s1,
         CAST(SUM(CASE WHEN g = 'O' THEN cents ELSE 0 END) AS DOUBLE) AS s2
  FROM base),
expanded AS (
  SELECT t.b AS b,
         CASE WHEN ((((o_orderkey * {{B}} + t.b) % {{MOD}}) * {{A}} + {{C}}) % {{MOD}}) < {{HALF}} THEN 0 ELSE 1 END AS pg,
         cents
  FROM base, range(0, {{B}}) t(b)),
reps AS (
  SELECT b,
         CAST(SUM(CASE WHEN pg = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
         CAST(SUM(CASE WHEN pg = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n2,
         CAST(SUM(CASE WHEN pg = 0 THEN cents ELSE 0 END) AS DOUBLE) AS s1,
         CAST(SUM(CASE WHEN pg = 1 THEN cents ELSE 0 END) AS DOUBLE) AS s2
  FROM expanded GROUP BY b),
extreme AS (
  SELECT CAST(SUM(CASE WHEN abs({_PERM_DIFF})
                       >= abs((SELECT {_PERM_DIFF} FROM obs))
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
  FROM reps)
SELECT CAST(n1 AS BIGINT) AS n_f, CAST(n2 AS BIGINT) AS n_o,
       ROUND({_PERM_DIFF}, 4) AS observed_diff_cents,
       CAST({{B}} AS INT) AS n_replicates, n_extreme,
       ROUND(CAST(n_extreme + 1 AS DOUBLE) / ({{B}} + 1), 6) AS p_value
FROM obs CROSS JOIN extreme
"""


def _perm_oracle() -> str:
    return (
        _PERM_ORACLE.replace("{B}", str(_BOOT_B))
        .replace("{MOD}", str(_TXT.MOD))
        .replace("{HALF}", str(_TXT.MOD // 2))
        .replace("{A}", str(_BOOT_A))
        .replace("{C}", str(_BOOT_C))
    )


@query("permutation_test_order_value", oracle=_perm_oracle())
def permutation_test_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation (random-relabeling) test for the F-vs-O order-value
    mean difference — the resampling cross-check of
    welch_ttest_order_value that needs NO normality or variance
    assumptions: 64 deterministic hash relabelings (the Poisson-
    bootstrap LCG discipline, reduced-before-multiplied so keys never
    wrap), p = (#replicates at least as extreme + 1)/(B + 1).

    Exactness: every replicate's group sums are exact integers off one
    map-side x64 fanout; the mean-difference string (_PERM_DIFF) is
    shared, so the >= comparisons run over identical doubles.

    Scale: fixed x64 fanout into a 64-group partial aggregate — the
    shuffle carries 128 rows per partition regardless of data size
    (the bootstrap_ci shape)."""
    base = (
        spark.table("orders")
        .filter(F.col("o_orderstatus").isin(["F", "O"]))
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
            F.col("o_orderstatus").alias("g"),
        )
    )
    obs = base.agg(
        F.sum(F.when(F.col("g") == "F", 1).otherwise(0)).cast("double").alias("n1"),
        F.sum(F.when(F.col("g") == "O", 1).otherwise(0)).cast("double").alias("n2"),
        F.sum(F.when(F.col("g") == "F", F.col("cents")).otherwise(0))
        .cast("double")
        .alias("s1"),
        F.sum(F.when(F.col("g") == "O", F.col("cents")).otherwise(0))
        .cast("double")
        .alias("s2"),
    )
    # NB: the LCG's LOW BIT is parity(o_orderkey*64 + b) — per replicate
    # that is constant, which would empty one group in every replicate
    # (% 2 keeps none of the multiplier's mixing). Split the full-range
    # mixed value against MOD/2 instead.
    pg = (
        f"CASE WHEN ((((o_orderkey * {_BOOT_B} + b) % {_TXT.MOD})"
        f" * {_BOOT_A} + {_BOOT_C}) % {_TXT.MOD}) < {_TXT.MOD // 2}"
        " THEN 0 ELSE 1 END"
    )
    expanded = base.select(
        "o_orderkey",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    ).selectExpr("b", f"{pg} AS pg", "cents")
    reps = expanded.groupBy("b").agg(
        F.sum(F.when(F.col("pg") == 0, 1).otherwise(0)).cast("double").alias("n1"),
        F.sum(F.when(F.col("pg") == 1, 1).otherwise(0)).cast("double").alias("n2"),
        F.sum(F.when(F.col("pg") == 0, F.col("cents")).otherwise(0))
        .cast("double")
        .alias("s1"),
        F.sum(F.when(F.col("pg") == 1, F.col("cents")).otherwise(0))
        .cast("double")
        .alias("s2"),
    )
    obs_d = obs.selectExpr(
        "n1 AS on1", "n2 AS on2", f"{_PERM_DIFF} AS obs_diff"
    )
    extreme = (
        reps.crossJoin(F.broadcast(obs_d))
        .agg(
            F.sum(
                F.expr(f"CASE WHEN abs({_PERM_DIFF}) >= abs(obs_diff)"
                       " THEN 1 ELSE 0 END")
            )
            .cast("bigint")
            .alias("n_extreme")
        )
    )
    return (
        obs_d.crossJoin(F.broadcast(extreme))
        .selectExpr(
            "CAST(on1 AS BIGINT) AS n_f",
            "CAST(on2 AS BIGINT) AS n_o",
            "ROUND(obs_diff, 4) AS observed_diff_cents",
            f"CAST({_BOOT_B} AS INT) AS n_replicates",
            "n_extreme",
            f"ROUND(CAST(n_extreme + 1 AS DOUBLE) / ({_BOOT_B} + 1), 6)"
            " AS p_value",
        )
    )


_MSTAT_ITERS = 15


def _mstat_oracle() -> str:
    its = []
    prev = "sv0"
    for t in range(1, _MSTAT_ITERS + 1):
        its.append(
            f"""sw{t} AS MATERIALIZED (
  SELECT m.t AS s,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(m.p * v.v ORDER BY m.f)), (a, b) -> a + b) AS w
  FROM pm m JOIN {prev} v ON v.s = m.f GROUP BY m.t),
sn{t} AS (
  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         list(w ORDER BY s)), (a, b) -> a + b) AS z
  FROM sw{t}),
sv{t} AS (SELECT s, w / z AS v FROM sw{t} CROSS JOIN sn{t})"""
        )
        prev = f"sv{t}"
    iter_ctes = ",\n".join(its)
    return f"""
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events),
cnt AS (
  SELECT event_type AS f, nxt AS t, CAST(COUNT(*) AS BIGINT) AS c
  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
rowt AS (SELECT f, CAST(SUM(c) AS BIGINT) AS rt FROM cnt GROUP BY 1),
pm AS MATERIALIZED (
  SELECT cnt.f, cnt.t, CAST(c AS DOUBLE) / CAST(rt AS DOUBLE) AS p
  FROM cnt JOIN rowt USING (f)),
states AS MATERIALIZED (SELECT DISTINCT f AS s FROM pm),
k AS (SELECT CAST(COUNT(*) AS DOUBLE) AS kk FROM states),
sv0 AS (SELECT s, 1.0 / kk AS v FROM states CROSS JOIN k),
{iter_ctes}
SELECT s AS event_type, ROUND(v, 6) AS stationary_prob
FROM sv{_MSTAT_ITERS} ORDER BY event_type
"""


@query("markov_stationary_distribution", oracle=_mstat_oracle())
def markov_stationary_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the user-journey Markov chain — where
    the event_transitions matrix says user attention settles in the
    long run (the equilibrium complement to markov_next_event_accuracy's
    one-step prediction), by 15 power iterations v <- P^T v with
    per-iteration renormalization.

    Exactness: transition probabilities are one identical double
    division of exact counts; every matvec and the normalizer are
    ORDERED FOLDS (by from-state within target, by state across), so
    both engines walk the same float sequence — the PCA power-iteration
    discipline applied to a |types| x |types| stochastic matrix.

    Scale: the per-user sequence window and the (from, to) count
    aggregate are the only row-scale stages (same shape as
    event_transitions; the whale guard applies upstream when key mass
    demands it); iterations run on state-count-sized relations with
    localCheckpoint half-steps."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = spark.table("events").select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    )
    cnt = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("f"), F.col("nxt").alias("t"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    rowt = cnt.groupBy("f").agg(F.sum("c").cast("bigint").alias("rt"))
    pm = (
        cnt.join(F.broadcast(rowt), "f")
        .select(
            "f",
            "t",
            (F.col("c").cast("double") / F.col("rt").cast("double")).alias("p"),
        )
        .localCheckpoint(eager=False)
    )
    states = pm.select(F.col("f").alias("s")).distinct()
    k = states.agg(F.count(F.lit(1)).cast("double").alias("kk"))
    v = states.crossJoin(F.broadcast(k)).select(
        "s", (F.lit(1.0) / F.col("kk")).alias("v")
    )
    for _ in range(_MSTAT_ITERS):
        w_df = (
            pm.join(v.select(F.col("s").alias("f"), "v"), "f")
            .select(F.col("t").alias("s"), "f", (F.col("p") * F.col("v")).alias("pv"))
            .groupBy("s")
            .agg(
                F.expr(
                    "aggregate(array_sort(collect_list(struct(f, pv))), "
                    "cast(0.0 as double), (a, e) -> a + e.pv)"
                ).alias("w")
            )
            .localCheckpoint(eager=False)
        )
        z = w_df.agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(s, w as ww))), "
                "cast(0.0 as double), (a, e) -> a + e.ww)"
            ).alias("z")
        )
        v = w_df.crossJoin(F.broadcast(z)).select(
            "s", (F.col("w") / F.col("z")).alias("v")
        )
    return v.select(
        F.col("s").alias("event_type"),
        F.round("v", 6).alias("stationary_prob"),
    ).orderBy("event_type")


# Delete-one-group jackknife over (g, r_i doubles): SE from the
# group-sorted folds of pseudo-value moments.
_JK_SE = "sqrt((g - 1) / g * (sr2 - sr * sr / g))"

_JK_ORACLE = f"""
WITH per_nation AS (
  SELECT n_name,
         CAST(COUNT(*) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
              AS BIGINT) AS k1
  FROM orders JOIN customer ON o_custkey = c_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY 1),
tot AS (
  SELECT CAST(SUM(n1) AS BIGINT) AS nn, CAST(SUM(k1) AS BIGINT) AS kk
  FROM per_nation),
pseudo AS (
  SELECT n_name,
         CAST(kk - k1 AS DOUBLE) / CAST(nn - n1 AS DOUBLE) AS r_i
  FROM per_nation CROSS JOIN tot),
folds AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS g,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(r_i ORDER BY n_name)), (a, b) -> a + b) AS sr,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(r_i * r_i ORDER BY n_name)), (a, b) -> a + b) AS sr2
  FROM pseudo)
SELECT CAST(g AS INT) AS n_groups,
       ROUND(CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS urgent_ratio,
       ROUND(sr / g, 6) AS jackknife_mean,
       ROUND({_JK_SE}, 6) AS jackknife_se
FROM folds CROSS JOIN tot
"""


@query("jackknife_urgent_ratio", oracle=_JK_ORACLE)
def jackknife_urgent_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-GROUP jackknife standard error for the global
    urgent-order ratio, deleting one nation at a time — the
    cluster-robust uncertainty a plain binomial SE understates when
    observations are correlated within groups (the companion caveat to
    proportion_ztest's i.i.d. assumption, and the cheap-deterministic
    alternative to the bootstrap for ratio statistics).

    Exactness: all 25 leave-one-out ratios are one identical double
    division of exact integer complements (totals minus the group);
    the pseudo-value moments come from name-sorted ordered folds and
    the SE is a shared expression string.

    Scale: one fact-dim join to 25 nation rows; everything after is
    nation-bounded."""
    per_nation = (
        spark.table("orders")
        .join(
            F.broadcast(spark.table("customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(spark.table("nation")),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n1"),
            F.sum((F.col("o_orderpriority") == "1-URGENT").cast("int"))
            .cast("bigint")
            .alias("k1"),
        )
    )
    tot = per_nation.agg(
        F.sum("n1").cast("bigint").alias("nn"),
        F.sum("k1").cast("bigint").alias("kk"),
    )
    pseudo = per_nation.crossJoin(F.broadcast(tot)).select(
        "n_name",
        "nn",
        "kk",
        (
            (F.col("kk") - F.col("k1")).cast("double")
            / (F.col("nn") - F.col("n1")).cast("double")
        ).alias("r_i"),
    )
    folds = pseudo.agg(
        F.count(F.lit(1)).cast("double").alias("g"),
        F.max("nn").alias("nn"),
        F.max("kk").alias("kk"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(n_name, r_i))), "
            "cast(0.0 as double), (a, e) -> a + e.r_i)"
        ).alias("sr"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(n_name, r_i * r_i as rr))), "
            "cast(0.0 as double), (a, e) -> a + e.rr)"
        ).alias("sr2"),
    )
    return folds.selectExpr(
        "CAST(g AS INT) AS n_groups",
        "ROUND(CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS urgent_ratio",
        "ROUND(sr / g, 6) AS jackknife_mean",
        f"ROUND({_JK_SE}, 6) AS jackknife_se",
    )


# Chao1 (bias-corrected) and Good-Turing unseen mass over the exact
# frequency-of-frequencies integers.
_CHAO1 = (
    "(CAST(v_obs AS DOUBLE) + CAST(f1 AS DOUBLE) * (CAST(f1 AS DOUBLE) - 1)"
    " / (2 * (CAST(f2 AS DOUBLE) + 1)))"
)

_CHAO1_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents),
ct AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM toks WHERE t <> '' GROUP BY 1),
fof AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v_obs,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM ct)
SELECT n_tokens, v_obs, f1, f2,
       ROUND({_CHAO1}, 4) AS chao1_estimate,
       ROUND(CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS unseen_mass
FROM fof
"""


@query("chao1_vocab_estimate", oracle=_CHAO1_ORACLE)
def chao1_vocab_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 unseen-vocabulary estimate + Good-Turing unseen probability
    mass from the token frequency-of-frequencies — 'how much vocabulary
    does the corpus NOT show yet', the nonparametric cross-check of
    heaps_law_vocab_growth's extrapolation (and the classic smoothing
    mass the bigram LM family discounts by). Bias-corrected form
    V + f1(f1-1)/(2(f2+1)), defined even with no doubletons.

    Exactness: the frequency-of-frequencies relation is exact integers;
    the estimates pay one shared-string double expression each.

    Scale: one tokenization into a vocabulary-sized count relation,
    then a 4-number aggregate."""
    toks = (
        spark.table("documents")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("t"))
        .filter(F.col("t") != "")
    )
    ct = toks.groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    fof = ct.agg(
        F.count(F.lit(1)).cast("bigint").alias("v_obs"),
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.sum((F.col("c") == 1).cast("int")).cast("bigint").alias("f1"),
        F.sum((F.col("c") == 2).cast("int")).cast("bigint").alias("f2"),
    )
    return fof.selectExpr(
        "n_tokens",
        "v_obs",
        "f1",
        "f2",
        f"ROUND({_CHAO1}, 4) AS chao1_estimate",
        "ROUND(CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS unseen_mass",
    )


# PSI terms over per-bin (p, q) doubles cast once from exact counts;
# empty-side bins take the standard 1e-6 floor (same constant both
# engines, so the branch is deterministic).
_PSI_P = "greatest(CAST(c_ref AS DOUBLE) / CAST(n_ref AS DOUBLE), 1e-6)"
_PSI_Q = "greatest(CAST(c_cur AS DOUBLE) / CAST(n_cur AS DOUBLE), 1e-6)"
_PSI_TERM = f"(({_PSI_Q} - {_PSI_P}) * ln({_PSI_Q} / {_PSI_P}))"

_PSI_ORACLE = f"""
WITH o AS (
  SELECT o_totalprice AS x,
         CASE WHEN o_orderdate >= TIMESTAMP '{{CUT}}' THEN 1 ELSE 0 END AS cur
  FROM orders),
ext AS (SELECT MIN(x) AS mn, MAX(x) AS mx FROM o WHERE cur = 0),
binned AS (
  SELECT least(greatest(CAST(floor((x - mn) / (mx - mn) * 10) AS INT), 0), 9)
           AS b, cur
  FROM o CROSS JOIN ext),
cells AS (
  SELECT b,
         CAST(SUM(CASE WHEN cur = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
         CAST(SUM(CASE WHEN cur = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
  FROM binned GROUP BY 1),
tot AS (
  SELECT CAST(SUM(c_ref) AS BIGINT) AS n_ref, CAST(SUM(c_cur) AS BIGINT) AS n_cur
  FROM cells),
terms AS (
  SELECT b, c_ref, c_cur, n_ref, n_cur, {_PSI_TERM} AS term
  FROM cells CROSS JOIN tot)
SELECT b AS bin, c_ref, c_cur, ROUND(term, 6) AS psi_term,
       ROUND((SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              list(term ORDER BY b)), (a, e) -> a + e) FROM terms), 6)
         AS psi_total
FROM terms ORDER BY bin
"""


def _psi_oracle() -> str:
    return _PSI_ORACLE.replace("{CUT}", _CUPED_CUTOFF)


@query("psi_value_drift", oracle=_psi_oracle())
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the order-value distribution across
    the 1999 period boundary — THE model-monitoring drift number
    (PSI < 0.1 stable, > 0.25 retrain): reference-period deciles of the
    value range, (q - p) * ln(q / p) per bin, with the standard 1e-6
    floor for empty bins. The actionable-scalar companion to
    ks_price_drift (a p-value) and source_js_divergence (symmetric,
    source axis).

    Exactness: bin counts are exact integers off one scan (bin edges
    from the reference extrema, shared expression); each term pays
    identical double divisions + one ln; the total is a bin-sorted
    ordered fold.

    Scale: one scan into a 10-bin x 2-period cell relation; everything
    after is bin-bounded."""
    cutoff = F.lit(_CUPED_CUTOFF).cast("timestamp")
    o = spark.table("orders").select(
        F.col("o_totalprice").alias("x"),
        (F.col("o_orderdate") >= cutoff).cast("int").alias("cur"),
    )
    ext = o.filter("cur = 0").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    binned = o.crossJoin(F.broadcast(ext)).selectExpr(
        "least(greatest(CAST(floor((x - mn) / (mx - mn) * 10) AS INT), 0), 9)"
        " AS b",
        "cur",
    )
    cells = binned.groupBy("b").agg(
        F.sum(F.when(F.col("cur") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("c_ref"),
        F.sum(F.when(F.col("cur") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("c_cur"),
    )
    tot = cells.agg(
        F.sum("c_ref").cast("bigint").alias("n_ref"),
        F.sum("c_cur").cast("bigint").alias("n_cur"),
    )
    terms = cells.crossJoin(F.broadcast(tot)).selectExpr(
        "b", "c_ref", "c_cur", f"{_PSI_TERM} AS term"
    )
    total = terms.agg(
        F.expr(
            "aggregate(array_sort(collect_list(struct(b, term))), "
            "cast(0.0 as double), (a, e) -> a + e.term)"
        ).alias("psi_total")
    )
    return (
        terms.crossJoin(F.broadcast(total))
        .select(
            F.col("b").alias("bin"),
            "c_ref",
            "c_cur",
            F.round("term", 6).alias("psi_term"),
            F.round("psi_total", 6).alias("psi_total"),
        )
        .orderBy("bin")
    )


# Cochran-Armitage trend z over the one-row folded statistics: with
# integer scores s_i, T = sum k_i*s_i, E[T] = K/N * sum n_i*s_i,
# Var = K(N-K)/(N(N-1)) * (sum n_i*s_i^2 - (sum n_i*s_i)^2 / N) — all
# exact integers until the final casts.
_CA_Z = (
    "((t - CAST(kk AS DOUBLE) / nn * s1)"
    " / sqrt(CAST(kk AS DOUBLE) * (nn - kk) / (nn * (nn - 1))"
    " * (s2 - s1 * s1 / nn)))"
)

_CA_ORACLE = f"""
WITH rows_ AS (
  SELECT CAST(ROUND(l_discount * 100, 0) AS HUGEINT) AS s,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem),
per AS (
  SELECT s, CAST(COUNT(*) AS HUGEINT) AS n_i,
         CAST(SUM(y) AS HUGEINT) AS k_i
  FROM rows_ GROUP BY 1),
folded AS (
  SELECT CAST(SUM(n_i) AS HUGEINT) AS nn_i, CAST(SUM(k_i) AS HUGEINT) AS kk_i,
         CAST(SUM(k_i * s) AS HUGEINT) AS t_i,
         CAST(SUM(n_i * s) AS HUGEINT) AS s1_i,
         CAST(SUM(n_i * s * s) AS HUGEINT) AS s2_i,
         CAST(COUNT(*) AS INT) AS n_levels
  FROM per),
d AS (
  SELECT n_levels, CAST(nn_i AS BIGINT) AS n_rows, kk_i AS kk,
         CAST(nn_i AS DOUBLE) AS nn, CAST(t_i AS DOUBLE) AS t,
         CAST(s1_i AS DOUBLE) AS s1, CAST(s2_i AS DOUBLE) AS s2
  FROM folded),
zs AS (SELECT n_levels, n_rows, {_CA_Z} AS z FROM d)
SELECT n_levels, n_rows, ROUND(z, 6) AS z_score,
       ROUND({{P}}, 6) AS p_value
FROM (SELECT *, {{TT}} AS tt FROM (SELECT *, {{AZ}} AS az FROM zs))
"""


def _ca_oracle() -> str:
    return (
        _CA_ORACLE.replace("{P}", _BH_P)
        .replace("{TT}", _BH_TT)
        .replace("{AZ}", _BH_AZ)
    )


@query("cochran_armitage_trend", oracle=_ca_oracle())
def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend-in-proportions test: does the return rate
    rise MONOTONICALLY with the discount level? The dose-response
    significance test that chi-square independence dilutes (chi2 sees
    any deviation; CA concentrates power on the ordered trend the
    discount levels actually carry) — the hypothesis companion to
    decision_stump_discount (which finds the best CUT) and
    isotonic_urgency_by_value (which fits the SHAPE).

    Exactness: T, its expectation, and the variance are exact HUGEINT/
    DECIMAL(38,0) sums over the 11 discount levels (integer scores =
    discount points); one double cast each, shared z/p strings.

    Scale: one value-keyed aggregate to 11 rows, then a one-row fold."""
    rows_ = spark.table("lineitem").select(
        F.expr("CAST(ROUND(l_discount * 100, 0) AS DECIMAL(38,0))").alias("s"),
        (F.col("l_returnflag") == "R").cast("int").alias("y"),
    )
    per = rows_.groupBy("s").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_i"),
        F.sum("y").cast("decimal(38,0)").alias("k_i"),
    )
    folded = per.agg(
        F.sum("n_i").alias("nn_i"),
        F.sum("k_i").alias("kk_i"),
        F.sum(F.col("k_i") * F.col("s")).alias("t_i"),
        F.sum(F.col("n_i") * F.col("s")).alias("s1_i"),
        F.sum(F.col("n_i") * F.col("s") * F.col("s")).alias("s2_i"),
        F.count(F.lit(1)).cast("int").alias("n_levels"),
    )
    d = folded.selectExpr(
        "n_levels",
        "CAST(nn_i AS BIGINT) AS n_rows",
        "kk_i AS kk",
        "CAST(nn_i AS DOUBLE) AS nn",
        "CAST(t_i AS DOUBLE) AS t",
        "CAST(s1_i AS DOUBLE) AS s1",
        "CAST(s2_i AS DOUBLE) AS s2",
    )
    return (
        d.selectExpr("n_levels", "n_rows", f"{_CA_Z} AS z")
        .selectExpr("*", f"{_BH_AZ} AS az")
        .selectExpr("*", f"{_BH_TT} AS tt")
        .selectExpr(
            "n_levels",
            "n_rows",
            "ROUND(z, 6) AS z_score",
            f"ROUND({_BH_P}, 6) AS p_value",
        )
    )


_MRE_ITERS = 25
_MRE_CHANNELS = ["click", "error", "signup", "view"]  # non-conversion types


def _mre_oracle() -> str:
    ch_list = ", ".join(f"('{c}')" for c in _MRE_CHANNELS)
    its = []
    prev = "mp0"
    for t in range(1, _MRE_ITERS + 1):
        its.append(
            f"""mp{t} AS MATERIALIZED (
  SELECT tv.v AS v, tv.frm AS s,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(tv.p * x.pv ORDER BY tv.tgt)), (a, b) -> a + b) AS pv
  FROM tv JOIN (
    SELECT v, s AS tgt, pv FROM {prev}
    UNION ALL SELECT v, 'CONV', CAST(1.0 AS DOUBLE) FROM variants
    UNION ALL SELECT v, 'DROP', CAST(0.0 AS DOUBLE) FROM variants
  ) x ON x.v = tv.v AND x.tgt = tv.tgt
  GROUP BY 1, 2)"""
        )
        prev = f"mp{t}"
    iter_ctes = ",\n".join(its)
    return f"""
WITH firstp AS (
  SELECT user_id, MIN(ROW(ts, event_id)) AS fp
  FROM events WHERE event_type = 'purchase' GROUP BY 1),
kept AS (
  SELECT e.user_id, e.ts, e.event_id, e.event_type
  FROM events e LEFT JOIN firstp f USING (user_id)
  WHERE f.fp IS NULL OR ROW(e.ts, e.event_id) <= f.fp),
seq AS (
  SELECT user_id, event_type AS frm,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM kept),
trans AS (
  SELECT 'START' AS frm, frm AS tgt FROM seq WHERE rn = 1
  UNION ALL
  SELECT frm, CASE WHEN nxt = 'purchase' THEN 'CONV' ELSE nxt END
  FROM seq WHERE frm <> 'purchase' AND nxt IS NOT NULL
  UNION ALL
  SELECT frm, 'DROP' FROM seq WHERE frm <> 'purchase' AND nxt IS NULL),
cnt AS (SELECT frm, tgt, CAST(COUNT(*) AS BIGINT) AS c FROM trans GROUP BY 1, 2),
rowt AS (SELECT frm, CAST(SUM(c) AS BIGINT) AS rt FROM cnt GROUP BY 1),
pm AS (
  SELECT cnt.frm, cnt.tgt, CAST(c AS DOUBLE) / CAST(rt AS DOUBLE) AS p
  FROM cnt JOIN rowt USING (frm)),
variants AS (SELECT v FROM (VALUES ('base'), {ch_list}) t(v)),
tv AS MATERIALIZED (
  SELECT v, frm,
         CASE WHEN tgt = v THEN 'DROP' ELSE tgt END AS tgt,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(p ORDER BY tgt)), (a, b) -> a + b) AS p
  FROM pm CROSS JOIN variants
  WHERE frm <> v
  GROUP BY 1, 2, 3),
mp0 AS (SELECT DISTINCT v, frm AS s, CAST(0.0 AS DOUBLE) AS pv FROM tv),
{iter_ctes},
cvr AS (SELECT v, pv FROM mp{_MRE_ITERS} WHERE s = 'START'),
base AS (SELECT pv AS base_cvr FROM cvr WHERE v = 'base'),
re AS (
  SELECT v AS channel, 1 - pv / base_cvr AS removal_effect, base_cvr
  FROM cvr CROSS JOIN base WHERE v <> 'base'),
tot AS (
  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         list(removal_effect ORDER BY channel)), (a, b) -> a + b) AS sre
  FROM re)
SELECT channel, ROUND(base_cvr, 6) AS base_cvr,
       ROUND(removal_effect, 6) AS removal_effect,
       ROUND(removal_effect / sre, 6) AS attribution_share
FROM re CROSS JOIN tot ORDER BY channel
"""


@query("markov_removal_attribution", oracle=_mre_oracle())
def markov_removal_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect multi-touch attribution — the third member
    of the MTA trio (position_attribution: heuristic;
    shapley_channel_attribution: cooperative-game): absorb journeys at
    the first purchase, estimate P(conversion) from the journey Markov
    chain, re-estimate with each channel's inbound edges redirected to
    the DROP absorber and its outbound rows removed, and attribute by
    normalized removal effect 1 - P_minus_c/P_base.

    Mechanics: all five chains (base + four removals) are built TOGETHER
    — the transition matrix is crossed with a 5-row variant relation and
    modified map-side per variant; the 25 absorption iterations then run
    driver-side on the COLLECTED matrix (bounded model state, the
    kmeans-quantizer discipline — relational iterations over a 30-row
    relation are pure job overhead) with CONV=1/DROP=0 boundaries.

    Exactness: transition probabilities are identical double divisions
    of exact counts; the per-variant edge merge and every iteration
    matvec are ordered folds (by target within state) — the stationary-
    distribution discipline extended to absorbing chains.

    Scale: the per-user sequence window and the (frm, tgt) count
    aggregate are the only row-scale stages; everything after is
    (variants x states)-bounded."""
    from pyspark.sql import Window

    e = spark.table("events")
    firstp = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("fp"))
    )
    kept = (
        e.join(firstp, "user_id", "left")
        .filter(
            F.col("fp").isNull()
            | (F.struct("ts", "event_id") <= F.col("fp"))
        )
        .select("user_id", "ts", "event_id", "event_type")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = kept.select(
        F.col("event_type").alias("frm"),
        F.lead("event_type").over(w).alias("nxt"),
        F.row_number().over(w).alias("rn"),
    )
    trans = (
        seq.filter("rn = 1").select(F.lit("START").alias("frm"), F.col("frm").alias("tgt"))
        .unionByName(
            seq.filter("frm <> 'purchase' AND nxt IS NOT NULL").select(
                "frm",
                F.when(F.col("nxt") == "purchase", "CONV")
                .otherwise(F.col("nxt"))
                .alias("tgt"),
            )
        )
        .unionByName(
            seq.filter("frm <> 'purchase' AND nxt IS NULL").select(
                "frm", F.lit("DROP").alias("tgt")
            )
        )
    )
    cnt = trans.groupBy("frm", "tgt").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    rowt = cnt.groupBy("frm").agg(F.sum("c").cast("bigint").alias("rt"))
    pm = cnt.join(F.broadcast(rowt), "frm").select(
        "frm",
        "tgt",
        (F.col("c").cast("double") / F.col("rt").cast("double")).alias("p"),
    )
    variants = spark.createDataFrame(
        [("base",)] + [(c,) for c in _MRE_CHANNELS], "v string"
    )
    tv = (
        pm.crossJoin(F.broadcast(variants))
        .filter(F.col("frm") != F.col("v"))
        .select(
            "v",
            "frm",
            F.when(F.col("tgt") == F.col("v"), "DROP")
            .otherwise(F.col("tgt"))
            .alias("tgt2"),
            "tgt",
            "p",
        )
        .groupBy("v", "frm", F.col("tgt2").alias("tgt"))
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(tgt, p))), "
                "cast(0.0 as double), (a, e) -> a + e.p)"
            ).alias("p")
        )
    )
    # Absorption iterations run DRIVER-SIDE on the collected matrix —
    # bounded model state (variants x states^2 <= ~150 doubles, the
    # kmeans-quantizer collect discipline): 25 relational iterations
    # over a 30-row relation cost ~25 shuffle jobs of pure overhead
    # (measured 21 s at sf0.01); the same folds in Python are
    # microseconds and BIT-IDENTICAL (sorted-by-target left folds =
    # the oracle's list_reduce ORDER BY tgt).
    rows = tv.collect()
    by_vs: dict = {}
    for r in rows:
        by_vs.setdefault((r["v"], r["frm"]), []).append((r["tgt"], r["p"]))
    pv = {k: 0.0 for k in by_vs}
    for _ in range(_MRE_ITERS):
        new_pv = {}
        for (v, s), edges in by_vs.items():
            acc = 0.0
            for tgt, p in sorted(edges):
                x = (
                    1.0
                    if tgt == "CONV"
                    else 0.0 if tgt == "DROP" else pv.get((v, tgt), 0.0)
                )
                acc += p * x
            new_pv[(v, s)] = acc
        pv = new_pv
    base_cvr = pv[("base", "START")]
    res = []
    for c in _MRE_CHANNELS:
        res.append((c, 1.0 - pv[(c, "START")] / base_cvr))
    sre = 0.0
    for c, re_c in sorted(res):
        sre += re_c
    out = [
        (c, round(base_cvr, 6), round(re_c, 6), round(re_c / sre, 6))
        for c, re_c in sorted(res)
    ]
    return spark.createDataFrame(
        out,
        "channel string, base_cvr double, removal_effect double,"
        " attribution_share double",
    ).orderBy("channel")


_CONF_YHAT = "(b0 + b1 * CAST(x1 AS DOUBLE) + b2 * CAST(x2 AS DOUBLE))"
_CONF_R = f"CAST(ROUND(abs(CAST(y AS DOUBLE) - {_CONF_YHAT}), 0) AS BIGINT)"

_CONF_ORACLE = f"""
WITH obs AS (
  SELECT l_orderkey % 4 = 0 AS cal,
         CAST(l_quantity AS HUGEINT) AS x1,
         CAST(ROUND(l_discount * 100, 0) AS HUGEINT) AS x2,
         CAST(ROUND(l_extendedprice * 100, 0) AS HUGEINT) AS y
  FROM lineitem),
stats AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n0,
         SUM(x1) AS s1_i, SUM(x2) AS s2_i,
         SUM(x1*x1) AS s11_i, SUM(x2*x2) AS s22_i, SUM(x1*x2) AS s12_i,
         SUM(y) AS sy_i, SUM(y*y) AS syy_i,
         SUM(x1*y) AS s1y_i, SUM(x2*y) AS s2y_i
  FROM obs WHERE NOT cal),
d AS (SELECT {{CASTS}} FROM stats),
coef AS (SELECT n AS n_train, {{B0}} AS b0, {{B1}} AS b1, {{B2}} AS b2 FROM d),
resid AS (
  SELECT {_CONF_R} AS r_cents
  FROM obs CROSS JOIN coef WHERE cal),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM resid),
ranked AS (
  SELECT r_cents, ROW_NUMBER() OVER (ORDER BY r_cents) AS rk FROM resid),
q AS (
  SELECT r_cents AS q90_cents
  FROM ranked CROSS JOIN nn
  WHERE rk = (90 * (n_cal - 1)) // 100 + 1),
cov AS (
  SELECT CAST(SUM(CASE WHEN r_cents <= q90_cents THEN 1 ELSE 0 END) AS BIGINT)
           AS n_in
  FROM resid CROSS JOIN q)
SELECT CAST(n_train AS BIGINT) AS n_train, n_cal,
       ROUND(b1, 6) AS cents_per_qty, ROUND(b2, 6) AS cents_per_disc_pt,
       q90_cents,
       ROUND(CAST(n_in AS DOUBLE) / CAST(n_cal AS DOUBLE), 6) AS coverage
FROM coef CROSS JOIN nn CROSS JOIN q CROSS JOIN cov
"""


def _conformal_oracle() -> str:
    return (
        _CONF_ORACLE.replace("{CASTS}", _OLS2_STAT_CASTS)
        .replace("{B0}", _OLS2_B0)
        .replace("{B1}", _OLS2_B1)
        .replace("{B2}", _OLS2_B2)
    )


@query("conformal_interval_price", oracle=_conformal_oracle())
def conformal_interval_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval for the price regression:
    train the two-feature OLS on 3/4 of lineitem (hash split), take the
    nearest-rank 90th percentile of absolute calibration residuals as
    the interval half-width, and report the realized calibration
    coverage — the distribution-free 'how wrong can this model be'
    guarantee (~90% of future rows fall within +/- q90 under
    exchangeability) that the OLS point fit alone cannot give.

    Exactness: coefficients reuse the ols_price_regression strings
    (bit-identical doubles from exact-integer sufficient statistics);
    residuals quantize to cents BEFORE ranking, so the quantile
    selection and the coverage comparisons are pure integer work.

    Scale: two scans (train moments; calibration residuals) that each
    collapse map-side; the residual quantile uses the bucketed
    two-pass selection (rank_quantiles_select), never a single-task
    sort; coverage is one more map-side aggregate."""
    from dawis_spark.operators.sketches import rank_quantiles_select

    obs = spark.table("lineitem").select(
        (F.col("l_orderkey") % 4 == 0).alias("cal"),
        F.col("l_quantity").cast("decimal(38,0)").alias("x1"),
        F.round(F.col("l_discount") * 100, 0).cast("decimal(38,0)").alias("x2"),
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("decimal(38,0)")
        .alias("y"),
    )
    train = obs.filter(~F.col("cal"))
    stats = train.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n0"),
        F.sum("x1").alias("s1_i"),
        F.sum("x2").alias("s2_i"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11_i"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22_i"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12_i"),
        F.sum("y").alias("sy_i"),
        F.sum(F.col("y") * F.col("y")).alias("syy_i"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y_i"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y_i"),
    )
    coef = stats.selectExpr(*_OLS2_STAT_CASTS.split(", ")).selectExpr(
        "n AS n_train",
        f"{_OLS2_B0} AS b0",
        f"{_OLS2_B1} AS b1",
        f"{_OLS2_B2} AS b2",
    )
    resid = (
        obs.filter("cal")
        .crossJoin(F.broadcast(coef))
        .selectExpr(f"{_CONF_R} AS r_cents", "n_train", "b1", "b2")
    )
    q = rank_quantiles_select(
        resid.select(F.lit(1).alias("k"), "r_cents"), ["k"], "r_cents", [90]
    ).select(F.col("value").alias("q90_cents"), F.col("n").alias("n_cal"))
    cov = (
        resid.crossJoin(F.broadcast(q))
        .agg(
            F.max("n_train").alias("n_train"),
            F.max("b1").alias("b1"),
            F.max("b2").alias("b2"),
            F.max("q90_cents").alias("q90_cents"),
            F.max("n_cal").alias("n_cal"),
            F.sum((F.col("r_cents") <= F.col("q90_cents")).cast("int"))
            .cast("bigint")
            .alias("n_in"),
        )
    )
    return cov.selectExpr(
        "CAST(n_train AS BIGINT) AS n_train",
        "CAST(n_cal AS BIGINT) AS n_cal",
        "ROUND(b1, 6) AS cents_per_qty",
        "ROUND(b2, 6) AS cents_per_disc_pt",
        "q90_cents",
        "ROUND(CAST(n_in AS DOUBLE) / CAST(n_cal AS DOUBLE), 6) AS coverage",
    )


def _ece_oracle(dim: int, iters: int, lr: float) -> str:
    dot = _VEC.dot("xs", "wl", "duck")
    return f"""
WITH {_logreg_chain_ctes(dim, iters, lr, _LOGREG_SAMPLE_LIMIT)},
wlF AS (SELECT list(weight ORDER BY dim) AS wl FROM w{iters}),
scF AS MATERIALIZED (
  SELECT CAST(v.y AS INT) AS y,
         round(1.0 / (1.0 + exp(-(round({dot}, 6)))), 6) AS p
  FROM v, wlF),
bins AS (
  SELECT LEAST(CAST(FLOOR(p * 10) AS INT), 9) AS b,
         CAST(COUNT(*) AS BIGINT) AS n_b,
         CAST(SUM(y) AS BIGINT) AS k_b,
         AVG(p) AS mp
  FROM scF GROUP BY 1),
ntot AS (SELECT CAST(SUM(n_b) AS BIGINT) AS n FROM bins),
gaps AS (
  SELECT b, CAST(n_b AS DOUBLE) / n * abs(mp - CAST(k_b AS DOUBLE) / n_b)
           AS wgap,
         abs(mp - CAST(k_b AS DOUBLE) / n_b) AS gap
  FROM bins CROSS JOIN ntot),
brier AS (SELECT AVG((p - y) * (p - y)) AS bs FROM scF)
SELECT (SELECT n FROM ntot) AS n_docs,
       ROUND(bs, 6) AS brier_score,
       ROUND((SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              list(wgap ORDER BY b)), (a, e) -> a + e) FROM gaps), 6)
         AS ece,
       ROUND((SELECT MAX(gap) FROM gaps), 6) AS mce
FROM brier
"""


@query("ece_classifier_calibration", oracle=_ece_oracle(64, 3, 1.0))
def ece_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar calibration metrics for the trained quality classifier —
    Brier score, Expected Calibration Error (decile-binned, count-
    weighted |confidence - accuracy|), and Maximum Calibration Error:
    the one-number summaries of what classifier_calibration_curve shows
    as a picture (ECE is what a retraining gate thresholds on).

    Determinism: scores replay the exact logreg trajectory and round to
    6 before binning (the calibration-curve discipline), so bins and
    per-bin gaps are identical; the ECE sum is a bucket-sorted ordered
    fold; Brier's AVG over per-row identical doubles differs only in
    summation order (~n*eps against the round-6 margin).

    Scale: training shared via _trained_logreg_w (bounded-sample,
    memoized — no retrain); one more scan collapsing to 10 bins plus a
    1-row Brier aggregate."""
    from dawis_spark.operators.logreg import margin_expr

    emb = spark.table("embeddings")
    w = _trained_logreg_w(spark, sf_dir)
    p = f"round(1.0 / (1.0 + exp(-(round({margin_expr('embedding', w)}, 6)))), 6)"
    scored = emb.selectExpr(
        f"cast({_LOGREG_Y_SPARK} as int) AS y", f"{p} AS p"
    )
    bins = scored.selectExpr(
        "LEAST(CAST(FLOOR(p * 10) AS INT), 9) AS b", "y", "p"
    ).groupBy("b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        F.sum("y").cast("bigint").alias("k_b"),
        F.avg("p").alias("mp"),
    )
    nn = bins.agg(F.sum("n_b").cast("bigint").alias("n"))
    gaps = bins.crossJoin(F.broadcast(nn)).selectExpr(
        "b",
        "CAST(n_b AS DOUBLE) / n * abs(mp - CAST(k_b AS DOUBLE) / n_b) AS wgap",
        "abs(mp - CAST(k_b AS DOUBLE) / n_b) AS gap",
        "n",
    )
    agg = gaps.agg(
        F.max("n").alias("n_docs"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(b, wgap))), "
            "cast(0.0 as double), (a, e) -> a + e.wgap)"
        ).alias("ece"),
        F.max("gap").alias("mce"),
    )
    brier = scored.agg(
        F.avg((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))).alias("bs")
    )
    return agg.crossJoin(F.broadcast(brier)).select(
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.round("bs", 6).alias("brier_score"),
        F.round("ece", 6).alias("ece"),
        F.round("mce", 6).alias("mce"),
    )


# decile-binned ECE legs over a named round-6 score column, shared by the
# before/after sides of the Platt query (the _ece_oracle shape)
_ECE_BINS = """
bins_{tag} AS (
  SELECT LEAST(CAST(FLOOR({score} * 10) AS INT), 9) AS b,
         CAST(COUNT(*) AS BIGINT) AS n_b,
         CAST(SUM(y) AS BIGINT) AS k_b,
         AVG({score}) AS mp
  FROM {rel} GROUP BY 1),
ece_{tag} AS (
  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(CAST(n_b AS DOUBLE) / nt.n
                * abs(mp - CAST(k_b AS DOUBLE) / n_b) ORDER BY b)),
         (a, e) -> a + e) AS ece
  FROM bins_{tag}, (SELECT CAST(SUM(n_b) AS BIGINT) AS n FROM bins_{tag}) nt
  GROUP BY nt.n)
"""


def _platt_oracle(dim: int, iters: int, lr: float) -> str:
    dot = _VEC.dot("xs", "wl", "duck")
    return f"""
WITH {_logreg_chain_ctes(dim, iters, lr, _LOGREG_SAMPLE_LIMIT)},
wlF AS (SELECT list(weight ORDER BY dim) AS wl FROM w{iters}),
mt AS MATERIALIZED (
  SELECT round({dot}, 6) AS m, vt.y
  FROM vt, wlF),
{_platt_chain_ctes(_PLATT_ITERS, _PLATT_LR)},
mF AS MATERIALIZED (
  SELECT round({dot}, 6) AS m, CAST(v.y AS INT) AS y
  FROM v, wlF),
scored AS MATERIALIZED (
  SELECT y,
         round(1.0 / (1.0 + exp(-m)), 6) AS p_raw,
         round(1.0 / (1.0 + exp(-(round(pf.a * m + pf.b, 6)))), 6) AS p_cal
  FROM mF, p{_PLATT_ITERS} pf),
{_ECE_BINS.format(tag='raw', score='p_raw', rel='scored')},
{_ECE_BINS.format(tag='cal', score='p_cal', rel='scored')}
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM scored) AS n_docs,
       (SELECT round(a, 6) FROM p{_PLATT_ITERS}) AS a_platt,
       (SELECT round(b, 6) FROM p{_PLATT_ITERS}) AS b_platt,
       ROUND((SELECT ece FROM ece_raw), 6) AS ece_before,
       ROUND((SELECT ece FROM ece_cal), 6) AS ece_after
"""


@query("platt_recalibrated_ece", oracle=_platt_oracle(64, 3, 1.0))
def platt_recalibrated_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Platt-scaling recalibration of the shared quality classifier:
    fit sigmoid(a*m + b) over the trained margins on the SAME bounded
    lowest-id sample the classifier trains on (3 GD rounds from
    (1, 0)), then report decile-binned ECE before vs after over the
    full corpus — the standard post-hoc calibration repair
    (ece_classifier_calibration MEASURES miscalibration; this query
    FIXES it and quantifies the gain, which is what a serving gate
    actually deploys).

    Exactness: margins replay the shared round-6 fold; the (a, b)
    trajectory is the logreg integer-micro gradient discipline in two
    dimensions (operators/logreg.py:platt_fit = the CTE chain
    _platt_chain_ctes, bit-equal); both scores round to 6 before
    binning; ECE sums are bin-ordered folds.

    Scale: both fits are memoized, bounded-sample, driver-side
    (constant cost at any corpus size); the full-corpus pass is ONE
    scan scoring two expressions and collapsing to 2 x 10 bins."""
    from dawis_spark.operators.logreg import margin_expr

    w = _trained_logreg_w(spark, sf_dir)
    a, b = _trained_platt_ab(spark, sf_dir)
    m = margin_expr("embedding", w)
    scored = spark.table("embeddings").selectExpr(
        f"cast({_LOGREG_Y_SPARK} as int) AS y",
        f"round(1.0 / (1.0 + exp(-({m}))), 6) AS p_raw",
        f"round(1.0 / (1.0 + exp(-(round({a!r} * ({m}) + {b!r}, 6)))), 6)"
        " AS p_cal",
    )

    def ece_of(col: str) -> DataFrame:
        bins = scored.selectExpr(
            f"LEAST(CAST(FLOOR({col} * 10) AS INT), 9) AS b",
            "y",
            f"{col} AS p",
        ).groupBy("b").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_b"),
            F.sum("y").cast("bigint").alias("k_b"),
            F.avg("p").alias("mp"),
        )
        nn = bins.agg(F.sum("n_b").cast("bigint").alias("n"))
        gaps = bins.crossJoin(F.broadcast(nn)).selectExpr(
            "b",
            "CAST(n_b AS DOUBLE) / n * abs(mp - CAST(k_b AS DOUBLE) / n_b)"
            " AS wgap",
            "n",
        )
        return gaps.agg(
            F.max("n").alias("n_docs"),
            F.expr(
                "aggregate(array_sort(collect_list(struct(b, wgap))), "
                "cast(0.0 as double), (a, e) -> a + e.wgap)"
            ).alias("ece"),
        )

    before = ece_of("p_raw").selectExpr("n_docs", "ece AS ece_b")
    after = ece_of("p_cal").selectExpr("ece AS ece_a")
    return (
        before.crossJoin(F.broadcast(after))
        .selectExpr(
            "CAST(n_docs AS BIGINT) AS n_docs",
            f"ROUND({a!r}, 6) AS a_platt",
            f"ROUND({b!r}, 6) AS b_platt",
            "ROUND(ece_b, 6) AS ece_before",
            "ROUND(ece_a, 6) AS ece_after",
        )
    )


def _gains_oracle(dim: int, iters: int, lr: float) -> str:
    dot = _VEC.dot("xs", "wl", "duck")
    return f"""
WITH {_logreg_chain_ctes(dim, iters, lr, _LOGREG_SAMPLE_LIMIT)},
wlF AS (SELECT list(weight ORDER BY dim) AS wl FROM w{iters}),
scF AS MATERIALIZED (
  SELECT CAST(v.y AS INT) AS y,
         round(1.0 / (1.0 + exp(-(round({dot}, 6)))), 6) AS p
  FROM v, wlF),
bins AS (
  SELECT LEAST(CAST(FLOOR(p * 10) AS INT), 9) AS b,
         CAST(COUNT(*) AS BIGINT) AS n_b,
         CAST(SUM(y) AS BIGINT) AS k_b
  FROM scF GROUP BY 1),
tot AS (
  SELECT CAST(SUM(n_b) AS BIGINT) AS n, CAST(SUM(k_b) AS BIGINT) AS k
  FROM bins),
cum AS (
  SELECT a.b, a.n_b, a.k_b,
         CAST(SUM(x.n_b) AS BIGINT) AS cum_n,
         CAST(SUM(x.k_b) AS BIGINT) AS cum_k
  FROM bins a JOIN bins x ON x.b >= a.b
  GROUP BY 1, 2, 3)
SELECT b AS score_decile, n_b, k_b,
       ROUND(CAST(cum_k AS DOUBLE) / k, 6) AS cum_capture,
       ROUND((CAST(cum_k AS DOUBLE) / k) / (CAST(cum_n AS DOUBLE) / n), 6)
         AS lift
FROM cum CROSS JOIN tot ORDER BY b DESC
"""


@query("gains_lift_deciles", oracle=_gains_oracle(64, 3, 1.0))
def gains_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-gains / lift table for the trained quality classifier:
    walking score bins from the most-confident down, what fraction of
    all positives is captured (gain) and at what multiple of random
    targeting (lift) — the 'how deep do I have to go' curve a triage or
    labeling-budget decision reads, complementing AUC (rank quality)
    and ECE (probability quality).

    Determinism: same round-6 scores and FLOOR bins as the calibration
    family; cumulative counts are exact integers off a 10x10
    bucket-bounded self-join — no ordered float folds needed.

    Scale: training shared via _trained_logreg_w (bounded-sample,
    memoized — no retrain); one scoring scan collapsing to 10 bins;
    everything after is bin-bounded."""
    from dawis_spark.operators.logreg import margin_expr

    emb = spark.table("embeddings")
    w = _trained_logreg_w(spark, sf_dir)
    p = f"round(1.0 / (1.0 + exp(-(round({margin_expr('embedding', w)}, 6)))), 6)"
    bins = (
        emb.selectExpr(f"cast({_LOGREG_Y_SPARK} as int) AS y", f"{p} AS p")
        .selectExpr("LEAST(CAST(FLOOR(p * 10) AS INT), 9) AS b", "y")
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_b"),
            F.sum("y").cast("bigint").alias("k_b"),
        )
    )
    tot = bins.agg(
        F.sum("n_b").cast("bigint").alias("n"),
        F.sum("k_b").cast("bigint").alias("k"),
    )
    a = bins.select(
        F.col("b").alias("ab"),
        F.col("n_b").alias("a_n"),
        F.col("k_b").alias("a_k"),
    )
    cum = (
        a.join(F.broadcast(bins), F.col("b") >= F.col("ab"))
        .groupBy("ab", "a_n", "a_k")
        .agg(
            F.sum("n_b").cast("bigint").alias("cum_n"),
            F.sum("k_b").cast("bigint").alias("cum_k"),
        )
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            F.col("ab").alias("score_decile"),
            F.col("a_n").alias("n_b"),
            F.col("a_k").alias("k_b"),
            F.round(F.col("cum_k").cast("double") / F.col("k"), 6).alias(
                "cum_capture"
            ),
            F.round(
                (F.col("cum_k").cast("double") / F.col("k"))
                / (F.col("cum_n").cast("double") / F.col("n")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("score_decile").desc())
    )


# Wald-Wolfowitz runs statistics over one-row exact integers (r = runs,
# n1 = ups, n2 = downs): mu = 2 n1 n2/(n1+n2) + 1,
# var = 2 n1 n2 (2 n1 n2 - n1 - n2) / ((n1+n2)^2 (n1+n2-1)).
_RUNS_MU = "(2.0 * n1 * n2 / (n1 + n2) + 1)"
_RUNS_VAR = (
    "(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)"
    " / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1)))"
)
_RUNS_Z = f"((r - {_RUNS_MU}) / sqrt({_RUNS_VAR}))"

_RUNS_ORACLE = f"""
WITH {{DAILY}},
moves AS (
  SELECT d, CASE WHEN rev > LAG(rev) OVER (ORDER BY d) THEN 1
                 WHEN rev < LAG(rev) OVER (ORDER BY d) THEN -1 END AS s
  FROM daily),
signs AS (
  SELECT d, s, LAG(s) OVER (ORDER BY d) AS prev
  FROM (SELECT d, s FROM moves WHERE s IS NOT NULL)),
agg AS (
  SELECT CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
         CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS DOUBLE) AS n2,
         CAST(SUM(CASE WHEN prev IS NULL OR s <> prev THEN 1 ELSE 0 END)
              AS DOUBLE) AS r
  FROM signs),
zs AS (
  SELECT CAST(n1 AS BIGINT) AS n_up, CAST(n2 AS BIGINT) AS n_down,
         CAST(r AS BIGINT) AS n_runs,
         ROUND({_RUNS_MU}, 4) AS expected_runs, {_RUNS_Z} AS z
  FROM agg)
SELECT n_up, n_down, n_runs, expected_runs,
       ROUND(z, 6) AS z_score, ROUND({{P}}, 6) AS p_value
FROM (SELECT *, {{TT}} AS tt FROM (SELECT *, {{AZ}} AS az FROM zs))
"""


def _runs_oracle() -> str:
    return (
        _RUNS_ORACLE.replace("{DAILY}", _DAILY_REV_ORDERS_CTE)
        .replace("{P}", _BH_P)
        .replace("{TT}", _BH_TT)
        .replace("{AZ}", _BH_AZ)
    )


@query("runs_test_daily_revenue", oracle=_runs_oracle())
def runs_test_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the up/down moves of daily revenue —
    'are the daily directions RANDOM': too few runs = sticky momentum,
    too many = mean-reverting oscillation. The direction-randomness
    companion to Ljung-Box (magnitude autocorrelation) and Mann-Kendall
    (monotone trend): together the three cover level, direction, and
    memory of a series.

    Exactness: ups, downs, and run count are exact integers off the
    day-ordered lag windows; mu/var/z/p are shared expression strings
    over one-time double casts — identical engines.

    Scale: the lag windows ride the calendar-bounded daily series
    (whitelisted class); everything after is one row."""
    from pyspark.sql import Window

    daily = (
        spark.table("orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("bigint")
            .alias("rev")
        )
    )
    w = Window.orderBy("d")
    moves = daily.select(
        "d",
        F.when(F.col("rev") > F.lag("rev").over(w), 1)
        .when(F.col("rev") < F.lag("rev").over(w), -1)
        .alias("s"),
    ).filter(F.col("s").isNotNull())
    signs = moves.select("d", "s", F.lag("s").over(w).alias("prev"))
    agg = signs.agg(
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).cast("double").alias("n1"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0))
        .cast("double")
        .alias("n2"),
        F.sum(
            F.when(F.col("prev").isNull() | (F.col("s") != F.col("prev")), 1)
            .otherwise(0)
        )
        .cast("double")
        .alias("r"),
    )
    return (
        agg.selectExpr(
            "CAST(n1 AS BIGINT) AS n_up",
            "CAST(n2 AS BIGINT) AS n_down",
            "CAST(r AS BIGINT) AS n_runs",
            f"ROUND({_RUNS_MU}, 4) AS expected_runs",
            f"{_RUNS_Z} AS z",
        )
        .selectExpr("*", f"{_BH_AZ} AS az")
        .selectExpr("*", f"{_BH_TT} AS tt")
        .selectExpr(
            "n_up",
            "n_down",
            "n_runs",
            "expected_runs",
            "ROUND(z, 6) AS z_score",
            f"ROUND({_BH_P}, 6) AS p_value",
        )
    )


def _mcnemar_oracle() -> str:
    toks = _TXT.tokens("text", "duck")
    scores = _TS.language_scores_sql("text", "duck")
    score_sel = ", ".join(
        f"ROUND({e}, 6) AS {name}" for name, e in scores.items()
    )
    langs = list(_TS.STOPWORDS)
    greatest = "greatest(" + ", ".join(f"score_{l}" for l in langs) + ")"
    hpred = "CASE WHEN " + greatest + " <= 0 THEN 'und' "
    hpred += " ".join(
        f"WHEN score_{l} = {greatest} THEN '{l}'" for l in langs
    )
    hpred += " ELSE 'und' END"
    z = "((abs(b - c) - 1) / sqrt(nullif(CAST(b + c AS DOUBLE), 0)))"
    return f"""
WITH {_NB_CTES},
ht AS (SELECT doc_id, {toks} AS __toks FROM ev),
hp AS (
  SELECT doc_id, {hpred} AS h_pred
  FROM (SELECT doc_id, {score_sel} FROM ht) x),
cells AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN p.predicted = d.lang THEN 1 ELSE 0 END)
              AS BIGINT) AS nb_correct,
         CAST(SUM(CASE WHEN h.h_pred = d.lang THEN 1 ELSE 0 END)
              AS BIGINT) AS heur_correct,
         CAST(SUM(CASE WHEN h.h_pred = d.lang AND p.predicted <> d.lang
                  THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN h.h_pred <> d.lang AND p.predicted = d.lang
                  THEN 1 ELSE 0 END) AS BIGINT) AS c
  FROM ev d JOIN pred p USING (doc_id) JOIN hp h USING (doc_id)),
zs AS (
  SELECT n_docs, nb_correct, heur_correct, b AS heur_only, c AS nb_only,
         {z} AS z
  FROM cells)
SELECT n_docs, nb_correct, heur_correct, heur_only, nb_only,
       ROUND(z, 6) AS z_score, ROUND({{P}}, 6) AS p_value
FROM (SELECT *, {{TT}} AS tt FROM (SELECT *, {{AZ}} AS az FROM zs))
""".replace("{P}", _BH_P).replace("{TT}", _BH_TT).replace("{AZ}", _BH_AZ)


@query("mcnemar_langid_vs_nb", oracle=_mcnemar_oracle())
def mcnemar_langid_vs_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test: is the LEARNED naive-Bayes language
    classifier actually better than the stopword heuristic ON THE SAME
    held-out documents? Accuracy deltas alone ignore pairing; McNemar
    compares only the DISCORDANT documents (heuristic-right/NB-wrong vs
    the converse), chi-square with continuity correction — THE paired
    model-comparison primitive every 'replace the heuristic with a
    model' decision needs.

    Determinism: both classifiers are the existing deterministic
    pipelines (round-6 heuristic scores with fixed tie-break order; the
    NB argmax with the (score DESC, lang ASC) tiebreak); the discordant
    counts are exact integers and z/p are shared expression strings.

    Scale: the NB model relations are vocabulary-sized, the heuristic
    is map-side, and the paired join is keyed by doc_id — everything
    after the predictions is one row."""
    from pyspark.sql import Window

    from dawis_spark.operators.textstats import language_id

    docs = spark.table("documents")
    train = docs.filter(F.col("doc_id") % 4 != 0)
    ev = docs.filter(F.col("doc_id") % 4 == 0)

    def tok(df, keep):
        return (
            df.select(*keep, F.explode(F.split(F.lower("text"), " ")).alias("t"))
            .filter(F.col("t") != "")
        )

    ct = (
        tok(train, ["lang"])
        .groupBy("lang", "t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tl = ct.groupBy("lang").agg(F.sum("c").cast("bigint").alias("t_l"))
    vt = ct.agg(F.countDistinct("t").cast("bigint").alias("v"))
    pri = train.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("d_l")
    )
    dtot = train.agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    langs = (
        pri.join(tl, "lang").crossJoin(F.broadcast(vt)).crossJoin(F.broadcast(dtot))
    )
    etok = (
        tok(ev, ["doc_id"])
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    etot = etok.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("tf_tot"))
    seen = (
        etok.join(ct, "t")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("tf") * F.log(F.col("c") + 1)).alias("seen_s"))
    )
    scored = (
        etot.crossJoin(F.broadcast(langs))
        .join(seen, ["doc_id", "lang"], "left")
        .selectExpr("doc_id", "lang", f"{_NB_SCORE} AS score")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("lang").asc()
    )
    nb_pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("predicted"))
    )
    hp = language_id(ev, "doc_id", "text").select(
        "doc_id", F.col("lang_pred").alias("h_pred")
    )
    cells = (
        ev.select("doc_id", F.col("lang").alias("actual"))
        .join(nb_pred, "doc_id")
        .join(hp, "doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((F.col("predicted") == F.col("actual")).cast("int"))
            .cast("bigint")
            .alias("nb_correct"),
            F.sum((F.col("h_pred") == F.col("actual")).cast("int"))
            .cast("bigint")
            .alias("heur_correct"),
            F.sum(
                (
                    (F.col("h_pred") == F.col("actual"))
                    & (F.col("predicted") != F.col("actual"))
                ).cast("int")
            )
            .cast("bigint")
            .alias("b"),
            F.sum(
                (
                    (F.col("h_pred") != F.col("actual"))
                    & (F.col("predicted") == F.col("actual"))
                ).cast("int")
            )
            .cast("bigint")
            .alias("c"),
        )
    )
    return (
        cells.selectExpr(
            "n_docs",
            "nb_correct",
            "heur_correct",
            "b AS heur_only",
            "c AS nb_only",
            "((abs(b - c) - 1) / sqrt(nullif(CAST(b + c AS DOUBLE), 0))) AS z",
        )
        .selectExpr("*", f"{_BH_AZ} AS az")
        .selectExpr("*", f"{_BH_TT} AS tt")
        .selectExpr(
            "n_docs",
            "nb_correct",
            "heur_correct",
            "heur_only",
            "nb_only",
            "ROUND(z, 6) AS z_score",
            f"ROUND({_BH_P}, 6) AS p_value",
        )
    )


# ---------------------------------------------------------------------------
# Round-12 additions: sequential drift (Page-Hinkley), Good-Turing unseen
# mass, and train/eval n-gram novelty
# ---------------------------------------------------------------------------

_PH_ORACLE = f"""
WITH {_DAILY_REV_ORDERS_CTE},
ix AS (
  SELECT d, rev,
         ROW_NUMBER() OVER (ORDER BY d) AS t,
         SUM(rev) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM daily),
dev AS (SELECT d, rev, t, cum, rev - (cum // t) AS dv FROM ix),
m AS (
  SELECT d, t, cum, (cum // t) AS xbar,
         SUM(dv) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mt
  FROM dev),
st AS (
  SELECT d, cum, xbar, mt,
         mt - MIN(mt) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph
  FROM m)
SELECT d AS day, CAST(ph AS BIGINT) AS ph_stat_cents,
       CAST(xbar AS BIGINT) AS cum_mean_cents,
       ph * 50 > cum AS alarm
FROM st ORDER BY ph DESC, d LIMIT 10
"""


@query("page_hinkley_drift", oracle=_PH_ORACLE)
def page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley sequential change detection on daily revenue — the
    online-monitoring classic beside CUSUM (cusum_changepoints) and PSI
    (psi_value_drift): m_t accumulates deviations from the RUNNING mean
    and the PH statistic m_t - min m_i spikes when the level shifts up.
    The alarm thresholds the statistic against 2% of cumulative revenue
    (exact integer cross-multiplication ph*50 > cum — scale-free, no
    tuned absolute lambda). Top-10 days by statistic.

    Exactness: running mean is exact trunc-div (Spark div == DuckDB //),
    deviations/cumulative sums are exact bigint cents; no floats
    anywhere.

    Scale: the running windows ride the calendar-bounded daily relation
    (whitelisted class); output is TakeOrdered top-10."""
    from pyspark.sql import Window

    daily = (
        spark.table("orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("bigint")
            .alias("rev")
        )
    )
    wo = Window.orderBy("d")
    wc = wo.rowsBetween(Window.unboundedPreceding, 0)
    ix = daily.select(
        "d",
        "rev",
        F.row_number().over(wo).alias("t"),
        F.sum("rev").over(wc).alias("cum"),
    )
    dev = ix.selectExpr("d", "t", "cum", "rev - (cum div t) AS dv")
    m = dev.select(
        "d",
        "cum",
        F.expr("cum div t").alias("xbar"),
        F.sum("dv").over(wc).alias("mt"),
    )
    st = m.select(
        "d",
        "cum",
        "xbar",
        (F.col("mt") - F.min("mt").over(wc)).alias("ph"),
    )
    return (
        st.select(
            F.col("d").alias("day"),
            F.col("ph").cast("bigint").alias("ph_stat_cents"),
            F.col("xbar").cast("bigint").alias("cum_mean_cents"),
            (F.col("ph") * 50 > F.col("cum")).alias("alarm"),
        )
        .orderBy(F.desc("ph_stat_cents"), "day")
        .limit(10)
    )


# Frequency-of-frequencies over word TRIGRAM types (non-distinct two-level
# hashes): the synthetic corpus's unigram vocabulary is dense (31 types,
# min count 26 at sf0.01 — no rare band), while trigram types have the
# long tail Good-Turing is about (9k+ hapaxes at sf0.01).
_GT_TOK_SPARK = _TXT.shingle_hashes("text", 3, "spark", distinct=False)
_GT_TOK_DUCK = _TXT.shingle_hashes("text", 3, "duck", distinct=False)

_GT_ORACLE = f"""
WITH tf AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT unnest({_GT_TOK_DUCK}) AS t FROM documents) GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM tf),
nr AS (SELECT c AS r, CAST(COUNT(*) AS BIGINT) AS n_types
       FROM tf WHERE c <= 6 GROUP BY 1),
body AS (
  SELECT a.r, a.n_types,
         CAST((a.r * a.n_types * 1000000) // tot.n AS BIGINT) AS mass_ppm,
         ROUND((a.r + 1.0) * b.n_types / a.n_types, 6) AS r_star
  FROM nr a LEFT JOIN nr b ON b.r = a.r + 1, tot
  WHERE a.r <= 5),
unseen AS (
  SELECT CAST(0 AS BIGINT) AS r, CAST(NULL AS BIGINT) AS n_types,
         CAST((nr.n_types * 1000000) // tot.n AS BIGINT) AS mass_ppm,
         CAST(NULL AS DOUBLE) AS r_star
  FROM nr, tot WHERE nr.r = 1)
SELECT * FROM unseen UNION ALL SELECT * FROM body ORDER BY r
"""


@query("good_turing_unseen_mass", oracle=_GT_ORACLE)
def good_turing_unseen_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple Good-Turing frequency estimation over the corpus's word
    TRIGRAM types (Good 1953; Gale & Sampson 1995): the frequency-of-
    frequencies table N_r for r <= 5, the GT-smoothed adjusted count
    r* = (r+1) N_{r+1} / N_r, and — as the r = 0 row — the MISSING MASS
    N_1/N, the probability the next trigram is an unseen type. The
    companion to chao1_vocab_estimate (how many types are missing) and
    heaps_law_vocab_growth (how fast they arrive): this one prices how
    much probability a LM should reserve for them. Trigrams rather than
    unigrams because GT lives on the rare band (N_1, N_2, ...) and this
    corpus's unigram vocabulary has none.

    Exactness: trigram identity is the dual-rendered NON-distinct
    two-level polynomial hash (multiset — occurrence counts, not doc
    frequency); counts and mass_ppm are exact integers (ppm via trunc
    div); r_star pays one rounded division.

    Scale: one trigram-type-count exchange carrying int64 hashes, then
    everything is the <= 6-row frequency-of-frequencies relation."""
    tf = (
        spark.table("documents")
        .select(F.explode(F.expr(_GT_TOK_SPARK)).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = tf.agg(F.sum("c").cast("bigint").alias("n"))
    nr = (
        tf.filter(F.col("c") <= 6)
        .groupBy(F.col("c").alias("r"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_types"))
    )
    nxt = nr.select((F.col("r") - 1).alias("r"), F.col("n_types").alias("n_next"))
    body = (
        nr.filter(F.col("r") <= 5)
        .join(F.broadcast(nxt), "r", "left")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "r",
            "n_types",
            "CAST((r * n_types * 1000000) div n AS BIGINT) AS mass_ppm",
            "ROUND((r + 1.0) * n_next / n_types, 6) AS r_star",
        )
    )
    unseen = (
        nr.filter(F.col("r") == 1)
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "CAST(0 AS BIGINT) AS r",
            "CAST(NULL AS BIGINT) AS n_types",
            "CAST((n_types * 1000000) div n AS BIGINT) AS mass_ppm",
            "CAST(NULL AS DOUBLE) AS r_star",
        )
    )
    return unseen.unionByName(body).orderBy("r")


_NOV_SH_SPARK = _TXT.shingle_hashes("text", 3, "spark")
_NOV_SH_DUCK = _TXT.shingle_hashes("text", 3, "duck")

_NOVELTY_ORACLE = f"""
WITH tg AS (
  SELECT DISTINCT unnest({_NOV_SH_DUCK}) AS g
  FROM documents WHERE doc_id % 4 <> 0),
eg AS (
  SELECT source, unnest({_NOV_SH_DUCK}) AS g
  FROM documents WHERE doc_id % 4 = 0),
j AS (
  SELECT eg.source, CASE WHEN tg.g IS NULL THEN 1 ELSE 0 END AS novel
  FROM eg LEFT JOIN tg ON eg.g = tg.g)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(novel) AS BIGINT) AS novel_grams,
       ROUND(CAST(SUM(novel) AS DOUBLE) / COUNT(*), 6) AS novelty_rate
FROM j GROUP BY source ORDER BY source
"""


@query("ngram_novelty_rate", oracle=_NOVELTY_ORACLE)
def ngram_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval 3-gram NOVELTY per source: what fraction of the
    held-out quarter's distinct word trigrams (per doc) never occur in
    the training 3/4 — the memorization/novelty audit next to
    benchmark_contamination (same machinery, opposite question: overlap
    you WANT low there, novelty you want HIGH here) and a standard
    eval-set hygiene check for LLM data splits.

    Determinism: trigram identity is the dual-rendered two-level
    polynomial hash (functions/text.shingle_hashes — each char hashed
    once, int64 exact in both engines); counts are exact integers.

    Scale: exchanges carry int64 gram hashes only (never text); the
    train side collapses to DISTINCT grams before the join; the
    eval-vs-train probe is a hash-keyed shuffle join; output is
    |sources| rows."""
    docs = spark.table("documents")
    tg = (
        docs.filter(F.col("doc_id") % 4 != 0)
        .select(F.explode(F.expr(_NOV_SH_SPARK)).alias("g"))
        .distinct()
        .withColumn("seen", F.lit(True))
    )
    eg = docs.filter(F.col("doc_id") % 4 == 0).select(
        "source", F.explode(F.expr(_NOV_SH_SPARK)).alias("g")
    )
    j = eg.join(tg.hint("shuffle_hash"), "g", "left")
    novel = F.when(F.col("seen").isNull(), 1).otherwise(0)
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(novel).cast("bigint").alias("novel_grams"),
            F.round(F.sum(novel) / F.count(F.lit(1)), 6).alias("novelty_rate"),
        )
        .orderBy("source")
    )


def _pr_curve_oracle(dim: int, iters: int, lr: float) -> str:
    dot = _VEC.dot("xs", "wl", "duck")
    return f"""
WITH {_logreg_chain_ctes(dim, iters, lr, _LOGREG_SAMPLE_LIMIT)},
wlF AS (SELECT list(weight ORDER BY dim) AS wl FROM w{iters}),
scF AS MATERIALIZED (
  SELECT CAST(v.y AS INT) AS y,
         round(1.0 / (1.0 + exp(-(round({dot}, 6)))), 6) AS p
  FROM v, wlF),
bins AS (
  SELECT LEAST(CAST(FLOOR(p * 20) AS INT), 19) AS b,
         CAST(COUNT(*) AS BIGINT) AS n_b,
         CAST(SUM(y) AS BIGINT) AS k_b
  FROM scF GROUP BY 1),
tot AS (SELECT CAST(SUM(k_b) AS BIGINT) AS k FROM bins),
cum AS (
  SELECT a.b,
         CAST(SUM(x.n_b) AS BIGINT) AS n_ge,
         CAST(SUM(x.k_b) AS BIGINT) AS tp
  FROM bins a JOIN bins x ON x.b >= a.b GROUP BY 1),
pr AS (
  SELECT b, n_ge, tp,
         CAST(tp AS DOUBLE) / n_ge AS prec,
         CAST(tp AS DOUBLE) / k AS rec
  FROM cum CROSS JOIN tot)
SELECT ROUND(CAST(b AS DOUBLE) / 20.0, 2) AS threshold, n_ge, tp,
       ROUND(prec, 6) AS precision_,
       ROUND(rec, 6) AS recall_,
       ROUND(2 * prec * rec / nullif(prec + rec, 0), 6) AS f1
FROM pr ORDER BY b
"""


@query("pr_curve_classifier", oracle=_pr_curve_oracle(64, 3, 1.0))
def pr_curve_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 threshold sweep for the trained quality
    classifier — 20 score thresholds, each row scoring 'gate at p >=
    threshold': the operating-point picker that completes the
    classifier eval family (AUC = ranking, calibration/ECE =
    probability quality, gains/lift = budget depth, THIS = the actual
    cut a production quality gate ships).

    Determinism: same round-6 scores and shared trained vector
    (_trained_logreg_w — no retrain) as the calibration family; bins
    and cumulative counts are exact integers off the 20x20
    bucket-bounded self-join; ratios are single rounded divisions with
    a nullif(0) F1 guard.

    Scale: one scoring scan into 20 bins; everything after is
    bin-bounded."""
    from dawis_spark.operators.logreg import margin_expr

    emb = spark.table("embeddings")
    w = _trained_logreg_w(spark, sf_dir)
    p = f"round(1.0 / (1.0 + exp(-({margin_expr('embedding', w)}))), 6)"
    bins = (
        emb.selectExpr(f"cast({_LOGREG_Y_SPARK} as int) AS y", f"{p} AS p")
        .selectExpr("LEAST(CAST(FLOOR(p * 20) AS INT), 19) AS b", "y")
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_b"),
            F.sum("y").cast("bigint").alias("k_b"),
        )
    )
    tot = bins.agg(F.sum("k_b").cast("bigint").alias("k"))
    a = bins.select(F.col("b").alias("ab"))
    cum = (
        a.join(F.broadcast(bins), F.col("b") >= F.col("ab"))
        .groupBy("ab")
        .agg(
            F.sum("n_b").cast("bigint").alias("n_ge"),
            F.sum("k_b").cast("bigint").alias("tp"),
        )
    )
    pr = cum.crossJoin(F.broadcast(tot)).selectExpr(
        "ab AS b",
        "n_ge",
        "tp",
        "CAST(tp AS DOUBLE) / n_ge AS prec",
        "CAST(tp AS DOUBLE) / k AS rec",
    )
    return pr.selectExpr(
        "ROUND(CAST(b AS DOUBLE) / 20.0, 2) AS threshold",
        "n_ge",
        "tp",
        "ROUND(prec, 6) AS precision_",
        "ROUND(rec, 6) AS recall_",
        "ROUND(2 * prec * rec / nullif(prec + rec, 0), 6) AS f1",
    ).orderBy("threshold")


# Hurst R/S: per-(w, block) rescaled range uses EXACT-integer numerators:
# cumdev*w = w*cs - pos*s (bigint), D = w*sxx - s^2 (decimal38/HUGEINT),
# so rs = (max-min cumdev*w) / sqrt(D) pays exactly one double division
# + IEEE sqrt per block — identical in both engines.
_HURST_WS = (8, 16, 32)

_HURST_SLOPE = (
    "round((np * sxy - sx * sy) / nullif(np * sxx2 - sx * sx, 0), 6)"
)

_HURST_ORACLE = f"""
WITH {_DAILY_REV_ORDERS_CTE},
ix AS (
  SELECT rev AS x, ROW_NUMBER() OVER (ORDER BY d) AS t FROM daily),
blk AS (
  SELECT w.w, (t - 1) // w.w AS block, ((t - 1) % w.w) + 1 AS pos, x
  FROM ix, (SELECT unnest([{", ".join(str(w) for w in _HURST_WS)}]) AS w) w),
bstat AS (
  SELECT w, block, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(x) AS BIGINT) AS s,
         SUM(CAST(x AS HUGEINT) * x) AS sxx
  FROM blk GROUP BY 1, 2),
full_b AS (SELECT * FROM bstat WHERE cnt = w),
dev AS (
  SELECT b.w, b.block,
         b.w * SUM(r.x) OVER (PARTITION BY b.w, b.block ORDER BY r.pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - r.pos * b.s AS cd
  FROM blk r JOIN full_b b ON r.w = b.w AND r.block = b.block),
rng AS (
  SELECT w, block, CAST(MAX(cd) - MIN(cd) AS BIGINT) AS r_scaled
  FROM dev GROUP BY 1, 2),
rs AS (
  SELECT g.w, g.block,
         round(r.r_scaled / sqrt(CAST(nullif(g.w * g.sxx - CAST(g.s AS HUGEINT) * g.s, 0) AS DOUBLE)), 6) AS rs
  FROM full_b g JOIN rng r ON g.w = r.w AND g.block = r.block),
per_w AS (
  SELECT w, CAST(COUNT(rs) AS BIGINT) AS n_blocks,
         round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(rs ORDER BY block)), (a, e) -> a + e) / COUNT(rs), 6)
           AS rs_mean
  FROM rs WHERE rs IS NOT NULL GROUP BY 1),
pts AS (SELECT w, n_blocks, rs_mean, ln(CAST(w AS DOUBLE)) AS lx,
               ln(rs_mean) AS ly FROM per_w),
fit AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS np,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(lx ORDER BY w)), (a, e) -> a + e) AS sx,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(ly ORDER BY w)), (a, e) -> a + e) AS sy,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(lx * ly ORDER BY w)), (a, e) -> a + e) AS sxy,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(lx * lx ORDER BY w)), (a, e) -> a + e) AS sxx2
  FROM pts)
SELECT p.w, p.n_blocks, p.rs_mean, {_HURST_SLOPE} AS hurst
FROM pts p CROSS JOIN fit ORDER BY p.w
"""


@query("hurst_rescaled_range", oracle=_HURST_ORACLE)
def hurst_rescaled_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by classical rescaled-range (R/S) analysis over
    daily revenue (Hurst 1951; Mandelbrot & Wallis 1969): split the
    series into full blocks of w in {8, 16, 32} days, per block compute
    the range of cumulative mean-deviations over the block's std, and
    fit ln(mean R/S) against ln(w) — H ~ 0.5 is a memoryless walk,
    H > 0.5 long-range persistence, H < 0.5 mean reversion. The
    long-memory diagnostic beside Ljung-Box (short-lag autocorrelation)
    and Mann-Kendall (monotone trend).

    Exactness: per-block cumulative deviations are EXACT bigints
    (w*cumsum - pos*sum), the variance numerator w*sxx - s^2 is exact
    DECIMAL(38,0)/HUGEINT; each block pays ONE double division + IEEE
    sqrt, rounded to 6 before the block-ordered mean fold; the 3-point
    log-log OLS runs on ordered folds — bit-identical engines.

    Scale: the day-index window rides the calendar-bounded daily
    relation (whitelisted class); blocks are (w, block)-keyed; the fit
    is a 3-row relation."""
    from pyspark.sql import Window

    daily = (
        spark.table("orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("bigint")
            .alias("x")
        )
    )
    ix = daily.select("x", F.row_number().over(Window.orderBy("d")).alias("t"))
    ws = ", ".join(str(w) for w in _HURST_WS)
    blk = ix.selectExpr(
        f"explode(array({ws})) AS w", "t", "x"
    ).selectExpr("w", "(t - 1) div w AS block", "((t - 1) % w) + 1 AS pos", "x")
    bstat = blk.groupBy("w", "block").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(
            F.expr("cast(x as decimal(38,0)) * cast(x as decimal(38,0))")
        ).alias("sxx"),
    )
    full_b = bstat.filter(F.col("cnt") == F.col("w"))
    wb = Window.partitionBy("w", "block").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    dev = (
        blk.join(full_b.select("w", "block", "s", "sxx"), ["w", "block"])
        .withColumn("cs", F.sum("x").over(wb))
        .selectExpr("w", "block", "s", "sxx", "w * cs - pos * s AS cd")
    )
    rng = dev.groupBy("w", "block", "s", "sxx").agg(
        (F.max("cd") - F.min("cd")).cast("bigint").alias("r_scaled")
    )
    rs = rng.selectExpr(
        "w",
        "block",
        "round(r_scaled / sqrt(cast(nullif("
        "w * sxx - cast(s as decimal(38,0)) * s, 0) as double)), 6) AS rs",
    ).filter(F.col("rs").isNotNull())
    per_w = rs.groupBy("w").agg(
        F.count("rs").cast("bigint").alias("n_blocks"),
        F.expr(
            "round(aggregate(array_sort(collect_list(struct(block, rs))), "
            "cast(0.0 as double), (a, e) -> a + e.rs) / count(rs), 6)"
        ).alias("rs_mean"),
    )
    pts = per_w.selectExpr(
        "w", "n_blocks", "rs_mean",
        "ln(cast(w as double)) AS lx", "ln(rs_mean) AS ly",
    )
    fit = pts.agg(
        F.expr("cast(count(*) as double)").alias("np"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(w, lx))), "
            "cast(0.0 as double), (a, e) -> a + e.lx)"
        ).alias("sx"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(w, ly))), "
            "cast(0.0 as double), (a, e) -> a + e.ly)"
        ).alias("sy"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(w, lx * ly as v))), "
            "cast(0.0 as double), (a, e) -> a + e.v)"
        ).alias("sxy"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(w, lx * lx as v))), "
            "cast(0.0 as double), (a, e) -> a + e.v)"
        ).alias("sxx2"),
    )
    return (
        pts.crossJoin(F.broadcast(fit))
        .selectExpr("w", "n_blocks", "rs_mean", f"{_HURST_SLOPE} AS hurst")
        .orderBy("w")
    )


from dawis_spark.operators.stats import (  # noqa: E402
    ANOVA_ETA2 as _BF_ETA2,
    ANOVA_F as _BF_F,
    ANOVA_SSB as _BF_SSB,
    ANOVA_SSW as _BF_SSW,
    ES_D as _ES_D,
    ES_G as _ES_G,
    KW_H as _KW_H,
    KW_HC as _KW_HC,
)

_KW_ORACLE = f"""
WITH gv AS (
  SELECT o_orderpriority AS g, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v,
         CAST(COUNT(*) AS BIGINT) AS n_gv
  FROM orders GROUP BY 1, 2),
per_v AS (SELECT v, CAST(SUM(n_gv) AS BIGINT) AS t_v FROM gv GROUP BY 1),
ranked AS (
  SELECT v, t_v,
         COALESCE(SUM(t_v) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM per_v),
per_g AS (
  SELECT g, CAST(SUM(n_gv) AS BIGINT) AS n_g,
         SUM((2 * (r.before + 1) + (r.t_v - 1)) / 2.0 * n_gv) AS r_g
  FROM gv JOIN ranked r USING (v) GROUP BY 1),
ties AS (
  SELECT CAST(SUM(t_v) AS BIGINT) AS n_i,
         SUM(CAST(t_v AS HUGEINT) * t_v * t_v - t_v) AS tie_cubes
  FROM ranked),
terms AS (SELECT g, r_g * r_g / n_g AS t_g FROM per_g),
folded AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k_i,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(t_g ORDER BY g)),
                     (acc, e) -> acc + e) AS sum_t
  FROM terms),
d AS (
  SELECT k_i, n_i, CAST(n_i AS DOUBLE) AS n, sum_t,
         CAST(tie_cubes AS DOUBLE) AS tie_cubes_d
  FROM folded, ties)
SELECT CAST(k_i AS INT) AS k_groups, CAST(n_i AS BIGINT) AS n_rows,
       ROUND({_KW_H}, 6) AS h, ROUND({_KW_HC}, 6) AS h_tie_corrected
FROM d
"""


@query("kruskal_wallis_priority", oracle=_KW_ORACLE)
def kruskal_wallis_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H across ALL FIVE order priorities — the k-group
    rank test that sits between mann_whitney_drift (2 groups, ranks)
    and anova_order_value_priority (k groups, means): 'does order value
    differ across ANY priority' without normality assumptions.

    Exactness: average tie ranks are .5-exact dyadics, rank sums exact
    dyadic*int accumulations, tie cubes exact HUGEINT/DECIMAL38; H and
    its tie correction are shared expression strings over the same
    doubles (operators/stats.py:KW_H/KW_HC).

    Scale: one (group, value) aggregate, then the distinct-cents rank
    walk (value-bounded domain — the mann_whitney adjudication) and a
    5-row ordered fold."""
    from dawis_spark.operators.stats import kruskal_wallis

    o = spark.table("orders").select(
        "o_orderpriority",
        F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").alias("cents"),
    )
    return kruskal_wallis(o, "cents", "o_orderpriority")


_BF_ORACLE = f"""
WITH base AS (
  SELECT o_orderpriority AS g, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v
  FROM orders),
gv AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY 1, 2),
cum AS (
  SELECT g, v, c,
         COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before,
         SUM(c) OVER (PARTITION BY g) AS n_g
  FROM gv),
pos AS (SELECT *, (n_g + 1) // 2 AS lo, n_g // 2 + 1 AS hi FROM cum),
vlo AS (SELECT g, MIN(v) AS vlo FROM pos
        WHERE before < lo AND lo <= before + c GROUP BY 1),
vhi AS (SELECT g, MIN(v) AS vhi FROM pos
        WHERE before < hi AND hi <= before + c GROUP BY 1),
med AS (SELECT g, CAST(vlo + vhi AS BIGINT) AS m2
        FROM vlo JOIN vhi USING (g)),
dev AS (
  SELECT base.g AS g, CAST(ABS(2 * base.v - med.m2) AS HUGEINT) AS d
  FROM base JOIN med USING (g)),
per AS (
  SELECT g, CAST(COUNT(*) AS HUGEINT) AS n_g, SUM(d) AS s_g,
         SUM(d * d) AS q_g
  FROM dev GROUP BY 1),
terms AS (
  SELECT g, n_g, s_g, q_g,
         CAST(s_g * s_g AS DOUBLE) / CAST(n_g AS DOUBLE) AS t_g
  FROM per),
folded AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k_i, SUM(n_g) AS n_i, SUM(s_g) AS s_i,
         SUM(q_g) AS q_i,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(t_g ORDER BY g)),
                     (acc, e) -> acc + e) AS sum_tg
  FROM terms),
d2 AS (
  SELECT k_i, n_i, CAST(k_i AS DOUBLE) AS k, CAST(n_i AS DOUBLE) AS n,
         CAST(q_i AS DOUBLE) AS q,
         CAST(s_i * s_i AS DOUBLE) / CAST(n_i AS DOUBLE) AS ss_over_n,
         sum_tg
  FROM folded)
SELECT CAST(k_i AS INT) AS k_groups, CAST(n_i AS BIGINT) AS n_rows,
       ROUND({_BF_SSB}, 4) AS ssb, ROUND({_BF_SSW}, 4) AS ssw,
       ROUND({_BF_F}, 6) AS f_stat, ROUND({_BF_ETA2}, 6) AS eta_squared
FROM d2
"""


@query("brown_forsythe_priority", oracle=_BF_ORACLE)
def brown_forsythe_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe homogeneity-of-variance: does order-value SPREAD
    differ across priorities? ANOVA's equal-variance assumption gets
    its own test (the median-centred Levene variant — robust to the
    heavy-tailed price distribution); run it before trusting
    anova_order_value_priority's F.

    Exactness: per-group medians are exact order statistics on the
    doubled-median trick (|2x - 2m| stays integer, even-count medians
    included); the deviation ANOVA reuses anova_oneway's exact-moment
    ordered fold verbatim.

    Scale: the median walk is group-partitioned over distinct cents
    (value-bounded); medians broadcast back; one exact-moment
    aggregate ends it."""
    from dawis_spark.operators.stats import brown_forsythe

    o = spark.table("orders").select(
        "o_orderpriority",
        F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").alias("cents"),
    )
    return brown_forsythe(o, "o_orderpriority", "cents")


_ES_ORACLE = f"""
WITH tagged AS (
  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS ia,
         CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS ib
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
moments AS (
  SELECT CAST(SUM(ia) AS HUGEINT) AS na_i, CAST(SUM(ib) AS HUGEINT) AS nb_i,
         SUM(CAST(v AS HUGEINT) * ia) AS sa_i,
         SUM(CAST(v AS HUGEINT) * ib) AS sb_i,
         SUM(CAST(v AS HUGEINT) * v * ia) AS qa_i,
         SUM(CAST(v AS HUGEINT) * v * ib) AS qb_i
  FROM tagged),
per_v AS (
  SELECT v, CAST(SUM(ia) AS BIGINT) AS na_v, CAST(SUM(ib) AS BIGINT) AS nb_v
  FROM tagged GROUP BY 1),
walked AS (
  SELECT na_v, nb_v,
         COALESCE(SUM(nb_v) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b_before
  FROM per_v),
pairs AS (
  SELECT SUM(CAST(na_v AS HUGEINT) * b_before) AS gt_pairs,
         SUM(CAST(na_v AS HUGEINT) * nb_v) AS eq_pairs
  FROM walked)
SELECT CAST(na_i AS BIGINT) AS n_a, CAST(nb_i AS BIGINT) AS n_b,
       ROUND(CAST(sa_i AS DOUBLE) / na_i - CAST(sb_i AS DOUBLE) / nb_i, 4)
         AS mean_diff,
       ROUND({_ES_D}, 6) AS cohens_d,
       ROUND({_ES_G}, 6) AS hedges_g,
       ROUND(CAST(gt_pairs - (na_i * nb_i - gt_pairs - eq_pairs) AS DOUBLE)
             / CAST(na_i * nb_i AS DOUBLE), 6) AS cliffs_delta
FROM moments, pairs
"""


@query("effect_sizes_urgent_vs_low", oracle=_ES_ORACLE)
def effect_sizes_urgent_vs_low(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample EFFECT SIZES for URGENT vs LOW order values: Cohen's
    d (pooled-sd standardized mean difference), Hedges' g (the
    small-sample correction), and Cliff's delta (ordinal dominance,
    the effect-size twin of mann_whitney_drift's U). Significance
    tests say 'is there a difference'; at warehouse n everything is
    significant — these say HOW BIG.

    Exactness: moments and dominance pair counts are exact
    HUGEINT/DECIMAL38 integers (the rank trick counts a>b pairs with
    no quadratic pass); d and g are shared fixed expressions
    (operators/stats.py:ES_D/ES_G); delta is one division.

    Scale: one conditional-moment scan + the distinct-cents walk
    (value-bounded domain); output is one row."""
    from dawis_spark.operators.stats import two_sample_effect_sizes

    o = spark.table("orders").select(
        "o_orderpriority",
        F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").alias("cents"),
    )
    return two_sample_effect_sizes(
        o, "cents", "o_orderpriority", "1-URGENT", "5-LOW"
    )


_GTEST_ORACLE = """
WITH cells AS (
  SELECT event_type AS r, isodow(ts) AS c, CAST(COUNT(*) AS BIGINT) AS obs
  FROM events GROUP BY 1, 2),
rows_m AS (SELECT r, CAST(SUM(obs) AS BIGINT) AS row_n FROM cells GROUP BY 1),
cols_m AS (SELECT c, CAST(SUM(obs) AS BIGINT) AS col_n FROM cells GROUP BY 1),
tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells),
scored AS (
  SELECT rm.r, cm.c, CAST(COALESCE(obs, 0) AS BIGINT) AS obs, row_n, col_n, n
  FROM rows_m rm CROSS JOIN cols_m cm
  LEFT JOIN cells ON cells.r = rm.r AND cells.c = cm.c
  CROSS JOIN tot),
terms AS (
  SELECT r, c,
         CASE WHEN obs > 0 THEN
           2.0 * CAST(obs AS DOUBLE)
               * ln(CAST(CAST(obs AS HUGEINT) * n AS DOUBLE)
                    / CAST(CAST(row_n AS HUGEINT) * col_n AS DOUBLE))
         ELSE 0.0 END AS g_term
  FROM scored)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST((COUNT(DISTINCT r) - 1) * (COUNT(DISTINCT c) - 1) AS BIGINT) AS dof,
       ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(g_term ORDER BY r, c)), (acc, e) -> acc + e), 6) AS g2
FROM terms
"""


@query("g_test_independence_dow", oracle=_GTEST_ORACLE)
def g_test_independence_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Likelihood-ratio G-test for event_type x ISO-weekday — the
    log-likelihood sibling of chi_square_independence on the same
    table: G = 2*sum obs*ln(obs/expected) behaves better on sparse
    tables and is ADDITIVE across table partitions (so a per-shard
    G-test sums to the global one — the property that matters for a
    distributed monitoring rollup; Pearson chi-square has no such
    decomposition).

    Exactness/scale: identical construction to the chi-square query —
    exact-integer complete contingency (zero cells contribute 0 via
    the 0*ln(0) convention), one ln per cell, ordered (row, col) fold;
    |types| x 7 cells end-to-end."""
    from dawis_spark.operators.stats import g_test_independence

    e = spark.table("events").select(
        "event_type", (F.weekday("ts") + 1).alias("dow")
    )
    return g_test_independence(e, "event_type", "dow")


@query(
    "linear_attribution",
    oracle=_journeys.linear_attribution_oracle_sql("purchase"),
)
def linear_attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (even-split) multi-touch attribution — the maximum-
    entropy baseline of the MTA family (asof_last_click = last-touch,
    position_attribution = U-shaped, time_decay_attribution = recency,
    shapley/markov = data-driven): every touch of a converting journey
    earns value/n. Integer-ppm weights with the flooring remainder on
    the first touch keep every credit an exact BIGINT micro-unit.
    Scale: one user-hashed journey-index exchange; co-keyed
    touch<->conversion join; event-type-sized output."""
    return _journeys.linear_attribution(
        spark.table("events"), "purchase"
    ).orderBy("touch_type")


@query(
    "time_decay_attribution",
    oracle=_journeys.time_decay_oracle_sql("purchase", 7),
)
def time_decay_attribution_credit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Time-decay multi-touch attribution with a 7-day DISCRETE
    half-life: a touch's weight halves for every full week between it
    and the conversion it feeds — the recency-weighted model between
    last-click (all recency) and linear (none). Discrete halving keeps
    weights exact integers (continuous 2^(-dt/hl) pays an
    engine-specific pow ulp exactly where a rounding boundary can
    flip); per-journey normalization is one exact floor-division per
    touch, sub-cent remainders dropped (documented in
    operators/journeys.py).

    Scale: same shape as the other MTA models — one user-hashed
    exchange, co-keyed join, per-journey window on the co-partitioned
    key, event-type-sized output."""
    return _journeys.time_decay_attribution(
        spark.table("events"), "purchase", half_life_days=7
    ).orderBy("touch_type")


_NA_ORACLE = """
WITH du AS (
  SELECT user_id, date_trunc('day', ts) AS day FROM events),
pu AS (SELECT user_id, MIN(day) AS fd, MAX(day) AS ld FROM du GROUP BY 1),
hz AS (SELECT MAX(day) AS h FROM du),
dur AS (
  SELECT CAST(date_diff('day', fd, ld) AS BIGINT) AS duration,
         (ld <= h - INTERVAL 1 DAY) AS churn
  FROM pu, hz),
g AS (
  SELECT duration, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN churn THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM dur GROUP BY 1),
arr AS (
  SELECT list(struct_pack(duration := duration, c := c, d := d)
              ORDER BY duration) AS a,
         CAST(SUM(c) AS BIGINT) AS N
  FROM g),
idx AS (SELECT UNNEST(range(1, len(a) + 1)) AS i, a, N FROM arr),
folded AS (
  SELECT CAST(a[i].duration AS BIGINT) AS duration,
         N - list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(a[1:i-1], x -> x.c)), (p, q) -> p + q) AS at_risk,
         a[i].d AS churned, a[i].c - a[i].d AS censored,
         list_reduce(
           list_prepend(struct_pack(h := CAST(0.0 AS DOUBLE),
                                    seen := CAST(0 AS BIGINT)),
                        list_transform(a[1:i],
                          x -> struct_pack(h := CAST(x.d AS DOUBLE), seen := x.c))),
           (acc, x) -> struct_pack(
             h := acc.h + x.h / CAST(N - acc.seen AS DOUBLE),
             seen := acc.seen + x.seen)).h AS h_raw
  FROM idx)
SELECT duration, at_risk, churned, censored,
       ROUND(h_raw, 9) AS cum_hazard,
       ROUND(exp(-h_raw), 9) AS survival_na
FROM folded
ORDER BY duration
"""


@query("nelson_aalen_hazard", oracle=_NA_ORACLE)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NELSON-AALEN cumulative hazard over user lifetimes (Nelson 1972;
    Aalen 1978) — the additive twin of kaplan_meier_retention on the
    same right-censored duration relation: H(t) = sum_{t_i <= t}
    d_i/n_i, with the Fleming-Harrington survival transform
    exp(-H(t)) alongside (the better small-risk-set estimator of the
    same curve KM estimates by products).

    Exactness: identical censoring/duration machinery to KM (exact
    bigint d_i, n_i); the hazard is a LEFT FOLD of one-division terms
    over the duration-sorted array with the (derived-first, counter-
    last) struct-accumulator field order the KM oracle pinned for
    DuckDB's list_reduce; ROUND(,9) on output; exp is evaluated on the
    identical folded double in both engines (the kde precedent).

    Scale: one user-keyed aggregate, then the duration-bounded fold —
    no partition-less window, nothing row-scale past the first
    exchange."""
    e = spark.table("events").select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    )
    pu = e.groupBy("user_id").agg(
        F.min("day").alias("fd"), F.max("day").alias("ld")
    )
    hz = e.agg(F.max("day").alias("h"))
    dur = pu.crossJoin(F.broadcast(hz)).select(
        F.datediff("ld", "fd").cast("bigint").alias("duration"),
        F.expr("ld <= h - interval 1 days").alias("churn"),
    )
    g = dur.groupBy("duration").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum(F.when(F.col("churn"), 1).otherwise(0)).cast("bigint").alias("d"),
    )
    arr = g.agg(
        F.sort_array(F.collect_list(F.struct("duration", "c", "d"))).alias("a"),
        F.sum("c").cast("bigint").alias("N"),
    )
    rows = arr.select(
        F.explode(
            F.expr(
                "transform(a, (x, i) -> struct("
                "x.duration AS duration, "
                "N - aggregate(slice(a, 1, i), cast(0 as bigint), "
                "(p, y) -> p + y.c) AS at_risk, "
                "x.d AS churned, x.c - x.d AS censored, "
                "aggregate(slice(a, 1, i + 1), "
                "named_struct('seen', cast(0 as bigint), 'h', cast(0.0 as double)), "
                "(acc, y) -> named_struct('seen', acc.seen + y.c, "
                "'h', acc.h + y.d / cast(N - acc.seen as double))).h "
                "AS h_raw))"
            )
        ).alias("r")
    )
    return rows.select(
        F.col("r.duration").alias("duration"),
        F.col("r.at_risk").alias("at_risk"),
        F.col("r.churned").alias("churned"),
        F.col("r.censored").alias("censored"),
        F.round("r.h_raw", 9).alias("cum_hazard"),
        F.round(F.exp(-F.col("r.h_raw")), 9).alias("survival_na"),
    ).orderBy("duration")


def _hl_oracle(dim: int, iters: int, lr: float) -> str:
    dot = _VEC.dot("xs", "wl", "duck")
    return f"""
WITH {_logreg_chain_ctes(dim, iters, lr, _LOGREG_SAMPLE_LIMIT)},
wlF AS (SELECT list(weight ORDER BY dim) AS wl FROM w{iters}),
scF AS MATERIALIZED (
  SELECT CAST(v.y AS INT) AS y,
         round(1.0 / (1.0 + exp(-(round({dot}, 6)))), 6) AS p
  FROM v, wlF),
bins AS (
  SELECT LEAST(CAST(FLOOR(p * 10) AS INT), 9) AS b,
         CAST(COUNT(*) AS BIGINT) AS n_b,
         CAST(SUM(y) AS BIGINT) AS o_b,
         CAST(SUM(CAST(ROUND(p * 1000000, 0) AS BIGINT)) AS BIGINT) AS e_micro
  FROM scF GROUP BY 1),
terms AS (
  SELECT b, n_b, o_b, e_micro,
         CAST(e_micro AS DOUBLE) / CAST(1000000 AS DOUBLE) AS e,
         (o_b - CAST(e_micro AS DOUBLE) / CAST(1000000 AS DOUBLE))
           * (o_b - CAST(e_micro AS DOUBLE) / CAST(1000000 AS DOUBLE))
           / nullif(CAST(e_micro AS DOUBLE) / CAST(1000000 AS DOUBLE)
                    * (1.0 - CAST(e_micro AS DOUBLE) / CAST(1000000 AS DOUBLE)
                             / n_b), 0) AS t
  FROM bins),
hl AS (
  SELECT CAST(COUNT(*) AS BIGINT) - 2 AS dof,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(t ORDER BY b)),
                     (a, e) -> a + e) AS hl_raw
  FROM terms)
SELECT ROUND(CAST(b AS DOUBLE) / 10.0, 1) AS bin_lo, n_b,
       o_b AS observed, ROUND(e, 4) AS expected,
       ROUND(hl_raw, 6) AS hl_stat, dof
FROM terms CROSS JOIN hl ORDER BY b
"""


@query("hosmer_lemeshow_classifier", oracle=_hl_oracle(64, 3, 1.0))
def hosmer_lemeshow_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hosmer-Lemeshow goodness-of-fit for the trained quality
    classifier: per probability bin, observed positives vs the sum of
    predicted probabilities, with HL chi-square = sum (O-E)^2/(E(1-E/n))
    over bins (dof = bins-2). ECE asks 'how FAR off is the calibration
    on average'; HL asks 'is the miscalibration STATISTICALLY
    significant' — the pair a model-validation report prints together.
    Fixed-width decile bins (the ECE/gains discipline) rather than the
    classical equal-count deciles, so the bin edges are score-defined
    constants, not data-order artifacts — documented variant.

    Determinism: shared trained vector (_trained_logreg_w — no
    retrain); expected counts are EXACT integer micro-sums
    (round(p*1e6) per row — p is already round-6 so the micro value is
    exact), so E carries no float-accumulation order; the HL sum is a
    bin-ordered fold.

    Scale: one scoring scan into 10 bins; bin-bounded after."""
    from dawis_spark.operators.logreg import margin_expr

    emb = spark.table("embeddings")
    w = _trained_logreg_w(spark, sf_dir)
    p = f"round(1.0 / (1.0 + exp(-(round({margin_expr('embedding', w)}, 6)))), 6)"
    bins = (
        emb.selectExpr(f"cast({_LOGREG_Y_SPARK} as int) AS y", f"{p} AS p")
        .selectExpr("LEAST(CAST(FLOOR(p * 10) AS INT), 9) AS b", "y", "p")
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_b"),
            F.sum("y").cast("bigint").alias("o_b"),
            F.sum(F.expr("CAST(ROUND(p * 1000000, 0) AS BIGINT)"))
            .cast("bigint")
            .alias("e_micro"),
        )
    )
    terms = bins.selectExpr(
        "b",
        "n_b",
        "o_b",
        "CAST(e_micro AS DOUBLE) / CAST(1000000 AS DOUBLE) AS e",
        "(o_b - CAST(e_micro AS DOUBLE) / CAST(1000000 AS DOUBLE))"
        " * (o_b - CAST(e_micro AS DOUBLE) / CAST(1000000 AS DOUBLE))"
        " / nullif(CAST(e_micro AS DOUBLE) / CAST(1000000 AS DOUBLE)"
        "          * (1.0 - CAST(e_micro AS DOUBLE) / CAST(1000000 AS DOUBLE)"
        "                   / n_b), 0) AS t",
    )
    hl = terms.agg(
        (F.count(F.lit(1)).cast("bigint") - 2).alias("dof"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(b, t))), "
            "cast(0.0 as double), (a, e) -> a + e.t)"
        ).alias("hl_raw"),
    )
    return (
        terms.crossJoin(F.broadcast(hl))
        .selectExpr(
            "ROUND(CAST(b AS DOUBLE) / 10.0, 1) AS bin_lo",
            "n_b",
            "o_b AS observed",
            "ROUND(e, 4) AS expected",
            "ROUND(hl_raw, 6) AS hl_stat",
            "dof",
        )
        .orderBy("bin_lo")
    )


def _ks_clf_oracle(dim: int, iters: int, lr: float) -> str:
    dot = _VEC.dot("xs", "wl", "duck")
    return f"""
WITH {_logreg_chain_ctes(dim, iters, lr, _LOGREG_SAMPLE_LIMIT)},
wlF AS (SELECT list(weight ORDER BY dim) AS wl FROM w{iters}),
scF AS MATERIALIZED (
  SELECT CAST(v.y AS INT) AS y,
         round(1.0 / (1.0 + exp(-(round({dot}, 6)))), 6) AS p
  FROM v, wlF),
per_p AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS n_p, CAST(SUM(y) AS BIGINT) AS k_p
  FROM scF GROUP BY 1),
tot AS (
  SELECT CAST(SUM(n_p) AS BIGINT) AS nn, CAST(SUM(k_p) AS BIGINT) AS pp
  FROM per_p),
walk AS (
  SELECT p,
         SUM(k_p) OVER (ORDER BY p DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_k,
         SUM(n_p) OVER (ORDER BY p DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
  FROM per_p),
scored AS (
  SELECT p, CAST(cum_k AS DOUBLE) / pp
            - CAST(cum_n - cum_k AS DOUBLE) / (nn - pp) AS diff,
         nn, pp
  FROM walk CROSS JOIN tot)
SELECT nn AS n_docs, pp AS positives,
       ROUND(diff, 6) AS ks_stat, p AS at_threshold
FROM scored ORDER BY diff DESC, p DESC LIMIT 1
"""


@query("ks_statistic_classifier", oracle=_ks_clf_oracle(64, 3, 1.0))
def ks_statistic_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov-Smirnov separation statistic for the trained quality
    classifier: max over thresholds of TPR - FPR — the credit-scoring
    industry's standard single-number separation measure, read off the
    same score distribution AUC integrates (AUC = average separation,
    KS = worst-case-best separation; pr_curve = the operating points
    between). Returns the statistic AND the score threshold achieving
    it.

    Determinism: shared trained vector, round-6 scores; cumulative
    positive/negative counts are exact integers over the distinct-score
    walk; TPR/FPR pay one division each; the argmax orders identical
    doubles with a (diff, p) tie-break.

    Scale: one scoring scan collapses to the distinct rounded-score
    relation (value-bounded [0,1] at the 1e-6 grid); the walk and the
    TakeOrdered(1) live there."""
    from pyspark.sql import Window

    from dawis_spark.operators.logreg import margin_expr

    emb = spark.table("embeddings")
    w = _trained_logreg_w(spark, sf_dir)
    p = f"round(1.0 / (1.0 + exp(-(round({margin_expr('embedding', w)}, 6)))), 6)"
    per_p = (
        emb.selectExpr(f"cast({_LOGREG_Y_SPARK} as int) AS y", f"{p} AS p")
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_p"),
            F.sum("y").cast("bigint").alias("k_p"),
        )
    )
    tot = per_p.agg(
        F.sum("n_p").cast("bigint").alias("nn"),
        F.sum("k_p").cast("bigint").alias("pp"),
    )
    wd = Window.orderBy(F.desc("p")).rowsBetween(Window.unboundedPreceding, 0)
    walk = per_p.select(
        "p",
        F.sum("k_p").over(wd).alias("cum_k"),
        F.sum("n_p").over(wd).alias("cum_n"),
    )
    scored = walk.crossJoin(F.broadcast(tot)).selectExpr(
        "p",
        "CAST(cum_k AS DOUBLE) / pp"
        " - CAST(cum_n - cum_k AS DOUBLE) / (nn - pp) AS diff",
        "nn",
        "pp",
    )
    return (
        scored.orderBy(F.desc("diff"), F.desc("p"))
        .limit(1)
        .selectExpr(
            "nn AS n_docs",
            "pp AS positives",
            "ROUND(diff, 6) AS ks_stat",
            "p AS at_threshold",
        )
    )


_MI_FEATURES_SPARK = [
    ("status", "o_orderstatus"),
    ("month", "CAST(MONTH(o_orderdate) AS STRING)"),
    ("price_band", "CAST(LEAST(CAST(o_totalprice AS BIGINT) div 50000, 5) AS STRING)"),
]
_MI_FEATURES_DUCK = [
    ("status", "o_orderstatus"),
    ("month", "CAST(MONTH(o_orderdate) AS VARCHAR)"),
    ("price_band", "CAST(LEAST(CAST(o_totalprice AS BIGINT) // 50000, 5) AS VARCHAR)"),
]
_MI_Y = "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END"

_MI_ORACLE = f"""
WITH long AS (
  {" UNION ALL ".join(
      f"SELECT '{name}' AS feature, {expr} AS level, {_MI_Y} AS y FROM orders"
      for name, expr in _MI_FEATURES_DUCK
  )}),
cells AS (
  SELECT feature, level, y, CAST(COUNT(*) AS BIGINT) AS c
  FROM long GROUP BY 1, 2, 3),
lv AS (SELECT feature, level, CAST(SUM(c) AS BIGINT) AS c_lv
       FROM cells GROUP BY 1, 2),
ym AS (SELECT feature, y, CAST(SUM(c) AS BIGINT) AS c_y
       FROM cells GROUP BY 1, 2),
nm AS (SELECT feature, CAST(SUM(c) AS BIGINT) AS n FROM cells GROUP BY 1),
terms AS (
  SELECT c.feature, c.level, c.y,
         CAST(c.c AS DOUBLE) / nm.n
           * ln(CAST(CAST(c.c AS HUGEINT) * nm.n AS DOUBLE)
                / CAST(CAST(lv.c_lv AS HUGEINT) * ym.c_y AS DOUBLE)) AS mi_t
  FROM cells c
  JOIN lv USING (feature, level) JOIN ym USING (feature, y)
  JOIN nm USING (feature)),
hy AS (
  SELECT feature,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(-(CAST(c_y AS DOUBLE) / n) * ln(CAST(c_y AS DOUBLE) / n)
                ORDER BY y)), (a, e) -> a + e) AS h_y
  FROM ym JOIN nm USING (feature) GROUP BY 1),
mi AS (
  SELECT feature,
         CAST(COUNT(DISTINCT level) AS BIGINT) AS n_levels,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(mi_t ORDER BY level, y)), (a, e) -> a + e) AS mi_raw
  FROM terms GROUP BY 1)
SELECT mi.feature, mi.n_levels, ROUND(mi_raw, 6) AS mi_nats,
       ROUND(mi_raw / nullif(h_y, 0), 6) AS info_gain_ratio
FROM mi JOIN hy USING (feature)
ORDER BY mi_nats DESC, feature
"""


@query("mutual_info_feature_rank", oracle=_MI_ORACLE)
def mutual_info_feature_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-information FEATURE RANKING against the urgency label:
    which of (order status, order month, price band) carries the most
    information about '1-URGENT'? The filter-method feature-selection
    pass a classifier pipeline runs before training — MI in nats plus
    the label-entropy-normalized gain ratio (comparable across
    features with different level counts). categorical_association
    profiles ONE pair in depth; this ranks MANY features on one scan
    each.

    Exactness: all cell/margin counts exact integers (zero cells
    contribute 0 to MI by the 0*ln(0) convention — no completion
    needed, unlike chi-square); each term pays one ln of an
    exact-integer ratio; per-feature sums are (level, y)-ordered folds;
    the final ranking orders identical doubles with a feature
    tie-break.

    Scale: one union scan per feature (3 scans of one column each,
    map-side collapsed to category-bounded cells); margins join
    feature-keyed bounded relations; output is |features| rows."""
    e = spark.table("orders")
    long = None
    for name, expr in _MI_FEATURES_SPARK:
        part = e.selectExpr(
            f"'{name}' AS feature", f"{expr} AS level", f"{_MI_Y} AS y"
        )
        long = part if long is None else long.unionAll(part)
    cells = long.groupBy("feature", "level", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    lv = cells.groupBy("feature", "level").agg(
        F.sum("c").cast("bigint").alias("c_lv")
    )
    ym = cells.groupBy("feature", "y").agg(
        F.sum("c").cast("bigint").alias("c_y")
    )
    nm = cells.groupBy("feature").agg(F.sum("c").cast("bigint").alias("n"))
    terms = (
        cells.join(lv, ["feature", "level"])
        .join(ym, ["feature", "y"])
        .join(F.broadcast(nm), "feature")
        .selectExpr(
            "feature",
            "level",
            "y",
            "CAST(c AS DOUBLE) / n"
            " * ln(CAST(CAST(c AS DECIMAL(38,0)) * n AS DOUBLE)"
            "      / CAST(CAST(c_lv AS DECIMAL(38,0)) * c_y AS DOUBLE)) AS mi_t",
        )
    )
    hy = (
        ym.join(F.broadcast(nm), "feature")
        .selectExpr(
            "feature",
            "y",
            "-(CAST(c_y AS DOUBLE) / n) * ln(CAST(c_y AS DOUBLE) / n) AS h_t",
        )
        .groupBy("feature")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(y, h_t))), "
                "cast(0.0 as double), (a, e) -> a + e.h_t)"
            ).alias("h_y")
        )
    )
    mi = terms.groupBy("feature").agg(
        F.countDistinct("level").cast("bigint").alias("n_levels"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(level, y, mi_t))), "
            "cast(0.0 as double), (a, e) -> a + e.mi_t)"
        ).alias("mi_raw"),
    )
    return (
        mi.join(hy, "feature")
        .selectExpr(
            "feature",
            "n_levels",
            "ROUND(mi_raw, 6) AS mi_nats",
            "ROUND(mi_raw / nullif(h_y, 0), 6) AS info_gain_ratio",
        )
        .orderBy(F.desc("mi_nats"), "feature")
    )


# AR(2) normal equations solved by Cramer's rule: rows of the design
# moment matrix are (m, su, sv | sy), (su, suu, suv | suy),
# (sv, suv, svv | svy). Shared det-expression strings evaluated by both
# engines over the SAME doubles cast once from exact-integer moments.
_AR2_DET = "(m*(suu*svv - suv*suv) - su*(su*svv - suv*sv) + sv*(su*suv - suu*sv))"
_AR2_C = "(sy*(suu*svv - suv*suv) - su*(suy*svv - suv*svy) + sv*(suy*suv - suu*svy))"
_AR2_P1 = "(m*(suy*svv - suv*svy) - sy*(su*svv - suv*sv) + sv*(su*svy - suy*sv))"
_AR2_P2 = "(m*(suu*svy - suy*suv) - su*(su*svy - suy*sv) + sy*(su*suv - suu*sv))"
_AR2_H = 7


def _ar2_oracle() -> str:
    steps = ["s1 AS (SELECT c0, p1, p2, c0 + p1*xn + p2*xnm1 AS f, xn AS fp FROM coef)"]
    for h in range(2, _AR2_H + 1):
        steps.append(
            f"s{h} AS (SELECT c0, p1, p2, c0 + p1*f + p2*fp AS f, f AS fp FROM s{h-1})"
        )
    outs = " UNION ALL ".join(
        f"SELECT {h} AS h, ROUND(f / 100, 2) AS forecast, ROUND(p1, 6) AS phi1,"
        f" ROUND(p2, 6) AS phi2, ROUND(c0, 4) AS intercept_cents FROM s{h}"
        for h in range(1, _AR2_H + 1)
    )
    return f"""
WITH {_DAILY_REV_ORDERS_CTE},
ix AS (
  SELECT rev AS x, ROW_NUMBER() OVER (ORDER BY d) AS t FROM daily),
lagged AS (
  SELECT x AS y,
         lag(x, 1) OVER (ORDER BY t) AS u,
         lag(x, 2) OVER (ORDER BY t) AS v
  FROM ix),
mom AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS m_i,
         SUM(CAST(u AS HUGEINT)) AS su_i, SUM(CAST(v AS HUGEINT)) AS sv_i,
         SUM(CAST(y AS HUGEINT)) AS sy_i,
         SUM(CAST(u AS HUGEINT) * u) AS suu_i,
         SUM(CAST(v AS HUGEINT) * v) AS svv_i,
         SUM(CAST(u AS HUGEINT) * v) AS suv_i,
         SUM(CAST(u AS HUGEINT) * y) AS suy_i,
         SUM(CAST(v AS HUGEINT) * y) AS svy_i
  FROM lagged WHERE u IS NOT NULL AND v IS NOT NULL),
seeds AS (
  SELECT CAST(MAX(CASE WHEN t = (SELECT MAX(t) FROM ix) THEN x END) AS DOUBLE) AS xn,
         CAST(MAX(CASE WHEN t = (SELECT MAX(t) FROM ix) - 1 THEN x END) AS DOUBLE) AS xnm1
  FROM ix),
md AS (
  SELECT CAST(m_i AS DOUBLE) AS m, CAST(su_i AS DOUBLE) AS su,
         CAST(sv_i AS DOUBLE) AS sv, CAST(sy_i AS DOUBLE) AS sy,
         CAST(suu_i AS DOUBLE) AS suu, CAST(svv_i AS DOUBLE) AS svv,
         CAST(suv_i AS DOUBLE) AS suv, CAST(suy_i AS DOUBLE) AS suy,
         CAST(svy_i AS DOUBLE) AS svy
  FROM mom),
coef AS (
  SELECT {_AR2_C} / nullif({_AR2_DET}, 0) AS c0,
         {_AR2_P1} / nullif({_AR2_DET}, 0) AS p1,
         {_AR2_P2} / nullif({_AR2_DET}, 0) AS p2,
         xn, xnm1
  FROM md, seeds),
{", ".join(steps)}
SELECT * FROM ({outs}) ORDER BY h
"""


@query("ar2_forecast_daily", oracle=_ar2_oracle())
def ar2_forecast_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(2) autoregressive fit + 7-day recursive forecast over daily
    revenue — the classical Box-Jenkins member of the forecast family
    (holt_linear = trend smoothing, holt_winters = seasonal smoothing,
    THIS = lag regression: tomorrow as a linear function of the last
    two days). Coefficients come from the exact normal equations
    (OLS with intercept on x_{{t-1}}, x_{{t-2}}), solved by Cramer's
    rule.

    Determinism: all nine moments are exact HUGEINT/DECIMAL38
    integers; the three 3x3 determinants are SHARED expression strings
    over doubles cast once (_AR2_DET/_AR2_C/_AR2_P1/_AR2_P2); the
    recursive forecast is SEVEN UNROLLED SELECT steps (not a fold —
    sidestepping DuckDB's list_reduce struct-update hazard entirely),
    each one fixed multiply-add chain.

    Scale: the lag windows ride the calendar-bounded daily relation
    (whitelisted class); the moment aggregate is one row; the unrolled
    forecast is 7 one-row selects."""
    from pyspark.sql import Window

    daily = (
        spark.table("orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("bigint")
            .alias("x")
        )
    )
    wt = Window.orderBy("d")
    ix = daily.select("x", F.row_number().over(wt).alias("t"))
    wl = Window.orderBy("t")
    lagged = ix.select(
        F.col("x").alias("y"),
        F.lag("x", 1).over(wl).alias("u"),
        F.lag("x", 2).over(wl).alias("v"),
    ).filter("u IS NOT NULL AND v IS NOT NULL")
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    mom = lagged.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("m_i"),
        F.sum(d38("u")).alias("su_i"),
        F.sum(d38("v")).alias("sv_i"),
        F.sum(d38("y")).alias("sy_i"),
        F.sum(d38("u") * F.col("u")).alias("suu_i"),
        F.sum(d38("v") * F.col("v")).alias("svv_i"),
        F.sum(d38("u") * F.col("v")).alias("suv_i"),
        F.sum(d38("u") * F.col("y")).alias("suy_i"),
        F.sum(d38("v") * F.col("y")).alias("svy_i"),
    )
    tmax = ix.agg(F.max("t").alias("tmax"))
    seeds = (
        ix.crossJoin(F.broadcast(tmax))
        .filter(F.col("t") >= F.col("tmax") - 1)
        .agg(
            F.max(
                F.when(F.col("t") == F.col("tmax"), F.col("x"))
            ).cast("double").alias("xn"),
            F.max(
                F.when(F.col("t") == F.col("tmax") - 1, F.col("x"))
            ).cast("double").alias("xnm1"),
        )
    )
    md = mom.selectExpr(
        "CAST(m_i AS DOUBLE) AS m",
        "CAST(su_i AS DOUBLE) AS su",
        "CAST(sv_i AS DOUBLE) AS sv",
        "CAST(sy_i AS DOUBLE) AS sy",
        "CAST(suu_i AS DOUBLE) AS suu",
        "CAST(svv_i AS DOUBLE) AS svv",
        "CAST(suv_i AS DOUBLE) AS suv",
        "CAST(suy_i AS DOUBLE) AS suy",
        "CAST(svy_i AS DOUBLE) AS svy",
    )
    coef = md.crossJoin(F.broadcast(seeds)).selectExpr(
        f"{_AR2_C} / nullif({_AR2_DET}, 0) AS c0",
        f"{_AR2_P1} / nullif({_AR2_DET}, 0) AS p1",
        f"{_AR2_P2} / nullif({_AR2_DET}, 0) AS p2",
        "xn",
        "xnm1",
    )
    step = coef.selectExpr(
        "c0", "p1", "p2", "c0 + p1*xn + p2*xnm1 AS f", "xn AS fp"
    )
    out = None
    for h in range(1, _AR2_H + 1):
        if h > 1:
            step = step.selectExpr(
                "c0", "p1", "p2", "c0 + p1*f + p2*fp AS f", "f AS fp"
            )
        row = step.selectExpr(
            f"{h} AS h",
            "ROUND(f / 100, 2) AS forecast",
            "ROUND(p1, 6) AS phi1",
            "ROUND(p2, 6) AS phi2",
            "ROUND(c0, 4) AS intercept_cents",
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("h")


# generalized-ESD studentized deviate over the remaining set's exact
# moments: R = |x - s/m| / sqrt((m*q - s*s) / (m*(m-1))) — shared
# string, all operands doubles cast once from exact integers.
_ESD_R = "(abs(x - s / m) / sqrt((m * q - s * s) / (m * (m - 1.0))))"
_ESD_K = 5


def _esd_oracle() -> str:
    parts = [f"WITH {_DAILY_REV_ORDERS_CTE}", "rem0 AS (SELECT d, rev AS x FROM daily)"]
    outs = []
    for r in range(1, _ESD_K + 1):
        parts.append(
            f"""st{r} AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS m,
         CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS s,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS q
  FROM rem{r-1})"""
        )
        parts.append(
            f"""out{r} AS (
  SELECT d, x, {_ESD_R} AS r_stat
  FROM rem{r-1}, st{r}
  ORDER BY {_ESD_R} DESC, d LIMIT 1)"""
        )
        parts.append(
            f"rem{r} AS (SELECT * FROM rem{r-1} "
            f"WHERE d NOT IN (SELECT d FROM out{r}))"
        )
        outs.append(
            f"SELECT {r} AS round, d AS day, x AS rev_cents,"
            f" ROUND(r_stat, 6) AS r_stat FROM out{r}"
        )
    return ",\n".join(parts) + "\nSELECT * FROM (" + " UNION ALL ".join(outs) + ") ORDER BY round"


@query("esd_outliers_daily", oracle=_esd_oracle())
def esd_outliers_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized ESD (Rosner 1983) top-5 outlier walk over daily
    revenue: iteratively remove the most extreme studentized deviate
    and RECOMPUTE mean/sd on what remains — the masking-proof
    multi-outlier procedure (a single z/MAD pass underestimates spread
    when several outliers inflate it together; anomaly_mad_daily and
    hampel_outliers_daily are the single-pass members). Emits each
    round's day and its R statistic; the consumer thresholds against
    lambda(alpha, n) offline (no t-quantile inverse in either engine —
    documented boundary).

    Determinism: per-round moments are exact HUGEINT/DECIMAL38; R is a
    shared expression string over once-cast doubles; the per-round
    argmax orders identical doubles with a day tie-break.

    Scale: all five rounds chain anti-joins on the calendar-bounded
    daily relation — one declarative plan, no driver loop, nothing
    row-scale after the first aggregate."""
    daily = (
        spark.table("orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("bigint")
            .alias("x")
        )
        # persisted: every round references the survivor chain TWICE
        # (moment agg + candidate scan) and each chain hangs off this
        # relation — without the persist the orders scan re-executes
        # O(2^rounds) times (measured 5.4 s -> the persist makes the
        # walk linear in rounds over a 366-row cached relation)
        .persist()
    )
    remaining = daily
    out = None
    for r in range(1, _ESD_K + 1):
        st = remaining.agg(
            F.count(F.lit(1)).cast("double").alias("m"),
            F.sum(F.col("x").cast("decimal(38,0)")).cast("double").alias("s"),
            F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
            .cast("double")
            .alias("q"),
        )
        cand = remaining.crossJoin(F.broadcast(st)).selectExpr(
            "d", "x", f"{_ESD_R} AS r_stat"
        )
        # one-row persist per round: the pick feeds both the output row
        # and the next round's anti-join — without it each reference
        # replays the whole prior chain
        picked = cand.orderBy(F.desc("r_stat"), "d").limit(1).persist()
        row = picked.selectExpr(
            f"{r} AS round",
            "d AS day",
            "x AS rev_cents",
            "ROUND(r_stat, 6) AS r_stat",
        )
        out = row if out is None else out.unionAll(row)
        remaining = remaining.join(
            picked.select("d"), "d", "left_anti"
        )
    return out.orderBy("round")


# binary-segmentation between-segment SS gain for a split after local
# position td of a segment with nd points / sd total: the one-step
# k-means objective drop. All operands doubles cast once from exact
# integer cumulative sums; identical expression both engines.
_BS_GAIN = "((csd * nd - sd * td) * (csd * nd - sd * td) / (nd * td * (nd - td)))"

_BINSEG_ORACLE = f"""
WITH {_DAILY_REV_ORDERS_CTE},
ix AS (
  SELECT d, rev AS x, ROW_NUMBER() OVER (ORDER BY d) AS t,
         SUM(rev) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
  FROM daily),
tot AS (SELECT CAST(MAX(t) AS BIGINT) AS n, CAST(MAX(cs) AS HUGEINT) AS s FROM ix),
g1 AS (
  SELECT d, t,
         CAST(cs AS DOUBLE) AS csd, CAST(t AS DOUBLE) AS td,
         CAST(s AS DOUBLE) AS sd, CAST(n AS DOUBLE) AS nd
  FROM ix CROSS JOIN tot WHERE t < n),
pick1 AS (
  SELECT d, t, {_BS_GAIN} AS gain FROM g1
  ORDER BY {_BS_GAIN} DESC, t LIMIT 1),
seg AS (
  SELECT ix.d, ix.x, ix.t, (ix.t <= pick1.t) AS left_seg
  FROM ix CROSS JOIN pick1),
seg_ix AS (
  SELECT d, left_seg,
         ROW_NUMBER() OVER (PARTITION BY left_seg ORDER BY t) AS tl,
         SUM(x) OVER (PARTITION BY left_seg ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
         COUNT(*) OVER (PARTITION BY left_seg) AS n_seg,
         SUM(x) OVER (PARTITION BY left_seg) AS s_seg
  FROM seg),
g2 AS (
  SELECT d, tl,
         CAST(cs AS DOUBLE) AS csd, CAST(tl AS DOUBLE) AS td,
         CAST(s_seg AS DOUBLE) AS sd, CAST(n_seg AS DOUBLE) AS nd
  FROM seg_ix WHERE tl < n_seg),
pick2 AS (
  SELECT d, {_BS_GAIN} AS gain FROM g2
  ORDER BY {_BS_GAIN} DESC, d LIMIT 1)
SELECT * FROM (
  SELECT 1 AS level, d AS split_day, ROUND(gain, 4) AS gain FROM pick1
  UNION ALL
  SELECT 2 AS level, d AS split_day, ROUND(gain, 4) AS gain FROM pick2
) ORDER BY level
"""


@query("binseg_changepoints_daily", oracle=_BINSEG_ORACLE)
def binseg_changepoints_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-segmentation changepoint detection (top 2 splits) on
    daily revenue: level 1 picks the split maximizing the
    between-segment sum-of-squares gain over the whole series; level 2
    re-runs the same criterion inside the two halves and reports the
    better — the offline changepoint complement to cusum_changepoints'
    sequential detector and page_hinkley_drift's online one (binseg is
    what PELT/ruptures reduce to at depth 1-2).

    Determinism: cumulative sums and totals are exact integers; the
    gain is a shared expression string over once-cast doubles
    (_BS_GAIN); argmaxes order identical doubles with positional
    tie-breaks.

    Scale: the level-1 prefix-sum window rides the calendar-bounded
    daily relation (whitelisted class); level 2 windows are
    PARTITIONED by segment; both argmaxes are TakeOrdered(1)."""
    from pyspark.sql import Window

    daily = (
        spark.table("orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("bigint")
            .alias("x")
        )
    )
    wt = Window.orderBy("d")
    ix = daily.select(
        "d",
        "x",
        F.row_number().over(wt).alias("t"),
        F.sum("x").over(wt.rowsBetween(Window.unboundedPreceding, 0)).alias("cs"),
    )
    tot = ix.agg(
        F.max("t").cast("bigint").alias("n"),
        F.max("cs").cast("decimal(38,0)").alias("s"),
    )
    g1 = (
        ix.crossJoin(F.broadcast(tot))
        .filter("t < n")
        .selectExpr(
            "d",
            "t",
            "CAST(cs AS DOUBLE) AS csd",
            "CAST(t AS DOUBLE) AS td",
            "CAST(s AS DOUBLE) AS sd",
            "CAST(n AS DOUBLE) AS nd",
        )
    )
    pick1 = (
        g1.selectExpr("d", "t", f"{_BS_GAIN} AS gain")
        .orderBy(F.desc("gain"), "t")
        .limit(1)
    )
    seg = ix.crossJoin(
        F.broadcast(pick1.select(F.col("t").alias("t1")))
    ).select("d", "x", "t", (F.col("t") <= F.col("t1")).alias("left_seg"))
    ws = Window.partitionBy("left_seg").orderBy("t")
    wsa = Window.partitionBy("left_seg")
    seg_ix = seg.select(
        "d",
        "left_seg",
        F.row_number().over(ws).alias("tl"),
        F.sum("x").over(ws.rowsBetween(Window.unboundedPreceding, 0)).alias("cs"),
        F.count(F.lit(1)).over(wsa).alias("n_seg"),
        F.sum("x").over(wsa).alias("s_seg"),
    )
    g2 = seg_ix.filter("tl < n_seg").selectExpr(
        "d",
        "tl",
        "CAST(cs AS DOUBLE) AS csd",
        "CAST(tl AS DOUBLE) AS td",
        "CAST(s_seg AS DOUBLE) AS sd",
        "CAST(n_seg AS DOUBLE) AS nd",
    )
    pick2 = (
        g2.selectExpr("d", f"{_BS_GAIN} AS gain")
        .orderBy(F.desc("gain"), "d")
        .limit(1)
    )
    lvl1 = pick1.selectExpr(
        "1 AS level", "d AS split_day", "ROUND(gain, 4) AS gain"
    )
    lvl2 = pick2.selectExpr(
        "2 AS level", "d AS split_day", "ROUND(gain, 4) AS gain"
    )
    return lvl1.unionAll(lvl2).orderBy("level")


# Flesch Reading Ease on source-aggregated counts: one shared formula
# string over exact-integer word/sentence/syllable-group sums (decimal
# literals multiply doubles — safe; only decimal/decimal DIVISION is
# the engine-divergence trap, and both divisions here are cast-double).
_FLESCH = (
    "206.835 - 1.015 * (CAST(w AS DOUBLE) / GREATEST(s, 1))"
    " - 84.6 * (CAST(y AS DOUBLE) / GREATEST(w, 1))"
)

_FLESCH_ORACLE = f"""
WITH per_doc AS (
  SELECT source,
         len({{toks}}) AS w_d,
         len(regexp_extract_all(text, '[.!?]+')) AS s_d,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y_d
  FROM documents),
agg AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(w_d) AS BIGINT) AS w,
         CAST(SUM(s_d) AS BIGINT) AS s,
         CAST(SUM(y_d) AS BIGINT) AS y
  FROM per_doc GROUP BY 1)
SELECT source, n_docs, w AS words, s AS sentences, y AS syllable_groups,
       ROUND(CAST(w AS DOUBLE) / GREATEST(s, 1), 4) AS words_per_sentence,
       ROUND(CAST(y AS DOUBLE) / GREATEST(w, 1), 4) AS syllables_per_word,
       ROUND({_FLESCH}, 4) AS flesch_reading_ease
FROM agg ORDER BY source
"""


def _flesch_oracle() -> str:
    return _FLESCH_ORACLE.format(toks=_TXT.tokens("text", "duck"))


@query("flesch_reading_ease", oracle=_flesch_oracle())
def flesch_reading_ease(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch Reading Ease per source (Flesch 1948): 206.835 -
    1.015*(words/sentences) - 84.6*(syllables/words), with syllables
    approximated by vowel-group runs ([aeiouy]+ — the standard cheap
    proxy) and sentences by terminal-punctuation runs. The readability
    member of the text-quality family: quality_scores gates junk,
    perplexity gates unnaturalness, THIS profiles difficulty — a
    training-mix lever (children's text vs legalese) LLM data curricula
    cut on.

    Determinism: all three counts are exact integers from the same
    regex semantics in both engines (simple character classes — no
    engine-divergent syntax); the formula is one shared expression
    string paying two cast-double divisions.

    Scale: one documents scan collapsing map-side to |sources| rows;
    the counting is regexp work inside codegen, no explode, no
    shuffle wider than the source rollup."""
    toks = _TXT.tokens("text", "spark")
    per_doc = spark.table("documents").selectExpr(
        "source",
        f"size({toks}) AS w_d",
        "regexp_count(text, '[.!?]+') AS s_d",
        "regexp_count(lower(text), '[aeiouy]+') AS y_d",
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("w_d").cast("bigint").alias("w"),
        F.sum("s_d").cast("bigint").alias("s"),
        F.sum("y_d").cast("bigint").alias("y"),
    )
    return agg.selectExpr(
        "source",
        "n_docs",
        "w AS words",
        "s AS sentences",
        "y AS syllable_groups",
        "ROUND(CAST(w AS DOUBLE) / GREATEST(s, 1), 4) AS words_per_sentence",
        "ROUND(CAST(y AS DOUBLE) / GREATEST(w, 1), 4) AS syllables_per_word",
        f"ROUND({_FLESCH}, 4) AS flesch_reading_ease",
    ).orderBy("source")


def _loo_vocab_oracle() -> str:
    toks = _TXT.tokens("text", "duck")
    return f"""
WITH tok AS (
  SELECT DISTINCT source, unnest({toks}) AS token FROM documents),
spread AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS n_sources FROM tok GROUP BY 1),
scored AS (
  SELECT t.source, s.n_sources FROM tok t JOIN spread s USING (token)),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab_all FROM spread)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS exclusive_types,
       ROUND(CAST(SUM(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS exclusive_share,
       vocab_all,
       ROUND(CAST(SUM(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / vocab_all, 6) AS vocab_loss_if_removed
FROM scored CROSS JOIN tot
GROUP BY source, vocab_all ORDER BY source
"""


@query("leave_one_source_out_vocab", oracle=_loo_vocab_oracle())
def leave_one_source_out_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out VOCABULARY ABLATION: for each source, how
    many token types exist ONLY there — i.e. the exact vocabulary the
    corpus loses if that source is dropped from the mix. The data-
    ablation question ('what does each source uniquely contribute?')
    answered in ONE pass instead of |sources| corpus rebuilds: a type
    vanishes under leave-one-out removal iff its source-spread is 1.
    Complements source_mixture_weights (how much) and dsir (how
    relevant) with WHAT'S IRREPLACEABLE.

    Exactness: distinct (source, token) pairs and per-token source
    spreads are exact integers; shares pay one division each.

    Scale: one explode collapsed by DISTINCT to the (source, token)
    relation; the spread count and the join back are token-hash-keyed
    shuffles carrying only (token, small ints); output is |sources|
    rows."""
    toks = _TXT.tokens("text", "spark")
    tok = (
        spark.table("documents")
        .selectExpr("source", f"explode({toks}) AS token")
        .distinct()
    )
    spread = tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sources")
    )
    scored = tok.join(spread.hint("shuffle_hash"), "token")
    tot = spread.agg(F.count(F.lit(1)).cast("bigint").alias("vocab_all"))
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum(F.when(F.col("n_sources") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("exclusive_types"),
        )
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "source",
            "n_types",
            "exclusive_types",
            "ROUND(CAST(exclusive_types AS DOUBLE) / n_types, 6)"
            " AS exclusive_share",
            "vocab_all",
            "ROUND(CAST(exclusive_types AS DOUBLE) / vocab_all, 6)"
            " AS vocab_loss_if_removed",
        )
        .orderBy("source")
    )


def _map_eval_oracle(k1: float, b: float, k: int) -> str:
    toks = _TXT.tokens("text", "duck")
    parts = []
    for qid, terms in _IR_QUERIES:
        term_list = ", ".join(f"'{t}'" for t in terms)
        rel_pred = " AND ".join(f"list_contains(__toks, '{t}')" for t in terms)
        parts.append(
            f"""
SELECT * FROM (
WITH base AS (SELECT doc_id, {toks} AS __toks FROM documents),
dl AS (SELECT doc_id, CAST(len(__toks) AS DOUBLE) AS dl FROM base),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl),
tk AS (SELECT doc_id, unnest(__toks) AS token FROM base),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf FROM tk
  WHERE token IN ({term_list}) GROUP BY doc_id, token
),
dfq AS (SELECT token, CAST(count(*) AS DOUBLE) AS df_t FROM tf GROUP BY token),
scored AS (
  SELECT tf.doc_id,
         ln(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
           * (tf * ({k1} + 1))
           / (tf + {k1} * (1 - {b} + {b} * dl.dl / avgdl)) AS contrib
  FROM tf JOIN dfq USING (token) JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
),
top AS (
  SELECT doc_id, ROUND(SUM(contrib), 6) AS bm25
  FROM scored GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT {k}
),
rk AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
  FROM top
),
rel AS (SELECT doc_id, ({rel_pred}) AS rel FROM base),
nrel AS (SELECT CAST(COUNT(*) FILTER (rel) AS BIGINT) AS n_relevant FROM rel),
walk AS (
  SELECT rk.rank, rel.rel,
         SUM(CASE WHEN rel.rel THEN 1 ELSE 0 END)
           OVER (ORDER BY rk.rank) AS cumrel
  FROM rk JOIN rel USING (doc_id)),
apn AS (
  SELECT COALESCE(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           COALESCE(list(CAST(cumrel AS DOUBLE) / rank ORDER BY rank), [])),
           (a, e) -> a + e), 0.0) AS ap_num
  FROM walk WHERE rel)
SELECT {qid} AS query_id, nrel.n_relevant,
       ROUND(ap_num / GREATEST(LEAST(nrel.n_relevant, {k}), 1), 6)
         AS ap_at_{k}
FROM apn CROSS JOIN nrel
)"""
        )
    u = " UNION ALL ".join(parts)
    return f"""
WITH u AS ({u}),
m AS (
  SELECT ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(ap_at_{k} ORDER BY query_id)), (a, e) -> a + e)
           / COUNT(*), 6) AS map_at_{k}
  FROM u)
SELECT u.query_id, u.n_relevant, u.ap_at_{k}, m.map_at_{k}
FROM u CROSS JOIN m ORDER BY u.query_id
"""


@query("search_map_eval", oracle=_map_eval_oracle(1.2, 0.75, _IR_K))
def search_map_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean Average Precision for the BM25 retriever: per query,
    AP@20 = (sum over relevant hits of precision-at-that-rank) /
    min(R, 20) against exact AND-containment ground truth, plus the
    across-query MAP — the rank-quality summary that rewards putting
    ALL relevant documents early, where MRR only scores the first
    (search_mrr_eval) and nDCG needs graded labels (search_ndcg_eval).
    Query 3 has zero relevant docs and pins the AP = 0 empty-fold path.

    Determinism: precision terms cumrel/rank are single divisions of
    exact integers; the AP sum is a rank-ordered fold over the
    bounded candidate pool; per-query APs round to 6 BEFORE the MAP
    mean (a query_id-ordered fold over 3 values).

    Scale: identical plan shape to the MRR eval — postings-filtered
    BM25 top-k, map-side relevance conjunction, k-row-bounded
    aggregates; MAP is a 3-row fold."""
    from pyspark.sql import Window

    from dawis_spark.operators.corpus import bm25_scores

    docs = spark.table("documents")
    toks = _TXT.tokens("text", "spark")
    out = None
    for qid, terms in _IR_QUERIES:
        ranked = bm25_scores(
            docs, "doc_id", "text", list(terms), k1=1.2, b=0.75, top_n=_IR_K
        ).select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("bm25"), "doc_id"))
            .alias("rank"),
        )
        rel_pred = F.expr(
            " AND ".join(f"array_contains({toks}, '{t}')" for t in terms)
        )
        rel = docs.select("doc_id", rel_pred.alias("rel"))
        nrel = rel.agg(
            F.sum(F.when(F.col("rel"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_relevant")
        )
        walk = (
            ranked.join(rel, "doc_id")
            .withColumn(
                "cumrel",
                F.sum(F.when(F.col("rel"), 1).otherwise(0)).over(
                    Window.orderBy("rank")
                ),
            )
            .filter("rel")
        )
        apn = walk.agg(
            F.coalesce(
                F.expr(
                    "aggregate(array_sort(collect_list("
                    "struct(rank, CAST(cumrel AS DOUBLE) / rank AS p))), "
                    "cast(0.0 as double), (a, e) -> a + e.p)"
                ),
                F.lit(0.0),
            ).alias("ap_num")
        )
        row = apn.crossJoin(F.broadcast(nrel)).selectExpr(
            f"{qid} AS query_id",
            "n_relevant",
            f"ROUND(ap_num / GREATEST(LEAST(n_relevant, {_IR_K}), 1), 6)"
            f" AS ap_at_{_IR_K}",
        )
        out = row if out is None else out.unionAll(row)
    m = out.agg(
        F.expr(
            f"ROUND(aggregate(array_sort(collect_list("
            f"struct(query_id, ap_at_{_IR_K} AS ap))), "
            f"cast(0.0 as double), (a, e) -> a + e.ap) / COUNT(*), 6)"
        ).alias(f"map_at_{_IR_K}")
    )
    return out.crossJoin(F.broadcast(m)).orderBy("query_id")


_TEMP_ALPHA_SQRT = True  # alpha = 0.5 rendered as sqrt (IEEE-exact)

_TEMP_MIX_ORACLE = """
WITH per AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1),
tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM per),
p AS (
  SELECT source, n_docs, CAST(n_docs AS DOUBLE) / n AS p_raw
  FROM per CROSS JOIN tot),
z AS (
  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(sqrt(p_raw) ORDER BY source)), (a, e) -> a + e) AS denom
  FROM p)
SELECT source, n_docs,
       ROUND(p_raw, 6) AS p_natural,
       ROUND(sqrt(p_raw) / denom, 6) AS w_temperature,
       ROUND(sqrt(p_raw) / denom / p_raw, 4) AS upsample_factor
FROM p CROSS JOIN z ORDER BY source
"""


@query("mixture_temperature_weights", oracle=_TEMP_MIX_ORACLE)
def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling weights (alpha = 0.5) for the source
    mix: w_s = p_s^alpha / sum p^alpha — the standard multilingual/
    multi-source rebalancing rule (alpha < 1 upsamples the tail so
    small sources are seen, without the uniform mix's heavy repetition
    of tiny ones). source_mixture_weights reports the NATURAL mix;
    this computes the TRAINING mix and each source's upsample factor —
    the number a data loader actually consumes.

    Determinism: alpha = 0.5 is rendered as sqrt (IEEE correctly-
    rounded, engine-identical — a pow(x, 0.5) could differ in ulp);
    the partition function is a source-ordered fold; each weight pays
    fixed divisions of identical doubles.

    Scale: one map-side count rollup to |sources| rows; everything
    after is source-cardinality-bounded."""
    per = spark.table("documents").groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    tot = per.agg(F.sum("n_docs").cast("bigint").alias("n"))
    p = per.crossJoin(F.broadcast(tot)).selectExpr(
        "source", "n_docs", "CAST(n_docs AS DOUBLE) / n AS p_raw"
    )
    z = p.agg(
        F.expr(
            "aggregate(array_sort(collect_list(struct(source, sqrt(p_raw) AS s))), "
            "cast(0.0 as double), (a, e) -> a + e.s)"
        ).alias("denom")
    )
    return (
        p.crossJoin(F.broadcast(z))
        .selectExpr(
            "source",
            "n_docs",
            "ROUND(p_raw, 6) AS p_natural",
            "ROUND(sqrt(p_raw) / denom, 6) AS w_temperature",
            "ROUND(sqrt(p_raw) / denom / p_raw, 4) AS upsample_factor",
        )
        .orderBy("source")
    )


def _mcc_oracle(dim: int, iters: int, lr: float) -> str:
    dot = _VEC.dot("xs", "wl", "duck")
    return f"""
WITH {_logreg_chain_ctes(dim, iters, lr, _LOGREG_SAMPLE_LIMIT)},
wlF AS (SELECT list(weight ORDER BY dim) AS wl FROM w{iters}),
scF AS MATERIALIZED (
  SELECT CAST(v.y AS INT) AS y,
         round(1.0 / (1.0 + exp(-(round({dot}, 6)))), 6) AS p
  FROM v, wlF),
conf AS (
  SELECT CAST(SUM(CASE WHEN p >= 0.5 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN p >= 0.5 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN p < 0.5 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         CAST(SUM(CASE WHEN p < 0.5 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM scF)
SELECT tp, fp, fn, tn,
       ROUND(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6) AS accuracy,
       ROUND(CAST(tp AS DOUBLE) / nullif(tp + fp, 0), 6) AS precision_,
       ROUND(CAST(tp AS DOUBLE) / nullif(tp + fn, 0), 6) AS recall_,
       ROUND(2.0 * tp / nullif(2.0 * tp + fp + fn, 0), 6) AS f1,
       ROUND(CAST(CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn AS DOUBLE)
             / sqrt(CAST(CAST(tp + fp AS HUGEINT) * (tp + fn)
                         * (tn + fp) * (tn + fn) AS DOUBLE)), 6) AS mcc
FROM conf
"""


@query("mcc_classifier_confusion", oracle=_mcc_oracle(64, 3, 1.0))
def mcc_classifier_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion panel at the p >= 0.5 operating point for the trained
    quality classifier: tp/fp/fn/tn, accuracy/precision/recall/F1, and
    MATTHEWS CORRELATION — the confusion-matrix correlation that stays
    honest under class imbalance where accuracy and F1 both inflate
    (the single number a gate comparison should rank by; pr_curve
    sweeps the thresholds, THIS reads the default one in depth).

    Determinism: shared trained vector; the four cells are exact
    integers off one scan; every ratio pays one division; the MCC
    numerator/denominator are exact DECIMAL38/HUGEINT products cast
    once. Scale: one scoring scan to a single 4-cell row."""
    from dawis_spark.operators.logreg import margin_expr

    emb = spark.table("embeddings")
    w = _trained_logreg_w(spark, sf_dir)
    p = f"round(1.0 / (1.0 + exp(-(round({margin_expr('embedding', w)}, 6)))), 6)"
    conf = emb.selectExpr(
        f"cast({_LOGREG_Y_SPARK} as int) AS y", f"{p} AS p"
    ).agg(
        F.expr("CAST(SUM(CASE WHEN p >= 0.5 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT)").alias("tp"),
        F.expr("CAST(SUM(CASE WHEN p >= 0.5 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT)").alias("fp"),
        F.expr("CAST(SUM(CASE WHEN p < 0.5 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT)").alias("fn"),
        F.expr("CAST(SUM(CASE WHEN p < 0.5 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT)").alias("tn"),
    )
    return conf.selectExpr(
        "tp", "fp", "fn", "tn",
        "ROUND(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6) AS accuracy",
        "ROUND(CAST(tp AS DOUBLE) / nullif(tp + fp, 0), 6) AS precision_",
        "ROUND(CAST(tp AS DOUBLE) / nullif(tp + fn, 0), 6) AS recall_",
        "ROUND(2.0 * tp / nullif(2.0 * tp + fp + fn, 0), 6) AS f1",
        "ROUND(CAST(CAST(tp AS DECIMAL(38,0)) * tn - CAST(fp AS DECIMAL(38,0)) * fn AS DOUBLE)"
        " / sqrt(CAST(CAST(tp + fp AS DECIMAL(38,0)) * (tp + fn)"
        "             * (tn + fp) * (tn + fn) AS DOUBLE)), 6) AS mcc",
    )


_DUP_RATE_ORACLE = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct,
       ROUND(1.0 - CAST(COUNT(DISTINCT text) AS DOUBLE) / COUNT(*), 6)
         AS dup_rate
FROM documents GROUP BY source ORDER BY source
"""


@query("dup_rate_by_source", oracle=_DUP_RATE_ORACLE)
def dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate RATE per source — the per-feed dedup health
    report (which sources are syndication/mirror-heavy?) that
    dedup_exact's global pass doesn't break out. The ranking a mix
    designer reads next to mixture weights: a 30%-dup source
    contributes less unique signal than its row count claims.

    Scale: Spark dedups on sha2-256 of the text so the distinct
    exchange carries 32-byte hashes, never documents (the oracle
    counts DISTINCT text directly — equal up to hash collision,
    i.e. exactly at any realistic corpus size)."""
    return (
        spark.table("documents")
        .select("source", F.sha2(F.col("text"), 256).alias("h"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("h").cast("bigint").alias("n_distinct"),
        )
        .selectExpr(
            "source",
            "n_docs",
            "n_distinct",
            "ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_docs, 6) AS dup_rate",
        )
        .orderBy("source")
    )


# shared item-graph edge CTE (the item_graph_triangles construction):
# baskets capped at 128 items, co-occurrence threshold >= 6, oriented i<j
_ITEM_EDGE_CTE = f"""
b0 AS (
  SELECT DISTINCT user_id, {_ITEM_DUCK} AS item FROM events
  WHERE {_ITEM_DUCK} IS NOT NULL),
bn AS (SELECT user_id, COUNT(*) AS n FROM b0 GROUP BY user_id),
b AS (SELECT b0.user_id, b0.item FROM b0 JOIN bn USING (user_id)
      WHERE bn.n <= 128),
e AS (
  SELECT a.item AS i, b2.item AS j
  FROM b a JOIN b b2 ON a.user_id = b2.user_id AND a.item < b2.item
  GROUP BY 1, 2 HAVING COUNT(*) >= 6)
"""

_GCC_ORACLE = f"""
WITH {_ITEM_EDGE_CTE},
tri AS (
  SELECT ab.i AS x, ab.j AS y, bc.j AS z
  FROM e ab JOIN e bc ON ab.j = bc.i
  JOIN e ac ON ac.i = ab.i AND ac.j = bc.j),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT i AS node FROM e UNION ALL SELECT j FROM e) GROUP BY 1),
w AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(CAST(d AS HUGEINT) * (d - 1)) / 2 AS BIGINT) AS wedges
  FROM deg),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS triangles FROM tri),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e)
SELECT n_nodes, n_edges, triangles, wedges,
       ROUND(CAST(3 * triangles AS DOUBLE) / nullif(wedges, 0), 6) AS global_cc
FROM w, t, m
"""


@query("global_clustering_coefficient", oracle=_GCC_ORACLE)
def global_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global clustering coefficient (transitivity) of the item
    co-occurrence graph: 3*triangles / wedges — what fraction of
    connected triples close. item_graph_triangles counts PER-NODE
    closure; this is the one-number graph-cohesion summary next to it
    (high transitivity = community structure; low = hub-and-spoke),
    on the same oriented-edge construction so each triangle is
    counted once.

    Exactness: triangle and wedge counts are exact integers (wedges =
    sum d(d-1)/2 over the symmetrized degree relation — d(d-1) is
    even, so the halving is exact); one division. Scale: the standard
    oriented two-join triangle plan (edge-count-bound) plus a
    node-keyed degree aggregate."""
    from dawis_spark.operators.cooccur import item_baskets

    bsk = item_baskets(spark.table("events"), _ITEM_SPARK, 128)
    edges = (
        bsk.alias("a")
        .join(
            bsk.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("i"), F.col("b.item").alias("j"))
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= 6)
        .select("i", "j")
        .persist()
    )
    ab = edges.select(F.col("i").alias("x"), F.col("j").alias("y"))
    bc = edges.select(F.col("i").alias("y"), F.col("j").alias("z"))
    ac = edges.select(F.col("i").alias("x"), F.col("j").alias("z"))
    tri = ab.join(bc, "y").join(ac, ["x", "z"])
    deg = (
        edges.select(F.col("i").alias("node"))
        .unionAll(edges.select(F.col("j").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    w = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        (
            F.sum(F.col("d").cast("decimal(38,0)") * (F.col("d") - 1)) / 2
        ).cast("bigint").alias("wedges"),
    )
    t = tri.agg(F.count(F.lit(1)).cast("bigint").alias("triangles"))
    m = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return (
        w.crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(m))
        .selectExpr(
            "n_nodes",
            "n_edges",
            "triangles",
            "wedges",
            "ROUND(CAST(3 * triangles AS DOUBLE) / nullif(wedges, 0), 6)"
            " AS global_cc",
        )
    )


_ASSORT_ORACLE = f"""
WITH {_ITEM_EDGE_CTE},
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT i AS node FROM e UNION ALL SELECT j FROM e) GROUP BY 1),
de AS (
  SELECT du.d AS dx, dv.d AS dy
  FROM (SELECT i, j FROM e UNION ALL SELECT j, i FROM e) ed(i, j)
  JOIN deg du ON du.node = ed.i JOIN deg dv ON dv.node = ed.j),
mo AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(dx AS HUGEINT)) AS sx, SUM(CAST(dy AS HUGEINT)) AS sy,
         SUM(CAST(dx AS HUGEINT) * dy) AS sxy,
         SUM(CAST(dx AS HUGEINT) * dx) AS sxx,
         SUM(CAST(dy AS HUGEINT) * dy) AS syy
  FROM de)
SELECT CAST(n AS BIGINT) AS n_edge_ends,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / nullif(SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                      * SQRT(CAST(n * syy - sy * sy AS DOUBLE)), 0), 6)
         AS assortativity
FROM mo
"""


@query("degree_assortativity_items", oracle=_ASSORT_ORACLE)
def degree_assortativity_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002) of the item co-occurrence
    graph: the Pearson correlation of endpoint degrees over the
    symmetrized edge list — positive = hubs link hubs (assortative
    social shape), negative = hubs link leaves (disassortative
    catalog/web shape). The structural summary next to transitivity
    and the k-core profile on the same graph.

    Exactness: degree moments over edge ends are exact
    HUGEINT/DECIMAL38 integers; r pays the standard two-sqrt one-
    division Pearson expression (the spearman machinery's shape).

    Scale: degree aggregate + two node-keyed joins of the edge list
    against the degree relation — edge-count-bound exchanges carrying
    ints only."""
    from dawis_spark.operators.cooccur import item_baskets

    bsk = item_baskets(spark.table("events"), _ITEM_SPARK, 128)
    edges = (
        bsk.alias("a")
        .join(
            bsk.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("i"), F.col("b.item").alias("j"))
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= 6)
        .select("i", "j")
        .persist()
    )
    deg = (
        edges.select(F.col("i").alias("node"))
        .unionAll(edges.select(F.col("j").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    ed = edges.unionAll(edges.select(F.col("j").alias("i"), F.col("i").alias("j")))
    de = (
        ed.join(deg.withColumnRenamed("node", "i").withColumnRenamed("d", "dx"), "i")
        .join(deg.withColumnRenamed("node", "j").withColumnRenamed("d", "dy"), "j")
        .select("dx", "dy")
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    mo = de.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(d38("dx")).alias("sx"),
        F.sum(d38("dy")).alias("sy"),
        F.sum(d38("dx") * F.col("dy")).alias("sxy"),
        F.sum(d38("dx") * F.col("dx")).alias("sxx"),
        F.sum(d38("dy") * F.col("dy")).alias("syy"),
    )
    return mo.selectExpr(
        "CAST(n AS BIGINT) AS n_edge_ends",
        "ROUND(CAST(n * sxy - sx * sy AS DOUBLE)"
        " / nullif(SQRT(CAST(n * sxx - sx * sx AS DOUBLE))"
        "          * SQRT(CAST(n * syy - sy * sy AS DOUBLE)), 0), 6)"
        " AS assortativity",
    )


_NORM_MICRO_SPARK = (
    "aggregate(transform(embedding, v ->"
    " CAST(ROUND(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT)),"
    " CAST(0 AS DECIMAL(38,0)), (a, e) -> a + CAST(e AS DECIMAL(38,0)) * e)"
)
_NORM_MICRO_DUCK = (
    "list_reduce(list_prepend(CAST(0 AS HUGEINT),"
    " list_transform(embedding, v ->"
    " CAST(CAST(ROUND(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT) AS HUGEINT)"
    " * CAST(ROUND(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT))),"
    " (a, e) -> a + e)"
)

_NORM_PROFILE_ORACLE = f"""
WITH per AS (
  SELECT label, {_NORM_MICRO_DUCK} AS sq FROM embeddings),
agg AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(sq) AS s, MIN(sq) AS lo, MAX(sq) AS hi
  FROM per GROUP BY 1)
SELECT label, n,
       ROUND(CAST(s AS DOUBLE) / n / 1000000000000.0, 6) AS mean_sq_norm,
       ROUND(sqrt(CAST(lo AS DOUBLE) / 1000000000000.0), 6) AS min_norm,
       ROUND(sqrt(CAST(hi AS DOUBLE) / 1000000000000.0), 6) AS max_norm
FROM agg ORDER BY label
"""


_CAPREC_ORACLE = """
WITH a AS (SELECT DISTINCT text FROM documents WHERE doc_id % 2 = 0),
b AS (SELECT DISTINCT text FROM documents WHERE doc_id % 3 = 0),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m_overlap
      FROM a JOIN b USING (text)),
counts AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS n_a,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_b,
         (SELECT m_overlap FROM m) AS m_overlap,
         (SELECT CAST(COUNT(DISTINCT text) AS BIGINT) FROM documents)
           AS n_distinct_true)
SELECT n_a, n_b, m_overlap, n_distinct_true,
       ROUND(CAST((n_a + 1) * (n_b + 1) AS DOUBLE) / (m_overlap + 1) - 1, 2)
         AS n_hat_chapman,
       ROUND(abs(CAST((n_a + 1) * (n_b + 1) AS DOUBLE) / (m_overlap + 1) - 1
                 - n_distinct_true) / n_distinct_true, 6) AS rel_err
FROM counts
"""


@query("capture_recapture_distinct", oracle=_CAPREC_ORACLE)
def capture_recapture_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman capture-recapture estimate of the DISTINCT-document
    population from two deterministic overlapping samples (doc_id % 2
    and % 3 strata): N_hat = (n_a+1)(n_b+1)/(m+1) - 1 — the ecology
    estimator repurposed for data engineering: when two independently
    collected crawls/feeds overlap, the overlap rate alone bounds how
    much of the underlying corpus either has seen, WITHOUT scanning a
    third time. Sits beside the sketch family (kmv/hll estimate
    distincts of what you HAVE; capture-recapture extrapolates to what
    you HAVEN'T), with the true distinct count and relative error
    reported for calibration.

    Exactness: sample membership and all four counts are exact
    integers; one double division (+1 Chapman correction keeps it
    finite when the overlap is empty).

    Scale: two hash-distinct passes and one equi-join on the text key
    — at 100 TB the text key would be its 128-bit hash (the dedup
    family's standing reduction), making every exchange hash-width."""
    docs = spark.table("documents")
    a = docs.filter(F.expr("doc_id % 2 = 0")).select("text").distinct()
    b = docs.filter(F.expr("doc_id % 3 = 0")).select("text").distinct()
    m = a.join(b, "text").agg(
        F.count(F.lit(1)).cast("bigint").alias("m_overlap")
    )
    counts = (
        a.agg(F.count(F.lit(1)).cast("bigint").alias("n_a"))
        .crossJoin(F.broadcast(b.agg(F.count(F.lit(1)).cast("bigint").alias("n_b"))))
        .crossJoin(F.broadcast(m))
        .crossJoin(
            F.broadcast(
                docs.agg(
                    F.countDistinct("text").cast("bigint").alias(
                        "n_distinct_true"
                    )
                )
            )
        )
    )
    return counts.selectExpr(
        "n_a",
        "n_b",
        "m_overlap",
        "n_distinct_true",
        "ROUND(CAST((n_a + 1) * (n_b + 1) AS DOUBLE) / (m_overlap + 1) - 1, 2)"
        " AS n_hat_chapman",
        "ROUND(abs(CAST((n_a + 1) * (n_b + 1) AS DOUBLE) / (m_overlap + 1) - 1"
        " - n_distinct_true) / n_distinct_true, 6) AS rel_err",
    )


_ISO_SV_DUCK = (
    "list_transform(range(1, 65), i ->"
    " CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT))"
)
_ISO_ORACLE = f"""
WITH per AS (
  SELECT label, {_ISO_SV_DUCK} AS sv, {_NORM_MICRO_DUCK} AS sq
  FROM embeddings),
dims AS (
  SELECT label, u.i AS dim, CAST(SUM(sv[u.i]) AS HUGEINT) AS s_d
  FROM per, unnest(range(1, 65)) u(i) GROUP BY 1, 2),
meanvec AS (
  SELECT label, SUM(s_d * s_d) AS msq FROM dims GROUP BY 1),
norms AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n, SUM(sq) AS ssq
  FROM per GROUP BY 1)
SELECT n.label, n.n,
       ROUND(CAST(m.msq AS DOUBLE) / (CAST(n.n AS DOUBLE) * CAST(n.ssq AS DOUBLE)),
             6) AS isotropy
FROM norms n JOIN meanvec m USING (label)
ORDER BY n.label
"""


@query("embedding_isotropy_profile", oracle=_ISO_ORACLE)
def embedding_isotropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding (an)isotropy: ||sum v||^2 / (n * sum ||v||^2)
    — the expected cosine between the mean direction and the cloud, ~0
    for a well-spread (isotropic) embedding space and -> 1 when all
    vectors collapse onto one direction. The standard representation-
    collapse diagnostic (anisotropic spaces break cosine ANN recall
    and similarity thresholds calibrated on isotropic assumptions);
    reads beside embedding_norm_profile as the second vector-column
    sanity gate.

    Exactness: per-dimension sums and per-vector squared norms are
    exact integers in micro^2 units (the norm-profile discipline);
    ||sum v||^2 is an exact sum of squared HUGEINTs; ONE double
    division per label.

    Scale: one scan; the exchange carries 64 per-dimension partial
    sums per label — constant width; output |labels| rows."""
    per = spark.table("embeddings").selectExpr(
        "label",
        "transform(embedding, x ->"
        " CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS sv",
        f"{_NORM_MICRO_SPARK} AS sq",
    )
    dims = (
        per.select(
            "label", F.posexplode("sv").alias("dim", "v")
        )
        .groupBy("label", "dim")
        .agg(F.sum(F.col("v").cast("decimal(38,0)")).alias("s_d"))
    )
    meanvec = dims.groupBy("label").agg(
        F.sum(F.col("s_d") * F.col("s_d")).alias("msq")
    )
    norms = per.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("sq").alias("ssq"),
    )
    return (
        norms.join(meanvec, "label")
        .selectExpr(
            "label",
            "n",
            "ROUND(CAST(msq AS DOUBLE)"
            " / (CAST(n AS DOUBLE) * CAST(ssq AS DOUBLE)), 6) AS isotropy",
        )
        .orderBy("label")
    )


_DB_G = 16  # grid resolution per axis
# core-cell rule: density >= _DB_DENS x the mean cell density (scale-free
# — an absolute count threshold degenerates to all-core as data grows)
_DB_DENS = 2
# shared integral-division bin expression (the hellinger discipline):
# Spark `div` / DuckDB `//`
_DB_BIN = (
    "CASE WHEN hi{ax} = lo{ax} THEN 0 ELSE"
    " LEAST(CAST(({v} - lo{ax}) * {g} {divop} (hi{ax} - lo{ax}) AS INT),"
    f" {_DB_G - 1}) END"
)


def _dbscan_oracle() -> str:
    binx = _DB_BIN.format(ax="x", v="x", g=_DB_G, divop="//")
    biny = _DB_BIN.format(ax="y", v="y", g=_DB_G, divop="//")
    return f"""
WITH RECURSIVE pts AS (
  SELECT CAST(ROUND(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT) AS x,
         CAST(ROUND(CAST(embedding[2] AS DOUBLE) * 1000000) AS BIGINT) AS y
  FROM embeddings),
bounds AS (
  SELECT CAST(MIN(x) AS HUGEINT) AS lox, CAST(MAX(x) AS HUGEINT) AS hix,
         CAST(MIN(y) AS HUGEINT) AS loy, CAST(MAX(y) AS HUGEINT) AS hiy
  FROM pts),
binned AS (
  SELECT {binx} AS cx, {biny} AS cy
  FROM pts CROSS JOIN bounds),
cells AS (
  SELECT cx, cy, CAST(COUNT(*) AS BIGINT) AS n_pts
  FROM binned GROUP BY 1, 2),
tot AS (SELECT CAST(SUM(n_pts) AS HUGEINT) AS n_total FROM cells),
core AS (
  SELECT cx, cy, n_pts, CAST(cx * {_DB_G} + cy AS BIGINT) AS lbl
  FROM cells CROSS JOIN tot
  WHERE CAST(n_pts AS HUGEINT) * {_DB_G * _DB_G} >= {_DB_DENS} * n_total),
reach(cx, cy, lbl) AS (
  SELECT cx, cy, lbl FROM core
  UNION
  SELECT a.cx, a.cy, r.lbl
  FROM core a JOIN reach r
    ON abs(a.cx - r.cx) <= 1 AND abs(a.cy - r.cy) <= 1),
labeled AS (
  SELECT c.cx, c.cy, c.n_pts, MIN(r.lbl) AS lbl
  FROM core c JOIN reach r ON r.cx = c.cx AND r.cy = c.cy
  GROUP BY 1, 2, 3)
SELECT lbl AS cluster, CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(n_pts) AS BIGINT) AS n_points
FROM labeled GROUP BY 1 ORDER BY cluster
"""


@query("grid_dbscan_clusters", oracle=_dbscan_oracle())
def grid_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-DBSCAN density clustering of the embedding cloud projected
    onto its first two coordinates: micro-integer points binned into a
    16x16 grid, cells at >= 2x the mean cell density are CORE (a
    scale-free rule — an absolute count degenerates to all-core as the
    corpus grows), and core cells merge
    into clusters as 8-neighborhood CONNECTED COMPONENTS (cluster id =
    the component's minimum cell id) — the density-based, k-free
    complement to kmeans_clusters: DBSCAN finds arbitrarily-shaped
    dense regions and leaves sparse cells as noise instead of forcing
    them into the nearest centroid.

    Exactness: bin edges from exact integer min/max with shared
    integral division (the hellinger discipline); components are exact
    (driver-side union-find over the cell relation == the oracle's
    transitive-closure recursive CTE — both reach the true fixpoint,
    unlike a fixed-round label walk); no floats anywhere.

    Scale: ONE data-sized pass (project + bin + count); the classic
    cell-based DBSCAN reduction means everything after runs on the
    <= 256-cell grid relation — a DOCUMENTED BOUNDED COLLECT (the
    fellegi_sunter/markov_removal class: constant-size model state,
    never data-sized) followed by driver union-find; noise cells
    simply never enter the core relation."""
    binx = _DB_BIN.format(ax="x", v="x", g=_DB_G, divop="div")
    biny = _DB_BIN.format(ax="y", v="y", g=_DB_G, divop="div")
    pts = spark.table("embeddings").selectExpr(
        "CAST(ROUND(CAST(element_at(embedding, 1) AS DOUBLE) * 1000000)"
        " AS BIGINT) AS x",
        "CAST(ROUND(CAST(element_at(embedding, 2) AS DOUBLE) * 1000000)"
        " AS BIGINT) AS y",
    )
    bounds = pts.agg(
        F.expr("CAST(MIN(x) AS DECIMAL(38,0))").alias("lox"),
        F.expr("CAST(MAX(x) AS DECIMAL(38,0))").alias("hix"),
        F.expr("CAST(MIN(y) AS DECIMAL(38,0))").alias("loy"),
        F.expr("CAST(MAX(y) AS DECIMAL(38,0))").alias("hiy"),
    )
    cells = (
        pts.crossJoin(F.broadcast(bounds))
        .selectExpr(f"{binx} AS cx", f"{biny} AS cy")
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pts"))
    )
    tot = cells.agg(
        F.expr("CAST(SUM(n_pts) AS DECIMAL(38,0))").alias("n_total")
    )
    # bounded collect: <= _DB_G^2 = 256 grid cells by construction
    core = [
        (r["cx"], r["cy"], r["n_pts"])
        for r in cells.crossJoin(F.broadcast(tot))
        .filter(
            F.expr(
                f"CAST(n_pts AS DECIMAL(38,0)) * {_DB_G * _DB_G}"
                f" >= {_DB_DENS} * n_total"
            )
        )
        .collect()
    ]
    parent: dict[tuple, tuple] = {(cx, cy): (cx, cy) for cx, cy, _ in core}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    idx = {(cx, cy) for cx, cy, _ in core}
    for cx, cy, _ in core:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (cx + dx, cy + dy)
                if nb in idx:
                    ra, rb = find((cx, cy)), find(nb)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    comp: dict[tuple, list] = {}
    for cx, cy, n in core:
        comp.setdefault(find((cx, cy)), []).append(n)
    rows = [
        (int(rcx * _DB_G + rcy), len(ns), int(sum(ns)))
        for (rcx, rcy), ns in comp.items()
    ]
    return spark.createDataFrame(
        rows or [(None, None, None)],
        "cluster bigint, n_cells bigint, n_points bigint",
    ).filter(F.col("cluster").isNotNull()).orderBy("cluster")


@query("embedding_norm_profile", oracle=_NORM_PROFILE_ORACLE)
def embedding_norm_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding NORM profile: mean squared L2 norm plus the
    min/max norm — the first sanity check on any ingested vector
    column (unnormalized mixtures break cosine ANN; a zero-norm row
    breaks everything) and the drift probe when an upstream encoder
    changes. Complements the ANN recall evals, which all ASSUME norms
    are sane.

    Determinism: each vector's squared norm is an EXACT integer in
    micro^2 units (round(v * 1e6) per coordinate, fixed left-to-right
    fold over the array — no float accumulation across rows); the
    per-label sum/min/max are exact; display pays one division (+
    sqrt for the extremes).

    Scale: one map-side scan collapsing to |labels| rows."""
    per = spark.table("embeddings").selectExpr(
        "label", f"{_NORM_MICRO_SPARK} AS sq"
    )
    agg = per.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("sq").alias("s"),
        F.min("sq").alias("lo"),
        F.max("sq").alias("hi"),
    )
    return agg.selectExpr(
        "label",
        "n",
        "ROUND(CAST(s AS DOUBLE) / n / 1000000000000.0, 6) AS mean_sq_norm",
        "ROUND(sqrt(CAST(lo AS DOUBLE) / 1000000000000.0), 6) AS min_norm",
        "ROUND(sqrt(CAST(hi AS DOUBLE) / 1000000000000.0), 6) AS max_norm",
    ).orderBy("label")


_CVM_ORACLE = """
WITH tagged AS (
  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS ia,
         CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS ib
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
per_v AS (
  SELECT v, CAST(SUM(ia) AS BIGINT) AS na_v, CAST(SUM(ib) AS BIGINT) AS nb_v
  FROM tagged GROUP BY 1),
walked AS (
  SELECT na_v, nb_v,
         SUM(na_v) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
         SUM(nb_v) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
  FROM per_v),
tot AS (
  SELECT CAST(SUM(na_v) AS BIGINT) AS n_a_i, CAST(SUM(nb_v) AS BIGINT) AS n_b_i
  FROM per_v),
terms AS (
  SELECT CAST(na_v + nb_v AS HUGEINT)
           * (CAST(cum_a AS HUGEINT) * n_b_i - CAST(cum_b AS HUGEINT) * n_a_i)
           * (CAST(cum_a AS HUGEINT) * n_b_i - CAST(cum_b AS HUGEINT) * n_a_i)
           AS term,
         n_a_i, n_b_i
  FROM walked CROSS JOIN tot)
SELECT CAST(n_a_i AS BIGINT) AS n_a, CAST(n_b_i AS BIGINT) AS n_b,
       ROUND(CAST(SUM(term) AS DOUBLE)
             / (CAST(n_a_i + n_b_i AS DOUBLE) * (n_a_i + n_b_i)
                * n_a_i * n_b_i), 6) AS t_cvm
FROM terms GROUP BY n_a_i, n_b_i
"""


@query("cramer_von_mises_drift", oracle=_CVM_ORACLE)
def cramer_von_mises_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér–von Mises statistic between the URGENT and
    LOW order-value distributions — the INTEGRATED squared EDF gap
    that completes the drift panel: ks_price_drift takes the supremum
    (sensitive to one big local gap), mann_whitney tests location,
    THIS accumulates many small gaps across the whole support (the
    shape-change detector the supremum misses). Tie-adapted EDF form
    over the distinct-cents walk.

    Exactness: all terms exact DECIMAL38/HUGEINT through the full sum;
    ONE double division (operators/stats.py:cramer_von_mises).
    Scale: the value-bounded distinct-cents walk."""
    from dawis_spark.operators.stats import cramer_von_mises

    o = spark.table("orders").select(
        "o_orderpriority",
        F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").alias("cents"),
    )
    return cramer_von_mises(o, "cents", "o_orderpriority", "1-URGENT", "5-LOW")


_ADK_ORACLE = """
WITH gv AS (
  SELECT o_orderpriority AS g, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2),
per_v AS (SELECT v, CAST(SUM(c) AS BIGINT) AS t_v FROM gv GROUP BY 1),
pooled AS (
  SELECT v, t_v,
         SUM(t_v) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b
  FROM per_v),
groups AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n_g FROM gv GROUP BY 1),
grid AS (
  SELECT groups.g, pooled.v, pooled.t_v, pooled.b, groups.n_g,
         COALESCE(gv.c, 0) AS c
  FROM pooled CROSS JOIN groups
  LEFT JOIN gv ON gv.g = groups.g AND gv.v = pooled.v),
tot AS (SELECT CAST(MAX(b) AS BIGINT) AS n FROM pooled),
scored AS (
  SELECT g, v, t_v, b, n_g,
         SUM(c) OVER (PARTITION BY g ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
  FROM grid),
terms AS (
  SELECT g, v, n,
         CAST(CAST(t_v AS HUGEINT)
              * (CAST(n AS HUGEINT) * m - CAST(n_g AS HUGEINT) * b)
              * (CAST(n AS HUGEINT) * m - CAST(n_g AS HUGEINT) * b) AS DOUBLE)
           / CAST(CAST(b AS HUGEINT) * (n - b) AS DOUBLE)
           / CAST(n_g AS DOUBLE) AS t_term
  FROM scored CROSS JOIN tot WHERE b < n),
folded AS (
  SELECT CAST(COUNT(DISTINCT g) AS INT) AS k_groups,
         CAST(MAX(n) AS BIGINT) AS n_rows,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(t_term ORDER BY g, v)), (a, e) -> a + e) AS s
  FROM terms)
SELECT k_groups, n_rows, ROUND(s / CAST(n_rows AS DOUBLE), 6) AS a2_akn
FROM folded
"""


@query("anderson_darling_priorities", oracle=_ADK_ORACLE)
def anderson_darling_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-sample Anderson–Darling A2_akN across ALL FIVE order
    priorities (Scholz & Stephens 1987, no continuity correction) —
    the tail-weighted member that completes the EDF panel: KS =
    supremum, CvM = integrated, AD = integrated with 1/(H(1-H))
    weighting that amplifies TAIL discrepancies (exactly where price
    distributions drift first), generalized to k groups in one pass.

    Exactness: grid numerators exact DECIMAL38/HUGEINT; one division
    per grid cell; (g, v)-ordered fold (operators/stats.py:
    anderson_darling_k).

    Scale: the grid is distinct-cents x 5; per-group cumulative
    windows are group-PARTITIONED over it."""
    from dawis_spark.operators.stats import anderson_darling_k

    o = spark.table("orders").select(
        "o_orderpriority",
        F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").alias("cents"),
    )
    return anderson_darling_k(o, "cents", "o_orderpriority")


_W1_ORACLE = """
WITH tagged AS (
  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS ia,
         CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS ib
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
per_v AS (
  SELECT v, CAST(SUM(ia) AS BIGINT) AS na_v, CAST(SUM(ib) AS BIGINT) AS nb_v
  FROM tagged GROUP BY 1),
walked AS (
  SELECT v,
         SUM(na_v) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
         SUM(nb_v) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b,
         LEAD(v, 1) OVER (ORDER BY v) AS v_next
  FROM per_v),
tot AS (
  SELECT CAST(SUM(na_v) AS BIGINT) AS n_a_i, CAST(SUM(nb_v) AS BIGINT) AS n_b_i
  FROM per_v),
terms AS (
  SELECT CAST(v_next - v AS HUGEINT)
           * abs(CAST(cum_a AS HUGEINT) * n_b_i - CAST(cum_b AS HUGEINT) * n_a_i)
           AS term,
         n_a_i, n_b_i
  FROM walked CROSS JOIN tot WHERE v_next IS NOT NULL)
SELECT CAST(n_a_i AS BIGINT) AS n_a, CAST(n_b_i AS BIGINT) AS n_b,
       ROUND(CAST(SUM(term) AS DOUBLE)
             / (CAST(n_a_i AS DOUBLE) * n_b_i * 100), 6) AS w1
FROM terms GROUP BY n_a_i, n_b_i
"""


@query("wasserstein_price_drift", oracle=_W1_ORACLE)
def wasserstein_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein-1 (earth-mover) distance between the URGENT and
    LOW order-value distributions — the magnitude-weighted member that
    completes the EDF drift panel: ks_price_drift reports the WORST
    EDF gap, cramer_von_mises_drift the integrated SQUARED gap, this
    query the integrated gap against the VALUE axis, so the statistic
    reads in currency units ("how many dollars of transport separate
    the two distributions") — the one a cost-aware drift gate can
    threshold directly.

    Exactness: per distinct cent value the EDF-gap numerator
    |cum_a*n_b - cum_b*n_a| and the step width are exact
    DECIMAL38/HUGEINT; one final division (by n_a*n_b*100, folding the
    cents->currency conversion into the same division)
    (operators/stats.py:wasserstein_1d).

    Scale: the same distinct-value ordered walk as the CvM/KS legs —
    value-bounded, not row-bounded; everything before it is a map-side
    keyed aggregate."""
    from dawis_spark.operators.stats import wasserstein_1d

    o = spark.table("orders").select(
        "o_orderpriority",
        F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").alias("cents"),
    )
    return wasserstein_1d(
        o, "cents", "o_orderpriority", "1-URGENT", "5-LOW", unit_div=100
    )


_HELL_BINS = 20
_HELL_ORACLE = f"""
WITH tagged AS (
  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS ia,
         CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS ib
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
bounds AS (
  SELECT CAST(MIN(v) AS BIGINT) AS lo, CAST(MAX(v) AS BIGINT) AS hi
  FROM tagged),
binned AS (
  SELECT ia, ib,
         CASE WHEN hi = lo THEN 0 ELSE
           LEAST(CAST((CAST(v AS HUGEINT) - lo) * {_HELL_BINS}
                      // (CAST(hi AS HUGEINT) - lo) AS INT),
                 {_HELL_BINS - 1}) END AS b
  FROM tagged CROSS JOIN bounds),
per_b AS (
  SELECT b, CAST(SUM(ia) AS BIGINT) AS na_b, CAST(SUM(ib) AS BIGINT) AS nb_b
  FROM binned GROUP BY 1),
tot AS (
  SELECT CAST(SUM(na_b) AS BIGINT) AS n_a_i, CAST(SUM(nb_b) AS BIGINT) AS n_b_i
  FROM per_b),
terms AS (
  SELECT b, n_a_i, n_b_i,
         abs(CAST(na_b AS HUGEINT) * n_b_i - CAST(nb_b AS HUGEINT) * n_a_i)
           AS tvd_num,
         sqrt(CAST(CAST(na_b AS HUGEINT) * nb_b AS DOUBLE)) AS bc_term
  FROM per_b CROSS JOIN tot),
agg AS (
  SELECT n_a_i, n_b_i,
         CAST(COUNT(*) AS BIGINT) AS n_occ,
         SUM(tvd_num) AS tvd_s,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(bc_term ORDER BY b)), (a, e) -> a + e) AS bc_s
  FROM terms GROUP BY 1, 2)
SELECT CAST(n_a_i AS BIGINT) AS n_a, CAST(n_b_i AS BIGINT) AS n_b,
       n_occ AS n_bins_occupied,
       ROUND(CAST(tvd_s AS DOUBLE)
             / (2.0 * CAST(n_a_i AS DOUBLE) * n_b_i), 6) AS tvd,
       ROUND(bc_s / (SQRT(CAST(n_a_i AS DOUBLE))
                     * SQRT(CAST(n_b_i AS DOUBLE))), 6) AS bhattacharyya,
       ROUND(SQRT(GREATEST(1.0 - bc_s / (SQRT(CAST(n_a_i AS DOUBLE))
                     * SQRT(CAST(n_b_i AS DOUBLE))), 0.0)), 6) AS hellinger
FROM agg
"""


@query("hellinger_tvd_drift", oracle=_HELL_ORACLE)
def hellinger_tvd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-space divergence pair between the URGENT and LOW order
    value distributions over 20 shared equal-width bins: total
    variation distance (the tightest bound on how much ANY event's
    probability can differ — the certificate number) and Hellinger
    distance (the bounded symmetric f-divergence that, unlike the KL
    family behind psi_value_drift, never diverges on empty bins). The
    binned complement to the EDF panel (KS/CvM/AD/W1): EDF statistics
    answer "did it drift", the histogram pair answers "by how much, in
    probability mass".

    Exactness: bin edges from the pooled exact integer min/max
    (two-phase broadcast); TVD exact until one division; Bhattacharyya
    pays one sqrt per occupied bin over exact integer products, summed
    in a bin-ordered fold (operators/stats.py:hellinger_tvd).

    Scale: two scans (1-row bounds, then bin counts) collapsing to 20
    rows; constant-size tail."""
    from dawis_spark.operators.stats import hellinger_tvd

    o = spark.table("orders").select(
        "o_orderpriority",
        F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").alias("cents"),
    )
    return hellinger_tvd(
        o, "cents", "o_orderpriority", "1-URGENT", "5-LOW", n_bins=_HELL_BINS
    )


_FRIEDMAN_ORACLE = """
WITH cell AS (
  SELECT date_trunc('day', ts) AS blk, event_type AS tr,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2),
ktot AS (SELECT COUNT(DISTINCT tr) AS k0 FROM cell),
complete AS (
  SELECT blk FROM cell GROUP BY blk
  HAVING COUNT(*) = (SELECT k0 FROM ktot)),
cells AS (SELECT cell.* FROM cell JOIN complete USING (blk)),
ranked AS (
  SELECT blk, tr,
         CAST(2 * (COALESCE(COUNT(*) OVER (PARTITION BY blk ORDER BY x
                     RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1)
              + (COUNT(*) OVER (PARTITION BY blk, x) - 1) AS BIGINT) AS r2
  FROM cells),
per_tr AS (
  SELECT tr, CAST(SUM(r2) AS HUGEINT) AS r2_j,
         CAST(COUNT(*) AS BIGINT) AS n_blocks
  FROM ranked GROUP BY 1),
a4t AS (SELECT SUM(CAST(r2 AS HUGEINT) * r2) AS a4 FROM ranked),
kn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(MAX(n_blocks) AS BIGINT) AS n
  FROM per_tr),
s2t AS (
  SELECT k, n,
         SUM((r2_j - CAST(n AS HUGEINT) * (k + 1))
             * (r2_j - CAST(n AS HUGEINT) * (k + 1))) AS s2
  FROM per_tr CROSS JOIN kn GROUP BY k, n)
SELECT CAST(k AS INT) AS k_treatments, CAST(n AS BIGINT) AS n_blocks,
       ROUND(CAST((k - 1) * s2 AS DOUBLE)
             / nullif(CAST(a4 - CAST(n AS HUGEINT) * k * (k + 1) * (k + 1)
                           AS DOUBLE), 0), 6) AS q_stat
FROM s2t CROSS JOIN a4t
"""


@query("friedman_event_types", oracle=_FRIEDMAN_ORACLE)
def friedman_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test: do the event types differ in daily revenue
    when each DAY ranks the types internally? The blocked
    nonparametric ANOVA — kruskal_wallis treats rows as independent
    and would confuse a global weekday/seasonal level with a
    between-type difference; Friedman blocks the per-day level out so
    only the within-day ordering counts (the repeated-measures test a
    dashboard comparison of per-type daily series actually needs).
    Incomplete days (missing a type) are dropped — the classical
    complete-block requirement.

    Exactness: within-day average ranks are doubled dyadics via a
    RANGE-frame strictly-smaller count (deterministic under ties); Q's
    numerator and tie-corrected denominator are exact integers in
    doubled-rank units; ONE division
    (operators/stats.py:friedman_test).

    Scale: one (day, type) rollup; rank windows PARTITIONED by day;
    everything after is |days| x |types| bounded."""
    from dawis_spark.operators.stats import friedman_test

    e = spark.table("events").select(
        F.date_trunc("day", "ts").alias("day"),
        "event_type",
        F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)").alias("cents"),
    )
    return friedman_test(e, "day", "event_type", "cents")


# ---------------------------------------------------------------------------
# Statistical process control: individuals chart + Western Electric rules
# ---------------------------------------------------------------------------

# Individuals (X) chart limits from the moving range: sigma_hat =
# mean(|x_t - x_{t-1}|) / d2 with d2(n=2) = 1.128 (the classical
# Shewhart individuals-chart estimator). mu and sigma are ONE-ROW
# doubles computed from exact integer cent sums; every zone comparison
# is the same expression string on both engines so the booleans are
# bit-identical.
_SPC_X = "CAST(rev AS DOUBLE)"
_SPC_SIDE = (
    f"CASE WHEN {_SPC_X} > mu THEN 1 WHEN {_SPC_X} < mu THEN -1 ELSE 0 END"
)
_SPC_B3 = (
    f"CASE WHEN {_SPC_X} > mu + 3 * sigma OR {_SPC_X} < mu - 3 * sigma"
    " THEN 1 ELSE 0 END"
)
_SPC_A2 = f"CASE WHEN {_SPC_X} > mu + 2 * sigma THEN 1 ELSE 0 END"
_SPC_U2 = f"CASE WHEN {_SPC_X} < mu - 2 * sigma THEN 1 ELSE 0 END"
_SPC_A1 = f"CASE WHEN {_SPC_X} > mu + sigma THEN 1 ELSE 0 END"
_SPC_U1 = f"CASE WHEN {_SPC_X} < mu - sigma THEN 1 ELSE 0 END"
_SPC_UNITS = f"ROUND(({_SPC_X} - mu) / sigma, 4)"

_SPC_ORACLE = f"""
WITH {_DAILY_REV_ORDERS_CTE},
lagd AS (
  SELECT d, rev, LAG(rev) OVER (ORDER BY d) AS prev FROM daily),
lim AS (
  SELECT CAST(SUM(rev) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu,
         CAST(SUM(ABS(rev - prev)) AS DOUBLE)
           / CAST(COUNT(prev) AS DOUBLE) / 1.128 AS sigma
  FROM lagd),
zoned AS (
  SELECT d, rev,
         {_SPC_SIDE} AS side, {_SPC_B3} AS b3, {_SPC_A2} AS a2,
         {_SPC_U2} AS u2, {_SPC_A1} AS a1, {_SPC_U1} AS u1,
         {_SPC_UNITS} AS sigma_units
  FROM daily CROSS JOIN lim),
ruled AS (
  SELECT d, rev, sigma_units, b3 AS rule1,
         CASE WHEN COUNT(*) OVER w9 = 9 AND ABS(SUM(side) OVER w9) = 9
              THEN 1 ELSE 0 END AS rule2,
         CASE WHEN SUM(a2) OVER w3 >= 2 OR SUM(u2) OVER w3 >= 2
              THEN 1 ELSE 0 END AS rule3,
         CASE WHEN SUM(a1) OVER w5 >= 4 OR SUM(u1) OVER w5 >= 4
              THEN 1 ELSE 0 END AS rule4
  FROM zoned
  WINDOW w9 AS (ORDER BY d ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
         w3 AS (ORDER BY d ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
         w5 AS (ORDER BY d ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
SELECT d AS day, rev AS rev_cents, sigma_units, rule1, rule2, rule3, rule4
FROM ruled
WHERE rule1 + rule2 + rule3 + rule4 > 0
ORDER BY day
"""


@query("spc_xbar_breaches", oracle=_SPC_ORACLE)
def spc_xbar_breaches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart individuals control chart on daily revenue with the four
    Western Electric run rules: (1) a point beyond 3 sigma, (2) nine
    consecutive points on one side of the center line, (3) two of three
    consecutive beyond 2 sigma on the same side, (4) four of five
    consecutive beyond 1 sigma on the same side. Control limits use the
    moving-range estimator sigma = mean|x_t - x_{t-1}| / 1.128, the
    standard individuals-chart calibration that survives slow drift
    better than the global stddev. The SPC complement to CUSUM (small
    persistent shifts) and Page-Hinkley (streaming drift): WE rules are
    what a human reads off the chart on a monitoring dashboard.

    Exactness: daily revenue is exact cents; mu/sigma are one-row
    doubles from exact integer sums; every zone flag and run-rule count
    is a shared expression string over those doubles, then exact
    integer window sums — bit-identical engines.

    Scale: one fact-table rollup to the calendar-bounded daily series
    (whitelisted window class); limits are a broadcast one-row
    relation; rules are constant-width (<= 9 row) frames over |days|
    rows."""
    from pyspark.sql import Window

    daily = (
        spark.table("orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("bigint")
            .alias("rev")
        )
    )
    wd = Window.orderBy("d")
    lagd = daily.select("d", "rev", F.lag("rev").over(wd).alias("prev"))
    lim = lagd.agg(
        F.expr("CAST(SUM(rev) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)").alias(
            "mu"
        ),
        F.expr(
            "CAST(SUM(ABS(rev - prev)) AS DOUBLE)"
            " / CAST(COUNT(prev) AS DOUBLE) / 1.128"
        ).alias("sigma"),
    )
    zoned = daily.crossJoin(F.broadcast(lim)).selectExpr(
        "d",
        "rev",
        f"{_SPC_SIDE} AS side",
        f"{_SPC_B3} AS b3",
        f"{_SPC_A2} AS a2",
        f"{_SPC_U2} AS u2",
        f"{_SPC_A1} AS a1",
        f"{_SPC_U1} AS u1",
        f"{_SPC_UNITS} AS sigma_units",
    )
    w9 = wd.rowsBetween(-8, 0)
    w3 = wd.rowsBetween(-2, 0)
    w5 = wd.rowsBetween(-4, 0)
    ruled = zoned.select(
        F.col("d").alias("day"),
        F.col("rev").alias("rev_cents"),
        "sigma_units",
        F.col("b3").alias("rule1"),
        F.when(
            (F.count(F.lit(1)).over(w9) == 9)
            & (F.abs(F.sum("side").over(w9)) == 9),
            1,
        )
        .otherwise(0)
        .alias("rule2"),
        F.when(
            (F.sum("a2").over(w3) >= 2) | (F.sum("u2").over(w3) >= 2), 1
        )
        .otherwise(0)
        .alias("rule3"),
        F.when(
            (F.sum("a1").over(w5) >= 4) | (F.sum("u1").over(w5) >= 4), 1
        )
        .otherwise(0)
        .alias("rule4"),
    )
    return ruled.filter(
        F.col("rule1") + F.col("rule2") + F.col("rule3") + F.col("rule4") > 0
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Always-valid sequential testing (mSPRT) + frequentist power planning
# ---------------------------------------------------------------------------

# Mixture SPRT for a two-sample mean difference under a normal mixture
# prior on the effect (tau^2 = s2/100): at cumulative arm sizes n0/n1,
# V = s2*(1/n0 + 1/n1) and the log e-value is
#   ln L = 0.5*ln(V/(V+tau^2)) + dm^2*tau^2 / (2*V*(V+tau^2)).
# The always-valid p-value is min over time of 1/L, i.e.
# exp(-running_max(ln L)) clamped to 1 — monitoring it continuously
# never inflates alpha (the optional-stopping guarantee the fixed-n
# z-test lacks).
_MSPRT_V = "(s2 * (1.0 / n0 + 1.0 / n1))"
_MSPRT_T2 = "(s2 / 100)"
_MSPRT_LNL = (
    f"(0.5 * ln({_MSPRT_V} / ({_MSPRT_V} + {_MSPRT_T2}))"
    f" + dm * dm * {_MSPRT_T2}"
    f" / (2 * {_MSPRT_V} * ({_MSPRT_V} + {_MSPRT_T2})))"
)
_MSPRT_DM = (
    "(CAST(cs1 AS DOUBLE) / CAST(cn1 AS DOUBLE)"
    " - CAST(cs0 AS DOUBLE) / CAST(cn0 AS DOUBLE))"
)
_MSPRT_S2 = (
    "(CAST(nn * sxx - sx * sx AS DOUBLE)"
    " / (CAST(nn AS DOUBLE) * CAST(nn - 1 AS DOUBLE)))"
)

_MSPRT_ORACLE = f"""
WITH darm AS (
  SELECT o_orderdate AS d, CAST(o_custkey % 2 AS INT) AS arm,
         CAST(COUNT(*) AS BIGINT) AS n_i,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS HUGEINT)) AS s_i
  FROM orders GROUP BY 1, 2),
s2t AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS nn,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS HUGEINT)) AS sx,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS HUGEINT)
             * CAST(ROUND(o_totalprice * 100, 0) AS HUGEINT)) AS sxx
  FROM orders),
byday AS (
  SELECT d,
         CAST(SUM(CASE WHEN arm = 0 THEN n_i ELSE 0 END) AS BIGINT) AS dn0,
         SUM(CASE WHEN arm = 0 THEN s_i ELSE 0 END) AS ds0,
         CAST(SUM(CASE WHEN arm = 1 THEN n_i ELSE 0 END) AS BIGINT) AS dn1,
         SUM(CASE WHEN arm = 1 THEN s_i ELSE 0 END) AS ds1
  FROM darm GROUP BY 1),
cum AS (
  SELECT d,
         SUM(dn0) OVER w AS cn0, SUM(ds0) OVER w AS cs0,
         SUM(dn1) OVER w AS cn1, SUM(ds1) OVER w AS cs1
  FROM byday
  WINDOW w AS (ORDER BY d ROWS UNBOUNDED PRECEDING)),
lnl AS (
  SELECT d, cn0, cn1, dm, {_MSPRT_LNL} AS ln_l
  FROM (
    SELECT d, cn0, cn1, CAST(cn0 AS DOUBLE) AS n0, CAST(cn1 AS DOUBLE) AS n1,
           {_MSPRT_DM} AS dm, {_MSPRT_S2} AS s2
    FROM cum CROSS JOIN s2t
    WHERE cn0 > 0 AND cn1 > 0))
SELECT d AS day, CAST(cn0 AS BIGINT) AS n_ctrl, CAST(cn1 AS BIGINT) AS n_treat,
       ROUND(dm, 4) AS mean_diff_cents,
       ROUND(ln_l, 6) AS log_e_value,
       ROUND(LEAST(1.0, exp(-MAX(ln_l) OVER
             (ORDER BY d ROWS UNBOUNDED PRECEDING))), 6) AS p_always_valid
FROM lnl ORDER BY day
"""


@query("msprt_sequential_monitor", oracle=_MSPRT_ORACLE)
def msprt_sequential_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid sequential A/B monitor: a mixture SPRT (normal
    mixture prior on the effect, tau^2 = s2/100) over the daily
    cumulative per-arm order-value sums, reporting the log e-value and
    the running always-valid p-value exp(-max ln L). This is the
    'peeking-safe' companion to the fixed-horizon z-test: a dashboard
    can read p_always_valid every day and stop the moment it crosses
    alpha without inflating the false-positive rate, which the
    classical test family (welch_ttest_order_value etc.) cannot offer.

    Exactness: per-day per-arm counts/sums and the pooled second moment
    are exact integers (HUGEINT/decimal cents); cumulative sums are
    exact integer window sums; V, tau^2, ln L are shared expression
    strings over one-time double casts; the running max of ln L is
    order-independent — bit-identical engines.

    Scale: one (day, arm) fact rollup, pivoted to |days| rows;
    cumulative and running-max windows ride the calendar-bounded daily
    series (whitelisted class); the second-moment relation is one
    broadcast row."""
    from pyspark.sql import Window

    cents = "CAST(ROUND(o_totalprice * 100, 0) AS DECIMAL(38,0))"
    darm = (
        spark.table("orders")
        .groupBy(
            F.col("o_orderdate").alias("d"),
            F.expr("CAST(o_custkey % 2 AS INT)").alias("arm"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_i"),
            F.sum(F.expr(cents)).alias("s_i"),
        )
    )
    s2t = spark.table("orders").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("nn"),
        F.sum(F.expr(cents)).alias("sx"),
        F.sum(F.expr(f"{cents} * {cents}")).alias("sxx"),
    )
    byday = darm.groupBy("d").agg(
        F.sum(F.when(F.col("arm") == 0, F.col("n_i")).otherwise(0))
        .cast("bigint")
        .alias("dn0"),
        F.sum(
            F.when(F.col("arm") == 0, F.col("s_i")).otherwise(
                F.lit(0).cast("decimal(38,0)")
            )
        ).alias("ds0"),
        F.sum(F.when(F.col("arm") == 1, F.col("n_i")).otherwise(0))
        .cast("bigint")
        .alias("dn1"),
        F.sum(
            F.when(F.col("arm") == 1, F.col("s_i")).otherwise(
                F.lit(0).cast("decimal(38,0)")
            )
        ).alias("ds1"),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = byday.select(
        "d",
        F.sum("dn0").over(w).alias("cn0"),
        F.sum("ds0").over(w).alias("cs0"),
        F.sum("dn1").over(w).alias("cn1"),
        F.sum("ds1").over(w).alias("cs1"),
    )
    lnl = (
        cum.crossJoin(F.broadcast(s2t))
        .filter((F.col("cn0") > 0) & (F.col("cn1") > 0))
        .selectExpr(
            "d",
            "cn0",
            "cn1",
            "CAST(cn0 AS DOUBLE) AS n0",
            "CAST(cn1 AS DOUBLE) AS n1",
            f"{_MSPRT_DM} AS dm",
            f"{_MSPRT_S2} AS s2",
        )
        .selectExpr("d", "cn0", "cn1", "dm", f"{_MSPRT_LNL} AS ln_l")
    )
    return lnl.select(
        F.col("d").alias("day"),
        F.col("cn0").alias("n_ctrl"),
        F.col("cn1").alias("n_treat"),
        F.round("dm", 4).alias("mean_diff_cents"),
        F.round("ln_l", 6).alias("log_e_value"),
        F.round(
            F.least(F.lit(1.0), F.exp(-F.max("ln_l").over(w))), 6
        ).alias("p_always_valid"),
    ).orderBy("day")


# Power planning off the observed metric moments: at per-arm size n,
# se = sqrt(2*s2/n), z = mde/se, power = Phi(z - z_crit). Phi comes from
# the same A&S 7.1.26 erfc polynomial as the p-value helpers
# (1 - Phi(|x|) = 0.5*poly(tt)*exp(-az^2), az = |x|/sqrt(2)) with an
# explicit sign branch so negative arguments are exact mirrors.
_POW_X = "(mde / sqrt(2 * s2 / CAST(n_per_arm AS DOUBLE)) - 1.959963985)"
_POW_E = (
    "(((((1.061405429 * tt - 1.453152027) * tt + 1.421413741) * tt"
    " - 0.284496736) * tt + 0.254829592) * tt * exp(-(az * az)))"
)
_POW_PHI = f"(CASE WHEN x >= 0 THEN 1 - {_POW_E} / 2 ELSE {_POW_E} / 2 END)"

_POWER_ORACLE = f"""
WITH s2t AS (
  SELECT CAST(nn AS DOUBLE) AS nd,
         CAST(sx AS DOUBLE) / CAST(nn AS DOUBLE) AS mean_cents,
         CAST(nn * sxx - sx * sx AS DOUBLE)
           / (CAST(nn AS DOUBLE) * CAST(nn - 1 AS DOUBLE)) AS s2
  FROM (
    SELECT CAST(COUNT(*) AS HUGEINT) AS nn,
           SUM(CAST(ROUND(o_totalprice * 100, 0) AS HUGEINT)) AS sx,
           SUM(CAST(ROUND(o_totalprice * 100, 0) AS HUGEINT)
               * CAST(ROUND(o_totalprice * 100, 0) AS HUGEINT)) AS sxx
    FROM orders)),
grid AS (
  SELECT CAST(n_per_arm AS BIGINT) AS n_per_arm
  FROM (VALUES (1000), (2000), (5000), (10000), (20000), (50000),
               (100000), (200000)) AS g(n_per_arm)),
xs AS (
  SELECT n_per_arm, mean_cents, s2, 0.02 * mean_cents AS mde
  FROM grid CROSS JOIN s2t),
zz AS (SELECT n_per_arm, mean_cents, mde, s2, {_POW_X} AS x FROM xs),
az1 AS (SELECT *, abs(x) / sqrt(2) AS az FROM zz),
tt1 AS (SELECT *, 1 / (1 + 0.3275911 * az) AS tt FROM az1)
SELECT n_per_arm,
       ROUND(mde, 4) AS mde_cents,
       ROUND(sqrt(2 * s2 / CAST(n_per_arm AS DOUBLE)), 4) AS se_cents,
       ROUND({_POW_PHI}, 6) AS power
FROM tt1 ORDER BY n_per_arm
"""


@query("ab_power_curve", oracle=_POWER_ORACLE)
def ab_power_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power planning from observed moments: for a 2% relative
    MDE on mean order value, the two-sample z-test power at a grid of
    per-arm sample sizes (se = sqrt(2*s2/n), power = Phi(mde/se -
    z_0.975)). The design-time companion to the readout queries: CUPED
    tells you how much variance you removed, this tells you how many
    units the NEXT experiment needs.

    Exactness: the metric moments are one-row exact integers; the grid
    is a literal relation; se/z/Phi are shared expression strings with
    the A&S erfc polynomial and an explicit sign branch — bit-identical
    engines.

    Scale: one fact-table moment scan; everything after is the 8-row
    literal grid cross-joined with a broadcast one-row relation."""
    s2t = (
        spark.table("orders")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("nn"),
            F.sum(
                F.expr("CAST(ROUND(o_totalprice * 100, 0) AS DECIMAL(38,0))")
            ).alias("sx"),
            F.sum(
                F.expr(
                    "CAST(ROUND(o_totalprice * 100, 0) AS DECIMAL(38,0))"
                    " * CAST(ROUND(o_totalprice * 100, 0) AS DECIMAL(38,0))"
                )
            ).alias("sxx"),
        )
        .selectExpr(
            "CAST(sx AS DOUBLE) / CAST(nn AS DOUBLE) AS mean_cents",
            "CAST(nn * sxx - sx * sx AS DOUBLE)"
            " / (CAST(nn AS DOUBLE) * CAST(nn - 1 AS DOUBLE)) AS s2",
        )
    )
    grid = spark.createDataFrame(
        [(n,) for n in (1000, 2000, 5000, 10000, 20000, 50000, 100000, 200000)],
        "n_per_arm bigint",
    )
    return (
        grid.crossJoin(F.broadcast(s2t))
        .selectExpr("n_per_arm", "mean_cents", "s2", "0.02 * mean_cents AS mde")
        .selectExpr("n_per_arm", "mean_cents", "mde", "s2", f"{_POW_X} AS x")
        .selectExpr("*", "abs(x) / sqrt(2) AS az")
        .selectExpr("*", "1 / (1 + 0.3275911 * az) AS tt")
        .selectExpr(
            "n_per_arm",
            "ROUND(mde, 4) AS mde_cents",
            "ROUND(sqrt(2 * s2 / CAST(n_per_arm AS DOUBLE)), 4) AS se_cents",
            f"ROUND({_POW_PHI}, 6) AS power",
        )
        .orderBy("n_per_arm")
    )


# ---------------------------------------------------------------------------
# Inclusion-dependency (foreign-key) discovery across the warehouse schema
# ---------------------------------------------------------------------------

# Candidate (child, parent) column pairs: the declared TPC-H-ish keys plus
# the behavioral/corpus links a profiler should PROVE rather than assume,
# and one deliberate reverse direction (does every part appear in
# lineitem?) so the output shows a non-trivial containment < 1 case.
_IND_PAIRS = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("events", "user_id", "customer", "c_custkey"),
    ("embeddings", "vec_id", "documents", "doc_id"),
    ("part", "p_partkey", "lineitem", "l_partkey"),
]


def _ind_oracle() -> str:
    legs = []
    for ct, cc, pt, pc in _IND_PAIRS:
        legs.append(f"""
SELECT '{ct}.{cc}' AS child_col, '{pt}.{pc}' AS parent_col,
       n_child_values, n_contained,
       ROUND(CAST(n_contained AS DOUBLE) / CAST(n_child_values AS DOUBLE), 6)
         AS containment,
       CASE WHEN n_contained = n_child_values THEN 1 ELSE 0 END AS is_inclusion
FROM (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_child_values,
         CAST(SUM(CASE WHEN p.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_contained
  FROM (SELECT DISTINCT {cc} AS k FROM {ct} WHERE {cc} IS NOT NULL) c
  LEFT JOIN (SELECT DISTINCT {pc} AS k FROM {pt} WHERE {pc} IS NOT NULL) p
    ON c.k = p.k)""")
    return (
        "\nUNION ALL\n".join(legs) + "\nORDER BY child_col, parent_col"
    )


@query("inclusion_dependency_profile", oracle=_ind_oracle())
def inclusion_dependency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusion-dependency discovery (FK profiling): for each candidate
    (child, parent) column pair, the distinct-value containment
    |child ∩ parent| / |child| and an is_inclusion verdict. The
    schema-profiling primitive behind referential-integrity checks and
    join-graph inference — dq_integrity_checks asserts the declared
    keys, this one MEASURES candidate keys, including behavioral links
    (events.user_id -> customer) and a deliberate reverse direction
    (part -> lineitem) whose containment < 1 is informative, not a bug.

    Exactness: distinct counts and containment counts are exact
    integers off hash aggregates; the ratio is one shared double
    division rounded at 6.

    Scale: per pair, two distinct aggregates (map-side partial) and one
    hash join on an integer key; small parents (nation/region) broadcast
    under AQE; the union output is |pairs| rows. No pair materializes
    anything wider than the distinct key sets — at 100 TB the heavy
    pairs are the fact-table keys, which is a single shuffle each on an
    already-compact int64 column."""
    results = None
    for ct, cc, pt, pc in _IND_PAIRS:
        child = (
            spark.table(ct)
            .filter(F.col(cc).isNotNull())
            .select(F.col(cc).alias("k"))
            .distinct()
        )
        parent = (
            spark.table(pt)
            .filter(F.col(pc).isNotNull())
            .select(F.col(pc).alias("k"), F.lit(1).alias("hit"))
            .distinct()
        )
        leg = (
            child.join(parent, "k", "left")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_child_values"),
                F.sum(F.when(F.col("hit").isNotNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_contained"),
            )
            .select(
                F.lit(f"{ct}.{cc}").alias("child_col"),
                F.lit(f"{pt}.{pc}").alias("parent_col"),
                "n_child_values",
                "n_contained",
                F.round(
                    F.col("n_contained").cast("double")
                    / F.col("n_child_values").cast("double"),
                    6,
                ).alias("containment"),
                F.when(
                    F.col("n_contained") == F.col("n_child_values"), 1
                )
                .otherwise(0)
                .alias("is_inclusion"),
            )
        )
        results = leg if results is None else results.unionByName(leg)
    return results.orderBy("child_col", "parent_col")


# ---------------------------------------------------------------------------
# Inverse-propensity-weighted treatment effect (observational causal readout)
# ---------------------------------------------------------------------------

# Hajek (self-normalized) IPW means with propensities from the SHARED
# trained logistic model (treatment = the label the classifier family
# already predicts, covariates = the embedding). Weighted contributions
# are integer-scaled (milli-units for y/p, micro-units for 1/p) so the
# sums are exact and order-independent; clipping at [0.05, 0.95] is the
# standard positivity guard.
_IPW_PC = "CASE WHEN p < 0.05 THEN 0.05 WHEN p > 0.95 THEN 0.95 ELSE p END"
_IPW_TWY = "CAST(round(yv / pc * 1000) AS BIGINT)"
_IPW_TW = "CAST(round(1.0 / pc * 1000000) AS BIGINT)"
_IPW_CWY = "CAST(round(yv / (1 - pc) * 1000) AS BIGINT)"
_IPW_CW = "CAST(round(1.0 / (1 - pc) * 1000000) AS BIGINT)"
_IPW_MU1 = "(CAST(s_twy AS DOUBLE) * 1000 / CAST(s_tw AS DOUBLE))"
_IPW_MU0 = "(CAST(s_cwy AS DOUBLE) * 1000 / CAST(s_cw AS DOUBLE))"


def _ipw_oracle(dim: int, iters: int, lr: float) -> str:
    dot = _VEC.dot("xs", "wl", "duck")
    return f"""
WITH {_logreg_chain_ctes(dim, iters, lr, _LOGREG_SAMPLE_LIMIT)},
wlF AS (SELECT list(weight ORDER BY dim) AS wl FROM w{iters}),
scF AS MATERIALIZED (
  SELECT v.vec_id, CAST(v.y AS INT) AS t,
         round(1.0 / (1.0 + exp(-(round({dot}, 6)))), 6) AS p
  FROM v, wlF),
jo AS (
  SELECT t, CAST(d.n_chars AS DOUBLE) AS yv, {_IPW_PC} AS pc
  FROM scF JOIN documents d ON d.doc_id = scF.vec_id),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(t) AS BIGINT) AS n_treat,
         CAST(SUM(CASE WHEN t = 1 THEN {_IPW_TWY} ELSE 0 END) AS BIGINT) AS s_twy,
         CAST(SUM(CASE WHEN t = 1 THEN {_IPW_TW} ELSE 0 END) AS BIGINT) AS s_tw,
         CAST(SUM(CASE WHEN t = 0 THEN {_IPW_CWY} ELSE 0 END) AS BIGINT) AS s_cwy,
         CAST(SUM(CASE WHEN t = 0 THEN {_IPW_CW} ELSE 0 END) AS BIGINT) AS s_cw,
         CAST(SUM(CASE WHEN t = 1 THEN CAST(yv AS BIGINT) ELSE 0 END) AS BIGINT) AS sy1,
         CAST(SUM(CASE WHEN t = 0 THEN CAST(yv AS BIGINT) ELSE 0 END) AS BIGINT) AS sy0
  FROM jo)
SELECT n, n_treat,
       ROUND({_IPW_MU1}, 4) AS mu_treat_ipw,
       ROUND({_IPW_MU0}, 4) AS mu_ctrl_ipw,
       ROUND({_IPW_MU1} - {_IPW_MU0}, 4) AS ate_ipw,
       ROUND(CAST(sy1 AS DOUBLE) / CAST(n_treat AS DOUBLE)
             - CAST(sy0 AS DOUBLE) / CAST(n - n_treat AS DOUBLE), 4) AS ate_naive
FROM agg
"""


@query("ipw_treatment_effect", oracle=_ipw_oracle(64, 3, 1.0))
def ipw_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted average treatment effect of the
    binary document label on document length, with propensities from
    the SHARED trained logistic model (embedding covariates). Reports
    the Hajek self-normalized IPW arm means, the IPW ATE, and the naive
    difference-in-means for contrast — the observational-causal
    companion to cuped (randomized) and diff_in_diff (parallel trends):
    IPW is what you reach for when assignment was NOT randomized but
    the confounders are measured.

    Exactness: propensity scoring replays the oracle's round-6 margin
    fold against the shared bounded-sample weights; clipped weights and
    weighted contributions are integer-scaled (milli/micro units) so
    every sum is exact and order-independent; the two Hajek ratios and
    the naive difference are shared expression strings — bit-identical
    engines.

    Scale: training is memoized and bounded (_LOGREG_SAMPLE_LIMIT);
    scoring + weighting is ONE scan of embeddings joined to documents
    on the key (broadcast-or-shuffle on int64); the output is one row
    of exact integer sums."""
    from dawis_spark.operators.logreg import margin_expr

    w = _trained_logreg_w(spark, sf_dir)
    p = f"round(1.0 / (1.0 + exp(-({margin_expr('embedding', w)}))), 6)"
    scored = spark.table("embeddings").select(
        "vec_id",
        F.expr(f"cast({_LOGREG_Y_SPARK} as int)").alias("t"),
        F.expr(p).alias("p"),
    )
    jo = (
        scored.join(
            spark.table("documents").select("doc_id", "n_chars"),
            F.col("doc_id") == F.col("vec_id"),
        )
        .selectExpr("t", "CAST(n_chars AS DOUBLE) AS yv", f"{_IPW_PC} AS pc")
    )
    agg = jo.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
        F.expr("CAST(SUM(t) AS BIGINT)").alias("n_treat"),
        F.expr(
            f"CAST(SUM(CASE WHEN t = 1 THEN {_IPW_TWY} ELSE 0 END) AS BIGINT)"
        ).alias("s_twy"),
        F.expr(
            f"CAST(SUM(CASE WHEN t = 1 THEN {_IPW_TW} ELSE 0 END) AS BIGINT)"
        ).alias("s_tw"),
        F.expr(
            f"CAST(SUM(CASE WHEN t = 0 THEN {_IPW_CWY} ELSE 0 END) AS BIGINT)"
        ).alias("s_cwy"),
        F.expr(
            f"CAST(SUM(CASE WHEN t = 0 THEN {_IPW_CW} ELSE 0 END) AS BIGINT)"
        ).alias("s_cw"),
        F.expr(
            "CAST(SUM(CASE WHEN t = 1 THEN CAST(yv AS BIGINT) ELSE 0 END)"
            " AS BIGINT)"
        ).alias("sy1"),
        F.expr(
            "CAST(SUM(CASE WHEN t = 0 THEN CAST(yv AS BIGINT) ELSE 0 END)"
            " AS BIGINT)"
        ).alias("sy0"),
    )
    return agg.selectExpr(
        "n",
        "n_treat",
        f"ROUND({_IPW_MU1}, 4) AS mu_treat_ipw",
        f"ROUND({_IPW_MU0}, 4) AS mu_ctrl_ipw",
        f"ROUND({_IPW_MU1} - {_IPW_MU0}, 4) AS ate_ipw",
        "ROUND(CAST(sy1 AS DOUBLE) / CAST(n_treat AS DOUBLE)"
        " - CAST(sy0 AS DOUBLE) / CAST(n - n_treat AS DOUBLE), 4) AS ate_naive",
    )


# ---------------------------------------------------------------------------
# AIPW doubly-robust treatment effect (propensity + outcome model)
# ---------------------------------------------------------------------------

# Per-arm outcome models are closed-form simple OLS of y = n_chars on the
# micro-scaled first embedding coordinate; slope/intercept come from exact
# integer moment sums (round-12 slope: the micro x-axis shrinks the unit
# slope by 1e6, so 12 decimals keep ~8 significant digits), and every
# per-row DR contribution is rounded to milli-units before the exact sum.
_AIPW_B = (
    "ROUND(CAST(n{t} * sxy{t} - sx{t} * sy{t} AS DOUBLE)"
    " / CAST(n{t} * sxx{t} - sx{t} * sx{t} AS DOUBLE), 12)"
)
_AIPW_A = "ROUND((CAST(sy{t} AS DOUBLE) - b{t} * CAST(sx{t} AS DOUBLE)) / n{t}, 6)"
_AIPW_M = "ROUND(a{t} + b{t} * x, 6)"
_AIPW_T1 = "CAST(round((m1 + t * (yv - m1) / pc) * 1000) AS BIGINT)"
_AIPW_T0 = "CAST(round((m0 + (1 - t) * (yv - m0) / (1 - pc)) * 1000) AS BIGINT)"
_AIPW_SUMS = """
         CAST(COUNT(*) AS BIGINT) AS n_all,
         CAST(SUM(t) AS BIGINT) AS n_t,
         CAST(SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN t = 1 THEN x ELSE 0 END) AS {BIG}) AS sx1,
         CAST(SUM(CASE WHEN t = 1 THEN CAST(yv AS BIGINT) ELSE 0 END) AS {BIG}) AS sy1,
         CAST(SUM(CASE WHEN t = 1 THEN x * CAST(yv AS BIGINT) ELSE 0 END) AS {BIG}) AS sxy1,
         CAST(SUM(CASE WHEN t = 1 THEN x * x ELSE 0 END) AS {BIG}) AS sxx1,
         CAST(SUM(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN t = 0 THEN x ELSE 0 END) AS {BIG}) AS sx0,
         CAST(SUM(CASE WHEN t = 0 THEN CAST(yv AS BIGINT) ELSE 0 END) AS {BIG}) AS sy0,
         CAST(SUM(CASE WHEN t = 0 THEN x * CAST(yv AS BIGINT) ELSE 0 END) AS {BIG}) AS sxy0,
         CAST(SUM(CASE WHEN t = 0 THEN x * x ELSE 0 END) AS {BIG}) AS sxx0
"""


def _aipw_oracle(dim: int, iters: int, lr: float) -> str:
    dot = _VEC.dot("xs", "wl", "duck")
    return f"""
WITH {_logreg_chain_ctes(dim, iters, lr, _LOGREG_SAMPLE_LIMIT)},
wlF AS (SELECT list(weight ORDER BY dim) AS wl FROM w{iters}),
scF AS MATERIALIZED (
  SELECT v.vec_id, CAST(v.y AS INT) AS t,
         round(1.0 / (1.0 + exp(-(round({dot}, 6)))), 6) AS p,
         CAST(ROUND(CAST(v.xs[1] AS DOUBLE) * 1000000) AS BIGINT) AS x
  FROM v, wlF),
jo AS MATERIALIZED (
  SELECT t, CAST(d.n_chars AS DOUBLE) AS yv, {_IPW_PC} AS pc, x
  FROM scF JOIN documents d ON d.doc_id = scF.vec_id),
moments AS (
  SELECT {_AIPW_SUMS.format(BIG='HUGEINT')}
  FROM jo),
coefs AS (
  SELECT n_all, n_t, b1, b0,
         {_AIPW_A.format(t='1')} AS a1,
         {_AIPW_A.format(t='0')} AS a0
  FROM (SELECT *, {_AIPW_B.format(t='1')} AS b1, {_AIPW_B.format(t='0')} AS b0
        FROM moments)),
scored AS (
  SELECT jo.t, jo.yv, jo.pc, c.n_all, c.n_t, c.b1, c.b0, m1, m0
  FROM (SELECT jo.*, {_AIPW_M.format(t='1')} AS m1, {_AIPW_M.format(t='0')} AS m0
        FROM jo CROSS JOIN coefs c) jo CROSS JOIN coefs c),
agg AS (
  SELECT MAX(n_all) AS n, MAX(n_t) AS n_treat,
         MAX(b1) AS slope_treat, MAX(b0) AS slope_ctrl,
         CAST(SUM({_AIPW_T1}) AS BIGINT) AS s1,
         CAST(SUM({_AIPW_T0}) AS BIGINT) AS s0
  FROM scored)
SELECT n, n_treat,
       ROUND(slope_treat * 1000000, 6) AS slope_treat_per_unit,
       ROUND(slope_ctrl * 1000000, 6) AS slope_ctrl_per_unit,
       ROUND(CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000), 4) AS mu_treat_dr,
       ROUND(CAST(s0 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000), 4) AS mu_ctrl_dr,
       ROUND(CAST(s1 - s0 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000), 4) AS ate_aipw
FROM agg
"""


@query("aipw_doubly_robust", oracle=_aipw_oracle(64, 3, 1.0))
def aipw_doubly_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Augmented IPW (doubly-robust) average treatment effect of the
    binary document label on document length: the SHARED trained
    logistic propensity (ipw_treatment_effect's) AUGMENTED with
    per-arm outcome regressions (closed-form simple OLS of n_chars on
    the first embedding coordinate). AIPW is consistent if EITHER
    model is right and has strictly lower asymptotic variance than IPW
    when both are — the estimator a production causal pipeline
    actually ships once it has both a propensity and an outcome model.

    Exactness: propensities replay the shared round-6 margin fold; the
    OLS moments are exact HUGEINT/DECIMAL38 sums of micro-scaled
    integers, collapsed to round-12 slopes / round-6 intercepts
    (identical IEEE chains both engines); every per-row DR term is
    rounded to milli-units before the exact integer sum; three final
    divisions.

    Scale: training memoized + bounded (_LOGREG_SAMPLE_LIMIT); the
    moment pass and the scoring pass are each ONE scan of the
    embeddings-documents equi-join (the 1-row coefficient relation
    broadcasts back); output is one row of exact sums."""
    from dawis_spark.operators.logreg import margin_expr

    w = _trained_logreg_w(spark, sf_dir)
    p = f"round(1.0 / (1.0 + exp(-({margin_expr('embedding', w)}))), 6)"
    scored = spark.table("embeddings").select(
        "vec_id",
        F.expr(f"cast({_LOGREG_Y_SPARK} as int)").alias("t"),
        F.expr(p).alias("p"),
        F.expr(
            "CAST(ROUND(CAST(element_at(embedding, 1) AS DOUBLE) * 1000000)"
            " AS BIGINT)"
        ).alias("x"),
    )
    jo = (
        scored.join(
            spark.table("documents").select("doc_id", "n_chars"),
            F.col("doc_id") == F.col("vec_id"),
        )
        .selectExpr(
            "t", "CAST(n_chars AS DOUBLE) AS yv", f"{_IPW_PC} AS pc", "x"
        )
    )
    moments = jo.selectExpr("*").agg(
        *[
            F.expr(e.strip().rstrip(","))
            for e in _AIPW_SUMS.format(BIG="DECIMAL(38,0)").split(",\n")
            if e.strip()
        ]
    )
    coefs = moments.selectExpr(
        "n_all",
        "n_t",
        f"{_AIPW_B.format(t='1')} AS b1",
        f"{_AIPW_B.format(t='0')} AS b0",
        "sx1", "sy1", "n1", "sx0", "sy0", "n0",
    ).selectExpr(
        "n_all",
        "n_t",
        "b1",
        "b0",
        f"{_AIPW_A.format(t='1')} AS a1",
        f"{_AIPW_A.format(t='0')} AS a0",
    )
    scored2 = jo.crossJoin(F.broadcast(coefs)).selectExpr(
        "t",
        "yv",
        "pc",
        "n_all",
        "n_t",
        "b1",
        "b0",
        f"{_AIPW_M.format(t='1')} AS m1",
        f"{_AIPW_M.format(t='0')} AS m0",
    )
    agg = scored2.agg(
        F.max("n_all").alias("n"),
        F.max("n_t").alias("n_treat"),
        F.max("b1").alias("slope_treat"),
        F.max("b0").alias("slope_ctrl"),
        F.expr(f"CAST(SUM({_AIPW_T1}) AS BIGINT)").alias("s1"),
        F.expr(f"CAST(SUM({_AIPW_T0}) AS BIGINT)").alias("s0"),
    )
    return agg.selectExpr(
        "n",
        "n_treat",
        "ROUND(slope_treat * 1000000, 6) AS slope_treat_per_unit",
        "ROUND(slope_ctrl * 1000000, 6) AS slope_ctrl_per_unit",
        "ROUND(CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000), 4)"
        " AS mu_treat_dr",
        "ROUND(CAST(s0 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000), 4)"
        " AS mu_ctrl_dr",
        "ROUND(CAST(s1 - s0 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000), 4)"
        " AS ate_aipw",
    )


# ---------------------------------------------------------------------------
# Iterative proportional fitting (raking) of survey-style cell weights
# ---------------------------------------------------------------------------

_RAKE_ITERS = 4
# one raking half-step: rescale every cell weight so the WEIGHTED margin
# along `dim` hits the uniform target; W is the micro-scaled weight, S the
# current weighted margin sum — one double multiply + divide, then back to
# an exact integer (the shared-expression discipline: identical chain both
# engines)
_RAKE_STEP = (
    "CAST(ROUND(CAST({W} AS DOUBLE)"
    " * (CAST(n_tot AS DOUBLE) * 1000000 / {k})"
    " / CAST({S} AS DOUBLE)) AS BIGINT)"
)


def _rake_oracle(iters: int) -> str:
    steps = []
    prev = "w0"
    for t in range(1, iters + 1):
        steps.append(f"""
r{t} AS (
  SELECT r, p, c, n_tot, n_r, n_p,
         {_RAKE_STEP.format(W='w', S=f'SUM(c * w) OVER (PARTITION BY r)', k='n_r')} AS w
  FROM {prev}),
c{t} AS (
  SELECT r, p, c, n_tot, n_r, n_p,
         {_RAKE_STEP.format(W='w', S=f'SUM(c * w) OVER (PARTITION BY p)', k='n_p')} AS w
  FROM r{t})""")
        prev = f"c{t}"
    return f"""
WITH cells AS (
  SELECT r_name AS r, o_orderpriority AS p,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation   ON n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = n_regionkey
  GROUP BY 1, 2),
dims AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_tot,
         CAST(COUNT(DISTINCT r) AS BIGINT) AS n_r,
         CAST(COUNT(DISTINCT p) AS BIGINT) AS n_p
  FROM cells),
w0 AS (
  SELECT r, p, c, n_tot, n_r, n_p, CAST(1000000 AS BIGINT) AS w
  FROM cells CROSS JOIN dims),
{','.join(steps)}
SELECT r AS region, p AS priority, c AS n_cell,
       ROUND(CAST(w AS DOUBLE) / 1000000, 6) AS weight,
       ROUND(CAST(c AS DOUBLE) * w / 1000000, 2) AS weighted_count
FROM {prev}
ORDER BY region, priority
"""


def _rake_spark_steps(df: DataFrame, iters: int) -> DataFrame:
    from pyspark.sql import Window

    for _ in range(iters):
        for dim_col, k in (("r", "n_r"), ("p", "n_p")):
            win = Window.partitionBy(dim_col)
            df = (
                df.withColumn(
                    "s_margin", F.sum(F.col("c") * F.col("w")).over(win)
                )
                .withColumn(
                    "w", F.expr(_RAKE_STEP.format(W="w", S="s_margin", k=k))
                )
                .drop("s_margin")
            )
    return df


@query("raking_ipf_weights", oracle=_rake_oracle(_RAKE_ITERS))
def raking_ipf_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (raking) of region x priority cell
    weights toward UNIFORM marginal targets — the survey/panel
    reweighting primitive (and the training-data mixing companion to
    mixture_sampled_corpus: raking answers 'what per-cell weights make
    this corpus look like the target marginals' without flattening the
    joint structure the cells carry). 4 full iterations = 8 alternating
    row/column half-steps; IPF converges geometrically, and the fixed
    iteration count makes the trajectory replayable.

    Exactness: cell counts exact; weights live as micro-scaled integers
    and each half-step is the SAME shared expression string both
    engines — one double multiply + divide + round back to integer —
    so the whole 8-step trajectory is bit-identical; display pays two
    final divisions.

    Scale: the star join to build cells is fact-sized (dims broadcast);
    everything after runs on the |regions| x |priorities| = 25-row cell
    relation — partitioned windows over a constant-size table."""
    cells = (
        spark.table("orders")
        .join(
            spark.table("customer"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            spark.table("nation"),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .join(
            spark.table("region"),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .groupBy(
            F.col("r_name").alias("r"), F.col("o_orderpriority").alias("p")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    dims = cells.agg(
        F.sum("c").cast("bigint").alias("n_tot"),
        F.countDistinct("r").cast("bigint").alias("n_r"),
        F.countDistinct("p").cast("bigint").alias("n_p"),
    )
    w0 = cells.crossJoin(F.broadcast(dims)).withColumn(
        "w", F.expr("CAST(1000000 AS BIGINT)")
    )
    out = _rake_spark_steps(w0, _RAKE_ITERS)
    return out.selectExpr(
        "r AS region",
        "p AS priority",
        "c AS n_cell",
        "ROUND(CAST(w AS DOUBLE) / 1000000, 6) AS weight",
        "ROUND(CAST(c AS DOUBLE) * w / 1000000, 2) AS weighted_count",
    ).orderBy("region", "priority")


# ---------------------------------------------------------------------------
# Regression discontinuity: local linear fit on both sides of a cutoff
# ---------------------------------------------------------------------------

_RD_CUT = 450000  # acctbal cutoff, cents
_RD_BW = 200000  # local bandwidth, cents
# side-parameterized closed-form OLS of y (order-spend cents) on the
# centered running variable z = acctbal_cents - cutoff, within the window
_RD_B = (
    "ROUND(CAST(n{s} * szy{s} - sz{s} * sy{s} AS DOUBLE)"
    " / CAST(n{s} * szz{s} - sz{s} * sz{s} AS DOUBLE), 9)"
)
_RD_A = "ROUND((CAST(sy{s} AS DOUBLE) - b{s} * CAST(sz{s} AS DOUBLE)) / n{s}, 4)"
_RD_SUMS = """
         CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nr,
         CAST(SUM(CASE WHEN s = 1 THEN z ELSE 0 END) AS {BIG}) AS szr,
         CAST(SUM(CASE WHEN s = 1 THEN y ELSE 0 END) AS {BIG}) AS syr,
         CAST(SUM(CASE WHEN s = 1 THEN z * y ELSE 0 END) AS {BIG}) AS szyr,
         CAST(SUM(CASE WHEN s = 1 THEN z * z ELSE 0 END) AS {BIG}) AS szzr,
         CAST(SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nl,
         CAST(SUM(CASE WHEN s = 0 THEN z ELSE 0 END) AS {BIG}) AS szl,
         CAST(SUM(CASE WHEN s = 0 THEN y ELSE 0 END) AS {BIG}) AS syl,
         CAST(SUM(CASE WHEN s = 0 THEN z * y ELSE 0 END) AS {BIG}) AS szyl,
         CAST(SUM(CASE WHEN s = 0 THEN z * z ELSE 0 END) AS {BIG}) AS szzl
"""

_RD_ORACLE = f"""
WITH spend AS (
  SELECT o_custkey AS k,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1),
win AS (
  SELECT CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) - {_RD_CUT} AS z,
         COALESCE(s.y, 0) AS y,
         CASE WHEN CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) >= {_RD_CUT}
              THEN 1 ELSE 0 END AS s
  FROM customer c LEFT JOIN spend s ON s.k = c.c_custkey
  WHERE CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)
        BETWEEN {_RD_CUT - _RD_BW} AND {_RD_CUT + _RD_BW - 1}),
moments AS (
  SELECT {_RD_SUMS.format(BIG='HUGEINT')}
  FROM win),
coefs AS (
  SELECT nl, nr, bl, br,
         {_RD_A.format(s='l')} AS al,
         {_RD_A.format(s='r')} AS ar
  FROM (SELECT *, {_RD_B.format(s='l')} AS bl, {_RD_B.format(s='r')} AS br
        FROM moments))
SELECT CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
       ROUND(al / 100, 4) AS intercept_left,
       ROUND(ar / 100, 4) AS intercept_right,
       ROUND(bl, 9) AS slope_left, ROUND(br, 9) AS slope_right,
       ROUND((ar - al) / 100, 4) AS rd_estimate
FROM coefs
"""


@query("regression_discontinuity_spend", oracle=_RD_ORACLE)
def regression_discontinuity_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp regression-discontinuity estimate of the jump in customer
    order spend at an account-balance cutoff (4500.00, +/- 2000.00
    bandwidth): separate local LINEAR fits on each side of the cutoff,
    RD estimate = the difference of the two intercepts AT the cutoff —
    the quasi-experimental design for threshold-assigned treatments
    (credit limits, eligibility scores) where neither randomization
    (cuped), parallel trends (diff_in_diff), nor measured confounding
    (ipw/aipw) applies. Slopes are reported so the reader can see the
    counterfactual trend lines.

    Exactness: the running variable and outcome are exact integer
    cents; all five OLS moments per side are exact HUGEINT/DECIMAL38
    conditional sums from ONE pass; slopes round-9, intercepts round-4
    (identical IEEE chains both engines). Window membership uses
    integer-cent bounds, so both engines cut identically.

    Scale: the spend rollup is one custkey-shuffled aggregate of the
    fact table; the bandwidth filter prunes the dimension scan before
    the (broadcastable) join; moments collapse map-side to one row."""
    spend = spark.table("orders").groupBy(
        F.col("o_custkey").alias("k")
    ).agg(
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
        .cast("bigint")
        .alias("y")
    )
    cents = "CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)"
    win = (
        spark.table("customer")
        .filter(
            F.expr(
                f"{cents} BETWEEN {_RD_CUT - _RD_BW} AND {_RD_CUT + _RD_BW - 1}"
            )
        )
        .join(spend, F.col("k") == F.col("c_custkey"), "left")
        .selectExpr(
            f"{cents} - {_RD_CUT} AS z",
            "COALESCE(y, 0) AS y",
            f"CASE WHEN {cents} >= {_RD_CUT} THEN 1 ELSE 0 END AS s",
        )
    )
    moments = win.agg(
        *[
            F.expr(e.strip().rstrip(","))
            for e in _RD_SUMS.format(BIG="DECIMAL(38,0)").split(",\n")
            if e.strip()
        ]
    )
    coefs = moments.selectExpr(
        "nl",
        "nr",
        f"{_RD_B.format(s='l')} AS bl",
        f"{_RD_B.format(s='r')} AS br",
        "szl", "syl", "szr", "syr",
    ).selectExpr(
        "nl",
        "nr",
        "bl",
        "br",
        f"{_RD_A.format(s='l')} AS al",
        f"{_RD_A.format(s='r')} AS ar",
    )
    return coefs.selectExpr(
        "CAST(nl AS BIGINT) AS n_left",
        "CAST(nr AS BIGINT) AS n_right",
        "ROUND(al / 100, 4) AS intercept_left",
        "ROUND(ar / 100, 4) AS intercept_right",
        "ROUND(bl, 9) AS slope_left",
        "ROUND(br, 9) AS slope_right",
        "ROUND((ar - al) / 100, 4) AS rd_estimate",
    )


# ---------------------------------------------------------------------------
# Offline bandit policy replay: UCB1 over daily event-type rewards
# ---------------------------------------------------------------------------

_UCB_K = 5  # arm slots: the K alphabetically-first event types


def _ucb_uj(j: int) -> str:
    """UCB index of arm j at selection time (r.t plays done): round-6
    of exact-int mean + gmax-scaled exploration. The round-6 fold
    absorbs last-ulp libm ln/sqrt differences between engines."""
    return (
        f"round(CAST(r.cs{j} AS DOUBLE) / r.n{j}"
        f" + CAST(i.gmax AS DOUBLE)"
        f" * sqrt(2 * ln(CAST(r.t AS DOUBLE)) / r.n{j}), 6)"
    )


def _ucb_oracle() -> str:
    k = _UCB_K
    # lowest-index argmax over the K UCB indexes, as a CASE chain
    branches = []
    for j in range(1, k):
        conds = " AND ".join(
            f"{_ucb_uj(j)} >= {_ucb_uj(m)}" for m in range(j + 1, k + 1)
        )
        branches.append(f"WHEN {conds} THEN {j}")
    argmax = f"CASE {' '.join(branches)} ELSE {k} END"
    ch = f"(CASE WHEN i.t <= {k} THEN CAST(i.t AS INT) ELSE ({argmax}) END)"
    rw = (
        f"(CASE {ch} "
        + " ".join(f"WHEN {j} THEN i.r{j}" for j in range(1, k + 1))
        + " END)"
    )
    n_updates = ",\n         ".join(
        f"r.n{j} + CASE WHEN {ch} = {j} THEN 1 ELSE 0 END" for j in range(1, k + 1)
    )
    cs_updates = ",\n         ".join(
        f"r.cs{j} + CASE WHEN {ch} = {j} THEN i.r{j} ELSE CAST(0 AS BIGINT) END"
        for j in range(1, k + 1)
    )
    n_cols = ", ".join(f"n{j}" for j in range(1, k + 1))
    cs_cols = ", ".join(f"cs{j}" for j in range(1, k + 1))
    zeros_n = ", ".join("CAST(0 AS BIGINT)" for _ in range(k))
    piv = ",\n         ".join(
        f"MAX(CASE WHEN j = {j} THEN rmu END) AS r{j}" for j in range(1, k + 1)
    )
    cb = ", ".join(
        f"SUM(r{j}) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)"
        for j in range(1, k + 1)
    )
    return f"""
WITH RECURSIVE ar AS (
  SELECT event_type, date_trunc('day', ts) AS d,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
arms AS (
  SELECT event_type, j FROM (
    SELECT event_type,
           CAST(ROW_NUMBER() OVER (ORDER BY event_type) AS INT) AS j
    FROM (SELECT DISTINCT event_type FROM ar))
  WHERE j <= {k}),
piv AS (
  SELECT d,
         {piv}
  FROM (SELECT d, j, (s * 1000000) // c AS rmu
        FROM ar JOIN arms USING (event_type))
  GROUP BY d HAVING COUNT(*) = {k}),
gm AS (SELECT CAST(MAX(GREATEST(r1, r2, r3, r4, r5)) AS BIGINT) AS gmax
       FROM piv),
ix AS (
  SELECT d, r1, r2, r3, r4, r5, gmax,
         CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t,
         CAST(GREATEST({cb}) AS BIGINT) AS best
  FROM piv CROSS JOIN gm),
rec(t, ch, {n_cols}, {cs_cols}, rw, cum) AS (
  SELECT CAST(0 AS BIGINT), CAST(0 AS INT), {zeros_n}, {zeros_n},
         CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  UNION ALL
  SELECT i.t, {ch},
         {n_updates},
         {cs_updates},
         {rw},
         r.cum + {rw}
  FROM rec r JOIN ix i ON i.t = r.t + 1)
SELECT r.t AS step, i.d AS day, a.event_type AS chosen_arm,
       r.rw AS reward_micro, r.cum AS cum_reward_micro,
       i.best AS best_fixed_micro, i.best - r.cum AS regret_micro
FROM rec r JOIN ix i ON i.t = r.t JOIN arms a ON a.j = r.ch
WHERE r.t >= 1 ORDER BY step
"""


@query("ucb1_replay_daily", oracle=_ucb_oracle())
def ucb1_replay_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline UCB1 bandit replay: each day the policy picks one
    event-type 'arm' by the UCB1 index (exact-integer mean reward in
    micro-cents + a gmax-scaled exploration bonus), observes that arm's
    daily mean value, and updates its state; reported against the
    best-fixed-arm-in-hindsight cumulative so the last column IS the
    regret curve. The offline policy-evaluation primitive behind
    'would an adaptive allocator have beaten our static mix' — the
    sequential counterpart of the one-shot mixture_temperature_weights.

    Exactness: daily rewards are floor-div integer micro-cents (Python
    // == DuckDB //); the replay state (plays, reward sums, cumulative)
    is exact integers; only the UCB index is a double, computed by the
    SAME round-6 expression both engines so the argmax trajectory is
    identical (the holt_winters recursive-state discipline).

    Scale: the distributed part is one (event_type, day) fact rollup;
    the replay walks the collected |days| x K matrix — calendar x
    catalog bounded (the markov_removal bounded-collect precedent), so
    constant in corpus size; the oracle replays it as a recursive CTE
    carrying the K-arm state as columns."""
    import math

    k = _UCB_K
    daily = (
        spark.table("events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("d"))
        .agg(
            F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)"))
            .cast("bigint")
            .alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("c"),
        )
        .collect()
    )
    arms = sorted({r["event_type"] for r in daily})[:k]
    aidx = {a: j for j, a in enumerate(arms)}
    by_day: dict = {}
    for r in daily:
        if r["event_type"] in aidx:
            by_day.setdefault(r["d"], {})[r["event_type"]] = (
                r["s"] * 1000000
            ) // r["c"]
    days = sorted(d for d, m in by_day.items() if len(m) == k)
    mat = [[by_day[d][a] for a in arms] for d in days]
    gmax = max(x for row in mat for x in row)

    def _r6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    n = [0] * k
    cs = [0] * k
    cum = 0
    cb = [0] * k
    rows = []
    for t, (d, rs) in enumerate(zip(days, mat), 1):
        if t <= k:
            ch = t
        else:
            us = [
                _r6(cs[j] / n[j] + gmax * math.sqrt(2 * math.log(t - 1) / n[j]))
                for j in range(k)
            ]
            ch = us.index(max(us)) + 1
        rw = rs[ch - 1]
        n[ch - 1] += 1
        cs[ch - 1] += rw
        cum += rw
        for j in range(k):
            cb[j] += rs[j]
        best = max(cb)
        rows.append((t, d, arms[ch - 1], rw, cum, best, best - cum))
    return spark.createDataFrame(
        rows,
        "step bigint, day timestamp, chosen_arm string, reward_micro bigint,"
        " cum_reward_micro bigint, best_fixed_micro bigint, regret_micro bigint",
    ).orderBy("step")


# ---------------------------------------------------------------------------
# LexRank-style extractive salience: top sentence per document
# ---------------------------------------------------------------------------

_LEX_SCALE = 10**12  # fixed-point score unit (the PageRank scaled-int trick)


_LEX_ORACLE = f"""
WITH sarr AS (
  SELECT doc_id, regexp_split_to_array(text, '[.!?]+') AS sa FROM documents),
sents AS (
  SELECT doc_id, CAST(u.pos AS INT) AS sidx, sa[u.pos] AS sent
  FROM sarr, unnest(range(1, len(sa) + 1)) u(pos)
  WHERE trim(sa[u.pos]) <> ''),
ns AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_s FROM sents GROUP BY 1),
tok AS (
  SELECT DISTINCT doc_id, sidx, w.w AS w
  FROM sents, unnest(regexp_extract_all(lower(sent), '[a-z]+')) w(w)),
edges AS (
  SELECT a.doc_id, a.sidx AS sf, b.sidx AS st,
         CAST(COUNT(*) AS BIGINT) AS ov
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.w = b.w
                        AND a.sidx <> b.sidx
  GROUP BY 1, 2, 3),
rs AS (
  SELECT doc_id, sf, CAST(SUM(ov) AS BIGINT) AS rowsum
  FROM edges GROUP BY 1, 2),
s0 AS (
  SELECT s.doc_id, s.sidx, {_LEX_SCALE} // n.n_s AS score, n.n_s
  FROM sents s JOIN ns n USING (doc_id)),
it1 AS (
  SELECT s.doc_id, s.sidx,
         (15 * {_LEX_SCALE}) // (100 * s.n_s)
           + COALESCE(c.csum, CAST(0 AS BIGINT)) AS score, s.n_s
  FROM s0 s LEFT JOIN (
    SELECT e.doc_id, e.st,
           CAST(SUM((85 * p.score * e.ov) // (100 * r.rowsum)) AS BIGINT)
             AS csum
    FROM edges e
    JOIN s0 p ON p.doc_id = e.doc_id AND p.sidx = e.sf
    JOIN rs r ON r.doc_id = e.doc_id AND r.sf = e.sf
    GROUP BY 1, 2) c ON c.doc_id = s.doc_id AND c.st = s.sidx),
it2 AS (
  SELECT s.doc_id, s.sidx,
         (15 * {_LEX_SCALE}) // (100 * s.n_s)
           + COALESCE(c.csum, CAST(0 AS BIGINT)) AS score, s.n_s
  FROM it1 s LEFT JOIN (
    SELECT e.doc_id, e.st,
           CAST(SUM((85 * p.score * e.ov) // (100 * r.rowsum)) AS BIGINT)
             AS csum
    FROM edges e
    JOIN it1 p ON p.doc_id = e.doc_id AND p.sidx = e.sf
    JOIN rs r ON r.doc_id = e.doc_id AND r.sf = e.sf
    GROUP BY 1, 2) c ON c.doc_id = s.doc_id AND c.st = s.sidx),
ranked AS (
  SELECT doc_id, sidx, n_s, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, sidx) AS rk
  FROM it2)
SELECT doc_id, CAST(n_s AS BIGINT) AS n_sentences,
       sidx AS top_sentence_idx, score AS top_score_scaled
FROM ranked WHERE rk = 1 ORDER BY doc_id
"""


@query("lexrank_top_sentences", oracle=_LEX_ORACLE)
def lexrank_top_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LexRank-style extractive salience: per document, sentences form a
    graph weighted by distinct-word overlap; two damped power-iteration
    steps (d = 0.85) from a uniform vector rank them, and the top
    sentence per doc is reported — the extractive-summarization
    primitive (pick the sentence most central to its own document)
    that complements rake_keyphrases (term-level) with sentence-level
    salience.

    Exactness: overlap counts, row sums, and scores are exact integers
    — scores in 1e-12 fixed point with floor-div transitions (the
    PageRank scaled-int discipline), so both engines walk the identical
    trajectory and the final ROW_NUMBER tie-break (score DESC, sidx) is
    deterministic.

    Scale: sentence split and tokenization are map-side; the overlap
    self-join shuffles on (doc_id, word) and every relation after is
    per-doc bounded (sentence pairs within one document); the ranking
    window is PARTITIONED by doc_id. Nothing global, nothing
    quadratic across documents."""
    docs = spark.table("documents")
    sents = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), r"[.!?]+")).alias(
                "pos0", "sent"
            ),
        )
        .filter(F.trim(F.col("sent")) != "")
        .select(
            "doc_id", (F.col("pos0") + 1).cast("int").alias("sidx"), "sent"
        )
    )
    ns = sents.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_s")
    )
    tok = (
        sents.select(
            "doc_id",
            "sidx",
            F.explode(
                F.expr("regexp_extract_all(lower(sent), '[a-z]+', 0)")
            ).alias("w"),
        )
        .distinct()
    )
    a = tok.alias("a")
    b = tok.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.w") == F.col("b.w"))
            & (F.col("a.sidx") != F.col("b.sidx")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.sidx").alias("sf"),
            F.col("b.sidx").alias("st"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("ov"))
    )
    rs = edges.groupBy("doc_id", "sf").agg(
        F.sum("ov").cast("bigint").alias("rowsum")
    )

    def _iterate(prev: DataFrame) -> DataFrame:
        contrib = (
            edges.join(
                prev.select(
                    F.col("doc_id").alias("p_doc"),
                    F.col("sidx").alias("p_sidx"),
                    F.col("score").alias("p_score"),
                ),
                (F.col("p_doc") == F.col("doc_id"))
                & (F.col("p_sidx") == F.col("sf")),
            )
            .join(
                rs.select(
                    F.col("doc_id").alias("r_doc"),
                    F.col("sf").alias("r_sf"),
                    "rowsum",
                ),
                (F.col("r_doc") == F.col("doc_id"))
                & (F.col("r_sf") == F.col("sf")),
            )
            .groupBy("doc_id", "st")
            .agg(
                F.sum(
                    F.expr("(85 * p_score * ov) DIV (100 * rowsum)")
                )
                .cast("bigint")
                .alias("csum")
            )
        )
        return prev.join(
            contrib.select(
                F.col("doc_id").alias("c_doc"),
                F.col("st").alias("c_st"),
                "csum",
            ),
            (F.col("c_doc") == F.col("doc_id"))
            & (F.col("c_st") == F.col("sidx")),
            "left",
        ).select(
            "doc_id",
            "sidx",
            F.expr(
                f"(15 * {_LEX_SCALE}) DIV (100 * n_s)"
                " + COALESCE(csum, CAST(0 AS BIGINT))"
            ).alias("score"),
            "n_s",
        )

    s0 = sents.join(ns, "doc_id").select(
        "doc_id",
        "sidx",
        F.expr(f"{_LEX_SCALE} DIV n_s").alias("score"),
        "n_s",
    )
    it2 = _iterate(_iterate(s0))
    from pyspark.sql import Window

    wdoc = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("sidx")
    )
    return (
        it2.withColumn("rk", F.row_number().over(wdoc))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            F.col("n_s").alias("n_sentences"),
            F.col("sidx").alias("top_sentence_idx"),
            F.col("score").alias("top_score_scaled"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# BCa bootstrap CI (bias-corrected + accelerated) for the mean order value
# ---------------------------------------------------------------------------

# Jackknife acceleration for the MEAN has a closed form: with
# u_i = n*x_i - S the leave-one-out deviations are u_i / (n(n-1)), and
# the n(n-1) factor cancels in a = sum(u^3) / (6*sum(u^2)^1.5) — so the
# acceleration needs only per-row integer-scaled v = round(u/1e6)
# moments, no second pass. z0 uses the A&S 26.2.23 inverse-normal
# rational approximation; the adjusted alphas go through the same
# A&S 7.1.26 erfc polynomial as the p-value helpers.
_BCA_SCALE = 1000000.0


def _phi_from(x: str, az: str, tt: str) -> str:
    e = (
        f"(((((1.061405429 * {tt} - 1.453152027) * {tt} + 1.421413741) * {tt}"
        f" - 0.284496736) * {tt} + 0.254829592) * {tt} * exp(-({az} * {az})))"
    )
    return f"(CASE WHEN {x} >= 0 THEN 1 - {e} / 2 ELSE {e} / 2 END)"


_BCA_STAGES = [
    ("p0", "CAST(cb AS DOUBLE) / {B}"),
    (
        "pp",
        "CASE WHEN p0 < 1.0 / {B} THEN 1.0 / {B}"
        " WHEN p0 > ({B} - 1.0) / {B} THEN ({B} - 1.0) / {B} ELSE p0 END",
    ),
    ("pl", "least(pp, 1 - pp)"),
    ("tq", "sqrt(-2 * ln(pl))"),
    (
        "zq",
        "tq - (2.515517 + 0.802853 * tq + 0.010328 * tq * tq)"
        " / (1 + 1.432788 * tq + 0.189269 * tq * tq"
        " + 0.001308 * tq * tq * tq)",
    ),
    ("z0", "CASE WHEN pp < 0.5 THEN -zq ELSE zq END"),
    (
        "acc",
        "CAST(sv3 AS DOUBLE) / (6 * power(CAST(sv2 AS DOUBLE), 1.5))",
    ),
    (
        "xl",
        "z0 + (z0 - 1.959963985) / (1 - acc * (z0 - 1.959963985))",
    ),
    (
        "xh",
        "z0 + (z0 + 1.959963985) / (1 - acc * (z0 + 1.959963985))",
    ),
    ("azl", "abs(xl) / sqrt(2)"),
    ("azh", "abs(xh) / sqrt(2)"),
    ("ttl", "1 / (1 + 0.3275911 * azl)"),
    ("tth", "1 / (1 + 0.3275911 * azh)"),
    ("al", _phi_from("xl", "azl", "ttl")),
    ("ah", _phi_from("xh", "azh", "tth")),
    ("rlo", "greatest(1, least({B}, CAST(floor(al * {B}) AS INT) + 1))"),
    ("rhi", "greatest(1, least({B}, CAST(floor(ah * {B}) AS INT) + 1))"),
]


def _bca_oracle() -> str:
    u = f"(((o_orderkey * {_BOOT_B} + t.b) % {_TXT.MOD}) * {_BOOT_A} + {_BOOT_C}) % {_TXT.MOD}"
    w = _bootstrap_weight_case(f"(({u}))")
    chain = "onerow0"
    stages_sql = []
    for i, (col, expr) in enumerate(_BCA_STAGES):
        nxt = f"onerow{i + 1}"
        stages_sql.append(
            f"{nxt} AS (SELECT *, {expr.format(B=_BOOT_B)} AS {col}"
            f" FROM {chain})"
        )
        chain = nxt
    stages_joined = ",\n".join(stages_sql)
    return f"""
WITH base AS (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s
  FROM base),
vm AS (
  SELECT CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS sv2,
         CAST(SUM(CAST(v AS HUGEINT) * v * v) AS HUGEINT) AS sv3
  FROM (
    SELECT CAST(round(CAST(n * cents - s AS DOUBLE) / {_BCA_SCALE})
                AS BIGINT) AS v
    FROM base CROSS JOIN mom)),
expanded AS (
  SELECT t.b AS b, {w} AS w, cents
  FROM base, range(0, {_BOOT_B}) t(b)),
reps AS (
  SELECT b, CAST(SUM(w * cents) AS BIGINT) AS num, CAST(SUM(w) AS BIGINT) AS den
  FROM expanded GROUP BY b),
ranked AS (
  SELECT b, num, den,
         ROW_NUMBER() OVER (ORDER BY CAST(num AS DOUBLE) / den, b) AS rk
  FROM reps),
onerow0 AS (
  SELECT n, s, sv2, sv3,
         CAST(SUM(CASE WHEN CAST(num AS DOUBLE) / den
                            < CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                       THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM ranked CROSS JOIN mom CROSS JOIN vm
  GROUP BY n, s, sv2, sv3),
{stages_joined}
SELECT ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS point_cents,
       ROUND(z0, 6) + 0 AS z0,
       ROUND(acc, 6) + 0 AS acceleration,
       ROUND(al, 6) AS alpha_lo,
       ROUND(ah, 6) AS alpha_hi,
       ROUND(MIN(CASE WHEN rk = rlo THEN CAST(num AS DOUBLE) / den END), 6)
         AS ci_lo_cents,
       ROUND(MIN(CASE WHEN rk = rhi THEN CAST(num AS DOUBLE) / den END), 6)
         AS ci_hi_cents,
       CAST({_BOOT_B} AS BIGINT) AS n_replicates
FROM ranked CROSS JOIN {chain}
GROUP BY s, n, z0, acc, al, ah, rlo, rhi
"""


@query("bca_ci_order_value", oracle=_bca_oracle())
def bca_ci_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BCa (bias-corrected, accelerated) bootstrap CI for mean order
    value — the second-order-accurate upgrade of the percentile CI in
    bootstrap_ci_order_value: z0 corrects median bias of the replicate
    distribution (share of replicates below the point estimate through
    the inverse normal), and the jackknife acceleration 'a' corrects
    for skewness of the influence values; the adjusted alpha levels
    then index the SAME deterministic Poisson-bootstrap replicates.

    Exactness: replicate sums are exact integers (shared Poisson
    weights); the closed-form jackknife uses integer-scaled deviation
    moments (the n(n-1) factor cancels, so only v = round(u/1e6)
    matters); every double step — inverse normal, acceleration, Phi,
    rank selection — is a shared expression string; the final
    endpoints are exact-rank picks over the B=64 replicates.

    Scale: identical to the Poisson bootstrap — one x64 map-side
    fanout into a 64-group aggregate plus one moment scan; everything
    past that is a one-row expression chain and a 64-row rank
    selection."""
    from pyspark.sql import Window

    base = spark.table("orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    mom = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
    )
    vm = (
        base.crossJoin(F.broadcast(mom))
        .selectExpr(
            f"CAST(round(CAST(n * cents - s AS DOUBLE) / {_BCA_SCALE})"
            " AS BIGINT) AS v"
        )
        .agg(
            F.sum(F.expr("CAST(v AS DECIMAL(38,0)) * v")).alias("sv2"),
            F.sum(F.expr("CAST(v AS DECIMAL(38,0)) * v * v")).alias("sv3"),
        )
    )
    u = f"(((o_orderkey * {_BOOT_B} + b) % {_TXT.MOD}) * {_BOOT_A} + {_BOOT_C}) % {_TXT.MOD}"
    expanded = base.select(
        "o_orderkey",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    ).select(
        "b",
        F.expr(_bootstrap_weight_case(f"(({u}))")).alias("w"),
        "cents",
    )
    reps = expanded.groupBy("b").agg(
        F.sum(F.col("w") * F.col("cents")).cast("bigint").alias("num"),
        F.sum("w").cast("bigint").alias("den"),
    )
    ranked = reps.select(
        "b",
        "num",
        "den",
        F.row_number()
        .over(
            Window.orderBy(
                F.col("num").cast("double") / F.col("den"), F.col("b")
            )
        )
        .alias("rk"),
    )
    onerow = (
        ranked.crossJoin(F.broadcast(mom))
        .crossJoin(F.broadcast(vm))
        .groupBy("n", "s", "sv2", "sv3")
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN CAST(num AS DOUBLE) / den"
                    " < CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("cb")
        )
    )
    for col, expr in _BCA_STAGES:
        onerow = onerow.selectExpr(
            "*", f"{expr.format(B=_BOOT_B)} AS {col}"
        )
    return (
        ranked.crossJoin(F.broadcast(onerow))
        .groupBy("s", "n", "z0", "acc", "al", "ah", "rlo", "rhi")
        .agg(
            F.round(
                F.min(
                    F.when(
                        F.col("rk") == F.col("rlo"),
                        F.col("num").cast("double") / F.col("den"),
                    )
                ),
                6,
            ).alias("ci_lo_cents"),
            F.round(
                F.min(
                    F.when(
                        F.col("rk") == F.col("rhi"),
                        F.col("num").cast("double") / F.col("den"),
                    )
                ),
                6,
            ).alias("ci_hi_cents"),
        )
        .selectExpr(
            "ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS point_cents",
            "ROUND(z0, 6) + 0 AS z0",
            "ROUND(acc, 6) + 0 AS acceleration",
            "ROUND(al, 6) AS alpha_lo",
            "ROUND(ah, 6) AS alpha_hi",
            "ci_lo_cents",
            "ci_hi_cents",
            f"CAST({_BOOT_B} AS BIGINT) AS n_replicates",
        )
    )


# ---------------------------------------------------------------------------
# Quantile treatment effects across the experiment arms
# ---------------------------------------------------------------------------

_QTE_GRID = "[0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]"

_QTE_ORACLE = f"""
WITH per AS (
  SELECT quantile_cont(CASE WHEN o_custkey % 2 = 0 THEN o_totalprice END,
                       {_QTE_GRID}) AS q0,
         quantile_cont(CASE WHEN o_custkey % 2 = 1 THEN o_totalprice END,
                       {_QTE_GRID}) AS q1
  FROM orders)
SELECT ROUND(0.1 * u.pos, 1) AS quantile,
       ROUND(q0[u.pos], 6) AS q_ctrl,
       ROUND(q1[u.pos], 6) AS q_treat,
       ROUND(q1[u.pos] - q0[u.pos], 6) AS qte
FROM per, unnest(range(1, 10)) u(pos)
ORDER BY quantile
"""


@query("quantile_treatment_effects", oracle=_QTE_ORACLE)
def quantile_treatment_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects: the per-decile difference between the
    treatment and control order-value distributions (arms by the same
    deterministic custkey split as CUPED/mSPRT). The distributional
    readout the mean-based family can't see — a treatment that helps
    the p20 while hurting the p90 has ATE ~ 0 but a strongly
    non-constant QTE curve.

    Exactness: Spark ``percentile`` and DuckDB ``quantile_cont`` use
    the same linear interpolation on the sorted values (the
    percentiles_by_type precedent); deciles, endpoints, and effects are
    rounded at the same precision.

    Scale: one aggregate with two exact interpolated percentile
    evaluations — at 100 TB swap percentile -> percentile_approx
    (t-digest, mergeable, bounded memory), same plan shape; the exact
    form is the oracle-checkable baseline. Everything after is a 9-row
    literal expansion."""
    per = spark.table("orders").agg(
        F.expr(
            "percentile(CASE WHEN o_custkey % 2 = 0 THEN o_totalprice END,"
            f" array{_QTE_GRID.replace('[', '(').replace(']', ')')})"
        ).alias("q0"),
        F.expr(
            "percentile(CASE WHEN o_custkey % 2 = 1 THEN o_totalprice END,"
            f" array{_QTE_GRID.replace('[', '(').replace(']', ')')})"
        ).alias("q1"),
    )
    return (
        per.select(
            F.explode(F.sequence(F.lit(1), F.lit(9))).alias("pos"),
            "q0",
            "q1",
        )
        .selectExpr(
            "ROUND(0.1 * pos, 1) AS quantile",
            "ROUND(element_at(q0, pos), 6) AS q_ctrl",
            "ROUND(element_at(q1, pos), 6) AS q_treat",
            "ROUND(element_at(q1, pos) - element_at(q0, pos), 6) AS qte",
        )
        .orderBy("quantile")
    )


# ---------------------------------------------------------------------------
# PLSA topic model: fixed-point EM over the documents corpus
# ---------------------------------------------------------------------------

_PLSA_K = 4          # topics
_PLSA_V = 64         # vocabulary (top-df terms)
_PLSA_S = 1000000    # probability fixed-point scale
_PLSA_ITERS = 2      # EM iterations
_PLSA_TOP = 5        # reported terms per topic


def _plsa_den() -> str:
    return " + ".join(f"w{z} * p{z}" for z in range(1, _PLSA_K + 1))


def _plsa_oracle() -> str:
    k, S = _PLSA_K, _PLSA_S
    # init: P(z|d) uniform; P(w|z) proportional to 1 + [(widx-1) % k == z-1]
    # (normalizer 80 = V + V/k), strictly positive and symmetric-breaking
    w0 = ",\n         ".join(
        f"CAST(((1 + CASE WHEN (widx - 1) % {k} = {z - 1} THEN 1 ELSE 0 END)"
        f" * {S}) // {_PLSA_V + _PLSA_V // k} AS BIGINT) AS w{z}"
        for z in range(1, k + 1)
    )
    p0 = ", ".join(f"CAST({S // k} AS BIGINT) AS p{z}" for z in range(1, k + 1))
    its = []
    prev_w, prev_p = "pwz0", "pzd0"
    den = _plsa_den()
    for i in range(1, _PLSA_ITERS + 1):
        nqs = ",\n         ".join(
            f"c.n * ((w{z} * p{z} * {S}) // ({den})) AS nq{z}"
            for z in range(1, k + 1)
        )
        swz = ", ".join(
            f"CAST(SUM(nq{z}) AS BIGINT) AS s{z}" for z in range(1, k + 1)
        )
        tz = ", ".join(
            f"CAST(SUM(s{z}) AS BIGINT) AS t{z}" for z in range(1, k + 1)
        )
        wup = ",\n         ".join(
            f"GREATEST(1, (s{z} * {S}) // t{z}) AS w{z}"
            for z in range(1, k + 1)
        )
        sd = ", ".join(
            f"CAST(SUM(nq{z}) AS BIGINT) AS d{z}" for z in range(1, k + 1)
        )
        dtot = " + ".join(f"d{z}" for z in range(1, k + 1))
        pup = ",\n         ".join(
            f"GREATEST(1, (d{z} * {S}) // ({dtot})) AS p{z}"
            for z in range(1, k + 1)
        )
        its.append(f"""
jo{i} AS (
  SELECT c.doc_id, c.widx, c.n,
         {nqs}
  FROM cnt c JOIN {prev_p} p USING (doc_id) JOIN {prev_w} w USING (widx)),
swz{i} AS (SELECT widx, {swz} FROM jo{i} GROUP BY widx),
tz{i} AS (SELECT {tz} FROM swz{i}),
pwz{i} AS (
  SELECT widx,
         {wup}
  FROM swz{i} CROSS JOIN tz{i}),
pzd{i} AS (
  SELECT doc_id,
         {pup}
  FROM (SELECT doc_id, {sd} FROM jo{i} GROUP BY doc_id))""")
        prev_w, prev_p = f"pwz{i}", f"pzd{i}"
    unpiv = "\nUNION ALL\n".join(
        f"SELECT {z} AS topic, term, w{z} AS p FROM {prev_w}"
        f" JOIN vocab USING (widx)"
        for z in range(1, k + 1)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, w.w AS term
  FROM documents, unnest(regexp_extract_all(lower(text), '[a-z]+')) w(w)),
df AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM tok GROUP BY 1),
vocab AS (
  SELECT term, CAST(ROW_NUMBER() OVER (ORDER BY df DESC, term) AS INT) AS widx
  FROM (SELECT * FROM df ORDER BY df DESC, term LIMIT {_PLSA_V})),
cnt AS (
  SELECT t.doc_id, v.widx, CAST(COUNT(*) AS BIGINT) AS n
  FROM tok t JOIN vocab v USING (term) GROUP BY 1, 2),
pwz0 AS (
  SELECT widx,
         {w0}
  FROM vocab),
pzd0 AS (
  SELECT doc_id, {p0} FROM (SELECT DISTINCT doc_id FROM cnt)),
{','.join(its)},
unpiv AS ({unpiv}),
ranked AS (
  SELECT topic, term, p,
         ROW_NUMBER() OVER (PARTITION BY topic ORDER BY p DESC, term) AS rank
  FROM unpiv)
SELECT topic, CAST(rank AS INT) AS rank, term, p AS p_w_given_z_scaled
FROM ranked WHERE rank <= {_PLSA_TOP} ORDER BY topic, rank
"""


@query("plsa_topic_terms", oracle=_plsa_oracle())
def plsa_topic_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PLSA topic model over the documents corpus: {k} topics, {it} EM
    iterations, top-{top} terms per topic by P(w|z). The E-step
    responsibilities q(z|d,w) and both M-step normalizations run in
    1e-6 fixed point with floor division (strictly positive via a
    GREATEST(1, ...) floor), from a deterministic symmetry-breaking
    init — so the whole EM trajectory is exact integers and the two
    engines walk it bit-for-bit. The topic-modeling primitive the
    corpus-analysis family lacked: mixture weights say how much each
    SOURCE contributes, PLSA says what latent THEMES the text itself
    clusters into.

    Scale: tokenization is map-side; the vocabulary is a top-{v}
    TakeOrdered (catalog-bounded); per EM iteration ONE join of the
    sparse (doc, term) count matrix with the doc-keyed P(z|d) relation
    (shuffle on doc_id) and the broadcast {v}-row P(w|z) relation —
    the E and both M sums are single aggregates over the nnz relation
    with all k topics carried as columns (no explode, no per-topic
    scan). At 100 TB: nnz is linear in corpus size, state is
    |docs| x k + |vocab| x k.""".format(
        k=_PLSA_K, it=_PLSA_ITERS, top=_PLSA_TOP, v=_PLSA_V
    )
    from pyspark.sql import Window

    k, S = _PLSA_K, _PLSA_S
    tok = spark.table("documents").select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("term"),
    )
    df_ = tok.groupBy("term").agg(
        F.countDistinct("doc_id").cast("bigint").alias("df")
    )
    vocab = (
        df_.orderBy(F.col("df").desc(), "term")
        .limit(_PLSA_V)
        .select(
            "term",
            "df",
            F.row_number()
            .over(Window.orderBy(F.col("df").desc(), "term"))
            .cast("int")
            .alias("widx"),
        )
        .select("term", "widx")
    )
    cnt = (
        tok.join(F.broadcast(vocab), "term")
        .groupBy("doc_id", "widx")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    pwz = vocab.selectExpr(
        "widx",
        *[
            f"CAST(((1 + CASE WHEN (widx - 1) % {k} = {z - 1} THEN 1 ELSE 0"
            f" END) * {S}) DIV {_PLSA_V + _PLSA_V // k} AS BIGINT) AS w{z}"
            for z in range(1, k + 1)
        ],
    )
    pzd = cnt.select("doc_id").distinct().selectExpr(
        "doc_id",
        *[f"CAST({S // k} AS BIGINT) AS p{z}" for z in range(1, k + 1)],
    )
    den = _plsa_den()
    for _ in range(_PLSA_ITERS):
        jo = (
            cnt.join(pzd, "doc_id")
            .join(F.broadcast(pwz), "widx")
            .selectExpr(
                "doc_id",
                "widx",
                "n",
                *[
                    f"n * ((w{z} * p{z} * {S}) DIV ({den})) AS nq{z}"
                    for z in range(1, k + 1)
                ],
            )
        )
        swz = jo.groupBy("widx").agg(
            *[
                F.sum(f"nq{z}").cast("bigint").alias(f"s{z}")
                for z in range(1, k + 1)
            ]
        )
        tz = swz.agg(
            *[
                F.sum(f"s{z}").cast("bigint").alias(f"t{z}")
                for z in range(1, k + 1)
            ]
        )
        pwz = swz.crossJoin(F.broadcast(tz)).selectExpr(
            "widx",
            *[
                f"GREATEST(1, (s{z} * {S}) DIV t{z}) AS w{z}"
                for z in range(1, k + 1)
            ],
        )
        dtot = " + ".join(f"d{z}" for z in range(1, k + 1))
        pzd = (
            jo.groupBy("doc_id")
            .agg(
                *[
                    F.sum(f"nq{z}").cast("bigint").alias(f"d{z}")
                    for z in range(1, k + 1)
                ]
            )
            .selectExpr(
                "doc_id",
                *[
                    f"GREATEST(1, (d{z} * {S}) DIV ({dtot})) AS p{z}"
                    for z in range(1, k + 1)
                ],
            )
        )
    unpiv = None
    for z in range(1, k + 1):
        leg = pwz.join(F.broadcast(vocab), "widx").selectExpr(
            f"{z} AS topic", "term", f"w{z} AS p"
        )
        unpiv = leg if unpiv is None else unpiv.unionByName(leg)
    wtop = Window.partitionBy("topic").orderBy(F.col("p").desc(), "term")
    return (
        unpiv.withColumn("rank", F.row_number().over(wtop).cast("int"))
        .filter(F.col("rank") <= _PLSA_TOP)
        .select(
            "topic", "rank", "term", F.col("p").alias("p_w_given_z_scaled")
        )
        .orderBy("topic", "rank")
    )


# ---------------------------------------------------------------------------
# Cohort LTV projection from pooled retention x ARPU
# ---------------------------------------------------------------------------

# Month index = year*12 + month (exact ints both engines); a cohort is a
# customer's first-order month; age = months since cohort. Pooled over
# all cohorts OBSERVABLE at each age (cohort + age <= max month) so late
# cohorts don't bias the tail downward.
_LTV_RET = "(CAST(act AS DOUBLE) / CAST(den AS DOUBLE))"
_LTV_ARPU = "(CAST(rev AS DOUBLE) / 100.0 / CAST(act AS DOUBLE))"

_LTV_ORACLE = f"""
WITH om AS (
  SELECT o_custkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
         CAST(EXTRACT(year FROM o_orderdate) * 12
              + EXTRACT(month FROM o_orderdate) AS BIGINT) AS midx
  FROM orders),
first AS (
  SELECT o_custkey, MIN(midx) AS m0 FROM om GROUP BY 1),
mx AS (SELECT MAX(midx) AS maxm FROM om),
coh AS (
  SELECT m0, CAST(COUNT(*) AS BIGINT) AS sz FROM first GROUP BY 1),
aged AS (
  SELECT om.o_custkey, f.m0, om.midx - f.m0 AS age, om.cents
  FROM om JOIN first f USING (o_custkey)),
act_rev AS (
  SELECT age, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS act,
         CAST(SUM(cents) AS BIGINT) AS rev
  FROM aged GROUP BY 1),
denom AS (
  SELECT a.age, CAST(SUM(c.sz) AS BIGINT) AS den
  FROM (SELECT DISTINCT age FROM aged) a
  JOIN coh c ON c.m0 + a.age <= (SELECT maxm FROM mx)
  GROUP BY 1),
curve AS (
  SELECT age, act, den,
         ROUND({_LTV_RET}, 6) AS retention,
         ROUND({_LTV_ARPU}, 4) AS arpu,
         {_LTV_RET} * {_LTV_ARPU} AS inc
  FROM act_rev JOIN denom USING (age))
SELECT age, act AS n_active, den AS n_observable,
       retention, arpu,
       ROUND(inc, 4) AS incremental_ltv,
       ROUND(SUM(inc) OVER (ORDER BY age ROWS UNBOUNDED PRECEDING), 4)
         AS cumulative_ltv
FROM curve ORDER BY age
"""


@query("ltv_projection_curve", oracle=_LTV_ORACLE)
def ltv_projection_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-value curve from pooled cohort retention and
    ARPU: per month-of-age, the share of observable cohort customers
    still ordering, their average revenue, and the cumulative expected
    value per acquired customer (sum of retention x ARPU over age).
    The projection layer on top of cohort_retention /
    weekly_retention_cohorts: those describe each cohort, this pools
    them into the per-customer value curve an acquisition decision
    actually uses, with the observability guard (cohort + age <= max
    month) so young cohorts don't drag the tail.

    Exactness: month indexes, active counts, observable denominators,
    and revenue are exact integers; retention/ARPU/increments are
    shared expression strings; the cumulative sum runs in explicit age
    order (ROWS frame) so both engines accumulate identically.

    Scale: one customer-keyed first-order aggregate, one age rollup,
    and a months x months observability join — everything after the
    fact scans is calendar-bounded (|ages| <= |months| rows); the
    cumulative window rides that bounded relation (whitelisted
    class)."""
    from pyspark.sql import Window

    om = spark.table("orders").selectExpr(
        "o_custkey",
        "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents",
        "CAST(EXTRACT(year FROM o_orderdate) * 12"
        " + EXTRACT(month FROM o_orderdate) AS BIGINT) AS midx",
    )
    first = om.groupBy("o_custkey").agg(F.min("midx").alias("m0"))
    mx = om.agg(F.max("midx").alias("maxm"))
    coh = first.groupBy("m0").agg(F.count(F.lit(1)).cast("bigint").alias("sz"))
    aged = om.join(first, "o_custkey").select(
        "o_custkey", "m0", (F.col("midx") - F.col("m0")).alias("age"), "cents"
    )
    act_rev = aged.groupBy("age").agg(
        F.countDistinct("o_custkey").cast("bigint").alias("act"),
        F.sum("cents").cast("bigint").alias("rev"),
    )
    denom = (
        aged.select("age")
        .distinct()
        .crossJoin(F.broadcast(mx))
        .join(
            F.broadcast(coh),
            F.col("m0") + F.col("age") <= F.col("maxm"),
        )
        .groupBy("age")
        .agg(F.sum("sz").cast("bigint").alias("den"))
    )
    curve = act_rev.join(denom, "age").selectExpr(
        "age",
        "act",
        "den",
        f"ROUND({_LTV_RET}, 6) AS retention",
        f"ROUND({_LTV_ARPU}, 4) AS arpu",
        f"{_LTV_RET} * {_LTV_ARPU} AS inc",
    )
    w = Window.orderBy("age").rowsBetween(Window.unboundedPreceding, 0)
    return (
        curve.select(
            "age",
            F.col("act").alias("n_active"),
            F.col("den").alias("n_observable"),
            "retention",
            "arpu",
            F.round("inc", 4).alias("incremental_ltv"),
            F.round(F.sum("inc").over(w), 4).alias("cumulative_ltv"),
        )
        .orderBy("age")
    )


# ---------------------------------------------------------------------------
# Randomized response (Warner forced-choice) — local-privacy estimator
# ---------------------------------------------------------------------------

# two deterministic hash-uniform draws per respondent (the DP-histogram
# replay convention: swap for a real RNG in production; the estimator,
# inversion, and error accounting are what the query verifies)
_RR_U1 = (
    "((c_custkey * 1103515245 + 12345) % 1000000007)"
)
_RR_U2 = (
    "((c_custkey * 69069 + 1) % 1000000007)"
)
_RR_TRUTH = "(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END)"
# with prob 1/2 answer truthfully, else answer a fair coin
_RR_REPORT = (
    f"(CASE WHEN {_RR_U1} * 2 < 1000000007 THEN {_RR_TRUTH}"
    f" WHEN {_RR_U2} * 2 < 1000000007 THEN 1 ELSE 0 END)"
)

_RR_ORACLE = f"""
WITH rep AS (
  SELECT {_RR_TRUTH} AS truth, {_RR_REPORT} AS report
  FROM customer),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(report) AS BIGINT) AS n_yes,
         CAST(SUM(truth) AS BIGINT) AS n_true
  FROM rep)
SELECT n, n_yes,
       ROUND(CAST(n_yes AS DOUBLE) / n, 6) AS p_observed,
       ROUND(2.0 * n_yes / n - 0.5, 6) AS pi_hat_rr,
       ROUND(CAST(n_true AS DOUBLE) / n, 6) AS pi_true,
       ROUND(abs(2.0 * n_yes / n - 0.5 - CAST(n_true AS DOUBLE) / n), 6)
         AS abs_err
FROM agg
"""


@query("randomized_response_estimate", oracle=_RR_ORACLE)
def randomized_response_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warner forced-choice randomized response over a sensitive
    customer attribute (acctbal > 5000): each respondent answers
    truthfully with probability 1/2, otherwise flips a fair coin; the
    population rate is recovered by inverting the mechanism, pi_hat =
    2*p_obs - 1/2. The LOCAL-privacy member of the privacy family
    (k_anonymity/l_diversity/t_closeness audit a released table;
    dp_noisy_histogram perturbs aggregates; RR perturbs at the SOURCE
    so the raw data is never sensitive), with the true rate and
    estimator error reported for calibration.

    Determinism: both coin flips are hash-uniform integer draws (the
    dp_noisy_histogram replay convention — a production run swaps in a
    real RNG; the inversion algebra is what this verifies); counts are
    exact, three display divisions.

    Scale: one scan collapsing to a single row."""
    rep = spark.table("customer").selectExpr(
        f"{_RR_TRUTH} AS truth", f"{_RR_REPORT} AS report"
    )
    agg = rep.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("report").cast("bigint").alias("n_yes"),
        F.sum("truth").cast("bigint").alias("n_true"),
    )
    return agg.selectExpr(
        "n",
        "n_yes",
        "ROUND(CAST(n_yes AS DOUBLE) / n, 6) AS p_observed",
        "ROUND(2.0 * n_yes / n - 0.5, 6) AS pi_hat_rr",
        "ROUND(CAST(n_true AS DOUBLE) / n, 6) AS pi_true",
        "ROUND(abs(2.0 * n_yes / n - 0.5 - CAST(n_true AS DOUBLE) / n), 6)"
        " AS abs_err",
    )


# ---------------------------------------------------------------------------
# Negative-binomial method-of-moments fit for overdispersed counts
# ---------------------------------------------------------------------------

_NB_M = "(CAST(s AS DOUBLE) / n)"
_NB_V = "(CAST(n * s2 - s * s AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)))"

_NBFIT_ORACLE = f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
mom AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS HUGEINT) AS s,
         CAST(SUM(c * c) AS HUGEINT) AS s2
  FROM daily GROUP BY 1)
SELECT event_type, n AS n_days,
       ROUND({_NB_M}, 4) AS mean_daily,
       ROUND({_NB_V}, 4) AS var_daily,
       CASE WHEN {_NB_V} > {_NB_M} THEN 1 ELSE 0 END AS overdispersed,
       CASE WHEN {_NB_V} > {_NB_M}
            THEN ROUND({_NB_M} * {_NB_M} / ({_NB_V} - {_NB_M}), 4) END AS r_nb,
       CASE WHEN {_NB_V} > {_NB_M}
            THEN ROUND({_NB_M} / {_NB_V}, 6) END AS p_nb
FROM mom ORDER BY event_type
"""


@query("negative_binomial_fit", oracle=_NBFIT_ORACLE)
def negative_binomial_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-binomial method-of-moments fit of daily event counts
    per type: r = m^2/(v - m), p = m/v when variance exceeds the mean
    — the MODEL the overdispersion_event_counts screen says you need
    (a Poisson rate under-states the tail of bursty counts; NB's r
    parameter quantifies the burstiness, and a capacity plan sized off
    the fitted NB tail is the standard fix). Under-dispersed types
    report NULL parameters rather than a nonsense fit.

    Exactness: moments are exact HUGEINT/DECIMAL38 sums; mean/variance
    and both parameters are shared cleared-denominator double chains;
    round-4/6 display.

    Scale: one daily rollup (calendar x types) then a types-sized
    moment aggregate."""
    daily = (
        spark.table("events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    mom = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("s2"),
    )
    return mom.selectExpr(
        "event_type",
        "n AS n_days",
        f"ROUND({_NB_M}, 4) AS mean_daily",
        f"ROUND({_NB_V}, 4) AS var_daily",
        f"CASE WHEN {_NB_V} > {_NB_M} THEN 1 ELSE 0 END AS overdispersed",
        f"CASE WHEN {_NB_V} > {_NB_M}"
        f" THEN ROUND({_NB_M} * {_NB_M} / ({_NB_V} - {_NB_M}), 4) END AS r_nb",
        f"CASE WHEN {_NB_V} > {_NB_M}"
        f" THEN ROUND({_NB_M} / {_NB_V}, 6) END AS p_nb",
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Differentially-private histogram release (deterministic Laplace replay)
# ---------------------------------------------------------------------------

# Laplace(b = 1/eps) noise by inverse CDF over a hash-uniform
# u in (0, 1): v = u - 0.5, noise = -b * sign(v) * ln(1 - 2|v|).
# Deterministic by design so the release pipeline is TESTABLE — a
# production run swaps the hash for a real RNG; everything else
# (sensitivity, clamping, accounting) is what this query verifies.
_DP_EPS = 0.5
_DP_U = (
    f"(CAST((CAST(n_nationkey AS BIGINT) * {_BOOT_A} + {_BOOT_C})"
    f" % {_TXT.MOD} + 1 AS DOUBLE) / ({_TXT.MOD} + 1))"
)
_DP_NOISE = (
    f"(-(1.0 / {_DP_EPS}) * CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END"
    " * ln(1 - 2 * abs(u - 0.5)))"
)

_DP_ORACLE = f"""
WITH cnts AS (
  SELECT n_nationkey, n_name, CAST(COUNT(*) AS BIGINT) AS true_count
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY 1, 2),
noised AS (
  SELECT n_name, true_count, {_DP_NOISE} AS noise
  FROM (SELECT n_nationkey, n_name, true_count, {_DP_U} AS u FROM cnts))
SELECT n_name, true_count,
       ROUND(noise, 6) AS noise,
       CAST(GREATEST(0, CAST(round(CAST(true_count AS DOUBLE) + noise)
                             AS BIGINT)) AS BIGINT) AS released_count,
       {_DP_EPS} AS epsilon
FROM noised ORDER BY n_name
"""


@query("dp_noisy_histogram", oracle=_DP_ORACLE)
def dp_noisy_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy release simulation: the per-nation order
    histogram with Laplace(1/eps) noise (count sensitivity 1), rounded
    and clamped at zero, with the epsilon accounting column — the
    release side of the privacy family (k_anonymity / l_diversity /
    t_closeness measure the RAW table's risk; this is the noised
    publication path). Noise is drawn by inverse CDF over a
    hash-uniform so the whole release replays deterministically — the
    testability property a DP pipeline needs in CI; production swaps
    the hash for a real RNG and keeps every other step.

    Exactness: counts exact; u, the Laplace inverse CDF, rounding, and
    clamping are shared expression strings — bit-identical engines.

    Scale: one three-table join into a |nations|-row aggregate; the
    noise is a map-side expression on 25 rows."""
    cnts = (
        spark.table("orders")
        .join(
            spark.table("customer"), F.col("o_custkey") == F.col("c_custkey")
        )
        .join(
            F.broadcast(spark.table("nation")),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .groupBy("n_nationkey", "n_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_count"))
    )
    return (
        cnts.selectExpr(
            "n_nationkey", "n_name", "true_count", f"{_DP_U} AS u"
        )
        .selectExpr("n_name", "true_count", f"{_DP_NOISE} AS noise")
        .selectExpr(
            "n_name",
            "true_count",
            "ROUND(noise, 6) AS noise",
            "CAST(GREATEST(0, CAST(round(CAST(true_count AS DOUBLE) + noise)"
            " AS BIGINT)) AS BIGINT) AS released_count",
            f"{_DP_EPS} AS epsilon",
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Cross-source perplexity matrix (unigram LM of each source scoring each)
# ---------------------------------------------------------------------------

# Laplace-smoothed unigram model per source: p(term | m) =
# (cnt_m + 1) / (tot_m + V). Per-term log contributions are
# integer-scaled micro-nats (round(-ln p * 1e6)) so the corpus sums are
# exact and order-independent; perplexity exponentiates the exact mean.
_XPPL_P = "((CAST(cnt_m AS DOUBLE) + 1) / (CAST(tot_m AS DOUBLE) + vv))"
_XPPL_C = f"CAST(round(-ln({_XPPL_P}) * 1000000) AS BIGINT)"

_XPPL_ORACLE = f"""
WITH tok AS (
  SELECT source, w.w AS term
  FROM documents, unnest(regexp_extract_all(lower(text), '[a-z]+')) w(w)),
cnts AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tok GROUP BY 1, 2),
tots AS (
  SELECT source, CAST(SUM(cnt) AS BIGINT) AS tot FROM cnts GROUP BY 1),
vv AS (
  SELECT CAST(COUNT(DISTINCT term) AS DOUBLE) AS vv FROM cnts),
pairs AS (
  SELECT e.source AS eval_source, m.source AS model_source,
         e.term, e.cnt AS cnt_e,
         COALESCE(cm.cnt, 0) AS cnt_m, m.tot AS tot_m, vv.vv AS vv
  FROM cnts e
  CROSS JOIN tots m
  CROSS JOIN vv
  LEFT JOIN cnts cm ON cm.source = m.source AND cm.term = e.term),
ce AS (
  SELECT eval_source, model_source,
         CAST(SUM(cnt_e) AS BIGINT) AS n_tokens,
         CAST(SUM(cnt_e * {_XPPL_C}) AS BIGINT) AS ce_micro
  FROM pairs GROUP BY 1, 2)
SELECT eval_source, model_source, n_tokens, ce_micro,
       ROUND(exp(CAST(ce_micro AS DOUBLE) / 1000000.0
                 / CAST(n_tokens AS DOUBLE)), 4) AS perplexity
FROM ce ORDER BY eval_source, model_source
"""


@query("cross_source_perplexity", oracle=_XPPL_ORACLE)
def cross_source_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source perplexity matrix: a Laplace-smoothed unigram LM per
    source scores every source's text (including its own), giving the
    |sources|^2 matrix whose diagonal is self-perplexity and whose
    off-diagonal asymmetries say which sources are 'surprising' to
    which — the LM-eval companion to source_js_divergence (symmetric,
    distribution-level) for mixture decisions: a source with high
    perplexity under every OTHER model adds diversity; one with low
    cross-perplexity everywhere is redundant.

    Exactness: term counts and totals are exact; each term's
    -ln p is integer-scaled to micro-nats by a shared round expression,
    so the corpus-level sums are exact and order-independent; only the
    final exp/ROUND is a float, from identical inputs.

    Scale: tokenization map-side; the model relation is (source, term)
    — vocab x |sources| bounded; the matrix join is a term-keyed left
    join fanned out over |sources| models (small constant), no row
    explosion beyond nnz x |sources|."""
    tok = spark.table("documents").select(
        "source",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("term"),
    )
    cnts = tok.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    tots = cnts.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("tot")
    )
    vv = cnts.agg(F.countDistinct("term").cast("double").alias("vv"))
    e = cnts.select(
        F.col("source").alias("eval_source"),
        "term",
        F.col("cnt").alias("cnt_e"),
    )
    m = tots.select(
        F.col("source").alias("model_source"), F.col("tot").alias("tot_m")
    )
    cm = cnts.select(
        F.col("source").alias("cm_source"),
        F.col("term").alias("cm_term"),
        F.col("cnt").alias("cnt_m_raw"),
    )
    pairs = (
        e.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(vv))
        .join(
            cm,
            (F.col("cm_source") == F.col("model_source"))
            & (F.col("cm_term") == F.col("term")),
            "left",
        )
        .selectExpr(
            "eval_source",
            "model_source",
            "cnt_e",
            "COALESCE(cnt_m_raw, 0) AS cnt_m",
            "tot_m",
            "vv",
        )
    )
    ce = pairs.groupBy("eval_source", "model_source").agg(
        F.sum("cnt_e").cast("bigint").alias("n_tokens"),
        F.sum(F.expr(f"cnt_e * {_XPPL_C}")).cast("bigint").alias("ce_micro"),
    )
    return ce.selectExpr(
        "eval_source",
        "model_source",
        "n_tokens",
        "ce_micro",
        "ROUND(exp(CAST(ce_micro AS DOUBLE) / 1000000.0"
        " / CAST(n_tokens AS DOUBLE)), 4) AS perplexity",
    ).orderBy("eval_source", "model_source")


DRIVER_PRIORITY: list[str] = [
    # r12 rotation (VERDICT r11 ask #2): the 44 r11-added queries that
    # have NEVER appeared in a driver CORRECTNESS file (locally
    # sweep-green — SWEEP_r11 291/291 — but the driver is the hard
    # signal), plus the 6 queries whose OUTPUT changes this round:
    # the logreg classifier family (bounded-sample shared training,
    # _trained_logreg_w) and the whale-guarded journey queries. After
    # r12, every query in the inventory has driver evidence again.
    #
    # -- output changed this round --
    "logreg_weights",               # r12: bounded-sample numpy training
    "classifier_auc_eval",          # r12: shared trained vector
    "classifier_calibration_curve", # r12: shared trained vector
    "markov_next_event_accuracy",   # r12: whale guard adopted
    "session_entry_exit_bounce",    # r12: whale guard adopted
    "event_transitions",            # r12: whale guard adopted
    # -- the never-driver-checked r11 tail --
    "fellegi_sunter_patterns",
    "fellegi_sunter_em",
    "kaplan_meier_retention",
    "logrank_first_event_groups",
    "shapley_channel_attribution",
    "cs_heavy_hitters",
    "t_closeness_profile",
    "hll_distinct_users_by_type",
    "ljung_box_daily_revenue",
    "ols_price_regression",
    "kde_totalprice_density",
    "decision_stump_discount",
    "naive_bayes_langid",
    "naive_bayes_cv_folds",
    "fdr_bh_nation_urgency",
    "welch_ttest_order_value",
    "anova_order_value_priority",
    "categorical_association_profile",
    "pca_top_component",
    "isotonic_urgency_by_value",
    "cuped_adjusted_arm_means",
    "diff_in_diff_region_value",
    "eb_shrunk_urgent_rates",
    "holt_winters_forecast",
    "holt_backtest_mae",
    "cube_revenue_flag_status",
    "mann_kendall_daily_revenue",
    "granger_orders_to_revenue",
    "heaps_law_vocab_growth",
    "kmeans_silhouette_simplified",
    "overdispersion_event_counts",
    "median_ci_order_value",
    "permutation_test_order_value",
    "markov_stationary_distribution",
    "jackknife_urgent_ratio",
    "chao1_vocab_estimate",
    "psi_value_drift",
    "cochran_armitage_trend",
    "markov_removal_attribution",
    "conformal_interval_price",
    "ece_classifier_calibration",   # r12: also output-changed (shared training)
    "gains_lift_deciles",           # r12: also output-changed (shared training)
    "runs_test_daily_revenue",
    "mcnemar_langid_vs_nb",
]

# Changed or added AFTER the 50-entry driver rotation above was frozen
# (the driver hashes only the first 50 registry names). The r13 rotation
# should put these at the DRIVER_PRIORITY head so no changed query waits
# more than one round for fresh driver evidence.
NEXT_ROTATION: list[str] = [
    "frequent_event_sequences",   # r12: whale guard adopted (r11-driver-green before)
    "whale_guarded_transitions",  # r12: all-whale audit-row fix (r11-driver-green before)
    "page_hinkley_drift",         # r12: new
    "good_turing_unseen_mass",    # r12: new
    "ngram_novelty_rate",         # r12: new
    "pr_curve_classifier",        # r12: new
    "hurst_rescaled_range",       # r12: new
    "contrastive_negative_pairs", # r12: quadratic fix -> bounded pool (output changed)
    "cramer_von_mises_drift",     # r12: new (EDF drift panel)
    "anderson_darling_priorities",# r12: new (EDF drift panel)
    "friedman_event_types",       # r12: new (blocked rank test)
    "spc_xbar_breaches",          # r12: new (WE-rule control chart)
    "msprt_sequential_monitor",   # r12: new (always-valid sequential test)
    "ab_power_curve",             # r12: new (power planning)
    "inclusion_dependency_profile",  # r12: new (FK discovery)
    "ipw_treatment_effect",       # r12: new (observational causal)
    "ucb1_replay_daily",          # r12: new (offline bandit replay)
    "lexrank_top_sentences",      # r12: new (extractive salience)
    "bca_ci_order_value",         # r12: new (BCa bootstrap CI)
    "quantile_treatment_effects", # r12: new (distributional effect)
    "plsa_topic_terms",           # r12: new (topic modeling)
    "ltv_projection_curve",       # r12: new (cohort LTV)
    "dp_noisy_histogram",         # r12: new (DP release)
    "cross_source_perplexity",    # r12: new (LM eval matrix)
    "wasserstein_price_drift",    # r12: new (EDF drift panel, W1)
    "hellinger_tvd_drift",        # r12: new (histogram divergence pair)
    "aipw_doubly_robust",         # r12: new (doubly-robust causal)
    "regression_discontinuity_spend",  # r12: new (RD design)
    "raking_ipf_weights",         # r12: new (IPF survey reweighting)
    "theta_method_forecast",      # r12: new (Theta(0,2) forecaster)
    "croston_intermittent_demand",  # r12: new (intermittent demand)
    "periodogram_daily_revenue",  # r12: new (DFT periodogram)
    "burrows_delta_sources",      # r12: new (stylometric attribution)
    "platt_recalibrated_ece",     # r12: new (post-hoc calibration)
    "capture_recapture_distinct",  # r12: new (Chapman estimator)
    "embedding_isotropy_profile",  # r12: new (collapse diagnostic)
    "grid_dbscan_clusters",       # r12: new (density clustering)
    "matrix_profile_daily",       # r12: new (discord/motif shapes)
    "textrank_keywords",          # r12: new (graph keyword extraction)
    "join_key_skew_profile",      # r12: new (shuffle-skew planning input)
    "qlm_dirichlet_search",       # r12: new (LM retrieval family)
    "cdc_chunk_dedup",            # r12: new (content-defined chunking)
    "randomized_response_estimate",  # r12: new (local privacy)
    "negative_binomial_fit",      # r12: new (overdispersed count model)
    "forecast_model_mase",        # r12: new (model-selection leaderboard)
]



def ordered_queries() -> dict:
    """QUERIES with DRIVER_PRIORITY first, the rest in definition order."""
    out = {n: QUERIES[n] for n in DRIVER_PRIORITY}
    out.update({n: f for n, f in QUERIES.items() if n not in out})
    return out


def ordered_oracles() -> dict:
    return {n: ORACLES[n] for n in ordered_queries() if n in ORACLES}
