"""Dataset profiling — ANALYZE-style column statistics and an
integer-exact distributed Pearson correlation matrix.

Every warehouse front-end the reference feeds (its check/alerting modules
pull aggregate health numbers per column — reference database.py's
query-result checks) wants the same two primitives:

  - COLUMN PROFILE: per column (rows, nulls, ndv, min, max, mean) in one
    pass — the stats block ANALYZE / dbt-utils / Deequ emit, and the
    input to data-quality rules (operators/checks.py consumes exactly
    these shapes).
  - CORRELATION MATRIX: pairwise Pearson r over the numeric measures —
    feature screening for the classifier/logreg family and the standard
    "which metrics move together" dashboard query.

Exactness discipline: naive float moment sums are accumulation-order-
dependent, so both operators first snap values to integer cents
(ROUND(x*100) AS BIGINT). Per-row products stay inside int64 (values
<= ~1e7 cents -> products <= ~1e14); the SUMS are carried as
DECIMAL(38,0) on Spark and HUGEINT on DuckDB — both exact integers — so
n*Sxy - Sx*Sy is computed exactly and the only float ops are the final
correctly-rounded int->double conversions, one sqrt per moment (IEEE
sqrt IS correctly rounded, unlike ln/pow), and one division. Spark and
DuckDB agree to the bit; ROUND(.,6) is belt-and-braces.

Scale shape: one full scan each, everything map-side-partial (a moment
aggregate has no keys; the profile unpivots to (column, value) and
aggregates per column name — |cols| keys). countDistinct is the exact
two-phase plan; at extreme NDV the KMV/HLL sketches in
operators/sketches.py are the drop-in approximate form (same boundary
note as cohort_retention). Nothing is driver-side, nothing is
row-at-a-time Python.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CENT_SCALE = 100  # 2-decimal money/ratio columns -> integer cents


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * CENT_SCALE, 0).cast("bigint")


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column, n_rows, n_null, ndv, min_v, max_v, mean_v) per numeric
    column, one unpivot + one aggregate. mean is exact cents / exact
    count — a single ordered division."""
    stacked = df.select(
        F.expr(
            "stack({n}, {args}) as (col_name, v_cents)".format(
                n=len(cols),
                args=", ".join(
                    f"'{c}', cast(round({c} * {CENT_SCALE}, 0) as bigint)"
                    for c in cols
                ),
            )
        )
    )
    return (
        stacked.groupBy("col_name")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            (F.count("*") - F.count("v_cents")).cast("bigint").alias("n_null"),
            F.countDistinct("v_cents").cast("bigint").alias("ndv"),
            F.round(F.min("v_cents") / CENT_SCALE, 2).alias("min_v"),
            F.round(F.max("v_cents") / CENT_SCALE, 2).alias("max_v"),
            F.round(
                F.sum(F.col("v_cents").cast("decimal(38,0)"))
                / (F.count("v_cents") * CENT_SCALE),
                6,
            )
            .cast("double")
            .alias("mean_v"),
        )
        .orderBy("col_name")
    )


def profile_oracle_sql(table: str, cols: list[str]) -> str:
    parts = []
    for c in cols:
        parts.append(
            f"""
SELECT '{c}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT(v) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT v) AS BIGINT) AS ndv,
       ROUND(MIN(v) / {CENT_SCALE}.0, 2) AS min_v,
       ROUND(MAX(v) / {CENT_SCALE}.0, 2) AS max_v,
       CAST(ROUND(SUM(v) / (COUNT(v) * {CENT_SCALE}.0), 6) AS DOUBLE) AS mean_v
FROM (SELECT CAST(ROUND({c} * {CENT_SCALE}, 0) AS BIGINT) AS v FROM {table})"""
        )
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


def pearson_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson r for every 2-combination of ``cols`` in ONE
    moment-aggregate scan: (col_x, col_y, n, r)."""
    snapped = df.select(
        *[_cents(c).alias(c) for c in cols]
    )
    aggs = [F.count("*").cast("decimal(38,0)").alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).cast("decimal(38,0)")).alias(f"s_{c}"))
        aggs.append(
            F.sum((F.col(c) * F.col(c)).cast("decimal(38,0)")).alias(
                f"ss_{c}_{c}"
            )
        )
    for a, b in combinations(cols, 2):
        aggs.append(
            F.sum((F.col(a) * F.col(b)).cast("decimal(38,0)")).alias(
                f"ss_{a}_{b}"
            )
        )
    m = snapped.agg(*aggs)
    pairs = list(combinations(cols, 2))
    return m.select(
        F.expr(
            "stack({k}, {args}) as (col_x, col_y, n, r)".format(
                k=len(pairs),
                args=", ".join(
                    f"'{a}', '{b}', cast(n as bigint), "
                    f"round(cast(n * ss_{a}_{b} - s_{a} * s_{b} as double)"
                    f" / (sqrt(cast(n * ss_{a}_{a} - s_{a} * s_{a} as double))"
                    f" * sqrt(cast(n * ss_{b}_{b} - s_{b} * s_{b} as double))), 6)"
                    for a, b in pairs
                ),
            )
        )
    ).orderBy("col_x", "col_y")


def pearson_oracle_sql(table: str, cols: list[str]) -> str:
    snaps = ", ".join(
        f"CAST(ROUND({c} * {CENT_SCALE}, 0) AS BIGINT) AS {c}" for c in cols
    )
    moments = ["CAST(COUNT(*) AS HUGEINT) AS n"]
    for c in cols:
        moments.append(f"SUM(CAST({c} AS HUGEINT)) AS s_{c}")
        moments.append(f"SUM(CAST({c} AS HUGEINT) * {c}) AS ss_{c}_{c}")
    for a, b in combinations(cols, 2):
        moments.append(f"SUM(CAST({a} AS HUGEINT) * {b}) AS ss_{a}_{b}")
    selects = []
    for a, b in combinations(cols, 2):
        selects.append(
            f"""
SELECT '{a}' AS col_x, '{b}' AS col_y, CAST(n AS BIGINT) AS n,
       ROUND(CAST(n * ss_{a}_{b} - s_{a} * s_{b} AS DOUBLE)
             / (sqrt(CAST(n * ss_{a}_{a} - s_{a} * s_{a} AS DOUBLE))
                * sqrt(CAST(n * ss_{b}_{b} - s_{b} * s_{b} AS DOUBLE))), 6) AS r
FROM m"""
        )
    return (
        f"WITH snapped AS (SELECT {snaps} FROM {table}),\n"
        f"m AS (SELECT {', '.join(moments)} FROM snapped)\n"
        + " UNION ALL ".join(selects)
        + " ORDER BY col_x, col_y"
    )


def equi_width_histogram(
    df: DataFrame, col: str, n_buckets: int = 20
) -> DataFrame:
    """Equi-width histogram with in-query bounds: (bucket, lo_v, hi_v, n).

    Bucketing is INTEGER-EXACT: values snap to cents, the global
    [min, max] cents come from one map-side-partial aggregate broadcast
    back as a single row, and the bucket index is
    ``least((vc - minc) * B div (maxc - minc), B - 1)`` — integer
    multiply-then-divide, so boundary ties land identically in Spark and
    DuckDB (a float (v-min)/width would round apart at bucket edges).
    Bucket display bounds use the same exact arithmetic.

    Scale shape: two scans (bounds, then bucket-count) — the classic
    ANALYZE trade; the bounds row broadcasts, the count aggregate has
    n_buckets keys, everything map-side-partial. Single-pass variants
    (fixed bounds from metadata, or a sketch) compose by passing bounds
    in; this operator prices the exact two-pass form.
    """
    vc = _cents(col)
    bounds = df.agg(
        F.min(vc).alias("__minc"), F.max(vc).alias("__maxc")
    )
    b = (
        f"cast(least((__vc - __minc) * {n_buckets} div "
        f"greatest(__maxc - __minc, 1), {n_buckets - 1}) as int)"
    )
    lo = f"__minc + (bucket * (__maxc - __minc)) div {n_buckets}"
    hi = f"__minc + ((bucket + 1) * (__maxc - __minc)) div {n_buckets}"
    return (
        df.select(vc.alias("__vc"))
        .filter(F.col("__vc").isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(F.expr(b).alias("bucket"), "__minc", "__maxc")
        .groupBy("bucket", "__minc", "__maxc")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            "bucket",
            F.round(F.expr(lo) / CENT_SCALE, 2).alias("lo_v"),
            F.round(F.expr(hi) / CENT_SCALE, 2).alias("hi_v"),
            "n",
        )
        .orderBy("bucket")
    )


def histogram_oracle_sql(table: str, col: str, n_buckets: int = 20) -> str:
    return f"""
WITH v AS (
  SELECT CAST(ROUND({col} * {CENT_SCALE}, 0) AS BIGINT) AS vc FROM {table}
  WHERE {col} IS NOT NULL),
bounds AS (SELECT MIN(vc) AS minc, MAX(vc) AS maxc FROM v),
bucketed AS (
  SELECT CAST(least((vc - minc) * {n_buckets} // greatest(maxc - minc, 1),
                    {n_buckets - 1}) AS INT) AS bucket,
         minc, maxc
  FROM v, bounds)
SELECT bucket,
       ROUND((minc + (bucket * (maxc - minc)) // {n_buckets}) / {CENT_SCALE}.0, 2) AS lo_v,
       ROUND((minc + ((bucket + 1) * (maxc - minc)) // {n_buckets}) / {CENT_SCALE}.0, 2) AS hi_v,
       CAST(COUNT(*) AS BIGINT) AS n
FROM bucketed GROUP BY bucket, minc, maxc ORDER BY bucket
"""


def k_anonymity_profile(
    df: DataFrame, qi_cols: list[str], thresholds: list[int]
) -> DataFrame:
    """Re-identification risk profile: group by the quasi-identifier
    tuple and report, per k threshold, how many equivalence classes and
    rows fall BELOW k-anonymity (Sweeney 2002) — the release-gate
    number privacy reviews ask for before any record-level export, and
    the PII-redaction family's structural complement (redaction removes
    direct identifiers; k-anonymity measures whether the REMAINING
    quasi-identifiers still single people out).

    Returns (k, n_groups, n_groups_below, n_rows_below, pct_rows_below)
    per threshold. Exact: one count per QI tuple, integer sums, one
    rounded division.

    Scale shape: ONE groupBy over the QI tuple (the only row-scale
    shuffle), then |thresholds| x |groups| aggregation over the
    group-count relation — group-cardinality-bound, no driver state.
    """
    groups = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("gn"))
    thr = ", ".join(str(t) for t in sorted(thresholds))
    return (
        groups.select(
            F.col("gn"), F.expr(f"explode(array({thr}))").alias("k")
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum(F.when(F.col("gn") < F.col("k"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_groups_below"),
            F.sum(F.when(F.col("gn") < F.col("k"), F.col("gn")).otherwise(0))
            .cast("bigint")
            .alias("n_rows_below"),
            F.sum("gn").cast("bigint").alias("__total"),
        )
        .select(
            F.col("k").cast("int").alias("k"),
            "n_groups",
            "n_groups_below",
            "n_rows_below",
            F.round(
                F.col("n_rows_below").cast("double") * 100 / F.col("__total"), 6
            ).alias("pct_rows_below"),
        )
        .orderBy("k")
    )


def k_anonymity_oracle_sql(
    table_expr: str, qi_cols: list[str], thresholds: list[int]
) -> str:
    qi = ", ".join(qi_cols)
    thr = ", ".join(str(t) for t in sorted(thresholds))
    return f"""
WITH grp AS (
  SELECT {qi}, COUNT(*) AS gn FROM {table_expr} GROUP BY {qi}),
fan AS (
  SELECT gn, t.k FROM grp, (SELECT UNNEST([{thr}]) AS k) t)
SELECT CAST(k AS INT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN gn < k THEN 1 ELSE 0 END) AS BIGINT) AS n_groups_below,
       CAST(SUM(CASE WHEN gn < k THEN gn ELSE 0 END) AS BIGINT) AS n_rows_below,
       ROUND(CAST(SUM(CASE WHEN gn < k THEN gn ELSE 0 END) AS DOUBLE) * 100
             / SUM(gn), 6) AS pct_rows_below
FROM fan GROUP BY k ORDER BY k
"""
