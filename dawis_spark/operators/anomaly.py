"""Robust anomaly detection — median/MAD z-scores over grouped metrics.

Extends the reference's threshold alerting (SURVEY §2.5 A5/A6: fixed
comparison checks per line / per aggregate, reference
service/check/*) with the statistical variant a monitoring pipeline
needs once thresholds can't be hand-set per series: flag a point when
its ROBUST z-score — (x - median) / (1.4826 * MAD) — exceeds a cutoff.
Median/MAD instead of mean/stddev so the baseline itself is not dragged
by the outliers it is meant to catch (one traffic spike inflates a
stddev enough to mask the next one; it moves a median by at most one
rank). 1.4826 is the usual consistency constant making MAD estimate
sigma under normality (Hampel 1974; Leys et al. 2013).

Scale shape: callers aggregate the raw stream FIRST (e.g. events ->
daily counts per series), so the per-series sample this operator sees
is time-bounded (#days, #hours) — config-scale per group — while the
number of series can be arbitrarily large. Both medians are exact
per-group aggregates over those bounded samples; the three hash
aggregations and two joins all share the series key, so AQE coalesces
them onto one exchange footprint, and no stage ever materializes
per-row state beyond the bounded group. The quadratic/holistic cost of
exact medians is paid only within a bounded group — the same posture as
the windowed operators (operators/windows.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# MAD -> sigma consistency constant (1 / Phi^-1(3/4)), to 4 decimals as
# commonly published — the oracle embeds the identical literal.
MAD_SIGMA = 1.4826


def robust_zscores(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per-row robust z-score of ``value_col`` within each ``key_cols``
    group, plus an ``is_anomaly`` flag at ``z_threshold``.

    Output: the input keys and value plus (robust_z double, is_anomaly
    boolean). A group with MAD = 0 (over half its points identical)
    yields NULL robust_z and ``is_anomaly = false`` — a degenerate
    baseline refuses to flag rather than dividing by zero; callers who
    want "any deviation from a constant series is anomalous" can test
    ``adev > 0`` themselves.

    Exact two-pass shape: median per group, then median of absolute
    deviations per group. Deterministic: exact medians (rank-averaged on
    even counts, identically in Spark and DuckDB), 6-digit rounding on
    the score.
    """
    med = df.groupBy(*key_cols).agg(F.median(value_col).alias("__med"))
    dev = df.join(med, key_cols).withColumn(
        "__adev", F.abs(F.col(value_col) - F.col("__med"))
    )
    mad = dev.groupBy(*key_cols).agg(F.median("__adev").alias("__mad"))
    z = (F.col(value_col) - F.col("__med")) / F.expr(
        f"nullif({MAD_SIGMA} * __mad, 0)"
    )
    return (
        dev.join(mad, key_cols)
        .withColumn("robust_z", F.round(z, 6))
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(F.col("robust_z")) > z_threshold, F.lit(False)),
        )
        .drop("__med", "__adev", "__mad")
    )


def trend_slopes(
    df: DataFrame,
    key_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-series ordinary-least-squares trend: slope, intercept, and r²
    of ``y_col`` regressed on integer ``x_col`` within each key group —
    the "is this metric drifting" companion to robust_zscores' "did this
    point jump" (a slow steady decline never trips a MAD threshold; a
    slope does).

    Closed-form from the five sufficient statistics (n, Σx, Σy, Σxy,
    Σx²): one partial-aggregated pass, no window, no second scan.
    With integer x (bucket index) and integer-ish y the sums are EXACT
    int64 arithmetic — bit-identical across engines and partitionings —
    and only the final divisions are float (rounded 6). Groups need
    ≥ 2 distinct x for a defined slope; others emit NULLs.

    Scale: the same posture as robust_zscores — callers feed a bucketed
    rollup, so per-group state is five int64s and the exchange carries
    one row per series.
    """
    n = F.count(F.lit(1)).cast("long")
    sx = F.sum(F.col(x_col).cast("long"))
    sy = F.sum(F.col(y_col).cast("long"))
    sxy = F.sum(F.col(x_col).cast("long") * F.col(y_col).cast("long"))
    sxx = F.sum(F.col(x_col).cast("long") * F.col(x_col).cast("long"))
    syy = F.sum(F.col(y_col).cast("long") * F.col(y_col).cast("long"))
    agg = df.groupBy(*key_cols).agg(
        n.alias("__n"), sx.alias("__sx"), sy.alias("__sy"),
        sxy.alias("__sxy"), sxx.alias("__sxx"), syy.alias("__syy"),
    )
    num = F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    slope = num.cast("double") / F.expr(
        "nullif(cast(__n * __sxx - __sx * __sx as double), 0.0)"
    )
    # num² stays off the int64 path (double-double product): num itself is
    # exact int64 and < 2^53, so the conversion loses nothing while the
    # square would risk overflow
    return agg.select(
        *key_cols,
        F.col("__n").alias("n_points"),
        F.round(slope, 6).alias("slope"),
        F.round(
            (F.col("__sy").cast("double") - slope * F.col("__sx")) / F.col("__n"),
            6,
        ).alias("intercept"),
        F.round(
            num.cast("double") * num.cast("double")
            / F.expr(
                "nullif(cast((__n * __sxx - __sx * __sx) as double), 0.0)"
            )
            / F.expr("nullif(cast(__n * __syy - __sy * __sy as double), 0.0)"),
            6,
        ).alias("r2"),
    )


def seasonal_residual_zscores(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    value_col: str,
    season_lag: int = 7,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Seasonal-naive robust anomaly scoring: difference each point
    against the same-phase point one season earlier (x_t - x_{t-lag},
    the seasonal-naive forecast residual), then median/MAD-score the
    RESIDUALS per series. Catches what raw-value scoring cannot: on a
    series with a strong weekly shape, every Sunday looks like an
    outlier to robust_zscores, while a Tuesday outage inside a normal
    week hides in the weekly spread — differencing removes the
    seasonal component first (the cheap, assumption-light end of the
    STL spectrum).

    ``df`` must be one row per (key, bucket) with CONSECUTIVE integer
    buckets per key (gap-fill first — operators/gapfill.py — so lag-k
    really is one season back). The first ``season_lag`` points per
    series have no reference and emit NULL residual/z, never a flag.

    Scale: one lag window per series (ordered by bucket, state = lag
    rows) + the robust_zscores aggregations, all keyed on the series —
    one exchange footprint under AQE, same bounded-group posture as the
    rest of this module.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(bucket_col)
    resid = df.withColumn(
        "residual", F.col(value_col) - F.lag(value_col, season_lag).over(w)
    )
    scored = robust_zscores(
        resid.filter(F.col("residual").isNotNull()),
        key_cols,
        "residual",
        z_threshold,
    )
    missing = resid.filter(F.col("residual").isNull()).select(
        *key_cols,
        bucket_col,
        value_col,
        "residual",
        F.lit(None).cast("double").alias("robust_z"),
        F.lit(False).alias("is_anomaly"),
    )
    return scored.select(
        *key_cols, bucket_col, value_col, "residual", "robust_z", "is_anomaly"
    ).unionByName(missing)


def hampel_outliers(
    series: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
    half_window: int = 3,
    thresh_x10k: int = 44478,
) -> DataFrame:
    """Hampel filter over a daily series: flag points more than
    3 * 1.4826 * MAD from the ROLLING median of the +-half_window-day
    neighborhood — the windowed form of robust_zscores' global test
    (a level shift poisons a global MAD; the rolling window localizes
    the baseline, the standard despike filter in telemetry pipelines).

    Exactness: with a 7-point window both the median and the MAD are
    the 4th order statistic of 7 integers — sort_array + element_at,
    exact ints; the 3-sigma-equivalent threshold compares
    ``|dev| * 10000 > 44478 * MAD`` in pure int64 (3 * 1.4826 = 4.4478
    carried as the integer 44478), so the flag is bit-stable without a
    single float.

    Scale shape: the rolling_median_7d explode fanout — each daily
    total fans to the 2*half_window+1 centers it serves (hash-only
    rows), ONE (key, center) aggregate builds the sorted 7-array,
    windows with incomplete neighborhoods are dropped by count. No
    unbounded window, no per-key sort of the full series.

    Returns flagged rows only: (key, day, value, med, mad, dev).
    """
    k = 2 * half_window + 1
    mid = half_window + 1  # 1-indexed order stat: the median of k
    fan = series.select(
        F.col(key_col).alias("k"),
        F.explode(F.sequence(F.lit(-half_window), F.lit(half_window))).alias("o"),
        F.col(day_col).alias("d"),
        F.col(value_col).alias("v"),
    ).select(
        "k", F.expr("d + make_interval(0, 0, 0, o)").alias("cday"), "v"
    )
    wins = (
        fan.groupBy("k", "cday")
        .agg(
            F.sort_array(F.collect_list("v")).alias("vals"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") == k)
        .select(
            "k",
            "cday",
            F.element_at("vals", mid).alias("med"),
            F.expr(
                f"element_at(array_sort(transform(vals, x -> abs(x - element_at(vals, {mid})))), {mid})"
            ).alias("mad"),
        )
    )
    center = series.select(
        F.col(key_col).alias("k"),
        F.col(day_col).alias("cday"),
        F.col(value_col).alias("v"),
    )
    return (
        center.join(wins, ["k", "cday"])
        .withColumn("dev", F.abs(F.col("v") - F.col("med")))
        .filter(F.col("dev") * 10000 > thresh_x10k * F.col("mad"))
        .select(
            F.col("k").alias(key_col),
            F.col("cday").alias(day_col),
            F.col("v").alias(value_col),
            F.col("med").cast("bigint").alias("med"),
            F.col("mad").cast("bigint").alias("mad"),
            F.col("dev").cast("bigint").alias("dev"),
        )
    )
