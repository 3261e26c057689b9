"""Time-series gap filling — per-key date spine + last-observation-
carried-forward (LOCF).

The hypertable/monitoring counterpart to operators/rollup.py: a metrics
consumer (dashboards, the previous-period join J1, the MAD anomaly
scorer) needs one row per (series, bucket) even when the source emitted
nothing in a bucket — a missing day must read as "no change" (carried
value) or be explicitly flagged, not silently vanish from windows and
joins. Same shape as TimescaleDB's ``time_bucket_gapfill`` + ``locf``
pair re-expressed declaratively.

Scale shape: the spine is generated PER KEY from that key's own
[min, max] bucket range — ``sequence`` + ``explode`` map-side after a
bounded per-key agg — so spine size is series x own-span, never a
global cross join against the calendar. The carry-forward is one
running ``last(ignorenulls)`` window per series ordered by bucket; with
time-bounded retention (every deployment's case) the per-key state is
the bucket count, config-scale. All stages (bounds agg, spine join,
LOCF window) share the series key, so AQE keeps them on one exchange
footprint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_locf(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    value_col: str,
    step: str = "1 day",
) -> DataFrame:
    """Fill missing buckets per key with a generated spine and carry the
    last observed ``value_col`` forward.

    ``df`` must already be bucketed (one row per key per present
    bucket — e.g. a daily aggregate). Output: key cols + (bucket_col,
    value_col [NULL on generated rows], filled [LOCF value], is_gap).
    Leading gaps (before a key's first observation) cannot occur since
    the spine starts at each key's own minimum bucket.
    """
    bounds = df.groupBy(*key_cols).agg(
        F.min(bucket_col).alias("__b0"), F.max(bucket_col).alias("__b1")
    )
    spine = bounds.select(
        *key_cols,
        F.explode(
            F.sequence("__b0", "__b1", F.expr(f"interval {step}"))
        ).alias(bucket_col),
    )
    joined = spine.join(df, [*key_cols, bucket_col], "left")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        joined.withColumn(
            "filled", F.last(value_col, ignorenulls=True).over(w)
        )
        .withColumn("is_gap", F.col(value_col).isNull())
    )


def gapfill_interp(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    value_col: str,
    step: str = "1 day",
) -> DataFrame:
    """Linear interpolation between the surrounding observations — the
    ``interpolate()`` companion to ``locf()`` (TimescaleDB pairing):
    a generated gap row at bucket t between observations (t0, v0) and
    (t1, v1) fills with v0 + (v1 - v0) * (t - t0)/(t1 - t0); trailing
    gaps (no next observation) fall back to carry-forward. Determinism:
    the day offsets are exact integers (datediff) and the fill is ONE
    fixed-order multiply-divide chain rounded to 4 — no accumulation,
    so both engines agree to the digit.

    Same plan skeleton as ``gapfill_locf`` (per-key spine, left join,
    per-key ordered window); the prev/next scans are two frames over one
    window sort — no extra exchange."""
    bounds = df.groupBy(*key_cols).agg(
        F.min(bucket_col).alias("__b0"), F.max(bucket_col).alias("__b1")
    )
    spine = bounds.select(
        *key_cols,
        F.explode(
            F.sequence("__b0", "__b1", F.expr(f"interval {step}"))
        ).alias(bucket_col),
    )
    joined = spine.join(df, [*key_cols, bucket_col], "left")
    wp = (
        Window.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_bucket = F.when(F.col(value_col).isNotNull(), F.col(bucket_col))
    prev_v = F.last(value_col, ignorenulls=True).over(wp)
    prev_b = F.last(obs_bucket, ignorenulls=True).over(wp)
    next_v = F.first(value_col, ignorenulls=True).over(wn)
    next_b = F.first(obs_bucket, ignorenulls=True).over(wn)
    interp = F.round(
        prev_v
        + (next_v - prev_v)
        * F.datediff(F.col(bucket_col), prev_b)
        / F.datediff(next_b, prev_b),
        4,
    )
    return joined.withColumn(
        "filled",
        F.when(F.col(value_col).isNotNull(), F.round(F.col(value_col), 4))
        .when(next_v.isNull(), F.round(prev_v, 4))
        .otherwise(interp),
    ).withColumn("is_gap", F.col(value_col).isNull())
