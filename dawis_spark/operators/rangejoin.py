"""Time-range join — the interval/as-of family's general member.

Beyond-reference capability: the reference's only temporal logic is the
previous-period lookup (J1) and as-of latest snapshot (J4); a training-data
pipeline also needs "events within Δt of each other" joins (attribution
windows, burst detection, leakage checks between near-simultaneous
records).

Scale design: Spark has no native range-join optimization — a naive
``a.join(b, (b.ts > a.ts) & (b.ts <= a.ts + Δ))`` plans as a
BroadcastNestedLoopJoin (O(|a|x|b|) comparisons, OOM-prone broadcast). The
standard fix is BIN BUCKETING (cf. Databricks' range-join hints): quantize
time into Δ-wide bins, explode the probe side into the two bins its window
can touch, land the build side in its own bin, equi-join on
(keys..., bin), and apply the exact range predicate afterwards. The
nested loop becomes one hash join whose per-bucket fan-out is bounded by
events-per-key-per-Δ — the data's real temporal density, not its size.
Each qualifying pair appears exactly once (the build row has ONE bin), so
no distinct is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bin_col(ts_col: str, width_seconds: int) -> F.Column:
    # session timezone is pinned (session.py), so the ntz->timestamp cast
    # is a deterministic epoch mapping
    return F.expr(
        f"floor(unix_micros(cast({ts_col} as timestamp)) / {width_seconds * 1_000_000})"
    ).cast("bigint")


def following_range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    window_seconds: int = 3600,
    right_prefix: str = "r_",
) -> DataFrame:
    """Pairs (l, r) sharing ``keys`` with r.ts in (l.ts, l.ts + window].

    Output: all left columns + right columns prefixed ``right_prefix``.
    The strict lower bound excludes self-pairs in self-joins (and ties —
    same semantics as the SQL ``b.ts > a.ts`` predicate).
    """
    l = left.withColumn("__bin", F.explode(F.array(
        _bin_col(ts_col, window_seconds),
        _bin_col(ts_col, window_seconds) + F.lit(1),
    )))
    r = right.select(
        *[F.col(k) for k in keys],
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in right.columns
            if c not in keys
        ],
    ).withColumn("__bin", _bin_col(f"{right_prefix}{ts_col}", window_seconds))
    rts = F.col(f"{right_prefix}{ts_col}")
    lts = F.col(ts_col)
    return (
        l.join(r, [*keys, "__bin"])
        .filter((rts > lts) & (rts <= lts + F.expr(f"INTERVAL {window_seconds} SECOND")))
        .drop("__bin")
    )


def following_count(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    ts_col: str = "ts",
    window_seconds: int = 3600,
    out_col: str = "n_following",
) -> DataFrame:
    """Per row: how many same-key rows fall in the (ts, ts + window]
    interval. Rows with no followers keep a 0 (left-outer semantics via
    join-back: the pair relation only carries ids, so the wide row never
    duplicates through the fan-out)."""
    pairs = following_range_join(
        df.select(*keys, id_col, ts_col), df.select(*keys, id_col, ts_col),
        keys, ts_col, window_seconds,
    )
    counts = pairs.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias(out_col)
    )
    return df.join(counts, id_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(0).cast("bigint"))
    )
