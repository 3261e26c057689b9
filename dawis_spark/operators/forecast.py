"""Holt linear (double-exponential) smoothing — the trend-aware
forecaster between the EWMA chart (level only) and the seasonal
STL/Holt-Winters family.

The recurrence

    l_t = (x_t + 3*(l_{t-1} + b_{t-1})) div 4        (alpha = 1/4)
    b_t = ((l_t - l_{t-1}) + 7*b_{t-1}) div 8        (beta  = 1/8)

is SEQUENTIAL in t — div-truncation makes it nonlinear, so there is no
impulse-response closed form to unroll declaratively (the trick the
EWMA chart and CUSUM operators use). The honest distributed shape is
therefore per-series stateful iteration: ``applyInPandas`` keyed by the
series id — Arrow-batched, one pass over a CALENDAR-BOUNDED series per
group, state O(1). This is the repo's one batch applyInPandas operator,
and it exists precisely because the semantics genuinely cannot be
expressed by built-in operators (the boundary the UDF policy draws).

Exactness: dyadic smoothing weights (alpha = 1/4, beta = 1/8) keep every
state update in scaled-integer cents with TRUNCATING division — Python
``int(a / b)``-style toward-zero semantics, matching both Spark ``div``
and DuckDB ``//`` — so a recursive CTE replays the whole trajectory
bit-for-bit.

Scale shape (100 TB): groups = series keys (event types, metrics,
domains — catalog-bounded); each group's rows = days (calendar-bounded).
The shuffle is one hash exchange of (key, day, value) daily aggregates,
never raw rows; the pandas step is O(days) per group with two ints of
state. Forecast fan-out is h rows per key.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

from dawis_spark.operators.logreg import _half_up6


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero (Spark div / DuckDB //)."""
    q = abs(a) // b
    return q if (a >= 0) == (b >= 0) else -q


def holt_fit(
    vals: list[int], alpha_den: int = 4, beta_den: int = 8
) -> tuple[int, int]:
    """Fold the Holt recurrence over an ordered value list; returns the
    final (level, trend). Shared by the batch applyInPandas operator
    and the streaming monitor (streaming/holt.py) so batch equivalence
    is equality of one function applied to one history."""
    lvl, tr = vals[0], 0
    for x in vals[1:]:
        lvl_new = _tdiv(x + (alpha_den - 1) * (lvl + tr), alpha_den)
        tr = _tdiv((lvl_new - lvl) + (beta_den - 1) * tr, beta_den)
        lvl = lvl_new
    return lvl, tr


def holt_residual_walk(
    series: list[tuple[int, int]], alpha_den: int = 4, beta_den: int = 8
) -> list[tuple[int, int, int, int, int]]:
    """One-step-ahead Holt residuals over a sorted (bucket, value)
    series: [(bucket, forecast, resid, n_prior, sum_abs_prior)] for
    every bucket after the first (which only initializes the state).
    ``forecast`` is the PRE-update l + b — what the model predicted for
    this bucket before seeing it — so ``resid`` is the honest
    out-of-sample one-step error; ``n_prior``/``sum_abs_prior`` carry
    the count and L1 mass of the residuals BEFORE this bucket, the
    exact-integer sufficient statistics of the trailing mean-absolute-
    residual threshold (see :func:`first_holt_residual_breach`). One
    pass, all-integer — shared by the streaming monitor
    (streaming/forecastmon.py), the batch query, and the oracle replay
    (same trunc-div recurrence as :func:`holt_fit`)."""
    out: list[tuple[int, int, int, int, int]] = []
    lvl, tr = series[0][1], 0
    n_prior, sum_abs = 0, 0
    for b, x in series[1:]:
        f = lvl + tr
        r = x - f
        out.append((b, f, r, n_prior, sum_abs))
        n_prior += 1
        sum_abs += abs(r)
        lvl_new = _tdiv(x + (alpha_den - 1) * (lvl + tr), alpha_den)
        tr = _tdiv((lvl_new - lvl) + (beta_den - 1) * tr, beta_den)
        lvl = lvl_new
    return out


def first_holt_residual_breach(
    series: list[tuple[int, int]],
    k_milli: int = 3000,
    min_resid: int = 8,
    alpha_den: int = 4,
    beta_den: int = 8,
) -> tuple[int, int, int, int, int] | None:
    """First (bucket, forecast, resid, n_prior, sum_abs_prior) whose
    one-step residual exceeds k x the trailing mean absolute residual,
    or None. The comparison is EXACT integer cross-multiplication —
    |resid| * n_prior * 1000 > k_milli * sum_abs_prior — with at least
    ``min_resid`` prior residuals (the warmup below which the trailing
    mean is noise). A dead-flat history (sum_abs_prior == 0) alerts on
    ANY nonzero residual after warmup — deliberate: a first wiggle on a
    constant series is exactly the surprise a monitor exists for."""
    for b, f, r, n, s in holt_residual_walk(series, alpha_den, beta_den):
        if n >= min_resid and abs(r) * n * 1000 > k_milli * s:
            return (b, f, r, n, s)
    return None


def holt_linear(
    series: DataFrame,
    key_col: str,
    ord_col: str,
    value_col: str,
    horizon: int = 7,
    alpha_den: int = 4,
    beta_den: int = 8,
) -> DataFrame:
    """Per-key Holt linear smoothing with alpha = 1/alpha_den,
    beta = 1/beta_den (dyadic), init l_1 = x_1, b_1 = 0. Returns
    (key, h, forecast, level, trend, n_points) with forecast =
    l_n + h * b_n for h in 1..horizon. All-integer, trunc-div."""
    out_schema = (
        f"{key_col} string, h int, forecast bigint, "
        "level bigint, trend bigint, n_points bigint"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ord_col)
        key = pdf[key_col].iloc[0]
        vals = [int(v) for v in pdf[value_col]]
        lvl, tr = holt_fit(vals, alpha_den, beta_den)
        return pd.DataFrame(
            {
                key_col: [key] * horizon,
                "h": list(range(1, horizon + 1)),
                "forecast": [lvl + h * tr for h in range(1, horizon + 1)],
                "level": [lvl] * horizon,
                "trend": [tr] * horizon,
                "n_points": [len(vals)] * horizon,
            }
        )

    return series.groupBy(key_col).applyInPandas(fit, out_schema)


def holt_oracle_ctes(
    daily_cte: str,
    key_col: str,
    ord_col: str,
    value_col: str,
    horizon: int = 7,
    alpha_den: int = 4,
    beta_den: int = 8,
) -> str:
    """DuckDB replay of ``holt_linear``: recursive CTE carrying (l, b)
    per key, ending in ``holt(key, h, forecast, level, trend,
    n_points)``. Embed under WITH RECURSIVE."""
    a1 = alpha_den - 1
    b1 = beta_den - 1
    return f"""
hl_ix AS (
  SELECT {key_col} AS k, {value_col} AS x,
         ROW_NUMBER() OVER (PARTITION BY {key_col} ORDER BY {ord_col}) AS t,
         COUNT(*) OVER (PARTITION BY {key_col}) AS n
  FROM {daily_cte}),
hl_rec(k, t, n, l, b) AS (
  SELECT k, t, n, x, CAST(0 AS BIGINT) FROM hl_ix WHERE t = 1
  UNION ALL
  SELECT i.k, i.t, i.n,
         (i.x + {a1} * (r.l + r.b)) // {alpha_den},
         (((i.x + {a1} * (r.l + r.b)) // {alpha_den}) - r.l + {b1} * r.b)
           // {beta_den}
  FROM hl_rec r JOIN hl_ix i ON i.k = r.k AND i.t = r.t + 1),
hl_last AS (
  SELECT k, l, b, n FROM hl_rec WHERE t = n),
holt AS (
  SELECT k, CAST(hh.h AS INT) AS h,
         CAST(l + hh.h * b AS BIGINT) AS forecast,
         CAST(l AS BIGINT) AS level, CAST(b AS BIGINT) AS trend,
         CAST(n AS BIGINT) AS n_points
  FROM hl_last, range(1, {horizon + 1}) hh(h))
"""


def holt_winters_fit(
    vals: list[int],
    m: int = 7,
    alpha_den: int = 4,
    beta_den: int = 8,
    gamma_den: int = 4,
) -> tuple[int, int, list[int]]:
    """Fold the additive Holt-Winters recurrence (period m) over an
    ordered value list; returns the final (level, trend, seasonals)
    where seasonals[p] is the latest state for phase p = (t-1) mod m.
    Init from the first season: l = trunc-mean of vals[:m], b = 0,
    s_p = vals[p] - l. Same all-integer trunc-div discipline as
    :func:`holt_fit` (matching Spark ``div`` and DuckDB ``//``).
    Requires at least one full season (len(vals) >= m); callers with
    shorter series must drop the key (see :func:`holt_winters`)."""
    if len(vals) < m:
        raise ValueError(f"holt_winters_fit needs >= {m} points, got {len(vals)}")
    l = _tdiv(sum(vals[:m]), m)
    s = [v - l for v in vals[:m]]
    b = 0
    for i in range(m, len(vals)):
        p = i % m
        sold = s[p]
        lnew = _tdiv((vals[i] - sold) + (alpha_den - 1) * (l + b), alpha_den)
        b = _tdiv((lnew - l) + (beta_den - 1) * b, beta_den)
        s[p] = _tdiv((vals[i] - lnew) + (gamma_den - 1) * sold, gamma_den)
        l = lnew
    return l, b, s


def holt_winters(
    series: DataFrame,
    key_col: str,
    ord_col: str,
    value_col: str,
    m: int = 7,
    horizon: int = 7,
    alpha_den: int = 4,
    beta_den: int = 8,
    gamma_den: int = 4,
) -> DataFrame:
    """Per-key additive Holt-Winters smoothing (period m) — the
    seasonal extension of :func:`holt_linear`: forecast(h) =
    l_n + h*b_n + s_{phase(n+h)}. Returns (key, h, forecast, level,
    trend, seasonal, n_points). Same applyInPandas shape and the same
    honest boundary: the trunc-div recurrence is sequential per
    series, so this stays the one stateful-iteration batch operator
    family; series are calendar-bounded, state is O(m)."""
    out_schema = (
        f"{key_col} string, h int, forecast bigint, level bigint, "
        "trend bigint, seasonal bigint, n_points bigint"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ord_col)
        key = pdf[key_col].iloc[0]
        vals = [int(v) for v in pdf[value_col]]
        if len(vals) < m:
            # a series shorter than one season has no seasonal state;
            # DROP the key — the oracle's recursive CTE (anchored at
            # t = m) never reaches such a key either, so both engines
            # agree instead of IndexError-vs-empty divergence
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype=object),
                    "h": pd.Series([], dtype="int32"),
                    "forecast": pd.Series([], dtype="int64"),
                    "level": pd.Series([], dtype="int64"),
                    "trend": pd.Series([], dtype="int64"),
                    "seasonal": pd.Series([], dtype="int64"),
                    "n_points": pd.Series([], dtype="int64"),
                }
            )
        l, b, s = holt_winters_fit(vals, m, alpha_den, beta_den, gamma_den)
        n = len(vals)
        seas = [s[(n + h - 1) % m] for h in range(1, horizon + 1)]
        return pd.DataFrame(
            {
                key_col: [key] * horizon,
                "h": list(range(1, horizon + 1)),
                "forecast": [
                    l + h * b + seas[h - 1] for h in range(1, horizon + 1)
                ],
                "level": [l] * horizon,
                "trend": [b] * horizon,
                "seasonal": seas,
                "n_points": [n] * horizon,
            }
        )

    return series.groupBy(key_col).applyInPandas(fit, out_schema)


def holt_winters_oracle_ctes(
    daily_cte: str,
    key_col: str,
    ord_col: str,
    value_col: str,
    m: int = 7,
    horizon: int = 7,
    alpha_den: int = 4,
    beta_den: int = 8,
    gamma_den: int = 4,
) -> str:
    """DuckDB replay of :func:`holt_winters`: recursive CTE carrying
    (l, b, s1..sm) per key — the phase-p seasonal updates via CASE on
    ((t-1) % m) + 1, everything else carried. The lnew/sold
    expressions are inlined per column (recursive CTEs cannot
    reference sibling computed columns), generated mechanically here
    so both engines replay the identical trunc-div trajectory. Ends in
    ``hw(key, h, forecast, level, trend, seasonal, n_points)``; embed
    under WITH RECURSIVE."""
    a1, b1, g1 = alpha_den - 1, beta_den - 1, gamma_den - 1
    s_cols = ", ".join(f"s{j}" for j in range(1, m + 1))
    init_s = ",\n         ".join(
        f"MAX(CASE WHEN t = {j} THEN x END)"
        f" - (SUM(CASE WHEN t <= {m} THEN x END) // {m}) AS s{j}"
        for j in range(1, m + 1)
    )
    sold = (
        "(CASE ((i.t - 1) % " + str(m) + ") + 1 "
        + " ".join(f"WHEN {j} THEN r.s{j}" for j in range(1, m + 1))
        + " END)"
    )
    lnew = f"(((i.x - {sold}) + {a1} * (r.l + r.b)) // {alpha_den})"
    s_updates = ",\n         ".join(
        f"CASE WHEN ((i.t - 1) % {m}) + 1 = {j} THEN "
        f"(((i.x - {lnew}) + {g1} * {sold}) // {gamma_den}) "
        f"ELSE r.s{j} END"
        for j in range(1, m + 1)
    )
    fc_seas = (
        "(CASE ((n + hh.h - 1) % " + str(m) + ") + 1 "
        + " ".join(f"WHEN {j} THEN s{j}" for j in range(1, m + 1))
        + " END)"
    )
    return f"""
hw_ix AS (
  SELECT {key_col} AS k, {value_col} AS x,
         ROW_NUMBER() OVER (PARTITION BY {key_col} ORDER BY {ord_col}) AS t,
         COUNT(*) OVER (PARTITION BY {key_col}) AS n
  FROM {daily_cte}),
hw_init AS (
  SELECT k, MAX(n) AS n,
         SUM(CASE WHEN t <= {m} THEN x END) // {m} AS l0,
         {init_s}
  FROM hw_ix GROUP BY k),
hw_rec(k, t, n, l, b, {s_cols}) AS (
  SELECT k, {m}, n, l0, CAST(0 AS BIGINT), {s_cols} FROM hw_init
  UNION ALL
  SELECT i.k, i.t, i.n,
         {lnew},
         ((({lnew}) - r.l + {b1} * r.b) // {beta_den}),
         {s_updates}
  FROM hw_rec r JOIN hw_ix i ON i.k = r.k AND i.t = r.t + 1),
hw_last AS (
  SELECT k, n, l, b, {s_cols} FROM hw_rec WHERE t = n),
hw AS (
  SELECT k, CAST(hh.h AS INT) AS h,
         CAST(l + hh.h * b + {fc_seas} AS BIGINT) AS forecast,
         CAST(l AS BIGINT) AS level, CAST(b AS BIGINT) AS trend,
         CAST({fc_seas} AS BIGINT) AS seasonal,
         CAST(n AS BIGINT) AS n_points
  FROM hw_last, range(1, {horizon + 1}) hh(h))
"""


def ses_theta_fit(
    vals: list[int], alpha_den: int = 4
) -> tuple[int, int, int]:
    """Simple exponential smoothing fold (the Holt recurrence without
    the trend line): l_t = (x_t + (alpha_den-1)*l_{t-1}) div alpha_den,
    init l_1 = x_1. Returns (level, slope_num, slope_den) where
    slope_num/slope_den is the EXACT rational OLS slope of x on t —
    the two ingredients of the additive Theta(0,2) forecaster."""
    lvl = vals[0]
    for x in vals[1:]:
        lvl = _tdiv(x + (alpha_den - 1) * lvl, alpha_den)
    n = len(vals)
    st = n * (n + 1) // 2
    stt = n * (n + 1) * (2 * n + 1) // 6
    sx = sum(vals)
    stx = sum(t * x for t, x in enumerate(vals, start=1))
    num = n * stx - st * sx
    den = n * stt - st * st
    return lvl, num, den


def theta_forecast(
    series: DataFrame,
    key_col: str,
    ord_col: str,
    value_col: str,
    horizon: int = 7,
    alpha_den: int = 4,
) -> DataFrame:
    """Additive Theta(0,2) forecaster per key: SES (dyadic alpha =
    1/alpha_den, truncating integer state — the holt_linear discipline)
    plus half the OLS drift, f_h = l_n + round(b1/2 * (h - 1 +
    alpha_den)). The standard M3-winning decomposition: the theta=0
    line contributes the long-run trend, the theta=2 line (whose SES
    equals SES of the original series) the local level.

    Returns (key, h, forecast, level, slope, n_points); slope is the
    per-step OLS drift rounded to 6. The drift term is computed from
    the EXACT rational slope numerator/denominator so both engines
    round the same quantity.

    Scale: identical to holt_linear — one hash exchange of daily
    aggregates, O(days) per key, h-row fan-out."""
    out_schema = (
        f"{key_col} string, h int, forecast bigint, "
        "level bigint, slope double, n_points bigint"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ord_col)
        key = pdf[key_col].iloc[0]
        vals = [int(v) for v in pdf[value_col]]
        lvl, num, den = ses_theta_fit(vals, alpha_den)
        rows = []
        for h in range(1, horizon + 1):
            # round-half-up on the double quotient — the same shared
            # expression the oracle uses (num/den exact ints)
            drift = float(num) * (h - 1 + alpha_den) / (2.0 * den)
            rows.append(lvl + int(drift + 0.5) if drift >= 0
                        else lvl - int(-drift + 0.5))
        return pd.DataFrame(
            {
                key_col: [key] * horizon,
                "h": list(range(1, horizon + 1)),
                "forecast": rows,
                "level": [lvl] * horizon,
                # HALF_UP like the oracle's ROUND() — builtin round()
                # is banker's and would diverge on a 7th-digit tie
                "slope": [_half_up6(float(num) / den)] * horizon,
                "n_points": [len(vals)] * horizon,
            }
        )

    return series.groupBy(key_col).applyInPandas(fit, out_schema)


def theta_oracle_ctes(
    daily_cte: str,
    key_col: str,
    ord_col: str,
    value_col: str,
    horizon: int = 7,
    alpha_den: int = 4,
) -> str:
    """DuckDB replay of ``theta_forecast``: recursive SES CTE + exact
    integer OLS moments, ending in ``theta(k, h, forecast, level,
    slope, n_points)``. Embed under WITH RECURSIVE."""
    a1 = alpha_den - 1
    return f"""
th_ix AS (
  SELECT {key_col} AS k, {value_col} AS x,
         ROW_NUMBER() OVER (PARTITION BY {key_col} ORDER BY {ord_col}) AS t,
         COUNT(*) OVER (PARTITION BY {key_col}) AS n
  FROM {daily_cte}),
th_rec(k, t, n, l) AS (
  SELECT k, t, n, x FROM th_ix WHERE t = 1
  UNION ALL
  SELECT i.k, i.t, i.n, (i.x + {a1} * r.l) // {alpha_den}
  FROM th_rec r JOIN th_ix i ON i.k = r.k AND i.t = r.t + 1),
th_last AS (SELECT k, l, n FROM th_rec WHERE t = n),
th_mom AS (
  SELECT k,
         CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(t AS HUGEINT)) AS st,
         SUM(CAST(t AS HUGEINT) * t) AS stt,
         SUM(CAST(x AS HUGEINT)) AS sx,
         SUM(CAST(t AS HUGEINT) * x) AS stx
  FROM th_ix GROUP BY 1),
th_slope AS (
  SELECT k, n * stx - st * sx AS num, n * stt - st * st AS den
  FROM th_mom),
theta AS (
  SELECT l.k, CAST(hh.h AS INT) AS h,
         CAST(l.l + CAST(ROUND(CAST(s.num AS DOUBLE) * (hh.h - 1 + {alpha_den})
                    / (2.0 * CAST(s.den AS DOUBLE))) AS BIGINT) AS BIGINT)
           AS forecast,
         CAST(l.l AS BIGINT) AS level,
         ROUND(CAST(s.num AS DOUBLE) / CAST(s.den AS DOUBLE), 6) AS slope,
         CAST(l.n AS BIGINT) AS n_points
  FROM th_last l JOIN th_slope s ON s.k = l.k,
       range(1, {horizon + 1}) hh(h))
"""


def croston_fit(
    days: list[int], sizes: list[int], alpha_den: int = 4
) -> tuple[int, int, int]:
    """Croston's method fold over the NONZERO demand points of an
    intermittent series: SES (dyadic alpha, truncating integer state)
    of demand SIZES and of inter-arrival INTERVALS, both micro-scaled.
    ``days`` are integer day offsets of the demand points (ascending),
    ``sizes`` the positive demands. Init z = sizes[0], q = 1 interval
    unit; intervals enter from the second point on. Returns
    (z_micro, q_micro, n_points)."""
    z = sizes[0] * 1000000
    q = 1000000
    a1 = alpha_den - 1
    for j in range(1, len(sizes)):
        iv = (days[j] - days[j - 1]) * 1000000
        z = _tdiv(sizes[j] * 1000000 + a1 * z, alpha_den)
        q = _tdiv(iv + a1 * q, alpha_den)
    return z, q, len(sizes)


def croston(
    demand: DataFrame,
    key_col: str,
    day_col: str,
    size_col: str,
    alpha_den: int = 4,
) -> DataFrame:
    """Croston intermittent-demand forecaster per key over the nonzero
    demand points: (key, n_points, size_hat, interval_hat, rate) with
    rate = size_hat / interval_hat (expected demand per day — the
    quantity a replenishment plan consumes; plain SES biases it low on
    sparse series, which is Croston's whole reason to exist).

    ``day_col`` must be an integer day offset. Same honest sequential
    boundary as holt_linear: applyInPandas keyed by series; state is
    two micro-scaled integers, replayable by a recursive CTE."""
    out_schema = (
        f"{key_col} string, n_points bigint, size_hat double, "
        "interval_hat double, rate double"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(day_col)
        key = pdf[key_col].iloc[0]
        days = [int(v) for v in pdf[day_col]]
        sizes = [int(v) for v in pdf[size_col]]
        z, q, m = croston_fit(days, sizes, alpha_den)
        return pd.DataFrame(
            {
                key_col: [key],
                "n_points": [m],
                "size_hat": [round(z / 1000000.0, 6)],
                "interval_hat": [round(q / 1000000.0, 6)],
                # HALF_UP: see theta's slope note (z/1e6 and q/1e6 are
                # exact 6-decimal micro-units, so their round() calls
                # can never land on a true tie; this quotient can)
                "rate": [_half_up6(float(z) / q)],
            }
        )

    return demand.groupBy(key_col).applyInPandas(fit, out_schema)


def croston_oracle_ctes(
    demand_cte: str,
    key_col: str,
    day_col: str,
    size_col: str,
    alpha_den: int = 4,
) -> str:
    """DuckDB replay of ``croston``, ending in ``croston_out(k,
    n_points, size_hat, interval_hat, rate)``. Embed under WITH
    RECURSIVE."""
    a1 = alpha_den - 1
    return f"""
cr_ix AS (
  SELECT {key_col} AS k, CAST({day_col} AS BIGINT) AS d,
         CAST({size_col} AS BIGINT) AS x,
         ROW_NUMBER() OVER (PARTITION BY {key_col} ORDER BY {day_col}) AS t,
         COUNT(*) OVER (PARTITION BY {key_col}) AS n
  FROM {demand_cte}),
cr_rec(k, t, n, d, z, q) AS (
  SELECT k, t, n, d, x * 1000000, CAST(1000000 AS BIGINT)
  FROM cr_ix WHERE t = 1
  UNION ALL
  SELECT i.k, i.t, i.n, i.d,
         (i.x * 1000000 + {a1} * r.z) // {alpha_den},
         ((i.d - r.d) * 1000000 + {a1} * r.q) // {alpha_den}
  FROM cr_rec r JOIN cr_ix i ON i.k = r.k AND i.t = r.t + 1),
croston_out AS (
  SELECT k, CAST(n AS BIGINT) AS n_points,
         ROUND(z / 1000000.0, 6) AS size_hat,
         ROUND(q / 1000000.0, 6) AS interval_hat,
         ROUND(CAST(z AS DOUBLE) / q, 6) AS rate
  FROM cr_rec WHERE t = n)
"""
