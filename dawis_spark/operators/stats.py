"""Nonparametric statistical tests — the hypothesis-testing companions to
the drift (operators/drift.py) and anomaly (operators/anomaly.py)
families: Theil–Sen robust trend, Mann–Whitney rank-sum drift, and a
chi-square independence screen.

Exactness notes (the repo discipline, applied three ways):

  - THEIL–SEN: every pairwise slope is ONE IEEE division of exact
    integers (value cents x day offsets), identical in both engines;
    the median over that identical multiset of doubles picks/averages
    identical order statistics. Pair generation is per-series O(n^2) in
    the series' OWN length (days in a window — config-bounded), never
    in row count.
  - MANN–WHITNEY: rank sums use AVERAGE ranks for ties = (2*min_rank +
    ties - 1) / 2 — a .5-exact dyadic; U, its mean, and the tie-corrected
    variance are exact integer expressions; the z-score pays one IEEE
    sqrt + one division.
  - CHI-SQUARE: the cell sum is an ORDERED FOLD — cells are sorted into
    an array and reduced in (row, col) order, so the float accumulation
    order is part of the operator's definition instead of partition
    luck. groupBy SUM over floats would be order-nondeterministic;
    a 35-cell contingency table folds for free.

Scale shapes: all three aggregate to group-/cell-cardinality relations
before any quadratic or global step; nothing is row-scale past the
first keyed aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def theil_sen(
    df: DataFrame, key_col: str, x_col: str, y_col: str
) -> DataFrame:
    """(key, n_points, slope) — median of pairwise slopes per key.
    ``x_col`` integer-ish (e.g. day offset), ``y_col`` integer cents."""
    a = df.select(
        F.col(key_col).alias("k"), F.col(x_col).alias("x1"), F.col(y_col).alias("y1")
    )
    b = df.select(
        F.col(key_col).alias("k"), F.col(x_col).alias("x2"), F.col(y_col).alias("y2")
    )
    pairs = a.join(b, "k").filter(F.col("x1") < F.col("x2"))
    slopes = pairs.select(
        "k",
        ((F.col("y2") - F.col("y1")) / (F.col("x2") - F.col("x1"))).alias("s"),
    )
    npts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points")
    )
    med = slopes.groupBy("k").agg(
        F.expr("percentile(s, 0.5)").alias("slope")
    )
    return (
        npts.join(med, "k")
        .select(F.col("k").alias(key_col), "n_points", F.round("slope", 6).alias("slope"))
        .orderBy(key_col)
    )


def mann_whitney(
    df: DataFrame, value_col: str, side_col: str, side_a: str, side_b: str
) -> DataFrame:
    """One row: (n_a, n_b, u_a, z) — the rank-sum test with average
    ranks and tie-corrected variance. ``value_col`` must be exact
    integers (cents)."""
    tagged = df.select(
        F.col(value_col).alias("v"),
        F.when(F.col(side_col) == side_a, 1).otherwise(0).alias("ia"),
        F.when(F.col(side_col) == side_b, 1).otherwise(0).alias("ib"),
    ).filter((F.col("ia") == 1) | (F.col("ib") == 1))
    per_v = tagged.groupBy("v").agg(
        F.sum("ia").cast("bigint").alias("na_v"),
        F.sum("ib").cast("bigint").alias("nb_v"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_v.select(
        "v",
        "na_v",
        "nb_v",
        (F.col("na_v") + F.col("nb_v")).alias("t_v"),
        F.coalesce(F.sum(F.col("na_v") + F.col("nb_v")).over(w), F.lit(0)).alias(
            "before"
        ),
    )
    # average rank of a tie group in .5-exact dyadic form:
    # (2*(before+1) + (t-1)) / 2
    avg_rank = (2 * (F.col("before") + 1) + (F.col("t_v") - 1)) / 2
    agg = ranked.agg(
        F.sum(F.col("na_v")).cast("bigint").alias("n_a"),
        F.sum(F.col("nb_v")).cast("bigint").alias("n_b"),
        F.sum(avg_rank * F.col("na_v")).alias("r_a"),
        F.sum(
            (F.col("t_v").cast("decimal(38,0)") * F.col("t_v") * F.col("t_v"))
            - F.col("t_v")
        ).alias("tie_cubes"),
    )
    u_a = F.col("r_a") - (F.col("n_a") * (F.col("n_a") + 1)) / 2
    n = F.col("n_a") + F.col("n_b")
    mu = F.col("n_a") * F.col("n_b") / 2
    var = (
        (F.col("n_a") * F.col("n_b")).cast("double")
        / 12.0
        * (
            (n + 1).cast("double")
            - F.col("tie_cubes").cast("double") / (n * (n - 1)).cast("double")
        )
    )
    return agg.select(
        "n_a",
        "n_b",
        F.round(u_a, 1).alias("u_a"),
        F.round((u_a - mu) / F.sqrt(var), 6).alias("z"),
    )


def chi_square_independence(
    df: DataFrame, row_col: str, col_col: str
) -> DataFrame:
    """One row: (n_cells, dof, chi2) for the row x col contingency
    table. The cell-statistic sum folds in sorted (row, col) order —
    deterministic float accumulation by construction."""
    cells = df.groupBy(
        F.col(row_col).alias("r"), F.col(col_col).alias("c")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("obs"))
    rw = Window.partitionBy("r")
    cw = Window.partitionBy("c")
    tot = Window.partitionBy()
    scored = cells.select(
        "r",
        "c",
        "obs",
        F.sum("obs").over(rw).alias("row_n"),
        F.sum("obs").over(cw).alias("col_n"),
        F.sum("obs").over(tot).alias("n"),
    )
    # per-cell term (obs*n - row*col)^2 / (row*col*n): numerator exact in
    # DECIMAL(38,0); ONE division per cell, then the ordered fold
    num = (
        F.col("obs").cast("decimal(38,0)") * F.col("n")
        - F.col("row_n").cast("decimal(38,0)") * F.col("col_n")
    )
    den = (
        F.col("row_n").cast("decimal(38,0)") * F.col("col_n") * F.col("n")
    )
    terms = scored.select(
        "r",
        "c",
        ((num * num).cast("double") / den.cast("double")).alias("term"),
        F.col("n"),
    )
    folded = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        (
            F.countDistinct("r").cast("bigint") - 1
        ).alias("__rm1"),
        (
            F.countDistinct("c").cast("bigint") - 1
        ).alias("__cm1"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(r, c, term))), "
            "cast(0.0 as double), (acc, e) -> acc + e.term)"
        ).alias("chi2_raw"),
    )
    return folded.select(
        "n_cells",
        (F.col("__rm1") * F.col("__cm1")).cast("bigint").alias("dof"),
        F.round("chi2_raw", 6).alias("chi2"),
    )


def _double_ranks(df: DataFrame, value_col: str, out_col: str) -> DataFrame:
    """Attach DOUBLED average ranks (2*avg_rank = 2*before + ties + 1,
    a pure integer — the dyadic .5 cleared up front) for ``value_col``.
    Rank state is distinct-value-bounded; the join back is hash, not
    sort."""
    per_v = df.groupBy(F.col(value_col).alias("__v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__t")
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)
    per_v = per_v.select(
        "__v",
        "__t",
        F.coalesce(F.sum("__t").over(w), F.lit(0)).alias("__before"),
    ).select(
        "__v",
        (2 * F.col("__before") + F.col("__t") + 1).cast("bigint").alias(out_col),
    )
    return df.join(per_v, df[value_col] == per_v["__v"]).drop("__v")


def spearman_rho(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """One row (n, rho_spearman): Spearman rank correlation with
    average ranks for ties = Pearson over DOUBLED average ranks (rank
    doubling is an affine map, so rho is unchanged and every moment is
    an exact integer). The moment sums ride DECIMAL(38,0); the only
    float ops are two correctly-rounded int->double conversions, two
    IEEE sqrts, and one division — bit-stable across engines (the
    profile.py Pearson discipline applied to ranks)."""
    ranked = _double_ranks(
        _double_ranks(
            df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y")),
            "x",
            "rx",
        ),
        "y",
        "ry",
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(d("rx")).alias("sx"),
        F.sum(d("ry")).alias("sy"),
        F.sum(d("rx") * d("ry")).alias("sxy"),
        F.sum(d("rx") * d("rx")).alias("sxx"),
        F.sum(d("ry") * d("ry")).alias("syy"),
    )
    n = F.col("n").cast("decimal(38,0)")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return agg.select(
        "n",
        F.round(num / (F.sqrt(dx) * F.sqrt(dy)), 6).alias("rho_spearman"),
    )


def kendall_tau_b(df: DataFrame, ord_col: str, x_col: str, y_col: str) -> DataFrame:
    """One row (n, n_concordant, n_discordant, tau_b): Kendall's tau-b
    with the full tie correction, by classifying every unordered pair
    once (``ord_col`` strictly orders observations). All counts are
    exact integers; tau_b pays two sqrts and one division.

    Scale boundary: O(n^2) pairs in the SERIES length — sound when the
    series is calendar-bounded (daily aggregates: n grows with days,
    not data volume). Row-scale inputs want the O(n log n) merge-count
    form, which is a different operator."""
    a = df.select(
        F.col(ord_col).alias("o1"), F.col(x_col).alias("x1"), F.col(y_col).alias("y1")
    )
    b = df.select(
        F.col(ord_col).alias("o2"), F.col(x_col).alias("x2"), F.col(y_col).alias("y2")
    )
    pairs = a.join(b, F.col("o1") < F.col("o2"))
    sx = F.signum((F.col("x2") - F.col("x1")).cast("double"))
    sy = F.signum((F.col("y2") - F.col("y1")).cast("double"))
    cls = pairs.select(
        (sx * sy).alias("p"),
        F.when((sx == 0) & (sy != 0), 1).otherwise(0).alias("tx"),
        F.when((sy == 0) & (sx != 0), 1).otherwise(0).alias("ty"),
        F.when((sx == 0) & (sy == 0), 1).otherwise(0).alias("txy"),
    )
    agg = cls.agg(
        F.count(F.lit(1)).cast("bigint").alias("n0"),
        F.sum(F.when(F.col("p") > 0, 1).otherwise(0)).cast("bigint").alias("c"),
        F.sum(F.when(F.col("p") < 0, 1).otherwise(0)).cast("bigint").alias("dd"),
        F.sum("tx").cast("bigint").alias("ntx"),
        F.sum("ty").cast("bigint").alias("nty"),
        F.sum("txy").cast("bigint").alias("ntxy"),
    )
    den_x = (F.col("n0") - F.col("ntx") - F.col("ntxy")).cast("double")
    den_y = (F.col("n0") - F.col("nty") - F.col("ntxy")).cast("double")
    return agg.select(
        F.col("c").alias("n_concordant"),
        F.col("dd").alias("n_discordant"),
        F.round(
            (F.col("c") - F.col("dd")).cast("double")
            / (F.sqrt(den_x) * F.sqrt(den_y)),
            6,
        ).alias("tau_b"),
    )


def acf(series: DataFrame, ord_col: str, value_col: str, max_lag: int) -> DataFrame:
    """(lag, n_pairs, acf) for lag 1..max_lag over an integer-valued
    series ordered by ``ord_col`` — the standard ACF with the GLOBAL
    mean/variance in the denominator, cleared of the 1/n mean by
    cross-multiplying with n^2:

        acf_k * (n^2*Sxx - n*S^2) = n^2*Sxy_k - n*S*(Sh_k + St_k) + m_k*S^2

    Every term is an exact DECIMAL(38,0) integer (bounded by n^2 * sum
    of products — ~1e34 at 100 TB day-granularity, inside 38 digits);
    both sides convert the SAME integers to double and divide once.

    Scale shape: the series is an aggregate (calendar-bounded), so the
    single global-order window is state the size of the series itself;
    all max_lag leads ride ONE sort, the per-lag sums are one unpivoted
    aggregate."""
    terms = _acf_terms(series, ord_col, value_col, max_lag)
    return terms.select(
        "lag", "n_pairs", F.round(F.col("rho"), 6).alias("acf")
    ).orderBy("lag")


def _acf_terms(
    series: DataFrame, ord_col: str, value_col: str, max_lag: int
) -> DataFrame:
    """Unrounded ACF terms (lag, n_pairs, n, rho) shared by :func:`acf`
    and :func:`ljung_box` — same exact-integer construction, rho left
    at full double precision so downstream statistics (Ljung-Box Q)
    square it before any rounding."""
    w = Window.orderBy(ord_col)
    leads = series.select(
        F.col(value_col).alias("x"),
        *[F.lead(value_col, k).over(w).alias(f"x{k}") for k in range(1, max_lag + 1)],
    )
    stack_expr = ", ".join(f"{k}, x{k}" for k in range(1, max_lag + 1))
    long = leads.select(
        "x", F.expr(f"stack({max_lag}, {stack_expr}) as (lag, xl)")
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    glob = series.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col(value_col).cast("decimal(38,0)")).alias("s"),
        F.sum(
            F.col(value_col).cast("decimal(38,0)")
            * F.col(value_col).cast("decimal(38,0)")
        ).alias("sxx"),
    )
    per_lag = (
        long.filter(F.col("xl").isNotNull())
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(d("x") * d("xl")).alias("sxy"),
            F.sum(d("x")).alias("sh"),
            F.sum(d("xl")).alias("st"),
        )
    )
    nn = F.col("n").cast("decimal(38,0)")
    num = (
        nn * nn * F.col("sxy")
        - nn * F.col("s") * (F.col("sh") + F.col("st"))
        + F.col("n_pairs").cast("decimal(38,0)") * F.col("s") * F.col("s")
    ).cast("double")
    den = (nn * nn * F.col("sxx") - nn * F.col("s") * F.col("s")).cast("double")
    return per_lag.crossJoin(F.broadcast(glob)).select(
        F.col("lag").cast("int").alias("lag"),
        "n_pairs",
        "n",
        (num / den).alias("rho"),
    )


def ljung_box(
    series: DataFrame, ord_col: str, value_col: str, max_lag: int
) -> DataFrame:
    """Ljung-Box portmanteau whiteness test over an integer-valued
    series: Q = n(n+2) * sum_{k=1..m} rho_k^2 / (n-k), chi-square(m)
    under the white-noise null. The standard "is there ANY serial
    structure" gate run before trusting i.i.d.-assuming statistics
    (bootstrap CIs, z-tests) on a time-ordered metric.

    Exactness: rho_k comes from :func:`_acf_terms`'s exact DECIMAL(38,0)
    integers (one double conversion + one division per lag); the m-term
    sum is an ORDERED FOLD over the lag-sorted terms — the chi-square
    discipline (module docstring) — so float accumulation order is part
    of the definition, not partition luck, and a DuckDB twin folding in
    the same lag order reproduces it bit-for-bit.

    Scale: everything after the calendar-bounded daily aggregate is a
    max_lag-row relation; Q is one fold over m doubles."""
    terms = _acf_terms(series, ord_col, value_col, max_lag)
    folded = terms.agg(
        F.max("n").alias("n"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("lag"),
                    (
                        F.col("rho")
                        * F.col("rho")
                        / (F.col("n") - F.col("lag")).cast("double")
                    ).alias("term"),
                )
            )
        ).alias("ts"),
    )
    q_stat = F.col("n").cast("double") * (F.col("n") + 2).cast("double") * F.aggregate(
        "ts", F.lit(0.0), lambda acc, t: acc + t["term"]
    )
    return folded.select(
        F.col("n").cast("bigint").alias("n"),
        F.lit(max_lag).cast("int").alias("m"),
        F.round(q_stat, 6).alias("q_stat"),
    )


def ccf(
    series: DataFrame,
    ord_col: str,
    x_col: str,
    y_col: str,
    max_lag: int,
) -> DataFrame:
    """(lag, n_pairs, ccf) for lag in [-max_lag, max_lag]: the
    cross-correlation r_k = corr(x_t, y_{t+k}) with GLOBAL means and
    the full-series variance product in the denominator — the
    lead/lag-detection companion to ``acf`` (which series moves
    FIRST), feeding the same exactness discipline: the 1/n means are
    cleared by cross-multiplying with n^2,

        num_k * n^2 = n^2*Sxy_k - n*Sy*Xh_k - n*Sx*Yt_k + m_k*Sx*Sy

    every term an exact DECIMAL(38,0) integer; the denominator pays two
    IEEE sqrts over the same exact integers on both engines.

    Scale: all 2*max_lag+1 shifted pairings ride ONE window sort over
    the calendar-bounded series; per-lag sums are one unpivoted
    map-side-partial aggregate."""
    from pyspark.sql import Window

    w = Window.orderBy(ord_col)
    shift_cols = []
    for k in range(-max_lag, max_lag + 1):
        yk = (
            F.lead(y_col, k).over(w) if k >= 0 else F.lag(y_col, -k).over(w)
        )
        shift_cols.append(yk.alias(f"y_{k + max_lag}"))
    wide = series.select(F.col(x_col).alias("x"), *shift_cols)
    stack_expr = ", ".join(
        f"{k}, y_{k + max_lag}" for k in range(-max_lag, max_lag + 1)
    )
    long = wide.select(
        "x", F.expr(f"stack({2 * max_lag + 1}, {stack_expr}) as (lag, yl)")
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    glob = series.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col(x_col).cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col(y_col).cast("decimal(38,0)")).alias("sy"),
        F.sum(
            F.col(x_col).cast("decimal(38,0)") * F.col(x_col).cast("decimal(38,0)")
        ).alias("sxx"),
        F.sum(
            F.col(y_col).cast("decimal(38,0)") * F.col(y_col).cast("decimal(38,0)")
        ).alias("syy"),
    )
    per_lag = (
        long.filter(F.col("yl").isNotNull())
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(d("x") * d("yl")).alias("sxy"),
            F.sum(d("x")).alias("xh"),
            F.sum(d("yl")).alias("yt"),
        )
    )
    nn = F.col("n").cast("decimal(38,0)")
    num = (
        nn * nn * F.col("sxy")
        - nn * F.col("sy") * F.col("xh")
        - nn * F.col("sx") * F.col("yt")
        + F.col("n_pairs").cast("decimal(38,0)") * F.col("sx") * F.col("sy")
    ).cast("double")
    den = (
        F.sqrt((nn * nn * F.col("sxx") - nn * F.col("sx") * F.col("sx")).cast("double"))
        * F.sqrt((nn * nn * F.col("syy") - nn * F.col("sy") * F.col("sy")).cast("double"))
    )
    return (
        per_lag.crossJoin(F.broadcast(glob))
        .select(
            F.col("lag").cast("int").alias("lag"),
            "n_pairs",
            F.round(num / den, 6).alias("ccf"),
        )
        .orderBy("lag")
    )
