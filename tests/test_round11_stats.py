"""Invariant tests for the round-11 statistics/ML additions — properties
the DuckDB oracle parity cannot see (parity proves both engines compute
the same thing; these prove the thing computed has the MATHEMATICAL
properties the docstrings claim)."""

import math

import pytest

from pyspark.sql import functions as F

from dawis_spark.operators.forecast import (
    _tdiv,
    holt_winters_fit,
)
from dawis_spark.operators.stats import (
    anova_oneway,
    categorical_association,
    ljung_box,
    normal_sf2,
    welch_ttest,
)


def test_normal_sf2_matches_erfc(spark):
    # A&S 7.1.26 claims |error| < 1.5e-7 against the true two-sided
    # normal p = erfc(|z|/sqrt(2)).
    zs = [0.0, 0.5, 1.0, 1.959964, 3.0, -2.5]
    df = spark.createDataFrame([(z,) for z in zs], "z double")
    got = {
        r["z"]: r["p"]
        for r in df.selectExpr("z", f"{normal_sf2('z')} AS p").collect()
    }
    for z in zs:
        want = math.erfc(abs(z) / math.sqrt(2))
        assert abs(got[z] - want) < 1.5e-7, (z, got[z], want)


def test_welch_ttest_symmetric_and_zero_for_identical_groups(spark):
    rows = [("a", v) for v in (10, 12, 14, 16)] + [
        ("b", v) for v in (10, 12, 14, 16)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    out = welch_ttest(df, "g", "v", "a", "b").collect()[0]
    assert out["t_stat"] == 0.0
    assert out["p_value"] == pytest.approx(1.0, abs=1e-6)
    # direction flips the sign, not the magnitude
    shifted = spark.createDataFrame(
        [("a", v + 10) for v in (10, 12, 14, 16)]
        + [("b", v) for v in (10, 12, 14, 16)],
        "g string, v long",
    )
    up = welch_ttest(shifted, "g", "v", "a", "b").collect()[0]
    dn = welch_ttest(shifted, "g", "v", "b", "a").collect()[0]
    assert up["t_stat"] == -dn["t_stat"] and up["t_stat"] > 0
    assert up["p_value"] == dn["p_value"]


def test_anova_eta_squared_bounds_and_f_zero_for_equal_means(spark):
    same = spark.createDataFrame(
        [("a", 5), ("a", 7), ("b", 5), ("b", 7), ("c", 5), ("c", 7)],
        "g string, v long",
    )
    out = anova_oneway(same, "g", "v").collect()[0]
    assert out["f_stat"] == 0.0 and out["eta_squared"] == 0.0
    split = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 901), ("b", 902)], "g string, v long"
    )
    out2 = anova_oneway(split, "g", "v").collect()[0]
    # almost all variance is between groups
    assert out2["eta_squared"] > 0.999
    # degenerate: zero within-group variance -> F is NULL, not an
    # ANSI DIVIDE_BY_ZERO crash
    degen = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 9), ("b", 9)], "g string, v long"
    )
    out3 = anova_oneway(degen, "g", "v").collect()[0]
    assert out3["f_stat"] is None
    assert out3["eta_squared"] == pytest.approx(1.0, abs=1e-9)


def test_categorical_association_independence_and_identity(spark):
    # independent table -> chi2 = V = MI = 0; identical columns -> NMI = 1
    indep = spark.createDataFrame(
        [(r, c) for r in "xy" for c in "uv" for _ in range(3)],
        "r string, c string",
    )
    out = categorical_association(indep, "r", "c").collect()[0]
    assert out["chi2"] == 0.0 and out["cramers_v"] == 0.0
    assert out["mi_nats"] == 0.0 and out["nmi"] == 0.0
    ident = spark.createDataFrame(
        [(x, x) for x in "xxyyzz"], "r string, c string"
    )
    out2 = categorical_association(ident, "r", "c").collect()[0]
    assert out2["nmi"] == pytest.approx(1.0, abs=1e-9)
    assert out2["cramers_v"] == pytest.approx(1.0, abs=1e-9)


def test_ljung_box_zero_for_flat_series(spark):
    # A constant series has rho_k = 0/0 -> but our exact construction
    # yields den = 0; use a near-flat alternating series instead: rho_1
    # of a perfectly alternating series is -1, so Q is large — and a
    # pure linear ramp has positive rho_1. Sanity: Q >= 0 and n/m echo.
    ramp = spark.createDataFrame(
        [(i, 100 + i) for i in range(30)], "d long, v long"
    )
    out = ljung_box(ramp, "d", "v", max_lag=5).collect()[0]
    assert out["n"] == 30 and out["m"] == 5
    assert out["q_stat"] > 0


def test_holt_winters_fit_reproduces_seasonal_pattern():
    # pure weekly pattern, no trend: forecast must repeat the pattern
    pattern = [100, 200, 300, 400, 500, 600, 700]
    vals = pattern * 6
    l, b, s = holt_winters_fit(vals, m=7)
    n = len(vals)
    for h in range(1, 8):
        fc = l + h * b + s[(n + h - 1) % 7]
        want = pattern[(n + h - 1) % 7]
        assert abs(fc - want) <= 2, (h, fc, want)  # trunc-div drift <= 2


def test_tdiv_truncates_toward_zero_like_both_engines():
    assert _tdiv(-5, 8) == 0 and _tdiv(5, 8) == 0
    assert _tdiv(-13, 8) == -1 and _tdiv(13, 8) == 1


def test_isotonic_output_is_monotone(spark):
    from dawis_spark.queries import isotonic_urgency_by_value

    rows = isotonic_urgency_by_value(spark, "/root/testdata/sf0.001").collect()
    iso = [r["iso_rate"] for r in sorted(rows, key=lambda r: r["bin"])]
    assert all(a <= b + 1e-12 for a, b in zip(iso, iso[1:]))
    # isotonic fit preserves the weighted mean within rounding
    n = sum(r["n_b"] for r in rows)
    raw_mass = sum(r["k_b"] for r in rows)
    iso_mass = sum(r["iso_rate"] * r["n_b"] for r in rows)
    assert iso_mass == pytest.approx(raw_mass, rel=1e-4)


def test_markov_stationary_sums_to_one_and_is_fixed_point(spark):
    from dawis_spark.queries import markov_stationary_distribution

    rows = markov_stationary_distribution(spark, "/root/testdata/sf0.001").collect()
    probs = {r["event_type"]: r["stationary_prob"] for r in rows}
    assert sum(probs.values()) == pytest.approx(1.0, abs=1e-5)
    assert all(p >= 0 for p in probs.values())


def test_kmeans_silhouette_in_range(spark):
    from dawis_spark.queries import kmeans_silhouette_simplified

    rows = kmeans_silhouette_simplified(spark, "/root/testdata/sf0.001").collect()
    assert rows, "expected at least one cluster"
    for r in rows:
        assert -1.0 <= r["mean_silhouette"] <= 1.0
        assert r["n_points"] > 0


def test_median_ci_brackets_median(spark):
    from dawis_spark.queries import median_ci_order_value

    out = median_ci_order_value(spark, "/root/testdata/sf0.001").collect()[0]
    assert out["ci_lo_cents"] <= out["median_cents"] <= out["ci_hi_cents"]
    assert out["rank_lo"] < out["rank_hi"]


def test_pca_loading_is_unit_norm_and_sign_fixed(spark):
    from dawis_spark.queries import pca_top_component

    rows = pca_top_component(spark, "/root/testdata/sf0.001").collect()
    norm = sum(r["loading"] ** 2 for r in rows)
    assert norm == pytest.approx(1.0, abs=1e-4)
    top = max(rows, key=lambda r: (abs(r["loading"]), -r["component"]))
    assert top["loading"] > 0  # sign convention
    assert rows[0]["eigenvalue"] > 0


def test_conformal_coverage_at_least_nominal(spark):
    from dawis_spark.queries import conformal_interval_price

    out = conformal_interval_price(spark, "/root/testdata/sf0.001").collect()[0]
    # the repo's nearest-rank convention t = (90*(n-1)) div 100 + 1
    # guarantees coverage >= t/n — a hair under 0.9 at small n (ties
    # only push it up); assert the exact rank-based floor
    t = (90 * (out["n_cal"] - 1)) // 100 + 1
    assert out["coverage"] >= t / out["n_cal"] - 1e-6  # round-6 output
    assert out["q90_cents"] >= 0
    assert out["n_train"] > out["n_cal"]


def test_markov_removal_attribution_shares_sum_to_one(spark):
    from dawis_spark.queries import markov_removal_attribution

    rows = markov_removal_attribution(spark, "/root/testdata/sf0.001").collect()
    assert sum(r["attribution_share"] for r in rows) == pytest.approx(
        1.0, abs=1e-4
    )
    assert all(0 <= r["base_cvr"] <= 1 for r in rows)


def test_stream_psi_drift_cross_batch_and_batch_equivalence(spark, tmp_path):
    """The running PSI after each micro-batch equals psi_from_counts over
    the histogram of ALL delivered rows (whale-alert discipline), and it
    moves toward zero as the stream converges to the reference mix."""
    from pyspark.sql import types as T

    from dawis_spark.operators.drift import bin_index, psi_from_counts
    from dawis_spark.streaming.drift import stream_psi_drift
    from dawis_spark.streaming.stream import staging_stream

    staging = str(tmp_path / "staging")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType(
        [
            T.StructField("metric", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    ref = [5, 5, 5, 5]  # uniform reference over [0, 100), 4 bins

    def tick(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(staging)
        q = (
            stream_psi_drift(
                staging_stream(spark, staging, schema),
                "metric",
                "v",
                ref_lo=0.0,
                ref_hi=100.0,
                ref_counts=ref,
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # tick 1: everything lands in bin 0 — severe drift
    tick([("m", float(x)) for x in (1, 2, 3, 4)])
    first = {
        (r["metric"], r["n_rows"]): r["psi"]
        for r in spark.read.parquet(sink).collect()
    }
    assert first[("m", 4)] > 1.0
    # tick 2: fill the other bins — drift should shrink
    tick([("m", float(x)) for x in (30, 55, 80, 30, 55, 80, 5, 99)])
    rows = {r["n_rows"]: r["psi"] for r in spark.read.parquet(sink).collect()}
    assert rows[12] < first[("m", 4)]
    # batch equivalence on the union of all delivered rows
    all_vals = [r["v"] for r in spark.read.parquet(staging).collect()]
    counts = [0] * 4
    for x in all_vals:
        counts[bin_index(x, 0.0, 100.0, 4)] += 1
    assert rows[12] == pytest.approx(psi_from_counts(ref, counts), abs=1e-12)


def test_psi_zero_for_identical_distributions():
    from dawis_spark.operators.drift import psi_from_counts

    assert psi_from_counts([5, 5, 5, 5], [10, 10, 10, 10]) == pytest.approx(
        0.0, abs=1e-12
    )
    # any mismatch is strictly positive (PSI is an f-divergence)
    assert psi_from_counts([5, 5, 5, 5], [20, 10, 5, 5]) > 0


def test_eb_shrinkage_pulls_toward_prior_mean(spark):
    from dawis_spark.queries import eb_shrunk_urgent_rates

    rows = eb_shrunk_urgent_rates(spark, "/root/testdata/sf0.001").collect()
    mu = sum(r["raw_rate"] for r in rows) / len(rows)
    for r in rows:
        raw, shrunk = r["raw_rate"], r["shrunk_rate"]
        # shrunk estimate lies between the raw rate and the prior mean
        lo, hi = sorted((raw, mu))
        assert lo - 1e-6 <= shrunk <= hi + 1e-6, (r["n_name"], raw, shrunk, mu)


def test_cuped_variance_reduction_bounds(spark):
    from dawis_spark.queries import cuped_adjusted_arm_means

    rows = cuped_adjusted_arm_means(spark, "/root/testdata/sf0.001").collect()
    for r in rows:
        assert 0.0 <= r["variance_reduction"] <= 1.0  # it's corr^2


def test_gains_capture_monotone_and_ends_at_one(spark):
    from dawis_spark.queries import gains_lift_deciles

    rows = gains_lift_deciles(spark, "/root/testdata/sf0.001").collect()
    # rows come ordered by decile DESC; capture accumulates to 1
    caps = [r["cum_capture"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(caps, caps[1:]))
    assert caps[-1] == pytest.approx(1.0, abs=1e-9)
    # lift of the full population is exactly 1
    assert rows[-1]["lift"] == pytest.approx(1.0, abs=1e-9)


def test_holt_winters_short_series_dropped_not_crashed(spark):
    """A key with fewer than one season (n < m) must be DROPPED — the
    oracle's recursive CTE never reaches it — instead of IndexError in
    the pandas fit (r11 ADVICE fix). Direct holt_winters_fit misuse
    raises an explicit ValueError."""
    import pytest as _pytest

    from dawis_spark.operators.forecast import holt_winters, holt_winters_fit

    with _pytest.raises(ValueError, match="needs >= 7"):
        holt_winters_fit([1, 2, 3], m=7)
    rows = [("short", i, 100 + i) for i in range(3)] + [
        ("long", i, 200 + 10 * (i % 7)) for i in range(14)
    ]
    df = spark.createDataFrame(rows, "k string, t int, x long")
    out = holt_winters(df, "k", "t", "x", m=7, horizon=2).collect()
    assert {r["k"] for r in out} == {"long"}
    assert len(out) == 2


def test_bin_index_degenerate_reference_histogram():
    """hi == lo (constant reference window) must not ZeroDivisionError:
    x <= lo lands in bin 0, x > lo in the top bin — where the batch
    expression's inf/NaN clamp puts them (r11 ADVICE fix)."""
    from dawis_spark.operators.drift import bin_index

    assert bin_index(5.0, 5.0, 5.0, 10) == 0
    assert bin_index(4.0, 5.0, 5.0, 10) == 0
    assert bin_index(6.0, 5.0, 5.0, 10) == 9
    # non-degenerate path unchanged
    assert bin_index(5.0, 0.0, 10.0, 10) == 5


def test_tiff_planar_configuration_rejected():
    """PlanarConfiguration 2 (separate channel planes) must raise, not
    silently decode plane bytes as interleaved RGB (r11 ADVICE fix)."""
    import struct

    import pytest as _pytest

    from dawis_spark.multimodal.codecs import decode_tiff

    n = 5
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4

    def entry(tag, type_, count, val4):
        return struct.pack("<HHI", tag, type_, count) + val4

    ifd = struct.pack("<H", n)
    ifd += entry(256, 4, 1, struct.pack("<I", 2))  # width
    ifd += entry(257, 4, 1, struct.pack("<I", 1))  # height
    ifd += entry(273, 4, 1, struct.pack("<I", data_off))  # strip offset
    ifd += entry(277, 3, 1, struct.pack("<HH", 3, 0))  # spp = 3
    ifd += entry(284, 3, 1, struct.pack("<HH", 2, 0))  # planar = 2
    payload = (
        b"II*\x00"
        + struct.pack("<I", ifd_off)
        + ifd
        + struct.pack("<I", 0)
        + bytes(6)
    )
    with _pytest.raises(ValueError, match="planar"):
        decode_tiff(payload)
