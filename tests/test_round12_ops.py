"""Round-12 additions: PSI drift -> alert wiring (single-shot crossing
alerts + delivery into the alert queue), closing the monitoring loop
end-to-end — measure (psi_value_drift) -> decide (stream_psi_alerts) ->
deliver (AlertQueue -> Dispatcher)."""

import pytest
from pyspark.sql import types as T


def _tick(spark, staging, rows, schema, build_query):
    """Append rows to the staging dir and drain one availableNow pass."""
    spark.createDataFrame(rows, schema).write.mode("append").parquet(staging)
    q = build_query()
    q.awaitTermination()


_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ]
)
_REF = [5, 5, 5, 5]  # uniform reference over [0, 100), 4 bins


def test_stream_psi_alerts_single_shot_and_batch_equivalence(spark, tmp_path):
    """One alert per drifting key at first threshold crossing, none for
    a key matching the reference, no re-alerting storm; the alerted key
    set equals the batch twin (psi_from_counts over the union of all
    delivered rows, thresholded)."""
    from dawis_spark.operators.drift import bin_index, psi_from_counts
    from dawis_spark.streaming.drift import stream_psi_alerts
    from dawis_spark.streaming.stream import staging_stream

    staging = str(tmp_path / "staging")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return (
            stream_psi_alerts(
                staging_stream(spark, staging, _SCHEMA),
                "metric",
                "v",
                ref_lo=0.0,
                ref_hi=100.0,
                ref_counts=_REF,
                threshold=0.25,
                min_rows=4,
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    healthy = [("ok", float(x)) for x in (10, 35, 60, 85)]
    # tick 1: "bad" piles into bin 0 but is below min_rows after 2 rows?
    # no — 4 rows >= min_rows, severe drift -> alert fires here
    _tick(spark, staging, [("bad", float(x)) for x in (1, 2, 3, 4)] + healthy,
          _SCHEMA, start)
    alerts = spark.read.parquet(sink).collect()
    assert {(r["metric"], r["n_rows"]) for r in alerts} == {("bad", 4)}
    assert alerts[0]["psi"] > 0.25
    # tick 2: drift persists — the latch must prevent a second alert;
    # the healthy key stays healthy
    _tick(spark, staging, [("bad", float(x)) for x in (5, 6)] + healthy,
          _SCHEMA, start)
    alerts = spark.read.parquet(sink).collect()
    assert len(alerts) == 1  # still the single-shot row
    # batch twin: alerted set == keys whose union-histogram PSI > thr
    by_key = {}
    for r in spark.read.parquet(staging).collect():
        by_key.setdefault(r["metric"], []).append(r["v"])
    batch_alerted = set()
    for k, vals in by_key.items():
        counts = [0] * 4
        for x in vals:
            counts[bin_index(x, 0.0, 100.0, 4)] += 1
        if psi_from_counts(_REF, counts) > 0.25:
            batch_alerted.add(k)
    assert batch_alerted == {r["metric"] for r in alerts} == {"bad"}


def test_psi_alerts_flow_into_alert_queue(spark, tmp_path):
    """End-to-end monitoring loop: the PSI alert stream lands in the
    AlertQueue as ALERT_SCHEMA rows, is fetchable by group, and the
    watermark commit consumes it exactly once (at-least-once contract
    of the reference's queue -> Dispatcher path)."""
    import json

    from dawis_spark.streaming.alerts import AlertQueue
    from dawis_spark.streaming.drift import psi_alerts_to_queue, stream_psi_alerts
    from dawis_spark.streaming.stream import staging_stream

    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    queue = AlertQueue(spark, str(tmp_path / "q"))

    def start():
        alerts = stream_psi_alerts(
            staging_stream(spark, staging, _SCHEMA),
            "metric",
            "v",
            ref_lo=0.0,
            ref_hi=100.0,
            ref_counts=_REF,
            threshold=0.25,
            min_rows=4,
        )
        return (
            psi_alerts_to_queue(alerts, queue, group="drift")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    _tick(spark, staging, [("bad", float(x)) for x in (1, 2, 3, 4)], _SCHEMA, start)
    fetched = queue.fetch(["drift"]).collect()
    assert len(fetched) == 1
    row = fetched[0]
    assert row["group"] == "drift"
    assert "PSI drift on bad" in row["message"]
    ctx = json.loads(row["data"])
    assert ctx["metric"] == "bad" and ctx["n_rows"] == 4 and ctx["psi"] > 0.25
    # group filtering
    assert queue.fetch(["other"]).count() == 0
    # commit-after-send: consumed once, second fetch drains nothing
    queue.commit(queue.fetch(["drift"]))
    assert queue.fetch(["drift"]).count() == 0


# ---------------------------------------------------------------------------
# Round-12 second session: nonparametric/effect-size stats + MTA additions
# ---------------------------------------------------------------------------


def test_kruskal_wallis_exact_small_case(spark):
    """A=[1,2], B=[3,4]: ranks 1..4, R_A=3, R_B=7 ->
    H = 12/(4*5) * (9/2 + 49/2) - 3*5 = 2.4 exactly (no ties)."""
    from dawis_spark.operators.stats import kruskal_wallis

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3), ("b", 4)], ["g", "v"]
    )
    row = kruskal_wallis(df, "v", "g").first()
    assert row.k_groups == 2 and row.n_rows == 4
    assert abs(row.h - 2.4) < 1e-9
    assert abs(row.h_tie_corrected - 2.4) < 1e-9  # no ties -> C = 1


def test_kruskal_wallis_identical_groups_near_zero(spark):
    from dawis_spark.operators.stats import kruskal_wallis

    rows = [(g, v) for g in "abc" for v in range(1, 21)]
    df = spark.createDataFrame(rows, ["g", "v"])
    row = kruskal_wallis(df, "v", "g").first()
    assert abs(row.h_tie_corrected) < 1e-6  # identical distributions


def test_brown_forsythe_separates_spread_not_location(spark):
    from dawis_spark.operators.stats import brown_forsythe

    # same spread, shifted location -> F == 0 (deviations identical)
    same = spark.createDataFrame(
        [("a", 0), ("a", 10), ("a", 20), ("b", 100), ("b", 110), ("b", 120)],
        ["g", "v"],
    )
    r0 = brown_forsythe(same, "g", "v").first()
    assert r0.f_stat is not None and abs(r0.f_stat) < 1e-9
    # 10x spread difference -> large F
    spread = spark.createDataFrame(
        [("a", 0), ("a", 100), ("a", 200), ("b", 95), ("b", 100), ("b", 105)],
        ["g", "v"],
    )
    r1 = brown_forsythe(spread, "g", "v").first()
    assert r1.f_stat > 3  # n=3 per group: mean |dev| 133.3 vs 6.7


def test_group_median2_even_and_odd(spark):
    from dawis_spark.operators.stats import group_median2

    df = spark.createDataFrame(
        [("odd", v) for v in (1, 5, 9)] + [("even", v) for v in (2, 4, 6, 8)],
        ["g", "v"],
    )
    m = {r.g: r.m2 for r in group_median2(df, "g", "v").collect()}
    assert m["odd"] == 10  # 2 * 5
    assert m["even"] == 10  # 4 + 6


def test_two_sample_effect_sizes_hand_case(spark):
    """A=[3,4], B=[1,2]: d = 2/sqrt(0.5), g = d*(1 - 3/7), delta = 1."""
    from dawis_spark.operators.stats import two_sample_effect_sizes

    df = spark.createDataFrame(
        [("A", 3), ("A", 4), ("B", 1), ("B", 2)], ["side", "v"]
    )
    r = two_sample_effect_sizes(df, "v", "side", "A", "B").first()
    assert r.n_a == 2 and r.n_b == 2
    assert abs(r.mean_diff - 2.0) < 1e-9
    assert abs(r.cohens_d - 2.828427) < 1e-6
    assert abs(r.hedges_g - 2.828427 * (1 - 3.0 / 7.0)) < 1e-5
    assert r.cliffs_delta == 1.0


def test_g_test_zero_on_exact_independence(spark):
    from dawis_spark.operators.stats import g_test_independence

    rows = (
        [("r1", "c1")] * 10 + [("r1", "c2")] * 20
        + [("r2", "c1")] * 20 + [("r2", "c2")] * 40
    )
    df = spark.createDataFrame(rows, ["r", "c"])
    row = g_test_independence(df, "r", "c").first()
    assert row.dof == 1 and row.n_cells == 4
    assert abs(row.g2) < 1e-12


def _mta_events(spark, rows):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_linear_attribution_even_split_with_remainder_to_first(spark):
    import datetime as dt

    from dawis_spark.operators.journeys import linear_attribution

    t = lambda h: dt.datetime(2024, 1, 1, h)  # noqa: E731
    ev = _mta_events(
        spark,
        [
            (1, t(1), 7, "click", 0.0),
            (2, t(2), 7, "view", 0.0),
            (3, t(3), 7, "email", 0.0),
            (4, t(4), 7, "purchase", 1.0),
        ],
    )
    out = {r.touch_type: r.credit for r in linear_attribution(ev).collect()}
    # 100 cents over 3 touches: ppm 333334/333333/333333 -> credits
    # 33.3334/33.3333/33.3333 cents -> all round to 0.33
    assert out == {"click": 0.33, "view": 0.33, "email": 0.33}


def test_time_decay_attribution_halves_per_week(spark):
    import datetime as dt

    from dawis_spark.operators.journeys import time_decay_attribution

    ev = _mta_events(
        spark,
        [
            (1, dt.datetime(2024, 1, 1), 7, "email", 0.0),  # 8 days out
            (2, dt.datetime(2024, 1, 9), 7, "click", 0.0),  # same day
            (3, dt.datetime(2024, 1, 9, 12), 7, "purchase", 1.0),
        ],
    )
    out = {
        r.touch_type: r.credit
        for r in time_decay_attribution(ev, half_life_days=7).collect()
    }
    # weights: email 1e6>>1=5e5, click 1e6 -> 100*5e5//15e5=33, 100*1e6//15e5=66
    assert out == {"email": 0.33, "click": 0.66}


def test_nelson_aalen_matches_kaplan_meier_relation(spark):
    """exp(-H_NA(t)) >= S_KM(t) everywhere (1-x <= e^-x per factor),
    and the cumulative hazard is nondecreasing."""
    from dawis_spark import queries as q

    sf = "/root/testdata/sf0.001"
    na = (
        q.QUERIES["nelson_aalen_hazard"](spark, sf)
        .orderBy("duration")
        .collect()
    )
    km = {
        r.duration: r.survival
        for r in q.QUERIES["kaplan_meier_retention"](spark, sf).collect()
    }
    prev = -1.0
    for r in na:
        assert r.cum_hazard >= prev - 1e-12
        prev = r.cum_hazard
        assert r.survival_na >= km[r.duration] - 1e-9


def test_ar2_coefficients_match_numpy_lstsq(spark):
    """The Cramer-rule AR(2) solve equals numpy's least squares on the
    same lag design (synthetic series with known structure)."""
    import numpy as np

    from dawis_spark import queries as q

    rows = q.QUERIES["ar2_forecast_daily"](spark, "/root/testdata/sf0.001").collect()
    assert [r.h for r in rows] == [1, 2, 3, 4, 5, 6, 7]
    phi1, phi2, c0 = rows[0].phi1, rows[0].phi2, rows[0].intercept_cents
    # rebuild the same daily series and check against numpy
    daily = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .orderBy("o_orderdate")
        .collect()
    )
    x = np.array([round(r[1] * 100) for r in daily], dtype=np.float64)
    X = np.column_stack([np.ones(len(x) - 2), x[1:-1], x[:-2]])
    beta, *_ = np.linalg.lstsq(X, x[2:], rcond=None)
    assert abs(c0 - beta[0]) / max(abs(beta[0]), 1.0) < 1e-4
    assert abs(phi1 - beta[1]) < 1e-4
    assert abs(phi2 - beta[2]) < 1e-4
    # recursive forecast replays the fitted recursion
    f1 = beta[0] + beta[1] * x[-1] + beta[2] * x[-2]
    assert abs(rows[0].forecast - round(f1 / 100, 2)) < 0.05


def test_esd_rounds_are_disjoint_and_extreme_first(spark):
    from dawis_spark import queries as q

    rows = q.QUERIES["esd_outliers_daily"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 5
    assert len({r.day for r in rows}) == 5  # each round removes its pick


def test_binseg_level2_gain_not_above_level1(spark):
    """Level 1 maximizes over the whole series; level 2 maximizes over
    a subset of the same candidate splits' refinements — its gain can
    exceed level 1's only if the level-1 split were suboptimal."""
    from dawis_spark import queries as q

    rows = {
        r.level: r
        for r in q.QUERIES["binseg_changepoints_daily"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert rows[1].gain > 0 and rows[2].gain > 0
    assert rows[1].split_day != rows[2].split_day


# ---------------------------------------------------------------------------
# CUSUM alert wiring (the stream_psi_alerts discipline for the second
# detector family: PSI = distribution drift, CUSUM = level shift)
# ---------------------------------------------------------------------------

_CU_SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)
_CU_FLAT = [("ok", i, 100) for i in range(16)]


def test_stream_cusum_alerts_single_shot_and_batch_equivalence(spark, tmp_path):
    """One alert per shifted series at first breach, none for the flat
    one, no re-alerting; the alerted set equals cusum_closed_form over
    the union of delivered rollups."""
    from dawis_spark.streaming.cusum import cusum_closed_form, stream_cusum_alerts
    from dawis_spark.streaming.stream import staging_stream

    staging = str(tmp_path / "staging")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return (
            stream_cusum_alerts(
                staging_stream(spark, staging, _CU_SCHEMA),
                "series",
                "bucket",
                "cents",
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    # tick 1: both series flat -> no alerts
    _tick(spark, staging,
          [("bad", i, 100) for i in range(10)] + _CU_FLAT[:10], _CU_SCHEMA, start)
    import os
    produced = (
        spark.read.parquet(sink).collect()
        if any(f.endswith(".parquet") for f in os.listdir(sink))
        else []
    )
    assert produced == []
    # tick 2: "bad" jumps to 300 -> single alert at the first breach bucket
    _tick(spark, staging,
          [("bad", i, 300) for i in range(10, 16)] + _CU_FLAT[10:], _CU_SCHEMA, start)
    alerts = spark.read.parquet(sink).collect()
    assert [(r["series"], r["bucket"]) for r in alerts] == [("bad", 11)]
    # tick 3: shift persists -> the latch must hold (no second alert)
    _tick(spark, staging, [("bad", 16, 300), ("ok", 16, 100)], _CU_SCHEMA, start)
    assert spark.read.parquet(sink).count() == 1
    # batch twin: alerted set == keys whose closed form over the union breaches
    by_key = {}
    for r in spark.read.parquet(staging).collect():
        by_key.setdefault(r["series"], {})[r["bucket"]] = r["cents"]
    batch_alerted = {
        k
        for k, hist in by_key.items()
        if any(fl for _, _, fl in cusum_closed_form(sorted(hist.items())))
    }
    assert batch_alerted == {r["series"] for r in alerts} == {"bad"}


def test_cusum_alerts_flow_into_alert_queue(spark, tmp_path):
    import json

    from dawis_spark.streaming.alerts import AlertQueue
    from dawis_spark.streaming.cusum import cusum_alerts_to_queue, stream_cusum_alerts
    from dawis_spark.streaming.stream import staging_stream

    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    queue = AlertQueue(spark, str(tmp_path / "q"))

    def start():
        alerts = stream_cusum_alerts(
            staging_stream(spark, staging, _CU_SCHEMA),
            "series",
            "bucket",
            "cents",
        )
        return (
            cusum_alerts_to_queue(alerts, queue, group="shift")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    rows = [("bad", i, 100) for i in range(10)] + [
        ("bad", i, 300) for i in range(10, 16)
    ]
    _tick(spark, staging, rows, _CU_SCHEMA, start)
    fetched = queue.fetch(["shift"]).collect()
    assert len(fetched) == 1
    row = fetched[0]
    assert row["group"] == "shift"
    assert "CUSUM level shift on bad at bucket 11" in row["message"]
    ctx = json.loads(row["data"])
    assert ctx["series"] == "bad" and ctx["bucket"] == 11 and ctx["n_buckets"] == 16
    queue.commit(queue.fetch(["shift"]))
    assert queue.fetch(["shift"]).count() == 0


def test_classifier_diagnostics_ranges(spark):
    """HL stat >= 0 with dof = bins-2; KS in [0, 1]; MCC in [-1, 1] and
    consistent with its own confusion cells."""
    import math

    from dawis_spark import queries as q

    sf = "/root/testdata/sf0.001"
    hl = q.QUERIES["hosmer_lemeshow_classifier"](spark, sf).collect()
    assert all(r.hl_stat >= 0 for r in hl)
    assert all(r.dof == len(hl) - 2 for r in hl)
    assert all(abs(r.expected - r.n_b * (r.bin_lo + 0.05)) < r.n_b * 0.05 + 1
               for r in hl)  # expected falls inside its own bin's range
    ks = q.QUERIES["ks_statistic_classifier"](spark, sf).first()
    assert 0.0 <= ks.ks_stat <= 1.0
    assert 0.0 <= ks.at_threshold <= 1.0
    m = q.QUERIES["mcc_classifier_confusion"](spark, sf).first()
    assert -1.0 <= m.mcc <= 1.0
    num = m.tp * m.tn - m.fp * m.fn
    den = math.sqrt(
        (m.tp + m.fp) * (m.tp + m.fn) * (m.tn + m.fp) * (m.tn + m.fn)
    )
    assert abs(m.mcc - num / den) < 1e-6


def test_cramer_von_mises_hand_case_and_null(spark):
    """A=[1,2] vs B=[3,4]: T = 24/64 = 0.375 exactly; identical
    samples give T = 0."""
    from dawis_spark.operators.stats import cramer_von_mises

    sep = spark.createDataFrame(
        [("A", 1), ("A", 2), ("B", 3), ("B", 4)], ["side", "v"]
    )
    r = cramer_von_mises(sep, "v", "side", "A", "B").first()
    assert r.n_a == 2 and r.n_b == 2
    assert abs(r.t_cvm - 0.375) < 1e-9
    same = spark.createDataFrame(
        [("A", 1), ("A", 2), ("B", 1), ("B", 2)], ["side", "v"]
    )
    assert cramer_von_mises(same, "v", "side", "A", "B").first().t_cvm == 0.0


def test_anderson_darling_orders_separation(spark):
    from dawis_spark.operators.stats import anderson_darling_k

    same = spark.createDataFrame(
        [(g, v) for g in "ab" for v in range(1, 11)], ["g", "v"]
    )
    sep = spark.createDataFrame(
        [("a", v) for v in range(1, 11)] + [("b", v) for v in range(11, 21)],
        ["g", "v"],
    )
    a_same = anderson_darling_k(same, "v", "g").first().a2_akn
    a_sep = anderson_darling_k(sep, "v", "g").first().a2_akn
    assert a_sep > a_same


def test_friedman_perfect_ordering_hits_maximum(spark):
    """3 complete blocks, 3 treatments, identical ordering in every
    block -> Q = n(k-1) = 6, the statistic's maximum."""
    from dawis_spark.operators.stats import friedman_test

    rows = [
        (blk, tr, base + off)
        for blk, base in (("d1", 10), ("d2", 20), ("d3", 30))
        for tr, off in (("a", 1), ("b", 2), ("c", 3))
    ]
    df = spark.createDataFrame(rows, ["blk", "tr", "v"])
    r = friedman_test(df, "blk", "tr", "v").first()
    assert r.k_treatments == 3 and r.n_blocks == 3
    assert abs(r.q_stat - 6.0) < 1e-9


def test_friedman_drops_incomplete_blocks(spark):
    from dawis_spark.operators.stats import friedman_test

    rows = [
        ("d1", "a", 1), ("d1", "b", 2),
        ("d2", "a", 1), ("d2", "b", 2),
        ("d3", "a", 1),  # incomplete: no 'b'
    ]
    df = spark.createDataFrame(rows, ["blk", "tr", "v"])
    r = friedman_test(df, "blk", "tr", "v").first()
    assert r.n_blocks == 2  # d3 dropped


# ---------------------------------------------------------------------------
# Page-Hinkley alert wiring — third detector into the same queue
# ---------------------------------------------------------------------------


def test_stream_page_hinkley_alerts_single_shot_and_batch_equivalence(
    spark, tmp_path
):
    from dawis_spark.streaming.pagehinkley import (
        ph_closed_form,
        stream_page_hinkley_alerts,
    )
    from dawis_spark.streaming.stream import staging_stream

    staging = str(tmp_path / "staging")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return (
            stream_page_hinkley_alerts(
                staging_stream(spark, staging, _CU_SCHEMA),
                "series",
                "bucket",
                "cents",
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    import os

    # tick 1: both flat -> no alerts
    _tick(spark, staging,
          [("bad", i, 100) for i in range(12)]
          + [("ok", i, 100) for i in range(12)], _CU_SCHEMA, start)
    produced = (
        spark.read.parquet(sink).collect()
        if any(f.endswith(".parquet") for f in os.listdir(sink))
        else []
    )
    assert produced == []
    # tick 2: "bad" drifts up 60% -> single alert at the first alarm bucket
    _tick(spark, staging,
          [("bad", i, 160) for i in range(12, 24)]
          + [("ok", i, 100) for i in range(12, 24)], _CU_SCHEMA, start)
    alerts = spark.read.parquet(sink).collect()
    assert [(r["series"], r["bucket"]) for r in alerts] == [("bad", 12)]
    # tick 3: drift persists -> latch holds
    _tick(spark, staging, [("bad", 24, 160), ("ok", 24, 100)], _CU_SCHEMA, start)
    assert spark.read.parquet(sink).count() == 1
    # batch twin over the union of all delivered rollups
    by_key = {}
    for r in spark.read.parquet(staging).collect():
        by_key.setdefault(r["series"], {})[r["bucket"]] = r["cents"]
    batch_alerted = {
        k
        for k, hist in by_key.items()
        if any(fl for _, _, fl in ph_closed_form(sorted(hist.items())))
    }
    assert batch_alerted == {r["series"] for r in alerts} == {"bad"}


def test_ph_alerts_flow_into_alert_queue(spark, tmp_path):
    import json

    from dawis_spark.streaming.alerts import AlertQueue
    from dawis_spark.streaming.pagehinkley import (
        ph_alerts_to_queue,
        stream_page_hinkley_alerts,
    )
    from dawis_spark.streaming.stream import staging_stream

    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    queue = AlertQueue(spark, str(tmp_path / "q"))

    def start():
        alerts = stream_page_hinkley_alerts(
            staging_stream(spark, staging, _CU_SCHEMA),
            "series",
            "bucket",
            "cents",
        )
        return (
            ph_alerts_to_queue(alerts, queue, group="mean-drift")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    rows = [("bad", i, 100) for i in range(12)] + [
        ("bad", i, 160) for i in range(12, 24)
    ]
    _tick(spark, staging, rows, _CU_SCHEMA, start)
    fetched = queue.fetch(["mean-drift"]).collect()
    assert len(fetched) == 1
    row = fetched[0]
    assert "Page-Hinkley mean drift on bad at bucket 12" in row["message"]
    ctx = json.loads(row["data"])
    assert ctx["series"] == "bad" and ctx["n_buckets"] == 24
    queue.commit(queue.fetch(["mean-drift"]))
    assert queue.fetch(["mean-drift"]).count() == 0


# ---------------------------------------------------------------------------
# SPC / Western-Electric alert wiring (fourth detector family: PSI =
# distribution drift, CUSUM = level shift, Page-Hinkley = mean drift,
# SPC/WE = the chart rules a human reads)
# ---------------------------------------------------------------------------

# noisy-but-in-control base series, then a 4x spike at bucket 10
_SPC_BASE = [100, 103, 97, 101, 99, 104, 96, 100, 102, 98]


def test_spc_closed_form_flags_spike_and_guards_flat():
    from dawis_spark.streaming.spc import spc_closed_form

    flat = [(i, 100) for i in range(12)]
    assert all(m == 0 for _, _, m in spc_closed_form(flat))

    series = [(i, v) for i, v in enumerate(_SPC_BASE + [400])]
    scored = spc_closed_form(series)
    # the spike must fire rule 1 (beyond 3 sigma) at bucket 10
    b, units, mask = scored[-1]
    assert b == 10 and (mask & 1) == 1 and units > 3000
    # and nothing before the spike fires rule 1
    assert all((m & 1) == 0 for _, _, m in scored[:-1])


def test_stream_spc_alerts_single_shot_and_batch_equivalence(spark, tmp_path):
    """One alert for the spiking series at the first breaching bucket,
    none for the flat one, latch holds; alerted set equals
    spc_closed_form over the union of delivered rollups."""
    import os

    from dawis_spark.streaming.spc import spc_closed_form, stream_spc_alerts
    from dawis_spark.streaming.stream import staging_stream

    staging = str(tmp_path / "staging")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return (
            stream_spc_alerts(
                staging_stream(spark, staging, _CU_SCHEMA),
                "series",
                "bucket",
                "cents",
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    # tick 1: both series in control -> no alerts
    _tick(
        spark,
        staging,
        [("bad", i, v) for i, v in enumerate(_SPC_BASE)]
        + [("ok", i, 100) for i in range(10)],
        _CU_SCHEMA,
        start,
    )
    produced = (
        spark.read.parquet(sink).collect()
        if any(f.endswith(".parquet") for f in os.listdir(sink))
        else []
    )
    assert produced == []
    # tick 2: "bad" spikes -> single alert with rule 1 in the mask
    _tick(
        spark,
        staging,
        [("bad", 10, 400), ("ok", 10, 100)],
        _CU_SCHEMA,
        start,
    )
    alerts = spark.read.parquet(sink).collect()
    # with the spike folded into the limits, mu shifts above the whole
    # base series, so rule 2 (9 consecutive below center) fires at
    # bucket 8 BEFORE the spike's own rule-1 breach at bucket 10 —
    # assert against the closed form, not a hand-picked bucket
    expected = next(
        (b, m)
        for b, _, m in spc_closed_form(
            [(i, v) for i, v in enumerate(_SPC_BASE + [400])]
        )
        if m > 0
    )
    assert [(r["series"], r["bucket"]) for r in alerts] == [
        ("bad", expected[0])
    ]
    assert alerts[0]["rule_mask"] == expected[1]
    # tick 3: spike persists -> the latch must hold
    _tick(spark, staging, [("bad", 11, 400), ("ok", 11, 100)], _CU_SCHEMA, start)
    assert spark.read.parquet(sink).count() == 1
    # batch twin: alerted set == keys whose closed form over the union fires
    by_key = {}
    for r in spark.read.parquet(staging).collect():
        by_key.setdefault(r["series"], {})[r["bucket"]] = r["cents"]
    batch_alerted = {
        k
        for k, hist in by_key.items()
        if any(m > 0 for _, _, m in spc_closed_form(sorted(hist.items())))
    }
    assert batch_alerted == {r["series"] for r in alerts} == {"bad"}


def test_spc_alerts_flow_into_alert_queue(spark, tmp_path):
    import json

    from dawis_spark.streaming.alerts import AlertQueue
    from dawis_spark.streaming.spc import spc_alerts_to_queue, stream_spc_alerts
    from dawis_spark.streaming.stream import staging_stream

    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    queue = AlertQueue(spark, str(tmp_path / "q"))

    def start():
        alerts = stream_spc_alerts(
            staging_stream(spark, staging, _CU_SCHEMA),
            "series",
            "bucket",
            "cents",
        )
        return (
            spc_alerts_to_queue(alerts, queue, group="spc")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    rows = [("bad", i, v) for i, v in enumerate(_SPC_BASE + [400])]
    _tick(spark, staging, rows, _CU_SCHEMA, start)
    fetched = queue.fetch(["spc"]).collect()
    assert len(fetched) == 1
    row = fetched[0]
    # first breach over the full series is rule 2 at bucket 8 (see the
    # single-shot test) — the message names the fired rule(s)
    assert "SPC rule breach (WE2) on bad at bucket 8" in row["message"]
    ctx = json.loads(row["data"])
    assert ctx["series"] == "bad" and ctx["bucket"] == 8
    assert ctx["rule_mask"] == 2 and ctx["n_buckets"] == 11
    queue.commit(queue.fetch(["spc"]))
    assert queue.fetch(["spc"]).count() == 0


def test_wasserstein_1d_self_zero_and_shift(spark):
    """W1(X, X) = 0; W1 of a constant +delta shift = delta (the metric's
    defining translation property — KS/CvM can't see magnitude)."""
    from dawis_spark.operators.stats import wasserstein_1d

    rows = [(v, "a") for v in (100, 200, 300, 400)] + [
        (v, "b") for v in (100, 200, 300, 400)
    ]
    df = spark.createDataFrame(rows, "v long, side string")
    out = wasserstein_1d(df, "v", "side", "a", "b").collect()[0]
    assert out["w1"] == 0.0 and out["n_a"] == 4

    rows = [(v, "a") for v in (100, 200, 300, 400)] + [
        (v + 50, "b") for v in (100, 200, 300, 400)
    ]
    df = spark.createDataFrame(rows, "v long, side string")
    out = wasserstein_1d(df, "v", "side", "a", "b").collect()[0]
    assert out["w1"] == 50.0


def test_hellinger_tvd_bounds_and_disjoint(spark):
    """Self-distance 0; fully disjoint supports give TVD = 1 and
    Hellinger = 1 (both metrics saturate at their upper bound)."""
    from dawis_spark.operators.stats import hellinger_tvd

    same = [(v, s) for v in (10, 20, 30, 90) for s in ("a", "b")]
    df = spark.createDataFrame(same, "v long, side string")
    out = hellinger_tvd(df, "v", "side", "a", "b", n_bins=4).collect()[0]
    assert out["tvd"] == 0.0 and out["hellinger"] == 0.0
    assert out["bhattacharyya"] == 1.0

    rows = [(v, "a") for v in (10, 11, 12)] + [(v, "b") for v in (90, 91, 92)]
    df = spark.createDataFrame(rows, "v long, side string")
    out = hellinger_tvd(df, "v", "side", "a", "b", n_bins=4).collect()[0]
    assert out["tvd"] == 1.0 and out["hellinger"] == 1.0


def test_ses_theta_fit_constant_and_trend():
    """A constant series smooths to itself with zero slope; a perfect
    linear ramp recovers the exact slope (num/den = step)."""
    from dawis_spark.operators.forecast import ses_theta_fit

    lvl, num, den = ses_theta_fit([500, 500, 500, 500])
    assert lvl == 500 and num == 0

    ramp = [100 * t for t in range(1, 9)]
    lvl, num, den = ses_theta_fit(ramp)
    assert num / den == 100.0
    assert lvl < ramp[-1]  # SES lags a rising ramp


def test_croston_fit_regular_and_gapped():
    """Dense demand (interval 1) keeps interval_hat at 1 so rate ==
    size_hat; doubling every gap halves the rate estimate's
    denominator direction (interval_hat grows toward 2)."""
    from dawis_spark.operators.forecast import croston_fit

    z, q, m = croston_fit([0, 1, 2, 3], [8, 8, 8, 8])
    assert q == 1000000 and z == 8000000 and m == 4

    z2, q2, _ = croston_fit([0, 2, 4, 6], [8, 8, 8, 8])
    assert z2 == 8000000 and q2 > 1500000  # converging toward 2.0


def test_platt_fit_identity_on_calibrated_input():
    """Margins that already produce perfectly-calibrated hard labels
    leave (a, b) essentially at the (1, 0) init — the no-op fixpoint;
    a uniform positive residual pushes b down."""
    from dawis_spark.operators.logreg import platt_fit

    # sigmoid(+/-10) leaves a round-6 residual of ~+/-4.5e-5, so the
    # trajectory drifts by O(1e-3), not zero
    a, b = platt_fit([10.0, 10.0, -10.0, -10.0], [1.0, 1.0, 0.0, 0.0])
    assert abs(a - 1.0) < 1e-2 and abs(b) < 1e-2

    a2, b2 = platt_fit([2.0, 2.0, 2.0, 2.0], [0.0, 0.0, 0.0, 0.0])
    assert b2 < 0  # all-negative labels drag the intercept down


_MSPRT_SCHEMA = T.StructType(
    [
        T.StructField("exp", T.StringType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("n0", T.LongType()),
        T.StructField("s0", T.LongType()),
        T.StructField("ss0", T.LongType()),
        T.StructField("n1", T.LongType()),
        T.StructField("s1", T.LongType()),
        T.StructField("ss1", T.LongType()),
    ]
)


def _msprt_rollup(bucket, mean0, mean1, n=20, jitter=5):
    """Arm rollups with +/-jitter alternating around each mean so the
    pooled variance is nonzero (and exact integers)."""
    vals0 = [mean0 + (jitter if i % 2 else -jitter) for i in range(n)]
    vals1 = [mean1 + (jitter if i % 2 else -jitter) for i in range(n)]
    return (
        bucket,
        n,
        sum(vals0),
        sum(v * v for v in vals0),
        n,
        sum(vals1),
        sum(v * v for v in vals1),
    )


def test_stream_msprt_single_shot_and_batch_equivalence(spark, tmp_path):
    """A real effect alerts exactly once at its first crossing bucket;
    a null effect never alerts; the alerted key set equals the closed
    form over the union of all delivered rollups."""
    from dawis_spark.streaming.msprt import (
        msprt_closed_form,
        stream_msprt_alerts,
    )
    from dawis_spark.streaming.stream import staging_stream

    staging = str(tmp_path / "staging")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return (
            stream_msprt_alerts(
                staging_stream(spark, staging, _MSPRT_SCHEMA), "exp", "bucket"
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    eff = [("lift",) + _msprt_rollup(b, 100, 140) for b in range(4)]
    nul = [("flat",) + _msprt_rollup(b, 100, 100) for b in range(4)]

    # tick 1: first two buckets of each
    _tick(spark, staging, eff[:2] + nul[:2], _MSPRT_SCHEMA, start)
    got1 = spark.read.parquet(sink).collect()
    # tick 2: the rest — the latch must not re-alert
    _tick(spark, staging, eff[2:] + nul[2:], _MSPRT_SCHEMA, start)
    got2 = spark.read.parquet(sink).collect()

    lifted = [r for r in got2 if r["exp"] == "lift"]
    assert len(lifted) == 1
    assert not [r for r in got2 if r["exp"] == "flat"]

    # batch equivalence: closed form over the union crosses for lift at
    # the same bucket the stream alerted on, never for flat
    walk = msprt_closed_form([r[1:] for r in eff])
    crossings = [b for b, _, _, _, p in walk if p <= 0.05]
    assert crossings and lifted[0]["bucket"] == crossings[0]
    assert lifted[0]["p_milli"] <= 50
    null_walk = msprt_closed_form([r[1:] for r in nul])
    assert all(p > 0.05 for *_, p in null_walk)
    # single-shot: tick 1's output already contains the alert iff the
    # first two buckets crossed (consistency between ticks)
    walk2 = msprt_closed_form([r[1:] for r in eff[:2]])
    assert (len(got1) > 0) == any(p <= 0.05 for *_, p in walk2)


def test_msprt_alerts_flow_into_alert_queue(spark, tmp_path):
    import json

    from dawis_spark.streaming.alerts import AlertQueue
    from dawis_spark.streaming.msprt import (
        msprt_alerts_to_queue,
        stream_msprt_alerts,
    )
    from dawis_spark.streaming.stream import staging_stream

    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    queue = AlertQueue(spark, str(tmp_path / "q"))

    def start():
        alerts = stream_msprt_alerts(
            staging_stream(spark, staging, _MSPRT_SCHEMA), "exp", "bucket"
        )
        return (
            msprt_alerts_to_queue(alerts, queue)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    rows = [("lift",) + _msprt_rollup(b, 100, 140) for b in range(4)]
    _tick(spark, staging, rows, _MSPRT_SCHEMA, start)
    fetched = queue.fetch(["msprt"]).collect()
    assert len(fetched) == 1
    row = fetched[0]
    assert "mSPRT significance on lift at bucket" in row["message"]
    ctx = json.loads(row["data"])
    assert ctx["exp"] == "lift" and ctx["p_milli"] <= 50
    assert ctx["n_ctrl"] == ctx["n_treat"]
    queue.commit(queue.fetch(["msprt"]))
    assert queue.fetch(["msprt"]).count() == 0


def test_huber_fit_resists_outlier():
    """One gross outlier drags the OLS slope but barely moves the
    Huber-IRLS fit (the operator's reason to exist)."""
    from dawis_spark.operators.stats import huber_irls_fit

    xs = list(range(1, 41))
    ys = [100 * x for x in xs]
    ys[-1] += 100_000_000  # one whale at the end
    a, b = huber_irls_fit(xs, ys, iterations=3, k=5_000)
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    b_ols = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert b_ols > 10_000  # OLS chases the whale
    # 3 IRLS rounds pull the slope back within ~2x of truth from an
    # initialization 100x off — two orders of magnitude of the
    # contamination removed
    assert b < b_ols / 50 and abs(b - 100) < 150


def test_cdc_chunks_boundary_locality(spark):
    """Content-defined chunking's defining property: inserting one
    token changes only the chunk containing it — downstream chunk
    hashes survive, unlike fixed-width windows."""
    from dawis_spark.queries import _cdc_chunks_expr, _cdc_cuts_expr
    from dawis_spark.functions import text as T

    # diverse tokens so ~1/16 of rolling windows are boundaries; a
    # periodic text has too few distinct windows to cut at all
    toks = [f"tok{i}word" for i in range(120)]
    base = " ".join(toks)
    edited = " ".join(toks[:60] + ["INSERTED"] + toks[60:])
    th = T.token_hash_array("text", "spark")
    cuts = _cdc_cuts_expr("__th", "spark")
    chunks = _cdc_chunks_expr("__th", "__cuts", "spark")
    df = (
        spark.createDataFrame([(1, base), (2, edited)], "id int, text string")
        .selectExpr("id", f"{th} AS __th")
        .selectExpr("id", "__th", f"{cuts} AS __cuts")
        .selectExpr("id", f"{chunks} AS ch")
        .collect()
    )
    sets = {r["id"]: {c["ch"] for c in r["ch"]} for r in df}
    shared = sets[1] & sets[2]
    # the edit perturbs a bounded neighborhood; most chunks survive
    assert len(shared) >= max(1, len(sets[1]) - 3)
