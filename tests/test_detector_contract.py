"""ONE parameterized contract for the streaming detector->queue loops.

The reference's whole runtime is measure -> decide -> deliver (checks
feed the alert queue, the Dispatcher drains it). Six streaming
detectors implement that loop — PSI (distribution drift), CUSUM (level
shift), Page-Hinkley (mean drift), SPC/Western-Electric (chart rules),
mSPRT (sequential significance), Holt forecast-residual (trend break).
Each used to carry a hand-rolled single-shot + batch-equivalence +
queue-delivery test trio (VERDICT r13 #5); this file replaces the six
trios with one spec table + two parameterized tests, so detector #7
inherits the discipline by adding a spec instead of re-rolling it.

The contract every detector must satisfy:
  1. QUIET: ticks whose data stays within the detector's tolerance
     produce no alert rows;
  2. BREACH: the first out-of-tolerance tick produces EXACTLY the
     closed form's first breach (bucket + payload fields), once;
  3. LATCH: a persisting breach on a later tick does not re-alert;
  4. BATCH TWIN: the alerted key set equals the SAME closed form
     evaluated over the union of every delivered row (in-order
     delivery reproduces the batch decision);
  5. QUEUE: alerts land in the AlertQueue under the detector's group
     with the JSON context, are invisible to other groups, and
     commit-after-send drains them exactly once.
"""

import json
import os

import pandas as pd  # noqa: F401  (streaming folds return pandas)
import pytest
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# shared scaffolding
# ---------------------------------------------------------------------------


def _tick(spark, staging, rows, schema, build_query):
    """Append rows to the staging dir and drain one availableNow pass."""
    spark.createDataFrame(rows, schema).write.mode("append").parquet(staging)
    q = build_query()
    q.awaitTermination()


def _sink_rows(spark, sink):
    if not any(f.endswith(".parquet") for f in os.listdir(sink)):
        return []
    return spark.read.parquet(sink).collect()


_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ]
)
_SERIES_SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)
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

_PSI_REF = [5, 5, 5, 5]  # uniform reference over [0, 100), 4 bins
_PSI_HEALTHY = [("ok", float(x)) for x in (10, 35, 60, 85)]

_CU_FLAT = [("ok", i, 100) for i in range(16)]

# noisy-but-in-control base series, then a 4x spike at bucket 10
_SPC_BASE = [100, 103, 97, 101, 99, 104, 96, 100, 102, 98]

# a clean linear ramp: Holt follows the trend, residuals shrink — the
# monitor must stay quiet even though every point is far from the MEAN
# (the exact case SPC would flag and a trend-aware monitor must not)
_RAMP = [(i, 1000 + 100 * i) for i in range(14)]
_RAMP_BREAK = [(14, 2400), (15, 2500), (16, 4000)]


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


def _series_union(rows):
    """(key, bucket, value) rows -> {key: sorted (bucket, value) list},
    same-bucket redelivery REPLACES (the detectors' state contract)."""
    by_key = {}
    for k, b, v in rows:
        by_key.setdefault(k, {})[b] = v
    return {k: sorted(h.items()) for k, h in by_key.items()}


# ---------------------------------------------------------------------------
# the spec table — one entry per detector
# ---------------------------------------------------------------------------


class Spec:
    """All the per-detector variation the shared contract needs."""

    def __init__(
        self,
        name,
        schema,
        key_col,
        build,
        to_queue,
        group,
        quiet_ticks,
        breach_tick,
        persist_tick,
        check_alerts,
        batch_alerted,
        bad_key,
        queue_rows,
        message_fragment,
        ctx_check,
    ):
        self.name = name
        self.schema = schema
        self.key_col = key_col
        self.build = build
        self.to_queue = to_queue
        self.group = group
        self.quiet_ticks = quiet_ticks
        self.breach_tick = breach_tick
        self.persist_tick = persist_tick
        self.check_alerts = check_alerts
        self.batch_alerted = batch_alerted
        self.bad_key = bad_key
        self.queue_rows = queue_rows
        self.message_fragment = message_fragment
        self.ctx_check = ctx_check


def _psi_spec():
    from dawis_spark.operators.drift import bin_index, psi_from_counts
    from dawis_spark.streaming.drift import psi_alerts_to_queue, stream_psi_alerts

    def build(stream):
        return stream_psi_alerts(
            stream,
            "metric",
            "v",
            ref_lo=0.0,
            ref_hi=100.0,
            ref_counts=_PSI_REF,
            threshold=0.25,
            min_rows=4,
        )

    def check_alerts(alerts, rows):
        # min_rows gated the quiet tick's 2 piled rows; the breach tick's
        # 2 more cross the gate with every row in bin 0
        assert {(r["metric"], r["n_rows"]) for r in alerts} == {("bad", 4)}
        assert alerts[0]["psi"] > 0.25

    def batch_alerted(rows):
        by_key = {}
        for k, v in rows:
            by_key.setdefault(k, []).append(v)
        out = set()
        for k, vals in by_key.items():
            counts = [0] * 4
            for x in vals:
                counts[bin_index(x, 0.0, 100.0, 4)] += 1
            if len(vals) >= 4 and psi_from_counts(_PSI_REF, counts) > 0.25:
                out.add(k)
        return out

    def ctx_check(ctx):
        assert ctx["metric"] == "bad" and ctx["n_rows"] == 4 and ctx["psi"] > 0.25

    return Spec(
        name="psi",
        schema=_VALUE_SCHEMA,
        key_col="metric",
        build=build,
        to_queue=lambda alerts, queue: psi_alerts_to_queue(
            alerts, queue, group="drift"
        ),
        group="drift",
        quiet_ticks=[[("bad", 1.0), ("bad", 2.0)] + _PSI_HEALTHY],
        breach_tick=[("bad", 3.0), ("bad", 4.0)] + _PSI_HEALTHY,
        persist_tick=[("bad", 5.0), ("bad", 6.0)] + _PSI_HEALTHY,
        check_alerts=check_alerts,
        batch_alerted=batch_alerted,
        bad_key="bad",
        queue_rows=[("bad", float(x)) for x in (1, 2, 3, 4)],
        message_fragment="PSI drift on bad",
        ctx_check=ctx_check,
    )


def _cusum_spec():
    from dawis_spark.streaming.cusum import cusum_closed_form, stream_cusum_alerts
    from dawis_spark.streaming.cusum import cusum_alerts_to_queue

    def check_alerts(alerts, rows):
        assert [(r["series"], r["bucket"]) for r in alerts] == [("bad", 11)]

    def batch_alerted(rows):
        return {
            k
            for k, hist in _series_union(rows).items()
            if any(fl for _, _, fl in cusum_closed_form(hist))
        }

    def ctx_check(ctx):
        assert ctx["series"] == "bad" and ctx["bucket"] == 11
        assert ctx["n_buckets"] == 16

    return Spec(
        name="cusum",
        schema=_SERIES_SCHEMA,
        key_col="series",
        build=lambda stream: stream_cusum_alerts(
            stream, "series", "bucket", "cents"
        ),
        to_queue=lambda alerts, queue: cusum_alerts_to_queue(
            alerts, queue, group="shift"
        ),
        group="shift",
        quiet_ticks=[[("bad", i, 100) for i in range(10)] + _CU_FLAT[:10]],
        breach_tick=[("bad", i, 300) for i in range(10, 16)] + _CU_FLAT[10:],
        persist_tick=[("bad", 16, 300), ("ok", 16, 100)],
        check_alerts=check_alerts,
        batch_alerted=batch_alerted,
        bad_key="bad",
        queue_rows=[("bad", i, 100) for i in range(10)]
        + [("bad", i, 300) for i in range(10, 16)],
        message_fragment="CUSUM level shift on bad at bucket 11",
        ctx_check=ctx_check,
    )


def _ph_spec():
    from dawis_spark.streaming.pagehinkley import (
        ph_alerts_to_queue,
        ph_closed_form,
        stream_page_hinkley_alerts,
    )

    def check_alerts(alerts, rows):
        assert [(r["series"], r["bucket"]) for r in alerts] == [("bad", 12)]

    def batch_alerted(rows):
        return {
            k
            for k, hist in _series_union(rows).items()
            if any(fl for _, _, fl in ph_closed_form(hist))
        }

    def ctx_check(ctx):
        assert ctx["series"] == "bad" and ctx["n_buckets"] == 24

    return Spec(
        name="page_hinkley",
        schema=_SERIES_SCHEMA,
        key_col="series",
        build=lambda stream: stream_page_hinkley_alerts(
            stream, "series", "bucket", "cents"
        ),
        to_queue=lambda alerts, queue: ph_alerts_to_queue(
            alerts, queue, group="mean-drift"
        ),
        group="mean-drift",
        quiet_ticks=[
            [("bad", i, 100) for i in range(12)]
            + [("ok", i, 100) for i in range(12)]
        ],
        breach_tick=[("bad", i, 160) for i in range(12, 24)]
        + [("ok", i, 100) for i in range(12, 24)],
        persist_tick=[("bad", 24, 160), ("ok", 24, 100)],
        check_alerts=check_alerts,
        batch_alerted=batch_alerted,
        bad_key="bad",
        queue_rows=[("bad", i, 100) for i in range(12)]
        + [("bad", i, 160) for i in range(12, 24)],
        message_fragment="Page-Hinkley mean drift on bad at bucket 12",
        ctx_check=ctx_check,
    )


def _spc_spec():
    from dawis_spark.streaming.spc import (
        spc_alerts_to_queue,
        spc_closed_form,
        stream_spc_alerts,
    )

    def check_alerts(alerts, rows):
        # with the spike folded into the limits, mu shifts above the
        # whole base series, so rule 2 (9 consecutive below center)
        # fires at bucket 8 BEFORE the spike's own rule-1 breach at
        # bucket 10 — assert against the closed form, not a hand-picked
        # bucket
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

    def batch_alerted(rows):
        return {
            k
            for k, hist in _series_union(rows).items()
            if any(m > 0 for _, _, m in spc_closed_form(hist))
        }

    def ctx_check(ctx):
        assert ctx["series"] == "bad" and ctx["bucket"] == 8
        assert ctx["rule_mask"] == 2 and ctx["n_buckets"] == 11

    return Spec(
        name="spc",
        schema=_SERIES_SCHEMA,
        key_col="series",
        build=lambda stream: stream_spc_alerts(
            stream, "series", "bucket", "cents"
        ),
        to_queue=lambda alerts, queue: spc_alerts_to_queue(
            alerts, queue, group="spc"
        ),
        group="spc",
        quiet_ticks=[
            [("bad", i, v) for i, v in enumerate(_SPC_BASE)]
            + [("ok", i, 100) for i in range(10)]
        ],
        breach_tick=[("bad", 10, 400), ("ok", 10, 100)],
        persist_tick=[("bad", 11, 400), ("ok", 11, 100)],
        check_alerts=check_alerts,
        batch_alerted=batch_alerted,
        bad_key="bad",
        queue_rows=[("bad", i, v) for i, v in enumerate(_SPC_BASE + [400])],
        message_fragment="SPC rule breach (WE2) on bad at bucket 8",
        ctx_check=ctx_check,
    )


def _msprt_spec():
    from dawis_spark.streaming.msprt import (
        msprt_alerts_to_queue,
        msprt_closed_form,
        stream_msprt_alerts,
    )

    # bucket 0 is a null rollup for BOTH keys (the quiet tick — no
    # evidence, no crossing); "lift" then gets a 40% effect, "flat"
    # stays null forever
    lift_quiet = [("lift",) + _msprt_rollup(0, 100, 100)]
    flat_quiet = [("flat",) + _msprt_rollup(0, 100, 100)]
    lift_eff = [("lift",) + _msprt_rollup(b, 100, 140) for b in range(1, 4)]
    flat_null = [("flat",) + _msprt_rollup(b, 100, 100) for b in range(1, 4)]

    def check_alerts(alerts, rows):
        lifted = [r for r in alerts if r["exp"] == "lift"]
        assert len(lifted) == 1 and not [
            r for r in alerts if r["exp"] == "flat"
        ]
        # the stream's breach bucket is the closed form's first crossing
        # over the union of lift's delivered rollups
        union = sorted(
            {r[1]: r[1:] for r in rows if r[0] == "lift"}.values()
        )
        walk = msprt_closed_form(union)
        crossings = [b for b, _, _, _, p in walk if p <= 0.05]
        assert crossings and lifted[0]["bucket"] == crossings[0]
        assert lifted[0]["p_milli"] <= 50

    def batch_alerted(rows):
        by_key = {}
        for r in rows:
            by_key.setdefault(r[0], {})[r[1]] = r[1:]
        out = set()
        for k, hist in by_key.items():
            walk = msprt_closed_form([v for _, v in sorted(hist.items())])
            if any(p <= 0.05 for *_, p in walk):
                out.add(k)
        return out

    def ctx_check(ctx):
        assert ctx["exp"] == "lift" and ctx["p_milli"] <= 50
        assert ctx["n_ctrl"] == ctx["n_treat"]

    return Spec(
        name="msprt",
        schema=_MSPRT_SCHEMA,
        key_col="exp",
        build=lambda stream: stream_msprt_alerts(stream, "exp", "bucket"),
        to_queue=lambda alerts, queue: msprt_alerts_to_queue(alerts, queue),
        group="msprt",
        quiet_ticks=[lift_quiet + flat_quiet],
        breach_tick=lift_eff + flat_null,
        persist_tick=[("lift",) + _msprt_rollup(4, 100, 140)]
        + [("flat",) + _msprt_rollup(4, 100, 100)],
        check_alerts=check_alerts,
        batch_alerted=batch_alerted,
        bad_key="lift",
        queue_rows=[("lift",) + _msprt_rollup(b, 100, 140) for b in range(4)],
        message_fragment="mSPRT significance on lift at bucket",
        ctx_check=ctx_check,
    )


def _forecast_spec():
    from dawis_spark.operators.forecast import first_holt_residual_breach
    from dawis_spark.streaming.forecastmon import (
        forecast_alerts_to_queue,
        stream_forecast_residual_alerts,
    )

    def check_alerts(alerts, rows):
        expected = first_holt_residual_breach(_RAMP + _RAMP_BREAK)
        assert [
            (r["series"], r["bucket"], r["resid_cents"]) for r in alerts
        ] == [("bad", expected[0], expected[2])]
        assert alerts[0]["forecast_cents"] == expected[1]

    def batch_alerted(rows):
        return {
            k
            for k, hist in _series_union(rows).items()
            if first_holt_residual_breach(hist) is not None
        }

    def ctx_check(ctx):
        assert ctx["series"] == "bad" and ctx["bucket"] == 16
        assert ctx["resid_cents"] == 4000 - ctx["forecast_cents"]
        assert ctx["n_resid"] == 15

    return Spec(
        name="forecast_residual",
        schema=_SERIES_SCHEMA,
        key_col="series",
        build=lambda stream: stream_forecast_residual_alerts(
            stream, "series", "bucket", "cents"
        ),
        to_queue=lambda alerts, queue: forecast_alerts_to_queue(
            alerts, queue, group="forecast"
        ),
        group="forecast",
        quiet_ticks=[
            [("bad", b, v) for b, v in _RAMP]
            + [("ok", b, v) for b, v in _RAMP]
        ],
        breach_tick=[("ok", 14, 2400), ("ok", 15, 2500), ("ok", 16, 2600)]
        + [("bad", b, v) for b, v in _RAMP_BREAK],
        persist_tick=[("bad", 17, 4100), ("ok", 17, 2700)],
        check_alerts=check_alerts,
        batch_alerted=batch_alerted,
        bad_key="bad",
        queue_rows=[("bad", b, v) for b, v in _RAMP + _RAMP_BREAK],
        message_fragment="Forecast surprise on bad at bucket 16",
        ctx_check=ctx_check,
    )


def _srm_spec():
    from dawis_spark.streaming.srmmon import (
        srm_alerts_to_queue,
        srm_closed_form,
        stream_srm_alerts,
    )

    balanced = lambda key, b: (key, b, 50, 50)  # noqa: E731
    skewed = lambda key, b: (key, b, 80, 20)  # noqa: E731

    def check_alerts(alerts, rows):
        # first crossing per the closed form over bad's delivered union
        union = sorted(
            {r[1]: (r[2], r[3]) for r in rows if r[0] == "bad"}.items()
        )
        expected = next(row for row in srm_closed_form(union) if row[4])
        assert [
            (r["series"], r["bucket"], r["cum_n_a"], r["cum_n_b"])
            for r in alerts
        ] == [("bad", expected[0], expected[1], expected[2])]
        assert alerts[0]["chi2_milli"] == expected[3]

    def batch_alerted(rows):
        by_key = {}
        for k, b, a, bb in rows:
            by_key.setdefault(k, {})[b] = (a, bb)
        return {
            k
            for k, hist in by_key.items()
            if any(row[4] for row in srm_closed_form(sorted(hist.items())))
        }

    def ctx_check(ctx):
        assert ctx["series"] == "bad" and ctx["bucket"] == 3
        assert ctx["cum_n_a"] + ctx["cum_n_b"] >= 100
        assert ctx["chi2_milli"] > 3841

    return Spec(
        name="srm",
        schema=T.StructType(
            [
                T.StructField("series", T.StringType()),
                T.StructField("bucket", T.LongType()),
                T.StructField("n_a", T.LongType()),
                T.StructField("n_b", T.LongType()),
            ]
        ),
        key_col="series",
        build=lambda stream: stream_srm_alerts(
            stream, "series", "bucket", "n_a", "n_b"
        ),
        to_queue=lambda alerts, queue: srm_alerts_to_queue(
            alerts, queue, group="srm"
        ),
        group="srm",
        quiet_ticks=[
            [balanced("bad", b) for b in range(3)]
            + [balanced("ok", b) for b in range(3)]
        ],
        breach_tick=[skewed("bad", b) for b in range(3, 6)]
        + [balanced("ok", b) for b in range(3, 6)],
        persist_tick=[skewed("bad", 6), balanced("ok", 6)],
        check_alerts=check_alerts,
        batch_alerted=batch_alerted,
        bad_key="bad",
        queue_rows=[balanced("bad", b) for b in range(3)]
        + [skewed("bad", b) for b in range(3, 6)],
        message_fragment="Sample-ratio mismatch on bad at bucket 3",
        ctx_check=ctx_check,
    )


_SPEC_BUILDERS = {
    "psi": _psi_spec,
    "cusum": _cusum_spec,
    "page_hinkley": _ph_spec,
    "spc": _spc_spec,
    "msprt": _msprt_spec,
    "forecast_residual": _forecast_spec,
    "srm": _srm_spec,
}


def test_srm_closed_form_gates_and_crosses():
    """min_n gates tiny skews; a persistent 80/20 split crosses as soon
    as the cumulative total passes the gate; balanced never crosses."""
    from dawis_spark.streaming.srmmon import srm_closed_form

    skew = [(b, (8, 2)) for b in range(20)]
    walk = srm_closed_form(skew, min_n=100)
    assert all(not f for *_, f in walk[:9])  # n < 100 gated
    assert walk[9][4] == 1  # n = 100, chi2 = 36 > 3.84
    flat = srm_closed_form([(b, (50, 50)) for b in range(20)], min_n=100)
    assert all(not f for *_, f in flat)
    # chi2_milli is the running statistic, not per-bucket
    assert walk[9][1] == 80 and walk[9][2] == 20
    assert walk[9][3] == round((60 * 60) / 100 * 1000)


# ---------------------------------------------------------------------------
# the two contract tests
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("detector", sorted(_SPEC_BUILDERS))
def test_detector_single_shot_latch_and_batch_twin(spark, tmp_path, detector):
    """Contract clauses 1-4: quiet ticks are silent, the breach tick
    emits exactly the closed form's first breach, the latch holds under
    a persisting breach, and the alerted key set equals the batch twin
    over the union of all delivered rows."""
    from dawis_spark.streaming.stream import staging_stream

    spec = _SPEC_BUILDERS[detector]()
    staging = str(tmp_path / "staging")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return (
            spec.build(staging_stream(spark, staging, spec.schema))
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    delivered = []
    for rows in spec.quiet_ticks:
        delivered += rows
        _tick(spark, staging, rows, spec.schema, start)
        assert _sink_rows(spark, sink) == [], f"{detector}: quiet tick alerted"

    delivered += spec.breach_tick
    _tick(spark, staging, spec.breach_tick, spec.schema, start)
    alerts = _sink_rows(spark, sink)
    assert len(alerts) == 1, f"{detector}: expected exactly one alert"
    spec.check_alerts(alerts, delivered)

    delivered += spec.persist_tick
    _tick(spark, staging, spec.persist_tick, spec.schema, start)
    assert len(_sink_rows(spark, sink)) == 1, f"{detector}: latch broke"

    # batch twin: the union of every delivered row, pushed through the
    # SAME closed form, alerts exactly the streamed key set
    union = [tuple(r) for r in spark.read.parquet(staging).collect()]
    # parquet column order matches the schema, so tuples line up
    streamed = {r[spec.key_col] for r in alerts}
    assert spec.batch_alerted(union) == streamed == {spec.bad_key}


@pytest.mark.parametrize("detector", sorted(_SPEC_BUILDERS))
def test_detector_alerts_flow_into_queue(spark, tmp_path, detector):
    """Contract clause 5: the alert stream lands in the AlertQueue as
    ALERT_SCHEMA rows under the detector's group, carries the JSON
    context, is invisible to other groups, and the commit-after-send
    watermark consumes it exactly once (the at-least-once contract of
    the reference's queue -> Dispatcher path)."""
    from dawis_spark.streaming.alerts import AlertQueue
    from dawis_spark.streaming.stream import staging_stream

    spec = _SPEC_BUILDERS[detector]()
    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    queue = AlertQueue(spark, str(tmp_path / "q"))

    def start():
        alerts = spec.build(staging_stream(spark, staging, spec.schema))
        return (
            spec.to_queue(alerts, queue)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    _tick(spark, staging, spec.queue_rows, spec.schema, start)
    fetched = queue.fetch([spec.group]).collect()
    assert len(fetched) == 1
    row = fetched[0]
    assert row["group"] == spec.group
    assert spec.message_fragment in row["message"]
    spec.ctx_check(json.loads(row["data"]))
    # group filtering
    assert queue.fetch(["__other__"]).count() == 0
    # commit-after-send: consumed once, second fetch drains nothing
    queue.commit(queue.fetch([spec.group]))
    assert queue.fetch([spec.group]).count() == 0


def test_every_detector_module_has_a_contract_spec():
    """The discipline can't be bypassed: any streaming module that
    exposes a *_alerts_to_queue wiring (the detector family's
    signature) must have a spec in _SPEC_BUILDERS, so the contract
    runs against it. An 8th detector that forgets its spec fails HERE,
    not in a code review."""
    import importlib
    import pkgutil

    import dawis_spark.streaming as pkg

    detector_modules = set()
    for info in pkgutil.iter_modules(pkg.__path__):
        mod = importlib.import_module(f"dawis_spark.streaming.{info.name}")
        if any(n.endswith("_alerts_to_queue") for n in dir(mod)):
            detector_modules.add(info.name)
    # resolve each spec to its detector module via the
    # *_alerts_to_queue function its to_queue lambda closes over
    # (the lambdas themselves live in THIS test module)
    wired = set()
    for build in _SPEC_BUILDERS.values():
        spec = build()
        fn = spec.to_queue
        # the lambda closes over the detector's *_alerts_to_queue
        wired |= {
            c.cell_contents.__module__.rsplit(".", 1)[-1]
            for c in (fn.__closure__ or [])
            if callable(getattr(c, "cell_contents", None))
            and getattr(c.cell_contents, "__name__", "").endswith(
                "_alerts_to_queue"
            )
        }
    missing = detector_modules - wired - {"whales"}  # whale alerts predate
    # the detector family's rollup-series state contract (hot-key TTL
    # windows, not closed-form replay) and keep their own test file
    assert not missing, (
        f"streaming detectors without a contract spec: {sorted(missing)}"
    )
