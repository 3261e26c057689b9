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
