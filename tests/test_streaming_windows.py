"""Watermark LATENESS semantics for the streaming windowed aggs — the
equivalence discipline the anomaly/IVM families already have, applied to
withWatermark (VERDICT r7 ask #6): feed genuinely late events across
ticks and assert drop/keep against the batch analog.

Semantics pinned (Structured Streaming append mode): a late row is KEPT
while its window's end is still ahead of the watermark (it lands in the
open window and flushes with it), and DROPPED once the watermark has
passed its window end — the emitted count must NOT include it, and the
final sink must equal the batch aggregation over exactly the admitted
rows."""

import datetime as dt

from pyspark.sql import functions as F

from dawis_spark.streaming.stream import (
    run_available_now,
    staging_stream,
    windowed_counts,
)


def test_watermark_keeps_inside_late_and_drops_behind_late(spark, tmp_path):
    staging = str(tmp_path / "staging")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    schema = "id bigint, ts timestamp"
    h = dt.datetime(2026, 5, 1, 10, 0)

    def mins(m):
        return h + dt.timedelta(minutes=m)

    transform = lambda s: windowed_counts(s, "ts", "1 hour", "1 hour")  # noqa: E731

    # tick 1: two events in the 10:00 window + one at 12:30 that pushes
    # the post-tick watermark to 11:30
    tick1 = spark.createDataFrame(
        [(1, mins(0)), (2, mins(40)), (3, mins(150))], schema
    )
    tick1.write.parquet(staging)
    run_available_now(
        staging_stream(spark, staging, tick1.schema), sink, ckpt, transform
    )
    emitted1 = {
        r["window_start"]: r["n"] for r in spark.read.parquet(sink).collect()
    }
    # the availableNow drain finishes with a no-data finalize batch that
    # advances the watermark to 11:30 — so the 10:00 window already
    # closes and flushes within tick 1 (cf. noDataMicroBatches)
    assert emitted1 == {h: 2}

    # tick 2: one late event INSIDE the watermark (11:45 — its window
    # [11:00, 12:00) is still open at watermark 11:30 -> KEPT) and one
    # BEHIND it (10:50 — its window [10:00, 11:00) already flushed at
    # watermark 11:30 -> DROPPED, never double-emitted)
    tick2 = spark.createDataFrame([(4, mins(105)), (5, mins(50))], schema)
    tick2.write.mode("append").parquet(staging)
    run_available_now(
        staging_stream(spark, staging, tick1.schema), sink, ckpt, transform
    )
    emitted2 = {
        r["window_start"]: r["n"] for r in spark.read.parquet(sink).collect()
    }
    # nothing new closes (watermark still 11:30), and the dropped late
    # row must not have re-opened or re-emitted the 10:00 window
    assert emitted2 == {h: 2}

    # tick 3: an event at 14:00 advances the watermark to 13:00, closing
    # the 11:00 window (carrying the admitted late row) and the 12:00 one
    tick3 = spark.createDataFrame([(6, mins(240))], schema)
    tick3.write.mode("append").parquet(staging)
    run_available_now(
        staging_stream(spark, staging, tick1.schema), sink, ckpt, transform
    )
    emitted3 = {
        r["window_start"]: r["n"] for r in spark.read.parquet(sink).collect()
    }
    assert emitted3 == {h: 2, mins(60): 1, mins(120): 1}

    # batch equivalence: the closed-window contents equal the batch
    # tumbling aggregation over exactly the ADMITTED rows (everything
    # ever staged minus the one dropped-behind-watermark event), for
    # windows the final watermark (13:00) has passed
    admitted = spark.read.parquet(staging).filter(F.col("id") != 5)
    batch = {
        r["window_start"]: r["n"]
        for r in (
            admitted.groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("window_start"), "n")
            .filter(F.col("w.end") <= mins(180))
            .collect()
        )
    }
    assert emitted3 == batch


def test_stream_cusum_matches_batch_closed_form(spark, tmp_path):
    """Two ticks: a flat baseline then a sustained shift. The final
    tick's emitted rows must equal the integer closed form over the
    retained history (the module family's batch-equivalence contract),
    and the shift must breach."""
    from pyspark.sql import types as T

    from dawis_spark.streaming.cusum import cusum_closed_form, stream_cusum
    from dawis_spark.streaming.stream import staging_stream

    staging = str(tmp_path / "staging")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType(
        [
            T.StructField("series", T.StringType()),
            T.StructField("bucket", T.LongType()),
            T.StructField("cents", T.LongType()),
        ]
    )

    def tick(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(staging)
        q = (
            stream_cusum(
                staging_stream(spark, staging, schema), "series", "bucket", "cents"
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    t1 = [("m", b, 100) for b in range(10)]
    t2 = [("m", 10 + i, 1000) for i in range(5)]  # sustained upward shift
    tick(t1)
    tick(t2)

    out = {
        r["bucket"]: r for r in spark.read.parquet(sink).where("bucket >= 10").collect()
    }
    series = [(b, 100) for b in range(10)] + [(10 + i, 1000) for i in range(5)]
    want = {b: (s, fl) for b, s, fl in cusum_closed_form(series)}
    for b in range(10, 15):
        assert out[b]["cusum_scaled"] == want[b][0], b
        assert out[b]["breached"] == want[b][1], b
    assert out[14]["breached"]  # the shift accumulates past h


def test_stream_cusum_redelivery_replaces(spark, tmp_path):
    from pyspark.sql import types as T

    from dawis_spark.streaming.cusum import cusum_closed_form, stream_cusum
    from dawis_spark.streaming.stream import staging_stream

    staging = str(tmp_path / "staging")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType(
        [
            T.StructField("series", T.StringType()),
            T.StructField("bucket", T.LongType()),
            T.StructField("cents", T.LongType()),
        ]
    )

    def tick(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(staging)
        q = (
            stream_cusum(
                staging_stream(spark, staging, schema), "series", "bucket", "cents"
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    tick([("m", b, 100) for b in range(5)])
    tick([("m", 4, 900)])  # redelivery of bucket 4 with a corrected value

    last = [
        r
        for r in spark.read.parquet(sink).collect()
        if r["bucket"] == 4
    ]
    # two emissions of bucket 4 (one per tick); the LATEST reflects the
    # replaced value against the replaced history
    series = [(b, 100) for b in range(4)] + [(4, 900)]
    want = {b: (s, fl) for b, s, fl in cusum_closed_form(series)}
    assert any(r["cusum_scaled"] == want[4][0] for r in last)


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked click->purchase attribution join over two file
    streams equals the batch join on the same closed input, and the
    plan carries the bounded-state time-range condition."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from dawis_spark.streaming.stream import interval_join, staging_stream

    clicks_dir = str(tmp_path / "clicks")
    buys_dir = str(tmp_path / "buys")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    cs = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("c_ts", T.TimestampType()),
         T.StructField("click_id", T.LongType())]
    )
    bs = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("b_ts", T.TimestampType()),
         T.StructField("buy_id", T.LongType())]
    )
    clicks = [
        (1, "2024-01-01 10:00:00", 100),
        (1, "2024-01-01 12:00:00", 101),
        (2, "2024-01-01 10:00:00", 102),
    ]
    buys = [
        (1, "2024-01-01 10:30:00", 900),  # within 1h of click 100
        (1, "2024-01-01 13:30:00", 901),  # within nothing (1.5h after 101)
        (2, "2024-01-01 10:59:00", 902),  # within 1h of click 102
    ]
    cdf = spark.createDataFrame(
        [(u, t, i) for u, t, i in clicks], "user_id bigint, c_ts string, click_id bigint"
    ).withColumn("c_ts", F.to_timestamp("c_ts"))
    bdf = spark.createDataFrame(
        [(u, t, i) for u, t, i in buys], "user_id bigint, b_ts string, buy_id bigint"
    ).withColumn("b_ts", F.to_timestamp("b_ts"))
    cdf.write.mode("append").parquet(clicks_dir)
    bdf.write.mode("append").parquet(buys_dir)

    joined = interval_join(
        staging_stream(spark, clicks_dir, cs),
        staging_stream(spark, buys_dir, bs),
        "user_id", "c_ts", "b_ts", within="1 hour",
    ).select("user_id", "click_id", "buy_id")
    q = (
        joined.writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = sorted(
        (r["click_id"], r["buy_id"]) for r in spark.read.parquet(sink).collect()
    )
    want = sorted(
        (r["click_id"], r["buy_id"])
        for r in cdf.join(
            bdf,
            (cdf.user_id == bdf.user_id)
            & (bdf.b_ts >= cdf.c_ts)
            & (bdf.b_ts <= cdf.c_ts + F.expr("INTERVAL 1 hour")),
        ).collect()
    )
    assert got == want == [(100, 900), (102, 902)]


def test_stream_holt_matches_batch_fit(spark, tmp_path):
    """Two ticks of daily rollups; the final tick's emitted forecasts
    must equal holt_fit over the full retained history (batch
    equivalence via the shared fold), and a same-bucket redelivery in
    tick 2 must REPLACE tick 1's value, not duplicate it."""
    from pyspark.sql import types as T

    from dawis_spark.operators.forecast import holt_fit
    from dawis_spark.streaming.holt import stream_holt
    from dawis_spark.streaming.stream import staging_stream

    staging = str(tmp_path / "staging")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType(
        [
            T.StructField("series", T.StringType()),
            T.StructField("bucket", T.LongType()),
            T.StructField("cents", T.LongType()),
        ]
    )

    def tick(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(staging)
        q = (
            stream_holt(
                staging_stream(spark, staging, schema),
                "series",
                "bucket",
                "cents",
                horizon=3,
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    t1 = [("m", b, 100 + 10 * b) for b in range(6)]  # ramp
    # tick 2: new days 6..8 plus a REDELIVERY of bucket 5 with a new value
    t2 = [("m", 6, 400), ("m", 7, 420), ("m", 8, 440), ("m", 5, 200)]
    tick(t1)
    tick(t2)

    out = [r for r in spark.read.parquet(sink).where("bucket = 8").collect()]
    assert len(out) == 3
    vals = [100 + 10 * b for b in range(5)] + [200, 400, 420, 440]
    lvl, tr = holt_fit(vals)
    got = {r["h"]: r for r in out}
    for h in (1, 2, 3):
        assert got[h]["forecast"] == lvl + h * tr
        assert got[h]["level"] == lvl and got[h]["trend"] == tr
        assert got[h]["n_points"] == len(vals)
