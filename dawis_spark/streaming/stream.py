"""Structured Streaming wrapper — availableNow micro-batches over staging.

Reference triggering (SURVEY §2.9): Celery beat cron fires each module; new
staged documents accumulate between runs. The Spark-native equivalent is a
file-source stream over the staging directory with
``trigger(availableNow=True)``: each scheduled invocation drains exactly
the files that arrived since the last checkpoint, then stops — cron
cadence, streaming bookkeeping (no hand-rolled watermark).

Late data: the reference pulls ``dateDaysAgo`` behind realtime
(google_search_console.py:67); in the streaming shape that's a watermark on
the event-time column (``withWatermark``), used by windowed aggs below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def staging_stream(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """readStream over a staging directory (schema must be explicit —
    streaming file sources don't infer)."""
    return spark.readStream.schema(schema).parquet(path)


def run_available_now(
    stream_df: DataFrame,
    sink_path: str,
    checkpoint: str,
    transform=None,
) -> None:
    """Drain everything currently available through ``transform`` into a
    parquet sink, then stop (one cron tick's micro-batch)."""
    out = transform(stream_df) if transform else stream_df
    q = (
        out.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_foreach_batch(
    stream_df: DataFrame,
    checkpoint: str,
    batch_fn,
    transform=None,
) -> None:
    """availableNow drain where each micro-batch lands through
    ``batch_fn(batch_df, batch_id)`` — the exactly-once recipe for sinks
    with no native streaming support (warehouse merges, JDBC, rollup
    maintenance): the checkpoint commits batch ids, so a crashed run
    redelivers the SAME batch with the SAME id and at-least-once becomes
    exactly-once when ``batch_fn`` is idempotent per id (idempotent
    append on the slice keys, or a re-aggregatable merge guarded by a
    ProcessedLog). This is how update_rollup attaches to a stream: one
    maintenance tick per micro-batch.
    """
    out = transform(stream_df) if transform else stream_df
    q = (
        out.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_counts(
    stream_df: DataFrame,
    time_col: str,
    window: str = "1 hour",
    watermark: str = "1 day",
    keys: list[str] | None = None,
) -> DataFrame:
    """Watermarked tumbling-window aggregate — the streaming twin of the
    batch ``tumbling_window_agg`` inventory query (same plan shape)."""
    keys = keys or []
    return (
        stream_df.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), *keys, "n")
    )


def session_counts(
    stream_df: DataFrame,
    time_col: str,
    gap: str = "30 minutes",
    watermark: str = "1 day",
    keys: list[str] | None = None,
) -> DataFrame:
    """Watermarked SESSION-window aggregate (``F.session_window``): a
    session closes after ``gap`` of inactivity per key — the streaming
    twin of the batch ``sessionization`` inventory query, but computed by
    the engine's native session-window state instead of a lag/cumsum
    window. Emits one row per closed session with its bounds and event
    count once the watermark passes the session end.

    Scale: state is per (key, open session) and merges on arrival;
    late events inside the watermark extend or merge sessions, later
    ones are dropped — the documented semantics a 100 TB clickstream
    rollup needs."""
    keys = keys or []
    return (
        stream_df.withWatermark(time_col, watermark)
        .groupBy(F.session_window(F.col(time_col), gap).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *keys,
            "n",
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    within: str = "1 hour",
    watermark: str = "1 day",
) -> DataFrame:
    """Watermarked STREAM-STREAM interval join: each left event pairs
    with the right events of the same ``key`` whose time falls in
    [left_time, left_time + within] — the streaming twin of the batch
    bin-bucketed range join (events_following_1h / operators/rangejoin).

    The time-range predicate in the join condition is what makes the
    state BOUNDED: with both sides watermarked, Spark derives how long a
    buffered row can still find a partner (watermark + within) and
    purges beyond it — the textbook ad-click/impression attribution
    join. Without the range bound the state would grow forever; this
    wrapper makes the bound part of the operator's signature.

    Columns: key, left ``l_`` columns, right ``r_`` columns (prefixed by
    the caller via select), left_time/right_time preserved.
    """
    lw = left.withWatermark(left_time, watermark)
    rw = right.withWatermark(right_time, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_time] >= lw[left_time])
        & (rw[right_time] <= lw[left_time] + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond).drop(rw[key])
