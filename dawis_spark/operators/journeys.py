"""User-journey analytics — multi-touch attribution and sequence mining.

The reference's web-analytics domain (GA behavior flow, conversion
reporting — reference google_analytics.py's segment/goal queries) stops at
last-click attribution (asof_last_click) and single-step transitions
(event_transitions). This module adds the two standard next steps a
marketing warehouse ships:

  - POSITION-BASED (U-shaped) multi-touch attribution: each conversion's
    value is split 40% / 20% / 40% across the first / middle / last
    touches of the journey that led to it (n=1 -> 100%, n=2 -> 50/50).
  - FREQUENT EVENT SEQUENCES: support counts of length-3 event-type
    paths (the PrefixSpan k=3 slice that answers "what do users do right
    before X" without the exponential general miner).

Exactness discipline (shared with operators/sketches.py): conversion
values become integer cents, positional weights are integer ppm with the
flooring remainder assigned to the FIRST touch, so every credit is an
exact BIGINT micro-unit (cents x ppm) and the only float op is the final
display division — Spark and DuckDB agree to the bit.

Scale shape: one events-sized exchange hashed on user_id computes the
journey index (a running purchase count); touch positions reuse the same
(user, journey) partitioning; the purchase<->touch join is co-keyed on
(user_id, journey) so AQE plans it as a co-partitioned join, and the
output aggregate is event-type-cardinality-sized. Sequence mining is the
same single user-window plus a |types|^3-key aggregate — both plans carry
only (user, type, ts, id, value), never payloads, and nothing is
driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# composite journey key = user_id * JOURNEY_STRIDE + journey; journeys per
# user are purchase counts (~13 at sf0.01, ~130 at sf1) — the stride holds
# through every rehearsal scale with 3 decades of headroom.
JOURNEY_STRIDE = 1_000_000


def with_journey_index(events: DataFrame, conversion_type: str) -> DataFrame:
    """Events + ``journey`` = number of conversions strictly before the
    row in the user's (ts, event_id) order — so each journey's rows are
    its touches followed by the conversion that closes it."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_conv = (F.col("event_type") == conversion_type).cast("int")
    return events.select(
        "user_id", "event_type", "ts", "event_id", "value"
    ).withColumn("journey", F.coalesce(F.sum(is_conv).over(w), F.lit(0)))


def position_attribution(
    events: DataFrame, conversion_type: str = "purchase"
) -> DataFrame:
    """U-shaped credit per touch event_type: (touch_type, touches,
    journeys, credit) with credit exact to the cent-ppm.

    Weights in ppm: n=1 -> 1e6; n=2 -> 5e5 each; n>=3 -> 4e5 ends,
    floor(2e5/(n-2)) middles, flooring remainder added to the first
    touch so each journey's weights sum to exactly 1e6.
    """
    e = with_journey_index(events, conversion_type)
    conv = e.filter(F.col("event_type") == conversion_type).select(
        "user_id",
        "journey",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v_cents"),
    )
    wj = Window.partitionBy("user_id", "journey").orderBy("ts", "event_id")
    touches = (
        e.filter(F.col("event_type") != conversion_type)
        .withColumn("pos", F.row_number().over(wj))
        .withColumn(
            "n", F.count("*").over(Window.partitionBy("user_id", "journey"))
        )
    )
    mid = "(200000 div (n - 2))"
    w_ppm = F.expr(
        f"""CASE WHEN n = 1 THEN 1000000
                 WHEN n = 2 THEN 500000
                 WHEN pos = 1 THEN 400000 + (200000 - {mid} * (n - 2))
                 WHEN pos = n THEN 400000
                 ELSE {mid} END"""
    ).cast("bigint")
    credited = touches.join(conv, ["user_id", "journey"]).select(
        F.col("event_type").alias("touch_type"),
        (F.col("user_id") * JOURNEY_STRIDE + F.col("journey")).alias("jkey"),
        (F.col("v_cents") * w_ppm).alias("credit_micro"),
    )
    return credited.groupBy("touch_type").agg(
        F.count("*").cast("bigint").alias("touches"),
        F.countDistinct("jkey").cast("bigint").alias("journeys"),
        F.round(F.sum("credit_micro") / F.lit(100_000_000.0), 2).alias(
            "credit"
        ),
    )


def attribution_oracle_sql(conversion_type: str = "purchase") -> str:
    """DuckDB replay of ``position_attribution`` on the events view."""
    return f"""
WITH e AS (
  SELECT user_id, event_type, ts, event_id, value,
         COALESCE(SUM(CASE WHEN event_type = '{conversion_type}' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS journey
  FROM events),
conv AS (
  SELECT user_id, journey, CAST(ROUND(value * 100, 0) AS BIGINT) AS v_cents
  FROM e WHERE event_type = '{conversion_type}'),
t AS (
  SELECT user_id, journey, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, journey ORDER BY ts, event_id) AS pos,
         COUNT(*) OVER (PARTITION BY user_id, journey) AS n
  FROM e WHERE event_type <> '{conversion_type}'),
c AS (
  SELECT t.event_type AS touch_type,
         t.user_id * {JOURNEY_STRIDE} + t.journey AS jkey,
         conv.v_cents * (CASE
           WHEN t.n = 1 THEN 1000000
           WHEN t.n = 2 THEN 500000
           WHEN t.pos = 1 THEN 400000 + (200000 - (200000 // (t.n - 2)) * (t.n - 2))
           WHEN t.pos = t.n THEN 400000
           ELSE 200000 // (t.n - 2) END) AS credit_micro
  FROM t JOIN conv ON t.user_id = conv.user_id AND t.journey = conv.journey)
SELECT touch_type,
       CAST(COUNT(*) AS BIGINT) AS touches,
       CAST(COUNT(DISTINCT jkey) AS BIGINT) AS journeys,
       ROUND(SUM(credit_micro) / 100000000.0, 2) AS credit
FROM c GROUP BY touch_type
"""


def frequent_sequences(
    events: DataFrame, length: int = 3, top: int = 25
) -> DataFrame:
    """Support counts of length-``length`` consecutive event-type paths
    per user: (seq, support, share) for the ``top`` most frequent, with
    share = support / total paths rounded to 6 (a ratio of two exact
    BIGINTs — one ordered division, ulp-stable)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = events.select("user_id", "event_type", "ts", "event_id")
    steps = [F.col("event_type")] + [
        F.lead("event_type", i).over(w) for i in range(1, length)
    ]
    paths = e.select(
        F.concat_ws(">", *steps).alias("seq"),
        steps[-1].isNotNull().alias("complete"),
    ).filter("complete")
    total = Window.partitionBy()
    counted = paths.groupBy("seq").agg(
        F.count("*").cast("bigint").alias("support")
    )
    return (
        counted.withColumn(
            "share", F.round(F.col("support") / F.sum("support").over(total), 6)
        )
        .orderBy(F.desc("support"), "seq")
        .limit(top)
    )


def sequences_oracle_sql(
    length: int = 3, top: int = 25, source: str = "events", prelude: str = ""
) -> str:
    """DuckDB replay of ``frequent_sequences``. ``source``/``prelude``
    let callers point the path mining at a guarded relation (e.g. the
    whale-filtered ``kept_events`` CTE — see queries._WG_CTES)."""
    leads = ", ".join(
        f"lead(event_type, {i}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e{i}"
        for i in range(1, length)
    )
    concat = " || '>' || ".join(["event_type"] + [f"e{i}" for i in range(1, length)])
    last = f"e{length - 1}"
    pre = f"{prelude},\n" if prelude else ""
    return f"""
WITH {pre}p AS (
  SELECT event_type, {leads} FROM {source}),
paths AS (
  SELECT {concat} AS seq FROM p WHERE {last} IS NOT NULL),
counted AS (
  SELECT seq, CAST(COUNT(*) AS BIGINT) AS support FROM paths GROUP BY seq)
SELECT seq, support,
       ROUND(CAST(support AS DOUBLE) / SUM(support) OVER (), 6) AS share
FROM counted ORDER BY support DESC, seq LIMIT {top}
"""


# --- whale guard ---------------------------------------------------------
#
# Skew protection for the per-key sequence windows above (and
# event_transitions / session_entry_exit_bounce / markov in queries.py).
# Every journey query sorts events inside Window.partitionBy(user_id) —
# correct and parallel until one key holds a macroscopic share of the
# corpus (a bot, a null-bucket id, a logged-out sentinel): that key's
# partition becomes ONE task sorting a data-sized slice, the failure mode
# SCALE.md's zipf rehearsal stresses. The guard is the standard
# pre-aggregation fix: per-key counts (one map-side-partial aggregate
# whose exchange carries (key, count), never events), a threshold-bounded
# whale key set (at most den/num keys can each exceed a num/den share, so
# it BROADCASTS), and a map-side flag join. The share test is EXACT
# integer arithmetic — count * den > total * num — no float boundary
# ambiguity between engines.


def whale_counts(
    df: DataFrame, key_cols: list[str], count_col: str = "n_events"
) -> DataFrame:
    """Per-key event counts plus the corpus total on every row (the
    total rides along as a broadcast 1-row aggregate, so share tests
    stay a map-side comparison)."""
    counts = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias(count_col)
    )
    total = counts.agg(F.sum(count_col).cast("bigint").alias("__wg_total"))
    return counts.crossJoin(F.broadcast(total))


def whale_keys(
    df: DataFrame,
    key_cols: list[str],
    max_events: int | None = None,
    max_share: tuple[int, int] | None = None,
    count_col: str = "n_events",
) -> DataFrame:
    """The keys above threshold: count > max_events, or (with
    ``max_share = (num, den)``) count * den > total * num — exact
    integer share test. At least one threshold is required; with both,
    a key is a whale if it crosses EITHER."""
    if max_events is None and max_share is None:
        raise ValueError("whale_keys needs max_events and/or max_share")
    wc = whale_counts(df, key_cols, count_col)
    cond = F.lit(False)
    if max_events is not None:
        cond = cond | (F.col(count_col) > F.lit(int(max_events)))
    if max_share is not None:
        num, den = max_share
        cond = cond | (
            F.col(count_col) * F.lit(int(den)) > F.col("__wg_total") * F.lit(int(num))
        )
    return wc.filter(cond).select(*key_cols, count_col)


def whale_guard(
    df: DataFrame,
    key_cols: list[str],
    max_events: int | None = None,
    max_share: tuple[int, int] | None = None,
    flag_col: str = "is_whale",
    whales: DataFrame | None = None,
) -> DataFrame:
    """``df`` plus a boolean ``flag_col``: True iff the row's key is a
    whale. The whale set is threshold-bounded (share thresholds cap it
    at den/num keys; absolute thresholds rely on the same heavy-hitter
    scarcity), so it broadcasts — the guard adds NO data-sized shuffle;
    sequence windows downstream filter or reroute on the flag BEFORE
    partitioning by key (see queries.whale_guarded_transitions).

    Pass a precomputed (ideally persisted) ``whales`` relation to share
    one counting scan between the guard and its audit aggregate (the
    queries._guarded_events pattern — at 100 TB the per-key count scan
    should run once, not once per consumer)."""
    if whales is None:
        whales = whale_keys(df, key_cols, max_events, max_share)
    whales = whales.select(*key_cols, F.lit(True).alias("__wg_hit"))
    return (
        df.join(F.broadcast(whales), key_cols, "left")
        .withColumn(flag_col, F.coalesce(F.col("__wg_hit"), F.lit(False)))
        .drop("__wg_hit")
    )


def linear_attribution(
    events: DataFrame, conversion_type: str = "purchase"
) -> DataFrame:
    """EVEN-SPLIT multi-touch attribution: each conversion's value is
    divided equally across every touch of its journey (the 'linear'
    model in GA/attribution reporting — the maximum-entropy baseline
    the position/time-decay/Shapley models are judged against).

    Exactness: weights are integer ppm = 1e6 div n with the flooring
    remainder pinned to the FIRST touch (so each journey's weights sum
    to exactly 1e6); credits are exact BIGINT cent-ppm micro-units.
    Scale shape: identical to position_attribution — one user-hashed
    journey-index exchange, co-keyed touch<->conversion join,
    event-type-sized output."""
    e = with_journey_index(events, conversion_type)
    conv = e.filter(F.col("event_type") == conversion_type).select(
        "user_id",
        "journey",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v_cents"),
    )
    wj = Window.partitionBy("user_id", "journey").orderBy("ts", "event_id")
    touches = (
        e.filter(F.col("event_type") != conversion_type)
        .withColumn("pos", F.row_number().over(wj))
        .withColumn(
            "n", F.count("*").over(Window.partitionBy("user_id", "journey"))
        )
    )
    w_ppm = F.expr(
        """CASE WHEN pos = 1
                THEN 1000000 - (1000000 div n) * (n - 1)
                ELSE 1000000 div n END"""
    ).cast("bigint")
    credited = touches.join(conv, ["user_id", "journey"]).select(
        F.col("event_type").alias("touch_type"),
        (F.col("user_id") * JOURNEY_STRIDE + F.col("journey")).alias("jkey"),
        (F.col("v_cents") * w_ppm).alias("credit_micro"),
    )
    return credited.groupBy("touch_type").agg(
        F.count("*").cast("bigint").alias("touches"),
        F.countDistinct("jkey").cast("bigint").alias("journeys"),
        F.round(F.sum("credit_micro") / F.lit(100_000_000.0), 2).alias(
            "credit"
        ),
    )


def linear_attribution_oracle_sql(conversion_type: str = "purchase") -> str:
    """DuckDB replay of ``linear_attribution`` on the events view."""
    return f"""
WITH e AS (
  SELECT user_id, event_type, ts, event_id, value,
         COALESCE(SUM(CASE WHEN event_type = '{conversion_type}' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS journey
  FROM events),
conv AS (
  SELECT user_id, journey, CAST(ROUND(value * 100, 0) AS BIGINT) AS v_cents
  FROM e WHERE event_type = '{conversion_type}'),
t AS (
  SELECT user_id, journey, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, journey ORDER BY ts, event_id) AS pos,
         COUNT(*) OVER (PARTITION BY user_id, journey) AS n
  FROM e WHERE event_type <> '{conversion_type}'),
c AS (
  SELECT t.event_type AS touch_type,
         t.user_id * {JOURNEY_STRIDE} + t.journey AS jkey,
         conv.v_cents * (CASE WHEN t.pos = 1
                              THEN 1000000 - (1000000 // t.n) * (t.n - 1)
                              ELSE 1000000 // t.n END) AS credit_micro
  FROM t JOIN conv ON t.user_id = conv.user_id AND t.journey = conv.journey)
SELECT touch_type,
       CAST(COUNT(*) AS BIGINT) AS touches,
       CAST(COUNT(DISTINCT jkey) AS BIGINT) AS journeys,
       ROUND(SUM(credit_micro) / 100000000.0, 2) AS credit
FROM c GROUP BY touch_type
"""


# time-decay attribution: DISCRETE half-life decay — a touch's raw
# weight halves for every full half-life period between it and the
# conversion (w = 1e6 >> (days_before // half_life)). The discrete form
# keeps every weight an exact integer (continuous 2^(-dt/hl) would pay
# an engine-specific pow ulp exactly where a round() boundary can flip);
# the per-journey normalization is ONE exact integer floor-division per
# touch (sub-cent remainders are dropped, documented).
DECAY_CAP_PERIODS = 30  # 1 << 30 fits int32; weights are 0 past period 20


def time_decay_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    half_life_days: int = 7,
) -> DataFrame:
    """Time-decay multi-touch attribution: touches closer to the
    conversion earn exponentially more credit (discrete ``half_life_days``
    halving). Output (touch_type, touches, journeys, credit)."""
    e = with_journey_index(events, conversion_type)
    conv = e.filter(F.col("event_type") == conversion_type).select(
        "user_id",
        "journey",
        F.col("ts").alias("conv_ts"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v_cents"),
    )
    touches = e.filter(F.col("event_type") != conversion_type).select(
        "user_id", "journey", "event_type", "ts"
    )
    joined = touches.join(conv, ["user_id", "journey"]).withColumn(
        "w_raw",
        F.expr(
            f"""1000000 div shiftleft(1, cast(least(greatest(
                datediff(conv_ts, ts), 0) div {half_life_days},
                {DECAY_CAP_PERIODS}) as int))"""
        ).cast("bigint"),
    )
    tot = Window.partitionBy("user_id", "journey")
    credited = joined.withColumn(
        "tot_raw", F.sum("w_raw").over(tot)
    ).select(
        F.col("event_type").alias("touch_type"),
        (F.col("user_id") * JOURNEY_STRIDE + F.col("journey")).alias("jkey"),
        F.expr(
            "CASE WHEN tot_raw > 0"
            "     THEN (v_cents * w_raw) div tot_raw ELSE 0 END"
        ).cast("bigint").alias("credit_cents"),
    )
    return credited.groupBy("touch_type").agg(
        F.count("*").cast("bigint").alias("touches"),
        F.countDistinct("jkey").cast("bigint").alias("journeys"),
        F.round(F.sum("credit_cents") / F.lit(100.0), 2).alias("credit"),
    )


def time_decay_oracle_sql(
    conversion_type: str = "purchase", half_life_days: int = 7
) -> str:
    """DuckDB replay of ``time_decay_attribution`` on the events view."""
    return f"""
WITH e AS (
  SELECT user_id, event_type, ts, event_id, value,
         COALESCE(SUM(CASE WHEN event_type = '{conversion_type}' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS journey
  FROM events),
conv AS (
  SELECT user_id, journey, ts AS conv_ts,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS v_cents
  FROM e WHERE event_type = '{conversion_type}'),
t AS (
  SELECT user_id, journey, event_type, ts
  FROM e WHERE event_type <> '{conversion_type}'),
j AS (
  SELECT t.user_id, t.journey, t.event_type, conv.v_cents,
         1000000 // (1 << CAST(LEAST(GREATEST(
           date_diff('day', CAST(t.ts AS DATE), CAST(conv.conv_ts AS DATE)), 0)
           // {half_life_days}, {DECAY_CAP_PERIODS}) AS INT)) AS w_raw
  FROM t JOIN conv ON t.user_id = conv.user_id AND t.journey = conv.journey),
c AS (
  SELECT event_type AS touch_type,
         user_id * {JOURNEY_STRIDE} + journey AS jkey,
         CASE WHEN SUM(w_raw) OVER (PARTITION BY user_id, journey) > 0
              THEN (v_cents * w_raw)
                   // SUM(w_raw) OVER (PARTITION BY user_id, journey)
              ELSE 0 END AS credit_cents
  FROM j)
SELECT touch_type,
       CAST(COUNT(*) AS BIGINT) AS touches,
       CAST(COUNT(DISTINCT jkey) AS BIGINT) AS journeys,
       ROUND(SUM(credit_cents) / 100.0, 2) AS credit
FROM c GROUP BY touch_type
"""
