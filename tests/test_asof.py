"""operators/asof.py: as-of join semantics and plan shape."""

import datetime as dt

from pyspark.sql import functions as F

from dawis_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T10:00")),   # after two quotes
         (2, 10, _ts("2024-01-01T08:00")),   # before any quote
         (3, 11, _ts("2024-01-01T09:30")),   # exactly at a quote ts
         (4, 99, _ts("2024-01-01T12:00"))],  # key with no right rows
        "trade_id bigint, sym bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 10, _ts("2024-01-01T09:00"), 1.0),
         (101, 10, _ts("2024-01-01T09:45"), 2.0),
         (102, 11, _ts("2024-01-01T09:30"), 3.0),
         (103, 11, _ts("2024-01-01T09:30"), 4.0)],  # tie: higher id wins
        "quote_id bigint, sym bigint, ts timestamp, px double",
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = _frames(spark)
    out = {
        r["trade_id"]: (r["quote_id"], r["px"])
        for r in asof_join(
            left, right, keys=["sym"], time_col="ts",
            payload_cols=["quote_id", "px"], right_order="quote_id",
        ).collect()
    }
    assert out[1] == (101, 2.0)      # latest quote <= trade ts
    assert out[2] == (None, None)    # nothing before -> left-join nulls
    assert out[3] == (103, 4.0)      # inclusive at equal ts; max id tie-break
    assert out[4] == (None, None)    # unseen key survives


def test_asof_join_exposes_right_time_and_row_count(spark):
    left, right = _frames(spark)
    rows = asof_join(
        left, right, keys=["sym"], time_col="ts",
        payload_cols=["px"], right_order="quote_id", right_time_as="quote_ts",
    ).collect()
    assert len(rows) == 4            # exactly one output row per left row
    by_id = {r["trade_id"]: r for r in rows}
    assert by_id[1]["quote_ts"] == _ts("2024-01-01T09:45")


def test_asof_join_plan_has_no_join_node(spark):
    left, right = _frames(spark)
    plan = asof_join(
        left, right, keys=["sym"], time_col="ts", payload_cols=["px"],
    )._jdf.queryExecution().executedPlan().toString()
    # the whole operator is union + window: any Join node would mean the
    # quadratic backward-range formulation sneaked back in
    assert "Join" not in plan
    assert "Window" in plan
