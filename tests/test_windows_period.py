"""Window operators (W1/W2/W4) and the previous-period join (J1),
incl. the month-boundary case SURVEY §7.5 flags."""

import datetime as dt

from pyspark.sql import functions as F

from dawis_spark.operators.period import previous_period_join
from dawis_spark.operators.windows import (
    change_detection,
    latest_per_key,
    top_k_per_group,
)


def test_latest_per_key_tiebreak(spark):
    df = spark.createDataFrame(
        [("u", 1, "a"), ("u", 2, "b"), ("u", 2, "c")], "k string, t int, v string"
    )
    out = latest_per_key(df, ["k"], [F.desc("t"), F.desc("v")]).collect()
    assert len(out) == 1 and out[0]["v"] == "c"


def test_change_detection_emits_prev_as_diff(spark):
    df = spark.createDataFrame(
        [("u", 1, "t1"), ("u", 2, "t1"), ("u", 3, "t2")], "k string, t int, v string"
    )
    out = change_detection(df, ["k"], [F.asc("t")], "v").collect()
    assert len(out) == 1
    assert out[0]["v"] == "t2" and out[0]["diff"] == "t1"


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("g", i, float(i)) for i in range(5)], "g string, id int, v double"
    )
    out = top_k_per_group(df, ["g"], [F.desc("v"), F.asc("id")], 2).collect()
    assert sorted(r["id"] for r in out) == [3, 4]


def _daily(spark, rows):
    return spark.createDataFrame(rows, "k string, day date, total double")


def test_prev_day_join(spark):
    df = _daily(
        spark,
        [
            ("a", dt.date(2024, 3, 1), 10.0),
            ("a", dt.date(2024, 3, 2), 20.0),
            ("b", dt.date(2024, 3, 2), 5.0),
        ],
    )
    out = {
        (r["k"], r["day"]): r["totalPreviousDay"]
        for r in previous_period_join(df, ["k"], "day", ["total"], "Day").collect()
    }
    assert out[("a", dt.date(2024, 3, 2))] == 10.0
    assert out[("a", dt.date(2024, 3, 1))] is None  # no earlier period
    assert out[("b", dt.date(2024, 3, 2))] is None  # key absent previously


def test_prev_month_calendar_boundary(spark):
    # Mar 31 -> Feb 29 (2024 leap): add_months clamps like the reference's
    # monthrange logic (google_search_console.py:214-238)
    df = _daily(
        spark,
        [
            ("a", dt.date(2024, 2, 29), 7.0),
            ("a", dt.date(2024, 3, 31), 9.0),
        ],
    )
    out = {
        r["day"]: r["totalPreviousMonth"]
        for r in previous_period_join(df, ["k"], "day", ["total"], "Month").collect()
    }
    assert out[dt.date(2024, 3, 31)] == 7.0
