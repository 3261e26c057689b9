"""Bin-bucketed time-range join: correctness + no-nested-loop plan."""

from datetime import datetime

from dawis_spark.operators.rangejoin import following_count, following_range_join


def _events(spark):
    rows = [
        (1, "u1", datetime(2026, 1, 1, 10, 0, 0)),
        (2, "u1", datetime(2026, 1, 1, 10, 30, 0)),
        (3, "u1", datetime(2026, 1, 1, 11, 0, 0)),   # exactly +1h from id 1
        (4, "u1", datetime(2026, 1, 1, 12, 30, 0)),
        (5, "u2", datetime(2026, 1, 1, 10, 15, 0)),  # other key
        (6, "u3", datetime(2026, 1, 1, 9, 0, 0)),    # no followers
    ]
    return spark.createDataFrame(rows, "event_id bigint, user_id string, ts timestamp")


def test_following_count_window_semantics(spark):
    out = {
        r["event_id"]: r["n_following"]
        for r in following_count(
            _events(spark), ["user_id"], "event_id", "ts", 3600
        ).collect()
    }
    # id1 sees id2 (+30m) and id3 (exactly +1h, inclusive upper bound)
    assert out[1] == 2
    assert out[2] == 1  # id3 only
    assert out[3] == 0  # id4 is +90m, outside
    assert out[4] == 0
    assert out[5] == 0  # u2 isolated
    assert out[6] == 0  # zero rows survive the join-back


def test_range_join_pairs_unique_and_bounded(spark):
    pairs = following_range_join(
        _events(spark), _events(spark), ["user_id"], "ts", 3600
    ).select("event_id", "r_event_id")
    got = sorted((r["event_id"], r["r_event_id"]) for r in pairs.collect())
    assert got == [(1, 2), (1, 3), (2, 3)]  # each pair exactly once


def test_range_join_plan_is_hash_join_not_nested_loop(spark):
    df = following_range_join(
        _events(spark), _events(spark), ["user_id"], "ts", 3600
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan  # equi join on (user_id, __bin)
