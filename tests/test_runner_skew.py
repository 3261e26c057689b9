"""End-to-end runner lifecycle (§3.1) and the salted skew join."""

import datetime as dt

from pyspark.sql import functions as F

from dawis_spark.catalog import Warehouse
from dawis_spark.config import load_configuration
from dawis_spark.operators.skew import salted_join
from dawis_spark.runner import run_operation
from dawis_spark.schemas import HTML_DOC_SCHEMA

CONFIG = """
urlsets:
  owndomains:
    urls: ["https://www.example.de/"]
operations:
  htmlheadings:
    settings:
      owndomains:
        count_headline_h1: {assert: 1}
"""


def _doc(path, body):
    return {
        "urlset": "owndomains",
        "url": {"protocol": "https", "domain": "www.example.de", "path": path, "query": ""},
        "status_code": 200,
        "num_redirects": 0,
        "redirects": [],
        "ttfb": 1.0,
        "body": body,
        "rendered": False,
        "date": dt.datetime(2026, 5, 1),
        "headers": {},
        "configuration_hash": "h",
    }


def test_run_operation_lifecycle(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    docs = spark.createDataFrame(
        [_doc("/one.html", "<body><h1>a</h1></body>"),
         _doc("/two.html", "<body></body>")],
        HTML_DOC_SCHEMA,
    )
    wh.write(docs, "staging_html")
    cfg = load_configuration(CONFIG)

    n = run_operation(spark, wh, cfg, "htmlheadings")
    assert n == 2
    checks = wh.read("checks").collect()
    by_path = {r["url"]["path"]: r["valid"] for r in checks}
    assert by_path == {"/one.html": True, "/two.html": False}
    # incremental: second run sees nothing unprocessed
    assert run_operation(spark, wh, cfg, "htmlheadings") == 0
    assert wh.read("checks").count() == 2


def test_salted_join_matches_plain_join(spark):
    # hot key 'x' dominates the big side; salted join must return the
    # exact same multiset as the plain join
    big = spark.createDataFrame(
        [("x", i) for i in range(500)] + [("y", i) for i in range(10)],
        "k string, v int",
    )
    small = spark.createDataFrame([("x", "hot"), ("y", "cold"), ("z", "unused")], "k string, lab string")
    plain = big.join(small, "k").groupBy("k", "lab").count().collect()
    salted = salted_join(big, small, "k", salt_buckets=8).groupBy("k", "lab").count().collect()
    assert sorted(map(str, plain)) == sorted(map(str, salted))


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([("x", 1), ("nomatch", 2)], "k string, v int")
    small = spark.createDataFrame([("x", "lab")], "k string, lab string")
    out = salted_join(big, small, "k", salt_buckets=4, how="left").collect()
    rows = {r["k"]: r["lab"] for r in out}
    assert rows == {"x": "lab", "nomatch": None}


def test_cron_matches_grammar():
    import datetime as dt

    from dawis_spark.runner import cron_matches

    t = dt.datetime(2026, 5, 4, 4, 0)  # Monday 04:00
    assert cron_matches("0 4 * * *", t)
    assert not cron_matches("0 5 * * *", t)
    assert cron_matches("*/15 * * * *", t)
    assert cron_matches("0 4 * * 1", t)            # Monday = 1
    assert not cron_matches("0 4 * * 0", t)
    assert cron_matches("0 0-6/2 * * *", t)        # 0,2,4,6
    assert cron_matches("0,30 4 4 5 *", t)
    assert not cron_matches("0 4 5 * *", t)
    sunday = dt.datetime(2026, 5, 3, 4, 0)
    assert cron_matches("0 4 * * 0", sunday)
    assert cron_matches("0 4 * * 7", sunday)        # 7 == Sunday too
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cron_matches("0 4 * *", t)


def test_run_due_operations_dispatches_by_schedule(spark):
    import datetime as dt

    from dawis_spark.config import load_configuration
    from dawis_spark.runner import run_due_operations

    cfg = load_configuration(
        """
operations:
  metatags:
    schedule: "0 4 * * *"
    settings: {}
  htmlheadings:
    schedule: "0 6 * * *"
    settings: {}
"""
    )
    ran = []

    def fake_run(spark_, wh, configuration, name):
        ran.append(name)
        return 7

    out = run_due_operations(
        spark, None, cfg, dt.datetime(2026, 5, 4, 4, 0), run_one=fake_run
    )
    assert out == {"metatags": 7} and ran == ["metatags"]
    assert run_due_operations(
        spark, None, cfg, dt.datetime(2026, 5, 4, 5, 0), run_one=fake_run
    ) == {}


def test_run_with_limit_cancels_overrunning_job(spark):
    import time

    import pytest as _pytest

    from dawis_spark.runner import RuntimeLimitExceeded, run_with_limit

    # fast path completes untouched
    assert run_with_limit(spark, lambda: spark.range(10).count(), 30, "g-fast") == 10

    def slow():
        # ~10^10-pair crossJoin count: far beyond the 1.5s budget
        big = spark.range(100_000)
        return big.crossJoin(spark.range(100_000)).count()

    t0 = time.time()
    with _pytest.raises(RuntimeLimitExceeded):
        run_with_limit(spark, slow, 1.5, "g-slow")
    assert time.time() - t0 < 30  # cancelled, not run to completion
    # session still usable after the cancellation
    assert spark.range(5).count() == 5


def test_run_all_operations_ignores_schedules(spark):
    """Module-debugger analog: every configured operation runs once, cron
    schedules (even never-matching ones) notwithstanding."""
    from dawis_spark.runner import run_all_operations

    cfg = load_configuration(
        """
operations:
  metatags:
    schedule: "0 4 * * *"
    settings: {}
  htmlheadings:
    settings: {}
"""
    )
    ran = []

    def fake_run(spark_, wh, configuration, name):
        ran.append(name)
        return len(name)

    out = run_all_operations(spark, None, cfg, run_one=fake_run)
    assert out == {"metatags": 8, "htmlheadings": 12}
    assert sorted(ran) == ["htmlheadings", "metatags"]


def test_validate_config_cli(tmp_path, capsys):
    from tools.validate_config import main

    assert main([]) == 1
    assert main([str(tmp_path / "missing.yml")]) == 1
    good = tmp_path / "good.yml"
    good.write_text("urlsets:\n  a:\n    urls: ['https://e.de/']\n")
    assert main([str(good)]) == 0
    bad = tmp_path / "bad.yml"
    bad.write_text("urlsets:\n  a: {}\n")
    assert main([str(bad)]) == 1
    outs = capsys.readouterr().out
    assert "configuration valid" in outs and "configuration is invalid" in outs
