"""Match-enrichment semantics vs google_search_console.py (op):327-386."""

from dawis_spark.operators.enrich import exclude_fields, match_enrich


def _labels(spark, rows, expressions, fallback=""):
    df = spark.createDataFrame([(r,) for r in rows], "s string")
    out = match_enrich(df, "s", "lab", expressions, fallback=fallback)
    return [r["lab"] for r in out.collect()]


def test_regex_capture_substitution(spark):
    labs = _labels(
        spark, ["small ring"], [{"regex": r"^(small|red) (\w+)$", "output": "sz_$2"}]
    )
    assert labs == ["sz_ring"]


def test_missing_group_stays_literal(spark):
    # reference swallows IndexError -> '$5' survives as text (:384-386)
    labs = _labels(spark, ["small ring"], [{"regex": r"^(small)", "output": "a_$1_$5"}])
    assert labs == ["a_small_$5"]


def test_later_expression_overwrites(spark):
    labs = _labels(
        spark,
        ["small ring"],
        [
            {"regex": "ring", "output": "first"},
            {"regex": "small", "output": "second"},
        ],
    )
    assert labs == ["second"]


def test_csv_overwrites_regex_and_iteration_order(spark):
    labs = _labels(
        spark,
        ["bolt and gear", "only bolt"],
        [
            {"regex": "bolt", "output": "rx"},
            {"csv": {"fastener": ["bolt"], "tool": ["gear"]}},
        ],
    )
    # gear written after bolt -> tool wins where both match
    assert labs == ["tool", "fastener"]


def test_case_insensitive_regex_and_csv(spark):
    labs = _labels(
        spark,
        ["BOLT"],
        [{"regex": "bolt", "output": "rx", "caseSensitive": False}],
    )
    assert labs == ["rx"]
    labs = _labels(
        spark,
        ["BOLT"],
        [{"csv": {"f": ["bolt"]}, "caseSensitive": False}],
    )
    assert labs == ["f"]


def test_fallback_only_fills_empty(spark):
    labs = _labels(
        spark,
        ["bolt", "zzz"],
        [{"regex": "bolt", "output": "rx"}],
        fallback="other",
    )
    assert labs == ["rx", "other"]


def test_exclude_fields_protects_date(spark):
    df = spark.createDataFrame([(1, "2024-01-01", "x")], "a int, date string, b string")
    out = exclude_fields(df, ["a", "date", "b", "missing"])
    assert out.columns == ["date"]
