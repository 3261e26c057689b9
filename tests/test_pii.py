"""functions/pii.py: detection counts, redaction, and Spark/DuckDB parity."""

import duckdb
import pytest

from dawis_spark.functions import pii


SAMPLE = (
    "write to jane.doe+x@sub.example.co.uk or admin@host.io, "
    "server at 192.168.0.1 (backup 10.0.3.77), call +49 30 901820"
)


def test_counts_and_redaction_spark(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, SAMPLE)], "id bigint, t string")
    counts = pii.pii_counts_sql("t", "spark")
    row = df.select(
        *[F.expr(e).alias(k) for k, e in counts.items()],
        F.expr(pii.redact_sql("t", "spark")).alias("red"),
    ).collect()[0]
    assert row["n_email"] == 2
    assert row["n_ipv4"] == 2
    assert row["n_phone"] == 1
    red = row["red"]
    assert "<EMAIL>" in red and "<IP>" in red and "<PHONE>" in red
    assert "example" not in red and "192.168" not in red and "901820" not in red


def test_spark_duckdb_parity(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, SAMPLE)], "id bigint, t string")
    srow = df.select(
        F.expr(pii.redact_sql("t", "spark")).alias("red")
    ).collect()[0]
    drow = duckdb.sql(
        f"SELECT {pii.redact_sql('t', 'duckdb')} AS red "
        f"FROM (SELECT ? AS t)", params=[SAMPLE]
    ).fetchone()
    assert srow["red"] == drow[0]
