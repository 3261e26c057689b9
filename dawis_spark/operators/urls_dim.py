"""URL dimension — lookup-or-insert as a set-based upsert (J6/K6).

Reference (database/orm/tables/urls_urlset.py:6-43, service/check.py:50-57):
checks in MySQL are normalized — each check row points at a ``urls_<urlset>``
dimension row; inserting a check first looks up (protocol, domain, path,
query), inserts if absent, and caches ids in-process.

Spark-first: the per-row lookup-insert becomes ONE left-anti append per
batch — new distinct URLs get ids above the current max; ids are stable
across batches because existing rows are never rewritten. The in-process
``_cached_url_ids`` dict becomes the dimension itself, broadcast at join
time. (De-normalized checks keep the url struct inline — SURVEY §7.5(7);
this dimension exists for parity and for compact FK-style serving tables.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

URL_KEY = ["protocol", "domain", "path", "query"]


def upsert_urls(
    spark: SparkSession, urls: DataFrame, dim_path: str
) -> DataFrame:
    """Ensure every (protocol,domain,path,query) in ``urls`` has a dim row;
    returns the full dimension (url_id, protocol, domain, path, query).

    One anti-join + one bounded append; no per-row round trips. Batch-level
    atomicity matches the reference's per-run commit.
    """
    incoming = urls.select(*URL_KEY).distinct()
    if os.path.exists(dim_path):
        existing = spark.read.parquet(dim_path)
        base = existing.agg(F.coalesce(F.max("url_id"), F.lit(0)).alias("m")).first()["m"]
        fresh = incoming.join(
            F.broadcast(existing.select(*URL_KEY)), URL_KEY, "left_anti"
        )
    else:
        existing, base = None, 0
        fresh = incoming
    # Deterministic id assignment. The un-partitioned window serializes the
    # NEW-urls slice only — urlset dimensions are config-sized (tens to
    # thousands of rows), never fact-sized, so one task is the right plan.
    w = Window.orderBy(*URL_KEY)
    new_rows = fresh.withColumn("url_id", F.row_number().over(w) + F.lit(base)).select(
        "url_id", *URL_KEY
    )
    new_rows.write.mode("append").parquet(dim_path)
    return spark.read.parquet(dim_path)


def resolve_url_ids(checks: DataFrame, dim: DataFrame) -> DataFrame:
    """Attach url_id to check rows carrying a ``url`` struct (the FK join,
    checks_urlset.py:20-47) — dimension broadcast, no fact shuffle."""
    flat = checks.withColumns(
        {k: F.col("url").getField(k) for k in URL_KEY}
    )
    return (
        flat.join(F.broadcast(dim), URL_KEY, "left")
        .drop(*URL_KEY)
    )
