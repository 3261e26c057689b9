"""Module runner — the reference's scheduled-run lifecycle (SURVEY §3.1)
without Celery/Redis/pickle.

Reference: celery beat -> run_runner -> importlib module lookup ->
CustomClass(configuration, key, connection).run() (dawis.py:26-70,
modules/runner.py:10-25). Here an external scheduler (cron/Airflow) calls
``run_operation``: config lookup -> staging read -> processed-log filter ->
module evaluate -> checks append -> processed-log mark. One lazy plan per
module run; the only actions are the two appends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dawis_spark.catalog import Warehouse
from dawis_spark.config import Configuration
from dawis_spark.modules import get_module
from dawis_spark.streaming.processed import ProcessedLog

# staging table per module family (the reference's per-module Mongo
# collections, database/mongodb.py:74-87)
STAGING_TABLES = {
    "responseheader": "staging_html",
    "metatags": "staging_html",
    "htmlheadings": "staging_html",
    "robotstxt": "staging_robotstxt",
    "pagespeed": "staging_pagespeed",
}


def run_operation(
    spark: SparkSession,
    warehouse: Warehouse,
    configuration: Configuration,
    module_name: str,
    checks_table: str = "checks",
    incremental: bool = True,
) -> int:
    """Run one operation module over every configured urlset; returns the
    number of check rows appended."""
    module_cfg = configuration.operations[module_name]
    staging = warehouse.read(STAGING_TABLES[module_name])
    log = ProcessedLog(spark, warehouse.root, module_name)
    if incremental:
        staging = log.unprocessed(staging, ["urlset", "url", "date"])

    evaluate = get_module(module_name)
    total = 0
    for urlset, settings in module_cfg.settings.items():
        docs = staging.filter(staging.urlset == urlset)
        checks: DataFrame = evaluate(docs, settings)
        checks = checks.cache()
        n = checks.count()
        if n:
            warehouse.write(checks, checks_table)
        total += n
        checks.unpersist()
    if incremental:
        log.mark(staging, ["urlset", "url", "date"])
    return total
