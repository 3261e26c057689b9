"""Operation/aggregation modules — the reference's modules/{operation,
aggregation}/custom re-expressed as DataFrame pipelines.

Each operation module is a pure function ``evaluate(docs, config) ->
checks DataFrame`` (schema: schemas.CHECKS_SCHEMA): one lazy plan per
module run — filter unprocessed, extract, check, union — ending in a
single append write (SURVEY §3.3's Spark shape).

Module registry mirrors the reference's importlib + CamelCase lookup
(modules/runner.py:17-23) with a plain dict.
"""

from __future__ import annotations

from typing import Callable

_REGISTRY: dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def get_module(name: str) -> Callable:
    """Look up an operation module by its config key (runner.py analog)."""
    import dawis_spark.modules.responseheader  # noqa: F401
    import dawis_spark.modules.metatags  # noqa: F401
    import dawis_spark.modules.htmlheadings  # noqa: F401
    import dawis_spark.modules.robotstxt  # noqa: F401
    import dawis_spark.modules.pagespeed  # noqa: F401
    import dawis_spark.modules.gsc  # noqa: F401
    import dawis_spark.modules.xpath  # noqa: F401
    import dawis_spark.modules.alerting  # noqa: F401

    return _REGISTRY[name]
