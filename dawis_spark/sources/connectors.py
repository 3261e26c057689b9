"""Connector harness — eager fetch -> DataFrame, outside the lazy DAG.

Reference ingestion surface (SURVEY §2.1 S1-S8): HTML fetch, robots.txt,
PageSpeed v1/v2, GSC Search Analytics, GA Reporting, Sistrix domain/
optimizer. Each was a thread-fanned HTTP loop writing Mongo; here each is a
``Connector``: fetch() produces plain row dicts eagerly (bounded thread
pool, rate limit, retry budget), to_dataframe() lands them with an explicit
schema. Tests substitute fixture rows for live HTTP (this container has no
network) — the relational pipeline downstream is identical either way.

Operational constants mirror the reference's (BASELINE.md): retry budget 3
(google_pagespeed.py:33), chunked parallelism 10 (:32), pacing seconds
(:34-35).
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Callable, Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAX_PARALLEL_REQUESTS = 10  # google_pagespeed.py:32
MAX_RETRY_COUNT = 3  # google_pagespeed.py:33
SECONDS_BETWEEN_REQUESTS = 3  # google_pagespeed.py:34
SECONDS_BETWEEN_REQUEST_CHUNKS = 10  # google_pagespeed.py:35


@dataclass
class FetchResult:
    rows: list[dict] = field(default_factory=list)
    failed: list[dict] = field(default_factory=list)  # -> retry queue entries


class Connector:
    """Base: subclass with ``fetch_one(item) -> dict`` and a ``schema``.

    ``fetch_many`` runs the bounded pool with per-item retry; failures keep
    their item + attempt count for the retry queue (§2.9 semantics).

    ``renderer``: optional injected headless-render callable
    ``(url) -> body`` (reference html_parser.py:121-132 drives headless
    Chrome; that binary isn't in this container, so the hook is injected
    exactly like the alert Dispatcher's sender). When an item carries
    ``render: true`` and a renderer is set, the rendered body replaces the
    fetched one and the row's ``rendered`` flag records it
    (html_parser.py:105-117). A renderer failure goes through the same
    retry/failed-queue path as a fetch failure.
    """

    schema: T.StructType
    max_parallel: int = MAX_PARALLEL_REQUESTS
    max_retries: int = MAX_RETRY_COUNT
    pacing_seconds: float = 0.0  # live connectors set this; fixtures keep 0
    renderer: Callable[[str], str] | None = None

    def fetch_one(self, item: dict) -> dict:  # pragma: no cover - abstract
        raise NotImplementedError

    def _apply_render(self, item: dict, row: dict) -> dict:
        if not item.get("render") or self.renderer is None:
            return row
        row = dict(row)
        row["body"] = self.renderer(item["url"])
        if "rendered" in self.schema.fieldNames():
            row["rendered"] = True
        return row

    def fetch_many(self, items: Sequence[dict]) -> FetchResult:
        result = FetchResult()

        def run(item: dict) -> None:
            for attempt in range(1, self.max_retries + 1):
                try:
                    result.rows.append(self._apply_render(item, self.fetch_one(item)))
                    return
                except Exception as exc:  # noqa: BLE001 - retry any failure
                    if attempt == self.max_retries:
                        result.failed.append(
                            {"item": item, "attempts": attempt, "error": str(exc)}
                        )
                    elif self.pacing_seconds:
                        time.sleep(self.pacing_seconds)

        with ThreadPoolExecutor(max_workers=self.max_parallel) as pool:
            list(pool.map(run, items))
        return result

    def to_dataframe(self, spark: SparkSession, rows: Iterable[dict]) -> DataFrame:
        return spark.createDataFrame(list(rows), self.schema)

    def ingest(self, spark: SparkSession, items: Sequence[dict]) -> tuple[DataFrame, list[dict]]:
        """fetch + land; returns (staged DataFrame, failed items)."""
        result = self.fetch_many(items)
        return self.to_dataframe(spark, result.rows), result.failed


class FixtureConnector(Connector):
    """Test/offline connector: 'fetches' from a callable (no network).
    Stands in for any of S1-S8 by pairing it with the right schema."""

    def __init__(
        self,
        schema: T.StructType,
        fetcher: Callable[[dict], dict],
        renderer: Callable[[str], str] | None = None,
    ):
        self.schema = schema
        self._fetcher = fetcher
        self.pacing_seconds = 0.0
        self.renderer = renderer

    def fetch_one(self, item: dict) -> dict:
        return self._fetcher(item)
