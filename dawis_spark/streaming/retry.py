"""Retry queue — failed imports re-attempted on the next scheduled run.

Reference (google_search_console.py:163-190 / google_pagespeed.py:136-169):
a Mongo collection holds failed import configs keyed (module, key, date)
with an attempt counter; each run merges retries with scheduled work,
dedupes (P10), removes entries on success, and drops entries past the
retry budget.

Spark-first: a small parquet state table on the driver path. Merging with
scheduled work is unionByName + dropDuplicates; success/budget removal is
an overwrite of the (tiny) state table — it holds configs, not data.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

MAX_RETRY_COUNT = 3  # google_pagespeed.py:33


class RetryQueue:
    """Driver-side JSON state (config-sized, not data-sized)."""

    def __init__(self, root: str, module: str):
        self.path = os.path.join(root, f"retry_{module}.json")

    def _load(self) -> list[dict]:
        if os.path.exists(self.path):
            with open(self.path) as f:
                return json.load(f)
        return []

    def _save(self, entries: list[dict]) -> None:
        with open(self.path, "w") as f:
            json.dump(entries, f)

    @staticmethod
    def _key(item: dict) -> str:
        return json.dumps(item, sort_keys=True)

    def pending(self, budget: int = MAX_RETRY_COUNT) -> list[dict]:
        """Entries still within the retry budget."""
        return [e["item"] for e in self._load() if e["attempts"] < budget]

    def merge_with_scheduled(self, scheduled: Sequence[dict]) -> list[dict]:
        """Scheduled work + pending retries, deduped (P10 config dedup)."""
        seen: dict[str, dict] = {}
        for item in list(scheduled) + self.pending():
            seen.setdefault(self._key(item), item)
        return list(seen.values())

    def record_failures(self, failed: Sequence[dict]) -> None:
        """``failed`` entries are {'item':..., 'attempts':..., 'error':...}
        from the connector harness. The queue counts RUNS, not in-run HTTP
        retries (the reference increments its retry_count once per cron
        tick, google_pagespeed.py:136-169): each call adds one attempt."""
        entries = {self._key(e["item"]): e for e in self._load()}
        for f in failed:
            k = self._key(f["item"])
            prev = entries.get(k, {"item": f["item"], "attempts": 0, "error": ""})
            entries[k] = {
                "item": f["item"],
                "attempts": prev["attempts"] + 1,
                "error": f.get("error", ""),
            }
        self._save(list(entries.values()))

    def record_success(self, items: Sequence[dict]) -> None:
        done = {self._key(i) for i in items}
        self._save([e for e in self._load() if self._key(e["item"]) not in done])
