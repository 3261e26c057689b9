"""alerting_check + alerting_dispatcher — SQL-driven alerts end to end.

Reference:
  - alerting_check (modules/aggregation/custom/alerting_check.py:47-236):
    run a warehouse SQL query with parameters (§3.2), then either evaluate
    ``checksPerLine`` comparisons per result row (A6: alert per failing
    row per group, fire iff result != negate) or emit one aggregate alert
    with ``{resultsCount}`` templating (A5); optionally append a
    success/failure log table.
  - alerting_dispatcher (alerting_dispatcher.py:105-273): consume queued
    alerts per group, render an email (Jinja2 template, K7) or Wrike task
    (K8), re-enqueue on failure (at-least-once).

Spark shape: the query runs as one Catalyst plan via run_query; alert rows
are DataFrames appended to the AlertQueue table; the dispatcher is a
driver-side side effect AFTER collect() — senders are injected so tests
(and this offline container) use recording fakes instead of SMTP/REST.
"""

from __future__ import annotations

from typing import Callable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dawis_spark.modules import register
from dawis_spark.operators.checks import alerts_aggregate, alerts_per_line
from dawis_spark.plans.sql_runner import run_query
from dawis_spark.streaming.alerts import AlertQueue


@register("alerting_check")
def evaluate(
    spark: SparkSession,
    config: dict,
    queue: AlertQueue | None = None,
) -> tuple[DataFrame, DataFrame | None]:
    """Returns (alerts, log). config:
      query: SQL, parameters: {...}, groups: [...], message: template,
      checksPerLine: [templates...] (optional), negate: bool,
      log: {"name": ..., "message": template} (optional)
    """
    result = run_query(
        spark, config["query"], parameters=config.get("parameters")
    )
    groups = list(config.get("groups", []))
    negate = bool(config.get("negate", False))
    message = config.get("message", "{resultsCount} results")

    checks = config.get("checksPerLine") or []
    if checks:
        parts = [
            alerts_per_line(result, template, groups, message, negate=negate)
            for template in checks
        ]
        alerts = parts[0]
        for p in parts[1:]:
            alerts = alerts.unionByName(p)
    else:
        alerts = alerts_aggregate(result, groups, message)

    alerts = alerts.select(
        F.current_timestamp().alias("date"),
        "group",
        "message",
        F.lit(None).cast("string").alias("data"),
    )
    if queue is not None:
        queue.add(alerts)

    log = None
    if "log" in config:
        log_cfg = config["log"]
        # success = no alert fired (reference logs per line/batch; the
        # roll-up we append is one row per run: name, message, success)
        n = alerts.count()
        log = spark.createDataFrame(
            [(log_cfg["name"], log_cfg.get("message", ""), n == 0)],
            "name string, message string, success boolean",
        ).withColumn("date", F.current_timestamp())
    return alerts, log


class Dispatcher:
    """Driver-side alert delivery (K7 email / K8 Wrike) with injected
    senders; failed sends leave the watermark uncommitted -> redelivered
    next run (at-least-once, alerting_dispatcher.py:177-179)."""

    def __init__(
        self,
        queue: AlertQueue,
        send: Callable[[str, Sequence[dict]], None],
        renderer: Callable[[Sequence[dict]], str] | None = None,
    ):
        self.queue = queue
        self.send = send
        self.renderer = renderer or self.render_text

    @staticmethod
    def render_text(alerts: Sequence[dict]) -> str:
        """Jinja2 template render (template_renderer.py:4-18) with a
        plain-text default mirroring resources/templates/."""
        try:
            from jinja2 import Template

            tpl = Template(
                "{% for a in alerts %}[{{ a.date }}] {{ a.message }}\n{% endfor %}"
            )
            return tpl.render(alerts=alerts)
        except ImportError:  # pragma: no cover
            return "\n".join(f"[{a['date']}] {a['message']}" for a in alerts)

    def dispatch(self, groups: Mapping[str, Sequence[str]]) -> dict[str, int]:
        """``groups``: {group: recipients}. Returns delivered counts per
        group. Commits the watermark only after every send succeeded."""
        batch = self.queue.fetch(list(groups))
        rows = [r.asDict() for r in batch.collect()]
        delivered: dict[str, int] = {}
        for group, recipients in groups.items():
            group_rows = [r for r in rows if r["group"] == group]
            if not group_rows:
                continue
            body = self.renderer(group_rows)
            for recipient in recipients:
                self.send(recipient, group_rows)  # raises -> no commit
            delivered[group] = len(group_rows)
            _ = body
        self.queue.commit(batch)
        return delivered
