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

import json
from typing import Callable, Mapping, Sequence
from urllib.parse import quote

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


# --- Wrike sink builders (K8) ----------------------------------------------
# Pure payload/request construction mirroring the reference's API client
# (service/api/wrike.py:28-67 request assembly, :105-143 task payload) and
# the dispatcher's per-alert vs summarized-task modes
# (alerting_dispatcher.py:181-273). Transport is injected — these build
# dicts, they never open a socket.

WRIKE_API_URL = "https://{host}/api/v4"
WRIKE_HOST_GLOBAL = "www.wrike.com"
WRIKE_HOST_EU = "app-eu.wrike.com"
WRIKE_DEFAULT_TASK_TITLE = "dawis Alert"


def wrike_request(
    method: str,
    method_url: str,
    parameters: dict | None = None,
    api_token: str = "",
    api_host: str = WRIKE_HOST_GLOBAL,
) -> dict:
    """REST request dict for the Wrike v4 API (wrike.py:28-54): POST
    carries ``parameters`` as a JSON body; other verbs urlencode them into
    the query string (dict/list values JSON-serialized first). Raises on
    unknown verb or host like the reference client."""
    method = method.upper()
    if method not in ("GET", "POST", "PUT", "DELETE"):
        raise ValueError(f"unknown HTTP method {method!r}")
    if api_host not in (WRIKE_HOST_GLOBAL, WRIKE_HOST_EU):
        raise ValueError(f"unknown Wrike host {api_host!r}")
    url = WRIKE_API_URL.format(host=api_host) + method_url
    body: dict = {}
    if parameters and method != "POST":
        url += "?" + "&".join(
            key
            + "="
            + quote(
                json.dumps(value) if isinstance(value, (dict, list)) else str(value)
            )
            for key, value in parameters.items()
        )
    elif parameters:
        body = parameters
    return {
        "method": method,
        "url": url,
        "headers": {
            "Accept": "application/json",
            "Authorization": f"bearer {api_token}",
        },
        "json": body,
    }


def wrike_task_payload(
    title: str,
    description: str | None = None,
    responsibles: Sequence[str] | None = None,
    date_start=None,
    date_end=None,
) -> dict:
    """Task-create parameters (wrike.py:105-135): title required; a single
    date fills in the other endpoint; responsibles only when non-empty."""
    if not title:
        raise ValueError("missing required title in task data")
    payload: dict = {"title": title}
    if isinstance(description, str):
        payload["description"] = description
    if date_start is not None or date_end is not None:
        date_end = date_end or date_start
        date_start = date_start or date_end
        payload["dates"] = {
            "start": f"{date_start:%Y-%m-%d}",
            "due": f"{date_end:%Y-%m-%d}",
        }
    if responsibles:
        payload["responsibles"] = list(responsibles)
    return payload


def wrike_alert_descriptions(
    alerts: Sequence[dict],
    add_alert_data: bool = True,
    summarize: bool = False,
) -> list[str]:
    """Task descriptions from alert rows (alerting_dispatcher.py:239-265):
    message newlines become <br/>, optional pretty-printed alert data
    follows each message, '<br/><br/>' separates sections. ``summarize``
    concatenates everything into ONE description (one summarized task)
    instead of one per alert."""

    def one(alert: dict) -> str:
        desc = str(alert.get("message", "")).replace("\n", "<br/>") + "<br/><br/>"
        if add_alert_data:
            data = alert.get("data")
            if isinstance(data, str):
                try:
                    data = json.loads(data)
                except ValueError:
                    pass
            desc += json.dumps(data, indent=2).replace("\n", "<br/>") + "<br/><br/>"
        return desc

    if summarize:
        return ["".join(one(a) for a in alerts)] if alerts else []
    return [one(a) for a in alerts]


class Dispatcher:
    """Driver-side alert delivery (K7 email / K8 Wrike) with injected
    senders; failed sends leave the watermark uncommitted -> redelivered
    next run (at-least-once, alerting_dispatcher.py:177-179)."""

    def __init__(
        self,
        queue: AlertQueue,
        send: Callable[[str, Sequence[dict]], None],
        renderer: Callable[[Sequence[dict]], str] | None = None,
        html_renderer: Callable[[Sequence[dict]], str] | None = None,
        send_message: Callable[[str, dict], None] | None = None,
    ):
        self.queue = queue
        self.send = send
        self.renderer = renderer or self.render_text
        self.html_renderer = html_renderer
        self.send_message = send_message

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

    @staticmethod
    def render_html(alerts: Sequence[dict]) -> str:
        """HTML sibling of render_text (the reference ships template pairs;
        service/email/dispatcher.py:50-54 renders both into one message)."""
        try:
            from jinja2 import Template

            tpl = Template(
                "<ul>{% for a in alerts %}"
                "<li>[{{ a.date }}] {{ a.message }}</li>"
                "{% endfor %}</ul>"
            )
            return tpl.render(alerts=alerts)
        except ImportError:  # pragma: no cover
            items = "".join(f"<li>[{a['date']}] {a['message']}</li>" for a in alerts)
            return f"<ul>{items}</ul>"

    def build_message(
        self,
        alerts: Sequence[dict],
        subject: str = "dawis alerts",
        from_email: str | None = None,
        to_email: str | None = None,
    ) -> dict:
        """EmailMessage-shaped dict (service/email/dispatcher.py:38-57:
        set_content + add_alternative): always a text/plain part; when an
        html_renderer is configured, a text/html alternative alongside it
        — the reference's multipart send_email vs text-only
        send_text_email, selected by which templates are configured."""
        parts = [{"content": self.renderer(alerts), "subtype": "plain"}]
        if self.html_renderer is not None:
            parts.append(
                {"content": self.html_renderer(alerts), "subtype": "html"}
            )
        return {
            "subject": subject,
            "from": from_email,
            "to": to_email,
            "parts": parts,
        }

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
            for recipient in recipients:
                if self.send_message is not None:
                    message = self.build_message(group_rows, to_email=recipient)
                    self.send_message(recipient, message)  # raises -> no commit
                else:
                    self.send(recipient, group_rows)  # raises -> no commit
            delivered[group] = len(group_rows)
        self.queue.commit(batch)
        return delivered

    def dispatch_wrike(
        self,
        groups: Sequence[str],
        folder_id: str,
        transport: Callable[[dict], dict],
        api_token: str = "",
        api_host: str = WRIKE_HOST_GLOBAL,
        task_title: str = WRIKE_DEFAULT_TASK_TITLE,
        responsibles: Sequence[str] | None = None,
        summarize: bool = False,
        add_alert_data: bool = True,
        task_date=None,
    ) -> int:
        """Wrike task delivery (K8, alerting_dispatcher.py:181-273): one
        task per alert, or one summarized task when ``summarize``.
        ``transport`` receives the built request dict (injected, like the
        email sender); any raise leaves the watermark uncommitted ->
        redelivery next run. Returns tasks created."""
        batch = self.queue.fetch(list(groups))
        rows = [r.asDict() for r in batch.collect()]
        if not rows:
            self.queue.commit(batch)
            return 0
        created = 0
        for description in wrike_alert_descriptions(
            rows, add_alert_data=add_alert_data, summarize=summarize
        ):
            payload = wrike_task_payload(
                task_title,
                description,
                responsibles=responsibles,
                date_start=task_date,
            )
            request = wrike_request(
                "POST",
                f"/folders/{folder_id}/tasks",
                payload,
                api_token=api_token,
                api_host=api_host,
            )
            transport(request)  # raises -> no commit
            created += 1
        self.queue.commit(batch)
        return created
