"""HTML extraction pandas UDFs — the one function family Spark can't express
(SURVEY §2.10).

Reference extractions:
  - all <title> texts               (metatags.py:73-87)
  - all meta[name=description]      (metatags.py:381-395)
  - link[rel=canonical] href        (metatags.py:689-699)
  - <h1> texts / count              (htmlheadings.py:64-71)
  - strip script/style/svg/noscript then visible text (utilities/html.py:24-35)
  - robots.txt sitemap list         (robotstxt.py op:112-118)

The reference uses BeautifulSoup/lxml; this container has neither, so the
parser is Python's stdlib html.parser — tolerant of the fixture corpus and
dependency-free. If lxml lands later, only this module changes.

All UDFs are Arrow-batched pandas UDFs (Series -> Series): one
serialization per ~10k-row batch, not per row. At 100 TB these run
map-side, scaling with executors; the DAG above/below them stays JVM-side.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_STRIP_TAGS = {"script", "style", "svg", "noscript"}


class _Extractor(HTMLParser):
    """Single-pass collector for titles, meta descriptions, canonicals, h1s."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.titles: list[str] = []
        self.descriptions: list[str] = []
        self.canonicals: list[str] = []
        self.h1s: list[str] = []
        self._stack: list[str] = []
        self._skip_depth = 0
        self.text_parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        attrs_d = {k.lower(): (v or "") for k, v in attrs}
        if tag == "meta" and attrs_d.get("name", "").lower() == "description":
            self.descriptions.append(attrs_d.get("content", ""))
        if tag == "link" and attrs_d.get("rel", "").lower() == "canonical":
            self.canonicals.append(attrs_d.get("href", ""))
        if tag in _STRIP_TAGS:
            self._skip_depth += 1
        self._stack.append(tag)

    def handle_endtag(self, tag):
        if tag in _STRIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1
        while self._stack:
            if self._stack.pop() == tag:
                break

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._stack:
            if self._stack[-1] == "title":
                self.titles.append(data.strip())
                return
            if self._stack[-1] == "h1":
                self.h1s.append(data.strip())
                return
        if data.strip():
            self.text_parts.append(data.strip())


def _parse(body: str) -> _Extractor:
    ex = _Extractor()
    try:
        ex.feed(body or "")
    except Exception:
        pass  # tolerate malformed HTML like the reference's soup does
    return ex


def _series_extract(field: str):
    def fn(bodies: pd.Series) -> pd.Series:
        return bodies.map(lambda b: getattr(_parse(b), field))

    return fn


extract_titles = F.pandas_udf(
    _series_extract("titles"), T.ArrayType(T.StringType())
)
extract_descriptions = F.pandas_udf(
    _series_extract("descriptions"), T.ArrayType(T.StringType())
)
extract_canonicals = F.pandas_udf(
    _series_extract("canonicals"), T.ArrayType(T.StringType())
)
extract_h1 = F.pandas_udf(_series_extract("h1s"), T.ArrayType(T.StringType()))


@F.pandas_udf(T.StringType())
def strip_html(bodies: pd.Series) -> pd.Series:
    """Visible text with script/style/svg/noscript removed
    (utilities/html.py:24-35)."""
    return bodies.map(lambda b: " ".join(_parse(b).text_parts))


_SITEMAP_RE = re.compile(r"^\s*sitemap\s*:\s*(\S+)\s*$", re.IGNORECASE | re.MULTILINE)


@F.pandas_udf(T.ArrayType(T.StringType()))
def robots_sitemaps(bodies: pd.Series) -> pd.Series:
    """Sitemap URLs from robots.txt bodies (robotstxt.py op:112-118 uses
    urllib.robotparser.site_maps(); the line grammar is identical)."""
    return bodies.map(lambda b: _SITEMAP_RE.findall(b or ""))
