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


# --- HTML-tolerant XPath subset (xpath.py:282-302) --------------------------

_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}


class _TreeBuilder(HTMLParser):
    """HTML -> xml.etree tree, tolerant of real-world markup: void elements
    never open a scope, stray end tags are ignored, unclosed tags are
    closed implicitly when an ancestor closes. Replaces lxml's
    document_from_html for the XPath subset below (lxml is not in this
    container; reference xpath.py:282-302)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        import xml.etree.ElementTree as ET

        self._ET = ET
        self.root = ET.Element("__doc__")
        self._stack = [self.root]

    # HTML implied end tags (minimal subset): these elements close their
    # open same-tag sibling when a new one starts (<p>a<p>b == two <p>s)
    _SELF_CLOSING_SIBLINGS = {"p", "li", "option", "tr", "td", "th", "dt", "dd"}

    def handle_starttag(self, tag, attrs):
        if (
            tag in self._SELF_CLOSING_SIBLINGS
            and len(self._stack) > 1
            and self._stack[-1].tag == tag
        ):
            self._stack.pop()
        el = self._ET.SubElement(
            self._stack[-1], tag, {k.lower(): (v or "") for k, v in attrs}
        )
        if tag not in _VOID_TAGS:
            self._stack.append(el)

    def handle_endtag(self, tag):
        if any(e.tag == tag for e in self._stack[1:]):
            while len(self._stack) > 1:
                if self._stack.pop().tag == tag:
                    break

    def handle_data(self, data):
        cur = self._stack[-1]
        children = list(cur)
        if children:
            children[-1].tail = (children[-1].tail or "") + data
        else:
            cur.text = (cur.text or "") + data


def _normalize_path(query: str) -> str:
    """lxml-style absolute/descendant paths -> ElementTree findall paths
    (relative to the __doc__ wrapper)."""
    if query.startswith("//"):
        return "." + query
    if query.startswith("/"):
        return "." + query  # '/html/body' -> './html/body' under the wrapper
    return query


_ATTR_TAIL = re.compile(r"/@([\w:.-]+)$")


def html_xpath(body: str, query: str) -> list:
    """Evaluate an XPath (ElementTree subset: tag paths, '//', '*',
    '[@attr]', \"[@attr='v']\", '[tag]', '[n]', plus trailing '/@attr' and
    '/text()') over tolerant-parsed HTML.

    Element results serialize as the reference does (xpath.py:286-300):
    concatenated child-element markup, else the element's own text.
    Deviation documented: child serialization is compact
    (ET.tostring) rather than lxml pretty_print, so inter-tag whitespace
    differs; content is identical.
    """
    import xml.etree.ElementTree as ET

    builder = _TreeBuilder()
    builder.feed(body or "")
    attr = None
    want_text = False
    m = _ATTR_TAIL.search(query)
    if m:
        attr = m.group(1)
        query = query[: m.start()]
    elif query.endswith("/text()"):
        want_text = True
        query = query[: -len("/text()")]
    out: list = []
    for el in builder.root.findall(_normalize_path(query)):
        if attr is not None:
            value = el.get(attr)
            if value is not None:
                out.append(value)
            continue
        if want_text:
            if el.text is not None and not el.text.isspace():
                out.append(el.text)
            continue
        children = list(el)
        content = "".join(
            ET.tostring(child, encoding="unicode") for child in children
        )
        if content == "" and isinstance(el.text, str) and not el.text.isspace():
            content = el.text
        out.append(content)
    return out


def extract_xpath(query: str):
    """array<string> pandas UDF evaluating ``query`` per body — map-side,
    Arrow-batched like every other extractor in this module."""

    def fn(bodies: pd.Series) -> pd.Series:
        return bodies.map(lambda b: html_xpath(b, query))

    return F.pandas_udf(fn, T.ArrayType(T.StringType()))
