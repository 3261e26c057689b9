"""URL/email validation predicates (P11).

Reference: utilities/validator.py:6-24 — re.match (anchored) with the exact
regexes below. Spark mapping: ``rlike`` with an added leading anchor
(rlike is a search; the reference's re.match anchors at the start — both
patterns already end with ``$``).
"""

from __future__ import annotations

from pyspark.sql import Column

# Reference regex, case-insensitive (validator.py:8-17)
URL_REGEX = (
    r"(?i)^(?:http)s?://"
    r"(?:(?:[A-Z0-9](?:[A-Z0-9-]{0,61}[A-Z0-9])?\.)+(?:[A-Z]{2,6}\.?|[A-Z0-9-]{2,}\.?)|"
    r"localhost|"
    r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})"
    r"(?::\d+)?"
    r"(?:/?|[/?]\S+)$"
)

# validator.py:21-23
EMAIL_REGEX = r"(?i)^[a-zA-Z0-9_.+-]+@[a-zA-Z0-9-]+\.[a-zA-Z0-9-.]+$"


def is_valid_url(col: Column) -> Column:
    return col.rlike(URL_REGEX)


def is_valid_email(col: Column) -> Column:
    return col.rlike(EMAIL_REGEX)
