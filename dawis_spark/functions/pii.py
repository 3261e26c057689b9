"""PII detection / redaction fragments, dual-rendered for Spark and DuckDB.

Training-data pipelines scrub obvious personal identifiers before the
corpus ships; these are the standard regex families (email, IPv4,
international-format phone). Patterns deliberately avoid backslash
escapes ([0-9] not \\d, [.] not \\.) so the IDENTICAL literal parses the
same under Spark SQL string-escape processing and DuckDB standard SQL
strings — the same trick functions/text.py uses for oracle parity.

Everything renders to built-in regexp functions (JVM-side, codegen): at
100 TB redaction is a pure map over the scan, zero shuffles.
"""

from __future__ import annotations

EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
IPV4 = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
PHONE = "[+][0-9][0-9 ]{5,}[0-9]"

# redaction order matters: emails first (their domains contain dot-digit
# runs an IPv4 scan could clip), then IPs, then phones.
FAMILIES: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL, "<EMAIL>"),
    ("ipv4", IPV4, "<IP>"),
    ("phone", PHONE, "<PHONE>"),
)


def count_matches(col: str, pattern: str, dialect: str) -> str:
    """Number of non-overlapping matches of ``pattern`` in ``col``."""
    if dialect == "spark":
        return f"size(regexp_extract_all({col}, '{pattern}', 0))"
    return f"len(regexp_extract_all({col}, '{pattern}'))"


def pii_counts_sql(col: str, dialect: str) -> dict[str, str]:
    """Per-family match-count expressions keyed ``n_<family>``."""
    return {
        f"n_{name}": count_matches(col, pat, dialect)
        for name, pat, _ in FAMILIES
    }


def redact_sql(col: str, dialect: str) -> str:
    """``col`` with every PII family replaced by its tag, applied in
    FAMILIES order (each rewrite sees the previous one's output)."""
    expr = col
    for _, pat, tag in FAMILIES:
        if dialect == "spark":
            expr = f"regexp_replace({expr}, '{pat}', '{tag}')"
        else:
            expr = f"regexp_replace({expr}, '{pat}', '{tag}', 'g')"
    return expr
