"""PII detection/redaction for LLM training-data pipelines
(charter extension, SURVEY.md §2.10 text family).

Scrubbing contact data out of a corpus is a standard pre-training
step. All patterns are pure Catalyst ``regexp_replace``/
``regexp_count`` column expressions — JVM-side, map-only, no
shuffle; at 100 TB this runs inside the scan stage like the other
text signals.

Pattern dialect note: every pattern sticks to the syntax subset
shared by Java regex (Spark) and RE2 (the DuckDB oracle) — character
classes, bounded repetition, ``\\b`` word boundaries; no lookaround
or backreferences — so the differential harness can replay them
verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (label, pattern, replacement) applied IN ORDER — emails first
#: (they contain dots that the later patterns could clip), then IPs
#: (dotted quads), then phone numbers.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}-\d{3}-\d{3,4}-\d{4}", "<PHONE>"),
)


def pii_count(text: Column, label: str) -> Column:
    """Occurrences of one PII class (pre-redaction)."""
    pattern = next(p for lab, p, _ in PII_PATTERNS if lab == label)
    return F.regexp_count(text, F.lit(pattern))


def redact_pii(text: Column) -> Column:
    """Replace every PII occurrence with its class placeholder.
    Order follows :data:`PII_PATTERNS` so overlapping matches resolve
    identically in any engine."""
    out = text
    for _, pattern, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, repl)
    return out


def redaction_sql(text_sql: str) -> str:
    """The oracle-side twin of :func:`redact_pii`: nested DuckDB
    ``regexp_replace(..., 'g')`` calls built from the same
    :data:`PII_PATTERNS` constants (Spark replaces all occurrences by
    default; DuckDB needs the ``'g'`` flag)."""
    out = text_sql
    for _, pattern, repl in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pattern}', '{repl}', 'g')"
    return out


def count_sql(text_sql: str, label: str) -> str:
    pattern = next(p for lab, p, _ in PII_PATTERNS if lab == label)
    return f"len(regexp_extract_all({text_sql}, '{pattern}'))"
