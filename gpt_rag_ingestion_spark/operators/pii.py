"""PII redaction — beyond-reference, corpus-hygiene family.

Before text reaches a training corpus, emails / phone numbers / URLs
are masked or removed (the C4/RefinedWeb-style cleanup step).  At
100 TB this must be a narrow JVM-side map — one ``regexp_replace``
chain evaluated inside whole-stage codegen next to the scan, never a
Python UDF (a per-row Python hop on 100 TB of text is the difference
between hours and weeks).

Patterns deliberately use explicit character classes (no ``\\S`` / ``\\w``
shorthands) so Java's regex engine (Spark) and RE2 (DuckDB, used by the
oracle) match identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
URL_RE = "https?://[A-Za-z0-9./_-]+"
PHONE_RE = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"

# scrub order matters: URLs first (a URL may embed an email-like
# userinfo part), then emails, then phones
PATTERNS: list[tuple[str, str, str]] = [
    ("url", URL_RE, "<URL>"),
    ("email", EMAIL_RE, "<EMAIL>"),
    ("phone", PHONE_RE, "<PHONE>"),
]


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0))).cast("int")


def scrub_pii(
    df: DataFrame, text_col: str, out_col: str | None = None
) -> DataFrame:
    """Mask PII spans in ``text_col`` and attach per-kind redaction
    counts (``n_url``, ``n_email``, ``n_phone``) — the counts are taken
    BEFORE masking, on the original text, so they report what was
    found even when replacement tokens overlap later patterns."""
    out = out_col or text_col
    scrubbed = F.col(text_col)
    counts = []
    for name, pattern, token in PATTERNS:
        counts.append(_count(F.col(text_col), pattern).alias(f"n_{name}"))
        scrubbed = F.regexp_replace(scrubbed, pattern, token)
    return df.select("*", *counts).withColumn(out, scrubbed)
