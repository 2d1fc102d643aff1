"""PII redaction — the scrub pass every public-webtext training
pipeline runs before tokenization (emails, phone numbers, IPv4
addresses → typed placeholders).

Pure JVM ``regexp_replace`` / ``regexp_count`` expressions (no UDF);
the patterns deliberately use only the regex subset on which Java's
engine and DuckDB's RE2 agree (character classes, bounded repeats —
no lookaround, no ``\\d``/``\\b`` shorthand), so the whole scrub has
an exact SQL oracle.

Scale: map-only — one projection over the corpus, no shuffle; the
aggregate counts ride the same scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
PHONE_RE = "555-[0-9][0-9][0-9][0-9]?"
IPV4_RE = "[0-9][0-9]?[0-9]?[.][0-9][0-9]?[0-9]?[.][0-9][0-9]?[0-9]?[.][0-9][0-9]?[0-9]?"


def scrub_expr(text: Column) -> Column:
    """Redaction order matters: emails first (an email never contains
    an IP pattern once its digits are inside the local part), then
    phones, then IPv4."""
    c = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, PHONE_RE, "<PHONE>")
    return F.regexp_replace(c, IPV4_RE, "<IP>")


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, n_emails, n_phones, n_ips, scrub_md5)`` — per-doc
    redaction counts plus the md5 of the scrubbed text (the compact
    per-row witness that the redacted bytes are identical across
    engines without shipping the text)."""
    t = F.col(text_col)
    after_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    after_phone = F.regexp_replace(after_email, PHONE_RE, "<PHONE>")
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(after_email, F.lit(PHONE_RE))
        .cast("long")
        .alias("n_phones"),
        F.regexp_count(after_phone, F.lit(IPV4_RE))
        .cast("long")
        .alias("n_ips"),
        F.md5(scrub_expr(t).cast("binary")).alias("scrub_md5"),
    )


def pii_scrub_sql(messy_expr: str) -> str:
    """DuckDB oracle body over ``documents`` with the same synthetic
    messy-text expression ``messy_expr`` the Spark query injects."""
    return f"""
WITH m AS (SELECT doc_id, {messy_expr} AS t FROM documents),
s AS (SELECT doc_id, t,
             regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g') AS t1
      FROM m),
s2 AS (SELECT doc_id, t, t1,
              regexp_replace(t1, '{PHONE_RE}', '<PHONE>', 'g') AS t2
       FROM s)
SELECT doc_id,
       len(regexp_extract_all(t, '{EMAIL_RE}'))::BIGINT AS n_emails,
       len(regexp_extract_all(t1, '{PHONE_RE}'))::BIGINT AS n_phones,
       len(regexp_extract_all(t2, '{IPV4_RE}'))::BIGINT AS n_ips,
       md5(regexp_replace(t2, '{IPV4_RE}', '<IP>', 'g')) AS scrub_md5
FROM s2
""".strip()
