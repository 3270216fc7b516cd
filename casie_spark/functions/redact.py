"""PII redaction — training-data hygiene (C4/Dolma-style): replace
emails, IPv4 addresses and phone-shaped numbers with typed
placeholders before a corpus ships to training.

Pure column work (`regexp_replace`/`regexp_extract_all`, patterns
restricted to syntax Java regex and RE2 share), so the DuckDB oracle
(q32) verifies the redacted text byte-for-byte via md5.  Map-only —
no shuffle; Catalyst pushes the projection to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"

_RULES = [("<EMAIL>", EMAIL_RE, "n_emails"),
          ("<IP>", IPV4_RE, "n_ips"),
          ("<PHONE>", PHONE_RE, "n_phones")]


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """+ redacted_text, n_emails, n_ips, n_phones.  Order matters:
    emails first (an address can embed digits), then IPs (a dotted
    quad would otherwise partially match the phone pattern), then
    phones — the oracle applies the identical chain."""
    out = docs
    t = F.col(text_col)
    for placeholder, pat, cname in _RULES:
        out = out.withColumn(
            cname, F.size(F.regexp_extract_all(t, F.lit(pat), 0)))
        t = F.regexp_replace(t, pat, placeholder)
    return out.withColumn("redacted_text", t)
