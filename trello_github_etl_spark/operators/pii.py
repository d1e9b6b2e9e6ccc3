"""PII scrubbing for training corpora: redact emails, IPv4 addresses
and phone-like numbers, counting what was removed.

A compliance stage every large-scale text pipeline runs before
training. Pure JVM-side regexp_replace/regexp_extract_all — at
100 TB this is a narrow map over the scan, no shuffle, no Python.

The regexes live here as module constants and are spliced verbatim
into the DuckDB oracle (queries/llm_q.py t18) — both engines run the
SAME pattern, and each is restricted to the syntax subset Java
regex and RE2 agree on (character classes, bounded repetition; no
backreferences, no lookaround).

Order matters and is part of the contract: emails are scrubbed
FIRST (an email can contain digit runs the later patterns would
nibble at), then IPs, then phones; each count is taken on the text
the corresponding replacement actually saw.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"(\d{1,3}\.){3}\d{1,3}"
PHONE_RE = r"\d{3}-\d{4}"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"

# (output count column, regex, replacement token) — scrub order
RULES = (
    ("n_emails", EMAIL_RE, EMAIL_TOKEN),
    ("n_ips", IPV4_RE, IP_TOKEN),
    ("n_phones", PHONE_RE, PHONE_TOKEN),
)


def scrub_pii(text: Column) -> dict[str, Column]:
    """Columns: the three counts plus ``scrubbed`` (fully redacted
    text). Counts are per-stage: n_ips counts matches in the
    email-scrubbed text, n_phones in the email+ip-scrubbed text."""
    out: dict[str, Column] = {}
    cur = text
    for count_col, pattern, token in RULES:
        out[count_col] = F.size(
            F.regexp_extract_all(cur, F.lit(pattern), 0)
        )
        cur = F.regexp_replace(cur, pattern, token)
    out["scrubbed"] = cur
    return out
