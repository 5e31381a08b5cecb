"""PII scrubbing for training corpora: JVM-side regex redaction.

A standard pre-training cleanup stage (emails / IPv4s / phone numbers ->
typed placeholder tokens). Everything is `regexp_replace` /
`regexp_extract_all` on built-in functions — WholeStageCodegen, no UDF, no
shuffle: a pure narrow map over the corpus, which is exactly what a 100 TB
scrub pass must be.

Patterns are deliberately restricted to syntax with identical semantics in
Java regex (Spark) and RE2 (DuckDB) — no backreferences, no lookaround — so
the DuckDB oracle replays them verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# order matters: emails first (their domains contain dots an IP pattern
# could partially shadow), then IPs, then phones
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}(\.\d{1,3}){3}\b"
PHONE_RE = r"\+\d{1,2}-\d{3}-\d{4}"

_REDACTIONS = [(EMAIL_RE, "<EMAIL>"), (IPV4_RE, "<IP>"), (PHONE_RE, "<PHONE>")]


def pii_counts(col: Column) -> dict[str, Column]:
    """{kind: count Column} of PII matches in ``col`` (pre-redaction)."""
    return {
        "n_emails": F.size(F.regexp_extract_all(col, F.lit(EMAIL_RE), 0)),
        "n_ips": F.size(F.regexp_extract_all(col, F.lit(IPV4_RE), 0)),
        "n_phones": F.size(F.regexp_extract_all(col, F.lit(PHONE_RE), 0)),
    }


def redact_pii(col: Column) -> Column:
    """Replace every PII match with its typed placeholder token."""
    out = col
    for pattern, token in _REDACTIONS:
        out = F.regexp_replace(out, pattern, token)
    return out
