"""PII detection and masking — a standard pretraining-corpus curation
pass (emails / IPv4 addresses / international phone numbers), entirely
JVM-side regexp expressions so it is map-only, codegen-able, and
bit-identical to the DuckDB oracle.

Pattern-design constraints (deliberate):
- every pattern uses only syntax with IDENTICAL semantics in Java regex
  (Spark) and RE2 (DuckDB): character classes, bounded quantifiers,
  ASCII word boundaries — no backrefs, no lookaround;
- the phone pattern requires a leading '+' so digit runs inside IPs,
  ids or timestamps never match;
- counts are measured on the ORIGINAL text per class; masking is
  sequential (email -> ipv4 -> phone) so the replacement tokens of an
  earlier class can never be re-matched by a later one.

100 TB shape: pure per-row expressions — no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9 ()\-]{5,}[0-9]", "<PHONE>"),
)


def pii_scrub(documents: DataFrame) -> DataFrame:
    """-> (doc_id, n_emails, n_ipv4, n_phones, n_pii, masked_text,
    masked_len): per-class occurrence counts plus the scrubbed text with
    each match replaced by its typed token."""
    counts = {
        name: F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0)))
        for name, pat, _tok in PII_PATTERNS
    }
    masked = F.col("text")
    for _name, pat, tok in PII_PATTERNS:
        masked = F.regexp_replace(masked, pat, tok)
    return documents.select(
        "doc_id",
        counts["email"].alias("n_emails"),
        counts["ipv4"].alias("n_ipv4"),
        counts["phone"].alias("n_phones"),
        (counts["email"] + counts["ipv4"] + counts["phone"]).alias("n_pii"),
        masked.alias("masked_text"),
        F.length(masked).alias("masked_len"),
    )
