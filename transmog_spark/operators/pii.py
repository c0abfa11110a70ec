"""PII detection and redaction for training-data curation.

Regex-based scanning for the classic PII shapes (emails, US-SSN-like ids,
phone numbers, IPv4 addresses) as pure Column expressions — JVM-side
``regexp_extract_all`` / ``regexp_replace``, no UDFs, so the scan rides
whole-stage codegen and the patterns push through any filter above it.

Patterns are deliberately RE2-compatible (no backreferences, no
lookaround) so the DuckDB oracle evaluates the IDENTICAL pattern strings:
Java regex and RE2 agree on this subset. Redaction applies patterns in a
fixed order (email -> ssn -> phone -> ipv4) so overlapping matches
resolve identically on both engines.

At 100 TB this is a narrow map-only pass: no shuffle, no driver state;
counts aggregate with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: applied in this sequence during redaction.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-type match counts (order-independent; counts overlap-unaware —
    each pattern scans the ORIGINAL text)."""
    return {
        name: F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        for name, pat in PII_PATTERNS.items()
    }


def pii_redact(text: Column) -> Column:
    """Replace every PII match with a ``<TYPE>`` sentinel, applying the
    patterns in the fixed PII_PATTERNS order (email first so phone/ipv4
    never fire inside an already-redacted address)."""
    out = text
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def pii_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc PII profile: one count column per type, total, and the md5
    of the redacted text (the redaction proof — hashable by the oracle)."""
    counts = pii_counts(F.col(text_col))
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col),
        *[c.alias(f"n_{name}") for name, c in counts.items()],
        total.alias("n_pii"),
        F.md5(pii_redact(F.col(text_col))).alias("redacted_md5"),
    )
