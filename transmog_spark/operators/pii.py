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


def _surrogate(name: str, match: Column, salt: str) -> Column:
    return F.concat(
        F.lit(f"<{name.upper()}:"),
        F.substring(F.md5(F.concat(F.lit(f"{salt}#{name}#"), match)), 1, 8),
        F.lit(">"),
    )


def pii_pseudonymize(text: Column, *, salt: str = "") -> Column:
    """Replace every PII match with a STABLE surrogate — the same entity
    maps to the same token corpus-wide (md5 of salt#type#match, 8 hex
    chars), so joins/frequency analyses over the pseudonymized corpus
    still work where ``pii_redact``'s blanket sentinel destroys them.
    The ``salt`` rotates the mapping between releases (unsalted surrogates
    are dictionary-attackable for low-entropy types like phone numbers).

    Per type, in the fixed PII_PATTERNS order: split the text AROUND the
    matches (split and extract_all agree on spans by construction),
    surrogate each match, and interleave — pure Column work, no UDFs, no
    shuffle; surrogates are hex-only so later patterns can't fire inside
    an earlier type's replacement. Mirrored byte-for-byte in
    ``oracle.pii_pseudo_sql`` (regexp_split_to_array + list_transform).
    """
    out = text
    for name, pat in PII_PATTERNS.items():
        parts = F.split(out, pat)
        # pad the surrogate list with one '' so the zip never sees a null
        # (concat(x, NULL) is NULL in Spark and would eat the last segment)
        # factory, not a defaulted lambda: PySpark HOFs pass the element
        # index to any 2-parameter callable (default args count)
        def _to_surrogate(n: str):
            return lambda m: _surrogate(n, m, salt)

        surr = F.concat(
            F.transform(
                F.regexp_extract_all(out, F.lit(pat), F.lit(0)),
                _to_surrogate(name),
            ),
            F.array(F.lit("")),
        )
        out = F.array_join(
            F.zip_with(parts, surr, lambda p, s: F.concat(p, s)), ""
        )
    return out
