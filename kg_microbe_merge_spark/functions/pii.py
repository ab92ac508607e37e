"""PII detection + redaction column functions (corpus-curation stage).

Large-scale training-data pipelines scrub personally identifiable
information before anything else sees the text (emails, phone numbers,
IP addresses, SSN-shaped ids). This module implements the standard
regex-scrub pass entirely JVM-side — ``regexp_count`` /
``regexp_replace`` inside whole-stage codegen, ZERO Python, ZERO
shuffle; the scrub fuses into whatever stage already reads the text, so
at 100 TB it adds no exchange and no extra scan.

Pattern dialect is the RE2-compatible subset (no lookaround, no
backreferences) so the identical pattern strings run in Java regex
(Spark) and RE2 (DuckDB oracle) with identical semantics — the driver
gate hash-compares the REDACTED TEXT itself, not just the counts.

Redaction order is part of the contract (email → ssn → phone → ipv4):
category patterns are near-disjoint by construction, but a fixed order
makes the composition deterministic for any future overlapping pattern.

Reference parity note: the reference repo has no PII stage (its inputs
are curated ontology TSVs, kg_microbe_merge/merge_utils/duckdb_utils.py
merges already-clean columns); this is part of the beyond-reference
training-data-pipeline family the brief mandates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RE2-safe (and Java-regex-identical) patterns. \b is supported by both.
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — conservative charset, 2+ letter TLD
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # 3-2-4 digit SSN shape, dash-separated only
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    # NANP-ish 3-3-4 with dash or dot separators (both separators same)
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    # dotted-quad IPv4 (shape check only — 999.0.0.1 matches, like CCNet's
    # scrubbers; range validation is not the redactor's job)
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

# Fixed application order — email first (its local part may contain
# digits/dots that the later numeric patterns would otherwise bite into).
PII_ORDER: tuple[str, ...] = ("email", "ssn", "phone", "ipv4")

REDACTION_TOKENS: dict[str, str] = {
    "email": "<EMAIL>",
    "ssn": "<SSN>",
    "phone": "<PHONE>",
    "ipv4": "<IP>",
}


def pii_count(text: Column, category: str) -> Column:
    """Number of matches of one PII category (0 for null text)."""
    c = F.regexp_count(text, F.lit(PII_PATTERNS[category]))
    return F.coalesce(c, F.lit(0)).cast("int")


def pii_counts(text: Column) -> dict[str, Column]:
    """All category counts, keyed by category name."""
    return {cat: pii_count(text, cat) for cat in PII_ORDER}


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its category token, in PII_ORDER."""
    out = text
    for cat in PII_ORDER:
        out = F.regexp_replace(
            out, PII_PATTERNS[cat], REDACTION_TOKENS[cat]
        )
    return out


def has_pii(text: Column) -> Column:
    """True when any category matches."""
    acc = F.lit(False)
    for cat in PII_ORDER:
        acc = acc | (pii_count(text, cat) > 0)
    return acc


def pii_oracle_exprs(text_sql: str) -> dict[str, str]:
    """DuckDB SQL twins of the above, built from the same pattern
    strings — count via ``len(regexp_extract_all(...))``, redaction via
    the same ordered ``regexp_replace(..., 'g')`` chain."""
    counts = {
        cat: (
            f"cast(len(regexp_extract_all({text_sql}, "
            f"'{PII_PATTERNS[cat]}')) AS INTEGER)"
        )
        for cat in PII_ORDER
    }
    redacted = text_sql
    for cat in PII_ORDER:
        redacted = (
            f"regexp_replace({redacted}, '{PII_PATTERNS[cat]}', "
            f"'{REDACTION_TOKENS[cat]}', 'g')"
        )
    return {"counts": counts, "redacted": redacted}
