"""PII detection and redaction for training-data curation.

A corpus scrubbed for pretraining needs emails, phone numbers, IP
addresses, national-ID numbers, and payment-card numbers masked
before anything ships to a tokenizer. Every detector here is a pure
Column regexp expression — JVM-side, whole-stage-codegen, zero
Python in the hot path — so redaction runs inside the scan stage at
100 TB with no shuffle and no UDF serialization.

Patterns are written in the common subset of Java regex (Spark) and
RE2 (DuckDB oracle): no lookaround, no backreferences — so the
driver's DuckDB oracle can replay the exact same substitutions. Thai
national-ID and Thai mobile formats mirror the reference's data
domain (ImportDbdFinancial.php handles Thai juristic-person IDs;
smf-api stores Thai customer contact rows).

Ref: credit-prepare-api masks tax IDs before export
(pdf_ocr_inv_to_json.py tax-ID capture groups); this module
generalizes that to the full PII family a pretraining pipeline
scrubs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Patterns — ORDER MATTERS at call sites: longer/more-specific first
# (citizen ID before phone, card before generic digit runs) so an
# already-masked span can't re-match a looser pattern.
# ---------------------------------------------------------------------------

#: RFC-lite email: local@domain.tld (the pragmatic crawl-scrubbing
#: shape; full RFC 5322 grammar buys nothing on real data).
EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

#: Thai mobile/landline (0x-xxx-xxxx / 0xx-xxx-xxxx, optional +66
#: country form) and bare 9-10 digit runs starting with 0. Separators
#: limited to '-' and ' ' — matching '.' would eat decimal numbers.
PHONE_TH = r"(\+66[- ]?|0)\d{1,2}[- ]?\d{3}[- ]?\d{4}"

#: IPv4 dotted quad. Octet-range checking (0-255) is done loosely —
#: \d{1,3} — because over-masking an invalid quad is harmless while
#: the strict alternation triples the pattern size.
IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

#: Thai national / juristic-person ID: 13 digits, optionally grouped
#: 1-2345-67890-12-3.
CITIZEN_ID_TH = r"\b\d[- ]?\d{4}[- ]?\d{5}[- ]?\d{2}[- ]?\d\b"

#: Payment card: 13-16 digits in groups of 4 (or unbroken). Luhn
#: validation is deliberately NOT applied — a scrubber prefers false
#: positives over leaked card numbers.
CARD = r"\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{1,4}\b"

#: name → (pattern, replacement token), in the order a combined
#: scrubber must apply them.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (EMAIL, "[EMAIL]"),
    "citizen_id": (CITIZEN_ID_TH, "[ID]"),
    "card": (CARD, "[CARD]"),
    "phone": (PHONE_TH, "[PHONE]"),
    "ipv4": (IPV4, "[IP]"),
}


def pii_count(c: Column, kind: str) -> Column:
    """Occurrence count of one PII kind (int). Counted BEFORE any
    masking — run counts on the raw column, not the scrubbed one."""
    pattern, _ = PII_PATTERNS[kind]
    return F.regexp_count(c, F.lit(pattern))


def redact(c: Column, kinds: tuple[str, ...] = tuple(PII_PATTERNS)) -> Column:
    """Mask every listed PII kind with its token, applying patterns in
    PII_PATTERNS order (specific before loose) so e.g. a 13-digit
    citizen ID is tagged [ID] before the card pattern can claim its
    first 16 chars. One chained regexp_replace per kind — Catalyst
    folds the chain into a single projection, no intermediate rows."""
    out = c
    for kind in PII_PATTERNS:  # canonical order, not caller order
        if kind in kinds:
            pattern, token = PII_PATTERNS[kind]
            out = F.regexp_replace(out, F.lit(pattern), F.lit(token))
    return out


def pii_report(c: Column) -> Column:
    """Struct of per-kind counts + total — the audit row a curation
    run logs per document before dropping/scrubbing."""
    counts = {k: pii_count(c, k) for k in PII_PATTERNS}
    total = None
    for col in counts.values():
        total = col if total is None else total + col
    return F.struct(
        *[col.alias(k) for k, col in counts.items()],
        total.alias("total"),
    )
