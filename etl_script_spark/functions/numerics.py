"""Numeric cleaning functions (SURVEY.md §2.3 F9-F15, F25, F28).

All tolerant parses use try_cast (NULL on garbage) to mirror the
reference's "failure → 0/None" behavior under Spark 4 ANSI mode.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from etl_script_spark.functions.exprs import let

# Dash-like glyphs the reference maps to zero (po_processor.py:28-36)
_DASHES = ("-", "–", "—", "−", "")


def clean_numeric_basic(c: Column, default: float = 0.0) -> Column:
    """F9: strip commas/spaces; '-', '–', '' → default; parse failure →
    default. Ref: clean_numeric po_processor.py:28-36,
    inv_processor.py:54-64.
    """
    def body(s: Column) -> Column:
        def inner(stripped: Column) -> Column:
            return F.when(
                s.isNull() | stripped.isin(*_DASHES), F.lit(default)
            ).otherwise(
                F.coalesce(stripped.try_cast("double"), F.lit(default))
            )

        return let(F.regexp_replace(s, r"[,\s]", ""), inner)

    # let-bound (see clean_numeric_accounting)
    return let(F.trim(c.cast("string")), body)


def clean_numeric_accounting(c: Column) -> Column:
    """F10: accounting-style numeric clean — '(123)' → -123; unicode
    minus variants → '-'; inner thousands spaces '1 171.37' → 1171.37;
    commas stripped; dash/empty → NULL (caller picks zero-policy F15).

    Ref: coerce_numeric script_read_dbd_balance.py:55-80,
    parse_amount pdf_ocr_rm_to_json.py:31-64.
    """
    def outer(s: Column) -> Column:
        neg = s.rlike(r"^\(.*\)$") | s.startswith("-")
        stripped = F.regexp_replace(
            F.regexp_replace(s, r"[()\-]", ""), r"[,\s ]", ""
        )

        def inner(val: Column) -> Column:
            return F.when(val.isNull(), F.lit(None).cast("double")).otherwise(
                F.when(neg, -val).otherwise(val)
            )

        return let(stripped.try_cast("double"), inner)

    # unicode minus family → ascii; s and the parsed value are each
    # let-BOUND: an inlined input subtree re-evaluates per reference
    # once CollapseProject fans it out (see exprs.let) — callers feed
    # regexp-extracted fields here, so the fan-out is multiplicative
    return let(F.translate(F.trim(c.cast("string")), "−—–", "---"), outer)


def clean_numeric_percent(c: Column) -> Column:
    """F11: '12.3%' → 12.3 (NOT /100); dash/zero variants → 0.0.

    Ref: script_read_dbd_ratios.py:51-74.
    """
    def body(s: Column) -> Column:
        def inner(stripped: Column) -> Column:
            return F.when(
                s.isNull() | stripped.isin(*_DASHES), F.lit(0.0)
            ).otherwise(F.coalesce(stripped.try_cast("double"), F.lit(0.0)))

        return let(F.regexp_replace(s, r"[,%\s]", ""), inner)

    return let(F.trim(c.cast("string")), body)


def clean_numeric_locale(c: Column) -> Column:
    """F12: locale-ambiguous numeric — decide whether '.'/',' are
    thousands or decimal separators by counts and last position:
    '1.357.000,50' → 1357000.50, '1,234.56' → 1234.56, '1.234' →
    1234 (thousands), '12,5' → 12.5 (decimal comma).

    Deterministic when-tree, no UDF. Ref: to_float_robust
    pdf_ocr_sale_supplier_to_json.py:129-191.
    """
    def body(s: Column) -> Column:
        n_dot = F.length(s) - F.length(F.regexp_replace(s, r"\.", ""))
        n_com = F.length(s) - F.length(F.regexp_replace(s, ",", ""))
        last_dot = F.length(s) - F.locate(".", F.reverse(s)) + 1
        last_com = F.length(s) - F.locate(",", F.reverse(s)) + 1
        # both present: later one is the decimal separator
        dot_decimal = F.regexp_replace(s, ",", "")
        com_decimal = F.regexp_replace(F.regexp_replace(s, r"\.", ""), ",", ".")
        both = F.when(last_dot > last_com, dot_decimal).otherwise(com_decimal)
        # comma only: single comma w/ 1-2 trailing digits → decimal; else thousands
        com_tail = F.length(s) - last_com
        com_only = F.when(
            (n_com == 1) & (com_tail.isin(1, 2)),
            F.regexp_replace(s, ",", "."),
        ).otherwise(F.regexp_replace(s, ",", ""))
        # dot only: >1 dot → thousands; single dot w/ exactly 3 trailing
        # digits and >=4 total digits → thousands; else decimal
        dot_tail = F.length(s) - last_dot
        n_digits = F.length(F.regexp_replace(s, r"\D", ""))
        dot_only = F.when(
            (n_dot > 1)
            | (
                (n_dot == 1)
                & (dot_tail == 3)
                & (n_digits >= 4)
                & (last_dot > 1)
            ),
            F.regexp_replace(s, r"\.", ""),
        ).otherwise(s)
        cleaned = (
            F.when((n_dot > 0) & (n_com > 0), both)
            .when(n_com > 0, com_only)
            .when(n_dot > 0, dot_only)
            .otherwise(s)
        )
        return cleaned.try_cast("double")

    # s is referenced ~20 times across the when-tree — let-bound so
    # the upstream expression evaluates once, not 20 times
    return let(
        F.regexp_replace(F.trim(c.cast("string")), r"[\s ]", ""), body
    )


def repair_multi_dot(c: Column) -> Column:
    """F13: if a numeric string has >1 dot, remove all dots and
    reinsert the LAST one as the decimal point: '1.234.56' → 1234.56.

    Ref: ImportInvoiceReport.php:476-498, ImportRmReport.php:226-245.
    """
    def body(s: Column) -> Column:
        n_dot = F.length(s) - F.length(F.regexp_replace(s, r"\.", ""))

        def with_tail(tail: Column) -> Column:
            # prefix = all-but-last-segment with its dots removed
            seg_prefix = F.regexp_replace(
                F.substring(
                    s, F.lit(1), F.length(s) - F.length(tail) - F.lit(1)
                ),
                r"\.",
                "",
            )
            return F.concat(seg_prefix, F.lit("."), tail)

        repaired = let(F.substring_index(s, ".", -1), with_tail)
        return F.when(n_dot > 1, repaired).otherwise(s)

    return let(F.regexp_replace(F.trim(c.cast("string")), r"[,\s]", ""), body)


def zero_if_null(c: Column) -> Column:
    """F15: zero-coercion policy (balance-sheet flavor): NULL → 0.0.

    Ref: script_read_dbd_balance.py:246-251.
    """
    return F.coalesce(c.cast("double"), F.lit(0.0))


def derived_excl_vat(excl: Column, incl: Column, vat: Column) -> Column:
    """F25: amount_excl_vat = incl − vat when excl == 0, else excl.

    Ref: ImportOldPO.php:151-153.
    """
    return F.when(excl == 0, incl - vat).otherwise(excl)


def round_money(c: Column) -> Column:
    """F28: money rounding policy — 2 decimal places.

    Ref: pdf_ocr_sale_supplier_to_json.py:319-332, GecInvoice.php:27-31.
    """
    return F.round(c.cast("double"), 2)


def money_at_rest(c: Column) -> Column:
    """Money at-rest type policy (SURVEY §1.2): amounts land in
    storage as DECIMAL(15,2) — the reference's DDL type
    (create_gec_inv_2024_table.php:20-22, Eloquent decimal:2 casts
    GecInvoice.php:27-31) — while in-flight math stays double
    (``round_money``). The decimal is built from integer CENTS
    (round(x*100) as long), never by casting the double directly, so
    the stored value is exact and engine-portable: a double→decimal
    cast would bake the double's representation error into storage.
    Overflow past 13 integer digits is a data bug and throws under
    ANSI, matching the DDL's own range."""
    cents = F.round(c.cast("double") * 100).cast("long")
    return (cents.cast("decimal(15,2)") / 100).cast("decimal(15,2)")


def round_qty(c: Column) -> Column:
    """F28: quantity rounding policy — 3 decimal places."""
    return F.round(c.cast("double"), 3)


def int_if_integral(c: Column) -> Column:
    """F14: integral floats render without the '.0' suffix in JSON
    output ('5.0' → '5', '5.25' stays '5.25') — a string-formatting
    policy, applied at sink time.

    Ref: bs_processor.py:105-106, ic_processor.py:69-70.
    """
    def body(d: Column) -> Column:
        return F.when(
            d.isNotNull() & (d == F.floor(d)),
            F.floor(d).cast("long").cast("string"),
        ).otherwise(d.cast("string"))

    return let(c.cast("double"), body)
