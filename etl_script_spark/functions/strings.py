"""String cleaning / extraction functions (SURVEY.md §2.3 F16-F24,
F26, F29, F30) as native Column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from etl_script_spark.functions.exprs import let

# Zero-width + NBSP family stripped by the reference
# (script_read_dbd_income.py:131-135, PublicApiController.php:713-715)
ZERO_WIDTH = "​‌‍⁠﻿"
NBSP = " "


def norm_ws(c: Column) -> Column:
    """F16: collapse runs of whitespace to one space and trim; strip
    zero-width characters and NBSP; fold CJK fullwidth parens to ASCII.

    Ref: norm_ws pdf_ocr_inv_to_json.py:56-57, _canon_title
    script_read_dbd_income.py:130-143, normalize_th
    script_read_dbd_balance.py:49-53.
    """
    s = c.cast("string")
    s = F.translate(s, ZERO_WIDTH, "")
    s = F.translate(s, "（）", "()")
    s = F.regexp_replace(s, NBSP, " ")
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def ocr_repair_tail_digits(c: Column, prefix_pattern: str = r"^([A-Za-z]+)") -> Column:
    """F18: in PREFIX+digits ids, replace lookalikes l/L/i/I→1, o/O→0
    ONLY in the tail after the alpha prefix; uppercase the prefix.

    Ref: normalize_invoice_no_tail_digits pdf_ocr_inv_to_json.py:196-220.
    """
    def body(s: Column) -> Column:
        def with_prefix(prefix: Column) -> Column:
            tail = F.substring(s, F.length(prefix) + F.lit(1), F.length(s))
            repaired_tail = F.translate(tail, "lLiIoO", "111100")
            return F.when(
                prefix != "", F.concat(F.upper(prefix), repaired_tail)
            ).otherwise(s)

        return let(F.regexp_extract(s, prefix_pattern, 1), with_prefix)

    # let-bound: s and prefix each fan out to several references (see
    # exprs.let — an inlined subtree re-evaluates per reference)
    return let(F.trim(c.cast("string")), body)


def ocr_repair_digits(c: Column) -> Column:
    """F19 (subset): whole-token lookalike repair O→0, I→1 (keep L).

    Ref: pdf_ocr_rm_to_json.py:118-124.
    """
    return F.translate(c.cast("string"), "OI", "01")


def extract_digit_run(c: Column, min_len: int = 8, max_len: int = 14) -> Column:
    """F20: pull the first min..max-digit run out of free text
    ('PO:1013090869' → '1013090869'); empty match → NULL.

    Ref: fix_related_document pdf_ocr_inv_to_json.py:222-227,
    read_po_csv_to_json.py:83-88.
    """
    return let(
        F.regexp_extract(c.cast("string"), rf"(\d{{{min_len},{max_len}}})", 1),
        lambda hit: F.when(hit == "", F.lit(None).cast("string")).otherwise(
            hit
        ),
    )


def normalize_tax_id(c: Column, width: int = 13) -> Column:
    """F21: strip non-digits, keep the last `width` digits, left-pad
    with zeros to `width`.

    Ref: ImportDbdFinancial.php:149-154.
    """
    digits = F.regexp_replace(c.cast("string"), r"\D", "")
    return F.lpad(F.substring(digits, -width, width), width, "0")


# F22: honorific prefixes, longest-first so นางสาว wins over นาง
# (the reference has a precedence bug in one copy —
#  BolApiController.php:491-493; we implement the correct order per
#  PublicApiController.php:711-749).
HONORIFICS = (
    "ผศ.ดร.", "รศ.ดร.", "ศ.ดร.", "นางสาว", "ว่าที่ ร.ต.", "ดร.",
    "นาย", "นาง", "น.ส.", "Mrs.", "Miss", "Mr.", "Ms.", "Dr.",
)


def split_person_name(c: Column) -> Column:
    """F22: Thai/EN name split → struct(prefix, first_name, last_name).

    Strips zero-width chars, matches the honorific prefix list
    longest-first anchored at ^, then splits first/last on the first
    space. Ref: PublicApiController.php:711-749.
    """
    s = norm_ws(c)
    alternation = "|".join(
        sorted((p.replace(".", r"\.") for p in HONORIFICS), key=len, reverse=True)
    )
    pat = rf"^({alternation})\s*"
    prefix = F.regexp_extract(s, pat, 1)
    rest = F.trim(F.regexp_replace(s, pat, ""))
    first = F.when(
        F.instr(rest, " ") > 0, F.substring_index(rest, " ", 1)
    ).otherwise(rest)
    last = F.when(
        F.instr(rest, " ") > 0,
        F.trim(F.substring(rest, F.length(first) + F.lit(2), F.length(rest))),
    ).otherwise(F.lit(""))
    return F.struct(
        F.when(prefix == "", F.lit(None).cast("string"))
        .otherwise(prefix)
        .alias("prefix"),
        first.alias("first_name"),
        last.alias("last_name"),
    )


def parse_range(c: Column) -> Column:
    """F23: '"a - b"' → struct(start double, end double); a single
    value → (v, NULL). Ref: BolApiController.php:471-480.
    """
    s = F.trim(c.cast("string"))
    parts = F.split(s, r"\s*-\s*")
    start = (F.element_at(parts, 1)).try_cast("double")
    end = F.when(
        F.size(parts) >= 2, (F.element_at(parts, 2)).try_cast("double")
    ).otherwise(F.lit(None).cast("double"))
    return F.struct(start.alias("start"), end.alias("end"))


NULL_TOKENS = ("", "?", "-", "null", "n/a", "none")


def null_if_empty(c: Column, tokens: tuple[str, ...] = NULL_TOKENS) -> Column:
    """F24: '', '?', NBSP-only, '-', 'null', 'n/a' → NULL.

    Ref: BolApiController.php:414-420, ImportInvoiceReport.php:336-340.
    """
    s = F.trim(F.regexp_replace(c.cast("string"), NBSP, " "))
    return F.when(F.lower(s).isin(*tokens), F.lit(None).cast("string")).otherwise(s)


def filename_extract(c: Column, pattern: str, group: int = 1) -> Column:
    """F26: derive a key column from a file name/path, e.g.
    r'(\\d{13})_income\\.(xlsx?|xls)$' → tax_id.

    Ref: bs_processor.py:71-73, script_read_dbd_income.py:390-394.
    """
    hit = F.regexp_extract(c.cast("string"), pattern, group)
    return F.when(hit == "", F.lit(None).cast("string")).otherwise(hit)


def strip_dot_zero(c: Column) -> Column:
    """F29: '1234.0' → '1234' on code-like columns.

    Ref: ImportSaleInvoiceReport.php:125-134.
    """
    return F.regexp_replace(c.cast("string"), r"\.0+$", "")


def header_field_extract(text: Column, label_pattern: str) -> Column:
    """F30: capture a labeled field out of OCR page text, e.g.
    'วันที่จ่ายเงิน : <value>'. Ref: pdf_ocr_rm_to_json.py:286-294.
    """
    return let(
        F.regexp_extract(text.cast("string"), label_pattern, 1),
        lambda hit: F.when(hit == "", F.lit(None).cast("string")).otherwise(
            F.trim(hit)
        ),
    )


# Thai combining marks (tone/vowel signs) that can never start a line —
# OCR splits them onto a new line; the reference rejoins them.
THAI_COMBINING = "ัิีึืฺุู็่้๊๋์ํ๎"


def rejoin_combining_lines(text: Column) -> Column:
    """F17: rejoin lines that OCR split immediately before a Thai
    combining mark — a newline followed by a combining character is
    deleted so the mark reattaches to its base character.

    Ref: pdf_ocr_dbd_to_json.py:89-94.
    """
    return F.regexp_replace(
        text.cast("string"), "\\n(?=[" + THAI_COMBINING + "])", ""
    )
