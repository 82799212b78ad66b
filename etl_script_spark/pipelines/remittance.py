"""Remittance OCR-lines pipeline (SURVEY.md §3, B6 fixture shape).

page text lines → fixed-format regex cascade (F31) → OCR branch/code
repairs (F19) → accounting-amount parse (F10) → composite-key dedup
across passes/pages (D1) → grand-total reconciliation (A1).

Ref: pdf_ocr_rm_to_json.py:257-445.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_script_spark.functions import numerics, strings
from etl_script_spark.operators import lineparse, quality
from etl_script_spark.operators import merge as merge_ops

LINE_PATTERNS = [
    # strict: date branch type doc ref amount
    (
        r"^(\d{2}/\d{2}/\d{4})\s+(\S+)\s+(IV|CN)\s+(\S+)\s+(\S+)\s+([\d,().−–—-]+)$",
        ["date", "branch", "doc_type", "doc_no", "ref_no", "amount_raw"],
    ),
    # no-branch fallback → branch defaults '0000' downstream
    (
        r"^(\d{2}/\d{2}/\d{4})\s+(IV|CN)\s+(\S+)\s+(\S+)\s+([\d,().−–—-]+)$",
        ["date", "doc_type", "doc_no", "ref_no", "amount_raw"],
    ),
]

GRAND_TOTAL_RX = r"GRAND TOTAL Amount\s+([\d,().-]+)"


_FC_RX = r"F\s*C[^0-9]*([0-9])[^0-9]*([0-9])?"
_W_RX = r"W[^0-9]*([0-9])[^0-9]*([0-9])[^0-9]*([0-9])"


def repair_branch(c) -> F.Column:
    """F19: OCR branch-code repairs, token-level reference semantics
    (pdf_ocr_rm_to_json.py:126-161): O→0/I→1 then uppercase, strip
    non-alnum noise, '0000' anywhere wins, FC+2 digits → FC##,
    FC+1 digit → FC0#, W+3 digits → W### (all tolerant of interior
    spaces: 'F C 1' → 'FC01', 'W 9 0 1' → 'W901')."""
    s = F.upper(F.translate(c.cast("string"), "oOiI", "0011"))
    s_clean = F.regexp_replace(s, r"[^A-Z0-9 ]", "")
    fc1 = F.regexp_extract(s_clean, _FC_RX, 1)
    fc2 = F.regexp_extract(s_clean, _FC_RX, 2)
    w1 = F.regexp_extract(s_clean, _W_RX, 1)
    w2 = F.regexp_extract(s_clean, _W_RX, 2)
    w3 = F.regexp_extract(s_clean, _W_RX, 3)
    return (
        F.when(s_clean.contains("0000"), F.lit("0000"))
        .when(
            fc1 != "",
            F.when(fc2 != "", F.concat(F.lit("FC"), fc1, fc2)).otherwise(
                F.concat(F.lit("FC0"), fc1)
            ),
        )
        .when(w1 != "", F.concat(F.lit("W"), w1, w2, w3))
        .otherwise(F.trim(s_clean))
    )


def parse_remittance_lines(pages: DataFrame) -> DataFrame:
    """pages(page_number, text) → typed transaction rows with page
    provenance, deduped on the composite key across pages."""
    lines = lineparse.explode_lines(pages, "text", ["page_number"])
    parsed = lineparse.parse_line_cascade(F.col("line"), LINE_PATTERNS)
    tx = (
        lines.withColumn("p", parsed)
        .filter(F.col("p").isNotNull())
        .select(
            "page_number",
            "line_no",
            F.col("p.date").alias("tx_date"),
            repair_branch(F.coalesce(F.col("p.branch"), F.lit("0000"))).alias(
                "branch"
            ),
            F.col("p.doc_type").alias("doc_type"),
            strings.ocr_repair_tail_digits(F.col("p.doc_no")).alias("doc_no"),
            F.col("p.ref_no").alias("ref_no"),
            numerics.clean_numeric_accounting(F.col("p.amount_raw")).alias("amount"),
        )
    )
    # D1: same transaction seen on multiple passes/pages → keep first
    # in (page, line) stamped order
    tx = tx.withColumn(
        "__ord", F.struct(F.col("page_number"), F.col("line_no"))
    )
    deduped = merge_ops.dedupe_first(
        tx,
        ["tx_date", "branch", "doc_type", "doc_no", "ref_no", "amount"],
        order_col="__ord",
    )
    return deduped.drop("__ord")


def extract_grand_totals(pages: DataFrame) -> DataFrame:
    """A1 companion: the upstream-printed grand total per page."""
    return pages.select(
        "page_number",
        numerics.clean_numeric_accounting(
            strings.header_field_extract(F.col("text"), GRAND_TOTAL_RX)
        ).alias("grand_total"),
    ).filter(F.col("grand_total").isNotNull())


def reconcile(pages: DataFrame) -> DataFrame:
    """A1: recomputed per-page transaction sums vs printed totals."""
    tx = parse_remittance_lines(pages)
    totals = extract_grand_totals(pages)
    return quality.reconcile_totals(
        tx, ["page_number"], "amount", totals, "grand_total"
    )
