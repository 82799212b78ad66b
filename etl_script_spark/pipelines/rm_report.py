"""Remittance-advice fixed-format report pipeline (SURVEY.md §2.3
F32, B7 fixture shape).

Fixed-position records — ``remittance_no(10d) supplier+branch date
date HH:MM:SS AM|PM amount status seq supplier_code pay_date`` — with
~10% of records split across two physical lines. Spark shape: explode
lines with ordinals, lead()-merge continuations, token-spacing
normalization, one full-record regex, then field typing. The date
conversion is the reference's literal string reshuffle (no BE
adjustment at this call site) and the time keeps its HH:MM:SS verbatim
(the stray AM/PM suffix is dropped, not applied — 16:18:12 PM means
16:18:12).

Ref: pdf_ocr_rm_report_to_json.py:23-158.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_script_spark.operators import lineparse

RECORD_RX = (
    r"^(\d{10})\s+"
    r"(.+?)\s+"
    r"(\d{2}/\d{2}/\d{4})\s+"
    r"(\d{2}/\d{2}/\d{4})\s+"
    r"(\d{2}:\d{2}:\d{2})\s+(?:AM|PM)\s+"
    r"([0-9,]+\.\d{2})\s+"
    r"(Open|Closed|OPEN|CLOSED|New|NEW)\s+"
    r"(\d+)\s+"
    r"(\d+)\s+"
    r"(\d{2}/\d{2}/\d{4})$"
)
RECORD_FIELDS = [
    "remittance_no",
    "name_branch",
    "date1",
    "date2",
    "time_hms",
    "amount_raw",
    "status",
    "seq",
    "supplier_code",
    "pay_date_raw",
]


def normalize_record_line(line) -> F.Column:
    """Token-spacing normalization (pdf_ocr_rm_report_to_json.py:
    34-55): split the 10-digit prefix from a glued name, pad spaces
    around dates / times / amounts, collapse whitespace."""
    s = line.cast("string")
    s = F.regexp_replace(s, r"^(\d{10})(\S)", r"$1 $2")
    s = F.regexp_replace(s, r"(\d{2}/\d{2}/\d{4})", r" $1 ")
    s = F.regexp_replace(s, r"(\d{2}:\d{2}:\d{2}\s+(?:AM|PM))", r" $1 ")
    s = F.regexp_replace(s, r"([0-9,]+\.\d{2})", r" $1 ")
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def dmy_to_iso(c) -> F.Column:
    """convert_date (:23-29): 'DD/MM/YYYY' → 'YYYY-MM-DD' string
    reshuffle, no calendar math."""
    return F.concat_ws(
        "-",
        F.substring(c, 7, 4),
        F.substring(c, 4, 2),
        F.substring(c, 1, 2),
    )


def parse_rm_report(pages: DataFrame) -> DataFrame:
    """pages(page_number, text) → typed remittance-advice records.

    Two-line records merge first (a record-start line with no date
    absorbs its successor — lead() over the stamped order), then the
    single full-record regex extracts every field."""
    lines = lineparse.explode_lines(pages, "text", ["page_number"])
    merged = lineparse.merge_continuation_lines(
        lines,
        ["page_number"],
        start_pattern=r"^\d{10}(?!.*\d{2}/\d{2}/\d{4})",
        continuation_pattern=r"^(?!\d{10})",
    )
    norm = merged.select(
        "page_number",
        "line_no",
        normalize_record_line(F.col("line")).alias("line"),
    )
    parsed = lineparse.parse_line_cascade(
        F.col("line"), [(RECORD_RX, RECORD_FIELDS)]
    )
    rec = norm.withColumn("p", parsed).filter(F.col("p").isNotNull())
    name_branch = F.trim(F.col("p.name_branch"))
    tokens = F.split(name_branch, r"\s+")
    has_branch = F.size(tokens) >= 2
    return rec.select(
        "page_number",
        F.col("p.remittance_no").alias("remittance_no"),
        F.when(
            has_branch, F.array_join(F.slice(tokens, 1, F.size(tokens) - 1), " ")
        ).otherwise(name_branch).alias("supplier_name"),
        F.when(has_branch, F.element_at(tokens, -1)).otherwise(F.lit("")).alias(
            "branch"
        ),
        dmy_to_iso(F.col("p.date1")).alias("remittance_date"),
        F.concat_ws(
            " ", dmy_to_iso(F.col("p.date2")), F.col("p.time_hms")
        ).alias("sent_date"),
        F.regexp_replace(F.col("p.amount_raw"), ",", "")
        .try_cast("double")
        .alias("amount"),
        F.col("p.status").alias("status"),
        F.col("p.seq").try_cast("int").alias("sequence"),
        F.col("p.supplier_code").alias("supplier_code"),
        dmy_to_iso(F.col("p.pay_date_raw")).alias("pay_date"),
    )
