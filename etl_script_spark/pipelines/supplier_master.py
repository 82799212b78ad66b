"""Supplier-master mapping-sheet pipeline (SURVEY.md B8 shape).

The reference maps 44 Thai-named columns to English
(services/supplier_processor.py:5-52 — a config vocabulary; the
mechanism here takes any such map), then normalizes two date columns
with DIFFERENT policies on the same sheet:

- ``registration_date`` arrives as Excel serial ints whose decoded
  year is BUDDHIST — the serial→date conversion must subtract 543
  from the RESULT (excel_serial_to_date supplier_processor.py:89-97).
- ``start_effective_date`` arrives as mixed ``d/m/BE`` strings or
  serials, strict >2500 BE policy (fix_buddhist_year :53-87).

This is SURVEY §7.4 watch-list 2 in the flesh: both calendar policies
live in one pipeline, chosen per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_script_spark.functions import dates
from etl_script_spark.operators.canonicalize import rename_columns

# Representative TH→EN columns (mechanism contract; the reference's
# full 44-entry vocabulary plugs in unchanged)
TH_TO_EN_SUPPLIER = {
    "รหัสผู้ขาย": "supplier_code",
    "ชื่อผู้ขาย": "supplier_name",
    "เลขประจำตัวผู้เสียภาษี": "tax_id",
    "วันที่จดทะเบียน": "registration_date",
    "วันที่เริ่มใช้": "start_effective_date",
    "วงเงินเครดิต": "credit_limit",
}


def mixed_be_date(c) -> F.Column:
    """fix_buddhist_year: 'd/m/Y' strings with the STRICT >2500 BE
    policy, or bare Excel serials (no BE shift on the serial branch)."""
    s = F.trim(c.cast("string"))
    is_serial = s.rlike(r"^\d+$")
    d = F.regexp_extract(s, r"^(\d{1,2})/(\d{1,2})/(\d{3,4})$", 1).try_cast("int")
    m = F.regexp_extract(s, r"^(\d{1,2})/(\d{1,2})/(\d{3,4})$", 2).try_cast("int")
    y = F.regexp_extract(s, r"^(\d{1,2})/(\d{1,2})/(\d{3,4})$", 3).try_cast("int")
    y_fixed = F.when(y > 2500, y - 543).otherwise(y)
    return F.when(
        is_serial, dates.excel_serial_to_date(s)
    ).otherwise(dates.safe_make_date(y_fixed, m, d))


def clean_supplier_master(
    raw: DataFrame, th_to_en: dict[str, str] | None = None
) -> DataFrame:
    """Thai sheet → typed supplier rows: P1 rename map, the
    BE-adjusting serial decode on registration_date, the mixed-policy
    parse on start_effective_date."""
    df = rename_columns(raw, th_to_en or TH_TO_EN_SUPPLIER)
    return df.select(
        F.col("supplier_code"),
        F.col("supplier_name"),
        F.col("tax_id"),
        dates.excel_serial_to_date(
            F.col("registration_date"), be_adjust=True
        ).alias("registration_date"),
        mixed_be_date(F.col("start_effective_date")).alias(
            "start_effective_date"
        ),
        F.col("credit_limit").try_cast("double").alias("credit_limit"),
    )
