"""PO report pipelines (SURVEY.md §3, B4/B5 fixture shapes).

Two generations of purchase-order exports:

- ``clean_po_records`` — the current PO detail report
  (read_po_csv_to_json.py:191-297, ImportPoReport.php:79-108):
  header-echo re-label rows, 12h AM/PM send timestamps including the
  '12 AM → 00' and 'hour≥13 with PM' dirt (F4), day-first order
  dates, per-file header-cell metadata broadcast (F27).
- ``clean_po_old_records`` — the legacy CSV
  (po_old_processor.py:81-174): column-name variants (P1), mixed
  '1/2/68' 2-digit-BE / '2568-02-01' / '01.02.2568' dates (F8),
  amount-excluding-VAT derived when zero (F25).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_script_spark.functions import dates, numerics
from etl_script_spark.operators import lineparse
from etl_script_spark.operators.canonicalize import fuzzy_rename_columns

PO_CANON = {
    "pono": "po_no",
    "buyercode": "buyer_code",
    "buyername": "buyer_name",
    "suppliercode": "supplier_code",
    "suppliername": "supplier_name",
    "orderdate": "order_date",
    "senddate": "send_date",
    "deliverydate": "delivery_date",
    "amountpoincludevat": "amount_incl_vat",
    "status": "status",
}

PO_OLD_CANON = {
    "#suppliername": "supplier_name",  # canon fold keeps the '#'
    "suppliername": "supplier_name",
    "pono": "po_no",
    "podate": "po_date",
    "poamountexcludevat": "amount_excl_vat",
    "povatamount": "vat_amount",
    "ponetamountincludevat": "amount_incl_vat",
    "poshipmentdate": "shipment_date",
    "popaymentterm": "payment_term",
}


def clean_po_records(
    raw: DataFrame, file_metadata: dict[str, dict[str, str]] | None = None
) -> DataFrame:
    """B4: canonicalize keys (P2), drop header-echo rows (P5 re-label
    case: first data row repeats the header), parse day-first order
    dates (F3/F8) and 12h AM/PM send timestamps (F4), attach per-file
    fixed-cell metadata (F27)."""
    df = fuzzy_rename_columns(raw, PO_CANON)
    # coalesce: NULL != 'po no.' is NULL and would silently DROP rows
    # with a missing PO number instead of letting validation see them
    df = df.filter(
        F.coalesce(F.lower(F.col("po_no")) != "po no.", F.lit(True))
    )
    send_24h = dates.twelve_to_24h(
        F.regexp_extract(F.col("send_date"), r"(\d{1,2}:\d{2}(:\d{2})?\s*[AP]M)", 1)
    )
    send_day = F.regexp_extract(F.col("send_date"), r"^(\S+)", 1)
    out = df.select(
        F.col("po_no"),
        F.col("buyer_code"),
        F.col("supplier_code"),
        dates.be_date_fix(
            dates.parse_date_cascade(
                F.col("order_date"), formats=("d/M/yyyy", "yyyy-M-d")
            )
        ).alias("order_date"),
        F.try_to_timestamp(
            F.concat_ws(" ", dates.be_date_fix(
                dates.parse_date_cascade(send_day, formats=("M/d/yyyy", "d/M/yyyy"))
            ).cast("string"), send_24h)
        ).alias("send_date"),
        numerics.clean_numeric_basic(F.col("amount_incl_vat")).alias(
            "amount_incl_vat"
        ),
        F.col("status"),
        F.col("source_file") if "source_file" in df.columns else F.lit(None).alias("source_file"),
    )
    if file_metadata:
        out = lineparse.broadcast_file_metadata(out, "source_file", file_metadata)
    return out


def clean_po_old_records(raw: DataFrame) -> DataFrame:
    """B5: legacy PO rows — rename-map canonicalization (P1), the F8
    day-first/BE/2-digit-year date normalization on po_date, and the
    F25 derived measure (excl = incl − vat when excl is 0)."""
    df = fuzzy_rename_columns(raw, PO_OLD_CANON)
    excl = numerics.clean_numeric_basic(F.col("amount_excl_vat"))
    incl = numerics.clean_numeric_basic(F.col("amount_incl_vat"))
    vat = numerics.clean_numeric_basic(F.col("vat_amount"))
    return df.select(
        F.col("supplier_name"),
        F.col("po_no"),
        dates.dayfirst_normalize(F.col("po_date")).alias("po_date"),
        numerics.derived_excl_vat(excl, incl, vat).alias("amount_excl_vat"),
        vat.alias("vat_amount"),
        incl.alias("amount_incl_vat"),
        F.col("payment_term").try_cast("int").alias("payment_term"),
    )
