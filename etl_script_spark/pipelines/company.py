"""DBD company-structured pipeline (SURVEY.md §3.1 step 3, B9 shape).

Nested company JSON (registration number, business sections, BE filing
years, director array) → company entity upsert, title-card enrichment,
and the directors replace-children sync.

Ref: PublicApiController.php:539-654 (store + mapBodyToCompanyEntity),
pdf_ocr_dbd_to_json.py:371-419 (structured record + title merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_script_spark.functions import dates, strings
from etl_script_spark.operators import merge as merge_ops


def map_company_entity(payload: DataFrame) -> DataFrame:
    """B9 record → company_entity row: tax-id normalization (F21),
    BE filing years → CE ints (F1), nested section structs passed
    through, num_director derived from the array size (A4,
    PublicApiController.php:687)."""
    return payload.select(
        strings.normalize_tax_id(F.col("registration_number")).alias(
            "registered_no"
        ),
        F.col("entity_type"),
        F.col("status"),
        F.col("registered_capital_baht").try_cast("double").alias(
            "registered_capital_baht"
        ),
        F.col("address"),
        F.col("business_section_latest"),
        F.transform(
            F.col("financial_filing_years_th"),
            lambda y: dates.be_to_ce_year(y),
        ).alias("financial_filing_years"),
        F.size(F.col("directors")).alias("num_director"),
        F.col("directors"),
    )


def enrich_with_title_card(
    companies: DataFrame, title_cards: DataFrame, fill_cols: list[str]
) -> DataFrame:
    """J1: broadcast left join against the per-company title-card
    table; fields fill only when absent (coalesce per field,
    pdf_ocr_dbd_to_json.py:399-419)."""
    return merge_ops.enrich_left(
        companies, title_cards, "registered_no", fill_cols
    )


def upsert_companies(current: DataFrame, incoming: DataFrame) -> DataFrame:
    """J6: CompanyEntity::updateOrCreate on registered_no
    (PublicApiController.php:588-591)."""
    return merge_ops.upsert(current, incoming, ["registered_no"])


def directors_long(companies: DataFrame) -> DataFrame:
    """directors array<struct{no,name}> → long rows with the F22
    honorific split applied to each name."""
    d = companies.select(
        "registered_no", F.explode(F.col("directors")).alias("d")
    )
    parts = strings.split_person_name(F.col("d.name"))
    return d.select(
        "registered_no",
        F.col("d.no").alias("director_no"),
        parts["prefix"].alias("prefix"),
        parts["first_name"].alias("first_name"),
        parts["last_name"].alias("last_name"),
    )


def sync_directors(current: DataFrame, incoming: DataFrame) -> DataFrame:
    """J3: replace-children — all director rows of companies present
    in the payload drop and re-insert from the payload
    (PublicApiController.php:605-631)."""
    return merge_ops.replace_children(current, incoming, "registered_no")
