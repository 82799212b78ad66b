"""DBD financial-statement pipeline (SURVEY.md §3.1, the flagship).

bronze (wide Excel shape, all strings) → silver (long typed rows per
(tax_id, fiscal_year, item_en)) → gold (pivoted per-year tables,
upsert-merged) → query surface (point lookup / all-years map).

Scale: silver derivation is narrow (no shuffle — unpivot + expressions
fan out per input row); the only shuffles are the gold pivot's groupBy
(keyed on (tax_id, fiscal_year) — high cardinality, even) and the
upsert anti-join. Store gold partitioned by fiscal_year so the P12
point queries prune to one partition.

Ref: script_read_dbd_balance.py:225-285 (silver),
ImportDbdFinancial.php:185-288 (gold), PublicApiController.php:779-985
(queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_script_spark.functions import dates, numerics, strings
from etl_script_spark.operators import merge as merge_ops
from etl_script_spark.operators import reshape, rowfilters

# Representative TH→EN item map (the contract is the *mapping
# operation*; the reference hard-codes a 12-item balance map at
# script_read_dbd_balance.py:28-41 and income/ratio maps at
# script_read_dbd_income.py:109-128, script_read_dbd_ratios.py:89-105).
TH_TO_EN_BALANCE = {
    "สินทรัพย์หมุนเวียน": "current_assets",
    "สินทรัพย์รวม": "total_assets",
    "หนี้สินหมุนเวียน": "current_liabilities",
    "หนี้สินรวม": "total_liabilities",
    "ส่วนของผู้ถือหุ้น": "shareholders_equity",
}
TH_TO_EN_INCOME = {
    "รายได้รวม": "total_revenue",
    "ต้นทุนขาย": "cost_of_sales",
    "กำไรขาดทุน ขั้นต้น": "gross_profit",
    "กำไรขาดทุน สุทธิ": "net_profit",
}

BALANCE_ITEMS = list(TH_TO_EN_BALANCE.values())
INCOME_ITEMS = list(TH_TO_EN_INCOME.values())


def silver_from_wide(
    wide: DataFrame,
    year_pairs: dict[str, str],
    th_to_en: dict[str, str],
    item_col: str = "item_th",
    file_col: str = "_file",
    zero_coerce: bool = True,
) -> DataFrame:
    """Wide per-year statement → long silver rows.

    Steps (all narrow): P11 noise-label drop → R1 year-pair unpivot →
    F26 tax_id from filename → F1 BE year → CE → F10 accounting
    numeric clean → F16 label normalization → TH→EN mapping → F15
    zero-coercion (balance policy) or all-null-drop (income policy).
    """
    base = rowfilters.drop_noise_labels(wide, item_col)

    long = reshape.unpivot_year_pairs(
        base.select(
            item_col,
            file_col,
            *[
                numerics.clean_numeric_accounting(F.col(c)).alias(c)
                for pair in year_pairs.items()
                for c in pair
                if c
            ],
        ),
        [item_col, file_col],
        year_pairs,
    )

    mapping = F.create_map(
        *[F.lit(x) for th, en in th_to_en.items() for x in (th, en)]
    )
    item_norm = strings.norm_ws(F.col(item_col))
    out = long.select(
        strings.filename_extract(
            F.col(file_col), r"(\d{13})_[a-z]+\.(xlsx?|xls)$"
        ).alias("tax_id"),
        dates.be_to_ce_year(F.col("year")).alias("fiscal_year"),
        F.coalesce(mapping[item_norm], item_norm).alias("item_en"),
        F.col("amount"),
        F.col("pct_change"),
    )
    if zero_coerce:  # balance policy: null amounts → 0.0
        out = out.withColumn("amount", numerics.zero_if_null(F.col("amount")))
    else:  # income policy: rows with no amount at all drop
        out = out.filter(F.col("amount").isNotNull())
    return out


def gold_pivot(silver: DataFrame, items: list[str]) -> DataFrame:
    """R2: silver long rows → one gold row per (tax_id, fiscal_year)
    with declared item columns (last wins on duplicates)."""
    return reshape.pivot_items(
        silver, ["tax_id", "fiscal_year"], "item_en", "amount", items
    )


def merge_gold(target: DataFrame, incoming: DataFrame) -> DataFrame:
    """J6: upsert the new batch's (tax_id, fiscal_year) rows into the
    stored gold table."""
    return merge_ops.upsert(target, incoming, ["tax_id", "fiscal_year"])


def import_gate(
    financial: DataFrame, company_parent: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """J2: only statements whose tax_id exists in the company parent
    import; the rest become the skip report."""
    ok = merge_ops.exists_in(financial, company_parent, {"tax_id": "registered_no"})
    skipped = merge_ops.missing_parent(
        financial, company_parent, {"tax_id": "registered_no"}
    )
    return ok, skipped


def company_financial(
    gold: DataFrame, tax_id: str, fiscal_year: int, cols: list[str]
) -> DataFrame:
    """P12/P13: the point-lookup query — keyed filter + fixed float
    projection (PublicApiController.php:799-854)."""
    return gold.filter(
        (F.col("tax_id") == tax_id) & (F.col("fiscal_year") == fiscal_year)
    ).select(
        "tax_id",
        "fiscal_year",
        *[F.col(c).cast("double").alias(c) for c in cols],
    )


def company_financial_all_years(
    gold: DataFrame, tax_id: str, year_from: int, year_to: int, cols: list[str]
) -> DataFrame:
    """R3: per-year map response for the all-years endpoint
    (PublicApiController.php:884-985)."""
    ranged = gold.filter(
        (F.col("tax_id") == tax_id)
        & (F.col("fiscal_year") >= year_from)
        & (F.col("fiscal_year") <= year_to)
    )
    return reshape.pivoted_year_map(ranged, "tax_id", "fiscal_year", cols)
