"""BOL API sync pipeline (SURVEY.md §3, B10 fixture shape).

payload records → typed columns (F23 range parse, F1 BE dates, F22
name split) → directors diff-sync (J4: upsert incoming, delete
missing), per-company fiscal-year replace-all (J5), financial upsert
(J6). Ref: BolApiController.php:130-410.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_script_spark.functions import dates, strings
from etl_script_spark.operators import merge as merge_ops


def clean_company(payload: DataFrame) -> DataFrame:
    """searchResults record → typed company row: credit range string
    split to numeric bounds (F23), BE registration date → CE (F1)."""
    rng = strings.parse_range(F.col("companyCredit"))
    return payload.select(
        F.col("registrationNo").alias("registration_no"),
        rng["start"].alias("credit_min"),
        rng["end"].alias("credit_max"),
        dates.be_date_fix(
            dates.parse_date_cascade(
                F.col("registeredDate"), formats=("d/M/yyyy", "yyyy-M-d")
            )
        ).alias("registered_date"),
    )


def clean_directors(payload_directors: DataFrame) -> DataFrame:
    """director name strings → (prefix, first, last) natural key rows
    (F22 honorific split; the natural key drives the J4 diff)."""
    parts = strings.split_person_name(F.col("name"))
    return payload_directors.select(
        F.col("registration_no"),
        parts["prefix"].alias("prefix"),
        parts["first_name"].alias("first_name"),
        parts["last_name"].alias("last_name"),
    )


def sync_directors(current: DataFrame, incoming: DataFrame) -> DataFrame:
    """J4 scoped to the companies present in the payload: incoming
    rows are the new truth for those companies (adds + deletes);
    companies not in the payload keep their rows.
    Ref: BolApiController.php:201-249."""
    return merge_ops.diff_sync_scoped(
        current,
        incoming,
        "registration_no",
        ["registration_no", "prefix", "first_name", "last_name"],
    )


def sync_financials(current: DataFrame, incoming: DataFrame) -> DataFrame:
    """J5/J6: upsert the payload's (registration_no, fiscal_year) rows
    AND delete stored years the payload no longer carries, per synced
    company. Ref: BolApiController.php:332-336,404-409."""
    return merge_ops.keyed_replace_all(
        current, incoming, "registration_no", "fiscal_year"
    )
