"""Data-quality / metrics operators (SURVEY.md §2.4 A1-A2, §2.2 P9).

The reference tracks import metrics imperatively (counters in PHP
loops). Spark-first: ``DataFrame.observe`` attaches metric aggregates
to the SAME pass that does the work — zero extra scans, collected via
listener or returned Observation (works in batch and streaming).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


@dataclass
class ImportMetrics:
    """Mirrors the reference's import summary block
    (ImportInvoiceReport.php:259-291)."""

    total: int
    inserted: int
    failed_validation: int
    failed_duplicate: int
    fixed_dates: int


def observe_import(
    df: DataFrame,
    valid_pred: Column,
    duplicate_pred: Column,
    fixed_pred: Column | None = None,
) -> tuple[DataFrame, Observation]:
    """A2: attach total / inserted / failed(validation, duplicate) /
    fixed-date counters to a frame. Call an action on the returned
    frame, then read ``observation.get``.

    Ref counters: ImportInvoiceReport.php:107-113,261-269.
    """
    obs = Observation("import_metrics")
    fixed = fixed_pred if fixed_pred is not None else F.lit(False)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("total"),
        F.sum(
            F.when(valid_pred & ~duplicate_pred, 1).otherwise(0)
        ).alias("inserted"),
        F.sum(F.when(~valid_pred, 1).otherwise(0)).alias("failed_validation"),
        F.sum(F.when(valid_pred & duplicate_pred, 1).otherwise(0)).alias(
            "failed_duplicate"
        ),
        F.sum(F.when(fixed, 1).otherwise(0)).alias("fixed_dates"),
    )
    return observed, obs


def reconcile_totals(
    detail: DataFrame,
    group_cols: list[str],
    amount_col: str,
    expected: DataFrame,
    expected_col: str,
    tolerance: float = 0.01,
) -> DataFrame:
    """A1: grand-total reconciliation — recompute sum(amount) per group
    from detail rows and compare to the upstream-extracted total;
    returns per-group rows with ok flag and difference.

    Ref: pdf_ocr_rm_to_json.py:286-290,311-315,474 (grand totals kept
    alongside transactions for checking).
    """
    agg = detail.groupBy(*group_cols).agg(
        F.sum(F.col(amount_col).cast("double")).alias("computed_total")
    )
    joined = agg.join(expected, group_cols, "full_outer")
    diff = F.abs(
        F.coalesce(F.col("computed_total"), F.lit(0.0))
        - F.coalesce(F.col(expected_col).cast("double"), F.lit(0.0))
    )
    return joined.select(
        *group_cols,
        "computed_total",
        F.col(expected_col).alias("expected_total"),
        diff.alias("difference"),
        (diff <= tolerance).alias("ok"),
    )


def rank_calibrate(
    df: DataFrame, id_col: str, stratum_col: str, score: Column
) -> DataFrame:
    """Per-stratum percent-rank calibration of a quality score — the
    cross-domain comparability fix: a raw score of 0.7 means different
    things for web crawl vs curated books, but 'better than 90% of its
    own source' is comparable everywhere, so mixing/filtering can use
    ONE global threshold over the calibrated rank.

    Exact integer output (engine-portable): rank is ``row_number``
    over (score asc, id asc) — the id tiebreak makes it unique — and
    the calibrated value is ``pr_ppm = (rank-1)*1e6 DIV (n-1)``
    (percent-rank in parts-per-million; single-row strata calibrate
    to 0). One shuffle on the stratum key; per-stratum sort, no global
    order anywhere."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.col(stratum_col)).orderBy(
        score.asc(), F.col(id_col).asc()
    )
    wn = Window.partitionBy(F.col(stratum_col))
    return (
        df.withColumn("__rnk", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wn))
        .withColumn(
            "pr_ppm",
            # row_number is INT: the *1e6 product overflows 32 bits for
            # any stratum past ~2148 rows (ANSI throws; legacy wraps
            # negative) — widen BEFORE the multiply
            F.expr(
                "CAST(CASE WHEN __n <= 1 THEN 0 ELSE "
                "((CAST(__rnk AS BIGINT) - 1) * 1000000) DIV (__n - 1) "
                "END AS LONG)"
            ),
        )
        .drop("__n")
        .withColumnRenamed("__rnk", "rnk")
    )
