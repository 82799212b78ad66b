"""Privacy-governance metrics: k-anonymity / l-diversity reporting.

Before a curated dataset ships (to training or to an external
consumer), governance wants to know how re-identifiable it is:
k-anonymity = the smallest quasi-identifier group size (every record
is hidden among ≥ k lookalikes), l-diversity = the smallest number of
distinct sensitive values within a group (a group of 50 that all
share one diagnosis is still leaky). Both reduce to one grouped
aggregation over the quasi-identifier columns plus a global fold —
two shuffles, the second over group-cardinality-sized data.

``suppress_small_groups`` is the enforcement half: drop (or the
caller generalizes) rows in groups below the k threshold — the
standard suppression step of k-anonymization pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def group_profile(
    df: DataFrame, quasi_cols: list[str], sensitive: Column
) -> DataFrame:
    """Per quasi-identifier group: size and distinct sensitive count."""
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("group_size"),
        F.countDistinct(sensitive).alias("l_distinct"),
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive: Column,
    k_threshold: int = 5,
) -> DataFrame:
    """One metrics row: n_rows, n_groups, k_anonymity (min group
    size), l_diversity (min distinct sensitive per group),
    rows_at_risk (rows living in groups smaller than ``k_threshold``)
    and its integer per-myriad share (exact, no float division)."""
    g = group_profile(df, quasi_cols, sensitive)
    return g.agg(
        F.sum("group_size").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("group_size").alias("k_anonymity"),
        F.min("l_distinct").alias("l_diversity"),
        F.sum(
            F.when(F.col("group_size") < k_threshold, F.col("group_size")).otherwise(
                F.lit(0)
            )
        ).alias("rows_at_risk"),
    ).select(
        "n_rows",
        "n_groups",
        "k_anonymity",
        "l_diversity",
        "rows_at_risk",
        F.expr("(rows_at_risk * 10000) div n_rows").alias("risk_per_myriad"),
    )


def suppress_small_groups(
    df: DataFrame, quasi_cols: list[str], k_threshold: int = 5
) -> DataFrame:
    """Drop rows whose quasi-identifier group has < k_threshold
    members. Window count over the group keys — one shuffle, no join
    materialization."""
    w = Window.partitionBy(*quasi_cols)
    return (
        df.withColumn("__gsz", F.count(F.lit(1)).over(w))
        .filter(F.col("__gsz") >= k_threshold)
        .drop("__gsz")
    )
