"""Exact distributed statistics: closed-form estimators computed from
integer-scaled sufficient statistics, so a 1000-executor aggregation
and a single-node oracle produce bit-identical results. The pattern:
fold the data to a handful of integer sums (one map-side-combinable
aggregation), then evaluate the estimator with DECIMAL(38,0)
arithmetic and DIV — no float accumulation order anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_D = "DECIMAL(38,0)"


def ols_slope_groups(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group simple linear regression (OLS) slope from sufficient
    statistics: ``slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)``, computed
    entirely in integers — inputs must already be integer-scaled
    (counts, cents, basis points) — with the slope reported in exact
    ppb via DECIMAL(38,0) DIV (the cross products overflow int64 at
    realistic group sizes; decimal-38 carries ~1e38, enough for 1e9
    rows of 1e9-scaled values).

    One aggregation, map-side combinable: at 100 TB this is a single
    shuffle of five longs per group, the cheapest possible regression.
    Degenerate groups (constant x: denominator 0) report NULL slope
    rather than erroring.

    Returns (group_cols..., n, sum_x, sum_y, sxx, sxy, slope_ppb).
    """
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("long").alias("sum_x"),
        F.sum(y).cast("long").alias("sum_y"),
        F.sum(x * x).cast("long").alias("sxx"),
        F.sum(x * y).cast("long").alias("sxy"),
    )
    num = (
        f"(CAST(n AS {_D}) * CAST(sxy AS {_D})"
        f" - CAST(sum_x AS {_D}) * CAST(sum_y AS {_D}))"
    )
    den = (
        f"(CAST(n AS {_D}) * CAST(sxx AS {_D})"
        f" - CAST(sum_x AS {_D}) * CAST(sum_x AS {_D}))"
    )
    # The numerator can be negative, and integer division semantics
    # DIVERGE on negatives across engines (Spark DIV truncates toward
    # zero, DuckDB // floors) — so divide magnitudes and reapply the
    # sign; the denominator (an n-scaled variance) is never negative.
    mag = f"CAST((abs({num}) * 1000000000) DIV {den} AS BIGINT)"
    return agg.withColumn(
        "slope_ppb",
        F.expr(
            f"CASE WHEN {den} = 0 THEN NULL "
            f"WHEN {num} < 0 THEN -{mag} ELSE {mag} END"
        ),
    )


def gini_groups(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-group GINI concentration coefficient, exact: with values
    sorted ascending within the group, ``G = sum_i (2i - n - 1) * v_i
    / (n * sum(v))`` — reported in integer milli-units via
    DECIMAL(38,0) DIV. ``value_col`` must be integer-scaled and
    NON-NEGATIVE (shift before calling if the domain has negatives —
    Gini is undefined below zero); ties in value order on
    ``tiebreak_col`` (the i-weights make rank assignment matter only
    across distinct values, but a total order keeps both engines'
    ranks identical).

    Shape: one rank window per group + one aggregation — two
    shuffles, both on the group key. Groups with zero total report
    NULL.

    Returns (group_cols..., n, total, gini_milli).
    """
    w = Window.partitionBy(*group_cols).orderBy(value_col, tiebreak_col)
    ranked = df.withColumn("__i", F.row_number().over(w).cast("long"))
    v = F.col(value_col).cast("long")
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v).cast("long").alias("total"),
        F.sum((2 * F.col("__i")) * v).cast("long").alias("__w2"),
        F.sum(v).cast("long").alias("__sv"),
    )
    num = (
        f"(CAST(__w2 AS {_D}) - (CAST(n AS {_D}) + 1) * CAST(__sv AS {_D}))"
    )
    den = f"(CAST(n AS {_D}) * CAST(total AS {_D}))"
    return agg.withColumn(
        "gini_milli",
        F.expr(
            f"CASE WHEN {den} = 0 THEN NULL ELSE "
            f"CAST(({num} * 1000) DIV {den} AS BIGINT) END"
        ),
    ).select(*group_cols, "n", "total", "gini_milli")


# Benford expected first-digit frequencies, ppm (round(log10(1+1/d)*1e6)
# — fixed literals, identical on every engine)
BENFORD_PPM = [301030, 176091, 124939, 96910, 79181, 66947, 57992,
               51153, 45757]


def benford_first_digit(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """Benford's-law first-significant-digit audit (Newcomb 1881,
    Benford 1938 — the standard forensic screen for fabricated
    amounts): observed first-digit frequencies of an integer-scaled
    positive amount column vs the expected ``log10(1 + 1/d)``
    distribution, with the expectation baked in as fixed ppm literals
    so no engine computes a logarithm. Deviation is the exact integer
    ``|obs_ppm - exp_ppm|`` per digit; callers alarm on the sum (the
    MAD-of-digits test) or per-digit spikes.

    One aggregation over 9 keys plus a one-row broadcast total —
    map-side combinable, scale-free output. Non-positive rows are
    excluded (Benford is defined on positive magnitudes).

    Returns (digit, n, obs_ppm, exp_ppm, dev_ppm) — 9 rows.
    """
    v = F.col(value_col).cast("long")
    digits = (
        df.filter(v > 0)
        .select(F.substring(v.cast("string"), 1, 1).cast("int").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = digits.agg(F.sum("n").cast("long").alias("__t"))
    exp_map = F.element_at(
        F.array(*[F.lit(p) for p in BENFORD_PPM]), F.col("digit")
    ).cast("long")
    return (
        digits.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.expr("(n * CAST(1000000 AS BIGINT)) DIV __t").alias("obs_ppm"),
            exp_map.alias("exp_ppm"),
        )
        .withColumn("dev_ppm", F.abs(F.col("obs_ppm") - F.col("exp_ppm")))
    )


def chi2_contingency(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Pearson chi-square contingency cells, exact-integer form: per
    (row, col) cell the observed count, the expected count in
    milli-rows ``E_milli = (row_tot * col_tot * 1000) DIV N``, and the
    cell's chi-square contribution in milli-units ``(O*1000 -
    E_milli)^2 DIV greatest(E_milli, 1)`` (algebraically 1000 *
    (O-E)^2/E with per-cell flooring — deterministic on any engine;
    sum the cells for the statistic). The independence screen for two
    categorical columns — feature selection, drift detection, bias
    audits.

    Shape: one (row, col) aggregation; row/col totals via windows
    over CELL-cardinality data (|rows| x |cols| — never the fact
    table); N likewise. All integer arithmetic within int64 for up
    to ~3e9 rows per cell.

    Returns (row_val, col_val, obs, exp_milli, chi2_cell_milli).
    """
    cells = df.groupBy(
        F.col(row_col).alias("row_val"), F.col(col_col).alias("col_val")
    ).agg(F.count(F.lit(1)).cast("long").alias("obs"))
    wr = Window.partitionBy("row_val")
    wc = Window.partitionBy("col_val")
    wn = Window.partitionBy()
    staged = (
        cells.withColumn("__rt", F.sum("obs").over(wr))
        .withColumn("__ct", F.sum("obs").over(wc))
        .withColumn("__n", F.sum("obs").over(wn))
        .withColumn(
            "exp_milli", F.expr("(__rt * __ct * 1000) DIV __n")
        )
        .withColumn(
            "chi2_cell_milli",
            F.expr(
                "((obs * 1000 - exp_milli) * (obs * 1000 - exp_milli))"
                " DIV greatest(exp_milli, 1)"
            ),
        )
    )
    return staged.select(
        "row_val", "col_val", "obs", "exp_milli", "chi2_cell_milli"
    )
