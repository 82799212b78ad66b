"""Time-series smoothing and robust outlier detection.

Two shapes the reference's analytics layer lacks but any metrics
pipeline at scale needs:

- ``ewma_fir``: exponentially-weighted moving average as a FIXED-TAP
  FIR filter (lag window + literal weights). The textbook recursive
  EWMA is sequential per key — un-parallelizable and, worse,
  non-oracle-able (the closed form ``sum x_k (1-a)^-k`` overflows for
  long histories). Truncating to ``taps`` terms and folding the
  remaining mass into the oldest tap keeps the weights summing to 1,
  turns the operator into a pure window expression (one shuffle on the
  key, whole-stage codegen, no state), and bounds per-row work at any
  scale. Error vs the infinite EWMA is (1-alpha)^taps of the signal
  range — pick taps accordingly.
- ``mad_outliers``: median / median-absolute-deviation robust z-score.
  Two exact per-group percentile passes (each one shuffle on the
  group key) + a broadcast join of the tiny per-group stats back onto
  the rows. Exact medians are the oracle-able contract; at 100 TB
  swap ``percentile`` for ``percentile_approx`` (t-digest, map-side
  mergeable) when rank error is tolerable — same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def ewma_weights(alpha: float, taps: int) -> list[float]:
    """FIR tap weights: a, a(1-a), ..., a(1-a)^(taps-2), (1-a)^(taps-1).
    The last tap absorbs the entire remaining geometric tail so the
    weights sum to exactly 1 in real arithmetic."""
    assert 0 < alpha < 1 and taps >= 2
    return [alpha * (1 - alpha) ** j for j in range(taps - 1)] + [
        (1 - alpha) ** (taps - 1)
    ]


def ewma_fir(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.3,
    taps: int = 8,
    out_col: str = "ewma",
) -> DataFrame:
    """EWMA per key as a ``taps``-tap FIR over the ordered history.

    Rows with fewer than ``taps`` predecessors get NULL (no partial
    renormalization — the caller sees exactly where the filter is
    warm). A NULL value likewise nulls the ``taps`` windows that see
    it — deliberate NULL-poisoning: a gap in the signal invalidates
    the smoothed value rather than silently renormalizing over it
    (gap-fill first if that is not wanted: ts_gap_fill_hourly). The
    weighted sum is built LEFT-ASSOCIATIVELY in tap order so an
    oracle writing the same literal expression reproduces the
    identical IEEE-754 double bit-for-bit.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    acc: Column | None = None
    for j, wt in enumerate(ewma_weights(alpha, taps)):
        term = F.lag(F.col(value_col), j).over(w) * F.lit(wt)
        acc = term if acc is None else acc + term
    return df.withColumn(out_col, acc)


def mad_stats(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """(group, med, mad): exact per-group median and median absolute
    deviation. Two aggregation passes; the intermediate per-group
    median table is broadcast back (group cardinality ≪ row count)."""
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med")
    )
    dev = df.join(F.broadcast(med), group_col).withColumn(
        "__adev", F.abs(F.col(value_col) - F.col("med"))
    )
    return dev.groupBy(group_col).agg(
        F.min("med").alias("med"),  # constant per group
        F.expr("percentile(__adev, 0.5)").alias("mad"),
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
    out_col: str = "is_outlier",
) -> DataFrame:
    """Flag rows where |x - med| > k * 1.4826 * mad (the normal-
    consistency constant makes k comparable to a z-score cutoff).
    MAD-of-zero groups (constant value) flag nothing beyond exact
    deviators, matching the robust-statistics convention. LEFT join
    onto the stats so null-group rows survive with a NULL flag — the
    module-wide null-group convention (see features.zscore)."""
    stats = mad_stats(df, group_col, value_col)
    return df.join(F.broadcast(stats), [group_col], "left").withColumn(
        out_col,
        F.abs(F.col(value_col) - F.col("med"))
        > F.lit(k) * F.lit(1.4826) * F.col("mad"),
    )
