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

from etl_script_spark.operators.partitioning import keyed_width as _keyed_width


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


def ohlc_resample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """OHLC bar resampling (the financial downsample; also the shape
    of any first/last/min/max rollup of an event stream): per (key,
    time bucket), the OPEN (value at the earliest event), HIGH, LOW,
    and CLOSE (value at the latest event). No arithmetic touches the
    values — open/close are SELECTED, min/max are order statistics —
    so doubles pass through bit-identical on any engine; event-time
    ties break on ``tiebreak_col`` for a replayable total order.

    Shape: one window (row_number ascending + descending share the
    (key, bucket) partitioning — one shuffle) and one aggregation.
    At stream scale the same semantics run as the tumbling-window
    variant; this is the batch/backfill form.

    Returns (key, bucket_ts, open, high, low, close, n_events).
    """
    from pyspark.sql import Window

    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
    base = df.select(
        F.col(key_col).alias("key"),
        b,
        F.col(ts_col).alias("__ts"),
        F.col(tiebreak_col).alias("__tb"),
        F.col(value_col).alias("__v"),
    )
    wa = Window.partitionBy("key", "bucket_ts").orderBy("__ts", "__tb")
    wd = Window.partitionBy("key", "bucket_ts").orderBy(
        F.col("__ts").desc(), F.col("__tb").desc()
    )
    marked = base.withColumn("__ra", F.row_number().over(wa)).withColumn(
        "__rd", F.row_number().over(wd)
    )
    return marked.groupBy("key", "bucket_ts").agg(
        F.max(F.when(F.col("__ra") == 1, F.col("__v"))).alias("open"),
        F.max("__v").alias("high"),
        F.min("__v").alias("low"),
        F.max(F.when(F.col("__rd") == 1, F.col("__v"))).alias("close"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def markov_transitions(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """First-order Markov transition matrix of an event stream: order
    each key's events by time (ties on ``tiebreak_col``), pair every
    event with its predecessor's state, count (from, to) transitions,
    and report each row's probability as exact integer ppm of its
    FROM-state total (DIV — engine-replayable; probabilities of a
    from-state sum to <= 1e6 with the remainder lost to flooring,
    never redistributed).

    The fitted matrix drives next-action prediction, anomaly scoring
    (improbable transitions) and session simulation. Shape: one
    window per key (single shuffle), one (from, to) aggregation, one
    windowed total per from-state over matrix-cardinality rows.

    Returns (from_state, to_state, n, prob_ppm).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        df.withColumn("__prev", F.lag(state_col).over(w))
        .filter(F.col("__prev").isNotNull())
        .groupBy(
            F.col("__prev").alias("from_state"),
            F.col(state_col).alias("to_state"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return pairs.withColumn(
        "prob_ppm",
        F.expr(
            "(n * CAST(1000000 AS BIGINT)) DIV"
            " (SUM(n) OVER (PARTITION BY from_state))"
        ),
    ).select("from_state", "to_state", "n", "prob_ppm")


def cusum_changepoints(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    allowance_milli: int = 1000,
    h_mult_milli: int = 3000,
) -> DataFrame:
    """One-sided CUSUM changepoint detection (Page 1954), EXACT and
    windowable: the textbook recursion ``S_i = max(0, S_{i-1} + x_i -
    k)`` looks inherently sequential, but it is algebraically ``S_i =
    P_i - min_{j<=i} P_j`` where ``P`` is the prefix sum of ``(x -
    k)`` — a running sum plus a running min over ONE window spec, so
    the whole detector is a single shuffle on the series key instead
    of a per-row loop. Alarm where ``S_i > h``.

    ``value_col`` must be integer-scaled (cents). The allowance k and
    threshold h derive from each key's own mean:
    ``k = allowance_milli/1000 * mean`` and ``h = h_mult_milli/1000 *
    mean``, both exact integers via DECIMAL DIV — so the detector is
    self-calibrating yet bit-replayable. The per-key mean is one
    aggregation joined back (broadcast-size: one row per key).

    Returns alarm rows only: (key, ts, tiebreak, value, s_value).
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("long")
    means = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.expr(
            f"CAST(SUM(CAST({value_col} AS DECIMAL(38,0)))"
            f" * {allowance_milli} DIV (COUNT(*) * 1000) AS BIGINT)"
        ).alias("__kk"),
        F.expr(
            f"CAST(SUM(CAST({value_col} AS DECIMAL(38,0)))"
            f" * {h_mult_milli} DIV (COUNT(*) * 1000) AS BIGINT)"
        ).alias("__h"),
    )
    base = df.join(
        F.broadcast(means), F.col(key_col) == F.col("__k")
    ).withColumn("__d", v - F.col("__kk"))
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged = (
        base.withColumn("__p", F.sum("__d").over(wc))
        .withColumn("__pmin", F.min("__p").over(wc))
        .withColumn(
            "s_value",
            F.greatest(F.col("__p") - F.col("__pmin"), F.lit(0).cast("long")),
        )
    )
    return staged.filter(F.col("s_value") > F.col("__h")).select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(tiebreak_col).alias("tiebreak"),
        v.alias("value"),
        "s_value",
    )


def seasonality_index(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    period: str = "month",
) -> DataFrame:
    """Classical seasonal index: each calendar period's mean as a
    ratio of the global mean, in exact integer ppm —
    ``(sum_p * n * 1e6) DIV (n_p * sum)`` via DECIMAL(38,0).
    ``value_col`` must be integer-scaled. Two aggregations (period
    sums + the one-row global fold as a broadcast), zero windows.

    Returns (period_no, n, total, index_ppm) — index 1e6 = an average
    period.
    """
    part = {
        "month": F.month(F.col(ts_col)),
        "quarter": F.quarter(F.col(ts_col)),
        "dow": F.dayofweek(F.col(ts_col)),
        "hour": F.hour(F.col(ts_col)),
    }[period]
    v = F.col(value_col).cast("long")
    per = df.groupBy(part.alias("period_no")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v).cast("long").alias("total"),
    )
    glob = per.agg(
        F.sum("n").cast("long").alias("__gn"),
        F.sum("total").cast("long").alias("__gs"),
    )
    return per.crossJoin(F.broadcast(glob)).select(
        "period_no", "n", "total",
        F.expr(
            "CAST((CAST(total AS DECIMAL(38,0)) * __gn * 1000000)"
            " DIV (CAST(n AS DECIMAL(38,0)) * __gs) AS BIGINT)"
        ).alias("index_ppm"),
    )


def interpolate_linear(
    agg: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    value_col: str,
    step: str,
    step_seconds: int,
) -> DataFrame:
    """Densify a per-key bucketed INTEGER series and linearly
    interpolate the holes: every step-spaced bucket inside each
    key's own active span is emitted, observed buckets keep their
    value, and each silent bucket gets
    ``v_prev + (v_next − v_prev)·(t − t_prev)/(t_next − t_prev)``
    evaluated in exact integer arithmetic — magnitudes divided with
    DIV and the sign reapplied, because a falling series makes the
    numerator negative and truncate-vs-floor integer division
    diverges across engines there. Buckets before the first / after
    the last observation clamp to the nearest observed value.

    Scale shape: the grid is gap_fill's (sequence+explode, bounded
    by each key's own span); prev/next observations come from two
    RUNNING-frame window passes — forward (__t asc) for the previous
    observation, reverse (__t desc) for the next. r10: the next-
    observation pass used to be a ``(currentRow, unboundedFollowing)``
    frame, which WindowExec evaluates by RE-SCANNING from each row to
    the partition end — Θ(n²) per series (the UnboundedFollowing
    frame has no running state). ``last(ignorenulls)`` over the
    DESC-ordered running frame is the same value (the nearest
    non-null at or >= the current bucket; bucket times are unique
    within a key) and both passes are O(n) streaming frames; the
    second pass re-sorts within the same hash(key) exchange — no new
    shuffle (sf0.1: 2.82 -> 1.92 s, jvm_cpu 17.0 -> 11.6, rows
    identical). The partitioning key is the series key, so a 100 TB
    fact table distributes by key with no global sort.

    Returns key_cols + (bucket_col, value_col, interpolated).
    """
    from etl_script_spark.operators import asof as asof_ops

    grid = asof_ops.gap_fill(agg, key_cols, bucket_col, step)
    hr = (F.unix_timestamp(F.col(bucket_col)) / step_seconds).cast("long")
    g = grid.withColumn("__t", hr)
    w_prev = (
        Window.partitionBy(*key_cols)
        .orderBy("__t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rev = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.col(value_col)
    obs_t = F.when(v.isNotNull(), F.col("__t"))
    g = (
        g.withColumn("__vp", F.last(v, ignorenulls=True).over(w_prev))
        .withColumn("__tp", F.last(obs_t, ignorenulls=True).over(w_prev))
        .withColumn("__vn", F.last(v, ignorenulls=True).over(w_rev))
        .withColumn("__tn", F.last(obs_t, ignorenulls=True).over(w_rev))
    )
    num = "(CAST(__vn AS DECIMAL(38,0)) - __vp) * (__t - __tp)"
    mag = f"CAST((abs({num}) DIV (__tn - __tp)) AS BIGINT)"
    interp = F.expr(
        f"__vp + CASE WHEN {num} < 0 THEN -{mag} ELSE {mag} END"
    )
    filled = (
        F.when(v.isNotNull(), v)
        .when(
            F.col("__vp").isNotNull() & F.col("__vn").isNotNull(), interp
        )
        .otherwise(F.coalesce(F.col("__vp"), F.col("__vn")))
    )
    return g.select(
        *key_cols,
        bucket_col,
        filled.cast("long").alias(value_col),
        v.isNull().alias("interpolated"),
    )


def acf_lags(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    max_lag: int = 3,
) -> DataFrame:
    """Per-key sample autocorrelation of an INTEGER-scaled series at
    lags 1..max_lag — the periodicity / stickiness readout (is
    yesterday's value predictive? does the metric cycle?) computed
    the way a distributed engine should: every lagged copy comes
    from ONE window sort per key (max_lag ``lag()`` expressions
    share the same (key, order) frame, so Spark plans a single
    shuffle + sort), the copies unpivot via an inline array explode
    (max_lag ≤ a handful — output stays corpus-linear), and each
    (key, lag) folds to the six exact integer sufficient statistics.
    ``corr_ppb`` follows the corr_ppb_from_suffstats integer-sqrt
    convention: bit-identical across engines, a few ppb of true r.

    This is the lag-k PEARSON over the aligned pairs (the standard
    sample ACF up to edge-effect normalization choices — each lag
    normalizes over its own n−k pairs, the 'corrected' estimator).
    ``order_cols`` must be a deterministic total order within each
    key (add a tiebreak id when timestamps can collide). NULL values
    drop with their pairs.

    Returns (key_cols..., lag, n, corr_ppb).
    """
    from etl_script_spark.operators.stats import append_corr_ppb_staged

    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    _D = "DECIMAL(38,0)"
    v = F.col(value_col).cast("long")
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    lagged = df.select(
        *key_cols,
        v.alias("__v"),
        *[F.lag(v, k).over(w).alias(f"__l{k}") for k in range(1, max_lag + 1)],
    )
    stacked = lagged.select(
        *key_cols,
        "__v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"),
                        F.col(f"__l{k}").alias("__p"),
                    )
                    for k in range(1, max_lag + 1)
                ]
            )
        ).alias("__e"),
    ).select(*key_cols, "__v", "__e.lag", "__e.__p")
    pairs = stacked.filter(
        F.col("__p").isNotNull() & F.col("__v").isNotNull()
    )
    x = F.col("__v").cast(_D)
    y = F.col("__p").cast(_D)
    s = pairs.groupBy(*key_cols, "lag").agg(
        F.count(F.lit(1)).cast(_D).alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
        F.sum(x * y).alias("__sxy"),
    )
    # staged ladder (stats.append_corr_ppb_staged): identical
    # arithmetic, linear Column tree — the inline corr ladder cost
    # ~2.5 s of driver analysis/codegen per build (r10)
    return append_corr_ppb_staged(s, "corr_ppb").select(
        *key_cols,
        "lag",
        F.col("__n").cast("long").alias("n"),
        "corr_ppb",
    )


def acf_lags_regular(
    df: DataFrame,
    key_cols: list[str],
    pos_col: str,
    value_col: str,
    max_lag: int = 3,
    step: int = 1,
) -> DataFrame:
    """The mega-key scale path for :func:`acf_lags`, for REGULAR
    series (dense integer index or fixed-step timestamps): on a
    regular grid, lag-k BY ROW equals lag-k BY POSITION, so the
    window — whose per-key sort serializes a 30 M-point key to one
    104-second task — becomes an equi-JOIN on (key, pos − k·step):
    the join key includes the position, so even a single mega key
    distributes across every partition. Missing grid positions
    simply find no partner (their pairs drop), which for a truly
    regular series is identical to the window semantics; for
    irregular series use acf_lags, whose answer this function does
    NOT reproduce.

    Shape: one explode (×max_lag) + one keyed shuffle join + one
    aggregation; sufficient statistics and corr_ppb identical to
    acf_lags (equality pinned by test on regular fixtures).

    Returns (key_cols..., lag, n, corr_ppb).
    """
    from etl_script_spark.operators.stats import append_corr_ppb_staged

    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    if step < 1:
        raise ValueError(f"step must be >= 1, got {step}")
    _D = "DECIMAL(38,0)"
    pos = F.col(pos_col).cast("long")
    v = F.col(value_col).cast("long")
    base = df.filter(v.isNotNull()).select(
        *key_cols, pos.alias("__pos"), v.alias("__v")
    )
    probes = base.select(
        *key_cols, "__pos", "__v",
        F.explode(
            F.sequence(F.lit(1), F.lit(max_lag))
        ).alias("lag"),
    ).withColumn("__ppos", F.col("__pos") - F.col("lag") * step)
    partners = base.select(
        *[F.col(c).alias(f"__k_{c}") for c in key_cols],
        F.col("__pos").alias("__pos2"),
        F.col("__v").alias("__p"),
    )
    cond = F.col("__ppos") == F.col("__pos2")
    for c in key_cols:
        cond = cond & (F.col(c) == F.col(f"__k_{c}"))
    pairs = probes.join(partners, cond)
    x = F.col("__v").cast(_D)
    y = F.col("__p").cast(_D)
    s = pairs.groupBy(*key_cols, "lag").agg(
        F.count(F.lit(1)).cast(_D).alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
        F.sum(x * y).alias("__sxy"),
    )
    # staged ladder (stats.append_corr_ppb_staged): identical
    # arithmetic, linear Column tree — the inline corr ladder cost
    # ~2.5 s of driver analysis/codegen per build (r10)
    return append_corr_ppb_staged(s, "corr_ppb").select(
        *key_cols,
        "lag",
        F.col("__n").cast("long").alias("n"),
        "corr_ppb",
    )


def ccf_lags(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    a_col: str,
    b_col: str,
    max_lag: int = 2,
) -> DataFrame:
    """Per-key CROSS-correlation between two integer-scaled signals at
    lags −max_lag..max_lag: ``corr(a[i], b[i−k])`` — positive k means
    b LEADS a by k observations (the does-marketing-lead-revenue
    readout), negative k the reverse, k=0 the contemporaneous
    correlation. Same machinery as acf_lags: every shifted copy of b
    (lags AND leads) comes from ONE window sort per key, the copies
    unpivot via an inline explode, and each (key, k) folds to the six
    exact integer sufficient statistics; corr_ppb under the
    integer-sqrt convention. Pairs with a NULL on either side drop;
    each k normalizes over its own surviving pairs.

    Returns (key_cols..., lag, n, corr_ppb) — up to 2·max_lag+1 rows
    per key.
    """
    from etl_script_spark.operators.stats import append_corr_ppb_staged

    if max_lag < 0:
        raise ValueError(f"max_lag must be >= 0, got {max_lag}")
    _D = "DECIMAL(38,0)"
    a = F.col(a_col).cast("long")
    b = F.col(b_col).cast("long")
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    ks = list(range(-max_lag, max_lag + 1))
    lagged = df.select(
        *key_cols,
        a.alias("__a"),
        *[F.lag(b, k).over(w).alias(f"__b{k}") for k in ks],
    )
    stacked = lagged.select(
        *key_cols,
        "__a",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"),
                        F.col(f"__b{k}").alias("__p"),
                    )
                    for k in ks
                ]
            )
        ).alias("__e"),
    ).select(*key_cols, "__a", "__e.lag", "__e.__p")
    pairs = stacked.filter(
        F.col("__p").isNotNull() & F.col("__a").isNotNull()
    )
    x = F.col("__a").cast(_D)
    y = F.col("__p").cast(_D)
    s = pairs.groupBy(*key_cols, "lag").agg(
        F.count(F.lit(1)).cast(_D).alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
        F.sum(x * y).alias("__sxy"),
    )
    # staged ladder (stats.append_corr_ppb_staged): identical
    # arithmetic, linear Column tree — the inline corr ladder cost
    # ~2.5 s of driver analysis/codegen per build (r10)
    return append_corr_ppb_staged(s, "corr_ppb").select(
        *key_cols,
        "lag",
        F.col("__n").cast("long").alias("n"),
        "corr_ppb",
    )


def lttb_downsample(
    df: DataFrame,
    ts_col: str,
    val_col: str,
    n_buckets: int = 60,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling, fixed-anchor
    parallel variant (Steinarsson 2013): keep, per time bucket, the
    point forming the largest triangle with the NEIGHBOR BUCKETS'
    centroids — the visually-faithful reduction of a long series to
    ~``n_buckets`` points that per-bucket min/max/avg cannot give
    (it preserves spikes AND their shape).

    Two deliberate departures from the sequential reference
    algorithm, both required for distribution: (1) buckets are
    equal-WIDTH in time, not equal-count (equal-count needs a global
    rank); (2) the triangle anchors are the ADJACENT BUCKET CENTROIDS
    on both sides, not the previously-selected point (the left-anchor
    recursion is a serial chain). Centroids are exact micro-units via
    DECIMAL DIV; areas are exact DECIMAL(38) cross products; the
    argmax ties break (ts, value) ascending, so the selection is
    engine-portable.

    Scale shape: one aggregation builds the ≤n_buckets-row centroid
    table (its lag/lead window runs on that tiny table only), which
    broadcasts back onto the points; per-bucket argmax is one window
    partitioned by bucket. The earliest and latest EXISTING buckets
    pin the series endpoints (min-ts / max-ts point) per LTTB.

    ``ts_col`` is any monotone INTEGER time axis (epoch seconds, a
    day number, a sequence position) — the caller converts timestamps
    once; the operator stays type-agnostic.

    Returns (bucket, ts, value) of the selected points.
    """
    if n_buckets < 3:
        raise ValueError(f"n_buckets must be >= 3, got {n_buckets}")
    pts = df.select(
        F.col(ts_col).cast("long").alias("t"),
        F.col(val_col).cast("long").alias("v"),
    ).filter(F.col("t").isNotNull() & F.col("v").isNotNull())
    span = pts.agg(
        F.min("t").alias("t0"), F.max("t").alias("t1")
    )
    b = pts.crossJoin(F.broadcast(span)).withColumn(
        "b",
        F.expr(
            f"least({n_buckets - 1},"
            f" CAST(((t - t0) * {n_buckets}) DIV (t1 - t0 + 1) AS INT))"
        ),
    )
    cent = (
        b.groupBy("b")
        .agg(
            F.expr(
                "CAST((SUM(CAST(t AS DECIMAL(38,0))) * 1000000)"
                " DIV COUNT(*) AS DECIMAL(38,0))"
            ).alias("ct"),
            F.expr(
                "CAST((SUM(CAST(v AS DECIMAL(38,0))) * 1000000)"
                " DIV COUNT(*) AS DECIMAL(38,0))"
            ).alias("cv"),
        )
    )
    w = Window.orderBy("b")  # <= n_buckets rows: tiny by construction
    anch = cent.select(
        "b",
        F.lag("ct").over(w).alias("pt"),
        F.lag("cv").over(w).alias("pv"),
        F.lead("ct").over(w).alias("nt"),
        F.lead("cv").over(w).alias("nv"),
    )
    j = b.join(F.broadcast(anch), "b")
    # 2*area of triangle (pt,pv)-(t,v)-(nt,nv): the cross product
    # (pt-nt)*(v-pv) - (pt-t)*(nv-pv). Second factor is (nv - pv) —
    # a flipped sign here scores chord-line points above real spikes.
    area = F.expr(
        "abs((pt - nt) * (CAST(v AS DECIMAL(38,0)) * 1000000 - pv)"
        " - (pt - CAST(t AS DECIMAL(38,0)) * 1000000) * (nv - pv))"
    )
    scored = j.withColumn(
        "__a",
        F.when(F.col("pt").isNotNull() & F.col("nt").isNotNull(), area),
    )
    sel = Window.partitionBy("b").orderBy(
        F.col("__endpick").asc(),
        F.col("__a").desc(),
        F.col("t").asc(),
        F.col("v").asc(),
    )
    picked = (
        scored.withColumn(
            "__endpick",
            # earliest existing bucket pins its min-ts point, latest
            # its max-ts point: rank endpoints ahead of the area argmax
            F.when(F.col("pt").isNull(), F.col("t"))
            .when(F.col("nt").isNull(), -F.col("t"))
            .otherwise(F.lit(0)),
        )
        .withColumn("__r", F.row_number().over(sel))
        .filter(F.col("__r") == 1)
    )
    return picked.select(
        F.col("b").cast("int").alias("bucket"),
        F.col("t").alias("ts"),
        F.col("v").alias("value"),
    )


def detect_period(
    df: DataFrame,
    key_cols: list[str],
    pos_col: str,
    value_col: str,
    max_lag: int = 48,
    min_lag: int = 2,
    step: int = 1,
) -> DataFrame:
    """Dominant-period detection per key: the lag in [min_lag,
    max_lag] with the highest sample autocorrelation — the "does this
    metric cycle daily/weekly?" readout that picks the seasonality
    window for gap-fill, OHLC resample, or the seasonality index.
    Lags 0 and 1 are excluded by default (trivially high under any
    trend); ties break toward the SMALLER lag (the fundamental, not
    its harmonic at equal strength), then deterministic.

    Built on :func:`acf_lags_regular` (the mega-key scale path: lag
    by POSITION on a regular grid — self-join on shifted position,
    no per-key window sort), so a 30 M-point key distributes. The
    argmax runs on the keys × max_lag ACF table — bounded, one
    window.

    Returns (key_cols..., period, corr_ppb, n).
    """
    if min_lag < 1 or max_lag < min_lag:
        raise ValueError(f"need 1 <= min_lag <= max_lag, got"
                         f" {min_lag}..{max_lag}")
    acf = acf_lags_regular(
        df, key_cols, pos_col, value_col, max_lag=max_lag, step=step
    ).filter(F.col("lag") >= min_lag)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("corr_ppb").desc_nulls_last(), F.col("lag").asc()
    )
    return (
        acf.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select(
            *key_cols,
            F.col("lag").cast("int").alias("period"),
            "corr_ppb",
            "n",
        )
    )


def holt_linear_smooth(
    df: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
    alpha_ppm: int = 300000,
    beta_ppm: int = 100000,
    horizon: int = 1,
    max_series_rows: int = 100000,
) -> DataFrame:
    """Per-series Holt double exponential smoothing (Holt 1957) —
    level + linear trend, the forecasting step up from ts_ewma_fir
    when series drift:

        l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1}),
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1},

    initialized l_1 = x_1, b_1 = 0. α/β arrive as exact ppm integers
    and every step is integer arithmetic with truncating division
    (Spark DIV; the oracle wraps DuckDB's flooring // in the
    abs/negate form), so the recurrence is bit-identical across
    engines and cluster sizes — no float accumulation drift.

    Shape: a smoothing recurrence is inherently sequential PER
    SERIES, so each series folds as ONE ROW — ordered collect into an
    array, then a single aggregate() lambda pass (the HOF fold both
    engines evaluate element-by-element). Series distribute across
    the cluster; one series' cost is its own length, ENFORCED ≤
    ``max_series_rows`` (raise, don't silently collect an unbounded
    array — the kendall/theil-sen convention). Magnitude budget:
    |value| < ~9e11 keeps every intermediate in int64 (α·x ≤ 1e6·|x|).

    Returns (series, n, level, trend, forecast) where forecast =
    level + horizon·trend.
    """
    if not (0 < alpha_ppm <= 1000000 and 0 <= beta_ppm <= 1000000):
        raise ValueError(
            f"alpha_ppm/beta_ppm must be in (0, 1e6], got "
            f"{alpha_ppm}/{beta_ppm}"
        )
    b = df.select(
        F.col(series_col).alias("srs"),
        F.col(order_col).alias("t"),
        F.col(value_col).cast("long").alias("x"),
    ).filter(F.col("x").isNotNull())
    per = b.groupBy("srs").agg(
        F.expr("sort_array(collect_list(struct(t, x)))").alias("pts"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    per = per.filter(
        F.when(F.col("n") <= max_series_rows, F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("holt_linear_smooth: series "),
                    F.col("srs").cast("string"),
                    F.lit(" has "),
                    F.col("n").cast("string"),
                    F.lit(
                        f" rows, over max_series_rows={max_series_rows};"
                        " a smoothing recurrence folds one series in one"
                        " task — pre-aggregate to a coarser grain or"
                        " raise the bound explicitly"
                    ),
                )
            ).cast("boolean")
        )
    )
    a, s = alpha_ppm, 1000000
    bb = beta_ppm
    new_l = f"({a} * x.x + {s - a} * (acc.l + acc.b)) DIV {s}"
    fold = (
        "aggregate("
        "slice(__vs, 2, size(__vs) - 1),"
        " named_struct('l', CAST(element_at(__vs, 1).x AS BIGINT),"
        " 'b', CAST(0 AS BIGINT)),"
        f" (acc, x) -> named_struct("
        f"'l', CAST({new_l} AS BIGINT),"
        f" 'b', CAST(({bb} * (({new_l}) - acc.l) + {s - bb} * acc.b)"
        f" DIV {s} AS BIGINT)))"
    )
    return (
        per.withColumn("__vs", F.col("pts"))
        .withColumn("__f", F.expr(fold))
        .select(
            F.col("srs").alias("series"),
            "n",
            F.expr("__f.l").alias("level"),
            F.expr("__f.b").alias("trend"),
            F.expr(f"__f.l + {int(horizon)} * __f.b").alias("forecast"),
        )
    )


def mann_kendall_trend(
    df: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
    max_series_rows: int | None = 10000,
) -> DataFrame:
    """Per-series Mann–Kendall trend test (Mann 1945; Kendall 1975):
    the monotone-trend detector on a time series —

        S = Σ_{i<j} sign(x_j − x_i),
        Var·18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)   (tie groups t),
        z = (S ∓ 1)/√Var  (continuity-corrected, 0 at S = 0)

    — the hypothesis-test sibling of theil_sen_groups (which gives
    the slope MK decides is real). Signs by direct comparison (never
    subtraction — int64 wrap), the variance from the per-series VALUE
    histogram, and z in exact milli: sd_milli = isqrt((Var18·1e6)
    DIV 18) — the one inner truncating DIV is the same integer op on
    both engines, then the sign-split outer division.

    Scale contract: pair generation is Θ(n²) PER SERIES (inherent —
    every pair is the statistic), group-keyed so series distribute;
    ENFORCED ≤ ``max_series_rows`` exactly like theil_sen/kendall.

    Returns (series, n, s_stat, var_x18, z_milli).
    """
    from etl_script_spark.operators.stats import (
        _D, _guard_group_size, isqrt_column,
    )

    b = df.select(
        F.col(series_col).alias("g"),
        F.col(order_col).alias("t"),
        F.col(value_col).cast("long").alias("v"),
    ).filter(F.col("v").isNotNull() & F.col("g").isNotNull())
    if max_series_rows is not None:
        if max_series_rows < 2:
            raise ValueError(
                f"max_series_rows must be >= 2, got {max_series_rows}"
            )
        b = _guard_group_size(b, "g", max_series_rows, "mann_kendall_trend")
    # pin pair-generation parallelism (r10, the theil_sen/kendall
    # finding): tiny input bytes otherwise leave the Θ(n²) stage at
    # the scan's width / an AQE-coalesced single task
    b = b.repartition(_keyed_width(df), "g")
    w = Window.partitionBy("g").orderBy("t")
    bi = b.withColumn("__i", F.row_number().over(w))
    s_tab = (
        bi.alias("i")
        .join(bi.alias("j"), F.col("i.g") == F.col("j.g"))
        .filter(F.col("i.__i") < F.col("j.__i"))
        .groupBy(F.col("i.g").alias("g"))
        .agg(
            F.sum(
                F.when(F.col("j.v") > F.col("i.v"), 1)
                .when(F.col("j.v") < F.col("i.v"), -1)
                .otherwise(0)
            ).cast("long").alias("s_stat")
        )
    )
    ties = (
        b.groupBy("g", "v")
        .agg(F.count(F.lit(1)).cast(_D).alias("tc"))
        .groupBy("g")
        .agg(
            F.sum("tc").cast(_D).alias("n"),
            F.sum(
                F.expr("tc * (tc - 1) * (2 * tc + 5)")
            ).cast(_D).alias("tie18"),
        )
    )
    cur = (
        s_tab.join(ties, "g")
        .withColumn(
            "var_x18",
            F.expr("n * (n - 1) * (2 * n + 5) - tie18"),
        )
        .withColumn(
            "__sd_milli",
            isqrt_column(F.expr(f"CAST((var_x18 * 1000000) DIV 18 AS {_D})")),
        )
        .withColumn(
            "__num",
            F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
            .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
            .otherwise(F.lit(0)).cast(_D) * 1000000,
        )
    )
    z = (
        # __num is (S∓1)·1e6 and __sd_milli is σ·1e3, so the plain
        # quotient is already z·1e3 — z in exact milli
        F.when(F.col("__sd_milli") <= 0, F.lit(None))
        .when(
            F.col("__num") < 0,
            -F.expr("CAST((-__num) DIV __sd_milli AS BIGINT)"),
        )
        .otherwise(F.expr("CAST(__num DIV __sd_milli AS BIGINT)"))
        .cast("long")
    )
    return cur.select(
        F.col("g").alias("series"),
        F.col("n").cast("long").alias("n"),
        "s_stat",
        F.col("var_x18").cast("long").alias("var_x18"),
        z.alias("z_milli"),
    )


def seasonal_decompose_ma(
    df: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
    period: int,
) -> DataFrame:
    """Classical additive seasonal decomposition by centered moving
    average (the moving-average half of STL; Macaulay 1931): per
    series, trend = centered MA over one ODD period window (rows
    without a full window carry NULL trend — edges are honestly
    unknown, never extrapolated), detrended = value − trend,
    seasonal = per-phase mean of the detrended series RE-CENTERED so
    the indices sum to ~0 over a cycle, residual = the rest. The
    decomposition behind deseasonalized drift checks and anomaly
    gates (a residual spike means something; a seasonal spike is
    Tuesday).

    Exact integer milli arithmetic: trend = (window sum·1000) DIV p,
    phase means and the centering mean via the sign-split truncating
    division both engines share. ``period`` must be odd (an even
    period needs the 2×MA second smoothing pass — call with p+1/p−1
    or pre-aggregate; validate-don't-default).

    Scale shape: two group-keyed windows over the fact (the centered
    MA and the row numbering — inherent to a sequential statistic,
    series distribute) and one bounded per-(series, phase) table
    joined back. Returns (series, t, v, trend_milli, seasonal_milli,
    residual_milli).
    """
    if period < 3 or period % 2 == 0:
        raise ValueError(
            f"period must be odd and >= 3, got {period} — even periods"
            " need the 2xMA pass; use an odd window or pre-aggregate"
        )
    k = (period - 1) // 2
    b = df.select(
        F.col(series_col).alias("g"),
        F.col(order_col).alias("t"),
        F.col(value_col).cast("long").alias("v"),
    ).filter(F.col("v").isNotNull() & F.col("g").isNotNull())
    w_ord = Window.partitionBy("g").orderBy("t")
    w_ma = w_ord.rowsBetween(-k, k)
    tdiv = (
        lambda num, den:
        F.when(
            F.expr(num) < 0,
            -F.expr(f"CAST((-({num})) DIV ({den}) AS BIGINT)"),
        ).otherwise(F.expr(f"CAST(({num}) DIV ({den}) AS BIGINT)"))
    )
    based = (
        b.withColumn("__rn", F.row_number().over(w_ord))
        .withColumn("__ws", F.sum("v").over(w_ma))
        .withColumn("__wc", F.count(F.lit(1)).over(w_ma))
        .withColumn(
            "trend_milli",
            F.when(
                F.col("__wc") == period,
                tdiv(f"CAST(__ws AS DECIMAL(38,0)) * 1000", str(period)),
            ),
        )
        .withColumn("__phase", (F.col("__rn") - 1) % period)
        .withColumn(
            "__det", F.col("v") * 1000 - F.col("trend_milli")
        )
    )
    phase = based.filter(F.col("__det").isNotNull()).groupBy(
        "g", "__phase"
    ).agg(
        F.sum("__det").cast("long").alias("__ds"),
        F.count(F.lit(1)).cast("long").alias("__dc"),
    ).withColumn("__smean", tdiv("CAST(__ds AS DECIMAL(38,0))", "__dc"))
    centering = phase.groupBy("g").agg(
        F.sum("__smean").cast("long").alias("__cs"),
        F.count(F.lit(1)).cast("long").alias("__cc"),
    ).withColumn("__center", tdiv("CAST(__cs AS DECIMAL(38,0))", "__cc"))
    seas = phase.join(centering.select("g", "__center"), "g").select(
        "g",
        "__phase",
        (F.col("__smean") - F.col("__center")).alias("seasonal_milli"),
    )
    return (
        based.join(seas, ["g", "__phase"], "left")
        .select(
            F.col("g").alias("series"),
            "t",
            "v",
            "trend_milli",
            "seasonal_milli",
            (
                F.col("v") * 1000 - F.col("trend_milli")
                - F.col("seasonal_milli")
            ).alias("residual_milli"),
        )
    )
