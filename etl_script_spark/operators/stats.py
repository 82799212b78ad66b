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

from etl_script_spark.operators.partitioning import keyed_width as _keyed_width

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
            # DECIMAL products: rt*ct and the squared residual overflow
            # int64 at ~1e8-row margins (DuckDB's SUM is already
            # HUGEINT, so only the Spark side needed widening); this
            # runs on CELL-cardinality data, so decimal cost is nil
            "exp_milli",
            F.expr(
                "(CAST(__rt AS DECIMAL(38,0)) * __ct * 1000) DIV __n"
            ),
        )
        .withColumn(
            "chi2_cell_milli",
            F.expr(
                "(CAST(obs * 1000 - exp_milli AS DECIMAL(38,0))"
                " * (obs * 1000 - exp_milli))"
                " DIV greatest(exp_milli, 1)"
            ),
        )
    )
    return staged.select(
        "row_val", "col_val", "obs", "exp_milli", "chi2_cell_milli"
    )


def _doubled_midrank_sums(
    df: DataFrame,
    value_col: str,
    a_flag,
    b_flag,
    n_buckets: int = 1024,
) -> DataFrame:
    """Shared rank machinery for Mann-Whitney / ROC-AUC: pool the
    rows flagged ``a`` and ``b``, rank the pooled INTEGER values
    ascending with midranks for ties, and return a one-row frame
    (n_a, n_b, r_a_doubled) where r_a_doubled is TWICE the sum of
    group-a ranks — doubled so tied midranks (k+0.5) stay exact
    integers; every identity downstream divides the doubling back
    out under DECIMAL(38,0).

    Scale shape: ranks are never materialized per row. The data
    folds to a per-distinct-value histogram (one map-side-combined
    aggregation), and the cumulative pooled count below each value
    comes from a TWO-PHASE prefix sum — equal-width integer buckets
    over [min, max] give per-bucket totals (≤ n_buckets+1 rows,
    windowed on one partition only at THAT bounded size), whose
    exclusive prefix broadcasts back as each bucket's offset; the
    within-bucket window partitions by bucket. No operator ever
    sorts the full distinct-value set on one partition, so a
    100 TB score column with billions of distinct values still
    distributes (the classic distributed prefix-sum; equal-width
    buckets can skew only the intermediate window width, never the
    result).
    """
    h = (
        df.select(
            F.col(value_col).cast("long").alias("v"),
            F.when(a_flag, 1).otherwise(0).cast("long").alias("__a"),
            F.when(b_flag, 1).otherwise(0).cast("long").alias("__b"),
        )
        .filter(F.col("v").isNotNull())
        .filter((F.col("__a") + F.col("__b")) > 0)
        .groupBy("v")
        .agg(
            F.sum("__a").alias("ca"),
            F.sum("__b").alias("cb"),
        )
    )
    bounds = h.agg(F.min("v").alias("v0"), F.max("v").alias("v1"))
    wexpr = f"greatest((v1 - v0 + {n_buckets}) DIV {n_buckets}, 1)"
    hb = h.crossJoin(F.broadcast(bounds)).withColumn(
        "__bkt", F.expr(f"(v - v0) DIV {wexpr}")
    )
    per_bucket = hb.groupBy("__bkt").agg(
        F.sum(F.col("ca") + F.col("cb")).alias("__bn")
    )
    w_off = Window.orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_bucket.select(
        "__bkt",
        F.coalesce(F.sum("__bn").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = Window.partitionBy("__bkt").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    staged = hb.join(F.broadcast(offsets), "__bkt").withColumn(
        "__below",
        F.col("__off")
        + F.sum(F.col("ca") + F.col("cb")).over(w_in)
        - (F.col("ca") + F.col("cb")),
    )
    # doubled midrank-sum contribution of value v for group a:
    # ca * (2*below + (ca+cb) + 1) — the (ties+1)/2 midrank, doubled
    term = (
        F.col("ca")
        * (2 * F.col("__below") + F.col("ca") + F.col("cb") + 1)
    ).cast("decimal(38,0)")
    return staged.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
        F.sum(term).alias("r_a_doubled"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Exact two-sample Mann-Whitney U (Wilcoxon rank-sum) between
    the rows of ``group_a`` and ``group_b``: U_a from the doubled
    midrank sum (u_a_doubled = 2R_a − n_a(n_a+1), an exact integer
    even under ties), its complement u_b_doubled = 2·n_a·n_b −
    u_a_doubled, and the common-language effect size
    P(X_a > X_b) + ½P(X_a = X_b) in exact ppm via DECIMAL(38,0)
    DIV (U is non-negative, so truncate-vs-floor cannot diverge).

    The nonparametric two-sample location test a corpus-drift or
    A/B readout wants when distributions are skewed; one histogram
    aggregation + bounded windows (see _doubled_midrank_sums for
    why no full sort happens).

    Returns one row (n_a, n_b, u_a_doubled, u_b_doubled, cles_ppm).
    """
    core = _doubled_midrank_sums(
        df,
        value_col,
        F.col(group_col) == F.lit(group_a),
        F.col(group_col) == F.lit(group_b),
    )
    ua = (
        f"(r_a_doubled - CAST(n_a AS {_D}) * (CAST(n_a AS {_D}) + 1))"
    )
    return core.select(
        "n_a",
        "n_b",
        F.expr(f"CAST({ua} AS BIGINT)").alias("u_a_doubled"),
        F.expr(
            f"CAST(2 * CAST(n_a AS {_D}) * CAST(n_b AS {_D}) - {ua}"
            " AS BIGINT)"
        ).alias("u_b_doubled"),
        F.expr(
            f"CAST(({ua} * 1000000)"
            f" DIV (2 * CAST(n_a AS {_D}) * CAST(n_b AS {_D}))"
            " AS BIGINT)"
        ).alias("cles_ppm"),
    )


def roc_auc(df: DataFrame, label_col, score_col: str) -> DataFrame:
    """Exact ROC-AUC of an integer score against a boolean label via
    the rank-sum identity AUC = (R_pos − n_pos(n_pos+1)/2) /
    (n_pos·n_neg) — ties get midrank credit (trapezoidal AUC), the
    doubled-integer rank sum keeps everything exact, and the final
    ratio reports in ppm via DECIMAL(38,0) DIV.

    The classifier-calibration readout for a quality gate: feed it
    the gate's score and the downstream keep/drop label and it says
    how much ranking power the score actually has — without ever
    materializing a per-row rank (see _doubled_midrank_sums).

    Returns one row (n_pos, n_neg, r_pos_doubled, auc_ppm).
    """
    lbl = label_col if not isinstance(label_col, str) else F.col(label_col)
    core = _doubled_midrank_sums(df, score_col, lbl, ~lbl)
    ua = (
        f"(r_a_doubled - CAST(n_a AS {_D}) * (CAST(n_a AS {_D}) + 1))"
    )
    return core.select(
        F.col("n_a").alias("n_pos"),
        F.col("n_b").alias("n_neg"),
        F.expr("CAST(r_a_doubled AS BIGINT)").alias("r_pos_doubled"),
        F.expr(
            f"CAST(({ua} * 1000000)"
            f" DIV (2 * CAST(n_a AS {_D}) * CAST(n_b AS {_D}))"
            " AS BIGINT)"
        ).alias("auc_ppm"),
    )


def cohens_kappa(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Exact Cohen's kappa between two categorical raters: observed
    agreement vs the chance agreement implied by the raters'
    marginals, κ = (n·Σdiag − Σ_k r_k·c_k) / (n² − Σ_k r_k·c_k),
    reported in exact ppm with the repo's magnitude-DIV-then-sign
    form (κ is negative when raters agree LESS than chance, and
    truncate-vs-floor integer division diverges on negatives
    across engines).

    The inter-annotator-agreement readout an RLHF labeling pipeline
    runs before trusting preference labels. One fact aggregation to
    the |A|×|B| cell table; marginals and the chance term are joins
    over category-cardinality data, never the fact table.

    Returns one row (n, agree, chance_pairs, kappa_ppm).
    """
    cells = (
        df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
        .groupBy(F.col(a_col).alias("ra"), F.col(b_col).alias("rb"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    ra = cells.groupBy(F.col("ra").alias("k")).agg(
        F.sum("cnt").cast("long").alias("r_k")
    )
    cb = cells.groupBy(F.col("rb").alias("k2")).agg(
        F.sum("cnt").cast("long").alias("c_k")
    )
    # categories absent from one rater contribute r_k*c_k = 0 — the
    # inner join drops exactly those zero terms
    chance = ra.join(cb, F.col("k") == F.col("k2")).agg(
        F.sum(
            F.col("r_k").cast("decimal(38,0)") * F.col("c_k")
        ).alias("chance_pairs")
    )
    tot = cells.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.when(F.col("ra") == F.col("rb"), F.col("cnt")))
        .cast("long")
        .alias("agree"),
    )
    num = (
        f"(CAST(n AS {_D}) * CAST(coalesce(agree, 0) AS {_D})"
        " - chance_pairs)"
    )
    den = f"(CAST(n AS {_D}) * CAST(n AS {_D}) - chance_pairs)"
    mag = f"CAST((abs({num}) * 1000000) DIV {den} AS BIGINT)"
    return tot.crossJoin(F.broadcast(chance)).select(
        "n",
        F.coalesce(F.col("agree"), F.lit(0)).cast("long").alias("agree"),
        F.col("chance_pairs").cast("long").alias("chance_pairs"),
        F.expr(
            f"CASE WHEN {den} = 0 THEN NULL"
            f" WHEN {num} < 0 THEN -{mag} ELSE {mag} END"
        ).alias("kappa_ppm"),
    )


def isqrt_column(d: F.Column) -> F.Column:
    """Exact integer square root of a non-negative DECIMAL(38,0)
    column: seed with the double sqrt, then snap to the true floor
    with a ±2 integer-comparison window. The seed's only error
    sources are the decimal→double cast (≤1 ulp, and engines may
    round that cast differently — the reason a bare FLOOR(SQRT(x))
    is NOT cross-engine safe) and the IEEE sqrt (correctly rounded);
    for d ≤ ~1e30 the combined absolute error is ≪ 1, so the window
    always contains the true floor and the comparisons — pure
    integer arithmetic — pick it identically on every engine.

    Inputs above ~1e30 would need a wider window (seed ulp grows past
    the correction range); callers pre-scale to stay under it.
    """
    s0 = F.floor(F.sqrt(d.cast("double"))).cast(_D)

    def _le(s: F.Column) -> F.Column:
        return (s * s) <= d

    return (
        F.when(_le(s0 + 2), s0 + 2)
        .when(_le(s0 + 1), s0 + 1)
        .when(_le(s0), s0)
        .when(_le(s0 - 1), s0 - 1)
        .otherwise(s0 - 2)
    )


def _isqrt_sql(d: str, big: str = "HUGEINT") -> str:
    """The DuckDB twin of :func:`isqrt_column` as a SQL fragment
    (``d`` must be a bare column reference to keep the text sane)."""
    s0 = f"CAST(FLOOR(SQRT(CAST({d} AS DOUBLE))) AS {big})"
    return (
        f"(CASE WHEN ({s0}+2)*({s0}+2) <= {d} THEN {s0}+2"
        f" WHEN ({s0}+1)*({s0}+1) <= {d} THEN {s0}+1"
        f" WHEN {s0}*{s0} <= {d} THEN {s0}"
        f" WHEN ({s0}-1)*({s0}-1) <= {d} THEN {s0}-1"
        f" ELSE {s0}-2 END)"
    )


def corr_ppb_from_suffstats(n, sx, sy, sxx, syy, sxy) -> F.Column:
    """Pearson correlation from exact integer sufficient statistics,
    reported in ppb under the repo's deterministic integer-sqrt
    convention (bit-identical on any engine, any row order):

        num = n·Sxy − Sx·Sy            (exact, may be negative)
        a   = |num| fdiv n
        qx  = (n·Sxx − Sx²) fdiv n      (qy likewise)
        kx  = 1e9 if qx ≤ 1e9, 1e6 if ≤ 1e15, 1e3 if ≤ 1e21, else 1
        bx  = isqrt(qx·kx²)             (by likewise)
        corr_ppb = sign(num) · (a·kx·ky·1e9) fdiv (bx·by)

    ``fdiv`` is exact decimal floor division, (x − x%y)/y — NOT the
    SQL DIV operator, whose LONG result silently wraps past 9.2e18
    (these quotients reach ~4n³); subtracting the remainder first
    makes the decimal '/' exact (nothing to round), and DuckDB's
    HUGEINT ``//`` is its bit-exact twin on the non-negative operands
    used here. The k-ladder (pure integer comparisons — deterministic
    on every engine, unlike a float log) pre-scales small denominators
    so the isqrt truncation costs ≤ ~3e-11 relative instead of the
    ~1/√q bias a bare isqrt has on short series (a 50-point perfect
    monotone would read 1.0008 without it), while the biggest rung
    keeps qx·kx² within the isqrt ±2-window bound (≤1e30). Valid to
    n ≈ 3e9 rows of ~2n-scaled ranks per group (a·1e9 needs 38
    digits); beyond that the decimal products overflow to NULL rather
    than silently wrapping. Degenerate inputs (constant column:
    den 0) report NULL. All six inputs must already be DECIMAL(38,0)
    columns.
    """
    num = n * sxy - sx * sy

    def fdiv(x: F.Column, y: F.Column) -> F.Column:
        return ((x - (x % y)) / y).cast(_D)

    def ladder(q: F.Column) -> F.Column:
        t21 = F.lit(10**15).cast(_D) * F.lit(10**6)
        return (
            F.when(q <= F.lit(10**9), F.lit(10**9))
            .when(q <= F.lit(10**15), F.lit(10**6))
            .when(q <= t21, F.lit(10**3))
            .otherwise(F.lit(1))
            .cast(_D)
        )

    a = fdiv(F.abs(num), n)
    qx = fdiv(n * sxx - sx * sx, n)
    qy = fdiv(n * syy - sy * sy, n)
    kx = ladder(qx)
    ky = ladder(qy)
    bx = isqrt_column(qx * kx * kx)
    by = isqrt_column(qy * ky * ky)
    mag = fdiv(a * kx * ky * F.lit(1000000000).cast(_D), bx * by)
    return (
        F.when((bx * by) == 0, F.lit(None))
        .when(num < 0, -mag)
        .otherwise(mag)
        .cast("long")
    )


def append_corr_ppb_staged(
    df: DataFrame,
    out_col: str,
    n: str = "__n",
    sx: str = "__sx",
    sy: str = "__sy",
    sxx: str = "__sxx",
    syy: str = "__syy",
    sxy: str = "__sxy",
) -> DataFrame:
    """Append ``out_col`` = :func:`corr_ppb_from_suffstats` over the
    named DECIMAL(38,0) sufficient-statistic columns, evaluated via
    STAGED intermediate columns instead of one inline Column tree.

    Why this exists (guide §1/§5, the stat_partial_corr finding,
    db88894): inlining the corr ladder duplicates its subtrees — the
    isqrt ±2 window alone references its radicand 8x, each radicand
    duplicates the fdiv quotient, so the analyzed tree goes to ~10^4
    nodes and the DRIVER pays seconds of analysis + Janino compile per
    query against sub-second execution (measured on the acf_lags shape
    at sf0.1: 3.5-4.3 s wall inline vs 1.2-1.9 s staged, results
    bit-identical). Each staged step references plain attributes, so
    the tree stays linear. Arithmetic is IDENTICAL to
    corr_ppb_from_suffstats; the one mechanical difference is the
    NULLIF(b_x*b_y, 0) divisor guard — staging evaluates the magnitude
    unconditionally, and a constant column would make the divisor 0
    where the inline when-branch never evaluated it (ANSI % would
    throw); NULL flows to the same NULL the guard returns.

    The ``__cps_*`` staging columns are dropped before returning.
    """
    num, sxc, syc = F.col(n) * F.col(sxy) - F.col(sx) * F.col(sy), F.col(sx), F.col(sy)

    def fdiv(x: F.Column, y: F.Column) -> F.Column:
        return ((x - (x % y)) / y).cast(_D)

    def ladder(q: F.Column) -> F.Column:
        t21 = F.lit(10**15).cast(_D) * F.lit(10**6)
        return (
            F.when(q <= F.lit(10**9), F.lit(10**9))
            .when(q <= F.lit(10**15), F.lit(10**6))
            .when(q <= t21, F.lit(10**3))
            .otherwise(F.lit(1))
            .cast(_D)
        )

    nc = F.col(n)
    cur = (
        df.withColumn("__cps_num", num)
        .withColumn("__cps_a", fdiv(F.abs(F.col("__cps_num")), nc))
        .withColumn("__cps_qx", fdiv(nc * F.col(sxx) - sxc * sxc, nc))
        .withColumn("__cps_qy", fdiv(nc * F.col(syy) - syc * syc, nc))
        .withColumn("__cps_kx", ladder(F.col("__cps_qx")))
        .withColumn("__cps_ky", ladder(F.col("__cps_qy")))
        .withColumn(
            "__cps_bx",
            isqrt_column(F.col("__cps_qx") * F.col("__cps_kx") * F.col("__cps_kx")),
        )
        .withColumn(
            "__cps_by",
            isqrt_column(F.col("__cps_qy") * F.col("__cps_ky") * F.col("__cps_ky")),
        )
        .withColumn(
            "__cps_mag",
            fdiv(
                F.col("__cps_a") * F.col("__cps_kx") * F.col("__cps_ky")
                * F.lit(1000000000).cast(_D),
                F.expr("NULLIF(__cps_bx * __cps_by, 0)").cast(_D),
            ),
        )
        .withColumn(
            out_col,
            F.when(
                (F.col("__cps_bx") * F.col("__cps_by")) == 0, F.lit(None)
            )
            .when(F.col("__cps_num") < 0, -F.col("__cps_mag"))
            .otherwise(F.col("__cps_mag"))
            .cast("long"),
        )
    )
    return cur.drop(
        "__cps_num", "__cps_a", "__cps_qx", "__cps_qy", "__cps_kx",
        "__cps_ky", "__cps_bx", "__cps_by", "__cps_mag",
    )


def _bucketed_below(h: DataFrame, n_buckets: int = 1024) -> DataFrame:
    """Two-phase distributed prefix sum over a value histogram
    ``(v long, c long)``: adds ``__below`` = total count strictly
    below each value, without ever sorting the full distinct-value
    set on one partition (same machinery as _doubled_midrank_sums —
    equal-width buckets give per-bucket totals whose exclusive
    prefix, computed on the ≤n_buckets+1-row bucket table only,
    broadcasts back as offsets; the within-bucket window partitions
    by bucket)."""
    bounds = h.agg(F.min("v").alias("v0"), F.max("v").alias("v1"))
    wexpr = f"greatest((v1 - v0 + {n_buckets}) DIV {n_buckets}, 1)"
    hb = h.crossJoin(F.broadcast(bounds)).withColumn(
        "__bkt", F.expr(f"(v - v0) DIV {wexpr}")
    )
    per_bucket = hb.groupBy("__bkt").agg(F.sum("c").alias("__bn"))
    w_off = Window.orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_bucket.select(
        "__bkt",
        F.coalesce(F.sum("__bn").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = Window.partitionBy("__bkt").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        hb.join(F.broadcast(offsets), "__bkt")
        .withColumn(
            "__below",
            F.col("__off") + F.sum("c").over(w_in) - F.col("c"),
        )
        .drop("__bkt")
    )


def spearman_rho(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Exact-deterministic Spearman rank correlation between two
    integer-valued columns, with average-rank (midrank) tie handling
    — the nonparametric monotone-association readout (quality score
    vs downstream grade, doc length vs dedup cluster size) that
    Pearson gets wrong on skewed data.

    Ranks are never materialized per row: the data folds to a
    per-(x,y)-PAIR histogram (one map-side-combined aggregation);
    each marginal's doubled midranks come from a histogram +
    two-phase bucketed prefix sum (see _bucketed_below — no global
    sort at any cardinality); the pair histogram joins back to the
    two ≤distinct-cardinality rank tables (unhinted: AQE broadcasts
    them when small). Doubling keeps tied midranks (k+½) integral,
    and doubling both axes cancels in ρ. The reported ``rho_ppb``
    follows the corr_ppb_from_suffstats integer-sqrt convention —
    bit-identical across engines, within a few ppb of true ρ.

    Returns one row (n, rho_ppb).
    """
    # NOTE deliberately NOT persisted: the pair histogram is
    # INPUT-cardinality (near-unique axes give one row per fact row)
    # — measured at 20 M rows, caching it costs more than recomputing
    # (88 s vs 51 s cold). The Kneser-Ney cache is the opposite case:
    # a type-cardinality table 60x smaller than the explode that
    # builds it. r10 restructure: the MARGINAL histograms no longer
    # derive from the pair histogram (which made the groupBy(x, y)
    # subtree a three-consumer fan-out, re-executed per consumer —
    # 3 scans AND 3 wide aggregations); each marginal is a direct
    # one-column aggregation of the base scan (sum over y of
    # cnt(x, y) == count(x), so values are identical), leaving the
    # wide pair aggregation with exactly ONE consumer. sf0.1: 7.0 →
    # 6.2 s, and at scale two full-width shuffles disappear.
    base = df.select(
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    pairs = base.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    hx = base.groupBy(F.col("x").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    hy = base.groupBy(F.col("y").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    rx = _bucketed_below(hx).select(
        F.col("v").alias("__xv"),
        (2 * F.col("__below") + F.col("c") + 1).cast(_D).alias("dx"),
    )
    ry = _bucketed_below(hy).select(
        F.col("v").alias("__yv"),
        (2 * F.col("__below") + F.col("c") + 1).cast(_D).alias("dy"),
    )
    joined = pairs.join(rx, pairs["x"] == rx["__xv"]).join(
        ry, pairs["y"] == ry["__yv"]
    )
    c = F.col("cnt").cast(_D)
    s = joined.agg(
        F.sum(c).alias("n"),
        F.sum(c * F.col("dx")).alias("sx"),
        F.sum(c * F.col("dy")).alias("sy"),
        F.sum(c * F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(c * F.col("dy") * F.col("dy")).alias("syy"),
        F.sum(c * F.col("dx") * F.col("dy")).alias("sxy"),
    )
    # staged ladder (append_corr_ppb_staged): identical arithmetic,
    # linear Column tree — the inline form cost ~2.5 s of driver
    # analysis/codegen per build (r10)
    return append_corr_ppb_staged(
        s, "rho_ppb", n="n", sx="sx", sy="sy",
        sxx="sxx", syy="syy", sxy="sxy",
    ).select(F.col("n").cast("long").alias("n"), "rho_ppb")


def cramers_v(df: DataFrame, row_col: str, col_col: str) -> DataFrame:
    """Cramér's V effect size for a contingency table — the
    normalized chi-square, V = sqrt(χ² / (n·min(r−1, c−1))) — in
    exact ppm under the isqrt convention: the chi2_contingency cells
    (per-cell milli-floored, deterministic) fold to one scalar, and
    V_ppm = isqrt((χ²_milli·1e12) DIV (n·m·1000)). Unlike the raw χ²
    (unbounded, grows with n) V lands in [0,1] and compares across
    table sizes — the effect-size companion a drift/bias audit wants
    next to stat_chi2_independence's significance screen.

    One fact aggregation (the cell table), cell-cardinality work
    after. chi2_contingency emits OBSERVED cells only, but an empty
    cell contributes (0−E)²/E = E to the statistic — without that
    mass a perfect diagonal association reads V≈0.82, not 1 — so the
    zero-cell total is recovered from the marginal cross product
    (r×c rows, never the fact table): Σ_all E_milli − Σ_observed
    E_milli, under the same per-cell milli flooring. Degenerate
    tables (single row or column category: m = 0) report NULL.
    Returns one row (n, chi2_milli, df_min, v_ppm).
    """
    cells = chi2_contingency(df, row_col, col_col)
    rows_m = cells.groupBy("row_val").agg(
        F.sum("obs").cast("long").alias("rt")
    )
    cols_m = cells.groupBy("col_val").agg(
        F.sum("obs").cast("long").alias("ct")
    )
    n_tot = cells.agg(F.sum("obs").cast("long").alias("__n"))
    e_all = (
        rows_m.crossJoin(cols_m)
        .crossJoin(F.broadcast(n_tot))
        .agg(
            F.sum(F.expr(
                "(CAST(rt AS DECIMAL(38,0)) * ct * 1000) DIV __n"
            ))
            .cast("long")
            .alias("__e_all")
        )
    )
    agg = cells.agg(
        F.sum("obs").cast("long").alias("n"),
        F.sum("chi2_cell_milli").cast("long").alias("__chi2_obs"),
        F.sum("exp_milli").cast("long").alias("__e_obs"),
        (F.least(
            F.countDistinct("row_val"), F.countDistinct("col_val")
        ) - 1).cast("long").alias("df_min"),
    ).crossJoin(F.broadcast(e_all)).select(
        "n",
        (
            F.col("__chi2_obs") + F.col("__e_all") - F.col("__e_obs")
        ).alias("chi2_milli"),
        "df_min",
    )
    arg = F.expr(
        "(CAST(chi2_milli AS DECIMAL(38,0)) * 1000000000000)"
        " DIV (CAST(n AS DECIMAL(38,0)) * df_min * 1000)"
    ).cast(_D)
    return agg.select(
        "n", "chi2_milli", "df_min",
        # per-cell flooring can overshoot V=1 by ppm-scale amounts
        # ((O*1000 - E_milli) grows when E floors down); clamp so the
        # report stays in [0, 1e6] — the oracle applies the same LEAST
        F.when(F.col("df_min") <= 0, F.lit(None))
        .otherwise(
            F.least(isqrt_column(arg), F.lit(1000000).cast(_D))
        )
        .cast("long")
        .alias("v_ppm"),
    )


def randomization_test_mean_diff(
    df: DataFrame,
    id_col: str,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    reps: int = 49,
    seed: str = "rt",
) -> DataFrame:
    """Deterministic randomization test for the difference of group
    means: ``reps`` label reshuffles, each assigning every row to a
    pseudo-group by an md5 parity bit over (seed, replicate, row id)
    — the Bernoulli-randomization variant of the permutation test
    (group sizes vary binomially instead of being held fixed; same
    null, reproducible across engines/cluster sizes, unlike any
    rand()-based resample). A replicate is 'as extreme' iff
    |mean_diff_rep| ≥ |mean_diff_obs|, compared EXACTLY by decimal
    cross-multiplication (no float division):

        |S_Ar·n_Br − S_Br·n_Ar| · n_A·n_B
          ≥ |S_A·n_B − S_B·n_A| · n_Ar·n_Br

    Replicates with an empty side count as extreme (conservative).
    p_ppm = (1 + extreme)·1e6 DIV (reps+1) — the add-one permutation
    p-value (Phipson & Smyth 2010).

    Shape: one pass for the observed stats; one explode(×reps) + one
    map-side-combinable aggregation for the null distribution —
    corpus×reps rows shuffled once on the replicate key. ``reps``
    bounded (p resolution is 1/(reps+1); 49–199 is standard).
    Returns one row (n_a, n_b, reps, extreme_reps, p_ppm).
    """
    if reps < 1:
        # sequence(0, reps-1) on reps=0 would DESCEND to [0, -1] and
        # silently double the replicate count with a bogus rep id
        raise ValueError(f"reps must be >= 1, got {reps}")
    base = df.filter(
        F.col(group_col).isin(group_a, group_b)
        & F.col(value_col).isNotNull()
    ).select(
        F.col(id_col).cast("string").alias("__id"),
        (F.col(group_col) == F.lit(group_a)).alias("__ga"),
        F.col(value_col).cast("long").alias("__v"),
    )
    obs = base.agg(
        F.sum(F.when(F.col("__ga"), 1).otherwise(0))
        .cast("long").alias("n_a"),
        F.sum(F.when(F.col("__ga"), F.col("__v")).otherwise(0))
        .cast(_D).alias("s_a"),
        F.sum(F.when(~F.col("__ga"), 1).otherwise(0))
        .cast("long").alias("n_b"),
        F.sum(F.when(~F.col("__ga"), F.col("__v")).otherwise(0))
        .cast(_D).alias("s_b"),
    )
    reps_col = F.explode(F.sequence(F.lit(0), F.lit(reps - 1))).alias(
        "__rep"
    )
    # parity of the first md5 hex nibble: a pure string predicate both
    # engines compute identically (the hash_sample idiom)
    assign = F.substring(
        F.md5(
            F.concat(
                F.lit(seed), F.col("__rep").cast("string"),
                F.lit("|"), F.col("__id"),
            )
        ),
        1, 1,
    ).isin("0", "2", "4", "6", "8", "a", "c", "e")
    from etl_script_spark.operators.partitioning import fan_out

    # spread BEFORE the x reps explode: the amplification happens
    # inside the input's scan stage, whose task count comes from file
    # size — a one-file input would run all reps x n md5 draws serial
    # (the gap_fill serial-stage trap; same fix as bootstrap_ci_mean).
    per = (
        fan_out(base).select("__id", "__v", reps_col)
        .withColumn("__pa", assign)
        .groupBy("__rep")
        .agg(
            F.sum(F.when(F.col("__pa"), 1).otherwise(0))
            .cast("long").alias("n_ar"),
            F.sum(F.when(F.col("__pa"), F.col("__v")).otherwise(0))
            .cast(_D).alias("s_ar"),
            F.sum(F.when(~F.col("__pa"), 1).otherwise(0))
            .cast("long").alias("n_br"),
            F.sum(F.when(~F.col("__pa"), F.col("__v")).otherwise(0))
            .cast(_D).alias("s_br"),
        )
    )
    j = per.crossJoin(F.broadcast(obs))
    lhs = (
        F.abs(
            F.col("s_ar") * F.col("n_br") - F.col("s_br") * F.col("n_ar")
        )
        * F.col("n_a").cast(_D) * F.col("n_b")
    )
    rhs = (
        F.abs(F.col("s_a") * F.col("n_b") - F.col("s_b") * F.col("n_a"))
        * F.col("n_ar").cast(_D) * F.col("n_br")
    )
    extreme = (
        (F.col("n_ar") == 0) | (F.col("n_br") == 0) | (lhs >= rhs)
    )
    return j.groupBy("n_a", "n_b").agg(
        F.count(F.lit(1)).cast("long").alias("reps"),
        F.sum(F.when(extreme, 1).otherwise(0))
        .cast("long").alias("extreme_reps"),
    ).select(
        "n_a", "n_b", "reps", "extreme_reps",
        F.expr(
            "CAST(((1 + extreme_reps) * 1000000) DIV (reps + 1)"
            " AS BIGINT)"
        ).alias("p_ppm"),
    )


def trimmed_mean(
    df: DataFrame,
    value_col: str,
    lo_pct: int = 10,
    hi_pct: int = 90,
) -> DataFrame:
    """Exact trimmed mean of an integer-scaled column: drop the lowest
    ``lo_pct``% and highest ``100−hi_pct``% by RANK and average the
    rest — the robust location estimate a latency/amount dashboard
    wants when MAD flags heavy tails. Positions kept are
    ``floor(n·lo/100)+1 .. floor(n·hi/100)`` of the ascending order;
    a value straddling a cut contributes exactly its overlapping
    multiplicity (integer interval intersection on the rank range),
    so the result is EXACT — no interpolation, no float percentile.

    Never sorts rows: the per-value histogram + the two-phase
    bucketed prefix sum (_bucketed_below) give each distinct value
    its rank interval; one aggregation finishes. Mean reported in
    exact micro-units via DECIMAL DIV.

    Returns one row (n, kept_n, trimmed_sum, tmean_micro).
    """
    if not (0 <= lo_pct < hi_pct <= 100):
        raise ValueError(f"need 0 <= lo < hi <= 100, got {lo_pct},{hi_pct}")
    h = (
        df.select(F.col(value_col).cast("long").alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    hb = _bucketed_below(h)
    tot = hb.agg(F.sum("c").cast("long").alias("__n"))
    staged = hb.crossJoin(F.broadcast(tot)).select(
        "v", "c", "__below", "__n",
        F.expr(f"(__n * {lo_pct}) DIV 100").alias("__klo"),
        F.expr(f"(__n * {hi_pct}) DIV 100").alias("__khi"),
    )
    w = F.expr(
        "greatest(0, least(__below + c, __khi)"
        " - greatest(__below + 1, __klo + 1) + 1)"
    )
    agg = staged.select(
        "__n",
        w.alias("__w"),
        (w.cast(_D) * F.col("v")).alias("__wv"),
    ).groupBy("__n").agg(
        F.sum("__w").cast("long").alias("kept_n"),
        F.sum("__wv").cast(_D).alias("trimmed_sum"),
    )
    return agg.select(
        F.col("__n").alias("n"),
        "kept_n",
        F.col("trimmed_sum").cast("long").alias("trimmed_sum"),
        F.expr(
            "CASE WHEN kept_n = 0 THEN NULL"
            " WHEN trimmed_sum < 0 THEN"
            "  -CAST((abs(CAST(trimmed_sum AS DECIMAL(38,0))) * 1000000)"
            "        DIV kept_n AS BIGINT)"
            " ELSE CAST((CAST(trimmed_sum AS DECIMAL(38,0)) * 1000000)"
            "      DIV kept_n AS BIGINT) END"
        ).alias("tmean_micro"),
    )



def pearson_pairwise_ppb(
    df: DataFrame, cols: list[str]
) -> DataFrame:
    """All pairwise Pearson correlations of integer-scaled columns
    from ONE aggregation: the k·(k+3)/2 sufficient statistics (k
    sums, k sums of squares, k·(k−1)/2 cross sums) fold map-side in
    a single pass, then every pair evaluates the integer-sqrt
    corr_ppb convention. The correlation-matrix primitive for
    feature audits — one fact-table pass regardless of k.

    Returns one row with n plus a ``corr_<a>__<b>`` column per pair
    (a before b in ``cols`` order).
    """
    if len(cols) < 2:
        raise ValueError("pearson_pairwise_ppb needs >= 2 columns")
    filt = None
    for c in cols:
        p = F.col(c).isNotNull()
        filt = p if filt is None else (filt & p)
    base = df.filter(filt).select(
        *[F.col(c).cast("long").cast(_D).alias(c) for c in cols]
    )
    aggs = [F.count(F.lit(1)).cast(_D).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c)).alias(f"__s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).alias(f"__q_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"__x_{a}__{b}"))
    # LAZY localCheckpoint cuts the expression tree at the one-row
    # sufficient-stats boundary: each corr_ppb ladder below references
    # its inputs many times (the isqrt ±2 window alone duplicates its
    # radicand 8x), and composing ladders over ladders (partial_corr)
    # goes EXPONENTIAL in Column-tree size — measured 15-23 s of
    # DRIVER-side plan building + ~8 s of Janino compile per run at
    # sf0.1, against ~1.5 s of actual execution. Post-checkpoint the
    # ladders build over plain attribute references.
    s = base.agg(*aggs).localCheckpoint(eager=False)
    # STAGED evaluation of the corr ladders on the one-row frame:
    # inlining corr_ppb_from_suffstats k·(k−1)/2 times duplicates its
    # subtrees (the isqrt window alone references its radicand 8x)
    # and the Python Column construction goes to ~10⁴ py4j calls —
    # measured 7-18 s of DRIVER time per build at k=3. Each staged
    # step below references plain attributes, so the tree stays
    # linear; Catalyst collapses the projects JVM-side for free.
    # Arithmetic is IDENTICAL to corr_ppb_from_suffstats.
    def fdiv(x, y):
        return ((x - (x % y)) / y).cast(_D)

    def ladder(q):
        t21 = F.lit(10**15).cast(_D) * F.lit(10**6)
        return (
            F.when(q <= F.lit(10**9), F.lit(10**9))
            .when(q <= F.lit(10**15), F.lit(10**6))
            .when(q <= t21, F.lit(10**3))
            .otherwise(F.lit(1))
            .cast(_D)
        )

    n = F.col("__n")
    cur = s
    for c in cols:
        cur = cur.withColumn(
            f"__qx_{c}",
            fdiv(n * F.col(f"__q_{c}") - F.col(f"__s_{c}") * F.col(f"__s_{c}"), n),
        )
        cur = cur.withColumn(f"__k_{c}", ladder(F.col(f"__qx_{c}")))
        cur = cur.withColumn(
            f"__b_{c}",
            isqrt_column(
                F.col(f"__qx_{c}") * F.col(f"__k_{c}") * F.col(f"__k_{c}")
            ),
        )
    pair_cols = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            cur = cur.withColumn(
                f"__num_{a}__{b}",
                n * F.col(f"__x_{a}__{b}") - F.col(f"__s_{a}") * F.col(f"__s_{b}"),
            )
            cur = cur.withColumn(
                f"__mag_{a}__{b}",
                fdiv(
                    fdiv(F.abs(F.col(f"__num_{a}__{b}")), n)
                    * F.col(f"__k_{a}") * F.col(f"__k_{b}")
                    * F.lit(1000000000).cast(_D),
                    # NULLIF: staging evaluates this UNCONDITIONALLY;
                    # a constant column makes b zero and ANSI % throws
                    # where the old guarded branch never ran — NULL
                    # flows to the corr guard instead
                    F.expr(f"NULLIF(__b_{a} * __b_{b}, 0)").cast(_D),
                ),
            )
            pair_cols.append(
                F.when(
                    (F.col(f"__b_{a}") * F.col(f"__b_{b}")) == 0, F.lit(None)
                )
                .when(F.col(f"__num_{a}__{b}") < 0, -F.col(f"__mag_{a}__{b}"))
                .otherwise(F.col(f"__mag_{a}__{b}"))
                .cast("long")
                .alias(f"corr_{a}__{b}")
            )
    return cur.select(F.col("__n").cast("long").alias("n"), *pair_cols)


def partial_corr_ppb(
    df: DataFrame, x_col: str, y_col: str, z_col: str
) -> DataFrame:
    """First-order partial correlation r_xy·z — the association
    between x and y with the confounder z held fixed,

        r_xy·z = (r_xy − r_xz·r_zy) / sqrt((1−r_xz²)(1−r_zy²))

    evaluated as a SECOND-STAGE integer convention over the three
    ppb-QUANTIZED pairwise correlations (documented: the quantization
    happens before this formula, so both engines combine identical
    integers — putting the raw-float formula here would re-introduce
    the cross-engine drift the ppb convention exists to kill). With
    R = 1e9: num = r_xy·R − r_xz·r_zy (both terms r·R²), den =
    isqrt(R²−r_xz²) · isqrt(R²−r_zy²), result = sign·(|num|·1e9) fdiv
    den, magnitude-clamped to R (quantized inputs can breach Cauchy
    consistency by ppb-scale amounts near a degenerate denominator) —
    every isqrt input ≤ 1e18, comfortably inside the ±2-window
    bound. Degenerate
    inputs (|r| = 1 with z, or any pairwise corr NULL) report NULL.

    One fact aggregation total (via pearson_pairwise_ppb). Returns
    one row (n, rxy_ppb, rxz_ppb, rzy_ppb, partial_ppb).
    """
    # second tree cut (see pearson_pairwise_ppb): the partial formula
    # squares the corr ladders — without the checkpoint the composed
    # Column tree is ladders-of-ladders and plan building dominates
    pw = pearson_pairwise_ppb(df, [x_col, y_col, z_col])
    rxy = F.col(f"corr_{x_col}__{y_col}").cast(_D)
    rxz = F.col(f"corr_{x_col}__{z_col}").cast(_D)
    rzy = F.col(f"corr_{y_col}__{z_col}").cast(_D)
    R2 = F.lit(10**9).cast(_D) * F.lit(10**9)

    def fdiv(xc, yc):
        return ((xc - (xc % yc)) / yc).cast(_D)

    # staged on the one-row frame (see pearson_pairwise_ppb): each
    # step references attributes, so nothing duplicates
    # units: rxy·R and rxz·rzy are both r·R² — a stray extra factor
    # of R here overflows BIGINT the moment confounding is strong
    cur = (
        pw.withColumn("__num", rxy * F.lit(10**9).cast(_D) - rxz * rzy)
        .withColumn("__bx", isqrt_column(R2 - rxz * rxz))
        .withColumn("__by", isqrt_column(R2 - rzy * rzy))
        .withColumn(
            # clamp to ±1e9: quantized inputs can breach Cauchy
            # consistency by ppb-scale amounts near a tiny denominator
            "__mag",
            F.least(
                fdiv(
                    F.abs(F.col("__num")) * F.lit(10**9).cast(_D),
                    # NULLIF: same unconditional-evaluation guard as
                    # the pairwise mags
                    F.expr("NULLIF(__bx * __by, 0)").cast(_D),
                ),
                F.lit(10**9).cast(_D),
            ),
        )
    )
    partial = (
        F.when(
            rxy.isNull() | rxz.isNull() | rzy.isNull()
            | ((F.col("__bx") * F.col("__by")) == 0),
            F.lit(None),
        )
        .when(F.col("__num") < 0, -F.col("__mag"))
        .otherwise(F.col("__mag"))
        .cast("long")
    )
    return cur.select(
        "n",
        F.col(f"corr_{x_col}__{y_col}").alias("rxy_ppb"),
        F.col(f"corr_{x_col}__{z_col}").alias("rxz_ppb"),
        F.col(f"corr_{y_col}__{z_col}").alias("rzy_ppb"),
        partial.alias("partial_ppb"),
    )


def _guard_group_size(
    df: DataFrame, group_col: str, max_rows: int, op_name: str
) -> DataFrame:
    """Distributed guard for the Θ(n²)-per-group operators: raise at
    EXECUTION time if any group exceeds ``max_rows`` instead of
    silently going quadratic (validate-don't-default, the
    maintain_fingerprint convention). The counts come from a bounded
    map-side-combinable aggregate that broadcast-joins back — NOT a
    window over the fact (the first version's per-group window made
    the self-join input a window child and doubled stat_theil_sen's
    wall, 5.3 → 12.4 s at sf0.1).

    The broadcast side is ONE ROW by construction: the per-group
    counts fold to a global (max count, arg-max group) before the
    raise check, and that single validated row equi-joins back on a
    constant key. (The second version broadcast the full per-group
    count table — group SIZE is bounded but group COUNT is not, and
    100 TB of many small groups — exactly the shape per-group
    statistics serve — makes that broadcast side millions of rows.
    Same size-estimate-is-garbage class the r6 plan audit purged.)
    The validated column rides through the join and a trivial filter
    so the raise_error can't be pruned away."""
    counts = df.groupBy(F.col(group_col).alias("__gk")).agg(
        F.count(F.lit(1)).alias("__gn")
    )
    checked = counts.agg(
        F.max("__gn").alias("__mx"),
        # coalesce: a NULL group key must still name itself in the
        # raise message (concat with NULL would null the whole string)
        F.max_by(
            F.coalesce(F.col("__gk").cast("string"), F.lit("NULL")),
            F.col("__gn"),
        ).alias("__mk"),
    ).select(
        F.lit(1).alias("__one"),
        F.when(
            # NULL max = empty input: nothing to guard, pass 0 through
            F.col("__mx").isNull() | (F.col("__mx") <= max_rows),
            F.coalesce(F.col("__mx"), F.lit(0)),
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"{op_name}: group "),
                    F.col("__mk"),
                    F.lit(" has "),
                    F.col("__mx").cast("string"),
                    F.lit(
                        f" rows, over max_group_rows={max_rows};"
                        " this statistic is Θ(n²) per group"
                        " — pre-aggregate, or raise the bound"
                        " explicitly to accept the quadratic cost"
                    ),
                )
            ).cast("long")
        ).alias("__mxgn"),
    )
    return (
        df.withColumn("__one", F.lit(1))
        .join(F.broadcast(checked), "__one")
        .filter(F.col("__mxgn") >= 0)
        .drop("__one", "__mxgn")
    )


def theil_sen_groups(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    max_group_rows: int | None = 10000,
) -> DataFrame:
    """Per-group Theil–Sen estimator: the MEDIAN of all pairwise
    slopes ``(y_j − y_i)/(x_j − x_i)`` over ``x_i < x_j`` — the robust
    regression line (breakdown point ~29%) that OLS (ols_slope_groups)
    cannot give when a few wild rows own the fit. Sen (1968).

    Slopes are exact integer micro-slopes: sign split from magnitude
    and the magnitude computed with DECIMAL DIV (truncation toward
    zero on BOTH engines — Spark DIV and DuckDB // agree on
    non-negative operands, so negatives go through abs()). The median
    is the LOWER median (position ``(m+1) DIV 2`` of the ascending
    slope order), an order statistic — no float percentile.

    Scale contract: pair generation is an equi-join of the group on
    itself — Θ(n²) PER GROUP. This is inherent to Theil–Sen (every
    pair is the statistic); use it on bounded groups (panels, SKUs,
    per-entity series — the classic guidance ≤ a few 10³ rows/group).
    The join and the median window both key on the group, so groups
    distribute; one group's cost is its own n². The contract is
    ENFORCED: any group over ``max_group_rows`` raises at execution
    time (pass ``None`` to explicitly accept unbounded quadratic
    cost), like maintain_fingerprint's op-code validation.

    Returns (group, n_pairs, slope_micro).
    """
    from pyspark.sql import Window

    b = df.select(
        F.col(group_col).alias("g"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    if max_group_rows is not None:
        if max_group_rows < 2:
            raise ValueError(
                f"max_group_rows must be >= 2, got {max_group_rows}"
            )
        b = _guard_group_size(b, "g", max_group_rows, "theil_sen_groups")
    # Pin the pair-generation parallelism (r10): the guarded relation's
    # INPUT bytes are tiny relative to its Θ(n²) pair OUTPUT, so the
    # planner broadcasts one side and streams the other at the SCAN's
    # width — a single-split file ran the whole quadratic stage in ONE
    # task (sf0.1: 7.8 s wall at ~2.6 cores; AQE's size-based coalesce
    # has the same blind spot when the join shuffles). An explicit
    # hash-repartition on the group key spreads groups over the
    # cluster, is immune to AQE coalescing (user-specified partition
    # count), and doubles as the join/median-window distribution — the
    # downstream Window.partitionBy(g) reuses it, deleting the
    # pairs-sized exchange (sf0.1: 7.8M slope rows no longer shuffle;
    # 7.81 → 2.84 s, results bit-identical). At scale the sort-merge
    # pair join needs this exact hash(g) exchange anyway.
    b = b.repartition(_keyed_width(df), "g")
    pairs = (
        b.alias("i")
        .join(b.alias("j"), F.col("i.g") == F.col("j.g"))
        .filter(F.col("i.x") < F.col("j.x"))
        .select(
            F.col("i.g").alias("g"),
            (F.col("j.y") - F.col("i.y")).alias("dy"),
            (F.col("j.x") - F.col("i.x")).alias("dx"),
        )
    )
    # pure LONG arithmetic, not DECIMAL(38): BigDecimal ops run
    # outside codegen at ~10x the cost per row, and the slope path is
    # the O(n^2)-pairs hot loop. Bound: |dy| * 1e6 must fit int64,
    # i.e. |y_j - y_i| < 9.2e12 — far above any sane integer scale.
    mag = F.expr("(abs(dy) * 1000000) DIV dx")
    slopes = pairs.select(
        "g",
        F.when(F.col("dy") < 0, -mag).otherwise(mag).alias("s"),
    )
    w = Window.partitionBy("g").orderBy(F.col("s").asc())
    ranked = slopes.select(
        "g",
        "s",
        F.row_number().over(w).alias("__r"),
        F.count(F.lit(1)).over(Window.partitionBy("g")).alias("__m"),
    )
    return ranked.filter(
        F.col("__r") == F.expr("(__m + 1) DIV 2")
    ).select(
        F.col("g").alias("group"),
        F.col("__m").cast("long").alias("n_pairs"),
        F.col("s").alias("slope_micro"),
    )


# Poisson(1) CDF at j = 0..6, scaled to 2^32 (floor). A row's
# bootstrap multiplicity in replicate b is the count of thresholds
# <= its 32-bit uniform hash — the standard multiplier-bootstrap
# approximation of multinomial resampling (weights i.i.d. Poisson(1),
# Kleiner et al. JRSS-B 2014 use the same device), capped at 7 by the
# truncated CDF (P(X>7) ~ 1e-5, absorbed into w=7).
_POIS1_CDF_2P32 = (
    1580030168, 3160060337, 3950075421, 4213413783,
    4279248373, 4292415291, 4294609777,
)


def bootstrap_ci_mean(
    df: DataFrame,
    id_col: str,
    value_col: str,
    n_boot: int = 64,
    lo_pct: int = 5,
    hi_pct: int = 95,
    seed: str = "bs",
) -> DataFrame:
    """Percentile bootstrap CI for the mean of a NON-NEGATIVE integer
    column, fully deterministic and engine-portable: replicate ``b``
    weights each row with a Poisson(1) draw decoded from
    ``md5(seed|b|id)`` (inverse-CDF on the first 8 hex digits against
    _POIS1_CDF_2P32), replicate means are exact micro-units via
    DECIMAL DIV, and the CI bounds are ORDER STATISTICS of the
    ``n_boot`` means — no RNG state, no float percentile, identical
    on any engine/cluster size/retry (the hash_sample family
    contract).

    Scale shape: the explode multiplies rows by ``n_boot``, but it
    feeds STRAIGHT into a hash aggregation keyed on ``b`` — map-side
    partial aggregation collapses each task's output to ``n_boot``
    rows, so the shuffle carries n_boot · tasks rows, not n_boot · n.
    The order-statistic window runs on the n_boot-row table.

    Returns one row (n_boot, mean_micro, lo_micro, hi_micro).
    """
    if not (0 <= lo_pct < hi_pct <= 100):
        raise ValueError(f"need 0 <= lo < hi <= 100, got {lo_pct},{hi_pct}")
    if n_boot < 4:
        raise ValueError(f"n_boot must be >= 4, got {n_boot}")
    from pyspark.sql import Window

    u = F.expr(
        f"CAST(conv(substr(md5(concat('{seed}', '|', CAST(__b AS STRING),"
        f" '|', CAST({id_col} AS STRING))), 1, 8), 16, 10) AS BIGINT)"
    )
    w_expr = None
    for c in _POIS1_CDF_2P32:
        term = F.when(F.col("__u") >= F.lit(c), 1).otherwise(0)
        w_expr = term if w_expr is None else w_expr + term
    from etl_script_spark.operators.partitioning import fan_out

    # spread BEFORE the x n_boot explode: the amplification happens
    # inside the input's scan stage, whose task count comes from the
    # file size — a one-file input would run all n_boot x n hash draws
    # serial (the gap_fill serial-stage trap, STRESS.md round-7 bench
    # audit). fan_out is a no-op when the scan is already wide.
    reps = (
        fan_out(
            df.select(F.col(id_col).alias(id_col),
                      F.col(value_col).cast("long").alias("__x"))
            .filter(F.col("__x").isNotNull())
        )
        .select(
            id_col, "__x",
            F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))).alias("__b"),
        )
        .withColumn("__u", u)
        .withColumn("__w", w_expr)
        .groupBy("__b")
        .agg(
            F.sum("__w").cast("long").alias("__wn"),
            F.sum(F.col("__w").cast(_D) * F.col("__x")).cast(_D).alias("__wx"),
        )
        .filter(F.col("__wn") > 0)
        .select(
            F.expr(
                "CAST((CAST(__wx AS DECIMAL(38,0)) * 1000000)"
                " DIV __wn AS BIGINT)"
            ).alias("__m")
        )
    )
    # Order-statistic positions come from the REALIZED replicate
    # count, not the requested n_boot: a replicate whose Poisson
    # weights are all zero (possible only on tiny inputs) is dropped
    # by the __wn > 0 filter, and positions computed from n_boot
    # would then point past the ranked list — hi_micro silently NULL
    # while n_boot reports the smaller count. Both windows run on the
    # <= n_boot-row replicate table, so the extra count is free.
    ranked = (
        reps.withColumn(
            "__r", F.row_number().over(Window.orderBy(F.col("__m").asc()))
        )
        .withColumn(
            "__cnt", F.count(F.lit(1)).over(Window.partitionBy(F.lit(1)))
        )
        .withColumn(
            "__lo_pos", F.expr(f"(__cnt * {lo_pct} + 99) DIV 100")
        )
        .withColumn(
            "__hi_pos",
            F.expr(f"__cnt - ((__cnt * {100 - hi_pct} + 99) DIV 100) + 1"),
        )
    )
    stat = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_boot"),
        F.max(
            F.when(F.col("__r") == F.col("__lo_pos"), F.col("__m"))
        ).alias("lo_micro"),
        F.max(
            F.when(F.col("__r") == F.col("__hi_pos"), F.col("__m"))
        ).alias("hi_micro"),
    )
    base = df.select(F.col(value_col).cast("long").alias("__x")).filter(
        F.col("__x").isNotNull()
    ).agg(
        F.expr(
            "CAST((SUM(CAST(__x AS DECIMAL(38,0))) * 1000000)"
            " DIV COUNT(*) AS BIGINT)"
        ).alias("mean_micro")
    )
    return stat.crossJoin(F.broadcast(base)).select(
        "n_boot", "mean_micro", "lo_micro", "hi_micro"
    )


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Welch's unequal-variance t-test between two groups of an
    integer-scaled column — the A/B-testing workhorse (Welch 1947).
    One aggregation computes each group's (n, Σx, Σx²); everything
    downstream is exact integer arithmetic on those sufficient
    statistics: standard errors in milli² units via DECIMAL DIV, the
    pooled SE through the integer-sqrt ladder (isqrt_column — no
    float sqrt), and the t statistic in exact milli-units with the
    abs/negate truncation contract. The Welch–Satterthwaite df is the
    one float boundary (a ratio of already-exact integers, quantized
    to micro immediately — the repo's standard ln()/ratio policy).

    Scale shape: one map-side-combined aggregation over the fact;
    the two-row group table does the rest. Returns one row
    (n_a, n_b, dmean_micro, t_milli, df_micro).
    """
    g = F.col(group_col)
    x = F.col(value_col).cast("long")
    agg = df.filter(g.isin([group_a, group_b]) & x.isNotNull()).agg(
        *[
            f.alias(n)
            for n, f in {
                "na": F.sum(F.when(g == group_a, 1).otherwise(0)).cast("long"),
                "nb": F.sum(F.when(g == group_b, 1).otherwise(0)).cast("long"),
                # accumulate in DECIMAL(18,0) per row -> DECIMAL(28,0)
                # sum buffer: long sums overflow int64 at ~1e7 rows of
                # 1e6-scale squares, and a DECIMAL(38) buffer falls off
                # the mutable fast path (measured 13x slower); 18-digit
                # rows / 28-digit sums keep codegen AND carry 1e28.
                # Bound: per-row |x| and x^2 must fit 18 digits.
                "sa": F.sum(F.when(g == group_a, x).otherwise(0)
                            .cast("decimal(18,0)")),
                "sb": F.sum(F.when(g == group_b, x).otherwise(0)
                            .cast("decimal(18,0)")),
                "qa": F.sum(F.when(g == group_a, x * x).otherwise(0)
                            .cast("decimal(18,0)")),
                "qb": F.sum(F.when(g == group_b, x * x).otherwise(0)
                            .cast("decimal(18,0)")),
            }.items()
        ]
    )
    # per-group mean (micro) and squared standard error (milli^2):
    # se2_g = var_g / n_g = (n*Q - S^2) * 1e6 DIV (n*(n-1)*n)
    staged = agg.select(
        "na", "nb",
        F.expr(
            "CASE WHEN sa < 0 THEN -((abs(sa) * 1000000) DIV na)"
            " ELSE (sa * 1000000) DIV na END"
        ).alias("ma"),
        F.expr(
            "CASE WHEN sb < 0 THEN -((abs(sb) * 1000000) DIV nb)"
            " ELSE (sb * 1000000) DIV nb END"
        ).alias("mb"),
        # milli^2 units, NOT micro^2: Spark's DIV returns BIGINT, so
        # the quotient must fit a long — micro^2 SEs overflow it for
        # cent-scaled data (DuckDB's // returns HUGEINT and would
        # silently diverge). milli^2 keeps ~1e4 headroom at sd ~ 3e6
        # input units; pre-scale smaller if variances exceed that.
        # the n^2(n-1) denominator is DECIMAL: a long product
        # overflows int64 at ~2.1M rows per group
        F.expr(
            "((na * qa - sa * sa) * 1000000)"
            " DIV (CAST(na AS DECIMAL(38,0)) * (na - 1) * na)"
        ).alias("sea2"),
        F.expr(
            "((nb * qb - sb * sb) * 1000000)"
            " DIV (CAST(nb AS DECIMAL(38,0)) * (nb - 1) * nb)"
        ).alias("seb2"),
    )
    se = isqrt_column(F.expr("CAST(sea2 + seb2 AS DECIMAL(38,0))"))
    out = staged.select(
        "na", "nb",
        (F.col("ma") - F.col("mb")).cast("long").alias("dmean_micro"),
        se.alias("__se"),
        "sea2", "seb2",
    ).select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        "dmean_micro",
        # __se is in MILLI units, dmean in micro: their plain ratio
        # is already t in milli-units
        F.expr(
            "CASE WHEN __se = 0 THEN NULL"
            " WHEN dmean_micro < 0 THEN"
            "  -CAST(abs(CAST(dmean_micro AS DECIMAL(38,0)))"
            "        DIV __se AS BIGINT)"
            " ELSE CAST(CAST(dmean_micro AS DECIMAL(38,0))"
            "      DIV __se AS BIGINT) END"
        ).alias("t_milli"),
        # Welch-Satterthwaite df: the one float boundary — a ratio of
        # exact integers (identical doubles on both engines), micro-
        # quantized immediately
        F.round(
            (
                (F.col("sea2").cast("double") + F.col("seb2").cast("double"))
                * (F.col("sea2").cast("double") + F.col("seb2").cast("double"))
                / (
                    F.col("sea2").cast("double")
                    * F.col("sea2").cast("double")
                    / (F.col("na").cast("double") - 1.0)
                    + F.col("seb2").cast("double")
                    * F.col("seb2").cast("double")
                    / (F.col("nb").cast("double") - 1.0)
                )
            )
            * 1e6
        )
        .cast("long")
        .alias("df_micro"),
    )
    return out


def diff_in_diff(
    df: DataFrame,
    group_col: str,
    treated: Column,
    post: Column,
    value_micro: Column,
) -> DataFrame:
    """Difference-in-differences estimator per group: the treated
    group's pre→post mean change minus the control group's — the
    standard causal readout when treatment assignment is not
    randomized but trends are parallel (Card & Krueger 1994 shape).

    One conditional aggregation computes all four cell sums/counts;
    each cell mean is exact micro via DECIMAL DIV (abs/negate for
    signed values), so the estimate is engine-portable integer
    arithmetic end to end. Empty cells yield NULL (no estimate), not
    a throw — at 100 TB a group with an empty cell is data, not a
    bug.

    Returns (group, n_t_pre, n_t_post, n_c_pre, n_c_post, did_micro).
    """
    cells = {
        "t_post": treated & post,
        "t_pre": treated & ~post,
        "c_post": ~treated & post,
        "c_pre": ~treated & ~post,
    }
    v = value_micro.cast("long")
    # SPLIT-SUM accumulation: every aggregation buffer stays LONG so
    # the grouped HashAggregate keeps whole-stage codegen — a
    # DECIMAL(>18) buffer is object-backed and disabled codegen for
    # the WHOLE input stage (measured 20x on 100M rows); a plain long
    # sum overflows at target scale. Each cell sum is carried as two
    # bounded long sums of the OFFSET-shifted value (w = v + 2^42,
    # w >= 0 by the documented |v| < 2^42 micro bound) split at 2^21,
    # recombined exactly in DECIMAL on the tiny group table:
    # S = (hi*2^21 + lo) - n*2^42. Each partial stays under int64 to
    # ~4e12 rows per cell; past that ANSI overflow errors loudly.
    OFF = 1 << 42
    SPL = 1 << 21
    w = v + F.lit(OFF)
    aggs = []
    for n, cond in cells.items():
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"n_{n}")
        )
        aggs.append(
            F.sum(F.when(cond, w.bitwiseAND(F.lit(SPL - 1))).otherwise(0))
            .cast("long")
            .alias(f"__lo_{n}")
        )
        aggs.append(
            F.sum(F.when(cond, F.shiftrightunsigned(w, 21)).otherwise(0))
            .cast("long")
            .alias(f"__hi_{n}")
        )
    h = df.groupBy(F.col(group_col).alias("group")).agg(*aggs)
    for n in cells:
        h = h.withColumn(
            f"s_{n}",
            F.expr(
                f"CAST(__hi_{n} AS DECIMAL(38,0)) * {SPL} + __lo_{n}"
                f" - CAST(n_{n} AS DECIMAL(38,0)) * {OFF}"
            ),
        )

    def mean(n: str) -> str:
        # exact signed micro mean: truncation toward zero both engines
        return (
            f"CASE WHEN n_{n} = 0 THEN NULL"
            f" WHEN s_{n} < 0 THEN -CAST(abs(s_{n}) DIV n_{n} AS BIGINT)"
            f" ELSE CAST(s_{n} DIV n_{n} AS BIGINT) END"
        )

    return h.select(
        "group",
        F.col("n_t_pre"), F.col("n_t_post"),
        F.col("n_c_pre"), F.col("n_c_post"),
        F.expr(
            f"(({mean('t_post')}) - ({mean('t_pre')}))"
            f" - (({mean('c_post')}) - ({mean('c_pre')}))"
        ).cast("long").alias("did_micro"),
    )


def _sq_scaled_div_cols(df, x_col: str, den_col: str, scale: int,
                        out_col: str):
    """Exact ``(x² · scale) DIV den`` for NON-NEGATIVE decimal x, den
    — as a DECIMAL(38,0) column, with every intermediate DIV's
    (BIGINT) quotient bounded: Spark's DIV returns int64, so the
    one-shot form silently overflows once the quotient passes 9.2e18
    (hit live by the 100 M-row Kruskal-Wallis sweep). Two-level long
    division keeps it exact:

        q1 = x DIV den, r1 = x − q1·den          (q1 ≤ x/den)
        q2 = x·s DIV den, r2 = x·s − q2·den      (q2 ≤ x·s/den)
        x²s DIV den = x·s·q1 + q2·r1 + (r2·r1) DIV den

    — the three DIV quotients are ≤ x/den, ≤ x·s/den, and < den,
    each comfortably int64 for any plausible rank/sufficient-stat
    magnitude; the recombination is pure DECIMAL +/·. DuckDB's //
    is 128-bit, so oracles keep the one-shot form — the
    decomposition is mathematically identical, not a quantization.
    """
    d = (
        df.withColumn("__sq_q1", F.expr(f"{x_col} DIV {den_col}"))
        .withColumn(
            "__sq_r1",
            F.expr(f"{x_col} - CAST(__sq_q1 AS {_D}) * {den_col}"),
        )
        .withColumn("__sq_xs", F.expr(f"{x_col} * {scale}"))
        .withColumn("__sq_q2", F.expr(f"__sq_xs DIV {den_col}"))
        .withColumn(
            "__sq_r2",
            F.expr(f"__sq_xs - CAST(__sq_q2 AS {_D}) * {den_col}"),
        )
        .withColumn(
            out_col,
            F.expr(
                f"__sq_xs * __sq_q1 + CAST(__sq_q2 AS {_D}) * __sq_r1"
                f" + CAST((__sq_r2 * __sq_r1) DIV {den_col} AS {_D})"
            ),
        )
    )
    return d.drop("__sq_q1", "__sq_r1", "__sq_xs", "__sq_q2", "__sq_r2")


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Exact Kruskal-Wallis H test across ALL groups of an integer
    column — the k-sample generalization of Mann-Whitney (Kruskal &
    Wallis 1952): rank the pooled values with midranks, and measure
    how far each group's mean rank sits from the grand mean,

        H = 12/(N(N+1)) · Σ_g n_g·(r̄_g − (N+1)/2)²,

    with the standard tie correction H' = H / (1 − ΣT/(N³−N)),
    T = t³−t per tied value. Everything is exact integer arithmetic
    on DOUBLED rank sums (midranks double to integers); the two DIV
    quantizations (per-group deviation² DIV n_g, tie ratio in ppb)
    are replayed identically by the oracle, so engines agree to the
    bit. Magnitude bound: deviation² ≤ (n_g·N)² must fit DECIMAL(38)
    — holds to ~1e12 pooled rows with balanced groups; the tie
    ratio's N³·1e9 holds to N ≈ 2e9 (beyond that, pre-aggregate or
    accept the uncorrected H, which is itself valid).

    Scale shape: one (group, value) histogram aggregation, one
    per-value histogram, the two-phase bucketed prefix sum (no
    global sort — see _doubled_midrank_sums), then joins over
    value-cardinality tables and a group-cardinality fold. Ranks are
    never materialized per row.

    Returns one row (n_total, n_groups, h_ppm, h_tie_adj_ppm).
    """
    gv = (
        df.select(
            F.col(group_col).alias("g"),
            F.col(value_col).cast("long").alias("v"),
        )
        .filter(F.col("v").isNotNull() & F.col("g").isNotNull())
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("cgv"))
    )
    hv = gv.groupBy("v").agg(F.sum("cgv").alias("c"))
    below = _bucketed_below(hv)
    # doubled midrank of value v = 2*below + c + 1 (exact integer)
    per_gv = gv.join(below, "v").select(
        "g",
        "cgv",
        (
            F.col("cgv").cast(_D)
            * (2 * F.col("__below") + F.col("c") + 1).cast(_D)
        ).alias("__r2c"),
    )
    per_g = per_gv.groupBy("g").agg(
        F.sum("cgv").cast("long").alias("n_g"),
        F.sum("__r2c").cast(_D).alias("r2_g"),
    )
    ties = hv.agg(
        F.sum(
            F.col("c").cast(_D) * F.col("c") * F.col("c") - F.col("c")
        ).alias("s3"),
        F.sum("c").cast("long").alias("n"),
    )
    # q_g = (R2_g − n_g(N+1))² DIV (4·n_g): n_g·(r̄_g − (N+1)/2)²
    # exactly, up to the <1 rank² DIV truncation both engines share
    dev = per_g.crossJoin(F.broadcast(ties)).select(
        "n_g",
        F.expr(
            f"(CAST(r2_g AS {_D})"
            f" - CAST(n_g AS {_D}) * (CAST(n AS {_D}) + 1)) AS d2"
        ).alias("d2"),
        "n",
        "s3",
    )
    # per-group quantization in MILLI rank² (×1000 before DIV): the
    # bare DIV truncates up to 1 rank² per group — ~1% of H on small
    # fixtures; milli keeps the loss sub-ppm. The quotient itself
    # passes int64 at ~1e8 rows (Spark DIV returns BIGINT — caught
    # by the 100 M sweep), so it goes through the exact two-level
    # decomposition; the oracle keeps the one-shot 128-bit // form.
    staged = dev.withColumn("__da", F.expr("abs(d2)")).withColumn(
        "__den", F.expr(f"4 * CAST(n_g AS {_D})")
    )
    staged = _sq_scaled_div_cols(staged, "__da", "__den", 1000, "__q")
    folded = staged.groupBy("n", "s3").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("__q").cast(_D).alias("ssq_milli"),
    )
    return folded.select(
        F.col("n").alias("n_total"),
        "n_groups",
        F.expr(
            f"CAST((12 * ssq_milli * 1000) DIV (CAST(n AS {_D})"
            f" * (CAST(n AS {_D}) + 1)) AS BIGINT)"
        ).alias("h_ppm"),
        F.expr(
            # NULLIF: a constant column makes the tie ratio 0/0 (all
            # rows one value -> s3 = N^3 - N); the adjusted H is then
            # undefined -> NULL, never a DIVIDE_BY_ZERO throw
            f"CAST( ( (12 * ssq_milli * 1000) DIV (CAST(n AS {_D})"
            f" * (CAST(n AS {_D}) + 1)) * 1000000000 )"
            f" DIV NULLIF( ((CAST(n AS {_D})*CAST(n AS {_D})*CAST(n AS {_D})"
            f" - CAST(n AS {_D}) - s3) * 1000000000)"
            f" DIV (CAST(n AS {_D})*CAST(n AS {_D})*CAST(n AS {_D})"
            f" - CAST(n AS {_D})), 0 ) AS BIGINT)"
        ).alias("h_tie_adj_ppm"),
    )


def kendall_tau_groups(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    max_group_rows: int | None = 10000,
) -> DataFrame:
    """Per-group Kendall's τ-b rank correlation — the concordance
    statistic (do x and y ORDER the rows the same way?) with the
    tie-corrected denominator (Kendall 1945):

        τ_b = (C − D) / √((n0 − n1)(n0 − n2)),

    n0 = n(n−1)/2, n1/n2 = Σt(t−1)/2 over x-/y-tie groups. C and D
    come from the pairwise sign products; the denominator goes
    through the exact integer-sqrt ladder (isqrt_column — no float
    sqrt), and τ reports in exact milli with the magnitude-DIV-then-
    sign form (truncation toward zero matches DuckDB on negatives).

    Scale contract: pair generation is an equi-join of the group on
    itself — Θ(n²) PER GROUP, inherent to the statistic (same
    posture as theil_sen_groups): use on bounded groups (panels,
    entities, cohorts ≤ a few 10³ rows). The join, the tie counts,
    and the fold all key on the group, so groups distribute and one
    group's cost is its own n². The contract is ENFORCED: any group
    over ``max_group_rows`` raises at execution time (pass ``None``
    to explicitly accept unbounded quadratic cost).

    Returns (group, n, concordant, discordant, tau_b_milli).
    """
    b = df.select(
        F.col(group_col).alias("g"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    if max_group_rows is not None:
        if max_group_rows < 2:
            raise ValueError(
                f"max_group_rows must be >= 2, got {max_group_rows}"
            )
        b = _guard_group_size(b, "g", max_group_rows, "kendall_tau_groups")
    # Pin the pair-generation parallelism (r10, same finding as
    # theil_sen_groups): the row_number window's ENSURE_REQUIREMENTS
    # exchange carries only the tiny guarded input, so AQE coalesces
    # it to one partition and the window, the Θ(n²) self-join AND the
    # concordance aggregation all run single-task. The explicit
    # hash(g) repartition (user partition count — not coalescible)
    # feeds the window, both join sides, and every per-group
    # aggregation downstream without further exchanges.
    b = b.repartition(_keyed_width(df), "g")
    # stable within-group pair id so each unordered pair counts once:
    # row_number over (x, y) — deterministic even with full-row ties
    w = Window.partitionBy("g").orderBy("x", "y")
    bi = b.withColumn("__i", F.row_number().over(w))
    pairs = (
        bi.alias("i")
        .join(bi.alias("j"), F.col("i.g") == F.col("j.g"))
        .filter(F.col("i.__i") < F.col("j.__i"))
        .select(
            F.col("i.g").alias("g"),
            # sign by DIRECT comparison, never subtraction: the long
            # difference wraps silently at int64 extremes (ANSI off)
            # and would flip concordant/discordant classification
            F.when(F.col("j.x") > F.col("i.x"), F.lit(1))
            .when(F.col("j.x") < F.col("i.x"), F.lit(-1))
            .otherwise(F.lit(0)).cast("long").alias("sx"),
            F.when(F.col("j.y") > F.col("i.y"), F.lit(1))
            .when(F.col("j.y") < F.col("i.y"), F.lit(-1))
            .otherwise(F.lit(0)).cast("long").alias("sy"),
        )
    )
    cd = pairs.groupBy("g").agg(
        F.sum(
            F.when((F.col("sx") * F.col("sy")) > 0, 1).otherwise(0)
        ).cast("long").alias("concordant"),
        F.sum(
            F.when((F.col("sx") * F.col("sy")) < 0, 1).otherwise(0)
        ).cast("long").alias("discordant"),
    )
    nrows = b.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tx = (
        b.groupBy("g", "x")
        .agg(F.count(F.lit(1)).cast(_D).alias("t"))
        .groupBy("g")
        .agg(F.sum(F.expr("t * (t - 1) DIV 2")).alias("n1"))
    )
    ty = (
        b.groupBy("g", "y")
        .agg(F.count(F.lit(1)).cast(_D).alias("t"))
        .groupBy("g")
        .agg(F.sum(F.expr("t * (t - 1) DIV 2")).alias("n2"))
    )
    j = (
        nrows.join(cd, "g", "left")
        .join(tx, "g", "left")
        .join(ty, "g", "left")
        .select(
            "g",
            "n",
            F.coalesce("concordant", F.lit(0)).alias("concordant"),
            F.coalesce("discordant", F.lit(0)).alias("discordant"),
            F.expr(f"CAST(n AS {_D}) * (n - 1) DIV 2").alias("n0"),
            F.coalesce(F.col("n1"), F.lit(0).cast(_D)).alias("n1"),
            F.coalesce(F.col("n2"), F.lit(0).cast(_D)).alias("n2"),
        )
    )
    # pre-scale the radicand by 10^6 so isqrt carries the sqrt to
    # milli precision (bare isqrt floors √380 to 19, a 3% error on
    # small groups — the corr_ppb ladder convention); n0²·10⁶ fits
    # DECIMAL(38) for groups to ~10⁶ rows, far past the n² contract
    den = isqrt_column(
        (F.col("n0") - F.col("n1"))
        * (F.col("n0") - F.col("n2"))
        * F.lit(1000000).cast(_D)
    )
    num = (F.col("concordant") - F.col("discordant")).cast(_D)
    mag = F.expr("(abs(__num) * 1000000) DIV __den")
    return (
        j.withColumn("__num", num)
        .withColumn("__den", den)
        .select(
            F.col("g").alias("group"),
            "n",
            "concordant",
            "discordant",
            F.when(F.col("__den") == 0, F.lit(None))
            .when(F.col("__num") < 0, -mag)
            .otherwise(mag)
            .cast("long")
            .alias("tau_b_milli"),
        )
    )


def cuped_adjusted_means(
    df: DataFrame,
    variant_col: str,
    pre_col: str,
    post_col: str,
) -> DataFrame:
    """CUPED variance reduction for A/B readouts (Deng et al., WSDM
    2013): adjust each unit's post-period metric by its pre-period
    covariate, Y' = Y − θ·(X − X̄), θ = cov(X,Y)/var(X) pooled across
    variants — removes the between-user variance the experiment
    didn't randomize, typically halving the CI width at zero cost.

    Exact integer pipeline: θ in ppm from the pooled sufficient
    statistics (N·Sxy − Sx·Sy)·1e6 DIV (N·Sxx − Sx²) — the sign
    split from the magnitude so truncation matches across engines —
    then each variant's adjusted mean in micro-units from its own
    (n_g, Sy_g, Sx_g) and the global X̄: adj = Ȳ_g − θ·(X̄_g − X̄),
    evaluated as (Sy_g·1e6 DIV n_g) − θ_ppm·((Sx_g·1e6 DIV n_g) −
    (Sx·1e6 DIV N)) DIV 1e6. All quantizations are shared by the
    oracle.

    Scale shape: ONE map-side-combinable aggregation over the fact
    (five decimal sums per variant); the θ fold and the per-variant
    adjustment run on the variant-cardinality table. The cheapest
    possible variance reduction at 100 TB.

    Returns (variant, n, mean_post_micro, adj_mean_post_micro,
    theta_ppm).
    """
    x = F.col(pre_col).cast("long")
    y = F.col(post_col).cast("long")
    per = df.filter(x.isNotNull() & y.isNotNull()).groupBy(
        F.col(variant_col).alias("variant")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x.cast(_D)).alias("sx"),
        F.sum(y.cast(_D)).alias("sy"),
        F.sum(x.cast(_D) * x.cast(_D)).alias("sxx"),
        F.sum(x.cast(_D) * y.cast(_D)).alias("sxy"),
    )
    tot = per.agg(
        F.sum("n").cast(_D).alias("tn"),
        F.sum("sx").alias("tsx"),
        F.sum("sy").alias("tsy"),
        F.sum("sxx").alias("tsxx"),
        F.sum("sxy").alias("tsxy"),
    )
    with_tot = per.crossJoin(F.broadcast(tot))
    theta_num = F.expr("tn * tsxy - tsx * tsy")
    theta_den = F.expr("tn * tsxx - tsx * tsx")
    theta_mag = F.expr("(abs(tn * tsxy - tsx * tsy) * 1000000)"
                       " DIV (tn * tsxx - tsx * tsx)")
    theta = (
        F.when(theta_den == 0, F.lit(0).cast(_D))
        .when(theta_num < 0, -theta_mag)
        .otherwise(theta_mag)
    )
    staged = with_tot.withColumn("theta_ppm", theta)
    mean_y = F.expr(f"(sy * 1000000) DIV CAST(n AS {_D})")
    dx = F.expr(
        f"(sx * 1000000) DIV CAST(n AS {_D}) - (tsx * 1000000) DIV tn"
    )
    adj_shift = F.expr(
        "CASE WHEN theta_ppm * ((sx * 1000000) DIV CAST(n AS"
        f" {_D}) - (tsx * 1000000) DIV tn) < 0 THEN"
        " -((abs(theta_ppm * ((sx * 1000000) DIV CAST(n AS"
        f" {_D}) - (tsx * 1000000) DIV tn))) DIV 1000000)"
        " ELSE (abs(theta_ppm * ((sx * 1000000) DIV CAST(n AS"
        f" {_D}) - (tsx * 1000000) DIV tn))) DIV 1000000 END"
    )
    return staged.select(
        "variant",
        "n",
        mean_y.cast("long").alias("mean_post_micro"),
        (mean_y - adj_shift).cast("long").alias("adj_mean_post_micro"),
        F.col("theta_ppm").cast("long").alias("theta_ppm"),
    )


def brown_forsythe(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Brown-Forsythe test of equal variances across groups — the
    robust Levene variant (deviations from the group MEDIAN, not the
    mean; Brown & Forsythe 1974): one-way ANOVA F on z = |x − med_g|,

        F = [(N−k)/(k−1)] · Σn_g(z̄_g−z̄)² / ΣΣ(z−z̄_g)²,

    the pre-flight check before trusting a pooled-variance t-test or
    a variance-targeting quality gate. The group median is the LOWER
    median (order statistic at (n_g+1) DIV 2) found on the per-group
    value histogram with the bucketed prefix sum — an exact integer,
    no sort, no float percentile. The F statistic folds from exact
    (Σz, Σz²) per group with the shared DIV quantizations (SSB/SSW
    in micro-units), reported in milli.

    Scale shape: one (group, value) histogram aggregation; medians
    come from value-cardinality joins (two-phase prefix sum per
    group); one more pass over the histogram (not the fact) computes
    the z sums. Two fact-table passes total, both map-side
    combinable. Returns one row (n_total, n_groups, f_milli).
    """
    gv = (
        df.select(
            F.col(group_col).alias("g"),
            F.col(value_col).cast("long").alias("v"),
        )
        .filter(F.col("v").isNotNull() & F.col("g").isNotNull())
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = gv.groupBy("g").agg(F.sum("c").cast("long").alias("n_g"))
    # lower median per group: min v with cumulative count >= (n+1)/2.
    # The prefix sum partitions by group; within a group it reuses the
    # bucketed two-phase machinery via a composite ordering — groups
    # are independent, so a per-group window on the VALUE HISTOGRAM
    # (not the fact) is already bounded by the group's distinct values.
    w_cum = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = gv.withColumn("__cum", F.sum("c").over(w_cum)).join(
        F.broadcast(totals), "g"
    )
    med = (
        cum.filter(F.col("__cum") >= F.expr("(n_g + 1) DIV 2"))
        .groupBy("g")
        .agg(F.min("v").alias("med"))
    )
    z = gv.join(F.broadcast(med), "g").select(
        "g",
        "c",
        F.abs(F.col("v") - F.col("med")).cast(_D).alias("z"),
    )
    return _anova_f_on_z(z)


def _anova_f_on_z(z: DataFrame) -> DataFrame:
    """One-way ANOVA F over a (g, c, z) deviation histogram — the
    shared fold behind the Levene-family variance tests
    (brown_forsythe = median centers, levene_center_mean = floor-mean
    centers). z must be a non-negative DECIMAL(38,0); c is the
    multiplicity of that (group, deviation) cell. Returns one row
    (n_total, n_groups, f_milli)."""
    per_g = z.groupBy("g").agg(
        F.sum("c").cast(_D).alias("n_g"),
        F.sum(F.col("c") * F.col("z")).cast(_D).alias("sz"),
        F.sum(F.col("c") * F.col("z") * F.col("z")).cast(_D).alias("szz"),
    )
    # (sz²·1e6) DIV n_g and (s²·1e6) DIV n pass int64 quotients at
    # ~1e8-row margins (Spark DIV returns BIGINT) — both go through
    # the exact two-level decomposition; oracles keep the 128-bit //.
    per_g = _sq_scaled_div_cols(per_g, "sz", "n_g", 1000000, "__a")
    folded = per_g.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("n_g").cast(_D).alias("n"),
        F.sum("__a").cast(_D).alias("a_micro"),
        F.sum("sz").cast(_D).alias("s"),
        F.sum("szz").cast(_D).alias("q"),
    )
    folded = _sq_scaled_div_cols(folded, "s", "n", 1000000, "__sn")
    return folded.select(
        F.col("n").cast("long").alias("n_total"),
        "n_groups",
        F.expr(
            # NULLIF: SSW = 0 (every z equals its group mean — e.g. a
            # constant column) leaves F undefined -> NULL, not a throw
            "CAST( ( (a_micro - __sn)"
            " * (n - n_groups) * 1000 )"
            " DIV NULLIF( (q * 1000000 - a_micro) * (n_groups - 1), 0 )"
            " AS BIGINT)"
        ).alias("f_milli"),
    )


def levene_center_mean(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Levene's test of equal variances with MEAN centers (Levene
    1960) — the classic sibling of brown_forsythe (median centers):
    one-way ANOVA F on z = |x − x̄_g|, more powerful under near-normal
    data, less robust under heavy tails (which is why both belong in
    the battery).

    The center is the FLOOR mean — an exact integer, tdiv(Σx, n_g)
    with the abs/negate truncation convention so Spark DIV and
    DuckDB // agree on negative sums. For cents/micro-scaled inputs
    the center sits within one least-significant unit of the true
    mean, and BOTH engines quantize identically, which is the
    contract that matters; the deviation magnitudes then reuse the
    exact Brown-Forsythe fold unchanged (same DECIMAL budgets: z is
    in the input's own unit).

    Scale shape: one (group, value) histogram aggregation, one
    bounded per-group mean table broadcast back, one fold — two
    map-side-combinable passes, no windows over the fact.

    Returns one row (n_total, n_groups, f_milli).
    """
    gv = (
        df.select(
            F.col(group_col).alias("g"),
            F.col(value_col).cast("long").alias("v"),
        )
        .filter(F.col("v").isNotNull() & F.col("g").isNotNull())
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    means = gv.groupBy("g").agg(
        F.expr(
            # floor-mean with truncation toward zero on both engines
            f"CASE WHEN SUM(CAST(c AS {_D}) * v) < 0"
            f" THEN -((-SUM(CAST(c AS {_D}) * v)) DIV SUM(CAST(c AS {_D})))"
            f" ELSE SUM(CAST(c AS {_D}) * v) DIV SUM(CAST(c AS {_D})) END"
        ).alias("ctr")
    )
    z = gv.join(F.broadcast(means), "g").select(
        "g",
        "c",
        F.abs(F.col("v").cast(_D) - F.col("ctr")).cast(_D).alias("z"),
    )
    return _anova_f_on_z(z)


def mcnemar_test(
    df: DataFrame,
    a_col,
    b_col,
) -> DataFrame:
    """McNemar's test for paired binary outcomes (McNemar 1947): did
    condition A flip relative to condition B more often in one
    direction? Only the DISCORDANT cells matter:

        χ² = (b − c)² / (b + c),

    b = |A ∧ ¬B|, c = |¬A ∧ B|. The workhorse for before/after flags
    on the same population (did the new quality gate pass documents
    the old one failed?) where a plain chi-square of the 2×2 would
    wrongly treat the pairs as independent samples.

    Everything is exact integers; the single ratio reports in ppm via
    DIV (both operands non-negative). NULL when b + c = 0 (no
    discordant pairs — the statistic is undefined, not zero).

    Returns one row (n, b_only, c_only, chi2_ppm).
    """
    flags = df.select(
        F.when(F.col(a_col) if isinstance(a_col, str) else a_col, 1)
        .otherwise(0)
        .alias("a"),
        F.when(F.col(b_col) if isinstance(b_col, str) else b_col, 1)
        .otherwise(0)
        .alias("b"),
    )
    return flags.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr("CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("b_only"),
        F.sum(F.expr("CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("c_only"),
    ).select(
        "n",
        "b_only",
        "c_only",
        F.expr(
            f"CAST(((CAST(b_only AS {_D}) - c_only)"
            f" * (CAST(b_only AS {_D}) - c_only) * 1000000)"
            " DIV NULLIF(CAST(b_only AS DECIMAL(38,0)) + c_only, 0)"
            " AS BIGINT)"
        ).alias("chi2_ppm"),
    )


def cochran_q(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    success_col,
) -> DataFrame:
    """Cochran's Q test (Cochran 1950) — k-treatment generalization of
    McNemar for binary outcomes over matched blocks:

        Q = (k−1) · (k·ΣC_j² − (ΣC_j)²) / (k·ΣR_i − ΣR_i²),

    C_j = column (treatment) success totals, R_i = row (block)
    success totals. Detects whether ANY treatment's success rate
    differs across the blocks — the gate before pairwise McNemars.

    Blocks missing a treatment observation count that cell as 0 (the
    operator densifies over the observed treatment set); duplicate
    (block, treatment) observations OR-fold (success if any). All
    integer arithmetic; the single ratio reports in ppm via DIV.
    NULL when every block has all-equal rows (denominator 0).

    Scale shape: one (block, treatment) aggregation, one per-block
    fold, one per-treatment fold, then scalars — all map-side
    combinable, no windows, no joins beyond a broadcast of the
    treatment count.

    Returns one row (n_blocks, k, q_ppm).
    """
    s = F.col(success_col) if isinstance(success_col, str) else success_col
    cell = (
        df.select(
            F.col(block_col).alias("blk"),
            F.col(treatment_col).alias("trt"),
            F.when(s, 1).otherwise(0).alias("x"),
        )
        .groupBy("blk", "trt")
        .agg(F.max("x").alias("x"))
    )
    k_tbl = cell.agg(
        F.countDistinct("trt").cast("long").alias("k")
    )
    rows = cell.groupBy("blk").agg(F.sum("x").cast(_D).alias("r"))
    row_fold = rows.agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum("r").cast(_D).alias("sr"),
        F.sum(F.col("r") * F.col("r")).cast(_D).alias("srr"),
    )
    cols = cell.groupBy("trt").agg(F.sum("x").cast(_D).alias("cj"))
    col_fold = cols.agg(
        F.sum(F.col("cj") * F.col("cj")).cast(_D).alias("scc")
    )
    return (
        row_fold.crossJoin(F.broadcast(col_fold))
        .crossJoin(F.broadcast(k_tbl))
        .select(
            "n_blocks",
            "k",
            F.expr(
                f"CAST(((CAST(k AS {_D}) - 1)"
                f" * (CAST(k AS {_D}) * scc - sr * sr) * 1000000)"
                f" DIV NULLIF(CAST(k AS {_D}) * sr - srr, 0) AS BIGINT)"
            ).alias("q_ppm"),
        )
    )


def friedman_test(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
) -> DataFrame:
    """Friedman rank test (Friedman 1937) — the nonparametric
    repeated-measures ANOVA: within each block, rank the k treatment
    values; a treatment consistently ranked high/low across blocks
    drives

        χ² = 12/(n·k·(k+1)) · ΣR_j² − 3·n·(k+1),

    R_j = Σ over blocks of treatment j's within-block rank. Ties take
    the AVERAGE rank, carried exactly as DOUBLED ranks (average of
    consecutive integers is a half-integer, so 2·rank is always an
    integer — the _doubled_midrank_sums convention): with R2_j = 2R_j,
    χ²·1e6 = (12e6·ΣR2_j²) DIV (4nk(k+1)) − 3e6·n·(k+1), all exact
    integers until the one DIV.

    Requires every block to observe every treatment exactly once —
    VALIDATED, not defaulted (a missing cell silently shifts every
    rank in its block): blocks with an incomplete or duplicated
    treatment set raise at execution time.

    Scale shape: within-block midranks come from a window over the
    (block) partition — blocks are the natural distribution key and
    each holds exactly k rows, so no two-phase spread is needed.

    Returns one row (n_blocks, k, chi2_ppm).
    """
    b = df.select(
        F.col(block_col).alias("blk"),
        F.col(treatment_col).alias("trt"),
        F.col(value_col).cast("long").alias("v"),
    ).filter(F.col("v").isNotNull())
    k_tbl = b.agg(F.countDistinct("trt").cast("long").alias("k"))
    checked = b.withColumn(
        "__bn",
        F.count(F.lit(1)).over(Window.partitionBy("blk")),
    ).withColumn(
        "__bd",
        F.size(
            F.collect_set("trt").over(Window.partitionBy("blk"))
        ).cast("long"),
    )
    checked = checked.crossJoin(F.broadcast(k_tbl)).filter(
        F.when(
            (F.col("__bn") == F.col("k")) & (F.col("__bd") == F.col("k")),
            F.lit(True),
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("friedman_test: block "),
                    F.col("blk").cast("string"),
                    F.lit(" has "),
                    F.col("__bn").cast("string"),
                    F.lit(" rows / "),
                    F.col("__bd").cast("string"),
                    F.lit(" distinct treatments, expected exactly "),
                    F.col("k").cast("string"),
                    F.lit(" of each — incomplete blocks silently shift"
                          " every rank; densify or filter first"),
                )
            ).cast("boolean")
        )
    )
    # doubled midrank within the block: 2·avg rank of the tie run =
    # (first + last) of the run's 1-based positions
    w_blk = Window.partitionBy("blk").orderBy("v")
    w_tie = Window.partitionBy("blk", "v")
    ranked = checked.select(
        "blk",
        "trt",
        "k",
        (
            F.min(F.row_number().over(w_blk)).over(w_tie)
            + F.max(F.row_number().over(w_blk)).over(w_tie)
        ).cast("long").alias("r2"),
    )
    per_trt = ranked.groupBy("trt").agg(
        F.sum("r2").cast(_D).alias("r2j"),
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.max("k").alias("k"),
    )
    return per_trt.agg(
        F.max("n_blocks").alias("n_blocks"),
        F.max("k").alias("k"),
        F.sum(F.expr("r2j * r2j")).cast(_D).alias("s"),
    ).select(
        "n_blocks",
        "k",
        F.expr(
            f"CAST((12000000 * s) DIV (4 * CAST(n_blocks AS {_D}) * k"
            f" * (k + 1)) - 3000000 * CAST(n_blocks AS {_D}) * (k + 1)"
            " AS BIGINT)"
        ).alias("chi2_ppm"),
    )


def cohens_d_groups(
    df: DataFrame,
    segment_col: str,
    group_col,
    value_col: str,
) -> DataFrame:
    """Per-segment Cohen's d — the standardized mean difference
    between two groups (Cohen 1988), the effect-size companion the
    repo's t-tests report significance without:

        d = (x̄₁ − x̄₀) / s_pooled,
        s_pooled² = ((n₁−1)s₁² + (n₀−1)s₀²) / (n₁+n₀−2).

    From exact per-(segment, group) sufficient stats (n, Σx, Σx²):
    (n−1)s² = Σx² − (Σx)²/n folds through the overflow-safe
    _sq_scaled_div_cols ladder in micro units; the final ratio runs
    magnitude-DIV-then-sign through the exact integer sqrt (the
    welch_ttest ladder), reported in ppm (effect sizes live in
    0.1–2.0, so ppm keeps 6 significant digits). NULL when either
    group is empty/degenerate (pooled variance 0).

    ``group_col`` may be a boolean column/expression (True = group 1).

    Returns (segment, n1, n0, d_ppm).
    """
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    b = df.select(
        F.col(segment_col).alias("seg"),
        F.when(g, 1).otherwise(0).alias("grp"),
        F.col(value_col).cast("long").alias("x"),
    ).filter(F.col("x").isNotNull())
    per = b.groupBy("seg", "grp").agg(
        F.count(F.lit(1)).cast(_D).alias("n"),
        F.sum("x").cast(_D).alias("s"),
        F.sum(F.expr(f"CAST(x AS {_D}) * x")).cast(_D).alias("q"),
    )
    # (s²·1e6) DIV n exactly, then ss_micro = q·1e6 − that (≥ 0 up to
    # the DIV truncation; clamped at 0 like the welch ladder)
    per = _sq_scaled_div_cols(
        per.withColumn("__sabs", F.abs(F.col("s"))), "__sabs", "n",
        1000000, "__sn",
    )
    per = per.select(
        "seg",
        "grp",
        "n",
        "s",
        F.greatest(
            F.expr("q * 1000000 - __sn"), F.lit(0).cast(_D)
        ).alias("ss_micro"),
    )
    one = per.filter(F.col("grp") == 1).select(
        "seg",
        F.col("n").alias("n1"),
        F.col("s").alias("s1"),
        F.col("ss_micro").alias("ss1"),
    )
    zero = per.filter(F.col("grp") == 0).select(
        "seg",
        F.col("n").alias("n0"),
        F.col("s").alias("s0"),
        F.col("ss_micro").alias("ss0"),
    )
    j = one.join(zero, "seg")
    # mean diff in micro: tdiv(s1·1e6, n1) − tdiv(s0·1e6, n0) with the
    # abs/negate convention (sums may be negative)
    tdiv = (
        lambda a, d: f"(CASE WHEN {a} < 0 THEN -((-({a})) DIV {d})"
        f" ELSE ({a}) DIV {d} END)"
    )
    j = j.withColumn(
        "__dm",
        F.expr(
            f"{tdiv('s1 * 1000000', 'n1')} - {tdiv('s0 * 1000000', 'n0')}"
        ).cast(_D),
    ).withColumn(
        # pooled variance in micro units: (ss1 + ss0) / (n1 + n0 − 2).
        # The one-shot DIV's int64 quotient overflows right at fixture
        # scale (segment A at sf0.001: 1.82e22/1960 = 9.31e18, past
        # 9.22e18 — caught by the oracle sweep); two-level long
        # division keeps every sub-quotient bounded, like
        # _sq_scaled_div_cols. DuckDB // is 128-bit; the oracle keeps
        # the one-shot form.
        "__ss", F.expr("ss1 + ss0").cast(_D),
    ).withColumn(
        "__d2", F.expr("NULLIF(n1 + n0 - 2, 0)").cast(_D)
    ).withColumn(
        # split at 1e12: hi = ss/1e12 stays int64 for ss < 9.2e30
        # (ss_micro = n·var·1e6 — ~1e26 even at 1e8 cents-scaled rows)
        "__vhi", F.expr("(__ss DIV 1000000000000)")
    ).withColumn(
        "__vrem", F.expr(f"__ss - CAST(__vhi AS {_D}) * 1000000000000")
    ).withColumn(
        "__vq", F.expr("__vhi DIV __d2")
    ).withColumn(
        "__vr", F.expr(f"__vhi - CAST(__vq AS {_D}) * __d2")
    ).withColumn(
        "__vp",
        F.expr(
            f"CAST(__vq AS {_D}) * 1000000000000"
            f" + CAST((__vr * 1000000000000 + __vrem) DIV __d2 AS {_D})"
        ),
    )
    # d = dm_micro / sqrt(vp_micro · 1e6) → milli via the isqrt ladder
    den = isqrt_column(F.expr("__vp * 1000000").cast(_D))
    mag = F.expr("(abs(__dm) * 1000000) DIV __den")
    return (
        j.withColumn("__den", den)
        .select(
            F.col("seg").alias("segment"),
            F.col("n1").cast("long").alias("n1"),
            F.col("n0").cast("long").alias("n0"),
            F.when(
                F.col("__den").isNull() | (F.col("__den") == 0), F.lit(None)
            )
            .when(F.col("__dm") < 0, -mag)
            .otherwise(mag)
            .cast("long")
            .alias("d_ppm"),
        )
    )


def anova_oneway(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Classic one-way ANOVA F across groups on the RAW values
    (Fisher) — the location test completing the variance-test family
    (brown_forsythe / levene_center_mean test SPREAD; this tests
    MEANS):

        F = [Σn_g(x̄_g−x̄)²/(k−1)] / [ΣΣ(x−x̄_g)²/(N−k)].

    F is invariant under adding a constant to every value, so the
    values shift by the global minimum first — that keeps the input
    to the shared `_anova_f_on_z` fold non-negative (its two-level
    long division is specified for non-negative sums) with ZERO
    change to the statistic; both engines apply the identical shift.

    Scale shape: one (group, value) histogram aggregation, a 1-row
    global-min attach, one fold — same two map-side-combinable
    passes as the Levene family; no windows over the fact.

    Returns one row (n_total, n_groups, f_milli).
    """
    gv = (
        df.select(
            F.col(group_col).alias("g"),
            F.col(value_col).cast("long").alias("v"),
        )
        .filter(F.col("v").isNotNull() & F.col("g").isNotNull())
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    lo = gv.agg(F.min("v").alias("__lo")).select(
        F.lit(1).alias("__one"), "__lo"
    )
    z = (
        gv.withColumn("__one", F.lit(1))
        .join(F.broadcast(lo), "__one")
        .select(
            "g",
            "c",
            (F.col("v").cast(_D) - F.col("__lo")).cast(_D).alias("z"),
        )
    )
    return _anova_f_on_z(z)


def two_proportion_z(
    df: DataFrame,
    group_col: str,
    success_col: str,
) -> DataFrame:
    """Two-proportion z-test (pooled): does the success rate differ
    between the two arms of ``group_col`` (boolean)? The A/B-test
    primitive for binary outcomes — the proportions sibling of
    welch_ttest.

        z = (p̂₁ − p̂₂) / √(p̂(1−p̂)(1/n₁ + 1/n₂)),  p̂ pooled.

    All in exact integer ppm: rates are x·1e6 DIV n, the variance in
    ppm² is p̂_ppm·(1e6−p̂_ppm)·(n₁+n₂) DIV (n₁·n₂) (DECIMAL
    intermediates — the product tops 2.5e20 at 1e9-row arms), the
    square root via the exact isqrt ladder, and the final division
    sign-split so truncation matches DuckDB's // on negatives.

    One aggregation over the fact — sufficient statistics only.
    Returns one row (n1, x1, n2, x2, p1_ppm, p2_ppm, z_milli).
    """
    agg = df.select(
        F.col(group_col).cast("boolean").alias("g"),
        F.col(success_col).cast("boolean").alias("s"),
    ).filter(F.col("g").isNotNull() & F.col("s").isNotNull()).agg(
        F.sum(F.when(F.col("g"), 1).otherwise(0)).cast(_D).alias("n1"),
        F.sum(F.when(F.col("g") & F.col("s"), 1).otherwise(0))
        .cast(_D).alias("x1"),
        F.sum(F.when(~F.col("g"), 1).otherwise(0)).cast(_D).alias("n2"),
        F.sum(F.when((~F.col("g")) & F.col("s"), 1).otherwise(0))
        .cast(_D).alias("x2"),
    )
    cur = (
        agg.withColumn("p1_ppm", F.expr("CAST(x1 * 1000000 DIV NULLIF(n1, 0) AS BIGINT)"))
        .withColumn("p2_ppm", F.expr("CAST(x2 * 1000000 DIV NULLIF(n2, 0) AS BIGINT)"))
        .withColumn(
            "__pp",
            F.expr("CAST((x1 + x2) * 1000000 DIV NULLIF(n1 + n2, 0) AS BIGINT)"),
        )
        .withColumn(
            "__var_ppm2",
            F.expr(
                f"CAST(CAST(__pp AS {_D}) * (1000000 - __pp) * (n1 + n2)"
                f" DIV NULLIF(n1 * n2, 0) AS {_D})"
            ),
        )
        .withColumn("__sd_ppm", isqrt_column(F.col("__var_ppm2")))
        .withColumn("__num", F.expr(f"CAST(p1_ppm - p2_ppm AS {_D}) * 1000"))
    )
    z = (
        F.when(
            F.col("p1_ppm").isNull() | F.col("p2_ppm").isNull()
            | (F.col("__sd_ppm") <= 0),
            F.lit(None),
        )
        .when(
            F.col("__num") < 0,
            -F.expr("CAST((-__num) DIV __sd_ppm AS BIGINT)"),
        )
        .otherwise(F.expr("CAST(__num DIV __sd_ppm AS BIGINT)"))
        .cast("long")
    )
    return cur.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("x1").cast("long").alias("x1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("x2").cast("long").alias("x2"),
        "p1_ppm",
        "p2_ppm",
        z.alias("z_milli"),
    )


def runs_test_groups(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group Wald–Wolfowitz runs test of randomness: walk the
    series in ``order_col`` order, classify each value above/below
    the group's lower MEDIAN (ties at the median drop, the standard
    convention), and count the RUNS — maximal streaks of one side.
    Too few runs = trending/clustered; too many = oscillating. The
    drift check a forecasting pipeline runs before trusting
    residuals.

        μ_R = 1 + 2ab/n,   σ²_R = 2ab(2ab − n) / (n²(n−1)),

    a/b = counts above/below, n = a + b. Everything exact integer:
    the median is the order statistic off the per-group value
    histogram (the brown_forsythe machinery), expectation in milli
    and variance in micro via DECIMAL DIV, z in milli with the exact
    isqrt ladder and the sign-split truncation convention.

    Scale shape: the runs count is inherently sequential per series,
    so the one fact-table window (lag over (group, order)) partitions
    by group — groups distribute, one group's cost is its own sort.
    Everything else folds from (group, value) histograms.

    Returns (group, n_above, n_below, n_runs, expected_milli,
    var_micro, z_milli).
    """
    b = df.select(
        F.col(group_col).alias("g"),
        F.col(order_col).alias("t"),
        F.col(value_col).cast("long").alias("v"),
    ).filter(F.col("v").isNotNull() & F.col("g").isNotNull())
    gv = b.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c"))
    totals = gv.groupBy("g").agg(F.sum("c").cast("long").alias("n_g"))
    w_cum = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    med = (
        gv.withColumn("__cum", F.sum("c").over(w_cum))
        .join(F.broadcast(totals), "g")
        .filter(F.col("__cum") >= F.expr("(n_g + 1) DIV 2"))
        .groupBy("g")
        .agg(F.min("v").alias("med"))
    )
    signed = (
        b.join(F.broadcast(med), "g")
        .filter(F.col("v") != F.col("med"))  # ties at median drop
        .withColumn("__s", (F.col("v") > F.col("med")).cast("int"))
    )
    w_ord = Window.partitionBy("g").orderBy("t")
    runs = (
        signed.withColumn("__prev", F.lag("__s").over(w_ord))
        .groupBy("g")
        .agg(
            F.sum("__s").cast(_D).alias("a"),
            F.sum(F.lit(1) - F.col("__s")).cast(_D).alias("b"),
            (
                F.sum(
                    F.when(
                        F.col("__prev").isNull()
                        | (F.col("__prev") != F.col("__s")),
                        1,
                    ).otherwise(0)
                )
            ).cast("long").alias("n_runs"),
        )
    )
    cur = (
        runs.withColumn("__n", F.expr(f"CAST(a + b AS {_D})"))
        .withColumn(
            "expected_milli",
            F.expr(
                "CAST(1000 + (2000 * a * b) DIV NULLIF(__n, 0) AS BIGINT)"
            ),
        )
        .withColumn(
            "var_micro",
            F.expr(
                "CAST((2 * a * b * (2 * a * b - __n) * 1000000)"
                " DIV NULLIF(__n * __n * (__n - 1), 0) AS BIGINT)"
            ),
        )
        .withColumn(
            "__num",
            F.expr(
                f"CAST(n_runs AS {_D}) * 1000000"
                f" - CAST(expected_milli AS {_D}) * 1000"
            ),
        )
        .withColumn(
            "__sd_milli", isqrt_column(F.expr(f"CAST(var_micro AS {_D})"))
        )
    )
    z = (
        F.when(
            F.col("var_micro").isNull() | (F.col("__sd_milli") <= 0),
            F.lit(None),
        )
        .when(
            # __num is (R−μ)·1e6 and __sd_milli is σ·1e3, so the plain
            # quotient is already z·1e3 — z in exact milli
            F.col("__num") < 0,
            -F.expr("CAST((-__num) DIV __sd_milli AS BIGINT)"),
        )
        .otherwise(F.expr("CAST(__num DIV __sd_milli AS BIGINT)"))
        .cast("long")
    )
    return cur.select(
        F.col("g").alias("group"),
        F.col("a").cast("long").alias("n_above"),
        F.col("b").cast("long").alias("n_below"),
        "n_runs",
        "expected_milli",
        "var_micro",
        z.alias("z_milli"),
    )


def benjamini_hochberg(
    df: DataFrame,
    test_col: str,
    p_ppm_col: str,
    alpha_ppm: int = 50000,
) -> DataFrame:
    """Benjamini–Hochberg FDR control over a table of p-values (BH
    1995): rank the m tests by p ascending, find the largest k with
    p_(k) ≤ k·α/m, reject tests 1..k — THE multiple-testing
    correction for the per-group statistic batteries this module
    produces (run theil_sen/kendall/welch per segment, then gate the
    discoveries here).

    p-values arrive as exact ppm integers (the module's statistic
    convention). Adjusted p is the step-up minimum
    p̃_(i) = min_{j≥i} (p_(j)·m DIV j) capped at 1e6 — a suffix min;
    rejection uses the exact integer cross-multiplied comparison
    p·m ≤ rank·α (no division at all).

    Scale note: the two windows are GLOBAL over the p-value table —
    a multiple-testing table is thousands-to-millions of rows (one
    per test, not per observation), orders of magnitude under fact
    scale; this operator is for the TEST table, never raw data.

    Returns (test, p_ppm, rank, padj_ppm, rejected), rank ascending.
    """
    if not (0 < alpha_ppm <= 1000000):
        raise ValueError(f"alpha_ppm must be in (0, 1e6], got {alpha_ppm}")
    b = df.select(
        F.col(test_col).alias("test"),
        F.col(p_ppm_col).cast("long").alias("p_ppm"),
    ).filter(F.col("p_ppm").isNotNull())
    w_rank = Window.orderBy("p_ppm", "test")
    ranked = (
        b.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .withColumn("__m", F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("long"))
    )
    w_suffix = Window.orderBy(F.col("rank").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    adj = (
        ranked.withColumn(
            "__step",
            F.expr(
                f"CAST(CAST(p_ppm AS {_D}) * __m DIV rank AS BIGINT)"
            ),
        )
        .withColumn(
            "padj_ppm",
            F.least(F.min("__step").over(w_suffix), F.lit(1000000)),
        )
        .withColumn(
            "__hit",
            (
                F.expr(f"CAST(p_ppm AS {_D}) * __m")
                <= F.expr(f"CAST(rank AS {_D}) * {int(alpha_ppm)}")
            ).cast("int"),
        )
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    kmax = F.max(F.when(F.col("__hit") == 1, F.col("rank"))).over(w_all)
    return (
        adj.withColumn(
            "rejected", F.col("rank") <= F.coalesce(kmax, F.lit(0))
        )
        .select("test", "p_ppm", "rank", "padj_ppm", "rejected")
        .orderBy("rank")
    )


def calibration_bins(
    df: DataFrame,
    score_ppm_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Calibration (reliability) table for a probabilistic scorer:
    bin predictions by score, compare each bin's MEAN PREDICTED
    probability with its OBSERVED event rate — the diagram that says
    whether a quality/spam/toxicity classifier's scores can be read
    as probabilities before thresholding a corpus on them (the
    companion QA to roc_auc, which only checks ranking).

    Scores arrive as exact ppm integers in [0, 1e6]; bin =
    score·n_bins DIV 1e6, clamped so score=1e6 lands in the top bin.
    Mean and rate are exact floor divisions (DECIMAL DIV). One
    map-side-combinable aggregation — sufficient statistics per bin,
    no sort, no window.

    Returns (bin, n, mean_score_ppm, event_rate_ppm) ordered by bin.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    b = df.select(
        F.col(score_ppm_col).cast("long").alias("s"),
        F.col(label_col).cast("boolean").alias("y"),
    ).filter(F.col("s").isNotNull() & F.col("y").isNotNull())
    binned = b.withColumn(
        "bin",
        F.least(
            F.expr(f"CAST(s * {int(n_bins)} DIV 1000000 AS BIGINT)"),
            F.lit(n_bins - 1).cast("long"),
        ),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("s").cast(_D).alias("__ss"),
            F.sum(F.when(F.col("y"), 1).otherwise(0)).cast(_D).alias("__ys"),
        )
        .select(
            "bin",
            "n",
            F.expr("CAST(__ss DIV n AS BIGINT)").alias("mean_score_ppm"),
            F.expr(
                "CAST((__ys * 1000000) DIV n AS BIGINT)"
            ).alias("event_rate_ppm"),
        )
        .orderBy("bin")
    )
