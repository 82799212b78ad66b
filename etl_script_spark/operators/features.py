"""Per-group feature normalization for training-data prep.

The numeric-hygiene counterpart of the text curation family: before
embeddings/metrics feed a model, columns get winsorized (outlier
caps), z-scored, or min-max scaled — per group (per source, per
language, per feature family), in one or two passes, with the same
cross-engine determinism contract as the rest of the catalog.

Determinism: moments are computed from DECIMAL sums (sum, sum of
squares) and combined into mean/variance with a fixed expression
shape, so both engines derive the same IEEE doubles; the reductions
are order-independent by construction. Quantile-based caps use the
EXACT per-group percentile (sorted-array element), not a sketch —
winsorize thresholds must be reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(28,8)"  # wide: sums of squares overflow 18 digits fast


def group_moments(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """(group, n, mean, var_samp, std) from decimal sums — one
    map-side-combined aggregation; var via the sum-of-squares
    identity over EXACT sums, so partitioning cannot move a bit."""
    agg = df.groupBy(group_col).agg(
        F.count(value_col).alias("n"),
        F.sum(F.col(value_col).cast(_DEC)).alias("__s"),
        F.sum(
            (F.col(value_col).cast(_DEC) * F.col(value_col).cast(_DEC))
        ).alias("__s2"),
    )
    n = F.col("n").cast("double")
    s = F.col("__s").cast("double")
    s2 = F.col("__s2").cast("double")
    mean = s / n
    var = F.when(
        F.col("n") > 1, (s2 - s * s / n) / (n - 1)
    ).otherwise(F.lit(None))
    return agg.select(
        group_col,
        "n",
        mean.alias("mean"),
        var.alias("var_samp"),
        F.sqrt(var).alias("std"),
    )


def zscore(
    df: DataFrame, group_col: str, value_col: str, out_col: str = "z"
) -> DataFrame:
    """Per-group z-score. Groups with n ≤ 1 or zero variance yield
    NULL (no information to scale by — a 0/0 would poison training).
    The moments table is group-cardinality → broadcast-eligible; the
    data side never shuffles. LEFT join (same as winsorize): rows
    with a NULL group key survive with a NULL score — a normalizer
    must never drop rows."""
    m = group_moments(df, group_col, value_col)
    joined = df.join(F.broadcast(m), group_col, "left")
    z = F.when(
        F.col("std") > 0, (F.col(value_col) - F.col("mean")) / F.col("std")
    )
    return joined.select(*df.columns, z.alias(out_col))


def minmax(
    df: DataFrame, group_col: str, value_col: str, out_col: str = "scaled"
) -> DataFrame:
    """Per-group min-max scale to [0, 1]; constant groups yield NULL
    (not 0 — a constant carries no ordering information). LEFT join:
    NULL-group rows survive with a NULL scale (winsorize parity)."""
    m = df.groupBy(group_col).agg(
        F.min(value_col).alias("__lo"), F.max(value_col).alias("__hi")
    )
    joined = df.join(F.broadcast(m), group_col, "left")
    scaled = F.when(
        F.col("__hi") > F.col("__lo"),
        (F.col(value_col) - F.col("__lo")) / (F.col("__hi") - F.col("__lo")),
    )
    return joined.select(*df.columns, scaled.alias(out_col))


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lower_q: float = 0.01,
    upper_q: float = 0.99,
    out_col: str = "capped",
) -> DataFrame:
    """Cap values at the per-group [lower_q, upper_q] RANK-based
    percentiles: the cap is the DATA ELEMENT at rank
    ``floor(q·(n−1)) + 1`` of the sorted group (SQL type-1 quantile)
    — never an interpolated float and never a sketch estimate, so
    caps are reproducible bit-for-bit across engines and runs
    (interpolated quantile_cont arithmetic differs subtly between
    engines; percentile_approx drifts with sketch state — both are
    poison for a threshold other jobs must re-derive).

    One window sort per group + a conditional-max aggregate; at
    100 TB the per-group sorts distribute across the
    group-partitioned shuffle, and the caps table is
    group-cardinality → broadcast back."""
    from pyspark.sql import Window

    # NULL values take no part in rank selection (they would sort
    # first and swallow the lower cap) and come out as NULL — the
    # cap applies to data, absence stays absence
    ranked = (
        df.select(
            F.col(group_col).alias("__g"),
            F.col(value_col).alias("__v"),
        )
        .filter(F.col("__v").isNotNull())
        .select(
            "__g",
            "__v",
            F.row_number().over(
                Window.partitionBy("__g").orderBy("__v")
            ).alias("__rn"),
            F.count(F.lit(1)).over(Window.partitionBy("__g")).alias("__n"),
        )
    )
    k_lo = (F.floor(F.lit(lower_q) * (F.col("__n") - 1)) + 1).cast("int")
    k_hi = (F.floor(F.lit(upper_q) * (F.col("__n") - 1)) + 1).cast("int")
    caps = ranked.groupBy("__g").agg(
        F.max(F.when(F.col("__rn") == k_lo, F.col("__v"))).alias("__plo"),
        F.max(F.when(F.col("__rn") == k_hi, F.col("__v"))).alias("__phi"),
    )
    joined = df.join(
        F.broadcast(caps), F.col(group_col) == F.col("__g"), "left"
    )
    capped = F.when(
        F.col(value_col).isNotNull(),
        F.least(
            F.greatest(F.col(value_col), F.col("__plo")), F.col("__phi")
        ),
    )
    return joined.select(*df.columns, capped.alias(out_col))


def quantile_bin(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_bins: int = 10,
    order_tiebreak: str | None = None,
    out_col: str = "bin",
) -> DataFrame:
    """Equal-frequency discretization: NTILE(n_bins) per group over the
    value order. Rank-based, so it is immune to outliers (unlike
    equal-width binning) and deterministic given a total order —
    ``order_tiebreak`` (a unique id column) breaks value ties so the
    same input always lands in the same bin on any engine. One shuffle
    on the group key; per-group sort is the cost, which is exactly the
    contract NTILE advertises. At 100 TB with few groups, bin by
    precomputed approx-quantile EDGES instead (two scans, no global
    sort) — this exact form is the oracle-able contract."""
    order = [F.col(value_col)] + (
        [F.col(order_tiebreak)] if order_tiebreak else []
    )
    w = Window.partitionBy(group_col).orderBy(*order)
    return df.withColumn(out_col, F.ntile(n_bins).over(w))


def weighted_quantile_groups(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    p_num: int = 1,
    p_den: int = 2,
) -> DataFrame:
    """EXACT weighted quantile per group (default p = 1/2: the
    weighted median): the smallest value v whose cumulative weight
    reaches p of the group's total — ``p_den * cumweight(<= v) >=
    p_num * totweight``, all in integer arithmetic, so any engine
    replays the selection bit-for-bit (no float quantile
    interpolation, no sampling). The robust-center primitive
    ``group_moments``' mean cannot provide when weights are token
    masses or importance weights and the tail is heavy.

    Shape: one (group, value) pre-aggregation collapses ties and
    bounds the window input at distinct-value cardinality, then one
    cumulative-sum window per group and a min-conditional aggregate.
    Two shuffles, both on the group key — the same cost as any exact
    per-group percentile; weights must be non-negative integers
    (raise otherwise is the caller's contract — negative mass has no
    quantile semantics).

    Returns (group_cols..., tot_weight, wq_value).
    """
    if not (0 < p_num <= p_den):
        raise ValueError(f"need 0 < p_num <= p_den, got {p_num}/{p_den}")
    gv = df.groupBy(
        *group_cols, F.col(value_col).alias("__v")
    ).agg(F.sum(F.col(weight_col).cast("long")).alias("__w"))
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*group_cols)
    cum = gv.withColumn("__cw", F.sum("__w").over(w_cum)).withColumn(
        "__tw", F.sum("__w").over(w_tot)
    )
    return (
        cum.groupBy(*group_cols)
        .agg(
            F.max("__tw").alias("tot_weight"),
            F.min(
                F.when(
                    F.col("__cw") * p_den >= F.col("__tw") * p_num,
                    F.col("__v"),
                )
            ).alias("wq_value"),
        )
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Cross-group QUANTILE NORMALIZATION (Bolstad et al.,
    Bioinformatics 2003 — the standard distribution-alignment step
    before comparing feature columns from heterogeneous sources):
    rank every value within its group, then replace it with the MEAN
    of the values holding that rank across ALL groups — afterwards
    every group has an identical value distribution, only the
    rank-assignment (which row got which quantile) differs.

    Exactness: ``value_col`` must be integer-scaled (cents/ppm — the
    repo's money-at-rest discipline); the cross-group rank mean is
    ``(sum * 1000) DIV count`` in exact integer milli-units, so no
    float summation order exists. Groups of unequal size contribute
    only to the ranks they reach (the unmatched-tail convention;
    callers wanting strict Bolstad semantics equalize sizes first).
    Ranks tie-break on ``tiebreak_col`` for a total order both
    engines replay.

    Shape: one window per group (shuffle on group), one aggregation
    keyed by rank (shuffle on rank — ranks are dense integers, no
    skew), one join back on rank. Nothing driver-side; the rank-mean
    table has max-group-size rows and stays distributed.

    Returns the input rows with (rank_in_group, norm_milli) added.
    """
    w = Window.partitionBy(group_col).orderBy(value_col, tiebreak_col)
    ranked = df.withColumn("rank_in_group", F.row_number().over(w))
    means = ranked.groupBy("rank_in_group").agg(
        F.expr(
            f"(SUM(CAST({value_col} AS BIGINT)) * 1000) DIV COUNT(*)"
        ).alias("norm_milli")
    )
    return ranked.join(means, "rank_in_group").select(
        *df.columns, "rank_in_group", "norm_milli"
    )


def abc_classification(
    df: DataFrame,
    group_col: str,
    item_col: str,
    value_col: str,
    a_ppm: int = 800_000,
    b_ppm: int = 950_000,
) -> DataFrame:
    """ABC / Pareto classification per group (the inventory-analysis
    classic): items ranked by descending value within their group;
    class A while the running cumulative share of the group total is
    <= ``a_ppm`` (default 80%), B through ``b_ppm`` (95%), else C.
    The cumulative share is exact integer ppm — ``(cum * 1e6) DIV
    total`` — so the class boundary decision replays bit-for-bit.

    Shape: one cumulative window per group (value desc, item asc for
    a replayable total order) + the group total via an unbounded
    window on the same partitioning — ONE shuffle — then a scan-stage
    classification. ``value_col`` must be integer-scaled and
    non-negative.

    Returns (group, item, value, cum_ppm, abc_class).
    """
    if not 0 < a_ppm < b_ppm <= 1_000_000:
        raise ValueError(f"need 0 < a_ppm < b_ppm <= 1e6: {a_ppm}, {b_ppm}")
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).desc(), F.col(item_col).asc()
    )
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wt = Window.partitionBy(group_col)
    staged = (
        df.withColumn("__cum", F.sum(value_col).over(wc).cast("long"))
        .withColumn("__tot", F.sum(value_col).over(wt).cast("long"))
        .withColumn(
            "cum_ppm",
            F.expr(
                "(__cum * CAST(1000000 AS BIGINT)) DIV greatest(__tot, 1)"
            ),
        )
    )
    return staged.select(
        F.col(group_col).alias("group"),
        F.col(item_col).alias("item"),
        F.col(value_col).cast("long").alias("value"),
        "cum_ppm",
        F.when(F.col("cum_ppm") <= a_ppm, F.lit("A"))
        .when(F.col("cum_ppm") <= b_ppm, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )


def integer_tercile_thresholds(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """One-row (t1, t2) tercile thresholds of an integer column by
    the cumulative-count rule: ``t_k = min(v : 3*cum(v) >= k*total)``
    — the same exact selection as ``weighted_quantile_groups``, both
    cuts in ONE pass. The cumulative comes from the two-phase
    BUCKETED prefix sum (stats._bucketed_below), so a NEAR-UNIQUE
    value domain (balances in cents: distinct-value cardinality ~ row
    count) still distributes — the previous ORDER-BY-everything
    window serialized the whole histogram onto one task; the only
    unpartitioned window now runs over the ≤1025-row bucket table.
    """
    from etl_script_spark.operators.stats import _bucketed_below

    vc = df.groupBy(F.col(value_col).cast("long").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    hb = _bucketed_below(vc)
    tot = hb.agg(F.sum("c").cast("long").alias("__tw"))
    cum = hb.crossJoin(F.broadcast(tot)).select(
        F.col("v").alias("__v"),
        (F.col("__below") + F.col("c")).alias("__cw"),
        "__tw",
    )
    return cum.agg(
        F.min(
            F.when(F.col("__cw") * 3 >= F.col("__tw"), F.col("__v"))
        ).alias("t1"),
        F.min(
            F.when(F.col("__cw") * 3 >= 2 * F.col("__tw"), F.col("__v"))
        ).alias("t2"),
    )


def target_encode_loo(
    df: DataFrame,
    category_col: str,
    target_col: str,
    smoothing: int = 10,
) -> DataFrame:
    """Smoothed LEAVE-ONE-OUT target encoding of a categorical
    feature against an integer (0/1 or integer-scaled) target — the
    classic high-cardinality encoder, with the row's own target
    excluded so the encoding cannot leak the label it is predicting:

        enc_ppm(i) = ((S_c − t_i)·1e6 + m·gm_ppm)
                       DIV (n_c − 1 + m)

    where S_c/n_c are the row's category sum/count, gm_ppm the global
    target mean in ppm, and m the smoothing pseudo-count (singleton
    categories fall back entirely to the prior: n_c−1 = 0). All
    integer arithmetic — exact DECIMAL DIV, no float path — so the
    encoding is reproducible across engines and row orders (a
    training-feature contract: the same row must encode identically
    on backfill and serve).

    Shape: one map-side-combinable aggregation to the category table,
    one scalar aggregation for the prior, then a category-keyed join
    back (unhinted — AQE broadcasts the category table when small; at
    100 TB a billion-category join shuffles on the category key like
    any other enrichment). Returns df + (cat_n, enc_ppm).
    """
    if smoothing < 1:
        # smoothing 0 + a singleton category divides by zero, which
        # ERRORS under ANSI mode rather than returning NULL
        raise ValueError(f"smoothing must be >= 1, got {smoothing}")
    _D = "DECIMAL(38,0)"
    t = F.col(target_col).cast("long")
    cat = df.groupBy(F.col(category_col).alias("__cat")).agg(
        F.count(F.lit(1)).cast("long").alias("cat_n"),
        F.sum(t).cast("long").alias("__cat_sum"),
    )
    g = df.agg(
        F.count(F.lit(1)).cast("long").alias("__gn"),
        F.sum(t).cast("long").alias("__gsum"),
    )
    joined = df.join(
        cat, df[category_col] == cat["__cat"]
    ).crossJoin(F.broadcast(g))
    gm_ppm = f"(CAST(__gsum AS {_D}) * 1000000) DIV __gn"
    enc = (
        f"CAST(((CAST(__cat_sum AS {_D}) - CAST({target_col} AS {_D}))"
        f" * 1000000 + {smoothing} * ({gm_ppm}))"
        f" DIV (cat_n - 1 + {smoothing}) AS BIGINT)"
    )
    return joined.withColumn("enc_ppm", F.expr(enc)).drop(
        "__cat", "__cat_sum", "__gn", "__gsum"
    )


def hashed_feature_buckets(
    df: DataFrame,
    cols: list[str],
    n_buckets: int,
    seed: str = "fh",
) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009): fold an unbounded
    categorical (or categorical combination) into ``n_buckets``
    stable feature ids via an md5 bucket — REPRODUCIBLE across
    engines, runs, and cluster sizes (the hash_sample idiom: first 8
    md5 hex chars as an integer, mod k), unlike any
    engine-internal hash. A pure per-row projection — no shuffle, no
    vocabulary state to version — which is exactly why serving
    pipelines use it: the same row hashes identically at train and
    serve with no dictionary to ship.

    NULLs in any component hash as the literal string '\\0' (distinct
    from 'null' text). Adds ``bucket`` (0..n_buckets−1).
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if not cols:
        raise ValueError("hashed_feature_buckets needs >= 1 column")
    parts: list = [F.lit(seed)]
    for c in cols:
        parts.append(F.lit("|"))
        parts.append(
            F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
        )
    h = F.conv(F.substring(F.md5(F.concat(*parts)), 1, 8), 16, 10)
    return df.withColumn(
        "bucket", (h.cast("long") % n_buckets).cast("int")
    )


def woe_encoding(
    df: DataFrame,
    cat_col: str,
    label: Column,
    alpha: int = 1,
) -> DataFrame:
    """Weight-of-Evidence categorical encoding: per category,
    ``WoE = ln((pos_i + a)/(pos + aK)) − ln((neg_i + a)/(neg + aK))``
    — the scorecard-standard monotone encoding of a category's
    evidence toward a binary label, Laplace-smoothed so empty cells
    stay finite (a = ``alpha``, K = category count). Complements
    ``target_encode_loo``: WoE is log-odds-shaped (additive in a
    logistic model) where LOO is probability-shaped.

    One aggregation over the fact builds the (category, pos, neg)
    histogram; the global totals ride a single-row broadcast; the two
    ln() are quantized to micro-units immediately (int64), the repo's
    standard float-boundary policy — both engines compute ln of the
    IDENTICAL double ratio, so the quantized value is stable.

    Returns (category, n, pos, woe_micro) — plus the information
    value term iv_micro = (pos_share − neg_share) · WoE, the
    feature-screening readout (micro-units, same quantization).
    """
    h = (
        df.select(F.col(cat_col).alias("category"), label.alias("__y"))
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("__y"), 1).otherwise(0))
            .cast("long")
            .alias("pos"),
        )
    )
    tot = h.agg(
        F.sum("pos").cast("long").alias("__p"),
        F.sum(F.col("n") - F.col("pos")).cast("long").alias("__q"),
        F.count(F.lit(1)).cast("long").alias("__k"),
    )
    a = F.lit(alpha)
    ps = (F.col("pos") + a) / (F.col("__p") + a * F.col("__k"))
    qs = (F.col("n") - F.col("pos") + a) / (F.col("__q") + a * F.col("__k"))
    woe = F.round((F.log(ps) - F.log(qs)) * 1e6).cast("long")
    return (
        h.crossJoin(F.broadcast(tot))
        .withColumn("woe_micro", woe)
        .withColumn(
            "iv_micro",
            F.round((ps - qs) * F.col("woe_micro")).cast("long"),
        )
        .select("category", "n", "pos", "woe_micro", "iv_micro")
    )
