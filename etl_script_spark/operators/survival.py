"""Survival analysis: the Kaplan–Meier product-limit estimator.

Survival curves are the churn/retention/time-to-failure readout a
customer-events warehouse reports on (the reference's cohort
retention — events grouped by first-seen period — is the discrete
cousin; KM generalizes it to censored observations). The estimator
(Kaplan & Meier 1958):

    S(t) = Π_{t_i ≤ t, d_i > 0} (n_i − d_i) / n_i,

n_i = subjects still at risk entering time t_i, d_i = events at t_i;
censored subjects leave the risk set without an event.

Engine shape (the thing that matters at 100 TB): the SUBJECT table
never sorts. One map-side-combinable aggregation folds subjects to a
per-(stratum, time) histogram of (events, censored); the risk set is
a suffix sum over that bounded histogram (window partitioned by
stratum over DISTINCT TIMES, not facts); the survival product is the
inherently sequential part, so each stratum folds its bounded time
rows in ONE ordered-array aggregate() pass — the holt_linear_smooth
idiom — with the distinct-time bound ENFORCED (raise, don't silently
collect an unbounded array). Arithmetic is exact integer ppm with
truncating DIV at every step, so Spark and the DuckDB recursive-CTE
oracle are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_D = "DECIMAL(38,0)"


def kaplan_meier_curve(
    df: DataFrame,
    stratum_col: str,
    time_col: str,
    event_col: str,
    max_distinct_times: int = 10000,
) -> DataFrame:
    """Kaplan–Meier curve per stratum: one output row per (stratum,
    distinct time) with the risk set entering that time, the events
    and censorings AT that time, and the survival estimate ppm AFTER
    it — S updating by S' = (S · (n − d)) DIV n (exact; a
    censor-only time multiplies by n/n and is a true no-op, so no
    special case).

    ``event_col`` is boolean: True = the event occurred at ``time``;
    False = the subject was censored then (left observation without
    the event). Any stratum with more than ``max_distinct_times``
    distinct times raises at execution time — the per-stratum fold
    collects its TIME HISTOGRAM (never subjects) into an array, and
    that array must be bounded by contract, the holt/theil-sen
    convention. Coarsen the time grain (days, not ms) to stay under.

    Returns (stratum, t, at_risk, events, censored, surv_ppm) in
    time order within each stratum.
    """
    b = df.select(
        F.col(stratum_col).alias("g"),
        F.col(time_col).cast("long").alias("t"),
        F.col(event_col).cast("boolean").alias("e"),
    ).filter(
        F.col("t").isNotNull() & F.col("e").isNotNull()
        & F.col("g").isNotNull()
    )
    per_t = b.groupBy("g", "t").agg(
        F.sum(F.when(F.col("e"), 1).otherwise(0)).cast("long").alias("d"),
        F.sum(F.when(F.col("e"), 0).otherwise(1)).cast("long").alias("c"),
    )
    # risk set entering t = everyone with time >= t: suffix sum over
    # the per-time histogram (bounded by distinct times per stratum)
    w_suffix = Window.partitionBy("g").orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    h = per_t.withColumn(
        "n", F.sum(F.col("d") + F.col("c")).over(w_suffix)
    )
    per_g = h.groupBy("g").agg(
        F.expr("sort_array(collect_list(struct(t, n, d, c)))").alias("ts"),
        F.count(F.lit(1)).cast("long").alias("nt"),
    )
    per_g = per_g.filter(
        F.when(F.col("nt") <= max_distinct_times, F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("kaplan_meier_curve: stratum "),
                    F.coalesce(F.col("g").cast("string"), F.lit("NULL")),
                    F.lit(" has "),
                    F.col("nt").cast("string"),
                    F.lit(
                        f" distinct times, over max_distinct_times="
                        f"{max_distinct_times}; the survival product"
                        " folds one stratum's time histogram in one"
                        " task — coarsen the time grain or raise the"
                        " bound explicitly"
                    ),
                )
            ).cast("boolean")
        )
    )
    # sequential product fold in ppm; the accumulator carries the
    # running S and the emitted curve rows (n, d, c all non-negative,
    # so DIV == // — no sign split needed)
    new_s = "(acc.s * (x.n - x.d)) DIV x.n"
    fold = (
        "aggregate(ts,"
        " named_struct('s', CAST(1000000 AS BIGINT),"
        " 'out', CAST(array() AS"
        " ARRAY<STRUCT<t: BIGINT, n: BIGINT, d: BIGINT, c: BIGINT,"
        " s: BIGINT>>)),"
        f" (acc, x) -> named_struct('s', CAST({new_s} AS BIGINT),"
        " 'out', array_append(acc.out,"
        f" named_struct('t', x.t, 'n', x.n, 'd', x.d, 'c', x.c,"
        f" 's', CAST({new_s} AS BIGINT)))),"
        " acc -> acc.out)"
    )
    return (
        per_g.withColumn("__curve", F.expr(fold))
        .select("g", F.explode("__curve").alias("pt"))
        .select(
            F.col("g").alias("stratum"),
            F.col("pt.t").alias("t"),
            F.col("pt.n").alias("at_risk"),
            F.col("pt.d").alias("events"),
            F.col("pt.c").alias("censored"),
            F.col("pt.s").alias("surv_ppm"),
        )
    )


def log_rank_test(
    df: DataFrame,
    stratum_col: str,
    time_col: str,
    event_col: str,
) -> DataFrame:
    """Two-group log-rank test (Mantel 1966) — do two survival curves
    differ? The inference companion to kaplan_meier_curve: at every
    pooled event time, compare group 1's observed events with its
    expectation under the null (events split proportionally to risk
    sets):

        O₁ = Σ d₁ₜ,  E₁ = Σ n₁ₜ·dₜ/nₜ,
        V  = Σ n₁ₜ·n₂ₜ·dₜ·(nₜ−dₜ) / (nₜ²·(nₜ−1)),
        z  = (O₁ − E₁)/√V.

    Exactly TWO strata are required — more raises at execution time
    (validate-don't-default); group 1 is the smaller stratum value,
    deterministically. Expectation in exact ppm, variance in exact
    micro (DECIMAL DIV), the root via the isqrt ladder, z sign-split.

    Scale shape: subjects fold once to per-(stratum, time)
    histograms; the pooled time axis and both risk-set suffix sums
    live on that bounded table (times × 2 groups), never on facts.

    Returns one row (n1, n2, o1, e1_ppm, v_micro, z_milli).
    """
    from etl_script_spark.operators.stats import isqrt_column

    b = df.select(
        F.col(stratum_col).alias("g"),
        F.col(time_col).cast("long").alias("t"),
        F.col(event_col).cast("boolean").alias("e"),
    ).filter(
        F.col("t").isNotNull() & F.col("e").isNotNull()
        & F.col("g").isNotNull()
    )
    groups = b.select("g").distinct()
    n_groups = groups.agg(
        F.count(F.lit(1)).alias("__k"),
        F.min(F.col("g").cast("string")).alias("__g1"),
    ).select(
        F.lit(1).alias("__one"),
        F.when(F.col("__k") == 2, F.col("__g1")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("log_rank_test: needs exactly 2 strata, got "),
                    F.col("__k").cast("string"),
                )
            ).cast("string")
        ).alias("__g1"),
    )
    per_gt = b.groupBy("g", "t").agg(
        F.sum(F.when(F.col("e"), 1).otherwise(0)).cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    # dense (time x group) grid so suffix sums see zero cells — both
    # sides bounded per-time histograms, the cross join is times x 2
    times = per_gt.select("t").distinct()
    grid = times.crossJoin(F.broadcast(per_gt.select("g").distinct()))
    filled = grid.join(per_gt, ["g", "t"], "left").fillna(
        {"d": 0, "m": 0}
    )
    w_suffix = Window.partitionBy("g").orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    h = filled.withColumn("n_g", F.sum("m").over(w_suffix))
    # pivot the two groups side by side on the pooled axis
    tagged = h.withColumn("__one", F.lit(1)).join(
        F.broadcast(n_groups), "__one"
    ).withColumn("__is1", F.col("g").cast("string") == F.col("__g1"))
    per_t = tagged.groupBy("t").agg(
        F.sum(F.when(F.col("__is1"), F.col("n_g"))).cast(_D).alias("n1t"),
        F.sum(F.when(~F.col("__is1"), F.col("n_g"))).cast(_D).alias("n2t"),
        F.sum(F.when(F.col("__is1"), F.col("d"))).cast(_D).alias("d1t"),
        F.sum("d").cast(_D).alias("dt"),
    ).withColumn("nt", F.expr(f"CAST(n1t + n2t AS {_D})"))
    folded = per_t.filter(F.col("dt") > 0).agg(
        F.sum("d1t").cast("long").alias("o1"),
        F.sum(
            F.expr("CAST((n1t * dt * 1000000) DIV nt AS BIGINT)")
        ).cast("long").alias("e1_ppm"),
        F.sum(
            F.expr(
                "CAST((n1t * n2t * dt * (nt - dt) * 1000000)"
                " DIV NULLIF(nt * nt * (nt - 1), 0) AS BIGINT)"
            )
        ).cast("long").alias("v_micro"),
    )
    sizes = b.withColumn("__one", F.lit(1)).join(
        F.broadcast(n_groups), "__one"
    ).agg(
        F.sum(
            F.when(F.col("g").cast("string") == F.col("__g1"), 1).otherwise(0)
        ).cast("long").alias("n1"),
        F.sum(
            F.when(F.col("g").cast("string") != F.col("__g1"), 1).otherwise(0)
        ).cast("long").alias("n2"),
    )
    cur = (
        sizes.crossJoin(F.broadcast(folded))
        .withColumn(
            "__num",
            F.expr(f"CAST(o1 AS {_D}) * 1000000 - CAST(e1_ppm AS {_D})"),
        )
        .withColumn(
            "__sd_milli", isqrt_column(F.expr(f"CAST(v_micro AS {_D})"))
        )
    )
    z = (
        F.when(
            F.col("v_micro").isNull() | (F.col("__sd_milli") <= 0),
            F.lit(None),
        )
        .when(
            F.col("__num") < 0,
            -F.expr("CAST((-__num) DIV __sd_milli AS BIGINT)"),
        )
        .otherwise(F.expr("CAST(__num DIV __sd_milli AS BIGINT)"))
        .cast("long")
    )
    return cur.select("n1", "n2", "o1", "e1_ppm", "v_micro",
                      z.alias("z_milli"))
