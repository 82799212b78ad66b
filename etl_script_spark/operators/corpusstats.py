"""Corpus-level distribution diagnostics: two-sample drift tests and
rank-frequency (Zipf) fit.

These are the QA gates a training-data pipeline runs between corpus
snapshots (old crawl vs new crawl, pre- vs post-filter): has the
length / quality / domain distribution drifted, and does the token
frequency spectrum still look like natural language?

Scale shape (all three operators): one map-side-combinable groupBy
reduces the 100 TB corpus to |distinct values| (KS) or |buckets|
(PSI) or |top-k tokens| (Zipf) rows, and only that reduced frame goes
through the single-partition ordered pass (cumulative window / OLS
aggregate). Nothing here joins or shuffles raw rows twice.

Cross-engine determinism: KS is EXACT INTEGER arithmetic throughout
(cum_a*n_b - cum_b*n_a in DECIMAL(38,0) — no floats, no ties to
break). PSI and the Zipf slope need ln(); each ln is quantized to a
fixed grid (int64 micro-units) immediately, so partial sums are
integer and partition-order-independent — the established
quantized-int pattern (see operators/textstats.py bigram_nll_scores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_D38 = "decimal(38,0)"


def ks_two_sample(df: DataFrame, value_col: str, side_a) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the rows where
    ``side_a`` (a boolean Column) holds and the rest, over the numeric
    ``value_col``. Returns ONE row:

    ``n_a, n_b, ks_num, ks_den, ks_ppb`` where the KS statistic is
    exactly ``ks_num / ks_den`` = max over the merged support of
    |F_a(v) - F_b(v)|, computed as max |cum_a*n_b - cum_b*n_a| over
    n_a*n_b — all integers (DECIMAL(38,0): at 1e12 rows per side the
    cross product is 1e24, past int64), so the result is bit-identical
    on any engine and any partitioning. ``ks_ppb`` is the statistic in
    parts-per-billion (integer floor division); it is NULL when either
    side is empty (the statistic is undefined — check it before
    thresholding).

    Shape: groupBy(value) with two conditional counts (map-side
    combine: the 100 TB input reduces to |distinct values| rows), then
    a single-partition ordered cumulative over the distinct values —
    the unavoidable serial step of any exact CDF comparison; bucket
    ``value_col`` first if its cardinality is itself huge.
    """
    per_v = (
        df.select(
            F.col(value_col).alias("__v"),
            side_a.cast("boolean").alias("__a"),
        )
        .filter(F.col("__v").isNotNull())
        .groupBy("__v")
        .agg(
            F.sum(F.when(F.col("__a"), 1).otherwise(0)).alias("__ca"),
            F.sum(F.when(F.col("__a"), 0).otherwise(1)).alias("__cb"),
        )
    )
    w_cum = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()  # totals over the reduced frame
    cum = per_v.select(
        F.sum("__ca").over(w_cum).cast(_D38).alias("__cuma"),
        F.sum("__cb").over(w_cum).cast(_D38).alias("__cumb"),
        F.sum("__ca").over(w_all).cast(_D38).alias("__na"),
        F.sum("__cb").over(w_all).cast(_D38).alias("__nb"),
    )
    diff = F.abs(
        F.col("__cuma") * F.col("__nb") - F.col("__cumb") * F.col("__na")
    )
    base = cum.agg(
        F.max(F.col("__na")).cast("long").alias("n_a"),
        F.max(F.col("__nb")).cast("long").alias("n_b"),
        F.max(diff).alias("ks_num"),
        F.max(F.col("__na") * F.col("__nb")).alias("ks_den"),
    )
    # integral DIV, not decimal '/': Spark rounds a decimal quotient to
    # the result scale BEFORE floor(), which can disagree with true
    # floor division within ~1e-6 of an integer; DIV is exact (the
    # graph.py PageRank lesson). All operands positive -> DIV == //.
    # nullif: an empty side makes ks_den 0 and the KS statistic
    # undefined — emit NULL ks_ppb (the caller's signal that the split
    # predicate matched nothing) instead of an ANSI DIVIDE_BY_ZERO.
    return base.withColumn(
        "ks_ppb",
        F.expr(
            "CAST((ks_num * CAST(1000000000 AS DECIMAL(38,0)))"
            " DIV nullif(ks_den, 0) AS LONG)"
        ),
    )


def psi_drift(df: DataFrame, bucket_col, side_a) -> DataFrame:
    """Population Stability Index between the ``side_a`` rows and the
    rest, over the (low-cardinality) buckets given by ``bucket_col``
    (a Column). Returns one row per bucket:

    per bucket: ``bucket, c_a, c_b, psi_term_micro`` — the bucket's
    contribution (p_a - p_b) * ln(p_a / p_b) in integer micro-units.
    The headline index is the SUM of ``psi_term_micro`` over the
    returned rows — left to the caller so per-bucket attribution
    survives (>= 0 always;
    ~< 0.1 stable, > 0.25 major shift, the standard reading).

    Laplace smoothing (+1 per bucket on both sides, denominator
    n + |buckets|) keeps every term finite when a bucket is empty on
    one side — the smoothed probabilities are exact dyadic-rational
    divisions, identical on any IEEE engine; the single ln per bucket
    is quantized to micro-units at once, so the per-bucket term is an
    int64 and the total is partition-order-independent.
    """
    per_b = (
        df.select(bucket_col.alias("bucket"), side_a.cast("boolean").alias("__a"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("__a"), 1).otherwise(0)).alias("c_a"),
            F.sum(F.when(F.col("__a"), 0).otherwise(1)).alias("c_b"),
        )
    )
    w_all = Window.partitionBy()
    sm = per_b.select(
        "bucket",
        "c_a",
        "c_b",
        (
            (F.col("c_a") + 1).cast("double")
            / (F.sum("c_a").over(w_all) + F.count(F.lit(1)).over(w_all)).cast(
                "double"
            )
        ).alias("__pa"),
        (
            (F.col("c_b") + 1).cast("double")
            / (F.sum("c_b").over(w_all) + F.count(F.lit(1)).over(w_all)).cast(
                "double"
            )
        ).alias("__pb"),
    )
    term = (F.col("__pa") - F.col("__pb")) * F.log(
        F.col("__pa") / F.col("__pb")
    )
    return sm.select(
        "bucket",
        "c_a",
        "c_b",
        F.round(term * 1e6).cast("long").alias("psi_term_micro"),
    )


def zipf_slope(
    df: DataFrame, text_col: str, top_k: int = 1000, min_rank: int = 10
) -> DataFrame:
    """Zipf rank-frequency fit over whitespace tokens: the OLS slope of
    ln(frequency) on ln(rank) across ranks ``min_rank..top_k`` (the
    head of the spectrum is known to bend away from the power law, so
    the fit conventionally starts past it). Natural-language corpora
    sit near slope -1; a corpus whose slope drifts toward 0 (flat =
    template/boilerplate spam) or below -1.5 (degenerate vocabulary)
    fails QA. Returns ONE row: ``n_ranks, slope_ppb, intercept_ppb``
    (NULL slope/intercept when fewer than two ranks survive
    ``min_rank`` — a vocabulary that small has no spectrum to fit).

    Shape: one token-count aggregation (map-side combine) reduces the
    corpus to its vocabulary; TakeOrdered-style ranking keeps the top
    ``top_k`` (count desc, token asc tie-break — deterministic); the
    OLS runs as one aggregate over <= top_k rows. ln(rank) and
    ln(count) are quantized to nano-units (int64) immediately; the
    OLS moment sums are DECIMAL(38,0) products of those int64s, so
    the slope is engine- and partition-order-independent.
    """
    if top_k <= min_rank:
        raise ValueError(f"top_k={top_k} must exceed min_rank={min_rank}")
    toks = df.select(
        F.explode(
            F.split(F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " ")), " ")
        ).alias("__t")
    ).filter(F.col("__t") != "")
    freq = toks.groupBy("__t").agg(F.count(F.lit(1)).alias("__c"))
    ranked = (
        freq.orderBy(F.col("__c").desc(), F.col("__t").asc())
        .limit(top_k)
        .select(
            "__c",
            F.row_number()
            .over(Window.orderBy(F.col("__c").desc(), F.col("__t").asc()))
            .alias("__r"),
        )
        .filter(F.col("__r") >= min_rank)
    )
    # nano-quantized logs -> exact integer OLS moments
    x = F.round(F.log(F.col("__r").cast("double")) * 1e9).cast("long")
    y = F.round(F.log(F.col("__c").cast("double")) * 1e9).cast("long")
    pts = ranked.select(
        x.cast(_D38).alias("__x"), y.cast(_D38).alias("__y")
    )
    agg = pts.agg(
        F.count(F.lit(1)).cast(_D38).alias("n"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
    )
    # sign-split round-toward-zero ppb division: DIV truncates toward
    # zero while floor division floors, and the Zipf slope is negative
    # — dividing |num| (positive: truncate == floor on both engines)
    # and re-applying the sign is the only form the two engines agree
    # on bit-for-bit. Oracles must replay the same abs//sign split.
    moments = agg.withColumn(
        "__num", F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).withColumn(
        "__den", F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    # nullif: a degenerate spectrum (fewer than 2 surviving ranks, or
    # all-identical points) has zero OLS variance — slope undefined,
    # emit NULL instead of an ANSI DIVIDE_BY_ZERO
    slope_ppb = F.expr(
        "CAST(CASE WHEN __num < 0 THEN "
        "-((-__num * CAST(1000000000 AS DECIMAL(38,0)))"
        " DIV nullif(__den, 0)) "
        "ELSE (__num * CAST(1000000000 AS DECIMAL(38,0)))"
        " DIV nullif(__den, 0) "
        "END AS LONG)"
    )
    # intercept = (sy - slope*sx) / n in the same nano units as x/y:
    # reuse the integer slope_ppb so both engines derive it identically
    with_slope = moments.withColumn("slope_ppb", slope_ppb).withColumn(
        "__inum",
        F.col("sy") * F.lit(1_000_000_000).cast(_D38)
        - F.col("slope_ppb").cast(_D38) * F.col("sx"),
    )
    intercept_ppb = F.expr(
        "CAST(CASE WHEN __inum < 0 THEN "
        "-((-__inum) DIV nullif(n * CAST(1000000000 AS DECIMAL(38,0)), 0)) "
        "ELSE __inum DIV nullif(n * CAST(1000000000 AS DECIMAL(38,0)), 0) "
        "END AS LONG)"
    )
    return with_slope.select(
        F.col("n").cast("long").alias("n_ranks"),
        F.col("slope_ppb"),
        intercept_ppb.alias("intercept_ppb"),
    )


def heaps_curve(
    df: DataFrame, text_col: str, id_col: str, n_points: int = 8
) -> DataFrame:
    """Heaps-law vocabulary growth curve: distinct-vocabulary size V(N)
    at geometrically spaced corpus prefixes (N, N/2, N/4, ... docs in
    ``id_col`` order). Natural corpora follow V(N) ~ K·N^b with
    b ≈ 0.4-0.6; a flattening curve means the crawl has started
    re-reading itself (template/dup mass), a linear one means noise —
    the companion diagnostic to ``zipf_slope``.

    Distributed shape — NO per-prefix passes: one token aggregation
    computes each token's FIRST document (min id; map-side combine),
    then every prefix answers from that tiny (token, first_id) frame:
    V(prefix) = #tokens with first_id <= prefix boundary. The corpus
    is read once however many points are on the curve. Prefix
    boundaries are the exact doc ids at geometric ranks, derived from
    an ordered count (one more reduced-frame pass).

    Returns ``(prefix_docs, vocab)`` rows, ascending."""
    if n_points < 2:
        raise ValueError(f"n_points must be >= 2, got {n_points}")
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.split(
                F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " ")), " "
            )
        ).alias("__t"),
    ).filter(F.col("__t") != "")
    first = toks.groupBy("__t").agg(F.min("__id").alias("__first"))
    # geometric prefixes by document RANK: rank docs once (reduced
    # frame: distinct ids), pick ids at ranks n, n/2, n/4, ...
    ids = df.select(F.col(id_col).alias("__id")).distinct()
    w = Window.orderBy("__id")
    ranked = ids.withColumn("__r", F.row_number().over(w))
    n_docs = ids.count()
    ranks = sorted(
        {max(1, n_docs // (2**k)) for k in range(n_points)} | {n_docs}
    )
    bounds = ranked.filter(F.col("__r").isin(ranks)).select(
        F.col("__r").alias("prefix_docs"), F.col("__id").alias("__bound")
    )
    return (
        bounds.crossJoin(first)
        .filter(F.col("__first") <= F.col("__bound"))
        .groupBy("prefix_docs")
        .agg(F.count(F.lit(1)).alias("vocab"))
        .orderBy("prefix_docs")
    )


def burstiness_fano(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_docs: int = 5,
    k: int = 50,
) -> DataFrame:
    """Token burstiness by the Fano factor (variance-to-mean ratio of
    a token's per-document counts, over the documents that contain
    it; Church & Gale 1995): content words clump (F ≫ 1 — a doc that
    mentions them mentions them repeatedly) while function words
    scatter Poisson-like (F ≈ 1). The corpus-curation signal for
    keyword extraction and stop-list induction that raw frequency
    (tok_vocab_counts) can't give.

    With integer per-doc counts c over n containing docs, S = Σc,
    Q = Σc²:  F = ((n·Q − S²)) / (n·S) — exact integers end to end,
    reported in ppm via one DIV (operands non-negative by
    Cauchy-Schwarz). Tokens in fewer than ``min_docs`` docs are
    noise-filtered; top-k by (fano desc, token asc) via TakeOrdered.

    Shape: one exploded (doc, token) aggregation (fan_out before the
    explode — the scan-stage amplification rule), one per-token fold,
    one bounded top-k. No windows, no joins.

    Returns (token, n_docs, total, fano_ppm).
    """
    from etl_script_spark.operators.partitioning import fan_out
    from etl_script_spark.operators.textstats import words

    b = fan_out(
        df.select(
            F.col(id_col).alias("id"),
            F.col(text_col).cast("string").alias("__t"),
        )
    )
    per_doc = (
        b.select(
            "id", F.explode(words(F.col("__t"))).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy("id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    per_tok = per_doc.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.expr("c * c")).cast("long").alias("q"),
    ).filter(F.col("n_docs") >= min_docs)
    scored = per_tok.select(
        F.col("tok").alias("token"),
        "n_docs",
        F.col("s").alias("total"),
        F.expr(
            "CAST(((CAST(n_docs AS DECIMAL(38,0)) * q - CAST(s AS"
            " DECIMAL(38,0)) * s) * 1000000)"
            " DIV (CAST(n_docs AS DECIMAL(38,0)) * s) AS BIGINT)"
        ).alias("fano_ppm"),
    )
    return scored.orderBy(
        F.col("fano_ppm").desc(), F.col("token").asc()
    ).limit(k)


def chao1_richness(
    df: DataFrame,
    text_col: str,
) -> DataFrame:
    """Chao1 estimator of total vocabulary size (Chao 1984): how many
    distinct token types the corpus WOULD show with unbounded
    sampling, from the observed type count plus the singleton/
    doubleton ratio —

        Ĉ = V + f₁·(f₁−1) / (2·(f₂+1)),

    f₁/f₂ = types seen exactly once/twice (the bias-corrected form,
    defined even at f₂=0). The coverage diagnostic next to
    heaps_curve: a big Chao1 gap says the crawl is nowhere near
    lexical saturation, so dedup/quality decisions based on "the
    vocabulary" are premature.

    Shape: token histogram → frequency-of-frequencies (≤ distinct
    counts rows) → one fold. Exact integers, one DIV.

    Returns one row (v_obs, f1, f2, chao1).
    """
    from etl_script_spark.operators.partitioning import fan_out
    from etl_script_spark.operators.textstats import words

    b = fan_out(df.select(F.col(text_col).cast("string").alias("__t")))
    counts = (
        b.select(F.explode(words(F.col("__t"))).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return counts.agg(
        F.count(F.lit(1)).cast("long").alias("v_obs"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long").alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("long").alias("f2"),
    ).select(
        "v_obs",
        "f1",
        "f2",
        F.expr(
            "CAST(v_obs + (CAST(f1 AS DECIMAL(38,0)) * (f1 - 1))"
            " DIV (2 * (f2 + 1)) AS BIGINT)"
        ).alias("chao1"),
    )
