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


def l_diversity_groups(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive: Column,
    l_threshold: int = 2,
) -> DataFrame:
    """The actionable complement of ``k_anonymity_report``'s single
    l-diversity metric: the CONCRETE quasi-identifier groups whose
    sensitive attribute has fewer than ``l_threshold`` distinct
    values — the groups where membership alone discloses the
    sensitive value (Machanavajjhala et al., ICDE 2006). The report
    says "l = 1 somewhere"; this says WHERE, which is what a
    suppression/generalization pass consumes next
    (``suppress_small_groups`` is the k-side analogue).

    One aggregation over the quasi keys; output is group-cardinality.
    Returns (quasi..., group_size, l_distinct)."""
    if l_threshold < 1:
        raise ValueError(f"l_threshold must be >= 1, got {l_threshold}")
    return (
        group_profile(df, quasi_cols, sensitive)
        .filter(F.col("l_distinct") < l_threshold)
    )


def source_datacard(
    df: DataFrame,
    source_col: str,
    text_col: str,
    lang_col: str,
    id_col: str,
) -> DataFrame:
    """Per-source data card: the governance summary a dataset release
    ships (Datasheets for Datasets, Gebru et al. 2018): document
    count, token mass, exact-duplicate rate, dominant language, and
    exact length percentiles. Everything a mixing-weight decision or
    an audit reads first, computed in one pass over the corpus plus
    group-cardinality follow-ups.

    Shape: one groupBy(source) aggregation carries counts, token
    sums and the distinct-text count (count_distinct over the 128-bit
    md5 — never the text); the p50/p90 character lengths are EXACT
    (sort-based percentile_disc semantics: the value at rank
    ceil(p*n), replayable by any SQL engine) via one window rank over
    (source, n_chars); the dominant language is max-by-count with
    (count DESC, lang ASC) deterministic tie order. Three shuffles,
    all on the source key or group-cardinality data.

    Returns (source, n_docs, n_tokens, n_distinct_text,
    dup_per_myriad, top_lang, p50_chars, p90_chars)."""
    from etl_script_spark.operators.dedup import normalize_text
    from etl_script_spark.operators.textstats import words

    base = df.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("id"),
        F.col(lang_col).alias("lang"),
        F.size(F.filter(words(F.col(text_col)), lambda w: w != "")).alias(
            "__tok"
        ),
        F.md5(normalize_text(F.col(text_col))).alias("__fp"),
        F.length(F.col(text_col).cast("string")).alias("__len"),
    )
    core = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__tok").cast("long").alias("n_tokens"),
        F.count_distinct("__fp").alias("n_distinct_text"),
    )
    core = core.withColumn(
        "dup_per_myriad",
        F.expr("((n_docs - n_distinct_text) * 10000) DIV n_docs"),
    )
    lang_counts = base.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("__lc")
    )
    # dominant language = max count, ties to the lexicographically
    # FIRST lang (max(struct(c, lang)) would break ties to the LAST)
    top_lang = (
        lang_counts.join(
            lang_counts.groupBy("source").agg(F.max("__lc").alias("__mx")),
            "source",
        )
        .filter(F.col("__lc") == F.col("__mx"))
        .groupBy("source")
        .agg(F.min("lang").alias("top_lang"))
    )
    ranked = base.select("source", "__len").withColumn(
        "__rn", F.row_number().over(Window.partitionBy("source").orderBy("__len"))
    )
    sizes = base.groupBy("source").agg(F.count(F.lit(1)).alias("__n"))
    pcts = (
        ranked.join(F.broadcast(sizes), "source")
        .groupBy("source")
        .agg(
            F.min(
                F.when(
                    F.col("__rn") >= F.ceil(F.col("__n") * 0.5),
                    F.col("__len"),
                )
            ).alias("p50_chars"),
            F.min(
                F.when(
                    F.col("__rn") >= F.ceil(F.col("__n") * 0.9),
                    F.col("__len"),
                )
            ).alias("p90_chars"),
        )
    )
    return (
        core.join(top_lang, "source")
        .join(pcts, "source")
        .select(
            "source", "n_docs", "n_tokens", "n_distinct_text",
            "dup_per_myriad", "top_lang", "p50_chars", "p90_chars",
        )
    )


def randomized_response_freq(
    df: DataFrame,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Local-differential-privacy frequency estimation by RANDOMIZED
    RESPONSE (Warner 1965; the generalized k-ary mechanism of
    Kairouz et al. 2016): each record reports its TRUE categorical
    value with probability 3/4, otherwise a uniformly drawn value
    from the domain (of size k) — so no individual row's report
    proves anything about it (epsilon = ln(p / (q/k)) = ln(3k+1)
    ... ln(3k) for the truthful-vs-specific-lie odds) — and the
    aggregator DEBIASES the noisy counts: E[c_v] = n_v*3/4 + n/(4k),
    hence n_hat_v = (4*k*c_v - n) / (3*k), reported in exact integer
    milli-rows via DIV (clamped at 0) so both engines replay it
    bit-for-bit.

    The "coin" is the md5 of the record id (deterministic replay —
    the same discipline as every sampler in this repo): first 8 hex
    chars mod 4 picks truth (!=0) vs lie (=0); the next 8 pick the
    replacement from the domain table. The domain is the column's
    distinct values with a dense index from a single ordered window
    over domain-cardinality rows (bounded by construction — this is
    a CATEGORICAL mechanism), then broadcast back; the tally is one
    groupBy over k keys.

    Returns (value, true_count, noisy_count, est_milli), one row per
    domain value.
    """
    base = df.select(
        F.col(value_col).cast("string").alias("value"),
        F.md5(F.col(id_col).cast("string")).alias("__h"),
    )
    domain = (
        base.select("value").distinct()
        .withColumn(
            "__idx",
            F.row_number().over(Window.orderBy("value")) - 1,
        )
    )
    k = domain.agg(F.count(F.lit(1)).alias("k"))
    reported = (
        base.crossJoin(F.broadcast(k))
        .withColumn(
            "__lie", F.conv(F.substring("__h", 1, 8), 16, 10)
            .cast("long") % 4 == 0,
        )
        .withColumn(
            "__idx",
            (F.conv(F.substring("__h", 9, 8), 16, 10).cast("long")
             % F.col("k")).cast("int"),
        )
        .join(
            F.broadcast(domain.select(
                F.col("__idx"), F.col("value").alias("__lie_value"))),
            "__idx",
        )
        .select(
            "value",
            F.when(F.col("__lie"), F.col("__lie_value"))
            .otherwise(F.col("value")).alias("__reported"),
        )
    )
    true_counts = reported.groupBy("value").agg(
        F.count(F.lit(1)).cast("long").alias("true_count")
    )
    noisy = reported.groupBy(
        F.col("__reported").alias("value")
    ).agg(F.count(F.lit(1)).cast("long").alias("noisy_count"))
    totals = reported.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return (
        true_counts.join(noisy, "value", "full")
        .na.fill({"true_count": 0, "noisy_count": 0})
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(k))
        .withColumn(
            "est_milli",
            F.expr(
                "(greatest(CAST(0 AS BIGINT),"
                " 4 * k * noisy_count - n) * 1000) DIV (3 * k)"
            ),
        )
        .select("value", "true_count", "noisy_count", "est_milli")
    )


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t_ppm: int = 300000,
) -> DataFrame:
    """t-closeness audit over the quasi-identifier groups: for each
    group, the total-variation distance between the group's
    sensitive-attribute distribution and the whole table's,

        tvd(g) = ½ Σ_s |c_gs/n_g − c_s/N|
               = ( Σ_s |c_gs·N − c_s·n_g| · 1e6 ) DIV (2·n_g·N)

    in exact ppm (TVD is the categorical Earth-Mover's distance under
    the 0/1 ground metric — the t-closeness instantiation for
    unordered sensitive attributes; Li, Li & Venkatasubramanian,
    ICDE 2007). Complements k-anonymity (group size) and l-diversity
    (distinct sensitive values): a group can pass both and still leak
    via a skewed distribution, which is exactly what TVD catches.

    Shape: one aggregation to the (group, sensitive) cell table, a
    group rollup, and a sensitive-marginal join (sensitive cardinality
    is small by definition — broadcast); sensitive values ABSENT from
    a group still contribute |0 − c_s·n_g|, picked up via the marginal
    total rather than a dense group×sensitive cross join: Σ_s∉g c_s =
    N − Σ_s∈g c_s, so the missing mass folds to one exact term.

    Returns (quasi_cols..., n, tvd_ppm, breach) with breach =
    tvd_ppm > t_ppm.
    """
    if not quasi_cols:
        raise ValueError("t_closeness_report needs >= 1 quasi column")
    _D = "DECIMAL(38,0)"
    cells = df.groupBy(
        *[F.col(c) for c in quasi_cols],
        F.col(sensitive_col).alias("__s"),
    ).agg(F.count(F.lit(1)).cast("long").alias("__c_gs"))
    marg = cells.groupBy(F.col("__s").alias("__s2")).agg(
        F.sum("__c_gs").cast("long").alias("__c_s")
    )
    tot = marg.agg(F.sum("__c_s").cast("long").alias("__N"))
    grp = cells.groupBy(*quasi_cols).agg(
        F.sum("__c_gs").cast("long").alias("n")
    )
    present = (
        cells.join(F.broadcast(marg), F.col("__s") == F.col("__s2"))
        .join(grp, quasi_cols)
        .crossJoin(F.broadcast(tot))
        .groupBy(*quasi_cols)
        .agg(
            F.sum(
                F.abs(
                    F.col("__c_gs").cast(_D) * F.col("__N")
                    - F.col("__c_s").cast(_D) * F.col("n")
                )
            ).alias("__present_dev"),
            # mass of sensitive values present in the group, for the
            # absent-category term: Σ_{s absent} c_s·n_g
            F.sum(F.col("__c_s").cast(_D)).alias("__marg_present"),
        )
    )
    out = grp.join(present, quasi_cols).crossJoin(F.broadcast(tot))
    tvd = (
        f"CAST(((__present_dev + (CAST(__N AS {_D}) - __marg_present)"
        f" * n) * 1000000) DIV (2 * CAST(n AS {_D}) * __N) AS BIGINT)"
    )
    return out.select(
        *quasi_cols,
        "n",
        F.expr(tvd).alias("tvd_ppm"),
        (F.expr(tvd) > F.lit(t_ppm)).alias("breach"),
    )


def dataset_fingerprint(
    df: DataFrame,
    group_col: str,
    hash_cols: list[str],
) -> DataFrame:
    """Order-independent dataset fingerprint per group: the SUM (mod
    2^62) of per-row md5 hashes over the named columns, plus the row
    count — a Merkle-style audit checksum that any engine, any
    partitioning, and any row order reproduce bit-for-bit. The
    publish/subscribe contract check: a downstream consumer recomputes
    the fingerprint after transport and compares — one unequal byte
    anywhere flips it (modular sum of uniform hashes: a corruption
    collides with probability 2^-62).

    Summation is the commutative fold (unlike a hash CHAIN, which
    would serialize); NULLs are encoded distinctly from empty strings
    (chr(1) sentinel) so null/'' corruption is visible. One map-side
    combinable aggregation — at 100 TB this is the cheapest full-scan
    integrity primitive there is.

    Returns (group, n_rows, fingerprint).
    """
    sep = "chr(0)"
    enc = f" || {sep} || ".join(
        f"COALESCE(CAST({c} AS STRING), chr(1))" for c in hash_cols
    )
    h = F.expr(
        f"CAST(conv(substr(md5({enc}), 1, 15), 16, 10) AS BIGINT)"
    )
    m = 1 << 62
    return (
        df.select(F.col(group_col).alias("group"), h.alias("__h"))
        .groupBy("group")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            # sum in DECIMAL(38): a plain long SUM of 2^60-scale
            # hashes overflows int64 after ~8 rows (ANSI throw)
            F.expr(
                f"CAST(SUM(CAST(__h AS DECIMAL(38,0))) % {m} AS BIGINT)"
            ).alias("fingerprint"),
        )
    )


def maintain_fingerprint(
    base: DataFrame,
    changes: DataFrame,
    group_col: str,
    hash_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Incrementally maintain :func:`dataset_fingerprint` under a CDC
    batch — the monoid's IVM form: inserts ADD their row hashes,
    deletes SUBTRACT (modular), and the maintained checksum equals a
    full recompute of the final state BIT-FOR-BIT (group theory, not
    approximation — the same contract as the aggregate-IVM family).
    The audit loop this closes: a 100 TB corpus re-fingerprints after
    every ingest batch at the COST OF THE BATCH, never the corpus.

    ``changes.op_col`` is 'I' or 'D' (delete rows must match base
    rows exactly — a fingerprint maintains set-sum state, it cannot
    validate your CDC feed). Modular arithmetic stays non-negative on
    both engines: delta = sum(±h) folded as (fp + M + delta % M) % M
    with M = 2^62.

    Returns (group, n_rows, fingerprint) for the maintained state.
    """
    m = 1 << 62
    fp0 = dataset_fingerprint(base, group_col, hash_cols).select(
        "group",
        F.col("n_rows").alias("__n0"),
        F.col("fingerprint").alias("__f0"),
    )
    sep = "chr(0)"
    enc = f" || {sep} || ".join(
        f"COALESCE(CAST({c} AS STRING), chr(1))" for c in hash_cols
    )
    h = F.expr(
        f"CAST(conv(substr(md5({enc}), 1, 15), 16, 10) AS BIGINT)"
    )
    # op codes are VALIDATED, not defaulted: treating an unexpected
    # code ('U', 'insert', NULL) as a delete would silently subtract
    # row hashes and corrupt the maintained fingerprint forever.
    sgn = (
        F.when(F.col(op_col) == "I", F.lit(1))
        .when(F.col(op_col) == "D", F.lit(-1))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("maintain_fingerprint: op must be 'I' or 'D', got "),
                    F.coalesce(F.col(op_col).cast("string"), F.lit("NULL")),
                )
            ).cast("int")
        )
    )
    delta = (
        changes.select(
            F.col(group_col).alias("group"),
            sgn.alias("__s"),
            h.alias("__h"),
        )
        .groupBy("group")
        .agg(
            F.sum("__s").cast("long").alias("__dn"),
            F.expr(
                "CAST(SUM(CAST(__s AS DECIMAL(38,0))"
                " * CAST(__h AS DECIMAL(38,0)))"
                f" % {m} AS DECIMAL(38,0))"
            ).alias("__df"),
        )
    )
    return (
        fp0.join(delta, "group", "full")
        .select(
            "group",
            (
                F.coalesce(F.col("__n0"), F.lit(0))
                + F.coalesce(F.col("__dn"), F.lit(0))
            ).cast("long").alias("n_rows"),
            F.expr(
                f"CAST((COALESCE(__f0, 0) + {m}"
                f" + COALESCE(__df, CAST(0 AS DECIMAL(38,0)))) % {m}"
                " AS BIGINT)"
            ).alias("fingerprint"),
        )
        .filter(F.col("n_rows") > 0)
    )
