"""Declarative data-quality expectation catalog queries.

The reference's import validators (ImportInvoiceReport.php:107-113
row guards + counters) re-expressed as a rule set evaluated in one
aggregation pass, with a quarantine split carrying machine-readable
reasons — the P9 valid/invalid split generalized to N rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_script_spark.operators import expectations as ex
from etl_script_spark.plans.catalog import register, t


def _order_rules(o: DataFrame, c: DataFrame):
    marked, ref_rule = ex.referential(o, "o_custkey", c, "c_custkey")
    rules = [
        ex.not_null("o_orderkey"),
        ex.in_range("o_totalprice", 0.0, 300000.0),
        ex.in_set("o_orderstatus", ["F", "O", "P"]),
        ex.matches("o_orderpriority", r"^[1-5]-"),
        ref_rule,
    ]
    return marked, rules


_ORACLE_PREDS = [
    ("not_null_o_orderkey", "o_orderkey IS NOT NULL"),
    (
        "in_range_o_totalprice",
        "o_totalprice IS NOT NULL AND o_totalprice BETWEEN 0.0 AND 300000.0",
    ),
    ("in_set_o_orderstatus", "o_orderstatus IS NOT NULL AND o_orderstatus IN ('F','O','P')"),
    (
        "matches_o_orderpriority",
        "o_orderpriority IS NOT NULL AND regexp_matches(o_orderpriority, '^[1-5]-')",
    ),
    (
        "ref_o_custkey",
        "o_custkey IS NOT NULL AND o_custkey IN (SELECT c_custkey FROM customer)",
    ),
]

_METRICS_ORACLE = " UNION ALL ".join(
    f"""
    SELECT '{name}' AS rule_name, COUNT(*) AS rows,
           CAST(SUM(CASE WHEN NOT ({pred}) THEN 1 ELSE 0 END) AS BIGINT)
             AS violations,
           (COUNT(*) - SUM(CASE WHEN NOT ({pred}) THEN 1 ELSE 0 END))
             / GREATEST(COUNT(*), 1) AS pass_ratio
    FROM orders
    """
    for name, pred in _ORACLE_PREDS
)


@register("dq_expectations_metrics", _METRICS_ORACLE, ("DQ-expectations",))
def dq_expectations_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule violation counts for a 5-rule expectation suite over
    orders (null check, numeric range, enum membership, format regex,
    referential integrity against customer) — ONE aggregation pass
    regardless of rule count; the referential rule is a broadcast
    left join of the dim's distinct key column only."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    marked, rules = _order_rules(o, c)
    return ex.evaluate(marked, rules)


@register(
    "dq_expectations_quarantine",
    """
    SELECT o_orderkey,
           concat_ws(',',
             CASE WHEN o_orderkey IS NULL THEN 'not_null_o_orderkey' END,
             CASE WHEN NOT (o_totalprice IS NOT NULL
                            AND o_totalprice BETWEEN 0.0 AND 300000.0)
                  THEN 'in_range_o_totalprice' END,
             CASE WHEN NOT (o_orderstatus IS NOT NULL
                            AND o_orderstatus IN ('F','O','P'))
                  THEN 'in_set_o_orderstatus' END,
             CASE WHEN NOT (o_orderpriority IS NOT NULL
                            AND regexp_matches(o_orderpriority, '^[1-5]-'))
                  THEN 'matches_o_orderpriority' END,
             CASE WHEN NOT (o_custkey IS NOT NULL AND o_custkey IN
                            (SELECT c_custkey FROM customer))
                  THEN 'ref_o_custkey' END
           ) AS violated
    FROM orders
    WHERE NOT (o_orderkey IS NOT NULL
               AND (o_totalprice IS NOT NULL
                    AND o_totalprice BETWEEN 0.0 AND 300000.0)
               AND (o_orderstatus IS NOT NULL
                    AND o_orderstatus IN ('F','O','P'))
               AND (o_orderpriority IS NOT NULL
                    AND regexp_matches(o_orderpriority, '^[1-5]-'))
               AND (o_custkey IS NOT NULL AND o_custkey IN
                    (SELECT c_custkey FROM customer)))
    """,
    ("DQ-expectations",),
)
def dq_expectations_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quarantine side of the same rule suite: rows violating any
    rule, with the violated rule names as a deterministic
    comma-joined reason string (rule order). Metrics and quarantine
    derive from the SAME predicate set, so the two can never
    disagree."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    marked, rules = _order_rules(o, c)
    _, quarantined = ex.split(marked, rules)
    return quarantined.select(
        "o_orderkey", F.concat_ws(",", F.col("violated")).alias("violated")
    )


from etl_script_spark.operators import governance as gov_ops  # noqa: E402


@register(
    "gov_k_anonymity",
    """
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS group_size,
             COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
                                 ELSE 'nonneg' END) AS l_distinct
      FROM customer GROUP BY 1, 2
    )
    SELECT CAST(SUM(group_size) AS BIGINT) AS n_rows,
           COUNT(*) AS n_groups,
           MIN(group_size) AS k_anonymity,
           MIN(l_distinct) AS l_diversity,
           CAST(SUM(CASE WHEN group_size < 5 THEN group_size ELSE 0 END)
                AS BIGINT) AS rows_at_risk,
           (CAST(SUM(CASE WHEN group_size < 5 THEN group_size ELSE 0 END)
                 AS BIGINT) * 10000) // CAST(SUM(group_size) AS BIGINT)
             AS risk_per_myriad
    FROM g
    """,
    ("governance",),
)
def gov_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-governance report over customer with quasi-identifiers
    (nation, market segment) and account-balance sign as the sensitive
    attribute (operators/governance.k_anonymity_report): k-anonymity,
    l-diversity, and the at-risk row share in exact integer
    per-myriad. Two aggregation passes, the second over
    group-cardinality data — scale-free."""
    c = t(spark, sf_dir, "customer")
    return gov_ops.k_anonymity_report(
        c,
        ["c_nationkey", "c_mktsegment"],
        F.when(F.col("c_acctbal") < 0, "neg").otherwise("nonneg"),
        k_threshold=5,
    )


@register(
    "gov_l_diversity_groups",
    """
    SELECT c_nationkey, c_mktsegment,
           COUNT(*) AS group_size,
           CAST(COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
                                    ELSE 'nonneg' END) AS BIGINT)
             AS l_distinct
    FROM customer
    GROUP BY 1, 2
    HAVING COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
                               ELSE 'nonneg' END) < 2
    """,
    ("governance",),
)
def gov_l_diversity_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actionable half of l-diversity: the CONCRETE
    quasi-identifier groups (nation, market segment) whose sensitive
    attribute (account-balance sign) takes fewer than l=2 distinct
    values — where membership alone discloses the value
    (operators/governance.py:l_diversity_groups; Machanavajjhala
    et al. 2006). gov_k_anonymity reports that min-l exists; this
    lists the groups a suppression pass consumes. One aggregation,
    group-cardinality output."""
    from etl_script_spark.operators import governance as gov

    c = t(spark, sf_dir, "customer")
    return gov.l_diversity_groups(
        c,
        ["c_nationkey", "c_mktsegment"],
        F.when(F.col("c_acctbal") < 0, "neg").otherwise("nonneg"),
        l_threshold=2,
    )


@register(
    "gov_source_datacard",
    """
    WITH base AS (
      SELECT source, doc_id, lang,
             len(list_filter(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
               w -> w != '')) AS tok,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
             length(text) AS ln
      FROM documents
    ),
    core AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(tok) AS BIGINT) AS n_tokens,
             CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_distinct_text
      FROM base GROUP BY source
    ),
    lc AS (SELECT source, lang, COUNT(*) AS c FROM base GROUP BY 1, 2),
    tl AS (
      SELECT lc.source, MIN(lc.lang) AS top_lang
      FROM lc JOIN (SELECT source, MAX(c) AS mx FROM lc GROUP BY 1) m
        ON m.source = lc.source AND lc.c = m.mx
      GROUP BY lc.source
    ),
    rk AS (
      SELECT source, ln,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY ln) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM base
    ),
    pc AS (
      SELECT source,
             MIN(CASE WHEN rn >= ceil(n * 0.5) THEN ln END) AS p50_chars,
             MIN(CASE WHEN rn >= ceil(n * 0.9) THEN ln END) AS p90_chars
      FROM rk GROUP BY source
    )
    SELECT c.source, c.n_docs, c.n_tokens, c.n_distinct_text,
           ((c.n_docs - c.n_distinct_text) * 10000) // c.n_docs
             AS dup_per_myriad,
           tl.top_lang, pc.p50_chars, pc.p90_chars
    FROM core c JOIN tl ON tl.source = c.source
    JOIN pc ON pc.source = c.source
    """,
    ("governance", "LLM-curation"),
)
def gov_source_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source data card (Datasheets for Datasets): document count,
    token mass, exact-dup rate (per-myriad, integer DIV), dominant
    language (max count, lexicographic tie), and EXACT p50/p90
    character lengths (value at rank ceil(p*n) — percentile_disc
    semantics any SQL engine replays). The first table a mixing
    decision or release audit reads
    (operators/governance.py:source_datacard). Shuffles only on the
    source key and group-cardinality follow-ups."""
    from etl_script_spark.operators import governance as gov

    d = t(spark, sf_dir, "documents")
    return gov.source_datacard(d, "source", "text", "lang", "doc_id")


@register(
    "feat_weighted_median",
    """
    WITH gv AS (
      SELECT c_nationkey, c_acctbal AS v,
             CAST(SUM(c_custkey % 5 + 1) AS BIGINT) AS w
      FROM customer GROUP BY 1, 2
    ),
    cum AS (
      SELECT c_nationkey, v, w,
             CAST(SUM(w) OVER (PARTITION BY c_nationkey ORDER BY v
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
             CAST(SUM(w) OVER (PARTITION BY c_nationkey) AS BIGINT) AS tw
      FROM gv
    )
    SELECT c_nationkey,
           CAST(MAX(tw) AS BIGINT) AS tot_weight,
           MIN(CASE WHEN cw * 2 >= tw THEN v END) AS wq_value
    FROM cum GROUP BY c_nationkey
    """,
    ("A1", "X-robust-stats"),
)
def feat_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT weighted median of customer account balance per nation,
    weighted by a deterministic integer mass (custkey%5+1 — standing
    in for token counts / importance weights): the smallest value
    whose cumulative weight reaches half the group total, selected in
    pure integer arithmetic so both engines agree to the bit — no
    float interpolation, no approx sketch
    (operators/features.py:weighted_quantile_groups). One
    tie-collapsing (group, value) aggregation bounds the window input,
    then one cumsum window per group; two shuffles on the group key —
    the same cost as any exact per-group percentile."""
    from etl_script_spark.operators import features

    c = t(spark, sf_dir, "customer")
    return features.weighted_quantile_groups(
        c.withColumn("__w", F.col("c_custkey") % 5 + 1),
        ["c_nationkey"],
        "c_acctbal",
        "__w",
    )


@register(
    "gov_randomized_response",
    """
    WITH base AS (
      SELECT lang AS value, md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    domain AS (
      SELECT value, ROW_NUMBER() OVER (ORDER BY value) - 1 AS idx
      FROM (SELECT DISTINCT value FROM base)
    ),
    kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM domain),
    rep AS (
      SELECT b.value,
             CASE WHEN ('0x' || substr(b.h, 1, 8))::BIGINT % 4 = 0
                  THEN d.value ELSE b.value END AS reported
      FROM base b
      CROSS JOIN kk
      JOIN domain d ON d.idx = ('0x' || substr(b.h, 9, 8))::BIGINT % kk.k
    ),
    tc AS (SELECT value, CAST(COUNT(*) AS BIGINT) AS true_count
           FROM rep GROUP BY value),
    nc AS (SELECT reported AS value, CAST(COUNT(*) AS BIGINT) AS noisy_count
           FROM rep GROUP BY reported),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rep)
    SELECT value,
           COALESCE(true_count, 0) AS true_count,
           COALESCE(noisy_count, 0) AS noisy_count,
           CAST((greatest(CAST(0 AS BIGINT),
                          4 * k * COALESCE(noisy_count, 0) - n) * 1000)
                // (3 * k) AS BIGINT) AS est_milli
    FROM tc FULL JOIN nc USING (value)
    CROSS JOIN tot CROSS JOIN kk
    """,
    ("X-governance", "LLM-curation"),
)
def gov_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-DP frequency release over the language column
    (governance.randomized_response_freq): every record reports its
    true language w.p. 3/4 else an md5-drawn uniform domain value,
    and the debiased estimate ``(4k*c - n)/(3k)`` is computed in
    exact integer milli-rows. The coin is the record id's md5 —
    deterministic replay on both engines, like every sampler here."""
    from etl_script_spark.operators import governance

    d = t(spark, sf_dir, "documents")
    return governance.randomized_response_freq(d, "lang", "doc_id")


@register(
    "feat_quantile_normalize",
    """
    WITH c AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                   ORDER BY cents, o_orderkey)
                  AS rank_in_group
      FROM c
    ),
    m AS (
      SELECT rank_in_group,
             (SUM(cents) * 1000) // COUNT(*) AS norm_milli
      FROM r GROUP BY rank_in_group
    )
    SELECT r.o_orderkey, r.o_orderpriority, r.cents,
           CAST(r.rank_in_group AS INTEGER) AS rank_in_group,
           CAST(m.norm_milli AS BIGINT) AS norm_milli
    FROM r JOIN m USING (rank_in_group)
    """,
    ("X-feature-eng",),
)
def feat_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization of order totals across the
    five order priorities (features.quantile_normalize, Bolstad
    2003): each order's total is replaced by the exact integer mean
    (milli-cents, DIV) of the same-ranked totals across all
    priorities — after which every priority has an identical value
    distribution. Money rides the cents fast-exact path; ranks
    tie-break on the order key for a replayable total order."""
    from etl_script_spark.operators import features
    from etl_script_spark.plans.catalog import cents

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        cents(F.col("o_totalprice")).alias("cents"),
    )
    return features.quantile_normalize(
        o, "o_orderpriority", "cents", "o_orderkey"
    )


@register(
    "stat_ols_slope_groups",
    """
    WITH s AS (
      SELECT l_returnflag, l_linestatus,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_x,
             CAST(SUM(CAST(ROUND(l_discount * 10000) AS BIGINT))
                  AS BIGINT) AS sum_y,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(ROUND(l_discount * 10000) AS BIGINT))
                  AS BIGINT) AS sxy
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus, n, sum_x, sum_y, sxx, sxy,
           CASE WHEN den = 0 THEN NULL
                WHEN num < 0 THEN -CAST((abs(num) * 1000000000) // den
                                        AS BIGINT)
                ELSE CAST((abs(num) * 1000000000) // den AS BIGINT)
           END AS slope_ppb
    FROM (
      SELECT *,
             CAST(n AS HUGEINT) * sxy - CAST(sum_x AS HUGEINT) * sum_y
               AS num,
             CAST(n AS HUGEINT) * sxx - CAST(sum_x AS HUGEINT) * sum_x
               AS den
      FROM s
    )
    """,
    ("X-statistics", "A1"),
)
def stat_ols_slope_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group OLS slope of discount (basis points) on
    quantity (stats.ols_slope_groups): one map-side-combinable
    aggregation to five integer sufficient statistics, then the
    closed-form slope in exact ppb via DECIMAL(38,0) DIV (the cross
    products overflow int64 — decimal-38 is the repo's exact-integer
    escape hatch, same as the corpus-stats quotients)."""
    from etl_script_spark.operators import stats

    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus",
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("y"),
    )
    return stats.ols_slope_groups(
        li, ["l_returnflag", "l_linestatus"], "x", "y"
    )


@register(
    "cust_gini_by_nation",
    """
    WITH v AS (
      SELECT c_nationkey,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000 AS v,
             c_custkey,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY CAST(ROUND(c_acctbal * 100)
                                              AS BIGINT) + 100000,
                                         c_custkey) AS i
      FROM customer
    ),
    a AS (
      SELECT c_nationkey,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS total,
             CAST(SUM(2 * i * v) AS BIGINT) AS w2
      FROM v GROUP BY c_nationkey
    )
    SELECT c_nationkey, n, total,
           CASE WHEN n * total = 0 THEN NULL
                ELSE CAST(((w2 - (n + 1) * total) * 1000)
                          // (n * total) AS BIGINT)
           END AS gini_milli
    FROM a
    """,
    ("X-statistics", "A1"),
)
def cust_gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-nation Gini concentration of customer account
    balances (stats.gini_groups): cents shifted +100000 to the
    non-negative domain Gini requires, ranked by a replayable total
    order, folded with the ``sum (2i - n - 1) v / (n sum v)``
    closed form in integer milli-units via DECIMAL(38,0) DIV. Two
    shuffles, both on the nation key."""
    from etl_script_spark.operators import stats
    from etl_script_spark.plans.catalog import cents

    c = t(spark, sf_dir, "customer").select(
        "c_nationkey", "c_custkey",
        (cents(F.col("c_acctbal")) + 100000).alias("v"),
    )
    return stats.gini_groups(c, ["c_nationkey"], "v", "c_custkey")


@register(
    "dq_benford_first_digit",
    """
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM orders
      WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) > 0
    ),
    c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d
          GROUP BY digit),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS tt FROM c)
    SELECT digit, n,
           CAST((n * 1000000) // tt AS BIGINT) AS obs_ppm,
           CAST(([301030, 176091, 124939, 96910, 79181, 66947, 57992,
                  51153, 45757])[digit] AS BIGINT) AS exp_ppm,
           abs(CAST((n * 1000000) // tt AS BIGINT)
               - ([301030, 176091, 124939, 96910, 79181, 66947, 57992,
                   51153, 45757])[digit]) AS dev_ppm
    FROM c CROSS JOIN t
    """,
    ("DQ-expectations", "X-statistics"),
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals
    (stats.benford_first_digit): observed vs expected first-digit
    frequencies in exact ppm, expectation as fixed literals (no
    engine computes a log). The forensic screen a finance-data
    quality suite runs before trusting an amount column."""
    from etl_script_spark.operators import stats
    from etl_script_spark.plans.catalog import cents

    o = t(spark, sf_dir, "orders").select(
        cents(F.col("o_totalprice")).alias("v")
    )
    return stats.benford_first_digit(o, "v")


@register(
    "stat_chi2_independence",
    """
    WITH cells AS (
      SELECT l_returnflag AS row_val, l_linestatus AS col_val,
             CAST(COUNT(*) AS BIGINT) AS obs
      FROM lineitem GROUP BY 1, 2
    ),
    tot AS (
      SELECT row_val, col_val, obs,
             SUM(obs) OVER (PARTITION BY row_val) AS rt,
             SUM(obs) OVER (PARTITION BY col_val) AS ct,
             SUM(obs) OVER () AS n
      FROM cells
    )
    SELECT row_val, col_val, obs,
           CAST((rt * ct * 1000) // n AS BIGINT) AS exp_milli,
           CAST(((obs * 1000 - (rt * ct * 1000) // n)
                 * (obs * 1000 - (rt * ct * 1000) // n))
                // greatest((rt * ct * 1000) // n, 1) AS BIGINT)
             AS chi2_cell_milli
    FROM tot
    """,
    ("X-statistics", "A1"),
)
def stat_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square contingency cells for return flag x line
    status (stats.chi2_contingency): observed vs expected in exact
    integer milli-units with per-cell flooring — the categorical
    independence screen, computed from one fact-table aggregation
    plus windows over the 21-cell table."""
    from etl_script_spark.operators import stats

    li = t(spark, sf_dir, "lineitem")
    return stats.chi2_contingency(li, "l_returnflag", "l_linestatus")


@register(
    "diag_key_skew",
    """
    WITH c AS (
      SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_orderkey
    ),
    cv AS (
      SELECT cnt AS v, CAST(COUNT(*) AS BIGINT) AS w FROM c GROUP BY cnt
    ),
    med AS (
      SELECT CAST(MIN(CASE WHEN cw * 2 >= tw THEN v END) AS BIGINT)
               AS median_count
      FROM (
        SELECT v, SUM(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                 AS cw,
               SUM(w) OVER () AS tw
        FROM cv
      )
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(cnt) AS BIGINT) AS n_rows,
             CAST(MAX(cnt) AS BIGINT) AS max_count
      FROM c
    ),
    top AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS top10_rows FROM (
        SELECT cnt FROM c ORDER BY cnt DESC, k ASC LIMIT 10
      )
    )
    SELECT s.n_keys, s.n_rows, s.max_count, med.median_count,
           CAST((s.max_count * 1000000) // s.n_rows AS BIGINT)
             AS top1_ppm,
           CAST((top.top10_rows * 1000000) // s.n_rows AS BIGINT)
             AS top10_ppm
    FROM s CROSS JOIN med CROSS JOIN top
    """,
    ("X-diagnostics", "A1"),
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnosis for lineitem's order key — the
    pre-flight a 100 TB join plan wants: per-key counts, exact median
    key weight (cumulative-weight rule over the DISTINCT-COUNT-VALUE
    table — window input is value cardinality, ~tens of rows, never
    key cardinality), the heaviest key's ppm share and the top-10
    keys' combined share (TakeOrdered). One fact aggregation; all
    downstream work is on bounded tables."""
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    c = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    cv = c.groupBy(F.col("cnt").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("w")
    )
    wcum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy()
    med = (
        cv.withColumn("cw", F.sum("w").over(wcum))
        .withColumn("tw", F.sum("w").over(wt))
        .agg(
            F.min(F.when(F.col("cw") * 2 >= F.col("tw"), F.col("v")))
            .cast("long").alias("median_count")
        )
    )
    s = c.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max("cnt").cast("long").alias("max_count"),
    )
    top = (
        c.orderBy(F.col("cnt").desc(), F.col("k").asc())
        .limit(10)
        .agg(F.sum("cnt").cast("long").alias("top10_rows"))
    )
    return (
        s.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(top))
        .select(
            "n_keys", "n_rows", "max_count", "median_count",
            F.expr(
                "(max_count * CAST(1000000 AS BIGINT)) DIV n_rows"
            ).alias("top1_ppm"),
            F.expr(
                "(top10_rows * CAST(1000000 AS BIGINT)) DIV n_rows"
            ).alias("top10_ppm"),
        )
    )


@register(
    "cust_rfm_segments",
    """
    WITH base AS (
      SELECT o_custkey AS k,
             date_diff('day', MAX(o_orderdate), g.now) AS r,
             CAST(COUNT(*) AS BIGINT) AS f,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) // 1000
                  AS BIGINT) AS m
      FROM orders CROSS JOIN
           (SELECT MAX(o_orderdate) AS now FROM orders) g
      GROUP BY o_custkey, g.now
    ),
    rt AS (
      SELECT MIN(CASE WHEN cw * 3 >= tw THEN v END) AS t1,
             MIN(CASE WHEN cw * 3 >= 2 * tw THEN v END) AS t2
      FROM (SELECT v, SUM(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                     AS cw, SUM(w) OVER () AS tw
            FROM (SELECT r AS v, CAST(COUNT(*) AS BIGINT) AS w
                  FROM base GROUP BY r))
    ),
    ft AS (
      SELECT MIN(CASE WHEN cw * 3 >= tw THEN v END) AS t1,
             MIN(CASE WHEN cw * 3 >= 2 * tw THEN v END) AS t2
      FROM (SELECT v, SUM(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                     AS cw, SUM(w) OVER () AS tw
            FROM (SELECT f AS v, CAST(COUNT(*) AS BIGINT) AS w
                  FROM base GROUP BY f))
    ),
    mt AS (
      SELECT MIN(CASE WHEN cw * 3 >= tw THEN v END) AS t1,
             MIN(CASE WHEN cw * 3 >= 2 * tw THEN v END) AS t2
      FROM (SELECT v, SUM(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                     AS cw, SUM(w) OVER () AS tw
            FROM (SELECT m AS v, CAST(COUNT(*) AS BIGINT) AS w
                  FROM base GROUP BY m))
    )
    SELECT k AS o_custkey,
           CAST(r AS BIGINT) AS recency_days, f AS frequency,
           m AS monetary_dollars10,
           CAST(CASE WHEN r <= rt.t1 THEN 3 WHEN r <= rt.t2 THEN 2
                     ELSE 1 END AS INTEGER) AS r_score,
           CAST(CASE WHEN f <= ft.t1 THEN 1 WHEN f <= ft.t2 THEN 2
                     ELSE 3 END AS INTEGER) AS f_score,
           CAST(CASE WHEN m <= mt.t1 THEN 1 WHEN m <= mt.t2 THEN 2
                     ELSE 3 END AS INTEGER) AS m_score
    FROM base CROSS JOIN rt CROSS JOIN ft CROSS JOIN mt
    """,
    ("X-segmentation", "A1"),
)
def cust_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation with EXACT integer tercile
    boundaries (features.integer_tercile_thresholds): recency (days
    from each customer's last order to the corpus max date),
    frequency (order count), monetary ($10 bands — quantized so the
    threshold windows run over bounded distinct-value tables, never
    customer cardinality). Scores 1-3 per dimension by the
    cumulative-count rule — no global ntile, no single-partition
    sort, fully engine-replayable."""
    from etl_script_spark.operators import features
    from etl_script_spark.plans.catalog import cents

    o = t(spark, sf_dir, "orders")
    now = o.agg(F.max("o_orderdate").alias("now"))
    base = (
        o.crossJoin(F.broadcast(now))
        .groupBy(F.col("o_custkey").alias("k"), "now")
        .agg(
            F.max("o_orderdate").alias("__last"),
            F.count(F.lit(1)).cast("long").alias("f"),
            F.expr(
                "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))"
                " DIV 1000 AS BIGINT)"
            ).alias("m"),
        )
        .select(
            "k",
            F.datediff(F.col("now"), F.col("__last")).alias("r"),
            "f", "m",
        )
    )
    rt = features.integer_tercile_thresholds(base, "r")
    ft = features.integer_tercile_thresholds(base, "f")
    mt = features.integer_tercile_thresholds(base, "m")
    return (
        base.crossJoin(F.broadcast(rt.select(
            F.col("t1").alias("__rt1"), F.col("t2").alias("__rt2"))))
        .crossJoin(F.broadcast(ft.select(
            F.col("t1").alias("__ft1"), F.col("t2").alias("__ft2"))))
        .crossJoin(F.broadcast(mt.select(
            F.col("t1").alias("__mt1"), F.col("t2").alias("__mt2"))))
        .select(
            F.col("k").alias("o_custkey"),
            F.col("r").cast("long").alias("recency_days"),
            F.col("f").alias("frequency"),
            F.col("m").alias("monetary_dollars10"),
            F.when(F.col("r") <= F.col("__rt1"), 3)
            .when(F.col("r") <= F.col("__rt2"), 2)
            .otherwise(1).cast("int").alias("r_score"),
            F.when(F.col("f") <= F.col("__ft1"), 1)
            .when(F.col("f") <= F.col("__ft2"), 2)
            .otherwise(3).cast("int").alias("f_score"),
            F.when(F.col("m") <= F.col("__mt1"), 1)
            .when(F.col("m") <= F.col("__mt2"), 2)
            .otherwise(3).cast("int").alias("m_score"),
        )
    )


@register(
    "stat_mannwhitney_u",
    """
    WITH h AS (
      SELECT CAST(l_quantity AS BIGINT) AS v,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS HUGEINT) AS ca,
             CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
                  AS HUGEINT) AS cb
      FROM lineitem WHERE l_returnflag IN ('R', 'A')
      GROUP BY 1
    ),
    c AS (
      SELECT v, ca, cb,
             SUM(ca + cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
               - (ca + cb) AS below
      FROM h
    ),
    s AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
             CAST(SUM(cb) AS BIGINT) AS n_b,
             SUM(ca * (2 * below + ca + cb + 1)) AS r2a
      FROM c
    )
    SELECT n_a, n_b,
           CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS BIGINT)
             AS u_a_doubled,
           CAST(2 * CAST(n_a AS HUGEINT) * n_b
                - (r2a - CAST(n_a AS HUGEINT) * (n_a + 1)) AS BIGINT)
             AS u_b_doubled,
           CAST(((r2a - CAST(n_a AS HUGEINT) * (n_a + 1)) * 1000000)
                // (2 * CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
             AS cles_ppm
    FROM s
    """,
    ("X-statistics", "A1"),
)
def stat_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann-Whitney U for RETURNED vs ACCEPTED line quantities
    (stats.mann_whitney_u): the nonparametric two-sample location
    test, with midrank tie handling kept exact by doubling the rank
    sum, plus the common-language effect size in ppm. The rank sum
    never materializes per-row ranks — a per-value histogram and a
    two-phase bucketed prefix sum do it with no global sort (the
    oracle's plain window is the semantic twin at fixture
    cardinality)."""
    from etl_script_spark.operators import stats

    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    )
    return stats.mann_whitney_u(li, "l_returnflag", "qty", "R", "A")


@register(
    "stat_roc_auc",
    """
    WITH h AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
             CAST(SUM(CASE WHEN o_orderpriority LIKE '1%' THEN 1
                           ELSE 0 END) AS HUGEINT) AS ca,
             CAST(SUM(CASE WHEN o_orderpriority LIKE '1%' THEN 0
                           ELSE 1 END) AS HUGEINT) AS cb
      FROM orders GROUP BY 1
    ),
    c AS (
      SELECT v, ca, cb,
             SUM(ca + cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
               - (ca + cb) AS below
      FROM h
    ),
    s AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS n_pos,
             CAST(SUM(cb) AS BIGINT) AS n_neg,
             SUM(ca * (2 * below + ca + cb + 1)) AS r2a
      FROM c
    )
    SELECT n_pos, n_neg,
           CAST(r2a AS BIGINT) AS r_pos_doubled,
           CAST(((r2a - CAST(n_pos AS HUGEINT) * (n_pos + 1)) * 1000000)
                // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT)
             AS auc_ppm
    FROM s
    """,
    ("X-statistics", "A1"),
)
def stat_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trapezoidal ROC-AUC of order value as a predictor of
    URGENT priority (stats.roc_auc): the rank-sum identity with
    midrank tie credit, in exact ppm. Unlike the quantity test, the
    score here (price cents) is near-unique per row — the case the
    two-phase bucketed prefix sum exists for: the distinct-value
    histogram is fact-cardinality and would OOM/serialize a naive
    ORDER-BY-everything window on one partition; bucket offsets keep
    every window bounded (<=1025 buckets globally, per-bucket
    within)."""
    from etl_script_spark.operators import stats

    o = t(spark, sf_dir, "orders")
    from etl_script_spark.plans.catalog import cents

    scored = o.select(
        F.col("o_orderpriority").startswith("1").alias("is_urgent"),
        cents(F.col("o_totalprice")).alias("score"),
    )
    return stats.roc_auc(scored, "is_urgent", "score")


@register(
    "stat_cohens_kappa",
    """
    WITH cells AS (
      SELECT (CAST(ROUND(l_discount * 100) AS BIGINT) >= 5) AS ra,
             (CAST(ROUND(l_tax * 100) AS BIGINT) >= 4) AS rb,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN ra = rb THEN cnt ELSE 0 END) AS BIGINT)
               AS agree
      FROM cells
    ),
    chance AS (
      SELECT SUM(CAST(r.r_k AS HUGEINT) * c.c_k) AS chance_pairs
      FROM (SELECT ra AS k, SUM(cnt) AS r_k FROM cells GROUP BY ra) r
      JOIN (SELECT rb AS k, SUM(cnt) AS c_k FROM cells GROUP BY rb) c
        ON r.k = c.k
    )
    SELECT n, agree, CAST(chance_pairs AS BIGINT) AS chance_pairs,
           CASE WHEN CAST(n AS HUGEINT) * n - chance_pairs = 0 THEN NULL
                WHEN CAST(n AS HUGEINT) * agree - chance_pairs < 0
                THEN -CAST((abs(CAST(n AS HUGEINT) * agree - chance_pairs)
                            * 1000000)
                           // (CAST(n AS HUGEINT) * n - chance_pairs)
                           AS BIGINT)
                ELSE CAST((abs(CAST(n AS HUGEINT) * agree - chance_pairs)
                           * 1000000)
                          // (CAST(n AS HUGEINT) * n - chance_pairs)
                          AS BIGINT)
           END AS kappa_ppm
    FROM tot CROSS JOIN chance
    """,
    ("X-statistics", "A1"),
)
def stat_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Cohen's kappa between two derived boolean raters — the
    'discount >= 5%' gate vs the 'tax >= 4%' gate on each lineitem
    (stats.cohens_kappa): observed vs marginal-implied chance
    agreement in exact ppm, magnitudes DIVided and the sign
    reapplied because kappa goes negative on worse-than-chance
    agreement. The inter-annotator readout an RLHF labeling pipeline
    runs; one fact aggregation, everything downstream is
    category-cardinality."""
    from etl_script_spark.operators import stats

    li = t(spark, sf_dir, "lineitem").select(
        (F.round(F.col("l_discount") * 100).cast("long") >= 5).alias("ga"),
        (F.round(F.col("l_tax") * 100).cast("long") >= 4).alias("gb"),
    )
    return stats.cohens_kappa(li, "ga", "gb")


from etl_script_spark.operators.stats import _isqrt_sql  # noqa: E402

_CORR_LADDER_SQL = """
    CASE WHEN {q} <= 1000000000 THEN 1000000000
         WHEN {q} <= 1000000000000000 THEN 1000000
         WHEN {q} <= 1000000000000000000000 THEN 1000
         ELSE 1 END"""

_CORR_TAIL_SQL = """
    SELECT {keys} CAST(n AS BIGINT) AS n,
           CASE WHEN bx * byy = 0 THEN NULL
                WHEN num < 0
                THEN -CAST(((abs(num) // n) * kx * ky * 1000000000)
                           // (bx * byy) AS BIGINT)
                ELSE CAST(((abs(num) // n) * kx * ky * 1000000000)
                          // (bx * byy) AS BIGINT)
           END AS {out}
    FROM b
"""


def _corr_oracle_tail(keys: str = "", out: str = "corr_ppb") -> str:
    """DuckDB twin of stats.corr_ppb_from_suffstats, as the final CTE
    stages: expects a CTE ``d`` with columns (keys..., n, num, qx,
    qy) — all HUGEINT, num = n·Sxy−Sx·Sy, qx/qy the n-downscaled
    denominators — and emits the k-ladder stage, the ±2-corrected
    integer sqrts (``byy`` because BY is reserved) and the final
    select. Arithmetic mirrors the Spark convention bit-for-bit."""
    kx = _CORR_LADDER_SQL.format(q="qx")
    ky = _CORR_LADDER_SQL.format(q="qy")
    return (
        f", s2 AS (SELECT {keys} n, num, {kx} AS kx, {ky} AS ky,\n"
        f"         qx * {kx} * {kx} AS qxs, qy * {ky} * {ky} AS qys\n"
        f"         FROM d)\n"
        f", b AS (SELECT {keys} n, num, kx, ky, {_isqrt_sql('qxs')} AS bx,"
        f" {_isqrt_sql('qys')} AS byy FROM s2)\n"
        + _CORR_TAIL_SQL.format(keys=keys, out=out)
    )


@register(
    "stat_spearman_rho",
    """
    WITH p AS (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y,
             CAST(COUNT(*) AS HUGEINT) AS cnt
      FROM lineitem GROUP BY 1, 2
    ),
    rx AS (
      SELECT v, 2 * (SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                     - c) + c + 1 AS dx
      FROM (SELECT x AS v, SUM(cnt) AS c FROM p GROUP BY 1)
    ),
    ry AS (
      SELECT v, 2 * (SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                     - c) + c + 1 AS dy
      FROM (SELECT y AS v, SUM(cnt) AS c FROM p GROUP BY 1)
    ),
    s AS (
      SELECT SUM(cnt) AS n, SUM(cnt * dx) AS sx, SUM(cnt * dy) AS sy,
             SUM(cnt * dx * dx) AS sxx, SUM(cnt * dy * dy) AS syy,
             SUM(cnt * dx * dy) AS sxy
      FROM p JOIN rx ON p.x = rx.v JOIN ry ON p.y = ry.v
    ),
    d AS (
      SELECT n, n * sxy - sx * sy AS num,
             (n * sxx - sx * sx) // n AS qx,
             (n * syy - sy * sy) // n AS qy
      FROM s
    )"""
    + _corr_oracle_tail(out="rho_ppb"),
    ("X-statistics", "A1"),
)
def stat_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between line quantity (1-50, heavy
    ties) and extended price cents (near-unique) — stats.spearman_rho:
    midrank ties via doubled integer ranks from a histogram +
    two-phase bucketed prefix sum (no per-row ranks, no global sort),
    Pearson on the ranks from six exact integer sufficient
    statistics, and rho in ppb under the deterministic integer-sqrt
    convention (a bare FLOOR(SQRT()) would not be cross-engine safe;
    the ±2 integer correction window is)."""
    from etl_script_spark.operators import stats
    from etl_script_spark.plans.catalog import cents

    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x"),
        cents(F.col("l_extendedprice")).alias("y"),
    )
    return stats.spearman_rho(li, "x", "y")


@register(
    "feat_target_encode_loo",
    """
    WITH j AS (
      SELECT o_orderkey, c_nationkey,
             CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS t
      FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    cat AS (
      SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS cat_n,
             CAST(SUM(t) AS HUGEINT) AS s
      FROM j GROUP BY 1
    ),
    g AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS gn,
             CAST(SUM(t) AS HUGEINT) AS gs
      FROM j
    )
    SELECT o_orderkey, j.c_nationkey, cat_n,
           CAST(((s - t) * 1000000 + 10 * ((gs * 1000000) // gn))
                // (cat_n - 1 + 10) AS BIGINT) AS enc_ppm
    FROM j JOIN cat ON j.c_nationkey = cat.c_nationkey CROSS JOIN g
    """,
    ("X-features",),
)
def feat_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed leave-one-out target encoding of customer nation
    against the urgent-priority flag (features.target_encode_loo):
    the row's own label is excluded from its category mean so the
    feature cannot leak its target, the m=10 pseudo-count prior
    shrinks small nations toward the global rate, and every step is
    exact integer DECIMAL arithmetic — the same row encodes
    identically on any engine, backfill or serve. One category
    aggregation + one unhinted join back."""
    from etl_script_spark.operators import features

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.when(F.col("o_orderpriority").startswith("1"), 1)
        .otherwise(0).alias("t"),
    )
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    j = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        "o_orderkey", "c_nationkey", "t"
    )
    return features.target_encode_loo(j, "c_nationkey", "t").select(
        "o_orderkey", "c_nationkey", "cat_n", "enc_ppm"
    )


@register(
    "gov_t_closeness",
    """
    WITH c AS (
      SELECT c_nationkey, c_mktsegment,
             (CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000) // 100000
               AS sb
      FROM customer
    ),
    cells AS (
      SELECT c_nationkey, c_mktsegment, sb,
             CAST(COUNT(*) AS HUGEINT) AS c_gs
      FROM c GROUP BY 1, 2, 3
    ),
    marg AS (SELECT sb, SUM(c_gs) AS c_s FROM cells GROUP BY 1),
    tot AS (SELECT SUM(c_s) AS nn FROM marg),
    grp AS (
      SELECT c_nationkey, c_mktsegment, SUM(c_gs) AS n
      FROM cells GROUP BY 1, 2
    ),
    pres AS (
      SELECT cells.c_nationkey, cells.c_mktsegment,
             SUM(abs(c_gs * nn - c_s * n)) AS dev,
             SUM(c_s) AS mp
      FROM cells
      JOIN marg USING (sb)
      JOIN grp USING (c_nationkey, c_mktsegment)
      CROSS JOIN tot
      GROUP BY 1, 2
    )
    SELECT g.c_nationkey, g.c_mktsegment, CAST(g.n AS BIGINT) AS n,
           CAST(((dev + (nn - mp) * g.n) * 1000000)
                // (2 * g.n * nn) AS BIGINT) AS tvd_ppm,
           (((dev + (nn - mp) * g.n) * 1000000)
            // (2 * g.n * nn)) > 300000 AS breach
    FROM grp g JOIN pres USING (c_nationkey, c_mktsegment) CROSS JOIN tot
    """,
    ("X-governance",),
)
def gov_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit of (nation, market segment) groups against
    the account-balance band (shifted-integer bucketing — floor-vs-
    truncate never sees a negative): exact total-variation distance
    in ppm between each group's sensitive distribution and the
    global one (governance.t_closeness_report), the leak k-anonymity
    and l-diversity both miss. Sensitive values absent from a group
    fold into one exact marginal term instead of a dense
    group-by-sensitive cross join."""
    from etl_script_spark.operators import governance

    c = t(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment",
        F.expr(
            "(CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000)"
            " DIV 100000"
        ).alias("sb"),
    )
    return governance.t_closeness_report(
        c, ["c_nationkey", "c_mktsegment"], "sb", t_ppm=300000
    )


@register(
    "stat_cramers_v",
    f"""
    WITH cells AS (
      SELECT CASE WHEN l_quantity <= 16 THEN 'low'
                  WHEN l_quantity <= 33 THEN 'mid'
                  ELSE 'high' END AS row_val,
             l_returnflag AS col_val,
             CAST(COUNT(*) AS BIGINT) AS obs
      FROM lineitem GROUP BY 1, 2
    ),
    tot AS (
      SELECT row_val, col_val, obs,
             SUM(obs) OVER (PARTITION BY row_val) AS rt,
             SUM(obs) OVER (PARTITION BY col_val) AS ct,
             SUM(obs) OVER () AS nn
      FROM cells
    ),
    cc AS (
      SELECT obs,
             ((obs * 1000 - (rt * ct * 1000) // nn)
              * (obs * 1000 - (rt * ct * 1000) // nn))
             // greatest((rt * ct * 1000) // nn, 1) AS c2m,
             row_val, col_val
      FROM tot
    ),
    em AS (
      SELECT obs,
             (rt * ct * 1000) // nn AS e_m,
             row_val, col_val
      FROM tot
    ),
    rm AS (SELECT row_val, SUM(obs) AS rt FROM cells GROUP BY 1),
    cm AS (SELECT col_val, SUM(obs) AS ct FROM cells GROUP BY 1),
    nt AS (SELECT SUM(obs) AS nn FROM cells),
    eall AS (
      SELECT CAST(SUM((rm.rt * cm.ct * 1000) // nt.nn) AS BIGINT)
               AS e_all
      FROM rm CROSS JOIN cm CROSS JOIN nt
    ),
    s AS (
      SELECT CAST(SUM(cc.obs) AS BIGINT) AS n,
             CAST(SUM(cc.c2m)
                  + (SELECT e_all FROM eall)
                  - SUM(em.e_m) AS BIGINT) AS chi2_milli,
             CAST(LEAST(COUNT(DISTINCT cc.row_val),
                        COUNT(DISTINCT cc.col_val)) - 1 AS BIGINT)
               AS df_min
      FROM cc JOIN em ON cc.row_val = em.row_val
                     AND cc.col_val = em.col_val
    ),
    a AS (
      SELECT n, chi2_milli, df_min,
             (CAST(chi2_milli AS HUGEINT) * 1000000000000)
               // (CAST(n AS HUGEINT) * df_min * 1000) AS arg
      FROM s
    )
    SELECT n, chi2_milli, df_min,
           CASE WHEN df_min <= 0 THEN NULL
                ELSE CAST(LEAST({_isqrt_sql('arg')},
                                CAST(1000000 AS HUGEINT)) AS BIGINT)
           END AS v_ppm
    FROM a
    """,
    ("X-statistics",),
)
def stat_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V for quantity band x return flag (stats.cramers_v):
    the
    [0,1]-normalized chi-square effect size in exact ppm via the
    integer-sqrt convention — the readout that compares association
    strength ACROSS tables, where raw chi2 only ranks within one n.
    One fact aggregation to the 21-cell table; the isqrt's ±2
    correction window keeps the root identical across engines."""
    from etl_script_spark.operators import stats

    li = t(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_quantity") <= 16, "low")
        .when(F.col("l_quantity") <= 33, "mid")
        .otherwise("high").alias("qband"),
        "l_returnflag",
    )
    return stats.cramers_v(li, "qband", "l_returnflag")


@register(
    "stat_randomization_test",
    """
    WITH base AS (
      SELECT CAST(l_orderkey * 10 + l_linenumber AS VARCHAR) AS id,
             (l_returnflag = 'R') AS ga,
             CAST(l_quantity AS BIGINT) AS v
      FROM lineitem
      WHERE l_returnflag IN ('R', 'A') AND l_linenumber = 1
    ),
    obs AS (
      SELECT CAST(SUM(CASE WHEN ga THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             SUM(CASE WHEN ga THEN CAST(v AS HUGEINT) ELSE 0 END) AS s_a,
             CAST(SUM(CASE WHEN ga THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
             SUM(CASE WHEN ga THEN 0 ELSE CAST(v AS HUGEINT) END) AS s_b
      FROM base
    ),
    r AS (
      SELECT base.id, base.v, rep,
             substr(md5('rt' || CAST(rep AS VARCHAR) || '|' || base.id),
                    1, 1)
               IN ('0','2','4','6','8','a','c','e') AS pa
      FROM base CROSS JOIN (SELECT unnest(range(49)) AS rep)
    ),
    per AS (
      SELECT rep,
             CAST(SUM(CASE WHEN pa THEN 1 ELSE 0 END) AS BIGINT) AS n_ar,
             SUM(CASE WHEN pa THEN CAST(v AS HUGEINT) ELSE 0 END) AS s_ar,
             CAST(SUM(CASE WHEN pa THEN 0 ELSE 1 END) AS BIGINT) AS n_br,
             SUM(CASE WHEN pa THEN 0 ELSE CAST(v AS HUGEINT) END) AS s_br
      FROM r GROUP BY 1
    ),
    x AS (
      SELECT per.*, obs.n_a, obs.n_b, obs.s_a, obs.s_b,
             (n_ar = 0 OR n_br = 0
              OR abs(s_ar * n_br - s_br * n_ar)
                 * CAST(n_a AS HUGEINT) * n_b
                 >= abs(s_a * n_b - s_b * n_a)
                    * CAST(n_ar AS HUGEINT) * n_br) AS extreme
      FROM per CROSS JOIN obs
    )
    SELECT n_a, n_b, CAST(COUNT(*) AS BIGINT) AS reps,
           CAST(SUM(CASE WHEN extreme THEN 1 ELSE 0 END) AS BIGINT)
             AS extreme_reps,
           CAST(((1 + SUM(CASE WHEN extreme THEN 1 ELSE 0 END))
                 * 1000000) // (COUNT(*) + 1) AS BIGINT) AS p_ppm
    FROM x GROUP BY 1, 2
    """,
    ("X-statistics",),
)
def stat_randomization_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic randomization test for RETURNED-vs-ACCEPTED mean
    quantity on first-line lineitems
    (stats.randomization_test_mean_diff):
    49 md5-parity label reshuffles, extremeness decided by EXACT
    decimal cross-multiplication (no float means), add-one p in ppm.
    The md5-nibble assignment is the hash_sample idiom — the same
    bits on every engine, run, and cluster size; one explode(x49) +
    one map-side-combined aggregation is the whole null
    distribution."""
    from etl_script_spark.operators import stats

    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_linenumber") == 1
    ).select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rid"),
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("qty"),
    )
    return stats.randomization_test_mean_diff(
        li, "rid", "l_returnflag", "qty", "R", "A", reps=49, seed="rt"
    )


@register(
    "feat_hashed_buckets",
    """
    WITH h AS (
      SELECT c_custkey,
             CAST(('0x' || substr(md5('fh' || '|'
                    || COALESCE(CAST(c_nationkey AS VARCHAR), chr(0))
                    || '|'
                    || COALESCE(c_mktsegment, chr(0))), 1, 8))::BIGINT
                  % 32 AS INTEGER) AS bucket
      FROM customer
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_keys
    FROM h GROUP BY 1
    """,
    ("X-features",),
)
def feat_hashed_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (features.hashed_feature_buckets): the
    (nation, segment) combination folds into 32 stable md5-derived
    feature buckets — a pure per-row projection with no vocabulary
    state, reproducible across engines/runs/cluster sizes, which is
    why serving stacks use it (Weinberger et al. 2009). The entry
    hashes every customer and reports per-bucket occupancy."""
    from etl_script_spark.operators import features

    c = t(spark, sf_dir, "customer")
    out = features.hashed_feature_buckets(
        c, ["c_nationkey", "c_mktsegment"], n_buckets=32, seed="fh"
    )
    return out.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("c_custkey").cast("long").alias("n_keys"),
    )


@register(
    "stat_trimmed_mean",
    """
    WITH h AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    ),
    cum AS (
      SELECT v, c,
             SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c
               AS below,
             SUM(c) OVER () AS n
      FROM h
    ),
    cuts AS (
      SELECT v, c, below, n,
             (n * 10) // 100 AS klo, (n * 90) // 100 AS khi
      FROM cum
    ),
    wts AS (
      SELECT n,
             GREATEST(0, LEAST(below + c, khi)
                         - GREATEST(below + 1, klo + 1) + 1) AS w,
             v
      FROM cuts
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(SUM(w) AS BIGINT) AS kept_n,
           CAST(SUM(CAST(w AS HUGEINT) * v) AS BIGINT) AS trimmed_sum,
           CAST((SUM(CAST(w AS HUGEINT) * v) * 1000000) // SUM(w)
                AS BIGINT) AS tmean_micro
    FROM wts GROUP BY n
    """,
    ("X-statistics", "A1"),
)
def stat_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 10-90% trimmed mean of extended price cents
    (stats.trimmed_mean): ranks never materialize per row — the
    per-value histogram + two-phase bucketed prefix sum give each
    distinct value its rank interval, and a straddling value
    contributes exactly its overlapping multiplicity. The robust
    location readout next to MAD outliers; one fact aggregation +
    bounded windows, mean in exact micro-units."""
    from etl_script_spark.operators import stats
    from etl_script_spark.plans.catalog import cents

    li = t(spark, sf_dir, "lineitem").select(
        cents(F.col("l_extendedprice")).alias("p")
    )
    return stats.trimmed_mean(li, "p", 10, 90)


def _corr_pair_sql(tag: str, sx: str, sy: str, qx: str, qy: str,
                   xy: str) -> dict[str, str]:
    """SQL fragments replicating corr_ppb_from_suffstats for one pair
    of suff-stat columns (all HUGEINT, with ``n`` in scope)."""
    num = f"(n * {xy} - {sx} * {sy})"
    qa = f"((n * {qx} - {sx} * {sx}) // n)"
    qb = f"((n * {qy} - {sy} * {sy}) // n)"
    ka = _CORR_LADDER_SQL.format(q=f"qa_{tag}")
    kb = _CORR_LADDER_SQL.format(q=f"qb_{tag}")
    return {
        "stage1": (f"{num} AS num_{tag}, {qa} AS qa_{tag},"
                   f" {qb} AS qb_{tag}"),
        "stage2": (f"{ka} AS ka_{tag}, {kb} AS kb_{tag},"
                   f" qa_{tag} * {ka} * {ka} AS qas_{tag},"
                   f" qb_{tag} * {kb} * {kb} AS qbs_{tag}"),
        "stage3": (f"{_isqrt_sql(f'qas_{tag}')} AS ba_{tag},"
                   f" {_isqrt_sql(f'qbs_{tag}')} AS bb_{tag}"),
        "corr": (
            f"CASE WHEN ba_{tag} * bb_{tag} = 0 THEN NULL"
            f" WHEN num_{tag} < 0 THEN"
            f"  -CAST(((abs(num_{tag}) // n) * ka_{tag} * kb_{tag}"
            f"         * 1000000000) // (ba_{tag} * bb_{tag}) AS HUGEINT)"
            f" ELSE CAST(((abs(num_{tag}) // n) * ka_{tag} * kb_{tag}"
            f"      * 1000000000) // (ba_{tag} * bb_{tag}) AS HUGEINT)"
            f" END"
        ),
    }


def _partial_corr_oracle() -> str:
    xy = _corr_pair_sql("xy", "sx", "sy", "qxx", "qyy", "x_xy")
    xz = _corr_pair_sql("xz", "sx", "sz", "qxx", "qzz", "x_xz")
    zy = _corr_pair_sql("zy", "sy", "sz", "qyy", "qzz", "x_zy")
    # NOTE x_zy is SUM(y*z): partial_corr_ppb's rzy is corr(y, z)
    return f"""
    WITH base AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS HUGEINT) AS xv,
             CAST(ROUND(l_discount * 10000) AS HUGEINT) AS yv,
             CAST(l_quantity AS HUGEINT) AS zv
      FROM lineitem
    ),
    s AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(xv) AS sx, SUM(yv) AS sy, SUM(zv) AS sz,
             SUM(xv * xv) AS qxx, SUM(yv * yv) AS qyy,
             SUM(zv * zv) AS qzz,
             SUM(xv * yv) AS x_xy, SUM(xv * zv) AS x_xz,
             SUM(yv * zv) AS x_zy
      FROM base
    ),
    p1 AS (SELECT *, {xy['stage1']}, {xz['stage1']}, {zy['stage1']}
           FROM s),
    p2 AS (SELECT *, {xy['stage2']}, {xz['stage2']}, {zy['stage2']}
           FROM p1),
    p3 AS (SELECT *, {xy['stage3']}, {xz['stage3']}, {zy['stage3']}
           FROM p2),
    corrs AS (
      SELECT n, {xy['corr']} AS rxy, {xz['corr']} AS rxz,
             {zy['corr']} AS rzy
      FROM p3
    ),
    pc AS (
      SELECT n, rxy, rxz, rzy,
             rxy * 1000000000 - rxz * rzy AS pnum,
             1000000000000000000 - rxz * rxz AS da,
             1000000000000000000 - rzy * rzy AS db
      FROM corrs
    ),
    pb AS (
      SELECT n, rxy, rxz, rzy, pnum,
             {_isqrt_sql('da')} AS pba, {_isqrt_sql('db')} AS pbb
      FROM pc
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(rxy AS BIGINT) AS rxy_ppb,
           CAST(rxz AS BIGINT) AS rxz_ppb,
           CAST(rzy AS BIGINT) AS rzy_ppb,
           CASE WHEN rxy IS NULL OR rxz IS NULL OR rzy IS NULL
                     OR pba * pbb = 0 THEN NULL
                WHEN pnum < 0 THEN
                  -CAST(LEAST((abs(pnum) * 1000000000) // (pba * pbb),
                              CAST(1000000000 AS HUGEINT)) AS BIGINT)
                ELSE CAST(LEAST((abs(pnum) * 1000000000) // (pba * pbb),
                                CAST(1000000000 AS HUGEINT)) AS BIGINT)
           END AS partial_ppb
    FROM pb
    """


@register(
    "stat_partial_corr", _partial_corr_oracle(), ("X-statistics",)
)
def stat_partial_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order partial correlation of extended price and discount
    CONTROLLING for quantity (stats.partial_corr_ppb): the
    confounder-control readout a feature audit wants before claiming
    two signals are related. All three pairwise Pearson correlations
    come from ONE fact aggregation (stats.pearson_pairwise_ppb);
    the partial formula runs as a documented second-stage integer
    convention over the ppb-QUANTIZED correlations, so both engines
    combine identical integers — no raw-float recombination to
    drift."""
    from etl_script_spark.operators import stats
    from etl_script_spark.plans.catalog import cents

    li = t(spark, sf_dir, "lineitem").select(
        cents(F.col("l_extendedprice")).alias("xv"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("yv"),
        F.col("l_quantity").cast("long").alias("zv"),
    )
    return stats.partial_corr_ppb(li, "xv", "yv", "zv")


@register(
    "stat_theil_sen",
    """
    WITH b AS (
      SELECT p_brand AS g, CAST(p_size AS BIGINT) AS x,
             CAST(ROUND(p_retailprice * 100) AS BIGINT) AS y
      FROM part
      WHERE p_size IS NOT NULL AND p_retailprice IS NOT NULL
    ),
    pairs AS (
      SELECT i.g, j.y - i.y AS dy, j.x - i.x AS dx
      FROM b i JOIN b j ON i.g = j.g AND i.x < j.x
    ),
    slopes AS (
      SELECT g,
             CASE WHEN dy < 0 THEN -((abs(dy) * 1000000) // dx)
             ELSE (abs(dy) * 1000000) // dx
             END AS s
      FROM pairs
    ),
    r AS (
      SELECT g, s,
             ROW_NUMBER() OVER (PARTITION BY g ORDER BY s) AS r,
             COUNT(*) OVER (PARTITION BY g) AS m
      FROM slopes
    )
    SELECT g AS "group", CAST(m AS BIGINT) AS n_pairs, s AS slope_micro
    FROM r WHERE r = (m + 1) // 2
    """,
    ("X-statistics", "X-robust-stats"),
)
def stat_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Theil-Sen slope of retail price (cents) on part size
    (stats.theil_sen_groups): the MEDIAN of all pairwise slopes — the
    robust regression twin of stat_ols_slope_groups (breakdown ~29%
    vs OLS's zero). Pair generation is the group self-joined (Θ(n²)
    per group — inherent to the statistic, bounded by the brand
    fan-out here); slopes are exact integer micro-units with the
    abs/DIV truncation contract; the median is the lower order
    statistic, no float percentile."""
    from etl_script_spark.operators import stats
    from etl_script_spark.plans.catalog import cents

    p = t(spark, sf_dir, "part").select(
        "p_brand",
        F.col("p_size").cast("long").alias("x"),
        cents(F.col("p_retailprice")).alias("y"),
    )
    return stats.theil_sen_groups(p, "p_brand", "x", "y")


@register(
    "stat_bootstrap_ci",
    f"""
    WITH v AS (
      SELECT o_orderkey AS id, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x
      FROM orders WHERE o_totalprice IS NOT NULL
    ),
    reps AS (
      SELECT r.range AS b, id, x,
             ('0x' || substr(md5('bs' || '|' || CAST(r.range AS VARCHAR)
                    || '|' || CAST(id AS VARCHAR)), 1, 8))::BIGINT AS u
      FROM v CROSS JOIN range(64) r
    ),
    wt AS (
      SELECT b, x,
             (CASE WHEN u >= 1580030168 THEN 1 ELSE 0 END
            + CASE WHEN u >= 3160060337 THEN 1 ELSE 0 END
            + CASE WHEN u >= 3950075421 THEN 1 ELSE 0 END
            + CASE WHEN u >= 4213413783 THEN 1 ELSE 0 END
            + CASE WHEN u >= 4279248373 THEN 1 ELSE 0 END
            + CASE WHEN u >= 4292415291 THEN 1 ELSE 0 END
            + CASE WHEN u >= 4294609777 THEN 1 ELSE 0 END) AS w
      FROM reps
    ),
    means AS (
      SELECT b,
             CAST((SUM(CAST(w AS HUGEINT) * x) * 1000000)
                  // SUM(CAST(w AS HUGEINT)) AS BIGINT) AS m
      FROM wt GROUP BY b HAVING SUM(w) > 0
    ),
    r AS (
      SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS r,
             COUNT(*) OVER () AS cnt
      FROM means
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM means) AS n_boot,
           (SELECT CAST((SUM(CAST(x AS HUGEINT)) * 1000000) // COUNT(*)
                        AS BIGINT) FROM v) AS mean_micro,
           MAX(CASE WHEN r = (cnt * 5 + 99) // 100 THEN m END) AS lo_micro,
           MAX(CASE WHEN r = cnt - ((cnt * 5 + 99) // 100) + 1 THEN m END)
             AS hi_micro
    FROM r
    """,
    ("X-statistics",),
)
def stat_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic percentile-bootstrap 90% CI for the mean order
    value (stats.bootstrap_ci_mean): replicate weights are Poisson(1)
    draws decoded from md5(seed|b|id) — no RNG state, identical on any
    engine/cluster/retry — replicate means are exact micro-units, and
    the bounds are order statistics of the 64 replicate means. The
    explode-by-64 feeds straight into a hash agg keyed on b, so the
    shuffle carries 64·tasks rows, not 64·n."""
    from etl_script_spark.operators import stats
    from etl_script_spark.plans.catalog import cents

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", cents(F.col("o_totalprice")).alias("x")
    )
    return stats.bootstrap_ci_mean(
        o, "o_orderkey", "x", n_boot=64, lo_pct=5, hi_pct=95, seed="bs"
    )


@register(
    "feat_woe_encoding",
    """
    WITH h AS (
      SELECT o_orderpriority AS category, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS pos
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(pos) AS BIGINT) AS p,
             CAST(SUM(n - pos) AS BIGINT) AS q,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM h
    ),
    woe AS (
      SELECT category, n, pos,
             CAST(ROUND((ln((pos + 1) / CAST(p + k AS DOUBLE))
                       - ln((n - pos + 1) / CAST(q + k AS DOUBLE)))
                        * 1000000.0) AS BIGINT) AS woe_micro,
             (pos + 1) / CAST(p + k AS DOUBLE)
               - (n - pos + 1) / CAST(q + k AS DOUBLE) AS d
      FROM h CROSS JOIN tot
    )
    SELECT category, n, pos, woe_micro,
           CAST(ROUND(d * woe_micro) AS BIGINT) AS iv_micro
    FROM woe
    """,
    ("X-features",),
)
def feat_woe_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence encoding of order priority toward the
    'finished' status (features.woe_encoding): Laplace-smoothed
    log-odds per category plus the information-value term — the
    scorecard-standard monotone encoding, log-odds-shaped where
    target_encode_loo is probability-shaped. One aggregation + a
    single-row broadcast of the totals; ln quantized to micro-units at
    the float boundary (the repo's standard policy)."""
    from etl_script_spark.operators import features

    o = t(spark, sf_dir, "orders")
    return features.woe_encoding(
        o, "o_orderpriority", F.col("o_orderstatus") == "F", alpha=1
    )


@register(
    "stat_welch_ttest",
    """
    WITH s AS (
      SELECT
        CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
             AS BIGINT) AS na,
        CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
             AS BIGINT) AS nb,
        SUM(CASE WHEN l_returnflag = 'R'
              THEN CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
              ELSE 0 END) AS sa,
        SUM(CASE WHEN l_returnflag = 'N'
              THEN CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
              ELSE 0 END) AS sb,
        SUM(CASE WHEN l_returnflag = 'R'
              THEN CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
                   * CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
              ELSE 0 END) AS qa,
        SUM(CASE WHEN l_returnflag = 'N'
              THEN CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
                   * CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
              ELSE 0 END) AS qb
      FROM lineitem
      WHERE l_returnflag IN ('R', 'N') AND l_extendedprice IS NOT NULL
    ),
    m AS (
      SELECT na, nb,
        CASE WHEN sa < 0 THEN -((abs(sa) * 1000000) // na)
             ELSE (sa * 1000000) // na END AS ma,
        CASE WHEN sb < 0 THEN -((abs(sb) * 1000000) // nb)
             ELSE (sb * 1000000) // nb END AS mb,
        ((na * qa - sa * sa) * 1000000)
          // (CAST(na AS HUGEINT) * (na - 1) * na) AS sea2,
        ((nb * qb - sb * sb) * 1000000)
          // (CAST(nb AS HUGEINT) * (nb - 1) * nb) AS seb2
      FROM s
    ),
    v AS (SELECT *, sea2 + seb2 AS vv FROM m),
    se AS (SELECT *, (CASE WHEN (CAST(FLOOR(SQRT(CAST(vv AS DOUBLE))) AS HUGEINT)+2)*(CAST(FLOOR(SQRT(CAST(vv AS DOUBLE))) AS HUGEINT)+2) <= vv THEN CAST(FLOOR(SQRT(CAST(vv AS DOUBLE))) AS HUGEINT)+2 WHEN (CAST(FLOOR(SQRT(CAST(vv AS DOUBLE))) AS HUGEINT)+1)*(CAST(FLOOR(SQRT(CAST(vv AS DOUBLE))) AS HUGEINT)+1) <= vv THEN CAST(FLOOR(SQRT(CAST(vv AS DOUBLE))) AS HUGEINT)+1 WHEN CAST(FLOOR(SQRT(CAST(vv AS DOUBLE))) AS HUGEINT)*CAST(FLOOR(SQRT(CAST(vv AS DOUBLE))) AS HUGEINT) <= vv THEN CAST(FLOOR(SQRT(CAST(vv AS DOUBLE))) AS HUGEINT) WHEN (CAST(FLOOR(SQRT(CAST(vv AS DOUBLE))) AS HUGEINT)-1)*(CAST(FLOOR(SQRT(CAST(vv AS DOUBLE))) AS HUGEINT)-1) <= vv THEN CAST(FLOOR(SQRT(CAST(vv AS DOUBLE))) AS HUGEINT)-1 ELSE CAST(FLOOR(SQRT(CAST(vv AS DOUBLE))) AS HUGEINT)-2 END) AS se FROM v)
    SELECT na AS n_a, nb AS n_b,
           CAST(ma - mb AS BIGINT) AS dmean_micro,
           CASE WHEN se = 0 THEN NULL
                WHEN ma - mb < 0 THEN
                  -CAST(abs(CAST(ma - mb AS HUGEINT)) // se AS BIGINT)
                ELSE CAST(CAST(ma - mb AS HUGEINT) // se AS BIGINT)
                END AS t_milli,
           CAST(ROUND(
             (CAST(sea2 AS DOUBLE) + CAST(seb2 AS DOUBLE))
             * (CAST(sea2 AS DOUBLE) + CAST(seb2 AS DOUBLE))
             / (CAST(sea2 AS DOUBLE) * CAST(sea2 AS DOUBLE)
                  / (CAST(na AS DOUBLE) - 1.0)
                + CAST(seb2 AS DOUBLE) * CAST(seb2 AS DOUBLE)
                  / (CAST(nb AS DOUBLE) - 1.0))
             * 1e6) AS BIGINT) AS df_micro
    FROM se
    """,
    ("X-statistics",),
)
def stat_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on extended price cents between
    returned ('R') and current ('N') lineitems (stats.welch_ttest):
    one map-side-combined aggregation for the sufficient statistics,
    standard errors in exact micro^2 via DECIMAL DIV, the pooled SE
    through the integer-sqrt ladder (no float sqrt), t in exact
    milli-units; the Welch-Satterthwaite df is the one float boundary,
    micro-quantized. The A/B-test primitive next to the rank tests."""
    from etl_script_spark.operators import stats

    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr(
            "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
        ).alias("cents"),
    )
    return stats.welch_ttest(li, "l_returnflag", "cents", "R", "N")


@register(
    "gov_dataset_fingerprint",
    """
    WITH h AS (
      SELECT source AS "group",
             ('0x' || substr(md5(
                COALESCE(CAST(doc_id AS VARCHAR), chr(1)) || chr(0) ||
                COALESCE(text, chr(1)) || chr(0) ||
                COALESCE(lang, chr(1))), 1, 15))::BIGINT AS hh
      FROM documents
    )
    SELECT "group", CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(hh AS HUGEINT)) % 4611686018427387904
                AS BIGINT) AS fingerprint
    FROM h GROUP BY 1
    """,
    ("X-governance", "DQ-expectations"),
)
def gov_dataset_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent per-source dataset fingerprint
    (governance.dataset_fingerprint): modular sum of per-row md5
    hashes over (doc_id, text, lang) + row count — the Merkle-style
    publish/verify checksum any engine, partitioning, or row order
    reproduces bit-for-bit, and one corrupted byte anywhere flips.
    One map-side-combinable aggregation; NULL encodes distinctly from
    '' (chr(1) sentinel)."""
    from etl_script_spark.operators import governance

    d = t(spark, sf_dir, "documents")
    return governance.dataset_fingerprint(
        d, "source", ["doc_id", "text", "lang"]
    )


@register(
    "inc_fingerprint_maintenance",
    """
    WITH h AS (
      SELECT source AS "group",
             ('0x' || substr(md5(
                COALESCE(CAST(doc_id AS VARCHAR), chr(1)) || chr(0) ||
                COALESCE(text, chr(1))), 1, 15))::BIGINT AS hh
      FROM documents
      WHERE doc_id % 10 <> 3
    )
    SELECT "group", CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(hh AS HUGEINT)) % 4611686018427387904
                AS BIGINT) AS fingerprint
    FROM h GROUP BY 1
    """,
    ("X-governance", "X-incremental"),
)
def inc_fingerprint_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained dataset fingerprint
    (governance.maintain_fingerprint): base corpus (doc_id%10 != 0)
    plus a CDC batch (insert the %10==0 docs, delete the %10==3) —
    the maintained checksum must equal the oracle's DIRECT recompute
    of the final state bit-for-bit, because the modular hash sum is a
    group under addition (the IVM contract applied to the audit
    primitive; cost of the batch, never the corpus)."""
    from etl_script_spark.operators import governance

    d = t(spark, sf_dir, "documents")
    base = d.filter(F.col("doc_id") % 10 != 0)
    changes = (
        d.filter(F.col("doc_id") % 10 == 0)
        .withColumn("op", F.lit("I"))
        .unionByName(
            d.filter(F.col("doc_id") % 10 == 3).withColumn("op", F.lit("D"))
        )
    )
    return governance.maintain_fingerprint(
        base, changes, "source", ["doc_id", "text"], "op"
    )


@register(
    "stat_kruskal_wallis",
    """
    WITH gv AS (
      SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v,
             COUNT(*) AS cgv
      FROM lineitem GROUP BY 1, 2
    ),
    hv AS (SELECT v, SUM(cgv) AS c FROM gv GROUP BY v),
    bl AS (
      SELECT v, c,
             SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c
               AS below
      FROM hv
    ),
    pg AS (
      SELECT g, SUM(cgv) AS n_g,
             SUM(CAST(cgv AS HUGEINT) * (2 * below + c + 1)) AS r2
      FROM gv JOIN bl USING (v) GROUP BY g
    ),
    tt AS (
      SELECT SUM(CAST(c AS HUGEINT) * c * c - c) AS s3, SUM(c) AS n
      FROM hv
    ),
    dev AS (
      SELECT n_g, r2 - CAST(n_g AS HUGEINT) * (n + 1) AS d2, n, s3
      FROM pg CROSS JOIN tt
    ),
    fold AS (
      SELECT n, s3, COUNT(*) AS n_groups,
             SUM((d2 * d2 * 1000) // (4 * CAST(n_g AS HUGEINT)))
               AS ssq_milli
      FROM dev GROUP BY n, s3
    )
    SELECT CAST(n AS BIGINT) AS n_total,
           CAST(n_groups AS BIGINT) AS n_groups,
           CAST((12 * ssq_milli * 1000)
                // (CAST(n AS HUGEINT) * (n + 1)) AS BIGINT) AS h_ppm,
           CAST(((12 * ssq_milli * 1000)
                  // (CAST(n AS HUGEINT) * (n + 1)) * 1000000000)
                // NULLIF(((CAST(n AS HUGEINT) * n * n - n - s3)
                            * 1000000000)
                          // (CAST(n AS HUGEINT) * n * n - n), 0)
                AS BIGINT) AS h_tie_adj_ppm
    FROM fold
    """,
    ("X-statistics",),
)
def stat_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across the three return-flag populations of
    line quantities (stats.kruskal_wallis) — the k-sample rank test
    with exact doubled-midrank arithmetic, milli-quantized per-group
    deviations, and the tie-corrected H in ppm. Ranks never
    materialize per row: the (group, value) histogram + the two-phase
    bucketed prefix sum carry everything (the oracle's plain window
    is the semantic twin at fixture cardinality)."""
    from etl_script_spark.operators import stats

    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    )
    return stats.kruskal_wallis(li, "l_returnflag", "qty")


@register(
    "stat_kendall_tau",
    """
    WITH oc AS (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY 1),
    b AS (
      SELECT c_nationkey AS g,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS x,
             CAST(COALESCE(cnt, 0) AS BIGINT) AS y
      FROM customer LEFT JOIN oc ON c_custkey = o_custkey
    ),
    bi AS (
      SELECT g, x, y,
             ROW_NUMBER() OVER (PARTITION BY g ORDER BY x, y) AS i
      FROM b
    ),
    cd AS (
      SELECT i.g,
             SUM(CASE WHEN sign(j.x - i.x) * sign(j.y - i.y) > 0
                      THEN 1 ELSE 0 END) AS concordant,
             SUM(CASE WHEN sign(j.x - i.x) * sign(j.y - i.y) < 0
                      THEN 1 ELSE 0 END) AS discordant
      FROM bi i JOIN bi j ON i.g = j.g AND i.i < j.i
      GROUP BY i.g
    ),
    nr AS (SELECT g, COUNT(*) AS n FROM b GROUP BY g),
    tx AS (
      SELECT g, SUM(CAST(t AS HUGEINT) * (t - 1) // 2) AS n1
      FROM (SELECT g, x, COUNT(*) AS t FROM b GROUP BY g, x) GROUP BY g
    ),
    ty AS (
      SELECT g, SUM(CAST(t AS HUGEINT) * (t - 1) // 2) AS n2
      FROM (SELECT g, y, COUNT(*) AS t FROM b GROUP BY g, y) GROUP BY g
    ),
    j AS (
      SELECT nr.g, nr.n,
             COALESCE(concordant, 0) AS concordant,
             COALESCE(discordant, 0) AS discordant,
             CAST(nr.n AS HUGEINT) * (nr.n - 1) // 2 AS n0,
             COALESCE(n1, 0) AS n1, COALESCE(n2, 0) AS n2
      FROM nr LEFT JOIN cd USING (g) LEFT JOIN tx USING (g)
              LEFT JOIN ty USING (g)
    ),
    staged AS (
      SELECT g, n, concordant, discordant,
             concordant - discordant AS num,
             (n0 - n1) * (n0 - n2) * 1000000 AS rad
      FROM j
    )
    SELECT g AS "group", CAST(n AS BIGINT) AS n,
           CAST(concordant AS BIGINT) AS concordant,
           CAST(discordant AS BIGINT) AS discordant,
           CASE WHEN (CASE WHEN (CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)+2)*(CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)+2) <= rad THEN CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)+2 WHEN (CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)+1)*(CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)+1) <= rad THEN CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)+1 WHEN CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)*CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT) <= rad THEN CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT) WHEN (CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)-1)*(CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)-1) <= rad THEN CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)-1 ELSE CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)-2 END) = 0 THEN NULL
                WHEN num < 0
                  THEN CAST(-((abs(CAST(num AS HUGEINT)) * 1000000)
                               // (CASE WHEN (CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)+2)*(CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)+2) <= rad THEN CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)+2 WHEN (CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)+1)*(CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)+1) <= rad THEN CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)+1 WHEN CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)*CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT) <= rad THEN CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT) WHEN (CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)-1)*(CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)-1) <= rad THEN CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)-1 ELSE CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)-2 END)) AS BIGINT)
                ELSE CAST((abs(CAST(num AS HUGEINT)) * 1000000)
                           // (CASE WHEN (CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)+2)*(CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)+2) <= rad THEN CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)+2 WHEN (CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)+1)*(CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)+1) <= rad THEN CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)+1 WHEN CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)*CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT) <= rad THEN CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT) WHEN (CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)-1)*(CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)-1) <= rad THEN CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)-1 ELSE CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS HUGEINT)-2 END) AS BIGINT)
           END AS tau_b_milli
    FROM staged
    """,
    ("X-statistics",),
)
def stat_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Kendall tau-b between customer account balance and
    order count (stats.kendall_tau_groups) — the tie-corrected
    concordance statistic over group-keyed pairwise sign products
    (Θ(n²) PER GROUP by construction, same bounded-group contract as
    Theil-Sen), denominator through the exact integer-sqrt ladder at
    milli precision. Answers 'does a higher balance ORDER customers
    the same way order activity does, nation by nation?'."""
    from etl_script_spark.operators import stats
    from etl_script_spark.plans.catalog import cents

    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").groupBy(
        F.col("o_custkey").alias("c_custkey")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    b = c.join(o, "c_custkey", "left").select(
        F.col("c_nationkey").alias("g"),
        cents(F.col("c_acctbal")).alias("x"),
        F.coalesce("cnt", F.lit(0)).cast("long").alias("y"),
    )
    return stats.kendall_tau_groups(b, "g", "x", "y")


@register(
    "stat_cuped_adjust",
    """
    WITH per_user AS (
      SELECT user_id,
             CAST(user_id % 2 AS BIGINT) AS variant,
             SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN
                 CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS x,
             SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN
                 CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS y
      FROM events GROUP BY 1, 2
    ),
    per AS (
      SELECT variant, COUNT(*) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM per_user GROUP BY variant
    ),
    tot AS (
      SELECT SUM(CAST(n AS HUGEINT)) AS tn, SUM(sx) AS tsx,
             SUM(sy) AS tsy, SUM(sxx) AS tsxx, SUM(sxy) AS tsxy
      FROM per
    ),
    st AS (
      SELECT variant, n, sx, sy, tn, tsx,
             CASE WHEN tn * tsxx - tsx * tsx = 0 THEN 0
                  WHEN tn * tsxy - tsx * tsy < 0
                    THEN -((abs(tn * tsxy - tsx * tsy) * 1000000)
                            // (tn * tsxx - tsx * tsx))
                  ELSE (abs(tn * tsxy - tsx * tsy) * 1000000)
                        // (tn * tsxx - tsx * tsx)
             END AS theta_ppm
      FROM per CROSS JOIN tot
    )
    SELECT variant, CAST(n AS BIGINT) AS n,
           CAST((sy * 1000000) // CAST(n AS HUGEINT) AS BIGINT)
             AS mean_post_micro,
           CAST((sy * 1000000) // CAST(n AS HUGEINT)
                - (CASE WHEN theta_ppm * ((sx * 1000000) // CAST(n AS HUGEINT)
                                          - (tsx * 1000000) // tn) < 0
                        THEN -((abs(theta_ppm * ((sx * 1000000)
                                  // CAST(n AS HUGEINT)
                                  - (tsx * 1000000) // tn))) // 1000000)
                        ELSE (abs(theta_ppm * ((sx * 1000000)
                                  // CAST(n AS HUGEINT)
                                  - (tsx * 1000000) // tn))) // 1000000
                   END) AS BIGINT) AS adj_mean_post_micro,
           CAST(theta_ppm AS BIGINT) AS theta_ppm
    FROM st
    """,
    ("X-statistics", "EV-events"),
)
def stat_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted A/B readout over the event stream
    (stats.cuped_adjusted_means): per-user pre-period value (first
    half of January) as the covariate for the post-period metric,
    variants split by user parity. One fact aggregation to per-user
    sums, one to per-variant sufficient statistics; θ and the
    adjusted means are exact integer arithmetic the oracle replays."""
    from etl_script_spark.operators import stats

    ev = t(spark, sf_dir, "events")
    per_user = ev.groupBy(
        "user_id", (F.col("user_id") % 2).cast("long").alias("variant")
    ).agg(
        F.sum(
            F.when(
                F.col("ts") < F.lit("2024-01-16").cast("timestamp_ntz"),
                F.expr("CAST(ROUND(value * 100) AS BIGINT)"),
            ).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(
                F.col("ts") >= F.lit("2024-01-16").cast("timestamp_ntz"),
                F.expr("CAST(ROUND(value * 100) AS BIGINT)"),
            ).otherwise(0)
        ).alias("y"),
    )
    return stats.cuped_adjusted_means(per_user, "variant", "x", "y")


@register(
    "stat_brown_forsythe",
    """
    WITH gv AS (
      SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v,
             COUNT(*) AS c
      FROM lineitem GROUP BY 1, 2
    ),
    tot AS (SELECT g, SUM(c) AS n_g FROM gv GROUP BY g),
    cum AS (
      SELECT gv.g, v, c, n_g,
             SUM(c) OVER (PARTITION BY gv.g ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cc
      FROM gv JOIN tot ON gv.g = tot.g
    ),
    med AS (
      SELECT g, MIN(v) AS med FROM cum
      WHERE cc >= (n_g + 1) // 2 GROUP BY g
    ),
    z AS (
      SELECT gv.g, c, CAST(abs(v - med) AS HUGEINT) AS z
      FROM gv JOIN med ON gv.g = med.g
    ),
    pg AS (
      SELECT g, SUM(CAST(c AS HUGEINT)) AS n_g,
             SUM(c * z) AS sz, SUM(c * z * z) AS szz
      FROM z GROUP BY g
    ),
    fold AS (
      SELECT COUNT(*) AS n_groups, SUM(n_g) AS n,
             SUM((sz * sz * 1000000) // n_g) AS a_micro,
             SUM(sz) AS s, SUM(szz) AS q
      FROM pg
    )
    SELECT CAST(n AS BIGINT) AS n_total,
           CAST(n_groups AS BIGINT) AS n_groups,
           CAST(((a_micro - (s * s * 1000000) // n)
                  * (n - n_groups) * 1000)
                // NULLIF((q * 1000000 - a_micro) * (n_groups - 1), 0)
                AS BIGINT) AS f_milli
    FROM fold
    """,
    ("X-statistics",),
)
def stat_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe equal-variance test across the return-flag
    groups of line quantities (stats.brown_forsythe): ANOVA F on
    |x − group median|, the group median found as an exact order
    statistic on the value histogram (no sort, no float percentile),
    the F statistic folded from exact (Σz, Σz²) with shared DIV
    quantizations. The robust pre-flight before pooled-variance
    inference."""
    from etl_script_spark.operators import stats

    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    )
    return stats.brown_forsythe(li, "l_returnflag", "qty")


@register(
    "stat_levene_mean",
    """
    WITH gv AS (
      SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v,
             COUNT(*) AS c
      FROM lineitem GROUP BY 1, 2
    ),
    ctr AS (
      SELECT g,
             SUM(CAST(c AS HUGEINT) * v) // SUM(CAST(c AS HUGEINT)) AS ctr
      FROM gv GROUP BY g
    ),
    z AS (
      SELECT gv.g, c, CAST(abs(v - ctr) AS HUGEINT) AS z
      FROM gv JOIN ctr ON gv.g = ctr.g
    ),
    pg AS (
      SELECT g, SUM(CAST(c AS HUGEINT)) AS n_g,
             SUM(c * z) AS sz, SUM(c * z * z) AS szz
      FROM z GROUP BY g
    ),
    fold AS (
      SELECT COUNT(*) AS n_groups, SUM(n_g) AS n,
             SUM((sz * sz * 1000000) // n_g) AS a_micro,
             SUM(sz) AS s, SUM(szz) AS q
      FROM pg
    )
    SELECT CAST(n AS BIGINT) AS n_total,
           CAST(n_groups AS BIGINT) AS n_groups,
           CAST(((a_micro - (s * s * 1000000) // n)
                  * (n - n_groups) * 1000)
                // NULLIF((q * 1000000 - a_micro) * (n_groups - 1), 0)
                AS BIGINT) AS f_milli
    FROM fold
    """,
    ("X-statistics",),
)
def stat_levene_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levene's equal-variance test with mean centers
    (stats.levene_center_mean) over the same return-flag quantity
    groups as stat_brown_forsythe — the near-normal-optimal sibling
    of the median-centered robust form; running both is the classic
    battery. Center = exact integer floor-mean, deviations reuse the
    Brown-Forsythe fold unchanged."""
    from etl_script_spark.operators import stats

    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    )
    return stats.levene_center_mean(li, "l_returnflag", "qty")


@register(
    "stat_mcnemar",
    """
    WITH flags AS (
      SELECT CASE WHEN CAST(ROUND(c_acctbal * 100) AS BIGINT) > 500000
                  THEN 1 ELSE 0 END AS a,
             CASE WHEN o.cnt IS NOT NULL THEN 1 ELSE 0 END AS b
      FROM customer c
      LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt FROM orders
                 GROUP BY o_custkey) o
        ON c.c_custkey = o.o_custkey
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS b_only,
             CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_only
      FROM flags
    )
    SELECT n, b_only, c_only,
           CAST(((CAST(b_only AS HUGEINT) - c_only)
                 * (CAST(b_only AS HUGEINT) - c_only) * 1000000)
                // NULLIF(CAST(b_only AS HUGEINT) + c_only, 0)
                AS BIGINT) AS chi2_ppm
    FROM agg
    """,
    ("X-statistics",),
)
def stat_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired-binary test (stats.mcnemar_test): does
    holding a high account balance and actually placing orders flip
    in one direction more than the other across the SAME customers?
    Only the discordant cells enter the statistic — the paired design
    a plain chi-square would get wrong."""
    from etl_script_spark.operators import stats

    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").groupBy(
        F.col("o_custkey").alias("c_custkey")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    from etl_script_spark.plans.catalog import cents

    flags = c.join(o, "c_custkey", "left").select(
        (cents(F.col("c_acctbal")) > 500000).alias("a"),
        F.col("cnt").isNotNull().alias("b"),
    )
    return stats.mcnemar_test(flags, "a", "b")


@register(
    "stat_cochran_q",
    """
    WITH cell AS (
      SELECT o_custkey AS blk, o_orderpriority AS trt,
             MAX(CASE WHEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                      > 15000000 THEN 1 ELSE 0 END) AS x
      FROM orders GROUP BY 1, 2
    ),
    k_tbl AS (SELECT CAST(COUNT(DISTINCT trt) AS BIGINT) AS k FROM cell),
    rows_f AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
             SUM(r) AS sr, SUM(r * r) AS srr
      FROM (SELECT blk, CAST(SUM(x) AS HUGEINT) AS r FROM cell GROUP BY blk)
    ),
    cols_f AS (
      SELECT SUM(cj * cj) AS scc
      FROM (SELECT trt, CAST(SUM(x) AS HUGEINT) AS cj FROM cell GROUP BY trt)
    )
    SELECT n_blocks, k,
           CAST(((CAST(k AS HUGEINT) - 1)
                 * (CAST(k AS HUGEINT) * scc - sr * sr) * 1000000)
                // NULLIF(CAST(k AS HUGEINT) * sr - srr, 0)
                AS BIGINT) AS q_ppm
    FROM rows_f, cols_f, k_tbl
    """,
    ("X-statistics",),
)
def stat_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q (stats.cochran_q): across customers (blocks), does
    the probability of placing a HIGH-VALUE order differ by order
    priority (treatments)? The k-treatment generalization of McNemar
    over matched binary outcomes, exact integers to one ppm DIV."""
    from etl_script_spark.operators import stats
    from etl_script_spark.plans.catalog import cents

    o = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("blk"),
        F.col("o_orderpriority").alias("trt"),
        (cents(F.col("o_totalprice")) > 15000000).alias("hi"),
    )
    return stats.cochran_q(o, "blk", "trt", "hi")


@register(
    "stat_friedman",
    """
    WITH cell AS (
      SELECT c.c_nationkey AS blk, o.o_orderpriority AS trt,
             SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS v
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT blk, trt,
             CAST(MIN(rn) OVER (PARTITION BY blk, v)
                  + MAX(rn) OVER (PARTITION BY blk, v) AS BIGINT) AS r2
      FROM (SELECT blk, trt, v,
                   ROW_NUMBER() OVER (PARTITION BY blk ORDER BY v) AS rn
            FROM cell)
    ),
    per_trt AS (
      SELECT trt, CAST(SUM(r2) AS HUGEINT) AS r2j,
             CAST(COUNT(*) AS BIGINT) AS n_blocks
      FROM ranked GROUP BY trt
    ),
    fold AS (
      SELECT MAX(n_blocks) AS n_blocks,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM(r2j * r2j) AS s
      FROM per_trt
    )
    SELECT n_blocks, k,
           CAST((12000000 * s) // (4 * CAST(n_blocks AS HUGEINT) * k
                 * (k + 1)) - 3000000 * CAST(n_blocks AS HUGEINT)
                 * (k + 1) AS BIGINT) AS chi2_ppm
    FROM fold
    """,
    ("X-statistics",),
)
def stat_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test (stats.friedman_test): within each nation
    (block), rank the five order priorities by their total revenue;
    a priority consistently ranked high across nations drives the
    statistic. Doubled midranks keep ties exact; complete blocks are
    VALIDATED (a missing cell would silently shift every rank)."""
    from etl_script_spark.operators import stats
    from etl_script_spark.plans.catalog import cents

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    cell = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_nationkey").alias("blk"),
            F.col("o_orderpriority").alias("trt"),
        )
        .agg(F.sum(cents(F.col("o_totalprice"))).alias("v"))
    )
    return stats.friedman_test(cell, "blk", "trt", "v")


@register(
    "stat_cohens_d",
    f"""
    WITH b AS (
      SELECT l_returnflag AS seg,
             CASE WHEN CAST(ROUND(l_discount * 100) AS BIGINT) >= 5
                  THEN 1 ELSE 0 END AS grp,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS x
      FROM lineitem
    ),
    per AS (
      SELECT seg, grp, CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS s,
             SUM(CAST(x AS HUGEINT) * x) AS q
      FROM b GROUP BY 1, 2
    ),
    ss AS (
      SELECT seg, grp, n, s,
             GREATEST(q * 1000000 - (abs(s) * abs(s) * 1000000) // n,
                      0) AS ss_micro
      FROM per
    ),
    j AS (
      SELECT o.seg, o.n AS n1, z.n AS n0,
             (CASE WHEN o.s < 0 THEN -((-(o.s) * 1000000) // o.n)
                   ELSE (o.s * 1000000) // o.n END)
             - (CASE WHEN z.s < 0 THEN -((-(z.s) * 1000000) // z.n)
                     ELSE (z.s * 1000000) // z.n END) AS dm,
             (o.ss_micro + z.ss_micro)
               // NULLIF(o.n + z.n - 2, 0) AS vp
      FROM ss o JOIN ss z ON o.seg = z.seg AND o.grp = 1 AND z.grp = 0
    ),
    rad AS (SELECT seg, n1, n0, dm, vp * 1000000 AS r FROM j)
    SELECT seg AS segment, CAST(n1 AS BIGINT) AS n1,
           CAST(n0 AS BIGINT) AS n0,
           CAST(CASE WHEN {_isqrt_sql('r')} IS NULL
                       OR {_isqrt_sql('r')} = 0 THEN NULL
                WHEN dm < 0 THEN -((abs(dm) * 1000000) // {_isqrt_sql('r')})
                ELSE (abs(dm) * 1000000) // {_isqrt_sql('r')} END
                AS BIGINT) AS d_ppm
    FROM rad
    """,
    ("X-statistics",),
)
def stat_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-return-flag Cohen's d (stats.cohens_d_groups): the
    standardized deep-discount-vs-not difference in line revenue —
    the effect-size companion to the significance tests (a tiny p
    with d = 0.02 is noise at scale). Exact sufficient stats, the
    overflow-safe square ladder, integer sqrt, ppm report."""
    from etl_script_spark.operators import stats
    from etl_script_spark.plans.catalog import cents

    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("seg"),
        (cents(F.col("l_discount")) >= 5).alias("grp"),
        cents(F.col("l_extendedprice")).alias("x"),
    )
    return stats.cohens_d_groups(li, "seg", "grp", "x")


@register(
    "stat_anova_oneway",
    """
    WITH gv AS (
      SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v,
             COUNT(*) AS c
      FROM lineitem GROUP BY 1, 2
    ),
    lo AS (SELECT MIN(v) AS lo FROM gv),
    z AS (
      SELECT g, c, CAST(v - lo AS HUGEINT) AS z FROM gv, lo
    ),
    pg AS (
      SELECT g, SUM(CAST(c AS HUGEINT)) AS n_g,
             SUM(c * z) AS sz, SUM(c * z * z) AS szz
      FROM z GROUP BY g
    ),
    fold AS (
      SELECT COUNT(*) AS n_groups, SUM(n_g) AS n,
             SUM((sz * sz * 1000000) // n_g) AS a_micro,
             SUM(sz) AS s, SUM(szz) AS q
      FROM pg
    )
    SELECT CAST(n AS BIGINT) AS n_total,
           CAST(n_groups AS BIGINT) AS n_groups,
           CAST(((a_micro - (s * s * 1000000) // n)
                  * (n - n_groups) * 1000)
                // NULLIF((q * 1000000 - a_micro) * (n_groups - 1), 0)
                AS BIGINT) AS f_milli
    FROM fold
    """,
    ("X-statistics",),
)
def stat_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic one-way ANOVA F on raw quantities across return-flag
    groups (stats.anova_oneway) — the LOCATION test completing the
    Levene/Brown-Forsythe variance battery over the same groups. F is
    shift-invariant, so both engines shift by the global minimum to
    keep the shared fold's sums non-negative; statistic unchanged."""
    from etl_script_spark.operators import stats

    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    )
    return stats.anova_oneway(li, "l_returnflag", "qty")


@register(
    "stat_two_proportion_z",
    f"""
    WITH b AS (
      SELECT (o_orderpriority LIKE '1-%') AS g,
             (o_orderstatus = 'F') AS s
      FROM orders
    ),
    agg AS (
      SELECT CAST(SUM(CASE WHEN g THEN 1 ELSE 0 END) AS HUGEINT) AS n1,
             CAST(SUM(CASE WHEN g AND s THEN 1 ELSE 0 END) AS HUGEINT) AS x1,
             CAST(SUM(CASE WHEN NOT g THEN 1 ELSE 0 END) AS HUGEINT) AS n2,
             CAST(SUM(CASE WHEN (NOT g) AND s THEN 1 ELSE 0 END)
                  AS HUGEINT) AS x2
      FROM b
    ),
    cur AS (
      SELECT *,
             (x1 * 1000000) // NULLIF(n1, 0) AS p1,
             (x2 * 1000000) // NULLIF(n2, 0) AS p2,
             ((x1 + x2) * 1000000) // NULLIF(n1 + n2, 0) AS pp
      FROM agg
    ),
    v AS (
      SELECT *,
             (pp * (1000000 - pp) * (n1 + n2)) // NULLIF(n1 * n2, 0)
               AS var_ppm2,
             (p1 - p2) * 1000 AS num
      FROM cur
    ),
    sd AS (SELECT *, {_isqrt_sql('var_ppm2')} AS sd_ppm FROM v)
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(x1 AS BIGINT) AS x1,
           CAST(n2 AS BIGINT) AS n2, CAST(x2 AS BIGINT) AS x2,
           CAST(p1 AS BIGINT) AS p1_ppm, CAST(p2 AS BIGINT) AS p2_ppm,
           CASE WHEN p1 IS NULL OR p2 IS NULL OR sd_ppm <= 0 THEN NULL
                WHEN num < 0 THEN CAST(-((-num) // sd_ppm) AS BIGINT)
                ELSE CAST(num // sd_ppm AS BIGINT) END AS z_milli
    FROM sd
    """,
    ("X-statistics",),
)
def stat_two_proportion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled two-proportion z-test (stats.two_proportion_z): does
    the fraction of fulfilled orders differ between urgent
    (priority 1-URGENT) and non-urgent orders — the binary-outcome
    A/B primitive next to welch_ttest. Exact ppm rates, DECIMAL
    variance product, isqrt ladder for the root, sign-split DIV."""
    from etl_script_spark.operators import stats

    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").startswith("1-").alias("urgent"),
        (F.col("o_orderstatus") == "F").alias("filled"),
    )
    return stats.two_proportion_z(o, "urgent", "filled")


@register(
    "stat_runs_test",
    f"""
    WITH b AS (
      SELECT user_id % 8 AS g, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    gv AS (SELECT g, v, COUNT(*) AS c FROM b GROUP BY 1, 2),
    tot AS (SELECT g, SUM(c) AS n_g FROM gv GROUP BY g),
    med AS (
      SELECT g, MIN(v) AS med FROM (
        SELECT gv.g, v,
               SUM(c) OVER (PARTITION BY gv.g ORDER BY v) AS cum, n_g
        FROM gv JOIN tot ON gv.g = tot.g
      ) WHERE cum >= (n_g + 1) // 2 GROUP BY g
    ),
    s AS (
      SELECT b.g, ts, event_id,
             CASE WHEN v > med THEN 1 ELSE 0 END AS sgn
      FROM b JOIN med ON b.g = med.g WHERE v <> med
    ),
    lagd AS (
      SELECT g, sgn,
             LAG(sgn) OVER (PARTITION BY g ORDER BY ts, event_id) AS prev
      FROM s
    ),
    runs AS (
      SELECT g, CAST(SUM(sgn) AS HUGEINT) AS a,
             CAST(SUM(1 - sgn) AS HUGEINT) AS bb,
             CAST(SUM(CASE WHEN prev IS NULL OR prev <> sgn
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
      FROM lagd GROUP BY g
    ),
    cur AS (
      SELECT *, a + bb AS n,
             1000 + (2000 * a * bb) // NULLIF(a + bb, 0) AS expected_milli,
             (2 * a * bb * (2 * a * bb - (a + bb)) * 1000000)
               // NULLIF((a + bb) * (a + bb) * ((a + bb) - 1), 0)
               AS var_micro,
             CAST(n_runs AS HUGEINT) * 1000000
               - (1000 + (2000 * a * bb) // NULLIF(a + bb, 0)) * 1000
               AS num
      FROM runs
    ),
    sd AS (SELECT *, {_isqrt_sql('var_micro')} AS sd_milli FROM cur)
    SELECT g AS "group", CAST(a AS BIGINT) AS n_above,
           CAST(bb AS BIGINT) AS n_below, n_runs,
           CAST(expected_milli AS BIGINT) AS expected_milli,
           CAST(var_micro AS BIGINT) AS var_micro,
           CASE WHEN var_micro IS NULL OR sd_milli <= 0 THEN NULL
                WHEN num < 0 THEN CAST(-((-num) // sd_milli) AS BIGINT)
                ELSE CAST(num // sd_milli AS BIGINT) END AS z_milli
    FROM sd
    """,
    ("X-statistics", "X-timeseries"),
)
def stat_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test per user-bucket event series
    (stats.runs_test_groups): are values above/below the bucket
    median randomly interleaved in time, or trending/oscillating —
    the residual-randomness drift check. Median off the value
    histogram, runs from one group-keyed ordered window, moments and
    z in exact integer milli/micro with the isqrt ladder."""
    from etl_script_spark.operators import stats

    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select(
        (F.col("user_id") % 8).alias("bucket"),
        F.struct(F.col("ts"), F.col("event_id")).alias("ord"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return stats.runs_test_groups(ev, "bucket", "ord", "cents")


@register(
    "stat_bh_fdr",
    """
    WITH p AS (
      SELECT p_partkey AS test,
             ('0x' || substr(md5('bh|' || CAST(p_partkey AS VARCHAR)),
                             1, 8))::BIGINT % 1000000 AS p_ppm
      FROM part
    ),
    ranked AS (
      SELECT test, p_ppm,
             CAST(ROW_NUMBER() OVER (ORDER BY p_ppm, test) AS BIGINT)
               AS rnk,
             COUNT(*) OVER () AS m
      FROM p
    ),
    adj AS (
      SELECT *,
             LEAST(MIN((CAST(p_ppm AS HUGEINT) * m) // rnk)
                     OVER (ORDER BY rnk DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW),
                   1000000) AS padj_ppm,
             CASE WHEN CAST(p_ppm AS HUGEINT) * m
                       <= CAST(rnk AS HUGEINT) * 50000
                  THEN rnk END AS hit
      FROM ranked
    ),
    k AS (SELECT MAX(hit) AS kmax FROM adj)
    SELECT test, p_ppm, rnk AS rank,
           CAST(padj_ppm AS BIGINT) AS padj_ppm,
           rnk <= COALESCE(kmax, 0) AS rejected
    FROM adj, k ORDER BY rank
    """,
    ("X-statistics",),
)
def stat_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR gate (stats.benjamini_hochberg) over a
    deterministic per-part p-value table (md5-derived ppm — the
    bootstrap entry's cross-engine hash idiom): step-up rejection at
    α=0.05 plus the suffix-min adjusted p. The correction every
    per-segment statistic battery needs before shipping
    'discoveries'; windows run over the TEST table, never raw
    facts."""
    from etl_script_spark.operators import stats

    p = t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("test"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("bh|"),
                            F.col("p_partkey").cast("string"),
                        )
                    ),
                    1, 8,
                ),
                16, 10,
            ).cast("long") % 1000000
        ).alias("p_ppm"),
    )
    return stats.benjamini_hochberg(p, "test", "p_ppm", alpha_ppm=50000)


@register(
    "surv_kaplan_meier",
    """
    WITH RECURSIVE subj AS (
      SELECT user_id % 3 AS g,
             CAST(date_diff('day', CAST(MIN(ts) AS DATE),
                            CAST(MAX(ts) AS DATE)) AS BIGINT) AS t,
             (COUNT(*) % 2 = 1) AS e
      FROM events GROUP BY user_id
    ),
    per_t AS (
      SELECT g, t,
             CAST(SUM(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS d,
             CAST(SUM(CASE WHEN e THEN 0 ELSE 1 END) AS BIGINT) AS c
      FROM subj GROUP BY g, t
    ),
    h AS (
      SELECT g, t, d, c,
             SUM(d + c) OVER (PARTITION BY g ORDER BY t DESC) AS n,
             ROW_NUMBER() OVER (PARTITION BY g ORDER BY t) AS rn
      FROM per_t
    ),
    r AS (
      SELECT g, t, rn, n, d, c,
             CAST((1000000 * (n - d)) // n AS BIGINT) AS s
      FROM h WHERE rn = 1
      UNION ALL
      SELECT h.g, h.t, h.rn, h.n, h.d, h.c,
             CAST((r.s * (h.n - h.d)) // h.n AS BIGINT)
      FROM r JOIN h ON h.g = r.g AND h.rn = r.rn + 1
    )
    SELECT g AS stratum, t, CAST(n AS BIGINT) AS at_risk,
           d AS events, c AS censored, s AS surv_ppm
    FROM r
    """,
    ("X-statistics", "X-survival"),
)
def surv_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curves (survival.kaplan_meier_curve)
    over per-user observation spans: subject = user, time = days
    between first and last event, 'event' = odd event count (a
    deterministic stand-in for churn-vs-censored), stratified into 3
    cohorts. Risk sets via a suffix sum over the bounded per-time
    histogram; the survival product folds each stratum in one
    ordered-array pass with exact ppm truncating steps; the oracle
    replays the identical recurrence as a recursive CTE — the
    holt_linear twin for survival."""
    from etl_script_spark.operators import survival

    ev = t(spark, sf_dir, "events")
    subj = ev.groupBy("user_id").agg(
        F.datediff(
            F.to_date(F.max("ts")), F.to_date(F.min("ts"))
        ).cast("long").alias("t"),
        (F.count(F.lit(1)) % 2 == 1).alias("e"),
    ).select(
        (F.col("user_id") % 3).alias("cohort"), "t", "e"
    )
    return survival.kaplan_meier_curve(subj, "cohort", "t", "e")


@register(
    "surv_log_rank",
    """
    WITH subj AS (
      SELECT user_id % 2 AS g,
             CAST(date_diff('day', CAST(MIN(ts) AS DATE),
                            CAST(MAX(ts) AS DATE)) AS BIGINT) AS t,
             (COUNT(*) % 2 = 1) AS e
      FROM events GROUP BY user_id
    ),
    per_gt AS (
      SELECT g, t, SUM(CASE WHEN e THEN 1 ELSE 0 END) AS d,
             COUNT(*) AS m
      FROM subj GROUP BY g, t
    ),
    grid AS (
      SELECT t, g FROM (SELECT DISTINCT t FROM per_gt)
      CROSS JOIN (SELECT DISTINCT g FROM per_gt)
    ),
    filled AS (
      SELECT grid.g, grid.t, COALESCE(d, 0) AS d, COALESCE(m, 0) AS m
      FROM grid LEFT JOIN per_gt
        ON grid.g = per_gt.g AND grid.t = per_gt.t
    ),
    h AS (
      SELECT g, t, d,
             SUM(m) OVER (PARTITION BY g ORDER BY t DESC) AS n_g
      FROM filled
    ),
    per_t AS (
      SELECT t,
             CAST(SUM(CASE WHEN g = 0 THEN n_g END) AS HUGEINT) AS n1t,
             CAST(SUM(CASE WHEN g = 1 THEN n_g END) AS HUGEINT) AS n2t,
             CAST(SUM(CASE WHEN g = 0 THEN d ELSE 0 END) AS HUGEINT)
               AS d1t,
             CAST(SUM(d) AS HUGEINT) AS dt
      FROM h GROUP BY t
    ),
    folded AS (
      SELECT CAST(SUM(d1t) AS BIGINT) AS o1,
             CAST(SUM((n1t * dt * 1000000) // (n1t + n2t)) AS BIGINT)
               AS e1_ppm,
             CAST(SUM((n1t * n2t * dt * ((n1t + n2t) - dt) * 1000000)
                      // NULLIF((n1t + n2t) * (n1t + n2t)
                                * ((n1t + n2t) - 1), 0)) AS BIGINT)
               AS v_micro
      FROM per_t WHERE dt > 0
    ),
    sizes AS (
      SELECT CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2
      FROM subj
    ),
    cur AS (
      SELECT n1, n2, o1, e1_ppm, v_micro,
             CAST(o1 AS HUGEINT) * 1000000 - e1_ppm AS num,
             CAST(FLOOR(SQRT(CAST(v_micro AS DOUBLE))) AS HUGEINT) AS s0
      FROM sizes, folded
    ),
    sd AS (
      SELECT *, (CASE WHEN (s0+2)*(s0+2) <= v_micro THEN s0+2
                      WHEN (s0+1)*(s0+1) <= v_micro THEN s0+1
                      WHEN s0*s0 <= v_micro THEN s0
                      WHEN (s0-1)*(s0-1) <= v_micro THEN s0-1
                      ELSE s0-2 END) AS sd_milli
      FROM cur
    )
    SELECT n1, n2, o1, e1_ppm, v_micro,
           CASE WHEN v_micro IS NULL OR sd_milli <= 0 THEN NULL
                WHEN num < 0 THEN CAST(-((-num) // sd_milli) AS BIGINT)
                ELSE CAST(num // sd_milli AS BIGINT) END AS z_milli
    FROM sd
    """,
    ("X-statistics", "X-survival"),
)
def surv_log_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-group log-rank test (survival.log_rank_test) between the
    even/odd user cohorts of the surv_kaplan_meier subject table —
    does cohort 0's survival differ from cohort 1's? O/E/V fold from
    the same bounded per-time histograms as the KM curve; z through
    the exact isqrt ladder with the sign-split truncation."""
    from etl_script_spark.operators import survival

    ev = t(spark, sf_dir, "events")
    subj = ev.groupBy("user_id").agg(
        F.datediff(
            F.to_date(F.max("ts")), F.to_date(F.min("ts"))
        ).cast("long").alias("t"),
        (F.count(F.lit(1)) % 2 == 1).alias("e"),
    ).select((F.col("user_id") % 2).alias("cohort"), "t", "e")
    return survival.log_rank_test(subj, "cohort", "t", "e")


@register(
    "stat_calibration_bins",
    """
    WITH b AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) % 1000000 AS s,
             (o_orderstatus = 'F') AS y
      FROM orders WHERE o_totalprice IS NOT NULL
    ),
    binned AS (
      SELECT CAST(LEAST((s * 10) // 1000000, 9) AS BIGINT) AS bin, s, y
      FROM b
    )
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(s AS HUGEINT)) // COUNT(*) AS BIGINT)
             AS mean_score_ppm,
           CAST((CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS HUGEINT)
                 * 1000000) // COUNT(*) AS BIGINT) AS event_rate_ppm
    FROM binned GROUP BY bin ORDER BY bin
    """,
    ("X-statistics",),
)
def stat_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration/reliability table (stats.calibration_bins): bin a
    ppm 'score' (here a deterministic cents-derived stand-in) and
    compare mean predicted vs observed fulfilled-rate per bin — the
    probability-QA companion to stat_roc_auc's ranking check, run
    before thresholding a corpus on classifier scores. Exact floor
    divisions, one aggregation, no windows."""
    from etl_script_spark.operators import stats

    o = t(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    ).select(
        (F.round(F.col("o_totalprice") * 100).cast("long") % 1000000)
        .alias("score"),
        (F.col("o_orderstatus") == "F").alias("filled"),
    )
    return stats.calibration_bins(o, "score", "filled", n_bins=10)
