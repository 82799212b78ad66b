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
