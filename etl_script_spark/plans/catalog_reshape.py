"""Declared queries for reshape (R1-R5), row filters (P5-P11),
aggregation shapes (A3-A5), and source-order semantics (O5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_script_spark.operators import reshape, rowfilters
from etl_script_spark.plans.catalog import DEC, register, t


@register(
    "r1_unpivot_measures",
    """
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
           l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    """,
    ("R1",),
)
def r1_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1: wide→long unpivot via the native unpivot (zero-shuffle
    narrow op)."""
    l = t(spark, sf_dir, "lineitem")
    return l.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "value",
    ).withColumn(
        "measure", F.regexp_replace("measure", "^l_", "")
    )


@register(
    "r1_unpivot_year_pairs",
    """
    WITH wide AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                  FILTER (WHERE YEAR(o_orderdate) = 1996) AS DOUBLE) AS y1996,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                  FILTER (WHERE YEAR(o_orderdate) = 1997) AS DOUBLE) AS y1997,
             CAST(COUNT(*) FILTER (WHERE YEAR(o_orderdate) = 1996) AS DOUBLE) AS p1996,
             CAST(COUNT(*) FILTER (WHERE YEAR(o_orderdate) = 1997) AS DOUBLE) AS p1997
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, '1996' AS year, y1996 AS amount, p1996 AS pct_change FROM wide
    UNION ALL
    SELECT o_custkey, '1997', y1997, p1997 FROM wide
    """,
    ("R1",),
)
def r1_unpivot_year_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 paired variant: (year, amount) with a paired companion column
    per year — the DBD balance-sheet %change shape."""
    o = t(spark, sf_dir, "orders")
    wide = o.groupBy("o_custkey").agg(
        F.sum(F.when(F.year("o_orderdate") == 1996, F.col("o_totalprice").cast(DEC)))
        .cast("double")
        .alias("y1996"),
        F.sum(F.when(F.year("o_orderdate") == 1997, F.col("o_totalprice").cast(DEC)))
        .cast("double")
        .alias("y1997"),
        F.count(F.when(F.year("o_orderdate") == 1996, 1)).cast("double").alias("p1996"),
        F.count(F.when(F.year("o_orderdate") == 1997, 1)).cast("double").alias("p1997"),
    )
    return reshape.unpivot_year_pairs(
        wide, ["o_custkey"], {"y1996": "p1996", "y1997": "p1997"}
    ).withColumn("year", F.regexp_replace("year", "^y", ""))


@register(
    "r2_pivot_event_types",
    """
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type='click') AS DOUBLE) AS click,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type='error') AS DOUBLE) AS error,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type='purchase') AS DOUBLE) AS purchase,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type='signup') AS DOUBLE) AS signup,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type='view') AS DOUBLE) AS view
    FROM events GROUP BY user_id
    """,
    ("R2",),
)
def r2_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2: long→wide pivot with an explicit value list (skips the
    distinct-values scan — the at-scale form)."""
    e = t(spark, sf_dir, "events")
    out = (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.sum(F.col("value").cast(DEC)))
    )
    return out.select(
        "user_id",
        *[F.col(c).cast("double").alias(c) for c in ["click", "error", "purchase", "signup", "view"]],
    )


@register(
    "r3_year_projection",
    """
    SELECT o_custkey, YEAR(o_orderdate) AS fiscal_year,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    WHERE YEAR(o_orderdate) BETWEEN 1996 AND 1998
    GROUP BY o_custkey, YEAR(o_orderdate)
    """,
    ("R3", "P12", "P13", "O4"),
)
def r3_year_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3 (flattened): per (key, year) projected financial response —
    the all-years endpoint before map-shaping (map shape itself is
    client-side; the long form is what scales)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.filter(F.year("o_orderdate").between(1996, 1998))
        .groupBy(
            "o_custkey", F.year("o_orderdate").cast("long").alias("fiscal_year")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "r4_positional_extract",
    """
    SELECT l_orderkey AS block,
           CASE l_linenumber WHEN 1 THEN 'first_line_qty' ELSE 'second_line_qty' END AS item,
           l_quantity AS value
    FROM lineitem WHERE l_linenumber IN (1, 2)
    """,
    ("R4",),
)
def r4_positional_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4: fixed positional extraction — ordinal N in a block maps to
    a declared header name."""
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber").isin(1, 2))
    l2 = l.select(
        F.col("l_orderkey").alias("block"),
        F.col("l_linenumber").alias("__ord"),
        F.col("l_quantity").alias("value"),
    )
    mapping = F.create_map(
        F.lit(1), F.lit("first_line_qty"), F.lit(2), F.lit("second_line_qty")
    )
    return l2.select(
        "block", mapping[F.col("__ord")].alias("item"), "value"
    ).filter(F.col("item").isNotNull())


@register(
    "r5_ffill",
    """
    SELECT event_id, user_id,
           LAST_VALUE(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM (SELECT event_id, user_id, ts,
                 CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v
          FROM events)
    """,
    ("R5", "O5"),
)
def r5_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5: merged-cell forward fill — last non-null over an ordered
    per-partition window."""
    e = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "view", F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.last("v", ignorenulls=True).over(w).alias("filled"),
    )


@register(
    "p5_header_row_filter",
    """
    WITH noisy AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS k, o_orderstatus AS status,
             o_orderpriority AS priority
      FROM orders
      UNION ALL
      SELECT 'k', 'status', 'priority' FROM range(3)
    )
    SELECT * FROM noisy WHERE NOT (status = 'status' AND priority = 'priority')
    """,
    ("P5",),
)
def p5_header_row_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: stray repeated header lines (values == column labels) are
    dropped; real rows survive."""
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    )
    headers = spark.range(3).select(
        F.lit("k").alias("k"), F.lit("status").alias("status"), F.lit("priority").alias("priority")
    )
    noisy = o.unionByName(headers)
    return rowfilters.drop_header_rows(
        noisy, {"k": "k", "status": "status", "priority": "priority"}, min_matches=2
    )


@register(
    "p6_total_row_filter",
    """
    WITH noisy AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS k, o_orderpriority AS label,
             o_totalprice AS amount
      FROM orders
      UNION ALL SELECT '999001', 'Grand Total', 1.0
      UNION ALL SELECT '999002', 'รวมทั้งสิ้น', 2.0
      UNION ALL SELECT '999003', 'Sub Total', 3.0
    )
    SELECT * FROM noisy
    WHERE NOT regexp_matches(lower(label),
        '(grand\\s*total|sub\\s*total|total|รวมทั้งสิ้น|รวมยอดทั้งหมด|ยอดรวม|รวม)')
    """,
    ("P6",),
)
def p6_total_row_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: Thai/EN total-row vocabulary filter."""
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("k"),
        F.col("o_orderpriority").alias("label"),
        F.col("o_totalprice").alias("amount"),
    )
    totals = spark.createDataFrame(
        [("999001", "Grand Total", 1.0), ("999002", "รวมทั้งสิ้น", 2.0), ("999003", "Sub Total", 3.0)],
        "k string, label string, amount double",
    )
    return rowfilters.drop_total_rows(o.unionByName(totals), ["label"])


@register(
    "p7_trailing_trim",
    """
    SELECT doc_id, n_chars FROM documents
    WHERE doc_id <= (SELECT MAX(doc_id) FROM documents WHERE n_chars >= 150)
    """,
    ("P7", "O5", "O6"),
)
def p7_trailing_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: trailing-junk trim — only the TRAILING run of short docs is
    removed; interior short docs survive (order = doc_id)."""
    d = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return rowfilters.trim_trailing(d, "doc_id", F.col("n_chars") < 150)


@register(
    "p9_validation_split",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN NOT (l_quantity > 0) THEN 'bad_quantity'
                WHEN NOT (l_discount <= 0.07) THEN 'discount_too_high'
                WHEN NOT (l_tax < 0.06) THEN 'tax_out_of_range'
           END AS fail_reason
    FROM lineitem
    WHERE NOT (l_quantity > 0) OR NOT (l_discount <= 0.07) OR NOT (l_tax < 0.06)
    """,
    ("P9", "A2"),
)
def p9_validation_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: rule validation with first-failing-reason taxonomy — the
    invalid side (the reference's --dump-fail report)."""
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
    _, invalid = rowfilters.validation_split(
        l,
        {
            "bad_quantity": F.col("l_quantity") > 0,
            "discount_too_high": F.col("l_discount") <= 0.07,
            "tax_out_of_range": F.col("l_tax") < 0.06,
        },
    )
    return invalid.select("l_orderkey", "l_linenumber", "fail_reason")


@register(
    "p9_validation_metrics",
    """
    SELECT COUNT(*) AS total,
           COUNT(*) FILTER (WHERE l_quantity > 0 AND l_discount <= 0.07
                            AND l_tax < 0.06) AS valid,
           COUNT(*) FILTER (WHERE NOT (l_quantity > 0)) AS bad_quantity,
           COUNT(*) FILTER (WHERE (l_quantity > 0)
                            AND NOT (l_discount <= 0.07)) AS discount_too_high,
           COUNT(*) FILTER (WHERE (l_quantity > 0) AND (l_discount <= 0.07)
                            AND NOT (l_tax < 0.06)) AS tax_out_of_range
    FROM lineitem
    """,
    ("A2", "P9"),
)
def p9_validation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: the import-metrics summary block as a single aggregate row
    (counts by first-failing reason)."""
    l = t(spark, sf_dir, "lineitem")
    q_ok = F.col("l_quantity") > 0
    d_ok = F.col("l_discount") <= 0.07
    t_ok = F.col("l_tax") < 0.06
    return l.agg(
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(q_ok & d_ok & t_ok, 1)).alias("valid"),
        F.count(F.when(~q_ok, 1)).alias("bad_quantity"),
        F.count(F.when(q_ok & ~d_ok, 1)).alias("discount_too_high"),
        F.count(F.when(q_ok & d_ok & ~t_ok, 1)).alias("tax_out_of_range"),
    )


@register(
    "p11_noise_label_filter",
    """
    SELECT doc_id, text FROM documents
    WHERE NOT regexp_matches(text, '^(key|batch)')
    """,
    ("P11",),
)
def p11_noise_label_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11: noise-label vocabulary filter (custom vocabulary)."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    return rowfilters.drop_noise_labels(d, "text", r"^(key|batch)")


@register(
    "p8_drop_all_null",
    """
    SELECT k, a, b FROM (
      SELECT CAST(o_orderkey AS VARCHAR) AS k,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderstatus END AS a,
             CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE o_orderpriority END AS b
      FROM orders
    ) WHERE NOT ((a IS NULL OR trim(a) = '') AND (b IS NULL OR trim(b) = ''))
    """,
    ("P8",),
)
def p8_drop_all_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: dropna(how='all') over the value columns (key excluded)."""
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("k"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None)).otherwise(F.col("o_orderstatus")).alias("a"),
        F.when(F.col("o_orderkey") % 2 == 0, F.lit(None)).otherwise(F.col("o_orderpriority")).alias("b"),
    )
    return rowfilters.drop_all_null_rows(o, ["a", "b"])


@register(
    "a3_count_and_page",
    """
    SELECT COUNT(*) AS total FROM customer WHERE c_acctbal > 0
    """,
    ("A3",),
)
def a3_count_and_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: the {"total": n} envelope count."""
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .agg(F.count(F.lit(1)).alias("total"))
    )


@register(
    "a4_array_size",
    """
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS num_tokens
    FROM documents
    """,
    ("A4",),
)
def a4_array_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: size(array) — num_director shape."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("num_tokens")
    )


@register(
    "a5_ordered_group_stats",
    """
    SELECT YEAR(o_orderdate) AS yr, COUNT(*) AS n_rows,
           arg_min(o_orderkey, o_orderkey) AS first_key,
           arg_max(o_orderkey, o_orderkey) AS last_key,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM orders GROUP BY YEAR(o_orderdate)
    """,
    ("A5", "O5"),
)
def a5_ordered_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/O5: group-by-year with source-order preservation evidenced by
    first/last ordinal per group (the collect_list-of-structs shape
    flattened to scalars for oracle comparison)."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy(F.year("o_orderdate").cast("long").alias("yr")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min_by("o_orderkey", "o_orderkey").alias("first_key"),
        F.max_by("o_orderkey", "o_orderkey").alias("last_key"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total"),
    )


@register(
    "a5_collect_by_year",
    """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
           to_json(list(struct_pack(
               o_orderkey := o_orderkey,
               o_totalprice := printf('%.2f', o_totalprice)
           ) ORDER BY o_orderkey)) AS rows_json
    FROM orders GROUP BY 1
    """,
    ("A5", "O5"),
)
def a5_collect_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: the actual year-keyed {"year": [rows…]} shape with
    source-order-preserving collect. The collected array<struct> is
    serialized with to_json so the output is a flat string column the
    harness can sort/hash (both engines emit the same compact JSON);
    prices are printf-formatted so float rendering is engine-neutral."""
    o = (
        t(spark, sf_dir, "orders")
        .withColumn("__ord", F.col("o_orderkey"))
        .withColumn("o_totalprice", F.format_string("%.2f", "o_totalprice"))
    )
    out = reshape.collect_by_year(
        o,
        F.year("o_orderdate").cast("long").alias("year"),
        "__ord",
        ["o_orderkey", "o_totalprice"],
    )
    return out.select("year", F.to_json("rows").alias("rows_json"))


@register(
    "a7_exact_percentiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS p50,
           quantile_cont(l_extendedprice, 0.9) AS p90,
           quantile_cont(l_extendedprice, 0.99) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
    ("A5", "analytics"),
)
def a7_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group — Spark's
    ``percentile`` matches DuckDB's ``quantile_cont`` bitwise. At
    100 TB switch to ``percentile_approx`` (t-digest sketch, map-side
    mergeable, no per-group sort buffer) when the consumer tolerates
    rank error; the exact form is the oracle-able contract.

    r10: the raw rows fold to a (flag, value) -> count histogram
    FIRST (a codegen'd hash aggregate that combines map-side), and
    ``percentile`` runs in its frequency form on the histogram. The
    direct form shipped every row into 3 ObjectHashAggregate
    counts-maps whose per-group merge serialized on ≤3 final tasks
    (sf0.1: 3.65 s at ~1.7 cores); the histogram shuffle carries one
    row per distinct (flag, value) and the percentile buffers merge
    pre-counted entries (3.65 → 2.55 s, values bit-identical —
    percentile's interpolation sees the same sorted (value, count)
    sequence either way)."""
    l = t(spark, sf_dir, "lineitem")
    h = l.groupBy("l_returnflag", "l_extendedprice").agg(
        F.count(F.lit(1)).alias("__c")
    )
    return h.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5, __c)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.9, __c)").alias("p90"),
        F.expr("percentile(l_extendedprice, 0.99, __c)").alias("p99"),
    )


@register(
    "a8_rollup_revenue",
    """
    SELECT o_orderpriority, o_orderstatus,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100
               AS revenue,
           COUNT(*) AS n_orders
    FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    ("analytics",),
)
def a8_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals in ONE pass: ROLLUP emits (priority, status),
    per-priority, and grand-total rows from a single shuffle — the
    replacement for the reference's repeated per-level re-aggregation.
    Exact integer cents keep every level bitwise-equal to the oracle."""
    from etl_script_spark.plans.catalog import cents

    o = t(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        (F.sum(cents(F.col("o_totalprice"))).cast("double") / 100).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )
