"""Classic warehouse queries (TPC-H shapes adapted to the driver's
column subset) — breadth of the analytics surface beyond the q1/q3/q5
headliners. Same float-determinism policy as the core catalog: money
math in scaled int64 / decimal, divided back to double only at the
edge, so every aggregate is bit-identical across engines.

Each docstring names the join strategy the plan should (and does)
pick — these are the shapes the 100 TB cluster runs all day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_script_spark.plans.catalog import DEC, cents, register, t

_TS = lambda s: F.lit(s).cast("timestamp_ntz")  # noqa: E731


@register(
    "q4_order_priority",
    """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o.o_orderpriority
    """,
    ("Q-classic", "J2"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 shape, commitdate predicate
    adapted to the available ship-lag form): EXISTS decorrelates to a
    left-semi join on l_orderkey; the date filter reaches the orders
    scan, and the semi join carries only the key column."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _TS("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _TS("1996-04-01 00:00:00"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                    * CAST(ROUND(l_discount*100) AS BIGINT)) AS DOUBLE)
             / 10000 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    ("Q-classic", "P12"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-revenue change (TPC-H Q6): pure scan-side query — all
    three predicates push to the parquet scan, the aggregation is one
    map-side-combined sum of scaled int64 products; zero joins, one
    1-row exchange. The canonical 'filters must reach the scan'
    query."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _TS("1997-01-01 00:00:00"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    rev = cents(F.col("l_extendedprice")) * cents(F.col("l_discount"))
    # cents x cents carries scale 10^4 — divide by 10^4, like every
    # sibling revenue query here (a 10^6 divisor under-reports 100x)
    return li.agg(
        (F.sum(rev).cast("double") / 10000).alias("revenue")
    )


@register(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(ROUND(l.l_discount*100) AS BIGINT)))
                AS DOUBLE) / 10000 AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(ROUND(l.l_discount*100) AS BIGINT))) DESC,
             c.c_custkey
    LIMIT 20
    """,
    ("Q-classic", "J8", "O1"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10): the one fact-fact join
    (orders×lineitem) shuffles on the order key; customer and nation
    broadcast; revenue ranked in exact scaled int64 so the top-20 row
    set is deterministic."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _TS("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _TS("1996-07-01 00:00:00"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(rev).alias("__rev"))
        .orderBy(F.col("__rev").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            (F.col("__rev").cast("double") / 10000).alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


@register(
    "q14_promo_revenue",
    """
    SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(ROUND(l.l_extendedprice*100) AS BIGINT)
                         * (100 - CAST(ROUND(l.l_discount*100) AS BIGINT))
                    ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(ROUND(l.l_discount*100) AS BIGINT)))
                AS DOUBLE) * 100 AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-06-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
    """,
    ("Q-classic", "J1"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion-effect ratio (TPC-H Q14): part broadcasts onto the
    date-filtered lineitem slice; both sums are exact scaled int64, so
    the single ratio division is the only float op."""
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1996-06-01 00:00:00"))
        & (F.col("l_shipdate") < _TS("1996-07-01 00:00:00"))
    )
    rev = cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
                * 100
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q18_large_orders",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    HAVING SUM(CAST(l.l_quantity AS BIGINT)) > 150
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
    ("Q-classic", "A3", "O1"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (TPC-H Q18): per-order quantity rollup
    with a HAVING threshold, then top-20 by price. Quantities are
    integral doubles in the data — summed as int64 so the HAVING
    cut is exact. One fact-fact shuffle; customer broadcasts."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
    )


@register(
    "q19_brand_quantity_revenue",
    """
    SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(ROUND(l.l_discount*100) AS BIGINT)))
                AS DOUBLE) / 10000 AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 21)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
    ("Q-classic", "J1"),
)
def q19_brand_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted-revenue by brand/size/quantity envelope (TPC-H Q19
    shape): the OR-of-ANDs predicate evaluates AFTER the broadcast
    join (it references both sides), but each disjunct's part-only
    conjuncts could be pre-OR'd onto the part scan by hand if the
    brand set were selective — here the revenue sum is the point:
    exact scaled int64 under a multi-disjunct filter."""
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & q.between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & q.between(20, 40))
    )
    rev = cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg((F.sum(rev).cast("double") / 10000).alias("revenue"))
    )


@register(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS r
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(rev.r AS DOUBLE) / 10000 AS total_revenue
    FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey
    WHERE rev.r = (SELECT MAX(r) FROM rev)
    ORDER BY s.s_suppkey
    """,
    ("Q-classic", "J1", "O1"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier by quarterly revenue (TPC-H Q15): the revenue CTE
    aggregates once and is reused for both the max and the equality
    filter (max as a 1-row broadcast crossJoin — no re-scan,
    deterministic under revenue ties in exact int64)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _TS("1996-04-01 00:00:00"))
    )
    rev_expr = cents(F.col("l_extendedprice")) * (
        100 - cents(F.col("l_discount"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(rev_expr).alias("r"))
    mx = rev.agg(F.max("r").alias("mr"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("r") == F.col("mr"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .orderBy("s_suppkey")
        .select(
            "s_suppkey",
            "s_name",
            (F.col("r").cast("double") / 10000).alias("total_revenue"),
        )
    )


@register(
    "q22_dormant_customers",
    """
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS n_custs,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
    FROM customer c CROSS JOIN avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_mktsegment
    """,
    ("Q-classic", "J2"),
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dormant high-balance customers (TPC-H Q22 shape): the global
    average is a 1-row broadcast, NOT EXISTS decorrelates to a
    left-anti join carrying only the custkey column. avg over
    doubles stays a double on both engines (single global mean of
    the same parquet bits — deterministic); the SUM follows the
    decimal policy."""
    c = t(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("a")
    )
    o = t(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("total_bal"),
        )
    )
