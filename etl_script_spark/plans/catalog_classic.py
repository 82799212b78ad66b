"""Classic warehouse queries (TPC-H shapes adapted to the driver's
column subset) — breadth of the analytics surface beyond the q1/q3/q5
headliners. Same float-determinism policy as the core catalog: money
math in scaled int64 / decimal, divided back to double only at the
edge, so every aggregate is bit-identical across engines.

Each docstring names the join strategy the plan should (and does)
pick — these are the shapes the 100 TB cluster runs all day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


# ---------------------------------------------------------------------------
# Round 5: the remaining TPC-H shapes (Q2,7,8,9,11,12,13,16,17,20,21),
# completing the 22-query classic suite. The driver's column subset has
# no partsupp / shipmode / commitdate / comment columns, so those
# predicates are adapted (supply relation := distinct (part, supplier)
# pairs observed in lineitem; ship-lag classes stand in for shipmode;
# priority stands in for the comment regex) — the JOIN/AGGREGATE SHAPES
# are the point, and each docstring names the physical strategy.
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    """
    WITH supply AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eur AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    cand AS (
      SELECT p.p_partkey, p.p_brand, e.s_name, e.s_acctbal, e.n_name,
             su.unit_cost
      FROM part p
      JOIN supply su ON su.l_partkey = p.p_partkey
      JOIN eur e ON e.s_suppkey = su.l_suppkey
      WHERE p.p_size = 15 AND p.p_type = 'LARGE'
    )
    SELECT p_partkey, p_brand, s_name, s_acctbal, n_name, unit_cost
    FROM cand c
    WHERE unit_cost = (SELECT MIN(unit_cost) FROM cand c2
                       WHERE c2.p_partkey = c.p_partkey)
    """,
    ("Q-classic", "J1"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (TPC-H Q2 shape; the supply relation is
    the distinct (part, supplier) pairs observed in lineitem, unit
    cost = min extendedprice/quantity). The correlated MIN subquery
    decorrelates to a per-part aggregate joined back on (partkey,
    cost) equality — both sides of that join derive from ONE
    aggregated candidate set, and supplier→nation→region is a
    broadcast dim chain onto the big supply aggregation. Cost is a
    single IEEE division of the same parquet bits on both engines,
    and MIN is order-independent, so the double equality is exact."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "unit_cost"
        )
    )
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    ).select("p_partkey", "p_brand")
    cand = supply.join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    ).join(F.broadcast(eur), F.col("l_suppkey") == F.col("s_suppkey"))
    mins = cand.groupBy(F.col("p_partkey").alias("__pk")).agg(
        F.min("unit_cost").alias("__mc")
    )
    return (
        cand.join(
            F.broadcast(mins),
            (F.col("p_partkey") == F.col("__pk"))
            & (F.col("unit_cost") == F.col("__mc")),
        )
        .select(
            "p_partkey", "p_brand", "s_name", "s_acctbal", "n_name",
            "unit_cost",
        )
    )


@register(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, yr,
           CAST(SUM(vol) AS DOUBLE) / 10000 AS revenue
    FROM (
      SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS yr,
             CAST(ROUND(l.l_extendedprice*100) AS BIGINT)
               * (100 - CAST(ROUND(l.l_discount*100) AS BIGINT)) AS vol
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation nc ON c.c_nationkey = nc.n_nationkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns ON s.s_nationkey = ns.n_nationkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
          OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
    ) GROUP BY supp_nation, cust_nation, yr
    """,
    ("Q-classic", "J1", "J8"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two nations (TPC-H Q7): the only
    fact-fact shuffle is lineitem⋈orders on orderkey; customer,
    supplier, and both nation legs broadcast onto it. The nation-pair
    disjunction is applied AFTER the broadcast joins (it needs both
    legs), but the shipdate range pushes to the lineitem scan."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _TS("1998-01-01 00:00:00"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
             "l_discount")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nc = n.select(
        F.col("n_nationkey").alias("__cnk"), F.col("n_name").alias("cust_nation")
    )
    ns = n.select(
        F.col("n_nationkey").alias("__snk"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("__cnk"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("__snk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    vol = cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))
    return (
        joined.select(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("yr"), vol.alias("vol"),
        )
        .groupBy("supp_nation", "cust_nation", "yr")
        .agg((F.sum("vol").cast("double") / 10000).alias("revenue"))
    )


@register(
    "q8_market_share",
    """
    SELECT yr,
           ROUND(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN vol ELSE 0 END)
                      AS DOUBLE) / CAST(SUM(vol) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS yr,
             ns.n_name AS nation,
             CAST(ROUND(l.l_extendedprice*100) AS BIGINT)
               * (100 - CAST(ROUND(l.l_discount*100) AS BIGINT)) AS vol
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation nc ON c.c_nationkey = nc.n_nationkey
      JOIN region r ON nc.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns ON s.s_nationkey = ns.n_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) GROUP BY yr
    """,
    ("Q-classic", "J1", "J8"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8): the conditional-aggregation
    ratio query. Part filter prunes lineitem FIRST (broadcast semi
    shape — p_type reaches the part scan), lineitem⋈orders is the one
    big shuffle, every dim after it broadcasts. Share = int64 volume
    sums divided once at the edge, rounded to 6dp on both engines
    (same two exact int64 sums → same double quotient)."""
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _TS("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _TS("1998-01-01 00:00:00"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    nc = n.join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("__cnk"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ns = n.select(
        F.col("n_nationkey").alias("__snk"), F.col("n_name").alias("nation")
    )
    joined = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("__cnk"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("__snk"))
    )
    vol = cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))
    agg = joined.select(
        F.year("o_orderdate").alias("yr"), F.col("nation"), vol.alias("vol")
    ).groupBy("yr").agg(
        F.sum(F.when(F.col("nation") == "NATION_3", F.col("vol")).otherwise(0)).alias("__tn"),
        F.sum("vol").alias("__tv"),
    )
    return agg.select(
        "yr",
        F.round(
            F.col("__tn").cast("double") / F.col("__tv").cast("double"), 6
        ).alias("mkt_share"),
    )


@register(
    "q9_product_profit",
    """
    SELECT nation, yr, CAST(SUM(amount) AS DOUBLE) / 10000 AS sum_profit
    FROM (
      SELECT ns.n_name AS nation,
             CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS yr,
             CAST(ROUND(l.l_extendedprice*100) AS BIGINT)
               * (100 - CAST(ROUND(l.l_discount*100) AS BIGINT))
             - CAST(ROUND(p.p_retailprice*100) AS BIGINT)
               * CAST(ROUND(l.l_quantity) AS BIGINT) * 10 AS amount
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation ns ON ns.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE p.p_name LIKE '%gear%'
    ) GROUP BY nation, yr
    """,
    ("Q-classic", "J1", "J8"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (TPC-H Q9; supply cost adapted to 10% of
    retail price — no partsupp table in the column subset). Profit
    stays in scale-10^4 int64 until the edge: revenue is cents×cents,
    cost is cents×units×10 (0.10 × 10^2 → the same 10^4 scale), so
    the subtraction is exact and order-independent. p_name LIKE
    prunes parts before the big joins; orders joins on the orderkey
    shuffle; part/supplier/nation broadcast."""
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%")).select(
        "p_partkey", "p_retailprice"
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice",
        "l_discount", "l_quantity",
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ns = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("__snk"), F.col("n_name").alias("nation")
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    joined = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("__snk"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    amount = cents(F.col("l_extendedprice")) * (
        100 - cents(F.col("l_discount"))
    ) - cents(F.col("p_retailprice")) * F.round(F.col("l_quantity")).cast(
        "long"
    ) * 10
    return (
        joined.select(
            "nation", F.year("o_orderdate").alias("yr"), amount.alias("amount")
        )
        .groupBy("nation", "yr")
        .agg((F.sum("amount").cast("double") / 10000).alias("sum_profit"))
    )


@register(
    "q11_important_stock",
    """
    WITH val AS (
      SELECT l.l_partkey,
             SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)) AS v
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_7'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey AS p_partkey, CAST(v AS DOUBLE) / 100 AS value
    FROM val CROSS JOIN (SELECT SUM(v) AS total FROM val) tt
    WHERE CAST(v AS HUGEINT) * 1000 > total
    """,
    ("Q-classic", "A1"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock identification (TPC-H Q11 shape; supply value
    per part := lineitem revenue from one nation's suppliers — no
    partsupp table). The group-share-of-global-total pattern: ONE
    aggregation feeds both the per-part values and the 1-row global
    total (broadcast crossJoin — no second scan), and the threshold
    compare is exact integer math (value·1000 > total in
    DECIMAL(38,0)/HUGEINT — cents·1000 at 100 TB revenue scale would
    sit near the int64 edge, so the multiply is widened, same as
    pagerank's contribution fix)."""
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    val = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(cents(F.col("l_extendedprice"))).alias("v"))
    )
    total = val.agg(F.sum("v").alias("total"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("v").cast("decimal(38,0)") * 1000 > F.col("total"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("v").cast("double") / 100).alias("value"),
        )
    )


@register(
    "q12_shipmode_priority",
    """
    SELECT lag_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (
      SELECT o.o_orderpriority,
             CASE WHEN l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
                  THEN 'FAST'
                  WHEN l.l_shipdate < o.o_orderdate + INTERVAL 90 DAY
                  THEN 'NORMAL'
                  ELSE 'SLOW' END AS lag_class
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    ) GROUP BY lag_class
    """,
    ("Q-classic", "J8"),
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping modes vs priority (TPC-H Q12 shape; ship-lag classes
    FAST/<30d, NORMAL/<90d, SLOW stand in for the absent l_shipmode).
    One orderkey shuffle join, shipdate range pushed to the lineitem
    scan, the priority pivot is two conditional counts in a single
    map-side-combined aggregate over 3 groups."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _TS("1997-01-01 00:00:00"))
    ).select("l_orderkey", "l_shipdate")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lag_class = (
        F.when(
            F.col("l_shipdate")
            < F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
            "FAST",
        )
        .when(
            F.col("l_shipdate")
            < F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
            "NORMAL",
        )
        .otherwise("SLOW")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(lag_class.alias("lag_class"), high.alias("__h"))
        .groupBy("lag_class")
        .agg(
            F.sum(F.when(F.col("__h"), 1).otherwise(0)).alias(
                "high_line_count"
            ),
            F.sum(F.when(~F.col("__h"), 1).otherwise(0)).alias(
                "low_line_count"
            ),
        )
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
    ("Q-classic", "A1"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13; the priority
    exclusion stands in for the absent o_comment regex). LEFT join
    keeps zero-order customers (the point of Q13 — COUNT(o_orderkey)
    counts non-null keys only), then the two-level aggregation:
    per-customer counts reuse the join's custkey partitioning (no
    second exchange), the histogram is a tiny final shuffle."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register(
    "q16_supplier_part_cnt",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#3' AND p.p_type <> 'MEDIUM'
      AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    ("Q-classic", "J2", "A1"),
)
def q16_supplier_part_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship (TPC-H Q16 shape; the supply
    relation comes from lineitem, and negative-balance suppliers
    stand in for the absent comment 'complaints' regex). The NOT IN
    decorrelates to a broadcast left-anti join on suppkey; the part
    filters broadcast-semi-prune lineitem; COUNT(DISTINCT) shuffles
    once on the (brand, type, size) group keys with the distinct
    expand combined map-side."""
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "MEDIUM")
        & (F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(
            F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_qty_revenue",
    """
    WITH pa AS (
      SELECT l_partkey,
             SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS sq,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)) AS DOUBLE)
             / 100 / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#12'
      AND CAST(ROUND(l.l_quantity) AS BIGINT) * pa.cnt * 5 < pa.sq
    """,
    ("Q-classic", "A1", "J8"),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17): the correlated
    AVG subquery decorrelates to a per-part aggregate rejoined on
    partkey. The threshold ``qty < 0.2·avg(qty)`` is evaluated as
    EXACT integers — ``qty·cnt·5 < sum(qty)`` — because a floating
    avg computed by two engines can land on opposite sides of the
    comparison for boundary rows and no oracle would catch it (the
    both-engines-drift blind spot). The brand filter prunes parts
    before both the rejoin and the aggregate (same per-part values
    either way); lineitem⋈pa shares the partkey shuffle."""
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12").select(
        "p_partkey"
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    pa = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.sum(F.round(F.col("l_quantity")).cast("long")).alias("sq"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li.join(pa, F.col("l_partkey") == F.col("__pk"))
        .filter(
            F.round(F.col("l_quantity")).cast("long") * F.col("cnt") * 5
            < F.col("sq")
        )
        .agg(
            (F.sum(cents(F.col("l_extendedprice"))).cast("double") / 100 / 7.0)
            .alias("avg_yearly")
        )
    )


@register(
    "q20_part_promotion",
    """
    WITH sp AS (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS q
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
    ),
    pq AS (SELECT l_partkey, SUM(q) AS tq FROM sp GROUP BY l_partkey)
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM sp
    JOIN pq ON pq.l_partkey = sp.l_partkey
    JOIN part p ON p.p_partkey = sp.l_partkey AND p.p_name LIKE 'small%'
    JOIN supplier s ON s.s_suppkey = sp.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
                 AND n.n_name = 'NATION_4'
    WHERE 2 * sp.q > pq.tq
    """,
    ("Q-classic", "J2"),
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential part promotion (TPC-H Q20 shape; availability :=
    the supplier's shipped quantity for the part in the window — no
    partsupp availqty). Dominant-supplier test ``2·q > total`` is
    exact int64. The per-(supp,part) and per-part aggregates share
    ONE partkey-partitioned shuffle (the second agg reuses the
    first's output partitioning); part name filter and the
    nation-filtered supplier dim broadcast onto it; DISTINCT
    collapses multi-part winners map-side."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _TS("1997-01-01 00:00:00"))
    ).select("l_suppkey", "l_partkey", "l_quantity")
    sp = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.round(F.col("l_quantity")).cast("long")).alias("q")
    )
    pq = sp.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.sum("q").alias("tq")
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    return (
        sp.join(pq, F.col("l_partkey") == F.col("__pk"))
        .filter(2 * F.col("q") > F.col("tq"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


@register(
    "q21_waiting_supplier",
    """
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
                 AND n.n_name = 'NATION_5'
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
    """,
    ("Q-classic", "J2"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape; 'late' :=
    shipped >60 days after order date, standing in for the absent
    receipt/commit dates). The EXISTS/NOT-EXISTS pair decorrelates to
    a left-semi then left-anti join, both on the orderkey shuffle
    with the supplier-inequality (and shipdate for the anti) as
    residual conditions — the canonical double-correlated-subquery
    plan. Status+lag filters run on the first orderkey join; the
    nation-filtered supplier dim broadcasts."""
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate")
    )
    l1, l2 = late.alias("l1"), li.alias("l2")
    with_other = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    l3 = li.alias("l3")
    sole_latest = with_other.alias("l1").join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey"))
        & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
        "left_anti",
    )
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    return (
        sole_latest.join(
            F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "sql_window_suite",
    """
    SELECT o_custkey, o_orderkey,
           CAST(o_orderdate AS VARCHAR) AS od,
           lag(o_orderkey) OVER w AS prev_order,
           lead(o_orderkey) OVER w AS next_order,
           CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cdist,
           first_value(o_orderkey) OVER w AS first_order,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    ("O1", "A1", "X-sql-surface"),
)
def sql_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic-window SQL surface in one declared query: lag /
    lead / row_number / ntile / percent_rank / cume_dist /
    first_value / running sum over each customer's order history,
    all sharing ONE window spec — and therefore ONE shuffle + ONE
    sort (the plan pin the suite exists for: Spark computes every
    frame-compatible function in a single Window node; a naive
    per-metric spelling would stack eight sorts). percent_rank and
    cume_dist are exact rationals of row counts, so the doubles
    replay bit-for-bit; the running money sum rides scaled-integer
    cents (the q1 fast-exact pattern)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("string").alias("od"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.row_number().over(w).alias("rn"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .over(wcum)
        .alias("run_cents"),
    )


@register(
    "sql_null_semantics",
    """
    WITH s AS (
      SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_orderkey % 5 END AS n
      FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(n) AS BIGINT) AS n_nonnull,
           CAST(COUNT(DISTINCT n) AS BIGINT) AS n_distinct_ignoring_null,
           CAST(SUM(CASE WHEN n IN (1, 2) THEN 1 ELSE 0 END) AS BIGINT)
             AS cnt_in,
           CAST(SUM(CASE WHEN n NOT IN (1, NULL) THEN 1 ELSE 0 END)
                AS BIGINT) AS cnt_not_in_null_list,
           CAST(SUM(CASE WHEN n = NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS cnt_eq_null,
           CAST(SUM(CASE WHEN n IS NOT DISTINCT FROM NULL THEN 1
                         ELSE 0 END) AS BIGINT) AS cnt_null_safe_eq,
           CAST(SUM(COALESCE(n, -1)) AS BIGINT) AS sum_coalesced,
           CAST(SUM(CASE WHEN NULLIF(n, 2) IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS cnt_nullif_nulled,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM
              (SELECT n FROM s GROUP BY n)) AS n_groups_with_null
    FROM s
    """,
    ("X-sql-surface",),
)
def sql_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three-valued-logic SQL surface in one audited row: NULL
    membership (IN hits, NOT IN against a list containing NULL is
    NEVER true), ``= NULL`` vs the null-safe equality operator,
    COALESCE folding, NULLIF, COUNT vs COUNT(col) vs
    COUNT(DISTINCT), and GROUP BY forming a NULL group. These are
    the semantics data-cleaning code silently depends on; the entry
    pins that both engines agree on every one of them."""
    o = t(spark, sf_dir, "orders")
    s = o.select(
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("o_orderkey") % 5)
        .alias("n")
    )
    groups = s.groupBy("n").count().agg(
        F.count(F.lit(1)).cast("long").alias("n_groups_with_null")
    )
    return (
        s.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count("n").cast("long").alias("n_nonnull"),
            F.countDistinct("n").cast("long")
            .alias("n_distinct_ignoring_null"),
            F.sum(F.expr("CASE WHEN n IN (1, 2) THEN 1 ELSE 0 END"))
            .cast("long").alias("cnt_in"),
            F.sum(F.expr(
                "CASE WHEN n NOT IN (1, NULL) THEN 1 ELSE 0 END"
            )).cast("long").alias("cnt_not_in_null_list"),
            F.sum(F.expr("CASE WHEN n = NULL THEN 1 ELSE 0 END"))
            .cast("long").alias("cnt_eq_null"),
            F.sum(F.expr("CASE WHEN n <=> NULL THEN 1 ELSE 0 END"))
            .cast("long").alias("cnt_null_safe_eq"),
            F.sum(F.coalesce(F.col("n"), F.lit(-1))).cast("long")
            .alias("sum_coalesced"),
            F.sum(F.expr(
                "CASE WHEN NULLIF(n, 2) IS NULL THEN 1 ELSE 0 END"
            )).cast("long").alias("cnt_nullif_nulled"),
        )
        .crossJoin(F.broadcast(groups))
    )


@register(
    "sql_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS sum_cents,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), ())
    """,
    ("X-sql-surface", "A1"),
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GROUPING SETS SQL surface: detail cells, per-flag
    subtotals, and the grand total from ONE fact scan (Spark's
    Expand node replays each row once per set — never three scans),
    with GROUPING() bits disambiguating a real NULL key from an
    aggregated-out one. Completes the rollup/cube family
    (a8_rollup_revenue, ev_value_cube) with the arbitrary-sets
    form; money rides the q1 cents fast-exact path."""
    li = t(spark, sf_dir, "lineitem")
    from etl_script_spark.plans.catalog import cents

    return (
        li.select(
            "l_returnflag",
            "l_linestatus",
            cents(F.col("l_extendedprice")).alias("__cents"),
        )
        .groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.sum("__cents").cast("long").alias("sum_cents"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.grouping("l_returnflag").cast("long").alias("g_rf"),
            F.grouping("l_linestatus").cast("long").alias("g_ls"),
        )
    )
