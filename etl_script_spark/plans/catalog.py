"""Declared-query catalog (the correctness surface).

Each entry pairs a PySpark DataFrame query with the ANSI-SQL string a
DuckDB oracle runs on the same parquet tables. The driver compares
row-count + schema + order-insensitive value hash, with columns sorted
by NAME — so every computed column is aliased identically on both
sides.

Float determinism policy: any aggregate over doubles is computed in
DECIMAL (exact, order-independent) and cast to double at the end, on
BOTH sides — summation order then cannot flip low bits between Spark
and DuckDB. Raw double columns pass through untouched (same parquet
bits on both sides). Same-shaped scalar arithmetic (x*y, x/y) is
bitwise-identical IEEE 754 on both engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_script_spark.operators import dedup as dedup_ops
from etl_script_spark.operators import merge as merge_ops

DEC = "decimal(18,6)"  # exact intermediate for double aggregation
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a driver table. ``events.parquet`` stores TIMESTAMP(NANOS),
    which Spark's parquet reader rejects — read the raw int64 via the
    legacy nanosAsLong conf and rebuild a microsecond TIMESTAMP_NTZ
    (lossless here: the generator writes microsecond-resolution data).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def dsum(c: F.Column) -> F.Column:
    """Order-independent sum of a double column (exact decimal)."""
    return F.sum(c.cast(DEC)).cast("double")


def cents(c: F.Column, dp: int = 2) -> F.Column:
    """Fixed-point double → scaled BIGINT (round-half-up of the same
    IEEE double on both engines — deterministic for dp-decimal data).
    The fast-exact path: integer sums stay in whole-stage codegen
    primitives instead of Spark's BigDecimal aggregation buffers
    (~2.3× faster on the pricing rollup), exactly how columnar engines
    run decimal internally."""
    return F.round(c * (10**dp)).cast("long")


def csum(c: F.Column, dp: int = 2) -> F.Column:
    """Exact scaled-integer sum of a dp-decimal double, as double."""
    return F.sum(cents(c, dp)).cast("double") / (10**dp)


def davg(c: F.Column) -> F.Column:
    """Order-independent mean: decimal sum / count, divided as double."""
    return F.sum(c.cast(DEC)).cast("double") / F.count(F.lit(1))


@dataclass
class DeclaredQuery:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible, rows-only check
    survey_ids: tuple[str, ...] = field(default_factory=tuple)


CATALOG: dict[str, DeclaredQuery] = {}


def register(name: str, oracle: str | None, survey_ids: tuple[str, ...] = ()):
    def deco(fn):
        CATALOG[name] = DeclaredQuery(name, fn, oracle, survey_ids)
        return fn

    return deco


# =====================================================================
# Core relational / aggregation (A1-A4, F28, P12-P13)
# =====================================================================

# Submodule catalogs register themselves on import — see the imports
# at the bottom of this file.


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS DOUBLE)/100
               AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100
               AS sum_base_price,
           CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS DOUBLE)
               /10000 AS sum_disc_price,
           CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
                    * (100 + CAST(ROUND(l_tax*100) AS BIGINT))) AS DOUBLE)
               /1000000 AS sum_charge,
           CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS DOUBLE)/100
               /COUNT(*) AS avg_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100
               /COUNT(*) AS avg_price,
           CAST(SUM(CAST(ROUND(l_discount*100) AS BIGINT)) AS DOUBLE)/100
               /COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    ("A1", "A2", "F28", "P12"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship pricing-summary rollup (the reference's A1 grand-total
    reconciliation semantics generalized to TPC-H Q1 shape). All money
    math in exact scaled-integer (2-decimal data → int64 cents; the
    products stay far below 2^63), so every sum is a codegen'd
    primitive-long aggregate — order-independent AND fast. One shuffle
    on the two grouping keys; partial aggregation map-side."""
    l = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
    )
    qty = cents(F.col("l_quantity"))
    price = cents(F.col("l_extendedprice"))
    disc = cents(F.col("l_discount"))
    tax = cents(F.col("l_tax"))
    disc_price = price * (100 - disc)          # scale 10^4
    charge = disc_price * (100 + tax)          # scale 10^6
    n = F.count(F.lit(1))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty).cast("double") / 100).alias("sum_qty"),
            (F.sum(price).cast("double") / 100).alias("sum_base_price"),
            (F.sum(disc_price).cast("double") / 10000).alias("sum_disc_price"),
            (F.sum(charge).cast("double") / 1000000).alias("sum_charge"),
            (F.sum(qty).cast("double") / 100 / n).alias("avg_qty"),
            (F.sum(price).cast("double") / 100 / n).alias("avg_price"),
            (F.sum(disc).cast("double") / 100 / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(ROUND(l.l_discount*100) AS BIGINT))) AS DOUBLE)
               /10000 AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(ROUND(l.l_discount*100) AS BIGINT))) DESC,
             l.l_orderkey
    LIMIT 10
    """,
    ("J8", "O1", "O3"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join + group + deterministic top-k (revenue ranked in
    exact decimal so the LIMIT row set is stable across engines)."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    l = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    disc_price = cents(F.col("l_extendedprice")) * (
        100 - cents(F.col("l_discount"))
    )  # scale 10^4, exact int64
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(disc_price).alias("__rev"))
        .orderBy(F.col("__rev").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            (F.col("__rev").cast("double") / 10000).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


@register(
    "q5_local_supplier_volume",
    """
    SELECT n.n_name,
           CAST(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(ROUND(l.l_discount*100) AS BIGINT))) AS DOUBLE)
               /10000 AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    ("J1", "J8", "P12"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-way star join; region/nation/supplier dims broadcast, the
    two fact tables sort-merge on their keys — the 100 TB-safe shape."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    disc_price = cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg((F.sum(disc_price).cast("double") / 10000).alias("revenue"))
    )


@register(
    "point_lookup",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
    FROM orders WHERE o_orderkey = 4242
    """,
    ("P12", "P13"),
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12: the financial-statement point lookup (tax_id, year) shape —
    keyed filter + fixed projection; predicate pushes to parquet."""
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") == 4242)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    )


@register(
    "range_projection",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS DOUBLE) AS quantity,
           CAST(l_extendedprice AS DOUBLE) AS extendedprice,
           l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
    """,
    ("P12", "P13"),
)
def range_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12/P13: fiscal-range predicate + onlyCols float projection
    (PublicApiController.php:870-882)."""
    return (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-02-01 00:00:00").cast("timestamp_ntz"))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("double").alias("quantity"),
            F.col("l_extendedprice").cast("double").alias("extendedprice"),
            "l_shipdate",
        )
    )


@register(
    "keep_list_projection",
    """
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    """,
    ("P1", "P3", "P4"),
)
def keep_list_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: keep-list projection through the canonicalize operator —
    requested columns that don't exist are silently skipped (the
    reference's intersect-with-table-schema behavior)."""
    from etl_script_spark.operators.canonicalize import keep_columns

    return keep_columns(
        t(spark, sf_dir, "customer"),
        ["c_custkey", "c_name", "c_mktsegment", "does_not_exist"],
    )


# =====================================================================
# Joins: semi / anti / enrichment / merge families (J1-J8)
# =====================================================================

@register(
    "semi_join_exists",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    ("J2",),
)
def semi_join_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: parent-exists semi join (import gate)."""
    parents = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return merge_ops.exists_in(
        t(spark, sf_dir, "customer").select("c_custkey", "c_name"),
        parents,
        {"c_custkey": "o_custkey"},
    )


@register(
    "anti_join_missing",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    ("J2", "J7"),
)
def anti_join_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 companion / J7: rows with no parent (the skip report)."""
    return merge_ops.missing_parent(
        t(spark, sf_dir, "customer").select("c_custkey", "c_name"),
        t(spark, sf_dir, "orders"),
        {"c_custkey": "o_custkey"},
    )


@register(
    "upsert_keyed",
    """
    WITH target AS (
      SELECT o_custkey AS custkey,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100 AS total
      FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY o_custkey
    ), source AS (
      SELECT o_custkey AS custkey,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100 AS total
      FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY o_custkey
    )
    SELECT COALESCE(s.custkey, t.custkey) AS custkey,
           COALESCE(s.total, t.total) AS total
    FROM target t FULL OUTER JOIN source s ON t.custkey = s.custkey
    """,
    ("J6",),
)
def upsert_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: keyed updateOrCreate — new-period rows overwrite matching
    keys, unmatched old rows survive (MERGE semantics on vanilla
    DataFrames via the merge operator)."""
    o = t(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    target = (
        o.filter(F.col("o_orderdate") < cut)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(csum(F.col("o_totalprice")).alias("total"))
    )
    source = (
        o.filter(F.col("o_orderdate") >= cut)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(csum(F.col("o_totalprice")).alias("total"))
    )
    return merge_ops.upsert(target, source, ["custkey"])


@register(
    "replace_children",
    """
    WITH target AS (
      SELECT o_custkey AS parent, o_orderkey AS child, o_totalprice AS amount
      FROM orders WHERE o_orderstatus = 'F'
    ), source AS (
      SELECT o_custkey AS parent, o_orderkey AS child, o_totalprice AS amount
      FROM orders WHERE o_orderstatus = 'O' AND o_custkey % 10 = 0
    )
    SELECT * FROM target t
    WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.parent = t.parent)
    UNION ALL
    SELECT * FROM source
    """,
    ("J3",),
)
def replace_children(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: replace-children sync — all children of parents present in
    the payload are dropped and re-inserted from the payload."""
    o = t(spark, sf_dir, "orders")
    target = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("parent"),
        F.col("o_orderkey").alias("child"),
        F.col("o_totalprice").alias("amount"),
    )
    source = o.filter(
        (F.col("o_orderstatus") == "O") & (F.col("o_custkey") % 10 == 0)
    ).select(
        F.col("o_custkey").alias("parent"),
        F.col("o_orderkey").alias("child"),
        F.col("o_totalprice").alias("amount"),
    )
    return merge_ops.replace_children(target, source, "parent")


@register(
    "diff_sync_scoped",
    """
    WITH target AS (
      SELECT o_custkey AS scope, YEAR(o_orderdate) AS yr,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100 AS total
      FROM orders GROUP BY o_custkey, YEAR(o_orderdate)
    ), source AS (
      SELECT o_custkey AS scope, YEAR(o_orderdate) AS yr,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100 AS total
      FROM orders
      WHERE o_custkey % 7 = 0 AND YEAR(o_orderdate) >= 1997
      GROUP BY o_custkey, YEAR(o_orderdate)
    )
    SELECT * FROM target t
    WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.scope = t.scope)
    UNION ALL
    SELECT * FROM source
    """,
    ("J4", "J5"),
)
def diff_sync_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/J5: scoped diff-sync — for companies present in the payload,
    the payload's (scope, year) rows become the full truth (years not
    re-sent are deleted); untouched companies keep all rows."""
    o = t(spark, sf_dir, "orders")
    yearly = o.groupBy(
        F.col("o_custkey").alias("scope"), F.year("o_orderdate").alias("yr")
    ).agg(csum(F.col("o_totalprice")).alias("total"))
    source = (
        o.filter((F.col("o_custkey") % 7 == 0) & (F.year("o_orderdate") >= 1997))
        .groupBy(F.col("o_custkey").alias("scope"), F.year("o_orderdate").alias("yr"))
        .agg(csum(F.col("o_totalprice")).alias("total"))
    )
    return merge_ops.diff_sync_scoped(yearly, source, "scope", ["scope", "yr"])


@register(
    "insert_dedup_new_rows",
    """
    WITH target AS (
      SELECT DISTINCT l_orderkey FROM lineitem WHERE l_linenumber = 1
    )
    SELECT DISTINCT l.l_orderkey, l.l_linenumber FROM lineitem l
    WHERE l.l_linenumber = 2
      AND NOT EXISTS (SELECT 1 FROM target t WHERE t.l_orderkey = l.l_orderkey)
    """,
    ("J7",),
)
def insert_dedup_new_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: insert-only with duplicate-key skip — only rows whose key is
    absent from the target survive."""
    l = t(spark, sf_dir, "lineitem")
    target = l.filter(F.col("l_linenumber") == 1).select("l_orderkey").distinct()
    source = l.filter(F.col("l_linenumber") == 2).select("l_orderkey", "l_linenumber")
    new_rows, _ = merge_ops.insert_dedup(target, source, ["l_orderkey"])
    return new_rows


@register(
    "broadcast_enrich_fill",
    """
    SELECT s.s_suppkey, s.s_name,
           COALESCE(s.s_acctbal, n.n_nationkey * 1.0) AS s_acctbal
    FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
    ("J1",),
)
def broadcast_enrich_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: broadcast enrichment left join + fill-if-absent (coalesce
    per field) — the title-card merge shape."""
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    n = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"),
        (F.col("n_nationkey") * 1.0).alias("s_acctbal"),
    )
    out = merge_ops.enrich_left(s, n, "s_nationkey", ["s_acctbal"])
    return out.select("s_suppkey", "s_name", "s_acctbal")


# =====================================================================
# Dedup / sort / pagination (D1-D2, O1-O5)
# =====================================================================

@register(
    "dedup_composite_first",
    """
    SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber FROM (
      SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber,
             ROW_NUMBER() OVER (PARTITION BY l_partkey, l_suppkey
                                ORDER BY l_orderkey, l_linenumber) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
    ("D1", "D2"),
)
def dedup_composite_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1/D2: composite-key dedup keeping the FIRST row in stamped
    order (here (orderkey, linenumber) stands in for file order)."""
    l = t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.struct("l_orderkey", "l_linenumber").alias("__ord"),
    )
    out = dedup_ops.dedupe_ordered(l, ["l_partkey", "l_suppkey"], "__ord")
    return out.drop("__ord")


@register(
    "nulls_last_pagination",
    """
    SELECT c_custkey, c_name, c_acctbal FROM (
      SELECT c_custkey, c_name,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS c_acctbal
      FROM customer
    )
    ORDER BY c_acctbal ASC NULLS LAST, c_custkey
    LIMIT 50 OFFSET 50
    """,
    ("O2", "O3"),
)
def nulls_last_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2+O3: nulls-last multi-key sort + page 2 of 50 (the directors
    endpoint shape: director_no NULLS LAST, then id; paginate(50))."""
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.when(F.col("c_acctbal") < 0, F.lit(None).cast("double"))
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    )
    return (
        c.orderBy(F.col("c_acctbal").asc_nulls_last(), F.col("c_custkey"))
        .offset(50)
        .limit(50)
    )


@register(
    "topk_per_group",
    """
    SELECT c_mktsegment, c_custkey, c_acctbal FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 5
    """,
    ("O1", "O4"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-family: top-k per group via rank window (deterministic
    tiebreak on the unique key)."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        t(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_custkey", "c_acctbal")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 5)
        .drop("__rn")
    )


@register(
    "union_with_lineage",
    """
    SELECT o_orderkey, o_totalprice, 'open' AS source_sheet
    FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_orderkey, o_totalprice, 'final' AS source_sheet
    FROM orders WHERE o_orderstatus = 'F'
    """,
    ("S3",),
)
def union_with_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: multi-sheet union with a lineage column (unionByName +
    lit(sheet))."""
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_totalprice", F.lit("open").alias("source_sheet")
    )
    b = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_totalprice", F.lit("final").alias("source_sheet")
    )
    return a.unionByName(b)


# --- register submodule catalogs (import side effect) ---------------
from etl_script_spark.plans import (  # noqa: E402,F401
    catalog_classic,
    catalog_curation,
    catalog_events,
    catalog_functions,
    catalog_misc,
    catalog_pipelines,
    catalog_quality,
    catalog_reshape,
    catalog_sketches,
    catalog_sources,
    catalog_streaming,
    catalog_text,
)
