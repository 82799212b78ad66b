"""Sketch / approximate-analytics catalog queries.

Oracle strategy: approximate VALUES are engine-specific (DuckDB's HLL
is not Spark's HLL), so each query outputs the EXACT statistic plus a
boolean invariant that the sketch landed within its contracted bound
— the same invariant-oracle pattern the near-dup recall checks use.
The bloom-pruned join needs no such indirection: pruning + exact join
is exactly the plain join, so its oracle is the plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_script_spark.operators import sketches
from etl_script_spark.plans.catalog import register, t


@register(
    "sk_approx_distinct",
    """
    SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_distinct,
           TRUE AS within_bound
    FROM lineitem GROUP BY l_returnflag
    """,
    ("SK-distinct",),
)
def sk_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct orders per return flag next to the exact count;
    the oracle pins the exact side and asserts the 4σ error bound as
    an invariant. At 100 TB the exact column is dropped and the
    sketch is the answer — fixed-size state, map-side merged."""
    li = t(spark, sf_dir, "lineitem").select("l_returnflag", "l_orderkey")
    return sketches.approx_distinct_check(li, "l_returnflag", "l_orderkey", rsd=0.02)


@register(
    "sk_hll_mergeable",
    """
    SELECT COUNT(DISTINCT o_custkey) AS exact_distinct,
           TRUE AS merged_within_bound, TRUE AS whole_within_bound
    FROM orders
    """,
    ("SK-distinct",),
)
def sk_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of per-half HLL sketches carries the same 4σ error
    contract as one sketch over everything — the property that lets
    daily sketch rollups answer range queries without rescans. Both
    the merged and the whole-data estimate are checked against the
    exact count."""
    o = t(spark, sf_dir, "orders")
    return sketches.hll_merge_check(o, (F.col("o_orderkey") % 2).alias("h"), "o_custkey")


@register(
    "sk_heavy_hitters",
    """
    WITH keyed AS (
      SELECT CASE WHEN l_orderkey % 3 = 0 THEN 'HOT'
                  ELSE CAST(l_suppkey AS VARCHAR) END AS key
      FROM lineitem
    ),
    c AS (SELECT key, COUNT(*) AS cnt FROM keyed GROUP BY 1),
    tot AS (SELECT COUNT(*) AS total FROM keyed)
    SELECT key, cnt, CAST(cnt AS DOUBLE) / total AS share
    FROM c CROSS JOIN tot
    WHERE cnt >= total * 0.10
    """,
    ("SK-topk",),
)
def sk_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact frequent-item detection over a synthetically skewed key
    (every third line item shares one hot key — the one-company-owns-
    half-the-invoices pathology): keys with ≥10% row share. Output is
    pigeonhole-bounded (≤10 rows at 10% support) no matter the corpus
    size; the count table is the only large intermediate and it
    map-side combines."""
    li = t(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 3 == 0, F.lit("HOT"))
        .otherwise(F.col("l_suppkey").cast("string"))
        .alias("skey")
    )
    return sketches.heavy_hitters(li, "skey", 0.10)


@register(
    "sk_approx_quantiles",
    """
    SELECT l_returnflag, q_idx, TRUE AS within_bound
    FROM (SELECT DISTINCT l_returnflag FROM lineitem)
    CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS q_idx)
    """,
    ("SK-quantile",),
)
def sk_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx(25/50/75) of extended price per return flag,
    verified by rank position: the returned value's rank interval
    must sit within n/accuracy ranks of q·n — the sketch's contract.
    The oracle pins the (group × quantile) matrix and the invariant;
    the approximate values themselves stay engine-local."""
    li = t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    out = sketches.approx_quantiles_check(
        li, "l_returnflag", "l_extendedprice", [0.25, 0.5, 0.75], accuracy=10000
    )
    return out.select("l_returnflag", F.col("q_idx").cast("long").alias("q_idx"), "within_bound")


@register(
    "sk_bloom_prune_join",
    """
    SELECT o_orderkey, o_custkey, c_name
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_acctbal > 9000
    """,
    ("SK-bloom",),
)
def sk_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned exact join: a 2 KB bitmap built from the filtered
    customer side drops non-matching orders AT THE SCAN, before the
    join — the explicit form of runtime row-level filtering for the
    dim-too-big-to-broadcast regime. False positives are removed by
    the exact join that follows, so the result equals the plain join
    and the oracle is the plain join."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey", "c_name")
    )
    joined = sketches.bloom_pruned_join(o, c, "o_custkey", "c_custkey")
    return joined.select("o_orderkey", "o_custkey", "c_name")


@register(
    "sk_theta_set_ops",
    """
    WITH a AS (SELECT DISTINCT o_custkey AS v FROM orders
               WHERE o_orderdate < DATE '1995-01-01'),
         b AS (SELECT DISTINCT o_custkey AS v FROM orders
               WHERE o_orderdate >= DATE '1997-01-01')
    SELECT (SELECT COUNT(*) FROM (SELECT v FROM a UNION SELECT v FROM b))
             AS exact_union,
           (SELECT COUNT(*) FROM (SELECT v FROM a INTERSECT SELECT v FROM b))
             AS exact_intersection,
           (SELECT COUNT(*) FROM (SELECT v FROM a EXCEPT SELECT v FROM b))
             AS exact_a_only,
           TRUE AS union_within_bound,
           TRUE AS intersection_within_bound,
           TRUE AS diff_within_bound
    """,
    ("SK-theta",),
)
def sk_theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra over two customer cohorts (ordered
    before 1995 vs after 1997): |A∪B|, |A∩B|, |A∖B| answered from two
    fixed-size sketches, verified against the exact set operations at
    the 4σ bound. The rollup question 'how many customers did both'
    never rescans either cohort once the sketches exist."""
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    a = o.filter(F.col("o_orderdate") < F.lit("1995-01-01").cast("date"))
    b = o.filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
    return sketches.theta_set_ops_check(a, b, "o_custkey")


@register(
    "sk_approx_topk",
    """
    WITH keyed AS (
      SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'k0'
                  WHEN o_orderkey % 4 = 1 THEN 'k1'
                  WHEN o_orderkey % 8 = 3 THEN 'k2'
                  WHEN o_orderkey % 16 = 7 THEN 'k3'
                  ELSE 'k4_' || CAST(o_orderkey % 50 AS VARCHAR) END AS item
      FROM orders
    )
    SELECT item, COUNT(*) AS cnt FROM keyed
    GROUP BY item ORDER BY cnt DESC, item LIMIT 4
    """,
    ("SK-topk",),
)
def sk_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datasketches frequent-items top-4 over a geometric key
    distribution (50/25/12.5/6.25% + a thin tail — tie-free by
    construction). Cardinality sits far under the tracked-items
    budget, so the sketch is in exact mode and the oracle pins exact
    equality with the true top-4; at saturation the same code
    degrades to the sketch's epsilon guarantee."""
    k = F.col("o_orderkey")
    keyed = t(spark, sf_dir, "orders").select(
        F.when(k % 2 == 0, F.lit("k0"))
        .when(k % 4 == 1, F.lit("k1"))
        .when(k % 8 == 3, F.lit("k2"))
        .when(k % 16 == 7, F.lit("k3"))
        .otherwise(F.concat(F.lit("k4_"), (k % 50).cast("string")))
        .alias("item")
    )
    return (
        sketches.approx_topk_items(keyed, "item", 4)
        .orderBy(F.col("cnt").desc(), F.col("item"))
        .limit(4)
    )


@register(
    "sk_countmin_estimate",
    """
    WITH cells AS (
      SELECT r, ('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || '_'
                 || CAST(c_nationkey AS VARCHAR)), 1, 8))::BIGINT % 64
               AS c,
             c_nationkey
      FROM customer CROSS JOIN (SELECT unnest(range(4)) AS r)
    ),
    sketch AS (
      SELECT r, c, CAST(COUNT(*) AS BIGINT) AS n
      FROM cells GROUP BY r, c
    ),
    keys AS (
      SELECT CAST(c_nationkey AS VARCHAR) AS key,
             CAST(COUNT(*) AS BIGINT) AS true_n
      FROM customer GROUP BY 1
    ),
    probes AS (
      SELECT k.key, k.true_n, s.r,
             ('0x' || substr(md5('cms' || CAST(s.r AS VARCHAR) || '_'
                || k.key), 1, 8))::BIGINT % 64 AS c
      FROM keys k CROSS JOIN (SELECT DISTINCT r FROM sketch) s
    )
    SELECT p.key, p.true_n, CAST(MIN(s.n) AS BIGINT) AS cms_n,
           CAST(MIN(s.n) - p.true_n AS BIGINT) AS overcount
    FROM probes p JOIN sketch s ON p.r = s.r AND p.c = s.c
    GROUP BY p.key, p.true_n
    """,
    ("sketches",),
)
def sk_countmin_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch build + probe over customer nation keys
    (sketches.countmin_estimates): depth-4 x width-64 md5-bucketed
    counters, estimate = min over rows, reported next to the true
    count so the epsilon-delta overcount bound is visible in the
    output. The sketch table is CONSTANT size — the entire point at
    100 TB — and every bucket decision replays exactly on both
    engines."""
    from etl_script_spark.operators import sketches as sk

    c = t(spark, sf_dir, "customer")
    return sk.countmin_estimates(c, "c_nationkey", depth=4, width=64)


@register(
    "sk_kmv_jaccard",
    """
    WITH ha AS (
      SELECT DISTINCT ('0x' || substr(md5('kmv' || '|' || w), 1, 15))::BIGINT
               AS h
      FROM (SELECT unnest(list_filter(
                     string_split_regex(lower(text), '[^a-z0-9]+'),
                     w -> w != '')) AS w
            FROM documents WHERE doc_id % 2 = 0)
    ),
    hb AS (
      SELECT DISTINCT ('0x' || substr(md5('kmv' || '|' || w), 1, 15))::BIGINT
               AS h
      FROM (SELECT unnest(list_filter(
                     string_split_regex(lower(text), '[^a-z0-9]+'),
                     w -> w != '')) AS w
            FROM documents WHERE doc_id % 2 = 1)
    ),
    ska AS (SELECT h, 1 AS ina FROM ha ORDER BY h LIMIT 256),
    skb AS (SELECT h, 1 AS inb FROM hb ORDER BY h LIMIT 256),
    merged AS (
      SELECT COALESCE(ska.h, skb.h) AS h,
             COALESCE(ina, 0) AS ina, COALESCE(inb, 0) AS inb
      FROM ska FULL JOIN skb ON ska.h = skb.h
      ORDER BY 1 LIMIT 256
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
             CAST(SUM(ina * inb) AS BIGINT) AS inter_cnt,
             CAST(MAX(h) AS BIGINT) AS hk
      FROM merged
    )
    SELECT k_used, inter_cnt,
           CAST((CAST(inter_cnt AS HUGEINT) * 1000000000) // k_used
                AS BIGINT) AS jaccard_ppb,
           CASE WHEN k_used < 256 THEN k_used
                ELSE CAST(((CAST(k_used AS HUGEINT) - 1)
                           * 1152921504606846976) // hk AS BIGINT)
           END AS union_est
    FROM agg
    """,
    ("X-sketches",),
)
def sk_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-similarity between the vocabularies of the even- and
    odd-doc_id halves of the corpus (sketches.kmv_jaccard): two
    256-row k-minimum-values sketches, merged by the minima property
    kmv(A∪B) = k-smallest of kmv(A)∪kmv(B); Jaccard = fraction of
    union-sketch members in both sides (Beyer SIGMOD'07), plus the KMV
    union-cardinality estimate. Each side costs one distinct + a
    TakeOrdered; the estimate itself touches ≤512 rows — the
    corpus-overlap readout that never joins the corpora."""
    d = t(spark, sf_dir, "documents")

    def half(parity: int) -> DataFrame:
        return (
            d.filter(F.col("doc_id") % 2 == parity)
            .select(
                F.explode(
                    F.split(F.lower(F.col("text")), "[^a-z0-9]+")
                ).alias("w")
            )
            .filter(F.col("w") != "")
        )

    return sketches.kmv_jaccard(
        half(0), "w", half(1), "w", k=256, seed="kmv"
    )
