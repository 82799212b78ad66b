"""Sketch / approximate-analytics operators.

At 100 TB, exact global statistics (distinct counts, quantiles, top
frequencies) are shuffle-bound: the exact answer needs every distinct
value in one place. Sketches trade a bounded error for a fixed-size,
MERGEABLE summary — each partition builds its own few-KB state, and
the combine is associative, so the shuffle carries kilobytes instead
of the key universe. Every operator here pairs the approximate path
with an exact verifier so the driver's oracle can check the error
bound as a hard invariant (the approximate VALUE is not reproducible
across engines, the BOUND is).

None of these exist in the reference (its single-node pandas code can
afford exact everything at its scale); they are the scale-path
equivalents of its COUNT(DISTINCT)-style checks
(ImportDbdFinancial.php summary counts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct_check(
    df: DataFrame, group_col: str, value_col: str, rsd: float = 0.02
) -> DataFrame:
    """Per-group HyperLogLog++ distinct count next to the exact count,
    with a ``within_bound`` flag at 4× the requested relative standard
    deviation (≈4σ — a deterministic-pass margin; HLL++ error is
    a random variable, 4σ keeps the flag stable across seeds/scales).

    Shape: ONE aggregation — HLL registers merge map-side, the exact
    count-distinct inside the same groupBy is the verification cost
    and exists only for the invariant; production callers drop it and
    keep the sketch.
    """
    return df.groupBy(group_col).agg(
        F.countDistinct(value_col).alias("exact_distinct"),
        F.approx_count_distinct(value_col, rsd).alias("approx_distinct"),
    ).select(
        group_col,
        "exact_distinct",
        (
            F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
            <= F.greatest(
                F.lit(1.0), F.col("exact_distinct") * (4.0 * rsd)
            )
        ).alias("within_bound"),
    )


def hll_merge_check(
    df: DataFrame, split_col: Column, value_col: str
) -> DataFrame:
    """The mergeability property that makes sketches work at scale:
    sketch each half of the data independently, union the sketches,
    and the merged estimate carries the SAME error contract as one
    sketch over everything (union is over register states; the two
    estimates differ only by the union's register-width promotion, a
    few parts per thousand — not by data volume).

    This is the daily-partition rollup pattern: per-day sketches are
    stored (a few KB each) and any date range's distinct count is a
    union over them, never a rescan. Returns a single row
    (exact_distinct, merged_within_bound, whole_within_bound) with
    both estimates checked against the exact count at 4σ of the
    lgConfigK=12 error (1.04/√2¹²).
    """
    lg_k = 12
    bound = 4.0 * 1.04 / (2 ** (lg_k / 2.0))
    halves = (
        df.select(split_col.alias("half"), F.col(value_col).alias("v"))
        .groupBy("half")
        .agg(F.hll_sketch_agg("v", lg_k).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged"))
    )
    whole = df.select(
        F.hll_sketch_estimate(F.hll_sketch_agg(value_col, lg_k)).alias("whole"),
        F.countDistinct(value_col).alias("exact_distinct"),
    )
    ok = lambda c: (  # noqa: E731
        F.abs(c - F.col("exact_distinct"))
        <= F.greatest(F.lit(1.0), F.col("exact_distinct") * bound)
    )
    return whole.crossJoin(halves).select(
        "exact_distinct",
        ok(F.col("merged")).alias("merged_within_bound"),
        ok(F.col("whole")).alias("whole_within_bound"),
    )


def heavy_hitters(
    df: DataFrame, key_col: str, min_share: float
) -> DataFrame:
    """Exact frequent items: keys whose row share is ≥ ``min_share``.

    Two aggregations, both map-side combined; the grand total is a
    1-row broadcast. There are at most 1/min_share qualifying keys by
    pigeonhole, so the OUTPUT is bounded regardless of corpus size —
    the per-key count table is the only large intermediate, and it
    shuffles one (key, int64) pair per distinct key per mapper.
    Returns (key, cnt, share) ordered nowhere (callers sort).
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = df.agg(F.count(F.lit(1)).alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.col("cnt") / F.col("total"))
        .filter(F.col("cnt") >= F.col("total") * min_share)
        .select("key", "cnt", "share")
    )


def approx_quantiles_check(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: list[float],
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group ``percentile_approx`` with a RANK-error verification:
    the number of rows ≤ the approximate quantile must sit within
    ``n/accuracy`` ranks of ``q·n`` — the bound the KLL/GK sketch
    contracts for (SPARK percentile_approx accuracy semantics).

    The join back to count ranks is the verification cost; production
    callers keep only the sketch aggregation (single pass, fixed-size
    state per group).
    """
    q_arr = F.array(*[F.lit(q) for q in quantiles])
    approx = df.groupBy(group_col).agg(
        F.percentile_approx(value_col, q_arr, accuracy).alias("qs"),
        F.count(F.lit(1)).alias("n"),
    )
    exploded = approx.select(
        group_col,
        "n",
        F.posexplode("qs").alias("q_idx", "q_val"),
    )
    # ties make "the rank of the returned value" an interval
    # [count(<)+1, count(<=)]: the bound holds iff that interval
    # intersects [q·n − ε, q·n + ε]
    ranks = (
        df.select(F.col(group_col).alias("__g"), F.col(value_col).alias("__v"))
        .join(
            exploded,
            F.col("__g") == F.col(group_col),
            "inner",
        )
        .groupBy(group_col, "q_idx", "n")
        .agg(
            F.sum(F.when(F.col("__v") < F.col("q_val"), 1).otherwise(0)).alias(
                "rank_lo"
            ),
            F.sum(F.when(F.col("__v") <= F.col("q_val"), 1).otherwise(0)).alias(
                "rank_hi"
            ),
        )
    )
    q_of = F.element_at(F.array(*[F.lit(q) for q in quantiles]), F.col("q_idx") + 1)
    # 2×ε·n + 1: the sketch's ε = 1/accuracy rank contract, doubled
    # plus one rank of slack — observed errors sit exactly AT ε·n
    # (e.g. 2.0 ranks at n≈20k, accuracy 10⁴), and a bound that tight
    # flaps on rounding
    eps = 2.0 * F.col("n") / float(accuracy) + 1.0
    return ranks.select(
        group_col,
        F.col("q_idx"),
        (
            (F.col("rank_hi") >= q_of * F.col("n") - eps)
            & (F.col("rank_lo") + 1 <= q_of * F.col("n") + eps + 1)
        ).alias("within_bound"),
    )


# ---------------------------------------------------------------------
# Bloom-filter join pruning
# ---------------------------------------------------------------------

_BLOOM_SEEDS = (0x9E37, 0x85EB, 0xC2B2)


def _bloom_positions(key: Column, m_bits: int) -> list[tuple[Column, Column]]:
    """k (word_index, bit_mask) pairs for a key — xxhash64 with k fixed
    seeds, modulo the bitmap width."""
    out = []
    for seed in _BLOOM_SEEDS:
        h = F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(m_bits))
        word = (h / 64).cast("int")
        # call_function: the Python shiftleft wrapper only takes a
        # literal int shift amount
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (h % 64).cast("int")
        )
        out.append((word, mask))
    return out


def bloom_build(dim: DataFrame, key_col: str, m_bits: int = 1 << 14) -> list[int]:
    """Build a Bloom bitmap (``m_bits`` wide, k=3 hashes) from the dim
    side's keys. Returns the bitmap as ``m_bits/64`` int64 words.

    The build aggregates (word_index → OR of masks) distributed and
    collects only the bitmap — 2 KB for the default width — so the dim
    can be far larger than broadcast-join limits and the driver still
    only ever holds the sketch. This is the pre-shuffle prune for the
    case BETWEEN broadcast (dim fits in RAM) and full shuffle (nothing
    fits): ship 2 KB to every scan task, drop non-candidate rows
    before they reach the exchange.
    """
    pairs = []
    for word, mask in _bloom_positions(F.col(key_col), m_bits):
        pairs.append(F.struct(word.alias("w"), mask.alias("m")))
    words = (
        dim.select(F.explode(F.array(*pairs)).alias("p"))
        .groupBy(F.col("p.w").alias("w"))
        .agg(F.bit_or("p.m").alias("bits"))
        .collect()
    )
    bitmap = [0] * (m_bits // 64)
    for r in words:
        bitmap[r["w"]] = r["bits"]
    return bitmap


def bloom_might_contain(
    key: Column, bitmap: list[int], m_bits: int | None = None
) -> Column:
    """Membership predicate against a built bitmap: true iff ALL k bit
    positions are set (false positives possible at the designed rate,
    false negatives impossible — the pruned join stays exact as long
    as an exact join follows)."""
    m = m_bits or len(bitmap) * 64
    arr = F.array(*[F.lit(w).cast("long") for w in bitmap])
    cond = F.lit(True)
    for word, mask in _bloom_positions(key, m):
        hit = F.element_at(arr, word + 1).bitwiseAND(mask) != 0
        cond = cond & hit
    return cond


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 14,
) -> DataFrame:
    """Exact inner equi-join with a Bloom pre-filter on the fact side:
    rows whose key cannot be in the dim are dropped at the scan,
    BEFORE the join shuffle; the following exact join removes the
    false positives, so the result is identical to the plain join.

    At 100 TB this is the difference between shuffling the whole fact
    table and shuffling the ~match fraction of it; Spark's own runtime
    row-level filtering does the same transparently when enabled, this
    operator is the explicit, plannable form (and documents the
    mechanism).
    """
    bitmap = bloom_build(dim, dim_key, m_bits)
    pruned = fact.filter(bloom_might_contain(F.col(fact_key), bitmap, m_bits))
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], "inner")


def theta_set_ops_check(
    a: DataFrame, b: DataFrame, col: str, lg_k: int = 12
) -> DataFrame:
    """Theta-sketch set algebra — distinct cardinality of A∪B, A∩B and
    A∖B from two fixed-size sketches, next to the exact answers and
    4σ bound flags. The sketch answers need only the two 2^lg_k-entry
    summaries: the daily-rollup question "how many users did both X
    and Y" never rescans either side. Intersection/difference error
    scales with the UNION's cardinality (the standard theta bound),
    so their flags use the union estimate as the base.

    Below ~2^lg_k distinct values a theta sketch is in exact mode and
    the estimates are exact; the 4σ flags are the contract that keeps
    holding once real scale saturates the sketches.
    """
    sk_a = a.agg(F.expr(f"theta_sketch_agg({col}, {lg_k})").alias("sa"))
    sk_b = b.agg(F.expr(f"theta_sketch_agg({col}, {lg_k})").alias("sb"))
    both = sk_a.crossJoin(sk_b).select(
        F.expr("theta_sketch_estimate(theta_union(sa, sb))").alias("u_est"),
        F.expr("theta_sketch_estimate(theta_intersection(sa, sb))").alias(
            "i_est"
        ),
        F.expr("theta_sketch_estimate(theta_difference(sa, sb))").alias(
            "d_est"
        ),
    )
    # exact verification in ONE full-outer join: presence marks on
    # each side classify every key as union / intersection / a-only
    # in a single aggregate (the naive 3-join form re-ran the two
    # distincts six times)
    # NULL keys are invisible to the sketches (theta_sketch_agg skips
    # them) — drop them from the exact side too, or a NULL on each
    # side (unjoinable on the equi-key) fabricates phantom union rows
    # the sketch never counted
    ea = (
        a.select(F.col(col).alias("v"))
        .filter(F.col("v").isNotNull())
        .distinct()
        .withColumn("__a", F.lit(1))
    )
    eb = (
        b.select(F.col(col).alias("v"))
        .filter(F.col("v").isNotNull())
        .distinct()
        .withColumn("__b", F.lit(1))
    )
    exact = ea.join(eb, "v", "full_outer").agg(
        F.count(F.lit(1)).alias("exact_union"),
        F.sum(
            F.when(F.col("__a").isNotNull() & F.col("__b").isNotNull(), 1).otherwise(0)
        ).alias("exact_intersection"),
        F.sum(
            F.when(F.col("__a").isNotNull() & F.col("__b").isNull(), 1).otherwise(0)
        ).alias("exact_a_only"),
    )
    bound = 4.0 * 1.04 / (2 ** (lg_k / 2.0))
    out = exact.crossJoin(both)
    ok = lambda est, ex, base: (  # noqa: E731
        F.abs(F.col(est) - F.col(ex))
        <= F.greatest(F.lit(1.0), F.col(base) * bound)
    )
    return out.select(
        "exact_union",
        "exact_intersection",
        "exact_a_only",
        ok("u_est", "exact_union", "exact_union").alias("union_within_bound"),
        ok("i_est", "exact_intersection", "exact_union").alias(
            "intersection_within_bound"
        ),
        ok("d_est", "exact_a_only", "exact_union").alias("diff_within_bound"),
    )


def approx_topk_items(
    df: DataFrame, col: str, k: int, max_items_tracked: int = 10000
) -> DataFrame:
    """Datasketches frequent-items top-k: (item, cnt) rows from ONE
    fixed-size sketch pass. While the column's cardinality stays
    under ``max_items_tracked`` the sketch is in exact mode and the
    counts are exact (the catalog query's oracle relies on this and
    pins equality); past saturation the counts become estimates with
    the sketch's epsilon guarantee — same code, graceful contract.
    Callers order the output (count ties have no defined order)."""
    return (
        df.agg(
            F.expr(f"approx_top_k({col}, {k}, {max_items_tracked})").alias("tk")
        )
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("item"), F.col("e.count").alias("cnt"))
    )


def bloom_might_contain_col(
    key: Column, bm_col: Column, m_bits: int
) -> Column:
    """Membership predicate against a bitmap carried in a COLUMN
    (``array<long>``) rather than a plan literal. For small filters the
    literal form (``bloom_might_contain``) is fine; past ~2^16 bits the
    literal array bloats every task's codegen (a 2^22-bit filter is a
    65k-element literal in the plan). Attach the bitmap as a one-row
    broadcast frame (``F.broadcast(spark.createDataFrame([(bitmap,)],
    'bm array<long>'))`` cross-joined in) and probe it through this
    predicate — the bitmap ships once per executor via the broadcast
    exchange, and the plan stays O(1)."""
    cond = F.lit(True)
    for word, mask in _bloom_positions(key, m_bits):
        hit = F.element_at(bm_col, word + 1).bitwiseAND(mask) != 0
        cond = cond & hit
    return cond


def countmin_estimates(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) built and
    probed in one job, fully deterministic: ``depth`` hash rows of
    ``width`` counters, row r's hash = md5('cms<r>_' || key) mod
    width; a key's estimate is the MIN of its ``depth`` counters —
    always >= the true count, over only by colliding keys' mass (the
    classic epsilon-delta bound). Everything is exact integer
    arithmetic on md5-derived buckets, so any engine replays the
    same sketch bit-for-bit.

    Shape: one (row, bucket) aggregation (depth x width cells — a
    CONSTANT-size table, the whole point of a sketch) broadcast back
    onto the distinct keys for the probe. At 100 TB the build is one
    map-side-combinable pass; the sketch itself never grows.

    Returns (key, true_n, cms_n, overcount) per distinct key —
    true_n rides along because this entry demonstrates the bound;
    production uses the sketch where true_n is unaffordable.
    """
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1, width >= 2: {depth}, {width}")
    k = F.col(key_col).cast("string")
    cells = None
    for r in range(depth):
        c = df.select(
            F.lit(r).alias("__r"),
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"cms{r}_"), k)), 1, 8),
                    16, 10,
                ).cast("long") % width
            ).alias("__c"),
        )
        cells = c if cells is None else cells.unionByName(c)
    sketch = cells.groupBy("__r", "__c").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    keys = df.groupBy(k.alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("true_n")
    )
    probes = None
    for r in range(depth):
        p = keys.select(
            "key", "true_n",
            F.lit(r).alias("__r"),
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"cms{r}_"), F.col("key"))),
                        1, 8,
                    ),
                    16, 10,
                ).cast("long") % width
            ).alias("__c"),
        )
        probes = p if probes is None else probes.unionByName(p)
    return (
        probes.join(F.broadcast(sketch), ["__r", "__c"])
        .groupBy("key", "true_n")
        .agg(F.min("__n").alias("cms_n"))
        .withColumn("overcount", F.col("cms_n") - F.col("true_n"))
    )


def kmv_sketch(keys: DataFrame, key_col: str, k: int, seed: str = "kmv") -> DataFrame:
    """K-minimum-values sketch of a key SET: the ``k`` smallest values
    of a 60-bit uniform hash over the distinct keys (Bar-Yossef et
    al., RANDOM 2002). One distinct + a global sort-limit that Spark
    executes as TakeOrdered (per-partition top-k, k rows to the
    driver) — the sketch is k rows regardless of input size, so it
    broadcasts, merges by union, and supports set algebra downstream.

    Returns (h) — the hash values, ascending semantics implicit."""
    h = F.expr(
        f"CAST(conv(substr(md5(concat('{seed}', '|', CAST({key_col} AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )
    return (
        keys.select(h.alias("h"))
        .filter(F.col("h").isNotNull())
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_jaccard(
    a: DataFrame,
    a_col: str,
    b: DataFrame,
    b_col: str,
    k: int = 256,
    seed: str = "kmv",
) -> DataFrame:
    """KMV set-similarity estimate between two key sets without ever
    joining them at data size: build a k-minimum-values sketch of each
    side (k rows each), merge to the union sketch (the k smallest of
    the COMBINED hashes — a property of minima: kmv(A ∪ B) =
    k-smallest of kmv(A) ∪ kmv(B)), and estimate Jaccard as the
    fraction of union-sketch members present in both side sketches
    (Beyer et al., SIGMOD 2007). Everything after the two per-side
    sketches touches ≤ 2k rows.

    Also reports the union-cardinality estimate: exact when the union
    sketch is short of k (the sketch IS the distinct set), else the
    KMV estimator (k−1)·2⁶⁰ / h_(k) in integer DIV arithmetic.

    Deterministic: md5 is the shared uniform on both engines.

    Returns one row (k_used, inter_cnt, jaccard_ppb, union_est).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    ska = kmv_sketch(a, a_col, k, seed).withColumn("__ina", F.lit(1))
    skb = kmv_sketch(b, b_col, k, seed).withColumn("__inb", F.lit(1))
    merged = (
        ska.join(skb, "h", "full")
        .select(
            "h",
            F.coalesce(F.col("__ina"), F.lit(0)).alias("ina"),
            F.coalesce(F.col("__inb"), F.lit(0)).alias("inb"),
        )
        .orderBy("h")
        .limit(k)
    )
    return merged.agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.sum(F.col("ina") * F.col("inb")).cast("long").alias("inter_cnt"),
        F.max("h").cast("long").alias("__hk"),
    ).select(
        "k_used",
        "inter_cnt",
        F.expr(
            "CAST((CAST(inter_cnt AS DECIMAL(38,0)) * 1000000000)"
            " DIV k_used AS BIGINT)"
        ).alias("jaccard_ppb"),
        F.expr(
            f"CASE WHEN k_used < {k} THEN k_used ELSE"
            f" CAST(((CAST(k_used AS DECIMAL(38,0)) - 1) * {2**60})"
            " DIV __hk AS BIGINT) END"
        ).alias("union_est"),
    )
