"""Sparse vector-space-model (tf-idf) cosine similarity join.

All-pairs document similarity with FREQUENCY-weighted terms — the
weighted complement of ``dedup.ngram_jaccard_pairs`` (set overlap) and
``similarity`` (dense embeddings): near-dup templates with shifted
boilerplate score high here even when their shingle sets diverge.

Algorithm (Bayardo et al., "Scaling Up All Pairs Similarity Search",
WWW'07 family): build an inverted index (term → doc, weight), cap the
document-frequency of indexed terms (ultra-common terms contribute
negligible idf weight but quadratic join fan-out — the df cap is the
cosine analogue of the jaccard path's ``max_df`` hot-shingle cap),
equi-join the index with itself on term, and aggregate exact sparse
dot products per candidate pair. The term join is the ONLY shuffle
that grows with corpus size, its fan-out per term is bounded by the
df cap, and no pair is materialized unless the docs share ≥1 indexed
term — never an O(n²) cross join.

Cross-engine determinism: weights are EXACT integers — idf is the
scaled rational ``(N * idf_scale) div df`` (no logarithm: ln() bit
parity across engines is not a contract worth betting an oracle on),
tf multiplies it, and dot products / squared norms accumulate in
DECIMAL(38,0). Only the final cosine divides as double, with a fixed
expression shape, so any engine reproduces identical bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_script_spark.operators.dedup import shingles

_D38 = "decimal(38,0)"


def tfidf_weights(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    max_df_ratio: float = 0.5,
    max_df: int | None = None,
    idf_scale: int = 1_000_000,
) -> DataFrame:
    """Inverted index (id, term, w) with integer tf·idf weights.

    ``w = tf * ((N * idf_scale) div df)`` — larger for rarer terms,
    exact bigint. Terms with ``df > max_df_ratio * N`` are dropped
    from the INDEX (stop-shingle cap); ratios are compared in integer
    cross-multiplied form so the cap itself is exact. The corpus size
    N rides along as a 1-row broadcast crossJoin (the BM25 pattern) —
    no driver-side count.

    ``max_df`` is the ABSOLUTE cap and the one that matters at scale:
    the ratio cap bounds nothing in absolute terms — a boilerplate
    shingle in 30% of a 100 TB corpus passes a 0.5 ratio and alone
    generates (0.3n)² candidate pairs, the all-pairs death. With an
    absolute cap the join fan-out is bounded by
    Σ df² ≤ max_df · |index| — LINEAR in corpus size for fixed
    max_df. The recall loss is only on pairs whose ENTIRE similarity
    mass sits in ultra-common terms, which idf already weights toward
    zero (a df > max_df term contributes idf ≤ (N·scale)/max_df …
    negligible against any rare-term match).

    The tf ⋈ kept idf join is hinted MERGE: both sides are
    corpus-derived aggregates whose logical size estimates are
    garbage, and the static planner's guess picked a BroadcastHashJoin
    with the corpus-sized tf side as build — at 1M docs that is a
    >1 GB driver collect (`spark.driver.maxResultSize` abort, caught
    by the round-6 decade sweep). Sort-merge shuffles both sides on
    term and spills; neither vocab nor tf is ever materialized on the
    driver."""
    terms = docs.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), shingle_n, distinct=False)).alias(
            "term"
        ),
    )
    tf = terms.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.select(F.count(F.lit(1)).alias("n_docs"))
    # integer df cap: df * denom <= N * numer  (max_df_ratio = numer/denom)
    from fractions import Fraction

    frac = Fraction(max_df_ratio).limit_denominator(1_000_000)
    keep = (
        F.col("df") * F.lit(frac.denominator)
        <= F.col("n_docs") * F.lit(frac.numerator)
    )
    if max_df is not None:
        keep = keep & (F.col("df") <= F.lit(max_df))
    kept = (
        dfreq.crossJoin(F.broadcast(n))
        .filter(keep)
        .select("term", F.expr(f"(n_docs * {idf_scale}) div df").alias("idf"))
    )
    return tf.join(kept.hint("merge"), "term").select(
        "id", "term", (F.col("tf") * F.col("idf")).alias("w")
    )


def cosine_pairs(
    weights: DataFrame,
    threshold: float = 0.8,
) -> DataFrame:
    """(id_a, id_b, cosine) for pairs with cosine ≥ threshold, from an
    (id, term, w) index. Dot products and norms in DECIMAL(38,0) —
    w² can exceed int64 (w ≈ tf·idf_scale·N/df) and a silent wrap
    would fabricate similarities."""
    norms = weights.groupBy("id").agg(
        F.sum(F.col("w").cast(_D38) * F.col("w")).alias("n2")
    )
    a, b = weights.alias("a"), weights.alias("b")
    dots = (
        a.join(b, "term")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.sum(F.col("a.w").cast(_D38) * F.col("b.w")).alias("dot")
        )
    )
    na = norms.select(F.col("id").alias("id_a"), F.col("n2").alias("n2_a"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("n2").alias("n2_b"))
    # norms are |corpus| rows behind an aggregate but stay UNHINTED:
    # their size estimate is proportional to the input (verified: the
    # static plan picks sort-merge at 1M docs, broadcast only at
    # fixture scale where it is right), unlike the filtered idf table
    # above whose estimate is selectivity-garbage and needs the hint
    cos = (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "cosine",
            F.col("dot").cast("double")
            / (
                F.sqrt(F.col("n2_a").cast("double"))
                * F.sqrt(F.col("n2_b").cast("double"))
            ),
        )
    )
    return cos.filter(F.col("cosine") >= F.lit(threshold)).select(
        "id_a", "id_b", "cosine"
    )


def tfidf_cosine_join(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    shingle_n: int = 3,
    max_df_ratio: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """End-to-end: tokenize → integer tf-idf → inverted-index join →
    exact cosine ≥ threshold. The index feeds FOUR consumers (both
    self-join sides + both norm lookups); without persistence Spark
    re-executes the tokenize+aggregate chain per consumer — four
    corpus scans at 100 TB (caught in the executed plan, not the
    answer). The operator owns the persist; because the result is
    lazy, the cache must outlive this call, so the persisted index is
    tracked module-side: the NEXT tfidf_cosine_join call (or an
    explicit ``release_indexes()``) unpersists it. The leak is thereby
    bounded to one cached relation per session, not one per
    invocation. At corpus scale pass ``max_df`` (absolute) — see
    tfidf_weights."""
    from pyspark import StorageLevel

    release_indexes()
    w = tfidf_weights(
        docs,
        id_col,
        text_col,
        shingle_n=shingle_n,
        max_df_ratio=max_df_ratio,
        max_df=max_df,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED.append(w)
    return cosine_pairs(w, threshold)


_PERSISTED: list[DataFrame] = []


def release_indexes() -> None:
    """Unpersist every index cached by tfidf_cosine_join. Safe while a
    prior result is still un-executed: unpersist only drops the cache,
    forcing a recompute, never changing the answer."""
    while _PERSISTED:
        try:
            _PERSISTED.pop().unpersist(blocking=False)
        except Exception:
            pass
