"""Declared queries for the LLM-training-data operators: dedup
families (exact / n-gram Jaccard / MinHash / SimHash), similarity
search over embeddings, and text analysis. These are first-class
engine components (BASELINE.json north_star), exercised on the
``documents`` / ``embeddings`` tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_script_spark.operators import dedup as dedup_ops
from etl_script_spark.operators import similarity, textstats
from etl_script_spark.plans.catalog import register, t

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_WS = f"string_split({_NORM}, ' ')"
_SHINGLES = (
    f"CASE WHEN len({_WS}) < 3 THEN [array_to_string({_WS}, ' ')] "
    f"ELSE list_distinct([array_to_string({_WS}[i:i+2], ' ') "
    f"for i in range(1, len({_WS})-1)]) END"
)


_QUALITY_EXPR = f"""round(
        (CASE WHEN greatest(length({_NORM}),1) < 50 THEN 0.2
              WHEN greatest(length({_NORM}),1) > 10000 THEN 0.5 ELSE 1.0 END) * 0.25
        + (CASE WHEN length(regexp_replace({_NORM}, ' ', '', 'g'))
                     / greatest(len({_WS}),1) >= 3.0
               AND length(regexp_replace({_NORM}, ' ', '', 'g'))
                     / greatest(len({_WS}),1) <= 10.0
              THEN 1.0 ELSE 0.5 END) * 0.15
        + (length(regexp_replace({_NORM}, '[^\\p{{L}} ]', '', 'g'))
             / greatest(length({_NORM}),1)) * 0.25
        + (1.0 - least((length(regexp_replace({_NORM}, '[^.,;:!?]', '', 'g'))
             / greatest(length({_NORM}),1)) * 5.0, 1.0)) * 0.15
        + (len(list_distinct({_WS})) / greatest(len({_WS}),1)) * 0.20
      , 6)"""

_LANG_EXPR = f"""CASE WHEN len(list_filter({_WS}, w -> w IN
                  ('the','and','of','to','a','in','is','that','it','for'))) > 0
                THEN 'en' ELSE 'und' END"""

@register(
    "dedup_exact_text",
    f"""
    SELECT doc_id, dup_count FROM (
      SELECT doc_id,
             ROW_NUMBER() OVER (PARTITION BY md5({_NORM}) ORDER BY doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY md5({_NORM})) AS dup_count
      FROM documents
    ) WHERE rn = 1
    """,
    ("D1", "LLM-dedup"),
)
def dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a 128-bit content hash (shuffle key = hash, not
    text — the 100 TB-safe shuffle)."""
    d = t(spark, sf_dir, "documents")
    return dedup_ops.exact_dedup(d, "text", "doc_id").select("doc_id", "dup_count")


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH sh AS (
      SELECT doc_id, unnest({_SHINGLES}) AS shingle, len({_SHINGLES}) AS n_sh
      FROM documents
    )
    SELECT id_a, id_b, jaccard FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             COUNT(*) * 1.0
               / (any_value(a.n_sh) + any_value(b.n_sh) - COUNT(*)) AS jaccard
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ) WHERE jaccard >= 0.5
    """,
    ("LLM-dedup",),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs via shingle inverted
    index (equi-join on shingle hash; no cross join)."""
    d = t(spark, sf_dir, "documents")
    return dedup_ops.ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5)


_JACCARD_PAIRS = f"""
    SELECT id_a, id_b FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             COUNT(*) * 1.0
               / (any_value(a.n_sh) + any_value(b.n_sh) - COUNT(*)) AS jaccard
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ) WHERE jaccard >= 0.5
"""

_SH_CTE = f"""sh AS (
      SELECT doc_id, unnest({_SHINGLES}) AS shingle, len({_SHINGLES}) AS n_sh
      FROM documents
    )"""

_CC_CTES = f"""WITH RECURSIVE
    {_SH_CTE},
    pairs AS ({_JACCARD_PAIRS}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(id, r) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
    ),
    cc AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)"""


@register(
    "dedup_cc_clusters",
    f"""
    {_CC_CTES}
    SELECT id, cluster_id FROM cc
    """,
    ("LLM-dedup",),
)
def dedup_cc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters: n-gram-Jaccard pairs grouped by
    iterative min-label connected components (the oracle replays the
    same closure with a recursive CTE)."""
    d = t(spark, sf_dir, "documents")
    pairs = dedup_ops.ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5)
    return dedup_ops.connected_components(pairs)


@register(
    "dedup_near_canonical",
    f"""
    {_CC_CTES}
    SELECT doc_id, n_chars FROM documents
    WHERE doc_id NOT IN (SELECT id FROM cc WHERE id <> cluster_id)
    """,
    ("LLM-dedup",),
)
def dedup_near_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final dedup step: one canonical (min-id) document per near-dup
    cluster, all unclustered documents untouched — the corpus a
    training pipeline actually keeps."""
    d = t(spark, sf_dir, "documents")
    pairs = dedup_ops.ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5)
    return dedup_ops.near_dup_canonical(
        d.select("doc_id", "n_chars"), pairs, "doc_id"
    )


@register(
    "pipeline_llm_prep_e2e",
    f"""
    WITH RECURSIVE
    scored AS (
      SELECT doc_id, text,
             {_QUALITY_EXPR} AS quality,
             {_LANG_EXPR} AS lang,
             CAST(len({_WS}) AS INTEGER) AS n_tokens
      FROM documents
    ),
    kept AS (SELECT * FROM scored WHERE quality >= 0.87 AND lang = 'en'),
    exact AS (
      SELECT doc_id, text, quality, lang, n_tokens FROM (
        SELECT kept.*, ROW_NUMBER() OVER (
          PARTITION BY md5({_NORM}) ORDER BY doc_id) AS rn
        FROM kept
      ) WHERE rn = 1
    ),
    sh AS (
      SELECT doc_id, unnest({_SHINGLES}) AS shingle,
             len({_SHINGLES}) AS n_sh
      FROM exact
    ),
    pairs AS ({_JACCARD_PAIRS}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(id, r) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
    ),
    cc AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
    SELECT doc_id, lang, quality, n_tokens FROM exact
    WHERE doc_id NOT IN (SELECT id FROM cc WHERE id <> cluster_id)
    """,
    ("LLM-dedup", "LLM-text"),
)
def pipeline_llm_prep_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship LLM training-data prep pipeline, composed end-to-end:
    quality-score filter -> language-ID filter -> exact dedup (128-bit
    content hash, keep min id) -> transitive near-dup removal (n-gram
    Jaccard pairs + connected components, keep the canonical member)
    -> per-doc token counts. Every stage is the same operator the
    standalone catalog queries exercise; the oracle replays the whole
    pipeline in one recursive-CTE SQL statement."""
    d = t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "text",
        textstats.quality_score(F.col("text")).alias("quality"),
        textstats.detect_language(F.col("text")).alias("lang"),
        textstats.token_count_ws(F.col("text")).alias("n_tokens"),
    )
    kept = scored.filter((F.col("quality") >= 0.87) & (F.col("lang") == "en"))
    # survivors feeds BOTH the pair generation and the final anti-join;
    # localCheckpoint (not persist) so the score+filter+exact-dedup
    # chain runs once AND no cache-manager entry outlives the query —
    # checkpoint blocks are freed by the ContextCleaner when the
    # result is garbage-collected
    survivors = (
        dedup_ops.exact_dedup(kept, "text", "doc_id")
        .drop("dup_count")
        .localCheckpoint(eager=True)
    )
    pairs = dedup_ops.ngram_jaccard_pairs(
        survivors, "doc_id", "text", n=3, threshold=0.5
    )
    final = dedup_ops.near_dup_canonical(survivors, pairs, "doc_id")
    return final.select("doc_id", "lang", "quality", "n_tokens")


@register(
    "dedup_minhash_lsh",
    f"""
    WITH sh AS (
      SELECT doc_id, unnest({_SHINGLES}) AS shingle, len({_SHINGLES}) AS n_sh
      FROM documents
    )
    SELECT id_a, id_b, jaccard, TRUE AS found FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             COUNT(*) * 1.0
               / (any_value(a.n_sh) + any_value(b.n_sh) - COUNT(*)) AS jaccard
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ) WHERE jaccard >= 0.8
    """,
    ("LLM-dedup",),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(48)+LSH(16 bands) recall invariant, driver-checkable
    (VERDICT r3 #2): every exact-Jaccard >= 0.8 pair (the DuckDB
    oracle computes these independently) must appear among the LSH
    candidate pairs — at 16 bands x 3 rows the per-pair miss
    probability at j=0.8 is (1-0.8^3)^16 ~= 1e-5 (and the fixture's
    exact pairs all sit at j>=0.9, miss ~1e-9), i.e. recall-1 on
    test corpora. The query emits each exact pair with its jaccard
    and ``found`` = membership in the candidate set; the oracle
    asserts found=TRUE for all. The xxhash64 signatures themselves
    stay un-oracled (not SQL-expressible); signature agreement vs
    exact Jaccard is property-tested in tests/test_llm_ops.py. The
    lazy candidate DAG evaluates in the SAME job as the exact
    verify pipeline (the two co-schedule across the cluster instead
    of serializing behind an eager count); the result is re-homed to
    a localCheckpoint and the signature cache released so a catalog
    sweep leaves no cache-manager entry."""
    d = t(spark, sf_dir, "documents")
    cand = dedup_ops.minhash_lsh_candidates(d, "doc_id", "text", eager=False)
    exact = dedup_ops.ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.8
    )
    # membership is checked UP TO IDENTITY CLOSURE: under the default
    # identity collapse, a cross pair of same-signature group members
    # is represented by its hubs' pair (same agreement by
    # construction), so `found` maps both sides through the identity
    # hub — same-hub pairs are found by definition (the star edges
    # connect them), distinct-hub pairs must appear as the hub pair.
    idm = cand._identity_map
    ex = (
        exact.join(
            idm.select(
                F.col("id").alias("id_a"), F.col("hub").alias("hub_a")
            ),
            "id_a",
        ).join(
            idm.select(
                F.col("id").alias("id_b"), F.col("hub").alias("hub_b")
            ),
            "id_b",
        )
    )
    ckeys = cand.select(
        F.col("id_a").alias("ka"), F.col("id_b").alias("kb")
    ).withColumn("__c", F.lit(True))
    out = (
        ex.withColumn("ka", F.least("hub_a", "hub_b"))
        .withColumn("kb", F.greatest("hub_a", "hub_b"))
        .join(ckeys, ["ka", "kb"], "left")
        .select(
            "id_a",
            "id_b",
            "jaccard",
            (
                (F.col("hub_a") == F.col("hub_b"))
                | F.coalesce(F.col("__c"), F.lit(False))
            ).alias("found"),
        )
        .localCheckpoint(eager=True)
    )
    cand._sig_cache.unpersist()
    return out


@register(
    "dedup_simhash",
    """
    SELECT doc_id AS id_a, doc_id + 100000 AS id_b, TRUE AS found_h0
    FROM documents WHERE doc_id < 50
    """,
    ("LLM-dedup",),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(64) pigeonhole-banding invariant, driver-checkable
    (VERDICT r3 #2): identical normalized text gives an IDENTICAL
    fingerprint, and the k+1-band pigeonhole join finds every
    hamming<=k pair DETERMINISTICALLY — so planting an exact copy of
    each of the first 50 documents must yield all 50 planted pairs at
    hamming 0, end-to-end through fingerprinting, banding, the
    candidate join, and the hamming verify. (Near-dup pairs at
    hamming 1..3 have no SQL-expressible truth — xxhash64 bit votes —
    and stay covered by the pytest agreement/recall properties.)
    Result re-homed to a localCheckpoint, no cache residue."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.filter(F.col("doc_id") < 50)
    corpus = d.unionByName(
        planted.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    pairs = dedup_ops.simhash_near_dups(corpus, "doc_id", "text", max_hamming=3)
    out = (
        planted.select(
            F.col("doc_id").alias("id_a"),
            (F.col("doc_id") + 100000).alias("id_b"),
        )
        .join(
            pairs.filter(F.col("hamming") == 0).select(
                "id_a", "id_b", F.lit(True).alias("__h0")
            ),
            ["id_a", "id_b"],
            "left",
        )
        .select(
            "id_a", "id_b", F.coalesce(F.col("__h0"), F.lit(False)).alias("found_h0")
        )
        .localCheckpoint(eager=True)
    )
    pairs.unpersist()
    return out


@register(
    "ann_cosine_topk",
    """
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, vec AS qvec FROM v WHERE vec_id < 5
    )
    SELECT query_id, vec_id, cosine_sim FROM (
      SELECT q.query_id, v.vec_id,
             list_dot_product(v.vec, q.qvec)
               / (sqrt(list_dot_product(v.vec, v.vec))
                  * sqrt(list_dot_product(q.qvec, q.qvec))) AS cosine_sim,
             ROW_NUMBER() OVER (
               PARTITION BY q.query_id
               ORDER BY list_dot_product(v.vec, q.qvec)
                 / (sqrt(list_dot_product(v.vec, v.vec))
                    * sqrt(list_dot_product(q.qvec, q.qvec))) DESC,
               v.vec_id) AS rn
      FROM v CROSS JOIN q
    ) WHERE rn <= 10
    """,
    ("LLM-similarity",),
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for 5 query vectors over the corpus —
    the exact baseline (query side broadcast; corpus never shuffles
    until the per-query top-k window)."""
    e = t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return similarity.brute_force_topk(e, queries, k=10, dim=64)


def _bucket_sql(vec_sql: str, planes: list[list[float]]) -> str:
    """DuckDB SQL for the LSH bucket id — the hyperplanes are
    LCG-deterministic (similarity.random_hyperplanes), so the oracle
    embeds the SAME plane literals and replays the sign-bit packing."""
    terms = [
        f"(CASE WHEN list_dot_product({vec_sql}, "
        f"[{', '.join(repr(float(x)) for x in p)}]) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    ]
    return " + ".join(terms)


_PLANES4 = similarity.random_hyperplanes(64, 4, 42)
_PLANES6 = similarity.random_hyperplanes(64, 6, 42)

_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


@register(
    "ann_lsh_topk",
    f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings
    ), b AS (
      SELECT vec_id, vec, {_bucket_sql('vec', _PLANES4)} AS bucket FROM v
    ), q AS (
      SELECT vec_id AS query_id, vec AS qvec, bucket FROM b WHERE vec_id < 5
    )
    SELECT query_id, vec_id, cosine_sim FROM (
      SELECT q.query_id, b.vec_id,
             {_COS.format(a='b.vec', b='q.qvec')} AS cosine_sim,
             ROW_NUMBER() OVER (
               PARTITION BY q.query_id
               ORDER BY {_COS.format(a='b.vec', b='q.qvec')} DESC, b.vec_id
             ) AS rn
      FROM b JOIN q ON b.bucket = q.bucket
    ) WHERE rn <= 10
    """,
    ("LLM-similarity",),
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k (the scale path: compare count
    divided by ~2^planes). Deterministic hyperplanes; recall vs the
    exact baseline asserted in tests/test_llm_ops.py."""
    e = t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return similarity.lsh_topk(e, queries, dim=64, k=10, n_planes=4)


@register(
    "embedding_near_dups",
    f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings
    )
    SELECT id_a, id_b, cosine_sim FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {_COS.format(a='a.vec', b='b.vec')} AS cosine_sim
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    ) WHERE cosine_sim >= 0.95
    """,
    ("LLM-dedup", "LLM-similarity"),
)
def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs: banded hyperplane LSH
    candidates (8 bands x 4 planes, OR across bands) + exact cosine
    verify >= 0.95.

    The oracle is the EXACT all-pairs answer — banding puts recall at
    threshold ~0.9998 (vs ~0.43 for the old single 8-plane bucket),
    so the LSH path must reproduce the exact result on the test
    corpus; the planted-pair recall test at cosine ~0.95 lives in
    tests/test_llm_ops.py."""
    e = t(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dups(e, threshold=0.95, dim=64)


@register(
    "text_lang_id",
    f"""
    SELECT doc_id, {_LANG_EXPR} AS lang_pred
    FROM documents
    """,
    ("LLM-text",),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (script ranges + stopword argmax)."""
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", textstats.detect_language(F.col("text")).alias("lang_pred"))


@register(
    "text_token_counts",
    f"""
    SELECT doc_id,
           CAST(len({_WS}) AS INTEGER) AS n_tokens_ws,
           CAST(list_sum(list_transform(
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             w -> w != ''),
                 w -> greatest(CAST(ceil(length(w) / 4.0) AS BIGINT), 1)))
             AS BIGINT) AS n_tokens_bpe
    FROM documents
    """,
    ("LLM-text",),
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish subword token counts."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        textstats.token_count_ws(F.col("text")).alias("n_tokens_ws"),
        textstats.token_count_bpe_ish(F.col("text")).alias("n_tokens_bpe"),
    )


@register(
    "text_quality_score",
    f"""
    SELECT doc_id, {_QUALITY_EXPR} AS quality
    FROM documents
    """,
    ("LLM-text",),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quality heuristic (length/alpha/punct/repetition
    bands)."""
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", textstats.quality_score(F.col("text")).alias("quality"))


@register(
    "text_fingerprint",
    f"""
    SELECT doc_id, md5({_NORM}) AS fp FROM documents
    """,
    ("LLM-text",),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable md5 document fingerprint over normalized text."""
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", textstats.fingerprint_md5(F.col("text")).alias("fp"))


@register(
    "text_fingerprint_rolling",
    f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(
                 list_filter(string_split({_NORM}, ''), x -> x != ''),
                 x -> CAST(unicode(x) AS BIGINT))),
             (acc, x) -> (acc * 257 + x) % 2147483647) AS fp
    FROM documents
    """,
    ("LLM-text",),
)
def text_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive Rabin-Karp fingerprint over normalized-text
    codepoints — the polynomial is re-derived verbatim in the DuckDB
    oracle (same base/mod, same codepoint terms), closing the last
    text-family rows-only gap (VERDICT r3 #2)."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", textstats.fingerprint_rolling(F.col("text")).alias("fp")
    )


@register(
    "ann_ivf_topk",
    """
    SELECT vec_id AS query_id, TRUE AS self_found, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 5
    """,
    ("LLM-similarity",),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-k (coarse centroid cells + nprobe
    probing + exact in-cell rerank), reported as a driver-checkable
    recall invariant (VERDICT r3 #2): per query, (a) the query's own
    vector must be in its IVF top-10 (its best-affinity cell is
    always probed first — deterministic), and (b) overlap with the
    exact brute-force top-10 — both computed IN this query — must be
    >= 3 (observed 4..7 at sf0.01 with the hash-ordered fit sample;
    the floor leaves margin without going vacuous). The oracle just
    enumerates the query ids with both flags TRUE. Raw top-k recall
    curves stay in tests/test_llm_ops.py."""
    e = t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    ivf = similarity.ivf_topk(
        e, queries, k=10, n_centroids=8, nprobe=3, dim=64
    )
    exact = similarity.brute_force_topk(e, queries, k=10)
    j = ivf.select("query_id", "vec_id").join(
        exact.select("query_id", "vec_id").withColumn("__hit", F.lit(1)),
        ["query_id", "vec_id"],
        "left",
    )
    return j.groupBy("query_id").agg(
        F.max(F.col("vec_id") == F.col("query_id")).alias("self_found"),
        (F.sum(F.coalesce(F.col("__hit"), F.lit(0))) >= 3).alias("recall_ok"),
    )


@register(
    "dedup_cc_alternating",
    f"""
    {_CC_CTES}
    SELECT id, cluster_id FROM cc
    """,
    ("LLM-dedup",),
)
def dedup_cc_alternating(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same transitive-closure contract as dedup_cc_clusters, computed
    with the alternating large-star/small-star contraction — O(log n)
    rounds regardless of component diameter (the propagation operator
    needs diameter rounds). The scale path for long-chain graphs."""
    d = t(spark, sf_dir, "documents")
    pairs = dedup_ops.ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5)
    return dedup_ops.connected_components_alternating(pairs)


_CHAR_SHINGLES = (
    f"CASE WHEN length({_NORM}) < 8 THEN [{_NORM}] "
    f"ELSE list_distinct([substr({_NORM}, i, 8) "
    f"for i in range(1, length({_NORM}) - 6)]) END"
)


@register(
    "dedup_ngram_jaccard_char",
    f"""
    WITH sh0 AS (
      SELECT doc_id, unnest({_CHAR_SHINGLES}) AS shingle
      FROM documents
    ),
    dfreq AS (
      SELECT shingle, COUNT(*) AS df FROM sh0 GROUP BY 1
    ),
    sh1 AS (
      SELECT s.doc_id, s.shingle FROM sh0 s
      JOIN dfreq USING (shingle) WHERE dfreq.df <= 200
    ),
    sh AS (
      SELECT doc_id, shingle,
             COUNT(*) OVER (PARTITION BY doc_id) AS n_sh
      FROM sh1
    )
    SELECT id_a, id_b, jaccard FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             COUNT(*) * 1.0
               / (any_value(a.n_sh) + any_value(b.n_sh) - COUNT(*)) AS jaccard
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ) WHERE jaccard >= 0.5
    """,
    ("LLM-dedup",),
)
def dedup_ngram_jaccard_char(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-8-gram Jaccard near-dup pairs — the shingle unit for
    scripts without word delimiters (Thai, CJK), where word shingling
    degenerates to one token per document. Same inverted-index shape
    as the word variant. The max_df cap matters MORE for characters
    than for words: common short grams occur in nearly every document
    and the self-join blows up quadratically on each (n=5 uncapped
    measured 119 s at sf0.1; n=8 with df<=200 is 4.6 s with an
    identical pair set). The oracle models the SAME df cap — the cap
    is part of the operator contract, not a hidden approximation."""
    d = t(spark, sf_dir, "documents")
    return dedup_ops.ngram_jaccard_pairs(
        d, "doc_id", "text", n=8, threshold=0.5, max_df=200, unit="char"
    )


@register(
    "sample_hash_deterministic",
    """
    SELECT doc_id, n_chars FROM documents
    WHERE substr(md5('s1' || CAST(doc_id AS VARCHAR)), 1, 8) < '40000000'
    """,
    ("LLM-sampling",),
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 25% curation subsample by content-hash predicate —
    the same 25% on every run, engine, and cluster size (rand()-based
    sampling is none of those). Pure per-row filter: no shuffle, runs
    inside the scan stage."""
    d = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return textstats.hash_sample(d, "doc_id", 0.25, seed="s1")


@register(
    "text_lang_id_multi",
    f"""
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INTEGER)
             WHEN 1 THEN 'th'
             WHEN 2 THEN 'zh'
             ELSE {_LANG_EXPR}
           END AS lang
    FROM documents
    """,
    ("LLM-text",),
)
def text_lang_id_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID across scripts: every third document is rewritten
    as Thai / CJK body text (script-ratio detection fires before the
    stopword argmax); the rest keep the English/und fixture text. The
    oracle states the script labels directly and replays the stopword
    rule for the Latin remainder — proving the full cascade, not just
    the English path."""
    d = t(spark, sf_dir, "documents")
    k = (F.col("doc_id") % 3).cast("int")
    txt = (
        F.when(k == 1, F.lit("บริษัทจำกัดดำเนินกิจการค้าปลีกในประเทศไทย"))
        .when(k == 2, F.lit("本公司在泰国经营零售业务多年经验丰富"))
        .otherwise(F.col("text"))
    )
    return d.select(
        "doc_id", textstats.detect_language(txt).alias("lang")
    )


_BM25_TERMS = ("join", "window", "hash")
_BM25_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, token FROM (
        SELECT doc_id,
               unnest(string_split(trim(regexp_replace(lower(text),
                 '\\s+', ' ', 'g')), ' ')) AS token
        FROM documents
      ) WHERE token <> ''
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    corpus AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_tokens FROM dl),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM toks
      WHERE token IN ('join','window','hash') GROUP BY 1, 2
    ),
    dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
    term AS (
      SELECT tf.doc_id,
             CAST(ROUND(
               ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               * (tf * 2.2 / (tf + 1.2 * (1.0 - 0.75
                    + 0.75 * dl / (CAST(total_tokens AS DOUBLE) / n_docs))))
               * 1000000.0) AS BIGINT) AS ts_q
      FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id)
      CROSS JOIN corpus
    ),
    scored AS (
      SELECT doc_id, COUNT(*) AS n_terms_matched,
             SUM(ts_q) AS score_q, SUM(ts_q) / 1e6 AS score
      FROM term GROUP BY doc_id
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_q DESC, doc_id) AS BIGINT)
             AS rank,
           doc_id AS id, n_terms_matched, score
    FROM scored ORDER BY score_q DESC, doc_id LIMIT 10
"""


@register("search_bm25_topk", _BM25_ORACLE, ("LLM-search",))
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 for the query {join, window, hash} over the
    documents corpus — Lucene's non-negative idf, per-term scores
    quantized to 1e-6 before the per-document integer sum (the
    unigram-NLL determinism policy), rank ties broken by doc id.
    Term statistics are computed only for the query's terms (the
    explode is filtered before aggregation), the df table broadcasts,
    and the top-k is TakeOrdered — per-query cost tracks matches,
    not corpus size."""
    from etl_script_spark.operators import search

    d = t(spark, sf_dir, "documents")
    out = search.bm25_topk(d, "text", "doc_id", list(_BM25_TERMS), k=10)
    return out.select(
        F.col("rank").cast("long").alias("rank"),
        "id",
        "n_terms_matched",
        "score",
    )


@register(
    "tok_bpe_roundtrip",
    """
    WITH w AS (
      SELECT doc_id,
             list_filter(
               string_split(
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
               x -> x <> '') AS ws
      FROM documents
    )
    SELECT doc_id AS id,
           COALESCE(len(ws), 0) AS n_words,
           CAST(COALESCE(list_sum(list_transform(ws, x -> length(x))), 0)
                AS BIGINT) AS n_chars
    FROM w
    """,
    ("LLM-tokenize",),
)
def tok_bpe_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenization end-to-end: vocabulary trained on the
    corpus's own distributed word-frequency table (driver merge loop
    over the COLLECTED frequency table — vocabulary-bounded, the same
    bounded-fit pattern as the IVF centroids), then applied to every
    document via Arrow-batched mapInPandas with broadcast merge
    ranks. The oracle pins the per-document word count, the
    CHARACTER MASS — ``n_chars`` is rederived from the encoded
    tokens on the Spark side but from the raw text on the oracle
    side, so a symbol dropped or duplicated anywhere in the merge
    loop breaks the hash (the falsifiable loss-free check; the
    in-process ``roundtrip_ok`` equality alone is structurally
    satisfied by any adjacent-concatenation encoder, so boolean
    invariants are asserted in tests/test_bpe.py rather than hashed
    here — a constant-TRUE oracle column contributes nothing)."""
    from etl_script_spark.operators import bpe

    d = t(spark, sf_dir, "documents")
    merges = bpe.train_bpe(
        bpe.word_frequencies(d, "text", limit=4096), n_merges=200
    )
    out = bpe.tokenize(d, "text", "doc_id", merges)
    return out.select("id", "n_words", "n_chars")


@register(
    "embedding_quantize_int8",
    """
    WITH base AS (
      SELECT vec_id,
             list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
             embedding
      FROM embeddings
    )
    SELECT vec_id AS id, scale,
           CAST(to_json(
             CASE WHEN scale = 0 THEN list_transform(embedding, x -> 0)
                  ELSE list_transform(embedding, x -> CAST(
                    (CASE WHEN CAST(x AS DOUBLE) < 0 THEN -1 ELSE 1 END)
                    * floor(abs(CAST(x AS DOUBLE)) / scale + 0.5) AS INT))
             END) AS VARCHAR) AS q_json,
           TRUE AS reconstruct_ok
    FROM base
    """,
    ("LLM-similarity", "SK-quantize"),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization with a per-row
    reconstruction-error invariant: every dequantized coordinate sits
    within half a quantization step (scale/2 + 1e-12 float slack) of
    the original. Codes and scales hash-match DuckDB exactly (the
    sign/floor formula is engine-stable where round-half is not); the
    invariant column proves the 4x-compression claim is loss-BOUNDED,
    not just loss-y. The code array is emitted as a compact JSON
    string (``to_json`` on both engines) because the driver's pandas
    canonicalizer cannot sort bare array columns."""
    from etl_script_spark.operators import similarity

    e = t(spark, sf_dir, "embeddings")
    out = similarity.quantize_int8(e, "vec_id", "embedding")
    joined = out.join(
        e.select(F.col("vec_id").alias("id"), "embedding"), "id"
    )
    err_ok = F.when(
        F.col("scale") == 0.0, F.lit(True)
    ).otherwise(
        F.expr(
            "aggregate(zip_with(embedding, q, (x, qi) -> "
            "abs(CAST(x AS DOUBLE) - qi * scale)), CAST(0.0 AS DOUBLE), "
            "(acc, e) -> greatest(acc, e)) <= scale / 2 + 1e-12"
        )
    )
    return joined.select(
        "id",
        "scale",
        F.to_json(F.col("q")).alias("q_json"),
        err_ok.alias("reconstruct_ok"),
    )


# =====================================================================
# tf-idf cosine all-pairs + fingerprint-bucket diversity sampling
# =====================================================================

from etl_script_spark.operators import vsm  # noqa: E402

_SHINGLES_MULTI = (
    f"CASE WHEN len({_WS}) < 3 THEN [array_to_string({_WS}, ' ')] "
    f"ELSE [array_to_string({_WS}[i:i+2], ' ') "
    f"for i in range(1, len({_WS})-1)] END"
)


@register(
    "sim_tfidf_cosine_pairs",
    f"""
    WITH sh AS (
      SELECT doc_id AS id, unnest({_SHINGLES_MULTI}) AS term FROM documents
    ),
    tf AS (SELECT id, term, COUNT(*) AS tf FROM sh GROUP BY id, term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    kept AS (SELECT term, (n_docs * 1000000) // df AS idf
             FROM dfq, n WHERE df * 2 <= n_docs * 1),
    w AS (SELECT tf.id, tf.term, tf.tf * kept.idf AS w
          FROM tf JOIN kept USING (term)),
    norms AS (SELECT id, SUM(CAST(w AS HUGEINT) * w) AS n2
              FROM w GROUP BY id),
    dots AS (SELECT a.id AS id_a, b.id AS id_b,
                    SUM(CAST(a.w AS HUGEINT) * b.w) AS dot
             FROM w a JOIN w b ON a.term = b.term AND a.id < b.id
             GROUP BY 1, 2)
    SELECT id_a, id_b, cosine_ppb FROM (
      SELECT id_a, id_b,
             CAST(ROUND(CAST(dot AS DOUBLE)
               / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
               * 1.0e9) AS BIGINT) AS cosine_ppb
      FROM dots JOIN norms na ON na.id = dots.id_a
                JOIN norms nb ON nb.id = dots.id_b
    ) WHERE cosine_ppb >= 600000000
    """,
    ("LLM-dedup", "LLM-similarity"),
)
def sim_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-weighted all-pairs similarity (operators/vsm): word-
    3-gram tf-idf vectors, df-capped inverted-index self-join, EXACT
    integer dot products (idf is the scaled rational (N·10⁶) div df —
    no ln(), so the oracle replays every bit). The weighted complement
    of dedup_ngram_jaccard: template docs with shifted boilerplate
    score high on rare-shingle weight even when their shingle SETS
    diverge below the jaccard threshold. Scale: the term join is the
    only data-sized shuffle; fan-out per term is df-capped (Bayardo's
    all-pairs bound), never O(n²).

    The CHECKED similarity column is parts-per-billion-quantized:
    dots and norms exceed 2^53 at sf0.1 magnitudes, and the
    big-integer→double conversion is correctly rounded in Spark
    (BigDecimal path) but not in DuckDB's HUGEINT path — a genuine
    last-ulp cross-engine divergence (caught by the sf0.1 oracle
    sweep, invisible at sf0.01). Quantizing the OUTPUT to 1e-9
    absorbs the ulp — and threshold MEMBERSHIP is decided on the
    quantized value in BOTH engines (a pair within an ulp of 0.6
    would otherwise flip in/out of the result set, which output
    quantization cannot repair), so the operator runs with a slack
    pre-threshold and the ppb filter is the contract. The operator
    itself still returns the raw double, and the bitwise
    spark-vs-pure-Python property in tests/test_round5_properties.py
    still pins the exact arithmetic at sub-2^53 magnitudes."""
    d = t(spark, sf_dir, "documents")
    pairs = vsm.tfidf_cosine_join(
        d, "doc_id", "text", threshold=0.55, shingle_n=3, max_df_ratio=0.5
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.round(F.col("cosine") * F.lit(1.0e9)).cast("long").alias(
            "cosine_ppb"
        ),
    ).filter(F.col("cosine_ppb") >= F.lit(600000000))


@register(
    "sample_diverse_buckets",
    f"""
    SELECT bucket, doc_id, n_chars FROM (
      SELECT doc_id, n_chars,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(
                   list_filter(string_split({_NORM}, ''), x -> x != ''),
                   x -> CAST(unicode(x) AS BIGINT))),
               (acc, x) -> (acc * 257 + x) % 2147483647) % 64 AS bucket,
             ROW_NUMBER() OVER (
               PARTITION BY list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(
                     list_filter(string_split({_NORM}, ''), x -> x != ''),
                     x -> CAST(unicode(x) AS BIGINT))),
                 (acc, x) -> (acc * 257 + x) % 2147483647) % 64
               ORDER BY n_chars DESC, doc_id DESC) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
    ("LLM-sampling",),
)
def sample_diverse_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-stratified selection: partition the corpus into 64
    content-fingerprint buckets (the SQL-replayable Rabin-Karp
    polynomial — textstats.fingerprint_rolling — mod 64) and keep the
    best document per bucket (longest, id-tiebroken). The cheap
    deterministic stand-in for cluster-based diverse sampling: every
    selection decision is a window rank inside a hash stratum, so the
    pick parallelizes per bucket and never compares documents across
    strata. One shuffle on the bucket key."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    bucket = F.pmod(textstats.fingerprint_rolling(F.col("text")), F.lit(64))
    w = Window.partitionBy("bucket").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").desc()
    )
    return (
        d.select("doc_id", "n_chars", bucket.alias("bucket"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("bucket", "doc_id", "n_chars")
    )


@register(
    "dedup_semantic_clusters",
    """
    SELECT vec_id AS id_a, vec_id + 100000 AS id_b, TRUE AS found
    FROM embeddings WHERE vec_id < 25
    """,
    ("LLM-dedup", "LLM-similarity"),
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (cluster-scoped embedding dedup,
    similarity.semantic_dedup_pairs) as a driver-checkable planted
    invariant, the dedup_simhash pattern: an exact copy of each of the
    first 25 embeddings is planted at id+100000; identical vectors
    assign to the SAME k-means cluster deterministically (assignment
    is a pure function of the vector), so the within-cluster pair
    search must surface every planted pair at cosine 1.0 — end-to-end
    through the Lloyd fit, cluster candidate join, and exact-cosine
    verify. Sub-threshold semantic geometry stays covered by pytest
    (no SQL-expressible truth for the k-means fit)."""
    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = e.filter(F.col("vec_id") < 25)
    corpus = e.unionByName(
        planted.select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
    )
    # impl='arrow' is safe under this ORACLE: the check is outcome-
    # level (planted pairs found), identical vectors cluster and score
    # identically under either impl, and every emitted pair is
    # exact-verified — the same argument as the contamination banding
    pairs = similarity.semantic_dedup_pairs(
        corpus, "vec_id", "embedding", threshold=0.999, k=16, iters=2,
        impl="arrow",
    )
    return (
        planted.select(
            F.col("vec_id").alias("id_a"),
            (F.col("vec_id") + 100000).alias("id_b"),
        )
        .join(
            pairs.select("id_a", "id_b", F.lit(True).alias("__f")),
            ["id_a", "id_b"],
            "left",
        )
        .select(
            "id_a", "id_b", F.coalesce(F.col("__f"), F.lit(False)).alias("found")
        )
    )


@register(
    "ann_ivfpq_topk",
    """
    SELECT vec_id AS query_id, TRUE AS self_found, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 5
    """,
    ("LLM-similarity",),
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate top-k (coarse cells + 32-way product
    quantization + ADC scoring + exact rerank of an 8k shortlist) —
    the memory-bounded ANN serving shape where the corpus is stored
    as ~m bytes per vector and raw embeddings are touched only for
    the shortlist (operators/similarity.py:ivfpq_topk). Same
    driver-checkable invariant contract as ann_ivf_topk: per query,
    (a) the query's own vector appears in its top-10 and (b) overlap
    with the exact brute-force top-10 computed IN this query is >= 4
    (observed 6..8 at sf0.001/0.01/0.1 with nprobe=4, ksub=32,
    refine=8; the floor leaves margin without going vacuous). The
    oracle enumerates query ids with both flags TRUE."""
    e = t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    pq = similarity.ivfpq_topk(
        e, queries, k=10, n_centroids=8, nprobe=4, m=8, ksub=32, dim=64,
        refine=8,
    )
    exact = similarity.brute_force_topk(e, queries, k=10)
    j = pq.select("query_id", "vec_id").join(
        exact.select("query_id", "vec_id").withColumn("__hit", F.lit(1)),
        ["query_id", "vec_id"],
        "left",
    )
    return j.groupBy("query_id").agg(
        F.max(F.col("vec_id") == F.col("query_id")).alias("self_found"),
        (F.sum(F.coalesce(F.col("__hit"), F.lit(0))) >= 4).alias("recall_ok"),
    )


_BP = "bp0 bp1 bp2 bp3 bp4 bp5 bp6 bp7 bp8 bp9"


@register(
    "dedup_substring_remove",
    f"""
    WITH d0 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' {_BP}'
                  ELSE text END AS text
      FROM documents
    ),
    b AS (SELECT doc_id,
                 list_filter(string_split({_NORM}, ' '), w -> w <> '') AS ws
          FROM d0),
    b2 AS (SELECT doc_id, ws, len(ws) AS m FROM b WHERE len(ws) > 0),
    w AS (
      SELECT doc_id, pos,
             md5(array_to_string(ws[pos:pos+7], ' ')) AS g
      FROM (SELECT doc_id, ws,
                   unnest(CASE WHEN m >= 8 THEN range(1, m - 6)
                          ELSE [] END) AS pos
            FROM b2)
    ),
    owners AS (SELECT g, MIN(doc_id) AS owner FROM w GROUP BY g),
    dup_pos AS (
      SELECT DISTINCT doc_id, tpos FROM (
        SELECT w.doc_id, unnest(range(w.pos, w.pos + 8)) AS tpos
        FROM w JOIN owners USING (g) WHERE owners.owner < w.doc_id
      )
    ),
    toks AS (
      SELECT doc_id, pos AS tpos, ws[pos] AS word
      FROM (SELECT doc_id, ws, unnest(range(1, m + 1)) AS pos FROM b2)
    ),
    kept AS (
      SELECT t.doc_id, t.tpos, t.word
      FROM toks t LEFT JOIN dup_pos p
        ON t.doc_id = p.doc_id AND t.tpos = p.tpos
      WHERE p.doc_id IS NULL
    ),
    rebuilt AS (
      SELECT doc_id, string_agg(word, ' ' ORDER BY tpos) AS clean_text,
             COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT b2.doc_id,
           COALESCE(r.clean_text, '') AS clean_text,
           b2.m AS n_tokens,
           CAST(b2.m - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed
    FROM b2 LEFT JOIN rebuilt r ON b2.doc_id = r.doc_id
    """,
    ("LLM-dedup", "LLM-curation"),
)
def dedup_substring_remove(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring span CUTTING (Lee et al. 2022): every 8-word
    window whose md5 also occurs in a lower-id document is removed
    from the higher-id document, first occurrence wins, and the
    surviving words are reassembled in order — the rewrite
    counterpart of the dedup_repeated_spans audit. The fixture plants
    a shared 10-word boilerplate suffix on every 7th document (so
    partial cuts are exercised, not just the corpus's full-copy
    dups, which cut to ''). Oracle replays window ownership,
    coverage, and reassembly verbatim. See
    operators/dedup.py:remove_duplicate_spans for the 100 TB shape
    (one gram aggregation + merge-hinted rejoin; duplicated material
    fans out n positions, bounded)."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" " + _BP)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return dedup_ops.remove_duplicate_spans(d, "text", "doc_id", n=8)


@register(
    "embedding_pca_rotation",
    """
    SELECT vec_id, TRUE AS ok_parseval, TRUE AS ok_contract
    FROM embeddings
    """,
    ("LLM-similarity",),
)
def embedding_pca_rotation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA fit + distributed projection, certified by exact linear-
    algebra invariants (the fixture embeddings are near-isotropic, so
    neighbor recall cannot gate this — a rotation identity can):
    with k=dim the component matrix is a full orthonormal basis, so
    Parseval holds per row, ||P64(x)||^2 == ||x - mean||^2 (to fp
    tolerance); with k=16 the projection is a contraction,
    ||P16(x)||^2 <= ||x - mean||^2. Both flags are computed IN this
    query from the same literal model the projection uses — a wrong
    eigenvector, dropped mean term, or sign-handling bug breaks
    Parseval on every row. Fit is the bounded hash-ordered driver
    sample (ivf_centroids discipline); projection is a scan-stage
    map (operators/similarity.py:pca_fit/pca_project)."""
    e = t(spark, sf_dir, "embeddings")
    full = similarity.pca_fit(e, dim=64, k=64)
    part = similarity.pca_fit(e, dim=64, k=16)
    mean = full["mean"]
    mlit = "array(" + ",".join(
        f"CAST('{float(v)!r}' AS DOUBLE)" for v in mean
    ) + ")"
    centered_sq = (
        f"aggregate(zip_with(embedding, {mlit}, "
        f"(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        f"0.0D, (acc, v) -> acc + v)"
    )
    sq = "aggregate({c}, 0.0D, (acc, v) -> acc + v * v)"
    p = e.select(
        "vec_id",
        similarity.pca_project("embedding", full).alias("p64"),
        similarity.pca_project("embedding", part).alias("p16"),
        F.expr(centered_sq).alias("__csq"),
        similarity.l2_norm(F.col("embedding")).alias("__n"),
    )
    tol = F.lit(1e-6) * (F.lit(1.0) + F.col("__n") * F.col("__n"))
    return p.select(
        "vec_id",
        (
            F.abs(F.expr(sq.format(c="p64")) - F.col("__csq")) <= tol
        ).alias("ok_parseval"),
        (
            F.expr(sq.format(c="p16")) <= F.col("__csq") + tol
        ).alias("ok_contract"),
    )


@register(
    "dedup_keep_best_quality",
    f"""
    {_CC_CTES},
    q AS (SELECT doc_id, {_QUALITY_EXPR} AS quality FROM documents)
    SELECT doc_id, cluster_id, quality FROM (
      SELECT c.id AS doc_id, c.cluster_id, q.quality,
             ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                ORDER BY q.quality DESC, c.id ASC) AS rn
      FROM cc c JOIN q ON q.doc_id = c.id
    ) WHERE rn = 1
    """,
    ("LLM-dedup", "LLM-curation"),
)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection: within each transitive
    near-dup cluster keep the HIGHEST-quality member (tie -> min id),
    not the first-seen — the curation policy when near-dups differ in
    extraction quality (C4 keeps first; RefinedWeb-style pipelines
    keep best). Composition: n-gram Jaccard pairs -> alternating-star
    CC -> one window over (cluster, quality). The quality score is
    the same oracle-green expression as text_quality_score, so the
    cross-engine double compares exactly. Scale shape: inherits the
    pair/CC analysis; the selection adds one window shuffle keyed on
    cluster_id."""
    d = t(spark, sf_dir, "documents")
    pairs = dedup_ops.ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5)
    cc = dedup_ops.connected_components_alternating(pairs)
    q = d.select(
        "doc_id", textstats.quality_score(F.col("text")).alias("quality")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("id").asc()
    )
    return (
        cc.join(q, cc["id"] == q["doc_id"])
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "cluster_id", "quality")
    )


@register(
    "tok_unigram_roundtrip",
    """
    WITH w AS (
      SELECT doc_id,
             list_filter(
               string_split(
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
               x -> x <> '') AS ws
      FROM documents
    )
    SELECT doc_id AS id,
           COALESCE(len(ws), 0) AS n_words,
           CAST(COALESCE(list_sum(list_transform(ws, x -> length(x))), 0)
                AS BIGINT) AS n_chars
    FROM w
    """,
    ("LLM-tokenize",),
)
def tok_unigram_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece-style) tokenization end-to-end: the
    vocabulary is fit by deterministic hard-EM + pruning on the
    corpus's own collected word-frequency table (bounded driver fit,
    the bpe/IVF pattern), then applied to every document via
    Arrow-batched Viterbi segmentation with the quantized-int piece
    costs broadcast. Same falsifiable contract as tok_bpe_roundtrip:
    ``n_chars`` is rederived from the emitted PIECES on the Spark
    side but from the raw text on the oracle side, so any character
    dropped or duplicated by segmentation breaks the hash; the
    segmentation-quality invariants (optimality vs brute force,
    compression vs characters, determinism) live in
    tests/test_round6_ops.py."""
    from etl_script_spark.operators import unigram_tok

    d = t(spark, sf_dir, "documents")
    vocab = unigram_tok.train_unigram(
        unigram_tok.word_frequencies(d, "text", limit=4096),
        vocab_size=512,
        max_piece_len=8,
    )
    out = unigram_tok.tokenize_unigram(d, "text", "doc_id", vocab)
    return out.select("id", "n_words", "n_chars")


@register(
    "search_phrase_positional",
    f"""
    WITH d0 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN text || ' the quick brown fox'
                  ELSE text END AS text
      FROM documents
    ),
    b AS (SELECT doc_id,
                 list_filter(string_split({_NORM}, ' '), w -> w <> '') AS ws
          FROM d0),
    toks AS (
      SELECT doc_id, pos - 1 AS pos, ws[pos] AS token
      FROM (SELECT doc_id, ws,
                   unnest(range(1, len(ws) + 1)) AS pos FROM b)
    ),
    p(i, token) AS (VALUES (0, 'the'), (1, 'quick'), (2, 'brown'),
                           (3, 'fox')),
    hits AS (
      SELECT doc_id, pos - i AS base
      FROM toks JOIN p USING (token)
      GROUP BY doc_id, pos - i
      HAVING COUNT(DISTINCT i) = 4
    )
    SELECT doc_id, COUNT(*) AS n_matches FROM hits GROUP BY doc_id
    """,
    ("LLM-text", "search"),
)
def search_phrase_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ("the quick brown fox" as ADJACENT words)
    via positional vote counting: each posting matching phrase[i]
    votes for start base = pos - i; a base with all distinct i's is
    an occurrence — one explode + one broadcast phrase join + one
    aggregation, no positional self-joins
    (operators/search.py:phrase_occurrences). The fixture plants the
    phrase as a suffix on every 5th document; 'the' also occurs
    naturally, so the oracle proves order-sensitivity (bag-of-words
    co-occurrence would over-match)."""
    from etl_script_spark.operators.search import phrase_occurrences

    d0 = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit(" the quick brown fox")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return phrase_occurrences(
        d0, "text", "doc_id", ["the", "quick", "brown", "fox"]
    )


# =====================================================================
# Round 7: winnowing, novelty, containment, sentence dedup, script
# profile, tokenizer fertility
# =====================================================================


@register(
    "text_winnow_fingerprints",
    f"""
    WITH nm AS (SELECT doc_id, {_NORM} AS s FROM documents),
    h AS (
      SELECT doc_id,
             CASE WHEN length(s) >= 5 THEN
               [('0x' || substr(md5(s[i:i+4]), 1, 8))::BIGINT
                for i in range(1, length(s) - 3)]
             ELSE []::BIGINT[] END AS H
      FROM nm
    ),
    sel AS (
      SELECT doc_id, H,
             [i for i in range(1, len(H) + 1)
              if len(H) >= 4
                 and (len([d for d in range(1, least(3, i - 1) + 1)
                           if list_min(H[i-d:i-1]) >= H[i]])
                      + len([d for d in range(1, least(3, len(H) - i) + 1)
                             if list_min(H[i+1:i+d]) > H[i]])) >= 3
                 and i - len([d for d in range(1, least(3, i - 1) + 1)
                              if list_min(H[i-d:i-1]) >= H[i]]) + 3
                     <= len(H)] AS sel
      FROM h
    )
    SELECT doc_id AS id,
           CAST(len(H) AS INTEGER) AS n_positions,
           CAST(len(sel) AS INTEGER) AS n_fps,
           CAST(coalesce(list_sum(list_transform(sel, i -> H[i])), 0)
                AS BIGINT) AS fp_sum
    FROM sel
    """,
    ("LLM-dedup", "LLM-text"),
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 — the MOSS local fingerprinting algorithm): character
    5-gram hashes, window 4, rightmost-minimum selection, realized as
    a position-local run-length predicate so the whole operator is
    array HOFs in one scan-stage projection — zero shuffle, zero UDF
    (operators/winnow.py:winnow_fingerprints, derivation in the
    docstring). The oracle recomputes every hash, replays the same
    local rule through list comprehensions, and checks the exact
    fingerprint SUM per document — one mis-selected position anywhere
    breaks the hash."""
    from etl_script_spark.operators import winnow

    d = t(spark, sf_dir, "documents")
    return winnow.winnow_fingerprints(d, "text", "doc_id", k=5, w=4)


@register(
    "text_novelty_vs_reference",
    f"""
    WITH ws AS (
      SELECT doc_id,
             list_filter(string_split({_NORM}, ' '), w -> w != '') AS ws
      FROM documents
    ),
    dg AS (
      SELECT doc_id, unnest(list_distinct(
               [('0x' || substr(md5(array_to_string(ws[i:i+2], ' ')),
                                1, 8))::BIGINT
                for i in range(1, len(ws) - 1)])) AS g
      FROM ws WHERE len(ws) >= 3
    ),
    ref AS (SELECT DISTINCT g FROM dg WHERE doc_id % 7 = 0),
    per AS (
      SELECT dg.doc_id,
             COUNT(*) AS n_grams,
             CAST(SUM(CASE WHEN r.g IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel
      FROM dg LEFT JOIN ref r ON dg.g = r.g
      GROUP BY 1
    )
    SELECT d.doc_id AS id,
           coalesce(p.n_grams, 0) AS n_grams,
           coalesce(p.n_novel, 0) AS n_novel,
           CASE WHEN coalesce(p.n_grams, 0) = 0 THEN 1000000
                ELSE (p.n_novel * 1000000) // p.n_grams END AS novelty_ppm
    FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
    """,
    ("LLM-curation", "LLM-text"),
)
def text_novelty_vs_reference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty vs a reference corpus (every 7th
    document): the ppm fraction of the doc's distinct word trigrams
    absent from the reference — the freshness signal of incremental
    crawls (a near-zero-novelty doc adds nothing the last snapshot
    didn't have). One distinct-gram aggregation per side + one LEFT
    join on the 8-byte gram hash (gram text never shuffles) + one
    count aggregation; exact integer ppm
    (operators/winnow.py:ngram_novelty). Reference docs score low on
    themselves — the planted truth the oracle pins."""
    from etl_script_spark.operators import winnow

    d = t(spark, sf_dir, "documents")
    return winnow.ngram_novelty(
        d, d.filter(F.col("doc_id") % 7 == 0), "text", "doc_id", n=3
    )


@register(
    "dedup_containment_pairs",
    f"""
    WITH base AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             array_to_string(
               list_filter(string_split({_NORM}, ' '), w -> w != '')[1:12],
               ' ') AS text
      FROM documents WHERE doc_id % 9 = 2
    ),
    ws AS (
      SELECT doc_id,
             list_filter(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
               w -> w != '') AS ws
      FROM base
    ),
    gr AS (
      SELECT doc_id, len(gs) AS n_g, unnest(gs) AS g FROM (
        SELECT doc_id, list_distinct(
                 [('0x' || substr(md5(array_to_string(ws[i:i+2], ' ')),
                                  1, 8))::BIGINT
                  for i in range(1, len(ws) - 1)]) AS gs
        FROM ws WHERE len(ws) >= 3
      )
    )
    SELECT contained_id, container_id, n_grams_a, n_common,
           containment_ppm
    FROM (
      SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
             CAST(any_value(a.n_g) AS INTEGER) AS n_grams_a,
             COUNT(*) AS n_common,
             (COUNT(*) * 1000000) // any_value(a.n_g) AS containment_ppm
      FROM gr a JOIN gr b ON a.g = b.g AND a.doc_id != b.doc_id
      GROUP BY 1, 2
    ) WHERE containment_ppm >= 800000
    """,
    ("LLM-dedup",),
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup detection via EXACT n-gram containment
    (Broder's resemblance-vs-containment distinction): a 12-word
    excerpt doc (planted for every 9th document, id + 1e6) is ~fully
    CONTAINED in its source while its Jaccard is tiny — symmetric
    dedup keeps both, containment flags the subsumed one. Inverted-
    index self-join on 8-byte gram hashes, one pair aggregation,
    exact integer ppm with DIV
    (operators/dedup.py:containment_pairs)."""
    from etl_script_spark.operators import dedup as dd
    from etl_script_spark.operators.dedup import normalize_text

    d = t(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(normalize_text(F.col("text")), " "), lambda w: w != ""
    )
    excerpts = d.filter(F.col("doc_id") % 9 == 2).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.array_join(F.slice(ws, 1, 12), " ").alias("text"),
    )
    base = d.select("doc_id", "text").unionByName(excerpts)
    pairs = dd.containment_pairs(
        base, "text", "doc_id", n=3, threshold_ppm=800000
    )
    # re-home the eager-persisted pair table to a localCheckpoint and
    # release it — a catalog sweep must leave no cache-manager entry
    # (the dedup_minhash_lsh convention; containment_pairs became
    # eager in r10)
    out = pairs.localCheckpoint(eager=True)
    pairs.unpersist()
    return out


@register(
    "dedup_sentences_global",
    f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split({_NORM}, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    sb AS (
      SELECT doc_id,
             array_to_string(
               [array_to_string(ws[(i*12+1):(i*12+12)], ' ')
                for i in range(0, CAST(ceil(len(ws) / 12.0) AS INT))],
               '. ')
             || CASE WHEN doc_id % 3 = 0 THEN
                  '. this site uses cookies to improve your experience'
                ELSE '' END AS stext
      FROM w
    ),
    sents AS (
      SELECT doc_id, idx, p FROM (
        SELECT doc_id,
               unnest([{{'i': i, 'p': lst[i]}}
                       for i in range(1, len(lst) + 1)]) AS u
        FROM (SELECT doc_id,
                     string_split_regex(stext, '[.!?]+\\s*') AS lst
              FROM sb)
      ) t(doc_id, u), LATERAL (SELECT u['i'] AS idx, u['p'] AS p) l
      WHERE trim(p) <> ''
    ),
    kept AS (
      SELECT doc_id, idx, p FROM (
        SELECT doc_id, idx, p,
               ROW_NUMBER() OVER (PARTITION BY p ORDER BY doc_id, idx)
                 AS rn
        FROM sents
      ) WHERE rn = 1
    ),
    tot AS (SELECT doc_id, COUNT(*) AS n_paras FROM sents GROUP BY doc_id),
    reb AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             md5(string_agg(p, '. ' ORDER BY idx)) AS text_md5
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id AS id, t.n_paras,
           COALESCE(r.n_kept, 0) AS n_kept,
           COALESCE(r.text_md5, md5('')) AS text_md5
    FROM tot t LEFT JOIN reb r USING (doc_id)
    """,
    ("LLM-dedup", "LLM-curation"),
)
def dedup_sentences_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact SENTENCE dedup — the C4 line-level rule one
    granularity below paragraphs (operators/dedup.py:dedup_sentences,
    built on the same first-occurrence-wins machinery with a regex
    sentence splitter and a literal rejoin separator). Fixture:
    documents restructured into 12-word sentences with a cookie-banner
    sentence planted on every 3rd doc — the planted truth is that it
    survives exactly once corpus-wide. Same two-keyed-shuffle shape
    as the paragraph form; the 128-bit sentence hash is the only
    corpus-sized shuffle key."""
    from etl_script_spark.operators.dedup import (
        dedup_sentences,
        normalize_text,
    )

    d = t(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(normalize_text(F.col("text")), " "), lambda w: w != ""
    )
    n_s = F.ceil(F.size(ws) / 12.0).cast("int")
    sents = F.when(
        n_s > 0,
        F.transform(
            F.sequence(F.lit(0), n_s - 1),
            lambda i: F.array_join(F.slice(ws, i * 12 + 1, 12), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    stext = F.concat(
        F.array_join(sents, ". "),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.lit(". this site uses cookies to improve your experience"),
        ).otherwise(F.lit("")),
    )
    fixed = d.select("doc_id", stext.alias("stext"))
    out = dedup_sentences(fixed, "stext", "doc_id")
    return out.select(
        "id", "n_paras", "n_kept", F.md5("text").alias("text_md5")
    )


@register(
    "text_script_profile",
    """
    WITH nm AS (
      SELECT doc_id,
             regexp_replace(lower(text), '\\s+', '', 'g') AS s
      FROM documents
    ),
    c AS (
      SELECT doc_id,
             CAST(length(s) AS INTEGER) AS n_chars,
             CAST(length(regexp_replace(s, '[^a-z]', '', 'g')) AS INTEGER)
               AS n_latin,
             CAST(length(regexp_replace(s, '[^0-9]', '', 'g')) AS INTEGER)
               AS n_digit,
             CAST(length(regexp_replace(s, '[^\\x{0400}-\\x{04FF}]', '',
                                        'g')) AS INTEGER) AS n_cyrillic,
             CAST(length(regexp_replace(s, '[^\\x{4E00}-\\x{9FFF}]', '',
                                        'g')) AS INTEGER) AS n_cjk
      FROM nm
    )
    SELECT doc_id, n_chars, n_latin, n_digit, n_cyrillic, n_cjk,
           n_chars - n_latin - n_digit - n_cyrillic - n_cjk AS n_other,
           CASE WHEN n_chars = 0 THEN 'empty'
                WHEN n_latin >= n_cyrillic AND n_latin >= n_cjk
                     AND n_latin >= n_digit
                     AND n_latin >= n_chars - n_latin - n_digit
                                    - n_cyrillic - n_cjk THEN 'latin'
                WHEN n_cyrillic >= n_cjk AND n_cyrillic >= n_digit
                     AND n_cyrillic >= n_chars - n_latin - n_digit
                                       - n_cyrillic - n_cjk
                  THEN 'cyrillic'
                WHEN n_cjk >= n_digit
                     AND n_cjk >= n_chars - n_latin - n_digit
                                  - n_cyrillic - n_cjk THEN 'cjk'
                WHEN n_digit >= n_chars - n_latin - n_digit
                                - n_cyrillic - n_cjk THEN 'digit'
                ELSE 'other' END AS dominant
    FROM c
    """,
    ("LLM-text",),
)
def text_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document writing-script composition (explicit code-point
    ranges — engine-portable where \\p{{}} class names are not):
    basic-Latin / digit / Cyrillic / CJK / other counts and the
    dominant script with a fixed deterministic tie order. The routing
    signal for script-aware pipelines (word shingles vs char
    shingles) and a mojibake detector (high 'other'). Pure scan-stage
    Column expressions (operators/textstats.py:script_profile)."""
    d = t(spark, sf_dir, "documents")
    p = textstats.script_profile(F.col("text"))
    names = [
        "n_chars", "n_latin", "n_digit", "n_cyrillic", "n_cjk", "n_other",
        "dominant",
    ]
    return d.select(
        "doc_id", *[c.cast("int").alias(n) if n != "dominant" else c.alias(n)
                    for c, n in zip(p, names)]
    )


@register(
    "tok_fertility_stats",
    f"""
    WITH per AS (
      SELECT source,
             len(list_filter(string_split({_NORM}, ' '), w -> w != ''))
               AS n_w,
             CAST(list_sum(list_prepend(CAST(0 AS BIGINT), list_transform(
                   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                               w -> w != ''),
                   w -> greatest(CAST(ceil(length(w) / 4.0) AS BIGINT), 1))))
               AS BIGINT) AS n_t,
             length(regexp_replace(lower(text), '\\s+', '', 'g')) AS n_c
      FROM documents
    )
    SELECT source AS "group",
           COUNT(*) AS n_docs,
           CAST(SUM(n_w) AS BIGINT) AS n_words,
           CAST(SUM(n_t) AS BIGINT) AS n_tokens,
           CAST(SUM(n_c) AS BIGINT) AS n_chars,
           (CAST(SUM(n_t) AS BIGINT) * 1000000)
             // greatest(CAST(SUM(n_w) AS BIGINT), 1) AS fertility_ppm,
           (CAST(SUM(n_c) AS BIGINT) * 1000000)
             // greatest(CAST(SUM(n_t) AS BIGINT), 1)
             AS chars_per_token_ppm
    FROM per GROUP BY source
    """,
    ("LLM-text", "governance"),
)
def tok_fertility_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source tokenizer fertility: subword tokens per whitespace
    word and characters per token, in exact integer ppm — the metric
    that catches a domain whose tokenization silently multiplies its
    training cost (operators/textstats.py:tokenizer_fertility). One
    map-side-combinable aggregation; shuffle carries one row per
    source."""
    d = t(spark, sf_dir, "documents")
    return textstats.tokenizer_fertility(d, "text", "source")


@register(
    "dedup_jaccard_prefix_filter",
    f"""
    WITH sh AS (
      SELECT doc_id, unnest({_SHINGLES}) AS shingle, len({_SHINGLES}) AS n_sh
      FROM documents
    )
    SELECT id_a, id_b, jaccard_ppm FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             (COUNT(*) * 1000000)
               // (any_value(a.n_sh) + any_value(b.n_sh) - COUNT(*))
               AS jaccard_ppm
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ) WHERE jaccard_ppm >= 500000
    """,
    ("LLM-dedup",),
)
def dedup_jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT all-pairs Jaccard >= 0.5 via PPJoin-style prefix
    filtering (operators/dedup.py:jaccard_pairs_prefix_filtered;
    Chaudhuri ICDE'06 / Bayardo WWW'07): candidates come only from
    each document's |A|-ceil(t|A|)+1 globally-RAREST shingles under
    the (df, hash) total order — a stop-word shingle indexes nobody —
    and candidates verify exactly via array_intersect on the carried
    hash arrays. The ORACLE is the naive every-shingle inverted join:
    identical output is the whole claim (same pairs, same exact ppm
    values), with the candidate volume collapsed. The exact-form
    complement of dedup_minhash_lsh's approximate candidate
    generation."""
    from etl_script_spark.operators import dedup as dd

    d = t(spark, sf_dir, "documents")
    return dd.jaccard_pairs_prefix_filtered(
        d, "text", "doc_id", threshold_ppm=500000, shingle_n=3
    )


@register(
    "ann_maxsim_topk",
    """
    WITH v AS (
      SELECT vec_id // 5 AS did, vec_id % 5 AS vidx,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings
    ),
    q AS (SELECT did AS qid, vidx AS qv, vec AS qvec FROM v WHERE did < 4),
    pm AS (
      SELECT q.qid, q.qv, v.did,
             MAX(list_dot_product(v.vec, q.qvec)
                 / (sqrt(list_dot_product(v.vec, v.vec))
                    * sqrt(list_dot_product(q.qvec, q.qvec)))) AS mx
      FROM v CROSS JOIN q GROUP BY 1, 2, 3
    ),
    sc AS (
      SELECT qid, did,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE), list(mx ORDER BY qv)),
               (a, x) -> a + x) AS maxsim
      FROM pm GROUP BY qid, did
    )
    SELECT query_id, doc_id, maxsim, rank FROM (
      SELECT qid AS query_id, did AS doc_id, maxsim,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY maxsim DESC, did)
                  AS INTEGER) AS rank
      FROM sc
    ) WHERE rank <= 3
    """,
    ("LLM-similarity",),
)
def ann_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction multi-vector retrieval (ColBERT MaxSim,
    SIGIR 2020; operators/similarity.py:maxsim_topk): documents are
    5-vector groups of the embeddings table (vec_id DIV 5), queries
    the first 4 such groups; score = sum over query vectors of the
    max cosine against any document vector, summed in qvec order
    from an ordered collect (float addition does not commute — a
    plain SUM(double) drifts across partition orders and engines).
    Queries broadcast, the corpus side never shuffles for the join;
    this is the rerank stage an IVF/IVF-PQ candidate set feeds at
    100 TB (candidates = corpus at fixture scale)."""
    from etl_script_spark.operators import similarity

    e = t(spark, sf_dir, "embeddings")
    mv = e.select(
        F.expr("vec_id DIV 5").alias("doc_id"),
        (F.col("vec_id") % 5).alias("vec_idx"),
        "embedding",
    )
    qv = mv.filter(F.col("doc_id") < 4).select(
        F.col("doc_id").alias("query_id"), "vec_idx", "embedding"
    )
    return similarity.maxsim_topk(mv, qv, k=3)


from etl_script_spark.operators import wordpiece as wp_ops  # noqa: E402


@register(
    "tok_wordpiece_roundtrip",
    wp_ops.wordpiece_oracle_sql(_NORM),
    ("LLM-tokenize",),
)
def tok_wordpiece_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece greedy longest-match-first tokenization end-to-end
    (operators/wordpiece.py): word-initial vs continuation piece sets
    (the ## distinction), [UNK] on unmatchable or over-long words,
    zero Python in the hot path — the greedy scan is an unrolled
    F.aggregate evaluated on the DISTINCT-WORD relation only (the
    vocabulary-bounded amortization all tokenizers here share), the
    oracle a recursive CTE replaying the identical scan from the same
    piece constants. n_chars rederives from CONSUMED piece lengths on
    the Spark side but raw text on the oracle side, so over/under-
    consumption breaks the hash; single-character coverage makes
    alphanumeric words always tokenizable, punctuation exercises
    [UNK]."""
    d = t(spark, sf_dir, "documents")
    return wp_ops.tokenize_wordpiece(d, "text", "doc_id")


@register(
    "dedup_continuation_pairs",
    f"""
    WITH d0 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0
                  THEN text || ' cont seg ' || CAST(doc_id AS VARCHAR)
                       || ' alpha beta'
                  WHEN doc_id % 10 = 1
                  THEN 'cont seg ' || CAST(doc_id - 1 AS VARCHAR)
                       || ' alpha beta ' || text
                  ELSE text END AS text
      FROM documents
    ),
    b AS (
      SELECT doc_id,
             list_filter(string_split({_NORM}, ' '), w -> w <> '') AS ws
      FROM d0
    ),
    e AS (SELECT doc_id, ws FROM b WHERE len(ws) >= 5),
    tails AS (
      SELECT doc_id AS prev_id,
             array_to_string(list_slice(ws, len(ws) - 4, len(ws)), ' ')
               AS gram
      FROM e
    ),
    heads AS (
      SELECT doc_id AS next_id,
             array_to_string(list_slice(ws, 1, 5), ' ') AS gram
      FROM e
    ),
    tc AS (SELECT prev_id, gram FROM (
             SELECT prev_id, gram,
                    COUNT(*) OVER (PARTITION BY gram) AS c
             FROM tails) WHERE c <= 100),
    hc AS (SELECT next_id, gram FROM (
             SELECT next_id, gram,
                    COUNT(*) OVER (PARTITION BY gram) AS c
             FROM heads) WHERE c <= 100)
    SELECT prev_id, next_id, tc.gram
    FROM tc JOIN hc USING (gram)
    WHERE prev_id <> next_id
    """,
    ("LLM-dedup",),
)
def dedup_continuation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix→prefix continuation detection
    (dedup.continuation_pairs): every doc_id≡0 (mod 10) document gets
    a unique 5-word marker appended, the following id gets the same
    marker prepended — the scraped-pagination boundary — and the
    operator must recover exactly those directed pairs from the
    tail-gram→head-gram equi-join, with boilerplate grams df-capped
    on both sides before the join (the quadratic guard, replayed by
    the oracle)."""
    from etl_script_spark.operators import dedup as ddp

    d = t(spark, sf_dir, "documents")
    marker_app = F.concat(
        F.col("text"), F.lit(" cont seg "),
        F.col("doc_id").cast("string"), F.lit(" alpha beta"),
    )
    marker_pre = F.concat(
        F.lit("cont seg "), (F.col("doc_id") - 1).cast("string"),
        F.lit(" alpha beta "), F.col("text"),
    )
    d0 = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 0, marker_app)
        .when(F.col("doc_id") % 10 == 1, marker_pre)
        .otherwise(F.col("text")).alias("text"),
    )
    return ddp.continuation_pairs(d0, "text", "doc_id", k=5, df_cap=100)


@register(
    "search_rrf_fusion",
    """
    WITH toks AS (
      SELECT doc_id, token FROM (
        SELECT doc_id,
               unnest(string_split(trim(regexp_replace(lower(text),
                 '\\s+', ' ', 'g')), ' ')) AS token
        FROM documents
      ) WHERE token <> ''
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    corpus AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_tokens FROM dl),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM toks
      WHERE token IN ('join','window','hash') GROUP BY 1, 2
    ),
    dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
    term AS (
      SELECT tf.doc_id,
             CAST(ROUND(
               ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               * (tf * 2.2 / (tf + 1.2 * (1.0 - 0.75
                    + 0.75 * dl / (CAST(total_tokens AS DOUBLE) / n_docs))))
               * 1000000.0) AS BIGINT) AS ts_q
      FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id)
      CROSS JOIN corpus
    ),
    lex AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY SUM(ts_q) DESC, doc_id)
                  AS BIGINT) AS rank,
             doc_id AS id
      FROM term GROUP BY doc_id
      ORDER BY SUM(ts_q) DESC, doc_id LIMIT 20
    ),
    v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
               AS vec
      FROM embeddings
    ),
    q AS (SELECT vec AS qvec FROM v WHERE vec_id = 0),
    sem AS (
      SELECT CAST(rn AS BIGINT) AS rank, vec_id AS id FROM (
        SELECT v.vec_id,
               ROW_NUMBER() OVER (
                 ORDER BY list_dot_product(v.vec, q.qvec)
                   / (sqrt(list_dot_product(v.vec, v.vec))
                      * sqrt(list_dot_product(q.qvec, q.qvec))) DESC,
                 v.vec_id) AS rn
        FROM v CROSS JOIN q
      ) WHERE rn <= 20
    ),
    u AS (
      SELECT id, rank, 'lex' AS src FROM lex
      UNION ALL SELECT id, rank, 'sem' FROM sem
    ),
    fused AS (
      SELECT id,
             CAST(SUM(1000000 // (60 + rank)) AS BIGINT) AS rrf_ppm,
             CAST(COUNT(DISTINCT src) AS BIGINT) AS n_lists
      FROM u GROUP BY id
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf_ppm DESC, id) AS BIGINT)
             AS rank,
           id, rrf_ppm, n_lists
    FROM fused ORDER BY rrf_ppm DESC, id LIMIT 10
    """,
    ("LLM-search", "LLM-similarity"),
)
def search_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-20 for {join, window, hash} fused
    with the cosine top-20 for query vector 0 by reciprocal-rank
    fusion (search.rrf_fuse — Cormack et al. 2009). Fusion consumes
    RANKS only, in exact integer ppm, so no score calibration exists
    to drift between engines; the doc/vec id spaces coincide in the
    fixture, standing in for a joined lexical+semantic index. The
    expensive retrievers keep their documented shapes; fusion is one
    tiny union + aggregation."""
    from etl_script_spark.operators import search, similarity
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    lex = search.bm25_topk(
        d, "text", "doc_id", ["join", "window", "hash"], k=20
    ).select("rank", "id")
    e = t(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    cos = similarity.brute_force_topk(e, qv, k=20, dim=64)
    w = Window.orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
    sem = cos.select(
        F.row_number().over(w).alias("rank"),
        F.col("vec_id").alias("id"),
    )
    return search.rrf_fuse([(lex, "lex"), (sem, "sem")], k=10, c=60)


@register(
    "search_autocomplete",
    """
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS word
      FROM documents
    ),
    vocab AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM toks WHERE length(word) >= 3
      GROUP BY 1 HAVING COUNT(*) >= 3
    ),
    r AS (
      SELECT substr(word, 1, 3) AS prefix, word, cnt,
             ROW_NUMBER() OVER (
               PARTITION BY substr(word, 1, 3)
               ORDER BY cnt DESC, word) AS rank
      FROM vocab
    )
    SELECT prefix, word, cnt, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 5
    """,
    ("X-search",),
)
def search_autocomplete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typeahead autocomplete index (search.autocomplete_prefix_topk):
    top-5 completions by corpus frequency for every 3-char prefix,
    ties lexicographic. One map-side-combined token aggregation (the
    shuffle carries the vocabulary, not the token stream) + one window
    over the vocabulary-sized prefix table."""
    from etl_script_spark.operators import search

    d = t(spark, sf_dir, "documents")
    return search.autocomplete_prefix_topk(
        d, "text", prefix_len=3, k=5, min_count=3
    )


def _kcenter_oracle(k: int) -> str:
    """Unrolled greedy k-center SQL: stage i carries the running
    min-distance chain e_i = LEAST(e_{i-1}, d2(v, c_{i-1})) and picks
    c_i = argmax — the same LEAST nesting and the same 3-dot d2
    decomposition (v·v − 2 v·c + c·c, sequential folds) as the Spark
    operator, so doubles are bitwise-identical."""
    parts = [
        "v AS (SELECT vec_id, list_transform(embedding,"
        " x -> CAST(x AS DOUBLE)) AS vec FROM embeddings)",
        "c0 AS (SELECT vec_id, vec FROM v ORDER BY vec_id LIMIT 1)",
    ]
    prev = None
    for i in range(1, k):
        d_i = (
            "(list_dot_product(vec, vec)"
            f" - 2.0 * list_dot_product(vec, (SELECT vec FROM c{i - 1}))"
            f" + (SELECT list_dot_product(vec, vec) FROM c{i - 1}))"
        )
        e_expr = d_i if prev is None else f"LEAST(e, {d_i})"
        src = "v" if prev is None else prev
        parts.append(
            f"e{i} AS (SELECT vec_id, vec, {e_expr} AS e FROM {src})"
        )
        parts.append(
            f"c{i} AS (SELECT vec_id, vec, e FROM e{i}"
            " ORDER BY e DESC, vec_id LIMIT 1)"
        )
        prev = f"e{i}"
    sel = [
        "SELECT 0 AS sel_order, vec_id,"
        " CAST(NULL AS BIGINT) AS d2_ppb FROM c0"
    ]
    for i in range(1, k):
        sel.append(
            f"SELECT {i} AS sel_order, vec_id,"
            " CAST(FLOOR(e * 1000000000 + 0.5) AS BIGINT) AS d2_ppb"
            f" FROM c{i}"
        )
    return "WITH " + ",\n".join(parts) + "\n" + " UNION ALL ".join(sel)


@register(
    "sim_kcenter_coreset",
    _kcenter_oracle(5),
    ("LLM-similarity", "X-curation"),
)
def sim_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset over the embedding corpus
    (similarity.kcenter_coreset, Gonzalez 2-approx farthest-point):
    5 maximally-diverse vectors for balanced eval sets / cluster
    seeding. Each round is one scan + TakeOrdered(1); only the
    selected vectors reach the driver; squared distances decompose
    into sequential-fold dots, so the argmax is bitwise-stable across
    engines. d2_ppb is the ppb-quantized coverage-radius curve."""
    from etl_script_spark.operators import similarity

    e = t(spark, sf_dir, "embeddings")
    return similarity.kcenter_coreset(e, "vec_id", "embedding", k=5)


@register(
    "ann_mutual_knn",
    f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings
    ),
    b AS (
      SELECT vec_id, vec, {_bucket_sql('vec', _PLANES6)} AS bucket FROM v
    ),
    knn AS (
      SELECT q.vec_id AS q, c.vec_id AS n,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_COS.format(a='c.vec', b='q.vec')} DESC,
               c.vec_id) AS rn
      FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
    ),
    e AS (SELECT q, n FROM knn WHERE rn <= 5)
    SELECT a.q AS id_a, a.n AS id_b
    FROM e a JOIN e b2 ON a.q = b2.n AND a.n = b2.q
    WHERE a.q < a.n
    """,
    ("LLM-similarity", "LLM-dedup"),
)
def ann_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-kNN pairs over the embedding corpus
    (similarity.mutual_knn_pairs): (a, b) kept only when each is in
    the OTHER's top-5 among its LSH-bucket candidates — the
    mutual-agreement refinement that kills one-directional kNN's hub
    false positives (the re-ID / image-dedup standard). The neighbor
    list comes from the 6-plane LSH bucketing (compare count divided
    by ~2^6 — never all-pairs; both engines replay the identical
    hyperplanes), and the mutual stage is one semi-join of the
    n·k-row list on the swapped key pair."""
    from pyspark.sql import Window

    from etl_script_spark.operators import similarity

    e = t(spark, sf_dir, "embeddings")
    planes = _PLANES6
    b = e.withColumn(
        "__bucket", similarity.lsh_bucket("embedding", planes)
    ).withColumn("__n", similarity.l2_norm(F.col("embedding")))
    q = b.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("__bucket"),
        F.col("__n").alias("__qn"),
    )
    # bucket equi-join: both sides are the full corpus, so it must
    # SHUFFLE on __bucket — broadcasting q would ship every vector to
    # every executor and OOM at corpus scale.
    cand = b.join(q, "__bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        (
            similarity.dot(F.col("embedding"), F.col("qvec"))
            / (F.col("__n") * F.col("__qn"))
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    top5 = scored.withColumn("__r", F.row_number().over(w)).filter(
        F.col("__r") <= 5
    )
    return similarity.mutual_knn_pairs(top5, "query_id", "vec_id")


@register(
    "text_char_entropy",
    """
    WITH hist AS (
      SELECT doc_id AS id, ch, CAST(COUNT(*) AS HUGEINT) AS c
      FROM (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ''), x -> x != ''))
                 AS ch
        FROM documents
      ) GROUP BY 1, 2
    ),
    per AS (
      SELECT id, SUM(c) AS n,
             SUM(c * CAST(ROUND(log2(CAST(c AS DOUBLE)) * 1000000)
                          AS HUGEINT)) AS t_micro
      FROM hist GROUP BY id
    ),
    out AS (
      SELECT id, n,
             (CAST(ROUND(log2(CAST(n AS DOUBLE)) * 1000000) AS HUGEINT)
              - t_micro // n) AS h_micro
      FROM per
    )
    SELECT d.doc_id AS id,
           CAST(COALESCE(n, 0) AS BIGINT) AS n_chars,
           CAST(COALESCE(h_micro // 1000, 0) AS BIGINT) AS entropy_mbits
    FROM documents d LEFT JOIN out ON d.doc_id = out.id
    """,
    ("LLM-text",),
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon character entropy in milli-bits
    (textstats.char_entropy): the compressibility quality signal —
    near-zero = repeated filler, implausibly high = binary junk.
    One char-histogram aggregation + one per-doc fold; the per-term
    log2 is the single float boundary, quantized to micro
    immediately (the repo's ln()/ratio policy), so both engines fold
    identical integers."""
    d = t(spark, sf_dir, "documents")
    return textstats.char_entropy(d, "text", "doc_id")


@register(
    "corpus_js_divergence",
    f"""
    WITH toks AS (
      SELECT unnest(list_filter({_WS}, w -> w != '')) AS tok,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS p
      FROM documents
    ),
    hist AS (
      SELECT tok, CAST(SUM(p) AS HUGEINT) AS cp,
             CAST(SUM(1 - p) AS HUGEINT) AS cq
      FROM toks GROUP BY tok
    ),
    tot AS (
      SELECT SUM(cp) AS np, SUM(cq) AS nq,
             CAST(COUNT(*) AS BIGINT) AS vocab
      FROM hist
    ),
    staged AS (
      SELECT cp, cq, np, nq, vocab,
             CAST(ROUND(ln(CAST(2 * cp * nq AS DOUBLE)
                           / CAST(cp * nq + cq * np AS DOUBLE)) * 1e9)
                  AS HUGEINT) AS lp,
             CAST(ROUND(ln(CAST(2 * cq * np AS DOUBLE)
                           / CAST(cp * nq + cq * np AS DOUBLE)) * 1e9)
                  AS HUGEINT) AS lq
      FROM hist CROSS JOIN tot
    ),
    folded AS (
      SELECT np, nq, vocab,
             SUM(CASE WHEN cp > 0 THEN cp * lp ELSE 0 END) AS a,
             SUM(CASE WHEN cq > 0 THEN cq * lq ELSE 0 END) AS b
      FROM staged GROUP BY 1, 2, 3
    )
    SELECT CAST(np AS BIGINT) AS n_p, CAST(nq AS BIGINT) AS n_q, vocab,
           CAST(a // (2 * np) + b // (2 * nq) AS BIGINT) AS js_nano
    FROM folded
    """,
    ("LLM-corpus",),
)
def corpus_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between the English and non-English
    token distributions (textstats.js_divergence_tokens) — the
    bounded symmetric drift measure that handles one-sided tokens
    without PSI's infinities. One vocabulary-keyed histogram carrying
    both sides' counts; per-token ln quantized to nano, folds exact.
    The corpus-vs-corpus comparison a mixture rebalance reads."""
    d = t(spark, sf_dir, "documents")
    return textstats.js_divergence_tokens(
        d, "text", F.col("lang") == "en"
    )


@register(
    "search_snippet_window",
    f"""
    WITH hits AS (
      SELECT doc_id AS id, pos
      FROM (
        SELECT doc_id, unnest(ws) AS tok,
               unnest(range(0, len(ws))) AS pos
        FROM (SELECT doc_id, {_WS} AS ws FROM documents)
      ) WHERE tok IN ('table', 'value')
    ),
    scored AS (
      SELECT id, pos,
             COUNT(*) OVER (PARTITION BY id ORDER BY pos
                            RANGE BETWEEN CURRENT ROW
                            AND 9 FOLLOWING) AS n_hits
      FROM hits
    )
    SELECT id, CAST(pos AS BIGINT) AS start_pos,
           CAST(n_hits AS BIGINT) AS n_hits
    FROM (
      SELECT id, pos, n_hits,
             ROW_NUMBER() OVER (PARTITION BY id
                                ORDER BY n_hits DESC, pos ASC) AS r
      FROM scored
    ) WHERE r = 1
    """,
    ("LLM-search",),
)
def search_snippet_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-snippet selection (search.snippet_best_window): per
    matching document, the 10-token window with the most query-term
    hits for the query {{table, value}} — the excerpt picker a search
    result page (or a RAG context selector) runs after retrieval.
    The corpus shrinks to hit positions before any window; one
    range-frame density count + one argmax, both partitioned by doc."""
    from etl_script_spark.operators import search

    d = t(spark, sf_dir, "documents")
    out = search.snippet_best_window(
        d, "text", "doc_id", ["table", "value"], window_tokens=10
    )
    return out.select(
        "id", F.col("start_pos").cast("long").alias("start_pos"), "n_hits"
    )


@register(
    "dedup_pair_sim_histogram",
    f"""
    WITH sh AS (
      SELECT doc_id, unnest({_SHINGLES}) AS shingle, len({_SHINGLES}) AS n_sh
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             (COUNT(*) * 1000000)
               // (any_value(a.n_sh) + any_value(b.n_sh) - COUNT(*))
               AS jaccard_ppm
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT CAST(jaccard_ppm // 100000 AS INT) AS sim_decile,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs WHERE jaccard_ppm >= 300000
    GROUP BY 1
    """,
    ("LLM-dedup",),
)
def dedup_pair_sim_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-pair similarity histogram for dedup threshold tuning
    (dedup.jaccard_pairs_prefix_filtered at 0.3 + one decile rollup):
    where does the pair-similarity mass sit? A bimodal histogram says
    0.5 is safe; mass piling at the threshold says candidates are
    being cut mid-cluster. Same lossless prefix-filter candidate
    generation as dedup_jaccard_prefix_filter — never all-pairs —
    with the verified exact ppm folded to ≤10 rows."""
    from etl_script_spark.operators import dedup as dd

    d = t(spark, sf_dir, "documents")
    pairs = dd.jaccard_pairs_prefix_filtered(
        d, "text", "doc_id", threshold_ppm=300000, shingle_n=3
    )
    return pairs.groupBy(
        F.expr("CAST(jaccard_ppm DIV 100000 AS INT)").alias("sim_decile")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))


@register(
    "search_symspell_suggest",
    f"""
    WITH vocab AS (
      SELECT tok AS c, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(list_filter({_WS}, w -> w != '')) AS tok
            FROM documents)
      GROUP BY tok
    ),
    vk AS (
      SELECT c, cnt, unnest(list_distinct(list_append(
               [substr(c, 1, i - 1) || substr(c, i + 1)
                for i in range(1, len(c) + 1)], c))) AS key
      FROM vocab
    ),
    qs AS (SELECT * FROM (VALUES ('tabl'), ('valu'), ('sparkk'),
                                 ('windw'), ('zzzq')) t(q)),
    qk AS (
      SELECT q, unnest(list_distinct(list_append(
               [substr(q, 1, i - 1) || substr(q, i + 1)
                for i in range(1, len(q) + 1)], q))) AS key
      FROM qs
    ),
    cand AS (
      SELECT DISTINCT q, c, cnt
      FROM qk JOIN vk USING (key)
      WHERE levenshtein(q, c) <= 1
    )
    SELECT q, suggestion, cnt, rank FROM (
      SELECT q, c AS suggestion, cnt,
             CAST(ROW_NUMBER() OVER (PARTITION BY q
                                     ORDER BY cnt DESC, c ASC) AS INT)
               AS rank
      FROM cand
    ) WHERE rank <= 3
    """,
    ("LLM-search",),
)
def search_symspell_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 spelling suggestions over the corpus
    vocabulary (search.symspell_suggest; SymSpell deletion-variant
    indexing): candidates come from an EQUI-JOIN on single-deletion
    keys — vocabulary-bounded fan-out, never a fuzzy scan — verified
    exactly by the built-in levenshtein and ranked by corpus
    frequency. The query-correction front end an autocomplete or
    search box runs; five fixture queries, one guaranteed miss."""
    from etl_script_spark.operators import search, textstats

    d = t(spark, sf_dir, "documents")
    vocab = (
        d.select(
            F.explode(
                F.filter(textstats.words(F.col("text")), lambda w: w != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    qs = spark.createDataFrame(
        [("tabl",), ("valu",), ("sparkk",), ("windw",), ("zzzq",)],
        "q string",
    )
    return search.symspell_suggest(vocab, qs, "word", "cnt", "q", k=3)


@register(
    "curation_pack_efficiency",
    f"""
    WITH base AS (
      SELECT doc_id AS id,
             CAST(len(list_filter({_WS}, w -> w != '')) AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    banded AS (
      SELECT id, n_tokens,
             CAST(length(to_base(n_tokens, 2)) - 1 AS INT) AS band
      FROM base WHERE n_tokens > 0
    ),
    packed AS (
      SELECT id, n_tokens, band,
             SUM(n_tokens) OVER (
               PARTITION BY band
               ORDER BY md5('bb' || CAST(id AS VARCHAR)) ASC, id ASC
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM banded
    ),
    batches AS (
      SELECT band,
             (CAST(cum AS HUGEINT) - n_tokens) // 500 AS batch_id,
             SUM(n_tokens) AS toks,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM packed GROUP BY 1, 2
    )
    SELECT CAST(LEAST((toks * 10) // 500, 10) AS INT) AS fill_decile,
           CAST(COUNT(*) AS BIGINT) AS n_batches,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS n_tokens
    FROM batches GROUP BY 1
    """,
    ("LLM-curation",),
)
def curation_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack-efficiency report over the token-budget batch plan
    (textstats.batch_by_token_budget + one rollup): per fill-decile
    (batch tokens ÷ budget), how many batches/docs/tokens — the
    padding-waste readout that says whether the band structure is
    actually packing near the budget or leaving stragglers. One
    (band, batch) aggregation over the planner's output, then a
    ≤11-row histogram."""
    from etl_script_spark.operators.textstats import (
        batch_by_token_budget, token_count_ws_nonempty,
    )

    d = t(spark, sf_dir, "documents")
    base = d.select(
        F.col("doc_id").alias("id"),
        token_count_ws_nonempty(F.col("text")).cast("long").alias("n_tok"),
    )
    plan = batch_by_token_budget(base, "id", "n_tok", budget=500)
    batches = plan.groupBy("band", "batch_id").agg(
        F.sum("n_tokens").alias("toks"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    return batches.groupBy(
        F.least(
            F.expr("(toks * 10) DIV 500"), F.lit(10)
        ).cast("int").alias("fill_decile")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_batches"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("n_tokens"),
    )


@register(
    "corpus_burstiness",
    f"""
    WITH per_doc AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (
        SELECT doc_id,
               unnest(list_filter({_WS}, w -> w != '')) AS tok
        FROM documents
      ) GROUP BY 1, 2
    ),
    per_tok AS (
      SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(c) AS BIGINT) AS total,
             SUM(CAST(c AS HUGEINT) * c) AS q
      FROM per_doc GROUP BY 1
    )
    SELECT token, n_docs, total,
           CAST(((CAST(n_docs AS HUGEINT) * q
                  - CAST(total AS HUGEINT) * total) * 1000000)
                // (CAST(n_docs AS HUGEINT) * total) AS BIGINT)
             AS fano_ppm
    FROM per_tok WHERE n_docs >= 5
    ORDER BY fano_ppm DESC, token ASC
    LIMIT 50
    """,
    ("LLM-text",),
)
def corpus_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token burstiness by the Fano factor (corpusstats.
    burstiness_fano): variance-to-mean of per-document counts over
    containing docs — content words clump (F >> 1), function words
    scatter Poisson-like (F ~ 1). Exact integers to one ppm DIV;
    top-50 deterministic TakeOrdered."""
    from etl_script_spark.operators import corpusstats

    d = t(spark, sf_dir, "documents")
    return corpusstats.burstiness_fano(
        d, "text", "doc_id", min_docs=5, k=50
    )


@register(
    "text_oov_rate",
    f"""
    WITH vocab AS (
      SELECT tok FROM (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
        FROM (
          SELECT unnest(list_filter({_WS}, w -> w != '')) AS tok
          FROM documents WHERE lang = 'en'
        ) GROUP BY 1
      ) QUALIFY ROW_NUMBER() OVER (ORDER BY c DESC, tok ASC) <= 2000
    ),
    toks AS (
      SELECT d.doc_id AS id, tok,
             CASE WHEN v.tok IS NOT NULL THEN 0 ELSE 1 END AS miss
      FROM (
        SELECT doc_id,
               unnest(list_filter({_WS}, w -> w != '')) AS tok
        FROM documents
      ) d LEFT JOIN vocab v USING (tok)
    ),
    per AS (
      SELECT id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(miss) AS BIGINT) AS n_oov
      FROM toks GROUP BY id
    )
    SELECT d.doc_id AS id,
           COALESCE(n_tokens, 0) AS n_tokens,
           COALESCE(n_oov, 0) AS n_oov,
           CAST((COALESCE(n_oov, 0) * 1000000)
                // NULLIF(COALESCE(n_tokens, 0), 0) AS BIGINT) AS oov_ppm
    FROM documents d LEFT JOIN per ON d.doc_id = per.id
    """,
    ("LLM-text",),
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document OOV rate against the top-2000 'en' reference
    vocabulary (textstats.oov_rate): the domain-shift / junk signal
    before committing a corpus to training. Vocabulary bounded by
    construction and broadcast; token-less docs report NULL (the
    empty doc isn't 'all in-vocab')."""
    from etl_script_spark.operators import textstats

    d = t(spark, sf_dir, "documents")
    counts = (
        d.filter(F.col("lang") == "en")
        .select(
            F.explode(textstats.words(F.col("text"))).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    # top-2000 via orderBy+limit = TakeOrdered (never a global sort;
    # the vocabulary can be millions of distinct tokens at corpus
    # scale, the cut stays a bounded heap per partition)
    vocab = (
        counts.orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(2000)
        .select(F.col("tok").alias("token"))
    )
    return textstats.oov_rate(d, "text", "doc_id", vocab, "token")


@register(
    "corpus_chao1",
    f"""
    WITH counts AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (
        SELECT unnest(list_filter({_WS}, w -> w != '')) AS tok
        FROM documents
      ) GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS v_obs,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
           CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
           CAST(COUNT(*)
                + (CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                        AS HUGEINT)
                   * (SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) - 1))
                  // (2 * (SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) + 1))
                AS BIGINT) AS chao1
    FROM counts
    """,
    ("LLM-text",),
)
def corpus_chao1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 vocabulary-richness estimate (corpusstats.chao1_richness)
    over the documents corpus: observed types plus the bias-corrected
    singleton/doubleton extrapolation — the lexical-saturation
    diagnostic next to corpus heaps_curve. Token histogram to a
    frequency-of-frequencies fold; exact integers, one DIV."""
    from etl_script_spark.operators import corpusstats

    return corpusstats.chao1_richness(
        t(spark, sf_dir, "documents"), "text"
    )
