"""Keyword search scoring (BM25) over the documents corpus.

Lucene-style Okapi BM25 as pure DataFrame algebra — the ranking
backbone of corpus exploration ("find the training docs about X")
and of retrieval-based decontamination. No reference analogue (the
reference has no search surface); this is LLM-pipeline widening.

Shape at scale:

- doc lengths and the corpus aggregate (N, avgdl) are one
  map-side-combined pass each;
- term statistics are computed ONLY for the query's terms — the
  token explode is filtered to the query set BEFORE any aggregation,
  so per-query cost tracks matches, not corpus vocabulary;
- the df table is ≤|query| rows → broadcast; the per-(doc, term)
  tf join never shuffles the corpus.

Determinism (oracle-grade): tf, df, dl, N are integers; avgdl is one
exact integer division; the per-term score is the same IEEE double
expression on both engines and is quantized to 1e-6 BEFORE the
per-document sum (round(x·1e6) → int64) — integer addition is
order-independent across partitionings, the same policy as
``unigram_nll_scores``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_script_spark.operators.partitioning import fan_out
from etl_script_spark.operators.textstats import words


def bm25_scores(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 score against a bag of query terms.
    Returns (id, n_terms_matched, score_q, score) for documents
    matching ≥1 term; ``score_q`` is the quantized int64 the ranking
    sorts on (ties broken by id), ``score`` its 1e-6 double form.

    idf = ln((N − df + 0.5)/(df + 0.5) + 1) — Lucene's non-negative
    variant, so a term in >half the corpus contributes ~0 instead of
    a negative score.
    """
    toks = fan_out(docs.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(words(F.col(text_col)), lambda w: w != "")
        ).alias("token"),
    )
    dl = toks.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
    )
    qtoks = toks.filter(F.col("token").isin(query_terms))
    tf = qtoks.groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("total_tokens").cast("double") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term_score = idf * (
        F.col("tf") * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    )
    # dfreq (≤|query_terms| rows) and corpus (1 row) are broadcast by
    # construction; the dl join is hinted MERGE because the static
    # size estimate for dl (aggregate over an explode) is garbage —
    # verified: unhinted, the planner still picks BroadcastHashJoin
    # with the |corpus|-row dl side as build at a 1M-doc input (the
    # round-6 tfidf maxResultSize abort class)
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(dl.hint("merge"), "id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "id",
            "token",
            F.round(term_score * 1e6).cast("long").alias("ts_q"),
        )
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_terms_matched"),
        F.sum("ts_q").alias("score_q"),
        (F.sum("ts_q") / 1e6).alias("score"),
    )


def bm25_topk(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k: int,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25: global orderBy on the quantized score
    (desc, id asc tiebreak) + limit — Spark plans this as TakeOrdered
    (per-partition top-k, then a k-row driver merge), no full sort.
    Returns (rank, id, n_terms_matched, score)."""
    from pyspark.sql import Window

    scored = bm25_scores(docs, text_col, id_col, query_terms, k1, b)
    # limit FIRST (planned as TakeOrdered: per-partition top-k + k-row
    # driver merge), then number the k survivors — the single-partition
    # window only ever sees k rows
    top = scored.orderBy(F.col("score_q").desc(), F.col("id").asc()).limit(k)
    w = Window.orderBy(F.col("score_q").desc(), F.col("id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "id", "n_terms_matched", "score"
    )


def phrase_occurrences(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    phrase: list[str],
) -> DataFrame:
    """Exact phrase search over a positional posting stream — the
    capability BM25's bag-of-words scoring cannot express ("foo bar"
    as adjacent words, not co-occurrence).

    Shape (one explode + one broadcast join + one aggregation — no
    positional-index self-joins): each posting (id, pos, token) that
    matches phrase[i] votes for the candidate start base = pos - i;
    a base where ALL phrase positions voted (count distinct i ==
    len(phrase)) is an occurrence. The phrase table (len(phrase)
    rows) is broadcast; the posting stream is filtered to phrase
    tokens BEFORE the join, so per-query cost tracks matching
    postings, not corpus size. A repeated token in the phrase votes
    once per (i, pos) pair, which is exactly what the distinct-i
    count requires.

    Returns (id_col, n_matches) for documents with >= 1 occurrence.
    """
    if not phrase:
        raise ValueError("phrase must be non-empty")
    terms = [str(t).lower() for t in phrase]
    spark = docs.sparkSession
    ptab = F.broadcast(
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(terms)], "i int, token string"
        )
    )
    postings = (
        fan_out(docs.select(F.col(id_col).alias("id"), F.col(text_col)))
        .select(
            "id",
            F.posexplode(
                F.filter(words(F.col(text_col)), lambda w: w != "")
            ).alias("pos", "token"),
        )
        .filter(F.col("token").isin(terms))
    )
    votes = postings.join(ptab, "token").select(
        "id", (F.col("pos") - F.col("i")).alias("base"), "i"
    )
    hits = (
        votes.groupBy("id", "base")
        .agg(F.count_distinct("i").alias("__k"))
        .filter(F.col("__k") == len(terms))
    )
    return (
        hits.groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .select(F.col("id").alias(id_col), "n_matches")
    )


def rrf_fuse(
    rankings: list[tuple[DataFrame, str]],
    id_col: str = "id",
    rank_col: str = "rank",
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009): fuse
    any number of rankings — lexical BM25, ANN cosine, recency — by
    ``score(d) = Σ_lists 1/(c + rank_list(d))``, the standard hybrid-
    search combiner: it needs NO score calibration between lists
    (only ranks), which is what makes it robust across heterogeneous
    retrievers. Computed in exact integer ppm, ``1e6 DIV (c+rank)``
    per list — ranks are integers, so fusion is bit-exact on any
    engine, unlike fusing raw float scores.

    Shape: union the (already tiny) top-k lists, one aggregation on
    the id, TakeOrdered for the fused top-k. The expensive part is
    producing the input rankings; fusion itself is O(Σ|lists|).

    Returns (rank, id, rrf_ppm, n_lists) — fused rank ties broken by
    id ascending.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if c < 0:
        raise ValueError(f"c must be >= 0, got {c}")
    tagged = [
        df.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(rank_col).cast("long").alias("rank"),
            F.lit(tag).alias("__src"),
        )
        for df, tag in rankings
    ]
    u = tagged[0]
    for d in tagged[1:]:
        u = u.unionByName(d)
    fused = u.groupBy("id").agg(
        F.sum(F.expr(f"1000000 DIV ({c} + rank)"))
        .cast("long")
        .alias("rrf_ppm"),
        F.countDistinct("__src").cast("long").alias("n_lists"),
    )
    from pyspark.sql import Window

    top = fused.orderBy(F.col("rrf_ppm").desc(), F.col("id")).limit(k)
    w = Window.orderBy(F.col("rrf_ppm").desc(), F.col("id"))
    return top.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select("rank", "id", "rrf_ppm", "n_lists")


def autocomplete_prefix_topk(
    df: DataFrame,
    text_col: str,
    prefix_len: int = 3,
    k: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """Search-box autocomplete index: for every ``prefix_len``-char
    prefix, the top-``k`` completions by corpus frequency — the
    offline artifact a typeahead service serves from. Completions are
    whole tokens (the shared [^a-z0-9]+ tokenizer) at least
    ``prefix_len`` chars long, seen ≥ ``min_count`` times.

    Scale shape: one token aggregation (map-side combined — the
    shuffle carries the VOCABULARY, not the token stream), prefix is
    a projection of the word table, and the top-k is one window
    partitioned by prefix over that vocabulary-sized table. Ranking
    ties break lexicographically, so the index is engine-portable.

    Returns (prefix, word, cnt, rank).
    """
    if prefix_len < 1:
        raise ValueError(f"prefix_len must be >= 1, got {prefix_len}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    vocab = (
        df.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
            ).alias("word")
        )
        .filter(F.length("word") >= prefix_len)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .withColumn("prefix", F.substring("word", 1, prefix_len))
    )
    w = Window.partitionBy("prefix").orderBy(
        F.col("cnt").desc(), F.col("word").asc()
    )
    return (
        vocab.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("prefix", "word", "cnt", F.col("rank").cast("int").alias("rank"))
    )


def snippet_best_window(
    df: DataFrame,
    text_col: str,
    id_col: str,
    terms: list[str],
    window_tokens: int = 10,
) -> DataFrame:
    """Best-snippet selection: per matching document, the
    ``window_tokens``-token window with the most query-term hits —
    the search-result excerpt picker (and the context selector a RAG
    pipeline runs after retrieval). Ties break toward the EARLIEST
    window start, so selection is deterministic.

    Shape: posexplode to token positions, filter to the (bounded)
    query-term set — the corpus shrinks to hit positions only — then
    ONE range-frame window per doc counts the hits within
    [pos, pos+W-1] of each hit (candidate window starts at a hit by
    the standard density argument: shifting left to the previous hit
    never loses a hit), and one row_number picks the argmax. Two
    windows, both partitioned by doc id — one shuffle; per-doc cost
    is its own hit count, never the token count.

    Returns (id, start_pos, n_hits).
    """
    if window_tokens < 1:
        raise ValueError(f"window_tokens must be >= 1, got {window_tokens}")
    from etl_script_spark.operators.textstats import words

    tset = [t.lower() for t in terms]
    hits = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(words(F.col(text_col))).alias("pos", "tok"),
    ).filter(F.col("tok").isin(tset))
    w_range = (
        Window.partitionBy("id")
        .orderBy(F.col("pos").cast("long"))
        .rangeBetween(0, window_tokens - 1)
    )
    scored = hits.withColumn(
        "n_hits", F.count(F.lit(1)).over(w_range).cast("long")
    )
    w_pick = Window.partitionBy("id").orderBy(
        F.col("n_hits").desc(), F.col("pos").asc()
    )
    return (
        scored.withColumn("__r", F.row_number().over(w_pick))
        .filter(F.col("__r") == 1)
        .select("id", F.col("pos").alias("start_pos"), "n_hits")
    )


def symspell_suggest(
    vocab: DataFrame,
    queries: DataFrame,
    word_col: str = "word",
    count_col: str = "cnt",
    query_col: str = "q",
    k: int = 3,
) -> DataFrame:
    """Edit-distance-1 spelling suggestions via the SymSpell
    deletion-variant trick (Garbe 2012): two strings are within one
    edit iff their single-deletion neighborhoods intersect (or one
    contains the other), so candidate generation is an EQUI-JOIN on
    deletion keys — never a fuzzy scan of the vocabulary. Candidates
    verify exactly with the built-in levenshtein (both engines ship
    it), rank by corpus frequency (desc, then word), keep top ``k``
    per query.

    Scale shape: the vocabulary explodes to ~|V|·avg_len deletion
    keys ONCE (vocabulary-bounded, not corpus-bounded); queries
    explode the same way; one shuffle join on the key, one bounded
    distinct, one per-query window. The per-key fan-out is the
    classic SymSpell index — 1000× fewer comparisons than a
    levenshtein cross join, same answers at distance 1.

    Returns (q, suggestion, cnt, rank).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def dels(col):
        w = F.col(col)
        variants = F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: F.concat(
                F.substring(w, F.lit(1), i - 1),
                w.substr(i + 1, F.length(w)),
            ),
        )
        return F.explode(F.array_union(F.array(w), variants))

    v = vocab.select(
        F.col(word_col).alias("c"),
        F.col(count_col).cast("long").alias("cnt"),
    ).filter(F.length("c") > 0)
    vk = v.select("c", "cnt", dels("c").alias("key"))
    qk = queries.select(F.col(query_col).alias("q")).filter(
        F.length("q") > 0
    ).select("q", dels("q").alias("key"))
    cand = (
        qk.join(vk, "key")
        .select("q", "c", "cnt")
        .distinct()
        .filter(F.levenshtein(F.col("q"), F.col("c")) <= 1)
    )
    w = Window.partitionBy("q").orderBy(
        F.col("cnt").desc(), F.col("c").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("q", F.col("c").alias("suggestion"), "cnt", "rank")
    )
