"""BM25 search: ranking sanity and partitioning-independence."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_script_spark.operators import search


def _docs(spark):
    rows = [
        (1, "join join join filter scan"),          # tf-heavy on rarer term
        (2, "join filter the scan scan"),
        (3, "the the the the the the the the"),     # common-term only
        (4, "filter scan scan"),                    # no query terms
        (5, "join the"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bm25_tf_monotone_same_length(spark):
    # same document length, higher tf -> strictly higher score
    out = search.bm25_topk(
        _docs(spark), "text", "doc_id", ["join"], k=10
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert 3 not in by_id and 4 not in by_id  # no 'join'
    assert by_id[1]["score"] > by_id[2]["score"]  # tf 3 vs 1, dl 5 vs 5
    assert by_id[1]["rank"] == 1


def test_bm25_multi_term_ranking(spark):
    out = search.bm25_topk(
        _docs(spark), "text", "doc_id", ["join", "the"], k=10
    ).collect()
    by_id = {r["id"]: r for r in out}
    # doc 4 has no query term -> absent
    assert 4 not in by_id
    # every present score is positive (non-negative idf variant)
    assert all(r["score"] > 0 for r in out)
    # ranks are 1..n dense and consistent with score order
    ordered = sorted(out, key=lambda r: r["rank"])
    assert [r["rank"] for r in ordered] == list(range(1, len(out) + 1))
    assert all(
        a["score"] >= b["score"] for a, b in zip(ordered, ordered[1:])
    )
    # matched-term counts
    assert by_id[5]["n_terms_matched"] == 2


def test_bm25_scores_partitioning_independent(spark):
    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta "),
            F.when(F.col("id") % 3 == 0, F.lit("gamma gamma ")).otherwise(F.lit("")),
            F.lit("delta"),
        ).alias("text"),
    )
    a = search.bm25_scores(docs, "text", "doc_id", ["gamma", "delta"]).collect()
    b = search.bm25_scores(
        docs.repartition(17), "text", "doc_id", ["gamma", "delta"]
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 500  # every doc matches 'delta'
