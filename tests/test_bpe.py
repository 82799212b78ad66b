"""BPE: training determinism, merge behavior, loss-free apply."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_script_spark.operators import bpe


def test_train_merges_most_frequent_pair_first():
    freqs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe.train_bpe(freqs, n_merges=10)
    # 'es' (newest 6 + widest 3 = 9) and 'st' coalesce into the
    # 'est</w>' family before anything 'low'-related
    assert merges[0] == ("e", "s")
    assert ("es", "t") in merges[:3]


def test_train_is_deterministic_under_input_order():
    freqs = [("abc", 3), ("abd", 3), ("xyz", 2)]
    a = bpe.train_bpe(freqs, 8)
    b = bpe.train_bpe(list(reversed(freqs)), 8)
    assert a == b


def test_encode_word_applies_ranks_greedily():
    merges = [("e", "s"), ("es", "t"), ("est", bpe.EOW), ("l", "o")]
    ranks = {m: i for i, m in enumerate(merges)}
    assert bpe.encode_word("newest", ranks) == ["n", "e", "w", "est</w>"]
    assert bpe.encode_word("lo", ranks) == ["lo", bpe.EOW]


def test_tokenize_roundtrip_and_compression(spark):
    docs = spark.createDataFrame(
        [
            (1, "the shuffle joins the shuffle"),
            (2, "broadcast joins   win"),
            (3, ""),
            (4, None),
        ],
        ["doc_id", "text"],
    )
    merges = bpe.train_bpe(
        bpe.word_frequencies(docs, "text"), n_merges=50
    )
    out = {r["id"]: r for r in bpe.tokenize(docs, "text", "doc_id", merges).collect()}
    assert all(r["roundtrip_ok"] for r in out.values())
    assert out[1]["n_words"] == 5
    assert out[2]["n_words"] == 3
    assert out[3]["n_words"] == 0 and out[3]["n_tokens"] == 0
    assert out[4]["n_words"] == 0
    # merges compress: repeated words need far fewer tokens than chars
    assert out[1]["n_tokens"] < len("the shuffle joins the shuffle")


def test_more_merges_never_increase_token_count(spark):
    docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma alpha beta").alias("text"),
    )
    freqs = bpe.word_frequencies(docs, "text")
    few = bpe.train_bpe(freqs, 2)
    many = bpe.train_bpe(freqs, 30)
    n_few = bpe.tokenize(docs, "text", "doc_id", few).agg(
        F.sum("n_tokens")
    ).collect()[0][0]
    n_many = bpe.tokenize(docs, "text", "doc_id", many).agg(
        F.sum("n_tokens")
    ).collect()[0][0]
    assert n_many <= n_few


def test_roundtrip_survives_literal_eow_marker_in_text(spark):
    docs = spark.createDataFrame(
        [(1, "see </w> marker twice </w> here")], ["doc_id", "text"]
    )
    merges = bpe.train_bpe(bpe.word_frequencies(docs, "text"), 20)
    row = bpe.tokenize(docs, "text", "doc_id", merges).collect()[0]
    assert row["roundtrip_ok"]
    assert row["n_words"] == 6
