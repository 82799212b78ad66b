"""Unit tests for the round-4 curation operators: PII redaction,
repetition metrics, decontamination, stratified sampling, URL
canonicalization, and chunking. The catalog oracle tests cover the
end-to-end hash parity; these pin the operator-level edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_script_spark.operators import decontam, redact, textstats, urls


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def test_redact_order_specific_before_loose(spark):
    # a 13-digit citizen ID must become [ID], not a partial [CARD]
    df = spark.createDataFrame(
        [("id 1-2345-67890-12-3 card 4111-1111-1111-1111 x@y.co",)], ["t"]
    )
    out = df.select(redact.redact(F.col("t")).alias("c")).first()["c"]
    assert out == "id [ID] card [CARD] [EMAIL]"


def test_redact_counts_and_kinds(spark):
    df = spark.createDataFrame(
        [("mail a@b.com and c@d.org tel 081-234-5678 ip 10.0.0.1",)], ["t"]
    )
    row = df.select(
        redact.pii_count(F.col("t"), "email").alias("e"),
        redact.pii_count(F.col("t"), "phone").alias("p"),
        redact.pii_count(F.col("t"), "ipv4").alias("i"),
        redact.pii_count(F.col("t"), "card").alias("card"),
    ).first()
    assert (row["e"], row["p"], row["i"], row["card"]) == (2, 1, 1, 0)


def test_pii_report_totals(spark):
    df = spark.createDataFrame([("a@b.com 10.0.0.1",), ("clean text",)], ["t"])
    rows = {
        r["t"]: r["r"]
        for r in df.select("t", redact.pii_report(F.col("t")).alias("r")).collect()
    }
    assert rows["a@b.com 10.0.0.1"]["total"] == 2
    assert rows["clean text"]["total"] == 0


# ---------------------------------------------------------------------------
# Repetition metrics
# ---------------------------------------------------------------------------


def test_repetition_flags_looping_text(spark):
    df = spark.createDataFrame(
        [
            (1, "spam ham " * 30),  # one bigram dominates
            (2, "the quick brown fox jumps over a lazy dog tonight"),
        ],
        ["id", "t"],
    )
    out = {
        r["id"]: r
        for r in textstats.repetition_metrics(df, "t", "id").collect()
    }
    assert out[1]["repetitive"] and out[1]["top_ngram_frac"] > 0.4
    assert not out[2]["repetitive"]
    assert out[2]["dup_word_frac"] == 0.0


def test_repetition_empty_and_single_word(spark):
    df = spark.createDataFrame([(1, ""), (2, "word")], ["id", "t"])
    out = {
        r["id"]: r
        for r in textstats.repetition_metrics(df, "t", "id").collect()
    }
    # no bigrams -> top fraction 0, nothing repetitive
    for i in (1, 2):
        assert out[i]["top_ngram_frac"] == 0.0
        assert not out[i]["repetitive"]


# ---------------------------------------------------------------------------
# Decontamination
# ---------------------------------------------------------------------------


def test_contamination_report_exact_grams(spark):
    bench = spark.createDataFrame(
        [("alpha beta gamma delta epsilon zeta eta theta iota kappa",)],
        ["text"],
    )
    corpus = spark.createDataFrame(
        [
            # contains bench 8-grams 1..3 verbatim
            (1, "x alpha beta gamma delta epsilon zeta eta theta iota kappa y"),
            # shares 7-gram only -> NOT flagged at n=8
            (2, "alpha beta gamma delta epsilon zeta eta DIFFERENT"),
            (3, "completely unrelated words here and there again"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["n_overlap"]
        for r in decontam.contamination_report(
            corpus, bench, "text", "doc_id", n=8
        ).collect()
    }
    assert out == {1: 3}


def test_contamination_short_doc_whole_text_gram(spark):
    bench = spark.createDataFrame([("tiny bench text",)], ["text"])
    corpus = spark.createDataFrame(
        [(1, "tiny bench text"), (2, "tiny bench")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r["n_overlap"]
        for r in decontam.contamination_report(
            corpus, bench, "text", "doc_id", n=8
        ).collect()
    }
    # the degenerate whole-text shingle matches only the identical text
    assert out == {1: 1}


# ---------------------------------------------------------------------------
# Stratified sampling
# ---------------------------------------------------------------------------


def test_stratified_rates_and_determinism(spark):
    rows = [(i, "keep_all" if i % 3 == 0 else ("half" if i % 3 == 1 else "tail"))
            for i in range(3000)]
    df = spark.createDataFrame(rows, ["k", "s"])
    out = textstats.stratified_hash_sample(
        df, "k", "s", {"keep_all": 1.0, "half": 0.5}, default_rate=0.0,
        seed="t",
    )
    by_s = {r["s"]: r["n"] for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert by_s["keep_all"] == 1000           # rate 1.0 keeps everything
    assert "tail" not in by_s                 # default 0.0 drops unlisted
    assert 380 <= by_s["half"] <= 620         # ~500 within md5 variance
    # deterministic: second run selects the identical keys
    a = {r["k"] for r in out.collect()}
    b = {
        r["k"]
        for r in textstats.stratified_hash_sample(
            df, "k", "s", {"keep_all": 1.0, "half": 0.5}, 0.0, "t"
        ).collect()
    }
    assert a == b


def test_stratified_rejects_bad_rates(spark):
    df = spark.createDataFrame([(1, "a")], ["k", "s"])
    with pytest.raises(ValueError):
        textstats.stratified_hash_sample(df, "k", "s", {"a": 1.5})
    with pytest.raises(ValueError):
        textstats.stratified_hash_sample(df, "k", "s", {}, default_rate=-0.1)


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("HTTP://Example.COM:80/A/b/?utm_source=x&q=1#f",
         "http://example.com/A/b?q=1"),
        ("https://example.com:443/", "https://example.com"),
        ("https://example.com:8443/x", "https://example.com:8443/x"),
        ("http://example.com/?utm_a=1&utm_b=2", "http://example.com"),
        # param NAMED xutm_source is NOT a tracking param
        ("http://e.com/p?xutm_source=1", "http://e.com/p?xutm_source=1"),
        ("http://e.com/p?fbclid=abc&keep=2", "http://e.com/p?keep=2"),
        # no scheme -> passthrough (trimmed)
        ("  relative/path?utm_source=x  ", "relative/path?utm_source=x"),
        ("http://e.com/a//", "http://e.com/a"),
    ],
)
def test_canonicalize_url(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], ["u"])
    got = df.select(urls.canonicalize_url(F.col("u")).alias("c")).first()["c"]
    assert got == expected


def test_url_host(spark):
    df = spark.createDataFrame(
        [("HTTPS://Sub.Example.COM:8443/x?y=1",), ("no-scheme",)], ["u"]
    )
    got = [r["h"] for r in df.select(urls.url_host(F.col("u")).alias("h")).collect()]
    assert got == ["sub.example.com", ""]


# ---------------------------------------------------------------------------
# Chunking
# ---------------------------------------------------------------------------


def test_chunk_text_overlap_and_tail(spark):
    words = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, words), (2, "short doc")], ["id", "t"])
    out = textstats.chunk_text(df, "t", "id", chunk_tokens=40, overlap=8)
    rows = sorted(
        [(r["id"], r["chunk_idx"], r["chunk_text"], r["n_tokens"]) for r in out.collect()]
    )
    doc1 = [r for r in rows if r[0] == 1]
    # stride 32: windows at 0,32,64 -> 3 chunks, last is the ragged tail
    assert [r[1] for r in doc1] == [0, 1, 2]
    assert doc1[0][2].startswith("w0 ") and doc1[0][3] == 40
    assert doc1[1][2].startswith("w32 ") and doc1[1][3] == 40
    assert doc1[2][2].startswith("w64 ") and doc1[2][3] == 36
    # consecutive chunks overlap by 8 tokens
    assert doc1[0][2].split()[-8:] == doc1[1][2].split()[:8]
    # short doc -> one whole-doc chunk
    doc2 = [r for r in rows if r[0] == 2]
    assert doc2 == [(2, 0, "short doc", 2)]


def test_chunk_text_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "a b")], ["id", "t"])
    with pytest.raises(ValueError):
        textstats.chunk_text(df, "t", "id", chunk_tokens=0)
    with pytest.raises(ValueError):
        textstats.chunk_text(df, "t", "id", chunk_tokens=10, overlap=10)
