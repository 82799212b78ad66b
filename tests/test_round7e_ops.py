"""Round-7e operator batch: Kneser-Ney bigram smoothing (exact
quarter-unit arithmetic — including the sums-to-one property the
floored ppm report can't show), md5 feature hashing, and SoftDeDup
weights."""

from __future__ import annotations

import hashlib
from fractions import Fraction

from pyspark.sql import functions as F

from etl_script_spark.operators import dedup, features, textstats
from tests.conftest import *  # noqa: F401,F403  (spark fixture)


def _kn_tables(texts):
    bi: dict = {}
    for t in texts:
        ws = [w for w in t.lower().split() if w]
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    c1: dict = {}
    t1: dict = {}
    c2t: dict = {}
    for (a, b), c in bi.items():
        c1[a] = c1.get(a, 0) + c
        t1[a] = t1.get(a, 0) + 1
        c2t[b] = c2t.get(b, 0) + 1
    return bi, c1, t1, c2t, len(bi)


def _pkn(bi, c1, t1, c2t, n, a, b):
    num = max(4 * bi.get((a, b), 0) - 3, 0) * n + 3 * t1[a] * c2t.get(b, 0)
    return Fraction(num, 4 * c1[a] * n)


def test_kneser_ney_matches_brute_force_and_sums_to_one(spark):
    texts = [
        "san francisco san francisco bay area",
        "new york new york city",
        "san jose and new orleans",
        "the bay the bay the bay",
    ] * 3
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    out = textstats.kneser_ney_bigrams(df, "text", k=100, min_count=1)
    bi, c1, t1, c2t, n = _kn_tables(texts)
    for r in out.collect():
        p = _pkn(bi, c1, t1, c2t, n, r["w1"], r["w2"])
        assert r["pkn_ppm"] == (p.numerator * 1_000_000) // p.denominator, r
        assert r["c12"] == bi[(r["w1"], r["w2"])]
    # the KN conditional must be a proper distribution per context:
    # sum over ALL w2 of p(w2|w1) == 1 exactly (in rational form)
    vocab2 = set(c2t)
    for a in c1:
        total = sum(_pkn(bi, c1, t1, c2t, n, a, b) for b in vocab2)
        assert total == 1, (a, total)


def test_kneser_ney_continuation_beats_raw_frequency(spark):
    # 'francisco' occurs often but ONLY after 'san'; 'the' precedes
    # many words. p_KN(francisco | unseen-context) uses continuation
    # counts: C2('francisco')=1 while a word following many contexts
    # gets more back-off mass.
    texts = ["san francisco"] * 10 + [f"w{i} the end{i}" for i in range(8)]
    bi, c1, t1, c2t, n = _kn_tables(texts)
    assert c2t["francisco"] == 1
    assert c2t["the"] == 8


def test_hashed_feature_buckets_matches_hashlib_and_handles_null(spark):
    df = spark.createDataFrame(
        [(1, "A", "x"), (2, "B", None), (3, None, "y")],
        "id long, a string, b string",
    )
    out = {r["id"]: r["bucket"]
           for r in features.hashed_feature_buckets(
               df, ["a", "b"], 32, seed="s").collect()}
    for rid, a, b in [(1, "A", "x"), (2, "B", None), (3, None, "y")]:
        key = "s|" + (a if a is not None else "\x00") \
              + "|" + (b if b is not None else "\x00")
        exp = int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % 32
        assert out[rid] == exp, rid
    import pytest
    with pytest.raises(ValueError):
        features.hashed_feature_buckets(df, ["a"], 0)


def test_soft_dedup_weights_inverse_cluster_size(spark):
    docs = [(1, "Same  Text"), (2, "same text"), (3, "same text "),
            (4, "unique here")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["id"]: (r["cluster_size"], r["weight_ppm"])
           for r in dedup.soft_dedup_weights(df, "text", "doc_id")
           .collect()}
    # normalization folds 1, 2, 3 into one cluster of 3
    assert out[1] == out[2] == out[3] == (3, 333_333)
    assert out[4] == (1, 1_000_000)
    # expected mass of a cluster ~ 1 document (up to ppm flooring)
    assert 3 * 333_333 <= 1_000_000


def test_rrf_fuse_matches_hand_computation(spark):
    from etl_script_spark.operators import search

    lex = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "rank long, id long"
    )
    sem = spark.createDataFrame(
        [(1, 20), (2, 40)], "rank long, id long"
    )
    out = {r["id"]: (r["rank"], r["rrf_ppm"], r["n_lists"])
           for r in search.rrf_fuse([(lex, "a"), (sem, "b")], k=10, c=60)
           .collect()}
    s = lambda *ranks: sum(1_000_000 // (60 + r) for r in ranks)
    # doc 20: rank 2 lexical + rank 1 semantic -> beats both rank-1s
    assert out[20] == (1, s(2, 1), 2)
    assert out[10] == (2, s(1), 1)
    assert out[40] == (3, s(2), 1)
    assert out[30] == (4, s(3), 1)


def test_rrf_fuse_tie_breaks_by_id_and_validates(spark):
    from etl_script_spark.operators import search
    import pytest

    a = spark.createDataFrame([(1, 7), (2, 5)], "rank long, id long")
    b = spark.createDataFrame([(1, 5), (2, 7)], "rank long, id long")
    rows = search.rrf_fuse([(a, "a"), (b, "b")], k=2).collect()
    # symmetric ranks -> equal scores -> id ascending wins
    assert [r["id"] for r in rows] == [5, 7]
    with pytest.raises(ValueError):
        search.rrf_fuse([])


def test_trimmed_mean_matches_brute_force(spark):
    import random
    from etl_script_spark.operators import stats

    rng = random.Random(5)
    vals = [rng.randint(0, 100) for _ in range(237)] + [10**6] * 3  # outliers
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    r = stats.trimmed_mean(df, "v", 10, 90).collect()[0]
    s = sorted(vals)
    n = len(s)
    kept = s[(n * 10) // 100:(n * 90) // 100]
    assert r["n"] == n and r["kept_n"] == len(kept)
    assert r["trimmed_sum"] == sum(kept)
    assert r["tmean_micro"] == sum(kept) * 1_000_000 // len(kept)
    # the 1e6 outliers must not move the trimmed mean
    assert r["tmean_micro"] < 200 * 1_000_000


def test_trimmed_mean_validates_and_handles_ties(spark):
    import pytest
    from etl_script_spark.operators import stats

    with pytest.raises(ValueError):
        stats.trimmed_mean(spark.range(1), "id", 90, 10)
    # all-ties: any trim keeps the same value
    df = spark.createDataFrame([(7,)] * 50, "v long")
    r = stats.trimmed_mean(df, "v", 20, 80).collect()[0]
    assert r["kept_n"] == 30 and r["tmean_micro"] == 7_000_000


def test_round7_parameter_guards(spark):
    """Each new operator rejects degenerate parameters loudly instead
    of erroring mid-plan under ANSI (divide-by-zero) or silently
    producing bogus replicate ids (descending sequence())."""
    import pytest
    from etl_script_spark.operators import (
        dedup as ddp, features as ft, governance as gv, stats as st,
        timeseries as ts,
    )

    df = spark.createDataFrame([(1, "a", 1)], "id long, c string, v int")
    with pytest.raises(ValueError):
        ts.acf_lags(df, ["c"], ["id"], "v", max_lag=0)
    with pytest.raises(ValueError):
        ft.target_encode_loo(df, "c", "v", smoothing=0)
    with pytest.raises(ValueError):
        ft.hashed_feature_buckets(df, [], 8)
    with pytest.raises(ValueError):
        ddp.continuation_pairs(df, "c", "id", k=0)
    with pytest.raises(ValueError):
        st.randomization_test_mean_diff(df, "id", "c", "v", "a", "b",
                                        reps=0)
    with pytest.raises(ValueError):
        gv.t_closeness_report(df, [], "c")


def test_label_propagation_string_labels(spark):
    """The min-of-(-cnt, label) argmax must work for non-numeric
    vertex ids too (tie still breaks to the SMALLEST label)."""
    from etl_script_spark.operators import graph

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    out = {r["vertex"]: r["label"]
           for r in graph.label_propagation(edges, iters=1).collect()}
    assert out["b"] == "a"          # {a, c} one vote each -> min label
    assert out["a"] == "b" and out["c"] == "b"
