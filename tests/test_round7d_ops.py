"""Round-7d operator batch: WordPiece greedy tokenization, Cramér's V,
the md5 randomization test, suffix→prefix continuation dedup, and
common-neighbor link prediction — brute-force Python twins throughout,
so the tests pin the SPECIFIED semantics, not just cross-engine
agreement."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from etl_script_spark.operators import dedup, graph, stats, wordpiece
from tests.conftest import *  # noqa: F401,F403  (spark fixture)


# ---------------------------------------------------------------------------
# WordPiece
# ---------------------------------------------------------------------------


def _wp_brute(word, init_by_len, cont_by_len, max_word_len=16):
    """(n_pieces, unk) under greedy longest-match-first."""
    if len(word) > max_word_len:
        return 1, True
    pos, np = 0, 0
    while pos < len(word):
        table = init_by_len if pos == 0 else cont_by_len
        m = None
        for L in sorted(table, reverse=True):
            if word[pos:pos + L] in table[L] and len(word) - pos >= L:
                m = L
                break
        if m is None:
            return 1, True
        pos += m
        np += 1
    return np, False


def test_wordpiece_matches_brute_force(spark):
    texts = [
        (0, "the running interconnection"),
        (1, "over, and out!"),           # punctuation words -> UNK
        (2, "prefix unbelievable restatement"),
        (3, "a bb ccc dddd"),
        (4, "superlongwordthatexceedslimit ok"),  # >16 chars -> UNK
        (5, ""),                          # empty doc -> zero row
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = {r["id"]: r for r in
           wordpiece.tokenize_wordpiece(df, "text", "doc_id").collect()}
    bi = wordpiece._by_len(wordpiece.INIT_VOCAB)
    bc = wordpiece._by_len(wordpiece.CONT_VOCAB)
    for doc_id, text in texts:
        ws = [w for w in text.lower().split() if w]
        np_tot = unk_tot = chars = 0
        for w in ws:
            np_w, unk = _wp_brute(w, bi, bc)
            np_tot += np_w
            unk_tot += int(unk)
            chars += len(w)
        row = out[doc_id]
        assert (row["n_words"], row["n_pieces"], row["n_unk"],
                row["n_chars"]) == (len(ws), np_tot, unk_tot, chars), text


def test_wordpiece_greedy_prefers_longest(spark):
    # 'the' must consume as ONE init piece, not t+h+e; 'ing' as one
    # continuation piece in 'testing' (t-es-t-ing or similar — what
    # matters is greedy: at pos 0 of 'thing', 'the' wins over 't'
    df = spark.createDataFrame([(1, "the thing")], "doc_id long, text string")
    row = wordpiece.tokenize_wordpiece(df, "text", "doc_id").collect()[0]
    bi = wordpiece._by_len(wordpiece.INIT_VOCAB)
    bc = wordpiece._by_len(wordpiece.CONT_VOCAB)
    exp = sum(_wp_brute(w, bi, bc)[0] for w in ("the", "thing"))
    assert row["n_pieces"] == exp
    assert _wp_brute("the", bi, bc) == (1, False)


def test_wordpiece_vocab_validation():
    try:
        wordpiece.tokenize_wordpiece.__wrapped__  # noqa: B018
    except AttributeError:
        pass
    import pytest
    with pytest.raises(ValueError):
        wordpiece._dedup(("a", "a"))
    with pytest.raises(ValueError):
        wordpiece._dedup(("a", ""))


# ---------------------------------------------------------------------------
# Cramér's V / randomization test
# ---------------------------------------------------------------------------


def test_cramers_v_perfect_association(spark):
    # row == col -> V = 1 (up to per-cell milli flooring)
    rows = [(str(i % 3), str(i % 3)) for i in range(300)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = stats.cramers_v(df, "a", "b").collect()[0]
    assert r["df_min"] == 2
    assert 995_000 <= r["v_ppm"] <= 1_000_000


def test_cramers_v_independence_and_degenerate(spark):
    # independent uniform 2x2 -> V == 0 exactly (counts balanced)
    rows = [(str(i % 2), str((i // 2) % 2)) for i in range(400)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = stats.cramers_v(df, "a", "b").collect()[0]
    assert r["v_ppm"] == 0
    # single-category column -> df_min = 0 -> NULL
    rows = [("x", str(i % 3)) for i in range(30)]
    df = spark.createDataFrame(rows, "a string, b string")
    assert stats.cramers_v(df, "a", "b").collect()[0]["v_ppm"] is None


def _rt_brute(rows, reps=49, seed="rt"):
    n_a = sum(1 for _, g, _v in rows if g)
    n_b = len(rows) - n_a
    s_a = sum(v for _, g, v in rows if g)
    s_b = sum(v for _, g, v in rows if not g)
    extreme = 0
    for rep in range(reps):
        n_ar = s_ar = n_br = s_br = 0
        for rid, _g, v in rows:
            h = hashlib.md5(f"{seed}{rep}|{rid}".encode()).hexdigest()
            if h[0] in "02468ace":
                n_ar += 1
                s_ar += v
            else:
                n_br += 1
                s_br += v
        if (n_ar == 0 or n_br == 0
                or abs(s_ar * n_br - s_br * n_ar) * n_a * n_b
                >= abs(s_a * n_b - s_b * n_a) * n_ar * n_br):
            extreme += 1
    return n_a, n_b, extreme, (1 + extreme) * 1_000_000 // (reps + 1)


def test_randomization_test_matches_brute_force(spark):
    # group a systematically higher -> small p
    rows = [(str(i), i % 2 == 0, (40 if i % 2 == 0 else 10) + i % 7)
            for i in range(120)]
    df = spark.createDataFrame(rows, "rid string, ga boolean, v int")
    out = stats.randomization_test_mean_diff(
        df, "rid", "ga", "v", True, False, reps=49, seed="rt"
    ).collect()[0]
    n_a, n_b, extreme, p = _rt_brute([(r, g, v) for r, g, v in rows])
    assert (out["n_a"], out["n_b"], out["extreme_reps"], out["p_ppm"]) == (
        n_a, n_b, extreme, p
    )
    assert out["p_ppm"] == 20_000  # no reshuffle beats a 30-point gap


def test_randomization_test_null_effect_large_p(spark):
    # identical distributions -> p should be large (most reps extreme)
    rows = [(str(i), i % 2 == 0, i % 5) for i in range(200)]
    df = spark.createDataFrame(rows, "rid string, ga boolean, v int")
    out = stats.randomization_test_mean_diff(
        df, "rid", "ga", "v", True, False, reps=49
    ).collect()[0]
    assert out["p_ppm"] > 300_000


# ---------------------------------------------------------------------------
# continuation pairs / common neighbors
# ---------------------------------------------------------------------------


def test_continuation_pairs_finds_planted_boundary(spark):
    docs = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "delta epsilon zeta eta theta iota"),   # 1 -> 2 (k=3)
        (3, "unrelated words entirely here now"),
        (4, "alpha beta gamma delta epsilon zeta"),  # identical to 1
        (5, "zeta zeta zeta zeta"),  # tail == own head, no self-pair
        (6, "zeta zeta zeta zeta"),  # ...but pairs with 5 both ways
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {(r["prev_id"], r["next_id"])
           for r in dedup.continuation_pairs(df, "text", "doc_id", k=3)
           .collect()}
    # 1->2 and 4->2 via the boundary gram; identical docs pair only
    # when tail == head (5 and 6, never self)
    assert out == {(1, 2), (4, 2), (5, 6), (6, 5)}


def test_continuation_pairs_df_cap_drops_boilerplate(spark):
    # 20 docs all ending in the same footer, 20 all starting with it:
    # cap 10 must drop the gram entirely (0 pairs), cap 100 keeps 400
    docs = [(i, f"unique{i} words here plus footer one two")
            for i in range(20)]
    docs += [(100 + i, f"footer one two opening{i} more words")
             for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    assert dedup.continuation_pairs(df, "text", "doc_id", k=3,
                                    df_cap=10).count() == 0
    assert dedup.continuation_pairs(df, "text", "doc_id", k=3,
                                    df_cap=100).count() == 400


def test_common_neighbors_square_graph(spark):
    # 4-cycle 1-2-3-4-1: diagonals (1,3) and (2,4) share BOTH
    # neighbors -> common=2, jaccard = 2/(2+2-2) = 1.0
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    out = {(r["x"], r["y"]): (r["common"], r["jaccard_ppm"])
           for r in graph.common_neighbor_scores(edges).collect()}
    assert out == {(1, 3): (2, 1_000_000), (2, 4): (2, 1_000_000)}


def test_common_neighbors_excludes_adjacent_and_caps_hubs(spark):
    # star: hub 0 to 1..5; all leaf pairs share only the hub; with
    # deg_cap < 5 the hub can't be a center -> no candidates at all
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    out = graph.common_neighbor_scores(edges, deg_cap=4).collect()
    assert out == []
    full = {(r["x"], r["y"]) for r in
            graph.common_neighbor_scores(edges, deg_cap=5).collect()}
    # all 10 leaf pairs, never (0, i) — those are existing edges
    assert full == {(i, j) for i in range(1, 6) for j in range(i + 1, 6)}


def test_common_neighbors_ra_index_exact(spark):
    # 1-2-3 path: pair (1,3) shares only vertex 2 (deg 2) ->
    # ra = 1e6 // 2. Adding 3-4 and 3-5 makes deg(3) = 3, so pair
    # (2,4) (common neighbor 3) gets 1e6 // 3.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (3, 5)], "src long, dst long"
    )
    out = {(r["x"], r["y"]): r["ra_ppm"]
           for r in graph.common_neighbor_scores(edges).collect()}
    assert out[(1, 3)] == 500_000
    assert out[(2, 4)] == 333_333
    assert out[(4, 5)] == 333_333
