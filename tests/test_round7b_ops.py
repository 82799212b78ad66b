"""Round-7b operator batch: rank statistics (Mann-Whitney U, ROC-AUC,
Cohen's kappa), linear gap interpolation, PMI collocations, grouping
sets — each checked against a brute-force Python twin."""

from __future__ import annotations

import random
from datetime import datetime

from pyspark.sql import functions as F

from etl_script_spark.operators import stats, textstats, timeseries
from tests.conftest import *  # noqa: F401,F403  (spark fixture)


# ---------------------------------------------------------------------------
# Rank machinery: Mann-Whitney U / ROC-AUC
# ---------------------------------------------------------------------------


def _brute_rank_sum_doubled(a_vals, b_vals):
    """Doubled sum of group-a midranks over the pooled ascending order."""
    pooled = sorted([(v, "a") for v in a_vals] + [(v, "b") for v in b_vals])
    # midrank of a tie run [i, j] (1-based) is (i + j) / 2
    r2 = 0
    i = 0
    while i < len(pooled):
        j = i
        while j + 1 < len(pooled) and pooled[j + 1][0] == pooled[i][0]:
            j += 1
        doubled_midrank = (i + 1) + (j + 1)  # 2 * (i+1 + j+1)/2
        r2 += doubled_midrank * sum(1 for k in range(i, j + 1) if pooled[k][1] == "a")
        i = j + 1
    return r2


def test_mann_whitney_matches_brute_force_with_ties(spark):
    rng = random.Random(7)
    a = [rng.randint(0, 20) for _ in range(137)]
    b = [rng.randint(5, 25) for _ in range(211)]
    df = spark.createDataFrame(
        [("a", v) for v in a] + [("b", v) for v in b], ["g", "v"]
    )
    row = stats.mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    r2a = _brute_rank_sum_doubled(a, b)
    na, nb = len(a), len(b)
    u2a = r2a - na * (na + 1)
    assert row["n_a"] == na and row["n_b"] == nb
    assert row["u_a_doubled"] == u2a
    assert row["u_b_doubled"] == 2 * na * nb - u2a
    assert row["cles_ppm"] == (u2a * 1_000_000) // (2 * na * nb)


def test_mann_whitney_ignores_other_groups_and_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 2), ("c", 99), ("a", None), ("b", None)],
        "g string, v int",
    )
    row = stats.mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    # pooled: 1(a), 2(a), 2(b) -> a midranks 1 and 2.5 -> doubled 2 + 5
    assert row["n_a"] == 2 and row["n_b"] == 1
    assert row["u_a_doubled"] == 7 - 2 * 3  # 2R - na(na+1) = 7 - 6
    assert row["u_b_doubled"] == 2 * 2 * 1 - 1


def _brute_auc_ppm(pairs):
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    return (wins * 2 + ties) * 1_000_000 // (2 * len(pos) * len(neg))


def test_roc_auc_matches_pairwise_definition(spark):
    rng = random.Random(11)
    pairs = [
        (rng.randint(0, 50), rng.random() < 0.4) for _ in range(400)
    ]
    df = spark.createDataFrame(pairs, "score int, y boolean")
    row = stats.roc_auc(df, "y", "score").collect()[0]
    assert row["auc_ppm"] == _brute_auc_ppm(pairs)
    assert row["n_pos"] == sum(1 for _, y in pairs if y)


def test_roc_auc_perfect_and_inverted_rankers(spark):
    perfect = [(i, i >= 50) for i in range(100)]
    df = spark.createDataFrame(perfect, "score int, y boolean")
    assert stats.roc_auc(df, "y", "score").collect()[0]["auc_ppm"] == 1_000_000
    inverted = [(100 - i, i >= 50) for i in range(100)]
    df = spark.createDataFrame(inverted, "score int, y boolean")
    assert stats.roc_auc(df, "y", "score").collect()[0]["auc_ppm"] == 0


def test_rank_sums_bucketed_prefix_equals_plain_for_wide_ranges(spark):
    # values spanning far more than n_buckets distinct points: the
    # two-phase bucketed prefix sum must agree with the brute twin
    rng = random.Random(13)
    a = [rng.randint(0, 10**9) for _ in range(300)]
    b = [rng.randint(0, 10**9) for _ in range(300)]
    df = spark.createDataFrame(
        [("a", v) for v in a] + [("b", v) for v in b], ["g", "v"]
    )
    row = stats.mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    r2a = _brute_rank_sum_doubled(a, b)
    assert row["u_a_doubled"] == r2a - 300 * 301


# ---------------------------------------------------------------------------
# Cohen's kappa
# ---------------------------------------------------------------------------


def _brute_kappa_ppm(pairs):
    n = len(pairs)
    agree = sum(1 for x, y in pairs if x == y)
    cats = {c for p in pairs for c in p}
    chance = sum(
        sum(1 for x, _ in pairs if x == c) * sum(1 for _, y in pairs if y == c)
        for c in cats
    )
    num = n * agree - chance
    den = n * n - chance
    mag = (abs(num) * 1_000_000) // den
    return -mag if num < 0 else mag


def test_cohens_kappa_matches_formula(spark):
    rng = random.Random(3)
    pairs = [
        (rng.choice("xyz"), rng.choice("xyz")) for _ in range(500)
    ]
    df = spark.createDataFrame(pairs, "a string, b string")
    row = stats.cohens_kappa(df, "a", "b").collect()[0]
    assert row["kappa_ppm"] == _brute_kappa_ppm(pairs)
    assert row["n"] == 500


def test_cohens_kappa_negative_on_systematic_disagreement(spark):
    # raters that always flip: worse than chance -> kappa < 0
    pairs = [("x", "y")] * 30 + [("y", "x")] * 30 + [("x", "x")] * 5
    df = spark.createDataFrame(pairs, "a string, b string")
    row = stats.cohens_kappa(df, "a", "b").collect()[0]
    assert row["kappa_ppm"] == _brute_kappa_ppm(pairs)
    assert row["kappa_ppm"] < 0


def test_cohens_kappa_perfect_agreement(spark):
    pairs = [("x", "x")] * 10 + [("y", "y")] * 20
    df = spark.createDataFrame(pairs, "a string, b string")
    assert (
        stats.cohens_kappa(df, "a", "b").collect()[0]["kappa_ppm"]
        == 1_000_000
    )


# ---------------------------------------------------------------------------
# Linear interpolation
# ---------------------------------------------------------------------------


def _ts(h):
    return datetime(2024, 1, 1, h)


def test_interpolate_linear_fills_gap_exactly(spark):
    # known at hours 0 and 4: 100 -> 500; the gap rises 100/hour
    agg = spark.createDataFrame(
        [(1, _ts(0), 100), (1, _ts(4), 500)],
        "k long, bucket timestamp, v long",
    )
    out = timeseries.interpolate_linear(
        agg, ["k"], "bucket", "v", "1 HOUR", 3600
    )
    rows = {r["bucket"].hour: (r["v"], r["interpolated"]) for r in out.collect()}
    assert rows == {
        0: (100, False),
        1: (200, True),
        2: (300, True),
        3: (400, True),
        4: (500, False),
    }


def test_interpolate_linear_falling_series_truncates_like_floor(spark):
    # 10 -> 3 over 3 hours: exact interpolants 10, 7.67, 5.33, 3.
    # The magnitude-DIV-then-sign form gives round-toward-zero on the
    # negative delta in BOTH engines (8, 6) — pinning it here is the
    # point: a raw Spark DIV (trunc) vs DuckDB // (floor) would
    # disagree at exactly these rows (7, 5 on one side only).
    agg = spark.createDataFrame(
        [(1, _ts(0), 10), (1, _ts(3), 3)],
        "k long, bucket timestamp, v long",
    )
    out = timeseries.interpolate_linear(
        agg, ["k"], "bucket", "v", "1 HOUR", 3600
    )
    rows = {r["bucket"].hour: r["v"] for r in out.collect()}
    # v = 10 + floor-like((3-10)*t/3): t=1 -> 10 + trunc(-7/3) = 10 - 2
    assert rows[1] == 8 and rows[2] == 6


def test_interpolate_linear_clamps_edges_and_null_hours(spark):
    # hour 1 exists with NULL value (all-NULL hour): treated as a hole
    agg = spark.createDataFrame(
        [(1, _ts(0), None), (1, _ts(1), 40), (1, _ts(3), 80)],
        "k long, bucket timestamp, v long",
    )
    out = timeseries.interpolate_linear(
        agg, ["k"], "bucket", "v", "1 HOUR", 3600
    )
    rows = {r["bucket"].hour: (r["v"], r["interpolated"]) for r in out.collect()}
    assert rows[0] == (40, True)  # before first observation: clamp forward
    assert rows[1] == (40, False)
    assert rows[2] == (60, True)
    assert rows[3] == (80, False)


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------


def test_pmi_collocations_exact_lift(spark):
    # corpus engineered so "new york" dominates: 6 occurrences,
    # "the the" frequent but expected
    docs = [" ".join(["new york"] * 6)] + ["the a"] * 10 + ["a the"] * 10
    df = spark.createDataFrame([(t,) for t in docs], ["text"])
    out = textstats.pmi_collocations(df, "text", min_count=5, k=10)
    rows = {(r["w1"], r["w2"]): (r["pair_count"], r["lift_ppm"]) for r in out.collect()}
    # bigram stream: doc0 contributes new->york x6, york->new x5
    n_bg = 11 + 20
    assert rows[("new", "york")][0] == 6
    assert rows[("new", "york")][1] == (6 * n_bg * 1_000_000) // (6 * 6)
    assert ("york", "new") in rows  # 5 occurrences passes min_count
    # pairs below min_count are filtered
    assert all(c >= 5 for c, _ in rows.values())


def test_pmi_collocations_orders_by_lift_then_words(spark):
    docs = ["x y"] * 5 + ["p q"] * 5 + ["p r"] * 5
    df = spark.createDataFrame([(t,) for t in docs], ["text"])
    out = textstats.pmi_collocations(df, "text", min_count=5, k=10).collect()
    lifts = [r["lift_ppm"] for r in out]
    assert lifts == sorted(lifts, reverse=True)
    # x->y is the purest pair (marginals 5/5), p->q and p->r share p
    assert (out[0]["w1"], out[0]["w2"]) == ("x", "y")
