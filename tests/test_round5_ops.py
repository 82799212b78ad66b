"""Unit tests for the round-5 operator batch: FIR EWMA, MAD outliers,
CDC apply, triangle counting, tf-idf cosine join, k-anonymity,
quantile binning. The catalog-level oracle checks live in
test_oracle.py (auto-parameterized); these pin the operator semantics
on adversarial micro-fixtures the testdata tables cannot hit."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_script_spark.operators import cdc, features, governance, graph
from etl_script_spark.operators import timeseries as ts
from etl_script_spark.operators import vsm


# --------------------------------------------------------------- EWMA
def test_ewma_weights_sum_to_one():
    w = ts.ewma_weights(0.3, 8)
    assert len(w) == 8
    assert math.isclose(sum(w), 1.0, rel_tol=0, abs_tol=1e-12)
    # strictly decreasing except the tail-absorbing last tap
    assert all(a > b for a, b in zip(w[:-2], w[1:-1]))


def test_ewma_fir_constant_signal_is_identity(spark):
    # weights sum to 1 → EWMA of a constant is that constant
    rows = [(1, i, 5.0) for i in range(12)]
    df = spark.createDataFrame(rows, "k int, seq int, x double")
    out = ts.ewma_fir(df, ["k"], ["seq"], "x", alpha=0.3, taps=8)
    got = {r["seq"]: r["ewma"] for r in out.collect()}
    for seq in range(7):  # warm-up rows: NULL by contract
        assert got[seq] is None
    for seq in range(7, 12):
        assert got[seq] == pytest.approx(5.0, abs=1e-12)


def test_ewma_fir_recency_weighting(spark):
    # a step signal: newest taps dominate (alpha mass on recent values)
    rows = [(1, i, 0.0) for i in range(8)] + [(1, 8, 10.0)]
    df = spark.createDataFrame(rows, "k int, seq int, x double")
    out = ts.ewma_fir(df, ["k"], ["seq"], "x", alpha=0.3, taps=8)
    last = out.filter(F.col("seq") == 8).collect()[0]["ewma"]
    assert last == pytest.approx(3.0, abs=1e-12)  # alpha * 10


# ------------------------------------------------------- MAD outliers
def test_mad_outliers_flags_only_the_spike(spark):
    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.2, 9.8, 1000.0]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "g string, x double"
    )
    out = ts.mad_outliers(df, "g", "x", k=3.0)
    flagged = [r["x"] for r in out.filter("is_outlier").collect()]
    assert flagged == [1000.0]


def test_mad_outliers_constant_group_flags_nothing(spark):
    df = spark.createDataFrame(
        [("g", 7.0)] * 5, "g string, x double"
    )
    out = ts.mad_outliers(df, "g", "x", k=3.0)
    assert out.filter("is_outlier").count() == 0


# ---------------------------------------------------------- CDC apply
def test_cdc_apply_latest_wins_and_delete_drops(spark):
    feed = spark.createDataFrame(
        [
            (1, 1, "I", 100),
            (1, 2, "U", 110),
            (2, 1, "I", 200),
            (2, 2, "D", None),
            (3, 1, "I", 300),
            (3, 2, "D", None),
            (3, 3, "I", 330),  # re-insert after delete survives
        ],
        "k int, seq int, op string, v int",
    )
    out = {
        r["k"]: (r["v"], r["op"])
        for r in cdc.apply_changes(feed, ["k"], "seq", "op").collect()
    }
    assert out == {1: (110, "U"), 3: (330, "I")}


def test_cdc_apply_tie_prefers_delete(spark):
    # same seq twice (feed bug): delete wins deterministically
    feed = spark.createDataFrame(
        [(1, 1, "I", 100), (1, 1, "D", None)],
        "k int, seq int, op string, v int",
    )
    assert cdc.apply_changes(feed, ["k"], "seq", "op").count() == 0


# ------------------------------------------------------ triangle count
def test_triangle_count_k4(spark):
    # complete graph on 4 vertices: C(4,3) = 4 triangles
    edges = [
        (a, b) for a in range(4) for b in range(4) if a < b
    ]
    df = spark.createDataFrame(edges, "src int, dst int")
    row = graph.triangle_count(df).collect()[0]
    assert (row["n_vertices"], row["n_edges"], row["n_triangles"]) == (4, 6, 4)


def test_triangle_count_canonicalizes_input(spark):
    # duplicates, reversed orientations, and self-loops must not count
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)],
        "src int, dst int",
    )
    row = graph.triangle_count(df).collect()[0]
    assert (row["n_vertices"], row["n_edges"], row["n_triangles"]) == (3, 3, 1)


def test_triangle_count_star_has_none(spark):
    # hub star: max skew, zero triangles (the fan-out stress shape)
    df = spark.createDataFrame(
        [(0, i) for i in range(1, 40)], "src int, dst int"
    )
    row = graph.triangle_count(df).collect()[0]
    assert row["n_triangles"] == 0


# ----------------------------------------------------- tf-idf cosine
def test_tfidf_identical_docs_cosine_one(spark):
    # corpus must be large enough that the duplicated pair's shingles
    # (df = 2) survive the df <= N/2 index cap
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "one two three four five six seven"),
            (4, "eight nine ten eleven twelve"),
            (5, "red green blue cyan magenta"),
            (6, "north south east west center"),
        ],
        "id long, text string",
    )
    out = vsm.tfidf_cosine_join(docs, "id", "text", threshold=0.9)
    rows = out.collect()
    assert len(rows) == 1
    assert (rows[0]["id_a"], rows[0]["id_b"]) == (1, 2)
    assert rows[0]["cosine"] == pytest.approx(1.0, abs=1e-12)


def test_tfidf_df_cap_drops_universal_terms(spark):
    # a shingle present in every doc is dropped from the index
    docs = spark.createDataFrame(
        [(i, "common boiler plate") for i in range(4)],
        "id long, text string",
    )
    w = vsm.tfidf_weights(docs, "id", "text", max_df_ratio=0.5)
    assert w.count() == 0  # the only shingle has df = N > N/2


# -------------------------------------------------------- governance
def test_k_anonymity_report(spark):
    rows = [("a", "x", 1)] * 5 + [("a", "y", 2)] * 2 + [("b", "x", 3)]
    df = spark.createDataFrame(rows, "q1 string, q2 string, s int")
    rep = governance.k_anonymity_report(
        df, ["q1", "q2"], F.col("s"), k_threshold=5
    ).collect()[0]
    assert rep["n_rows"] == 8
    assert rep["n_groups"] == 3
    assert rep["k_anonymity"] == 1
    assert rep["l_diversity"] == 1
    assert rep["rows_at_risk"] == 3  # the 2-group and the 1-group
    assert rep["risk_per_myriad"] == 3750


def test_suppress_small_groups(spark):
    rows = [("a", i) for i in range(5)] + [("b", 9)]
    df = spark.createDataFrame(rows, "q string, v int")
    out = governance.suppress_small_groups(df, ["q"], k_threshold=5)
    assert sorted(r["q"] for r in out.collect()) == ["a"] * 5


# ---------------------------------------------------- quantile binning
def test_quantile_bin_balanced(spark):
    df = spark.createDataFrame(
        [("g", i, float(i % 7)) for i in range(100)],
        "g string, id int, v double",
    )
    out = features.quantile_bin(
        df, "g", "v", n_bins=10, order_tiebreak="id"
    )
    sizes = (
        out.groupBy("bin").count().orderBy("bin").select("count").collect()
    )
    assert [r["count"] for r in sizes] == [10] * 10


# ------------------------------------------------- last-touch truth
def test_attribution_window_semantics(spark):
    """Pin spark==truth for the attribution shape (the catalog oracle
    only proves spark==duckdb): a purchase 1 day after a click
    credits 'click'; one 8 days after the last touch is 'direct';
    a user with no touches at all is 'direct'."""
    import datetime as dt

    from etl_script_spark.plans.catalog import CATALOG

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: click then purchase next day -> click
        (1, base, 1, "click", 0.0),
        (2, base + dt.timedelta(days=1), 1, "purchase", 10.0),
        # user 2: view, then purchase 8 days later -> direct
        (3, base, 2, "view", 0.0),
        (4, base + dt.timedelta(days=8), 2, "purchase", 20.0),
        # user 3: purchase with no history -> direct
        (5, base, 3, "purchase", 30.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {
            r["channel"]: (r["n_conversions"], r["revenue"])
            for r in CATALOG["ev_attribution_last_touch"]
            .spark(spark, d)
            .collect()
        }
    assert out == {"click": (1, 10.0), "direct": (2, 50.0)}


# ------------------------------------------------- record linkage
def test_fellegi_sunter_scoring_and_blocking(spark):
    from etl_script_spark.operators import linkage

    left = spark.createDataFrame(
        [(1, "B1", "smith", "gold"), (2, "B2", "jones", "blue")],
        "l_id int, l_block string, l_name string, l_seg string",
    )
    right = spark.createDataFrame(
        [
            (10, "B1", "smith", "gold"),   # full agreement -> 30
            (11, "B1", "smyth", "iron"),   # name lev 1, seg off -> 20
            (12, "B1", "baker", "gold"),   # name off -> -2
            (13, "B9", "jones", "blue"),   # right name, WRONG block: unseen
        ],
        "r_id int, r_block string, r_name string, r_seg string",
    )
    out = linkage.link(
        left,
        right,
        block_on=[(F.col("l_block"), F.col("r_block"))],
        comparators=[
            linkage.Comparator(
                "name",
                F.levenshtein(F.col("l_name"), F.col("r_name")) <= 1,
                24,
                -8,
            ),
            linkage.Comparator(
                "seg", F.col("l_seg") == F.col("r_seg"), 6, -2
            ),
        ],
        threshold=20,
    )
    got = {(r["l_id"], r["r_id"]): r["score"] for r in out.collect()}
    # blocked-out true match (2,13) is absent by design; sub-threshold
    # (1,12) filtered; both B1 name-agreers retained with exact scores
    assert got == {(1, 10): 30, (1, 11): 22}


# --------------------------------------------------------- SemDeDup
def test_semantic_dedup_finds_planted_copy(spark):
    from etl_script_spark.operators.similarity import semantic_dedup_pairs

    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    rows.append((100, list(rows[3][1])))  # exact copy of id 3
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = semantic_dedup_pairs(
        df, "vec_id", "embedding", threshold=0.999, k=4, iters=2
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (3, 100) in got
    # every surviving pair really clears the threshold (exact verify)
    assert all(r["cosine"] >= 0.999 for r in pairs.collect())


def test_semantic_dedup_arrow_matches_expr(spark):
    """The Arrow fast path must find the same pair set as the
    bit-replayable expression path away from exact-tie boundaries."""
    from etl_script_spark.operators.similarity import semantic_dedup_pairs

    import random

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    rows += [(200 + i, list(rows[i][1])) for i in range(5)]  # 5 copies
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(threshold=0.999, k=4, iters=1)
    expr_pairs = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(
            df, "vec_id", "embedding", impl="expr", **kw
        ).collect()
    }
    arrow_pairs = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(
            df, "vec_id", "embedding", impl="arrow", **kw
        ).collect()
    }
    assert expr_pairs == arrow_pairs
    assert all((i, 200 + i) in arrow_pairs for i in range(5))


def test_mad_outliers_null_group_rows_survive(spark):
    # left-join convention: a NULL group key row passes through with a
    # NULL flag instead of vanishing (features.zscore convention)
    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", 3.0), (None, 9.0)],
        "g string, x double",
    )
    out = ts.mad_outliers(df, "g", "x", k=3.0)
    assert out.count() == 4
    nullrow = out.filter(F.col("g").isNull()).collect()[0]
    assert nullrow["is_outlier"] is None


# ----------------------------------------------------------- k-core
def test_kcore_peel_cascade(spark):
    """Triangle + a pendant chain: the 2-core is the triangle, and the
    chain peels away over SUCCESSIVE rounds (vertex 4 only becomes
    peelable after 5 is gone) — pins the iterative cascade, not just
    one filter pass."""
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src int, dst int")
    surv1 = {r["vertex"] for r in graph.kcore_peel(df, 2, 1).collect()}
    assert surv1 == {1, 2, 3, 4}  # round 1 only drops leaf 5
    surv2 = {r["vertex"] for r in graph.kcore_peel(df, 2, 2).collect()}
    assert surv2 == {1, 2, 3}  # round 2 drops the now-exposed 4
    out = {r["vertex"]: r["deg"] for r in graph.kcore_peel(df, 2, 3).collect()}
    assert out == {1: 2, 2: 2, 3: 2}  # stable triangle


def test_kcore_whole_graph_can_dissolve(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "src int, dst int")
    assert graph.kcore_peel(df, 2, 2).count() == 0  # a path has no 2-core


# ----------------------------------------------- conversation flatten
def test_flatten_turns_order_and_budget(spark):
    from etl_script_spark.operators import conversations

    rows = [
        (1, 2, "assistant", "second"),
        (1, 1, "user", "first"),
        (1, 3, "user", "third"),
        (2, 1, "user", "x" * 50),
    ]
    df = spark.createDataFrame(rows, "conv int, turn int, role string, msg string")
    out = {
        r["conv"]: (r["n_turns"], r["transcript"])
        for r in conversations.flatten_turns(
            df, ["conv"], ["turn"], F.col("role"), F.col("msg"),
            max_chars=20,
        ).collect()
    }
    # order restored despite shuffled input; budget truncates
    assert out[1][0] == 3
    assert out[1][1] == "user: first\nassistan"  # 12 + 8 = 20 chars
    assert out[2][1] == ("user: " + "x" * 50)[:20]
