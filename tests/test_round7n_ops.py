"""Round-7n operator batch: Welch t-test, diff-in-differences,
autocomplete prefix top-k, and the greedy k-center coreset — each
against a brute-force Python twin."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from etl_script_spark.operators import search, similarity, stats
from tests.conftest import *  # noqa: F401,F403  (spark fixture)


def _isqrt(n: int) -> int:
    import math

    return math.isqrt(n)


def test_welch_matches_integer_brute_force(spark):
    a = [120, 135, 150, 101, 98, 143, 170, 110]
    b = [90, 95, 102, 88, 130, 92]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, x long")
    out = stats.welch_ttest(df, "g", "x", "a", "b").collect()[0]
    na, nb = len(a), len(b)
    sa, sb = sum(a), sum(b)
    qa, qb = sum(v * v for v in a), sum(v * v for v in b)
    ma = (sa * 1_000_000) // na
    mb = (sb * 1_000_000) // nb
    sea2 = ((na * qa - sa * sa) * 1_000_000) // (na * (na - 1) * na)
    seb2 = ((nb * qb - sb * sb) * 1_000_000) // (nb * (nb - 1) * nb)
    se = _isqrt(sea2 + seb2)
    dmean = ma - mb
    t = (abs(dmean) // se) * (1 if dmean >= 0 else -1)
    assert (out["n_a"], out["n_b"]) == (na, nb)
    assert out["dmean_micro"] == dmean
    assert out["t_milli"] == t
    df_f = (sea2 + seb2) ** 2 / (sea2**2 / (na - 1) + seb2**2 / (nb - 1))
    assert abs(out["df_micro"] / 1e6 - df_f) < 1e-3


def test_welch_antisymmetric(spark):
    rows = [("a", v) for v in (10, 20, 30)] + [("b", v) for v in (5, 6, 40)]
    df = spark.createDataFrame(rows, "g string, x long")
    t1 = stats.welch_ttest(df, "g", "x", "a", "b").collect()[0]
    t2 = stats.welch_ttest(df, "g", "x", "b", "a").collect()[0]
    assert t1["dmean_micro"] == -t2["dmean_micro"]
    assert abs(t1["t_milli"] + t2["t_milli"]) <= 1  # DIV truncation


def test_diff_in_diff_hand_computed(spark):
    rows = [
        # treated pre: mean 10; treated post: mean 30 (+20)
        ("g", True, False, 10), ("g", True, False, 10),
        ("g", True, True, 20), ("g", True, True, 40),
        # control pre: mean 5; control post: mean 10 (+5)
        ("g", False, False, 5), ("g", False, True, 10),
    ]
    df = spark.createDataFrame(rows, "grp string, tr boolean, po boolean, v long")
    out = stats.diff_in_diff(
        df, "grp", F.col("tr"), F.col("po"), F.col("v")
    ).collect()[0]
    assert out["did_micro"] == (30 - 10) - (10 - 5)
    assert (out["n_t_pre"], out["n_t_post"]) == (2, 2)


def test_diff_in_diff_empty_cell_is_null(spark):
    rows = [("g", True, True, 10), ("g", False, False, 5),
            ("g", False, True, 7)]
    df = spark.createDataFrame(rows, "grp string, tr boolean, po boolean, v long")
    out = stats.diff_in_diff(
        df, "grp", F.col("tr"), F.col("po"), F.col("v")
    ).collect()[0]
    assert out["did_micro"] is None  # treated-pre cell empty


def test_autocomplete_matches_brute_force(spark):
    texts = ["apple apply apple banana", "application apple banana band",
             "bandit apply appliance"] * 3
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    out = search.autocomplete_prefix_topk(df, "text", prefix_len=3, k=2,
                                          min_count=2)
    got = {(r["prefix"], r["rank"]): (r["word"], r["cnt"])
           for r in out.collect()}
    counts: dict = {}
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if len(w) >= 3:
                counts[w] = counts.get(w, 0) + 1
    want: dict = {}
    for w, c in counts.items():
        if c >= 2:
            want.setdefault(w[:3], []).append((-c, w))
    for pfx, lst in want.items():
        for rank, (negc, w) in enumerate(sorted(lst)[:2], 1):
            assert got[(pfx, rank)] == (w, -negc)
    assert len(got) == sum(min(2, len(v)) for v in want.values())


def test_autocomplete_guards(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        search.autocomplete_prefix_topk(df, "text", prefix_len=0)
    with pytest.raises(ValueError):
        search.autocomplete_prefix_topk(df, "text", k=0)


def _kcenter_brute(vecs: dict, k: int):
    ids = sorted(vecs)
    centers = [ids[0]]
    dists = [None]
    while len(centers) < k:
        best = None
        for i in ids:
            d = min(
                sum((a - b) ** 2 for a, b in zip(vecs[i], vecs[c]))
                for c in centers
            )
            if best is None or d > best[0] or (d == best[0] and i < best[1]):
                if best is None or d > best[0]:
                    best = (d, i)
        centers.append(best[1])
        dists.append(best[0])
    return centers, dists


def test_kcenter_matches_brute_force(spark):
    vecs = {
        0: [0.0, 0.0], 1: [1.0, 0.0], 2: [0.0, 1.0],
        3: [10.0, 10.0], 4: [-8.0, 3.0], 5: [5.0, -7.0], 6: [9.5, 9.5],
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    out = sorted(
        (r["sel_order"], r["vec_id"], r["d2_ppb"])
        for r in similarity.kcenter_coreset(df, "vec_id", "embedding",
                                            k=4).collect()
    )
    centers, dists = _kcenter_brute(vecs, 4)
    assert [c for _, c, _ in out] == centers
    # coverage radius is non-increasing
    radii = [d for _, _, d in out if d is not None]
    assert radii == sorted(radii, reverse=True)


def test_kcenter_k1_is_seed_only(spark):
    df = spark.createDataFrame([(7, [1.0]), (3, [2.0])],
                               "vec_id long, embedding array<float>")
    out = similarity.kcenter_coreset(df, "vec_id", "embedding", k=1).collect()
    assert len(out) == 1 and out[0]["vec_id"] == 3
    with pytest.raises(ValueError):
        similarity.kcenter_coreset(df, "vec_id", "embedding", k=0)


# ------------------------------------------------------------------ #
# Hilbert layout
# ------------------------------------------------------------------ #

def _hilbert_ref(x: int, y: int, bits: int) -> int:
    n = 1 << bits
    x, y = x % n, y % n
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_key_matches_reference(spark):
    from etl_script_spark.sources import layout

    pts = [(i, (i * 7) % 300, (i * 13) % 300) for i in range(400)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    out = layout.with_hilbert_key(df, "x", "y", bits=8, out_col="h")
    got = {r["id"]: r["h"] for r in out.collect()}
    for i, x, y in pts:
        assert got[i] == _hilbert_ref(x, y, 8), (i, x, y)


def test_hilbert_is_bijective_on_grid(spark):
    from etl_script_spark.sources import layout

    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    out = layout.with_hilbert_key(df, "x", "y", bits=4, out_col="h")
    rows = {(r["x"], r["y"]): r["h"] for r in out.collect()}
    hs = sorted(rows.values())
    assert hs == list(range(256))  # a bijection onto 0..n^2-1
    inv = {h: xy for xy, h in rows.items()}
    # consecutive curve positions are always grid-adjacent — the
    # locality property that makes it a HILBERT curve, not just a
    # bijection
    assert all(
        abs(inv[i][0] - inv[i + 1][0]) + abs(inv[i][1] - inv[i + 1][1]) == 1
        for i in range(255)
    )


def test_hilbert_locality_beats_zorder_on_box(spark):
    """The selling point: consecutive curve positions are always
    grid-adjacent, so a box maps to fewer index intervals than
    Z-order's diagonal-jump code."""
    def intervals(codes):
        codes = sorted(codes)
        return 1 + sum(1 for a, b in zip(codes, codes[1:]) if b > a + 1)

    from etl_script_spark.sources import layout

    df = spark.createDataFrame(
        [(x, y) for x in range(32) for y in range(32)], "x long, y long"
    )
    hk = layout.with_hilbert_key(df, "x", "y", bits=5, out_col="h")
    box = [
        (r["x"], r["y"], r["h"])
        for r in hk.collect()
        if 8 <= r["x"] <= 15 and 8 <= r["y"] <= 15
    ]
    h_int = intervals([h for _, _, h in box])
    z_codes = [
        sum(((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
            for b in range(5))
        for x, y, _ in box
    ]
    assert h_int <= intervals(z_codes)


def test_hilbert_guard(spark):
    from etl_script_spark.sources import layout

    df = spark.createDataFrame([(1, 1)], "x long, y long")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        layout.with_hilbert_key(df, "x", "y", bits=0)


# ------------------------------------------------------------------ #
# mutual kNN + dataset fingerprint
# ------------------------------------------------------------------ #

def test_mutual_knn_keeps_only_reciprocal_pairs(spark):
    # directed top-1 lists: 1->2, 2->1 (mutual); 3->1 (one-way)
    edges = [(1, 2), (2, 1), (3, 1), (4, 4)]
    df = spark.createDataFrame(edges, "query_id long, vec_id long")
    out = {(r["id_a"], r["id_b"])
           for r in similarity.mutual_knn_pairs(df).collect()}
    assert out == {(1, 2)}  # canonical a < b, self-pair dropped


def test_dataset_fingerprint_order_and_partition_invariant(spark):
    from etl_script_spark.operators import governance

    rows = [("s", i, f"t{i}") for i in range(100)]
    a = spark.createDataFrame(rows, "src string, id long, txt string")
    b = spark.createDataFrame(list(reversed(rows)),
                              "src string, id long, txt string").repartition(7)
    fa = governance.dataset_fingerprint(a, "src", ["id", "txt"]).collect()[0]
    fb = governance.dataset_fingerprint(b, "src", ["id", "txt"]).collect()[0]
    assert fa["fingerprint"] == fb["fingerprint"]
    assert fa["n_rows"] == 100


def test_dataset_fingerprint_detects_single_byte_and_null(spark):
    from etl_script_spark.operators import governance

    base = [("s", 1, "abc"), ("s", 2, "xyz")]
    f0 = governance.dataset_fingerprint(
        spark.createDataFrame(base, "src string, id long, txt string"),
        "src", ["id", "txt"]).collect()[0]["fingerprint"]
    flip = governance.dataset_fingerprint(
        spark.createDataFrame([("s", 1, "abd"), ("s", 2, "xyz")],
                              "src string, id long, txt string"),
        "src", ["id", "txt"]).collect()[0]["fingerprint"]
    nullv = governance.dataset_fingerprint(
        spark.createDataFrame([("s", 1, ""), ("s", 2, "xyz")],
                              "src string, id long, txt string"),
        "src", ["id", "txt"]).collect()[0]["fingerprint"]
    nonev = governance.dataset_fingerprint(
        spark.createDataFrame([("s", 1, None), ("s", 2, "xyz")],
                              "src string, id long, txt string"),
        "src", ["id", "txt"]).collect()[0]["fingerprint"]
    assert len({f0, flip, nullv, nonev}) == 4  # all distinct


def test_stream_fingerprint_equals_batch(spark):
    """The monoid contract: the streaming aggregation's drained state
    equals the batch fingerprint over the same rows."""
    from etl_script_spark.operators import governance
    from etl_script_spark.plans.catalog import CATALOG, t

    sf_dir = "/root/testdata/sf0.001"
    streamed = {
        (r["group"], r["n_rows"], r["fingerprint"])
        for r in CATALOG["st_stream_fingerprint"]
        .spark(spark, sf_dir).collect()
    }
    e = t(spark, sf_dir, "events").withColumn(
        "vmic", F.expr("CAST(ROUND(value * 1000000) AS BIGINT)")
    )
    batch = {
        (r["group"], r["n_rows"], r["fingerprint"])
        for r in governance.dataset_fingerprint(
            e, "event_type", ["event_id", "user_id", "vmic"]
        ).collect()
    }
    assert streamed == batch


def test_diff_in_diff_negative_values_exact(spark):
    """The offset/split-sum accumulation must stay exact for signed
    micro values."""
    rows = [("g", True, False, -7), ("g", True, False, -3),
            ("g", True, True, 11), ("g", False, False, -100),
            ("g", False, True, -90)]
    df = spark.createDataFrame(rows, "grp string, tr boolean, po boolean, v long")
    out = stats.diff_in_diff(
        df, "grp", F.col("tr"), F.col("po"), F.col("v")
    ).collect()[0]
    # t_pre mean = -5, t_post mean = 11; c_pre = -100, c_post = -90
    assert out["did_micro"] == (11 - (-5)) - ((-90) - (-100))


def test_maintain_fingerprint_equals_recompute(spark):
    from etl_script_spark.operators import governance

    rows = [("s", i, f"t{i}") for i in range(50)]
    base = spark.createDataFrame(rows[:40], "src string, id long, txt string")
    changes = spark.createDataFrame(
        [("s", i, f"t{i}", "I") for i in range(40, 50)]
        + [("s", i, f"t{i}", "D") for i in range(0, 10)],
        "src string, id long, txt string, op string",
    )
    maintained = governance.maintain_fingerprint(
        base, changes, "src", ["id", "txt"], "op"
    ).collect()[0]
    final = spark.createDataFrame(rows[10:], "src string, id long, txt string")
    recomputed = governance.dataset_fingerprint(
        final, "src", ["id", "txt"]
    ).collect()[0]
    assert maintained["fingerprint"] == recomputed["fingerprint"]
    assert maintained["n_rows"] == recomputed["n_rows"] == 40


def test_maintain_fingerprint_group_emptied_drops(spark):
    from etl_script_spark.operators import governance

    base = spark.createDataFrame([("a", 1, "x"), ("b", 2, "y")],
                                 "src string, id long, txt string")
    changes = spark.createDataFrame([("a", 1, "x", "D")],
                                    "src string, id long, txt string, op string")
    out = {r["group"] for r in governance.maintain_fingerprint(
        base, changes, "src", ["id", "txt"], "op").collect()}
    assert out == {"b"}
