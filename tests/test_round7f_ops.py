"""Round-7f operator batch: sorted-neighborhood blocking, as-of join
with tolerance (both directions), Theil-Sen robust slope, hashed
multiplier-bootstrap CI, KMV set-similarity sketch, WoE encoding, and
fixed-anchor LTTB downsampling — each checked against a brute-force
Python twin on in-memory fixtures."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from etl_script_spark.operators import features, linkage, sketches, stats
from etl_script_spark.operators import timeseries as ts_ops
from etl_script_spark.operators.asof import asof_join_tolerance
from tests.conftest import *  # noqa: F401,F403  (spark fixture)


# ------------------------------------------------------------------ #
# sorted-neighborhood blocking
# ------------------------------------------------------------------ #

def test_sorted_neighborhood_matches_brute_force(spark):
    names = ["ada", "adb", "bob", "bobby", "carol", "carl", "dave",
             "adc", "bo", "ca"]
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "id long, k string"
    )
    w = 4
    out = linkage.sorted_neighborhood_pairs(df, "id", "k", window=w,
                                            prefix_len=1)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    order = sorted(range(len(names)), key=lambda i: (names[i], i))
    want = {
        (order[i], order[j])
        for i in range(len(order))
        for j in range(i + 1, min(i + w, len(order)))
    }
    assert got == want


def test_sorted_neighborhood_positions_are_global(spark):
    # two prefix buckets; positions must be a single global 1..n
    df = spark.createDataFrame(
        [(i, ("a" if i % 2 else "b") + str(i)) for i in range(20)],
        "id long, k string",
    )
    out = linkage.sorted_neighborhood_pairs(df, "id", "k", window=2,
                                            prefix_len=1)
    rows = out.collect()
    assert all(r["pos_b"] - r["pos_a"] == 1 for r in rows)
    assert len(rows) == 19  # adjacent pairs of a 20-row global order


def test_sorted_neighborhood_guards(spark):
    df = spark.createDataFrame([(1, "x")], "id long, k string")
    with pytest.raises(ValueError):
        linkage.sorted_neighborhood_pairs(df, "id", "k", window=1)
    with pytest.raises(ValueError):
        linkage.sorted_neighborhood_pairs(df, "id", "k", prefix_len=0)


# ------------------------------------------------------------------ #
# as-of join with tolerance
# ------------------------------------------------------------------ #

def _asof_brute(left, right, tol_us, direction):
    out = {}
    for lid, key, lts in left:
        best = None
        for key_r, rts, pay in right:
            if key_r != key:
                continue
            gap = (lts - rts) if direction == "backward" else (rts - lts)
            if gap < 0 or gap > tol_us:
                continue
            if best is None or gap < best[0]:
                best = (gap, pay)
        out[lid] = best
    return out


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_tolerance_both_directions(spark, direction):
    base = 1_600_000_000_000_000  # epoch micros
    left = [(i, i % 3, base + i * 700_000) for i in range(30)]
    right = [(k, base + j * 1_000_000, 100 + k * 10 + j)
             for k in range(3) for j in range(20)]
    ldf = spark.createDataFrame(
        [(i, k, ts) for i, k, ts in left], "lid long, k long, tus long"
    ).select("lid", "k", F.timestamp_micros("tus").alias("ts"))
    rdf = spark.createDataFrame(
        [(k, ts, p) for k, ts, p in right], "k long, tus long, pay long"
    ).select("k", F.timestamp_micros("tus").alias("ts"), "pay")
    tol = 2  # seconds
    out = asof_join_tolerance(
        ldf, rdf, on="k", left_ts="ts", right_ts="ts",
        payload={"pay": "pay"}, tolerance_sec=tol, direction=direction,
    )
    got = {r["lid"]: (r["__gap_us"], r["pay"]) for r in out.collect()}
    want = _asof_brute(left, right, tol * 1_000_000, direction)
    assert set(got) == set(want)
    for lid, best in want.items():
        if best is None:
            assert got[lid] == (None, None)
        else:
            assert got[lid] == best


def test_asof_tolerance_guards(spark):
    df = spark.createDataFrame([(1, 1)], "k long, ts long").select(
        "k", F.timestamp_micros("ts").alias("ts")
    )
    with pytest.raises(ValueError):
        asof_join_tolerance(df, df, "k", "ts", "ts", {}, 1, "sideways")
    with pytest.raises(ValueError):
        asof_join_tolerance(df, df, "k", "ts", "ts", {}, -1)


# ------------------------------------------------------------------ #
# Theil-Sen
# ------------------------------------------------------------------ #

def _ts_slope_micro(pts):
    slopes = []
    for i in range(len(pts)):
        for j in range(len(pts)):
            if pts[i][0] < pts[j][0]:
                dy = pts[j][1] - pts[i][1]
                dx = pts[j][0] - pts[i][0]
                mag = (abs(dy) * 1_000_000) // dx
                slopes.append(-mag if dy < 0 else mag)
    slopes.sort()
    return len(slopes), slopes[(len(slopes) + 1) // 2 - 1]


def test_theil_sen_matches_brute_force(spark):
    groups = {
        "a": [(1, 10), (2, 30), (3, 20), (5, 90), (8, 70)],
        "b": [(1, 5), (2, -4), (4, 12), (7, 3)],
    }
    rows = [(g, x, y) for g, pts in groups.items() for x, y in pts]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r["group"]: (r["n_pairs"], r["slope_micro"])
           for r in stats.theil_sen_groups(df, "g", "x", "y").collect()}
    for g, pts in groups.items():
        assert out[g] == _ts_slope_micro(pts)


def test_theil_sen_outlier_robust(spark):
    # y = 2x except one wild outlier; OLS would be dragged, TS is not
    pts = [(x, 2 * x) for x in range(1, 20)] + [(20, 100000)]
    df = spark.createDataFrame([("g", x, y) for x, y in pts],
                               "g string, x long, y long")
    r = stats.theil_sen_groups(df, "g", "x", "y").collect()[0]
    assert r["slope_micro"] == 2_000_000


# ------------------------------------------------------------------ #
# bootstrap CI
# ------------------------------------------------------------------ #

def _pois_w(seed, b, rid):
    u = int(hashlib.md5(f"{seed}|{b}|{rid}".encode()).hexdigest()[:8], 16)
    return sum(1 for c in stats._POIS1_CDF_2P32 if u >= c)


def test_bootstrap_ci_matches_brute_force(spark):
    vals = [(i, (i * 37) % 100 + 1) for i in range(200)]
    df = spark.createDataFrame(vals, "id long, x long")
    out = stats.bootstrap_ci_mean(df, "id", "x", n_boot=16,
                                  lo_pct=25, hi_pct=75, seed="t").collect()[0]
    means = []
    for b in range(16):
        wn = wx = 0
        for rid, x in vals:
            w = _pois_w("t", b, rid)
            wn += w
            wx += w * x
        if wn:
            means.append((wx * 1_000_000) // wn)
    means.sort()
    lo_pos = (16 * 25 + 99) // 100       # 4
    hi_pos = 16 - (16 * 25 + 99) // 100 + 1  # 13
    assert out["n_boot"] == len(means)
    assert out["lo_micro"] == means[lo_pos - 1]
    assert out["hi_micro"] == means[hi_pos - 1]
    total = sum(x for _, x in vals)
    assert out["mean_micro"] == (total * 1_000_000) // len(vals)


def test_bootstrap_ci_weights_mean_near_one(spark):
    # Poisson(1) weights must average ~1 so replicate sizes track n
    n = 2000
    ws = [_pois_w("s", 0, i) for i in range(n)]
    assert 0.93 < sum(ws) / n < 1.07


def test_bootstrap_ci_guards(spark):
    df = spark.createDataFrame([(1, 1)], "id long, x long")
    with pytest.raises(ValueError):
        stats.bootstrap_ci_mean(df, "id", "x", n_boot=2)
    with pytest.raises(ValueError):
        stats.bootstrap_ci_mean(df, "id", "x", lo_pct=60, hi_pct=50)


# ------------------------------------------------------------------ #
# KMV
# ------------------------------------------------------------------ #

def _h60(seed, key):
    return int(hashlib.md5(f"{seed}|{key}".encode()).hexdigest()[:15], 16)


def test_kmv_exact_when_k_covers_sets(spark):
    a = spark.createDataFrame([(f"w{i}",) for i in range(40)], "w string")
    b = spark.createDataFrame([(f"w{i}",) for i in range(20, 60)],
                              "w string")
    out = sketches.kmv_jaccard(a, "w", b, "w", k=512).collect()[0]
    # union 60 < k: sketches hold EVERYTHING, so the estimate is exact
    assert out["k_used"] == 60
    assert out["inter_cnt"] == 20
    assert out["jaccard_ppb"] == (20 * 1_000_000_000) // 60
    assert out["union_est"] == 60


def test_kmv_sketch_is_k_smallest_hashes(spark):
    keys = [f"k{i}" for i in range(100)]
    df = spark.createDataFrame([(k,) for k in keys], "w string")
    got = [r["h"] for r in sketches.kmv_sketch(df, "w", 10).collect()]
    want = sorted(_h60("kmv", k) for k in keys)[:10]
    assert sorted(got) == want


def test_kmv_estimator_within_tolerance(spark):
    # jaccard 1/3 (1000 shared / 3000 union), k=256 -> se ~ 3%
    a = spark.createDataFrame([(f"x{i}",) for i in range(2000)], "w string")
    b = spark.createDataFrame([(f"x{i}",) for i in range(1000, 3000)],
                              "w string")
    out = sketches.kmv_jaccard(a, "w", b, "w", k=256).collect()[0]
    assert abs(out["jaccard_ppb"] / 1e9 - 1 / 3) < 0.12
    assert abs(out["union_est"] - 3000) / 3000 < 0.25


# ------------------------------------------------------------------ #
# WoE
# ------------------------------------------------------------------ #

def test_woe_matches_hand_computation(spark):
    rows = [("a", 1)] * 30 + [("a", 0)] * 10 + [("b", 1)] * 5 + \
           [("b", 0)] * 55
    df = spark.createDataFrame(rows, "c string, y int")
    out = {r["category"]: r for r in
           features.woe_encoding(df, "c", F.col("y") == 1).collect()}
    p, q, k = 35, 65, 2
    for cat, pos, n in [("a", 30, 40), ("b", 5, 60)]:
        ps = (pos + 1) / (p + k)
        qs = (n - pos + 1) / (q + k)
        woe = round((math.log(ps) - math.log(qs)) * 1e6)
        assert out[cat]["woe_micro"] == woe
        assert out[cat]["iv_micro"] == round((ps - qs) * woe)
        assert (out[cat]["n"], out[cat]["pos"]) == (n, pos)
    # signs: 'a' is positive-evidence, 'b' negative
    assert out["a"]["woe_micro"] > 0 > out["b"]["woe_micro"]


# ------------------------------------------------------------------ #
# LTTB
# ------------------------------------------------------------------ #

def test_lttb_pins_endpoints_and_bucket_count(spark):
    pts = [(t, (t * 13) % 97) for t in range(500)]
    df = spark.createDataFrame(pts, "t long, v long")
    out = sorted((r["bucket"], r["ts"], r["value"])
                 for r in ts_ops.lttb_downsample(df, "t", "v",
                                                 n_buckets=20).collect())
    assert len(out) == 20          # every bucket occupied -> one point each
    assert out[0][1] == 0          # earliest bucket pins min-ts point
    assert out[-1][1] == 499       # latest bucket pins max-ts point


def test_lttb_keeps_spike(spark):
    # flat series with one huge spike: the spike's bucket must pick it
    pts = [(t, 10) for t in range(300)]
    pts[137] = (137, 100000)
    df = spark.createDataFrame(pts, "t long, v long")
    out = {r["ts"]: r["value"]
           for r in ts_ops.lttb_downsample(df, "t", "v",
                                           n_buckets=10).collect()}
    assert out.get(137) == 100000


def test_lttb_guard(spark):
    df = spark.createDataFrame([(1, 1)], "t long, v long")
    with pytest.raises(ValueError):
        ts_ops.lttb_downsample(df, "t", "v", n_buckets=2)
