"""Round-7c operator batch: Spearman rank correlation + the shared
integer-sqrt correlation convention, per-key ACF, leave-one-out target
encoding, t-closeness, multi-source BFS, label propagation — each
checked against a brute-force Python twin of the exact integer
convention (math.isqrt + //), so the tests prove the SPECIFIED
arithmetic, not merely cross-engine agreement."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from etl_script_spark.operators import features, governance, graph, stats
from etl_script_spark.operators import timeseries
from tests.conftest import *  # noqa: F401,F403  (spark fixture)


# ---------------------------------------------------------------------------
# The corr convention: brute Python twin
# ---------------------------------------------------------------------------


def _ladder(q):
    if q <= 10**9:
        return 10**9
    if q <= 10**15:
        return 10**6
    if q <= 10**21:
        return 10**3
    return 1


def _corr_ppb_brute(pairs):
    """Replays corr_ppb_from_suffstats with exact Python integers."""
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    syy = sum(y * y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    num = n * sxy - sx * sy
    qx = (n * sxx - sx * sx) // n
    qy = (n * syy - sy * sy) // n
    kx, ky = _ladder(qx), _ladder(qy)
    bx = math.isqrt(qx * kx * kx)
    by = math.isqrt(qy * ky * ky)
    if bx * by == 0:
        return None
    mag = (abs(num) // n) * kx * ky * 1_000_000_000 // (bx * by)
    return -mag if num < 0 else mag


def _midranks_doubled(vals):
    """value -> doubled average rank over the multiset."""
    out = {}
    below = 0
    for v in sorted(set(vals)):
        c = vals.count(v)
        out[v] = 2 * below + c + 1
        below += c
    return out


def _spearman_brute(xy):
    rx = _midranks_doubled([x for x, _ in xy])
    ry = _midranks_doubled([y for _, y in xy])
    return _corr_ppb_brute([(rx[x], ry[y]) for x, y in xy])


def test_isqrt_column_exact_over_decades(spark):
    vals = [0, 1, 2, 3, 4, 8, 9, 15, 16, 10**6, 10**12 + 7, 10**18 + 11,
            10**24 + 13, 10**28 + 17, (10**14 + 3) ** 2, (10**14 + 3) ** 2 - 1]
    df = spark.createDataFrame([(str(v),) for v in vals], "s string")
    out = df.select(
        F.col("s"),
        stats.isqrt_column(F.col("s").cast("decimal(38,0)"))
        .cast("string").alias("r"),
    ).collect()
    for row in out:
        assert int(row["r"]) == math.isqrt(int(row["s"])), row


def test_spearman_matches_brute_force_with_ties(spark):
    rng = random.Random(73)
    xy = [(rng.randint(0, 15), rng.randint(0, 300)) for _ in range(413)]
    df = spark.createDataFrame(xy, "x int, y int")
    row = stats.spearman_rho(df, "x", "y").collect()[0]
    assert row["n"] == 413
    assert row["rho_ppb"] == _spearman_brute(xy)


def test_spearman_monotone_and_degenerate(spark):
    mono = [(i, i * i) for i in range(50)]
    df = spark.createDataFrame(mono, "x int, y int")
    r = stats.spearman_rho(df, "x", "y").collect()[0]["rho_ppb"]
    # perfect monotone: ranks identical -> |rho - 1| bounded by the
    # fdiv truncations (~1/qx relative, ~3e-5 at n=50; sub-ppb at
    # realistic n) — and the Spark value must equal the convention
    assert r == _spearman_brute(mono)
    assert abs(r - 1_000_000_000) < 100_000
    anti = [(i, -i) for i in range(50)]
    df = spark.createDataFrame(anti, "x int, y int")
    r = stats.spearman_rho(df, "x", "y").collect()[0]["rho_ppb"]
    assert r == _spearman_brute(anti)
    assert abs(r + 1_000_000_000) < 100_000
    const = [(i, 7) for i in range(10)]
    df = spark.createDataFrame(const, "x int, y int")
    assert stats.spearman_rho(df, "x", "y").collect()[0]["rho_ppb"] is None


def test_acf_lags_matches_brute_force(spark):
    rng = random.Random(7)
    series = {"k1": [rng.randint(0, 1000) for _ in range(80)],
              "k2": [100 + (i % 7) * 13 for i in range(40)]}
    rows = [(k, i, v) for k, vs in series.items() for i, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "k string, i int, v int")
    got = {
        (r["k"], r["lag"]): (r["n"], r["corr_ppb"])
        for r in timeseries.acf_lags(df, ["k"], ["i"], "v", max_lag=3).collect()
    }
    for k, vs in series.items():
        for lag in (1, 2, 3):
            pairs = [(vs[i], vs[i - lag]) for i in range(lag, len(vs))]
            assert got[(k, lag)] == (len(pairs), _corr_ppb_brute(pairs)), (k, lag)


def test_acf_detects_periodicity(spark):
    # period-2 alternation: lag-1 strongly negative, lag-2 strongly +
    rows = [("k", i, 100 if i % 2 == 0 else -100) for i in range(200)]
    df = spark.createDataFrame(rows, "k string, i int, v int")
    got = {r["lag"]: r["corr_ppb"]
           for r in timeseries.acf_lags(df, ["k"], ["i"], "v", 2).collect()}
    assert got[1] < -990_000_000 and got[2] > 990_000_000


# ---------------------------------------------------------------------------
# target encoding / t-closeness
# ---------------------------------------------------------------------------


def test_target_encode_loo_hand_example(spark):
    # category A: targets 1,0,1 (sum 2); B: 0,0 (sum 0); global 3/5
    rows = [("A", 1), ("A", 0), ("A", 1), ("B", 0), ("B", 1)]
    df = spark.createDataFrame(rows, "c string, t int")
    out = {(r["c"], r["t"], r["enc_ppm"])
           for r in features.target_encode_loo(df, "c", "t", smoothing=2)
           .collect()}
    gm = 3 * 1_000_000 // 5
    def enc(s_c, n_c, t):
        return ((s_c - t) * 1_000_000 + 2 * gm) // (n_c - 1 + 2)
    assert out == {
        ("A", 1, enc(2, 3, 1)), ("A", 0, enc(2, 3, 0)),
        ("B", 0, enc(1, 2, 0)), ("B", 1, enc(1, 2, 1)),
    }


def test_target_encode_loo_singleton_falls_back_to_prior(spark):
    rows = [("A", 1), ("A", 0), ("S", 1)]
    df = spark.createDataFrame(rows, "c string, t int")
    got = {r["c"]: r["enc_ppm"]
           for r in features.target_encode_loo(df, "c", "t", smoothing=5)
           .collect() if r["c"] == "S"}
    gm = 2 * 1_000_000 // 3
    # singleton: (S_c - t) = 0, denominator = smoothing -> exactly prior
    assert got["S"] == 5 * gm // 5


def test_t_closeness_uniform_group_is_zero_and_skewed_breaches(spark):
    # global sensitive dist: 50/50; group g1 mirrors it (tvd 0),
    # group g2 is all-one-value (tvd = |1-.5|/2 + |0-.5|/2 = .5)
    rows = (
        [("g1", "s1")] * 10 + [("g1", "s2")] * 10
        + [("g2", "s1")] * 20
        + [("g3", "s2")] * 20
    )
    df = spark.createDataFrame(rows, "g string, s string")
    out = {r["g"]: (r["tvd_ppm"], r["breach"])
           for r in governance.t_closeness_report(df, ["g"], "s", 300000)
           .collect()}
    assert out["g1"] == (0, False)
    assert out["g2"] == (500_000, True)
    assert out["g3"] == (500_000, True)


def test_t_closeness_absent_category_mass_counted(spark):
    # g2 never sees s3; the absent-mass term must still contribute
    rows = [("g1", "s1"), ("g1", "s2"), ("g1", "s3"), ("g2", "s1")]
    df = spark.createDataFrame(rows, "g string, s string")
    out = {r["g"]: r["tvd_ppm"]
           for r in governance.t_closeness_report(df, ["g"], "s", 1).collect()}
    # g2: p(s1|g)=1 vs 2/4 -> dev .5; s2,s3 absent: .25 + .25 -> tvd = .5
    assert out["g2"] == 500_000


# ---------------------------------------------------------------------------
# BFS / label propagation
# ---------------------------------------------------------------------------


def test_bfs_hops_chain_and_unreachable(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11)],
        "src long, dst long",
    )
    sources = spark.createDataFrame([(1,)], "vertex long")
    out = {r["vertex"]: r["hops"]
           for r in graph.bfs_hops(edges, sources, max_hops=4).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4,
                   6: None, 10: None, 11: None}


def test_bfs_hops_multi_source_takes_min(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (9, 4)], "src long, dst long"
    )
    sources = spark.createDataFrame([(1,), (9,)], "vertex long")
    out = {r["vertex"]: r["hops"]
           for r in graph.bfs_hops(edges, sources, max_hops=4).collect()}
    assert out[4] == 1  # via 9, not the 3-hop path via 1


def test_label_propagation_keeps_bridged_triangles_apart(spark):
    # two triangles {1,2,3} and {7,8,9} joined by one bridge 3-7:
    # CC would merge them; LPA's mode vote must not
    tri = [(1, 2), (2, 3), (1, 3), (7, 8), (8, 9), (7, 9), (3, 7)]
    edges = spark.createDataFrame(tri, "src long, dst long")
    out = {r["vertex"]: r["label"]
           for r in graph.label_propagation(edges, iters=3).collect()}
    assert out[1] == out[2] == out[3]
    assert out[7] == out[8] == out[9]
    assert out[1] != out[7]


def test_label_propagation_min_tie_break_deterministic(spark):
    # a path 1-2-3: vertex 2's neighbors are {1,3}, one vote each ->
    # smallest label (1) must win every run
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out = {r["vertex"]: r["label"]
           for r in graph.label_propagation(edges, iters=1).collect()}
    assert out[2] == 1
    assert out[1] == 2 and out[3] == 2  # their only neighbor is 2


def test_acf_regular_join_path_equals_window_path(spark):
    """acf_lags_regular (the mega-key equi-join path) must reproduce
    acf_lags bit-for-bit on regular series — including per-key series
    shorter than max_lag (which simply emit fewer lags)."""
    rows = [("a", i, (i * 37) % 101) for i in range(200)]
    rows += [("b", i, 50 + (i % 2) * 10) for i in range(2)]  # shorter than lag 3
    df = spark.createDataFrame(rows, "k string, i long, v long")
    a = {(r["k"], r["lag"]): (r["n"], r["corr_ppb"])
         for r in timeseries.acf_lags(df, ["k"], ["i"], "v", 3).collect()}
    b = {(r["k"], r["lag"]): (r["n"], r["corr_ppb"])
         for r in timeseries.acf_lags_regular(df, ["k"], "i", "v", 3)
         .collect()}
    assert a == b
    import pytest
    with pytest.raises(ValueError):
        timeseries.acf_lags_regular(df, ["k"], "i", "v", 3, step=0)


def test_ccf_matches_brute_force_and_detects_lead(spark):
    # b leads a by exactly 1 step: corr at lag +1 must dominate
    rng = random.Random(11)
    b = [rng.randint(0, 100) for _ in range(120)]
    a = [0] + [3 * x + rng.randint(0, 5) for x in b[:-1]]
    rows = [("k", i, a[i], b[i]) for i in range(120)]
    df = spark.createDataFrame(rows, "k string, i int, a long, b long")
    got = {r["lag"]: (r["n"], r["corr_ppb"])
           for r in timeseries.ccf_lags(df, ["k"], ["i"], "a", "b", 2)
           .collect()}
    for lag in (-2, -1, 0, 1, 2):
        pairs = [(a[i], b[i - lag])
                 for i in range(120) if 0 <= i - lag < 120]
        assert got[lag] == (len(pairs), _corr_ppb_brute(pairs)), lag
    assert got[1][1] > 980_000_000
    assert got[1][1] > got[0][1] and got[1][1] > got[-1][1]


def _partial_brute(rows):
    """Pure-Python twin of partial_corr_ppb (ppb-quantized stage 2)."""
    rxy = _corr_ppb_brute([(x, y) for x, y, _ in rows])
    rxz = _corr_ppb_brute([(x, z) for x, _, z in rows])
    rzy = _corr_ppb_brute([(y, z) for _, y, z in rows])
    if None in (rxy, rxz, rzy):
        return rxy, rxz, rzy, None
    num = rxy * 10**9 - rxz * rzy
    ba = math.isqrt(10**18 - rxz * rxz)
    bb = math.isqrt(10**18 - rzy * rzy)
    if ba * bb == 0:
        return rxy, rxz, rzy, None
    mag = min(abs(num) * 10**9 // (ba * bb), 10**9)
    return rxy, rxz, rzy, (-mag if num < 0 else mag)


def test_partial_corr_matches_brute_and_removes_confounder(spark):
    rng = random.Random(3)
    # x and y share the confounder z and nothing else: raw corr(x,y)
    # is strongly positive, partial corr | z collapses toward 0
    rows = []
    for _ in range(400):
        z = rng.randint(0, 1000)
        rows.append((5 * z + rng.randint(0, 80),
                     3 * z + rng.randint(0, 80), z))
    df = spark.createDataFrame(rows, "x long, y long, z long")
    got = stats.partial_corr_ppb(df, "x", "y", "z").collect()[0]
    rxy, rxz, rzy, part = _partial_brute(rows)
    assert (got["rxy_ppb"], got["rxz_ppb"], got["rzy_ppb"],
            got["partial_ppb"]) == (rxy, rxz, rzy, part)
    assert got["rxy_ppb"] > 900_000_000
    assert abs(got["partial_ppb"]) < 200_000_000


def test_partial_corr_degenerate_is_null(spark):
    # x == z exactly: 1 - rxz^2 = 0 -> NULL partial
    rows = [(i, i * 2 + (i % 3), i) for i in range(100)]
    df = spark.createDataFrame(rows, "x long, y long, z long")
    got = stats.partial_corr_ppb(df, "x", "y", "z").collect()[0]
    assert got["partial_ppb"] is None or abs(got["rxz_ppb"]) < 10**9
