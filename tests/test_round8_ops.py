"""Round-8 fixes, each pinned by a brute-force twin or boundary test:
the LTTB triangle-area sign (a chord-line point must never outrank a
real spike), sample_match_distribution's integer-division boundary,
bootstrap order statistics under replicate loss, fingerprint op-code
validation, and the Hilbert negative-coordinate clamp."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_script_spark.operators import timeseries as ts_ops
from tests.conftest import *  # noqa: F401,F403  (spark fixture)


# ------------------------------------------------------------------ #
# LTTB: brute-force area argmax twin
# ------------------------------------------------------------------ #

def _tdiv(a, b):
    """Truncate-toward-zero integer division — Spark DECIMAL DIV and
    DuckDB HUGEINT // both truncate; Python's // floors."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _lttb_brute(pts, n_buckets):
    """Python twin of the fixed-anchor parallel LTTB: equal-width
    time buckets, exact micro-unit centroids (truncating DIV), 2*area
    cross product (pt-nt)*(v-pv) - (pt-t)*(nv-pv), endpoint pinning,
    tie-break (endpick asc, area desc, t asc, v asc)."""
    t0 = min(t for t, _ in pts)
    t1 = max(t for t, _ in pts)
    buckets = {}
    for t, v in pts:
        b = min(n_buckets - 1, _tdiv((t - t0) * n_buckets, t1 - t0 + 1))
        buckets.setdefault(b, []).append((t, v))
    cent = {
        b: (
            _tdiv(sum(t for t, _ in rows) * 1000000, len(rows)),
            _tdiv(sum(v for _, v in rows) * 1000000, len(rows)),
        )
        for b, rows in buckets.items()
    }
    order = sorted(cent)
    out = {}
    for i, b in enumerate(order):
        prev = cent[order[i - 1]] if i > 0 else None
        nxt = cent[order[i + 1]] if i + 1 < len(order) else None

        def key(tv):
            t, v = tv
            if prev is None:
                endpick = t
            elif nxt is None:
                endpick = -t
            else:
                endpick = 0
            if prev is None or nxt is None:
                area = None
            else:
                pt, pv = prev
                nt, nv = nxt
                area = abs(
                    (pt - nt) * (v * 1000000 - pv)
                    - (pt - t * 1000000) * (nv - pv)
                )
            # area desc with None (endpoint buckets) ranked after any
            # real area — matches Spark's NULL-last in DESC ordering
            return (endpick, -(area if area is not None else -1), t, v)

        out[b] = min(buckets[b], key=key)
    return {b: out[b] for b in order}


@pytest.mark.parametrize("n_buckets", [5, 12, 48])
def test_lttb_matches_brute_force(spark, n_buckets):
    # deterministic jagged series with negatives, plateaus, spikes
    pts = [
        (t, ((t * 37) % 113) - 50 + (9999 if t % 131 == 7 else 0))
        for t in range(700)
    ]
    df = spark.createDataFrame(pts, "t long, v long")
    got = {
        r["bucket"]: (r["ts"], r["value"])
        for r in ts_ops.lttb_downsample(df, "t", "v",
                                        n_buckets=n_buckets).collect()
    }
    assert got == _lttb_brute(pts, n_buckets)


def test_lttb_spike_beats_chord_point(spark):
    # Regression for the flipped-sign area bug: with prev centroid
    # ~(0,0) and next ~(200,100), a candidate ON the chord must lose
    # to a genuine below-chord spike in the same bucket. The broken
    # formula scored the chord point higher.
    pts = []
    pts += [(0, 0), (1, 0)]                      # bucket 0 (anchor)
    pts += [(100, 50), (120, -3000)]             # bucket 1: chord vs spike
    pts += [(199, 100), (200, 100)]              # bucket 2 (anchor)
    df = spark.createDataFrame(pts, "t long, v long")
    out = {r["bucket"]: (r["ts"], r["value"])
           for r in ts_ops.lttb_downsample(df, "t", "v",
                                           n_buckets=3).collect()}
    assert out[1] == (120, -3000)


# ------------------------------------------------------------------ #
# bootstrap CI under replicate loss
# ------------------------------------------------------------------ #

def test_bootstrap_positions_follow_realized_replicates(spark):
    # A single-row input loses every replicate whose Poisson weight
    # draw is 0 (~37% of them): order-statistic positions must then
    # come from the REALIZED count, so hi_micro is a real replicate
    # mean, never a silently-NULL past-the-end rank.
    from etl_script_spark.operators import stats

    df = spark.createDataFrame([(1, 500)], "id long, x long")
    row = stats.bootstrap_ci_mean(
        df, "id", "x", n_boot=64, lo_pct=5, hi_pct=95, seed="loss"
    ).collect()[0]
    assert row["n_boot"] < 64          # replicates actually dropped
    assert row["n_boot"] >= 1
    # every surviving replicate mean equals the single value
    assert row["lo_micro"] == 500_000_000
    assert row["hi_micro"] == 500_000_000
    assert row["mean_micro"] == 500_000_000


# ------------------------------------------------------------------ #
# fingerprint IVM: op-code validation
# ------------------------------------------------------------------ #

def test_maintain_fingerprint_rejects_unknown_op(spark):
    # An op code outside {'I','D'} must raise, never silently
    # subtract (the corrupt-forever failure mode).
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    from etl_script_spark.operators import governance

    base = spark.createDataFrame([("g", 1), ("g", 2)], "g string, v long")
    ok = spark.createDataFrame(
        [("g", 3, "I"), ("g", 1, "D")], "g string, v long, op string"
    )
    out = {r["group"]: (r["n_rows"], r["fingerprint"])
           for r in governance.maintain_fingerprint(
               base, ok, "g", ["v"]).collect()}
    full = {r["group"]: (r["n_rows"], r["fingerprint"])
            for r in governance.dataset_fingerprint(
                spark.createDataFrame([("g", 2), ("g", 3)],
                                      "g string, v long"),
                "g", ["v"]).collect()}
    assert out == full
    bad = spark.createDataFrame([("g", 3, "U")], "g string, v long, op string")
    # pin the MESSAGE too: a bare exception class would be satisfied
    # by any failure (e.g. an AnalysisException from a column rename)
    # and the op-code validation could silently stop being exercised
    with pytest.raises(
        (Py4JJavaError, PySparkException),
        match="op must be 'I' or 'D'",
    ):
        governance.maintain_fingerprint(base, bad, "g", ["v"]).collect()


# ------------------------------------------------------------------ #
# Hilbert key: negative coordinates wrap into the grid
# ------------------------------------------------------------------ #

def test_hilbert_negative_coords_wrap_like_positive(spark):
    # ADVICE r7: sign-following % left negative __hx/__hy, breaking
    # the n-1-x reflection and the DIV/% bit reads. Positive-mod must
    # make (-1, y) produce exactly the key of (n-1, y).
    from etl_script_spark.sources import layout

    bits, n = 4, 16
    df = spark.createDataFrame(
        [(-1, 5), (n - 1, 5), (-n - 3, 7), (n - 3, 7), (3, -2), (3, n - 2)],
        "x long, y long",
    )
    rows = layout.with_hilbert_key(df, "x", "y", bits=bits, out_col="hkey").collect()
    key = {(r["x"], r["y"]): r["hkey"] for r in rows}
    assert key[(-1, 5)] == key[(n - 1, 5)]
    assert key[(-n - 3, 7)] == key[(n - 3, 7)]
    assert key[(3, -2)] == key[(3, n - 2)]
    assert all(0 <= v < n * n for v in key.values())


# ------------------------------------------------------------------ #
# round-8 operator batch: brute-force twins
# ------------------------------------------------------------------ #

def test_kruskal_wallis_matches_brute(spark):
    import collections

    from etl_script_spark.operators import stats

    data = {"a": [1, 2, 3, 4, 5, 2, 3], "b": [3, 4, 5, 6, 7, 7, 8],
            "c": [1, 1, 2, 9, 9]}
    rows = [(g, v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    got = stats.kruskal_wallis(df, "g", "v").collect()[0]
    allv = sorted(v for _, v in rows)
    N = len(allv)

    def rank(v):
        lo = sum(1 for x in allv if x < v)
        t = sum(1 for x in allv if x == v)
        return lo + (t + 1) / 2

    R = {g: sum(rank(v) for v in vs) for g, vs in data.items()}
    H = 12 / (N * (N + 1)) * sum(
        (R[g] - len(vs) * (N + 1) / 2) ** 2 / len(vs)
        for g, vs in data.items()
    )
    cnt = collections.Counter(allv)
    S3 = sum(t ** 3 - t for t in cnt.values())
    assert got["n_total"] == N and got["n_groups"] == 3
    assert abs(got["h_ppm"] - round(H * 1e6)) <= 40        # milli quant
    assert abs(got["h_tie_adj_ppm"]
               - round(H / (1 - S3 / (N ** 3 - N)) * 1e6)) <= 40


def test_kendall_tau_matches_brute(spark):
    import collections
    import itertools
    import math

    from etl_script_spark.operators import stats

    pts = [(1, 2), (2, 1), (3, 3), (4, 4), (4, 5), (5, 5), (6, 1)]
    df = spark.createDataFrame([("g", x, y) for x, y in pts],
                               "g string, x long, y long")
    got = stats.kendall_tau_groups(df, "g", "x", "y").collect()[0]
    C = D = 0
    for (a1, b1), (a2, b2) in itertools.combinations(pts, 2):
        s = (a2 - a1) * (b2 - b1)
        if s > 0:
            C += 1
        elif s < 0:
            D += 1
    n = len(pts)
    n0 = n * (n - 1) // 2
    tx = collections.Counter(x for x, _ in pts)
    ty = collections.Counter(y for _, y in pts)
    n1 = sum(t * (t - 1) // 2 for t in tx.values())
    n2 = sum(t * (t - 1) // 2 for t in ty.values())
    tau = (C - D) / math.sqrt((n0 - n1) * (n0 - n2))
    assert (got["concordant"], got["discordant"]) == (C, D)
    assert abs(got["tau_b_milli"] - tau * 1000) <= 1


def test_kendall_tau_degenerate_group_null(spark):
    # all-x-tied group: denominator 0 -> NULL tau, never a crash
    from etl_script_spark.operators import stats

    df = spark.createDataFrame(
        [("g", 5, y) for y in (1, 2, 3)], "g string, x long, y long"
    )
    row = stats.kendall_tau_groups(df, "g", "x", "y").collect()[0]
    assert row["tau_b_milli"] is None


def test_cuped_matches_brute(spark):
    import random

    from etl_script_spark.operators import stats

    random.seed(3)
    urows = []
    for u in range(200):
        x = random.randint(0, 1000)
        v = "t" if u % 2 else "c"
        y = x + (50 if v == "t" else 0) + random.randint(-100, 100)
        urows.append((v, x, y))
    df = spark.createDataFrame(urows, "variant string, x long, y long")
    got = {r["variant"]: r for r in
           stats.cuped_adjusted_means(df, "variant", "x", "y").collect()}
    N = len(urows)
    sx = sum(r[1] for r in urows)
    sy = sum(r[2] for r in urows)
    sxx = sum(r[1] ** 2 for r in urows)
    sxy = sum(r[1] * r[2] for r in urows)
    theta = (N * sxy - sx * sy) / (N * sxx - sx * sx)
    xbar = sx / N
    for v in ("c", "t"):
        g = [r for r in urows if r[0] == v]
        my = sum(r[2] for r in g) / len(g)
        mx = sum(r[1] for r in g) / len(g)
        adj = my - theta * (mx - xbar)
        assert abs(got[v]["mean_post_micro"] - my * 1e6) <= 1
        assert abs(got[v]["adj_mean_post_micro"] - adj * 1e6) <= 5
        assert abs(got[v]["theta_ppm"] - theta * 1e6) <= 1
    # CUPED moves the two variants TOWARD each other when the
    # covariate is imbalanced, preserving the true effect direction
    assert (got["t"]["adj_mean_post_micro"]
            > got["c"]["adj_mean_post_micro"])


def test_brown_forsythe_matches_brute(spark):
    from etl_script_spark.operators import stats

    data = {"a": [1, 2, 3, 4, 100], "b": [10, 11, 12, 13, 14],
            "c": [5, 5, 6, 50, 51, 52]}
    rows = [(g, v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    got = stats.brown_forsythe(df, "g", "v").collect()[0]
    zs = {
        g: [abs(v - sorted(vs)[(len(vs) + 1) // 2 - 1]) for v in vs]
        for g, vs in data.items()
    }
    allz = [z for vs in zs.values() for z in vs]
    Nz, k = len(allz), len(zs)
    zb = sum(allz) / Nz
    ssb = sum(len(v) * (sum(v) / len(v) - zb) ** 2 for v in zs.values())
    ssw = sum(sum((z - sum(v) / len(v)) ** 2 for z in v)
              for v in zs.values())
    f = ((Nz - k) / (k - 1)) * ssb / ssw
    assert got["n_total"] == Nz and got["n_groups"] == k
    assert abs(got["f_milli"] - f * 1000) <= 1


def test_detect_period_finds_cycle(spark):
    import math

    from etl_script_spark.operators import timeseries as ts_ops

    pts = [(1, i, 100 + round(50 * math.sin(2 * math.pi * i / 12)))
           for i in range(240)]
    df = spark.createDataFrame(pts, "k int, pos long, v long")
    row = ts_ops.detect_period(df, ["k"], "pos", "v", max_lag=24).collect()[0]
    assert row["period"] == 12
    assert row["corr_ppb"] > 990_000_000


def test_char_entropy_known_values(spark):
    from etl_script_spark.operators import textstats as ts

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "")],
        "id long, text string",
    )
    got = {r["id"]: (r["n_chars"], r["entropy_mbits"])
           for r in ts.char_entropy(df, "text", "id").collect()}
    assert got == {1: (4, 0), 2: (4, 1000), 3: (4, 2000), 4: (0, 0)}


def test_js_divergence_matches_brute(spark):
    import collections
    import math

    from pyspark.sql import functions as F

    from etl_script_spark.operators import textstats as ts

    df = spark.createDataFrame(
        [(1, "a b c a", True), (2, "a b d d", False), (3, "c c a", True)],
        "id long, text string, p boolean",
    )
    row = ts.js_divergence_tokens(df, "text", F.col("p")).collect()[0]
    P = collections.Counter("a b c a c c a".split())
    Q = collections.Counter("a b d d".split())
    NP, NQ = sum(P.values()), sum(Q.values())
    js = 0.0
    for tk in set(P) | set(Q):
        p, q = P[tk] / NP, Q[tk] / NQ
        m = (p + q) / 2
        if p:
            js += 0.5 * p * math.log(p / m)
        if q:
            js += 0.5 * q * math.log(q / m)
    assert (row["n_p"], row["n_q"], row["vocab"]) == (NP, NQ, 4)
    assert abs(row["js_nano"] - js * 1e9) <= 10
    # JS is bounded by ln 2
    assert 0 <= row["js_nano"] <= 693_147_181


def test_token_dropout_deterministic_and_counted(spark):
    from etl_script_spark.operators import textstats as ts

    df = spark.createDataFrame(
        [(i, f"tok{i} alpha beta gamma delta") for i in range(20)],
        "id long, text string",
    )
    a = sorted(map(tuple, ts.token_dropout(
        df, "text", "id", rate_ppm=300000).collect()))
    b = sorted(map(tuple, ts.token_dropout(
        df, "text", "id", rate_ppm=300000).collect()))
    assert a == b
    for (_id, aug, n_tok, n_drop) in a:
        assert n_tok == 5
        assert len(aug.split()) == n_tok - n_drop if aug else n_drop == n_tok
    total_drop = sum(r[3] for r in a)
    assert 0 < total_drop < 100  # ~30% of 100 tokens


def test_batch_budget_respects_band_and_budget(spark):
    import collections

    from etl_script_spark.operators import textstats as ts

    df = spark.createDataFrame(
        [(i, 10 + (i * 7) % 50) for i in range(100)], "id long, n long"
    )
    rows = ts.batch_by_token_budget(df, "id", "n", budget=100).collect()
    per_batch = collections.defaultdict(list)
    for r in rows:
        per_batch[(r["band"], r["batch_id"])].append(r["n_tokens"])
        # band invariant: same power-of-two length band
        assert r["band"] == len(bin(r["n_tokens"])) - 3
    for (band, _b), toks in per_batch.items():
        # a batch exceeds budget by at most its last doc (greedy cut)
        assert sum(toks) < 100 + max(toks)


def test_snippet_best_window_argmax(spark):
    from etl_script_spark.operators import search

    df = spark.createDataFrame(
        [(1, "x x cat x dog x x cat dog cat x"),
         (2, "dog x x x x x x x x cat")],
        "id long, text string",
    )
    got = {r["id"]: (r["start_pos"], r["n_hits"])
           for r in search.snippet_best_window(
               df, "text", "id", ["cat", "dog"], window_tokens=4).collect()}
    assert got[1] == (7, 3)   # window [7,10] covers cat@7 dog@8 cat@9
    assert got[2] == (0, 1)   # tie on 1 hit -> earliest start


def test_curriculum_interleave_band_mix(spark):
    import collections

    from etl_script_spark.operators import textstats as ts

    df = spark.createDataFrame([(i, i % 37) for i in range(50)],
                               "id long, s long")
    rows = ts.curriculum_interleave(df, "id", "s", n_strata=5).collect()
    assert len({r["position"] for r in rows}) == 50     # total order
    bands = collections.Counter(r["band"] for r in rows)
    assert all(bands[b] == 10 for b in range(5))        # equal strata
    first10 = sorted(rows, key=lambda r: r["position"])[:10]
    mix = collections.Counter(r["band"] for r in first10)
    assert all(mix[b] == 2 for b in range(5))           # interleaved


def test_symspell_distance1_only_and_ranked(spark):
    from etl_script_spark.operators import search

    vocab = spark.createDataFrame(
        [("table", 50), ("value", 40), ("tale", 5), ("vale", 3),
         ("spark", 99)],
        "word string, cnt long",
    )
    qs = spark.createDataFrame(
        [("tabel",), ("valu",), ("sparkk",), ("zzz",)], "q string"
    )
    got = {(r["q"], r["rank"]): r["suggestion"]
           for r in search.symspell_suggest(vocab, qs).collect()}
    # 'tabel' vs 'table' is levenshtein 2 (transposition) -> excluded
    assert ("tabel", 1) not in got
    assert got[("valu", 1)] == "value"       # freq 40 beats 'vale' 3
    assert got[("valu", 2)] == "vale"
    assert got[("sparkk", 1)] == "spark"     # insertion
    assert not any(q == "zzz" for q, _ in got)


def test_pack_efficiency_deciles_cover_plan(spark):
    from etl_script_spark.operators.textstats import batch_by_token_budget

    df = spark.createDataFrame(
        [(i, 10 + (i * 7) % 50) for i in range(200)], "id long, n long"
    )
    plan = batch_by_token_budget(df, "id", "n", budget=100)
    total = plan.groupBy().sum("n_tokens").collect()[0][0]
    batches = plan.groupBy("band", "batch_id").count().count()
    assert total == sum(10 + (i * 7) % 50 for i in range(200))
    assert batches >= total // 150  # every batch below budget+maxdoc


def test_kw_bf_degenerate_constant_column_nulls(spark):
    # a constant column leaves both statistics undefined: NULL, never
    # a DIVIDE_BY_ZERO throw (ANSI mode)
    from etl_script_spark.operators import stats

    df = spark.createDataFrame(
        [("a", 5), ("a", 5), ("b", 5), ("b", 5)], "g string, v long"
    )
    kw = stats.kruskal_wallis(df, "g", "v").collect()[0]
    assert kw["h_ppm"] == 0 and kw["h_tie_adj_ppm"] is None
    bf = stats.brown_forsythe(df, "g", "v").collect()[0]
    assert bf["f_milli"] is None
