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
    with pytest.raises((Py4JJavaError, PySparkException, Exception)):
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
