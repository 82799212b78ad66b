"""Randomized spark==truth properties for the round-7 statistical
conventions: the integer-sqrt correlation machinery and the trimmed
mean are compared against INDEPENDENT pure-Python integer references
on seeded random inputs — covering tie-heavy, constant, negative, and
wide-magnitude distributions the fixed oracle fixtures can't. Seeded
random (not hypothesis) because one Spark job per example is the cost
model (the round-5 suite's convention)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from etl_script_spark.operators import stats, timeseries
from tests.test_round7c_ops import _corr_ppb_brute, _spearman_brute


def test_isqrt_column_randomized_decades(spark):
    rng = random.Random(17)
    vals = [0, 1]
    for exp in range(1, 29):
        for _ in range(4):
            vals.append(rng.randrange(10**exp))
    # perfect squares and their neighbors (the correction window's
    # boundary cases) across the domain
    for exp in range(1, 14):
        r = rng.randrange(10**exp)
        vals += [r * r, max(r * r - 1, 0), r * r + 1]
    df = spark.createDataFrame([(str(v),) for v in set(vals)], "s string")
    out = df.select(
        "s",
        stats.isqrt_column(F.col("s").cast("decimal(38,0)"))
        .cast("string").alias("r"),
    ).collect()
    for row in out:
        assert int(row["r"]) == math.isqrt(int(row["s"])), row["s"]


def test_spearman_randomized_distributions(spark):
    rng = random.Random(23)
    cases = [
        # heavy ties both axes
        [(rng.randint(0, 5), rng.randint(0, 3)) for _ in range(301)],
        # near-unique vs constant-ish
        [(i, rng.randint(0, 2)) for i in range(200)],
        # anti-correlated with noise, negative values
        [(i, -3 * i + rng.randint(-40, 40)) for i in range(-80, 120)],
    ]
    for xy in cases:
        df = spark.createDataFrame(xy, "x long, y long")
        got = stats.spearman_rho(df, "x", "y").collect()[0]
        assert got["rho_ppb"] == _spearman_brute(xy), xy[:5]


def test_acf_randomized_series(spark):
    rng = random.Random(31)
    rows = []
    series = {}
    for k in ("a", "b", "c"):
        vs = [rng.randint(-500, 500) for _ in range(rng.randint(5, 90))]
        series[k] = vs
        rows += [(k, i, v) for i, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "k string, i int, v long")
    got = {(r["k"], r["lag"]): r["corr_ppb"]
           for r in timeseries.acf_lags(df, ["k"], ["i"], "v", 3).collect()}
    for k, vs in series.items():
        for lag in (1, 2, 3):
            pairs = [(vs[i], vs[i - lag]) for i in range(lag, len(vs))]
            if not pairs:
                assert (k, lag) not in got
                continue
            assert got[(k, lag)] == _corr_ppb_brute(pairs), (k, lag)


def test_trimmed_mean_randomized_cuts(spark):
    rng = random.Random(41)
    for lo, hi in ((0, 100), (10, 90), (25, 75), (49, 51)):
        vals = [rng.randint(-10**6, 10**6) for _ in range(500)]
        # heavy tie block straddling both cuts
        vals += [0] * 200
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        r = stats.trimmed_mean(df, "v", lo, hi).collect()[0]
        s = sorted(vals)
        n = len(s)
        kept = s[(n * lo) // 100:(n * hi) // 100]
        assert r["kept_n"] == len(kept), (lo, hi)
        assert r["trimmed_sum"] == sum(kept), (lo, hi)
        tot = sum(kept)
        # magnitude-divide-then-sign, the operator's convention
        exp = abs(tot) * 1_000_000 // len(kept)
        assert r["tmean_micro"] == (-exp if tot < 0 else exp), (lo, hi)
