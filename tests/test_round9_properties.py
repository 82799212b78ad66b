"""Randomized spark==truth properties for the round-9 operators:
Holt smoothing, Cohen's d, Cochran's Q, Friedman, Levene (mean
centers), and the Avro codec are compared against INDEPENDENT
pure-Python integer references on seeded random inputs — covering
negative values, tie-heavy blocks, and wide magnitudes the fixed
fixtures can't. Seeded random (not hypothesis) because one Spark job
per example is the cost model (the round-5 suite's convention)."""

from __future__ import annotations

import random

from tests.conftest import *  # noqa: F401,F403  (spark fixture)
from tests.test_round9b_ops import (
    _cochran_twin,
    _cohens_d_twin,
    _friedman_twin,
    _holt_twin,
    _levene_mean_twin,
    _tdiv,
)


def test_holt_randomized_series(spark):
    rng = random.Random(91)
    series = {}
    for s in range(12):
        n = rng.randrange(1, 40)
        scale = 10 ** rng.randrange(1, 10)
        series[f"s{s}"] = [
            rng.randrange(-scale, scale) for _ in range(n)
        ]
    rows = [
        (k, i, v) for k, vs in series.items() for i, v in enumerate(vs)
    ]
    from etl_script_spark.operators import timeseries as ts_ops

    df = spark.createDataFrame(rows, "srs string, t long, x long")
    got = {
        r["series"]: (r["level"], r["trend"])
        for r in ts_ops.holt_linear_smooth(
            df, "srs", "t", "x", alpha_ppm=417000, beta_ppm=83000
        ).collect()
    }
    def twin(xs):
        l, tr = xs[0], 0
        for x in xs[1:]:
            nl = _tdiv(417000 * x + 583000 * (l + tr), 10**6)
            tr = _tdiv(83000 * (nl - l) + 917000 * tr, 10**6)
            l = nl
        return l, tr

    for k, vs in series.items():
        assert got[k] == twin(vs), k


def test_cohens_d_randomized_segments(spark):
    rng = random.Random(92)
    segs = {}
    for s in range(8):
        scale = 10 ** rng.randrange(1, 8)
        g1 = [rng.randrange(-scale, scale) for _ in range(rng.randrange(2, 30))]
        g0 = [rng.randrange(-scale, scale) for _ in range(rng.randrange(2, 30))]
        segs[f"s{s}"] = (g1, g0)
    rows = [
        (k, grp == 1, x)
        for k, (g1, g0) in segs.items()
        for grp, xs in ((1, g1), (0, g0))
        for x in xs
    ]
    from etl_script_spark.operators import stats

    df = spark.createDataFrame(rows, "seg string, grp boolean, x long")
    got = {
        r["segment"]: r["d_ppm"]
        for r in stats.cohens_d_groups(df, "seg", "grp", "x").collect()
    }
    for k, (g1, g0) in segs.items():
        assert got[k] == _cohens_d_twin(g1, g0), k


def test_cochran_and_friedman_randomized(spark):
    from etl_script_spark.operators import stats

    rng = random.Random(93)
    # Cochran: random binary cells over 12 blocks x 4 treatments
    cells = {
        (b, f"t{t}"): rng.randrange(2)
        for b in range(12)
        for t in range(4)
    }
    cdf = spark.createDataFrame(
        [(b, t, bool(v)) for (b, t), v in cells.items()],
        "blk long, trt string, s boolean",
    )
    got = stats.cochran_q(cdf, "blk", "trt", "s").collect()[0]
    assert (
        got["n_blocks"], got["k"], got["q_ppm"]
    ) == _cochran_twin(cells)

    # Friedman: tie-heavy values (small range forces many midranks)
    blocks = {
        b: [rng.randrange(4) for _ in range(5)] for b in range(10)
    }
    fdf = spark.createDataFrame(
        [
            (b, f"t{i}", v)
            for b, vs in blocks.items()
            for i, v in enumerate(vs)
        ],
        "blk long, trt string, v long",
    )
    got = stats.friedman_test(fdf, "blk", "trt", "v").collect()[0]
    assert got["chi2_ppm"] == _friedman_twin(blocks)


def test_levene_mean_randomized(spark):
    from etl_script_spark.operators import stats

    rng = random.Random(94)
    groups = {
        f"g{i}": [
            rng.randrange(-(10**6), 10**6)
            for _ in range(rng.randrange(3, 50))
        ]
        for i in range(6)
    }
    df = spark.createDataFrame(
        [(g, x) for g, xs in groups.items() for x in xs],
        "g string, v long",
    )
    got = stats.levene_center_mean(df, "g", "v").collect()[0]
    assert got["f_milli"] == _levene_mean_twin(groups)


def test_avro_randomized_roundtrip(tmp_path):
    from etl_script_spark.sources.avro_io import read_avro_bytes, write_avro

    rng = random.Random(95)
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"]},
        {"name": "c", "type": "double"},
        {"name": "d", "type": ["null", "boolean"]},
    ]}
    recs = []
    for i in range(500):
        recs.append({
            "a": rng.randrange(-(2**62), 2**62),
            "b": None if rng.random() < 0.3 else "".join(
                chr(rng.randrange(32, 0x2FF)) for _ in range(rng.randrange(12))
            ),
            "c": rng.uniform(-1e30, 1e30),
            "d": None if rng.random() < 0.5 else bool(rng.randrange(2)),
        })
    for codec, blk in (("null", 7), ("deflate", 64)):
        p = str(tmp_path / f"r_{codec}.avro")
        write_avro(p, schema, recs, codec=codec, block_records=blk)
        _, got = read_avro_bytes(open(p, "rb").read())
        assert got == recs, codec
