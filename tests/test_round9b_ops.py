"""Round-9 operator additions, each pinned by an exact Python twin or
a hand-computed fixture: Levene (mean centers), McNemar, Cochran's Q,
Friedman, Cohen's d, Adamic-Adar, Holt linear smoothing, Fano
burstiness, OOV rate, file-skipping stats, referential integrity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import *  # noqa: F401,F403  (spark fixture)


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


# ------------------------------------------------------------------ #
# Levene with mean centers: exact twin incl. negative values
# ------------------------------------------------------------------ #

def _levene_mean_twin(groups: dict) -> int | None:
    zs = {}
    for g, xs in groups.items():
        ctr = _tdiv(sum(xs), len(xs))
        zs[g] = [abs(x - ctr) for x in xs]
    k = len(zs)
    n = sum(len(v) for v in zs.values())
    a_micro = sum(_tdiv(sum(v) ** 2 * 10**6, len(v)) for v in zs.values())
    s = sum(sum(v) for v in zs.values())
    q = sum(z * z for v in zs.values() for z in v)
    sn = _tdiv(s * s * 10**6, n)
    den = (q * 10**6 - a_micro) * (k - 1)
    if den == 0:
        return None
    return _tdiv((a_micro - sn) * (n - k) * 1000, den)


def test_levene_mean_matches_twin(spark):
    from etl_script_spark.operators import stats

    groups = {
        "a": [10, 12, 9, 30, 11],
        "b": [-5, -40, 3, 2, 1, 0],
        "c": [100, 100, 100, 101],
    }
    rows = [(g, x) for g, xs in groups.items() for x in xs]
    df = spark.createDataFrame(rows, "g string, v long")
    got = stats.levene_center_mean(df, "g", "v").collect()[0]
    assert got["n_total"] == 15 and got["n_groups"] == 3
    assert got["f_milli"] == _levene_mean_twin(groups)


def test_levene_mean_constant_column_is_null(spark):
    from etl_script_spark.operators import stats

    df = spark.createDataFrame(
        [("a", 5), ("a", 5), ("b", 5), ("b", 5)], "g string, v long"
    )
    assert stats.levene_center_mean(df, "g", "v").collect()[0][
        "f_milli"
    ] is None


# ------------------------------------------------------------------ #
# McNemar: discordant cells only
# ------------------------------------------------------------------ #

def test_mcnemar_exact(spark):
    from etl_script_spark.operators import stats

    # a=1,b=0 x3 ; a=0,b=1 x1 ; concordant x4 (ignored)
    rows = [(True, False)] * 3 + [(False, True)] * 1 + \
        [(True, True)] * 2 + [(False, False)] * 2
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    got = stats.mcnemar_test(df, "a", "b").collect()[0]
    assert (got["n"], got["b_only"], got["c_only"]) == (8, 3, 1)
    # (3-1)^2 / (3+1) = 1.0 -> 1e6 ppm
    assert got["chi2_ppm"] == 1000000


def test_mcnemar_no_discordant_is_null(spark):
    from etl_script_spark.operators import stats

    df = spark.createDataFrame(
        [(True, True), (False, False)], "a boolean, b boolean"
    )
    assert stats.mcnemar_test(df, "a", "b").collect()[0]["chi2_ppm"] is None


# ------------------------------------------------------------------ #
# Cochran's Q: textbook formula twin
# ------------------------------------------------------------------ #

def _cochran_twin(cells: dict) -> tuple[int, int, int | None]:
    blocks = sorted({b for b, _ in cells})
    trts = sorted({t_ for _, t_ in cells})
    k = len(trts)
    rs = {b: sum(cells.get((b, t_), 0) for t_ in trts) for b in blocks}
    cs = {t_: sum(cells.get((b, t_), 0) for b in blocks) for t_ in trts}
    sr = sum(rs.values())
    srr = sum(r * r for r in rs.values())
    scc = sum(c * c for c in cs.values())
    den = k * sr - srr
    q = _tdiv((k - 1) * (k * scc - sr * sr) * 10**6, den) if den else None
    return len(blocks), k, q


def test_cochran_q_matches_twin(spark):
    from etl_script_spark.operators import stats

    cells = {
        (1, "x"): 1, (1, "y"): 0, (1, "z"): 0,
        (2, "x"): 1, (2, "y"): 1, (2, "z"): 0,
        (3, "x"): 0, (3, "y"): 0, (3, "z"): 0,
        (4, "x"): 1, (4, "y"): 0, (4, "z"): 1,
        (5, "x"): 1, (5, "y"): 1, (5, "z"): 1,
    }
    rows = [(b, t_, bool(v)) for (b, t_), v in cells.items()]
    df = spark.createDataFrame(rows, "blk long, trt string, s boolean")
    got = stats.cochran_q(df, "blk", "trt", "s").collect()[0]
    nb, k, q = _cochran_twin(cells)
    assert (got["n_blocks"], got["k"], got["q_ppm"]) == (nb, k, q)


def test_cochran_q_duplicate_observations_or_fold(spark):
    from etl_script_spark.operators import stats

    # same (block, treatment) observed twice: success if ANY success
    df = spark.createDataFrame(
        [(1, "x", False), (1, "x", True), (1, "y", False),
         (2, "x", False), (2, "y", True)],
        "blk long, trt string, s boolean",
    )
    got = stats.cochran_q(df, "blk", "trt", "s").collect()[0]
    twin = _cochran_twin({(1, "x"): 1, (1, "y"): 0, (2, "x"): 0, (2, "y"): 1})
    assert (got["n_blocks"], got["k"], got["q_ppm"]) == twin


# ------------------------------------------------------------------ #
# Friedman: doubled midranks + complete-block validation
# ------------------------------------------------------------------ #

def _friedman_twin(blocks: dict) -> int:
    n = len(blocks)
    k = len(next(iter(blocks.values())))
    r2 = {}
    for vals in blocks.values():
        order = sorted(range(k), key=lambda i: vals[i])
        pos = [0] * k
        for rank, i in enumerate(order, 1):
            pos[i] = rank
        for i in range(k):
            ties = [j for j in range(k) if vals[j] == vals[i]]
            dr = min(pos[j] for j in ties) + max(pos[j] for j in ties)
            r2[i] = r2.get(i, 0) + dr
    s = sum(v * v for v in r2.values())
    return _tdiv(12 * 10**6 * s, 4 * n * k * (k + 1)) - 3 * 10**6 * n * (k + 1)


def test_friedman_matches_twin_with_ties(spark):
    from etl_script_spark.operators import stats

    blocks = {
        1: [10, 20, 30],
        2: [15, 15, 40],   # tie inside a block -> midranks
        3: [9, 8, 7],
        4: [5, 50, 5],     # tie spanning rank 1 and 3
    }
    rows = [
        (b, f"t{i}", v)
        for b, vals in blocks.items()
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "blk long, trt string, v long")
    got = stats.friedman_test(df, "blk", "trt", "v").collect()[0]
    assert (got["n_blocks"], got["k"]) == (4, 3)
    assert got["chi2_ppm"] == _friedman_twin(blocks)


def test_friedman_incomplete_block_raises(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.base import PySparkException

    from etl_script_spark.operators import stats

    df = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (2, "a", 3)],  # block 2 missing 'b'
        "blk long, trt string, v long",
    )
    with pytest.raises(
        (Py4JJavaError, PySparkException), match="incomplete blocks"
    ):
        stats.friedman_test(df, "blk", "trt", "v").collect()


# ------------------------------------------------------------------ #
# Cohen's d: exact twin via the same integer ladder
# ------------------------------------------------------------------ #

def _isqrt(n: int) -> int:
    return math.isqrt(n)


def _cohens_d_twin(g1: list, g0: list) -> int | None:
    n1, n0 = len(g1), len(g0)
    s1, s0 = sum(g1), sum(g0)
    ss1 = max(sum(x * x for x in g1) * 10**6 - _tdiv(abs(s1) ** 2 * 10**6, n1), 0)
    ss0 = max(sum(x * x for x in g0) * 10**6 - _tdiv(abs(s0) ** 2 * 10**6, n0), 0)
    dm = _tdiv(s1 * 10**6, n1) - _tdiv(s0 * 10**6, n0)
    if n1 + n0 - 2 == 0:
        return None
    vp = (ss1 + ss0) // (n1 + n0 - 2)
    den = _isqrt(vp * 10**6)
    if den == 0:
        return None
    mag = abs(dm) * 10**6 // den
    return -mag if dm < 0 else mag


def test_cohens_d_matches_twin(spark):
    from etl_script_spark.operators import stats

    g1 = [120, 140, 160, 150, 130]
    g0 = [100, 90, 110, 95]
    rows = [("s", True, x) for x in g1] + [("s", False, x) for x in g0]
    df = spark.createDataFrame(rows, "seg string, grp boolean, x long")
    got = stats.cohens_d_groups(df, "seg", "grp", "x").collect()[0]
    assert (got["n1"], got["n0"]) == (5, 4)
    assert got["d_ppm"] == _cohens_d_twin(g1, g0)


def test_cohens_d_negative_direction_and_negative_values(spark):
    from etl_script_spark.operators import stats

    g1 = [-50, -60, -40]
    g0 = [10, 20, 30, 25]
    rows = [("s", True, x) for x in g1] + [("s", False, x) for x in g0]
    df = spark.createDataFrame(rows, "seg string, grp boolean, x long")
    got = stats.cohens_d_groups(df, "seg", "grp", "x").collect()[0]
    want = _cohens_d_twin(g1, g0)
    assert want < 0 and got["d_ppm"] == want


def test_cohens_d_pooled_variance_quotient_past_int64(spark):
    """The pooled-variance DIV's int64 quotient overflows right at
    sf0.001 fixture magnitudes (ss/dof = 9.31e18 > 9.22e18, hit live
    by segment A of the oracle sweep); the two-level long division
    must stay exact. Values here push ss_micro/dof well past int64."""
    from etl_script_spark.operators import stats

    # x ~ 5e9 over few rows -> ss_micro ~ 1e25, dof = 4 -> quotient 2.5e24
    g1 = [5_000_000_000, 1_000_000_000, 9_000_000_000]
    g0 = [4_000_000_000, 100_000_000, 8_000_000_000]
    rows = [("s", True, x) for x in g1] + [("s", False, x) for x in g0]
    df = spark.createDataFrame(rows, "seg string, grp boolean, x long")
    got = stats.cohens_d_groups(df, "seg", "grp", "x").collect()[0]
    assert got["d_ppm"] == _cohens_d_twin(g1, g0)


# ------------------------------------------------------------------ #
# Adamic-Adar: brute-force twin on a small graph
# ------------------------------------------------------------------ #

def test_adamic_adar_matches_brute(spark):
    from etl_script_spark.operators import graph

    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (2, 5), (1, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["x"], r["y"]): (r["common"], r["aa_micro"])
        for r in graph.adamic_adar_scores(df, k=100).collect()
    }
    # brute force
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    nodes = sorted(adj)
    for i, x in enumerate(nodes):
        for y in nodes[i + 1:]:
            if y in adj[x]:
                continue
            cn = adj[x] & adj[y]
            if not cn:
                continue
            aa = sum(
                _tdiv(10**12, round(math.log(len(adj[n])) * 10**6))
                for n in cn
            )
            want[(x, y)] = (len(cn), aa)
    assert got == want


# ------------------------------------------------------------------ #
# Holt linear smoothing: twin incl. negatives; series-length guard
# ------------------------------------------------------------------ #

def _holt_twin(xs, a=300000, b=100000):
    l, tr = xs[0], 0
    for x in xs[1:]:
        nl = _tdiv(a * x + (10**6 - a) * (l + tr), 10**6)
        tr = _tdiv(b * (nl - l) + (10**6 - b) * tr, 10**6)
        l = nl
    return l, tr


def test_holt_linear_matches_twin(spark):
    from etl_script_spark.operators import timeseries as ts_ops

    series = {
        "up": [100, 120, 140, 130, 160, 180],
        "neg": [-10, -30, -20, -60, -5],
        "one": [42],
    }
    rows = [
        (s, i, v) for s, vs in series.items() for i, v in enumerate(vs)
    ]
    df = spark.createDataFrame(rows, "srs string, t long, x long")
    got = {
        r["series"]: (r["n"], r["level"], r["trend"], r["forecast"])
        for r in ts_ops.holt_linear_smooth(df, "srs", "t", "x").collect()
    }
    for s, vs in series.items():
        l, tr = _holt_twin(vs)
        assert got[s] == (len(vs), l, tr, l + tr), (s, got[s], (l, tr))


def test_holt_series_length_guard_raises(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.base import PySparkException

    from etl_script_spark.operators import timeseries as ts_ops

    df = spark.createDataFrame(
        [("s", i, i) for i in range(30)], "srs string, t long, x long"
    )
    with pytest.raises(
        (Py4JJavaError, PySparkException), match="max_series_rows"
    ):
        ts_ops.holt_linear_smooth(
            df, "srs", "t", "x", max_series_rows=10
        ).collect()


def test_holt_rejects_bad_alpha(spark):
    from etl_script_spark.operators import timeseries as ts_ops

    df = spark.createDataFrame([("s", 1, 1)], "srs string, t long, x long")
    with pytest.raises(ValueError, match="alpha_ppm"):
        ts_ops.holt_linear_smooth(df, "srs", "t", "x", alpha_ppm=0)


# ------------------------------------------------------------------ #
# Fano burstiness: twin
# ------------------------------------------------------------------ #

def test_burstiness_fano_matches_twin(spark):
    from collections import Counter

    from etl_script_spark.operators import corpusstats

    docs = [
        (1, "cat cat cat dog"),
        (2, "cat dog dog"),
        (3, "cat fish"),
        (4, "dog cat cat cat cat"),
        (5, "cat dog fish fish"),
    ]
    df = spark.createDataFrame(docs, "id long, text string")
    got = {
        r["token"]: (r["n_docs"], r["total"], r["fano_ppm"])
        for r in corpusstats.burstiness_fano(
            df, "text", "id", min_docs=2, k=50
        ).collect()
    }
    per_tok = {}
    for _, text in docs:
        for tok, c in Counter(text.split()).items():
            per_tok.setdefault(tok, []).append(c)
    want = {}
    for tok, cs in per_tok.items():
        if len(cs) < 2:
            continue
        n, s, q = len(cs), sum(cs), sum(c * c for c in cs)
        want[tok] = (n, s, _tdiv((n * q - s * s) * 10**6, n * s))
    assert got == want


# ------------------------------------------------------------------ #
# OOV rate: empty doc -> NULL; counts exact
# ------------------------------------------------------------------ #

def test_oov_rate_counts_and_empty_doc(spark):
    from etl_script_spark.operators import textstats

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "zorp blib the"), (3, ""), (4, "zorp")],
        "id long, text string",
    )
    vocab = spark.createDataFrame(
        [("the",), ("cat",), ("sat",)], "token string"
    )
    got = {
        r["id"]: (r["n_tokens"], r["n_oov"], r["oov_ppm"])
        for r in textstats.oov_rate(
            docs, "text", "id", vocab, "token"
        ).collect()
    }
    assert got[1] == (3, 0, 0)
    assert got[2] == (3, 2, _tdiv(2 * 10**6, 3))
    assert got[3] == (0, 0, None)
    assert got[4] == (1, 1, 10**6)


# ------------------------------------------------------------------ #
# File-skipping stats: real files, real pruning flags
# ------------------------------------------------------------------ #

def test_file_skipping_stats_flags(spark, tmp_path):
    from etl_script_spark.sources import layout

    df = spark.createDataFrame(
        [(i, i // 10) for i in range(40)], "k long, bucket long"
    )
    out = str(tmp_path / "bucketed")
    (
        df.repartition(4, "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out)
    )
    rows = layout.file_skipping_stats(spark, out, "k", 12, 17).collect()
    assert len(rows) == 4
    by_min = {r["min_key"]: r for r in rows}
    assert by_min[0]["skippable"] is True       # [0,9]
    assert by_min[10]["skippable"] is False     # [10,19] overlaps
    assert by_min[20]["skippable"] is True
    assert by_min[30]["skippable"] is True
    assert all(not r["file"].startswith("file:") for r in rows)
    assert sum(r["rows"] for r in rows) == 40


# ------------------------------------------------------------------ #
# Referential integrity: injected orphans + nulls
# ------------------------------------------------------------------ #

def test_referential_integrity_report(spark):
    from etl_script_spark.operators.expectations import (
        referential_integrity_report,
    )

    fact = spark.createDataFrame(
        [(1,), (2,), (3,), (99,), (None,)], "fk long"
    )
    dim = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    got = referential_integrity_report(
        [("f->d", fact, "fk", dim, "k")]
    ).collect()[0]
    assert (got["n_rows"], got["n_nulls"], got["n_orphans"]) == (5, 1, 1)
    assert got["orphan_ppm"] == _tdiv(1 * 10**6, 4)


# ------------------------------------------------------------------ #
# Avro codec: pure-Python container roundtrip + distributed read
# ------------------------------------------------------------------ #

def test_avro_roundtrip_all_types_and_codecs(tmp_path):
    from etl_script_spark.sources.avro_io import read_avro_bytes, write_avro

    schema = {"type": "record", "name": "t", "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "boolean"},
        {"name": "opt", "type": ["null", "long"]},
    ]}
    recs = [
        {"k": 0, "s": "zero", "d": 0.5, "b": True, "opt": None},
        {"k": -(1 << 44) - 7, "s": "nég ünïcode", "d": -2.25, "b": False,
         "opt": 42},
        {"k": 1 << 62, "s": "", "d": 1e300, "b": True, "opt": -1},
    ]
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"t_{codec}.avro")
        write_avro(p, schema, recs, codec=codec, block_records=2)
        _, got = read_avro_bytes(open(p, "rb").read())
        assert got == recs, codec


def test_avro_bad_magic_and_corrupt_sync_raise(tmp_path):
    from etl_script_spark.sources.avro_io import read_avro_bytes, write_avro

    with pytest.raises(ValueError, match="bad magic"):
        read_avro_bytes(b"XXXX" + b"\x00" * 64)
    schema = {"type": "record", "name": "t",
              "fields": [{"name": "k", "type": "long"}]}
    p = str(tmp_path / "t.avro")
    write_avro(p, schema, [{"k": 1}, {"k": 2}])
    data = bytearray(open(p, "rb").read())
    data[-1] ^= 0xFF  # corrupt the trailing sync marker
    with pytest.raises(ValueError, match="sync marker"):
        read_avro_bytes(bytes(data))


def test_avro_distributed_read_many_shards(spark, tmp_path):
    import pyspark.sql.types as T

    from etl_script_spark.sources.avro_io import (
        read_avro_distributed, write_avro,
    )

    schema = {"type": "record", "name": "t", "fields": [
        {"name": "k", "type": "long"},
        {"name": "v", "type": ["null", "string"]},
    ]}
    want = set()
    for shard in range(3):
        recs = [
            {"k": shard * 100 + i,
             "v": None if i % 3 == 0 else f"s{shard}_{i}"}
            for i in range(10)
        ]
        want |= {(r["k"], r["v"]) for r in recs}
        write_avro(str(tmp_path / f"p{shard}.avro"), schema, recs)
    out = read_avro_distributed(
        spark, str(tmp_path / "p*.avro"),
        T.StructType([T.StructField("k", T.LongType()),
                      T.StructField("v", T.StringType())]),
    )
    assert {(r["k"], r["v"]) for r in out.collect()} == want


# ------------------------------------------------------------------ #
# Lakehouse commit log: snapshot isolation, time travel, concurrency
# ------------------------------------------------------------------ #

def test_lakelog_time_travel_and_overwrite(spark, tmp_path):
    from etl_script_spark.sources import lakelog

    table = str(tmp_path / "t")
    v = lakelog.write_table(
        spark.createDataFrame([(1, "a")], "k long, s string"), table
    )
    assert v == 1
    v = lakelog.write_table(
        spark.createDataFrame([(2, "b")], "k long, s string"), table
    )
    assert v == 2
    v = lakelog.write_table(
        spark.createDataFrame([(9, "z")], "k long, s string"),
        table, mode="overwrite",
    )
    assert v == 3
    assert {r["k"] for r in lakelog.read_table(spark, table).collect()} == {9}
    assert {
        r["k"] for r in lakelog.read_table(spark, table, version=2).collect()
    } == {1, 2}
    assert {
        r["k"] for r in lakelog.read_table(spark, table, version=1).collect()
    } == {1}
    with pytest.raises(ValueError, match="version"):
        lakelog.read_table(spark, table, version=99)


def test_lakelog_staged_files_invisible_until_commit(spark, tmp_path):
    import os

    from etl_script_spark.sources import lakelog

    table = str(tmp_path / "t")
    lakelog.write_table(
        spark.createDataFrame([(1,)], "k long"), table
    )
    # stage a data directory WITHOUT a commit (a crashed writer)
    orphan = os.path.join(table, "data", "deadbeef")
    spark.createDataFrame([(666,)], "k long").write.parquet(orphan)
    assert {r["k"] for r in lakelog.read_table(spark, table).collect()} == {1}


def test_lakelog_concurrent_appends_all_land_once(spark, tmp_path):
    from concurrent.futures import ThreadPoolExecutor

    from etl_script_spark.sources import lakelog

    table = str(tmp_path / "t")
    frames = [
        spark.createDataFrame([(i * 10 + j,) for j in range(3)], "k long")
        for i in range(6)
    ]
    with ThreadPoolExecutor(max_workers=6) as ex:
        versions = list(
            ex.map(lambda df: lakelog.write_table(df, table), frames)
        )
    # six contiguous versions, no lost or duplicated commit
    assert sorted(versions) == [1, 2, 3, 4, 5, 6]
    got = sorted(r["k"] for r in lakelog.read_table(spark, table).collect())
    assert got == sorted(i * 10 + j for i in range(6) for j in range(3))
