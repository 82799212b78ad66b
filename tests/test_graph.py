"""PageRank: structural sanity on known graphs + determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_script_spark.operators import graph


def _ranks(spark, edges, iters=3):
    e = spark.createDataFrame(edges, ["src", "dst"])
    out = graph.pagerank(e, "src", "dst", iters=iters)
    return {r["vertex"]: r["rank_nano"] for r in out.collect()}


def test_cycle_stays_uniform(spark):
    # ring: every vertex has in=out=1 -> ranks stay equal forever
    n = 10
    r = _ranks(spark, [(i, (i + 1) % n) for i in range(n)])
    assert len(set(r.values())) == 1
    # and equal to the fixed point 0.15 + 0.85*r -> r = 1.0 (nano)
    assert abs(next(iter(r.values())) - 1_000_000_000) < 5


def test_star_hub_dominates(spark):
    # every spoke points at the hub; hub points at one spoke
    edges = [(i, 0) for i in range(1, 8)] + [(0, 1)]
    r = _ranks(spark, edges)
    assert r[0] > max(v for k, v in r.items() if k != 0) * 2


def test_dangling_vertex_keeps_teleport_share(spark):
    # 1 -> 2; 2 has no out-edges (dangling): after round 1 vertex 1
    # gets only the teleport share
    r = _ranks(spark, [(1, 2)], iters=2)
    assert r[1] == 150_000_000
    assert r[2] > r[1]


def test_partitioning_independent(spark):
    edges = [(i, (i * 7 + 3) % 50) for i in range(50)] + [
        (i, (i * 11 + 1) % 50) for i in range(50)
    ]
    e = spark.createDataFrame(edges, ["src", "dst"])
    a = {
        r["vertex"]: r["rank_nano"]
        for r in graph.pagerank(e, "src", "dst", 3).collect()
    }
    b = {
        r["vertex"]: r["rank_nano"]
        for r in graph.pagerank(e.repartition(13), "src", "dst", 3).collect()
    }
    assert a == b
