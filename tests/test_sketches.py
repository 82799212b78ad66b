"""Sketch operators: error bounds, mergeability, bloom exactness."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_script_spark.operators import sketches


def test_approx_distinct_within_bound(spark):
    df = spark.range(20000).select(
        (F.col("id") % 4).alias("g"), (F.col("id") % 1777).alias("v")
    )
    out = sketches.approx_distinct_check(df, "g", "v", rsd=0.02).collect()
    assert len(out) == 4
    for r in out:
        assert r["within_bound"], r
        # exact side is exact: ids mod 1777 spread over all 4 groups
        assert r["exact_distinct"] == 1777


def test_hll_merge_check_flags(spark):
    df = spark.range(10000).select(
        F.col("id").alias("k"), (F.col("id") % 999).alias("v")
    )
    row = sketches.hll_merge_check(df, (F.col("k") % 2).alias("h"), "v").collect()[0]
    assert row["exact_distinct"] == 999
    assert row["merged_within_bound"] and row["whole_within_bound"]


def test_heavy_hitters_pigeonhole_and_exactness(spark):
    # one key with 50%, one with 25%, the rest spread thin
    df = spark.range(8000).select(
        F.when(F.col("id") % 2 == 0, F.lit("A"))
        .when(F.col("id") % 4 == 1, F.lit("B"))
        .otherwise(F.col("id").cast("string"))
        .alias("k")
    )
    out = {r["key"]: r for r in sketches.heavy_hitters(df, "k", 0.10).collect()}
    assert set(out) == {"A", "B"}
    assert out["A"]["cnt"] == 4000 and out["B"]["cnt"] == 2000
    assert abs(out["A"]["share"] - 0.5) < 1e-12


def test_approx_quantiles_rank_bound(spark):
    df = spark.range(30000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") * 37 % 30011).cast("double").alias("v")
    )
    out = sketches.approx_quantiles_check(df, "g", "v", [0.1, 0.5, 0.9]).collect()
    assert len(out) == 9
    assert all(r["within_bound"] for r in out)


def test_approx_quantiles_survives_ties(spark):
    # heavy duplication: the rank-interval form must not flag a
    # correct sketch just because the median value repeats
    df = spark.range(10000).select(
        F.lit(0).alias("g"), (F.col("id") % 5).cast("double").alias("v")
    )
    out = sketches.approx_quantiles_check(df, "g", "v", [0.5]).collect()
    assert len(out) == 1 and out[0]["within_bound"]


def test_bloom_no_false_negatives_and_exact_join(spark):
    dim = spark.range(500).select((F.col("id") * 13).alias("dk"))
    fact = spark.range(20000).select(F.col("id").alias("fk"))
    bitmap = sketches.bloom_build(dim, "dk")
    # every true member passes the filter (no false negatives)
    members = fact.join(dim, fact["fk"] == dim["dk"], "left_semi")
    missed = members.filter(
        ~sketches.bloom_might_contain(F.col("fk"), bitmap)
    ).count()
    assert missed == 0
    # pruned-join result == plain join result
    pruned = sketches.bloom_pruned_join(fact, dim, "fk", "dk")
    plain = fact.join(dim, fact["fk"] == dim["dk"], "inner")
    assert pruned.count() == plain.count() == 500
    # and the prune actually prunes: pass rate stays near the true
    # match fraction (false positives bounded well under 5%)
    passed = fact.filter(
        sketches.bloom_might_contain(F.col("fk"), bitmap)
    ).count()
    assert passed < 500 + 0.05 * 20000


def test_theta_set_ops_exact_and_bounds(spark):
    a = spark.range(0, 600).select(F.col("id").alias("u"))
    b = spark.range(400, 1000).select(F.col("id").alias("u"))
    row = sketches.theta_set_ops_check(a, b, "u").collect()[0]
    assert row["exact_union"] == 1000
    assert row["exact_intersection"] == 200
    assert row["exact_a_only"] == 400
    assert row["union_within_bound"]
    assert row["intersection_within_bound"]
    assert row["diff_within_bound"]


def test_approx_topk_exact_mode_matches_truth(spark):
    df = spark.range(1600).select(
        F.when(F.col("id") % 2 == 0, F.lit("a"))
        .when(F.col("id") % 4 == 1, F.lit("b"))
        .otherwise(F.concat(F.lit("t"), (F.col("id") % 40).cast("string")))
        .alias("item")
    )
    out = sorted(
        ((r["item"], r["cnt"]) for r in sketches.approx_topk_items(df, "item", 2).collect()),
        key=lambda x: (-x[1], x[0]),
    )
    assert out[:2] == [("a", 800), ("b", 400)]
