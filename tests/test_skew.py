"""Skew utilities: salted join and two-phase aggregation must return
exactly what their unsalted equivalents return."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_script_spark.operators import skew


def _skewed_df(spark):
    # one hot key (90% of rows) + long tail
    return spark.range(2000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 'HOT' ELSE CONCAT('k', id) END AS key",
        "id AS v",
    )


def test_salted_join_matches_plain(spark):
    big = _skewed_df(spark)
    dim = spark.createDataFrame(
        [("HOT", "hot-dim"), ("k9", "nine"), ("k19", "nineteen")],
        ["key", "label"],
    )
    plain = big.join(dim, "key").groupBy("key", "label").count()
    salted = skew.salted_join(big, dim, "key").groupBy("key", "label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_rejects_right_full(spark):
    import pytest

    big = _skewed_df(spark)
    dim = spark.createDataFrame([("HOT", "x")], ["key", "label"])
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="inner.*left"):
            skew.salted_join(big, dim, "key", how=how)


def test_two_phase_agg_matches_plain(spark):
    df = _skewed_df(spark)
    plain = {
        (r["key"]): (r["s"], r["n"])
        for r in df.groupBy("key")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    two = {
        (r["key"]): (r["sum_v"], r["cnt_v"])
        for r in skew.two_phase_agg(
            df,
            ["key"],
            {"sum_v": F.sum("v"), "cnt_v": F.count(F.lit(1))},
        ).collect()
    }
    assert plain == two


def test_bucketed_join_no_exchange(spark, sf_dir):
    """Both sides bucketed by the join key at rest → the sort-merge
    join runs with ZERO Exchange nodes AND actually reads the buckets
    (a broadcast plan would skip bucketing and pass the exchange
    assertion vacuously)."""
    from etl_script_spark.plans.catalog import CATALOG

    df = CATALOG["bucketed_join_zero_shuffle"].spark(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Bucketed: true" in plan
    assert "BroadcastHashJoin" not in plan


def test_skew_pipeline_plan_shows_salt_spread(spark, sf_dir):
    """VERDICT r3 #8: the e2e hot-company pipeline's physical plan
    must actually carry the salt — dim side exploded into all salts,
    join and partial aggregate keyed on (key, __salt) — not collapse
    back to a plain hot-key join."""
    from etl_script_spark.plans.catalog import CATALOG

    df = CATALOG["pipeline_skew_hot_company_e2e"].spark(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "pmod" in plan          # per-row deterministic salt
    assert "explode" in plan       # dim replicated into every salt
    assert "__salt" in plan        # join/partial-agg keys carry it
