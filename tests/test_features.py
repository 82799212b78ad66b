"""Feature normalization: caps are data elements, z/minmax semantics,
degenerate groups."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_script_spark.operators import features


def _df(spark):
    rows = [("a", float(v)) for v in range(1, 101)] + [
        ("a", 1000.0),          # outlier
        ("b", 5.0), ("b", 5.0), # constant group
        ("c", 7.0),             # singleton group
    ]
    return spark.createDataFrame(rows, ["g", "v"])


def test_winsorize_caps_are_group_elements(spark):
    out = features.winsorize(_df(spark), "g", "v", 0.05, 0.95)
    a = out.filter("g = 'a'")
    vals = {r["capped"] for r in a.collect()}
    # the outlier is capped to an actual element of the group
    assert 1000.0 not in vals
    assert max(vals) <= 101.0
    # caps at q=0.05 of 101 elements -> rank 6 -> value 6.0
    assert a.agg(F.min("capped")).collect()[0][0] == 6.0


def test_zscore_semantics_and_degenerate_groups(spark):
    out = features.zscore(_df(spark), "g", "v")
    rows = {(r["g"], r["v"]): r["z"] for r in out.collect()}
    # constant group and singleton -> NULL z
    assert rows[("b", 5.0)] is None
    assert rows[("c", 7.0)] is None
    # z has mean ~0 over group a, and the outlier owns the max z
    zs = {(g, v): z for (g, v), z in rows.items() if g == "a"}
    vals = list(zs.values())
    assert abs(sum(vals) / len(vals)) < 1e-9
    assert zs[("a", 1000.0)] == max(vals) > 3


def test_minmax_bounds_and_constant_group(spark):
    out = features.minmax(_df(spark), "g", "v")
    rows = [(r["g"], r["v"], r["scaled"]) for r in out.collect()]
    a_scaled = [s for g, _, s in rows if g == "a"]
    assert min(a_scaled) == 0.0 and max(a_scaled) == 1.0
    assert all(s is None for g, _, s in rows if g == "b")


def test_zscore_partitioning_independent(spark):
    df = spark.range(5000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        (F.col("id") * 37 % 1009).cast("double").alias("v"),
    )
    a = sorted(map(tuple, features.zscore(df, "g", "v").collect()))
    b = sorted(map(tuple, features.zscore(df.repartition(23), "g", "v").collect()))
    assert a == b


def test_winsorize_null_values_stay_null_and_do_not_shift_caps(spark):
    rows = [("a", None)] * 30 + [("a", float(v)) for v in range(1, 101)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = features.winsorize(df, "g", "v", 0.05, 0.95)
    got = [(r["v"], r["capped"]) for r in out.collect()]
    # NULL in -> NULL out, never a fabricated cap value
    assert all(c is None for v, c in got if v is None)
    # caps computed over the 100 non-null values only:
    # rank floor(0.05*99)+1 = 5 -> 5.0, floor(0.95*99)+1 = 95 -> 95.0
    nonnull = [c for v, c in got if v is not None]
    assert min(nonnull) == 5.0 and max(nonnull) == 95.0
