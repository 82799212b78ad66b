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


def test_null_group_rows_survive_zscore_and_minmax(spark):
    # ADVICE r4: zscore/minmax inner-joined the moments table, silently
    # dropping NULL-group rows while winsorize (left join) kept them.
    # Pinned: all three preserve row count; NULL-group rows come out
    # with a NULL score.
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), (None, 9.0), (None, None)]
    df = spark.createDataFrame(rows, "g string, v double")
    for fn, out_col in (
        (features.zscore, "z"),
        (features.minmax, "scaled"),
        (features.winsorize, "capped"),
    ):
        out = fn(df, "g", "v")
        got = [(r["g"], r["v"], r[out_col]) for r in out.collect()]
        assert len(got) == 5, fn.__name__
    # scale-by-moments ops: NULL-group rows get a NULL score (no
    # moments to scale by)
    for fn, out_col in ((features.zscore, "z"), (features.minmax, "scaled")):
        got = {(r["g"], r["v"]): r[out_col] for r in fn(df, "g", "v").collect()}
        assert got[(None, 9.0)] is None and got[(None, None)] is None
    # winsorize: no caps for a NULL group -> value passes through
    # UNCAPPED (least/greatest skip the NULL caps on both engines)
    got = {
        (r["g"], r["v"]): r["capped"]
        for r in features.winsorize(df, "g", "v").collect()
    }
    assert got[(None, 9.0)] == 9.0 and got[(None, None)] is None


def test_feat_normalize_oracle_matches_operator_with_nulls(spark):
    # ADVICE r4: the feat_normalize_pipeline oracle ranked NULL values
    # (they sort first in DuckDB's default ORDER BY) while the
    # operator filters them before rank selection — the r4 green row
    # held only because the events fixture has no NULLs. This test
    # runs the SAME oracle SQL against a NULL-containing events view
    # and compares it to the operator chain on identical rows.
    import duckdb
    import pandas as pd

    from etl_script_spark.plans.catalog import CATALOG
    from tests.oracle_utils import canon_rows

    rows = [(i, "t%d" % (i % 3), float(i * 37 % 101)) for i in range(400)]
    rows += [(1000 + i, "t0", None) for i in range(25)]       # NULL values
    rows += [(2000 + i, None, float(i)) for i in range(10)]   # NULL group
    pdf = pd.DataFrame(rows, columns=["event_id", "event_type", "value"])

    con = duckdb.connect()
    con.register("events", pdf)
    odf = con.execute(CATALOG["feat_normalize_pipeline"].oracle).df()

    ev = spark.createDataFrame(
        pdf, "event_id long, event_type string, value double"
    )
    capped = features.winsorize(
        ev, "event_type", "value", lower_q=0.05, upper_q=0.95
    ).select("event_id", "event_type", "capped")
    z = features.zscore(capped, "event_type", "capped")
    sdf = z.select(
        "event_id", "event_type", "capped", F.round(F.col("z"), 6).alias("z")
    ).toPandas()

    assert len(sdf) == len(odf) == len(pdf)
    s_rows = canon_rows(list(sdf.columns), sdf.itertuples(index=False, name=None))
    o_rows = canon_rows(list(odf.columns), odf.itertuples(index=False, name=None))
    assert s_rows == o_rows
