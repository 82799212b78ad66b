"""Incremental aggregate maintenance: partial states merge to the
from-scratch answer regardless of how the input was split."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_script_spark.operators import incremental as inc


def test_merge_equals_from_scratch(spark):
    df = spark.range(10000).select(
        (F.col("id") % 7).alias("g"),
        (F.col("id") * 0.25 + 3).alias("x"),
    )
    keys, measures = ["g"], ["x"]
    # adversarial split: uneven slice sizes so avg-of-avgs would differ
    slices = [
        df.filter(F.col("id") % 100 < 3),
        df.filter((F.col("id") % 100 >= 3) & (F.col("id") % 100 < 60)),
        df.filter(F.col("id") % 100 >= 60),
    ]
    merged = inc.finalize(
        inc.merge_states(
            [inc.partial_state(s, keys, measures) for s in slices],
            keys,
            measures,
        ),
        keys,
        measures,
    )
    whole = inc.finalize(inc.partial_state(df, keys, measures), keys, measures)
    m = {r["g"]: r for r in merged.collect()}
    w = {r["g"]: r for r in whole.collect()}
    assert set(m) == set(w)
    for g in w:
        for c in ("n_rows", "x_sum", "x_min", "x_max", "x_avg"):
            assert m[g][c] == w[g][c], (g, c, m[g][c], w[g][c])


def test_empty_slice_is_identity(spark):
    df = spark.range(100).select((F.col("id") % 3).alias("g"), F.col("id").alias("x"))
    keys, measures = ["g"], ["x"]
    empty = df.filter(F.lit(False))
    merged = inc.merge_states(
        [inc.partial_state(df, keys, measures), inc.partial_state(empty, keys, measures)],
        keys,
        measures,
    )
    whole = inc.partial_state(df, keys, measures)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_avg_with_nullable_measure_matches_f_avg(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, 10.0), (0, None), (0, 20.0), (1, None)],
        "g long, x double",
    )
    keys, measures = ["g"], ["x"]
    out = {
        r["g"]: r
        for r in inc.finalize(
            inc.partial_state(df, keys, measures), keys, measures
        ).collect()
    }
    ref = {
        r["g"]: r["avg(x)"]
        for r in df.groupBy("g").agg(F.avg("x")).collect()
    }
    assert out[0]["x_avg"] == ref[0] == 15.0
    assert out[1]["x_avg"] is None and ref[1] is None


def _rows_sorted(df):
    cols = sorted(df.columns)
    return [tuple(r[c] for c in cols) for r in
            sorted(df.collect(), key=lambda r: tuple(str(r[c]) for c in cols))]


def test_join_agg_maintenance_batching_independent(spark):
    """maintain_join_agg finalizes BITWISE identical across 1/2/4-way
    delta splits and to a from-scratch join+groupBy."""
    fact = spark.range(2000).select(
        F.col("id").alias("fk_raw"),
        (F.col("id") % 37).alias("fk"),
        ((F.col("id") * 7919) % 1000).cast("double").alias("amt"),
    )
    dim = spark.range(37).select(
        F.col("id").alias("dk"), (F.col("id") % 5).alias("grp")
    )
    on = F.col("fk") == F.col("dk")
    keys, measures = ["grp"], ["amt"]

    def fold(splits):
        state = None
        lo = 0
        for hi in splits + [2000]:
            b = fact.filter((F.col("fk_raw") >= lo) & (F.col("fk_raw") < hi))
            state = inc.maintain_join_agg(state, b, dim, on, keys, measures)
            lo = hi
        return _rows_sorted(inc.finalize(state, keys, measures))

    one = fold([])
    two = fold([700])
    four = fold([300, 900, 1600])
    assert one == two == four
    scratch = _rows_sorted(
        inc.finalize(
            inc.partial_state(fact.join(dim, on), keys, measures),
            keys, measures,
        )
    )
    assert one == scratch


def test_retractable_fold_equals_recompute_on_survivors(spark):
    """Insert-then-delete in arbitrary batching == from-scratch over
    the surviving rows; fully-retracted groups vanish."""
    fact = spark.range(3000).select(
        F.col("id").alias("rid"),
        (F.col("id") % 41).alias("fk"),
        ((F.col("id") * 31) % 500).cast("double").alias("amt"),
    )
    dim = spark.range(41).select(
        F.col("id").alias("dk"), (F.col("id") % 6).alias("grp")
    )
    on = F.col("fk") == F.col("dk")
    keys, measures = ["grp"], ["amt"]
    # grp 5 is retracted ENTIRELY (fk % 6 == 5 -> delete every row)
    doomed = F.col("fk") % 6 == 5
    ins = fact.withColumn("sign", F.lit(1))
    dels = fact.filter((F.col("rid") % 3 == 0) | doomed).withColumn(
        "sign", F.lit(-1)
    )
    state = None
    for b in (
        ins.filter(F.col("rid") < 1000),
        ins.filter(F.col("rid") >= 1000),
        dels.filter(F.col("rid") % 2 == 0),
        dels.filter(F.col("rid") % 2 == 1),
    ):
        state = inc.maintain_join_agg_retractable(
            state, b, dim, on, keys, measures, "sign"
        )
    got = _rows_sorted(inc.finalize_signed(state, keys, measures))
    survivors = fact.filter(~((F.col("rid") % 3 == 0) | doomed))
    scratch_state = inc.signed_partial_state(
        survivors.withColumn("sign", F.lit(1)).join(dim, on),
        keys, measures, "sign",
    )
    want = _rows_sorted(inc.finalize_signed(scratch_state, keys, measures))
    assert got == want
    # the doomed group is absent from the finalized view
    grp_idx = sorted(["grp", "n_rows", "amt_sum", "amt_avg"]).index("grp")
    assert not any(r[grp_idx] == 5 for r in got)
