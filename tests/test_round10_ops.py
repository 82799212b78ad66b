"""Round-10 operators: one-way ANOVA, two-proportion z, runs test,
Benjamini-Hochberg FDR, Kaplan-Meier — hand-checked fixtures + edge
cases (the hostile shapes the oracle sweep's real data never hits)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_script_spark.operators import stats, survival


# ------------------------------------------------------------------ #
# anova_oneway
# ------------------------------------------------------------------ #

def test_anova_separated_groups_large_f(spark):
    # three groups with zero within-group variance -> SSW = 0 -> NULL
    df = spark.createDataFrame(
        [("a", 10)] * 3 + [("b", 20)] * 3 + [("c", 30)] * 3,
        "g string, v long",
    )
    row = stats.anova_oneway(df, "g", "v").collect()[0]
    assert row["n_total"] == 9 and row["n_groups"] == 3
    assert row["f_milli"] is None  # 0 denominator -> NULL, never a throw


def test_anova_identical_groups_f_zero(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 3), ("b", 1), ("b", 3)], "g string, v long"
    )
    row = stats.anova_oneway(df, "g", "v").collect()[0]
    assert row["f_milli"] == 0


def test_anova_shift_invariance(spark):
    base = [("a", 5), ("a", 9), ("b", 7), ("b", 15), ("c", 2), ("c", 4)]
    df1 = spark.createDataFrame(base, "g string, v long")
    df2 = spark.createDataFrame(
        [(g, v - 1000) for g, v in base], "g string, v long"
    )
    f1 = stats.anova_oneway(df1, "g", "v").collect()[0]["f_milli"]
    f2 = stats.anova_oneway(df2, "g", "v").collect()[0]["f_milli"]
    assert f1 == f2 and f1 is not None


# ------------------------------------------------------------------ #
# two_proportion_z
# ------------------------------------------------------------------ #

def test_two_proportion_equal_rates_z_zero(spark):
    df = spark.createDataFrame(
        [(True, True), (True, False), (False, True), (False, False)] * 10,
        "g boolean, s boolean",
    )
    row = stats.two_proportion_z(df, "g", "s").collect()[0]
    assert row["n1"] == 20 and row["n2"] == 20
    assert row["p1_ppm"] == 500000 and row["p2_ppm"] == 500000
    assert row["z_milli"] == 0


def test_two_proportion_known_value(spark):
    # arm1: 30/100, arm2: 10/100 -> pooled p=.2, se=sqrt(.2*.8*.02)
    # = .056568..., z = .2/.056568 = 3.5355
    rows = (
        [(True, True)] * 30 + [(True, False)] * 70
        + [(False, True)] * 10 + [(False, False)] * 90
    )
    df = spark.createDataFrame(rows, "g boolean, s boolean")
    row = stats.two_proportion_z(df, "g", "s").collect()[0]
    assert row["p1_ppm"] == 300000 and row["p2_ppm"] == 100000
    assert abs(row["z_milli"] - 3535) <= 2  # ppm quantization


def test_two_proportion_empty_arm_null(spark):
    df = spark.createDataFrame(
        [(True, True), (True, False)], "g boolean, s boolean"
    )
    row = stats.two_proportion_z(df, "g", "s").collect()[0]
    assert row["n2"] == 0 and row["z_milli"] is None


# ------------------------------------------------------------------ #
# runs_test_groups
# ------------------------------------------------------------------ #

def test_runs_alternating_max_runs(spark):
    # perfect alternation above/below: runs = n (after median drop)
    seq = [("g", i, 10 if i % 2 == 0 else 20) for i in range(10)]
    df = spark.createDataFrame(seq, "g string, t long, v long")
    row = stats.runs_test_groups(df, "g", "t", "v").collect()[0]
    # lower median = 10 -> the five 10s drop as ties; 5 high values
    # remain -> one run
    assert row["n_above"] == 5 and row["n_below"] == 0
    assert row["n_runs"] == 1


def test_runs_three_level_series(spark):
    # values 1,9,1,9,... median-free alternation (median=1 drops the
    # 1s? no: lower median of [1,9]*5 is 1 -> 1s drop): use 3 levels
    seq = [("g", 0, 1), ("g", 1, 9), ("g", 2, 1), ("g", 3, 9),
           ("g", 4, 5)]
    # sorted: 1,1,5,9,9 -> lower median 5 -> the 5 drops; signs by t:
    # 1(below),9(above),1(below),9(above) -> 4 runs
    df = spark.createDataFrame(seq, "g string, t long, v long")
    row = stats.runs_test_groups(df, "g", "t", "v").collect()[0]
    assert row["n_above"] == 2 and row["n_below"] == 2
    assert row["n_runs"] == 4
    # mu = 1 + 2*2*2/4 = 3 -> 3000 milli; var = 8*(8-4)/(16*3) = 2/3
    assert row["expected_milli"] == 3000
    assert row["var_micro"] == 666666
    # z = (4-3)/sqrt(2/3) = 1.2247
    assert abs(row["z_milli"] - 1224) <= 2


def test_runs_constant_series_vanishes(spark):
    # every value ties the median -> all rows drop -> no output row
    df = spark.createDataFrame(
        [("g", i, 7) for i in range(5)], "g string, t long, v long"
    )
    assert stats.runs_test_groups(df, "g", "t", "v").count() == 0


# ------------------------------------------------------------------ #
# benjamini_hochberg
# ------------------------------------------------------------------ #

def test_bh_textbook_example(spark):
    # classic: p = .01, .02, .03, .04, .05 at alpha=.05, m=5:
    # thresholds .01,.02,.03,.04,.05 -> all pass stepwise? check
    # p_i <= i*alpha/m: .01<=.01 T, .02<=.02 T, .03<=.03 T, .04<=.04
    # T, .05<=.05 T -> k=5, all rejected
    df = spark.createDataFrame(
        [(i, i * 10000) for i in range(1, 6)], "test long, p long"
    )
    rows = stats.benjamini_hochberg(df, "test", "p").collect()
    assert all(r["rejected"] for r in rows)
    # padj = min suffix of p*m/i = p*5/i = 50000 everywhere
    assert [r["padj_ppm"] for r in rows] == [50000] * 5


def test_bh_step_up_rescues_middle_p(spark):
    # p = .010, .045, .046 at alpha=.05: p3 <= 3*.05/3=.05 -> k=3,
    # ALL reject (step-up rescues p2 even though .045 > 2*.05/3=.0333)
    df = spark.createDataFrame(
        [(1, 10000), (2, 45000), (3, 46000)], "test long, p long"
    )
    rows = stats.benjamini_hochberg(df, "test", "p").collect()
    assert [r["rejected"] for r in rows] == [True, True, True]


def test_bh_none_significant(spark):
    df = spark.createDataFrame(
        [(1, 900000), (2, 950000), (3, 990000)], "test long, p long"
    )
    rows = stats.benjamini_hochberg(df, "test", "p").collect()
    assert not any(r["rejected"] for r in rows)
    assert all(r["padj_ppm"] <= 1000000 for r in rows)


def test_bh_bad_alpha_raises(spark):
    df = spark.createDataFrame([(1, 1000)], "test long, p long")
    with pytest.raises(ValueError, match="alpha_ppm"):
        stats.benjamini_hochberg(df, "test", "p", alpha_ppm=0)


# ------------------------------------------------------------------ #
# kaplan_meier_curve
# ------------------------------------------------------------------ #

def test_km_textbook_curve(spark):
    # one stratum, subjects: events at t=1 (2 of 5), censor at t=2,
    # event at t=3 (1 of 2), survivor censored at t=4
    rows = [
        ("s", 1, True), ("s", 1, True), ("s", 2, False),
        ("s", 3, True), ("s", 4, False),
    ]
    df = spark.createDataFrame(rows, "g string, t long, e boolean")
    out = {
        r["t"]: r for r in survival.kaplan_meier_curve(
            df, "g", "t", "e"
        ).collect()
    }
    # t=1: n=5, d=2 -> S = 600000
    assert out[1]["at_risk"] == 5 and out[1]["events"] == 2
    assert out[1]["surv_ppm"] == 600000
    # t=2: censor only -> S unchanged
    assert out[2]["at_risk"] == 3 and out[2]["censored"] == 1
    assert out[2]["surv_ppm"] == 600000
    # t=3: n=2, d=1 -> S = 600000*1//2 = 300000
    assert out[3]["at_risk"] == 2 and out[3]["surv_ppm"] == 300000
    # t=4: censor -> unchanged
    assert out[4]["surv_ppm"] == 300000


def test_km_all_censored_flat(spark):
    df = spark.createDataFrame(
        [("s", t, False) for t in (1, 2, 3)], "g string, t long, e boolean"
    )
    rows = survival.kaplan_meier_curve(df, "g", "t", "e").collect()
    assert all(r["surv_ppm"] == 1000000 for r in rows)


def test_km_distinct_time_guard_raises(spark):
    from pyspark.errors.exceptions.base import PySparkException
    from py4j.protocol import Py4JJavaError

    df = spark.createDataFrame(
        [("s", t, True) for t in range(30)], "g string, t long, e boolean"
    )
    with pytest.raises(
        (Py4JJavaError, PySparkException), match="max_distinct_times"
    ):
        survival.kaplan_meier_curve(
            df, "g", "t", "e", max_distinct_times=10
        ).collect()


def test_km_strata_independent(spark):
    df = spark.createDataFrame(
        [("a", 1, True), ("a", 2, True), ("b", 1, False), ("b", 2, True)],
        "g string, t long, e boolean",
    )
    out = {
        (r["stratum"], r["t"]): r["surv_ppm"]
        for r in survival.kaplan_meier_curve(df, "g", "t", "e").collect()
    }
    assert out[("a", 1)] == 500000 and out[("a", 2)] == 0
    assert out[("b", 1)] == 1000000 and out[("b", 2)] == 0


# ------------------------------------------------------------------ #
# log_rank_test
# ------------------------------------------------------------------ #

def test_log_rank_identical_curves_z_zero(spark):
    rows = [(g, t, True) for g in ("a", "b") for t in (1, 2, 3)]
    df = spark.createDataFrame(rows, "g string, t long, e boolean")
    row = survival.log_rank_test(df, "g", "t", "e").collect()[0]
    assert row["n1"] == 3 and row["n2"] == 3
    assert row["o1"] * 2 * 1000000 // 1 and row["z_milli"] == 0


def test_log_rank_separated_curves(spark):
    # group a: all events early (t=1); group b: all late (t=9) ->
    # strongly negative z for a (observed > expected at t=1 means
    # o1 > e1 -> positive z for group '0'... compute expected by hand:
    # t=1: n1=3, n2=3, d=3 (all a) -> e1 += 3*3e6/6 = 1.5e6
    # t=9: n1=0, n2=3, d=3 -> e1 += 0
    # o1 = 3, e1 = 1.5 -> num > 0 -> z > 0
    rows = [("a", 1, True)] * 3 + [("b", 9, True)] * 3
    df = spark.createDataFrame(rows, "g string, t long, e boolean")
    row = survival.log_rank_test(df, "g", "t", "e").collect()[0]
    assert row["o1"] == 3 and row["e1_ppm"] == 1500000
    assert row["z_milli"] is not None and row["z_milli"] > 2000


def test_log_rank_three_groups_raises(spark):
    from pyspark.errors.exceptions.base import PySparkException
    from py4j.protocol import Py4JJavaError

    rows = [(g, 1, True) for g in ("a", "b", "c")]
    df = spark.createDataFrame(rows, "g string, t long, e boolean")
    with pytest.raises(
        (Py4JJavaError, PySparkException), match="exactly 2 strata"
    ):
        survival.log_rank_test(df, "g", "t", "e").collect()


def test_log_rank_censoring_shrinks_risk_sets(spark):
    # a censored subject in group b at t=1 leaves b's risk set for
    # t=2 without an event
    rows = [("a", 2, True), ("a", 2, True),
            ("b", 1, False), ("b", 2, True)]
    df = spark.createDataFrame(rows, "g string, t long, e boolean")
    row = survival.log_rank_test(df, "g", "t", "e").collect()[0]
    # t=1: d=0 -> filtered. t=2: n1=2, n2=1, d=3
    # e1 = 2*3e6/3 = 2e6; o1 = 2
    assert row["o1"] == 2 and row["e1_ppm"] == 2000000


# ------------------------------------------------------------------ #
# calibration_bins
# ------------------------------------------------------------------ #

def test_calibration_perfectly_calibrated(spark):
    # bin [0.3): 300k scores, 30% positive; bin at 0.85: 85% positive
    rows = (
        [(300000, True)] * 3 + [(300000, False)] * 7
        + [(850000, True)] * 17 + [(850000, False)] * 3
    )
    df = spark.createDataFrame(rows, "s long, y boolean")
    out = {r["bin"]: r for r in stats.calibration_bins(
        df, "s", "y", n_bins=10).collect()}
    assert out[3]["n"] == 10 and out[3]["mean_score_ppm"] == 300000
    assert out[3]["event_rate_ppm"] == 300000
    assert out[8]["n"] == 20 and out[8]["event_rate_ppm"] == 850000


def test_calibration_top_edge_clamps(spark):
    df = spark.createDataFrame(
        [(1000000, True), (999999, False)], "s long, y boolean"
    )
    rows = stats.calibration_bins(df, "s", "y", n_bins=10).collect()
    assert len(rows) == 1 and rows[0]["bin"] == 9 and rows[0]["n"] == 2


def test_calibration_bad_bins_raises(spark):
    df = spark.createDataFrame([(1, True)], "s long, y boolean")
    with pytest.raises(ValueError, match="n_bins"):
        stats.calibration_bins(df, "s", "y", n_bins=1)


# ------------------------------------------------------------------ #
# mann_kendall_trend
# ------------------------------------------------------------------ #

def test_mk_strictly_increasing(spark):
    from etl_script_spark.operators import timeseries as ts

    df = spark.createDataFrame(
        [("s", i, i * 10) for i in range(10)], "g string, t long, v long"
    )
    row = ts.mann_kendall_trend(df, "g", "t", "v").collect()[0]
    assert row["s_stat"] == 45  # all 45 pairs concordant
    # no ties: var18 = 10*9*25 = 2250 -> var = 125, sd ~ 11.18
    assert row["var_x18"] == 2250
    # z = (45-1)/11.180 = 3.9355
    assert abs(row["z_milli"] - 3935) <= 2


def test_mk_strictly_decreasing_symmetric(spark):
    from etl_script_spark.operators import timeseries as ts

    up = spark.createDataFrame(
        [("s", i, i) for i in range(8)], "g string, t long, v long"
    )
    dn = spark.createDataFrame(
        [("s", i, -i) for i in range(8)], "g string, t long, v long"
    )
    zu = ts.mann_kendall_trend(up, "g", "t", "v").collect()[0]["z_milli"]
    zd = ts.mann_kendall_trend(dn, "g", "t", "v").collect()[0]["z_milli"]
    assert zu > 0 and zd == -zu


def test_mk_constant_series_null_z(spark):
    from etl_script_spark.operators import timeseries as ts

    df = spark.createDataFrame(
        [("s", i, 7) for i in range(6)], "g string, t long, v long"
    )
    row = ts.mann_kendall_trend(df, "g", "t", "v").collect()[0]
    # all tied: S = 0, var18 = n(n-1)(2n+5) - n(n-1)(2n+5) = 0 -> NULL
    assert row["s_stat"] == 0 and row["var_x18"] == 0
    assert row["z_milli"] is None


def test_mk_guard_raises(spark):
    from pyspark.errors.exceptions.base import PySparkException
    from py4j.protocol import Py4JJavaError

    from etl_script_spark.operators import timeseries as ts

    df = spark.createDataFrame(
        [("s", i, i) for i in range(30)], "g string, t long, v long"
    )
    with pytest.raises(
        (Py4JJavaError, PySparkException), match="max_group_rows"
    ):
        ts.mann_kendall_trend(df, "g", "t", "v", max_series_rows=10).collect()


# ------------------------------------------------------------------ #
# seasonal_decompose_ma
# ------------------------------------------------------------------ #

def test_decompose_recovers_pure_seasonal(spark):
    from etl_script_spark.operators import timeseries as ts

    # pure period-3 signal on a flat base: v = [10, 20, 30] repeating
    rows = [("s", i, [10, 20, 30][i % 3]) for i in range(12)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    out = ts.seasonal_decompose_ma(df, "g", "t", "v", period=3).collect()
    mid = [r for r in out if r["trend_milli"] is not None]
    # interior trend = mean(10,20,30) = 20 everywhere
    assert all(r["trend_milli"] == 20000 for r in mid)
    # seasonal indices recover -10, 0, +10 (phase order by t)
    assert all(r["residual_milli"] == 0 for r in mid)
    # edges: first and last row have NULL trend (honest edges)
    by_t = {r["t"]: r for r in out}
    assert by_t[0]["trend_milli"] is None
    assert by_t[11]["trend_milli"] is None


def test_decompose_even_period_raises(spark):
    from etl_script_spark.operators import timeseries as ts

    df = spark.createDataFrame([("s", 1, 1)], "g string, t long, v long")
    with pytest.raises(ValueError, match="odd"):
        ts.seasonal_decompose_ma(df, "g", "t", "v", period=4)


# ------------------------------------------------------------------ #
# chao1_richness
# ------------------------------------------------------------------ #

def test_chao1_hand_computed(spark):
    from etl_script_spark.operators import corpusstats

    # corpus: "a a b c" + "c d" -> counts a:2 b:1 c:2 d:1
    # V=4, f1=2, f2=2, chao1 = 4 + 2*1/(2*3) = 4 + 0 (floor) = 4
    df = spark.createDataFrame(
        [("a a b c",), ("c d",)], "text string"
    )
    row = corpusstats.chao1_richness(df, "text").collect()[0]
    assert row["v_obs"] == 4 and row["f1"] == 2 and row["f2"] == 2
    assert row["chao1"] == 4


def test_chao1_many_singletons_extrapolates(spark):
    from etl_script_spark.operators import corpusstats

    # 10 singletons, no doubletons: chao1 = 10 + 10*9/2 = 55
    df = spark.createDataFrame(
        [(" ".join(f"w{i}" for i in range(10)),)], "text string"
    )
    row = corpusstats.chao1_richness(df, "text").collect()[0]
    assert row["v_obs"] == 10 and row["f1"] == 10 and row["f2"] == 0
    assert row["chao1"] == 55
