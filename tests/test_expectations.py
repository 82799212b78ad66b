"""Expectation rules: metrics/split agreement, referential marks,
uniqueness windows."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_script_spark.operators import expectations as ex


def _frame(spark):
    rows = [
        (1, 10.0, "F", "1-URGENT", 100),
        (2, -5.0, "O", "2-HIGH", 101),      # range violation
        (3, 20.0, "X", "3-MEDIUM", 100),    # enum violation
        (4, 30.0, "F", "9-BOGUS", 102),     # regex violation
        (5, None, "O", "4-LOW", 999),       # range (null) + ref violation
        (5, 40.0, "F", "5-NONE", 100),      # duplicate key
    ]
    return spark.createDataFrame(
        rows, ["k", "amount", "status", "prio", "cust"]
    )


def _dim(spark):
    return spark.createDataFrame([(100,), (101,), (102,)], ["c_id"])


def test_evaluate_counts_each_rule_once(spark):
    df = _frame(spark)
    marked, ref_rule = ex.referential(df, "cust", _dim(spark), "c_id")
    rules = [
        ex.not_null("k"),
        ex.in_range("amount", 0.0, 100.0),
        ex.in_set("status", ["F", "O"]),
        ex.matches("prio", r"^[1-5]-"),
        ref_rule,
        ex.unique_key(marked, ["k"]),
    ]
    out = {r["rule_name"]: r for r in ex.evaluate(marked, rules).collect()}
    assert out["not_null_k"]["violations"] == 0
    assert out["in_range_amount"]["violations"] == 2  # -5 and NULL
    assert out["in_set_status"]["violations"] == 1
    assert out["matches_prio"]["violations"] == 1
    assert out["ref_cust"]["violations"] == 1
    assert out["unique_k"]["violations"] == 2  # both rows of key 5
    assert all(r["rows"] == 6 for r in out.values())


def test_split_reasons_match_metrics(spark):
    df = _frame(spark)
    marked, ref_rule = ex.referential(df, "cust", _dim(spark), "c_id")
    rules = [
        ex.in_range("amount", 0.0, 100.0),
        ex.in_set("status", ["F", "O"]),
        ref_rule,
    ]
    passing, quarantined = ex.split(marked, rules)
    assert passing.count() + quarantined.count() == 6
    reasons = {
        r["k"]: set(r["violated"])
        for r in quarantined.select("k", "violated").collect()
    }
    assert reasons[2] == {"in_range_amount"}
    assert reasons[3] == {"in_set_status"}
    assert reasons[5] == {"in_range_amount", "ref_cust"}
    # aux mark columns are stripped from both outputs
    assert not [c for c in passing.columns if c.startswith("__")]
    assert not [c for c in quarantined.columns if c.startswith("__")]


def test_referential_does_not_change_multiplicity(spark):
    df = _frame(spark)
    marked, _ = ex.referential(df, "cust", _dim(spark), "c_id")
    assert marked.count() == df.count()


def test_value_rules_reject_null(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "F")], "k long, status string"
    )
    rules = [
        ex.in_set("status", ["F", "O"]),
        ex.matches("status", "^[FO]$"),
    ]
    out = {r["rule_name"]: r["violations"] for r in ex.evaluate(df, rules).collect()}
    assert out["in_set_status"] == 1
    assert out["matches_status"] == 1
    _, quarantined = ex.split(df, rules)
    reasons = {r["k"]: set(r["violated"]) for r in quarantined.collect()}
    assert reasons == {1: {"in_set_status", "matches_status"}}
