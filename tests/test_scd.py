"""SCD Type-2: version chains, point-in-time reads, null-safe attr
comparison across multiple batches."""

from __future__ import annotations

from etl_script_spark.operators import scd


def _dim0(spark):
    base = spark.createDataFrame(
        [(1, "gold", 100.0), (2, "silver", 50.0), (3, "gold", None)],
        ["k", "tier", "bal"],
    )
    return scd.scd2_init(base, "2024-01-01 00:00:00")


def test_init_all_open(spark):
    d = _dim0(spark)
    rows = d.collect()
    assert len(rows) == 3 and all(r["is_current"] for r in rows)
    assert all(str(r["valid_to"]).startswith("9999") for r in rows)


def test_apply_closes_and_opens(spark):
    d = _dim0(spark)
    batch = spark.createDataFrame(
        [
            (1, "platinum", 100.0),  # tier change
            (2, "silver", 50.0),     # unchanged -> no new version
            (4, "bronze", 1.0),      # brand new key
        ],
        ["k", "tier", "bal"],
    )
    out = scd.scd2_apply(d, batch, ["k"], ["tier", "bal"], "2024-02-01 00:00:00")
    by_key = {}
    for r in out.collect():
        by_key.setdefault(r["k"], []).append(r)
    assert len(by_key[1]) == 2
    closed = [r for r in by_key[1] if not r["is_current"]][0]
    assert str(closed["valid_to"]).startswith("2024-02-01")
    opened = [r for r in by_key[1] if r["is_current"]][0]
    assert opened["tier"] == "platinum"
    assert len(by_key[2]) == 1 and by_key[2][0]["is_current"]
    assert len(by_key[3]) == 1  # absent from batch -> untouched
    assert len(by_key[4]) == 1 and by_key[4][0]["tier"] == "bronze"


def test_null_safe_attr_compare(spark):
    d = _dim0(spark)
    batch = spark.createDataFrame(
        [(3, "gold", None)], "k long, tier string, bal double"
    )
    out = scd.scd2_apply(d, batch, ["k"], ["tier", "bal"], "2024-02-01 00:00:00")
    # NULL == NULL must count as unchanged, not as a new version
    assert out.filter("k = 3").count() == 1


def test_as_of_reads_the_right_version(spark):
    d = _dim0(spark)
    b1 = spark.createDataFrame([(1, "platinum", 100.0)], ["k", "tier", "bal"])
    d = scd.scd2_apply(d, b1, ["k"], ["tier", "bal"], "2024-02-01 00:00:00")
    b2 = spark.createDataFrame([(1, "diamond", 100.0)], ["k", "tier", "bal"])
    d = scd.scd2_apply(d, b2, ["k"], ["tier", "bal"], "2024-03-01 00:00:00")
    assert d.filter("k = 1").count() == 3
    get = lambda ts: scd.as_of(d, ts).filter("k = 1").collect()[0]["tier"]  # noqa: E731
    assert get("2024-01-15 00:00:00") == "gold"
    assert get("2024-02-15 00:00:00") == "platinum"
    assert get("2024-03-15 00:00:00") == "diamond"
    # boundary: the instant of a change reads the NEW version
    assert get("2024-02-01 00:00:00") == "platinum"
