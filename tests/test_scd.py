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


def test_scd2_chained_applies_keep_partition_count_flat(spark):
    """Stress-run regression (round 5): the 5-way union concatenates
    branch partitions and the broadcast batch join never resets them,
    so chained applies multiplied partitions ~4x per batch (160 ->
    164k by batch 6 on the 100k-key stress). The operator now
    coalesces back to the incoming dim's partition count — pin it."""
    from pyspark.sql import functions as F

    from etl_script_spark.operators import scd

    dim0 = spark.range(1000).select(
        F.col("id").alias("k"), F.lit("a").alias("v")
    )
    dim = scd.scd2_init(dim0, "2026-01-01 00:00:00").localCheckpoint()
    p0 = dim.rdd.getNumPartitions()
    for i in range(1, 5):
        batch = spark.range(1000).filter(F.col("id") % 10 == i).select(
            F.col("id").alias("k"), F.lit(f"b{i}").alias("v")
        )
        dim = scd.scd2_apply(
            dim, batch, ["k"], ["v"], f"2026-01-0{i+1} 00:00:00"
        ).localCheckpoint()
        assert dim.rdd.getNumPartitions() <= p0, i
    # semantics unchanged by the coalesce: every key still current once
    assert dim.filter(F.col("is_current")).count() == 1000
