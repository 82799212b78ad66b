"""Merge-operator semantics: soft-delete diff-sync and ordered
last-write-wins upsert (SURVEY.md §2.6 J4/J6)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_script_spark.operators import merge


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_diff_sync_hard_delete_is_source(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    source = spark.createDataFrame([(2, "B"), (3, "C")], ["k", "v"])
    out = merge.diff_sync(target, source, ["k"])
    assert _rows(out, "k", "v") == [(2, "B"), (3, "C")]


def test_diff_sync_soft_delete_restore_and_stamp(spark):
    """BolApiController.php:201-249: matched/new rows are upserted with
    deleted_at restored to NULL; target rows missing from the payload
    are soft-deleted (stamped), keeping an earlier stamp if present."""
    old_stamp = dt.datetime(2020, 1, 1)
    target = spark.createDataFrame(
        [
            (1, "a", None),        # missing from source → stamped
            (2, "b", old_stamp),   # missing + already deleted → keeps stamp
            (3, "c", old_stamp),   # matched while soft-deleted → restored
        ],
        "k long, v string, deleted_at timestamp",
    )
    source = spark.createDataFrame(
        [(3, "C"), (4, "D")], "k long, v string"
    )
    stamp = dt.datetime(2024, 6, 1)
    out = merge.diff_sync(
        target,
        source,
        ["k"],
        soft_delete_col="deleted_at",
        delete_stamp=F.lit(stamp),
    )
    got = {r["k"]: (r["v"], r["deleted_at"]) for r in out.collect()}
    assert got == {
        1: ("a", stamp),       # newly soft-deleted
        2: ("b", old_stamp),   # earlier stamp preserved
        3: ("C", None),        # restored on match, payload wins
        4: ("D", None),        # inserted live
    }


def test_upsert_order_col_last_write_wins(spark):
    """Intra-batch duplicate keys resolve by the stamped ingest ordinal
    (ImportDbdFinancial.php:196-204 sequential updateOrCreate)."""
    target = spark.createDataFrame([(1, "old")], ["k", "v"])
    source = spark.createDataFrame(
        [(1, "first", 10), (1, "last", 20), (2, "x", 5)],
        ["k", "v", "ord"],
    )
    out = merge.upsert(target, source, ["k"], order_col="ord")
    assert _rows(out, "k", "v") == [(1, "last"), (2, "x")]


def test_asof_join_semantics(spark):
    """Edge cases: no preceding right row -> NULLs; equal timestamps
    match (>= semantics); a matched right row with a NULL payload
    field still counts as a match (struct carrier, not bare-column
    last+ignorenulls)."""
    from datetime import datetime

    from etl_script_spark.operators.asof import asof_join

    TS = lambda s: datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [
            (1, 10, TS("2024-01-01T00:00:00")),  # before any right row
            (2, 10, TS("2024-01-02T00:00:00")),  # == right ts (matches)
            (3, 10, TS("2024-01-04T00:00:00")),  # after both right rows
            (4, 20, TS("2024-01-05T00:00:00")),  # key with NULL payload
            (5, 30, TS("2024-01-05T00:00:00")),  # key with no right rows
        ],
        "event_id long, k long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (10, TS("2024-01-02T00:00:00"), 100.0),
            (10, TS("2024-01-03T00:00:00"), 200.0),
            (20, TS("2024-01-01T00:00:00"), None),
        ],
        "k long, ts timestamp_ntz, v double",
    )
    got = {
        r["event_id"]: (r["v_out"], r["mts"])
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            payload={"v": "v_out"}, matched_ts="mts",
        ).collect()
    }
    assert got[1] == (None, None)
    assert got[2] == (100.0, TS("2024-01-02T00:00:00"))
    assert got[3] == (200.0, TS("2024-01-03T00:00:00"))
    # NULL payload field, but the row itself matched
    assert got[4] == (None, TS("2024-01-01T00:00:00"))
    assert got[5] == (None, None)


def test_range_join_shapes_and_plans(spark):
    """Boundary semantics (lo inclusive, hi exclusive), agreement of
    the broadcast and bucketed shapes, and the intended physical
    plans: nested-loop over a broadcast dim vs an equi shuffle join."""
    from etl_script_spark.operators.asof import (
        range_join_broadcast,
        range_join_bucketed,
    )

    facts = spark.createDataFrame(
        [(1, 10.0), (2, 19.999), (3, 20.0), (4, 35.0), (5, 100.0)],
        "id long, v double",
    )
    iv = spark.createDataFrame(
        [(100, 10.0, 20.0), (200, 15.0, 40.0)], "band long, lo double, hi double"
    )
    expect = {(1, 100), (2, 100), (2, 200), (3, 200), (4, 200)}
    b = range_join_broadcast(facts, iv, "v", "lo", "hi")
    got_b = {(r["id"], r["band"]) for r in b.collect()}
    assert got_b == expect
    for width in (5.0, 12.5, 100.0):
        k = range_join_bucketed(facts, iv, "v", "lo", "hi", bucket_width=width)
        assert {(r["id"], r["band"]) for r in k.collect()} == expect
    bplan = b._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in bplan
    kplan = (
        range_join_bucketed(facts, iv, "v", "lo", "hi", bucket_width=5.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ShuffledHashJoin" in kplan or "SortMergeJoin" in kplan
