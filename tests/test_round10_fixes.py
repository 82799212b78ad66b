"""Round-10 hardening: lakelog commit visibility, avro edge frames,
layout key validation, the one-row group-size guard broadcast, and the
conditional FK-audit hint."""
from __future__ import annotations

import io
import json
import os
import threading

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------ #
# lakelog: a visible commit is ALWAYS complete (reader vs writer race)
# ------------------------------------------------------------------ #

def test_lakelog_commit_never_visible_partial(tmp_path):
    """_try_commit must publish via link-after-fsync: any commit file
    a reader can see must json.load cleanly. Race a reader loop doing
    snapshot replay against writers CASing commits in."""
    from etl_script_spark.sources import lakelog

    table = str(tmp_path / "t")
    errors: list[BaseException] = []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                head = lakelog.latest_version(table)
                if head:
                    # replay every visible commit — a partial file
                    # would crash json.load here
                    for v in range(1, head + 1):
                        with open(lakelog._commit_path(table, v)) as f:
                            c = json.load(f)
                        assert c["version"] == v
            except BaseException as e:  # noqa: BLE001
                errors.append(e)
                return

    t = threading.Thread(target=reader)
    t.start()
    # entry large enough that a create-then-write scheme would give
    # the reader a real window to observe a partial file
    big = {"pad": "x" * 65536}
    for v in range(1, 60):
        entry = {"version": v, "parent": v - 1, "action": "append",
                 "files": [f"data/f{v}.parquet"], **big}
        assert lakelog._try_commit(table, v, entry)
    stop.set()
    t.join()
    assert errors == []
    # no temp droppings left behind
    leftovers = [
        f for f in os.listdir(lakelog._commit_dir(table))
        if not f.endswith(".json")
    ]
    assert leftovers == []


def test_lakelog_cas_loser_gets_false_and_cleans_up(tmp_path):
    from etl_script_spark.sources import lakelog

    table = str(tmp_path / "t")
    e = {"version": 1, "parent": 0, "action": "append", "files": []}
    assert lakelog._try_commit(table, 1, e)
    assert not lakelog._try_commit(table, 1, e)  # EEXIST → False
    names = sorted(os.listdir(lakelog._commit_dir(table)))
    assert names == ["0000000001.json"]


# ------------------------------------------------------------------ #
# avro: spec-correct failure on negative metadata counts; empty files
# keep their columns through the distributed read
# ------------------------------------------------------------------ #

def test_avro_negative_meta_count_raises_before_misalignment():
    from etl_script_spark.sources.avro_io import (
        _MAGIC, _zigzag_encode, read_avro_bytes,
    )

    # container whose metadata map opens with a negative block count;
    # per spec a byte-size long follows, which this reader does not
    # support — it must say so, not surface garbage decode errors
    data = _MAGIC + _zigzag_encode(-2)
    with pytest.raises(ValueError, match="negative-count"):
        read_avro_bytes(data)


def test_avro_distributed_read_tolerates_empty_shards(spark, tmp_path):
    from etl_script_spark.sources.avro_io import (
        read_avro_distributed, write_avro,
    )

    schema = {
        "type": "record", "name": "r",
        "fields": [{"name": "k", "type": "long"},
                   {"name": "s", "type": "string"}],
    }
    # shard 0: records; shards 1-2: zero records (header only)
    write_avro(str(tmp_path / "p0.avro"), schema,
               [{"k": 1, "s": "a"}, {"k": 2, "s": "b"}])
    write_avro(str(tmp_path / "p1.avro"), schema, [])
    write_avro(str(tmp_path / "p2.avro"), schema, [])
    out = read_avro_distributed(
        spark, str(tmp_path / "p*.avro"), "k long, s string"
    )
    rows = sorted((r["k"], r["s"]) for r in out.collect())
    assert rows == [(1, "a"), (2, "b")]


def test_avro_all_empty_shards_give_empty_frame(spark, tmp_path):
    from etl_script_spark.sources.avro_io import (
        read_avro_distributed, write_avro,
    )

    schema = {
        "type": "record", "name": "r",
        "fields": [{"name": "k", "type": "long"}],
    }
    for i in range(3):
        write_avro(str(tmp_path / f"e{i}.avro"), schema, [])
    out = read_avro_distributed(spark, str(tmp_path / "e*.avro"), "k long")
    assert out.count() == 0
    assert out.columns == ["k"]


# ------------------------------------------------------------------ #
# layout: non-integral cluster keys raise instead of NULLing out
# ------------------------------------------------------------------ #

def test_file_skipping_stats_rejects_string_key(spark, tmp_path):
    from etl_script_spark.sources import layout

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, name string"
    ).write.parquet(p)
    with pytest.raises(ValueError, match="must be integral"):
        layout.file_skipping_stats(spark, p, "name", 1, 2)
    with pytest.raises(ValueError, match="not in table"):
        layout.file_skipping_stats(spark, p, "missing", 1, 2)
    # integral keys still work
    rows = layout.file_skipping_stats(spark, p, "k", 5, 9).collect()
    assert all(r["skippable"] for r in rows)


# ------------------------------------------------------------------ #
# group-size guard: broadcast side is ONE row by construction
# ------------------------------------------------------------------ #

def test_guard_broadcast_is_single_validated_row(spark):
    """The guard's broadcast must be the global (max, argmax) fold —
    ONE row attached via an IdentityBroadcastMode nested-loop join
    (Catalyst folds the constant-key equi-join to exactly that) —
    never the per-group count table whose cardinality is unbounded
    at 100 TB (a HashedRelationBroadcastMode keyed on group values)."""
    from etl_script_spark.operators import stats

    df = spark.createDataFrame(
        [(f"g{i}", j, j * 2) for i in range(20) for j in range(3)],
        "g string, x long, y long",
    )
    out = stats._guard_group_size(df, "g", 10, "op")
    assert out.count() == 60  # all groups under the bound pass through
    plan = out._jdf.queryExecution().executedPlan().toString()
    # guard in isolation: its ONLY broadcast is the single-row
    # identity attach — no keyed (unbounded) broadcast exists
    assert plan.count("BroadcastExchange") == 1
    assert "IdentityBroadcastMode" in plan
    assert "HashedRelationBroadcastMode" not in plan


def test_guard_empty_input_passes_through(spark):
    from etl_script_spark.operators import stats

    df = spark.createDataFrame([], "g string, x long, y long")
    assert stats.theil_sen_groups(
        df, "g", "x", "y", max_group_rows=10
    ).count() == 0
    assert stats.kendall_tau_groups(
        df, "g", "x", "y", max_group_rows=10
    ).count() == 0


def test_guard_error_names_the_offending_group(spark):
    from pyspark.errors.exceptions.base import PySparkException
    from py4j.protocol import Py4JJavaError

    from etl_script_spark.operators import stats

    df = spark.createDataFrame(
        [("small", 1, 1), ("small", 2, 2)]
        + [("huge", i, i) for i in range(30)],
        "g string, x long, y long",
    )
    with pytest.raises((Py4JJavaError, PySparkException), match="huge"):
        stats.theil_sen_groups(
            df, "g", "x", "y", max_group_rows=10
        ).collect()


# ------------------------------------------------------------------ #
# FK audit: the dim-keys broadcast hint is conditional
# ------------------------------------------------------------------ #

def test_fk_audit_unhinted_matches_hinted(spark):
    from etl_script_spark.operators.expectations import (
        referential_integrity_report,
    )

    fact = spark.createDataFrame(
        [(1,), (2,), (9,), (None,)], "fk int"
    )
    dim = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    rels = [("f2d", fact, "fk", dim, "k")]
    hinted = referential_integrity_report(rels).collect()[0]
    plain = referential_integrity_report(
        rels, broadcast_dim_keys=False
    ).collect()[0]
    assert hinted.asDict() == plain.asDict()
    assert plain["n_orphans"] == 1 and plain["n_nulls"] == 1
    # the unhinted plan carries no broadcast hint at the logical level
    out = referential_integrity_report(rels, broadcast_dim_keys=False)
    logical = out._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in logical


# ------------------------------------------------------------------ #
# lakelog v2: schema-on-commit, checkpointing, transactional upsert
# ------------------------------------------------------------------ #

def test_lakelog_append_schema_mismatch_raises(spark, tmp_path):
    from etl_script_spark.sources import lakelog

    table = str(tmp_path / "t")
    lakelog.write_table(
        spark.createDataFrame([(1, "a")], "k long, name string"), table
    )
    with pytest.raises(ValueError, match="append schema does not match"):
        lakelog.write_table(
            spark.createDataFrame([(2.5, "b")], "k double, name string"),
            table,
        )
    with pytest.raises(ValueError, match="append schema does not match"):
        lakelog.write_table(
            spark.createDataFrame([(2,)], "k long"), table
        )
    # overwrite legitimately changes the schema; appends then follow it
    lakelog.write_table(
        spark.createDataFrame([(9,)], "k long"), table, mode="overwrite"
    )
    lakelog.write_table(spark.createDataFrame([(10,)], "k long"), table)
    got = sorted(r["k"] for r in lakelog.read_table(spark, table).collect())
    assert got == [9, 10]


def test_lakelog_checkpoint_written_and_actually_used(spark, tmp_path):
    """Replay must start from the newest checkpoint: after the
    version-10 checkpoint lands, commits 1..9 are DELETED — snapshot
    reads at head still work (proof the O(versions) walk is gone),
    while time travel to a pre-checkpoint version now fails (those
    commits are the only source for it)."""
    from etl_script_spark.sources import lakelog

    table = str(tmp_path / "t")
    for i in range(1, 13):
        lakelog.write_table(
            spark.createDataFrame([(i,)], "k long"), table
        )
    assert os.path.exists(lakelog._ckpt_path(table, 10))
    for v in range(1, 10):
        os.unlink(lakelog._commit_path(table, v))
    got = sorted(r["k"] for r in lakelog.read_table(spark, table).collect())
    assert got == list(range(1, 13))
    # version 10 replays straight off the checkpoint
    got10 = sorted(
        r["k"] for r in lakelog.read_table(spark, table, version=10).collect()
    )
    assert got10 == list(range(1, 11))


def test_lakelog_upsert_txn_merges_and_time_travels(spark, tmp_path):
    from etl_script_spark.sources import lakelog

    table = str(tmp_path / "t")
    lakelog.write_table(
        spark.createDataFrame(
            [(1, "old"), (2, "old")], "k long, v string"
        ),
        table,
    )
    ver = lakelog.upsert_table(
        spark,
        spark.createDataFrame([(2, "new"), (3, "new")], "k long, v string"),
        table,
        keys=["k"],
    )
    assert ver == 2
    got = sorted(
        (r["k"], r["v"]) for r in lakelog.read_table(spark, table).collect()
    )
    assert got == [(1, "old"), (2, "new"), (3, "new")]
    v1 = sorted(
        (r["k"], r["v"])
        for r in lakelog.read_table(spark, table, version=1).collect()
    )
    assert v1 == [(1, "old"), (2, "old")]


def test_lakelog_upsert_into_empty_table(spark, tmp_path):
    from etl_script_spark.sources import lakelog

    table = str(tmp_path / "t")
    ver = lakelog.upsert_table(
        spark,
        spark.createDataFrame([(1, "a")], "k long, v string"),
        table,
        keys=["k"],
    )
    assert ver == 1
    assert lakelog.read_table(spark, table).collect()[0]["v"] == "a"


def test_lakelog_concurrent_upserts_and_appends_serialize(spark, tmp_path):
    """Upserts racing appends: every commit must be a function of its
    immediate parent (a lost CAS recomputes), so the final state is
    SOME serial order — which for disjoint-key appends + last-write
    upserts on key 0 means: all appended keys present exactly once,
    key 0 carrying one of the upsert values."""
    from concurrent.futures import ThreadPoolExecutor

    from etl_script_spark.sources import lakelog

    table = str(tmp_path / "t")
    lakelog.write_table(
        spark.createDataFrame([(0, "base")], "k long, v string"), table
    )

    def do_append(i):
        return lakelog.write_table(
            spark.createDataFrame([(i, f"a{i}")], "k long, v string"),
            table, max_retries=60,
        )

    def do_upsert(i):
        return lakelog.upsert_table(
            spark,
            spark.createDataFrame([(0, f"u{i}")], "k long, v string"),
            table, keys=["k"], max_retries=60,
        )

    with ThreadPoolExecutor(max_workers=6) as ex:
        futs = [ex.submit(do_append, i) for i in (1, 2, 3)]
        futs += [ex.submit(do_upsert, i) for i in (1, 2)]
        versions = [f.result() for f in futs]
    assert sorted(versions) == [2, 3, 4, 5, 6]  # every commit landed once
    rows = {r["k"]: r["v"] for r in lakelog.read_table(spark, table).collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert rows[1] == "a1" and rows[2] == "a2" and rows[3] == "a3"
    assert rows[0] in {"u1", "u2"}


# ------------------------------------------------------------------ #
# avro logical types: decimal(15,2) + date roundtrip fuzz
# ------------------------------------------------------------------ #

def test_avro_logical_types_randomized_roundtrip(tmp_path):
    import datetime
    import random
    from decimal import Decimal

    from etl_script_spark.sources.avro_io import read_avro_bytes, write_avro

    rng = random.Random(101)
    dec_t = {"type": "bytes", "logicalType": "decimal",
             "precision": 15, "scale": 2}
    schema = {"type": "record", "name": "m", "fields": [
        {"name": "amt", "type": dec_t},
        {"name": "opt_amt", "type": ["null", dec_t]},
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
    ]}
    epoch = datetime.date(1970, 1, 1)
    recs = []
    for _ in range(400):
        # full decimal(15,2) magnitude range incl. negatives and the
        # ±10^13 boundary (13 integer digits + 2 scale)
        cents = rng.randrange(-(10**15) + 1, 10**15)
        amt = Decimal(cents).scaleb(-2)
        recs.append({
            "amt": amt,
            "opt_amt": None if rng.random() < 0.3 else amt * -1,
            # dates far before and after the epoch (negative varints)
            "d": epoch + datetime.timedelta(
                days=rng.randrange(-100_000, 100_000)
            ),
        })
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"m_{codec}.avro")
        write_avro(p, schema, recs, codec=codec, block_records=37)
        _, got = read_avro_bytes(open(p, "rb").read())
        assert got == recs, codec


def test_avro_decimal_exactness_beyond_double(tmp_path):
    """The value 0.1 + 10^13-ish cents that a double would corrupt
    must round-trip bit-exact through the bytes-backed decimal."""
    from decimal import Decimal

    from etl_script_spark.sources.avro_io import read_avro_bytes, write_avro

    dec_t = {"type": "bytes", "logicalType": "decimal",
             "precision": 15, "scale": 2}
    schema = {"type": "record", "name": "m",
              "fields": [{"name": "amt", "type": dec_t}]}
    vals = [Decimal("9999999999999.99"), Decimal("-9999999999999.99"),
            Decimal("0.01"), Decimal("-0.01"), Decimal("0.00"),
            Decimal("1234567890123.45")]
    # a double's exact binary expansion of these differs — i.e. the
    # float path carries representation error the bytes path must not
    assert any(Decimal(float(v)) != v for v in vals)
    p = str(tmp_path / "m.avro")
    write_avro(p, schema, [{"amt": v} for v in vals])
    _, got = read_avro_bytes(open(p, "rb").read())
    assert [r["amt"] for r in got] == vals


def test_guard_error_with_null_group_key(spark):
    """A NULL group key over the bound must still raise with a
    readable message — concat with a NULL key would otherwise null
    out the whole raise_error string."""
    from pyspark.errors.exceptions.base import PySparkException
    from py4j.protocol import Py4JJavaError

    from etl_script_spark.operators import stats

    df = spark.createDataFrame(
        [(None, i, i) for i in range(30)], "g string, x long, y long"
    )
    with pytest.raises(
        (Py4JJavaError, PySparkException), match="max_group_rows"
    ):
        stats._guard_group_size(df, "g", 10, "op").collect()


def test_lakelog_negative_version_raises(spark, tmp_path):
    from etl_script_spark.sources import lakelog

    table = str(tmp_path / "t")
    lakelog.write_table(spark.createDataFrame([(1,)], "k long"), table)
    with pytest.raises(ValueError, match="version"):
        lakelog.snapshot_files(table, -1)
