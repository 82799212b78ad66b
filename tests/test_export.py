"""Sharded training-data export (operators/export.py): deterministic
assignment, one file per shard on disk, and the write-audit manifest
equaling the pre-write expectation."""

from __future__ import annotations

import glob
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_script_spark.operators import export as export_ops

N_SHARDS = 8


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("word "), F.repeat(F.lit("tok "), (F.col("id") % 5 + 1).cast("int"))).alias("text"),
    )


def test_assignment_deterministic_and_in_range(docs):
    a = docs.select(
        "doc_id", export_ops.shard_id(F.col("doc_id"), N_SHARDS, "s").alias("sh")
    )
    b = docs.select(
        "doc_id", export_ops.shard_id(F.col("doc_id"), N_SHARDS, "s").alias("sh2")
    )
    j = a.join(b, "doc_id")
    assert j.filter(F.col("sh") != F.col("sh2")).count() == 0
    lo, hi = a.agg(F.min("sh"), F.max("sh")).first()
    assert 0 <= lo and hi < N_SHARDS
    # a different seed moves documents: the two assignments differ
    c = docs.select(
        "doc_id", export_ops.shard_id(F.col("doc_id"), N_SHARDS, "t").alias("sh3")
    )
    assert a.join(c, "doc_id").filter(F.col("sh") != F.col("sh3")).count() > 0


def test_write_one_file_per_shard_and_audit(docs, spark):
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/shards"
        manifest = export_ops.write_train_shards(
            docs, path, "doc_id", "text", N_SHARDS, seed="s"
        ).collect()
        # every shard dir holds exactly one parquet file
        for row in manifest:
            files = glob.glob(f"{path}/shard={row['shard']}/*.parquet")
            assert len(files) == 1, files
        # audit manifest equals the pre-write expectation
        expect = {
            r["shard"]: (r["n_docs"], r["n_tokens"], r["n_chars"])
            for r in export_ops.shard_manifest(
                docs, "doc_id", "text", N_SHARDS, seed="s"
            ).collect()
        }
        got = {r["shard"]: (r["n_docs"], r["n_tokens"], r["n_chars"]) for r in manifest}
        assert got == expect
        # and no document was lost or duplicated
        total = sum(v[0] for v in got.values())
        assert total == docs.count()


def test_bad_n_shards_rejected():
    with pytest.raises(ValueError):
        export_ops.shard_id(F.lit(1), 0)
