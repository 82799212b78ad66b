"""Sharded training-data export: the final pipeline stage.

After curation (dedup → filter → sample → pack), training consumers
read the corpus as N equal-ish shards — the unit of data-loader
parallelism and of resumable downloads. The reference pipeline stops
at per-table sinks (writers.py); this adds the dataset-level export:

- **Deterministic shard assignment**: shard = md5(seed ‖ key) mod N,
  a pure per-row expression. No global sort, no sampling pass, stable
  across runs / cluster sizes / engines (the DuckDB oracle computes
  the identical md5), so shard membership is reproducible — re-running
  an export never moves a document between shards, which is what makes
  incremental re-export and per-shard retries safe.
- **One file per shard**: the write repartitions on the shard id so
  every shard's rows land in exactly one task, then partitions the
  output directory by shard. At 100 TB, bump ``n_shards`` until a
  shard fits a task (the manifest's per-shard byte counts are the
  feedback loop); the repartition is the only shuffle in the export.
- **Write-audit manifest**: the returned manifest is aggregated from
  the files READ BACK after the write, not from the input plan — a
  lost or truncated shard shows up as a row-count/token-count
  mismatch against the pre-write expectation (the audit half of the
  write-audit-publish pattern in ``sources.writers``).

Hash balance: shards are multinomial(n, 1/N); the relative spread of
shard sizes is ~sqrt(N/n), negligible whenever n ≫ N (a 1 B-doc
export into 1024 shards varies ±0.1%). The manifest's n_docs column
is the check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_script_spark.operators.textstats import token_count_ws


def shard_id(key: Column, n_shards: int, seed: str = "") -> Column:
    """Deterministic shard id in [0, n_shards): first 8 hex chars of
    md5(seed ‖ key) parsed as an integer, mod n_shards. Cross-engine:
    DuckDB twin is ``('0x' || substr(md5(seed || key), 1, 8))::BIGINT
    % n``. Pure projection — evaluated inside the scan stage."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = F.substring(F.md5(F.concat(F.lit(seed), key.cast("string"))), 1, 8)
    return (F.conv(h, 16, 10).cast("long") % n_shards).alias("shard")


def shard_manifest(
    df: DataFrame,
    key_col: str,
    text_col: str,
    n_shards: int,
    seed: str = "",
) -> DataFrame:
    """Per-shard manifest (shard, n_docs, n_tokens, n_chars) for the
    deterministic assignment — one aggregation over N groups."""
    return (
        df.select(
            shard_id(F.col(key_col), n_shards, seed).alias("shard"),
            token_count_ws(F.col(text_col)).alias("_tok"),
            F.length(F.col(text_col)).alias("_chr"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_tok").alias("n_tokens"),
            F.sum("_chr").alias("n_chars"),
        )
    )


def write_train_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    text_col: str,
    n_shards: int,
    seed: str = "",
) -> DataFrame:
    """Export ``df`` as ``path/shard=K/`` parquet, one file per shard,
    and return the post-write audit manifest aggregated from the files
    read back. ``repartition(n_shards, shard)`` puts each shard wholly
    in one task (hash collisions only mean a task writes two shard
    dirs — still one file per shard); the manifest re-scan is the
    audit that every row survived the write."""
    spark = df.sparkSession
    assigned = df.withColumn(
        "shard", shard_id(F.col(key_col), n_shards, seed)
    )
    (
        assigned.repartition(n_shards, F.col("shard"))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    written = spark.read.parquet(path)
    # partition-dir discovery types `shard` as int; restore the long
    # the assignment expression produced so audit == pre-write schema
    return (
        written.select(
            F.col("shard").cast("long").alias("shard"),
            token_count_ws(F.col(text_col)).alias("_tok"),
            F.length(F.col(text_col)).alias("_chr"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_tok").alias("n_tokens"),
            F.sum("_chr").alias("n_chars"),
        )
    )
