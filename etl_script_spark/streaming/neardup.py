"""Streaming near-duplicate ingest gate.

The crawl-firehose shape of ``dedup.dedup_incremental_ingest``: new
documents arrive as micro-batches and each batch is admitted against
a growing FINGERPRINT STORE of everything already accepted — the
store is fingerprints only (8–16 bytes/doc), never text, so the gate
scales to a 100 TB-ingested corpus with a store that fits the same
order as a dedup index. Per micro-batch:

1. within-batch exact dedup (keep min id per fingerprint),
2. anti-match the batch against the store (mode-dependent, below),
3. survivors' fingerprints are unioned into the store
   (localCheckpoint bounds the lineage chain across epochs — same
   discipline as the streaming CDC apply).

Modes:

- ``exact``: fingerprint = md5 of normalized text; match is hash
  equality (one anti-join per batch). This mode is fully
  SQL-expressible, so the catalog entry's DuckDB oracle replays the
  whole epoch chain as unrolled CTEs — the green row proves the
  cross-epoch store chaining, which is the part streaming adds.
- ``simhash``: fingerprint = 64-bit SimHash; match is "any store
  fingerprint within hamming <= k", found via the same
  pigeonhole-band equi-join as ``dedup.simhash_near_dups`` (a
  hamming<=k pair shares at least one of k+1 bands) and verified
  with bit_count(xor). xxhash64 bit votes are not SQL-expressible,
  so this mode's recall is covered by planted-near-dup pytest
  properties instead of the oracle (house rule, same as
  dedup_simhash).

Batch granularity caveat (deliberate): within one micro-batch only
EXACT duplicates collapse; two near-but-not-identical documents in
the same batch both survive (and both enter the store). A crawl gate
that must near-dedup within the epoch runs the batch variant
(``simhash_near_dups``) on the epoch first; chaining the two is a
composition, not a new operator.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_script_spark.operators.dedup import simhash_fingerprints
from etl_script_spark.operators.textstats import normalize_text

__all__ = ["write_epoch_feed", "stream_neardup_gate"]


def write_epoch_feed(batches: list[DataFrame], prefix: str = "ndg_feed") -> str:
    """Write each batch as one parquet directory with strictly
    increasing mtimes so FileStreamSource (which orders by
    modification time) delivers them as ordered micro-batches under
    maxFilesPerTrigger=1. Returns the feed directory."""
    feed_dir = tempfile.mkdtemp(prefix=f"{prefix}_{uuid.uuid4().hex[:6]}_")
    for i, b in enumerate(batches):
        path = os.path.join(feed_dir, f"epoch_{i + 1}")
        b.coalesce(1).write.mode("overwrite").parquet(path)
        for root, _dirs, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (1_000_000 + i, 1_000_000 + i))
    return feed_dir


def _exact_fp(text_col: str) -> F.Column:
    return F.md5(normalize_text(F.col(text_col)))


def _simhash_bands(fp_df: DataFrame, bands: int) -> DataFrame:
    width = 64 // bands
    mask = (1 << width) - 1
    return fp_df.select(
        "id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("fp", i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bv"),
    ).select("id", "fp", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))


def stream_neardup_gate(
    spark: SparkSession,
    feed_dir: str,
    schema: str,
    store_init: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "exact",
    max_hamming: int = 3,
    bands: int = 4,
    timeout: int = 300,
) -> DataFrame:
    """Run the gate over an epoch feed (see ``write_epoch_feed``) with
    AvailableNow, and return every ADMITTED document as
    (id_col, fp) — exact mode fp is the md5 hex string, simhash mode
    fp is the 64-bit fingerprint. ``store_init`` holds the
    already-ingested corpus as (id_col, text_col) rows; only its
    fingerprints are kept."""
    if mode not in ("exact", "simhash"):
        raise ValueError(f"mode must be 'exact' or 'simhash', got {mode!r}")
    if mode == "simhash" and bands < max_hamming + 1:
        raise ValueError(
            f"bands={bands} < max_hamming+1={max_hamming + 1}: pigeonhole "
            "recall guarantee would silently fail"
        )

    def fingerprint(df: DataFrame) -> DataFrame:
        if mode == "exact":
            return df.select(
                F.col(id_col).alias("id"), _exact_fp(text_col).alias("fp")
            )
        return simhash_fingerprints(df, id_col, text_col)

    # store state: fingerprints only, re-homed per epoch
    state: list[DataFrame] = [
        fingerprint(store_init).select("fp").distinct().localCheckpoint()
    ]
    admitted: list[DataFrame] = []

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        fps = fingerprint(batch_df)
        w = Window.partitionBy("fp").orderBy("id")
        first = (
            fps.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        if mode == "exact":
            fresh = first.join(state[0], "fp", "left_anti")
        else:
            bb = _simhash_bands(first, bands)
            sb = _simhash_bands(
                state[0].select(F.lit(-1).alias("id"), "fp"), bands
            )
            hits = (
                bb.hint("shuffle_hash")
                .join(
                    sb.select("band", "val", F.col("fp").alias("sfp")),
                    ["band", "val"],
                )
                .filter(
                    F.bit_count(F.col("fp").bitwiseXOR(F.col("sfp")))
                    <= max_hamming
                )
                .select("id")
                .distinct()
            )
            fresh = first.join(hits, "id", "left_anti")
        fresh = fresh.localCheckpoint()
        admitted.append(fresh)
        state[0] = (
            state[0].unionByName(fresh.select("fp")).distinct().localCheckpoint()
        )

    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(feed_dir)
    )
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_ndg_{uuid.uuid4().hex[:6]}_")
    q = (
        sdf.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(
            f"stream_neardup_gate: stream did not finish in {timeout}s"
        )
    if not admitted:
        # the fallback schema must agree with the non-empty case:
        # exact mode carries fp as the md5 hex STRING, simhash mode as
        # the 64-bit BIGINT fingerprint
        fp_type = "string" if mode == "exact" else "bigint"
        return spark.createDataFrame([], f"id long, fp {fp_type}").select(
            F.col("id").alias(id_col), "fp"
        )
    out = admitted[0]
    for a in admitted[1:]:
        out = out.unionByName(a)
    return out.select(F.col("id").alias(id_col), "fp")
