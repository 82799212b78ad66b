"""Incremental ingest (SURVEY.md §2.10): file-source streams with
``Trigger.AvailableNow`` — the Spark-native form of the reference's
"rerun the importer per monthly file drop" loop
(credit-prepare-api/main.py:106-143), with checkpointed exactly-once
progress instead of re-reading everything.

The events parquet stores TIMESTAMP(NANOS) which Spark's reader maps
to bigint under ``spark.sql.legacy.parquet.nanosAsLong`` — the stream
reader rebuilds a microsecond TIMESTAMP_NTZ identically to the batch
path (plans/catalog.py ``t()``), so batch and stream plans agree.
"""

from __future__ import annotations

import contextlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def adaptive_state_partitions(
    spark: SparkSession,
    sf_dir: str,
    filename: str = "events.parquet",
    target_bytes: int = 512 * 1024,
) -> int:
    """Size-derived state-partition count for a stateful streaming
    query over a known file source: ~1 partition per ``target_bytes``
    of input, clamped to [2, defaultParallelism].

    Why derive instead of inheriting the session's shuffle.partitions:
    every state partition is a live state store — a stream-stream
    join keeps FOUR per partition, each paying snapshot/delta/commit
    file I/O per micro-batch, so the per-batch floor scales with the
    partition count regardless of data volume (r10 measure,
    st_stream_stream_join at a 2 MB fixture: 32 partitions = 7.9 s
    wall / 73 jvm-CPU-s, 4 partitions = 2.6 s / 6.7 — the state
    machinery was 10× the actual join work). A byte-tiny drain gets
    a handful of stores; a 100 TB/day stream hits the
    defaultParallelism clamp, i.e. full cluster width. The clamp
    floor of 2 keeps the keyed-exchange path exercised (1 would
    degenerate every test stream to a single store)."""
    try:
        size = os.path.getsize(os.path.join(sf_dir, filename))
    except OSError:
        return spark.sparkContext.defaultParallelism
    want = max(2, (size + target_bytes - 1) // target_bytes)
    return int(min(want, spark.sparkContext.defaultParallelism))


@contextlib.contextmanager
def _shuffle_partitions(spark: SparkSession, n: int | None):
    """Temporarily pin spark.sql.shuffle.partitions while a streaming
    query STARTS (the value is captured into the query's checkpoint at
    start and stays fixed for its lifetime); restores on exit. The
    driver is single-threaded through these catalog entries, so the
    transient session-conf change cannot race another build."""
    if n is None:
        yield
        return
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(int(n)))
    try:
        yield
    finally:
        spark.conf.set(key, old)

def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming source over the events parquet. FileStreamSource
    requires a DIRECTORY — the sf dir is the base path, filtered to
    the events file; in production this is the drop directory new
    monthly files land in.

    The stream schema is taken from a batch footer read, so the source
    adapts to the generator's timestamp physical type: TIMESTAMP(NANOS)
    arrives as int64 (legacy nanosAsLong) and is rebuilt to micros;
    TIMESTAMP(MICROS) arrives as timestamp_ntz and is cast directly."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # TIMESTAMP (ltz), not NTZ: Spark's watermark/event-time ops only
    # accept TIMESTAMP. Session tz is pinned UTC so values agree with
    # the batch path's NTZ rebuild; outputs cast back to NTZ.
    if dict(batch.dtypes).get("ts") == "bigint":  # nanos-as-long file
        return raw.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000,"
                " TIMESTAMP '1970-01-01 00:00:00')"
            ),
        )
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def run_available_now(
    sdf: DataFrame,
    query_name: str,
    output_mode: str = "append",
    checkpoint_dir: str | None = None,
    timeout_s: int = 300,
    state_partitions: int | None = None,
) -> DataFrame:
    """Execute a streaming plan over all currently-available input
    (Trigger.AvailableNow), land it in an in-memory table, and return
    that table as a batch DataFrame. This is the test/oracle bridge:
    the driver's correctness gate gets a plain DataFrame out of a REAL
    streaming execution (stateful operators, watermarks and all).

    ``state_partitions`` pins spark.sql.shuffle.partitions for the
    query's lifetime (captured at start into the checkpoint): stateful
    streaming ops get one state store per shuffle partition and AQE
    does NOT coalesce streaming exchanges, so the session default
    (sized for batch) over-provisions stores whose per-micro-batch
    snapshot/commit I/O dominates small drains. Callers derive it from
    input size (adaptive_state_partitions)."""
    import uuid

    spark = sdf.sparkSession
    # unique per invocation: a repeated call (the driver may run the
    # same declared query twice in one session) must not collide with
    # the previous run's memory table or checkpoint
    unique = f"{query_name}_{uuid.uuid4().hex[:8]}"
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix=f"ckpt_{unique}_")
    with _shuffle_partitions(spark, state_partitions):
        q = (
            sdf.writeStream.format("memory")
            .queryName(unique)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
    # awaitTermination(timeout) returns False on timeout (and raises on
    # query failure): returning the memory table mid-write would hand
    # the oracle a silently PARTIAL result
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"{query_name}: AvailableNow stream did not drain within "
            f"{timeout_s}s; refusing to return a partial table"
        )
    return spark.table(unique)


def foreach_batch_insert_dedup(
    target_accumulator: list[DataFrame], keys: list[str]
):
    """foreachBatch sink implementing J7 (insert-only, duplicate-key
    skip) against an accumulated target — each micro-batch anti-joins
    the union of everything already accepted. In production the
    accumulator is a table (Delta MERGE or partition rewrite); the
    in-memory list keeps the unit test hermetic."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.dropDuplicates(keys)
        if target_accumulator:
            current = target_accumulator[0]
            batch = batch.join(current, keys, "left_anti")
            target_accumulator[0] = current.unionByName(batch).localCheckpoint()
        else:
            target_accumulator.append(batch.localCheckpoint())

    return _sink
