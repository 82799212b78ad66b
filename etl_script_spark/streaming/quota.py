"""Streaming per-source token-quota gate.

An ingest pipeline mixing many sources needs per-source budget
enforcement AT INGEST TIME: once a source has contributed its token
quota to the training mix, further documents from it are rejected —
without stopping the stream (other sources keep flowing) and without
a full-corpus recount per batch. The batch analogue is
``textstats.token_budget_select``; this is the streaming form, with
the consumed-token counter as the only carried state (one row per
source — bytes of state per source, unbounded stream).

Admission contract (deterministic, engine-replayable): within every
micro-batch, a source's documents are considered in ascending id
order; a document is admitted iff the source's cumulative token count
THROUGH THIS DOCUMENT (state + in-batch running sum, the document's
own tokens included) stays <= quota. Cumulative sums are monotone, so
admission per source is a PREFIX of the ordered stream — once one
document overflows, everything later from that source is rejected,
which makes the whole multi-epoch run replayable as one window
cumsum over (epoch, id) per source: exactly the SQL any engine can
run, and the driver oracle does.

Shape: per batch, one window cumsum partitioned by source (the same
shuffle any per-source aggregation pays) + a broadcast-sized join
against the per-source state table; state updates are one aggregation
of the admitted rows. foreachBatch + AvailableNow, same harness as
``streaming.neardup``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_script_spark.operators.textstats import words
from etl_script_spark.streaming.neardup import write_epoch_feed  # noqa: F401


def stream_quota_gate(
    spark: SparkSession,
    feed_dir: str,
    schema: str,
    quota_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    timeout: int = 300,
) -> DataFrame:
    """Run the quota gate over an epoch feed with AvailableNow and
    return every ADMITTED document as (id_col, source_col, n_tok,
    cum_tok) where cum_tok is the source's cumulative token count
    through this document — the audit column an oracle recomputes.

    ``quota_tokens`` applies independently to every source value.
    """
    import tempfile
    import uuid

    if quota_tokens < 1:
        raise ValueError(f"quota_tokens must be >= 1, got {quota_tokens}")

    # state: (source, used) — one row per source, tiny by construction
    state: list[DataFrame] = [
        spark.createDataFrame([], "source string, used long").localCheckpoint()
    ]
    admitted: list[DataFrame] = []

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        toks = batch_df.select(
            F.col(id_col).alias("id"),
            F.col(source_col).alias("source"),
            F.size(
                F.filter(words(F.col(text_col)), lambda w: w != "")
            ).cast("long").alias("n_tok"),
        )
        w = (
            Window.partitionBy("source")
            .orderBy("id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = toks.withColumn("__cum_batch", F.sum("n_tok").over(w))
        joined = cum.join(F.broadcast(state[0]), "source", "left").withColumn(
            "cum_tok",
            F.coalesce(F.col("used"), F.lit(0)) + F.col("__cum_batch"),
        )
        fresh = (
            joined.filter(F.col("cum_tok") <= quota_tokens)
            .select("id", "source", "n_tok", "cum_tok")
            .localCheckpoint()
        )
        admitted.append(fresh)
        # state advances by EVERY token seen (admitted or not): the
        # admission predicate is then exactly "global cumsum through
        # this doc <= quota", which one window cumsum over the whole
        # feed replays — advancing only by admitted tokens would
        # re-open the budget after an overflow and break the prefix
        # contract (and the oracle)
        delta = joined.groupBy("source").agg(
            F.max("cum_tok").alias("__new")
        )
        state[0] = (
            state[0]
            .join(delta, "source", "full_outer")
            .select(
                "source",
                F.greatest(
                    F.coalesce(F.col("used"), F.lit(0)),
                    F.coalesce(F.col("__new"), F.lit(0)),
                ).alias("used"),
            )
            .localCheckpoint()
        )

    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(feed_dir)
    )
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_qg_{uuid.uuid4().hex[:6]}_")
    q = (
        sdf.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(
            f"stream_quota_gate: stream did not finish in {timeout}s"
        )
    if not admitted:
        return spark.createDataFrame(
            [], "id long, source string, n_tok long, cum_tok long"
        ).select(F.col("id").alias(id_col), "source", "n_tok", "cum_tok")
    out = admitted[0]
    for a in admitted[1:]:
        out = out.unionByName(a)
    return out.select(
        F.col("id").alias(id_col), "source", "n_tok", "cum_tok"
    )
