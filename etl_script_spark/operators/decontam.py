"""Benchmark decontamination: flag training documents that share long
word n-grams with an evaluation set.

The standard pretraining hygiene step (GPT-3 appendix C / PaLM /
Llama use 8-13-gram overlap): any training document containing a
verbatim n-gram from a benchmark is contaminated and must be dropped
or audited before the eval numbers mean anything.

Shape at scale: the benchmark side is TINY (eval suites are a few
thousand documents) and the corpus is the 100 TB side — so the
benchmark's distinct n-grams are broadcast and the corpus is never
shuffled at all: explode corpus n-grams, hash-join against the
broadcast set, re-aggregate per doc_id with map-side combine. The
join key is a 64-bit xxhash of the n-gram (shuffle/broadcast width
is 8 bytes per gram, never the text), with string equality
re-checked after the hash match so a hash collision can never flag a
clean document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_script_spark.operators.dedup import shingles


def contamination_report(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
) -> DataFrame:
    """Per-document contamination counts against a benchmark corpus.

    Returns one row per CONTAMINATED corpus document: (id_col,
    n_overlap = distinct benchmark n-grams found in the document).
    Clean documents produce no row — at 100 TB the output is the
    audit list, not a full-corpus annotation (left-join the result
    back if a per-row flag is needed; that variant costs nothing
    extra since the corpus never shuffles either way).

    ``n`` is the gram length in WORDS; 8 is the conservative end of
    the published 8-13 range. Documents shorter than ``n`` words
    cannot be flagged (their single degenerate shingle is the whole
    text, which only matches if the benchmark contains the identical
    short text — the correct semantics).
    """
    from etl_script_spark.operators.dedup import _fan_out

    bench_grams = (
        bench.select(F.explode(shingles(F.col(text_col), n)).alias("gram"))
        .distinct()
        .select(F.xxhash64("gram").alias("gh"), "gram")
    )
    # _fan_out: a narrow corpus input (one small parquet file = one
    # partition) would run the whole shingle+explode single-threaded
    corpus_grams = _fan_out(corpus.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), n)).alias("gram"),
    )
    hits = corpus_grams.join(
        F.broadcast(bench_grams).withColumnRenamed("gram", "bgram"),
        on=[
            F.xxhash64(corpus_grams["gram"]) == F.col("gh"),
            # collision guard: the hash narrows, the string decides
            corpus_grams["gram"] == F.col("bgram"),
        ],
        how="inner",
    )
    return hits.groupBy(id_col).agg(
        F.count_distinct("gram").alias("n_overlap")
    )


def contamination_report_bloom(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    m_bits: int = 1 << 17,
) -> DataFrame:
    """Two-phase contamination report for benchmark suites too large
    to broadcast as an exact gram set: (1) a Bloom filter over the
    benchmark grams (fixed ``m_bits`` bits regardless of suite size)
    prunes the corpus gram stream executor-side — no shuffle, no
    broadcast of the exact set; (2) ONLY the pruned survivors join the
    benchmark grams exactly, so the expensive equi-join sees a stream
    already reduced by the Bloom's true-negative rate.

    EXACT output: Bloom filters have no false negatives, and phase 2
    re-verifies every survivor by hash AND string — identical rows to
    ``contamination_report`` at any m_bits (an undersized filter only
    costs phase-2 volume, never correctness), which is what the SQL
    oracle replays. Size m_bits ~ 10x the distinct benchmark gram
    count for a ~1% false-positive rate."""
    from etl_script_spark.operators.dedup import _fan_out
    from etl_script_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain_col,
    )

    bench_grams = (
        bench.select(F.explode(shingles(F.col(text_col), n)).alias("gram"))
        .distinct()
        .select(F.xxhash64("gram").alias("gh"), "gram")
    )
    bitmap = bloom_build(bench_grams.select("gram"), "gram", m_bits)
    corpus_grams = _fan_out(
        corpus.select(F.col(id_col), F.col(text_col))
    ).select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), n)).alias("gram"),
    )
    # the bitmap rides a one-row BROADCAST frame, not a plan literal:
    # a suite-sized filter (2^20+ bits) as a literal array re-enters
    # every task's codegen; as a broadcast it ships once per executor
    spark = corpus.sparkSession
    bm = F.broadcast(
        spark.createDataFrame([(bitmap,)], "bm array<long>")
    )
    survivors = (
        corpus_grams.crossJoin(bm)
        .filter(bloom_might_contain_col(F.col("gram"), F.col("bm"), m_bits))
        .drop("bm")
    )
    # phase 2 must NOT broadcast the exact benchmark gram set — the
    # premise of this variant is that it does not fit; both sides are
    # corpus/suite-derived aggregates whose size estimates the planner
    # cannot trust (the tfidf broadcast-abort lesson), so pin a
    # spillable sort-merge join on the 64-bit gram hash.
    hits = survivors.withColumn("__gh", F.xxhash64("gram")).hint("merge").join(
        bench_grams.withColumnRenamed("gram", "bgram"),
        on=[
            F.col("__gh") == F.col("gh"),
            # collision guard: the hash narrows, the string decides
            F.col("gram") == F.col("bgram"),
        ],
        how="inner",
    )
    return hits.groupBy(id_col).agg(
        F.count_distinct("gram").alias("n_overlap")
    )
