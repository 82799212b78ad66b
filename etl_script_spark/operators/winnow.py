"""Winnowing document fingerprints and n-gram novelty scoring.

Winnowing (Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the MOSS
algorithm) selects a guaranteed-density subset of a document's k-gram
hashes: in every window of ``w`` consecutive hashes, keep the
RIGHTMOST minimum. Any shared substring of length >= k + w - 1
between two documents is then guaranteed to share at least one
selected fingerprint — the local-fingerprinting property that makes
plagiarism/boilerplate detection robust to insertions and
reorderings, where a fixed stride would silently miss shifted copies.

Reference behavior: the reference pipeline fingerprints documents
with a single whole-text hash (credit-prepare-api normalization +
md5); winnowing is the standard corpus-scale refinement that
localizes the match, added as a first-class curation operator.

Scale shape: selection is POSITION-LOCAL — the rightmost-minimum rule
is equivalent to a run-length predicate over at most w - 1 neighbors
on each side (derivation in ``winnow_fingerprints``), so the whole
operator is array higher-order functions inside one scan-stage
projection: zero explode, zero shuffle, zero UDF. The per-document
cost is O(len * w^2) with w a small constant.

Novelty scoring joins each candidate document's distinct word n-grams
against a reference corpus's n-gram set and reports the unseen
fraction — the training-data freshness signal (a near-zero novelty
doc adds nothing the reference did not already contain). One distinct
aggregation per side plus one equi-join on the n-gram hash; the
fraction is exact integer arithmetic (ppm via DIV) so the DuckDB
oracle replays it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from etl_script_spark.operators.dedup import normalize_text
from etl_script_spark.operators.partitioning import fan_out as _fan_out


def _md5_int(c: Column) -> Column:
    """First 32 bits of md5 as a BIGINT — the engine-shared uniform
    (DuckDB twin: ('0x' || substr(md5(x), 1, 8))::BIGINT)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Per-document winnowing summary: (id, n_positions, n_fps,
    fp_sum) where n_positions is the number of character k-gram
    hash positions, n_fps the number of SELECTED fingerprints and
    fp_sum their exact integer sum (32-bit hash values summed into a
    BIGINT — an order-free checksum the oracle recomputes, so a
    single mis-selected position breaks the cross-engine hash).

    The textbook formulation ("for each window of w consecutive
    hashes pick the rightmost minimum, then dedupe across windows")
    is sequential; the distributed form used here is its local
    characterization: position i is selected iff

        L(i) + R(i) >= w - 1   and   i - L(i) + w - 1 <= n

    where L(i) is the length of the maximal run of left neighbors
    with hash >= h[i] (capped at w - 1), R(i) the run of right
    neighbors with hash STRICTLY > h[i] (the rightmost-tie rule),
    and n the number of positions (the second clause kills positions
    whose only candidate window would hang past the end of the
    document). Proof sketch: a window ending at j selects i iff
    j - w + 1 >= i - L(i) and j <= i + R(i); such a j exists iff the
    interval [i - L(i) + w - 1, min(n, i + R(i))] is non-empty.
    Runs are monotone, so the capped run length equals the count of
    d in 1..w-1 whose d nearest neighbors all clear the bound —
    an array_min over a length-d slice, giving pure HOFs.

    Documents shorter than k + w - 1 characters (n < w) select
    nothing and report n_fps = 0 — including empty documents, which
    keep their output row (cardinality contract).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if w < 2:
        raise ValueError(f"w must be >= 2, got {w}")
    from etl_script_spark.functions.exprs import let

    def hashes_of(norm: Column) -> Column:
        # build k-grams from a let-bound single-character array with
        # O(k) slice+join per position — per-position substring() is
        # O(position) (UTF8String rescans from the head to find the
        # codepoint boundary), which makes the transform O(len^2) per
        # document: the char_shingles lesson (848 -> 79 s at 200k
        # docs), same fix, identical md5 inputs so fingerprints are
        # unchanged
        def from_chars(chars: Column) -> Column:
            return F.when(
                F.size(chars) >= k,
                F.transform(
                    F.sequence(F.lit(1), F.size(chars) - k + 1),
                    lambda i: _md5_int(
                        F.concat(
                            *[
                                F.element_at(chars, i + F.lit(j))
                                for j in range(k)
                            ]
                        )
                    ),
                ),
            ).otherwise(F.array().cast("array<long>"))

        # filter the trailing "" split() keeps under limit=-1
        return let(
            F.filter(F.split(norm, ""), lambda x: x != ""), from_chars
        )

    def sel_of(h: Column) -> Column:
        n = F.size(h)

        def keep(i: Column) -> Column:
            hi = F.element_at(h, i)
            # Run lengths via the monotone neighbor chain: "all d
            # nearest neighbors clear the bound" holds iff it held
            # for d-1 AND the d-th neighbor clears it, so the capped
            # run length is a sum of w-1 chained boolean probes —
            # plain element_at comparisons. The first form
            # (array_min over a slice per probe) allocated two
            # arrays per probe per position; interpreted-HOF
            # allocation churn was the measured wall (r10 profile:
            # 32 RUNNABLE task threads all inside
            # Slice.nullSafeEval/ArrayDataIndexedSeq, jvm_cpu 7.7×
            # the single-task total at 32-way fan-out). Same
            # selected positions, zero per-probe allocation.
            def run(cmp) -> Column:
                conds = []
                cond = F.lit(True)
                for d in range(1, w):
                    cond = cond & F.coalesce(cmp(d), F.lit(False))
                    conds.append(cond.cast("int"))
                out = conds[0]
                for c in conds[1:]:
                    out = out + c
                return out

            lrun = run(
                lambda d: F.when(
                    i - d >= 1, F.element_at(h, i - d) >= hi
                )
            )
            rrun = run(
                lambda d: F.when(
                    i + d <= n, F.element_at(h, i + d) > hi
                )
            )
            return ((lrun + rrun) >= F.lit(w - 1)) & (
                (i - lrun + F.lit(w - 1)) <= n
            )

        return F.when(
            n >= w,
            F.filter(F.sequence(F.lit(1), n), keep),
        ).otherwise(F.array().cast("array<int>"))

    # the hash array and the selection are each let-BOUND: a plain
    # column alias is re-inlined into every consumer by
    # CollapseProject, so an unbound `hashes` referenced inside the
    # per-position lambda re-evaluates the WHOLE md5 transform per
    # element — O(len^2) per document (the shingles/let lesson; the
    # unbound first cut of this operator timed out the sf0.01 sweep)
    def out_cols(h: Column):
        def with_sel(sel: Column):
            return F.struct(
                F.size(h).alias("n_positions"),
                F.size(sel).alias("n_fps"),
                F.coalesce(
                    F.aggregate(
                        F.transform(sel, lambda i: F.element_at(h, i)),
                        F.lit(0).cast("long"),
                        lambda acc, x: acc + x,
                    ),
                    F.lit(0).cast("long"),
                ).alias("fp_sum"),
            )

        return let(sel_of(h), with_sel)

    # the hash+selection projection is O(len·w²) CPU per row over a
    # byte-tiny input: a single small parquet file scans as ONE split
    # (openCost packing), so without a fan-out the whole corpus
    # fingerprints on one core (measured 8.7 s wall ≈ 8.9 s jvm_cpu at
    # sf0.1). Round-robin spread of only the two needed columns; a
    # wide 100 TB scan passes through untouched (fan_out contract).
    packed = let(hashes_of(normalize_text(F.col(text_col))), out_cols)
    return _fan_out(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("id"), packed.alias("__p")
    ).select(
        "id",
        F.col("__p.n_positions").alias("n_positions"),
        F.col("__p.n_fps").alias("n_fps"),
        F.col("__p.fp_sum").alias("fp_sum"),
    )


def ngram_novelty(
    corpus: DataFrame,
    reference: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
) -> DataFrame:
    """Per-document novelty vs a reference corpus: the fraction (ppm,
    exact integer DIV) of the document's DISTINCT word n-grams that do
    NOT occur anywhere in ``reference``. The freshness dual of
    decontamination: decontam flags overlap with an eval suite,
    novelty scores non-overlap with what the model has already seen.

    Shape: distinct n-gram md5s per candidate doc (one aggregation),
    distinct n-gram md5s of the reference (one aggregation), one
    LEFT join on the 8-byte hash key (shuffle carries hashes, never
    gram text — the repetition_metrics lesson), one count aggregation.
    The reference side is corpus-derived, so the join is left UNHINTED
    and AQE downgrades it to broadcast when the measured reference
    n-gram set is small. Documents with fewer than n words have no
    n-grams and report n_grams = 0, novelty_ppm = 1000000 (nothing
    was previously seen — vacuous novelty, kept deterministic).

    Returns (id, n_grams, n_novel, novelty_ppm).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    def grams(d: DataFrame, with_id: bool) -> DataFrame:
        # LET-BIND the word array behind a projection boundary before
        # the window lambda references it — a raw normalize+split
        # subtree inside the transform re-normalizes the whole
        # document PER WINDOW in the interpreted HOF (the
        # containment_pairs r10 finding: 4x jvm_cpu on the explode;
        # grams bit-identical).
        ws_expr = F.filter(
            F.split(normalize_text(F.col(text_col)), " "), lambda x: x != ""
        )
        ws = F.col("__ws")
        arr = F.when(
            F.size(ws) >= n,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(ws) - n + 1),
                    lambda i: _md5_int(
                        F.array_join(F.slice(ws, i, n), " ")
                    ),
                )
            ),
        ).otherwise(F.array().cast("array<long>"))
        cols = [F.col(id_col).alias("id")] if with_id else []
        # md5-per-gram is CPU-dense over byte-tiny inputs (same
        # single-split pathology as winnow_fingerprints: measured
        # 5.0 s wall ≈ 5.0 s jvm_cpu at sf0.1) — spread the narrow
        # scan before the gram projection; wide scans pass through.
        keep = [*cols, ws_expr.alias("__ws")]
        return _fan_out(d.select(*keep)).select(
            *([F.col("id")] if with_id else []), F.explode(arr).alias("g")
        )

    doc_g = grams(corpus, True)
    ref_g = grams(reference, False).distinct().withColumn(
        "__seen", F.lit(1)
    )
    joined = doc_g.join(ref_g, "g", "left")
    per_doc = joined.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.when(F.col("__seen").isNull(), 1).otherwise(0)).alias(
            "n_novel"
        ),
    )
    ids = corpus.select(F.col(id_col).alias("id"))
    return ids.join(per_doc, "id", "left").select(
        "id",
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
        F.when(F.coalesce("n_grams", F.lit(0)) == 0, F.lit(1000000))
        .otherwise(
            F.expr("(n_novel * CAST(1000000 AS BIGINT)) DIV n_grams")
        )
        .alias("novelty_ppm"),
    )
