"""Deduplication operators.

Two families:

1. The reference's dedup semantics (SURVEY.md §2.7 D1-D3) —
   composite-key keep-first, ordered first-seen, multi-pass text dedup.
2. LLM-training-data near-dup detection at scale: exact (hash),
   MinHash+LSH, SimHash, n-gram Jaccard — the operators a 100 TB
   document corpus needs. All are shuffle-aware: candidate generation
   via band/bucket equi-joins (never an O(n²) cross join), verification
   only within buckets.

Hashing is deterministic (xxhash64/md5 with fixed seeds) so results
are stable across runs and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_script_spark.operators.merge import dedupe_first  # noqa: F401  (D1)


def dedupe_ordered(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """D2: unique by key preserving FIRST-seen order.

    Implemented as a ``min_by`` hash aggregate rather than a
    row_number window: the aggregate gets map-side partial combine
    (shuffle carries at most one row per key per mapper) and skips the
    per-key sort — the shape that survives 100 TB, and measurably
    faster at bench scale. Ties on order_col pick an arbitrary row,
    same as a non-unique window sort.

    Ref: dedupe_list_str pdf_ocr_rm_to_json.py:447-452.
    """
    from etl_script_spark.operators.merge import _keep_extreme

    return _keep_extreme(df, key_cols, order_col, last=False)


def normalize_text(c: Column) -> Column:
    """Shared text normalization for dedup: lowercase, collapse
    whitespace, strip."""
    return F.trim(F.regexp_replace(F.lower(c.cast("string")), r"\s+", " "))


def exact_dedup(
    df: DataFrame, text_col: str, id_col: str, normalize: bool = True
) -> DataFrame:
    """Exact dedup: group identical (normalized) text, keep the row
    with the smallest id. One shuffle on a 128-bit content hash —
    never on the raw text (at 100 TB the shuffle key must be tiny).

    Returns the surviving rows with ``dup_count``.
    """
    t = normalize_text(F.col(text_col)) if normalize else F.col(text_col)
    hashed = df.withColumn("__h", F.md5(t))
    w = Window.partitionBy("__h").orderBy(F.col(id_col).asc())
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .withColumn("dup_count", F.count(F.lit(1)).over(Window.partitionBy("__h")))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__h")
    )


def shingles(c: Column, n: int = 3) -> Column:
    """Word n-gram shingle set of a text column (array<string>,
    distinct). Built with sequence+transform — no UDF."""
    words = F.split(normalize_text(c), " ")
    k = F.size(words) - F.lit(n - 1)
    grams = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array(F.array_join(words, " ")))
    return F.array_distinct(grams)


def minhash_signature(shingle_col: Column, num_hashes: int = 64) -> Column:
    """MinHash signature: for seed s in 0..k-1, min over shingles of
    xxhash64(shingle, seed). array<bigint> length k. Deterministic,
    JVM-side, O(|shingles| * k) per row."""
    return F.array(
        *[
            F.array_min(
                F.transform(shingle_col, lambda x: F.xxhash64(x, F.lit(s)))
            )
            for s in range(num_hashes)
        ]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash+LSH near-duplicate candidate pairs.

    shingle → minhash signature → split into ``bands`` bands of
    ``num_hashes/bands`` rows → hash each band → equi-join on
    (band_idx, band_hash). The join is the ONLY shuffle and its key
    is a 64-bit hash — this is the scale path (no pairwise compare
    outside shared buckets).

    Returns distinct candidate pairs (id_a < id_b) with their
    estimated Jaccard (signature agreement ratio).
    """
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(shingles(F.col(text_col), shingle_n), num_hashes).alias("sig"),
    )
    banded = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.array_join(
                                F.transform(
                                    F.slice("sig", b * rows_per_band + 1, rows_per_band),
                                    lambda x: x.cast("string"),
                                ),
                                ",",
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    return pairs.select(
        "id_a", "id_b", (agree / F.lit(num_hashes)).alias("est_jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via shingle inverted index:
    explode shingles → self-join on shingle → count shared / union.

    Scale shape: the join key is a single shingle hash; hot shingles
    (stopword runs) should be pre-filtered by document frequency for
    a real corpus (AQE handles residual skew locally).
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), n)).alias("shingle"),
        F.size(shingles(F.col(text_col), n)).alias("n_sh"),
    ).withColumn("shingle", F.xxhash64("shingle"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard")
    return shared.select("id_a", "id_b", jac).filter(F.col("jaccard") >= threshold)


def simhash(c: Column, bits: int = 64) -> Column:
    """SimHash fingerprint of a text column (bigint).

    Per word w with hash h: for each bit position, +1 if set else -1;
    fingerprint bit = sign of the sum. Expressed with aggregate over
    the word array — no UDF. O(words * bits) per row, embarrassingly
    parallel.
    """
    words = F.split(normalize_text(c), " ")
    hashes = F.transform(words, lambda w: F.xxhash64(w))
    bit_cols = []
    for i in range(bits):
        votes = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(
                h.bitwiseAND(F.shiftleft(F.lit(1).cast("long"), i)) != 0, 1
            ).otherwise(-1),
        )
        bit_cols.append(
            F.when(votes > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bit_cols[0]
    for bc in bit_cols[1:]:
        out = out.bitwiseOR(bc)
    return out


def simhash_near_dups(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3, bands: int = 4
) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit fingerprint into
    ``bands`` chunks (pigeonhole: hamming<=k pairs share at least one
    of k+1 bands), equi-join per band, verify exact hamming distance.
    """
    fp = df.select(F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("fp"))
    width = 64 // bands
    banded = fp.select(
        "id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("fp", i * width)
                        .bitwiseAND(F.lit((1 << width) - 1).cast("long"))
                        .alias("chunk"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "fp", "bb.band", "bb.chunk")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
