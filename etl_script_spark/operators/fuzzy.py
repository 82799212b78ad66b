"""Fuzzy (edit-distance) entity joins at scale — PassJoin-style
segment blocking.

The reference canonicalizes entity names with hand-written repair
rules (fuzzy column folding, OCR token repairs); what it never had is
the general "match this dirty name list against the clean master
within edit distance k" join. The naive form is a cross join with a
levenshtein predicate — O(n·m), dead at any scale. This operator uses
the segment pigeonhole (Li et al., PassJoin): split every CLEAN
string into k+1 contiguous segments; any string within edit distance
≤ k must contain at least one of those segments EXACTLY, shifted by
at most k positions. So:

- clean side emits k+1 (length, seg_idx, seg_text) keys per string;
- dirty side emits one probe substring per (candidate clean length ∈
  [len−k, len+k]) × (segment) × (shift ∈ [−k, k]) — a constant
  ≤ (2k+1)²·(k+1) probes per string (k=1 → 18, k=2 → 75);
- candidates meet on an EQUI-join of (length, seg_idx, substring) —
  a plain hash shuffle, never a theta join;
- an exact levenshtein(≤ k) verify within candidates removes the
  false positives, so recall is GUARANTEED by the pigeonhole and
  precision by the verify.

The same band-then-verify shape as the MinHash/SimHash family —
constant fan-out per row, equi-join candidates, exact check after.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_script_spark.operators.partitioning import fan_out


from etl_script_spark.operators.dedup import normalize_text


def normalize_name(c: Column) -> Column:
    """Join-key normalization — the shared corpus normalizer
    (lowercase, collapse whitespace, trim; dedup.normalize_text), so
    fuzzy-join keys can never drift from the dedup family's notion of
    equal text. (Deliberately NOT stripping punctuation — that
    changes edit distances; callers wanting punctuation-blind
    matching strip upstream on both sides.)"""
    return normalize_text(c)


def _seg_bounds(length: Column, i: Column, k: int) -> tuple[Column, Column]:
    """(start, len) of segment ``i`` of ``k+1`` even segments over a
    string of ``length`` chars — first ``length % (k+1)`` segments get
    the extra char. 0-based start."""
    parts = k + 1
    base = (length / parts).cast("int")
    rem = length % parts
    seg_len = F.when(i < rem, base + 1).otherwise(base)
    start = i * base + F.least(i, rem)
    return start, seg_len


def segment_keys(
    clean: DataFrame, name_col: str, id_col: str, k: int = 1
) -> DataFrame:
    """Clean-side blocking keys: (id, name, L, seg_idx, seg)."""
    base = clean.select(
        F.col(id_col).alias("c_id"),
        normalize_name(F.col(name_col)).alias("c_name"),
    ).withColumn("L", F.length("c_name"))
    seg_i = F.col("seg_idx")
    start, seg_len = _seg_bounds(F.col("L"), seg_i, k)
    return (
        base.select(
            "c_id",
            "c_name",
            "L",
            F.explode(F.sequence(F.lit(0), F.lit(k))).alias("seg_idx"),
        )
        .filter(F.col("L") >= k + 1)  # shorter strings can't be segmented
        .select(
            "c_id",
            "c_name",
            "L",
            "seg_idx",
            F.substring(F.col("c_name"), start + 1, seg_len).alias("seg"),
        )
    )


def probe_keys(
    dirty: DataFrame, name_col: str, id_col: str, k: int = 1
) -> DataFrame:
    """Dirty-side probes: for every candidate clean length and segment,
    the substring of the dirty string where that segment would sit
    (± k shift). Constant fan-out per row; invalid (out-of-range)
    probes are filtered before the join."""
    base = fan_out(
        dirty.select(
            F.col(id_col).alias("d_id"),
            normalize_name(F.col(name_col)).alias("d_name"),
        )
    ).withColumn("M", F.length("d_name"))
    combos = F.expr(
        f"""
        flatten(transform(
          sequence(greatest(M - {k}, {k + 1}), M + {k}),
          L -> flatten(transform(sequence(0, {k}),
            i -> transform(sequence(-{k}, {k}),
              d -> struct(L AS L, i AS seg_idx, d AS shift))))))
        """
    )
    ex = base.select(
        "d_id", "d_name", "M", F.explode(combos).alias("c")
    ).select(
        "d_id",
        "d_name",
        "M",
        F.col("c.L").alias("L"),
        F.col("c.seg_idx").alias("seg_idx"),
        F.col("c.shift").alias("shift"),
    )
    start, seg_len = _seg_bounds(F.col("L"), F.col("seg_idx"), k)
    pos = start + F.col("shift")
    return ex.filter((pos >= 0) & (pos + seg_len <= F.col("M"))).select(
        "d_id",
        "d_name",
        "L",
        "seg_idx",
        F.substring(F.col("d_name"), pos + 1, seg_len).alias("seg"),
    )


def fuzzy_join(
    dirty: DataFrame,
    clean: DataFrame,
    dirty_name: str,
    clean_name: str,
    dirty_id: str,
    clean_id: str,
    k: int = 1,
) -> DataFrame:
    """Edit-distance-≤k join: (d_id, d_name, c_id, c_name, dist).
    Pigeonhole-complete candidates via segment equi-join, exact
    levenshtein verify, distinct pairs. Every dirty row that has a
    clean match within k appears; precision is exact."""
    segs = segment_keys(clean, clean_name, clean_id, k)
    probes = probe_keys(dirty, dirty_name, dirty_id, k)
    cand = probes.join(segs, ["L", "seg_idx", "seg"]).select(
        "d_id", "d_name", "c_id", "c_name"
    )
    # clean strings shorter than k+1 chars cannot be segmented — the
    # pigeonhole path drops them, so they take a bounded cross join
    # instead: any dirty string within distance k of a (< k+1)-char
    # clean string has length ≤ 2k, so both sides of the cross are
    # tiny length-filtered subsets (strings that short are rare; the
    # cross is O(|short_clean| · |short_dirty|), both ≪ corpus)
    short_clean = (
        clean.select(
            F.col(clean_id).alias("c_id"),
            normalize_name(F.col(clean_name)).alias("c_name"),
        )
        .filter(F.length("c_name") < k + 1)
    )
    short_dirty = (
        dirty.select(
            F.col(dirty_id).alias("d_id"),
            normalize_name(F.col(dirty_name)).alias("d_name"),
        )
        .filter(F.length("d_name") <= 2 * k)
    )
    short_cand = short_dirty.crossJoin(F.broadcast(short_clean))
    # length-band prefilter BEFORE the distinct shuffle and the exact
    # verify: |len(a)-len(b)| > k already implies dist > k (each edit
    # changes length by at most 1), so this is lossless — and it is
    # the dominant candidate killer (segment collisions between very
    # different-length strings never survive it)
    band = F.abs(F.length("d_name") - F.length("c_name")) <= k
    all_cand = (
        cand.unionByName(short_cand.select("d_id", "d_name", "c_id", "c_name"))
        .filter(band)
        .distinct()
    )
    # thresholded levenshtein: Spark's banded O(k·n) algorithm bails
    # out at k+1 and returns -1, instead of filling the full O(n·m)
    # DP matrix only to discard the row
    dist = F.levenshtein(F.col("d_name"), F.col("c_name"), k)
    return all_cand.withColumn("dist", dist).filter(
        (F.col("dist") >= 0) & (F.col("dist") <= k)
    )
