"""PassJoin fuzzy join: pigeonhole recall under substitution,
insertion and deletion; exact precision; degenerate inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_script_spark.operators import fuzzy


def _clean(spark):
    return spark.createDataFrame(
        [(1, "acme trading"), (2, "globex corp"), (3, "initech")],
        ["id", "name"],
    )


def _match_pairs(spark, dirty_rows, k=1):
    dirty = spark.createDataFrame(dirty_rows, ["id", "name"])
    out = fuzzy.fuzzy_join(
        dirty, _clean(spark), "name", "name", "id", "id", k=k
    )
    return {(r["d_id"], r["c_id"], r["dist"]) for r in out.collect()}


def test_substitution_insertion_deletion_all_found(spark):
    pairs = _match_pairs(
        spark,
        [
            (10, "acme trafing"),   # substitution mid-string
            (11, "xglobex corp"),   # insertion at position 0 (shifts all)
            (12, "intech"),         # deletion
            (13, "zcme trading"),   # substitution at position 0
        ],
    )
    assert (10, 1, 1) in pairs
    assert (11, 2, 1) in pairs
    assert (12, 3, 1) in pairs
    assert (13, 1, 1) in pairs


def test_precision_beyond_k_excluded(spark):
    pairs = _match_pairs(spark, [(20, "acme trending"), (21, "unrelated co")])
    # 'acme trending' is distance 2 from 'acme trading' -> absent at k=1
    assert not {p for p in pairs if p[0] in (20, 21)}
    # ...but present at k=2
    pairs2 = _match_pairs(spark, [(20, "acme trending")], k=2)
    assert (20, 1, 2) in pairs2


def test_exact_match_distance_zero_and_case_fold(spark):
    pairs = _match_pairs(spark, [(30, "ACME   Trading")])
    assert (30, 1, 0) in pairs


def test_matches_naive_join_on_random_corruptions(spark):
    clean = spark.range(200).select(
        F.col("id").alias("id"),
        F.format_string("company%03d inc", (F.col("id") % 200).cast("int")).alias("name"),
    )
    # corrupt one deterministic position per name
    pos = (F.col("id") % 8) + 3
    dirty = clean.select(
        (F.col("id") + 1000).alias("id"),
        F.concat(
            F.substring(F.col("name"), F.lit(1), pos - 1),
            F.lit("#"),
            F.substring(F.col("name"), pos + 1, F.lit(100)),
        ).alias("name"),
    )
    blocked = fuzzy.fuzzy_join(dirty, clean, "name", "name", "id", "id", k=1)
    naive = (
        dirty.select(F.col("id").alias("d_id"), fuzzy.normalize_name(F.col("name")).alias("dn"))
        .crossJoin(
            clean.select(F.col("id").alias("c_id"), fuzzy.normalize_name(F.col("name")).alias("cn"))
        )
        .filter(F.levenshtein("dn", "cn") <= 1)
        .select("d_id", "c_id")
    )
    b = {(r["d_id"], r["c_id"]) for r in blocked.select("d_id", "c_id").collect()}
    n = {(r["d_id"], r["c_id"]) for r in naive.collect()}
    assert b == n and len(b) >= 200


def test_band_prefilter_threshold_keep_match_set_length_edits(spark):
    """k=2 with LENGTH-CHANGING edits (insert / delete / mixed): the
    length-band prefilter and the thresholded (-1-bailout) levenshtein
    must return exactly the naive unthresholded cross-join's match
    set — the prefilter is lossless because each edit moves length by
    at most 1."""
    clean = spark.range(150).select(
        F.col("id").alias("id"),
        F.format_string("vendor%04d supply co", F.col("id")).alias("name"),
    )
    name = F.col("name")
    dirty = clean.select(
        (F.col("id") + 5000).alias("id"),
        F.when(F.col("id") % 3 == 0,
               # delete 2 chars -> length -2
               F.concat(F.substring(name, 1, 4), F.substring(name, 7, 100)))
        .when(F.col("id") % 3 == 1,
              # insert 2 chars -> length +2
              F.concat(F.substring(name, 1, 6), F.lit("xx"),
                       F.substring(name, 7, 100)))
        .otherwise(
            # substitute 1 + insert 1 -> length +1
            F.concat(F.substring(name, 1, 2), F.lit("#"),
                     F.substring(name, 4, 100), F.lit("z")))
        .alias("name"),
    )
    blocked = fuzzy.fuzzy_join(dirty, clean, "name", "name", "id", "id", k=2)
    naive = (
        dirty.select(F.col("id").alias("d_id"),
                     fuzzy.normalize_name(F.col("name")).alias("dn"))
        .crossJoin(clean.select(F.col("id").alias("c_id"),
                                fuzzy.normalize_name(F.col("name")).alias("cn")))
        .filter(F.levenshtein("dn", "cn") <= 2)
        .select("d_id", "c_id")
    )
    b = {(r["d_id"], r["c_id"]) for r in blocked.select("d_id", "c_id").collect()}
    n = {(r["d_id"], r["c_id"]) for r in naive.collect()}
    assert b == n and len(b) >= 150


def test_short_clean_strings_still_match(spark):
    # clean names shorter than k+1 chars can't be segmented — the
    # bounded short-string path must still find them
    clean = spark.createDataFrame([(1, "x"), (2, "ab")], ["id", "name"])
    dirty = spark.createDataFrame(
        [(10, "x"), (11, "y"), (12, "a")], ["id", "name"]
    )
    out = {
        (r["d_id"], r["c_id"], r["dist"])
        for r in fuzzy.fuzzy_join(dirty, clean, "name", "name", "id", "id", 1).collect()
    }
    assert (10, 1, 0) in out   # exact 1-char match
    assert (11, 1, 1) in out   # substitution on a 1-char clean
    # 'a' vs 'x': one substitution; 'a' vs 'ab': one deletion
    assert (12, 1, 1) in out and (12, 2, 1) in out
