"""Corpus distribution diagnostics: two-sample KS, PSI drift terms,
Zipf rank-frequency slope (operators/corpusstats.py), plus the
exact-size per-stratum sampler and the decoder-free binary near-dup."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_script_spark.operators import corpusstats as cs
from etl_script_spark.operators import multimodal
from etl_script_spark.operators import textstats as ts


# ---------------------------------------------------------------------------
# ks_two_sample
# ---------------------------------------------------------------------------


def test_ks_identical_samples_is_zero(spark):
    d = spark.range(200).select(
        (F.col("id") % 17).alias("v"), (F.col("id") % 2 == 0).alias("a")
    )
    # both sides see the same value multiset (ids alternate sides
    # uniformly over the v cycle) -> per-value counts equal -> KS = 0
    row = cs.ks_two_sample(
        d.select("v", F.lit(True).alias("x")).union(
            d.select("v", F.lit(False).alias("x"))
        ),
        "v",
        F.col("x"),
    ).collect()[0]
    assert row.ks_ppb == 0 and int(row.ks_num) == 0
    assert row.n_a == 200 and row.n_b == 200


def test_ks_disjoint_supports_is_one(spark):
    d = spark.range(100).select(
        F.when(F.col("id") < 50, F.col("id"))
        .otherwise(F.col("id") + 1000)
        .alias("v"),
        (F.col("id") < 50).alias("a"),
    )
    row = cs.ks_two_sample(d, "v", F.col("a")).collect()[0]
    assert row.ks_ppb == 1_000_000_000  # max |CDF diff| = 1 exactly


def test_ks_matches_reference_and_partition_invariant(spark):
    # hand-computable case: A = {1,2,3,4}, B = {3,4,5,6}
    # merged support CDFs: at v=2 F_a=.5 F_b=0 -> diff .5 (max)
    rows = [(1, True), (2, True), (3, True), (4, True),
            (3, False), (4, False), (5, False), (6, False)]
    d = spark.createDataFrame(rows, "v int, a boolean")
    r1 = cs.ks_two_sample(d, "v", F.col("a")).collect()[0]
    assert (int(r1.ks_num), int(r1.ks_den)) == (8, 16)
    assert r1.ks_ppb == 500_000_000
    r2 = cs.ks_two_sample(d.repartition(7), "v", F.col("a")).collect()[0]
    assert (int(r2.ks_num), r2.ks_ppb) == (8, 500_000_000)


# ---------------------------------------------------------------------------
# psi_drift
# ---------------------------------------------------------------------------


def test_psi_identical_distribution_near_zero_and_nonnegative(spark):
    d = spark.range(1000).select(
        (F.col("id") % 5).alias("b"), (F.col("id") % 2 == 0).alias("a")
    )
    terms = cs.psi_drift(d, F.col("b"), F.col("a")).collect()
    assert len(terms) == 5
    # identical per-bucket shares -> every term rounds to 0 micro-units
    assert all(t.psi_term_micro == 0 for t in terms)


def test_psi_shifted_distribution_flags_and_smoothing_is_finite(spark):
    # side A lives in buckets 0-1, side B in buckets 8-9: maximal drift;
    # empty-on-one-side buckets must stay finite via +1 smoothing
    d = spark.range(400).select(
        F.when(F.col("id") % 2 == 0, F.col("id") % 2)
        .otherwise(8 + F.col("id") % 2)
        .alias("b"),
        (F.col("id") % 2 == 0).alias("a"),
    )
    terms = cs.psi_drift(d, F.col("b"), F.col("a")).collect()
    psi = sum(t.psi_term_micro for t in terms) / 1e6
    assert psi > 0.25  # the standard "major shift" threshold
    assert all(t.psi_term_micro >= 0 for t in terms)


# ---------------------------------------------------------------------------
# zipf_slope
# ---------------------------------------------------------------------------


def test_zipf_recovers_power_law_slope(spark):
    # exact power law: token w_r appears round(6000 / r) times,
    # r = 1..1200 -> OLS slope of ln f on ln r over ranks 10..1000
    # must sit near -1 (quantization + round(freq) wiggle only)
    rows = []
    for r in range(1, 1201):
        rows.append((f"w{r:05d}", round(6000 / r)))
    docs = spark.createDataFrame(rows, "tok string, n int").select(
        F.concat_ws(
            " ", F.array_repeat(F.col("tok"), F.col("n"))
        ).alias("text")
    )
    out = cs.zipf_slope(docs, "text", top_k=1000, min_rank=10).collect()[0]
    assert out.n_ranks == 991
    assert abs(out.slope_ppb / 1e9 + 1.0) < 0.05, out.slope_ppb
    # intercept in nano-ln units should approximate ln(6000)
    assert abs(out.intercept_ppb / 1e9 - math.log(6000)) < 0.2


def test_zipf_partition_invariant_and_validates(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = cs.zipf_slope(d, "text", top_k=200, min_rank=5).collect()[0]
    b = cs.zipf_slope(d.repartition(13), "text", top_k=200, min_rank=5).collect()[0]
    assert (a.slope_ppb, a.intercept_ppb, a.n_ranks) == (
        b.slope_ppb,
        b.intercept_ppb,
        b.n_ranks,
    )
    with pytest.raises(ValueError):
        cs.zipf_slope(d, "text", top_k=10, min_rank=10)


# ---------------------------------------------------------------------------
# stratified_exact_sample
# ---------------------------------------------------------------------------


def test_exact_per_stratum_counts_and_determinism(spark):
    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = ts.stratified_exact_sample(d, "doc_id", "source", 15)
    per = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    avail = {r["source"]: r["count"] for r in d.groupBy("source").count().collect()}
    for s, n in per.items():
        assert n == min(15, avail[s]), (s, n)
    assert set(per) == set(avail)  # no stratum dropped
    ids1 = {r.doc_id for r in out.select("doc_id").collect()}
    ids2 = {
        r.doc_id
        for r in ts.stratified_exact_sample(d.repartition(9), "doc_id", "source", 15)
        .select("doc_id")
        .collect()
    }
    assert ids1 == ids2
    with pytest.raises(ValueError):
        ts.stratified_exact_sample(d, "doc_id", "source", 0)


# ---------------------------------------------------------------------------
# binary_simhash_near_dups
# ---------------------------------------------------------------------------


def test_binary_neardup_exact_copies_always_connected(spark):
    d = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(20)
        .select("doc_id", F.encode("text", "utf-8").alias("content"))
    )
    media = d.unionByName(
        d.select((F.col("doc_id") + 10_000).alias("doc_id"), "content")
    )
    hx = media.select("doc_id", F.hex("content").alias("hx"))
    pairs = multimodal.binary_simhash_near_dups(hx, "doc_id", "hx")
    idm = {r.id: r.hub for r in pairs._identity_map.collect()}
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    for r in d.select("doc_id").collect():
        a, b = idm[r.doc_id], idm[r.doc_id + 10_000]
        assert a == b or (min(a, b), max(a, b)) in got, r.doc_id
    pairs.unpersist()


def test_binary_neardup_trailer_perturbed_recall(spark):
    """Near-miss behavior (statistical, not an invariant): a 3-byte
    trailer append on a >=200-char payload flips only low-margin vote
    bits, so most — not provably all — perturbed copies land within
    the hamming-3/4-band envelope (bands stay at 4: narrower chunks
    collapse bucket entropy and the band join goes quadratic — see
    the operator docstring). Assert decent recall plus the pigeonhole
    contract: every pair the fingerprints place at hamming<=3 IS
    connected (closure over the banded join)."""
    d = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .filter(F.col("n_chars") >= 200)
        .limit(40)
        .select("doc_id", F.encode("text", "utf-8").alias("content"))
    )
    media = d.unionByName(
        d.select(
            (F.col("doc_id") + 100_000).alias("doc_id"),
            F.concat(F.col("content"), F.encode(F.lit(" v2"), "utf-8")).alias(
                "content"
            ),
        )
    )
    hx = media.select("doc_id", F.hex("content").alias("hx"))
    from etl_script_spark.operators import dedup as dd

    fp = {
        r.id: r.fp
        for r in dd.simhash_fingerprints(
            hx, "doc_id", "hx", unit="byte-hex"
        ).collect()
    }
    pairs = multimodal.binary_simhash_near_dups(hx, "doc_id", "hx")
    idm = {r.id: r.hub for r in pairs._identity_map.collect()}
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    found = 0
    total = 0
    for r in d.select("doc_id").collect():
        total += 1
        a, b = idm[r.doc_id], idm[r.doc_id + 100_000]
        connected = a == b or (min(a, b), max(a, b)) in got
        ham = bin(fp[r.doc_id] ^ fp[r.doc_id + 100_000]).count("1")
        if ham <= 3:
            assert connected, (r.doc_id, ham)  # pigeonhole: never missed
        found += connected
    assert found / total >= 0.6, (found, total)
    pairs.unpersist()


# ---------------------------------------------------------------------------
# Round-6b curation operators
# ---------------------------------------------------------------------------


def test_preference_pairs_extremes_ties_and_singletons(spark):
    from etl_script_spark.operators import conversations as cv

    rows = [
        ("p1", 1, 10), ("p1", 2, 30), ("p1", 3, 20),   # clear winner/loser
        ("p2", 4, 5), ("p2", 5, 5),                    # exact tie, 2 ids
        ("p3", 6, 9),                                  # singleton -> no pair
    ]
    d = spark.createDataFrame(rows, "grp string, rid long, score long")
    out = {
        r.group: (r.chosen_id, r.rejected_id, r.margin)
        for r in cv.preference_pairs(d, "grp", "rid", F.col("score")).collect()
    }
    assert out["p1"] == (2, 1, 20)
    # tie policy: chosen = largest id, rejected = smallest, margin 0 kept
    assert out["p2"] == (5, 4, 0)
    assert "p3" not in out


def test_token_budget_select_respects_budget_and_order(spark):
    from etl_script_spark.operators import textstats as ts

    # grades 3,2,1 with 4 docs x 10 tokens each; budget 65 keeps grade 3
    # (40) + grade 2 (40 -> only first 2 docs fit: 40+20=60 <= 65)
    rows = [(g * 10 + i, g, 10) for g in (1, 2, 3) for i in range(4)]
    d = spark.createDataFrame(rows, "id long, g long, tok long")
    sel = ts.token_budget_select(d, "id", F.col("g"), F.col("tok"), budget=65)
    got = sorted(r.id for r in sel.collect())
    assert got == [20, 21, 30, 31, 32, 33]  # all of grade 3, first 2 of grade 2
    assert sum(r.n_tok for r in sel.collect()) <= 65
    # budget >= total keeps everything; partition invariance
    assert ts.token_budget_select(d, "id", F.col("g"), F.col("tok"), 10_000).count() == 12
    got2 = sorted(
        r.id
        for r in ts.token_budget_select(
            d.repartition(7), "id", F.col("g"), F.col("tok"), 65
        ).collect()
    )
    assert got2 == got
    with pytest.raises(ValueError):
        ts.token_budget_select(d, "id", F.col("g"), F.col("tok"), 0)


def test_token_budget_select_oversized_top_grade_takes_prefix(spark):
    from etl_script_spark.operators import textstats as ts

    d = spark.createDataFrame(
        [(i, 5, 30) for i in range(10)], "id long, g long, tok long"
    )
    sel = sorted(r.id for r in ts.token_budget_select(
        d, "id", F.col("g"), F.col("tok"), budget=100).collect())
    assert sel == [0, 1, 2]  # 3 x 30 = 90 <= 100 < 120, prefix by id


def test_rank_calibrate_exact_ppm_and_single_row_stratum(spark):
    from etl_script_spark.operators import quality as q

    rows = [("a", 1, 50), ("a", 2, 70), ("a", 3, 60), ("b", 4, 99)]
    d = spark.createDataFrame(rows, "src string, rid long, score long")
    out = {r.rid: r.pr_ppm for r in q.rank_calibrate(d, "rid", "src", F.col("score")).collect()}
    assert out == {1: 0, 3: 500_000, 2: 1_000_000, 4: 0}


def test_profile_columns_counts_and_validation(spark):
    from etl_script_spark.operators import expectations as ex

    d = spark.createDataFrame(
        [(1, "en"), (2, None), (3, "en"), (4, "th")], "id long, lang string"
    )
    rows = {r.column_name: r for r in ex.profile_columns(d, ["lang", "id"]).collect()}
    assert rows["lang"].n_rows == 4
    assert rows["lang"].n_null == 1
    assert rows["lang"].n_distinct == 2
    assert rows["id"].n_null == 0 and rows["id"].n_distinct == 4
    with pytest.raises(ValueError):
        ex.profile_columns(d, [])


# ---------------------------------------------------------------------------
# mlm_mask
# ---------------------------------------------------------------------------


def test_mlm_mask_rate_recoverability_and_determinism(spark):
    import json

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = ts.mlm_mask(d, "text", "doc_id", rate=0.15).collect()
    total_tok = 0
    total_masked = 0
    from etl_script_spark.operators.dedup import normalize_text

    norm = {
        r.doc_id: r.n
        for r in d.select(
            "doc_id", normalize_text(F.col("text")).alias("n")
        ).collect()
    }
    for r in out:
        toks = r.masked_text.split(" ")
        targets = json.loads(r.targets_json)
        assert len(targets) == r.n_masked
        # recoverability: substituting targets back yields the original
        for t in targets:
            pos, _, orig = t.partition(":")
            assert toks[int(pos)] == "[MASK]"
            toks[int(pos)] = orig
        assert " ".join(toks) == norm[r.id]
        total_tok += len(toks)
        total_masked += r.n_masked
    # md5 selection is Bernoulli(0.15) per position
    assert abs(total_masked / total_tok - 0.15) < 0.03, (total_masked, total_tok)
    # partition invariance
    again = {
        r.id: (r.masked_text, r.targets_json)
        for r in ts.mlm_mask(d.repartition(11), "text", "doc_id", 0.15).collect()
    }
    assert all(again[r.id] == (r.masked_text, r.targets_json) for r in out)
    with pytest.raises(ValueError):
        ts.mlm_mask(d, "text", "doc_id", rate=0.0)


# ---------------------------------------------------------------------------
# inbatch_negatives
# ---------------------------------------------------------------------------


def test_inbatch_negatives_contract(spark):
    from etl_script_spark.operators import similarity as sim

    d = spark.range(200).select(F.col("id").alias("vid"))
    out = sim.inbatch_negatives(d, "vid", k=4, n_batches=8).collect()
    by_anchor = {}
    for r in out:
        assert r.negative_id != r.id  # never self
        by_anchor.setdefault(r.id, []).append(r.negative_id)
    # every anchor present (200 ids over 8 batches -> no singletons here)
    assert len(by_anchor) == 200
    for negs in by_anchor.values():
        assert 1 <= len(negs) <= 4
        assert len(set(negs)) == len(negs)  # distinct negatives
    # deterministic under repartitioning
    again = sim.inbatch_negatives(d.repartition(7), "vid", 4, 8).collect()
    assert {(r.id, r.negative_id, r.off) for r in again} == {
        (r.id, r.negative_id, r.off) for r in out
    }
    # singleton batches emit nothing; k larger than batch wraps safely
    one = spark.createDataFrame([(1,)], "vid long")
    assert sim.inbatch_negatives(one, "vid", 4, 8).count() == 0
    two = spark.createDataFrame([(1,), (2,)], "vid long")
    rows = sim.inbatch_negatives(two, "vid", 4, 1).collect()
    assert {(r.id, r.negative_id) for r in rows} == {(1, 2), (2, 1)}
    with pytest.raises(ValueError):
        sim.inbatch_negatives(d, "vid", 0, 8)


# ---------------------------------------------------------------------------
# contamination_report_bloom
# ---------------------------------------------------------------------------


def test_bloom_decontam_matches_exact_even_undersized(spark):
    from etl_script_spark.operators import decontam as dc

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = d.filter(F.col("doc_id") % 7 == 2).select("text")
    corpus = d.select("doc_id", "text")
    exact = {
        (r.doc_id, r.n_overlap)
        for r in dc.contamination_report(corpus, bench, "text", "doc_id", n=8).collect()
    }
    # an UNDERSIZED bloom (256 bits) floods phase 2 with false
    # positives — output must still be byte-identical to the exact
    # report (no false negatives + string re-verify)
    for m_bits in (1 << 8, 1 << 14):
        got = {
            (r.doc_id, r.n_overlap)
            for r in dc.contamination_report_bloom(
                corpus, bench, "text", "doc_id", n=8, m_bits=m_bits
            ).collect()
        }
        assert got == exact, m_bits
    assert exact  # fixture actually plants overlaps


# ---------------------------------------------------------------------------
# span_corrupt
# ---------------------------------------------------------------------------


def test_span_corrupt_recoverable_and_deterministic(spark):
    import re

    from etl_script_spark.operators.dedup import normalize_text

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = ts.span_corrupt(d, "text", "doc_id", start_rate=0.05).collect()
    norm = {
        r.doc_id: r.n
        for r in d.select("doc_id", normalize_text(F.col("text")).alias("n")).collect()
    }
    tot_tok = 0
    tot_hidden = 0
    for r in out:
        # parse target into {sentinel: tokens}; closing sentinel is empty
        parts = re.split(r"<extra_id_(\d+)>", r.target)
        spans = {}
        for i in range(1, len(parts) - 1, 2):
            spans[int(parts[i])] = parts[i + 1].strip()
        assert int(parts[-2]) == r.n_spans  # closing sentinel number
        # splice spans back into the corrupted input -> original text
        def repl(m):
            return spans[int(m.group(1))]
        rebuilt = re.sub(r"<extra_id_(\d+)>", repl, r.corrupted)
        rebuilt = re.sub(r"\s+", " ", rebuilt).strip()
        assert rebuilt == norm[r.id], r.id
        n_tok = len(norm[r.id].split(" "))
        tot_tok += n_tok
        tot_hidden += sum(len(v.split(" ")) for k, v in spans.items() if v)
    # ~5% starts x mean span 3 => ~14-15% tokens hidden (merges shave it)
    assert 0.08 < tot_hidden / tot_tok < 0.22, tot_hidden / tot_tok
    again = {r.id: (r.corrupted, r.target) for r in ts.span_corrupt(
        d.repartition(11), "text", "doc_id", 0.05).collect()}
    assert all(again[r.id] == (r.corrupted, r.target) for r in out)
    with pytest.raises(ValueError):
        ts.span_corrupt(d, "text", "doc_id", start_rate=1.5)


# ---------------------------------------------------------------------------
# review fixes: overflow / null / degenerate-input guards
# ---------------------------------------------------------------------------


def test_rank_calibrate_survives_large_stratum(spark):
    """row_number is INT: (rnk-1)*1e6 overflowed 32 bits past ~2148
    rows per stratum (ANSI ARITHMETIC_OVERFLOW) until widened."""
    from etl_script_spark.operators import quality as q

    d = spark.range(5000).select(
        F.lit("one").alias("src"), F.col("id").alias("rid"),
        F.col("id").alias("score"),
    )
    rows = q.rank_calibrate(d, "rid", "src", F.col("score")).collect()
    assert len(rows) == 5000
    top = max(rows, key=lambda r: r.rnk)
    assert (top.rnk, top.pr_ppm) == (5000, 1_000_000)


def test_preference_pairs_ignores_null_scores(spark):
    from etl_script_spark.operators import conversations as cv

    rows = [("p", 1, 5), ("p", 2, 3), ("p", 3, None),
            ("q", 4, None), ("q", 5, None)]
    d = spark.createDataFrame(rows, "grp string, rid long, score long")
    out = {r.group: r for r in cv.preference_pairs(d, "grp", "rid", F.col("score")).collect()}
    # the unscored response must appear in NEITHER slot
    assert (out["p"].chosen_id, out["p"].rejected_id, out["p"].margin) == (1, 2, 2)
    assert "q" not in out  # all-unscored group emits nothing


def test_ks_empty_side_yields_null_not_crash(spark):
    d = spark.range(100).select(F.col("id").alias("v"), F.lit(False).alias("a"))
    row = cs.ks_two_sample(d, "v", F.col("a")).collect()[0]
    assert row.ks_ppb is None
    assert row.n_a == 0 and row.n_b == 100


def test_zipf_degenerate_vocab_yields_null_not_crash(spark):
    # exactly one rank survives min_rank -> zero OLS variance
    rows = [(f"w{r}", 20 - r) for r in range(1, 11)]  # 10 tokens
    docs = spark.createDataFrame(rows, "tok string, n int").select(
        F.concat_ws(" ", F.array_repeat(F.col("tok"), F.col("n"))).alias("text")
    )
    out = cs.zipf_slope(docs, "text", top_k=100, min_rank=10).collect()[0]
    assert out.n_ranks == 1
    assert out.slope_ppb is None and out.intercept_ppb is None


def test_bloom_decontam_never_broadcasts_bench_grams(spark):
    from etl_script_spark.operators import decontam as dc

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = d.filter(F.col("doc_id") % 7 == 2).select("text")
    out = dc.contamination_report_bloom(
        d.select("doc_id", "text"), bench, "text", "doc_id", n=8
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, plan[:500]


# ---------------------------------------------------------------------------
# heaps_curve
# ---------------------------------------------------------------------------


def test_heaps_curve_monotone_and_matches_bruteforce(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pts = cs.heaps_curve(d, "text", "doc_id", n_points=4).collect()
    assert [p.prefix_docs for p in pts] == sorted(p.prefix_docs for p in pts)
    # monotone non-decreasing vocabulary
    vocabs = [p.vocab for p in pts]
    assert vocabs == sorted(vocabs)
    # brute-force check of every point: vocab of the first-k docs
    rows = sorted(
        (r.doc_id, r.n) for r in d.select(
            "doc_id",
            F.split(
                F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "
            ).alias("n"),
        ).collect()
    )
    for p in pts:
        vocab = set()
        for doc_id, toks in rows[: p.prefix_docs]:
            vocab.update(t for t in toks if t)
        assert len(vocab) == p.vocab, p.prefix_docs
    with pytest.raises(ValueError):
        cs.heaps_curve(d, "text", "doc_id", n_points=1)


# ---------------------------------------------------------------------------
# fixed-width source/sink
# ---------------------------------------------------------------------------


def test_fixed_width_roundtrip_and_overflow_guard(spark, tmp_path):
    from etl_script_spark.sources.readers import read_fixed_width
    from etl_script_spark.sources.writers import write_fixed_width

    d = spark.createDataFrame(
        [(1, "alpha", 3.5), (22, "beta x", None)],
        "k long, name string, v double",
    )
    out = str(tmp_path / "fw")
    write_fixed_width(d, out, widths=[4, 8, 10])
    back = read_fixed_width(
        spark, out, [("k", 4, "long"), ("name", 8, "string"), ("v", 10, "double")]
    )
    got = {(r.k, r.name, r.v) for r in back.collect()}
    # NULL writes as an all-blank field and reads back as NULL
    assert got == {(1, "alpha", 3.5), (22, "beta x", None)}
    # overflow must raise, never silently truncate
    wide = spark.createDataFrame([(1, "waaaaay too long", 1.0)],
                                 "k long, name string, v double")
    with pytest.raises(Exception, match="fixed-width overflow"):
        write_fixed_width(wide, out, widths=[4, 8, 10])
    with pytest.raises(ValueError):
        write_fixed_width(d, out, widths=[4, 8])
    with pytest.raises(ValueError):
        read_fixed_width(spark, out, [])


# ---------------------------------------------------------------------------
# earlier-round-6 review fixes (cross-cutting edge cases)
# ---------------------------------------------------------------------------


def test_temperature_mix_ignores_null_stratum(spark):
    # 10 NULL-stratum rows must not become n_min (which would collapse
    # every real stratum's keep rate), and must not appear in output
    rows = [(i, None if i < 10 else f"s{i % 2}") for i in range(1010)]
    d = spark.createDataFrame(rows, "rid long, src string")
    out = ts.temperature_mix_sample(d, "rid", "src", alpha=0.5)
    got = out.collect()
    assert all(r.src is not None for r in got)
    # both real strata have ~500 rows -> rate ~1.0 -> nearly all kept
    assert len(got) > 900, len(got)


def test_bpe_tokenize_matches_jvm_on_unicode_whitespace(spark):
    from etl_script_spark.operators import bpe

    # NBSP inside — JVM words() (Java \s, ASCII) keeps it in ONE token
    d = spark.createDataFrame(
        [(1, "foo bar baz"), (2, "plain text")], "doc_id long, text string"
    )
    merges = bpe.train_bpe(bpe.word_frequencies(d, "text"), 5)
    out = {r.id: r for r in bpe.tokenize(d, "text", "doc_id", merges).collect()}
    jvm = {
        r.doc_id: r.n
        for r in d.select("doc_id", F.size(ts.words(F.col("text"))).alias("n")).collect()
    }
    assert out[1].n_words == jvm[1] == 2  # 'foo\xa0bar' + 'baz'
    assert out[2].n_words == jvm[2] == 2


def test_span_removal_keeps_empty_docs(spark):
    from etl_script_spark.operators import dedup as dd

    d = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "some real words here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dd.remove_duplicate_spans(d, "text", "doc_id", n=3).collect()}
    assert set(out) == {1, 2, 3}  # cardinality preserved
    assert out[1].clean_text == "" and out[1].n_tokens == 0
    assert out[2].clean_text == "" and out[2].n_tokens == 0


def test_flatten_turns_counts_null_content_consistently(spark):
    from etl_script_spark.operators import conversations as cv

    d = spark.createDataFrame(
        [(1, 0, "user", "hi"), (1, 1, "assistant", None), (1, 2, "user", "bye")],
        "conv long, turn long, role string, content string",
    )
    r = cv.flatten_turns(
        d, ["conv"], ["turn"], F.col("role"), F.col("content")
    ).collect()[0]
    assert r.n_turns == 3
    assert len(r.transcript.split("\n")) == 3  # no silently dropped turn
    assert "assistant: " in r.transcript


def test_chunk_text_blank_doc_reports_zero_tokens(spark):
    d = spark.createDataFrame([(1, ""), (2, "a b c")], "doc_id long, text string")
    rows = {r.doc_id: r for r in ts.chunk_text(d, "text", "doc_id", 40, 8).collect()}
    assert rows[1].n_tokens == 0 and rows[1].chunk_text == ""
    assert rows[2].n_tokens == 3


def test_em_fit_empty_pairs_raises(spark):
    from etl_script_spark.operators import linkage as lk

    empty = spark.createDataFrame([], "a_name string, b_name string")
    comps = [lk.Comparator("name", F.col("a_name") == F.col("b_name"), 10, -5)]
    with pytest.raises(ValueError, match="empty"):
        lk.em_fit_weights(empty, comps)
