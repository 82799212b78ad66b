"""Round-7 operator batch: winnowing, novelty, containment, sentence
dedup, script profile, tokenizer fertility, l-diversity groups,
source data cards, group-aware splits, streaming quota gate."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from tests.conftest import *  # noqa: F401,F403  (spark fixture)


# ---------------------------------------------------------------------------
# Winnowing (operators/winnow.py)
# ---------------------------------------------------------------------------


def _py_winnow(text: str, k: int = 5, w: int = 4):
    """Textbook reference: rightmost-min per window, dedup across
    windows. Returns (n_positions, selected {pos: hash})."""
    import re

    norm = re.sub(r"\s+", " ", text.lower()).strip()
    n = len(norm) - k + 1
    if n < 1:
        return 0, {}
    hs = [
        int(hashlib.md5(norm[i : i + k].encode()).hexdigest()[:8], 16)
        for i in range(n)
    ]
    sel = {}
    for j in range(w - 1, n):
        win = hs[j - w + 1 : j + 1]
        m = min(win)
        # rightmost minimum
        off = max(idx for idx, v in enumerate(win) if v == m)
        pos = j - w + 1 + off
        sel[pos] = hs[pos]
    return n, sel


@pytest.mark.parametrize(
    "text",
    [
        "the quick brown fox jumps over the lazy dog again and again",
        "aaaaaaaaaaaaaaaaaaaaaa",                      # all-tie pathology
        "abcabcabcabcabcabcabc",                       # periodic
        "short",                                       # n < w
        "tiny",                                        # len < k
        "",                                            # empty
        "x y  z   multiple   spaces   collapse  here please",
    ],
)
def test_winnow_matches_textbook_reference(spark, text):
    from etl_script_spark.operators import winnow

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = winnow.winnow_fingerprints(df, "text", "doc_id").collect()[0]
    n_pos, sel = _py_winnow(text)
    assert row["n_positions"] == n_pos
    assert row["n_fps"] == len(sel)
    assert row["fp_sum"] == sum(sel.values())


def test_winnow_shared_substring_shares_fingerprint(spark):
    # guarantee: a shared substring of length >= k + w - 1 (= 8)
    # yields at least one common selected fingerprint
    from etl_script_spark.operators import winnow

    shared = "identical boilerplate fragment present in both documents"
    df = spark.createDataFrame(
        [
            (1, "left preamble text " + shared),
            (2, shared + " right epilogue text entirely different"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", F.col("text")
        ).join(
            winnow.winnow_fingerprints(df, "text", "doc_id").withColumnRenamed(
                "id", "doc_id"
            ),
            "doc_id",
        ).collect()
    }
    _, sel1 = _py_winnow(out[1]["text"])
    _, sel2 = _py_winnow(out[2]["text"])
    assert set(sel1.values()) & set(sel2.values()), "no shared fingerprint"


def test_winnow_validation(spark):
    from etl_script_spark.operators import winnow

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        winnow.winnow_fingerprints(df, "text", "doc_id", k=1)
    with pytest.raises(ValueError):
        winnow.winnow_fingerprints(df, "text", "doc_id", w=1)


# ---------------------------------------------------------------------------
# n-gram novelty (operators/winnow.py)
# ---------------------------------------------------------------------------


def test_novelty_planted_extremes(spark):
    from etl_script_spark.operators import winnow

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),     # reference member
            (2, "alpha beta gamma delta epsilon"),     # copy of reference
            (3, "totally novel words nowhere else"),   # fully novel
            (4, "alpha beta gamma completely new tail words"),  # mixed
            (5, "ab"),                                  # < n words
        ],
        "doc_id long, text string",
    )
    ref = docs.filter(F.col("doc_id") == 1)
    out = {
        r["id"]: r
        for r in winnow.ngram_novelty(docs, ref, "text", "doc_id").collect()
    }
    assert out[1]["novelty_ppm"] == 0
    assert out[2]["novelty_ppm"] == 0
    assert out[3]["novelty_ppm"] == 1000000
    assert 0 < out[4]["novelty_ppm"] < 1000000
    assert out[5]["n_grams"] == 0 and out[5]["novelty_ppm"] == 1000000
    assert len(out) == 5  # cardinality contract


# ---------------------------------------------------------------------------
# Containment pairs (operators/dedup.py)
# ---------------------------------------------------------------------------


def test_containment_directed_excerpt(spark):
    from etl_script_spark.operators import dedup as dd

    long_text = (
        "one two three four five six seven eight nine ten eleven twelve "
        "thirteen fourteen fifteen sixteen"
    )
    excerpt = "one two three four five six"
    df = spark.createDataFrame(
        [(1, long_text), (2, excerpt), (3, "unrelated words entirely here")],
        "doc_id long, text string",
    )
    out = dd.containment_pairs(df, "text", "doc_id", n=3, threshold_ppm=800000)
    pairs = {
        (r["contained_id"], r["container_id"]): r["containment_ppm"]
        for r in out.collect()
    }
    # release the eager-persisted pair table: leaving it would trip the
    # shared session's cache-discipline asserts later in the run
    out.unpersist()
    assert pairs == {(2, 1): 1000000}  # directed; reverse NOT flagged


# ---------------------------------------------------------------------------
# Sentence dedup (operators/dedup.py)
# ---------------------------------------------------------------------------


def test_sentence_dedup_first_occurrence_wins(spark):
    from etl_script_spark.operators import dedup as dd

    banner = "this site uses cookies"
    df = spark.createDataFrame(
        [
            (1, f"unique opening line. {banner}. closing thought one"),
            (2, f"{banner}! second doc body text"),
            (3, "independent doc? with two sentences. " + banner),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in dd.dedup_sentences(df, "text", "doc_id").collect()}
    # banner survives only in doc 1 (smallest id, earliest idx)
    assert banner in out[1]["text"]
    assert banner not in out[2]["text"]
    assert banner not in out[3]["text"]
    assert out[2]["n_paras"] == 2 and out[2]["n_kept"] == 1
    assert out[3]["n_paras"] == 3 and out[3]["n_kept"] == 2


# ---------------------------------------------------------------------------
# Script profile / fertility (operators/textstats.py)
# ---------------------------------------------------------------------------


def test_script_profile_dominant_labels(spark):
    from etl_script_spark.operators import textstats as ts

    df = spark.createDataFrame(
        [
            (1, "plain english text"),
            (2, "привет мир как дела сегодня"),
            (3, "你好世界这是中文测试文本"),
            (4, "1234567890 123456"),
            (5, ""),
            (6, "mixed привет text latin wins here"),
        ],
        "doc_id long, text string",
    )
    p = ts.script_profile(F.col("text"))
    names = ["n_chars", "n_latin", "n_digit", "n_cyrillic", "n_cjk",
             "n_other", "dominant"]
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *[c.alias(n) for c, n in zip(p, names)]
        ).collect()
    }
    assert out[1]["dominant"] == "latin"
    assert out[2]["dominant"] == "cyrillic" and out[2]["n_cyrillic"] > 0
    assert out[3]["dominant"] == "cjk" and out[3]["n_cjk"] == 12
    assert out[4]["dominant"] == "digit"
    assert out[5]["dominant"] == "empty" and out[5]["n_chars"] == 0
    assert out[6]["dominant"] == "latin"
    for r in out.values():  # counts partition n_chars
        assert (
            r["n_latin"] + r["n_digit"] + r["n_cyrillic"] + r["n_cjk"]
            + r["n_other"]
            == r["n_chars"]
        )


def test_tokenizer_fertility_hand_computed(spark):
    from etl_script_spark.operators import textstats as ts

    # "hello world" -> 2 words, pieces: ceil(5/4)*2 = 4 tokens,
    # 10 non-space chars
    df = spark.createDataFrame(
        [(1, "hello world", "a"), (2, "hi", "a"), (3, "", "b")],
        "doc_id long, text string, source string",
    )
    out = {
        r["group"]: r
        for r in ts.tokenizer_fertility(df, "text", "source").collect()
    }
    a = out["a"]
    assert a["n_docs"] == 2 and a["n_words"] == 3
    assert a["n_tokens"] == 5  # hello(2) world(2) hi(1)
    assert a["n_chars"] == 12
    assert a["fertility_ppm"] == (5 * 1000000) // 3
    b = out["b"]
    assert b["n_words"] == 0 and b["fertility_ppm"] == 0


# ---------------------------------------------------------------------------
# Governance additions (operators/governance.py)
# ---------------------------------------------------------------------------


def test_l_diversity_groups_flags_homogeneous(spark):
    from etl_script_spark.operators import governance as gov

    df = spark.createDataFrame(
        [
            ("us", "a", "x"), ("us", "a", "x"),            # l=1 -> flagged
            ("us", "b", "x"), ("us", "b", "y"),            # l=2 -> ok
            ("de", "a", "z"),                              # l=1 -> flagged
        ],
        "nation string, seg string, sensitive string",
    )
    out = gov.l_diversity_groups(
        df, ["nation", "seg"], F.col("sensitive"), l_threshold=2
    ).collect()
    flagged = {(r["nation"], r["seg"]) for r in out}
    assert flagged == {("us", "a"), ("de", "a")}
    with pytest.raises(ValueError):
        gov.l_diversity_groups(df, ["nation"], F.col("sensitive"), 0)


def test_source_datacard_hand_computed(spark):
    from etl_script_spark.operators import governance as gov

    rows = [
        (1, "one two", "en", "s1"),
        (2, "one two", "en", "s1"),          # exact dup of 1
        (3, "three four five", "de", "s1"),
        (4, "six", "de", "s1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    r = gov.source_datacard(df, "source", "text", "lang", "doc_id").collect()[0]
    assert r["n_docs"] == 4 and r["n_tokens"] == 2 + 2 + 3 + 1
    assert r["n_distinct_text"] == 3
    assert r["dup_per_myriad"] == (1 * 10000) // 4
    assert r["top_lang"] == "de"  # 2-2 tie -> lexicographically first
    # lengths sorted: 3,7,7,15 -> p50 = rank ceil(2)=2 -> 7; p90 rank 4 -> 15
    assert r["p50_chars"] == 7 and r["p90_chars"] == 15


# ---------------------------------------------------------------------------
# Group-aware split (operators/splits.py)
# ---------------------------------------------------------------------------


def test_split_group_aware_no_leakage_and_determinism(spark):
    from etl_script_spark.operators import splits

    df = spark.createDataFrame(
        [(i, f"doc number {i % 40}") for i in range(400)],
        "doc_id long, text string",
    )
    out = splits.group_aware_split(df, "doc_id").collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["group_fp"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_group.values())  # no group straddles
    labels = {r["split"] for r in out}
    assert labels <= {"train", "val", "test"}
    # deterministic across repartitioning
    out2 = splits.group_aware_split(df.repartition(7), "doc_id").collect()
    assert {(r["doc_id"], r["split"]) for r in out} == {
        (r["doc_id"], r["split"]) for r in out2
    }
    with pytest.raises(ValueError):
        splits.group_aware_split(df, "doc_id", train_pct=90, val_pct=20)


# ---------------------------------------------------------------------------
# Streaming quota gate (streaming/quota.py)
# ---------------------------------------------------------------------------


def test_stream_quota_gate_prefix_semantics_across_epochs(spark):
    from etl_script_spark.streaming import quota

    # source "a": 3-token docs; quota 7 -> docs 1, 2 admitted (cum 3, 6),
    # doc 3 overflows in epoch 1 (cum 9); the 1-token doc 4 in epoch 2
    # must STAY rejected (state advanced past quota by seen tokens)
    e1 = spark.createDataFrame(
        [
            (1, "a", "w w w"), (2, "a", "w w w"), (3, "a", "w w w"),
            (10, "b", "w w w w w w"),
        ],
        "doc_id long, source string, text string",
    )
    e2 = spark.createDataFrame(
        [(4, "a", "w"), (11, "b", "w")],
        "doc_id long, source string, text string",
    )
    feed = quota.write_epoch_feed([e1, e2], prefix="qg_test")
    out = quota.stream_quota_gate(
        spark, feed, "doc_id bigint, source string, text string",
        quota_tokens=7,
    )
    got = {(r["doc_id"], r["cum_tok"]) for r in out.collect()}
    assert got == {(1, 3), (2, 6), (10, 6), (11, 7)}
    with pytest.raises(ValueError):
        quota.stream_quota_gate(spark, feed, "x string", quota_tokens=0)


# ---------------------------------------------------------------------------
# Batch 2: point-in-time join, weighted median, prefix-filtered
# jaccard, MaxSim
# ---------------------------------------------------------------------------


def test_point_in_time_join_picks_live_version(spark):
    from etl_script_spark.operators import scd

    dim0 = spark.createDataFrame(
        [(1, "A"), (2, "B")], "k long, attr string"
    )
    dim = scd.scd2_init(dim0, "2024-01-01 00:00:00")
    dim = scd.scd2_apply(
        dim,
        spark.createDataFrame([(1, "A2")], "k long, attr string"),
        ["k"], ["attr"], "2024-02-01 00:00:00",
    )
    facts = spark.createDataFrame(
        [
            (100, 1, "2024-01-15 00:00:00"),   # before change -> A
            (101, 1, "2024-02-15 00:00:00"),   # after change  -> A2
            (102, 1, "2024-02-01 00:00:00"),   # boundary: new version open
            (103, 2, "2024-03-01 00:00:00"),   # unchanged key -> B
            (104, 9, "2024-03-01 00:00:00"),   # unknown key -> NULL
            (105, 1, "2023-12-01 00:00:00"),   # before first version -> NULL
        ],
        "fid long, k long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = {
        r["fid"]: r["attr"]
        for r in scd.point_in_time_join(facts, dim, ["k"], "ts").collect()
    }
    assert out == {100: "A", 101: "A2", 102: "A2", 103: "B",
                   104: None, 105: None}


def test_weighted_quantile_hand_computed(spark):
    from etl_script_spark.operators import features

    # group g: values 1(w=1), 2(w=1), 10(w=3): tot=5, half=2.5 ->
    # smallest v with cw*2 >= 5 is 10 (cw(2)=2, 4 < 5)
    df = spark.createDataFrame(
        [("g", 1.0, 1), ("g", 2.0, 1), ("g", 10.0, 3),
         ("h", 5.0, 2), ("h", 7.0, 1)],
        "grp string, v double, w long",
    )
    out = {
        r["grp"]: r
        for r in features.weighted_quantile_groups(
            df, ["grp"], "v", "w"
        ).collect()
    }
    assert out["g"]["wq_value"] == 10.0 and out["g"]["tot_weight"] == 5
    assert out["h"]["wq_value"] == 5.0  # cw(5)=2, 4 >= 3
    # p = 90th percentile
    p90 = {
        r["grp"]: r["wq_value"]
        for r in features.weighted_quantile_groups(
            df, ["grp"], "v", "w", p_num=9, p_den=10
        ).collect()
    }
    assert p90["g"] == 10.0 and p90["h"] == 7.0
    import pytest as _pt

    with _pt.raises(ValueError):
        features.weighted_quantile_groups(df, ["grp"], "v", "w", 3, 2)


def test_prefix_filtered_jaccard_matches_naive(spark):
    from etl_script_spark.operators import dedup as dd

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    fast = {
        (r["id_a"], r["id_b"]): r["jaccard_ppm"]
        for r in dd.jaccard_pairs_prefix_filtered(
            d, "text", "doc_id", threshold_ppm=500000
        ).collect()
    }
    # naive: inverted join on EVERY shingle
    sh = (
        d.select(
            F.col("doc_id"),
            F.explode(dd.shingles(F.col("text"), 3)).alias("s"),
        )
        .select("doc_id", F.xxhash64("s").alias("g"))
        .distinct()
    )
    n = sh.groupBy("doc_id").count().withColumnRenamed("count", "n_sh")
    a = sh.join(n, "doc_id").select(
        F.col("doc_id").alias("id_a"), "g", F.col("n_sh").alias("na")
    )
    b = sh.join(n, "doc_id").select(
        F.col("doc_id").alias("id_b"), "g", F.col("n_sh").alias("nb")
    )
    naive = {
        (r["id_a"], r["id_b"]): r["j"]
        for r in a.join(b, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("i"),
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
        )
        .withColumn("j", F.expr("(i * 1000000) DIV (na + nb - i)"))
        .filter(F.col("j") >= 500000)
        .collect()
    }
    assert fast == naive and len(fast) > 0


def test_maxsim_prefers_facet_coverage(spark):
    from etl_script_spark.operators import similarity

    # query has two orthogonal facets; doc A covers both, doc B
    # duplicates one facet twice -> MaxSim must rank A over B even
    # though B's best single vector matches perfectly
    rows = [
        ("q", 0, [1.0, 0.0]), ("q", 1, [0.0, 1.0]),
    ]
    docs = [
        ("A", 0, [1.0, 0.0]), ("A", 1, [0.0, 1.0]),
        ("B", 0, [1.0, 0.0]), ("B", 1, [1.0, 0.0]),
    ]
    qv = spark.createDataFrame(
        rows, "query_id string, vec_idx int, embedding array<double>"
    )
    dv = spark.createDataFrame(
        docs, "doc_id string, vec_idx int, embedding array<double>"
    )
    out = sorted(
        similarity.maxsim_topk(dv, qv, k=2).collect(),
        key=lambda r: r["rank"],
    )
    assert out[0]["doc_id"] == "A" and abs(out[0]["maxsim"] - 2.0) < 1e-12
    assert out[1]["doc_id"] == "B" and abs(out[1]["maxsim"] - 1.0) < 1e-12


# ---------------------------------------------------------------------------
# Batch 4: readability, stupid backoff, pointer-jumping hierarchy,
# randomized response, quantile normalization
# ---------------------------------------------------------------------------


def test_flesch_readability_hand_computed(spark):
    from etl_script_spark.operators import textstats

    df = spark.createDataFrame(
        [
            (1, "the cat sat. the dog ran!"),   # W=6 S=2 Y=6
            (2, ""),                             # W=0 S=1(min) Y=0
            (3, "xyz qrst"),                     # W=2 S=1 Y=1 ('y' run)
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in textstats.flesch_readability(df).collect()}
    assert (out[1]["n_words"], out[1]["n_sentences"],
            out[1]["n_syllables"]) == (6, 2, 6)
    # 206835 - (1015*6) DIV 2 - (84600*6) DIV 6 = 206835 - 3045 - 84600
    assert out[1]["flesch_milli"] == 206835 - 3045 - 84600
    assert out[2]["n_words"] == 0 and out[2]["flesch_milli"] == 206835
    assert out[3]["flesch_milli"] == 206835 - 2030 - (84600 * 1) // 2


def test_stupid_backoff_hand_computed(spark):
    from etl_script_spark.operators import textstats

    # corpus: doc1 "a b c", doc2 "a b d"
    # T=6; c(a)=2 c(b)=2 c(c)=1 c(d)=1; c(a,b)=2 c(b,c)=1 c(b,d)=1
    # c(a,b,c)=1 c(a,b,d)=1
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d")], "doc_id long, text string"
    )
    out = {
        r["id"]: r["fluency_ppm_sum"]
        for r in textstats.stupid_backoff_scores(df).collect()
    }
    # doc1: pos0 'a' uni-no-penalty: (2*1M) DIV 6 = 333333
    #       pos1 'b' ctx 'a': bigram (2*1M) DIV 2 = 1000000
    #       pos2 'c' ctx (a,b): trigram (1*1M) DIV 2 = 500000
    assert out[1] == 333333 + 1000000 + 500000
    assert out[2] == out[1]  # symmetric corpus


def test_flatten_hierarchy_chain_and_tree(spark):
    from etl_script_spark.operators import graph

    # chain 1<-2<-3<-4<-5 plus a second root 10 with child 11
    nodes = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 2), (4, 3), (5, 4), (10, 10), (11, 10)],
        "node long, parent long",
    )
    out = {
        r["node"]: (r["root"], r["depth"], r["path_sum"])
        for r in graph.flatten_hierarchy(nodes, max_depth=8).collect()
    }
    assert out[1] == (1, 0, 1)
    assert out[5] == (1, 4, 15)     # 5+4+3+2+1
    assert out[4] == (1, 3, 10)
    assert out[10] == (10, 0, 10)
    assert out[11] == (10, 1, 21)
    import pytest as _pt

    with _pt.raises(ValueError):
        graph.flatten_hierarchy(nodes, max_depth=0)


def test_randomized_response_debias_converges(spark):
    from etl_script_spark.operators import governance

    # 3 values, heavily skewed truth; with n=3000 the debiased
    # estimate must land within 10% of truth for the majority class
    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 8, F.lit("en"))
        .when(F.col("id") % 10 < 9, F.lit("de"))
        .otherwise(F.lit("fr")).alias("lang"),
    )
    out = {
        r["value"]: r
        for r in governance.randomized_response_freq(
            df, "lang", "doc_id"
        ).collect()
    }
    assert sum(r["true_count"] for r in out.values()) == 3000
    assert sum(r["noisy_count"] for r in out.values()) == 3000
    en_est = out["en"]["est_milli"] / 1000.0
    assert abs(en_est - out["en"]["true_count"]) < 0.1 * 2400
    # determinism: same input -> same noisy counts
    out2 = {
        r["value"]: r["noisy_count"]
        for r in governance.randomized_response_freq(
            df, "lang", "doc_id"
        ).collect()
    }
    assert out2 == {v: r["noisy_count"] for v, r in out.items()}


def test_quantile_normalize_aligns_distributions(spark):
    from etl_script_spark.operators import features

    df = spark.createDataFrame(
        [("a", 10, 1), ("a", 20, 2), ("a", 30, 3),
         ("b", 100, 4), ("b", 200, 5), ("b", 300, 6)],
        "src string, v long, k long",
    )
    out = features.quantile_normalize(df, "src", "v", "k")
    rows = out.collect()
    # rank 1 mean = (10+100)/2 = 55 -> 55000 milli
    by_rank = {}
    for r in rows:
        by_rank.setdefault(r["rank_in_group"], set()).add(r["norm_milli"])
    assert by_rank == {1: {55000}, 2: {110000}, 3: {165000}}
    # post-normalization distributions identical across groups
    a = sorted(r["norm_milli"] for r in rows if r["src"] == "a")
    b = sorted(r["norm_milli"] for r in rows if r["src"] == "b")
    assert a == b


# ---------------------------------------------------------------------------
# Batch 5: market basket, code detect, video scene segments
# ---------------------------------------------------------------------------


def test_pair_associations_hand_computed(spark):
    from etl_script_spark.operators import basket

    # baskets: 1:{a,b,c} 2:{a,b} 3:{a,c} 4:{b} -> N=4
    # c(a)=3 c(b)=3 c(c)=2; pairs: (a,b)=2 (a,c)=2 (b,c)=1
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"),
         (3, "a"), (3, "c"), (4, "b"), (1, "a")],  # dup line collapses
        "b long, i string",
    )
    out = {
        (r["item_a"], r["item_b"]): r
        for r in basket.pair_associations(df, "b", "i", 2, 10).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c")}
    ab = out[("a", "b")]
    assert ab["pair_count"] == 2
    assert ab["support_ppm"] == 500000          # 2/4
    assert ab["confidence_ppm"] == 666666       # 2/3
    assert ab["lift_milli"] == (2 * 4 * 1000) // 9
    ac = out[("a", "c")]
    assert ac["lift_milli"] == (2 * 4 * 1000) // 6
    import pytest as _pt

    with _pt.raises(ValueError):
        basket.pair_associations(df, "b", "i", 0, 10)


def test_code_signals_detects_code(spark):
    from etl_script_spark.operators import textstats

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "def f(x): return [x] if x else {x: 1}"),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in textstats.code_signals(df).collect()}
    assert out[1]["is_code"] is False and out[1]["kw_hits"] == 0
    assert out[2]["is_code"] is True
    assert out[2]["kw_hits"] == 4  # def return if else
    assert out[2]["symbol_ppm"] > 20000


def test_scene_segments_cuts_on_threshold(spark):
    from etl_script_spark.operators import multimodal

    rows = [
        (1, 0, [0, 0]), (1, 1, [1, 1]),        # L1=2 no cut
        (1, 2, [100, 100]),                     # L1=198 cut
        (1, 3, [101, 100]),                     # L1=1 no cut
        (2, 0, [5, 5]), (2, 1, [5, 5]),         # single scene
    ]
    df = spark.createDataFrame(
        rows, "video_id long, frame_idx long, feat array<long>"
    )
    out = {
        (r["video_id"], r["scene_id"]): (r["start_frame"], r["end_frame"],
                                         r["n_frames"])
        for r in multimodal.scene_segments(df, threshold=100).collect()
    }
    assert out == {
        (1, 1): (0, 1, 2),
        (1, 2): (2, 3, 2),
        (2, 1): (0, 1, 2),
    }


# ---------------------------------------------------------------------------
# Batch 6: OHLC resample, Markov transitions, OLS slope, Gini
# ---------------------------------------------------------------------------


def test_ohlc_selects_by_time_order(spark):
    from etl_script_spark.operators import timeseries

    rows = [
        ("k", "2024-01-01 10:05:00", 1, 5.0),
        ("k", "2024-01-01 10:01:00", 2, 3.0),   # earliest -> open
        ("k", "2024-01-01 10:59:00", 3, 1.0),   # latest -> close, low
        ("k", "2024-01-01 10:30:00", 4, 9.0),   # high
        ("k", "2024-01-01 11:00:00", 5, 7.0),   # next bucket
    ]
    df = spark.createDataFrame(
        rows, "key string, ts string, event_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = {
        str(r["bucket_ts"]): r
        for r in timeseries.ohlc_resample(
            df, "key", "ts", "value", "event_id"
        ).collect()
    }
    b10 = out["2024-01-01 10:00:00"]
    assert (b10["open"], b10["high"], b10["low"], b10["close"],
            b10["n_events"]) == (3.0, 9.0, 1.0, 1.0, 4)
    assert out["2024-01-01 11:00:00"]["open"] == 7.0


def test_markov_transitions_exact_probs(spark):
    from etl_script_spark.operators import timeseries

    # user 1: a->b->a->c ; user 2: a->b
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "c"),
        (2, 1, "a"), (2, 2, "b"),
    ]
    df = spark.createDataFrame(
        rows, "user long, seq long, state string"
    ).withColumn("ts", F.timestamp_seconds(F.col("seq")))
    out = {
        (r["from_state"], r["to_state"]): r
        for r in timeseries.markov_transitions(
            df, "user", "ts", "state", "seq"
        ).collect()
    }
    # from a: a->b twice, a->c once
    assert out[("a", "b")]["n"] == 2
    assert out[("a", "b")]["prob_ppm"] == 666666
    assert out[("a", "c")]["prob_ppm"] == 333333
    assert out[("b", "a")]["prob_ppm"] == 1000000


def test_ols_slope_exact(spark):
    from etl_script_spark.operators import stats

    # y = 3x + 1 exactly -> slope_ppb = 3e9; plus a constant-x group
    rows = [("g", x, 3 * x + 1) for x in range(1, 6)]
    rows += [("h", 2, 10), ("h", 2, 20)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {
        r["g"]: r for r in stats.ols_slope_groups(df, ["g"], "x", "y").collect()
    }
    assert out["g"]["slope_ppb"] == 3_000_000_000
    assert out["h"]["slope_ppb"] is None
    # negative slope truncates toward zero on both engines
    df2 = spark.createDataFrame(
        [("n", 0, 10), ("n", 1, 3), ("n", 2, 0)], "g string, x long, y long"
    )
    r = stats.ols_slope_groups(df2, ["g"], "x", "y").collect()[0]
    assert r["slope_ppb"] == -5_000_000_000


def test_gini_extremes(spark):
    from etl_script_spark.operators import stats

    # perfectly equal -> 0; maximal concentration -> (n-1)/n = 750
    eq = spark.createDataFrame(
        [("e", 10, i) for i in range(4)], "g string, v long, k long"
    )
    conc = spark.createDataFrame(
        [("c", 0, 0), ("c", 0, 1), ("c", 0, 2), ("c", 100, 3)],
        "g string, v long, k long",
    )
    out_eq = stats.gini_groups(eq, ["g"], "v", "k").collect()[0]
    out_c = stats.gini_groups(conc, ["g"], "v", "k").collect()[0]
    assert out_eq["gini_milli"] == 0
    assert out_c["gini_milli"] == 750


def test_prefix_jaccard_identity_collapse(spark):
    from etl_script_spark.operators import dedup as dd

    # identical class {1,2,3}; near-dup 4 (J vs the class ~ 0.75);
    # unrelated 5
    same = "alpha beta gamma delta epsilon zeta eta"
    near = "alpha beta gamma delta epsilon zeta other"
    df = spark.createDataFrame(
        [(1, same), (2, same), (3, same), (4, near),
         (5, "completely different words everywhere now")],
        "doc_id long, text string",
    )
    full = dd.jaccard_pairs_prefix_filtered(
        df, "text", "doc_id", threshold_ppm=500000
    ).collect()
    coll = dd.jaccard_pairs_prefix_filtered(
        df, "text", "doc_id", threshold_ppm=500000,
        collapse_identical=True,
    ).collect()
    # full form: 3 intra-class J=1 pairs + 3 class-to-4 pairs
    assert len(full) == 6
    # collapsed: intra-class gone, one rep pair (1, 4) with sizes
    assert len(coll) == 1
    r = coll[0]
    assert (r["id_a"], r["id_b"], r["n_docs_a"], r["n_docs_b"]) == (
        1, 4, 3, 1,
    )
    # same jaccard value as the full form's (1,4) row
    full_14 = [x for x in full if (x["id_a"], x["id_b"]) == (1, 4)][0]
    assert r["jaccard_ppm"] == full_14["jaccard_ppm"]


# ---------------------------------------------------------------------------
# Batch 7: CUSUM, seasonality index, Benford
# ---------------------------------------------------------------------------


def test_cusum_matches_textbook_recursion(spark):
    from etl_script_spark.operators import timeseries

    # values: stable around 10 then a strong level shift to 100
    vals = [10, 11, 9, 10, 10, 11, 9, 10, 10, 10,
            100, 101, 99, 100, 102]
    rows = [("k", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, seq long, v long") \
        .withColumn("ts", F.timestamp_seconds(F.col("seq")))
    out = timeseries.cusum_changepoints(
        df, "key", "ts", "v", "seq",
        allowance_milli=1000, h_mult_milli=3000,
    ).collect()
    # textbook replay: k = floor(sum*1000/(n*1000)) = floor(mean)
    total, n = sum(vals), len(vals)
    k = (total * 1000) // (n * 1000)
    h = (total * 3000) // (n * 1000)
    s, alarms = 0, []
    for i, v in enumerate(vals):
        s = max(0, s + v - k)
        if s > h:
            alarms.append((i, s))
    got = sorted((r["tiebreak"], r["s_value"]) for r in out)
    assert got == alarms and len(alarms) > 0


def test_seasonality_index_exact(spark):
    from etl_script_spark.operators import timeseries

    # month 1: mean 100; month 2: mean 300 -> global mean 200
    rows = [("2024-01-05", 100), ("2024-01-20", 100),
            ("2024-02-05", 300), ("2024-02-20", 300)]
    df = spark.createDataFrame(rows, "d string, v long").withColumn(
        "d", F.col("d").cast("date")
    )
    out = {
        r["period_no"]: r["index_ppm"]
        for r in timeseries.seasonality_index(df, "d", "v").collect()
    }
    assert out == {1: 500000, 2: 1500000}


def test_benford_planted_distribution(spark):
    from etl_script_spark.operators import stats

    # plant an exactly-Benford-shaped sample of 1e6 scaled rows:
    # n_d proportional to the expected ppm
    rows = []
    for d, ppm in enumerate(stats.BENFORD_PPM, start=1):
        rows += [(d * 1000 + i % 7,) for i in range(ppm // 1000)]
    df = spark.createDataFrame(rows, "v long")
    out = {r["digit"]: r for r in stats.benford_first_digit(df, "v").collect()}
    assert set(out) == set(range(1, 10))
    # planted counts follow Benford to within the flooring error of
    # the ppm//1000 sample construction (total 995, not 1000)
    assert all(r["dev_ppm"] <= 2000 for r in out.values())
    # zero/negative rows are excluded
    df2 = spark.createDataFrame([(0,), (-5,), (123,)], "v long")
    out2 = stats.benford_first_digit(df2, "v").collect()
    assert len(out2) == 1 and out2[0]["digit"] == 1 and out2[0]["n"] == 1


# ---------------------------------------------------------------------------
# Batch 8: top keywords, ABC classification
# ---------------------------------------------------------------------------


def test_top_keywords_rare_terms_win(spark):
    from etl_script_spark.operators import textstats

    # 'common' appears in all docs (df=3 -> linear idf 1e6); each
    # doc's unique word (df=1 -> idf 3e6) must outrank it
    df = spark.createDataFrame(
        [
            (1, "common zebra"),
            (2, "common yak"),
            (3, "common xerus"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r["keywords"]
        for r in textstats.top_keywords(df, k=2).collect()
    }
    assert out[1] == "zebra|common"
    assert out[2] == "yak|common"
    assert out[3] == "xerus|common"


def test_abc_classification_boundaries(spark):
    from etl_script_spark.operators import features

    # one group, values 50/30/15/5 (total 100): cum 50,80,95,100
    df = spark.createDataFrame(
        [("g", "a", 50), ("g", "b", 30), ("g", "c", 15), ("g", "d", 5)],
        "grp string, item string, v long",
    )
    out = {
        r["item"]: (r["cum_ppm"], r["abc_class"])
        for r in features.abc_classification(df, "grp", "item", "v").collect()
    }
    assert out["a"] == (500000, "A")
    assert out["b"] == (800000, "A")    # boundary inclusive
    assert out["c"] == (950000, "B")    # boundary inclusive
    assert out["d"] == (1000000, "C")
    import pytest as _pt

    with _pt.raises(ValueError):
        features.abc_classification(df, "grp", "item", "v", 900000, 800000)


# ---------------------------------------------------------------------------
# Batch 9: top paths, count-min, early-fact retry (streaming OHLC is
# covered by its catalog oracle + the batch twin's unit test)
# ---------------------------------------------------------------------------


def test_top_paths_counts_and_share(spark):
    from etl_script_spark.operators import conversations

    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "d"),  # a>b>c
        (2, 1, "a"), (2, 2, "b"), (2, 3, "c"),               # a>b>c
        (3, 1, "x"), (3, 2, "y"),                            # x>y (short)
        (4, 1, "a"),                                          # a
    ]
    df = spark.createDataFrame(
        rows, "user long, seq long, state string"
    ).withColumn("ts", F.timestamp_seconds(F.col("seq")))
    out = {
        r["path"]: r
        for r in conversations.top_paths(
            df, "user", "ts", "state", "seq", depth=3, k=10
        ).collect()
    }
    assert out["a>b>c"]["n_keys"] == 2
    assert out["a>b>c"]["share_ppm"] == 500000
    assert out["x>y"]["n_keys"] == 1 and out["a"]["n_keys"] == 1


def test_countmin_never_undercounts(spark):
    from etl_script_spark.operators import sketches as sk

    df = spark.range(5000).select((F.col("id") % 25).alias("k"))
    out = sk.countmin_estimates(df, "k", depth=4, width=64).collect()
    assert len(out) == 25
    assert all(r["cms_n"] >= r["true_n"] for r in out)
    assert all(r["overcount"] == r["cms_n"] - r["true_n"] for r in out)
    # exact determinism
    out2 = sk.countmin_estimates(df, "k", depth=4, width=64).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    import pytest as _pt

    with _pt.raises(ValueError):
        sk.countmin_estimates(df, "k", depth=0)


def test_early_fact_retry_stages_partition_facts(spark):
    from etl_script_spark.plans.catalog import CATALOG

    out = {
        r["stage"]: r
        for r in CATALOG["dwh_early_fact_retry"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert set(out) == {"enriched_epoch1", "enriched_epoch2_retry",
                        "dead_letter"}
    # stages partition the fact table: counts sum to |orders|
    n = sum(r["n_rows"] for r in out.values())
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    assert n == orders.count()


# ---------------------------------------------------------------------------
# Batch 10: chi-square contingency
# ---------------------------------------------------------------------------


def test_chi2_contingency_hand_computed(spark):
    from etl_script_spark.operators import stats

    # 2x2 table: rows a/b, cols x/y with obs a-x=30 a-y=10 b-x=10 b-y=10
    rows = (
        [("a", "x")] * 30 + [("a", "y")] * 10
        + [("b", "x")] * 10 + [("b", "y")] * 10
    )
    df = spark.createDataFrame(rows, "r string, c string")
    out = {
        (o["row_val"], o["col_val"]): o
        for o in stats.chi2_contingency(df, "r", "c").collect()
    }
    # N=60; E(a,x) = 40*40/60 = 26.666... -> 26666 milli
    ax = out[("a", "x")]
    assert ax["obs"] == 30 and ax["exp_milli"] == 26666
    # chi2 cell = (30000-26666)^2 // 26666 = 3334^2 // 26666
    assert ax["chi2_cell_milli"] == (3334 * 3334) // 26666
    # independent table -> all contributions ~0
    ind = [("a", "x")] * 20 + [("a", "y")] * 20 + [("b", "x")] * 20 + [
        ("b", "y")] * 20
    df2 = spark.createDataFrame(ind, "r string, c string")
    out2 = stats.chi2_contingency(df2, "r", "c").collect()
    assert all(o["chi2_cell_milli"] == 0 for o in out2)


# ---------------------------------------------------------------------------
# Batch 11: tercile thresholds / RFM, and the S1 schema regression
# ---------------------------------------------------------------------------


def test_integer_tercile_thresholds(spark):
    from etl_script_spark.operators import features

    # values 1..9 once each: cum rule -> t1 = 3, t2 = 6
    df = spark.createDataFrame([(v,) for v in range(1, 10)], "v long")
    r = features.integer_tercile_thresholds(df, "v").collect()[0]
    assert (r["t1"], r["t2"]) == (3, 6)
    # heavy ties: all same value -> both thresholds that value
    df2 = spark.createDataFrame([(5,)] * 10, "v long")
    r2 = features.integer_tercile_thresholds(df2, "v").collect()[0]
    assert (r2["t1"], r2["t2"]) == (5, 5)


def test_read_csv_fallback_applies_schema(spark, tmp_path):
    """Regression: schema passed via csv_options was stringified by
    DataFrameReader.options() and silently ignored — every column
    came back string-typed (caught by the round-7 full-catalog
    sweep)."""
    from pyspark.sql import types as T

    from etl_script_spark.sources import readers

    p = tmp_path / "t.csv"
    p.write_text("k,v\n1,a\n2,b\n", encoding="utf-8")
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    df = readers.read_csv_fallback(
        spark, [str(p)], header=True, schema=schema
    )
    assert dict(df.dtypes)["k"] == "bigint"
    assert {r["k"] for r in df.collect()} == {1, 2}
