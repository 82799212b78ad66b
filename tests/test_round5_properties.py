"""Randomized spark==truth properties for the round-5 operators: each
compares the distributed implementation against an INDEPENDENT pure-
Python reference on seeded random inputs — the countermeasure to the
oracle's shared-expression blind spot, extended from fixtures to
whole input distributions. Seeded random (not hypothesis) because one
Spark job per example is the cost model; 3 seeds x N inputs gives the
distribution coverage without 100 session round-trips."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from etl_script_spark.operators import cdc, graph
from etl_script_spark.operators import timeseries as ts


def _random_feed(rng: random.Random, n_keys: int, n_changes: int):
    rows = []
    for seq in range(1, n_changes + 1):
        for k in range(n_keys):
            if rng.random() < 0.6:
                op = rng.choice(["I", "U", "U", "D"])
                rows.append((k, seq, op, rng.randrange(1000)))
    return rows


def _apply_reference(rows):
    """Pure-Python CDC replay: last (seq, op-preferring-delete) wins."""
    state: dict[int, tuple] = {}
    best: dict[int, tuple] = {}
    for k, seq, op, v in rows:
        # mirror orderBy(seq desc, op asc): larger seq wins; on equal
        # seq the SMALLER op string wins ('D' < 'I' < 'U')
        cand = (seq, [c for c in "DIU"].index(op))
        prev = best.get(k)
        if prev is None or (cand[0], -cand[1]) > (prev[0], -prev[1]):
            best[k] = cand
            state[k] = (seq, op, v)
    return {
        k: (seq, op, v)
        for k, (seq, op, v) in state.items()
        if op != "D"
    }


def test_cdc_apply_matches_reference_on_random_feeds(spark):
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        rows = _random_feed(rng, n_keys=40, n_changes=6)
        df = spark.createDataFrame(rows, "k int, seq int, op string, v int")
        got = {
            r["k"]: (r["seq"], r["op"], r["v"])
            for r in cdc.apply_changes(df, ["k"], "seq", "op").collect()
        }
        assert got == _apply_reference(rows), f"seed {seed}"


def _brute_triangles(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    verts = sorted({v for e in und for v in e})
    n = 0
    for a, b, c in itertools.combinations(verts, 3):
        if (a, b) in und and (b, c) in und and (a, c) in und:
            n += 1
    return len(verts), len(und), n


def test_triangle_count_matches_brute_force_on_random_graphs(spark):
    for seed in (5, 6, 7):
        rng = random.Random(seed)
        edges = [
            (rng.randrange(12), rng.randrange(12)) for _ in range(40)
        ]
        df = spark.createDataFrame(edges, "src int, dst int")
        row = graph.triangle_count(df).collect()[0]
        v, e, t = _brute_triangles(edges)
        assert (row["n_vertices"], row["n_edges"], row["n_triangles"]) == (
            v, e, t,
        ), f"seed {seed}"


def _reference_kcore(edges, k, rounds):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    for _ in range(rounds):
        deg: dict[int, int] = {}
        for u, v in und:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {x for x, d in deg.items() if d >= k}
        und = {(u, v) for u, v in und if u in keep and v in keep}
    deg = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    return deg


def test_kcore_matches_reference_on_random_graphs(spark):
    for seed in (11, 12):
        rng = random.Random(seed)
        edges = [
            (rng.randrange(15), rng.randrange(15)) for _ in range(45)
        ]
        df = spark.createDataFrame(edges, "src int, dst int")
        got = {
            r["vertex"]: r["deg"]
            for r in graph.kcore_peel(df, k=3, rounds=3).collect()
        }
        assert got == _reference_kcore(edges, 3, 3), f"seed {seed}"


def test_ewma_matches_reference_on_random_signal(spark):
    rng = random.Random(21)
    vals = [rng.uniform(-100, 100) for _ in range(40)]
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)], "k int, seq int, x double"
    )
    out = {
        r["seq"]: r["ewma"]
        for r in ts.ewma_fir(df, ["k"], ["seq"], "x", alpha=0.3, taps=8).collect()
    }
    w = ts.ewma_weights(0.3, 8)
    for i in range(len(vals)):
        if i < 7:
            assert out[i] is None
        else:
            # replicate the LEFT-ASSOCIATIVE tap sum exactly
            acc = vals[i] * w[0]
            for j in range(1, 8):
                acc = acc + vals[i - j] * w[j]
            assert out[i] == acc, f"row {i}"


def _ref_tfidf_pairs(docs, threshold, n=3):
    """Pure-Python exact replay of vsm.tfidf_cosine_join's integer
    arithmetic (multiset word n-grams, (N*1e6) div df idf, integer
    dots/norms, float cosine) — independent of Spark AND DuckDB."""
    import math
    import re
    from collections import Counter

    def grams(text):
        words = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
        if len(words) < n:
            return [" ".join(words)]
        return [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]

    tf = {i: Counter(grams(t)) for i, t in docs}
    big_n = len(docs)
    df = Counter()
    for c in tf.values():
        for term in c:
            df[term] += 1
    idf = {t: (big_n * 1_000_000) // d for t, d in df.items() if d * 2 <= big_n}
    w = {
        i: {t: c * idf[t] for t, c in cnt.items() if t in idf}
        for i, cnt in tf.items()
    }
    n2 = {i: sum(x * x for x in wi.values()) for i, wi in w.items()}
    out = {}
    ids = sorted(w)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            shared = set(w[a]) & set(w[b])
            if not shared:
                continue
            dot = sum(w[a][t] * w[b][t] for t in shared)
            cos = float(dot) / (math.sqrt(float(n2[a])) * math.sqrt(float(n2[b])))
            if cos >= threshold:
                out[(a, b)] = cos
    return out


def test_tfidf_cosine_matches_python_reference(spark):
    from etl_script_spark.operators import vsm

    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(4, 15))))
        for i in range(25)
    ]
    df = spark.createDataFrame(docs, "id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in vsm.tfidf_cosine_join(df, "id", "text", threshold=0.3).collect()
    }
    ref = _ref_tfidf_pairs(docs, 0.3)
    assert set(got) == set(ref)
    for k in ref:  # integer dots/norms -> cosines must match BITWISE
        assert got[k] == ref[k], k


def test_linkage_scores_match_reference_on_random_records(spark):
    """Blocked FS scoring vs a pure-Python replay: same blocks, same
    integer weights, same threshold — on randomized field corruption."""
    from etl_script_spark.operators import linkage

    rng = random.Random(41)
    segs = ["auto", "bike", "boat"]
    left, right = [], []
    for i in range(60):
        blk = i % 7
        name = f"name{i:03d}"
        seg = segs[i % 3]
        left.append((i, blk, name, seg))
        # corrupted twin: maybe one char edit, maybe wrong segment
        nm = name[:-1] + "x" if rng.random() < 0.5 else name
        sg = seg if rng.random() < 0.7 else "zz"
        right.append((1000 + i, blk, nm, sg))
    ldf = spark.createDataFrame(left, "l_id int, l_blk int, l_name string, l_seg string")
    rdf = spark.createDataFrame(right, "r_id int, r_blk int, r_name string, r_seg string")
    got = {
        (r["l_id"], r["r_id"]): r["score"]
        for r in linkage.link(
            ldf, rdf,
            block_on=[(F.col("l_blk"), F.col("r_blk"))],
            comparators=[
                linkage.Comparator(
                    "name",
                    F.levenshtein(F.col("l_name"), F.col("r_name")) <= 1,
                    20, -5),
                linkage.Comparator(
                    "seg", F.col("l_seg") == F.col("r_seg"), 5, -3),
            ],
            threshold=15,
        ).collect()
    }

    def lev_le1(a, b):
        if a == b:
            return True
        if abs(len(a) - len(b)) > 1:
            return False
        # one substitution (equal length) or one indel
        if len(a) == len(b):
            return sum(x != y for x, y in zip(a, b)) <= 1
        s, l = (a, b) if len(a) < len(b) else (b, a)
        for i in range(len(l)):
            if l[:i] + l[i + 1:] == s:
                return True
        return False

    ref = {}
    for li, lb, ln, ls in left:
        for ri, rb, rn, rs in right:
            if lb != rb:
                continue
            score = (20 if lev_le1(ln, rn) else -5) + (5 if ls == rs else -3)
            if score >= 15:
                ref[(li, ri)] = score
    assert got == ref
