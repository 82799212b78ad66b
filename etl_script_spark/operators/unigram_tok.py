"""Unigram language-model tokenizer (SentencePiece-style).

The second of the two standard subword tokenizers (Kudo, "Subword
Regularization", ACL 2018 — public method; ``bpe.py`` implements the
first). Where BPE grows a vocabulary bottom-up by merging, the
unigram model starts from a LARGE seed of candidate pieces and prunes
toward the target size under a piece-unigram likelihood, segmenting
by Viterbi. Training here is the deterministic hard-EM variant:

1. **Seed**: every substring (length <= max_piece_len) of the word-
   frequency table, scored by total occurrence mass; the seed keeps
   the top ``seed_factor * vocab_size`` by (mass desc, piece asc),
   plus ALL single characters (coverage guarantee — every word stays
   segmentable).
2. **Hard-EM rounds**: E-step Viterbi-segments each word under the
   current quantized piece costs and accumulates piece counts
   weighted by word frequency; M-step re-estimates
   nll(piece) = -ln(count/total), quantized to 1e-6 int64.
3. **Prune**: drop the lowest-mass multi-char pieces until
   ``vocab_size`` remain (single chars are never pruned), then run a
   final EM round on the surviving vocabulary.

Every step is deterministic: ties break lexicographically, all
segmentation costs are integer (quantized nll), and the Viterbi
tie-break is fixed (lower cost, then LONGER last piece, then the
piece string) — same inputs, same vocabulary, same segmentation,
on every run and every cluster size.

Scale contract (the ``bpe.py`` pattern verbatim): the corpus-side
work is ONE map-side-combined word-frequency aggregation (Zipf
collapses the shuffle); the EM/prune loop runs on the bounded
COLLECTED frequency table (driver, O(types x len^2)); apply is
Arrow-batched mapInPandas with the quantized vocab broadcast once
per executor and a per-batch word cache (Zipf again: few thousand
distinct words per batch).
"""

from __future__ import annotations

import re

import math

from pyspark.sql import DataFrame

from etl_script_spark.operators.bpe import word_frequencies

__all__ = [
    "word_frequencies",
    "train_unigram",
    "viterbi_segment",
    "tokenize_unigram",
]


def viterbi_segment(word: str, nll_q: dict[str, int]) -> list[str]:
    """Minimum-cost segmentation of ``word`` into vocab pieces under
    integer piece costs. Deterministic tie-break: lower total cost,
    then the LONGER last piece, then the lexicographically smaller
    last piece. Characters absent from the vocab fall back to a
    per-character cost higher than any real piece (OOV floor), so
    segmentation never fails."""
    n = len(word)
    if n == 0:
        return []
    oov = max(nll_q.values(), default=0) + 10_000_000
    maxlen = max(map(len, nll_q), default=1)
    # dp[j] = (cost, start_of_last_piece, piece)
    dp: list[tuple[int, int, str] | None] = [None] * (n + 1)
    dp[0] = (0, 0, "")
    for j in range(1, n + 1):
        best: tuple[int, int, str] | None = None
        for i in range(max(0, j - maxlen), j):
            if dp[i] is None:
                continue
            piece = word[i:j]
            c = nll_q.get(piece)
            if c is None:
                if j - i > 1:
                    continue
                c = oov
            cand = (dp[i][0] + c, i, piece)
            # tie-break: longer last piece == smaller i
            if best is None or (cand[0], cand[1], cand[2]) < (
                best[0],
                best[1],
                best[2],
            ):
                best = cand
        dp[j] = best
    out: list[str] = []
    j = n
    while j > 0:
        _c, i, piece = dp[j]  # type: ignore[misc]
        out.append(piece)
        j = i
    out.reverse()
    return out


def _quantize(counts: dict[str, float]) -> dict[str, int]:
    total = sum(counts.values()) or 1.0
    return {
        p: int(round(-math.log(max(c, 0.5) / total) * 1e6))
        for p, c in counts.items()
    }


def train_unigram(
    word_freqs: list[tuple[str, int]],
    vocab_size: int = 2048,
    max_piece_len: int = 8,
    em_iters: int = 3,
    seed_factor: int = 4,
) -> dict[str, int]:
    """Fit the unigram vocabulary on a word-frequency table; returns
    piece -> quantized nll (int64). See module docstring for the
    algorithm and determinism contract."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    if max_piece_len < 1:
        raise ValueError(f"max_piece_len must be >= 1, got {max_piece_len}")
    # seed: substring mass
    mass: dict[str, float] = {}
    chars: set[str] = set()
    for w, n in word_freqs:
        chars.update(w)
        ln = len(w)
        for i in range(ln):
            for j in range(i + 1, min(i + max_piece_len, ln) + 1):
                p = w[i:j]
                mass[p] = mass.get(p, 0.0) + n
    multi = sorted(
        ((p, m) for p, m in mass.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(seed_factor * vocab_size, 0)]
    seed = {p: m for p, m in multi}
    for c in chars:
        seed[c] = mass.get(c, 1.0)
    nll_q = _quantize(seed)

    def em_round(vocab_nll: dict[str, int]) -> dict[str, float]:
        counts: dict[str, float] = {}
        for w, n in word_freqs:
            for piece in viterbi_segment(w, vocab_nll):
                counts[piece] = counts.get(piece, 0.0) + n
        return counts

    for _ in range(em_iters):
        counts = em_round(nll_q)
        # keep chars alive even when unused this round
        for c in chars:
            counts.setdefault(c, 0.0)
        nll_q = _quantize(counts)

    # prune multi-char pieces by usage mass toward vocab_size
    counts = em_round(nll_q)
    for c in chars:
        counts.setdefault(c, 0.0)
    keep_multi = sorted(
        ((p, m) for p, m in counts.items() if len(p) > 1 and m > 0),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(vocab_size - len(chars), 0)]
    pruned = {p: m for p, m in keep_multi}
    for c in chars:
        pruned[c] = counts.get(c, 0.0)
    # final re-estimate on the surviving vocabulary
    nll_q = _quantize(pruned)
    final_counts = em_round(nll_q)
    for c in chars:
        final_counts.setdefault(c, 0.0)
    return _quantize(final_counts)


def tokenize_unigram(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    vocab_nll_q: dict[str, int],
) -> DataFrame:
    """Distributed unigram apply: (id, n_words, n_chars, n_tokens)
    via Arrow-batched mapInPandas, broadcast vocab, per-batch word
    cache. ``n_chars`` is REDERIVED from the emitted pieces (sum of
    piece lengths), so the external oracle — which recomputes the
    character mass from the raw text — catches any dropped or
    duplicated character in segmentation (the same falsifiable
    loss-free check as ``bpe.tokenize``)."""
    import pandas as pd

    spark = docs.sparkSession
    vocab_b = spark.sparkContext.broadcast(dict(vocab_nll_q))

    def _run(batches):
        vocab = vocab_b.value
        cache: dict[str, tuple[int, int]] = {}
        for pdf in batches:
            ids, n_words, n_chars, n_tokens = [], [], [], []
            for did, text in zip(pdf["id"], pdf["text"]):
                # ASCII \s split — Python str.split() breaks on
                # Unicode whitespace (NBSP etc.) that the JVM-side
                # words()/oracle tokenizer (Java regex \s+, ASCII-only)
                # keeps inside tokens; re.ASCII pins both engines to
                # the same boundaries
                ws = [
                    w
                    for w in re.split(
                        r"\s+", (text or "").lower(), flags=re.ASCII
                    )
                    if w
                ]
                toks = 0
                chars = 0
                for w in ws:
                    hit = cache.get(w)
                    if hit is None:
                        pieces = viterbi_segment(w, vocab)
                        hit = (len(pieces), sum(len(p) for p in pieces))
                        cache[w] = hit
                    toks += hit[0]
                    chars += hit[1]
                ids.append(did)
                n_words.append(len(ws))
                n_chars.append(chars)
                n_tokens.append(toks)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "n_words": n_words,
                    "n_chars": n_chars,
                    "n_tokens": n_tokens,
                }
            )

    src = docs.selectExpr(f"{id_col} AS id", f"{text_col} AS text")
    return src.mapInPandas(
        _run, "id long, n_words long, n_chars long, n_tokens long"
    )
