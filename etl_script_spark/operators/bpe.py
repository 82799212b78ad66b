"""Byte-pair-encoding tokenization: bounded driver-side training,
distributed Arrow-batched apply.

The LLM-pipeline counterpart of ``token_vocab``: the corpus's own BPE
vocabulary, trained Sennrich-style (iteratively merge the most
frequent adjacent symbol pair) and applied to every document. No
reference analogue — training-data widening.

Scale shape mirrors the IVF fit (similarity.py): TRAINING is a
driver-side loop over a bounded, deterministic, hash-ordered sample
of word frequencies (BPE training is inherently sequential — each
merge depends on the previous — so the principled distributed piece
is the word-frequency aggregation, which IS distributed and map-side
combined; the merge loop runs on the collected frequency table, whose
size is vocabulary- not corpus-bounded). APPLY is mapInPandas with
the merge ranks broadcast: per-word greedy lowest-rank merging, the
standard algorithm, vectorized per Arrow batch with a per-batch word
cache (Zipf means most words repeat).

Determinism: pair selection breaks frequency ties lexicographically;
the training sample is hash-ordered (xxhash64 of the id), not
id-ordered, so ingest order cannot bias the vocabulary.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_script_spark.operators.partitioning import fan_out
from etl_script_spark.operators.textstats import words

EOW = "</w>"


def word_frequencies(
    docs: DataFrame, text_col: str, limit: int | None = 65536
) -> list[tuple[str, int]]:
    """Distributed word-frequency table, collected for the training
    loop. The aggregation is map-side combined (shuffle carries
    distinct words per partition); ``limit`` keeps the driver-side
    table bounded by taking the most frequent words — rank ties
    broken by the word itself so the cut is deterministic. The
    default cap exists because a web-scale corpus has hundreds of
    millions of types: an uncapped collect is a driver OOM, and BPE
    training past the frequency head changes nothing (the tail never
    wins a merge). Pass ``None`` only on corpora known to be small."""
    toks = fan_out(docs.select(text_col)).select(
        F.explode(F.filter(words(F.col(text_col)), lambda w: w != "")).alias(
            "w"
        )
    )
    freq = toks.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    if limit is not None:
        freq = freq.orderBy(F.col("n").desc(), F.col("w")).limit(limit)
    return [(r["w"], r["n"]) for r in freq.collect()]


def train_bpe(
    word_freqs: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Sennrich BPE training over a word-frequency table: start from
    characters (+ end-of-word marker), repeatedly merge the most
    frequent adjacent pair. Frequency ties break lexicographically —
    same inputs, same vocabulary, always. Stops early when no pair
    occurs twice."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (EOW,): n for w, n in word_freqs
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], [-ord(c) for c in kv[0][0]], [-ord(c) for c in kv[0][1]]))
        if best[1] < 2:
            break
        (a, b), _n = best
        merges.append((a, b))
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, n in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE apply to one word: repeatedly merge the
    lowest-ranked pair present. The standard inference algorithm —
    O(len·merges_applied), tiny in practice."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i, (a, b) in enumerate(zip(sym, sym[1:])):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def tokenize(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Distributed BPE apply: (id, n_words, n_chars, n_tokens,
    roundtrip_ok).

    mapInPandas with the merge-rank dict broadcast once per executor;
    a per-batch word→tokens cache exploits Zipf (most words repeat,
    most batches encode a few thousand DISTINCT words). Two loss-free
    checks with different failure modes: ``roundtrip_ok`` asserts the
    per-word equality ``''.join(tokens) == word + EOW`` (catches
    symbol reordering/corruption, but an encoder that only ever
    concatenates adjacent symbols satisfies it structurally), and
    ``n_chars`` — the document's character mass REDERIVED FROM THE
    TOKENS (sum of token lengths minus one EOW per word) — which an
    external oracle recomputes from the raw text, so a dropped or
    duplicated symbol anywhere in the merge loop breaks the
    cross-engine hash even if the in-process equality were
    structurally immune."""
    import pandas as pd

    spark = docs.sparkSession
    ranks_b = spark.sparkContext.broadcast(
        {pair: i for i, pair in enumerate(merges)}
    )

    def _run(batches):
        ranks = ranks_b.value
        # cache maps word -> (token_count, roundtrip_ok): the
        # roundtrip is checked PER WORD — token chars must equal
        # word + EOW exactly (merges only ever concatenate adjacent
        # symbols, so the marker stays a suffix). A global
        # replace(EOW, ' ') would corrupt documents whose TEXT
        # contains the literal marker bytes and flag a false failure.
        cache: dict[str, tuple[int, int, bool]] = {}
        for pdf in batches:
            ids, n_words, n_chars, n_tokens, ok = [], [], [], [], []
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
                total = 0
                chars = 0
                doc_ok = True
                for w in ws:
                    hit = cache.get(w)
                    if hit is None:
                        enc = encode_word(w, ranks)
                        # character mass from the TOKENS (one EOW
                        # marker per word), NOT from the input word —
                        # the oracle recomputes it from the text
                        hit = (
                            len(enc),
                            sum(len(t) for t in enc) - len(EOW),
                            "".join(enc) == w + EOW,
                        )
                        cache[w] = hit
                    total += hit[0]
                    chars += hit[1]
                    doc_ok = doc_ok and hit[2]
                ids.append(did)
                n_words.append(len(ws))
                n_chars.append(chars)
                n_tokens.append(total)
                ok.append(doc_ok)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "n_words": pd.Series(n_words, dtype="int64"),
                    "n_chars": pd.Series(n_chars, dtype="int64"),
                    "n_tokens": pd.Series(n_tokens, dtype="int64"),
                    "roundtrip_ok": pd.Series(ok, dtype="bool"),
                }
            )

    base = fan_out(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    )
    return base.mapInPandas(
        _run,
        "id long, n_words long, n_chars long, n_tokens long, "
        "roundtrip_ok boolean",
    )
