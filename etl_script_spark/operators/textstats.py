"""Text-analysis operators for a training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting.

All built-in expressions (split/regexp/aggregate) — the hot path stays
in whole-stage codegen; at 100 TB these run at parquet-scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from etl_script_spark.functions.exprs import let
from etl_script_spark.operators.dedup import normalize_text

# Minimal per-language stopword marker sets (function words with high
# corpus frequency and low cross-language collision).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "del", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
    "de": ["der", "die", "und", "das", "von", "zu", "den", "mit", "ist", "des"],
}


def words(c: Column) -> Column:
    """Whitespace tokenization of normalized text."""
    return F.split(normalize_text(c), " ")


def token_count_ws(c: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(c))


def token_count_ws_nonempty(c: Column) -> Column:
    """Whitespace token count excluding empty tokens: 0 for an
    empty/whitespace-only document (``split('', ' ')`` is ``['']``,
    so the plain ``token_count_ws`` yields 1 there). Use this form
    when a downstream ``n_tokens > 0`` filter must agree bit-exact
    with an oracle that counts non-empty tokens."""
    return F.size(F.filter(words(c), lambda w: w != ""))


def token_count_bpe_ish(c: Column) -> Column:
    """BPE-ish subword proxy: count of word pieces after splitting on
    non-alphanumerics plus per-4-chars continuation pieces — a
    deterministic stand-in for a real tokenizer (no vocab file in this
    container). Counts ceil(len/4) per word, floor 1."""
    ws = F.filter(
        F.split(F.lower(c.cast("string")), r"[^\p{L}\p{N}]+"), lambda w: w != ""
    )
    pieces = F.aggregate(
        ws,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.greatest(F.ceil(F.length(w) / 4.0), F.lit(1).cast("long")),
    )
    return pieces


def stopword_ratio(c: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of `lang`."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    ws = words(c)
    hits = F.size(F.filter(ws, lambda w: F.array_contains(sw, w)))
    return hits / F.greatest(F.size(ws), F.lit(1))


def detect_language(c: Column) -> Column:
    """Language-ID heuristic: script detection (Thai/CJK character
    ranges) first, then argmax stopword-hit ratio over the marker sets;
    ties/no-hits → 'und'.

    The normalized text and the token array are each let-bound: the
    naive per-language ``when``-chain argmax duplicates every earlier
    score expression into each comparison (2^k growth), re-running the
    normalize+split regexes dozens of times per row — measured 3.5 s
    steady-state at sf0.1, ~1 s after binding. The argmax itself is an
    ``array_max`` over (score, -order, lang) structs: field-by-field
    struct ordering keeps the first-listed language on exact ties,
    matching the replace-only-if-strictly-greater loop it replaces."""

    def scored(s: Column) -> Column:
        thai = F.length(F.regexp_replace(s, r"[^฀-๿]", ""))
        cjk = F.length(F.regexp_replace(s, r"[^一-鿿]", ""))
        total = F.greatest(F.length(s), F.lit(1))

        def argmax(ws: Column) -> Column:
            n = F.greatest(F.size(ws), F.lit(1))
            entries = []
            for i, lang in enumerate(STOPWORDS):
                sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
                hits = F.size(F.filter(ws, lambda w: F.array_contains(sw, w)))
                entries.append(
                    F.struct(
                        (hits / n).alias("s"),
                        F.lit(-i).alias("ni"),
                        F.lit(lang).alias("l"),
                    )
                )
            return let(
                F.array_max(F.array(*entries)),
                lambda best: F.when(best["s"] > 0.0, best["l"]).otherwise(
                    F.lit("und")
                ),
            )

        return (
            F.when(thai / total > 0.25, F.lit("th"))
            .when(cjk / total > 0.25, F.lit("zh"))
            .otherwise(let(F.split(s, " "), argmax))
        )

    return let(normalize_text(c), scored)


def quality_score(c: Column) -> Column:
    """Document quality heuristic in [0,1]: blends length band,
    punctuation density, alpha ratio, mean word length band, and
    repetition (distinct-word ratio). Deterministic arithmetic —
    identical results on any engine. Normalized text and token array
    are let-bound (five regex re-evaluations → one)."""

    def scored(s: Column) -> Column:
        n_chars = F.greatest(F.length(s), F.lit(1))
        punct = F.length(F.regexp_replace(s, r"[^.,;:!?]", "")) / n_chars
        alpha = F.length(F.regexp_replace(s, r"[^\p{L} ]", "")) / n_chars
        len_band = (
            F.when(n_chars < 50, 0.2).when(n_chars > 10000, 0.5).otherwise(1.0)
        )

        def blended(ws: Column) -> Column:
            n_words = F.greatest(F.size(ws), F.lit(1))
            mean_wlen = (
                F.length(F.regexp_replace(s, " ", "")) / n_words
            ).cast("double")
            distinct_ratio = F.size(F.array_distinct(ws)) / n_words
            wlen_band = F.when(
                (mean_wlen >= 3.0) & (mean_wlen <= 10.0), 1.0
            ).otherwise(0.5)
            raw = (
                len_band * 0.25
                + wlen_band * 0.15
                + alpha * 0.25
                + (1.0 - F.least(punct * 5.0, F.lit(1.0))) * 0.15
                + distinct_ratio * 0.20
            )
            return F.round(raw.cast("double"), 6)

        return let(F.split(s, " "), blended)

    return let(normalize_text(c), scored)


def fingerprint_md5(c: Column) -> Column:
    """Stable document fingerprint: md5 of normalized text."""
    return F.md5(normalize_text(c))


def fingerprint_rolling(c: Column, base: int = 257, mod: int = (1 << 31) - 1) -> Column:
    """Polynomial (Rabin-Karp) rolling hash over the CODEPOINTS of the
    normalized text (bigint) — an order-sensitive fingerprint (md5
    twin is order-sensitive too but opaque; this one supports windowed
    substring matching). Computed with split-to-chars + aggregate — no
    UDF, O(n) per document.

    Engine-portable by construction: each term is the Unicode
    codepoint itself, so ANY engine re-derives the identical value
    (the DuckDB driver oracle replays ``list_reduce`` over
    ``unicode(char)`` — an earlier xxhash64-termed variant was
    verifiable only inside Spark).

    ``mod`` must satisfy mod * base + term < 2^63 or the multiply
    overflows ANSI int64 (a 2^61-1 modulus blows up on real data —
    caught at sf0.1); the Mersenne prime 2^31-1 keeps the accumulator
    at ~2^39."""
    assert mod * base < (1 << 62), "mod*base must fit int64"
    # split("") yields [""] for the empty string — filter keeps the
    # fold's seed (0) as the empty-text fingerprint on both engines
    codes = F.transform(
        F.filter(F.split(normalize_text(c), ""), lambda x: x != ""),
        lambda x: F.ascii(x).cast("long"),
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * base + x) % F.lit(mod),
    )


def hash_sample(
    df, key_col: str, fraction: float, seed: str = ""
) -> "DataFrame":
    """Deterministic content-hash sampling: keep a row iff the first 8
    hex chars of md5(seed || key) fall below the fraction threshold.
    Unlike rand()-based sampling this is REPRODUCIBLE across runs,
    cluster sizes, and engines (the DuckDB oracle computes the same
    md5) — the property a training-data pipeline needs so a 10%
    curation subsample is the same 10% every rerun. Selection is a
    pure per-row predicate: no shuffle, pushes into the scan stage.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        return df  # keep-all: a hex-string threshold can't express it
    threshold = format(int(fraction * 16**8), "08x")
    h = F.substring(
        F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string"))), 1, 8
    )
    return df.filter(h < F.lit(threshold))


def stratified_hash_sample(
    df,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: str = "",
) -> "DataFrame":
    """Per-stratum deterministic sampling — the domain-mixing primitive.

    A pretraining mix keeps 100% of wiki, 50% of books, 10% of common
    crawl: each stratum gets its own keep-rate, selection stays a pure
    per-row md5 predicate (reproducible across runs / engines /
    cluster sizes, same as ``hash_sample``), so the whole op is a
    no-shuffle filter that runs inside the scan stage — no groupBy, no
    per-stratum pass, one scan total at 100 TB. Strata not listed get
    ``default_rate`` (0.0 = drop, the safe default for an explicit
    mix).

    Rates are quantized to 1/16^8 granularity (same as hash_sample);
    rate >= 1.0 keeps the whole stratum unconditionally.
    """
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0,1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")

    def thr(r: float) -> str:
        # comparison is LEXICOGRAPHIC on hex strings — a full-keep
        # rate uses "g", which sorts strictly above every hex digit,
        # so it keeps the whole stratum without a numeric compare
        return "g" if r >= 1.0 else format(int(r * 16**8), "08x")

    # map literal: stratum -> 8-hex-digit threshold (or the "g"
    # full-keep sentinel).
    pairs: list[Column] = []
    for s, r in rates.items():
        pairs += [F.lit(s), F.lit(thr(r))]
    thresholds = F.create_map(*pairs) if pairs else F.create_map()
    threshold = F.coalesce(
        thresholds[F.col(strata_col).cast("string")],
        F.lit(thr(default_rate)),
    )
    h = F.substring(
        F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string"))), 1, 8
    )
    return df.filter(h < threshold)


def ngrams_all(c: Column, n: int = 2) -> Column:
    """Word n-grams of normalized text WITH duplicates (array<string>,
    document order) — repetition metrics need the multiplicities that
    ``dedup.shingles`` (a distinct set for Jaccard) throws away.
    Token array let-bound (see ``dedup.shingles``: an inlined subtree
    inside the transform lambda goes quadratic in document length —
    one 50k-word document cost 433 s before the bind)."""

    def build(ws: Column) -> Column:
        k = F.size(ws) - F.lit(n - 1)
        return F.when(
            k > 0,
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.array_join(F.slice(ws, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return let(words(c), build)


def repetition_metrics(
    df,
    text_col: str,
    id_col: str,
    ngram_n: int = 2,
    dup_word_max: float = 0.30,
    top_ngram_max: float = 0.18,
) -> "DataFrame":
    """Gopher-style repetition signals per document (Rae et al. 2021,
    Table A1): fraction of duplicated words and the fraction of the
    document covered by its single most-frequent word n-gram. Boiler-
    plate, keyword-stuffed, and looping-generator text score high on
    both; the ``repetitive`` flag is the drop decision at the default
    Gopher-ish thresholds.

    Shape at scale: dup_word_frac is a pure array expression (zero
    shuffle). The top-n-gram mode NEEDS per-(doc, gram) counts — that
    is explode + two-level aggregation, NOT a per-row quadratic scan:
    a 10k-word document would cost 10^8 comparisons per row the naive
    way, but explodes to 10k rows that map-side combine collapses
    before the shuffle. Both aggregations key on (id, gram-hash) /
    id, so shuffle width is bounded by token count, never by text
    size squared.

    Returns one row per input row: id, n_words, dup_word_frac,
    top_ngram_frac, repetitive.
    """
    from etl_script_spark.operators.dedup import _fan_out

    # single pass: the per-doc word stats ride ALONG the exploded
    # grams as a struct (first() through both aggregations) instead of
    # a second scan + self-join — the normalize/split regexes run once
    # per row, and there is no join. _fan_out: a small parquet file
    # arrives as ONE partition, which would run the whole explode
    # single-threaded.
    base = _fan_out(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        let(
            words(F.col(text_col)),
            lambda ws: F.struct(
                F.size(ws).alias("n_words"),
                (
                    F.lit(1.0)
                    - F.size(F.array_distinct(ws))
                    / F.greatest(F.size(ws), F.lit(1)).cast("double")
                ).alias("dup_word_frac"),
            ),
        ).alias("w"),
        ngrams_all(F.col(text_col), ngram_n).alias("grams"),
    )
    # per-(doc, gram) counts -> per-doc max; map-side combine collapses
    # repeated grams before each shuffle; explode_outer keeps zero-gram
    # docs (they surface with a NULL gram and top fraction 0)
    # shuffle key is the 64-bit gram HASH, never the gram text (a
    # shuffle keyed on raw bigrams carries ~2x the corpus over the
    # wire); only counts are needed downstream, so a same-doc hash
    # collision (2^-64 per gram pair) merely merges two counts —
    # the same tradeoff repeated_spans already documents. NULL grams
    # (explode_outer's zero-gram docs) stay NULL through the hash.
    agg = (
        base.select(
            F.col(id_col),
            F.col("w"),
            F.explode_outer("grams").alias("gram"),
        )
        .select(
            F.col(id_col),
            F.col("w"),
            F.when(
                F.col("gram").isNotNull(), F.xxhash64("gram")
            ).alias("gh"),
        )
        .groupBy(id_col, "gh")
        .agg(F.count(F.lit(1)).alias("cnt"), F.first("w").alias("w"))
        .groupBy(id_col)
        .agg(
            F.max(F.when(F.col("gh").isNotNull(), F.col("cnt"))).alias(
                "top_cnt"
            ),
            F.sum(F.when(F.col("gh").isNotNull(), F.col("cnt"))).alias(
                "n_grams"
            ),
            F.first("w").alias("w"),
        )
    )
    # NULL text -> every metric (and the flag) NULL, consistently: a
    # doc with no text has no repetition verdict, and a NULL flag is
    # excluded by a `NOT repetitive` filter — null docs drop out of a
    # curation pipeline rather than sneaking through either branch
    top_frac = F.when(
        F.col("w.n_words").isNotNull(),
        F.coalesce(
            F.col("top_cnt")
            / F.greatest(F.col("n_grams"), F.lit(1)).cast("double"),
            F.lit(0.0),
        ),
    )
    return agg.select(
        F.col(id_col),
        F.col("w.n_words").alias("n_words"),
        F.round("w.dup_word_frac", 6).alias("dup_word_frac"),
        F.round(top_frac, 6).alias("top_ngram_frac"),
        (
            (F.col("w.dup_word_frac") > dup_word_max)
            | (top_frac > top_ngram_max)
        ).alias("repetitive"),
    )


def chunk_text(
    df,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 256,
    overlap: int = 32,
) -> "DataFrame":
    """Split documents into overlapping fixed-size token windows — the
    step between curation and tokenization when the training context
    is shorter than the documents (and the unit most loaders shuffle).

    Pure expression pipeline: tokenize once, build the window index
    with ``sequence``, slice per window, ``posexplode`` to one row
    per chunk. No UDF, no shuffle — output rows are produced inside
    the same stage as the scan, so 100 TB in → chunks stream straight
    to the sink. Every document yields at least one chunk (short docs
    = one whole-doc chunk); the final window is the ragged remainder
    rather than a padded or dropped tail.

    Returns (id_col, chunk_idx, chunk_text, n_tokens) with
    ``n_tokens`` the window's actual whitespace-token count.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    stride = chunk_tokens - overlap
    # a NULL text has no chunks (the whole expression below yields a
    # [null] array whose lone row would otherwise survive posexplode);
    # an EMPTY text keeps its single empty chunk — "document exists
    # but is blank" stays visible downstream, "no document" does not
    df = df.filter(F.col(text_col).isNotNull())
    chunks = let(
        words(F.col(text_col)),
        lambda ws: let(
            # number of windows: 1 + ceil((n - chunk)/stride) for
            # n > chunk, else 1 — integer form avoids float ceil
            F.greatest(
                (F.size(ws) - F.lit(chunk_tokens) + F.lit(stride - 1))
                / F.lit(stride)
                + F.lit(1),
                F.lit(1),
            ).cast("int"),
            lambda n_chunks: F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(
                    F.slice(ws, i * stride + 1, chunk_tokens), " "
                ),
            ),
        ),
    )
    exploded = df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_text")
    )
    return exploded.select(
        id_col,
        "chunk_idx",
        "chunk_text",
        # split('') yields [''] — the kept empty chunk of a blank doc
        # must report 0 tokens, not a phantom 1 (pack_sequences budgets
        # from this count)
        F.when(F.col("chunk_text") == "", F.lit(0))
        .otherwise(F.size(F.split("chunk_text", " ")))
        .alias("n_tokens"),
    )


def token_vocab(df, text_col: str, min_count: int = 1) -> "DataFrame":
    """Corpus token-frequency table — the input to tokenizer training
    (BPE's initial word counts) and to frequency-based filters.

    One explode + one count aggregation: map-side combine collapses
    each partition's repeats before the shuffle, so shuffle volume is
    bounded by (distinct tokens x partitions), not corpus size — the
    Zipf head collapses almost entirely. ``min_count`` prunes the
    hapax tail AFTER aggregation (it cannot be pushed below the
    count, but it keeps the output table small).

    Empty/null documents contribute nothing (splitting "" yields one
    empty-string token, which is not a word — filtered pre-explode).

    Returns (token, n) rows.
    """
    toks = df.select(
        F.explode(
            F.filter(words(F.col(text_col)), lambda w: w != "")
        ).alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    if min_count > 1:
        vocab = vocab.filter(F.col("n") >= min_count)
    return vocab


def unigram_nll_scores(
    df, text_col: str, id_col: str, alpha: float = 0.5
) -> "DataFrame":
    """CCNet-style fluency scoring against a self-trained unigram LM:
    per-document mean negative log-likelihood of its tokens under the
    corpus's own token distribution (add-alpha smoothed). Documents
    full of rare / out-of-distribution tokens score high; the classic
    head/middle/tail split thresholds on this score.

    Two-pass shape: (1) token explode -> count aggregation (map-side
    combined) builds the LM; (2) re-explode the corpus, join each
    token against the LM, average per document. At 100 TB pass 2's
    join keys on the token string — Zipf makes the LM table small
    enough to broadcast in practice (a 10 M-type vocab is ~100 MB),
    so the join is left UNHINTED: AQE upgrades it to broadcast at
    runtime whenever the materialized vocab is actually small, and
    falls back to a shuffled join when it isn't. (An explicit
    ``F.broadcast`` here would be a HARD hint the planner never
    demotes — the wrong contract for a corpus-derived aggregate whose
    size the optimizer cannot estimate.)

    Determinism: each token's nll is quantized to 1e-6 BEFORE the
    per-document sum (round(-ln(p) * 1e6) -> int64), so the
    aggregation is integer addition — order-independent across
    partitionings and bit-identical across engines; the mean is then
    one exact integer-by-double division. A float avg() here is NOT
    reproducible: summation order shifts the low bits, and corpus
    scores concentrate so tightly that those bits routinely straddle
    rounding boundaries (observed at sf0.01).

    Empty/null documents produce no output row (no tokens, so no
    likelihood to speak of) — same convention as ``token_vocab``.

    Returns (id_col, n_tokens, avg_nll).
    """
    base = df.select(
        F.col(id_col),
        F.filter(words(F.col(text_col)), lambda w: w != "").alias("ws"),
    )
    toks = base.select(F.col(id_col), F.explode("ws").alias("token"))
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    stats = vocab.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("v")
    )
    # p(w) = (cnt + alpha) / (total + alpha * V); -ln p summed per doc
    nll_q = F.round(
        -F.log(
            (F.col("cnt") + F.lit(alpha))
            / (F.col("total") + F.lit(alpha) * F.col("v"))
        )
        * 1e6
    ).cast("long")
    scored = (
        toks.join(vocab, "token")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(nll_q).alias("s"),
        )
    )
    return scored.select(
        F.col(id_col),
        "n_tokens",
        (F.col("s") / (F.lit(1e6) * F.col("n_tokens"))).alias("avg_nll"),
    )


def pack_sequences(
    chunks,
    token_col: str,
    order_cols: list[str],
    shard_col: str,
    ctx_tokens: int = 512,
) -> "DataFrame":
    """Greedy streaming sequence packing: walk the chunks of each
    shard in a fixed order, accumulate token counts, and open a new
    training sequence whenever the running total would cross the
    context length — the standard "pack short chunks into fixed
    context windows" step before batching.

    bin id = floor((cumsum - n) / ctx) over the shard's running token
    count: the chunk starting at offset o lands in bin floor(o/ctx),
    which reproduces the greedy packer that splits only at chunk
    boundaries (a chunk may straddle its bin's end — the loader's
    attention mask handles the seam; chunks longer than ctx_tokens
    still get a bin rather than being silently dropped).

    Scale: the cumsum windows over shard_col — packing is per-shard
    (per source / per file), so no global sort exists anywhere; a
    shard's chunks sort within one partition. Deterministic given
    order_cols.
    """
    from pyspark.sql import Window

    if ctx_tokens <= 0:
        raise ValueError(f"ctx_tokens must be positive, got {ctx_tokens}")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    return chunks.withColumn(
        "seq_id",
        F.floor((cum - F.col(token_col)) / F.lit(ctx_tokens)).cast("long"),
    ).withColumn("seq_offset", cum - F.col(token_col) - F.col("seq_id") * ctx_tokens)


def epoch_mix(
    df,
    key_col: str,
    strata_col: str,
    factors: dict[str, float],
    default_factor: float = 1.0,
    seed: str = "",
) -> "DataFrame":
    """Up-sampling half of domain mixing: repeat each document by its
    stratum's epoch factor. A factor of 2.5 yields 2 guaranteed
    copies plus a third for the deterministic-hash-selected 50% of
    keys — over the stratum, expected copies = factor, and the same
    keys get the extra epoch on every run/engine (same md5 predicate
    as ``hash_sample``). Emits (row, epoch) with epoch 0..k-1 so the
    loader can shuffle epochs independently.

    Pure generate: sequence + explode inside the scan stage — no
    shuffle, no join. Factor 0 drops the stratum (use
    ``stratified_hash_sample`` for sub-1.0 keep rates; this operator
    floors at whole epochs + one fractional).
    """
    for s, f in factors.items():
        if f < 0:
            raise ValueError(f"factor for stratum {s!r} must be >= 0, got {f}")
    if default_factor < 0:
        raise ValueError(f"default_factor must be >= 0, got {default_factor}")

    def parts(f: float) -> tuple[int, str]:
        whole = int(f)
        frac = f - whole
        return whole, format(int(frac * 16**8), "08x")

    whole_pairs: list[Column] = []
    thr_pairs: list[Column] = []
    for s, f in factors.items():
        w_, t_ = parts(f)
        whole_pairs += [F.lit(s), F.lit(w_)]
        thr_pairs += [F.lit(s), F.lit(t_)]
    dw, dt = parts(default_factor)
    wmap = F.create_map(*whole_pairs) if whole_pairs else F.create_map()
    tmap = F.create_map(*thr_pairs) if thr_pairs else F.create_map()
    skey = F.col(strata_col).cast("string")
    whole = F.coalesce(wmap[skey], F.lit(dw))
    thr = F.coalesce(tmap[skey], F.lit(dt))
    h = F.substring(
        F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string"))), 1, 8
    )
    n_copies = whole + F.when(h < thr, 1).otherwise(0)
    return (
        df.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(0), F.col("__n") - 1))
        )
        .drop("__n")
    )


def weighted_hash_sample(df, key_col: str, weight_col, seed: str = "") -> "DataFrame":
    """Per-ROW deterministic sampling: keep each row with probability
    equal to its own weight column (a score in [0,1]) — quality-
    weighted curation ("keep good documents more often") as one
    predicate. The stratified variant reads its rate from a literal
    map; this one reads it from the data, so the keep decision can
    follow any computed signal (quality, fluency, recency decay).

    Same md5 mechanics as ``hash_sample``: reproducible across runs,
    engines, and cluster sizes; zero shuffle. Weights are clamped to
    [0, 1 - 2^-32] and quantized to 1/2^32 (a weight of exactly 1.0
    keeps with probability 1 - 2^-32 — indistinguishable in
    practice, and it keeps the comparison a fixed-width hex compare).
    NULL weights drop the row (an unscored document has no business
    in a weighted sample).
    """
    w = F.least(
        F.greatest(F.col(weight_col).cast("double"), F.lit(0.0)),
        F.lit(1.0 - 2.0**-32),
    )
    thr = F.format_string("%08x", F.floor(w * F.lit(4294967296.0)).cast("long"))
    h = F.substring(
        F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string"))), 1, 8
    )
    return df.filter(h < thr)


def temperature_mix_sample(
    df, key_col: str, strata_col: str, alpha: float = 0.5, seed: str = ""
) -> "DataFrame":
    """Temperature-scaled domain mixing: target stratum shares
    p_s ∝ (n_s/N)^alpha (alpha < 1 flattens the source distribution —
    the multilingual/domain rebalancing rule every pretraining mix
    uses), realized as per-row keep rates rate_s = (n_min/n_s)^(1-α)
    so the SMALLEST stratum keeps everything and larger strata
    down-sample toward the tempered shares. Unlike
    ``stratified_hash_sample`` the rates come from the DATA (one tiny
    count aggregate, broadcast back), not a literal map — the mix
    recomputes itself as the corpus drifts.

    Shape at 100 TB: one map-side-combined count per stratum (rows =
    #strata), a broadcast join of those counts, and the same
    deterministic md5 predicate as ``hash_sample`` — the corpus
    itself is filtered in the scan stage, never shuffled.

    Determinism: with the default ``alpha=0.5`` the rate is
    ``sqrt(n_min/n_s)`` — IEEE sqrt and division are correctly
    rounded, so Spark and an external SQL engine derive bit-identical
    thresholds. Other alphas go through ``pow``, whose last ulp is
    implementation-defined: fine for production, but pin alpha=0.5
    anywhere a cross-engine hash check replays the rates.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    # NULL-stratum rows are EXCLUDED from both the rate fit and the
    # output: a NULL group would otherwise set n_min (collapsing every
    # real stratum's keep rate toward zero) while its own rows drop
    # anyway — NULL never equi-joins its rate row and the threshold
    # comparison evaluates NULL. Assign strata upstream to keep them.
    df = df.filter(F.col(strata_col).isNotNull())
    counts = df.groupBy(F.col(strata_col).alias("__s")).agg(
        F.count(F.lit(1)).alias("__ns")
    )
    nmin = counts.agg(F.min("__ns").alias("__nmin"))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        "__s",
        (
            F.lit(1.0)
            if alpha >= 1.0
            else (
                F.sqrt(F.col("__nmin") / F.col("__ns"))
                if alpha == 0.5
                else F.pow(
                    F.col("__nmin") / F.col("__ns"), F.lit(1.0 - alpha)
                )
            )
        ).alias("__rate"),
    )
    # full-keep sentinel: a rate of 1.0 would format as "100000000",
    # which sorts BELOW "2…"-leading hashes lexicographically — use
    # "g" (sorts above every hex digit), the stratified sampler's trick
    thr = F.when(F.col("__rate") >= 1.0, F.lit("g")).otherwise(
        F.format_string(
            "%08x",
            F.floor(F.col("__rate") * F.lit(4294967296.0)).cast("long"),
        )
    )
    h = F.substring(
        F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string"))), 1, 8
    )
    return (
        df.join(
            F.broadcast(rates), F.col(strata_col) == F.col("__s"), "left"
        )
        .filter(h < thr)
        .drop("__s", "__rate")
    )


def gopher_rules(df, text_col: str, id_col: str) -> "DataFrame":
    """Gopher-style per-document quality rule battery (Rae et al.
    2021, §A1.1, adapted to the rules expressible as pure relational
    expressions): named boolean verdicts per rule plus the metrics
    behind them, so a curation pipeline can report WHY a document was
    dropped, not just a blended score (``quality_score`` is the
    blended-scalar sibling).

    Rules: word count in [50, 100k]; mean word length in [3, 10];
    symbol-to-word ratio (#, …) <= 0.1; >= 80% of words contain an
    alphabetic character; >= 2 distinct English stopwords present;
    <= 90% of lines start with a bullet; <= 30% of lines end with an
    ellipsis. Every metric is a Column expression over the split word
    / line arrays — one scan-stage map, no shuffle, no UDF; ratios
    are exact rational comparisons (count·denominator vs bound·
    numerator stays integral where the bound is rational) so both
    engines agree at the boundary."""
    c = F.col(text_col)
    ws = F.filter(words(c), lambda w: w != "")
    n_words = F.size(ws)
    # lines from the RAW text (normalization collapses newlines)
    lines = F.filter(
        F.transform(
            F.split(c.cast("string"), "\n"), lambda l: F.trim(l)
        ),
        lambda l: l != "",
    )
    n_lines = F.size(lines)
    n_chars = F.aggregate(
        ws, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
    )
    n_symbols = (
        F.size(F.split(c.cast("string"), "#", -1))
        - 1
        + F.size(F.split(c.cast("string"), r"\.\.\.", -1))
        - 1
    )
    n_alpha_words = F.size(F.filter(ws, lambda w: w.rlike("[a-z]")))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop_distinct = F.size(
        F.array_intersect(F.array_distinct(ws), sw)
    )
    n_bullet = F.size(
        F.filter(lines, lambda l: l.rlike("^[-*•]"))
    )
    n_ellipsis = F.size(
        F.filter(lines, lambda l: l.rlike("\\.\\.\\.$"))
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_words.alias("n_words"),
        n_chars.alias("n_chars"),
        n_lines.alias("n_lines"),
        ((n_words >= 50) & (n_words <= 100_000)).alias("ok_word_count"),
        # 3 <= chars/words <= 10  ->  3*words <= chars <= 10*words
        (
            (n_chars >= 3 * n_words) & (n_chars <= 10 * n_words)
        ).alias("ok_mean_word_len"),
        # symbols/words <= 0.1  ->  10*symbols <= words
        (n_symbols * 10 <= n_words).alias("ok_symbol_ratio"),
        # alpha words / words >= 0.8  ->  5*alpha >= 4*words
        (n_alpha_words * 5 >= n_words * 4).alias("ok_alpha_words"),
        (n_stop_distinct >= 2).alias("ok_stopwords"),
        # bullet lines / lines <= 0.9  ->  10*bullets <= 9*lines
        (n_bullet * 10 <= n_lines * 9).alias("ok_bullets"),
        # ellipsis lines / lines <= 0.3  ->  10*ellipsis <= 3*lines
        (n_ellipsis * 10 <= n_lines * 3).alias("ok_ellipsis"),
    ).withColumn(
        "keep",
        F.col("ok_word_count")
        & F.col("ok_mean_word_len")
        & F.col("ok_symbol_ratio")
        & F.col("ok_alpha_words")
        & F.col("ok_stopwords")
        & F.col("ok_bullets")
        & F.col("ok_ellipsis"),
    )


def bigram_nll_scores(
    df, text_col: str, id_col: str, lam: float = 0.5, alpha: float = 0.5
) -> "DataFrame":
    """Fluency scoring against a self-trained INTERPOLATED BIGRAM LM:
    per-document mean negative log-likelihood of its word bigrams
    under p(w2|w1) = λ·(c(w1w2)+α)/(c(w1)+αV) + (1−λ)·(c(w2)+α)/(N+αV)
    — the next step up from ``unigram_nll_scores`` (which a run-on
    word-salad document can fool: every token common, every
    transition absurd; the bigram term catches broken word ORDER).

    Shape: one explode builds the bigram stream (adjacent pairs from
    the word array — a transform over indices, not a self-join); two
    count aggregations (bigram, unigram — both map-side combined)
    build the LM; the scoring pass joins each bigram against the two
    count tables, UNHINTED so AQE broadcasts them at runtime when
    their materialized size is actually small and keeps a shuffled
    join when the bigram vocabulary outgrows it (a hard ``broadcast``
    hint is never demoted — fatal for a corpus-derived table whose
    size the optimizer cannot estimate).

    Determinism: same policy as the unigram twin — each bigram's nll
    quantizes to 1e-6 (round(-ln p · 1e6) → int64) BEFORE the
    per-document sum, so aggregation is exact integer addition and
    the mean one integer-by-double division.

    Documents with < 2 words produce no output row (no transitions).
    Returns (id_col, n_bigrams, avg_nll)."""
    base = df.select(
        F.col(id_col),
        F.filter(words(F.col(text_col)), lambda w: w != "").alias("ws"),
    ).filter(F.size("ws") >= 2)
    bigrams = base.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.struct(
                    F.element_at("ws", i).alias("w1"),
                    F.element_at("ws", i + 1).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select(F.col(id_col), "bg.w1", "bg.w2")
    uni = (
        base.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    bi = bigrams.groupBy(
        F.col("w1").alias("__bw1"), F.col("w2").alias("__bw2")
    ).agg(F.count(F.lit(1)).alias("c12"))
    stats = uni.agg(
        F.sum("c1").alias("total"), F.count(F.lit(1)).alias("v")
    )
    u1 = uni.select(F.col("w").alias("__u1"), F.col("c1").alias("c_w1"))
    u2 = uni.select(F.col("w").alias("__u2"), F.col("c1").alias("c_w2"))
    p = F.lit(lam) * (
        (F.col("c12") + F.lit(alpha))
        / (F.col("c_w1") + F.lit(alpha) * F.col("v"))
    ) + F.lit(1.0 - lam) * (
        (F.col("c_w2") + F.lit(alpha))
        / (F.col("total") + F.lit(alpha) * F.col("v"))
    )
    nll_q = F.round(-F.log(p) * 1e6).cast("long")
    scored = (
        bigrams.join(
            bi,
            (F.col("w1") == F.col("__bw1")) & (F.col("w2") == F.col("__bw2")),
        )
        .join(u1, F.col("w1") == F.col("__u1"))
        .join(u2, F.col("w2") == F.col("__u2"))
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum(nll_q).alias("s"))
    )
    return scored.select(
        F.col(id_col),
        "n_bigrams",
        (F.col("s") / (F.lit(1e6) * F.col("n_bigrams"))).alias("avg_nll"),
    )


def sample_match_distribution(
    df,
    key_col: str,
    bucket: "Column",
    target: "Column",
    seed: str = "ld",
) -> "DataFrame":
    """Distribution-matched sampling: keep a deterministic subset of
    ``df`` whose BUCKET histogram is proportional to the ``target``
    subset's histogram — the curation move when a raw crawl's length
    (or domain, or quality-band) mix must match a reference mix
    without discarding more than necessary.

    Rate derivation (exact integer arithmetic, so both engines agree
    to the bit): with corpus counts c_b and target counts t_b, the
    binding bucket maximizes t_b/c_b (computed as the DECIMAL(38,0)
    quotient q_b = t_b·10^12 div c_b; max, ties irrelevant — equal
    q means equal rate); keep-rate r_b = (t_b/c_b)/(q_max/10^12),
    materialized as the integer threshold
    thr_b = min(16^8, t_b·16^8·10^12 div (c_b·q_max)) and applied as
    the pure per-row predicate md5int(seed‖key) < thr_b. The binding
    bucket keeps ~100% and every other bucket keeps the fraction
    that equalizes the mix — no corpus shuffle, the histogram join
    is a broadcast of a bounded bucket table, and selection is
    reproducible across runs/engines/cluster sizes (the
    ``hash_sample`` family contract).

    Buckets with zero target mass are dropped entirely (rate 0).
    Returns the kept rows of ``df`` with an added ``__bucket``
    column."""
    hist = (
        df.select(bucket.alias("__bucket"), target.alias("__t"))
        .groupBy("__bucket")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("t"),
        )
    )
    # EXACT integer division (DIV), not decimal '/' + floor: Spark
    # rounds a decimal quotient HALF_UP to the result scale (6
    # fractional digits here) BEFORE floor, so a true quotient within
    # ~5e-7 below an integer floors one higher than DuckDB's exact
    # HUGEINT '//' twin. Needs a >~2M-row bucket to bite, so only the
    # 100 TB contract sees it — same pitfall already fixed with DIV in
    # corpusstats.ks_two_sample / zipf_slope.
    P = 10**12
    q = F.expr(
        f"(CAST(t AS DECIMAL(38,0)) * {P}) DIV CAST(c AS DECIMAL(38,0))"
    ).cast("decimal(38,0)")
    hist = hist.withColumn("__q", q)
    qmax = hist.agg(F.max("__q").alias("__qmax"))
    thr = F.least(
        F.lit(16**8).cast("decimal(38,0)"),
        F.expr(
            f"(CAST(t AS DECIMAL(38,0)) * {16 ** 8} * {P}) "
            "DIV (CAST(c AS DECIMAL(38,0)) * CAST(__qmax AS DECIMAL(38,0)))"
        ).cast("decimal(38,0)"),
    )
    rates = F.broadcast(
        hist.crossJoin(F.broadcast(qmax))
        .filter(F.col("t") > 0)
        .select("__bucket", thr.cast("long").alias("__thr"))
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return (
        df.withColumn("__bucket", bucket)
        .join(rates, "__bucket")
        .filter(h < F.col("__thr"))
        .drop("__thr")
    )


def weighted_sample_topk(
    df, key_col: str, weight: "Column", n: int, seed: str = "gk"
) -> "DataFrame":
    """EXACT-SIZE weighted sampling without replacement (Efraimidis &
    Spirakis, IPL 2006 A-Res: key_i = u_i^(1/w_i), keep the n largest
    keys — each subset's selection probability matches sequential
    weighted draws without replacement). The Bernoulli samplers in
    this module (``hash_sample`` family) cannot pin the output SIZE;
    this one returns exactly n rows (or all rows with positive
    weight, if fewer).

    Deterministic and cross-engine exact: u_i = (md5int(seed‖key)+1)
    / (16^8+1) ∈ (0,1), and the ranking key is ln(u)/w QUANTIZED to
    1e-9 (int64) — ln of a dyadic rational and one division evaluate
    identically on both engines, and ties break on the row key.
    Selection is a pure projection + sort-limit (TakeOrdered: per-
    partition top-n heaps, no global sort shuffle). Rows with
    weight <= 0 are never selected (filtered; a zero-weight row has
    selection probability 0 in the limit anyway).

    Returns the sampled rows with ``__w`` (the weight used) and
    ``__lkey_q`` (the quantized ranking key) attached."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(16**8 + 1))
    lkey_q = F.round(F.log(u) / weight.cast("double") * 1e9).cast("long")
    return (
        df.withColumn("__w", weight)
        .filter(F.col("__w") > 0)
        .withColumn("__lkey_q", lkey_q)
        .orderBy(F.col("__lkey_q").desc(), F.col(key_col).asc())
        .limit(n)
    )


def stratified_exact_sample(
    df, key_col: str, strata_col: str, n_per_stratum: int, seed: str = "ps"
) -> "DataFrame":
    """EXACT-SIZE per-stratum sampling: exactly ``n_per_stratum`` rows
    from every stratum (or the whole stratum, if smaller) — the
    balanced eval-set / per-domain-audit primitive the rate-based
    ``stratified_hash_sample`` cannot provide (a rate pins the
    expectation, not the count).

    Selection is rank-by-deterministic-hash within each stratum:
    row_number() over (partition by stratum order by md5(seed‖key),
    key) <= n. One shuffle on the stratum key, partition-count
    invariant, reproducible across engines (md5 is the shared
    uniform; the key breaks md5 ties, so the sample is unique even
    under hash collisions). At 100 TB this is the same shuffle any
    per-stratum top-k needs; skewed strata cost their row count, not
    a cross product.

    Returns the sampled rows plus ``__rank`` (1-based rank within the
    stratum)."""
    from pyspark.sql import Window

    if n_per_stratum < 1:
        raise ValueError(f"n_per_stratum must be >= 1, got {n_per_stratum}")
    h = F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string")))
    w = Window.partitionBy(F.col(strata_col)).orderBy(
        h.asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= n_per_stratum)
    )


def token_budget_select(
    df, id_col: str, score, tokens, budget: int
) -> "DataFrame":
    """Token-budget-constrained corpus selection: keep the
    highest-scored documents whose token counts fit a global budget —
    'the best N-billion-token subset' — WITHOUT a global sort.

    Two-pass threshold design (the 100 TB shape): (1) aggregate token
    mass per distinct score grade (map-side combine; the corpus
    reduces to |grades| rows), cumulative-sum the grades best-first to
    find the boundary grade where the budget runs out; (2) join the
    (broadcast-sized) grade table back — grades wholly under budget
    keep every document with no per-row ordering at all; only the ONE
    boundary grade ranks its documents (by id, deterministic) and
    keeps a prefix. Grade scores finely (integer millis, not 1-10) so
    the boundary grade stays small — the within-grade window is the
    only per-row ordered step.

    ``score`` and ``tokens`` must be integer Columns (exact
    cumulative arithmetic; quantize a float score first). Documents
    with tokens <= 0 are never selected. Returns
    ``(id, score, n_tok)`` of the selected set."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col).alias("id"),
        score.cast("long").alias("score"),
        tokens.cast("long").alias("n_tok"),
    ).filter(F.col("n_tok") > 0)
    grades = base.groupBy("score").agg(F.sum("n_tok").alias("__gtok"))
    w = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    lim = (
        grades.withColumn("__cum", F.sum("__gtok").over(w))
        .withColumn("__before", F.col("__cum") - F.col("__gtok"))
        .select("score", "__before", "__cum")
    )
    joined = base.join(F.broadcast(lim), "score")
    full = joined.filter(F.col("__cum") <= budget)
    w2 = Window.partitionBy("score").orderBy(F.col("id").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    boundary = (
        joined.filter((F.col("__before") < budget) & (F.col("__cum") > budget))
        .withColumn("__dcum", F.sum("n_tok").over(w2))
        .filter(F.col("__before") + F.col("__dcum") <= budget)
        .drop("__dcum")
    )
    return full.unionByName(boundary).select("id", "score", "n_tok")


def mlm_mask(
    df,
    text_col: str,
    id_col: str,
    rate: float = 0.15,
    mask_token: str = "[MASK]",
    seed: str = "mm",
) -> "DataFrame":
    """Denoising-corpus preparation (BERT-style masked LM): replace a
    deterministic ~``rate`` fraction of whitespace tokens with
    ``mask_token`` and emit the masked text, the ordered list of
    masked (position, original) targets, and the mask count.

    Selection is per-(document, position) via md5 — reproducible
    across runs, engines, and partitionings, and INDEPENDENT per
    position (no RNG stream to keep in sync). The whole op is
    higher-order array functions over the token array — zero explode,
    zero shuffle, zero UDF: at 100 TB it runs at parquet-scan speed in
    whole-stage codegen, and the targets column serializes to JSON so
    downstream (and the SQL oracle) compare it exactly.

    Returns ``(id, masked_text, targets_json, n_masked)``; ``targets``
    are ``pos:token`` strings in position order (0-based)."""
    if not 0.0 < rate < 1.0:
        raise ValueError(f"rate must be in (0,1), got {rate}")
    thr = format(int(rate * 16**8), "08x")

    def is_masked(i: Column) -> Column:
        # i is the 0-based position; hash (seed, id, pos)
        return (
            F.substring(
                F.md5(
                    F.concat_ws(
                        "\x1f",
                        F.lit(seed),
                        F.col(id_col).cast("string"),
                        i.cast("string"),
                    )
                ),
                1,
                8,
            )
            < F.lit(thr)
        )

    ws = words(F.col(text_col))
    idx = F.sequence(F.lit(0), F.size(ws) - 1)
    masked = F.zip_with(
        ws,
        idx,
        lambda w, i: F.when(is_masked(i), F.lit(mask_token)).otherwise(w),
    )
    targets = F.filter(
        F.zip_with(
            ws,
            idx,
            lambda w, i: F.when(
                is_masked(i), F.concat(i.cast("string"), F.lit(":"), w)
            ).otherwise(F.lit(None)),
        ),
        lambda x: x.isNotNull(),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.array_join(masked, " ").alias("masked_text"),
        F.to_json(targets).alias("targets_json"),
        F.size(targets).alias("n_masked"),
    )


def span_corrupt(
    df,
    text_col: str,
    id_col: str,
    start_rate: float = 0.05,
    seed: str = "sc",
) -> "DataFrame":
    """T5-style span corruption: replace contiguous token spans with
    numbered sentinels and emit the (input, target) pair — the
    denoising-objective companion to ``mlm_mask`` for encoder-decoder
    training corpora.

    Span selection is deterministic per (document, position): a
    position starts a span when md5(seed‖id‖pos) falls under
    ``start_rate``; the span length is 2-4 tokens drawn from the next
    hash nibble mod 3 — NOT uniform: 16 nibble values over 3 residues
    give lengths 2/3/4 probabilities 6/16, 5/16, 5/16 (mean 2.9375),
    so the realized corruption rate at the default is ~14.7%, slightly
    under the nominal 15%. The mild bias is harmless (the oracle
    replays the same draw bit-for-bit) and cheaper than a two-nibble
    rejection-free draw. Overlapping
    spans MERGE into one (the T5 non-overlap constraint, realized as
    interval union — same running-max trick as the repeated-span
    remover). Sentinels number left to right: input keeps clean tokens
    and one ``<extra_id_k>`` per merged span; target lists each
    sentinel followed by the tokens it hides, closed by the final
    sentinel.

    Shape: posexplode + three window passes over (doc, position) —
    ONE shuffle on the doc id, linear per document, engine-replayable
    (running max / running sum / string_agg all exist in ANSI SQL).
    Returns ``(id, corrupted, target, n_spans)``."""
    if not 0.0 < start_rate < 1.0:
        raise ValueError(f"start_rate must be in (0,1), got {start_rate}")
    from pyspark.sql import Window

    thr = format(int(start_rate * 16**8), "08x")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(words(F.col(text_col))).alias("pos", "tok"),
    )
    h = F.md5(
        F.concat_ws(
            "\x1f", F.lit(seed), F.col("id").cast("string"),
            F.col("pos").cast("string"),
        )
    )
    # span start + its reach (exclusive end): pos + 2..4 tokens
    marked = toks.withColumn(
        "__reach",
        F.when(
            F.substring(h, 1, 8) < F.lit(thr),
            F.col("pos")
            + 2
            + F.conv(F.substring(h, 9, 1), 16, 10).cast("int") % 3,
        ).otherwise(F.lit(-1)),
    )
    w_cum = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_prev = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cov = (
        marked.withColumn(
            "__covered", F.max("__reach").over(w_cum) > F.col("pos")
        )
        .withColumn(
            "__new_span",
            F.col("__covered")
            & ~F.coalesce(
                (F.max("__reach").over(w_prev) > F.col("pos")), F.lit(False)
            ),
        )
        .withColumn(
            "__span_id",
            F.sum(F.col("__new_span").cast("int")).over(w_cum),
        )
    )
    sentinel = F.concat(
        F.lit("<extra_id_"), (F.col("__span_id") - 1).cast("string"), F.lit(">")
    )
    # input: clean tokens verbatim, one sentinel at each span head,
    # nothing for span continuation positions
    inp_piece = F.when(~F.col("__covered"), F.col("tok")).when(
        F.col("__new_span"), sentinel
    )
    # target: sentinel ahead of each span's tokens, then the span tokens
    tgt_piece = F.when(
        F.col("__covered"),
        F.when(
            F.col("__new_span"), F.concat(sentinel, F.lit(" "), F.col("tok"))
        ).otherwise(F.col("tok")),
    )
    agg = cov.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            inp_piece.isNotNull(),
                            F.struct(F.col("pos"), inp_piece.alias("p")),
                        )
                    )
                ),
                lambda s: s["p"],
            ),
            " ",
        ).alias("__inp"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            tgt_piece.isNotNull(),
                            F.struct(F.col("pos"), tgt_piece.alias("p")),
                        )
                    )
                ),
                lambda s: s["p"],
            ),
            " ",
        ).alias("__tgt"),
        F.max("__span_id").cast("long").alias("n_spans"),
    )
    closing = F.concat(
        F.lit("<extra_id_"), F.col("n_spans").cast("string"), F.lit(">")
    )
    return agg.select(
        "id",
        F.col("__inp").alias("corrupted"),
        F.when(
            F.col("n_spans") > 0, F.concat(F.col("__tgt"), F.lit(" "), closing)
        )
        .otherwise(closing)
        .alias("target"),
        "n_spans",
    )


def script_profile(c: Column) -> list[Column]:
    """Per-document writing-script composition over normalized text
    (whitespace excluded): counts of basic-Latin letters, digits,
    Cyrillic, CJK-unified and everything else, plus the dominant
    script label. The language-ID companion for MIXED-script corpora:
    an n-gram language model is blind until the text is routed to the
    right script pipeline (word shingles for Latin/Cyrillic,
    char shingles for CJK — see ``char_shingles``), and a
    high "other" share is itself a quality signal (mojibake, math
    spam, encoding damage).

    Counts are length-after-stripping-the-complement — one
    regexp_replace per class over explicit code-point ranges (the
    same ranges an RE2-based oracle replays; \\p{} class NAMES
    diverge across regex engines, raw ranges do not). Pure scan-stage
    Column expressions; zero shuffle.

    Returns [n_chars, n_latin, n_digit, n_cyrillic, n_cjk, n_other,
    dominant] — alias and select at the call site."""
    norm = F.regexp_replace(
        F.lower(c.cast("string")), r"\s+", ""
    )

    def cnt(rng: str) -> Column:
        return F.length(F.regexp_replace(norm, f"[^{rng}]", ""))

    n_all = F.length(norm)
    n_latin = cnt("a-z")
    n_digit = cnt("0-9")
    n_cyr = cnt("Ѐ-ӿ")
    n_cjk = cnt("一-鿿")
    n_other = n_all - n_latin - n_digit - n_cyr - n_cjk
    dominant = (
        F.when(n_all == 0, F.lit("empty"))
        .when(
            (n_latin >= n_cyr) & (n_latin >= n_cjk) & (n_latin >= n_digit)
            & (n_latin >= n_other),
            F.lit("latin"),
        )
        .when((n_cyr >= n_cjk) & (n_cyr >= n_digit) & (n_cyr >= n_other),
              F.lit("cyrillic"))
        .when((n_cjk >= n_digit) & (n_cjk >= n_other), F.lit("cjk"))
        .when(n_digit >= n_other, F.lit("digit"))
        .otherwise(F.lit("other"))
    )
    return [n_all, n_latin, n_digit, n_cyr, n_cjk, n_other, dominant]


def tokenizer_fertility(
    df, text_col: str, group_col: str
) -> "DataFrame":
    """Per-group tokenizer fertility diagnostics: how many subword
    tokens the (BPE-ish) tokenizer spends per whitespace word, and
    how many characters each token carries. THE go/no-go metric when
    choosing a tokenizer for a data mix — fertility creep on a
    domain (code, non-English) silently multiplies its training cost
    — and the per-source table is what a data card reports.

    One aggregation: sums of whitespace words, subword pieces
    (``token_count_bpe_ish``) and non-space characters per group;
    ratios as exact integer ppm (DIV, zero-guarded) so the oracle
    replays them bit-for-bit. Map-side combinable, shuffle carries
    one row per group.

    Returns (group, n_docs, n_words, n_tokens, n_chars,
    fertility_ppm, chars_per_token_ppm)."""
    nonblank = F.filter(words(F.col(text_col)), lambda w: w != "")
    n_chars = F.length(
        F.regexp_replace(F.lower(F.col(text_col).cast("string")), r"\s+", "")
    )
    return (
        df.groupBy(F.col(group_col).alias("group"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(nonblank)).cast("long").alias("n_words"),
            F.sum(token_count_bpe_ish(F.col(text_col))).cast("long").alias(
                "n_tokens"
            ),
            F.sum(n_chars).cast("long").alias("n_chars"),
        )
        .select(
            "group", "n_docs", "n_words", "n_tokens", "n_chars",
            F.expr(
                "(n_tokens * CAST(1000000 AS BIGINT)) DIV greatest(n_words, 1)"
            ).alias("fertility_ppm"),
            F.expr(
                "(n_chars * CAST(1000000 AS BIGINT)) DIV greatest(n_tokens, 1)"
            ).alias("chars_per_token_ppm"),
        )
    )


def flesch_readability(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Flesch reading-ease per document (Flesch 1948; the classic
    readability signal a quality-filter mix reports alongside the
    Gopher rules): ``206.835 - 1.015*(words/sentences) -
    84.6*(syllables/word)``, here in exact integer MILLI-points —
    ``206835 - (1015*W) DIV S - (84600*Y) DIV W`` — so both engines
    replay the score bit-for-bit (no float division).

    Approximations, stated: sentences = count of ``[.!?]+`` runs
    (min 1 — trailing unterminated text rides the last run);
    syllables = count of ``[aeiouy]+`` vowel runs in the lowercased
    text (vowel runs cannot cross whitespace, so no tokenization is
    needed; no per-word 1-syllable floor — an all-consonant token
    counts zero, which biases scores slightly readable on
    acronym-heavy text).

    Scan-stage only: three regexp counts per row, zero shuffles, zero
    joins — at 100 TB this runs at parquet-scan speed inside
    whole-stage codegen.

    Returns (id, n_words, n_sentences, n_syllables, flesch_milli).
    """
    txt = F.col(text_col).cast("string")
    w = F.size(F.filter(words(txt), lambda x: x != ""))
    s = F.greatest(
        F.size(F.regexp_extract_all(txt, F.lit(r"[.!?]+"), 0)), F.lit(1)
    )
    y = F.size(F.regexp_extract_all(F.lower(txt), F.lit(r"[aeiouy]+"), 0))
    return df.select(
        F.col(id_col).alias("id"),
        w.cast("long").alias("n_words"),
        s.cast("long").alias("n_sentences"),
        y.cast("long").alias("n_syllables"),
    ).withColumn(
        "flesch_milli",
        F.expr(
            "CAST(206835 AS BIGINT)"
            " - (1015 * n_words) DIV n_sentences"
            " - (84600 * n_syllables) DIV greatest(n_words, 1)"
        ),
    )


def stupid_backoff_scores(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Corpus-trained trigram STUPID BACKOFF fluency score per
    document (Brants et al., EMNLP 2007 — the LM-scoring scheme built
    for exactly this setting: web-scale counts, no held-out
    normalization): each token scores ``c(w2 w1 w)/c(w2 w1)`` when the
    trigram was seen, else ``0.4 * c(w1 w)/c(w1)``, else
    ``0.4^2 * c(w)/T``; tokens with a SHORTER available context (doc
    positions 0 and 1) start at their longest order without the
    backoff penalty. Every per-token score is an exact integer ppm
    (0.4 = 2/5, so the three branches are ``(c*1M) DIV ctx``,
    ``(2*c*1M) DIV (5*ctx)``, ``(4*c*1M) DIV (25*T)``) and the
    document score is their int64 sum — bit-replayable on any engine,
    no logs, no float accumulation order.

    Shape at scale: one window per doc (lag 1/2 over position) = one
    shuffle on doc id; three count aggregations (uni/bi/trigram — all
    map-side combinable, keys are the grams); then LEFT joins from
    the token stream back to the count tables, each keyed on its
    gram — hot grams are join keys, not groupBy skew. Corpus total T
    rides a one-row broadcast (nested-loop on a literal row, the
    fixed-cell pattern). Nothing is collected; vocabulary never sits
    on the driver.

    Returns (id, n_tokens, fluency_ppm_sum).
    """
    from pyspark.sql import Window

    toks = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(
                F.filter(words(F.col(text_col)), lambda x: x != "")
            ).alias("pos", "w"),
        )
    )
    wd = Window.partitionBy("id").orderBy("pos")
    grams = toks.select(
        "id", "pos", "w",
        F.lag("w", 1).over(wd).alias("w1"),
        F.lag("w", 2).over(wd).alias("w2"),
    )
    uni = grams.groupBy("w").agg(F.count(F.lit(1)).alias("cw"))
    bi = (
        grams.filter(F.col("w1").isNotNull())
        .groupBy("w1", "w")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    tri = (
        grams.filter(F.col("w2").isNotNull())
        .groupBy("w2", "w1", "w")
        .agg(F.count(F.lit(1)).alias("c123"))
    )
    total = uni.agg(F.sum("cw").cast("long").alias("T"))
    scored = (
        grams
        .join(tri, ["w2", "w1", "w"], "left")
        .join(
            bi.select(
                F.col("w1").alias("w2"), F.col("w").alias("w1"),
                F.col("c12").alias("c2a"),
            ),
            ["w2", "w1"], "left",
        )
        .join(bi, ["w1", "w"], "left")
        .join(
            uni.select(F.col("w").alias("w1"), F.col("cw").alias("c1ctx")),
            ["w1"], "left",
        )
        .join(uni, ["w"])
        .crossJoin(F.broadcast(total))
        .withColumn(
            "score_ppm",
            F.expr(
                """CASE
                   WHEN w2 IS NOT NULL AND c123 IS NOT NULL
                     THEN (c123 * CAST(1000000 AS BIGINT)) DIV c2a
                   WHEN w2 IS NOT NULL AND c12 IS NOT NULL
                     THEN (2 * c12 * CAST(1000000 AS BIGINT)) DIV (5 * c1ctx)
                   WHEN w2 IS NOT NULL
                     THEN (4 * cw * CAST(1000000 AS BIGINT)) DIV (25 * T)
                   WHEN w1 IS NOT NULL AND c12 IS NOT NULL
                     THEN (c12 * CAST(1000000 AS BIGINT)) DIV c1ctx
                   WHEN w1 IS NOT NULL
                     THEN (2 * cw * CAST(1000000 AS BIGINT)) DIV (5 * T)
                   ELSE (cw * CAST(1000000 AS BIGINT)) DIV T
                   END"""
            ),
        )
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("score_ppm").cast("long").alias("fluency_ppm_sum"),
    )


def code_signals(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Code-vs-prose signals per document — the router a mixed crawl
    needs before tokenization (code wants a different tokenizer,
    different quality rules, different dedup granularity): symbol
    density (``{}();=<>[]`` characters per char), digit density, and
    programming-keyword hits (``def class return import for while if
    else``, word-bounded). The boolean gate is the standard cheap
    router: symbol density above 2% OR >= 3 keyword hits.

    All counts are regexp counts over the raw text — scan-stage
    column arithmetic, zero shuffles — and the densities are exact
    integer ppm (DIV), so both engines replay the gate bit-for-bit.

    Returns (id, n_chars, symbol_ppm, digit_ppm, kw_hits, is_code).
    """
    txt = F.col(text_col).cast("string")
    n_chars = F.length(txt)
    sym = F.size(
        F.regexp_extract_all(txt, F.lit(r"[{}();=<>\[\]]"), 0)
    ).cast("long")
    dig = F.size(F.regexp_extract_all(txt, F.lit(r"[0-9]"), 0)).cast("long")
    kw = F.size(
        F.regexp_extract_all(
            F.lower(txt),
            F.lit(r"\b(def|class|return|import|for|while|if|else)\b"),
            0,
        )
    ).cast("long")
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.cast("long").alias("n_chars"),
        sym.alias("__sym"),
        dig.alias("__dig"),
        kw.alias("kw_hits"),
    ).select(
        "id",
        "n_chars",
        F.expr(
            "(__sym * CAST(1000000 AS BIGINT)) DIV greatest(n_chars, 1)"
        ).alias("symbol_ppm"),
        F.expr(
            "(__dig * CAST(1000000 AS BIGINT)) DIV greatest(n_chars, 1)"
        ).alias("digit_ppm"),
        "kw_hits",
        F.expr(
            "((__sym * CAST(1000000 AS BIGINT)) DIV greatest(n_chars, 1))"
            " > 20000 OR kw_hits >= 3"
        ).alias("is_code"),
    )


def top_keywords(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> "DataFrame":
    """Per-document top-k keyword extraction by tf x linear-idf:
    score = tf * ((N * 1e6) DIV df) — the LINEAR inverse-document-
    frequency variant (not log-idf): rank-equivalent for fixed tf,
    deliberately harsher on corpus-common terms, and — the reason it
    is the variant here — EXACT in integers, so both engines replay
    the selection bit-for-bit (log-idf would put a float ln() inside
    a ranking comparison, the one place an ulp flips output rows).

    Shape: token explode -> per-(doc, word) tf (one agg) -> per-word
    df (one agg over distinct doc-word pairs, reusing the tf table) ->
    N as a one-row broadcast -> per-doc top-k window (ties: score
    desc, word asc) -> ordered collect to a '|'-joined string (a
    string, not an array — array cells don't sort/hash in downstream
    frames). Three shuffles, all keyed.

    Returns (id, keywords, top_score) — keywords = 'w1|w2|...'.
    """
    from pyspark.sql import Window

    tf = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.filter(words(F.col(text_col)), lambda w: w != "")
            ).alias("w"),
        )
        .groupBy("id", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n_docs = tf.select("id").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("N")
    )
    scored = (
        tf.join(dfreq, "w")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.expr("tf * ((N * CAST(1000000 AS BIGINT)) DIV df)"),
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score").desc(), F.col("w").asc()
    )
    top = scored.withColumn("__rk", F.row_number().over(w)).filter(
        F.col("__rk") <= k
    )
    return top.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("__rk", "w"))),
                lambda s: s["w"],
            ),
            "|",
        ).alias("keywords"),
        F.max("score").cast("long").alias("top_score"),
    )


def pmi_collocations(
    df, text_col: str, min_count: int = 5, k: int = 100
) -> "DataFrame":
    """Corpus-level collocation mining by pointwise mutual
    information: rank adjacent word pairs by how much more often
    they co-occur than their positional marginals predict,
    ``lift(x,y) = N·c(xy) / (c_left(x)·c_right(y))`` — the exact
    integer MONOTONE TRANSFORM of PMI (PMI = log lift), reported in
    ppm via DECIMAL(38,0) DIV so no engine ever takes a log. Both
    marginals come from the bigram stream itself (count as first /
    second element), keeping the ratio a self-consistent probability
    estimate. ``min_count`` suppresses the degenerate
    one-occurrence pairs whose lift is maximal by construction
    (the standard collocation floor, Church & Hanks 1990).

    Shape: one explode builds the bigram stream; three count
    aggregations (pair, left marginal, right marginal — all
    map-side combined); marginal joins stay UNHINTED so AQE
    broadcasts the vocabulary tables only when they are actually
    small (same policy as bigram_nll_scores); TakeOrdered top-k on
    the deterministic (lift desc, w1, w2) total order — never a
    global sort.

    Returns the top-k rows (w1, w2, pair_count, lift_ppm).
    """
    base = df.select(
        F.filter(words(F.col(text_col)), lambda w: w != "").alias("ws")
    ).filter(F.size("ws") >= 2)
    bigrams = base.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.struct(
                    F.element_at("ws", i).alias("w1"),
                    F.element_at("ws", i + 1).alias("w2"),
                ),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    bi = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("pair_count")
    )
    left = bigrams.groupBy(F.col("w1").alias("__l")).agg(
        F.count(F.lit(1)).cast("long").alias("c_left")
    )
    right = bigrams.groupBy(F.col("w2").alias("__r")).agg(
        F.count(F.lit(1)).cast("long").alias("c_right")
    )
    total = bigrams.agg(F.count(F.lit(1)).cast("long").alias("n_bg"))
    scored = (
        bi.filter(F.col("pair_count") >= min_count)
        .join(left, F.col("w1") == F.col("__l"))
        .join(right, F.col("w2") == F.col("__r"))
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "pair_count",
            F.expr(
                "CAST((CAST(pair_count AS DECIMAL(38,0)) * n_bg"
                " * 1000000) DIV (CAST(c_left AS DECIMAL(38,0))"
                " * c_right) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )
    return scored.orderBy(
        F.col("lift_ppm").desc(), F.col("w1"), F.col("w2")
    ).limit(k)


def kneser_ney_bigrams(
    df, text_col: str, k: int = 100, min_count: int = 5
) -> "DataFrame":
    """Interpolated Kneser-Ney bigram probabilities with the classic
    d = 0.75 discount, EXACT: quarter-unit arithmetic makes every
    term an integer —

        p_KN(w2|w1) = (c12 − ¾)⁺/c1 + (¾·T1/c1)·(C2/N)
                    = ((4·c12 − 3)⁺·N + 3·T1·C2) / (4·c1·N)

    where c1 = Σ_w c(w1,w), T1 = |{w : c(w1,w) > 0}| (the λ mass),
    C2 = |{w : c(w,w2) > 0}| (the continuation count — KN's insight:
    'francisco' is frequent but follows only 'san'), and N = number
    of distinct bigram TYPES. Reported in exact ppm via DECIMAL DIV;
    before flooring, Σ_w2 p(w2|w1) = 1 exactly (the unit test pins
    it). The real LM smoothing next to the stupid-backoff scorer —
    what a perplexity-quality gate should interpolate with (Kneser &
    Ney 1995; Chen & Goodman 1998).

    Shape: one explode to the bigram stream feeding ONE pair-count
    aggregation, which is PERSISTED before fanning out to its four
    consumers (left totals+types, continuation counts, the global
    type count, and the scored join) — without the cache Spark
    re-runs the explode + pair aggregation per consumer (measured:
    178 s -> ~30 s on the 1 M-doc corpus). The cache is tracked
    module-side like vsm's index (next call or release_kn_tables()
    unpersists — bounded to one cached relation per session). All
    marginal tables are type-cardinality; joins unhinted so AQE
    broadcasts them when small. Top-k rows by (pair count desc, w1,
    w2) via TakeOrdered.

    Returns (w1, w2, c12, pkn_ppm).
    """
    from pyspark import StorageLevel

    release_kn_tables()
    base = df.select(
        F.filter(words(F.col(text_col)), lambda w: w != "").alias("ws")
    ).filter(F.size("ws") >= 2)
    bigrams = base.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.struct(
                    F.element_at("ws", i).alias("w1"),
                    F.element_at("ws", i + 1).alias("w2"),
                ),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    bi = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    _KN_PERSISTED.append(bi)
    left = bi.groupBy(F.col("w1").alias("__l")).agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("t1"),
    )
    cont = bi.groupBy(F.col("w2").alias("__r")).agg(
        F.count(F.lit(1)).cast("long").alias("c2types"),
    )
    ntypes = bi.agg(F.count(F.lit(1)).cast("long").alias("n_types"))
    scored = (
        bi.filter(F.col("c12") >= min_count)
        .join(left, F.col("w1") == F.col("__l"))
        .join(cont, F.col("w2") == F.col("__r"))
        .crossJoin(F.broadcast(ntypes))
        .select(
            "w1", "w2", "c12",
            F.expr(
                "CAST(((greatest(4 * CAST(c12 AS DECIMAL(38,0)) - 3, 0)"
                " * n_types + 3 * CAST(t1 AS DECIMAL(38,0)) * c2types)"
                " * 1000000)"
                " DIV (4 * CAST(c1 AS DECIMAL(38,0)) * n_types)"
                " AS BIGINT)"
            ).alias("pkn_ppm"),
        )
    )
    return scored.orderBy(
        F.col("c12").desc(), F.col("w1"), F.col("w2")
    ).limit(k)


_KN_PERSISTED: list = []


def release_kn_tables() -> None:
    """Unpersist the pair-count tables cached by kneser_ney_bigrams.
    Safe while a prior result is un-executed: dropping the cache only
    forces a recompute, never changes the answer."""
    while _KN_PERSISTED:
        try:
            _KN_PERSISTED.pop().unpersist(blocking=False)
        except Exception:
            pass


def char_entropy(df, text_col: str, id_col: str) -> "DataFrame":
    """Per-document Shannon character entropy in milli-bits/char — the
    compressibility quality signal (near-zero entropy = repeated
    filler/padding; implausibly high = binary junk or encrypted blobs
    masquerading as text) that a quality gate reads next to the
    repetition and Gopher rules.

    H = log2(n) − (Σ_c cnt_c·log2(cnt_c))/n over the char histogram —
    the per-term log2 is the ONE float boundary, quantized to micro
    immediately (round(log2(c)·1e6), the repo's ln()/ratio policy);
    everything around it is exact integer arithmetic with DIV, so
    engines agree bit-for-bit. Empty docs report 0.

    Shape: ENTIRELY per-row — entropy is a pure function of one
    document, so the char histogram comes from array_sort +
    run-length over run-head positions (the token_dropout idiom),
    never an exploded (doc, char) corpus shuffle (the previous form
    shuffled 4e9 rows at 10 M docs). ``fan_out`` spreads the
    CPU-bound narrow stage when the scan arrives under-partitioned.

    Bounds (documented, not reachable by text): per-doc chars must
    fit INT (< 2.1e9, the sequence() index type) and
    n·round(log2(n)·1e6) must fit int64 — docs to ~1.4e11 chars.

    Returns (id, n_chars, entropy_mbits).
    """
    from etl_script_spark.operators.partitioning import fan_out

    b = fan_out(
        df.select(
            F.col(id_col).alias("id"),
            F.col(text_col).cast("string").alias("__t"),
        )
    )
    # sorted chars put equal chars adjacent; run heads are positions
    # where the char differs from its predecessor, run lengths are
    # head-to-next-head gaps — the per-row histogram without a shuffle
    sorted_chars = "array_sort(filter(split(__t, ''), c -> c != ''))"
    heads = (
        "filter(sequence(1, size(__s)),"
        " i -> i = 1 OR element_at(__s, i) != element_at(__s, i - 1))"
    )
    counts = (
        "zip_with("
        "concat(slice(__hd, 2, size(__hd) - 1), array(size(__s) + 1)),"
        " __hd, (nxt, cur) -> CAST(nxt - cur AS BIGINT))"
    )
    t_micro = (
        "aggregate(__cnt, CAST(0 AS BIGINT), (acc, c) -> acc"
        " + c * CAST(round(log2(CAST(c AS DOUBLE)) * 1000000) AS BIGINT))"
    )
    return (
        b.withColumn("__s", F.expr(sorted_chars))
        .withColumn("__n", F.size("__s").cast("long"))
        .withColumn(
            "__hd",
            F.expr(
                f"CASE WHEN size(__s) = 0 THEN array() ELSE {heads} END"
            ),
        )
        .withColumn("__cnt", F.expr(counts))
        .withColumn("__t_micro", F.expr(t_micro))
        .select(
            "id",
            F.col("__n").alias("n_chars"),
            F.when(F.col("__n") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.expr(
                    "(CAST(round(log2(CAST(__n AS DOUBLE)) * 1000000)"
                    " AS BIGINT) - __t_micro DIV __n) DIV 1000"
                )
            )
            .alias("entropy_mbits"),
        )
    )


def js_divergence_tokens(
    df, text_col: str, split_flag, min_count: int = 1
) -> "DataFrame":
    """Jensen-Shannon divergence between the token distributions of
    two corpus halves (split by the boolean ``split_flag``) — the
    bounded, symmetric drift measure ([0, ln 2] nats) that PSI and KS
    don't give for heavy-tailed vocabularies: JS handles tokens
    present in only one side without PSI's ±∞ cells.

    JS = ½Σp·ln(p/m) + ½Σq·ln(q/m), m = (p+q)/2. With integer counts
    the per-token ratio p/m = 2·cp·NQ/(cp·NQ + cq·NP) — evaluated
    exactly in DECIMAL, its ln() is the one float boundary, quantized
    to nano immediately (round·1e9); the two weighted sums fold in
    DECIMAL and divide by 2·N with DIV. One-sided tokens contribute
    the full ln(2) on their side, as the math says. Reported in
    nano-nats.

    Shape: one token-histogram aggregation keyed (token) carrying
    both sides' counts (map-side combinable), one fold. The
    vocabulary table is the only intermediate — never the corpus.

    Returns one row (n_p, n_q, vocab, js_nano).
    """
    toks = df.select(
        F.explode(words(F.col(text_col))).alias("tok"),
        F.when(split_flag, 1).otherwise(0).cast("long").alias("__p"),
    ).filter(F.col("tok") != "")
    hist = toks.groupBy("tok").agg(
        F.sum("__p").alias("cp"),
        F.sum(F.lit(1) - F.col("__p")).alias("cq"),
    ).filter((F.col("cp") + F.col("cq")) >= min_count)
    tot = hist.agg(
        F.sum("cp").cast("decimal(38,0)").alias("np"),
        F.sum("cq").cast("decimal(38,0)").alias("nq"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    staged = hist.crossJoin(F.broadcast(tot))
    # ratio_p = 2*cp*nq / (cp*nq + cq*np), exact decimal then one ln
    lp = F.round(
        F.log(
            F.expr(
                "CAST(2 AS DECIMAL(38,0)) * cp * nq"
            ).cast("double")
            / F.expr(
                "CAST(cp AS DECIMAL(38,0)) * nq"
                " + CAST(cq AS DECIMAL(38,0)) * np"
            ).cast("double")
        )
        * 1e9
    ).cast("decimal(38,0)")
    lq = F.round(
        F.log(
            F.expr(
                "CAST(2 AS DECIMAL(38,0)) * cq * np"
            ).cast("double")
            / F.expr(
                "CAST(cp AS DECIMAL(38,0)) * nq"
                " + CAST(cq AS DECIMAL(38,0)) * np"
            ).cast("double")
        )
        * 1e9
    ).cast("decimal(38,0)")
    folded = staged.groupBy("np", "nq", "vocab").agg(
        F.sum(
            F.when(F.col("cp") > 0, F.col("cp").cast("decimal(38,0)") * lp)
            .otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("a"),
        F.sum(
            F.when(F.col("cq") > 0, F.col("cq").cast("decimal(38,0)") * lq)
            .otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("b"),
    )
    return folded.select(
        F.col("np").cast("long").alias("n_p"),
        F.col("nq").cast("long").alias("n_q"),
        "vocab",
        F.expr(
            "CAST(a DIV (2 * np) + b DIV (2 * nq) AS BIGINT)"
        ).alias("js_nano"),
    )


def token_dropout(
    df, text_col: str, id_col: str, rate_ppm: int = 100000,
    seed: str = "td",
) -> "DataFrame":
    """Token-dropout augmentation: delete each token independently
    with probability ``rate_ppm``/1e6, decided by the pure md5
    predicate over (seed, doc, position) — the word-level denoising
    companion to mlm_mask/span_corrupt (BART's token deletion), fully
    deterministic and engine-replayable, so an augmented corpus can
    be regenerated bit-for-bit on any cluster.

    Shape: pure higher-order ARRAY functions (transform + filter +
    array_join), zero explode, zero shuffle — scan speed at 100 TB,
    the same idiom as mlm_mask. (The first cut used posexplode +
    collect_list reassembly: 386 s at 10 M docs vs ~60 s for the
    array form — the shuffle AND the per-group array_sort were pure
    overhead for a per-row computation.) Empty results keep their
    row (a doc whose every token dropped emits ''); docs with zero
    non-empty tokens are excluded, matching the exploded form.

    Returns (id, augmented, n_tokens, n_dropped).
    """
    if not 0 < rate_ppm < 1_000_000:
        raise ValueError(f"rate_ppm must be in (0, 1e6), got {rate_ppm}")
    thr = format(rate_ppm * 16**8 // 1_000_000, "08x")

    def dropped(i: "Column") -> "Column":
        return (
            F.substring(
                F.md5(
                    F.concat_ws(
                        "\x1f",
                        F.lit(seed),
                        F.col("id").cast("string"),
                        i.cast("string"),
                    )
                ),
                1,
                8,
            )
            < F.lit(thr)
        )

    base = df.select(
        F.col(id_col).alias("id"), words(F.col(text_col)).alias("__ws")
    )
    staged = base.select(
        "id",
        F.filter(
            F.transform(
                F.col("__ws"),
                lambda w, i: F.struct(
                    w.alias("w"), dropped(i).alias("d")
                ),
            ),
            lambda s: s["w"] != "",
        ).alias("__tok"),
    ).filter(F.size("__tok") > 0)
    return staged.select(
        "id",
        F.array_join(
            F.transform(
                F.filter(F.col("__tok"), lambda s: ~s["d"]),
                lambda s: s["w"],
            ),
            " ",
        ).alias("augmented"),
        F.size("__tok").cast("long").alias("n_tokens"),
        F.size(F.filter(F.col("__tok"), lambda s: s["d"]))
        .cast("long")
        .alias("n_dropped"),
    )


def batch_by_token_budget(
    df, id_col: str, token_col: str, budget: int, seed: str = "bb"
) -> "DataFrame":
    """Token-budget batch planning: assign documents to training
    batches so each batch's token total stays near ``budget``,
    WITHOUT a global serial pack — documents are banded by
    power-of-two length (band = floor(log2(tokens)), so same-band
    docs differ < 2× in length), shuffled deterministically within
    the band by md5, and cut by the running token sum at budget
    boundaries (batch = cumsum DIV budget; the same
    floor-of-running-sum packer as pack_chunks_greedy). Similar-
    length batching is what minimizes padding waste in practice
    (bucketed batching); the band key also makes every batch's id
    stable across engines, runs, and cluster sizes.

    Shape: there are only ~60 power-of-two bands, so a window
    partitioned on the band alone would serialize n/60 rows through
    one task (caught by the 100 M-row sweep). The within-band running
    sum is therefore TWO-PHASE: the md5 order's first two hex chars
    split each band into 256 sub-buckets whose token totals fold to a
    bands×256 offset table (exclusive prefix over ≤15 k rows), and
    the per-row window partitions by (band, bucket) — identical
    output to the single-window form (md5 order = (prefix, rest)
    order), with every partition bounded at n/(bands·256). Oversized
    docs (tokens > budget) get their own batch, never dropped.

    Returns (id, n_tokens, band, batch_id).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(token_col).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens").isNotNull() & (F.col("n_tokens") > 0))
    # Exact integer floor(log2): bit length via base-2 digit count.
    # Spark evaluates log2 as log(x)/log(2) (DuckDB uses native
    # log2), and near 2^48 the two float paths floor to DIFFERENT
    # bands (2^48-1 -> 48 on Spark, 47 exact) — so the band is
    # computed in integer space on both engines.
    band = F.expr(
        "CAST(length(conv(CAST(n_tokens AS STRING), 10, 2)) - 1 AS INT)"
    )
    h = F.md5(F.concat(F.lit(seed), F.col("id").cast("string")))
    staged = (
        base.withColumn("band", band)
        .withColumn("__h", h)
        .withColumn("__bkt", F.substring("__h", 1, 2))
    )
    per_bucket = staged.groupBy("band", "__bkt").agg(
        F.sum("n_tokens").alias("__bn")
    )
    w_off = (
        Window.partitionBy("band")
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.select(
        "band",
        "__bkt",
        F.coalesce(F.sum("__bn").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = (
        Window.partitionBy("band", "__bkt")
        .orderBy(F.col("__h").asc(), F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        staged.join(offsets, ["band", "__bkt"])
        .withColumn("__cum", F.col("__off") + F.sum("n_tokens").over(w_in))
        .withColumn(
            # pure LONG DIV on the per-row hot path (a DECIMAL cast
            # here is a BigDecimal alloc per row outside codegen —
            # the theil-sen lesson); a band's token cumsum tops out
            # at ~1e14 even for a 100 TB corpus, far inside int64
            "batch_id",
            F.expr(f"(__cum - n_tokens) DIV {budget}"),
        )
        .select("id", "n_tokens", "band", "batch_id")
    )


def curriculum_interleave(
    df, id_col: str, score_col: str, n_strata: int = 10, seed: str = "ci"
) -> "DataFrame":
    """Curriculum-balanced training order: stratify documents into
    ``n_strata`` equal-count quality bands (exact rank, not quantile
    sketch), shuffle deterministically within each band by md5, and
    interleave the bands round-robin — position = within_rank·k +
    band — so EVERY consecutive window of k positions spans the full
    quality spectrum. The data-ordering step between curation and
    sharding: plain quality-sorted order trains on easy data for
    epochs (loss cliffs), a raw shuffle wastes the scores; the
    interleave holds the per-batch quality mix constant through the
    whole run.

    Exact global rank WITHOUT a one-partition sort: the score
    histogram's two-phase bucketed prefix sum (stats._bucketed_below)
    gives each score value its count-below offset, and a window
    partitioned BY SCORE VALUE ranks within ties — every window in
    the plan partitions on a real key, so the banding distributes at
    any corpus size. Position is derived arithmetic, no final sort
    (the consumer sorts shards, not the planner).

    Returns (id, band, position).
    """
    if n_strata < 2:
        raise ValueError(f"n_strata must be >= 2, got {n_strata}")
    from pyspark.sql import Window

    from etl_script_spark.operators.stats import _bucketed_below

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(score_col).cast("long").alias("__s"),
    ).filter(F.col("__s").isNotNull())
    hist = base.groupBy(F.col("__s").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    below = _bucketed_below(hist)
    tot = hist.agg(F.sum("c").cast("long").alias("__n"))
    w_tie = Window.partitionBy("__s").orderBy(F.col("id").asc())
    banded = (
        base.withColumn("__tr", F.row_number().over(w_tie).cast("long"))
        .join(below.select(F.col("v").alias("__s"), "__below"), "__s")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "band",
            F.expr(
                f"CAST((__below + __tr - 1) * {n_strata} DIV __n AS INT)"
            ),
        )
    )
    # within-band rank, two-phase: a window on the band alone
    # serializes n/k rows through one task (caught by the 100 M-row
    # sweep — k is ~10, not a distribution key). The md5 order's
    # first two hex chars split each band into 256 sub-buckets whose
    # counts fold to a k×256 offset table; the per-row rank window
    # partitions by (band, bucket). Identical ranks to the
    # single-window form (md5 order = (prefix, rest) order).
    h = F.md5(F.concat(F.lit(seed), F.col("id").cast("string")))
    staged = banded.withColumn("__h", h).withColumn(
        "__bkt", F.substring("__h", 1, 2)
    )
    per_bucket = staged.groupBy("band", "__bkt").agg(
        F.count(F.lit(1)).alias("__bn")
    )
    w_off = (
        Window.partitionBy("band")
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.select(
        "band",
        "__bkt",
        F.coalesce(F.sum("__bn").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = Window.partitionBy("band", "__bkt").orderBy(
        F.col("__h").asc(), F.col("id").asc()
    )
    return (
        staged.join(offsets, ["band", "__bkt"])
        .withColumn(
            "__wr",
            (F.col("__off") + F.row_number().over(w_in)).cast("long"),
        )
        .select(
            "id",
            "band",
            ((F.col("__wr") - 1) * n_strata + F.col("band"))
            .cast("long")
            .alias("position"),
        )
    )


def oov_rate(
    df,
    text_col: str,
    id_col: str,
    vocab,
    token_col: str = "token",
) -> "DataFrame":
    """Per-document out-of-vocabulary rate against a reference
    vocabulary — the domain-shift / junk signal a tokenizer-bound
    pipeline reads before committing a corpus to training: a doc
    whose tokens mostly miss the reference vocab is either another
    language, another domain, or noise.

    Tokens are the whitespace words after normalize_text; the vocab
    joins BROADCAST (a reference vocabulary is bounded by
    construction — top-N from a trusted corpus). oov_ppm = misses ·
    1e6 DIV tokens, exact integers; a doc with zero tokens reports
    NULL (undefined, not 0 — the empty doc isn't "all in-vocab").

    Shape: fan_out before the explode (scan-stage amplification
    rule); one (doc) aggregation keyed by the id; the id spine
    left-joins back so token-less docs survive with NULL.

    Returns (id, n_tokens, n_oov, oov_ppm).
    """
    from etl_script_spark.operators.partitioning import fan_out

    ids = df.select(F.col(id_col).alias("id"))
    b = fan_out(
        df.select(
            F.col(id_col).alias("id"),
            F.col(text_col).cast("string").alias("__t"),
        )
    )
    v = vocab.select(
        F.col(token_col).alias("tok")
    ).distinct().withColumn("__in", F.lit(1))
    toks = (
        b.select("id", F.explode(words(F.col("__t"))).alias("tok"))
        .filter(F.col("tok") != "")
        .join(F.broadcast(v), "tok", "left")
    )
    per = toks.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
    )
    return ids.join(per, "id", "left").select(
        "id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
        F.expr("CAST((n_oov * 1000000) DIV NULLIF(n_tokens, 0)"
               " AS BIGINT)").alias("oov_ppm"),
    )
