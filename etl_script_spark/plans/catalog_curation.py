"""Declared queries for the curation-stage LLM-data operators added in
round 4: PII redaction, Gopher-style repetition filters, benchmark
decontamination, stratified domain sampling, URL canonicalization,
and training-window chunking. All exercised on ``documents``; every
query carries a full DuckDB hash oracle (the PII / URL fixtures are
injected deterministically from ``doc_id`` so both engines replay the
identical input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_script_spark.operators import (
    conversations,
    corpusstats,
    decontam,
    expectations,
    multimodal,
    redact,
    similarity,
    textstats,
    urls,
)
from etl_script_spark.operators import dedup as dedup_ops
from etl_script_spark.operators import quality as quality_ops
from etl_script_spark.plans.catalog import register, t
from etl_script_spark.plans.catalog_text import _QUALITY_EXPR
from etl_script_spark.plans.catalog_text import _WS as _WS_SQL

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# deterministic PII injection — the corpus fixture has no real PII, so
# both engines append the same synthetic contacts derived from doc_id
_PII_SUFFIX_SQL = (
    "' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com tel 08-123-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' id 1-2345-67890-12-3'"
    " || CASE WHEN doc_id % 5 = 0 THEN ' ip 10.0.'"
    "         || CAST(doc_id % 256 AS VARCHAR) || '.7' ELSE '' END"
)
_INJ_SQL = "text || " + _PII_SUFFIX_SQL

_PII_REDACT_SQL = (
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "regexp_replace({src}, "
    r"'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '[EMAIL]', 'g'), "
    r"'\b\d[- ]?\d{{4}}[- ]?\d{{5}}[- ]?\d{{2}}[- ]?\d\b', '[ID]', 'g'), "
    r"'\b\d{{4}}[- ]?\d{{4}}[- ]?\d{{4}}[- ]?\d{{1,4}}\b', '[CARD]', 'g'), "
    r"'(\+66[- ]?|0)\d{{1,2}}[- ]?\d{{3}}[- ]?\d{{4}}', '[PHONE]', 'g'), "
    r"'\b\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\b', '[IP]', 'g')"
)


@register(
    "pii_redact_scrub",
    f"""
    WITH inj AS (SELECT doc_id, {_INJ_SQL} AS raw FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(raw,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}'))
             AS n_email,
           len(regexp_extract_all(raw,
               '(\\+66[- ]?|0)\\d{{1,2}}[- ]?\\d{{3}}[- ]?\\d{{4}}'))
             AS n_phone,
           len(regexp_extract_all(raw,
               '\\b\\d[- ]?\\d{{4}}[- ]?\\d{{5}}[- ]?\\d{{2}}[- ]?\\d\\b'))
             AS n_citizen,
           len(regexp_extract_all(raw,
               '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b'))
             AS n_ip,
           md5({_PII_REDACT_SQL.format(src='raw')}) AS clean_md5
    FROM inj
    """,
    ("LLM-curation",),
)
def pii_redact_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub audit: per-document counts of each PII kind on the
    raw text plus the md5 of the fully-redacted text (pattern order:
    specific before loose, so a citizen ID is [ID] before the card
    pattern can claim it). Everything is a chained regexp projection —
    zero shuffle, runs inside the scan at 100 TB."""
    d = t(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com tel 08-123-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" id 1-2345-67890-12-3"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" ip 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".7"),
            ),
        ).otherwise(F.lit("")),
    )
    return d.select(
        "doc_id",
        redact.pii_count(raw, "email").alias("n_email"),
        redact.pii_count(raw, "phone").alias("n_phone"),
        redact.pii_count(raw, "citizen_id").alias("n_citizen"),
        redact.pii_count(raw, "ipv4").alias("n_ip"),
        F.md5(redact.redact(raw)).alias("clean_md5"),
    )


# ---------------------------------------------------------------------------
# Repetition metrics (Gopher-style quality signals)
# ---------------------------------------------------------------------------

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@register(
    "text_repetition",
    f"""
    WITH w AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents
    ), g AS (
      SELECT doc_id, ws,
             CASE WHEN len(ws) < 2 THEN CAST([] AS VARCHAR[])
                  ELSE [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]
             END AS bg
      FROM w
    ), m AS (
      SELECT doc_id,
             len(ws) AS n_words,
             1.0 - len(list_distinct(ws)) / greatest(len(ws), 1) AS dup_raw,
             coalesce(
               list_max(list_transform(list_distinct(bg),
                        b -> len(list_filter(bg, x -> x = b))))
                 / greatest(len(bg), 1), 0.0) AS top_raw
      FROM g
    )
    SELECT doc_id, n_words,
           round(dup_raw, 6) AS dup_word_frac,
           round(top_raw, 6) AS top_ngram_frac,
           (dup_raw > 0.30 OR top_raw > 0.18) AS repetitive
    FROM m
    """,
    ("LLM-curation",),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition signals (duplicate-word fraction + most
    frequent bigram coverage) with the drop flag at the published
    thresholds. The bigram mode is explode + two-level aggregation
    (map-side combine before each shuffle), never a per-row quadratic
    scan — the word-salad fixture text has real bigram variance, so
    the oracle checks non-trivial values."""
    d = t(spark, sf_dir, "documents")
    return textstats.repetition_metrics(d, "text", "doc_id")


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

#: three 10-word "benchmark" sentences in vocabulary the synthetic
#: corpus can never produce (the generator's word list is spark-ish:
#: batch/window/vector/...), so a clean document can never collide
_BENCH = (
    "zebra quokka lattice orchid vermilion basalt nimbus keratin fjord tapir",
    "sapphire meridian gossamer ziggurat peregrine alabaster cobalt tundra obsidian quartz",
    "marzipan falcon isthmus lyceum obelisk paprika rhapsody sonnet truffle velvet",
)

_BENCH_VALUES = ", ".join(f"('{s}')" for s in _BENCH)

# word 8-gram shingles of a pre-normalized text, replaying
# dedup.shingles exactly (distinct, degenerate whole-text gram when
# shorter than 8 words)
_GRAMS8 = (
    "CASE WHEN len({ws}) < 8 THEN [array_to_string({ws}, ' ')] "
    "ELSE list_distinct([array_to_string({ws}[i:i+7], ' ') "
    "for i in range(1, len({ws}) - 6)]) END"
)


@register(
    "decontam_ngram_overlap",
    f"""
    WITH bench(s) AS (VALUES {_BENCH_VALUES}),
    bg AS (
      SELECT flatten(list({_GRAMS8.format(ws="string_split(s, ' ')")})) AS grams
      FROM bench
    ),
    sent AS (SELECT list(s ORDER BY s) AS arr FROM bench),
    inj AS (
      -- scalar CTEs are CROSS JOINed in (1 row each): DuckDB rejects
      -- subqueries that end up inside list-comprehension lambdas
      SELECT doc_id,
             trim(regexp_replace(lower(
               text || CASE WHEN doc_id % 10 = 3 THEN ' ' ||
                 arr[CAST((doc_id // 10) % 3 AS INT) + 1]
               ELSE '' END), '\\s+', ' ', 'g')) AS norm
      FROM documents CROSS JOIN sent
    ),
    hits AS (
      SELECT doc_id,
             len(list_intersect(
               {_GRAMS8.format(ws="string_split(norm, ' ')")},
               grams)) AS n_overlap
      FROM inj CROSS JOIN bg
    )
    SELECT doc_id, n_overlap FROM hits WHERE n_overlap > 0
    """,
    ("LLM-curation",),
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every tenth document gets one of
    three benchmark sentences appended (deterministic by doc_id), and
    the report must flag exactly those documents with their distinct
    8-gram overlap counts. The benchmark side is broadcast — the
    corpus never shuffles; join key is the 64-bit gram hash with
    string equality re-checked (collision-proof)."""
    d = t(spark, sf_dir, "documents")
    # ORDER BY s in the oracle's list() fixes element order; replay it
    bench_sorted = sorted(_BENCH)
    arr = F.array(*[F.lit(s) for s in bench_sorted])
    corpus = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 10 == 3,
                F.concat(
                    F.lit(" "),
                    F.element_at(
                        arr,
                        ((F.col("doc_id") / F.lit(10)).cast("long") % 3).cast(
                            "int"
                        )
                        + 1,
                    ),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    bench = spark.createDataFrame([(s,) for s in bench_sorted], ["text"])
    return decontam.contamination_report(
        corpus, bench, "text", "doc_id", n=8
    )


# ---------------------------------------------------------------------------
# Stratified domain-mix sampling
# ---------------------------------------------------------------------------

_MIX_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}
_MIX_DEFAULT = 0.05


@register(
    "sample_stratified_by_source",
    """
    SELECT doc_id, source, n_chars FROM documents
    WHERE substr(md5('mix1' || CAST(doc_id AS VARCHAR)), 1, 8) <
      CASE source
        WHEN 'src0' THEN 'g'
        WHEN 'src1' THEN '80000000'
        WHEN 'src2' THEN '40000000'
        WHEN 'src3' THEN '19999999'
        ELSE '0ccccccc'
      END
    """,
    ("LLM-curation",),
)
def sample_stratified_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing: keep all of src0, half of src1, a quarter of
    src2, 10% of src3 and 5% of the long tail — one deterministic
    md5 predicate per row (same subsample every run / engine /
    cluster size), zero shuffle, evaluated inside the scan."""
    d = t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return textstats.stratified_hash_sample(
        d, "doc_id", "source", _MIX_RATES, _MIX_DEFAULT, seed="mix1"
    )


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------


@register(
    "url_canonicalize_dedup",
    """
    WITH canon AS (
      SELECT doc_id,
             CASE WHEN doc_id % 4 IN (0, 1)
               THEN 'http://example' || CAST((doc_id // 4) % 7 AS VARCHAR)
                    || '.com/Docs/' || CAST(doc_id // 4 AS VARCHAR) || '?ref=1'
               ELSE 'https://example' || CAST((doc_id // 4) % 7 AS VARCHAR)
                    || '.com/Docs/' || CAST(doc_id // 4 AS VARCHAR)
             END AS canon_url,
             'example' || CAST((doc_id // 4) % 7 AS VARCHAR) || '.com' AS host
      FROM documents
    )
    SELECT canon_url, host, COUNT(*) AS n_dups
    FROM canon GROUP BY canon_url, host
    """,
    ("LLM-curation",),
)
def url_canonicalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-URL dedup: four messy variants per path stem (upper-case
    scheme/host, default ports, tracking params, fragments, trailing
    slashes) must collapse to two canonical URLs. The oracle STATES
    the expected canonical form — the Spark side has to derive it
    through ``canonicalize_url``, so any canonicalization bug breaks
    the hash. Canonicalization is a zero-shuffle projection; the only
    shuffle is the final count groupBy."""
    d = t(spark, sf_dir, "documents")
    k = (F.floor(F.col("doc_id") / 4) % 7).cast("string")
    stem = F.floor(F.col("doc_id") / 4).cast("long").cast("string")
    messy = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit("HTTP://EXAMPLE"), k, F.lit(".COM:80/Docs/"), stem,
                F.lit("/?utm_source=feed&ref=1#frag"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit("http://example"), k, F.lit(".com/Docs/"), stem,
                F.lit("?ref=1"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(
                F.lit("https://Example"), k, F.lit(".com:443/Docs/"), stem,
                F.lit("/"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://example"), k, F.lit(".com/Docs/"), stem,
                F.lit("?utm_campaign=x&fbclid=abc"),
            )
        )
    )
    return (
        d.select(
            urls.canonicalize_url(messy).alias("canon_url"),
            urls.url_host(messy).alias("host"),
        )
        .groupBy("canon_url", "host")
        .agg(F.count(F.lit(1)).alias("n_dups"))
    )


# ---------------------------------------------------------------------------
# Training-window chunking
# ---------------------------------------------------------------------------


@register(
    "text_chunk_windows",
    f"""
    WITH w AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents
    ), n AS (
      SELECT doc_id, ws,
             CAST(floor(greatest((len(ws) - 9) / 32.0 + 1, 1)) AS INT)
               AS n_chunks
      FROM w
    ), e AS (
      SELECT doc_id,
             unnest([{{'i': i,
                       'c': array_to_string(ws[i*32+1:i*32+40], ' ')}}
                     for i in range(0, n_chunks)]) AS u
      FROM n
    )
    SELECT doc_id, u.i AS chunk_idx, u.c AS chunk_text,
           CASE WHEN u.c = '' THEN 0
                ELSE len(string_split(u.c, ' ')) END AS n_tokens
    FROM e
    """,
    ("LLM-curation",),
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split documents into 40-token windows with 8-token overlap
    (stride 32) — the curation-to-tokenizer hand-off unit. Pure
    sequence/slice/posexplode pipeline: chunks are produced inside
    the scan stage, no shuffle, short docs yield one whole-doc chunk,
    the last window is the ragged tail."""
    d = t(spark, sf_dir, "documents")
    return textstats.chunk_text(
        d, "text", "doc_id", chunk_tokens=40, overlap=8
    )


# ---------------------------------------------------------------------------
# Full curation pipeline (all six stages composed)
# ---------------------------------------------------------------------------

_BENCH_SUFFIX_SQL = (
    "CASE WHEN doc_id % 10 = 3 THEN ' ' || "
    "arr[CAST((doc_id // 10) % 3 AS INT) + 1] ELSE '' END"
)

#: corpus-tuned repetition thresholds for the word-salad fixture
#: (median dup_word_frac is 0.54, p75 top-bigram 0.048) — Gopher's
#: published 0.30/0.18 would drop everything / nothing here
_REP_DUP_MAX = 0.60
_REP_TOP_MAX = 0.05


def _pii_suffix() -> F.Column:
    """Spark twin of _PII_SUFFIX_SQL."""
    return F.concat(
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com tel 08-123-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" id 1-2345-67890-12-3"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" ip 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".7"),
            ),
        ).otherwise(F.lit("")),
    )


def _bench_suffix() -> F.Column:
    """Spark twin of _BENCH_SUFFIX_SQL (arr = sorted bench sentences)."""
    arr = F.array(*[F.lit(s) for s in sorted(_BENCH)])
    return F.when(
        F.col("doc_id") % 10 == 3,
        F.concat(
            F.lit(" "),
            F.element_at(
                arr,
                ((F.col("doc_id") / F.lit(10)).cast("long") % 3).cast("int")
                + 1,
            ),
        ),
    ).otherwise(F.lit(""))


@register(
    "pipeline_curation_e2e",
    f"""
    WITH bench(s) AS (VALUES {_BENCH_VALUES}),
    bg AS (
      SELECT flatten(list({_GRAMS8.format(ws="string_split(s, ' ')")})) AS grams
      FROM bench
    ),
    sent AS (SELECT list(s ORDER BY s) AS arr FROM bench),
    inj AS (
      SELECT doc_id, source,
             text || {_BENCH_SUFFIX_SQL} || {_PII_SUFFIX_SQL} AS text
      FROM documents CROSS JOIN sent
    ),
    dc AS (  -- drop benchmark-contaminated docs
      SELECT doc_id, source, text FROM inj CROSS JOIN bg
      WHERE len(list_intersect(
        {_GRAMS8.format(ws=f"string_split({_NORM}, ' ')")}, grams)) = 0
    ),
    repm AS (  -- repetition metrics at the corpus-tuned thresholds
      SELECT doc_id, source, text,
             1.0 - len(list_distinct(ws)) / greatest(len(ws), 1) AS dup,
             coalesce(
               list_max(list_transform(list_distinct(bgr),
                        b -> len(list_filter(bgr, x -> x = b))))
                 / greatest(len(bgr), 1), 0.0) AS top
      FROM (
        SELECT doc_id, source, text, ws,
               CASE WHEN len(ws) < 2 THEN CAST([] AS VARCHAR[])
                    ELSE [ws[i] || ' ' || ws[i+1]
                          for i in range(1, len(ws))]
               END AS bgr
        FROM (SELECT doc_id, source, text,
                     string_split({_NORM}, ' ') AS ws FROM dc)
      )
    ),
    rep AS (
      SELECT doc_id, source, text FROM repm
      WHERE NOT (dup > {_REP_DUP_MAX} OR top > {_REP_TOP_MAX})
    ),
    red AS (  -- PII scrub before anything ships
      SELECT doc_id, source,
             {_PII_REDACT_SQL.format(src='text')} AS text
      FROM rep
    ),
    samp AS (  -- domain-mix sample
      SELECT doc_id, source, text FROM red
      WHERE substr(md5('mix1' || CAST(doc_id AS VARCHAR)), 1, 8) <
        CASE source
          WHEN 'src0' THEN 'g'
          WHEN 'src1' THEN '80000000'
          WHEN 'src2' THEN '40000000'
          WHEN 'src3' THEN '19999999'
          ELSE '0ccccccc'
        END
    ),
    w AS (
      SELECT doc_id, source, string_split({_NORM}, ' ') AS ws FROM samp
    ),
    nw AS (
      SELECT doc_id, source, ws,
             CAST(floor(greatest((len(ws) - 9) / 32.0 + 1, 1)) AS INT)
               AS n_chunks
      FROM w
    ),
    e AS (
      SELECT doc_id, source,
             unnest([{{'i': i,
                       'c': array_to_string(ws[i*32+1:i*32+40], ' ')}}
                     for i in range(0, n_chunks)]) AS u
      FROM nw
    )
    SELECT doc_id, source, u.i AS chunk_idx, u.c AS chunk_text,
           len(string_split(u.c, ' ')) AS n_tokens
    FROM e
    """,
    ("LLM-curation", "pipeline"),
)
def pipeline_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation chain composed end-to-end: benchmark
    decontamination (drop) -> repetition filter -> PII redaction ->
    stratified domain sampling -> training-window chunking. Every
    stage is the same operator its standalone catalog query exercises;
    the oracle replays the whole chain in one SQL statement.

    Scale shape: decontam and repetition are the only shuffling
    stages (broadcast gram join + the bigram count agg); redaction,
    sampling, and chunking all fuse into projections/filters, so the
    post-filter corpus streams from the repetition join straight to
    the sink."""
    d = t(spark, sf_dir, "documents")
    corpus = d.select(
        "doc_id",
        "source",
        F.concat(F.col("text"), _bench_suffix(), _pii_suffix()).alias("text"),
    )
    bench = spark.createDataFrame([(s,) for s in sorted(_BENCH)], ["text"])
    flagged = decontam.contamination_report(
        corpus, bench, "text", "doc_id", n=8
    )
    dc = corpus.join(flagged.select("doc_id"), "doc_id", "left_anti")
    rep = textstats.repetition_metrics(
        dc, "text", "doc_id",
        dup_word_max=_REP_DUP_MAX, top_ngram_max=_REP_TOP_MAX,
    )
    kept = dc.join(
        rep.filter(~F.col("repetitive")).select("doc_id"), "doc_id", "semi"
    )
    red = kept.select(
        "doc_id", "source", redact.redact(F.col("text")).alias("text")
    )
    samp = textstats.stratified_hash_sample(
        red, "doc_id", "source", _MIX_RATES, _MIX_DEFAULT, seed="mix1"
    )
    chunks = textstats.chunk_text(
        samp.select("doc_id", "text"), "text", "doc_id",
        chunk_tokens=40, overlap=8,
    )
    return chunks.join(
        samp.select("doc_id", "source"), "doc_id", "inner"
    ).select("doc_id", "source", "chunk_idx", "chunk_text", "n_tokens")


# ---------------------------------------------------------------------------
# Corpus statistics / tokenizer prep / LM-based filtering
# ---------------------------------------------------------------------------


@register(
    "tok_vocab_counts",
    f"""
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(string_split({_NORM}, ' ')) AS token
          FROM documents)
    WHERE token <> ''
    GROUP BY token
    HAVING COUNT(*) >= 2
    """,
    ("LLM-curation",),
)
def tok_vocab_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-frequency table (min_count=2) — the word-count
    input to BPE tokenizer training. One explode + one aggregation;
    map-side combine collapses the Zipf head before the shuffle, so
    shuffle volume tracks distinct-tokens-per-partition, not corpus
    size."""
    d = t(spark, sf_dir, "documents")
    return textstats.token_vocab(d, "text", min_count=2)


@register(
    "text_unigram_nll",
    f"""
    WITH toks AS (
      SELECT doc_id, token FROM (
        SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS token
        FROM documents
      ) WHERE token <> ''
    ),
    vocab AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token),
    stats AS (SELECT SUM(cnt) AS total, COUNT(*) AS v FROM vocab)
    SELECT doc_id, COUNT(*) AS n_tokens,
           SUM(CAST(ROUND(-ln((cnt + 0.5) / (total + 0.5 * v))
                          * 1000000.0) AS BIGINT))
             / (1000000.0 * COUNT(*)) AS avg_nll
    FROM toks JOIN vocab USING (token) CROSS JOIN stats
    GROUP BY doc_id
    """,
    ("LLM-curation",),
)
def text_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style fluency score: mean negative log-likelihood per
    document under the corpus's own add-0.5-smoothed unigram LM. The
    head/middle/tail quality split thresholds on exactly this value.
    Reproducible to the bit: per-token nll is quantized to 1e-6
    before an integer sum (see unigram_nll_scores) — a float avg()
    straddled a 4-dp rounding boundary at sf0.01 the first time this
    ran, which is exactly the drift the quantized sum removes."""
    d = t(spark, sf_dir, "documents")
    return textstats.unigram_nll_scores(d, "text", "doc_id", alpha=0.5)


@register(
    "corpus_len_histogram",
    """
    SELECT CAST(floor(n_chars / 100) AS BIGINT) * 100 AS bucket_lo,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM documents
    GROUP BY 1
    """,
    ("LLM-curation",),
)
def corpus_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram (100-char buckets) with per-bucket
    mean — the first corpus-health report every curation run prints.
    Integer sum / count division is a single exact double op, so no
    decimal policy needed."""
    d = t(spark, sf_dir, "documents")
    return (
        d.groupBy(
            (F.floor(F.col("n_chars") / 100) * 100)
            .cast("long")
            .alias("bucket_lo")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias(
                "avg_chars"
            ),
        )
    )


@register(
    "dedup_incremental_ingest",
    f"""
    WITH store AS (
      SELECT md5({_NORM}) AS fp FROM documents WHERE doc_id < 250
    ),
    batch AS (
      SELECT b.doc_id,
             CASE WHEN b.doc_id % 5 = 0 THEN s.text ELSE b.text END AS text
      FROM documents b JOIN documents s ON s.doc_id = b.doc_id - 250
      WHERE b.doc_id >= 250
    ),
    bf AS (SELECT doc_id, md5({_NORM}) AS fp FROM batch),
    first AS (
      SELECT doc_id, fp FROM (
        SELECT doc_id, fp,
               ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM bf
      ) WHERE rn = 1
    )
    SELECT doc_id, fp FROM first
    WHERE fp NOT IN (SELECT fp FROM store)
    """,
    ("LLM-curation", "LLM-dedup"),
)
def dedup_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus ingestion: dedupe a new batch within itself
    (exact content hash, keep min id) AND against the fingerprint
    store of everything already ingested — the shape a daily crawl
    drop runs. The fixture plants true cross-batch duplicates (every
    fifth batch doc reuses a stored doc's text). At 100 TB the store
    side is fingerprints only (16 bytes/doc), and the anti-join keys
    on the hash — the corpus text never re-shuffles."""
    d = t(spark, sf_dir, "documents")
    store = d.filter(F.col("doc_id") < 250).select(
        textstats.fingerprint_md5(F.col("text")).alias("fp")
    )
    b = d.filter(F.col("doc_id") >= 250).alias("b")
    s = d.alias("s")
    batch = b.join(
        s, F.col("s.doc_id") == F.col("b.doc_id") - 250, "inner"
    ).select(
        F.col("b.doc_id").alias("doc_id"),
        F.when(
            F.col("b.doc_id") % 5 == 0, F.col("s.text")
        ).otherwise(F.col("b.text")).alias("text"),
    )
    fresh = (
        dedup_ops.exact_dedup(batch, "text", "doc_id")
        .select(
            "doc_id", textstats.fingerprint_md5(F.col("text")).alias("fp")
        )
    )
    return fresh.join(store, "fp", "left_anti").select("doc_id", "fp")


# ---------------------------------------------------------------------------
# Distributed corpus clustering (Lloyd k-means, full oracle replay)
# ---------------------------------------------------------------------------

_KM_K = 8

# one Lloyd round in SQL, parameterized by the incoming centroid CTE
# name and the output CTE names. Replays the engine exactly: cosine
# affinity dot(v,c)/||c|| (sequential fold, ties -> larger cluster),
# then the 1e-6-quantized integer-sum centroid update.
_KM_DOT = (
    "list_reduce(list_prepend(0.0, "
    "[ve[i] * {c}.ce[i] for i in range(1, {dim} + 1)]), (a, b) -> a + b)"
)
_KM_NORM = (
    "sqrt(list_reduce(list_prepend(0.0, "
    "[{c}.ce[i] * {c}.ce[i] for i in range(1, {dim} + 1)]), (a, b) -> a + b))"
)


def _km_assign_cte(cin: str, aout: str, dim: int = 64) -> str:
    dot = _KM_DOT.format(c=cin, dim=dim)
    norm = _KM_NORM.format(c=cin, dim=dim)
    return f"""
    {aout} AS (
      SELECT vec_id, ve, cluster FROM (
        SELECT v.vec_id, v.ve, {cin}.cluster,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY {dot} * (1.0 / {norm}) DESC, {cin}.cluster DESC
               ) AS rn
        FROM v CROSS JOIN {cin}
      ) WHERE rn = 1
    )"""


def _km_update_cte(ain: str, cin: str, cout: str, dim: int = 64) -> str:
    return f"""
    {cout}_u AS (
      SELECT cluster, u.pos AS pos,
             SUM(CAST(ROUND(u.val * 1000000.0) AS BIGINT)) AS s,
             COUNT(*) AS n
      FROM (SELECT cluster,
                   unnest([{{'pos': i, 'val': ve[i]}}
                           for i in range(1, {dim} + 1)]) AS u
            FROM {ain})
      GROUP BY cluster, u.pos
    ),
    {cout} AS (
      SELECT {cin}.cluster,
             coalesce(nu.ce, {cin}.ce) AS ce
      FROM {cin} LEFT JOIN (
        SELECT cluster, list(s / (1000000.0 * n) ORDER BY pos) AS ce
        FROM {cout}_u GROUP BY cluster
      ) nu USING (cluster)
    )"""


@register(
    "cluster_kmeans_assign",
    f"""
    WITH v AS (
      SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS ve
      FROM embeddings
    ),
    c0 AS (
      SELECT ve AS ce,
             ROW_NUMBER() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
             ) - 1 AS cluster
      FROM v QUALIFY cluster < {_KM_K}
    ),
    {_km_assign_cte("c0", "a1")},
    {_km_update_cte("a1", "c0", "c1")},
    {_km_assign_cte("c1", "a2")},
    {_km_update_cte("a2", "c1", "c2")},
    {_km_assign_cte("c2", "af")}
    SELECT vec_id, cluster FROM af
    """,
    ("LLM-cluster",),
)
def cluster_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means (k=8, 2 rounds) over the embedding
    corpus, final cluster id per vector. The oracle replays BOTH
    rounds in SQL — possible because the centroid update quantizes to
    1e-6 before an integer sum (order-independent => bit-identical
    centroids on any engine/partitioning), and assignment replays the
    same sequential dot fold and tie order."""
    e = t(spark, sf_dir, "embeddings")
    _, assigned = similarity.kmeans_lloyd(
        e, "vec_id", "embedding", k=_KM_K, iters=2
    )
    return assigned


#: CCNet-style bucket thresholds, fitted offline from the corpus NLL
#: distribution (terciles at sf0.01). Fixed literals — NOT a global
#: NTILE, which would be a single-partition sort of the whole corpus
#: at 100 TB; CCNet itself thresholds against cutoffs fitted on a
#: held-out sample for exactly this reason.
_NLL_HEAD_MAX = 3.3998
_NLL_MID_MAX = 3.4040


@register(
    "text_quality_buckets",
    f"""
    WITH toks AS (
      SELECT doc_id, token FROM (
        SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS token
        FROM documents
      ) WHERE token <> ''
    ),
    vocab AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token),
    stats AS (SELECT SUM(cnt) AS total, COUNT(*) AS v FROM vocab),
    nll AS (
      SELECT doc_id,
             SUM(CAST(ROUND(-ln((cnt + 0.5) / (total + 0.5 * v))
                            * 1000000.0) AS BIGINT))
               / (1000000.0 * COUNT(*)) AS avg_nll
      FROM toks JOIN vocab USING (token) CROSS JOIN stats
      GROUP BY doc_id
    )
    SELECT doc_id, avg_nll,
           CASE WHEN avg_nll < {_NLL_HEAD_MAX} THEN 'head'
                WHEN avg_nll < {_NLL_MID_MAX} THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM nll
    """,
    ("LLM-curation",),
)
def text_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail split: label each document by its
    unigram-LM fluency score against offline-fitted cutoffs. The
    label is a per-row comparison — after the LM pass, bucketing
    costs nothing and never sorts globally."""
    d = t(spark, sf_dir, "documents")
    scored = textstats.unigram_nll_scores(d, "text", "doc_id", alpha=0.5)
    return scored.select(
        "doc_id",
        "avg_nll",
        F.when(F.col("avg_nll") < _NLL_HEAD_MAX, "head")
        .when(F.col("avg_nll") < _NLL_MID_MAX, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


# ---------------------------------------------------------------------------
# Multimodal curation pipeline
# ---------------------------------------------------------------------------


@register(
    "pipeline_mm_curation_e2e",
    """
    WITH media AS (
      -- blocks of 7 share the block head's payload: planted dups
      SELECT b.doc_id AS media_id, s.text AS text
      FROM documents b JOIN documents s
        ON s.doc_id = b.doc_id - (b.doc_id % 7)
    ),
    feats AS (
      SELECT media_id, octet_length(encode(text)) AS n_bytes,
             substr(sha256(text), 1, 16) AS sha_prefix
      FROM media
    ),
    kept AS (SELECT * FROM feats WHERE n_bytes >= 50)
    SELECT media_id, n_bytes, sha_prefix, dup_count FROM (
      SELECT media_id, n_bytes, sha_prefix,
             ROW_NUMBER() OVER (PARTITION BY sha_prefix
                                ORDER BY media_id) AS rn,
             COUNT(*) OVER (PARTITION BY sha_prefix) AS dup_count
      FROM kept
    ) WHERE rn = 1
    """,
    ("LLM-multimodal", "pipeline"),
)
def pipeline_mm_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-corpus curation end-to-end: binary payloads -> Arrow-
    batched feature extraction (mapInPandas; real decoder slots in
    behind the probe) -> tiny-image filter -> content-hash dedup
    keeping the smallest id, with duplicate counts. The fixture
    plants duplicates (blocks of 7 docs share one payload) so the
    dedup stage has real work; the oracle replays bytes -> sha256 ->
    windowed keep-first in SQL.

    Scale shape: features are extracted in the scan stage (binary
    never shuffles); the dedup groups on the 16-hex content hash —
    at 100 TB the only shuffled payload is (hash, id, n_bytes)."""
    d = t(spark, sf_dir, "documents")
    b, s = d.alias("b"), d.alias("s")
    media = b.join(
        s,
        F.col("s.doc_id")
        == F.col("b.doc_id") - (F.col("b.doc_id") % 7),
        "inner",
    ).select(
        F.col("b.doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("s.text"), "utf-8").alias("content"),
        F.lit("image/png").alias("mime"),
        F.create_map(F.lit("src"), F.col("b.source")).alias("meta"),
    )
    feats = multimodal.extract_image_features(media).select(
        "media_id", "n_bytes", "sha_prefix"
    )
    kept = feats.filter(F.col("n_bytes") >= 50)
    agg = kept.groupBy("sha_prefix").agg(
        F.min(F.struct("media_id", "n_bytes")).alias("f"),
        F.count(F.lit(1)).alias("dup_count"),
    )
    return agg.select(
        F.col("f.media_id").alias("media_id"),
        F.col("f.n_bytes").alias("n_bytes"),
        "sha_prefix",
        "dup_count",
    )


# ---------------------------------------------------------------------------
# Repeated-span audit + sequence packing
# ---------------------------------------------------------------------------

_SPAN_A = (
    "all rights reserved redistribution of this template requires prior "
    "written permission from the original publisher and any derivative "
    "copies must retain this notice verbatim"
)
_SPAN_B = (
    "this page was generated automatically from the master catalog feed "
    "and should not be edited by hand because the next synchronization "
    "cycle will overwrite local changes"
)

_GRAMS20 = (
    "CASE WHEN len({ws}) < 20 THEN [array_to_string({ws}, ' ')] "
    "ELSE list_distinct([array_to_string({ws}[i:i+19], ' ') "
    "for i in range(1, len({ws}) - 18)]) END"
)


@register(
    "dedup_repeated_spans",
    f"""
    WITH inj AS (
      SELECT doc_id,
             trim(regexp_replace(lower(
               text || CASE WHEN doc_id % 4 = 1 THEN ' {_SPAN_A}'
                            WHEN doc_id % 4 = 2 THEN ' {_SPAN_B}'
                            ELSE '' END), '\\s+', ' ', 'g')) AS norm
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             unnest({_GRAMS20.format(ws="string_split(norm, ' ')")}) AS span
      FROM inj
    )
    SELECT span, COUNT(DISTINCT doc_id) AS n_docs,
           MIN(doc_id) AS witness_id
    FROM sh GROUP BY span
    HAVING COUNT(DISTINCT doc_id) >= 2
    """,
    ("LLM-dedup", "LLM-curation"),
)
def dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-span audit (exact-substring dedup
    signal, Lee et al. 2022): 20-word spans shared by >= 2 documents
    — boilerplate, licenses, templated pages. The fixture appends one
    of two license-y templates to half the corpus; every inner
    20-gram of each template must surface with its document count.
    The shuffle keys on a 64-bit span hash, never the text."""
    d = t(spark, sf_dir, "documents")
    inj = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 4 == 1, F.lit(" " + _SPAN_A))
            .when(F.col("doc_id") % 4 == 2, F.lit(" " + _SPAN_B))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return dedup_ops.repeated_spans(inj, "text", "doc_id", n=20, min_docs=2)


@register(
    "pack_training_sequences",
    f"""
    WITH w AS (
      SELECT doc_id, source, string_split({_NORM}, ' ') AS ws FROM documents
    ), nw AS (
      SELECT doc_id, source, ws,
             CAST(floor(greatest((len(ws) - 9) / 32.0 + 1, 1)) AS INT)
               AS n_chunks
      FROM w
    ), e AS (
      SELECT doc_id, source,
             unnest([{{'i': i,
                       'c': array_to_string(ws[i*32+1:i*32+40], ' ')}}
                     for i in range(0, n_chunks)]) AS u
      FROM nw
    ), c AS (
      SELECT doc_id, source, u.i AS chunk_idx,
             len(string_split(u.c, ' ')) AS n_tokens
      FROM e
    ), s AS (
      SELECT doc_id, source, chunk_idx, n_tokens,
             SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id, chunk_idx
               ROWS UNBOUNDED PRECEDING
             ) AS cum
      FROM c
    )
    SELECT doc_id, source, chunk_idx, n_tokens,
           CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS seq_id,
           CAST(cum - n_tokens
             - CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) * 512
             AS BIGINT) AS seq_offset
    FROM s
    """,
    ("LLM-curation",),
)
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: chunk every document into 40/8 windows, then
    greedily pack each source shard's chunks into 512-token training
    sequences (seq_id) with the chunk's offset inside its sequence.
    Packing is per-shard — the cumsum window partitions by source, so
    no global sort exists; a shard's chunks sort within one
    partition, which is exactly how a per-file packer runs at
    100 TB."""
    d = t(spark, sf_dir, "documents")
    chunks = textstats.chunk_text(
        d, "text", "doc_id", chunk_tokens=40, overlap=8
    ).join(d.select("doc_id", "source"), "doc_id", "inner")
    packed = textstats.pack_sequences(
        chunks, "n_tokens", ["doc_id", "chunk_idx"], "source", ctx_tokens=512
    )
    return packed.select(
        "doc_id", "source", "chunk_idx", "n_tokens", "seq_id", "seq_offset"
    )


@register(
    "sample_epoch_mix",
    """
    SELECT doc_id, source, epoch FROM (
      SELECT doc_id, source,
             CASE source WHEN 'src0' THEN 3 WHEN 'src1' THEN 2 ELSE 1 END
             + CASE WHEN substr(md5('ep1' || CAST(doc_id AS VARCHAR)), 1, 8)
                         < CASE source WHEN 'src1' THEN '80000000'
                                       ELSE '00000000' END
                    THEN 1 ELSE 0 END AS n
      FROM documents
    ), UNNEST(range(0, n)) AS t(epoch)
    """,
    ("LLM-curation",),
)
def sample_epoch_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Up-sampling half of domain mixing: 3 epochs of src0, 2.5 of
    src1 (the extra epoch goes to the deterministic-hash-selected
    half), 1 of everything else. Pure sequence+explode in the scan
    stage — the multiplier never shuffles or joins."""
    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    return textstats.epoch_mix(
        d, "doc_id", "source",
        {"src0": 3.0, "src1": 2.5},
        default_factor=1.0,
        seed="ep1",
    ).select("doc_id", "source", F.col("epoch").cast("long").alias("epoch"))


@register(
    "sample_quality_weighted",
    f"""
    SELECT doc_id, quality FROM (
      SELECT doc_id, {_QUALITY_EXPR} AS quality FROM documents
    )
    WHERE substr(md5('qw1' || CAST(doc_id AS VARCHAR)), 1, 8) <
          printf('%08x', CAST(floor(
            least(greatest(quality, 0.0), 1.0 - pow(2.0, -32))
            * 4294967296.0) AS BIGINT))
    """,
    ("LLM-curation",),
)
def sample_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row weighted sampling: each document kept with probability
    equal to its own quality score — the smooth version of a hard
    quality cutoff. One md5 predicate inside the scan; reproducible
    everywhere. The oracle reuses catalog_text's quality_score replay
    so the two stay in lockstep."""
    d = t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", textstats.quality_score(F.col("text")).alias("quality")
    )
    return textstats.weighted_hash_sample(scored, "doc_id", "quality", seed="qw1")


@register(
    "corpus_snapshot_diff",
    f"""
    WITH old AS (
      SELECT doc_id, source, md5({_NORM}) AS fp FROM documents
      WHERE doc_id % 10 <> 7
    ),
    new AS (
      SELECT doc_id, source,
             md5(trim(regexp_replace(lower(
               CASE WHEN doc_id % 10 = 4 THEN text || ' revised' ELSE text END
             ), '\\s+', ' ', 'g'))) AS fp
      FROM documents WHERE doc_id % 10 <> 2
    )
    SELECT source, status, COUNT(*) AS n_docs FROM (
      SELECT coalesce(n.source, o.source) AS source,
             CASE WHEN o.doc_id IS NULL THEN 'added'
                  WHEN n.doc_id IS NULL THEN 'removed'
                  WHEN o.fp <> n.fp THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM old o FULL OUTER JOIN new n USING (doc_id)
    ) GROUP BY source, status
    """,
    ("LLM-curation", "J4"),
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-versioning diff: two corpus snapshots compared by
    content fingerprint — per-source counts of added / removed /
    changed / unchanged documents, the release-notes table every
    dataset version ships with. The fixture derives both snapshots
    from the corpus (10% removed, 10% added, 10% revised). Full
    outer join keys on doc_id and compares 16-byte fingerprints —
    text never joins, so the diff costs two scans + one id-keyed
    shuffle at 100 TB."""
    d = t(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 10 != 7).select(
        "doc_id", "source",
        textstats.fingerprint_md5(F.col("text")).alias("fp"),
    )
    new = d.filter(F.col("doc_id") % 10 != 2).select(
        "doc_id", "source",
        textstats.fingerprint_md5(
            F.when(
                F.col("doc_id") % 10 == 4,
                F.concat(F.col("text"), F.lit(" revised")),
            ).otherwise(F.col("text"))
        ).alias("fp"),
    )
    o, n = old.alias("o"), new.alias("n")
    joined = o.join(n, F.col("o.doc_id") == F.col("n.doc_id"), "full_outer")
    status = (
        F.when(F.col("o.doc_id").isNull(), "added")
        .when(F.col("n.doc_id").isNull(), "removed")
        .when(F.col("o.fp") != F.col("n.fp"), "changed")
        .otherwise("unchanged")
    )
    return (
        joined.select(
            F.coalesce(F.col("n.source"), F.col("o.source")).alias("source"),
            status.alias("status"),
        )
        .groupBy("source", "status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "feat_normalize_pipeline",
    """
    WITH ranked AS (
      SELECT event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
      WHERE value IS NOT NULL
    ),
    caps AS (
      SELECT event_type,
             MAX(CASE WHEN rn = CAST(floor(0.05 * (n - 1)) AS BIGINT) + 1
                      THEN value END) AS plo,
             MAX(CASE WHEN rn = CAST(floor(0.95 * (n - 1)) AS BIGINT) + 1
                      THEN value END) AS phi
      FROM ranked GROUP BY event_type
    ),
    capped AS (
      SELECT e.event_id, e.event_type,
             CASE WHEN e.value IS NOT NULL
                  THEN LEAST(GREATEST(e.value, c.plo), c.phi) END AS capped
      FROM events e LEFT JOIN caps c USING (event_type)
    ),
    mom AS (
      SELECT event_type, COUNT(capped) AS n,
             CAST(SUM(CAST(capped AS DECIMAL(28,8))) AS DOUBLE) AS s,
             CAST(SUM(CAST(capped AS DECIMAL(28,8))
                      * CAST(capped AS DECIMAL(28,8))) AS DOUBLE) AS s2
      FROM capped GROUP BY event_type
    )
    SELECT c.event_id, c.event_type, c.capped,
           ROUND(CASE WHEN sqrt((s2 - s * s / n) / (n - 1)) > 0
                 THEN (c.capped - s / n) / sqrt((s2 - s * s / n) / (n - 1))
                 END, 6) AS z
    FROM capped c LEFT JOIN mom USING (event_type)
    """,
    ("LLM-features",),
)
def feat_normalize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric feature prep for training data: per-event-type
    rank-based winsorize (caps are sorted data elements — reproducible
    across engines, unlike interpolated or sketched quantiles) then
    z-score from decimal-sum moments. Caps and moments are
    bit-identical across engines; the final division/sqrt chain can
    differ in the last ulp (FMA contraction differences), so z is
    quantized to 6 dp on both sides — the house policy."""
    from etl_script_spark.operators import features

    ev = t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    capped = features.winsorize(
        ev, "event_type", "value", lower_q=0.05, upper_q=0.95
    ).select("event_id", "event_type", "capped")
    z = features.zscore(capped, "event_type", "capped")
    return z.select(
        "event_id", "event_type", "capped", F.round(F.col("z"), 6).alias("z")
    )


# ---------------------------------------------------------------------------
# Round 5: curation-family widening — embedding-level decontamination,
# named quality rules, bigram fluency, data-driven temperature mixing.
# ---------------------------------------------------------------------------


@register(
    "decontam_embedding_neardup",
    """
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings
    ),
    b AS (SELECT vec_id AS bench_id, vec AS bvec FROM v WHERE vec_id % 20 = 0)
    SELECT corpus_id, bench_id, cosine_sim FROM (
      SELECT v.vec_id AS corpus_id, b.bench_id,
             list_dot_product(v.vec, b.bvec)
               / (sqrt(list_dot_product(v.vec, v.vec))
                  * sqrt(list_dot_product(b.bvec, b.bvec))) AS cosine_sim
      FROM v CROSS JOIN b
    ) WHERE cosine_sim >= 0.999
    """,
    ("LLM-decontam", "LLM-similarity"),
)
def decontam_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level benchmark decontamination: corpus vectors
    whose cosine to any benchmark vector clears 0.999 — the
    paraphrase-grade leak the n-gram report (decontam_ngram_overlap)
    cannot see. Benchmark := every 20th embedding, so the planted
    truth is the verbatim self-pairs at cosine 1.0, which the banded
    hyperplane LSH finds with recall exactly 1 (identical sign
    pattern in every band); the isotropic remainder tops out at
    cosine ~0.5, far under threshold, so the brute-force DuckDB
    oracle and the LSH path agree on the exact pair set. Scale
    shape: bench side broadcasts three times (banded keys, candidate
    pairs, verify vectors) — the 100 TB corpus side is one scan, no
    shuffle (see similarity.embedding_cross_contam)."""
    from etl_script_spark.operators import similarity

    e = t(spark, sf_dir, "embeddings")
    bench = e.filter(F.col("vec_id") % 20 == 0)
    return similarity.embedding_cross_contam(
        e, bench, "vec_id", "vec_id", "embedding", threshold=0.999
    )


@register(
    "sample_temperature_mix",
    """
    WITH counts AS (
      SELECT source, COUNT(*) AS ns FROM documents GROUP BY source
    ),
    nmin AS (SELECT MIN(ns) AS nm FROM counts),
    rates AS (
      SELECT source,
             sqrt(CAST(nm AS DOUBLE) / CAST(ns AS DOUBLE)) AS rate
      FROM counts CROSS JOIN nmin
    )
    SELECT d.doc_id, d.source FROM documents d
    JOIN rates r USING (source)
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) <
          CASE WHEN r.rate >= 1.0 THEN 'g'
               ELSE printf('%08x', CAST(floor(r.rate * 4294967296.0)
                                        AS BIGINT)) END
    """,
    ("LLM-sampling",),
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (α=0.5) domain mixing: per-source keep
    rates sqrt(n_min/n_s) derived from the DATA (one tiny count
    aggregate broadcast back), realized as the deterministic md5
    predicate — the smallest source keeps everything, larger sources
    down-sample toward the tempered shares. α=0.5 is the
    deterministic point: sqrt and division are correctly-rounded
    IEEE, so the DuckDB oracle re-derives bit-identical thresholds
    (arbitrary α goes through pow, whose last ulp is libm-defined —
    documented in the operator)."""
    from etl_script_spark.operators import textstats as ts

    d = t(spark, sf_dir, "documents")
    return ts.temperature_mix_sample(d, "doc_id", "source").select(
        "doc_id", "source"
    )


@register(
    "quality_gopher_rules",
    f"""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split({_NORM}, ' '), x -> x <> '') AS ws,
             list_filter(list_transform(string_split(text, chr(10)),
                                        x -> trim(x)),
                         x -> x <> '') AS lines,
             len(string_split(text, '#')) - 1
               + len(string_split_regex(text, '\\.\\.\\.')) - 1 AS n_symbols
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(ws) AS n_words,
             CAST(COALESCE(list_sum(list_transform(ws, x -> length(x))), 0)
                  AS BIGINT) AS n_chars,
             len(lines) AS n_lines,
             n_symbols,
             len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
               AS n_alpha,
             len(list_intersect(list_distinct(ws),
                 ['the','and','of','to','a','in','is','that','it','for']))
               AS n_stop,
             len(list_filter(lines, l -> regexp_matches(l, '^[-*•]')))
               AS n_bullet,
             len(list_filter(lines, l -> regexp_matches(l, '\\.\\.\\.$')))
               AS n_ellipsis
      FROM base
    )
    SELECT doc_id AS id, n_words, n_chars, n_lines,
           (n_words >= 50 AND n_words <= 100000) AS ok_word_count,
           (n_chars >= 3 * n_words AND n_chars <= 10 * n_words)
             AS ok_mean_word_len,
           (n_symbols * 10 <= n_words) AS ok_symbol_ratio,
           (n_alpha * 5 >= n_words * 4) AS ok_alpha_words,
           (n_stop >= 2) AS ok_stopwords,
           (n_bullet * 10 <= n_lines * 9) AS ok_bullets,
           (n_ellipsis * 10 <= n_lines * 3) AS ok_ellipsis,
           ((n_words >= 50 AND n_words <= 100000)
            AND (n_chars >= 3 * n_words AND n_chars <= 10 * n_words)
            AND (n_symbols * 10 <= n_words)
            AND (n_alpha * 5 >= n_words * 4)
            AND (n_stop >= 2)
            AND (n_bullet * 10 <= n_lines * 9)
            AND (n_ellipsis * 10 <= n_lines * 3)) AS keep
    FROM m
    """,
    ("LLM-curation",),
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style named quality rules (Rae et al. 2021 §A1.1): the
    per-rule boolean battery behind a curation drop decision — word
    count band, mean word length band, symbol ratio, alpha-word
    ratio, stopword presence, bullet/ellipsis line ratios — plus the
    combined keep flag. Every ratio check is an exact integer
    cross-multiplication (10·symbols <= words, not symbols/words <=
    0.1), so the two engines cannot disagree at a boundary; the whole
    battery is one scan-stage projection, no shuffle, no UDF."""
    d = t(spark, sf_dir, "documents")
    return textstats.gopher_rules(d, "text", "doc_id")


@register(
    "text_bigram_nll",
    f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split({_NORM}, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    w2 AS (SELECT doc_id, ws FROM w WHERE len(ws) >= 2),
    bg AS (
      SELECT doc_id, u['w1'] AS w1, u['w2'] AS w2 FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ws)),
                      i -> {{'w1': ws[i], 'w2': ws[i+1]}})) AS u
        FROM w2
      )
    ),
    uni AS (
      SELECT w AS tok, COUNT(*) AS c1 FROM (
        SELECT unnest(ws) AS w FROM w2
      ) GROUP BY w
    ),
    bi AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
    stats AS (SELECT SUM(c1) AS total, COUNT(*) AS v FROM uni)
    SELECT doc_id, COUNT(*) AS n_bigrams,
           SUM(CAST(ROUND(-ln(
                 0.5 * (c12 + 0.5) / (u1.c1 + 0.5 * v)
                 + 0.5 * (u2.c1 + 0.5) / (total + 0.5 * v)
               ) * 1000000.0) AS BIGINT))
             / (1000000.0 * COUNT(*)) AS avg_nll
    FROM bg
    JOIN bi USING (w1, w2)
    JOIN uni u1 ON bg.w1 = u1.tok
    JOIN uni u2 ON bg.w2 = u2.tok
    CROSS JOIN stats
    GROUP BY doc_id
    """,
    ("LLM-curation",),
)
def text_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated-bigram fluency score: mean nll per document under
    p(w2|w1) = λ·smoothed-bigram + (1−λ)·smoothed-unigram, λ=α=0.5 —
    catches broken word ORDER that the unigram score (text_unigram_nll)
    is blind to. Same bit-reproducibility policy: per-bigram nll
    quantizes to 1e-6 into an int64 sum before the single edge
    division (see bigram_nll_scores)."""
    d = t(spark, sf_dir, "documents")
    return textstats.bigram_nll_scores(d, "text", "doc_id", lam=0.5, alpha=0.5)


@register(
    "dedup_paragraphs_global",
    f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split({_NORM}, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    pb AS (
      SELECT doc_id,
             array_to_string(
               [array_to_string(ws[(i*20+1):(i*20+20)], ' ')
                for i in range(0, CAST(ceil(len(ws) / 20.0) AS INT))],
               chr(10) || chr(10))
             || CASE WHEN doc_id % 4 = 0 THEN chr(10) || chr(10) ||
                  'all rights reserved see our license terms for details'
                ELSE '' END
             || CASE WHEN doc_id % 10 = 0 THEN chr(10) || chr(10) ||
                  'subscribe to our newsletter for weekly updates'
                ELSE '' END AS ptext
      FROM w
    ),
    paras AS (
      SELECT doc_id, idx, p FROM (
        SELECT doc_id,
               unnest([{{'i': i, 'p': lst[i]}}
                       for i in range(1, len(lst) + 1)]) AS u
        FROM (SELECT doc_id,
                     string_split(ptext, chr(10) || chr(10)) AS lst
              FROM pb)
      ) t(doc_id, u), LATERAL (SELECT u['i'] AS idx, u['p'] AS p) l
      WHERE trim(p) <> ''
    ),
    kept AS (
      SELECT doc_id, idx, p FROM (
        SELECT doc_id, idx, p,
               ROW_NUMBER() OVER (PARTITION BY p ORDER BY doc_id, idx)
                 AS rn
        FROM paras
      ) WHERE rn = 1
    ),
    tot AS (SELECT doc_id, COUNT(*) AS n_paras FROM paras GROUP BY doc_id),
    reb AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             md5(string_agg(p, chr(10) || chr(10) ORDER BY idx))
               AS text_md5
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id AS id, t.n_paras,
           COALESCE(r.n_kept, 0) AS n_kept,
           COALESCE(r.text_md5, md5('')) AS text_md5
    FROM tot t LEFT JOIN reb r USING (doc_id)
    """,
    ("LLM-dedup", "LLM-curation"),
)
def dedup_paragraphs_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact paragraph dedup (C4/RefinedWeb rule at
    paragraph granularity): repeated paragraphs keep only their first
    (doc_id, idx) occurrence, documents reassemble in original order.
    The fixture restructures each document into 20-word paragraphs
    and plants two boilerplate paragraphs (license footer on every
    4th doc, newsletter plug on every 10th) — the planted truth: each
    survives exactly once corpus-wide, so n_kept < n_paras on every
    other planted doc. First-occurrence selection is a min(struct)
    hash aggregate on the 64-bit paragraph hash — map-side combined,
    no window sort (see dedup.dedup_paragraphs); the oracle replays
    it with a ROW_NUMBER window over the raw paragraph text."""
    from etl_script_spark.operators.dedup import (
        dedup_paragraphs,
        normalize_text,
    )

    d = t(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(normalize_text(F.col("text")), " "), lambda w: w != ""
    )
    n_p = F.ceil(F.size(ws) / 20.0).cast("int")
    paras = F.when(
        n_p > 0,
        F.transform(
            F.sequence(F.lit(0), n_p - 1),
            lambda i: F.array_join(F.slice(ws, i * 20 + 1, 20), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ptext = F.concat(
        F.array_join(paras, "\n\n"),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.lit(
                "\n\nall rights reserved see our license terms for details"
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 10 == 0,
            F.lit("\n\nsubscribe to our newsletter for weekly updates"),
        ).otherwise(F.lit("")),
    )
    fixed = d.select("doc_id", ptext.alias("ptext"))
    out = dedup_paragraphs(fixed, "ptext", "doc_id")
    return out.select(
        "id", "n_paras", "n_kept", F.md5("text").alias("text_md5")
    )


@register(
    "feat_quantile_binning",
    """
    WITH binned AS (
      SELECT event_type, value,
             NTILE(10) OVER (PARTITION BY event_type
                             ORDER BY value, event_id) AS bin
      FROM events
    )
    SELECT event_type, bin, COUNT(*) AS n,
           MIN(value) AS vmin, MAX(value) AS vmax
    FROM binned GROUP BY event_type, bin
    """,
    ("LLM-features",),
)
def feat_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency discretization (operators/features.quantile_bin):
    NTILE(10) per event type with the event id as the value tiebreak,
    then the per-bin census (count + edge values) — the feature-
    engineering step that turns a heavy-tailed metric into a uniform
    categorical. Rank-based, so outliers cannot collapse the bins the
    way equal-width edges do; the unique tiebreak pins every tie to
    one bin on any engine. The docstring's 100 TB note lives on the
    operator: swap the global sort for approx-quantile edges when
    groups are few and huge."""
    from etl_script_spark.operators import features as feat_ops

    ev = t(spark, sf_dir, "events")
    binned = feat_ops.quantile_bin(
        ev, "event_type", "value", n_bins=10, order_tiebreak="event_id"
    )
    return binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )


# ---------------------------------------------------------------------------
# Sharded training-data export (operators/export.py)
# ---------------------------------------------------------------------------


@register(
    "export_train_shards",
    f"""
    SELECT ('0x' || substr(md5('sh1' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
             % 8 AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split({_NORM}, ' '))) AS BIGINT) AS n_tokens,
           CAST(SUM(length(text)) AS BIGINT) AS n_chars
    FROM documents
    GROUP BY 1
    """,
    ("LLM-curation",),
)
def export_train_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final pipeline stage: export the corpus as 8 hash-assigned
    shards (one parquet file per shard) and return the POST-WRITE
    audit manifest — per-shard doc/token/char counts aggregated from
    the files read back, which the oracle recomputes from the source
    table, so a dropped or truncated shard is a hash mismatch, not a
    silent loss. Assignment is a pure md5-mod projection (stable
    across runs/engines, no sort); the single repartition-on-shard is
    the export's only shuffle. See operators/export.py for the
    100 TB sizing note (shards are multinomial-balanced; n_docs is
    the check)."""
    import os as _os
    import re as _re

    from etl_script_spark.operators import export as export_ops

    sf = _re.sub(r"[^0-9a-zA-Z.]", "_", sf_dir.strip("/"))
    d = f"/tmp/etl_script_spark_io/{sf}/train_shards"
    _os.makedirs(d, exist_ok=True)
    docs = t(spark, sf_dir, "documents")
    return export_ops.write_train_shards(
        docs, f"{d}/corpus", "doc_id", "text", n_shards=8, seed="sh1"
    )


# ---------------------------------------------------------------------------
# DSIR importance resampling (operators/dsir.py)
# ---------------------------------------------------------------------------


@register(
    "curation_dsir_select",
    f"""
    WITH b AS (
      SELECT doc_id, is_t,
             ('0x' || substr(md5('dsir' || gram), 1, 8))::BIGINT % 4096 AS bucket
      FROM (
        SELECT doc_id, (lang = 'en') AS is_t, unnest(grams) AS gram FROM (
          SELECT doc_id, lang,
                 list_concat(ws, CASE WHEN len(ws) >= 2
                   THEN [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]
                   ELSE [] END) AS grams
          FROM (SELECT doc_id, lang,
                       list_filter(string_split({_NORM}, ' '), w -> w <> '') AS ws
                FROM documents)
        )
      )
    ),
    hist AS (SELECT bucket, COUNT(*) AS rc,
                    COUNT(*) FILTER (WHERE is_t) AS tc
             FROM b GROUP BY bucket),
    tot AS (SELECT SUM(rc) AS rt, SUM(tc) AS tt FROM hist),
    tbl AS (SELECT bucket,
                   CAST(ROUND((ln((tc + 0.5) / (tt + 2048.0))
                             - ln((rc + 0.5) / (rt + 2048.0)))
                              * 1000000.0) AS BIGINT) AS lr_q
            FROM hist CROSS JOIN tot)
    SELECT doc_id, n_grams, weight_q FROM (
      SELECT doc_id, COUNT(*) AS n_grams,
             CAST(SUM(lr_q) AS BIGINT) AS weight_q
      FROM b JOIN tbl USING (bucket) GROUP BY doc_id
    ) ORDER BY weight_q DESC, doc_id ASC LIMIT 20
    """,
    ("LLM-curation",),
)
def curation_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): keep the 20 documents
    whose hashed unigram+bigram distribution best matches the target
    domain (here: lang='en') relative to the raw corpus, scored by a
    quantized-integer sum of per-bucket log-likelihood ratios. The
    bucket table is bounded at 4096 rows BY CONSTRUCTION, so its join
    is a safe hard broadcast at any corpus size; selection is
    sort+limit => TakeOrdered. See operators/dsir.py for the full
    scale analysis."""
    from etl_script_spark.operators import dsir

    d = t(spark, sf_dir, "documents")
    w = dsir.dsir_weights(
        d, "doc_id", "text", F.col("lang") == "en", n_buckets=4096, alpha=0.5
    )
    return dsir.dsir_select(w, "doc_id", 20)


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes classifier (operators/classify.py)
# ---------------------------------------------------------------------------


@register(
    "quality_nb_classifier",
    f"""
    WITH d AS (
      SELECT doc_id, COALESCE(lang = 'en', FALSE) AS y,
             ('0x' || substr(md5('nb' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 10 < 8 AS tr,
             list_filter(string_split({_NORM}, ' '), w -> w <> '') AS ws
      FROM documents
    ),
    toks_tr AS (SELECT y, unnest(ws) AS token FROM d WHERE tr),
    vocab AS (SELECT token,
                     COUNT(*) FILTER (WHERE y) AS c1,
                     COUNT(*) FILTER (WHERE NOT y) AS c0
              FROM toks_tr GROUP BY token),
    stats AS (SELECT SUM(c1) AS n1, SUM(c0) AS n0, COUNT(*) AS v FROM vocab),
    model AS (SELECT token,
                     CAST(ROUND((ln((c1 + 0.5) / (n1 + 0.5 * v))
                               - ln((c0 + 0.5) / (n0 + 0.5 * v)))
                                * 1000000.0) AS BIGINT) AS llr_q
              FROM vocab CROSS JOIN stats),
    prior AS (SELECT CAST(ROUND((ln(COUNT(*) FILTER (WHERE y) + 0.5)
                               - ln(COUNT(*) FILTER (WHERE NOT y) + 0.5))
                                * 1000000.0) AS BIGINT) AS prior_q
              FROM d WHERE tr),
    toks_sc AS (SELECT doc_id, unnest(ws) AS token FROM d WHERE NOT tr)
    SELECT doc_id, n_tokens, score_q, score_q > 0 AS predicted FROM (
      SELECT doc_id, COUNT(*) AS n_tokens,
             CAST(prior_q + SUM(llr_q) AS BIGINT) AS score_q
      FROM toks_sc JOIN model USING (token) CROSS JOIN prior
      GROUP BY doc_id, prior_q
    )
    """,
    ("LLM-curation",),
)
def quality_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned corpus gate: multinomial Naive Bayes trained on a
    deterministic md5 80/20 split of the corpus (label: lang='en' —
    the fastText-langid-style task) and scored on the held-out 20%.
    Training is one map-side-combined token aggregation; scoring is
    one vocab join (pinned sort-merge — unhinted, the planner
    broadcast the corpus-sized held-out token explode off a garbage
    filter estimate; see operators/classify.py) + one
    quantized-integer sum, so predictions are
    bit-identical across engines and partitionings. On the fixture
    corpus lang is independent of the token distribution (shared
    31-word vocabulary), so this entry is the cross-engine MECHANICS
    contract; learnability on separable data is pinned in
    tests/test_round6_ops.py. See operators/classify.py for the full
    scale/determinism analysis."""
    from etl_script_spark.operators import classify
    from etl_script_spark.operators.export import shard_id

    d = t(spark, sf_dir, "documents")
    return classify.nb_train_score(
        d,
        "doc_id",
        "text",
        F.coalesce(F.col("lang") == "en", F.lit(False)),
        shard_id(F.col("doc_id"), 10, seed="nb") < 8,
        alpha=0.5,
    )


# ---------------------------------------------------------------------------
# HTML main-content extraction (operators/htmlextract.py)
# ---------------------------------------------------------------------------


@register(
    "extract_html_main_text",
    """
    SELECT doc_id,
           CASE WHEN length(trim(regexp_replace(COALESCE(text, ''),
                                                '\\s+', ' ', 'g'))) >= 30
                THEN trim(regexp_replace(text, '\\s+', ' ', 'g'))
                ELSE '' END AS main_text
    FROM documents
    """,
    ("LLM-curation", "S8"),
)
def extract_html_main_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate removal with a FIRST-PRINCIPLES oracle: each
    document's text is wrapped in a deterministic page skeleton —
    nav link bar, a long link-farm div (75 chars of pure anchor
    text: passes min_len, killed by link density), a too-short
    block, a script body, and a footer — and the extractor must
    return exactly the planted content, whitespace-collapsed. The
    oracle states the expected answer directly from the source
    table (no algorithm replay): a wrong block split, strip order,
    or density threshold fails the hash on every row. Pure
    regex/HOF projection, scan-stage at 100 TB
    (operators/htmlextract.py)."""
    from etl_script_spark.operators import htmlextract

    d = t(spark, sf_dir, "documents")
    spam = "spam link text " * 5
    html = F.concat(
        F.lit(
            '<div class="nav"><a href="/">home</a> <a href="/a">about</a>'
            ' <a href="/c">contact</a></div>'
            "<script>var x = '<p>not text</p>';</script>"
        ),
        F.lit("<p>"),
        F.coalesce(F.col("text"), F.lit("")),
        F.lit("</p>"),
        F.lit(
            f'<div><a href="#">{spam}</a></div>'
            "<p>ok</p>"
            '<div class="footer">copyright <a href="/t">terms</a></div>'
        ),
    )
    return htmlextract.extract_main_text(
        d.select("doc_id", html.alias("html")), "html", "doc_id"
    )


# ---------------------------------------------------------------------------
# Distribution-matched sampling (operators/textstats.py)
# ---------------------------------------------------------------------------


@register(
    "sample_match_length_dist",
    """
    WITH hist AS (
      SELECT CAST(floor(n_chars / 100) * 100 AS BIGINT) AS b,
             COUNT(*) AS c,
             COUNT(*) FILTER (WHERE lang = 'en') AS t
      FROM documents GROUP BY 1
    ),
    q AS (SELECT b, c, t,
                 (CAST(t AS HUGEINT) * 1000000000000) // c AS qv
          FROM hist),
    m AS (SELECT MAX(qv) AS qmax FROM q),
    rates AS (
      SELECT b,
             LEAST(4294967296,
                   (CAST(t AS HUGEINT) * 4294967296 * 1000000000000)
                     // (CAST(c AS HUGEINT) * qmax)) AS thr
      FROM q CROSS JOIN m WHERE t > 0
    )
    SELECT d.doc_id, r.b AS bucket_lo
    FROM documents d
    JOIN rates r ON CAST(floor(d.n_chars / 100) * 100 AS BIGINT) = r.b
    WHERE ('0x' || substr(md5('ld' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
            < r.thr
    """,
    ("LLM-curation",),
)
def sample_match_length_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep a deterministic subset of the corpus whose LENGTH
    histogram is proportional to the lang='en' subset's histogram —
    distribution matching via exact-integer per-bucket keep rates
    (binding bucket keeps ~all) applied as a pure md5 predicate.
    Histogram and rate table are bounded and broadcast; no corpus
    shuffle; reproducible across engines/cluster sizes. The oracle
    replays the integer rate derivation and the predicate verbatim
    (operators/textstats.py:sample_match_distribution)."""
    d = t(spark, sf_dir, "documents")
    kept = textstats.sample_match_distribution(
        d,
        "doc_id",
        (F.floor(F.col("n_chars") / 100) * 100).cast("long"),
        F.col("lang") == "en",
        seed="ld",
    )
    return kept.select("doc_id", F.col("__bucket").alias("bucket_lo"))


@register(
    "sample_weighted_gumbel_topk",
    """
    SELECT doc_id, w, lkey_q FROM (
      SELECT doc_id, n_chars + 1 AS w,
             CAST(ROUND(ln((('0x' || substr(md5('gk' || CAST(doc_id AS VARCHAR)),
                                            1, 8))::BIGINT + 1)
                           / 4294967297.0)
                        / (n_chars + 1) * 1000000000.0) AS BIGINT) AS lkey_q
      FROM documents WHERE n_chars + 1 > 0
    ) ORDER BY lkey_q DESC, doc_id ASC LIMIT 50
    """,
    ("LLM-curation",),
)
def sample_weighted_gumbel_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size weighted sampling without replacement (A-Res /
    Gumbel-top-k family): 50 documents drawn with probability
    proportional to length weight n_chars+1, as one projection +
    TakeOrdered — no shuffle, reproducible across engines and
    cluster sizes (quantized ln(u)/w ranking keys; the oracle
    replays key derivation and ranking verbatim). Complements the
    Bernoulli md5 samplers, which cannot pin the output size
    (operators/textstats.py:weighted_sample_topk)."""
    d = t(spark, sf_dir, "documents")
    out = textstats.weighted_sample_topk(
        d, "doc_id", F.col("n_chars") + 1, n=50, seed="gk"
    )
    return out.select(
        "doc_id", F.col("__w").alias("w"), F.col("__lkey_q").alias("lkey_q")
    )


# ---------------------------------------------------------------------------
# Corpus distribution diagnostics (operators/corpusstats.py)
# ---------------------------------------------------------------------------


@register(
    "corpus_ks_drift",
    """
    WITH per_v AS (
      SELECT n_chars AS v,
             SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS cb
      FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
    ), cum AS (
      SELECT SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cuma,
             SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cumb,
             SUM(ca) OVER () AS na,
             SUM(cb) OVER () AS nb
      FROM per_v
    )
    SELECT CAST(MAX(na) AS BIGINT) AS n_a,
           CAST(MAX(nb) AS BIGINT) AS n_b,
           CAST((MAX(ABS(CAST(cuma AS HUGEINT) * nb
                         - CAST(cumb AS HUGEINT) * na)) * 1000000000)
                // (CAST(MAX(na) AS HUGEINT) * MAX(nb)) AS BIGINT) AS ks_ppb
    FROM cum
    """,
    ("LLM-curation",),
)
def corpus_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test between corpus slices
    (here: English vs non-English document lengths) — the snapshot-QA
    gate that says 'this crawl's length distribution moved'. EXACT
    integer arithmetic end-to-end (cum_a*n_b - cum_b*n_a in
    DECIMAL(38,0)); one map-side-combined groupBy reduces the corpus
    to its distinct lengths before the single ordered CDF pass
    (operators/corpusstats.py:ks_two_sample)."""
    d = t(spark, sf_dir, "documents")
    out = corpusstats.ks_two_sample(d, "n_chars", F.col("lang") == "en")
    return out.select("n_a", "n_b", "ks_ppb")


@register(
    "corpus_psi_drift",
    """
    WITH per_b AS (
      SELECT CAST(floor(n_chars / 200) * 200 AS BIGINT) AS bucket,
             SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_a,
             SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS c_b
      FROM documents GROUP BY 1
    ), sm AS (
      SELECT bucket, c_a, c_b,
             CAST(c_a + 1 AS DOUBLE)
               / (SUM(c_a) OVER () + COUNT(*) OVER ()) AS pa,
             CAST(c_b + 1 AS DOUBLE)
               / (SUM(c_b) OVER () + COUNT(*) OVER ()) AS pb
      FROM per_b
    )
    SELECT bucket, CAST(c_a AS BIGINT) AS c_a, CAST(c_b AS BIGINT) AS c_b,
           CAST(ROUND((pa - pb) * ln(pa / pb) * 1000000.0) AS BIGINT)
             AS psi_term_micro
    FROM sm
    """,
    ("LLM-curation",),
)
def corpus_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index terms per length bucket between the
    English and non-English corpus slices — the bucketed drift metric
    (sum the terms; >0.25 = major shift). Laplace-smoothed so empty-
    on-one-side buckets stay finite; each bucket's single ln() is
    quantized to integer micro-units immediately, so the hashed output
    is engine-exact (operators/corpusstats.py:psi_drift)."""
    d = t(spark, sf_dir, "documents")
    return corpusstats.psi_drift(
        d,
        (F.floor(F.col("n_chars") / 200) * 200).cast("long"),
        F.col("lang") == "en",
    )


@register(
    "corpus_zipf_slope",
    r"""
    WITH freq AS (
      SELECT t AS tok, COUNT(*) AS c FROM (
        SELECT UNNEST(string_split(trim(regexp_replace(lower(text),
                                                       '\s+', ' ', 'g')),
                      ' ')) AS t
        FROM documents
      ) WHERE t <> '' GROUP BY 1
    ), ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok ASC) AS r
      FROM freq ORDER BY c DESC, tok ASC LIMIT 1000
    ), pts AS (
      SELECT CAST(ROUND(ln(CAST(r AS DOUBLE)) * 1000000000.0) AS BIGINT) AS x,
             CAST(ROUND(ln(CAST(c AS DOUBLE)) * 1000000000.0) AS BIGINT) AS y
      FROM ranked WHERE r >= 10
    ), agg AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx
      FROM pts
    ), mom AS (
      SELECT n, sx, sy,
             n * sxy - sx * sy AS num, n * sxx - sx * sx AS den
      FROM agg
    ), sl AS (
      SELECT n, sx, sy,
             CASE WHEN num < 0 THEN -((-num * 1000000000) // den)
                  ELSE (num * 1000000000) // den END AS slope_ppb
      FROM mom
    )
    SELECT CAST(n AS BIGINT) AS n_ranks,
           CAST(slope_ppb AS BIGINT) AS slope_ppb,
           CAST(CASE WHEN sy * 1000000000 - slope_ppb * sx < 0
                     THEN -((-(sy * 1000000000 - slope_ppb * sx))
                            // (n * 1000000000))
                     ELSE (sy * 1000000000 - slope_ppb * sx)
                          // (n * 1000000000) END AS BIGINT) AS intercept_ppb
    FROM sl
    """,
    ("LLM-curation",),
)
def corpus_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency slope of the corpus token spectrum (OLS of
    ln freq on ln rank over ranks 10..1000): natural language sits
    near -1; boilerplate-heavy or degenerate corpora drift away — a
    one-number corpus-health check. One vocabulary aggregation +
    top-k; nano-quantized logs make the OLS moments exact integers,
    and the ppb divisions are sign-split round-toward-zero on both
    engines (operators/corpusstats.py:zipf_slope)."""
    d = t(spark, sf_dir, "documents")
    return corpusstats.zipf_slope(d, "text", top_k=1000, min_rank=10)


@register(
    "sample_exact_per_stratum",
    """
    SELECT source, doc_id, rnk FROM (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5('ps' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
             ) AS rnk
      FROM documents
    ) WHERE rnk <= 20
    """,
    ("LLM-curation",),
)
def sample_exact_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size per-stratum sample: exactly 20 documents per source
    (balanced eval-set construction — rate-based sampling pins only
    the expectation). Rank-by-md5 within each stratum: one shuffle on
    the stratum key, deterministic across engines and partitionings
    (operators/textstats.py:stratified_exact_sample)."""
    d = t(spark, sf_dir, "documents")
    out = textstats.stratified_exact_sample(d, "doc_id", "source", 20)
    return out.select("source", "doc_id", F.col("__rank").alias("rnk"))


# ---------------------------------------------------------------------------
# Round-6b curation operators: preference pairs, budgeted selection,
# score calibration, profile drift
# ---------------------------------------------------------------------------


@register(
    "rlhf_preference_pairs",
    """
    WITH scored AS (
      SELECT doc_id % 97 AS grp, doc_id, n_chars AS score FROM documents
    ),
    best AS (
      SELECT grp, doc_id AS chosen_id, score AS s_hi,
             ROW_NUMBER() OVER (PARTITION BY grp
                                ORDER BY score DESC, doc_id DESC) AS rn
      FROM scored
    ),
    worst AS (
      SELECT grp, doc_id AS rejected_id, score AS s_lo,
             ROW_NUMBER() OVER (PARTITION BY grp
                                ORDER BY score ASC, doc_id ASC) AS rn
      FROM scored
    )
    SELECT b.grp AS "group", b.chosen_id, w.rejected_id,
           b.s_hi - w.s_lo AS margin
    FROM best b JOIN worst w ON b.grp = w.grp
    WHERE b.rn = 1 AND w.rn = 1 AND b.chosen_id <> w.rejected_id
    """,
    ("LLM-curation",),
)
def rlhf_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO/RLHF preference-pair construction: per prompt group, pair
    the best-scored response with the worst (fixture: doc_id%97 as the
    prompt group, n_chars as the reward). ONE map-side-combinable
    aggregation via max/min(struct(score,id)) — no window, no second
    shuffle at billions of (prompt, response) rows; the tie policy
    (chosen = largest id, rejected = smallest) is deterministic struct
    ordering, replayed by the oracle's ranked CTEs
    (operators/conversations.py:preference_pairs)."""
    d = t(spark, sf_dir, "documents")
    scored = d.select(
        (F.col("doc_id") % 97).alias("grp"), "doc_id", F.col("n_chars")
    )
    out = conversations.preference_pairs(
        scored, "grp", "doc_id", F.col("n_chars")
    )
    return out.select(
        F.col("group"), "chosen_id", "rejected_id", "margin"
    )


@register(
    "curation_token_budget_select",
    f"""
    WITH base AS (
      SELECT doc_id AS id, doc_id % 37 AS score,
             len({_WS_SQL}) AS n_tok
      FROM documents
    ), grades AS (
      SELECT score, SUM(n_tok) AS gtok FROM base WHERE n_tok > 0 GROUP BY 1
    ), lim AS (
      SELECT score,
             SUM(gtok) OVER (ORDER BY score DESC ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW) AS cum,
             SUM(gtok) OVER (ORDER BY score DESC ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW) - gtok AS bef
      FROM grades
    ), j AS (
      SELECT b.id, b.score, b.n_tok, l.cum, l.bef
      FROM base b JOIN lim l USING (score) WHERE b.n_tok > 0
    )
    SELECT id, score, n_tok FROM j WHERE cum <= 10000
    UNION ALL
    SELECT id, score, n_tok FROM (
      SELECT id, score, n_tok, bef,
             SUM(n_tok) OVER (PARTITION BY score ORDER BY id ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND
                              CURRENT ROW) AS dcum
      FROM j WHERE bef < 10000 AND cum > 10000
    ) WHERE bef + dcum <= 10000
    """,
    ("LLM-curation",),
)
def curation_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget-constrained selection: the best-scored documents
    that fit a 10k-token budget, WITHOUT a global sort — per-grade
    token mass + a cumulative pass over the (tiny) grade table finds
    the boundary grade; whole grades keep with no per-row ordering and
    only the boundary grade ranks its rows (fixture: doc_id%37 as the
    model grade, whitespace tokens)
    (operators/textstats.py:token_budget_select)."""
    d = t(spark, sf_dir, "documents")
    out = textstats.token_budget_select(
        d,
        "doc_id",
        F.col("doc_id") % 37,
        textstats.token_count_ws(F.col("text")),
        budget=10_000,
    )
    return out.select(F.col("id"), "score", "n_tok")


@register(
    "quality_rank_calibration",
    """
    SELECT doc_id, source, rnk,
           CAST(CASE WHEN n <= 1 THEN 0
                     ELSE ((rnk - 1) * 1000000) // (n - 1) END AS BIGINT)
             AS pr_ppm
    FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars ASC, doc_id ASC) AS rnk,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents
    )
    """,
    ("LLM-curation",),
)
def quality_rank_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source percent-rank calibration of a quality score (fixture:
    n_chars as the raw score): 'better than X% of its own source' is
    the cross-domain-comparable quantity one global mixing threshold
    can act on. Exact integer ppm (rank-1)*1e6 DIV (n-1); one shuffle
    on source (operators/quality.py:rank_calibrate)."""
    d = t(spark, sf_dir, "documents")
    out = quality_ops.rank_calibrate(d, "doc_id", "source", F.col("n_chars"))
    return out.select("doc_id", "source", "rnk", "pr_ppm")


@register(
    "dq_profile_drift",
    """
    WITH old AS (SELECT * FROM documents WHERE doc_id % 10 <> 7),
    new AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 3 THEN NULL ELSE lang END AS lang,
             source
      FROM documents WHERE doc_id % 10 <> 2
    ),
    po AS (
      SELECT 'lang' AS column_name, COUNT(*) AS n_rows,
             SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS n_null,
             COUNT(DISTINCT lang) AS n_distinct FROM old
      UNION ALL
      SELECT 'source', COUNT(*),
             SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END),
             COUNT(DISTINCT source) FROM old
    ),
    pn AS (
      SELECT 'lang' AS column_name, COUNT(*) AS n_rows,
             SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS n_null,
             COUNT(DISTINCT lang) AS n_distinct FROM new
      UNION ALL
      SELECT 'source', COUNT(*),
             SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END),
             COUNT(DISTINCT source) FROM new
    )
    SELECT po.column_name,
           CAST(po.n_rows AS BIGINT) AS old_rows,
           CAST(po.n_null AS BIGINT) AS old_null,
           CAST(po.n_distinct AS BIGINT) AS old_distinct,
           CAST(pn.n_rows AS BIGINT) AS new_rows,
           CAST(pn.n_null AS BIGINT) AS new_null,
           CAST(pn.n_distinct AS BIGINT) AS new_distinct
    FROM po JOIN pn USING (column_name)
    """,
    ("LLM-curation", "DQ"),
)
def dq_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile drift between two dataset snapshots: per-column
    (rows, nulls, exact distincts) computed in ONE aggregation pass per
    snapshot, unpivoted and joined — the schema-health companion to
    corpus_snapshot_diff's row-level diff (fixture: the new snapshot
    nulls lang for doc_id%7=3 and shifts membership by the same %10
    rule). At 100 TB swap count_distinct for approx_count_distinct —
    same single-pass shape
    (operators/expectations.py:profile_columns)."""
    d = t(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 10 != 7).select("doc_id", "lang", "source")
    new = d.filter(F.col("doc_id") % 10 != 2).select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 3, F.lit(None)).otherwise(
            F.col("lang")
        ).alias("lang"),
        "source",
    )
    po = expectations.profile_columns(old, ["lang", "source"])
    pn = expectations.profile_columns(new, ["lang", "source"])
    return po.select(
        "column_name",
        F.col("n_rows").alias("old_rows"),
        F.col("n_null").alias("old_null"),
        F.col("n_distinct").alias("old_distinct"),
    ).join(
        pn.select(
            "column_name",
            F.col("n_rows").alias("new_rows"),
            F.col("n_null").alias("new_null"),
            F.col("n_distinct").alias("new_distinct"),
        ),
        "column_name",
    ).select(
        "column_name",
        "old_rows",
        "old_null",
        "old_distinct",
        "new_rows",
        "new_null",
        "new_distinct",
    )


@register(
    "augment_mlm_mask",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(ws) AS tok,
             unnest(range(0, len(ws))) AS pos
      FROM (SELECT doc_id, {_WS_SQL} AS ws FROM documents)
    ), marked AS (
      SELECT doc_id, tok, pos,
             substr(md5('mm' || chr(31) || CAST(doc_id AS VARCHAR)
                        || chr(31) || CAST(pos AS VARCHAR)), 1, 8)
               < '26666666' AS m
      FROM toks
    )
    SELECT doc_id AS id,
           string_agg(CASE WHEN m THEN '[MASK]' ELSE tok END, ' '
                      ORDER BY pos) AS masked_text,
           COALESCE(CAST(to_json(list(CAST(pos AS VARCHAR) || ':' || tok
                                      ORDER BY pos) FILTER (WHERE m))
                         AS VARCHAR), '[]') AS targets_json,
           COUNT(*) FILTER (WHERE m) AS n_masked
    FROM marked GROUP BY doc_id
    """,
    ("LLM-curation",),
)
def augment_mlm_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denoising-objective corpus prep: deterministically mask ~15% of
    tokens per document (BERT-style MLM), emitting the masked text and
    the position-ordered recovery targets. Per-(doc, position) md5
    selection — no RNG stream, reproducible anywhere; the Spark side
    is pure higher-order array functions (zip_with/filter — zero
    explode, zero shuffle, scan-speed at 100 TB) while the oracle
    replays it relationally via positional unnest + reassembly
    (operators/textstats.py:mlm_mask). 0x26666666/16^8 = 0.15."""
    d = t(spark, sf_dir, "documents")
    out = textstats.mlm_mask(d, "text", "doc_id", rate=0.15, seed="mm")
    return out.select(
        "id",
        "masked_text",
        "targets_json",
        F.col("n_masked").cast("long").alias("n_masked"),
    )


@register(
    "contrastive_inbatch_negatives",
    """
    WITH b AS (
      SELECT vec_id,
             ('0x' || substr(md5('b' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT
               % 16 AS batch,
             md5('r' || CAST(vec_id AS VARCHAR)) AS ring
      FROM embeddings
    ), p AS (
      SELECT vec_id, batch,
             ROW_NUMBER() OVER (PARTITION BY batch
                                ORDER BY ring ASC, vec_id ASC) - 1 AS i,
             COUNT(*) OVER (PARTITION BY batch) AS m
      FROM b
    ), a AS (
      SELECT vec_id AS id, batch, i, m,
             unnest(range(1, CAST(least(4, m - 1) AS BIGINT) + 1)) AS off
      FROM p WHERE m > 1
    )
    SELECT a.id, q.vec_id AS negative_id, CAST(a.off AS INT) AS off
    FROM a JOIN p q ON q.batch = a.batch AND q.i = (a.i + a.off) % a.m
    """,
    ("LLM-similarity",),
)
def contrastive_inbatch_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-batch negative sampling over the embedding corpus: md5-bucket
    rows into 16 pseudo-random batches, ring-order each batch, and
    emit every anchor's next <=4 cyclic neighbors as its contrastive
    negatives — deterministic, self-pair-free, one shuffle + array
    functions; the oracle replays it relationally (ranked positions +
    modular self-join) (operators/similarity.py:inbatch_negatives)."""
    d = t(spark, sf_dir, "embeddings")
    out = similarity.inbatch_negatives(d, "vec_id", k=4, n_batches=16)
    return out.select(
        F.col("id"), "negative_id", F.col("off").cast("int").alias("off")
    )


@register(
    "decontam_bloom_ngram",
    f"""
    WITH bench(s) AS (VALUES {_BENCH_VALUES}),
    bg AS (
      SELECT flatten(list({_GRAMS8.format(ws="string_split(s, ' ')")})) AS grams
      FROM bench
    ),
    sent AS (SELECT list(s ORDER BY s) AS arr FROM bench),
    inj AS (
      SELECT doc_id,
             trim(regexp_replace(lower(
               text || CASE WHEN doc_id % 10 = 3 THEN ' ' ||
                 arr[CAST((doc_id // 10) % 3 AS INT) + 1]
               ELSE '' END), '\\s+', ' ', 'g')) AS norm
      FROM documents CROSS JOIN sent
    ),
    hits AS (
      SELECT doc_id,
             len(list_intersect(
               {_GRAMS8.format(ws="string_split(norm, ' ')")},
               grams)) AS n_overlap
      FROM inj CROSS JOIN bg
    )
    SELECT doc_id, n_overlap FROM hits WHERE n_overlap > 0
    """,
    ("LLM-curation",),
)
def decontam_bloom_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned benchmark decontamination — the scale path when
    the eval-suite gram set outgrows an exact broadcast: a fixed-width
    Bloom bitmap (2-16 KB however large the suite) prunes the corpus
    gram stream executor-side, and only survivors hit the exact
    verify join. Output is EXACT (no false negatives + string
    re-verify), so the oracle is the same exact-overlap SQL as
    decontam_ngram_overlap; same planted fixture
    (operators/decontam.py:contamination_report_bloom)."""
    d = t(spark, sf_dir, "documents")
    bench_sorted = sorted(_BENCH)
    arr = F.array(*[F.lit(s) for s in bench_sorted])
    corpus = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 10 == 3,
                F.concat(
                    F.lit(" "),
                    F.element_at(
                        arr,
                        ((F.col("doc_id") / F.lit(10)).cast("long") % 3).cast(
                            "int"
                        )
                        + 1,
                    ),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    bench = spark.createDataFrame([(s,) for s in bench_sorted], ["text"])
    return decontam.contamination_report_bloom(
        corpus, bench, "text", "doc_id", n=8, m_bits=1 << 14
    )


@register(
    "augment_span_corruption",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(ws) AS tok,
             unnest(range(0, len(ws))) AS pos
      FROM (SELECT doc_id, {_WS_SQL} AS ws FROM documents)
    ), marked AS (
      SELECT doc_id, tok, pos,
             CASE WHEN substr(md5('sc' || chr(31) || CAST(doc_id AS VARCHAR)
                                  || chr(31) || CAST(pos AS VARCHAR)), 1, 8)
                       < '0ccccccc'
                  THEN pos + 2 +
                       (('0x' || substr(md5('sc' || chr(31)
                                             || CAST(doc_id AS VARCHAR)
                                             || chr(31)
                                             || CAST(pos AS VARCHAR)),
                                        9, 1))::INT % 3)
                  ELSE -1 END AS reach
      FROM toks
    ), cov AS (
      SELECT *,
             MAX(reach) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
                              ROW) > pos AS covered,
             COALESCE(MAX(reach) OVER (PARTITION BY doc_id ORDER BY pos
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) > pos,
                      FALSE) AS covered_prev
      FROM marked
    ), sp AS (
      SELECT *,
             SUM(CASE WHEN covered AND NOT covered_prev THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS span_id,
             covered AND NOT covered_prev AS new_span
      FROM cov
    ), pieces AS (
      SELECT doc_id, pos, span_id,
             CASE WHEN NOT covered THEN tok
                  WHEN new_span THEN '<extra_id_'
                       || CAST(span_id - 1 AS VARCHAR) || '>' END AS ip,
             CASE WHEN covered THEN
               CASE WHEN new_span THEN '<extra_id_'
                         || CAST(span_id - 1 AS VARCHAR) || '> ' || tok
                    ELSE tok END END AS tp
      FROM sp
    )
    SELECT doc_id AS id,
           COALESCE(string_agg(ip, ' ' ORDER BY pos)
                      FILTER (WHERE ip IS NOT NULL), '') AS corrupted,
           COALESCE(string_agg(tp, ' ' ORDER BY pos)
                      FILTER (WHERE tp IS NOT NULL) || ' ', '')
             || '<extra_id_' || CAST(MAX(span_id) AS VARCHAR) || '>'
             AS target,
           CAST(MAX(span_id) AS BIGINT) AS n_spans
    FROM pieces GROUP BY doc_id
    """,
    ("LLM-curation",),
)
def augment_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption pairs over the corpus: ~15% of tokens
    hidden in merged 2-4-token spans behind numbered sentinels, input
    and target emitted per document. Deterministic per (doc, position)
    md5 span starts; overlaps merge by interval union (running-max
    window). One shuffle on doc_id, linear per document; the oracle
    replays every window relationally
    (operators/textstats.py:span_corrupt). 0x0ccccccc/16^8 = 0.05."""
    d = t(spark, sf_dir, "documents")
    return textstats.span_corrupt(d, "text", "doc_id", start_rate=0.05)


@register(
    "corpus_heaps_law",
    f"""
    WITH ids AS (SELECT DISTINCT doc_id FROM documents),
    n AS (SELECT COUNT(*) AS n_docs FROM ids),
    ranked AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS r FROM ids
    ),
    rk AS (
      SELECT DISTINCT greatest(1, n_docs >> k.k) AS r
      FROM n CROSS JOIN (SELECT unnest(range(0, 8)) AS k) k
    ),
    bounds AS (
      SELECT rk.r AS prefix_docs, ranked.doc_id AS bound
      FROM rk JOIN ranked ON ranked.r = rk.r
    ),
    toks AS (
      SELECT doc_id, unnest(ws) AS t
      FROM (SELECT doc_id, {_WS_SQL} AS ws FROM documents)
    ),
    first AS (
      SELECT t, MIN(doc_id) AS first_id FROM toks WHERE t <> ''
      GROUP BY t
    )
    SELECT b.prefix_docs, COUNT(*) AS vocab
    FROM bounds b JOIN first f ON f.first_id <= b.bound
    GROUP BY 1
    """,
    ("LLM-curation",),
)
def corpus_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth: distinct-vocabulary size at
    geometric corpus prefixes (N, N/2, ..., N/128 documents in id
    order) — the crawl-health companion to corpus_zipf_slope (a
    flattening curve = the crawl is re-reading itself). One token
    aggregation computes each token's first document; every curve
    point answers from that reduced frame — the corpus is read once
    regardless of points (operators/corpusstats.py:heaps_curve)."""
    d = t(spark, sf_dir, "documents")
    out = corpusstats.heaps_curve(d, "text", "doc_id", n_points=8)
    return out.select(
        F.col("prefix_docs").cast("long").alias("prefix_docs"), "vocab"
    )


@register(
    "split_group_aware",
    f"""
    WITH g AS (
      SELECT doc_id, md5({_NORM}) AS group_fp FROM documents
    )
    SELECT doc_id, group_fp,
           CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id, group_fp,
             ('0x' || substr(md5('split' || group_fp), 1, 8))::BIGINT % 100
               AS b
      FROM g
    )
    """,
    ("LLM-curation", "LLM-sampling"),
)
def split_group_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: the split is assigned to the
    exact-content GROUP (md5 of normalized text), not the document,
    so every duplicate lands on the same side of the train/test fence
    by construction — the GroupShuffleSplit contract done with
    deterministic hashing (operators/splits.py:group_aware_split;
    pass a near-dup cluster id for the fuzzy-leakage variant).
    80/10/10 on md5 buckets; pure scan-stage projection, zero
    shuffle, engine-replayable assignment."""
    from etl_script_spark.operators import splits

    d = t(spark, sf_dir, "documents")
    return splits.group_aware_split(d, "doc_id", text_col="text").select(
        "doc_id", "group_fp", "split"
    )


@register(
    "text_readability_flesch",
    f"""
    WITH ws AS (
      SELECT doc_id,
             list_filter(string_split({_NORM}, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    px AS (
      SELECT doc_id,
             array_to_string(
               [ws[i] || CASE WHEN i % (8 + doc_id % 5) = 0
                              THEN '.' ELSE '' END
                for i in range(1, len(ws) + 1)], ' ') AS text2
      FROM ws
    )
    SELECT doc_id AS id,
           CAST(len(list_filter(string_split(text2, ' '), x -> x <> ''))
                AS BIGINT) AS n_words,
           CAST(greatest(len(regexp_extract_all(text2, '[.!?]+')), 1)
                AS BIGINT) AS n_sentences,
           CAST(len(regexp_extract_all(lower(text2), '[aeiouy]+'))
                AS BIGINT) AS n_syllables,
           CAST(206835
                - (1015 * len(list_filter(string_split(text2, ' '),
                                          x -> x <> '')))
                  // greatest(len(regexp_extract_all(text2, '[.!?]+')), 1)
                - (84600 * len(regexp_extract_all(lower(text2),
                                                  '[aeiouy]+')))
                  // greatest(len(list_filter(string_split(text2, ' '),
                                              x -> x <> '')), 1)
                AS BIGINT) AS flesch_milli
    FROM px
    """,
    ("LLM-curation", "quality"),
)
def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease over the corpus
    (textstats.flesch_readability) in exact integer milli-points.
    The fixture corpus carries no sentence punctuation, so the entry
    INJECTS it deterministically — a period after every
    ``8 + doc_id % 5``-th word — the same both-engines-replay-the-
    fixture discipline as the PII and paragraph entries. The operator
    itself is pure scan-stage column arithmetic (three regexp counts,
    zero shuffles)."""
    d = t(spark, sf_dir, "documents")
    ws = F.filter(textstats.words(F.col("text")), lambda x: x != "")
    sent_len = (F.col("doc_id") % 5 + 8).cast("int")
    text2 = F.array_join(
        F.transform(
            ws,
            lambda w, i: F.concat(
                w,
                F.when((i + 1) % sent_len == 0, F.lit(".")).otherwise(
                    F.lit("")
                ),
            ),
        ),
        " ",
    )
    return textstats.flesch_readability(
        d.select("doc_id", text2.alias("text")), "text", "doc_id"
    )


@register(
    "text_stupid_backoff",
    f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split({_NORM}, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    tk AS (
      SELECT doc_id, u['w'] AS w, u['w1'] AS w1, u['w2'] AS w2 FROM (
        SELECT doc_id,
               unnest([{{'w': ws[i],
                         'w1': if(i > 1, ws[i-1], NULL),
                         'w2': if(i > 2, ws[i-2], NULL)}}
                       for i in range(1, len(ws) + 1)]) AS u
        FROM w WHERE len(ws) >= 1
      )
    ),
    uni AS (SELECT w, COUNT(*) AS cw FROM tk GROUP BY w),
    bi AS (SELECT w1, w, COUNT(*) AS c12 FROM tk
           WHERE w1 IS NOT NULL GROUP BY w1, w),
    tri AS (SELECT w2, w1, w, COUNT(*) AS c123 FROM tk
            WHERE w2 IS NOT NULL GROUP BY w2, w1, w),
    tot AS (SELECT CAST(SUM(cw) AS BIGINT) AS T FROM uni)
    SELECT tk.doc_id AS id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE
             WHEN tk.w2 IS NOT NULL AND tri.c123 IS NOT NULL
               THEN (tri.c123 * 1000000) // b2.c12
             WHEN tk.w2 IS NOT NULL AND bi.c12 IS NOT NULL
               THEN (2 * bi.c12 * 1000000) // (5 * u1.cw)
             WHEN tk.w2 IS NOT NULL
               THEN (4 * u.cw * 1000000) // (25 * T)
             WHEN tk.w1 IS NOT NULL AND bi.c12 IS NOT NULL
               THEN (bi.c12 * 1000000) // u1.cw
             WHEN tk.w1 IS NOT NULL
               THEN (2 * u.cw * 1000000) // (5 * T)
             ELSE (u.cw * 1000000) // T END) AS BIGINT) AS fluency_ppm_sum
    FROM tk
    LEFT JOIN tri ON tk.w2 = tri.w2 AND tk.w1 = tri.w1 AND tk.w = tri.w
    LEFT JOIN bi b2 ON tk.w2 = b2.w1 AND tk.w1 = b2.w
    LEFT JOIN bi ON tk.w1 = bi.w1 AND tk.w = bi.w
    LEFT JOIN uni u1 ON tk.w1 = u1.w
    JOIN uni u ON tk.w = u.w
    CROSS JOIN tot
    GROUP BY tk.doc_id
    """,
    ("LLM-curation", "quality"),
)
def text_stupid_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram stupid-backoff fluency per document
    (textstats.stupid_backoff_scores; Brants et al. 2007), counts
    trained on the corpus itself. All per-token scores are exact
    integer ppm with the 0.4 backoff as the rational 2/5, so the
    document sums hash identically across engines."""
    d = t(spark, sf_dir, "documents")
    return textstats.stupid_backoff_scores(d, "text", "doc_id")


@register(
    "text_code_detect",
    r"""
    WITH px AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 7 = 0
               THEN ' def f' || CAST(doc_id AS VARCHAR)
                    || '(x): if x >= ' || CAST(doc_id % 100 AS VARCHAR)
                    || ': return [x]; else: return {x: x};'
               ELSE '' END AS text2
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(length(text2) AS BIGINT) AS n_chars,
             CAST(len(regexp_extract_all(text2, '[{}();=<>\[\]]'))
                  AS BIGINT) AS sym,
             CAST(len(regexp_extract_all(text2, '[0-9]')) AS BIGINT)
               AS dig,
             CAST(len(regexp_extract_all(lower(text2),
                  '\b(def|class|return|import|for|while|if|else)\b'))
                  AS BIGINT) AS kw_hits
      FROM px
    )
    SELECT doc_id AS id, n_chars,
           CAST((sym * 1000000) // greatest(n_chars, 1) AS BIGINT)
             AS symbol_ppm,
           CAST((dig * 1000000) // greatest(n_chars, 1) AS BIGINT)
             AS digit_ppm,
           kw_hits,
           ((sym * 1000000) // greatest(n_chars, 1)) > 20000
             OR kw_hits >= 3 AS is_code
    FROM m
    """,
    ("LLM-curation", "quality"),
)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose routing signals (textstats.code_signals): symbol
    density, digit density, word-bounded keyword hits and the cheap
    router gate, all exact integer ppm. The fixture corpus is pure
    prose, so every 7th document gets a deterministic injected code
    snippet — the same both-engines-replay discipline as the PII and
    readability entries."""
    d = t(spark, sf_dir, "documents")
    snippet = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.lit(" def f"), F.col("doc_id").cast("string"),
            F.lit("(x): if x >= "),
            (F.col("doc_id") % 100).cast("string"),
            F.lit(": return [x]; else: return {x: x};"),
        ),
    ).otherwise(F.lit(""))
    px = d.select(
        "doc_id", F.concat(F.col("text"), snippet).alias("text")
    )
    return textstats.code_signals(px, "text", "doc_id")


@register(
    "text_top_keywords",
    f"""
    WITH tf AS (
      SELECT id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM (
        SELECT doc_id AS id,
               unnest(list_filter(string_split({_NORM}, ' '),
                                  x -> x <> '')) AS w
        FROM documents
      ) GROUP BY id, w
    ),
    dfq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
    nn AS (SELECT CAST(COUNT(DISTINCT id) AS BIGINT) AS N FROM tf),
    sc AS (
      SELECT tf.id, tf.w, tf.tf * ((N * 1000000) // df) AS score
      FROM tf JOIN dfq USING (w) CROSS JOIN nn
    ),
    rk AS (
      SELECT id, w, score,
             ROW_NUMBER() OVER (PARTITION BY id
                                ORDER BY score DESC, w ASC) AS r
      FROM sc
    )
    SELECT id, string_agg(w, '|' ORDER BY r) AS keywords,
           CAST(MAX(score) AS BIGINT) AS top_score
    FROM rk WHERE r <= 5 GROUP BY id
    """,
    ("LLM-curation", "X-search"),
)
def text_top_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 keywords by tf x linear-idf
    (textstats.top_keywords): the linear-idf variant keeps the
    ranking comparison in exact integers (log-idf would decide rank
    order on a float ulp). Keywords emit as a '|'-joined ordered
    string."""
    d = t(spark, sf_dir, "documents")
    return textstats.top_keywords(d, "text", "doc_id", k=5)


@register(
    "text_pmi_collocations",
    f"""
    WITH w AS (
      SELECT list_filter(string_split({_NORM}, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    w2 AS (SELECT ws FROM w WHERE len(ws) >= 2),
    bg AS (
      SELECT u['w1'] AS w1, u['w2'] AS w2 FROM (
        SELECT unnest(list_transform(range(1, len(ws)),
               i -> {{'w1': ws[i], 'w2': ws[i+1]}})) AS u
        FROM w2
      )
    ),
    bi AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS pair_count
           FROM bg GROUP BY 1, 2),
    l AS (SELECT w1 AS tk, CAST(COUNT(*) AS HUGEINT) AS c_left
          FROM bg GROUP BY 1),
    r AS (SELECT w2 AS tk, CAST(COUNT(*) AS HUGEINT) AS c_right
          FROM bg GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n_bg FROM bg)
    SELECT w1, w2, pair_count,
           CAST((CAST(pair_count AS HUGEINT) * n_bg * 1000000)
                // (c_left * c_right) AS BIGINT) AS lift_ppm
    FROM bi JOIN l ON bi.w1 = l.tk JOIN r ON bi.w2 = r.tk CROSS JOIN n
    WHERE pair_count >= 5
    ORDER BY lift_ppm DESC, w1, w2
    LIMIT 100
    """,
    ("LLM-curation", "X-statistics"),
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 collocations by PMI lift (textstats.pmi_collocations):
    adjacent word pairs ranked by N·c(xy)/(c_left(x)·c_right(y)) in
    exact integer ppm — the monotone transform of PMI, so no engine
    takes a log and the rank order cannot flip on a float ulp. The
    phrase-discovery pass a tokenizer-merge or stopword audit runs
    over a pretraining corpus (Church & Hanks 1990)."""
    d = t(spark, sf_dir, "documents")
    return textstats.pmi_collocations(d, "text", min_count=5, k=100)


@register(
    "text_kneser_ney_bigrams",
    f"""
    WITH w AS (
      SELECT list_filter(string_split({_NORM}, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    w2 AS (SELECT ws FROM w WHERE len(ws) >= 2),
    bg AS (
      SELECT u['w1'] AS w1, u['w2'] AS w2 FROM (
        SELECT unnest(list_transform(range(1, len(ws)),
               i -> {{'w1': ws[i], 'w2': ws[i+1]}})) AS u
        FROM w2
      )
    ),
    bi AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
           FROM bg GROUP BY 1, 2),
    l AS (SELECT w1 AS tk, CAST(SUM(c12) AS HUGEINT) AS c1,
                 CAST(COUNT(*) AS HUGEINT) AS t1
          FROM bi GROUP BY 1),
    r AS (SELECT w2 AS tk, CAST(COUNT(*) AS HUGEINT) AS c2types
          FROM bi GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n_types FROM bi)
    SELECT w1, w2, c12,
           CAST(((GREATEST(4 * CAST(c12 AS HUGEINT) - 3, 0) * n_types
                  + 3 * t1 * c2types) * 1000000)
                // (4 * c1 * n_types) AS BIGINT) AS pkn_ppm
    FROM bi JOIN l ON bi.w1 = l.tk JOIN r ON bi.w2 = r.tk CROSS JOIN n
    WHERE c12 >= 5
    ORDER BY c12 DESC, w1, w2
    LIMIT 100
    """,
    ("LLM-curation", "X-statistics"),
)
def text_kneser_ney_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities with the d=0.75
    discount in EXACT quarter-unit integers
    (textstats.kneser_ney_bigrams): absolute discounting plus the
    continuation-count back-off ('francisco' is frequent but follows
    only 'san'), the real LM smoothing next to stupid backoff — and
    before ppm flooring the conditional distribution sums to exactly
    1 per context (pinned by unit test). Four count aggregations and
    vocabulary-table joins, no log anywhere."""
    d = t(spark, sf_dir, "documents")
    return textstats.kneser_ney_bigrams(d, "text", k=100, min_count=5)


@register(
    "curation_soft_dedup_weights",
    f"""
    WITH keyed AS (
      SELECT doc_id AS id, md5({_NORM}) AS fp FROM documents
    ),
    sz AS (SELECT fp, CAST(COUNT(*) AS BIGINT) AS cluster_size
           FROM keyed GROUP BY 1)
    SELECT id, cluster_size,
           CAST(1000000 // cluster_size AS BIGINT) AS weight_ppm
    FROM keyed JOIN sz USING (fp)
    """,
    ("LLM-curation", "D1"),
)
def curation_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoftDeDup sampling weights (dedup.soft_dedup_weights): exact
    duplicates are DOWN-WEIGHTED to 1/|cluster| ppm instead of
    dropped, preserving duplication count as a signal and keeping
    every row available for the weighted samplers (Xia et al. 2024).
    One md5-keyed aggregation + join back — the minimum shuffle any
    exact-dup pass pays."""
    from etl_script_spark.operators import dedup as ddp

    d = t(spark, sf_dir, "documents")
    return ddp.soft_dedup_weights(d, "text", "doc_id")


@register(
    "augment_token_dropout",
    f"""
    WITH toks AS (
      SELECT doc_id AS id, tok, pos
      FROM (
        SELECT doc_id, unnest(ws) AS tok,
               unnest(range(0, len(ws))) AS pos
        FROM (SELECT doc_id, {_WS_SQL} AS ws FROM documents)
      ) WHERE tok != ''
    ),
    marked AS (
      SELECT id, tok, pos,
             substr(md5('td' || chr(31) || CAST(id AS VARCHAR)
                        || chr(31) || CAST(pos AS VARCHAR)), 1, 8)
               < '19999999' AS d
      FROM toks
    )
    SELECT id,
           COALESCE(string_agg(CASE WHEN NOT d THEN tok END, ' '
                               ORDER BY pos), '') AS augmented,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) FILTER (WHERE d) AS BIGINT) AS n_dropped
    FROM marked GROUP BY id
    """,
    ("LLM-curation",),
)
def augment_token_dropout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-dropout augmentation at 10% (textstats.token_dropout;
    BART's token deletion): each token independently dropped by the
    pure md5 predicate over (seed, doc, position) — the augmented
    corpus regenerates bit-for-bit on any cluster. posexplode + one
    ordered reassembly per doc, a single shuffle on the doc id.
    0x19999999/16^8 = 0.1."""
    d = t(spark, sf_dir, "documents")
    return textstats.token_dropout(
        d, "text", "doc_id", rate_ppm=100000, seed="td"
    )


@register(
    "curation_batch_budget",
    f"""
    WITH base AS (
      SELECT doc_id AS id,
             CAST(len(list_filter({_WS_SQL}, w -> w != '')) AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    banded AS (
      SELECT id, n_tokens,
             CAST(length(to_base(n_tokens, 2)) - 1 AS INT) AS band
      FROM base WHERE n_tokens > 0
    ),
    packed AS (
      SELECT id, n_tokens, band,
             SUM(n_tokens) OVER (
               PARTITION BY band
               ORDER BY md5('bb' || CAST(id AS VARCHAR)) ASC, id ASC
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM banded
    )
    SELECT id, n_tokens, band,
           CAST((CAST(cum AS HUGEINT) - n_tokens) // 500 AS BIGINT)
             AS batch_id
    FROM packed
    """,
    ("LLM-curation",),
)
def curation_batch_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget batch planning at 500 tokens/batch
    (textstats.batch_by_token_budget): documents band by power-of-two
    length (so batch-mates differ < 2x — the padding-waste
    minimizer), shuffle deterministically within the band by md5, and
    cut at running-sum budget boundaries. One window per band, no
    global sort; bands distribute independently."""
    d = t(spark, sf_dir, "documents")
    from etl_script_spark.operators.textstats import token_count_ws_nonempty

    base = d.select(
        F.col("doc_id").alias("id"),
        token_count_ws_nonempty(F.col("text")).cast("long").alias("n_tok"),
    )
    return textstats.batch_by_token_budget(base, "id", "n_tok", budget=500)


@register(
    "curation_curriculum_interleave",
    """
    WITH base AS (
      SELECT doc_id AS id, n_chars AS s FROM documents
      WHERE n_chars IS NOT NULL
    ),
    tot AS (SELECT COUNT(*) AS n FROM base),
    banded AS (
      SELECT id,
             CAST(((ROW_NUMBER() OVER (ORDER BY s ASC, id ASC)) - 1)
                  * 10 // n AS INT) AS band
      FROM base CROSS JOIN tot
    )
    SELECT id, band,
           CAST(((ROW_NUMBER() OVER (
                    PARTITION BY band
                    ORDER BY md5('ci' || CAST(id AS VARCHAR)) ASC, id ASC))
                 - 1) * 10 + band AS BIGINT) AS position
    FROM banded
    """,
    ("LLM-curation",),
)
def curation_curriculum_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-balanced training order (textstats.
    curriculum_interleave): exact-rank decile bands on document
    length, deterministic md5 shuffle within each band, round-robin
    interleave — every consecutive 10-position window spans the full
    quality spectrum. The Spark side derives the exact global rank
    WITHOUT a one-partition sort (score-histogram bucketed prefix sum
    + per-score-value tie window); the oracle's plain global
    row_number is the semantic twin at fixture cardinality."""
    d = t(spark, sf_dir, "documents")
    return textstats.curriculum_interleave(
        d, "doc_id", "n_chars", n_strata=10, seed="ci"
    )
