"""WordPiece-style greedy longest-match-first subword tokenization
(Wu et al. 2016; the BERT tokenizer's wordpiece stage), engine-native:
no Python in the hot path — the per-word greedy scan is an unrolled
``F.aggregate`` over pure Column expressions, and it runs on the
DISTINCT-WORD relation only (vocabulary-bounded, the same amortization
the BPE/unigram tokenizers here use), with occurrence counts joined
back afterwards. A 100 TB corpus tokenizes its ~10⁷ distinct words
once, not its 10¹³ word occurrences.

Greedy semantics, matching the reference tokenizers: at each position
take the LONGEST vocabulary piece that matches (word-initial pieces at
position 0, continuation pieces after — the ``##`` distinction, held
as two piece sets); if no piece matches, or the word exceeds
``max_word_len``, the whole word is ``[UNK]``. Both engines replay the
identical scan: Spark via the unrolled aggregate, DuckDB via a
recursive CTE over the same fixed piece lists (built from the same
constants below), so piece counts hash-match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_script_spark.operators.textstats import words

# Fixed demonstration vocabulary: single characters guarantee any
# purely-alphanumeric word tokenizes; punctuation-bearing words
# exercise the [UNK] path. Pieces are grouped by length at match time
# (a CASE branch per length, longest first).
SINGLES = tuple("abcdefghijklmnopqrstuvwxyz0123456789")
INIT_CHUNKS = (
    "the", "and", "for", "pro", "pre", "con", "com", "over", "out",
    "un", "re", "de", "in", "ex", "sub", "up", "dis", "mis", "non",
    "co", "inter", "anti",
)
CONT_CHUNKS = (
    "ing", "ion", "ed", "er", "es", "ly", "al", "ic", "ous", "ive",
    "ate", "ment", "ness", "able", "ity", "tion", "s", "ers", "ans",
    "ent", "ure", "age",
)
INIT_VOCAB = tuple(sorted(set(SINGLES) | set(INIT_CHUNKS)))
CONT_VOCAB = tuple(sorted(set(SINGLES) | set(CONT_CHUNKS)))


def _by_len(vocab: tuple[str, ...]) -> dict[int, list[str]]:
    out: dict[int, list[str]] = {}
    for p in vocab:
        out.setdefault(len(p), []).append(p)
    return out


def _match_len(word: F.Column, pos: F.Column, by_len: dict) -> F.Column:
    """Longest piece length matching ``word`` at 0-based ``pos``, or
    NULL. One CASE branch per piece length, longest first; a
    shorter-than-L remainder can never equal a length-L piece, so no
    explicit remaining-length check is needed."""
    c = None
    for L in sorted(by_len, reverse=True):
        cond = word.substr(pos + 1, F.lit(L)).isin(*by_len[L])
        c = F.when(cond, F.lit(L)) if c is None else c.when(cond, F.lit(L))
    return c.otherwise(F.lit(None).cast("int"))


def tokenize_wordpiece(
    df: DataFrame,
    text_col: str,
    id_col: str,
    init_vocab: tuple[str, ...] = INIT_VOCAB,
    cont_vocab: tuple[str, ...] = CONT_VOCAB,
    max_word_len: int = 16,
) -> DataFrame:
    """Per-document WordPiece piece statistics under the greedy scan:
    (id, n_words, n_pieces, n_unk, n_chars). ``n_pieces`` counts an
    [UNK] word as one piece; ``n_chars`` is derived from the CONSUMED
    piece lengths on success (the scan's final position — by
    construction the sum of emitted piece lengths) and the raw word
    length for [UNK], so it rejoins the oracle's raw-text character
    count only if no scan over- or under-consumes.

    Shape: explode to word occurrences (corpus-linear), tokenize the
    DISTINCT words (vocabulary-bounded — the expensive unrolled
    expression runs on ~|V| rows), join the per-word result back
    (unhinted; AQE broadcasts the word table when small), one
    aggregation per document. Empty documents keep a row of zeros via
    a left join from the id spine.
    """
    bi = _by_len(_dedup(init_vocab))
    bc = _by_len(_dedup(cont_vocab))
    ids = df.select(F.col(id_col).alias("id"))
    wl = df.select(
        F.col(id_col).alias("id"),
        F.explode(words(F.col(text_col))).alias("w"),
    ).filter(F.col("w") != "")
    dw = wl.select("w").distinct()

    word = F.col("w")

    def step(acc: F.Column, _i: F.Column) -> F.Column:
        done = acc["failed"] | (acc["pos"] >= F.length(word))
        m = F.when(
            acc["pos"] == 0, _match_len(word, acc["pos"], bi)
        ).otherwise(_match_len(word, acc["pos"], bc))
        advanced = F.struct(
            (acc["pos"] + m).alias("pos"),
            (acc["np"] + 1).alias("np"),
            F.lit(False).alias("failed"),
        )
        failed = F.struct(
            acc["pos"].alias("pos"),
            acc["np"].alias("np"),
            F.lit(True).alias("failed"),
        )
        return F.when(done, acc).otherwise(
            F.when(m.isNull(), failed).otherwise(advanced)
        )

    init = F.struct(
        F.lit(0).alias("pos"), F.lit(0).alias("np"),
        F.lit(False).alias("failed"),
    )
    scanned = dw.withColumn(
        "__st",
        F.when(
            F.length("w") > max_word_len,
            F.struct(
                F.lit(0).alias("pos"), F.lit(0).alias("np"),
                F.lit(True).alias("failed"),
            ),
        ).otherwise(
            F.aggregate(
                F.sequence(F.lit(1), F.length("w")), init, step
            )
        ),
    ).select(
        "w",
        F.col("__st.failed").alias("__unk"),
        F.col("__st.np").alias("__np"),
        F.col("__st.pos").alias("__consumed"),
    )
    occ = wl.join(scanned, "w")
    agg = occ.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(
            F.when(F.col("__unk"), 1).otherwise(F.col("__np"))
        ).cast("long").alias("n_pieces"),
        F.sum(F.when(F.col("__unk"), 1).otherwise(0))
        .cast("long").alias("n_unk"),
        F.sum(
            F.when(F.col("__unk"), F.length("w"))
            .otherwise(F.col("__consumed"))
        ).cast("long").alias("n_chars"),
    )
    return ids.join(agg, "id", "left").select(
        "id",
        F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
        F.coalesce("n_pieces", F.lit(0)).cast("long").alias("n_pieces"),
        F.coalesce("n_unk", F.lit(0)).cast("long").alias("n_unk"),
        F.coalesce("n_chars", F.lit(0)).cast("long").alias("n_chars"),
    )


def _dedup(vocab: tuple[str, ...]) -> tuple[str, ...]:
    if len(set(vocab)) != len(vocab):
        raise ValueError("wordpiece vocab contains duplicates")
    if any(not p for p in vocab):
        raise ValueError("wordpiece vocab contains an empty piece")
    return vocab


def _sql_case(by_len: dict) -> str:
    branches = []
    for L in sorted(by_len, reverse=True):
        lst = ", ".join(f"'{p}'" for p in sorted(by_len[L]))
        branches.append(
            f"WHEN substr(w, pos + 1, {L}) IN ({lst}) THEN {L}"
        )
    return "CASE " + " ".join(branches) + " END"


def wordpiece_oracle_sql(
    norm_expr: str,
    id_expr: str = "doc_id",
    table: str = "documents",
    init_vocab: tuple[str, ...] = INIT_VOCAB,
    cont_vocab: tuple[str, ...] = CONT_VOCAB,
    max_word_len: int = 16,
) -> str:
    """The DuckDB twin: a recursive CTE replaying the identical greedy
    scan over the distinct-word relation, built from the SAME piece
    constants (``norm_expr`` must match the engine's normalize_text).
    Terminal states (failed, or position at word end) appear exactly
    once across iterations because only non-terminal rows extend."""
    ic = _sql_case(_by_len(_dedup(init_vocab)))
    cc = _sql_case(_by_len(_dedup(cont_vocab)))
    return f"""
    WITH RECURSIVE wl AS (
      SELECT {id_expr} AS id, w
      FROM (SELECT {id_expr},
                   unnest(list_filter(string_split({norm_expr}, ' '),
                                      x -> x <> '')) AS w
            FROM {table})
    ),
    dw AS (SELECT DISTINCT w FROM wl WHERE length(w) <= {max_word_len}),
    st AS (
      SELECT w, 0 AS pos, 0 AS np, false AS failed FROM dw
      UNION ALL
      SELECT w,
             CASE WHEN m IS NULL THEN pos ELSE pos + m END,
             CASE WHEN m IS NULL THEN np ELSE np + 1 END,
             (m IS NULL)
      FROM (
        SELECT w, pos, np,
               CASE WHEN pos = 0 THEN {ic} ELSE {cc} END AS m
        FROM st WHERE NOT failed AND pos < length(w)
      )
    ),
    term AS (
      SELECT w, np, failed, pos FROM st
      WHERE failed OR pos >= length(w)
      UNION ALL
      SELECT w, 0, true, 0
      FROM (SELECT DISTINCT w FROM wl WHERE length(w) > {max_word_len})
    ),
    agg AS (
      SELECT wl.id,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM(CASE WHEN failed THEN 1 ELSE np END) AS BIGINT)
               AS n_pieces,
             CAST(SUM(CASE WHEN failed THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unk,
             CAST(SUM(CASE WHEN failed THEN length(wl.w) ELSE pos END)
                  AS BIGINT) AS n_chars
      FROM wl JOIN term ON wl.w = term.w
      GROUP BY 1
    )
    SELECT t.{id_expr} AS id,
           COALESCE(agg.n_words, 0) AS n_words,
           COALESCE(agg.n_pieces, 0) AS n_pieces,
           COALESCE(agg.n_unk, 0) AS n_unk,
           COALESCE(agg.n_chars, 0) AS n_chars
    FROM {table} t LEFT JOIN agg ON t.{id_expr} = agg.id
    """
