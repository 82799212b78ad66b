"""Conversation assembly: flatten per-key ordered event turns into a
single training-ready transcript string.

Instruction-tuning pipelines spend a whole stage on exactly this
shape: rows are (conversation, turn-order, role, content) and the
model wants one string per conversation with role markers, in turn
order, truncated to a context budget. The trap is ordering — an
unordered collect_list is partition-order-dependent and irreproducible.
The deterministic spelling is ``sort_array(collect_list(struct(order
keys..., line)))``: the struct sorts by the order keys first, so the
join is exactly turn order, bit-stable under any partitioning — and
replayable by any engine with an ORDER BY inside its string
aggregate.

Scale shape: ONE groupBy shuffle on the conversation key; the sorted
aggregation buffer is per-conversation (bounded by max conversation
length, not corpus size). The char-budget truncation happens AFTER
assembly per conversation — cheap, and the budget is a contract the
downstream tokenizer packs against (pack_training_sequences).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def flatten_turns(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    role: Column,
    content: Column,
    sep: str = "\n",
    max_chars: int | None = None,
) -> DataFrame:
    """One row per key: (keys..., n_turns, transcript). Each turn
    renders as ``role: content``; turns join with ``sep`` in
    ``order_cols`` order; ``max_chars`` truncates the assembled
    transcript (a character budget — token budgets come later in the
    pipeline, where a tokenizer exists).

    NULL role/content renders as the empty string: a NULL would make
    the whole line NULL, which ``array_join`` silently drops —
    desynchronizing n_turns from the transcript's actual turn count."""
    line = F.concat(
        F.coalesce(role, F.lit("")),
        F.lit(": "),
        F.coalesce(content, F.lit("")),
    )
    ordered = F.struct(
        *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order_cols)],
        line.alias("__line"),
    )
    agg = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(ordered)),
                lambda s: s["__line"],
            ),
            sep,
        ).alias("transcript"),
    )
    if max_chars is not None:
        agg = agg.withColumn(
            "transcript", F.substring(F.col("transcript"), 1, max_chars)
        )
    return agg


def preference_pairs(
    df: DataFrame, group_col: str, id_col: str, score_col: Column
) -> DataFrame:
    """DPO/RLHF preference-pair construction: within each prompt group,
    pair the highest-scored response (chosen) with the lowest-scored
    (rejected). Groups with a single response — or where every response
    ties exactly (margin 0, no training signal) — emit no pair.

    One aggregation: ``max(struct(score, id))`` / ``min(struct(...))``
    give the lexicographic extremes in a single map-side-combinable
    groupBy — no window, no second shuffle, which is the shape that
    holds when the preference corpus is billions of (prompt, response)
    rows. Tie policy is part of the contract (deterministic across
    engines): on equal scores the chosen is the LARGEST id, the
    rejected the SMALLEST — struct comparison ordering — so reruns and
    SQL replays pick identical pairs.

    Returns ``(group, chosen_id, rejected_id, margin)`` with margin =
    score(chosen) - score(rejected) > 0 or the tie (margin 0 but
    different ids) — strictly: pairs where chosen == rejected are
    dropped (single-response groups); zero-margin pairs with distinct
    ids are KEPT (ranking ties still carry weak signal; filter on
    margin downstream if not).

    NULL-scored responses are EXCLUDED before the extremes: struct
    ordering sorts NULL first, so an unscored response would otherwise
    be selected as 'rejected' with a NULL margin — an unscored row is
    no evidence of badness, so it must not appear in either slot (a
    group whose responses are all unscored emits nothing)."""
    df = df.filter(score_col.isNotNull())
    agg = df.groupBy(F.col(group_col).alias("group")).agg(
        F.max(
            F.struct(score_col.alias("s"), F.col(id_col).alias("i"))
        ).alias("__hi"),
        F.min(
            F.struct(score_col.alias("s"), F.col(id_col).alias("i"))
        ).alias("__lo"),
    )
    return agg.filter(F.col("__hi.i") != F.col("__lo.i")).select(
        "group",
        F.col("__hi.i").alias("chosen_id"),
        F.col("__lo.i").alias("rejected_id"),
        (F.col("__hi.s") - F.col("__lo.s")).alias("margin"),
    )


def top_paths(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
    depth: int = 3,
    k: int = 20,
) -> DataFrame:
    """Top-k onboarding paths: each key's FIRST ``depth`` states in
    time order, joined with '>' into a path string, counted across
    keys, ranked by frequency — the product-analytics "what do users
    do first" query. Share is exact integer ppm of all keys (DIV).

    Shape: one per-key window (row_number, single shuffle), one
    ordered-collect per key (sort_array over (rank, state) structs —
    local, no second sort), one path aggregation, TakeOrdered for the
    global top-k (count desc, path asc — replayable total order).

    Returns (path, n_keys, share_ppm).
    """
    from pyspark.sql import Window

    if depth < 1 or k < 1:
        raise ValueError(f"depth and k must be >= 1: {depth}, {k}")
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    first_n = (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= depth)
        .groupBy(F.col(key_col).alias("__k"))
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("__rk", state_col))
                    ),
                    lambda s: s[state_col],
                ),
                ">",
            ).alias("path")
        )
    )
    tot = first_n.agg(F.count(F.lit(1)).cast("long").alias("__t"))
    counted = (
        first_n.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "share_ppm",
            F.expr("(n_keys * CAST(1000000 AS BIGINT)) DIV __t"),
        )
        .select("path", "n_keys", "share_ppm")
    )
    return counted.orderBy(
        F.col("n_keys").desc(), F.col("path").asc()
    ).limit(k)
