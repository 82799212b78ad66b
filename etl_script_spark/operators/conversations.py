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
    pipeline, where a tokenizer exists)."""
    line = F.concat(role, F.lit(": "), content)
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
