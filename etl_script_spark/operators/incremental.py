"""Incremental aggregate maintenance (materialized-view shape).

The reference recomputes its summary tables from scratch on every
import run (credit-prepare-api/main.py re-reads everything monthly).
At 100 TB a full re-aggregation per daily batch is the dominant cost;
the fix is the classic partial-state pattern:

- ``partial_state``: per-key mergeable state — (count, sum-as-decimal,
  min, max) per measure. Algebraic: any two states combine by
  +/+/least/greatest, so states from yesterday's table and today's
  delta MERGE without touching yesterday's input rows.
- ``merge_states``: combine any number of state frames (union +
  re-aggregate — the merge shuffles the STATE, whose size is the key
  cardinality, not the data volume).
- ``finalize``: state → the user-facing aggregate row (sum, min, max,
  avg = sum/count) with the catalog's decimal-sum-then-double policy,
  so the incremental result is BITWISE equal to a from-scratch
  aggregation regardless of how the input was split.

avg is the canary: it is NOT algebraic on its own (avg of avgs is
wrong under unequal group sizes) — it must be carried as (sum, count)
and divided only at finalize. Same for any rate/ratio measure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(18,6)"  # matches plans/catalog.py DEC


def partial_state(
    df: DataFrame, keys: list[str], measures: list[str]
) -> DataFrame:
    """Per-key mergeable aggregation state over the given numeric
    measure columns. One map-side-combined shuffle on the keys."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for m in measures:
        aggs += [
            F.sum(F.col(m).cast(_DEC)).alias(f"{m}_sum"),
            F.min(m).alias(f"{m}_min"),
            F.max(m).alias(f"{m}_max"),
            # per-measure NON-NULL count: sums skip NULLs, so avg
            # must divide by this, not n_rows — avg-of-nullable is
            # the second avg trap after avg-of-avgs
            F.count(F.col(m)).alias(f"{m}_cnt"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def merge_states(
    states: list[DataFrame], keys: list[str], measures: list[str]
) -> DataFrame:
    """Combine partial states: union then re-aggregate with the
    algebraic combiners (+, least, greatest). Input frames must share
    the ``partial_state`` schema. Keys absent from one side pass
    through — decimal sums are null-skipping, so no coalesce dance."""
    assert states, "merge_states needs at least one state frame"
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    aggs = [F.sum("n_rows").alias("n_rows")]
    for m in measures:
        aggs += [
            F.sum(f"{m}_sum").alias(f"{m}_sum"),
            F.min(f"{m}_min").alias(f"{m}_min"),
            F.max(f"{m}_max").alias(f"{m}_max"),
            F.sum(f"{m}_cnt").alias(f"{m}_cnt"),
        ]
    return u.groupBy(*keys).agg(*aggs)


def maintain_join_agg(
    prev_state: DataFrame | None,
    delta: DataFrame,
    dim: DataFrame,
    on,
    keys: list[str],
    measures: list[str],
    broadcast_dim: bool = True,
) -> DataFrame:
    """Fold ONE fact delta batch into a JOIN-then-AGGREGATE
    materialized view's state:

        state' = merge(state, partial_state(Δfact ⋈ dim))

    The associativity/commutativity of ``merge_states`` makes the
    result independent of HOW the fact stream was batched — one batch,
    daily batches, or any other split finalizes bitwise-identical to a
    from-scratch recompute (pinned by tests/test_incremental.py and
    the inc_agg_join_maintenance oracle row).

    Scale shape: each batch costs one Δ-sized join (dim broadcast by
    default — pass ``broadcast_dim=False`` when the dim outgrows the
    broadcast threshold and let AQE pick) plus one state-sized merge
    shuffle (key cardinality, not data volume). The base fact table is
    never re-read.

    Scope: deltas are APPEND-ONLY and the dim snapshot must be the one
    the view definition pins (a changing dim needs the symmetric
    A ⋈ Δdim term — pair with scd.scd2_apply to keep the join against
    a frozen dim version). Retractions (CDC deletes) are out: count /
    min / max states are not retractable; a retractable view restricts
    to sum/count carried as signed values.
    """
    joined = delta.join(F.broadcast(dim) if broadcast_dim else dim, on)
    new = partial_state(joined, keys, measures)
    if prev_state is None:
        return new
    return merge_states([prev_state, new], keys, measures)


def signed_partial_state(
    df: DataFrame, keys: list[str], measures: list[str], sign_col: str
) -> DataFrame:
    """Per-key RETRACTABLE aggregation state: every row carries a sign
    (+1 insert, -1 delete) and the state is the signed sum of counts
    and measure sums. This is the sum/count-only restriction
    ``maintain_join_agg`` documents: min/max are not retractable (a
    deleted extremum needs a re-scan), so they are deliberately absent
    here. Delete rows must carry the FULL measure values (CDC delete
    images), since retraction subtracts the old contribution without
    re-reading the base."""
    sign = F.col(sign_col)
    aggs = [F.sum(sign).alias("n_rows")]
    for m in measures:
        aggs += [
            F.sum(sign.cast(_DEC) * F.col(m).cast(_DEC)).alias(f"{m}_sum"),
            F.sum(
                F.when(F.col(m).isNotNull(), sign).otherwise(F.lit(0))
            ).alias(f"{m}_cnt"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def maintain_join_agg_retractable(
    prev_state: DataFrame | None,
    delta: DataFrame,
    dim: DataFrame,
    on,
    keys: list[str],
    measures: list[str],
    sign_col: str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """``maintain_join_agg`` for CDC feeds WITH deletes: the delta
    carries a ±1 ``sign_col`` and the fold is

        state' = mergeΣ(state, signed_partial_state(Δ± ⋈ dim))

    where mergeΣ sums every state column (signed counts cancel).
    Groups whose rows have all been deleted reach n_rows = 0 and are
    dropped at ``finalize_signed`` — so insert-then-delete any subset
    in any batching and the finalized view is bitwise equal to
    recomputing over the surviving rows only (pinned in
    tests/test_incremental.py and the inc_agg_join_retract oracle).
    Same scale shape as the append-only fold; min/max excluded by
    construction (see signed_partial_state)."""
    joined = delta.join(F.broadcast(dim) if broadcast_dim else dim, on)
    new = signed_partial_state(joined, keys, measures, sign_col)
    if prev_state is None:
        return new
    u = prev_state.unionByName(new)
    aggs = [F.sum("n_rows").alias("n_rows")]
    for m in measures:
        aggs += [
            F.sum(f"{m}_sum").alias(f"{m}_sum"),
            F.sum(f"{m}_cnt").alias(f"{m}_cnt"),
        ]
    return u.groupBy(*keys).agg(*aggs)


def finalize_signed(
    state: DataFrame, keys: list[str], measures: list[str]
) -> DataFrame:
    """Signed state → user-facing view: empty groups (all rows
    retracted, n_rows = 0) disappear, exactly like a from-scratch
    groupBy over the surviving rows; avg divides the exact decimal
    sum by the non-null signed count."""
    live = state.filter(F.col("n_rows") > 0)
    cols = [F.col(k) for k in keys] + [F.col("n_rows")]
    for m in measures:
        cols += [
            F.col(f"{m}_sum").cast("double").alias(f"{m}_sum"),
            F.when(
                F.col(f"{m}_cnt") > 0,
                F.col(f"{m}_sum").cast("double") / F.col(f"{m}_cnt"),
            ).alias(f"{m}_avg"),
        ]
    return live.select(*cols)


def finalize(state: DataFrame, keys: list[str], measures: list[str]) -> DataFrame:
    """State → user-facing aggregate: decimal sums cast to double,
    avg as one exact decimal-by-count division (the only place a
    division happens — never on partials)."""
    cols = [F.col(k) for k in keys] + [F.col("n_rows")]
    for m in measures:
        cols += [
            F.col(f"{m}_sum").cast("double").alias(f"{m}_sum"),
            F.col(f"{m}_min").alias(f"{m}_min"),
            F.col(f"{m}_max").alias(f"{m}_max"),
            # double-division of the exact decimal sum — the same
            # shape as the catalog's davg policy, bit-identical on
            # both engines; divides by the NON-NULL count so nullable
            # measures average like F.avg does (NULL when all-null)
            F.when(
                F.col(f"{m}_cnt") > 0,
                F.col(f"{m}_sum").cast("double") / F.col(f"{m}_cnt"),
            ).alias(f"{m}_avg"),
        ]
    return state.select(*cols)
