"""Probabilistic record linkage: blocked candidate generation +
Fellegi-Sunter agreement scoring.

The multi-field generalization of the single-field fuzzy join
(operators/fuzzy.py): candidate pairs come from an exact equi-join on
a BLOCKING key (cheap, complete within blocks), then every candidate
is scored by summing per-field agreement/disagreement weights — the
Fellegi-Sunter log-likelihood-ratio framework (JASA 1969), with the
weights supplied as fixed integers (in production they come from an
EM fit over labeled pairs; scaled-integer log-odds keep the score
exact and engine-portable — the same no-ln policy as the tf-idf idf).

Scale shape: the blocking equi-join is the only data-sized shuffle
and its fan-out is the block size — the blocking key must be chosen
selective (the classic guidance: 10²-10⁴ rows per block). A
low-cardinality block key (e.g. country alone) degenerates toward
O(n²/blocks); compose it with a stable field fragment. Scoring is a
pure projection — codegen, no UDF.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column


@dataclass(frozen=True)
class Comparator:
    """One field comparison: ``agree`` is a boolean Column over the
    joined pair; weights are scaled-integer log-odds (positive for
    agreement, negative for disagreement)."""

    name: str
    agree: Column
    w_agree: int
    w_disagree: int


def score_candidates(
    pairs: DataFrame, comparators: list[Comparator]
) -> DataFrame:
    """Add per-field agreement flags and the summed integer score.

    Missing-value semantics: a NULL comparison (either field NULL, so
    ``c.agree`` evaluates to NULL) scores as DISAGREEMENT — the
    conservative Fellegi-Sunter convention when no separate
    missing-weight is modelled. Callers needing three-state m/u
    weights should encode the null case inside ``c.agree`` itself.
    """
    if not comparators:
        raise ValueError("comparators must be non-empty")
    out = pairs
    total: Column | None = None
    for c in comparators:
        flag = F.when(c.agree, F.lit(True)).otherwise(F.lit(False))
        out = out.withColumn(f"agree_{c.name}", flag)
        term = F.when(
            F.col(f"agree_{c.name}"), F.lit(c.w_agree)
        ).otherwise(F.lit(c.w_disagree))
        total = term if total is None else total + term
    return out.withColumn("score", total)


def link(
    left: DataFrame,
    right: DataFrame,
    block_on: list[tuple[Column, Column]],
    comparators: list[Comparator],
    threshold: int,
) -> DataFrame:
    """Blocked Fellegi-Sunter linkage: equi-join on the blocking key
    pairs, score, keep pairs at/above ``threshold``. Columns from both
    sides survive; callers project. Pairs outside every block are
    unscorable by construction — that recall loss is the blocking
    bargain and must be sized via the block key choice."""
    cond = None
    for lc, rc in block_on:
        e = lc.eqNullSafe(rc)
        cond = e if cond is None else cond & e
    cand = left.join(right, cond)
    return score_candidates(cand, comparators).filter(
        F.col("score") >= F.lit(threshold)
    )
