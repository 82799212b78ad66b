"""Probabilistic record linkage: blocked candidate generation +
Fellegi-Sunter agreement scoring.

The multi-field generalization of the single-field fuzzy join
(operators/fuzzy.py): candidate pairs come from an exact equi-join on
a BLOCKING key (cheap, complete within blocks), then every candidate
is scored by summing per-field agreement/disagreement weights — the
Fellegi-Sunter log-likelihood-ratio framework (JASA 1969). Weights
are scaled-integer log-odds (exact, engine-portable — the same no-ln
policy as the tf-idf idf): supply them as constants, or fit them from
the data with ``em_fit_weights`` (unsupervised EM over the agreement-
pattern histogram, Winkler's method).

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


def agreement_patterns(
    pairs: DataFrame, comparators: list[Comparator]
) -> DataFrame:
    """Histogram of agreement PATTERNS over candidate pairs: one row
    per distinct boolean vector (agree_f1, ..., agree_fF) with its
    pair count. At most 2^F rows regardless of corpus size — the one
    distributed aggregation (map-side combined, shuffles ≤2^F groups)
    behind the EM fit, the same bounded-fit pattern as the IVF
    centroid sample and the BPE vocabulary."""
    scored = score_candidates(pairs, comparators)
    flags = [F.col(f"agree_{c.name}") for c in comparators]
    return scored.groupBy(*flags).agg(F.count(F.lit(1)).alias("n"))


_PPB = 10**9


def _q(x: float) -> int:
    """floor(x + 0.5) — round-half-toward-+∞ for any finite x, the
    same expression both engines evaluate as ``floor(x + 0.5)``
    (Python ``round`` is banker's and DuckDB ``ROUND`` is half-away —
    both engine-divergent)."""
    import math

    return int(math.floor(x + 0.5))


def _clamp_ppb(v: int) -> int:
    return min(max(v, 1), _PPB - 1)


def em_fit_weights(
    pairs: DataFrame,
    comparators: list[Comparator],
    iters: int = 2,
    init_m_ppb: int = 900_000_000,
    init_u_ppb: int = 100_000_000,
    init_p_ppb: int = 500_000_000,
    weight_scale: int = 1_000_000,
) -> DataFrame:
    """Fellegi-Sunter weights fitted FROM THE DATA by EM (Winkler's
    unsupervised two-class mixture over agreement vectors), instead of
    caller-supplied constants.

    Distributed shape: the corpus-sized work is ONE aggregation — the
    ≤2^F agreement-pattern histogram (``agreement_patterns``). EM then
    iterates over that histogram on the driver (Splink's optimization:
    pairs with the same pattern share the same posterior, so the
    E-step over N pairs collapses to 2^F rows), which is bounded and
    independent of corpus size.

    Bit-determinism (the cross-engine oracle contract): every
    probability lives as a parts-per-billion INTEGER between steps —
    posteriors are quantized to ppb before the M-step sums, so those
    sums are exact integer arithmetic (order-independent, no float
    accumulation), and the m/u/p updates are double divisions of
    int64-exact operands, re-quantized to ppb. A DuckDB SQL twin
    replaying the same unrolled iterations lands on the same integers
    (sums stay < 2^53 for corpora up to ~9M pairs at ppb scale; the
    histogram collapse keeps per-pattern products in fixed field
    order). Output weights are scaled-integer base-2 log-odds
    (``weight_scale`` × log2(m/u)) — the same no-ln policy as the
    tf-idf idf — ready to feed ``Comparator.w_agree/w_disagree``.

    Returns one row per comparator:
    (field, m_ppb, u_ppb, prior_ppb, w_agree, w_disagree).
    """
    import math

    if not comparators:
        raise ValueError("comparators must be non-empty")
    nf = len(comparators)
    hist = agreement_patterns(pairs, comparators).collect()
    patterns = [
        (tuple(bool(row[i]) for i in range(nf)), int(row["n"])) for row in hist
    ]
    if not patterns:
        raise ValueError(
            "em_fit_weights: candidate-pair set is empty (blocking matched "
            "nothing) — EM has no data; check the blocking key"
        )
    m = [init_m_ppb] * nf
    u = [init_u_ppb] * nf
    p = init_p_ppb
    for _ in range(iters):
        sw = 0  # Σ n·wq           (exact int)
        sn = 0  # Σ n
        swg = [0] * nf  # Σ n·wq·g_f
        sug = [0] * nf  # Σ n·(PPB-wq)·g_f
        for g, n in patterns:
            pm = p / 1e9
            pu = (_PPB - p) / 1e9
            for f in range(nf):
                pm *= (m[f] if g[f] else _PPB - m[f]) / 1e9
                pu *= (u[f] if g[f] else _PPB - u[f]) / 1e9
            wq = _q(1.0e9 * pm / (pm + pu))
            sw += n * wq
            sn += n
            for f in range(nf):
                if g[f]:
                    swg[f] += n * wq
                    sug[f] += n * (_PPB - wq)
        su = sn * _PPB - sw  # Σ n·(PPB-wq)
        # degenerate posteriors (every pair quantized to pure match or
        # pure non-match) zero a denominator — freeze the estimates
        # instead of a ZeroDivisionError; the clamp keeps them interior
        if sw == 0 or su == 0:
            p = _clamp_ppb(_q(float(sw) / float(sn)))
            break
        m = [_clamp_ppb(_q(float(swg[f]) / float(sw) * 1.0e9)) for f in range(nf)]
        u = [_clamp_ppb(_q(float(sug[f]) / float(su) * 1.0e9)) for f in range(nf)]
        p = _clamp_ppb(_q(float(sw) / float(sn)))
    spark = pairs.sparkSession
    rows = []
    for f, c in enumerate(comparators):
        w_agree = _q(
            float(weight_scale) * math.log2(float(m[f]) / float(u[f]))
        )
        w_dis = _q(
            float(weight_scale)
            * math.log2(float(_PPB - m[f]) / float(_PPB - u[f]))
        )
        rows.append((c.name, m[f], u[f], p, w_agree, w_dis))
    return spark.createDataFrame(
        rows, "field string, m_ppb long, u_ppb long, prior_ppb long, "
        "w_agree long, w_disagree long"
    )


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


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    sort_col: str,
    window: int = 3,
    prefix_len: int = 2,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo, SIGMOD 1995):
    sort records by a blocking key and emit every pair whose positions
    in that order differ by < ``window`` — the classic complement to
    equi-join blocking when typos break exact block keys but leave the
    SORT position nearly intact (a one-char edit rarely moves a name
    far in lexicographic order).

    Scale shape — no global window. The global position is computed
    with the distributed two-phase prefix sum: rows bucket by the
    first ``prefix_len`` chars of the sort key (bounded distinct
    buckets); per-bucket counts give exclusive offsets on a tiny
    broadcastable table; within-bucket ranks come from a window
    PARTITIONED BY the prefix (never one global partition). Pair
    generation is then ``window−1`` copies of each row equi-joined on
    ``pos + k = pos`` — one distributed join keyed on the position,
    never a cross product. A hot prefix owns its bucket (same skew
    contract as any partitioned window); lengthen ``prefix_len`` if a
    single prefix dominates.

    Ordering ties on ``sort_col`` break by ``id_col`` so the position
    (and hence the candidate set) is unique and engine-portable.

    Returns (id_a, id_b, pos_a, pos_b) with pos_a < pos_b.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    if prefix_len < 1:
        raise ValueError(f"prefix_len must be >= 1, got {prefix_len}")
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col).alias("__id"), F.col(sort_col).alias("__k")
    ).filter(F.col("__k").isNotNull())
    keyed = base.withColumn("__pfx", F.substring("__k", 1, prefix_len))
    per = keyed.groupBy("__pfx").agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.orderBy("__pfx").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per.select(
        "__pfx", F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off")
    )
    w_in = Window.partitionBy("__pfx").orderBy(
        F.col("__k").asc(), F.col("__id").asc()
    )
    pos = (
        keyed.join(F.broadcast(offsets), "__pfx")
        .withColumn("__pos", F.col("__off") + F.row_number().over(w_in))
        .select("__id", "__pos")
    )
    shifted = pos.select(
        "__id",
        "__pos",
        F.explode(
            F.sequence(F.lit(1), F.lit(window - 1))
        ).alias("__k_off"),
    ).select("__id", "__pos", (F.col("__pos") + F.col("__k_off")).alias("__tgt"))
    return (
        shifted.alias("a")
        .join(pos.alias("b"), F.col("a.__tgt") == F.col("b.__pos"))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__pos").alias("pos_a"),
            F.col("b.__pos").alias("pos_b"),
        )
    )
