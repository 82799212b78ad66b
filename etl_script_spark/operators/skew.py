"""Skew-handling join utilities (SURVEY.md §4 scale posture).

AQE's skew-join splitting handles sort-merge skew at runtime; this
module provides the EXPLICIT salting pattern for the cases AQE can't
re-plan — aggregations on a hot key and broadcast-ineligible joins
where one side's key distribution is pathological (one company with
millions of invoices at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s key distribution is hot: the
    skewed side gets a random-but-deterministic salt in [0, n_salts),
    the other side EXPLODES into all salts, and the join key becomes
    (key, salt) — each hot key spreads over n_salts reducers.

    The other side replicates n_salts× — use when it is much smaller
    than the hot partitions it breaks up (else broadcast it outright).
    Salt is derived from stable row content (xxhash64 of all columns),
    not rand(), so retried tasks produce identical output.

    Only ``inner`` and ``left`` are supported: under ``right``/``full``
    every UNMATCHED row of the replicated side would survive once per
    salt, silently duplicating output n_salts×."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "right/full would emit each unmatched replicated row once per salt"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    a = skewed.withColumn("__salt", salt)
    b = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = a.join(b, [key, "__salt"], how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Hot-key aggregation in two phases: partial aggregate on
    (keys, salt) — spreading each hot key over n_salts reducers —
    then final combine on keys. Only decomposable aggregates (sum,
    count, min, max) belong here; ``aggs`` maps output name → partial
    aggregate expression, recombined with sum/min/max by name prefix:
    'sum_'/'cnt_' → sum, 'min_' → min, 'max_' → max."""
    # salt from the keys alone would NOT spread a hot key (its hash is
    # constant) — spread on a per-row hash of all columns
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )

    def _combine(name: str) -> Column:
        if name.startswith("min_"):
            return F.min(name)
        if name.startswith("max_"):
            return F.max(name)
        return F.sum(name)  # sums and counts both recombine by sum

    return partial.groupBy(*keys).agg(
        *[_combine(n).alias(n) for n in aggs]
    )
