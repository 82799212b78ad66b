"""Declarative data-quality expectations (deequ/Great-Expectations
shape, Spark-first).

The reference validates imports imperatively — per-row if/else chains
with counters (ImportInvoiceReport.php:107-113, ImportDbdFinancial.php
row guards). This operator family expresses the same checks as a RULE
SET evaluated in ONE aggregation pass:

- every rule is a boolean Column over the row (plus optional
  referential rules that broadcast-join a dim's key set first);
- ``evaluate`` computes per-rule violation counts in a single
  ``agg`` — no per-rule scan, no driver loop; the metrics row set is
  bounded by the rule count, never by data volume;
- ``split`` returns (passing, quarantine-with-reasons) from the same
  predicate set — the P9 valid/invalid split generalized.

At 100 TB the whole evaluation is one map-side-combined aggregate
over the scan; referential checks stay broadcast as long as the dim's
KEY COLUMN fits (the usual case even when the dim's payload doesn't).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation: ``predicate`` must hold for every row."""

    name: str
    predicate: Column


def not_null(col: str) -> Rule:
    return Rule(f"not_null_{col}", F.col(col).isNotNull())


def unique_key(df: DataFrame, cols: list[str]) -> Rule:
    """Uniqueness is not a row-local predicate — mark rows whose key
    occurs more than once via a count window over the key. This is
    the one rule that shuffles (on the key, as any uniqueness check
    must); leave it out of hot paths that already dedup."""
    from pyspark.sql import Window

    w = Window.partitionBy(*cols)
    return Rule(
        "unique_" + "_".join(cols),
        F.count(F.lit(1)).over(w) == 1,
    )


def in_range(col: str, lo, hi) -> Rule:
    return Rule(
        f"in_range_{col}", F.col(col).isNotNull() & F.col(col).between(lo, hi)
    )


def in_set(col: str, values: list) -> Rule:
    """NULL is a violation: a value that isn't in the set isn't in the
    set. (Bare ``isin`` evaluates to NULL on NULL input — SQL
    three-valued logic — which evaluate/split would count as a PASS;
    every value rule in this family is explicitly null-rejecting,
    matching ``in_range``. Rows where NULL is legitimate get no value
    rule, or a separate ``not_null`` with the column exempted.)"""
    return Rule(
        f"in_set_{col}", F.col(col).isNotNull() & F.col(col).isin(values)
    )


def matches(col: str, rx: str) -> Rule:
    """NULL is a violation — see ``in_set``."""
    return Rule(
        f"matches_{col}", F.col(col).isNotNull() & F.col(col).rlike(rx)
    )


def referential(
    df: DataFrame, col: str, dim: DataFrame, dim_key: str
) -> tuple[DataFrame, Rule]:
    """Foreign-key expectation: every ``col`` value exists in the
    dim's key set. A rule is a row-local Column, so the set
    membership is materialized first: broadcast-left-join the dim's
    DISTINCT key column (payload never moves, fact side never
    shuffles) and the rule checks the resulting mark. Returns
    (marked frame, rule) — evaluate/split the marked frame."""
    mark = f"__ref_{col}"
    keys = (
        dim.select(F.col(dim_key).alias(col))
        .distinct()
        .withColumn(mark, F.lit(True))
    )
    marked = df.join(F.broadcast(keys), col, "left")
    return marked, Rule(f"ref_{col}", F.col(mark).isNotNull())


def evaluate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Per-rule metrics in ONE aggregation pass:
    (rule_name, rows, violations, pass_ratio) — unpivoted via stack
    so the output is one row per rule."""
    # materialize predicates as flags in a Project first: window-based
    # rules (uniqueness) are not legal directly inside an aggregate
    flagged = df.select(
        *[(~r.predicate).alias(f"__f_{i}") for i, r in enumerate(rules)]
    )
    aggs = [F.count(F.lit(1)).alias("__rows")] + [
        F.sum(F.when(F.col(f"__f_{i}"), 1).otherwise(0)).alias(f"__v_{i}")
        for i in range(len(rules))
    ]
    wide = flagged.agg(*aggs)
    pairs = []
    for i, r in enumerate(rules):
        pairs.append(F.lit(r.name))
        pairs.append(F.col(f"__v_{i}"))
    stacked = wide.select(
        F.col("__rows").alias("rows"),
        F.stack(F.lit(len(rules)), *pairs).alias("rule_name", "violations"),
    )
    return stacked.select(
        "rule_name",
        "rows",
        "violations",
        (
            (F.col("rows") - F.col("violations"))
            / F.greatest(F.col("rows"), F.lit(1))
        ).alias("pass_ratio"),
    )


def split(
    df: DataFrame, rules: list[Rule]
) -> tuple[DataFrame, DataFrame]:
    """(passing rows, quarantined rows + ``violated`` reason array).
    One pass, no shuffle beyond what window-based rules require: the
    reason array is built from the same predicates the metrics use,
    so the two surfaces can never disagree."""
    reasons = F.array_compact(
        F.array(
            *[
                F.when(~r.predicate, F.lit(r.name)) for r in rules
            ]
        )
    )
    tagged = df.withColumn("violated", reasons)
    aux = [c for c in df.columns if c.startswith("__")]
    passing = tagged.filter(F.size("violated") == 0).drop("violated", *aux)
    quarantined = tagged.filter(F.size("violated") > 0).drop(*aux)
    return passing, quarantined


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Column-level data profile: one row per column with
    ``(column, n_rows, n_null, n_distinct)`` — the snapshot summary a
    profile-drift check compares between dataset versions.

    Single aggregation pass: every column's null count and exact
    distinct count compute in ONE agg (Spark plans multi-distinct via
    expand — acceptable for the handful of profiled columns; swap
    ``approx_count_distinct`` in at 100 TB if exactness isn't needed,
    same shape), then the wide row unpivots to long form with a
    stack — no per-column scan, no per-column job."""
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__dist_{c}"))
    wide = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', __null_{c}, __dist_{c}" for c in cols
    )
    return wide.selectExpr(
        "__n AS n_rows",
        f"stack({len(cols)}, {stacked}) AS (column_name, n_null, n_distinct)",
    ).select("column_name", "n_rows", "n_null", "n_distinct")


def referential_integrity_report(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
    broadcast_dim_keys: bool = True,
) -> DataFrame:
    """Orphan audit across a star schema's foreign keys: for each
    (name, fact, fk_col, dim, key_col) relation, how many fact rows
    reference a missing dimension row — the data-quality contract
    check run before every publish (an orphan fact silently drops
    from every inner join downstream).

    Counts fold per relation from ONE left join of the dim's distinct
    key: n_rows, n_nulls (fk NULL — excused, reported separately),
    n_orphans (non-null fk with no dim row), orphan_ppm over the
    non-null rows. The per-relation frames union into one report.

    ``broadcast_dim_keys`` (default True) hints the dim's distinct
    key set as the broadcast side. The CONTRACT for the default is
    that every dim key set fits in executor memory (region/nation/
    part-class dims — the star-schema norm). For a billion-row dim
    (a customer dim at 100×) pass False: the join runs unhinted and
    AQE picks broadcast vs shuffle from MEASURED sizes instead of
    the hint foreclosing the choice.

    Returns (relation, n_rows, n_nulls, n_orphans, orphan_ppm).
    """
    outs = []
    for name, fact, fk, dim, key in relations:
        keys = (
            dim.select(F.col(key).alias("__k"))
            .distinct()
            .withColumn("__in", F.lit(1))
        )
        if broadcast_dim_keys:
            keys = F.broadcast(keys)
        marked = fact.select(F.col(fk).alias("__k")).join(
            keys, "__k", "left"
        )
        outs.append(
            marked.agg(
                F.lit(name).alias("relation"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(
                    F.when(F.col("__k").isNull(), 1).otherwise(0)
                ).cast("long").alias("n_nulls"),
                F.sum(
                    F.when(
                        F.col("__k").isNotNull() & F.col("__in").isNull(),
                        1,
                    ).otherwise(0)
                ).cast("long").alias("n_orphans"),
            ).select(
                "relation",
                "n_rows",
                "n_nulls",
                "n_orphans",
                F.expr(
                    "CAST((n_orphans * 1000000)"
                    " DIV NULLIF(n_rows - n_nulls, 0) AS BIGINT)"
                ).alias("orphan_ppm"),
            )
        )
    report = outs[0]
    for o in outs[1:]:
        report = report.unionByName(o)
    return report.orderBy("relation")
