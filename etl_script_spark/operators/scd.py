"""Slowly-changing dimension maintenance (SCD Type 2).

The reference's company/supplier masters are Type-1 (upsert
overwrites history — ImportDbdFinancial.php updateOrCreate). A credit
engine eventually needs the Type-2 question — "what did we believe
about this company WHEN we scored it" — so the merge family gets the
versioned variant: every change closes the current row
(``valid_to = batch_ts``) and opens a new one, point-in-time queries
filter ``valid_from <= ts < valid_to``.

Set-algebra shape (same philosophy as merge.py): one key-partitioned
join of current-open rows vs the batch decides changed / unchanged /
new; the output is a union of untouched + closed + opened rows. Cost
per batch is one shuffle of (dim ∪ batch) on the key — dims are
key-cardinality, not fact-cardinality, so this stays cheap at 100 TB
fact scale. History rows (valid_to set) pass through untouched by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HIGH_TS = "9999-12-31 00:00:00"


def scd2_init(batch: DataFrame, batch_ts: str) -> DataFrame:
    """First load: every row opens at ``batch_ts``, never closes."""
    return batch.select(
        "*",
        F.lit(batch_ts).cast("timestamp_ntz").alias("valid_from"),
        F.lit(HIGH_TS).cast("timestamp_ntz").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(
    dim: DataFrame,
    batch: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    batch_ts: str,
) -> DataFrame:
    """Merge one change batch into a Type-2 dimension.

    - unchanged current rows, and ALL closed history rows, pass
      through untouched;
    - a current row whose attrs differ from the batch closes
      (``valid_to = batch_ts``, ``is_current = false``) and the batch
      row opens;
    - a batch key absent from the dim opens a brand-new row.

    Attribute comparison is null-safe (``<=>``). The batch must be
    unique per key (enforce upstream with dedupe_first — same
    contract as upsert). Late/out-of-order batches are the caller's
    problem: ``batch_ts`` must be monotone per key, the operator
    asserts nothing about it (the same contract Delta's SCD2 MERGE
    recipes carry).
    """
    ts = F.lit(batch_ts).cast("timestamp_ntz")
    history = dim.filter(~F.col("is_current"))
    current = dim.filter(F.col("is_current"))

    b = batch.select(
        *[F.col(c).alias(f"__b_{c}") for c in key_cols + attr_cols]
    )
    cond = F.col(key_cols[0]) == F.col(f"__b_{key_cols[0]}")
    for k in key_cols[1:]:
        cond = cond & (F.col(k) == F.col(f"__b_{k}"))
    joined = current.join(b, cond, "left")

    attr_same = F.lit(True)
    for a in attr_cols:
        attr_same = attr_same & F.col(a).eqNullSafe(F.col(f"__b_{a}"))
    matched = F.col(f"__b_{key_cols[0]}").isNotNull()
    changed = matched & ~attr_same

    untouched_current = joined.filter(~matched | attr_same).select(dim.columns)
    closed = (
        joined.filter(changed)
        .select(dim.columns)
        .withColumn("valid_to", ts)
        .withColumn("is_current", F.lit(False))
    )
    opened = (
        joined.filter(changed)
        .select(
            *[F.col(f"__b_{c}").alias(c) for c in key_cols + attr_cols],
        )
        .select(
            "*",
            ts.alias("valid_from"),
            F.lit(HIGH_TS).cast("timestamp_ntz").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    new_keys = batch.join(current, key_cols, "left_anti")
    brand_new = scd2_init(new_keys.select(*key_cols, *attr_cols), batch_ts)

    # the 5-way union CONCATENATES branch partitions, and with a
    # broadcast batch join no exchange ever resets the count — left
    # unbounded, a chained nightly apply multiplies partitions ~4x
    # per batch (stress run: 160 -> 164,181 by batch 6; batch 12 is
    # hundreds of millions of empty tasks). Coalesce (narrow, no
    # shuffle) back to the incoming dimension's own partition count
    # so chained applies stay flat.
    n_parts = max(dim.rdd.getNumPartitions(), 1)
    return (
        history.unionByName(untouched_current)
        .unionByName(closed)
        .unionByName(opened)
        .unionByName(brand_new)
        .coalesce(n_parts)
    )


def as_of(dim: DataFrame, ts: str) -> DataFrame:
    """Point-in-time view: the row version live at ``ts``."""
    t = F.lit(ts).cast("timestamp_ntz")
    return dim.filter((F.col("valid_from") <= t) & (F.col("valid_to") > t))


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: list[str],
    fact_ts: str,
) -> DataFrame:
    """Bitemporal fact enrichment: join every fact row to the dim
    VERSION that was live at the fact's OWN timestamp — "what did we
    believe about this customer when the order was placed", the query
    a Type-2 dimension exists to answer and a Type-1 overwrite
    destroys (``as_of`` is the constant-timestamp special case; this
    is per-row).

    Shape: equi-join on the natural key plus the interval predicate
    ``valid_from <= ts < valid_to`` applied as the join's residual
    condition — the shuffle is keyed on the natural key alone
    (version count per key is small by construction: one row per
    CHANGE, so the residual scan per key is bounded by the key's
    change history, never the fact count). No interval/range join
    machinery needed — this is the standard shape at any scale
    because the dimension side is version-per-change, not
    event-cardinality. Facts whose timestamp precedes the key's
    first version (or whose key is absent) keep NULL dim columns
    (left join — auditability beats silent row loss).
    """
    t = F.col(f"__f.{fact_ts}")
    cond = None
    for k in keys:
        c = F.col(f"__f.{k}") == F.col(f"__d.{k}")
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (F.col("__d.valid_from") <= t)
        & (F.col("__d.valid_to") > t)
    )
    f = facts.alias("__f")
    d = dim.alias("__d")
    dim_cols = [c for c in dim.columns if c not in keys]
    return f.join(d, cond, "left").select(
        *[F.col(f"__f.{c}").alias(c) for c in facts.columns],
        *[F.col(f"__d.{c}").alias(c) for c in dim_cols],
    )
