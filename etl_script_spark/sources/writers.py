"""Sinks (SURVEY.md §2.1 S12/S13/S14) and merge-write composition.

The reference's write path is the #1 perf cliff it has: per-row INSERT
over a process boundary (ImportInvoiceReport.php:199-217). Here every
sink is a distributed batched write; the JDBC sink reproduces the
reference's 1000-row chunking (PublicApiController.php:392-408) via
``batchsize`` — per-partition batched statements instead of per-row
round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_script_spark.operators import merge as merge_ops


def write_json_records(
    df: DataFrame, path: str, single_file: bool = False, mode: str = "overwrite"
) -> None:
    """S12: JSON records sink (po_processor.py:82-86 ``to_json(
    orient="records", force_ascii=False)``). UTF-8 non-ascii by
    default in Spark. ``single_file`` coalesces to one part — only for
    small gold outputs; distributed multi-part otherwise."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", **opts) -> None:
    """S13: CSV sink with header (bs_processor.py:114)."""
    df.write.mode(mode).options(header="true", **opts).csv(path)


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite", compression: str = "zlib"
) -> None:
    """Columnar interchange sink for ORC-native warehouses (Hive/Trino
    estates): same predicate-pushdown/column-pruning story as parquet,
    different footer format. No reference analogue — format-matrix
    widening for the Spark engine."""
    df.write.mode(mode).option("compression", compression).orc(path)


def write_jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    batchsize: int = 1000,
    driver: str | None = None,
    mode: str = "append",
    **properties: str,
) -> None:
    """S14: batched JDBC sink. ``batchsize=1000`` mirrors the
    reference's chunked transaction size; each Spark task holds one
    connection and flushes 1000-row batches — at 1000 executors that
    is 1000 parallel bulk loaders, vs the reference's single row
    loop."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
    )
    if driver:
        writer = writer.option("driver", driver)
    for k, v in properties.items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def read_jdbc(
    spark: SparkSession, url: str, table: str, driver: str | None = None, **opts
) -> DataFrame:
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        reader = reader.option("driver", driver)
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def insert_only_append(
    existing: DataFrame,
    incoming: DataFrame,
    keys: list[str],
    order_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """J7+S14 composition: duplicate-key skip before an append-only
    write (ImportOldInvoices.php:188-195 SQLSTATE-23000 swallow).
    Returns (rows_to_append, skipped_duplicates) so callers can both
    write and report the skip count (A2 metrics). Skips cover BOTH
    existing-key collisions AND intra-batch duplicates, so
    appended + skipped == incoming row-for-row.

    Both outputs derive from ONE tagged plan (row_number within key +
    existing-key semi-mark), so writing ``appended`` and counting
    ``skipped`` can never disagree on which duplicate won — the old
    exceptAll formulation re-executed the dedup independently per
    action and could pick different arbitrary winners (and threw on
    map-typed payload columns, which this key-based form handles).
    ``order_col`` makes keep-first deterministic; without it the
    winner is arbitrary-but-pinned (lazy localCheckpoint materialized
    by the first action, so both outputs still agree).

    Shuffle shape: the window partitions the INCOMING batch by key —
    incremental appends shuffle only the (small) batch, never the
    existing table, whose keys arrive via a key-projected join that
    Catalyst/AQE broadcasts or shuffles as sizes dictate."""
    from pyspark.sql import Window

    order = F.col(order_col).asc() if order_col else F.lit(1).asc()
    w = Window.partitionBy(*keys).orderBy(order)
    hits = (
        existing.select(*keys)
        .dropDuplicates(keys)
        .withColumn("__hit", F.lit(True))
    )
    tagged = (
        incoming.withColumn("__rn", F.row_number().over(w))
        .join(hits, keys, "left")
    )
    if order_col is None:
        tagged = tagged.localCheckpoint(eager=False)
    keep = (F.col("__rn") == 1) & F.col("__hit").isNull()
    cols = list(incoming.columns)  # join moved keys to the front
    new_rows = tagged.filter(keep).select(*cols)
    skipped = tagged.filter(~keep).select(*cols)
    return new_rows, skipped


def overwrite_partition(
    df: DataFrame, full: DataFrame, partition_col: str, partition_values: list
) -> DataFrame:
    """J3 on plain storage: rebuild a table replacing the given
    partitions (delete+insert children semantics without Delta —
    anti-filter the old partition, union the replacement)."""
    kept = full.filter(~F.col(partition_col).isin(partition_values))
    return kept.unionByName(df)


def http_push_sink(
    df: DataFrame,
    poster_factory,
    batch_size: int = 500,
) -> None:
    """S15: HTTP push sink — POST rows to an API endpoint from every
    partition in parallel (the reference POSTs processed records one
    file at a time from the driver process: main.py:40-48,
    send_dbd_company_supplier.py:85-143).

    ``poster_factory`` is a zero-arg callable constructed ON THE
    EXECUTOR (returns a ``post(list_of_row_dicts) -> None``) so
    connections/sessions are per-partition, never pickled from the
    driver. Rows batch up to ``batch_size`` per call — the HTTP twin
    of the 1000-row JDBC chunk. Rate limiting lives in the poster.
    """

    def _push(rows) -> None:
        post = poster_factory()
        batch: list[dict] = []
        for row in rows:
            batch.append(row.asDict(recursive=True))
            if len(batch) >= batch_size:
                post(batch)
                batch = []
        if batch:
            post(batch)

    df.foreachPartition(_push)


def merge_into_partitioned(
    spark: SparkSession,
    table_path: str,
    source: DataFrame,
    keys: list[str],
    partition_col: str,
    order_col: str | None = None,
    strategy: str = "upsert",
) -> list:
    """Partition-scoped MERGE (upsert) into a ``partitionBy``-laid-out
    parquet table — the vanilla-parquet approximation of Delta MERGE
    the SURVEY anticipates (§4.3), and the at-scale answer to "every
    upsert batch rewrites the whole table": only the partitions the
    batch touches are read, merged, and rewritten; every other
    partition's files are left BYTE-IDENTICAL on disk.

    Mechanics: (1) collect the batch's distinct partition values
    (driver-side — one value per touched partition, bounded by the
    batch, never the table); (2) read the target WITH that partition
    filter, which Spark prunes at the file listing — untouched
    partitions are never scanned (mirrors the reference's per-
    (tax_id, fiscal_year) upsert keys, ImportDbdFinancial.php:209-212);
    (3) ``merge_ops.upsert`` batch-wins semantics; (4) write back in
    ``partitionOverwriteMode=dynamic``, which replaces exactly the
    partition directories present in the merged frame. The merged
    slice is localCheckpointed first — Spark (correctly) refuses to
    overwrite a path it is still reading lazily from; the materialize
    cost is bounded by the touched partitions, which is the point.

    A source row whose ``partition_col`` moves it to a new partition
    value lands in that (possibly new) partition; rows for the SAME
    key in an untouched partition are NOT deleted — like Delta MERGE,
    key identity is scoped to the partitions the batch names, so
    include the partition column in ``keys`` when keys repeat across
    partitions. Returns the sorted rewritten partition values.

    ``strategy``: ``"upsert"`` (J6 — unmatched target rows in touched
    partitions survive) or ``"sync"`` (J4 scoped — the batch is the
    new truth for each partition it names: target keys missing from
    the batch are deleted there; other partitions untouched)."""
    if strategy not in ("upsert", "sync"):
        raise ValueError(f"strategy={strategy!r}: use 'upsert' or 'sync'")
    parts = [
        r[0]
        for r in source.select(partition_col).distinct().collect()
    ]
    if not parts:
        return []
    target = spark.read.parquet(table_path).filter(
        F.col(partition_col).isin(parts)
    )
    merged = (
        merge_ops.upsert(target, source, keys, order_col)
        if strategy == "upsert"
        else merge_ops.diff_sync_scoped(
            target, source, partition_col, keys, order_col
        )
    ).localCheckpoint(eager=True)
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(table_path)
    )
    return sorted(parts)


def atomic_overwrite_parquet(df: DataFrame, table_dir: str) -> str:
    """Write a new table snapshot and swap it in atomically — the
    vanilla-parquet stand-in for a transactional table format: readers
    resolve ``<table_dir>/current`` (a symlink) and never observe a
    half-written directory. Each snapshot is a new versioned subdir;
    old snapshots stay until ``vacuum_snapshots``.

    Concurrency contract (tests/test_sources.py pins both halves):

    - SINGLE WRITER. The swap serializes nothing between writers — two
      concurrent calls both succeed and the last ``os.replace`` wins,
      silently dropping the other's rows (exactly the lost-update mode
      a Delta/Iceberg optimistic-commit log would reject). The
      reference's importers are single-writer cron jobs
      (ImportDbdFinancial.php:209-212), and this operator keeps that
      assumption; a shared multi-writer lake needs the transactional
      format (README "Deployment notes").
    - READERS NEVER BLOCK AND NEVER TEAR. ``os.replace`` of the
      symlink is rename-atomic on POSIX: a reader resolves ``current``
      to exactly one snapshot dir. A scan that resolved the OLD
      snapshot keeps reading its (immutable, un-vacuumed) files to
      completion; the next resolution sees the new snapshot. Vacuum
      must therefore lag the longest reader (the retention knob on
      ``vacuum_snapshots``).

    This is how the merge operators' returned snapshots (upsert,
    replace_children, diff_sync) persist: compute new state → write →
    swap. Returns the new snapshot path."""
    import os
    import tempfile

    os.makedirs(table_dir, exist_ok=True)
    snap = tempfile.mkdtemp(prefix="snap_", dir=table_dir)
    df.write.mode("overwrite").parquet(snap)
    current = os.path.join(table_dir, "current")
    tmp_link = os.path.join(table_dir, ".current_tmp")
    if os.path.lexists(tmp_link):
        os.unlink(tmp_link)
    os.symlink(snap, tmp_link)
    os.replace(tmp_link, current)  # atomic on POSIX
    return snap


def write_audit_publish(
    df: DataFrame,
    table_dir: str,
    metrics: "dict[str, Column]",
    validate,
) -> dict:
    """WRITE → AUDIT → PUBLISH: the vanilla-parquet stand-in for a
    transactional commit with expectations (Delta's
    ``delta.constraints`` / an audit-publish pipeline stage).

    The snapshot is written first; ``metrics`` are collected DURING
    that write via ``df.observe`` (Spark's Observation API — one pass,
    no re-read of the output); ``validate(metrics_dict)`` then decides
    publication. Only on approval does the ``current`` symlink swap —
    a failed audit leaves the previous snapshot live and the rejected
    one quarantined on disk for inspection (never auto-deleted; it
    carries the evidence). ``validate`` returns True to publish, or
    False / a reason string to abort.

    Returns ``{"published": bool, "snapshot": path,
    "metrics": {...}, "reason": str | None}``. Single-writer, same as
    ``atomic_overwrite_parquet``."""
    import os
    import tempfile

    from pyspark.sql import Observation

    obs = Observation("write_audit")
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    os.makedirs(table_dir, exist_ok=True)
    snap = tempfile.mkdtemp(prefix="snap_", dir=table_dir)
    observed.write.mode("overwrite").parquet(snap)
    got = dict(obs.get)
    verdict = validate(got)
    ok = verdict is True
    if ok:
        current = os.path.join(table_dir, "current")
        tmp_link = os.path.join(table_dir, ".current_tmp")
        if os.path.lexists(tmp_link):
            os.unlink(tmp_link)
        os.symlink(snap, tmp_link)
        os.replace(tmp_link, current)
    return {
        "published": ok,
        "snapshot": snap,
        "metrics": got,
        "reason": None if ok else (
            verdict if isinstance(verdict, str) else "audit failed"
        ),
    }


def vacuum_snapshots(table_dir: str, keep: int = 2) -> list[str]:
    """Delete all but the ``keep`` newest snapshots, NEVER the one
    ``current`` resolves to. ``keep`` is the reader-lifetime knob: a
    snapshot may only be vacuumed once every scan that resolved it has
    finished, so size ``keep`` (or call cadence) above the longest
    query's runtime. Returns the deleted snapshot paths."""
    import os
    import shutil as _shutil

    current = os.path.realpath(os.path.join(table_dir, "current"))
    snaps = sorted(
        (
            os.path.join(table_dir, n)
            for n in os.listdir(table_dir)
            if n.startswith("snap_")
        ),
        key=os.path.getmtime,
    )
    victims = [
        s for s in snaps[: max(0, len(snaps) - keep)]
        if os.path.realpath(s) != current
    ]
    for v in victims:
        _shutil.rmtree(v, ignore_errors=True)
    return victims


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed (and optionally sorted) by its join/
    merge keys. Two tables bucketed identically join WITHOUT a shuffle
    — the repeated-merge workload (nightly upserts into gold on
    (tax_id, fiscal_year)) reads both sides pre-partitioned. This is
    the at-rest answer to "co-locate the join"; pick n_buckets ≈
    cluster cores × small multiple at the target SF."""
    writer = df.write.format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.mode(mode).saveAsTable(table_name)


def write_fixed_width(
    df: DataFrame,
    path: str,
    widths: list[int],
    mode: str = "overwrite",
) -> None:
    """Fixed-width flat-file sink: each column left-justified and
    space-padded to its width (the classic mainframe/bank layout the
    matching ``read_fixed_width`` parses back). A value wider than its
    field raises at write time — silent truncation would corrupt the
    positional layout for every later column on the line."""
    if len(widths) != len(df.columns):
        raise ValueError(
            f"widths ({len(widths)}) must match columns ({len(df.columns)})"
        )
    # NULL -> all-blank field (the classic fixed-width convention;
    # a NULL anywhere in a concat would otherwise null the whole line)
    line = F.concat(
        *[
            F.rpad(F.coalesce(F.col(c).cast("string"), F.lit("")), w, " ")
            for c, w in zip(df.columns, widths)
        ]
    )
    # rpad TRUNCATES overlong values; guard with an ANSI-raising check
    guard = F.concat_ws(
        "",
        *[
            F.when(
                F.length(F.col(c).cast("string")) > w,
                F.raise_error(
                    F.concat(
                        F.lit(f"fixed-width overflow in column {c}: "),
                        F.col(c).cast("string"),
                    )
                ),
            ).otherwise(F.lit(""))
            for c, w in zip(df.columns, widths)
        ],
    )
    df.select(F.concat(line, guard).alias("value")).write.mode(mode).text(path)
