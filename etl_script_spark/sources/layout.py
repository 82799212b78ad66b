"""Physical-layout operators: range-clustered writes for data
skipping.

At 100 TB the fastest scan is the one that never happens: parquet
footers carry per-row-group min/max, and a scan with a pushed filter
skips row groups (and whole files) whose range cannot match. But the
stats only HELP if the writer clustered the data — a random layout
puts every key range in every file and the stats prune nothing.

``write_range_clustered`` is the vanilla-parquet form of what Delta
OPTIMIZE ZORDER / Iceberg sort orders do for one dimension:
repartitionByRange on the cluster key (one global sample-based range
exchange), sortWithinPartitions, write — every output file covers a
disjoint key interval, so a point/range filter prunes to the few
files whose interval intersects.

``file_ranges`` is the observability half: per-file min/max of the
cluster key. At test scale it reads the data; in production the same
numbers come from footer metadata (this is exactly what the footers
store)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_col: str,
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Range-partition into ``n_files`` disjoint key intervals, sort
    inside each, write parquet. The repartitionByRange is ONE
    shuffle driven by a reservoir sample of the key distribution —
    skew in the key tilts file sizes, not correctness (Spark's range
    partitioner splits hot ranges across boundaries only at distinct
    key values; a single mega-hot key lands in one file)."""
    (
        df.repartitionByRange(n_files, F.col(cluster_col))
        .sortWithinPartitions(cluster_col)
        .write.mode(mode)
        .parquet(path)
    )


def compact_files(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = 128 << 20,
    cluster_col: str | None = None,
) -> str:
    """Small-file compaction: rewrite a parquet directory into files
    sized for the scan path (default 128 MB — one Spark input split
    per file). Streaming sinks and per-batch appends leave thousands
    of KB-sized files; every one costs a listing entry, a footer read
    and a task, so scan cost becomes file-count- instead of
    byte-bound. The rewrite snapshots atomically via the
    ``current``-symlink convention (readers never see a half-compacted
    table). With ``cluster_col`` the rewrite also range-clusters, so
    one pass fixes file sizes AND restores data-skipping locality.

    File count is derived from the CURRENT on-disk bytes — the
    compressed size, which is what the next scan's splits see.
    Returns the new snapshot path.
    """
    import os

    from etl_script_spark.sources.writers import atomic_overwrite_parquet

    src = os.path.join(table_dir, "current")
    read_path = src if os.path.exists(src) else table_dir
    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _dn, fn in os.walk(os.path.realpath(read_path))
        for f in fn
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-total // target_file_bytes))  # ceil
    df = spark.read.parquet(read_path)
    if cluster_col is not None:
        df = df.repartitionByRange(n_files, F.col(cluster_col)).sortWithinPartitions(
            cluster_col
        )
    else:
        df = df.coalesce(n_files) if df.rdd.getNumPartitions() > n_files else df
    return atomic_overwrite_parquet(df, table_dir)


def file_ranges(spark: SparkSession, path: str, cluster_col: str) -> DataFrame:
    """Per-file (min, max, rows) of the cluster key — the stats a
    pushed range filter prunes against. Reads the column at test
    scale; production reads the same stats from footers."""
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min(cluster_col).alias("min_key"),
            F.max(cluster_col).alias("max_key"),
            F.count(F.lit(1)).alias("rows"),
        )
    )


def zorder_key(cols: list, bits: int = 16) -> F.Column:
    """Morton (Z-order) interleave of 2+ NON-NEGATIVE integer columns,
    ``bits`` low bits each — the multi-dimension generalization of
    ``write_range_clustered``'s one-dimension sort. Sorting by the
    interleaved code keeps rows close in EVERY dimension close in the
    file order, so per-file min/max stats prune scans filtered on ANY
    subset of the dimensions (a plain compound sort only prunes on
    its leading column). This is what Delta OPTIMIZE ZORDER BY and
    Iceberg's z-ordered sort compute; here it is a pure Column
    expression — an unrolled shift/or chain over ``bits``·k single-
    cycle long ops, fully inside whole-stage codegen, and simple
    enough that an external SQL engine replays it bit-for-bit.

    Callers quantize first (bucket a timestamp to days, hash-mod a
    string, clamp a long to [0, 2^bits)): the key uses the LOW
    ``bits`` bits of each input — values outside wrap into the grid,
    which degrades pruning but never correctness. bits·k must stay
    ≤ 62 (int64, ANSI-safe)."""
    k = len(cols)
    if k < 2:
        raise ValueError("zorder needs >= 2 dimensions; use range clustering for 1")
    if bits * k > 62:
        raise ValueError(f"bits={bits} x {k} dims > 62 — interleave overflows int64")
    code = F.lit(0).cast("long")
    for b in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftrightunsigned(F.col(c).cast("long") if isinstance(c, str) else c.cast("long"), b).bitwiseAND(F.lit(1))
            code = code.bitwiseOR(F.shiftleft(bit, b * k + j))
    return code


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    """The DuckDB/ANSI twin of ``zorder_key`` — the same unrolled
    shift/or chain as SQL text, so an oracle can verify the codes."""
    k = len(cols)
    terms = [
        f"(((CAST({c} AS BIGINT) >> {b}) & 1) << {b * k + j})"
        for b in range(bits)
        for j, c in enumerate(cols)
    ]
    return " | ".join(terms)


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet write: compute the Morton code,
    range-partition on it into ``n_files`` disjoint code intervals
    (one sample-based shuffle), sort within each, drop the transient
    code column, write. Every output file covers a compact rectangle-
    ish region of the key space, so filters on any clustered
    dimension prune files by footer stats."""
    (
        df.withColumn("__z", zorder_key(cols, bits))
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
