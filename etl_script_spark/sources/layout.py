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


def with_hilbert_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    out_col: str = "__h",
) -> DataFrame:
    """Hilbert-curve index of two NON-NEGATIVE integer columns,
    ``bits`` low bits each — the locality-preserving space-filling
    curve that beats Z-order for file pruning: the Hilbert curve has
    no long diagonal jumps, so a box filter touches fewer code
    intervals (why e.g. Apache Iceberg offers hilbert alongside
    zorder). Standard xy→d transform (the Wikipedia rot/reflect
    form, FULL-GRID ``n−1−x`` reflection so coordinates stay in
    [0, n) — the ``s−1−x`` variant goes negative, where truncating
    division reads different bits than C's two's-complement ``&``
    and the curve loses adjacency) unrolled over ``bits`` steps; the
    quadrant term
    ``(3·rx) XOR ry`` is algebraized to ``3·rx + ry − 2·rx·ry``
    (exact for bits rx,ry ∈ {0,1}), so the whole chain is pure
    +/−/·/CASE integer arithmetic — no bitwise ops an oracle engine
    might type differently. Each step is one projection; the column
    staging keeps the expression tree linear in ``bits`` (a single
    nested expression would grow 3^bits).

    Inputs are clamped into the grid with a POSITIVE mod
    ``((v % 2^bits) + 2^bits) % 2^bits`` (wrap degrades pruning,
    never correctness — the zorder_key contract). Plain ``%`` follows
    the dividend's sign in both engines, and a negative __hx/__hy
    would break the n−1−x reflection AND make the DIV/% bit reads
    misread — the same reason zorder_key masks bits."""
    if bits < 1 or 2 * bits > 62:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    n = 1 << bits
    d = df.withColumn(
        "__hx", F.expr(f"((CAST({x_col} AS BIGINT) % {n}) + {n}) % {n}")
    ).withColumn(
        "__hy", F.expr(f"((CAST({y_col} AS BIGINT) % {n}) + {n}) % {n}")
    ).withColumn(out_col, F.lit(0).cast("long"))
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = f"(CASE WHEN (__hx DIV {s}) % 2 = 1 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (__hy DIV {s}) % 2 = 1 THEN 1 ELSE 0 END)"
        d = (
            d.withColumn("__rx", F.expr(rx).cast("long"))
            .withColumn("__ry", F.expr(ry).cast("long"))
            .withColumn(
                out_col,
                F.expr(
                    f"{out_col} + {s}::BIGINT * {s}"
                    " * (3 * __rx + __ry - 2 * __rx * __ry)"
                ),
            )
            .withColumn(
                "__hx2",
                F.expr(
                    f"CASE WHEN __ry = 0 THEN"
                    f" (CASE WHEN __rx = 1 THEN {n} - 1 - __hy"
                    f"  ELSE __hy END) ELSE __hx END"
                ),
            )
            .withColumn(
                "__hy",
                F.expr(
                    f"CASE WHEN __ry = 0 THEN"
                    f" (CASE WHEN __rx = 1 THEN {n} - 1 - __hx"
                    f"  ELSE __hx END) ELSE __hy END"
                ),
            )
            .withColumn("__hx", F.col("__hx2"))
        )
    return d.drop("__hx", "__hy", "__hx2", "__rx", "__ry")


def hilbert_key_sql(
    x_sql: str, y_sql: str, bits: int, inner_sql: str, passthrough: str
) -> str:
    """The DuckDB/ANSI twin of :func:`with_hilbert_key`: the same
    per-step quadrant/rotate arithmetic as ``bits`` nested SELECTs
    (column staging, linear text growth). ``passthrough`` is the
    comma-joined columns to carry; the result exposes them plus
    ``h`` (the Hilbert index)."""
    n = 1 << bits
    q = (
        f"SELECT {passthrough},"
        f" ((CAST({x_sql} AS BIGINT) % {n}) + {n}) % {n} AS hx,"
        f" ((CAST({y_sql} AS BIGINT) % {n}) + {n}) % {n} AS hy,"
        f" CAST(0 AS BIGINT) AS h FROM ({inner_sql})"
    )
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = f"(CASE WHEN (hx // {s}) % 2 = 1 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy // {s}) % 2 = 1 THEN 1 ELSE 0 END)"
        q = (
            f"SELECT {passthrough},"
            f" h + CAST({s} AS BIGINT) * {s}"
            f" * (3 * {rx} + {ry} - 2 * {rx} * {ry}) AS h,"
            f" CASE WHEN {ry} = 0 THEN"
            f" (CASE WHEN {rx} = 1 THEN {n} - 1 - hy ELSE hy END)"
            f" ELSE hx END AS hx,"
            f" CASE WHEN {ry} = 0 THEN"
            f" (CASE WHEN {rx} = 1 THEN {n} - 1 - hx ELSE hx END)"
            f" ELSE hy END AS hy"
            f" FROM ({q})"
        )
    return q


def write_hilbert_clustered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Hilbert-clustered parquet write: same shape as
    write_zorder_clustered (range-partition on the curve index into
    ``n_files`` disjoint intervals, sort within each, drop the
    transient key) with the Hilbert index in place of the Morton
    code."""
    (
        with_hilbert_key(df, x_col, y_col, bits, "__hk")
        .repartitionByRange(n_files, F.col("__hk"))
        .sortWithinPartitions("__hk")
        .drop("__hk")
        .write.mode(mode)
        .parquet(path)
    )


def file_skipping_stats(
    spark: SparkSession,
    path: str,
    cluster_col: str,
    lo,
    hi,
) -> DataFrame:
    """Zone-map pruning report for a range predicate ``lo <= col <=
    hi``: per data file, the cluster key's (min, max, rows) and
    whether the file is SKIPPABLE (its range misses the predicate
    entirely) — the layout-quality readout that says what fraction of
    the table a clustered write (write_range_clustered / zorder /
    hilbert) lets the scanner never open. At 100 TB this is THE
    number that matters: a scattered layout reads everything, a
    clustered one opens max(1, selectivity·files) files.

    Test scale reads the column to derive the stats (same numbers the
    parquet footers carry); the file identity normalizes the file:
    URI so the report joins/compares across engines by plain path.

    The cluster column must be an integral type: min/max publish as
    long, and a silent cast of a date/string zorder key would yield
    NULL stats and a NULL skippable flag instead of a usable report —
    validate-don't-default, so non-integral keys raise up front.

    Returns (file, rows, min_key, max_key, skippable) sorted by file.
    """
    src = spark.read.parquet(path)
    ctype = dict(src.dtypes).get(cluster_col)
    if ctype is None:
        raise ValueError(
            f"file_skipping_stats: column {cluster_col!r} not in table"
        )
    if ctype not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"file_skipping_stats: cluster column {cluster_col!r} has"
            f" type {ctype}; min/max report as long, so the cluster key"
            " must be integral — derive an integer key (days-since-epoch,"
            " dictionary code) and cluster on that"
        )
    ranges = (
        src
        .groupBy(
            F.regexp_replace(
                F.input_file_name(), "^file:(//)?", ""
            ).alias("file")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("rows"),
            F.min(cluster_col).cast("long").alias("min_key"),
            F.max(cluster_col).cast("long").alias("max_key"),
        )
    )
    return ranges.select(
        "file",
        "rows",
        "min_key",
        "max_key",
        ((F.col("max_key") < F.lit(lo)) | (F.col("min_key") > F.lit(hi)))
        .alias("skippable"),
    ).orderBy("file")
