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
