"""Windowed aggregations over event time (SURVEY.md §2.10).

These helpers build plans that are valid on BOTH batch and streaming
DataFrames — the engine's contract is "same query, same result" so
every streaming aggregation is oracle-checkable by running the
identical plan in batch mode (tests do exactly that; the reference has
no streaming at all, so this is the declared superset capability).

Scale notes: windowed aggs shuffle on (window, keys); Spark stores
per-window state only for streaming mode, bounded by the watermark.
Session windows use Spark's native ``session_window`` (state merges
adjacent sessions; the batch equivalent is the gaps-and-islands plan
the DuckDB oracle runs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Non-overlapping fixed windows: one row per (window, keys)."""
    return (
        df.groupBy(F.window(F.col(ts_col), duration), *keys)
        .agg(*aggs)
        .withColumn("win_start", F.col("window.start"))
        .withColumn("win_end", F.col("window.end"))
        .drop("window")
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Overlapping windows every ``slide``; each event lands in
    duration/slide windows."""
    return (
        df.groupBy(F.window(F.col(ts_col), duration, slide), *keys)
        .agg(*aggs)
        .withColumn("win_start", F.col("window.start"))
        .withColumn("win_end", F.col("window.end"))
        .drop("window")
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Session windows: events of a key closer than ``gap`` merge into
    one session [min_ts, max_ts + gap)."""
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap), *keys)
        .agg(*aggs)
        .withColumn("session_start", F.col("session_window.start"))
        .withColumn("session_end", F.col("session_window.end"))
        .drop("session_window")
    )


def watermarked(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Late-data bound for streaming mode; a no-op on batch frames —
    the same plan stays batch-checkable."""
    if df.isStreaming:
        return df.withWatermark(ts_col, delay)
    return df


def dedup_events(
    df: DataFrame, ts_col: str, keys: list[str], delay: str = "1 hour"
) -> DataFrame:
    """Exactly-once-ish dedup on composite keys (the reference's D1 /
    J7 semantics): streaming mode bounds state with a watermark, batch
    mode is a plain dropDuplicates on the same keys."""
    return watermarked(df, ts_col, delay).dropDuplicates(keys)
