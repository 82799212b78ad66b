"""BS/IC batch-statement pipeline (SURVEY.md §3.3).

Headerless per-company CSV exports: years live in row 0 from column 3
on; the value block is rows 3..3+len(headers) under each year column;
company id/name come from the filename. Output: one typed row per
(company, year) with the declared header columns.

Row ORDER is the contract here (R4 positional extraction), so the
input frame carries an explicit ``(file, row_ord, cells)`` shape —
``csv_rows_with_order`` builds it from the encoding-probed CSV reader
(single-split small files keep intra-file order; the ordinal is
stamped at read time, SURVEY §4.3 item 1).

Ref: services/bs_processor.py:62-115 (BS), services/ic_processor.py:
26-78 (IC twin, different block size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_script_spark.functions import strings
from etl_script_spark.sources import readers


def csv_rows_with_order(
    spark: SparkSession,
    paths: list[str] | str,
    encodings: tuple[str, ...] = ("latin1", "cp1252"),
) -> DataFrame:
    """Headerless CSV → (file, row_ord, cells array<string>).

    The ordinal comes from ``monotonically_increasing_id`` over a
    single-split-per-file read (these exports are KB-sized; Spark
    reads each as one partition, preserving file order — the
    documented precondition, not an accident)."""
    df = readers.read_csv_fallback(
        spark, paths, encodings=encodings, header=False, add_lineage=True
    )
    cell_cols = [c for c in df.columns if c.startswith("_c")]
    return (
        df.withColumn("__mid", F.monotonically_increasing_id())
        .withColumn(
            "row_ord",
            F.row_number().over(
                Window.partitionBy("source_file").orderBy("__mid")
            )
            - 1,
        )
        .select(
            F.col("source_file").alias("file"),
            "row_ord",
            F.array(*[F.col(c).cast("string") for c in cell_cols]).alias("cells"),
        )
    )


def _coerce(value: F.Column) -> F.Column:
    """pd.to_numeric(errors='coerce') with NaN→0 (bs_processor.py:
    100-108): non-numeric and missing cells become 0."""
    return F.coalesce(
        F.regexp_replace(value, ",", "").try_cast("double"), F.lit(0.0)
    )


def process_statements(
    rows: DataFrame,
    headers: list[str],
    file_key_pattern: str = r"BS_(\d+)_([^_]+).*\.csv",
    year_row: int = 0,
    block_start: int = 3,
    first_year_col: int = 3,
) -> DataFrame:
    """(file, row_ord, cells) → one row per (company_id, company_name,
    year) with ``headers`` as typed columns. All distributed: year
    detection, the positional block melt, and the header pivot are
    joins/pivots on (file, column-index) — no driver-side cell peeks."""
    years = (
        rows.filter(F.col("row_ord") == year_row)
        .select(
            "file",
            F.posexplode(
                F.slice(F.col("cells"), first_year_col + 1, 1000)
            ).alias("yi", "cell"),
        )
        .select(
            "file",
            (F.col("yi") + first_year_col).alias("col_idx"),
            F.regexp_extract(F.col("cell"), r"(\d{4})", 1).alias("year"),
        )
        .filter(F.col("year") != "")
    )
    block = rows.filter(
        (F.col("row_ord") >= block_start)
        & (F.col("row_ord") < block_start + len(headers))
    ).select(
        "file",
        (F.col("row_ord") - block_start).alias("hi"),
        F.posexplode(F.col("cells")).alias("ci", "val"),
    )
    header_map = F.create_map(
        *[F.lit(x) for i, h in enumerate(headers) for x in (i, h)]
    )
    long = (
        block.join(
            years,
            (block.file == years.file) & (block.ci == years.col_idx),
        )
        .select(
            block.file.alias("file"),
            years.year.alias("year"),
            header_map[F.col("hi")].alias("item"),
            _coerce(F.col("val")).alias("value"),
        )
    )
    wide = (
        long.groupBy("file", "year")
        .pivot("item", headers)
        .agg(F.first("value"))
    )
    return wide.select(
        strings.filename_extract(F.col("file"), file_key_pattern, 1).alias(
            "company_id"
        ),
        strings.filename_extract(F.col("file"), file_key_pattern, 2).alias(
            "company_name"
        ),
        F.col("year").cast("int").alias("year"),
        *headers,
    )
