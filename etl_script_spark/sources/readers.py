"""Readers (SURVEY.md §2.1 S1/S3/S11/S16).

Design: Spark's scans cannot retry a file under a different text
encoding, so the S1 multi-encoding fallback is a DRIVER-SIDE probe —
each file's bytes are sniffed once (cheap: first 64 KiB), files are
grouped by the first encoding that decodes them, and ONE distributed
``spark.read.csv`` runs per encoding group. The probe is O(#files) on
the driver; the data path stays fully distributed, so this holds at
100 TB (probe 100k files ≈ seconds; the scan itself is unchanged
Spark).

Reference semantics reproduced:
- S1 encoding cascade: ``credit-prepare-api/inv_old_processor.py:85-97``
  (utf-8 → utf-8-sig → cp874), ``services/bs_processor.py:75-78``,
  ``read_po_csv_to_json.py:38-44``.
- S3 multi-file union + lineage: ``po_processor.py:40-49``,
  ``read_rem_detail_to_json.py:93-122``.
- S11 pointer-scoped JSON stream: ``smf-api/.../ImportInvoiceReport.php:70-76``
  (JsonMachine ``/records`` pointer), ``ImportRmReport.php:60-65``
  (``/transactions``).
- S16 file-hash/meta envelope: ``pdf_ocr_dbd_to_json.py:97-102,445-456``.
"""

from __future__ import annotations

import codecs
import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_ENCODINGS = ("utf-8", "utf-8-sig", "cp874", "latin1")
PROBE_BYTES = 64 * 1024

# Python codec name → Java charset name (Spark's CSV reader is
# JVM-side). Spark 4 restricts csv charsets to a short list unless
# spark.sql.legacy.javaCharsets is on — read_csv_fallback sets it.
_JAVA_CHARSETS = {
    "utf-8": "UTF-8",
    "utf-8-sig": "UTF-8",  # BOM handled by Java's UTF-8 decode of csv
    "cp874": "x-windows-874",
    "tis-620": "TIS-620",
    "latin1": "ISO-8859-1",
    "cp1252": "windows-1252",
}


def _decode_probe(
    head: bytes, truncated: bool, encodings: tuple[str, ...]
) -> str:
    """Cascade decision on a file's head bytes — the single shared
    implementation behind both the driver-side and the distributed
    probe, so the two can never diverge. utf-8-sig is distinguished
    from utf-8 by the BOM."""
    if head.startswith(b"\xef\xbb\xbf") and "utf-8-sig" in encodings:
        return "utf-8-sig"
    for enc in encodings:
        if enc == "utf-8-sig":
            continue
        try:
            if truncated:
                # the 64 KiB boundary may split a multibyte sequence —
                # decode incrementally with final=False so a truncated
                # tail doesn't fail the probe and silently demote a
                # valid utf-8 file to cp874 (mojibake for Thai text)
                codecs.getincrementaldecoder(enc)(errors="strict").decode(
                    head, final=False
                )
            else:
                head.decode(enc)
            return enc
        except (UnicodeDecodeError, LookupError):
            continue
    return encodings[-1]


def sniff_encoding(
    path: str, encodings: tuple[str, ...] = DEFAULT_ENCODINGS
) -> str:
    """First encoding in the cascade that decodes the file's head.

    Mirrors the reference's try-read-retry loop
    (inv_old_processor.py:85-97) without reading the file N times:
    one 64 KiB head read, decoded in memory per candidate."""
    with open(path, "rb") as f:
        head = f.read(PROBE_BYTES)
    return _decode_probe(head, len(head) == PROBE_BYTES, encodings)


def sniff_encodings_distributed(
    spark: SparkSession,
    paths: list[str],
    encodings: tuple[str, ...] = DEFAULT_ENCODINGS,
    probe_bytes: int = PROBE_BYTES,
    files_per_task: int = 64,
) -> DataFrame:
    """S1 probe at lake scale: (path, encoding) computed ON EXECUTORS.

    The driver-side loop in ``sniff_encoding`` is O(#files) of
    sequential local ``open()`` — fine for the reference's dozens of
    files, a bottleneck (and object-store-incompatible) at millions.
    Here the path list is sliced across executors and each task reads
    only the head bytes through ``pyarrow.fs`` (LocalFileSystem for
    bare paths, ``FileSystem.from_uri`` for s3://, hdfs://, gs://, …),
    running the identical ``_decode_probe`` cascade. Only the
    (path, encoding) pairs come back — never file content — so the
    result of ``.collect()`` is metadata-sized regardless of corpus
    size. 1M files / 64 per task ≈ 16k tasks of a few ms of I/O each.
    """
    import pandas as pd

    encs = tuple(encodings)
    nbytes = probe_bytes

    def _probe(batches):
        import pyarrow.fs as pafs

        local = pafs.LocalFileSystem()
        for pdf in batches:
            out = []
            for p in pdf["path"]:
                if "://" in p:
                    fs, at = pafs.FileSystem.from_uri(p)
                else:
                    fs, at = local, p
                with fs.open_input_stream(at) as f:
                    head = f.read(nbytes)
                out.append(_decode_probe(head, len(head) == nbytes, encs))
            yield pd.DataFrame({"path": pdf["path"], "encoding": out})

    pdf = spark.createDataFrame([(p,) for p in paths], "path string")
    n_tasks = max(1, (len(paths) + files_per_task - 1) // files_per_task)
    return pdf.repartition(min(n_tasks, 4096)).mapInPandas(
        _probe, "path string, encoding string"
    )


def read_csv_fallback(
    spark: SparkSession,
    paths: list[str] | str,
    encodings: tuple[str, ...] = DEFAULT_ENCODINGS,
    add_lineage: bool = False,
    distributed_probe: bool | None = None,
    **csv_options,
) -> DataFrame:
    """S1: CSV read with per-file encoding fallback.

    Files are grouped by sniffed encoding; each group becomes one
    distributed ``spark.read.csv`` (Spark's ``encoding`` option is
    per-read), then groups union by name. ``add_lineage=True`` stamps
    ``source_file`` (S3's lineage column) via ``input_file_name()``.

    ``distributed_probe`` moves the encoding sniff to executors
    (``sniff_encodings_distributed``); default is automatic — driver
    probe below 256 files (session-startup-free), distributed above.
    Either way only (path, encoding) pairs reach the driver.
    """
    if isinstance(paths, str):
        paths = sorted(_glob.glob(paths)) or [paths]
    if distributed_probe is None:
        distributed_probe = len(paths) > 256
    groups: dict[str, list[str]] = {}
    if distributed_probe:
        for row in sniff_encodings_distributed(spark, paths, encodings).collect():
            groups.setdefault(row["encoding"], []).append(row["path"])
    else:
        for p in paths:
            groups.setdefault(sniff_encoding(p, encodings), []).append(p)

    if any(enc not in ("utf-8", "utf-8-sig") for enc in groups):
        spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    # schema is NOT a reader option — DataFrameReader.options()
    # stringifies values, so a StructType passed through **csv_options
    # would be silently ignored and every column read back as string
    # (caught by the round-7 full-catalog sweep: the S1 entry's
    # n_nationkey came back '0'/'10' strings). Route it to .schema().
    schema = csv_options.pop("schema", None)
    out: DataFrame | None = None
    for enc, files in sorted(groups.items()):
        charset = _JAVA_CHARSETS.get(enc, enc)
        reader = spark.read.options(encoding=charset, **csv_options)
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.csv(files)
        if add_lineage:
            df = df.withColumn("source_file", F.input_file_name())
        out = df if out is None else out.unionByName(df, allowMissingColumns=True)
    assert out is not None
    return out


def read_json_records(
    spark: SparkSession,
    path: str,
    pointer: str | None = None,
    multi_line: bool = True,
) -> DataFrame:
    """S11: JSON source scoped to a pointer (``/records``,
    ``/transactions``) — the JsonMachine shape.

    A top-level JSON *array* needs ``multiLine`` and Spark explodes it
    to rows natively. A pointer into an object (``{"records": [...]}``)
    reads the wrapper then ``explode``s the array field — column
    pruning means only the pointed-at subtree is ever materialized.
    JSON-lines files (one record per line) set ``multi_line=False`` and
    scale embarrassingly (splittable)."""
    df = spark.read.option("multiLine", str(multi_line).lower()).json(path)
    if pointer:
        field = pointer.strip("/").split("/")[0]
        df = df.select(F.explode(F.col(field)).alias("__rec")).select("__rec.*")
    return df


def read_files_with_meta(spark: SparkSession, path_glob: str) -> DataFrame:
    """S16: binary-file source with the reference's provenance envelope
    — md5, size, modification time per file
    (pdf_ocr_dbd_to_json.py:97-102). Content stays a binary column for
    downstream extractor sidecars (mapInPandas)."""
    bf = spark.read.format("binaryFile").load(path_glob)
    return bf.select(
        F.col("path"),
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length").alias("file_size"),
        F.col("modificationTime").alias("modified_at"),
        F.md5(F.col("content")).alias("md5"),
        F.col("content"),
    )


def union_files_with_lineage(
    spark: SparkSession, frames: list[tuple[str, DataFrame]]
) -> DataFrame:
    """S3: union heterogeneous per-sheet/per-file frames, tagging each
    with its origin (po_processor.py:40-49 concat + source_sheet)."""
    out: DataFrame | None = None
    for tag, df in frames:
        tagged = df.withColumn("source_sheet", F.lit(tag))
        out = tagged if out is None else out.unionByName(
            tagged, allowMissingColumns=True
        )
    assert out is not None
    return out


def read_csv_quarantine(
    spark: SparkSession,
    paths: list[str] | str,
    schema,
    corrupt_col: str = "_corrupt",
    **csv_options,
) -> DataFrame:
    """CSV read that survives malformed rows: PERMISSIVE mode with an
    explicit corrupt-record column, so a bad line becomes a row whose
    typed fields are NULL and whose ``corrupt_col`` holds the raw
    text — instead of killing the job (FAILFAST) or silently
    vanishing (DROPMALFORMED). The production contract a nightly
    ingest needs: load everything, quarantine the garbage WITH its
    original bytes for replay.

    The returned frame is localCheckpointed: Spark refuses filters
    that touch only the internal corrupt column on a lazy CSV plan
    (SPARK-26243) — materializing once also means the file is parsed
    a single time even though callers split it into good + quarantine
    branches.
    """
    from pyspark.sql import types as T

    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    df = spark.read.options(
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=corrupt_col,
        **csv_options,
    ).csv(paths, schema=full)
    return df.localCheckpoint(eager=False)


def split_quarantine(
    df: DataFrame, corrupt_col: str = "_corrupt"
) -> tuple[DataFrame, DataFrame]:
    """(good_rows_without_corrupt_col, quarantined_rows)."""
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull())
    return good, bad


def read_fixed_width(
    spark: SparkSession,
    path: str,
    fields: list[tuple[str, int, str]],
) -> DataFrame:
    """Fixed-width (positional) flat-file source — the bank-statement /
    mainframe-export format that predates delimiters. ``fields`` is an
    ordered ``(name, width, type)`` spec; consecutive widths tile each
    line left to right. Values are right-trimmed and ``try_cast`` so a
    malformed cell NULLs instead of killing the scan (ANSI-safe, same
    policy as every reader here).

    All-blank fields read as NULL (the convention ``write_fixed_width``
    emits for NULL values) — positional formats cannot distinguish an
    empty string from NULL, the format's inherent ambiguity.

    Plumbing: ``spark.read.text`` (line-splittable, parallel at any
    file size) + one substring projection per field — the whole parse
    is a single codegen Project over the scan; a 100 TB export parses
    at line-read speed, and unlike the CSV path there is no quoting
    state, so files split perfectly at any byte boundary."""
    if not fields:
        raise ValueError("fields must be non-empty")
    lines = spark.read.text(path)
    cols = []
    pos = 1
    for name, width, typ in fields:
        if width < 1:
            raise ValueError(f"field {name!r} width must be >= 1, got {width}")
        raw = F.rtrim(F.substring(F.col("value"), pos, width))
        blanked = F.when(raw == "", F.lit(None)).otherwise(raw)
        cols.append(
            blanked.try_cast(typ).alias(name)
            if typ != "string"
            else blanked.alias(name)
        )
        pos += width
    return lines.select(*cols)
