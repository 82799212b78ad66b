"""S2: Excel source with magic-byte sniffing + engine cascade
(SURVEY.md §2.1 S2; reference: script_read_dbd_balance.py:98-150,
script_read_dbd_income.py:177-263).

No native Spark Excel source exists; two shapes are provided:

1. ``read_excel_driver`` — few files: driver-side pandas read (engine
   cascade), then ``spark.createDataFrame``. Right for dim-sized
   inputs (the reference's per-company XLS downloads).
2. ``read_excel_distributed`` — many files: ``binaryFile`` scan +
   ``mapInPandas``, so each executor parses its own files from the
   binary payload. This is the 100 TB shape — the driver never touches
   file contents.

Engine libraries (openpyxl/xlrd/calamine) are OPTIONAL — every import
is try-gated and a clear ImportError names what is missing. The sniff/
cascade logic itself is dependency-free and unit-tested.
"""

from __future__ import annotations

import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

XLSX_MAGIC = b"PK\x03\x04"
XLS_MAGIC = b"\xd0\xcf\x11\xe0"


def sniff_excel_kind(head: bytes) -> str:
    """'xlsx' | 'xls' | 'html' — the reference sniffs magic bytes
    before choosing an engine (script_read_dbd_balance.py:98-109;
    the read_html escape hatch handles mislabeled HTML exports)."""
    if head.startswith(XLSX_MAGIC):
        return "xlsx"
    if head.startswith(XLS_MAGIC):
        return "xls"
    return "html"


def _engine_cascade(kind: str) -> list[str]:
    if kind == "xlsx":
        return ["openpyxl", "calamine"]
    if kind == "xls":
        return ["xlrd", "calamine"]
    return []  # html → pandas.read_html


def _parse_excel_bytes(payload: bytes, header: int | None, dtype_str: bool):
    """Engine cascade over in-memory bytes → list of (sheet, pandas df).
    Raises ImportError naming the missing engine when none works."""
    import pandas as pd

    kind = sniff_excel_kind(payload[:8])
    errors: list[str] = []
    if kind == "html":
        try:
            frames = pd.read_html(io.BytesIO(payload))
            return [(f"table_{i}", f) for i, f in enumerate(frames)]
        except Exception as e:  # lxml/bs4 missing or not html
            raise ImportError(f"html fallback failed: {e}") from e
    for engine in _engine_cascade(kind):
        try:
            sheets = pd.read_excel(
                io.BytesIO(payload),
                sheet_name=None,
                engine=engine,
                header=header,
                dtype=str if dtype_str else None,
            )
            return list(sheets.items())
        except ImportError as e:
            errors.append(f"{engine}: {e}")
        except Exception as e:
            errors.append(f"{engine}: {type(e).__name__} {e}")
    raise ImportError(
        f"no usable excel engine for {kind}; tried: {'; '.join(errors)}"
    )


def read_excel_driver(
    spark: SparkSession,
    paths: list[str],
    header: int | None = 0,
    dtype_str: bool = True,
) -> DataFrame:
    """Driver-side S2 read for few/small files, with S3 lineage columns
    (source_file, source_sheet). All-null sheets are skipped
    (po_processor.py:45)."""
    import pandas as pd

    frames = []
    for p in paths:
        with open(p, "rb") as f:
            payload = f.read()
        for sheet, pdf in _parse_excel_bytes(payload, header, dtype_str):
            if pdf.empty or pdf.isna().all().all():
                continue
            pdf = pdf.copy()
            pdf["source_file"] = p
            pdf["source_sheet"] = str(sheet)
            frames.append(pdf)
    if not frames:
        raise ValueError(f"no non-empty sheets in {paths}")
    merged = pd.concat(frames, ignore_index=True)
    merged.columns = [str(c) for c in merged.columns]
    return spark.createDataFrame(merged)


def read_excel_distributed(
    spark: SparkSession,
    path_glob: str,
    result_schema,
    header: int | None = 0,
    dtype_str: bool = True,
) -> DataFrame:
    """Distributed S2: binaryFile + mapInPandas. ``result_schema`` is
    the declared output StructType (column names must exist in the
    parsed sheets; missing ones become null). Each task parses whole
    files — partition sizing is by file via binaryFile's splits."""
    import pandas as pd

    names = [f.name for f in result_schema.fields]

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out_rows = []
            for _, r in pdf.iterrows():
                for sheet, sdf in _parse_excel_bytes(
                    bytes(r["content"]), header, dtype_str
                ):
                    if sdf.empty:
                        continue
                    sdf = sdf.copy()
                    sdf["source_file"] = r["path"]
                    sdf["source_sheet"] = str(sheet)
                    out_rows.append(sdf)
            if out_rows:
                merged = pd.concat(out_rows, ignore_index=True)
                for n in names:
                    if n not in merged.columns:
                        merged[n] = None
                yield merged[names]

    bf = spark.read.format("binaryFile").load(path_glob)
    return bf.select("path", "content").mapInPandas(_extract, result_schema)
