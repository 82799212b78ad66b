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
is try-gated, and BOTH binary formats end in a STDLIB floor: .xlsx in
``parse_xlsx_stdlib`` (zipfile + ElementTree over the OOXML parts),
legacy .xls in ``xls_biff.parse_xls_stdlib`` (CFB container + BIFF8
records from scratch) — so S2 works with zero optional dependencies.
The sniff/cascade logic itself is dependency-free and unit-tested.
"""

from __future__ import annotations

import io
import re as _re
import zipfile
from collections.abc import Iterator
from xml.etree import ElementTree as ET

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
    if kind == "xlsx":
        try:
            return parse_xlsx_stdlib(payload, header=header)
        except Exception as e:
            errors.append(f"stdlib: {type(e).__name__} {e}")
    if kind == "xls":
        try:
            from etl_script_spark.sources.xls_biff import parse_xls_stdlib

            return parse_xls_stdlib(payload, header=header)
        except Exception as e:
            errors.append(f"stdlib-biff: {type(e).__name__} {e}")
    raise ImportError(
        f"no usable excel engine for {kind}; tried: {'; '.join(errors)}"
    )


# --------------------------------------------------------------------
# Stdlib OOXML engine — the cascade's dependency-free floor for .xlsx
# --------------------------------------------------------------------

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_CELL_REF = _re.compile(r"^([A-Z]+)(\d+)$")


def _col_index(ref: str) -> int:
    """'A'→0, 'Z'→25, 'AA'→26 …"""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _cell_text(c, shared: list[str]) -> "str | None":
    t = c.get("t", "n")
    if t == "s":  # shared string
        v = c.find(f"{_NS}v")
        return shared[int(v.text)] if v is not None and v.text else None
    if t == "inlineStr":
        return "".join(
            el.text or "" for el in c.iter(f"{_NS}t")
        ) or None
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "b":
        return "True" if v.text == "1" else "False"
    return v.text  # n / str: the stored literal


def parse_xlsx_stdlib(payload: bytes, header: "int | None" = 0):
    """Dependency-free .xlsx parse: zipfile + ElementTree over the
    OOXML parts (workbook → sheet targets, sharedStrings, per-sheet
    cell grid). Returns ``[(sheet_name, pandas.DataFrame)]`` with all
    values as the stored literals (strings) — numbers keep their raw
    lexical form and DATE cells stay Excel serials, which is exactly
    what the engine's F2 ``excel_serial_to_date`` consumes (the
    reference's supplier pipeline receives serials the same way,
    supplier_processor.py:57-61).

    This is the cascade's floor so S2 works in dependency-free
    containers; openpyxl/calamine take precedence when installed
    (richer type/format handling)."""
    import pandas as pd

    zf = zipfile.ZipFile(io.BytesIO(payload))
    names = set(zf.namelist())

    shared: list[str] = []
    if "xl/sharedStrings.xml" in names:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in root.findall(f"{_NS}si"):
            shared.append("".join(el.text or "" for el in si.iter(f"{_NS}t")))

    # workbook sheet order → worksheet part targets (via rels)
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rid_ns = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
    rels = {}
    if "xl/_rels/workbook.xml.rels" in names:
        rroot = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in rroot:
            rels[rel.get("Id")] = rel.get("Target").lstrip("/")
    sheets_out = []
    for sh in wb.iter(f"{_NS}sheet"):
        name = sh.get("name")
        target = rels.get(sh.get(f"{rid_ns}id"), "worksheets/sheet1.xml")
        part = target if target.startswith("xl/") else f"xl/{target}"
        if part not in names:
            continue
        sroot = ET.fromstring(zf.read(part))
        grid: dict[int, dict[int, str]] = {}
        max_col = -1
        for ri, row in enumerate(sroot.iter(f"{_NS}row")):
            r_idx = int(row.get("r", ri + 1)) - 1
            for ci, c in enumerate(row.findall(f"{_NS}c")):
                m = _CELL_REF.match(c.get("r", ""))
                col = _col_index(m.group(1)) if m else ci
                val = _cell_text(c, shared)
                if val is not None:
                    grid.setdefault(r_idx, {})[col] = val
                    max_col = max(max_col, col)
        if not grid:
            continue
        n_rows = max(grid) + 1
        data = [
            [grid.get(r, {}).get(c) for c in range(max_col + 1)]
            for r in range(n_rows)
        ]
        if header is not None and data:
            cols = [
                data[header][i] if data[header][i] is not None else f"col_{i}"
                for i in range(max_col + 1)
            ]
            pdf = pd.DataFrame(data[header + 1 :], columns=cols)
        else:
            pdf = pd.DataFrame(data)
        sheets_out.append((name, pdf))
    return sheets_out


def write_xlsx_simple(rows: "list[list]", path: str, sheet: str = "Sheet1") -> None:
    """Minimal stdlib .xlsx writer (inline strings / raw numbers) —
    fixture tooling for tests and catalog queries; NOT a general sink.
    Numbers are written as numeric cells, everything else inline
    strings."""
    from xml.sax.saxutils import escape

    def cell(r, c, v):
        ref = ""
        n = c + 1
        while n:
            n, rem = divmod(n - 1, 26)
            ref = chr(65 + rem) + ref
        ref = f"{ref}{r + 1}"
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        if v is None:
            return ""
        return f'<c r="{ref}" t="inlineStr"><is><t>{escape(str(v))}</t></is></c>'

    body = "".join(
        f'<row r="{r + 1}">' + "".join(cell(r, c, v) for c, v in enumerate(row)) + "</row>"
        for r, row in enumerate(rows)
    )
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS[1:-1]}"><sheetData>{body}</sheetData></worksheet>'
    )
    wb_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS[1:-1]}" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{sheet}" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" '
        'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", wb_xml)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)


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
