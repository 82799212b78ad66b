"""Sale-report pipelines (SURVEY.md §2.1 S7/S8 transform side).

The reference's sale pipelines POST each PDF to a remote LLM-OCR API
that answers with HTML (pdf_ocr_sale_invoice_to_json.py:34-68 — the
fetch half stays driver-side tooling / an ``extract`` engine), then:

1. parse every ``<table>`` — header from the first ``<tr>``, ragged
   rows padded/trimmed to the max width (:96-106 normalize_columns),
2. drop blank + total lines (:108-110 is_total_line, P6) and repair
   merged cells (:116-121 clean_cell: a cell polluted by 'Total' or a
   second number keeps its first number),
3. parse the non-table header text for topic / round-date range
   (Thai month names → numbers, F6) / vendor (:124-160),
4. enrich every row with the document metadata, money rounded to 2dp
   with failure→0.0, ``วันที่``/date columns through the dotted-BE
   parse (:228-248, F7/F28),
5. map Thai keys to DB columns + cn_ref_doc ``.0``-strip (F29) for
   the insert-only import (ImportSaleInvoiceReport.php:66-147).

Spark-first: the OCR API emits machine-generated, well-formed HTML,
so the table parse is a pure Column-expression regex pipeline
(regexp_extract_all + posexplode) — no BeautifulSoup, no UDF, fully
codegen'd and distributed. Header/row raggedness is resolved with one
window per table. Map access uses try_element_at throughout (ANSI
mode: [] on a missing map key throws).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_script_spark.functions import dates, strings

# --------------------------------------------------------------------
# S8: HTML table parse (pdf_ocr_sale_invoice_to_json.py:168-215)
# --------------------------------------------------------------------

_TABLE_RE = r"(?s)<table[^>]*>(.*?)</table>"
_TR_RE = r"(?s)<tr[^>]*>(.*?)</tr>"
_CELL_RE = r"(?s)<t[dh][^>]*>(.*?)</t[dh]>"
_TOTAL_LINE_RE = r"(?i)(\btotal\b|grand\s*total|รวมยอดทั้งหมด)"


def _strip_tags(c: Column) -> Column:
    return strings.norm_ws(F.regexp_replace(c, r"<[^>]+>", " "))


def parse_html_tables(
    docs: DataFrame, html_col: str, id_cols: list[str]
) -> DataFrame:
    """Explode OCR-HTML documents into per-row cell arrays.

    Output: ``id_cols…, table_index, row_index, cells array<string>``
    — row 0 of each table is its header row. Cell text is tag-stripped
    and whitespace-normalized (get_text(strip=True) equivalent)."""
    tables = F.regexp_extract_all(F.col(html_col), F.lit(_TABLE_RE), 1)
    with_tables = docs.select(
        *id_cols, F.posexplode(tables).alias("table_index", "__tbody")
    )
    rows = F.regexp_extract_all(F.col("__tbody"), F.lit(_TR_RE), 1)
    with_rows = with_tables.select(
        *id_cols,
        "table_index",
        F.posexplode(rows).alias("row_index", "__row"),
    )
    cells = F.transform(
        F.regexp_extract_all(F.col("__row"), F.lit(_CELL_RE), 1),
        _strip_tags,
    )
    return with_rows.select(*id_cols, "table_index", "row_index", cells.alias("cells"))


def _clean_cell(c: Column) -> Column:
    """clean_cell :116-121 — a cell contaminated by a 'Total' overlay
    keeps its first number (or ''); a cell with two space-separated
    numbers keeps the first; anything else passes through."""
    nums = F.regexp_extract_all(c, F.lit(r"(\d+(?:\.\d+)?)"), 1)
    first = F.coalesce(F.try_element_at(nums, F.lit(1)), F.lit(""))
    return (
        F.when(c.rlike(r"(?i)total"), first)
        .when(c.rlike(r"\d+(?:\.\d+)?\s+\d+(?:\.\d+)?"), first)
        .otherwise(c)
    )


def html_rows_to_records(
    rows: DataFrame, id_cols: list[str]
) -> DataFrame:
    """Header-promote + normalize the exploded table rows to records.

    Per (document, table): pad/trim every row to the table's max width
    (normalize_columns :96-106; empty header slots become col_<i>),
    drop blank rows and total lines (:108-110), clean each cell, and
    emit ``fields map<string,string>`` + the stamped row order. The
    ``ลำดับที่`` non-empty filter (:153-154) applies when that column
    exists."""
    w = Window.partitionBy(*id_cols, "table_index")
    padded_w = F.greatest(F.max(F.size("cells")).over(w), F.lit(1))
    df = rows.withColumn("__width", padded_w)
    pad = F.concat(
        F.col("cells"),
        F.array_repeat(F.lit(""), F.col("__width") - F.size("cells")),
    )
    df = df.withColumn("__cells", F.slice(pad, 1, F.col("__width")))
    header = F.first(
        F.when(F.col("row_index") == 0, F.col("__cells")), ignorenulls=True
    ).over(w)
    df = df.withColumn(
        "__header",
        F.transform(
            header,
            lambda h, i: F.when(h == "", F.concat(F.lit("col_"), (i + 1).cast("string"))).otherwise(h),
        ),
    )
    data = df.filter(F.col("row_index") > 0)
    joined = F.lower(F.array_join("__cells", " "))
    data = data.filter(F.exists("__cells", lambda c: c != "")).filter(
        ~joined.rlike(_TOTAL_LINE_RE)
    )
    fields = F.map_from_arrays(
        "__header", F.transform("__cells", _clean_cell)
    )
    out = data.select(
        *id_cols, "table_index", "row_index", fields.alias("fields")
    )
    seq = F.try_element_at("fields", F.lit("ลำดับที่"))
    return out.filter(seq.isNull() | (F.trim(seq) != ""))


# --------------------------------------------------------------------
# Non-table metadata (:124-160)
# --------------------------------------------------------------------

# full Thai month names → zero-padded numbers (:73-78)
_TH_MONTH_NUM = {
    name: f"{num:02d}"
    for name, num in dates.THAI_MONTHS.items()
    if not name.endswith(".")
}


def parse_sale_metadata(docs: DataFrame, html_col: str, id_cols: list[str]) -> DataFrame:
    """Topic, round-date range (``รอบวันที่ d - d <thai month> <BE year>``
    → ``dd.MM.yyyy`` strings), vendor number + name — parsed from the
    document text OUTSIDE the tables."""
    no_tables = F.regexp_replace(F.col(html_col), _TABLE_RE, " ")
    text = _strip_tags(no_tables)
    topic = F.regexp_extract(
        text, r"(รายงานการขายสินค้า\s*-\s*แยกตาม\s*Invoice)", 1
    )
    rng = r"รอบวันที่\s*(\d{1,2})\s*-\s*(\d{1,2})\s*([ก-๙]+)\s*(\d{4})"
    d1 = F.regexp_extract(text, rng, 1)
    d2 = F.regexp_extract(text, rng, 2)
    mth = F.regexp_extract(text, rng, 3)
    yr = F.regexp_extract(text, rng, 4)
    mnum = F.coalesce(
        F.create_map(*[F.lit(x) for kv in _TH_MONTH_NUM.items() for x in kv])[
            F.trim(mth)
        ],
        F.lit("00"),
    )
    mk = lambda d: F.when(  # noqa: E731
        d != "", F.concat(F.lpad(d, 2, "0"), F.lit("."), mnum, F.lit("."), yr)
    ).otherwise(F.lit(""))
    vendor = r"#?\s*Vendor\s*(\d+)\s*/\s*([^\(]+)"
    return docs.select(
        *id_cols,
        topic.alias("topic"),
        mk(d1).alias("start_round_date"),
        mk(d2).alias("end_round_date"),
        F.trim(F.regexp_extract(text, vendor, 2)).alias("supplier_name"),
        F.regexp_extract(text, vendor, 1).alias("supplier_num"),
    )


# --------------------------------------------------------------------
# Enrichment (:228-248) + DB key mapping (ImportSaleInvoiceReport.php)
# --------------------------------------------------------------------

MONEY_COLS_TH = ("จำนวนเงิน", "ภาษี", "จำนวนเงินสุทธิ")

# :66-79 Thai header → DB column
THAI_TO_DB = {
    "เลขที่เอกสาร": "doc_no",
    "Invoice no.": "invoice_no",
    "วันที่เอกสาร": "invoice_date",
    "PO no.": "po_no",
    "CN. Ref. Doc.": "cn_ref_doc",
    "Assignment": "assignment",
    "จำนวนเงิน": "amount",
    "ภาษี": "vat",
    "จำนวนเงินสุทธิ": "net_amount",
}


def _money(c: Column) -> Column:
    """round(float(x.replace(',','')), 2), failure → 0.0 (:230-235)."""
    return F.round(
        F.coalesce(F.regexp_replace(c, ",", "").try_cast("double"), F.lit(0.0)), 2
    )


def _round_date_iso(c: Column) -> Column:
    """convert_date_round_dd_mm_yyyy :80-94 — ``dd.MM.yyyy`` with a
    strict->2400 BE year → ISO string; unparseable → NULL (the
    engine's failure→NULL contract where the reference echoes the raw
    string back)."""
    return dates.be_dotted_to_iso(c).cast("string")


def sale_invoice_records(docs: DataFrame, html_col: str, id_cols: list[str]) -> DataFrame:
    """Full S8 lifecycle: HTML → normalized table records enriched
    with per-document metadata, money and date columns typed."""
    rows = parse_html_tables(docs, html_col, id_cols)
    records = html_rows_to_records(rows, id_cols)
    meta = parse_sale_metadata(docs, html_col, id_cols)
    enriched = records.join(F.broadcast(meta), id_cols, "left")
    g = lambda k: F.try_element_at("fields", F.lit(k))  # noqa: E731
    return enriched.select(
        *id_cols,
        "table_index",
        "row_index",
        g("ลำดับที่").alias("seq_no"),
        g("เลขที่เอกสาร").alias("doc_no_th"),
        g("Invoice no.").alias("invoice_no_th"),
        _round_date_iso(g("วันที่เอกสาร")).alias("invoice_date_th"),
        g("PO no.").alias("po_no_th"),
        g("CN. Ref. Doc.").alias("cn_ref_doc_th"),
        g("Assignment").alias("assignment_th"),
        _money(g("จำนวนเงิน")).alias("amount_th"),
        _money(g("ภาษี")).alias("vat_th"),
        _money(g("จำนวนเงินสุทธิ")).alias("net_amount_th"),
        "topic",
        _round_date_iso(F.col("start_round_date")).alias("start_round_date"),
        _round_date_iso(F.col("end_round_date")).alias("end_round_date"),
        "supplier_name",
        "supplier_num",
    )


def sale_invoice_db_rows(records: DataFrame) -> DataFrame:
    """Import-side key mapping + cleaning
    (ImportSaleInvoiceReport.php:66-147): Thai keys → DB columns,
    ``cn_ref_doc`` trimmed + ``.0``-stripped with empty→NULL (F29/F24),
    dates validated to Y-m-d, numerics passed through."""
    cn = strings.strip_dot_zero(F.trim(F.col("cn_ref_doc_th")))
    return records.select(
        F.col("doc_no_th").alias("doc_no"),
        F.col("invoice_no_th").alias("invoice_no"),
        dates.parse_date_cascade(
            F.col("invoice_date_th"), formats=("yyyy-M-d",)
        ).alias("invoice_date"),
        F.col("po_no_th").alias("po_no"),
        F.when(cn == "", F.lit(None).cast("string")).otherwise(cn).alias("cn_ref_doc"),
        F.col("assignment_th").alias("assignment"),
        F.col("amount_th").alias("amount"),
        F.col("vat_th").alias("vat"),
        F.col("net_amount_th").alias("net_amount"),
        dates.parse_date_cascade(
            F.col("start_round_date"), formats=("yyyy-M-d",)
        ).alias("start_round_date"),
        dates.parse_date_cascade(
            F.col("end_round_date"), formats=("yyyy-M-d",)
        ).alias("end_round_date"),
        F.col("supplier_name"),
        F.col("supplier_num").alias("supplier_code"),
    )
