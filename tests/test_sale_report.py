"""Sale-report pipeline (S7/S8): HTML table parse, cell repair,
metadata extraction, ragged-row padding, DB key mapping."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_script_spark.pipelines import sale_report

HTML = """
<html>
<p>รายงานการขายสินค้า - แยกตาม Invoice</p>
<p>รอบวันที่ 1 - 15 มีนาคม 2568</p>
<p>#Vendor 4042 / ACME SUPPLY (1)</p>
<table>
<tr><th>ลำดับที่</th><th>เลขที่เอกสาร</th><th>จำนวนเงิน</th></tr>
<tr><td>1</td><td>DOC1</td><td>1,000.50</td></tr>
<tr><td>2</td><td>Subtotal 99</td></tr>
<tr><td></td><td>dropped-no-seq</td><td>5</td></tr>
<tr><td>Grand Total</td><td></td><td>1,077.50</td></tr>
</table>
</html>
"""


def _docs(spark):
    return spark.createDataFrame([(1, HTML)], ["doc_key", "html"])


def test_parse_html_tables_cells(spark):
    rows = sale_report.parse_html_tables(_docs(spark), "html", ["doc_key"]).collect()
    assert [r["cells"] for r in rows if r["row_index"] == 0] == [
        ["ลำดับที่", "เลขที่เอกสาร", "จำนวนเงิน"]
    ]
    assert len(rows) == 5  # header + 4 body rows (filters come later)


def test_records_filters_and_cell_repair(spark):
    recs = sale_report.html_table_records(
        _docs(spark), "html", ["doc_key"]
    ).collect()
    by_seq = {r["fields"]["ลำดับที่"]: r["fields"] for r in recs}
    # \btotal\b row and empty-seq row dropped; 'Subtotal' row survives
    # is_total_line (no word boundary) exactly like the reference
    assert set(by_seq) == {"1", "2"}
    assert by_seq["1"]["จำนวนเงิน"] == "1,000.50"
    # 'Subtotal 99' hits clean_cell's substring-total branch → first
    # number; the ragged row is padded to header width
    assert by_seq["2"]["เลขที่เอกสาร"] == "99"
    assert by_seq["2"]["จำนวนเงิน"] == ""


def test_metadata_and_db_rows(spark):
    recs = sale_report.sale_invoice_records(_docs(spark), "html", ["doc_key"])
    out = {r["seq_no"]: r for r in recs.collect()}
    assert out["1"]["topic"] == "รายงานการขายสินค้า - แยกตาม Invoice"
    assert out["1"]["start_round_date"] == "2025-03-01"
    assert out["1"]["end_round_date"] == "2025-03-15"
    assert out["1"]["supplier_name"] == "ACME SUPPLY"
    assert out["1"]["supplier_num"] == "4042"
    assert out["1"]["amount_th"] == 1000.5
    db = sale_report.sale_invoice_db_rows(recs).collect()
    d1 = [r for r in db if r["doc_no"] == "DOC1"][0]
    assert d1["amount"] == 1000.5 and d1["supplier_code"] == "4042"
    assert str(d1["start_round_date"]) == "2025-03-01"


def test_duplicate_header_names_suffixed(spark):
    """An OCR table repeating a column heading must parse (suffix the
    later duplicates) instead of dying on DUPLICATE_MAP_KEY."""
    from etl_script_spark.pipelines.sale_report import html_table_records

    doc = spark.createDataFrame(
        [(1, "<table><tr><th>amt</th><th>amt</th></tr>"
             "<tr><td>1</td><td>2</td></tr></table>")],
        "doc_id long, html string",
    )
    r = html_table_records(doc, "html", ["doc_id"]).collect()
    assert r[0]["fields"] == {"amt": "1", "amt_2": "2"}
