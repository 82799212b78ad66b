"""Golden unit tests for the scalar function library (SURVEY.md §5.2
item 1) — input/expected pairs derived from the reference's cited
semantics.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_script_spark.functions import dates, numerics, strings


def _eval(spark, col, rows, in_type="string"):
    """Evaluate a Column expression against literal rows."""
    df = spark.createDataFrame([(r,) for r in rows], f"v {in_type}")
    return [r[0] for r in df.select(col(F.col("v")).alias("out")).collect()]


# ---------------- dates ----------------

def test_be_to_ce_year(spark):
    # strict > threshold (inv_processor.py:9): exactly 2400 stays put
    out = _eval(spark, dates.be_to_ce_year, ["2568", "1997", "2399", "2400", "2401"])
    assert out == [2025, 1997, 2399, 2400, 1858]
    # inclusive >= variant (pdf_ocr_inv_to_json.py:70)
    out = _eval(
        spark,
        lambda c: dates.be_to_ce_year(c, inclusive=True),
        ["2400", "2399"],
    )
    assert out == [1857, 2399]
    # ANSI overflow guard: a 13-digit id in the year column → NULL
    out = _eval(spark, dates.be_to_ce_year, ["1234567890123"])
    assert out == [None]


def test_excel_serial_to_date(spark):
    # 13-digit id reaching the serial column: NULL, not CAST_OVERFLOW
    out = _eval(
        spark, dates.excel_serial_to_date, ["45000", "0", "60001", "1234567890123"]
    )
    assert out == [dt.date(2023, 3, 15), None, None, None]
    out = _eval(
        spark,
        lambda c: dates.excel_serial_to_date(c, be_adjust=True),
        ["45000"],
    )
    assert out == [dt.date(2023 - 543, 3, 15)]


def test_parse_date_cascade(spark):
    out = _eval(
        spark,
        dates.parse_date_cascade,
        ["12/05/1997", "1997-05-12", "5.3.2020", "garbage", None],
    )
    assert out == [
        dt.date(1997, 5, 12),
        dt.date(1997, 5, 12),
        dt.date(2020, 3, 5),
        None,
        None,
    ]


def test_strip_bogus_ampm(spark):
    out = _eval(spark, dates.strip_bogus_ampm, ["2024-01-01 14:30 PM", "2024-01-01 09:30 AM"])
    assert out == ["2024-01-01 14:30", "2024-01-01 09:30 AM"]


def test_twelve_to_24h(spark):
    out = _eval(spark, dates.twelve_to_24h, ["02:30:05 PM", "12:01 AM", "12:10 PM", "23:59:59"])
    assert out == ["14:30:05", "00:01:00", "12:10:00", "23:59:59"]


def test_fix_swapped_month_day(spark):
    # golden case from SURVEY §5.2: 2025-26-03 → 2025-03-26
    out = _eval(spark, dates.fix_swapped_month_day, ["2025-26-03 14:00:00", "2025-03-26 14:00:00"])
    assert out == [dt.datetime(2025, 3, 26, 14, 0), dt.datetime(2025, 3, 26, 14, 0)]


def test_thai_month_num(spark):
    out = _eval(spark, dates.thai_month_num, ["มกราคม", "ธ.ค.", "xx"])
    assert out == [1, 12, None]


def test_be_dotted_to_iso(spark):
    out = _eval(spark, dates.be_dotted_to_iso, ["15.03.2566", "15.03.1999"])
    assert out == [dt.date(2023, 3, 15), dt.date(1999, 3, 15)]


def test_dayfirst_normalize(spark):
    out = _eval(
        spark,
        dates.dayfirst_normalize,
        ["15/03/2566", "2566-03-15", "15-03-23", "03/15/2023"],
    )
    assert out == [
        dt.date(2023, 3, 15),
        dt.date(2023, 3, 15),
        dt.date(2023, 3, 15),
        dt.date(2023, 3, 15),  # day-first invalid (month 15) → month-first fallback
    ]


# ---------------- numerics ----------------

def test_clean_numeric_basic(spark):
    out = _eval(spark, numerics.clean_numeric_basic, ["1,234.5", "-", "–", "", "abc", None, " 7 "])
    assert out == [1234.5, 0.0, 0.0, 0.0, 0.0, 0.0, 7.0]


def test_clean_numeric_accounting(spark):
    out = _eval(
        spark, numerics.clean_numeric_accounting, ["(123.45)", "−12", "1 171.37", "1,234", "-"]
    )
    assert out == [-123.45, -12.0, 1171.37, 1234.0, None]


def test_clean_numeric_percent(spark):
    out = _eval(spark, numerics.clean_numeric_percent, ["12.3%", "-", "5"])
    assert out == [12.3, 0.0, 5.0]


def test_clean_numeric_locale(spark):
    # golden: SURVEY §5.2 — '1.357.000,50' → 1357000.5
    out = _eval(
        spark,
        numerics.clean_numeric_locale,
        ["1.357.000,50", "1,234.56", "1.234", "12,5", "1234.56", "7", "0.5"],
    )
    assert out == [1357000.5, 1234.56, 1234.0, 12.5, 1234.56, 7.0, 0.5]


def test_repair_multi_dot(spark):
    out = _eval(spark, numerics.repair_multi_dot, ["1.234.56", "1234.56", "1.2.3.45"])
    assert out == ["1234.56", "1234.56", "123.45"]


def test_zero_if_null_and_derived(spark):
    assert _eval(spark, numerics.zero_if_null, [None, "5"]) == [0.0, 5.0]


def test_round_policy(spark):
    assert _eval(spark, numerics.round_money, ["1.005", "2.344"]) == [1.01, 2.34]
    assert _eval(spark, numerics.round_qty, ["1.0005"]) == [1.001]


# ---------------- strings ----------------

def test_norm_ws(spark):
    out = _eval(spark, strings.norm_ws, ["  a \t b  ", "x​y（1）"])
    assert out == ["a b", "xy(1)"]


def test_ocr_repair_tail_digits(spark):
    out = _eval(spark, strings.ocr_repair_tail_digits, ["inv00l2O", "INV1234", "12345"])
    assert out == ["INV00120", "INV1234", "12345"]


def test_extract_digit_run(spark):
    out = _eval(spark, strings.extract_digit_run, ["PO:1013090869", "no digits", "PO 12345678/x"])
    assert out == ["1013090869", None, "12345678"]


def test_normalize_tax_id(spark):
    out = _eval(spark, strings.normalize_tax_id, ["1-2345-67890-12-3", "99", "x12345678901234y"])
    assert out == ["1234567890123", "0000000000099", "2345678901234"]


def test_split_person_name(spark):
    rows = _eval(spark, strings.split_person_name, ["นางสาว สมหญิง ใจดี", "Mr. John Smith", "Alice"])
    assert rows[0].asDict() == {"prefix": "นางสาว", "first_name": "สมหญิง", "last_name": "ใจดี"}
    assert rows[1].asDict() == {"prefix": "Mr.", "first_name": "John", "last_name": "Smith"}
    assert rows[2].asDict() == {"prefix": None, "first_name": "Alice", "last_name": ""}


def test_parse_range(spark):
    rows = _eval(spark, strings.parse_range, ["1.5 - 2.5", "7"])
    assert rows[0].asDict() == {"start": 1.5, "end": 2.5}
    assert rows[1].asDict() == {"start": 7.0, "end": None}


def test_null_if_empty(spark):
    out = _eval(spark, strings.null_if_empty, ["", "?", "-", "N/A", "ok"])
    assert out == [None, None, None, None, "ok"]


def test_strip_dot_zero(spark):
    assert _eval(spark, strings.strip_dot_zero, ["1234.0", "1234.5"]) == ["1234", "1234.5"]


def test_filename_extract(spark):
    out = _eval(
        spark,
        lambda c: strings.filename_extract(c, r"(\d{13})_income\.(xlsx?|xls)$"),
        ["/data/1234567890123_income.xlsx", "/data/other.xlsx"],
    )
    assert out == ["1234567890123", None]


def test_be_leap_day_null_not_abort(spark):
    """A BE date whose CE-shifted year is not leap must become NULL
    (failure→NULL contract), never an ANSI make_date abort — both for
    parsed BE dates and BE-adjusted Excel serials."""
    from pyspark.sql import functions as F

    from etl_script_spark.functions import dates

    df = spark.createDataFrame([("29/02/2568",), ("01/03/2568",)], ["s"])
    got = df.select(
        dates.be_date_fix(dates.parse_date_cascade(F.col("s"))).alias("d")
    ).collect()
    assert [str(r["d"]) for r in got] == ["None", "2025-03-01"]

    # serial 45351 = 2024-02-29; BE shift -> year 1481, not leap
    e = spark.createDataFrame([(45351,)], ["n"]).select(
        dates.excel_serial_to_date(F.col("n"), be_adjust=True).alias("d")
    ).collect()
    assert e[0]["d"] is None
