"""Date/time cleaning functions (SURVEY.md §2.3 F1-F8).

Reference semantics (cited per function) re-expressed as native Spark
Column expressions. The reference applies these row-at-a-time with
``Series.apply``; here they are codegen'd expressions, so they
vectorize and constant-fold for free.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Buddhist-era thresholds differ across reference call-sites
# (credit-prepare-api/inv_processor.py:5-21 uses >=2400;
#  supplier_processor.py:55-61 uses >2500) — both policies exposed.
BE_THRESHOLD_DEFAULT = 2400
BE_THRESHOLD_STRICT = 2500


def safe_make_date(y: Column, m: Column, d: Column) -> Column:
    """make_date that yields NULL (not an ANSI error) on invalid
    year/month/day combinations — the tolerant behavior every
    reference parser has (failure → None)."""
    s = F.concat_ws("-", y.cast("string"), m.cast("string"), d.cast("string"))
    return F.try_to_timestamp(s, F.lit("y-M-d")).cast("date")


def be_to_ce_year(
    year: Column, threshold: int = BE_THRESHOLD_DEFAULT, inclusive: bool = False
) -> Column:
    """F1: Buddhist→Gregorian year: year > threshold → year - 543.

    The default comparison is STRICT (>), matching
    services/inv_processor.py:9, services/po_old_processor.py:10
    (fix_buddhist_year) and supplier_processor.py:73 (> 2500).
    ``inclusive=True`` gives the >= variant used by
    pdf_ocr_inv_to_json.py:70 and script_read_dbd_balance.py:85
    (2400 <= y <= 2600). Ref also: BolApiController.php:438-451.
    """
    y = year.try_cast("int")  # ANSI-safe: non-numeric input → NULL
    hit = (y >= threshold) if inclusive else (y > threshold)
    return F.when(hit, y - 543).otherwise(y)


def be_date_fix(
    d: Column, threshold: int = BE_THRESHOLD_DEFAULT, inclusive: bool = False
) -> Column:
    """F1 on a DateType column: rebuild the date with the CE year.
    safe_make_date, not make_date: a BE leap-day (29 Feb of a
    proleptic-leap BE year) whose CE year is NOT leap must become
    NULL per the failure→NULL contract, not an ANSI abort."""
    return safe_make_date(
        be_to_ce_year(F.year(d), threshold, inclusive), F.month(d), F.dayofmonth(d)
    )


def excel_serial_to_date(
    n: Column, be_adjust: bool = False, max_serial: int = 60000
) -> Column:
    """F2: Excel serial number → date (origin 1899-12-30 + N days).

    Guard ``0 < n <= max_serial`` (supplier_processor.py:57-61); the
    ``be_adjust`` variant additionally subtracts 543 years from the
    RESULT (supplier_processor.py:91-97). Ref: inv_processor.py:17-19,
    read_rem_detail_to_json.py:53-57.
    """
    # try_cast both hops: a digit string exceeding int32 range (e.g. a
    # 13-digit tax id landing in the serial column) must become NULL,
    # not an ANSI CAST_OVERFLOW abort — the documented failure→NULL
    # contract (reference returns NaT, po_old_processor.py:17-21).
    serial = (n.cast("string")).try_cast("double").try_cast("int")
    d = F.date_add(F.to_date(F.lit("1899-12-30")), serial)
    if be_adjust:
        # a serial decoding to 29 Feb whose BE-shifted year is not
        # leap must yield NULL, not an ANSI make_date abort
        d = safe_make_date(F.year(d) - 543, F.month(d), F.dayofmonth(d))
    return F.when((serial > 0) & (serial <= max_serial), d)


# The cited cascade order in pdf_ocr_inv_to_json.py:81-111 —
# order matters: d/M/y before M/d/y (SURVEY §7.4 watch-list 3).
DATE_FORMATS_DEFAULT = (
    "d/M/yyyy",
    "yyyy-M-d",
    "d-M-yyyy",
    "yyyy/M/d",
    "d.M.yyyy",
    "M/d/yyyy",
)


def try_date(c: Column, fmt: str) -> Column:
    """try_to_date equivalent that never raises under ANSI mode."""
    return F.try_to_timestamp(c, F.lit(fmt)).cast("date")


def parse_date_cascade(
    c: Column, formats: tuple[str, ...] = DATE_FORMATS_DEFAULT
) -> Column:
    """F3: ordered multi-format date parse; first hit wins, else NULL.

    Ref: parse_date_to_iso pdf_ocr_inv_to_json.py:81-111,
    ImportInvoiceReport.php:333-369 (toYmdOrNull).
    """
    s = F.trim(c.cast("string"))
    return F.coalesce(*[try_date(s, f) for f in formats], F.try_to_date(s))


TIMESTAMP_FORMATS_DEFAULT = (
    "yyyy-M-d H:m:s",
    "d/M/yyyy H:m:s",
    "yyyy/M/d H:m:s",
    "d-M-yyyy H:m:s",
    "yyyy-M-d H:m",
    "d/M/yyyy H:m",
)


def parse_timestamp_cascade(
    c: Column, formats: tuple[str, ...] = TIMESTAMP_FORMATS_DEFAULT
) -> Column:
    """F3/F4 datetime twin: ordered strptime cascade → first hit."""
    s = F.trim(c.cast("string"))
    return F.coalesce(
        *[F.try_to_timestamp(s, F.lit(f)) for f in formats],
        F.try_to_timestamp(s),
    )


def strip_bogus_ampm(c: Column) -> Column:
    """F4: drop an AM/PM suffix when the hour field is already 24h
    (hour >= 13 with 'PM' is self-contradictory OCR noise).

    Ref: pdf_ocr_inv_to_json.py:60-64.
    """
    s = c.cast("string")
    hour = (F.regexp_extract(s, r"\b(\d{1,2}):\d{2}", 1)).try_cast("int")
    return F.when(
        hour >= 13, F.trim(F.regexp_replace(s, r"(?i)\s*[AP]\.?M\.?\s*$", ""))
    ).otherwise(s)


def twelve_to_24h(time_str: Column) -> Column:
    """F4: '02:30:05 PM' → '14:30:05'; '12 AM' hour → 0.

    Ref: read_po_csv_to_json.py:132-164.
    """
    s = F.trim(time_str.cast("string"))
    m = F.regexp_extract(s, r"(?i)^(\d{1,2}):(\d{2})(?::(\d{2}))?\s*([AP])\.?M\.?$", 0)
    hh = (F.regexp_extract(s, r"(?i)^(\d{1,2}):", 1)).try_cast("int")
    mm = F.regexp_extract(s, r"(?i)^\d{1,2}:(\d{2})", 1)
    ss = F.regexp_extract(s, r"(?i)^\d{1,2}:\d{2}:(\d{2})", 1)
    ampm = F.upper(F.regexp_extract(s, r"(?i)([AP])\.?M\.?$", 1))
    hh24 = (
        F.when((ampm == "A") & (hh == 12), F.lit(0))
        .when((ampm == "P") & (hh < 12), hh + 12)
        .otherwise(hh)
    )
    out = F.concat_ws(
        ":",
        F.lpad(hh24.cast("string"), 2, "0"),
        mm,
        F.when(ss == "", F.lit("00")).otherwise(ss),
    )
    return F.when(m != "", out).otherwise(s)


def fix_swapped_month_day(ts: Column) -> Column:
    """F5: in 'YYYY-DD-MM[ HH:MM:SS]' strings where month>12 and
    day<=12, swap the two fields. Returns the repaired TIMESTAMP.

    Ref: ImportInvoiceReport.php:371-473, ImportPoReport.php:341-443.
    """
    s = F.trim(ts.cast("string"))
    y = (F.regexp_extract(s, r"^(\d{4})-(\d{1,2})-(\d{1,2})", 1)).try_cast("int")
    mo = (F.regexp_extract(s, r"^(\d{4})-(\d{1,2})-(\d{1,2})", 2)).try_cast("int")
    dd = (F.regexp_extract(s, r"^(\d{4})-(\d{1,2})-(\d{1,2})", 3)).try_cast("int")
    rest = F.regexp_extract(s, r"^\d{4}-\d{1,2}-\d{1,2}(.*)$", 1)
    swapped = F.concat(
        y.cast("string"),
        F.lit("-"),
        F.lpad(dd.cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad(mo.cast("string"), 2, "0"),
        rest,
    )
    fixed = F.when((mo > 12) & (dd <= 12), swapped).otherwise(s)
    return F.coalesce(
        F.try_to_timestamp(fixed, F.lit("yyyy-M-d H:m:s")),
        F.try_to_timestamp(fixed, F.lit("yyyy-M-d")),
        F.try_to_timestamp(fixed),
    )


def was_swapped_month_day(ts: Column) -> Column:
    """F5 companion predicate (for the fixed-count metric, A2)."""
    s = F.trim(ts.cast("string"))
    mo = (F.regexp_extract(s, r"^\d{4}-(\d{1,2})-", 1)).try_cast("int")
    dd = (F.regexp_extract(s, r"^\d{4}-\d{1,2}-(\d{1,2})", 1)).try_cast("int")
    return (mo > 12) & (dd <= 12)


# F6: Thai month names (full + abbreviated) → month number.
# Ref: pdf_ocr_sale_invoice_to_json.py:74-78, dbd_web_scraping.py:244-261.
THAI_MONTHS = {
    "มกราคม": 1, "ม.ค.": 1, "กุมภาพันธ์": 2, "ก.พ.": 2,
    "มีนาคม": 3, "มี.ค.": 3, "เมษายน": 4, "เม.ย.": 4,
    "พฤษภาคม": 5, "พ.ค.": 5, "มิถุนายน": 6, "มิ.ย.": 6,
    "กรกฎาคม": 7, "ก.ค.": 7, "สิงหาคม": 8, "ส.ค.": 8,
    "กันยายน": 9, "ก.ย.": 9, "ตุลาคม": 10, "ต.ค.": 10,
    "พฤศจิกายน": 11, "พ.ย.": 11, "ธันวาคม": 12, "ธ.ค.": 12,
}


def thai_month_num(c: Column) -> Column:
    """F6: Thai month name/abbr → 1-12 (NULL if unknown)."""
    mapping = F.create_map(
        *[F.lit(x) for kv in THAI_MONTHS.items() for x in kv]
    )
    return mapping[F.trim(c.cast("string"))]


def be_dotted_to_iso(c: Column, threshold: int = BE_THRESHOLD_DEFAULT) -> Column:
    """F7: 'DD.MM.YYYY' with a BE year → DATE (BE−543).

    Ref: pdf_ocr_sale_invoice_to_json.py:80-94.
    """
    s = F.trim(c.cast("string"))
    dd = (F.regexp_extract(s, r"^(\d{1,2})\.(\d{1,2})\.(\d{4})$", 1)).try_cast("int")
    mm = (F.regexp_extract(s, r"^(\d{1,2})\.(\d{1,2})\.(\d{4})$", 2)).try_cast("int")
    yy = (F.regexp_extract(s, r"^(\d{1,2})\.(\d{1,2})\.(\d{4})$", 3)).try_cast("int")
    return safe_make_date(be_to_ce_year(yy, threshold), mm, dd)


def dayfirst_normalize(c: Column, threshold: int = BE_THRESHOLD_DEFAULT) -> Column:
    """F8: Thai day-first date normalization — unify separators to '-',
    detect Y-m-d vs d-m-Y, 2-digit year → 2000+, BE−543 when year ≥
    threshold — INCLUSIVE >=, exactly as the cited call site's
    ``if y >= 2400`` (po_old_processor.py:55; pipelines needing the
    strict >2500 policy pass BE_THRESHOLD_STRICT per SURVEY §7.4.2),
    day-first parse with month-first fallback.

    Ref: services/po_old_processor.py:28-69.

    Cost shape: the input expression and the separator-unify replace
    are let-bound (evaluated once per row, not re-inlined into every
    branch), and each branch runs ONE gated regexp_replace that
    rewrites the match to sentinel-joined groups instead of three
    separate regexp_extracts — ~5 regex executions per row total
    where the naive form re-ran the input + 6 extracts.
    """
    from etl_script_spark.functions.exprs import let

    sep = "\x01\x02"
    ymd_rx = r"^(\d{4})-(\d{1,2})-(\d{1,2})$"
    dmy_rx = r"^(\d{1,2})-(\d{1,2})-(\d{2,4})$"
    repl = sep.join(f"${i}" for i in (1, 2, 3))
    fix = lambda y: F.when(y >= threshold, y - 543).otherwise(y)  # noqa: E731

    def body(s: Column) -> Column:
        def parts_of(rx: str) -> Column:
            # NULL array when the line doesn't match — element_at on
            # null propagates null into make_date, same as the old
            # empty-string extract → try_cast(null) path
            return F.when(s.rlike(rx), F.split(F.regexp_replace(s, rx, repl), sep))

        def ymd_body(p: Column) -> Column:
            y = F.element_at(p, 1).try_cast("int")
            m = F.element_at(p, 2).try_cast("int")
            d = F.element_at(p, 3).try_cast("int")
            return safe_make_date(fix(y), m, d)

        def dmy_body(p: Column) -> Column:
            d = F.element_at(p, 1).try_cast("int")
            m = F.element_at(p, 2).try_cast("int")
            y_raw = F.element_at(p, 3).try_cast("int")
            y = fix(F.when(y_raw < 100, y_raw + 2000).otherwise(y_raw))
            # day-first, with month-first fallback when invalid
            return F.coalesce(
                safe_make_date(y, m, d), safe_make_date(y, d, m)
            )

        return F.coalesce(
            let(parts_of(ymd_rx), ymd_body), let(parts_of(dmy_rx), dmy_body)
        )

    return let(F.regexp_replace(F.trim(c.cast("string")), r"[./]", "-"), body)
