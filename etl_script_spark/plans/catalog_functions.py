"""Declared queries exercising the scalar function library (SURVEY.md
§2.3 F1-F30) against the driver's synthetic tables.

Pattern: build a deterministic "dirty" input string FROM table values
(integer-derived, so both engines construct byte-identical strings),
clean it with the library on the Spark side, and have the DuckDB
oracle state the expected result directly — a round-trip proof of the
cited reference semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_script_spark.functions import dates, numerics, strings
from etl_script_spark.operators.partitioning import fan_out
from etl_script_spark.plans.catalog import register, t


@register(
    "f1_buddhist_year",
    """
    SELECT o_orderkey, CAST(YEAR(o_orderdate) AS INTEGER) AS ce_year
    FROM orders
    """,
    ("F1",),
)
def f1_buddhist_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    be = (F.year("o_orderdate") + 543).cast("string")  # dirty BE input
    return o.select("o_orderkey", dates.be_to_ce_year(be).alias("ce_year"))


@register(
    "f2_excel_serial",
    """
    SELECT o_orderkey, o_orderdate AS parsed
    FROM orders
    """,
    ("F2",),
)
def f2_excel_serial(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    serial = F.datediff(
        F.col("o_orderdate").cast("date"), F.to_date(F.lit("1899-12-30"))
    )
    return o.select(
        "o_orderkey", dates.excel_serial_to_date(serial).cast("timestamp_ntz").alias("parsed")
    )


@register(
    "f3_date_cascade",
    """
    SELECT o_orderkey, o_orderdate AS parsed
    FROM orders
    """,
    ("F3",),
)
def f3_date_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three formats round-robin by key; the ordered cascade must
    recover every one."""
    o = t(spark, sf_dir, "orders")
    k = F.col("o_orderkey") % 3
    dirty = (
        F.when(k == 0, F.date_format("o_orderdate", "dd/MM/yyyy"))
        .when(k == 1, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .otherwise(F.date_format("o_orderdate", "dd.MM.yyyy"))
    )
    return o.select("o_orderkey", dates.parse_date_cascade(dirty).cast("timestamp_ntz").alias("parsed"))


@register(
    "f4_twelve_to_24h",
    """
    SELECT event_id, strftime(ts, '%H:%M:%S') AS time24
    FROM events
    """,
    ("F4",),
)
def f4_twelve_to_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    h = F.hour("ts")
    h12 = F.when(h % 12 == 0, F.lit(12)).otherwise(h % 12)
    ampm = F.when(h < 12, F.lit("AM")).otherwise(F.lit("PM"))
    dirty = F.concat(
        F.lpad(h12.cast("string"), 2, "0"),
        F.lit(":"),
        F.date_format("ts", "mm:ss"),
        F.lit(" "),
        ampm,
    )
    return e.select("event_id", dates.twelve_to_24h(dirty).alias("time24"))


@register(
    "f5_swapped_month_day",
    """
    SELECT o_orderkey, o_orderdate AS fixed_ts
    FROM orders
    """,
    ("F5",),
)
def f5_swapped_month_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Swap day/month in the string whenever day<=12 would make the
    swapped form detectable (month>12) — the fixer must restore the
    original timestamp for every row."""
    o = t(spark, sf_dir, "orders")
    d = F.dayofmonth("o_orderdate")
    swapped = F.concat(
        F.date_format("o_orderdate", "yyyy"),
        F.lit("-"),
        F.date_format("o_orderdate", "dd"),
        F.lit("-"),
        F.date_format("o_orderdate", "MM"),
        F.lit(" 00:00:00"),
    )
    normal = F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
    # rows where day <= 12 are ambiguous (swap undetectable) — emit
    # them unswapped so the expected output is always o_orderdate
    dirty = F.when(d > 12, swapped).otherwise(normal)
    return o.select(
        "o_orderkey",
        dates.fix_swapped_month_day(dirty).cast("timestamp_ntz").alias("fixed_ts"),
    )


@register(
    "f6_thai_month",
    """
    SELECT event_id, CAST(MONTH(ts) AS INTEGER) AS month_num FROM events
    """,
    ("F6",),
)
def f6_thai_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    names = {m: n for n, m in dates.THAI_MONTHS.items() if not n.endswith(".")}
    rev = F.create_map(*[F.lit(x) for m in sorted(names) for x in (m, names[m])])
    thai_name = rev[F.month("ts")]
    return e.select(
        "event_id", dates.thai_month_num(thai_name).cast("int").alias("month_num")
    )


@register(
    "f7_be_dotted",
    """
    SELECT o_orderkey, o_orderdate AS parsed FROM orders
    """,
    ("F7",),
)
def f7_be_dotted(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    dirty = F.concat(
        F.date_format("o_orderdate", "dd.MM."),
        (F.year("o_orderdate") + 543).cast("string"),
    )
    return o.select("o_orderkey", dates.be_dotted_to_iso(dirty).cast("timestamp_ntz").alias("parsed"))


@register(
    "f8_dayfirst",
    """
    SELECT o_orderkey, o_orderdate AS parsed FROM orders
    """,
    ("F8",),
)
def f8_dayfirst(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the parse cascade is the cost here, and a small parquet scan
    # arrives on one partition — spread it (see partitioning.fan_out)
    o = fan_out(t(spark, sf_dir, "orders"))
    k = F.col("o_orderkey") % 3
    be_year = (F.year("o_orderdate") + 543).cast("string")
    dirty = (
        F.when(k == 0, F.concat(F.date_format("o_orderdate", "dd/MM/"), be_year))
        .when(k == 1, F.concat(be_year, F.date_format("o_orderdate", "-MM-dd")))
        .otherwise(F.concat(F.date_format("o_orderdate", "dd-MM-"), be_year))
    )
    return o.select("o_orderkey", dates.dayfirst_normalize(dirty).cast("timestamp_ntz").alias("parsed"))


@register(
    "f9_numeric_basic",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 5 = 0 THEN 0.0
                WHEN o_orderkey % 5 = 1 THEN 0.0
                ELSE CAST(FLOOR((o_orderkey + 1000000) / 1000) * 1000
                          + (o_orderkey + 1000000) % 1000 AS DOUBLE)
                     + CAST(o_orderkey % 100 AS DOUBLE) / 100
           END AS amount
    FROM orders
    """,
    ("F9",),
)
def f9_numeric_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'1,234.56'-style strings (integer-derived), dashes and blanks →
    0 per the cited zero-policy."""
    o = t(spark, sf_dir, "orders")
    v = F.col("o_orderkey") + 1000000
    thousands = F.floor(v / 1000).cast("long")
    rem = (v % 1000).cast("long")
    cents = (F.col("o_orderkey") % 100).cast("long")
    numeric_str = F.concat(
        thousands.cast("string"),
        F.lit(","),
        F.lpad(rem.cast("string"), 3, "0"),
        F.lit("."),
        F.lpad(cents.cast("string"), 2, "0"),
    )
    k = F.col("o_orderkey") % 5
    dirty = (
        F.when(k == 0, F.lit("-")).when(k == 1, F.lit("")).otherwise(numeric_str)
    )
    return o.select(
        "o_orderkey", numerics.clean_numeric_basic(dirty).alias("amount")
    )


@register(
    "f10_numeric_accounting",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 2 = 0
                THEN -(CAST(o_orderkey % 100000 AS DOUBLE)
                       + CAST(o_orderkey % 100 AS DOUBLE) / 100)
                ELSE  (CAST(o_orderkey % 100000 AS DOUBLE)
                       + CAST(o_orderkey % 100 AS DOUBLE) / 100)
           END AS amount
    FROM orders
    """,
    ("F10",),
)
def f10_numeric_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    body = F.concat(
        (F.col("o_orderkey") % 100000).cast("string"),
        F.lit("."),
        F.lpad((F.col("o_orderkey") % 100).cast("string"), 2, "0"),
    )
    dirty = F.when(
        F.col("o_orderkey") % 2 == 0, F.concat(F.lit("("), body, F.lit(")"))
    ).otherwise(body)
    return o.select(
        "o_orderkey", numerics.clean_numeric_accounting(dirty).alias("amount")
    )


@register(
    "f11_numeric_percent",
    """
    SELECT o_orderkey,
           CAST(o_orderkey % 100 AS DOUBLE) + CAST(o_orderkey % 10 AS DOUBLE) / 10
               AS pct
    FROM orders
    """,
    ("F11",),
)
def f11_numeric_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    dirty = F.concat(
        (F.col("o_orderkey") % 100).cast("string"),
        F.lit("."),
        (F.col("o_orderkey") % 10).cast("string"),
        F.lit("%"),
    )
    return o.select("o_orderkey", numerics.clean_numeric_percent(dirty).alias("pct"))


@register(
    "f12_numeric_locale",
    """
    SELECT o_orderkey,
           CAST(FLOOR((o_orderkey + 1000000) / 1000000) * 1000000
                + (FLOOR((o_orderkey + 1000000) / 1000) % 1000) * 1000
                + (o_orderkey + 1000000) % 1000 AS DOUBLE)
               + CAST(o_orderkey % 100 AS DOUBLE) / 100 AS amount
    FROM orders
    """,
    ("F12",),
)
def f12_numeric_locale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """European '1.357.000,50' shape — dots thousands, comma decimal."""
    o = t(spark, sf_dir, "orders")
    v = F.col("o_orderkey") + 1000000
    millions = F.floor(v / 1000000).cast("long")
    thousands = (F.floor(v / 1000) % 1000).cast("long")
    units = (v % 1000).cast("long")
    cents = (F.col("o_orderkey") % 100).cast("long")
    dirty = F.concat(
        millions.cast("string"),
        F.lit("."),
        F.lpad(thousands.cast("string"), 3, "0"),
        F.lit("."),
        F.lpad(units.cast("string"), 3, "0"),
        F.lit(","),
        F.lpad(cents.cast("string"), 2, "0"),
    )
    return o.select(
        "o_orderkey", numerics.clean_numeric_locale(dirty).alias("amount")
    )


@register(
    "f13_multi_dot",
    """
    SELECT o_orderkey,
           CAST(((o_orderkey + 10000) // 100) // 1000 AS VARCHAR)
           || lpad(CAST(((o_orderkey + 10000) // 100) % 1000 AS VARCHAR), 3, '0')
           || '.' || lpad(CAST((o_orderkey + 10000) % 100 AS VARCHAR), 2, '0')
               AS repaired
    FROM orders
    """,
    ("F13",),
)
def f13_multi_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'1.234.56' → '1234.56' (last dot is the decimal point)."""
    o = t(spark, sf_dir, "orders")
    v = F.col("o_orderkey") + 10000
    intpart = F.floor(v / 100).cast("long")  # >= 100, so >= 3 digits
    cents = (v % 100).cast("long")
    head = F.floor(intpart / 1000).cast("long")
    tail = (intpart % 1000).cast("long")
    dirty = F.concat(
        head.cast("string"),
        F.lit("."),
        F.lpad(tail.cast("string"), 3, "0"),
        F.lit("."),
        F.lpad(cents.cast("string"), 2, "0"),
    )
    # expected repaired string = intpart '.' cents
    return o.select(
        "o_orderkey", numerics.repair_multi_dot(dirty).alias("repaired")
    )


@register(
    "f15_zero_coercion",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber % 3 = 0 THEN 0.0 ELSE l_quantity END AS qty
    FROM lineitem
    """,
    ("F15",),
)
def f15_zero_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    with_nulls = F.when(F.col("l_linenumber") % 3 == 0, F.lit(None)).otherwise(
        F.col("l_quantity")
    )
    return l.select(
        "l_orderkey", "l_linenumber", numerics.zero_if_null(with_nulls).alias("qty")
    )


@register(
    "f16_norm_ws",
    """
    SELECT c_custkey,
           trim(regexp_replace(' ' || c_name || '   ' || c_mktsegment || '  ',
                               '\\s+', ' ', 'g')) AS cleaned
    FROM customer
    """,
    ("F16",),
)
def f16_norm_ws(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    dirty = F.concat(
        F.lit(" "), F.col("c_name"), F.lit("   "), F.col("c_mktsegment"), F.lit("  ")
    )
    return c.select("c_custkey", strings.norm_ws(dirty).alias("cleaned"))


@register(
    "f18_ocr_tail_repair",
    """
    SELECT o_orderkey, 'INV9' || lpad(CAST(o_orderkey AS VARCHAR), 7, '0') AS invoice_no
    FROM orders
    """,
    ("F18", "F19"),
)
def f18_ocr_tail_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt the digit tail with lookalikes (0→o, 1→l), repair back."""
    o = t(spark, sf_dir, "orders")
    clean_no = F.lpad(F.col("o_orderkey").cast("string"), 7, "0")
    dirty = F.concat(F.lit("inv9"), F.translate(clean_no, "01", "ol"))
    return o.select(
        "o_orderkey", strings.ocr_repair_tail_digits(dirty).alias("invoice_no")
    )


@register(
    "f20_digit_run",
    """
    SELECT o_orderkey, lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS po_no
    FROM orders
    """,
    ("F20",),
)
def f20_digit_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    dirty = F.concat(
        F.lit("PO:"),
        F.lpad(F.col("o_orderkey").cast("string"), 10, "0"),
        F.lit("/ref-7"),
    )
    return o.select("o_orderkey", strings.extract_digit_run(dirty).alias("po_no"))


@register(
    "f21_tax_id",
    """
    SELECT c_custkey, lpad(CAST(c_custkey AS VARCHAR), 13, '0') AS tax_id
    FROM customer
    """,
    ("F21",),
)
def f21_tax_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    dirty = F.concat(
        F.lit("TH-"), F.lpad(F.col("c_custkey").cast("string"), 10, "0"), F.lit(" ")
    )
    return c.select("c_custkey", strings.normalize_tax_id(dirty).alias("tax_id"))


@register(
    "f22_name_split",
    """
    SELECT c_custkey,
           CASE WHEN c_custkey % 4 = 0 THEN 'นางสาว'
                WHEN c_custkey % 4 = 1 THEN 'นาย'
                WHEN c_custkey % 4 = 2 THEN 'Mr.'
                ELSE NULL END AS prefix,
           c_name AS first_name,
           c_mktsegment AS last_name
    FROM customer
    """,
    ("F22",),
)
def f22_name_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    k = F.col("c_custkey") % 4
    prefix = (
        F.when(k == 0, F.lit("นางสาว "))
        .when(k == 1, F.lit("นาย "))
        .when(k == 2, F.lit("Mr. "))
        .otherwise(F.lit(""))
    )
    full = F.concat(prefix, F.col("c_name"), F.lit(" "), F.col("c_mktsegment"))
    parts = strings.split_person_name(full)
    return c.select(
        "c_custkey",
        parts["prefix"].alias("prefix"),
        parts["first_name"].alias("first_name"),
        parts["last_name"].alias("last_name"),
    )


@register(
    "f23_range_parse",
    """
    SELECT s_suppkey,
           CAST(s_suppkey % 50 AS DOUBLE) AS range_start,
           CASE WHEN s_suppkey % 3 = 0 THEN NULL
                ELSE CAST(s_suppkey % 50 + 10 AS DOUBLE) END AS range_end
    FROM supplier
    """,
    ("F23",),
)
def f23_range_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier")
    a = (F.col("s_suppkey") % 50).cast("string")
    b = ((F.col("s_suppkey") % 50) + 10).cast("string")
    dirty = F.when(F.col("s_suppkey") % 3 == 0, a).otherwise(
        F.concat(a, F.lit(" - "), b)
    )
    parsed = strings.parse_range(dirty)
    return s.select(
        "s_suppkey",
        parsed["start"].alias("range_start"),
        parsed["end"].alias("range_end"),
    )


@register(
    "f24_null_if_empty",
    """
    SELECT c_custkey,
           CASE WHEN c_custkey % 4 = 0 THEN NULL
                WHEN c_custkey % 4 = 1 THEN NULL
                WHEN c_custkey % 4 = 2 THEN NULL
                ELSE c_name END AS value
    FROM customer
    """,
    ("F24",),
)
def f24_null_if_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    k = F.col("c_custkey") % 4
    dirty = (
        F.when(k == 0, F.lit(""))
        .when(k == 1, F.lit("?"))
        .when(k == 2, F.lit("n/a"))
        .otherwise(F.col("c_name"))
    )
    return c.select("c_custkey", strings.null_if_empty(dirty).alias("value"))


@register(
    "f25_derived_measure",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber % 2 = 0
                THEN l_extendedprice * 1.07 - l_extendedprice * 0.07
                ELSE l_extendedprice END AS amount_excl_vat
    FROM lineitem
    """,
    ("F25",),
)
def f25_derived_measure(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    excl = F.when(F.col("l_linenumber") % 2 == 0, F.lit(0.0)).otherwise(
        F.col("l_extendedprice")
    )
    incl = F.col("l_extendedprice") * 1.07
    vat = F.col("l_extendedprice") * 0.07
    return l.select(
        "l_orderkey",
        "l_linenumber",
        numerics.derived_excl_vat(excl, incl, vat).alias("amount_excl_vat"),
    )


@register(
    "f26_filename_keys",
    """
    SELECT doc_id, lpad(CAST(doc_id AS VARCHAR), 13, '0') AS tax_id
    FROM documents
    """,
    ("F26",),
)
def f26_filename_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    fname = F.concat(
        F.lit("/data/"),
        F.lpad(F.col("doc_id").cast("string"), 13, "0"),
        F.lit("_income.xlsx"),
    )
    return d.select(
        "doc_id",
        strings.filename_extract(fname, r"(\d{13})_income\.(xlsx?|xls)$").alias(
            "tax_id"
        ),
    )


@register(
    "f29_strip_dot_zero",
    """
    SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS code FROM orders
    """,
    ("F29",),
)
def f29_strip_dot_zero(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    dirty = F.concat(F.col("o_orderkey").cast("string"), F.lit(".0"))
    return o.select("o_orderkey", strings.strip_dot_zero(dirty).alias("code"))


@register(
    "f30_header_field",
    """
    SELECT o_orderkey, strftime(o_orderdate, '%d/%m/%Y') AS pay_date
    FROM orders
    """,
    ("F30",),
)
def f30_header_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    page_text = F.concat(
        F.lit("รายงานการจ่ายเงิน\nวันที่จ่ายเงิน : "),
        F.date_format("o_orderdate", "dd/MM/yyyy"),
        F.lit("\nรหัสผู้ขาย : 12345"),
    )
    return o.select(
        "o_orderkey",
        strings.header_field_extract(
            page_text, r"วันที่จ่ายเงิน\s*:\s*(\S+)"
        ).alias("pay_date"),
    )


@register(
    "f19_token_repairs",
    r"""
    WITH base AS (
      SELECT o_orderkey,
        CASE o_orderkey % 6
          WHEN 0 THEN '1V' || CAST(o_orderkey AS VARCHAR)
          WHEN 1 THEN 'C0NS1GN-' || lpad(CAST(o_orderkey % 100 AS VARCHAR), 2, '0')
          WHEN 2 THEN 'cons1gn'
          WHEN 3 THEN 'IO-' || CAST(o_orderkey AS VARCHAR)
          WHEN 4 THEN 'เน?NV' || CAST(o_orderkey AS VARCHAR)
          ELSE 'CROSS' END AS doc_raw,
        CASE o_orderkey % 6
          WHEN 0 THEN '1V' || CAST(o_orderkey AS VARCHAR)
          WHEN 1 THEN ''
          WHEN 2 THEN 'R-' || CAST(o_orderkey AS VARCHAR)
          WHEN 3 THEN NULL
          WHEN 4 THEN 'NV' || CAST(o_orderkey AS VARCHAR)
          ELSE 'DOCK' END AS ref_raw,
        CASE o_orderkey % 5
          WHEN 0 THEN 'F C 1' WHEN 1 THEN 'W 9 0 1' WHEN 2 THEN 'x0000y'
          WHEN 3 THEN 'FC12' ELSE 'o0 02' END AS branch_raw
      FROM orders
    ),
    toks AS (
      SELECT o_orderkey, branch_raw,
        regexp_extract_all(doc_raw, '(?i)[A-Za-z0-9]{2,}-?[A-Za-z0-9]{2,}|[A-Za-z]{1,3}\s*-?\s*\d{4,}', 0) AS dc,
        regexp_extract_all(doc_raw, '[A-Za-z0-9\-]{5,}', 0) AS dfb,
        regexp_extract_all(ref_raw, '(?i)[A-Za-z0-9]{2,}-?[A-Za-z0-9]{2,}|[A-Za-z]{1,3}\s*-?\s*\d{4,}', 0) AS rc,
        regexp_extract_all(ref_raw, '[A-Za-z0-9\-]{5,}', 0) AS rfb
      FROM base
    ),
    best AS (
      SELECT o_orderkey, branch_raw,
        CASE WHEN len(dc) > 0 THEN list_reduce(dc, (a, x) -> CASE WHEN len(x) > len(a) THEN x ELSE a END)
             WHEN len(dfb) > 0 THEN list_reduce(dfb, (a, x) -> CASE WHEN len(x) > len(a) THEN x ELSE a END)
             ELSE NULL END AS bd,
        CASE WHEN len(rc) > 0 THEN list_reduce(rc, (a, x) -> CASE WHEN len(x) > len(a) THEN x ELSE a END)
             WHEN len(rfb) > 0 THEN list_reduce(rfb, (a, x) -> CASE WHEN len(x) > len(a) THEN x ELSE a END)
             ELSE NULL END AS br
      FROM toks
    ),
    norm AS (
      SELECT o_orderkey, branch_raw,
        CASE WHEN bd IS NULL OR bd = '' THEN NULL ELSE
          CASE WHEN regexp_matches(regexp_replace(bd, '\s+', '', 'g'), '(?i)^C[O0]NS[1I]GN(-?\d\d)?$')
               THEN CASE WHEN regexp_extract(regexp_replace(bd, '\s+', '', 'g'), '(\d\d)$', 1) <> ''
                         THEN 'CONSIGN-' || regexp_extract(regexp_replace(bd, '\s+', '', 'g'), '(\d\d)$', 1)
                         ELSE 'CONSIGN' END
               ELSE CASE WHEN upper(translate(regexp_replace(bd, '\s+', '', 'g'), 'OI', '01')) LIKE '1V%'
                         THEN 'I' || substring(translate(regexp_replace(bd, '\s+', '', 'g'), 'OI', '01'), 2)
                         ELSE translate(regexp_replace(bd, '\s+', '', 'g'), 'OI', '01') END
          END END AS nd,
        CASE WHEN br IS NULL OR br = '' THEN NULL ELSE
          CASE WHEN regexp_matches(regexp_replace(br, '\s+', '', 'g'), '(?i)^C[O0]NS[1I]GN(-?\d\d)?$')
               THEN CASE WHEN regexp_extract(regexp_replace(br, '\s+', '', 'g'), '(\d\d)$', 1) <> ''
                         THEN 'CONSIGN-' || regexp_extract(regexp_replace(br, '\s+', '', 'g'), '(\d\d)$', 1)
                         ELSE 'CONSIGN' END
               ELSE CASE WHEN upper(translate(regexp_replace(br, '\s+', '', 'g'), 'OI', '01')) LIKE '1V%'
                         THEN 'I' || substring(translate(regexp_replace(br, '\s+', '', 'g'), 'OI', '01'), 2)
                         ELSE translate(regexp_replace(br, '\s+', '', 'g'), 'OI', '01') END
          END END AS nr
      FROM best
    ),
    reffix AS (
      SELECT o_orderkey, branch_raw, nd,
        CASE WHEN nr IS NULL OR nr = '' THEN nd
             WHEN nd IS NULL OR nd = '' THEN nr
             WHEN (len(nd) >= 6 AND len(nr) >= 6 AND substring(nd, 1, 6) = substring(nr, 1, 6))
               OR (len(nr) >= 6 AND starts_with(nd, nr)) THEN nd
             ELSE nr END AS nr2
      FROM norm
    ),
    cd AS (
      SELECT o_orderkey, branch_raw, nd, nr2,
        upper(regexp_replace(coalesce(nd, ''), '\s+', '', 'g')) AS dz,
        upper(regexp_replace(coalesce(nr2, ''), '\s+', '', 'g')) AS rz
      FROM reffix
    ),
    pairfix AS (
      SELECT o_orderkey, branch_raw,
        CASE WHEN dz IN ('CROSSDOCK', 'CROSS-DOCK') OR rz IN ('CROSSDOCK', 'CROSS-DOCK')
               OR (dz = 'CROSS' AND rz = 'DOCK') OR (dz = 'DOCK' AND rz = 'CROSS')
               OR (dz IN ('CROSS', 'DOCK') AND rz = '')
               OR (rz IN ('CROSS', 'DOCK') AND dz = '')
             THEN 'CROSS DOCK' ELSE trim(coalesce(nd, '')) END AS doc_no,
        CASE WHEN dz IN ('CROSSDOCK', 'CROSS-DOCK') OR rz IN ('CROSSDOCK', 'CROSS-DOCK')
               OR (dz = 'CROSS' AND rz = 'DOCK') OR (dz = 'DOCK' AND rz = 'CROSS')
               OR (dz IN ('CROSS', 'DOCK') AND rz = '')
               OR (rz IN ('CROSS', 'DOCK') AND dz = '')
             THEN 'Crossdock' ELSE trim(coalesce(nr2, '')) END AS ref_no
      FROM cd
    ),
    br AS (
      SELECT o_orderkey,
        regexp_replace(upper(translate(branch_raw, 'OI', '01')), '[^A-Z0-9 ]', '', 'g') AS sc
      FROM pairfix
    )
    SELECT p.o_orderkey,
      CASE WHEN b.sc LIKE '%0000%' THEN '0000'
           WHEN regexp_extract(b.sc, 'F\s*C[^0-9]*([0-9])[^0-9]*([0-9])?', 1) <> '' THEN
             CASE WHEN regexp_extract(b.sc, 'F\s*C[^0-9]*([0-9])[^0-9]*([0-9])?', 2) <> ''
                  THEN 'FC' || regexp_extract(b.sc, 'F\s*C[^0-9]*([0-9])[^0-9]*([0-9])?', 1)
                            || regexp_extract(b.sc, 'F\s*C[^0-9]*([0-9])[^0-9]*([0-9])?', 2)
                  ELSE 'FC0' || regexp_extract(b.sc, 'F\s*C[^0-9]*([0-9])[^0-9]*([0-9])?', 1) END
           WHEN regexp_extract(b.sc, 'W[^0-9]*([0-9])[^0-9]*([0-9])[^0-9]*([0-9])', 1) <> ''
           THEN 'W' || regexp_extract(b.sc, 'W[^0-9]*([0-9])[^0-9]*([0-9])[^0-9]*([0-9])', 1)
                    || regexp_extract(b.sc, 'W[^0-9]*([0-9])[^0-9]*([0-9])[^0-9]*([0-9])', 2)
                    || regexp_extract(b.sc, 'W[^0-9]*([0-9])[^0-9]*([0-9])[^0-9]*([0-9])', 3)
           ELSE trim(b.sc) END AS branch,
      p.doc_no, p.ref_no
    FROM pairfix p JOIN br b USING (o_orderkey)
    """,
    ("F19",),
)
def f19_token_repairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F19: the remittance OCR token-repair family end-to-end —
    branch-code repair (O/I folding, FC##/W### reconstruction, 0000
    wins), best-token extraction from noisy OCR cells, CONSIGN-family
    and 1V→IV normalization, ref-repaired-from-doc prefix logic, and
    CROSS/DOCK pair folding — applied to deterministic key-derived
    dirty tokens so the DuckDB oracle can replay every rule.

    Ref: pdf_ocr_rm_to_json.py:118-254 (fix_ocr_o0i1, branch repairs,
    normalize/best-token, repair_ref_from_doc, crossdock folding).
    """
    from etl_script_spark.pipelines import remittance as rm

    k = F.col("o_orderkey")
    ks = k.cast("string")
    # regex-repair-heavy over a narrow scan: spread across cores
    o = fan_out(t(spark, sf_dir, "orders").select("o_orderkey"))
    doc_raw = (
        F.when(k % 6 == 0, F.concat(F.lit("1V"), ks))
        .when(k % 6 == 1, F.concat(F.lit("C0NS1GN-"), F.lpad((k % 100).cast("string"), 2, "0")))
        .when(k % 6 == 2, F.lit("cons1gn"))
        .when(k % 6 == 3, F.concat(F.lit("IO-"), ks))
        .when(k % 6 == 4, F.concat(F.lit("เน?NV"), ks))
        .otherwise(F.lit("CROSS"))
    )
    ref_raw = (
        F.when(k % 6 == 0, F.concat(F.lit("1V"), ks))
        .when(k % 6 == 1, F.lit(""))
        .when(k % 6 == 2, F.concat(F.lit("R-"), ks))
        .when(k % 6 == 3, F.lit(None).cast("string"))
        .when(k % 6 == 4, F.concat(F.lit("NV"), ks))
        .otherwise(F.lit("DOCK"))
    )
    branch_raw = (
        F.when(k % 5 == 0, F.lit("F C 1"))
        .when(k % 5 == 1, F.lit("W 9 0 1"))
        .when(k % 5 == 2, F.lit("x0000y"))
        .when(k % 5 == 3, F.lit("FC12"))
        .otherwise(F.lit("o0 02"))
    )
    base = o.select(
        "o_orderkey",
        doc_raw.alias("doc_raw"),
        ref_raw.alias("ref_raw"),
        branch_raw.alias("branch_raw"),
    )
    step = base.select(
        "o_orderkey",
        rm.extract_best_token(F.col("doc_raw")).alias("doc1"),
        rm.extract_best_token(F.col("ref_raw")).alias("ref1"),
        rm.repair_branch(F.col("branch_raw")).alias("branch"),
    )
    step2 = step.select(
        "o_orderkey",
        "branch",
        "doc1",
        rm.repair_ref_from_doc(F.col("doc1"), F.col("ref1")).alias("ref2"),
    )
    pair = rm.normalize_crossdock_pair(F.col("doc1"), F.col("ref2"))
    return step2.select(
        "o_orderkey",
        "branch",
        pair["doc_no"].alias("doc_no"),
        pair["ref_no"].alias("ref_no"),
    )
