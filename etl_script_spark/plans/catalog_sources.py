"""Declared queries exercising sources & sinks (SURVEY.md §2.1).

Pattern: the callable materializes a deterministic input artifact
(CSV in two encodings, pointer-wrapped JSON, JDBC table, binary files)
from a driver parquet table into a per-sf temp dir, then reads it back
through the engine's source/sink layer. The DuckDB oracle states the
expected rows straight from the parquet view — a full write→read
round-trip proof. Only dim-sized tables (region/nation/supplier) are
materialized driver-side; fact-sized round-trips use distributed
``df.write``.
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_script_spark.plans.catalog import DEC, register, t
from etl_script_spark.sources import readers, writers


def _workdir(sf_dir: str, tag: str) -> str:
    sf = re.sub(r"[^0-9a-zA-Z.]", "_", sf_dir.strip("/"))
    d = f"/tmp/etl_script_spark_io/{sf}/{tag}"
    os.makedirs(d, exist_ok=True)
    return d


@register(
    "s1_csv_encoding_fallback",
    """
    SELECT n_nationkey,
           CASE WHEN n_nationkey % 2 = 0 THEN n_name || ' ไทย'
                ELSE n_name END AS n_name,
           CASE WHEN n_nationkey % 2 = 0 THEN 'cp874' ELSE 'utf-8' END AS enc
    FROM nation
    """,
    ("S1",),
)
def s1_csv_encoding_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: two CSV files — one cp874 (Thai), one utf-8 — probed and
    read through the per-file encoding cascade, then unioned
    (inv_old_processor.py:85-97 semantics)."""
    d = _workdir(sf_dir, "s1")
    rows = sorted(
        t(spark, sf_dir, "nation").select("n_nationkey", "n_name").collect(),
        key=lambda r: r["n_nationkey"],
    )  # nation is a 25-row dim — driver materialization is the point here
    thai = [r for r in rows if r["n_nationkey"] % 2 == 0]
    plain = [r for r in rows if r["n_nationkey"] % 2 == 1]
    with open(f"{d}/thai.csv", "w", encoding="cp874") as f:
        f.write("n_nationkey,n_name\n")
        for r in thai:
            f.write(f"{r['n_nationkey']},{r['n_name']} ไทย\n")
    with open(f"{d}/plain.csv", "w", encoding="utf-8") as f:
        f.write("n_nationkey,n_name\n")
        for r in plain:
            f.write(f"{r['n_nationkey']},{r['n_name']}\n")
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.LongType()),
            T.StructField("n_name", T.StringType()),
        ]
    )
    df = readers.read_csv_fallback(
        spark,
        [f"{d}/thai.csv", f"{d}/plain.csv"],
        header=True,
        schema=schema,
        add_lineage=True,
    )
    return df.select(
        "n_nationkey",
        "n_name",
        F.when(F.col("source_file").endswith("thai.csv"), F.lit("cp874"))
        .otherwise(F.lit("utf-8"))
        .alias("enc"),
    )


@register(
    "s1_encoding_probe_distributed",
    """
    SELECT n_nationkey,
           CASE n_nationkey % 4 WHEN 0 THEN 'utf-8-sig'
                                WHEN 1 THEN 'utf-8'
                                WHEN 2 THEN 'cp874'
                                ELSE 'latin1' END AS enc
    FROM nation
    """,
    ("S1",),
)
def s1_encoding_probe_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 at lake scale: one file per nation row, written in a
    4-encoding rotation (utf-8-sig BOM / plain utf-8 / cp874 Thai /
    latin1 with a cp874-undefined 0x81 byte), probed entirely ON
    EXECUTORS via ``sniff_encodings_distributed`` — pyarrow.fs head
    reads, identical ``_decode_probe`` cascade as the driver probe
    (inv_old_processor.py:85-97 semantics unchanged), only
    (path, encoding) pairs collected. The oracle states each file's
    expected cascade outcome from the row that generated it."""
    d = _workdir(sf_dir, "s1_dist")
    rows = sorted(
        t(spark, sf_dir, "nation").select("n_nationkey", "n_name").collect(),
        key=lambda r: r["n_nationkey"],
    )  # nation is a 25-row dim — driver materialization is the point here
    paths = []
    for r in rows:
        k, name = r["n_nationkey"], r["n_name"]
        path = f"{d}/n{k}.csv"
        if k % 4 == 0:
            payload = f"\ufeffn_nationkey,n_name\n{k},{name}\n".encode("utf-8")
        elif k % 4 == 1:
            payload = f"n_nationkey,n_name\n{k},{name}\n".encode("utf-8")
        elif k % 4 == 2:
            payload = f"n_nationkey,n_name\n{k},{name} \u0e44\u0e17\u0e22\n".encode("cp874")
        else:
            # 0x81 is latin1-valid but UNDEFINED in cp874 and an
            # orphan continuation byte in utf-8 — forces the cascade
            # all the way to its last candidate
            payload = f"n_nationkey,n_name\n{k},{name}\x81\n".encode("latin1")
        with open(path, "wb") as f:
            f.write(payload)
        paths.append(path)
    probed = readers.sniff_encodings_distributed(spark, paths, files_per_task=4)
    return probed.select(
        F.regexp_extract(F.col("path"), r"n(\d+)\.csv$", 1)
        .cast("long")
        .alias("n_nationkey"),
        F.col("encoding").alias("enc"),
    )


@register(
    "s11_json_pointer",
    """
    SELECT r_regionkey, r_name FROM region
    """,
    ("S11",),
)
def s11_json_pointer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11: pointer-scoped JSON object read — ``{"records": [...]}``
    exploded via the /records pointer (ImportInvoiceReport.php:70-76
    JsonMachine shape, distributed)."""
    d = _workdir(sf_dir, "s11")
    rows = sorted(
        t(spark, sf_dir, "region").select("r_regionkey", "r_name").collect(),
        key=lambda r: r["r_regionkey"],
    )
    payload = {
        "meta": {"source": "s11"},
        "records": [
            {"r_regionkey": r["r_regionkey"], "r_name": r["r_name"]} for r in rows
        ],
    }
    with open(f"{d}/records.json", "w", encoding="utf-8") as f:
        json.dump(payload, f, ensure_ascii=False)
    df = readers.read_json_records(spark, f"{d}/records.json", pointer="/records")
    return df.select("r_regionkey", "r_name")


@register(
    "s12_json_roundtrip",
    """
    SELECT s_suppkey, s_name, CAST(s_acctbal AS DOUBLE) AS acctbal FROM supplier
    """,
    ("S12",),
)
def s12_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12: distributed JSON records sink → JSON-lines source round
    trip (po_processor.py:82-86 to_json(orient='records'))."""
    d = _workdir(sf_dir, "s12")
    out = f"{d}/supplier_json"
    src = t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", F.col("s_acctbal").cast("double").alias("acctbal")
    )
    writers.write_json_records(src, out)
    schema = T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("acctbal", T.DoubleType()),
        ]
    )
    return spark.read.schema(schema).json(out)


@register(
    "s13_csv_roundtrip",
    """
    SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS totalprice
    FROM orders WHERE o_orderkey % 100 = 0
    """,
    ("S13",),
)
def s13_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13: headered CSV sink → typed CSV read round trip
    (bs_processor.py:114)."""
    d = _workdir(sf_dir, "s13")
    out = f"{d}/orders_csv"
    src = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("totalprice"),
    )
    writers.write_csv(src, out)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("totalprice", T.DoubleType()),
        ]
    )
    return spark.read.options(header="true").schema(schema).csv(out)


@register(
    "s14_jdbc_batch_roundtrip",
    """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
    ("S14",),
)
def s14_jdbc_batch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S14: batched JDBC sink (batchsize=1000, the reference's chunked
    1000-row transaction PublicApiController.php:392-408) into embedded
    Derby, read back through the JDBC source."""
    sf = re.sub(r"[^0-9a-zA-Z]", "", sf_dir)
    url = f"jdbc:derby:memory:etl{sf};create=true"
    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    src = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    writers.write_jdbc_append(
        src, url, "nation_rt", batchsize=1000, driver=drv, mode="overwrite"
    )
    return writers.read_jdbc(spark, url, "nation_rt", driver=drv).select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("long").alias("n_regionkey"),
    )


@register(
    "s16_file_meta",
    """
    SELECT 'r_' || CAST(r_regionkey AS VARCHAR) || '.bin' AS file_name,
           CAST(strlen(r_name) AS BIGINT) AS file_size,
           md5(r_name) AS md5
    FROM region
    """,
    ("S16",),
)
def s16_file_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S16: binaryFile provenance envelope — name, size, md5 per file
    (pdf_ocr_dbd_to_json.py:97-102)."""
    d = _workdir(sf_dir, "s16")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    rows = t(spark, sf_dir, "region").select("r_regionkey", "r_name").collect()
    for r in rows:
        with open(f"{d}/r_{r['r_regionkey']}.bin", "wb") as f:
            f.write(r["r_name"].encode("utf-8"))
    meta = readers.read_files_with_meta(spark, f"{d}/*.bin")
    return meta.select("file_name", "file_size", "md5")


@register(
    "s2_excel_roundtrip",
    """
    SELECT n_nationkey, n_name FROM nation
    """,
    ("S2",),
)
def s2_excel_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: xlsx written with the stdlib writer, read back through the
    DISTRIBUTED excel source (binaryFile + mapInPandas engine cascade,
    which lands on the stdlib OOXML engine in this container) — a full
    write→read round-trip of the Excel path with zero optional deps."""
    from etl_script_spark.sources import excel

    d = _workdir(sf_dir, "s2")
    rows = sorted(
        t(spark, sf_dir, "nation").select("n_nationkey", "n_name").collect(),
        key=lambda r: r["n_nationkey"],
    )  # 25-row dim — driver-side fixture build is the point
    data = [["n_nationkey", "n_name"]] + [
        [r["n_nationkey"], r["n_name"]] for r in rows
    ]
    excel.write_xlsx_simple(data, f"{d}/nation.xlsx")
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.StringType()),
            T.StructField("n_name", T.StringType()),
        ]
    )
    df = excel.read_excel_distributed(spark, f"{d}/nation.xlsx", schema)
    return df.select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"), "n_name"
    )


@register(
    "s2_xls_roundtrip",
    """
    SELECT r_regionkey, r_name FROM region
    """,
    ("S2",),
)
def s2_xls_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 (legacy .xls): region written as a BIFF8 workbook inside a
    CFB container by the fixture writer, read back through the
    DISTRIBUTED excel source — the cascade sniffs the OLE2 magic and
    lands on the from-scratch stdlib BIFF engine
    (sources/xls_biff.py), proving the .xls half of
    script_read_dbd_balance.py:98-150 with zero optional deps."""
    from etl_script_spark.sources import excel, xls_biff

    d = _workdir(sf_dir, "s2_xls")
    rows = sorted(
        t(spark, sf_dir, "region").select("r_regionkey", "r_name").collect(),
        key=lambda r: r["r_regionkey"],
    )  # 5-row dim — driver-side fixture build is the point
    data = [["r_regionkey", "r_name"]] + [
        [r["r_regionkey"], r["r_name"]] for r in rows
    ]
    xls_biff.write_xls_simple(data, f"{d}/region.xls")
    schema = T.StructType(
        [
            T.StructField("r_regionkey", T.StringType()),
            T.StructField("r_name", T.StringType()),
        ]
    )
    df = excel.read_excel_distributed(spark, f"{d}/region.xls", schema)
    return df.select(
        F.col("r_regionkey").cast("long").alias("r_regionkey"), "r_name"
    )


@register(
    "s4_pdf_table_extract",
    """
    SELECT 'r_' || CAST(r_regionkey AS VARCHAR) || '.pdf' AS path,
           'table-camelot-lattice' AS mode,
           r_name AS region_name,
           CAST(r_regionkey AS VARCHAR) AS region_key
    FROM region
    """,
    ("S4",),
)
def s4_pdf_table_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: the distributed table-extraction path (binary files →
    mapInPandas engine cascade → header-promoted records), driven by a
    deterministic fake lattice engine since the real camelot/tabula
    libs are absent — the batching/envelope/normalization contract is
    what's proven (pdf_ocr_inv_to_json.py:387-421 run_table)."""
    from etl_script_spark.extract import extract_pdf_tables

    files = t(spark, sf_dir, "region").select(
        F.concat(
            F.lit("r_"), F.col("r_regionkey").cast("string"), F.lit(".pdf")
        ).alias("path"),
        F.encode(
            F.concat_ws("|", F.col("r_name"), F.col("r_regionkey").cast("string")),
            "utf-8",
        ).alias("content"),
    )

    def fake_lattice(content: bytes):
        name, key = bytes(content).decode("utf-8").split("|")
        # positional-digit keys: normalize promotes the first row to header
        return [[{"0": "Region", "1": "Key"}, {"0": name, "1": key}]]

    out = extract_pdf_tables(files, extractors={"camelot-lattice": fake_lattice})
    return out.select(
        "path",
        "mode",
        F.col("fields")["Region"].alias("region_name"),
        F.col("fields")["Key"].alias("region_key"),
    )


@register(
    "s5_pdf_text_ocr_cascade",
    """
    SELECT 'n_' || CAST(n.n_nationkey AS VARCHAR) || '.pdf' AS path,
           md5(n.n_name || '|' || CAST(n.n_nationkey AS VARCHAR)) AS file_md5,
           CASE WHEN n.n_nationkey % 2 = 0 THEN 'text-pdfminer'
                ELSE 'ocr-tesseract' END AS engine,
           CASE WHEN n.n_nationkey % 2 = 0 THEN 2 ELSE 1 END AS num_pages,
           CAST(p.p AS INT) AS page_number,
           CASE WHEN n.n_nationkey % 2 <> 0 THEN 'OCR-' || n.n_name
                WHEN p.p = 1 THEN n.n_name
                ELSE 'p2-' || n.n_name END AS text
    FROM nation n CROSS JOIN (SELECT UNNEST([1, 2]) AS p) p
    WHERE n.n_nationkey % 2 = 0 OR p.p = 1
    """,
    ("S5", "S6", "S16"),
)
def s5_pdf_text_ocr_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/S6: text-layer → OCR cascade with per-page fan-out and the
    md5 provenance envelope. Even-keyed files have a text layer (two
    pages); odd-keyed files have an EMPTY layer and must fall through
    to the OCR engine (pdf_ocr_dbd_to_json.py:434-456 lifecycle),
    driven by deterministic fakes."""
    from etl_script_spark.extract import extract_pdf_text

    files = t(spark, sf_dir, "nation").select(
        F.concat(
            F.lit("n_"), F.col("n_nationkey").cast("string"), F.lit(".pdf")
        ).alias("path"),
        F.encode(
            F.concat_ws("|", F.col("n_name"), F.col("n_nationkey").cast("string")),
            "utf-8",
        ).alias("content"),
    )

    def fake_miner(content: bytes):
        name, key = bytes(content).decode("utf-8").split("|")
        if int(key) % 2 == 0:
            return [name, f"p2-{name}"]
        return ["", ""]  # scanned: layer present but empty → cascade

    def fake_tess(content: bytes):
        name, _ = bytes(content).decode("utf-8").split("|")
        return [f"OCR-{name}"]

    out = extract_pdf_text(
        files, extractors={"pdfminer": fake_miner, "tesseract": fake_tess}
    )
    return out.select(
        "path", "file_md5", "engine", "num_pages", "page_number", "text"
    )


_SHARED_SQL = """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100
               AS total_value
    FROM orders
    GROUP BY o_orderstatus
"""


@register("sql_surface_shared", _SHARED_SQL, ("SQL-surface",))
def sql_surface_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql surface: the driver tables registered as temp
    views and ONE ANSI SQL string executed verbatim by BOTH engines
    (the oracle is the identical text) — users of the reference's
    query endpoints can speak SQL directly to this engine."""
    for name in ("orders",):
        t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_SHARED_SQL)


def _fake_bol_transport(url: str, form: dict, headers: dict) -> dict:
    """Injected S10 transport: a deterministic in-process stand-in for
    the BOL API (login/getdata/logout), exercising the client's full
    token lifecycle without a network. Top-level so mapInPandas can
    pickle it to executors."""
    if "login" in url:
        return {"access_token": "tok-fake", "token_type": "Bearer"}
    if "logout" in url:
        return {}
    if headers.get("Authorization") != "Bearer tok-fake":
        raise RuntimeError("getdata without login token")
    reg = form["registrationId"]
    return {
        "searchResults": [
            {"companyName": "CO-" + reg, "status": "1"},
            {"companyName": "BR-" + reg, "status": "2"},
        ]
    }


@register(
    "s10_rest_bol_fetch",
    """
    SELECT lpad(CAST(n_nationkey AS VARCHAR), 13, '0') AS registration_no,
           'CO-' || lpad(CAST(n_nationkey AS VARCHAR), 13, '0') AS company_name,
           '1' AS status
    FROM nation
    UNION ALL
    SELECT lpad(CAST(n_nationkey AS VARCHAR), 13, '0'),
           'BR-' || lpad(CAST(n_nationkey AS VARCHAR), 13, '0'), '2'
    FROM nation
    """,
    ("S10",),
)
def s10_rest_bol_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10: REST acquisition source end-to-end — distributed fetch
    (one login per partition, token reuse, logout) through the
    injectable transport, raw-archive bronze envelope, then the
    searchResults explode to silver. The oracle restates the fake
    API's deterministic payload per registration id.

    Ref: BolApiController.php:92-128 (login/getdata/logout),
    :62-71 (raw archive + searchResults unwrap).
    """
    from etl_script_spark.sources import rest

    regs = t(spark, sf_dir, "nation").select(
        F.lpad(F.col("n_nationkey").cast("string"), 13, "0").alias(
            "registration_no"
        )
    )
    cfg = rest.BolApiConfig(
        login_url="fake://login",
        getdata_url="fake://getdata",
        logout_url="fake://logout",
        username="u",
        password="p",
    )
    raw = rest.fetch_raw_archive_distributed(
        regs.repartition(4), cfg, _fake_bol_transport
    )
    parsed = rest.parse_search_results(raw)
    return parsed.select(
        "registration_no",
        parsed["result"]["companyName"].alias("company_name"),
        parsed["result"]["status"].alias("status"),
    )


@register(
    "s15_http_push_roundtrip",
    "SELECT n_nationkey, n_name FROM nation",
    ("S15",),
)
def s15_http_push_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S15: HTTP push sink round-trip — every partition POSTs its rows
    in batches through a per-partition poster (here a loopback that
    records each batch as JSON lines, the in-container stand-in for
    the API endpoint); the recorded stream is read back and must equal
    the source table. Exercises batching (batch_size < rows),
    executor-side poster construction, and the foreachPartition fanout.

    Ref: main.py:40-48, send_dbd_company_supplier.py:85-143.
    """
    from etl_script_spark.sources import writers as w

    d = _workdir(sf_dir, "s15")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    src = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    def poster_factory():
        import json as _json
        import os as _os
        import uuid as _uuid

        path = f"{d}/recv-{_os.getpid()}-{_uuid.uuid4().hex}.jsonl"

        def post(batch: list[dict]) -> None:
            with open(path, "a", encoding="utf-8") as f:
                for rec in batch:
                    f.write(_json.dumps(rec, ensure_ascii=False) + "\n")

        return post

    w.http_push_sink(src, poster_factory, batch_size=7)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.LongType()),
            T.StructField("n_name", T.StringType()),
        ]
    )
    return spark.read.schema(schema).json(f"{d}/recv-*.jsonl")


@register(
    "s9_scrape_card_parse",
    """
    SELECT s_suppkey,
           s_name AS company_name,
           '0' || lpad(CAST(s_suppkey AS VARCHAR), 12, '0') AS registration_no,
           CAST(make_date(1988 + s_suppkey % 40,
                          CAST(1 + s_suppkey % 12 AS INTEGER),
                          CAST(1 + s_suppkey % 28 AS INTEGER))
                AS TIMESTAMP) AS registered_date,
           CAST((s_suppkey % 1000 + 1) AS BIGINT) * 100000 AS registered_capital,
           CASE s_suppkey % 3 WHEN 0 THEN 'ยังดำเนินกิจการอยู่'
                WHEN 1 THEN 'เสร็จการชำระบัญชี' ELSE 'ร้าง' END AS entity_status
    FROM supplier
    """,
    ("S9",),
)
def s9_scrape_card_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 parse side: the company-info card a browser-automation
    acquisition archives (ACQUISITION itself — Selenium navigation —
    is out-of-engine tooling; the engine owns the page→typed-row
    transform). Page text is generated per supplier row, then parsed
    back with the scraper's exact repair semantics: label-prefix strip
    for the company name, digit-run extraction (10-20 digits after
    noise removal) for the registration number, Thai-abbreviated-month
    + strict >2400 BE→CE date rebuild, comma-grouped capital, status
    passthrough. Pure Column expressions — zero shuffles, zero UDFs;
    the oracle restates the expected typed values from the table.

    Ref: dbd_web_scraping.py:206-265 (norm_txt, cac-certified
    name/registration extraction, thai_date_to_iso with year>2400).
    """
    from etl_script_spark.functions import dates

    s = t(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    months_th = F.array(
        *[F.lit(m) for m in (
            "ม.ค.", "ก.พ.", "มี.ค.", "เม.ย.", "พ.ค.", "มิ.ย.",
            "ก.ค.", "ส.ค.", "ก.ย.", "ต.ค.", "พ.ย.", "ธ.ค.",
        )]
    )
    be_year = (F.lit(2531) + k % 40).cast("int")
    month = (F.lit(1) + k % 12).cast("int")
    day = (F.lit(1) + k % 28).cast("int")
    capital = ((k % 1000 + 1) * 100000).cast("long")
    status = (
        F.when(k % 3 == 0, F.lit("ยังดำเนินกิจการอยู่"))
        .when(k % 3 == 1, F.lit("เสร็จการชำระบัญชี"))
        .otherwise(F.lit("ร้าง"))
    )
    page = F.concat(
        F.lit("ข้อมูลนิติบุคคล\nชื่อนิติบุคคล : "), F.col("s_name"),
        F.lit("\nเลขทะเบียนนิติบุคคล : 0"),
        F.lpad(k.cast("string"), 12, "0"),
        F.lit("\nวันที่จดทะเบียน|"),
        day.cast("string"), F.lit(" "),
        F.element_at(months_th, month), F.lit(" "), be_year.cast("string"),
        F.lit("\nทุนจดทะเบียน|"), F.format_number(capital, 0),
        F.lit(" บาท\nสถานะ|"), status,
    )
    raw = s.select("s_suppkey", page.alias("page"))
    name_line = F.regexp_extract("page", r"ชื่อนิติบุคคล\s*[:：]\s*([^\n]+)", 1)
    reg_line = F.regexp_extract("page", r"เลขทะเบียนนิติบุคคล\s*[:：]\s*([^\n]+)", 1)
    reg_no = F.regexp_extract(
        F.regexp_replace(reg_line, r"[^\d]", ""), r"(\d{10,20})", 1
    )
    date_txt = F.regexp_extract("page", r"วันที่จดทะเบียน\|([^\n]+)", 1)
    parts = F.split(F.trim(date_txt), r"\s+")
    reg_date = dates.safe_make_date(
        dates.be_to_ce_year(parts[2].try_cast("int")),
        dates.thai_month_num(parts[1]),
        parts[0].try_cast("int"),
    )
    cap_txt = F.regexp_extract("page", r"ทุนจดทะเบียน\|([\d,]+) บาท", 1)
    cap_val = F.regexp_replace(cap_txt, ",", "").try_cast("long")
    status_txt = F.regexp_extract("page", r"สถานะ\|([^\n]+)", 1)
    return raw.select(
        "s_suppkey",
        F.trim(name_line).alias("company_name"),
        reg_no.alias("registration_no"),
        reg_date.cast("timestamp_ntz").alias("registered_date"),
        cap_val.alias("registered_capital"),
        status_txt.alias("entity_status"),
    )


@register(
    "merge_partition_scoped",
    """
    WITH t AS (
      SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
             o_totalprice, o_orderpriority
      FROM orders
    )
    SELECT o_orderkey, o_year, o_totalprice, o_orderpriority FROM (
      SELECT o_orderkey, o_year,
             CASE WHEN o_year = 2000 AND o_orderkey % 3 = 0
                  THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
             o_orderpriority
      FROM t
      UNION ALL
      SELECT o_orderkey + 10000000 AS o_orderkey, o_year, 1000.0 AS o_totalprice,
             'NEW' AS o_orderpriority
      FROM t WHERE o_year = 2000 AND o_orderkey % 7 = 0
    )
    """,
    ("J6",),
)
def merge_partition_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scoped MERGE (VERDICT r3 #4): upsert a single-year
    batch into an orders table laid out ``partitionBy(o_year)`` —
    only the touched partition is read (partition-pruned scan) and
    rewritten (dynamic partition overwrite); the other six years'
    files stay byte-identical on disk (asserted in
    tests/test_sources.py). The batch doubles the totalprice of
    year-2000 keys divisible by 3 and inserts fresh keys; the oracle
    states the expected merged table straight from the orders view.
    All batch values are FP-exact transforms (x2, literals), so the
    row-level comparison is drift-free."""
    d = _workdir(sf_dir, "merge_part")
    table = f"{d}/orders_by_year"
    shutil.rmtree(table, ignore_errors=True)
    base = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        "o_totalprice",
        "o_orderpriority",
    )
    base.write.partitionBy("o_year").parquet(table)
    y2000 = base.filter(F.col("o_year") == 2000)
    batch = (
        y2000.filter(F.col("o_orderkey") % 3 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .unionByName(
            y2000.filter(F.col("o_orderkey") % 7 == 0).select(
                (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                "o_year",
                F.lit(1000.0).alias("o_totalprice"),
                F.lit("NEW").alias("o_orderpriority"),
            )
        )
    )
    writers.merge_into_partitioned(
        spark, table, batch, keys=["o_orderkey"], partition_col="o_year"
    )
    return spark.read.parquet(table).select(
        "o_orderkey", "o_year", "o_totalprice", "o_orderpriority"
    )


@register(
    "decimal_money_at_rest",
    """
    WITH c AS (
      SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_orderkey,
           printf('%d.%02d', cents // 100, cents % 100) AS amount_str,
           CAST(cents AS DOUBLE) / 100 AS amount_dbl
    FROM c
    """,
    ("F28",),
)
def decimal_money_at_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimal policy end-to-end (VERDICT r3 #9, SURVEY §1.2/§7.4.5):
    money is written AT REST as DECIMAL(15,2) (``money_at_rest`` —
    exact cents, the reference's DDL type), read back from parquet,
    and routed through the in-flight money path (``round_money`` →
    double). The oracle re-derives both renderings from integer cents:
    ``amount_str`` proves the stored decimal's exact scale-2 value
    (string cast preserves trailing zeros — '123.40', not '123.4'),
    ``amount_dbl`` proves the decimal→double re-entry is drift-free."""
    from etl_script_spark.functions import numerics

    d = _workdir(sf_dir, "decimal_money")
    path = f"{d}/amounts"
    shutil.rmtree(path, ignore_errors=True)
    t(spark, sf_dir, "orders").select(
        "o_orderkey",
        numerics.money_at_rest(F.col("o_totalprice")).alias("total_amount"),
    ).write.parquet(path)
    back = spark.read.parquet(path)
    assert dict(back.dtypes)["total_amount"] == "decimal(15,2)"
    return back.select(
        "o_orderkey",
        F.col("total_amount").cast("string").alias("amount_str"),
        numerics.round_money(F.col("total_amount")).alias("amount_dbl"),
    )


@register(
    "s17_csv_corrupt_quarantine",
    """
    SELECT CASE WHEN n_nationkey % 3 = 0 THEN 'quarantined' ELSE 'ok' END
             AS status,
           CASE WHEN n_nationkey % 3 = 0 THEN NULL ELSE n_nationkey END
             AS key,
           CASE WHEN n_nationkey % 3 = 0
                THEN 'x' || CAST(n_nationkey AS VARCHAR) || ',' || n_name
                     || ',extra'
                ELSE n_name END AS payload
    FROM nation
    """,
    ("S1", "P9"),
)
def s17_csv_corrupt_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-row quarantine: a CSV where every third line has a
    non-numeric key and a stray extra column loads in PERMISSIVE mode
    with a corrupt-record column — good rows parse typed, bad rows
    surface with their RAW line for replay, and nothing kills the
    job (the distributed version of the reference's row-level
    SQLSTATE swallow, ImportOldInvoices.php:188-195)."""
    d = _workdir(sf_dir, "s17")
    rows = sorted(
        t(spark, sf_dir, "nation").select("n_nationkey", "n_name").collect(),
        key=lambda r: r["n_nationkey"],
    )  # 25-row dim fixture build — materialization is the point
    with open(f"{d}/mixed.csv", "w", encoding="utf-8") as f:
        for r in rows:
            if r["n_nationkey"] % 3 == 0:
                f.write(f"x{r['n_nationkey']},{r['n_name']},extra\n")
            else:
                f.write(f"{r['n_nationkey']},{r['n_name']}\n")
    schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("payload", T.StringType()),
        ]
    )
    df = readers.read_csv_quarantine(spark, f"{d}/mixed.csv", schema)
    good, bad = readers.split_quarantine(df)
    return good.select(
        F.lit("ok").alias("status"), "key", "payload"
    ).unionByName(
        bad.select(
            F.lit("quarantined").alias("status"),
            F.lit(None).cast("long").alias("key"),
            F.col("_corrupt").alias("payload"),
        )
    )


@register(
    "s18_orc_roundtrip",
    """
    SELECT o_orderkey, o_orderstatus,
           CAST(o_totalprice AS DOUBLE) AS totalprice, o_orderdate
    FROM orders WHERE o_orderkey % 50 = 0
    """,
    ("S18-orc",),
)
def s18_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink → typed ORC read round trip (format-matrix widening:
    the same pushdown/pruning contract as parquet against ORC-native
    Hive/Trino estates). Types cross the format boundary losslessly,
    date column included."""
    d = _workdir(sf_dir, "s18")
    out = f"{d}/orders_orc"
    src = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 50 == 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("double").alias("totalprice"),
            "o_orderdate",
        )
    )
    writers.write_orc(src, out)
    return spark.read.orc(out)


@register(
    "s19_schema_evolution_merge",
    """
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice,
           CAST(NULL AS VARCHAR) AS channel
    FROM orders WHERE o_orderkey % 40 = 0
    UNION ALL
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE),
           CASE WHEN o_orderkey % 2 = 0 THEN 'web' ELSE 'batch' END
    FROM orders WHERE o_orderkey % 40 = 7
    """,
    ("S19-evolution",),
)
def s19_schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet batches: a later batch adds a
    ``channel`` column; ``mergeSchema`` unions the footers so old
    files surface NULL for the new column — the append-only drop
    directory pattern where producers upgrade without rewriting
    history. (At 100 TB: mergeSchema costs one footer read per FILE —
    pin the merged schema explicitly once known; this query is the
    discovery path.)"""
    d = _workdir(sf_dir, "s19")
    base = f"{d}/orders_evolving"
    o = t(spark, sf_dir, "orders")
    batch1 = o.filter(F.col("o_orderkey") % 40 == 0).select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("totalprice")
    )
    batch2 = o.filter(F.col("o_orderkey") % 40 == 7).select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("totalprice"),
        F.when(F.col("o_orderkey") % 2 == 0, F.lit("web"))
        .otherwise(F.lit("batch"))
        .alias("channel"),
    )
    batch1.write.mode("overwrite").parquet(f"{base}/batch=1")
    batch2.write.mode("overwrite").parquet(f"{base}/batch=2")
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(f"{base}/batch=1", f"{base}/batch=2")
        .select("o_orderkey", "totalprice", "channel")
    )


@register(
    "layout_range_clustered_read",
    """
    SELECT event_id, user_id, value FROM events
    WHERE user_id BETWEEN 4 AND 9
    """,
    ("X-layout",),
)
def layout_range_clustered_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-clustered rewrite of events on user_id (8 disjoint-range
    files) followed by a range-filtered read. The filter pushes to
    the parquet scan, and because the writer clustered the key, the
    footer min/max stats prune all but the 1-2 files whose interval
    intersects the filter range — the data-skipping layout a 100 TB events
    table needs (tests assert the per-file ranges are disjoint and
    the plan carries the pushed filter)."""
    from etl_script_spark.sources import layout

    d = _workdir(sf_dir, "layout")
    out = f"{d}/events_by_user"
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    layout.write_range_clustered(ev, out, "user_id", 8)
    return spark.read.parquet(out).filter(F.col("user_id").between(4, 9))


@register(
    "layout_compact_small_files",
    """
    SELECT event_id, user_id, event_type, value FROM events
    """,
    ("X-layout",),
)
def layout_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: events scattered across 64 per-batch
    shards (the streaming-sink pathology) rewritten into
    scan-split-sized files with an atomic snapshot swap; the read
    back through the ``current`` symlink is byte-identical to the
    source. Tests assert the file count actually collapses."""
    from etl_script_spark.sources import layout

    d = _workdir(sf_dir, "compact")
    table = f"{d}/events_table"
    ev = t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    ev.repartition(64).write.mode("overwrite").parquet(f"{table}_scattered")
    scattered = spark.read.parquet(f"{table}_scattered")
    import shutil

    shutil.rmtree(table, ignore_errors=True)
    writers.atomic_overwrite_parquet(scattered, table)
    layout.compact_files(spark, table)
    return spark.read.parquet(f"{table}/current")


@register(
    "s20_variant_semistructured",
    """
    WITH raw AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 10 = 9 THEN '{"broken'
                  ELSE '{"id": ' || CAST(o_orderkey AS VARCHAR)
                       || ', "cust": {"key": ' || CAST(o_custkey AS VARCHAR)
                       || ', "seg": "s' || CAST(o_orderkey % 5 AS VARCHAR)
                       || '"}, "amounts": [' || CAST(o_orderkey % 100 AS VARCHAR)
                       || ', ' || CAST(o_orderkey % 100 + 1 AS VARCHAR)
                       || '], "flag": '
                       || CASE WHEN o_orderkey % 2 = 0 THEN 'true' ELSE 'false' END
                       || '}'
             END AS js
      FROM orders
    )
    SELECT o_orderkey,
           CASE WHEN json_valid(js) THEN CAST(js->>'$.id' AS BIGINT) END AS id,
           CASE WHEN json_valid(js) THEN js->>'$.cust.seg' END AS seg,
           CASE WHEN json_valid(js)
                THEN CAST(js->>'$.amounts[1]' AS BIGINT) END AS amt1,
           CASE WHEN json_valid(js) THEN js->>'$.flag' END AS flag,
           json_valid(js) AS parsed_ok
    FROM raw
    """,
    ("S20-variant",),
)
def s20_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion through the VARIANT type (Spark 4):
    JSON payloads (10% malformed) parse once with try_parse_json —
    malformed rows become NULL variants instead of poisoning the
    batch (the ANSI-safe S11 convention) — and typed fields extract
    lazily with try_variant_get path expressions (nested object,
    array index, boolean). At scale VARIANT beats schema-on-read
    from_json when payload shapes drift: no upfront schema, binary
    encoding, per-path extraction cost only for the paths actually
    read."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    k = F.col("o_orderkey")
    js = F.when(k % 10 == 9, F.lit('{"broken')).otherwise(
        F.concat(
            F.lit('{"id": '), k.cast("string"),
            F.lit(', "cust": {"key": '), F.col("o_custkey").cast("string"),
            F.lit(', "seg": "s'), (k % 5).cast("string"),
            F.lit('"}, "amounts": ['), (k % 100).cast("string"),
            F.lit(", "), (k % 100 + 1).cast("string"),
            F.lit('], "flag": '),
            F.when(k % 2 == 0, F.lit("true")).otherwise(F.lit("false")),
            F.lit("}"),
        )
    )
    v = o.select("o_orderkey", F.try_parse_json(js).alias("v"))
    return v.select(
        "o_orderkey",
        F.try_variant_get("v", "$.id", "long").alias("id"),
        F.try_variant_get("v", "$.cust.seg", "string").alias("seg"),
        F.try_variant_get("v", "$.amounts[1]", "long").alias("amt1"),
        # string, not boolean: a NULLable boolean surfaces as None in
        # Spark's toPandas but NaN in DuckDB's — strings align
        F.try_variant_get("v", "$.flag", "boolean").cast("string").alias("flag"),
        F.col("v").isNotNull().alias("parsed_ok"),
    )


@register(
    "s21_python_datasource_paged",
    """
    SELECT 'DOC' || CAST(o_orderkey AS VARCHAR) AS doc_no,
           CAST(o_orderkey % 1000 AS DOUBLE) + 0.5 AS amount,
           CAST(o_orderkey % 8 AS INT) AS page
    FROM orders WHERE o_orderkey % 20 = 0
    """,
    ("S21-pyds",),
)
def s21_python_datasource_paged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (Spark 4 API): the S10 paged-feed
    bronze directory read back through a REGISTERED ``paged_feed``
    format — 8 page files become 8 InputPartitions planned by the
    source, read on executors through the normal
    ``spark.read.format(...)`` surface. The fixture pages are built
    from orders so the oracle can restate the feed exactly."""
    import json as _json
    import os as _os

    from etl_script_spark.sources import pyds

    d = _workdir(sf_dir, "s21")
    feed = f"{d}/feed"
    _os.makedirs(feed, exist_ok=True)
    rows = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 20 == 0)
        .select(
            F.concat(F.lit("DOC"), F.col("o_orderkey").cast("string")).alias(
                "doc_no"
            ),
            ((F.col("o_orderkey") % 1000).cast("double") + 0.5).alias("amount"),
            (F.col("o_orderkey") % 8).cast("int").alias("page"),
        )
        .collect()  # bounded fixture build (catalog-source convention)
    )
    pages: dict[int, list] = {}
    for r in rows:
        pages.setdefault(r["page"], []).append(
            {"doc_no": r["doc_no"], "amount": r["amount"]}
        )
    for p, recs in pages.items():
        with open(f"{feed}/page_{p:04d}.json", "w", encoding="utf-8") as fh:
            _json.dump(sorted(recs, key=lambda x: x["doc_no"]), fh)
    for stale in _os.listdir(feed):
        if stale.endswith(".json") and int(stale[5:9]) not in pages:
            _os.remove(f"{feed}/{stale}")
    pyds.register(spark)
    return spark.read.format("paged_feed").option("path", feed).load()


@register(
    "layout_zorder_clustered_read",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           CAST(SUM({z}) AS BIGINT) AS z_checksum
    FROM (
      SELECT event_id, user_id, CAST(EXTRACT(day FROM ts) AS BIGINT) AS d,
             value
      FROM events
    )
    WHERE user_id BETWEEN 32 AND 63 AND d BETWEEN 8 AND 15
    """.format(
        z="(" + " | ".join(
            f"(((CAST(user_id AS BIGINT) >> {b}) & 1) << {b * 2})"
            f" | (((CAST(d AS BIGINT) >> {b}) & 1) << {b * 2 + 1})"
            for b in range(8)
        ) + ")"
    ),
    ("X-layout",),
)
def layout_zorder_clustered_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order-clustered rewrite of events on (user_id, day) — the
    multi-dimension data-skipping layout (Delta OPTIMIZE ZORDER
    shape): Morton-interleave the two quantized dims, range-partition
    on the code into 16 files, sort within each. A box filter on BOTH
    dims then prunes by footer stats in each dimension, which a
    plain compound sort only gives the leading column. The query
    round-trips the layout (write → box-filtered read) and emits the
    box aggregate plus the SUM of the Morton codes recomputed from
    the read-back rows — the DuckDB oracle replays the identical
    unrolled shift/or chain over the raw table, so a single wrong
    interleave bit anywhere breaks the hash. Per-file bounding-box
    tightness is pinned in tests/test_sources.py."""
    from etl_script_spark.sources import layout

    d = _workdir(sf_dir, "layout_z")
    out = f"{d}/events_zorder"
    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.dayofmonth("ts").cast("long").alias("d"),
        "value",
    )
    layout.write_zorder_clustered(ev, out, ["user_id", "d"], 16, bits=8)
    back = spark.read.parquet(out).filter(
        F.col("user_id").between(32, 63) & F.col("d").between(8, 15)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        F.sum(layout.zorder_key(["user_id", "d"], bits=8)).alias("z_checksum"),
    )


@register(
    "s22_python_datasource_stream",
    """
    SELECT CAST((o_orderkey // 20) % 8 AS INT) AS page,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(CAST(o_orderkey % 1000 AS DOUBLE) + 0.5
                         AS DECIMAL(18,6))) AS DOUBLE) AS total_amount
    FROM orders WHERE o_orderkey % 20 = 0
    GROUP BY 1
    """,
    ("S21-pyds", "streaming-source"),
)
def s22_python_datasource_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING read through the registered Python DataSource (Spark
    4 SimpleDataSourceStreamReader): the paged-feed directory as an
    append-only stream whose offset is the highest page id consumed.
    Two feed waves run through ONE checkpoint — pages 0-3 exist for
    the first AvailableNow pass, pages 4-7 land before the second —
    so the query proves incremental offset tracking end-to-end (the
    second pass must pick up exactly the new pages, and replaying a
    committed range is bit-identical). Output is the per-page
    aggregate over BOTH waves; the oracle restates the whole feed
    from orders."""
    import json as _json
    import os as _os
    import tempfile as _tf

    from etl_script_spark.sources import pyds
    from etl_script_spark.streaming import ingest

    pyds.register(spark)
    d = _workdir(sf_dir, "s22")
    feed = f"{d}/feed"
    shutil.rmtree(feed, ignore_errors=True)
    _os.makedirs(feed, exist_ok=True)
    rows = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 20 == 0)
        .select(
            F.concat(F.lit("DOC"), F.col("o_orderkey").cast("string")).alias(
                "doc_no"
            ),
            ((F.col("o_orderkey") % 1000).cast("double") + 0.5).alias(
                "amount"
            ),
            (F.floor(F.col("o_orderkey") / 20) % 8).cast("int").alias("page"),
        )
        .collect()  # bounded fixture build (catalog-source convention)
    )
    pages: dict[int, list] = {}
    for r in rows:
        pages.setdefault(r["page"], []).append(
            {"doc_no": r["doc_no"], "amount": r["amount"]}
        )

    def _write_wave(page_ids):
        for p in page_ids:
            recs = sorted(pages.get(p, []), key=lambda x: x["doc_no"])
            with open(f"{feed}/page_{p:04d}.json", "w", encoding="utf-8") as fh:
                _json.dump(recs, fh)

    ckpt = _tf.mkdtemp(prefix="s22_ckpt_")
    sink = f"{d}/consumed"
    shutil.rmtree(sink, ignore_errors=True)

    def _drain():
        # exactly-once FILE sink (the memory sink cannot recover from
        # a checkpoint): both waves write through the same checkpoint
        # + output log, so wave 2 resumes from wave 1's committed
        # offset and appends only the new pages
        q = (
            spark.readStream.format("paged_feed")
            .option("path", feed)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "s22 stream drain timed out"

    _write_wave([p for p in pages if p < 4])
    _drain()
    _write_wave([p for p in pages if p >= 4])
    _drain()
    consumed = spark.read.parquet(sink)
    return consumed.groupBy("page").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("amount").cast("decimal(18,6)"))
        .cast("double")
        .alias("total_amount"),
    )


@register(
    "s23_jsonl_gz_roundtrip",
    """
    SELECT doc_id, text, lang, source, n_chars FROM documents
    """,
    ("S12", "S11"),
)
def s23_jsonl_gz_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gzip-compressed JSON-lines roundtrip — the de-facto interchange
    format for LLM corpora (one JSON doc per line, .jsonl.gz shards).
    Written and read with the built-in json source + gzip codec; the
    read supplies an explicit schema (never inferSchema at scale — a
    schema inference pass over 100 TB of gzip is a full decompress of
    the corpus). Gzip shards are NOT splittable: one shard = one task,
    so shard size discipline at write time (here: Spark's write
    partitioning) IS the read parallelism — the operational gotcha
    this entry pins. For splittable compression at rest, parquet/zstd
    (the lake path) stays the recommendation; jsonl.gz is the
    interchange edge."""
    d = _workdir(sf_dir, "s23")
    out = f"{d}/docs_jsonl_gz"
    src = t(spark, sf_dir, "documents")
    src.write.mode("overwrite").option("compression", "gzip").json(out)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    return spark.read.schema(schema).json(out).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


@register(
    "s24_xml_roundtrip",
    """
    SELECT s_suppkey, s_name, CAST(s_acctbal AS DOUBLE) AS acctbal
    FROM supplier
    """,
    ("S11", "S12"),
)
def s24_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink → source roundtrip on Spark 4's built-in XML data
    source (rowTag records). XML is the remaining enterprise
    interchange edge next to the CSV/JSON/Excel family the reference
    ingests; schema is EXPLICIT on read (XML inference is a full
    parse of the corpus, same rule as jsonl.gz). Row-tag XML is
    record-splittable, unlike gzip JSON-lines."""
    d = _workdir(sf_dir, "s24")
    out = f"{d}/supplier_xml"
    src = t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", F.col("s_acctbal").cast("double").alias("acctbal")
    )
    src.write.mode("overwrite").option("rootTag", "suppliers").option(
        "rowTag", "supplier"
    ).format("xml").save(out)
    schema = T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("acctbal", T.DoubleType()),
        ]
    )
    return (
        spark.read.schema(schema)
        .option("rowTag", "supplier")
        .format("xml")
        .load(out)
        .select("s_suppkey", "s_name", "acctbal")
    )


@register(
    "s25_fixed_width_roundtrip",
    """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
    ("S1", "S13"),
)
def s25_fixed_width_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width (positional) flat-file roundtrip — the
    mainframe/bank-export format next to the CSV/Excel/XML family:
    write nation space-padded to (6, 25, 6) columns, parse it back by
    position with try_cast typing. The parse is one codegen Project
    over spark.read.text (no quoting state — files split at any byte
    boundary); the oracle is the source table, so the roundtrip must
    be lossless (sources/readers.py:read_fixed_width,
    sources/writers.py:write_fixed_width)."""
    from etl_script_spark.sources.readers import read_fixed_width
    from etl_script_spark.sources.writers import write_fixed_width

    d = _workdir(sf_dir, "s25")
    out = f"{d}/nation_fw"
    src = t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    write_fixed_width(src, out, widths=[6, 25, 6])
    return read_fixed_width(
        spark,
        out,
        [
            ("n_nationkey", 6, "long"),
            ("n_name", 25, "string"),
            ("n_regionkey", 6, "long"),
        ],
    )


def _hilbert_oracle() -> str:
    from etl_script_spark.sources.layout import hilbert_key_sql

    inner = (
        "SELECT event_id, user_id,"
        " CAST(EXTRACT(day FROM ts) AS BIGINT) AS d, value"
        " FROM events"
        " WHERE user_id BETWEEN 32 AND 63"
        " AND CAST(EXTRACT(day FROM ts) AS BIGINT) BETWEEN 8 AND 15"
    )
    keyed = hilbert_key_sql(
        "user_id", "d", 8, inner, "event_id, user_id, d, value"
    )
    return (
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,"
        " CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,"
        " CAST(SUM(h) AS BIGINT) AS h_checksum"
        f" FROM ({keyed})"
    )


@register(
    "layout_hilbert_clustered_read",
    _hilbert_oracle(),
    ("X-layout",),
)
def layout_hilbert_clustered_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve-clustered rewrite of events on (user_id, day)
    (layout.write_hilbert_clustered): the space-filling curve without
    Z-order's diagonal jumps, so a box filter touches fewer code
    intervals (the layout Iceberg offers as 'hilbert'). Same contract
    as layout_zorder_clustered_read: write → box-filtered read-back →
    box aggregate plus the SUM of the Hilbert indexes recomputed from
    the read rows; the oracle replays the identical per-step
    quadrant/rotate arithmetic (algebraized XOR — no bitwise ops), so
    one wrong rotation anywhere breaks the hash."""
    from etl_script_spark.sources import layout

    d = _workdir(sf_dir, "layout_h")
    out = f"{d}/events_hilbert"
    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.dayofmonth("ts").cast("long").alias("d"),
        "value",
    )
    layout.write_hilbert_clustered(ev, out, "user_id", "d", 16, bits=8)
    back = spark.read.parquet(out).filter(
        F.col("user_id").between(32, 63) & F.col("d").between(8, 15)
    )
    keyed = layout.with_hilbert_key(back, "user_id", "d", bits=8,
                                    out_col="__h")
    return keyed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        F.sum("__h").cast("long").alias("h_checksum"),
    )


@register(
    "layout_file_skipping",
    """
    WITH mx AS (SELECT MAX(user_id) AS m FROM events),
    b AS (
      SELECT user_id, (user_id * 8) // (m + 1) AS bucket
      FROM events, mx
    ),
    g AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(MIN(user_id) AS BIGINT) AS min_key,
             CAST(MAX(user_id) AS BIGINT) AS max_key
      FROM b GROUP BY bucket
    ),
    p AS (
      SELECT (m + 1) // 4 AS lo, (m + 1) // 4 + (m + 1) // 8 AS hi
      FROM mx
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY min_key) AS BIGINT)
             AS file_rank,
           n_rows, min_key, max_key,
           (max_key < lo OR min_key > hi) AS skippable
    FROM g, p
    """,
    ("X-layout",),
)
def layout_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map pruning report (layout.file_skipping_stats): events
    rewritten into 8 deterministic key-range files, then per actual
    data FILE the cluster key's (min, max, rows) and whether a range
    predicate could skip the file entirely — the layout-quality
    number that says what fraction of a 100 TB table the scanner
    never opens. The report keys by rank-of-min (8-row window), so
    the oracle replays the bucket arithmetic without knowing file
    paths."""
    from etl_script_spark.sources import layout
    from pyspark.sql import Window

    d = _workdir(sf_dir, "fileskip")
    out = f"{d}/events_bucketed"
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    mx = ev.agg(F.max("user_id")).collect()[0][0]  # bounded scalar
    lo = (mx + 1) // 4
    hi = (mx + 1) // 4 + (mx + 1) // 8
    (
        ev.withColumn("bucket", F.expr(f"(user_id * 8) DIV {mx + 1}"))
        .repartition(8, F.col("bucket"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out)
    )
    stats = layout.file_skipping_stats(spark, out, "user_id", lo, hi)
    w = Window.orderBy("min_key")  # 8 rows — bounded window
    return stats.select(
        F.row_number().over(w).cast("long").alias("file_rank"),
        F.col("rows").alias("n_rows"),
        "min_key",
        "max_key",
        "skippable",
    )


@register(
    "s26_avro_roundtrip",
    """
    SELECT s_suppkey,
           s_name,
           CAST(ROUND(s_acctbal * 100) AS BIGINT) AS acctbal_cents,
           CASE WHEN s_nationkey % 5 = 0 THEN NULL
                ELSE s_nationkey END AS opt_nation
    FROM supplier
    """,
    ("S2", "X-sources"),
)
def s26_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro object-container round-trip with ZERO optional deps: the
    supplier dim written into 4 avro shards (deflate codec) by the
    from-scratch pure-Python codec (sources/avro_io.py — the
    spark-avro connector jar is absent from this container, same
    posture as the from-scratch BIFF8 engine), read back DISTRIBUTED
    via binaryFile + Arrow-batched mapInPandas (one task per shard).
    A union[null, long] column proves branch-index decoding."""
    import pyspark.sql.types as T

    from etl_script_spark.sources import avro_io

    d = _workdir(sf_dir, "s26")
    rows = sorted(
        t(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
        .collect(),
        key=lambda r: r["s_suppkey"],
    )  # bounded dim — driver-side fixture build is the point
    schema = {
        "type": "record",
        "name": "supplier",
        "fields": [
            {"name": "s_suppkey", "type": "long"},
            {"name": "s_name", "type": "string"},
            {"name": "acctbal_cents", "type": "long"},
            {"name": "opt_nation", "type": ["null", "long"]},
        ],
    }
    recs = [
        {
            "s_suppkey": r["s_suppkey"],
            "s_name": r["s_name"],
            "acctbal_cents": int(round(r["s_acctbal"] * 100)),
            "opt_nation": (
                None if r["s_nationkey"] % 5 == 0 else r["s_nationkey"]
            ),
        }
        for r in rows
    ]
    n_shards = 4
    for i in range(n_shards):
        avro_io.write_avro(
            f"{d}/supplier_{i}.avro",
            schema,
            recs[i::n_shards],
            codec="deflate",
        )
    out_schema = T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("acctbal_cents", T.LongType()),
            T.StructField("opt_nation", T.LongType()),
        ]
    )
    return avro_io.read_avro_distributed(
        spark, f"{d}/supplier_*.avro", out_schema
    )


@register(
    "lake_time_travel_read",
    """
    SELECT r_regionkey AS k, r_name AS name, 1 AS since_version
    FROM region
    UNION ALL
    SELECT n_nationkey AS k, n_name AS name, 2 AS since_version
    FROM nation
    """,
    ("X-lakehouse", "J3"),
)
def lake_time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot isolation + time travel on the from-scratch lakehouse
    commit log (sources/lakelog.py): v1 commits region, v2 APPENDS
    nation, v3 OVERWRITES everything with a decoy — and the query
    time-travels back to v2, whose log replay must see exactly
    v1 ∪ v2 and nothing of v3. Readers never list the data directory,
    so half-staged files are invisible by construction; writers CAS
    their commit with O_CREAT|O_EXCL (the local stand-in for a
    conditional PUT). The response to the reference's single-writer
    transaction (ImportDbdFinancial.php:209-212) at table scale."""
    import shutil

    from etl_script_spark.sources import lakelog

    d = _workdir(sf_dir, "lake")
    table = f"{d}/dim_table"
    shutil.rmtree(table, ignore_errors=True)
    v1 = t(spark, sf_dir, "region").select(
        F.col("r_regionkey").cast("long").alias("k"),
        F.col("r_name").alias("name"),
        F.lit(1).alias("since_version"),
    )
    lakelog.write_table(v1, table, mode="append")
    v2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k"),
        F.col("n_name").alias("name"),
        F.lit(2).alias("since_version"),
    )
    lakelog.write_table(v2, table, mode="append")
    decoy = spark.range(3).select(
        F.col("id").alias("k"),
        F.lit("DECOY").alias("name"),
        F.lit(3).alias("since_version"),
    )
    lakelog.write_table(decoy, table, mode="overwrite")
    return lakelog.read_table(spark, table, version=2)


@register(
    "lake_upsert_txn",
    """
    WITH a AS (
      SELECT o_custkey AS k, COUNT(*) AS cnt, 1 AS ver
      FROM orders WHERE o_orderdate < DATE '1995-01-01' GROUP BY o_custkey
    ),
    b AS (
      SELECT o_custkey AS k, COUNT(*) AS cnt, 2 AS ver
      FROM orders WHERE o_orderdate >= DATE '1995-01-01' GROUP BY o_custkey
    )
    SELECT k, cnt, ver FROM a WHERE k NOT IN (SELECT k FROM b)
    UNION ALL
    SELECT k, cnt, ver FROM b
    """,
    ("X-lakehouse", "J6"),
)
def lake_upsert_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactional keyed upsert through the lakehouse commit log
    (lakelog.upsert_table): v1 commits per-customer pre-1995 order
    counts, then an upsert batch of 1995+ counts merges in
    last-write-wins and commits as an overwrite CASed directly after
    the snapshot it read — the reference's updateOrCreate
    (ImportDbdFinancial.php:209-212) with table-level transactions
    instead of a DB row lock. The read proves the merge: customers
    with post-1995 orders carry ver 2, the rest keep their v1 row,
    and the pre-upsert snapshot stays readable (time travel)."""
    import shutil

    from etl_script_spark.sources import lakelog

    d = _workdir(sf_dir, "lake_upsert")
    table = f"{d}/cust_counts"
    shutil.rmtree(table, ignore_errors=True)
    orders = t(spark, sf_dir, "orders")
    a = (
        orders.filter(F.col("o_orderdate") < F.lit("1995-01-01").cast("date"))
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("ver", F.lit(1))
    )
    lakelog.write_table(a, table, mode="append")
    b = (
        orders.filter(F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("ver", F.lit(2))
    )
    v = lakelog.upsert_table(spark, b, table, keys=["k"])
    assert v == 2
    # snapshot isolation held: version 1 still replays pre-upsert
    assert lakelog.read_table(spark, table, version=1).columns == [
        "k", "cnt", "ver",
    ]
    return lakelog.read_table(spark, table)


@register(
    "s26_avro_decimal_date",
    """
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)
             AS price_cents,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS odate,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL
                ELSE CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)
           END AS opt_cents
    FROM orders WHERE o_orderkey % 997 = 0
    """,
    ("S2", "X-sources"),
)
def s26_avro_decimal_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro logical types round-trip (Avro 1.11 spec §Logical Types):
    money as bytes-backed decimal(15,2) — two's-complement unscaled
    int, so DecimalType(15,2) survives EXACTLY, never through a
    double — and int-backed date (days since epoch), plus a
    union[null, decimal] branch. A deterministic 1-in-997 orders
    slice writes to 3 shards and reads back distributed; the oracle
    states the same rows straight off the parquet view. For the
    comparison, the date surfaces as its ISO string and the decimals
    as cents BIGINT — pandas-conversion-stable on both engines
    (DuckDB's .df() floats DECIMAL columns, so '6685.40' would
    compare against float '6685.4') — while the Spark path decodes
    the real logical types end to end (exactness pinned by the codec
    unit tests)."""
    from decimal import Decimal

    from etl_script_spark.sources import avro_io

    d = _workdir(sf_dir, "s26ld")
    rows = sorted(
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 997 == 0)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .collect(),
        key=lambda r: r["o_orderkey"],
    )  # ~1/997 of orders — a bounded, deterministic fixture slice
    dec_t = {
        "type": "bytes", "logicalType": "decimal",
        "precision": 15, "scale": 2,
    }
    schema = {
        "type": "record",
        "name": "order_money",
        "fields": [
            {"name": "o_orderkey", "type": "long"},
            {"name": "price", "type": dec_t},
            {"name": "odate", "type": {"type": "int", "logicalType": "date"}},
            {"name": "opt_price", "type": ["null", dec_t]},
        ],
    }
    recs = [
        {
            "o_orderkey": r["o_orderkey"],
            "price": Decimal(str(r["o_totalprice"])).quantize(
                Decimal("0.01")
            ),
            "odate": r["o_orderdate"],
            "opt_price": (
                None
                if r["o_orderkey"] % 3 == 0
                else Decimal(str(r["o_totalprice"])).quantize(
                    Decimal("0.01")
                )
            ),
        }
        for r in rows
    ]
    n_shards = 3
    for i in range(n_shards):
        avro_io.write_avro(
            f"{d}/orders_{i}.avro", schema, recs[i::n_shards],
            codec="deflate",
        )
    decoded = avro_io.read_avro_distributed(
        spark,
        f"{d}/orders_*.avro",
        "o_orderkey long, price decimal(15,2), odate date,"
        " opt_price decimal(15,2)",
    )
    return decoded.select(
        "o_orderkey",
        (F.col("price") * 100).cast("long").alias("price_cents"),
        F.date_format("odate", "yyyy-MM-dd").alias("odate"),
        (F.col("opt_price") * 100).cast("long").alias("opt_cents"),
    )
