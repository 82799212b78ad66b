"""End-to-end PIPELINE queries under the oracle (SURVEY.md §3): a
deterministic dirty fixture is synthesized from driver tables, the
full pipeline runs (clean → reshape → pivot / clean → type), and the
DuckDB twin states the expected result from first principles — the
whole composition is hash-checked, not just its operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_script_spark.pipelines import dbd_financial, invoice_report, sale_report
from etl_script_spark.plans.catalog import register, t

_LABELS = list(dbd_financial.TH_TO_EN_BALANCE)  # 5 Thai item labels
_ITEMS = dbd_financial.BALANCE_ITEMS


@register(
    "pipeline_dbd_financial_e2e",
    f"""
    WITH base AS (
      SELECT lpad(CAST(c_custkey AS VARCHAR), 13, '0') AS tax_id,
             i AS item_idx,
             CASE WHEN (c_custkey + i) % 2 = 0
                  THEN  (c_custkey * 10 + i) + 0.25
                  ELSE -((c_custkey * 10 + i) + 0.25) END AS amt2566,
             CAST(c_custkey % 100 AS DOUBLE) + i AS amt2567
      FROM customer CROSS JOIN (SELECT UNNEST(generate_series(0, 4)) AS i)
    )
    SELECT tax_id, fiscal_year,
           {", ".join(
             f"MAX(CASE WHEN item_idx = {k} THEN amt END) AS {item}"
             for k, item in enumerate(_ITEMS)
           )}
    FROM (
      SELECT tax_id, 2023 AS fiscal_year, item_idx, amt2566 AS amt FROM base
      UNION ALL
      SELECT tax_id, 2024, item_idx, amt2567 FROM base
    )
    GROUP BY tax_id, fiscal_year
    """,
    ("R1", "R2", "F1", "F10", "F26", "P11", "pipeline-e2e"),
)
def pipeline_dbd_financial_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.1 end-to-end: per-company wide BE statements with accounting
    dirt (thousands commas, parenthesized negatives, a noise row per
    company) → silver_from_wide → gold_pivot. The oracle rebuilds the
    expected gold table arithmetically — every cleaning/reshape step
    must agree."""
    c = t(spark, sf_dir, "customer")
    labels = F.array(*[F.lit(x) for x in _LABELS])
    rows = c.select(
        "c_custkey",
        F.concat(
            F.lpad(F.col("c_custkey").cast("string"), 13, "0"),
            F.lit("_balance.xlsx"),
        ).alias("_file"),
        F.explode(F.sequence(F.lit(0), F.lit(len(_LABELS) - 1))).alias("i"),
    )
    v66 = (F.col("c_custkey") * 10 + F.col("i")).cast("long")
    # '12,345.25' grouping + parens for the negative half (F10 dirt)
    body66 = F.concat(
        F.format_number(v66, 0), F.lit(".25")
    )
    amt66 = F.when(
        (F.col("c_custkey") + F.col("i")) % 2 == 0, body66
    ).otherwise(F.concat(F.lit("("), body66, F.lit(")")))
    amt67 = ((F.col("c_custkey") % 100) + F.col("i")).cast("string")
    wide = rows.select(
        F.element_at(labels, F.col("i") + 1).alias("item_th"),
        amt66.alias("2566"),
        F.lit(None).cast("string").alias("pct_2566"),
        amt67.alias("2567"),
        F.lit(None).cast("string").alias("pct_2567"),
        "_file",
    )
    noise = c.select(
        F.lit("หน่วย : บาท").alias("item_th"),
        F.lit("").alias("2566"),
        F.lit("").alias("pct_2566"),
        F.lit("").alias("2567"),
        F.lit("").alias("pct_2567"),
        F.concat(
            F.lpad(F.col("c_custkey").cast("string"), 13, "0"),
            F.lit("_balance.xlsx"),
        ).alias("_file"),
    )
    silver = dbd_financial.silver_from_wide(
        wide.unionByName(noise),
        {"2566": "pct_2566", "2567": "pct_2567"},
        dbd_financial.TH_TO_EN_BALANCE,
    )
    return dbd_financial.gold_pivot(silver, _ITEMS)


@register(
    "pipeline_invoice_clean_e2e",
    """
    SELECT CAST(o_orderkey AS VARCHAR) AS no,
           'IV9' || lpad(CAST(o_orderkey AS VARCHAR), 7, '0') AS invoice_no,
           strftime(o_orderdate, '%Y-%m-%d') AS invoice_date_str,
           lpad(CAST(o_custkey AS VARCHAR), 10, '0') AS po_no,
           CAST(o_orderkey % 1000 AS DOUBLE)
             + CAST(o_orderkey % 100 AS DOUBLE) / 100 AS amount
    FROM orders
    """,
    ("F18", "F1", "F3", "F20", "F9", "P2", "pipeline-e2e"),
)
def pipeline_invoice_clean_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.2 end-to-end: dirty invoice records (lookalike-damaged
    numbers, BE dates, PO-prefixed references, comma amounts) through
    clean_invoice_records; the oracle states the expected clean row
    for every order."""
    o = t(spark, sf_dir, "orders")
    key = F.col("o_orderkey").cast("string")
    body = F.concat(
        (F.col("o_orderkey") % 1000).cast("string"),
        F.lit("."),
        F.lpad((F.col("o_orderkey") % 100).cast("string"), 2, "0"),
    )
    raw = o.select(
        key.alias("No"),
        # 'iv9' prefix: tail starts with a real digit so the greedy
        # alpha prefix stops at 'iv'; lookalike damage (0→o, 1→l) in
        # the padded tail repairs back (F18)
        F.concat(
            F.lit("iv9"),
            F.translate(F.lpad(key, 7, "0"), "01", "ol"),
        ).alias("Invoice No."),
        F.col("o_custkey").cast("string").alias("Supplier Code"),
        F.lit("Some  Name").alias("Supplier Name"),
        # BE day-first date string (F1+F3); Feb 29 stays ISO/CE — a BE
        # leap-day string like 29/02/2539 names a nonexistent date and
        # the reference's cascade nulls it too (year+543 is rarely
        # also a leap year), so it exercises the cascade's 2nd format
        F.when(
            (F.month("o_orderdate") == 2) & (F.dayofmonth("o_orderdate") == 29),
            F.date_format("o_orderdate", "yyyy-MM-dd"),
        )
        .otherwise(
            F.concat(
                F.date_format("o_orderdate", "dd/MM/"),
                (F.year("o_orderdate") + 543).cast("string"),
            )
        )
        .alias("Invoice Date"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias(
            "Invoice Received Date"
        ),
        F.concat(
            F.lit("PO:"), F.lpad(F.col("o_custkey").cast("string"), 10, "0")
        ).alias("Related Document"),
        body.alias("Amount"),
        F.lit("Open").alias("Status"),
    )
    cleaned = invoice_report.clean_invoice_records(raw)
    # invoice tail ol→01 restores the key digits; prefix 'iv' uppercases
    return cleaned.select(
        F.col("no"),
        F.col("invoice_no"),
        F.col("invoice_date").cast("string").alias("invoice_date_str"),
        F.col("po_no"),
        F.col("amount"),
    )


@register(
    "pipeline_sale_report_e2e",
    """
    SELECT 'DOC' || CAST(o_orderkey AS VARCHAR) AS doc_no,
           'IV' || CAST(o_orderkey AS VARCHAR) AS invoice_no,
           strftime(o_orderdate, '%Y-%m-%d') AS invoice_date,
           CAST(NULL AS VARCHAR) AS po_no,
           CAST(o_orderkey AS VARCHAR) AS cn_ref_doc,
           CAST(NULL AS VARCHAR) AS assignment,
           CAST(FLOOR((o_orderkey + 1000000) / 1000) * 1000
                + (o_orderkey + 1000000) % 1000 AS DOUBLE)
             + CAST(o_orderkey % 100 AS DOUBLE) / 100 AS amount,
           0.0 AS vat, 0.0 AS net_amount,
           '2025-03-01' AS start_round_date,
           '2025-03-15' AS end_round_date,
           'SUPP' || CAST(o_custkey AS VARCHAR) AS supplier_name,
           CAST(o_custkey AS VARCHAR) AS supplier_code
    FROM orders
    UNION ALL
    SELECT 'DOCX' || CAST(o_orderkey AS VARCHAR), '',
           CAST(NULL AS VARCHAR), NULL, NULL, NULL,
           0.0, 0.0, 0.0, '2025-03-01', '2025-03-15',
           'SUPP' || CAST(o_custkey AS VARCHAR), CAST(o_custkey AS VARCHAR)
    FROM orders
    """,
    ("S7", "S8", "F6", "F7", "F28", "F29", "P6", "pipeline-e2e"),
)
def pipeline_sale_report_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7/S8 end-to-end: one synthetic LLM-OCR HTML document per order
    (header table with a ragged second row, a total row that must be
    dropped, an empty-ลำดับที่ row that must be dropped, Thai-month
    round dates and a Vendor header), through the full HTML→records→
    metadata-enrichment→DB-key pipeline. The oracle states every
    expected DB row from first principles."""
    # The sf0.1 orders file is one split → the whole regex-parse
    # narrow stage would run on one core (small-file trap). A real
    # 100 TB scan arrives already split; locally we fan out the tiny
    # pre-HTML rows (not the built documents) across all cores.
    o = t(spark, sf_dir, "orders").repartition(
        spark.sparkContext.defaultParallelism
    )
    key = F.col("o_orderkey").cast("string")
    v = F.col("o_orderkey") + 1000000
    amount_str = F.concat(
        F.floor(v / 1000).cast("long").cast("string"),
        F.lit(","),
        F.lpad((v % 1000).cast("string"), 3, "0"),
        F.lit("."),
        F.lpad((F.col("o_orderkey") % 100).cast("string"), 2, "0"),
    )
    be_date = F.concat(
        F.date_format("o_orderdate", "dd.MM."),
        (F.year("o_orderdate") + 543).cast("string"),
    )
    td = lambda c: F.concat(F.lit("<td>"), c, F.lit("</td>"))  # noqa: E731
    html = F.concat(
        F.lit(
            "<html><p>รายงานการขายสินค้า - แยกตาม Invoice</p>"
            "<p>รอบวันที่ 1 - 15 มีนาคม 2568</p><p>#Vendor "
        ),
        F.col("o_custkey").cast("string"),
        F.lit(" / SUPP"),
        F.col("o_custkey").cast("string"),
        F.lit(
            " (1)</p><table>"
            "<tr><th>ลำดับที่</th><th>เลขที่เอกสาร</th><th>Invoice no.</th>"
            "<th>วันที่เอกสาร</th><th>จำนวนเงิน</th><th>CN. Ref. Doc.</th></tr>"
            "<tr>"
        ),
        td(F.lit("1")),
        td(F.concat(F.lit("DOC"), key)),
        td(F.concat(F.lit("IV"), key)),
        td(be_date),
        td(amount_str),
        td(F.concat(key, F.lit(".0"))),
        # ragged second row: trailing cells missing, must pad to width
        F.lit("</tr><tr>"),
        td(F.lit("2")),
        td(F.concat(F.lit("DOCX"), key)),
        # empty-ลำดับที่ row: dropped by the sequence filter
        F.lit("</tr><tr><td></td><td>ZZZ</td></tr>"),
        # total row: dropped by the P6 filter
        F.lit("<tr><td>Total</td><td></td><td></td><td></td><td>999</td><td></td></tr>"
              "</table></html>"),
    )
    docs = o.select(F.col("o_orderkey").alias("doc_key"), html.alias("html"))
    records = sale_report.sale_invoice_records(docs, "html", ["doc_key"])
    out = sale_report.sale_invoice_db_rows(records)
    # dates as ISO strings: DuckDB DATE surfaces as pandas Timestamp
    # in the comparator, Spark DATE as datetime.date — strings align
    return out.select(
        *[
            F.col(c).cast("string").alias(c)
            if c in ("invoice_date", "start_round_date", "end_round_date")
            else F.col(c)
            for c in out.columns
        ]
    )


@register(
    "pipeline_remittance_e2e",
    """
    WITH base AS (
      SELECT o_orderkey,
             (o_orderkey % 100000) + 0.25 AS a0,
             -((o_orderkey % 997) + 0.50) AS a1
      FROM orders
    )
    SELECT o_orderkey AS page_number,
           a0 + a1 AS computed_total,
           a0 + a1 AS expected_total,
           0.0 AS difference,
           TRUE AS ok
    FROM base
    """,
    ("F31", "F19", "F10", "D1", "A1"),
)
def pipeline_remittance_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remittance OCR-lines lifecycle end-to-end: page text (strict and
    no-branch transaction lines, comma-grouped accounting amounts with
    paren negatives, printed GRAND TOTAL) → fixed-format regex cascade
    → branch/token repairs → accounting parse → composite-key dedup →
    per-page grand-total reconciliation. Amounts are exact 2-decimal
    doubles, so recomputed and printed totals agree bitwise and the
    oracle states the reconciliation from first principles.

    Ref: pdf_ocr_rm_to_json.py:257-445 (line tiers, totals kept
    alongside transactions, reconciliation).
    """
    from etl_script_spark.pipelines import remittance

    o = t(spark, sf_dir, "orders").select("o_orderkey")
    k = F.col("o_orderkey")
    a0 = (k % 100000).cast("double") + 0.25
    a1 = -((k % 997).cast("double") + 0.50)
    line0 = F.concat(
        F.lit("01/02/2024 BR01 IV DOC"), k.cast("string"),
        F.lit(" REF"), k.cast("string"),
        F.lit(" "), F.format_number(a0, 2),
    )
    line1 = F.concat(
        F.lit("03/04/2024 CN DOC"), (k + 1).cast("string"),
        F.lit(" REF"), (k + 1).cast("string"),
        F.lit(" ("), F.format_number(-a1, 2), F.lit(")"),
    )
    total_line = F.concat(
        F.lit("GRAND TOTAL Amount "), F.format_number(a0 + a1, 2)
    )
    noise = F.lit("หมายเหตุ: ไม่ใช่รายการ ***")
    pages = o.select(
        k.alias("page_number"),
        F.concat_ws("\n", line0, line1, noise, total_line).alias("text"),
    )
    return remittance.reconcile(pages)


# ---------------------------------------------------------------------------
# Round-6 curation composition: DSIR select -> substring cut -> shard manifest
# ---------------------------------------------------------------------------

_R6_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_R6_BP = "bp0 bp1 bp2 bp3 bp4 bp5 bp6 bp7 bp8 bp9"


@register(
    "pipeline_r6_curation_e2e",
    f"""
    WITH d0 AS (
      SELECT doc_id, lang,
             CASE WHEN doc_id % 7 = 0 THEN text || ' {_R6_BP}'
                  ELSE text END AS text
      FROM documents
    ),
    -- stage 1: DSIR select (top-30 docs toward lang='en')
    db AS (
      SELECT doc_id, is_t,
             ('0x' || substr(md5('dsir' || gram), 1, 8))::BIGINT % 4096
               AS bucket
      FROM (
        SELECT doc_id, COALESCE(lang = 'en', FALSE) AS is_t,
               unnest(grams) AS gram FROM (
          SELECT doc_id, lang,
                 list_concat(ws, CASE WHEN len(ws) >= 2
                   THEN [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]
                   ELSE [] END) AS grams
          FROM (SELECT doc_id, lang,
                       list_filter(string_split({_R6_NORM}, ' '),
                                   w -> w <> '') AS ws
                FROM d0)
        )
      )
    ),
    hist AS (SELECT bucket, COUNT(*) AS rc,
                    COUNT(*) FILTER (WHERE is_t) AS tc
             FROM db GROUP BY bucket),
    tot AS (SELECT SUM(rc) AS rt, SUM(tc) AS tt FROM hist),
    tbl AS (SELECT bucket,
                   CAST(ROUND((ln((tc + 0.5) / (tt + 2048.0))
                             - ln((rc + 0.5) / (rt + 2048.0)))
                              * 1000000.0) AS BIGINT) AS lr_q
            FROM hist CROSS JOIN tot),
    sel AS (
      SELECT doc_id FROM (
        SELECT doc_id, CAST(SUM(lr_q) AS BIGINT) AS weight_q
        FROM db JOIN tbl USING (bucket) GROUP BY doc_id
      ) ORDER BY weight_q DESC, doc_id ASC LIMIT 30
    ),
    -- stage 2: exact-substring cut WITHIN the selected set
    b2 AS (
      SELECT d0.doc_id,
             list_filter(string_split({_R6_NORM}, ' '), w -> w <> '') AS ws
      FROM d0 JOIN sel USING (doc_id)
    ),
    b3 AS (SELECT doc_id, ws, len(ws) AS m FROM b2 WHERE len(ws) > 0),
    w AS (
      SELECT doc_id, pos,
             md5(array_to_string(ws[pos:pos+7], ' ')) AS g
      FROM (SELECT doc_id, ws,
                   unnest(CASE WHEN m >= 8 THEN range(1, m - 6)
                          ELSE [] END) AS pos
            FROM b3)
    ),
    owners AS (SELECT g, MIN(doc_id) AS owner FROM w GROUP BY g),
    dup_pos AS (
      SELECT DISTINCT doc_id, tpos FROM (
        SELECT w.doc_id, unnest(range(w.pos, w.pos + 8)) AS tpos
        FROM w JOIN owners USING (g) WHERE owners.owner < w.doc_id
      )
    ),
    toks AS (
      SELECT doc_id, pos AS tpos, ws[pos] AS word
      FROM (SELECT doc_id, ws, unnest(range(1, m + 1)) AS pos FROM b3)
    ),
    kept AS (
      SELECT t.doc_id, t.tpos, t.word
      FROM toks t LEFT JOIN dup_pos p
        ON t.doc_id = p.doc_id AND t.tpos = p.tpos
      WHERE p.doc_id IS NULL
    ),
    cleaned AS (
      SELECT b3.doc_id,
             COALESCE(r.clean_text, '') AS clean_text,
             b3.m - COALESCE(r.n_kept, 0) AS n_removed
      FROM b3 LEFT JOIN (
        SELECT doc_id, string_agg(word, ' ' ORDER BY tpos) AS clean_text,
               COUNT(*) AS n_kept
        FROM kept GROUP BY doc_id
      ) r ON b3.doc_id = r.doc_id
    )
    -- stage 3: shard manifest over the CLEANED text
    SELECT ('0x' || substr(md5('r6' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
             % 4 AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN clean_text = '' THEN 0
                    ELSE len(string_split(clean_text, ' ')) END) AS BIGINT)
             AS n_tokens,
           CAST(SUM(length(clean_text)) AS BIGINT) AS n_chars,
           CAST(SUM(n_removed) AS BIGINT) AS n_removed
    FROM cleaned
    GROUP BY 1
    """,
    ("LLM-curation", "LLM-dedup"),
)
def pipeline_r6_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6 operators composed end-to-end and hash-checked as ONE
    chain: (1) DSIR importance selection of the 30 most target-like
    documents (lang='en'), (2) exact-substring span cutting within
    the selected set (shared boilerplate planted on every 7th doc so
    real cuts occur), (3) the md5-sharded export manifest aggregated
    over the CLEANED text, with per-shard removed-token accounting.
    The oracle replays all three stages in one statement — the
    composition contract, not just the operators (same rationale as
    pipeline_curation_e2e). Scale shape: each stage's own analysis
    holds unchanged (bounded DSIR broadcast; merge-hinted span
    rejoin; manifest is one aggregation)."""
    from etl_script_spark.operators import dedup as dd
    from etl_script_spark.operators import dsir
    from etl_script_spark.operators.export import shard_id

    d0 = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" " + _R6_BP)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    wts = dsir.dsir_weights(
        d0, "doc_id", "text",
        F.coalesce(F.col("lang") == "en", F.lit(False)), n_buckets=4096,
    )
    sel = dsir.dsir_select(wts, "doc_id", 30).select("doc_id")
    picked = d0.join(sel, "doc_id").select("doc_id", "text")
    cleaned = dd.remove_duplicate_spans(picked, "text", "doc_id", n=8)
    toks = F.when(F.col("clean_text") == "", F.lit(0)).otherwise(
        F.size(F.split(F.col("clean_text"), " "))
    )
    return (
        cleaned.select(
            shard_id(F.col("doc_id"), 4, seed="r6").alias("shard"),
            toks.alias("__t"),
            F.length("clean_text").alias("__c"),
            "n_removed",
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__t").cast("long").alias("n_tokens"),
            F.sum("__c").cast("long").alias("n_chars"),
            F.sum("n_removed").cast("long").alias("n_removed"),
        )
    )


@register(
    "pipeline_r7_curation_e2e",
    f"""
    WITH ws AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nm,
             list_filter(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
               w -> w != '') AS ws
      FROM documents
    ),
    gr AS (
      SELECT doc_id, len(gs) AS n_g, unnest(gs) AS g FROM (
        SELECT doc_id, list_distinct(
                 [('0x' || substr(md5(array_to_string(ws[i:i+2], ' ')),
                                  1, 8))::BIGINT
                  for i in range(1, len(ws) - 1)]) AS gs
        FROM ws WHERE len(ws) >= 3
      )
    ),
    cont AS (
      SELECT DISTINCT contained FROM (
        SELECT a.doc_id AS contained,
               (COUNT(*) * 1000000) // any_value(a.n_g) AS cppm
        FROM gr a JOIN gr b ON a.g = b.g AND b.doc_id < a.doc_id
        GROUP BY a.doc_id, b.doc_id
      ) WHERE cppm >= 900000
    ),
    surv1 AS (
      SELECT w.* FROM ws w
      WHERE w.doc_id NOT IN (SELECT contained FROM cont)
    ),
    refg AS (SELECT DISTINCT g FROM gr WHERE doc_id % 7 = 0),
    nov AS (
      SELECT gr.doc_id, COUNT(*) AS n_grams,
             CAST(SUM(CASE WHEN r.g IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel
      FROM gr LEFT JOIN refg r ON gr.g = r.g
      WHERE gr.doc_id IN (SELECT doc_id FROM surv1)
      GROUP BY 1
    ),
    surv2 AS (
      SELECT s.* FROM surv1 s LEFT JOIN nov ON nov.doc_id = s.doc_id
      WHERE nov.doc_id IS NULL
         OR (nov.n_novel * 1000000) // nov.n_grams >= 100000
    )
    SELECT split,
           COUNT(*) AS n_docs,
           CAST(SUM(len(ws)) AS BIGINT) AS n_tokens,
           CAST(SUM(('0x' || substr(md5(nm), 1, 8))::BIGINT) AS BIGINT)
             AS membership_checksum
    FROM (
      SELECT ws, nm,
             CASE WHEN b < 80 THEN 'train'
                  WHEN b < 90 THEN 'val' ELSE 'test' END AS split
      FROM (
        SELECT ws, nm,
               ('0x' || substr(md5('split' || md5(nm)), 1, 8))::BIGINT % 100
                 AS b
        FROM surv2
      )
    ) GROUP BY split
    """,
    ("LLM-curation", "pipeline"),
)
def pipeline_r7_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-7 curation pipeline end-to-end, composing this round's
    operators: (1) asymmetric-containment dedup — drop every document
    >= 90% n-gram-contained in a LOWER-id document (subsumed quotes /
    exact dups; operators/dedup.py:containment_pairs applied, not
    just reported); (2) novelty gate — survivors keep >= 10% novel
    trigrams vs the reference slice (doc_id%7;
    winnow.ngram_novelty), dropping what the last snapshot already
    had; (3) leakage-safe group split (splits.group_aware_split);
    (4) per-split audit aggregate with an order-free membership
    checksum (sum of content-hash ints), so the driver hash pins the
    exact surviving document SET through the whole chain, not just
    counts. Stage shapes are the individual operators' shapes; the
    composition adds two anti-join/semi-join boundaries, both keyed
    on doc id."""
    from etl_script_spark.operators import dedup as dd
    from etl_script_spark.operators import splits, winnow
    from etl_script_spark.operators.dedup import normalize_text

    d = t(spark, sf_dir, "documents")
    pairs0 = dd.containment_pairs(
        d, "text", "doc_id", n=3, threshold_ppm=900000
    )
    # re-home the eager-persisted pair table (r10) and release it so
    # the sweep leaves no cache-manager entry; downstream reads the
    # checkpointed blocks
    pairs = pairs0.localCheckpoint(eager=True)
    pairs0.unpersist()
    dropped = (
        pairs.filter(F.col("container_id") < F.col("contained_id"))
        .select(F.col("contained_id").alias("doc_id"))
        .distinct()
    )
    surv1 = d.join(dropped, "doc_id", "left_anti")
    nov = winnow.ngram_novelty(
        surv1, d.filter(F.col("doc_id") % 7 == 0), "text", "doc_id", n=3
    )
    keep = nov.filter(F.col("novelty_ppm") >= 100000).select(
        F.col("id").alias("doc_id")
    )
    surv2 = surv1.join(keep, "doc_id", "left_semi")
    split = splits.group_aware_split(surv2, "doc_id", text_col="text")
    nm = normalize_text(F.col("text"))
    ws = F.filter(F.split(nm, " "), lambda w: w != "")
    return (
        split.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(ws)).cast("long").alias("n_tokens"),
            F.sum(
                F.conv(F.substring(F.md5(nm), 1, 8), 16, 10).cast("long")
            ).cast("long").alias("membership_checksum"),
        )
    )


@register(
    "pipeline_r7_analytics_report",
    """
    WITH ben AS (
      SELECT CAST(SUM(abs(CAST((n * 1000000) // tt AS BIGINT)
                 - ([301030, 176091, 124939, 96910, 79181, 66947,
                     57992, 51153, 45757])[digit])) AS BIGINT) AS v
      FROM (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(COUNT(*)) OVER () AS tt
        FROM (
          SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100)
                     AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
          FROM orders
          WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) > 0
        ) GROUP BY digit
      )
    ),
    chi AS (
      SELECT CAST(SUM(((obs * 1000 - (rt * ct * 1000) // n)
                       * (obs * 1000 - (rt * ct * 1000) // n))
                      // greatest((rt * ct * 1000) // n, 1)) AS BIGINT)
               AS v
      FROM (
        SELECT obs,
               SUM(obs) OVER (PARTITION BY row_val) AS rt,
               SUM(obs) OVER (PARTITION BY col_val) AS ct,
               SUM(obs) OVER () AS n
        FROM (
          SELECT l_returnflag AS row_val, l_linestatus AS col_val,
                 CAST(COUNT(*) AS BIGINT) AS obs
          FROM lineitem GROUP BY 1, 2
        )
      )
    ),
    gin AS (
      SELECT CAST(MAX(CASE WHEN n * total = 0 THEN NULL
                  ELSE CAST(((w2 - (n + 1) * total) * 1000)
                            // (n * total) AS BIGINT) END) AS BIGINT)
               AS v
      FROM (
        SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS BIGINT) AS total,
               CAST(SUM(2 * i * v) AS BIGINT) AS w2
        FROM (
          SELECT c_nationkey,
                 CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000 AS v,
                 ROW_NUMBER() OVER (PARTITION BY c_nationkey
                     ORDER BY CAST(ROUND(c_acctbal * 100) AS BIGINT)
                              + 100000, c_custkey) AS i
          FROM customer
        ) GROUP BY c_nationkey
      )
    ),
    sea AS (
      SELECT CAST(MAX(CAST((CAST(total AS HUGEINT) * gn * 1000000)
                 // (CAST(n AS HUGEINT) * gs) AS BIGINT)) AS BIGINT)
               AS v
      FROM (
        SELECT n, total, SUM(n) OVER () AS gn, SUM(total) OVER () AS gs
        FROM (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS total
          FROM orders GROUP BY month(o_orderdate)
        )
      )
    )
    SELECT 'benford_total_dev_ppm' AS metric, v FROM ben
    UNION ALL SELECT 'chi2_stat_milli', v FROM chi
    UNION ALL SELECT 'gini_max_milli', v FROM gin
    UNION ALL SELECT 'seasonality_peak_ppm', v FROM sea
    """,
    ("X-statistics", "pipeline"),
)
def pipeline_r7_analytics_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-shot analytics health report composing the round-7 exact
    statistics operators: total Benford deviation of order totals,
    the chi-square statistic for return flag x line status, the most
    concentrated nation's Gini, and the peak seasonal index — four
    independent operator outputs folded to (metric, v) rows and
    unioned. Each leg is the already-verified operator; the pipeline
    pins that their outputs compose without driver round-trips (one
    job, four independent DAG branches)."""
    from etl_script_spark.operators import stats, timeseries
    from etl_script_spark.plans.catalog import cents

    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    c = t(spark, sf_dir, "customer")

    ben = stats.benford_first_digit(
        o.select(cents(F.col("o_totalprice")).alias("v")), "v"
    ).agg(F.sum("dev_ppm").cast("long").alias("v")).select(
        F.lit("benford_total_dev_ppm").alias("metric"), "v"
    )
    chi = stats.chi2_contingency(li, "l_returnflag", "l_linestatus").agg(
        F.sum("chi2_cell_milli").cast("long").alias("v")
    ).select(F.lit("chi2_stat_milli").alias("metric"), "v")
    gin = stats.gini_groups(
        c.select(
            "c_nationkey", "c_custkey",
            (cents(F.col("c_acctbal")) + 100000).alias("v"),
        ),
        ["c_nationkey"], "v", "c_custkey",
    ).agg(F.max("gini_milli").cast("long").alias("v")).select(
        F.lit("gini_max_milli").alias("metric"), "v"
    )
    sea = timeseries.seasonality_index(
        o.select(
            "o_orderdate",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        ),
        "o_orderdate", "v", "month",
    ).agg(F.max("index_ppm").cast("long").alias("v")).select(
        F.lit("seasonality_peak_ppm").alias("metric"), "v"
    )
    return ben.unionByName(chi).unionByName(gin).unionByName(sea)


@register(
    "pipeline_r7_feature_mart_e2e",
    """
    WITH j AS (
      SELECT o_orderkey, c_custkey, c_nationkey, c_mktsegment,
             CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS t
      FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    cat AS (
      SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS cat_n,
             CAST(SUM(t) AS HUGEINT) AS s
      FROM j GROUP BY 1
    ),
    g AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS gn,
             CAST(SUM(t) AS HUGEINT) AS gs
      FROM j
    ),
    enc AS (
      SELECT o_orderkey, j.c_nationkey, j.c_mktsegment, j.t,
             CAST(((s - t) * 1000000 + 10 * ((gs * 1000000) // gn))
                  // (cat_n - 1 + 10) AS BIGINT) AS enc_ppm
      FROM j JOIN cat ON j.c_nationkey = cat.c_nationkey CROSS JOIN g
    ),
    hb AS (
      SELECT *,
             CAST(('0x' || substr(md5('fh' || '|'
                    || COALESCE(CAST(c_nationkey AS VARCHAR), chr(0))
                    || '|'
                    || COALESCE(c_mktsegment, chr(0))), 1, 8))::BIGINT
                  % 32 AS INTEGER) AS bucket
      FROM enc
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(t) AS BIGINT) AS n_urgent,
           CAST(SUM(CAST(enc_ppm AS HUGEINT)) AS BIGINT) AS enc_ppm_sum,
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations
    FROM hb GROUP BY 1
    """,
    ("X-pipeline", "X-features"),
)
def pipeline_r7_feature_mart_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-mart composition of the round-7 encoders: orders
    enrich with customer nation/segment, leave-one-out target-encode
    the nation against the urgent flag (leak-free, exact integer),
    fold (nation, segment) through the 32-bucket hashing trick, and
    publish the per-bucket mart (occupancy, label rate, encoding
    mass, nation mix). Every stage is a round-7 operator running at
    its documented scale shape — one dim join, one category
    aggregation + join-back, one per-row hash projection, one final
    rollup; the oracle replays the entire chain as one statement."""
    from etl_script_spark.operators import features

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.when(F.col("o_orderpriority").startswith("1"), 1)
        .otherwise(0).alias("t"),
    )
    c = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    j = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        "o_orderkey", "c_nationkey", "c_mktsegment", "t"
    )
    enc = features.target_encode_loo(j, "c_nationkey", "t", smoothing=10)
    hb = features.hashed_feature_buckets(
        enc, ["c_nationkey", "c_mktsegment"], n_buckets=32, seed="fh"
    )
    return hb.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("t").cast("long").alias("n_urgent"),
        F.sum(F.col("enc_ppm").cast("decimal(38,0)"))
        .cast("long").alias("enc_ppm_sum"),
        F.countDistinct("c_nationkey").cast("long").alias("n_nations"),
    )
