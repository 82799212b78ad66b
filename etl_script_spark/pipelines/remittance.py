"""Remittance OCR-lines pipeline (SURVEY.md §3, B6 fixture shape).

page text lines → fixed-format regex cascade (F31) → OCR branch/code
repairs (F19) → accounting-amount parse (F10) → composite-key dedup
across passes/pages (D1) → grand-total reconciliation (A1).

Ref: pdf_ocr_rm_to_json.py:257-445.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_script_spark.functions import numerics, strings
from etl_script_spark.functions.exprs import let
from etl_script_spark.operators import lineparse, quality
from etl_script_spark.operators import merge as merge_ops
from etl_script_spark.operators.partitioning import fan_out

LINE_PATTERNS = [
    # strict: date branch type doc ref amount
    (
        r"^(\d{2}/\d{2}/\d{4})\s+(\S+)\s+(IV|CN)\s+(\S+)\s+(\S+)\s+([\d,().−–—-]+)$",
        ["date", "branch", "doc_type", "doc_no", "ref_no", "amount_raw"],
    ),
    # no-branch fallback → branch defaults '0000' downstream
    (
        r"^(\d{2}/\d{2}/\d{4})\s+(IV|CN)\s+(\S+)\s+(\S+)\s+([\d,().−–—-]+)$",
        ["date", "doc_type", "doc_no", "ref_no", "amount_raw"],
    ),
]

GRAND_TOTAL_RX = r"GRAND TOTAL Amount\s+([\d,().-]+)"


_FC_RX = r"F\s*C[^0-9]*([0-9])[^0-9]*([0-9])?"
_W_RX = r"W[^0-9]*([0-9])[^0-9]*([0-9])[^0-9]*([0-9])"


def repair_branch(c) -> F.Column:
    """F19: OCR branch-code repairs, token-level reference semantics
    (pdf_ocr_rm_to_json.py:126-161): O→0/I→1 then uppercase, strip
    non-alnum noise, '0000' anywhere wins, FC+2 digits → FC##,
    FC+1 digit → FC0#, W+3 digits → W### (all tolerant of interior
    spaces: 'F C 1' → 'FC01', 'W 9 0 1' → 'W901')."""
    # reference order matters: replace UPPERCASE O/I only, THEN
    # uppercase — a lowercase 'o' survives as a letter ('fc1o'→'FC1O')
    s = F.upper(F.translate(c.cast("string"), "OI", "01"))
    s_clean = F.regexp_replace(s, r"[^A-Z0-9 ]", "")
    fc1 = F.regexp_extract(s_clean, _FC_RX, 1)
    fc2 = F.regexp_extract(s_clean, _FC_RX, 2)
    w1 = F.regexp_extract(s_clean, _W_RX, 1)
    w2 = F.regexp_extract(s_clean, _W_RX, 2)
    w3 = F.regexp_extract(s_clean, _W_RX, 3)
    return (
        F.when(s_clean.contains("0000"), F.lit("0000"))
        .when(
            fc1 != "",
            F.when(fc2 != "", F.concat(F.lit("FC"), fc1, fc2)).otherwise(
                F.concat(F.lit("FC0"), fc1)
            ),
        )
        .when(w1 != "", F.concat(F.lit("W"), w1, w2, w3))
        .otherwise(F.trim(s_clean))
    )


def parse_remittance_lines(
    pages: DataFrame, dedup_scope: str = "global"
) -> DataFrame:
    """pages(page_number, text) → typed transaction rows with page
    provenance, deduped on the composite key.

    ``dedup_scope='global'`` (default) removes repeats across pages —
    the multi-OCR-pass D1 semantics. ``'page'`` scopes the key to the
    page, which is what per-page reconciliation needs: a transaction
    legitimately printed on two pages must count into BOTH pages'
    sums, or the second page's reconciliation fails spuriously."""
    lines = lineparse.explode_lines(pages, "text", ["page_number"])
    parsed = lineparse.parse_line_cascade(F.col("line"), LINE_PATTERNS)
    tx = (
        lines.withColumn("p", parsed)
        .filter(F.col("p").isNotNull())
        .select(
            "page_number",
            "line_no",
            F.col("p.date").alias("tx_date"),
            repair_branch(F.coalesce(F.col("p.branch"), F.lit("0000"))).alias(
                "branch"
            ),
            F.col("p.doc_type").alias("doc_type"),
            strings.ocr_repair_tail_digits(F.col("p.doc_no")).alias("doc_no"),
            F.col("p.ref_no").alias("ref_no"),
            numerics.clean_numeric_accounting(F.col("p.amount_raw")).alias("amount"),
        )
    )
    # D1: same transaction seen on multiple passes/pages → keep first
    # in (page, line) stamped order
    tx = tx.withColumn(
        "__ord", F.struct(F.col("page_number"), F.col("line_no"))
    )
    key = ["tx_date", "branch", "doc_type", "doc_no", "ref_no", "amount"]
    if dedup_scope == "page":
        key = ["page_number", *key]
    deduped = merge_ops.dedupe_first(tx, key, order_col="__ord")
    return deduped.drop("__ord")


def extract_grand_totals(pages: DataFrame) -> DataFrame:
    """A1 companion: the upstream-printed grand total per page.

    The raw label extraction passes through an explode(array(..))
    barrier before the numeric clean + null filter: Generate is a
    boundary CollapseProject cannot cross, so the page-text regex
    runs ONCE per row instead of being re-inlined into the Filter and
    every downstream reference (measured 3x on sf0.1 — page text is
    the expensive side here, and codegen CSE does not span the
    Filter/Project operator boundary)."""
    raw = pages.select(
        "page_number",
        F.explode(
            F.array(strings.header_field_extract(F.col("text"), GRAND_TOTAL_RX))
        ).alias("__raw"),
    )
    return raw.select(
        "page_number",
        numerics.clean_numeric_accounting(F.col("__raw")).alias("grand_total"),
    ).filter(F.col("grand_total").isNotNull())


def reconcile(pages: DataFrame, dedup_scope: str = "global") -> DataFrame:
    """A1: recomputed per-page transaction sums vs printed totals.

    Default scope is GLOBAL, matching the reference: a transaction
    repeated across pages is a multi-OCR-pass ghost the printed totals
    do not count, so it must not inflate the second page's sum
    (pdf_ocr_rm_to_json.py:437-445 dedupes before :474 keeps totals).
    Pass ``dedup_scope='page'`` for report formats whose carried-over
    lines ARE counted into each page's printed total."""
    # The regex cascade + token repairs are the CPU cost here, and a
    # pages frame born from a small parquet scan arrives on ONE
    # partition — fan out (hash on page_number so the per-page total
    # aggregate reuses the distribution) before both consumers; the
    # two branches share the identical exchange subplan, so
    # ReuseExchange shuffles once.
    pages = fan_out(pages, "page_number")
    tx = parse_remittance_lines(pages, dedup_scope=dedup_scope)
    totals = extract_grand_totals(pages)
    return quality.reconcile_totals(
        tx, ["page_number"], "amount", totals, "grand_total"
    )


def fix_ocr_o0i1(c) -> F.Column:
    """F19 base rule: O→0, I→1, L stays, lowercase untouched
    (pdf_ocr_rm_to_json.py:118-124; the reference also NFKC-folds —
    OCR doc tokens are ASCII after the fold, so translate suffices)."""
    return F.translate(c.cast("string"), "OI", "01")


def normalize_docref_token(c) -> F.Column:
    """F19: document/reference token normalizer
    (pdf_ocr_rm_to_json.py:164-197): the CONSIGN family first
    (C0NS1GN / CONS1GN-00 → CONSIGN[-NN]), else O→0/I→1 with the
    1V→IV repair."""
    raw = F.trim(c.cast("string"))
    tail2 = F.regexp_extract(raw, r"(\d\d)$", 1)
    consign = F.when(
        tail2 != "", F.concat(F.lit("CONSIGN-"), tail2)
    ).otherwise(F.lit("CONSIGN"))
    t = fix_ocr_o0i1(raw)
    default = F.when(
        F.upper(t).rlike(r"^1V"), F.concat(F.lit("I"), F.substring(t, 2, 1000000))
    ).otherwise(t)
    return F.when(
        raw.rlike(r"(?i)^C[O0]NS[1I]GN(-?\d\d)?$"), consign
    ).otherwise(default)


_TOKEN_CANDID_RX = (
    r"(?i)[A-Za-z0-9]{2,}-?[A-Za-z0-9]{2,}|[A-Za-z]{1,3}\s*-?\s*\d{4,}"
)


def _longest_first(arr) -> F.Column:
    """First-longest element of a string array (Python max(key=len)
    tiebreak: first wins)."""
    return F.aggregate(
        arr,
        F.lit("").cast("string"),
        lambda acc, x: F.when(F.length(x) > F.length(acc), x).otherwise(acc),
    )


def extract_best_token(c) -> F.Column:
    """F19: pull the most plausible doc/ref token out of a noisy OCR
    cell like 'เน?NV68071' (pdf_ocr_rm_to_json.py:199-217): candidate
    regex → first-longest, else any [A-Za-z0-9-]{5,} run → normalize."""
    s = c.cast("string")
    cands = F.regexp_extract_all(s, F.lit(_TOKEN_CANDID_RX), 0)
    fallback = F.regexp_extract_all(s, F.lit(r"[A-Za-z0-9\-]{5,}"), 0)
    best = F.when(F.size(cands) > 0, _longest_first(cands)).otherwise(
        F.when(F.size(fallback) > 0, _longest_first(fallback))
    )
    # let-bound: `best` (two extract-alls + an aggregate) is consumed
    # three times below; unbound, CollapseProject would inline it 3×
    return let(
        best,
        lambda b: F.when(
            b.isNull() | (b == ""), F.lit(None).cast("string")
        ).otherwise(normalize_docref_token(F.regexp_replace(b, r"\s+", ""))),
    )


def repair_ref_from_doc(doc, ref) -> F.Column:
    """F19: reference repaired from the document number when they share
    a prefix (pdf_ocr_rm_to_json.py:219-229): common prefix ≥ 6 → use
    doc; ref ≥ 6 chars and doc startswith(ref) → doc; null on either
    side → the other; else keep ref."""
    d = doc.cast("string")
    r = ref.cast("string")
    common6 = (
        (F.length(d) >= 6)
        & (F.length(r) >= 6)
        & (F.substring(d, 1, 6) == F.substring(r, 1, 6))
    )
    starts = (F.length(r) >= 6) & d.startswith(r)
    return (
        F.when(r.isNull() | (r == ""), d)
        .when(d.isNull() | (d == ""), r)
        .when(common6 | starts, d)
        .otherwise(r)
    )


def normalize_crossdock_pair(doc, ref) -> F.Column:
    """F19: CROSS/DOCK folding (pdf_ocr_rm_to_json.py:231-254) —
    any spelling of crossdock in either token, or the split pair
    CROSS + DOCK, folds to ('CROSS DOCK', 'Crossdock'). Returns
    struct(doc_no, ref_no)."""
    dz = F.upper(F.regexp_replace(F.coalesce(doc.cast("string"), F.lit("")), r"\s+", ""))
    rz = F.upper(F.regexp_replace(F.coalesce(ref.cast("string"), F.lit("")), r"\s+", ""))
    is_cd = lambda z: z.isin("CROSSDOCK", "CROSS-DOCK")  # noqa: E731
    pairwise = (
        ((dz == "CROSS") & (rz == "DOCK"))
        | ((dz == "DOCK") & (rz == "CROSS"))
        | (dz.isin("CROSS", "DOCK") & (rz == ""))
        | (rz.isin("CROSS", "DOCK") & (dz == ""))
    )
    folded = F.struct(
        F.lit("CROSS DOCK").alias("doc_no"), F.lit("Crossdock").alias("ref_no")
    )
    keep = F.struct(
        F.trim(F.coalesce(doc.cast("string"), F.lit(""))).alias("doc_no"),
        F.trim(F.coalesce(ref.cast("string"), F.lit(""))).alias("ref_no"),
    )
    return F.when(is_cd(dz) | is_cd(rz) | pairwise, folded).otherwise(keep)
