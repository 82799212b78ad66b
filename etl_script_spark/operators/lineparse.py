"""Fixed-format text-line parsing (SURVEY.md §2.3 F27/F31/F32).

The reference parses OCR page text line-by-line with an ordered regex
cascade (pdf_ocr_rm_to_json.py:257-283,296-434) and merges records
that span two physical lines (pdf_ocr_rm_report_to_json.py:103-111).
Order is the hard part on Spark: pages have no row order, so every
transform here works on an EXPLICIT (doc, line_no) ordinal from
``posexplode`` — the engine's general answer to the reference's
implicit file order (SURVEY.md §4.3 item 1).

All parsing is native regexp_extract/when chains — line volume can be
huge (100 TB of OCR text) and stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def explode_lines(
    df: DataFrame, text_col: str, id_cols: list[str], line_sep: str = "\n"
) -> DataFrame:
    """Page text → one row per line with its ordinal (posexplode keeps
    the position; everything downstream orders by it)."""
    keep = [F.col(c) for c in id_cols]
    return df.select(
        *keep,
        F.posexplode(F.split(F.col(text_col), line_sep)).alias("line_no", "line"),
    )


def parse_line_cascade(
    line: Column, patterns: list[tuple[str, list[str]]]
) -> Column:
    """F31: ordered regex cascade — the FIRST pattern that matches the
    whole line wins; its capture groups fill the named struct fields
    (missing fields of laxer patterns → null). Returns a struct column
    (null when nothing matches → the reference's unmatched-line
    capture).

    ``patterns``: [(regex, [field names in group order]), ...] in
    priority order, mirroring the reference's strict → fallback →
    no-branch tiers (pdf_ocr_rm_to_json.py:257-283).

    Cost note: the naive form is one ``regexp_extract`` per field per
    pattern — ~13 full regex matches per line for a 2-tier cascade,
    and a codegen tree to match. Full-line patterns (``^...$``) take
    a fast path instead: ONE ``regexp_replace`` rewrites the line to
    its capture groups joined by a control-char sentinel, one
    ``split`` recovers them — 2 regex executions per pattern total.
    Unanchored patterns keep the per-field extract (a partial match
    would leave surrounding text in the replace output). The sentinel
    (\\x01\\x02) can in principle appear inside a ``\\S+`` group of
    hostile input; OCR text never contains control chars, and the
    failure mode is a field shift within that one line."""
    all_fields: list[str] = []
    for _, names in patterns:
        for n in names:
            if n not in all_fields:
                all_fields.append(n)

    from etl_script_spark.functions.exprs import let

    sep = "\x01\x02"
    result = F.lit(None).cast(
        "struct<" + ",".join(f"{n}:string" for n in all_fields) + ">"
    )
    # build backwards so the first pattern has highest priority
    for rx, names in reversed(patterns):
        if rx.startswith("^") and rx.endswith("$") and not rx.endswith(r"\$"):
            # scope the body in a non-capturing group: a top-level
            # alternation like ^A|B$ would otherwise satisfy the
            # anchor check while matching only a substring, leaving
            # unmatched text glued into the replace output. (?:...)
            # keeps group numbering intact.
            rx = "^(?:" + rx[1:-1] + ")$"
            repl = sep.join(f"${i + 1}" for i in range(len(names)))

            def _mk_factory(names: list[str]):
                # one-arg lambda: F.transform treats a second Python
                # parameter as the element INDEX and would shadow the
                # captured field list with a Column
                def _mk(parts: Column) -> Column:
                    return F.struct(
                        *[
                            (
                                F.element_at(parts, names.index(n) + 1)
                                if n in names
                                else F.lit(None).cast("string")
                            ).alias(n)
                            for n in all_fields
                        ]
                    )

                return _mk

            extracted = let(
                F.split(F.regexp_replace(line, rx, repl), sep),
                _mk_factory(names),
            )
        else:
            extracted = F.struct(
                *[
                    (
                        F.regexp_extract(line, rx, names.index(n) + 1)
                        if n in names
                        else F.lit(None).cast("string")
                    ).alias(n)
                    for n in all_fields
                ]
            )
        result = F.when(line.rlike(rx), extracted).otherwise(result)
    return result


def merge_continuation_lines(
    lines: DataFrame,
    id_cols: list[str],
    start_pattern: str,
    continuation_pattern: str,
    line_col: str = "line",
    order_col: str = "line_no",
) -> DataFrame:
    """F32: records spanning two physical lines — a line matching
    ``start_pattern`` absorbs its successor when that successor matches
    ``continuation_pattern`` (lead() over the stamped order); absorbed
    continuation lines are dropped. Ref: pdf_ocr_rm_report_to_json.py:
    103-111."""
    w = Window.partitionBy(*id_cols).orderBy(order_col)
    is_start = F.col(line_col).rlike(start_pattern)
    # window expressions must be projected before they can gate a
    # filter — materialize lead/lag once, then decide per row
    staged = lines.withColumn("__nxt", F.lead(F.col(line_col)).over(w)).withColumn(
        "__prev", F.lag(F.col(line_col)).over(w)
    )
    # a successor matching BOTH patterns is a record start, not a
    # continuation — absorbing it while absorbed_by_prev keeps it
    # (via ~is_start) would duplicate its content into two rows
    absorbs = (
        is_start
        & F.col("__nxt").isNotNull()
        & F.col("__nxt").rlike(continuation_pattern)
        & ~F.col("__nxt").rlike(start_pattern)
    )
    absorbed_by_prev = (
        F.col("__prev").isNotNull()
        & F.col("__prev").rlike(start_pattern)
        & F.col(line_col).rlike(continuation_pattern)
        & ~is_start
    )
    return (
        staged.withColumn(
            line_col,
            F.when(
                absorbs, F.concat(F.col(line_col), F.lit(" "), F.col("__nxt"))
            ).otherwise(F.col(line_col)),
        )
        .filter(~absorbed_by_prev)
        .drop("__nxt", "__prev")
    )


def broadcast_file_metadata(
    df: DataFrame, file_col: str, metadata: dict[str, dict[str, str]]
) -> DataFrame:
    """F27: fixed-cell header extraction — per-file scalar metadata
    (read driver-side from known cells, e.g. buyer from B2) broadcast
    onto every row of that file. The metadata dict is tiny (one entry
    per input file) → literal broadcast join, zero fact-side shuffle.
    Ref: read_po_csv_to_json.py:70-98,319-324."""
    spark = df.sparkSession
    fields = sorted({k for m in metadata.values() for k in m})
    rows = [
        tuple([fname] + [m.get(f) for f in fields])
        for fname, m in sorted(metadata.items())
    ]
    meta_df = spark.createDataFrame(rows, [file_col] + fields)
    return df.join(F.broadcast(meta_df), file_col, "left")
