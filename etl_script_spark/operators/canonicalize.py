"""Column canonicalization / projection operators (SURVEY.md §2.2
P1-P4).

These reproduce the reference's schema "regime 1" (fuzzy edges →
canonical names) as pure driver-side column-name logic + a single
``select`` — Catalyst then prunes the parquet scan to exactly the kept
columns, which is what makes keep-lists free at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """P1: exact rename map (variant spellings → one canonical name,
    Thai→EN). Unknown columns pass through.

    Ref: inv_processor.py:23-52, supplier_processor.py:5-52,
    po_old_processor.py:81-97.
    """
    present = {k: v for k, v in mapping.items() if k in df.columns}
    return df.withColumnsRenamed(present)


def snake_case_columns(df: DataFrame) -> DataFrame:
    """P1: snake_case normalization of all column names.

    Ref: po_processor.py:52.
    """
    cleaned = [
        re.sub(r"_+", "_", re.sub(r"[^0-9a-zA-Z]+", "_", c.strip().lower())).strip("_")
        for c in df.columns
    ]
    return df.toDF(*cleaned)


def canon_key(name: str) -> str:
    """P2: fuzzy key fold — lowercase, strip ``[\\s._\\-:()]``.

    Ref: _canon_key pdf_ocr_inv_to_json.py:160-163,
    pdf_ocr_po_to_json.py:148-151.
    """
    return re.sub(r"[\s._\-:()]+", "", name.strip().lower())


def fuzzy_rename_columns(df: DataFrame, canon_map: dict[str, str]) -> DataFrame:
    """P2: rename columns whose *folded* key matches a canonical map
    entry; canon_map keys must themselves be folded.

    Ref: pdf_ocr_inv_to_json.py:141-170.
    """
    mapping = {}
    for c in df.columns:
        folded = canon_key(c)
        if folded in canon_map and c != canon_map[folded]:
            mapping[c] = canon_map[folded]
    return df.withColumnsRenamed(mapping)


def keep_columns(df: DataFrame, keep: list[str]) -> DataFrame:
    """P3: keep-list projection — select only canonical columns that
    exist, in keep-list order.

    Ref: inv_processor.py:85-89, ImportOldInvoices.php:128-138.
    """
    present = [c for c in keep if c in df.columns]
    return df.select(*present)


def schema_intersect(df: DataFrame, target: StructType, drop_complex: bool = True) -> DataFrame:
    """P4: schema-intersection projection — drop columns not in the
    target schema; optionally drop array/map/struct-valued columns
    (the reference drops array/object values); cast survivors to the
    target type.

    Ref: ImportInvoiceReport.php:148-152, ImportRmReport.php:136-140.
    """
    by_name = {f.name: f for f in target.fields}
    cols = []
    for c in df.columns:
        if c not in by_name:
            continue
        if drop_complex and isinstance(
            df.schema[c].dataType, (ArrayType, MapType, StructType)
        ):
            continue
        cols.append(F.col(c).try_cast(by_name[c].dataType).alias(c))
    return df.select(*cols)
