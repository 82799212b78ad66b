"""Extraction sidecars (SURVEY.md §2.1 S4-S6): PDF table extraction,
PDF text layer, and OCR — the acquisition layer in front of the
relational engine.

Shape: ``binaryFile`` scan → ``mapInPandas`` over the file bytes, one
Arrow batch per partition, heavy optional deps (camelot / tabula /
pdfminer / pypdf / pdf2image+pytesseract) import-gated INSIDE the
worker function so the core engine never depends on them. Every
public entry point accepts an injectable extractor callable, so the
batching / envelope / cascade logic is fully testable with fakes in
containers where the real libraries are absent (the pattern proven by
``operators.multimodal``).
"""

from etl_script_spark.extract.engines import (  # noqa: F401
    available_table_engines,
    available_text_engines,
    make_table_engine,
    make_text_engine,
)
from etl_script_spark.extract.pdf_tables import (  # noqa: F401
    extract_pdf_tables,
    normalize_table_records,
)
from etl_script_spark.extract.pdf_text import extract_pdf_text  # noqa: F401
