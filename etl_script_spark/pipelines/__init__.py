"""Pipelines (SURVEY.md §3): the reference's end-to-end lifecycles
recomposed from the engine's operators — DBD financial statements,
invoice report import, remittance OCR parsing, BOL API sync."""
