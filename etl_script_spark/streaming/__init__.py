"""Structured Streaming surface (SURVEY.md §2.10): incremental file
ingest with AvailableNow, watermarked dedup, tumbling/sliding/session
windows. The reference is batch-only; its importers' incremental
semantics (monthly file drops, duplicate-skip) map here."""
