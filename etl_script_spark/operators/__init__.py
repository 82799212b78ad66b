"""Relational transforms (SURVEY.md §2.2, §2.4-§2.9) plus the
LLM-data-pipeline operators (dedup families, similarity search, text
analysis, multimodal plumbing) the reference lacks but a 100 TB
training-data pipeline needs.
"""
