"""Declared-query catalog: every implemented operator of SURVEY.md §2
as a (PySpark query, DuckDB oracle SQL) pair over the driver's
synthetic tables."""
