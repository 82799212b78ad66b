"""Sources & sinks (SURVEY.md §2.1): encoding-probed CSV, Excel with
engine sniffing, pointer-scoped JSON, JSON/CSV/JDBC sinks, binary-file
metadata capture."""
