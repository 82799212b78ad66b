"""etl_script_spark — a PySpark-native analytics/ETL engine with the
query and data-processing capabilities of the reference pipeline
(smfitadmin/etl-script; see SURVEY.md), re-expressed Spark-first.

Layout (SURVEY.md §7.1):

- ``session``    SparkSession factory (scale posture lives here)
- ``functions``  scalar cleaning/parsing functions (SURVEY §2.3) as
                 native Column expressions — zero row-wise Python UDFs
- ``operators``  relational transforms: canonicalize, row filters,
                 reshape (pivot/unpivot), dedup, merge/upsert, quality
                 metrics, plus LLM-data-pipeline operators (minhash /
                 simhash dedup, ANN similarity, text stats, multimodal)
- ``sources``    readers (csv-with-encoding-probe, excel, json pointer)
                 and writers (json/csv/parquet/jdbc, merge semantics)
- ``plans``      the declared-query catalog (Spark + DuckDB-oracle SQL)
- ``streaming``  Structured Streaming: file-drop ingest, watermark
                 dedup, tumbling/sliding windows
"""

__version__ = "0.1.0"
