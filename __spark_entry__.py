"""Driver contract for the etl-script-spark engine.

``entry(spark)`` runs the flagship pricing-summary query at sf0.001;
``queries()`` exposes every declared operator query from SURVEY.md §2
(implemented in etl_script_spark/plans/catalog.py); ``oracle_sql()``
returns the DuckDB-equivalent SQL for each (queries without an entry
are non-SQL-expressible and get the driver's rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_script_spark.plans.catalog import CATALOG


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return CATALOG["q1_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark for name, q in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each declared query."""
    return {name: q.oracle for name, q in CATALOG.items() if q.oracle is not None}
