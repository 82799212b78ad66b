"""Scalar function library (SURVEY.md §2.3, F1-F30).

Every function here is a pure ``Column -> Column`` expression built
from pyspark.sql.functions — JVM-side, whole-stage-codegen'd, zero
Python UDFs. Under Spark 4 ANSI mode all parses/casts use ``try_*``
variants so malformed input yields NULL (the reference's tolerant
semantics) instead of a runtime error.
"""

from etl_script_spark.functions import dates, numerics, strings  # noqa: F401
