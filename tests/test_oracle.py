"""Oracle-checked declared queries (SURVEY.md §5.2 item 2): every
catalog entry with an oracle runs on Spark AND DuckDB at sf0.001 and
must match exactly. (The driver repeats this at sf0.01; run
``SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.01 pytest tests/test_oracle.py``
for the full-size check.)
"""

from __future__ import annotations

import os

import pytest

from etl_script_spark.plans.catalog import CATALOG
from tests.oracle_utils import compare, make_duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = make_duckdb(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_oracle(spark, duck, name):
    q = CATALOG[name]
    df = q.spark(spark, SF_DIR)
    if q.oracle is None:
        # rows-only check (non-SQL-expressible): must run and have a schema
        assert df.count() >= 0
        assert len(df.schema) > 0
        return
    problems = compare(df, duck, q.oracle, name)
    assert not problems, "\n".join(problems)
