from __future__ import annotations

import os

import pytest

from etl_script_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="etl-script-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s


# overridable so scale-relative suites (sanity bounds, recall
# properties) can be swept at sf0.01/sf0.1 — scale-dependent slips
# (e.g. >2^53 float drift) are invisible at the smoke scale
SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
