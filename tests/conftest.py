from __future__ import annotations

import pytest

from etl_script_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="etl-script-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s


SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
