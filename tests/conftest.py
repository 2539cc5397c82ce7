from __future__ import annotations

import pytest

from load_datawarehouse_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ldw-tests", shuffle_partitions=8)
    yield s
