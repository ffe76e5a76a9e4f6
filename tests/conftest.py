from __future__ import annotations

import pytest

from flink_wsr_project_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus="8", shuffle_partitions=8)
    yield s
