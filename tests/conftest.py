from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from healthcare_research_data_pipeline_project_spark.session import get_spark

# CI machines without the driver's /root/testdata synthesize their own
# tables (tools/make_testdata.py) and point here via the env var; both
# SFs fall back to the same generated dir when only one exists
_TD = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = os.path.join(_TD, "sf0.001")
SF_ORACLE = (
    os.path.join(_TD, "sf0.01")
    if os.path.isdir(os.path.join(_TD, "sf0.01"))
    else SF_SMOKE
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="hrdp-spark-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
