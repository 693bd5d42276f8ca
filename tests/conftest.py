import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_etl_pipeline_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "6g", "spark.sql.warehouse.dir": "/tmp/spark-wh-tests"},
    )
    yield s
    s.stop()


SF_SMOKE = os.environ.get("SF_SMOKE_DIR", "/root/testdata/sf0.001")
SF_CORRECT = os.environ.get("SF_CORRECT_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE
