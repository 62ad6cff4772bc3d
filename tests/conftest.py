import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hoard_spark.session import get_spark  # noqa: E402

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")
SF_T2 = os.environ.get("SPARK_GRAFT_T2_SF_DIR", "/root/testdata/sf0.01")
REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="hoard-spark-tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/hoard-spark-test-warehouse"},
    )
    yield spark


@pytest.fixture()
def engine(spark, tmp_path):
    from hoard_spark.engine import HoardEngine

    return HoardEngine(spark, str(tmp_path / "warehouse"))
