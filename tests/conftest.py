import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from dataux_spark import get_spark

    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def engine(spark):
    from dataux_spark import Engine

    eng = Engine(spark)
    eng.register_parquet_dir("tpch", SF_DIR)
    return eng


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
