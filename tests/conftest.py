from __future__ import annotations

import pytest

from data_warehouse_opensky_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
