from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zonal_datacube_spark.compare import duck_connect
from zonal_datacube_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("ZDS_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("zds-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duck_connect(SF_ORACLE)
    yield con
    con.close()
